"""Streaming micro-batch ingest + per-snapshot analytics — the
reference's LL_STREAMING driver loop (pull batch → checkpoint →
advance window → run task, `benchmark.cc:1769-1893`)."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from llama_ray.algos.pagerank import pagerank
from llama_ray.graph import build_graph
from llama_ray.snapshots.store import SnapshotStore, stream_ingest

from np_oracles import pagerank_np


def ds_of(pairs):
    return rd.from_arrow(
        pa.table(
            {
                "src": pa.array([p[0] for p in pairs], pa.int64()),
                "dst": pa.array([p[1] for p in pairs], pa.int64()),
            }
        )
    )


def test_pagerank_over_sliding_window(tmp_path):
    st = SnapshotStore(str(tmp_path))
    batches = [
        [(0, 1), (1, 2), (2, 0)],
        [(2, 3), (3, 4)],
        [(4, 5), (5, 0)],
    ]

    results = stream_ingest(
        st,
        (ds_of(b) for b in batches),
        window=2,
        on_snapshot=lambda s, lvl: pagerank(build_graph(s.edges()), max_iters=5).state["rank"].sum(),
    )
    assert len(results) == 3

    # after the loop the window holds only the last 2 batches
    df = st.edges().to_pandas()
    expect_pairs = set(batches[1]) | set(batches[2])
    assert set(zip(df["src"], df["dst"])) == expect_pairs

    # final snapshot's pagerank matches the numpy oracle on the window
    g = build_graph(st.edges())
    res = pagerank(g, max_iters=10)
    src = df["src"].to_numpy()
    dst = df["dst"].to_numpy()
    ids = np.unique(np.concatenate([src, dst]))
    expect = pagerank_np(np.searchsorted(ids, src), np.searchsorted(ids, dst), len(ids))
    assert np.allclose(res.state["rank"], expect, atol=1e-12)


def test_events_retention_matches_reference():
    """Retention vs a pandas reference over synthetic multi-user days,
    including a user whose days straddle block boundaries."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from llama_ray.pipelines.queries import q_events_retention

    # build synthetic events parquet in tmp
    import os
    import tempfile

    rng = np.random.default_rng(11)
    n = 4000
    users = rng.integers(0, 40, n)
    days = rng.integers(0, 12, n)
    secs = days * 86_400 + rng.integers(0, 86_400, n)
    ts = pa.array((secs * 1_000_000).astype("int64"), pa.timestamp("us"))
    tbl = pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "ts": ts,
            "user_id": pa.array(users.astype(np.int64)),
        }
    )
    with tempfile.TemporaryDirectory() as td:
        import pyarrow.parquet as pq

        pq.write_table(tbl, os.path.join(td, "events.parquet"))
        out = q_events_retention(td).sort_values("day").reset_index(drop=True)

    df = pd.DataFrame({"user_id": users, "day": days}).drop_duplicates()
    act = df.groupby("day").size()
    nxt = df.assign(day=df["day"] - 1).merge(df, on=["user_id", "day"])
    ret = nxt.groupby("day").size()
    for _, row in out.iterrows():
        d = int(row["day"])
        assert row["n_active"] == act.get(d, 0)
        assert row["n_retained_next"] == ret.get(d, 0)
        assert row["retention"] == round(row["n_retained_next"] / row["n_active"], 6)
    assert set(out["day"]) == set(act.index)


def test_events_user_hll_accuracy_and_merge_invariance():
    """The HLL estimate is within the expected error band of the true
    distinct count, and is invariant to block layout (register maxima
    are a commutative merge)."""
    import os
    import tempfile

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from llama_ray.pipelines.queries import q_events_user_hll

    rng = np.random.default_rng(5)
    n = 50_000
    users = rng.integers(0, 3000, n).astype(np.int64)  # ~2950 distinct expected
    types = np.where(users % 3 == 0, "click", "view")
    ts = pa.array(np.arange(n, dtype=np.int64) * 1_000_000, pa.timestamp("us"))
    tbl = pa.table({"ts": ts, "user_id": pa.array(users), "event_type": pa.array(types)})
    with tempfile.TemporaryDirectory() as td:
        pq.write_table(tbl, os.path.join(td, "events.parquet"))
        out = q_events_user_hll(td).to_pandas().set_index("event_type")
        out2 = q_events_user_hll(td).to_pandas().set_index("event_type")
    assert out.equals(out2)  # deterministic
    for et in ("click", "view"):
        true = len(np.unique(users[types == et]))
        est = out.loc[et, "hll_distinct"]
        assert abs(est - true) / true < 0.35  # 64 registers: sigma ~ 13%


def test_incremental_window_pagerank_matches_cold_rebuild(tmp_path):
    """r5: the O(Δ)-per-batch incremental window loop produces the
    same per-batch PageRank as the cold full-rebuild task — exact
    after the engine's 8-decimal float convention, ~1e-12 raw (the
    only difference is float-summation order across block layouts) —
    including through window evictions and vertex churn."""
    from llama_ray.sources.generators import rmat
    from llama_ray.snapshots.incremental import IncrementalPageRankWindow

    st = SnapshotStore(str(tmp_path))
    inc = IncrementalPageRankWindow()
    window = 2
    batches = [rmat(8, 2, seed=40 + i).materialize() for i in range(5)]
    for b in batches:
        lvl = st.ingest_batch(b)
        st.set_window(window)
        ids_inc, res_inc = inc.advance(
            st, lvl, window=window, max_iters=5, warm=False
        )
        g = build_graph(st.edges(at_level=lvl))
        res_cold = pagerank(g, max_iters=5)
        # same vertex set, same ranks per ORIGINAL id
        o_inc = np.argsort(ids_inc)
        o_cold = np.argsort(g.ids)
        assert np.array_equal(ids_inc[o_inc], g.ids[o_cold])
        r_inc = res_inc.state["rank"][o_inc]
        r_cold = res_cold.state["rank"][o_cold]
        assert np.allclose(r_inc, r_cold, atol=1e-12, rtol=0)
        assert np.array_equal(np.round(r_inc, 8), np.round(r_cold, 8))
        assert res_inc.iterations == res_cold.iterations == 5
        assert inc.num_edges == g.num_edges


def test_incremental_window_pagerank_warm_start_fixpoint(tmp_path):
    """Warm-started advance converges to the cold fixpoint (the
    snapshot_delta_pagerank contract: same fixpoint, fewer
    iterations) across window slides."""
    from llama_ray.sources.generators import rmat
    from llama_ray.snapshots.incremental import IncrementalPageRankWindow

    st = SnapshotStore(str(tmp_path))
    inc = IncrementalPageRankWindow()
    window = 3
    warm_iters = []
    for i in range(5):
        lvl = st.ingest_batch(rmat(8, 2, seed=90 + i).materialize())
        st.set_window(window)
        ids_inc, res_inc = inc.advance(
            st, lvl, window=window, max_iters=200, tol=1e-9, warm=True
        )
        warm_iters.append(res_inc.iterations)
        g = build_graph(st.edges(at_level=lvl))
        res_cold = pagerank(g, max_iters=200, tol=1e-9)
        o_inc = np.argsort(ids_inc)
        o_cold = np.argsort(g.ids)
        assert np.array_equal(ids_inc[o_inc], g.ids[o_cold])
        assert np.abs(
            res_inc.state["rank"][o_inc] - res_cold.state["rank"][o_cold]
        ).max() < 1e-7
        assert res_inc.converged and res_cold.converged
    # after the first batch, warm start needs fewer iterations than cold
    assert warm_iters[-1] < res_cold.iterations


def test_incremental_window_wcc_matches_cold_and_warm_start_rule(tmp_path):
    """r5: incremental window WCC equals the cold rebuild bit-exactly
    per batch (integer min-label). Warm start applies only while the
    slide purely ADDS edges; the first advance after an eviction falls
    back to cold own-id init (the component minimum may have left)."""
    from llama_ray.algos.components import weakly_connected_components
    from llama_ray.sources.generators import rmat
    from llama_ray.snapshots.incremental import IncrementalPageRankWindow

    st = SnapshotStore(str(tmp_path))
    inc = IncrementalPageRankWindow()
    window = 2
    for i in range(5):
        lvl = st.ingest_batch(rmat(7, 2, seed=140 + i).materialize())
        st.set_window(window)
        ids_inc, res = inc.advance_wcc(st, lvl, window=window)
        g = build_graph(st.edges(at_level=lvl))
        cold = weakly_connected_components(g)
        o_i, o_c = np.argsort(ids_inc), np.argsort(g.ids)
        assert np.array_equal(ids_inc[o_i], g.ids[o_c])
        assert np.array_equal(res.state["label"][o_i], cold.state["label"][o_c])
        assert res.converged


def test_incremental_window_pagerank_and_wcc_share_one_ingest(tmp_path):
    """advance() + advance_wcc() on the same batch must not re-ingest
    the level (the slide is idempotent per level)."""
    from llama_ray.algos.components import weakly_connected_components
    from llama_ray.sources.generators import rmat
    from llama_ray.snapshots.incremental import IncrementalPageRankWindow

    st = SnapshotStore(str(tmp_path))
    inc = IncrementalPageRankWindow()
    # sparse batches + 4 rounds: evictions remove component minima, so
    # the regression this pins is advance() evicting BEFORE a
    # same-batch advance_wcc() — the warm-start flag must survive
    # until fresh labels are saved (caught live by the two-raylet
    # smoke in round 5)
    for i in range(4):
        lvl = st.ingest_batch(rmat(9, 2, seed=300 + i).materialize())
        st.set_window(2)
        ids_pr, pr = inc.advance(st, lvl, window=2, max_iters=3, warm=False)
        ids_cc, cc = inc.advance_wcc(st, lvl, window=2)
        g = build_graph(st.edges(at_level=lvl))
        assert inc.num_edges == g.num_edges  # no double-count
        cold = weakly_connected_components(g)
        o_i, o_c = np.argsort(ids_cc), np.argsort(g.ids)
        assert np.array_equal(cc.state["label"][o_i], cold.state["label"][o_c])
