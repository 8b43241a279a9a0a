"""Property-based checks (hypothesis) for the canonicalization and
dedup kernels — random edge multisets with duplicates, self-loops and
arbitrary (including negative, hash-like) int64 ids."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from llama_ray.graph import build_graph, undirect
from llama_ray.ingest.canonicalize import dedup_edges, max_node_id, undirected_ordered

ids = st.integers(min_value=-(2**40), max_value=2**40)
edge_lists = st.lists(st.tuples(ids, ids), min_size=1, max_size=60)

SLOW = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


def ds_of(pairs, weights=None):
    cols = {
        "src": pa.array([p[0] for p in pairs], pa.int64()),
        "dst": pa.array([p[1] for p in pairs], pa.int64()),
    }
    if weights is not None:
        cols["weight"] = pa.array(weights, pa.float64())
    return rd.from_arrow(pa.table(cols)).repartition(3)


@SLOW
@given(edge_lists)
def test_dedup_matches_pandas(pairs):
    got = dedup_edges(ds_of(pairs)).to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    expect = (
        pd.DataFrame(pairs, columns=["src", "dst"])
        .drop_duplicates()
        .sort_values(["src", "dst"])
        .reset_index(drop=True)
    )
    assert got.equals(expect)


@SLOW
@given(edge_lists)
def test_dedup_count_weights(pairs):
    got = dedup_edges(ds_of(pairs), weights="count").to_pandas()
    expect = pd.DataFrame(pairs, columns=["src", "dst"]).groupby(["src", "dst"]).size()
    for row in got.itertuples():
        assert row.weight == expect[(row.src, row.dst)]
    assert got["weight"].sum() == len(pairs)


@SLOW
@given(edge_lists)
def test_undirected_ordered_canonical(pairs):
    got = undirected_ordered(ds_of(pairs)).to_pandas()
    assert (got["src"] <= got["dst"]).all()
    assert len(got) == len(pairs)


@SLOW
@given(edge_lists)
def test_undirect_doubles_nonloops(pairs):
    got = undirect(ds_of(pairs)).to_pandas()
    loops = sum(1 for a, b in pairs if a == b)
    assert len(got) == 2 * len(pairs) - loops


@SLOW
@given(edge_lists)
def test_build_graph_invariants(pairs):
    g = build_graph(ds_of(pairs))
    assert g.num_edges == len(pairs)
    assert np.array_equal(g.ids, np.unique([x for p in pairs for x in p]))
    assert g.out_degrees.sum() == len(pairs)
    assert int(max_node_id(ds_of(pairs))) == int(g.ids.max())


@SLOW
@given(edge_lists)
def test_scc_matches_tarjan_property(pairs):
    """Random directed multigraphs (dups, self-loops, negative ids):
    the distributed trim+FW-BW SCC equals iterative Tarjan."""
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from np_oracles import tarjan_scc_np
    from llama_ray.algos.components import strongly_connected_components

    g = build_graph(ds_of(pairs))
    res = strongly_connected_components(g)
    s = np.searchsorted(g.ids, np.array([p[0] for p in pairs]))
    d = np.searchsorted(g.ids, np.array([p[1] for p in pairs]))
    expect = g.ids[tarjan_scc_np(s, d, g.num_vertices)]
    assert np.array_equal(res.state["label"], expect)


@SLOW
@given(edge_lists)
def test_canonical_undirected_matches_generic_property(pairs):
    from llama_ray.graph import canonical_undirected

    parent = build_graph(ds_of(pairs))
    fast = canonical_undirected(parent)
    generic = build_graph(dedup_edges(undirected_ordered(parent.edges, drop_self_loops=True)))
    assert np.array_equal(fast.ids, parent.ids[generic.ids]) or (
        generic.num_vertices == 0 and fast.num_vertices == 0
    )
    fe = fast.edges.to_pandas()
    ge = generic.edges.to_pandas()
    assert len(fe) == len(ge)
    if len(fe):
        fe = fe.sort_values(["src", "dst"]).reset_index(drop=True)
        ge = ge.sort_values(["src", "dst"]).reset_index(drop=True)
        assert fe.equals(ge)


@SLOW
@given(st.lists(st.text(alphabet="abcdef ", min_size=0, max_size=40), min_size=1, max_size=12))
def test_minhash_signature_deterministic_and_similarity(texts):
    """Signatures are pure functions of text; identical texts collide
    on every hash; disjoint-alphabet texts share (almost) none."""
    from llama_ray.data_ops.dedup import MinHasher

    mh = MinHasher(32)
    sigs = [mh.signature(t) for t in texts]
    sigs2 = [mh.signature(t) for t in texts]
    for a, b in zip(sigs, sigs2):
        assert np.array_equal(a, b)
    for i, t in enumerate(texts):
        for j, u in enumerate(texts):
            if t == u:
                assert np.array_equal(sigs[i], sigs[j])


# ------------------------------------------------------- tokenizer kernel

ascii_texts = st.lists(
    st.text(
        alphabet=st.characters(min_codepoint=9, max_codepoint=126),
        max_size=60,
    ),
    max_size=25,
)


@given(ascii_texts)
@settings(max_examples=100, deadline=None)
def test_ws_token_spans_match_str_split(texts):
    """The byte-scan tokenizer == Python str.split on ASCII input
    (including tabs, newlines, \\x0b/\\x0c, empty and all-whitespace
    docs, and sliced Arrow columns)."""
    from llama_ray.data_ops.dedup import _string_segments, _ws_token_spans

    for col in (pa.array(texts, pa.string()), pa.array(["PAD pad"] * 2 + texts).slice(2)):
        data, offs = _string_segments(col)
        starts, lens, per_doc = _ws_token_spans(data, offs)
        assert per_doc.tolist() == [len(t.split()) for t in texts]
        got = []
        for s, ln in zip(starts.tolist(), lens.tolist()):
            got.append(bytes(data[s : s + ln]).decode("utf-8"))
        want = [tok for t in texts for tok in t.split()]
        assert got == want


# Whitespace alphabets per path: the char path normalizes with RE2
# (\s = [\t\n\f\r ], the SQL oracles' definition — no \x0b/\x1c-\x1f);
# the word path uses the byte-scan tokenizer (str.split's ASCII set).
re2_ws_texts = st.lists(
    st.text(
        alphabet=st.characters(
            min_codepoint=32, max_codepoint=126, include_characters="\t\n\x0c\r"
        ),
        max_size=50,
    ),
    max_size=15,
)
split_ws_texts = st.lists(
    st.text(
        alphabet=st.characters(min_codepoint=9, max_codepoint=126),
        max_size=50,
    ),
    max_size=15,
)


@given(re2_ws_texts)
@settings(max_examples=60, deadline=None)
def test_char_shingle_batch_fuzz_matches_per_row(texts):
    from llama_ray.data_ops.dedup import _char_shingle_hashes, _char_shingle_hashes_batch

    col = pa.array(texts, pa.string())
    for k in (5, 2):
        cat, lens = _char_shingle_hashes_batch(col, k)
        starts = np.concatenate([[0], np.cumsum(lens)]).astype(np.int64)
        for i, t in enumerate(texts):
            assert np.array_equal(_char_shingle_hashes(t, k), cat[starts[i] : starts[i + 1]])


@given(split_ws_texts)
@settings(max_examples=60, deadline=None)
def test_word_ngram_batch_fuzz_matches_per_row(texts):
    from llama_ray.data_ops.dedup import _word_ngram_hashes, _word_ngram_hashes_batch

    col = pa.array(texts, pa.string())
    for n in (3, 1):
        cat, lens = _word_ngram_hashes_batch(col, n)
        starts = np.concatenate([[0], np.cumsum(lens)]).astype(np.int64)
        for i, t in enumerate(texts):
            assert np.array_equal(_word_ngram_hashes(t, n), cat[starts[i] : starts[i + 1]])


# ------------------------------- window / range-join property checks

win_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=4),     # user
        st.integers(min_value=0, max_value=50),    # ts (dense → many peers)
        st.integers(min_value=-3, max_value=9),    # val
    ),
    min_size=1,
    max_size=80,
)


@SLOW
@given(win_rows, st.integers(min_value=1, max_value=6), st.integers(min_value=1, max_value=25))
def test_sliding_window_agg_property(rows, window, nblocks):
    from llama_ray.data_ops.relational import sliding_window_agg

    df = pd.DataFrame(rows, columns=["u", "t", "v"])
    df["rid"] = np.arange(len(df), dtype=np.int64)
    df = df.astype({"u": np.int64, "t": np.int64, "v": np.int64})
    out = sliding_window_agg(
        rd.from_pandas(df).repartition(nblocks),
        by="u", ts_col="t", val_col="v", window=window, tie_col="rid",
        out_cnt="c", out_sum="s",
    ).to_pandas().sort_values("rid").reset_index(drop=True)
    for _, r in out.iterrows():
        m = (df["u"] == r["u"]) & (df["t"] >= r["t"] - window) & (df["t"] <= r["t"])
        assert int(r["c"]) == int(m.sum())
        assert int(r["s"]) == int(df.loc[m, "v"].sum())


ivl_case = st.tuples(
    st.lists(st.integers(min_value=-10, max_value=40), min_size=1, max_size=50),  # points
    st.lists(
        st.tuples(st.integers(min_value=-10, max_value=35), st.integers(min_value=1, max_value=12)),
        min_size=0,
        max_size=12,
    ),  # (start, length)
)


@SLOW
@given(ivl_case, st.integers(min_value=1, max_value=9))
def test_interval_join_property(case, nblocks):
    from llama_ray.data_ops.relational import interval_join

    points, ivls = case
    P = pd.DataFrame({"pid": np.arange(len(points), dtype=np.int64),
                      "t": np.array(points, np.int64)})
    itbl = pa.table(
        {
            "s": pa.array([a for a, _l in ivls], pa.int64()),
            "e": pa.array([a + l for a, l in ivls], pa.int64()),
            "iid": pa.array(np.arange(len(ivls), dtype=np.int64)),
        }
    )
    out = interval_join(
        rd.from_pandas(P).repartition(nblocks), itbl,
        on="t", start_col="s", end_col="e",
    ).to_pandas()
    got = sorted(zip(out["pid"], out["iid"])) if len(out) else []
    exp = sorted(
        (int(p), int(i))
        for p in range(len(points))
        for i, (a, l) in enumerate(ivls)
        if a <= points[p] < a + l
    )
    assert got == exp


tokens = st.lists(
    st.text(alphabet="ab", min_size=2, max_size=6), min_size=1, max_size=25
)


@SLOW
@given(tokens, st.integers(min_value=1, max_value=2), st.integers(min_value=1, max_value=5))
def test_edit_distance_pairs_property(toks, dist, nblocks):
    """Deletion-neighborhood join vs brute Levenshtein over adversarial
    repeated-character tokens (maximal variant collisions)."""
    import itertools

    from llama_ray.data_ops.text import edit_distance_pairs

    def lev(a, b):
        if len(a) > len(b):
            a, b = b, a
        prev = list(range(len(a) + 1))
        for j, cb in enumerate(b, 1):
            cur = [j] + [0] * len(a)
            for i, ca in enumerate(a, 1):
                cur[i] = min(prev[i] + 1, cur[i - 1] + 1, prev[i - 1] + (ca != cb))
            prev = cur
        return prev[-1]

    docs = [{"doc_id": 0, "text": " ".join(toks)}]
    ds = rd.from_items(docs).repartition(nblocks)
    out = edit_distance_pairs(ds, min_len=2, max_distance=dist).to_pandas()
    got = sorted(zip(out["tok_a"], out["tok_b"])) if len(out) else []
    vocab = sorted({t for t in toks if 2 <= len(t) <= 20})
    exp = sorted(
        (a, b) for a, b in itertools.combinations(vocab, 2) if 1 <= lev(a, b) <= dist
    )
    assert got == exp


@SLOW
@given(
    st.lists(st.integers(min_value=0, max_value=9), min_size=1, max_size=60),
    st.integers(min_value=1, max_value=6),
    st.integers(min_value=1, max_value=9),
)
def test_ntile_and_ranks_property(vals, k, nblocks):
    from llama_ray.data_ops.relational import global_ranks, ntile

    df = pd.DataFrame(
        {"rid": np.arange(len(vals), dtype=np.int64), "v": np.array(vals, np.int64)}
    )
    ranked = (
        global_ranks(rd.from_pandas(df).repartition(nblocks), order_cols=["v", "rid"])
        .to_pandas()
        .sort_values("rn")
        .reset_index(drop=True)
    )
    exp = df.sort_values(["v", "rid"]).reset_index(drop=True)
    assert np.array_equal(ranked["rid"].to_numpy(), exp["rid"].to_numpy())
    assert np.array_equal(ranked["rn"].to_numpy(), np.arange(1, len(df) + 1))
    nt = ntile(
        rd.from_pandas(df).repartition(nblocks), order_cols=["v", "rid"], k=k
    ).to_pandas()
    n = len(df)
    q, r = divmod(n, k)
    m = nt.merge(ranked[["rid", "rn"]], on="rid")
    for _, row in m.iterrows():
        rank = int(row["rn"])
        if q == 0:
            expb = rank
        elif rank <= r * (q + 1):
            expb = -(-rank // (q + 1))
        else:
            expb = r + (-(-(rank - r * (q + 1)) // q))
        assert int(row["bucket"]) == expb


asof_case = st.tuples(
    st.lists(  # probes: (by, ts)
        st.tuples(st.integers(min_value=0, max_value=3), st.integers(min_value=0, max_value=30)),
        min_size=1, max_size=40,
    ),
    st.lists(  # refs: (by, ts, val)
        st.tuples(
            st.integers(min_value=0, max_value=3),
            st.integers(min_value=0, max_value=30),
            st.integers(min_value=0, max_value=99),
        ),
        min_size=0, max_size=40,
    ),
)


@SLOW
@given(asof_case, st.integers(min_value=1, max_value=7))
def test_asof_join_property(case, nblocks):
    """As-of semantics vs brute force: latest same-key ref with
    ts <= probe ts; equal-ts refs visible; ties -> largest tie col."""
    from llama_ray.data_ops.relational import asof_join

    probes, refs = case
    P = pd.DataFrame(
        {
            "k": np.array([p[0] for p in probes], np.int64),
            "ts_u": np.array([p[1] for p in probes], np.int64),
            "pid": np.arange(len(probes), dtype=np.int64),
        }
    )
    Rf = pd.DataFrame(
        {
            "k": np.array([r[0] for r in refs], np.int64),
            "ts_u": np.array([r[1] for r in refs], np.int64),
            "tie": np.arange(len(refs), dtype=np.int64),
            "val": np.array([r[2] for r in refs], np.int64),
        }
    )
    out = asof_join(
        rd.from_pandas(P).repartition(nblocks),
        rd.from_pandas(Rf).repartition(max(1, nblocks - 1)) if len(Rf) else rd.from_pandas(Rf),
        by="k", ts_col="ts_u", tie_col="tie", value_cols=["tie", "val"],
    ).to_pandas()
    assert len(out) == len(P)
    for _, row in out.iterrows():
        cand = Rf[(Rf["k"] == row["k"]) & (Rf["ts_u"] <= row["ts_u"])]
        if len(cand) == 0:
            assert pd.isna(row["asof_tie"])
        else:
            best = cand.sort_values(["ts_u", "tie"]).iloc[-1]
            assert int(row["asof_tie"]) == int(best["tie"])
            assert int(row["asof_val"]) == int(best["val"])


@SLOW
@given(
    st.lists(st.tuples(st.integers(0, 8), st.integers(0, 99)), min_size=0, max_size=40),
    st.lists(st.tuples(st.integers(0, 8), st.integers(0, 99)), min_size=0, max_size=40),
    st.sampled_from(["inner", "left", "outer", "semi", "anti"]),
)
def test_sort_merge_join_property(lrows, rrows, how):
    from llama_ray.data_ops.relational import sort_merge_join

    if not lrows:
        return
    L = pd.DataFrame(
        {
            "k": np.array([a for a, _ in lrows], np.int64),
            "lv": np.array([b for _, b in lrows], np.int64),
        }
    )
    R = pd.DataFrame(
        {
            "k": np.array([a for a, _ in rrows], np.int64),
            "rv": np.array([b for _, b in rrows], np.int64),
        }
    )
    out = sort_merge_join(
        rd.from_pandas(L).repartition(3),
        rd.from_pandas(R).repartition(2) if len(R) else rd.from_pandas(R),
        left_on="k", right_on="k", how=how,
    ).to_pandas()
    if how in ("semi", "anti"):
        keys = set(R["k"])
        exp = L[[k in keys for k in L["k"]]] if how == "semi" else L[[k not in keys for k in L["k"]]]
        assert sorted(zip(out["k"], out["lv"])) if len(out) else [] == sorted(zip(exp["k"], exp["lv"]))
        assert len(out) == len(exp)
    else:
        exp = L.merge(R, on="k", how=("outer" if how == "outer" else how))
        assert len(out) == len(exp)
        if len(out):
            o = out.fillna(-1).sort_values(list(out.columns)).reset_index(drop=True)
            e = exp.fillna(-1)[list(out.columns)].sort_values(list(out.columns)).reset_index(drop=True)
            assert np.allclose(o.to_numpy(dtype=float), e.to_numpy(dtype=float))


@SLOW
@given(
    st.lists(
        st.tuples(st.integers(0, 4), st.integers(0, 40)),  # (user, ts)
        min_size=1,
        max_size=60,
    ),
    st.integers(min_value=1, max_value=8),
    st.integers(min_value=1, max_value=7),
)
def test_sessionize_property(rows, gap, nblocks):
    """Sessionization vs brute force — strict-> gap semantics, gap
    boundary EQUALITY (ts diff == gap stays in-session), duplicate
    timestamps, users spanning block edges."""
    from llama_ray.pipelines.queries import sessionize_prepped

    df = pd.DataFrame(
        {
            "user_id": np.array([r[0] for r in rows], np.int64),
            "t": np.array([r[1] for r in rows], np.int64),
        }
    )
    out = (
        sessionize_prepped(rd.from_pandas(df).repartition(nblocks), gap)
        .to_pandas()
        .sort_values(["user_id", "session_start"])
        .reset_index(drop=True)
    )
    exp_rows = []
    for u, grp in df.groupby("user_id"):
        ts = np.sort(grp["t"].to_numpy())
        start, cnt = int(ts[0]), 1
        for a, b in zip(ts[:-1], ts[1:]):
            if b - a > gap:
                exp_rows.append((int(u), start, cnt))
                start, cnt = int(b), 1
            else:
                cnt += 1
        exp_rows.append((int(u), start, cnt))
    exp = (
        pd.DataFrame(exp_rows, columns=["user_id", "session_start", "n_events"])
        .sort_values(["user_id", "session_start"])
        .reset_index(drop=True)
    )
    assert out.astype(np.int64).equals(exp.astype(np.int64))


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    st.lists(
        st.lists(st.tuples(st.integers(0, 40), st.integers(0, 40)), min_size=1, max_size=25),
        min_size=2,
        max_size=5,
    ),
    st.integers(min_value=1, max_value=3),
)
def test_incremental_window_pagerank_equals_cold_on_random_streams(batches, window):
    """Property: for ANY stream of edge batches and ANY window size,
    every advance of the incremental window equals the cold rebuild of
    the same window (8-decimal convention) — vertex churn, eviction
    and duplicate edges included."""
    import shutil
    import tempfile

    from llama_ray.algos.pagerank import pagerank
    from llama_ray.snapshots.incremental import IncrementalPageRankWindow
    from llama_ray.snapshots.store import SnapshotStore

    root = tempfile.mkdtemp(prefix="prop_incwin_", dir="/tmp")
    try:
        st_ = SnapshotStore(root)
        inc = IncrementalPageRankWindow()
        for pairs in batches:
            lvl = st_.ingest_batch(ds_of(pairs))
            st_.set_window(window)
            ids_inc, res = inc.advance(st_, lvl, window=window, max_iters=4, warm=False)
            g = build_graph(st_.edges(at_level=lvl))
            cold = pagerank(g, max_iters=4)
            o_i, o_c = np.argsort(ids_inc), np.argsort(g.ids)
            assert np.array_equal(ids_inc[o_i], g.ids[o_c])
            assert np.array_equal(
                np.round(res.state["rank"][o_i], 8),
                np.round(cold.state["rank"][o_c], 8),
            )
    finally:
        shutil.rmtree(root, ignore_errors=True)
