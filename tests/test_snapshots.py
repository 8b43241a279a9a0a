"""Snapshot store: levels, tombstones, window, flatten, streaming
micro-batches (FIXTURES.md §5; reference sliding-window semantics
benchmark.cc:1115-1124)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from llama_ray.snapshots.store import SnapshotStore, stream_ingest


def ds_of(pairs, weight=None):
    src = pa.array([p[0] for p in pairs], pa.int64())
    dst = pa.array([p[1] for p in pairs], pa.int64())
    cols = {"src": src, "dst": dst}
    if weight is not None:
        cols["weight"] = pa.array(weight, pa.float64())
    return rd.from_arrow(pa.table(cols))


def edge_set(ds):
    df = ds.to_pandas()
    return set(zip(df["src"].tolist(), df["dst"].tolist()))


def test_levels_accumulate(tmp_path):
    st = SnapshotStore(str(tmp_path))
    st.ingest_batch(ds_of([(0, 1), (1, 2)]))
    st.ingest_batch(ds_of([(2, 3)]))
    assert st.levels() == [0, 1]
    assert edge_set(st.edges()) == {(0, 1), (1, 2), (2, 3)}
    # snapshot isolation: older level view unchanged
    assert edge_set(st.edges(at_level=0)) == {(0, 1), (1, 2)}


def test_tombstones(tmp_path):
    st = SnapshotStore(str(tmp_path))
    st.ingest_batch(ds_of([(0, 1), (1, 2), (2, 3)]))
    st.delete_edges(ds_of([(1, 2)]))
    assert edge_set(st.edges()) == {(0, 1), (2, 3)}
    # the pre-delete snapshot still sees the edge
    assert (1, 2) in edge_set(st.edges(at_level=0))


def test_readd_after_delete(tmp_path):
    """Reference max_visible_level semantics (ll_mlcsr_helpers.h:96):
    a tombstone hides only earlier levels, so delete → re-add works."""
    st = SnapshotStore(str(tmp_path))
    st.ingest_batch(ds_of([(0, 1), (1, 2)]))
    st.delete_edges(ds_of([(0, 1)]))
    assert edge_set(st.edges()) == {(1, 2)}
    st.ingest_batch(ds_of([(0, 1)]))  # re-insert after deletion
    assert edge_set(st.edges()) == {(0, 1), (1, 2)}
    # historical views unchanged
    assert edge_set(st.edges(at_level=1)) == {(1, 2)}
    assert edge_set(st.edges(at_level=0)) == {(0, 1), (1, 2)}


def test_tombstone_full_int64_range(tmp_path):
    """Negative hash64 ids and dst >= 2^32 must not alias (the old
    src<<32|dst packing overflowed / collided)."""
    st = SnapshotStore(str(tmp_path))
    big = 1 << 33
    st.ingest_batch(ds_of([(-5, -7), (3, big), (4, 0)]))
    # (3, big) must not alias with (4, 0) under any packing
    st.delete_edges(ds_of([(3, big)]))
    assert edge_set(st.edges()) == {(-5, -7), (4, 0)}
    st.delete_edges(ds_of([(-5, -7)]))
    assert edge_set(st.edges()) == {(4, 0)}


def test_sliding_window(tmp_path):
    st = SnapshotStore(str(tmp_path))
    for k in range(4):
        st.ingest_batch(ds_of([(k, k + 1)]))
    st.set_window(2)
    assert len(st.levels()) == 2
    assert edge_set(st.edges()) == {(2, 3), (3, 4)}


def test_flatten_dedup_and_weights(tmp_path):
    st = SnapshotStore(str(tmp_path))
    st.ingest_batch(ds_of([(0, 1), (0, 1), (1, 2)]))
    st.ingest_batch(ds_of([(0, 1)]))
    lvl = st.flatten(weights="count")
    assert st.levels() == [lvl]
    df = st.edges().to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    assert df[["src", "dst"]].values.tolist() == [[0, 1], [1, 2]]
    # duplicate multiplicity became weight (streaming semantics)
    assert df["weight"].tolist() == [3, 1]


def test_stream_ingest_runs_per_batch(tmp_path):
    st = SnapshotStore(str(tmp_path))
    batches = [ds_of([(k, k + 1)]) for k in range(3)]
    # pin the callback to its own snapshot level: with load/compute
    # overlap, "newest" may already be the next batch
    counts = stream_ingest(
        st, batches, window=2, on_snapshot=lambda s, lvl: s.edges(at_level=lvl).count()
    )
    assert counts == [1, 2, 2]
    # serial mode produces identical results
    st2 = SnapshotStore(str(tmp_path / "serial"))
    counts2 = stream_ingest(
        st2,
        [ds_of([(k, k + 1)]) for k in range(3)],
        window=2,
        on_snapshot=lambda s, lvl: s.edges(at_level=lvl).count(),
        overlap=False,
    )
    assert counts2 == counts


def test_stream_ingest_overlaps_load_and_compute(tmp_path):
    """Batch k+1's ingest must start before on_snapshot(k) finishes
    (the reference's load/compute overlap, benchmark.cc:1788-1860)."""
    import time

    st = SnapshotStore(str(tmp_path))
    ingest_starts, compute_ends = [], []

    def batches():
        for k in range(3):
            ingest_starts.append(time.perf_counter())
            yield ds_of([(k, k + 1)])

    def analytics(s, lvl):
        time.sleep(0.6)
        compute_ends.append(time.perf_counter())
        return s.edges(at_level=lvl).count()

    counts = stream_ingest(st, batches(), on_snapshot=analytics)
    assert counts == [1, 2, 3]
    # ingest of batch 1 began before analytics of batch 0 completed
    assert ingest_starts[1] < compute_ends[0]
    assert ingest_starts[2] < compute_ends[1]


def test_resumable_partitioned_sink(tmp_path):
    """Failed-run resume: completed partitions (with _DONE markers)
    are skipped; missing ones are rewritten; read-back sees only
    committed parts."""
    import os
    from llama_ray.sinks import read_resumable_parquet, resumable_write_parquet

    ds = ds_of([(i, i + 1) for i in range(100)]).repartition(5).materialize()
    root = str(tmp_path / "out")
    r1 = resumable_write_parquet(ds, root)
    assert r1["written"] == 5 and r1["skipped"] == 0
    # simulate a partial failure: one marker missing
    os.remove(os.path.join(root, "part_00002", "_DONE"))
    r2 = resumable_write_parquet(ds, root)
    assert r2["written"] == 1 and r2["skipped"] == 4
    back = read_resumable_parquet(root).to_pandas().sort_values(["src", "dst"])
    assert len(back) == 100


def node_ds(ids):
    return rd.from_arrow(pa.table({"node": pa.array(ids, pa.int64())}))


def nprop_ds(pairs):
    return rd.from_arrow(
        pa.table(
            {
                "node": pa.array([p[0] for p in pairs], pa.int64()),
                "value": pa.array([p[1] for p in pairs]),
            }
        )
    )


def eprop_ds(rows):
    return rd.from_arrow(
        pa.table(
            {
                "src": pa.array([r[0] for r in rows], pa.int64()),
                "dst": pa.array([r[1] for r in rows], pa.int64()),
                "value": pa.array([r[2] for r in rows]),
            }
        )
    )


def test_flatten_drops_deleted_entity_props(tmp_path):
    """flatten() compacts tombstones away — properties of deleted
    nodes / deleted edges must not be resurrected into the new base
    (ADVICE r3: carried props previously skipped the liveness join)."""
    st = SnapshotStore(str(tmp_path))
    st.ingest_batch(
        ds_of([(0, 1), (1, 2)]),
        nodes=node_ds([0, 1, 2, 9]),
        node_props={"age": nprop_ds([(0, 10), (1, 11), (9, 99)])},
        edge_props={"cap": eprop_ds([(0, 1, 5), (1, 2, 7)])},
    )
    st.delete_edges(ds_of([(0, 1)]))
    empty = rd.from_arrow(
        pa.table({"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())})
    )
    st.ingest_batch(empty, node_deletes=node_ds([9]))
    lvl = st.flatten()
    assert st.levels() == [lvl]
    ap = st.node_property("age").to_pandas().sort_values("node")
    assert ap[["node", "value"]].values.tolist() == [[0, 10], [1, 11]]  # node 9 gone
    ep = st.edge_property("cap").to_pandas()
    assert ep[["src", "dst", "value"]].values.tolist() == [[1, 2, 7]]  # (0,1) gone


def test_flatten_keeps_readded_entity_props(tmp_path):
    """Delete then re-add: the entity is live again, so its property
    survives compaction (max_visible_level semantics carry over)."""
    st = SnapshotStore(str(tmp_path))
    st.ingest_batch(
        ds_of([(0, 1)]),
        nodes=node_ds([7]),
        node_props={"age": nprop_ds([(7, 70)])},
        edge_props={"cap": eprop_ds([(0, 1, 3)])},
    )
    st.delete_edges(ds_of([(0, 1)]))
    st.ingest_batch(
        ds_of([(0, 1)]),
        node_deletes=node_ds([7]),
    )
    # re-add node 7 explicitly after its delete
    st.ingest_batch(
        rd.from_arrow(pa.table({"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())})),
        nodes=node_ds([7]),
    )
    st.flatten()
    ap = st.node_property("age").to_pandas()
    assert ap[["node", "value"]].values.tolist() == [[7, 70]]
    ep = st.edge_property("cap").to_pandas()
    assert ep[["src", "dst", "value"]].values.tolist() == [[0, 1, 3]]


def test_stream_ingest_phase_metrics(tmp_path):
    """phase_metrics records the reference's per-batch load-phase
    split (pull / window-advance / task) in both overlap modes, with
    each task_s landing on its own batch's record."""
    for overlap in (True, False):
        st = SnapshotStore(str(tmp_path / f"ov{overlap}"))
        phases: list = []
        counts = stream_ingest(
            st,
            [ds_of([(k, k + 1)]) for k in range(3)],
            window=2,
            on_snapshot=lambda s, lvl: s.edges(at_level=lvl).count(),
            overlap=overlap,
            phase_metrics=phases,
        )
        assert counts == [1, 2, 2]
        assert len(phases) == 3
        for rec in phases:
            assert rec["pull_s"] > 0
            assert rec["window_s"] >= 0
            assert rec["task_s"] > 0
        assert [r["level"] for r in phases] == sorted(r["level"] for r in phases)


def test_stream_ingest_resume_by_tag(tmp_path):
    """A killed streaming job re-run with the same tags skips the
    already-ingested batches (no duplicate levels) and continues from
    the first unprocessed one, in both overlap modes."""
    for overlap in (True, False):
        root = str(tmp_path / f"resume_ov{overlap}")
        mk = lambda: [ds_of([(k, k + 1)]) for k in range(4)]
        tags = [f"batch-{k}" for k in range(4)]
        # "interrupted" first run: only the first two batches arrive
        st = SnapshotStore(root)
        stream_ingest(
            st, mk()[:2], window=3,
            on_snapshot=lambda s, lvl: s.edges(at_level=lvl).count(),
            overlap=overlap, tags=tags[:2],
        )
        assert len(st.levels()) == 2
        # resumed run over the full batch list
        phases: list = []
        counts = stream_ingest(
            st, mk(), window=3,
            on_snapshot=lambda s, lvl: s.edges(at_level=lvl).count(),
            overlap=overlap, tags=tags, phase_metrics=phases,
        )
        assert len(st.levels()) == 3  # window=3 pruned, no duplicates
        assert counts[:2] == [None, None]  # skipped, analytics not re-run
        assert counts[2:] == [3, 3]  # window-limited edge counts
        assert [p.get("skipped", False) for p in phases] == [True, True, False, False]
        # tags of window-pruned levels survive (retired_tags.json):
        # processed-and-discarded must still read as processed
        assert sorted(st.tags()) == sorted(tags)
        # a third resume over the same list is a complete no-op
        counts3 = stream_ingest(
            st, mk(), window=3,
            on_snapshot=lambda s, lvl: s.edges(at_level=lvl).count(),
            overlap=overlap, tags=tags,
        )
        assert counts3 == [None] * 4
        assert len(st.levels()) == 3
        # duplicate tags are rejected loudly
        with pytest.raises(ValueError):
            stream_ingest(st, mk()[:2], tags=["x", "x"])
