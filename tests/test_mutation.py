"""Writable-graph mutation regression tests — analogues of the
reference's ``t:delete_edges`` / ``t:delete_nodes`` benchmark tasks
(`/root/reference/benchmark/tests/delete_edges.h:50-236`,
``delete_nodes.h:50-389``: delete every 10th edge/node, verify
degrees and iteration), plus sinks / lookups / cross-validation."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from llama_ray.graph import build_graph
from llama_ray.lookups import edge_exists, find_edges, max_nodes, node_exists, out_degree
from llama_ray.sinks import dump_graph, print_adjacency, print_results
from llama_ray.snapshots.store import SnapshotStore
from llama_ray.snapshots.writable import WritableGraph
from llama_ray.validate import cross_validate


def ds_of(pairs):
    return rd.from_arrow(
        pa.table(
            {
                "src": pa.array([p[0] for p in pairs], pa.int64()),
                "dst": pa.array([p[1] for p in pairs], pa.int64()),
            }
        )
    )


def edge_set(ds):
    df = ds.to_pandas()
    return set(zip(df["src"].tolist(), df["dst"].tolist()))


BASE = [(i, (i + 1) % 20) for i in range(20)] + [(i, (i + 5) % 20) for i in range(20)]


def test_delete_every_10th_edge(tmp_path):
    w = WritableGraph(SnapshotStore(str(tmp_path)))
    w.add_edges([p[0] for p in BASE], [p[1] for p in BASE])
    w.checkpoint()
    victims = BASE[::10]
    for s, d in victims:
        w.delete_edge(s, d)
    w.checkpoint()
    remaining = edge_set(w.ro_edges())
    assert remaining == set(BASE) - set(victims)
    # degrees reflect deletions
    g = build_graph(w.ro_edges())
    for s, d in victims:
        assert not edge_exists(w.ro_edges(), s, d)
    assert g.num_edges == len(BASE) - len(victims)


def test_delete_every_10th_node(tmp_path):
    w = WritableGraph(SnapshotStore(str(tmp_path)))
    w.add_edges([p[0] for p in BASE], [p[1] for p in BASE])
    w.checkpoint()
    dead = list(range(0, 20, 10))
    for nd in dead:
        w.delete_node(nd)
    w.checkpoint()
    remaining = edge_set(w.ro_edges())
    assert all(s not in dead and d not in dead for s, d in remaining)
    expect = {(s, d) for s, d in BASE if s not in dead and d not in dead}
    assert remaining == expect


def test_add_edge_if_not_exists(tmp_path):
    w = WritableGraph(SnapshotStore(str(tmp_path)))
    w.add_edge(0, 1)
    w.add_edge(1, 2)
    w.checkpoint()
    w.add_edge_if_not_exists(0, 1)  # duplicate — must not reappear
    w.add_edge_if_not_exists(2, 3)
    w.checkpoint()
    assert edge_set(w.ro_edges()) == {(0, 1), (1, 2), (2, 3)}


def test_cross_validate_paths(tmp_path):
    """Dual-path ingest equality: bulk vs incremental micro-batches
    (reference cross_validate.h:53-160)."""
    bulk = ds_of(BASE)
    w = WritableGraph(SnapshotStore(str(tmp_path)))
    for chunk_start in range(0, len(BASE), 7):
        chunk = BASE[chunk_start : chunk_start + 7]
        w.add_edges([p[0] for p in chunk], [p[1] for p in chunk])
        w.checkpoint()
    assert cross_validate(bulk, w.ro_edges()) is None
    # and a mismatch is detected at the right vertex
    w.delete_edge(3, 4)
    w.checkpoint()
    assert cross_validate(bulk, w.ro_edges()) == 3


def test_sinks_and_lookups():
    g = build_graph(ds_of(BASE))
    txt = print_results(g, np.full(g.num_vertices, 1 / 3))
    assert "0.3333333333" in txt.splitlines()[0]
    adj = print_adjacency(ds_of(BASE), 0, 1)
    assert adj[0] == [1, 5] and adj[1] == [2, 6]
    dumped = dump_graph(ds_of(BASE)).take(2)
    assert [dumped[0]["src"], dumped[0]["dst"]] == [0, 1]
    assert node_exists(g, 5) and not node_exists(g, 99)
    assert out_degree(g, 0) == 2
    assert max_nodes(g) == 20
    probes = find_edges(ds_of(BASE), [(0, 1), (0, 2)])
    assert probes[(0, 1)] and not probes[(0, 2)]


def test_find_edges_hash_id_fallback():
    """Probe path for ids beyond any packable range (hash64 vertex
    ids, negative included) — the struct-pair probe has no packing."""
    big = 1 << 40
    pairs = [(big + 1, big + 2), (big + 2, big + 3), (-big, 7)]
    ds = ds_of(pairs)
    probes = find_edges(ds, [(big + 1, big + 2), (big + 1, big + 3), (-big, 7), (-big, 8)])
    assert probes[(big + 1, big + 2)] and not probes[(big + 1, big + 3)]
    assert probes[(-big, 7)] and not probes[(-big, 8)]


def test_level_spread():
    from llama_ray.algos.stats import level_spread

    edges = rd.from_arrow(
        pa.table(
            {
                "src": pa.array([0, 0, 1, 1, 2], pa.int64()),
                "dst": pa.array([1, 2, 2, 3, 3], pa.int64()),
                "snapshot": pa.array([0, 1, 0, 0, 1], pa.int64()),
            }
        )
    )
    h = level_spread(edges)
    # vertex 0 spans 2 levels; vertices 1 (two edges, one level) and 2 span 1
    assert dict(zip(h["num_levels"], h["num_vertices"])) == {1: 2, 2: 1}


def test_checkpoint_dedup_large_frozen_store(tmp_path):
    """add_edge_if_not_exists dedup against a 1M-edge frozen store:
    the anti-join probes the store as a stream — no Python set of
    frozen edges (the round-1 scale-killer)."""
    import numpy as np
    import pyarrow as pa
    from llama_ray.snapshots.store import SnapshotStore
    from llama_ray.snapshots.writable import WritableGraph

    rng = np.random.default_rng(1)
    n = 1_000_000
    src = rng.integers(0, 50_000, n)
    dst = rng.integers(0, 50_000, n)
    st = SnapshotStore(str(tmp_path))
    st.ingest_batch(rd.from_arrow(pa.table({"src": pa.array(src), "dst": pa.array(dst)})))

    wg = WritableGraph(st)
    # 100 existing edges + 100 fresh ones
    for i in range(100):
        wg.add_edge_if_not_exists(int(src[i * 37]), int(dst[i * 37]))
    for i in range(100):
        wg.add_edge_if_not_exists(60_000 + i, 70_000 + i)
    lvl = wg.checkpoint()
    import json, os
    man = json.load(open(os.path.join(st._level_dir(lvl), "manifest.json")))
    assert man["num_edges"] == 100  # only the fresh edges survived


def test_add_node_and_bulk_edges(tmp_path):
    """Explicit isolated nodes + parallel bulk edge append (§2.8
    add_node / parallel-async-load)."""
    st = SnapshotStore(str(tmp_path))
    w = WritableGraph(st)
    w.add_node(100)
    w.add_node(101)
    w.add_edge(0, 1)
    w.add_edges_bulk(ds_of([(5, 6), (6, 7), (3, 4)]))
    w.checkpoint()
    assert edge_set(w.ro_edges()) == {(0, 1), (5, 6), (6, 7), (3, 4)}
    assert set(st.nodes().to_pandas()["node"]) == {100, 101}
    # delete then re-add an explicit node (per-level tombstone rule)
    w.delete_node(100)
    w.checkpoint()
    assert set(st.nodes().to_pandas()["node"]) == {101}
    w.add_node(100)
    w.checkpoint()
    assert set(st.nodes().to_pandas()["node"]) == {100, 101}
    # bulk edges incident to a node deleted in the SAME batch are dropped
    w.add_edges_bulk(ds_of([(7, 8), (8, 9)]))
    w.delete_node(8)
    w.checkpoint()
    assert (7, 8) not in edge_set(w.ro_edges()) and (8, 9) not in edge_set(w.ro_edges())


def _prop_dict(ds, key="node"):
    t = ds.to_pandas()
    if key == "node":
        return dict(zip(t["node"], t["value"]))
    return {(s, d): v for s, d, v in zip(t["src"], t["dst"], t["value"])}


def test_property_write_versioned(tmp_path):
    # write -> checkpoint -> overwrite -> checkpoint: reads at the
    # old level see the old value (COW property semantics,
    # ll_mlcsr_properties.h:56-97)
    st = SnapshotStore(str(tmp_path))
    w = WritableGraph(st)
    w.add_edges([0, 1, 2], [1, 2, 3])
    w.set_node_property("rank", 0, 0.5)
    w.set_node_property("rank", 1, 0.25)
    w.set_edge_property("etype", 0, 1, "calls")
    lv0 = w.checkpoint()

    w.set_node_property("rank", 1, 0.75)  # overwrite
    w.set_node_property("rank", 2, 0.1)  # new key
    w.set_edge_property("etype", 0, 1, "imports")
    lv1 = w.checkpoint()

    assert st.property_names("node_props") == ["rank"]
    assert st.property_names("edge_props") == ["etype"]
    # latest view: last writer wins per key
    assert _prop_dict(st.node_property("rank")) == {0: 0.5, 1: 0.75, 2: 0.1}
    assert _prop_dict(st.edge_property("etype"), key="edge") == {(0, 1): "imports"}
    # snapshot isolation: the old level is unchanged
    assert _prop_dict(st.node_property("rank", at_level=lv0)) == {0: 0.5, 1: 0.25}
    assert _prop_dict(st.edge_property("etype", at_level=lv0), key="edge") == {
        (0, 1): "calls"
    }
    assert lv1 > lv0
    with pytest.raises(KeyError):
        st.node_property("nope")


def test_property_within_batch_last_write_wins(tmp_path):
    st = SnapshotStore(str(tmp_path))
    w = WritableGraph(st)
    w.add_edge(0, 1)
    w.set_node_property("x", 5, 1)
    w.set_node_property("x", 5, 2)  # same pending delta: last wins
    w.set_node_properties("x", [6, 7], [10, 11])
    w.checkpoint()
    assert _prop_dict(st.node_property("x")) == {5: 2, 6: 10, 7: 11}


def test_property_survives_flatten(tmp_path):
    st = SnapshotStore(str(tmp_path))
    w = WritableGraph(st)
    w.add_edges([0, 0, 1], [1, 1, 2])  # dup edge for flatten to merge
    w.set_node_property("score", 0, 1.0)
    w.checkpoint()
    w.set_node_property("score", 0, 2.0)
    w.set_edge_properties("w8", [0], [1], [3.5])
    w.checkpoint()
    st.flatten()
    assert len(st.levels()) == 1
    assert _prop_dict(st.node_property("score")) == {0: 2.0}
    assert _prop_dict(st.edge_property("w8"), key="edge") == {(0, 1): 3.5}


def test_tx_begin_commit_abort(tmp_path):
    """tx shim over the batch write store (reference surface
    ll_writable_graph.h:176-212): commit = checkpoint barrier, abort
    rolls pending buffers back to the tx_begin mark."""
    from llama_ray.snapshots.store import SnapshotStore
    from llama_ray.snapshots.writable import WritableGraph

    g = WritableGraph(SnapshotStore(str(tmp_path)))
    g.add_edge(0, 1)
    tx = g.tx_begin()
    assert tx > 0
    g.add_edge(1, 2)
    g.set_node_property("age", 5, 50)
    g.tx_abort()  # drops (1,2) and the prop write, keeps pre-tx (0,1)
    lvl = g.tx_commit()
    assert lvl is not None
    df = g.ro_edges().to_pandas()
    assert df[["src", "dst"]].values.tolist() == [[0, 1]]
    assert "age" not in g.store.property_names("node_props")
    # commit path: mutations inside the tx land
    g.tx_begin()
    g.add_edge(1, 2)
    g.tx_commit()
    assert sorted(map(tuple, g.ro_edges().to_pandas()[["src", "dst"]].values.tolist())) == [(0, 1), (1, 2)]
    # abort without begin is an error
    import pytest as _pytest

    with _pytest.raises(RuntimeError):
        g.tx_abort()
