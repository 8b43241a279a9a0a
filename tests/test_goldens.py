"""Golden per-vertex outputs for seeded generator graphs
(FIXTURES.md §4; reference CI diffs golden text outputs,
``tests/run-tests.sh:348-358``). The committed Parquet pins results
across rounds/refactors — any drift is a semantic change."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from llama_ray.algos.components import weakly_connected_components
from llama_ray.algos.pagerank import pagerank
from llama_ray.algos.triangles import triangle_count
from llama_ray.graph import build_graph
from llama_ray.sinks import print_results
from llama_ray.sources.generators import rmat

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")
GOLDEN_PATH = os.path.join(GOLDEN_DIR, "rmat10_8_seed42.parquet")


def compute():
    g = build_graph(rmat(10, 8, seed=42))
    pr = pagerank(g, max_iters=10)
    wcc = weakly_connected_components(g)
    tc = triangle_count(g)
    table = pa.table(
        {
            "vertex": pa.array(g.ids),
            "rank": pa.array(pr.state["rank"]),
            "component": pa.array(wcc.state["label"]),
        }
    )
    return g, table, tc, pr


def test_golden_rmat():
    g, table, tc, pr = compute()
    if not os.path.exists(GOLDEN_PATH):
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        pq.write_table(table, GOLDEN_PATH)
        meta_path = GOLDEN_PATH + ".meta"
        with open(meta_path, "w") as f:
            f.write(f"triangles={tc}\n")
        pytest.skip("golden written on first run — commit tests/goldens/")
    golden = pq.read_table(GOLDEN_PATH)
    assert table.column("vertex").to_pylist() == golden.column("vertex").to_pylist()
    assert np.allclose(
        table.column("rank").to_numpy(), golden.column("rank").to_numpy(), atol=1e-12
    )
    assert table.column("component").to_pylist() == golden.column("component").to_pylist()
    with open(GOLDEN_PATH + ".meta") as f:
        assert tc == int(f.read().strip().split("=")[1])
    # the reference's human-diffable golden text head (%0.10f)
    txt = print_results(g, pr.state["rank"])
    assert len(txt.splitlines()) == 50


@pytest.mark.parametrize("kind,seed", [("rmat", 7), ("rmat", 99), ("er", 3), ("er", 17)])
def test_golden_multi_seed(kind, seed):
    """Goldens across generator kinds and seeds (round-3 future-work
    item): pins PageRank sums, component structure and triangle totals
    for four more seeded graphs."""
    from llama_ray.sources.generators import erdos_renyi

    edges = rmat(9, 8, seed=seed) if kind == "rmat" else erdos_renyi(400, 3200, seed=seed)
    g = build_graph(edges)
    pr = pagerank(g, max_iters=10)
    wcc = weakly_connected_components(g)
    tc = triangle_count(g)
    table = pa.table(
        {
            "vertex": pa.array(g.ids),
            "rank": pa.array(pr.state["rank"]),
            "component": pa.array(wcc.state["label"]),
        }
    )
    path = os.path.join(GOLDEN_DIR, f"{kind}_seed{seed}.parquet")
    if not os.path.exists(path):
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        pq.write_table(table, path)
        with open(path + ".meta", "w") as f:
            f.write(f"triangles={tc}\n")
        pytest.skip("golden written on first run — commit tests/goldens/")
    golden = pq.read_table(path)
    assert table.column("vertex").to_pylist() == golden.column("vertex").to_pylist()
    assert np.allclose(table.column("rank").to_numpy(), golden.column("rank").to_numpy(), atol=1e-12)
    assert table.column("component").to_pylist() == golden.column("component").to_pylist()
    with open(path + ".meta") as f:
        assert tc == int(f.read().strip().split("=")[1])


def test_golden_snapshot_window_configs():
    """Sliding-window streaming over seeded generator batches: the
    visible edge multiset after each window advance is pinned exactly
    (computed, not stored — windows are deterministic)."""
    import ray.data as rd
    from llama_ray.snapshots.store import SnapshotStore, stream_ingest
    from llama_ray.sources.generators import erdos_renyi
    import tempfile

    batches = [erdos_renyi(50, 120, seed=s).materialize() for s in range(5)]
    expected_edges = [b.to_pandas() for b in batches]

    for window in (2, 3):
        with tempfile.TemporaryDirectory() as d:
            st = SnapshotStore(d)
            counts = stream_ingest(
                st, batches, window=window, on_snapshot=lambda s, lvl: s.edges(at_level=lvl).count()
            )
            # after each batch k, the window holds batches [max(0, k-window+1) .. k]
            for k, c in enumerate(counts):
                lo = max(0, k - window + 1)
                assert c == sum(len(expected_edges[i]) for i in range(lo, k + 1))
