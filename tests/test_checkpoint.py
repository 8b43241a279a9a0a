"""Checkpoint/resume: a run killed after superstep k resumes from the
manifest and finishes bit-identical to an uninterrupted run
(FIXTURES.md §5; north-rule resumability requirement)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from llama_ray.algos.components import weakly_connected_components
from llama_ray.algos.pagerank import pagerank
from llama_ray.engine.checkpoint import CheckpointManager
from llama_ray.graph import build_graph
from llama_ray.sources.generators import rmat


@pytest.fixture(scope="module")
def g():
    return build_graph(rmat(7, 4, seed=11))


def test_pagerank_resume_bit_identical(g, tmp_path):
    full = pagerank(g, max_iters=10, checkpoint_dir=str(tmp_path / "full"))

    part_dir = str(tmp_path / "part")
    # "killed" after 4 supersteps
    pagerank(g, max_iters=4, checkpoint_dir=part_dir)
    resumed = pagerank(g, max_iters=10, checkpoint_dir=part_dir, resume=True)

    assert np.array_equal(full.state["rank"], resumed.state["rank"]), "resume must be bit-identical"
    # metrics history covers all 10 supersteps with lineage intact
    assert [m["iteration"] for m in resumed.metrics] == list(range(10))


def test_wcc_resume(g, tmp_path):
    full = weakly_connected_components(g)
    d = str(tmp_path / "w")
    weakly_connected_components(g, max_iters=2, checkpoint_dir=d)
    resumed = weakly_connected_components(g, checkpoint_dir=d, resume=True)
    assert np.array_equal(full.state["label"], resumed.state["label"])


def test_converged_checkpoint_short_circuits(g, tmp_path):
    d = str(tmp_path / "c")
    first = pagerank(g, max_iters=200, tol=1e-6, checkpoint_dir=d)
    assert first.converged
    again = pagerank(g, max_iters=200, tol=1e-6, checkpoint_dir=d, resume=True)
    assert again.converged
    assert np.array_equal(first.state["rank"], again.state["rank"])


def test_manifest_refuses_other_graph(tmp_path):
    ids_a = np.arange(10, dtype=np.int64)
    ids_b = np.arange(11, dtype=np.int64)
    d = str(tmp_path / "m")
    a = CheckpointManager(d, algorithm="x", ids=ids_a, num_edges=5)
    a.save(0, {"s": np.zeros(10)}, {})
    b = CheckpointManager(d, algorithm="x", ids=ids_b, num_edges=5)
    assert b.latest() is None  # fingerprint mismatch → not resumable
    assert a.latest() == 0


def test_corrupt_state_detected(tmp_path):
    ids = np.arange(10, dtype=np.int64)
    d = str(tmp_path / "z")
    cm = CheckpointManager(d, algorithm="x", ids=ids, num_edges=5)
    cm.save(0, {"s": np.arange(10.0)}, {})
    # corrupt the parquet
    import pyarrow.parquet as pq

    pq.write_table(pa.table({"s": pa.array(np.zeros(10))}), f"{d}/state_00000.parquet")
    with pytest.raises(ValueError, match="hash mismatch"):
        cm.load(0)
