"""Personalized PageRank vs a numpy oracle; engine parity; resume."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from llama_ray.algos.ppr import personalized_pagerank
from llama_ray.graph import build_graph
from llama_ray.sources.generators import rmat


def ppr_np(src, dst, n, seed_idx, iters=10, d=0.85):
    deg = np.bincount(src, minlength=n).astype(float)
    inv = np.zeros(n)
    inv[deg > 0] = 1 / deg[deg > 0]
    K = len(seed_idx)
    r = np.zeros((n, K))
    r[seed_idx, np.arange(K)] = 1.0
    restart = np.zeros((n, K))
    restart[seed_idx, np.arange(K)] = 1 - d
    for _ in range(iters):
        acc = np.zeros((n, K))
        np.add.at(acc, dst, (r * inv[:, None])[src])
        r = restart + d * acc
    return r


@pytest.fixture(scope="module")
def g():
    return build_graph(rmat(9, 8, seed=21))


def test_ppr_matches_oracle(g):
    seeds = g.ids[[0, 5, 11]]
    res = personalized_pagerank(g, seeds, max_iters=10, engine="bsp")
    df = g.edges.to_pandas()
    expect = ppr_np(
        df["src"].to_numpy(), df["dst"].to_numpy(), g.num_vertices,
        np.searchsorted(g.ids, seeds),
    )
    assert np.allclose(res.state["rank"], expect, atol=1e-12)


def test_ppr_engines_agree(g):
    seeds = g.ids[[2, 3]]
    a = personalized_pagerank(g, seeds, max_iters=6, engine="bsp")
    b = personalized_pagerank(g, seeds, max_iters=6, engine="dataset")
    assert np.allclose(a.state["rank"], b.state["rank"], atol=1e-12)


def test_ppr_seed_mass(g):
    seeds = g.ids[[0]]
    res = personalized_pagerank(g, seeds, max_iters=30, tol=1e-10)
    r = res.state["rank"][:, 0]
    i0 = int(np.searchsorted(g.ids, seeds[0]))
    assert r[i0] == r.max()  # seed holds the largest score
    assert r.sum() <= 1.0 + 1e-9


def test_ppr_resume(g, tmp_path):
    seeds = g.ids[[1, 4]]
    full = personalized_pagerank(g, seeds, max_iters=8, checkpoint_dir=str(tmp_path / "a"))
    d = str(tmp_path / "b")
    personalized_pagerank(g, seeds, max_iters=3, checkpoint_dir=d)
    resumed = personalized_pagerank(g, seeds, max_iters=8, checkpoint_dir=d, resume=True)
    assert np.array_equal(full.state["rank"], resumed.state["rank"])
