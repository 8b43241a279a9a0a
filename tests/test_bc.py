"""Betweenness centrality vs a single-process Brandes oracle."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from llama_ray.algos.bc import betweenness_centrality
from llama_ray.graph import build_graph


def brandes_np(src, dst, n, sources=None):
    out = [[] for _ in range(n)]
    for s, d in zip(src, dst):
        out[s].append(d)
    bc = np.zeros(n)
    for s in sources if sources is not None else range(n):
        # forward BFS
        dist = np.full(n, -1)
        sigma = np.zeros(n)
        dist[s] = 0
        sigma[s] = 1.0
        order = [s]
        q = [s]
        while q:
            nq = []
            for u in q:
                for w in out[u]:
                    if dist[w] == -1:
                        dist[w] = dist[u] + 1
                        nq.append(w)
                        order.append(w)
                    if dist[w] == dist[u] + 1:
                        sigma[w] += sigma[u]
            q = nq
        delta = np.zeros(n)
        for w in reversed(order):
            for x in out[w]:
                if dist[x] == dist[w] + 1:
                    delta[w] += sigma[w] / sigma[x] * (1 + delta[x])
        delta[s] = 0
        bc += delta
    return bc


CASES = {
    "chain5": ([0, 1, 2, 3], [1, 2, 3, 4]),
    "diamond": ([0, 0, 1, 2], [1, 2, 3, 3]),
    "k4": ([0, 0, 0, 1, 1, 2], [1, 2, 3, 2, 3, 3]),
}


@pytest.mark.parametrize("name", list(CASES))
def test_bc_exact_matches_brandes(name):
    src, dst = map(np.array, CASES[name])
    g = build_graph(
        rd.from_arrow(pa.table({"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())}))
    )
    got = betweenness_centrality(g, num_sources=None)  # all sources = exact
    ids = np.unique(np.concatenate([src, dst]))
    expect = brandes_np(
        np.searchsorted(ids, src), np.searchsorted(ids, dst), len(ids)
    )
    assert np.allclose(got, expect, atol=1e-9), (got, expect)


def test_bc_exact_source_batched():
    # Exact BC must be identical regardless of chunk size: chunked
    # accumulation (source_batch < K) is the O(source_batch*N)-memory
    # path that makes num_sources=None usable at real V.
    rng = np.random.default_rng(11)
    src = rng.integers(0, 30, 150)
    dst = rng.integers(0, 30, 150)
    g = build_graph(
        rd.from_arrow(pa.table({"src": pa.array(src), "dst": pa.array(dst)}))
    )
    ids = np.unique(np.concatenate([src, dst]))
    expect = brandes_np(np.searchsorted(ids, src), np.searchsorted(ids, dst), len(ids))
    for sb in (1, 5, 7, 1000):
        got = betweenness_centrality(g, num_sources=None, source_batch=sb)
        assert np.allclose(got, expect, atol=1e-9), sb


def test_bc_random_subset():
    rng = np.random.default_rng(5)
    src = rng.integers(0, 40, 200)
    dst = rng.integers(0, 40, 200)
    g = build_graph(
        rd.from_arrow(pa.table({"src": pa.array(src), "dst": pa.array(dst)}))
    )
    ids = np.unique(np.concatenate([src, dst]))
    ds_, dd_ = np.searchsorted(ids, src), np.searchsorted(ids, dst)
    # fixed sources → deterministic comparison
    sources = np.array([0, 3, 7, 11])
    got = betweenness_centrality(g, sources=sources)
    expect = brandes_np(ds_, dd_, len(ids), sources=sources.tolist())
    assert np.allclose(got, expect, atol=1e-9)


def test_pack_keys_int32_no_wrap():
    """dst arrives int32 for dense graphs; n * K > 2^31 must not wrap
    (ADVICE r3: dst[es] * K stayed int32 under NEP-50 weak scalars)."""
    from llama_ray.algos.bc import _pack_keys

    K = 64
    vid = np.array([40_000_000, 2**31 // K + 1], np.int32)  # vid*K crosses 2^31
    ks = np.array([3, 5], np.int64)
    keys = _pack_keys(vid, ks, K)
    assert keys.dtype == np.int64
    assert keys[0] == 40_000_000 * 64 + 3  # > 2^31: would be negative if wrapped
    assert (keys > 0).all()
    # round-trips back to (vertex, slot)
    assert (keys // K == vid.astype(np.int64)).all()
    assert (keys % K == ks).all()
