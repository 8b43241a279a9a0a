"""Betweenness centrality — Brandes, batched multi-source.

Reference: exact BC iterates Brandes over *every* source
(`/root/reference/benchmark/benchmarks/bc_adj.h:55-210`); ``bc_random``
approximates with K=100 random sources (``bc_random.h:120-220``),
accumulating BC[v] += delta[v] per source with no normalization.

Distributed form: all K sources run *simultaneously* with (K, N)
state matrices (dist, sigma, delta) — one set of edge scans per BFS
level instead of per source per level:

- forward: level-synchronous BFS counting shortest paths; scatter
  over out-edges of each source's frontier emits (dst, source,
  sigma-contribution) partials, combined per batch, summed on the
  driver; newly reached vertices get dist=L, sigma=Σ.
- backward: levels deepest→shallowest; for edges on shortest-path
  DAGs (dist[src]+1 == dist[dst] == L), scatter
  sigma[src]/sigma[dst] * (1 + delta[dst]) back to src.

Per-edge work is O(E × depth) total for all K sources. Keys pack as
``dst * K + source`` in int64 (edge batches arrive int32 for dense
graphs — cast before multiplying, n × source_batch can exceed 2^31).

Memory: (K, N) float64 state is K×8 bytes per vertex. To keep exact
BC (``num_sources=None`` — the reference's every-source ``bc_adj``
mode) usable beyond toy graphs, sources run in chunks of
``source_batch`` (default 64) and per-chunk deltas accumulate into a
single length-N vector — peak state is O(source_batch × N), never
O(N²), at the cost of one edge-scan sweep per chunk per level.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from ..common import batch_to_numpy, sparse_partial_sum
from ..graph import Graph


def _pack_keys(vid: np.ndarray, ks: np.ndarray, K: int) -> np.ndarray:
    """Pack (vertex, source-slot) into int64 ``vid * K + ks``.

    ``vid`` arrives int32 for dense graphs; the product must be taken
    in int64 or it wraps once n × K > 2^31 (n > ~33M at K=64)."""
    return vid.astype(np.int64, copy=False) * K + ks


def betweenness_centrality(
    graph: Graph,
    *,
    num_sources: int | None = 16,
    seed: int = 42,
    sources: np.ndarray | None = None,
    source_batch: int = 64,
) -> np.ndarray:
    """BC scores (unnormalized, reference semantics). ``sources=None``
    with ``num_sources=None`` runs every vertex (exact ``bc_adj``);
    otherwise K seeded-random distinct sources (``bc_random``).

    Sources run in chunks of ``source_batch`` so peak state is
    O(source_batch × N) regardless of K — exact mode never allocates
    (N, N)."""
    n = graph.num_vertices
    if n == 0:
        return np.empty(0)
    if sources is None:
        if num_sources is None or num_sources >= n:
            sources = np.arange(n)
        else:
            rng = np.random.default_rng(seed)
            sources = rng.choice(n, size=num_sources, replace=False)
    sources = np.asarray(sources, np.int64)
    bc = np.zeros(n, np.float64)
    for lo in range(0, len(sources), source_batch):
        bc += _bc_source_chunk(graph, sources[lo : lo + source_batch])
    return bc


def _bc_source_chunk(graph: Graph, sources: np.ndarray) -> np.ndarray:
    """One Brandes sweep for ≤ ``source_batch`` simultaneous sources;
    returns the summed per-vertex delta contribution of this chunk."""
    n = graph.num_vertices
    K = len(sources)

    dist = np.full((K, n), -1, np.int64)
    sigma = np.zeros((K, n), np.float64)
    dist[np.arange(K), sources] = 0
    sigma[np.arange(K), sources] = 1.0
    edges = graph.edges

    # ---------------------------------------------------------- forward
    level = 0
    while True:
        frontier = dist == level  # (K, n)
        if not frontier.any():
            break
        state_ref = ray.put((frontier, sigma))

        def fwd(batch: pa.Table):
            fr, sg = ray.get(state_ref)
            src = batch_to_numpy(batch, "src")
            dst = batch_to_numpy(batch, "dst")
            ks, es = np.nonzero(fr[:, src])  # (source-idx, edge-idx) active
            if len(ks) == 0:
                return {"key": np.empty(0, np.int64), "v": np.empty(0, np.float64)}
            keys = _pack_keys(dst[es], ks, K)
            vals = sg[ks, src[es]]
            u, s = sparse_partial_sum(keys, vals)
            return {"key": u, "v": s}

        msgs = edges.map_batches(fwd, batch_format="pyarrow")
        ks_list, vs_list = [], []
        for b in msgs.iter_batches(batch_size=1 << 20, batch_format="pyarrow"):
            ks_list.append(batch_to_numpy(b, "key"))
            vs_list.append(batch_to_numpy(b, "v"))
        if not ks_list:
            break
        keys = np.concatenate(ks_list)
        vals = np.concatenate(vs_list)
        if len(keys) == 0:
            break
        u, s = sparse_partial_sum(keys, vals)
        tgt_v = u // K
        tgt_k = u % K
        new = dist[tgt_k, tgt_v] == -1
        if not new.any():
            break
        dist[tgt_k[new], tgt_v[new]] = level + 1
        sigma[tgt_k[new], tgt_v[new]] = s[new]
        level += 1

    max_level = level

    # --------------------------------------------------------- backward
    delta = np.zeros((K, n), np.float64)
    for L in range(max_level, 0, -1):
        state_ref = ray.put((dist, sigma, delta, L))

        def bwd(batch: pa.Table):
            dd, sg, dl, lvl = ray.get(state_ref)
            src = batch_to_numpy(batch, "src")
            dst = batch_to_numpy(batch, "dst")
            on_dag = (dd[:, src] == lvl - 1) & (dd[:, dst] == lvl)  # (K, B)
            ks, es = np.nonzero(on_dag)
            if len(ks) == 0:
                return {"key": np.empty(0, np.int64), "v": np.empty(0, np.float64)}
            contrib = sg[ks, src[es]] / sg[ks, dst[es]] * (1.0 + dl[ks, dst[es]])
            keys = _pack_keys(src[es], ks, K)
            u, s = sparse_partial_sum(keys, contrib)
            return {"key": u, "v": s}

        msgs = edges.map_batches(bwd, batch_format="pyarrow")
        ks_list, vs_list = [], []
        for b in msgs.iter_batches(batch_size=1 << 20, batch_format="pyarrow"):
            ks_list.append(batch_to_numpy(b, "key"))
            vs_list.append(batch_to_numpy(b, "v"))
        if ks_list:
            keys = np.concatenate(ks_list)
            vals = np.concatenate(vs_list)
            if len(keys):
                u, s = sparse_partial_sum(keys, vals)
                delta[u % K, u // K] = s

    # Brandes accumulates delta[v] for v != s only — remove each
    # source's own delta before summing
    delta[np.arange(K), sources] = 0.0
    return delta.sum(axis=0)
