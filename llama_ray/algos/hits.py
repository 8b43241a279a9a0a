"""HITS (Kleinberg hubs & authorities) — the query-independent variant
iterated over the whole graph, as in the original mutual-reinforcement
formulation:

    a_k(v) = Σ_{(w,v)∈E} h_{k-1}(w)      (authority: sum of in-neighbor hubs)
    h_k(u) = Σ_{(u,v)∈E} a_k(v)          (hub: sum of out-neighbor authorities)

with an L1 normalization (scores sum to 1) after each half-step — the
choice of norm only rescales the fixpoint direction; L1 keeps every
step a plain sum, which the DuckDB oracle
(:func:`llama_ray.pipelines.oracles.hits_sql`) mirrors exactly.

The reference has no HITS task; this extends the §2.5 vertex-centric
family with the same machinery as PageRank: one ``gather_sum`` over
the forward (dst-range) pool for the authority half-step and one over
the reversed (src-range out-CSR) pool for the hub half-step. Both
pools are built once (``make_reverse_edges`` posture,
``ll_mlcsr_graph.h:955-1059``) and shared with any other algorithm on
the graph. Per iteration the driver holds two O(V) float64 vectors and
each actor scans only its contiguous edge range — the same
scale/skew envelope as PageRank BSP (BASELINE §3.2).

Duplicate stored edges each contribute, as everywhere else in the
engine (the reference iterates every stored edge); pass a deduped
graph for simple-graph semantics.
"""

from __future__ import annotations

import numpy as np

from ..engine.bsp import shared_pool
from ..graph import Graph

__all__ = ["hits"]


def hits(graph: Graph, *, max_iters: int = 5, tol: float | None = None):
    """Run ``max_iters`` synchronous HITS iterations (or stop early
    when the combined L1 change of both vectors drops below ``tol``).

    Returns ``(hub, authority, iters)`` — float64 arrays in dense
    vertex order (``graph.ids[i]`` ↔ ``hub[i]``), each summing to 1
    unless the graph has no edges (then all-zero).
    """
    n = graph.num_vertices
    if n == 0:
        z = np.zeros(0, np.float64)
        return z, z.copy(), 0
    h = np.full(n, 1.0 / n, np.float64)
    a = np.zeros(n, np.float64)
    if graph.num_edges == 0:
        return h, a, 0
    fwd = shared_pool(graph, view="forward")  # per-dst Σ over in-edges
    rev = shared_pool(graph, view="reversed")  # per-src Σ over out-edges
    iters = 0
    try:
        for _ in range(max_iters):
            a_new = fwd.gather_sum(h)
            s = a_new.sum()
            if s > 0:
                a_new /= s
            h_new = rev.gather_sum(a_new)
            s = h_new.sum()
            if s > 0:
                h_new /= s
            diff = float(np.abs(h_new - h).sum() + np.abs(a_new - a).sum())
            h, a = h_new, a_new
            iters += 1
            if tol is not None and diff < tol:
                break
    finally:
        fwd.shutdown()
        rev.shutdown()
    return h, a, iters
