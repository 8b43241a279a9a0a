"""DAG layering — longest-path levels (parallel topological depth).

Beyond the reference's task registry; added because dependency-graph
scheduling (build graphs, dataflow DAGs, citation chains) wants each
vertex's *level*: the length of the longest directed path ending at
it.  Level-L vertices can all run once levels < L are done, so the
layer vector IS the maximally-parallel topological schedule, and
``max(layer)`` is the critical-path length.

Input contract: an ACYCLIC edge set.  The natural one here is the
canonical undirected graph's own edge list (``canonical_undirected``
stores each edge as ``src < dst``, so the edge set is a DAG by
construction — the standard acyclic orientation of a link graph).  On
a cycle the fixpoint would keep relaxing; the ``max_iters`` cap
raises rather than returning wrong levels, which doubles as a cheap
cycle DETECTOR: layers converge within V rounds iff the input is a
DAG.

Algorithm: monotone relaxation with a dirty frontier, the SSSP shape
with max-plus instead of min-plus —

    layer_0(v)   = 0
    layer_k+1(v) = max(layer_k(v), 1 + max_{(u,v)∈E, u dirty} layer_k(u))

Each round is ONE ``gather_max_masked`` over the pinned dst-range
pool (the SCC forward-coloring combine, reused verbatim); only
vertices whose layer changed last round scatter, so late rounds touch
a shrinking frontier.  Rounds to converge = DAG depth.  All integer,
so the result is exact in any engine/layout and mirrored by a
state-carrying recursive CTE in DuckDB.
"""

from __future__ import annotations

import numpy as np

from ..engine.superstep import SuperstepResult
from ..graph import Graph


def dag_layers(graph: Graph, *, max_iters: int = 100_000) -> SuperstepResult:
    """``state['layer'][i]`` = longest-path level of dense vertex ``i``
    over the graph's directed edges (callers pass a canonical graph
    for the acyclic-orientation semantics). Raises if the fixpoint has
    not converged after ``max_iters`` rounds (≥ V rounds ⇒ a cycle)."""
    n = graph.num_vertices
    if n == 0:
        return SuperstepResult({"layer": np.empty(0, np.int64)}, 0, True, [])

    from ..engine.bsp import shared_pool

    gat = shared_pool(graph)  # forward view: dst-range in-CSR
    layer = np.zeros(n, np.int64)
    dirty = np.ones(n, bool)
    metrics = []
    rounds = 0
    try:
        while dirty.any():
            if rounds >= max_iters or rounds > n:
                raise RuntimeError(
                    f"dag_layers did not converge after {rounds} rounds "
                    f"(V={n}): the edge set contains a directed cycle"
                )
            cand = gat.gather_max_masked(layer, dirty)
            new = np.maximum(layer, np.where(cand >= 0, cand + 1, np.int64(0)))
            dirty = new != layer
            changed = int(dirty.sum())
            layer = new
            rounds += 1
            metrics.append(
                {
                    "iteration": rounds - 1,
                    "diff": float(changed),
                    "edges_processed": graph.num_edges,
                    "seconds": 0.0,
                }
            )
    finally:
        gat.shutdown()
    return SuperstepResult({"layer": layer}, rounds, True, metrics)
