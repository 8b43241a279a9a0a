"""Maximal independent set — deterministic distributed Luby.

Each round assigns every undecided vertex the priority

    p(v) = (splitmix64((id·GOLD) ⊕ round ⊕ seed) >> 38) · 2²⁶ + id

(top 26 hash bits for uniform randomness, the original id in the low
26 bits so priorities are UNIQUE — no tie-break ambiguity, and the
rule replays exactly in SQL, ``pipelines/oracles.py::mis_sql``). A
vertex joins the MIS when its priority beats every undecided
neighbor's; winners and their neighbors leave the undecided set.
Classic Luby: O(log V) rounds with high probability.

Distributed form: two ``gather_max_masked`` sweeps per round over the
undirected gather pool (self-loops dropped — a vertex must not block
itself); the driver holds only O(V) bitmaps.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..data_ops.dedup import _GOLD, _mix64
from ..engine.bsp import shared_pool
from ..graph import Graph

DEFAULT_MIS_SEED = 20260818
MAX_ROUNDS = 64


def maximal_independent_set(
    graph: Graph,
    *,
    seed: int = DEFAULT_MIS_SEED,
) -> pa.Table:
    """(vertex, in_mis) for every vertex; in_mis ∈ {0, 1}."""
    ids = graph.ids
    n = graph.num_vertices
    exact = n == 0 or int(ids.max()) < (1 << 26)
    pool = shared_pool(graph, view="undirected")

    und = np.ones(n, bool)
    mis = np.zeros(n, bool)
    rnd = 0
    ids_u = ids.astype(np.uint64)
    while und.any():
        rnd += 1
        if rnd > MAX_ROUNDS:
            raise RuntimeError(f"Luby MIS did not converge in {MAX_ROUNDS} rounds")
        h = _mix64(ids_u * _GOLD ^ np.uint64(rnd) ^ np.uint64(seed))
        if exact:
            # unique per vertex: hash in the high bits, id in the low
            p = ((h >> np.uint64(38)).astype(np.int64) << 26) + ids
        else:
            p = (h >> np.uint64(1)).astype(np.int64)  # collision ~V²/2⁶³
        nbr_max = pool.gather_max_masked(p, und)
        winners = und & (p > nbr_max)  # -1 sentinel: no undecided nbr ⇒ win
        blocked = pool.gather_max_masked(winners.astype(np.int64), winners) > 0
        mis |= winners
        und &= ~(winners | blocked)

    return pa.table(
        {"vertex": ids, "in_mis": mis.astype(np.int64)}
    )
