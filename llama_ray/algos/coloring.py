"""Greedy graph coloring — deterministic Jones–Plassmann.

Every vertex gets the unique priority

    p(v) = (splitmix64((id·GOLD) ⊕ 1 ⊕ seed) >> 38) · 2²⁶ + id

(the MIS priority with a fixed round constant — hash randomness in the
high bits, the id in the low bits for uniqueness). Per round, an
uncolored vertex whose uncolored neighbors all have lower priority
takes the smallest color unused by its (already-colored) neighbors.
Because a vertex is colored only after every higher-priority neighbor,
the result equals sequential greedy coloring in decreasing-priority
order — a deterministic, partition-independent proper coloring, in
O(log V) rounds w.h.p. (Jones & Plassmann, SIAM JSC 1993).

Distributed form over the undirected gather pool (self-loops dropped):
one ``gather_max_masked`` (readiness) plus one ``gather_or`` per
64-color word (neighbor color masks) per round; the driver holds only
O(V) vectors. Color masks keep the "smallest free color" scan
vectorized — W = ⌈max_color/64⌉ words, typically 1.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..data_ops.dedup import _GOLD, _mix64
from ..engine.bsp import shared_pool
from ..graph import Graph

DEFAULT_COLOR_SEED = 20260818
MAX_ROUNDS = 256

__all__ = ["greedy_coloring"]


def _priorities(ids: np.ndarray, seed: int) -> np.ndarray:
    h = _mix64(ids.astype(np.uint64) * _GOLD ^ np.uint64(1) ^ np.uint64(seed))
    if len(ids) == 0 or int(ids.max()) < (1 << 26):
        return ((h >> np.uint64(38)).astype(np.int64) << 26) + ids
    return (h >> np.uint64(1)).astype(np.int64)  # collision ~V²/2⁶³


def greedy_coloring(graph: Graph, *, seed: int = DEFAULT_COLOR_SEED) -> pa.Table:
    """(vertex, color) proper coloring; colors are dense from 0."""
    ids = graph.ids
    n = graph.num_vertices
    pool = shared_pool(graph, view="undirected")
    p = _priorities(ids, seed)
    color = np.full(n, -1, np.int64)
    uncolored = np.ones(n, bool)
    rnd = 0
    while uncolored.any():
        rnd += 1
        if rnd > MAX_ROUNDS:
            raise RuntimeError(f"JP coloring did not converge in {MAX_ROUNDS} rounds")
        nbr_max = pool.gather_max_masked(p, uncolored)
        ready = uncolored & (p > nbr_max)  # -1 sentinel: no uncolored nbr ⇒ ready
        # neighbor color masks, one 64-color word at a time
        max_c = int(color.max())
        words = max_c // 64 + 1 if max_c >= 0 else 1
        chosen = np.full(n, -1, np.int64)
        remaining = ready.copy()
        for w in range(words):
            if not remaining.any():
                break
            in_word = (color >= 64 * w) & (color < 64 * (w + 1))
            mask = np.where(
                in_word, np.uint64(1) << (color % 64).astype(np.uint64), np.uint64(0)
            )
            used = pool.gather_or(mask)
            x = used[remaining]
            free_bit = (~x) & (x + np.uint64(1))  # lowest zero bit (0 if word full)
            has = free_bit != 0
            # exact: free_bit is a power of two ≤ 2^63, log2 exact in float64
            bit_idx = np.where(has, np.log2(free_bit.astype(np.float64) + (~has)), 0)
            idx = np.flatnonzero(remaining)
            take = idx[has]
            chosen[take] = 64 * w + bit_idx[has].astype(np.int64)
            remaining[take] = False
        if remaining.any():
            chosen[remaining] = 64 * words  # every known word full: open a new one
        color[ready] = chosen[ready]
        uncolored &= ~ready
    return pa.table({"vertex": ids, "color": color})
