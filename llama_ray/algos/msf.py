"""Minimum spanning forest — distributed Borůvka.

The reference's analytics family is vertex-centric iteration over a
shared CSR (SURVEY §2.5); Borůvka is the classic member that LLAMA
does not ship, expressed here in the repo's standard superstep shape:
per-round per-edge-block Ray tasks against a driver-broadcast O(V)
component array, O(log V) rounds.

Determinism: edges are totally ordered by the lexicographic key
``(weight, a, b)`` with ``a < b`` the canonical (dense) endpoints.
Dense indices are order-isomorphic to the sorted original ids, so the
order — and therefore the unique forest it induces — replays exactly
in SQL (``pipelines/oracles.py::msf_sql``, the unrolled-round oracle
pattern of MIS/WCC).

Per round:

1. every edge block (one plain Ray task per pinned block ref, the
   ``Graph.edge_block_refs`` pattern) reduces to ≤ 1 candidate edge
   per (component, side) — the block-local minimum cross-component
   edge for each incident component;
2. the driver lexsort-merges the partials (≤ 2·cross-edges rows in
   round 1, geometrically shrinking after) and keeps the global
   minimum per component;
3. components hook along their chosen edge. The hooking digraph has
   out-degree 1 and — because each pointer follows a *minimum* edge
   under a strict total order — its only cycles are 2-cycles (keys
   weakly decrease around any cycle, hence are all equal, hence the
   same edge). 2-cycles are broken toward the smaller component id,
   then pointer doubling contracts every tree to its root.

Components at least halve each round, so ≤ ⌈log2 V⌉ rounds; with all
weights distinct under the total order the chosen edge set is exactly
the unique MSF (cut property per component, no cycles ever formed).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from ..common import SRC, DST, WEIGHT, batch_to_numpy
from ..graph import Graph

MAX_ROUNDS = 64


def _block_min_edges(block: pa.Table, comp: np.ndarray, weight_col: str):
    """Per-component minimum cross-component edge within one block.

    Returns (c, w, a, b) arrays with one row per component incident to
    at least one cross edge in this block — the block-local combiner
    that keeps the driver merge at O(P · C_active) instead of O(E).
    """
    if block.num_rows == 0 or SRC not in block.schema.names:
        return None
    s = batch_to_numpy(block, SRC).astype(np.int64, copy=False)
    d = batch_to_numpy(block, DST).astype(np.int64, copy=False)
    w = batch_to_numpy(block, weight_col)
    cs = comp[s]
    cd = comp[d]
    m = cs != cd
    if not m.any():
        return None
    s, d, w, cs, cd = s[m], d[m], w[m], cs[m], cd[m]
    # each cross edge is a candidate for BOTH endpoint components
    c = np.concatenate([cs, cd])
    ww = np.concatenate([w, w])
    aa = np.concatenate([s, s])
    bb = np.concatenate([d, d])
    order = np.lexsort((bb, aa, ww, c))  # by (c, w, a, b)
    c, ww, aa, bb = c[order], ww[order], aa[order], bb[order]
    first = np.ones(len(c), dtype=bool)
    first[1:] = c[1:] != c[:-1]
    return c[first], ww[first], aa[first], bb[first]


def minimum_spanning_forest(graph: Graph, *, weight_col: str = WEIGHT) -> pa.Table:
    """Edges of the minimum spanning forest as (src, dst, weight) in
    original ids with ``src < dst``.

    ``graph`` must be built from canonically ordered weighted pairs
    (``src < dst``, one row per undirected pair) so each undirected
    edge appears exactly once.
    """
    n = graph.num_vertices
    ids = graph.ids
    if n == 0:
        return pa.table(
            {
                SRC: pa.array([], pa.int64()),
                DST: pa.array([], pa.int64()),
                WEIGHT: pa.array([], pa.float64()),
            }
        )
    refs = graph.edge_block_refs()
    task = ray.remote(_block_min_edges)

    comp = np.arange(n, dtype=np.int64)
    idx = np.arange(n, dtype=np.int64)
    out_a, out_b, out_w = [], [], []
    for _ in range(MAX_ROUNDS):
        comp_ref = ray.put(comp)
        parts = [p for p in ray.get([task.remote(r, comp_ref, weight_col) for r in refs]) if p is not None]
        if not parts:
            break
        c = np.concatenate([p[0] for p in parts])
        w = np.concatenate([p[1] for p in parts])
        a = np.concatenate([p[2] for p in parts])
        b = np.concatenate([p[3] for p in parts])
        order = np.lexsort((b, a, w, c))
        c, w, a, b = c[order], w[order], a[order], b[order]
        first = np.ones(len(c), dtype=bool)
        first[1:] = c[1:] != c[:-1]
        c, w, a, b = c[first], w[first], a[first], b[first]

        # forest edges this round: both endpoint components may choose
        # the same edge — dedup on (a, b)
        eorder = np.lexsort((b, a))
        ea, eb, ew = a[eorder], b[eorder], w[eorder]
        efirst = np.ones(len(ea), dtype=bool)
        efirst[1:] = (ea[1:] != ea[:-1]) | (eb[1:] != eb[:-1])
        out_a.append(ea[efirst])
        out_b.append(eb[efirst])
        out_w.append(ew[efirst])

        # hook each choosing component to the other endpoint's component
        parent = idx.copy()
        other = np.where(comp[a] == c, comp[b], comp[a])
        parent[c] = other
        # break the mutual-choice 2-cycles toward the smaller id
        two = (parent[parent] == idx) & (idx < parent)
        parent[two] = idx[two]
        # pointer doubling to the roots
        while True:
            nxt = parent[parent]
            if np.array_equal(nxt, parent):
                break
            parent = nxt
        comp = parent[comp]
    else:
        raise RuntimeError(f"Borůvka did not converge in {MAX_ROUNDS} rounds")

    a = np.concatenate(out_a) if out_a else np.empty(0, np.int64)
    b = np.concatenate(out_b) if out_b else np.empty(0, np.int64)
    w = np.concatenate(out_w) if out_w else np.empty(0, np.float64)
    return pa.table(
        {
            SRC: pa.array(ids[a], pa.int64()),
            DST: pa.array(ids[b], pa.int64()),
            WEIGHT: pa.array(w.astype(np.float64), pa.float64()),
        }
    )
