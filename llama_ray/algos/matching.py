"""Maximal matching — deterministic distributed local-max greedy.

Every canonical undirected simple edge (a < b, self-loops dropped)
gets one static priority

    p(a, b) = splitmix64((a·GOLD) ⊕ (b·FNV) ⊕ seed) >> 1

(unique w.h.p.; a vanishing tie would stall a round and raises).  Each
round an edge joins the matching when its priority is the maximum
among all live edges incident to either endpoint (Manne–Bisseling
local-max); matched endpoints leave the live set.  With distinct
priorities the result is EXACTLY the sequential greedy matching in
decreasing-priority order, and the round count is O(log E) w.h.p.

Distributed form: the live edge set lives as Arrow block refs in the
object store end to end.  Per round three wave of plain Ray tasks over
the (shrinking) blocks — sparse per-vertex max partials, dominant-edge
selection, live filter — with O(V) driver state (vertex-max array +
matched bitmap, broadcast via ``ray.put``), the MIS/coloring envelope.
Direct tasks instead of Dataset executions because a round is tiny:
~20 rounds × 3 Dataset passes paid ~60 streaming-executor launches
(~4 s of fixed overhead at E=1M) for milliseconds of compute; task
waves over block refs are near-free and the filtered blocks never
route through the driver.  Nothing per-edge reaches the driver except
the matched edges themselves (≤ V/2 total).

Reference scope: matching is a standard batch-analytics companion to
the reference's MIS-style traversal templates (SURVEY §2.11); no
direct counterpart file.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from ..common import batch_to_numpy
from ..data_ops.dedup import _FNV, _GOLD, _mix64
from ..graph import Graph, canonical_undirected

DEFAULT_MATCHING_SEED = 20260818
MAX_ROUNDS = 64


def _edge_priority(a_orig: np.ndarray, b_orig: np.ndarray, seed: int) -> np.ndarray:
    h = _mix64(
        a_orig.astype(np.uint64) * _GOLD
        ^ b_orig.astype(np.uint64) * _FNV
        ^ np.uint64(seed)
    )
    return (h >> np.uint64(1)).astype(np.int64)


def _vmax_partial(tbl: pa.Table, ids: np.ndarray, seed: int):
    """Sparse (vertex, max incident priority) partial + live count."""
    s = batch_to_numpy(tbl, "src")
    d = batch_to_numpy(tbl, "dst")
    if len(s) == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64), 0
    p = _edge_priority(ids[s], ids[d], seed)
    verts = np.concatenate([s, d])
    ps = np.concatenate([p, p])
    order = np.argsort(verts, kind="stable")
    verts, ps = verts[order], ps[order]
    starts = np.flatnonzero(np.concatenate([[True], verts[1:] != verts[:-1]]))
    return verts[starts], np.maximum.reduceat(ps, starts), len(s)


def _dominant(tbl: pa.Table, ids: np.ndarray, vmax: np.ndarray, seed: int):
    """This block's locally-dominant edges (dense endpoints)."""
    s = batch_to_numpy(tbl, "src")
    d = batch_to_numpy(tbl, "dst")
    if len(s) == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    p = _edge_priority(ids[s], ids[d], seed)
    dom = (p == vmax[s]) & (p == vmax[d])
    return s[dom], d[dom]


def _live_filter(tbl: pa.Table, matched: np.ndarray) -> pa.Table:
    """Drop edges incident to a matched vertex."""
    s = batch_to_numpy(tbl, "src")
    d = batch_to_numpy(tbl, "dst")
    keep = ~(matched[s] | matched[d])
    return pa.table({"src": pa.array(s[keep]), "dst": pa.array(d[keep])})


def maximal_matching(graph: Graph, *, seed: int = DEFAULT_MATCHING_SEED) -> pa.Table:
    """(a, b) rows (original ids, a < b) of the greedy maximal
    matching by decreasing edge-hash priority."""
    cg = canonical_undirected(graph)
    ids = cg.ids
    n = cg.num_vertices
    if n == 0:
        return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})

    vmax_task = ray.remote(_vmax_partial)
    dom_task = ray.remote(_dominant)
    filt_task = ray.remote(_live_filter)

    ids_ref = ray.put(ids)
    blocks = list(cg.edges.materialize().to_arrow_refs())
    matched = np.zeros(n, bool)
    out_a: list[np.ndarray] = []
    out_b: list[np.ndarray] = []

    rnd = 0
    while blocks:
        rnd += 1
        if rnd > MAX_ROUNDS:
            raise RuntimeError(f"local-max matching did not converge in {MAX_ROUNDS} rounds")
        parts = ray.get([vmax_task.remote(b, ids_ref, seed) for b in blocks])
        blocks = [b for b, pt in zip(blocks, parts) if pt[2] > 0]
        if not blocks:
            break
        vmax = np.full(n, -1, np.int64)
        for verts, ps, cnt in parts:
            if cnt:
                np.maximum.at(vmax, verts, ps)
        vmax_ref = ray.put(vmax)
        doms = ray.get([dom_task.remote(b, ids_ref, vmax_ref, seed) for b in blocks])
        ms = np.concatenate([d[0] for d in doms])
        md = np.concatenate([d[1] for d in doms])
        if len(ms) == 0:
            raise RuntimeError("local-max matching stalled (priority tie)")
        matched[ms] = True
        matched[md] = True
        out_a.append(ids[ms])
        out_b.append(ids[md])
        m_ref = ray.put(matched)
        # the filtered blocks stay in the object store as refs — the
        # driver never sees edge rows
        blocks = [filt_task.remote(b, m_ref) for b in blocks]

    a = np.concatenate(out_a) if out_a else np.empty(0, np.int64)
    b = np.concatenate(out_b) if out_b else np.empty(0, np.int64)
    order = np.argsort(a, kind="stable")
    return pa.table({"a": pa.array(a[order]), "b": pa.array(b[order])})
