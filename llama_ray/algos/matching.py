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

Distributed form: the live edge set stays a Ray Dataset end to end.
Per round, one ``map_batches`` pass emits sparse per-vertex max
partials (reduced into an O(V) driver array, like the MIS/coloring
frontier state), and a second pass with the broadcast (``ray.put``)
vertex-max + matched bitmap selects dominant edges and filters the
live set.  Nothing per-edge ever reaches the driver except the
matched edges themselves (≤ V/2 total).

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


def maximal_matching(graph: Graph, *, seed: int = DEFAULT_MATCHING_SEED) -> pa.Table:
    """(a, b) rows (original ids, a < b) of the greedy maximal
    matching by decreasing edge-hash priority."""
    cg = canonical_undirected(graph)
    ids = cg.ids
    n = cg.num_vertices
    if n == 0:
        return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})

    live = cg.edges.materialize()
    matched = np.zeros(n, bool)
    out_a: list[np.ndarray] = []
    out_b: list[np.ndarray] = []

    rnd = 0
    while live.count() > 0:
        rnd += 1
        if rnd > MAX_ROUNDS:
            raise RuntimeError(f"local-max matching did not converge in {MAX_ROUNDS} rounds")

        def vmax_partial(batch: pa.Table):
            s = batch_to_numpy(batch, "src")
            d = batch_to_numpy(batch, "dst")
            p = _edge_priority(ids[s], ids[d], seed)
            verts = np.concatenate([s, d])
            ps = np.concatenate([p, p])
            order = np.argsort(verts, kind="stable")
            verts, ps = verts[order], ps[order]
            starts = np.flatnonzero(np.concatenate([[True], verts[1:] != verts[:-1]]))
            return {
                "v": verts[starts],
                "p": np.maximum.reduceat(ps, starts),
            }

        vmax = np.full(n, -1, np.int64)
        for blk in live.map_batches(vmax_partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow", batch_size=None
        ):
            np.maximum.at(vmax, batch_to_numpy(blk, "v"), batch_to_numpy(blk, "p"))

        vmax_ref = ray.put(vmax)

        def dominate(batch: pa.Table, *, _vref=vmax_ref):
            vm = _vref if isinstance(_vref, np.ndarray) else ray.get(_vref)
            s = batch_to_numpy(batch, "src")
            d = batch_to_numpy(batch, "dst")
            p = _edge_priority(ids[s], ids[d], seed)
            dom = (p == vm[s]) & (p == vm[d])
            return {
                "src": s,
                "dst": d,
                "dom": dom,
            }

        tagged = live.map_batches(dominate, batch_format="pyarrow").materialize()
        new_s: list[np.ndarray] = []
        new_d: list[np.ndarray] = []
        for blk in tagged.iter_batches(batch_format="pyarrow", batch_size=None):
            dm = batch_to_numpy(blk, "dom").astype(bool)
            new_s.append(batch_to_numpy(blk, "src")[dm])
            new_d.append(batch_to_numpy(blk, "dst")[dm])
        ms = np.concatenate(new_s) if new_s else np.empty(0, np.int64)
        md = np.concatenate(new_d) if new_d else np.empty(0, np.int64)
        if len(ms) == 0:
            raise RuntimeError("local-max matching stalled (priority tie)")
        matched[ms] = True
        matched[md] = True
        out_a.append(ids[ms])
        out_b.append(ids[md])

        mref = ray.put(matched)

        def still_live(batch: pa.Table, *, _mref=mref):
            mm = _mref if isinstance(_mref, np.ndarray) else ray.get(_mref)
            s = batch_to_numpy(batch, "src")
            d = batch_to_numpy(batch, "dst")
            keep = ~(mm[s] | mm[d])
            return {"src": s[keep], "dst": d[keep]}

        live = tagged.select_columns(["src", "dst"]).map_batches(
            still_live, batch_format="pyarrow"
        ).materialize()

    a = np.concatenate(out_a) if out_a else np.empty(0, np.int64)
    b = np.concatenate(out_b) if out_b else np.empty(0, np.int64)
    order = np.argsort(a, kind="stable")
    return pa.table({"a": pa.array(a[order]), "b": pa.array(b[order])})
