"""4-cycle (square) counting — wedge aggregation over sorted runs.

The triangle-counting sibling (``triangle_counting.h`` family): the
number of 4-cycles equals Σ over unordered distance-≤2 pairs (u, w)
of C(cn(u, w), 2) / 2 — every square u–v–w–x is seen once per
diagonal {u, w} / {v, x} via the two common neighbors it contributes.
All integers, so the DuckDB oracle matches exactly.

Distributed shape: doubled adjacency range-sorted by center vertex;
each sorted block emits, per interior adjacency run, all neighbor
pairs as packed int64 keys (``min·n + max``) in bounded-size chunks;
the ≤2 runs touching a block edge are re-paired in one Ray task over
the collected boundary rows. Pair multiplicities come from
``common.group_sum_sorted`` (range sort + run reduceat, hot keys
merge via bounded partials), and the final Σ C(c, 2) reduces per
block to one driver addition.

Scale note: wedge volume is Σ_v C(deg(v), 2) — at 100 TB a 10^5+
-degree hub makes the exact count infeasible on any engine; the
mitigation is degree-capped sampling of hub adjacencies (the
``bc_random`` posture), which this module intentionally does not
silently apply.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from ..common import SRC, DST, batch_to_numpy, collect_boundary_runs, group_sum_sorted
from ..graph import Graph
from .triangles import _pairs_multirun

WEDGE_CHUNK = 1 << 20


def _run_pairs_keys(c: np.ndarray, nb: np.ndarray, n: int):
    """Packed pair keys for all within-run neighbor pairs of a
    center-sorted (c, nb) slice, yielded in bounded chunks."""
    starts = np.flatnonzero(np.concatenate([[True], c[1:] != c[:-1]]))
    lens = np.diff(np.append(starts, len(c)))
    work = lens * (lens - 1) // 2
    i = 0
    while i < len(starts):
        j = i
        tot = 0
        while j < len(starts) and (j == i or tot + work[j] <= WEDGE_CHUNK):
            tot += work[j]
            j += 1
        lo, hi = starts[i], starts[j - 1] + lens[j - 1]
        run_ids = np.repeat(np.arange(i, j), lens[i:j])
        li, ri = _pairs_multirun(run_ids)
        if len(li):
            x = nb[lo:hi][li]
            y = nb[lo:hi][ri]
            yield np.minimum(x, y).astype(np.int64) * n + np.maximum(x, y)
        i = j


def square_count(graph: Graph) -> pa.Table:
    """One row: (squares, closed_pairs) — the global 4-cycle count and
    the number of unordered vertex pairs with ≥ 2 common neighbors.
    ``graph`` must be canonical (src < dst once, simple)."""
    n = graph.num_vertices
    if n >= (1 << 31):
        raise NotImplementedError("square_count pair packing requires < 2^31 vertices")
    if n == 0 or graph.num_edges == 0:
        return pa.table(
            {
                "squares": pa.array([0], pa.int64()),
                "closed_pairs": pa.array([0], pa.int64()),
            }
        )

    def double(b: pa.Table):
        s = batch_to_numpy(b, SRC).astype(np.int64, copy=False)
        d = batch_to_numpy(b, DST).astype(np.int64, copy=False)
        return {"c": np.concatenate([s, d]), "nb": np.concatenate([d, s])}

    srt = (
        graph.edges.select_columns([SRC, DST])
        .map_batches(double, batch_format="pyarrow")
        .sort("c")
        .materialize()
    )

    def interior(tbl: pa.Table):
        empty = {"key": np.empty(0, np.int64), "cnt": np.empty(0, np.int64)}
        if tbl.num_rows == 0 or "c" not in tbl.schema.names:
            yield empty
            return
        c = batch_to_numpy(tbl, "c")
        inner = (c != c[0]) & (c != c[-1])
        if not inner.any():
            yield empty
            return
        nb = batch_to_numpy(tbl, "nb")[inner]
        got = False
        for keys in _run_pairs_keys(c[inner], nb, n):
            got = True
            yield {"key": keys, "cnt": np.ones(len(keys), np.int64)}
        if not got:
            yield empty

    wedges = srt.map_batches(interior, batch_format="pyarrow", batch_size=None)

    btbl = collect_boundary_runs(srt, "c", where="squares")
    if btbl is not None and btbl.num_rows:

        def boundary_pairs(t: pa.Table):
            c = batch_to_numpy(t, "c")
            nb = batch_to_numpy(t, "nb")
            order = np.argsort(c, kind="stable")
            parts = list(_run_pairs_keys(c[order], nb[order], n))
            k = (
                np.concatenate(parts)
                if parts
                else np.empty(0, np.int64)
            )
            return pa.table(
                {"key": pa.array(k, pa.int64()), "cnt": pa.array(np.ones(len(k), np.int64))}
            )

        bt = ray.get(ray.remote(boundary_pairs).remote(btbl))
        if bt.num_rows:
            wedges = wedges.union(rd.from_arrow(bt))

    counts = group_sum_sorted(wedges, "key", ["cnt"])

    def partial(tbl: pa.Table):
        if tbl.num_rows == 0 or "cnt" not in tbl.schema.names:
            return {"s": np.zeros(1, np.int64), "p": np.zeros(1, np.int64)}
        cc = batch_to_numpy(tbl, "cnt")
        return {
            "s": np.array([int((cc * (cc - 1) // 2).sum())], np.int64),
            "p": np.array([int((cc >= 2).sum())], np.int64),
        }

    tot = s = p = 0
    for b in counts.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        if b.num_rows == 0 or "s" not in b.schema.names:
            continue
        s += int(pa.compute.sum(b.column("s")).as_py() or 0)
        p += int(pa.compute.sum(b.column("p")).as_py() or 0)
    tot = s // 2
    return pa.table(
        {
            "squares": pa.array([tot], pa.int64()),
            "closed_pairs": pa.array([p], pa.int64()),
        }
    )
