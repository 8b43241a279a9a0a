"""4-clique (K4) counting — oriented triangle bases + pair matching.

Extends the degree-oriented triangle machinery (``triangles.py``;
reference intersection kernel `/root/reference/benchmark/benchmarks/
triangle_counting.h:531-567` — the reference stops at triangles, K4
is the natural next motif for a clique-density profile): under the
acyclic (degree, id) orientation every K4 {a,b,c,d} with a≺b≺c≺d is
found exactly once at its *base edge* (a, b) — c and d both close
triangles over (a, b), and the pair (c, d) must itself be an oriented
edge. Pipeline (nothing O(E) or O(T) ever lives on the driver):

1. shared oriented edge-key index (one distributed range sort,
   ``triangles.oriented_edge_index``);
2. triangle emission: per src-run wedge chunks KEEP the center vertex,
   probe the distributed key blocks for the closing edge
   (``_probe_mask``), and emit each matched triangle as a
   ``(base = a·n + b, third = c)`` row — a Dataset of O(T) rows;
3. one range sort by ``base``; within-run third-pairs (chunked with
   the same hub-bounded generator — a base in t triangles yields
   C(t,2) candidates, never materialized at once) probe the same key
   blocks for the (c, d) edge; interior runs count in-block, runs
   touching block edges (≤ 2 per block) stitch in a driver pass.

Per-K4 work is O(1) probes over the wedge bound's O(E^1.5) triangle
stream — the standard oriented k-clique bound (Chiba–Nishizeki).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from ..common import batch_to_numpy, check_boundary_size, per_block_results
from ..graph import Graph
from .triangles import (
    _count_wedges,
    _gen_wedge_chunks,
    _probe_mask,
    oriented_edge_index,
)


def four_clique_count(graph: Graph) -> int:
    """Exact number of 4-vertex cliques in the canonical undirected
    simple graph (self-loops and duplicate/reverse edges collapse,
    like :func:`~llama_ray.algos.triangles.triangle_count`)."""
    n = graph.num_vertices
    if n == 0 or graph.num_edges == 0:
        return 0
    if n >= (1 << 31):
        raise NotImplementedError("packed-key K4 valid to ~3e9 vertices; use 2-col struct sort")

    srt, refs, bounds_hi, deg, deg_ref, n = oriented_edge_index(graph)

    # ---- phase 1: emit triangles (base edge key, third vertex) ----
    def gen_triangles(tbl: pa.Table):
        empty = pa.table(
            {"base": pa.array([], pa.int64()), "third": pa.array([], pa.int64())}
        )
        if tbl.num_rows == 0 or "key" not in tbl.schema.names:
            yield empty
            return
        k = batch_to_numpy(tbl, "key")
        aa = k // n
        # interior runs only; boundary runs re-emit in the driver pass
        s0 = int(np.searchsorted(aa, aa[0], side="right"))
        s1 = int(np.searchsorted(aa, aa[-1], side="left"))
        kk = np.unique(k[s0:s1])
        dd = ray.get(deg_ref)
        cache: dict = {}
        any_out = False
        for ctr, x, y in _gen_wedge_chunks(kk // n, kk % n, dd, n, with_center=True):
            hit = _probe_mask(x * n + y, refs, bounds_hi, cache)
            if hit.any():
                any_out = True
                yield pa.table(
                    {"base": ctr[hit] * n + x[hit], "third": y[hit]}
                )
        if not any_out:
            yield empty

    tri = srt.map_batches(gen_triangles, batch_format="pyarrow", batch_size=None)

    # boundary runs of the edge-key blocks (≤ 2 per block, O(sqrt E)
    # rows each): their triangles join the same stream
    def boundary_block(tbl: pa.Table):
        if tbl.num_rows == 0 or "key" not in tbl.schema.names:
            return None
        k = batch_to_numpy(tbl, "key")
        aa = k // n
        return k[(aa == aa[0]) | (aa == aa[-1])]

    bparts = [r for r in per_block_results(srt, boundary_block) if r is not None and len(r)]
    if bparts:
        bk = np.unique(np.concatenate(bparts))
        check_boundary_size(len(bk), "four_clique_count")
        cache: dict = {}
        chunks = []
        for ctr, x, y in _gen_wedge_chunks(bk // n, bk % n, deg, n, with_center=True):
            hit = _probe_mask(x * n + y, refs, bounds_hi, cache)
            if hit.any():
                chunks.append(
                    pa.table({"base": ctr[hit] * n + x[hit], "third": y[hit]})
                )
        if chunks:
            tri = tri.union(rd.from_arrow(chunks))

    # ---- phase 2: per-base third pairs, probed as oriented edges ----
    tsrt = tri.sort("base").materialize()

    def count_block(tbl: pa.Table):
        if tbl.num_rows == 0 or "base" not in tbl.schema.names:
            return {"kind": np.empty(0, np.int64), "val": np.empty(0, np.int64)}
        base = batch_to_numpy(tbl, "base")
        third = batch_to_numpy(tbl, "third")
        if base[0] == base[-1]:
            # whole block is one base run → all rows are boundary
            s0 = s1 = len(base)
            bmask = np.ones(len(base), bool)
        else:
            s0 = int(np.searchsorted(base, base[0], side="right"))
            s1 = int(np.searchsorted(base, base[-1], side="left"))
            bmask = np.concatenate(
                [np.ones(s0, bool), np.zeros(s1 - s0, bool), np.ones(len(base) - s1, bool)]
            )
        t = 0
        if s1 - s0 >= 2:
            dd = ray.get(deg_ref)
            t = _count_wedges(base[s0:s1], third[s0:s1], dd, n, refs, bounds_hi)
        # boundary rows carry BOTH columns — pack (base, third) pairs
        # as two parallel value streams tagged kind 1 / 2
        return {
            "kind": np.concatenate(
                [[0], np.ones(int(bmask.sum()), np.int64), np.full(int(bmask.sum()), 2, np.int64)]
            ),
            "val": np.concatenate([[t], base[bmask], third[bmask]]),
        }

    total = 0
    b_base, b_third = [], []
    for t in tsrt.map_batches(
        count_block, batch_format="pyarrow", batch_size=None
    ).iter_batches(batch_format="pyarrow"):
        kind = batch_to_numpy(t, "kind")
        val = batch_to_numpy(t, "val")
        total += int(val[kind == 0].sum())
        b_base.append(val[kind == 1])
        b_third.append(val[kind == 2])
    bb = np.concatenate(b_base) if b_base else np.empty(0, np.int64)
    bt = np.concatenate(b_third) if b_third else np.empty(0, np.int64)
    if len(bb):
        check_boundary_size(len(bb), "four_clique_count")
        order = np.lexsort((bt, bb))
        total += _count_wedges(bb[order], bt[order], deg, n, refs, bounds_hi)
    return total
