"""Triangle counting — degree-oriented wedge matching.

The reference counts triangles with in-memory sorted-adjacency
intersections (`/root/reference/benchmark/benchmarks/triangle_counting.h:531-567`
merge / binary-search kernel; the ``tc_od`` variant requires a
canonicalized ``-OD`` load: src<dst, deduped). Distributed form:

1. canonicalize: u<v, drop self-loops, exact dedup (``-OD``);
2. **orient** each edge from lower (degree, id) to higher endpoint —
   every vertex's oriented out-degree is O(sqrt E), which bounds the
   wedge work at hubs (the hub-splitting requirement of SURVEY §4);
3. **wedges**: for each vertex, all pairs of its oriented
   out-neighbors are candidate closing edges. Wedge generation is a
   fully vectorized multi-run kernel over the src-sorted edge table —
   runs that touch a batch boundary are excluded and handled in a
   small second pass (collected to the driver: ≤ 2 runs per block,
   each O(sqrt E) long);
4. **match**: a wedge closes a triangle iff its oriented pair is an
   edge. The oriented edge-key set (one int64 per edge) is broadcast
   via ``ray.put`` and probed with ``np.searchsorted`` inside the
   wedge batches — the broadcast-the-small-side join. Each batch
   emits a single count; no wedge ever leaves its task.

Every triangle is counted exactly once, at its (degree, id)-minimal
vertex. Keys pack as ``a * N + b`` (valid while N < 3e9; the
shuffle-join formulation with a two-column groupby is the path past
that, and past edge-key sets too big to broadcast).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from ..common import batch_to_numpy
from ..graph import Graph


def _pairs_multirun(run_ids: np.ndarray):
    """All within-run index pairs (i, j), i<j, of a run-labelled sorted
    array. Vectorized: no Python per run. Returns (left, right) index
    arrays into the input."""
    n = len(run_ids)
    if n < 2:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    # run starts and lengths
    starts = np.flatnonzero(np.concatenate([[True], run_ids[1:] != run_ids[:-1]]))
    lengths = np.diff(np.concatenate([starts, [n]]))
    within = np.arange(n) - np.repeat(starts, lengths)
    reps = np.repeat(lengths, lengths) - 1 - within  # pairs each element leads
    total = int(reps.sum())
    if total == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    left = np.repeat(np.arange(n), reps)
    cum = np.concatenate([[0], np.cumsum(reps)])
    seq = np.arange(total) - np.repeat(cum[:-1], reps) + 1
    right = left + seq
    return left, right


def _orient_pairs(x, y, deg):
    """Orient each (x, y) pair by the (degree, id) comparator."""
    fwd = (deg[x] < deg[y]) | ((deg[x] == deg[y]) & (x < y))
    return np.where(fwd, x, y), np.where(fwd, y, x)


def triangle_count(graph: Graph) -> int:
    n = graph.num_vertices
    if n == 0:
        return 0
    if n >= (1 << 31):
        raise NotImplementedError("packed-key TC valid to ~3e9 vertices; use 2-col groupby")

    # --- canonical edge keys (u < v, dedup, no self-loops) ------------
    def canon(batch: pa.Table):
        s = batch_to_numpy(batch, "src")
        d = batch_to_numpy(batch, "dst")
        lo = np.minimum(s, d)
        hi = np.maximum(s, d)
        keep = lo != hi
        return {"key": np.unique(lo[keep] * n + hi[keep])}

    parts = []
    for b in graph.edges.map_batches(canon, batch_format="pyarrow").iter_batches(
        batch_size=1 << 20, batch_format="pyarrow"
    ):
        parts.append(batch_to_numpy(b, "key"))
    if not parts:
        return 0
    keys = np.unique(np.concatenate(parts))  # O(E) driver memory; see module doc
    u = keys // n
    v = keys % n

    deg = np.zeros(n, dtype=np.int64)
    np.add.at(deg, u, 1)
    np.add.at(deg, v, 1)

    a, b = _orient_pairs(u, v, deg)
    edge_keys = np.sort(a * n + b)
    edge_keys_ref = ray.put(edge_keys)
    deg_ref = ray.put(deg)

    oriented = (
        rd.from_arrow(pa.table({"src": a, "dst": b}))
        .sort("src")
        .materialize()
    )

    def count_interior(batch: pa.Table):
        """Wedge-match all runs fully interior to this batch."""
        src = batch_to_numpy(batch, "src")
        dst = batch_to_numpy(batch, "dst")
        interior = (src != src[0]) & (src != src[-1])
        src_i, dst_i = src[interior], dst[interior]
        if len(src_i) < 2:
            return {"t": np.array([0], np.int64)}
        li, ri = _pairs_multirun(src_i)
        dd = ray.get(deg_ref)
        pa_, pb_ = _orient_pairs(dst_i[li], dst_i[ri], dd)
        ek = ray.get(edge_keys_ref)
        wk = pa_ * n + pb_
        pos = np.searchsorted(ek, wk)
        pos = np.clip(pos, 0, len(ek) - 1)
        return {"t": np.array([int((ek[pos] == wk).sum())], np.int64)}

    def boundary_rows(batch: pa.Table):
        src = batch_to_numpy(batch, "src")
        dst = batch_to_numpy(batch, "dst")
        m = (src == src[0]) | (src == src[-1])
        return {"bsrc": src[m], "bdst": dst[m]}

    total = 0
    for blk in oriented.map_batches(
        count_interior, batch_format="pyarrow", batch_size=None
    ).iter_batches(batch_format="pyarrow"):
        total += int(batch_to_numpy(blk, "t").sum())

    # --- boundary runs: collected (≤ 2 runs per block, O(sqrt E) each)
    bs, bd = [], []
    for blk in oriented.map_batches(
        boundary_rows, batch_format="pyarrow", batch_size=None
    ).iter_batches(batch_format="pyarrow"):
        bs.append(batch_to_numpy(blk, "bsrc"))
        bd.append(batch_to_numpy(blk, "bdst"))
    if bs:
        bsrc = np.concatenate(bs)
        bdst = np.concatenate(bd)
        order = np.lexsort((bdst, bsrc))
        bsrc, bdst = bsrc[order], bdst[order]
        li, ri = _pairs_multirun(bsrc)
        if len(li):
            pa_, pb_ = _orient_pairs(bdst[li], bdst[ri], deg)
            wk = pa_ * n + pb_
            pos = np.clip(np.searchsorted(edge_keys, wk), 0, len(edge_keys) - 1)
            total += int((edge_keys[pos] == wk).sum())
    return total
