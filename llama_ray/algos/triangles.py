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

    # Build the src-sorted oriented table with run-aligned,
    # wedge-work-balanced blocks. The edge keys are already on the
    # driver (the broadcast side), so the sort happens here; blocks
    # are split at run boundaries weighted by per-run C(len, 2) so a
    # hub's wedge work doesn't land in one task. At edge counts too
    # big for the driver, the distributed path is
    # ``dataset.sort('src')`` + the boundary pass below (which this
    # layout makes empty).
    order = np.lexsort((b, a))
    a_s, b_s = a[order], b[order]
    starts = np.flatnonzero(np.concatenate([[True], a_s[1:] != a_s[:-1]]))
    lengths = np.diff(np.concatenate([starts, [len(a_s)]]))
    work = lengths * (lengths - 1) // 2 + 1  # +1: row-scan floor
    cum = np.cumsum(work)
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    num_chunks = min(len(starts), max(1, cpus * 4))
    bounds = np.searchsorted(cum, np.linspace(0, cum[-1], num_chunks + 1)[1:-1])
    chunk_starts = np.unique(np.concatenate([[0], starts[np.minimum(bounds + 1, len(starts) - 1)], [len(a_s)]]))
    tables = [
        pa.table({"src": a_s[lo:hi], "dst": b_s[lo:hi]})
        for lo, hi in zip(chunk_starts[:-1], chunk_starts[1:])
        if hi > lo
    ]
    oriented = rd.from_arrow(tables).materialize()

    def count_wedges(batch: pa.Table):
        """Wedge-match every run in this batch (runs never span
        blocks: chunking above is run-aligned)."""
        src = batch_to_numpy(batch, "src")
        dst = batch_to_numpy(batch, "dst")
        if len(src) < 2:
            return {"t": np.array([0], np.int64)}
        li, ri = _pairs_multirun(src)
        if len(li) == 0:
            return {"t": np.array([0], np.int64)}
        dd = ray.get(deg_ref)
        pa_, pb_ = _orient_pairs(dst[li], dst[ri], dd)
        ek = ray.get(edge_keys_ref)
        wk = pa_ * n + pb_
        pos = np.searchsorted(ek, wk)
        pos = np.clip(pos, 0, len(ek) - 1)
        return {"t": np.array([int((ek[pos] == wk).sum())], np.int64)}

    total = 0
    for blk in oriented.map_batches(
        count_wedges, batch_format="pyarrow", batch_size=None
    ).iter_batches(batch_format="pyarrow"):
        total += int(batch_to_numpy(blk, "t").sum())
    return total
