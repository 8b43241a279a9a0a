"""Edge canonicalization — the per-record transforms the reference
applies during load (direction modes ``ll_config.h:49-51``, dedup
``ll_load_utils.h:399-505``, max-node-id ``ll_load_utils.h:422-423``).

All pure, vectorized ``map_batches`` transforms over Arrow batches
except dedup, which is a hash shuffle on the (src, dst) pair — the
distributed equivalent of the reference's sort-then-skip-equal
(`/root/reference/llama/include/llama/ll_load_utils.h:465-505`).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from ..common import SRC, DST, WEIGHT, batch_to_numpy, per_block_results
from ..graph import undirect

# Re-export: undirected-double lives in graph.py (used by algorithms too).
undirected_double = undirect


def undirected_ordered(edges: rd.Dataset, *, drop_self_loops: bool = False) -> rd.Dataset:
    """Canonicalize each edge so ``src <= dst`` (reference ``-O`` /
    ``LL_L_UNDIRECTED_ORDERED``, ``ll_load_utils.h:410-414``)."""

    def canon(batch: pa.Table) -> pa.Table:
        src = batch_to_numpy(batch, SRC)
        dst = batch_to_numpy(batch, DST)
        lo = np.minimum(src, dst)
        hi = np.maximum(src, dst)
        if drop_self_loops:
            keep = lo != hi
            lo, hi = lo[keep], hi[keep]
        return pa.table({SRC: lo, DST: hi})

    return edges.select_columns([SRC, DST]).map_batches(canon, batch_format="pyarrow")


def dedup_edges(edges: rd.Dataset, *, weights: str = "none", num_rows_hint: int | None = None) -> rd.Dataset:
    """Exact (src, dst) dedup — the distributed equivalent of the
    reference's sort-then-skip-equal (``ll_load_utils.h:465-505``),
    implemented literally: a distributed ``sort(['src','dst'])`` (the
    range shuffle; ~3× cheaper than Ray's groupby-aggregate at equal
    row counts) followed by a vectorized consecutive-run dedup per
    block. Pairs equal to a block's first or last value may span
    blocks, so they are excluded from the in-block pass and resolved
    in a second, tiny pass (≤ 2 pairs per block to the driver).

    ``weights``:
      - ``"none"``  → distinct pairs only (reference ``-D`` dedup);
      - ``"count"`` → add ``weight`` = duplicate multiplicity — the
        streaming "weights instead of duplicate edges" semantic
        (``ll_writable_graph.h:725-779``);
      - ``"sum"``   → sum an existing ``weight`` column per pair.

    Works for arbitrary int64 ids (no key packing): run boundaries are
    detected by consecutive (src, dst) inequality on the sorted data.
    """
    if weights not in ("none", "count", "sum"):
        raise ValueError(f"unknown weights mode: {weights}")
    cols = [SRC, DST] if weights != "sum" else [SRC, DST, WEIGHT]
    # coalesce before the sort: Ray's range sort costs scale with the
    # input block count (320 small union blocks sorted ~18× slower
    # than the same rows in 32), so ~1 block/CPU first
    from ..graph import target_num_blocks

    srt = (
        edges.select_columns(cols)
        .repartition(target_num_blocks(num_rows_hint))
        .sort([SRC, DST])
        .materialize()
    )

    def _runs(src: np.ndarray, dst: np.ndarray):
        first = np.ones(len(src), dtype=bool)
        first[1:] = (src[1:] != src[:-1]) | (dst[1:] != dst[:-1])
        return first

    def interior(batch: pa.Table):
        src = batch_to_numpy(batch, SRC)
        dst = batch_to_numpy(batch, DST)
        if len(src) == 0:
            out = {SRC: src, DST: dst}
            if weights != "none":
                out[WEIGHT] = np.empty(0, np.float64)
            return out
        edge_mask = ((src == src[0]) & (dst == dst[0])) | ((src == src[-1]) & (dst == dst[-1]))
        keep = ~edge_mask
        s, d = src[keep], dst[keep]
        first = _runs(s, d)
        out = {SRC: s[first], DST: d[first]}
        if weights == "count":
            starts = np.flatnonzero(first)
            ends = np.append(starts[1:], len(s))
            out[WEIGHT] = (ends - starts).astype(np.float64)
        elif weights == "sum":
            w = batch_to_numpy(batch, WEIGHT).astype(np.float64)[keep]
            starts = np.flatnonzero(first)
            out[WEIGHT] = np.add.reduceat(w, starts) if len(starts) else np.empty(0)
        return out

    def boundary_block(batch: pa.Table):
        """First/last-run rows of one sorted block, run-collapsed —
        runs as a plain Ray task per block ref (no Dataset pass)."""
        if batch.num_rows == 0 or SRC not in batch.schema.names:
            return None
        src = batch_to_numpy(batch, SRC)
        dst = batch_to_numpy(batch, DST)
        edge_mask = ((src == src[0]) & (dst == dst[0])) | ((src == src[-1]) & (dst == dst[-1]))
        s, d = src[edge_mask], dst[edge_mask]
        first = _runs(s, d)
        out = {SRC: s[first], DST: d[first]}
        if weights == "count":
            starts = np.flatnonzero(first)
            ends = np.append(starts[1:], len(s))
            out[WEIGHT] = (ends - starts).astype(np.float64)
        elif weights == "sum":
            w = batch_to_numpy(batch, WEIGHT).astype(np.float64)[edge_mask]
            starts = np.flatnonzero(first)
            out[WEIGHT] = np.add.reduceat(w, starts) if len(starts) else np.empty(0)
        return out

    main = srt.map_batches(interior, batch_format="pyarrow", batch_size=None)

    bs, bd, bw = [], [], []
    for out in per_block_results(srt, boundary_block):
        if out is None:
            continue
        bs.append(out[SRC])
        bd.append(out[DST])
        if weights != "none":
            bw.append(out[WEIGHT])
    if bs:
        s = np.concatenate(bs)
        d = np.concatenate(bd)
        order = np.lexsort((d, s))
        s, d = s[order], d[order]
        first = _runs(s, d)
        cols_out = {SRC: s[first], DST: d[first]}
        if weights != "none":
            w = np.concatenate(bw)[order]
            starts = np.flatnonzero(first)
            cols_out[WEIGHT] = np.add.reduceat(w, starts) if len(starts) else np.empty(0)
        extra = rd.from_arrow(pa.table({k: pa.array(v) for k, v in cols_out.items()}))
        return main.union(extra)
    return main


def max_node_id(edges: rd.Dataset) -> int:
    """max(src, dst) over all edges; the reference's ``max_nodes - 1``
    (``ll_load_utils.h:422-423``). Per-batch partial max → driver."""

    def partial(batch: pa.Table):
        m = max(
            batch_to_numpy(batch, SRC).max(initial=np.iinfo(np.int64).min),
            batch_to_numpy(batch, DST).max(initial=np.iinfo(np.int64).min),
        )
        return {"m": np.array([m], dtype=np.int64)}

    best = np.iinfo(np.int64).min
    for b in edges.select_columns([SRC, DST]).map_batches(
        partial, batch_format="pyarrow"
    ).iter_batches(batch_format="pyarrow"):
        best = max(best, batch_to_numpy(b, "m").max())
    return int(best)
