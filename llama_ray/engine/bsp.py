"""BSP gather engine — partition-pinned actors holding the reverse CSR.

The scale architecture named in the north star: per-vertex messages
aggregate *where the edges live* instead of flowing through a
per-superstep shuffle. Setup is the reverse-CSR build of the
reference (``make_reverse_edges``,
`/root/reference/llama/include/llama/ll_mlcsr_graph.h:955-1059`):
each of P actors pins the edges whose ``dst`` falls in its contiguous
range ``[p·N/P, (p+1)·N/P)``, locally sorted by dst with precomputed
run offsets — its slice of the reference's in-CSR.

Build modes:
- ``"scan"`` (default): every actor scans all edge block refs
  (zero-copy plasma reads on one node) and keeps its dst-range. P
  parallel scans; no shuffle. On a multi-node cluster this becomes a
  P×E broadcast, so —
- ``"sort"``: a distributed ``sort('dst')`` range shuffle first, each
  actor then fetches only its contiguous blocks (O(E) traffic) — the
  multi-node path.

Per superstep:
- driver ``ray.put``s the per-vertex value vector once (zero-copy
  plasma reads in every actor — the distributed analogue of LLAMA's
  shared-memory ``pr[]`` random reads, ``pagerank.h:146-161``);
- every actor computes ``value[src]`` gathers + ``np.add.reduceat``
  (or ``minimum.reduceat``) over its dst runs — pure memory
  bandwidth, no Python loops, no per-superstep shuffle;
- each actor owns its dst range exclusively, so it returns a dense
  slice and driver assembly is a plain concatenation.

Per-superstep traffic is O(V) broadcast + O(V) results regardless of
E — the same envelope as any broadcast-state design; past ~1e9
vertices the value vector itself shards by the same dst ranges and
the driver drops out of the loop.
"""

from __future__ import annotations

import numpy as np
import ray

from ..graph import Graph


def _sort_block_by_dst(t):
    """Stable within-block sort by dst (build-time, one parallel pass)."""
    from ..common import sort_block_by_column

    return sort_block_by_column(t, "dst")


def _swap_sort_block(t, compact: bool = False):
    """Reversed direction of one dst-sorted edge block, self-loops
    dropped, re-sorted by the NEW dst (= original src): the only half
    of the undirected doubled view that needs materializing — the
    forward half is the graph's own dst-sorted blocks, reused
    zero-copy (measured 16× cheaper than doubling + re-sorting 2E
    rows at E=268M). ``compact`` stores ids as int32 (dense ids
    < 2^31): halves plasma, actor heap, and gather bandwidth."""
    import pyarrow as pa

    if t.num_rows == 0:
        return t
    src = t.column("src").combine_chunks().to_numpy(zero_copy_only=False)
    dst = t.column("dst").combine_chunks().to_numpy(zero_copy_only=False)
    keep = src != dst
    s, d = dst[keep], src[keep]  # swapped
    order = np.argsort(d, kind="stable")
    s, d = s[order], d[order]
    if compact:
        s, d = s.astype(np.int32), d.astype(np.int32)
    cols = {"src": s, "dst": d}
    if "weight" in t.schema.names:
        w = t.column("weight").combine_chunks().to_numpy(zero_copy_only=False)
        cols["weight"] = w[keep][order]
    return pa.table(cols)


def _split_block_by_ranges(tbl, bounds, cols, compact: bool = False):
    """Slice one dst-sorted block into the P dst-range sub-tables (the
    map side of a manual range shuffle, run as one Ray task per block
    with ``num_returns=P``): each gather actor then fetches only its
    own ~E/P rows instead of mapping every full block — at E=268M the
    P× full-block mapping dominated pool setup. ``compact`` casts id
    columns to int32 once per block so every sub-table (and the actor
    arrays built from them) is half-width."""
    import pyarrow as pa

    P = len(bounds) - 1
    if tbl.num_rows == 0 or "src" not in tbl.schema.names:
        # empty block — schema may be an upstream stage's; actors skip
        # zero-row tables without reading columns
        return tuple(tbl.slice(0, 0) for _ in range(P))
    tbl = tbl.select(cols)
    if compact and tbl.schema.field("src").type == pa.int64():
        new_cols = {}
        for name in tbl.schema.names:
            col = tbl.column(name)
            if name in ("src", "dst"):
                arr = col.combine_chunks().to_numpy(zero_copy_only=False)
                new_cols[name] = arr.astype(np.int32)
            else:
                new_cols[name] = col
        tbl = pa.table(new_cols)
    cuts = np.zeros(len(bounds), np.int64)
    dc = tbl.column("dst")
    for ci in range(dc.num_chunks):
        d = dc.chunk(ci).to_numpy(zero_copy_only=False)
        # block sorted by dst ⇒ per-chunk positions accumulate to the
        # table-level row offset of each bound
        cuts += np.searchsorted(d, bounds)
    return tuple(
        tbl.slice(int(cuts[p]), int(cuts[p + 1] - cuts[p])) for p in range(P)
    )


def _split_undirected_block(tbl, bounds, cols, compact: bool = False):
    """Fused map side of the undirected pool build: ONE task per
    dst-sorted base block emits, for each of the P dst ranges, a table
    whose two chunks are (a) the block's forward rows with dst in the
    range and (b) the swapped rows (dst, src) whose NEW dst falls in
    the range — each chunk internally dst-sorted, self-loops dropped.
    Replaces materializing the swapped half + a second split pass:
    the block is read once and never rewritten whole to plasma."""
    import pyarrow as pa

    P = len(bounds) - 1
    if tbl.num_rows == 0 or "src" not in tbl.schema.names:
        return tuple(tbl.slice(0, 0) for _ in range(P))
    src_c = tbl.column("src").combine_chunks().to_numpy(zero_copy_only=False)
    dst_c = tbl.column("dst").combine_chunks().to_numpy(zero_copy_only=False)
    keep = src_c != dst_c
    f_src, f_dst = src_c[keep], dst_c[keep]  # forward, still dst-sorted
    order = np.argsort(f_src, kind="stable")
    s_src, s_dst = f_dst[order], f_src[order]  # swapped, sorted by new dst
    if compact:
        f_src, f_dst = f_src.astype(np.int32), f_dst.astype(np.int32)
        s_src, s_dst = s_src.astype(np.int32), s_dst.astype(np.int32)
    w = sw_w = None
    if "weight" in cols and "weight" in tbl.schema.names:
        w = tbl.column("weight").combine_chunks().to_numpy(zero_copy_only=False)[keep]
        sw_w = w[order]
    f_cuts = np.searchsorted(f_dst, bounds)
    s_cuts = np.searchsorted(s_dst, bounds)
    outs = []
    for p in range(P):
        f0, f1 = int(f_cuts[p]), int(f_cuts[p + 1])
        s0, s1 = int(s_cuts[p]), int(s_cuts[p + 1])
        data = {
            "src": pa.chunked_array(
                [a for a in (f_src[f0:f1], s_src[s0:s1]) if len(a)]
                or [f_src[:0]]
            ),
            "dst": pa.chunked_array(
                [a for a in (f_dst[f0:f1], s_dst[s0:s1]) if len(a)]
                or [f_dst[:0]]
            ),
        }
        if w is not None:
            data["weight"] = pa.chunked_array(
                [a for a in (w[f0:f1], sw_w[s0:s1]) if len(a)] or [w[:0]]
            )
        outs.append(pa.table(data))
    return tuple(outs)


# Dirty-run recompute switches to the contiguous full gather above
# this fraction of dirty runs: the selected-run path materializes
# edge indices and pays a fancy gather per edge, which loses to the
# straight run-aligned sweep once most runs need recomputing
# (measured: LP at E=268M, where most labels flip every round).
_DIRTY_FULL_FRAC = 0.5


class _GatherPartition:
    """One contiguous dst-range of the reverse CSR, pinned in an actor."""

    def __init__(
        self,
        table_refs,
        lo: int,
        hi: int,
        weighted: bool,
        presorted: bool,
        block_sorted: bool = False,
        drop_loops: bool = False,
        compact: bool = False,
    ):
        idt = np.int32 if compact else np.int64
        srcs, dsts, ws = [], [], []
        # Per-chunk zero-copy views: combine_chunks() COPIES the whole
        # column even when it already has one chunk (measured: the
        # copy, × P actors × all blocks, dominated pool setup), while
        # chunk(i).to_numpy() on a no-null primitive column is a view.
        for r in table_refs:
            t = ray.get(r)
            if t.num_rows == 0:
                continue
            sc = t.column("src")
            dc = t.column("dst")
            wc = t.column("weight") if weighted else None
            for ci in range(dc.num_chunks):
                dst = dc.chunk(ci).to_numpy(zero_copy_only=False)
                if len(dst) == 0:
                    continue
                if block_sorted or presorted:
                    # chunks sorted by dst (one parallel pass at build,
                    # or Ray's range sort): binary-search the range and
                    # slice — O(rows kept) instead of an O(chunk) mask
                    # scan per actor (P× redundant work).
                    i0 = int(np.searchsorted(dst, lo))
                    i1 = int(np.searchsorted(dst, hi))
                    if i1 <= i0:
                        continue
                    sel = slice(i0, i1)
                else:
                    sel = (dst >= lo) & (dst < hi)
                    if not sel.any():
                        continue
                s_part = sc.chunk(ci).to_numpy(zero_copy_only=False)[sel]
                d_part = dst[sel]
                w_part = (
                    wc.chunk(ci).to_numpy(zero_copy_only=False)[sel]
                    if wc is not None
                    else None
                )
                if drop_loops:
                    # undirected fast path: the forward half is the
                    # graph's own blocks, self-loops included — mask
                    # them here (dst order preserved); the swapped
                    # half was filtered at materialize and passes
                    # through unchanged
                    nl = s_part != d_part
                    if not nl.all():
                        s_part, d_part = s_part[nl], d_part[nl]
                        if w_part is not None:
                            w_part = w_part[nl]
                if len(d_part) == 0:
                    continue
                if s_part.dtype != idt:
                    s_part = s_part.astype(idt)
                if d_part.dtype != idt:
                    d_part = d_part.astype(idt)
                srcs.append(s_part)
                dsts.append(d_part)
                if w_part is not None:
                    ws.append(w_part)
        if srcs:
            self.src = np.concatenate(srcs)
            self.dst = np.concatenate(dsts)
            self.w = np.concatenate(ws).astype(np.float64) if ws else None
            if not presorted:
                order = np.argsort(self.dst, kind="stable")
                self.src = self.src[order]
                self.dst = self.dst[order]
                if self.w is not None:
                    self.w = self.w[order]
        else:
            self.src = np.empty(0, idt)
            self.dst = np.empty(0, idt)
            self.w = None
        self.lo = lo
        self.hi = hi
        first = np.ones(len(self.dst), dtype=bool)
        first[1:] = self.dst[1:] != self.dst[:-1]
        self.run_starts = np.flatnonzero(first)
        self.local_dst = self.dst[self.run_starts] - lo  # offsets in the slice

    def _chunk_bounds(self, chunk):
        """Run-aligned chunk boundaries (run index space)."""
        R = len(self.run_starts)
        bounds = [0]
        r = 0
        m = len(self.src)
        while r < R:
            r_end = int(np.searchsorted(self.run_starts, self.run_starts[r] + chunk))
            r_end = max(r_end, r + 1)
            bounds.append(r_end)
            r = r_end
        return bounds

    def gather_sum(self, value, chunk: int = 1 << 16):
        """Dense Σ value[src] for this actor's dst slice [lo, hi).
        Chunked so the gather intermediate stays in cache — under
        P-way contention this is ~2-3× faster than one big gather."""
        out = np.zeros(self.hi - self.lo, np.float64)
        m = len(self.src)
        if m == 0:
            return out
        bounds = self._chunk_bounds(chunk)
        R = len(self.run_starts)
        for r, r_end in zip(bounds[:-1], bounds[1:]):
            e0 = self.run_starts[r]
            e1 = self.run_starts[r_end] if r_end < R else m
            contrib = value[self.src[e0:e1]]
            out[self.local_dst[r:r_end]] = np.add.reduceat(
                contrib, self.run_starts[r:r_end] - e0
            )
        return out

    def gather_sum_weighted(self, value, chunk: int = 1 << 16):
        """Σ w_e · value[src] per dst in this actor's slice — the
        edge-weighted PageRank combine. Chunked reduceat like
        gather_sum; requires a weighted pool."""
        if self.w is None:
            raise ValueError("weighted gather on a pool built without weights")
        out = np.zeros(self.hi - self.lo)
        m = len(self.src)
        if m == 0:
            return out
        cbounds = self._chunk_bounds(chunk)
        R = len(self.run_starts)
        for r, r_end in zip(cbounds[:-1], cbounds[1:]):
            e0 = self.run_starts[r]
            e1 = self.run_starts[r_end] if r_end < R else m
            rs = self.run_starts[r:r_end] - e0
            vals = value[self.src[e0:e1]] * self.w[e0:e1]
            out[self.local_dst[r:r_end]] = np.add.reduceat(vals, rs)
        return out

    def gather_min(self, value, chunk: int = 1 << 16):
        """Dense min of value[src] per dst for this actor's slice
        (+inf / int max where no in-edge) — the WCC/label min-combine.
        Integer inputs stay integer: exact for the full int64 range
        (and int32 dense indices halve the gather bandwidth)."""
        if np.issubdtype(value.dtype, np.floating):
            fill = np.inf
        else:
            fill = np.iinfo(value.dtype).max
        out = np.full(self.hi - self.lo, fill, value.dtype)
        m = len(self.src)
        if m == 0:
            return out
        bounds = self._chunk_bounds(chunk)
        R = len(self.run_starts)
        for r, r_end in zip(bounds[:-1], bounds[1:]):
            e0 = self.run_starts[r]
            e1 = self.run_starts[r_end] if r_end < R else m
            contrib = value[self.src[e0:e1]]
            out[self.local_dst[r:r_end]] = np.minimum.reduceat(
                contrib, self.run_starts[r:r_end] - e0
            )
        return out

    def gather_sum_multi(self, value, chunk: int = 1 << 14):
        """(V, K) batched gather: Σ value[src, :] per dst for this
        actor's slice. One row gather per edge feeds K accumulations.
        Chunked run-aligned so the (chunk, K) gather intermediate
        stays in L2 — measured 2.7× faster under 31-way contention
        than materializing E_p×K (the intermediate's write+readback
        otherwise dominates DRAM traffic)."""
        K = value.shape[1]
        out = np.zeros((self.hi - self.lo, K))
        m = len(self.src)
        if m == 0:
            return out
        bounds = self._chunk_bounds(chunk)
        R = len(self.run_starts)
        for r, r_end in zip(bounds[:-1], bounds[1:]):
            e0 = self.run_starts[r]
            e1 = self.run_starts[r_end] if r_end < R else m
            contrib = value[self.src[e0:e1]]
            sums = np.add.reduceat(contrib, self.run_starts[r:r_end] - e0, axis=0)
            out[self.local_dst[r:r_end]] = sums
        return out

    def gather_max_multi(self, value, chunk: int = 1 << 14):
        """(V, K) batched gather: elementwise max of value[src, :] per
        dst for this actor's slice (0 where a dst has no in-edges) —
        the HyperANF register-merge combine. Same run-aligned chunking
        as gather_sum_multi."""
        K = value.shape[1]
        out = np.zeros((self.hi - self.lo, K), value.dtype)
        m = len(self.src)
        if m == 0:
            return out
        bounds = self._chunk_bounds(chunk)
        R = len(self.run_starts)
        for r, r_end in zip(bounds[:-1], bounds[1:]):
            e0 = self.run_starts[r]
            e1 = self.run_starts[r_end] if r_end < R else m
            contrib = value[self.src[e0:e1]]
            sums = np.maximum.reduceat(contrib, self.run_starts[r:r_end] - e0, axis=0)
            out[self.local_dst[r:r_end]] = sums
        return out

    def gather_or(self, value, chunk: int = 1 << 16):
        """Per-dst bitwise OR of value[src] for this actor's slice (0
        where no in-edge) — the neighbor-color-mask combine of
        Jones–Plassmann greedy coloring. Same run-aligned chunking as
        gather_sum."""
        out = np.zeros(self.hi - self.lo, value.dtype)
        m = len(self.src)
        if m == 0:
            return out
        bounds = self._chunk_bounds(chunk)
        R = len(self.run_starts)
        for r, r_end in zip(bounds[:-1], bounds[1:]):
            e0 = self.run_starts[r]
            e1 = self.run_starts[r_end] if r_end < R else m
            contrib = value[self.src[e0:e1]]
            out[self.local_dst[r:r_end]] = np.bitwise_or.reduceat(
                contrib, self.run_starts[r:r_end] - e0
            )
        return out

    def gather_mode(self, value, chunk: int = 1 << 18):
        """Most-frequent value[src] per dst in this actor's slice, ties
        to the smallest value; -1 where no in-edge. The label-propagation
        combine — counting and mode selection run inside the actor
        (P-way parallel lexsorts), nothing per-(vertex,label) ever
        reaches the driver. Run-aligned chunks bound the sort
        transients (whole-slice lexsorts allocated ~1.5 GB × P actors
        at E=268M — memory-pressure territory, measured ~75 s/superstep
        vs seconds chunked); runs never split, so chunk results are
        exact."""
        odt = value.dtype if np.issubdtype(value.dtype, np.signedinteger) else np.int64
        out = np.full(self.hi - self.lo, -1, odt)
        m = len(self.src)
        if m == 0:
            return out
        cbounds = self._chunk_bounds(chunk)
        R = len(self.run_starts)
        for r, r_end in zip(cbounds[:-1], cbounds[1:]):
            e0 = self.run_starts[r]
            e1 = self.run_starts[r_end] if r_end < R else m
            n_e = e1 - e0
            lab = value[self.src[e0:e1]]
            rs = self.run_starts[r:r_end] - e0
            run_len = np.diff(np.append(rs, n_e))
            run_id = np.repeat(np.arange(len(rs)), run_len)
            # pack (run_id, lab) into one int64 key when the ranges
            # allow: a single radix argsort is ~2× a 2-key lexsort,
            # and this sort is the whole cost of an LP superstep
            lo_l = int(lab.min()) if n_e else 0
            hi_l = int(lab.max()) if n_e else 0
            span = hi_l - lo_l + 1
            if (
                np.issubdtype(lab.dtype, np.integer)
                and len(rs) * span < (1 << 62)
            ):
                # offset in int64: lab's own dtype can wrap when the
                # value range exceeds it (e.g. int32 spanning ±2^30)
                key = run_id * np.int64(span) + (lab.astype(np.int64, copy=False) - lo_l)
                order = np.argsort(key, kind="stable")
            else:
                order = np.lexsort((lab, run_id))
            rl = run_id[order]
            ll = lab[order]
            new = np.ones(n_e, bool)
            new[1:] = (rl[1:] != rl[:-1]) | (ll[1:] != ll[:-1])
            starts = np.flatnonzero(new)
            counts = np.diff(np.append(starts, n_e))
            grp_run = rl[starts]
            grp_lab = ll[starts]
            o2 = np.lexsort((grp_lab, -counts, grp_run))
            gr = grp_run[o2]
            first = np.ones(len(gr), bool)
            first[1:] = gr[1:] != gr[:-1]
            out[self.local_dst[r:r_end][gr[first]]] = grp_lab[o2][first]
        return out

    def gather_hindex(self, value, chunk: int = 1 << 18):
        """H-index of {value[src]} per dst in this actor's slice: the
        largest h such that at least h in-neighbors have value ≥ h;
        0 where no in-edge. The k-core combine (H-index iteration from
        degree init converges to coreness — Lü et al. 2016). Chunked
        run-aligned like gather_mode; nothing per-edge reaches the
        driver."""
        out = np.zeros(self.hi - self.lo, np.int64)
        m = len(self.src)
        if m == 0:
            return out
        cbounds = self._chunk_bounds(chunk)
        R = len(self.run_starts)
        for r, r_end in zip(cbounds[:-1], cbounds[1:]):
            e0 = self.run_starts[r]
            e1 = self.run_starts[r_end] if r_end < R else m
            n_e = e1 - e0
            v = value[self.src[e0:e1]]
            rs = self.run_starts[r:r_end] - e0
            run_len = np.diff(np.append(rs, n_e))
            run_id = np.repeat(np.arange(len(rs)), run_len)
            # packed single-key radix sort (descending v within run)
            # when ranges allow — same trick as gather_mode
            lo_v = int(v.min()) if n_e else 0
            hi_v = int(v.max()) if n_e else 0
            span = hi_v - lo_v + 1
            if (
                np.issubdtype(v.dtype, np.integer)
                and len(rs) * span < (1 << 62)
            ):
                key = run_id * np.int64(span) + (np.int64(hi_v) - v)
                order = np.argsort(key, kind="stable")
            else:
                order = np.lexsort((-v, run_id))
            vs = v[order]
            # rank within run (1-based); descending values make the
            # indicator (vs >= rank) monotone, so its segment count IS
            # the H-index
            pos = np.arange(n_e) - np.repeat(rs, run_len)
            ind = vs >= (pos + 1)
            out[self.local_dst[r:r_end]] = np.add.reduceat(ind, rs)
        return out

    def gather_best_community(
        self,
        labels,
        tot,
        deg,
        two_m,
        gate=None,
        weighted=False,
        self_w=None,
        chunk: int = 1 << 18,
    ):
        """Louvain local-moving combine for this actor's dst slice:
        for each dst v the community C maximizing the integer
        modularity-gain score

            2m·e(v,C) − k_v·(tot(C) − k_v·[C = labels[v]])

        over C ∈ {labels[src] of in-neighbors} ∪ {labels[v]}; ties
        prefer STAYING (the own community), then the smallest C —
        moving only on strictly positive gain is what makes the
        local-moving dynamics converge instead of id-churning. −1
        where no in-edge (caller keeps the current label). Comparing
        ΔQ across candidates multiplied through by 2m keeps every
        quantity int64 — exact in any reduction order, so the result
        is bit-identical to an unrolled SQL chain.
        Chunked run-aligned like gather_mode; nothing per-(vertex,
        community) ever reaches the driver. ``gate`` (bool per global
        dense vertex) restricts the argmax to gated dst runs — the
        parity-alternation of Louvain local moving — skipping the sort
        for the other half of the edges. ``weighted``: e(v,C) sums the
        pinned integer edge weights instead of counting edges (the
        weights-instead-of-duplicates semantic); sums stay exact
        (integer-valued float64 < 2^53 → int64). ``self_w`` (per
        global dense vertex, int64): self-loop mass of a COARSENED
        vertex — it always counts toward e(v, own), so the own
        candidate's count gets +self_w[v] (the real own segment and
        the synthetic zero-count duplicate both get it; the real one
        then carries the full e and wins the argmax)."""
        out = np.full(self.hi - self.lo, -1, np.int64)
        m = len(self.src)
        if m == 0:
            return out
        if weighted and self.w is None:
            raise ValueError("weighted gather on a pool built without weights")
        cbounds = self._chunk_bounds(chunk)
        R = len(self.run_starts)
        for r, r_end in zip(cbounds[:-1], cbounds[1:]):
            e0 = self.run_starts[r]
            e1 = self.run_starts[r_end] if r_end < R else m
            n_e = e1 - e0
            rs = self.run_starts[r:r_end] - e0
            run_len = np.diff(np.append(rs, n_e))
            local = self.local_dst[r:r_end]
            lab_src = self.src[e0:e1]
            wts = self.w[e0:e1] if weighted else None
            if gate is not None:
                keep = gate[(local + self.lo).astype(np.int64, copy=False)]
                if not keep.any():
                    continue
                emask = np.repeat(keep, run_len)
                lab_src = lab_src[emask]
                if wts is not None:
                    wts = wts[emask]
                run_len = run_len[keep]
                local = local[keep]
                rs = np.concatenate([[0], np.cumsum(run_len)[:-1]]).astype(rs.dtype)
                n_e = len(lab_src)
            lab = labels[lab_src].astype(np.int64, copy=False)
            run_id = np.repeat(np.arange(len(rs)), run_len)
            # per-(run, label) segment counts — the packed radix sort
            # of gather_mode
            lo_l = int(lab.min())
            span = int(lab.max()) - lo_l + 1
            if len(rs) * span < (1 << 62):
                key = run_id * np.int64(span) + (lab - lo_l)
                order = np.argsort(key, kind="stable")
            else:
                order = np.lexsort((lab, run_id))
            rl = run_id[order]
            ll = lab[order]
            new = np.ones(n_e, bool)
            new[1:] = (rl[1:] != rl[:-1]) | (ll[1:] != ll[:-1])
            starts = np.flatnonzero(new)
            if weighted:
                cnt = np.add.reduceat(wts[order], starts).astype(np.int64)
            else:
                cnt = np.diff(np.append(starts, n_e)).astype(np.int64)
            grp_run = rl[starts]
            grp_lab = ll[starts]
            # the vertex's own community always competes, entering as a
            # zero-count candidate; when it is also a real segment the
            # higher-score real duplicate wins the argmax and both
            # carry the same label, so the duplicate is harmless
            dvert = (local + self.lo).astype(np.int64, copy=False)
            own = labels[dvert].astype(np.int64, copy=False)
            kd = deg[dvert].astype(np.int64, copy=False)
            nr = len(rs)
            g_run = np.concatenate([grp_run, np.arange(nr)])
            g_lab = np.concatenate([grp_lab, own])
            g_cnt = np.concatenate([cnt, np.zeros(nr, np.int64)])
            kd_g = kd[g_run]
            own_g = own[g_run]
            is_own = g_lab == own_g
            if self_w is not None:
                g_cnt = g_cnt + np.where(is_own, self_w[dvert][g_run], np.int64(0))
            score = np.int64(two_m) * g_cnt - kd_g * (
                tot[g_lab] - np.where(is_own, kd_g, np.int64(0))
            )
            o2 = np.lexsort((g_lab, ~is_own, -score, g_run))
            gr = g_run[o2]
            first = np.ones(len(gr), bool)
            first[1:] = gr[1:] != gr[:-1]
            out[local[gr[first]]] = g_lab[o2][first]
        return out

    def gather_min_plus(self, dist, active):
        """min over active src of dist[src] + weight (or +1) for this
        actor's dst slice; inf where no message."""
        out = np.full(self.hi - self.lo, np.inf)
        if len(self.src):
            mask = active[self.src]
            cand = dist[self.src] + (self.w if self.w is not None else 1.0)
            cand = np.where(mask, cand, np.inf)
            out[self.local_dst] = np.minimum.reduceat(cand, self.run_starts)
        return out

    # ----------------------------------------------------- random walks
    #
    # Built on a *reversed* pool (local key = original src), each run
    # is one vertex's out-adjacency. ``prepare_walks`` canonicalizes
    # each run to ascending neighbor order once (dense ids are
    # monotone in original ids, so dense-ascending == the SQL oracle's
    # ``row_number() OVER (PARTITION BY src ORDER BY dst)`` order);
    # ``walk_step`` then picks neighbor rank ``h % degree`` in O(1)
    # per walker — no per-step dependence on block layout.

    def prepare_walks(self, weighted: bool = False):
        """One-time canonical sort of every adjacency run (ascending
        neighbor id) + run-end offsets; with ``weighted``, also the
        global cumulative integer-weight array (weights must be
        integral ≥ 0 — the streaming duplicate-count semantic).
        Idempotent per mode."""
        if getattr(self, "_walk_mode", None) == weighted:
            return True
        if len(self.src):
            order = np.lexsort((self.src, self.dst))  # stable: dst runs kept
            self._walk_nbrs = self.src[order]
        else:
            order = np.empty(0, np.int64)
            self._walk_nbrs = self.src
        R = len(self.run_starts)
        ends = np.empty(R, np.int64)
        if R:
            ends[:-1] = self.run_starts[1:]
            ends[-1] = len(self.dst)
        self._run_ends = ends
        if weighted:
            if self.w is None:
                raise ValueError("weighted walks need a weighted pool")
            ws = self.w[order]
            wi = np.rint(ws).astype(np.int64)
            if not np.array_equal(wi, ws) or (wi < 0).any():
                raise ValueError(
                    "weighted walks require integral non-negative weights "
                    "(duplicate-count semantics); got non-integral values"
                )
            # global (non-reset) cumsum: runs are contiguous, so a
            # single searchsorted against it lands inside the walker's
            # run — one vectorized call for ALL walkers per step
            self._walk_cum = np.cumsum(wi)
            base = np.zeros(R, np.int64)
            if R > 1:
                base[1:] = self._walk_cum[self.run_starts[1:] - 1]
            self._walk_base = base
        self._walk_mode = weighted
        return True

    def walk_step(self, cur, h):
        """Advance the walkers currently inside this partition's
        vertex range: next = sorted-adjacency[h % out_degree] (or, in
        weighted mode, the neighbor whose cumulative-weight interval
        contains h % total_weight). Returns (walker positions, next
        dense vertex; -1 = dead end) or None when no walker is here."""
        idx = np.flatnonzero((cur >= self.lo) & (cur < self.hi))
        if len(idx) == 0:
            return None
        nxt = np.full(len(idx), -1, np.int64)
        R = len(self.run_starts)
        if R:
            local = cur[idx] - self.lo
            runs = np.minimum(np.searchsorted(self.local_dst, local), R - 1)
            found = self.local_dst[runs] == local
            fr = runs[found]
            starts = self.run_starts[fr]
            if self._walk_mode:
                base = self._walk_base[fr]
                tot = self._walk_cum[self._run_ends[fr] - 1] - base
                ok = tot > 0
                r = np.zeros(len(fr), np.int64)
                r[ok] = (
                    h[idx[found]][ok].astype(np.uint64)
                    % tot[ok].astype(np.uint64)
                ).astype(np.int64)
                j = np.searchsorted(self._walk_cum, base + r, side="right")
                res = self._walk_nbrs[np.minimum(j, len(self._walk_nbrs) - 1)]
                nxt[found] = np.where(ok, res, -1)
            else:
                deg = (self._run_ends[fr] - starts).astype(np.uint64)
                r = (h[idx[found]] % deg).astype(np.int64)
                nxt[found] = self._walk_nbrs[starts + r]
        return idx, nxt

    def sample_neighbors(self, ids, k, seed):
        """Hash-min neighbor sampling (GraphSAGE-style fan-out): for
        every vertex in this partition keep its k out-neighbors with
        the smallest splitmix64((src_id·GOLD) ⊕ nbr_id ⊕ seed) — an
        order-independent uniform k-subset, reproducible by SQL's
        ``row_number() OVER (PARTITION BY src ORDER BY h, dst) <= k``.
        ``ids`` maps dense index → original id (the hash runs on
        original ids so it is densification-independent). Returns
        (vertex, neighbor) dense pairs."""
        m = len(self.src)
        if m == 0:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        GOLD = np.uint64(0x9E3779B97F4A7C15)
        h = ids[self.dst].astype(np.uint64) * GOLD ^ ids[self.src].astype(np.uint64) ^ np.uint64(seed)
        h ^= h >> np.uint64(30)
        h *= np.uint64(0xBF58476D1CE4E5B9)
        h ^= h >> np.uint64(27)
        h *= np.uint64(0x94D049BB133111EB)
        h ^= h >> np.uint64(31)
        # rank within each run by (hash, neighbor): lexsort keys are
        # LAST-primary — dst runs stay contiguous, h orders inside
        order = np.lexsort((self.src, h, self.dst))
        run_len = np.diff(np.append(self.run_starts, m))
        pos = np.arange(m) - np.repeat(self.run_starts, run_len)
        keep = order[pos < k]
        return self.dst[keep].astype(np.int64), self.src[keep].astype(np.int64)

    def walk_candidates(self, cur):
        """node2vec phase A: out-neighbor candidate runs for the
        walkers whose current vertex lies in this partition's range.
        Requires ``prepare_walks`` (uses the canonical ascending
        adjacency). Returns (walker positions, per-walker candidate
        counts, flat candidates in ascending-neighbor order) or None.
        Walkers at vertices with no out-adjacency run are absent from
        the result (dead ends, like ``walk_step``)."""
        idx = np.flatnonzero((cur >= self.lo) & (cur < self.hi))
        R = len(self.run_starts)
        if len(idx) == 0 or R == 0:
            return None
        local = cur[idx] - self.lo
        runs = np.minimum(np.searchsorted(self.local_dst, local), R - 1)
        found = self.local_dst[runs] == local
        if not found.any():
            return None
        idx = idx[found]
        fr = runs[found]
        starts = self.run_starts[fr]
        counts = (self._run_ends[fr] - starts).astype(np.int64)
        # flat gather of each walker's canonical run
        take = np.repeat(starts, counts) + (
            np.arange(int(counts.sum())) - np.repeat(np.cumsum(counts) - counts, counts)
        )
        return idx, counts, self._walk_nbrs[take].astype(np.int64)

    def _member_keys(self):
        """Composite edge keys for O(log E) membership probes: runs
        are ordered by local dst and canonically ascending inside
        (``prepare_walks``), so ``run_id·stride + nbr`` is globally
        sorted. stride = max dense id + 1 (< 2^31 under the int32
        dense invariant, so keys stay < 2^62)."""
        k = getattr(self, "_member_key", None)
        if k is None:
            m = len(self.src)
            R = len(self.run_starts)
            run_len = np.diff(np.append(self.run_starts, m))
            stride = np.int64(int(self._walk_nbrs.max()) + 1 if m else 1)
            self._member_key = (
                np.repeat(np.arange(R, dtype=np.int64), run_len) * stride
                + self._walk_nbrs.astype(np.int64)
            )
            self._member_stride = stride
            k = self._member_key
        return k, self._member_stride

    def edge_member(self, qsrc, qdst):
        """node2vec phase B: for each query pair, is ``qdst`` an
        out-neighbor of ``qsrc``? Answers only pairs whose src falls
        in this partition's range. Returns (positions into the query
        arrays, bool membership) or None."""
        idx = np.flatnonzero((qsrc >= self.lo) & (qsrc < self.hi))
        if len(idx) == 0:
            return None
        member = np.zeros(len(idx), bool)
        R = len(self.run_starts)
        if R:
            local = qsrc[idx] - self.lo
            runs = np.minimum(np.searchsorted(self.local_dst, local), R - 1)
            found = self.local_dst[runs] == local
            if found.any():
                keys, stride = self._member_keys()
                qd = qdst[idx[found]]
                ok = (qd >= 0) & (qd < stride)
                qkey = runs[found].astype(np.int64) * stride + np.where(ok, qd, 0)
                j = np.searchsorted(keys, qkey)
                hit = (j < len(keys)) & ok
                hit[hit] = keys[np.minimum(j, len(keys) - 1)][hit] == qkey[hit]
                member[found] = hit
        return idx, member

    # ----------------------------------------------------- sharded state
    #
    # The driver-out-of-the-loop mode: per-vertex state lives in the
    # same dst-range actors; supersteps exchange plasma refs of the
    # contribution slices (zero-copy on a node, O(V) over the network
    # per superstep on a cluster) and the driver handles only P refs +
    # P diff scalars. PageRank/PPR apply is purely slice-local
    # (reference semantics: dangling mass leaks, pagerank.h:146-161 —
    # no global reduction enters the state), so results are
    # bit-identical to the driver-held engine.

    def init_pagerank(self, inv_deg_slice, base, damping, n, init_slice=None):
        self._pr_inv = np.asarray(inv_deg_slice, np.float64)
        self._pr_base = base
        self._pr_d = damping
        if init_slice is not None:
            # warm start (snapshot-delta recompute): resume from a
            # prior level's converged ranks instead of uniform 1/n
            self._pr_rank = np.asarray(init_slice, np.float64).copy()
        else:
            self._pr_rank = np.full(self.hi - self.lo, 1.0 / n, np.float64)
        return ray.put(self._pr_rank * self._pr_inv)

    def pagerank_step(self, w_refs):
        value = np.concatenate(ray.get(list(w_refs)))
        new = self._pr_base + self._pr_d * self.gather_sum(value)
        diff = float(np.abs(new - self._pr_rank).sum())
        self._pr_rank = new
        return ray.put(new * self._pr_inv), diff

    def get_rank(self):
        return self._pr_rank

    def init_labels(self, init_slice):
        """Sharded label state (WCC min-label / LP mode): this actor
        owns the labels of its dst range. Returns (label slice ref,
        changed slice ref) — every vertex starts dirty so round 0
        computes all runs."""
        self._lab = np.asarray(init_slice)
        return ray.put(self._lab), ray.put(np.ones(len(self._lab), bool))

    def min_label_step(self, refs, c_refs):
        """One WCC superstep: fetch all label slices (zero-copy on a
        node; O(V) over the network on a cluster), min-combine over
        ONLY the runs with a changed source (a run's min cannot move
        otherwise, and labels are non-increasing), keep the state
        here. Returns (label ref, changed ref, #changed)."""
        value = np.concatenate(ray.get(list(refs)))
        changed = np.concatenate(ray.get(list(c_refs)))
        new = self._lab
        if len(self.run_starts):
            dirty = np.logical_or.reduceat(changed[self.src], self.run_starts)
            run_idx = np.flatnonzero(dirty)
            if len(run_idx) > _DIRTY_FULL_FRAC * len(self.run_starts):
                # mostly dirty: the contiguous full gather beats the
                # selected-run index gather (no edge-index materialize)
                new = np.minimum(self._lab, self.gather_min(value))
            elif len(run_idx):
                m = self._min_for_runs(value, run_idx)
                tgt = self.local_dst[run_idx]
                new = self._lab.copy()
                new[tgt] = np.minimum(self._lab[tgt], m)
        changed_out = new != self._lab
        self._lab = new
        return ray.put(new), ray.put(changed_out), int(changed_out.sum())

    def mode_label_step(self, refs, c_refs):
        """One LP superstep: per-dst neighbor-label mode (ties →
        smallest) over ONLY the runs with a changed source (the mode
        depends on nothing else), computed entirely inside the
        actor. Returns (label ref, changed ref, #changed)."""
        value = np.concatenate(ray.get(list(refs)))
        changed = np.concatenate(ray.get(list(c_refs)))
        new = self._lab
        if len(self.run_starts):
            dirty = np.logical_or.reduceat(changed[self.src], self.run_starts)
            run_idx = np.flatnonzero(dirty)
            if len(run_idx) > _DIRTY_FULL_FRAC * len(self.run_starts):
                mode = self.gather_mode(value)
                new = np.where(mode >= 0, mode.astype(self._lab.dtype), self._lab)
            elif len(run_idx):
                mode = self._mode_for_runs(value, run_idx)
                new = self._lab.copy()
                new[self.local_dst[run_idx]] = mode
        changed_out = new != self._lab
        self._lab = new
        return ray.put(new), ray.put(changed_out), int(changed_out.sum())

    def get_labels(self):
        return self._lab

    def init_hindex(self, core_slice):
        """Sharded k-core state: this actor owns the core estimates of
        its dst range. Returns (value slice ref, changed slice ref) —
        every vertex starts dirty so round 0 computes all runs."""
        self._hx = np.asarray(core_slice)
        self._run_lens = np.diff(np.append(self.run_starts, len(self.src)))
        return ray.put(self._hx), ray.put(np.ones(len(self._hx), bool))

    def _run_chunks(self, run_idx, chunk):
        """Yield run-aligned chunks (r0, r1, idx, rs, lens) over the
        SELECTED runs (indices into ``run_starts``): ``idx`` are the
        global edge indices of runs [r0, r1), packed contiguously with
        local run offsets ``rs`` — the shared edge-gather for all
        dirty-run recomputes."""
        ends_all = np.append(self.run_starts, len(self.src))
        starts = self.run_starts[run_idx]
        lens = (ends_all[run_idx + 1] - starts).astype(np.int64)
        cum = np.concatenate([[0], np.cumsum(lens)])
        bpos = [0]
        nruns = len(run_idx)
        while bpos[-1] < nruns:
            nxt = int(np.searchsorted(cum, cum[bpos[-1]] + chunk))
            bpos.append(min(max(nxt, bpos[-1] + 1), nruns))
        for r0, r1 in zip(bpos[:-1], bpos[1:]):
            l = lens[r0:r1]
            st = starts[r0:r1]
            tot = int(l.sum())
            if tot == 0:
                continue
            rs = np.concatenate([[0], np.cumsum(l)[:-1]])
            idx = np.repeat(st - rs, l) + np.arange(tot)
            yield r0, r1, idx, rs, l

    def _min_for_runs(self, value, run_idx, chunk: int = 1 << 16):
        """min value[src] for the selected runs only."""
        out = np.empty(len(run_idx), value.dtype)
        for r0, r1, idx, rs, _l in self._run_chunks(run_idx, chunk):
            out[r0:r1] = np.minimum.reduceat(value[self.src[idx]], rs)
        return out

    def _mode_for_runs(self, value, run_idx, chunk: int = 1 << 18):
        """Mode of value[src] (ties → smallest) for the selected runs
        only — the dirty-run LP combine (packed-key radix sort as in
        :meth:`gather_mode`)."""
        odt = value.dtype if np.issubdtype(value.dtype, np.signedinteger) else np.int64
        out = np.empty(len(run_idx), odt)
        for r0, r1, idx, rs, l in self._run_chunks(run_idx, chunk):
            v = value[self.src[idx]]
            tot = len(v)
            run_id = np.repeat(np.arange(r1 - r0), l)
            lo_l = int(v.min())
            hi_l = int(v.max())
            span = hi_l - lo_l + 1
            if np.issubdtype(v.dtype, np.integer) and (r1 - r0) * span < (1 << 62):
                # offset in int64: v's own dtype could wrap when its
                # value range exceeds it (e.g. int32 spanning ±2^30)
                key = run_id * np.int64(span) + (v.astype(np.int64, copy=False) - lo_l)
                order = np.argsort(key, kind="stable")
            else:
                order = np.lexsort((v, run_id))
            rl = run_id[order]
            ll = v[order]
            new = np.ones(tot, bool)
            new[1:] = (rl[1:] != rl[:-1]) | (ll[1:] != ll[:-1])
            starts = np.flatnonzero(new)
            counts = np.diff(np.append(starts, tot))
            grp_run = rl[starts]
            grp_lab = ll[starts]
            o2 = np.lexsort((grp_lab, -counts, grp_run))
            gr = grp_run[o2]
            first = np.ones(len(gr), bool)
            first[1:] = gr[1:] != gr[:-1]
            out[r0:r1][gr[first]] = grp_lab[o2][first]
        return out

    def _hindex_for_runs(self, value, run_idx, chunk: int = 1 << 18):
        """H-index of value[src] for the selected runs only (indices
        into ``run_starts``) — the dirty-run re-gather: work is
        O(edges of changed-neighbor vertices), not O(E)."""
        out = np.zeros(len(run_idx), np.int64)
        for r0, r1, idx, rs, l in self._run_chunks(run_idx, chunk):
            v = value[self.src[idx]]
            tot = len(v)
            run_id = np.repeat(np.arange(r1 - r0), l)
            lo_v = int(v.min())
            hi_v = int(v.max())
            span = hi_v - lo_v + 1
            if np.issubdtype(v.dtype, np.integer) and (r1 - r0) * span < (1 << 62):
                key = run_id * np.int64(span) + (np.int64(hi_v) - v)
                order = np.argsort(key, kind="stable")
            else:
                order = np.lexsort((-v, run_id))
            vs = v[order]
            pos_in = np.arange(tot) - np.repeat(rs, l)
            ind = vs >= (pos_in + 1)
            out[r0:r1] = np.add.reduceat(ind, rs)
        return out

    def hindex_step(self, v_refs, c_refs):
        """One k-core superstep with actor-resident core estimates:
        recompute the H-index ONLY for dst runs with ≥1 changed
        source (H-index iteration is monotone, so unchanged
        neighborhoods cannot move). Returns (value ref, changed ref,
        #changed)."""
        value = np.concatenate(ray.get(list(v_refs)))
        changed = np.concatenate(ray.get(list(c_refs)))
        new = self._hx
        if len(self.run_starts):
            # a changed source whose NEW value is still ≥ this dst's
            # current H leaves the count at threshold H unchanged, and
            # the iteration is monotone — so H stays put. Only sources
            # that CROSSED below the dst's H dirty the run (hubs decay
            # for many rounds before crossing a small neighbor's H).
            thr = np.repeat(self._hx[self.local_dst], self._run_lens)
            dirty_e = changed[self.src] & (value[self.src] < thr)
            dirty = np.logical_or.reduceat(dirty_e, self.run_starts)
            run_idx = np.flatnonzero(dirty)
            if len(run_idx) > _DIRTY_FULL_FRAC * len(self.run_starts):
                h = self.gather_hindex(value)
                new = np.minimum(self._hx, h.astype(self._hx.dtype))
            elif len(run_idx):
                h = self._hindex_for_runs(value, run_idx)
                tgt = self.local_dst[run_idx]
                upd = np.minimum(self._hx[tgt], h.astype(self._hx.dtype))
                new = self._hx.copy()
                new[tgt] = upd
        changed_out = new != self._hx
        self._hx = new
        return ray.put(new), ray.put(changed_out), int(changed_out.sum())

    def get_hindex(self):
        return self._hx

    def init_sssp(self, dist_slice, active_slice):
        self._dist = np.asarray(dist_slice, np.float64)
        self._sssp_act = np.asarray(active_slice, bool)
        return ray.put(self._dist), ray.put(self._sssp_act)

    def sssp_step(self, d_refs, a_refs):
        """One min-plus relax round with actor-resident (dist, active)
        state. Returns (dist ref, frontier ref, #improved)."""
        dist = np.concatenate(ray.get(list(d_refs)))
        act = np.concatenate(ray.get(list(a_refs)))
        cand = self.gather_min_plus(dist, act)
        improved = cand < self._dist
        self._dist = np.where(improved, cand, self._dist)
        self._sssp_act = improved
        return ray.put(self._dist), ray.put(improved), int(improved.sum())

    def get_dist(self):
        return self._dist

    def gather_max_masked(self, value, active):
        """Per-dst max of value[src] over edges whose src is active
        (-1 where none) — the SCC forward-coloring combine. Runs over
        the pinned edges; no per-round block fetch."""
        out = np.full(self.hi - self.lo, -1, np.int64)
        if len(self.src):
            v = np.where(active[self.src], value[self.src], np.int64(-1))
            out[self.local_dst] = np.maximum.reduceat(v, self.run_starts)
        return out

    def reach_step(self, color, active, reached):
        """SCC backward-reach round (call on the REVERSED pool, where
        stored (src, dst) = original (dst, src)): dense ids in this
        range newly reached through one of their original out-edges."""
        s, d = self.src, self.dst
        if not len(s):
            return np.empty(0, np.int64)
        m = (
            active[s]
            & active[d]
            & (color[s] == color[d])
            & reached[s]
            & ~reached[d]
        )
        return np.unique(d[m])

    def incident_srcs(self, targets):
        """(src, count) partials over this partition's edges whose dst
        ∈ ``targets`` (sorted dense ids) — O(|targets∩range|·log runs +
        touched edges), NOT O(E): the incremental-degree lookup for
        SCC trim peeling."""
        empty = (np.empty(0, np.int64), np.empty(0, np.int64))
        t = targets[(targets >= self.lo) & (targets < self.hi)]
        R = len(self.run_starts)
        if not len(t) or R == 0:
            return empty
        run_dst = self.dst[self.run_starts]
        pos = np.searchsorted(run_dst, t)
        ok = pos < R
        ok[ok] = run_dst[pos[ok]] == t[ok]
        pos = pos[ok]
        if not len(pos):
            return empty
        ends_all = np.append(self.run_starts, len(self.src))
        starts = self.run_starts[pos]
        lens = ends_all[pos + 1] - starts
        total = int(lens.sum())
        base = np.repeat(starts - np.concatenate([[0], np.cumsum(lens)[:-1]]), lens)
        idx = base + np.arange(total)
        sv, sc = np.unique(self.src[idx], return_counts=True)
        return sv, sc.astype(np.int64)

    def init_ppr(self, inv_deg_slice, restart_slice, init_slice, damping):
        self._pr_inv = np.asarray(inv_deg_slice, np.float64)
        self._ppr_restart = np.asarray(restart_slice, np.float64)
        self._pr_d = damping
        self._ppr_rank = np.asarray(init_slice, np.float64)
        return ray.put(self._ppr_rank * self._pr_inv[:, None])

    def ppr_step(self, w_refs):
        value = np.concatenate(ray.get(list(w_refs)), axis=0)
        new = self._ppr_restart + self._pr_d * self.gather_sum_multi(value)
        diff = float(np.abs(new - self._ppr_rank).sum())
        self._ppr_rank = new
        return ray.put(new * self._pr_inv[:, None]), diff

    def get_rank_multi(self):
        return self._ppr_rank


class _ReversedGraph:
    """Shim exposing a graph's edges with src/dst swapped — lets a
    second BSPGather aggregate along OUT-edges (needed by symmetric
    algorithms like WCC, whose min-label flows both ways). Bounds
    balance by the reversed in-degree = original out-degree."""

    def __init__(self, graph: Graph):
        import pyarrow as _pa

        carry = [c for c in ("weight",) if c in graph.edges.schema().names]

        def swap(batch: _pa.Table) -> _pa.Table:
            cols = {"src": batch.column("dst"), "dst": batch.column("src")}
            for c in carry:
                cols[c] = batch.column(c)
            return _pa.table(cols)

        self.edges = graph.edges.select_columns(["src", "dst"] + carry).map_batches(
            swap, batch_format="pyarrow"
        )
        self.num_vertices = graph.num_vertices
        self._out_deg = graph.out_degrees

    def in_degrees(self):
        return self._out_deg


def reversed_view(graph: Graph) -> "_ReversedGraph":
    return _ReversedGraph(graph)


def self_loop_counts(graph: Graph) -> np.ndarray:
    """Per-vertex self-loop count — plain Ray tasks over the
    materialized edge blocks (no Dataset-executor launch)."""

    def cnt(tbl):
        if tbl.num_rows == 0 or "src" not in tbl.schema.names:
            return None
        s = tbl.column("src").combine_chunks().to_numpy(zero_copy_only=False)
        d = tbl.column("dst").combine_chunks().to_numpy(zero_copy_only=False)
        m = s == d
        if not m.any():
            return None
        u, c = np.unique(s[m], return_counts=True)
        return u, c

    out = np.zeros(graph.num_vertices, np.int64)
    task = ray.remote(cnt)
    for r in ray.get([task.remote(b) for b in graph.edge_block_refs()]):
        if r is not None:
            out[r[0]] += r[1]
    return out


class UndirectedView:
    """Both directions of every edge, self-loops dropped — the doubled
    graph that WCC's min-label and LP's mode gather aggregate over
    (each neighbor contributes exactly one in-edge message). Balance
    degrees equal the doubled list's true in-degree,
    out + in − 2·self-loops."""

    def __init__(self, graph: Graph):
        from ..graph import undirect

        self.edges = undirect(graph.edges, drop_self_loops=True)
        self.num_vertices = graph.num_vertices
        # kept so BSPGather can build the pool from the base graph's
        # dst-sorted blocks + a swapped-half materialize instead of
        # executing the doubled view (16× cheaper at E=268M)
        self._base_graph = graph
        self._deg = (
            graph.out_degrees + graph.in_degrees() - 2 * self_loop_counts(graph)
        )

    def in_degrees(self):
        return self._deg


class BSPGather:
    """P partition-pinned gather actors over a graph's dense edges."""

    def __init__(
        self,
        graph: Graph,
        *,
        num_partitions: int | None = None,
        weighted: bool = False,
        build: str = "auto",
    ):
        if build == "auto":
            # single node: every actor scan-reads all blocks zero-copy
            # from local plasma (P parallel scans, no shuffle — cheapest
            # measured). Multi-node: that becomes a P×E network
            # broadcast, so range-sort by dst first and let each actor
            # fetch only its contiguous blocks (O(E) traffic).
            try:
                multi = len([nd for nd in ray.nodes() if nd.get("Alive")]) > 1
            except Exception:
                multi = False
            build = "sort" if multi else "scan"
        self.build = build  # resolved strategy, for callers/tests
        if num_partitions is None:
            try:
                num_partitions = max(1, int(ray.cluster_resources().get("CPU", 8)))
            except Exception:
                num_partitions = 8
        n = graph.num_vertices
        self.num_vertices = n
        P = max(1, min(num_partitions, n))
        # dst-range bounds balanced by EDGE count, not vertex count:
        # power-law graphs concentrate in-edges on few vertices (R-MAT
        # hot ids), and an equal-width split can hand one actor half
        # the edges — the hottest partition then serializes every
        # superstep (measured: zero 8→32 speedup before this fix).
        # This is the degree-based skew split of SURVEY §4.
        indeg = graph.in_degrees()
        cum = np.cumsum(indeg)
        total = int(cum[-1]) if len(cum) else 0
        if total > 0 and P > 1:
            targets = np.linspace(0, total, P + 1)[1:-1]
            cuts = np.searchsorted(cum, targets) + 1
            bounds = np.unique(np.concatenate([[0], cuts, [n]])).tolist()
        else:
            bounds = [(p * n) // P for p in range(P)] + [n]
        P = len(bounds) - 1
        cols = ["src", "dst"] + (["weight"] if weighted else [])
        # num_cpus=0: the actors compute only inside synchronous gather
        # RPCs (at most P at once, P = CPUs-1 by default), so reserving
        # scheduler slots would only starve concurrent Ray Data stages
        # — observed as deadlock in small sessions. Parallelism is
        # governed by the actor count, not the reservation.
        Actor = ray.remote(num_cpus=0)(_GatherPartition)
        block_sorted = False
        use_split = False
        drop_loops = False
        # dense ids < n: int32 storage when they fit — halves actor
        # heap, plasma footprint of the transient tables, and the
        # per-superstep src-index read bandwidth
        compact = n <= (1 << 31)
        base = getattr(graph, "_base_graph", None)
        if build == "sort":
            sorted_ds = graph.edges.select_columns(cols).sort("dst").materialize()
            refs = sorted_ds.to_arrow_refs()
            presorted = True
        elif getattr(graph, "_dst_sorted", False):
            # build_graph already leaves every pinned block internally
            # sorted by dst: actors binary-search the graph's own
            # blocks — zero extra copies, setup is pure slicing
            refs = graph.edge_block_refs()
            presorted = False
            block_sorted = True
            # split applies here only: the blocks already exist, so the
            # transient sub-table copy is the sole extra allocation (a
            # view path would stack it on top of its sorted copy —
            # measured plasma-spill territory at 2E=537M)
            use_split = True
        elif base is not None and getattr(base, "_dst_sorted", False):
            # undirected view over a dst-sorted graph: ONE fused task
            # per base block emits both halves (forward slice +
            # swapped-and-sorted slice) per dst range — the block is
            # read once, the swapped half is never rewritten whole to
            # plasma (vs doubling + re-sorting 2E rows: measured 96 s
            # → 6 s, and the fused form removes another full
            # write+read of the swapped half at E=268M)
            if P > 1:
                refs = base.edge_block_refs()
                use_split = "undirected"
                drop_loops = False  # dropped inside the fused split task
            else:
                # single partition: no ranges to split — materialize
                # the swapped half and hand the actor both block sets
                swapped = (
                    base.edges.select_columns(cols)
                    .map_batches(
                        lambda t, _c=compact: _swap_sort_block(t, compact=_c),
                        batch_format="pyarrow",
                        batch_size=None,
                    )
                    .materialize()
                )
                refs = list(base.edge_block_refs()) + list(
                    swapped.to_arrow_refs()
                )
                drop_loops = True
            presorted = False
            block_sorted = True
        else:
            # view / unsorted input: sort each block by dst ONCE in
            # parallel (stable, so the per-actor edge order — and
            # therefore FP reduction order — is identical to the
            # mask-scan path), then every actor binary-searches its
            # range out of each block instead of re-scanning all E rows
            # (P× redundant work before).
            refs = (
                graph.edges.select_columns(cols)
                .map_batches(
                    _sort_block_by_dst, batch_format="pyarrow", batch_size=None
                )
                .materialize()
                .to_arrow_refs()
            )
            presorted = False
            block_sorted = True
        self.bounds = bounds
        if use_split and P > 1 and refs:
            # manual range-shuffle map stage: one task per block slices
            # it into P dst-range sub-tables; actor p then fetches only
            # its own rows (sub-tables stay dst-sorted, so the actor
            # code path is unchanged)
            barr = np.asarray(bounds, np.int64)
            split = ray.remote(
                _split_undirected_block
                if use_split == "undirected"
                else _split_block_by_ranges
            )
            per_block = [
                split.options(num_returns=P).remote(r, barr, cols, compact)
                for r in refs
            ]
            actor_refs = [[pb[p] for pb in per_block] for p in range(P)]
        else:
            actor_refs = [refs for _ in range(P)]
        self.actors = [
            Actor.remote(
                actor_refs[p],
                bounds[p],
                bounds[p + 1],
                weighted,
                presorted,
                block_sorted,
                drop_loops,
                compact,
            )
            for p in range(P)
        ]
        # block until every partition is built: constructor work (the
        # reverse-CSR scan) belongs to setup, not to the first supersteps
        ray.get([a.__ray_ready__.remote() for a in self.actors])

    def gather_sum(self, value: np.ndarray) -> np.ndarray:
        """Dense Σ value[src] per dst (length num_vertices)."""
        v_ref = ray.put(value)
        parts = ray.get([a.gather_sum.remote(v_ref) for a in self.actors])
        return np.concatenate(parts) if parts else np.zeros(self.num_vertices)

    def gather_sum_weighted(self, value: np.ndarray) -> np.ndarray:
        """Dense Σ w_e · value[src] per dst — the weighted-PageRank
        combine (pool must be built with weighted=True)."""
        v_ref = ray.put(value)
        parts = ray.get([a.gather_sum_weighted.remote(v_ref) for a in self.actors])
        return np.concatenate(parts) if parts else np.zeros(self.num_vertices)

    def gather_min(self, value: np.ndarray) -> np.ndarray:
        """Dense min value[src] per dst (+inf = no in-edge)."""
        v_ref = ray.put(value)
        parts = ray.get([a.gather_min.remote(v_ref) for a in self.actors])
        return np.concatenate(parts) if parts else np.full(self.num_vertices, np.inf)

    def gather_sum_multi(self, value: np.ndarray) -> np.ndarray:
        """Dense (V, K) batched Σ value[src, :] per dst."""
        v_ref = ray.put(value)
        parts = ray.get([a.gather_sum_multi.remote(v_ref) for a in self.actors])
        return (
            np.concatenate(parts, axis=0)
            if parts
            else np.zeros((self.num_vertices, value.shape[1]))
        )

    def gather_max_multi(self, value: np.ndarray) -> np.ndarray:
        """Dense (V, K) elementwise max of value[src, :] per dst."""
        v_ref = ray.put(value)
        parts = ray.get([a.gather_max_multi.remote(v_ref) for a in self.actors])
        return (
            np.concatenate(parts, axis=0)
            if parts
            else np.zeros((self.num_vertices, value.shape[1]), value.dtype)
        )

    def gather_or(self, value: np.ndarray) -> np.ndarray:
        """Dense per-dst bitwise OR of value[src] (0 = no in-edge) —
        the greedy-coloring neighbor-mask combine."""
        v_ref = ray.put(value)
        parts = ray.get([a.gather_or.remote(v_ref) for a in self.actors])
        return np.concatenate(parts) if parts else np.zeros(self.num_vertices, value.dtype)

    def gather_mode(self, value: np.ndarray) -> np.ndarray:
        """Dense per-dst mode of value[src] (ties → smallest; -1 = no
        in-edge) — the label-propagation combine."""
        v_ref = ray.put(value)
        parts = ray.get([a.gather_mode.remote(v_ref) for a in self.actors])
        return np.concatenate(parts) if parts else np.full(self.num_vertices, -1, np.int64)

    def gather_hindex(self, value: np.ndarray) -> np.ndarray:
        """Dense per-dst H-index of value[src] (0 = no in-edge) — the
        k-core combine."""
        v_ref = ray.put(value)
        parts = ray.get([a.gather_hindex.remote(v_ref) for a in self.actors])
        return np.concatenate(parts) if parts else np.zeros(self.num_vertices, np.int64)

    def gather_best_community(
        self,
        labels: np.ndarray,
        tot: np.ndarray,
        deg: np.ndarray,
        two_m: int,
        gate: np.ndarray | None = None,
        weighted: bool = False,
        self_w: np.ndarray | None = None,
    ) -> np.ndarray:
        """Dense per-dst best Louvain move (highest integer
        modularity-gain score, ties → smallest community; -1 = no
        in-edge or dst not gated). ``labels``/``tot``/``deg``/``gate``
        are O(V) broadcasts like gather_mode's label vector."""
        l_ref = ray.put(labels)
        t_ref = ray.put(tot)
        d_ref = ray.put(deg)
        g_ref = ray.put(gate) if gate is not None else None
        s_ref = ray.put(self_w) if self_w is not None else None
        parts = ray.get(
            [
                a.gather_best_community.remote(
                    l_ref, t_ref, d_ref, two_m, g_ref, weighted, s_ref
                )
                for a in self.actors
            ]
        )
        return np.concatenate(parts) if parts else np.full(self.num_vertices, -1, np.int64)

    def gather_min_plus(self, dist: np.ndarray, active: np.ndarray) -> np.ndarray:
        """Dense min-relax vector (inf = no message)."""
        d_ref = ray.put(dist)
        a_ref = ray.put(active)
        parts = ray.get(
            [a.gather_min_plus.remote(d_ref, a_ref) for a in self.actors]
        )
        return np.concatenate(parts) if parts else np.full(self.num_vertices, np.inf)

    def _slices(self, arr: np.ndarray):
        return [arr[lo:hi] for lo, hi in zip(self.bounds[:-1], self.bounds[1:])]

    def run_pagerank_sharded(
        self,
        inv_deg: np.ndarray,
        *,
        damping: float,
        max_iters: int,
        tol: float | None,
        num_edges: int,
        init_rank: np.ndarray | None = None,
    ):
        """Scalar PageRank with actor-resident state: per superstep the
        driver dispatches ONE rpc round carrying P slice refs and
        collects P (ref, diff) pairs — no O(V) data touches the driver
        until the final state collection. Bit-identical to the
        driver-held BSP engine. ``init_rank`` warm-starts from a prior
        snapshot's converged ranks (delta recompute)."""
        import time as _time

        n = self.num_vertices
        base = (1.0 - damping) / n
        init_slices = (
            self._slices(np.asarray(init_rank, np.float64))
            if init_rank is not None
            else [None] * len(self.actors)
        )
        refs = ray.get(
            [
                a.init_pagerank.remote(sl, base, damping, n, isl)
                for a, sl, isl in zip(self.actors, self._slices(inv_deg), init_slices)
            ]
        )
        metrics = []
        converged = False
        k = 0
        while k < max_iters:
            t0 = _time.perf_counter()
            outs = ray.get([a.pagerank_step.remote(refs) for a in self.actors])
            refs = [o[0] for o in outs]
            diff = float(sum(o[1] for o in outs))
            dt = _time.perf_counter() - t0
            metrics.append(
                {
                    "iteration": k,
                    "diff": diff,
                    "edges_processed": num_edges,
                    "seconds": dt,
                    "edges_per_sec": num_edges / dt if dt > 0 else 0.0,
                }
            )
            k += 1
            if tol is not None and diff <= tol:
                converged = True
                break
        rank = np.concatenate(ray.get([a.get_rank.remote() for a in self.actors]))
        return rank, k, converged, metrics

    def run_ppr_sharded(
        self,
        inv_deg: np.ndarray,
        restart: np.ndarray,
        init: np.ndarray,
        *,
        damping: float,
        max_iters: int,
        tol: float | None,
        num_edges: int,
    ):
        """(V, K) personalized PageRank with actor-resident state —
        same protocol as :meth:`run_pagerank_sharded`."""
        import time as _time

        K = restart.shape[1]
        refs = ray.get(
            [
                a.init_ppr.remote(si, sr, sv, damping)
                for a, si, sr, sv in zip(
                    self.actors,
                    self._slices(inv_deg),
                    self._slices(restart),
                    self._slices(init),
                )
            ]
        )
        metrics = []
        converged = False
        k = 0
        while k < max_iters:
            t0 = _time.perf_counter()
            outs = ray.get([a.ppr_step.remote(refs) for a in self.actors])
            refs = [o[0] for o in outs]
            diff = float(sum(o[1] for o in outs))
            dt = _time.perf_counter() - t0
            metrics.append(
                {
                    "iteration": k,
                    "diff": diff,
                    "edges_processed": num_edges * K,
                    "seconds": dt,
                    "edges_per_sec": num_edges * K / dt if dt > 0 else 0.0,
                }
            )
            k += 1
            if tol is not None and diff <= tol:
                converged = True
                break
        rank = np.concatenate(ray.get([a.get_rank_multi.remote() for a in self.actors]), axis=0)
        return rank, k, converged, metrics

    def gather_max_masked(self, value: np.ndarray, active: np.ndarray) -> np.ndarray:
        """Dense per-dst max of value[src] over active srcs (-1 = none)."""
        v_ref = ray.put(value)
        a_ref = ray.put(active)
        parts = ray.get([a.gather_max_masked.remote(v_ref, a_ref) for a in self.actors])
        return np.concatenate(parts) if parts else np.full(self.num_vertices, -1, np.int64)

    def reach_step(self, color, active, reached) -> np.ndarray:
        """SCC backward-reach round over a REVERSED pool → newly
        reachable dense ids (unsorted union of per-actor results)."""
        c_ref, a_ref, r_ref = ray.put(color), ray.put(active), ray.put(reached)
        parts = ray.get([a.reach_step.remote(c_ref, a_ref, r_ref) for a in self.actors])
        parts = [p for p in parts if len(p)]
        return np.concatenate(parts) if parts else np.empty(0, np.int64)

    def incident_src_counts(self, targets: np.ndarray):
        """(src, count) over all edges whose dst ∈ targets — touches
        only the runs of the targeted dsts, not E."""
        t_ref = ray.put(np.asarray(targets, np.int64))
        outs = ray.get([a.incident_srcs.remote(t_ref) for a in self.actors])
        ks = [o[0] for o in outs if len(o[0])]
        vs = [o[1] for o in outs if len(o[0])]
        if not ks:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        return np.concatenate(ks), np.concatenate(vs)

    def run_min_label_sharded(self, init_labels: np.ndarray, *, max_iters: int, num_edges: int):
        """WCC-style min-label fixpoint with actor-resident labels:
        per superstep the driver moves P slice refs + P change counts,
        never an O(V) vector. Dirty-run recompute (only runs with a
        changed source re-gather). Bit-identical to the driver-held
        engines — min over integers is exact."""
        import time as _time

        outs = ray.get(
            [
                a.init_labels.remote(sl)
                for a, sl in zip(self.actors, self._slices(init_labels))
            ]
        )
        refs = [o[0] for o in outs]
        c_refs = [o[1] for o in outs]
        metrics = []
        converged = False
        k = 0
        while k < max_iters:
            t0 = _time.perf_counter()
            outs = ray.get(
                [a.min_label_step.remote(refs, c_refs) for a in self.actors]
            )
            refs = [o[0] for o in outs]
            c_refs = [o[1] for o in outs]
            changed = int(sum(o[2] for o in outs))
            dt = _time.perf_counter() - t0
            metrics.append(
                {
                    "iteration": k,
                    "diff": float(changed),
                    "edges_processed": num_edges,
                    "seconds": dt,
                    "edges_per_sec": num_edges / dt if dt > 0 else 0.0,
                }
            )
            k += 1
            if changed == 0:
                converged = True
                break
        labels = np.concatenate(ray.get([a.get_labels.remote() for a in self.actors]))
        return labels, k, converged, metrics

    def run_mode_label_sharded(self, init_labels: np.ndarray, *, iterations: int, num_edges: int):
        """Label propagation (fixed rounds) with actor-resident labels
        and dirty-run recompute (a run's mode depends only on its
        sources' labels, so unchanged neighborhoods keep their label)."""
        import time as _time

        outs = ray.get(
            [
                a.init_labels.remote(sl)
                for a, sl in zip(self.actors, self._slices(init_labels))
            ]
        )
        refs = [o[0] for o in outs]
        c_refs = [o[1] for o in outs]
        metrics = []
        for k in range(iterations):
            t0 = _time.perf_counter()
            outs = ray.get(
                [a.mode_label_step.remote(refs, c_refs) for a in self.actors]
            )
            refs = [o[0] for o in outs]
            c_refs = [o[1] for o in outs]
            changed = int(sum(o[2] for o in outs))
            dt = _time.perf_counter() - t0
            metrics.append(
                {
                    "iteration": k,
                    "diff": float(changed),
                    "edges_processed": num_edges,
                    "seconds": dt,
                    "edges_per_sec": num_edges / dt if dt > 0 else 0.0,
                }
            )
        labels = np.concatenate(ray.get([a.get_labels.remote() for a in self.actors]))
        return labels, iterations, False, metrics

    def run_hindex_sharded(self, init_core: np.ndarray, *, max_iters: int, num_edges: int):
        """k-core H-index fixpoint with actor-resident core estimates
        and dirty-run re-gather: per superstep the driver moves P value
        refs + P changed-mask refs + P counts; after the first round
        each actor touches only the edges of vertices whose neighbors
        changed — the shrinking-frontier shape classic peeling has,
        with the H-index iteration's round count."""
        import time as _time

        outs = ray.get(
            [
                a.init_hindex.remote(sl)
                for a, sl in zip(self.actors, self._slices(init_core))
            ]
        )
        v_refs = [o[0] for o in outs]
        c_refs = [o[1] for o in outs]
        metrics = []
        converged = False
        k = 0
        while k < max_iters:
            t0 = _time.perf_counter()
            outs = ray.get(
                [a.hindex_step.remote(v_refs, c_refs) for a in self.actors]
            )
            v_refs = [o[0] for o in outs]
            c_refs = [o[1] for o in outs]
            changed = int(sum(o[2] for o in outs))
            dt = _time.perf_counter() - t0
            metrics.append(
                {
                    "iteration": k,
                    "diff": float(changed),
                    "edges_processed": num_edges,
                    "seconds": dt,
                    "edges_per_sec": num_edges / dt if dt > 0 else 0.0,
                }
            )
            k += 1
            if changed == 0:
                converged = True
                break
        core = np.concatenate(ray.get([a.get_hindex.remote() for a in self.actors]))
        return core, k, converged, metrics

    def run_sssp_sharded(self, dist0: np.ndarray, active0: np.ndarray, *, max_iters: int, num_edges: int):
        """BFS / Bellman-Ford with actor-resident (dist, frontier)."""
        import time as _time

        outs = ray.get(
            [
                a.init_sssp.remote(sd, sa)
                for a, sd, sa in zip(
                    self.actors, self._slices(dist0), self._slices(active0)
                )
            ]
        )
        d_refs = [o[0] for o in outs]
        a_refs = [o[1] for o in outs]
        metrics = []
        converged = False
        k = 0
        while k < max_iters:
            t0 = _time.perf_counter()
            outs = ray.get([a.sssp_step.remote(d_refs, a_refs) for a in self.actors])
            d_refs = [o[0] for o in outs]
            a_refs = [o[1] for o in outs]
            changed = int(sum(o[2] for o in outs))
            dt = _time.perf_counter() - t0
            metrics.append(
                {
                    "iteration": k,
                    "diff": float(changed),
                    "edges_processed": num_edges,
                    "seconds": dt,
                    "edges_per_sec": num_edges / dt if dt > 0 else 0.0,
                }
            )
            k += 1
            if changed == 0:
                converged = True
                break
        dist = np.concatenate(ray.get([a.get_dist.remote() for a in self.actors]))
        return dist, k, converged, metrics

    def shutdown(self):
        """Kill the partition actors. For pools handed out by
        :func:`shared_pool` this is a no-op — shared pools live as long
        as their graph (release with :func:`release_pools`)."""
        if getattr(self, "shared", False):
            return
        self._shutdown_now()

    def _shutdown_now(self):
        for a in self.actors:
            ray.kill(a)
        self.actors = []


# shared_pool caches pools on the graph only below this estimated
# actor-heap size; larger pools are built uncached so shutdown() frees
# them (an idle resident pool at 2^25 measurably slowed the next
# algorithm family's supersteps 4-10x on one box).
POOL_CACHE_MAX_BYTES = 6 * 1024**3


def shared_pool(
    graph: Graph,
    *,
    view: str = "forward",
    weighted: bool = False,
    build: str = "auto",
) -> BSPGather:
    """Memoized gather pool per (view, weighted, build), cached on the
    graph — the reference's posture of building the in-CSR once per
    graph and letting every task iterate on it (``needs_reverse_edges``,
    ``benchmark.cc:871-876``; ``make_reverse_edges`` runs once,
    ``ll_mlcsr_graph.h:955-1059``). A WCC followed by an LP, or repeated
    PageRank calls, pay the reverse-CSR build once instead of per call.

    ``view``: ``'forward'`` (dst-range in-CSR), ``'undirected'``
    (doubled simple-message view), ``'reversed'`` (src-range out-CSR).
    Pools are owned by the graph: their ``shutdown()`` is a no-op; call
    :func:`release_pools` to free the actors early, otherwise they are
    reclaimed when the graph is garbage-collected.
    """
    # Size-aware caching: a pinned pool holds ~8–16 B per (doubled)
    # edge of actor heap for the graph's lifetime. Below the cap that
    # amortizes beautifully across calls; above it a resident idle
    # pool measurably starves the NEXT algorithm family's memory on a
    # single box (BASELINE §3.2f ordering note), so the pool is
    # returned uncached and its shutdown() really frees the actors.
    est_bytes = graph.num_edges * (2 if view == "undirected" else 1) * 8
    if est_bytes > POOL_CACHE_MAX_BYTES:
        logger = __import__("logging").getLogger(__name__)
        logger.warning(
            "shared_pool: estimated pool size %.1f GB exceeds the cache "
            "cap (%.1f GB) — building an uncached pool; it is freed at "
            "shutdown() instead of living on the graph",
            est_bytes / 1e9,
            POOL_CACHE_MAX_BYTES / 1e9,
        )
        return BSPGather(_resolve_view(graph, view), weighted=weighted, build=build)
    cache = getattr(graph, "_bsp_pools", None)
    if cache is None:
        cache = {}
        try:
            graph._bsp_pools = cache
        except AttributeError:  # view objects without settable attrs
            return BSPGather(
                _resolve_view(graph, view), weighted=weighted, build=build
            )
    key = (view, weighted, build)
    pool = cache.get(key)
    if pool is None or not pool.actors:
        pool = BSPGather(_resolve_view(graph, view), weighted=weighted, build=build)
        pool.shared = True
        cache[key] = pool
    return pool


def _resolve_view(graph: Graph, view: str):
    if view == "forward":
        return graph
    if view == "undirected":
        return UndirectedView(graph)
    if view == "reversed":
        return reversed_view(graph)
    raise ValueError(f"unknown view {view!r}")


def release_pools(graph: Graph) -> None:
    """Free every shared gather pool cached on ``graph``."""
    cache = getattr(graph, "_bsp_pools", None) or {}
    for pool in cache.values():
        pool._shutdown_now()
    cache.clear()
