"""Triangle counting — degree-oriented wedge matching, fully distributed.

The reference counts triangles with in-memory sorted-adjacency
intersections (`/root/reference/benchmark/benchmarks/triangle_counting.h:531-567`
merge / binary-search kernel; the ``tc_od`` variant requires a
canonicalized ``-OD`` load: src<dst, deduped). Distributed form —
no O(E) structure ever lives on the driver:

1. **canonicalize** (u<v, drop self-loops) → pack ``key = u·N + v``
   → distributed ``sort(key)`` → in-block run-dedup (+ tiny boundary
   pass) — the ``-OD`` load as one single-int64-column range shuffle;
2. **degrees** of the canonical graph: per-block sparse partials
   merged into an O(V) driver array (the same envelope as the rest
   of the engine's per-vertex state);
3. **orient** each edge from lower (degree, id) to higher endpoint —
   every vertex's oriented out-degree is O(sqrt E), which bounds the
   wedge work at hubs (the hub-splitting requirement of SURVEY §4) —
   and ``sort`` the oriented keys again: blocks are now src-runs;
4. **wedges + match** in one pass over the sorted blocks: all pairs
   of a vertex's oriented out-neighbors are candidate closing edges,
   generated vectorized per run in bounded-size chunks; a wedge
   closes a triangle iff its oriented key exists in the edge-key
   blocks, probed by ``searchsorted`` against the *distributed*
   sorted key blocks (each task ``ray.get``\\s only the blocks its
   wedge keys fall into — zero-copy plasma reads; the driver holds
   only per-block key bounds). Runs touching a block edge resolve in
   a small second pass (≤ 2 runs per block, each O(sqrt E) long).

Every triangle is counted exactly once, at its (degree, id)-minimal
vertex. Keys pack as ``u * N + v`` (valid while N < 3e9; a struct
two-column sort is the path past that).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from ..common import batch_to_numpy
from ..graph import Graph, target_num_blocks


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
    """Orient each (x, y) pair by the (degree, id) comparator.
    Returns int64 so ``x * n + y`` key packing never overflows when
    the graph stores int32 dense edges."""
    fwd = (deg[x] < deg[y]) | ((deg[x] == deg[y]) & (x < y))
    return (
        np.where(fwd, x, y).astype(np.int64),
        np.where(fwd, y, x).astype(np.int64),
    )


def _probe_count(wk: np.ndarray, refs, bounds_hi: np.ndarray, n: int, cache: dict) -> int:
    """How many wedge keys exist in the distributed sorted edge-key
    blocks. Keys are range-bucketed by the per-block upper bounds;
    fetched blocks are cached for the lifetime of the calling task
    (zero-copy plasma reads, so the cache holds views, not copies)."""
    if len(wk) == 0:
        return 0
    wk = np.sort(wk)
    blk = np.searchsorted(bounds_hi, wk, side="left")
    total = 0
    for bi in np.unique(blk):
        if bi >= len(refs):
            continue
        sel = wk[blk == bi]
        keys = cache.get(bi)
        if keys is None:
            t = ray.get(refs[bi])
            keys = t.column("key").combine_chunks().to_numpy(zero_copy_only=False)
            cache[bi] = keys
        if len(keys) == 0:
            continue
        pos = np.searchsorted(keys, sel)
        pos = np.clip(pos, 0, len(keys) - 1)
        total += int((keys[pos] == sel).sum())
    return total


def _count_wedges(
    a: np.ndarray,
    b: np.ndarray,
    deg: np.ndarray,
    n: int,
    refs,
    bounds_hi: np.ndarray,
    wedge_chunk: int = 1 << 20,
) -> int:
    """Triangles closed by wedges of the (a-sorted) oriented edge rows.
    Wedge generation is chunked so at most ``wedge_chunk`` candidate
    keys are in flight — a hub run of length L (≤ O(sqrt E)) yields
    C(L,2) wedges but never materializes them all at once."""
    m = len(a)
    if m < 2:
        return 0
    cache: dict = {}
    starts = np.flatnonzero(np.concatenate([[True], a[1:] != a[:-1]]))
    lengths = np.diff(np.concatenate([starts, [m]]))
    work = lengths * (lengths - 1) // 2
    total = 0
    # group whole runs into chunks of bounded wedge work
    r = 0
    R = len(starts)
    while r < R:
        if work[r] > wedge_chunk:
            # one hub run, processed in leading-index slices
            s, L = starts[r], lengths[r]
            nbrs = b[s : s + L]
            step = max(1, wedge_chunk // max(1, L))
            for j0 in range(0, L - 1, step):
                j1 = min(j0 + step, L - 1)
                lefts = np.arange(j0, j1)
                reps = L - 1 - lefts
                li = np.repeat(lefts, reps)
                cum = np.concatenate([[0], np.cumsum(reps)])
                ri = li + (np.arange(int(reps.sum())) - np.repeat(cum[:-1], reps)) + 1
                x, y = _orient_pairs(nbrs[li], nbrs[ri], deg)
                total += _probe_count(x * n + y, refs, bounds_hi, n, cache)
            r += 1
            continue
        e, tot = r, 0
        while e < R and tot + work[e] <= wedge_chunk:
            tot += work[e]
            e += 1
        e = max(e, r + 1)
        lo = starts[r]
        hi = starts[e] if e < R else m
        li, ri = _pairs_multirun(a[lo:hi])
        if len(li):
            x, y = _orient_pairs(b[lo + li], b[lo + ri], deg)
            total += _probe_count(x * n + y, refs, bounds_hi, n, cache)
        r = e
    return total


def _probe_mask(wk: np.ndarray, refs, bounds_hi: np.ndarray, cache: dict) -> np.ndarray:
    """Boolean membership of each wedge key in the distributed sorted
    edge-key blocks — same fetch/caching as ``_probe_count``, but
    keeps per-key alignment (triangle *emission* needs which wedges
    closed, not just how many)."""
    out = np.zeros(len(wk), bool)
    if len(wk) == 0:
        return out
    order = np.argsort(wk, kind="stable")
    swk = wk[order]
    blk = np.searchsorted(bounds_hi, swk, side="left")
    for bi in np.unique(blk):
        if bi >= len(refs):
            continue
        m = blk == bi
        sel = swk[m]
        keys = cache.get(bi)
        if keys is None:
            t = ray.get(refs[bi])
            keys = t.column("key").combine_chunks().to_numpy(zero_copy_only=False)
            cache[bi] = keys
        if len(keys) == 0:
            continue
        pos = np.clip(np.searchsorted(keys, sel), 0, len(keys) - 1)
        out[order[m]] = keys[pos] == sel
    return out


def oriented_edge_index(graph: Graph):
    """Shared canonical oriented edge-key index of the clique family
    (triangles, 4-cliques): each undirected simple edge appears once
    as ``key = x·n + y`` with x ≺ y in the (multigraph total degree,
    id) order, range-sorted so blocks are x-runs AND double as the
    distributed probe index (each task ``ray.get``\\s only the blocks
    its keys fall into — zero-copy plasma reads). Returns
    ``(srt, refs, bounds_hi, deg, deg_ref, n)``."""
    n = graph.num_vertices
    # Orientation only needs SOME fixed total order on vertices; the
    # (multigraph total degree, id) order — free from the build-time
    # cached degree vectors — keeps hubs on the high side without
    # paying a dedup shuffle first, so the whole count needs ONE
    # distributed sort and ONE counting pass.
    deg = graph.out_degrees + graph.in_degrees()
    deg_ref = ray.put(deg)

    # --- orient by (degree, id), one sort → src-run blocks. Duplicate
    # edges map to identical keys (adjacent after the sort) and drop in
    # the per-run unique below; probes against the multiset blocks are
    # membership tests, so dups there are harmless.
    def orient_key(batch: pa.Table):
        s = batch_to_numpy(batch, "src")
        d = batch_to_numpy(batch, "dst")
        keep = s != d
        dd = ray.get(deg_ref)
        x, y = _orient_pairs(s[keep], d[keep], dd)
        return {"key": np.unique(x * n + y)}

    srt = (
        graph.edges.map_batches(orient_key, batch_format="pyarrow", batch_size=None)
        .sort("key")
        .repartition(target_num_blocks(graph.num_edges))
        .materialize()
    )
    refs = srt.to_arrow_refs()

    @ray.remote
    def _block_bounds(t: pa.Table):
        if t.num_rows == 0 or "key" not in t.schema.names:
            return None
        k = t.column("key").combine_chunks().to_numpy(zero_copy_only=False)
        return (int(k[0]), int(k[-1]))

    bounds = ray.get([_block_bounds.remote(r) for r in refs])
    keep = [i for i, bo in enumerate(bounds) if bo is not None]
    refs = [refs[i] for i in keep]
    bounds_hi = np.array([bounds[i][1] for i in keep], np.int64)
    return srt, refs, bounds_hi, deg, deg_ref, n


def triangle_count(graph: Graph, *, probe: str = "broadcast") -> int:
    """``probe="broadcast"`` (default): wedge tasks fetch the sorted
    edge-key blocks they probe (zero-copy on a node; P×E traffic on a
    cluster). ``probe="shuffle"``: wedges are emitted as a Dataset and
    range-sorted into the edge-key ordering first, so each wedge block
    probes only the few edge blocks overlapping its own key range —
    O(W) shuffle traffic instead of P×E fetches, the multi-node path
    (costs an extra all-to-all of W wedge rows locally)."""
    if probe not in ("broadcast", "shuffle"):
        raise ValueError(f"unknown probe mode {probe}")
    n = graph.num_vertices
    if n == 0:
        return 0
    if n >= (1 << 31):
        raise NotImplementedError("packed-key TC valid to ~3e9 vertices; use 2-col struct sort")

    srt, refs, bounds_hi, deg, deg_ref, n = oriented_edge_index(graph)

    if probe == "shuffle":
        return _count_shuffle(srt, deg, deg_ref, n, refs, bounds_hi, graph)

    # --- wedge generation + distributed probe, one fused pass: each
    # block emits its interior-run triangle count (kind=0) plus the
    # rows of runs touching its edges (kind=1; ≤ 2 runs per block,
    # each O(sqrt E) long) for the driver stitch.
    def count_block(tbl: pa.Table):
        k = batch_to_numpy(tbl, "key")
        if len(k) == 0:
            return {"kind": np.empty(0, np.int64), "val": np.empty(0, np.int64)}
        aa = k // n
        s0 = int(np.searchsorted(aa, aa[0], side="right"))
        s1 = int(np.searchsorted(aa, aa[-1], side="left"))
        bkeys = np.concatenate([k[:s0], k[s1:]])
        t = 0
        if s1 - s0 >= 2:
            kk = np.unique(k[s0:s1])  # drop duplicate edges (adjacent when sorted)
            dd = ray.get(deg_ref)
            t = _count_wedges(kk // n, kk % n, dd, n, refs, bounds_hi)
        return {
            "kind": np.concatenate([[0], np.ones(len(bkeys), np.int64)]),
            "val": np.concatenate([[t], bkeys]),
        }

    total = 0
    bparts = []
    for t in srt.map_batches(
        count_block, batch_format="pyarrow", batch_size=None
    ).iter_batches(batch_format="pyarrow"):
        kind = batch_to_numpy(t, "kind")
        val = batch_to_numpy(t, "val")
        total += int(val[kind == 0].sum())
        bparts.append(val[kind == 1])
    if bparts:
        from ..common import check_boundary_size

        check_boundary_size(sum(len(p) for p in bparts), "triangle_count")
        bk = np.unique(np.concatenate(bparts))
        if len(bk):
            total += _count_wedges(bk // n, bk % n, deg, n, refs, bounds_hi)
    return total


def _gen_wedge_chunks(a, b, deg, n, wedge_chunk=1 << 20, with_center: bool = False):
    """Yield oriented wedge-key arrays for (a-sorted) rows in bounded
    chunks (same run grouping as _count_wedges, emitting instead of
    probing). With ``with_center`` yields ``(centers, x, y)`` triples
    instead of packed keys — triangle emission needs the wedge's
    center vertex to name the K4 base edge."""
    m = len(a)
    if m < 2:
        return
    starts = np.flatnonzero(np.concatenate([[True], a[1:] != a[:-1]]))
    lengths = np.diff(np.concatenate([starts, [m]]))
    work = lengths * (lengths - 1) // 2
    r = 0
    R = len(starts)
    while r < R:
        if work[r] > wedge_chunk:
            s, L = starts[r], lengths[r]
            nbrs = b[s : s + L]
            step = max(1, wedge_chunk // max(1, L))
            for j0 in range(0, L - 1, step):
                j1 = min(j0 + step, L - 1)
                lefts = np.arange(j0, j1)
                reps = L - 1 - lefts
                li = np.repeat(lefts, reps)
                cum = np.concatenate([[0], np.cumsum(reps)])
                ri = li + (np.arange(int(reps.sum())) - np.repeat(cum[:-1], reps)) + 1
                x, y = _orient_pairs(nbrs[li], nbrs[ri], deg)
                if with_center:
                    yield np.full(len(x), a[s], np.int64), x, y
                else:
                    yield x * n + y
            r += 1
            continue
        e, tot = r, 0
        while e < R and tot + work[e] <= wedge_chunk:
            tot += work[e]
            e += 1
        e = max(e, r + 1)
        lo = starts[r]
        hi = starts[e] if e < R else m
        li, ri = _pairs_multirun(a[lo:hi])
        if len(li):
            x, y = _orient_pairs(b[lo + li], b[lo + ri], deg)
            if with_center:
                yield a[lo + li].astype(np.int64), x, y
            else:
                yield x * n + y
        r = e


def _count_shuffle(srt, deg, deg_ref, n, refs, bounds_hi, graph) -> int:
    """Wedge-shuffle counting: emit every wedge key into a Dataset
    (bounded-chunk generator map), range-sort it into the edge-key
    ordering, then each wedge block probes only the edge blocks its
    key range overlaps."""

    def gen_wedges(tbl: pa.Table):
        k = tbl.column("key").combine_chunks().to_numpy(zero_copy_only=False)
        empty = pa.table({"wk": pa.array([], pa.int64())})
        if len(k) < 2:
            yield empty
            return
        aa = k // n
        s0 = int(np.searchsorted(aa, aa[0], side="right"))
        s1 = int(np.searchsorted(aa, aa[-1], side="left"))
        kk = np.unique(k[s0:s1])
        dd = ray.get(deg_ref)
        any_out = False
        for wk in _gen_wedge_chunks(kk // n, kk % n, dd, n):
            any_out = True
            yield pa.table({"wk": pa.array(wk)})
        if not any_out:
            yield empty

    wedges = srt.map_batches(gen_wedges, batch_format="pyarrow", batch_size=None)

    # boundary runs (≤ 2 per block, O(sqrt E) rows each) stitch on the
    # driver; their wedges join the same shuffle
    def boundary_block(tbl: pa.Table):
        if tbl.num_rows == 0 or "key" not in tbl.schema.names:
            return None
        k = tbl.column("key").combine_chunks().to_numpy(zero_copy_only=False)
        aa = k // n
        return k[(aa == aa[0]) | (aa == aa[-1])]

    from ..common import per_block_results

    bparts = [r for r in per_block_results(srt, boundary_block) if r is not None and len(r)]
    if bparts:
        bk = np.unique(np.concatenate(bparts))
        chunks = [pa.table({"wk": pa.array(wk)}) for wk in _gen_wedge_chunks(bk // n, bk % n, deg, n)]
        if chunks:
            wedges = wedges.union(rd.from_arrow(chunks))

    wsrt = wedges.sort("wk").materialize()

    def probe_block(tbl: pa.Table):
        if tbl.num_rows == 0 or "wk" not in tbl.schema.names:
            return None
        wk = tbl.column("wk").combine_chunks().to_numpy(zero_copy_only=False)
        # wk is sorted and range-partitioned → touches O(1) edge blocks
        return _probe_count(wk, refs, bounds_hi, n, {})

    return int(sum(r for r in per_block_results(wsrt, probe_block) if r is not None))


def triangle_count_delta(graph: Graph, delta_lo: np.ndarray, delta_hi: np.ndarray) -> int:
    """Incremental triangle count: triangles of ``graph`` (canonical
    undirected simple — each neighbor once per adjacency run)
    containing at least one of the given canonical delta edges
    (``delta_lo < delta_hi``, DENSE indices) — the snapshot-delta
    recompute: after a level adds |D| edges,
    ``TC(new) = TC(old) + triangle_count_delta(new, D)`` for
    Σ min(deg(a), deg(b)) work over D (the edge-iterator bound)
    instead of a full O(E^1.5) recount.

    Each qualifying triangle is counted exactly once, at its
    maximum-key delta edge: for delta edge e = (a, b), common
    neighbors c of a and b count unless a delta side edge (a,c)/(b,c)
    has a larger canonical key (that edge will count it). Distributed
    form: per chunk of delta edges, ONE ``walk_candidates`` fan-out
    fetches the smaller endpoint's adjacency run from its range owner
    and ONE ``edge_member`` fan-out checks the other endpoint's
    membership (the node2vec phase machinery over the undirected
    pool); the delta key set itself is broadcast once (sorted, O(|D|))
    for the ordering rule."""
    from ..engine.bsp import shared_pool

    n = graph.num_vertices
    if n == 0 or len(delta_lo) == 0:
        return 0
    a = np.asarray(delta_lo, np.int64)
    b = np.asarray(delta_hi, np.int64)
    if (a >= b).any():
        raise ValueError("delta edges must be canonical (lo < hi) without self-loops")
    dkeys = np.unique(a * n + b)
    a, b = dkeys // n, dkeys % n

    pool = shared_pool(graph, view="undirected")
    ray.get([ac.prepare_walks.remote(False) for ac in pool.actors])

    deg = graph.out_degrees + graph.in_degrees()
    # run side = smaller-degree endpoint (ties -> lo)
    swap = deg[b] < deg[a]
    side = np.where(swap, b, a)
    other = np.where(swap, a, b)

    total = 0
    chunk = 1 << 17
    for lo_i in range(0, len(dkeys), chunk):
        cs = slice(lo_i, lo_i + chunk)
        sv, ov, ke = side[cs], other[cs], dkeys[cs]
        sv_ref = ray.put(sv)
        wk_parts, cd_parts = [], []
        for part in ray.get([ac.walk_candidates.remote(sv_ref) for ac in pool.actors]):
            if part is None:
                continue
            idx, counts, flat = part
            wk_parts.append(np.repeat(idx, counts))
            cd_parts.append(flat)
        if not wk_parts:
            continue
        wk = np.concatenate(wk_parts)
        cd = np.concatenate(cd_parts)
        # drop the edge's own endpoints from the candidate run
        keep = (cd != ov[wk]) & (cd != sv[wk])
        wk, cd = wk[keep], cd[keep]
        if not len(wk):
            continue
        q_ref, c_ref = ray.put(ov[wk]), ray.put(cd)
        member = np.zeros(len(cd), bool)
        for part in ray.get([ac.edge_member.remote(q_ref, c_ref) for ac in pool.actors]):
            if part is not None:
                member[part[0]] = part[1]
        wk, cd = wk[member], cd[member]
        if not len(wk):
            continue
        # ordering rule against the sorted delta key set
        ke_w = ke[wk]

        def is_delta_and_larger(x, y, ref_key):
            k2 = np.minimum(x, y) * n + np.maximum(x, y)
            pos = np.clip(np.searchsorted(dkeys, k2), 0, len(dkeys) - 1)
            return (dkeys[pos] == k2) & (k2 > ref_key)

        blocked = is_delta_and_larger(sv[wk], cd, ke_w) | is_delta_and_larger(
            ov[wk], cd, ke_w
        )
        total += int((~blocked).sum())
    return total
