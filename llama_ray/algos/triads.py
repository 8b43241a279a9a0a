"""Directed triad census — the 13 connected Holland–Leinhardt triad
classes (021D…300), distributed.

The motif completion of the clique family (triangles → squares → K4 →
this): every connected unordered vertex triple of the directed simple
graph classified by isomorphism type. Method (Batagelj–Mrvar-style
pair-type reformulation, one sort + one wedge pass):

1. **pair table**: each unordered linked pair ``u<v`` gets a code
   ``1`` (u→v only), ``2`` (v→u only), ``3`` (mutual) — built from the
   edge blocks as packed keys ``u·n + v`` with OR-combined direction
   bits: ONE distributed range sort, in-block run-OR, tiny boundary
   pass. The sorted (key, code) blocks double as the closing-pair
   probe index (zero-copy plasma reads, the triangles.py pattern).
2. **wedges**: the doubled pair table (center-packed keys carrying
   the rel-to-center code: out/in/mutual) is range-sorted so blocks
   are center runs; every within-run endpoint pair (x < y) is one
   candidate triple, generated in bounded chunks (hub centers never
   materialize all C(deg,2) pairs at once):

   - (x, y) NOT linked → **open** triple, counted once (its center is
     unique): class from the two rel codes (021D out-out, 021U in-in,
     021C chain, 111D/111U mutual+asym, 201 both-mutual);
   - (x, y) linked → **closed** triple, seen from all 3 centers —
     counted only where center < x (the triple's minimum), classified
     by the 3 pair codes in a<b<c convention via a 27-entry lookup
     built at import by brute-force canonicalization (min over the 6
     vertex permutations of the 6-bit adjacency signature), so the
     class names are correct by construction against the standard
     catalog representatives.

Block-edge center runs resolve in a bounded driver pass (≤2 runs per
block). The disconnected classes (003, 012, 102) follow analytically
from |V|, the pair-code histogram and this census; they are not
triples-enumerable at scale and are intentionally not emitted.
"""

from __future__ import annotations

from itertools import permutations

import numpy as np
import pyarrow as pa
import ray

from ..common import batch_to_numpy, check_boundary_size, per_block_results
from ..graph import Graph, target_num_blocks
from .triangles import _pairs_multirun

# ---------------------------------------------------------------- class LUTs

# standard catalog representatives on vertices {0, 1, 2}
_REPS = {
    "021D": {(1, 0), (1, 2)},
    "021U": {(0, 1), (2, 1)},
    "021C": {(0, 1), (1, 2)},
    "111D": {(0, 1), (1, 0), (2, 1)},
    "111U": {(0, 1), (1, 0), (1, 2)},
    "030T": {(0, 1), (2, 1), (0, 2)},
    "030C": {(0, 1), (1, 2), (2, 0)},
    "201": {(0, 1), (1, 0), (1, 2), (2, 1)},
    "120D": {(1, 0), (1, 2), (0, 2), (2, 0)},
    "120U": {(0, 1), (2, 1), (0, 2), (2, 0)},
    "120C": {(0, 1), (1, 2), (0, 2), (2, 0)},
    "210": {(0, 1), (1, 2), (2, 1), (0, 2), (2, 0)},
    "300": {(0, 1), (1, 0), (1, 2), (2, 1), (0, 2), (2, 0)},
}
TRIAD_TYPES = sorted(_REPS)  # the 13 connected classes, fixed order


def _canon(edges: set) -> int:
    """Canonical 6-bit signature: min over the 6 vertex relabelings."""
    best = 1 << 7
    pairs = [(0, 1), (1, 0), (0, 2), (2, 0), (1, 2), (2, 1)]
    for perm in permutations(range(3)):
        sig = 0
        for bit, (i, j) in enumerate(pairs):
            if (perm[i], perm[j]) in edges:
                sig |= 1 << bit
        best = min(best, sig)
    return best


_BY_SIG = {_canon(es): name for name, es in _REPS.items()}


def _edges_from_code(u: int, v: int, code: int) -> set:
    out = set()
    if code & 1:
        out.add((u, v))
    if code & 2:
        out.add((v, u))
    return out


def _build_luts():
    """(closed 27-LUT indexed [ab][ac][bc] on codes 1..3 → class idx,
    open 9-LUT indexed [rel_x][rel_y] on rels 1..3 → class idx)."""
    closed = np.full((4, 4, 4), -1, np.int64)
    for ab in (1, 2, 3):
        for ac in (1, 2, 3):
            for bc in (1, 2, 3):
                es = (
                    _edges_from_code(0, 1, ab)
                    | _edges_from_code(0, 2, ac)
                    | _edges_from_code(1, 2, bc)
                )
                closed[ab, ac, bc] = TRIAD_TYPES.index(_BY_SIG[_canon(es)])
    open_ = np.full((4, 4), -1, np.int64)
    # center 0 with endpoints 1, 2; rel from the center: 1 out, 2 in, 3 mutual
    rel_edges = {1: {(0, 1)}, 2: {(1, 0)}, 3: {(0, 1), (1, 0)}}
    remap2 = {(0, 1): (0, 2), (1, 0): (2, 0)}
    for r1 in (1, 2, 3):
        for r2 in (1, 2, 3):
            es = set(rel_edges[r1]) | {remap2[e] for e in rel_edges[r2]}
            open_[r1, r2] = TRIAD_TYPES.index(_BY_SIG[_canon(es)])
    return closed, open_

_CLOSED_LUT, _OPEN_LUT = _build_luts()

# rel code from the center's perspective given the pair's u<v code:
# center == u → rel = code as-is (1 out, 2 in, 3 mutual); center == v →
# directions flip (1 ↔ 2)
_FLIP = np.array([0, 2, 1, 3], np.int64)


def _probe_codes(
    keys: np.ndarray, refs, bounds_hi: np.ndarray, cache: dict, extra=None
) -> np.ndarray:
    """Pair code per packed key (0 = pair absent) from the distributed
    sorted pair blocks — the value-returning twin of
    ``triangles._probe_mask``. ``extra`` = (keys, codes) of the small
    sorted boundary-run pairs that live outside the range-disjoint
    interior blocks (checked for every query)."""
    out = np.zeros(len(keys), np.int64)
    if len(keys) == 0:
        return out
    if extra is not None and len(extra[0]):
        ek, ec = extra
        pos = np.clip(np.searchsorted(ek, keys), 0, len(ek) - 1)
        hit = ek[pos] == keys
        out[hit] = ec[pos[hit]]
    order = np.argsort(keys, kind="stable")
    sk = keys[order]
    blk = np.searchsorted(bounds_hi, sk, side="left")
    for bi in np.unique(blk):
        if bi >= len(refs):
            continue
        m = blk == bi
        sel = sk[m]
        got = cache.get(bi)
        if got is None:
            t = ray.get(refs[bi])
            got = (
                t.column("key").combine_chunks().to_numpy(zero_copy_only=False),
                t.column("code").combine_chunks().to_numpy(zero_copy_only=False),
            )
            cache[bi] = got
        bk, bc = got
        if len(bk) == 0:
            continue
        pos = np.clip(np.searchsorted(bk, sel), 0, len(bk) - 1)
        hit = bk[pos] == sel
        idxs = order[m]
        out[idxs[hit]] = bc[pos[hit]]  # write hits only: misses may be
        # boundary pairs already resolved from ``extra``
    return out


def _census_rows(k: np.ndarray, rel: np.ndarray, n: int, refs, bounds_hi, cache: dict, extra=None):
    """Counts (len-13) of the wedges of center-sorted rows
    (k = center·n + x packed keys, rel aligned)."""
    counts = np.zeros(len(TRIAD_TYPES), np.int64)
    if len(k) < 2:
        return counts
    ctr = k // n
    x = k % n
    # bounded-chunk within-run pairs (hub centers chunked like TC)
    starts = np.flatnonzero(np.concatenate([[True], ctr[1:] != ctr[:-1]]))
    lengths = np.diff(np.concatenate([starts, [len(k)]]))
    work = lengths * (lengths - 1) // 2
    chunk = 1 << 20
    r, R = 0, len(starts)
    while r < R:
        if work[r] > chunk:
            s, L = starts[r], lengths[r]
            step = max(1, chunk // max(1, L))
            for j0 in range(0, L - 1, step):
                j1 = min(j0 + step, L - 1)
                lefts = np.arange(j0, j1)
                reps = L - 1 - lefts
                li = np.repeat(lefts, reps) + s
                cum = np.concatenate([[0], np.cumsum(reps)])
                ri = li + (np.arange(int(reps.sum())) - np.repeat(cum[:-1], reps)) + 1
                counts += _classify(ctr, x, rel, li, ri, n, refs, bounds_hi, cache, extra)
            r += 1
            continue
        e, tot = r, 0
        while e < R and tot + work[e] <= chunk:
            tot += work[e]
            e += 1
        e = max(e, r + 1)
        lo = starts[r]
        hi = starts[e] if e < R else len(k)
        li, ri = _pairs_multirun(ctr[lo:hi])
        if len(li):
            counts += _classify(ctr, x, rel, lo + li, lo + ri, n, refs, bounds_hi, cache, extra)
        r = e
    return counts


def _classify(ctr, x, rel, li, ri, n, refs, bounds_hi, cache, extra=None) -> np.ndarray:
    """Class counts for wedge index pairs (li, ri) into the
    center-sorted rows (within-run neighbors ascend, so x[li] < x[ri])."""
    m = ctr[li]
    a, ra = x[li], rel[li]
    b, rb = x[ri], rel[ri]
    code = _probe_codes(a * n + b, refs, bounds_hi, cache, extra)
    counts = np.zeros(len(TRIAD_TYPES), np.int64)
    open_m = code == 0
    if open_m.any():
        cls = _OPEN_LUT[ra[open_m], rb[open_m]]
        counts += np.bincount(cls, minlength=len(TRIAD_TYPES))
    closed_m = (~open_m) & (m < a)  # count each closed triple at its min vertex
    if closed_m.any():
        # a<b<c with a=center: codes to u<v convention = rel as-is
        cls = _CLOSED_LUT[ra[closed_m], rb[closed_m], code[closed_m]]
        counts += np.bincount(cls, minlength=len(TRIAD_TYPES))
    return counts


def triad_census(graph: Graph) -> pa.Table:
    """(triad_type, cnt) rows for the 13 connected classes with
    nonzero count, over the directed simple graph (duplicate edges
    and self-loops collapse)."""
    n = graph.num_vertices
    if n == 0 or graph.num_edges == 0:
        return pa.table({"triad_type": pa.array([], pa.string()), "cnt": pa.array([], pa.int64())})
    if n >= (1 << 31):
        raise NotImplementedError("packed-key census valid to ~3e9 vertices")

    # ---- pair table: one sort, run-OR merge ----
    def pair_partial(batch: pa.Table):
        s = batch_to_numpy(batch, "src")
        d = batch_to_numpy(batch, "dst")
        keep = s != d
        s, d = s[keep].astype(np.int64), d[keep].astype(np.int64)
        lo = np.minimum(s, d)
        hi = np.maximum(s, d)
        code = np.where(s < d, 1, 2).astype(np.int64)
        key = lo * n + hi
        # in-batch OR-combine per key
        order = np.argsort(key, kind="stable")
        key, code = key[order], code[order]
        newk = np.concatenate([[True], key[1:] != key[:-1]])
        grp = np.cumsum(newk) - 1
        out = np.zeros(int(grp[-1]) + 1 if len(grp) else 0, np.int64)
        np.bitwise_or.at(out, grp, code)
        return {"key": key[newk], "code": out}

    srt = (
        graph.edges.map_batches(pair_partial, batch_format="pyarrow", batch_size=None)
        .sort("key")
        .repartition(target_num_blocks(graph.num_edges))
        .materialize()
    )

    # in-block run-OR keeps interior pairs DISTRIBUTED (blocks remain
    # sorted with disjoint key ranges — the probe index); boundary
    # runs (≤2 per block) merge in a bounded driver pass and ride as
    # the probe's small sorted side table
    def interior_block(tbl: pa.Table) -> pa.Table:
        empty = pa.table({"key": pa.array([], pa.int64()), "code": pa.array([], pa.int64())})
        if tbl.num_rows == 0 or "key" not in tbl.schema.names:
            return empty
        k = batch_to_numpy(tbl, "key")
        c = batch_to_numpy(tbl, "code")
        if k[0] == k[-1]:
            return empty  # single key spans the block: all boundary
        s0 = int(np.searchsorted(k, k[0], side="right"))
        s1 = int(np.searchsorted(k, k[-1], side="left"))
        ki, ci = k[s0:s1], c[s0:s1]
        if not len(ki):
            return empty
        newk = np.concatenate([[True], ki[1:] != ki[:-1]])
        grp = np.cumsum(newk) - 1
        merged = np.zeros(int(grp[-1]) + 1, np.int64)
        np.bitwise_or.at(merged, grp, ci)
        return pa.table({"key": pa.array(ki[newk]), "code": pa.array(merged)})

    pairs = srt.map_batches(
        interior_block, batch_format="pyarrow", batch_size=None
    ).materialize()

    def boundary_rows(tbl: pa.Table):
        if tbl.num_rows == 0 or "key" not in tbl.schema.names:
            return None
        k = batch_to_numpy(tbl, "key")
        c = batch_to_numpy(tbl, "code")
        m = (k == k[0]) | (k == k[-1])
        return k[m], c[m]

    parts = [r for r in per_block_results(srt, boundary_rows) if r is not None]
    bkeys = np.concatenate([p[0] for p in parts]) if parts else np.empty(0, np.int64)
    bcodes = np.concatenate([p[1] for p in parts]) if parts else np.empty(0, np.int64)
    check_boundary_size(len(bkeys), "triad_census")
    if len(bkeys):
        order = np.argsort(bkeys, kind="stable")
        bkeys, bcodes = bkeys[order], bcodes[order]
        newk = np.concatenate([[True], bkeys[1:] != bkeys[:-1]])
        grp = np.cumsum(newk) - 1
        merged = np.zeros(int(grp[-1]) + 1, np.int64)
        np.bitwise_or.at(merged, grp, bcodes)
        bkeys, bcodes = bkeys[newk], merged

    prefs = pairs.to_arrow_refs()

    def bounds(t: pa.Table):
        if t.num_rows == 0:
            return None
        kcol = t.column("key").combine_chunks().to_numpy(zero_copy_only=False)
        return (int(kcol[0]), int(kcol[-1]))

    bs = per_block_results(pairs, bounds)
    keep = [i for i, b in enumerate(bs) if b is not None]
    prefs = [prefs[i] for i in keep]
    bounds_hi = np.array([bs[i][1] for i in keep], np.int64)
    extra_ref = ray.put((bkeys, bcodes))

    # ---- doubled center-packed table (boundary pairs ride along) ----
    import ray.data as rd

    pairs_all = pairs
    if len(bkeys):
        pairs_all = pairs.union(
            rd.from_arrow(pa.table({"key": pa.array(bkeys), "code": pa.array(bcodes)}))
        )

    def doubled(t: pa.Table):
        if t.num_rows == 0:
            return {"k": np.empty(0, np.int64), "rel": np.empty(0, np.int64)}
        key = batch_to_numpy(t, "key")
        code = batch_to_numpy(t, "code")
        u, v = key // n, key % n
        return {
            "k": np.concatenate([u * n + v, v * n + u]),
            "rel": np.concatenate([code, _FLIP[code]]),
        }

    dsrt = (
        pairs_all.map_batches(doubled, batch_format="pyarrow", batch_size=None)
        .sort("k")
        .repartition(target_num_blocks(2 * graph.num_edges))
        .materialize()
    )

    def census_block(t: pa.Table):
        empty = {"kind": np.empty(0, np.int64), "v1": np.empty(0, np.int64), "v2": np.empty(0, np.int64)}
        if t.num_rows == 0 or "k" not in t.schema.names:
            return empty
        k = batch_to_numpy(t, "k")
        rel = batch_to_numpy(t, "rel")
        aa = k // n
        if aa[0] == aa[-1]:
            s0 = s1 = len(k)
        else:
            s0 = int(np.searchsorted(aa, aa[0], side="right"))
            s1 = int(np.searchsorted(aa, aa[-1], side="left"))
        counts = _census_rows(
            k[s0:s1], rel[s0:s1], n, prefs, bounds_hi, {}, ray.get(extra_ref)
        )
        bnd = np.concatenate([np.arange(s0), np.arange(s1, len(k))])
        return {
            "kind": np.concatenate([np.zeros(len(TRIAD_TYPES), np.int64), np.ones(len(bnd), np.int64)]),
            "v1": np.concatenate([np.arange(len(TRIAD_TYPES), dtype=np.int64), k[bnd]]),
            "v2": np.concatenate([counts, rel[bnd]]),
        }

    total = np.zeros(len(TRIAD_TYPES), np.int64)
    rk, rr = [], []
    for t in dsrt.map_batches(census_block, batch_format="pyarrow", batch_size=None).iter_batches(
        batch_format="pyarrow"
    ):
        kind = batch_to_numpy(t, "kind")
        v1 = batch_to_numpy(t, "v1")
        v2 = batch_to_numpy(t, "v2")
        np.add.at(total, v1[kind == 0], v2[kind == 0])
        rk.append(v1[kind == 1])
        rr.append(v2[kind == 1])
    bkk = np.concatenate(rk) if rk else np.empty(0, np.int64)
    brr = np.concatenate(rr) if rr else np.empty(0, np.int64)
    if len(bkk):
        check_boundary_size(len(bkk), "triad_census")
        order = np.argsort(bkk, kind="stable")
        total += _census_rows(
            bkk[order], brr[order], n, prefs, bounds_hi, {}, (bkeys, bcodes)
        )

    nz = total > 0
    return pa.table(
        {
            "triad_type": pa.array([t for t, m in zip(TRIAD_TYPES, nz) if m], pa.string()),
            "cnt": pa.array(total[nz], pa.int64()),
        }
    )
