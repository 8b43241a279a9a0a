"""Directed triad census — the 13 connected Holland–Leinhardt triad
classes (021D…300), distributed.

The motif completion of the clique family (triangles → squares → K4 →
this): every connected unordered vertex triple of the directed simple
graph classified by isomorphism type. Method (Batagelj–Mrvar-style
pair-type reformulation, one sort + an analytic open count + a degree-oriented closed pass):

1. **pair table**: each unordered linked pair ``u<v`` gets a code
   ``1`` (u→v only), ``2`` (v→u only), ``3`` (mutual) — built from the
   edge blocks as packed keys ``u·n + v`` with OR-combined direction
   bits: ONE distributed range sort, in-block run-OR, tiny boundary
   pass. The sorted (key, code) blocks double as the closing-pair
   probe index (zero-copy plasma reads, the triangles.py pattern).
2. **open classes, analytically**: per-center rel histograms
   (out/in/mutual counts — one sparse-partial pass over the pair
   blocks, O(V) driver state like the degree vectors) give each
   center's wedge multiset counts (C(n_o,2) of out-out → 021D,
   n_o·n_i → 021C, … 201); each triangle's three center multisets
   are subtracted by the closed pass. No open wedge is ever
   enumerated — hubs cost O(deg), not O(deg²).
3. **closed classes**: triangles enumerated exactly once through the
   degree-oriented wedge bound (the triangles.py machinery over
   id-oriented pair keys re-oriented by (degree, id)), each
   classified by its 3 pair codes in i<j<k id convention via a
   27-entry lookup built at import by brute-force canonicalization
   (min over the 6 vertex permutations of the 6-bit adjacency
   signature), so the class names are correct by construction
   against the standard catalog representatives.

Block-edge runs resolve in bounded driver passes (≤2 runs per
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



# the 6 unordered rel multisets {rel_x, rel_y} of an open wedge and
# their triad classes (the OPEN LUT is symmetric by vertex relabeling)
_MULTISETS = [(1, 1), (1, 2), (1, 3), (2, 2), (2, 3), (3, 3)]
_OPEN_OF_MULTI = np.array([_OPEN_LUT[a, b] for a, b in _MULTISETS], np.int64)
# multiset index lookup: _MIDX[min(r1,r2), max(r1,r2)]
_MIDX = np.full((4, 4), -1, np.int64)
for _i, (_a, _b) in enumerate(_MULTISETS):
    _MIDX[_a, _b] = _i
    _MIDX[_b, _a] = _i


def _classify_triangles(m, x, y, n, prefs, bounds_hi, cache, extra):
    """(closed class counts (13,), open-wedge corrections (6,)) for
    triangles (m ≺ x ≺ y in degree order; every triangle exactly
    once). Codes probed from the id-packed pair index; each triangle
    also subtracts its 3 centers' rel multisets from the analytic
    open-wedge totals."""
    i = np.minimum(np.minimum(m, x), y)
    k = np.maximum(np.maximum(m, x), y)
    j = m + x + y - i - k
    c_ij = _probe_codes(i * n + j, prefs, bounds_hi, cache, extra)
    c_ik = _probe_codes(i * n + k, prefs, bounds_hi, cache, extra)
    c_jk = _probe_codes(j * n + k, prefs, bounds_hi, cache, extra)
    closed = np.bincount(
        _CLOSED_LUT[c_ij, c_ik, c_jk], minlength=len(TRIAD_TYPES)
    )
    corr = np.zeros(len(_MULTISETS), np.int64)
    # center i: rels (c_ij, c_ik); center j: (flip c_ij, c_jk);
    # center k: (flip c_ik, flip c_jk)
    for r1, r2 in (
        (c_ij, c_ik),
        (_FLIP[c_ij], c_jk),
        (_FLIP[c_ik], _FLIP[c_jk]),
    ):
        corr += np.bincount(_MIDX[r1, r2], minlength=len(_MULTISETS))
    return closed, corr


def _closed_pass_rows(kk, deg, n, orefs, obounds_hi, prefs, bounds_hi, extra):
    """Run the degree-oriented wedge → closure-probe → classify pass
    over oriented rows ``kk`` (sorted, interior runs only or the
    driver's stitched boundary rows). Returns (closed (13,), corr (6,))."""
    from .triangles import _gen_wedge_chunks, _probe_mask

    closed = np.zeros(len(TRIAD_TYPES), np.int64)
    corr = np.zeros(len(_MULTISETS), np.int64)
    if len(kk) < 2:
        return closed, corr
    cache_pair: dict = {}
    for ctr, xx, yy in _gen_wedge_chunks(kk // n, kk % n, deg, n, with_center=True):
        lo = np.minimum(xx, yy)
        hi = np.maximum(xx, yy)
        code = _probe_codes(lo * n + hi, prefs, bounds_hi, cache_pair, extra)
        hit = code > 0
        if hit.any():
            cl, co = _classify_triangles(
                ctr[hit], xx[hit], yy[hit], n, prefs, bounds_hi, cache_pair, extra
            )
            closed += cl
            corr += co
    return closed, corr


def triad_census(graph: Graph) -> pa.Table:
    """(triad_type, cnt) rows for the 13 connected classes with
    nonzero count, over the directed simple graph (duplicate edges
    and self-loops collapse).

    Open classes are counted ANALYTICALLY — per-center rel histograms
    (one sparse-partial pass over the pair blocks, O(E) work, O(V)
    driver state like the degree vectors) give every center's wedge
    multiset counts; the closed pass subtracts each triangle's three
    center multisets. No open wedge is ever enumerated, so hub
    vertices cost O(deg), not O(deg²) — the same reason the reference
    counts triangles degree-oriented."""
    n = graph.num_vertices
    if n == 0 or graph.num_edges == 0:
        return pa.table({"triad_type": pa.array([], pa.string()), "cnt": pa.array([], pa.int64())})
    if n >= (1 << 31):
        raise NotImplementedError("packed-key census valid to ~3e9 vertices")

    # ---- pair table: one sort, run-OR merge; blocks = probe index ----
    def pair_partial(batch: pa.Table):
        s = batch_to_numpy(batch, "src")
        d = batch_to_numpy(batch, "dst")
        keep = s != d
        s, d = s[keep].astype(np.int64), d[keep].astype(np.int64)
        lo = np.minimum(s, d)
        hi = np.maximum(s, d)
        code = np.where(s < d, 1, 2).astype(np.int64)
        key = lo * n + hi
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
    keepb = [i for i, b in enumerate(bs) if b is not None]
    prefs = [prefs[i] for i in keepb]
    bounds_hi = np.array([bs[i][1] for i in keepb], np.int64)
    extra = (bkeys, bcodes)
    extra_ref = ray.put(extra)

    import ray.data as rd

    pairs_all = pairs
    if len(bkeys):
        pairs_all = pairs.union(
            rd.from_arrow(pa.table({"key": pa.array(bkeys), "code": pa.array(bcodes)}))
        )

    # ---- per-center rel histograms → analytic open totals ----
    def hist_partial(t: pa.Table):
        if t.num_rows == 0 or "key" not in t.schema.names:
            return {"hk": np.empty(0, np.int64), "c": np.empty(0, np.int64)}
        key = batch_to_numpy(t, "key")
        code = batch_to_numpy(t, "code")
        u, v = key // n, key % n
        hk = np.concatenate([u * 4 + code, v * 4 + _FLIP[code]])
        from ..common import sparse_partial_sum

        uk, cs = sparse_partial_sum(hk, np.ones(len(hk), np.int64))
        return {"hk": uk, "c": cs.astype(np.int64)}

    hist = np.zeros((n, 4), np.int64)
    for t in pairs_all.map_batches(hist_partial, batch_format="pyarrow", batch_size=None).iter_batches(
        batch_format="pyarrow"
    ):
        hk = batch_to_numpy(t, "hk")
        cs = batch_to_numpy(t, "c")
        np.add.at(hist.reshape(-1), hk, cs)
    n1, n2, n3 = hist[:, 1], hist[:, 2], hist[:, 3]
    open_tot = np.array(
        [
            (n1 * (n1 - 1) // 2).sum(),
            (n1 * n2).sum(),
            (n1 * n3).sum(),
            (n2 * (n2 - 1) // 2).sum(),
            (n2 * n3).sum(),
            (n3 * (n3 - 1) // 2).sum(),
        ],
        np.int64,
    )

    # ---- degree-oriented closed pass (triangles exactly once) ----
    deg = graph.out_degrees + graph.in_degrees()
    deg_ref = ray.put(deg)
    from .triangles import _orient_pairs

    def orient(t: pa.Table):
        if t.num_rows == 0 or "key" not in t.schema.names:
            return {"ok": np.empty(0, np.int64)}
        key = batch_to_numpy(t, "key")
        u, v = key // n, key % n
        x, y = _orient_pairs(u, v, ray.get(deg_ref))
        return {"ok": x * n + y}

    osrt = (
        pairs_all.map_batches(orient, batch_format="pyarrow", batch_size=None)
        .sort("ok")
        .repartition(target_num_blocks(graph.num_edges))
        .materialize()
    )

    def closed_block(t: pa.Table):
        empty = {
            "kind": np.empty(0, np.int64),
            "idx": np.empty(0, np.int64),
            "val": np.empty(0, np.int64),
        }
        if t.num_rows == 0 or "ok" not in t.schema.names:
            return empty
        k = batch_to_numpy(t, "ok")
        aa = k // n
        if aa[0] == aa[-1]:
            s0 = s1 = len(k)
        else:
            s0 = int(np.searchsorted(aa, aa[0], side="right"))
            s1 = int(np.searchsorted(aa, aa[-1], side="left"))
        dd = ray.get(deg_ref)
        closed, corr = _closed_pass_rows(
            k[s0:s1], dd, n, None, None, prefs, bounds_hi, ray.get(extra_ref)
        )
        bnd = k[np.concatenate([np.arange(s0), np.arange(s1, len(k))])]
        return {
            "kind": np.concatenate(
                [np.zeros(13, np.int64), np.ones(6, np.int64), np.full(len(bnd), 2, np.int64)]
            ),
            "idx": np.concatenate(
                [np.arange(13, dtype=np.int64), np.arange(6, dtype=np.int64), np.zeros(len(bnd), np.int64)]
            ),
            "val": np.concatenate([closed, corr, bnd]),
        }

    closed_tot = np.zeros(len(TRIAD_TYPES), np.int64)
    corr_tot = np.zeros(len(_MULTISETS), np.int64)
    bnd_parts = []
    for t in osrt.map_batches(closed_block, batch_format="pyarrow", batch_size=None).iter_batches(
        batch_format="pyarrow"
    ):
        kind = batch_to_numpy(t, "kind")
        idx = batch_to_numpy(t, "idx")
        val = batch_to_numpy(t, "val")
        np.add.at(closed_tot, idx[kind == 0], val[kind == 0])
        np.add.at(corr_tot, idx[kind == 1], val[kind == 1])
        bnd_parts.append(val[kind == 2])
    bnd = np.concatenate(bnd_parts) if bnd_parts else np.empty(0, np.int64)
    if len(bnd):
        check_boundary_size(len(bnd), "triad_census")
        bnd = np.sort(bnd)
        cl, co = _closed_pass_rows(bnd, deg, n, None, None, prefs, bounds_hi, extra)
        closed_tot += cl
        corr_tot += co

    total = closed_tot.copy()
    np.add.at(total, _OPEN_OF_MULTI, open_tot - corr_tot)

    nz = total > 0
    return pa.table(
        {
            "triad_type": pa.array([t for t, m in zip(TRIAD_TYPES, nz) if m], pa.string()),
            "cnt": pa.array(total[nz], pa.int64()),
        }
    )
