"""Link prediction — common-neighbor scores for non-adjacent pairs.

For every pair (x, y) at distance 2 in the undirected simple graph,
score the likelihood of a future edge by the classic neighborhood
measures (Liben-Nowell & Kleinberg, CIKM'03):

    cn      = |N(x) ∩ N(y)|                 (common neighbors, exact int)
    aa      = Σ_{c ∈ N(x)∩N(y)} 1/ln(d(c))  (Adamic-Adar)
    jaccard = cn / (d(x) + d(y) − cn)

Wedges are enumerated at their center — one pass over the adjacency
sorted by center, pairs per run — with **hub centers excluded**
(``max_center_degree``, default 64): a web-scale hub contributes
O(d²) near-zero-signal wedges (1/ln(d) → 0), and capping the center
degree is the standard way link prediction stays tractable at
10^12-edge scale (wedge volume becomes O(E · cap) instead of
O(Σ d²)). Pairs that are already edges are dropped by probing the
distributed sorted adjacency blocks (`truss._probe_mask`). Scores are
exact for the capped wedge set.

Scale posture: per-block tasks aggregate their own (pair, cn, aa)
partials; the driver merges ≤ #distinct capped 2-hop pairs and keeps
only top-k. At 10^12 edges the merge would instead flow into a
Dataset ``groupby(key)`` shuffle with per-partition top-k — the same
cutover `edge_support` documents.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from ..graph import Graph, canonical_undirected, target_num_blocks
from .triangles import _pairs_multirun
from .truss import _probe_mask

__all__ = ["link_prediction"]

_EMPTY = pa.table(
    {
        "u": pa.array([], pa.int64()),
        "w": pa.array([], pa.int64()),
        "cn": pa.array([], pa.int64()),
        "aa": pa.array([], pa.float64()),
        "jaccard": pa.array([], pa.float64()),
    }
)


def _wedge_partial(c, nb, deg, n, refs, bounds_hi, cache, cap):
    """(pair_keys, cn, aa) aggregated over the wedges of the given
    center-sorted adjacency rows, non-adjacent pairs only."""
    keep = deg[c] <= cap
    c, nb = c[keep], nb[keep]
    li, ri = _pairs_multirun(c)
    if len(li) == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64), np.empty(0, np.float64)
    # nb ascending within a run (center-major sorted keys) => x < y
    pk = nb[li] * n + nb[ri]
    hit = _probe_mask(pk, refs, bounds_hi, cache)
    live = ~hit
    if not live.any():
        return np.empty(0, np.int64), np.empty(0, np.int64), np.empty(0, np.float64)
    pk = pk[live]
    waa = 1.0 / np.log(deg[c[li[live]]].astype(np.float64))
    u, inv = np.unique(pk, return_inverse=True)
    cn = np.bincount(inv, minlength=len(u)).astype(np.int64)
    aa = np.bincount(inv, weights=waa, minlength=len(u))
    return u, cn, aa


def link_prediction(
    graph: Graph, *, k: int = 100, max_center_degree: int = 64
) -> pa.Table:
    """Top-k non-adjacent vertex pairs by (cn desc, u asc, w asc) with
    columns (u, w, cn, aa, jaccard); aa/jaccard rounded to 6 decimals
    (the oracle comparison contract for order-dependent float sums)."""
    cg = canonical_undirected(graph)
    n = cg.num_vertices
    if n == 0 or cg.num_edges == 0:
        return _EMPTY
    if n >= (1 << 31):
        raise NotImplementedError("packed-key link prediction valid to ~2e9 vertices")
    deg = (cg.out_degrees + cg.in_degrees()).astype(np.int64)
    deg_ref = ray.put(deg)
    cap = int(max_center_degree)

    def both_dir_keys(batch: pa.Table):
        from ..common import batch_to_numpy

        s = batch_to_numpy(batch, "src").astype(np.int64)
        d = batch_to_numpy(batch, "dst").astype(np.int64)
        return {"key": np.concatenate([s * n + d, d * n + s])}

    srt = (
        cg.edges.map_batches(both_dir_keys, batch_format="pyarrow", batch_size=None)
        .sort("key")
        .repartition(target_num_blocks(2 * cg.num_edges))
        .materialize()
    )
    refs = srt.to_arrow_refs()

    @ray.remote
    def _bounds(t: pa.Table):
        if t.num_rows == 0 or "key" not in t.schema.names:
            return None
        kk = t.column("key").combine_chunks().to_numpy(zero_copy_only=False)
        return (int(kk[0]), int(kk[-1]))

    bounds = ray.get([_bounds.remote(r) for r in refs])
    live = [i for i, bo in enumerate(bounds) if bo is not None]
    refs = [refs[i] for i in live]
    bounds_hi = np.array([bounds[i][1] for i in live], np.int64)

    @ray.remote
    def wedge_block(tbl: pa.Table):
        if tbl.num_rows == 0 or "key" not in tbl.schema.names:
            return None
        kk = tbl.column("key").combine_chunks().to_numpy(zero_copy_only=False)
        cc = kk // n
        # first/last (possibly straddling) runs go to the driver stitch;
        # a block-local segment already longer than cap can't survive the
        # degree filter, so skip shipping it
        s0 = int(np.searchsorted(cc, cc[0], side="right"))
        s1 = int(np.searchsorted(cc, cc[-1], side="left"))
        dd = ray.get(deg_ref)
        if s1 <= s0:  # single run spanning the whole block
            bk = kk if len(kk) <= cap else np.empty(0, np.int64)
            return None, bk
        b0 = kk[:s0] if s0 <= cap else np.empty(0, np.int64)
        b1 = kk[s1:] if len(kk) - s1 <= cap else np.empty(0, np.int64)
        part = _wedge_partial(
            cc[s0:s1], kk[s0:s1] % n, dd, n, refs, bounds_hi, {}, cap
        )
        return part, np.concatenate([b0, b1])

    outs = ray.get([wedge_block.remote(r) for r in refs])
    acc_k, acc_c, acc_a, bparts = [], [], [], []
    for o in outs:
        if o is None:
            continue
        part, bk = o
        if part is not None and len(part[0]):
            acc_k.append(part[0])
            acc_c.append(part[1])
            acc_a.append(part[2])
        if len(bk):
            bparts.append(bk)
    if bparts:
        bk = np.unique(np.concatenate(bparts))
        u, cn, aa = _wedge_partial(bk // n, bk % n, deg, n, refs, bounds_hi, {}, cap)
        if len(u):
            acc_k.append(u)
            acc_c.append(cn)
            acc_a.append(aa)
    if not acc_k:
        return _EMPTY

    keys = np.concatenate(acc_k)
    u, inv = np.unique(keys, return_inverse=True)
    cn = np.bincount(inv, weights=np.concatenate(acc_c), minlength=len(u)).astype(
        np.int64
    )
    aa = np.bincount(inv, weights=np.concatenate(acc_a), minlength=len(u))

    x = u // n
    y = u % n
    iu = cg.ids[x].astype(np.int64)
    iw = cg.ids[y].astype(np.int64)
    lo = np.minimum(iu, iw)
    hi = np.maximum(iu, iw)
    order = np.lexsort((hi, lo, -cn))[: int(k)]
    jac = cn[order] / (deg[x[order]] + deg[y[order]] - cn[order]).astype(np.float64)
    return pa.table(
        {
            "u": lo[order],
            "w": hi[order],
            "cn": cn[order],
            "aa": np.round(aa[order], 6),
            "jaccard": np.round(jac, 6),
        }
    )
