"""Edge support — per-edge triangle counts (the k-truss basis and the
common-neighbor score of link prediction).

support(u,v) = |N(u) ∩ N(v)| over the undirected simple graph: every
triangle {c,x,y} contributes +1 to each of its three edges. Reuses
the triangle-count machinery's degree-ordered orientation (each
triangle enumerated exactly once as a wedge at its lowest-order
vertex, hub wedge volume bounded by out-degree ≤ O(√E),
`triangle_counting.h:531-567` semantics) — but where TC counts probe
hits, this emits the three edge keys of every CLOSED wedge and
merges per-key counts.

Scale posture: per-block tasks aggregate their own emissions to
unique (key, count) partials; the driver merges ≤ E distinct keys —
the same O(E_canonical) envelope as the canonical-graph build. At
10^12-edge scale the partials would instead flow into a Dataset
``groupby(key).sum`` (the shuffle path TC's ``probe='shuffle'``
already demonstrates).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from ..common import batch_to_numpy
from ..graph import Graph, target_num_blocks
from .triangles import _orient_pairs

__all__ = ["edge_support", "ktruss", "local_clustering"]


def _probe_mask(wk: np.ndarray, refs, bounds_hi: np.ndarray, cache: dict) -> np.ndarray:
    """Membership mask of each wedge key in the distributed sorted
    edge-key blocks (alignment-preserving variant of _probe_count)."""
    hit = np.zeros(len(wk), bool)
    if len(wk) == 0:
        return hit
    order = np.argsort(wk)
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
        hit[order[m]] = keys[pos] == sel
    return hit


def _support_partial(a, b, deg, n, refs, bounds_hi, cache):
    """(keys, counts) support contributions from the wedges of the
    given oriented rows: for every closed wedge (c; x, y) credit the
    edges (x,y), (c,x), (c,y)."""
    acc_k, acc_c = [], []
    m = len(a)
    if m >= 2:
        starts = np.flatnonzero(np.concatenate([[True], a[1:] != a[:-1]]))
        lengths = np.diff(np.concatenate([starts, [m]]))
        # reuse the chunked pair generator but regenerate (li, ri) so
        # the center/legs stay aligned with each emitted xy key
        for legL, legR, xk, yk in _wedge_triples(a, b, starts, lengths, deg, n):
            hit = _probe_mask(xk * n + yk, refs, bounds_hi, cache)
            if hit.any():
                trio = np.concatenate(
                    [xk[hit] * n + yk[hit], legL[hit], legR[hit]]
                )
                u, c = np.unique(trio, return_counts=True)
                acc_k.append(u)
                acc_c.append(c)
    if not acc_k:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    keys = np.concatenate(acc_k)
    cnts = np.concatenate(acc_c)
    u, inv = np.unique(keys, return_inverse=True)
    return u, np.bincount(inv, weights=cnts).astype(np.int64)


def _wedge_triples(a, b, starts, lengths, deg, n, wedge_chunk: int = 1 << 20):
    """Yield (leg_left_keys, leg_right_keys, x, y) per bounded wedge
    chunk — the same run grouping as triangles._gen_wedge_chunks, but
    keeping the wedge center's two leg keys aligned with each oriented
    closing pair (x, y)."""
    work = lengths * (lengths - 1) // 2
    r, R, m = 0, len(starts), len(a)
    while r < R:
        if work[r] > wedge_chunk:
            s, L = starts[r], lengths[r]
            c = a[s]
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
                yield c * n + nbrs[li], c * n + nbrs[ri], x, y
            r += 1
            continue
        e, tot = r, 0
        while e < R and tot + work[e] <= wedge_chunk:
            tot += work[e]
            e += 1
        e = max(e, r + 1)
        lo = starts[r]
        hi = starts[e] if e < R else m
        from .triangles import _pairs_multirun

        li, ri = _pairs_multirun(a[lo:hi])
        if len(li):
            x, y = _orient_pairs(b[lo + li], b[lo + ri], deg)
            c = a[lo + li]
            yield c * n + b[lo + li], c * n + b[lo + ri], x, y
        r = e


def edge_support(graph: Graph) -> pa.Table:
    """(src, dst, support) per undirected simple edge (src < dst,
    original ids); support = number of triangles through the edge."""
    n = graph.num_vertices
    if n == 0:
        return pa.table(
            {
                "src": pa.array([], pa.int64()),
                "dst": pa.array([], pa.int64()),
                "support": pa.array([], pa.int64()),
            }
        )
    if n >= (1 << 31):
        raise NotImplementedError("packed-key support valid to ~2e9 vertices")

    deg = graph.out_degrees + graph.in_degrees()
    deg_ref = ray.put(deg)

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

    # per-block: interior-run support partials + boundary rows for the
    # driver stitch (same split as triangle_count's fused pass)
    @ray.remote
    def support_block(tbl: pa.Table):
        if tbl.num_rows == 0 or "key" not in tbl.schema.names:
            return None
        k = tbl.column("key").combine_chunks().to_numpy(zero_copy_only=False)
        if len(k) == 0:
            return None
        aa = k // n
        s0 = int(np.searchsorted(aa, aa[0], side="right"))
        s1 = int(np.searchsorted(aa, aa[-1], side="left"))
        bkeys = np.concatenate([k[:s0], k[s1:]])
        u = c = None
        if s1 - s0 >= 2:
            kk = np.unique(k[s0:s1])
            dd = ray.get(deg_ref)
            u, c = _support_partial(kk // n, kk % n, dd, n, refs, bounds_hi, {})
        return u, c, bkeys

    parts = ray.get([support_block.remote(r) for r in refs])
    acc_k, acc_c, bparts = [], [], []
    for p in parts:
        if p is None:
            continue
        u, c, bkeys = p
        if u is not None and len(u):
            acc_k.append(u)
            acc_c.append(c)
        if len(bkeys):
            bparts.append(bkeys)
    if bparts:
        bk = np.unique(np.concatenate(bparts))
        if len(bk) >= 2:
            u, c = _support_partial(bk // n, bk % n, deg, n, refs, bounds_hi, {})
            if len(u):
                acc_k.append(u)
                acc_c.append(c)

    # merge partials (≤ E distinct keys) and join with ALL edges.
    # np.unique, not sort: both directions of a mutual directed edge
    # orient to the SAME key and may arrive from different blocks
    all_keys = np.unique(
        np.concatenate(
            [b.column("key").combine_chunks().to_numpy(zero_copy_only=False) for b in ray.get(refs)]
        )
    ) if refs else np.empty(0, np.int64)
    support = np.zeros(len(all_keys), np.int64)
    if acc_k:
        keys = np.concatenate(acc_k)
        cnts = np.concatenate(acc_c)
        u, inv = np.unique(keys, return_inverse=True)
        tot = np.bincount(inv, weights=cnts).astype(np.int64)
        pos = np.searchsorted(all_keys, u)
        support[pos] = tot
    x = all_keys // n
    y = all_keys % n
    su, sv = graph.ids[x], graph.ids[y]
    lo = np.minimum(su, sv)
    hi = np.maximum(su, sv)
    return pa.table({"src": lo, "dst": hi, "support": support})


def local_clustering(graph: Graph) -> pa.Table:
    """Per-vertex triangle count and local clustering coefficient over
    the undirected simple graph: ``coeff(v) = 2·tri(v) / (d(v)·(d(v)−1))``
    (Watts–Strogatz), 0 where d(v) < 2.

    Derived from :func:`edge_support` — each triangle at v has exactly
    two incident edges at v, each crediting the triangle to its
    support, so ``tri(v) = Σ_{e∋v} support(e) / 2`` exactly. The
    per-vertex reduction is two bincounts over the O(E_canonical)
    support table — the same driver envelope edge_support already
    holds; at 10^12-edge scale both would flow through a
    ``groupby(vertex).sum`` instead.

    Returns (vertex, triangles, degree, coeff) for every dense vertex,
    original ids; degree = number of distinct simple neighbors.
    """
    sup = edge_support(graph)
    n = graph.num_vertices
    if n == 0:
        return pa.table(
            {
                "vertex": pa.array([], pa.int64()),
                "triangles": pa.array([], pa.int64()),
                "degree": pa.array([], pa.int64()),
                "coeff": pa.array([], pa.float64()),
            }
        )
    s = sup.column("src").to_numpy(zero_copy_only=False)
    d = sup.column("dst").to_numpy(zero_copy_only=False)
    c = sup.column("support").to_numpy(zero_copy_only=False)
    ps = np.searchsorted(graph.ids, s)
    pd_ = np.searchsorted(graph.ids, d)
    tri2 = np.bincount(ps, weights=c, minlength=n) + np.bincount(pd_, weights=c, minlength=n)
    tri = (tri2 / 2).astype(np.int64)  # exact: tri2 is even, < 2^53
    deg = np.bincount(ps, minlength=n) + np.bincount(pd_, minlength=n)
    denom = deg * (deg - 1)
    with np.errstate(divide="ignore", invalid="ignore"):
        coeff = np.where(denom > 0, 2.0 * tri / denom, 0.0)
    return pa.table(
        {
            "vertex": graph.ids,
            "triangles": tri,
            "degree": deg.astype(np.int64),
            "coeff": coeff,
        }
    )


def ktruss(graph: Graph, k: int, *, max_rounds: int = 64):
    """Edges of the k-truss (src < dst, original ids): the maximal
    subgraph in which every edge is in ≥ k−2 triangles *of the
    subgraph*. Standard peel loop: compute per-edge support
    (:func:`edge_support`), drop light edges, recompute on the shrunk
    graph, until fixpoint.

    Every round is the fully distributed support pass over the current
    subgraph — the peel touches only the surviving O(E') edges, and
    the subgraph rebuild is the ordinary distributed densify. (An
    incremental variant would re-score only edges that lost a
    triangle; the full recompute keeps rounds embarrassingly simple
    and each round's cost proportional to the shrinking subgraph.)

    Returns (table, rounds): table has columns (src, dst, support)
    with the fixpoint supports; ``rounds`` = peel iterations until no
    edge was dropped (0 if the input is already a k-truss).
    """
    if k < 3:
        raise ValueError("k-truss needs k >= 3")
    import ray.data as rd

    thresh = k - 2
    g = graph
    sup = edge_support(g)
    rounds = 0
    while True:
        s = sup.column("support").to_numpy(zero_copy_only=False)
        keep = s >= thresh
        if keep.all():
            return sup, rounds
        if rounds >= max_rounds:
            raise RuntimeError(f"k-truss did not converge in {max_rounds} rounds")
        kept = sup.filter(pa.array(keep)).select(["src", "dst"])
        if kept.num_rows == 0:
            return kept.append_column("support", pa.array([], pa.int64())), rounds + 1
        g = __import__("llama_ray.graph", fromlist=["build_graph"]).build_graph(
            rd.from_arrow(kept)
        )
        sup = edge_support(g)
        rounds += 1
