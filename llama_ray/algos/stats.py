"""Graph diagnostics — one-liner distributed aggregates.

Reference analogues:
- ``degree_distribution``: log2-bucketed out-degree histogram
  (`/root/reference/benchmark/tools/degree_distribution.h:55-147`);
- ``edge_prop_stats``: min/max/sum/count/mean of an edge property
  (`/root/reference/benchmark/tools/property_stats.h:50-178`).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd
from ray.data.aggregate import Count, Max, Mean, Min, Sum

from ..common import DST, SRC, batch_to_numpy


def degree_distribution(edges: rd.Dataset, *, direction: str = "out") -> "pa.Table":
    """log2 bucket histogram of degrees: rows (bucket, num_vertices,
    num_edges) where bucket b covers degrees [2^b, 2^(b+1)) and
    bucket -1 is degree 0 vertices (not representable from an edge
    list — omitted, as only vertices with ≥1 edge appear).

    Two-stage: groupby(vertex).count (shuffle #1, partial-combined by
    Ray) → per-batch bucketing → groupby(bucket) (tiny shuffle #2).
    """
    key = SRC if direction == "out" else DST
    degrees = edges.select_columns([key]).groupby(key).aggregate(Count(alias_name="degree"))

    def bucketize(batch: pa.Table):
        d = batch_to_numpy(batch, "degree").astype(np.int64)
        return {"bucket": np.floor(np.log2(d)).astype(np.int64), "degree": d}

    hist = (
        degrees.map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Count(alias_name="num_vertices"), Sum("degree", alias_name="num_edges"))
    )
    return hist.sort("bucket").to_pandas()


def level_spread(edges: rd.Dataset, *, level_col: str = "snapshot"):
    """Per-vertex count of distinct snapshot levels its adjacency
    spans (reference ``level_spread``,
    `/root/reference/benchmark/tools/level_spread.h:50-157`):
    histogram rows (num_levels, num_vertices). Two-stage: per-batch
    distinct (src, level) pairs → groupby(src) distinct-count →
    bucket histogram."""
    import pyarrow.compute as pc

    def pairs(batch: pa.Table):
        s = batch_to_numpy(batch, SRC)
        lv = batch_to_numpy(batch, level_col)
        u = np.unique(np.stack([s, lv]), axis=1)
        return {"src": u[0], "level": u[1]}

    distinct = (
        edges.map_batches(pairs, batch_format="pyarrow")
        .groupby(["src", "level"])
        .aggregate(Count(alias_name="_n"))
    )
    per_vertex = distinct.groupby("src").aggregate(Count(alias_name="num_levels"))
    hist = per_vertex.groupby("num_levels").aggregate(Count(alias_name="num_vertices"))
    return hist.sort("num_levels").to_pandas()


def edge_prop_stats(edges: rd.Dataset, prop: str = "weight"):
    """Global min/max/sum/count/mean of one edge column (the
    reference's default property is ``stream-weight``)."""
    out = edges.select_columns([prop]).aggregate(
        Min(prop, alias_name="min"),
        Max(prop, alias_name="max"),
        Sum(prop, alias_name="sum"),
        Count(alias_name="count"),
        Mean(prop, alias_name="mean"),
    )
    return out


def degree_assortativity(graph) -> pa.Table:
    """Newman degree assortativity of the undirected simple graph:
    Pearson correlation of (deg(u), deg(v)) over both orientations of
    every edge. ``graph`` must be canonical (src < dst, simple —
    :func:`llama_ray.graph.canonical_undirected`).

    Partials are exact integer sums per edge block (broadcast degree
    vector, one pass, no shuffle); the driver combines Python ints and
    performs the single float division, mirroring the SQL oracle's
    CAST-to-double arithmetic bit-for-bit. Per-block int64 envelope:
    hub_degree² × block_rows < 2^63 (holds to ~10^6-degree hubs at 8M
    rows/block).
    """
    import ray

    from ..graph import Graph  # noqa: F401 (documented input type)

    deg = graph.out_degrees + graph.in_degrees()
    deg_ref = ray.put(deg.astype(np.int64))

    def partial(batch: pa.Table):
        s = batch_to_numpy(batch, SRC)
        d = batch_to_numpy(batch, DST)
        dd = ray.get(deg_ref)
        xs, ys = dd[s], dd[d]
        return {
            "n": np.array([2 * len(s)], np.int64),
            "sx": np.array([int(xs.sum()) + int(ys.sum())], np.int64),
            "sxx": np.array([int((xs * xs).sum()) + int((ys * ys).sum())], np.int64),
            "sxy": np.array([2 * int((xs * ys).sum())], np.int64),
        }

    n = sx = sxx = sxy = 0
    for b in graph.edges.map_batches(
        partial, batch_format="pyarrow", batch_size=None
    ).iter_batches(batch_format="pyarrow"):
        if b.num_rows == 0 or "n" not in b.schema.names:
            continue
        n += int(pa.compute.sum(b.column("n")).as_py() or 0)
        sx += int(pa.compute.sum(b.column("sx")).as_py() or 0)
        sxx += int(pa.compute.sum(b.column("sxx")).as_py() or 0)
        sxy += int(pa.compute.sum(b.column("sxy")).as_py() or 0)
    num = n * sxy - sx * sx
    den = n * sxx - sx * sx
    r = float(num) / float(den) if den else 0.0
    return pa.table(
        {
            "n_pairs": pa.array([n], pa.int64()),
            "assortativity": pa.array([r], pa.float64()),
        }
    )


def reciprocity(edges: rd.Dataset, num_vertices_hint: int | None = None) -> pa.Table:
    """Edge reciprocity of the directed simple graph: fraction of
    non-self-loop edges whose reverse edge also exists. ``edges`` must
    be deduplicated (each directed pair once). One packed-key groupby
    (the only shuffle); everything else is per-batch arithmetic.
    """

    def keys(batch: pa.Table):
        s = batch_to_numpy(batch, SRC)
        d = batch_to_numpy(batch, DST)
        keep = s != d
        s, d = s[keep], d[keep]
        lo = np.minimum(s, d)
        hi = np.maximum(s, d)
        # packed unordered key — int64-safe for ids < 2^31; larger id
        # spaces would densify first (graph ids are dense already)
        return {"k": lo * np.int64(1 << 31) + hi}

    counts = (
        edges.map_batches(keys, batch_format="pyarrow", batch_size=None)
        .groupby("k")
        .aggregate(Count(alias_name="c"))
    )

    def tally(batch: pa.Table):
        c = batch_to_numpy(batch, "c")
        return {
            "mutual": np.array([2 * int((c == 2).sum())], np.int64),
            "total": np.array([int(c.sum())], np.int64),
        }

    mutual = total = 0
    for b in counts.map_batches(tally, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        if b.num_rows == 0 or "mutual" not in b.schema.names:
            continue
        mutual += int(pa.compute.sum(b.column("mutual")).as_py() or 0)
        total += int(pa.compute.sum(b.column("total")).as_py() or 0)
    r = float(mutual) / float(total) if total else 0.0
    return pa.table(
        {
            "mutual_edges": pa.array([mutual], pa.int64()),
            "total_edges": pa.array([total], pa.int64()),
            "reciprocity": pa.array([r], pa.float64()),
        }
    )


def modularity(graph, labels: np.ndarray) -> pa.Table:
    """Newman modularity Q of a vertex partition over the undirected
    simple graph (canonical form): Q = intra/m − Σ_c a_c² / (4m²)
    with a_c = Σ_{v∈c} deg(v). ``labels`` is dense-indexed
    (labels[i] labels graph.ids[i]).

    intra-edge counting is a one-pass broadcast partial over edge
    blocks; a_c sums are an O(V) driver bincount over the label vector
    the caller already holds. All terms are exact integers; Q is two
    float divisions, mirrored in the SQL oracle.
    """
    import ray

    m = graph.num_edges
    if m == 0:
        return pa.table(
            {
                "num_edges": pa.array([0], pa.int64()),
                "intra_edges": pa.array([0], pa.int64()),
                "modularity": pa.array([0.0], pa.float64()),
            }
        )
    lab_ref = ray.put(np.asarray(labels))

    def partial(batch: pa.Table):
        s = batch_to_numpy(batch, SRC)
        d = batch_to_numpy(batch, DST)
        lab = ray.get(lab_ref)
        return {"intra": np.array([int((lab[s] == lab[d]).sum())], np.int64)}

    intra = 0
    for b in graph.edges.map_batches(
        partial, batch_format="pyarrow", batch_size=None
    ).iter_batches(batch_format="pyarrow"):
        if b.num_rows == 0 or "intra" not in b.schema.names:
            continue
        intra += int(pa.compute.sum(b.column("intra")).as_py() or 0)
    deg = graph.out_degrees + graph.in_degrees()
    _, inv = np.unique(np.asarray(labels), return_inverse=True)
    a_c = np.bincount(inv, weights=deg).astype(np.int64)
    sumsq = int((a_c.astype(object) ** 2).sum())  # exact beyond 2^53
    q = float(intra) / float(m) - float(sumsq) / float(4 * m * m)
    return pa.table(
        {
            "num_edges": pa.array([m], pa.int64()),
            "intra_edges": pa.array([intra], pa.int64()),
            "modularity": pa.array([q], pa.float64()),
        }
    )


def rich_club(graph) -> pa.Table:
    """Rich-club coefficients of the undirected simple graph: for each
    distinct degree value k, φ(k) = 2·E_k / (n_k·(n_k−1)) where n_k =
    vertices with degree > k and E_k = edges with BOTH endpoints of
    degree > k. ``graph`` must be canonical (src < dst, simple).

    One broadcast-degree pass: each edge block bincounts its edges by
    min(deg(u), deg(v)); the driver suffix-sums the merged histogram
    alongside the degree histogram — exact integers end to end, the
    single float division per row replayed identically by the SQL
    oracle. Rows where n_k < 2 are omitted (φ undefined).
    """
    import ray

    n = graph.num_vertices
    if n == 0:
        return pa.table(
            {
                "k": pa.array([], pa.int64()),
                "n_vertices": pa.array([], pa.int64()),
                "n_edges": pa.array([], pa.int64()),
                "phi": pa.array([], pa.float64()),
            }
        )
    deg = (graph.out_degrees + graph.in_degrees()).astype(np.int64)
    max_d = int(deg.max())
    deg_ref = ray.put(deg)

    def partial(batch: pa.Table):
        s = batch_to_numpy(batch, SRC)
        d = batch_to_numpy(batch, DST)
        dd = ray.get(deg_ref)
        md = np.minimum(dd[s], dd[d])
        h = np.bincount(md, minlength=max_d + 1)
        return {"md": np.arange(max_d + 1, dtype=np.int64), "e": h}

    em = np.zeros(max_d + 1, np.int64)
    for b in graph.edges.map_batches(
        partial, batch_format="pyarrow", batch_size=None
    ).iter_batches(batch_format="pyarrow"):
        if b.num_rows == 0 or "md" not in b.schema.names:
            continue
        np.add.at(em, batch_to_numpy(b, "md"), batch_to_numpy(b, "e"))

    dh = np.bincount(deg, minlength=max_d + 1)
    # suffix sums: strictly-greater-than-k tails
    nk_tail = np.cumsum(dh[::-1])[::-1]  # Σ_{d ≥ k}
    ek_tail = np.cumsum(em[::-1])[::-1]
    ks = np.unique(deg)
    n_k = np.where(ks + 1 <= max_d, nk_tail[np.minimum(ks + 1, max_d)], 0)
    e_k = np.where(ks + 1 <= max_d, ek_tail[np.minimum(ks + 1, max_d)], 0)
    keep = n_k >= 2
    ks, n_k, e_k = ks[keep], n_k[keep], e_k[keep]
    phi = np.round(2.0 * e_k / (n_k * (n_k - 1.0)), 6)
    return pa.table(
        {
            "k": pa.array(ks, pa.int64()),
            "n_vertices": pa.array(n_k.astype(np.int64), pa.int64()),
            "n_edges": pa.array(e_k.astype(np.int64), pa.int64()),
            "phi": pa.array(phi, pa.float64()),
        }
    )


def wl_colors(
    graph,
    *,
    rounds: int = 3,
) -> "pa.Table":
    """Weisfeiler–Leman color refinement (1-WL, the graph-isomorphism
    test / GNN-expressiveness yardstick and the base of WL graph
    kernels — Shervashidze et al. 2011): every vertex starts with one
    color and each round re-colors as a hash of (own color, the
    MULTISET of in-neighbor colors).

    The multiset hash is a commutative uint64 sum of splitmix64(color)
    over in-edges — order-free, hence bit-identical in every block
    layout and replayable in SQL:
    ``color' = mix64(color·GOLD + Σ_in mix64(color_src))`` with
    wrap-around 64-bit arithmetic. One scatter per round over the
    edge blocks (the PageRank superstep shape); driver state is the
    O(V) color array. Returns (vertex, color int64-view, plus the
    per-round refinement class counts as table metadata columns
    round, num_classes aggregated separately by the caller if
    needed) — here simply (vertex, color)."""
    import pyarrow as pa
    import ray

    from ..data_ops.dedup import _GOLD, _mix64

    n = graph.num_vertices
    color = np.full(n, np.uint64(1))  # uniform initial color
    for _ in range(rounds):
        c_ref = ray.put(color)

        def scatter(batch: pa.Table):
            if batch.num_rows == 0 or "src" not in batch.schema.names:
                return None
            c = ray.get(c_ref)
            src = batch.column("src").combine_chunks().to_numpy(zero_copy_only=False)
            dst = batch.column("dst").combine_chunks().to_numpy(zero_copy_only=False)
            m = _mix64(c[src])
            u = np.unique(dst)
            sums = np.zeros(len(u), np.uint64)
            # wrap-around uint64 sums — commutative, layout-free
            np.add.at(sums, np.searchsorted(u, dst), m)
            return u.astype(np.int64), sums.view(np.int64)

        # exact uint64 merge (block_scatter's generic sum reduces via
        # float64 weights — lossy for 64-bit hash sums)
        task = ray.remote(scatter)
        acc = np.zeros(n, np.uint64)
        for o in ray.get([task.remote(r) for r in graph.edge_block_refs()]):
            if o is not None:
                acc[o[0]] += o[1].view(np.uint64)
        color = _mix64(color * _GOLD + acc)
    return pa.table(
        {
            "vertex": pa.array(graph.ids),
            "color": pa.array(color.view(np.int64)),
        }
    )
