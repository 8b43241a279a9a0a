"""Driver-facing query implementations.

Each function takes ``sf_dir`` and returns a pyarrow Table / pandas
DataFrame whose column names match the paired oracle SQL in
``llama_ray.pipelines.oracles`` exactly (the driver hashes values
after sorting columns by name). Floating-point outputs are rounded
(documented per query) so reduction-order differences between the Ray
shuffle and DuckDB cannot flip the hash.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data as rd
from ray.data.aggregate import Count, Max, Mean, Min, Sum

from ..algos.components import label_propagation, weakly_connected_components
from ..algos.pagerank import pagerank, pagerank_top_k
from ..algos.stats import degree_distribution as _degree_distribution
from ..algos.traversal import bfs as _bfs
from ..algos.triangles import triangle_count as _triangle_count
from ..common import batch_to_numpy
from ..graph import build_graph
from ..ingest.canonicalize import dedup_edges
from .tpch_graph import O_NATION, O_REGION, O_SUPP, build_tpch_graph, dedup_edge_list, raw_edges

BFS_ROOT = 1  # customer #1 — custkeys are dense from 1 in every sf


def _read(sf_dir: str, table: str, columns):
    """Coarse-block parquet read (~1 block/CPU): the auto-split layout
    (hundreds of tiny blocks at sf>=0.1) inflates every downstream map
    and shuffle ~5x."""
    from ..graph import target_num_blocks

    return rd.read_parquet(
        os.path.join(sf_dir, f"{table}.parquet"),
        columns=columns,
        override_num_blocks=target_num_blocks(None),
    )



# Graphs are immutable once built (materialized dense edge Dataset +
# numpy vertex index), so queries in one session share them instead of
# re-running the derive+dedup+densify pipeline per query.
_GRAPH_CACHE: dict = {}


def _cached_tpch_graph(sf_dir: str):
    g = _GRAPH_CACHE.get(("g", sf_dir))
    if g is None:
        g = build_tpch_graph(sf_dir)
        _GRAPH_CACHE[("g", sf_dir)] = g
    return g


def _cached_dedup_edges(sf_dir: str):
    ds = _GRAPH_CACHE.get(("dedup", sf_dir))
    if ds is None:
        ds = dedup_edge_list(sf_dir).materialize()
        _GRAPH_CACHE[("dedup", sf_dir)] = ds
    return ds


def _cached_canonical_graph(sf_dir: str):
    """Canonical undirected simple graph, derived in-place from the
    cached dense graph (one packed-key sort; no re-read, no second
    densification — see :func:`llama_ray.graph.canonical_undirected`)."""
    g = _GRAPH_CACHE.get(("canon", sf_dir))
    if g is None:
        from ..graph import canonical_undirected

        g = canonical_undirected(_cached_tpch_graph(sf_dir))
        _GRAPH_CACHE[("canon", sf_dir)] = g
    return g


# ------------------------------------------------------------- graph basics


def q_edge_list(sf_dir: str):
    return _cached_dedup_edges(sf_dir)


def q_edge_kind_counts(sf_dir: str):
    out = raw_edges(sf_dir).groupby("kind").aggregate(Count(alias_name="n"))
    return out


def q_out_degrees(sf_dir: str):
    """Out-degree per vertex with ≥1 out-edge. The cached dense graph
    already holds exact out-degrees from its build pass (bincount
    partials), so this is a zero-shuffle projection — no second
    groupby over the edge list."""
    g = _cached_tpch_graph(sf_dir)
    nz = g.out_degrees > 0
    return pa.table(
        {
            "src": pa.array(g.ids[nz], pa.int64()),
            "degree": pa.array(g.out_degrees[nz].astype(np.int64), pa.int64()),
        }
    )


def q_wl_colors(sf_dir: str, *, rounds: int = 3):
    """Weisfeiler–Leman color refinement (1-WL, 3 rounds) over the
    link graph — the graph-kernel / GNN-expressiveness feature map:
    commutative uint64 multiset hashing of in-neighbor colors, one
    scatter per round (PageRank superstep shape). Full DuckDB hash
    oracle (exact HUGEINT sums masked mod 2^64)."""
    from ..algos.stats import wl_colors

    return wl_colors(_cached_tpch_graph(sf_dir), rounds=rounds)


def q_degree_distribution(sf_dir: str):
    return _degree_distribution(_cached_dedup_edges(sf_dir), direction="out")


def q_edge_prop_stats(sf_dir: str):
    row = raw_edges(sf_dir).select_columns(["weight"]).aggregate(
        Min("weight", alias_name="min"),
        Max("weight", alias_name="max"),
        Sum("weight", alias_name="sum"),
        Count(alias_name="count"),
        Mean("weight", alias_name="mean"),
    )
    row["mean"] = round(row["mean"], 6)
    return pd.DataFrame([row])


# ---------------------------------------------------------------- analytics


def q_pagerank(sf_dir: str):
    g = _cached_tpch_graph(sf_dir)
    res = pagerank(g, max_iters=10)
    return pa.table(
        {"vertex": g.ids, "rank": np.round(res.state["rank"], 8)}
    )


def _snapshot_base_delta_graphs(sf_dir: str, seed: int = 20260818):
    """(g0, g1, cleanup): the link graph's edges split deterministically
    into a base batch (splitmix64(src·GOLD ⊕ dst ⊕ seed) % 8 ≠ 0) and a
    delta batch (the rest), ingested as levels 0 and 1 of a real
    `SnapshotStore` under /tmp; graphs built from the level-0 view and
    the full view. Caller must invoke ``cleanup()`` when done."""
    import shutil
    import tempfile

    from ..data_ops.dedup import _GOLD, _mix64
    from ..snapshots.store import SnapshotStore

    edges = _cached_dedup_edges(sf_dir)

    def split(batch: pa.Table, want_delta: bool):
        s = batch_to_numpy(batch, "src")
        d = batch_to_numpy(batch, "dst")
        h = _mix64(s.astype(np.uint64) * _GOLD ^ d.astype(np.uint64) ^ np.uint64(seed))
        keep = (h % np.uint64(8) == 0) == want_delta
        return {"src": s[keep], "dst": d[keep]}

    root = tempfile.mkdtemp(prefix="snap_delta_", dir="/tmp")
    try:
        store = SnapshotStore(root)
        store.ingest_batch(
            edges.map_batches(lambda b: split(b, False), batch_format="pyarrow")
        )
        store.ingest_batch(
            edges.map_batches(lambda b: split(b, True), batch_format="pyarrow")
        )
        g0 = build_graph(store.edges(at_level=0))
        g1 = build_graph(store.edges())
    except BaseException:
        shutil.rmtree(root, ignore_errors=True)
        raise
    return g0, g1, lambda: shutil.rmtree(root, ignore_errors=True)


def q_streaming_window_pagerank(
    sf_dir: str, *, batches: int = 6, window: int = 3, iters: int = 5,
    seed: int = 20260819,
):
    """The round-5 incremental streaming loop as a graded query: the
    link graph's edges split deterministically into ``batches``
    micro-batches (splitmix64(src·GOLD ⊕ dst ⊕ seed) % batches),
    ingested one level at a time into a real `SnapshotStore` with a
    sliding window of ``window`` levels;
    :class:`~llama_ray.snapshots.incremental.IncrementalPageRankWindow`
    advances after every batch — O(Δ) maintenance, evictions included
    — and the FINAL window's 5-iteration PageRank is returned. The
    oracle replays the final window (hash classes ≥ batches−window)
    with the unrolled SQL chain; per-batch equality with a cold
    rebuild is pinned in tests/test_streaming_analytics.py."""
    import shutil
    import tempfile

    from ..data_ops.dedup import _GOLD, _mix64
    from ..snapshots.incremental import IncrementalPageRankWindow
    from ..snapshots.store import SnapshotStore

    edges = _cached_dedup_edges(sf_dir)

    def split(batch: pa.Table, k: int):
        s = batch_to_numpy(batch, "src")
        d = batch_to_numpy(batch, "dst")
        h = _mix64(s.astype(np.uint64) * _GOLD ^ d.astype(np.uint64) ^ np.uint64(seed))
        keep = (h % np.uint64(batches)).astype(np.int64) == k
        return {"src": s[keep], "dst": d[keep]}

    root = tempfile.mkdtemp(prefix="stream_win_", dir="/tmp")
    try:
        store = SnapshotStore(root)
        inc = IncrementalPageRankWindow()
        out = None
        for k in range(batches):
            lvl = store.ingest_batch(
                edges.map_batches(lambda b, kk=k: split(b, kk), batch_format="pyarrow")
            )
            store.set_window(window)
            out = inc.advance(
                store, lvl, window=window, max_iters=iters, warm=False
            )
        ids, res = out
        return pa.table(
            {"vertex": ids, "rank": np.round(res.state["rank"], 8)}
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


def q_snapshot_pagerank_delta(sf_dir: str):
    """Multi-version warm-start PageRank — the analytics pattern the
    reference's immutable snapshot levels exist for (`ll_mlcsr_graph`
    versioned CSR; reference streaming loop `benchmark.cc:1769-1893`):
    PageRank runs 10 iterations on the level-0 view, then the level-1
    view resumes for 5 more iterations warm-started from those ranks
    (new vertices enter at uniform 1/n) — the delta recompute costs 5
    supersteps instead of 10+ from cold. Oracle replays both unrolled
    chains in SQL."""
    g0, g1, cleanup = _snapshot_base_delta_graphs(sf_dir)
    try:
        pr0 = pagerank(g0, max_iters=10)
        init = np.full(g1.num_vertices, 1.0 / g1.num_vertices, np.float64)
        pos = np.searchsorted(g1.ids, g0.ids)  # levels only add vertices
        init[pos] = pr0.state["rank"]
        pr1 = pagerank(g1, max_iters=5, init_rank=init)
        return pa.table(
            {"vertex": g1.ids, "rank": np.round(pr1.state["rank"], 8)}
        )
    finally:
        cleanup()


def q_snapshot_wcc_delta(sf_dir: str):
    """Incremental connected components across snapshot levels: WCC
    converges on the level-0 view, the level-1 view warm-starts from
    those labels (exact — levels only ADD edges, so old labels remain
    valid component members and the min-label fixpoint lands on the
    same minima, touching mostly merged regions). Oracle runs both
    unrolled min-label chains."""
    g0, g1, cleanup = _snapshot_base_delta_graphs(sf_dir)
    try:
        w0 = weakly_connected_components(g0)
        init = g1.ids.copy()
        pos = np.searchsorted(g1.ids, g0.ids)
        init[pos] = w0.state["label"]
        w1 = weakly_connected_components(g1, init_labels=init)
        return pa.table({"vertex": g1.ids, "component": w1.state["label"]})
    finally:
        cleanup()


def q_snapshot_lp_delta(sf_dir: str, *, base_rounds: int = 4, delta_rounds: int = 2):
    """Incremental label propagation across snapshot levels —
    completes the multi-version quartet (PageRank, WCC, TC, LP): 4 LP
    rounds converge communities on the level-0 canonical view, then
    the full view runs only 2 warm-started rounds from those labels
    (new vertices enter at their own id).  LP is a fixed-round
    deterministic pipeline, so the composition is exactly replayable
    by two chained SQL mode-unrolls."""
    from ..graph import canonical_undirected

    g0, g1, cleanup = _snapshot_base_delta_graphs(sf_dir)
    try:
        c0 = canonical_undirected(g0)
        c1 = canonical_undirected(g1)
        r0 = label_propagation(c0, iterations=base_rounds, engine="bsp")
        init = np.asarray(c1.ids).copy()
        pos = np.searchsorted(c1.ids, c0.ids)
        init[pos] = r0.state["label"]
        r1 = label_propagation(
            c1, iterations=delta_rounds, engine="bsp", init_labels=init
        )
        return pa.table({"vertex": c1.ids, "label": r1.state["label"]})
    finally:
        cleanup()


def q_snapshot_triangle_delta(sf_dir: str):
    """Incremental triangle maintenance across snapshot levels: exact
    TC on the level-0 view, then only the delta edges' common-neighbor
    intersections (edge-iterator bound, Σ min-deg work over the delta
    — :func:`llama_ray.algos.triangles.triangle_count_delta`) close
    the gap to the full view; the level-1 recount never runs. Delta
    pairs found by probing the level-1 canonical edges against the
    sorted level-0 key blocks."""
    from ..algos.triangles import _probe_mask, triangle_count_delta
    from ..common import per_block_results
    from ..graph import canonical_undirected

    g0, g1, cleanup = _snapshot_base_delta_graphs(sf_dir)
    try:
        tc0 = _triangle_count(g0)
        g1c = canonical_undirected(g1)
        n1 = g1c.num_vertices
        tr = np.searchsorted(g1c.ids, g0.ids)  # g0 dense → g1c dense
        tr_ref = ray.put(tr)

        def base_keys(batch: pa.Table):
            s = batch_to_numpy(batch, "src")
            d = batch_to_numpy(batch, "dst")
            t = ray.get(tr_ref)
            s, d = t[s], t[d]
            keep = s != d
            lo = np.minimum(s[keep], d[keep]).astype(np.int64)
            hi = np.maximum(s[keep], d[keep]).astype(np.int64)
            return {"key": np.unique(lo * n1 + hi)}

        bsrt = (
            g0.edges.map_batches(base_keys, batch_format="pyarrow", batch_size=None)
            .sort("key")
            .materialize()
        )
        refs = bsrt.to_arrow_refs()

        def bounds(t: pa.Table):
            if t.num_rows == 0:
                return None
            k = batch_to_numpy(t, "key")
            return (int(k[0]), int(k[-1]))

        bs = per_block_results(bsrt, bounds)
        keep = [i for i, b in enumerate(bs) if b is not None]
        refs = [refs[i] for i in keep]
        bounds_hi = np.array([bs[i][1] for i in keep], np.int64)

        def nonmember(batch: pa.Table):
            s = batch_to_numpy(batch, "src").astype(np.int64)
            d = batch_to_numpy(batch, "dst").astype(np.int64)
            k = s * n1 + d  # canonical graph: src < dst already
            hit = _probe_mask(k, refs, bounds_hi, {})
            return {"k": k[~hit]}

        dparts = []
        for t in g1c.edges.map_batches(
            nonmember, batch_format="pyarrow", batch_size=None
        ).iter_batches(batch_format="pyarrow"):
            dparts.append(batch_to_numpy(t, "k"))
        dk = np.unique(np.concatenate(dparts)) if dparts else np.empty(0, np.int64)
        tc_new = triangle_count_delta(g1c, dk // n1, dk % n1)
        return pa.table(
            {
                "tc_base": pa.array([tc0], pa.int64()),
                "tc_new": pa.array([tc_new], pa.int64()),
                "tc_total": pa.array([tc0 + tc_new], pa.int64()),
            }
        )
    finally:
        cleanup()


def q_pagerank_top10(sf_dir: str):
    g = _cached_tpch_graph(sf_dir)
    res = pagerank(g, max_iters=10)
    top = pagerank_top_k(g, res, 10)
    return pa.table(
        {
            "vertex": pa.array([v for v, _ in top], pa.int64()),
            "rank": pa.array([round(r, 8) for _, r in top], pa.float64()),
        }
    )


def q_pagerank_weighted(sf_dir: str):
    """Edge-weighted PageRank: contributions are w·pr(src)/strength(src)
    over the deduped edge list with per-pair summed weights (duplicate
    raw edges fold into one weighted edge — the reference's streaming
    "weights instead of duplicates" semantic, ``ll_writable_graph.h``).
    Rounded to 8 decimals (reduction-order margin, like ``pagerank``)."""
    g = _GRAPH_CACHE.get(("gw_sum", sf_dir))
    if g is None:
        g = build_graph(
            dedup_edges(
                raw_edges(sf_dir).select_columns(["src", "dst", "weight"]),
                weights="sum",
            )
        )
        _GRAPH_CACHE[("gw_sum", sf_dir)] = g
    res = pagerank(g, max_iters=10, weight_col="weight")
    return pa.table(
        {"vertex": g.ids, "rank": np.round(res.state["rank"], 8)}
    )


def q_katz(sf_dir: str):
    """Katz centrality, 8 truncated-series iterations (α=1/16, β=1) on
    the BSP gather pool — the unnormalized-sum sibling of PageRank.
    No rounding: the dyadic alpha makes every score an exact dyadic
    rational (see ``algos/katz.py``), bit-identical to the DuckDB
    chain in any reduction order."""
    from ..algos.katz import katz_centrality

    g = _cached_tpch_graph(sf_dir)
    res = katz_centrality(g, alpha=0.0625, beta=1.0, iterations=8, engine="bsp")
    return pa.table({"vertex": g.ids, "katz": res.state["katz"]})


def q_wcc(sf_dir: str):
    g = _cached_tpch_graph(sf_dir)
    res = weakly_connected_components(g)
    return pa.table({"vertex": g.ids, "component": res.state["label"]})


def q_label_propagation(sf_dir: str):
    g = _cached_canonical_graph(sf_dir)
    res = label_propagation(g, iterations=4, engine="bsp")
    return pa.table({"vertex": g.ids, "label": res.state["label"]})


def q_louvain(sf_dir: str):
    """Louvain-style community detection (parity-gated synchronous
    local moving, 6 rounds, integer modularity-gain scores — see
    :mod:`llama_ray.algos.louvain`) over the canonical undirected
    simple graph. Community = founding member's original id."""
    from ..algos.louvain import louvain_communities

    g = _cached_canonical_graph(sf_dir)
    res = louvain_communities(g, rounds=6, engine="bsp")
    return pa.table({"vertex": g.ids, "community": res.state["label"]})


def q_louvain_weighted(sf_dir: str):
    """Weighted Louvain: per-pair edge weight = duplicate multiplicity
    over both orientations of the deduped edge list (the streaming
    weights-instead-of-duplicates semantic). Weighted sums stay exact
    int64 — bit-identical to the DuckDB chain."""
    from ..algos.louvain import louvain_communities
    from ..ingest.canonicalize import undirected_ordered

    g = _GRAPH_CACHE.get(("canon_w", sf_dir))
    if g is None:
        g = build_graph(
            dedup_edges(
                undirected_ordered(
                    _cached_dedup_edges(sf_dir), drop_self_loops=True
                ),
                weights="count",
            )
        )
        _GRAPH_CACHE[("canon_w", sf_dir)] = g
    res = louvain_communities(g, rounds=6, engine="bsp", weight_col="weight")
    return pa.table({"vertex": g.ids, "community": res.state["label"]})


def q_louvain_multilevel(sf_dir: str):
    """Two-level Louvain: phase-1 local moving, contraction
    (inter-community weights + self-loop mass), weighted phase 2 with
    the original 2m — see :func:`llama_ray.algos.louvain.
    louvain_multilevel`."""
    from ..algos.louvain import louvain_multilevel

    g = _cached_canonical_graph(sf_dir)
    res = louvain_multilevel(g, rounds1=4, rounds2=4, engine="bsp")
    return pa.table({"vertex": g.ids, "community": res.state["label"]})


def q_louvain_modularity(sf_dir: str):
    """Modularity Q of the 6-round Louvain partition — the quality
    composition query for community detection (same shape as
    ``lp_modularity``)."""
    from ..algos.louvain import louvain_communities
    from ..algos.stats import modularity

    g = _cached_canonical_graph(sf_dir)
    res = louvain_communities(g, rounds=6, engine="bsp")
    t = modularity(g, res.state["dense_label"])
    return t.set_column(
        t.schema.get_field_index("modularity"),
        "modularity",
        pc.round(t.column("modularity"), 6),
    )


def q_dag_layers(sf_dir: str):
    """Longest-path DAG levels over the canonical acyclic orientation
    (src < dst) — the maximally-parallel topological schedule; see
    :mod:`llama_ray.algos.dag`."""
    from ..algos.dag import dag_layers

    g = _cached_canonical_graph(sf_dir)
    res = dag_layers(g)
    return pa.table({"vertex": g.ids, "layer": res.state["layer"]})


def q_core_numbers(sf_dir: str):
    """k-core decomposition over the canonical undirected simple
    graph (H-index iteration to fixpoint — see
    :mod:`llama_ray.algos.kcore`)."""
    from ..algos.kcore import core_numbers

    g = _cached_canonical_graph(sf_dir)
    res = core_numbers(g)
    return pa.table({"vertex": g.ids, "core": res.state["core"]})


def q_edge_percolation(sf_dir: str, *, pcts=(30, 60, 90), seed: int = 20260824):
    """Bond-percolation sweep: retain each edge with deterministic
    probability p (splitmix64 coin), report how connectivity emerges —
    per retention level the surviving edge count, WCC component count
    (isolated original vertices included as singletons), and largest
    component.  Three hash-filtered WCC runs over the engine; the
    resilience-curve companion to `hub_attack`."""
    from ..algos.components import weakly_connected_components
    from ..data_ops.dedup import _GOLD, _mix64
    from ..graph import build_graph

    g_full = _cached_tpch_graph(sf_dir)
    edges = _cached_dedup_edges(sf_dir)
    rows = {"pct": [], "n_edges": [], "n_components": [], "largest_component": []}
    for pct in pcts:

        def filt(b: pa.Table, _p=pct) -> pa.Table:
            s = batch_to_numpy(b, "src").astype(np.uint64)
            d = batch_to_numpy(b, "dst").astype(np.uint64)
            h = _mix64(s * _GOLD ^ d ^ np.uint64(seed))
            keep = pa.array((h % np.uint64(100)) < _p)
            return pa.table(
                {
                    "src": b.column("src").filter(keep),
                    "dst": b.column("dst").filter(keep),
                }
            )

        fe = edges.map_batches(filt, batch_format="pyarrow")
        fg = build_graph(fe)
        if fg.num_vertices:
            res = weakly_connected_components(fg)
            if res.iterations > 40:
                raise RuntimeError(
                    "edge_percolation: WCC needed more supersteps than the SQL unroll"
                )
            labels = res.state["label"]
            _u, sizes = np.unique(labels, return_counts=True)
            n_comp_edges = len(_u)
            largest = int(sizes.max())
            n_edges_kept = fg.num_edges
        else:
            n_comp_edges, largest, n_edges_kept = 0, 0, 0
        iso = g_full.num_vertices - fg.num_vertices
        rows["pct"].append(int(pct))
        rows["n_edges"].append(int(n_edges_kept))
        rows["n_components"].append(int(n_comp_edges + iso))
        rows["largest_component"].append(max(largest, 1 if iso else largest))
    return pa.table(
        {
            "pct": pa.array(rows["pct"], pa.int64()),
            "n_edges": pa.array(rows["n_edges"], pa.int64()),
            "n_components": pa.array(rows["n_components"], pa.int64()),
            "largest_component": pa.array(rows["largest_component"], pa.int64()),
        }
    )


def q_influence_cascade(sf_dir: str, *, num_seeds: int = 4, pct: int = 50, seed: int = 20260823):
    """Deterministic independent-cascade spread (Kempe-Kleinberg-
    Tardos influence model with a hash coin): every edge transmits iff
    splitmix64(src·GOLD ⊕ dst ⊕ seed) mod 100 < ``pct``; from each of
    the ``num_seeds`` smallest-id vertices, the cascade is directed
    reachability over transmitting edges.  Per seed: reached count and
    max depth.  Edge survival is a pure hash (no broadcast); each
    cascade is one frontier BFS over the filtered graph's shared
    pool."""
    from ..data_ops.dedup import _GOLD, _mix64
    from ..engine.bsp import shared_pool
    from ..graph import build_graph

    g_full = _cached_tpch_graph(sf_dir)
    edges = _cached_dedup_edges(sf_dir)

    def filt(b: pa.Table) -> pa.Table:
        s = batch_to_numpy(b, "src").astype(np.uint64)
        d = batch_to_numpy(b, "dst").astype(np.uint64)
        h = _mix64(s * _GOLD ^ d ^ np.uint64(seed))
        keep = pa.array((h % np.uint64(100)) < pct)
        return pa.table(
            {"src": b.column("src").filter(keep), "dst": b.column("dst").filter(keep)}
        )

    fg = build_graph(edges.map_batches(filt, batch_format="pyarrow"))
    seeds = np.sort(np.asarray(g_full.ids))[:num_seeds]
    rows = {"seed": [], "n_reached": [], "max_depth": []}
    pool = shared_pool(fg) if fg.num_vertices else None
    n = fg.num_vertices
    ones = np.ones(n, np.int64)
    fids = np.asarray(fg.ids)
    for sid in seeds:
        pos = int(np.searchsorted(fids, sid)) if n else 0
        if n == 0 or pos >= n or fids[pos] != sid:
            rows["seed"].append(int(sid))
            rows["n_reached"].append(1)
            rows["max_depth"].append(0)
            continue
        dist = np.full(n, -1, np.int64)
        dist[pos] = 0
        frontier = np.zeros(n, bool)
        frontier[pos] = True
        lvl = 0
        while frontier.any():
            lvl += 1
            reach = pool.gather_max_masked(ones, frontier)
            new = (reach == 1) & (dist < 0)
            if not new.any():
                lvl -= 1
                break
            dist[new] = lvl
            frontier = new
        rows["seed"].append(int(sid))
        rows["n_reached"].append(int((dist >= 0).sum()))
        rows["max_depth"].append(int(dist.max()))
    return pa.table(
        {
            "seed": pa.array(rows["seed"], pa.int64()),
            "n_reached": pa.array(rows["n_reached"], pa.int64()),
            "max_depth": pa.array(rows["max_depth"], pa.int64()),
        }
    )


def q_hub_attack(sf_dir: str, *, k: int = 20):
    """Attack-tolerance analysis (Albert, Jeong & Barabási 2000):
    remove the k highest in-degree hubs and report how the graph
    fragments — surviving vertices, weakly connected component count
    (isolated survivors are their own components), and the largest
    surviving component.  Composition of engine primitives: exact
    top-k hubs (partial merge), a 20-id broadcast filter over the
    deduped edges, the WCC engine on the survivor graph."""
    from ..algos.components import weakly_connected_components
    from ..common import distributed_topk
    from ..graph import build_graph

    g_full = _cached_tpch_graph(sf_dir)
    edges = _cached_dedup_edges(sf_dir)

    def indeg_part(b: pa.Table) -> dict:
        d = batch_to_numpy(b, "dst")
        u, cnt = np.unique(d, return_counts=True)
        return {"dst": u, "c": cnt.astype(np.int64)}

    indeg = (
        edges.map_batches(indeg_part, batch_format="pyarrow")
        .groupby("dst")
        .aggregate(Sum("c", alias_name="c"))
    )
    hubs_tbl = pa.concat_tables(
        [
            b
            for b in distributed_topk(
                indeg, [("c", "descending"), ("dst", "ascending")], k
            ).iter_batches(batch_format="pyarrow")
        ]
    )
    hubs = np.sort(hubs_tbl.column("dst").to_numpy(zero_copy_only=False))

    def filt(b: pa.Table) -> pa.Table:
        s = batch_to_numpy(b, "src")
        d = batch_to_numpy(b, "dst")
        keep = pa.array(~(np.isin(s, hubs) | np.isin(d, hubs)))
        return pa.table(
            {"src": b.column("src").filter(keep), "dst": b.column("dst").filter(keep)}
        )

    fg = build_graph(edges.map_batches(filt, batch_format="pyarrow"))
    res = weakly_connected_components(fg)
    if res.iterations > 32:
        raise RuntimeError(
            "hub_attack: WCC needed more supersteps than the SQL unroll"
        )
    labels = res.state["label"]
    _u, sizes = np.unique(labels, return_counts=True)
    n_survivors = g_full.num_vertices - len(hubs)
    n_isolated = n_survivors - fg.num_vertices
    n_components = len(_u) + n_isolated
    largest = int(sizes.max()) if len(sizes) else (1 if n_isolated else 0)
    if n_isolated > 0:
        largest = max(largest, 1)
    return pa.table(
        {
            "n_survivors": pa.array([n_survivors], pa.int64()),
            "n_components": pa.array([int(n_components)], pa.int64()),
            "largest_component": pa.array([largest], pa.int64()),
        }
    )


def q_induced_subgraph(sf_dir: str, *, pct: int = 10, seed: int = 20260821):
    """Induced-subgraph extraction over a deterministic 1-in-``pct``
    vertex sample: keep edges whose BOTH endpoints hash into the
    sample (splitmix64(id·GOLD ⊕ seed) mod pct == 0).  Membership is a
    pure hash function, so the filter needs NO broadcast and no
    shuffle — one vectorized map over the deduped edge blocks (the
    subgraph-sampling primitive for debugging / algorithm smoke runs
    at scale)."""
    from ..data_ops.dedup import _GOLD, _mix64

    edges = _cached_dedup_edges(sf_dir)

    def stage(b: pa.Table) -> pa.Table:
        s = batch_to_numpy(b, "src").astype(np.uint64)
        d = batch_to_numpy(b, "dst").astype(np.uint64)
        ks = _mix64(s * _GOLD ^ np.uint64(seed)) % np.uint64(pct) == 0
        kd = _mix64(d * _GOLD ^ np.uint64(seed)) % np.uint64(pct) == 0
        keep = pa.array(ks & kd)
        return pa.table(
            {
                "src": b.column("src").filter(keep).cast(pa.int64()),
                "dst": b.column("dst").filter(keep).cast(pa.int64()),
            }
        )

    return edges.map_batches(stage, batch_format="pyarrow")


def q_doc_sample(sf_dir: str, *, k: int = 500, seed: int = 20260822):
    """Exact global uniform k-sample of documents: rank by
    splitmix64(doc_id·GOLD ⊕ seed) and keep the k smallest — a
    reproducible, layout-independent simple random sample (the
    partial top-k merge; no full sort, no shuffle)."""
    from ..common import distributed_topk
    from ..data_ops.dedup import _GOLD, _mix64

    docs = _read(sf_dir, "documents", ["doc_id", "n_chars"])

    def stage(b: pa.Table) -> pa.Table:
        ids = batch_to_numpy(b, "doc_id").astype(np.uint64)
        h = _mix64(ids * _GOLD ^ np.uint64(seed))
        flip = np.uint64(1 << 63)
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "n_chars": b.column("n_chars"),
                "h": (h ^ flip).view(np.int64),
            }
        )

    top = distributed_topk(
        docs.map_batches(stage, batch_format="pyarrow"),
        [("h", "ascending"), ("doc_id", "ascending")],
        k,
    )
    return top.map_batches(
        lambda b: b.drop_columns(["h"]), batch_format="pyarrow", batch_size=None
    )


def _config_model_edges(sf_dir: str, seed: int) -> "rd.Dataset":
    """Rewired multigraph edges (src, dst, weight=multiplicity) of the
    configuration model — shared by q_config_model and the
    null-model triangle significance query."""
    from ..data_ops.dedup import _GOLD, _mix64
    from ..data_ops.relational import global_ranks, sort_merge_join

    edges = _cached_dedup_edges(sf_dir)

    def hashes(b: pa.Table) -> pa.Table:
        s = batch_to_numpy(b, "src").astype(np.uint64)
        d = batch_to_numpy(b, "dst").astype(np.uint64)
        ho = _mix64(s * _GOLD ^ d ^ np.uint64(seed))
        hi = _mix64(s * _GOLD ^ d ^ np.uint64(seed + 1))
        # shifted-int64 view keeps the unsigned order under Arrow sort
        flip = np.uint64(1 << 63)
        return pa.table(
            {
                "src": b.column("src"),
                "dst": b.column("dst"),
                "ho": (ho ^ flip).view(np.int64),
                "hi": (hi ^ flip).view(np.int64),
            }
        )

    h = edges.map_batches(hashes, batch_format="pyarrow").materialize()
    outs = global_ranks(
        h.select_columns(["ho", "src", "dst"]), order_cols=["ho", "src", "dst"]
    ).select_columns(["rn", "src"])
    ins = (
        global_ranks(
            h.select_columns(["hi", "src", "dst"]), order_cols=["hi", "src", "dst"]
        )
        .select_columns(["rn", "dst"])
        .map_batches(
            lambda b: pa.table({"rn": b.column("rn"), "new_dst": b.column("dst")}),
            batch_format="pyarrow",
        )
    )
    joined = sort_merge_join(outs, ins, left_on="rn", how="inner")

    def as_edges(b: pa.Table) -> pa.Table:
        return pa.table({"src": b.column("src"), "dst": b.column("new_dst")})

    rewired = dedup_edges(
        joined.map_batches(as_edges, batch_format="pyarrow"), weights="count"
    )

    def fin(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "src": b.column("src").cast(pa.int64()),
                "dst": b.column("dst").cast(pa.int64()),
                "m": b.column("weight").cast(pa.int64()),
            }
        )

    return rewired.map_batches(fin, batch_format="pyarrow")


def q_config_model(sf_dir: str, *, seed: int = 20260820):
    """Degree-preserving rewiring (directed configuration model, the
    null model for motif significance): every edge contributes one
    out-stub (its src) and one in-stub (its dst); stubs are matched by
    deterministic splitmix64 rank — new edge i joins the i-th out-stub
    to the i-th in-stub.  Out/in degree sequences are preserved
    exactly; collisions stay as multiplicities (the honest multigraph
    semantics).  Two global-rank passes + one rank equi-join + the
    sort/run-dedup count — all engine primitives, no driver rows."""
    return _config_model_edges(sf_dir, seed)


def q_null_model_triangles(sf_dir: str, *, seed: int = 20260820):
    """Motif significance — the configuration model's actual use:
    exact triangle count of the real graph vs its degree-preserving
    rewiring (simple canonical view of the multigraph), and their
    ratio.  tc_real ≫ tc_null is the classic clustering signature
    that degree sequence alone cannot explain."""
    from ..algos.triangles import triangle_count
    from ..graph import build_graph

    g = _cached_tpch_graph(sf_dir)
    tc_real = int(_triangle_count(g))
    null_edges = _config_model_edges(sf_dir, seed).select_columns(["src", "dst"])
    gn = build_graph(dedup_edges(null_edges))
    tc_null = int(triangle_count(gn))
    ratio = float(np.round(tc_real / max(tc_null, 1), 6))
    return pa.table(
        {
            "tc_real": pa.array([tc_real], pa.int64()),
            "tc_null": pa.array([tc_null], pa.int64()),
            "ratio": pa.array([ratio], pa.float64()),
        }
    )


def q_onion(sf_dir: str):
    """Onion decomposition over the canonical undirected simple graph:
    per vertex the 1-based peeling-wave index (layer) and the shell
    value at peel time (core — equal to k-core coreness by
    construction; see :func:`llama_ray.algos.kcore.onion_layers`)."""
    from ..algos.kcore import onion_layers

    g = _cached_canonical_graph(sf_dir)
    layer, core = onion_layers(g)
    return pa.table(
        {"vertex": g.ids, "layer": pa.array(layer), "core": pa.array(core)}
    )


def q_scc(sf_dir: str):
    """True strongly connected components (trim + forward-backward
    coloring; no SQL oracle — verified against an iterative Tarjan in
    tests/test_algos.py). Component label = min original vertex id."""
    from ..algos.components import strongly_connected_components

    g = _cached_tpch_graph(sf_dir)
    res = strongly_connected_components(g)
    return pa.table({"vertex": g.ids, "component": res.state["label"]})


def q_graph_pipeline(sf_dir: str):
    """Flagship end-to-end composition in one query: derive + dedup +
    densify the link graph, then V/E counts, WCC component count,
    exact triangle count, and the PageRank argmax vertex — the four
    north-star analytics sharing one cached graph build."""
    from ..algos.components import weakly_connected_components
    from ..algos.pagerank import pagerank
    from ..algos.triangles import triangle_count

    g = _cached_tpch_graph(sf_dir)
    wcc = weakly_connected_components(g)
    n_comp = int(len(np.unique(wcc.state["label"])))
    tc = int(triangle_count(g))
    pr = pagerank(g, max_iters=10)
    r = np.round(pr.state["rank"], 8)
    ids = np.asarray(g.ids)
    top = int(ids[np.lexsort((ids, -r))[0]])
    return pa.table(
        {
            "n_vertices": pa.array([g.num_vertices], pa.int64()),
            "n_edges": pa.array([g.num_edges], pa.int64()),
            "n_components": pa.array([n_comp], pa.int64()),
            "triangles": pa.array([tc], pa.int64()),
            "top_vertex": pa.array([top], pa.int64()),
        }
    )


def q_scc_condensation(sf_dir: str):
    """Condensation DAG: the distinct inter-component edges of the SCC
    partition (component = min original id, reference semantics).  The
    O(V) label array broadcasts once (``ray.put``); every edge block
    maps endpoints through it and drops intra-component edges; the
    distinct pairs come from the engine's sort + run-dedup (no hash
    exchange).  The canonical "collapse the cycles, keep the DAG"
    pre-pass for reachability/layering at scale."""
    from ..algos.components import strongly_connected_components

    g = _cached_tpch_graph(sf_dir)
    res = strongly_connected_components(g)
    lab_ref = ray.put(res.state["label"])

    def to_comp(b: pa.Table):
        lab = ray.get(lab_ref)
        src = batch_to_numpy(b, "src")
        dst = batch_to_numpy(b, "dst")
        ls, ld = lab[src], lab[dst]
        keep = ls != ld
        return {
            "src": ls[keep].astype(np.int64),
            "dst": ld[keep].astype(np.int64),
        }

    dd = dedup_edges(g.edges.map_batches(to_comp, batch_format="pyarrow"))

    def fin(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "comp_src": b.column("src").cast(pa.int64()),
                "comp_dst": b.column("dst").cast(pa.int64()),
            }
        )

    return dd.map_batches(fin, batch_format="pyarrow")


def q_triangle_count(sf_dir: str):
    g = _cached_tpch_graph(sf_dir)
    t = _triangle_count(g)
    return pa.table({"triangles": pa.array([t], pa.int64())})


def q_bfs(sf_dir: str):
    g = _cached_tpch_graph(sf_dir)
    res = _bfs(g, BFS_ROOT)
    dist = res.state["dist"]
    reached = np.isfinite(dist)
    return pa.table(
        {"vertex": g.ids[reached], "dist": dist[reached].astype(np.int64)}
    )


def q_path_counts(sf_dir: str):
    """Shortest-path counting from the BFS root (the Brandes σ forward
    pass as a standalone query): per reached vertex its BFS distance
    and the number of distinct shortest paths from the root — one
    frontier-masked ``gather_sum`` per level on the shared forward
    pool (see ``algos.traversal.bfs_path_counts``)."""
    from ..algos.traversal import bfs_path_counts

    g = _cached_tpch_graph(sf_dir)
    dist, sigma = bfs_path_counts(g, BFS_ROOT)
    m = dist >= 0
    return pa.table(
        {
            "vertex": pa.array(np.asarray(g.ids)[m], pa.int64()),
            "dist": pa.array(dist[m]),
            "n_paths": pa.array(sigma[m]),
        }
    )


def q_sssp_weighted(sf_dir: str):
    """Weighted SSSP over summed duplicate weights (DuckDB recursive
    oracle + numpy Bellman-Ford in tests)."""
    from ..algos.traversal import sssp

    weighted = dedup_edges(raw_edges(sf_dir), weights="sum")
    g = build_graph(weighted)
    res = sssp(g, BFS_ROOT, weighted=True)
    dist = res.state["dist"]
    reached = np.isfinite(dist)
    return pa.table({"vertex": g.ids[reached], "dist": np.round(dist[reached], 6)})


def q_bipartite(sf_dir: str):
    """Per-component bipartiteness over the canonical undirected
    simple graph: BFS-parity 2-coloring from each component's min-id
    root (multi-root min-plus BFS on the undirected pool) + per-block
    conflict-edge counts — see :mod:`llama_ray.algos.bipartite`."""
    from ..algos.bipartite import bipartite_check

    return bipartite_check(_cached_canonical_graph(sf_dir))


def q_rich_club(sf_dir: str):
    """Rich-club coefficient per distinct degree threshold (exact
    integer tails + one float division — see
    :func:`llama_ray.algos.stats.rich_club`)."""
    from ..algos.stats import rich_club

    return rich_club(_cached_canonical_graph(sf_dir))


def q_squares(sf_dir: str):
    """Global 4-cycle count + closed-pair count over the canonical
    simple graph (wedge pair-key aggregation —
    :mod:`llama_ray.algos.squares`)."""
    from ..algos.squares import square_count

    return square_count(_cached_canonical_graph(sf_dir))


def q_triad_census(sf_dir: str):
    """Directed triad census — counts of the 13 connected
    Holland–Leinhardt classes over the link graph
    (:mod:`llama_ray.algos.triads`)."""
    from ..algos.triads import triad_census

    return triad_census(_cached_tpch_graph(sf_dir))


def q_four_cliques(sf_dir: str):
    """Exact K4 count over the canonical simple graph (oriented
    triangle bases + pair matching — :mod:`llama_ray.algos.cliques`)."""
    from ..algos.cliques import four_clique_count

    k4 = four_clique_count(_cached_tpch_graph(sf_dir))
    return pa.table({"k4": pa.array([k4], pa.int64())})


def q_copurchase_k4(sf_dir: str):
    """K4 census of the hash-sampled part co-purchase graph: parts
    sharing an order are linked; edges survive iff
    splitmix64(a·GOLD ⊕ b ⊕ seed) % 4 == 0 (DOULION-style
    deterministic edge sparsification, Tsourakakis et al. KDD'09 —
    E[K4_full] = 4^6 · K4_sampled; the raw sampled count is returned
    so the hash gate stays integer-exact). Pair expansion is one
    range sort by order with per-run pair generation in-block (orders
    are tiny runs; block-edge runs stitch in a bounded driver pass);
    the sampled graph feeds :func:`llama_ray.algos.cliques.four_clique_count`."""
    from ..algos.cliques import four_clique_count
    from ..common import check_boundary_size, per_block_results
    from ..data_ops.dedup import _GOLD, _mix64

    seed = 20260818
    lp = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    srt = dedup_edges(
        lp.map_batches(
            lambda b: {
                "src": batch_to_numpy(b, "l_orderkey"),
                "dst": batch_to_numpy(b, "l_partkey"),
            },
            batch_format="pyarrow",
        )
    ).sort("src").materialize()

    def _pairs(o: np.ndarray, p: np.ndarray):
        """All within-order part pairs (a < b), hash-sampled."""
        from ..algos.triangles import _pairs_multirun

        li, ri = _pairs_multirun(o)
        if not len(li):
            return np.empty(0, np.int64), np.empty(0, np.int64)
        a = np.minimum(p[li], p[ri])
        b = np.maximum(p[li], p[ri])
        h = _mix64(a.astype(np.uint64) * _GOLD ^ b.astype(np.uint64) ^ np.uint64(seed))
        keep = (h % np.uint64(4)) == 0
        return a[keep], b[keep]

    def expand_block(tbl: pa.Table):
        """kind 0 rows = sampled pairs (v1=a, v2=b); kind 1 rows =
        block-edge run rows (v1=order, v2=part) for the driver stitch."""
        empty = {"kind": np.empty(0, np.int64), "v1": np.empty(0, np.int64),
                 "v2": np.empty(0, np.int64)}
        if tbl.num_rows == 0:
            return empty
        o = batch_to_numpy(tbl, "src")
        p = batch_to_numpy(tbl, "dst")
        if o[0] == o[-1]:
            s0 = s1 = len(o)  # single order spans the block: all boundary
        else:
            s0 = int(np.searchsorted(o, o[0], side="right"))
            s1 = int(np.searchsorted(o, o[-1], side="left"))
        a, b = _pairs(o[s0:s1], p[s0:s1])
        bnd = np.concatenate([np.arange(s0), np.arange(s1, len(o))])
        return {
            "kind": np.concatenate([np.zeros(len(a), np.int64), np.ones(len(bnd), np.int64)]),
            "v1": np.concatenate([a, o[bnd].astype(np.int64)]),
            "v2": np.concatenate([b, p[bnd].astype(np.int64)]),
        }

    bo, bp, pairs_s, pairs_d = [], [], [], []
    for t in srt.map_batches(expand_block, batch_format="pyarrow", batch_size=None).iter_batches(
        batch_format="pyarrow"
    ):
        kind = batch_to_numpy(t, "kind")
        v1 = batch_to_numpy(t, "v1")
        v2 = batch_to_numpy(t, "v2")
        bo.append(v1[kind == 1])
        bp.append(v2[kind == 1])
        pairs_s.append(v1[kind == 0])
        pairs_d.append(v2[kind == 0])
    o = np.concatenate(bo) if bo else np.empty(0, np.int64)
    p = np.concatenate(bp) if bp else np.empty(0, np.int64)
    check_boundary_size(len(o), "copurchase_k4")
    order = np.lexsort((p, o))
    ba, bb = _pairs(o[order], p[order])
    src = np.concatenate(pairs_s + [ba])
    dst = np.concatenate(pairs_d + [bb])
    edges = dedup_edges(
        rd.from_arrow(pa.table({"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())}))
    )
    k4 = four_clique_count(build_graph(edges))
    return pa.table({"k4_sampled": pa.array([k4], pa.int64())})


def q_balanced_partition(sf_dir: str, *, k: int = 8, rounds: int = 4):
    """Deterministic Spinner-style balanced k-way partitioning of the
    canonical undirected graph (:mod:`llama_ray.algos.partition`) —
    per-vertex part assignment after ``rounds`` parity-gated
    size-penalized LP rounds."""
    from ..algos.partition import balanced_partition

    g = _cached_canonical_graph(sf_dir)
    labels, _ = balanced_partition(g, k=k, rounds=rounds)
    return pa.table({"vertex": g.ids, "part": pa.array(labels, pa.int64())})


def q_bipartite_colors(sf_dir: str):
    """Per-vertex BFS-parity 2-coloring (the deterministic coloring
    behind ``bipartite``; one traversal, cached on the graph)."""
    from ..algos.bipartite import bipartite_colors

    return bipartite_colors(_cached_canonical_graph(sf_dir))


def q_msf(sf_dir: str):
    """Minimum spanning forest (distributed Borůvka —
    :mod:`llama_ray.algos.msf`) over the undirected weighted pair
    graph: per raw edge (a=min, b=max), self-loops dropped, pair
    weight = SUM of raw weights over both orientations (integer-valued
    l_quantity sums — exact in float64 in any reduction order). The
    deterministic (weight, a, b) total order makes the forest unique,
    so the unrolled-Borůvka DuckDB oracle hash-matches."""
    from ..algos.msf import minimum_spanning_forest

    g = _GRAPH_CACHE.get(("msf_w", sf_dir))
    if g is None:

        def canon(b: pa.Table):
            s = batch_to_numpy(b, "src")
            d = batch_to_numpy(b, "dst")
            w = batch_to_numpy(b, "weight").astype(np.float64)
            lo = np.minimum(s, d)
            hi = np.maximum(s, d)
            keep = lo != hi
            return {"src": lo[keep], "dst": hi[keep], "weight": w[keep]}

        pairs = dedup_edges(
            raw_edges(sf_dir)
            .select_columns(["src", "dst", "weight"])
            .map_batches(canon, batch_format="pyarrow"),
            weights="sum",
        )
        g = build_graph(pairs)
        _GRAPH_CACHE[("msf_w", sf_dir)] = g
    return minimum_spanning_forest(g)


def q_avg_nbr_balance(sf_dir: str):
    """avg_teen_cnt analogue (`/root/reference/benchmark/benchmarks/avg_teen_cnt.h:55-141`):
    per nation vertex, count in-neighbors (customers/suppliers) with
    balance in [1000, 5000); return the average count over all nation
    vertices. Small property side broadcast via ray.put; the count is
    the usual scatter → groupby(dst)."""
    cust = pq.read_table(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey", "c_acctbal"]
    )
    supp = pq.read_table(
        os.path.join(sf_dir, "supplier.parquet"), columns=["s_suppkey", "s_acctbal"]
    )
    ids = np.concatenate(
        [cust.column("c_custkey").to_numpy(), O_SUPP + supp.column("s_suppkey").to_numpy()]
    )
    bal = np.concatenate(
        [cust.column("c_acctbal").to_numpy(), supp.column("s_acctbal").to_numpy()]
    )
    order = np.argsort(ids)
    ids, bal = ids[order], bal[order]
    props_ref = ray.put((ids, bal))

    def qualifying(batch: pa.Table):
        pids, pbal = ray.get(props_ref)
        src = batch_to_numpy(batch, "src")
        dst = batch_to_numpy(batch, "dst")
        m = (dst >= O_NATION) & (dst < O_REGION)
        src, dst = src[m], dst[m]
        pos = np.searchsorted(pids, src)
        pos = np.clip(pos, 0, len(pids) - 1)
        ok = (pids[pos] == src) & (pbal[pos] >= 1000) & (pbal[pos] < 5000)
        return {"dst": dst[ok]}

    counts = (
        _cached_dedup_edges(sf_dir)
        .map_batches(qualifying, batch_format="pyarrow")
        .groupby("dst")
        .aggregate(Count(alias_name="cnt"))
        .to_pandas()
    )
    nation = pq.read_table(os.path.join(sf_dir, "nation.parquet"), columns=["n_nationkey"])
    n_nations = nation.num_rows
    total = counts["cnt"].sum() if len(counts) else 0
    return pa.table({"avg_cnt": pa.array([round(float(total) / n_nations, 6)], pa.float64())})


PPR_SEEDS = [1, 2, 3]  # customer vertices; mirrored in oracles.ppr_sql


def q_ppr(sf_dir: str):
    """Batched personalized PageRank (10 iterations, d=0.85) from 3
    seed customers; output one row per (vertex, seed)."""
    from ..algos.ppr import personalized_pagerank

    g = _cached_tpch_graph(sf_dir)
    seeds = np.array(PPR_SEEDS, np.int64)
    res = personalized_pagerank(g, seeds, max_iters=10, engine="bsp")
    r = res.state["rank"]
    K = len(seeds)
    return pa.table(
        {
            "vertex": np.repeat(g.ids, K),
            "seed": np.tile(seeds, g.num_vertices),
            "rank": np.round(r.ravel(), 8),
        }
    )


def q_wcc_sizes(sf_dir: str):
    """Component → member count (exact partition sizes)."""
    g = _cached_tpch_graph(sf_dir)
    res = weakly_connected_components(g)
    comp, cnt = np.unique(res.state["label"], return_counts=True)
    return pa.table({"component": comp, "size": cnt.astype(np.int64)})


def q_top_referenced(sf_dir: str, *, k: int = 20):
    """Top-k vertices by in-degree (distinct in-neighbors), ties by
    vertex id — a groupby + global top-k."""
    from ..common import distributed_topk

    counts = distributed_topk(
        _cached_dedup_edges(sf_dir).groupby("dst").aggregate(Count(alias_name="in_degree")),
        [("in_degree", "descending"), ("dst", "ascending")],
        k,  # per-block partials: the O(V) degree table stays off the driver
    ).to_pandas()
    return counts.rename(columns={"dst": "vertex"})[["vertex", "in_degree"]]


def q_bc_random(sf_dir: str):
    """Approximate betweenness from 16 sources (reference bc_random
    shape, `bc_random.h:120-220`). Sources are the 16 smallest vertex
    ids — the random pick isn't semantic, and a deterministic set
    makes the unrolled-Brandes DuckDB oracle possible; the seeded-
    random mode stays covered by the numpy Brandes tests."""
    from ..algos.bc import betweenness_centrality

    g = _cached_tpch_graph(sf_dir)
    # g.ids is sorted, so dense indices 0..15 are the 16 smallest ids
    bc = betweenness_centrality(g, sources=np.arange(min(16, g.num_vertices)))
    return pa.table({"vertex": g.ids, "bc": np.round(bc, 6)})


GRAPH_WALK_STEPS = 4  # mirrored in oracles.graph_walks_sql


def q_graph_walks(sf_dir: str):
    """Deterministic random-walk corpus (node2vec/DeepWalk sampling):
    one 4-step walk from every customer vertex; next hop = neighbor
    rank splitmix64(walk·GOLD ⊕ step ⊕ seed) mod out-degree in
    ascending-neighbor order — partitioning-independent, so DuckDB
    replays it exactly (`oracles.graph_walks_sql`)."""
    from ..algos.walks import random_walks

    g = _cached_tpch_graph(sf_dir)
    starts = g.ids[g.ids < 10_000_000]  # customer id space
    return random_walks(g, starts, num_steps=GRAPH_WALK_STEPS)


def q_khop_subgraph(sf_dir: str, *, hops: int = 2):
    """2-hop ego subgraph union around the seed set {id < 100} — the
    GraphSAGE minibatch expansion (Hamilton et al. 2017): distinct
    out-edges reachable in ≤ 2 forward steps, tagged with discovery
    hop. Per hop one broadcast frontier + vectorized membership filter
    over the edge blocks; oracle unrolls the frontier joins."""
    from ..algos.walks import khop_subgraph

    g = _cached_tpch_graph(sf_dir)
    return khop_subgraph(g, g.ids[g.ids < 100], hops=hops)


def q_walk_skipgram_pairs(sf_dir: str, *, window: int = 2):
    """Skip-gram (center, context) pair counts from the deterministic
    walk corpus — the DeepWalk → word2vec sampling stage (Perozzi et
    al. 2014): pairs co-occurring within 2 steps of the same walk,
    exact counts. One (walk, step) sort + run-offset pair arithmetic +
    the sorted run-reduce merge; oracle self-joins the replayed walk
    table."""
    from ..algos.walks import random_walks, walk_context_pairs

    g = _cached_tpch_graph(sf_dir)
    starts = g.ids[g.ids < 10_000_000]
    return walk_context_pairs(
        random_walks(g, starts, num_steps=GRAPH_WALK_STEPS), window=window
    )


def q_graph_walks_node2vec(sf_dir: str):
    """Second-order biased walk corpus (node2vec p=4, q=2 scaled to
    integer weights (1, 4, 2)): one 4-step walk from every customer
    vertex; step 1 uniform, later hops weighted by return / common-
    neighbor / exploration class — partitioning-independent integer
    math, replayed exactly by `oracles.graph_walks_node2vec_sql`."""
    from ..algos.walks import node2vec_walks

    g = _cached_tpch_graph(sf_dir)
    starts = g.ids[g.ids < 10_000_000]  # customer id space
    return node2vec_walks(g, starts, num_steps=GRAPH_WALK_STEPS)


def q_neighbor_sample(sf_dir: str, *, k: int = 3):
    """GraphSAGE-style fan-out: a uniform hash-min k-subset of every
    vertex's out-neighbors (see `algos.walks.sample_neighbors`)."""
    from ..algos.walks import sample_neighbors

    return sample_neighbors(_cached_tpch_graph(sf_dir), k)


def q_edge_support(sf_dir: str):
    """Per-edge triangle counts (k-truss basis / common-neighbor link
    score) — see `algos.truss.edge_support`."""
    from ..algos.truss import edge_support

    return edge_support(_cached_tpch_graph(sf_dir))


def q_hyperanf(sf_dir: str, *, rounds: int = 4):
    """HyperANF registers after 4 out-edge merges (see
    `algos.hyperanf`): the integer HLL state the effective-diameter
    estimate derives from, SQL-replayed exactly."""
    from ..algos.hyperanf import registers_table

    return registers_table(_cached_tpch_graph(sf_dir), rounds=rounds)


def q_mis(sf_dir: str):
    """Maximal independent set via deterministic Luby rounds (see
    `algos.mis`): unique hash priorities, so the SQL oracle replays
    every round exactly."""
    from ..algos.mis import maximal_independent_set

    return maximal_independent_set(_cached_tpch_graph(sf_dir))


def q_feature_prop(sf_dir: str):
    """SGC-style feature propagation: 2 sweeps of in-neighbor sums
    over 4 deterministic hash features (see `algos.featprop`)."""
    from ..algos.featprop import feature_propagation

    t = feature_propagation(_cached_tpch_graph(sf_dir), k=4, rounds=2)
    return t.set_column(
        t.schema.get_field_index("value"), "value", pc.round(t.column("value"), 6)
    )


def q_graph_walks_weighted(sf_dir: str):
    """Weighted walk corpus: hop probability ∝ duplicate-edge count
    (the streaming weights-instead-of-duplicates semantic) — exact
    integer cumulative-weight inversion, SQL-replayed with a window
    cumsum in `oracles.graph_walks_weighted_sql`."""
    from ..algos.walks import random_walks

    g = _GRAPH_CACHE.get(("gw", sf_dir))
    if g is None:
        g = build_graph(dedup_edges(raw_edges(sf_dir, with_props=False), weights="count"))
        _GRAPH_CACHE[("gw", sf_dir)] = g
    starts = g.ids[g.ids < 10_000_000]  # customer id space
    return random_walks(g, starts, num_steps=GRAPH_WALK_STEPS, weighted=True)


def q_events_sessions(sf_dir: str, *, gap_seconds: int = 1800):
    """Sessionization: per user, events within ``gap_seconds`` of the
    previous event share a session. One range sort by (user, ts,
    event_id), then a vectorized run-boundary cumsum per block —
    session = run start where the user changes or the gap exceeds the
    threshold. Users whose rows touch a block edge resolve in a small
    driver pass (≤ 2 users per block), the same boundary trick as
    ``dedup_edges``. Output: one row per session (user_id,
    session_start, n_events)."""
    from ..graph import target_num_blocks

    # coarse blocks: the auto-split (~300 tiny blocks at 10M rows)
    # inflates both the prep map and the sort ~5×
    ev = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "ts"],
        override_num_blocks=target_num_blocks(None),
    )

    gap_us = gap_seconds * 1_000_000  # exact µs; epoch-seconds would
    # round vs truncate differently between numpy and DuckDB

    def prep(b: pa.Table):
        # order among equal (user, t) rows cannot change gaps or
        # session starts, so no tiebreak column is needed in the sort
        return {
            "user_id": batch_to_numpy(b, "user_id"),
            "t": b.column("ts")
            .cast(pa.timestamp("us"))
            .cast(pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False),
        }

    return sessionize_prepped(
        ev.map_batches(prep, batch_format="pyarrow", batch_size=None), gap_us
    )


def sessionize_prepped(prepped, gap_us: int):
    """Core sessionization over a prepped (user_id, t µs) Dataset —
    factored out of :func:`q_events_sessions` so property tests can
    drive it on synthetic streams (gap-boundary equality, block-edge
    users)."""
    srt = prepped.sort(["user_id", "t"]).materialize()

    def sessions_of(u: np.ndarray, t: np.ndarray):
        new = np.ones(len(u), bool)
        new[1:] = (u[1:] != u[:-1]) | ((t[1:] - t[:-1]) > gap_us)
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], len(u))
        return {
            "user_id": u[starts],
            "session_start": t[starts],
            "n_events": (ends - starts).astype(np.int64),
        }

    def interior(b: pa.Table):
        u = batch_to_numpy(b, "user_id")
        if len(u) == 0:
            return {
                "user_id": u,
                "session_start": np.empty(0, np.int64),
                "n_events": np.empty(0, np.int64),
            }
        t = batch_to_numpy(b, "t")
        inner = (u != u[0]) & (u != u[-1])
        if not inner.any():
            return {
                "user_id": np.empty(0, np.int64),
                "session_start": np.empty(0, np.int64),
                "n_events": np.empty(0, np.int64),
            }
        return sessions_of(u[inner], t[inner])

    from ..common import collect_boundary_runs

    main = srt.map_batches(interior, batch_format="pyarrow", batch_size=None)
    btbl = collect_boundary_runs(
        srt, "user_id", columns=["user_id", "t"], where="sessionize"
    )
    if btbl is not None:
        # block order preserves the global sort
        extra = sessions_of(batch_to_numpy(btbl, "user_id"), batch_to_numpy(btbl, "t"))
        main = main.union(rd.from_arrow(pa.table({k: pa.array(v) for k, v in extra.items()})))
    return main


# ------------------------------------------------------------ documents ops


def q_doc_exact_dedup(sf_dir: str):
    """Exact dedup by content hash: survivor = min doc_id per distinct
    text (groupby on a vectorized 64-bit content hash — the
    content-hash + hash-partition + per-group-first pattern; no
    per-row Python in the hash stage)."""
    from ..common import content_hash_column

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def hash_col(batch: pa.Table):
        h = content_hash_column(batch.column("text"))
        return {"h": h, "doc_id": batch_to_numpy(batch, "doc_id")}

    out = (
        docs.map_batches(hash_col, batch_format="pyarrow")
        .groupby("h")
        .aggregate(Min("doc_id", alias_name="doc_id"), Count(alias_name="copies"))
    )
    return out.select_columns(["doc_id", "copies"])


class _TokenStats:
    """Actor-pool text stage: per-doc token/char counts — single Arrow
    RE2 / length kernels per batch (the QualityScore pattern), no
    per-row Python; RE2 whitespace matches the DuckDB oracle's."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column("text")
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "lang": batch.column("lang"),
                "n_tokens": pc.count_substring_regex(col, r"\S+").cast(pa.int64()),
                "n_chars": pc.utf8_length(col).cast(pa.int64()),
            }
        )


def q_doc_token_stats(sf_dir: str):
    docs = _read(sf_dir, "documents", ["doc_id", "lang", "text"])
    return docs.map_batches(_TokenStats, batch_format="pyarrow", concurrency=(1, 4)).select_columns(
        ["doc_id", "n_tokens", "n_chars"]
    )


def q_lang_stats(sf_dir: str):
    docs = _read(sf_dir, "documents", ["doc_id", "lang", "text"])
    stats = docs.map_batches(_TokenStats, batch_format="pyarrow", concurrency=(1, 4))
    agg = stats.groupby("lang").aggregate(
        Count(alias_name="n_docs"), Sum("n_tokens", alias_name="_sum_tokens")
    ).to_pandas()
    agg["avg_tokens"] = (agg["_sum_tokens"] / agg["n_docs"]).round(6)
    return agg[["lang", "n_docs", "avg_tokens"]]


# ----------------------------------------------------------------- events


def q_events_hourly(sf_dir: str):
    """Tumbling 1-hour window per event_type (streaming-shaped
    aggregate; window_start = epoch seconds of the hour)."""
    ev = _read(sf_dir, "events", ["event_type", "ts", "value"])

    def window(batch: pa.Table) -> pa.Table:
        ws = (
            pc.floor_temporal(batch.column("ts"), unit="hour")
            .cast(pa.timestamp("s"))
            .cast(pa.int64())
        )
        return pa.table(
            {
                "event_type": batch.column("event_type"),
                "window_start": ws,
                "value": batch.column("value"),
            }
        )

    agg = (
        ev.map_batches(window, batch_format="pyarrow")
        .groupby(["event_type", "window_start"])
        .aggregate(Count(alias_name="n"), Sum("value", alias_name="sum_value"))
        .to_pandas()
    )
    agg["sum_value"] = agg["sum_value"].round(4)
    return agg


def q_events_hourly_anomaly(sf_dir: str):
    """Hourly volume anomaly detection per event type: z² of each
    tumbling-hour count against its type's mean/variance, flagged at
    |n − μ| > 3σ.  Distributed work = the (type, hour) base count
    (per-batch partials + one small groupby); the per-type moments are
    integer sums over that ≤|types|·|hours| base, and every double is
    derived by the same expression tree as the SQL twin (single
    divisions over identical integers → bit-identical, rounded 6)."""
    ev = _read(sf_dir, "events", ["event_type", "ts"])

    def prep(b: pa.Table) -> dict:
        ws = (
            pc.floor_temporal(b.column("ts"), unit="hour")
            .cast(pa.timestamp("s"))
            .cast(pa.int64())
        ).to_numpy(zero_copy_only=False)
        tbl = pa.table({"event_type": b.column("event_type").combine_chunks(), "ws": ws})
        k = tbl.group_by(["event_type", "ws"]).aggregate([("ws", "count")])
        return {
            "event_type": k.column("event_type").to_numpy(zero_copy_only=False),
            "ws": k.column("ws").to_numpy(zero_copy_only=False),
            "n": k.column("ws_count").cast(pa.int64()).to_numpy(zero_copy_only=False),
        }

    base = (
        ev.map_batches(prep, batch_format="pyarrow")
        .groupby(["event_type", "ws"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    base["n"] = base["n"].astype(np.int64)
    out_rows = []
    for et, grp in base.groupby("event_type"):
        n = grp["n"].to_numpy()
        h = len(n)
        sn = int(n.sum())
        ssn = int((n * n).sum())
        mean = float(sn) / h
        var = (float(ssn) - float(sn) * sn / h) / h
        for ws, ni in zip(grp["ws"].to_numpy(), n):
            d = ni - mean
            z2 = d * d / var if var > 0 else 0.0
            out_rows.append(
                (
                    et,
                    int(ws),
                    int(ni),
                    float(np.round(z2, 6)),
                    1 if (var > 0 and d * d > 9 * var) else 0,
                )
            )
    return pd.DataFrame(
        out_rows, columns=["event_type", "window_start", "n", "z2", "is_anomaly"]
    )


def q_session_stats(sf_dir: str):
    """Session-size distribution on top of the sessionization output:
    session count, total/max events per session, and the exact
    p50/p90/p99 of session size (histogram quantiles — one row per
    distinct size through the shuffle, never the sessions
    themselves)."""
    from ..data_ops.text import exact_quantiles

    sess = q_events_sessions(sf_dir).materialize()

    def partial(b: pa.Table) -> dict:
        n = batch_to_numpy(b, "n_events")
        return {
            "n_sessions": np.array([len(n)], np.int64),
            "total_events": np.array([int(n.sum())], np.int64),
            "max_events": np.array([int(n.max()) if len(n) else 0], np.int64),
        }

    parts = sess.map_batches(partial, batch_format="pyarrow").to_pandas()
    qt = exact_quantiles(sess, "n_events", [0.5, 0.9, 0.99])
    qv = qt.column("value").to_pylist()
    return pa.table(
        {
            "n_sessions": pa.array([int(parts["n_sessions"].sum())], pa.int64()),
            "total_events": pa.array([int(parts["total_events"].sum())], pa.int64()),
            "max_events": pa.array([int(parts["max_events"].max())], pa.int64()),
            "p50_events": pa.array([qv[0]], pa.int64()),
            "p90_events": pa.array([qv[1]], pa.int64()),
            "p99_events": pa.array([qv[2]], pa.int64()),
        }
    )


def q_events_quantiles_cont(sf_dir: str, *, qs=(0.5, 0.9, 0.99)):
    """Interpolated quantiles (SQL ``quantile_cont``) of the raw event
    value doubles — one sort, at most two target blocks fetched per
    quantile (see ``data_ops.text.exact_quantiles_cont``); rounded 6
    on both sides."""
    from ..data_ops.text import exact_quantiles_cont

    ev = _read(sf_dir, "events", ["value"])
    t = exact_quantiles_cont(ev, "value", list(qs))
    return pa.table(
        {
            "q": t.column("q"),
            "value": pa.array(
                np.round(t.column("value").to_numpy(zero_copy_only=False), 6)
            ),
        }
    )


def q_events_type_quantiles_cont(sf_dir: str, *, qs=(0.5, 0.9)):
    """Per-event-type interpolated value quantiles (grouped
    ``quantile_cont``; see ``data_ops.text.exact_group_quantiles_cont``),
    rounded 6 on both sides."""
    from ..data_ops.text import exact_group_quantiles_cont

    ev = _read(sf_dir, "events", ["event_type", "value"])
    t = exact_group_quantiles_cont(ev, "event_type", "value", list(qs))
    return pa.table(
        {
            "event_type": t.column("event_type"),
            "q": t.column("q"),
            "value": pa.array(
                np.round(t.column("value").to_numpy(zero_copy_only=False), 6)
            ),
        }
    )


# per-column quantization scales: price/quantity to cents (≤ 2^24),
# rate columns to 1e-6 (≤ 2^20) — every pairwise product stays < 2^48
_CORR_COLS = {
    "l_quantity": 100,
    "l_extendedprice": 100,
    "l_discount": 1_000_000,
    "l_tax": 1_000_000,
}


def q_lineitem_correlations(sf_dir: str):
    """Pairwise Pearson correlations between the lineitem numeric
    columns from EXACT integer moments.  Second moments of quantized
    int64s overflow int64 at scale (Σx² of cent-priced items passes
    2⁶³ near 10⁸ rows), so each per-batch product sum is carried as
    TWO int64 limbs (Σ(p & 2³²−1), Σ(p ≫ 32)) — both bounded by
    rows·2³² — and the driver reassembles exact arbitrary-precision
    moments from O(blocks) partial rows.  The correlation itself is
    one double expression over those exact integers, identical to the
    HUGEINT-sum SQL twin, rounded 6."""
    import math

    cols = list(_CORR_COLS)
    li = _read(sf_dir, "lineitem", cols)
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i:]]
    M32 = np.int64((1 << 32) - 1)

    def partial(b: pa.Table) -> dict:
        q = {
            c: np.floor(batch_to_numpy(b, c) * s + 0.5).astype(np.int64)
            for c, s in _CORR_COLS.items()
        }
        out = {"n": np.array([b.num_rows], np.int64)}
        for c in cols:
            out[f"s_{c}"] = np.array([int(q[c].sum())], np.int64)
        for a, c in pairs:
            p = q[a] * q[c]  # < 2^48 per row by the scale choice
            out[f"lo_{a}_{c}"] = np.array([int((p & M32).sum())], np.int64)
            out[f"hi_{a}_{c}"] = np.array([int((p >> 32).sum())], np.int64)
        return out

    parts = li.map_batches(partial, batch_format="pyarrow").to_pandas()
    n = int(parts["n"].sum())
    s = {c: int(parts[f"s_{c}"].sum()) for c in cols}
    mom = {
        (a, c): (int(parts[f"hi_{a}_{c}"].sum()) << 32)
        + int(parts[f"lo_{a}_{c}"].sum())
        for a, c in pairs
    }
    out_a, out_b, out_r = [], [], []
    for i, a in enumerate(cols):
        for c in cols[i + 1 :]:
            num = float(n * mom[(a, c)] - s[a] * s[c])
            da = float(n * mom[(a, a)] - s[a] * s[a])
            db = float(n * mom[(c, c)] - s[c] * s[c])
            r = num / math.sqrt(da * db)
            out_a.append(a)
            out_b.append(c)
            out_r.append(float(np.round(r, 6)))
    return pa.table(
        {
            "col_a": pa.array(out_a),
            "col_b": pa.array(out_b),
            "r": pa.array(out_r, pa.float64()),
        }
    )


def q_events_profile(sf_dir: str):
    """Table profiling (the data-catalog stats pass): per numeric
    column of events — row count, null count, min, max, integer sum
    (value in micro-units, ts as epoch-us) — from ONE streaming pass
    of commutative per-batch partials; only O(columns) scalars reach
    the driver."""
    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def partial(b: pa.Table) -> dict:
        ts = b.column("ts").cast(pa.timestamp("us")).cast(pa.int64())
        v = batch_to_numpy(b, "value")
        cols = {
            "event_id": batch_to_numpy(b, "event_id"),
            "user_id": batch_to_numpy(b, "user_id"),
            "ts_u": ts.to_numpy(zero_copy_only=False),
            "val_u": np.floor(v * 1e6 + 0.5).astype(np.int64),
        }
        names, n, nn, mn, mx, sm = [], [], [], [], [], []
        for name, arr in cols.items():
            names.append(name)
            n.append(len(arr))
            nn.append(0)  # columns are non-null in this table
            mn.append(int(arr.min()) if len(arr) else 0)
            mx.append(int(arr.max()) if len(arr) else 0)
            # a timestamp sum is meaningless and overflows int64 at
            # ~10^4 rows — profiled as 0 on both sides
            sm.append(0 if name == "ts_u" else int(arr.sum()))
        return {
            "column": np.array(names),
            "n": np.array(n, np.int64),
            "n_null": np.array(nn, np.int64),
            "min_v": np.array(mn, np.int64),
            "max_v": np.array(mx, np.int64),
            "sum_v": np.array(sm, np.int64),
        }

    parts = ev.map_batches(partial, batch_format="pyarrow").to_pandas()
    g = parts.groupby("column", as_index=False).agg(
        n=("n", "sum"),
        n_null=("n_null", "sum"),
        min_v=("min_v", "min"),
        max_v=("max_v", "max"),
        sum_v=("sum_v", "sum"),
    )
    for c in ["n", "n_null", "min_v", "max_v", "sum_v"]:
        g[c] = g[c].astype(np.int64)
    return g


def q_events_transitions(sf_dir: str):
    """Per-user event-type transition counts (first-order Markov
    estimation over the event stream): for every user in (ts,
    event_id) order, count (previous type → type) pairs; the first
    event of a user transitions from 'START'.  Types map to small ints
    so the engine's partitioned LAG (``running_window``) carries the
    previous type; counts come from per-batch partials + one tiny
    groupby."""
    from ..data_ops.relational import running_window

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])
    # sorted distinct types (tiny groupby) — internal integer codes
    # only; the output maps back to strings, so the SQL twin never
    # needs them
    types = sorted(
        r["event_type"]
        for r in ev.groupby("event_type").count().take_all()
    )
    tarr = np.array(types)
    if len(types) >= 8:
        raise ValueError("events_transitions: key packing assumes < 8 types")

    def prep(b: pa.Table) -> pa.Table:
        t = b.column("event_type").to_numpy(zero_copy_only=False)
        code = np.searchsorted(tarr, t)
        return pa.table(
            {
                "event_id": b.column("event_id"),
                "user_id": b.column("user_id"),
                "ts_u": b.column("ts").cast(pa.timestamp("us")).cast(pa.int64()),
                "code": code.astype(np.int64),
            }
        )

    win = running_window(
        ev.map_batches(prep, batch_format="pyarrow"),
        by="user_id",
        order_cols=["ts_u", "event_id"],
        val_col="code",
        out_sum="_rs",
        out_lag="prev_code",
        out_rn="_rn",
    )

    def partial(b: pa.Table) -> dict:
        cur = batch_to_numpy(b, "code")
        prev = b.column("prev_code").fill_null(-1).to_numpy(zero_copy_only=False)
        key = (prev + 1) * 8 + cur
        u, cnt = np.unique(key, return_counts=True)
        return {"key": u.astype(np.int64), "n": cnt.astype(np.int64)}

    parts = (
        win.map_batches(partial, batch_format="pyarrow")
        .groupby("key")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    names = np.array(["START"] + types)
    prev_idx = (parts["key"] // 8).to_numpy()
    cur_idx = (parts["key"] % 8).to_numpy()
    return pd.DataFrame(
        {
            "prev_type": names[prev_idx],
            "event_type": tarr[cur_idx],
            "n": parts["n"].astype(np.int64),
        }
    )


def q_events_rollup(sf_dir: str):
    """Grouping-sets aggregate — ``GROUP BY ROLLUP(event_type, day)``:
    per (type, day), per type, and grand-total event counts + value
    sums in one pass.  The distributed work is the fine-grained
    (type, day) base aggregate (per-batch partial combine → one small
    groupby shuffle, ≤ |types|·|days| rows); the coarser levels are an
    exact integer driver fold of that base — the correct 100-TB shape
    (never aggregate the raw stream once per grouping set).  Values in
    micro-units; NULL group keys as sentinels ('ALL' / -1)."""
    ev = _read(sf_dir, "events", ["event_type", "ts", "value"])

    def prep(b: pa.Table) -> dict:
        day = (
            pc.floor_temporal(b.column("ts"), unit="day")
            .cast(pa.timestamp("s"))
            .cast(pa.int64())
        ).to_numpy(zero_copy_only=False) // 86400
        et = b.column("event_type").combine_chunks()
        v = np.floor(batch_to_numpy(b, "value") * 1e6 + 0.5).astype(np.int64)
        tbl = pa.table({"event_type": et, "day": day, "val_u": v})
        # in-batch partial combine: ≤ |types|·|days| rows leave
        import pyarrow.compute as _pc

        keys = tbl.group_by(["event_type", "day"]).aggregate(
            [("val_u", "sum"), ("val_u", "count")]
        )
        return {
            "event_type": keys.column("event_type").to_numpy(zero_copy_only=False),
            "day": keys.column("day").to_numpy(zero_copy_only=False),
            "val_u": keys.column("val_u_sum").to_numpy(zero_copy_only=False),
            "n": keys.column("val_u_count").cast(pa.int64()).to_numpy(zero_copy_only=False),
        }

    base = (
        ev.map_batches(prep, batch_format="pyarrow")
        .groupby(["event_type", "day"])
        .aggregate(Sum("n", alias_name="n"), Sum("val_u", alias_name="value_u"))
        .to_pandas()
    )
    base["n"] = base["n"].astype(np.int64)
    base["value_u"] = base["value_u"].astype(np.int64)
    lvl1 = base.groupby("event_type", as_index=False)[["n", "value_u"]].sum()
    lvl1["day"] = -1
    total = pd.DataFrame(
        {
            "event_type": ["ALL"],
            "day": [-1],
            "n": [base["n"].sum()],
            "value_u": [base["value_u"].sum()],
        }
    )
    out = pd.concat(
        [base, lvl1[["event_type", "day", "n", "value_u"]], total],
        ignore_index=True,
    )
    return out[["event_type", "day", "n", "value_u"]]


def q_doc_minhash_clusters(sf_dir: str):
    """MinHash-LSH near-dup clusters over documents (no SQL oracle —
    sketch-based; verified on constructed near-dups in tests)."""
    from ..data_ops.dedup import minhash_lsh_dedup

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return minhash_lsh_dedup(docs, jaccard_threshold=0.8)


def q_doc_ngram_jaccard(sf_dir: str):
    """Exact word-3-gram Jaccard pairs ≥ 0.5 via the distributed
    LSH-prune + sort-merge-verify path (rows-only; exact-pair recovery
    tested in tests/test_data_ops.py)."""
    from ..data_ops.dedup import ngram_jaccard_pairs

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    out = ngram_jaccard_pairs(docs, n=3, threshold=0.5)

    def rounded(b: pa.Table):
        return {
            "a": batch_to_numpy(b, "a"),
            "b": batch_to_numpy(b, "b"),
            "jaccard": np.round(batch_to_numpy(b, "jaccard"), 6),
        }

    return out.map_batches(rounded, batch_format="pyarrow")


def q_doc_simhash(sf_dir: str):
    from ..data_ops.dedup import simhash_buckets

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return simhash_buckets(docs).select_columns(["doc_id", "simhash"])


def q_doc_language_id(sf_dir: str):
    """Predicted language counts (heuristic n-gram langid; prediction
    quality is not SQL-expressible — rows-only check)."""
    from ..data_ops.text import language_id

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    out = language_id(docs).groupby("lang_pred").aggregate(Count(alias_name="n"))
    return out


def q_doc_quality(sf_dir: str):
    """Per-doc quality score — returned as a streaming Dataset (the
    O(docs) result never materializes on the driver; rounding happens
    in a final map_batches)."""
    from ..data_ops.text import quality_score

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    out = quality_score(docs).select_columns(["doc_id", "quality"])

    def rounded(b: pa.Table):
        return {
            "doc_id": batch_to_numpy(b, "doc_id"),
            "quality": np.round(batch_to_numpy(b, "quality"), 6),
        }

    return out.map_batches(rounded, batch_format="pyarrow")


def q_embedding_near_dup(sf_dir: str):
    """Hyperplane-LSH near-dup pairs. τ/planes chosen so the synthetic
    embeddings yield a NON-empty result (the sf tables' closest pair
    sits near cos 0.51, so τ=0.9 proved nothing); recall < 1 by LSH
    design, so the driver check is rows-only — the exact all-pairs
    variant with a full DuckDB oracle is ``embedding_cos_pairs``."""
    from ..data_ops.dedup import embedding_near_dup

    emb = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    out = embedding_near_dup(emb, threshold=0.4, num_planes=4).to_pandas()
    out["cos"] = out["cos"].round(6)
    return out.sort_values(["a", "b"]).reset_index(drop=True)


def q_embedding_cos_pairs(sf_dir: str):
    """EXACT all-pairs cosine ≥ 0.4 (brute-force distributed matmul —
    the baseline ``embedding_near_dup`` approximates; full DuckDB
    oracle via list_cosine_similarity)."""
    from ..data_ops.ann import cosine_pairs

    emb = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    out = cosine_pairs(emb, threshold=0.4).to_pandas()
    out["cos"] = out["cos"].round(5)
    return out.sort_values(["a", "b"]).reset_index(drop=True)


def q_events_props_sum(sf_dir: str):
    """Semi-structured extraction: pull the integer out of the JSON-ish
    ``props`` column and aggregate per event type (one Arrow RE2
    ``extract_regex`` per batch; mirrors the SQL regexp_extract
    oracle exactly — both are RE2 first-match)."""
    ev = _read(sf_dir, "events", ["event_type", "props"])

    def extract(batch: pa.Table):
        m = pc.extract_regex(batch.column("props"), r"(?P<k>[0-9]+)")
        ks = pc.fill_null(pc.struct_field(m, "k"), "0").cast(pa.int64())
        return pa.table({"event_type": batch.column("event_type"), "k": ks})

    out = (
        ev.map_batches(extract, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("k", alias_name="sum_k"), Count(alias_name="n"))
    )
    return out


def q_doc_fingerprints(sf_dir: str):
    """Winnowed rolling-hash fingerprints (rows-only; robustness tested
    in tests/test_data_ops.py)."""
    from ..data_ops.text import fingerprint

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return fingerprint(docs).select_columns(["doc_id", "fingerprint"])


def q_knn_lsh(sf_dir: str, *, n_queries: int = 5, k: int = 10):
    """Approximate ANN via random-hyperplane LSH (rows-only; recall
    vs brute force tested in tests/test_data_ops.py)."""
    from ..data_ops.ann import knn_lsh

    path = os.path.join(sf_dir, "embeddings.parquet")
    qt = pq.read_table(path, columns=["vec_id", "embedding"])
    qt = qt.filter(pc.less(qt.column("vec_id"), n_queries))
    dim = len(qt.column("embedding")[0])
    Q = np.asarray(qt.column("embedding").combine_chunks().flatten().to_numpy(), np.float64).reshape(-1, dim)
    out = knn_lsh(
        rd.read_parquet(path, columns=["vec_id", "embedding"]),
        Q,
        qt.column("vec_id").to_numpy(),
        k=k,
    )
    out["sim"] = out["sim"].round(5)
    return out


def q_knn_ivf(sf_dir: str):
    """Approximate ANN via IVF with the integer-exact SPHERICAL
    k-means coarse quantizer (direction-mean centroids, the
    FAISS-IVFFlat structure for cosine): 5 queries probe their 4 best
    of 16 centroids after 2 spherical Lloyd rounds, candidates ranked
    by ROUND(cos, 5). Layout-independent (int64 unit-vector partial
    sums) so it carries a full DuckDB hash oracle — the float
    ``knn_ivf``/``IVFIndex`` path stays as the production scale API,
    recall-tested in tests/test_data_ops.py."""
    from ..data_ops.ann import knn_ivf_spherical

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return knn_ivf_spherical(
        emb, num_queries=5, topk=10, k=16, nprobe=4, iters=2
    )


# ------------------------------------------------------------- embeddings


def q_vec_seed_partition(sf_dir: str):
    """Deterministic nearest-seed partitioning (the IVF assignment
    step made oracle-exact via integer-quantized dot products): 8
    smallest-id seeds, one broadcast K×d matrix, one int64 matmul per
    batch — no shuffle. Full DuckDB oracle (list_zip + list_sum)."""
    from ..data_ops.ann import seed_partition

    emb = rd.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
    )
    return seed_partition(emb, k=8)


def q_vec_kmeans(sf_dir: str):
    """Integer-exact Lloyd k-means (one iteration from the 8
    smallest-id seeds): the IVF training loop with a full DuckDB
    oracle — all-int64 quantized dots, floor-mean centroids. Per
    iteration one k×d broadcast + per-block reduceat partials; no
    shuffle, corpus never leaves the blocks."""
    from ..data_ops.ann import kmeans_quantized

    emb = rd.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
    )
    return kmeans_quantized(emb, k=8, iters=1)


def q_vec_pq(sf_dir: str):
    """Product quantization codebooks + encode (Jégou et al. 2011):
    4 subspaces × 16 integer-exact Lloyd codewords over the embedding
    column, long-form (vec_id, subspace, code_id, score) — the ANN
    compression stage with a full DuckDB oracle (see
    ``data_ops.ann.pq_encode``)."""
    from ..data_ops.ann import pq_encode

    emb = rd.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
    )
    return pq_encode(emb, m=4, k=16, iters=1)


def q_knn_ivf_q(sf_dir: str):
    """IVF k-NN with the integer-exact coarse quantizer — the
    oracle-checkable IVF variant: 8 queries probe their 2 best of 8
    quantized-Lloyd centroids, candidates ranked by ROUND(cos, 5)
    (see ``data_ops.ann.knn_ivf_quantized``; `knn_ivf` remains the
    float/scale path)."""
    from ..data_ops.ann import knn_ivf_quantized

    emb = rd.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
    )
    return knn_ivf_quantized(emb, num_queries=8, topk=10, k=8, nprobe=2)


def q_knn_pq(sf_dir: str):
    """PQ asymmetric-distance k-NN: the 8 smallest-id vectors rank the
    corpus by the compressed inner product Σ_s ⟨q_s, codeword(x, s)⟩
    (top-10, score desc / vec_id asc) — compressed-domain search over
    the vec_pq codebooks, integer-exact (see
    ``data_ops.ann.knn_pq``)."""
    from ..data_ops.ann import knn_pq

    emb = rd.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
    )
    return knn_pq(emb, num_queries=8, topk=10, m=4, k=16, iters=1)


def q_knn_cosine(sf_dir: str, *, n_queries: int = 5, k: int = 10):
    """Brute-force cosine top-k: broadcast the query matrix, per-batch
    float64 matmul + per-batch top-k partials, final top-k on the
    driver (rows driver-side = n_queries × k × num_batches)."""
    path = os.path.join(sf_dir, "embeddings.parquet")
    qt = pq.read_table(path, columns=["vec_id", "embedding"])
    qmask = pc.less(qt.column("vec_id"), n_queries)
    qt = qt.filter(qmask)
    qids = qt.column("vec_id").to_numpy()
    dim = len(qt.column("embedding")[0])
    Q = np.asarray(qt.column("embedding").combine_chunks().flatten().to_numpy(), np.float64).reshape(-1, dim)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    q_ref = ray.put((qids, Qn))

    def partial_topk(batch: pa.Table):
        ids_, Qn_ = ray.get(q_ref)
        vids = batch_to_numpy(batch, "vec_id")
        emb = batch.column("embedding").combine_chunks()
        V = np.asarray(emb.flatten().to_numpy(), np.float64).reshape(len(vids), -1)
        Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
        sims = Vn @ Qn_.T  # (batch, nq)
        out_q, out_n, out_s = [], [], []
        for j, qid in enumerate(ids_):
            s = sims[:, j].copy()
            s[vids == qid] = -np.inf  # exclude self
            kk = min(k, len(s))
            top = np.argpartition(-s, kk - 1)[:kk]
            out_q.append(np.full(kk, qid, np.int64))
            out_n.append(vids[top])
            out_s.append(s[top])
        return {
            "qid": np.concatenate(out_q),
            "neighbor_id": np.concatenate(out_n),
            "sim": np.concatenate(out_s),
        }

    emb_ds = rd.read_parquet(path, columns=["vec_id", "embedding"])
    parts = emb_ds.map_batches(partial_topk, batch_format="pyarrow").to_pandas()
    parts = parts.sort_values(["qid", "sim", "neighbor_id"], ascending=[True, False, True])
    final = parts.groupby("qid", as_index=False).head(k).reset_index(drop=True)
    final["sim"] = final["sim"].round(5)
    return final[["qid", "neighbor_id", "sim"]]


def q_hits(sf_dir: str, *, iters: int = 5):
    """HITS hubs & authorities, 5 synchronous L1-normalized iterations
    (see :mod:`llama_ray.algos.hits`)."""
    from ..algos.hits import hits

    g = _cached_tpch_graph(sf_dir)
    h, a, _ = hits(g, max_iters=iters)
    return pa.table(
        {
            "vertex": g.ids,
            "hub": np.round(h, 8),
            "authority": np.round(a, 8),
        }
    )


def q_local_clustering(sf_dir: str):
    """Per-vertex triangles + Watts–Strogatz local clustering
    coefficient (see :func:`llama_ray.algos.truss.local_clustering`)."""
    from ..algos.truss import local_clustering

    t = local_clustering(_cached_tpch_graph(sf_dir))
    return t.set_column(
        t.schema.get_field_index("coeff"), "coeff", pc.round(t.column("coeff"), 6)
    )


def q_ktruss(sf_dir: str, *, k: int = 4):
    """4-truss of the link graph: fixpoint edge set + supports (see
    :func:`llama_ray.algos.truss.ktruss`)."""
    from ..algos.truss import ktruss

    t, _rounds = ktruss(_cached_tpch_graph(sf_dir), k)
    return t


def q_assortativity(sf_dir: str):
    """Newman degree assortativity over the undirected simple graph
    (see :func:`llama_ray.algos.stats.degree_assortativity`)."""
    from ..algos.stats import degree_assortativity

    t = degree_assortativity(_cached_canonical_graph(sf_dir))
    return t.set_column(
        t.schema.get_field_index("assortativity"),
        "assortativity",
        pc.round(t.column("assortativity"), 6),
    )


def q_reciprocity(sf_dir: str):
    """Directed-edge reciprocity over the dense deduped link graph
    (see :func:`llama_ray.algos.stats.reciprocity`)."""
    from ..algos.stats import reciprocity

    t = reciprocity(_cached_tpch_graph(sf_dir).edges)
    return t.set_column(
        t.schema.get_field_index("reciprocity"),
        "reciprocity",
        pc.round(t.column("reciprocity"), 6),
    )


def q_lp_modularity(sf_dir: str):
    """Modularity of the 4-round label-propagation partition (see
    :func:`llama_ray.algos.stats.modularity`) — the community-quality
    composition query."""
    from ..algos.stats import modularity

    g = _cached_canonical_graph(sf_dir)
    res = label_propagation(g, iterations=4, engine="bsp")
    t = modularity(g, res.state["label"])
    return t.set_column(
        t.schema.get_field_index("modularity"),
        "modularity",
        pc.round(t.column("modularity"), 6),
    )


def q_coloring(sf_dir: str):
    """Deterministic Jones–Plassmann greedy coloring (see
    :mod:`llama_ray.algos.coloring`)."""
    from ..algos.coloring import greedy_coloring

    return greedy_coloring(_cached_tpch_graph(sf_dir))


def q_link_prediction(sf_dir: str):
    """Top-100 distance-2 pairs by common-neighbor count (see
    :mod:`llama_ray.algos.linkpred`)."""
    from ..algos.linkpred import link_prediction

    return link_prediction(_cached_tpch_graph(sf_dir))


def q_bpe_encode(sf_dir: str, *, num_merges: int = 8):
    """BPE encode — apply the 8 learned merges to the corpus and
    report each document's tokenizer budget (words vs BPE tokens):
    the vocab-resident shard trainer's post-merge word lengths joined
    to the occurrence stream (lm_score join shape) and rolled up per
    doc. Full DuckDB hash oracle via the unrolled training rounds."""
    from ..data_ops.text import bpe_encode_counts

    return bpe_encode_counts(
        _read(sf_dir, "documents", ["doc_id", "text"]), num_merges=num_merges
    )


def q_vocab_cms_topk(sf_dir: str):
    """Count-Min-Sketch heavy hitters (Cormode & Muthukrishnan 2005):
    a 4×1024 int64 sketch over the lowered token stream — commutative
    integer sums, bit-identical in every layout — with the exact
    top-20 tokens' CMS estimates beside their true counts (est ≥
    exact always). The sketch IS the at-scale vocabulary answer; full
    DuckDB hash oracle."""
    from ..data_ops.text import cms_heavy_hitters

    return cms_heavy_hitters(_read(sf_dir, "documents", ["doc_id", "text"]))


def q_vocab_topk(sf_dir: str):
    """Top-100 whitespace tokens by exact corpus frequency (see
    :func:`llama_ray.data_ops.text.vocab_topk`)."""
    from ..data_ops.text import vocab_topk

    return vocab_topk(_read(sf_dir, "documents", ["text"]), k=100)


def q_doc_split(sf_dir: str):
    """Deterministic 98/1/1 train/valid/test hash split summary (see
    :func:`llama_ray.data_ops.text.hash_split_summary`)."""
    from ..data_ops.text import hash_split_summary

    return hash_split_summary(_read(sf_dir, "documents", ["doc_id", "n_chars"]))


def q_pseudo_diameter(sf_dir: str):
    """Double-sweep BFS diameter lower bound (see
    :func:`llama_ray.algos.traversal.pseudo_diameter`)."""
    from ..algos.traversal import pseudo_diameter

    return pseudo_diameter(_cached_tpch_graph(sf_dir))


FUNNEL_STEPS = ("view", "click", "purchase")


def q_events_funnel(sf_dir: str, *, steps: tuple = FUNNEL_STEPS):
    """Ordered conversion funnel with first-occurrence semantics: a
    user converts step s when they have an event of type steps[s]
    strictly after their step s-1 conversion time (step 0 = earliest
    steps[0] event). One range sort by (user, t) over the step events
    only (non-step rows pruned at the read), then a vectorized
    three-pass ``np.minimum.at`` scan per block; users whose rows touch
    a block edge resolve in the same boundary pass sessionization uses.
    Output: (step, event_type, users) cumulative counts."""
    from ..common import collect_boundary_runs
    from ..graph import target_num_blocks

    ev = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "ts", "event_type"],
        override_num_blocks=target_num_blocks(None),
    )
    S = len(steps)
    step_of = {s: i for i, s in enumerate(steps)}

    def prep(b: pa.Table):
        k = pc.index_in(b.column("event_type"), value_set=pa.array(list(steps)))
        k = k.combine_chunks().to_numpy(zero_copy_only=False)
        keep = ~np.isnan(k.astype(np.float64)) if k.dtype.kind == "f" else k >= 0
        k = np.where(keep, k, -1).astype(np.int64)
        t = (
            b.column("ts")
            .cast(pa.timestamp("us"))
            .cast(pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        m = k >= 0
        return {"user_id": batch_to_numpy(b, "user_id")[m], "t": t[m], "k": k[m]}

    srt = ev.map_batches(prep, batch_format="pyarrow", batch_size=None).sort(
        ["user_id", "t"]
    ).materialize()

    INF = np.iinfo(np.int64).max

    def funnel_of(u: np.ndarray, t: np.ndarray, k: np.ndarray) -> np.ndarray:
        """Per-step converted-user counts for complete user runs."""
        if len(u) == 0:
            return np.zeros(S, np.int64)
        starts = np.flatnonzero(np.concatenate([[True], u[1:] != u[:-1]]))
        r = np.repeat(np.arange(len(starts)), np.diff(np.concatenate([starts, [len(u)]])))
        counts = np.zeros(S, np.int64)
        cur = np.full(len(starts), INF)
        m0 = k == 0
        np.minimum.at(cur, r[m0], t[m0])
        counts[0] = int((cur < INF).sum())
        for s in range(1, S):
            nxt = np.full(len(starts), INF)
            m = (k == s) & (t > cur[r])
            np.minimum.at(nxt, r[m], t[m])
            cur = nxt
            counts[s] = int((cur < INF).sum())
        return counts

    def interior(b: pa.Table):
        u = batch_to_numpy(b, "user_id")
        if len(u) == 0:
            return {"c": np.empty(0, np.int64), "step": np.empty(0, np.int64)}
        inner = (u != u[0]) & (u != u[-1])
        c = funnel_of(u[inner], batch_to_numpy(b, "t")[inner], batch_to_numpy(b, "k")[inner])
        return {"c": c, "step": np.arange(S, dtype=np.int64)}

    parts = srt.map_batches(interior, batch_format="pyarrow", batch_size=None).to_pandas()
    total = parts.groupby("step")["c"].sum().reindex(range(S), fill_value=0).to_numpy()
    btbl = collect_boundary_runs(srt, "user_id", columns=["user_id", "t", "k"], where="funnel")
    if btbl is not None:
        total = total + funnel_of(
            batch_to_numpy(btbl, "user_id"),
            batch_to_numpy(btbl, "t"),
            batch_to_numpy(btbl, "k"),
        )
    return pa.table(
        {
            "step": pa.array(np.arange(1, S + 1, dtype=np.int64)),
            "event_type": pa.array(list(steps)),
            "users": pa.array(total.astype(np.int64)),
        }
    )


def q_max_matching(sf_dir: str):
    """Greedy maximal matching by decreasing edge-hash priority (see
    :func:`llama_ray.algos.matching.maximal_matching`)."""
    from ..algos.matching import maximal_matching

    return maximal_matching(_cached_tpch_graph(sf_dir))


def q_dup_stats_by_source(sf_dir: str):
    """Duplication profile per source: total docs, distinct contents
    (by the vectorized 64-bit content hash), and the duplicate
    fraction — the per-shard health report of an exact-dedup run.
    One (source, hash) groupby then a per-source rollup; nothing
    doc-sized reaches the driver."""
    from ..common import content_hash_column

    docs = _read(sf_dir, "documents", ["source", "text"])

    def hash_col(batch: pa.Table):
        return {
            "source": batch.column("source"),
            "h": content_hash_column(batch.column("text")),
        }

    per = (
        docs.map_batches(hash_col, batch_format="pyarrow")
        .groupby(["source", "h"])
        .aggregate(Count(alias_name="copies"))
        .groupby("source")
        .aggregate(Count(alias_name="n_distinct"), Sum("copies", alias_name="n_docs"))
    )

    def final(b: pa.Table) -> pa.Table:
        nd = batch_to_numpy(b, "n_distinct").astype(np.int64)
        nt = batch_to_numpy(b, "n_docs").astype(np.int64)
        return pa.table(
            {
                "source": b.column("source"),
                "n_docs": nt,
                "n_distinct": nd,
                "dup_pct": np.round(1.0 - nd / nt, 6),
            }
        )

    return per.map_batches(final, batch_format="pyarrow")


def q_top_users_by_value(sf_dir: str):
    """Top-20 users by total event value (sum rounded to 4 decimals —
    a 10M-row float sum's reduction-order error is ~1e-7, so 6-decimal
    rounding could flip a hash at the boundary): groupby + partial
    top-k merge, the degree-table pattern."""
    from ..common import distributed_topk

    agg = (
        _read(sf_dir, "events", ["user_id", "value"])
        .groupby("user_id")
        .aggregate(Sum("value", alias_name="total"), Count(alias_name="n"))
    )

    def rnd(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": b.column("user_id"),
                "n": b.column("n").cast(pa.int64()),
                "total": np.round(batch_to_numpy(b, "total"), 4),
            }
        )

    return distributed_topk(
        agg.map_batches(rnd, batch_format="pyarrow"),
        [("total", "descending"), ("user_id", "ascending")],
        20,
    )


def q_label_centroid_norms(sf_dir: str):
    """Per-label embedding centroid L2 norm (+ member count): one
    vectorized per-batch (label, dim) partial-sum pass, a
    (label, dim) groupby, and a tiny labels×dims driver rollup —
    the distributed-mean building block of IVF/k-means, oracle-exact."""
    from ..data_ops.ann import _as_matrix

    emb = _read(sf_dir, "embeddings", ["label", "embedding"])

    def partial(b: pa.Table):
        lab = batch_to_numpy(b, "label").astype(np.int64)
        V = _as_matrix(b, "embedding", len(lab))
        ul, inv = np.unique(lab, return_inverse=True)
        sums = np.zeros((len(ul), V.shape[1]))
        np.add.at(sums, inv, V)
        cnt = np.bincount(inv).astype(np.int64)
        dim = V.shape[1]
        D = np.tile(np.arange(dim, dtype=np.int64), len(ul))
        return {
            "label": np.repeat(ul, dim),
            "dim": D,
            "s": sums.ravel(),
            "n": np.where(D == 0, np.repeat(cnt, dim), 0),
        }

    per = (
        emb.map_batches(partial, batch_format="pyarrow")
        .groupby(["label", "dim"])
        .sum(["s", "n"])
        .to_pandas()  # labels × dims rows (≤ thousands)
    )
    out = []
    for lab, g in per.groupby("label"):
        n = int(g["sum(n)"].sum())
        sv = g.sort_values("dim")["sum(s)"].to_numpy()
        out.append((int(lab), n, float(np.round(np.sqrt(np.sum((sv / n) ** 2)), 6))))
    out.sort()
    return pa.table(
        {
            "label": pa.array([r[0] for r in out], pa.int64()),
            "n": pa.array([r[1] for r in out], pa.int64()),
            "centroid_norm": pa.array([r[2] for r in out], pa.float64()),
        }
    )


def q_closeness(sf_dir: str):
    """Closeness centrality from the 8 smallest-id vertices (see
    :func:`llama_ray.algos.traversal.closeness_sampled`)."""
    from ..algos.traversal import closeness_sampled

    return closeness_sampled(_cached_tpch_graph(sf_dir))


def q_harmonic(sf_dir: str):
    """Harmonic centrality from the 8 smallest-id vertices (see
    :func:`llama_ray.algos.traversal.harmonic_sampled`)."""
    from ..algos.traversal import harmonic_sampled

    return harmonic_sampled(_cached_tpch_graph(sf_dir))


def q_eccentricity(sf_dir: str):
    """Sampled eccentricities from the 8 smallest-id vertices (see
    :func:`llama_ray.algos.traversal.eccentricity_sampled`)."""
    from ..algos.traversal import eccentricity_sampled

    return eccentricity_sampled(_cached_tpch_graph(sf_dir))


def q_doc_len_quantiles(sf_dir: str):
    """Exact p50/p90/p99 of document length via the histogram method
    (see :func:`llama_ray.data_ops.text.exact_quantiles`)."""
    from ..data_ops.text import exact_quantiles

    return exact_quantiles(_read(sf_dir, "documents", ["n_chars"]), "n_chars", [0.5, 0.9, 0.99])


def q_events_value_quantiles(sf_dir: str):
    """Exact p50/p90/p99 of the (float, unbounded-cardinality) event
    value via distributed sort + order-statistic block lookup (see
    :func:`llama_ray.data_ops.text.exact_quantiles_sorted`)."""
    from ..data_ops.text import exact_quantiles_sorted

    return exact_quantiles_sorted(
        _read(sf_dir, "events", ["value"]), "value", [0.5, 0.9, 0.99]
    )


def q_tfidf_topk(sf_dir: str):
    """Top-20 corpus-salient tokens by tf·ln(N/df) (see
    :func:`llama_ray.data_ops.text.tfidf_topk`)."""
    from ..data_ops.text import tfidf_topk

    return tfidf_topk(_read(sf_dir, "documents", ["doc_id", "text"]), k=20)


def q_bigram_topk(sf_dir: str):
    """Top-20 word bigrams by exact corpus frequency (see
    :func:`llama_ray.data_ops.text.bigram_topk`)."""
    from ..data_ops.text import bigram_topk

    return bigram_topk(_read(sf_dir, "documents", ["text"]), k=20)


def q_doc_lm_score(sf_dir: str):
    """Corpus-trained bigram LM score per document (the
    perplexity-filter stage; see :func:`llama_ray.data_ops.text.lm_score`
    — count shuffles by sorted run-reduce, model lookup by two
    distributed sort-merge joins, quantized conditionals for bit-exact
    sums)."""
    from ..data_ops.text import lm_score

    return lm_score(_read(sf_dir, "documents", ["doc_id", "text"]))


def q_seq_pack(sf_dir: str, *, seq_len: int = 2048):
    """Concat-and-chop packing manifest over documents (see
    data_ops.packing.pack_sequences: distributed prefix scan, one
    scalar per block on the driver)."""
    from ..data_ops.packing import pack_sequences

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return pack_sequences(docs, seq_len=seq_len)


def q_contamination(sf_dir: str):
    """Benchmark-contamination audit: train docs sharing an 8-gram
    with the held-out test hash split (bench grams broadcast once,
    searchsorted probe per train batch)."""
    from ..data_ops.packing import contamination

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return contamination(docs)


def q_doc_repetition(sf_dir: str):
    """Within-doc duplicate bigram fraction (Gopher-style repetition
    rule) — pure map_batches over the shared n-gram machinery."""
    from ..data_ops.curation import repetition_ratio

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return repetition_ratio(docs, n=2)


def q_doc_scrub(sf_dir: str):
    """PII/denylist redaction over the corpus: Arrow RE2 kernels,
    byte-identical to DuckDB's regexp_replace (both RE2). Patterns =
    the standard PII trio plus a denylist term with corpus signal."""
    from ..data_ops.text import SCRUB_DEMO_PATTERNS, scrub_patterns

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return scrub_patterns(docs, patterns=SCRUB_DEMO_PATTERNS)


def q_doc_fluency(sf_dir: str):
    """Token-typicality (fluency) score: per doc the total corpus
    frequency of its tokens — the statistical-LM stand-in of quality
    filtering; see :func:`llama_ray.data_ops.text.token_fluency`."""
    from ..data_ops.text import token_fluency

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return token_fluency(docs)


def q_doc_dup_spans(sf_dir: str):
    """Cross-document duplicate-span profile (Lee et al. 2022
    substring-dedup signal): per doc, distinct 8-gram count and the
    fraction shared with at least one other doc. Join-free
    total−unique decomposition — see
    :func:`llama_ray.data_ops.curation.duplicate_spans`."""
    from ..data_ops.curation import duplicate_spans

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return duplicate_spans(docs, n=8)


def q_corpus_pipeline(sf_dir: str, *, quality_min: float = 0.5, seq_len: int = 512):
    """End-to-end corpus curation, composed as ONE streaming Ray
    pipeline: exact dedup (survivor FILTER, text rides the hash sort)
    → quality filter (Arrow RE2 features, 6-decimal rounded threshold
    compare so the SQL boundary matches bit-for-bit) → PII/denylist
    scrub → sequence packing. Returns the one-row audit summary
    (doc counts at each stage, total redactions, packed sequences) —
    the numbers a data-curation run reports."""
    from ..data_ops.dedup import dedup_survivors
    from ..data_ops.packing import pack_sequences
    from ..data_ops.text import SCRUB_DEMO_PATTERNS, QualityScore, scrub_patterns

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    n_docs = docs.count()
    surv = dedup_survivors(docs).materialize()
    n_unique = surv.count()

    def qual_filter(batch: pa.Table) -> pa.Table:
        scored = QualityScore()(batch)
        q = np.round(
            scored.column("quality").to_numpy(zero_copy_only=False), 6
        )
        return batch.filter(pa.array(q >= quality_min))

    kept = surv.map_batches(qual_filter, batch_format="pyarrow")
    scrubbed = scrub_patterns(kept, patterns=SCRUB_DEMO_PATTERNS).materialize()
    n_quality = scrubbed.count()
    n_red = int(
        scrubbed.aggregate(Sum("n_redactions", alias_name="s"))["s"] or 0
    )
    n_seqs = pack_sequences(
        scrubbed.select_columns(["doc_id", "text"]), seq_len=seq_len
    ).count()
    return pa.table(
        {
            "n_docs": pa.array([n_docs], pa.int64()),
            "n_unique": pa.array([n_unique], pa.int64()),
            "n_quality": pa.array([n_quality], pa.int64()),
            "n_redactions": pa.array([n_red], pa.int64()),
            "n_seqs": pa.array([n_seqs], pa.int64()),
        }
    )


def q_bpe_merges(sf_dir: str, *, num_merges: int = 3):
    """First ``num_merges`` byte-level BPE merges learned from the
    corpus word-frequency table (tokenizer induction —
    :func:`llama_ray.data_ops.text.bpe_merges`); symbols reported as
    uppercase hex byte strings so DuckDB's `hex()` oracle compares
    byte-exactly."""
    from ..data_ops.text import bpe_merges

    docs = _read(sf_dir, "documents", ["text"])
    return bpe_merges(docs, num_merges=num_merges)


def q_doc_chunks(sf_dir: str, *, size: int = 200, stride: int = 150):
    """Sliding-window chunking of every document (RAG prep) —
    :func:`llama_ray.data_ops.curation.chunk_documents`."""
    from ..data_ops.curation import chunk_documents

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return chunk_documents(docs, size=size, stride=stride)


def q_keyword_search(sf_dir: str, *, terms: tuple = ("merge", "join")):
    """Exact conjunctive keyword search through the distributed
    inverted index (:class:`llama_ray.data_ops.text.InvertedIndex`):
    postings built by one token range sort, term probes touch only the
    covering blocks."""
    from ..data_ops.text import InvertedIndex

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    idx = InvertedIndex(docs)
    hits = idx.search(list(terms), mode="and")
    return pa.table({"doc_id": pa.array(hits, pa.int64())})


def q_group_sample(sf_dir: str, *, k: int = 5):
    """Deterministic uniform k-per-group sample — the distributed
    reservoir: rank docs within each source by
    splitmix64(doc_id·GOLD ⊕ seed) (shifted into non-negative int64)
    and keep the k smallest, an exact uniform k-subset per group,
    independent of layout; same one-sort + boundary-pass machinery
    as the per-source document cap."""
    from ..data_ops.curation import topk_per_group
    from ..data_ops.dedup import _GOLD, _mix64

    seed = 424242
    docs = _read(sf_dir, "documents", ["doc_id", "source"])

    def hcol(b: pa.Table):
        ids = batch_to_numpy(b, "doc_id")
        h = _mix64(ids.astype(np.uint64) * _GOLD ^ np.uint64(seed))
        return {
            "doc_id": ids,
            "source": b.column("source"),
            "h": (h >> np.uint64(2)).astype(np.int64),
        }

    ds = docs.map_batches(hcol, batch_format="pyarrow")
    out = topk_per_group(
        ds,
        group_col="source",
        order_cols=["h", "doc_id"],
        descending=[False, False],
        k=k,
    )
    return out.select_columns(["source", "doc_id", "rank"])


def q_source_cap(sf_dir: str, *, k: int = 10):
    """Per-source document cap: keep the top-10 docs per source by
    (n_chars desc, doc_id asc) — distributed sort + per-block run
    ranking with a driver boundary pass."""
    from ..data_ops.curation import topk_per_group

    docs = _read(sf_dir, "documents", ["doc_id", "source", "n_chars"])
    return topk_per_group(
        docs,
        group_col="source",
        order_cols=["n_chars", "doc_id"],
        descending=[True, False],
        k=k,
    ).select_columns(["source", "doc_id", "n_chars", "rank"])


def q_lang_mix(sf_dir: str):
    """Deterministic language rebalancing summary: every language
    downsampled toward the smallest one by an integer hash
    threshold."""
    from ..data_ops.curation import lang_mix_sample

    docs = _read(sf_dir, "documents", ["doc_id", "lang"])
    return lang_mix_sample(docs)


def q_events_retention(sf_dir: str):
    """Day-over-day retention cohort: per day, active users and how
    many return the next day. Distinct (user, day) pairs via one
    groupby shuffle; adjacency (day+1 present for the same user)
    resolved with the usual range-sort + per-block runs + boundary
    driver pass; the per-day join is a bounded driver merge (the day
    domain is tiny next to the event count)."""
    ev = _read(sf_dir, "events", ["user_id", "ts"])

    def prep(b: pa.Table):
        t = (
            b.column("ts")
            .cast(pa.timestamp("us"))
            .cast(pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        return {"user_id": batch_to_numpy(b, "user_id"), "day": t // 86_400_000_000}

    pairs = (
        ev.map_batches(prep, batch_format="pyarrow")
        .groupby(["user_id", "day"])
        .count()
        .select_columns(["user_id", "day"])
        .materialize()
    )
    active = pairs.groupby("day").count().to_pandas()  # bounded: one row/day

    def retained_of(u: np.ndarray, d: np.ndarray):
        nxt = (u[1:] == u[:-1]) & (d[1:] == d[:-1] + 1)
        return {"day": d[:-1][nxt], "n": np.ones(int(nxt.sum()), np.int64)}

    srt = pairs.sort(["user_id", "day"]).materialize()

    def interior(b: pa.Table):
        u = batch_to_numpy(b, "user_id")
        empty = {"day": np.empty(0, np.int64), "n": np.empty(0, np.int64)}
        if len(u) < 2:
            return empty
        d = batch_to_numpy(b, "day")
        inner = (u != u[0]) & (u != u[-1])
        if not inner.any():
            return empty
        return retained_of(u[inner], d[inner])

    from ..common import collect_boundary_runs

    ret = srt.map_batches(interior, batch_format="pyarrow", batch_size=None)
    btbl = collect_boundary_runs(srt, "user_id", where="retention")
    if btbl is not None:
        extra = retained_of(batch_to_numpy(btbl, "user_id"), batch_to_numpy(btbl, "day"))
        ret = ret.union(rd.from_arrow(pa.table({k: pa.array(v) for k, v in extra.items()})))
    retained = ret.groupby("day").sum("n").to_pandas()
    out = active.rename(columns={"count()": "n_active"}).merge(
        retained.rename(columns={"sum(n)": "n_retained_next"}), on="day", how="left"
    )
    out["n_retained_next"] = out["n_retained_next"].fillna(0).astype(np.int64)
    out["retention"] = (out["n_retained_next"] / out["n_active"]).round(6)
    return out[["day", "n_active", "n_retained_next", "retention"]]


def q_events_user_hll(sf_dir: str, *, seed: int = 20260818):
    """Approximate distinct users per event_type via HyperLogLog (64
    registers, the HyperANF register family): per-batch (type, bucket)
    rho maxima -> tiny groupby max shuffle (|types|x64 rows per block)
    -> driver estimate. The mergeable-sketch shape is the 100-TB way
    to count distincts: register partials are O(types x 64) regardless
    of row count, and the merge is an idempotent elementwise max."""
    from ..algos.hyperanf import ALPHA_64, M, _bit_length_u64
    from ..data_ops.dedup import _GOLD, _mix64

    ev = _read(sf_dir, "events", ["event_type", "user_id"])

    def partial(b: pa.Table):
        et = b.column("event_type").combine_chunks().to_numpy(zero_copy_only=False)
        u = batch_to_numpy(b, "user_id").astype(np.uint64)
        h = _mix64(u * _GOLD ^ np.uint64(seed))
        bucket = (h >> np.uint64(58)).astype(np.int64)
        rho = 59 - _bit_length_u64(h & np.uint64((1 << 58) - 1))
        types, inv = np.unique(et, return_inverse=True)
        mx = np.zeros(len(types) * M, np.int64)
        np.maximum.at(mx, inv * M + bucket, rho)
        return {
            "event_type": np.repeat(types, M),
            "reg": np.tile(np.arange(M, dtype=np.int64), len(types)),
            "val": mx,
        }

    regs = (
        ev.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "reg"])
        .max("val")
        .to_pandas()  # bounded: |event types| x 64 rows
    )
    out = []
    for et, grp in regs.groupby("event_type"):
        R = np.zeros(M, np.int64)
        R[grp["reg"].to_numpy()] = grp["max(val)"].to_numpy()
        est = ALPHA_64 * M * M / np.sum(np.exp2(-R.astype(np.float64)))
        zeros = int(np.sum(R == 0))
        if est <= 2.5 * M and zeros > 0:
            est = M * np.log(M / zeros)
        out.append((et, round(float(est), 4)))
    out.sort()
    return pa.table(
        {
            "event_type": pa.array([t for t, _ in out]),
            "hll_distinct": pa.array([v for _, v in out], pa.float64()),
        }
    )


# ----------------------------------------------------- relational joins


def q_orders_customers(sf_dir: str):
    """Fact⋈dimension equi-join (orders × customer on custkey) via the
    engine's distributed sort-merge join — ONE range sort of the
    side-tagged union, block-local run expansion, bounded boundary
    pass.  The generic join shape Ray Data lacks natively."""
    from ..data_ops.relational import sort_merge_join

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_name", "c_mktsegment"])
    out = sort_merge_join(
        orders, cust, left_on="o_custkey", right_on="c_custkey", how="inner"
    )
    return out.select_columns(["o_orderkey", "o_totalprice", "c_name", "c_mktsegment"])


def q_events_asof_view(sf_dir: str):
    """As-of join: every purchase event picks the same user's latest
    view event at or before it (ties → largest view event id), DuckDB
    ``ASOF JOIN`` semantics made deterministic.  Unmatched purchases
    report view_event_id = -1 / view_value = 0 (the driver hash treats
    NaN ≠ NaN, so nulls are filled on both sides)."""
    from ..data_ops.relational import asof_join

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type", "value"])

    def prep_probe(b: pa.Table) -> pa.Table:
        t = b.filter(pc.equal(b.column("event_type"), "purchase"))
        return pa.table(
            {
                "event_id": t.column("event_id"),
                "user_id": t.column("user_id"),
                "ts_u": t.column("ts").cast(pa.timestamp("us")).cast(pa.int64()),
            }
        )

    def prep_ref(b: pa.Table) -> pa.Table:
        t = b.filter(pc.equal(b.column("event_type"), "view"))
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "ts_u": t.column("ts").cast(pa.timestamp("us")).cast(pa.int64()),
                "view_event_id": t.column("event_id"),
                "view_value": t.column("value"),
            }
        )

    joined = asof_join(
        ev.map_batches(prep_probe, batch_format="pyarrow"),
        ev.map_batches(prep_ref, batch_format="pyarrow"),
        by="user_id",
        ts_col="ts_u",
        tie_col="view_event_id",
        value_cols=["view_event_id", "view_value"],
        out_prefix="asof_",
    )

    def finish(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": b.column("event_id"),
                "user_id": b.column("user_id"),
                "ts_u": b.column("ts_u"),
                "view_event_id": b.column("asof_view_event_id")
                .fill_null(-1)
                .cast(pa.int64()),
                "view_value": b.column("asof_view_value")
                .fill_null(0.0)
                .cast(pa.float64()),
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow")


def q_events_next_view(sf_dir: str):
    """Forward as-of join (re-engagement analysis): every purchase
    picks the same user's EARLIEST view at or after it (ties → largest
    view event id); unmatched → -1 / 0.  The backward as-of's carry
    machinery reused over negated timestamps
    (``relational.asof_join_forward``)."""
    from ..data_ops.relational import asof_join_forward

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type", "value"])

    def prep_probe(b: pa.Table) -> pa.Table:
        t = b.filter(pc.equal(b.column("event_type"), "purchase"))
        return pa.table(
            {
                "event_id": t.column("event_id"),
                "user_id": t.column("user_id"),
                "ts_u": t.column("ts").cast(pa.timestamp("us")).cast(pa.int64()),
            }
        )

    def prep_ref(b: pa.Table) -> pa.Table:
        t = b.filter(pc.equal(b.column("event_type"), "view"))
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "ts_u": t.column("ts").cast(pa.timestamp("us")).cast(pa.int64()),
                "view_event_id": t.column("event_id"),
                "view_value": t.column("value"),
            }
        )

    joined = asof_join_forward(
        ev.map_batches(prep_probe, batch_format="pyarrow"),
        ev.map_batches(prep_ref, batch_format="pyarrow"),
        by="user_id",
        ts_col="ts_u",
        tie_col="view_event_id",
        value_cols=["view_event_id", "view_value"],
        out_prefix="next_",
    )

    def finish(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": b.column("event_id"),
                "user_id": b.column("user_id"),
                "ts_u": b.column("ts_u"),
                "view_event_id": b.column("next_view_event_id")
                .fill_null(-1)
                .cast(pa.int64()),
                "view_value": b.column("next_view_value")
                .fill_null(0.0)
                .cast(pa.float64()),
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow")


def q_events_attribution(sf_dir: str, *, window_us: int = 3_600_000_000):
    """Marketing-style attribution: a purchase is attributed to the
    same user's latest view within the trailing hour (the as-of match
    filtered by staleness), else organic.  Output: attributed vs
    organic counts + attributed value (micro-units)."""
    from ..data_ops.relational import asof_join

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type", "value"])

    def prep_probe(b: pa.Table) -> pa.Table:
        t = b.filter(pc.equal(b.column("event_type"), "purchase"))
        v = batch_to_numpy(t, "value")
        return pa.table(
            {
                "event_id": t.column("event_id"),
                "user_id": t.column("user_id"),
                "ts_u": t.column("ts").cast(pa.timestamp("us")).cast(pa.int64()),
                "val_u": np.floor(v * 1e6 + 0.5).astype(np.int64),
            }
        )

    def prep_ref(b: pa.Table) -> pa.Table:
        t = b.filter(pc.equal(b.column("event_type"), "view"))
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "ts_u": t.column("ts").cast(pa.timestamp("us")).cast(pa.int64()),
                "view_ts": t.column("ts").cast(pa.timestamp("us")).cast(pa.int64()),
                "view_id": t.column("event_id"),
            }
        )

    joined = asof_join(
        ev.map_batches(prep_probe, batch_format="pyarrow"),
        ev.map_batches(prep_ref, batch_format="pyarrow"),
        by="user_id",
        ts_col="ts_u",
        tie_col="view_id",
        value_cols=["view_id", "view_ts"],
        out_prefix="a_",
    )

    def partial(b: pa.Table) -> dict:
        ts = batch_to_numpy(b, "ts_u")
        val = batch_to_numpy(b, "val_u")
        vts = b.column("a_view_ts").fill_null(-(1 << 62)).to_numpy(zero_copy_only=False)
        attributed = (ts - vts) <= window_us
        return {
            "n_attributed": np.array([int(attributed.sum())], np.int64),
            "n_organic": np.array([int((~attributed).sum())], np.int64),
            "attributed_value_u": np.array([int(val[attributed].sum())], np.int64),
        }

    parts = joined.map_batches(partial, batch_format="pyarrow").to_pandas()
    return pa.table(
        {
            "n_attributed": pa.array([int(parts["n_attributed"].sum())], pa.int64()),
            "n_organic": pa.array([int(parts["n_organic"].sum())], pa.int64()),
            "attributed_value_u": pa.array(
                [int(parts["attributed_value_u"].sum())], pa.int64()
            ),
        }
    )


def q_cust_region_rollup(sf_dir: str):
    """Customer rollup per region name: the two tiny dimension tables
    (nation ⋈ region, ≤25 rows) compose into ONE broadcast lookup that
    every customer batch probes with a vectorized searchsorted — the
    small-side join done without any shuffle of the fact table.  Sum
    rounded to 4 decimals (the engine's float-sum hash convention)."""
    from ..data_ops.relational import broadcast_join

    nation = pq.read_table(
        os.path.join(sf_dir, "nation.parquet"), columns=["n_nationkey", "n_regionkey"]
    )
    region = pq.read_table(
        os.path.join(sf_dir, "region.parquet"), columns=["r_regionkey", "r_name"]
    )
    rkeys = region.column("r_regionkey").to_numpy()
    order = np.argsort(rkeys)
    rnames = region.column("r_name").take(pa.array(order))
    pos = np.searchsorted(rkeys[order], nation.column("n_regionkey").to_numpy())
    lookup = pa.table(
        {
            "c_nationkey": nation.column("n_nationkey"),
            "r_name": rnames.take(pa.array(pos)),
        }
    )
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey", "c_acctbal"])
    enriched = broadcast_join(cust, lookup, on="c_nationkey")
    agg = enriched.groupby("r_name").aggregate(
        Count(alias_name="n_cust"), Sum("c_acctbal", alias_name="sum_acctbal")
    )

    def rnd(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "r_name": b.column("r_name"),
                "n_cust": b.column("n_cust").cast(pa.int64()),
                "sum_acctbal": np.round(batch_to_numpy(b, "sum_acctbal"), 4),
            }
        )

    return agg.map_batches(rnd, batch_format="pyarrow")


def q_events_running_total(sf_dir: str):
    """Partitioned window functions over the event stream: per user in
    (ts, event_id) order, running value total + previous value (LAG) +
    row number — ``SUM/LAG/ROW_NUMBER() OVER (PARTITION BY user_id
    ORDER BY ts, event_id)`` in ONE distributed prefix-scan pass.
    Values are quantized to integer micro-units (floor(v·10⁶+½), the
    engine's vec_kmeans convention) so the running sum is bit-exact in
    any block layout and in SQL; LAG null → -1 (values are ≥ 0)."""
    from ..data_ops.relational import running_window

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def prep(b: pa.Table) -> pa.Table:
        v = batch_to_numpy(b, "value")
        return pa.table(
            {
                "event_id": b.column("event_id"),
                "user_id": b.column("user_id"),
                "ts_u": b.column("ts").cast(pa.timestamp("us")).cast(pa.int64()),
                "val_u": np.floor(v * 1e6 + 0.5).astype(np.int64),
            }
        )

    win = running_window(
        ev.map_batches(prep, batch_format="pyarrow"),
        by="user_id",
        order_cols=["ts_u", "event_id"],
        val_col="val_u",
        out_sum="run_total_u",
        out_lag="prev_u",
        out_rn="rn",
    )

    def finish(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": b.column("event_id"),
                "user_id": b.column("user_id"),
                "ts_u": b.column("ts_u"),
                "rn": b.column("rn"),
                "run_total_u": b.column("run_total_u"),
                "prev_u": b.column("prev_u").fill_null(-1),
            }
        )

    return win.map_batches(finish, batch_format="pyarrow")


def q_events_promo_windows(sf_dir: str, *, k: int = 50, window_us: int = 1_800_000_000):
    """Range join: the 50 highest-value events anchor 30-minute
    "incident windows" [ts, ts+30min); every event whose ts falls in a
    window attributes to that anchor (overlapping windows each match —
    a point under two windows counts twice, the honest range-join
    semantics).  Per anchor: covered-event count + total value.

    The anchor side is tiny → ``interval_join`` broadcasts a staircase
    CSR index built once; the event stream is probed with one
    searchsorted per batch and never shuffled.  Values quantized to
    integer micro-units before any sum (bit-exact in every layout);
    anchors ranked by (val_u desc, event_id) so ties are deterministic."""
    from ..common import distributed_topk
    from ..data_ops.relational import interval_join

    ev = _read(sf_dir, "events", ["event_id", "ts", "value"])

    def prep(b: pa.Table) -> pa.Table:
        v = batch_to_numpy(b, "value")
        return pa.table(
            {
                "event_id": b.column("event_id"),
                "ts_u": b.column("ts").cast(pa.timestamp("us")).cast(pa.int64()),
                "val_u": np.floor(v * 1e6 + 0.5).astype(np.int64),
            }
        )

    t = ev.map_batches(prep, batch_format="pyarrow").materialize()
    top = distributed_topk(
        t, [("val_u", "descending"), ("event_id", "ascending")], k
    )
    anchors = pa.concat_tables(
        [b for b in top.iter_batches(batch_format="pyarrow")]
    )
    s = anchors.column("ts_u").combine_chunks().to_numpy(zero_copy_only=False)
    intervals = pa.table(
        {
            "anchor_id": anchors.column("event_id"),
            "w_start": pa.array(s),
            "w_end": pa.array(s + window_us),
        }
    )
    joined = interval_join(
        t, intervals, on="ts_u", start_col="w_start", end_col="w_end",
        value_cols=["anchor_id"],
    )

    def partial(b: pa.Table) -> dict:
        a = batch_to_numpy(b, "anchor_id")
        v = batch_to_numpy(b, "val_u")
        u, inv = np.unique(a, return_inverse=True)
        acc = np.zeros(len(u), np.int64)
        np.add.at(acc, inv, v)
        return {
            "anchor_id": u,
            "n_events": np.bincount(inv).astype(np.int64),
            "value_u": acc,
        }

    agg = (
        joined.map_batches(partial, batch_format="pyarrow")
        .groupby("anchor_id")
        .aggregate(Sum("n_events", alias_name="n_events"), Sum("value_u", alias_name="value_u"))
    )

    def finish(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "anchor_id": b.column("anchor_id").cast(pa.int64()),
                "n_events": b.column("n_events").cast(pa.int64()),
                "value_u": b.column("value_u").cast(pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def q_events_sliding_window(sf_dir: str, *, window_us: int = 21_600_000_000):
    """Time-windowed aggregate: per event, the count and value total of
    the same user's events in the trailing 6 hours — ``COUNT/SUM(val)
    OVER (PARTITION BY user_id ORDER BY ts RANGE BETWEEN 6h PRECEDING
    AND CURRENT ROW)`` as ONE distributed pass (range sort + vectorized
    per-block windowed scan + bounded backward/forward carries; see
    ``data_ops.relational.sliding_window_agg``).  Values quantized to
    integer micro-units so sums are bit-exact in any block layout."""
    from ..data_ops.relational import sliding_window_agg

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def prep(b: pa.Table) -> pa.Table:
        v = batch_to_numpy(b, "value")
        return pa.table(
            {
                "event_id": b.column("event_id"),
                "user_id": b.column("user_id"),
                "ts_u": b.column("ts").cast(pa.timestamp("us")).cast(pa.int64()),
                "val_u": np.floor(v * 1e6 + 0.5).astype(np.int64),
            }
        )

    win = sliding_window_agg(
        ev.map_batches(prep, batch_format="pyarrow"),
        by="user_id",
        ts_col="ts_u",
        val_col="val_u",
        window=window_us,
        tie_col="event_id",
        out_cnt="w_cnt",
        out_sum="w_sum_u",
    )

    def finish(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": b.column("event_id"),
                "user_id": b.column("user_id"),
                "ts_u": b.column("ts_u"),
                "w_cnt": b.column("w_cnt"),
                "w_sum_u": b.column("w_sum_u"),
            }
        )

    return win.map_batches(finish, batch_format="pyarrow")


def q_events_ntile(sf_dir: str, *, k: int = 4):
    """Global quantile bucketing: NTILE(4) of every event by value
    under the deterministic (val_u, event_id) total order — one
    distributed sort, per-block rank offsets chained on the driver
    (see ``data_ops.relational.ntile``)."""
    from ..data_ops.relational import ntile

    ev = _read(sf_dir, "events", ["event_id", "value"])

    def prep(b: pa.Table) -> pa.Table:
        v = batch_to_numpy(b, "value")
        return pa.table(
            {
                "event_id": b.column("event_id"),
                "val_u": np.floor(v * 1e6 + 0.5).astype(np.int64),
            }
        )

    return ntile(
        ev.map_batches(prep, batch_format="pyarrow"),
        order_cols=["val_u", "event_id"],
        k=k,
        out_col="bucket",
    )


def q_revenue_by_nation(sf_dir: str):
    """Multi-join relational pipeline (TPC-H Q5 shape): revenue per
    customer nation = lineitem ⋈ orders (fact-fact, the distributed
    sort-merge join) + customer/nation dimensions composed into ONE
    broadcast lookup, then a 25-key rollup done as per-batch bincount
    partials (≤|nations| rows leave each batch).

    Bit-exact in any layout: per-row revenue l_extendedprice·(1−l_discount)
    is one IEEE double product (deterministic), floor-quantized to
    integer micro-units before any summation."""
    from ..data_ops.relational import broadcast_join, sort_merge_join

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])

    def rev(b: pa.Table) -> pa.Table:
        p = batch_to_numpy(b, "l_extendedprice")
        d = batch_to_numpy(b, "l_discount")
        return pa.table(
            {
                "l_orderkey": b.column("l_orderkey"),
                "rev_u": np.floor(p * (1.0 - d) * 1e6 + 0.5).astype(np.int64),
            }
        )

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    joined = sort_merge_join(
        li.map_batches(rev, batch_format="pyarrow"),
        orders,
        left_on="l_orderkey",
        right_on="o_orderkey",
        how="inner",
    )

    # composed dimension lookup: custkey → nationkey (nation names are
    # attached to the ≤|nations|-row result at the end, driver-side)
    cust = pq.read_table(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey", "c_nationkey"]
    )
    lookup = pa.table(
        {
            "o_custkey": cust.column("c_custkey"),
            "nk": cust.column("c_nationkey").cast(pa.int64()),
        }
    )
    enriched = broadcast_join(joined, lookup, on="o_custkey")

    def partial(b: pa.Table) -> dict:
        nk = batch_to_numpy(b, "nk")
        rv = batch_to_numpy(b, "rev_u")
        cnt = np.bincount(nk)
        nz = np.flatnonzero(cnt)
        # int64 scatter-add (bincount's float weights would round above
        # 2^53; revenue partials must stay integer-exact)
        acc = np.zeros(len(cnt), np.int64)
        np.add.at(acc, nk, rv)
        return {
            "nk": nz.astype(np.int64),
            "n_items": cnt[nz].astype(np.int64),
            "revenue_u": acc[nz],
        }

    agg = (
        enriched.map_batches(partial, batch_format="pyarrow")
        .groupby("nk")
        .aggregate(Sum("n_items", alias_name="n_items"), Sum("revenue_u", alias_name="revenue_u"))
        .to_pandas()  # bounded: one row per nation
    )
    nation = pq.read_table(
        os.path.join(sf_dir, "nation.parquet"), columns=["n_nationkey", "n_name"]
    ).to_pandas()
    out = agg.merge(
        nation.rename(columns={"n_nationkey": "nk"}), on="nk", how="inner"
    )
    return pa.table(
        {
            "n_name": out["n_name"].to_numpy(),
            "n_items": out["n_items"].to_numpy().astype(np.int64),
            "revenue_u": out["revenue_u"].to_numpy().astype(np.int64),
        }
    )


def q_bigram_pmi(sf_dir: str):
    """Collocation mining: top-50 adjacent word pairs by PMI over
    exact corpus counts (bigrams seen ≥5 times; see
    ``data_ops.text.bigram_pmi``)."""
    from ..data_ops.text import bigram_pmi

    docs = _read(sf_dir, "documents", ["text"])
    return bigram_pmi(docs, k=50, min_count=5)


def q_vocab_edit_pairs(sf_dir: str):
    """String-similarity self-join: all distinct vocabulary token
    pairs within Levenshtein distance 2 (SymSpell depth-2
    deletion-neighborhood join — typo/variant mining; see
    ``data_ops.text.edit_distance_pairs``)."""
    from ..data_ops.text import edit_distance_pairs

    docs = _read(sf_dir, "documents", ["text"])
    res = edit_distance_pairs(docs, min_len=2, max_distance=2).materialize()
    if res.count() == 0:  # keep the schema on an empty result
        return pa.table(
            {"tok_a": pa.array([], pa.string()), "tok_b": pa.array([], pa.string())}
        )
    return res


_PIVOT_LANGS = ["de", "en", "es", "fr", "zh"]


def q_source_lang_pivot(sf_dir: str):
    """PIVOT: documents per (source × language) as one wide row per
    source (n_de … n_zh + n_other + n_total).  Distributed work = the
    (source, lang) base count (one small groupby over per-batch
    partials); the pivot itself is conditional aggregation over that
    ≤|sources|·|langs| base — never a second pass over the corpus."""
    docs = _read(sf_dir, "documents", ["source", "lang"])

    def partial(b: pa.Table) -> dict:
        t = pa.table({"source": b.column("source"), "lang": b.column("lang")})
        k = t.group_by(["source", "lang"]).aggregate([("lang", "count")])
        return {
            "source": k.column("source").to_numpy(zero_copy_only=False),
            "lang": k.column("lang").to_numpy(zero_copy_only=False),
            "n": k.column("lang_count").cast(pa.int64()).to_numpy(zero_copy_only=False),
        }

    base = (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby(["source", "lang"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    base["n"] = base["n"].astype(np.int64)
    rows = []
    for src, grp in base.groupby("source"):
        counts = dict(zip(grp["lang"], grp["n"]))
        known = {lg: int(counts.get(lg, 0)) for lg in _PIVOT_LANGS}
        total = int(grp["n"].sum())
        rows.append(
            {
                "source": src,
                **{f"n_{lg}": v for lg, v in known.items()},
                "n_other": total - sum(known.values()),
                "n_total": total,
            }
        )
    return pd.DataFrame(rows)


def q_source_quality_rollup(sf_dir: str):
    """Composition: the Gopher composite filter joined back to each
    document's source — per source the doc count, kept count, and the
    OR of all failure reasons seen (which rules fire where).  The
    filter result (integers) rides a per-batch partial rollup; source
    arrives by zipping the same pruned read (doc_id → source is a
    broadcast-sized lookup at ≤|docs| rows? no — it is joined
    distributed via the sort-merge join on doc_id)."""
    from ..data_ops.curation import gopher_filter
    from ..data_ops.relational import sort_merge_join

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    flt = gopher_filter(docs)
    src = _read(sf_dir, "documents", ["doc_id", "source"])
    joined = sort_merge_join(flt, src, left_on="doc_id", how="inner")

    def partial(b: pa.Table) -> dict:
        t = pa.table(
            {
                "source": b.column("source"),
                "keep": b.column("keep"),
                "reason_mask": b.column("reason_mask"),
            }
        )
        s = t.column("source").to_numpy(zero_copy_only=False)
        u, inv = np.unique(s, return_inverse=True)
        keep = batch_to_numpy(t, "keep")
        rm = batch_to_numpy(t, "reason_mask")
        n = np.bincount(inv)
        kept = np.zeros(len(u), np.int64)
        np.add.at(kept, inv, keep)
        msk = np.zeros(len(u), np.int64)
        np.bitwise_or.at(msk, inv, rm)
        return {"source": u, "n_docs": n.astype(np.int64), "n_kept": kept, "mask": msk}

    # one distributed pass; the ≤|sources|·|blocks| partial rows fold
    # on the driver (sum + bitwise OR are both commutative → exact)
    parts = joined.map_batches(partial, batch_format="pyarrow").to_pandas()
    g = parts.groupby("source", as_index=False).agg(
        n_docs=("n_docs", "sum"), n_kept=("n_kept", "sum")
    )
    orred = (
        parts.groupby("source")["mask"]
        .apply(lambda x: int(np.bitwise_or.reduce(x.to_numpy())))
        .reset_index()
        .rename(columns={"mask": "reasons_seen"})
    )
    out = g.merge(orred, on="source")
    out["n_docs"] = out["n_docs"].astype(np.int64)
    out["n_kept"] = out["n_kept"].astype(np.int64)
    out["reasons_seen"] = out["reasons_seen"].astype(np.int64)
    return out[["source", "n_docs", "n_kept", "reasons_seen"]]


def q_corpus_select(sf_dir: str, *, k: int = 10):
    """Greedy maximum-coverage corpus selection: 10 documents chosen
    one at a time, each maximizing newly covered word-3-gram hashes
    (the (1−1/e) submodular data-selection stage; see
    ``data_ops.curation.greedy_coverage_select``)."""
    from ..data_ops.curation import greedy_coverage_select

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return greedy_coverage_select(docs, k=k, n=3)


def q_contamination_bloom(sf_dir: str):
    """Bloom-filter contamination audit: the bench split folded into a
    fixed 2²⁰-bit filter (4 splitmix64 probes/gram), train grams with
    all probes set flagged as maybe-contaminated — the constant-size-
    broadcast variant of `contamination`, deterministic in any layout
    (see ``data_ops.packing.contamination_bloom``)."""
    from ..data_ops.packing import contamination_bloom

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return contamination_bloom(docs)


def q_doc_gopher_filter(sf_dir: str):
    """Composite Gopher/C4-style quality filter: per doc the 5-rule
    reason bitmask (word count, mean word length, stop-word floor,
    symbol ratio, 2-gram repetition) and keep flag — all-integer rules,
    one map_batches pass (see ``data_ops.curation.gopher_filter``)."""
    from ..data_ops.curation import gopher_filter

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return gopher_filter(docs)


def q_source_overlap(sf_dir: str):
    """Pairwise source n-gram overlap matrix (corpus leakage / fork
    detection): shared distinct word-3-gram hashes + Jaccard per source
    pair, df-windowed stop-gram removal — one gram-table sort, one
    shared pair/count sort-reduce, O(#sources²) driver-adjacent rows."""
    from ..data_ops.curation import source_overlap

    docs = _read(sf_dir, "documents", ["source", "text"])
    return source_overlap(docs, n=3, max_df=64, min_shared=1)


def q_top_unshipped(sf_dir: str, *, k: int = 10, cutoff: str = "1998-07-01"):
    """TPC-H Q3 shape: the k highest-revenue orders placed before the
    cutoff by BUILDING-segment customers, over lineitems shipped after
    it.  Three distributed primitives compose: orders semi-join the
    segment's customers (existence only — customer payload never rides
    the sort), lineitem ⋈ orders through the fact sort-merge join, and
    the per-order rollup is a composite-key groupby followed by the
    exact partial top-k merge.  Revenue floor-quantized to micro-units
    per row (bit-exact in every layout); ties → smaller orderkey."""
    from ..common import distributed_topk
    from ..data_ops.relational import sort_merge_join

    cut = np.datetime64(cutoff, "us").astype(np.int64)
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])

    def bkeys(b: pa.Table) -> pa.Table:
        t = b.filter(pc.equal(b.column("c_mktsegment"), "BUILDING"))
        return pa.table({"c_custkey": t.column("c_custkey")})

    orders = _read(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"]
    )

    def oprep(b: pa.Table) -> pa.Table:
        d = b.column("o_orderdate").cast(pa.timestamp("us")).cast(pa.int64())
        t = b.append_column("o_date_u", d)
        return t.filter(pc.less(t.column("o_date_u"), cut)).drop_columns(
            ["o_orderdate"]
        )

    open_orders = sort_merge_join(
        orders.map_batches(oprep, batch_format="pyarrow"),
        cust.map_batches(bkeys, batch_format="pyarrow"),
        left_on="o_custkey",
        right_on="c_custkey",
        how="semi",
    )

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"])

    def lprep(b: pa.Table) -> pa.Table:
        s = b.column("l_shipdate").cast(pa.timestamp("us")).cast(pa.int64())
        t = b.filter(pc.greater(s, cut))
        p = batch_to_numpy(t, "l_extendedprice")
        d = batch_to_numpy(t, "l_discount")
        return pa.table(
            {
                "l_orderkey": t.column("l_orderkey"),
                "rev_u": np.floor(p * (1.0 - d) * 1e6 + 0.5).astype(np.int64),
            }
        )

    joined = sort_merge_join(
        li.map_batches(lprep, batch_format="pyarrow"),
        open_orders.select_columns(["o_orderkey", "o_date_u", "o_orderpriority"]),
        left_on="l_orderkey",
        right_on="o_orderkey",
        how="inner",
    )
    agg = joined.groupby(["l_orderkey", "o_date_u", "o_orderpriority"]).aggregate(
        Sum("rev_u", alias_name="revenue_u")
    )
    top = distributed_topk(
        agg, [("revenue_u", "descending"), ("l_orderkey", "ascending")], k
    )

    def fin(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_orderkey": b.column("l_orderkey").cast(pa.int64()),
                "revenue_u": b.column("revenue_u").cast(pa.int64()),
                "o_date_u": b.column("o_date_u").cast(pa.int64()),
                "o_orderpriority": b.column("o_orderpriority"),
            }
        )

    return top.map_batches(fin, batch_format="pyarrow", batch_size=None)


def q_forecast_revenue(sf_dir: str, *, year: int = 1997):
    """TPC-H Q6 shape: potential revenue increase from discount
    removal — SUM(extendedprice·discount) over lineitems shipped in
    ``year`` with discount in [0.05, 0.07] and quantity < 24.  Pure
    filter + per-batch integer partial (per-row IEEE product floor-
    quantized to micro-units before any sum); one scalar per block to
    the driver."""
    lo = np.datetime64(f"{year}-01-01", "us").astype(np.int64)
    hi = np.datetime64(f"{year + 1}-01-01", "us").astype(np.int64)
    li = _read(
        sf_dir, "lineitem", ["l_extendedprice", "l_discount", "l_quantity", "l_shipdate"]
    )

    def partial(b: pa.Table) -> dict:
        s = b.column("l_shipdate").cast(pa.timestamp("us")).cast(pa.int64())
        sd = s.to_numpy(zero_copy_only=False)
        p = batch_to_numpy(b, "l_extendedprice")
        d = batch_to_numpy(b, "l_discount")
        q = batch_to_numpy(b, "l_quantity")
        keep = (sd >= lo) & (sd < hi) & (d >= 0.05) & (d <= 0.07) & (q < 24)
        rev = np.floor(p[keep] * d[keep] * 1e6 + 0.5).astype(np.int64)
        return {
            "revenue_u": np.array([rev.sum()], np.int64),
            "n_items": np.array([int(keep.sum())], np.int64),
        }

    parts = li.map_batches(partial, batch_format="pyarrow").to_pandas()
    return pa.table(
        {
            "revenue_u": pa.array([int(parts["revenue_u"].sum())], pa.int64()),
            "n_items": pa.array([int(parts["n_items"].sum())], pa.int64()),
        }
    )


def q_customers_no_orders(sf_dir: str):
    """Anti-join existence filter: customers with no completed ('F')
    order — the NOT EXISTS shape — through the distributed sort-merge
    join in ``anti`` mode.  The orders side is filtered at the read and
    projected to its key column before the shuffle; each customer row
    survives once iff its key never appears."""
    from ..data_ops.relational import sort_merge_join

    cust = _read(sf_dir, "customer", ["c_custkey", "c_acctbal", "c_mktsegment"])
    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderstatus"])

    def done_only(b: pa.Table) -> pa.Table:
        return b.filter(pc.equal(b.column("o_orderstatus"), "F")).select(["o_custkey"])

    return sort_merge_join(
        cust,
        orders.map_batches(done_only, batch_format="pyarrow"),
        left_on="c_custkey",
        right_on="o_custkey",
        how="anti",
    )


def q_cust_status_rollup(sf_dir: str):
    """FULL OUTER join: per-custkey rollup of completed ('F') orders
    against open ('O') orders — customers present on only one side
    survive with zeroed columns for the other.  Each side is
    pre-aggregated inside map_batches (np.unique partials, integer
    micro-unit totals for bit-exact sums in any reduction order) before
    the small groupby, so only ≤|custkeys| rows per side ride the
    join's range sort."""
    from ..data_ops.relational import sort_merge_join

    def rollup(status: str, prefix: str):
        orders = _read(sf_dir, "orders", ["o_custkey", "o_orderstatus", "o_totalprice"])

        def partial(b: pa.Table) -> pa.Table:
            t = b.filter(pc.equal(b.column("o_orderstatus"), status))
            ck = batch_to_numpy(t, "o_custkey")
            tp = batch_to_numpy(t, "o_totalprice")
            u, inv = np.unique(ck, return_inverse=True)
            cnt = np.bincount(inv, minlength=len(u)).astype(np.int64)
            tot = np.zeros(len(u), np.int64)
            # int64 scatter-add of micro-units (floats would round >2^53)
            np.add.at(tot, inv, np.floor(tp * 1e6 + 0.5).astype(np.int64))
            return pa.table({"custkey": u.astype(np.int64), "cnt": cnt, "tot_u": tot})

        g = (
            orders.map_batches(partial, batch_format="pyarrow")
            .groupby("custkey")
            .sum(["cnt", "tot_u"])
        )

        def rename(b: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "custkey": b.column("custkey"),
                    f"{prefix}_orders": b.column("sum(cnt)").cast(pa.int64()),
                    f"{prefix}_total_u": b.column("sum(tot_u)").cast(pa.int64()),
                }
            )

        return g.map_batches(rename, batch_format="pyarrow")

    joined = sort_merge_join(
        rollup("F", "f"),
        rollup("O", "o"),
        left_on="custkey",
        right_on="custkey",
        how="outer",
    )

    def finish(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "custkey": b.column("custkey"),
                "f_orders": b.column("f_orders").fill_null(0).cast(pa.int64()),
                # ONE IEEE division of the exact integer total — bit-
                # deterministic, no rounding convention needed
                "f_total": pc.divide(
                    b.column("f_total_u").fill_null(0).cast(pa.float64()), 1e6
                ),
                "o_orders": b.column("o_orders").fill_null(0).cast(pa.int64()),
                "o_total": pc.divide(
                    b.column("o_total_u").fill_null(0).cast(pa.float64()), 1e6
                ),
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow")


def q_pricing_summary(sf_dir: str):
    """TPC-H Q1 shape: the multi-aggregate pricing summary of lineitem
    rows shipped before a cutoff, grouped by (returnflag, linestatus).
    Per-row derived measures (disc price, charge) are fixed-order IEEE
    products floor-quantized to int64 micro-units BEFORE any summation,
    so every sum is integer-exact in any reduction order / block
    layout; averages are the identical two-division double formula in
    Ray and SQL.  Pre-aggregated per batch (≤ |flag×status| rows leave
    each block) — the 100-TB-safe partial-combine groupby."""
    cutoff = np.datetime64("2000-01-01T00:00:00", "us").astype(np.int64)
    li = _read(
        sf_dir,
        "lineitem",
        [
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_tax",
            "l_returnflag",
            "l_linestatus",
            "l_shipdate",
        ],
    )

    def partial(b: pa.Table) -> pa.Table:
        ts = b.column("l_shipdate").cast(pa.timestamp("us")).cast(pa.int64())
        t = b.filter(pc.less(ts, cutoff))
        qty = batch_to_numpy(t, "l_quantity")
        price = batch_to_numpy(t, "l_extendedprice")
        disc = batch_to_numpy(t, "l_discount")
        tax = batch_to_numpy(t, "l_tax")
        qty_u = np.floor(qty * 1e6 + 0.5).astype(np.int64)
        price_u = np.floor(price * 1e6 + 0.5).astype(np.int64)
        disc_u = np.floor(disc * 1e6 + 0.5).astype(np.int64)
        # fixed-order IEEE products, then quantize (matches the SQL text)
        dp_u = np.floor(price * (1.0 - disc) * 1e6 + 0.5).astype(np.int64)
        ch_u = np.floor(price * (1.0 - disc) * (1.0 + tax) * 1e6 + 0.5).astype(
            np.int64
        )
        rf = t.column("l_returnflag").to_pandas().to_numpy()
        ls = t.column("l_linestatus").to_pandas().to_numpy()
        key = np.char.add(np.char.add(rf.astype("U1"), "|"), ls.astype("U1"))
        u, inv = np.unique(key, return_inverse=True)
        k = len(u)

        def acc(v):
            out = np.zeros(k, np.int64)
            np.add.at(out, inv, v)
            return out

        return pa.table(
            {
                "grp": pa.array(u),
                "sum_qty_u": acc(qty_u),
                "sum_base_price_u": acc(price_u),
                "sum_disc_price_u": acc(dp_u),
                "sum_charge_u": acc(ch_u),
                "sum_disc_u": acc(disc_u),
                "count_order": np.bincount(inv, minlength=k).astype(np.int64),
            }
        )

    cols = [
        "sum_qty_u",
        "sum_base_price_u",
        "sum_disc_price_u",
        "sum_charge_u",
        "sum_disc_u",
        "count_order",
    ]
    g = li.map_batches(partial, batch_format="pyarrow").groupby("grp").sum(cols)

    def finish(b: pa.Table) -> pa.Table:
        grp = b.column("grp").to_pandas().to_numpy().astype("U3")
        n = b.column("sum(count_order)").to_numpy(zero_copy_only=False)
        nd = n.astype(np.float64)

        def units(name):
            return b.column(f"sum({name})").to_numpy(zero_copy_only=False)

        def dbl(u):  # exact int → the two-division double formula
            return u.astype(np.float64) / 1e6

        return pa.table(
            {
                "l_returnflag": pa.array([s[0] for s in grp]),
                "l_linestatus": pa.array([s[2] for s in grp]),
                "sum_qty": dbl(units("sum_qty_u")),
                "sum_base_price": dbl(units("sum_base_price_u")),
                "sum_disc_price": dbl(units("sum_disc_price_u")),
                "sum_charge": dbl(units("sum_charge_u")),
                "avg_qty": dbl(units("sum_qty_u")) / nd,
                "avg_price": dbl(units("sum_base_price_u")) / nd,
                "avg_disc": dbl(units("sum_disc_u")) / nd,
                "count_order": n,
            }
        )

    return g.map_batches(finish, batch_format="pyarrow")


def q_embedding_gram(sf_dir: str):
    """Exact quantized second-moment (Gram/covariance) statistics of
    the embedding table — the PCA/whitening stats stage. Integer
    partial sums (one int64 QᵀQ per block) merged by the sorted
    run-reduce; bit-identical in every layout and in SQL."""
    from ..data_ops.ann import gram_quantized

    emb = _read(sf_dir, "embeddings", ["embedding"])
    return gram_quantized(emb, scale=1 << 16)


def q_doc_ccnet_buckets(sf_dir: str):
    """CCNet-style perplexity partitioning (Wenzek et al. 2020): score
    every document with the corpus-trained bigram LM, then bucket into
    per-language terciles — NTILE(3) PARTITION BY lang ORDER BY
    (lm_score, doc_id). Bucket 3 = most-predictable "head" slice.
    One sort-merge join (score ⋈ lang) + the grouped-NTILE one-sort
    pattern; full DuckDB hash oracle."""
    from ..data_ops.relational import grouped_ntile, sort_merge_join
    from ..data_ops.text import lm_score

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    scores = lm_score(docs)
    lang = _read(sf_dir, "documents", ["doc_id", "lang"])
    joined = sort_merge_join(scores, lang, left_on="doc_id")
    out = grouped_ntile(
        joined.select_columns(["doc_id", "lang", "lm_score"]),
        group_col="lang",
        order_cols=["lm_score", "doc_id"],
        k=3,
        out_col="ppl_bucket",
    )

    # lm_score stays RAW (the doc_lm_score oracle convention: the
    # two-division formula is bit-identical cross-engine, while its
    # exact-ratio values can land exactly on 1e-6 rounding boundaries
    # where numpy half-even and SQL half-away disagree)
    return out.select_columns(["doc_id", "lang", "lm_score", "ppl_bucket"])


def q_source_temperature_sample(sf_dir: str, *, total: int = 300):
    """Temperature-τ=0.5 source mixing (Arivazhagan et al. 2019 /
    XLM-R): a 300-doc budget apportioned ∝ √n_source by integer
    largest-remainder, each source's quota drawn as the smallest
    splitmix64 ids — the multilingual rebalancing stage, fully
    integer-exact with a DuckDB hash oracle."""
    from ..data_ops.curation import source_temperature_sample

    docs = _read(sf_dir, "documents", ["doc_id", "source"])
    return source_temperature_sample(docs, total=total)


def q_doc_dsir_weights(sf_dir: str):
    """DSIR importance weights (Xie et al. 2023): hashed (1,2)-gram
    log-likelihood ratios of the 10% id-hash target split vs the
    source corpus, quantized per bucket so per-document scores are
    exact integer sums — data-selection-by-importance-resampling with
    a full DuckDB hash oracle."""
    from ..data_ops.curation import dsir_weights

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return dsir_weights(docs)


def q_doc_semantic_dedup(sf_dir: str):
    """SemDeDup (Abbas et al. 2023): integer-exact k-means clusters
    the embedding space, exact cosine ≥ 0.4 within each cluster marks
    semantic duplicates, min-label WCC over the pair graph picks one
    representative per duplicate component. Returns
    (vec_id, cluster_id, rep_id, keep) — full DuckDB hash oracle
    (assignment integers + bounded min-label sweeps)."""
    from ..data_ops.dedup import semantic_dedup

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return semantic_dedup(emb, k=8, iters=1, threshold=0.4)


def q_embedding_pca(sf_dir: str):
    """PCA projection to 8 components via the SQL-replayable
    deterministic eigensolve (``embedding_pca_exact``): exact integer
    covariance → fixed-count integer power iteration with Rayleigh
    deflation (identical map in numpy and DuckDB, so the projections
    carry a full hash oracle) → streaming integer-exact per-batch
    projection. Subspace quality vs numpy ``eigh`` is pytest-verified
    (captured variance); the float ``embedding_pca`` stays as the
    production path. Returns per-vector rounded component values."""
    from ..data_ops.ann import embedding_pca_exact

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    out = embedding_pca_exact(emb, out_dim=8)

    def flat(b: pa.Table) -> pa.Table:
        P = np.asarray(
            b.column("pc").combine_chunks().flatten().to_numpy(), np.float64
        ).reshape(b.num_rows, -1)
        return pa.table(
            {
                "vec_id": b.column("vec_id"),
                **{f"pc{i}": P[:, i] for i in range(P.shape[1])},
            }
        )

    return out.map_batches(flat, batch_format="pyarrow")


def q_events_robust_anomaly(sf_dir: str):
    """Per-event-type robust outliers — median/MAD modified z-scores
    (Iglewicz–Hoaglin), the heavy-tail-proof twin of the mean/stddev
    hourly anomaly query: two grouped order-statistic passes (exact
    picks, no float accumulation) + one deterministic score
    expression. Full DuckDB hash oracle."""
    from ..data_ops.text import robust_group_anomaly

    ev = _read(sf_dir, "events", ["event_id", "event_type", "value"])
    return robust_group_anomaly(
        ev, group_col="event_type", val_col="value", id_col="event_id"
    )


def q_events_type_quantiles(sf_dir: str):
    """Per-event-type exact value quantiles (p50/p90/p99) — grouped
    order statistics over an unbounded-cardinality float column: one
    (type, value) range sort, per-block run summaries, driver fetches
    only the target blocks."""
    from ..data_ops.text import exact_group_quantiles_sorted

    ev = _read(sf_dir, "events", ["event_type", "value"])
    return exact_group_quantiles_sorted(ev, "event_type", "value", [0.5, 0.9, 0.99])
