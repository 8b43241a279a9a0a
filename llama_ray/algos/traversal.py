"""BFS / SSSP — frontier supersteps.

Reference: level-synchronous BFS template
(`/root/reference/llama/include/llama/ll_bfs_template.h:81-763`) and
the SSSP variants (`/root/reference/benchmark/benchmarks/sssp.h`):
``sssp_unweighted`` (dist = BFS level), ``sssp_unweighted_iter`` /
``sssp_weighted`` (Bellman-Ford-style relax-until-no-update with a
per-dst spinlocked min, ``sssp.h:144-158``).

Distributed form: per superstep, scatter over out-edges of *active*
vertices (frontier mask broadcast; inactive srcs filtered inside the
batch — a vectorized predicate, no per-row Python), per-batch min
combiner, ``groupby('dst').min`` replaces the spinlocked relax, and
vertices whose distance improved form the next frontier. For
unweighted graphs this is exactly level-synchronous BFS (each vertex
finalizes at its hop count); with weights it is distributed
Bellman-Ford.
"""

from __future__ import annotations

import logging
from typing import Optional

import numpy as np
import pyarrow as pa
import ray

from ..common import sparse_partial_min
from ..engine.superstep import SuperstepLoop, SuperstepResult
from ..graph import Graph

logger = logging.getLogger(__name__)

UNREACHED = np.float64(np.inf)


def sssp(
    graph: Graph,
    root_id: int,
    *,
    weighted: bool = False,
    weight_col: str = "weight",
    max_iters: int = 10_000,
    engine: str = "auto",
    checkpoint_dir: Optional[str] = None,
    resume: bool = False,
) -> SuperstepResult:
    """``state['dist']``: float64 distances (np.inf = unreached) in
    dense vertex order. Directed, over out-edges. ``engine='bsp'``
    relaxes through partition-pinned gather actors
    (:mod:`llama_ray.engine.bsp`) instead of per-superstep scatters;
    ``engine='bsp_sharded'`` additionally keeps (dist, frontier)
    actor-resident so no O(V) vector round-trips the driver per
    superstep — the at-scale path. ``engine='auto'`` picks
    ``'dataset'`` below ``AUTO_SHARD_VERTICES`` vertices, else
    ``'bsp_sharded'`` (logged)."""
    n = graph.num_vertices
    root = int(np.searchsorted(graph.ids, root_id))
    if root >= n or graph.ids[root] != root_id:
        raise KeyError(f"root vertex {root_id} not in graph")

    if engine == "auto":
        from .components import AUTO_SHARD_VERTICES

        if n >= AUTO_SHARD_VERTICES:
            logger.warning(
                "sssp: V=%d ≥ %d — auto-selecting engine='bsp_sharded' "
                "(actor-resident distances)",
                n,
                AUTO_SHARD_VERTICES,
            )
            engine = "bsp_sharded"
        else:
            engine = "dataset"

    edges = graph.edges
    num_edges = graph.num_edges

    if engine == "bsp_sharded":
        if checkpoint_dir is not None:
            raise ValueError("bsp_sharded does not support checkpointing")
        from ..engine.bsp import shared_pool

        gat = shared_pool(graph, weighted=weighted)
        dist0 = np.full(n, UNREACHED, dtype=np.float64)
        dist0[root] = 0.0
        active0 = np.zeros(n, dtype=bool)
        active0[root] = True
        try:
            dist, iters, conv, metrics = gat.run_sssp_sharded(
                dist0, active0, max_iters=max_iters, num_edges=num_edges
            )
        finally:
            gat.shutdown()
        return SuperstepResult({"dist": dist}, iters, conv, metrics)

    gatherer = None
    if engine == "bsp":
        from ..engine.bsp import shared_pool

        gatherer = shared_pool(graph, weighted=weighted)

    def init_state():
        dist = np.full(n, UNREACHED, dtype=np.float64)
        dist[root] = 0.0
        active = np.zeros(n, dtype=bool)
        active[root] = True
        return {"dist": dist, "active": active}

    def step(state, k):
        if gatherer is not None:
            mins = gatherer.gather_min_plus(state["dist"], state["active"])
            dist = state["dist"].copy()
            improved = mins < dist
            dist[improved] = mins[improved]
            active = improved
            return {"dist": dist, "active": active}, float(improved.sum()), num_edges
        dist_ref = ray.put(state["dist"])
        active_ref = ray.put(state["active"])

        def scatter(batch: pa.Table):
            if batch.num_rows == 0 or "src" not in batch.schema.names:
                return None
            dist = ray.get(dist_ref)
            act = ray.get(active_ref)
            src = batch.column("src").combine_chunks().to_numpy(zero_copy_only=False)
            dst = batch.column("dst").combine_chunks().to_numpy(zero_copy_only=False)
            mask = act[src]
            src, dst = src[mask], dst[mask]
            if weighted:
                w = (
                    batch.column(weight_col)
                    .combine_chunks()
                    .to_numpy(zero_copy_only=False)
                    .astype(np.float64)[mask]
                )
            else:
                w = 1.0
            cand = dist[src] + w
            return sparse_partial_min(dst, cand)

        from ..engine.superstep import block_scatter

        ks, vs = block_scatter(graph, scatter, "min")
        dist = state["dist"].copy()
        improved_keys = ks[vs < dist[ks]]
        improved_vals = vs[vs < dist[ks]]
        np.minimum.at(dist, ks, vs)
        active = np.zeros(n, dtype=bool)
        active[improved_keys] = True
        changed = int(active.sum())
        return {"dist": dist, "active": active}, float(changed), num_edges

    loop = SuperstepLoop(
        graph,
        algorithm="sssp_weighted" if weighted else "sssp_unweighted",
        max_iters=max_iters,
        tol=0.0,  # run until no distance improves
        checkpoint_dir=checkpoint_dir,
        resume=resume,
    )
    try:
        res = loop.run(init_state, step)
    finally:
        if gatherer is not None:
            gatherer.shutdown()  # free the actor pool's CPU slots
    res.state.pop("active", None)
    return res


def bfs(graph: Graph, root_id: int, **kwargs) -> SuperstepResult:
    """BFS levels from root (reference ``bfs_count``,
    ``benchmark/benchmarks/bfs.h:55-128``). ``state['dist']`` holds hop
    counts; the visited-vertex count (the reference's return value) is
    ``np.isfinite(state['dist']).sum()``."""
    return sssp(graph, root_id, weighted=False, **kwargs)


def bfs_path_counts(graph: Graph, root_id: int, *, max_depth: int = 10_000):
    """Distance AND number of distinct shortest paths from ``root_id``
    (the Brandes forward pass, single source): level-synchronous BFS
    where each newly reached vertex's σ is the sum of its
    previous-level in-neighbors' σ — one ``gather_sum`` over the
    frontier-masked σ vector per level on the cached forward pool.

    Returns ``(dist, sigma)`` int64 arrays in dense vertex order
    (dist = −1 / sigma = 0 for unreached).  σ accumulates in float64
    inside the gather; values are integer-exact below 2⁵³ and the
    function raises beyond that (path counts grow combinatorially on
    dense cyclic graphs — callers wanting only distances should use
    :func:`bfs`)."""
    from ..engine.bsp import shared_pool

    n = graph.num_vertices
    s = int(np.searchsorted(graph.ids, root_id))
    if s >= n or graph.ids[s] != root_id:
        raise KeyError(f"root vertex {root_id} not in graph")
    pool = shared_pool(graph)
    dist = np.full(n, -1, np.int64)
    sigma = np.zeros(n, np.int64)
    dist[s] = 0
    sigma[s] = 1
    frontier = np.zeros(n, bool)
    frontier[s] = True
    for lvl in range(1, max_depth + 1):
        g = pool.gather_sum(np.where(frontier, sigma, 0).astype(np.float64))
        new = (g > 0) & (dist < 0)
        if not new.any():
            break
        if g[new].max() >= 2.0**53:
            raise OverflowError(
                "bfs_path_counts: shortest-path counts exceed 2^53"
            )
        dist[new] = lvl
        sigma[new] = np.rint(g[new]).astype(np.int64)
        frontier = new
    return dist, sigma


def _smallest_id_source_dists(graph: Graph, k: int):
    """Yield ``(dense_source, dist)`` for the ``k`` smallest-id
    vertices: directed level-synchronous BFS over out-edges (the same
    semantics as the ``bfs`` query) on the cached shared forward pool.
    One ``gather_max_masked`` per level; the O(V) frontier is the only
    driver state — the pseudo-diameter loop's envelope. Deterministic
    source set (ids are sorted, so dense 0..k-1 = k smallest ids) so
    DuckDB oracles can replay it."""
    from ..engine.bsp import shared_pool

    n = graph.num_vertices
    pool = shared_pool(graph)
    ones = np.ones(n, np.int64)
    for s in range(k):
        dist = np.full(n, -1, np.int64)
        dist[s] = 0
        frontier = np.zeros(n, bool)
        frontier[s] = True
        lvl = 0
        while frontier.any():
            lvl += 1
            reach = pool.gather_max_masked(ones, frontier)
            new = (reach == 1) & (dist < 0)
            dist[new] = lvl
            frontier = new
        yield s, dist


def closeness_sampled(graph: Graph, *, num_sources: int = 8) -> "pa.Table":
    """Classic closeness centrality ``(reached-1)/sum_dist`` from the
    ``num_sources`` smallest-id vertices (see
    :func:`_smallest_id_source_dists` for the BFS envelope).

    Returns (source, reached, sum_dist, closeness) per source;
    closeness rounded to 6 decimals, 0 when the source reaches
    nothing."""
    import pyarrow as pa

    cols: dict[str, list] = {"source": [], "reached": [], "sum_dist": [], "closeness": []}
    for s, dist in _smallest_id_source_dists(graph, min(num_sources, graph.num_vertices)):
        fin = dist >= 0
        r = int(fin.sum())
        sd = int(dist[fin].sum())
        cols["source"].append(int(graph.ids[s]))
        cols["reached"].append(r)
        cols["sum_dist"].append(sd)
        cols["closeness"].append(float(np.round((r - 1) / sd, 6)) if sd > 0 else 0.0)
    return pa.table(
        {
            "source": pa.array(cols["source"], pa.int64()),
            "reached": pa.array(cols["reached"], pa.int64()),
            "sum_dist": pa.array(cols["sum_dist"], pa.int64()),
            "closeness": pa.array(cols["closeness"], pa.float64()),
        }
    )


def harmonic_sampled(graph: Graph, *, num_sources: int = 8) -> "pa.Table":
    """Harmonic centrality ``Σ_t 1/d(s,t)`` from the ``num_sources``
    smallest-id vertices (outward form over directed BFS distances —
    Boldi & Vigna 2014 define the inward one; same direction as the
    ``bfs``/``closeness`` queries so one oracle family covers all
    three). Unlike closeness it is well-defined on disconnected
    graphs: unreachable targets contribute 0 instead of poisoning the
    denominator.

    The sum is accumulated per distance level ascending —
    ``Σ_{d≥1} cnt_d / d`` — a ≤diameter-term float64 sum that DuckDB
    reproduces exactly at 6-decimal rounding. Same BFS envelope as
    :func:`closeness_sampled` (shared pool, O(V) driver frontier).

    Returns (source, reached, harmonic) per source, harmonic rounded
    to 6 decimals."""
    import pyarrow as pa

    cols: dict[str, list] = {"source": [], "reached": [], "harmonic": []}
    for s, dist in _smallest_id_source_dists(graph, min(num_sources, graph.num_vertices)):
        fin = dist >= 0
        ds, cnts = np.unique(dist[fin & (dist > 0)], return_counts=True)
        h = 0.0
        for d, c in zip(ds, cnts):  # ascending d — deterministic order
            h += float(c) / float(d)
        cols["source"].append(int(graph.ids[s]))
        cols["reached"].append(int(fin.sum()))
        cols["harmonic"].append(float(np.round(h, 6)))
    return pa.table(
        {
            "source": pa.array(cols["source"], pa.int64()),
            "reached": pa.array(cols["reached"], pa.int64()),
            "harmonic": pa.array(cols["harmonic"], pa.float64()),
        }
    )


def pseudo_diameter(graph: Graph) -> "pa.Table":
    """Double-sweep BFS diameter lower bound over the undirected simple
    graph (Magnien-Latapy-Habib 2009): BFS from the min-id vertex,
    then BFS from its farthest vertex (ties → smallest original id);
    ``ecc_far`` is the pseudo-diameter. One ``gather_max_masked`` per
    BFS level over the cached undirected pool — the frontier is the
    only O(V) driver state, like the coloring/MIS loops.

    Returns a single row (start, ecc_start, far, ecc_far); distances
    are within start's connected component (standard double sweep)."""
    import pyarrow as pa

    from ..engine.bsp import shared_pool

    n = graph.num_vertices
    if n == 0:
        return pa.table(
            {k: pa.array([], pa.int64()) for k in ("start", "ecc_start", "far", "ecc_far")}
        )
    pool = shared_pool(graph, view="undirected")
    ones = np.ones(n, np.int64)

    def bfs_dist(src_dense: int) -> np.ndarray:
        dist = np.full(n, -1, np.int64)
        dist[src_dense] = 0
        frontier = np.zeros(n, bool)
        frontier[src_dense] = True
        lvl = 0
        while frontier.any():
            lvl += 1
            reach = pool.gather_max_masked(ones, frontier)
            new = (reach == 1) & (dist < 0)
            dist[new] = lvl
            frontier = new
        return dist

    d1 = bfs_dist(0)  # ids are sorted: dense 0 = min original id
    ecc1 = int(d1.max())
    cand = np.flatnonzero(d1 == ecc1)
    far = int(cand[np.argmin(graph.ids[cand])])
    ecc2 = int(bfs_dist(far).max())
    return pa.table(
        {
            "start": pa.array([int(graph.ids[0])], pa.int64()),
            "ecc_start": pa.array([ecc1], pa.int64()),
            "far": pa.array([int(graph.ids[far])], pa.int64()),
            "ecc_far": pa.array([ecc2], pa.int64()),
        }
    )


def eccentricity_sampled(graph: Graph, *, num_sources: int = 8) -> "pa.Table":
    """Outward eccentricity (max finite BFS distance) from the
    ``num_sources`` smallest-id vertices — the radius/diameter
    evidence companion of :func:`closeness_sampled` (same directed BFS
    envelope, same deterministic source family, all-integer output so
    the DuckDB oracle is exact).

    Returns (source, reached, eccentricity) per source."""
    import pyarrow as pa

    cols: dict[str, list] = {"source": [], "reached": [], "eccentricity": []}
    for s, dist in _smallest_id_source_dists(graph, min(num_sources, graph.num_vertices)):
        fin = dist >= 0
        cols["source"].append(int(graph.ids[s]))
        cols["reached"].append(int(fin.sum()))
        cols["eccentricity"].append(int(dist[fin].max()))
    return pa.table(
        {
            "source": pa.array(cols["source"], pa.int64()),
            "reached": pa.array(cols["reached"], pa.int64()),
            "eccentricity": pa.array(cols["eccentricity"], pa.int64()),
        }
    )
