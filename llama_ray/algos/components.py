"""Connected components + label propagation.

The reference computes SCCs with sequential Tarjan DFS
(`/root/reference/benchmark/benchmarks/tarjan_scc.h:56-206`), which
does not distribute; per SURVEY §2.5 the output-equivalent
distributed algorithms are used instead:

- **WCC**: iterated min-label propagation to fixpoint — every vertex
  converges to the minimum vertex id in its (undirected-reachability)
  component. Component *partitions* equal the reference's connected
  components exactly; labels are the canonical min-id representative
  (the reference's Tarjan labels are representative-dependent, so
  set-equality of partitions is the correctness bar).
- **Label propagation**: synchronous LP over the canonical undirected
  simple graph — each iteration every vertex adopts the most frequent
  label among its distinct neighbors (ties → smallest label); fixed
  iteration count, deterministic.

Both are supersteps of the same physical plan as PageRank: broadcast
state → scatter with per-batch combiner (plain per-block Ray tasks
over the materialized edge blocks — no per-superstep executor
launch) → sparse merge → apply; LP additionally has the BSP
mode-gather engine (counts never leave the actors).
"""

from __future__ import annotations

import logging
from typing import Optional

import numpy as np
import pyarrow as pa
import ray

from ..common import sparse_partial_min
from ..engine.superstep import SuperstepLoop, SuperstepResult, block_scatter
from ..graph import Graph

logger = logging.getLogger(__name__)

# engine='auto' cutover: below this the dataset engine's block-scatter +
# driver-merge is measured fastest; above it the per-superstep partial
# returns reach hundreds of MB × blocks (documented raylet-crash
# envelope past ~10M vertices, BASELINE §3.2e) and the label family
# switches to actor-resident sharded state.
AUTO_SHARD_VERTICES = 4_000_000


def weakly_connected_components(
    graph: Graph,
    *,
    max_iters: int = 100,
    engine: str = "auto",
    checkpoint_dir: Optional[str] = None,
    resume: bool = False,
    init_labels: Optional[np.ndarray] = None,
) -> SuperstepResult:
    """Min-label propagation to fixpoint over the graph's edges treated
    as undirected (each directed edge passes messages both ways, so no
    doubled edge copy is materialized). ``state['label'][i]`` is the
    minimum original vertex id in the component of ``graph.ids[i]``.

    Engines (all produce identical labels):

    - ``'dataset'``: per-superstep block scatter + driver sparse
      merge — fastest below a few million vertices, but the driver
      merge handles O(V × blocks) partial rows per superstep: past
      ~10M vertices the per-task return volume reaches hundreds of
      MB and can OOM the raylet.
    - ``'bsp'``: two partition-pinned gather pools (forward + a
      reversed view), elementwise min, state still driver-held.
    - ``'bsp_sharded'``: ONE pool over the doubled edge list with
      actor-resident labels — per superstep the driver moves only P
      slice refs + P change counts (the label-family analogue of
      sharded PageRank; reference iterates in place on its built
      in-CSR, ``ll_mlcsr_graph.h:955-1059``). The at-scale path.
    - ``'auto'``: ``'dataset'`` below :data:`AUTO_SHARD_VERTICES`
      (its measured fast regime), ``'bsp_sharded'`` above — logged,
      so big runs degrade to the scalable engine instead of
      crashing the session.

    bsp engines iterate on dense indices (int32 when V ≤ 2^31) and map
    back through the sorted ``graph.ids`` — exact integer math for the
    full int64 id range in every engine.

    ``init_labels`` (original ids, dense vertex order) warm-starts the
    fixpoint — the snapshot-delta recompute: levels only ADD edges, so
    a previous level's converged labels (own id for new vertices) are
    valid initial values — each entry must be the id of some vertex in
    the same component, which keeps the fixpoint at the exact
    component minima while late supersteps only touch merged regions.
    """
    n = graph.num_vertices
    if n == 0:
        return SuperstepResult({"label": np.empty(0, np.int64)}, 0, True, [])

    init_idx = None
    if init_labels is not None:
        init_labels = np.asarray(init_labels, np.int64)
        init_idx = np.searchsorted(graph.ids, init_labels)
        init_idx = np.clip(init_idx, 0, n - 1)
        if not np.array_equal(graph.ids[init_idx], init_labels):
            raise ValueError("init_labels must be ids of vertices in the graph")

    if engine == "auto":
        if n >= AUTO_SHARD_VERTICES:
            logger.warning(
                "wcc: V=%d ≥ %d — auto-selecting engine='bsp_sharded' "
                "(actor-resident labels; the dataset engine's driver merge "
                "does not hold at this scale)",
                n,
                AUTO_SHARD_VERTICES,
            )
            engine = "bsp_sharded"
        else:
            engine = "dataset"

    edges = graph.edges
    num_edges = graph.num_edges

    # bsp engines iterate on DENSE indices, not original ids: graph.ids
    # is sorted, so the min dense index in a component maps to the min
    # original id via ids[idx] — exact for the full int64 range (no
    # float64 carry), and int32 indices halve the exchange + gather
    # bandwidth when V < 2^31.
    idx_dtype = np.int32 if n <= (1 << 31) else np.int64

    if engine == "bsp_sharded":
        if checkpoint_dir is not None:
            raise ValueError("bsp_sharded does not support checkpointing")
        from ..engine.bsp import shared_pool

        gat = shared_pool(graph, view="undirected")
        try:
            labs, iters, conv, metrics = gat.run_min_label_sharded(
                init_idx.astype(idx_dtype)
                if init_idx is not None
                else np.arange(n, dtype=idx_dtype),
                max_iters=max_iters,
                num_edges=num_edges,
            )
        finally:
            gat.shutdown()
        return SuperstepResult(
            {"label": graph.ids[labs.astype(np.int64)]}, iters, conv, metrics
        )

    gat_fwd = gat_bwd = None
    if engine == "bsp":
        from ..engine.bsp import shared_pool

        gat_fwd = shared_pool(graph)
        gat_bwd = shared_pool(graph, view="reversed")

        def init_state_bsp():
            if init_idx is not None:
                return {"label_idx": init_idx.astype(idx_dtype)}
            return {"label_idx": np.arange(n, dtype=idx_dtype)}

        def step_bsp(state, k):
            lab = state["label_idx"]
            m1 = gat_fwd.gather_min(lab)
            m2 = gat_bwd.gather_min(lab)
            new = np.minimum(lab, np.minimum(m1, m2))
            changed = int((new != lab).sum())
            return {"label_idx": new}, float(changed), num_edges

        loop = SuperstepLoop(
            graph,
            algorithm="wcc",
            max_iters=max_iters,
            tol=0.0,
            checkpoint_dir=checkpoint_dir,
            resume=resume,
        )
        try:
            res = loop.run(init_state_bsp, step_bsp)
        finally:
            gat_fwd.shutdown()
            gat_bwd.shutdown()
        res.state["label"] = graph.ids[res.state.pop("label_idx").astype(np.int64)]
        return res

    def init_state():
        if init_labels is not None:
            return {"label": init_labels.copy()}
        return {"label": graph.ids.copy()}

    def step(state, k):
        lab_ref = ray.put(state["label"])

        def scatter(batch: pa.Table):
            if batch.num_rows == 0 or "src" not in batch.schema.names:
                return None
            lab = ray.get(lab_ref)
            src = batch.column("src").combine_chunks().to_numpy(zero_copy_only=False)
            dst = batch.column("dst").combine_chunks().to_numpy(zero_copy_only=False)
            keys = np.concatenate([dst, src])
            vals = np.concatenate([lab[src], lab[dst]])
            return sparse_partial_min(keys, vals)

        ks, vs = block_scatter(graph, scatter, "min")
        new = state["label"].copy()
        np.minimum.at(new, ks, vs)
        changed = int((new != state["label"]).sum())
        return {"label": new}, float(changed), num_edges

    loop = SuperstepLoop(
        graph,
        algorithm="wcc",
        max_iters=max_iters,
        tol=0.0,  # fixpoint: stop when no label changes
        checkpoint_dir=checkpoint_dir,
        resume=resume,
    )
    return loop.run(init_state, step)


def strongly_connected_components(
    graph: Graph,
    *,
    max_outer: int | None = None,
    max_inner: int | None = None,
) -> SuperstepResult:
    """True SCCs of a directed graph — the distributable
    trim + forward-backward coloring algorithm (the output-equivalent
    of the reference's sequential Tarjan DFS,
    `/root/reference/benchmark/benchmarks/tarjan_scc.h:56-206`; same
    partition, canonical min-id labels since Tarjan's labels are
    visit-order-dependent).

    Outer round over the still-active subgraph:

    1. **trim**: vertices with zero in- or out-degree inside the
       active subgraph are singleton SCCs — peel to fixpoint. Degrees
       are maintained *incrementally*: initialized once from the
       build-time degree vectors, then each deactivated vertex set
       decrements its neighbors via run-index lookups in the pinned
       pools (O(degree of the removed set) per round, never O(E) —
       the whole trim phase touches each edge at most once after the
       two pool-build scans);
    2. **color**: propagate ``color[v] = max(dense index reaching
       v)`` along forward edges to fixpoint (pool ``gather_max``);
    3. **backward reach**: from each color root (``color[v] == v``),
       mark vertices that can reach their root within the same color
       class (reversed pool);
    4. reached vertices form whole SCCs — assign and deactivate.

    All rounds run over two partition-pinned BSP pools (forward +
    reversed CSR) built once; per-round traffic is O(V) broadcast.
    ``state['label']`` is the min original vertex id of each SCC.

    Every phase loop is monotone (trim peels, color only grows,
    reach only grows), so each converges within ``n`` rounds;
    ``max_inner`` / ``max_outer`` default to that bound and RAISE on
    exhaustion without a fixpoint — a long cycle can never be
    silently split into wrong singleton SCCs.
    """
    n = graph.num_vertices
    if n == 0:
        return SuperstepResult({"label": np.empty(0, np.int64)}, 0, True, [])
    inner_cap = (n + 1) if max_inner is None else max_inner
    outer_cap = (n + 1) if max_outer is None else max_outer

    from ..engine.bsp import shared_pool

    fwd = shared_pool(graph)  # dst-range pools: per-dst gathers over in-edges
    bwd = shared_pool(graph, view="reversed")  # per-src gathers over out-edges
    try:
        comp = np.full(n, -1, np.int64)  # dense root index per assigned vertex
        active = np.ones(n, bool)
        idx = np.arange(n, dtype=np.int64)
        supersteps = 0
        indeg = graph.in_degrees().astype(np.int64, copy=True)
        outdeg = graph.out_degrees.astype(np.int64, copy=True)

        def deactivate(vs: np.ndarray):
            """Remove ``vs`` from the active subgraph and decrement
            their neighbors' degrees. Each edge (u, v) is charged
            exactly once per endpoint removal, so decrements over the
            whole run total O(E); a stale decrement on an
            already-inactive endpoint is harmless (only active
            vertices are ever tested)."""
            active[vs] = False
            t = np.sort(vs)
            sv, sc = fwd.incident_src_counts(t)  # in-edges of t
            if len(sv):
                np.subtract.at(outdeg, sv, sc)
            dv, dc = bwd.incident_src_counts(t)  # out-edges of t
            if len(dv):
                np.subtract.at(indeg, dv, dc)

        outer = 0
        while active.any():
            outer += 1
            if outer > outer_cap:
                raise RuntimeError(
                    f"SCC outer loop exceeded max_outer={outer_cap} with "
                    f"{int(active.sum())} vertices unassigned"
                )
            # ---- trim to fixpoint -------------------------------------
            while True:
                trim = active & ((indeg <= 0) | (outdeg <= 0))
                supersteps += 1
                if not trim.any():
                    break
                comp[trim] = idx[trim]
                deactivate(np.flatnonzero(trim))
                if not active.any():
                    break
            if not active.any():
                break

            # ---- forward max-color propagation to fixpoint ------------
            color = np.where(active, idx, np.int64(-1))
            it = 0
            while True:
                contrib = fwd.gather_max_masked(color, active)
                new = np.where(active, np.maximum(color, contrib), color)
                supersteps += 1
                it += 1
                if np.array_equal(new, color):
                    break
                color = new
                if it >= inner_cap:
                    raise RuntimeError(
                        f"SCC forward coloring hit max_inner={inner_cap} "
                        "without reaching a fixpoint (long cycle?)"
                    )

            # ---- backward reachability within color classes -----------
            reached = active & (color == idx)
            it = 0
            while True:
                newly = bwd.reach_step(color, active, reached)
                supersteps += 1
                it += 1
                if not len(newly):
                    break
                reached[newly] = True
                if it >= inner_cap:
                    raise RuntimeError(
                        f"SCC backward reach hit max_inner={inner_cap} "
                        "without reaching a fixpoint (long cycle?)"
                    )

            vs = np.flatnonzero(reached)
            comp[vs] = color[vs]
            deactivate(vs)
    finally:
        fwd.shutdown()
        bwd.shutdown()

    if (comp < 0).any():  # unreachable given the caps raise, but never corrupt
        raise RuntimeError("internal error: unassigned vertices after SCC loop")
    # canonical labels: min original id per SCC (ids sorted ⇒ min dense
    # index ⇔ min id)
    min_idx = np.full(n, n, np.int64)
    np.minimum.at(min_idx, comp, idx)
    label = graph.ids[min_idx[comp]]
    return SuperstepResult(
        {"label": label, "comp_root": comp},
        supersteps,
        True,
        [{"iteration": supersteps, "diff": 0.0, "edges_processed": graph.num_edges * supersteps, "seconds": 0.0}],
    )


def label_propagation(
    graph: Graph,
    *,
    iterations: int = 4,
    engine: str = "auto",
    init_labels: Optional[np.ndarray] = None,
    checkpoint_dir: Optional[str] = None,
    resume: bool = False,
) -> SuperstepResult:
    """Synchronous LP, ``iterations`` rounds, over the canonical
    undirected simple graph: every iteration each vertex adopts the
    most frequent label among its neighbor messages (one message per
    stored edge per direction; self-loops are ignored in EVERY engine
    — callers should pass a deduped graph for exact multiset
    semantics vs an oracle). Labels start as the original vertex ids.

    ``engine='bsp'``: partition-pinned gather actors over the DOUBLED
    edge list compute the per-vertex neighbor-label mode locally
    (``gather_mode`` — P-way parallel lexsorts; nothing
    per-(vertex,label) reaches the driver).

    ``engine='bsp_sharded'``: same pool with actor-resident labels —
    per superstep the driver moves P slice refs + P change counts,
    never an O(V) vector. The at-scale path.

    ``engine='dataset'``: scatter + driver merge; labels are dense
    indices so (vertex, label) message counts pack into one int64 key
    ``vertex * N + label`` (valid while N < 3e9; beyond that the same
    plan runs with a two-column groupby).

    ``engine='auto'``: ``'dataset'`` below :data:`AUTO_SHARD_VERTICES`,
    else ``'bsp_sharded'`` (logged).

    Ties break to the smallest label in every engine; smaller dense
    index ⇔ smaller original id because ``graph.ids`` is sorted.
    """
    n = graph.num_vertices
    if n == 0:
        return SuperstepResult({"label": np.empty(0, np.int64)}, 0, True, [])

    if engine == "auto":
        if n >= AUTO_SHARD_VERTICES:
            logger.warning(
                "label_propagation: V=%d ≥ %d — auto-selecting "
                "engine='bsp_sharded' (actor-resident labels)",
                n,
                AUTO_SHARD_VERTICES,
            )
            engine = "bsp_sharded"
        else:
            engine = "dataset"

    # warm start (multi-version LP): init_labels are ORIGINAL vertex
    # ids aligned with graph.ids; every label must itself be a vertex
    # of this graph (dense mode arithmetic needs labels in [0, n))
    if init_labels is not None:
        if len(init_labels) != n:
            raise ValueError(
                f"label_propagation: init_labels has {len(init_labels)} entries "
                f"but the graph has {n} vertices"
            )
        pos = np.searchsorted(graph.ids, np.asarray(init_labels, np.int64))
        if (pos >= n).any() or (graph.ids[np.minimum(pos, n - 1)] != init_labels).any():
            raise ValueError("label_propagation: init_labels must be vertex ids of this graph")
        dense_init = pos.astype(np.int32 if n <= (1 << 31) else np.int64)
    else:
        dense_init = None

    if engine in ("bsp", "bsp_sharded"):
        from ..engine.bsp import shared_pool

        gat = shared_pool(graph, view="undirected")
        num_edges2 = 2 * graph.num_edges

        if engine == "bsp_sharded":
            if checkpoint_dir is not None:
                raise ValueError("bsp_sharded does not support checkpointing")
            try:
                labs, iters, conv, metrics = gat.run_mode_label_sharded(
                    dense_init
                    if dense_init is not None
                    else np.arange(n, dtype=np.int32 if n <= (1 << 31) else np.int64),
                    iterations=iterations,
                    num_edges=num_edges2,
                )
            finally:
                gat.shutdown()
            labs = labs.astype(np.int64)
            return SuperstepResult(
                {"dense_label": labs, "label": graph.ids[labs]}, iters, conv, metrics
            )

        def init_state_bsp():
            if dense_init is not None:
                return {"dense_label": dense_init.copy()}
            return {
                "dense_label": np.arange(
                    n, dtype=np.int32 if n <= (1 << 31) else np.int64
                )
            }

        def step_bsp(state, k):
            mode = gat.gather_mode(state["dense_label"])
            new = np.where(mode >= 0, mode, state["dense_label"])
            changed = int((new != state["dense_label"]).sum())
            return {"dense_label": new}, float(changed), num_edges2

        loop = SuperstepLoop(
            graph,
            algorithm="label_propagation",
            max_iters=iterations,
            tol=None,
            checkpoint_dir=checkpoint_dir,
            resume=resume,
        )
        try:
            res = loop.run(init_state_bsp, step_bsp)
        finally:
            gat.shutdown()
        res.state["label"] = graph.ids[res.state["dense_label"]]
        return res

    if n >= (1 << 31):
        raise NotImplementedError("packed-key LP valid to ~3e9 vertices; use 2-col groupby")

    edges = graph.edges
    num_edges = graph.num_edges

    def init_state():
        if dense_init is not None:
            return {"dense_label": dense_init.astype(np.int64)}
        return {"dense_label": np.arange(n, dtype=np.int64)}

    def step(state, k):
        lab_ref = ray.put(state["dense_label"])

        def scatter(batch: pa.Table):
            if batch.num_rows == 0 or "src" not in batch.schema.names:
                return None
            lab = ray.get(lab_ref)
            src = batch.column("src").combine_chunks().to_numpy(zero_copy_only=False)
            dst = batch.column("dst").combine_chunks().to_numpy(zero_copy_only=False)
            keep = src != dst  # self-loops ignored, matching the bsp
            src, dst = src[keep], dst[keep]  # engines' doubled view
            nodes = np.concatenate([dst, src]).astype(np.int64)
            labels = np.concatenate([lab[src], lab[dst]])
            packed = nodes * n + labels
            u, counts = np.unique(packed, return_counts=True)
            return u, counts.astype(np.float64)

        keys, counts = block_scatter(graph, scatter, "sum")
        nodes = keys // n
        labels = keys % n
        # mode per node: order by (node, -count, label), take first
        order = np.lexsort((labels, -counts, nodes))
        nodes_o = nodes[order]
        first = np.ones(len(nodes_o), dtype=bool)
        first[1:] = nodes_o[1:] != nodes_o[:-1]
        new = state["dense_label"].copy()
        new[nodes_o[first]] = labels[order][first]
        changed = int((new != state["dense_label"]).sum())
        return {"dense_label": new}, float(changed), num_edges

    loop = SuperstepLoop(
        graph,
        algorithm="label_propagation",
        max_iters=iterations,
        tol=None,  # fixed-iteration mode
        checkpoint_dir=checkpoint_dir,
        resume=resume,
    )
    res = loop.run(init_state, step)
    res.state["label"] = graph.ids[res.state["dense_label"]]
    return res
