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

from typing import Optional

import numpy as np
import pyarrow as pa
import ray

from ..common import sparse_partial_min
from ..engine.superstep import SuperstepLoop, SuperstepResult, block_scatter
from ..graph import Graph


def weakly_connected_components(
    graph: Graph,
    *,
    max_iters: int = 100,
    engine: str = "dataset",
    checkpoint_dir: Optional[str] = None,
    resume: bool = False,
) -> SuperstepResult:
    """Min-label propagation to fixpoint over the graph's edges treated
    as undirected (each directed edge passes messages both ways, so no
    doubled edge copy is materialized). ``state['label'][i]`` is the
    minimum original vertex id in the component of ``graph.ids[i]``.

    ``engine='bsp'`` uses two partition-pinned gather pools (forward
    edges and a reversed view) and takes the elementwise min — the
    scaling path. Labels travel as float64 through the min-gather
    (original int64 ids are exactly representable below 2^53; for
    full-range hash ids the dataset engine keeps exact int64 math).

    Engine envelope: the dataset engine's driver merge handles
    O(V × blocks) partial rows per superstep — fastest below ~10M
    vertices; beyond that the per-task return volume grows to
    hundreds of MB and the bsp engine (state-sized actor exchange,
    ~2×edge memory pinned across the pools) is the right choice.
    """
    n = graph.num_vertices
    if n == 0:
        return SuperstepResult({"label": np.empty(0, np.int64)}, 0, True, [])

    edges = graph.edges
    num_edges = graph.num_edges

    gat_fwd = gat_bwd = None
    if engine == "bsp":
        if np.abs(graph.ids).max(initial=0) >= (1 << 53):
            raise NotImplementedError("bsp WCC carries labels as float64; ids ≥ 2^53 need the dataset engine")
        from ..engine.bsp import BSPGather, reversed_view

        gat_fwd = BSPGather(graph)
        gat_bwd = BSPGather(reversed_view(graph))

    def init_state():
        return {"label": graph.ids.copy()}

    def step(state, k):
        if gat_fwd is not None:
            lab = state["label"].astype(np.float64)
            m1 = gat_fwd.gather_min(lab)
            m2 = gat_bwd.gather_min(lab)
            new_f = np.minimum(lab, np.minimum(m1, m2))
            new = new_f.astype(np.int64)
            changed = int((new != state["label"]).sum())
            return {"label": new}, float(changed), num_edges
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
    try:
        return loop.run(init_state, step)
    finally:
        if gat_fwd is not None:
            gat_fwd.shutdown()
            gat_bwd.shutdown()


def strongly_connected_components(
    graph: Graph,
    *,
    max_outer: int = 64,
    max_inner: int = 1024,
) -> SuperstepResult:
    """True SCCs of a directed graph — the distributable
    trim + forward-backward coloring algorithm (the output-equivalent
    of the reference's sequential Tarjan DFS,
    `/root/reference/benchmark/benchmarks/tarjan_scc.h:56-206`; same
    partition, canonical min-id labels since Tarjan's labels are
    visit-order-dependent).

    Outer round over the still-active subgraph:

    1. **trim**: vertices with zero in- or out-degree inside the
       active subgraph are singleton SCCs — peel to fixpoint (this
       alone finishes DAGs in diameter rounds);
    2. **color**: propagate ``color[v] = max(dense index reaching
       v)`` along forward edges to fixpoint;
    3. **backward reach**: from each color root (``color[v] == v``),
       mark vertices that can reach their root within the same color
       class (scatter over edges, reversed direction);
    4. reached vertices form whole SCCs — assign and deactivate.

    Every phase is the standard broadcast-state + ``map_batches``
    scatter + per-batch combiner plan; per-superstep traffic is O(V).
    ``state['label']`` is the min original vertex id of each SCC.
    """
    n = graph.num_vertices
    if n == 0:
        return SuperstepResult({"label": np.empty(0, np.int64)}, 0, True, [])

    edges = graph.edges
    comp = np.full(n, -1, np.int64)  # dense root index per assigned vertex
    active = np.ones(n, bool)
    idx = np.arange(n, dtype=np.int64)
    supersteps = 0

    def scan(fn):
        """One scatter round as plain per-block Ray tasks (no streaming
        executor launch); fn(src, dst) -> dict of partial arrays,
        merged on the driver."""

        def scatter(batch: pa.Table):
            if batch.num_rows == 0 or "src" not in batch.schema.names:
                return None
            return fn(
                batch.column("src").combine_chunks().to_numpy(zero_copy_only=False),
                batch.column("dst").combine_chunks().to_numpy(zero_copy_only=False),
            )

        task = ray.remote(scatter)
        return [
            o
            for o in ray.get([task.remote(r) for r in graph.edge_block_refs()])
            if o is not None
        ]

    for _outer in range(max_outer):
        if not active.any():
            break
        # ---- trim to fixpoint -----------------------------------------
        while True:
            act_ref = ray.put(active)

            def degs(s, d, _r=act_ref):
                act = ray.get(_r)
                m = act[s] & act[d]
                sv, sc = np.unique(s[m], return_counts=True)
                dv, dc = np.unique(d[m], return_counts=True)
                return {
                    "v": np.concatenate([sv, dv]),
                    "c": np.concatenate([sc, dc]).astype(np.int64),
                    "kind": np.concatenate(
                        [np.zeros(len(sv), np.int64), np.ones(len(dv), np.int64)]
                    ),
                }

            outdeg = np.zeros(n, np.int64)
            indeg = np.zeros(n, np.int64)
            for b in scan(degs):
                v, c, k = b["v"], b["c"], b["kind"]
                np.add.at(outdeg, v[k == 0], c[k == 0])
                np.add.at(indeg, v[k == 1], c[k == 1])
            supersteps += 1
            trim = active & ((indeg == 0) | (outdeg == 0))
            if not trim.any():
                break
            comp[trim] = idx[trim]
            active &= ~trim
            if not active.any():
                break
        if not active.any():
            break

        # ---- forward max-color propagation to fixpoint ----------------
        color = np.where(active, idx, np.int64(-1))
        for _ in range(max_inner):
            state_ref = ray.put((color, active))

            def fwd(s, d, _r=state_ref):
                col, act = ray.get(_r)
                m = act[s] & act[d]
                u, mx = sparse_partial_min(d[m], -col[s[m]])
                return {"dst": u, "v": -mx}

            new = color.copy()
            for b in scan(fwd):
                np.maximum.at(new, b["dst"], b["v"])
            supersteps += 1
            if np.array_equal(new, color):
                break
            color = new

        # ---- backward reachability within color classes ---------------
        reached = active & (color == idx)
        for _ in range(max_inner):
            state_ref = ray.put((color, active, reached))

            def bwd(s, d, _r=state_ref):
                col, act, rch = ray.get(_r)
                m = act[s] & act[d] & (col[s] == col[d]) & rch[d] & ~rch[s]
                return {"v": np.unique(s[m])}

            newly = np.zeros(n, bool)
            for b in scan(bwd):
                newly[b["v"]] = True
            supersteps += 1
            newly &= ~reached
            if not newly.any():
                break
            reached |= newly

        comp[reached] = color[reached]
        active &= ~reached

    # canonical labels: min original id per SCC (ids sorted ⇒ min dense
    # index ⇔ min id)
    min_idx = np.full(n, n, np.int64)
    np.minimum.at(min_idx, comp, idx)
    label = graph.ids[min_idx[comp]]
    return SuperstepResult(
        {"label": label, "comp_root": comp},
        supersteps,
        not active.any(),
        [{"iteration": supersteps, "diff": 0.0, "edges_processed": graph.num_edges * supersteps, "seconds": 0.0}],
    )


def label_propagation(
    graph: Graph,
    *,
    iterations: int = 4,
    engine: str = "dataset",
    checkpoint_dir: Optional[str] = None,
    resume: bool = False,
) -> SuperstepResult:
    """Synchronous LP, ``iterations`` rounds, over the canonical
    undirected simple graph (distinct neighbor pairs, self-loops
    ignored — callers should pass a deduped graph for exact multiset
    semantics vs an oracle). Labels start as the original vertex ids.

    ``engine='bsp'``: partition-pinned gather actors over the DOUBLED
    edge list compute the per-vertex neighbor-label mode locally
    (``gather_mode`` — P-way parallel lexsorts; nothing
    per-(vertex,label) reaches the driver). The scaling path.

    ``engine='dataset'``: scatter + driver merge; labels are dense
    indices so (vertex, label) message counts pack into one int64 key
    ``vertex * N + label`` (valid while N < 3e9; beyond that the same
    plan runs with a two-column groupby). Ties break to the smallest
    label in both engines; smaller dense index ⇔ smaller original id
    because ``graph.ids`` is sorted.
    """
    n = graph.num_vertices
    if n == 0:
        return SuperstepResult({"label": np.empty(0, np.int64)}, 0, True, [])

    if engine == "bsp":
        from ..engine.bsp import BSPGather
        from ..graph import undirect

        class _DoubledView:
            """Both directions of every canonical edge, so each
            neighbor contributes exactly one in-edge message."""

            def __init__(self, g: Graph):
                self.edges = undirect(g.edges, drop_self_loops=True)
                self.num_vertices = g.num_vertices
                self._deg = g.out_degrees + g.in_degrees()

            def in_degrees(self):
                return self._deg

        gat = BSPGather(_DoubledView(graph))
        num_edges2 = 2 * graph.num_edges

        def init_state_bsp():
            return {"dense_label": np.arange(n, dtype=np.int64)}

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
        return {"dense_label": np.arange(n, dtype=np.int64)}

    def step(state, k):
        lab_ref = ray.put(state["dense_label"])

        def scatter(batch: pa.Table):
            if batch.num_rows == 0 or "src" not in batch.schema.names:
                return None
            lab = ray.get(lab_ref)
            src = batch.column("src").combine_chunks().to_numpy(zero_copy_only=False)
            dst = batch.column("dst").combine_chunks().to_numpy(zero_copy_only=False)
            nodes = np.concatenate([dst, src])
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
