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
state → ``map_batches`` scatter with per-batch combiner →
``groupby`` hash shuffle → apply.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import ray

from ..common import batch_to_numpy, sparse_partial_min
from ..engine.superstep import SuperstepLoop, SuperstepResult, aggregate_messages
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
            lab = ray.get(lab_ref)
            src = batch_to_numpy(batch, "src")
            dst = batch_to_numpy(batch, "dst")
            keys = np.concatenate([dst, src])
            vals = np.concatenate([lab[src], lab[dst]])
            u, mins = sparse_partial_min(keys, vals)
            return {"dst": u, "v": mins}

        msgs = edges.map_batches(scatter, batch_format="pyarrow")
        ks, vs = aggregate_messages(msgs, "min")
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
            lab = ray.get(lab_ref)
            src = batch_to_numpy(batch, "src")
            dst = batch_to_numpy(batch, "dst")
            nodes = np.concatenate([dst, src])
            labels = np.concatenate([lab[src], lab[dst]])
            packed = nodes * n + labels
            u, counts = np.unique(packed, return_counts=True)
            return {"dst": u, "v": counts.astype(np.int64)}

        msgs = edges.map_batches(scatter, batch_format="pyarrow")
        keys, counts = aggregate_messages(msgs, "sum")
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
