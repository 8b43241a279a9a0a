"""PageRank — gather-scatter over the edge Dataset.

Semantics match the reference exactly
(`/root/reference/benchmark/benchmarks/pagerank.h:117-178`, pull):

    pr_0(v)   = 1/N
    pr_k+1(v) = (1-d)/N + d * Σ_{(w,v)∈E} pr_k(w) / out_degree(w)

- d = 0.85 by default (``pagerank.h:73``);
- **no dangling-mass redistribution** (vertices with out-degree 0
  simply leak mass, as in the reference);
- fixed-iteration mode (reference ``-n``, default 10,
  ``benchmark.cc:1463``) or threshold convergence on the L1 diff
  (``examples/llama-pagerank.cc:71-103``: tol=1e-6, max 10);
- float64 accumulation throughout (the reference's
  ``pagerank_double`` variant, ``pagerank.h:404-433``) so results are
  reduction-order-stable to ~1e-15.

``mode="pull"`` and ``mode="push"`` (reference ``pagerank.h:217-360``)
produce the same sums — in a shuffle formulation both are "scatter
contributions along out-edges, sum by dst"; the distinction between
random-reads-over-in-edges and atomic-writes-over-out-edges is an
artifact of shared memory that the hash shuffle removes. Both modes
are accepted; they run the same plan.

Per-batch duplicate edges each contribute (matching the reference,
which iterates every stored edge) — dedup beforehand if desired.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import ray

from ..common import PAGERANK_D, batch_to_numpy, sparse_partial_sum
from ..engine.superstep import SuperstepLoop, SuperstepResult, block_scatter
from ..graph import Graph


def _make_scatter(w_ref):
    def scatter(batch: pa.Table):
        w = ray.get(w_ref)  # zero-copy plasma read of the broadcast state
        src = batch_to_numpy(batch, "src")
        dst = batch_to_numpy(batch, "dst")
        u, sums = sparse_partial_sum(dst, w[src])
        return {"dst": u, "v": sums}

    return scatter


def pagerank(
    graph: Graph,
    *,
    damping: float = PAGERANK_D,
    max_iters: int = 10,
    tol: Optional[float] = None,
    mode: str = "pull",
    engine: str = "dataset",
    checkpoint_dir: Optional[str] = None,
    resume: bool = False,
    bsp_build: str = "auto",
    weight_col: Optional[str] = None,
    init_rank: Optional[np.ndarray] = None,
) -> SuperstepResult:
    """Returns SuperstepResult with ``state['rank']`` (float64, dense
    vertex order — ``graph.ids[i]`` ↔ ``rank[i]``).

    ``engine='dataset'``: per-superstep ``map_batches`` scatter over
    the edge Dataset + message combine (north-star plan shape).
    ``engine='bsp'``: partition-pinned gather actors holding the
    dst-sorted reverse CSR (:mod:`llama_ray.engine.bsp`) — one-time
    range shuffle, then supersteps are broadcast + parallel reduceat;
    the scaling path. Both produce identical float64 sums up to
    addition order within a dst's in-edge run.

    ``bsp_build``: reverse-CSR build strategy for the BSP engines —
    ``'scan'`` (single-node: P parallel zero-copy plasma scans),
    ``'sort'`` (multi-node: range-sort by dst so each actor fetches
    only its contiguous blocks), or ``'auto'`` (pick by cluster size).

    ``weight_col``: edge-weighted PageRank — contributions are
    ``w_e · pr(src) / strength(src)`` with strength = per-src weight
    sum (zero-strength vertices leak mass like the unweighted
    danglers). ``dataset`` and ``bsp`` engines (the pool pins the
    weights once; per superstep one weighted reduceat).

    ``init_rank``: warm-start vector in dense vertex order (the
    snapshot-delta recompute: resume iteration from a prior level's
    converged ranks instead of uniform 1/n — the multi-version
    analytics pattern the reference's immutable levels exist for).
    All three engines; same fixpoint, fewer iterations when the
    delta is small.
    """
    if mode not in ("pull", "push"):
        raise ValueError(f"unknown mode {mode}")
    if engine not in ("dataset", "bsp", "bsp_sharded"):
        raise ValueError(f"unknown engine {engine}")
    if weight_col is not None and engine == "bsp_sharded":
        # the sharded actor-resident loop is unweighted-only for now;
        # 'bsp' uses the weighted pool (gather_sum_weighted) and
        # 'dataset' scatters w_e · rank/strength over the edge blocks
        raise ValueError("weight_col supports engine='dataset' or 'bsp'")
    n = graph.num_vertices
    if n == 0:
        return SuperstepResult({"rank": np.empty(0)}, 0, True, [])
    if weight_col is not None:
        # weighted out-strength replaces out-degree in the normalization
        def strength_partial(batch: pa.Table):
            if batch.num_rows == 0 or "src" not in batch.schema.names:
                return None
            src = batch.column("src").combine_chunks().to_numpy(zero_copy_only=False)
            w = (
                batch.column(weight_col)
                .combine_chunks()
                .to_numpy(zero_copy_only=False)
                .astype(np.float64)
            )
            return sparse_partial_sum(src, w)

        s_idx, s_sum = block_scatter(graph, strength_partial, "sum")
        strength = np.zeros(n, dtype=np.float64)
        strength[s_idx] = s_sum
        inv_deg = np.zeros(n, dtype=np.float64)
        nz = strength > 0
        inv_deg[nz] = 1.0 / strength[nz]
    else:
        inv_deg = np.zeros(n, dtype=np.float64)
        nz = graph.out_degrees > 0
        inv_deg[nz] = 1.0 / graph.out_degrees[nz]
    base = (1.0 - damping) / n

    edges = graph.edges
    num_edges = graph.num_edges

    if engine == "bsp_sharded":
        # actor-resident state: the driver leaves the superstep loop
        # entirely (P refs + P scalars per superstep); no checkpoint
        # support — state never visits the driver mid-run
        if checkpoint_dir is not None:
            raise ValueError("bsp_sharded does not support checkpointing")
        from ..engine.bsp import shared_pool

        g = shared_pool(graph, build=bsp_build)
        try:
            rank, iters, converged, metrics = g.run_pagerank_sharded(
                inv_deg,
                damping=damping,
                max_iters=max_iters,
                tol=tol,
                num_edges=num_edges,
                init_rank=init_rank,
            )
        finally:
            g.shutdown()
        return SuperstepResult({"rank": rank}, iters, converged, metrics)

    gatherer = None
    if engine == "bsp":
        from ..engine.bsp import shared_pool

        gatherer = shared_pool(
            graph, build=bsp_build, weighted=weight_col is not None
        )

    def init_state():
        if init_rank is not None:
            return {"rank": np.asarray(init_rank, np.float64).copy()}
        return {"rank": np.full(n, 1.0 / n, dtype=np.float64)}

    def step(state, k):
        rank = state["rank"]
        if gatherer is not None:
            if weight_col is not None:
                acc = gatherer.gather_sum_weighted(rank * inv_deg)
            else:
                acc = gatherer.gather_sum(rank * inv_deg)
        else:
            w_ref = ray.put(rank * inv_deg)

            def scatter(batch: pa.Table):
                if batch.num_rows == 0 or "src" not in batch.schema.names:
                    return None
                w = ray.get(w_ref)  # zero-copy plasma read of the broadcast state
                src = batch.column("src").combine_chunks().to_numpy(zero_copy_only=False)
                dst = batch.column("dst").combine_chunks().to_numpy(zero_copy_only=False)
                contrib = w[src]
                if weight_col is not None:
                    contrib = contrib * (
                        batch.column(weight_col)
                        .combine_chunks()
                        .to_numpy(zero_copy_only=False)
                        .astype(np.float64)
                    )
                return sparse_partial_sum(dst, contrib)

            dsts, sums = block_scatter(graph, scatter, "sum")
            acc = np.zeros(n, dtype=np.float64)
            acc[dsts] = sums
        new_rank = base + damping * acc
        diff = float(np.abs(new_rank - rank).sum())
        return {"rank": new_rank}, diff, num_edges

    loop = SuperstepLoop(
        graph,
        algorithm=f"pagerank_{mode}",
        max_iters=max_iters,
        tol=tol,
        checkpoint_dir=checkpoint_dir,
        resume=resume,
    )
    try:
        return loop.run(init_state, step)
    finally:
        if gatherer is not None:
            gatherer.shutdown()  # free the actor pool's CPU slots


def pagerank_top_k(graph: Graph, result: SuperstepResult, k: int = 10):
    """Top-k vertices by rank, descending (the reference example's
    output, ``examples/llama-pagerank.cc:253-270``). Returns a list of
    (original_vertex_id, rank)."""
    rank = result.state["rank"]
    if len(rank) == 0:
        return []
    kk = min(k, len(rank))
    part = np.argpartition(-rank, kk - 1)[:kk]
    order = part[np.lexsort((graph.ids[part], -rank[part]))]
    return [(int(graph.ids[i]), float(rank[i])) for i in order]
