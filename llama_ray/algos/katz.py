"""Katz centrality — truncated-series power iteration.

Beyond the reference's task list, but the same vertex-centric
gather-scatter family as its PageRank (`pagerank.h:117-178`): the
per-superstep combine is an *unnormalized* in-neighbor sum, so the BSP
engine reuses the identical ``gather_sum`` kernel.

    x_0(v)   = 0
    x_k+1(v) = beta + alpha * Σ_{(w,v)∈E} x_k(w)

Fixed-iteration (deterministic, SQL-unrollable — the driver oracle is
the same chain in DuckDB). ``alpha`` must be below 1/λ_max for the
full series to converge; with fixed ``iterations`` any alpha yields a
well-defined truncated score, and the default 1/16 is comfortably
convergent for the testdata link graphs (λ_max ≲ 12). Per-batch
duplicate edges each contribute — pass a deduped graph for simple
semantics. Float64 throughout.

The default ``alpha=0.0625`` (2^-4) and integer ``beta`` are chosen so
every intermediate is an exact dyadic rational that fits float64's
53-bit mantissa (8 iterations → ≤32 fractional bits): sums are then
exact in ANY reduction order, so the dataset engine, the BSP pool, a
numpy loop and the unrolled DuckDB chain all produce bit-identical
scores with no rounding margin needed. With a non-dyadic alpha
(e.g. 0.05) scores land on a decimal lattice where round-half ties
between engines are structural, not rare.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import ray

from ..common import sparse_partial_sum
from ..engine.superstep import SuperstepLoop, SuperstepResult, block_scatter
from ..graph import Graph


def katz_centrality(
    graph: Graph,
    *,
    alpha: float = 0.0625,
    beta: float = 1.0,
    iterations: int = 8,
    engine: str = "dataset",
    checkpoint_dir: Optional[str] = None,
    resume: bool = False,
) -> SuperstepResult:
    """Returns SuperstepResult with ``state['katz']`` (float64, dense
    vertex order). ``engine='dataset'``: per-superstep scatter tasks
    over the pinned edge blocks; ``engine='bsp'``: partition-pinned
    reverse-CSR gather actors (one range build, then supersteps are
    broadcast + reduceat) — identical sums up to in-run addition
    order."""
    if engine not in ("dataset", "bsp"):
        raise ValueError(f"unknown engine {engine}")
    n = graph.num_vertices
    if n == 0:
        return SuperstepResult({"katz": np.empty(0)}, 0, True, [])
    num_edges = graph.num_edges

    gatherer = None
    if engine == "bsp":
        from ..engine.bsp import shared_pool

        gatherer = shared_pool(graph)

    def init_state():
        return {"katz": np.zeros(n, dtype=np.float64)}

    def step(state, k):
        x = state["katz"]
        if gatherer is not None:
            acc = gatherer.gather_sum(x)
        else:
            x_ref = ray.put(x)

            def scatter(batch: pa.Table):
                if batch.num_rows == 0 or "src" not in batch.schema.names:
                    return None
                xs = ray.get(x_ref)
                src = batch.column("src").combine_chunks().to_numpy(zero_copy_only=False)
                dst = batch.column("dst").combine_chunks().to_numpy(zero_copy_only=False)
                return sparse_partial_sum(dst, xs[src])

            dsts, sums = block_scatter(graph, scatter, "sum")
            acc = np.zeros(n, dtype=np.float64)
            acc[dsts] = sums
        new_x = beta + alpha * acc
        diff = float(np.abs(new_x - x).sum())
        return {"katz": new_x}, diff, num_edges

    loop = SuperstepLoop(
        graph,
        algorithm="katz",
        max_iters=iterations,
        tol=None,
        checkpoint_dir=checkpoint_dir,
        resume=resume,
    )
    try:
        return loop.run(init_state, step)
    finally:
        if gatherer is not None:
            gatherer.shutdown()
