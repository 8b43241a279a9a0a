"""Personalized PageRank — K seeds batched through one edge scan.

Standard random-walk-with-restart scores: for seed s,
``pr_0 = e_s``; ``pr_{k+1}(v) = (1-d)·e_s(v) + d·Σ_{(w,v)} pr_k(w)/deg(w)``.
All K seed vectors advance simultaneously as a (V, K) state matrix:
each edge's ``value[src]`` row gather pulls one cache line that feeds
K accumulations, so per-edge arithmetic intensity grows K-fold over
scalar PageRank — the batched-source trick of the BC implementation
(``algos/bc.py``) applied to ranking. This is also the scaling
workload in ``bench.py``: scalar PageRank saturates single-socket
memory bandwidth long before it saturates cores, while the batched
kernel is compute-bound and exercises actual parallel efficiency.

Reference analogue: repeated ``llama-pagerank`` runs
(`/root/reference/examples/llama-pagerank.cc:59-107`) from chosen
roots; the reference has no batched variant — this is a genuinely
new capability of the columnar formulation.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import ray

from ..common import PAGERANK_D, batch_to_numpy, binary_matrix
from ..engine.superstep import SuperstepLoop, SuperstepResult
from ..graph import Graph


def personalized_pagerank(
    graph: Graph,
    seeds: np.ndarray,
    *,
    damping: float = PAGERANK_D,
    max_iters: int = 10,
    tol: Optional[float] = None,
    engine: str = "bsp",
    checkpoint_dir: Optional[str] = None,
    resume: bool = False,
) -> SuperstepResult:
    """``state['rank']``: (num_vertices, K) float64; column k is the
    PPR vector of ``seeds[k]`` (original vertex ids)."""
    n = graph.num_vertices
    seeds = np.asarray(seeds, np.int64)
    seed_idx = np.searchsorted(graph.ids, seeds)
    if (seed_idx >= n).any() or (graph.ids[np.clip(seed_idx, 0, n - 1)] != seeds).any():
        raise KeyError("seed vertex not in graph")
    K = len(seeds)
    inv_deg = np.zeros(n)
    nz = graph.out_degrees > 0
    inv_deg[nz] = 1.0 / graph.out_degrees[nz]
    restart = np.zeros((n, K))
    restart[seed_idx, np.arange(K)] = 1.0 - damping

    if engine == "bsp_sharded":
        if checkpoint_dir is not None:
            raise ValueError("bsp_sharded does not support checkpointing")
        from ..engine.bsp import shared_pool

        init = np.zeros((n, K))
        init[seed_idx, np.arange(K)] = 1.0
        g = shared_pool(graph)
        try:
            rank, iters, converged, metrics = g.run_ppr_sharded(
                inv_deg,
                restart,
                init,
                damping=damping,
                max_iters=max_iters,
                tol=tol,
                num_edges=graph.num_edges,
            )
        finally:
            g.shutdown()
        return SuperstepResult({"rank": rank}, iters, converged, metrics)

    gatherer = None
    if engine == "bsp":
        from ..engine.bsp import shared_pool

        gatherer = shared_pool(graph)
    edges = graph.edges
    num_edges = graph.num_edges

    def init_state():
        r = np.zeros((n, K))
        r[seed_idx, np.arange(K)] = 1.0
        return {"rank": r}

    def step(state, k):
        rank = state["rank"]
        w = rank * inv_deg[:, None]
        if gatherer is not None:
            acc = gatherer.gather_sum_multi(w)
        else:
            w_ref = ray.put(w)

            def scatter(batch: pa.Table):
                ww = ray.get(w_ref)
                src = batch_to_numpy(batch, "src")
                dst = batch_to_numpy(batch, "dst")
                u, inv = np.unique(dst, return_inverse=True)
                sums = np.zeros((len(u), ww.shape[1]))
                np.add.at(sums, inv, ww[src])
                return {"dst": u, "v": [row.tobytes() for row in sums]}

            acc = np.zeros((n, K))
            for b in edges.map_batches(scatter, batch_format="pyarrow").iter_batches(
                batch_size=1 << 20, batch_format="pyarrow"
            ):
                dsts = batch_to_numpy(b, "dst")
                rows = binary_matrix(b.column("v"))
                np.add.at(acc, dsts, rows)
        new = restart + damping * acc
        diff = float(np.abs(new - rank).sum())
        return {"rank": new}, diff, num_edges * K

    loop = SuperstepLoop(
        graph,
        algorithm="personalized_pagerank",
        max_iters=max_iters,
        tol=tol,
        checkpoint_dir=checkpoint_dir,
        resume=resume,
    )
    try:
        res = loop.run(init_state, step)
    finally:
        if gatherer is not None:
            gatherer.shutdown()
    return res
