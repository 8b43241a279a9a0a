"""Deterministic random-walk sampling over the out-CSR.

A first-class training-data op (node2vec / DeepWalk corpus
generation, GNN neighbor sampling): from each start vertex, take
``num_steps`` hops; at vertex ``v`` on step ``t`` of walk ``w`` the
next hop is the neighbor with rank

    splitmix64((w * GOLD) mod 2^64  XOR  t  XOR  seed)  %  out_degree(v)

in ascending-neighbor-id order. The choice is a pure function of
(walk id, step, seed) — independent of partitioning, block layout and
parallelism — so the same walk corpus is reproducible on any cluster
shape AND expressible as an unrolled SQL join chain (the DuckDB
oracle in ``pipelines/oracles.py::graph_walks_sql``).

Distributed form: the out-adjacency lives in the graph's *reversed*
gather pool (src-range pinned actors — the out-CSR twin of the
reference's ``make_reverse_edges``, ``ll_mlcsr_graph.h:955-1059``);
each actor canonicalizes its runs to ascending neighbor order once
(``prepare_walks``), then every step is one vectorized
``searchsorted`` + take per partition. The driver holds only the
O(#walkers) cursor — the same envelope as the dense degree vectors —
and exchanges it once per step; walkers die at out-degree-0 vertices.
At cluster scale the cursor exchange is O(walkers) per step total
(each actor reads the shared plasma ref, returns only its own hits).
"""

from __future__ import annotations

import logging

import numpy as np
import pyarrow as pa
import ray

from ..data_ops.dedup import _GOLD, _mix64
from ..engine.bsp import shared_pool
from ..graph import Graph

logger = logging.getLogger(__name__)

DEFAULT_WALK_SEED = 20260818


def random_walks(
    graph: Graph,
    starts: np.ndarray | None = None,
    *,
    num_steps: int = 4,
    seed: int = DEFAULT_WALK_SEED,
    weighted: bool = False,
) -> pa.Table:
    """Walk corpus as an Arrow table ``(walk_id, step, vertex)``.

    ``starts`` are ORIGINAL vertex ids (default: every vertex);
    ``walk_id`` is the start's original id, ``step`` 0..num_steps
    (step 0 = the start vertex itself), ``vertex`` the original id
    visited. Walks that reach a sink emit no further rows.

    With ``weighted``, hop probability is proportional to the edge's
    integer ``weight`` column (the streaming duplicate-count semantic,
    ``ll_writable_graph.h:725-779``): the hash picks a point in
    ``[0, Σw)`` and the neighbor owning that cumulative-weight
    interval wins — still exact integer math, still replayable in SQL
    via a window cumsum.
    """
    if starts is None:
        starts = graph.ids
    starts = np.asarray(starts, np.int64)
    pos = np.searchsorted(graph.ids, starts)
    pos = np.clip(pos, 0, max(len(graph.ids) - 1, 0))
    if len(graph.ids) == 0 or not np.array_equal(graph.ids[pos], starts):
        bad = starts if len(graph.ids) == 0 else starts[graph.ids[pos] != starts]
        raise ValueError(f"start vertices not in graph: {bad[:5]}...")

    pool = shared_pool(graph, view="reversed", weighted=weighted)
    ray.get([a.prepare_walks.remote(weighted) for a in pool.actors])

    walk_ids = [starts]
    steps = [np.zeros(len(starts), np.int64)]
    verts = [starts]

    alive_wid = starts  # original ids — the RNG key
    cur = pos.astype(np.int64)  # dense cursor of the alive walkers
    for t in range(1, num_steps + 1):
        if len(cur) == 0:
            break
        h = _mix64(
            alive_wid.astype(np.uint64) * _GOLD
            ^ np.uint64(t)
            ^ np.uint64(seed)
        )
        cur_ref, h_ref = ray.put(cur), ray.put(h)
        nxt = np.full(len(cur), -1, np.int64)
        for part in ray.get(
            [a.walk_step.remote(cur_ref, h_ref) for a in pool.actors]
        ):
            if part is not None:
                nxt[part[0]] = part[1]
        ok = nxt >= 0
        alive_wid, cur = alive_wid[ok], nxt[ok]
        if len(cur) == 0:
            break
        walk_ids.append(alive_wid)
        steps.append(np.full(len(cur), t, np.int64))
        verts.append(graph.ids[cur])

    return pa.table(
        {
            "walk_id": np.concatenate(walk_ids),
            "step": np.concatenate(steps),
            "vertex": np.concatenate(verts),
        }
    )


def sample_neighbors(
    graph: Graph,
    k: int,
    *,
    seed: int = DEFAULT_WALK_SEED,
) -> pa.Table:
    """GraphSAGE-style neighbor sampling: for every vertex keep a
    uniform k-subset of its out-neighbors — the k with the smallest
    splitmix64((src·GOLD) ⊕ nbr ⊕ seed) over ORIGINAL ids, so the
    subset is independent of densification, partitioning and block
    layout (SQL replay: ``row_number() OVER (PARTITION BY src ORDER
    BY h, dst) <= k``). Vertices with ≤ k neighbors keep all of them.
    Runs entirely inside the reversed pool's src-range actors; the
    driver receives only the sampled O(V·k) pairs."""
    pool = shared_pool(graph, view="reversed")
    ids_ref = ray.put(graph.ids)
    parts = ray.get(
        [a.sample_neighbors.remote(ids_ref, k, seed) for a in pool.actors]
    )
    src = np.concatenate([p[0] for p in parts]) if parts else np.empty(0, np.int64)
    dst = np.concatenate([p[1] for p in parts]) if parts else np.empty(0, np.int64)
    return pa.table({"src": graph.ids[src], "dst": graph.ids[dst]})
