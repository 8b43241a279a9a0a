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


def node2vec_walks(
    graph: Graph,
    starts: np.ndarray | None = None,
    *,
    num_steps: int = 4,
    seed: int = DEFAULT_WALK_SEED,
    weights: tuple[int, int, int] = (1, 4, 2),
) -> pa.Table:
    """Second-order biased walks (node2vec, Grover & Leskovec KDD'16)
    as an Arrow table ``(walk_id, step, vertex)``.

    Step 1 is uniform (no predecessor — node2vec's convention). From
    step 2 on, each out-neighbor ``n`` of the current vertex with
    predecessor ``u`` gets the integer weight

    - ``w_return``  if ``n == u``             (node2vec 1/p)
    - ``w_common``  if ``n ∈ out-adj(u)``     (distance-1 from u)
    - ``w_far``     otherwise                 (distance-2, 1/q)

    (``weights=(w_return, w_common, w_far)``, all ≥ 1 — the rational
    node2vec (1/p, 1, 1/q) scaled to integers, e.g. p=4, q=2 →
    ``(1, 4, 2)``), and the hash point ``splitmix64((walk·GOLD) ⊕
    step ⊕ seed) mod Σw`` falls in the winning neighbor's cumulative
    interval over ascending-neighbor order — exact integer math,
    independent of partitioning and block layout, replayable in SQL
    (``oracles.graph_walks_node2vec_sql``).

    Distributed shape: per step, phase A asks the range owners of the
    frontier for candidate runs (``walk_candidates``), phase B asks
    the owners of each predecessor for edge-membership bits
    (``edge_member``, one binary search per pair against composite
    run keys) — each one fan-out over the pinned pool exchanging
    plasma refs. The weighted interval pick is vectorized on the
    driver over O(Σ out-deg(frontier)) integers per step; at cluster
    scale that pick moves into the phase-A actors unchanged (the math
    is walker-local — membership bits would route back to the
    candidate owner instead of the driver).
    """
    w_ret, w_common, w_far = (int(w) for w in weights)
    if min(w_ret, w_common, w_far) < 1:
        raise ValueError("node2vec weights must be integers >= 1")
    if starts is None:
        starts = graph.ids
    starts = np.asarray(starts, np.int64)
    pos = np.searchsorted(graph.ids, starts)
    pos = np.clip(pos, 0, max(len(graph.ids) - 1, 0))
    if len(graph.ids) == 0 or not np.array_equal(graph.ids[pos], starts):
        bad = starts if len(graph.ids) == 0 else starts[graph.ids[pos] != starts]
        raise ValueError(f"start vertices not in graph: {bad[:5]}...")

    pool = shared_pool(graph, view="reversed")
    ray.get([a.prepare_walks.remote(False) for a in pool.actors])

    walk_ids = [starts]
    steps = [np.zeros(len(starts), np.int64)]
    verts = [starts]

    alive_wid = starts
    cur = pos.astype(np.int64)
    prev = cur  # unused at t=1 (uniform first hop)
    for t in range(1, num_steps + 1):
        if len(cur) == 0:
            break
        h = _mix64(
            alive_wid.astype(np.uint64) * _GOLD ^ np.uint64(t) ^ np.uint64(seed)
        )
        if t == 1:
            cur_ref, h_ref = ray.put(cur), ray.put(h)
            nxt = np.full(len(cur), -1, np.int64)
            for part in ray.get(
                [a.walk_step.remote(cur_ref, h_ref) for a in pool.actors]
            ):
                if part is not None:
                    nxt[part[0]] = part[1]
        else:
            cur_ref = ray.put(cur)
            wk_parts, cd_parts = [], []
            for part in ray.get(
                [a.walk_candidates.remote(cur_ref) for a in pool.actors]
            ):
                if part is None:
                    continue
                idx, counts, flat = part
                wk_parts.append(np.repeat(idx, counts))
                cd_parts.append(flat)
            nxt = np.full(len(cur), -1, np.int64)
            if wk_parts:
                wk = np.concatenate(wk_parts)
                cd = np.concatenate(cd_parts)
                qsrc = prev[wk]
                s_ref, d_ref = ray.put(qsrc), ray.put(cd)
                member = np.zeros(len(cd), bool)
                for part in ray.get(
                    [a.edge_member.remote(s_ref, d_ref) for a in pool.actors]
                ):
                    if part is not None:
                        member[part[0]] = part[1]
                w = np.where(
                    cd == qsrc, w_ret, np.where(member, w_common, w_far)
                ).astype(np.int64)
                # each walker's candidates are contiguous (one actor
                # owns its current vertex) and ascending in cd
                cum = np.cumsum(w)
                seg_start = np.flatnonzero(
                    np.concatenate([[True], wk[1:] != wk[:-1]])
                )
                seg_end = np.append(seg_start[1:], len(wk))
                base = np.where(seg_start > 0, cum[seg_start - 1], 0)
                tot = (cum[seg_end - 1] - base).astype(np.uint64)
                r = (h[wk[seg_start]] % tot).astype(np.int64)
                j = np.searchsorted(cum, base + r, side="right")
                nxt[wk[seg_start]] = cd[np.minimum(j, len(cd) - 1)]
        ok = nxt >= 0
        prev, alive_wid, cur = cur[ok], alive_wid[ok], nxt[ok]
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


def walk_context_pairs(
    walks,
    *,
    window: int = 2,
) -> "ray.data.Dataset":
    """Skip-gram training pairs from a walk corpus — the
    DeepWalk/node2vec sampling stage that turns walks into word2vec
    input (Perozzi et al. 2014): every ordered (center, context)
    vertex pair co-occurring within ``window`` steps of the same walk,
    aggregated to exact counts.

    One range sort by (walk_id, step) co-locates each walk; pairs are
    pure row-offset arithmetic inside complete runs (walk steps are
    consecutive, so row distance = step distance), the ≤2 boundary
    runs per block re-pair in a bounded second pass, and the count
    merge is the sorted run-reduce over ``(center << 32) | context``
    keys (vertex ids must fit 31 bits — asserted). Returns
    (center, context, cnt) — nothing walk-corpus-sized reaches the
    driver."""
    import ray.data as rd

    from ..common import (
        batch_to_numpy,
        collect_boundary_runs,
        group_sum_sorted,
    )

    if isinstance(walks, pa.Table):
        walks = rd.from_arrow(walks)
    srt = walks.sort(["walk_id", "step"]).materialize()

    def run_pairs(wid, vert):
        if len(wid) < 2:
            return None
        if vert.max(initial=0) >= 1 << 31 or vert.min(initial=0) < 0:
            raise ValueError("walk_context_pairs: vertex ids must fit 31 bits")
        keys = []
        for d in range(1, window + 1):
            same = wid[d:] == wid[:-d]
            a = vert[:-d][same].astype(np.int64)
            b = vert[d:][same].astype(np.int64)
            keys.append((a << 32) | b)
            keys.append((b << 32) | a)
        k = np.concatenate(keys)
        if len(k) == 0:
            return None
        u, c = np.unique(k, return_counts=True)
        return {"k": u, "cnt": c.astype(np.int64)}

    def interior(tbl: pa.Table):
        empty = {"k": np.empty(0, np.int64), "cnt": np.empty(0, np.int64)}
        wid = batch_to_numpy(tbl, "walk_id")
        if len(wid) == 0:
            return empty
        inner = (wid != wid[0]) & (wid != wid[-1])
        out = run_pairs(wid[inner], batch_to_numpy(tbl, "vertex")[inner])
        return out if out is not None else empty

    main = srt.map_batches(interior, batch_format="pyarrow", batch_size=None)
    btbl = collect_boundary_runs(
        srt, "walk_id", columns=["walk_id", "step", "vertex"], where="walk_context_pairs"
    )
    if btbl is not None:
        # boundary rows arrive in global (walk_id, step) order
        out = run_pairs(batch_to_numpy(btbl, "walk_id"), batch_to_numpy(btbl, "vertex"))
        if out is not None:
            import ray.data as rd2

            main = main.union(
                rd2.from_arrow(pa.table({k: pa.array(v) for k, v in out.items()}))
            )

    merged = group_sum_sorted(main, "k", ["cnt"])

    def decode(b: pa.Table) -> pa.Table:
        k = batch_to_numpy(b, "k")
        return pa.table(
            {
                "center": pa.array(k >> 32, pa.int64()),
                "context": pa.array(k & ((1 << 32) - 1), pa.int64()),
                "cnt": b.column("cnt"),
            }
        )

    return merged.map_batches(decode, batch_format="pyarrow")


def khop_subgraph(
    graph: Graph,
    seeds: np.ndarray,
    *,
    hops: int = 2,
) -> "ray.data.Dataset":
    """K-hop ego subgraph around a seed set — the GraphSAGE/GNN
    minibatch expansion (Hamilton et al. 2017): all DISTINCT out-edges
    reachable in ≤ ``hops`` forward steps from ``seeds``, each tagged
    with the hop that discovers it (hop h = edges whose src entered
    the frontier at distance h−1; frontiers are disjoint, so every
    edge has exactly one hop).

    Per hop: one broadcast of the sorted frontier ids + one vectorized
    ``searchsorted`` membership filter over the edge blocks — no
    shuffle, no per-row Python; the frontier/visited sets are the only
    driver state (O(reached vertices), the BFS envelope); per-hop
    distinctness rides ``dedup_edges``'s sort. Returns
    (src, dst, hop) over ORIGINAL ids."""
    import ray.data as rd

    from ..common import batch_to_numpy, per_block_results
    from ..ingest.canonicalize import dedup_edges

    seeds = np.unique(np.asarray(seeds, np.int64))
    ids_ref = graph._ids_ref if graph._ids_ref is not None else ray.put(graph.ids)
    visited = seeds.copy()
    frontier = seeds
    parts: list = []
    for h in range(1, hops + 1):
        if len(frontier) == 0:
            break
        f_ref = ray.put(frontier)

        def expand(batch: pa.Table, fr=f_ref) -> pa.Table:
            ids = ray.get(ids_ref)
            s = ids[batch_to_numpy(batch, "src")]
            d = ids[batch_to_numpy(batch, "dst")]
            f = ray.get(fr)
            pos = np.searchsorted(f, s)
            m = (pos < len(f)) & (f[np.minimum(pos, len(f) - 1)] == s) if len(f) else np.zeros(len(s), bool)
            return pa.table(
                {"src": pa.array(s[m].astype(np.int64)), "dst": pa.array(d[m].astype(np.int64))}
            )

        hop_edges = dedup_edges(
            graph.edges.select_columns(["src", "dst"]).map_batches(
                expand, batch_format="pyarrow"
            )
        ).materialize()

        def tag(batch: pa.Table, hh=h) -> pa.Table:
            return batch.append_column(
                "hop", pa.array(np.full(batch.num_rows, hh, np.int64))
            )

        parts.append(hop_edges.map_batches(tag, batch_format="pyarrow"))
        dsts = per_block_results(
            hop_edges,
            lambda t: np.unique(batch_to_numpy(t, "dst")) if t.num_rows else None,
        )
        reach = (
            np.unique(np.concatenate([p for p in dsts if p is not None]))
            if any(p is not None for p in dsts)
            else np.empty(0, np.int64)
        )
        frontier = np.setdiff1d(reach, visited, assume_unique=True)
        visited = np.union1d(visited, frontier)

    if not parts:
        return rd.from_arrow(
            pa.table(
                {
                    "src": pa.array([], pa.int64()),
                    "dst": pa.array([], pa.int64()),
                    "hop": pa.array([], pa.int64()),
                }
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out
