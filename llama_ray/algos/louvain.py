"""Louvain-style community detection — synchronous local moving.

Beyond the reference's task registry (its closest op is label
propagation); added as a first-class link-graph operator because
community structure drives corpus partitioning and near-dup cluster
analysis at training-data scale. This is the *local-moving phase* of
Louvain (Blondel et al. 2008) made deterministic and fixed-round so it
is exactly reproducible across engines AND expressible as an unrolled
SQL chain:

  * every vertex starts in its own community, c_0(v) = v;
  * each round, synchronously, every vertex moves to the community C
    (among its neighbors' communities and its own) maximizing the
    modularity gain of the move.  Comparing gains multiplied through
    by 2m turns the usual rational ΔQ into the INTEGER score

        s(v, C) = 2m·e(v,C) − k_v·(tot(C) − k_v·[C = c(v)])

    with e(v,C) = #neighbors of v in C, k_v = degree, tot(C) = Σ of
    degrees of C's members — so the argmax is exact int64 arithmetic,
    identical in any engine, any block layout, and in DuckDB.  Ties
    prefer STAYING, then the smallest community id: moving only on a
    strictly positive gain is what stops community ids churning (with
    min-id-on-tie alone, a founder abandons its own community for an
    equal-scored smaller id and cliques flip labels forever);
  * moves are PARITY-GATED: in round k (0-based) only vertices whose
    original id has parity k % 2 may move, the rest hold.  Fully
    synchronous moving oscillates — two adjacent vertices swap into
    each other's communities forever, and on a 2^9-vertex R-MAT the
    partition never beats singletons (measured Q ≈ −0.01 after 12
    rounds, vs +0.11 with gating, monotone) — so alternating update
    classes is the standard distributed-Louvain remedy (a 2-coloring
    approximation of the sequential visit order, cf. Grappolo /
    Halappanavar et al.'s coloring constraint);
  * a fixed number of rounds (no convergence test), like the
    fixed-iteration PageRank oracle.

Semantics follow :func:`label_propagation`'s graph contract: defined
on the canonical undirected simple graph (``canonical_undirected``);
each stored edge contributes one neighbor per direction.

Classic multi-level Louvain would now coarsen (communities become
vertices) and repeat; the coarsening step is a plain
``groupby(community)`` edge contraction over the same machinery, but
keeping the operator single-level keeps it deterministic and
SQL-checkable, which is worth more here than the extra modularity.

Scale posture: the BSP engine evaluates the argmax INSIDE the
dst-range partition actors (``gather_best_community`` — per-(vertex,
community) counts never leave the actor); driver traffic is O(V) per
round (labels + community-degree totals broadcast, new labels back),
the same envelope as label propagation. The dataset engine (small
graphs) merges per-block packed-key partials on the driver.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from ..engine.superstep import SuperstepLoop, SuperstepResult, block_scatter
from ..graph import Graph


def _community_totals(c: np.ndarray, deg: np.ndarray, n: int) -> np.ndarray:
    """tot(C) = Σ deg over members, exact int64. bincount's float64
    partial sums are exact while 2m < 2^53 (every partial ≤ total)."""
    return np.bincount(c, weights=deg, minlength=n).astype(np.int64)


def louvain_communities(
    graph: Graph,
    *,
    rounds: int = 6,
    engine: str = "bsp",
    weight_col: str | None = None,
    self_w: np.ndarray | None = None,
    two_m_override: int | None = None,
    checkpoint_dir: str | None = None,
    resume: bool = False,
) -> SuperstepResult:
    """``state['label'][i]`` = community of dense vertex ``i`` as an
    original vertex id (the founding member's id); ``dense_label`` =
    the same as dense indices. Pass a canonical undirected graph.

    ``weight_col``: integer edge multiplicities (the reference's
    streaming weights-instead-of-duplicates semantic,
    ``ll_writable_graph.h:725-779``) — e(v,C), k_v and tot(C) become
    weighted sums, still exact int64, so the weighted argmax stays
    bit-identical across engines and in SQL.

    ``self_w`` (dense int64) + ``two_m_override``: the multi-level
    hooks — a coarsened vertex's self-loop mass counts toward its
    degree (2·self_w) and toward e(v, own); 2m stays the ORIGINAL
    graph's edge mass (the modularity denominator), not the coarse
    sum.
    """
    if engine not in ("dataset", "bsp"):
        raise ValueError(f"unknown engine {engine}")
    n = graph.num_vertices
    if n == 0:
        return SuperstepResult({"label": np.empty(0, np.int64)}, 0, True, [])

    from ..engine.bsp import UndirectedView, shared_pool

    if weight_col is not None:
        from ..common import sparse_partial_sum

        def wdeg_partial(batch: pa.Table):
            if batch.num_rows == 0 or "src" not in batch.schema.names:
                return None
            s = batch.column("src").combine_chunks().to_numpy(zero_copy_only=False)
            d = batch.column("dst").combine_chunks().to_numpy(zero_copy_only=False)
            w = (
                batch.column(weight_col)
                .combine_chunks()
                .to_numpy(zero_copy_only=False)
                .astype(np.float64)
            )
            return sparse_partial_sum(
                np.concatenate([s, d]).astype(np.int64), np.concatenate([w, w])
            )

        idx, sums = block_scatter(graph, wdeg_partial, "sum")
        deg = np.zeros(n, np.int64)
        deg[idx] = np.rint(sums).astype(np.int64)  # integer-valued, < 2^53
    else:
        deg = UndirectedView(graph).in_degrees().astype(np.int64)
    if self_w is not None:
        deg = deg + 2 * self_w.astype(np.int64)
    two_m = int(deg.sum()) if two_m_override is None else int(two_m_override)
    max_deg = int(deg.max()) if n else 0
    if two_m * max(max_deg, 1) >= (1 << 62):
        # 2m·e(v,C) and k_v·tot(C) are both ≤ 2m·k_max
        raise NotImplementedError(
            "int64 modularity scores need 2m·k_max < 2^62; "
            "rescale weights or contract hubs first"
        )
    if two_m >= (1 << 53):
        raise NotImplementedError("exact float64 bincount totals need 2m < 2^53")

    gat = None
    if engine == "bsp":
        gat = shared_pool(graph, view="undirected", weighted=weight_col is not None)
    elif n >= (1 << 31):
        raise NotImplementedError(
            "packed-key louvain dataset engine valid to ~2e9 vertices; use engine='bsp'"
        )

    parity = (graph.ids % 2).astype(np.int64)  # gate on ORIGINAL ids (SQL-visible)

    def init_state():
        return {"dense_label": np.arange(n, dtype=np.int64)}

    def step(state, k):
        c = state["dense_label"]
        tot = _community_totals(c, deg, n)
        gate = parity == (k % 2)
        if gat is not None:
            best = gat.gather_best_community(
                c,
                tot,
                deg,
                two_m,
                gate=gate,
                weighted=weight_col is not None,
                self_w=self_w,
            )
            new = np.where(best >= 0, best, c)
        else:
            c_ref = ray.put(c)

            def scatter(batch: pa.Table):
                if batch.num_rows == 0 or "src" not in batch.schema.names:
                    return None
                lab = ray.get(c_ref)
                src = batch.column("src").combine_chunks().to_numpy(zero_copy_only=False)
                dst = batch.column("dst").combine_chunks().to_numpy(zero_copy_only=False)
                keep = src != dst  # doubled simple view, like LP
                if weight_col is not None:
                    w = (
                        batch.column(weight_col)
                        .combine_chunks()
                        .to_numpy(zero_copy_only=False)
                        .astype(np.float64)[keep]
                    )
                src, dst = src[keep], dst[keep]
                nodes = np.concatenate([dst, src]).astype(np.int64)
                labels = np.concatenate([lab[src], lab[dst]])
                packed = nodes * n + labels
                if weight_col is not None:
                    u, inv = np.unique(packed, return_inverse=True)
                    acc = np.zeros(len(u), np.float64)
                    np.add.at(acc, inv, np.concatenate([w, w]))
                    return u, acc
                u, counts = np.unique(packed, return_counts=True)
                return u, counts.astype(np.float64)

            keys, counts = block_scatter(graph, scatter, "sum")
            nodes = keys // n
            labs = keys % n
            e_cnt = counts.astype(np.int64)
            # own community competes as a zero-count candidate (the
            # real segment, if any, scores higher and carries the same
            # label — harmless duplicate, as in the BSP combine)
            nodes = np.concatenate([nodes, np.arange(n, dtype=np.int64)])
            labs = np.concatenate([labs, c])
            e_cnt = np.concatenate([e_cnt, np.zeros(n, np.int64)])
            kd = deg[nodes]
            own = c[nodes]
            is_own = labs == own
            if self_w is not None:
                e_cnt = e_cnt + np.where(is_own, self_w[nodes], np.int64(0))
            score = np.int64(two_m) * e_cnt - kd * (
                tot[labs] - np.where(is_own, kd, np.int64(0))
            )
            order = np.lexsort((labs, ~is_own, -score, nodes))
            no = nodes[order]
            first = np.ones(len(no), bool)
            first[1:] = no[1:] != no[:-1]
            new = c.copy()
            winners = no[first]
            moved = labs[order][first]
            sel = gate[winners]
            new[winners[sel]] = moved[sel]
        changed = int((new != c).sum())
        return {"dense_label": new}, float(changed), 2 * graph.num_edges

    loop = SuperstepLoop(
        graph,
        algorithm="louvain",
        max_iters=rounds,
        tol=None,  # fixed-round, SQL-unrollable
        checkpoint_dir=checkpoint_dir,
        resume=resume,
    )
    try:
        res = loop.run(init_state, step)
    finally:
        if gat is not None:
            gat.shutdown()
    res.state["label"] = graph.ids[res.state["dense_label"]]
    return res


def louvain_multilevel(
    graph: Graph,
    *,
    rounds1: int = 4,
    rounds2: int = 4,
    engine: str = "bsp",
) -> SuperstepResult:
    """Two-level Louvain: local moving, then the classic coarsening —
    communities become vertices, inter-community edge multiplicities
    become weights, intra-community mass becomes self-loops — then
    weighted local moving on the coarse graph with the ORIGINAL 2m as
    the modularity denominator. Every stage is deterministic integer
    arithmetic, so the whole composition is reproduced exactly by one
    DuckDB query.

    The contraction is itself the engine's own machinery: one
    ``map_batches`` relabel of the edge Dataset + ``dedup_edges
    (weights='count')`` + ``build_graph`` — the coarse graph is a
    first-class Graph, so phase 2 runs the identical pool path.

    Returns ``state['label']`` (final community per original vertex,
    as original ids) and ``state['level1_label']`` (the phase-1
    partition, for inspection)."""
    import ray

    n = graph.num_vertices
    if n == 0:
        return SuperstepResult({"label": np.empty(0, np.int64)}, 0, True, [])
    p1 = louvain_communities(graph, rounds=rounds1, engine=engine)
    c1 = p1.state["dense_label"]
    c1_ids = graph.ids[c1]  # per-vertex community id (original-id space)
    two_m = 2 * graph.num_edges

    from ..graph import build_graph
    from ..ingest.canonicalize import dedup_edges

    cd_ref = ray.put(c1)
    ids_ref = ray.put(graph.ids)

    def contract(batch: pa.Table):
        empty = {"src": np.empty(0, np.int64), "dst": np.empty(0, np.int64)}
        if batch.num_rows == 0 or "src" not in batch.schema.names:
            return empty
        cl = ray.get(cd_ref)
        gi = ray.get(ids_ref)
        s = batch.column("src").combine_chunks().to_numpy(zero_copy_only=False)
        d = batch.column("dst").combine_chunks().to_numpy(zero_copy_only=False)
        a = gi[cl[s]]
        b = gi[cl[d]]
        lo = np.minimum(a, b)
        hi = np.maximum(a, b)
        keep = lo != hi
        return {"src": lo[keep], "dst": hi[keep]}

    inter = graph.edges.map_batches(contract, batch_format="pyarrow")
    cg = build_graph(dedup_edges(inter, weights="count"))

    # intra-community edge counts (the coarse self-loop mass)
    def intra_partial(batch: pa.Table):
        if batch.num_rows == 0 or "src" not in batch.schema.names:
            return None
        cl = ray.get(cd_ref)
        s = batch.column("src").combine_chunks().to_numpy(zero_copy_only=False)
        d = batch.column("dst").combine_chunks().to_numpy(zero_copy_only=False)
        m = cl[s] == cl[d]
        if not m.any():
            return None
        from ..common import sparse_partial_sum

        return sparse_partial_sum(
            cl[s][m].astype(np.int64), np.ones(int(m.sum()), np.float64)
        )

    idx, sums = block_scatter(graph, intra_partial, "sum")
    # align self-loop mass to the coarse vertex order (communities with
    # no inter-community edge are absent from cg and never move)
    selfw = np.zeros(cg.num_vertices, np.int64)
    if len(idx):
        comm_ids = graph.ids[idx]
        pos = np.searchsorted(cg.ids, comm_ids)
        ok = pos < len(cg.ids)
        ok[ok] = cg.ids[pos[ok]] == comm_ids[ok]
        selfw[pos[ok]] = np.rint(sums[ok]).astype(np.int64)

    p2 = louvain_communities(
        cg,
        rounds=rounds2,
        engine=engine,
        weight_col="weight",
        self_w=selfw,
        two_m_override=two_m,
    )
    lab2 = p2.state["label"]
    pos = np.searchsorted(cg.ids, c1_ids)
    final = c1_ids.copy()
    inmask = pos < len(cg.ids)
    inmask[inmask] = cg.ids[pos[inmask]] == c1_ids[inmask]
    final[inmask] = lab2[pos[inmask]]
    return SuperstepResult(
        {"label": final, "dense_label": final, "level1_label": c1_ids},
        p1.iterations + p2.iterations,
        True,
        p1.metrics + p2.metrics,
    )
