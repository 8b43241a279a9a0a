"""k-core decomposition — per-vertex core numbers.

Beyond the reference's task registry (its closest structural metric
is ``degree_distribution``, ``benchmark/tools/degree_distribution.h``);
added as a first-class link-graph operator because corpus/link-graph
pruning pipelines use coreness as a cheap structural quality signal.

Algorithm: **H-index iteration** (Lü, Zhou, Zhang, Stanley, "The
H-index of a network node and its relation to degree and coreness",
Nature Communications 2016): initialize every vertex with its degree,
then repeatedly set each vertex's value to the H-index of its
neighbors' values (the largest h such that ≥ h neighbors have value
≥ h). The sequence is pointwise non-increasing and converges to the
vertex's core number. This maps exactly onto the BSP gather engine —
one ``gather_hindex`` (segment lexsort + monotone-indicator reduceat
inside the partition actors) per superstep, driver traffic O(V) per
round — where classic peeling would need a round per shell.

Semantics match :func:`label_propagation`'s graph contract: coreness
is defined on the *undirected simple* graph, so callers pass a
canonical graph (``canonical_undirected``); each stored edge then
contributes one neighbor per direction via :class:`UndirectedView`.
"""

from __future__ import annotations

import logging

import numpy as np

from ..engine.superstep import SuperstepLoop, SuperstepResult
from ..graph import Graph

logger = logging.getLogger(__name__)


def core_numbers(
    graph: Graph,
    *,
    max_iters: int = 200,
    engine: str = "auto",
    checkpoint_dir: str | None = None,
    resume: bool = False,
) -> SuperstepResult:
    """``state['core'][i]`` = core number of dense vertex ``i`` (the
    largest k such that i belongs to a subgraph of minimum degree k).

    Runs to fixpoint (H-index iteration is monotone, so an unchanged
    round is converged); ``max_iters`` is a safety bound — power-law
    graphs converge in tens of rounds, and hitting the cap raises
    rather than returning a non-fixpoint (the values would silently
    overestimate coreness).

    ``engine='bsp_sharded'`` (the ``'auto'`` default when not
    checkpointing) keeps core estimates actor-resident and recomputes
    only dst runs with a changed source per round — H-index iteration
    is monotone, so unchanged neighborhoods cannot move; late rounds
    touch a shrinking frontier instead of all 2E edges. Bit-identical
    to ``'bsp'`` (exact integer math in both).
    """
    n = graph.num_vertices
    if n == 0:
        return SuperstepResult({"core": np.empty(0, np.int64)}, 0, True, [])

    from ..engine.bsp import UndirectedView, shared_pool

    if engine == "auto":
        engine = "bsp" if checkpoint_dir is not None else "bsp_sharded"

    deg = UndirectedView(graph).in_degrees().astype(np.int64)
    gat = shared_pool(graph, view="undirected")
    num_edges2 = 2 * graph.num_edges

    if engine == "bsp_sharded":
        if checkpoint_dir is not None:
            raise ValueError("bsp_sharded does not support checkpointing")
        init = deg if n > (1 << 31) else deg.astype(np.int32)
        try:
            core, iters, conv, metrics = gat.run_hindex_sharded(
                init, max_iters=max_iters, num_edges=num_edges2
            )
        finally:
            gat.shutdown()
        if not conv:
            raise RuntimeError(
                f"core_numbers hit max_iters={max_iters} before the H-index "
                "fixpoint; values may overestimate coreness — raise max_iters"
            )
        return SuperstepResult(
            {"core": core.astype(np.int64)}, iters, conv, metrics
        )

    def init_state():
        return {"core": deg.copy()}

    return _core_loop(graph, gat, init_state, max_iters, checkpoint_dir, resume, num_edges2)


def onion_layers(graph: Graph, *, max_rounds: int | None = None, mode: str = "push"):
    """Onion decomposition (Hébert-Dufresne, Grochow & Allard, Sci.
    Rep. 2016): the k-core peeling refined by *wave* — per round, peel
    simultaneously every alive vertex whose remaining degree is ≤ the
    current shell value k (k = max(k, min alive degree), so shells are
    nondecreasing); a vertex's layer is the 1-based round it leaves in,
    its core the shell value at that moment.  Layers order vertices
    *within* each k-shell by how deep they sit (the paper's structural
    centrality signal beyond coreness).

    ``mode='push'`` (default) maintains alive-neighbor degrees
    incrementally: each wave fans out ONLY the newly peeled vertices'
    adjacency runs (the node2vec ``walk_candidates`` machinery over
    the undirected pool), so total edge work across ALL waves is O(E)
    — the wave count (which IS the onion's output, often hundreds on
    power-law graphs) no longer multiplies the edge scan.
    ``mode='gather'`` recomputes degrees with one alive-mask
    ``gather_sum`` per wave (O(waves·E), kept as the
    cross-check/fallback; both modes are bit-identical — tested).
    O(V) driver state either way.  Pass a canonical undirected graph
    (same contract as :func:`core_numbers`).

    Returns ``(layer, core)`` int64 arrays in dense vertex order.
    ``core`` equals :func:`core_numbers` exactly (tested)."""
    if mode not in ("push", "gather"):
        raise ValueError("onion_layers: mode must be 'push' or 'gather'")
    n = graph.num_vertices
    if n == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    import ray

    from ..engine.bsp import UndirectedView, shared_pool

    gat = shared_pool(graph, view="undirected")
    layer = np.zeros(n, np.int64)
    core = np.zeros(n, np.int64)
    alive = np.ones(n, bool)
    k = 0
    rounds = 0
    cap = max_rounds if max_rounds is not None else n + 1
    try:
        if mode == "push":
            ray.get([a.prepare_walks.remote(False) for a in gat.actors])
            deg = UndirectedView(graph).in_degrees().astype(np.int64)
            while alive.any():
                rounds += 1
                if rounds > cap:
                    raise RuntimeError("onion_layers exceeded max_rounds")
                k = max(k, int(deg[alive].min()))
                peel = alive & (deg <= k)
                layer[peel] = rounds
                core[peel] = k
                alive &= ~peel
                if not alive.any():
                    break
                pv = np.flatnonzero(peel).astype(np.int64)
                chunk = 1 << 20
                for lo in range(0, len(pv), chunk):
                    ref = ray.put(pv[lo : lo + chunk])
                    dec = np.zeros(n, np.int64)
                    any_part = False
                    for part in ray.get(
                        [a.walk_candidates.remote(ref) for a in gat.actors]
                    ):
                        if part is None:
                            continue
                        any_part = True
                        _idx, _counts, flat = part
                        dec += np.bincount(flat, minlength=n)
                    if any_part:
                        deg -= dec
        else:
            while alive.any():
                rounds += 1
                if rounds > cap:
                    raise RuntimeError("onion_layers exceeded max_rounds")
                deg = np.rint(gat.gather_sum(alive.astype(np.float64))).astype(np.int64)
                k = max(k, int(deg[alive].min()))
                peel = alive & (deg <= k)
                layer[peel] = rounds
                core[peel] = k
                alive &= ~peel
    finally:
        gat.shutdown()
    return layer, core


def _core_loop(graph, gat, init_state, max_iters, checkpoint_dir, resume, num_edges2):

    def step(state, k):
        h = gat.gather_hindex(state["core"])
        # monotone by theory; the minimum guards against ever reporting
        # an increase (isolated vertices keep 0: no in-edge → h=0=deg)
        new = np.minimum(state["core"], h)
        changed = int((new != state["core"]).sum())
        return {"core": new}, float(changed), num_edges2

    loop = SuperstepLoop(
        graph,
        algorithm="core_numbers",
        max_iters=max_iters,
        tol=0.0,
        checkpoint_dir=checkpoint_dir,
        resume=resume,
    )
    try:
        res = loop.run(init_state, step)
    finally:
        gat.shutdown()
    if not res.converged:
        raise RuntimeError(
            f"core_numbers hit max_iters={max_iters} before the H-index "
            "fixpoint; values may overestimate coreness — raise max_iters"
        )
    return res
