"""Per-component bipartiteness via BFS-parity 2-coloring.

Beyond the reference's benchmark set, but built entirely from its
vertex-centric primitives (BFS template ``ll_bfs_template.h`` +
min-label components): color every vertex by the parity of its BFS
distance from its component's root (the minimum-id vertex — the WCC
label, so roots are deterministic), then count edges whose endpoints
share a color. A component is bipartite iff it has no such conflict
edge (BFS-parity coloring is a valid 2-coloring exactly on
odd-cycle-free graphs).

Distributed form: one multi-root BFS — the usual min-plus frontier
relaxation (``gather_min_plus``) over the undirected gather pool with
ALL roots active at distance 0, so the whole forest is traversed in
max-component-diameter supersteps — then per-block conflict bincounts
(colors broadcast once per check, partials merged on the driver at
O(V)). Replays in SQL as unrolled min-label + min-dist rounds
(``pipelines/oracles.py::bipartite_sql``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from ..common import SRC, DST, batch_to_numpy
from ..graph import Graph


def _block_conflicts(block: pa.Table, color: np.ndarray, comp_pos: np.ndarray):
    """(components, conflict counts) for one canonical edge block."""
    if block.num_rows == 0 or SRC not in block.schema.names:
        return None
    s = batch_to_numpy(block, SRC)
    d = batch_to_numpy(block, DST)
    bad = color[s] == color[d]
    if not bad.any():
        return None
    u, cnt = np.unique(comp_pos[s[bad]], return_counts=True)
    return u, cnt


def _parity_coloring(graph: Graph, max_iters: int):
    """(labels, dense root index per vertex, color) — the shared
    WCC + multi-root-BFS pass (cached on the graph: both public
    surfaces and repeated query calls reuse one traversal)."""
    cached = getattr(graph, "_bipartite_coloring", None)
    if cached is not None:
        return cached
    from .components import weakly_connected_components
    from ..engine.bsp import shared_pool

    n = graph.num_vertices
    ids = graph.ids
    lab = weakly_connected_components(graph).state["label"]  # original ids
    comp_pos = np.searchsorted(ids, lab)  # dense root index per vertex

    # multi-root BFS: every component root starts at distance 0
    pool = shared_pool(graph, view="undirected")
    roots = comp_pos[ids[comp_pos] == lab]  # == unique roots, dense
    dist = np.full(n, np.inf)
    dist[roots] = 0.0
    active = np.zeros(n, dtype=bool)
    active[roots] = True
    it = 0
    while active.any():
        it += 1
        if it > max_iters:
            raise RuntimeError("bipartite BFS did not converge")
        mins = pool.gather_min_plus(dist, active)
        improved = mins < dist
        dist[improved] = mins[improved]
        active = improved
    pool.shutdown()
    color = (dist.astype(np.int64) & 1).astype(np.int8)
    out = (lab, comp_pos, color)
    try:
        graph._bipartite_coloring = out
    except AttributeError:
        pass
    return out


def bipartite_colors(graph: Graph, *, max_iters: int = 10_000) -> pa.Table:
    """Per vertex: (vertex, component, color) — the BFS-parity
    2-coloring itself (color ∈ {0, 1}, deterministic: parity of the
    unique BFS distance from the component's min-id root)."""
    if graph.num_vertices == 0:
        return pa.table(
            {
                "vertex": pa.array([], pa.int64()),
                "component": pa.array([], pa.int64()),
                "color": pa.array([], pa.int64()),
            }
        )
    lab, _, color = _parity_coloring(graph, max_iters)
    return pa.table(
        {
            "vertex": pa.array(graph.ids, pa.int64()),
            "component": pa.array(lab, pa.int64()),
            "color": pa.array(color.astype(np.int64), pa.int64()),
        }
    )


def bipartite_check(graph: Graph, *, max_iters: int = 10_000) -> pa.Table:
    """Per component: (component, n_vertices, n_conflicts,
    is_bipartite) over a canonical undirected simple graph (``src <
    dst`` once per pair, no self-loops)."""
    n = graph.num_vertices
    ids = graph.ids
    if n == 0:
        return pa.table(
            {
                "component": pa.array([], pa.int64()),
                "n_vertices": pa.array([], pa.int64()),
                "n_conflicts": pa.array([], pa.int64()),
                "is_bipartite": pa.array([], pa.int64()),
            }
        )
    lab, comp_pos, color = _parity_coloring(graph, max_iters)

    color_ref = ray.put(color)
    pos_ref = ray.put(comp_pos.astype(np.int64, copy=False))
    task = ray.remote(_block_conflicts)
    conflicts = np.zeros(n, dtype=np.int64)
    for out in ray.get(
        [task.remote(r, color_ref, pos_ref) for r in graph.edge_block_refs()]
    ):
        if out is not None:
            np.add.at(conflicts, out[0], out[1])

    comps = np.unique(comp_pos)
    nv = np.bincount(comp_pos, minlength=n)[comps]
    nc = conflicts[comps]
    return pa.table(
        {
            "component": pa.array(ids[comps], pa.int64()),
            "n_vertices": pa.array(nv.astype(np.int64), pa.int64()),
            "n_conflicts": pa.array(nc, pa.int64()),
            "is_bipartite": pa.array((nc == 0).astype(np.int64), pa.int64()),
        }
    )
