"""Minimum spanning forest — distributed Borůvka.

The reference's analytics family is vertex-centric iteration over a
shared CSR (SURVEY §2.5); Borůvka is the classic member that LLAMA
does not ship, expressed here in the repo's standard superstep shape:
per-round per-edge-block Ray tasks against a driver-broadcast O(V)
component array, O(log V) rounds.

Determinism: edges are totally ordered by the lexicographic key
``(weight, a, b)`` with ``a < b`` the canonical (dense) endpoints.
Dense indices are order-isomorphic to the sorted original ids, so the
order — and therefore the unique forest it induces — replays exactly
in SQL (``pipelines/oracles.py::msf_sql``, the unrolled-round oracle
pattern of MIS/WCC).

Per round:

1. every edge block (one plain Ray task per pinned block ref, the
   ``Graph.edge_block_refs`` pattern) reduces to ≤ 1 candidate edge
   per (component, side) — the block-local minimum cross-component
   edge for each incident component — and simultaneously compacts
   itself to the surviving cross edges (intra-component edges can
   never re-enter; the compacted arrays stay in the object store as
   the next round's input, so late rounds touch only the shrinking
   frontier instead of rescanning all E edges);
2. the partials are min-merged by a fan-in-8 tree of Ray tasks (min
   under a total order is associative), so the driver sees only the
   final ≤ C_active rows — never the O(E) round-1 candidate set;
3. components hook along their chosen edge. The hooking digraph has
   out-degree 1 and — because each pointer follows a *minimum* edge
   under a strict total order — its only cycles are 2-cycles (keys
   weakly decrease around any cycle, hence are all equal, hence the
   same edge). 2-cycles are broken toward the smaller component id,
   then pointer doubling contracts every tree to its root.

Components at least halve each round, so ≤ ⌈log2 V⌉ rounds; with all
weights distinct under the total order the chosen edge set is exactly
the unique MSF (cut property per component, no cycles ever formed).
Measured at RMAT-22 / 64M deduped undirected edges (32 CPUs):
66.8 s naive → 51.3 s with compaction + merge tree → 17.4 s with the
radix-argsort/reduceat reduction (BASELINE.md §3.2a2).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from ..common import SRC, DST, WEIGHT, batch_to_numpy
from ..graph import Graph

MAX_ROUNDS = 64


def _min_per_component(c, ww, aa, bb, n):
    """Minimum (w, a, b) row per component.

    One stable int64 argsort on the component key (numpy radix sort —
    ~5× cheaper than the equivalent 4-key lexsort on tens of millions
    of rows), ``minimum.reduceat`` for the per-run weight minimum,
    then the (a, b) tie-break as a second reduceat over the packed
    key ``a·n + b`` (monotonic in lexicographic (a, b) for
    0 ≤ a, b < n; requires n < 2^31 so the pack fits int64, which the
    int32 dense edge storage already guarantees).
    """
    if len(c) == 0:
        return None
    order = np.argsort(c, kind="stable")
    c, ww = c[order], ww[order]
    ab = aa[order].astype(np.int64, copy=False) * n + bb[order]
    first = np.ones(len(c), dtype=bool)
    first[1:] = c[1:] != c[:-1]
    starts = np.flatnonzero(first)
    lens = np.diff(np.append(starts, len(c)))
    wmin = np.minimum.reduceat(ww, starts)
    tie = ww == np.repeat(wmin, lens)
    ct, abt = c[tie], ab[tie]
    first2 = np.ones(len(ct), dtype=bool)
    first2[1:] = ct[1:] != ct[:-1]
    starts2 = np.flatnonzero(first2)
    abmin = np.minimum.reduceat(abt, starts2)
    return c[starts], wmin, abmin // n, abmin % n


def _round_block(block, comp: np.ndarray, weight_col: str, n: int):
    """One Borůvka round over one edge block.

    ``block`` is an Arrow table (round 1) or the (s, d, w) numpy tuple
    a previous round compacted. Returns

      (partial, kept) — partial: (c, w, a, b) block-local minimum per
      incident component (or None); kept: the surviving cross edges as
      an (s, d, w) tuple (or None when the block is exhausted).

    Both return values travel as separate ObjectRefs (num_returns=2):
    the partial feeds the merge tree, the compacted edges feed the
    next round without ever touching the driver.
    """
    if block is None:  # exhausted in an earlier round
        return None, None
    if isinstance(block, tuple):
        s, d, w = block
    else:
        if block.num_rows == 0 or SRC not in block.schema.names:
            return None, None
        s = batch_to_numpy(block, SRC)  # int32 dense storage kept as-is
        d = batch_to_numpy(block, DST)
        w = batch_to_numpy(block, weight_col)
    cs = comp[s]
    cd = comp[d]
    m = cs != cd
    if not m.any():
        return None, None
    s, d, w, cs, cd = s[m], d[m], w[m], cs[m], cd[m]
    # each cross edge is a candidate for BOTH endpoint components
    partial = _min_per_component(
        np.concatenate([cs, cd]),
        np.concatenate([w, w]),
        np.concatenate([s, s]),
        np.concatenate([d, d]),
        n,
    )
    return partial, (s, d, w)


def _merge_min(n, *parts):
    """Min-merge partials (associative under the total order) —
    fan-in-8 tree nodes between the blocks and the driver."""
    parts = [p for p in parts if p is not None]
    if not parts:
        return None
    if len(parts) == 1:
        return parts[0]
    return _min_per_component(
        np.concatenate([p[0] for p in parts]),
        np.concatenate([p[1] for p in parts]),
        np.concatenate([p[2] for p in parts]),
        np.concatenate([p[3] for p in parts]),
        n,
    )


def minimum_spanning_forest(graph: Graph, *, weight_col: str = WEIGHT) -> pa.Table:
    """Edges of the minimum spanning forest as (src, dst, weight) in
    original ids with ``src < dst``.

    ``graph`` must be built from canonically ordered weighted pairs
    (``src < dst``, one row per undirected pair) so each undirected
    edge appears exactly once.
    """
    n = graph.num_vertices
    ids = graph.ids
    if n >= (1 << 31):
        # the packed (a, b) tie-break key needs a·n + b < 2^63; shard
        # the id space (SURVEY §2.4 partitioning note) beyond this
        raise NotImplementedError("MSF packed tie-break requires < 2^31 vertices")
    if n == 0:
        return pa.table(
            {
                SRC: pa.array([], pa.int64()),
                DST: pa.array([], pa.int64()),
                WEIGHT: pa.array([], pa.float64()),
            }
        )
    task = ray.remote(num_returns=2)(_round_block)
    merge = ray.remote(_merge_min)

    live = list(graph.edge_block_refs())
    comp = np.arange(n, dtype=np.int64)
    idx = np.arange(n, dtype=np.int64)
    out_a, out_b, out_w = [], [], []
    for _ in range(MAX_ROUNDS):
        comp_ref = ray.put(comp)
        outs = [task.remote(r, comp_ref, weight_col, n) for r in live]
        part_refs = [p for p, _ in outs]
        kept_refs = [k for _, k in outs]
        # fan-in-8 merge tree: the driver only ever receives the final
        # ≤ C_active-row partial, never the O(E) round-1 candidate set
        while len(part_refs) > 8:
            part_refs = [
                merge.remote(n, *part_refs[i : i + 8])
                for i in range(0, len(part_refs), 8)
            ]
        merged = _merge_min(n, *ray.get(part_refs))
        if merged is None:
            break
        c, w, a, b = merged
        # next round scans only the surviving cross edges; exhausted
        # blocks carry a None ref forward (their tasks are no-ops) so
        # the kept arrays never travel through the driver
        live = kept_refs

        # forest edges this round: both endpoint components may choose
        # the same edge — dedup on (a, b)
        eorder = np.lexsort((b, a))
        ea, eb, ew = a[eorder], b[eorder], w[eorder]
        efirst = np.ones(len(ea), dtype=bool)
        efirst[1:] = (ea[1:] != ea[:-1]) | (eb[1:] != eb[:-1])
        out_a.append(ea[efirst])
        out_b.append(eb[efirst])
        out_w.append(ew[efirst])

        # hook each choosing component to the other endpoint's component
        parent = idx.copy()
        other = np.where(comp[a] == c, comp[b], comp[a])
        parent[c] = other
        # break the mutual-choice 2-cycles toward the smaller id
        two = (parent[parent] == idx) & (idx < parent)
        parent[two] = idx[two]
        # pointer doubling to the roots
        while True:
            nxt = parent[parent]
            if np.array_equal(nxt, parent):
                break
            parent = nxt
        comp = parent[comp]
    else:
        raise RuntimeError(f"Borůvka did not converge in {MAX_ROUNDS} rounds")

    a = np.concatenate(out_a) if out_a else np.empty(0, np.int64)
    b = np.concatenate(out_b) if out_b else np.empty(0, np.int64)
    w = np.concatenate(out_w) if out_w else np.empty(0, np.float64)
    return pa.table(
        {
            SRC: pa.array(ids[a], pa.int64()),
            DST: pa.array(ids[b], pa.int64()),
            WEIGHT: pa.array(w.astype(np.float64), pa.float64()),
        }
    )
