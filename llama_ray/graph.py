"""Distributed graph representation on Ray Data.

The reference keeps a multi-level CSR in shared memory
(`/root/reference/llama/include/llama/ll_mlcsr_sp.h:97-176`: vertex
table + flat edge table). The Ray-Data-native analogue used here:

- the *edge table* is a ``ray.data.Dataset`` with int64 ``src``/``dst``
  columns (plus optional ``weight`` etc.) — blocks are Arrow tables;
- the *vertex table* (``ll_mlcsr_core__begin_t`` adjacency offsets +
  degree, ``ll_mlcsr_helpers.h:141-149``) is replaced by a dense
  vertex index: the sorted array of distinct vertex ids. Algorithms
  operate on dense indices ``0..N-1``; per-vertex state is a numpy
  array broadcast through the object store (``ray.put`` → zero-copy
  reads in every ``map_batches`` task);
- the reverse CSR (``make_reverse_edges``,
  ``ll_mlcsr_graph.h:955-1059``) needs no second copy: a gather over
  in-edges is expressed as scatter-on-out-edges + hash-shuffle
  ``groupby('dst')`` — the shuffle IS the transpose.

Scale posture: the edge Dataset streams/spills and is never collected
to the driver. Per-vertex dense arrays are O(N) on the driver and in
the object store; at 8 bytes/vertex this holds to ~10^9 vertices per
node. Beyond that the same algorithms run with vertex state sharded
across partition-pinned actors (hash(v) % P owners) — the message
shuffle is unchanged; see ``llama_ray.engine``.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from .common import SRC, DST, batch_to_numpy, sort_block_by_column


def collect_column_numpy(ds: rd.Dataset, col: str, dtype=None) -> np.ndarray:
    """Stream one column of a Dataset to a driver numpy array.

    Only for results known to be O(N_vertices) or smaller (degree
    tables, aggregated messages) — never the raw edge table.
    """
    parts = []
    for b in ds.select_columns([col]).iter_batches(
        batch_size=1 << 20, batch_format="pyarrow"
    ):
        parts.append(batch_to_numpy(b, col))
    if not parts:
        return np.empty(0, dtype=dtype or np.int64)
    out = np.concatenate(parts)
    return out.astype(dtype) if dtype is not None else out


def unique_vertices(edges: rd.Dataset) -> np.ndarray:
    """Sorted distinct vertex ids over src ∪ dst.

    Per-batch ``np.unique`` partials (combiner) → driver merge. The
    merged array is O(N_vertices); the analogue of the reference's
    max-node-id scan (``ll_load_utils.h:422-423``) generalized to
    sparse 64-bit ids.
    """

    def partial(batch: pa.Table):
        u = np.unique(
            np.concatenate([batch_to_numpy(batch, SRC), batch_to_numpy(batch, DST)])
        )
        return {"v": u}

    parts = []
    for b in edges.select_columns([SRC, DST]).map_batches(
        partial, batch_format="pyarrow"
    ).iter_batches(batch_size=1 << 20, batch_format="pyarrow"):
        parts.append(batch_to_numpy(b, "v"))
    if not parts:
        return np.empty(0, dtype=np.int64)
    return np.unique(np.concatenate(parts))


@dataclass
class Graph:
    """A densified graph: dense edge Dataset + vertex index.

    ``edges`` has int64 ``src``/``dst`` in ``[0, num_vertices)`` (plus
    any extra columns carried through); ``ids[i]`` is the original
    vertex id of dense index ``i``. ``out_degrees`` counts out-edges
    per dense vertex (the precomputed ``begin_t.degree`` of the
    reference, ``ll_mlcsr_helpers.h:141-149``); in-degrees are
    computed in the same build scan and cached.
    """

    edges: rd.Dataset
    ids: np.ndarray
    out_degrees: np.ndarray
    num_edges: int = 0
    _ids_ref: Optional["ray.ObjectRef"] = field(default=None, repr=False)
    _in_degrees: Optional[np.ndarray] = field(default=None, repr=False)
    # True when every materialized edge block is internally sorted by
    # dst (build_graph's final pass) — lets gather pools slice the
    # graph's own blocks instead of building a sorted copy
    _dst_sorted: bool = field(default=False, repr=False)

    @property
    def num_vertices(self) -> int:
        return len(self.ids)

    _block_refs: Optional[list] = field(default=None, repr=False)

    def edge_block_refs(self) -> list:
        """Arrow block refs of the (materialized) edge table, memoized.
        Iterative algorithms scatter over these as plain Ray tasks —
        one streaming-executor launch costs ~0.3 s at 32 CPUs, which
        would otherwise be paid EVERY superstep."""
        if self._block_refs is None:
            self._block_refs = self.edges.to_arrow_refs()
        return self._block_refs

    def in_degrees(self) -> np.ndarray:
        if self._in_degrees is not None:
            return self._in_degrees
        deg = np.zeros(self.num_vertices, dtype=np.int64)
        for b in self.edges.select_columns([DST]).iter_batches(
            batch_size=1 << 20, batch_format="pyarrow"
        ):
            np.add.at(deg, batch_to_numpy(b, DST), 1)
        self._in_degrees = deg
        return deg


def target_num_blocks(num_edges_hint: int | None = None) -> int:
    """Block count for the materialized edge table: ~1 block per CPU
    (supersteps scan the whole table every iteration, so fewer, larger
    blocks amortize per-task overhead), growing with data so a block
    stays ≤ ~8M edges (~128 MB of (src,dst) int64 pairs)."""
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    blocks = max(cpus, 2)
    if num_edges_hint:
        blocks = max(blocks, num_edges_hint // 8_000_000)
    return blocks


# Above this many vertex-scan partial rows, build_graph merges the
# per-block (v, cs, cd) partials with a tree of Ray tasks instead of a
# driver concatenation (which measured 10.6 GB RSS at V≈9M / E=268M).
# Below it, the flat driver merge is faster (no extra task rounds).
DRIVER_MERGE_ROWS = 8_000_000


def _merge_vertex_partials(*parts):
    """Merge vertex-scan partials — Arrow tables (leaf level) or
    already-merged (ids, out, in) triples — into one sorted triple."""
    vs, css, cds = [], [], []
    for p in parts:
        if isinstance(p, tuple):
            v, cs, cd = p
        else:
            if p.num_rows == 0 or "v" not in p.schema.names:
                continue  # empty block (schema may be upstream's)
            v = p.column("v").combine_chunks().to_numpy(zero_copy_only=False)
            cs = p.column("cs").combine_chunks().to_numpy(zero_copy_only=False)
            cd = p.column("cd").combine_chunks().to_numpy(zero_copy_only=False)
        vs.append(v)
        css.append(cs)
        cds.append(cd)
    if not vs:
        e = np.empty(0, np.int64)
        return e, e.copy(), e.copy()
    all_v = np.concatenate(vs)
    ids = np.unique(all_v)
    pos = np.searchsorted(ids, all_v)
    out_deg = np.bincount(pos, weights=np.concatenate(css), minlength=len(ids)).astype(np.int64)
    in_deg = np.bincount(pos, weights=np.concatenate(cds), minlength=len(ids)).astype(np.int64)
    return ids, out_deg, in_deg


def build_graph(edges: rd.Dataset, *, materialize: bool = True) -> Graph:
    """Densify an int64-id edge Dataset into a :class:`Graph`.

    Two pipeline executions total:

    1. **vertex scan**: one ``map_batches`` pass emits, per block, the
       distinct vertices with their src/dst occurrence counts — the
       driver merges them into the sorted id array, out-/in-degree
       vectors and the edge count with one ``bincount`` each (O(V)
       driver state, the engine's standard envelope);
    2. **remap + coalesce + materialize**: src/dst → dense indices via
       a broadcast ``searchsorted``, repartitioned to ~1 block/CPU in
       the same lazy chain (supersteps rescan this table every
       iteration, so fewer, larger blocks amortize per-task overhead),
       then pinned in the object store — the analogue of the reference
       building its in-memory CSR once and iterating
       (``ll_load_utils.h:643-792``).
    """

    # NOTE: build makes two passes (vertex scan, then remap), so a lazy
    # input re-executes its upstream pipeline twice. For cheap lineage
    # (a map over an already-materialized sort — the dedup path) that
    # beats pinning an extra full copy; materialize expensive inputs
    # (generators, regex ingest) at the call site when it matters.

    # Coarsen already-materialized fine-block inputs before the scan:
    # repartition of pinned blocks is a shuffle-free ref re-slice
    # (measured 0.3 s at E=268M), while scanning 200 small blocks
    # emits ~2x the vertex partials and task count of 32 coarse ones.
    try:
        if isinstance(edges, rd.dataset.MaterializedDataset):
            tgt = target_num_blocks(edges.count())
            if edges.num_blocks() > 2 * tgt:
                edges = edges.repartition(tgt).materialize()
    except Exception:
        pass

    def vertex_scan(batch: pa.Table):
        s = batch_to_numpy(batch, SRC)
        d = batch_to_numpy(batch, DST)
        u = np.unique(np.concatenate([s, d]))
        su, sc = np.unique(s, return_counts=True)
        du, dc = np.unique(d, return_counts=True)
        cs = np.zeros(len(u), np.int64)
        cs[np.searchsorted(u, su)] = sc
        cd = np.zeros(len(u), np.int64)
        cd[np.searchsorted(u, du)] = dc
        return {"v": u, "cs": cs, "cd": cd}

    parts_ds = (
        edges.select_columns([SRC, DST])
        .map_batches(vertex_scan, batch_format="pyarrow", batch_size=None)
        .materialize()
    )
    total_partial_rows = parts_ds.count()
    part_refs = parts_ds.to_arrow_refs()
    if total_partial_rows > DRIVER_MERGE_ROWS and len(part_refs) > 1:
        # tree-reduce the per-block partials in Ray tasks (fan-in 8):
        # at V≈10M the flat driver concatenation was 10.6 GB RSS and
        # the dominant build cost; the driver now touches only the
        # final O(V) arrays.
        merge = ray.remote(_merge_vertex_partials)
        refs = list(part_refs)
        while len(refs) > 1:
            refs = [
                merge.remote(*refs[i : i + 8]) for i in range(0, len(refs), 8)
            ]
        ids, out_deg, in_deg = ray.get(refs[0])
        num_edges = int(out_deg.sum())
    elif total_partial_rows > 0:
        vs, css, cds = [], [], []
        for b in ray.get(part_refs):
            if b.num_rows == 0 or "v" not in b.schema.names:
                continue  # empty block (schema may be upstream's)
            vs.append(batch_to_numpy(b, "v"))
            css.append(batch_to_numpy(b, "cs"))
            cds.append(batch_to_numpy(b, "cd"))
        all_v = np.concatenate(vs)
        vmin = int(all_v.min())
        vmax = int(all_v.max())
        if vmin >= 0 and vmax < (1 << 28) and vmax <= 4 * len(all_v):
            # dense-id fast path: direct bincount over the id space —
            # no 100M-row sort (measured 56 s → ~2 s at E=134M). Only
            # when the id space is comparably dense to the partials:
            # sparse spaces (TPC-H ids spread over 50M for 186k
            # vertices) pay more for the 400 MB scatter arrays than
            # the sort they avoid (measured 6 s vs 0.5 s).
            out_full = np.bincount(all_v, weights=np.concatenate(css), minlength=vmax + 1)
            in_full = np.bincount(all_v, weights=np.concatenate(cds), minlength=vmax + 1)
            present = (out_full + in_full) > 0
            ids = np.flatnonzero(present).astype(np.int64)
            out_deg = out_full[present].astype(np.int64)
            in_deg = in_full[present].astype(np.int64)
        else:
            ids = np.unique(all_v)
            pos = np.searchsorted(ids, all_v)
            out_deg = np.bincount(pos, weights=np.concatenate(css), minlength=len(ids)).astype(np.int64)
            in_deg = np.bincount(pos, weights=np.concatenate(cds), minlength=len(ids)).astype(np.int64)
        num_edges = int(out_deg.sum())
    else:
        ids = np.empty(0, np.int64)
        out_deg = in_deg = np.empty(0, np.int64)
        num_edges = 0
    ids_ref = ray.put(ids)

    # dense indices < V: int32 edge storage when they fit — halves the
    # pinned table, the repartition shuffle, and every downstream
    # consumer's read bandwidth (pool builds skip their own cast)
    idt = np.int32 if len(ids) <= (1 << 31) else np.int64

    # Dense-ish id spaces get an O(1) inverse scatter table instead of
    # a per-edge binary search (measured ~3x on the remap pass at
    # E=268M: 536M searchsorted probes vs 536M direct loads). Sparse
    # spaces keep searchsorted — the table would dwarf the ids.
    vmax = int(ids[-1]) if len(ids) else -1
    vmin = int(ids[0]) if len(ids) else 0
    use_inv = 0 <= vmin and 0 <= vmax < (1 << 28) and vmax <= 4 * len(ids)
    if use_inv:
        inv = np.zeros(vmax + 1, idt)
        inv[ids] = np.arange(len(ids), dtype=idt)
        inv_ref = ray.put(inv)

    def remap(batch: pa.Table) -> pa.Table:
        if use_inv:
            table = ray.get(inv_ref)
            src = table[batch_to_numpy(batch, SRC)]
            dst = table[batch_to_numpy(batch, DST)]
        else:
            idx = ray.get(ids_ref)
            src = np.searchsorted(idx, batch_to_numpy(batch, SRC))
            dst = np.searchsorted(idx, batch_to_numpy(batch, DST))
        cols = {
            SRC: src.astype(idt, copy=False),
            DST: dst.astype(idt, copy=False),
        }
        out = pa.table(cols)
        for name in batch.schema.names:
            if name not in (SRC, DST):
                out = out.append_column(name, batch.column(name))
        return out

    dense = edges.map_batches(remap, batch_format="pyarrow", batch_size=None)
    if materialize:
        # block-internal dst sort after the coalescing repartition: the
        # BSP gather pools then binary-search the graph's own pinned
        # blocks directly — no per-pool sorted copy of the edge table
        # (engine/bsp.py builds one otherwise)
        dense = (
            dense.repartition(target_num_blocks(num_edges))
            .map_batches(
                lambda t: sort_block_by_column(t, DST),
                batch_format="pyarrow",
                batch_size=None,
            )
            .materialize()
        )

    return Graph(
        edges=dense,
        ids=ids,
        out_degrees=out_deg,
        num_edges=num_edges,
        _ids_ref=ids_ref,
        _in_degrees=in_deg,
        _dst_sorted=materialize,
    )


def canonical_undirected(parent: Graph) -> Graph:
    """Canonical undirected simple graph derived from an already-dense
    parent: (min, max) per edge, self-loops dropped, exact dedup — as
    ONE single-int64-column sort (keys pack as ``lo·N + hi``) plus a
    per-block run-dedup, instead of re-running the generic 2-column
    dedup + full re-densification.

    Vertices that had only self-loops would drop out of the edge set;
    when that happens the graph is re-densified (rare), otherwise the
    parent's vertex index is reused as-is.
    """
    n = parent.num_vertices
    if n == 0:
        return parent
    if n >= (1 << 31):  # packed keys invalid — generic path
        from .ingest.canonicalize import dedup_edges, undirected_ordered

        g = build_graph(dedup_edges(undirected_ordered(parent.edges, drop_self_loops=True)))
        g.ids = parent.ids[g.ids]
        return g

    def keyed(batch: pa.Table):
        s = batch_to_numpy(batch, SRC)
        d = batch_to_numpy(batch, DST)
        lo = np.minimum(s, d).astype(np.int64)
        hi = np.maximum(s, d).astype(np.int64)
        keep = lo != hi
        return {"key": np.unique(lo[keep] * n + hi[keep])}

    srt = (
        parent.edges.map_batches(keyed, batch_format="pyarrow", batch_size=None)
        .repartition(target_num_blocks(parent.num_edges))
        .sort("key")
        .materialize()
    )

    cidt = np.int32 if n <= (1 << 31) else np.int64

    def interior(tbl: pa.Table):
        k = batch_to_numpy(tbl, "key")
        if len(k) == 0:
            return {SRC: k.astype(cidt), DST: k.astype(cidt)}
        kk = np.unique(k[(k != k[0]) & (k != k[-1])])
        return {SRC: (kk // n).astype(cidt), DST: (kk % n).astype(cidt)}

    def boundary_block(tbl: pa.Table):
        if tbl.num_rows == 0 or "key" not in tbl.schema.names:
            return None
        k = tbl.column("key").combine_chunks().to_numpy(zero_copy_only=False)
        return np.unique(k[(k == k[0]) | (k == k[-1])])

    from .common import check_boundary_size, per_block_results

    dense = srt.map_batches(interior, batch_format="pyarrow", batch_size=None)
    bparts = [r for r in per_block_results(srt, boundary_block) if r is not None and len(r)]
    if bparts:
        check_boundary_size(sum(len(p) for p in bparts), "canonical_undirected")
        bk = np.unique(np.concatenate(bparts))
        dense = dense.union(
            rd.from_arrow(
                pa.table(
                    {
                        SRC: pa.array((bk // n).astype(cidt)),
                        DST: pa.array((bk % n).astype(cidt)),
                    }
                )
            )
        )
    dense = dense.materialize()

    def deg_block(tbl: pa.Table):
        if tbl.num_rows == 0 or SRC not in tbl.schema.names:
            return None
        s = tbl.column(SRC).combine_chunks().to_numpy(zero_copy_only=False)
        d = tbl.column(DST).combine_chunks().to_numpy(zero_copy_only=False)
        su, sc = np.unique(s, return_counts=True)
        du, dc = np.unique(d, return_counts=True)
        return (su, sc, du, dc)

    out_deg = np.zeros(n, np.int64)
    in_deg = np.zeros(n, np.int64)
    num_edges = 0
    for r in per_block_results(dense, deg_block):
        if r is None:
            continue
        su, sc, du, dc = r
        out_deg[su] += sc
        in_deg[du] += dc
        num_edges += int(sc.sum())

    present = (out_deg + in_deg) > 0
    if present.all():
        return Graph(
            edges=dense,
            ids=parent.ids.copy(),
            out_degrees=out_deg,
            num_edges=num_edges,
            _in_degrees=in_deg,
        )
    # some vertices dropped (self-loop-only) → re-densify to the subset
    sub = np.flatnonzero(present)
    sub_ref = ray.put(sub)

    def remap(batch: pa.Table):
        m = ray.get(sub_ref)
        return {
            SRC: np.searchsorted(m, batch_to_numpy(batch, SRC)).astype(cidt),
            DST: np.searchsorted(m, batch_to_numpy(batch, DST)).astype(cidt),
        }

    dense2 = dense.map_batches(remap, batch_format="pyarrow", batch_size=None).materialize()
    return Graph(
        edges=dense2,
        ids=parent.ids[sub],
        out_degrees=out_deg[sub],
        num_edges=num_edges,
        _in_degrees=in_deg[sub],
    )


def undirect(edges: rd.Dataset, *, drop_self_loops: bool = False) -> rd.Dataset:
    """Emit both directions of every edge (reference undirected-double
    load mode ``LL_L_UNDIRECTED_DOUBLE`` / ``-U``,
    ``ll_load_utils.h:427-433``). Self-loops are emitted once, or
    dropped entirely with ``drop_self_loops``."""

    def double(batch: pa.Table) -> pa.Table:
        src = batch_to_numpy(batch, SRC)
        dst = batch_to_numpy(batch, DST)
        if drop_self_loops:
            keep = src != dst
            src, dst = src[keep], dst[keep]
            fwd = pa.table({SRC: src, DST: dst})
        else:
            fwd = pa.table({SRC: src, DST: dst})
        nonloop = src != dst
        rev = pa.table({SRC: dst[nonloop], DST: src[nonloop]})
        return pa.concat_tables([fwd, rev])

    return edges.select_columns([SRC, DST]).map_batches(double, batch_format="pyarrow")
