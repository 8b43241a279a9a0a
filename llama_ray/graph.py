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

from .common import SRC, DST, WEIGHT, batch_to_numpy


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
    reference, ``ll_mlcsr_helpers.h:141-149``).
    """

    edges: rd.Dataset
    ids: np.ndarray
    out_degrees: np.ndarray
    num_edges: int = 0
    _ids_ref: Optional["ray.ObjectRef"] = field(default=None, repr=False)

    @property
    def num_vertices(self) -> int:
        return len(self.ids)

    def in_degrees(self) -> np.ndarray:
        deg = np.zeros(self.num_vertices, dtype=np.int64)
        for b in self.edges.select_columns([DST]).iter_batches(
            batch_size=1 << 20, batch_format="pyarrow"
        ):
            np.add.at(deg, batch_to_numpy(b, DST), 1)
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


def build_graph(edges: rd.Dataset, *, materialize: bool = True) -> Graph:
    """Densify an int64-id edge Dataset into a :class:`Graph`.

    Pipeline: (1) distinct-vertex scan (map_batches partial uniques),
    (2) broadcast the sorted id array once via ``ray.put``, (3) remap
    src/dst to dense indices with ``np.searchsorted`` per batch —
    vectorized, no shuffle, (4) degree count via per-batch bincount
    partials merged on the driver.

    The dense edge Dataset is materialized (pinned blocks in the
    object store, spilling as needed) because iterative algorithms
    re-scan it every superstep — the analogue of the reference
    building its in-memory CSR once and iterating
    (``ll_load_utils.h:643-792``).
    """
    ids = unique_vertices(edges)
    ids_ref = ray.put(ids)

    def remap(batch: pa.Table) -> pa.Table:
        idx = ray.get(ids_ref)
        src = np.searchsorted(idx, batch_to_numpy(batch, SRC))
        dst = np.searchsorted(idx, batch_to_numpy(batch, DST))
        cols = {SRC: src.astype(np.int64), DST: dst.astype(np.int64)}
        out = pa.table(cols)
        for name in batch.schema.names:
            if name not in (SRC, DST):
                out = out.append_column(name, batch.column(name))
        return out

    dense = edges.map_batches(remap, batch_format="pyarrow")
    if materialize:
        dense = dense.materialize()
        # coalesce into ~1 block/CPU before iterating: supersteps rescan
        # this table every iteration, and per-block task overhead
        # dominates when an upstream shuffle (dedup groupby) left many
        # small blocks
        tgt = target_num_blocks(dense.count())
        if dense.num_blocks() > 2 * tgt or dense.num_blocks() < max(1, tgt // 2):
            dense = dense.repartition(tgt).materialize()

    deg = np.zeros(len(ids), dtype=np.int64)
    num_edges = 0
    for b in dense.select_columns([SRC]).iter_batches(
        batch_size=1 << 20, batch_format="pyarrow"
    ):
        s = batch_to_numpy(b, SRC)
        np.add.at(deg, s, 1)
        num_edges += len(s)

    return Graph(edges=dense, ids=ids, out_degrees=deg, num_edges=num_edges, _ids_ref=ids_ref)


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
