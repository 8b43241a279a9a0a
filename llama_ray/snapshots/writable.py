"""Writable graph — batched mutation API over the snapshot store.

Reference: ``ll_writable_graph`` (`/root/reference/llama/include/llama/ll_writable_graph.h`)
keeps a striped hash-of-adjacency-list delta store with per-node
locks (add_edge :575-663, delete :791+, checkpoint :1957-2020). The
Ray-native equivalent drops per-row locking entirely: mutations
buffer in driver-side Arrow builders (batch semantics), and
``checkpoint()`` freezes the delta into the next immutable snapshot
level. Reads see the last checkpointed snapshot (the reference's RO
graph) — matching its model where analytics run on frozen levels,
never the write store.

``add_edge_if_not_exists`` (reference :677-709) dedups against both
the frozen edge set and the pending delta at checkpoint time;
``delete_node`` (reference :392) tombstones every edge incident to
the node.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from ..common import batch_to_numpy
from .store import SnapshotStore


class WritableGraph:
    def __init__(self, store: SnapshotStore):
        self.store = store
        self._add_src: list[int] = []
        self._add_dst: list[int] = []
        self._del_pairs: list[tuple[int, int]] = []
        self._del_nodes: list[int] = []

    # ------------------------------------------------------- mutations

    def add_edge(self, src: int, dst: int) -> None:
        self._add_src.append(src)
        self._add_dst.append(dst)

    def add_edges(self, src, dst) -> None:
        self._add_src.extend(int(x) for x in src)
        self._add_dst.extend(int(x) for x in dst)

    def add_edge_if_not_exists(self, src: int, dst: int) -> None:
        # resolved at checkpoint: delta is deduped against the frozen set
        self._add_src.append(src)
        self._add_dst.append(dst)

    def delete_edge(self, src: int, dst: int) -> None:
        self._del_pairs.append((src, dst))

    def delete_node(self, node: int) -> None:
        self._del_nodes.append(node)

    # ------------------------------------------------------ checkpoint

    def checkpoint(self, *, dedup: bool = True) -> int | None:
        """Freeze pending mutations into a new snapshot level.

        Order of effects inside one checkpoint matches the reference's
        write store: deletions apply to the pre-existing graph; newly
        added edges in the same batch survive unless explicitly
        deleted too.
        """
        if not (self._add_src or self._del_pairs or self._del_nodes):
            return None

        del_pairs = set(self._del_pairs)
        if self._del_nodes:
            # expand node deletions to all incident frozen edges
            nodes = np.array(sorted(set(self._del_nodes)), np.int64)
            if self.store.levels():
                for b in self.store.edges().iter_batches(
                    batch_size=1 << 20, batch_format="pyarrow"
                ):
                    s = batch_to_numpy(b, "src")
                    d = batch_to_numpy(b, "dst")
                    hit = np.isin(s, nodes) | np.isin(d, nodes)
                    for x, y in zip(s[hit].tolist(), d[hit].tolist()):
                        del_pairs.add((x, y))

        src = np.array(self._add_src, np.int64)
        dst = np.array(self._add_dst, np.int64)
        if len(src):
            keep = np.ones(len(src), bool)
            if del_pairs:
                for i, (x, y) in enumerate(zip(src.tolist(), dst.tolist())):
                    if (x, y) in del_pairs:
                        keep[i] = False
            if self._del_nodes:
                nodes = np.array(sorted(set(self._del_nodes)), np.int64)
                keep &= ~(np.isin(src, nodes) | np.isin(dst, nodes))
            src, dst = src[keep], dst[keep]
            if dedup:
                pairs = np.unique(np.stack([src, dst]), axis=1)
                src, dst = pairs[0], pairs[1]
                if self.store.levels():
                    existing = set()
                    for b in self.store.edges().iter_batches(
                        batch_size=1 << 20, batch_format="pyarrow"
                    ):
                        existing.update(
                            zip(
                                batch_to_numpy(b, "src").tolist(),
                                batch_to_numpy(b, "dst").tolist(),
                            )
                        )
                    m = np.array(
                        [
                            (x, y) not in existing
                            for x, y in zip(src.tolist(), dst.tolist())
                        ],
                        bool,
                    )
                    src, dst = src[m], dst[m]

        adds = rd.from_arrow(pa.table({"src": pa.array(src), "dst": pa.array(dst)}))
        deletes = None
        if del_pairs:
            dp = sorted(del_pairs)
            deletes = rd.from_arrow(
                pa.table(
                    {
                        "src": pa.array([p[0] for p in dp], pa.int64()),
                        "dst": pa.array([p[1] for p in dp], pa.int64()),
                    }
                )
            )
        level = self.store.ingest_batch(adds, deletes=deletes)
        self._add_src.clear()
        self._add_dst.clear()
        self._del_pairs.clear()
        self._del_nodes.clear()
        return level

    # ------------------------------------------------------------ read

    def ro_edges(self) -> rd.Dataset:
        """The frozen (read-only) edge view — reference ``ro_graph()``."""
        return self.store.edges()
