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
import ray
import ray.data as rd

from ..common import batch_to_numpy, pair_struct, pairs_member_mask, sorted_pair_struct
from .store import SnapshotStore


class WritableGraph:
    def __init__(self, store: SnapshotStore):
        self.store = store
        self._add_src: list[int] = []
        self._add_dst: list[int] = []
        self._add_nodes: list[int] = []
        self._bulk: list[rd.Dataset] = []
        self._del_pairs: list[tuple[int, int]] = []
        self._del_nodes: list[int] = []
        # name -> {key: value}; dict keying gives last-write-wins
        # within the pending delta (reference property writer
        # semantics, `ll_mlcsr_properties.h:728-770`)
        self._node_props: dict[str, dict[int, object]] = {}
        self._edge_props: dict[str, dict[tuple[int, int], object]] = {}

    # ------------------------------------------------------- mutations

    def add_edge(self, src: int, dst: int) -> None:
        self._add_src.append(src)
        self._add_dst.append(dst)

    def add_edges(self, src, dst) -> None:
        self._add_src.extend(int(x) for x in src)
        self._add_dst.extend(int(x) for x in dst)

    def add_node(self, node: int) -> None:
        """Explicit (possibly isolated) vertex — reference ``add_node``.
        Surfaces through ``store.nodes()``; edge-implied vertices need
        no declaration."""
        self._add_nodes.append(int(node))

    def add_edges_bulk(self, edges: rd.Dataset) -> None:
        """Parallel async load: buffer a whole edge Dataset; it is
        appended distributed at checkpoint (never materialized on the
        driver — the reference's bulk load path). Bulk edges bypass
        the ``add_edge_if_not_exists`` anti-join (plain append;
        run ``SnapshotStore.flatten`` to dedup)."""
        self._bulk.append(edges.select_columns(["src", "dst"]))

    def add_edge_if_not_exists(self, src: int, dst: int) -> None:
        # resolved at checkpoint: delta is deduped against the frozen set
        self._add_src.append(src)
        self._add_dst.append(dst)

    def set_node_property(self, name: str, node: int, value) -> None:
        """Buffer a named per-node property write; visible after
        ``checkpoint()`` via ``store.node_property(name)``. Properties
        are lazily created on first write (reference
        ``ll_mlcsr_properties.h:56-97``) and versioned per level —
        reads at an earlier level see the earlier value."""
        self._node_props.setdefault(name, {})[int(node)] = value

    def set_node_properties(self, name: str, nodes, values) -> None:
        """Bulk vectorized form of :meth:`set_node_property`."""
        buf = self._node_props.setdefault(name, {})
        for n, v in zip(nodes, values):
            buf[int(n)] = v

    def set_edge_property(self, name: str, src: int, dst: int, value) -> None:
        """Buffer a named per-edge property write (keyed by the
        (src, dst) pair), versioned per level like node properties."""
        self._edge_props.setdefault(name, {})[(int(src), int(dst))] = value

    def set_edge_properties(self, name: str, src, dst, values) -> None:
        """Bulk vectorized form of :meth:`set_edge_property`."""
        buf = self._edge_props.setdefault(name, {})
        for s, d, v in zip(src, dst, values):
            buf[(int(s), int(d))] = v

    def delete_edge(self, src: int, dst: int) -> None:
        self._del_pairs.append((src, dst))

    def delete_node(self, node: int) -> None:
        self._del_nodes.append(node)

    # ---------------------------------------------------- transactions
    #
    # Reference surface (`ll_writable_graph.h:176-212`): tx_begin hands
    # out a timestamp, tx_commit decrements a counter, tx_abort calls
    # abort() — near-no-ops over the batch write store. Here the batch
    # semantics make them real: begin marks the pending-buffer state,
    # commit checkpoints (the durability barrier), abort rolls the
    # buffers back to the mark.

    def tx_begin(self) -> int:
        """Mark the pending-mutation state; returns a tx id."""
        self._tx_mark = (
            len(self._add_src),
            len(self._add_nodes),
            len(self._bulk),
            len(self._del_pairs),
            len(self._del_nodes),
            {k: dict(v) for k, v in self._node_props.items()},
            {k: dict(v) for k, v in self._edge_props.items()},
        )
        self._tx_id = getattr(self, "_tx_id", 0) + 1
        return self._tx_id

    def tx_commit(self) -> int | None:
        """Checkpoint the pending delta — the commit barrier. Returns
        the new level (None when nothing was written)."""
        self._tx_mark = None
        return self.checkpoint()

    def tx_abort(self) -> None:
        """Drop every mutation buffered since ``tx_begin`` (immutable
        levels mean nothing earlier can have been touched)."""
        mark = getattr(self, "_tx_mark", None)
        if mark is None:
            raise RuntimeError("tx_abort without tx_begin")
        n_add, n_nodes, n_bulk, n_delp, n_deln, nprops, eprops = mark
        del self._add_src[n_add:]
        del self._add_dst[n_add:]
        del self._add_nodes[n_nodes:]
        del self._bulk[n_bulk:]
        del self._del_pairs[n_delp:]
        del self._del_nodes[n_deln:]
        self._node_props = nprops
        self._edge_props = eprops
        self._tx_mark = None

    # ------------------------------------------------------ checkpoint

    def _probe_store(self, probe_struct: np.ndarray) -> np.ndarray:
        """Which probe pairs exist in the frozen store — a broadcast
        anti-join probe: the (small) sorted delta is shipped once via
        ``ray.put``; the frozen edge Dataset streams through a
        ``map_batches`` that emits only matching probe indices. Driver
        state is O(len(probe)), never O(frozen edges)."""
        found = np.zeros(len(probe_struct), bool)
        if len(probe_struct) == 0 or not self.store.levels():
            return found
        probe_ref = ray.put(probe_struct)

        def check(batch: pa.Table):
            p = ray.get(probe_ref)
            s = batch_to_numpy(batch, "src")
            d = batch_to_numpy(batch, "dst")
            hit = pairs_member_mask(s, d, p)
            if not hit.any():
                return {"idx": np.empty(0, np.int64)}
            q = np.searchsorted(p, pair_struct(s[hit], d[hit]))
            return {"idx": np.unique(q)}

        for b in self.store.edges().map_batches(check, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        ):
            found[batch_to_numpy(b, "idx")] = True
        return found

    def checkpoint(self, *, dedup: bool = True) -> int | None:
        """Freeze pending mutations into a new snapshot level.

        Order of effects inside one checkpoint matches the reference's
        write store: deletions apply to the pre-existing graph; newly
        added edges in the same batch survive unless explicitly
        deleted too. All set logic is vectorized struct-pair matching
        + a streamed anti-join probe of the frozen store — no Python
        set of frozen edges is ever built (scales to stores that dwarf
        driver memory)."""
        if not (
            self._add_src
            or self._bulk
            or self._add_nodes
            or self._del_pairs
            or self._del_nodes
            or self._node_props
            or self._edge_props
        ):
            return None

        del_s = np.array([p[0] for p in self._del_pairs], np.int64)
        del_d = np.array([p[1] for p in self._del_pairs], np.int64)
        if self._del_nodes and self.store.levels():
            # expand node deletions to all incident frozen edges
            nodes = np.unique(np.array(sorted(set(self._del_nodes)), np.int64))
            nodes_ref = ray.put(nodes)

            def incident(batch: pa.Table):
                nn = ray.get(nodes_ref)
                s = batch_to_numpy(batch, "src")
                d = batch_to_numpy(batch, "dst")
                hit = np.isin(s, nn) | np.isin(d, nn)
                return {"src": s[hit], "dst": d[hit]}

            inc_s, inc_d = [del_s], [del_d]
            for b in self.store.edges().map_batches(
                incident, batch_format="pyarrow"
            ).iter_batches(batch_format="pyarrow"):
                inc_s.append(batch_to_numpy(b, "src"))
                inc_d.append(batch_to_numpy(b, "dst"))
            del_s = np.concatenate(inc_s)
            del_d = np.concatenate(inc_d)
        if len(del_s):
            dedup_del = np.unique(pair_struct(del_s, del_d))
            del_s, del_d = dedup_del["s"].copy(), dedup_del["d"].copy()
        del_struct = sorted_pair_struct(del_s, del_d) if len(del_s) else None

        src = np.array(self._add_src, np.int64)
        dst = np.array(self._add_dst, np.int64)
        if len(src):
            keep = np.ones(len(src), bool)
            if del_struct is not None:
                keep &= ~pairs_member_mask(src, dst, del_struct)
            if self._del_nodes:
                nodes = np.array(sorted(set(self._del_nodes)), np.int64)
                keep &= ~(np.isin(src, nodes) | np.isin(dst, nodes))
            src, dst = src[keep], dst[keep]
            if dedup and len(src):
                u = np.unique(pair_struct(src, dst))
                src, dst = u["s"].copy(), u["d"].copy()
                exists = self._probe_store(u)  # u is sorted (np.unique)
                src, dst = src[~exists], dst[~exists]

        adds = rd.from_arrow(pa.table({"src": pa.array(src), "dst": pa.array(dst)}))
        if self._bulk:
            # bulk datasets append distributed (deletion filters in the
            # same batch still apply, vectorized per block)
            bulk = self._bulk[0] if len(self._bulk) == 1 else self._bulk[0].union(*self._bulk[1:])
            if len(del_s) or self._del_nodes:
                dead_nodes = np.array(sorted(set(self._del_nodes)), np.int64)
                filt_ref = ray.put((del_struct, dead_nodes))

                def bulk_filter(batch: pa.Table) -> pa.Table:
                    ds_, dn_ = ray.get(filt_ref)
                    s = batch_to_numpy(batch, "src")
                    d = batch_to_numpy(batch, "dst")
                    keep = np.ones(len(s), bool)
                    if ds_ is not None:
                        keep &= ~pairs_member_mask(s, d, ds_)
                    if len(dn_):
                        keep &= ~(np.isin(s, dn_) | np.isin(d, dn_))
                    return batch.filter(pa.array(keep))

                bulk = bulk.map_batches(bulk_filter, batch_format="pyarrow")
            adds = adds.union(bulk) if len(src) else bulk
        deletes = None
        if len(del_s):
            deletes = rd.from_arrow(
                pa.table({"src": pa.array(del_s), "dst": pa.array(del_d)})
            )
        nodes = None
        if self._add_nodes:
            keep_nodes = np.unique(np.array(self._add_nodes, np.int64))
            if self._del_nodes:
                keep_nodes = keep_nodes[~np.isin(keep_nodes, np.array(sorted(set(self._del_nodes)), np.int64))]
            nodes = rd.from_arrow(pa.table({"node": pa.array(keep_nodes)}))
        node_deletes = None
        if self._del_nodes:
            node_deletes = rd.from_arrow(
                pa.table({"node": pa.array(sorted(set(self._del_nodes)), pa.int64())})
            )
        node_props = None
        if self._node_props:
            node_props = {
                name: rd.from_arrow(
                    pa.table(
                        {
                            "node": pa.array(list(buf.keys()), pa.int64()),
                            "value": pa.array(list(buf.values())),
                        }
                    )
                )
                for name, buf in self._node_props.items()
            }
        edge_props = None
        if self._edge_props:
            edge_props = {
                name: rd.from_arrow(
                    pa.table(
                        {
                            "src": pa.array([k[0] for k in buf], pa.int64()),
                            "dst": pa.array([k[1] for k in buf], pa.int64()),
                            "value": pa.array(list(buf.values())),
                        }
                    )
                )
                for name, buf in self._edge_props.items()
            }
        level = self.store.ingest_batch(
            adds,
            deletes=deletes,
            nodes=nodes,
            node_deletes=node_deletes,
            node_props=node_props,
            edge_props=edge_props,
        )
        self._add_src.clear()
        self._add_dst.clear()
        self._add_nodes.clear()
        self._bulk.clear()
        self._del_pairs.clear()
        self._del_nodes.clear()
        self._node_props.clear()
        self._edge_props.clear()
        return level

    # ------------------------------------------------------------ read

    def ro_edges(self) -> rd.Dataset:
        """The frozen (read-only) edge view — reference ``ro_graph()``."""
        return self.store.edges()
