"""Multiversioned snapshot store — LLAMA's levels as Parquet dirs.

Reference mapping (SURVEY §1.4, §2.10):

- CSR level / snapshot (``ll_mlcsr_sp.h:97-176``)  →  one directory
  ``level_%05d/`` of Parquet part files + ``manifest.json``;
- writable delta + ``checkpoint()`` (``ll_writable_graph.h:1957-2020``)
  →  ``ingest_batch(edges)`` writes the delta as the next level;
- deletion vector (``ll_mlcsr_helpers.h:90-107``: edge hidden when
  ``max_visible_level <= L``)  →  per-level ``deletes-*.parquet``
  tombstone pairs, filtered out of every read at level ≥ their own;
- sliding window ``-W`` (``benchmark.cc:1115-1124``: keep newest W
  levels)  →  ``set_window(w)`` deletes older level dirs;
- flatten / full merge (``tools/flatten.h:55-205``)  →  ``flatten()``
  compacts all visible edges into a single new level, deduped and
  sorted by (src, dst); "weights instead of duplicate edges"
  (``ll_writable_graph.h:725-779``) via ``weights='count'``;
- streaming micro-batches (``benchmark.cc:1769-1893``: pull batch →
  checkpoint → advance window → run tasks)  →  ``stream_ingest``.

Snapshot isolation comes free: levels are immutable once written, so
a reader holding ``edges(at_level=k)`` is unaffected by later
ingests (the reference needs COW page tables for the same property).
"""

from __future__ import annotations

import json
import os
import shutil
import time

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from ..common import batch_to_numpy
from ..ingest.canonicalize import dedup_edges


class SnapshotStore:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    # ------------------------------------------------------------ levels

    def levels(self) -> list[int]:
        out = []
        for name in os.listdir(self.root):
            if name.startswith("level_") and os.path.isdir(os.path.join(self.root, name)):
                if os.path.exists(os.path.join(self.root, name, "manifest.json")):
                    out.append(int(name[len("level_") :]))
        return sorted(out)

    def _level_dir(self, level: int) -> str:
        return os.path.join(self.root, f"level_{level:05d}")

    def num_levels(self) -> int:
        return len(self.levels())

    # ------------------------------------------------------------ ingest

    def ingest_batch(self, edges: rd.Dataset, *, deletes: rd.Dataset | None = None) -> int:
        """Checkpoint a delta into the next immutable level. Written
        atomically: data lands in the dir first, manifest last (a dir
        without manifest is invisible → safe to resume)."""
        levels = self.levels()
        level = (levels[-1] + 1) if levels else 0
        d = self._level_dir(level)
        edges_dir = os.path.join(d, "edges")
        os.makedirs(edges_dir, exist_ok=True)
        edges.write_parquet(edges_dir)
        n_deletes = 0
        if deletes is not None:
            del_dir = os.path.join(d, "deletes")
            os.makedirs(del_dir, exist_ok=True)
            deletes.select_columns(["src", "dst"]).write_parquet(del_dir)
            n_deletes = deletes.count()
        manifest = {
            "level": level,
            "num_edges": edges.count(),
            "num_deletes": n_deletes,
            "created": time.time(),
        }
        with open(os.path.join(d, "manifest.json"), "w") as f:
            json.dump(manifest, f)
        return level

    # -------------------------------------------------------------- read

    def _tombstones_upto(self, level: int) -> set[tuple[int, int]]:
        """All (src, dst) deleted at or before ``level``. Collected to
        the driver and broadcast — tombstone sets are deltas, small
        relative to the edge set; at extreme scale the same filter
        runs as a sort-merge anti-join instead."""
        pairs: set[tuple[int, int]] = set()
        for lv in self.levels():
            if lv > level:
                break
            del_dir = os.path.join(self._level_dir(lv), "deletes")
            if os.path.isdir(del_dir):
                t = rd.read_parquet(del_dir).to_pandas()
                pairs.update(zip(t["src"].tolist(), t["dst"].tolist()))
        return pairs

    def edges(self, *, at_level: int | None = None, min_level: int | None = None) -> rd.Dataset:
        """Union of level deltas visible at ``at_level`` (default:
        newest), minus tombstones — the reference's cross-level
        iteration with deletion vectors."""
        levels = self.levels()
        if not levels:
            raise ValueError("empty snapshot store")
        if at_level is None:
            at_level = levels[-1]
        use = [lv for lv in levels if lv <= at_level and (min_level is None or lv >= min_level)]
        parts = [rd.read_parquet(os.path.join(self._level_dir(lv), "edges")) for lv in use]
        ds = parts[0] if len(parts) == 1 else parts[0].union(*parts[1:])
        tombs = self._tombstones_upto(at_level)
        if not tombs:
            return ds
        tomb_ref = ray.put(np.array(sorted(t[0] << 32 | t[1] for t in tombs), dtype=np.uint64))

        def filt(batch: pa.Table) -> pa.Table:
            ts = ray.get(tomb_ref)
            src = batch_to_numpy(batch, "src")
            dst = batch_to_numpy(batch, "dst")
            key = (src.astype(np.uint64) << np.uint64(32)) | dst.astype(np.uint64)
            pos = np.searchsorted(ts, key)
            pos = np.clip(pos, 0, len(ts) - 1)
            keep = ts[pos] != key
            return batch.filter(pa.array(keep))

        return ds.map_batches(filt, batch_format="pyarrow")

    # --------------------------------------------------------- mutation

    def delete_edges(self, deletes: rd.Dataset) -> int:
        """Tombstone a set of (src, dst) pairs as a new level (the
        reference's deletion-vector write, ``ll_writable_graph.h:791``)."""
        empty = rd.from_arrow(
            pa.table({"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())})
        )
        return self.ingest_batch(empty, deletes=deletes)

    def delete_level(self, level: int) -> None:
        shutil.rmtree(self._level_dir(level), ignore_errors=True)

    def set_window(self, w: int) -> None:
        """Retain only the newest ``w`` levels (streaming ``-W``)."""
        levels = self.levels()
        for lv in levels[:-w] if w < len(levels) else []:
            self.delete_level(lv)

    # ------------------------------------------------------- compaction

    def flatten(self, *, weights: str = "none") -> int:
        """Full merge of all visible edges into one new level, deduped
        and sorted by (src, dst); older levels are dropped. With
        ``weights='count'`` duplicate multiplicity becomes a weight
        column (streaming weights-instead-of-duplicate-edges)."""
        merged = dedup_edges(self.edges(), weights=weights).sort(["src", "dst"])
        old = self.levels()
        new_level = self.ingest_batch(merged)
        for lv in old:
            self.delete_level(lv)
        return new_level


def stream_ingest(
    store: SnapshotStore,
    batches,
    *,
    window: int | None = None,
    on_snapshot=None,
):
    """Micro-batch streaming loop (reference ``benchmark.cc:1769-1893``):
    for each incoming edge Dataset: checkpoint it as a level, advance
    the sliding window, then run ``on_snapshot(store, level)`` (the
    per-batch analytics the reference runs ``-c`` times)."""
    results = []
    for delta in batches:
        level = store.ingest_batch(delta)
        if window is not None:
            store.set_window(window)
        if on_snapshot is not None:
            results.append(on_snapshot(store, level))
    return results
