"""Incremental sliding-window PageRank over a snapshot stream.

The reference's streaming driver re-runs its task on the windowed
graph after every micro-batch (``benchmark.cc:1769-1893``), and the
bench's cold loop matched that shape by rebuilding the FULL window
graph and running PageRank from scratch per batch — O(E_window) work
where O(Δ) is available. This module is the incremental path the
round-4 review asked for: the graph-maintenance work per batch is
proportional to the DELTA, not the window.

Design (the delta-merge ``build_graph`` was asked to grow, realized
as a dedicated window structure so the cold build path stays
untouched):

- **Append-only global vertex index.** Original ids map to dense
  indices in FIRST-SEEN order; new ids append at the END, so dense
  edge blocks remapped when their level ARRIVED stay valid for the
  level's whole lifetime — no re-densification on window slides
  (inserting into a sorted index would shift every index after the
  insertion point and invalidate every cached block).
- **Per-level dense blocks pinned in plasma.** Each incoming level is
  remapped once, in per-block Ray tasks against the broadcast sorted
  index (``num_returns=2`` keeps the dense arrays in the object store
  — only the tiny degree/vertex-set partials visit the driver). The
  window is then just a list of block refs; eviction drops the
  evicted level's refs and subtracts its O(level) degree and
  presence contributions.
- **Active-set compaction without touching edges.** A vertex is
  active while any window level contains it. The per-advance
  ``relabel`` array (global dense → active dense) is O(V) driver
  work broadcast once; iteration tasks apply it to their block —
  edges are never rewritten when the active set shrinks.
- **Warm start.** Ranks are carried per global index; a new advance
  resumes from the previous window's converged ranks (new vertices
  start at 1/n), the ``snapshot_delta_pagerank`` pattern — with a
  ``tol`` this converges in a fraction of the cold iterations.

Semantics match :func:`llama_ray.algos.pagerank.pagerank` exactly
(pull, no dangling redistribution, L1 tol — reference
``pagerank.h:117-178``); a fixed-iteration cold-init ``advance`` is
bit-equal to ``pagerank(build_graph(store.edges(...)))`` up to
float-summation order across block layouts (identical after the
engine's 1e-6 output-rounding convention; raw ranks agree to ~1e-12
— tests/test_streaming_analytics.py pins both).

Adds-only streams (the reference streaming benchmark's shape): the
window is a union of level deltas; cross-level tombstone semantics
stay on the cold :meth:`SnapshotStore.edges` path.

At 100 TB: per-level blocks live in the object store and are only
ever touched by tasks; the driver holds O(V) index/degree/rank
vectors — the same envelope as ``build_graph``/the dataset PageRank
engine — and O(Δ) per batch otherwise.
"""

from __future__ import annotations

import numpy as np
import ray

from ..common import PAGERANK_D
from ..engine.superstep import SuperstepResult

__all__ = ["IncrementalPageRankWindow"]


@ray.remote(num_returns=2)
def _read_part(path):
    """Read one level parquet part as plain Ray work: the raw (src,
    dst) arrays stay in the object store (first return); only the
    part's distinct original ids visit the driver (second return)."""
    import pyarrow.parquet as _pq

    t = _pq.read_table(path, columns=["src", "dst"])
    src = t.column("src").combine_chunks().to_numpy(zero_copy_only=False)
    dst = t.column("dst").combine_chunks().to_numpy(zero_copy_only=False)
    return (src, dst), np.unique(np.concatenate([src, dst]))


@ray.remote(num_returns=2)
def _remap_block(raw_pair, sorted_ids, perm):
    """Dense-remap one level block: big dense (src, dst) pair stays in
    the object store (first return), tiny degree/vertex-set partials
    go to the driver (second return)."""
    rs, rd_ = raw_pair
    src = perm[np.searchsorted(sorted_ids, rs)]
    dst = perm[np.searchsorted(sorted_ids, rd_)]
    deg_idx, deg_cnt = np.unique(src, return_counts=True)
    vset = np.unique(np.concatenate([src, dst]))
    return (src, dst), (deg_idx, deg_cnt.astype(np.int64), vset, len(src))


@ray.remote
def _minlabel_block(pair, relabel, lab):
    """One undirected min-label superstep partial over a dense level
    block: per-endpoint minimum of the other endpoint's label."""
    src, dst = pair
    sa, da = relabel[src], relabel[dst]
    keys = np.concatenate([da, sa])
    vals = np.concatenate([lab[sa], lab[da]])
    u, inv = np.unique(keys, return_inverse=True)
    mins = np.full(len(u), np.iinfo(np.int64).max, np.int64)
    np.minimum.at(mins, inv, vals)
    return u, mins


@ray.remote
def _scatter_block(pair, relabel, w):
    """One pull-superstep partial: per-dst sums of w[src] over a dense
    level block, relabeled into the active index."""
    src, dst = pair
    u, inv = np.unique(relabel[dst], return_inverse=True)
    return u, np.bincount(inv, weights=w[relabel[src]], minlength=len(u))


class IncrementalPageRankWindow:
    """Carried state of the incremental streaming loop; one instance
    per stream. Per ingested level call :meth:`advance` (PageRank)
    and/or :meth:`advance_wcc` (min-label WCC) — the window slide is
    shared and idempotent per level, so both can run on one batch."""

    def __init__(self, *, damping: float = PAGERANK_D):
        self.damping = damping
        self.gids = np.empty(0, np.int64)  # append-order original ids
        self._sorted = np.empty(0, np.int64)
        self._perm = np.empty(0, np.int64)
        self.presence = np.empty(0, np.int64)  # levels containing vertex
        self.out_deg = np.empty(0, np.int64)
        self.levels: dict[int, dict] = {}  # level -> blocks/deg/vset/edges
        self._prev_rank: np.ndarray | None = None  # per global index
        self._prev_label: np.ndarray | None = None  # per global index
        self._evicted_since_slide = False

    @property
    def num_edges(self) -> int:
        return sum(lv["n_edges"] for lv in self.levels.values())

    def _grow(self, new_ids: np.ndarray) -> None:
        if len(new_ids) == 0:
            return
        self.gids = np.concatenate([self.gids, new_ids])
        order = np.argsort(self.gids, kind="stable")
        self._sorted = self.gids[order]
        self._perm = order
        pad = np.zeros(len(new_ids), np.int64)
        self.presence = np.concatenate([self.presence, pad])
        self.out_deg = np.concatenate([self.out_deg, pad])
        if self._prev_rank is not None:
            self._prev_rank = np.concatenate(
                [self._prev_rank, np.full(len(new_ids), np.nan)]
            )
        if self._prev_label is not None:
            # new vertices warm-start as their own component
            self._prev_label = np.concatenate([self._prev_label, new_ids])

    def ingest_level(self, store, level: int) -> None:
        """Remap ONLY the new level into the global index — O(Δ),
        plain Ray tasks over the level's parquet parts (no Dataset
        executor launch: at micro-batch cadence the fixed ~0.2 s
        launch cost would dominate the whole advance)."""
        files = store.level_edge_files(level)
        raw_refs, idp_refs = [], []
        for f in files:
            rr, ir = _read_part.remote(f)
            raw_refs.append(rr)
            idp_refs.append(ir)
        parts = ray.get(idp_refs)
        ids = np.unique(np.concatenate([p for p in parts if len(p)] or [np.empty(0, np.int64)]))
        pos = np.searchsorted(self._sorted, ids)
        pos_c = np.minimum(pos, max(len(self._sorted) - 1, 0))
        known = (
            (pos < len(self._sorted)) & (self._sorted[pos_c] == ids)
            if len(self._sorted)
            else np.zeros(len(ids), bool)
        )
        self._grow(ids[~known])
        # phase 2: per-block dense remap; dense pairs stay in plasma
        s_ref = ray.put(self._sorted)
        p_ref = ray.put(self._perm)
        pair_refs, meta_refs = [], []
        for b in raw_refs:
            pr, mr = _remap_block.remote(b, s_ref, p_ref)
            pair_refs.append(pr)
            meta_refs.append(mr)
        deg = np.zeros(len(self.gids), np.int64)
        vmask = np.zeros(len(self.gids), bool)
        n_edges = 0
        for deg_idx, deg_cnt, vset, ne in ray.get(meta_refs):
            deg[deg_idx] += deg_cnt
            vmask[vset] = True
            n_edges += ne
        vset_all = np.flatnonzero(vmask)
        deg_idx_all = np.flatnonzero(deg)
        self.levels[level] = {
            "blocks": pair_refs,
            "deg_idx": deg_idx_all,
            "deg_cnt": deg[deg_idx_all],
            "vset": vset_all,
            "n_edges": n_edges,
        }
        self.out_deg[deg_idx_all] += deg[deg_idx_all]
        self.presence[vset_all] += 1

    def _slide(self, store, level: int, window: int | None) -> None:
        """Ingest ``level`` (idempotent — a same-batch second compute
        like advance() + advance_wcc() skips the re-read) and evict
        past the window."""
        if level not in self.levels:
            self.ingest_level(store, level)
        if window is not None:
            for old in sorted(self.levels):
                if len(self.levels) <= window:
                    break
                self.evict_level(old)

    def evict_level(self, level: int) -> None:
        lv = self.levels.pop(level)
        self.out_deg[lv["deg_idx"]] -= lv["deg_cnt"]
        self.presence[lv["vset"]] -= 1
        self._evicted_since_slide = True

    def advance(
        self,
        store,
        level: int,
        *,
        window: int | None = None,
        max_iters: int = 10,
        tol: float | None = None,
        warm: bool = True,
    ):
        """Ingest ``level``, slide the window, run PageRank over the
        carried blocks. Returns ``(active_ids, SuperstepResult)`` —
        ``active_ids[i]`` is the original id of ``state['rank'][i]``."""
        self._slide(store, level, window)
        act = self.presence > 0
        n = int(act.sum())
        if n == 0:
            return np.empty(0, np.int64), SuperstepResult({"rank": np.empty(0)}, 0, True, [])
        relabel = np.full(len(self.gids), -1, np.int64)
        relabel[act] = np.arange(n)
        ids_act = self.gids[act]
        inv_deg = np.zeros(n, np.float64)
        deg_act = self.out_deg[act]
        nz = deg_act > 0
        inv_deg[nz] = 1.0 / deg_act[nz]
        base = (1.0 - self.damping) / n

        if warm and self._prev_rank is not None:
            rank = self._prev_rank[act]
            rank[~np.isfinite(rank)] = 1.0 / n
        else:
            rank = np.full(n, 1.0 / n, np.float64)

        relabel_ref = ray.put(relabel)
        block_refs = [b for lv in sorted(self.levels) for b in self.levels[lv]["blocks"]]
        iters, converged, metrics = 0, False, []
        import time as _time

        for _k in range(max_iters):
            t0 = _time.perf_counter()
            w_ref = ray.put(rank * inv_deg)
            acc = np.zeros(n, np.float64)
            for u, sums in ray.get(
                [_scatter_block.remote(b, relabel_ref, w_ref) for b in block_refs]
            ):
                acc[u] += sums
            new_rank = base + self.damping * acc
            diff = float(np.abs(new_rank - rank).sum())
            rank = new_rank
            iters += 1
            metrics.append(
                {"superstep": iters, "seconds": _time.perf_counter() - t0, "diff": diff}
            )
            if tol is not None and diff <= tol:  # SuperstepLoop's rule
                converged = True
                break

        prev = np.full(len(self.gids), np.nan)
        prev[act] = rank
        self._prev_rank = prev
        return ids_act, SuperstepResult({"rank": rank}, iters, converged, metrics)

    def advance_wcc(
        self,
        store,
        level: int,
        *,
        window: int | None = None,
        max_iters: int = 100,
    ):
        """Ingest ``level``, slide the window, run min-label WCC over
        the carried blocks (edges undirected). Warm-starts from the
        previous advance's labels when the slide only ADDED edges —
        exact for min-label (the snapshot-delta WCC argument:
        additions can only merge components, so converged labels stay
        valid initial values); an EVICTION invalidates that argument
        (the component minimum may have left), so the first advance
        after one falls back to cold own-id init — the round-4-review
        "cold on window eviction" rule, but per-advance instead of
        per-run. Returns ``(active_ids, SuperstepResult)`` with
        ``state['label'][i]`` = min original id in the component —
        exact integers, bit-equal to a cold rebuild by construction."""
        self._slide(store, level, window)
        # warm-start validity: has ANY slide evicted since the carried
        # labels were last saved? (a same-batch advance() may already
        # have evicted before this call — the flag is cleared only
        # below, when fresh labels are stored)
        act = self.presence > 0
        n = int(act.sum())
        if n == 0:
            return np.empty(0, np.int64), SuperstepResult({"label": np.empty(0, np.int64)}, 0, True, [])
        relabel = np.full(len(self.gids), -1, np.int64)
        relabel[act] = np.arange(n)
        ids_act = self.gids[act]

        warm_ok = self._prev_label is not None and not self._evicted_since_slide
        lab = self._prev_label[act] if warm_ok else ids_act.copy()

        relabel_ref = ray.put(relabel)
        block_refs = [b for lv in sorted(self.levels) for b in self.levels[lv]["blocks"]]
        iters, converged, metrics = 0, False, []
        import time as _time

        for _k in range(max_iters):
            t0 = _time.perf_counter()
            lab_ref = ray.put(lab)
            new_lab = lab.copy()
            for u, mins in ray.get(
                [_minlabel_block.remote(b, relabel_ref, lab_ref) for b in block_refs]
            ):
                np.minimum.at(new_lab, u, mins)
            changed = int((new_lab != lab).sum())
            lab = new_lab
            iters += 1
            metrics.append(
                {"superstep": iters, "seconds": _time.perf_counter() - t0, "diff": changed}
            )
            if changed == 0:
                converged = True
                break

        prev = self.gids.copy()  # inactive vertices revert to own id
        prev[act] = lab
        self._prev_label = prev
        self._evicted_since_slide = False  # labels fresh as of now
        return ids_act, SuperstepResult({"label": lab}, iters, converged, metrics)
