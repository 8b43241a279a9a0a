"""Gather-scatter superstep harness.

One superstep of every iterative algorithm here is the same physical
plan (the Ray-Data-native replacement for the reference's OpenMP
``parallel for`` over vertices with shared-memory random access,
e.g. PageRank pull `/root/reference/benchmark/benchmarks/pagerank.h:117-178`):

1. **broadcast** the per-vertex state (dense numpy, ``ray.put`` once
   per superstep — zero-copy plasma reads in every task);
2. **scatter**: ``edges.map_batches(...)`` over zero-copy Arrow edge
   blocks emits (dst, contribution) *partials* — each batch
   pre-aggregates its messages by dst (combiner), so the shuffle
   carries at most one row per distinct dst per batch;
3. **gather**: hash-shuffle ``groupby('dst').aggregate(...)`` — the
   distributed replacement for the reference's atomics/spinlocks
   (``pagerank.h:297``, ``ll_lock.h``);
4. **apply**: stream the (small, ≤ num_vertices rows) aggregate back
   and update the dense state.

Skew note: the per-batch combiner in (2) already caps a hub vertex's
shuffle fan-in at (#blocks) rows, which is the two-stage "salted"
aggregate — partial sums per block, final sum in the groupby.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Callable, Optional

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd
from ray.data.aggregate import Min, Sum

from ..common import batch_to_numpy
from ..graph import Graph
from .checkpoint import CheckpointManager


def aggregate_messages(
    msgs: rd.Dataset,
    how: str = "sum",
    key: str = "dst",
    value: str = "v",
    mode: str = "driver",
    salt: int = 0,
):
    """Final combine of per-batch message partials → (keys, values).

    ``mode="driver"`` (default): stream the partials (≤ one row per
    distinct key per block — already combined inside ``map_batches``)
    to the driver and merge with a vectorized sparse reduce. This is
    the right topology while per-vertex state is driver-held: the
    state must reach the driver anyway to be re-broadcast next
    superstep, and a distributed groupby in between only re-shuffles
    rows that are about to be collected (measured 10-20× slower at
    single-node scale). Data volume is O(distinct keys × blocks).

    ``mode="shuffle"``: ``groupby(key)`` hash shuffle — the topology
    for sharded vertex state (each reducer owns a key range), used
    when the aggregate feeds a distributed stage instead of the
    driver. With ``salt=S > 1``, hub keys are split across S salted
    sub-keys first (``groupby([key, salt])`` partial combine) and the
    final groupby sums the ≤S salted partials — the degree-based hub
    split of SURVEY §4 for when per-batch combiners alone leave a hot
    reducer (many thousands of blocks × few giant keys).
    """
    if mode == "shuffle":
        agg = {"sum": Sum, "min": Min}[how]
        if salt > 1:
            def add_salt(batch: pa.Table):
                # deterministic row-cyclic salt: splits any hub's rows
                # across S reducers without an RNG in the hot path
                s = np.arange(batch.num_rows, dtype=np.int64) % salt
                return batch.append_column("_salt", pa.array(s))

            partial = (
                msgs.map_batches(add_salt, batch_format="pyarrow")
                .groupby([key, "_salt"])
                .aggregate(agg(value, alias_name=value))
            )
            out = partial.groupby(key).aggregate(agg(value, alias_name=value))
        else:
            out = msgs.groupby(key).aggregate(agg(value, alias_name=value))
        ks, vs = [], []
        for b in out.iter_batches(batch_size=1 << 20, batch_format="pyarrow"):
            ks.append(batch_to_numpy(b, key))
            vs.append(batch_to_numpy(b, value))
        if not ks:
            return np.empty(0, dtype=np.int64), np.empty(0)
        return np.concatenate(ks), np.concatenate(vs)

    from ..common import sparse_partial_min, sparse_partial_sum

    ks, vs = [], []
    for b in msgs.iter_batches(batch_size=1 << 20, batch_format="pyarrow"):
        ks.append(batch_to_numpy(b, key))
        vs.append(batch_to_numpy(b, value))
    if not ks:
        return np.empty(0, dtype=np.int64), np.empty(0)
    k = np.concatenate(ks)
    v = np.concatenate(vs)
    if how == "sum":
        return sparse_partial_sum(k, v)
    if how == "min":
        return sparse_partial_min(k, v)
    raise ValueError(f"unknown aggregate {how}")


def block_scatter(graph: Graph, fn, how: str, num_returns: int = 2):
    """One superstep scatter as plain Ray tasks over the graph's
    materialized edge blocks (``fn(arrow_table) -> tuple of arrays |
    None``), merged on the driver with a vectorized sparse reduce —
    identical math to the Dataset formulation without paying a
    streaming-executor launch (~0.3 s at 32 CPUs) per superstep.
    Returns (keys, values) like :func:`aggregate_messages`."""
    task = ray.remote(fn)
    outs = ray.get([task.remote(r) for r in graph.edge_block_refs()])
    ks, vs = [], []
    for o in outs:
        if o is None:
            continue
        ks.append(o[0])
        vs.append(o[1])
    if not ks:
        return np.empty(0, np.int64), np.empty(0)
    from ..common import sparse_partial_min, sparse_partial_sum

    k = np.concatenate(ks)
    v = np.concatenate(vs)
    return (sparse_partial_sum if how == "sum" else sparse_partial_min)(k, v)


@dataclass
class SuperstepResult:
    state: dict[str, np.ndarray]
    iterations: int
    converged: bool
    metrics: list[dict] = field(default_factory=list)

    @property
    def total_seconds(self) -> float:
        return sum(m["seconds"] for m in self.metrics)

    @property
    def edges_per_sec(self) -> float:
        total_edges = sum(m.get("edges_processed", 0) for m in self.metrics)
        secs = self.total_seconds
        return total_edges / secs if secs > 0 else 0.0


class SuperstepLoop:
    """Drives an algorithm's superstep function with checkpoint/resume.

    ``step(state, k) -> (new_state, diff, edges_processed)`` — diff is
    the algorithm's convergence measure (L1 for PageRank, #changed for
    label algorithms); the loop stops at ``max_iters`` or when
    ``diff <= tol`` (tol=None → fixed-iteration mode, the reference's
    default ``-n`` behavior, ``benchmark.cc:1463``).
    """

    def __init__(
        self,
        graph: Graph,
        *,
        algorithm: str,
        max_iters: int,
        tol: Optional[float] = None,
        checkpoint_dir: Optional[str] = None,
        resume: bool = False,
    ):
        self.graph = graph
        self.algorithm = algorithm
        self.max_iters = max_iters
        self.tol = tol
        self.ckpt = (
            CheckpointManager(
                checkpoint_dir,
                algorithm=algorithm,
                ids=graph.ids,
                num_edges=graph.num_edges,
            )
            if checkpoint_dir
            else None
        )
        self.resume = resume

    def run(
        self,
        init_state: Callable[[], dict[str, np.ndarray]],
        step: Callable[[dict[str, np.ndarray], int], tuple[dict[str, np.ndarray], float, int]],
    ) -> SuperstepResult:
        start_k = 0
        metrics: list[dict] = []
        if self.ckpt and self.resume:
            latest = self.ckpt.latest()
            if latest is not None:
                state, manifest = self.ckpt.load(latest)
                start_k = latest + 1
                metrics = list(manifest.get("metrics", {}).get("history", []))
                if manifest["metrics"].get("converged"):
                    return SuperstepResult(state, latest + 1, True, metrics)
            else:
                state = init_state()
        else:
            state = init_state()

        converged = False
        k = start_k
        while k < self.max_iters:
            t0 = time.perf_counter()
            state, diff, edges_processed = step(state, k)
            dt = time.perf_counter() - t0
            m = {
                "iteration": k,
                "diff": float(diff),
                "edges_processed": int(edges_processed),
                "seconds": dt,
                "edges_per_sec": edges_processed / dt if dt > 0 else 0.0,
            }
            metrics.append(m)
            converged = self.tol is not None and diff <= self.tol
            if self.ckpt:
                self.ckpt.save(
                    k, state, {"converged": converged, "last": m, "history": metrics}
                )
            k += 1
            if converged:
                break
        return SuperstepResult(state, k, converged, metrics)
