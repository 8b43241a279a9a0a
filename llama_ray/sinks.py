"""Sinks / outputs (SURVEY §2.2).

- :func:`print_results` — the reference's golden-output format:
  first ≤50 per-node values, one per line, floats as ``%0.10f``
  (`/root/reference/benchmark/benchmarks/benchmark.h:566-647`). This
  is what its CI diffs against expected files.
- :func:`dump_graph` — every adjacency list, sorted
  (``benchmark/tools/dump.h:55-90``).
- :func:`print_adjacency` — out-neighborhoods of a node range
  (``-P N[-M]``, ``benchmark/benchmark.cc:1696-1713``).
- :func:`write_results_parquet` — full per-vertex results, written as
  partitioned Parquet (the at-scale sink).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from .common import batch_to_numpy
from .graph import Graph


def print_results(graph: Graph, values: np.ndarray, *, limit: int = 50) -> str:
    """Golden text: per-vertex values for the first ``limit`` vertices
    in ascending id order; floats rendered ``%0.10f`` like the
    reference's ``print_results_part``."""
    order = np.argsort(graph.ids)[:limit]
    lines = []
    for i in order:
        v = values[i]
        if isinstance(v, (np.floating, float)):
            lines.append(f"{graph.ids[i]}: {v:0.10f}")
        else:
            lines.append(f"{graph.ids[i]}: {v}")
    return "\n".join(lines) + "\n"


def write_results_parquet(graph: Graph, arrays: dict[str, np.ndarray], path: str) -> None:
    table = pa.table({"vertex": pa.array(graph.ids), **{k: pa.array(v) for k, v in arrays.items()}})
    pq.write_table(table, path, row_group_size=1 << 20)


def dump_graph(edges: rd.Dataset) -> "rd.Dataset":
    """All edges sorted by (src, dst) — pipe to write_csv/write_parquet."""
    return edges.sort(["src", "dst"])


def print_adjacency(edges: rd.Dataset, lo: int, hi: int | None = None) -> dict[int, list[int]]:
    """Out-neighborhoods of nodes in [lo, hi] (hi defaults to lo) —
    a filtered scan, never a full collect."""
    if hi is None:
        hi = lo

    def filt(batch: pa.Table) -> pa.Table:
        s = batch_to_numpy(batch, "src")
        return batch.filter(pa.array((s >= lo) & (s <= hi)))

    out: dict[int, list[int]] = {}
    for b in edges.map_batches(filt, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for s, d in zip(batch_to_numpy(b, "src").tolist(), batch_to_numpy(b, "dst").tolist()):
            out.setdefault(s, []).append(d)
    for s in out:
        out[s].sort()
    return out
