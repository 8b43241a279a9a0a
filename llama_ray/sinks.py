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


def resumable_write_parquet(ds: rd.Dataset, root: str) -> dict:
    """Partitioned, resumable Parquet sink: one ``part_%05d/`` dir per
    input block, each committed atomically (data file first, `_DONE`
    marker last). A re-run after failure skips every partition whose
    marker exists — never one giant file, never a restart from zero
    (the at-scale output posture of the brief).

    Returns {"written": n, "skipped": n, "parts": total}.
    """
    import os

    import ray

    os.makedirs(root, exist_ok=True)
    refs = ds.to_arrow_refs()

    @ray.remote
    def _write(t: pa.Table, part_dir: str):
        os.makedirs(part_dir, exist_ok=True)
        pq.write_table(t, os.path.join(part_dir, "data.parquet"))
        with open(os.path.join(part_dir, "_DONE"), "w") as f:
            f.write("ok")
        return 1

    futs = []
    skipped = 0
    for i, r in enumerate(refs):
        part_dir = os.path.join(root, f"part_{i:05d}")
        if os.path.exists(os.path.join(part_dir, "_DONE")):
            skipped += 1
            continue
        futs.append(_write.remote(r, part_dir))
    written = int(sum(ray.get(futs))) if futs else 0
    return {"written": written, "skipped": skipped, "parts": len(refs)}


def read_resumable_parquet(root: str) -> rd.Dataset:
    """Read back only the committed partitions of a resumable sink."""
    import glob
    import os

    done = sorted(
        os.path.dirname(m) for m in glob.glob(os.path.join(root, "part_*", "_DONE"))
    )
    return rd.read_parquet([os.path.join(d, "data.parquet") for d in done])
