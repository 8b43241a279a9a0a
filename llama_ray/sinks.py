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
    input block, each committed atomically (data file first, manifest +
    `_DONE` marker last). A re-run after failure skips every partition
    whose manifest matches the current block — never one giant file,
    never a restart from zero (the at-scale output posture of the
    brief).

    Resume is validated, not positional: each part's manifest records
    its row count, column names and total part count; a re-run whose
    dataset materializes with a DIFFERENT block layout (changed
    parallelism, upstream ordering, dynamic splitting) fails
    validation and rewrites instead of silently mixing stale parts
    with fresh ones. A root ``_MANIFEST.json`` pins the part count so
    stale higher-numbered parts from an older, wider layout are
    removed rather than read back.

    Returns {"written": n, "skipped": n, "parts": total}.
    """
    import glob
    import json
    import os
    import shutil

    import ray

    os.makedirs(root, exist_ok=True)
    refs = ds.to_arrow_refs()
    parts = len(refs)

    root_mf = os.path.join(root, "_MANIFEST.json")
    if os.path.exists(root_mf):
        try:
            with open(root_mf) as f:
                old_parts = int(json.load(f).get("parts", -1))
        except Exception:
            old_parts = -1
        if old_parts != parts:
            # layout changed: every positional skip is suspect — drop
            # all commit markers (forces rewrite) and stale extra dirs
            for d in glob.glob(os.path.join(root, "part_*")):
                shutil.rmtree(d, ignore_errors=True)
    with open(root_mf, "w") as f:
        json.dump({"parts": parts}, f)

    @ray.remote
    def _write_or_skip(t: pa.Table, part_dir: str, parts: int):
        mf_path = os.path.join(part_dir, "manifest.json")
        done_path = os.path.join(part_dir, "_DONE")
        expect = {
            "rows": t.num_rows,
            "columns": list(t.schema.names),
            "parts": parts,
        }
        if os.path.exists(done_path) and os.path.exists(mf_path):
            try:
                with open(mf_path) as f:
                    got = json.load(f)
            except Exception:
                got = None
            if got == expect:
                return 0  # committed and still matches this block
            os.remove(done_path)  # stale — force rewrite
        os.makedirs(part_dir, exist_ok=True)
        pq.write_table(t, os.path.join(part_dir, "data.parquet"))
        with open(mf_path, "w") as f:
            json.dump(expect, f)
        with open(done_path, "w") as f:
            f.write("ok")
        return 1

    outs = ray.get(
        [
            _write_or_skip.remote(r, os.path.join(root, f"part_{i:05d}"), parts)
            for i, r in enumerate(refs)
        ]
    )
    written = int(sum(outs))
    return {"written": written, "skipped": parts - written, "parts": parts}


def read_resumable_parquet(root: str) -> rd.Dataset:
    """Read back only the committed partitions of a resumable sink,
    bounded by the root manifest's part count (stale higher-numbered
    parts from an older layout are ignored)."""
    import glob
    import json
    import os

    parts = None
    root_mf = os.path.join(root, "_MANIFEST.json")
    if os.path.exists(root_mf):
        try:
            with open(root_mf) as f:
                parts = int(json.load(f)["parts"])
        except Exception:
            parts = None
    done = sorted(
        os.path.dirname(m) for m in glob.glob(os.path.join(root, "part_*", "_DONE"))
    )
    if parts is not None:
        done = [d for d in done if int(os.path.basename(d).split("_")[1]) < parts]
    return rd.read_parquet([os.path.join(d, "data.parquet") for d in done])
