"""SNAP / .net whitespace edge-list loader.

Reference: ``net_loader`` parses ``tail head`` text lines, skipping
comment lines and tolerating up to 100 malformed lines
(`/root/reference/llama/include/llama/loaders/ll_load_net.h:78-81,231,245-260`).

Ray-native: ``read_text`` → per-batch parse. Malformed rows are
counted and dropped; exceeding the tolerance inside any batch aborts
the run like the reference does (the reference's bound is global, so
this per-batch bound is at least as strict — no silent drops).
"""

from __future__ import annotations

import pyarrow as pa
import ray.data as rd

MAX_ALLOWED_ERRORS = 100  # ll_load_net.h:231


def _parse_batch(batch: pa.Table) -> pa.Table:
    lines = batch.column("text").to_pylist()
    src, dst, errors = [], [], 0
    for ln in lines:
        s = ln.strip()
        if not s or s.startswith("#") or s.startswith("%"):
            continue
        parts = s.split()
        try:
            a, b = int(parts[0]), int(parts[1])
        except (ValueError, IndexError):
            errors += 1
            continue
        src.append(a)
        dst.append(b)
    if errors > MAX_ALLOWED_ERRORS:
        raise ValueError(f"too many malformed edge lines in batch: {errors}")
    return pa.table({"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())})


def read_net(paths: str | list[str]) -> rd.Dataset:
    """Edge Dataset (src, dst) from SNAP-format text files."""
    txt = rd.read_text(paths)
    return txt.map_batches(_parse_batch, batch_format="pyarrow")
