"""X-Stream Type 1 binary edge loader.

Reference: ``xs1_loader`` reads packed little-endian records
``{tail:u32, head:u32, weight:f32}`` from ``.dat``/``.xs1`` files
(`/root/reference/llama/include/llama/loaders/ll_load_xstream1.h:78-81,145-170`);
an optional ``.ini`` sidecar carries (nodes, edges) stats
(``:243-246,349``) — unnecessary here, Parquet/Dataset metadata and
aggregates replace it.

Ray-native: ``read_binary_files`` → ``np.frombuffer`` per file. One
file becomes one (or more) blocks; large inputs should be sharded
into multiple .xs1 files (the reference's own partial-load sharding,
``ll_load_net.h:213-223``, is file-granular here too).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

XS1_DTYPE = np.dtype([("tail", "<u4"), ("head", "<u4"), ("weight", "<f4")])


def _decode(batch: pa.Table) -> pa.Table:
    out = []
    for buf in batch.column("bytes").to_pylist():
        rec = np.frombuffer(buf, dtype=XS1_DTYPE)
        out.append(
            pa.table(
                {
                    "src": rec["tail"].astype(np.int64),
                    "dst": rec["head"].astype(np.int64),
                    "weight": rec["weight"].astype(np.float64),
                }
            )
        )
    if not out:
        return pa.table(
            {"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64()), "weight": pa.array([], pa.float64())}
        )
    return pa.concat_tables(out)


def read_xs1(paths: str | list[str]) -> rd.Dataset:
    """Edge Dataset (src, dst, weight) from xs1 binary files."""
    return rd.read_binary_files(paths).map_batches(_decode, batch_format="pyarrow")


def write_xs1(edges_table: pa.Table, path: str) -> None:
    """Driver-side helper for tests/format conversion (analogue of
    ``utils/snap-to-xs1.cpp``)."""
    n = edges_table.num_rows
    rec = np.empty(n, dtype=XS1_DTYPE)
    rec["tail"] = edges_table.column("src").to_numpy().astype(np.uint32)
    rec["head"] = edges_table.column("dst").to_numpy().astype(np.uint32)
    if "weight" in edges_table.schema.names:
        rec["weight"] = edges_table.column("weight").to_numpy().astype(np.float32)
    else:
        rec["weight"] = 0.0
    with open(path, "wb") as f:
        f.write(rec.tobytes())
