"""Per-superstep checkpointing with lineage + metrics.

The reference's multiversion levels are themselves its checkpoints
(`/root/reference/llama/include/llama/ll_persistent_storage.h:68-132`:
reopening a DB dir resumes from the last written level). Here each
superstep of an iterative algorithm writes

    <dir>/state_{k:05d}.parquet     per-vertex state (Parquet)
    <dir>/manifest_{k:05d}.json     lineage + metrics

and a resumed run loads the newest manifest whose state file exists
and is hash-consistent, then continues at iteration k+1. The manifest
records the graph fingerprint (num_vertices, num_edges, ids-hash) so
a resume against different input data is refused, plus per-superstep
metrics (edges processed, L1 diff, wall seconds) — the metrics the
reference prints per run (``benchmark.cc:538-556``).

State Parquet is written in row-partitioned chunks, so at scale each
partition is a separately re-readable unit (resumable output).
"""

from __future__ import annotations

import hashlib
import json
import os
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _ids_fingerprint(ids: np.ndarray) -> str:
    h = hashlib.sha256()
    h.update(np.ascontiguousarray(ids[:: max(1, len(ids) // 4096)]).tobytes())
    h.update(str(len(ids)).encode())
    return h.hexdigest()[:16]


def _state_hash(arrays: dict[str, np.ndarray]) -> str:
    h = hashlib.sha256()
    for name in sorted(arrays):
        h.update(name.encode())
        h.update(np.ascontiguousarray(arrays[name]).tobytes())
    return h.hexdigest()[:16]


class CheckpointManager:
    def __init__(self, directory: str, *, algorithm: str, ids: np.ndarray, num_edges: int):
        self.dir = directory
        self.algorithm = algorithm
        self.fingerprint = _ids_fingerprint(ids)
        self.num_vertices = len(ids)
        self.num_edges = num_edges
        os.makedirs(directory, exist_ok=True)

    def _paths(self, k: int) -> tuple[str, str]:
        return (
            os.path.join(self.dir, f"state_{k:05d}.parquet"),
            os.path.join(self.dir, f"manifest_{k:05d}.json"),
        )

    def save(self, k: int, arrays: dict[str, np.ndarray], metrics: dict) -> None:
        """Atomic write: temp file + rename, manifest written last so a
        manifest's existence implies a complete state file. 2-D state
        (batched algorithms: PPR, multi-source BC) is stored flattened
        with its shape recorded in the manifest."""
        state_path, manifest_path = self._paths(k)
        shapes = {name: list(arr.shape) for name, arr in arrays.items()}
        table = pa.table({name: pa.array(np.ravel(arr)) for name, arr in arrays.items()})
        fd, tmp = tempfile.mkstemp(dir=self.dir, suffix=".parquet.tmp")
        os.close(fd)
        pq.write_table(table, tmp, row_group_size=1 << 20)
        os.replace(tmp, state_path)
        manifest = {
            "algorithm": self.algorithm,
            "iteration": k,
            "graph": {
                "num_vertices": self.num_vertices,
                "num_edges": self.num_edges,
                "ids_fingerprint": self.fingerprint,
            },
            "state_hash": _state_hash(arrays),
            "state_shapes": shapes,
            "metrics": metrics,
        }
        fd, tmp = tempfile.mkstemp(dir=self.dir, suffix=".json.tmp")
        with os.fdopen(fd, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, manifest_path)

    def latest(self) -> int | None:
        """Newest iteration with a complete, fingerprint-matching
        manifest + state pair; None if nothing resumable."""
        best = None
        for name in os.listdir(self.dir):
            if name.startswith("manifest_") and name.endswith(".json"):
                k = int(name[len("manifest_") : -len(".json")])
                state_path, manifest_path = self._paths(k)
                if not os.path.exists(state_path):
                    continue
                with open(manifest_path) as f:
                    m = json.load(f)
                if m["graph"]["ids_fingerprint"] != self.fingerprint:
                    continue
                if m["algorithm"] != self.algorithm:
                    continue
                if best is None or k > best:
                    best = k
        return best

    def load(self, k: int) -> tuple[dict[str, np.ndarray], dict]:
        state_path, manifest_path = self._paths(k)
        with open(manifest_path) as f:
            manifest = json.load(f)
        table = pq.read_table(state_path)
        shapes = manifest.get("state_shapes", {})
        arrays = {}
        for name in table.schema.names:
            arr = table.column(name).to_numpy()
            if name in shapes and len(shapes[name]) > 1:
                arr = arr.reshape(shapes[name])
            arrays[name] = arr
        if _state_hash(arrays) != manifest["state_hash"]:
            raise ValueError(f"checkpoint {k} state hash mismatch — corrupt checkpoint")
        return arrays, manifest
