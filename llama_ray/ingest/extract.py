"""repo_files → link-graph edge extraction (the flagship ingest).

Derives a link graph from the source table ``(repo, path, commit,
lang, content)``:

- ``repo_contains_path``:  repo → file vertex
- ``commit_touches_path``: commit → file vertex
- ``path_imports_path``:   file → file, parsed from literal import /
  include lines inside ``content`` (per-lang compiled regexes)

Vertex ids are stable 64-bit hashes of ``f"{kind}:{name}"``
(:func:`llama_ray.common.hash64`), so no global renumber pass is
needed at ingest — densification happens later in
:func:`llama_ray.graph.build_graph`.

The per-row invariant (BASELINE.json ``input_hint``): every ingested
row carries ``sha256(content)``, re-checkable against the source
Parquet.

Hot-path layout: names repeat heavily (repos, commits, hub modules),
so hashing is unique-then-scatter — ``np.unique`` over the batch's
name strings, blake2b only on the distinct ones (cross-batch memo on
top), then an index gather back to rows. The import regexes are the
only inherently per-row work; they are compiled once per *process*
(module-level cache), which lets the stage run as an elastic
stateless task pool — no actor spin-up latency, no constructor args
in the object store (reference analogue: loader objects constructed
once and fed the whole stream, ``ll_load_utils.h:63-135``).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import ray.data as rd

from ..common import hash64

# import-line patterns per language → (pkg, mod) capture groups
_IMPORT_PATTERNS = {
    "py": r"^import pkg(\d+)\.mod(\d+)\s*$",
    "c": r'^#include "pkg(\d+)/mod(\d+)\.h"\s*$',
    "cc": r'^#include "pkg(\d+)/mod(\d+)\.h"\s*$',
    "h": r'^#include "pkg(\d+)/mod(\d+)\.h"\s*$',
    "rs": r"^use crate::pkg(\d+)::mod(\d+);\s*$",
    "go": r'^import "pkg(\d+)/mod(\d+)"\s*$',
    "js": r'^const mod(?:\d+) = require\("pkg(\d+)/mod(\d+)"\);\s*$',
}

_COMPILED: dict | None = None
_MEMO: dict[str, int] = {}  # per-process name → id memo
_MEMO_CAP = 2_000_000


def _compiled() -> dict:
    global _COMPILED
    if _COMPILED is None:
        _COMPILED = {k: re.compile(v, re.M) for k, v in _IMPORT_PATTERNS.items()}
    return _COMPILED


def vertex_id(kind: str, name: str) -> int:
    return hash64(f"{kind}:{name}")


def _hash_names(names: list[str], kind: str) -> np.ndarray:
    """Vertex ids for a list of (repeating) names: unique → hash only
    the distinct ones (memoized across batches) → gather back."""
    if not names:
        return np.empty(0, np.int64)
    u, inv = np.unique(np.asarray(names, dtype=object), return_inverse=True)
    hu = np.empty(len(u), np.int64)
    for i, name in enumerate(u):
        key = f"{kind}:{name}"
        v = _MEMO.get(key)
        if v is None:
            v = hash64(key)
            if len(_MEMO) < _MEMO_CAP:
                _MEMO[key] = v
        hu[i] = v
    return hu[inv]


def _const_str(value: str, n: int) -> pa.Array:
    return pa.array([value], pa.string()).take(pa.array(np.zeros(n, np.int32)))


def extract_link_edges(batch: pa.Table) -> pa.Table:
    """Batch transform: rows of repo_files → edge rows
    ``(src:int64, dst:int64, kind:string)``.

    Import targets resolve to the *path* vertex keyed by the
    extensionless module path (``repo:src/pkgA/modB``) on both the
    importing and declaring side — exact and collision-free within a
    repo."""
    repos = batch.column("repo").to_pylist()
    paths = batch.column("path").to_pylist()
    commits = batch.column("commit").to_pylist()
    langs = batch.column("lang").to_pylist()
    contents = batch.column("content").to_pylist()
    n = len(repos)

    file_v = _hash_names(
        [f"{r}:{p.rsplit('.', 1)[0]}" for r, p in zip(repos, paths)], "path"
    )
    repo_v = _hash_names(repos, "repo")
    commit_v = _hash_names([f"{r}:{c}" for r, c in zip(repos, commits)], "commit")

    # the only inherently per-row work: import-line regexes on content
    pats = _compiled()
    imp_src: list[int] = []
    imp_tgt_names: list[str] = []
    for i in range(n):
        pat = pats.get(langs[i])
        if pat is None:
            continue
        fv = int(file_v[i])
        repo = repos[i]
        for m in pat.finditer(contents[i]):
            imp_src.append(fv)
            imp_tgt_names.append(f"{repo}:src/pkg{m.group(1)}/mod{m.group(2)}")
    imp_tgt = _hash_names(imp_tgt_names, "path")

    src = np.concatenate([repo_v, commit_v, np.asarray(imp_src, np.int64)])
    dst = np.concatenate([file_v, file_v, imp_tgt])
    kind = pa.concat_arrays(
        [
            _const_str("repo_contains_path", n),
            _const_str("commit_touches_path", n),
            _const_str("path_imports_path", len(imp_src)),
        ]
    )
    return pa.table({"src": pa.array(src), "dst": pa.array(dst), "kind": kind})


class ExtractLinkEdges:
    """Back-compat callable-class form of :func:`extract_link_edges`
    (for callers that want an explicit actor pool)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        return extract_link_edges(batch)


def add_sha256(batch: pa.Table) -> pa.Table:
    """sha256(content) column (the ingest invariant).

    The digest itself is inherently per-row, but the bytes are hashed
    straight out of the Arrow data buffer (offset slicing of a
    ``memoryview``) — no Python ``str`` materialization, no UTF-8
    re-encode, no ``to_pylist``.  At 100 TB the hash is then the only
    per-row cost left in this stage.
    """
    col = batch.column("content").combine_chunks()
    chunks = col.chunks if isinstance(col, pa.ChunkedArray) else [col]
    digests: list[str] = []
    for chunk in chunks:
        if len(chunk) == 0:
            continue
        if chunk.null_count:
            # rare path: fall back to per-value access for null handling
            digests.extend(
                None if v is None else hashlib.sha256(v.encode("utf-8")).hexdigest()
                for v in chunk.to_pylist()
            )
            continue
        arr = chunk.cast(pa.large_string()) if chunk.type == pa.string() else chunk
        buf_off = memoryview(arr.buffers()[1])
        data = memoryview(arr.buffers()[2]) if arr.buffers()[2] is not None else memoryview(b"")
        offs = np.frombuffer(buf_off, np.int64, len(arr) + 1, arr.offset * 8)
        digests.extend(
            hashlib.sha256(data[offs[i] : offs[i + 1]]).hexdigest() for i in range(len(arr))
        )
    return batch.append_column("content_sha256", pa.array(digests, pa.string()))


def ingest_repo_files(
    repo_files: rd.Dataset, *, concurrency: int | tuple[int, int] | None = None
) -> tuple[rd.Dataset, rd.Dataset]:
    """The flagship ingest pipeline: returns ``(edges, manifest)``.

    ``edges``    — link edges (src, dst, kind), duplicates preserved
                   (dedup is a separate canonicalization step, as in
                   the reference's ``-D`` load flag).
    ``manifest`` — per-row (repo, path, commit, content_sha256) for
                   the integrity check against the source Parquet.

    Both stages run as stateless task pools (regex table compiled once
    per worker process) — elastic scheduling, no actor-restart hazard.
    """
    manifest = repo_files.map_batches(add_sha256, batch_format="pyarrow").select_columns(
        ["repo", "path", "commit", "content_sha256"]
    )
    kwargs = {}
    if concurrency is not None:
        kwargs["concurrency"] = concurrency
    edges = repo_files.map_batches(
        extract_link_edges, batch_format="pyarrow", batch_size=None, **kwargs
    )
    return edges, manifest
