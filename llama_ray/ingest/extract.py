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
Parquet. The extraction itself is a stateful actor-pool stage — the
regex table is compiled once per actor in ``__init__`` and applied
per batch (reference analogue: loader objects constructed once and
fed the whole stream, ``ll_load_utils.h:63-135``).
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


def vertex_id(kind: str, name: str) -> int:
    return hash64(f"{kind}:{name}")


class ExtractLinkEdges:
    """Actor-pool batch transform: rows of repo_files → edge rows.

    Emits columns ``(src:int64, dst:int64, kind:string)``. Import
    targets are resolved to the *path* vertex ``repo/src/pkgA/modB.*``;
    since the extension of the target is unknown from the import line,
    the target vertex is keyed by its extensionless module path
    (``repo:src/pkgA/modB``) for both the importing side and the
    declaring side — exact and collision-free within a repo.
    """

    def __init__(self):
        self._compiled = {k: re.compile(v, re.M) for k, v in _IMPORT_PATTERNS.items()}
        # per-actor memo: repo/commit/path names repeat across rows
        # (hub modules especially), and blake2b-per-name dominates the
        # row loop otherwise
        self._memo: dict[str, int] = {}

    def _vid(self, kind: str, name: str) -> int:
        key = f"{kind}:{name}"
        v = self._memo.get(key)
        if v is None:
            v = hash64(key)
            if len(self._memo) < 2_000_000:  # bound actor memory
                self._memo[key] = v
        return v

    def __call__(self, batch: pa.Table) -> pa.Table:
        repos = batch.column("repo").to_pylist()
        paths = batch.column("path").to_pylist()
        commits = batch.column("commit").to_pylist()
        langs = batch.column("lang").to_pylist()
        contents = batch.column("content").to_pylist()

        src, dst, kind = [], [], []
        for repo, path, commit, lang, content in zip(repos, paths, commits, langs, contents):
            # module key = extensionless path, target key space for imports
            mod_key = path.rsplit(".", 1)[0]
            file_v = self._vid("path", f"{repo}:{mod_key}")
            src.append(self._vid("repo", repo))
            dst.append(file_v)
            kind.append("repo_contains_path")
            src.append(self._vid("commit", f"{repo}:{commit}"))
            dst.append(file_v)
            kind.append("commit_touches_path")
            pat = self._compiled.get(lang)
            if pat is not None:
                for m in pat.finditer(content):
                    pkg, mod = m.group(1), m.group(2)
                    tgt = self._vid("path", f"{repo}:src/pkg{pkg}/mod{mod}")
                    src.append(file_v)
                    dst.append(tgt)
                    kind.append("path_imports_path")

        return pa.table(
            {
                "src": pa.array(src, pa.int64()),
                "dst": pa.array(dst, pa.int64()),
                "kind": pa.array(kind, pa.string()),
            }
        )


def add_sha256(batch: pa.Table) -> pa.Table:
    """Vectorized-ish sha256(content) column (the ingest invariant)."""
    digests = [hashlib.sha256(c.encode("utf-8")).hexdigest() for c in batch.column("content").to_pylist()]
    return batch.append_column("content_sha256", pa.array(digests, pa.string()))


def ingest_repo_files(
    repo_files: rd.Dataset, *, concurrency: int | tuple[int, int] = (2, 32)
) -> tuple[rd.Dataset, rd.Dataset]:
    """The flagship ingest pipeline: returns ``(edges, manifest)``.

    ``edges``    — link edges (src, dst, kind), duplicates preserved
                   (dedup is a separate canonicalization step, as in
                   the reference's ``-D`` load flag).
    ``manifest`` — per-row (repo, path, commit, content_sha256) for
                   the integrity check against the source Parquet.
    """
    manifest = repo_files.map_batches(add_sha256, batch_format="pyarrow").select_columns(
        ["repo", "path", "commit", "content_sha256"]
    )
    edges = repo_files.map_batches(
        ExtractLinkEdges,
        batch_format="pyarrow",
        concurrency=concurrency,
    )
    return edges, manifest
