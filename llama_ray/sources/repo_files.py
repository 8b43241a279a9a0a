"""Deterministic synthetic ``repo_files`` table generator.

The engine's external input shape (BASELINE.json ``input_hint``) is a
Parquet table ``(repo:string, path:string, commit:string, lang:string,
content:string)``. No external data exists in this sandbox, so tests
and benchmarks synthesize the table deterministically (seeded, and
*distributedly*: content derives from the global row index, so any
block can be generated independently — the Ray-Data analogue of the
reference's seeded pseudo-file generators
`/root/reference/llama/include/llama/loaders/ll_gen_rmat.h:204-238`).

Layout: row ``j`` encodes ``(repo, file, touch)`` positionally:
``repo = j // (files_per_repo * touches)``, ``file = (j // touches) %
files_per_repo``, ``touch = j % touches``. Content for a file is a
function of (repo, file) only, so every row of the same file carries
identical content — and its sha256 is reproducible from the source
row alone (the per-row ingest invariant).

Import edges are written INTO the content as literal ``import`` /
``#include`` lines referencing other paths of the same repo, so edge
extraction is exact and re-derivable. Every file imports the repo's
module 0 (a hub vertex — deliberate skew) plus ``extra_imports``
deterministic pseudo-random others.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data as rd

EXTS = ["py", "c", "cc", "h", "rs", "go", "js"]
LANG_OF_EXT = {"py": "py", "c": "c", "cc": "cc", "h": "h", "rs": "rs", "go": "go", "js": "js"}

_FILLER = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa "
    "lambda mu nu xi omicron pi rho sigma tau upsilon"
).split()


def repo_files_schema() -> pa.Schema:
    return pa.schema(
        [
            ("repo", pa.string()),
            ("path", pa.string()),
            ("commit", pa.string()),
            ("lang", pa.string()),
            ("content", pa.string()),
        ]
    )


def _file_meta(repo_i: int, file_i: int, files_per_repo: int, n_pkgs: int):
    """Deterministic (pkg, mod, ext) for a file index. Quadratic map
    concentrates files into low package ids (Zipf-ish skew)."""
    pkg = int(n_pkgs * (file_i / files_per_repo) ** 2)
    pkg = min(pkg, n_pkgs - 1)
    mod = file_i  # module index unique within repo
    ext = EXTS[(repo_i * 31 + file_i * 7) % len(EXTS)]
    return pkg, mod, ext


def _path_of(repo_i: int, file_i: int, files_per_repo: int, n_pkgs: int) -> str:
    pkg, mod, ext = _file_meta(repo_i, file_i, files_per_repo, n_pkgs)
    return f"src/pkg{pkg}/mod{mod}.{ext}"


def _content_of(
    repo: str, repo_i: int, file_i: int, files_per_repo: int, n_pkgs: int, extra_imports: int, seed: int
) -> str:
    pkg, mod, ext = _file_meta(repo_i, file_i, files_per_repo, n_pkgs)
    lines = [f"// {repo} {pkg} {mod} generated seed={seed}"]
    # import targets: hub (file 0) + deterministic pseudo-random others
    targets = set()
    if file_i != 0:
        targets.add(0)
    h = int.from_bytes(
        hashlib.blake2b(f"{seed}:{repo_i}:{file_i}".encode(), digest_size=8).digest(), "little"
    )
    for k in range(extra_imports):
        t = (h >> (k * 8)) % files_per_repo
        if t != file_i:
            targets.add(int(t))
    for t in sorted(targets):
        tp, tm, _ = _file_meta(repo_i, t, files_per_repo, n_pkgs)
        if ext == "py":
            lines.append(f"import pkg{tp}.mod{tm}")
        elif ext in ("c", "cc", "h"):
            lines.append(f'#include "pkg{tp}/mod{tm}.h"')
        elif ext == "rs":
            lines.append(f"use crate::pkg{tp}::mod{tm};")
        elif ext == "go":
            lines.append(f'import "pkg{tp}/mod{tm}"')
        else:  # js
            lines.append(f'const mod{tm} = require("pkg{tp}/mod{tm}");')
    # seeded filler
    for k in range(6):
        w = _FILLER[(h >> (k * 5)) % len(_FILLER)]
        lines.append(f"let {w}_{k} = {(h >> k) % 1000};")
    return "\n".join(lines) + "\n"


def generate_repo_files(
    n_repos: int = 3,
    files_per_repo: int = 50,
    touches_per_file: int = 2,
    n_commits: int = 8,
    n_pkgs: int = 5,
    extra_imports: int = 3,
    seed: int = 42,
    override_num_blocks: int | None = None,
) -> rd.Dataset:
    """Distributed deterministic generation: ``ray.data.range`` over the
    row index → ``map_batches`` computing each row from its index."""
    total = n_repos * files_per_repo * touches_per_file

    def gen(batch: dict) -> pa.Table:
        js = batch["id"]
        repos, paths, commits, langs, contents = [], [], [], [], []
        for j in js.tolist():
            repo_i = j // (files_per_repo * touches_per_file)
            file_i = (j // touches_per_file) % files_per_repo
            touch = j % touches_per_file
            repo = f"org{repo_i % 7}/repo{repo_i}"
            commit_i = (file_i * 7 + touch * 3) % n_commits
            commit = hashlib.sha1(f"{repo}:{commit_i}".encode()).hexdigest()
            path = _path_of(repo_i, file_i, files_per_repo, n_pkgs)
            _, _, ext = _file_meta(repo_i, file_i, files_per_repo, n_pkgs)
            repos.append(repo)
            paths.append(path)
            commits.append(commit)
            langs.append(LANG_OF_EXT[ext])
            contents.append(
                _content_of(repo, repo_i, file_i, files_per_repo, n_pkgs, extra_imports, seed)
            )
        return pa.table(
            {"repo": repos, "path": paths, "commit": commits, "lang": langs, "content": contents},
            schema=repo_files_schema(),
        )

    ds = rd.range(total, override_num_blocks=override_num_blocks)
    return ds.map_batches(gen, batch_format="numpy")
