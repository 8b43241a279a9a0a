"""repo_files ingest: deterministic generation, edge extraction,
sha256 row invariant, dual-path cross-validation (FIXTURES.md §1, §5)."""

import hashlib

import numpy as np
import pandas as pd
import pytest

from llama_ray.graph import build_graph
from llama_ray.ingest.canonicalize import dedup_edges
from llama_ray.ingest.extract import ingest_repo_files
from llama_ray.sources.repo_files import generate_repo_files


@pytest.fixture(scope="module")
def repo_files():
    return generate_repo_files(n_repos=3, files_per_repo=40, touches_per_file=2).materialize()


def test_generation_deterministic(repo_files):
    a = repo_files.to_pandas().sort_values(["repo", "path", "commit"]).reset_index(drop=True)
    b = (
        generate_repo_files(n_repos=3, files_per_repo=40, touches_per_file=2, override_num_blocks=7)
        .to_pandas()
        .sort_values(["repo", "path", "commit"])
        .reset_index(drop=True)
    )
    assert a.equals(b), "generation must not depend on block layout"


def test_schema_matches_input_hint(repo_files):
    assert set(repo_files.schema().names) == {"repo", "path", "commit", "lang", "content"}


def test_sha256_row_invariant(repo_files):
    """Every ingested row's content_sha256 equals sha256 recomputed
    from the source rows (BASELINE.json input_hint)."""
    _, manifest = ingest_repo_files(repo_files)
    m = manifest.to_pandas()
    src = repo_files.to_pandas()
    src["expect"] = src["content"].map(lambda c: hashlib.sha256(c.encode()).hexdigest())
    joined = m.merge(
        src[["repo", "path", "commit", "expect"]], on=["repo", "path", "commit"], how="left"
    )
    assert len(joined) == len(m)
    assert (joined["content_sha256"] == joined["expect"]).all()


def test_extraction_exact(repo_files):
    """Edges re-derived on the driver from raw content equal the
    distributed extraction (cross-validation between two independent
    paths, reference cross_validate.h:53-160 analogue)."""
    edges, _ = ingest_repo_files(repo_files)
    got = (
        edges.to_pandas()
        .sort_values(["src", "dst", "kind"])
        .reset_index(drop=True)
    )
    # driver-side re-derivation
    import re

    from llama_ray.ingest.extract import _IMPORT_PATTERNS, vertex_id

    rows = []
    for r in repo_files.to_pandas().itertuples():
        mod_key = r.path.rsplit(".", 1)[0]
        fv = vertex_id("path", f"{r.repo}:{mod_key}")
        rows.append((vertex_id("repo", r.repo), fv, "repo_contains_path"))
        rows.append((vertex_id("commit", f"{r.repo}:{r.commit}"), fv, "commit_touches_path"))
        pat = re.compile(_IMPORT_PATTERNS[r.lang], re.M)
        for m in pat.finditer(r.content):
            tgt = vertex_id("path", f"{r.repo}:src/pkg{m.group(1)}/mod{m.group(2)}")
            rows.append((fv, tgt, "path_imports_path"))
    expect = (
        pd.DataFrame(rows, columns=["src", "dst", "kind"])
        .sort_values(["src", "dst", "kind"])
        .reset_index(drop=True)
    )
    assert got.equals(expect)


def test_import_edges_exist_and_hub_skew(repo_files):
    edges, _ = ingest_repo_files(repo_files)
    df = edges.to_pandas()
    imports = df[df["kind"] == "path_imports_path"]
    assert len(imports) > 0
    # file 0 of each repo is a hub: its in-degree dominates
    indeg = imports.groupby("dst").size()
    assert indeg.max() >= 30  # ~all 39 other files import mod0


def test_graph_builds_from_ingest(repo_files):
    edges, _ = ingest_repo_files(repo_files)
    g = build_graph(dedup_edges(edges))
    assert g.num_vertices > 0
    assert g.num_edges > 0
    assert g.out_degrees.sum() == g.num_edges


def test_add_sha256_buffer_path_edge_cases():
    """The buffer-sliced digest path agrees with hashlib on nulls,
    unicode, empties, and non-zero-offset (sliced) arrays."""
    import pyarrow as pa

    from llama_ray.ingest.extract import add_sha256

    texts = ["", "héllo ✓", None, "x" * 5000, "tab\tnl\n"]
    t = pa.table({"content": pa.array(texts, pa.string())})
    got = add_sha256(t).column("content_sha256").to_pylist()
    want = [None if v is None else hashlib.sha256(v.encode()).hexdigest() for v in texts]
    assert got == want

    sliced = pa.table({"content": pa.array(["a", "bb", "ccc", "dddd"]).slice(1, 2)})
    got2 = add_sha256(sliced).column("content_sha256").to_pylist()
    assert got2 == [hashlib.sha256(b"bb").hexdigest(), hashlib.sha256(b"ccc").hexdigest()]

    assert add_sha256(pa.table({"content": pa.array([], pa.string())})).num_rows == 0


def test_binary_matrix_kernel():
    """One-buffer-view decode of packed float64 vectors: round-trips,
    handles slices/chunks, rejects ragged rows."""
    import pyarrow as pa

    from llama_ray.common import binary_matrix

    M = np.arange(35, dtype=np.float64).reshape(7, 5)
    arr = pa.array([r.tobytes() for r in M], pa.binary())
    assert np.array_equal(binary_matrix(arr), M)
    assert np.array_equal(binary_matrix(arr.slice(2, 3)), M[2:5])
    chunked = pa.chunked_array([arr.slice(0, 3), arr.slice(3)])
    assert np.array_equal(binary_matrix(chunked), M)
    assert binary_matrix(pa.array([], pa.binary())).shape == (0, 0)
    with pytest.raises(ValueError):
        binary_matrix(pa.array([b"123", b"12345678"]))
