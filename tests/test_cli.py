"""CLI entry (`python -m llama_ray.cli`) — the ray-job-submit surface.

Runs in a subprocess (the CLI owns its Ray session; the test session
must not be inherited)."""

import json
import os
import subprocess
import sys

import pytest


def run_cli(*args, _retries=1):
    env = dict(os.environ)
    env.pop("RAY_ADDRESS", None)
    out = subprocess.run(
        [sys.executable, "-m", "llama_ray.cli", *args],
        capture_output=True,
        text=True,
        timeout=300,
        env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    if out.returncode != 0 and _retries > 0:
        # a concurrent Ray session in the test process occasionally
        # races the subprocess's local cluster startup — one retry
        return run_cli(*args, _retries=_retries - 1)
    assert out.returncode == 0, out.stderr[-2000:]
    return json.loads(out.stdout.strip().splitlines()[-1])


@pytest.mark.slow
def test_cli_pagerank_run_and_resume(tmp_path):
    ck = str(tmp_path / "ck")
    first = run_cli(
        "pagerank", "--input", "rmat(8,4)", "--checkpoint-dir", ck, "--max-iters", "3", "--top-k", "2"
    )
    assert first["iterations"] == 3
    assert len(first["top_k"]) == 2
    resumed = run_cli(
        "pagerank", "--input", "rmat(8,4)", "--checkpoint-dir", ck, "--max-iters", "6", "--resume"
    )
    assert resumed["iterations"] == 6
    full = run_cli("pagerank", "--input", "rmat(8,4)", "--max-iters", "6")
    assert abs(full["sum_rank"] - resumed["sum_rank"]) < 1e-12


@pytest.mark.slow
def test_cli_kcore_all_self_loops(tmp_path):
    """All-self-loop input: the canonical undirected graph is empty;
    the id-mapping guard must not index into empty cg.ids (ADVICE r3:
    `&` did not short-circuit)."""
    net = tmp_path / "loops.net"
    net.write_text("0 0\n1 1\n2 2\n")
    out = run_cli("kcore", "--input", str(net))
    assert out["max_core"] == 0


@pytest.mark.slow
def test_cli_sampling_tasks(tmp_path):
    walks = run_cli("walks", "--input", "rmat(7,4)", "--steps", "3", "--output", str(tmp_path / "w.parquet"))
    assert walks["walk_rows"] > walks["vertices"]  # step-0 rows + real hops
    samp = run_cli("sample", "--input", "rmat(7,4)", "--fanout", "2")
    assert 0 < samp["sampled_edges"] <= 2 * samp["vertices"]
    mis = run_cli("mis", "--input", "rmat(7,4)")
    assert 0 < mis["mis_size"] < mis["vertices"]
    anf = run_cli("anf", "--input", "rmat(7,4)")
    assert anf["rounds"] >= 1 and anf["effective_diameter"] <= anf["rounds"]
    sup = run_cli("support", "--input", "rmat(7,4)")
    assert sup["edges_undirected"] > 0 and sup["max_support"] >= 0


@pytest.mark.slow
def test_cli_structure_tasks(tmp_path):
    m = run_cli("matching", "--input", "rmat(7,3)", "--output", str(tmp_path / "m.parquet"))
    assert 0 < m["matched_edges"] <= m["vertices"] // 2
    d = run_cli("diameter", "--input", "rmat(7,3)")
    assert d["ecc_far"] >= d["ecc_start"] >= 1
    c = run_cli("closeness", "--input", "rmat(7,3)")
    assert c["sources"] == 8 and all(r["reached"] >= 1 for r in c["closeness"])


def test_cli_doc_tasks(tmp_path, capsys):
    import json

    from llama_ray.cli import main

    docs = "/root/testdata/sf0.001/documents.parquet"
    assert main(["pack", "--docs", docs, "--seq-len", "512"]) == 0
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["algorithm"] == "pack" and rec["rows"] > 0

    out = str(tmp_path / "rep_out")
    assert main(["repetition", "--docs", docs, "--ngram", "2", "--output", out]) == 0
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["rows"] == 500
    import ray.data as rd

    assert set(rd.read_parquet(out).schema().names) == {
        "doc_id", "n_grams", "n_distinct", "rep_frac",
    }


def test_cli_doc_ops_and_onion(tmp_path):
    """Late-r4 tasks: gopher filter / edit pairs / bloom contamination
    over a docs parquet, onion decomposition over a generated graph."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    docs = pa.table(
        {
            "doc_id": list(range(40)),
            "text": [
                f"the word{i} and token{i} is that fine{i} with for of to in extra{i}"
                for i in range(40)
            ],
        }
    )
    path = str(tmp_path / "docs.parquet")
    pq.write_table(docs, path)
    for task in ("gopher", "edit_pairs", "contam_bloom"):
        out = run_cli(task, "--docs", path)
        assert out["algorithm"] == task and out["rows"] >= 0
    onion = run_cli("onion", "--input", "rmat(8,4)", "--dedup")
    assert onion["num_layers"] >= 1 and onion["max_core"] >= 1


def test_cli_dsir_semdedup_ccnet(tmp_path, ray_session):
    """r5 CLI tasks for the new curation operators run end-to-end."""
    import json as _json
    import subprocess
    import sys

    import pyarrow.parquet as pq_

    from llama_ray.cli import main

    sf = "/root/testdata/sf0.001"
    for algo, src in (
        ("dsir", f"{sf}/documents.parquet"),
        ("ccnet", f"{sf}/documents.parquet"),
        ("semdedup", f"{sf}/embeddings.parquet"),
    ):
        out_dir = str(tmp_path / algo)
        rc = main([algo, "--docs", src, "--output", out_dir])
        assert rc == 0
        assert pq_.read_table(out_dir).num_rows > 0
