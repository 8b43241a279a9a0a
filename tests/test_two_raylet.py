"""Two-raylet smoke: the closest this single-machine sandbox gets to
multi-node evidence. A private two-node Ray cluster (head + one extra
raylet, its own --temp-dir, torn down by pid — never `ray stop`, which
would kill the suite's session cluster) runs BSP PageRank and asserts:

1. the pool build AUTO-selects the multi-node ``sort`` path
   (range-sort by dst, each actor fetches only its contiguous blocks
   — O(E) traffic instead of a P×E broadcast), and
2. results are bit-identical to the forced single-node ``scan`` path.

The whole check runs in a subprocess against the private cluster so
the session-scoped local Ray of conftest.py is never touched.
"""

import json
import os
import subprocess
import sys

SCRIPT = r"""
import json, os, subprocess, sys, time

TEMP = "/tmp/ray_twonode_smoke"
PORT = 63790
env = {k: v for k, v in os.environ.items() if k != "RAY_ADDRESS"}

def sh(args):
    return subprocess.run(args, env=env, capture_output=True, text=True, timeout=120)

out = {"ok": False}
try:
    r = sh([sys.executable, "-m", "ray.scripts.scripts", "start", "--head",
            f"--port={PORT}", "--num-cpus=2", "--temp-dir", TEMP,
            "--include-dashboard=false", "--disable-usage-stats"])
    assert r.returncode == 0, r.stderr[-2000:]
    r = sh([sys.executable, "-m", "ray.scripts.scripts", "start",
            f"--address=127.0.0.1:{PORT}", "--num-cpus=2",
            "--disable-usage-stats"])
    assert r.returncode == 0, r.stderr[-2000:]

    import ray
    ray.init(address=f"127.0.0.1:{PORT}", logging_level="ERROR")
    for _ in range(60):
        alive = [n for n in ray.nodes() if n.get("Alive")]
        if len(alive) >= 2:
            break
        time.sleep(0.5)
    out["nodes"] = len(alive)
    assert len(alive) >= 2, "second raylet never joined"

    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    import numpy as np
    from llama_ray.algos.pagerank import pagerank
    from llama_ray.engine.bsp import BSPGather, release_pools
    from llama_ray.graph import build_graph
    from llama_ray.sources.generators import rmat

    g = build_graph(rmat(12, 8, seed=7).materialize())
    pool = BSPGather(g)
    out["auto_build"] = pool.build
    for a in pool.actors:
        ray.kill(a)

    pr_auto = pagerank(g, max_iters=10, engine="bsp", bsp_build="auto")
    release_pools(g)
    pr_scan = pagerank(g, max_iters=10, engine="bsp", bsp_build="scan")
    out["bit_equal"] = bool(
        np.array_equal(pr_auto.state["rank"], pr_scan.state["rank"])
    )
    out["iters"] = pr_auto.iterations

    # incremental window loop across the two raylets: remap + scatter
    # tasks schedule on both nodes; per-batch results equal cold
    import shutil, tempfile
    from llama_ray.algos.components import weakly_connected_components
    from llama_ray.snapshots.incremental import IncrementalPageRankWindow
    from llama_ray.snapshots.store import SnapshotStore
    sroot = tempfile.mkdtemp(prefix="twonode_stream_", dir=TEMP)
    st = SnapshotStore(sroot)
    inc = IncrementalPageRankWindow()
    inc_ok = True
    for i in range(3):
        lvl = st.ingest_batch(rmat(9, 2, seed=300 + i).materialize())
        st.set_window(2)
        ids_i, r_i = inc.advance(st, lvl, window=2, max_iters=4, warm=False)
        ids_c, r_c = inc.advance_wcc(st, lvl, window=2)
        gw = build_graph(st.edges(at_level=lvl))
        cold_pr = pagerank(gw, max_iters=4)
        cold_cc = weakly_connected_components(gw)
        oi, oc = np.argsort(ids_i), np.argsort(gw.ids)
        inc_ok = inc_ok and bool(
            np.array_equal(np.round(r_i.state["rank"][oi], 8),
                           np.round(cold_pr.state["rank"][oc], 8))
            and np.array_equal(r_c.state["label"][np.argsort(ids_c)],
                               cold_cc.state["label"][oc])
        )
    shutil.rmtree(sroot, ignore_errors=True)
    out["incremental_ok"] = inc_ok

    out["ok"] = out["auto_build"] == "sort" and out["bit_equal"] and inc_ok
    ray.shutdown()
finally:
    # surgical teardown: kill only processes belonging to the private
    # cluster (cmdline carries the --temp-dir); `ray stop` would kill
    # the test session's own local cluster too
    killed = 0
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/cmdline", "rb") as f:
                cmd = f.read().decode("utf-8", "replace")
        except OSError:
            continue
        if TEMP in cmd and int(pid) != os.getpid():
            try:
                os.kill(int(pid), 9)
                killed += 1
            except OSError:
                pass
    out["killed"] = killed
print("RESULT:" + json.dumps(out))
"""


def test_two_raylet_auto_selects_sort_build_and_matches():
    env = dict(os.environ)
    env.pop("RAY_ADDRESS", None)
    r = subprocess.run(
        [sys.executable, "-c", SCRIPT],
        capture_output=True,
        text=True,
        timeout=420,
        env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    lines = [l for l in r.stdout.splitlines() if l.startswith("RESULT:")]
    assert lines, f"no result marker\nstdout:{r.stdout[-3000:]}\nstderr:{r.stderr[-3000:]}"
    out = json.loads(lines[-1][len("RESULT:"):])
    assert out.get("nodes", 0) >= 2, out
    assert out.get("auto_build") == "sort", out
    assert out.get("bit_equal") is True, out
    assert out.get("incremental_ok") is True, out
    assert out.get("ok") is True, out
