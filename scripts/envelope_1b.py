"""1B-edge envelope: R-MAT 2^26 x 16 (V=67M, E=1.07B) end-to-end —
generate -> build -> PageRank (build='sort' pools) -> WCC, recording
driver RSS, spill bytes, steal, and per-superstep times.
BASELINE section 3.2g evidence run (round 5)."""
import json
import os
import resource
import subprocess
import time

import ray


def cpu_totals():
    with open("/proc/stat") as f:
        parts = f.readline().split()
    vals = [int(x) for x in parts[1:]]
    return sum(vals), vals[7] if len(vals) > 7 else 0


def rss_gb():
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def spilled_bytes():
    """Sum 'Spilled N MiB' totals from the current session's raylet log."""
    try:
        out = subprocess.run(
            ["bash", "-c",
             "grep -ho 'Spilled [0-9]* MiB' /tmp/ray/session_latest/logs/raylet.out 2>/dev/null | awk '{print $2}' | sort -n | tail -1"],
            capture_output=True, text=True, timeout=30,
        ).stdout.strip()
        return int(out) * (1 << 20) if out else 0
    except Exception:
        return -1


cpu0, steal0 = cpu_totals()
ray.init(address="local", num_cpus=32, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
import logging
logging.getLogger("ray.data").setLevel(logging.ERROR)

from llama_ray.algos.components import weakly_connected_components
from llama_ray.algos.pagerank import pagerank
from llama_ray.engine.bsp import release_pools
from llama_ray.graph import build_graph
from llama_ray.sources.generators import rmat

R = {"scale": 26, "avg_degree": 16}
t0 = time.time()
edges = rmat(26, 16, seed=4).materialize()
R["gen_s"] = round(time.time() - t0, 1)
R["edges"] = edges.count()

t0 = time.time()
g = build_graph(edges)
R["build_s"] = round(time.time() - t0, 1)
R["vertices"] = g.num_vertices
R["rss_after_build_gb"] = round(rss_gb(), 2)
del edges

# PageRank on the multi-node-shaped 'sort' pool build (round-4 ask)
t0 = time.time()
pr = pagerank(g, max_iters=10, engine="bsp_sharded", bsp_build="sort")
R["pagerank_sortpool_total_s"] = round(time.time() - t0, 1)
R["pagerank_supersteps_s"] = [round(m["seconds"], 2) for m in pr.metrics]
R["pagerank_iter_s"] = round(pr.total_seconds, 2)
# warm-pool repeat = steady-state throughput
t0 = time.time()
pr2 = pagerank(g, max_iters=10, engine="bsp_sharded", bsp_build="sort")
R["pagerank_warmpool_wall_s"] = round(time.time() - t0, 1)
R["pagerank_warm_supersteps_s"] = [round(m["seconds"], 2) for m in pr2.metrics]
R["pagerank_edges_per_sec"] = int(10 * R["edges"] / max(pr2.total_seconds, 1e-9))
R["rank_sum"] = float(pr2.state["rank"].sum())
release_pools(g)

t0 = time.time()
wcc = weakly_connected_components(g, engine="bsp_sharded")
R["wcc_total_s"] = round(time.time() - t0, 1)
R["wcc_supersteps"] = wcc.iterations
R["wcc_supersteps_s"] = [round(m["seconds"], 2) for m in wcc.metrics]
import numpy as np
R["wcc_components"] = int(len(np.unique(wcc.state["label"])))
release_pools(g)

R["driver_rss_peak_gb"] = round(rss_gb(), 2)
R["spill_bytes"] = spilled_bytes()
cpu1, steal1 = cpu_totals()
R["steal_pct"] = round(100.0 * (steal1 - steal0) / max(cpu1 - cpu0, 1), 2)
ray.shutdown()
print("ENVELOPE:" + json.dumps(R))
