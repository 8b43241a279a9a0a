"""Triangle counting — wedge-join over canonicalized edges.

The reference counts triangles with in-memory sorted-adjacency
intersections (`/root/reference/benchmark/benchmarks/triangle_counting.h:531-567`
merge / binary-search kernel; the ``tc_od`` variant requires a
canonicalized ``-OD`` load: src<dst, deduped). Random-access
intersection does not distribute, so this implements the classic
two-round shuffle algorithm with **degree orientation** for skew:

1. canonicalize: u<v, drop self-loops, exact dedup (``-OD``);
2. orient each edge from lower (degree, id) to higher — every
   vertex's oriented out-degree is O(sqrt(E)), which bounds the wedge
   explosion at hubs (the hub-splitting requirement of SURVEY §4);
3. **wedges**: for each vertex, emit all ordered pairs (a, b) of its
   oriented out-neighbors — each is a candidate closing edge;
4. **match**: union wedges with the oriented edge set and
   ``groupby(key)``: a wedge whose (a, b) is an actual edge closes a
   triangle. Total = Σ wedge multiplicities on matched keys.

Every triangle a-b-c is counted exactly once: at its (degree,id)-
minimal vertex. Keys are packed ``a * N + b`` (dense ids).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd
from ray.data.aggregate import Count, Max, Sum

from ..common import batch_to_numpy
from ..graph import Graph


def _canonical_edges(graph: Graph) -> rd.Dataset:
    """Dense (u, v) with u < v, deduped (reference ``-OD`` load,
    ``ll_load_utils.h:410-414`` + ``:399-505``)."""
    n = graph.num_vertices

    def canon(batch: pa.Table):
        s = batch_to_numpy(batch, "src")
        d = batch_to_numpy(batch, "dst")
        lo = np.minimum(s, d)
        hi = np.maximum(s, d)
        keep = lo != hi
        return {"key": lo[keep] * n + hi[keep]}

    keyed = graph.edges.map_batches(canon, batch_format="pyarrow")
    return keyed.groupby("key").aggregate(Count(alias_name="_n")).select_columns(["key"])


def triangle_count(graph: Graph) -> int:
    n = graph.num_vertices
    if n == 0:
        return 0
    if n >= (1 << 31):
        raise NotImplementedError("packed-key TC valid to ~3e9 vertices; use 2-col groupby")

    canonical = _canonical_edges(graph).materialize()

    # undirected simple degree per vertex (per-batch bincount partials)
    deg = np.zeros(n, dtype=np.int64)
    for b in canonical.iter_batches(batch_size=1 << 20, batch_format="pyarrow"):
        key = batch_to_numpy(b, "key")
        np.add.at(deg, key // n, 1)
        np.add.at(deg, key % n, 1)
    deg_ref = ray.put(deg)

    def orient(batch: pa.Table):
        key = batch_to_numpy(batch, "key")
        u = key // n
        v = key % n
        d = ray.get(deg_ref)
        # lower (deg, id) endpoint becomes the source
        fwd = (d[u] < d[v]) | ((d[u] == d[v]) & (u < v))
        a = np.where(fwd, u, v)
        b = np.where(fwd, v, u)
        return {"src": a, "dst": b}

    oriented = canonical.map_batches(orient, batch_format="pyarrow").materialize()

    def wedges(group: pd.DataFrame) -> pd.DataFrame:
        """All oriented pairs among one vertex's out-neighbors; the
        pair itself is oriented by the same (deg, id) comparator so it
        can match an oriented edge key."""
        d = ray.get(deg_ref)
        nbrs = group["dst"].to_numpy()
        order = np.lexsort((nbrs, d[nbrs]))
        nbrs = nbrs[order]
        m = len(nbrs)
        if m < 2:
            return pd.DataFrame({"key": np.empty(0, np.int64), "cnt": np.empty(0, np.int64)})
        i, j = np.triu_indices(m, k=1)
        return pd.DataFrame({"key": nbrs[i] * n + nbrs[j], "cnt": np.ones(len(i), np.int64)})

    wedge_ds = oriented.groupby("src").map_groups(wedges, batch_format="pandas")

    def edge_flags(batch: pa.Table):
        s = batch_to_numpy(batch, "src")
        d = batch_to_numpy(batch, "dst")
        return {
            "key": s * n + d,
            "cnt": np.zeros(len(s), np.int64),
            "flag": np.ones(len(s), np.int64),
        }

    def wedge_flags(batch: pa.Table):
        return {
            "key": batch_to_numpy(batch, "key"),
            "cnt": batch_to_numpy(batch, "cnt"),
            "flag": np.zeros(batch.num_rows, np.int64),
        }

    unioned = wedge_ds.map_batches(wedge_flags, batch_format="pyarrow").union(
        oriented.map_batches(edge_flags, batch_format="pyarrow")
    )
    matched = unioned.groupby("key").aggregate(
        Sum("cnt", alias_name="cnt"), Max("flag", alias_name="flag")
    )

    def partial_total(batch: pa.Table):
        cnt = batch_to_numpy(batch, "cnt")
        flag = batch_to_numpy(batch, "flag")
        return {"t": np.array([int(cnt[flag == 1].sum())], dtype=np.int64)}

    total = 0
    for b in matched.map_batches(partial_total, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        total += int(batch_to_numpy(b, "t").sum())
    return total
