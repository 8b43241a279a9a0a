"""Graph diagnostics — one-liner distributed aggregates.

Reference analogues:
- ``degree_distribution``: log2-bucketed out-degree histogram
  (`/root/reference/benchmark/tools/degree_distribution.h:55-147`);
- ``edge_prop_stats``: min/max/sum/count/mean of an edge property
  (`/root/reference/benchmark/tools/property_stats.h:50-178`).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd
from ray.data.aggregate import Count, Max, Mean, Min, Sum

from ..common import DST, SRC, batch_to_numpy


def degree_distribution(edges: rd.Dataset, *, direction: str = "out") -> "pa.Table":
    """log2 bucket histogram of degrees: rows (bucket, num_vertices,
    num_edges) where bucket b covers degrees [2^b, 2^(b+1)) and
    bucket -1 is degree 0 vertices (not representable from an edge
    list — omitted, as only vertices with ≥1 edge appear).

    Two-stage: groupby(vertex).count (shuffle #1, partial-combined by
    Ray) → per-batch bucketing → groupby(bucket) (tiny shuffle #2).
    """
    key = SRC if direction == "out" else DST
    degrees = edges.select_columns([key]).groupby(key).aggregate(Count(alias_name="degree"))

    def bucketize(batch: pa.Table):
        d = batch_to_numpy(batch, "degree").astype(np.int64)
        return {"bucket": np.floor(np.log2(d)).astype(np.int64), "degree": d}

    hist = (
        degrees.map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Count(alias_name="num_vertices"), Sum("degree", alias_name="num_edges"))
    )
    return hist.sort("bucket").to_pandas()


def level_spread(edges: rd.Dataset, *, level_col: str = "snapshot"):
    """Per-vertex count of distinct snapshot levels its adjacency
    spans (reference ``level_spread``,
    `/root/reference/benchmark/tools/level_spread.h:50-157`):
    histogram rows (num_levels, num_vertices). Two-stage: per-batch
    distinct (src, level) pairs → groupby(src) distinct-count →
    bucket histogram."""
    import pyarrow.compute as pc

    def pairs(batch: pa.Table):
        s = batch_to_numpy(batch, SRC)
        lv = batch_to_numpy(batch, level_col)
        u = np.unique(np.stack([s, lv]), axis=1)
        return {"src": u[0], "level": u[1]}

    distinct = (
        edges.map_batches(pairs, batch_format="pyarrow")
        .groupby(["src", "level"])
        .aggregate(Count(alias_name="_n"))
    )
    per_vertex = distinct.groupby("src").aggregate(Count(alias_name="num_levels"))
    hist = per_vertex.groupby("num_levels").aggregate(Count(alias_name="num_vertices"))
    return hist.sort("num_levels").to_pandas()


def edge_prop_stats(edges: rd.Dataset, prop: str = "weight"):
    """Global min/max/sum/count/mean of one edge column (the
    reference's default property is ``stream-weight``)."""
    out = edges.select_columns([prop]).aggregate(
        Min(prop, alias_name="min"),
        Max(prop, alias_name="max"),
        Sum(prop, alias_name="sum"),
        Count(alias_name="count"),
        Mean(prop, alias_name="mean"),
    )
    return out
