"""Edge canonicalization — the per-record transforms the reference
applies during load (direction modes ``ll_config.h:49-51``, dedup
``ll_load_utils.h:399-505``, max-node-id ``ll_load_utils.h:422-423``).

All pure, vectorized ``map_batches`` transforms over Arrow batches
except dedup, which is a hash shuffle on the (src, dst) pair — the
distributed equivalent of the reference's sort-then-skip-equal
(`/root/reference/llama/include/llama/ll_load_utils.h:465-505`).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd
from ray.data.aggregate import Count, Sum

from ..common import SRC, DST, WEIGHT, batch_to_numpy
from ..graph import undirect

# Re-export: undirected-double lives in graph.py (used by algorithms too).
undirected_double = undirect


def undirected_ordered(edges: rd.Dataset, *, drop_self_loops: bool = False) -> rd.Dataset:
    """Canonicalize each edge so ``src <= dst`` (reference ``-O`` /
    ``LL_L_UNDIRECTED_ORDERED``, ``ll_load_utils.h:410-414``)."""

    def canon(batch: pa.Table) -> pa.Table:
        src = batch_to_numpy(batch, SRC)
        dst = batch_to_numpy(batch, DST)
        lo = np.minimum(src, dst)
        hi = np.maximum(src, dst)
        if drop_self_loops:
            keep = lo != hi
            lo, hi = lo[keep], hi[keep]
        return pa.table({SRC: lo, DST: hi})

    return edges.select_columns([SRC, DST]).map_batches(canon, batch_format="pyarrow")


def dedup_edges(edges: rd.Dataset, *, weights: str = "none") -> rd.Dataset:
    """Exact (src, dst) dedup via hash-shuffle groupby.

    ``weights``:
      - ``"none"``  → distinct pairs only (reference ``-D`` dedup,
        ``ll_load_utils.h:399-505``);
      - ``"count"`` → add ``weight`` = duplicate multiplicity — the
        streaming "weights instead of duplicate edges" semantic
        (``ll_writable_graph.h:725-779``);
      - ``"sum"``   → sum an existing ``weight`` column per pair.
    """
    if weights == "none":
        out = edges.select_columns([SRC, DST]).groupby([SRC, DST]).aggregate(
            Count(alias_name="_n")
        )
        return out.select_columns([SRC, DST])
    if weights == "count":
        out = edges.select_columns([SRC, DST]).groupby([SRC, DST]).aggregate(
            Count(alias_name=WEIGHT)
        )
        return out
    if weights == "sum":
        return edges.groupby([SRC, DST]).aggregate(Sum(WEIGHT, alias_name=WEIGHT))
    raise ValueError(f"unknown weights mode: {weights}")


def max_node_id(edges: rd.Dataset) -> int:
    """max(src, dst) over all edges; the reference's ``max_nodes - 1``
    (``ll_load_utils.h:422-423``). Per-batch partial max → driver."""

    def partial(batch: pa.Table):
        m = max(
            batch_to_numpy(batch, SRC).max(initial=np.iinfo(np.int64).min),
            batch_to_numpy(batch, DST).max(initial=np.iinfo(np.int64).min),
        )
        return {"m": np.array([m], dtype=np.int64)}

    best = np.iinfo(np.int64).min
    for b in edges.select_columns([SRC, DST]).map_batches(
        partial, batch_format="pyarrow"
    ).iter_batches(batch_format="pyarrow"):
        best = max(best, batch_to_numpy(b, "m").max())
    return int(best)
