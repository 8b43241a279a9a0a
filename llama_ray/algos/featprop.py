"""Feature propagation (SGC / LightGCN-style): X ← AᵀX repeated —
each round every vertex sums its in-neighbors' feature vectors, the
precompute step of simplified graph-convolution training and a
first-class training-data op for graph-structured corpora.

Distributed form: one ``gather_sum_multi`` per round over the
forward (dst-range) gather pool — the same machinery as PPR's K
parallel seeds; the driver holds only the O(V·K) feature matrix.

The default features are deterministic per-vertex integers
``splitmix64((id·GOLD) ⊕ feat ⊕ seed) mod 1000``: integer-valued
doubles stay EXACT under summation in any order (values stay well
below 2^53 for the tested scales), so the DuckDB oracle
(``pipelines/oracles.py::feature_prop_sql``) matches hash-exactly
with no reduction-order caveat.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..data_ops.dedup import _GOLD, _mix64
from ..engine.bsp import shared_pool
from ..graph import Graph

DEFAULT_FEAT_SEED = 20260818


def hash_features(ids: np.ndarray, k: int, seed: int = DEFAULT_FEAT_SEED) -> np.ndarray:
    """(V, k) deterministic integer-valued features in [0, 1000)."""
    cols = [
        (
            _mix64(ids.astype(np.uint64) * _GOLD ^ np.uint64(j) ^ np.uint64(seed))
            % np.uint64(1000)
        ).astype(np.float64)
        for j in range(k)
    ]
    return np.stack(cols, axis=1) if cols else np.zeros((len(ids), 0))


def feature_propagation(
    graph: Graph,
    features: np.ndarray | None = None,
    *,
    k: int = 4,
    rounds: int = 2,
    seed: int = DEFAULT_FEAT_SEED,
) -> pa.Table:
    """``rounds`` sweeps of h(v) = Σ_{(w,v)∈E} x(w); vertices with no
    in-edges get 0. Returns long-format (vertex, feat, value)."""
    X = hash_features(graph.ids, k, seed) if features is None else np.asarray(features, np.float64)
    pool = shared_pool(graph, view="forward")
    for _ in range(rounds):
        X = pool.gather_sum_multi(X)
    K = X.shape[1]
    return pa.table(
        {
            "vertex": np.repeat(graph.ids, K),
            "feat": np.tile(np.arange(K, dtype=np.int64), graph.num_vertices),
            "value": X.ravel(),
        }
    )
