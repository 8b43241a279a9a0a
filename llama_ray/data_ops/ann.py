"""Approximate nearest-neighbor search over an embedding column.

- ``knn_brute_force``: exact cosine top-k — broadcast query matrix
  (``ray.put`` once), per-batch float64 matmul + per-batch top-k
  partials, final merge on the driver (rows = q×k×blocks).
- ``knn_lsh``: scale path — random-hyperplane LSH buckets; queries
  probe only matching buckets (multi-probe on nearest planes), so the
  scan touches a fraction of the corpus. Recall is tunable by
  ``num_planes`` / ``num_probes``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from ..common import batch_to_numpy


def _as_matrix(batch: pa.Table, vec_col: str, n: int) -> np.ndarray:
    return np.asarray(
        batch.column(vec_col).combine_chunks().flatten().to_numpy(), np.float64
    ).reshape(n, -1)


def knn_brute_force(
    emb: rd.Dataset,
    queries: np.ndarray,
    query_ids: np.ndarray,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    exclude_self: bool = True,
) -> pd.DataFrame:
    """Exact cosine top-k. Returns (qid, neighbor_id, sim)."""
    Q = np.asarray(queries, np.float64)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    q_ref = ray.put((np.asarray(query_ids, np.int64), Qn))

    def partial(batch: pa.Table):
        qids, Qn_ = ray.get(q_ref)
        ids = batch_to_numpy(batch, id_col)
        V = _as_matrix(batch, vec_col, len(ids))
        Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
        sims = Vn @ Qn_.T
        oq, on, os_ = [], [], []
        for j, qid in enumerate(qids.tolist()):
            s = sims[:, j].copy()
            if exclude_self:
                s[ids == qid] = -np.inf
            kk = min(k, len(s))
            top = np.argpartition(-s, kk - 1)[:kk]
            oq.append(np.full(kk, qid, np.int64))
            on.append(ids[top])
            os_.append(s[top])
        return {
            "qid": np.concatenate(oq),
            "neighbor_id": np.concatenate(on),
            "sim": np.concatenate(os_),
        }

    parts = emb.map_batches(partial, batch_format="pyarrow").to_pandas()
    parts = parts.sort_values(["qid", "sim", "neighbor_id"], ascending=[True, False, True])
    return parts.groupby("qid", as_index=False).head(k).reset_index(drop=True)


def knn_lsh(
    emb: rd.Dataset,
    queries: np.ndarray,
    query_ids: np.ndarray,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    num_planes: int = 8,
    num_probes: int = 3,
    seed: int = 42,
    exclude_self: bool = True,
) -> pd.DataFrame:
    """LSH-bucketed ANN: per-batch, only vectors whose hyperplane sign
    bucket is within ``num_probes`` flips of a query's bucket are
    scored. Same output shape as brute force; approximate recall."""
    Q = np.asarray(queries, np.float64)
    dim = Q.shape[1]
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, num_planes))
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    qsig = (Qn @ planes) > 0  # (q, planes)
    q_ref = ray.put((np.asarray(query_ids, np.int64), Qn, qsig, planes))

    def partial(batch: pa.Table):
        qids, Qn_, qsig_, planes_ = ray.get(q_ref)
        ids = batch_to_numpy(batch, id_col)
        V = _as_matrix(batch, vec_col, len(ids))
        Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
        vsig = (Vn @ planes_) > 0  # (v, planes)
        oq, on, os_ = [], [], []
        for j, qid in enumerate(qids.tolist()):
            hamming = (vsig != qsig_[j]).sum(axis=1)
            mask = hamming <= num_probes
            if not mask.any():
                continue
            cand_ids = ids[mask]
            s = Vn[mask] @ Qn_[j]
            if exclude_self:
                s[cand_ids == qid] = -np.inf
            kk = min(k, len(s))
            top = np.argpartition(-s, kk - 1)[:kk]
            oq.append(np.full(kk, qid, np.int64))
            on.append(cand_ids[top])
            os_.append(s[top])
        if not oq:
            return {
                "qid": np.empty(0, np.int64),
                "neighbor_id": np.empty(0, np.int64),
                "sim": np.empty(0, np.float64),
            }
        return {
            "qid": np.concatenate(oq),
            "neighbor_id": np.concatenate(on),
            "sim": np.concatenate(os_),
        }

    parts = emb.map_batches(partial, batch_format="pyarrow").to_pandas()
    parts = parts.sort_values(["qid", "sim", "neighbor_id"], ascending=[True, False, True])
    return parts.groupby("qid", as_index=False).head(k).reset_index(drop=True)
