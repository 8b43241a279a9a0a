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


def _probe_masks(num_planes: int, num_probes: int) -> np.ndarray:
    """All sign-flip bitmasks with popcount ≤ num_probes."""
    masks = np.arange(1 << num_planes, dtype=np.int64)
    pop = np.zeros(len(masks), np.int64)
    m = masks.copy()
    while m.any():
        pop += m & 1
        m >>= 1
    return masks[pop <= num_probes]


def _query_bucketed(refs, lo, hi, probe, qrow, Qn, qids, k, exclude_self):
    """Shared probe fan-out for bucket-partitioned indexes (LSH sign
    buckets, IVF lists): map (query row, bucket) pairs to only the
    blocks whose bucket range intersects, score candidates inside
    those blocks, merge per-query top-k on the driver (rows =
    q×k×touched-blocks, never the corpus)."""
    b0 = np.searchsorted(hi, probe, side="left")
    b1 = np.searchsorted(lo, probe, side="right")
    counts = np.maximum(b1 - b0, 0)
    pairs_q = np.repeat(qrow, counts)
    pairs_bucket = np.repeat(probe, counts)
    cum = np.concatenate([[0], np.cumsum(counts)])
    pairs_blk = np.repeat(b0, counts) + (
        np.arange(int(counts.sum())) - np.repeat(cum[:-1], counts)
    )

    @ray.remote
    def probe_block(tbl: pa.Table, qrows, buckets, Qn_, qids_, kk, excl):
        from ..common import binary_matrix

        b = tbl.column("bucket").combine_chunks().to_numpy(zero_copy_only=False)
        ids = tbl.column("id").combine_chunks().to_numpy(zero_copy_only=False)
        V = None
        oq, on, os_ = [], [], []
        for qr in np.unique(qrows):
            bks = buckets[qrows == qr]
            sel = []
            for bk in bks:
                l = np.searchsorted(b, bk, side="left")
                h = np.searchsorted(b, bk, side="right")
                if h > l:
                    sel.append(np.arange(l, h))
            if not sel:
                continue
            rows = np.concatenate(sel)
            if V is None:
                V = binary_matrix(tbl.column("vec"))
            cand_ids = ids[rows]
            s = V[rows] @ Qn_[qr]
            if excl:
                s[cand_ids == qids_[qr]] = -np.inf
            t = min(kk, len(s))
            top = np.argpartition(-s, t - 1)[:t]
            oq.append(np.full(t, qids_[qr], np.int64))
            on.append(cand_ids[top])
            os_.append(s[top])
        if not oq:
            return (
                np.empty(0, np.int64),
                np.empty(0, np.int64),
                np.empty(0, np.float64),
            )
        return np.concatenate(oq), np.concatenate(on), np.concatenate(os_)

    futs = []
    for bi in np.unique(pairs_blk):
        m = pairs_blk == bi
        futs.append(
            probe_block.remote(
                refs[bi], pairs_q[m], pairs_bucket[m], Qn, qids, k, exclude_self
            )
        )
    oq, on, os_ = [], [], []
    for q_, n_, s_ in ray.get(futs):
        oq.append(q_)
        on.append(n_)
        os_.append(s_)
    if not oq:
        return pd.DataFrame(
            {
                "qid": np.empty(0, np.int64),
                "neighbor_id": np.empty(0, np.int64),
                "sim": np.empty(0),
            }
        )
    parts = pd.DataFrame(
        {
            "qid": np.concatenate(oq),
            "neighbor_id": np.concatenate(on),
            "sim": np.concatenate(os_),
        }
    )
    parts = parts.sort_values(
        ["qid", "sim", "neighbor_id"], ascending=[True, False, True]
    )
    return parts.groupby("qid", as_index=False).head(k).reset_index(drop=True)


class LSHIndex:
    """Random-hyperplane LSH index with a bucket-partitioned layout.

    Build (once): every vector's sign-pattern bucket is computed in
    ``map_batches``, the corpus is range-``sort``\\ed by bucket and
    pinned; the driver keeps only per-block bucket bounds. Query:
    each query enumerates the buckets within ``num_probes`` sign
    flips of its own, and only the blocks whose bucket range
    intersects the probe set are fetched and scored — probes touch a
    fraction of the corpus (the round-1 version scanned every batch
    and filtered, paying exact-scan cost for approximate recall)."""

    def __init__(
        self,
        emb: rd.Dataset,
        *,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        num_planes: int = 8,
        seed: int = 42,
    ):
        head = emb.take(1)
        if not head:
            raise ValueError("LSHIndex: empty embedding dataset — nothing to index")
        dim = len(head[0][vec_col])
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((dim, num_planes))
        self.num_planes = num_planes
        planes_ref = ray.put(self.planes)

        def bucketize(batch: pa.Table):
            ids = batch_to_numpy(batch, id_col)
            V = _as_matrix(batch, vec_col, len(ids))
            Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
            signs = (Vn @ ray.get(planes_ref)) > 0
            bucket = np.zeros(len(ids), np.int64)
            for p in range(num_planes):
                bucket = (bucket << 1) | signs[:, p]
            return {"bucket": bucket, "id": ids, "vec": [v.tobytes() for v in Vn]}

        self.ds = (
            emb.map_batches(bucketize, batch_format="pyarrow").sort("bucket").materialize()
        )
        self.refs = self.ds.to_arrow_refs()
        from ..common import per_block_results

        def bounds(t: pa.Table):
            if t.num_rows == 0 or "bucket" not in t.schema.names:
                return None
            b = t.column("bucket").combine_chunks().to_numpy(zero_copy_only=False)
            return (int(b[0]), int(b[-1]))

        bs = per_block_results(self.ds, bounds)
        keep = [i for i, bo in enumerate(bs) if bo is not None]
        self.refs = [self.refs[i] for i in keep]
        self.lo = np.array([bs[i][0] for i in keep], np.int64)
        self.hi = np.array([bs[i][1] for i in keep], np.int64)

    def query(
        self,
        queries: np.ndarray,
        query_ids: np.ndarray,
        *,
        k: int = 10,
        num_probes: int = 3,
        exclude_self: bool = True,
    ) -> pd.DataFrame:
        Q = np.asarray(queries, np.float64)
        qids = np.asarray(query_ids, np.int64)
        Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
        qsig = (Qn @ self.planes) > 0
        base = np.zeros(len(qids), np.int64)
        for p in range(self.num_planes):
            base = (base << 1) | qsig[:, p]
        masks = _probe_masks(self.num_planes, num_probes)
        # (q, m) probe buckets → (query row, block) pairs; a bucket's
        # rows may span adjacent blocks (the sort can split mid-run),
        # so each probe maps to the full block range [lo..hi] covering it
        probe = (base[:, None] ^ masks[None, :]).ravel()
        qrow = np.repeat(np.arange(len(qids)), len(masks))
        return _query_bucketed(
            self.refs, self.lo, self.hi, probe, qrow, Qn, qids, k, exclude_self
        )


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
    """Build an :class:`LSHIndex` and query it (one-shot convenience;
    hold the index for repeated query batches)."""
    idx = LSHIndex(emb, id_col=id_col, vec_col=vec_col, num_planes=num_planes, seed=seed)
    return idx.query(queries, query_ids, k=k, num_probes=num_probes, exclude_self=exclude_self)


def kmeans_spherical(
    emb: rd.Dataset,
    num_clusters: int,
    *,
    vec_col: str = "embedding",
    iters: int = 10,
    seed: int = 42,
) -> np.ndarray:
    """Distributed spherical k-means (cosine Lloyd's): per Lloyd round
    every block assigns its (normalized) vectors to the nearest
    centroid by one matmul and emits a (K, d) partial sum + (K,)
    counts; the driver reduces the tiny partials and renormalizes.
    O(K·d) driver state, corpus never leaves the blocks — the coarse
    quantizer for :class:`IVFIndex`. The seed draw initializes from a
    CONTENT-deterministic sample (the ``4·K`` vectors with the smallest
    content hashes, via the partial top-k merge) — a bare ``limit()``
    consumes blocks in the streaming executor's arrival order, which
    made the centroids vary run to run. Lloyd's float partial sums
    still reduce in block order, so exact bit-equality is per layout."""
    from ..common import distributed_topk, per_block_results

    emb = emb.materialize() if not _is_materialized(emb) else emb
    sample_k = max(4 * num_clusters, 64)
    _F = np.uint64(1099511628211)

    def keyed(b: pa.Table) -> pa.Table:
        n = b.num_rows
        V32 = _as_matrix(b, vec_col, n).astype(np.float32)
        u8 = np.ascontiguousarray(V32).view(np.uint8).reshape(n, -1)
        h = np.zeros(n, np.uint64)
        for j in range(0, u8.shape[1], 8):  # every 8th byte: cheap, content-stable
            h = h * _F + u8[:, j]
        return pa.table({"h": pa.array(h.view(np.int64)), vec_col: b.column(vec_col)})

    sample = distributed_topk(
        emb.map_batches(keyed, batch_format="pyarrow"), [("h", "ascending")], sample_k
    ).to_pandas()
    if len(sample) == 0:
        raise ValueError("kmeans_spherical: empty embedding dataset — nothing to cluster")
    V0 = np.stack([np.asarray(v, np.float64) for v in sample[vec_col].to_numpy()])
    V0 = V0 / np.maximum(np.linalg.norm(V0, axis=1, keepdims=True), 1e-30)
    rng = np.random.default_rng(seed)
    pick = rng.choice(len(V0), size=min(num_clusters, len(V0)), replace=False)
    C = V0[pick]
    if len(C) < num_clusters:  # tiny corpus: pad with random directions
        pad = rng.standard_normal((num_clusters - len(C), C.shape[1]))
        pad /= np.linalg.norm(pad, axis=1, keepdims=True)
        C = np.vstack([C, pad])
    K, d = C.shape

    for _ in range(iters):
        c_ref = ray.put(C)

        def partial(tbl: pa.Table):
            if tbl.num_rows == 0 or vec_col not in tbl.schema.names:
                return None
            n = tbl.num_rows
            V = _as_matrix(tbl, vec_col, n)
            Vn = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-30)
            A = np.argmax(Vn @ ray.get(c_ref).T, axis=1)
            order = np.argsort(A, kind="stable")
            As = A[order]
            first = np.ones(n, bool)
            first[1:] = As[1:] != As[:-1]
            starts = np.flatnonzero(first)
            S = np.zeros((K, d))
            S[As[starts]] = np.add.reduceat(Vn[order], starts, axis=0)
            cnt = np.bincount(A, minlength=K).astype(np.int64)
            return S, cnt

        S = np.zeros((K, d))
        cnt = np.zeros(K, np.int64)
        for p in per_block_results(emb, partial):
            if p is not None:
                S += p[0]
                cnt += p[1]
        norms = np.linalg.norm(S, axis=1, keepdims=True)
        nonempty = (cnt > 0) & (norms[:, 0] > 1e-30)
        C = np.where(nonempty[:, None], S / np.maximum(norms, 1e-30), C)
    return C


def _is_materialized(ds: rd.Dataset) -> bool:
    try:
        return isinstance(ds, rd.dataset.MaterializedDataset)
    except Exception:
        return False


class IVFIndex:
    """IVF (inverted-file) cosine index — the classic ANN scale path
    (coarse k-means quantizer + per-centroid inverted lists; the
    structure behind FAISS IVFFlat). Build: train
    :func:`kmeans_spherical`, assign every vector to its nearest
    centroid in ``map_batches``, range-sort the corpus by list id and
    pin it; the driver keeps the (K, d) centroids + per-block list
    bounds. Query: rank centroids by dot product, probe the top
    ``nprobe`` lists through the same block fan-out as
    :class:`LSHIndex` — only intersecting blocks are touched. Recall
    grows with ``nprobe`` (= K recovers exact brute force)."""

    def __init__(
        self,
        emb: rd.Dataset,
        *,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        num_clusters: int = 16,
        train_iters: int = 10,
        seed: int = 42,
    ):
        emb = emb.materialize() if not _is_materialized(emb) else emb
        self.centroids = kmeans_spherical(
            emb, num_clusters, vec_col=vec_col, iters=train_iters, seed=seed
        )
        c_ref = ray.put(self.centroids)

        def assign(batch: pa.Table):
            ids = batch_to_numpy(batch, id_col)
            V = _as_matrix(batch, vec_col, len(ids))
            Vn = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-30)
            bucket = np.argmax(Vn @ ray.get(c_ref).T, axis=1).astype(np.int64)
            return {"bucket": bucket, "id": ids, "vec": [v.tobytes() for v in Vn]}

        self.ds = (
            emb.map_batches(assign, batch_format="pyarrow")
            .sort("bucket")
            .materialize()
        )
        refs = self.ds.to_arrow_refs()
        from ..common import per_block_results

        def bounds(t: pa.Table):
            if t.num_rows == 0 or "bucket" not in t.schema.names:
                return None
            b = t.column("bucket").combine_chunks().to_numpy(zero_copy_only=False)
            return (int(b[0]), int(b[-1]))

        bs = per_block_results(self.ds, bounds)
        keep = [i for i, bo in enumerate(bs) if bo is not None]
        self.refs = [refs[i] for i in keep]
        self.lo = np.array([bs[i][0] for i in keep], np.int64)
        self.hi = np.array([bs[i][1] for i in keep], np.int64)

    def query(
        self,
        queries: np.ndarray,
        query_ids: np.ndarray,
        *,
        k: int = 10,
        nprobe: int = 4,
        exclude_self: bool = True,
    ) -> pd.DataFrame:
        Q = np.asarray(queries, np.float64)
        qids = np.asarray(query_ids, np.int64)
        Qn = Q / np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-30)
        sims = Qn @ self.centroids.T
        npb = min(nprobe, sims.shape[1])
        top = np.argpartition(-sims, npb - 1, axis=1)[:, :npb]
        probe = top.astype(np.int64).ravel()
        qrow = np.repeat(np.arange(len(qids)), npb)
        return _query_bucketed(
            self.refs, self.lo, self.hi, probe, qrow, Qn, qids, k, exclude_self
        )


def knn_ivf(
    emb: rd.Dataset,
    queries: np.ndarray,
    query_ids: np.ndarray,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    num_clusters: int = 16,
    nprobe: int = 4,
    seed: int = 42,
    exclude_self: bool = True,
) -> pd.DataFrame:
    """Build an :class:`IVFIndex` and query it (one-shot convenience;
    hold the index for repeated query batches)."""
    idx = IVFIndex(
        emb, id_col=id_col, vec_col=vec_col, num_clusters=num_clusters, seed=seed
    )
    return idx.query(queries, query_ids, k=k, nprobe=nprobe, exclude_self=exclude_self)


def cosine_pairs(
    emb: rd.Dataset,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.5,
) -> rd.Dataset:
    """EXACT all-pairs cosine ≥ τ — the brute-force baseline that
    ``embedding_near_dup``'s hyperplane-LSH path approximates at
    scale. The normalized corpus matrix is broadcast once (``ray.put``
    → zero-copy plasma reads) and each batch does one float64 matmul
    against it, emitting only (a < b) pairs so every pair appears
    exactly once. O(N²) similarity work, distributed across batches;
    the broadcast side is O(N·dim) — holds to ~10⁷ small-dim vectors
    per node, beyond which the LSH/IVF variants are the path.

    Returns a Dataset of (a, b, cos)."""
    ids_parts, mat_parts = [], []
    for b in emb.select_columns([id_col, vec_col]).iter_batches(
        batch_size=1 << 16, batch_format="pyarrow"
    ):
        n = b.num_rows
        if n == 0:
            continue
        ids_parts.append(batch_to_numpy(b, id_col))
        mat_parts.append(_as_matrix(b, vec_col, n))
    if not ids_parts:
        return rd.from_arrow(
            pa.table(
                {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()), "cos": pa.array([], pa.float64())}
            )
        )
    corpus_ids = np.concatenate(ids_parts)
    C = np.concatenate(mat_parts, axis=0)
    C /= np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-300)
    corpus_ref = ray.put((corpus_ids, C))

    def pairs(batch: pa.Table):
        empty = {
            "a": np.empty(0, np.int64),
            "b": np.empty(0, np.int64),
            "cos": np.empty(0),
        }
        n = batch.num_rows
        if n == 0:
            return empty
        cids, Cn = ray.get(corpus_ref)
        vids = batch_to_numpy(batch, id_col)
        V = _as_matrix(batch, vec_col, n)
        V /= np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-300)
        sims = V @ Cn.T  # (batch, N)
        # keep only a < b: each unordered pair emitted by exactly one batch
        keep = (sims >= threshold) & (vids[:, None] < cids[None, :])
        li, ri = np.nonzero(keep)
        if not len(li):
            return empty
        return {"a": vids[li], "b": cids[ri], "cos": sims[li, ri]}

    return emb.select_columns([id_col, vec_col]).map_batches(
        pairs, batch_format="pyarrow"
    )


def seed_partition(
    emb: rd.Dataset,
    *,
    k: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1 << 16,
) -> rd.Dataset:
    """Deterministic nearest-seed partitioning of an embedding corpus
    (the MIPS/IVF assignment step made oracle-exact): the ``k``
    smallest-id vectors are the seeds; every vector joins the seed
    maximizing the QUANTIZED inner product

        score(v, s) = Σ_d  ⌊v_d·scale + ½⌋ · ⌊s_d·scale + ½⌋

    — all int64 (|q| ≤ scale for unit-ish embeddings; 64 dims keep the
    dot < 2^53), so the argmax (ties → smaller seed id) is exact in
    any batch layout AND in DuckDB, unlike float k-means centroids
    (the reason ``knn_ivf`` is rows-only). One broadcast of the K×d
    seed matrix, one integer matmul per batch, no shuffle.

    Returns (vec_id, seed_id, score)."""
    import ray

    seeds_tbl = (
        emb.select_columns([id_col, vec_col])
        .sort(id_col)
        .limit(k)
        .to_pandas()
    )
    if len(seeds_tbl) == 0:
        raise ValueError("seed_partition: empty embedding dataset")
    seed_ids = seeds_tbl[id_col].to_numpy().astype(np.int64)
    sm = np.stack([np.asarray(v, np.float64) for v in seeds_tbl[vec_col]])
    q_seeds = np.floor(sm * scale + 0.5).astype(np.int64)
    order = np.argsort(seed_ids)  # tie-break needs seeds in id order
    seed_ids, q_seeds = seed_ids[order], q_seeds[order]
    ref = ray.put((seed_ids, q_seeds))

    def assign(batch: pa.Table) -> dict:
        empty = {
            "vec_id": np.empty(0, np.int64),
            "seed_id": np.empty(0, np.int64),
            "score": np.empty(0, np.int64),
        }
        n = batch.num_rows
        if n == 0 or vec_col not in batch.schema.names:
            return empty
        sids, qs = ray.get(ref)
        V = _as_matrix(batch, vec_col, n)
        qv = np.floor(V * scale + 0.5).astype(np.int64)
        scores = qv @ qs.T  # (n, k) int64, exact
        best = np.argmax(scores, axis=1)  # first max = smallest seed id
        return {
            "vec_id": batch_to_numpy(batch, id_col).astype(np.int64),
            "seed_id": sids[best],
            "score": scores[np.arange(n), best],
        }

    return emb.select_columns([id_col, vec_col]).map_batches(
        assign, batch_format="pyarrow"
    )


def kmeans_quantized(
    emb: rd.Dataset,
    *,
    k: int = 8,
    iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1 << 16,
) -> rd.Dataset:
    """Lloyd's k-means in EXACT int64 arithmetic — the IVF coarse
    quantizer's training loop made oracle-checkable (the float version,
    :func:`kmeans_spherical`, reduces partial sums in block-arrival
    order and is only per-layout deterministic). Everything is integer:

    * vectors quantize to ``qv = ⌊v·scale + ½⌋`` (int64),
    * init centroids are the ``k`` smallest-id quantized vectors,
    * assignment is the int64 dot-product argmax (ties → smaller
      cluster id, i.e. smaller seed ``vec_id``),
    * the update is the per-dimension FLOOR of the cluster mean,
      ``⌊Σ qv_d / n⌋`` (empty clusters keep their centroid),

    so sums commute, every block layout and every SQL engine computes
    the identical result. Per iteration: one (k×d) broadcast, one int64
    matmul + per-cluster ``reduceat`` partial per block, an O(k·d)
    driver reduce — the corpus never leaves the blocks and there is no
    shuffle. Returns (vec_id, cluster_id, score) of the FINAL
    assignment, cluster_id = the founding seed's id."""
    emb, seed_ids, C = kmeans_quantized_centroids(
        emb, k=k, iters=iters, id_col=id_col, vec_col=vec_col, scale=scale
    )
    c_ref = ray.put((seed_ids, C))

    def assign(batch: pa.Table) -> dict:
        n = batch.num_rows
        if n == 0 or vec_col not in batch.schema.names:
            return {
                "vec_id": np.empty(0, np.int64),
                "cluster_id": np.empty(0, np.int64),
                "score": np.empty(0, np.int64),
            }
        sids, cm = ray.get(c_ref)
        qv = np.floor(_as_matrix(batch, vec_col, n) * scale + 0.5).astype(np.int64)
        scores = qv @ cm.T
        best = np.argmax(scores, axis=1)
        return {
            "vec_id": batch_to_numpy(batch, id_col).astype(np.int64),
            "cluster_id": sids[best],
            "score": scores[np.arange(n), best],
        }

    return emb.map_batches(assign, batch_format="pyarrow")


def kmeans_quantized_centroids(
    emb: rd.Dataset,
    *,
    k: int = 8,
    iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1 << 16,
):
    """Training loop of :func:`kmeans_quantized`, exposed for
    composition (semantic dedup clusters on the same integer-exact
    codebook): returns ``(materialized emb, seed_ids, C)`` with ``C``
    the int64 (k, d) floor-mean centroids ordered by seed id."""
    from ..common import per_block_results

    seeds_tbl = (
        emb.select_columns([id_col, vec_col]).sort(id_col).limit(k).to_pandas()
    )
    if len(seeds_tbl) == 0:
        raise ValueError("kmeans_quantized: empty embedding dataset")
    seed_ids = seeds_tbl[id_col].to_numpy().astype(np.int64)
    order = np.argsort(seed_ids)
    seed_ids = seed_ids[order]
    sm = np.stack(
        [np.asarray(v, np.float64) for v in seeds_tbl[vec_col].to_numpy()[order]]
    )
    C = np.floor(sm * scale + 0.5).astype(np.int64)
    K, d = C.shape

    emb = emb.select_columns([id_col, vec_col])
    if not _is_materialized(emb):
        emb = emb.materialize()

    for _ in range(iters):
        c_ref = ray.put(C)

        def partial(tbl: pa.Table):
            if tbl.num_rows == 0 or vec_col not in tbl.schema.names:
                return None
            n = tbl.num_rows
            qv = np.floor(_as_matrix(tbl, vec_col, n) * scale + 0.5).astype(np.int64)
            A = np.argmax(qv @ ray.get(c_ref).T, axis=1)  # first max = low id
            order = np.argsort(A, kind="stable")
            As = A[order]
            first = np.ones(n, bool)
            first[1:] = As[1:] != As[:-1]
            starts = np.flatnonzero(first)
            S = np.zeros((K, d), np.int64)
            S[As[starts]] = np.add.reduceat(qv[order], starts, axis=0)
            return S, np.bincount(A, minlength=K).astype(np.int64)

        S = np.zeros((K, d), np.int64)
        cnt = np.zeros(K, np.int64)
        for p in per_block_results(emb, partial):
            if p is not None:
                S += p[0]
                cnt += p[1]
        nz = cnt > 0
        # floor(S/n): numpy // floors; the SQL twin uses the offset
        # trick (S + n·M)//n − M to floor with truncating division
        C = np.where(nz[:, None], S // np.maximum(cnt, 1)[:, None], C)

    return emb, seed_ids, C


def pq_encode(
    emb: rd.Dataset,
    *,
    m: int = 4,
    k: int = 16,
    iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1 << 16,
) -> rd.Dataset:
    """Product quantization (Jégou, Douze & Schmid, TPAMI 2011): split
    every vector into ``m`` contiguous subspaces and learn an
    independent ``k``-codeword quantized-Lloyd codebook per subspace
    (:func:`kmeans_quantized` arithmetic — int64 dots, smallest-id
    seeds, floor-mean updates — so the whole training + encode is
    bit-exact in any block layout and in SQL).  PQ codes compress a
    d-dim float vector to ``m`` bytes-ish codes for asymmetric-distance
    ANN; this is the codebook/encode stage.

    One pass per Lloyd iteration: a (m·k×d/m) codebook broadcast, per
    block one int64 matmul per subspace + per-code ``reduceat``
    partials, O(m·k·d) driver reduce; the corpus never shuffles.

    Returns long-form rows ``(vec_id, subspace, code_id, score)`` —
    ``code_id`` = the founding seed's ``vec_id`` (the
    :func:`kmeans_quantized` convention), ``score`` the winning int64
    subspace dot."""
    emb, seed_ids, C, sd = _pq_train(
        emb, m=m, k=k, iters=iters, id_col=id_col, vec_col=vec_col, scale=scale
    )

    c_ref = ray.put((seed_ids, C))

    def encode(batch: pa.Table) -> dict:
        n = batch.num_rows
        if n == 0 or vec_col not in batch.schema.names:
            return {
                "vec_id": np.empty(0, np.int64),
                "subspace": np.empty(0, np.int64),
                "code_id": np.empty(0, np.int64),
                "score": np.empty(0, np.int64),
            }
        sids, cb = ray.get(c_ref)
        qv = np.floor(_as_matrix(batch, vec_col, n) * scale + 0.5).astype(np.int64)
        ids = batch_to_numpy(batch, id_col).astype(np.int64)
        out_id, out_sp, out_code, out_sc = [], [], [], []
        for s in range(m):
            sub = qv[:, s * sd : (s + 1) * sd]
            scores = sub @ cb[s].T
            best = np.argmax(scores, axis=1)
            out_id.append(ids)
            out_sp.append(np.full(n, s, np.int64))
            out_code.append(sids[best])
            out_sc.append(scores[np.arange(n), best])
        return {
            "vec_id": np.concatenate(out_id),
            "subspace": np.concatenate(out_sp),
            "code_id": np.concatenate(out_code),
            "score": np.concatenate(out_sc),
        }

    return emb.map_batches(encode, batch_format="pyarrow")


def _pq_train(
    emb: rd.Dataset,
    *,
    m: int,
    k: int,
    iters: int,
    id_col: str,
    vec_col: str,
    scale: int,
):
    """Shared PQ codebook training (see :func:`pq_encode`): returns
    ``(materialized emb, sorted seed ids, C[m, k, sd], sd)``."""
    from ..common import per_block_results

    seeds_tbl = (
        emb.select_columns([id_col, vec_col]).sort(id_col).limit(k).to_pandas()
    )
    if len(seeds_tbl) == 0:
        raise ValueError("pq_encode: empty embedding dataset")
    if len(seeds_tbl) < k:
        raise ValueError(
            f"pq_encode: need at least k={k} vectors to seed the codebook, "
            f"got {len(seeds_tbl)}"
        )
    seed_ids = seeds_tbl[id_col].to_numpy().astype(np.int64)
    order = np.argsort(seed_ids)
    seed_ids = seed_ids[order]
    sm = np.stack(
        [np.asarray(v, np.float64) for v in seeds_tbl[vec_col].to_numpy()[order]]
    )
    d = sm.shape[1]
    if d % m:
        raise ValueError(f"pq_encode: dim {d} not divisible by m={m}")
    sd = d // m
    # C[s] : (k, sd) codebook of subspace s
    C = np.floor(sm * scale + 0.5).astype(np.int64).reshape(k, m, sd).transpose(1, 0, 2).copy()

    emb = emb.select_columns([id_col, vec_col])
    if not _is_materialized(emb):
        emb = emb.materialize()

    for _ in range(iters):
        c_ref = ray.put(C)

        def partial(tbl: pa.Table):
            if tbl.num_rows == 0 or vec_col not in tbl.schema.names:
                return None
            n = tbl.num_rows
            qv = np.floor(_as_matrix(tbl, vec_col, n) * scale + 0.5).astype(np.int64)
            cb = ray.get(c_ref)
            S = np.zeros((m, k, sd), np.int64)
            cnt = np.zeros((m, k), np.int64)
            for s in range(m):
                sub = qv[:, s * sd : (s + 1) * sd]
                A = np.argmax(sub @ cb[s].T, axis=1)  # first max = low id
                o = np.argsort(A, kind="stable")
                As = A[o]
                first = np.ones(n, bool)
                first[1:] = As[1:] != As[:-1]
                starts = np.flatnonzero(first)
                S[s, As[starts]] = np.add.reduceat(sub[o], starts, axis=0)
                cnt[s] = np.bincount(A, minlength=k)
            return S, cnt

        S = np.zeros((m, k, sd), np.int64)
        cnt = np.zeros((m, k), np.int64)
        for p in per_block_results(emb, partial):
            if p is not None:
                S += p[0]
                cnt += p[1]
        nz = cnt > 0
        C = np.where(
            nz[:, :, None], S // np.maximum(cnt, 1)[:, :, None], C
        )

    return emb, seed_ids, C, sd


def knn_pq(
    emb: rd.Dataset,
    *,
    num_queries: int = 8,
    topk: int = 10,
    m: int = 4,
    k: int = 16,
    iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1 << 16,
) -> "pa.Table":
    """PQ asymmetric-distance k-NN (the ADC search of Jégou et al.
    2011): the ``num_queries`` smallest-id vectors each rank the whole
    corpus by the PQ-compressed inner product Σ_s ⟨q_s, codeword(x,s)⟩
    and keep the ``topk`` (score desc, vec_id asc — self included).

    All integer: codebooks from :func:`_pq_train`, the per-query
    (m×k) LUT is built once on the driver and broadcast; each corpus
    batch encodes its codes (one int64 matmul per subspace) and scores
    ALL queries with one LUT gather — compressed-domain search, no
    shuffle, per-batch top-k partials merged on the driver (O(nq·topk)
    rows ever collected)."""
    from ..common import per_block_results

    emb, seed_ids, C, sd = _pq_train(
        emb, m=m, k=k, iters=iters, id_col=id_col, vec_col=vec_col, scale=scale
    )
    q_tbl = (
        emb.select_columns([id_col, vec_col]).sort(id_col).limit(num_queries).to_pandas()
    )
    q_ids = q_tbl[id_col].to_numpy().astype(np.int64)
    qorder = np.argsort(q_ids)
    q_ids = q_ids[qorder]
    qm = np.stack(
        [np.asarray(v, np.float64) for v in q_tbl[vec_col].to_numpy()[qorder]]
    )
    qq = np.floor(qm * scale + 0.5).astype(np.int64)
    nq = len(q_ids)
    # LUT[q, s, j] = <query q's subvector s, codeword j of subspace s>
    lut = np.stack(
        [qq[:, s * sd : (s + 1) * sd] @ C[s].T for s in range(m)], axis=1
    )
    state = ray.put((lut, C))

    def part(tbl: pa.Table):
        if tbl.num_rows == 0 or vec_col not in tbl.schema.names:
            return None
        n = tbl.num_rows
        lut_, cb = ray.get(state)
        qv = np.floor(_as_matrix(tbl, vec_col, n) * scale + 0.5).astype(np.int64)
        ids = batch_to_numpy(tbl, id_col).astype(np.int64)
        scores = np.zeros((nq, n), np.int64)
        for s in range(m):
            codes = np.argmax(qv[:, s * sd : (s + 1) * sd] @ cb[s].T, axis=1)
            scores += lut_[:, s, codes]
        kk = min(topk, n)
        # per-query local top-k: (score desc, vec_id asc)
        out = []
        for qi in range(nq):
            o = np.lexsort((ids, -scores[qi]))[:kk]
            out.append((ids[o], scores[qi][o]))
        return out

    best_ids = [np.empty(0, np.int64)] * nq
    best_sc = [np.empty(0, np.int64)] * nq
    for p in per_block_results(emb, part):
        if p is None:
            continue
        for qi, (pi, ps) in enumerate(p):
            ci = np.concatenate([best_ids[qi], pi])
            cs = np.concatenate([best_sc[qi], ps])
            o = np.lexsort((ci, -cs))[:topk]
            best_ids[qi], best_sc[qi] = ci[o], cs[o]
    cols = {"query_id": [], "rank": [], "vec_id": [], "score": []}
    for qi in range(nq):
        for r in range(len(best_ids[qi])):
            cols["query_id"].append(int(q_ids[qi]))
            cols["rank"].append(r + 1)
            cols["vec_id"].append(int(best_ids[qi][r]))
            cols["score"].append(int(best_sc[qi][r]))
    return pa.table(
        {
            "query_id": pa.array(cols["query_id"], pa.int64()),
            "rank": pa.array(cols["rank"], pa.int64()),
            "vec_id": pa.array(cols["vec_id"], pa.int64()),
            "score": pa.array(cols["score"], pa.int64()),
        }
    )


def knn_ivf_quantized(
    emb: rd.Dataset,
    *,
    num_queries: int = 8,
    topk: int = 10,
    k: int = 8,
    nprobe: int = 2,
    iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1 << 16,
) -> "pa.Table":
    """IVF k-NN with a fully deterministic (hence oracle-checkable)
    pipeline: the coarse quantizer is the integer-exact Lloyd codebook
    (:func:`_pq_train` with one subspace — identical arithmetic to
    :func:`kmeans_quantized`), each query probes its ``nprobe``
    best centroids (int64 dot, ties → smaller seed id), and the
    candidate lists are ranked by exact cosine ROUNDED to 5 decimals
    (ties → smaller vec_id) — the engine's float-hash convention, so
    the whole search replays bit-identically in SQL.

    One scan: every corpus batch assigns itself to its centroid (one
    int64 matmul), keeps rows whose centroid is probed by ANY query,
    scores those against the relevant queries, and emits per-query
    top-k partials (O(nq·topk) driver rows).  Unlike :func:`knn_ivf`
    (float k-means, per-layout centroids) this trades a slightly
    weaker quantizer for cross-engine determinism."""
    emb, seed_ids, C, sd = _pq_train(
        emb, m=1, k=k, iters=iters, id_col=id_col, vec_col=vec_col, scale=scale
    )
    cb = C[0]  # (k, d) int64 codebook
    return _ivf_probe_topk(
        emb, cb,
        num_queries=num_queries, topk=topk, nprobe=nprobe,
        id_col=id_col, vec_col=vec_col, scale=scale,
    )


def _ivf_probe_topk(
    emb: rd.Dataset,
    cb: np.ndarray,
    *,
    num_queries: int,
    topk: int,
    nprobe: int,
    id_col: str,
    vec_col: str,
    scale: int,
) -> "pa.Table":
    """Shared deterministic IVF search stage: given an int64 (k, d)
    coarse codebook ``cb`` (any integer-exact quantizer — Lloyd
    :func:`_pq_train` or spherical :func:`kmeans_spherical_exact`),
    probe each of the ``num_queries`` smallest-id query vectors'
    ``nprobe`` best centroids (int64 dot, tie → smaller centroid
    index) and rank candidates by exact cosine ROUNDED to 5 decimals
    (tie → smaller vec_id) — one scan, O(nq·topk) driver rows."""
    from ..common import per_block_results

    q_tbl = (
        emb.select_columns([id_col, vec_col]).sort(id_col).limit(num_queries).to_pandas()
    )
    q_ids = q_tbl[id_col].to_numpy().astype(np.int64)
    qorder = np.argsort(q_ids)
    q_ids = q_ids[qorder]
    qm = np.stack(
        [np.asarray(v, np.float64) for v in q_tbl[vec_col].to_numpy()[qorder]]
    )
    qq = np.floor(qm * scale + 0.5).astype(np.int64)
    nq = len(q_ids)
    # per-query probe set: top-nprobe centroids by int dot (tie → low id)
    qs_scores = qq @ cb.T  # (nq, k)
    probes = np.argsort(
        np.stack([-qs_scores[i] for i in range(nq)], axis=0), axis=1, kind="stable"
    )[:, :nprobe]
    probe_mask = np.zeros((nq, len(cb)), bool)
    for i in range(nq):
        probe_mask[i, probes[i]] = True
    qnorm = np.sqrt((qm * qm).sum(axis=1))
    state = ray.put((cb, probe_mask, qm, qnorm))

    def part(tbl: pa.Table):
        if tbl.num_rows == 0 or vec_col not in tbl.schema.names:
            return None
        n = tbl.num_rows
        cb_, pm, qm_, qn = ray.get(state)
        X = _as_matrix(tbl, vec_col, n)
        qv = np.floor(X * scale + 0.5).astype(np.int64)
        A = np.argmax(qv @ cb_.T, axis=1)  # first max = low seed id
        ids = batch_to_numpy(tbl, id_col).astype(np.int64)
        xn = np.sqrt((X * X).sum(axis=1))
        out = []
        for qi in range(len(qm_)):
            sel = pm[qi][A]
            if not sel.any():
                out.append((np.empty(0, np.int64), np.empty(0, np.float64)))
                continue
            Xi = X[sel]
            cos = (Xi @ qm_[qi]) / (np.sqrt((Xi * Xi).sum(axis=1)) * qn[qi])
            cos = np.round(cos, 5)
            kk = min(topk, len(cos))
            o = np.lexsort((ids[sel], -cos))[:kk]
            out.append((ids[sel][o], cos[o]))
        return out

    best_ids = [np.empty(0, np.int64)] * nq
    best_sc = [np.empty(0, np.float64)] * nq
    for p in per_block_results(emb, part):
        if p is None:
            continue
        for qi, (pi, ps) in enumerate(p):
            ci = np.concatenate([best_ids[qi], pi])
            cs = np.concatenate([best_sc[qi], ps])
            o = np.lexsort((ci, -cs))[:topk]
            best_ids[qi], best_sc[qi] = ci[o], cs[o]
    cols = {"query_id": [], "rank": [], "vec_id": [], "cos": []}
    for qi in range(nq):
        for r in range(len(best_ids[qi])):
            cols["query_id"].append(int(q_ids[qi]))
            cols["rank"].append(r + 1)
            cols["vec_id"].append(int(best_ids[qi][r]))
            cols["cos"].append(float(best_sc[qi][r]))
    return pa.table(
        {
            "query_id": pa.array(cols["query_id"], pa.int64()),
            "rank": pa.array(cols["rank"], pa.int64()),
            "vec_id": pa.array(cols["vec_id"], pa.int64()),
            "cos": pa.array(cols["cos"], pa.float64()),
        }
    )


def _unit_quantize_rows(Q: np.ndarray, scale: int) -> np.ndarray:
    """Per-row quantized unit vectors ``⌊q/‖q‖·scale + ½⌋`` of an int64
    matrix — the elementwise float chain (int→double, ÷√nsq, ·scale,
    +½, floor) is IEEE-deterministic and replays bit-identically in
    SQL (``floor(CAST(q AS DOUBLE)/sqrt(CAST(nsq AS DOUBLE))·scale+½)``).
    Zero rows stay zero. Exact while ``Σq² < 2^63`` per row."""
    nsq = (Q * Q).sum(axis=1)  # int64, exact
    norm = np.sqrt(nsq.astype(np.float64))
    with np.errstate(divide="ignore", invalid="ignore"):
        U = np.floor(Q / norm[:, None] * scale + 0.5)
    U[nsq == 0] = 0
    return U.astype(np.int64)


def kmeans_spherical_exact(
    emb: rd.Dataset,
    *,
    k: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1 << 16,
):
    """Spherical k-means (direction-mean Lloyd) with FULLY layout-
    independent integer arithmetic — the oracle-checkable twin of
    :func:`kmeans_spherical` (reference analogue: the same coarse
    quantizer role as IVFFlat training).

    Init: the ``k`` smallest-id vectors, unit-quantized. Per round,
    every block assigns its quantized vectors to the max-int64-dot
    centroid (tie → smaller centroid index = smaller seed id) and
    emits int64 partial sums of the UNIT-quantized vectors — integer
    sums are associative, so the reduction is bit-identical in every
    block layout (the float path's per-layout partial-sum drift is the
    one thing that kept ``knn_ivf`` rows-only through round 4). The
    driver renormalizes each summed direction through the same
    deterministic float chain as :func:`_unit_quantize_rows` (norms in
    exact Python ints — Σ S² can exceed 2^63; the SQL mirror uses
    HUGEINT). Empty or fully-cancelling clusters keep their previous
    centroid. Overflow contract: per-cluster rows < 2^37 at
    scale=2^16 (the unit-sum bound ``n·scale < 2^53`` for exact
    int→double); shrink ``scale`` beyond that.

    Returns ``(materialized emb, seed_ids, C)`` with ``C`` the int64
    (k, d) quantized-unit centroid matrix ordered by seed id."""
    import math

    from ..common import per_block_results

    emb = emb.select_columns([id_col, vec_col])
    if not _is_materialized(emb):
        emb = emb.materialize()
    seeds = emb.sort(id_col).limit(k).to_pandas()
    if len(seeds) < k:
        raise ValueError(
            f"kmeans_spherical_exact: need at least k={k} vectors, got {len(seeds)}"
        )
    seed_ids = seeds[id_col].to_numpy().astype(np.int64)
    order = np.argsort(seed_ids)
    seed_ids = seed_ids[order]
    S0 = np.stack([np.asarray(v, np.float64) for v in seeds[vec_col].to_numpy()[order]])
    C = _unit_quantize_rows(np.floor(S0 * scale + 0.5).astype(np.int64), scale)
    d = C.shape[1]

    for _ in range(iters):
        c_ref = ray.put(C)

        def partial(tbl: pa.Table):
            if tbl.num_rows == 0 or vec_col not in tbl.schema.names:
                return None
            n = tbl.num_rows
            X = _as_matrix(tbl, vec_col, n)
            qv = np.floor(X * scale + 0.5).astype(np.int64)
            A = np.argmax(qv @ ray.get(c_ref).T, axis=1)  # int64 dot; first max
            U = _unit_quantize_rows(qv, scale)
            o = np.argsort(A, kind="stable")
            As = A[o]
            first = np.ones(n, bool)
            first[1:] = As[1:] != As[:-1]
            starts = np.flatnonzero(first)
            S = np.zeros((k, d), np.int64)
            S[As[starts]] = np.add.reduceat(U[o], starts, axis=0)
            return S, np.bincount(A, minlength=k).astype(np.int64)

        S = np.zeros((k, d), np.int64)
        cnt = np.zeros(k, np.int64)
        for p in per_block_results(emb, partial):
            if p is not None:
                S += p[0]
                cnt += p[1]
        newC = C.copy()
        for j in range(k):
            if cnt[j] == 0:
                continue
            nsq = sum(int(x) * int(x) for x in S[j])  # exact: can pass 2^63
            if nsq == 0:
                continue
            norm = math.sqrt(float(nsq))
            newC[j] = np.floor(S[j].astype(np.float64) / norm * scale + 0.5).astype(
                np.int64
            )
        C = newC
    return emb, seed_ids, C


def knn_ivf_spherical(
    emb: rd.Dataset,
    *,
    num_queries: int = 5,
    topk: int = 10,
    k: int = 16,
    nprobe: int = 4,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1 << 16,
) -> "pa.Table":
    """IVF k-NN whose coarse quantizer is the integer-exact SPHERICAL
    k-means (:func:`kmeans_spherical_exact`) — the cosine-native IVF
    (direction-mean centroids, the quantizer cosine search actually
    wants) made layout-independent and hash-oracle-checkable, unlike
    the float :func:`knn_ivf` whose per-layout Lloyd partial sums kept
    it rows-only. Search is the shared :func:`_ivf_probe_topk` stage:
    per-query top-``nprobe`` centroids by int64 dot, candidates ranked
    by ROUND(cosine, 5)."""
    emb, _seed_ids, C = kmeans_spherical_exact(
        emb, k=k, iters=iters, id_col=id_col, vec_col=vec_col, scale=scale
    )
    return _ivf_probe_topk(
        emb, C,
        num_queries=num_queries, topk=topk, nprobe=nprobe,
        id_col=id_col, vec_col=vec_col, scale=scale,
    )


# ---------------------------------------------- quantized Gram / PCA


def gram_quantized(
    emb: rd.Dataset,
    *,
    vec_col: str = "embedding",
    scale: int = 1 << 16,
) -> rd.Dataset:
    """Exact second-moment statistics of an embedding column: one row
    per dimension pair ``i <= j`` with the integer Gram entry
    ``gram = Σ q_i q_j`` over quantized vectors ``q = ⌊v·scale + ½⌋``,
    the per-dim integer sums, the row count, and the derived covariance
    ``cov = (gram - s_i·s_j/n)/n`` (double, rounded 1e-6) — the
    whitening / PCA statistics stage of an embedding pipeline.

    All aggregation is commutative int64 sums (one ``Qᵀ Q`` matmul per
    block, d(d+1)/2 partial rows each, merged by the sorted run-reduce)
    so the result is bit-identical in every block layout and in SQL.
    Overflow bound: ``n·(scale·max|v|)² < 2^63`` — at scale=2^16 and
    |v| ≤ 8 good to ~3×10^7 rows; reduce ``scale`` for larger corpora
    (the quantization is part of the operator's contract, so the same
    scale must be used by any oracle).
    """
    from ..common import group_sum_sorted

    first = emb.take(1)
    if not first:
        raise ValueError("gram_quantized: empty embedding dataset")
    d = len(first[0][vec_col])
    iu = np.triu_indices(d)
    pair_key = (iu[0] * d + iu[1]).astype(np.int64)

    def partial(batch: pa.Table) -> dict:
        n = batch.num_rows
        V = np.asarray(
            batch.column(vec_col).combine_chunks().flatten().to_numpy(), np.float64
        ).reshape(n, d)
        Q = np.floor(V * scale + 0.5).astype(np.int64)
        G = Q.T @ Q  # exact: int64 matmul
        s = Q.sum(axis=0)
        # d(d+1)/2 gram rows + d sum rows (key = d*d + dim) + 1 count row
        return {
            "k": np.concatenate([pair_key, d * d + np.arange(d, dtype=np.int64), [d * d + d]]),
            "v": np.concatenate([G[iu], s, [n]]),
        }

    merged = group_sum_sorted(
        emb.map_batches(partial, batch_format="pyarrow"), "k", ["v"]
    ).materialize()

    # O(d²) rows total: assemble the tiny stats table on the driver
    rows = merged.to_pandas()
    kv = dict(zip(rows["k"].astype(np.int64), rows["v"].astype(np.int64)))
    n_total = kv[d * d + d]
    s = np.array([kv[d * d + i] for i in range(d)], np.int64)
    gram = np.array([kv[int(k)] for k in pair_key], np.int64)
    si = s[iu[0]].astype(np.float64)
    sj = s[iu[1]].astype(np.float64)
    cov = np.round((gram.astype(np.float64) - si * sj / n_total) / n_total, 6)
    return rd.from_arrow(
        pa.table(
            {
                "dim_i": iu[0].astype(np.int64),
                "dim_j": iu[1].astype(np.int64),
                "n": np.full(len(gram), n_total, np.int64),
                "sum_i": s[iu[0]],
                "sum_j": s[iu[1]],
                "gram": gram,
                "cov": cov,
            }
        )
    )


def _tdiv(a: int, b: int) -> int:
    """Truncating integer division (sign × |a|//|b|) — DuckDB's ``//``
    truncates toward zero while Python's floors, so every shared-spec
    division goes through this helper on the Python side and plain
    ``//`` in SQL."""
    q = abs(a) // abs(b)
    return -q if (a < 0) != (b < 0) else q


def embedding_pca_exact(
    emb: rd.Dataset,
    *,
    out_dim: int = 8,
    iters: int = 96,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1 << 16,
) -> rd.Dataset:
    """PCA projection with a FULLY deterministic, SQL-replayable
    eigensolve — the hash-oracle twin of :func:`embedding_pca` (whose
    numpy ``eigh`` is not SQL-expressible).

    The fitted basis is defined as the output of a fixed integer
    procedure, identical in numpy/Python and DuckDB: (1) the exact
    int64 Gram statistics (:func:`gram_quantized`); (2) the integer
    covariance matrix ``M = n·G − s sᵀ`` truncation-normalized once to
    ~2^37 magnitude (``M // max(1, max|M| // 2^36)``, DuckDB ``//``
    truncation semantics via :func:`_tdiv`); (3) per component, a
    FIXED-count deflated power iteration whose every step is an exact
    integer matvec followed by the deterministic float renormalization
    chain ``⌊y/√(Σy²)·scale + ½⌋`` (Σy² in exact Python ints / SQL
    HUGEINT); (4) sign canonicalization (entry of largest |value|,
    first on ties, made positive); (5) Rayleigh deflation in truncated
    integer arithmetic ``M −= (t·v_i·v_j) // (vᵀv)`` with
    ``t = (vᵀMv) // (vᵀv)``. Determinism does NOT require convergence
    — both engines run the identical map for exactly ``iters`` steps,
    so results hash-match even on near-degenerate spectra; subspace
    QUALITY vs numpy ``eigh`` is pytest-verified separately (captured
    variance, not per-vector equality).

    The projection is integer-exact per vector:
    ``p_c = (n·(q·v_c) − s·v_c) / (n·scale²)`` — one int64 matvec per
    batch against the broadcast (d, out_dim) basis. Overflow contract:
    ``n < 2^22`` rows at scale=2^16 (int64 bound on ``n·(q·v)``);
    shrink ``scale`` beyond that — at 100 TB you would also shard the
    Gram pass per partition and raise ``scale`` selectively, but the
    quantization IS the operator contract shared with any oracle.
    Returns (id, pc: list<double>, rounded 1e-6)."""
    import math

    stats = gram_quantized(emb, vec_col=vec_col, scale=scale).to_pandas()
    d = int(stats["dim_i"].max()) + 1
    n = int(stats["n"].iloc[0])
    if n >= 1 << 22:
        raise ValueError(
            f"embedding_pca_exact: n={n} exceeds the int64 projection bound "
            f"(2^22 rows at scale={scale}); reduce scale"
        )
    s = [0] * d
    for i, v in zip(
        stats.drop_duplicates("dim_i")["dim_i"], stats.drop_duplicates("dim_i")["sum_i"]
    ):
        s[int(i)] = int(v)
    G = [[0] * d for _ in range(d)]
    for i, j, g in zip(stats["dim_i"], stats["dim_j"], stats["gram"]):
        G[int(i)][int(j)] = int(g)
        G[int(j)][int(i)] = int(g)
    M = [[n * G[i][j] - s[i] * s[j] for j in range(d)] for i in range(d)]
    mx = max(abs(e) for row in M for e in row)
    if mx:
        D = max(1, _tdiv(mx, 1 << 36))
        M = [[_tdiv(e, D) for e in row] for row in M]

    V = []
    for c in range(out_dim):
        x = [((i * 2654435761 + c * 40503) % 997) + 1 for i in range(d)]
        for _ in range(iters):
            y = [sum(M[i][j] * x[j] for j in range(d)) for i in range(d)]
            nsq = sum(e * e for e in y)
            if nsq == 0:
                break
            norm = math.sqrt(float(nsq))
            x = [math.floor(float(e) / norm * scale + 0.5) for e in y]
        ab = [abs(e) for e in x]
        if x[ab.index(max(ab))] < 0:
            x = [-e for e in x]
        V.append(x)
        mv = [sum(M[i][j] * x[j] for j in range(d)) for i in range(d)]
        lam_num = sum(x[i] * mv[i] for i in range(d))
        lam_den = sum(e * e for e in x)
        if lam_den:
            t = _tdiv(lam_num, lam_den)
            M = [
                [M[i][j] - _tdiv(t * x[i] * x[j], lam_den) for j in range(d)]
                for i in range(d)
            ]

    Varr = np.array(V, np.int64).T  # (d, out_dim), entries ≲ scale
    sv = np.array(s, np.int64) @ Varr  # (out_dim,) exact
    den = float(n * scale * scale)
    v_ref = ray.put(np.ascontiguousarray(Varr))
    sv_ref = ray.put(sv)

    def project(batch: pa.Table) -> pa.Table:
        m = batch.num_rows
        X = np.asarray(
            batch.column(vec_col).combine_chunks().flatten().to_numpy(), np.float64
        ).reshape(m, d)
        qv = np.floor(X * scale + 0.5).astype(np.int64)
        P_int = n * (qv @ ray.get(v_ref)) - ray.get(sv_ref)  # exact int64
        P = np.round(P_int.astype(np.float64) / den, 6)
        return pa.table(
            {
                id_col: batch.column(id_col),
                "pc": pa.FixedSizeListArray.from_arrays(
                    pa.array(P.reshape(-1), pa.float64()), P.shape[1]
                ),
            }
        )

    return emb.map_batches(project, batch_format="pyarrow")


def embedding_pca(
    emb: rd.Dataset,
    *,
    out_dim: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1 << 16,
) -> rd.Dataset:
    """PCA projection of an embedding column: covariance from the
    EXACT quantized Gram statistics (:func:`gram_quantized`, so the
    fitted basis is independent of block layout), eigensolve on the
    driver (O(d³), d = embedding width), then a streaming per-batch
    projection ``(v - μ) @ W`` of the centered float vectors.

    Eigenvector sign is canonicalized (largest-|component| entry made
    positive) so repeated runs agree. The eigensolve itself is not
    SQL-expressible — this op is pytest-verified against a dense numpy
    PCA (see the knn_ivf precedent for layout-dependent-free but
    non-SQL ops). Returns (id, pc: list<double>).
    """
    stats = gram_quantized(emb, vec_col=vec_col, scale=scale).to_pandas()
    d = int(stats["dim_i"].max()) + 1
    n = int(stats["n"].iloc[0])
    C = np.zeros((d, d))
    C[stats["dim_i"], stats["dim_j"]] = stats["cov"]
    C[stats["dim_j"], stats["dim_i"]] = stats["cov"]
    mu = np.zeros(d)
    sums = stats.drop_duplicates("dim_i").sort_values("dim_i")["sum_i"].to_numpy()
    mu[: len(sums)] = sums / (n * scale)
    w, V = np.linalg.eigh(C)
    order = np.argsort(w)[::-1][:out_dim]
    W = V[:, order]
    flip = np.sign(W[np.argmax(np.abs(W), axis=0), np.arange(W.shape[1])])
    W = W * np.where(flip == 0, 1.0, flip)
    W_ref = ray.put(np.ascontiguousarray(W))
    mu_ref = ray.put(mu)

    def project(batch: pa.Table) -> pa.Table:
        m = batch.num_rows
        X = np.asarray(
            batch.column(vec_col).combine_chunks().flatten().to_numpy(), np.float64
        ).reshape(m, d)
        Wm = ray.get(W_ref)
        Xc = X - ray.get(mu_ref)
        # per-component elementwise-multiply + row sum instead of one
        # dgemm: BLAS blocking rounds differently per batch SHAPE, so a
        # matmul projection would differ across block layouts; numpy's
        # per-row pairwise reduction is fixed by d alone → bit-stable
        P = np.empty((m, Wm.shape[1]))
        for j in range(Wm.shape[1]):
            P[:, j] = (Xc * Wm[:, j]).sum(axis=1)
        return pa.table(
            {
                id_col: batch.column(id_col),
                "pc": pa.FixedSizeListArray.from_arrays(
                    pa.array(P.reshape(-1), pa.float64()), P.shape[1]
                ),
            }
        )

    return emb.map_batches(project, batch_format="pyarrow")
