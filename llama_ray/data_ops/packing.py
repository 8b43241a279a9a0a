"""Pretraining-corpus preparation operators: sequence packing and
benchmark-contamination checking.

Sequence packing is the concat-and-chop step of an LLM data pipeline:
documents (in ``doc_id`` order) are tokenized, concatenated with one
EOS separator after each document, and the resulting token stream is
chopped into fixed-length training sequences.  The operator reports,
per sequence, how many documents it straddles and which — the packing
manifest a trainer would use to attention-mask document boundaries.

Contamination checking is the n-gram-overlap audit run before
training: any training document sharing a word n-gram (default n=8,
the GPT-3/PaLM-style window) with a held-out benchmark document is
flagged with its overlap fraction.

Scale notes
-----------
* Packing needs one **global prefix sum** over per-document token
  counts in ``doc_id`` order.  That is a classic two-wave scan: a
  range sort by ``doc_id`` (Ray's distributed sort), then wave 1
  reduces each block to ONE scalar (its slot total), the driver does
  an O(num_blocks) exclusive prefix over those scalars, and wave 2
  re-maps each block with its start offset.  Only scalars cross the
  driver; document text never does.
* Contamination broadcasts the **small side**: the benchmark split is
  1 % of the corpus by construction (held-out benchmarks are small by
  definition), so its distinct n-gram hashes are collected once,
  sorted, ``ray.put`` once, and every training batch probes them with
  a vectorized ``searchsorted`` — no all-to-all shuffle join of the
  99 % training side.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data.aggregate import Max, Min, Sum

from ..common import batch_to_numpy, per_block_results
from .dedup import _GOLD, _U64, _mix64, _word_ngram_hashes_batch

# --------------------------------------------------------------- packing


def _slot_counts(batch: pa.Table, id_col: str, text_col: str) -> dict:
    """Per-doc packed-slot counts: whitespace tokens + 1 EOS separator.

    The token count is the same Arrow RE2 kernel as the
    ``doc_token_stats`` query (``\\S+`` runs), so the packed stream
    length agrees with the rest of the text layer and with the DuckDB
    oracle's ``regexp_split_to_array`` arithmetic.
    """
    ntok = pc.count_substring_regex(batch.column(text_col), r"\S+").cast(pa.int64())
    return {
        "doc_id": batch_to_numpy(batch, id_col),
        "slots": ntok.to_numpy(zero_copy_only=False) + 1,
    }


def _pack_block(tbl: pa.Table, start: int, seq_len: int) -> pa.Table:
    """Expand one sorted block of (doc_id, slots) starting at global
    stream offset ``start`` into per-(sequence, doc) overlap rows,
    partially aggregated per sequence within the block."""
    if "doc_id" not in tbl.schema.names or tbl.num_rows == 0:
        doc = np.empty(0, np.int64)
    else:
        doc = tbl.column("doc_id").to_numpy()
    if len(doc) == 0:
        empty = np.empty(0, np.int64)
        return pa.table(
            {"seq_id": empty, "n_docs": empty, "first_doc": empty, "last_doc": empty}
        )
    slots = tbl.column("slots").to_numpy()
    ends = start + np.cumsum(slots)
    starts = ends - slots
    first_seq = starts // seq_len
    last_seq = (ends - 1) // seq_len
    counts = last_seq - first_seq + 1
    total = int(counts.sum())
    # vectorized "repeat each doc over its sequence range"
    reps = np.repeat(first_seq, counts)
    intra = np.arange(total, dtype=np.int64) - np.repeat(
        np.cumsum(counts) - counts, counts
    )
    seq = reps + intra
    docs_rep = np.repeat(doc, counts)
    # partial per-seq aggregate inside the block (seq is already sorted
    # because docs are doc_id-sorted and spans are contiguous)
    uniq, idx, n_docs = np.unique(seq, return_index=True, return_counts=True)
    bounds = np.append(idx, total)
    return pa.table(
        {
            "seq_id": uniq,
            "n_docs": n_docs.astype(np.int64),
            "first_doc": docs_rep[bounds[:-1]],
            "last_doc": docs_rep[bounds[1:] - 1],
        }
    )


def pack_sequences(
    docs: rd.Dataset,
    *,
    seq_len: int = 2048,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> rd.Dataset:
    """Concat-and-chop sequence packing manifest.

    Documents are taken in ``id_col`` order; each contributes its
    whitespace-token count plus one EOS slot to a single concatenated
    stream, which is chopped into fixed windows of ``seq_len`` slots
    (the final partial window is a sequence too).  Returns one row per
    sequence: ``seq_id``, ``n_docs`` (documents overlapping the
    window), ``first_doc`` / ``last_doc`` (the id range it covers).

    Reference analogue: the packing step of an LLM pretraining
    pipeline (chop semantics per GPT-3-style concat-and-chop); the
    prefix-scan shape mirrors the engine's sessionization operator.
    """
    if seq_len <= 0:
        raise ValueError("seq_len must be positive")
    srt = (
        docs.map_batches(
            lambda b: _slot_counts(b, id_col, text_col), batch_format="pyarrow"
        )
        .sort("doc_id")
        .materialize()
    )
    # wave 1: one scalar per block; driver O(num_blocks) exclusive scan
    # (empty blocks from an empty input lose their schema — treat as 0)
    sums = per_block_results(
        srt,
        lambda t: int(np.sum(t.column("slots").to_numpy()))
        if "slots" in t.schema.names
        else 0,
    )
    offsets = np.concatenate([[0], np.cumsum(sums[:-1])]).astype(np.int64)
    # wave 2: per-block expansion with its start offset (plain tasks
    # over the already-materialized sorted block refs)
    task = ray.remote(_pack_block)
    refs = [
        task.remote(r, int(off), seq_len)
        for r, off in zip(srt.to_arrow_refs(), offsets)
    ]
    parts = rd.from_arrow_refs(refs)
    # a sequence window can straddle a block boundary: merge partials
    out = parts.groupby("seq_id").aggregate(
        Sum("n_docs", alias_name="n_docs"),
        Min("first_doc", alias_name="first_doc"),
        Max("last_doc", alias_name="last_doc"),
    )
    return out


# --------------------------------------------------------- contamination


def _split_bucket(ids: np.ndarray, seed: int) -> np.ndarray:
    """The engine's standard content-independent id split:
    splitmix64(doc_id·GOLD ⊕ seed) mod 1000 (< 980 train, < 990 valid,
    else test) — identical to ``text.hash_split_summary``."""
    h = _mix64(ids.astype(np.uint64) * _GOLD ^ np.uint64(seed))
    return (h % np.uint64(1000)).astype(np.int64)


def _doc_grams(batch: pa.Table, n: int, text_col: str):
    """(per-doc unique n-gram hashes concatenated, per-doc counts)."""
    return _word_ngram_hashes_batch(batch.column(text_col), n)


def contamination(
    docs: rd.Dataset,
    *,
    n: int = 8,
    seed: int = 20260818,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_bench_grams: int = 100_000_000,
) -> rd.Dataset:
    """Benchmark-contamination audit.

    The held-out benchmark is a 10 % id-hash holdout (same splitmix64
    bucket family as ``hash_split_summary``: bucket >= 900 of 1000).
    Every *training* document (the other 90 %) sharing at least one
    word ``n``-gram with any benchmark
    document is reported with ``n_hits`` (distinct shared grams),
    ``n_ngrams`` (its distinct gram count) and ``contam_frac``
    (rounded to 1e-6).

    Grams are the same hashed-token feature space as the n-gram
    Jaccard dedup operator (lowercased whitespace tokens → 32-byte
    polynomial hash → splitmix64 → GOLD-rolled window → splitmix64;
    documents shorter than ``n`` tokens yield one whole-doc gram,
    empty documents none).

    Scale: the benchmark side's distinct gram hashes are reduced
    per-block, unioned on the driver (the bench split is a fixed small
    fraction and
    benchmark suites are small by definition — the array is u64 per
    distinct gram), sorted and broadcast once with ``ray.put``; the
    training scan probes with ``searchsorted`` per batch.  No shuffle
    touches the 99 % side.
    """

    def bench_part(batch: pa.Table) -> dict:
        ids = batch_to_numpy(batch, id_col)
        mask = _split_bucket(ids, seed) >= 900
        if not mask.any():
            return {"g": np.empty(0, _U64)}
        sub = batch.filter(pa.array(mask))
        g, _counts = _doc_grams(sub, n, text_col)
        return {"g": np.unique(g)}

    bench_ds = docs.map_batches(bench_part, batch_format="pyarrow")
    # collect per-block unique gram arrays (bounded: bench split is small)
    blocks = per_block_results(
        bench_ds.materialize(),
        lambda t: t.column("g").to_numpy()
        if "g" in t.schema.names
        else np.empty(0, np.uint64),
    )
    bench = (
        np.unique(np.concatenate(blocks)) if blocks else np.empty(0, _U64)
    )
    if len(bench) > max_bench_grams:
        # The broadcast design assumes the bench side is a benchmark
        # suite — bounded by its nature (100M grams ≈ 800 MB already
        # stretches it). A bench side at corpus scale is a different
        # problem: use the MinHash-LSH near-dup pipeline
        # (dedup.minhash_lsh_dedup) between the two corpora instead.
        raise ValueError(
            f"bench side has {len(bench)} distinct {n}-grams "
            f"(> max_bench_grams={max_bench_grams}); contamination "
            "expects a bounded benchmark suite — for corpus-vs-corpus "
            "overlap use the MinHash-LSH near-dup operator"
        )
    bench_ref = ray.put(bench)

    def train_scan(batch: pa.Table) -> dict:
        bg = ray.get(bench_ref)
        ids = batch_to_numpy(batch, id_col)
        mask = _split_bucket(ids, seed) < 900
        empty = {
            "doc_id": np.empty(0, np.int64),
            "n_hits": np.empty(0, np.int64),
            "n_ngrams": np.empty(0, np.int64),
            "contam_frac": np.empty(0, np.float64),
        }
        if not mask.any():
            return empty
        sub = batch.filter(pa.array(mask))
        g, counts = _doc_grams(sub, n, text_col)
        if len(g) == 0:
            return empty
        pos = np.searchsorted(bg, g)
        hit = np.zeros(len(g), bool)
        if len(bg):
            ok = pos < len(bg)
            hit[ok] = bg[pos[ok]] == g[ok]
        # per-doc hit counts via cumsum differences (reduceat chokes on
        # zero-gram docs whose segment start == len(hit))
        bounds = np.concatenate([[0], np.cumsum(counts)])
        ch = np.concatenate([[0], np.cumsum(hit.astype(np.int64))])
        n_hits = ch[bounds[1:]] - ch[bounds[:-1]]
        keep = n_hits > 0
        sub_ids = batch_to_numpy(sub, id_col)
        return {
            "doc_id": sub_ids[keep],
            "n_hits": n_hits[keep],
            "n_ngrams": counts[keep],
            "contam_frac": np.round(n_hits[keep] / counts[keep], 6),
        }

    return docs.map_batches(train_scan, batch_format="pyarrow")


def _bloom_salts(k_hashes: int) -> list[int]:
    mask = (1 << 64) - 1
    return [(int(_GOLD) * (j + 1)) & mask for j in range(k_hashes)]


def contamination_bloom(
    docs: rd.Dataset,
    *,
    n: int = 8,
    seed: int = 20260818,
    log2_bits: int = 20,
    k_hashes: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> rd.Dataset:
    """Bloom-filter contamination audit — the memory-bounded variant
    of :func:`contamination`: the benchmark side's gram set is folded
    into a fixed ``2^log2_bits``-bit Bloom filter (``k_hashes``
    splitmix64 probes per gram) instead of an exact broadcast array,
    so the broadcast is constant-size no matter how large the bench
    suite grows.  Train grams whose probes are ALL set are
    "maybe-contaminated" — a deterministic superset of the exact hits
    (false-positive rate ≈ (1 − e^{−kn/m})^k; every bit position is a
    pure splitmix64 function, so the result is bit-identical in any
    block layout AND in SQL, where the filter is the distinct
    position set).

    Per bench block one O(2^log2_bits/8)-byte OR-partial (commutative
    merge on the driver); train scan probes the broadcast words with
    vectorized shifts — the same no-shuffle shape as the exact op."""
    bits = 1 << log2_bits
    words = bits >> 6
    salts = [_U64(s) for s in _bloom_salts(k_hashes)]
    pmask = _U64(bits - 1)

    from .dedup import _mix64

    def bench_bits(batch: pa.Table) -> dict:
        ids = batch_to_numpy(batch, id_col)
        mask = _split_bucket(ids, seed) >= 900
        w = np.zeros(words, np.uint64)
        if mask.any():
            sub = batch.filter(pa.array(mask))
            g, _c = _doc_grams(sub, n, text_col)
            for s in salts:
                p = (_mix64(g ^ s) & pmask).astype(np.int64)
                np.bitwise_or.at(
                    w, p >> 6, np.left_shift(_U64(1), (p & 63).astype(np.uint64))
                )
        return {"w": w}

    def block_or(t: pa.Table):
        if "w" not in t.schema.names or t.num_rows == 0:
            return None
        arr = t.column("w").to_numpy(zero_copy_only=False).astype(np.uint64)
        # a block may hold several concatenated per-batch partials
        return np.bitwise_or.reduce(arr.reshape(-1, words), axis=0)

    partials = per_block_results(
        docs.map_batches(bench_bits, batch_format="pyarrow").materialize(),
        block_or,
    )
    bloom = np.zeros(words, np.uint64)
    for p in partials:
        if p is not None:
            bloom |= p
    bloom_ref = ray.put(bloom)

    def train_scan(batch: pa.Table) -> dict:
        bw = ray.get(bloom_ref)
        ids = batch_to_numpy(batch, id_col)
        mask = _split_bucket(ids, seed) < 900
        empty = {
            "doc_id": np.empty(0, np.int64),
            "n_maybe_hits": np.empty(0, np.int64),
            "n_ngrams": np.empty(0, np.int64),
            "flag_frac": np.empty(0, np.float64),
        }
        if not mask.any():
            return empty
        sub = batch.filter(pa.array(mask))
        g, counts = _doc_grams(sub, n, text_col)
        if len(g) == 0:
            return empty
        hit = np.ones(len(g), bool)
        for s in salts:
            p = (_mix64(g ^ s) & pmask).astype(np.int64)
            hit &= (bw[p >> 6] >> (p & 63).astype(np.uint64)) & _U64(1) != 0
        bounds = np.concatenate([[0], np.cumsum(counts)])
        ch = np.concatenate([[0], np.cumsum(hit.astype(np.int64))])
        n_hits = ch[bounds[1:]] - ch[bounds[:-1]]
        keep = n_hits > 0
        sub_ids = batch_to_numpy(sub, id_col)
        return {
            "doc_id": sub_ids[keep],
            "n_maybe_hits": n_hits[keep],
            "n_ngrams": counts[keep],
            "flag_frac": np.round(n_hits[keep] / counts[keep], 6),
        }

    return docs.map_batches(train_scan, batch_format="pyarrow")
