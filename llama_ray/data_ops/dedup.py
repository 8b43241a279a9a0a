"""Deduplication operators for large-scale training-data pipelines.

All stages are shuffle-native and vectorized; **no document text ever
reaches the driver**:

- exact:       content hash → groupby(hash) → min-id survivor
- MinHash+LSH: uint64 feature hashes (char k-shingles or word
               n-grams) → multiply-shift minhash signature matrix →
               band buckets → sort(bucket) + within-run pair
               generation → distributed hash-join of candidate pairs
               back to feature sketches → exact (hashed-feature)
               Jaccard verification in ``map_batches`` → connected
               components via the distributed min-label WCC engine.
               Only O(#docs) cluster labels are ever collected.
- SimHash:     64-bit token-hash bit votes, fully vectorized
               (unpackbits + reduceat per batch)
- n-gram Jaccard: the same LSH pipeline over word-n-gram features,
               returning verified (a, b, jaccard) pairs
- embedding near-dup: cosine ≥ τ pairs via random-hyperplane LSH
               buckets (exact cosine within bucket, capped + logged)

Scale notes: hot LSH buckets are capped at ``max_bucket`` docs —
larger runs degrade to hub("star") pairs, which preserves cluster
*connectivity* for dedup while bounding the O(L²) pair blowup; the
number of degraded runs is logged. Feature sketches travel as binary
columns (Acero hash joins don't take list payloads).
"""

from __future__ import annotations

import logging

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd
from ray.data.aggregate import Count, Min

from ..common import batch_to_numpy, binary_matrix, content_hash_column

logger = logging.getLogger(__name__)

_U64 = np.uint64
_FNV = _U64(1099511628211)  # FNV-1a prime (odd, good avalanche with the mixer)
_GOLD = _U64(0x9E3779B97F4A7C15)  # 2^64 / golden ratio, odd


def _mix64(h: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — decorrelates the weak polynomial rolls."""
    h = h.astype(_U64, copy=True)
    h ^= h >> _U64(30)
    h *= _U64(0xBF58476D1CE4E5B9)
    h ^= h >> _U64(27)
    h *= _U64(0x94D049BB133111EB)
    h ^= h >> _U64(31)
    return h


# ------------------------------------------------------------------ features


def _char_shingle_hashes(text: str, k: int) -> np.ndarray:
    """Sorted unique 64-bit hashes of the k-byte shingles of the
    whitespace-normalized lowercased text. Fully vectorized: one
    polynomial roll over a (len, k) stride view — no per-shingle
    Python."""
    t = " ".join(text.split()).lower()
    if not t:
        return np.empty(0, _U64)
    b = np.frombuffer(t.encode("utf-8"), np.uint8)
    if len(b) <= k:
        w = b[None, :]
    else:
        w = np.lib.stride_tricks.sliding_window_view(b, k)
    h = np.zeros(len(w), _U64)
    for i in range(w.shape[1]):
        h = h * _FNV + w[:, i]
    return np.unique(_mix64(h))


def _token_hashes(tokens: list[str]) -> np.ndarray:
    """64-bit hash per token, vectorized: tokens padded into a fixed
    (n, 32) byte matrix and polynomial-rolled column-wise (32 vector
    ops total). Tokens sharing a 32-byte prefix collide — harmless
    for sketching."""
    if not tokens:
        return np.empty(0, _U64)
    arr = np.array([t.encode("utf-8")[:32] for t in tokens], dtype="S32")
    M = arr.view(np.uint8).reshape(len(arr), 32)
    h = np.zeros(len(arr), _U64)
    for i in range(32):
        h = h * _FNV + M[:, i]
    return _mix64(h)


def _word_ngram_hashes(text: str, n: int) -> np.ndarray:
    """Sorted unique hashes of word n-grams: hash tokens, then roll n
    consecutive token hashes together."""
    th = _token_hashes(text.lower().split())
    if len(th) == 0:
        return np.empty(0, _U64)
    if len(th) < n:
        g = np.zeros(1, _U64)
        for v in th:
            g = g * _GOLD + v
        return _mix64(g)
    m = len(th) - n + 1
    g = th[:m].astype(_U64, copy=True)
    for j in range(1, n):
        g = g * _GOLD + th[j : j + m]
    return np.unique(_mix64(g))


def _string_segments(col) -> tuple[np.ndarray, np.ndarray]:
    """(utf8 byte buffer, int64 element offsets) of a non-null Arrow
    string column — zero-copy views of the Arrow buffers. Offsets are
    absolute positions into the returned buffer (they need not start
    at 0 for sliced arrays)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    n = len(arr)
    if n == 0:
        return np.empty(0, np.uint8), np.zeros(1, np.int64)
    if arr.null_count:
        raise ValueError("null text in feature column")
    bufs = arr.buffers()
    odt = np.int64 if pa.types.is_large_string(arr.type) else np.int32
    offs = np.frombuffer(bufs[1], odt, count=n + 1 + arr.offset)[arr.offset :].astype(np.int64)
    data = np.frombuffer(bufs[2], np.uint8) if bufs[2] is not None else np.empty(0, np.uint8)
    return data, offs


def _rolled_windows(vals: np.ndarray, offs: np.ndarray, k: int, mult) -> tuple[np.ndarray, np.ndarray]:
    """(window hashes grouped in segment order, per-segment window
    counts) for every width-``k`` window inside each segment
    ``vals[offs[d]:offs[d+1]]``. Segments shorter than k yield one
    whole-segment window; empty segments yield none — exactly the
    per-row featurizer semantics.

    One in-place polynomial roll covers the whole buffer; a
    scatter+cumsum keep-mask drops the boundary-crossing windows (no
    per-window index arrays — an earlier repeat/arange/gather
    formulation spent 4s on bookkeeping for a 17M-window batch where
    this spends 0.5s). The < k stragglers are rolled in length classes
    (at most k-1) and spliced in with one ``np.insert``."""
    offs = np.asarray(offs, np.int64)
    lens = np.diff(offs)
    m = len(vals) - k + 1
    big = lens >= k
    cnt_big = np.where(big, lens - k + 1, 0).astype(np.int64)
    h_big = np.empty(0, _U64)
    if m > 0 and big.any():
        # in-place roll: two passes over the buffer per tap, no temps
        h = vals[0:m].astype(_U64)
        for j in range(1, k):
            h *= mult
            h += vals[j : j + m]
        # keep-mask: drop windows crossing a segment boundary, inside
        # short segments, or outside [offs[0], offs[-1]) (sliced cols)
        mark = np.zeros(m + 1, np.int32)
        inv_s = np.clip(np.maximum(offs[1:] - k + 1, offs[:-1]), 0, m)
        inv_e = np.clip(offs[1:], 0, m)
        np.add.at(mark, inv_s, 1)
        np.add.at(mark, inv_e, -1)
        if offs[0] > 0:
            mark[0] += 1
            mark[min(int(offs[0]), m)] -= 1
        tail = min(int(offs[-1]), m)
        if tail < m:
            mark[tail] += 1
        h_big = h[np.cumsum(mark[:-1]) == 0]
    counts = cnt_big
    small_idx = np.flatnonzero(~big & (lens > 0))
    if len(small_idx):
        parts_r, parts_h = [], []
        for L in np.unique(lens[small_idx]):
            rows = small_idx[lens[small_idx] == L]
            w = vals[offs[:-1][rows][:, None] + np.arange(int(L), dtype=np.int64)[None, :]]
            hh = np.zeros(len(rows), _U64)
            for j in range(int(L)):
                hh = hh * mult + w[:, j]
            parts_r.append(rows)
            parts_h.append(hh)
        rows = np.concatenate(parts_r)
        hs = np.concatenate(parts_h)
        o = np.argsort(rows, kind="stable")
        rows, hs = rows[o], hs[o]
        # splice each whole-short-segment window in segment order
        # (a short segment contributes no big windows, so its insert
        # point is the big-window count of the segments before it)
        exc = np.cumsum(cnt_big) - cnt_big
        h_big = np.insert(h_big, exc[rows], hs)
        counts = cnt_big.copy()
        counts[rows] = 1
    return h_big, counts


def _segment_unique(h: np.ndarray, counts: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Sorted-unique hashes per contiguous segment of ``h`` (segment d
    owns ``counts[d]`` values): (concatenated uniques in segment
    order, per-segment unique counts). One small ``np.sort`` +
    adjacent-dedup per segment: a global (seg, h) sort is 5-8× slower
    here (numpy's 64-bit sorts aren't radix, and window counts per doc
    are cache-sized), while this loop is per *doc*, not per token."""
    if not len(h):
        return h.astype(_U64), np.zeros(len(counts), np.int64)
    bounds = np.concatenate([[0], np.cumsum(counts)])
    ucnt = np.zeros(len(counts), np.int64)
    out = np.empty(len(h), _U64)
    pos = 0
    for d in np.flatnonzero(counts):
        u = np.sort(h[bounds[d] : bounds[d + 1]])
        if len(u) > 1:
            u = u[np.concatenate([[True], u[1:] != u[:-1]])]
        out[pos : pos + len(u)] = u
        ucnt[d] = len(u)
        pos += len(u)
    return out[:pos], ucnt


def _char_shingle_hashes_batch(col, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Batch twin of :func:`_char_shingle_hashes` over a whole Arrow
    string column: (concatenated sorted-unique hashes in row order,
    per-row counts). Whitespace normalization runs as RE2 kernels
    (``\\s+`` → one space, trim, lower) — the same definition the
    DuckDB oracles use (`regexp_replace(text, '\\s+', ' ', 'g')`);
    the per-row twin's ``str.split`` additionally folds the rare
    non-RE2 whitespace (\\x0b, Unicode spaces), which clean corpora
    don't contain. The polynomial roll reads the utf8 buffer directly
    — no per-doc Python anywhere."""
    import pyarrow.compute as pc

    from ..common import copied_strings

    norm = pc.utf8_lower(
        pc.utf8_trim(pc.replace_substring_regex(copied_strings(col), r"\s+", " "), " ")
    )
    data, offs = _string_segments(norm)
    h, counts = _rolled_windows(data, offs, k, _FNV)
    return _segment_unique(_mix64(h), counts)


_WS_BYTES = np.zeros(256, bool)
# \t \n \v \f \r space + \x1c-\x1f (Python str.split's ASCII whitespace
# set; the only divergence left vs str.split is multi-byte Unicode
# spaces such as \x85/\xa0, which clean corpora don't contain)
_WS_BYTES[[9, 10, 11, 12, 13, 28, 29, 30, 31, 32]] = True


def _ws_token_spans(data: np.ndarray, offs: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Token (byte start, byte length) spans per document plus per-doc
    token counts, via one vectorized byte-mask scan of the utf8 buffer
    — ASCII-whitespace ``str.split`` semantics, empties never emitted.
    Used instead of ``pc.utf8_split_whitespace``, which intermittently
    fails to split on a boundary byte (see common.copied_strings; the
    fault reproduces even on freshly allocated buffers). Multibyte
    UTF-8 sequences are opaque >= 0x80 bytes, so they pass through
    unsplit; the rare Unicode space is the documented divergence."""
    D = len(offs) - 1
    lo, hi = int(offs[0]), int(offs[-1])
    if hi <= lo:
        return np.empty(0, np.int64), np.empty(0, np.int64), np.zeros(D, np.int64)
    nonws = ~_WS_BYTES[data[lo:hi]]
    rel = offs[1:-1].astype(np.int64) - lo
    rel = rel[rel < hi - lo]  # doc starts at the buffer end (trailing
    # empty docs) have no byte to mark
    prev = np.empty(len(nonws), bool)
    prev[0] = False
    prev[1:] = nonws[:-1]
    prev[rel] = False  # a doc start never continues the previous doc's token
    starts = np.flatnonzero(nonws & ~prev)
    nxt = np.empty(len(nonws), bool)
    nxt[-1] = False
    nxt[:-1] = nonws[1:]
    last_of_doc = rel - 1
    nxt[last_of_doc[last_of_doc >= 0]] = False  # a token never crosses a doc end
    ends = np.flatnonzero(nonws & ~nxt)
    lens = ends - starts + 1
    per_doc = np.searchsorted(starts, offs[1:] - lo) - np.searchsorted(starts, offs[:-1] - lo)
    return starts + lo, lens, per_doc.astype(np.int64)


def _tokens_string_array(starts: np.ndarray, lens: np.ndarray, data: np.ndarray) -> pa.Array:
    """Materialize token spans as an Arrow string array with one
    vectorized byte gather (compacted buffer + offsets), no per-token
    Python."""
    cum = np.concatenate([[0], np.cumsum(lens)]).astype(np.int64)
    total = int(cum[-1])
    idx = np.repeat(starts - cum[:-1], lens) + np.arange(total, dtype=np.int64)
    return pa.Array.from_buffers(
        pa.string(),
        len(starts),
        [None, pa.py_buffer(cum.astype(np.int32).tobytes()), pa.py_buffer(data[idx].tobytes())],
    )


def _token_matrix(col) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Tokenize a string column (lowercase + whitespace split, empties
    dropped — ``str.split`` semantics) without materializing Python
    strings. Returns (token byte starts, token byte lengths, per-doc
    token counts, flat utf8 buffer)."""
    import pyarrow.compute as pc

    from ..common import copied_strings

    lower = pc.utf8_lower(copied_strings(col))
    tdata, toffs = _string_segments(lower)
    starts, lens, per_doc = _ws_token_spans(tdata, toffs)
    return starts, lens, per_doc, tdata


def _token_hashes_from_matrix(starts: np.ndarray, lens: np.ndarray, tdata: np.ndarray) -> np.ndarray:
    """64-bit hash per token — the same 32-byte-prefix polynomial as
    :func:`_token_hashes`, built by one (T, 32) gather from the flat
    utf8 buffer instead of a per-token Python encode."""
    T = len(starts)
    if T == 0:
        return np.empty(0, _U64)
    W = 32
    cols = np.arange(W, dtype=np.int64)[None, :]
    valid = cols < np.minimum(lens, W)[:, None]
    idx = np.minimum(starts[:, None] + cols, max(len(tdata) - 1, 0))
    M = np.where(valid, tdata[idx], 0)
    h = np.zeros(T, _U64)
    for i in range(W):
        h = h * _FNV + M[:, i]
    return _mix64(h)


def _word_ngram_hashes_batch(col, n: int) -> tuple[np.ndarray, np.ndarray]:
    """Batch twin of :func:`_word_ngram_hashes`: (concatenated
    sorted-unique n-gram hashes in row order, per-row counts)."""
    starts, lens, per_doc, tdata = _token_matrix(col)
    th = _token_hashes_from_matrix(starts, lens, tdata)
    g, counts = _rolled_windows(th, np.concatenate([[0], np.cumsum(per_doc)]), n, _GOLD)
    return _segment_unique(_mix64(g), counts)


def _flat_u64_column(col) -> tuple[np.ndarray, np.ndarray]:
    """Flatten a non-null binary column of uint64 sketches into
    (concatenated values in row order, per-row element counts) without
    per-row Python — reads the Arrow offsets/data buffers directly."""
    arr = col.combine_chunks()
    n = len(arr)
    if n == 0:
        return np.empty(0, _U64), np.empty(0, np.int64)
    if arr.null_count:  # sketches are never null in these pipelines
        raise ValueError("null sketch in feature column")
    bufs = arr.buffers()
    offs = np.frombuffer(bufs[1], np.int32, count=n + 1 + arr.offset)[arr.offset :]
    data = (
        np.frombuffer(bufs[2], np.uint8)
        if bufs[2] is not None
        else np.empty(0, np.uint8)
    )
    seg = np.ascontiguousarray(data[int(offs[0]) : int(offs[-1])])
    vals = seg.view(_U64) if len(seg) else np.empty(0, _U64)
    lens = ((offs[1:] - offs[:-1]) // 8).astype(np.int64)
    return vals, lens


# --------------------------------------------------------------- exact


def exact_dedup(docs: rd.Dataset, *, id_col: str = "doc_id", text_col: str = "text") -> rd.Dataset:
    """Survivors: min id per distinct content hash → (doc_id, copies).
    The content hash is the vectorized columnar kernel (no per-row
    Python in this hot path; the hash is an in-run grouping key only).

    The per-hash (min id, count) reduce is ONE range sort + per-block
    run reduceat: interior runs reduce locally, each block's two edge
    runs ship one mergeable partial row to an O(blocks) driver merge
    (min and count both merge across blocks). Ray's generic
    ``groupby().aggregate()`` measured ~200× slower than the sort on
    multi-million-row hash keys — this cut the 1M-doc bench from 20 s
    to ~2 s, and at 100 TB this IS the hot stage."""
    from ..common import per_block_results

    def hash_col(batch: pa.Table):
        empty = {"h": np.empty(0, np.int64), id_col: np.empty(0, np.int64)}
        if batch.num_rows == 0 or text_col not in batch.schema.names:
            return empty
        h = content_hash_column(batch.column(text_col))
        return {"h": h, id_col: batch_to_numpy(batch, id_col)}

    srt = docs.map_batches(hash_col, batch_format="pyarrow").sort("h").materialize()

    def interior(tbl: pa.Table) -> pa.Table:
        schema = pa.schema(
            [pa.field(id_col, pa.int64()), pa.field("copies", pa.int64())]
        )
        if tbl.num_rows == 0:
            return schema.empty_table()
        h = tbl.column("h").combine_chunks().to_numpy(zero_copy_only=False)
        ids = tbl.column(id_col).combine_chunks().to_numpy(zero_copy_only=False)
        m = len(h)
        new = np.ones(m, bool)
        new[1:] = h[1:] != h[:-1]
        starts = np.flatnonzero(new)
        keep = (h[starts] != h[0]) & (h[starts] != h[-1])
        if not keep.any():
            return schema.empty_table()
        lens = np.diff(np.append(starts, m))
        mins = np.minimum.reduceat(ids, starts)
        return pa.table(
            {
                id_col: mins[keep].astype(np.int64),
                "copies": lens[keep].astype(np.int64),
            }
        )

    main = srt.map_batches(interior, batch_format="pyarrow", batch_size=None)

    def edge_partials(tbl: pa.Table):
        if tbl.num_rows == 0:
            return None
        h = tbl.column("h").combine_chunks().to_numpy(zero_copy_only=False)
        ids = tbl.column(id_col).combine_chunks().to_numpy(zero_copy_only=False)
        rows = []
        for val in {int(h[0]), int(h[-1])}:
            mask = h == val
            rows.append((val, int(ids[mask].min()), int(mask.sum())))
        return rows

    edge = [
        r
        for part in per_block_results(srt, edge_partials)
        if part is not None
        for r in part
    ]
    if edge:
        hv = np.array([r[0] for r in edge], np.int64)
        mv = np.array([r[1] for r in edge], np.int64)
        cv = np.array([r[2] for r in edge], np.int64)
        uk, inv = np.unique(hv, return_inverse=True)
        mins = np.full(len(uk), np.iinfo(np.int64).max, np.int64)
        np.minimum.at(mins, inv, mv)
        cnts = np.zeros(len(uk), np.int64)
        np.add.at(cnts, inv, cv)
        main = main.union(
            rd.from_arrow(pa.table({id_col: mins, "copies": cnts}))
        )
    return main


# ------------------------------------------------------------- MinHash


class MinHasher:
    """n-permutation minhash over uint64 feature hashes using the
    multiply-shift universal family ``h_i(x) = a_i * x + b_i mod 2^64``
    (a_i odd) — pure uint64 matrix arithmetic, no Python-int bigints.
    Parameters are generated once per actor (deterministic seed →
    identical across actors)."""

    def __init__(self, num_hashes: int = 128, seed: int = 42):
        rng = np.random.default_rng(seed)
        self.a = (rng.integers(0, 1 << 62, num_hashes, dtype=np.uint64) << _U64(1)) | _U64(1)
        self.b = rng.integers(0, 1 << 63, num_hashes, dtype=np.uint64)
        self.n = num_hashes

    def signatures(self, feats: np.ndarray, starts: np.ndarray) -> np.ndarray:
        """(D, H) signature matrix for D docs whose uint64 feature
        hashes are concatenated in ``feats``; doc d owns
        ``feats[starts[d]:starts[d+1]]``. Per doc: one (H, s) wrapping
        multiply + SIMD row-min — measured 5× faster than a tiled
        ``minimum.reduceat`` formulation. Empty docs get the all-max
        sentinel signature."""
        D = len(starts) - 1
        out = np.full((D, self.n), np.iinfo(np.uint64).max, _U64)
        if D == 0 or len(feats) == 0:
            return out
        starts = np.asarray(starts, np.int64)
        for d in range(D):
            f = feats[starts[d] : starts[d + 1]]
            if len(f) == 0:
                continue
            M = self.a[:, None] * f[None, :]  # wraps mod 2^64
            M += self.b[:, None]
            out[d] = M.min(axis=1)
        return out

    def signature(self, text: str, *, shingle_k: int = 5) -> np.ndarray:
        """Single-doc convenience (char-shingle features)."""
        f = _char_shingle_hashes(text, shingle_k)
        return self.signatures(f, np.array([0, len(f)], np.int64))[0]


def _band_buckets(sigs: np.ndarray, bands: int) -> np.ndarray:
    """(D, bands) int64 LSH bucket keys: fold each band's signature
    rows and mix the band index in (so one flat int64 column encodes
    (band, bucket))."""
    D, H = sigs.shape
    rows = H // bands
    S = sigs[:, : bands * rows].reshape(D, bands, rows)
    h = np.zeros((D, bands), _U64)
    for r in range(rows):
        h = h * _GOLD + S[:, :, r]
    h = h * _GOLD + np.arange(bands, dtype=_U64)[None, :]
    return _mix64(h).view(np.int64)


class MinHashSketcher:
    """Actor-pool sketch stage: one row per doc with the feature set
    (binary uint64 array), feature count, and per-band LSH bucket
    keys as columns ``b0..b{bands-1}``. All downstream stages (pair
    generation, verification) derive from this one table, so the text
    is read exactly once."""

    def __init__(
        self,
        num_hashes: int = 128,
        bands: int = 32,
        shingle_k: int = 5,
        id_col: str = "doc_id",
        text_col: str = "text",
        feature: str = "char",
        ngram_n: int = 3,
        seed: int = 42,
        emit_feats: bool = True,
    ):
        self.mh = MinHasher(num_hashes, seed)
        self.bands = bands
        self.k = shingle_k
        self.id_col = id_col
        self.text_col = text_col
        self.feature = feature
        self.ngram_n = ngram_n
        # emit_feats=False: signature fold only (compute-bound probe /
        # pure-sketch consumers) — skips the O(text) feats binary
        self.emit_feats = emit_feats

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch_to_numpy(batch, self.id_col)
        col = batch.column(self.text_col)
        if self.feature == "word":
            concat, lens = _word_ngram_hashes_batch(col, self.ngram_n)
        else:
            concat, lens = _char_shingle_hashes_batch(col, self.k)
        starts = np.concatenate([[0], np.cumsum(lens)])
        sigs = self.mh.signatures(concat, starts)
        if not self.emit_feats:
            fold = np.zeros(len(ids), _U64)
            for h in range(sigs.shape[1]):
                fold = fold * _GOLD + sigs[:, h]
            return pa.table({"doc_id": pa.array(ids), "sig": pa.array(_mix64(fold).view(np.int64))})
        buckets = _band_buckets(sigs, self.bands)
        feats_col = pa.Array.from_buffers(
            pa.binary(),
            len(ids),
            [
                None,
                pa.py_buffer((starts * 8).astype(np.int32).tobytes()),
                pa.py_buffer(concat.view(np.uint8).tobytes() if len(concat) else b""),
            ],
        )
        cols = {
            "doc_id": pa.array(ids),
            "nf": pa.array(lens),
            "feats": feats_col,
        }
        for b in range(self.bands):
            cols[f"b{b}"] = pa.array(buckets[:, b])
        return pa.table(cols)


def minhash_sketches(
    docs: rd.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 128,
    bands: int = 32,
    shingle_k: int = 5,
    feature: str = "char",
    ngram_n: int = 3,
    concurrency=(2, 8),
    batch_size: int = 256,
) -> rd.Dataset:
    """One sketch row per doc (see :class:`MinHashSketcher`)."""
    return docs.map_batches(
        MinHashSketcher,
        fn_constructor_kwargs=dict(
            num_hashes=num_hashes,
            bands=bands,
            shingle_k=shingle_k,
            id_col=id_col,
            text_col=text_col,
            feature=feature,
            ngram_n=ngram_n,
        ),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def _run_pairs_capped(bucket: np.ndarray, doc: np.ndarray, cap: int):
    """All unordered doc pairs within equal-value runs of the sorted
    ``bucket`` array; runs longer than ``cap`` degrade to star pairs
    around the run's min doc (connectivity preserved, O(L²) avoided).
    Returns (a, b, num_capped_runs) with a < b."""
    n = len(bucket)
    if n < 2:
        return np.empty(0, np.int64), np.empty(0, np.int64), 0
    starts = np.flatnonzero(np.concatenate([[True], bucket[1:] != bucket[:-1]]))
    lengths = np.diff(np.concatenate([starts, [n]]))
    big = lengths > cap
    num_capped = int(big.sum())
    small_rows = np.repeat(~big, lengths)

    from ..algos.triangles import _pairs_multirun

    sb, sd = bucket[small_rows], doc[small_rows]
    li, ri = _pairs_multirun(sb)
    a = np.minimum(sd[li], sd[ri])
    b = np.maximum(sd[li], sd[ri])

    if num_capped:
        hubs = np.minimum.reduceat(doc, starts)[big]
        big_rows = np.repeat(big, lengths)
        bd = doc[big_rows]
        hub_per_row = np.repeat(hubs, lengths[big])
        m = bd != hub_per_row
        a = np.concatenate([a, np.minimum(bd[m], hub_per_row[m])])
        b = np.concatenate([b, np.maximum(bd[m], hub_per_row[m])])
    return a, b, num_capped


def lsh_candidate_pairs(
    sketches: rd.Dataset, *, bands: int, max_bucket: int = 256
) -> rd.Dataset:
    """Distinct candidate (src, dst) doc pairs sharing an LSH bucket.

    Melt the per-band bucket columns → ``sort(bucket)`` (single-int64
    range shuffle) → vectorized within-run pair generation per block;
    runs touching a block edge go through a small second pass (the
    same boundary-run trick as ``dedup_edges``). Pair dedup across
    bands is a second sort-based pass."""

    def melt(batch: pa.Table):
        ids = batch_to_numpy(batch, "doc_id")
        nf = batch_to_numpy(batch, "nf")
        keep = nf > 0  # empty docs would form one giant degenerate bucket
        ids = ids[keep]
        cols = [batch_to_numpy(batch, f"b{b}")[keep] for b in range(bands)]
        return {
            "bucket": np.concatenate(cols) if cols else np.empty(0, np.int64),
            "doc": np.tile(ids, bands),
        }

    banded = sketches.map_batches(melt, batch_format="pyarrow", batch_size=None)
    srt = banded.sort("bucket").materialize()

    def interior(batch: pa.Table):
        bucket = batch_to_numpy(batch, "bucket")
        doc = batch_to_numpy(batch, "doc")
        if len(bucket) == 0:
            return {"src": np.empty(0, np.int64), "dst": np.empty(0, np.int64)}
        edge = (bucket == bucket[0]) | (bucket == bucket[-1])
        a, b, capped = _run_pairs_capped(bucket[~edge], doc[~edge], max_bucket)
        if capped:
            logger.warning("lsh_candidate_pairs: %d hot buckets degraded to star pairs", capped)
            from ..common import record_skew_event

            record_skew_event("lsh_candidate_pairs", "hot_bucket_cap", capped)
        return {"src": a, "dst": b}

    main = srt.map_batches(interior, batch_format="pyarrow", batch_size=None)

    from ..common import collect_boundary_runs

    btbl = collect_boundary_runs(
        srt, "bucket", columns=["bucket", "doc"], where="lsh_candidate_pairs"
    )
    if btbl is not None:
        bk = batch_to_numpy(btbl, "bucket")
        bd = batch_to_numpy(btbl, "doc")
        order = np.argsort(bk, kind="stable")
        a, b, capped = _run_pairs_capped(bk[order], bd[order], max_bucket)
        if capped:
            logger.warning("lsh_candidate_pairs: %d boundary buckets degraded to star pairs", capped)
            from ..common import record_skew_event

            record_skew_event("lsh_candidate_pairs", "boundary_bucket_cap", capped)
        if len(a):
            extra = rd.from_arrow(pa.table({"src": pa.array(a), "dst": pa.array(b)}))
            main = main.union(extra)

    from ..ingest.canonicalize import dedup_edges

    return dedup_edges(main)


def _attach_by_key(
    requests: rd.Dataset,
    key_col: str,
    sketches: rd.Dataset,
    out_col: str,
    passthrough: list,
    *,
    id_col: str = "doc_id",
) -> rd.Dataset:
    """Distributed sort-merge join: append each request row's sketch
    payload (the ``feats`` binary of its ``key_col`` doc). One
    single-int64-column range sort co-locates each doc's sketch row
    with the requests that reference it; a vectorized per-block pass
    attaches payloads, and runs touching a block edge resolve in a
    small second pass (≤ 2 keys per block) — the same boundary trick
    as ``dedup_edges``. (Ray's hash ``Dataset.join`` breaks on empty
    partitions in 2.49 and Acero rejects list payloads, hence this
    sort formulation — which is also the multi-node-shuffle shape.)

    ``passthrough``: (name, pyarrow type) of request columns carried
    through. Requests whose key has no sketch row are dropped (inner
    join)."""

    def tag_req(batch: pa.Table) -> pa.Table:
        cols = {
            "k": batch.column(key_col),
            "is_sk": pa.array(np.zeros(batch.num_rows, np.int8)),
            "feats": pa.nulls(batch.num_rows, pa.binary()),
        }
        for c, _ in passthrough:
            cols[c] = batch.column(c)
        return pa.table(cols)

    def tag_sk(batch: pa.Table) -> pa.Table:
        cols = {
            "k": batch.column(id_col),
            "is_sk": pa.array(np.ones(batch.num_rows, np.int8)),
            "feats": batch.column("feats"),
        }
        for c, t in passthrough:
            cols[c] = pa.nulls(batch.num_rows, t)
        return pa.table(cols)

    u = requests.map_batches(tag_req, batch_format="pyarrow").union(
        sketches.select_columns([id_col, "feats"]).map_batches(tag_sk, batch_format="pyarrow")
    )
    srt = u.sort("k").materialize()

    def attach(tbl: pa.Table, interior_only: bool) -> pa.Table:
        schema = pa.schema(
            [(key_col, pa.int64())] + [(c, t) for c, t in passthrough] + [(out_col, pa.binary())]
        )
        k = batch_to_numpy(tbl, "k")
        if len(k) == 0:
            return schema.empty_table()
        is_sk = batch_to_numpy(tbl, "is_sk").astype(bool)
        edge = (
            (k == k[0]) | (k == k[-1])
            if interior_only
            else np.zeros(len(k), bool)
        )
        req = ~is_sk & ~edge
        sk_rows = np.flatnonzero(is_sk & ~edge)
        req_rows = np.flatnonzero(req)
        if len(sk_rows) == 0 or len(req_rows) == 0:
            return schema.empty_table()
        ks = k[sk_rows]
        pos = np.searchsorted(ks, k[req_rows])
        pos = np.clip(pos, 0, len(ks) - 1)
        hit = ks[pos] == k[req_rows]
        req_idx = req_rows[hit]
        take_sk = sk_rows[pos[hit]]
        cols = {key_col: pa.array(k[req_idx])}
        for c, _ in passthrough:
            cols[c] = tbl.column(c).take(pa.array(req_idx))
        cols[out_col] = tbl.column("feats").take(pa.array(take_sk))
        return pa.table(cols, schema=schema)

    main = srt.map_batches(
        lambda t: attach(t, True), batch_format="pyarrow", batch_size=None
    )

    from ..common import collect_boundary_runs

    btbl = collect_boundary_runs(srt, "k", where="_attach_by_key")
    if btbl is not None:
        extra = attach(btbl, False)
        if extra.num_rows:
            main = main.union(rd.from_arrow(extra))
    return main


def verify_pairs(
    pairs: rd.Dataset,
    sketches: rd.Dataset,
    *,
    threshold: float,
    id_col: str = "doc_id",
) -> rd.Dataset:
    """Exact (hashed-feature) Jaccard verification of candidate pairs,
    fully distributed: two sort-merge joins ship each side's feature
    sketch to the pair row, then a ``map_batches`` computes |∩| / |∪|
    on the sorted-unique uint64 arrays. Returns (a, b, jaccard ≥
    threshold)."""
    j = _attach_by_key(
        pairs, "src", sketches, "feats_a", [("dst", pa.int64())], id_col=id_col
    )
    j = _attach_by_key(
        j,
        "dst",
        sketches,
        "feats_b",
        [("src", pa.int64()), ("feats_a", pa.binary())],
        id_col=id_col,
    )

    def jac(batch: pa.Table):
        src = batch_to_numpy(batch, "src")
        dst = batch_to_numpy(batch, "dst")
        P = len(src)
        if P == 0:
            return {
                "a": np.empty(0, np.int64),
                "b": np.empty(0, np.int64),
                "jaccard": np.empty(0),
            }
        # one merged pass for ALL pairs in the block (no per-pair
        # Python): tag every feature with its pair index, lexsort
        # (pair, value) — both sides are sorted-unique per doc, so an
        # adjacent duplicate is exactly one cross-side match.
        va, la = _flat_u64_column(batch.column("feats_a"))
        vb, lb = _flat_u64_column(batch.column("feats_b"))
        pids = np.arange(P, dtype=np.int64)
        pid = np.concatenate([np.repeat(pids, la), np.repeat(pids, lb)])
        vals = np.concatenate([va, vb])
        order = np.lexsort((vals, pid))
        p_s = pid[order]
        v_s = vals[order]
        dup = (p_s[1:] == p_s[:-1]) & (v_s[1:] == v_s[:-1])
        inter = np.bincount(p_s[1:][dup], minlength=P)
        union = la + lb - inter
        out = np.where(union > 0, inter / np.maximum(union, 1), 1.0)
        keep = out >= threshold
        return {"a": src[keep], "b": dst[keep], "jaccard": out[keep]}

    return j.map_batches(jac, batch_format="pyarrow")


def minhash_lsh_dedup(
    docs: rd.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 128,
    bands: int = 32,
    shingle_k: int = 5,
    jaccard_threshold: float = 0.8,
    max_bucket: int = 256,
) -> rd.Dataset:
    """Near-dup clusters: (doc_id, cluster) for every doc, where
    cluster is the min doc_id of its verified near-duplicate group
    (exact hashed-shingle Jaccard ≥ τ), computed end-to-end
    distributed: sketch (actor pool) → LSH pairs (sort + run pairs)
    → join-verify (hash joins + map_batches) → connected components
    (the min-label WCC engine). Only cluster labels reach the driver."""
    sketches = minhash_sketches(
        docs,
        id_col=id_col,
        text_col=text_col,
        num_hashes=num_hashes,
        bands=bands,
        shingle_k=shingle_k,
    ).materialize()
    pairs = lsh_candidate_pairs(sketches, bands=bands, max_bucket=max_bucket)
    verified = verify_pairs(pairs, sketches, threshold=jaccard_threshold, id_col=id_col)
    edges = verified.map_batches(
        lambda b: {"src": batch_to_numpy(b, "a"), "dst": batch_to_numpy(b, "b")},
        batch_format="pyarrow",
    ).materialize()

    if edges.count() > 0:
        from ..algos.components import weakly_connected_components
        from ..graph import build_graph

        g = build_graph(edges)
        res = weakly_connected_components(g)
        labels_ref = ray.put((g.ids, res.state["label"]))
    else:
        labels_ref = ray.put((np.empty(0, np.int64), np.empty(0, np.int64)))

    def assign(batch: pa.Table):
        ids = batch_to_numpy(batch, id_col)
        gids, lab = ray.get(labels_ref)
        cluster = ids.copy()
        if len(gids):
            pos = np.searchsorted(gids, ids)
            pos = np.clip(pos, 0, len(gids) - 1)
            hit = gids[pos] == ids
            cluster[hit] = lab[pos[hit]]
        return {"doc_id": ids, "cluster": cluster}

    return docs.select_columns([id_col]).map_batches(assign, batch_format="pyarrow", batch_size=None)


# ------------------------------------------------------------- SimHash


class _SimHash:
    """64-bit simhash over distinct whitespace tokens — vectorized:
    hash all tokens of the batch at once, unpack to a (tokens, 64)
    bit matrix, and per-doc bit votes via ``add.reduceat``."""

    def __init__(self, id_col: str = "doc_id", text_col: str = "text"):
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, batch: pa.Table):
        ids = batch_to_numpy(batch, self.id_col)
        starts, tlens, per_doc, tdata = _token_matrix(batch.column(self.text_col))
        T = len(starts)
        if T and int(tlens.max()) > 256:
            # freak token width: padded-matrix dedup would balloon —
            # fall back to the per-row set() path for this batch
            return self._per_row(ids, batch.column(self.text_col).to_pylist())
        out = np.zeros(len(ids), np.int64)
        if T:
            # distinct FULL tokens per doc (one vote each, like the
            # per-row set(); prefix-colliding tokens still vote twice):
            # pad tokens into a (T, Wmax) byte matrix, dedup by
            # (doc, padded bytes) with one lexsort
            doc_of = np.repeat(np.arange(len(ids), dtype=np.int64), per_doc)
            Wmax = int(tlens.max())
            cols = np.arange(Wmax, dtype=np.int64)[None, :]
            valid = cols < tlens[:, None]
            P = np.where(
                valid, tdata[np.minimum(starts[:, None] + cols, max(len(tdata) - 1, 0))], 0
            ).astype(np.uint8)
            key = np.ascontiguousarray(P).view(f"S{Wmax}").ravel()
            order = np.lexsort((key, doc_of))
            kd, ks = doc_of[order], key[order]
            keep = np.empty(T, bool)
            keep[0] = True
            keep[1:] = (kd[1:] != kd[:-1]) | (ks[1:] != ks[:-1])
            rows = order[keep]
            h = _token_hashes_from_matrix(starts[rows], tlens[rows], tdata)
            dlens = np.bincount(kd[keep], minlength=len(ids)).astype(np.int64)
            dstarts = np.concatenate([[0], np.cumsum(dlens)])
            bits = np.unpackbits(h.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little")
            nonempty = dlens > 0
            # reduceat over nonempty docs' start offsets: empty docs have
            # zero width, so each segment ends exactly at its doc's end
            ones = np.zeros((len(ids), 64), np.int64)
            ones[nonempty] = np.add.reduceat(
                bits.astype(np.int64), dstarts[:-1][nonempty], axis=0
            )
            # votes = (+1 per set bit, -1 per clear bit) > 0  ⇔  2·ones > n
            pos = (2 * ones) > dlens[:, None]
            out = np.packbits(pos.astype(np.uint8), axis=1, bitorder="little").view(np.int64).ravel()
            out[~nonempty] = 0
        return {self.id_col: ids, "simhash": out}

    def _per_row(self, ids: np.ndarray, texts: list[str]):
        tok_lists = [sorted(set(t.lower().split())) for t in texts]
        lens = np.array([len(t) for t in tok_lists], np.int64)
        starts = np.concatenate([[0], np.cumsum(lens)])
        all_tokens = [tok for toks in tok_lists for tok in toks]
        out = np.zeros(len(ids), np.int64)
        if all_tokens:
            h = _token_hashes(all_tokens)
            bits = np.unpackbits(h.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little")
            nonempty = lens > 0
            ones = np.zeros((len(ids), 64), np.int64)
            ones[nonempty] = np.add.reduceat(
                bits.astype(np.int64), starts[:-1][nonempty], axis=0
            )
            pos = (2 * ones) > lens[:, None]
            out = np.packbits(pos.astype(np.uint8), axis=1, bitorder="little").view(np.int64).ravel()
            out[~nonempty] = 0
        return {self.id_col: ids, "simhash": out}


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
    num_hashes: int = 128,
    max_bucket: int = 256,
) -> rd.Dataset:
    """Exact word-n-gram Jaccard pairs ≥ threshold — the scalable
    LSH-prune + distributed-verify path (same machinery as
    :func:`minhash_lsh_dedup`, word-n-gram features). Band width is
    chosen so the LSH s-curve midpoint ``(1/b)^(1/r)`` sits below the
    requested threshold (high recall)."""
    rows = 4 if threshold >= 0.7 else (2 if threshold >= 0.4 else 1)
    bands = max(1, num_hashes // rows)
    sketches = minhash_sketches(
        docs,
        id_col=id_col,
        text_col=text_col,
        num_hashes=bands * rows,
        bands=bands,
        feature="word",
        ngram_n=n,
    ).materialize()
    pairs = lsh_candidate_pairs(sketches, bands=bands, max_bucket=max_bucket)
    return verify_pairs(pairs, sketches, threshold=threshold, id_col=id_col)


# ------------------------------------------------- embedding near-dup


def embedding_near_dup(
    emb: rd.Dataset,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    num_planes: int = 12,
    seed: int = 42,
    max_bucket: int = 4096,
):
    """Cosine ≥ τ near-duplicate pairs via random-hyperplane LSH:
    bucket = sign pattern of ``num_planes`` projections; exact cosine
    verified within each bucket (near-identical vectors share all
    signs with high probability). Buckets above ``max_bucket`` are
    truncated with a warning (at scale, raise ``num_planes`` so
    buckets stay small). Returns a Dataset of (a, b, cos) pairs —
    output size never lands on the driver (only the small boundary
    runs do, size-guarded)."""
    first = emb.take(1)[0]
    dim = len(first[vec_col])
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, num_planes))
    planes_ref = ray.put(planes)

    def bucketize(batch: pa.Table):
        ids = batch_to_numpy(batch, id_col)
        V = np.asarray(
            batch.column(vec_col).combine_chunks().flatten().to_numpy(), np.float64
        ).reshape(len(ids), -1)
        Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
        signs = (Vn @ ray.get(planes_ref)) > 0
        bucket = np.zeros(len(ids), np.int64)
        for p in range(num_planes):
            bucket = (bucket << 1) | signs[:, p]
        return {"bucket": bucket, "id": ids, "vec": [v.tobytes() for v in Vn]}

    srt = emb.map_batches(bucketize, batch_format="pyarrow").sort("bucket").materialize()
    return _bucketed_cosine_pairs(
        srt, threshold=threshold, max_bucket=max_bucket, where="embedding_near_dup"
    )


def _bucketed_cosine_pairs(
    srt: rd.Dataset, *, threshold: float, max_bucket: int, where: str
) -> rd.Dataset:
    """Exact cosine ≥ τ pairs within equal-``bucket`` runs of a
    (bucket, id, vec)-sorted materialized Dataset — the shared verify
    stage of :func:`embedding_near_dup` (LSH sign buckets) and
    :func:`semantic_dedup` (k-means clusters): block-local run pairs +
    the bounded boundary pass, oversize runs truncated loudly."""

    def _verify(bucket, ids, vec_mat):
        """All pairs ≥ τ within equal-bucket runs of sorted rows —
        vectorized across every run at once (a vector has exactly one
        bucket, so each pair occurs exactly once; no dedup needed).
        Runs above max_bucket truncate with a warning."""
        if len(bucket) < 2:
            return None
        starts = np.flatnonzero(np.concatenate([[True], bucket[1:] != bucket[:-1]]))
        lengths = np.diff(np.concatenate([starts, [len(bucket)]]))
        within = np.arange(len(bucket)) - np.repeat(starts, lengths)
        keep = within < max_bucket
        if not keep.all():
            n_trunc = int((lengths > max_bucket).sum())
            logger.warning(
                "%s: %d buckets truncated to %d", where, n_trunc, max_bucket
            )
            from ..common import record_skew_event

            record_skew_event(where, "bucket_truncation", n_trunc)
        from ..algos.triangles import _pairs_multirun

        bk = bucket[keep]
        li, ri = _pairs_multirun(bk)
        if len(li) == 0:
            return None
        kept_rows = np.flatnonzero(keep)
        V = vec_mat[kept_rows]
        sims = np.einsum("ij,ij->i", V[li], V[ri])
        m = sims >= threshold
        ids_k = ids[kept_rows]
        a = np.minimum(ids_k[li[m]], ids_k[ri[m]])
        b = np.maximum(ids_k[li[m]], ids_k[ri[m]])
        return {"a": a, "b": b, "cos": sims[m]}

    def interior(tbl: pa.Table):
        empty = {"a": np.empty(0, np.int64), "b": np.empty(0, np.int64), "cos": np.empty(0)}
        bucket = batch_to_numpy(tbl, "bucket")
        if len(bucket) == 0:
            return empty
        inner = (bucket != bucket[0]) & (bucket != bucket[-1])
        out = _verify(
            bucket[inner],
            batch_to_numpy(tbl, "id")[inner],
            binary_matrix(tbl.column("vec"))[inner],
        )
        return out if out is not None else empty

    from ..common import collect_boundary_runs

    main = srt.map_batches(interior, batch_format="pyarrow", batch_size=None)
    btbl = collect_boundary_runs(srt, "bucket", where=where)
    if btbl is not None:
        out = _verify(
            batch_to_numpy(btbl, "bucket"),
            batch_to_numpy(btbl, "id"),
            binary_matrix(btbl.column("vec")),
        )
        if out is not None and len(out["a"]):
            main = main.union(
                rd.from_arrow(pa.table({k: pa.array(v) for k, v in out.items()}))
            )
    return main


def semantic_dedup(
    emb: rd.Dataset,
    *,
    k: int = 8,
    iters: int = 1,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1 << 16,
    max_cluster: int = 100_000,
) -> rd.Dataset:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): cluster the
    embedding space, call two documents semantic duplicates when their
    exact cosine within a shared cluster reaches ``threshold``, and
    keep ONE representative (the min id) per duplicate component.

    Ray plan — every stage an existing scale-shaped primitive:
    (1) the integer-exact k-means codebook
    (:func:`~llama_ray.data_ops.ann.kmeans_quantized_centroids`, so
    assignment is layout-independent and SQL-replayable); (2) ONE
    range sort by cluster + the shared block-local/boundary cosine
    verify (:func:`_bucketed_cosine_pairs` — oversize clusters degrade
    loudly into `skew_events`; at scale pick ``k ≈ n / desired
    cluster size`` exactly as SemDeDup does); (3) distributed
    min-label WCC over the near-dup pair graph; (4) a broadcast
    rep-lookup joined back per batch — O(paired vertices), bounded by
    the duplicate mass; on a corpus where most documents have a
    near-dup, swap stage 4 for a sort-merge join on vec_id (the
    lm_score shape) instead of the broadcast. Returns
    ``(vec_id, cluster_id, rep_id, keep)`` for every input vector —
    ``keep`` marks the retained corpus."""
    from ..graph import build_graph
    from .ann import _as_matrix, kmeans_quantized_centroids

    emb2, seed_ids, C = kmeans_quantized_centroids(
        emb, k=k, iters=iters, id_col=id_col, vec_col=vec_col, scale=scale
    )
    c_ref = ray.put((seed_ids, C))

    def assign_bucketize(batch: pa.Table):
        n = batch.num_rows
        ids = batch_to_numpy(batch, id_col).astype(np.int64)
        if n == 0:
            return {"bucket": ids, "id": ids, "vec": []}
        sids, cm = ray.get(c_ref)
        V = _as_matrix(batch, vec_col, n)
        qv = np.floor(V * scale + 0.5).astype(np.int64)
        cluster = sids[np.argmax(qv @ cm.T, axis=1)]
        Vn = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-30)
        return {"bucket": cluster, "id": ids, "vec": [v.tobytes() for v in Vn]}

    srt = (
        emb2.map_batches(assign_bucketize, batch_format="pyarrow")
        .sort("bucket")
        .materialize()
    )
    pairs = _bucketed_cosine_pairs(
        srt, threshold=threshold, max_bucket=max_cluster, where="semantic_dedup"
    )

    pair_edges = pairs.map_batches(
        lambda b: {"src": batch_to_numpy(b, "a"), "dst": batch_to_numpy(b, "b")},
        batch_format="pyarrow",
    )
    pair_edges = pair_edges.materialize()
    if pair_edges.count():
        from ..algos.components import weakly_connected_components

        pg = build_graph(pair_edges)
        wcc = weakly_connected_components(pg)
        rep_ids_ref = ray.put((pg.ids, wcc.state["label"]))
    else:
        rep_ids_ref = ray.put((np.empty(0, np.int64), np.empty(0, np.int64)))

    def finalize(batch: pa.Table):
        ids = batch_to_numpy(batch, "id").astype(np.int64)
        cluster = batch_to_numpy(batch, "bucket")
        paired_ids, labels = ray.get(rep_ids_ref)
        rep = ids.copy()
        if len(paired_ids):
            pos = np.searchsorted(paired_ids, ids)
            pos_c = np.minimum(pos, len(paired_ids) - 1)
            hit = paired_ids[pos_c] == ids
            rep[hit] = labels[pos_c[hit]]
        return {
            "vec_id": ids,
            "cluster_id": cluster,
            "rep_id": rep,
            "keep": ids == rep,
        }

    return srt.map_batches(finalize, batch_format="pyarrow")


def dedup_survivors(
    docs: rd.Dataset, *, id_col: str = "doc_id", text_col: str = "text"
) -> rd.Dataset:
    """Exact dedup as a FILTER: the surviving rows themselves (min id
    per distinct content), full row carried — the stage a curation
    pipeline actually feeds downstream, where :func:`exact_dedup` is
    the report.

    One range sort of the full rows by content hash (text rides the
    shuffle — that IS the cost of content dedup; the hash is computed
    once per row, not once per comparison); per sorted block the
    min-id row of every interior run survives locally, and each block
    ships ≤2 edge-run min-id candidate rows to an O(blocks) driver
    pick. Hash collisions across distinct texts are broken by exact
    text equality inside the run (64-bit xxhash over 100 TB WILL see
    birthday collisions; a collision without the tie-break would drop
    a distinct document silently)."""
    from ..common import per_block_results

    def hash_col(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column("__h", pa.array([], pa.int64()))
        return batch.append_column(
            "__h", pa.array(content_hash_column(batch.column(text_col)))
        )

    srt = docs.map_batches(hash_col, batch_format="pyarrow").sort("__h").materialize()

    def _survivor_mask(tbl: pa.Table, sel: np.ndarray) -> np.ndarray:
        """Row indices (into tbl) of min-id rows per (hash, text) group
        among the selected row indices."""
        ids = tbl.column(id_col).combine_chunks().to_numpy(zero_copy_only=False)[sel]
        txt = tbl.column(text_col).combine_chunks().take(pa.array(sel))
        import pyarrow.compute as pc

        # group by exact text within the hash run (collision tie-break):
        # dictionary-encode then lexsort (code, id)
        enc = pc.dictionary_encode(txt)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = enc.indices.to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, codes))
        first = np.ones(len(order), bool)
        first[1:] = codes[order][1:] != codes[order][:-1]
        return sel[order[first]]

    def interior(tbl: pa.Table) -> pa.Table:
        base = tbl.drop_columns(["__h"])
        if tbl.num_rows == 0:
            return base
        h = tbl.column("__h").combine_chunks().to_numpy(zero_copy_only=False)
        inner = (h != h[0]) & (h != h[-1])
        if not inner.any():
            return base.slice(0, 0)
        m = len(h)
        new = np.ones(m, bool)
        new[1:] = h[1:] != h[:-1]
        run_starts = np.flatnonzero(new)
        keep_run = inner[run_starts]
        starts = run_starts[keep_run]
        lens = np.diff(np.append(run_starts, m))[keep_run]
        # expand per-run selections; most runs are singletons — handle
        # them in one vectorized take, longer runs via the mask helper
        single = lens == 1
        keep_idx = [starts[single]]
        for st, ln in zip(starts[~single], lens[~single]):
            sel = np.arange(st, st + ln)
            keep_idx.append(_survivor_mask(tbl, sel))
        idx = np.sort(np.concatenate(keep_idx))
        return base.take(pa.array(idx))

    main = srt.map_batches(interior, batch_format="pyarrow", batch_size=None)

    def edge_rows(tbl: pa.Table):
        if tbl.num_rows == 0:
            return None
        h = tbl.column("__h").combine_chunks().to_numpy(zero_copy_only=False)
        edge = (h == h[0]) | (h == h[-1])
        sel = np.flatnonzero(edge)
        idx = _survivor_mask(tbl, sel)  # per-text min-id candidates
        return tbl.take(pa.array(np.sort(idx)))

    parts = [
        t for t in per_block_results(srt, edge_rows) if t is not None and t.num_rows
    ]
    if parts:
        cand = pa.concat_tables(parts)
        # global pick: min id per (hash, text) across block candidates
        h = cand.column("__h").combine_chunks().to_numpy(zero_copy_only=False)
        ids = cand.column(id_col).combine_chunks().to_numpy(zero_copy_only=False)
        import pyarrow.compute as pc

        enc = pc.dictionary_encode(cand.column(text_col).combine_chunks())
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = enc.indices.to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, codes, h))
        first = np.ones(len(order), bool)
        first[1:] = (h[order][1:] != h[order][:-1]) | (
            codes[order][1:] != codes[order][:-1]
        )
        picked = cand.take(pa.array(order[first])).drop_columns(["__h"])
        main = main.union(rd.from_arrow(picked))
    return main
