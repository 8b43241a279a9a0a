"""Text-analysis stages for training-data pipelines.

All actor-pool ``map_batches`` stages: models/regexes/tables built
once per actor in ``__init__``, vectorized-ish per batch.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd


# character-trigram profiles per language (tiny heuristic n-gram
# language ID — built from common function words; deterministic)
_LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "with", "for"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit"],
    "es": ["el", "la", "de", "que", "los", "una", "por", "con"],
    "fr": ["le", "la", "les", "des", "une", "est", "dans", "pour"],
    "zh": [],  # CJK detected by codepoint range
}


class LanguageId:
    """Heuristic language ID: CJK codepoint ratio → zh; else argmax of
    per-language stopword hit-rate; 'unknown' when nothing matches.

    Fully vectorized (one Arrow RE2 kernel per language per batch, the
    QualityScore pattern): the head is lowercased and every non-letter
    run collapsed to a DOUBLE space, so ``" (m1|m2|…) "`` counts exact
    token membership — the two spaces between tokens stop adjacent
    matches from consuming each other's boundary."""

    _LETTER = "a-zäöüßéèêàùâçñ"

    def __init__(self):
        self.langs = [k for k, v in _LANG_MARKERS.items() if v]
        self.pats = {
            k: " (" + "|".join(_LANG_MARKERS[k]) + ") " for k in self.langs
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        col = batch.column("text")
        head400 = pc.utf8_slice_codeunits(col, 0, 400)
        n400 = pc.utf8_length(head400).cast(pa.float64()).to_numpy(zero_copy_only=False)
        cjk = (
            pc.count_substring_regex(head400, r"[\x{4e00}-\x{9fff}]")
            .cast(pa.float64())
            .to_numpy(zero_copy_only=False)
        )
        lower = pc.utf8_lower(pc.utf8_slice_codeunits(col, 0, 2000))
        norm = pc.replace_substring_regex(lower, f"[^{self._LETTER}]+", "  ")
        norm = pc.binary_join_element_wise(" ", norm, " ", "")
        n_toks = (
            pc.count_substring_regex(norm, f"[{self._LETTER}]+")
            .cast(pa.float64())
            .to_numpy(zero_copy_only=False)
        )
        safe = np.maximum(n_toks, 1.0)
        scores = np.stack(
            [
                pc.count_substring_regex(norm, self.pats[k])
                .cast(pa.float64())
                .to_numpy(zero_copy_only=False)
                / safe
                for k in self.langs
            ]
        )
        best = np.argmax(scores, axis=0)  # first lang wins ties (dict order)
        preds = np.array(self.langs, object)[best]
        preds[scores.max(axis=0) <= 0] = "unknown"
        preds[n_toks == 0] = "unknown"
        preds[cjk > n400 * 0.2] = "zh"  # CJK override, empty text stays unknown
        return batch.append_column("lang_pred", pa.array(preds, pa.string()))


def language_id(docs: rd.Dataset, *, concurrency=(2, 8)) -> rd.Dataset:
    return docs.map_batches(LanguageId, batch_format="pyarrow", concurrency=concurrency)


class QualityScore:
    """Length / punctuation / stopword-ratio quality features + a
    composite score in [0, 1] (C4/Gopher-style cheap filters).

    Fully vectorized: every feature is an Arrow RE2
    ``count_substring_regex`` kernel over the whole batch — no
    per-character Python (the round-1 version iterated every char of
    every doc in Python)."""

    _WORD = r"[\p{L}\p{N}_]+"
    _WORD_CHAR = r"[\p{L}\p{N}_]"
    _PUNCT = r"[^\p{L}\p{N}_\s]"
    _STOP = r"\b(" + "|".join(_LANG_MARKERS["en"]) + r")\b"

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        col = batch.column("text")
        length = pc.utf8_length(col).cast(pa.float64()).to_numpy(zero_copy_only=False)
        safe_len = np.maximum(length, 1.0)
        n_punct = pc.count_substring_regex(col, self._PUNCT).cast(pa.float64()).to_numpy(zero_copy_only=False)
        lower = pc.utf8_lower(col)
        n_words = pc.count_substring_regex(lower, self._WORD).cast(pa.float64()).to_numpy(zero_copy_only=False)
        n_word_chars = pc.count_substring_regex(lower, self._WORD_CHAR).cast(pa.float64()).to_numpy(zero_copy_only=False)
        n_stop = pc.count_substring_regex(lower, self._STOP).cast(pa.float64()).to_numpy(zero_copy_only=False)
        safe_words = np.maximum(n_words, 1.0)
        punct_ratio = n_punct / safe_len
        stop_ratio = n_stop / safe_words
        mean_word_len = np.where(n_words > 0, n_word_chars / safe_words, 0.0)
        score = (
            np.clip(length / 500.0, 0, 1) * 0.3
            + np.clip(1 - punct_ratio * 4, 0, 1) * 0.3
            + np.clip(stop_ratio * 5, 0, 1) * 0.2
            + np.clip(1 - np.abs(mean_word_len - 5) / 5, 0, 1) * 0.2
        )
        out = batch
        for name, arr in [
            ("q_length", length),
            ("q_punct_ratio", punct_ratio),
            ("q_stop_ratio", stop_ratio),
            ("q_mean_word_len", mean_word_len),
            ("quality", score),
        ]:
            out = out.append_column(name, pa.array(arr, pa.float64()))
        return out


def quality_score(docs: rd.Dataset, *, concurrency=(2, 8)) -> rd.Dataset:
    return docs.map_batches(QualityScore, batch_format="pyarrow", concurrency=concurrency)


class TokenCounts:
    """Whitespace tokens + a BPE-ish sub-token estimate (regex split
    on word/number/punct boundaries, ~GPT-2 pre-tokenizer shape).
    Both counts are single Arrow RE2 kernels over the whole batch —
    no per-row Python (and RE2 semantics match the DuckDB oracles
    exactly, where Python's ``str.split`` unicode set did not)."""

    _WS = r"\S+"
    _BPE = r"[\p{L}\p{N}_]+|[^\p{L}\p{N}_\s]"

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        col = batch.column("text")
        ws = pc.count_substring_regex(col, self._WS).cast(pa.int64())
        bpe = pc.count_substring_regex(col, self._BPE).cast(pa.int64())
        return batch.append_column("n_tokens_ws", ws).append_column("n_tokens_bpe", bpe)


def token_counts(docs: rd.Dataset, *, concurrency=(2, 8)) -> rd.Dataset:
    return docs.map_batches(TokenCounts, batch_format="pyarrow", concurrency=concurrency)


class Fingerprint:
    """Rolling-hash document fingerprint: winnowed min-hash of k-char
    rolling windows (content-defined sampling → robust to small
    edits). Window hashing is one vectorized polynomial roll over a
    byte stride view per doc (same kernel family as the dedup
    shingles) — no per-window Python."""

    def __init__(self, k: int = 16, keep: int = 8):
        self.k = k
        self.keep = keep

    def fingerprint(self, text: str) -> str:
        from .dedup import _FNV, _GOLD, _mix64

        t = " ".join(text.split())
        b = np.frombuffer(t.encode("utf-8"), np.uint8)
        if len(b) <= self.k:
            # short doc: one (possibly empty) window — same hash family
            # as the main path, so the DuckDB oracle is one code path
            w = b[None, :]
        else:
            w = np.lib.stride_tricks.sliding_window_view(b, self.k)
        h = np.zeros(len(w), np.uint64)
        for i in range(w.shape[1]):
            h = h * _FNV + w[:, i]
        h = _mix64(h)
        keep = np.partition(h, self.keep - 1)[: self.keep] if len(h) > self.keep else h
        acc = np.zeros(1, np.uint64)  # 1-elt array: scalar uint64 ops warn on wrap
        for v in np.sort(keep):
            acc = acc * _GOLD + v
        return format(int(acc[0]), "016x")

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..common import copied_strings
        from .dedup import _FNV, _GOLD, _mix64, _rolled_windows, _string_segments

        norm = pc.utf8_trim(
            pc.replace_substring_regex(copied_strings(batch.column("text")), r"\s+", " "),
            " ",
        )
        data, offs = _string_segments(norm)
        h, counts = _rolled_windows(data, offs, self.k, _FNV)
        hm = _mix64(h)
        bounds = np.concatenate([[0], np.cumsum(counts)])
        empty_h = _mix64(np.zeros(1, np.uint64))  # per-row path's zero-width window
        fps = []
        for d in range(len(counts)):
            hh = hm[bounds[d] : bounds[d + 1]]
            if len(hh) == 0:
                hh = empty_h
            keep = np.partition(hh, self.keep - 1)[: self.keep] if len(hh) > self.keep else hh
            acc = np.zeros(1, np.uint64)  # 1-elt array: scalar uint64 ops warn on wrap
            for v in np.sort(keep):
                acc = acc * _GOLD + v
            fps.append(format(int(acc[0]), "016x"))
        return batch.append_column("fingerprint", pa.array(fps, pa.string()))


def fingerprint(docs: rd.Dataset, *, concurrency=(2, 8)) -> rd.Dataset:
    return docs.map_batches(Fingerprint, batch_format="pyarrow", concurrency=concurrency)


def _tokenize_batch(col, *, lower: bool):
    """(token byte starts, lengths, per-doc counts, utf8 buffer) of a
    string column via the byte-scan tokenizer — ``str.split``
    semantics, no Arrow split kernel (see dedup._ws_token_spans)."""
    from ..common import copied_strings
    from .dedup import _string_segments, _ws_token_spans

    arr = copied_strings(col)
    if lower:
        arr = pc.utf8_lower(arr)
    data, offs = _string_segments(arr)
    starts, lens, per_doc = _ws_token_spans(data, offs)
    return starts, lens, per_doc, data


def vocab_topk(docs: rd.Dataset, *, k: int = 100) -> rd.Dataset:
    """Top-k corpus vocabulary by exact whitespace-token frequency —
    the classic wide aggregation of a training-data pipeline.

    A per-batch byte-scan + value_counts emits (token, cnt) partials;
    the per-token merge is ONE range sort + run reduceat
    (``group_sum_sorted`` — measured ~200× faster than Ray's generic
    groupby on million-row key tables); the partial top-k
    merge keeps only k rows on the driver path. Ordering is (cnt desc,
    token asc) — integer-exact."""
    import pyarrow.compute as pc

    def partial(batch: pa.Table) -> pa.Table:
        from .dedup import _tokens_string_array

        starts, lens, _, data = _tokenize_batch(batch.column("text"), lower=False)
        vc = pc.value_counts(_tokens_string_array(starts, lens, data))
        return pa.table(
            {
                "token": vc.field("values"),
                "cnt": vc.field("counts").cast(pa.int64()),
            }
        )

    from ..common import distributed_topk, group_sum_sorted

    merged = group_sum_sorted(
        docs.select_columns(["text"]).map_batches(partial, batch_format="pyarrow"),
        "token",
        ["cnt"],
    )

    return distributed_topk(
        merged,
        [("cnt", "descending"), ("token", "ascending")],
        k,
    )


def _string_byte_matrix(col, max_len: int) -> tuple[np.ndarray, np.ndarray]:
    """(uint8 matrix padded with 0, per-row byte lengths) of an ASCII
    string array — one buffer view + one scatter, no per-row Python.
    Raises on non-ASCII (the edit-distance contract: byte positions =
    character positions)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.zeros((0, max_len), np.uint8), np.zeros(0, np.int64)
    arr = col.cast(pa.large_string())
    offs = np.frombuffer(arr.buffers()[1], np.int64, n + 1, arr.offset * 8)
    data = np.frombuffer(arr.buffers()[2], np.uint8)
    w = np.diff(offs)
    if int(w.sum()) and data[offs[0] : offs[-1]].max() >= 128:
        raise ValueError("_string_byte_matrix: non-ASCII token")
    if w.max(initial=0) > max_len:
        raise ValueError("_string_byte_matrix: token longer than max_len")
    M = np.zeros((n, max_len), np.uint8)
    total = int(w.sum())
    rows = np.repeat(np.arange(n, dtype=np.int64), w)
    cols = np.arange(total, dtype=np.int64) - np.repeat(np.cumsum(w) - w, w)
    src = np.repeat(offs[:-1], w) + cols
    M[rows, cols] = data[src]
    return M, w.astype(np.int64)


def _levenshtein_vec(
    A: np.ndarray, wa: np.ndarray, B: np.ndarray, wb: np.ndarray, max_len: int
) -> np.ndarray:
    """Exact Levenshtein distance of n string pairs given as padded
    byte matrices — the classic two-row DP run simultaneously for ALL
    pairs (O(max_len²) numpy vector ops per batch, no per-pair
    Python)."""
    n = len(wa)
    dist = wb.astype(np.int32).copy()  # rows with wa == 0
    prev = np.tile(np.arange(max_len + 1, dtype=np.int32), (n, 1))
    for i in range(1, max_len + 1):
        cur = np.empty_like(prev)
        cur[:, 0] = i
        ai = A[:, i - 1][:, None]
        cost = (ai != B[:, :max_len]).astype(np.int32)
        for j in range(1, max_len + 1):
            cur[:, j] = np.minimum(
                np.minimum(prev[:, j] + 1, cur[:, j - 1] + 1),
                prev[:, j - 1] + cost[:, j - 1],
            )
        done = wa == i
        if done.any():
            dist[done] = cur[done, wb[done]]
        prev = cur
    return dist


def edit_distance_pairs(
    docs: rd.Dataset,
    *,
    text_col: str = "text",
    min_len: int = 2,
    max_len: int = 20,
    max_distance: int = 2,
) -> rd.Dataset:
    """String-similarity self-join over the corpus vocabulary: every
    pair of distinct (lowercased, whitespace) tokens within Levenshtein
    distance ``max_distance`` (1 or 2) — the SymSpell
    deletion-neighborhood join (Garbe 2012) used for typo/variant
    mining in data cleaning.

    Plan: distinct tokens via per-batch ``value_counts`` partials +
    the sorted run-reduce merge; each token emits its own string plus
    every ≤``max_distance``-deletion variant (one vectorized
    byte-matrix slice per deletion position — numpy passes only, no
    per-token Python); ONE range sort by (variant, token) co-locates
    candidates, complete runs expand to ordered pairs block-locally
    (position-within-run arithmetic), the ≤2 boundary runs per block
    resolve in a driver pass; pairs dedup by the sorted run-reduce and
    a final vectorized DP verifier keeps pairs with true distance in
    [1, max_distance] (the deletion neighborhood over-generates — e.g.
    shared deletions at different positions).

    Non-ASCII tokens are dropped at the distinct-vocab stage (the
    byte = char deletion neighborhood cannot pair them); only ASCII
    vocabulary participates in the join."""
    import pyarrow.compute as pc

    from ..common import check_boundary_size, group_sum_sorted, per_block_results

    def distinct_part(batch: pa.Table) -> pa.Table:
        from .dedup import _tokens_string_array

        starts, lens, _, data = _tokenize_batch(batch.column(text_col), lower=True)
        vc = pc.value_counts(_tokens_string_array(starts, lens, data))
        toks = vc.field("values")
        ln = pc.utf8_length(toks)
        keep = pc.and_(pc.greater_equal(ln, min_len), pc.less_equal(ln, max_len))
        # non-ASCII tokens can never pair under the byte=char contract
        # (the deletion neighborhood operates on bytes) — drop them here
        # instead of failing the whole run in _string_byte_matrix
        keep = pc.and_(keep, pc.equal(ln, pc.binary_length(toks)))
        toks = toks.filter(keep)
        return pa.table(
            {"token": toks, "cnt": pa.array(np.ones(len(toks), np.int64))}
        )

    vocab = group_sum_sorted(
        docs.select_columns([text_col]).map_batches(distinct_part, batch_format="pyarrow"),
        "token",
        ["cnt"],
    ).select_columns(["token"])

    if max_distance not in (1, 2):
        raise ValueError("edit_distance_pairs: max_distance must be 1 or 2")

    def variants(b: pa.Table) -> pa.Table:
        toks = b.column("token").combine_chunks()
        n = len(toks)
        if n == 0:
            return pa.table({"v": pa.array([], pa.string()), "token": toks})
        M, w = _string_byte_matrix(toks, max_len)
        pieces = [(M, w, np.arange(n, dtype=np.int64))]
        frontier = pieces[:]
        for _d in range(max_distance):
            nxt = []
            for Mx, wx, ix in frontier:
                for p in range(Mx.shape[1]):
                    sel = wx > p
                    if not sel.any():
                        continue
                    Mp = np.concatenate([Mx[sel, :p], Mx[sel, p + 1 :]], axis=1)
                    nxt.append((Mp, wx[sel] - 1, ix[sel]))
            pieces += nxt
            frontier = nxt
        # pad every piece to max_len, dedupe (token, variant) rows —
        # equal chars make many deletion orders collide
        R = sum(len(px[1]) for px in pieces)
        V = np.zeros((R, max_len), np.uint8)
        wv = np.empty(R, np.int64)
        iv = np.empty(R, np.int64)
        at = 0
        for Mx, wx, ix in pieces:
            r = len(wx)
            V[at : at + r, : Mx.shape[1]] = Mx
            wv[at : at + r] = wx
            iv[at : at + r] = ix
            at += r
        key = np.concatenate(
            [iv.astype("<i8").view(np.uint8).reshape(R, 8), V], axis=1
        )
        _u, first = np.unique(
            np.ascontiguousarray(key).view([("k", f"V{key.shape[1]}")]).ravel(),
            return_index=True,
        )
        V, wv, iv = V[first], wv[first], iv[first]
        mask = np.arange(max_len)[None, :] < wv[:, None]
        flat = V[mask]
        cum = np.concatenate([[0], np.cumsum(wv)]).astype(np.int32)
        varr = pa.Array.from_buffers(
            pa.string(),
            len(wv),
            [None, pa.py_buffer(cum.tobytes()), pa.py_buffer(flat.tobytes())],
        )
        return pa.table({"v": varr, "token": toks.take(pa.array(iv))})

    srt = (
        vocab.map_batches(variants, batch_format="pyarrow")
        .sort(["v", "token"])
        .materialize()
    )

    def run_pairs(tbl: pa.Table) -> pa.Table:
        """Ordered candidate pairs of complete (and given) v-runs:
        each row pairs with every earlier row of its run."""
        empty = pa.table(
            {"tok_a": pa.array([], pa.string()), "tok_b": pa.array([], pa.string())}
        )
        m = tbl.num_rows
        if m == 0:
            return empty
        v = tbl.column("v").combine_chunks()
        t = tbl.column("token").combine_chunks()
        new = np.ones(m, bool)
        neq = pc.not_equal(v.slice(1), v.slice(0, m - 1))
        new[1:] = neq.to_numpy(zero_copy_only=False)
        run_start = np.repeat(
            np.flatnonzero(new), np.diff(np.append(np.flatnonzero(new), m))
        )
        q = np.arange(m, dtype=np.int64) - run_start
        total = int(q.sum())
        if total == 0:
            return empty
        if total > 50_000_000:
            # a variant shared by r tokens expands to r·(r−1)/2 pairs;
            # a stop-variant (very short strings) can dominate. Loud >
            # silent: the fix is raising min_len or df-windowing the
            # variant table (see curation.source_overlap's max_df).
            raise RuntimeError(
                f"edit_distance_pairs: {total} candidate pairs in one "
                "block — a hot variant dominates; raise min_len or "
                "pre-window the variant table"
            )
        base = np.cumsum(q) - q
        pos = np.arange(total, dtype=np.int64) - np.repeat(base, q)
        partner = np.repeat(run_start, q) + pos
        selfi = np.repeat(np.arange(m, dtype=np.int64), q)
        a = t.take(pa.array(partner))
        bb = t.take(pa.array(selfi))
        keep = pc.not_equal(a, bb)
        return pa.table({"tok_a": a.filter(keep), "tok_b": bb.filter(keep)})

    def interior(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return run_pairs(tbl.slice(0, 0))
        v = tbl.column("v").combine_chunks()
        first, last = v[0], v[len(v) - 1]
        inner = pc.and_(pc.not_equal(v, first), pc.not_equal(v, last))
        return run_pairs(tbl.filter(inner))

    main = srt.map_batches(interior, batch_format="pyarrow", batch_size=None)

    def edge_runs(tbl: pa.Table):
        if tbl.num_rows == 0 or "v" not in tbl.schema.names:
            return None
        v = tbl.column("v").combine_chunks()
        m = tbl.filter(
            pc.or_(pc.equal(v, v[0]), pc.equal(v, v[len(v) - 1]))
        )
        return m if m.num_rows else None

    parts = [t for t in per_block_results(srt, edge_runs) if t is not None]
    if parts:
        edge = pa.concat_tables(parts)
        check_boundary_size(edge.num_rows, "edit_distance_pairs")
        ep = run_pairs(edge)
        if ep.num_rows:
            main = main.union(rd.from_arrow(ep))

    # global pair dedup: sorted run-reduce over a composed key
    def key_part(b: pa.Table) -> pa.Table:
        k = pc.binary_join_element_wise(b.column("tok_a"), b.column("tok_b"), "\x00")
        return pa.table({"k": k, "cnt": pa.array(np.ones(b.num_rows, np.int64))})

    distinct = group_sum_sorted(
        main.map_batches(key_part, batch_format="pyarrow"), "k", ["cnt"]
    )

    def verify(b: pa.Table) -> pa.Table:
        empty = pa.table(
            {"tok_a": pa.array([], pa.string()), "tok_b": pa.array([], pa.string())}
        )
        if b.num_rows == 0:
            return empty
        parts_ = pc.split_pattern(b.column("k"), "\x00")
        a = pc.list_element(parts_, 0).combine_chunks()
        c = pc.list_element(parts_, 1).combine_chunks()
        A, wa = _string_byte_matrix(a, max_len)
        B, wb = _string_byte_matrix(c, max_len)
        d = _levenshtein_vec(A, wa.astype(np.int32), B, wb.astype(np.int32), max_len)
        keep = pa.array((d >= 1) & (d <= max_distance))
        return pa.table({"tok_a": a.filter(keep), "tok_b": c.filter(keep)})

    return distinct.map_batches(verify, batch_format="pyarrow")


def exact_quantiles(ds: rd.Dataset, col: str, qs: list[float]) -> pa.Table:
    """Exact discrete quantiles of an integer column via the histogram
    method: per-batch value_counts → one ``groupby(value).sum``
    shuffle → a cumulative scan over the (small) distinct-value table.
    No global sort — the shuffle moves one row per distinct value, so
    this works at any row count whose value cardinality is bounded
    (lengths, counts, scores). Semantics match SQL ``quantile_disc``:
    the value at 1-based position ``ceil(q·n)`` of the sorted column."""
    import pyarrow.compute as pc

    def partial(batch: pa.Table) -> pa.Table:
        vc = pc.value_counts(batch.column(col).combine_chunks())
        return pa.table(
            {"v": vc.field("values").cast(pa.int64()), "cnt": vc.field("counts").cast(pa.int64())}
        )

    hist = (
        ds.select_columns([col])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("v")
        .sum("cnt")
        .to_pandas()  # one row per distinct value
        .sort_values("v")
        .reset_index(drop=True)
    )
    v = hist["v"].to_numpy()
    cc = hist["sum(cnt)"].to_numpy().cumsum()
    n = int(cc[-1]) if len(cc) else 0
    out_q, out_v = [], []
    for q in qs:
        pos = max(1, int(np.ceil(q * n)))
        out_q.append(q)
        out_v.append(int(v[np.searchsorted(cc, pos)]) if n else 0)
    return pa.table(
        {"q": pa.array(out_q, pa.float64()), "value": pa.array(out_v, pa.int64())}
    )


def _check_qs(qs: list[float]) -> None:
    """Quantile fractions must lie in [0, 1] — an out-of-range q would
    otherwise surface as an opaque IndexError deep in the targeted
    block fetch."""
    for q in qs:
        if not 0.0 <= q <= 1.0:
            raise ValueError(f"quantile fraction must be in [0, 1], got {q}")


def exact_quantiles_sorted(ds: rd.Dataset, col: str, qs: list[float]) -> pa.Table:
    """Exact discrete quantiles of ANY orderable column — including
    unbounded-cardinality floats the histogram method can't handle —
    via one distributed range sort plus an order-statistic lookup:
    per-block row counts locate the 1-based ``ceil(q·n)``-th element
    (``quantile_disc`` semantics) and only the few target blocks are
    ever fetched; the column never reaches the driver."""
    _check_qs(qs)

    import ray

    from ..common import per_block_results

    srt = ds.select_columns([col]).sort(col).materialize()
    counts = np.array(per_block_results(srt, lambda t: t.num_rows), np.int64)
    refs = srt.to_arrow_refs()
    cum = np.cumsum(counts)
    n = int(cum[-1]) if len(cum) else 0
    out_v = []
    cache: dict[int, pa.Table] = {}
    for q in qs:
        if n == 0:
            out_v.append(float("nan"))
            continue
        pos = max(1, int(np.ceil(q * n)))
        b = int(np.searchsorted(cum, pos))
        if b not in cache:
            cache[b] = ray.get(refs[b])
        within = pos - (int(cum[b - 1]) if b else 0) - 1
        out_v.append(cache[b].column(col)[within].as_py())
    return pa.table(
        {"q": pa.array(qs, pa.float64()), "value": pa.array(out_v, pa.float64())}
    )


def exact_quantiles_cont(ds: rd.Dataset, col: str, qs: list[float]) -> pa.Table:
    """Exact INTERPOLATED quantiles (SQL ``quantile_cont``): value at
    fractional 0-based position ``q·(n−1)`` of the sorted column,
    linearly interpolated between the two bracketing order statistics
    — same one-sort + targeted-block-fetch envelope as
    :func:`exact_quantiles_sorted` (at most two blocks per quantile
    ever leave the object store)."""
    _check_qs(qs)

    import ray

    from ..common import per_block_results

    srt = ds.select_columns([col]).sort(col).materialize()
    counts = np.array(per_block_results(srt, lambda t: t.num_rows), np.int64)
    refs = srt.to_arrow_refs()
    cum = np.cumsum(counts)
    n = int(cum[-1]) if len(cum) else 0
    cache: dict[int, pa.Table] = {}

    def fetch(pos0: int) -> float:  # 0-based global position
        b = int(np.searchsorted(cum, pos0 + 1))
        if b not in cache:
            cache[b] = ray.get(refs[b])
        within = pos0 - (int(cum[b - 1]) if b else 0)
        return float(cache[b].column(col)[within].as_py())

    out_v = []
    for q in qs:
        if n == 0:
            out_v.append(float("nan"))
            continue
        p = q * (n - 1)
        lo = int(np.floor(p))
        hi = min(lo + 1, n - 1)
        f = p - lo
        a = fetch(lo)
        v = a if hi == lo or f == 0.0 else a + f * (fetch(hi) - a)
        out_v.append(v)
    return pa.table(
        {"q": pa.array(qs, pa.float64()), "value": pa.array(out_v, pa.float64())}
    )


def exact_group_quantiles_cont(
    ds: rd.Dataset, group_col: str, col: str, qs: list[float]
) -> pa.Table:
    """Per-group INTERPOLATED quantiles (``quantile_cont`` grouped) —
    the continuous twin of :func:`exact_group_quantiles_sorted`: the
    same ONE (group, value) sort and per-block run summaries, but each
    (group, q) resolves the fractional 0-based position ``q·(n_g−1)``
    and interpolates between the two bracketing order statistics (≤2
    targeted block fetches per quantile)."""
    _check_qs(qs)

    import ray

    from ..common import per_block_results

    srt = ds.select_columns([group_col, col]).sort([group_col, col]).materialize()

    def runs(tbl: pa.Table):
        if tbl.num_rows == 0:
            return None
        import pyarrow.compute as pc

        g = tbl.column(group_col).combine_chunks()
        new = np.concatenate(
            [[True], ~pc.equal(g.slice(1), g.slice(0, len(g) - 1)).to_numpy(zero_copy_only=False)]
        )
        starts = np.flatnonzero(new)
        lens = np.diff(np.append(starts, len(g)))
        return g.take(pa.array(starts)), starts, lens

    parts = per_block_results(srt, runs)
    refs = srt.to_arrow_refs()
    groups, blocks_ix, starts, lens = [], [], [], []
    for b, p in enumerate(parts):
        if p is None:
            continue
        gv, st, ln = p
        groups.extend(gv.to_pylist())
        blocks_ix.extend([b] * len(st))
        starts.extend(st.tolist())
        lens.extend(ln.tolist())
    out_g, out_q, out_v = [], [], []
    cache: dict[int, pa.Table] = {}

    def fetch(i, cum, pos0):
        """value at 0-based position pos0 within the group whose run
        segments start at list index i (cum = segment cumsum)."""
        s = int(np.searchsorted(cum, pos0 + 1))
        b = blocks_ix[i + s]
        if b not in cache:
            cache[b] = ray.get(refs[b])
        within = starts[i + s] + pos0 - (int(cum[s - 1]) if s else 0)
        return float(cache[b].column(col)[within].as_py())

    i = 0
    while i < len(groups):
        j = i
        while j < len(groups) and groups[j] == groups[i]:
            j += 1
        cum = np.cumsum(np.array(lens[i:j], np.int64))
        n_g = int(cum[-1])
        for q in qs:
            p_ = q * (n_g - 1)
            lo = int(np.floor(p_))
            hi = min(lo + 1, n_g - 1)
            f = p_ - lo
            a = fetch(i, cum, lo)
            v = a if hi == lo or f == 0.0 else a + f * (fetch(i, cum, hi) - a)
            out_g.append(groups[i])
            out_q.append(q)
            out_v.append(v)
        i = j
    return pa.table(
        {
            group_col: pa.array(out_g),
            "q": pa.array(out_q, pa.float64()),
            "value": pa.array(out_v, pa.float64()),
        }
    )


def exact_group_quantiles_sorted(
    ds: rd.Dataset, group_col: str, col: str, qs: list[float]
) -> pa.Table:
    """Exact per-group discrete quantiles of ANY orderable column —
    the grouped twin of :func:`exact_quantiles_sorted`.  ONE range sort
    by (group, value); each block reduces to its per-group run
    summaries (group, start offset, count) — O(groups-in-block) rows —
    and the driver turns the block-ordered summaries into per-group
    order-statistic positions (``quantile_disc``: the element at
    1-based ``ceil(q·n_g)``), fetching only the few target blocks.
    The value column itself never reaches the driver; driver state is
    O(blocks × groups-per-block + groups)."""
    import ray

    from ..common import per_block_results

    srt = ds.select_columns([group_col, col]).sort([group_col, col]).materialize()

    def runs(tbl: pa.Table):
        if tbl.num_rows == 0:
            return None
        import pyarrow.compute as pc

        g = tbl.column(group_col).combine_chunks()
        new = np.concatenate(
            [[True], ~pc.equal(g.slice(1), g.slice(0, len(g) - 1)).to_numpy(zero_copy_only=False)]
        )
        starts = np.flatnonzero(new)
        lens = np.diff(np.append(starts, len(g)))
        return g.take(pa.array(starts)), starts, lens

    parts = per_block_results(srt, runs)
    refs = srt.to_arrow_refs()
    # block-ordered (group, block, start, count) — the global sort makes
    # each group's rows contiguous across this concatenation
    groups, blocks_ix, starts, lens = [], [], [], []
    for b, p in enumerate(parts):
        if p is None:
            continue
        gv, st, ln = p
        groups.extend(gv.to_pylist())
        blocks_ix.extend([b] * len(st))
        starts.extend(st.tolist())
        lens.extend(ln.tolist())
    out_g, out_q, out_v = [], [], []
    cache: dict[int, pa.Table] = {}
    i = 0
    while i < len(groups):
        j = i
        while j < len(groups) and groups[j] == groups[i]:
            j += 1
        seg_lens = np.array(lens[i:j], np.int64)
        cum = np.cumsum(seg_lens)
        n_g = int(cum[-1])
        for q in qs:
            pos = max(1, int(np.ceil(q * n_g)))
            s = int(np.searchsorted(cum, pos))
            b = blocks_ix[i + s]
            if b not in cache:
                cache[b] = ray.get(refs[b])
            within = starts[i + s] + pos - (int(cum[s - 1]) if s else 0) - 1
            out_g.append(groups[i])
            out_q.append(q)
            out_v.append(cache[b].column(col)[within].as_py())
        i = j
    return pa.table(
        {
            group_col: pa.array(out_g),
            "q": pa.array(out_q, pa.float64()),
            "value": pa.array(out_v, pa.float64()),
        }
    )


def tfidf_topk(docs: rd.Dataset, *, k: int = 20) -> rd.Dataset:
    """Corpus-salient terms: top-k tokens by ``tf · ln(N/df)`` where tf
    is the total corpus frequency and df the number of documents
    containing the token. Per-batch Arrow kernels emit exact (token,
    tf, df) partials (df per batch is exact because a document is one
    row — distinct (doc, token) pairs never span batches); one
    ``group_sum_sorted`` merges them (sort + run reduceat); scoring is a final map and the
    top-k never materializes the vocabulary on the driver. Score is
    rounded to 6 decimals; order (score desc, token asc)."""
    import pyarrow.compute as pc

    from ..common import distributed_topk

    def partial(batch: pa.Table) -> pa.Table:
        from .dedup import _tokens_string_array

        starts, lens, per_doc, data = _tokenize_batch(batch.column("text"), lower=True)
        toks = _tokens_string_array(starts, lens, data)
        vc = pc.value_counts(toks)
        tf = pa.table(
            {"token": vc.field("values"), "tf": vc.field("counts").cast(pa.int64())}
        )
        doc_of = np.repeat(batch.column("doc_id").to_numpy(), per_doc)
        pairs = (
            pa.table({"d": doc_of, "token": toks}).group_by(["d", "token"]).aggregate([])
        )
        dv = pc.value_counts(pairs.column("token").combine_chunks())
        df = pa.table(
            {"token": dv.field("values"), "df": dv.field("counts").cast(pa.int64())}
        )
        return tf.join(df, "token")  # identical key sets

    n_docs = docs.count()
    from ..common import group_sum_sorted

    merged = group_sum_sorted(
        docs.select_columns(["doc_id", "text"]).map_batches(
            partial, batch_format="pyarrow"
        ),
        "token",
        ["tf", "df"],
    )

    def score(b: pa.Table) -> pa.Table:
        tf = b.column("tf").cast(pa.int64())
        df = b.column("df").cast(pa.int64())
        sc = np.round(
            tf.to_numpy().astype(np.float64)
            * np.log(float(n_docs) / df.to_numpy().astype(np.float64)),
            6,
        )
        return pa.table({"token": b.column("token"), "tf": tf, "df": df, "score": sc})

    return distributed_topk(
        merged.map_batches(score, batch_format="pyarrow"),
        [("score", "descending"), ("token", "ascending")],
        k,
    )


def bigram_topk(docs: rd.Dataset, *, k: int = 20) -> rd.Dataset:
    """Top-k word bigrams by exact corpus frequency. Bigram strings are
    built per batch with one vectorized ``binary_join_element_wise``
    over the flattened token array (pairs crossing a document boundary
    masked out); the merge is the sorted run-reduce and the top-k is the
    partial-merge pattern — nothing vocabulary-sized reaches the
    driver. Order (cnt desc, bigram asc)."""
    import pyarrow.compute as pc

    from ..common import distributed_topk

    def partial(batch: pa.Table) -> pa.Table:
        from .dedup import _tokens_string_array

        starts, lens, per_doc, data = _tokenize_batch(batch.column("text"), lower=True)
        toks = _tokens_string_array(starts, lens, data)
        doc_of = np.repeat(np.arange(len(per_doc), dtype=np.int64), per_doc)
        T = len(toks)
        if T < 2:
            return pa.table(
                {"bigram": pa.array([], pa.string()), "cnt": pa.array([], pa.int64())}
            )
        joined = pc.binary_join_element_wise(toks.slice(0, T - 1), toks.slice(1, T), " ")
        same_doc = doc_of[1:] == doc_of[:-1]
        vc = pc.value_counts(joined.filter(pa.array(same_doc)))
        return pa.table(
            {"bigram": vc.field("values"), "cnt": vc.field("counts").cast(pa.int64())}
        )

    from ..common import group_sum_sorted

    merged = group_sum_sorted(
        docs.select_columns(["text"]).map_batches(partial, batch_format="pyarrow"),
        "bigram",
        ["cnt"],
    )

    return distributed_topk(
        merged,
        [("cnt", "descending"), ("bigram", "ascending")],
        k,
    )


def bigram_pmi(docs: rd.Dataset, *, k: int = 50, min_count: int = 5) -> rd.Dataset:
    """Top-k adjacent-word pairs by pointwise mutual information —
    the collocation/phrase-mining statistic (word2vec-era PMI):
    ``pmi = ln(P(w1 w2) / (P(w1)·P(w2)))`` with probabilities from
    exact corpus counts, restricted to bigrams seen ≥ ``min_count``
    times.

    All counts are exact integers through the engine's sorted
    run-reduce; the two unigram attachments are distributed
    sort-merge joins (no vocabulary broadcast — the ``lm_score``
    shape); the single float expression is evaluated by the identical
    tree on both sides and rounded to 6 decimals before the ranking,
    so the result hash-matches SQL.  Order (pmi desc, bigram asc)."""
    import pyarrow.compute as pc

    from ..common import batch_to_numpy, distributed_topk, group_sum_sorted
    from .relational import sort_merge_join

    def bi_part(batch: pa.Table) -> pa.Table:
        from .dedup import _tokens_string_array

        starts, lens, per_doc, data = _tokenize_batch(batch.column("text"), lower=True)
        toks = _tokens_string_array(starts, lens, data)
        doc_of = np.repeat(np.arange(len(per_doc), dtype=np.int64), per_doc)
        T = len(toks)
        if T < 2:
            return pa.table(
                {"bigram": pa.array([], pa.string()), "cnt": pa.array([], pa.int64())}
            )
        joined = pc.binary_join_element_wise(toks.slice(0, T - 1), toks.slice(1, T), " ")
        same_doc = doc_of[1:] == doc_of[:-1]
        vc = pc.value_counts(joined.filter(pa.array(same_doc)))
        return pa.table(
            {"bigram": vc.field("values"), "cnt": vc.field("counts").cast(pa.int64())}
        )

    def uni_part(batch: pa.Table) -> pa.Table:
        from .dedup import _tokens_string_array

        starts, lens, _pd, data = _tokenize_batch(batch.column("text"), lower=True)
        vc = pc.value_counts(_tokens_string_array(starts, lens, data))
        return pa.table(
            {"token": vc.field("values"), "cnt": vc.field("counts").cast(pa.int64())}
        )

    text = docs.select_columns(["text"]).materialize()
    bi = group_sum_sorted(
        text.map_batches(bi_part, batch_format="pyarrow"), "bigram", ["cnt"]
    ).materialize()
    uni = group_sum_sorted(
        text.map_batches(uni_part, batch_format="pyarrow"), "token", ["cnt"]
    ).materialize()
    t_bi = int(bi.sum("cnt") or 0)
    t_uni = int(uni.sum("cnt") or 0)

    def split(b: pa.Table) -> pa.Table:
        keep = pc.greater_equal(b.column("cnt"), min_count)
        t = b.filter(keep)
        parts = pc.split_pattern(t.column("bigram"), " ")
        return pa.table(
            {
                "bigram": t.column("bigram"),
                "w1": pc.list_element(parts, 0),
                "w2": pc.list_element(parts, 1),
                "c12": t.column("cnt"),
            }
        )

    cand = bi.map_batches(split, batch_format="pyarrow")
    j1 = sort_merge_join(
        cand,
        uni.map_batches(
            lambda b: pa.table({"token": b.column("token"), "c1": b.column("cnt")}),
            batch_format="pyarrow",
        ),
        left_on="w1",
        right_on="token",
        how="inner",
    )
    j2 = sort_merge_join(
        j1,
        uni.map_batches(
            lambda b: pa.table({"token": b.column("token"), "c2": b.column("cnt")}),
            batch_format="pyarrow",
        ),
        left_on="w2",
        right_on="token",
        how="inner",
    )

    def score(b: pa.Table) -> pa.Table:
        c12 = batch_to_numpy(b, "c12").astype(np.float64)
        c1 = batch_to_numpy(b, "c1").astype(np.float64)
        c2 = batch_to_numpy(b, "c2").astype(np.float64)
        pmi = np.round(np.log((c12 * t_uni * t_uni) / ((c1 * c2) * t_bi)), 6)
        return pa.table(
            {
                "bigram": b.column("bigram"),
                "c12": b.column("c12").cast(pa.int64()),
                "pmi": pa.array(pmi, pa.float64()),
            }
        )

    return distributed_topk(
        j2.map_batches(score, batch_format="pyarrow"),
        [("pmi", "descending"), ("bigram", "ascending")],
        k,
    )


def lm_score(
    docs: rd.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    scale: float = 1e6,
) -> rd.Dataset:
    """Bigram language-model scoring — the perplexity-filter stage of a
    training-data pipeline (CCNet/Gopher-style: score every document by
    how predictable its word sequence is under a corpus-trained n-gram
    model, then filter/bucket on the score).

    The model is the corpus itself: unigram counts ``c(w)`` and bigram
    counts ``c(w1 w2)`` over whitespace-lowercase tokens; a document's
    score is the occurrence-weighted mean of the quantized conditional
    ``⌊scale·c(w1 w2)/c(w1)⌋`` over its bigrams (docs with <2 tokens
    have no bigrams and drop out).  The floor-quantization makes every
    sum integer-exact in any reduction order, so the result is
    bit-identical across layouts and in SQL.

    Scale shape: token/bigram counting is per-batch ``value_counts``
    partials merged by the sorted run-reduce (nothing vocabulary-sized
    on the driver); model lookup is TWO distributed sort-merge joins
    (bigram→prefix-unigram to score the model, doc-bigrams→model to
    score documents) — no broadcast of the vocabulary, which at 100 TB
    does NOT fit an object-store put.  Returns a Dataset
    ``(id_col, n_bigrams, lm_score)``.
    """
    from ..common import group_sum_sorted
    from .dedup import _tokens_string_array
    from .relational import sort_merge_join

    text_only = docs.select_columns([text_col])

    def uni_partial(batch: pa.Table) -> pa.Table:
        starts, lens, _, data = _tokenize_batch(batch.column(text_col), lower=True)
        toks = _tokens_string_array(starts, lens, data)
        vc = pc.value_counts(toks)
        return pa.table(
            {"token": vc.field("values"), "cu": vc.field("counts").cast(pa.int64())}
        )

    unigrams = group_sum_sorted(
        text_only.map_batches(uni_partial, batch_format="pyarrow"), "token", ["cu"]
    )

    def _batch_bigrams(batch: pa.Table):
        """(bigram string array, doc-row index of each bigram) for one
        batch — one vectorized join of adjacent tokens, cross-document
        pairs masked out."""
        starts, lens, per_doc, data = _tokenize_batch(batch.column(text_col), lower=True)
        toks = _tokens_string_array(starts, lens, data)
        T = len(toks)
        if T < 2:
            return pa.array([], pa.string()), np.empty(0, np.int64)
        doc_of = np.repeat(np.arange(len(per_doc), dtype=np.int64), per_doc)
        joined = pc.binary_join_element_wise(toks.slice(0, T - 1), toks.slice(1, T), " ")
        same = doc_of[1:] == doc_of[:-1]
        return joined.filter(pa.array(same)), doc_of[:-1][same]

    def bg_partial(batch: pa.Table) -> pa.Table:
        bgs, _ = _batch_bigrams(batch)
        vc = pc.value_counts(bgs)
        return pa.table(
            {"bigram": vc.field("values"), "cb": vc.field("counts").cast(pa.int64())}
        )

    bigrams = group_sum_sorted(
        text_only.map_batches(bg_partial, batch_format="pyarrow"), "bigram", ["cb"]
    )

    def add_prefix(b: pa.Table) -> pa.Table:
        # tokens contain no whitespace, so the bigram has exactly one
        # space: element 0 of the split IS w1 (SQL split_part(…, 1))
        pre = pc.list_element(pc.split_pattern(b.column("bigram"), " "), 0)
        return b.append_column("prefix", pre)

    model = sort_merge_join(
        bigrams.map_batches(add_prefix, batch_format="pyarrow"),
        unigrams,
        left_on="prefix",
        right_on="token",
        how="inner",
    )

    def score_model(b: pa.Table) -> pa.Table:
        cb = b.column("cb").to_numpy(zero_copy_only=False).astype(np.float64)
        cu = b.column("cu").to_numpy(zero_copy_only=False).astype(np.float64)
        # left-associative (scale·cb)/cu, floored — the SQL expression
        s = np.floor(scale * cb / cu).astype(np.int64)
        return pa.table({"bigram": b.column("bigram"), "s_u": s})

    scored = model.map_batches(score_model, batch_format="pyarrow")

    def doc_bg(batch: pa.Table) -> pa.Table:
        bgs, rows = _batch_bigrams(batch)
        if len(rows) == 0:
            return pa.table(
                {
                    id_col: pa.array([], batch.schema.field(id_col).type),
                    "bigram": pa.array([], pa.string()),
                    "occ": pa.array([], pa.int64()),
                }
            )
        # a document lives wholly inside one batch, so per-(doc, bigram)
        # occurrence counts finalize here: dictionary-encode the bigrams
        # and unique the packed (row, code) key
        if isinstance(bgs, pa.ChunkedArray):
            bgs = bgs.combine_chunks()
        denc = bgs.dictionary_encode()
        codes = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        nd = len(denc.dictionary)
        key = rows * nd + codes
        u, cnt = np.unique(key, return_counts=True)
        return pa.table(
            {
                id_col: batch.column(id_col).take(pa.array(u // nd)),
                "bigram": denc.dictionary.take(pa.array(u % nd)),
                "occ": pa.array(cnt.astype(np.int64)),
            }
        )

    doc_bigrams = docs.select_columns([id_col, text_col]).map_batches(
        doc_bg, batch_format="pyarrow"
    )

    joined = sort_merge_join(
        doc_bigrams, scored, left_on="bigram", right_on="bigram", how="inner"
    )

    def doc_partial(b: pa.Table) -> pa.Table:
        ids = b.column(id_col).to_numpy(zero_copy_only=False)
        occ = b.column("occ").to_numpy(zero_copy_only=False)
        s = b.column("s_u").to_numpy(zero_copy_only=False)
        u, inv = np.unique(ids, return_inverse=True)
        k = len(u)
        sum_u = np.zeros(k, np.int64)
        np.add.at(sum_u, inv, occ * s)
        n = np.zeros(k, np.int64)
        np.add.at(n, inv, occ)
        return pa.table({id_col: u, "lm_sum_u": sum_u, "n_bigrams": n})

    agg = group_sum_sorted(
        joined.map_batches(doc_partial, batch_format="pyarrow"),
        id_col,
        ["lm_sum_u", "n_bigrams"],
    )

    def finish(b: pa.Table) -> pa.Table:
        n = b.column("n_bigrams").to_numpy(zero_copy_only=False)
        su = b.column("lm_sum_u").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                id_col: b.column(id_col),
                "n_bigrams": pa.array(n.astype(np.int64)),
                # identical two-division double formula as the SQL
                "lm_score": su.astype(np.float64) / scale / n.astype(np.float64),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def hash_split_summary(docs: rd.Dataset, *, seed: int = 20260818) -> pa.Table:
    """Deterministic train/valid/test split by content-independent id
    hash (splitmix64(doc_id·GOLD ⊕ seed) mod 1000: <980 train, <990
    valid, else test — a 98/1/1 split) with per-split doc and char
    counts. The hash is the same splitmix64 family the dedup/MIS ops
    use, so the split is reproducible across runs and engines."""
    from .dedup import _GOLD, _mix64

    _U = np.uint64

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy().astype(np.uint64)
        h = _mix64(ids * _GOLD ^ _U(seed))
        b = (h % _U(1000)).astype(np.int64)
        split = np.where(b < 980, 0, np.where(b < 990, 1, 2))
        nch = batch.column("n_chars").to_numpy()
        n_docs = np.bincount(split, minlength=3).astype(np.int64)
        n_chars = np.bincount(split, weights=nch, minlength=3).astype(np.int64)
        return pa.table(
            {
                "split_id": np.arange(3, dtype=np.int64),
                "n_docs": n_docs,
                "n_chars": n_chars,
            }
        )

    parts = (
        docs.select_columns(["doc_id", "n_chars"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("split_id")
        .sum(["n_docs", "n_chars"])
        .to_pandas()  # exactly 3 rows
    )
    parts = parts.sort_values("split_id").reset_index(drop=True)
    names = np.array(["train", "valid", "test"])
    return pa.table(
        {
            "split": names[parts["split_id"].to_numpy()],
            "n_docs": parts["sum(n_docs)"].to_numpy().astype(np.int64),
            "n_chars": parts["sum(n_chars)"].to_numpy().astype(np.int64),
        }
    )


# ----------------------------------------------------------- PII scrub

PII_PATTERNS: tuple[str, ...] = (
    # email, phone-ish digit run, IPv4 — the standard pretraining
    # scrub list; callers substitute their own (denylists, SSNs, ...)
    r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}",
    r"\+?\d[\d\- ]{7,}\d",
    r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
)


def scrub_patterns(
    docs: rd.Dataset,
    *,
    patterns: tuple[str, ...] = PII_PATTERNS,
    repl: str = "[REDACTED]",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> rd.Dataset:
    """PII / denylist redaction: replace every non-overlapping match
    of each pattern (applied in order) with ``repl``; per doc also the
    total match count and the scrubbed length. Pure ``map_batches``
    over Arrow's RE2 kernels (``count_substring_regex`` +
    ``replace_substring_regex``) — no per-row Python, no shuffle, and
    since DuckDB's regex engine is RE2 too, the oracle's
    ``regexp_replace(..., 'g')`` matches byte-for-byte."""

    def stage(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or text_col not in batch.schema.names:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "text": pa.array([], pa.string()),
                    "n_redactions": pa.array([], pa.int64()),
                    "n_chars": pa.array([], pa.int64()),
                }
            )
        txt = batch.column(text_col).combine_chunks()
        hits = pa.nulls(len(txt), pa.int64()).fill_null(0)
        for pat in patterns:
            hits = pc.add(hits, pc.count_substring_regex(txt, pat))
            txt = pc.replace_substring_regex(txt, pat, repl)
        return pa.table(
            {
                "doc_id": batch.column(id_col),
                "text": txt,
                "n_redactions": hits,
                "n_chars": pc.utf8_length(txt),
            }
        )

    return docs.map_batches(stage, batch_format="pyarrow")


# The demo/query pattern set: the standard PII list plus a denylist
# term pattern that actually occurs in the synthetic corpus (so the
# oracle exercises real replacements, not just no-ops).
SCRUB_DEMO_PATTERNS: tuple[str, ...] = PII_PATTERNS + (r"\b(customer|supplier)\b",)


# ------------------------------------------------------- token fluency


def token_fluency(
    docs: rd.Dataset,
    *,
    top_k: int = 1_000_000,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> rd.Dataset:
    """Token-typicality (fluency) score: per document, the total and
    mean corpus frequency of its whitespace tokens — the cheap
    statistical-LM stand-in quality filters use (gibberish and
    boilerplate-free text score low because its tokens are rare in the
    corpus; typical prose scores high).

    Two passes, both integer-exact:

    1. exact corpus token counts via the sorted run-reduce
       (``group_sum_sorted``), narrowed to the ``top_k`` most frequent
       tokens (count desc, token asc — the deterministic rule the
       oracle mirrors) and broadcast once with ``ray.put``; tokens
       outside the top-k contribute 0 (at 100 TB the full vocabulary
       is unbounded, the head is what carries the signal);
    2. a ``map_batches`` scan: per doc, one vectorized searchsorted
       against the broadcast sorted vocab per batch — no shuffle
       touches the corpus again.

    Returns (doc_id, n_tokens, freq_sum) — integers only, so the
    DuckDB oracle is bit-exact with no rounding margin. Empty docs are
    dropped (no tokens)."""
    import ray

    from ..common import distributed_topk, group_sum_sorted

    def partial(batch: pa.Table) -> pa.Table:
        from .dedup import _tokens_string_array

        starts, lens, _, data = _tokenize_batch(batch.column(text_col), lower=False)
        vc = pc.value_counts(_tokens_string_array(starts, lens, data))
        return pa.table(
            {"token": vc.field("values"), "cnt": vc.field("counts").cast(pa.int64())}
        )

    vocab_ds = distributed_topk(
        group_sum_sorted(
            docs.select_columns([text_col]).map_batches(partial, batch_format="pyarrow"),
            "token",
            ["cnt"],
        ),
        [("cnt", "descending"), ("token", "ascending")],
        top_k,
    )
    vt = pa.concat_tables([ray.get(r) for r in vocab_ds.to_arrow_refs()])
    vocab_arr = vt.column("token").combine_chunks()
    vocab_cnt = vt.column("cnt").to_numpy(zero_copy_only=False).astype(np.int64)
    vref = ray.put((vocab_arr, vocab_cnt))

    def score(batch: pa.Table) -> dict:
        empty = {
            "doc_id": np.empty(0, np.int64),
            "n_tokens": np.empty(0, np.int64),
            "freq_sum": np.empty(0, np.int64),
        }
        if batch.num_rows == 0 or text_col not in batch.schema.names:
            return empty
        from ..common import batch_to_numpy

        from .dedup import _tokens_string_array

        varr, vcnt = ray.get(vref)
        starts, lens, per_doc, data = _tokenize_batch(batch.column(text_col), lower=False)
        arr = _tokens_string_array(starts, lens, data)
        f = np.zeros(len(arr), np.int64)
        if len(varr) and len(arr):
            # vectorized C++ hash join of the batch tokens against the
            # broadcast vocabulary — no Python string materialization
            idx = pc.index_in(arr, value_set=varr)
            valid = ~idx.is_null().to_numpy(zero_copy_only=False)
            pos = idx.fill_null(0).to_numpy(zero_copy_only=False).astype(np.int64)
            f[valid] = vcnt[pos[valid]]
        bounds = np.concatenate([[0], np.cumsum(per_doc)])
        csum = np.concatenate([[0], np.cumsum(f)])
        sums = csum[bounds[1:]] - csum[bounds[:-1]]
        ids = batch_to_numpy(batch, id_col)
        keep = per_doc > 0
        return {
            "doc_id": ids[keep],
            "n_tokens": per_doc[keep].astype(np.int64),
            "freq_sum": sums[keep].astype(np.int64),
        }

    return docs.map_batches(score, batch_format="pyarrow")


# ---------------------------------------------------------------- BPE merges


@ray.remote
class _BPEShard:
    """One shard of the BPE working set: a slice of the corpus
    word-frequency table held as flat byte-symbol arrays. Per merge
    round the shard answers one weighted adjacent-pair count (sparse
    int64 partials) and applies one vectorized leftmost-greedy
    rewrite — no Python loop over words, no re-materialization."""

    def __init__(self, refs, keep_tokens: bool = False):
        import pyarrow as _pa

        from ..common import copied_strings as _cs
        from .dedup import _string_segments

        tables = [t if isinstance(t, _pa.Table) else ray.get(t) for t in refs]
        syms, wid, fq, toks = [], [], [], []
        w0 = 0
        for t in tables:
            if t.num_rows == 0:
                continue
            arr = _cs(t.column("token"))
            data, offs = _string_segments(arr)
            cnts = t.column("cnt").combine_chunks().to_numpy(zero_copy_only=False)
            lens = np.diff(offs)
            syms.append(data[offs[0] : offs[-1]].astype(np.int64))
            wid.append(np.repeat(np.arange(w0, w0 + len(lens), dtype=np.int64), lens))
            fq.append(np.repeat(cnts.astype(np.int64), lens))
            if keep_tokens:
                toks.append(arr)
            w0 += len(lens)
        self.s = np.concatenate(syms) if syms else np.empty(0, np.int64)
        self.w = np.concatenate(wid) if wid else np.empty(0, np.int64)
        self.f = np.concatenate(fq) if fq else np.empty(0, np.int64)
        import pyarrow as _pa2

        self.tokens = (
            _pa2.concat_arrays([a.combine_chunks() if isinstance(a, _pa2.ChunkedArray) else a for a in toks])
            if toks
            else None
        )

    def word_symbol_counts(self):
        """(token, n_syms) of this shard's vocabulary AFTER the merges
        applied so far — the encode output (requires keep_tokens)."""
        import pyarrow as _pa

        if self.tokens is None:
            if len(self.w) == 0:  # shard owned only empty blocks
                return _pa.table(
                    {"token": _pa.array([], _pa.string()), "ns": _pa.array([], _pa.int64())}
                )
            raise ValueError("shard built without keep_tokens")
        u, c = np.unique(self.w, return_counts=True)  # u is 0..W-1 complete
        return _pa.table({"token": self.tokens, "ns": _pa.array(c.astype(np.int64))})

    _STRIDE = np.int64(1) << np.int64(21)  # symbol ids < 2^21 (256 + merges)

    def pair_counts(self):
        from ..common import sparse_partial_sum

        if len(self.s) < 2:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        m = self.w[:-1] == self.w[1:]
        if not m.any():
            return np.empty(0, np.int64), np.empty(0, np.int64)
        keys = self.s[:-1][m] * self._STRIDE + self.s[1:][m]
        u, c = sparse_partial_sum(keys, self.f[:-1][m])
        return u, c.astype(np.int64)

    def apply_merge(self, x: int, y: int, z: int):
        s = self.s
        if len(s) < 2:
            return True
        cand = (s[:-1] == x) & (s[1:] == y) & (self.w[:-1] == self.w[1:])
        idx = np.flatnonzero(cand)
        if len(idx) == 0:
            return True
        # leftmost-greedy: within each maximal run of position-adjacent
        # candidates (overlapping matches like 'aaa' for pair (a,a)),
        # keep the 1st, 3rd, ... occurrence
        new_run = np.concatenate([[True], np.diff(idx) != 1])
        run_id = np.cumsum(new_run) - 1
        run_start = idx[new_run][run_id]
        kept = idx[((idx - run_start) % 2) == 0]
        s[kept] = z
        keep_mask = np.ones(len(s), bool)
        keep_mask[kept + 1] = False
        self.s = s[keep_mask]
        self.w = self.w[keep_mask]
        self.f = self.f[keep_mask]
        return True


def _bpe_train(docs, num_merges: int, num_shards: int, keep_tokens: bool = False):
    """Byte-level BPE vocabulary induction (Sennrich et al. ACL'16)
    over the exact corpus word-frequency table.

    Classic BPE iterates on the *vocabulary* (distinct word, count),
    not the corpus — the right working set at 100 TB: the corpus-wide
    word count is the existing sorted run-reduce (one shuffle of
    (token, cnt) partials), after which each merge round touches only
    the vocab shards pinned in a small actor pool. Per round: each
    shard returns sparse weighted adjacent-pair partials (overlapping
    pairs counted, the reference zip semantics), the driver reduces
    O(distinct pairs) integers and picks the (count desc, lhs, rhs)
    argmax, and every shard applies one vectorized leftmost-greedy
    rewrite. Returns one row per merge: ``(rank, lhs, rhs, cnt)``
    with symbols as uppercase hex byte strings (DuckDB's ``hex()``
    representation, so the SQL oracle compares byte-exactly).

    Returns ``(merges table, live shard actors)`` — the caller owns
    the shards (kill after use; :func:`bpe_encode_counts` reads their
    post-merge word lengths first).
    """
    import pyarrow.compute as pc

    from ..common import group_sum_sorted, sparse_partial_sum

    def partial(batch: pa.Table) -> pa.Table:
        from .dedup import _tokens_string_array

        starts, lens, _, data = _tokenize_batch(batch.column("text"), lower=False)
        vc = pc.value_counts(_tokens_string_array(starts, lens, data))
        return pa.table(
            {"token": vc.field("values"), "cnt": vc.field("counts").cast(pa.int64())}
        )

    vocab = group_sum_sorted(
        docs.select_columns(["text"]).map_batches(partial, batch_format="pyarrow"),
        "token",
        ["cnt"],
    ).materialize()

    refs = vocab.to_arrow_refs()
    P = max(1, min(num_shards, len(refs)))
    shards = [
        _BPEShard.remote([refs[i] for i in range(j, len(refs), P)], keep_tokens)
        for j in range(P)
    ]
    table: list[bytes] = [bytes([b]) for b in range(256)]
    stride = int(_BPEShard._STRIDE)
    rows = []
    try:
        for r in range(1, num_merges + 1):
            parts = ray.get([sh.pair_counts.remote() for sh in shards])
            keys = np.concatenate([p[0] for p in parts])
            cnts = np.concatenate([p[1] for p in parts])
            if len(keys) == 0:
                break
            u, c = sparse_partial_sum(keys, cnts)
            c = c.astype(np.int64)
            top = c.max()
            cand = u[c == top]
            # tie order on the hex representation — identical to byte
            # order (fixed-width monotone digits) and to the oracle's
            pairs = sorted(
                (table[int(k) // stride].hex().upper(), table[int(k) % stride].hex().upper(), int(k))
                for k in cand
            )
            lhs_hex, rhs_hex, k = pairs[0]
            x, y = k // stride, k % stride
            z = len(table)
            table.append(table[x] + table[y])
            ray.get([sh.apply_merge.remote(x, y, z) for sh in shards])
            rows.append((r, lhs_hex, rhs_hex, int(top)))
    except BaseException:
        for sh in shards:
            ray.kill(sh)
        raise
    merges = pa.table(
        {
            "rank": pa.array([r[0] for r in rows], pa.int64()),
            "lhs": pa.array([r[1] for r in rows], pa.string()),
            "rhs": pa.array([r[2] for r in rows], pa.string()),
            "cnt": pa.array([r[3] for r in rows], pa.int64()),
        }
    )
    return merges, shards


def bpe_merges(docs, *, num_merges: int = 3, num_shards: int = 8) -> pa.Table:
    """Byte-level BPE vocabulary induction — see :func:`_bpe_train`
    (the shared trainer); returns one (rank, lhs, rhs, cnt) row per
    merge."""
    merges, shards = _bpe_train(docs, num_merges, num_shards)
    for sh in shards:
        ray.kill(sh)
    return merges


def bpe_encode_counts(
    docs,
    *,
    num_merges: int = 8,
    num_shards: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """BPE ENCODE — apply the learned merge table to the corpus: after
    training (:func:`_bpe_train`, vocab-resident actor shards), every
    shard reports its words' post-merge symbol counts, and each
    document's BPE token count is the occurrence-weighted sum over its
    words — the tokenizer-budget statistic (how many tokens will this
    corpus cost under this vocab).

    The word→length table joins to the occurrence stream with the
    ``lm_score`` shape (distributed sort-merge join, no vocabulary
    broadcast) and the per-doc rollup is the sorted run-reduce.
    Returns (doc_id, n_words, n_tokens_bpe) for docs with ≥1 token;
    encode never reads texts twice — one tokenize pass feeds both the
    trainer's vocab and the occurrence join."""
    import ray.data as rd

    from ..common import group_sum_sorted
    from .relational import sort_merge_join

    _merges, shards = _bpe_train(docs, num_merges, num_shards, keep_tokens=True)
    try:
        # driver-owned plasma refs — the vocab-sized length table never
        # materializes on the driver (from_arrow_refs consumes the refs)
        wlen_refs = [sh.word_symbol_counts.remote() for sh in shards]
        ray.wait(wlen_refs, num_returns=len(wlen_refs))
    finally:
        for sh in shards:
            ray.kill(sh)
    wlen = rd.from_arrow_refs(wlen_refs)

    def occurrences(batch: pa.Table) -> pa.Table:
        from .dedup import _tokens_string_array

        starts, lens, per_doc, data = _tokenize_batch(batch.column(text_col), lower=False)
        ids = batch.column(id_col).combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": pa.array(np.repeat(ids, per_doc)),
                "token": _tokens_string_array(starts, lens, data),
            }
        )

    occ = docs.select_columns([id_col, text_col]).map_batches(
        occurrences, batch_format="pyarrow"
    )
    joined = sort_merge_join(occ, wlen, left_on="token")

    def fold(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "one": pa.array(np.ones(batch.num_rows, np.int64)),
                "ns": batch.column("ns"),
            }
        )

    rolled = group_sum_sorted(
        joined.map_batches(fold, batch_format="pyarrow"), "doc_id", ["one", "ns"]
    )

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_words": batch.column("one"),
                "n_tokens_bpe": batch.column("ns"),
            }
        )

    return rolled.map_batches(rename, batch_format="pyarrow")


# ------------------------------------------------------------ inverted index


class InvertedIndex:
    """Distributed exact inverted index: postings are the distinct
    (token, doc_id) pairs, built by per-batch tokenize + in-batch
    distinct (C++ group_by) and ONE range sort by token, materialized
    as the probe structure — lookups fetch only the blocks whose
    token range covers the term (zero-copy plasma reads + one binary
    search per block), never scanning the corpus again. The same
    bucket-sorted-pinned-blocks shape as the ANN LSH index; at
    cluster scale the sorted postings partition across nodes and a
    term probe touches exactly the owning block(s)."""

    def __init__(self, docs, *, id_col: str = "doc_id", text_col: str = "text", lower: bool = True):
        from ..common import per_block_results

        def partial(batch: pa.Table) -> pa.Table:
            from .dedup import _tokens_string_array

            starts, lens, per_doc, data = _tokenize_batch(batch.column(text_col), lower=lower)
            toks = _tokens_string_array(starts, lens, data)
            ids = np.repeat(
                batch.column(id_col).combine_chunks().to_numpy(zero_copy_only=False),
                per_doc,
            )
            t = pa.table({"token": toks, "doc_id": pa.array(ids, pa.int64())})
            return t.group_by(["token", "doc_id"]).aggregate([])

        self.ds = (
            docs.select_columns([id_col, text_col])
            .map_batches(partial, batch_format="pyarrow")
            .sort("token")
            .materialize()
        )
        self.refs = self.ds.to_arrow_refs()

        def bounds(tbl: pa.Table):
            if tbl.num_rows == 0:
                return None
            col = tbl.column("token")
            return (str(col[0].as_py()), str(col[-1].as_py()))

        bs = per_block_results(self.ds, bounds)
        keep = [i for i, b in enumerate(bs) if b is not None]
        self.refs = [self.refs[i] for i in keep]
        self._lo = [bs[i][0] for i in keep]
        self._hi = [bs[i][1] for i in keep]

    def postings(self, term: str) -> np.ndarray:
        """Sorted doc ids containing ``term`` — probes only blocks
        whose token range covers it."""
        import pyarrow.compute as pc
        import ray as _ray

        out = []
        for i, ref in enumerate(self.refs):
            if self._lo[i] <= term <= self._hi[i]:
                t = _ray.get(ref)
                m = pc.equal(t.column("token"), term)
                hit = t.filter(m)
                if hit.num_rows:
                    out.append(
                        hit.column("doc_id").combine_chunks().to_numpy(zero_copy_only=False)
                    )
        return np.unique(np.concatenate(out)) if out else np.empty(0, np.int64)

    def search(self, terms: list[str], mode: str = "and") -> np.ndarray:
        """Doc ids containing ALL (``and``) or ANY (``or``) terms."""
        if mode not in ("and", "or"):
            raise ValueError(f"unknown mode {mode}")
        if not terms:
            return np.empty(0, np.int64)
        sets = [self.postings(t) for t in terms]
        acc = sets[0]
        for s in sets[1:]:
            if mode == "and":
                acc = acc[np.isin(acc, s, assume_unique=True)]
            else:
                acc = np.union1d(acc, s)
        return acc


def robust_group_anomaly(
    ds: rd.Dataset,
    *,
    group_col: str,
    val_col: str,
    id_col: str,
    threshold: float = 3.5,
) -> rd.Dataset:
    """Robust per-group outlier detection — median/MAD z-scores
    (Iglewicz & Hoaglin's modified z), the anomaly filter that
    survives the heavy tails a mean/stddev z-score drowns in.

    Per group: median and MAD (median of |v − med|) are EXACT order
    statistics via two :func:`exact_group_quantiles_sorted` passes
    (order statistics are picks, not sums — no float-accumulation
    drift in any layout), broadcast as O(groups) driver state; each
    row's score is the single deterministic expression
    ``(v − med) / (1.4826 · MAD)`` rounded 1e-6. Groups with MAD = 0
    (constant within the window) are excluded — there is no scale to
    score against. Returns (id, group, value, robust_z, is_outlier)
    for rows of scoreable groups."""
    import pyarrow.compute as pc

    from ..common import batch_to_numpy

    med_tbl = exact_group_quantiles_sorted(
        ds.select_columns([group_col, val_col]), group_col, val_col, [0.5]
    )
    med = dict(zip(med_tbl.column(group_col).to_pylist(), med_tbl.column("value").to_pylist()))
    med_ref = ray.put(med)

    def absdev(batch: pa.Table) -> pa.Table:
        m = ray.get(med_ref)
        enc = pc.dictionary_encode(batch.column(group_col).combine_chunks())
        mv = np.array([m[s] for s in enc.dictionary.to_pylist()], np.float64)
        v = batch_to_numpy(batch, val_col).astype(np.float64)
        dev = np.abs(v - mv[enc.indices.to_numpy(zero_copy_only=False)])
        return pa.table({group_col: batch.column(group_col), "dev": pa.array(dev)})

    mad_tbl = exact_group_quantiles_sorted(
        ds.select_columns([group_col, val_col]).map_batches(absdev, batch_format="pyarrow"),
        group_col,
        "dev",
        [0.5],
    )
    mad = dict(zip(mad_tbl.column(group_col).to_pylist(), mad_tbl.column("value").to_pylist()))
    state_ref = ray.put((med, mad))

    def score(batch: pa.Table) -> pa.Table:
        m, d = ray.get(state_ref)
        enc = pc.dictionary_encode(batch.column(group_col).combine_chunks())
        dv = enc.dictionary.to_pylist()
        mv = np.array([m[s] for s in dv], np.float64)
        dd = np.array([d[s] for s in dv], np.float64)
        idx = enc.indices.to_numpy(zero_copy_only=False)
        v = batch_to_numpy(batch, val_col).astype(np.float64)
        madv = dd[idx]
        keep = madv > 0
        z = np.zeros(len(v))
        z[keep] = np.round((v[keep] - mv[idx][keep]) / (1.4826 * madv[keep]), 6)
        km = pa.array(keep)
        return pa.table(
            {
                id_col: batch.column(id_col).filter(km),
                group_col: batch.column(group_col).filter(km),
                val_col: batch.column(val_col).filter(km),
                "robust_z": pa.array(z[keep]),
                "is_outlier": pa.array(np.abs(z[keep]) > threshold),
            }
        )

    return ds.select_columns([id_col, group_col, val_col]).map_batches(
        score, batch_format="pyarrow"
    )


def cms_heavy_hitters(
    docs: rd.Dataset,
    *,
    depth: int = 4,
    width: int = 1024,
    k: int = 20,
    seed: int = 20260818,
    text_col: str = "text",
) -> pa.Table:
    """Count-Min-Sketch heavy hitters (Cormode & Muthukrishnan 2005)
    — the streaming-sketch answer to "top tokens" that a 100 TB
    pipeline keeps instead of an exact vocabulary: a ``depth × width``
    int64 counter grid, each token occurrence incrementing one bucket
    per row (bucket_r = splitmix64(token_hash ⊕ (seed + r)) % width),
    estimate = min over rows — never an undercount.

    Everything is commutative integer sums, so the sketch is
    bit-identical in every block layout and replays exactly in SQL:
    per block one distinct-token ``value_counts`` + ``depth``
    weighted bincounts (O(depth·width) ints per partial, summed on
    the driver — the sketch IS the driver state, that's the point of
    a sketch); the exact top-``k`` ride the existing sorted
    run-reduce + partial top-k merge for comparison. Returns
    (token, exact_cnt, cms_est) for the exact top-k by
    (cnt desc, token asc) — ``cms_est ≥ exact_cnt`` always, equality
    unless the token's buckets collide in all rows."""
    from ..common import distributed_topk, group_sum_sorted, per_block_results
    from .dedup import _mix64, _token_hashes, _token_hashes_from_matrix, _token_matrix, _tokens_string_array

    mat = docs.select_columns([text_col])
    from .ann import _is_materialized

    if not _is_materialized(mat):
        mat = mat.materialize()

    def sketch_partial(batch: pa.Table):
        starts, lens, _per_doc, tdata = _token_matrix(batch.column(text_col))
        th = _token_hashes_from_matrix(starts, lens, tdata)
        if len(th) == 0:
            return None
        u, c = np.unique(th, return_counts=True)
        S = np.zeros((depth, width), np.int64)
        for r in range(depth):
            b = (_mix64(u ^ np.uint64(seed + r)) % np.uint64(width)).astype(np.int64)
            np.add.at(S[r], b, c)
        return S

    sketch = np.zeros((depth, width), np.int64)
    for p in per_block_results(mat, sketch_partial):
        if p is not None:
            sketch += p

    def count_partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        starts, lens, _pd_, tdata = _token_matrix(batch.column(text_col))
        vc = pc.value_counts(_tokens_string_array(starts, lens, tdata))
        return pa.table(
            {"token": vc.field("values"), "cnt": vc.field("counts").cast(pa.int64())}
        )

    top = distributed_topk(
        group_sum_sorted(
            mat.map_batches(count_partial, batch_format="pyarrow"), "token", ["cnt"]
        ),
        [("cnt", "descending"), ("token", "ascending")],
        k,
    ).to_pandas()

    toks = top["token"].tolist()
    th = _token_hashes(toks)
    est = np.full(len(toks), np.iinfo(np.int64).max, np.int64)
    for r in range(depth):
        b = (_mix64(th ^ np.uint64(seed + r)) % np.uint64(width)).astype(np.int64)
        est = np.minimum(est, sketch[r][b])
    return pa.table(
        {
            "token": pa.array(toks, pa.string()),
            "exact_cnt": pa.array(top["cnt"].to_numpy().astype(np.int64)),
            "cms_est": pa.array(est),
        }
    )
