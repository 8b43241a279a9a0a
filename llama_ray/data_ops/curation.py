"""Corpus-curation operators: within-document repetition, per-source
caps, and deterministic language-mix downsampling.

These are the filtering/rebalancing stages of a pretraining data
pipeline (Gopher-style repetition rules, per-domain document caps,
domain/language mixture targets), expressed Ray-Data-first:

* repetition is a pure ``map_batches`` stage over the shared hashed
  n-gram machinery (one buffer roll per batch, no per-row Python);
* the per-group cap is ONE distributed sort + per-block run ranking,
  with the ≤2 boundary groups per block resolved in a small driver
  pass over bounded per-block top-k prefixes (≤2k rows per block no
  matter how large the group);
* mix sampling is two passes: a tiny ``groupby(lang).count()`` whose
  result (a handful of rows) parameterizes integer hash thresholds,
  then a vectorized keep-mask scan.  Selection is content-independent
  (splitmix64 of the doc id), so the sample is reproducible across
  runs, engines, and block layouts.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from ..common import batch_to_numpy
from .dedup import (
    _GOLD,
    _mix64,
    _rolled_windows,
    _segment_unique,
    _token_hashes_from_matrix,
    _token_matrix,
)

# ------------------------------------------------------------ repetition


def repetition_ratio(
    docs: rd.Dataset,
    *,
    n: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> rd.Dataset:
    """Within-document duplicate word-n-gram fraction (a Gopher-style
    repetition quality rule): per doc, ``rep_frac = 1 - distinct/total``
    over its word n-grams (lowercased whitespace tokens; docs shorter
    than ``n`` tokens contribute one whole-doc gram, empty docs are
    dropped).  Pure per-batch stage — the same one-buffer-roll n-gram
    machinery as the dedup family, no shuffle at all."""

    def stage(batch: pa.Table) -> dict:
        starts, lens, per_doc, tdata = _token_matrix(batch.column(text_col))
        th = _token_hashes_from_matrix(starts, lens, tdata)
        offs = np.concatenate([[0], np.cumsum(per_doc)])
        g, counts = _rolled_windows(th, offs, n, _GOLD)
        _u, ucounts = _segment_unique(_mix64(g), counts)
        ids = batch_to_numpy(batch, id_col)
        m = counts > 0
        total = counts[m].astype(np.int64)
        distinct = ucounts[m].astype(np.int64)
        return {
            "doc_id": ids[m],
            "n_grams": total,
            "n_distinct": distinct,
            "rep_frac": np.round(1.0 - distinct / total, 6),
        }

    return docs.map_batches(stage, batch_format="pyarrow")


# --------------------------------------------- greedy coverage selection


def greedy_coverage_select(
    docs: rd.Dataset,
    *,
    k: int = 10,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "pa.Table":
    """Greedy maximum-coverage corpus selection (the classic (1−1/e)
    submodular data-selection stage): pick ``k`` documents one at a
    time, each maximizing the number of word-``n``-gram hashes not yet
    covered by earlier picks; ties → smaller doc_id.

    Per round ONE distributed scan: every batch computes per-doc
    uncovered-gram gains against the broadcast covered set (sorted
    uint64 searchsorted — the covered set is ≤ the k picked docs'
    grams, bounded by document length), returns only its best
    candidate (id, gain, gram array); the driver keeps the global
    argmax and unions its grams.  k rounds = k scans; rows never
    accumulate on the driver.

    Returns (rank, doc_id, gain) — deterministic in any layout and
    replayed exactly by the unrolled SQL oracle."""
    from ..common import per_block_results
    from .packing import _doc_grams

    feats = docs.select_columns([id_col, text_col]).materialize()
    covered = np.empty(0, np.uint64)
    chosen: list[int] = []
    gains: list[int] = []
    for _round in range(k):
        state = ray.put((np.sort(covered), np.array(sorted(chosen), np.int64)))

        def best_in_block(tbl: pa.Table):
            if tbl.num_rows == 0 or text_col not in tbl.schema.names:
                return None
            cov, excl = ray.get(state)
            g, counts = _doc_grams(tbl, n, text_col)
            ids = batch_to_numpy(tbl, id_col)
            if len(g):
                pos = np.searchsorted(cov, g)
                pos_c = np.clip(pos, 0, max(len(cov) - 1, 0))
                hit = (
                    (cov[pos_c] == g) if len(cov) else np.zeros(len(g), bool)
                )
            else:
                hit = np.zeros(0, bool)
            bounds = np.concatenate([[0], np.cumsum(counts)])
            ch = np.concatenate([[0], np.cumsum((~hit).astype(np.int64))])
            gain = ch[bounds[1:]] - ch[bounds[:-1]]
            ok = ~np.isin(ids, excl)
            if not ok.any():
                return None
            # block argmax under (gain desc, doc_id asc)
            order = np.lexsort((ids[ok], -gain[ok]))
            bi = np.flatnonzero(ok)[order[0]]
            dg = g[bounds[bi] : bounds[bi + 1]]
            return int(ids[bi]), int(gain[bi]), dg[~hit[bounds[bi] : bounds[bi + 1]]]

        best = None
        for c in per_block_results(feats, best_in_block):
            if c is None:
                continue
            if best is None or (c[1], -c[0]) > (best[1], -best[0]):
                best = c
        if best is None:
            break
        chosen.append(best[0])
        gains.append(best[1])
        covered = np.union1d(covered, best[2])
    return pa.table(
        {
            "rank": pa.array(np.arange(1, len(chosen) + 1, dtype=np.int64)),
            "doc_id": pa.array(np.array(chosen, np.int64)),
            "gain": pa.array(np.array(gains, np.int64)),
        }
    )


# ------------------------------------------------- composite rule filter

GOPHER_STOP = r"\b(the|and|of|to|in|is|that|with|for)\b"


def gopher_filter(
    docs: rd.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mwl: int = 3,
    max_mwl: int = 10,
    min_stop: int = 2,
    sym_pct: int = 10,
    rep_pct: int = 20,
    rep_n: int = 2,
) -> rd.Dataset:
    """Gopher/C4-style composite document filter: per doc a reason
    bitmask over five cheap quality rules and the resulting keep flag.

    Every signal is integer and every rule an integer
    cross-multiplication, so the result is bit-exact in any layout and
    in SQL (no float ratios):

    * bit 1 — word count outside [min_words, max_words]
      (words = ``\\S+`` runs);
    * bit 2 — mean word length outside [min_mwl, max_mwl]
      (``min_mwl·words ≤ non-ws chars ≤ max_mwl·words``);
    * bit 4 — fewer than ``min_stop`` English stop-word hits;
    * bit 8 — symbol chars exceed ``sym_pct``% of characters;
    * bit 16 — duplicate word-``rep_n``-gram fraction exceeds
      ``rep_pct``% (the repetition_ratio gram space; empty docs pass
      vacuously — they already fail bit 1).

    One ``map_batches`` pass: four Arrow RE2 kernels + one buffer-roll
    gram pass per batch, no shuffle, no per-row Python."""
    import pyarrow.compute as pc

    def stage(batch: pa.Table) -> dict:
        col = batch.column(text_col)
        lower = pc.utf8_lower(col)
        n_words = pc.count_substring_regex(col, r"\S+").to_numpy(zero_copy_only=False)
        n_wchars = pc.count_substring_regex(col, r"\S").to_numpy(zero_copy_only=False)
        n_stop = pc.count_substring_regex(lower, GOPHER_STOP).to_numpy(
            zero_copy_only=False
        )
        n_sym = pc.count_substring_regex(col, r"[^\p{L}\p{N}_\s]").to_numpy(
            zero_copy_only=False
        )
        n_chars = pc.utf8_length(col).to_numpy(zero_copy_only=False)
        starts, lens, per_doc, tdata = _token_matrix(col)
        th = _token_hashes_from_matrix(starts, lens, tdata)
        offs = np.concatenate([[0], np.cumsum(per_doc)])
        g, counts = _rolled_windows(th, offs, rep_n, _GOLD)
        _u, ucounts = _segment_unique(_mix64(g), counts)
        total = counts.astype(np.int64)
        distinct = ucounts.astype(np.int64)
        mask = np.zeros(len(n_words), np.int64)
        mask += ((n_words < min_words) | (n_words > max_words)) * 1
        mask += (
            (n_wchars < min_mwl * n_words) | (n_wchars > max_mwl * n_words)
        ) * 2
        mask += (n_stop < min_stop) * 4
        mask += (100 * n_sym > sym_pct * n_chars) * 8
        mask += (100 * (total - distinct) > rep_pct * total) * 16
        return {
            "doc_id": batch_to_numpy(batch, id_col),
            "n_words": n_words.astype(np.int64),
            "reason_mask": mask,
            "keep": (mask == 0).astype(np.int64),
        }

    return docs.map_batches(stage, batch_format="pyarrow")


# ------------------------------------------------------- per-group top-k


def topk_per_group(
    ds: rd.Dataset,
    *,
    group_col: str,
    order_cols: list[str],
    descending: list[bool],
    k: int,
) -> rd.Dataset:
    """Keep the top ``k`` rows of every group under a total order —
    the per-domain document cap of a curation pipeline (and the
    generic window ``row_number() <= k``).

    One distributed range sort by (group, *order_cols*); groups fully
    interior to a block rank locally (vectorized run arithmetic); the
    ≤2 groups touching each block edge are re-ranked in a small driver
    pass.  Boundary collection is bounded: a group's global top-k is
    contained in the union of each block's first ``k`` rows of that
    group (block segments are contiguous and already ordered), so only
    ≤2k rows per block ever reach the driver — a group spanning many
    whole blocks (the common case at scale: one hot domain ≫ block
    size) costs O(k) per block, not its full row count.  Adds a
    ``rank`` column (1-based within group).
    """
    srt = ds.sort(
        [group_col, *order_cols], descending=[False, *descending]
    ).materialize()

    def rank_rows(tbl: pa.Table) -> pa.Table:
        g = tbl.column(group_col).combine_chunks().to_numpy(zero_copy_only=False)
        m = len(g)
        new = np.ones(m, bool)
        new[1:] = g[1:] != g[:-1]
        starts = np.flatnonzero(new)
        rank = np.arange(m, dtype=np.int64) - np.repeat(
            starts, np.diff(np.append(starts, m))
        ) + 1
        keep = rank <= k
        out = tbl.filter(pa.array(keep))
        return out.append_column("rank", pa.array(rank[keep]))

    def interior(tbl: pa.Table) -> pa.Table:
        schema = tbl.schema.append(pa.field("rank", pa.int64()))
        if tbl.num_rows == 0:
            return schema.empty_table()
        g = tbl.column(group_col).combine_chunks().to_numpy(zero_copy_only=False)
        inner = (g != g[0]) & (g != g[-1])
        if not inner.any():
            return schema.empty_table()
        return rank_rows(tbl.filter(pa.array(inner)))

    main = srt.map_batches(interior, batch_format="pyarrow", batch_size=None)

    def edge_prefixes(tbl: pa.Table):
        """First k rows of the block's first-group run and last-group
        run (the only rows of a boundary group that can make top-k)."""
        if tbl.num_rows == 0:
            return None
        g = tbl.column(group_col).combine_chunks().to_numpy(zero_copy_only=False)
        m = len(g)
        first_end = int(np.searchsorted(g != g[0], True))  # first run length
        last_start = m - int(np.searchsorted(g[::-1] != g[-1], True))
        take = np.zeros(m, bool)
        take[:min(first_end, k)] = True
        take[last_start : last_start + k] = True
        return tbl.filter(pa.array(take))

    from ..common import per_block_results

    parts = [
        t for t in per_block_results(srt, edge_prefixes) if t is not None and t.num_rows
    ]
    if parts:
        # block order preserves the global sort, so concatenated
        # boundary prefixes are in-order per group
        main = main.union(rd.from_arrow(rank_rows(pa.concat_tables(parts))))
    return main


# ------------------------------------------------------------ mix sample


def lang_mix_sample(
    docs: rd.Dataset,
    *,
    lang_col: str = "lang",
    id_col: str = "doc_id",
    seed: int = 777,
) -> pa.Table:
    """Deterministic language rebalancing: downsample every language
    to (approximately) the size of the smallest one.  Pass 1 counts
    docs per language (tiny groupby); each language gets an integer
    keep-threshold ``(min_count * 10^6) // count``; pass 2 keeps a doc
    iff ``splitmix64(doc_id·GOLD ⊕ seed) mod 10^6 < threshold`` — a
    content-independent coin that is exact integer arithmetic on both
    engines.  Returns the per-language summary (lang, n_total,
    threshold, n_kept)."""
    cnt = (
        docs.select_columns([lang_col, id_col])
        .groupby(lang_col)
        .count()
        .to_pandas()  # one row per language
    )
    if len(cnt) == 0:
        e = pa.array([], pa.int64())
        return pa.table(
            {"lang": pa.array([], pa.string()), "n_total": e, "threshold": e, "n_kept": e}
        )
    langs = cnt[lang_col].to_numpy()
    totals = cnt["count()"].to_numpy().astype(np.int64)
    mn = int(totals.min())
    thresh = (mn * 1_000_000) // totals
    tmap = dict(zip(langs.tolist(), thresh.tolist()))

    def partial(batch: pa.Table) -> dict:
        ids = batch_to_numpy(batch, id_col).astype(np.uint64)
        bkt = (_mix64(ids * _GOLD ^ np.uint64(seed)) % np.uint64(1_000_000)).astype(
            np.int64
        )
        langs_b, inv = np.unique(
            batch.column(lang_col).combine_chunks().to_numpy(zero_copy_only=False),
            return_inverse=True,
        )
        th_b = np.array([tmap[l] for l in langs_b], np.int64)
        kept = bkt < th_b[inv]
        return {
            "lang": langs_b,
            "n_kept": np.bincount(inv, weights=kept).astype(np.int64),
        }

    kept = (
        docs.select_columns([lang_col, id_col])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("lang")
        .sum("n_kept")
        .to_pandas()
    )
    kmap = dict(zip(kept["lang"], kept["sum(n_kept)"].astype(np.int64)))
    order = np.argsort(langs)
    return pa.table(
        {
            "lang": langs[order],
            "n_total": totals[order],
            "threshold": thresh[order].astype(np.int64),
            "n_kept": pa.array(
                [int(kmap.get(l, 0)) for l in langs[order]], pa.int64()
            ),
        }
    )




# ------------------------------------------------------- duplicate spans


from ..common import group_sum_sorted as _group_sum_sorted  # noqa: E402


def duplicate_spans(
    docs: rd.Dataset,
    *,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> rd.Dataset:
    """Cross-document duplicate-span profile (the substring-dedup
    signal of Lee et al. 2022, "Deduplicating Training Data Makes
    Language Models Better", in hashed-gram form): for each document,
    how many of its DISTINCT word ``n``-grams also appear in at least
    one OTHER document, and the resulting duplicate fraction.  Docs
    with a high ``dup_frac`` are boilerplate/template-heavy even when
    no whole-document near-dup fires.

    Gram space is shared with the n-gram Jaccard / contamination
    operators (lowercased whitespace tokens → polynomial token hash →
    splitmix64 → GOLD-rolled window → splitmix64; docs shorter than
    ``n`` tokens yield one whole-doc gram, empty docs none and are
    dropped).

    Join-free and groupby-free at scale — a gram held by exactly ONE
    document attributes to that document, so per-doc duplicate counts
    are ``total − unique``:

    1. per-batch featurize: (gram, doc) pairs, distinct per doc, plus
       a per-doc totals stream (no shuffle);
    2. ONE range sort of the pair table by gram; per sorted block,
       interior single-row runs are globally-unique grams (a length-1
       run can never span blocks) and attribute locally; each block's
       two EDGE runs ship one summary row each — (gram, in-block
       count, candidate doc) — to a driver merge that is O(blocks),
       not O(rows), no matter how hot the template grams are;
    3. totals ∪ attributions reduce per doc through the same
       sort + run-reduceat path (``_group_sum_sorted``); dup = total −
       unique.  No broadcast side, no driver text, and the only
       O(rows) exchanges are two range sorts.
    """
    from ..common import per_block_results

    def emit_pairs(batch: pa.Table) -> dict:
        empty = {"g": np.empty(0, np.int64), "doc_id": np.empty(0, np.int64)}
        if batch.num_rows == 0 or text_col not in batch.schema.names:
            return empty
        starts, lens, per_doc, tdata = _token_matrix(batch.column(text_col))
        th = _token_hashes_from_matrix(starts, lens, tdata)
        offs = np.concatenate([[0], np.cumsum(per_doc)])
        g, counts = _rolled_windows(th, offs, n, _GOLD)
        g, counts = _segment_unique(_mix64(g), counts)
        ids = np.repeat(batch_to_numpy(batch, id_col), counts)
        # bitcast to int64 for the sort key (the engine convention for
        # u64 hashes — only equality/contiguity matters here)
        return {"g": g.view(np.int64), "doc_id": ids}

    def emit_totals(batch: pa.Table) -> dict:
        empty = {
            "doc_id": np.empty(0, np.int64),
            "n_ngrams": np.empty(0, np.int64),
            "n_unique": np.empty(0, np.int64),
        }
        if batch.num_rows == 0 or text_col not in batch.schema.names:
            return empty
        starts, lens, per_doc, tdata = _token_matrix(batch.column(text_col))
        th = _token_hashes_from_matrix(starts, lens, tdata)
        offs = np.concatenate([[0], np.cumsum(per_doc)])
        g, counts = _rolled_windows(th, offs, n, _GOLD)
        _g, ucounts = _segment_unique(_mix64(g), counts)
        ids = batch_to_numpy(batch, id_col)
        keep = ucounts > 0
        return {
            "doc_id": ids[keep],
            "n_ngrams": ucounts[keep].astype(np.int64),
            "n_unique": np.zeros(int(keep.sum()), np.int64),
        }

    srt = docs.map_batches(emit_pairs, batch_format="pyarrow").sort("g").materialize()

    def interior_uniques(tbl: pa.Table) -> pa.Table:
        schema = pa.schema(
            [
                pa.field("doc_id", pa.int64()),
                pa.field("n_ngrams", pa.int64()),
                pa.field("n_unique", pa.int64()),
            ]
        )
        if tbl.num_rows == 0:
            return schema.empty_table()
        g = tbl.column("g").combine_chunks().to_numpy(zero_copy_only=False)
        d = tbl.column("doc_id").combine_chunks().to_numpy(zero_copy_only=False)
        m = len(g)
        new = np.ones(m, bool)
        new[1:] = g[1:] != g[:-1]
        starts = np.flatnonzero(new)
        lens = np.diff(np.append(starts, m))
        # interior = not the block's first or last VALUE run
        inner = (g[starts] != g[0]) & (g[starts] != g[-1])
        single = inner & (lens == 1)
        docs_u = d[starts[single]]
        if not len(docs_u):
            return schema.empty_table()
        ud, cnt = np.unique(docs_u, return_counts=True)
        return pa.table(
            {
                "doc_id": ud.astype(np.int64),
                "n_ngrams": np.zeros(len(ud), np.int64),
                "n_unique": cnt.astype(np.int64),
            }
        )

    uniq_interior = srt.map_batches(
        interior_uniques, batch_format="pyarrow", batch_size=None
    )

    def edge_summaries(tbl: pa.Table):
        """≤2 rows: (gram, in-block count, doc if count==1 else -1)
        for the block's first and last value runs."""
        if tbl.num_rows == 0:
            return None
        g = tbl.column("g").combine_chunks().to_numpy(zero_copy_only=False)
        d = tbl.column("doc_id").combine_chunks().to_numpy(zero_copy_only=False)
        rows = []
        for val in {int(g[0]), int(g[-1])}:
            mask = g == val
            c = int(mask.sum())
            rows.append((val, c, int(d[np.argmax(mask)]) if c == 1 else -1))
        return rows

    edge_rows = [
        r
        for part in per_block_results(srt, edge_summaries)
        if part is not None
        for r in part
    ]
    streams = [docs.map_batches(emit_totals, batch_format="pyarrow"), uniq_interior]
    if edge_rows:
        gs = np.array([r[0] for r in edge_rows], np.int64)
        cs = np.array([r[1] for r in edge_rows], np.int64)
        ds_ = np.array([r[2] for r in edge_rows], np.int64)
        uk, inv = np.unique(gs, return_inverse=True)
        tot = np.zeros(len(uk), np.int64)
        np.add.at(tot, inv, cs)
        # a globally-unique edge gram: total count 1 -> its single
        # (count==1) summary row carries the doc
        one = tot[inv] == 1
        docs_edge = ds_[one & (ds_ >= 0)]
        if len(docs_edge):
            ud, cnt = np.unique(docs_edge, return_counts=True)
            streams.append(
                rd.from_arrow(
                    pa.table(
                        {
                            "doc_id": ud,
                            "n_ngrams": np.zeros(len(ud), np.int64),
                            "n_unique": cnt.astype(np.int64),
                        }
                    )
                )
            )

    merged = _group_sum_sorted(
        streams[0].union(*streams[1:]), "doc_id", ["n_ngrams", "n_unique"]
    )

    def finalize(t: pa.Table) -> dict:
        if t.num_rows == 0:
            return {
                "doc_id": np.empty(0, np.int64),
                "n_ngrams": np.empty(0, np.int64),
                "n_dup": np.empty(0, np.int64),
                "dup_frac": np.empty(0, np.float64),
            }
        tot = batch_to_numpy(t, "n_ngrams").astype(np.int64)
        unq = batch_to_numpy(t, "n_unique").astype(np.int64)
        dup = tot - unq
        return {
            "doc_id": batch_to_numpy(t, "doc_id"),
            "n_ngrams": tot,
            "n_dup": dup,
            "dup_frac": np.round(dup / np.maximum(tot, 1), 6),
        }

    return merged.map_batches(finalize, batch_format="pyarrow")


# -------------------------------------------------------- source overlap


_US = "\x1f"  # key separator for the combined pair/count aggregation


def _overlap_runs(g: np.ndarray, codes: np.ndarray, max_df: int):
    """Distinct-row positions and within-gram pair indices of rows
    sorted by (gram, source-code): dedup adjacent equal (g, code) rows,
    drop gram runs with more than ``max_df`` distinct sources, emit all
    source pairs of the surviving runs. Returns (pair_left, pair_right,
    kept_positions, n_over) — pair/kept arrays index into the input."""
    if len(g) == 0:
        e = np.empty(0, np.int64)
        return e, e, e, 0
    new = np.concatenate([[True], (g[1:] != g[:-1]) | (codes[1:] != codes[:-1])])
    pos = np.flatnonzero(new)
    gd = g[pos]
    starts = np.flatnonzero(np.concatenate([[True], gd[1:] != gd[:-1]]))
    lens = np.diff(np.concatenate([starts, [len(gd)]]))
    over = lens > max_df
    keep = np.repeat(~over, lens)
    kept_pos = pos[keep]

    from ..algos.triangles import _pairs_multirun

    li, ri = _pairs_multirun(gd[keep])
    return kept_pos[li], kept_pos[ri], kept_pos, int(over.sum())


def source_overlap(
    docs: rd.Dataset,
    *,
    n: int = 3,
    group_col: str = "source",
    text_col: str = "text",
    max_df: int = 64,
    min_shared: int = 1,
) -> rd.Dataset:
    """Pairwise source-overlap matrix: for every pair of sources, the
    number of distinct word ``n``-gram hashes both contain and the
    Jaccard similarity of their distinct-gram sets — the corpus-level
    leakage / fork-detection signal (which domains, dumps, or repos
    are near-copies of each other) computed without ever comparing
    source pairs directly.

    Grams are the engine's shared hashed-token feature space (the
    n-gram Jaccard / contamination family). The gram universe is
    document-frequency-windowed: grams present in more than ``max_df``
    sources are dropped from BOTH intersections and denominators (the
    standard stop-gram / IDF window — a gram in every source carries
    no pairing signal but would cost O(df²) pair rows). Drops are
    loudly logged; with ``max_df`` ≥ the source count the result is
    exact.

    Shape, built for scale: one range sort of the (gram, source)
    table co-locates each gram's sources; per-block interior runs
    dedup + emit pairs vectorized, the ≤2 boundary runs per block
    resolve in a bounded driver pass; pair counts AND per-source
    distinct-gram totals ride ONE shared sort-reduce (keys
    ``P␟a␟b`` / ``S␟source``). Only O(#sources) totals and O(#pairs)
    final rows reach the driver-adjacent stages; document text never
    leaves the featurize step.
    """
    import logging

    import pyarrow.compute as pc
    import ray

    from ..common import collect_boundary_runs
    from .dedup import _word_ngram_hashes_batch

    logger = logging.getLogger(__name__)

    def featurize(batch: pa.Table) -> pa.Table:
        g, counts = _word_ngram_hashes_batch(batch.column(text_col), n)
        src = batch.column(group_col).combine_chunks()
        idx = np.repeat(np.arange(len(src), dtype=np.int64), counts)
        return pa.table({"g": g.view(np.int64), "source": src.take(pa.array(idx))})

    srt = docs.map_batches(featurize, batch_format="pyarrow").sort(["g", "source"]).materialize()

    _EMPTY = pa.table({"key": pa.array([], pa.string()), "n": pa.array([], pa.int64())})

    def _emit(g: np.ndarray, src_arr: pa.Array, sel: np.ndarray) -> pa.Table:
        """Pair + count key rows for rows ``sel`` of (g, src_arr),
        which must be (g, source)-sorted at those positions."""
        if len(sel) == 0:
            return _EMPTY
        enc = src_arr.take(pa.array(sel)).dictionary_encode()
        codes = enc.indices.to_numpy()
        li, ri, kept, n_over = _overlap_runs(g[sel], codes, max_df)
        if n_over:
            logger.warning(
                "source_overlap: dropped %d grams with df > max_df=%d "
                "(stop-gram window)", n_over, max_df
            )
            from ..common import record_skew_event

            record_skew_event("source_overlap", "stop_gram_drop", n_over)
        sa = enc.dictionary.take(pa.array(codes[li]))
        sb = enc.dictionary.take(pa.array(codes[ri]))
        p_keys = pc.binary_join_element_wise(
            pa.array(np.full(len(li), "P")), sa, sb, _US
        )
        cnt = np.bincount(codes[kept], minlength=len(enc.dictionary))
        nz = np.flatnonzero(cnt)
        c_keys = pc.binary_join_element_wise(
            pa.array(np.full(len(nz), "S")), enc.dictionary.take(pa.array(nz)), _US
        )
        return pa.table(
            {
                "key": pa.concat_arrays([p_keys.combine_chunks() if isinstance(p_keys, pa.ChunkedArray) else p_keys,
                                         c_keys.combine_chunks() if isinstance(c_keys, pa.ChunkedArray) else c_keys]),
                "n": np.concatenate([np.ones(len(li), np.int64), cnt[nz]]),
            }
        )

    def interior(tbl: pa.Table) -> pa.Table:
        g = batch_to_numpy(tbl, "g")
        if len(g) == 0:
            return _EMPTY
        edge = (g == g[0]) | (g == g[-1])
        return _emit(g, tbl.column("source").combine_chunks(), np.flatnonzero(~edge))

    mixed = srt.map_batches(interior, batch_format="pyarrow", batch_size=None)

    btbl = collect_boundary_runs(srt, "g", columns=["g", "source"], where="source_overlap")
    if btbl is not None:
        btbl = btbl.sort_by([("g", "ascending"), ("source", "ascending")])
        extra = _emit(
            batch_to_numpy(btbl, "g"),
            btbl.column("source").combine_chunks(),
            np.arange(btbl.num_rows, dtype=np.int64),
        )
        if extra.num_rows:
            mixed = mixed.union(rd.from_arrow(extra))

    agg = _group_sum_sorted(mixed, "key", ["n"]).materialize()

    def _count_rows(t: pa.Table) -> pa.Table:
        return t.filter(pc.starts_with(t.column("key"), "S" + _US))

    totals_tbl = agg.map_batches(_count_rows, batch_format="pyarrow").to_pandas()
    totals = {
        k.split(_US, 1)[1]: int(v) for k, v in zip(totals_tbl["key"], totals_tbl["n"])
    }
    totals_ref = ray.put(totals)

    def finalize(t: pa.Table) -> pa.Table:
        mask = pc.starts_with(t.column("key"), "P" + _US)
        sub = t.filter(mask)
        out_empty = pa.table(
            {
                "source_a": pa.array([], pa.string()),
                "source_b": pa.array([], pa.string()),
                "shared": pa.array([], pa.int64()),
                "jaccard": pa.array([], pa.float64()),
            }
        )
        if sub.num_rows == 0:
            return out_empty
        parts = pc.split_pattern(sub.column("key"), _US)
        sa = pc.list_element(parts, 1)
        sb = pc.list_element(parts, 2)
        shared = batch_to_numpy(sub, "n").astype(np.int64)
        tot = ray.get(totals_ref)
        na = np.fromiter((tot[s] for s in sa.to_pylist()), np.int64, len(shared))
        nb = np.fromiter((tot[s] for s in sb.to_pylist()), np.int64, len(shared))
        keep = shared >= min_shared
        return pa.table(
            {
                "source_a": sa.combine_chunks().filter(pa.array(keep)) if isinstance(sa, pa.ChunkedArray) else sa.filter(pa.array(keep)),
                "source_b": sb.combine_chunks().filter(pa.array(keep)) if isinstance(sb, pa.ChunkedArray) else sb.filter(pa.array(keep)),
                "shared": shared[keep],
                "jaccard": np.round(shared[keep] / (na[keep] + nb[keep] - shared[keep]), 6),
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow").sort(
        ["source_a", "source_b"]
    )


# ------------------------------------------------------------ chunking


def chunk_documents(
    docs: rd.Dataset,
    *,
    size: int = 200,
    stride: int = 150,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> rd.Dataset:
    """Sliding-window document chunking (RAG / context-window prep):
    chunk ``k`` of a doc covers characters ``[k·stride, k·stride +
    size)`` for every ``k·stride < n_chars`` (trailing pieces kept,
    empty docs emit no chunks); columns ``(doc_id, chunk_id, start,
    chunk)``.

    Pure ``map_batches`` — no shuffle, nothing on the driver. The
    chunk strings are gathered from the Arrow utf8 buffer with one
    repeat + per-chunk offset index (the ``_tokens_string_array``
    machinery), so there is no per-row Python. Offsets are CHARACTER
    offsets (SQL ``substr`` semantics); ASCII corpora only — a
    multi-byte batch raises loudly rather than slicing mid-codepoint
    (the scale path for non-ASCII is a per-batch codepoint index,
    same shape, one extra cumsum).
    """
    if size < 1 or stride < 1:
        raise ValueError("size and stride must be >= 1")

    def expand(batch: pa.Table):
        from .dedup import _string_segments, _tokens_string_array

        from ..common import copied_strings

        ids = batch_to_numpy(batch, id_col)
        arr = copied_strings(batch.column(text_col))
        data, offs = _string_segments(arr)
        lens = np.diff(offs)
        if len(data) and (data[offs[0] : offs[-1]] > 127).any():
            raise ValueError(
                "chunk_documents: non-ASCII document — character offsets "
                "would split a codepoint; index codepoints first"
            )
        n_chunks = -(-lens // stride)  # ceil; 0 chunks for empty docs
        did = np.repeat(ids, n_chunks)
        total = int(n_chunks.sum())
        k = np.arange(total, dtype=np.int64) - np.repeat(
            np.cumsum(n_chunks) - n_chunks, n_chunks
        )
        start = k * stride
        clen = np.minimum(size, np.repeat(lens, n_chunks) - start)
        abs_start = np.repeat(offs[:-1], n_chunks) + start
        chunks = _tokens_string_array(abs_start, clen, data)
        return pa.table(
            {
                "doc_id": pa.array(did, pa.int64()),
                "chunk_id": pa.array(k, pa.int64()),
                "start": pa.array(start, pa.int64()),
                "chunk": chunks,
            }
        )

    return docs.select_columns([id_col, text_col]).map_batches(
        expand, batch_format="pyarrow"
    )


# ------------------------------------------------------------------ DSIR


def dsir_weights(
    docs: rd.Dataset,
    *,
    ngrams: tuple[int, ...] = (1, 2),
    buckets: int = 1024,
    seed: int = 20260818,
    r_scale: int = 1 << 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> rd.Dataset:
    """DSIR importance weights (Xie et al. 2023, arXiv:2302.03169):
    score every raw-corpus document by how much its hashed n-gram
    profile looks like a TARGET distribution, for importance
    resampling of training data toward the target domain.

    The target is the engine's standard 10% id-hash holdout (split
    bucket ≥ 900, as in ``contamination``); features are the same
    hashed gram space as the dedup/contamination family (lowercased
    whitespace tokens → 32-byte polynomial hash → splitmix64 →
    GOLD-rolled window → splitmix64; short docs one whole-doc gram),
    distinct per (doc, n), folded into ``buckets`` hash buckets.

    Per-bucket importance is the add-one-smoothed log-likelihood
    ratio, QUANTIZED to an int64 at ``r_scale`` (one ``ln`` per
    bucket, then floor — after which every per-document score is an
    EXACT integer sum, so results hash-match SQL in any layout; the
    single-ln-then-round convention is the bigram-PMI precedent).
    A document's score is ``Σ_f r_f`` over its distinct gram buckets.

    Two passes, no shuffle: (1) per-block bucket-count partials
    (2·``buckets`` ints each) summed on the driver; (2) a broadcast
    O(buckets) r-vector scores each block. Returns
    ``(doc_id, n_grams, score_q, weight)`` for every SOURCE (non-
    target) document with ≥ 1 gram; ``weight = score_q / r_scale``
    rounded 1e-6. Resampling = rank/sample by weight downstream."""
    from ..common import per_block_results
    from .packing import _split_bucket

    def doc_bucket_rows(batch: pa.Table):
        """(doc_ids row-expanded, bucket ids, is_target) for every
        distinct (doc, n)-gram of the batch."""
        ids = batch_to_numpy(batch, id_col).astype(np.int64)
        starts, lens, per_doc, tdata = _token_matrix(batch.column(text_col))
        th = _token_hashes_from_matrix(starts, lens, tdata)
        offs = np.concatenate([[0], np.cumsum(per_doc)])
        all_doc, all_b = [], []
        for n in ngrams:
            g, counts = _rolled_windows(th, offs, n, _GOLD)
            g, counts = _segment_unique(_mix64(g), counts)
            all_doc.append(np.repeat(ids, counts))
            all_b.append((g % np.uint64(buckets)).astype(np.int64))
        d = np.concatenate(all_doc)
        b = np.concatenate(all_b)
        tgt = _split_bucket(d, seed) >= 900
        return d, b, tgt

    mat = docs.select_columns([id_col, text_col])
    from .ann import _is_materialized

    if not _is_materialized(mat):
        mat = mat.materialize()

    def count_partial(batch: pa.Table):
        _d, b, tgt = doc_bucket_rows(batch)
        return (
            np.bincount(b[tgt], minlength=buckets).astype(np.int64),
            np.bincount(b[~tgt], minlength=buckets).astype(np.int64),
        )

    t_cnt = np.zeros(buckets, np.int64)
    s_cnt = np.zeros(buckets, np.int64)
    for p in per_block_results(mat, count_partial):
        if p is not None:
            t_cnt += p[0]
            s_cnt += p[1]
    T = int(t_cnt.sum())
    S = int(s_cnt.sum())
    # exact-int ratio terms, one float division + ln + floor per bucket
    num = np.array([float((int(t) + 1) * (S + buckets)) for t in t_cnt])
    den = np.array([float((int(s) + 1) * (T + buckets)) for s in s_cnt])
    r = np.floor(np.log(num / den) * r_scale + 0.5).astype(np.int64)
    r_ref = ray.put(r)

    def score(batch: pa.Table) -> pa.Table:
        d, b, tgt = doc_bucket_rows(batch)
        d, b = d[~tgt], b[~tgt]
        rv = ray.get(r_ref)
        if len(d) == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "n_grams": pa.array([], pa.int64()),
                    "score_q": pa.array([], pa.int64()),
                    "weight": pa.array([], pa.float64()),
                }
            )
        order = np.argsort(d, kind="stable")
        ds_, bs_ = d[order], b[order]
        first = np.ones(len(ds_), bool)
        first[1:] = ds_[1:] != ds_[:-1]
        starts_ = np.flatnonzero(first)
        n_g = np.diff(np.append(starts_, len(ds_)))
        sq = np.add.reduceat(rv[bs_], starts_)
        return pa.table(
            {
                "doc_id": pa.array(ds_[starts_]),
                "n_grams": pa.array(n_g),
                "score_q": pa.array(sq),
                "weight": pa.array(np.round(sq.astype(np.float64) / float(r_scale), 6)),
            }
        )

    return mat.map_batches(score, batch_format="pyarrow")


# -------------------------------------------------- temperature mixing


def source_temperature_sample(
    docs: rd.Dataset,
    *,
    total: int,
    seed: int = 20260818,
    w_scale: int = 1 << 20,
    id_col: str = "doc_id",
    group_col: str = "source",
) -> rd.Dataset:
    """Temperature-τ=0.5 source mixing (the multilingual-LM sampling
    rule, Arivazhagan et al. 2019 / XLM-R): apportion a ``total``
    sampling budget across sources proportionally to ``√n_s`` —
    up-weighting small sources against the head — then draw each
    source's quota as a deterministic uniform hash sample.

    Everything is integer-exact and hence layout-independent and
    SQL-replayable: weights ``w_s = ⌊√n_s·w_scale + ½⌋`` (sqrt is
    IEEE-correctly-rounded, n_s exact), the split is largest-remainder
    apportionment in pure integer arithmetic (base ``(total·w_s)//W``,
    +1 to the highest remainders, ties → source asc), and the
    per-source draw keeps the quota's smallest
    ``splitmix64(doc_id·GOLD ⊕ seed)`` ids via ONE (source, h, id)
    sort + the :func:`~llama_ray.data_ops.relational.grouped_rank`
    run-offset skeleton. A quota above ``n_s`` degrades to the whole
    source (no redistribution — the τ<1 point is that small sources
    saturate). Returns the selected (doc_id, source) rows."""
    from ..common import per_block_results
    from .dedup import _GOLD, _mix64
    from .relational import grouped_rank

    def cnt_partial(batch: pa.Table):
        import pyarrow.compute as pc

        vc = pc.value_counts(batch.column(group_col).combine_chunks())
        return {
            s: int(c)
            for s, c in zip(vc.field("values").to_pylist(), vc.field("counts").to_pylist())
        }

    mat = docs.select_columns([id_col, group_col])
    from .ann import _is_materialized

    if not _is_materialized(mat):
        mat = mat.materialize()
    counts: dict = {}
    for p in per_block_results(mat, cnt_partial):
        for s, c in p.items():
            counts[s] = counts.get(s, 0) + c

    import math

    srcs = sorted(counts)
    w = {s: math.floor(math.sqrt(float(counts[s])) * w_scale + 0.5) for s in srcs}
    W = sum(w.values())
    base = {s: (total * w[s]) // W for s in srcs}
    rem = {s: total * w[s] - base[s] * W for s in srcs}
    leftover = total - sum(base.values())
    order = sorted(srcs, key=lambda s: (-rem[s], s))
    target = dict(base)
    for s in order[:leftover]:
        target[s] += 1
    t_ref = ray.put(target)

    def hashed(batch: pa.Table) -> pa.Table:
        ids = batch_to_numpy(batch, id_col).astype(np.int64)
        # uint64 column: SQL's HUGEINT hash order is unsigned — a
        # signed int64 view would flip the order of hashes >= 2^63
        h = _mix64(ids.astype(np.uint64) * _GOLD ^ np.uint64(seed))
        return pa.table(
            {
                id_col: pa.array(ids),
                group_col: batch.column(group_col),
                "h": pa.array(h),
            }
        )

    ranked = grouped_rank(
        mat.map_batches(hashed, batch_format="pyarrow"),
        group_col=group_col,
        order_cols=["h", id_col],
        out_col="rk",
    )

    def keep(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        tg = ray.get(t_ref)
        enc = pc.dictionary_encode(batch.column(group_col).combine_chunks())
        # O(#sources) Python, O(rows) vectorized take
        lim_by_code = np.array(
            [tg.get(s, 0) for s in enc.dictionary.to_pylist()], np.int64
        )
        lim = lim_by_code[enc.indices.to_numpy(zero_copy_only=False)]
        rk = batch_to_numpy(batch, "rk")
        m = rk <= lim
        return pa.table(
            {
                id_col: batch.column(id_col).filter(pa.array(m)),
                group_col: batch.column(group_col).filter(pa.array(m)),
            }
        )

    return ranked.map_batches(keep, batch_format="pyarrow")
