"""Shared constants and small utilities.

Reference analogues: ``ll_common.h`` defines ``node_t``/``edge_t``
(int64) and the packed edge-ID helpers
(`/root/reference/llama/include/llama/ll_common.h:109-116`,
``ll_mlcsr_helpers.h:61-83``). Here a vertex id is a plain int64
column value (possibly a 64-bit name hash); an edge is a row — no
packed IDs are needed because both endpoints travel with the row.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# Canonical edge-table column names (analogue of the reference's
# node_pair_t {tail, head}, ll_common.h:113-116).
SRC = "src"
DST = "dst"
WEIGHT = "weight"

PAGERANK_D = 0.85  # reference default damping (benchmark/benchmarks/pagerank.h:73)


def hash64(text: str) -> int:
    """Stable signed 64-bit hash of a string (vertex id for named nodes).

    Uses blake2b so ids are reproducible across processes/machines
    (Python's builtin ``hash`` is salted). Returned value fits int64.
    """
    h = hashlib.blake2b(text.encode("utf-8"), digest_size=8).digest()
    return int.from_bytes(h, "little", signed=True)


def hash64_batch(arr: "pa.Array | list[str]") -> np.ndarray:
    """Vectorized-ish hash64 over a string column (per-batch helper)."""
    if isinstance(arr, (pa.Array, pa.ChunkedArray)):
        arr = arr.to_pylist()
    out = np.empty(len(arr), dtype=np.int64)
    for i, s in enumerate(arr):
        out[i] = hash64(s)
    return out


def content_hash_column(col: "pa.Array | pa.ChunkedArray") -> np.ndarray:
    """Vectorized signed-64-bit content hash of a string column — the
    hot loop of exact dedup at scale.

    Fast path: polars' columnar xxhash directly over the Arrow buffers
    (measured 100k × 300 B docs: 6 ms vs 130 ms for a per-row C blake2b
    loop and 600 ms for a numpy Horner roll — the numpy version is
    memory-bound on its 8×-widened uint64 temporaries). Deterministic
    for a fixed polars version + seed, which is all a transient
    grouping key needs; NOT stable across library upgrades and NOT the
    :func:`hash64` family — never persist these values.
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if isinstance(col, pa.ChunkedArray):  # older pyarrow returns ChunkedArray
        col = col.chunk(0) if col.num_chunks else pa.array([], col.type)
    n = len(col)
    if n == 0:
        return np.empty(0, np.int64)
    if col.null_count:
        raise ValueError("content_hash_column: null text")
    try:
        import polars as pl

        return pl.from_arrow(col).hash(seed=42).to_numpy().view(np.int64)
    except ImportError:
        pass
    bufs = col.buffers()
    off_dt = np.int64 if pa.types.is_large_string(col.type) or pa.types.is_large_binary(col.type) else np.int32
    offs = np.frombuffer(bufs[1], off_dt, count=n + 1 + col.offset)[col.offset :].astype(np.int64)
    data = np.frombuffer(bufs[2], np.uint8) if bufs[2] is not None else np.empty(0, np.uint8)
    seg = data[offs[0] : offs[-1]]
    starts = offs[:-1] - offs[0]
    lens = offs[1:] - offs[:-1]
    P = np.uint64(1099511628211)  # FNV prime, odd
    GOLD = np.uint64(0x9E3779B97F4A7C15)
    total = int(offs[-1] - offs[0])
    if total:
        maxlen = int(lens.max())
        pows = np.full(maxlen, P, np.uint64)
        pows[0] = np.uint64(1)
        np.multiply.accumulate(pows, out=pows)  # wraps mod 2^64
        ends = starts + lens
        rev = np.repeat(ends - 1, lens) - np.arange(total, dtype=np.int64)
        terms = seg.astype(np.uint64) * pows[rev]
        t2 = np.append(terms, np.uint64(0))
        sums = np.add.reduceat(t2, np.minimum(starts, total))[:n]
        sums[lens == 0] = np.uint64(0)
    else:
        sums = np.zeros(n, np.uint64)
    # salt with length so zero-prefixed payloads can't alias
    h = sums ^ (lens.astype(np.uint64) * GOLD)
    h ^= h >> np.uint64(30)
    h *= np.uint64(0xBF58476D1CE4E5B9)
    h ^= h >> np.uint64(27)
    h *= np.uint64(0x94D049BB133111EB)
    h ^= h >> np.uint64(31)
    return h.view(np.int64)


def sparse_partial_sum(keys: np.ndarray, values: np.ndarray):
    """Per-batch partial aggregation: sum ``values`` grouped by ``keys``.

    Returns (unique_keys, sums). This is the combiner half of the
    scatter→groupby pattern: pre-aggregating inside ``map_batches``
    shrinks the hash shuffle to one row per distinct key per batch
    (reference analogue: per-thread degree histograms merged after the
    parallel-for, ll_load_utils.h:357-366).
    """
    u, inv = np.unique(keys, return_inverse=True)
    sums = np.bincount(inv, weights=values, minlength=len(u))
    return u, sums


def sparse_partial_min(keys: np.ndarray, values: np.ndarray):
    """Per-batch partial min grouped by keys → (unique_keys, mins)."""
    order = np.lexsort((values, keys))
    k = keys[order]
    v = values[order]
    first = np.ones(len(k), dtype=bool)
    first[1:] = k[1:] != k[:-1]
    return k[first], v[first]


def sort_block_by_column(t: pa.Table, col: str) -> pa.Table:
    """Stable within-block sort by one int column (build-time, one
    parallel pass). Skips the take when the block is already sorted."""
    if t.num_rows == 0:
        return t
    v = t.column(col).combine_chunks().to_numpy(zero_copy_only=False)
    order = np.argsort(v, kind="stable")
    if order[0] == 0 and np.array_equal(order, np.arange(len(order))):
        return t
    return t.take(order)


def copied_strings(col) -> pa.Array:
    """Copy a (possibly object-store-backed) string column into fresh
    local buffers before handing it to ``pc.utf8_split_whitespace``.
    pyarrow 16.1 intermittently fails to split on a whitespace byte
    when that kernel reads zero-copy plasma-backed buffers inside a Ray
    worker (the last token of one row keeps its trailing space; the
    same bytes split correctly after any buffer copy, incl. a pickle
    round-trip). One memcpy per batch — negligible next to the split.
    Regex kernels (RE2 path) have not shown the fault."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    return pa.concat_arrays([arr])


def distributed_topk(ds, keys: list[tuple[str, str]], k: int):
    """Exact global top-k of a Dataset under the Arrow ``sort_by``
    ordering ``keys`` ([(col, 'ascending'|'descending'), ...]).

    Per-block partials (each block emits ≤ k rows) narrow to one block,
    then one in-block sort finishes the merge — no all-to-all range
    shuffle, and no dependence on the streaming executor's block
    delivery order. ``sort().limit(k)`` is NOT safe for this: with the
    default ``preserve_order=False`` the Limit operator consumes sorted
    blocks in *arrival* order, which mis-picks the boundary rows
    (observed nondeterministically with >1 block)."""

    def part(b: pa.Table) -> pa.Table:
        return b.sort_by(keys).slice(0, k)

    return (
        ds.map_batches(part, batch_format="pyarrow")
        .repartition(1)
        .map_batches(part, batch_format="pyarrow", batch_size=None)
    )


def batch_to_numpy(batch: pa.Table, col: str) -> np.ndarray:
    """Zero-copy-when-possible extraction of a column as numpy."""
    return batch.column(col).combine_chunks().to_numpy(zero_copy_only=False)


def binary_matrix(col, dtype=np.float64) -> np.ndarray:
    """Decode a fixed-width ``binary`` column of packed vectors into an
    ``(n, dim)`` matrix with ONE buffer view — no per-row ``bytes``
    objects, no per-row ``np.frombuffer``.

    The rows must be non-null and equal-width (the packed-embedding
    invariant of the LSH/near-dup stages); raises otherwise.
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    itemsize = np.dtype(dtype).itemsize
    if n == 0:
        return np.empty((0, 0), dtype)
    if col.null_count:
        raise ValueError("binary_matrix: null vectors not supported")
    arr = col.cast(pa.large_binary())
    offs = np.frombuffer(arr.buffers()[1], np.int64, n + 1, arr.offset * 8)
    widths = np.diff(offs)
    if not (widths == widths[0]).all() or widths[0] % itemsize:
        raise ValueError("binary_matrix: rows are not uniform packed vectors")
    data = np.frombuffer(arr.buffers()[2], np.uint8)
    return data[offs[0] : offs[-1]].view(dtype).reshape(n, -1)


def ensure_threadsafe_fs_imports() -> None:
    """Make Ray Data's lazy ``fsspec.implementations.http`` probe
    thread-deterministic. With aiohttp absent the import fails and is
    retried on every path resolution; two driver threads importing
    concurrently can surface ``ImportError: cannot import name
    'HTTPFileSystem'`` instead of the ``ModuleNotFoundError`` Ray
    catches. Pre-seeding a benign stub (HTTPFileSystem is only ever an
    ``isinstance`` target; no real HTTP filesystems run here) makes
    the import succeed once and stay cached."""
    import sys
    import types

    try:
        import fsspec.implementations.http  # noqa: F401
    except ModuleNotFoundError:
        m = types.ModuleType("fsspec.implementations.http")

        class HTTPFileSystem:  # pragma: no cover - isinstance target only
            pass

        m.HTTPFileSystem = HTTPFileSystem
        sys.modules["fsspec.implementations.http"] = m
    except ImportError:
        pass  # partially-imported by a concurrent thread; already usable soon


def per_block_results(ds, fn) -> list:
    """Run ``fn(arrow_table) -> value`` once per materialized block of
    ``ds`` as plain Ray tasks, bypassing a full Dataset execution.

    For tiny per-block extractions (first/last run rows, block bounds)
    a Ray Data pass costs ~0.5 s of fixed executor overhead; a handful
    of direct tasks over the block refs is near-free. ``ds`` must be
    materialized.

    Blocks are coerced to Arrow before ``fn`` runs: a dataset with
    MIXED pandas/arrow blocks (e.g. a sort of a pandas-origin input
    with more blocks than rows leaves empty pandas blocks) passes raw
    DataFrames through ``to_arrow_refs``."""
    import ray as _ray

    def _coerced(b):
        if not isinstance(b, pa.Table):
            import pandas as _pd

            if isinstance(b, _pd.DataFrame):
                b = pa.Table.from_pandas(b, preserve_index=False)
        return fn(b)

    task = _ray.remote(_coerced)
    return _ray.get([task.remote(r) for r in ds.to_arrow_refs()])


# ---------------------------------------------------------------- pair keys
#
# (src, dst) pairs as a structured array — lexicographic sort/searchsorted
# without bit-packing, so the full signed-int64 id range is safe (packing
# src<<32|dst aliases dst >= 2^32 and overflows on negative hash64 ids).

_PAIR_DTYPE = np.dtype([("s", "<i8"), ("d", "<i8")])


def pair_struct(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """View two int64 columns as one lexicographically-comparable array."""
    out = np.empty(len(src), dtype=_PAIR_DTYPE)
    out["s"] = src
    out["d"] = dst
    return out


def sorted_pair_struct(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """Sorted (src, dst) struct array for membership probes."""
    return np.sort(pair_struct(src, dst))


def pairs_member_mask(src: np.ndarray, dst: np.ndarray, sorted_pairs: np.ndarray) -> np.ndarray:
    """Bool mask: which (src[i], dst[i]) occur in ``sorted_pairs``
    (a sorted struct array from :func:`sorted_pair_struct`)."""
    if len(sorted_pairs) == 0 or len(src) == 0:
        return np.zeros(len(src), dtype=bool)
    q = pair_struct(src, dst)
    pos = np.searchsorted(sorted_pairs, q)
    pos = np.clip(pos, 0, len(sorted_pairs) - 1)
    return sorted_pairs[pos] == q


# ------------------------------------------------------ boundary stitch
#
# Shared helper for the sort-then-run-local pattern used across the
# engine (dedup_edges, LSH bucket pairs, sketch attach, sessionize,
# canonical_undirected, triangle wedges): process each block's interior
# runs in place, then re-process the runs touching a block edge in one
# small second pass. That second pass is O(runs touching block edges)
# BY CONSTRUCTION — but a pathological sort layout (one giant key run
# spanning blocks) degrades it to O(rows), so every call site goes
# through the size guard below and degrades loudly, never silently.

BOUNDARY_WARN_ROWS = 2_000_000

import logging as _logging

_logger = _logging.getLogger(__name__)


def check_boundary_size(n_rows: int, where: str) -> None:
    """Log loudly when a boundary second pass collects pathologically
    many rows (giant key runs spanning blocks)."""
    if n_rows > BOUNDARY_WARN_ROWS:
        _logger.warning(
            "%s: boundary stitch collected %d rows (> %d) — the sorted "
            "layout has key runs spanning whole blocks; raise key "
            "cardinality (more bands / finer buckets) or block count",
            where,
            n_rows,
            BOUNDARY_WARN_ROWS,
        )
        record_skew_event(where, "boundary_stitch", 1, rows=n_rows)


# ------------------------------------------------------ skew telemetry
#
# Per-stage degradation events (boundary-stitch blowups, hot-bucket
# caps, stop-gram drops, …) log where they happen, but a 100×-scale
# operator needs them rolled up centrally per run. A zero-CPU named
# actor collects fire-and-forget reports from BOTH driver-side guards
# and map_batches workers; `skew_events_summary()` fetches the rollup
# (bench.py surfaces it as the `skew_events` field). Event volume is
# bounded by design — one report per degraded block/stage, not per
# row — so the actor is never a hot spot.

_SKEW_ACTOR_NAME = "llama_ray_skew_telemetry"
_SKEW_NAMESPACE = "llama_ray"


def _skew_actor(create: bool):
    import ray

    if not ray.is_initialized():
        return None
    try:
        return ray.get_actor(_SKEW_ACTOR_NAME, namespace=_SKEW_NAMESPACE)
    except ValueError:
        if not create:
            return None

    @ray.remote(num_cpus=0)
    class _SkewTelemetry:
        def __init__(self):
            self._ev: dict[tuple[str, str], list[int]] = {}

        def record(self, where: str, kind: str, count: int, rows: int):
            s = self._ev.setdefault((where, kind), [0, 0])
            s[0] += count
            s[1] += rows

        def summary(self, reset: bool = False):
            out = [
                {"where": w, "kind": k, "events": c, "rows": r}
                for (w, k), (c, r) in sorted(self._ev.items())
            ]
            if reset:
                self._ev = {}
            return out

    try:
        return _SkewTelemetry.options(
            name=_SKEW_ACTOR_NAME,
            namespace=_SKEW_NAMESPACE,
            lifetime="detached",
            get_if_exists=True,
        ).remote()
    except Exception:  # racing creation / shutting-down cluster
        try:
            return ray.get_actor(_SKEW_ACTOR_NAME, namespace=_SKEW_NAMESPACE)
        except Exception:
            return None


def record_skew_event(where: str, kind: str, count: int, *, rows: int = 0) -> None:
    """Fire-and-forget skew/degradation report — safe from workers and
    the driver alike; a no-op when Ray is down (pure unit tests)."""
    h = _skew_actor(create=True)
    if h is not None:
        h.record.remote(where, kind, int(count), int(rows))


def skew_events_summary(*, reset: bool = False) -> list[dict]:
    """Driver-side rollup of all skew events recorded this session:
    one row per (stage, kind) with event and row totals."""
    import ray

    h = _skew_actor(create=False)
    if h is None:
        return []
    return ray.get(h.summary.remote(reset))


def collect_boundary_runs(srt, key_col: str, *, columns=None, where: str = "boundary"):
    """First-key / last-key runs of every block of a key-sorted,
    MATERIALIZED Dataset, concatenated into one Arrow table (None when
    empty). Runs as plain Ray tasks over the block refs — no Dataset
    executor launch. Block order preserves the global sort order."""

    def edge_rows(tbl: pa.Table):
        if tbl.num_rows == 0 or key_col not in tbl.schema.names:
            return None
        k = tbl.column(key_col).combine_chunks().to_numpy(zero_copy_only=False)
        t = tbl.filter(pa.array((k == k[0]) | (k == k[-1])))
        return t.select(columns) if columns is not None else t

    parts = [
        t for t in per_block_results(srt, edge_rows) if t is not None and t.num_rows
    ]
    if not parts:
        return None
    out = pa.concat_tables(parts)
    check_boundary_size(out.num_rows, where)
    return out


# ------------------------------------------------------- sorted group-sum


def group_sum_sorted(ds, key_col: str, val_cols: list[str]):
    """Per-key integer sums via ONE range sort + per-block run
    reduceat — Ray's generic ``groupby().aggregate()`` measured ~200×
    slower than the sort on multi-million-row keys (64.7 s vs 0.3 s at
    3.2M rows / 8 CPUs), so many-row aggregations take this path.

    Interior runs reduce locally inside each sorted block; the ≤2 runs
    touching a block edge ship one mergeable partial row each to an
    O(blocks) driver merge — bounded no matter how hot a key is.
    Key dtype is preserved (int or string; run detection uses Arrow
    kernels). Returns a Dataset with columns [key_col, *val_cols]
    (int64 sums)."""
    import ray.data as rd

    srt = ds.sort(key_col).materialize()

    def _runs(tbl):
        key = tbl.column(key_col).combine_chunks()
        m = len(key)
        if m == 1:
            new = np.ones(1, bool)
        else:
            new = np.concatenate(
                [[True], pc.not_equal(key.slice(1), key.slice(0, m - 1)).to_numpy(zero_copy_only=False)]
            )
        # nulls never appear in these pipelines' keys; not_equal with a
        # null would poison the run detection
        return key, np.flatnonzero(new)

    def interior(tbl: pa.Table) -> pa.Table:
        schema = pa.schema(
            [tbl.schema.field(key_col)]
            + [pa.field(c, pa.int64()) for c in val_cols]
        )
        if tbl.num_rows == 0:
            return schema.empty_table()
        key, starts = _runs(tbl)
        m = len(key)
        first, last = key[0], key[m - 1]
        run_keys = key.take(pa.array(starts))
        keep = pc.and_(
            pc.not_equal(run_keys, first), pc.not_equal(run_keys, last)
        ).to_numpy(zero_copy_only=False)
        if not keep.any():
            return schema.empty_table()
        out = {key_col: run_keys.filter(pa.array(keep))}
        for c in val_cols:
            v = tbl.column(c).combine_chunks().to_numpy(zero_copy_only=False)
            out[c] = np.add.reduceat(v.astype(np.int64), starts)[keep]
        return pa.table(out)

    main = srt.map_batches(interior, batch_format="pyarrow", batch_size=None)

    def edge_partials(tbl: pa.Table):
        if tbl.num_rows == 0:
            return None
        key = tbl.column(key_col).combine_chunks()
        m = len(key)
        vals = {
            c: tbl.column(c).combine_chunks().to_numpy(zero_copy_only=False)
            for c in val_cols
        }
        rows = []
        edge_keys = [key[0]]
        if m > 1 and key[m - 1] != key[0]:
            edge_keys.append(key[m - 1])
        for kv in edge_keys:
            mask = pc.equal(key, kv).to_numpy(zero_copy_only=False)
            rows.append(
                (kv.as_py(), [int(vals[c][mask].astype(np.int64).sum()) for c in val_cols])
            )
        return rows

    edge = [
        r
        for part in per_block_results(srt, edge_partials)
        if part is not None
        for r in part
    ]
    if edge:
        agg: dict = {}
        for kv, sums in edge:
            if kv in agg:
                agg[kv] = [a + b for a, b in zip(agg[kv], sums)]
            else:
                agg[kv] = sums
        keys = list(agg)
        key_type = srt.schema().base_schema.field(key_col).type
        tbl = pa.table(
            {
                key_col: pa.array(keys, key_type),
                **{
                    c: pa.array([agg[kv][i] for kv in keys], pa.int64())
                    for i, c in enumerate(val_cols)
                },
            }
        )
        main = main.union(rd.from_arrow(tbl))
    return main
