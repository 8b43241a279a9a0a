"""Relational join operators: distributed sort-merge equi-join,
as-of join, and broadcast dimension join.

Ray Data (2.49) has no native join operator; pipelines that need one
(fact⋈dimension enrichment, event/state as-of alignment) either fall
back to the driver or re-implement ad hoc.  This module provides the
join and window shapes a 100-TB pipeline actually uses, each built
from the engine's proven primitives (ONE range sort + per-block
complete-run work + a bounded boundary pass — the same skeleton as
``curation.topk_per_group`` and the dedup verify join), plus
``interval_join`` (broadcast range join), ``sliding_window_agg``
(distributed RANGE-frame windowed aggregate), ``running_window``
(SUM/LAG/ROW_NUMBER), ``ntile`` (global quantile buckets) and
``global_ranks`` (dense ROW_NUMBER over a total order):

* ``sort_merge_join`` — general equi-join (inner / left / full outer /
  semi / anti) of two Datasets.  Both sides are projected onto one union schema with a
  side flag, range-sorted ONCE by (key, side), and each key run is
  expanded into its cartesian matches block-locally with vectorized
  run arithmetic.  Only the ≤2 key runs touching each block edge are
  re-joined in a driver pass (bounded, loudly logged if a hot key
  spans whole blocks — the documented skew limit).  No hash exchange,
  no per-row Python.
* ``asof_join`` — for every probe row, the latest reference row of the
  same ``by`` key with ``ts <= probe.ts`` (ties broken toward the
  largest tie column, DuckDB ``ASOF JOIN`` semantics made
  deterministic).  One range sort by (by, ts, side, tie), then a
  classic two-wave distributed prefix scan (the ``pack_sequences``
  shape): wave 1 reduces each block to ONE carry summary, the driver
  does an O(num_blocks) scan, wave 2 forward-fills each block with its
  carry-in.  Only O(blocks) scalars cross the driver.
* ``broadcast_join`` — the small-side hash join: dimension keys/values
  are ``ray.put`` once and every fact batch probes them with a
  vectorized ``searchsorted`` — never a shuffle of the big side.

Reference analogue: the reference enriches vertices with property
tables inside its benchmark tasks (e.g. ``avg_teen_cnt.h:75-141``
joins the ``age`` property to neighbors); these operators are that
pattern generalized to arbitrary tables.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from ..common import (
    batch_to_numpy,
    check_boundary_size,
    per_block_results,
)

_SIDE = "__side__"
_KEY = "__key__"


def _as_arrow(ds: rd.Dataset):
    """(arrow schema, dataset) — coercing pandas-block datasets (e.g.
    ``from_pandas`` test inputs) to Arrow blocks first.  An EMPTY
    pandas-origin dataset loses its schema through the conversion map
    (``schema()`` returns None once zero blocks execute) — rebuild the
    Arrow schema from the declared pandas dtypes instead."""
    s0 = ds.schema()
    bs = s0.base_schema if s0 is not None else None
    if isinstance(bs, pa.Schema):
        return bs, ds
    ds2 = ds.map_batches(lambda t: t, batch_format="pyarrow")
    s2 = ds2.schema()
    if s2 is not None and isinstance(s2.base_schema, pa.Schema):
        return s2.base_schema, ds2
    if bs is not None and hasattr(bs, "names") and hasattr(bs, "types"):
        import pandas as _pd

        empty = _pd.DataFrame(
            {n: _pd.Series(dtype=t) for n, t in zip(bs.names, bs.types)}
        )
        sch = pa.Schema.from_pandas(empty, preserve_index=False)
        return sch, rd.from_arrow(sch.empty_table())
    raise ValueError("_as_arrow: cannot determine the schema of an empty dataset")


def _sorted_arrow(ds: rd.Dataset, keys: list[str]):
    """(arrow schema, materialized sorted dataset).  The sort can
    degrade a mixed/empty-block dataset back to a pandas schema (an
    input with fewer rows than blocks leaves empty blocks whose merged
    schema falls back) — re-coerce after the sort so downstream
    per-block Arrow code always sees ``pa.Table`` blocks."""
    srt = ds.sort(keys).materialize()
    bs = srt.schema().base_schema
    if not isinstance(bs, pa.Schema):
        srt = srt.map_batches(
            lambda t: t, batch_format="pyarrow", batch_size=None
        ).materialize()
        bs = srt.schema().base_schema
    return bs, srt



def _coerce_block(tbl):
    """Arrow-ify a raw block (mixed datasets can hand ``to_arrow_refs``
    consumers a pandas DataFrame — see ``common.per_block_results``)."""
    if not isinstance(tbl, pa.Table):
        import pandas as _pd

        if isinstance(tbl, _pd.DataFrame):
            tbl = pa.Table.from_pandas(tbl, preserve_index=False)
    return tbl


def _cast_block(tbl: pa.Table, schema: pa.Schema) -> pa.Table:
    """Restore a sorted block's declared types: Ray's sort can convert
    blocks through pandas, where an all-null int column degrades to
    Arrow ``null`` type — blocks of the same dataset then disagree and
    ``concat_tables``/``from_arrays`` fail.  Casting to the fixed
    union schema is a no-op for healthy blocks."""
    tbl = _coerce_block(tbl)
    if tbl.schema != schema and set(tbl.schema.names) == set(schema.names):
        tbl = tbl.select(schema.names).cast(schema)
    return tbl


# ------------------------------------------------------ sort-merge join


def _union_schema(
    left_schema: pa.Schema,
    right_schema: pa.Schema,
    left_on: str,
    right_on: str,
    suffix: str,
):
    """(union schema, left col names, right (orig, out) name pairs).

    The union schema is ``[__key__, __side__, *left payload, *right
    payload]``; right payload columns clashing with a left name get
    ``suffix`` appended."""
    left_cols = [n for n in left_schema.names]
    right_pairs = []
    taken = set(left_cols)
    for n in right_schema.names:
        if n == right_on:
            continue
        out = n if n not in taken else n + suffix
        if out in taken:
            raise ValueError(f"column collision even after suffix: {out}")
        taken.add(out)
        right_pairs.append((n, out))
    key_type = left_schema.field(left_on).type
    if right_schema.field(right_on).type != key_type:
        raise ValueError("join key types differ between sides")
    fields = [pa.field(_KEY, key_type), pa.field(_SIDE, pa.int8())]
    fields += [
        pa.field(n, left_schema.field(n).type) for n in left_cols if n != left_on
    ]
    fields += [pa.field(out, right_schema.field(n).type) for n, out in right_pairs]
    return pa.schema(fields), [n for n in left_cols if n != left_on], right_pairs


def _project_side(
    schema: pa.Schema, side: int, key_src: str, rename: dict | None = None
):
    """map_batches fn projecting one input side onto the union schema
    (its own columns carried — via ``rename`` {union name: source
    name} when they differ — the other side's columns all-null)."""
    rename = rename or {}

    def fn(b: pa.Table) -> pa.Table:
        m = b.num_rows
        cols = []
        for f in schema:
            src = rename.get(f.name, f.name)
            if f.name == _KEY:
                cols.append(b.column(key_src).cast(f.type))
            elif f.name == _SIDE:
                cols.append(pa.array(np.full(m, side, np.int8), pa.int8()))
            elif src in b.schema.names:
                cols.append(b.column(src).cast(f.type))
            else:
                cols.append(pa.nulls(m, f.type))
        return pa.Table.from_arrays(cols, schema=schema)

    return fn


def _join_runs(
    tbl: pa.Table,
    out_schema: pa.Schema,
    key_out: str,
    left_cols: list[str],
    right_outs: list[str],
    how: str,
) -> pa.Table:
    """Cartesian-expand complete (key, side)-sorted runs of ``tbl``.

    Every run is ``[left rows..., right rows...]`` (side 0 sorts before
    side 1); the match matrix is materialized with pure run arithmetic:
    output position ``p`` of a run with ``nl×nr`` matches maps to left
    row ``p // nr`` and right row ``p % nr`` — no Python loop over runs
    or rows."""
    if tbl.num_rows == 0:
        return out_schema.empty_table()
    k = tbl.column(_KEY).combine_chunks().to_numpy(zero_copy_only=False)
    side = batch_to_numpy(tbl, _SIDE)
    m = len(k)
    new = np.ones(m, bool)
    new[1:] = k[1:] != k[:-1]
    starts = np.flatnonzero(new)
    lens = np.diff(np.append(starts, m))
    nl = np.add.reduceat((side == 0).astype(np.int64), starts)
    nr = lens - nl
    left_start = starts
    right_start = starts + nl
    if how in ("semi", "anti"):
        # existence filter: each left row once iff its key has (semi)
        # / lacks (anti) right rows — no cartesian expansion at all
        keep = (nr > 0) if how == "semi" else (nr == 0)
        sizes = nl * keep
        total = int(sizes.sum())
        if total == 0:
            return out_schema.empty_table()
        base = np.cumsum(sizes) - sizes
        pos = np.arange(total, dtype=np.int64) - np.repeat(base, sizes)
        l_take = pa.array(np.repeat(left_start, sizes) + pos)
        cols = []
        for f in out_schema:
            src = _KEY if f.name == key_out else f.name
            cols.append(tbl.column(src).take(l_take))
        return pa.Table.from_arrays(cols, schema=out_schema)
    nr_eff = np.maximum(nr, 1) if how in ("left", "outer") else nr
    nl_eff = np.maximum(nl, 1) if how == "outer" else nl
    sizes = nl_eff * nr_eff
    total = int(sizes.sum())
    if total == 0:
        return out_schema.empty_table()
    base = np.cumsum(sizes) - sizes
    pos = np.arange(total, dtype=np.int64) - np.repeat(base, sizes)
    nr_rep = np.repeat(nr_eff, sizes)
    l_idx = np.repeat(left_start, sizes) + pos // nr_rep
    r_idx = np.repeat(right_start, sizes) + pos % nr_rep
    l_valid = np.repeat(nl > 0, sizes)
    r_valid = np.repeat(nr > 0, sizes)
    l_take = pa.array(l_idx, mask=~l_valid) if how == "outer" else pa.array(l_idx)
    if how in ("left", "outer"):
        r_take = pa.array(r_idx, mask=~r_valid)  # null index → null output
    else:
        r_take = pa.array(r_idx)
    # the key exists on every union row: coalesce toward whichever side
    # is real so right-only rows of a full outer join keep their key
    key_take = (
        pa.array(np.where(l_valid, l_idx, r_idx)) if how == "outer" else l_take
    )
    cols = []
    for f in out_schema:
        if f.name == key_out:
            cols.append(tbl.column(_KEY).take(key_take))
        elif f.name in left_cols:
            cols.append(tbl.column(f.name).take(l_take))
        else:
            cols.append(tbl.column(f.name).take(r_take))
    return pa.Table.from_arrays(cols, schema=out_schema)


def sort_merge_join(
    left: rd.Dataset,
    right: rd.Dataset,
    *,
    left_on: str,
    right_on: str | None = None,
    how: str = "inner",
    suffix: str = "_r",
) -> rd.Dataset:
    """Distributed equi-join of two Datasets (``how`` ∈ inner|left).

    ONE range sort of the side-tagged union by (key, side) co-locates
    every key's rows; complete runs join block-locally, the ≤2 runs
    touching each block edge join in a bounded driver pass (hot keys
    spanning whole blocks degrade that pass and are loudly logged —
    broadcast the small side instead when one key dominates).  Join
    keys must be non-null.

    ``how`` ∈ inner|left|outer|semi|anti — ``outer`` is the FULL outer
    join (unmatched rows of BOTH sides survive with nulls across the
    other side; a right join is ``left`` with the sides swapped);
    semi keeps each left row once iff its key exists on the right,
    anti iff it does not (the existence filters of NOT IN / EXISTS
    subqueries). In the semi/anti modes the right side is projected to
    its key alone before the shuffle: only key presence matters, so
    right payload never rides the sort."""
    if how not in ("inner", "left", "outer", "semi", "anti"):
        raise ValueError(f"how must be inner|left|outer|semi|anti, got {how!r}")
    right_on = right_on if right_on is not None else left_on
    if how in ("semi", "anti"):
        right = right.select_columns([right_on])
    lschema, left = _as_arrow(left)
    rschema, right = _as_arrow(right)
    uschema, left_cols, right_pairs = _union_schema(
        lschema, rschema, left_on, right_on, suffix
    )
    lu = left.map_batches(
        _project_side(uschema, 0, left_on), batch_format="pyarrow"
    )
    ru = right.map_batches(
        _project_side(
            uschema, 1, right_on, rename={out: orig for orig, out in right_pairs}
        ),
        batch_format="pyarrow",
    )
    srt = lu.union(ru).sort([_KEY, _SIDE]).materialize()

    right_outs = [out for _, out in right_pairs]
    out_fields = [pa.field(left_on, uschema.field(_KEY).type)]
    out_fields += [pa.field(n, uschema.field(n).type) for n in left_cols]
    out_fields += [pa.field(n, uschema.field(n).type) for n in right_outs]
    out_schema = pa.schema(out_fields)

    def interior(tbl: pa.Table) -> pa.Table:
        tbl = _cast_block(tbl, uschema)
        if tbl.num_rows == 0:
            return out_schema.empty_table()
        k = tbl.column(_KEY).combine_chunks().to_numpy(zero_copy_only=False)
        inner = (k != k[0]) & (k != k[-1])
        if not inner.any():
            return out_schema.empty_table()
        return _join_runs(
            tbl.filter(pa.array(inner)), out_schema, left_on, left_cols, right_outs, how
        )

    main = srt.map_batches(interior, batch_format="pyarrow", batch_size=None)

    def edge_runs(tbl: pa.Table):
        if tbl.num_rows == 0 or _KEY not in tbl.schema.names:
            return None
        tbl = _cast_block(tbl, uschema)
        k = tbl.column(_KEY).combine_chunks().to_numpy(zero_copy_only=False)
        return tbl.filter(pa.array((k == k[0]) | (k == k[-1])))

    parts = [
        t for t in per_block_results(srt, edge_runs) if t is not None and t.num_rows
    ]
    if parts:
        # block order preserves the global (key, side) sort, so the
        # concatenation has each boundary key's rows contiguous and
        # side-ordered — directly joinable
        edge = pa.concat_tables(parts)
        check_boundary_size(edge.num_rows, "sort_merge_join")
        joined = _join_runs(edge, out_schema, left_on, left_cols, right_outs, how)
        if joined.num_rows:
            main = main.union(rd.from_arrow(joined))
    return main


# ------------------------------------------------------------ as-of join


def asof_join(
    probe: rd.Dataset,
    ref: rd.Dataset,
    *,
    by: str,
    ts_col: str = "ts_u",
    tie_col: str,
    value_cols: list[str],
    out_prefix: str = "asof_",
) -> rd.Dataset:
    """For every probe row, attach the latest reference row of the same
    ``by`` key with ``ref.ts <= probe.ts`` (DuckDB ``ASOF JOIN``
    semantics); among equal-``ts`` references the one with the largest
    ``tie_col`` wins, making the result deterministic.  Unmatched
    probes carry nulls.

    Plan: side-tagged union (ref=0 before probe=1 at equal ts, so a
    same-instant reference IS visible), ONE range sort by (by, ts,
    side, tie), then the two-wave distributed prefix scan — wave 1
    ships one carry summary per block (the block's trailing reference
    row), the driver runs an O(num_blocks) scan keyed by the sorted
    ``by`` order, wave 2 forward-fills each block from its carry-in.
    Probe/reference payloads never cross the driver."""
    carry_cols = [tie_col, *[c for c in value_cols if c != tie_col]]
    pschema, probe = _as_arrow(probe)
    rschema, ref = _as_arrow(ref)
    probe_cols = [n for n in pschema.names]
    clash = set(carry_cols) & {n for n in probe_cols if n not in (by, ts_col)}
    if clash:
        raise ValueError(
            f"probe payload columns clash with reference value columns: {sorted(clash)}"
        )
    fields = [
        pa.field(by, pschema.field(by).type),
        pa.field(ts_col, pa.int64()),
        pa.field(_SIDE, pa.int8()),
        pa.field(tie_col, rschema.field(tie_col).type),
    ]
    fields += [
        pa.field(c, rschema.field(c).type) for c in value_cols if c != tie_col
    ]
    fields += [
        pa.field(n, pschema.field(n).type)
        for n in probe_cols
        if n not in (by, ts_col)
    ]
    uschema = pa.schema(fields)
    srt = (
        probe.map_batches(_project_side(uschema, 1, by), batch_format="pyarrow")
        .union(ref.map_batches(_project_side(uschema, 0, by), batch_format="pyarrow"))
        .sort([by, ts_col, _SIDE, tie_col])
        .materialize()
    )

    # ---- wave 1: one carry summary per block
    def summarize(tbl: pa.Table):
        if tbl.num_rows == 0 or by not in tbl.schema.names:
            return None
        tbl = _cast_block(tbl, uschema)
        b = tbl.column(by).combine_chunks().to_numpy(zero_copy_only=False)
        side = batch_to_numpy(tbl, _SIDE)
        refs = np.flatnonzero(side == 0)
        last = None
        if len(refs):
            i = int(refs[-1])
            last = (
                b[i].item() if hasattr(b[i], "item") else b[i],
                {c: tbl.column(c)[i].as_py() for c in carry_cols},
            )
        first_by = b[0].item() if hasattr(b[0], "item") else b[0]
        last_by = b[-1].item() if hasattr(b[-1], "item") else b[-1]
        return (first_by, last_by, last)

    summaries = per_block_results(srt, summarize)

    # ---- driver scan: carry-in per block = latest reference row of the
    # block's LEADING key seen in earlier blocks (keys are sorted, so
    # only the immediately-continuing key can carry)
    carries: list[tuple | None] = []
    cur_by, cur_ref = None, None
    for s in summaries:
        if s is None:
            carries.append((cur_by, cur_ref))
            continue
        first_by, last_by, last = s
        carries.append((cur_by, cur_ref))
        if last is not None and last[0] == last_by:
            cur_by, cur_ref = last_by, last[1]
        elif first_by == last_by and cur_by == last_by:
            pass  # block adds no reference for the continuing key
        else:
            cur_by, cur_ref = last_by, None

    out_fields = [pa.field(by, uschema.field(by).type), pa.field(ts_col, pa.int64())]
    out_fields += [
        pa.field(n, uschema.field(n).type)
        for n in probe_cols
        if n not in (by, ts_col)
    ]
    out_fields += [pa.field(out_prefix + c, uschema.field(c).type) for c in carry_cols]
    out_schema = pa.schema(out_fields)

    def fill_block(tbl: pa.Table, carry_by, carry_vals) -> pa.Table:
        tbl = _coerce_block(tbl)
        if tbl.num_rows and by in tbl.schema.names:
            tbl = _cast_block(tbl, uschema)
        if tbl.num_rows == 0 or by not in tbl.schema.names:
            return out_schema.empty_table()
        b = tbl.column(by).combine_chunks().to_numpy(zero_copy_only=False)
        side = batch_to_numpy(tbl, _SIDE)
        m = len(b)
        idx = np.arange(m, dtype=np.int64)
        lastref = np.maximum.accumulate(np.where(side == 0, idx, -1))
        new = np.ones(m, bool)
        new[1:] = b[1:] != b[:-1]
        run_start = np.repeat(np.flatnonzero(new), np.diff(np.append(np.flatnonzero(new), m)))
        probe_pos = np.flatnonzero(side == 1)
        match = lastref[probe_pos]
        valid = match >= run_start[probe_pos]
        use_carry = (
            (~valid)
            & (run_start[probe_pos] == 0)
            & (carry_vals is not None)
            & (len(b) > 0 and carry_by == (b[0].item() if hasattr(b[0], "item") else b[0]))
        )
        take = pa.array(np.where(valid, match, 0), mask=~valid)
        cols = []
        probe_take = pa.array(probe_pos)
        for f in out_schema:
            if f.name.startswith(out_prefix) and f.name[len(out_prefix):] in carry_cols:
                src = f.name[len(out_prefix):]
                col = tbl.column(src).take(take)
                if use_carry.any():
                    import pyarrow.compute as pc

                    col = pc.if_else(
                        pa.array(use_carry),
                        pa.scalar(carry_vals[src], f.type),
                        col.combine_chunks().cast(f.type),
                    )
                cols.append(col)
            else:
                cols.append(tbl.column(f.name).take(probe_take))
        return pa.Table.from_arrays(cols, schema=out_schema)

    task = ray.remote(fill_block)
    refs = [
        task.remote(r, cb, cv)
        for r, (cb, cv) in zip(srt.to_arrow_refs(), carries)
    ]
    return rd.from_arrow_refs(refs)


def asof_join_forward(
    probe: rd.Dataset,
    ref: rd.Dataset,
    *,
    by: str,
    ts_col: str = "ts_u",
    tie_col: str,
    value_cols: list[str],
    out_prefix: str = "next_",
) -> rd.Dataset:
    """Forward as-of: for every probe row the EARLIEST same-``by``
    reference with ``ref.ts >= probe.ts`` (equal-ts refs visible; ties
    at the same ts break toward the largest ``tie_col``).  Implemented
    as :func:`asof_join` over negated timestamps — the backward scan's
    carry machinery is reused verbatim; only the ts column round-trips
    through negation."""

    def neg(col):
        def fn(b: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return b.set_column(
                b.schema.get_field_index(col),
                col,
                pc.negate_checked(b.column(col).cast(pa.int64())),
            )

        return fn

    _, probe = _as_arrow(probe)
    _, ref = _as_arrow(ref)
    out = asof_join(
        probe.map_batches(neg(ts_col), batch_format="pyarrow"),
        ref.map_batches(neg(ts_col), batch_format="pyarrow"),
        by=by,
        ts_col=ts_col,
        tie_col=tie_col,
        value_cols=value_cols,
        out_prefix=out_prefix,
    )
    return out.map_batches(neg(ts_col), batch_format="pyarrow")


# ------------------------------------------------------- broadcast join


def broadcast_join(
    big: rd.Dataset,
    lookup: pa.Table,
    *,
    on: str,
    lookup_on: str | None = None,
    value_cols: list[str] | None = None,
    fill: dict | None = None,
) -> rd.Dataset:
    """Left-join a small dimension table onto a big Dataset without any
    shuffle: the dimension's (sorted keys, value arrays) are ``ray.put``
    once and every fact batch probes them with one vectorized
    ``searchsorted``.  Misses become nulls (or ``fill[col]`` when
    given).  The classic 100-TB pattern for region/nation/vocab-sized
    sides — never ship the big side anywhere."""
    lookup_on = lookup_on if lookup_on is not None else on
    value_cols = (
        value_cols
        if value_cols is not None
        else [n for n in lookup.schema.names if n != lookup_on]
    )
    keys = lookup.column(lookup_on).combine_chunks().to_numpy(zero_copy_only=False)
    order = np.argsort(keys, kind="stable")
    if len(keys) and len(np.unique(keys)) != len(keys):
        raise ValueError("broadcast_join lookup keys must be unique")
    payload = {
        c: lookup.column(c).take(pa.array(order)).combine_chunks()
        for c in value_cols
    }
    types = {c: lookup.schema.field(c).type for c in value_cols}
    state = ray.put((keys[order], payload))
    fill = fill or {}

    def stage(b: pa.Table) -> pa.Table:
        sk, pay = ray.get(state)
        probe = b.column(on).combine_chunks().to_numpy(zero_copy_only=False)
        pos = np.searchsorted(sk, probe)
        pos_c = np.clip(pos, 0, max(len(sk) - 1, 0))
        hit = (len(sk) > 0) & (sk[pos_c] == probe) if len(sk) else np.zeros(len(probe), bool)
        out = b
        take = pa.array(pos_c, mask=~hit)
        for c in value_cols:
            col = pay[c].take(take)
            if c in fill:
                col = col.fill_null(fill[c]).cast(types[c])
            out = out.append_column(c, col)
        return out

    return big.map_batches(stage, batch_format="pyarrow")


# ------------------------------------------------------- interval join


def interval_join(
    big: rd.Dataset,
    intervals: pa.Table,
    *,
    on: str,
    start_col: str,
    end_col: str,
    value_cols: list[str] | None = None,
) -> rd.Dataset:
    """Range join: every big-side row matched to EVERY interval whose
    half-open ``[start, end)`` contains its ``on`` value (inner join —
    rows covered by no interval drop; a point under k overlapping
    intervals emits k rows).

    The interval side is the broadcast side (the realistic 100-TB
    shape: promo windows, IP-geo ranges, rate tables, incident
    windows).  Overlap is handled exactly with a staircase
    decomposition built ONCE on the driver: the interval endpoints cut
    the line into elementary segments, each segment's covering-interval
    list is laid out as one CSR, and the whole index is ``ray.put``
    once.  Every fact batch then probes with ONE ``searchsorted`` into
    the segment boundaries and fans out via CSR run arithmetic — no
    per-row Python, no shuffle of the big side, and cost O(log S +
    output) per row regardless of how the intervals overlap.  (A
    naive per-interval scan would be O(I) per row; a non-overlapping
    assumption would silently drop matches.)

    Index size is O(Σ per-interval segment span) = O(I²) worst case
    for fully nested intervals — fine for a broadcastable side; a
    big×big range join should shuffle both sides by coarse range
    buckets and apply this operator per bucket."""
    value_cols = (
        value_cols
        if value_cols is not None
        else [n for n in intervals.schema.names if n not in (start_col, end_col)]
    )
    s = intervals.column(start_col).combine_chunks().to_numpy(zero_copy_only=False)
    e = intervals.column(end_col).combine_chunks().to_numpy(zero_copy_only=False)
    if len(s) and (e <= s).any():
        raise ValueError("interval_join: every interval needs start < end")
    bounds = np.unique(np.concatenate([s, e])) if len(s) else np.empty(0, np.int64)
    # interval i is active on elementary segments [idx(s_i), idx(e_i))
    lo = np.searchsorted(bounds, s)
    hi = np.searchsorted(bounds, e)
    spans = hi - lo
    total = int(spans.sum())
    seg_of = (
        np.repeat(lo, spans)
        + np.arange(total, dtype=np.int64)
        - np.repeat(np.cumsum(spans) - spans, spans)
    )
    ivl_of = np.repeat(np.arange(len(s), dtype=np.int64), spans)
    # CSR over segments; interval order within a segment = interval
    # row order (stable), making the output deterministic
    order = np.argsort(seg_of, kind="stable")
    seg_sorted = seg_of[order]
    csr_vals = ivl_of[order]
    nseg = max(len(bounds) - 1, 0)
    csr_offsets = np.zeros(nseg + 1, np.int64)
    if total:
        np.add.at(csr_offsets, seg_sorted + 1, 1)
        csr_offsets = np.cumsum(csr_offsets)
    payload = {
        c: intervals.column(c).combine_chunks() for c in value_cols
    }
    state = ray.put((bounds, csr_offsets, csr_vals, payload))

    def stage(b: pa.Table) -> pa.Table:
        bounds_, offs, vals, pay = ray.get(state)
        t = b.column(on).combine_chunks().to_numpy(zero_copy_only=False)
        out_fields = list(b.schema) + [
            pa.field(c, pay[c].type) for c in value_cols
        ]
        out_schema = pa.schema(out_fields)
        if len(bounds_) < 2 or len(t) == 0:
            return out_schema.empty_table()
        seg = np.searchsorted(bounds_, t, side="right") - 1
        seg_c = np.clip(seg, 0, len(bounds_) - 2)
        inside = (seg >= 0) & (t < bounds_[-1])
        counts = np.where(inside, offs[seg_c + 1] - offs[seg_c], 0)
        tot = int(counts.sum())
        if tot == 0:
            return out_schema.empty_table()
        row_take = pa.array(np.repeat(np.arange(len(t), dtype=np.int64), counts))
        base = np.cumsum(counts) - counts
        pos = np.arange(tot, dtype=np.int64) - np.repeat(base, counts)
        ivl_take = pa.array(vals[np.repeat(offs[seg_c], counts) + pos])
        cols = [b.column(f.name).take(row_take) for f in b.schema]
        cols += [pay[c].take(ivl_take) for c in value_cols]
        return pa.Table.from_arrays(cols, schema=out_schema)

    return big.map_batches(stage, batch_format="pyarrow")


# ------------------------------------------------- partitioned windows


def running_window(
    ds: rd.Dataset,
    *,
    by: str,
    order_cols: list[str],
    val_col: str,
    out_sum: str = "run_total",
    out_lag: str = "prev",
    out_rn: str = "rn",
) -> rd.Dataset:
    """Partitioned window functions in one distributed pass: running
    sum, previous-row value (LAG), and row number of ``val_col`` within
    each ``by`` partition ordered by ``order_cols`` — i.e.
    ``SUM/LAG/ROW_NUMBER() OVER (PARTITION BY by ORDER BY order_cols)``.

    ONE range sort by (by, *order_cols), then the engine's two-wave
    distributed prefix scan: wave 1 reduces every block to one carry
    summary (its trailing partition's row count, value sum, and last
    value), the driver chains them in an O(num_blocks) scan, wave 2
    rewrites each block with its carry-in.  Row payloads never cross
    the driver.

    Exactness contract: with an integer ``val_col`` the running sum is
    bit-exact in any block layout (integer addition is associative);
    with floats the carry regrouping can differ from a sequential scan
    in the last ulp — quantize first (the engine's floor(x·10^6+½)
    convention) when the result must hash-match an oracle."""
    _, ds = _as_arrow(ds)
    schema, srt = _sorted_arrow(ds, [by, *order_cols])
    val_type = schema.field(val_col).type

    def summarize(tbl: pa.Table):
        if tbl.num_rows == 0 or by not in tbl.schema.names:
            return None
        b = tbl.column(by).combine_chunks().to_numpy(zero_copy_only=False)
        v = batch_to_numpy(tbl, val_col)
        tail = b == b[-1]
        n = int(tail.sum())
        first_by = b[0].item() if hasattr(b[0], "item") else b[0]
        last_by = b[-1].item() if hasattr(b[-1], "item") else b[-1]
        return (first_by, last_by, n, v[tail].sum().item(), v[-1].item())

    summaries = per_block_results(srt, summarize)

    carries: list[tuple] = []
    cur_by, cur_n, cur_sum, cur_last = None, 0, 0, None
    for s in summaries:
        carries.append((cur_by, cur_n, cur_sum, cur_last))
        if s is None:
            continue
        first_by, last_by, n, vsum, vlast = s
        if first_by == last_by and cur_by == last_by:
            cur_n, cur_sum, cur_last = cur_n + n, cur_sum + vsum, vlast
        else:
            cur_by, cur_n, cur_sum, cur_last = last_by, n, vsum, vlast

    out_schema = pa.schema(
        [*schema, pa.field(out_rn, pa.int64()), pa.field(out_sum, val_type),
         pa.field(out_lag, val_type)]
    )

    def fill_block(tbl: pa.Table, c_by, c_n, c_sum, c_last) -> pa.Table:
        tbl = _coerce_block(tbl)
        if tbl.num_rows == 0 or by not in tbl.schema.names:
            return out_schema.empty_table()
        b = tbl.column(by).combine_chunks().to_numpy(zero_copy_only=False)
        v = batch_to_numpy(tbl, val_col)
        m = len(b)
        new = np.ones(m, bool)
        new[1:] = b[1:] != b[:-1]
        starts = np.flatnonzero(new)
        run_start = np.repeat(starts, np.diff(np.append(starts, m)))
        cs = np.cumsum(v)
        base = cs[run_start] - v[run_start]
        running = cs - base
        rn = np.arange(m, dtype=np.int64) - run_start + 1
        lag = np.empty(m, v.dtype)
        lag[1:] = v[:-1]
        has_lag = np.ones(m, bool)
        has_lag[starts] = False
        first0 = b[0].item() if hasattr(b[0], "item") else b[0]
        if c_by is not None and c_by == first0:
            first_run = run_start == 0
            running[first_run] += c_sum
            rn[first_run] += c_n
            if c_last is not None:
                lag[0] = c_last
                has_lag[0] = True
        cols = [tbl.column(f.name) for f in schema]
        cols.append(pa.array(rn))
        cols.append(pa.array(running).cast(val_type))
        cols.append(pa.array(lag, mask=~has_lag).cast(val_type))
        return pa.Table.from_arrays(cols, schema=out_schema)

    task = ray.remote(fill_block)
    refs = [
        task.remote(r, *c) for r, c in zip(srt.to_arrow_refs(), carries)
    ]
    return rd.from_arrow_refs(refs)


# ----------------------------------------------------------- NTILE


def ntile(
    ds: rd.Dataset,
    *,
    order_cols: list[str],
    k: int,
    out_col: str = "bucket",
) -> rd.Dataset:
    """Global ``NTILE(k) OVER (ORDER BY order_cols)``: every row's
    1-based quantile bucket under a total order (make ``order_cols``
    unique — e.g. append the row id — so peers are deterministic).

    ONE distributed range sort; per-block row counts chain into global
    rank offsets on the driver (O(blocks) scalars), then each block
    assigns buckets with the exact SQL NTILE split (first ``n % k``
    buckets one row larger).  No row ever reaches the driver."""
    _, ds = _as_arrow(ds)
    schema, srt = _sorted_arrow(ds, order_cols)

    counts = per_block_results(srt, lambda t: t.num_rows)
    counts = [c or 0 for c in counts]
    n = int(sum(counts))
    offsets = np.concatenate([[0], np.cumsum(counts)])[:-1]
    q, r = divmod(n, k) if n else (0, 0)

    out_schema = pa.schema([*schema, pa.field(out_col, pa.int64())])

    def fill(tbl: pa.Table, off: int) -> pa.Table:
        tbl = _coerce_block(tbl)
        m = tbl.num_rows
        if m == 0:
            return out_schema.empty_table()
        rank = off + np.arange(1, m + 1, dtype=np.int64)
        cut = r * (q + 1)
        if q == 0:
            bucket = rank  # n < k: row i lands in bucket i
        else:
            bucket = np.where(
                rank <= cut,
                -(-rank // (q + 1)),
                r + (-(-(rank - cut) // q)),
            )
        cols = [tbl.column(f.name) for f in schema]
        cols.append(pa.array(bucket.astype(np.int64)))
        return pa.Table.from_arrays(cols, schema=out_schema)

    task = ray.remote(fill)
    refs = [
        task.remote(b, int(o)) for b, o in zip(srt.to_arrow_refs(), offsets)
    ]
    return rd.from_arrow_refs(refs)


def global_ranks(
    ds: rd.Dataset,
    *,
    order_cols: list[str],
    out_col: str = "rn",
) -> rd.Dataset:
    """Dense 1-based global row numbers under a total order —
    ``ROW_NUMBER() OVER (ORDER BY order_cols)`` (make the order unique
    for determinism).  One range sort; per-block counts chain into
    rank offsets on the driver (O(blocks) scalars)."""
    _, ds = _as_arrow(ds)
    schema, srt = _sorted_arrow(ds, order_cols)
    counts = [c or 0 for c in per_block_results(srt, lambda t: t.num_rows)]
    offsets = np.concatenate([[0], np.cumsum(counts)])[:-1]
    out_schema = pa.schema([*schema, pa.field(out_col, pa.int64())])

    def fill(tbl: pa.Table, off: int) -> pa.Table:
        tbl = _coerce_block(tbl)
        m = tbl.num_rows
        if m == 0:
            return out_schema.empty_table()
        cols = [tbl.column(f.name) for f in schema]
        cols.append(pa.array(off + np.arange(1, m + 1, dtype=np.int64)))
        return pa.Table.from_arrays(cols, schema=out_schema)

    task = ray.remote(fill)
    refs = [task.remote(b, int(o)) for b, o in zip(srt.to_arrow_refs(), offsets)]
    return rd.from_arrow_refs(refs)


# ------------------------------------------- range-frame sliding window


def sliding_window_agg(
    ds: rd.Dataset,
    *,
    by: str,
    ts_col: str,
    val_col: str,
    window: int,
    tie_col: str,
    out_cnt: str = "w_cnt",
    out_sum: str = "w_sum",
) -> rd.Dataset:
    """Time-windowed aggregate: for every row, COUNT and SUM of the
    same-``by`` rows whose ``ts`` lies in ``[ts − window, ts]`` — SQL's
    ``COUNT/SUM(val) OVER (PARTITION BY by ORDER BY ts RANGE BETWEEN
    window PRECEDING AND CURRENT ROW)``, equal-``ts`` peer rows
    included on BOTH sides of the current row exactly as the RANGE
    frame demands.

    Plan: ONE range sort by (by, ts, tie), then per block a fully
    vectorized windowed scan — per-partition runs get a disjoint
    integer offset so a single global ``searchsorted`` resolves every
    row's window bounds at once, and window sums come from one prefix
    array.  Two bounded carries stitch the block edges:

    * backward: each block ships its trailing partition's rows inside
      ``window`` of the block's last ts (only those can matter to later
      rows); the driver chains them per continuing partition in an
      O(num_blocks) scan (``check_boundary_size``-guarded — a window
      denser than a block is the documented degradation).
    * forward: equal-``ts`` peers that spill into later blocks (the
      RANGE frame includes them) are reduced to one (count, sum) pair
      per block head and chained in a reverse driver scan — O(blocks)
      scalars, never rows.

    ``val_col`` should be integer (the engine's micro-unit convention)
    so sums are bit-exact in any layout."""
    _, ds = _as_arrow(ds)
    schema, srt = _sorted_arrow(ds, [by, ts_col, tie_col])
    if not pa.types.is_integer(schema.field(ts_col).type):
        raise ValueError("sliding_window_agg needs an integer ts column")
    window = int(window)

    def summarize(tbl: pa.Table):
        if tbl.num_rows == 0 or by not in tbl.schema.names:
            return None
        b = tbl.column(by).combine_chunks().to_numpy(zero_copy_only=False)
        t = batch_to_numpy(tbl, ts_col)
        v = batch_to_numpy(tbl, val_col)
        # >= : the RANGE frame is CLOSED at ts - window, so a row at
        # exactly last_ts - window can still matter to later rows
        tail = (b == b[-1]) & (t >= t[-1] - window)
        lead = (b == b[0]) & (t == t[0])
        single = bool((b == b[0]).all() and (t == t[0]).all())
        return (
            b[0].item() if hasattr(b[0], "item") else b[0],
            int(t[0]),
            b[-1].item() if hasattr(b[-1], "item") else b[-1],
            int(t[-1]),
            t[tail].copy(),
            v[tail].copy(),
            int(lead.sum()),
            int(v[lead].sum()),
            single,
        )

    summaries = per_block_results(srt, summarize)

    # backward chain: carry-in rows per block (trailing same-partition
    # rows of earlier blocks still inside the window)
    back: list[tuple] = []
    buf_by, buf_ts, buf_val = None, np.empty(0, np.int64), np.empty(0, np.int64)
    for s in summaries:
        if s is None:
            back.append((None, buf_ts[:0], buf_val[:0]))
            continue
        first_by, _first_ts, last_by, last_ts, tts, tvs, _lc, _ls, _single = s
        if buf_by is not None and buf_by == first_by:
            back.append((buf_by, buf_ts, buf_val))
        else:
            back.append((None, buf_ts[:0], buf_val[:0]))
        if buf_by is not None and buf_by == last_by:
            buf_ts = np.concatenate([buf_ts, tts.astype(np.int64)])
            buf_val = np.concatenate([buf_val, tvs.astype(np.int64)])
        else:
            buf_ts = tts.astype(np.int64)
            buf_val = tvs.astype(np.int64)
        buf_by = last_by
        keep = buf_ts >= last_ts - window
        buf_ts, buf_val = buf_ts[keep], buf_val[keep]
        check_boundary_size(len(buf_ts), "sliding_window_agg")

    # forward chain (reverse): equal-ts peers at the head of the suffix
    fwd: list[tuple] = [()] * len(summaries)
    lead = None  # (by, ts, cnt, sum) of the next blocks' leading peers
    for i in range(len(summaries) - 1, -1, -1):
        s = summaries[i]
        if s is None:
            fwd[i] = (0, 0)
            continue
        first_by, first_ts, last_by, last_ts, _t, _v, lc, ls, single = s
        if lead is not None and lead[0] == last_by and lead[1] == last_ts:
            fwd[i] = (lead[2], lead[3])
        else:
            fwd[i] = (0, 0)
        cnt, tot = lc, ls
        if single and lead is not None and lead[0] == first_by and lead[1] == first_ts:
            cnt += lead[2]
            tot += lead[3]
        lead = (first_by, first_ts, cnt, tot)

    out_schema = pa.schema(
        [*schema, pa.field(out_cnt, pa.int64()), pa.field(out_sum, pa.int64())]
    )

    def fill_block(
        tbl: pa.Table, c_by, c_ts, c_val, f_cnt: int, f_sum: int
    ) -> pa.Table:
        tbl = _coerce_block(tbl)
        if tbl.num_rows == 0 or by not in tbl.schema.names:
            return out_schema.empty_table()
        b = tbl.column(by).combine_chunks().to_numpy(zero_copy_only=False)
        t = batch_to_numpy(tbl, ts_col).astype(np.int64)
        v = batch_to_numpy(tbl, val_col).astype(np.int64)
        m = len(b)
        new = np.ones(m, bool)
        new[1:] = b[1:] != b[:-1]
        run_id = np.cumsum(new) - 1
        # disjoint per-run offsets → ONE global searchsorted resolves
        # every row's [ts − window, ts] bounds
        span = np.int64(int(t.max()) - int(t.min()) + window + 2)
        adj = run_id * span + (t - t.min())
        lo = np.searchsorted(adj, run_id * span + (t - t.min() - window), side="left")
        hi = np.searchsorted(adj, adj, side="right")
        cs = np.concatenate([[0], np.cumsum(v)])
        cnt = (hi - lo).astype(np.int64)
        tot = cs[hi] - cs[lo]
        first0 = b[0].item() if hasattr(b[0], "item") else b[0]
        if c_by is not None and c_by == first0 and len(c_ts):
            first_run = run_id == 0
            idx = np.searchsorted(c_ts, t[first_run] - window, side="left")
            suf = np.concatenate([np.cumsum(c_val[::-1])[::-1], [0]])
            cnt[first_run] += len(c_ts) - idx
            tot[first_run] += suf[idx]
        if f_cnt:
            peers = (b == b[-1]) & (t == t[-1])
            cnt[peers] += f_cnt
            tot[peers] += f_sum
        cols = [tbl.column(f.name) for f in schema]
        cols.append(pa.array(cnt))
        cols.append(pa.array(tot))
        return pa.Table.from_arrays(cols, schema=out_schema)

    task = ray.remote(fill_block)
    refs = [
        task.remote(r, cb, cts, cv, fc, fs)
        for r, (cb, cts, cv), (fc, fs) in zip(srt.to_arrow_refs(), back, fwd)
    ]
    return rd.from_arrow_refs(refs)


def grouped_ntile(
    ds: rd.Dataset,
    *,
    group_col: str,
    order_cols: list[str],
    k: int,
    out_col: str = "bucket",
) -> rd.Dataset:
    """``NTILE(k) OVER (PARTITION BY group_col ORDER BY order_cols)``
    — the per-group quantile bucketing of CCNet-style perplexity
    partitioning (make ``order_cols`` unique within a group so peers
    are deterministic).

    ONE range sort by (group, *order); per-block (group, run-length)
    summaries chain into per-run in-group offsets and group totals on
    the driver (O(blocks + groups) scalars — the grouped twin of
    :func:`ntile`); each block then assigns buckets with the exact
    SQL NTILE split (first ``n % k`` buckets one row larger). No row
    ever reaches the driver."""
    import pyarrow.compute as pc

    _, ds = _as_arrow(ds)
    schema, srt = _sorted_arrow(ds, [group_col, *order_cols])

    def runs(tbl: pa.Table):
        tbl = _coerce_block(tbl)
        if tbl.num_rows == 0:
            return None
        g = tbl.column(group_col).combine_chunks()
        new = np.concatenate(
            [[True], ~pc.equal(g.slice(1), g.slice(0, len(g) - 1)).to_numpy(zero_copy_only=False)]
        )
        starts = np.flatnonzero(new)
        lens = np.diff(np.append(starts, len(g)))
        return g.take(pa.array(starts)).to_pylist(), starts, lens

    parts = per_block_results(srt, runs)
    totals: dict = {}
    metas = []
    for p in parts:
        if p is None:
            metas.append(None)
            continue
        gv, starts, lens = p
        offs = []
        for g_, l in zip(gv, lens):
            offs.append(totals.get(g_, 0))
            totals[g_] = offs[-1] + int(l)
        metas.append((gv, starts, lens, offs))

    out_schema = pa.schema([*schema, pa.field(out_col, pa.int64())])

    def fill(tbl: pa.Table, starts, lens, offs, ngs) -> pa.Table:
        tbl = _coerce_block(tbl)
        m = tbl.num_rows
        if m == 0:
            return out_schema.empty_table()
        starts = np.asarray(starts, np.int64)
        lens = np.asarray(lens, np.int64)
        within = np.arange(m, dtype=np.int64) - np.repeat(starts, lens)
        rank = np.repeat(np.asarray(offs, np.int64), lens) + within + 1
        ng = np.repeat(np.asarray(ngs, np.int64), lens)
        q = ng // k
        r = ng % k
        cut = r * (q + 1)
        qs = np.maximum(q, 1)  # q == 0 branch never reads these divisions
        bucket = np.where(
            q == 0,
            rank,
            np.where(rank <= cut, -(-rank // (q + 1)), r + (-(-(rank - cut) // qs))),
        )
        cols = [tbl.column(f.name) for f in schema]
        cols.append(pa.array(bucket.astype(np.int64)))
        return pa.Table.from_arrays(cols, schema=out_schema)

    task = ray.remote(fill)
    refs = []
    for b, meta in zip(srt.to_arrow_refs(), metas):
        if meta is None:
            continue
        gv, starts, lens, offs = meta
        refs.append(task.remote(b, starts, lens, offs, [totals[g_] for g_ in gv]))
    if not refs:
        return rd.from_arrow(out_schema.empty_table())
    return rd.from_arrow_refs(refs)


def grouped_rank(
    ds: rd.Dataset,
    *,
    group_col: str,
    order_cols: list[str],
    out_col: str = "rank",
) -> rd.Dataset:
    """``ROW_NUMBER() OVER (PARTITION BY group_col ORDER BY
    order_cols)`` — the same one-sort / per-run-offset skeleton as
    :func:`grouped_ntile`, emitting the 1-based in-group rank."""
    import pyarrow.compute as pc

    _, ds = _as_arrow(ds)
    schema, srt = _sorted_arrow(ds, [group_col, *order_cols])

    def runs(tbl: pa.Table):
        tbl = _coerce_block(tbl)
        if tbl.num_rows == 0:
            return None
        g = tbl.column(group_col).combine_chunks()
        new = np.concatenate(
            [[True], ~pc.equal(g.slice(1), g.slice(0, len(g) - 1)).to_numpy(zero_copy_only=False)]
        )
        starts = np.flatnonzero(new)
        lens = np.diff(np.append(starts, len(g)))
        return g.take(pa.array(starts)).to_pylist(), starts, lens

    parts = per_block_results(srt, runs)
    totals: dict = {}
    metas = []
    for p in parts:
        if p is None:
            metas.append(None)
            continue
        gv, starts, lens = p
        offs = []
        for g_, l in zip(gv, lens):
            offs.append(totals.get(g_, 0))
            totals[g_] = offs[-1] + int(l)
        metas.append((starts, lens, offs))

    out_schema = pa.schema([*schema, pa.field(out_col, pa.int64())])

    def fill(tbl: pa.Table, starts, lens, offs) -> pa.Table:
        tbl = _coerce_block(tbl)
        m = tbl.num_rows
        if m == 0:
            return out_schema.empty_table()
        starts = np.asarray(starts, np.int64)
        lens = np.asarray(lens, np.int64)
        within = np.arange(m, dtype=np.int64) - np.repeat(starts, lens)
        rank = np.repeat(np.asarray(offs, np.int64), lens) + within + 1
        cols = [tbl.column(f.name) for f in schema]
        cols.append(pa.array(rank))
        return pa.Table.from_arrays(cols, schema=out_schema)

    task = ray.remote(fill)
    refs = [
        task.remote(b, *meta)
        for b, meta in zip(srt.to_arrow_refs(), metas)
        if meta is not None
    ]
    if not refs:
        return rd.from_arrow(out_schema.empty_table())
    return rd.from_arrow_refs(refs)
