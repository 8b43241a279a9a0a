"""Relational join operators (data_ops/relational.py): distributed
sort-merge equi-join, as-of join, broadcast dimension join — checked
against pandas references across adversarial block layouts (hot keys
spanning blocks, carries across many blocks, empty sides)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from llama_ray.data_ops.relational import asof_join, broadcast_join, sort_merge_join


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _assert_frame_match(ours: pd.DataFrame, exp: pd.DataFrame):
    ours, exp = _norm(ours), _norm(exp)
    assert list(ours.columns) == list(exp.columns)
    assert len(ours) == len(exp)
    for c in ours.columns:
        a, b = ours[c].to_numpy(), exp[c].to_numpy()
        if a.dtype.kind in "fO" and (
            a.dtype.kind == "f" or any(isinstance(x, float) for x in a[:5])
        ):
            assert np.allclose(
                a.astype(np.float64), b.astype(np.float64), equal_nan=True
            ), c
        else:
            assert np.array_equal(a, b), c


def _pandas_join(L, R, how):
    return L.merge(R.rename(columns={"rk": "k", "lv": "lv_r"}), on="k", how=how)


def test_sort_merge_join_matches_pandas_both_hows(ray_session):
    rng = np.random.default_rng(11)
    L = pd.DataFrame({"k": rng.integers(0, 40, 500), "lv": rng.normal(size=500)})
    # right has keys absent on the left and vice versa + duplicate keys
    R = pd.DataFrame(
        {
            "rk": rng.integers(10, 60, 300),
            "rv": rng.integers(0, 9, 300),
            "lv": rng.normal(size=300),  # name clash → suffixed
        }
    )
    for nl, nr in [(1, 1), (9, 5), (23, 17)]:
        lds = rd.from_pandas(L).repartition(nl)
        rds = rd.from_pandas(R).repartition(nr)
        for how in ("inner", "left"):
            out = sort_merge_join(
                lds, rds, left_on="k", right_on="rk", how=how
            ).to_pandas()
            _assert_frame_match(out, _pandas_join(L, R, how))


def test_sort_merge_join_hot_key_spanning_blocks(ray_session):
    """One key owns 70% of both sides — its run spans many sorted
    blocks and is resolved entirely in the boundary pass."""
    rng = np.random.default_rng(3)
    kl = np.where(rng.random(400) < 0.7, 7, rng.integers(0, 20, 400))
    kr = np.where(rng.random(150) < 0.7, 7, rng.integers(0, 20, 150))
    L = pd.DataFrame({"k": kl, "lv": np.arange(400)})
    R = pd.DataFrame({"rk": kr, "rv": np.arange(150)})
    out = sort_merge_join(
        rd.from_pandas(L).repartition(13),
        rd.from_pandas(R).repartition(9),
        left_on="k",
        right_on="rk",
        how="inner",
    ).to_pandas()
    exp = L.merge(R.rename(columns={"rk": "k"}), on="k")
    _assert_frame_match(out, exp)
    # the hot pair count is the product of the two hot sides
    assert (out["k"] == 7).sum() == int((kl == 7).sum()) * int((kr == 7).sum())


def test_sort_merge_join_string_keys_and_empty_side(ray_session):
    L = pd.DataFrame({"k": ["a", "b", "b", "c"], "lv": [1, 2, 3, 4]})
    R = pd.DataFrame({"k": ["b", "c", "c", "d"], "rv": [10, 20, 30, 40]})
    out = sort_merge_join(
        rd.from_pandas(L), rd.from_pandas(R), left_on="k", how="left"
    ).to_pandas()
    exp = L.merge(R, on="k", how="left")
    _assert_frame_match(out, exp)
    # empty right side: inner join → 0 rows, left join → left preserved
    empty = rd.from_arrow(pa.table({"k": pa.array([], pa.string()), "rv": pa.array([], pa.int64())}))
    assert sort_merge_join(rd.from_pandas(L), empty, left_on="k", how="inner").count() == 0
    lo = sort_merge_join(rd.from_pandas(L), empty, left_on="k", how="left").to_pandas()
    assert len(lo) == len(L) and lo["rv"].isna().all()


def _brute_asof(P, Rf):
    rid, val = [], []
    for _, row in P.iterrows():
        c = Rf[(Rf.u == row.u) & (Rf.ts_u <= row.ts_u)]
        if len(c):
            c = c.sort_values(["ts_u", "rid"]).iloc[-1]
            rid.append(float(c.rid))
            val.append(float(c.val))
        else:
            rid.append(np.nan)
            val.append(np.nan)
    E = P.copy()
    E["asof_rid"], E["asof_val"] = rid, val
    return E


def test_asof_join_matches_brute_force_across_layouts(ray_session):
    rng = np.random.default_rng(5)
    P = pd.DataFrame(
        {
            "u": rng.integers(0, 6, 200),
            "ts_u": rng.integers(0, 300, 200),  # dense ts → plenty of ties
            "pid": np.arange(200),
        }
    )
    Rf = pd.DataFrame(
        {
            "u": rng.integers(0, 6, 150),
            "ts_u": rng.integers(0, 300, 150),
            "rid": np.arange(150),
            "val": rng.normal(size=150),
        }
    )
    E = _brute_asof(P, Rf)
    for nb in (1, 8, 31):
        out = asof_join(
            rd.from_pandas(P).repartition(nb),
            rd.from_pandas(Rf).repartition(max(nb // 2, 1)),
            by="u",
            ts_col="ts_u",
            tie_col="rid",
            value_cols=["rid", "val"],
        ).to_pandas()
        out = out.sort_values("pid").reset_index(drop=True)
        assert len(out) == len(P)
        assert np.allclose(
            out["asof_rid"].astype(float), E["asof_val"].notna() * 0 + E["asof_rid"], equal_nan=True
        )
        assert np.allclose(out["asof_val"].astype(float), E["asof_val"], equal_nan=True)


def test_asof_join_carry_spans_many_blocks(ray_session):
    """One user's single early reference must forward-fill probes that
    live many sorted blocks later (the driver prefix-scan path)."""
    P = pd.DataFrame(
        {"u": np.zeros(500, np.int64), "ts_u": np.arange(100, 600), "pid": np.arange(500)}
    )
    Rf = pd.DataFrame(
        {"u": [0, 0], "ts_u": [50, 40], "rid": [1, 2], "val": [3.5, 9.9]}
    )
    out = asof_join(
        rd.from_pandas(P).repartition(25),
        rd.from_pandas(Rf),
        by="u",
        ts_col="ts_u",
        tie_col="rid",
        value_cols=["rid", "val"],
    ).to_pandas()
    # ts=50 (rid 1) is the latest ≤ every probe — fills ALL 500
    assert (out["asof_rid"] == 1).all()
    assert np.allclose(out["asof_val"], 3.5)
    # probes before any reference stay null
    P2 = pd.DataFrame({"u": [0, 0], "ts_u": [10, 49], "pid": [0, 1]})
    out2 = asof_join(
        rd.from_pandas(P2),
        rd.from_pandas(Rf),
        by="u",
        ts_col="ts_u",
        tie_col="rid",
        value_cols=["rid", "val"],
    ).to_pandas()
    o2 = out2.sort_values("pid")
    assert o2["asof_rid"].isna().tolist() == [True, False]


def test_asof_join_equal_ts_reference_is_visible(ray_session):
    """probe.ts == ref.ts matches (ASOF uses <=), and among equal-ts
    refs the largest tie id wins."""
    P = pd.DataFrame({"u": [1], "ts_u": [100], "pid": [0]})
    Rf = pd.DataFrame(
        {"u": [1, 1, 1], "ts_u": [100, 100, 99], "rid": [5, 7, 9], "val": [1.0, 2.0, 3.0]}
    )
    out = asof_join(
        rd.from_pandas(P),
        rd.from_pandas(Rf),
        by="u",
        ts_col="ts_u",
        tie_col="rid",
        value_cols=["rid", "val"],
    ).to_pandas()
    assert out["asof_rid"].tolist() == [7] and out["asof_val"].tolist() == [2.0]


def test_broadcast_join_misses_and_fill(ray_session):
    lk = pa.table({"kk": np.array([1, 2, 5], np.int64), "name": ["a", "b", "e"]})
    big = rd.from_pandas(
        pd.DataFrame({"kk": np.array([0, 1, 2, 3, 5, 6] * 20, np.int64)})
    ).repartition(4)
    out = broadcast_join(big, lk, on="kk").to_pandas()
    assert out[out.kk == 1]["name"].eq("a").all()
    assert out[out.kk == 3]["name"].isna().all()
    filled = broadcast_join(big, lk, on="kk", fill={"name": "?"}).to_pandas()
    assert filled[filled.kk == 0]["name"].eq("?").all()
    # duplicate lookup keys must be rejected (lossy join otherwise)
    dup = pa.table({"kk": np.array([1, 1], np.int64), "name": ["a", "b"]})
    import pytest

    with pytest.raises(ValueError):
        broadcast_join(big, dup, on="kk")


def _pandas_window(df):
    d = df.sort_values(["u", "ts_u", "oid"]).reset_index(drop=True)
    g = d.groupby("u")["v"]
    d["rn"] = g.cumcount() + 1
    d["run_total"] = g.cumsum()
    d["prev"] = g.shift(1)
    return d


def test_running_window_matches_pandas_across_layouts(ray_session):
    from llama_ray.data_ops.relational import running_window

    rng = np.random.default_rng(13)
    df = pd.DataFrame(
        {
            "u": rng.integers(0, 7, 400),
            "ts_u": rng.integers(0, 500, 400),
            "oid": np.arange(400),
            "v": rng.integers(-50, 200, 400),
        }
    )
    E = _pandas_window(df)
    for nb in (1, 9, 37):
        out = (
            running_window(
                rd.from_pandas(df).repartition(nb),
                by="u",
                order_cols=["ts_u", "oid"],
                val_col="v",
            )
            .to_pandas()
            .sort_values(["u", "ts_u", "oid"])
            .reset_index(drop=True)
        )
        assert np.array_equal(out["rn"].to_numpy(), E["rn"].to_numpy()), nb
        assert np.array_equal(out["run_total"].to_numpy(), E["run_total"].to_numpy()), nb
        assert np.allclose(
            out["prev"].astype(float), E["prev"].astype(float), equal_nan=True
        ), nb


def test_running_window_single_partition_many_blocks(ray_session):
    """One partition spanning 25 blocks: every block needs the carry
    chain (count, sum, last value) from ALL earlier blocks."""
    from llama_ray.data_ops.relational import running_window

    n = 1000
    df = pd.DataFrame(
        {"u": np.zeros(n, np.int64), "ts_u": np.arange(n), "oid": np.arange(n),
         "v": np.ones(n, np.int64)}
    )
    out = (
        running_window(
            rd.from_pandas(df).repartition(25),
            by="u",
            order_cols=["ts_u", "oid"],
            val_col="v",
        )
        .to_pandas()
        .sort_values("ts_u")
        .reset_index(drop=True)
    )
    assert np.array_equal(out["rn"].to_numpy(), np.arange(1, n + 1))
    assert np.array_equal(out["run_total"].to_numpy(), np.arange(1, n + 1))
    assert np.isnan(out["prev"].iloc[0]) and (out["prev"].iloc[1:] == 1).all()


def test_sort_merge_join_semi_anti_match_pandas(ray_session):
    rng = np.random.default_rng(5)
    L = pd.DataFrame(
        {
            "k": rng.integers(0, 50, 400),
            "lv": rng.normal(size=400),
            "tag": [f"t{i % 7}" for i in range(400)],
        }
    )
    # right overlaps [20, 70): keys < 20 are anti, >= 20 mostly semi;
    # right payload should be ignored entirely (projected off pre-shuffle)
    R = pd.DataFrame({"rk": rng.integers(20, 70, 250), "rv": rng.normal(size=250)})
    present = set(R["rk"])
    semi_exp = L[L["k"].isin(present)]
    anti_exp = L[~L["k"].isin(present)]
    assert len(semi_exp) and len(anti_exp)  # both modes exercised
    for nl, nr in [(1, 1), (9, 5), (23, 17)]:
        lds = rd.from_pandas(L).repartition(nl)
        rds = rd.from_pandas(R).repartition(nr)
        semi = sort_merge_join(lds, rds, left_on="k", right_on="rk", how="semi").to_pandas()
        anti = sort_merge_join(lds, rds, left_on="k", right_on="rk", how="anti").to_pandas()
        _assert_frame_match(semi, semi_exp)
        _assert_frame_match(anti, anti_exp)
        assert len(semi) + len(anti) == len(L)


def test_sort_merge_join_anti_hot_key_and_empty_right(ray_session):
    # one key fills whole blocks on the right; left dupes preserved
    L = pd.DataFrame({"k": [1, 1, 2, 3, 3, 3], "lv": range(6)})
    R = pd.DataFrame({"rk": np.full(5000, 3), "rv": np.arange(5000)})
    anti = sort_merge_join(
        rd.from_pandas(L).repartition(3),
        rd.from_pandas(R).repartition(11),
        left_on="k",
        right_on="rk",
        how="anti",
    ).to_pandas()
    _assert_frame_match(anti, L[L["k"] != 3])
    semi = sort_merge_join(
        rd.from_pandas(L).repartition(2),
        rd.from_pandas(R).repartition(7),
        left_on="k",
        right_on="rk",
        how="semi",
    ).to_pandas()
    _assert_frame_match(semi, L[L["k"] == 3])  # each left dup once, no expansion
    # empty right: anti keeps everything
    anti_all = sort_merge_join(
        rd.from_pandas(L), rd.from_arrow(pa.table({"rk": pa.array([], pa.int64())})),
        left_on="k", right_on="rk", how="anti",
    ).to_pandas()
    _assert_frame_match(anti_all, L)


def test_sort_merge_join_full_outer_matches_pandas(ray_session):
    rng = np.random.default_rng(21)
    # both sides have exclusive keys and duplicate keys
    L = pd.DataFrame({"k": rng.integers(0, 40, 300), "lv": rng.normal(size=300)})
    R = pd.DataFrame({"rk": rng.integers(20, 60, 200), "rv": rng.integers(0, 9, 200)})
    exp = L.merge(R.rename(columns={"rk": "k"}), on="k", how="outer")
    assert exp["lv"].isna().any() and exp["rv"].isna().any()  # both sides exercised
    for nl, nr in [(1, 1), (9, 5), (23, 17)]:
        out = sort_merge_join(
            rd.from_pandas(L).repartition(nl),
            rd.from_pandas(R).repartition(nr),
            left_on="k",
            right_on="rk",
            how="outer",
        ).to_pandas()
        _assert_frame_match(out, exp)


# ----------------------------------------------------- interval join


def _brute_interval(points: pd.DataFrame, ivls: pd.DataFrame) -> pd.DataFrame:
    rows = []
    for _, p in points.iterrows():
        for _, i in ivls.iterrows():
            if i["s"] <= p["t"] < i["e"]:
                rows.append({**p.to_dict(), "ivl_id": i["ivl_id"], "tag": i["tag"]})
    cols = [*points.columns, "ivl_id", "tag"]
    return pd.DataFrame(rows, columns=cols) if rows else pd.DataFrame(columns=cols)


def test_interval_join_overlapping_nested_matches_brute_force(ray_session):
    from llama_ray.data_ops.relational import interval_join

    rng = np.random.default_rng(5)
    P = pd.DataFrame(
        {
            "pid": np.arange(400),
            "t": rng.integers(-20, 220, 400).astype(np.int64),
        }
    )
    # overlapping, nested, duplicate, and point-adjacent intervals
    s = np.array([0, 10, 10, 15, 50, 50, 60, 100, 199, -5], np.int64)
    e = np.array([100, 30, 30, 18, 70, 200, 61, 101, 200, 0], np.int64)
    ivls = pd.DataFrame(
        {"s": s, "e": e, "ivl_id": np.arange(len(s), dtype=np.int64),
         "tag": [f"i{j}" for j in range(len(s))]}
    )
    exp = _brute_interval(P, ivls)
    itbl = pa.table(
        {"w_s": s, "w_e": e, "ivl_id": ivls["ivl_id"].to_numpy(),
         "tag": ivls["tag"].tolist()}
    )
    for nb in (1, 7, 31):
        out = interval_join(
            rd.from_pandas(P).repartition(nb), itbl,
            on="t", start_col="w_s", end_col="w_e",
        ).to_pandas()
        _assert_frame_match(out, exp)


def test_interval_join_empty_and_invalid(ray_session):
    import pytest

    from llama_ray.data_ops.relational import interval_join

    P = pd.DataFrame({"pid": np.arange(5), "t": np.arange(5, dtype=np.int64)})
    empty = pa.table(
        {"w_s": pa.array([], pa.int64()), "w_e": pa.array([], pa.int64()),
         "ivl_id": pa.array([], pa.int64())}
    )
    out = interval_join(
        rd.from_pandas(P), empty, on="t", start_col="w_s", end_col="w_e"
    ).to_pandas()
    assert len(out) == 0
    bad = pa.table(
        {"w_s": pa.array([3], pa.int64()), "w_e": pa.array([3], pa.int64()),
         "ivl_id": pa.array([0], pa.int64())}
    )
    with pytest.raises(ValueError):
        interval_join(rd.from_pandas(P), bad, on="t", start_col="w_s", end_col="w_e")


# --------------------------------------------- range-frame sliding window


def _brute_sliding(df: pd.DataFrame, W: int) -> pd.DataFrame:
    out = df.copy()
    cnt, tot = [], []
    for _, r in df.iterrows():
        m = (df["u"] == r["u"]) & (df["t"] >= r["t"] - W) & (df["t"] <= r["t"])
        cnt.append(int(m.sum()))
        tot.append(int(df.loc[m, "v"].sum()))
    out["w_cnt"] = np.array(cnt, np.int64)
    out["w_sum"] = np.array(tot, np.int64)
    return out


def test_sliding_window_agg_matches_brute_force_layouts(ray_session):
    from llama_ray.data_ops.relational import sliding_window_agg

    rng = np.random.default_rng(17)
    n = 600
    df = pd.DataFrame(
        {
            "rid": np.arange(n, dtype=np.int64),
            "u": rng.integers(0, 12, n).astype(np.int64),
            "t": rng.integers(0, 500, n).astype(np.int64),
            "v": rng.integers(-5, 50, n).astype(np.int64),
        }
    )
    # planted equal-ts peer pile-up (forces forward-peer handling when
    # the sort splits it across blocks)
    df.loc[df.index[:40], ["u", "t"]] = [3, 250]
    exp = _brute_sliding(df, 60)
    for nb in (1, 9, 64):
        out = sliding_window_agg(
            rd.from_pandas(df).repartition(nb),
            by="u", ts_col="t", val_col="v", window=60, tie_col="rid",
            out_cnt="w_cnt", out_sum="w_sum",
        ).to_pandas()
        _assert_frame_match(out, exp)


def test_sliding_window_agg_window_wider_than_blocks(ray_session):
    """One user's run spans many blocks and the window covers all of
    them — the backward carry must chain across every boundary."""
    from llama_ray.data_ops.relational import sliding_window_agg

    n = 300
    df = pd.DataFrame(
        {
            "rid": np.arange(n, dtype=np.int64),
            "u": np.zeros(n, np.int64),
            "t": np.arange(n, dtype=np.int64),
            "v": np.ones(n, np.int64),
        }
    )
    exp = _brute_sliding(df, 10_000)
    out = sliding_window_agg(
        rd.from_pandas(df).repartition(25),
        by="u", ts_col="t", val_col="v", window=10_000, tie_col="rid",
        out_cnt="w_cnt", out_sum="w_sum",
    ).to_pandas()
    _assert_frame_match(out, exp)
    assert (exp["w_cnt"].to_numpy() == np.arange(1, n + 1)).all()


def test_global_ranks_and_ntile_match_pandas(ray_session):
    from llama_ray.data_ops.relational import global_ranks, ntile

    rng = np.random.default_rng(3)
    df = pd.DataFrame(
        {
            "rid": np.arange(501, dtype=np.int64),
            "v": rng.integers(0, 40, 501).astype(np.int64),  # heavy ties
        }
    )
    exp_rank = df.sort_values(["v", "rid"]).reset_index(drop=True)
    exp_rank["rn"] = np.arange(1, len(df) + 1, dtype=np.int64)
    for nb in (1, 9, 33):
        out = (
            global_ranks(
                rd.from_pandas(df).repartition(nb), order_cols=["v", "rid"]
            )
            .to_pandas()
            .sort_values("rn")
            .reset_index(drop=True)
        )
        assert out[["rid", "v", "rn"]].equals(exp_rank[["rid", "v", "rn"]])
        nt = ntile(
            rd.from_pandas(df).repartition(nb), order_cols=["v", "rid"], k=4
        ).to_pandas()
        # SQL NTILE split: 501 = 4*125 + 1 → bucket 1 has 126 rows
        sizes = nt["bucket"].value_counts().sort_index().to_numpy()
        assert sizes.tolist() == [126, 125, 125, 125]
        m = nt.merge(exp_rank, on=["rid", "v"])
        cut = 126
        exp_b = np.where(
            m["rn"] <= cut, 1, 2 + (m["rn"] - cut - 1) // 125
        )
        assert np.array_equal(m["bucket"].to_numpy(), exp_b)


def test_sort_merge_join_hot_key_degrades_loudly_and_exactly(ray_session, monkeypatch, caplog):
    """r5: a key whose run spans whole sorted blocks pushes its rows
    into the bounded boundary second pass; the pass stays EXACT (vs
    DuckDB) and degrades loudly — warning log + a central skew_events
    record with the collected row count."""
    import duckdb
    import logging

    import llama_ray.common as common
    from llama_ray.common import skew_events_summary

    monkeypatch.setattr(common, "BOUNDARY_WARN_ROWS", 200)
    skew_events_summary(reset=True)

    rng = np.random.default_rng(29)
    n = 20_000
    key = np.where(rng.random(n) < 0.25, 0, rng.integers(1, 500, n))  # hot key 0 ~25%
    fact = pa.table(
        {
            "fact_id": pa.array(np.arange(n, dtype=np.int64)),
            "key": pa.array(key.astype(np.int64)),
        }
    )
    dim = pa.table(
        {
            "key": pa.array(np.arange(500, dtype=np.int64)),
            "dim_val": pa.array(np.arange(500, dtype=np.int64) * 7),
        }
    )
    with caplog.at_level(logging.WARNING, logger="llama_ray.common"):
        out = (
            sort_merge_join(
                rd.from_arrow(fact).repartition(16),
                rd.from_arrow(dim),
                left_on="key",
            )
            .to_pandas()
            .sort_values(["fact_id"])
            .reset_index(drop=True)
        )
    exp = (
        duckdb.connect()
        .execute(
            "SELECT f.key, f.fact_id, d.dim_val FROM fact f JOIN dim d USING (key) "
            "ORDER BY f.fact_id"
        )
        .df()
    )
    assert len(out) == n
    for c in ("key", "fact_id", "dim_val"):
        assert np.array_equal(out[c].to_numpy(), exp[c].to_numpy()), c
    assert any("boundary stitch" in r.message for r in caplog.records)
    ev = {(e["where"], e["kind"]): e for e in skew_events_summary(reset=True)}
    rec = ev[("sort_merge_join", "boundary_stitch")]
    assert rec["events"] >= 1
    # the hot run (~25% of rows, both sides) dominates the collected count
    assert rec["rows"] >= int((key == 0).sum())


def test_grouped_ntile_matches_duckdb(ray_session):
    """r5: NTILE(k) PARTITION BY group — exact SQL split semantics,
    including a dominant group spanning many sorted blocks and tiny
    groups with n < k."""
    import duckdb

    from llama_ray.data_ops.relational import grouped_ntile

    rng = np.random.default_rng(31)
    n = 5_000
    g = np.where(rng.random(n) < 0.6, "hot", rng.choice(["a", "b", "c", "tiny"], n))
    g[:2] = "solo"  # a group with fewer rows than k
    t = pa.table(
        {
            "g": pa.array(g),
            "v": pa.array(rng.integers(0, 1_000_000, n).astype(np.int64)),
            "rid": pa.array(np.arange(n, dtype=np.int64)),
        }
    )
    for k in (3, 7):
        out = (
            grouped_ntile(
                rd.from_arrow(t).repartition(11),
                group_col="g",
                order_cols=["v", "rid"],
                k=k,
                out_col="b",
            )
            .to_pandas()
            .sort_values("rid")
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        exp = con.execute(
            f"SELECT rid, CAST(NTILE({k}) OVER (PARTITION BY g ORDER BY v, rid) AS BIGINT) AS b "
            "FROM t ORDER BY rid"
        ).df()
        assert np.array_equal(out["b"].to_numpy(), exp["b"].to_numpy()), k
