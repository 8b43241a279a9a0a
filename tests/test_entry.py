"""Driver-gate emulation: every ``queries()`` entry with an
``oracle_sql()`` twin must match DuckDB exactly (row count, schema,
order-insensitive values) at sf0.001 — the same comparison the
driver runs at sf0.01."""

import math
import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import __ray_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{os.path.join(SF_DIR, t)}.parquet')"
        )
    return con


def _normalize(obj) -> pd.DataFrame:
    if isinstance(obj, pd.DataFrame):
        df = obj
    elif isinstance(obj, pa.Table):
        df = obj.to_pandas()
    else:  # ray Dataset
        df = obj.to_pandas()
    df = df[sorted(df.columns)]
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return df


QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(name):
    ours = _normalize(QUERIES[name](SF_DIR))
    con = _duck()
    theirs = _normalize(con.execute(ORACLES[name]).fetch_df())
    con.close()
    assert list(ours.columns) == list(theirs.columns), (
        f"{name}: column mismatch {list(ours.columns)} vs {list(theirs.columns)}"
    )
    assert len(ours) == len(theirs), f"{name}: row count {len(ours)} vs {len(theirs)}"
    for col in ours.columns:
        a, b = ours[col].to_numpy(), theirs[col].to_numpy()
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            assert np.array_equal(
                a.astype(np.float64), b.astype(np.float64)
            ), f"{name}.{col}: float values differ (max |Δ| = {np.nanmax(np.abs(a.astype(float) - b.astype(float)))})"
        else:
            assert np.array_equal(a, b), f"{name}.{col}: values differ"


def test_queries_without_oracle_still_run():
    for name in set(QUERIES) - set(ORACLES):
        out = _normalize(QUERIES[name](SF_DIR))
        assert len(out) >= 0


def test_entry_smoke():
    res = entrymod.entry()
    df = _normalize(res)
    assert len(df) > 0
    assert set(df.columns) == {"rank", "vertex"}
