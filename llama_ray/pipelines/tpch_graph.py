"""Link graph derived from the driver's TPC-H-ish testdata tables.

The driver's correctness gate runs each query against DuckDB on the
same Parquet, so the graph derivation must be expressible both ways.
Vertex id spaces (disjoint int64 ranges — the deterministic analogue
of the hash64 ids used for repo_files ingest):

    customer  c_custkey                    [0, 10M)
    order     10M + o_orderkey             [10M, 20M)
    part      20M + p_partkey              [20M, 30M)
    supplier  30M + s_suppkey              [30M, 40M)
    nation    40M + n_nationkey            [40M, 50M)
    region    50M + r_regionkey            [50M, 60M)

Edge kinds (directed; lineitem-derived kinds contain duplicates on
purpose — they exercise the dedup path, and (order, part, supplier)
rows close triangles):

    cust_order    o_custkey        → order        (orders)
    order_part    order            → part         (lineitem, w=l_quantity)
    order_supp    order            → supplier     (lineitem)
    part_supp     part             → supplier     (lineitem)
    supp_nation   supplier         → nation       (supplier)
    cust_nation   c_custkey        → nation       (customer)
    nation_region nation           → region       (nation)

Reads prune to exactly the needed columns (`read_parquet(columns=…)`).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import ray.data as rd

from ..graph import Graph, build_graph
from ..ingest.canonicalize import dedup_edges

O_ORDER = 10_000_000
O_PART = 20_000_000
O_SUPP = 30_000_000
O_NATION = 40_000_000
O_REGION = 50_000_000


def _edge_table(src: np.ndarray, dst: np.ndarray, weight, kind: str, with_props: bool) -> pa.Table:
    n = len(src)
    cols = {"src": src.astype(np.int64), "dst": dst.astype(np.int64)}
    if with_props:
        cols["weight"] = (
            np.full(n, weight, np.float64) if np.isscalar(weight) else weight.astype(np.float64)
        )
        # constant string column via take — no n-element Python list
        cols["kind"] = pa.array([kind], pa.string()).take(pa.array(np.zeros(n, np.int32)))
    return pa.table(cols)


def raw_edges(sf_dir: str, *, with_props: bool = True) -> rd.Dataset:
    """All edge kinds, duplicates preserved. Columns (src, dst) plus,
    with ``with_props``, (weight, kind) — the structural queries skip
    the property columns entirely (prune at the derive, not after)."""
    p = lambda name: os.path.join(sf_dir, f"{name}.parquet")

    # coarse read blocks + whole-block batches: the default layout
    # (320 tiny blocks x 1024-row map calls) made the derive ~20x
    # slower than the same rows in ~30 blocks
    orders = rd.read_parquet(
        p("orders"), columns=["o_orderkey", "o_custkey"], override_num_blocks=4
    ).map_batches(
        lambda b: _edge_table(
            b.column("o_custkey").to_numpy(), O_ORDER + b.column("o_orderkey").to_numpy(), 1.0, "cust_order", with_props
        ),
        batch_format="pyarrow",
        batch_size=None,
    )

    def lineitem_edges(b: pa.Table) -> pa.Table:
        ok = b.column("l_orderkey").to_numpy()
        pk = b.column("l_partkey").to_numpy()
        sk = b.column("l_suppkey").to_numpy()
        qty = b.column("l_quantity").to_numpy().astype(np.float64) if with_props else 1.0
        return pa.concat_tables(
            [
                _edge_table(O_ORDER + ok, O_PART + pk, qty, "order_part", with_props),
                _edge_table(O_ORDER + ok, O_SUPP + sk, 1.0, "order_supp", with_props),
                _edge_table(O_PART + pk, O_SUPP + sk, 1.0, "part_supp", with_props),
            ]
        )

    li_cols = ["l_orderkey", "l_partkey", "l_suppkey"] + (["l_quantity"] if with_props else [])
    lineitem = rd.read_parquet(p("lineitem"), columns=li_cols, override_num_blocks=16).map_batches(
        lineitem_edges, batch_format="pyarrow", batch_size=None
    )

    supplier = rd.read_parquet(p("supplier"), override_num_blocks=1, columns=["s_suppkey", "s_nationkey"]).map_batches(
        lambda b: _edge_table(
            O_SUPP + b.column("s_suppkey").to_numpy(), O_NATION + b.column("s_nationkey").to_numpy(), 1.0, "supp_nation", with_props
        ),
        batch_format="pyarrow",
        batch_size=None,
    )
    customer = rd.read_parquet(p("customer"), override_num_blocks=2, columns=["c_custkey", "c_nationkey"]).map_batches(
        lambda b: _edge_table(
            b.column("c_custkey").to_numpy(), O_NATION + b.column("c_nationkey").to_numpy(), 1.0, "cust_nation", with_props
        ),
        batch_format="pyarrow",
        batch_size=None,
    )
    nation = rd.read_parquet(p("nation"), override_num_blocks=1, columns=["n_nationkey", "n_regionkey"]).map_batches(
        lambda b: _edge_table(
            O_NATION + b.column("n_nationkey").to_numpy(), O_REGION + b.column("n_regionkey").to_numpy(), 1.0, "nation_region", with_props
        ),
        batch_format="pyarrow",
        batch_size=None,
    )
    return orders.union(lineitem, supplier, customer, nation)


def dedup_edge_list(sf_dir: str) -> rd.Dataset:
    """Distinct (src, dst) pairs — the graph the analytics run on."""
    return dedup_edges(raw_edges(sf_dir, with_props=False))


def build_tpch_graph(sf_dir: str) -> Graph:
    return build_graph(dedup_edge_list(sf_dir))


# ---------------------------------------------------------------- SQL side

RAW_EDGES_SQL = f"""
  SELECT o_custkey AS src, {O_ORDER} + o_orderkey AS dst,
         CAST(1.0 AS DOUBLE) AS weight, 'cust_order' AS kind FROM orders
  UNION ALL SELECT {O_ORDER} + l_orderkey, {O_PART} + l_partkey,
         CAST(l_quantity AS DOUBLE), 'order_part' FROM lineitem
  UNION ALL SELECT {O_ORDER} + l_orderkey, {O_SUPP} + l_suppkey,
         CAST(1.0 AS DOUBLE), 'order_supp' FROM lineitem
  UNION ALL SELECT {O_PART} + l_partkey, {O_SUPP} + l_suppkey,
         CAST(1.0 AS DOUBLE), 'part_supp' FROM lineitem
  UNION ALL SELECT {O_SUPP} + s_suppkey, {O_NATION} + s_nationkey,
         CAST(1.0 AS DOUBLE), 'supp_nation' FROM supplier
  UNION ALL SELECT c_custkey, {O_NATION} + c_nationkey,
         CAST(1.0 AS DOUBLE), 'cust_nation' FROM customer
  UNION ALL SELECT {O_NATION} + n_nationkey, {O_REGION} + n_regionkey,
         CAST(1.0 AS DOUBLE), 'nation_region' FROM nation
"""

# shared CTE prelude: raw_edges → e (distinct pairs) → v (vertices) → deg.
# AS MATERIALIZED stops DuckDB from inlining each CTE at every reference —
# the unrolled iterative queries reference the previous round twice, which
# would otherwise explode exponentially (and exhaust file descriptors
# re-opening the parquet views).
#
# raw_edges and v are wrapped in `SELECT ... FROM (...)` so their bodies'
# top level is NOT a set operation: under `WITH RECURSIVE` (coloring_sql),
# DuckDB 1.0 treats every UNION/UNION ALL-topped CTE in the list as a
# recursion candidate and mis-binds later CTE references (observed: a
# `FROM v` arm returning |un| rows). The wrap is a semantic no-op for the
# plain-WITH oracles.
GRAPH_CTES = f"""
raw_edges AS MATERIALIZED (SELECT src, dst, weight, kind FROM ({RAW_EDGES_SQL})),
e AS MATERIALIZED (SELECT DISTINCT src, dst FROM raw_edges),
v AS MATERIALIZED (SELECT id FROM (SELECT src AS id FROM e UNION SELECT dst AS id FROM e)),
nn AS MATERIALIZED (SELECT COUNT(*) AS n FROM v),
deg AS MATERIALIZED (SELECT src, COUNT(*) AS d FROM e GROUP BY src)
"""
