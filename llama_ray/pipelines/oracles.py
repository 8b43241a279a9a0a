"""DuckDB oracle SQL for every driver-checked query.

Column names and rounding match ``llama_ray.pipelines.queries``
one-for-one. Iterative algorithms are expressed as *unrolled* CTE
chains (PageRank: exactly 10 synchronous iterations; WCC: enough
min-label rounds to pass the graph's diameter; LP: exactly 4 rounds)
— DuckDB executes these exactly, giving a genuinely independent
implementation to hash-compare against.
"""

from __future__ import annotations

from .tpch_graph import GRAPH_CTES, O_NATION, O_REGION, O_SUPP, RAW_EDGES_SQL

DAMPING = 0.85
BFS_ROOT = 1
WCC_ROUNDS = 24  # ≥ graph diameter (≈12); fixpoint verified in tests
LP_ROUNDS = 4
CORE_ROUNDS = 24  # ≥ H-index iterations to fixpoint (measured ≤8 at sf0.01)


def edge_list_sql() -> str:
    return f"WITH {GRAPH_CTES} SELECT src, dst FROM e"


def edge_kind_counts_sql() -> str:
    return f"WITH raw_edges AS ({RAW_EDGES_SQL}) SELECT kind, CAST(COUNT(*) AS BIGINT) AS n FROM raw_edges GROUP BY kind"


def out_degrees_sql() -> str:
    return f"WITH {GRAPH_CTES} SELECT src, CAST(COUNT(*) AS BIGINT) AS degree FROM e GROUP BY src"


def degree_distribution_sql() -> str:
    return f"""WITH {GRAPH_CTES}
SELECT CAST(FLOOR(LOG2(d)) AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS num_vertices,
       CAST(SUM(d) AS BIGINT) AS num_edges
FROM deg GROUP BY 1"""


def edge_prop_stats_sql() -> str:
    return f"""WITH raw_edges AS ({RAW_EDGES_SQL})
SELECT MIN(weight) AS min, MAX(weight) AS max, SUM(weight) AS sum,
       CAST(COUNT(*) AS BIGINT) AS count, ROUND(AVG(weight), 6) AS mean
FROM raw_edges"""


def _pagerank_ctes(iters: int) -> str:
    steps = [f"r0 AS MATERIALIZED (SELECT id, 1.0 / (SELECT n FROM nn) AS rank FROM v)"]
    for k in range(iters):
        steps.append(
            f"""r{k + 1} AS MATERIALIZED (
  SELECT v.id,
         (CAST(1 AS DOUBLE) - {DAMPING}) / (SELECT n FROM nn)
         + {DAMPING} * COALESCE(s.contrib, 0) AS rank
  FROM v LEFT JOIN (
    SELECT e.dst AS id, SUM(r{k}.rank / deg.d) AS contrib
    FROM e JOIN r{k} ON r{k}.id = e.src JOIN deg ON deg.src = e.src
    GROUP BY e.dst
  ) s ON s.id = v.id)"""
        )
    return ",\n".join(steps)


def pagerank_sql(iters: int = 10) -> str:
    return f"""WITH {GRAPH_CTES},
{_pagerank_ctes(iters)}
SELECT id AS vertex, ROUND(rank, 8) AS rank FROM r{iters}"""


def pagerank_top10_sql(iters: int = 10) -> str:
    return f"""WITH {GRAPH_CTES},
{_pagerank_ctes(iters)}
SELECT id AS vertex, ROUND(rank, 8) AS rank FROM r{iters}
ORDER BY rank DESC, vertex ASC LIMIT 10"""


def ppr_sql(iters: int = 10, seeds=(1, 2, 3)) -> str:
    seed_cte = " UNION ALL ".join(f"SELECT CAST({s} AS BIGINT) AS seed" for s in seeds)
    steps = [
        "q0 AS MATERIALIZED (SELECT v.id, s.seed, "
        "CASE WHEN v.id = s.seed THEN CAST(1.0 AS DOUBLE) ELSE 0.0 END AS rank "
        "FROM v CROSS JOIN seeds s)"
    ]
    for k in range(iters):
        steps.append(
            f"""q{k + 1} AS MATERIALIZED (
  SELECT b.id, b.seed,
         (CASE WHEN b.id = b.seed THEN CAST(1 AS DOUBLE) - {DAMPING} ELSE 0 END)
         + {DAMPING} * COALESCE(c.contrib, 0) AS rank
  FROM (SELECT v.id, s.seed FROM v CROSS JOIN seeds s) b
  LEFT JOIN (
    SELECT e.dst AS id, p.seed, SUM(p.rank / deg.d) AS contrib
    FROM e JOIN q{k} p ON p.id = e.src JOIN deg ON deg.src = e.src
    GROUP BY e.dst, p.seed
  ) c ON c.id = b.id AND c.seed = b.seed)"""
        )
    body = ",\n".join(steps)
    return f"""WITH {GRAPH_CTES},
seeds AS ({seed_cte}),
{body}
SELECT id AS vertex, seed, ROUND(rank, 8) AS rank FROM q{iters}"""


def wcc_sql(rounds: int = WCC_ROUNDS) -> str:
    steps = ["l0 AS MATERIALIZED (SELECT id, id AS label FROM v)"]
    for k in range(rounds):
        steps.append(
            f"""l{k + 1} AS MATERIALIZED (
  SELECT l{k}.id, LEAST(l{k}.label, COALESCE(m.minlab, l{k}.label)) AS label
  FROM l{k} LEFT JOIN (
    SELECT ue.b AS id, MIN(l.label) AS minlab
    FROM ue JOIN l{k} l ON l.id = ue.a GROUP BY ue.b
  ) m ON m.id = l{k}.id)"""
        )
    body = ",\n".join(steps)
    return f"""WITH {GRAPH_CTES},
ue AS MATERIALIZED (SELECT src AS a, dst AS b FROM e UNION SELECT dst, src FROM e),
{body}
SELECT id AS vertex, label AS component FROM l{rounds}"""


def label_propagation_sql(rounds: int = LP_ROUNDS) -> str:
    steps = ["p0 AS MATERIALIZED (SELECT id, id AS label FROM cv)"]
    for k in range(rounds):
        steps.append(
            f"""p{k + 1} AS MATERIALIZED (
  SELECT p{k}.id, COALESCE(m.label, p{k}.label) AS label
  FROM p{k} LEFT JOIN (
    SELECT id, label FROM (
      SELECT ue.b AS id, l.label, COUNT(*) AS c,
             ROW_NUMBER() OVER (PARTITION BY ue.b
                                ORDER BY COUNT(*) DESC, l.label ASC) AS rn
      FROM ue JOIN p{k} l ON l.id = ue.a GROUP BY ue.b, l.label
    ) WHERE rn = 1
  ) m ON m.id = p{k}.id)"""
        )
    body = ",\n".join(steps)
    return f"""WITH {GRAPH_CTES},
cu AS MATERIALIZED (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b FROM e WHERE src <> dst),
ue AS MATERIALIZED (SELECT a, b FROM cu UNION ALL SELECT b, a FROM cu),
cv AS MATERIALIZED (SELECT a AS id FROM cu UNION SELECT b AS id FROM cu),
{body}
SELECT id AS vertex, label FROM p{rounds}"""


def core_numbers_sql(rounds: int = CORE_ROUNDS) -> str:
    """H-index iteration from degree init, unrolled ``rounds`` times
    over the canonical undirected simple graph (same ``cu``/``ue``
    CTEs as label propagation). Per round each vertex's value becomes
    the H-index of its neighbors' values: rank neighbors by value
    descending, h = max rank with value ≥ rank. Extra rounds past the
    fixpoint are no-ops, so ``rounds`` only needs to exceed the
    convergence count."""
    steps = [
        "c0 AS MATERIALIZED (SELECT a AS id, CAST(COUNT(*) AS BIGINT) AS core FROM ue GROUP BY a)"
    ]
    for k in range(rounds):
        steps.append(
            f"""c{k + 1} AS MATERIALIZED (
  SELECT c{k}.id, LEAST(c{k}.core, COALESCE(h.h, 0)) AS core
  FROM c{k} LEFT JOIN (
    SELECT id, MAX(CASE WHEN val >= rn THEN rn ELSE 0 END) AS h FROM (
      SELECT ue.b AS id, c.core AS val,
             ROW_NUMBER() OVER (PARTITION BY ue.b ORDER BY c.core DESC) AS rn
      FROM ue JOIN c{k} c ON c.id = ue.a
    ) GROUP BY id
  ) h ON h.id = c{k}.id)"""
        )
    body = ",\n".join(steps)
    return f"""WITH {GRAPH_CTES},
cu AS MATERIALIZED (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b FROM e WHERE src <> dst),
ue AS MATERIALIZED (SELECT a, b FROM cu UNION ALL SELECT b, a FROM cu),
{body}
SELECT id AS vertex, core FROM c{rounds}"""


def wcc_sizes_sql(rounds: int = WCC_ROUNDS) -> str:
    inner = wcc_sql(rounds)
    return f"""WITH w AS ({inner})
SELECT component, CAST(COUNT(*) AS BIGINT) AS size FROM w GROUP BY component"""


def top_referenced_sql(k: int = 20) -> str:
    return f"""WITH {GRAPH_CTES}
SELECT dst AS vertex, CAST(COUNT(*) AS BIGINT) AS in_degree
FROM e GROUP BY dst ORDER BY in_degree DESC, vertex ASC LIMIT {k}"""


def events_sessions_sql(gap_seconds: int = 1800) -> str:
    gap_us = gap_seconds * 1_000_000
    return f"""WITH t AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_u,
         LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_u
  FROM events),
m AS (SELECT user_id, ts_u,
             SUM(CASE WHEN prev_u IS NULL OR ts_u - prev_u > {gap_us} THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts_u ROWS UNBOUNDED PRECEDING) AS sess
      FROM t)
SELECT user_id, MIN(ts_u) AS session_start, CAST(COUNT(*) AS BIGINT) AS n_events
FROM m GROUP BY user_id, sess"""


def triangle_count_sql() -> str:
    return f"""WITH {GRAPH_CTES},
ce AS MATERIALIZED (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b FROM e WHERE src <> dst)
SELECT CAST(COUNT(*) AS BIGINT) AS triangles
FROM ce x JOIN ce y ON y.a = x.b JOIN ce z ON z.a = x.a AND z.b = y.b"""


def bfs_sql(root: int = BFS_ROOT, max_depth: int = 40) -> str:
    return f"""WITH RECURSIVE {GRAPH_CTES},
r(node, dist) AS (
  SELECT CAST({root} AS BIGINT), CAST(0 AS BIGINT)
  UNION
  SELECT e.dst, r.dist + 1 FROM r JOIN e ON e.src = r.node WHERE r.dist < {max_depth}
)
SELECT node AS vertex, MIN(dist) AS dist FROM r GROUP BY node"""


def sssp_weighted_sql(root: int = BFS_ROOT, rounds: int = 12) -> str:
    """Unrolled Bellman-Ford over duplicate-summed weights (the
    engine's ``dedup_edges(weights='sum')`` graph). 12 rounds ≫ the
    graph's ≤8-hop shortest paths; unreached = sentinel, filtered."""
    INF = "1e18"
    steps = [
        f"d0 AS MATERIALIZED (SELECT id, CASE WHEN id = {root} THEN CAST(0 AS DOUBLE) ELSE {INF} END AS dist FROM wv)"
    ]
    for k in range(rounds):
        steps.append(
            f"""d{k + 1} AS MATERIALIZED (
  SELECT d{k}.id, LEAST(d{k}.dist, COALESCE(m.best, {INF})) AS dist
  FROM d{k} LEFT JOIN (
    SELECT we.dst AS id, MIN(d.dist + we.w) AS best
    FROM we JOIN d{k} d ON d.id = we.src GROUP BY we.dst
  ) m ON m.id = d{k}.id)"""
        )
    body = ",\n".join(steps)
    return f"""WITH raw_edges AS MATERIALIZED ({RAW_EDGES_SQL}),
we AS MATERIALIZED (SELECT src, dst, SUM(weight) AS w FROM raw_edges GROUP BY src, dst),
wv AS MATERIALIZED (SELECT src AS id FROM we UNION SELECT dst FROM we),
{body}
SELECT id AS vertex, ROUND(dist, 6) AS dist FROM d{rounds} WHERE dist < {INF}"""


def avg_nbr_balance_sql() -> str:
    return f"""WITH {GRAPH_CTES},
props AS (SELECT c_custkey AS id, c_acctbal AS bal FROM customer
          UNION ALL SELECT {O_SUPP} + s_suppkey, s_acctbal FROM supplier),
qual AS (
  SELECT e.dst AS id, COUNT(*) AS cnt
  FROM e JOIN props p ON p.id = e.src
  WHERE p.bal >= 1000 AND p.bal < 5000
    AND e.dst >= {O_NATION} AND e.dst < {O_REGION}
  GROUP BY e.dst)
SELECT ROUND(CAST(COALESCE((SELECT SUM(cnt) FROM qual), 0) AS DOUBLE)
             / (SELECT COUNT(*) FROM nation), 6) AS avg_cnt"""


def doc_exact_dedup_sql() -> str:
    return """SELECT MIN(doc_id) AS doc_id, CAST(COUNT(*) AS BIGINT) AS copies
FROM documents GROUP BY text"""


def doc_token_stats_sql() -> str:
    return r"""SELECT doc_id,
       CAST(CASE WHEN TRIM(text) = '' THEN 0
                 ELSE len(regexp_split_to_array(TRIM(text), '\s+')) END AS BIGINT) AS n_tokens,
       CAST(LENGTH(text) AS BIGINT) AS n_chars
FROM documents"""


def lang_stats_sql() -> str:
    return r"""WITH s AS (
  SELECT lang,
         CASE WHEN TRIM(text) = '' THEN 0
              ELSE len(regexp_split_to_array(TRIM(text), '\s+')) END AS n_tokens
  FROM documents)
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       ROUND(CAST(SUM(n_tokens) AS DOUBLE) / COUNT(*), 6) AS avg_tokens
FROM s GROUP BY lang"""


def events_hourly_sql() -> str:
    return """SELECT event_type,
       CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS window_start,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(SUM(value), 4) AS sum_value
FROM events GROUP BY 1, 2"""


def events_props_sum_sql() -> str:
    return """SELECT event_type,
       CAST(SUM(CAST(regexp_extract(props, '[0-9]+') AS BIGINT)) AS BIGINT) AS sum_k,
       CAST(COUNT(*) AS BIGINT) AS n
FROM events GROUP BY event_type"""


def knn_cosine_sql(n_queries: int = 5, k: int = 10) -> str:
    return f"""WITH q AS (
  SELECT vec_id AS qid,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
  FROM embeddings WHERE vec_id < {n_queries}),
c AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
s AS (SELECT q.qid, c.vec_id, list_cosine_similarity(q.qv, c.v) AS sim
      FROM q CROSS JOIN c WHERE c.vec_id <> q.qid),
r AS (SELECT qid, vec_id, sim,
             ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id ASC) AS rn
      FROM s)
SELECT qid, vec_id AS neighbor_id, ROUND(sim, 5) AS sim FROM r WHERE rn <= {k}"""


def embedding_cos_pairs_sql(threshold: float = 0.4) -> str:
    """Exact cosine all-pairs ≥ τ (mirrors data_ops.ann.cosine_pairs;
    DOUBLE casts so DuckDB and the numpy matmul agree to ≫5 decimals)."""
    return f"""WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
  FROM embeddings)
SELECT a.vec_id AS a, b.vec_id AS b,
       ROUND(list_cosine_similarity(a.vec, b.vec), 5) AS cos
FROM v a JOIN v b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.vec, b.vec) >= {threshold}
ORDER BY a, b"""


def doc_quality_sql() -> str:
    """Mirror of data_ops.text.QualityScore — every feature is the
    same RE2 count over the same (lowercased) text, combined with the
    identical double-precision formula (clip = least/greatest), so the
    6-decimal rounding matches bit-for-bit."""
    stop = r"\b(the|and|of|to|in|is|that|with|for)\b"
    return f"""WITH f AS (
  SELECT doc_id,
         CAST(length(text) AS DOUBLE) AS len,
         CAST(length(regexp_extract_all(text, '[^\\p{{L}}\\p{{N}}_\\s]')) AS DOUBLE) AS n_punct,
         CAST(length(regexp_extract_all(lower(text), '[\\p{{L}}\\p{{N}}_]+')) AS DOUBLE) AS n_words,
         CAST(length(regexp_extract_all(lower(text), '[\\p{{L}}\\p{{N}}_]')) AS DOUBLE) AS n_word_chars,
         CAST(length(regexp_extract_all(lower(text), '{stop}')) AS DOUBLE) AS n_stop
  FROM documents),
g AS (
  SELECT doc_id, len,
         n_punct / greatest(len, 1.0) AS punct_ratio,
         n_stop / greatest(n_words, 1.0) AS stop_ratio,
         CASE WHEN n_words > 0 THEN n_word_chars / greatest(n_words, 1.0) ELSE 0.0 END AS mwl
  FROM f)
SELECT doc_id,
       ROUND(least(greatest(len / 500.0, 0), 1) * 0.3
           + least(greatest(1 - punct_ratio * 4, 0), 1) * 0.3
           + least(greatest(stop_ratio * 5, 0), 1) * 0.2
           + least(greatest(1 - abs(mwl - 5) / 5, 0), 1) * 0.2, 6) AS quality
FROM g ORDER BY doc_id"""
