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


def wl_colors_sql(rounds: int = 3) -> str:
    """Mirror of algos.stats.wl_colors: per round, each vertex's new
    color is splitmix64(color·GOLD + Σ_in splitmix64(color_src)) with
    wrap-around 64-bit arithmetic (SQL sums exactly in HUGEINT then
    masks — ≡ the engine's uint64 wrap mod 2^64)."""
    gold = 0x9E3779B97F4A7C15
    parts = ["c0 AS MATERIALIZED (SELECT id, CAST(1 AS HUGEINT) AS col FROM v)"]
    for r in range(rounds):
        parts.append(f"h{r}0 AS (SELECT id, col AS h FROM c{r})")
        parts.append(_mix64_ctes(f"h{r}0", "id", prefix=f"hc{r}_"))
        parts.append(
            f"""s{r} AS MATERIALIZED (
  SELECT e.dst AS id, CAST(SUM(h.h) & {_M64} AS HUGEINT) AS raw
  FROM e JOIN hc{r}_5 h ON h.id = e.src GROUP BY e.dst)"""
        )
        parts.append(
            f"""m{r}0 AS (
  SELECT c.id, ({_mulmod64('c.col', gold)} + COALESCE(s.raw, 0)) & {_M64} AS h
  FROM c{r} c LEFT JOIN s{r} s ON s.id = c.id)"""
        )
        parts.append(_mix64_ctes(f"m{r}0", "id", prefix=f"nc{r}_"))
        parts.append(f"c{r + 1} AS MATERIALIZED (SELECT id, h AS col FROM nc{r}_5)")
    body = ",\n".join(parts)
    return f"""WITH {GRAPH_CTES},
{body}
SELECT id AS vertex,
       CAST(CASE WHEN col >= CAST('9223372036854775808' AS HUGEINT)
                 THEN col - {_POW64} ELSE col END AS BIGINT) AS color
FROM c{rounds}"""


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


def _pagerank_chain(iters: int, *, e: str, v: str, nn: str, deg: str, prefix: str, init: str) -> str:
    """Unrolled synchronous PageRank over arbitrary edge/vertex CTE
    names, starting from the ``init`` CTE (columns id, rank) — the
    building block of the snapshot warm-start oracle."""
    steps = [f"{prefix}0 AS MATERIALIZED ({init})"]
    for k in range(iters):
        steps.append(
            f"""{prefix}{k + 1} AS MATERIALIZED (
  SELECT {v}.id,
         (CAST(1 AS DOUBLE) - {DAMPING}) / (SELECT n FROM {nn})
         + {DAMPING} * COALESCE(s.contrib, 0) AS rank
  FROM {v} LEFT JOIN (
    SELECT {e}.dst AS id, SUM({prefix}{k}.rank / {deg}.d) AS contrib
    FROM {e} JOIN {prefix}{k} ON {prefix}{k}.id = {e}.src JOIN {deg} ON {deg}.src = {e}.src
    GROUP BY {e}.dst
  ) s ON s.id = {v}.id)"""
        )
    return ",\n".join(steps)


def streaming_window_pagerank_sql(
    batches: int = 6, window: int = 3, iters: int = 5, seed: int = 20260819,
) -> str:
    """Mirror of ``queries.q_streaming_window_pagerank``: after the
    full stream, the surviving window is the last ``window`` hash
    classes; one uniform-init unrolled PageRank chain over those
    edges. (The per-batch incremental maintenance is pinned equal to
    cold rebuilds in pytest — the oracle checks the final answer.)"""
    gold = 0x9E3779B97F4A7C15
    key = (
        f"xor(xor({_mulmod64('CAST(src AS HUGEINT)', gold)}, "
        f"CAST(dst AS HUGEINT)), CAST({seed} AS HUGEINT))"
    )
    lo = batches - window
    pre = f"""kh AS MATERIALIZED (SELECT src, dst, {key} AS h FROM e),
{_mix64_ctes('kh', 'src, dst')},
ew AS MATERIALIZED (SELECT src, dst FROM mx5 WHERE h % {batches} >= {lo}),
vw AS MATERIALIZED (SELECT id FROM (SELECT src AS id FROM ew UNION SELECT dst AS id FROM ew)),
nnw AS MATERIALIZED (SELECT COUNT(*) AS n FROM vw),
degw AS MATERIALIZED (SELECT src, COUNT(*) AS d FROM ew GROUP BY src)"""
    chain = _pagerank_chain(
        iters, e="ew", v="vw", nn="nnw", deg="degw", prefix="w",
        init="SELECT id, 1.0 / (SELECT n FROM nnw) AS rank FROM vw",
    )
    return f"""WITH {GRAPH_CTES},
{pre},
{chain}
SELECT id AS vertex, ROUND(rank, 8) AS rank FROM w{iters}"""


def snapshot_pagerank_delta_sql(
    base_iters: int = 10, delta_iters: int = 5, seed: int = 20260818
) -> str:
    """Mirror of ``queries.q_snapshot_pagerank_delta``: level-0 edges
    are those with splitmix64(src·GOLD ⊕ dst ⊕ seed) % 8 ≠ 0; a
    10-iteration chain runs on the level-0 view, then a 5-iteration
    chain on the full view warm-started from it (vertices new at
    level 1 enter at uniform 1/n over the full vertex set)."""
    gold = 0x9E3779B97F4A7C15
    key = (
        f"xor(xor({_mulmod64('CAST(src AS HUGEINT)', gold)}, "
        f"CAST(dst AS HUGEINT)), CAST({seed} AS HUGEINT))"
    )
    pre = f"""kh AS MATERIALIZED (SELECT src, dst, {key} AS h FROM e),
{_mix64_ctes('kh', 'src, dst')},
e0 AS MATERIALIZED (SELECT src, dst FROM mx5 WHERE h % 8 <> 0),
v0 AS MATERIALIZED (SELECT id FROM (SELECT src AS id FROM e0 UNION SELECT dst AS id FROM e0)),
nn0 AS MATERIALIZED (SELECT COUNT(*) AS n FROM v0),
deg0 AS MATERIALIZED (SELECT src, COUNT(*) AS d FROM e0 GROUP BY src)"""
    chain0 = _pagerank_chain(
        base_iters,
        e="e0", v="v0", nn="nn0", deg="deg0", prefix="a",
        init="SELECT id, 1.0 / (SELECT n FROM nn0) AS rank FROM v0",
    )
    warm = (
        f"SELECT v.id, COALESCE(a{base_iters}.rank, 1.0 / (SELECT n FROM nn)) AS rank "
        f"FROM v LEFT JOIN a{base_iters} ON a{base_iters}.id = v.id"
    )
    chain1 = _pagerank_chain(
        delta_iters, e="e", v="v", nn="nn", deg="deg", prefix="b", init=warm
    )
    return f"""WITH {GRAPH_CTES},
{pre},
{chain0},
{chain1}
SELECT id AS vertex, ROUND(rank, 8) AS rank FROM b{delta_iters}"""


def snapshot_wcc_delta_sql(rounds: int = WCC_ROUNDS, seed: int = 20260818) -> str:
    """Mirror of ``queries.q_snapshot_wcc_delta``: a full min-label
    chain on the level-0 edge view, then a second chain on the full
    view warm-started from it (new vertices enter at their own id).
    Both chains run ``rounds`` ≥ diameter sweeps — idempotent past the
    fixpoint, like ``wcc_sql``."""
    gold = 0x9E3779B97F4A7C15
    key = (
        f"xor(xor({_mulmod64('CAST(src AS HUGEINT)', gold)}, "
        f"CAST(dst AS HUGEINT)), CAST({seed} AS HUGEINT))"
    )

    def chain(n: int, prefix: str, ue: str, v: str, init: str) -> str:
        steps = [f"{prefix}0 AS MATERIALIZED ({init})"]
        for k in range(n):
            steps.append(
                f"""{prefix}{k + 1} AS MATERIALIZED (
  SELECT {prefix}{k}.id, LEAST({prefix}{k}.label, COALESCE(m.minlab, {prefix}{k}.label)) AS label
  FROM {prefix}{k} LEFT JOIN (
    SELECT {ue}.b AS id, MIN(l.label) AS minlab
    FROM {ue} JOIN {prefix}{k} l ON l.id = {ue}.a GROUP BY {ue}.b
  ) m ON m.id = {prefix}{k}.id)"""
            )
        return ",\n".join(steps)

    pre = f"""kh AS MATERIALIZED (SELECT src, dst, {key} AS h FROM e),
{_mix64_ctes('kh', 'src, dst')},
e0 AS MATERIALIZED (SELECT src, dst FROM mx5 WHERE h % 8 <> 0),
v0 AS MATERIALIZED (SELECT id FROM (SELECT src AS id FROM e0 UNION SELECT dst AS id FROM e0)),
ue0 AS MATERIALIZED (SELECT src AS a, dst AS b FROM e0 UNION SELECT dst, src FROM e0),
ue AS MATERIALIZED (SELECT src AS a, dst AS b FROM e UNION SELECT dst, src FROM e)"""
    c0 = chain(rounds, "a", "ue0", "v0", "SELECT id, id AS label FROM v0")
    warm = (
        f"SELECT v.id, COALESCE(a{rounds}.label, v.id) AS label "
        f"FROM v LEFT JOIN a{rounds} ON a{rounds}.id = v.id"
    )
    c1 = chain(rounds, "b", "ue", "v", warm)
    return f"""WITH {GRAPH_CTES},
{pre},
{c0},
{c1}
SELECT id AS vertex, label AS component FROM b{rounds}"""


def snapshot_triangle_delta_sql(seed: int = 20260818) -> str:
    """Mirror of queries.q_snapshot_triangle_delta: exact canonical
    triangle counts over the level-0 view and the full view; the
    incremental path must land on their difference."""
    gold = 0x9E3779B97F4A7C15
    key = (
        f"xor(xor({_mulmod64('CAST(src AS HUGEINT)', gold)}, "
        f"CAST(dst AS HUGEINT)), CAST({seed} AS HUGEINT))"
    )
    return f"""WITH {GRAPH_CTES},
kh AS MATERIALIZED (SELECT src, dst, {key} AS h FROM e),
{_mix64_ctes('kh', 'src, dst')},
e0 AS MATERIALIZED (SELECT src, dst FROM mx5 WHERE h % 8 <> 0),
ce0 AS MATERIALIZED (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b FROM e0 WHERE src <> dst),
ce AS MATERIALIZED (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b FROM e WHERE src <> dst),
t0 AS (SELECT COUNT(*) AS c FROM ce0 x JOIN ce0 y ON y.a = x.b JOIN ce0 z ON z.a = x.a AND z.b = y.b),
t1 AS (SELECT COUNT(*) AS c FROM ce x JOIN ce y ON y.a = x.b JOIN ce z ON z.a = x.a AND z.b = y.b)
SELECT CAST(t0.c AS BIGINT) AS tc_base,
       CAST(t1.c - t0.c AS BIGINT) AS tc_new,
       CAST(t1.c AS BIGINT) AS tc_total
FROM t0, t1"""


def pagerank_top10_sql(iters: int = 10) -> str:
    return f"""WITH {GRAPH_CTES},
{_pagerank_ctes(iters)}
SELECT id AS vertex, ROUND(rank, 8) AS rank FROM r{iters}
ORDER BY rank DESC, vertex ASC LIMIT 10"""


def pagerank_weighted_sql(iters: int = 10) -> str:
    """Edge-weighted PageRank: per-pair summed weights, contributions
    rank·w/strength — same unrolled chain as ``pagerank_sql``."""
    pre = """ew AS MATERIALIZED (SELECT src, dst, SUM(weight) AS w FROM raw_edges GROUP BY src, dst),
wdeg AS MATERIALIZED (SELECT src, SUM(w) AS wd FROM ew GROUP BY src)"""
    steps = ["w0 AS MATERIALIZED (SELECT id, 1.0 / (SELECT n FROM nn) AS rank FROM v)"]
    for k in range(iters):
        steps.append(
            f"""w{k + 1} AS MATERIALIZED (
  SELECT v.id,
         (CAST(1 AS DOUBLE) - {DAMPING}) / (SELECT n FROM nn)
         + {DAMPING} * COALESCE(s.contrib, 0) AS rank
  FROM v LEFT JOIN (
    SELECT ew.dst AS id, SUM(w{k}.rank * ew.w / wdeg.wd) AS contrib
    FROM ew JOIN w{k} ON w{k}.id = ew.src JOIN wdeg ON wdeg.src = ew.src
    GROUP BY ew.dst
  ) s ON s.id = v.id)"""
        )
    body = ",\n".join(steps)
    return f"""WITH {GRAPH_CTES},
{pre},
{body}
SELECT id AS vertex, ROUND(rank, 8) AS rank FROM w{iters}"""


def katz_sql(iters: int = 8, alpha: float = 0.0625, beta: float = 1.0) -> str:
    """Katz centrality, truncated series from x0=0 — unrolled like
    PageRank but with the unnormalized in-neighbor sum. The dyadic
    alpha (2^-4) keeps every intermediate exactly representable, so
    no ROUND margin is needed (see ``algos/katz.py``)."""
    steps = ["k0 AS MATERIALIZED (SELECT id, CAST(0 AS DOUBLE) AS score FROM v)"]
    for k in range(iters):
        steps.append(
            f"""k{k + 1} AS MATERIALIZED (
  SELECT v.id,
         CAST({beta} AS DOUBLE) + CAST({alpha} AS DOUBLE) * COALESCE(s.contrib, 0) AS score
  FROM v LEFT JOIN (
    SELECT e.dst AS id, SUM(k{k}.score) AS contrib
    FROM e JOIN k{k} ON k{k}.id = e.src GROUP BY e.dst
  ) s ON s.id = v.id)"""
        )
    body = ",\n".join(steps)
    return f"""WITH {GRAPH_CTES},
{body}
SELECT id AS vertex, score AS katz FROM k{iters}"""


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


def graph_pipeline_sql(iters: int = 10, rounds: int = WCC_ROUNDS) -> str:
    """Mirror of queries.q_graph_pipeline: the flagship composition —
    V/E counts, WCC component count, triangle count, and the PageRank
    argmax — in ONE query over the shared link-graph CTEs."""
    steps = ["gl0 AS MATERIALIZED (SELECT id, id AS label FROM v)"]
    for k in range(rounds):
        steps.append(
            f"""gl{k + 1} AS MATERIALIZED (
  SELECT gl{k}.id, LEAST(gl{k}.label, COALESCE(m.minlab, gl{k}.label)) AS label
  FROM gl{k} LEFT JOIN (
    SELECT pue.b AS id, MIN(l.label) AS minlab
    FROM pue JOIN gl{k} l ON l.id = pue.a GROUP BY pue.b
  ) m ON m.id = gl{k}.id)"""
        )
    wcc_body = ",\n".join(steps)
    return f"""WITH {GRAPH_CTES},
{_pagerank_ctes(iters)},
pue AS MATERIALIZED (SELECT src AS a, dst AS b FROM e UNION SELECT dst, src FROM e),
{wcc_body},
ce AS MATERIALIZED (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b FROM e WHERE src <> dst)
SELECT CAST((SELECT n FROM nn) AS BIGINT) AS n_vertices,
       CAST((SELECT COUNT(*) FROM e) AS BIGINT) AS n_edges,
       CAST((SELECT COUNT(DISTINCT label) FROM gl{rounds}) AS BIGINT) AS n_components,
       CAST((SELECT COUNT(*) FROM ce x JOIN ce y ON y.a = x.b
             JOIN ce z ON z.a = x.a AND z.b = y.b) AS BIGINT) AS triangles,
       CAST((SELECT id FROM r{iters} ORDER BY ROUND(rank, 8) DESC, id LIMIT 1) AS BIGINT) AS top_vertex"""


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


def snapshot_lp_delta_sql(
    base_rounds: int = 4, delta_rounds: int = 2, seed: int = 20260818
) -> str:
    """Mirror of queries.q_snapshot_lp_delta: the LP mode chain on the
    level-0 canonical view, then a warm-started chain on the full
    canonical view (new vertices at their own id)."""
    gold = 0x9E3779B97F4A7C15
    key = (
        f"xor(xor({_mulmod64('CAST(src AS HUGEINT)', gold)}, "
        f"CAST(dst AS HUGEINT)), CAST({seed} AS HUGEINT))"
    )

    def chain(nr: int, prefix: str, ue: str, init: str) -> str:
        steps = [f"{prefix}0 AS MATERIALIZED ({init})"]
        for k in range(nr):
            steps.append(
                f"""{prefix}{k + 1} AS MATERIALIZED (
  SELECT {prefix}{k}.id, COALESCE(m.label, {prefix}{k}.label) AS label
  FROM {prefix}{k} LEFT JOIN (
    SELECT id, label FROM (
      SELECT {ue}.b AS id, l.label, COUNT(*) AS c,
             ROW_NUMBER() OVER (PARTITION BY {ue}.b
                                ORDER BY COUNT(*) DESC, l.label ASC) AS rn
      FROM {ue} JOIN {prefix}{k} l ON l.id = {ue}.a GROUP BY {ue}.b, l.label
    ) WHERE rn = 1
  ) m ON m.id = {prefix}{k}.id)"""
            )
        return ",\n".join(steps)

    pre = f"""kh AS MATERIALIZED (SELECT src, dst, {key} AS h FROM e),
{_mix64_ctes('kh', 'src, dst')},
e0 AS MATERIALIZED (SELECT src, dst FROM mx5 WHERE h % 8 <> 0),
cu0 AS MATERIALIZED (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b FROM e0 WHERE src <> dst),
ue0 AS MATERIALIZED (SELECT a, b FROM cu0 UNION ALL SELECT b, a FROM cu0),
cv0 AS MATERIALIZED (SELECT a AS id FROM cu0 UNION SELECT b AS id FROM cu0),
cu AS MATERIALIZED (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b FROM e WHERE src <> dst),
ue AS MATERIALIZED (SELECT a, b FROM cu UNION ALL SELECT b, a FROM cu),
cv AS MATERIALIZED (SELECT a AS id FROM cu UNION SELECT b AS id FROM cu)"""
    ca = chain(base_rounds, "sa", "ue0", "SELECT id, id AS label FROM cv0")
    warm = (
        f"SELECT cv.id, COALESCE(sa{base_rounds}.label, cv.id) AS label "
        f"FROM cv LEFT JOIN sa{base_rounds} ON sa{base_rounds}.id = cv.id"
    )
    cb = chain(delta_rounds, "sb", "ue", warm)
    return f"""WITH {GRAPH_CTES},
{pre},
{ca},
{cb}
SELECT id AS vertex, CAST(label AS BIGINT) AS label FROM sb{delta_rounds}"""


def _louvain_chain(rounds: int, weighted: bool = False) -> str:
    """The shared WITH-body of the Louvain oracles: graph CTEs +
    ``rounds`` parity-gated local-moving rounds ending at ``l{rounds}``.
    ``weighted``: per-pair edge weight = duplicate multiplicity over
    both orientations of the deduped edge list; e/k/tot become
    weighted sums (still integer-exact)."""
    steps = ["l0 AS MATERIALIZED (SELECT id, id AS label FROM cv)"]
    for r in range(rounds):
        steps.append(
            f"""t{r} AS MATERIALIZED (
  SELECT l.label AS c, CAST(SUM(dk.k) AS BIGINT) AS tot
  FROM l{r} l JOIN dk ON dk.id = l.id GROUP BY l.label),
l{r + 1} AS MATERIALIZED (
  SELECT l{r}.id,
         CASE WHEN l{r}.id % 2 = {r % 2}
              THEN COALESCE(b.c, l{r}.label)
              ELSE l{r}.label END AS label
  FROM l{r} LEFT JOIN (
    SELECT id, c FROM (
      SELECT cand.id, cand.c,
             ROW_NUMBER() OVER (
               PARTITION BY cand.id
               ORDER BY ((SELECT m2 FROM mm) * cand.e
                         - dk.k * (t{r}.tot
                                   - CASE WHEN cand.c = l.label
                                          THEN dk.k ELSE 0 END)) DESC,
                        CASE WHEN cand.c = l.label THEN 0 ELSE 1 END ASC,
                        cand.c ASC) AS rn
      FROM (
        SELECT ue.b AS id, nl.label AS c, CAST({'SUM(ue.w)' if weighted else 'COUNT(*)'} AS BIGINT) AS e
        FROM ue JOIN l{r} nl ON nl.id = ue.a GROUP BY ue.b, nl.label
        UNION ALL
        SELECT id, label AS c, CAST(0 AS BIGINT) AS e FROM l{r}
      ) cand
      JOIN dk ON dk.id = cand.id
      JOIN l{r} l ON l.id = cand.id
      JOIN t{r} ON t{r}.c = cand.c
    ) WHERE rn = 1
  ) b ON b.id = l{r}.id)"""
        )
    body = ",\n".join(steps)
    if weighted:
        prefix = """cu AS MATERIALIZED (SELECT LEAST(src, dst) AS a, GREATEST(src, dst) AS b, CAST(COUNT(*) AS BIGINT) AS w FROM e WHERE src <> dst GROUP BY 1, 2),
ue AS MATERIALIZED (SELECT a, b, w FROM cu UNION ALL SELECT b, a, w FROM cu),
cv AS MATERIALIZED (SELECT a AS id FROM cu UNION SELECT b AS id FROM cu),
dk AS MATERIALIZED (SELECT a AS id, CAST(SUM(w) AS BIGINT) AS k FROM ue GROUP BY a),
mm AS MATERIALIZED (SELECT CAST(SUM(k) AS BIGINT) AS m2 FROM dk)"""
    else:
        prefix = """cu AS MATERIALIZED (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b FROM e WHERE src <> dst),
ue AS MATERIALIZED (SELECT a, b FROM cu UNION ALL SELECT b, a FROM cu),
cv AS MATERIALIZED (SELECT a AS id FROM cu UNION SELECT b AS id FROM cu),
dk AS MATERIALIZED (SELECT a AS id, CAST(COUNT(*) AS BIGINT) AS k FROM ue GROUP BY a),
mm AS MATERIALIZED (SELECT CAST(SUM(k) AS BIGINT) AS m2 FROM dk)"""
    return f"""{GRAPH_CTES},
{prefix},
{body}"""


def louvain_sql(rounds: int = 6) -> str:
    """Mirror of algos.louvain.louvain_communities: parity-gated
    synchronous local moving with integer modularity-gain scores over
    the canonical undirected simple graph (same ``cu``/``ue``/``cv``
    CTEs as label propagation). Per round, gated vertices (id parity
    == round parity) move to the candidate community with the highest
    2m·e − k·(tot − k·[own]) score; ties prefer staying, then the
    smallest community id. All-integer scores ⇒ hash-exact."""
    return f"""WITH {_louvain_chain(rounds)}
SELECT id AS vertex, label AS community FROM l{rounds}"""


def louvain_weighted_sql(rounds: int = 6) -> str:
    """Weighted Louvain: per-pair weight = duplicate multiplicity over
    both orientations of the deduped edge list (the streaming
    weights-instead-of-duplicates semantic); same parity-gated chain,
    weighted sums, integer-exact."""
    return f"""WITH {_louvain_chain(rounds, weighted=True)}
SELECT id AS vertex, label AS community FROM l{rounds}"""


def louvain_multilevel_sql(rounds1: int = 4, rounds2: int = 4) -> str:
    """Mirror of algos.louvain.louvain_multilevel: the phase-1 chain,
    then the classic contraction (inter-community weights + self-loop
    mass), then a weighted phase-2 chain over the coarse graph with
    the ORIGINAL 2m (phase-1 ``mm``) as the modularity denominator,
    mapped back per original vertex. All integer — hash-exact."""
    r1 = rounds1
    steps = [f"m0 AS MATERIALIZED (SELECT id, id AS label FROM c2v)"]
    for r in range(rounds2):
        steps.append(
            f"""u{r} AS MATERIALIZED (
  SELECT l.label AS c, CAST(SUM(dk.k) AS BIGINT) AS tot
  FROM m{r} l JOIN c2dk dk ON dk.id = l.id GROUP BY l.label),
m{r + 1} AS MATERIALIZED (
  SELECT m{r}.id,
         CASE WHEN m{r}.id % 2 = {r % 2}
              THEN COALESCE(b.c, m{r}.label)
              ELSE m{r}.label END AS label
  FROM m{r} LEFT JOIN (
    SELECT id, c FROM (
      SELECT cand.id, cand.c,
             ROW_NUMBER() OVER (
               PARTITION BY cand.id
               ORDER BY ((SELECT m2 FROM mm)
                           * (cand.e + CASE WHEN cand.c = l.label
                                            THEN COALESCE(sf.sw, 0) ELSE 0 END)
                         - dk.k * (u{r}.tot
                                   - CASE WHEN cand.c = l.label
                                          THEN dk.k ELSE 0 END)) DESC,
                        CASE WHEN cand.c = l.label THEN 0 ELSE 1 END ASC,
                        cand.c ASC) AS rn
      FROM (
        SELECT c2ue.b AS id, nl.label AS c, CAST(SUM(c2ue.w) AS BIGINT) AS e
        FROM c2ue JOIN m{r} nl ON nl.id = c2ue.a GROUP BY c2ue.b, nl.label
        UNION ALL
        SELECT id, label AS c, CAST(0 AS BIGINT) AS e FROM m{r}
      ) cand
      JOIN c2dk dk ON dk.id = cand.id
      JOIN m{r} l ON l.id = cand.id
      JOIN u{r} ON u{r}.c = cand.c
      LEFT JOIN c2self sf ON sf.id = cand.id
    ) WHERE rn = 1
  ) b ON b.id = m{r}.id)"""
        )
    body2 = ",\n".join(steps)
    return f"""WITH {_louvain_chain(r1)},
c2e AS MATERIALIZED (
  SELECT LEAST(la.label, lb.label) AS a, GREATEST(la.label, lb.label) AS b,
         CAST(COUNT(*) AS BIGINT) AS w
  FROM cu JOIN l{r1} la ON la.id = cu.a JOIN l{r1} lb ON lb.id = cu.b
  WHERE la.label <> lb.label GROUP BY 1, 2),
c2v AS MATERIALIZED (SELECT a AS id FROM c2e UNION SELECT b FROM c2e),
c2self AS MATERIALIZED (
  SELECT la.label AS id, CAST(COUNT(*) AS BIGINT) AS sw
  FROM cu JOIN l{r1} la ON la.id = cu.a JOIN l{r1} lb ON lb.id = cu.b
  WHERE la.label = lb.label GROUP BY la.label),
c2ue AS MATERIALIZED (SELECT a, b, w FROM c2e UNION ALL SELECT b, a, w FROM c2e),
c2dk AS MATERIALIZED (
  SELECT v.id,
         CAST(COALESCE(i.s, 0) + 2 * COALESCE(sf.sw, 0) AS BIGINT) AS k
  FROM c2v v
  LEFT JOIN (SELECT a AS id, SUM(w) AS s FROM c2ue GROUP BY a) i ON i.id = v.id
  LEFT JOIN c2self sf ON sf.id = v.id),
{body2}
SELECT l1.id AS vertex, COALESCE(m{rounds2}.label, l1.label) AS community
FROM l{r1} l1 LEFT JOIN m{rounds2} ON m{rounds2}.id = l1.label"""


def louvain_modularity_sql(rounds: int = 6) -> str:
    """Modularity Q of the Louvain partition — the same chain as
    louvain_sql, then the integer-aggregate Q tail shared with
    lp_modularity_sql."""
    return f"""WITH {_louvain_chain(rounds)},
ac AS (SELECT p.label, SUM(dk.k) AS s
       FROM l{rounds} p JOIN dk ON dk.id = p.id GROUP BY p.label),
st AS (SELECT (SELECT COUNT(*) FROM cu) AS m,
              (SELECT COUNT(*) FROM cu
               JOIN l{rounds} la ON la.id = cu.a
               JOIN l{rounds} lb ON lb.id = cu.b
               WHERE la.label = lb.label) AS intra,
              (SELECT SUM(s * s) FROM ac) AS ssq)
SELECT CAST(m AS BIGINT) AS num_edges,
       CAST(intra AS BIGINT) AS intra_edges,
       ROUND(CAST(intra AS DOUBLE) / CAST(m AS DOUBLE)
             - CAST(ssq AS DOUBLE) / CAST(4 * m * m AS DOUBLE), 6) AS modularity
FROM st"""


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


def session_stats_sql(gap_seconds: int = 1800) -> str:
    """Mirror of queries.q_session_stats (quantile_disc over the same
    session sizes)."""
    gap_us = gap_seconds * 1_000_000
    return f"""WITH t AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_u,
         LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_u
  FROM events),
m AS (SELECT user_id, ts_u,
             SUM(CASE WHEN prev_u IS NULL OR ts_u - prev_u > {gap_us} THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts_u ROWS UNBOUNDED PRECEDING) AS sess
      FROM t),
s AS (SELECT user_id, sess, CAST(COUNT(*) AS BIGINT) AS n_events
      FROM m GROUP BY user_id, sess)
SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(SUM(n_events) AS BIGINT) AS total_events,
       CAST(MAX(n_events) AS BIGINT) AS max_events,
       CAST(quantile_disc(n_events, 0.5) AS BIGINT) AS p50_events,
       CAST(quantile_disc(n_events, 0.9) AS BIGINT) AS p90_events,
       CAST(quantile_disc(n_events, 0.99) AS BIGINT) AS p99_events
FROM s"""


def triangle_count_sql() -> str:
    return f"""WITH {GRAPH_CTES},
ce AS MATERIALIZED (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b FROM e WHERE src <> dst)
SELECT CAST(COUNT(*) AS BIGINT) AS triangles
FROM ce x JOIN ce y ON y.a = x.b JOIN ce z ON z.a = x.a AND z.b = y.b"""


def balanced_partition_sql(k: int = 8, rounds: int = 4) -> str:
    """Mirror of algos.partition.balanced_partition: unrolled
    size-penalized LP rounds with integer scores
    cnt·⌈V/k⌉ − load·deg(v), parity gate (id + r) % 2 = 0,
    strict-improvement candidates, ties → smallest part, and ranked
    capacity admission (top gains per target part up to cap − load)."""
    parts = [
        "cu AS MATERIALIZED (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b FROM e WHERE src <> dst)",
        "cv AS MATERIALIZED (SELECT a AS id FROM cu UNION SELECT b AS id FROM cu)",
        f"cap AS MATERIALIZED (SELECT (COUNT(*) + {k} - 1) // {k} AS c FROM cv)",
        "uep AS MATERIALIZED (SELECT a, b FROM cu UNION ALL SELECT b, a FROM cu)",
        "udeg AS MATERIALIZED (SELECT a AS id, CAST(COUNT(*) AS BIGINT) AS d FROM uep GROUP BY a)",
        f"p0 AS MATERIALIZED (SELECT id, id % {k} AS part FROM cv)",
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f"ld{r} AS MATERIALIZED (SELECT part, CAST(COUNT(*) AS BIGINT) AS c FROM p{r - 1} GROUP BY part)"
        )
        parts.append(
            f"""cnt{r} AS MATERIALIZED (
  SELECT uep.b AS id, l.part, CAST(COUNT(*) AS BIGINT) AS c
  FROM uep JOIN p{r - 1} l ON l.id = uep.a GROUP BY 1, 2)"""
        )
        parts.append(
            f"""sc{r} AS MATERIALIZED (
  SELECT v.id, pp.part,
         COALESCE(cnt.c, 0) * (SELECT c FROM cap) - COALESCE(ld.c, 0) * udeg.d AS s
  FROM cv v CROSS JOIN (SELECT CAST(unnest(range({k})) AS BIGINT) AS part) pp
  JOIN udeg ON udeg.id = v.id
  LEFT JOIN cnt{r} cnt ON cnt.id = v.id AND cnt.part = pp.part
  LEFT JOIN ld{r} ld ON ld.part = pp.part)"""
        )
        parts.append(
            f"""best{r} AS MATERIALIZED (
  SELECT id, part AS bpart, s AS bs FROM (
    SELECT id, part, s, row_number() OVER (PARTITION BY id ORDER BY s DESC, part) AS rn
    FROM sc{r}) WHERE rn = 1)"""
        )
        parts.append(
            f"""mv{r} AS MATERIALIZED (
  SELECT p.id, b.bpart, b.bs - cur.s AS gain
  FROM p{r - 1} p
  JOIN best{r} b ON b.id = p.id
  JOIN sc{r} cur ON cur.id = p.id AND cur.part = p.part
  WHERE (p.id + {r}) % 2 = 0 AND b.bs > cur.s)"""
        )
        parts.append(
            f"""adm{r} AS MATERIALIZED (
  SELECT id, bpart FROM (
    SELECT id, bpart,
           row_number() OVER (PARTITION BY bpart ORDER BY gain DESC, id) AS rn
    FROM mv{r}) m
  WHERE rn <= GREATEST((SELECT c FROM cap)
                       - COALESCE((SELECT c FROM ld{r} WHERE part = m.bpart), 0), 0))"""
        )
        parts.append(
            f"""p{r} AS MATERIALIZED (
  SELECT p.id, COALESCE(a.bpart, p.part) AS part
  FROM p{r - 1} p LEFT JOIN adm{r} a ON a.id = p.id)"""
        )
    body = ",\n".join(parts)
    return f"""WITH {GRAPH_CTES},
{body}
SELECT id AS vertex, CAST(part AS BIGINT) AS part FROM p{rounds}"""


def triad_census_sql() -> str:
    """Mirror of algos.triads.triad_census: pair codes 1/2/3 per
    unordered linked pair; closed triples = 3 joined pairs a<b<c
    classified via the 27-entry LUT; open triples = wedges whose
    endpoints are NOT linked, classified by the two center rels. The
    LUTs are part of the SPEC (generated once by brute-force
    canonicalization against the standard catalog); the enumeration,
    joins and counting here are independent of the Ray engine."""
    from ..algos.triads import _CLOSED_LUT, _OPEN_LUT, TRIAD_TYPES

    lut27 = ", ".join(
        f"({ab}, {ac}, {bc}, '{TRIAD_TYPES[_CLOSED_LUT[ab, ac, bc]]}')"
        for ab in (1, 2, 3)
        for ac in (1, 2, 3)
        for bc in (1, 2, 3)
    )
    lutopen = ", ".join(
        f"({r1}, {r2}, '{TRIAD_TYPES[_OPEN_LUT[r1, r2]]}')"
        for r1 in (1, 2, 3)
        for r2 in (1, 2, 3)
    )
    return f"""WITH {GRAPH_CTES},
pr AS MATERIALIZED (
  SELECT LEAST(src, dst) AS u, GREATEST(src, dst) AS v,
         MAX(CASE WHEN src < dst THEN 1 ELSE 0 END)
         + 2 * MAX(CASE WHEN src > dst THEN 1 ELSE 0 END) AS code
  FROM e WHERE src <> dst GROUP BY 1, 2),
up AS MATERIALIZED (
  SELECT u AS a, v AS b, code AS rel FROM pr
  UNION ALL
  SELECT v, u, CASE code WHEN 1 THEN 2 WHEN 2 THEN 1 ELSE 3 END FROM pr),
lut27(ab, ac, bc, name) AS (VALUES {lut27}),
lutopen(r1, r2, name) AS (VALUES {lutopen}),
closed AS (
  SELECT l.name FROM pr p1
  JOIN pr p2 ON p2.u = p1.u AND p2.v > p1.v
  JOIN pr p3 ON p3.u = p1.v AND p3.v = p2.v
  JOIN lut27 l ON l.ab = p1.code AND l.ac = p2.code AND l.bc = p3.code),
open_t AS (
  SELECT l.name FROM up u1
  JOIN up u2 ON u2.a = u1.a AND u2.b > u1.b
  LEFT JOIN pr p3 ON p3.u = u1.b AND p3.v = u2.b
  JOIN lutopen l ON l.r1 = u1.rel AND l.r2 = u2.rel
  WHERE p3.u IS NULL),
allt AS (SELECT name FROM closed UNION ALL SELECT name FROM open_t)
SELECT name AS triad_type, CAST(COUNT(*) AS BIGINT) AS cnt FROM allt GROUP BY name"""


def four_cliques_sql() -> str:
    """Mirror of ``algos.cliques.four_clique_count``: each K4 counted
    once at its id-ordered labelling a<b<c<d (same total as the
    implementation's (degree, id) orientation — both count unordered
    4-sets) via a 6-edge join over the canonical simple graph."""
    return f"""WITH {GRAPH_CTES},
cu AS MATERIALIZED (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b FROM e WHERE src <> dst)
SELECT CAST(COUNT(*) AS BIGINT) AS k4
FROM cu ab
JOIN cu ac ON ac.a = ab.a AND ac.b > ab.b
JOIN cu bc ON bc.a = ab.b AND bc.b = ac.b
JOIN cu ad ON ad.a = ab.a AND ad.b > ac.b
JOIN cu bd ON bd.a = ab.b AND bd.b = ad.b
JOIN cu cd ON cd.a = ac.b AND cd.b = ad.b"""


def copurchase_k4_sql(seed: int = 20260818) -> str:
    """Mirror of ``queries.q_copurchase_k4``: distinct within-order
    part pairs, splitmix64 1-in-4 edge sampling, exact K4 count on
    the sampled graph via the id-ordered 6-edge join."""
    gold = 0x9E3779B97F4A7C15
    key = (
        f"xor(xor({_mulmod64('CAST(a AS HUGEINT)', gold)}, "
        f"CAST(b AS HUGEINT)), CAST({seed} AS HUGEINT))"
    )
    return f"""WITH lp AS MATERIALIZED (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
pr AS MATERIALIZED (
  SELECT DISTINCT x.p AS a, y.p AS b FROM lp x JOIN lp y ON x.o = y.o AND x.p < y.p),
kh AS MATERIALIZED (SELECT a, b, {key} AS h FROM pr),
{_mix64_ctes('kh', 'a, b')},
cu AS MATERIALIZED (SELECT a, b FROM mx5 WHERE h % 4 = 0)
SELECT CAST(COUNT(*) AS BIGINT) AS k4_sampled
FROM cu ab
JOIN cu ac ON ac.a = ab.a AND ac.b > ab.b
JOIN cu bc ON bc.a = ab.b AND bc.b = ac.b
JOIN cu ad ON ad.a = ab.a AND ad.b > ac.b
JOIN cu bd ON bd.a = ab.b AND bd.b = ad.b
JOIN cu cd ON cd.a = ac.b AND cd.b = ad.b"""


def bfs_sql(root: int = BFS_ROOT, max_depth: int = 40) -> str:
    return f"""WITH RECURSIVE {GRAPH_CTES},
r(node, dist) AS (
  SELECT CAST({root} AS BIGINT), CAST(0 AS BIGINT)
  UNION
  SELECT e.dst, r.dist + 1 FROM r JOIN e ON e.src = r.node WHERE r.dist < {max_depth}
)
SELECT node AS vertex, MIN(dist) AS dist FROM r GROUP BY node"""


def path_counts_sql(root: int = BFS_ROOT, rounds: int = 16) -> str:
    """Mirror of queries.q_path_counts: unrolled level-synchronous
    rounds; each round sums the previous level's σ into the newly
    reached vertices (the sssp_weighted_sql unroll pattern)."""
    steps = [
        f"p0 AS MATERIALIZED (SELECT id, CASE WHEN id = {root} THEN 0 ELSE -1 END AS dist, "
        f"CASE WHEN id = {root} THEN 1 ELSE 0 END AS cnt FROM v)"
    ]
    for k in range(rounds):
        steps.append(
            f"""p{k + 1} AS MATERIALIZED (
  SELECT p.id,
         CASE WHEN p.dist >= 0 THEN p.dist
              WHEN m.s IS NOT NULL THEN {k + 1} ELSE -1 END AS dist,
         CASE WHEN p.dist >= 0 THEN p.cnt ELSE COALESCE(m.s, 0) END AS cnt
  FROM p{k} p LEFT JOIN (
    SELECT e.dst AS id, SUM(q.cnt) AS s
    FROM e JOIN p{k} q ON q.id = e.src AND q.dist = {k}
    GROUP BY e.dst) m ON m.id = p.id)"""
        )
    body = ",\n".join(steps)
    return f"""WITH {GRAPH_CTES},
{body}
SELECT id AS vertex, CAST(dist AS BIGINT) AS dist,
       CAST(cnt AS BIGINT) AS n_paths
FROM p{rounds} WHERE dist >= 0"""


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


def _bipartite_chain(rounds: int) -> str:
    """Shared WITH-body of the bipartite oracles: canonical simple
    graph CTEs + min-label WCC + unrolled multi-root min-plus BFS,
    ending at ``l{rounds}`` (labels) and ``d{rounds}`` (distances)."""
    INF = 1 << 30
    steps = ["l0 AS MATERIALIZED (SELECT id, id AS label FROM cv)"]
    for k in range(rounds):
        steps.append(
            f"""l{k + 1} AS MATERIALIZED (
  SELECT l{k}.id, LEAST(l{k}.label, COALESCE(m.minlab, l{k}.label)) AS label
  FROM l{k} LEFT JOIN (
    SELECT ue.b AS id, MIN(l.label) AS minlab
    FROM ue JOIN l{k} l ON l.id = ue.a GROUP BY ue.b
  ) m ON m.id = l{k}.id)"""
        )
    steps.append(
        f"""d0 AS MATERIALIZED (
  SELECT id, CASE WHEN id = label THEN 0 ELSE {INF} END AS d FROM l{rounds})"""
    )
    for k in range(rounds):
        steps.append(
            f"""d{k + 1} AS MATERIALIZED (
  SELECT d{k}.id, LEAST(d{k}.d, COALESCE(m.md, {INF})) AS d
  FROM d{k} LEFT JOIN (
    SELECT ue.b AS id, MIN(l.d) + 1 AS md
    FROM ue JOIN d{k} l ON l.id = ue.a GROUP BY ue.b
  ) m ON m.id = d{k}.id)"""
        )
    body = ",\n".join(steps)
    return f"""{GRAPH_CTES},
cu AS MATERIALIZED (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b FROM e WHERE src <> dst),
ue AS MATERIALIZED (SELECT a, b FROM cu UNION ALL SELECT b, a FROM cu),
cv AS MATERIALIZED (SELECT a AS id FROM cu UNION SELECT b AS id FROM cu),
{body}"""


def squares_sql() -> str:
    """Mirror of ``algos.squares.square_count``: wedge self-join over
    both orientations of the canonical simple graph, common-neighbor
    multiplicities per unordered pair, squares = Σ C(cn, 2) / 2 (each
    4-cycle seen once per diagonal) — all integer arithmetic."""
    return f"""WITH {GRAPH_CTES},
cu AS MATERIALIZED (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b FROM e WHERE src <> dst),
ue AS MATERIALIZED (SELECT a, b FROM cu UNION ALL SELECT b, a FROM cu),
cn AS MATERIALIZED (
  SELECT e1.b AS u, e2.b AS w, CAST(COUNT(*) AS BIGINT) AS c
  FROM ue e1 JOIN ue e2 ON e1.a = e2.a AND e1.b < e2.b
  GROUP BY 1, 2)
SELECT CAST(COALESCE(SUM(c * (c - 1) // 2), 0) // 2 AS BIGINT) AS squares,
       CAST(COALESCE(SUM(CASE WHEN c >= 2 THEN 1 ELSE 0 END), 0) AS BIGINT) AS closed_pairs
FROM cn"""


def rich_club_sql() -> str:
    """Mirror of ``algos.stats.rich_club``: undirected degrees over
    the canonical simple graph, per-threshold strictly-greater tails
    of the degree and min-endpoint-degree histograms, one double
    division per row in the same operand order as the numpy side."""
    return f"""WITH {GRAPH_CTES},
cu AS MATERIALIZED (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b FROM e WHERE src <> dst),
ue AS MATERIALIZED (SELECT a, b FROM cu UNION ALL SELECT b, a FROM cu),
udeg AS MATERIALIZED (SELECT a AS id, CAST(COUNT(*) AS BIGINT) AS d FROM ue GROUP BY a),
dh AS MATERIALIZED (SELECT d, CAST(COUNT(*) AS BIGINT) AS c FROM udeg GROUP BY d),
em AS MATERIALIZED (
  SELECT LEAST(da.d, db.d) AS md, CAST(COUNT(*) AS BIGINT) AS e
  FROM cu JOIN udeg da ON da.id = cu.a JOIN udeg db ON db.id = cu.b
  GROUP BY 1),
ks AS MATERIALIZED (SELECT DISTINCT d AS k FROM udeg),
vals AS MATERIALIZED (
  SELECT ks.k,
         CAST((SELECT COALESCE(SUM(c), 0) FROM dh WHERE d > ks.k) AS BIGINT) AS n_vertices,
         CAST((SELECT COALESCE(SUM(e), 0) FROM em WHERE md > ks.k) AS BIGINT) AS n_edges
  FROM ks)
SELECT k, n_vertices, n_edges,
       ROUND(2 * n_edges / (n_vertices * (n_vertices - 1.0)), 6) AS phi
FROM vals WHERE n_vertices >= 2"""


def bipartite_sql(rounds: int = WCC_ROUNDS) -> str:
    """Mirror of ``algos.bipartite.bipartite_check``: min-label WCC
    over the canonical simple graph, BFS distance from each
    component's min-id root via ``rounds`` unrolled min-plus
    relaxations (exact levels once rounds ≥ the largest component
    diameter — same bound the WCC oracle relies on), conflict edges =
    canonical pairs with equal distance parity."""
    return f"""WITH {_bipartite_chain(rounds)},
conf AS MATERIALIZED (
  SELECT lc.label AS component, CAST(COUNT(*) AS BIGINT) AS n
  FROM cu
  JOIN d{rounds} x ON x.id = cu.a
  JOIN d{rounds} y ON y.id = cu.b
  JOIN l{rounds} lc ON lc.id = cu.a
  WHERE x.d % 2 = y.d % 2
  GROUP BY 1),
nv AS MATERIALIZED (
  SELECT label AS component, CAST(COUNT(*) AS BIGINT) AS n_vertices
  FROM l{rounds} GROUP BY 1)
SELECT nv.component, nv.n_vertices,
       COALESCE(conf.n, 0) AS n_conflicts,
       CAST(COALESCE(conf.n, 0) = 0 AS BIGINT) AS is_bipartite
FROM nv LEFT JOIN conf ON conf.component = nv.component"""


def bipartite_colors_sql(rounds: int = WCC_ROUNDS) -> str:
    """Per-vertex twin of ``bipartite_sql``: the BFS-parity coloring
    itself (mirror of ``algos.bipartite.bipartite_colors``)."""
    return f"""WITH {_bipartite_chain(rounds)}
SELECT l.id AS vertex, l.label AS component, d.d % 2 AS color
FROM l{rounds} l JOIN d{rounds} d ON d.id = l.id"""


def msf_sql(rounds: int = 16, doubling: int = 15) -> str:
    """Unrolled Borůvka (mirror of ``algos.msf``): per round, each
    component picks its minimum incident cross edge under the total
    order (w, a, b); hooks are 2-cycle-broken toward the smaller
    component id, then ``doubling`` pointer-doubling joins contract
    every hooking tree to its root (depth ≤ #components ≤ 2^doubling+1).
    Components at least halve per round, so ``rounds`` = 16 covers
    V ≤ 65536; exhausted rounds are no-ops (no cross edges left)."""
    parts = [
        "uw AS MATERIALIZED (SELECT LEAST(src, dst) AS a, GREATEST(src, dst) AS b, SUM(weight) AS w FROM raw_edges WHERE src <> dst GROUP BY 1, 2)",
        "cvw AS MATERIALIZED (SELECT id FROM (SELECT a AS id FROM uw UNION SELECT b FROM uw))",
        "lab0 AS MATERIALIZED (SELECT id, id AS lab FROM cvw)",
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f"""cr{r} AS MATERIALIZED (
  SELECT l1.lab AS ca, l2.lab AS cb, u.w, u.a, u.b
  FROM uw u JOIN lab{r - 1} l1 ON l1.id = u.a JOIN lab{r - 1} l2 ON l2.id = u.b
  WHERE l1.lab <> l2.lab)"""
        )
        parts.append(
            f"""pick{r} AS MATERIALIZED (
  SELECT c, oc, w, a, b FROM (
    SELECT c, oc, w, a, b,
           ROW_NUMBER() OVER (PARTITION BY c ORDER BY w, a, b) AS rn
    FROM (SELECT ca AS c, cb AS oc, w, a, b FROM cr{r}
          UNION ALL SELECT cb, ca, w, a, b FROM cr{r})
  ) WHERE rn = 1)"""
        )
        parts.append(
            f"""p{r}_0 AS MATERIALIZED (
  SELECT cs.c, COALESCE(pk.oc, cs.c) AS p
  FROM (SELECT DISTINCT lab AS c FROM lab{r - 1}) cs
  LEFT JOIN pick{r} pk ON pk.c = cs.c)"""
        )
        parts.append(
            f"""p{r}_b AS MATERIALIZED (
  SELECT x.c, CASE WHEN y.p = x.c AND x.c < x.p THEN x.c ELSE x.p END AS p
  FROM p{r}_0 x JOIN p{r}_0 y ON y.c = x.p)"""
        )
        prev = f"p{r}_b"
        for k in range(doubling):
            parts.append(
                f"""p{r}_d{k} AS MATERIALIZED (
  SELECT x.c, y.p FROM {prev} x JOIN {prev} y ON y.c = x.p)"""
            )
            prev = f"p{r}_d{k}"
        parts.append(
            f"""lab{r} AS MATERIALIZED (
  SELECT l.id, pd.p AS lab FROM lab{r - 1} l JOIN {prev} pd ON pd.c = l.lab)"""
        )
    body = ",\n".join(parts)
    picks = "\n    UNION ALL ".join(
        f"SELECT a, b, w FROM pick{r}" for r in range(1, rounds + 1)
    )
    return f"""WITH raw_edges AS ({RAW_EDGES_SQL}),
{body}
SELECT DISTINCT a AS src, b AS dst, w AS weight FROM ({picks})"""


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


def seed_partition_sql(k: int = 8, scale: int = 1 << 16) -> str:
    """Mirror of data_ops.ann.seed_partition: both sides quantize every
    coordinate to ⌊x·scale + ½⌋ as int64 (float32 → DOUBLE is exact,
    so floor agrees bit-for-bit) and take the integer-dot argmax with
    ties to the smaller seed id — no float comparison anywhere."""
    q = f"list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE)*{float(scale)} + 0.5) AS BIGINT))"
    return f"""WITH s AS (
  SELECT vec_id AS seed_id, {q} AS qs
  FROM embeddings ORDER BY vec_id LIMIT {k}),
v AS (
  SELECT vec_id, {q} AS qv
  FROM embeddings),
d AS (
  SELECT v.vec_id, s.seed_id,
         CAST(list_sum(list_transform(list_zip(v.qv, s.qs), p -> p[1] * p[2])) AS BIGINT) AS score
  FROM v CROSS JOIN s),
r AS (SELECT vec_id, seed_id, score,
             ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY score DESC, seed_id ASC) AS rn
      FROM d)
SELECT vec_id, seed_id, score FROM r WHERE rn = 1"""


def kmeans_quantized_sql(k: int = 8, scale: int = 1 << 16) -> str:
    """Mirror of data_ops.ann.kmeans_quantized (one Lloyd iteration):
    quantize, assign to the k smallest-id seeds by int64-dot argmax,
    per-cluster per-dimension integer sums, centroid = ⌊mean⌋ via the
    offset trick ((S + n·M)//n − M floors with DuckDB's truncating //),
    reassign. Pure integers end to end, so it hash-matches the Ray
    side in any block layout."""
    q = f"list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE)*{float(scale)} + 0.5) AS BIGINT))"
    m = 1 << 20  # ≥ max|qv| for |x| ≤ 16, keeps S + n·M ≥ 0
    return f"""WITH s AS (
  SELECT vec_id AS cluster_id, {q} AS qs
  FROM embeddings ORDER BY vec_id LIMIT {k}),
v AS (
  SELECT vec_id, {q} AS qv
  FROM embeddings),
d0 AS (
  SELECT v.vec_id, s.cluster_id, v.qv,
         CAST(list_sum(list_transform(list_zip(v.qv, s.qs), p -> p[1] * p[2])) AS BIGINT) AS score
  FROM v CROSS JOIN s),
a0 AS (
  SELECT vec_id, cluster_id, qv
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY score DESC, cluster_id ASC) AS rn FROM d0)
  WHERE rn = 1),
e AS (
  SELECT cluster_id, unnest(qv) AS val, unnest(range(1, len(qv)+1)) AS dim
  FROM a0),
g AS (
  SELECT e.cluster_id, e.dim,
         CAST(SUM(e.val) AS BIGINT) AS sv, CAST(COUNT(*) AS BIGINT) AS n
  FROM e GROUP BY e.cluster_id, e.dim),
c1 AS (
  SELECT cluster_id, list((sv + n*{m}) // n - {m} ORDER BY dim) AS cv
  FROM g GROUP BY cluster_id),
cf AS (
  SELECT s.cluster_id, COALESCE(c1.cv, s.qs) AS cv
  FROM s LEFT JOIN c1 USING (cluster_id)),
d1 AS (
  SELECT v.vec_id, cf.cluster_id,
         CAST(list_sum(list_transform(list_zip(v.qv, cf.cv), p -> p[1] * p[2])) AS BIGINT) AS score
  FROM v CROSS JOIN cf)
SELECT vec_id, cluster_id, score
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY score DESC, cluster_id ASC) AS rn FROM d1)
WHERE rn = 1"""


def semantic_dedup_sql(
    k: int = 8, threshold: float = 0.4, scale: int = 1 << 16, rounds: int = 24,
) -> str:
    """Mirror of data_ops.dedup.semantic_dedup (SemDeDup): the
    kmeans_quantized_sql one-iteration assignment, exact-cosine pairs
    within each cluster at ``threshold``, ``rounds`` min-label sweeps
    over the undirected pair graph (idempotent past the fixpoint),
    keep = vec_id equals its component minimum."""
    q = f"list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE)*{float(scale)} + 0.5) AS BIGINT))"
    m = 1 << 20
    lab_steps = ["l0 AS MATERIALIZED (SELECT id, id AS lab FROM pv)"]
    for r in range(rounds):
        lab_steps.append(f"""l{r + 1} AS MATERIALIZED (
  SELECT pv.id, LEAST(l{r}.lab, COALESCE(m{r}.mn, l{r}.lab)) AS lab
  FROM pv JOIN l{r} ON l{r}.id = pv.id
  LEFT JOIN (
    SELECT pu.b AS id, MIN(l{r}.lab) AS mn
    FROM pu JOIN l{r} ON l{r}.id = pu.a
    GROUP BY pu.b
  ) m{r} ON m{r}.id = pv.id)""")
    labs = ",\n".join(lab_steps)
    return f"""WITH s AS (
  SELECT vec_id AS cluster_id, {q} AS qs
  FROM embeddings ORDER BY vec_id LIMIT {k}),
v AS MATERIALIZED (SELECT vec_id, {q} AS qv FROM embeddings),
d0 AS (
  SELECT v.vec_id, s.cluster_id, v.qv,
         CAST(list_sum(list_transform(list_zip(v.qv, s.qs), p -> p[1] * p[2])) AS BIGINT) AS score
  FROM v CROSS JOIN s),
a0 AS MATERIALIZED (
  SELECT vec_id, cluster_id, qv
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY score DESC, cluster_id ASC) AS rn FROM d0)
  WHERE rn = 1),
e AS (
  SELECT cluster_id, unnest(qv) AS val, unnest(range(1, len(qv)+1)) AS dim
  FROM a0),
g AS (
  SELECT e.cluster_id, e.dim,
         CAST(SUM(e.val) AS BIGINT) AS sv, CAST(COUNT(*) AS BIGINT) AS n
  FROM e GROUP BY e.cluster_id, e.dim),
c1 AS (
  SELECT cluster_id, list((sv + n*{m}) // n - {m} ORDER BY dim) AS cv
  FROM g GROUP BY cluster_id),
cf AS (
  SELECT s.cluster_id, COALESCE(c1.cv, s.qs) AS cv
  FROM s LEFT JOIN c1 USING (cluster_id)),
d1 AS (
  SELECT v.vec_id, cf.cluster_id,
         CAST(list_sum(list_transform(list_zip(v.qv, cf.cv), p -> p[1] * p[2])) AS BIGINT) AS score
  FROM v CROSS JOIN cf),
codes AS MATERIALIZED (
  SELECT vec_id, cluster_id
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY score DESC, cluster_id ASC) AS rn FROM d1)
  WHERE rn = 1),
vf AS MATERIALIZED (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
  FROM embeddings),
pr AS MATERIALIZED (
  SELECT ca.vec_id AS a, cb.vec_id AS b
  FROM codes ca JOIN codes cb
    ON ca.cluster_id = cb.cluster_id AND ca.vec_id < cb.vec_id
  JOIN vf va ON va.vec_id = ca.vec_id
  JOIN vf vb ON vb.vec_id = cb.vec_id
  WHERE list_cosine_similarity(va.vec, vb.vec) >= {threshold}),
pu AS MATERIALIZED (SELECT a, b FROM pr UNION ALL SELECT b, a FROM pr),
pv AS MATERIALIZED (SELECT DISTINCT a AS id FROM pu),
{labs},
rep AS (SELECT id, lab FROM l{rounds})
SELECT codes.vec_id, codes.cluster_id,
       COALESCE(rep.lab, codes.vec_id) AS rep_id,
       codes.vec_id = COALESCE(rep.lab, codes.vec_id) AS keep
FROM codes LEFT JOIN rep ON rep.id = codes.vec_id"""


def _pq_ctes(m: int, k: int, dim: int, scale: int) -> str:
    """Shared CTE prefix of the PQ oracles: quantize, slice into
    subspaces, one Lloyd round per (subspace, code), final codebook
    ``cf`` and reassignment scores ``d1``."""
    q = f"list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE)*{float(scale)} + 0.5) AS BIGINT))"
    sd = dim // m
    M = 1 << 20
    return f"""s AS (
  SELECT vec_id AS code_id, {q} AS qs
  FROM embeddings ORDER BY vec_id LIMIT {k}),
v AS (SELECT vec_id, {q} AS qv FROM embeddings),
sub AS (SELECT unnest(range({m})) AS sp),
vs AS (SELECT vec_id, sp, list_slice(qv, sp*{sd}+1, (sp+1)*{sd}) AS q
       FROM v CROSS JOIN sub),
ss AS (SELECT code_id, sp, list_slice(qs, sp*{sd}+1, (sp+1)*{sd}) AS q
       FROM s CROSS JOIN sub),
d0 AS (
  SELECT vs.vec_id, vs.sp, ss.code_id, vs.q AS qv,
         CAST(list_sum(list_transform(list_zip(vs.q, ss.q), p -> p[1] * p[2])) AS BIGINT) AS score
  FROM vs JOIN ss ON ss.sp = vs.sp),
a0 AS (
  SELECT vec_id, sp, code_id, qv
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, sp ORDER BY score DESC, code_id ASC) AS rn FROM d0)
  WHERE rn = 1),
e AS (
  SELECT sp, code_id, unnest(qv) AS val, unnest(range(1, len(qv)+1)) AS dim
  FROM a0),
g AS (
  SELECT sp, code_id, dim, CAST(SUM(val) AS BIGINT) AS sv, CAST(COUNT(*) AS BIGINT) AS n
  FROM e GROUP BY 1, 2, 3),
c1 AS (
  SELECT sp, code_id, list((sv + n*{M}) // n - {M} ORDER BY dim) AS cv
  FROM g GROUP BY sp, code_id),
cf AS (
  SELECT ss.sp, ss.code_id, COALESCE(c1.cv, ss.q) AS cv
  FROM ss LEFT JOIN c1 USING (sp, code_id)),
d1 AS (
  SELECT vs.vec_id, vs.sp, cf.code_id,
         CAST(list_sum(list_transform(list_zip(vs.q, cf.cv), p -> p[1] * p[2])) AS BIGINT) AS score
  FROM vs JOIN cf ON cf.sp = vs.sp)"""


def pq_encode_sql(m: int = 4, k: int = 16, dim: int = 64, scale: int = 1 << 16) -> str:
    """Mirror of data_ops.ann.pq_encode (one Lloyd iteration per
    subspace codebook, then encode): the kmeans_quantized_sql integer
    pipeline lifted to a (subspace, code) key via list_slice."""
    return f"""WITH {_pq_ctes(m, k, dim, scale)}
SELECT vec_id, CAST(sp AS BIGINT) AS subspace, code_id, score
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, sp ORDER BY score DESC, code_id ASC) AS rn FROM d1)
WHERE rn = 1"""


def knn_pq_sql(
    nq: int = 8, topk: int = 10, m: int = 4, k: int = 16,
    dim: int = 64, scale: int = 1 << 16,
) -> str:
    """Mirror of data_ops.ann.knn_pq: asymmetric-distance search —
    every corpus vector's final PQ codes scored against the nq
    smallest-id query vectors via Σ_s ⟨q_s, codeword⟩, top-k per query
    by (score desc, vec_id)."""
    return f"""WITH {_pq_ctes(m, k, dim, scale)},
codes AS (
  SELECT vec_id, sp, code_id
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, sp ORDER BY score DESC, code_id ASC) AS rn FROM d1)
  WHERE rn = 1),
qs AS (SELECT vec_id AS query_id FROM embeddings ORDER BY vec_id LIMIT {nq}),
qvs AS (SELECT vs.vec_id AS query_id, vs.sp, vs.q
        FROM vs JOIN qs ON qs.query_id = vs.vec_id),
adc AS (
  SELECT qvs.query_id, c.vec_id,
         CAST(SUM(list_sum(list_transform(list_zip(qvs.q, cf.cv), p -> p[1] * p[2]))) AS BIGINT) AS score
  FROM codes c
  JOIN cf ON cf.sp = c.sp AND cf.code_id = c.code_id
  JOIN qvs ON qvs.sp = c.sp
  GROUP BY 1, 2)
SELECT query_id, CAST(rank AS BIGINT) AS rank, vec_id, score
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id ASC) AS rank FROM adc)
WHERE rank <= {topk}"""


def knn_ivf_sql(
    nq: int = 5, topk: int = 10, k: int = 16, nprobe: int = 4,
    iters: int = 2, dim: int = 64, scale: int = 1 << 16,
) -> str:
    """Mirror of data_ops.ann.knn_ivf_spherical: integer-exact
    SPHERICAL k-means coarse quantizer (unit-quantized seeds, int64
    max-dot assignment, HUGEINT direction-sum renormalization through
    the deterministic float chain floor(CAST(s AS DOUBLE)/sqrt(CAST(
    nsq AS DOUBLE))·scale+½)), then the shared probe/rank tail:
    top-nprobe centroids per query by int64 dot, candidates ranked by
    ROUND(cosine, 5)."""
    fs = float(scale)
    uq = (
        "CASE WHEN {nsq} = 0 THEN list_transform({q}, e -> CAST(0 AS BIGINT)) "
        "ELSE list_transform({q}, e -> CAST(floor(CAST(e AS DOUBLE) / "
        f"sqrt(CAST({{nsq}} AS DOUBLE)) * {fs} + 0.5) AS BIGINT)) END"
    )
    parts = [f"""v0 AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE)*{fs} + 0.5) AS BIGINT)) AS qv
  FROM embeddings),
vu AS MATERIALIZED (
  SELECT vec_id, qv, {uq.format(q="qv", nsq="nsq")} AS uq
  FROM (SELECT vec_id, qv, list_sum(list_transform(qv, e -> e*e)) AS nsq FROM v0)),
c0 AS MATERIALIZED (
  SELECT vec_id AS code_id, uq AS cv FROM vu ORDER BY vec_id LIMIT {k})"""]
    for t in range(1, iters + 1):
        parts.append(f"""d{t} AS (
  SELECT vu.vec_id, c.code_id,
         list_sum(list_transform(list_zip(vu.qv, c.cv), p -> p[1]*p[2])) AS score
  FROM vu CROSS JOIN c{t-1} c),
a{t} AS MATERIALIZED (
  SELECT vec_id, code_id
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY score DESC, code_id ASC) AS rn FROM d{t})
  WHERE rn = 1),
e{t} AS (
  SELECT a.code_id, unnest(vu.uq) AS val, unnest(range(len(vu.uq))) AS dim
  FROM a{t} a JOIN vu ON vu.vec_id = a.vec_id),
g{t} AS (
  SELECT code_id, dim, CAST(SUM(val) AS BIGINT) AS sv FROM e{t} GROUP BY 1, 2),
nn{t} AS (
  SELECT code_id, SUM(CAST(sv AS HUGEINT) * sv) AS nsq FROM g{t} GROUP BY 1),
cn{t} AS (
  SELECT g.code_id,
         list(CAST(floor(CAST(g.sv AS DOUBLE) / sqrt(CAST(nn.nsq AS DOUBLE)) * {fs} + 0.5) AS BIGINT)
              ORDER BY g.dim) AS cv
  FROM g{t} g JOIN nn{t} nn USING (code_id)
  WHERE nn.nsq > 0
  GROUP BY g.code_id),
c{t} AS MATERIALIZED (
  SELECT p.code_id, COALESCE(n.cv, p.cv) AS cv
  FROM c{t-1} p LEFT JOIN cn{t} n USING (code_id))""")
    parts.append(f"""fd AS MATERIALIZED (
  SELECT vu.vec_id, c.code_id,
         list_sum(list_transform(list_zip(vu.qv, c.cv), p -> p[1]*p[2])) AS score
  FROM vu CROSS JOIN c{iters} c),
codes AS (
  SELECT vec_id, code_id
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY score DESC, code_id ASC) AS rn FROM fd)
  WHERE rn = 1),
qs AS (SELECT vec_id AS query_id FROM embeddings ORDER BY vec_id LIMIT {nq}),
probe AS (
  SELECT query_id, code_id
  FROM (SELECT fd.vec_id AS query_id, fd.code_id,
               ROW_NUMBER() OVER (PARTITION BY fd.vec_id ORDER BY fd.score DESC, fd.code_id ASC) AS pr
        FROM fd JOIN qs ON qs.query_id = fd.vec_id)
  WHERE pr <= {nprobe}),
vf AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
       FROM embeddings),
cand AS (SELECT p.query_id, c.vec_id FROM codes c JOIN probe p ON p.code_id = c.code_id),
scored AS (
  SELECT cand.query_id, cand.vec_id,
         ROUND(list_cosine_similarity(qv.vec, cv.vec), 5) AS cos
  FROM cand JOIN vf qv ON qv.vec_id = cand.query_id
            JOIN vf cv ON cv.vec_id = cand.vec_id)
SELECT query_id, CAST(rank AS BIGINT) AS rank, vec_id, cos
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id ASC) AS rank FROM scored)
WHERE rank <= {topk}""")
    return "WITH " + ",\n".join(parts)


def knn_ivf_q_sql(
    nq: int = 8, topk: int = 10, k: int = 8, nprobe: int = 2,
    dim: int = 64, scale: int = 1 << 16,
) -> str:
    """Mirror of data_ops.ann.knn_ivf_quantized: the _pq_ctes integer
    Lloyd with one subspace as the coarse quantizer, per-query
    top-nprobe probe lists, candidates ranked by ROUND(cosine, 5)."""
    return f"""WITH {_pq_ctes(1, k, dim, scale)},
codes AS (
  SELECT vec_id, code_id
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, sp ORDER BY score DESC, code_id ASC) AS rn FROM d1)
  WHERE rn = 1),
qs AS (SELECT vec_id AS query_id FROM embeddings ORDER BY vec_id LIMIT {nq}),
qscore AS (SELECT d1.vec_id AS query_id, d1.code_id, d1.score
           FROM d1 JOIN qs ON qs.query_id = d1.vec_id),
probe AS (
  SELECT query_id, code_id
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, code_id ASC) AS pr FROM qscore)
  WHERE pr <= {nprobe}),
vf AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
       FROM embeddings),
cand AS (SELECT p.query_id, c.vec_id FROM codes c JOIN probe p ON p.code_id = c.code_id),
scored AS (
  SELECT cand.query_id, cand.vec_id,
         ROUND(list_cosine_similarity(qv.vec, cv.vec), 5) AS cos
  FROM cand JOIN vf qv ON qv.vec_id = cand.query_id
            JOIN vf cv ON cv.vec_id = cand.vec_id)
SELECT query_id, CAST(rank AS BIGINT) AS rank, vec_id, cos
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id ASC) AS rank FROM scored)
WHERE rank <= {topk}"""


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


def scc_sql() -> str:
    """True SCC via recursive mutual reachability (component = min id
    in the SCC — reference partition semantics, tarjan_scc.h:56-206).
    The link graph is a DAG by construction (edges point up the id
    offsets), so the closure stays small; the CTE is still the honest
    independent computation, not a hardcoded singleton map."""
    return f"""WITH RECURSIVE {GRAPH_CTES},
reach AS (
  SELECT id AS a, id AS b FROM v
  UNION
  SELECT r.a, e.dst AS b FROM reach r JOIN e ON e.src = r.b
)
SELECT r1.a AS vertex, CAST(MIN(r1.b) AS BIGINT) AS component
FROM reach r1 JOIN reach r2 ON r1.a = r2.b AND r1.b = r2.a
GROUP BY r1.a"""


def edge_percolation_sql(
    pcts=(30, 60, 90), seed: int = 20260824, rounds: int = 40
) -> str:
    """Mirror of queries.q_edge_percolation: one shared splitmix64
    edge-coin CTE, then per retention level a min-label WCC unroll
    over the surviving edges plus singleton isolated vertices."""
    gold = 0x9E3779B97F4A7C15
    raw = (
        f"xor(xor({_mulmod64('CAST(src AS HUGEINT)', gold)}, "
        f"CAST(dst AS HUGEINT)), CAST({seed} AS HUGEINT))"
    )
    blocks, finals = [], []
    for p in pcts:
        pre = f"p{p}"
        blocks.append(
            f"{pre}e AS MATERIALIZED (SELECT src, dst FROM pc5 WHERE h % 100 < {p})"
        )
        blocks.append(
            f"{pre}u AS MATERIALIZED (SELECT src AS a, dst AS b FROM {pre}e "
            f"UNION SELECT dst, src FROM {pre}e)"
        )
        blocks.append(
            f"{pre}v AS MATERIALIZED (SELECT a AS id FROM {pre}u UNION SELECT b FROM {pre}u)"
        )
        blocks.append(f"{pre}l0 AS MATERIALIZED (SELECT id, id AS label FROM {pre}v)")
        for k in range(rounds):
            blocks.append(
                f"""{pre}l{k + 1} AS MATERIALIZED (
  SELECT {pre}l{k}.id, LEAST({pre}l{k}.label, COALESCE(m.minlab, {pre}l{k}.label)) AS label
  FROM {pre}l{k} LEFT JOIN (
    SELECT {pre}u.b AS id, MIN(l.label) AS minlab
    FROM {pre}u JOIN {pre}l{k} l ON l.id = {pre}u.a GROUP BY {pre}u.b
  ) m ON m.id = {pre}l{k}.id)"""
            )
        finals.append(
            f"""SELECT CAST({p} AS BIGINT) AS pct,
       CAST((SELECT COUNT(*) FROM {pre}e) AS BIGINT) AS n_edges,
       CAST((SELECT COUNT(DISTINCT label) FROM {pre}l{rounds})
          + (SELECT COUNT(*) FROM v WHERE id NOT IN (SELECT id FROM {pre}v)) AS BIGINT) AS n_components,
       CAST(GREATEST(
          COALESCE((SELECT MAX(c) FROM (SELECT COUNT(*) AS c FROM {pre}l{rounds} GROUP BY label)), 0),
          CASE WHEN (SELECT COUNT(*) FROM v WHERE id NOT IN (SELECT id FROM {pre}v)) > 0
               THEN 1 ELSE 0 END) AS BIGINT) AS largest_component"""
        )
    body = ",\n".join(blocks)
    final = "\nUNION ALL\n".join(finals)
    return f"""WITH {GRAPH_CTES},
pc0 AS (SELECT src, dst, {raw} AS h FROM e),
{_mix64_ctes("pc0", "src, dst", prefix="pc")},
{body}
{final}"""


def influence_cascade_sql(
    num_seeds: int = 4, pct: int = 50, seed: int = 20260823, max_depth: int = 40
) -> str:
    """Mirror of queries.q_influence_cascade: the same splitmix64 edge
    coin, one seed-carrying recursive BFS over the transmitting
    edges."""
    gold = 0x9E3779B97F4A7C15
    raw = (
        f"xor(xor({_mulmod64('CAST(src AS HUGEINT)', gold)}, "
        f"CAST(dst AS HUGEINT)), CAST({seed} AS HUGEINT))"
    )
    return f"""WITH RECURSIVE {GRAPH_CTES},
eh AS (SELECT src, dst, {raw} AS h FROM e),
{_mix64_ctes("eh", "src, dst", prefix="ic")},
fe AS MATERIALIZED (SELECT src, dst FROM ic5 WHERE h % 100 < {pct}),
r(seed, node, dist) AS (
  SELECT id, id, CAST(0 AS BIGINT)
  FROM (SELECT id FROM v ORDER BY id LIMIT {num_seeds})
  UNION
  SELECT r.seed, fe.dst, r.dist + 1
  FROM r JOIN fe ON fe.src = r.node WHERE r.dist < {max_depth}
),
md AS (SELECT seed, node, MIN(dist) AS d FROM r GROUP BY seed, node)
SELECT seed, CAST(COUNT(*) AS BIGINT) AS n_reached,
       CAST(MAX(d) AS BIGINT) AS max_depth
FROM md GROUP BY seed"""


def hub_attack_sql(k: int = 20, rounds: int = 32) -> str:
    """Mirror of queries.q_hub_attack: top-k in-degree hubs removed,
    min-label WCC unrolled over the survivor graph (idempotent past
    fixpoint), isolated survivors counted as singleton components."""
    steps = ["a0 AS MATERIALIZED (SELECT id, id AS label FROM fv)"]
    for i in range(rounds):
        steps.append(
            f"""a{i + 1} AS MATERIALIZED (
  SELECT a{i}.id, LEAST(a{i}.label, COALESCE(m.minlab, a{i}.label)) AS label
  FROM a{i} LEFT JOIN (
    SELECT fu.b AS id, MIN(l.label) AS minlab
    FROM fu JOIN a{i} l ON l.id = fu.a GROUP BY fu.b
  ) m ON m.id = a{i}.id)"""
        )
    body = ",\n".join(steps)
    return f"""WITH {GRAPH_CTES},
indeg AS (SELECT dst, CAST(COUNT(*) AS BIGINT) AS c FROM e GROUP BY dst),
hubs AS MATERIALIZED (SELECT dst AS id FROM indeg ORDER BY c DESC, dst LIMIT {k}),
fe AS MATERIALIZED (
  SELECT e.src, e.dst FROM e
  WHERE e.src NOT IN (SELECT id FROM hubs) AND e.dst NOT IN (SELECT id FROM hubs)),
fu AS MATERIALIZED (SELECT src AS a, dst AS b FROM fe UNION SELECT dst, src FROM fe),
fv AS MATERIALIZED (SELECT a AS id FROM fu UNION SELECT b FROM fu),
{body},
comp AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS sz FROM a{rounds} GROUP BY label),
iso AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM v
        WHERE id NOT IN (SELECT id FROM hubs) AND id NOT IN (SELECT id FROM fv))
SELECT CAST((SELECT COUNT(*) FROM v) - (SELECT COUNT(*) FROM hubs) AS BIGINT) AS n_survivors,
       CAST((SELECT COUNT(*) FROM comp) + (SELECT n FROM iso) AS BIGINT) AS n_components,
       CAST(GREATEST((SELECT MAX(sz) FROM comp),
                     CASE WHEN (SELECT n FROM iso) > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS largest_component"""


def induced_subgraph_sql(pct: int = 10, seed: int = 20260821) -> str:
    """Mirror of queries.q_induced_subgraph (hash-sampled vertex set,
    both-endpoint filter)."""
    gold = 0x9E3779B97F4A7C15
    raw = f"xor({_mulmod64('CAST(id AS HUGEINT)', gold)}, CAST({seed} AS HUGEINT))"
    return f"""WITH {GRAPH_CTES},
vh AS (SELECT id, {raw} AS h FROM v),
{_mix64_ctes("vh", "id", prefix="iv")},
samp AS MATERIALIZED (SELECT id FROM iv5 WHERE h % {pct} = 0)
SELECT e.src, e.dst
FROM e JOIN samp s1 ON s1.id = e.src JOIN samp s2 ON s2.id = e.dst"""


def doc_sample_sql(k: int = 500, seed: int = 20260822) -> str:
    """Mirror of queries.q_doc_sample (hash-ranked uniform sample)."""
    gold = 0x9E3779B97F4A7C15
    raw = f"xor({_mulmod64('CAST(doc_id AS HUGEINT)', gold)}, CAST({seed} AS HUGEINT))"
    return f"""WITH d0 AS (SELECT doc_id, n_chars, {raw} AS h FROM documents),
{_mix64_ctes("d0", "doc_id, n_chars", prefix="ds")}
SELECT doc_id, n_chars FROM ds5 ORDER BY h, doc_id LIMIT {k}"""


def config_model_sql(seed: int = 20260820) -> str:
    """Mirror of queries.q_config_model: the same splitmix64 stub
    ranks (ORDER BY unsigned hash, src, dst), rank-matched, pair
    multiplicities."""
    gold = 0x9E3779B97F4A7C15
    raw = lambda s: (  # noqa: E731
        f"xor(xor({_mulmod64('CAST(src AS HUGEINT)', gold)}, "
        f"CAST(dst AS HUGEINT)), CAST({s} AS HUGEINT))"
    )
    return f"""WITH {GRAPH_CTES},
ro AS (SELECT src, dst, {raw(seed)} AS h FROM e),
{_mix64_ctes("ro", "src, dst", prefix="co")},
ri AS (SELECT src, dst, {raw(seed + 1)} AS h FROM e),
{_mix64_ctes("ri", "src, dst", prefix="ci")},
o AS (SELECT src, ROW_NUMBER() OVER (ORDER BY h, src, dst) AS rn FROM co5),
i AS (SELECT dst, ROW_NUMBER() OVER (ORDER BY h, src, dst) AS rn FROM ci5)
SELECT o.src, i.dst, CAST(COUNT(*) AS BIGINT) AS m
FROM o JOIN i USING (rn) GROUP BY 1, 2"""


def null_model_triangles_sql(seed: int = 20260820) -> str:
    """Mirror of queries.q_null_model_triangles: the config_model
    rewiring CTEs + canonical triangle 3-joins on both graphs."""
    gold = 0x9E3779B97F4A7C15
    raw = lambda s: (  # noqa: E731
        f"xor(xor({_mulmod64('CAST(src AS HUGEINT)', gold)}, "
        f"CAST(dst AS HUGEINT)), CAST({s} AS HUGEINT))"
    )
    return f"""WITH {GRAPH_CTES},
ro AS (SELECT src, dst, {raw(seed)} AS h FROM e),
{_mix64_ctes("ro", "src, dst", prefix="co")},
ri AS (SELECT src, dst, {raw(seed + 1)} AS h FROM e),
{_mix64_ctes("ri", "src, dst", prefix="ci")},
o AS (SELECT src, ROW_NUMBER() OVER (ORDER BY h, src, dst) AS rn FROM co5),
i AS (SELECT dst, ROW_NUMBER() OVER (ORDER BY h, src, dst) AS rn FROM ci5),
ne AS MATERIALIZED (SELECT DISTINCT o.src, i.dst FROM o JOIN i USING (rn)),
nc AS MATERIALIZED (
  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b FROM ne WHERE src <> dst),
rc AS MATERIALIZED (
  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b FROM e WHERE src <> dst),
tr AS (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM rc x
       JOIN rc y ON y.a = x.b JOIN rc z ON z.a = x.a AND z.b = y.b),
tn AS (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM nc x
       JOIN nc y ON y.a = x.b JOIN nc z ON z.a = x.a AND z.b = y.b)
SELECT (SELECT t FROM tr) AS tc_real, (SELECT t FROM tn) AS tc_null,
       ROUND(CAST((SELECT t FROM tr) AS DOUBLE) / GREATEST((SELECT t FROM tn), 1), 6) AS ratio"""


def onion_sql() -> str:
    """Mirror of algos.kcore.onion_layers: wave peeling on the
    canonical undirected simple graph as a state-carrying recursive
    CTE (the coloring_sql pattern — edges carried in-state and
    shrinking, a kind-2 control row carries (k, round))."""
    return f"""WITH RECURSIVE {GRAPH_CTES},
cu AS MATERIALIZED (
  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
  FROM e WHERE src <> dst),
ud AS (SELECT a, b FROM (SELECT a, b FROM cu UNION ALL SELECT b, a FROM cu)),
st(kind, a, b, layer, core) AS (
  SELECT * FROM (
    SELECT 0 AS kind, a, b, CAST(NULL AS BIGINT) AS layer, CAST(NULL AS BIGINT) AS core FROM ud
    UNION ALL
    SELECT 1, id, NULL, CAST(NULL AS BIGINT), CAST(NULL AS BIGINT) FROM v
    UNION ALL
    SELECT 2, 0, 0, NULL, NULL)
  UNION ALL
  SELECT * FROM (
    WITH prev_e AS MATERIALIZED (SELECT a, b FROM st WHERE kind = 0),
         prev_v AS MATERIALIZED (SELECT a AS id, layer, core FROM st WHERE kind = 1),
         prev_k AS MATERIALIZED (SELECT a AS k, b AS rnd FROM st WHERE kind = 2),
         alive AS MATERIALIZED (SELECT id FROM prev_v WHERE layer IS NULL),
         dg AS MATERIALIZED (
           SELECT alive.id, COALESCE(c.cnt, 0) AS d
           FROM alive LEFT JOIN
             (SELECT a, COUNT(*) AS cnt FROM prev_e GROUP BY a) c ON c.a = alive.id),
         nk AS MATERIALIZED (
           SELECT GREATEST((SELECT k FROM prev_k), (SELECT MIN(d) FROM dg)) AS k,
                  (SELECT rnd FROM prev_k) + 1 AS rnd),
         peel AS MATERIALIZED (SELECT dg.id FROM dg, nk WHERE dg.d <= nk.k)
    SELECT 0 AS kind, pe.a, pe.b, CAST(NULL AS BIGINT) AS layer, CAST(NULL AS BIGINT) AS core
    FROM prev_e pe
    WHERE pe.a NOT IN (SELECT id FROM peel) AND pe.b NOT IN (SELECT id FROM peel)
    UNION ALL
    SELECT 1, v0.id, NULL,
           COALESCE(v0.layer, CASE WHEN p.id IS NOT NULL THEN nk.rnd END),
           COALESCE(v0.core, CASE WHEN p.id IS NOT NULL THEN nk.k END)
    FROM prev_v v0 LEFT JOIN peel p ON p.id = v0.id CROSS JOIN nk
    UNION ALL
    SELECT 2, nk.k, nk.rnd, NULL, NULL FROM nk)
  WHERE EXISTS (SELECT 1 FROM st WHERE kind = 1 AND layer IS NULL)
)
SELECT a AS vertex, CAST(MAX(layer) AS BIGINT) AS layer,
       CAST(MAX(core) AS BIGINT) AS core
FROM st WHERE kind = 1 GROUP BY a"""


def scc_condensation_sql() -> str:
    """Mirror of queries.q_scc_condensation: SCC labels from the same
    mutual-reachability CTE as scc_sql, then the distinct
    inter-component edge pairs."""
    return f"""WITH RECURSIVE {GRAPH_CTES},
reach AS (
  SELECT id AS a, id AS b FROM v
  UNION
  SELECT r.a, e.dst AS b FROM reach r JOIN e ON e.src = r.b
),
comp AS MATERIALIZED (
  SELECT r1.a AS vertex, MIN(r1.b) AS component
  FROM reach r1 JOIN reach r2 ON r1.a = r2.b AND r1.b = r2.a
  GROUP BY r1.a)
SELECT DISTINCT CAST(cs.component AS BIGINT) AS comp_src,
       CAST(cd.component AS BIGINT) AS comp_dst
FROM e JOIN comp cs ON cs.vertex = e.src
       JOIN comp cd ON cd.vertex = e.dst
WHERE cs.component <> cd.component"""


def doc_language_id_sql() -> str:
    """Mirror of data_ops.text.LanguageId — the same RE2 token counts
    over the same double-space-normalized head, the same first-wins
    argmax cascade, CJK override last."""
    letter = "a-zäöüßéèêàùâçñ"
    langs = {
        "en": "the|and|of|to|in|is|that|with|for",
        "de": "der|die|und|das|ist|nicht|ein|mit",
        "es": "el|la|de|que|los|una|por|con",
        "fr": "le|la|les|des|une|est|dans|pour",
    }
    marks = ",\n".join(
        f"    length(regexp_extract_all(norm, ' ({pats}) ')) AS s_{k}"
        for k, pats in langs.items()
    )
    return f"""WITH f AS (
  SELECT doc_id,
    length(regexp_extract_all(substring(text, 1, 400), '[\\x{{4e00}}-\\x{{9fff}}]')) AS cjk,
    length(substring(text, 1, 400)) AS n400,
    ' ' || regexp_replace(lower(substring(text, 1, 2000)), '[^{letter}]+', '  ', 'g') || ' ' AS norm
  FROM documents),
s AS (
  SELECT doc_id, cjk, n400,
    length(regexp_extract_all(norm, '[{letter}]+')) AS n_toks,
{marks}
  FROM f),
p AS (
  SELECT CASE
      WHEN cjk > n400 * 0.2 THEN 'zh'
      WHEN n_toks = 0 THEN 'unknown'
      WHEN s_en = 0 AND s_de = 0 AND s_es = 0 AND s_fr = 0 THEN 'unknown'
      WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr THEN 'en'
      WHEN s_de >= s_es AND s_de >= s_fr THEN 'de'
      WHEN s_es >= s_fr THEN 'es'
      ELSE 'fr' END AS lang_pred
  FROM s)
SELECT lang_pred, CAST(COUNT(*) AS BIGINT) AS n FROM p GROUP BY lang_pred"""


_POW64 = "CAST('18446744073709551616' AS HUGEINT)"
# nonneg x: x % 2^64 == x & (2^64-1); HUGEINT bit ops measured ~24x
# faster than HUGEINT division/modulo (13M-row projection: 2.5s -> 0.1s)
_M64 = "CAST('18446744073709551615' AS HUGEINT)"


def _mulmod64(a: str, c: int) -> str:
    """SQL for ``(a * c) mod 2^64`` with both operands < 2^64 — split
    the constant so no HUGEINT intermediate exceeds 2^65; shift/mask
    limb arithmetic (HUGEINT div/mod is 24x slower)."""
    lo, hi = c & 0xFFFFFFFF, c >> 32
    return (
        f"(((({a}) & 4294967295) * {lo}"
        f" + ((((({a}) & 4294967295) * {hi} + (({a}) >> 32) * {lo}) & 4294967295)"
        f" << 32)) & {_M64})"
    )


def _mix64_ctes(src_cte: str, keys: str, col: str = "h", prefix: str = "mx") -> str:
    """CTE chain applying the splitmix64 finalizer (dedup._mix64) to
    column ``col`` of ``src_cte``; result CTE is ``{prefix}5``."""
    c1, c2 = 0xBF58476D1CE4E5B9, 0x94D049BB133111EB
    p = prefix
    # every stage MATERIALIZED: DuckDB otherwise inlines the chain into
    # one expression tree where each mulmod references its input 4x and
    # each xor 2x — a ~64x recomputation of the upstream pipeline
    return f"""{p}1 AS MATERIALIZED (SELECT {keys}, xor({col}, {col} >> 30) AS h FROM {src_cte}),
{p}2 AS MATERIALIZED (SELECT {keys}, {_mulmod64('h', c1)} AS h FROM {p}1),
{p}3 AS MATERIALIZED (SELECT {keys}, xor(h, h >> 27) AS h FROM {p}2),
{p}4 AS MATERIALIZED (SELECT {keys}, {_mulmod64('h', c2)} AS h FROM {p}3),
{p}5 AS MATERIALIZED (SELECT {keys}, xor(h, h >> 31) AS h FROM {p}4)"""


# fold h = h*FNV + byte over the 32-byte zero-padded UTF-8 prefix of a
# token — dedup._token_hashes exactly (FNV < 2^41, so acc*FNV fits
# HUGEINT with no splitting)
_TOKEN_FOLD = """list_reduce(
      list_prepend(CAST(0 AS HUGEINT),
        list_transform(range(32), i ->
          CAST(CASE WHEN i < octet_length(encode(tok))
               THEN CAST(('0x' || substr(hex(encode(tok)), CAST(2*i+1 AS INT), 2)) AS INT)
               ELSE 0 END AS HUGEINT))),
      (h, b) -> (h * 1099511628211 + b) & {m64})""".replace("{m64}", _M64)


def doc_simhash_sql() -> str:
    """Mirror of data_ops.dedup._SimHash: distinct lowered whitespace
    tokens → 32-byte-padded polynomial token hash → splitmix64 → per-
    bit majority votes → little-order bit pack, reinterpreted int64."""
    return f"""WITH toks AS (
  SELECT doc_id, unnest(list_distinct(list_filter(
      string_split_regex(lower(text), '\\s+'), x -> x <> ''))) AS tok
  FROM documents),
raw AS (SELECT doc_id, {_TOKEN_FOLD} AS h FROM toks),
{_mix64_ctes('raw', 'doc_id')},
votes AS (
  SELECT doc_id, b.bit AS bit,
         SUM(CASE WHEN (h >> CAST(b.bit AS INT)) % 2 = 1 THEN 1 ELSE 0 END) AS ones,
         COUNT(*) AS n
  FROM mx5, (SELECT unnest(range(64)) AS bit) b
  GROUP BY doc_id, b.bit),
sh AS (
  SELECT doc_id,
         SUM(CASE WHEN 2 * ones > n THEN CAST(1 AS HUGEINT) << CAST(bit AS INT)
                  ELSE CAST(0 AS HUGEINT) END) AS u
  FROM votes GROUP BY doc_id)
SELECT d.doc_id,
       CAST(COALESCE(CASE WHEN sh.u >= CAST('9223372036854775808' AS HUGEINT)
                          THEN sh.u - {_POW64} ELSE sh.u END, 0) AS BIGINT) AS simhash
FROM documents d LEFT JOIN sh ON sh.doc_id = d.doc_id"""


def doc_fingerprints_sql() -> str:
    """Mirror of data_ops.text.Fingerprint: whitespace-normalize, roll
    a 16-byte polynomial window over the UTF-8 bytes (one short window
    when the doc is ≤ 16 bytes), splitmix64 each window, keep the 8
    smallest, fold them sorted with the golden multiplier, hex-format."""
    gold = 0x9E3779B97F4A7C15
    fold_lambda = f"(a, v) -> (({_mulmod64('a', gold)} + v) & {_M64})"
    return f"""WITH nt AS (
  SELECT doc_id, encode(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS b FROM documents),
meta AS (SELECT doc_id, octet_length(b) AS L, hex(b) AS hx FROM nt),
wins AS (
  SELECT doc_id, L, hx, unnest(range(greatest(L - 15, 1))) AS w FROM meta),
raw AS (
  SELECT doc_id, w, list_reduce(
     list_prepend(CAST(0 AS HUGEINT),
       list_transform(range(least(16, L - w)), i ->
         CAST(CAST(('0x' || substr(hx, CAST(2*(w+i)+1 AS INT), 2)) AS INT) AS HUGEINT))),
     (h, x) -> (h * 1099511628211 + x) & {_M64}) AS h
  FROM wins),
{_mix64_ctes('raw', 'doc_id, w')},
kept AS (
  SELECT doc_id, h, row_number() OVER (PARTITION BY doc_id ORDER BY h) AS rn FROM mx5),
fld AS (
  SELECT doc_id,
         list_reduce(list_prepend(CAST(0 AS HUGEINT), list(h ORDER BY h)),
                     {fold_lambda}) AS acc
  FROM kept WHERE rn <= 8 GROUP BY doc_id)
SELECT doc_id, lower(lpad(hex(CAST(acc AS UBIGINT)), 16, '0')) AS fingerprint FROM fld"""


def doc_ngram_jaccard_sql(n: int = 3, threshold: float = 0.5) -> str:
    """Exact word-n-gram Jaccard pairs ≥ threshold — same hashed-gram
    feature space as data_ops.dedup._word_ngram_hashes (32-byte-padded
    token polynomial → splitmix64 → GOLD-rolled n-gram → splitmix64 →
    unique), then a direct pair join on shared grams. Independent of
    the engine's LSH-prune + sort-merge-verify path (which must find
    the same pairs: recall of the band scheme at J ≥ τ is 1 − 1e-8)."""
    gold = 0x9E3779B97F4A7C15
    return f"""WITH toks AS (
  SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS tl
  FROM documents),
tokr AS (
  SELECT doc_id, unnest(tl) AS tok, unnest(range(len(tl))) AS pos, len(tl) AS ntok
  FROM toks),
raw AS (SELECT doc_id, pos, ntok, {_TOKEN_FOLD} AS h FROM tokr),
{_mix64_ctes('raw', 'doc_id, pos, ntok', prefix='tm')},
g1 AS (
  SELECT a.doc_id, a.pos, (({_mulmod64('a.h', gold)} + b.h) & {_M64}) AS g
  FROM tm5 a JOIN tm5 b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
  WHERE a.ntok >= {n}),
g2 AS (
  SELECT a.doc_id, a.pos, (({_mulmod64('a.g', gold)} + b.h) & {_M64}) AS g
  FROM g1 a JOIN tm5 b ON b.doc_id = a.doc_id AND b.pos = a.pos + 2),
shortg AS (
  SELECT doc_id, CAST(0 AS BIGINT) AS pos,
         list_reduce(list_prepend(CAST(0 AS HUGEINT), list(h ORDER BY pos)),
                     (a, v) -> (({_mulmod64('a', gold)} + v) & {_M64})) AS g
  FROM tm5 WHERE ntok BETWEEN 1 AND {n - 1} GROUP BY doc_id),
allg AS (SELECT doc_id, pos, g AS h FROM g2 UNION ALL SELECT doc_id, pos, g AS h FROM shortg),
{_mix64_ctes('allg', 'doc_id, pos', prefix='gm')},
ug AS (SELECT DISTINCT doc_id, h FROM gm5),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM ug GROUP BY doc_id),
pairs AS (
  SELECT x.doc_id AS a, y.doc_id AS b, COUNT(*) AS inter
  FROM ug x JOIN ug y ON x.h = y.h AND x.doc_id < y.doc_id
  GROUP BY 1, 2)
SELECT p.a, p.b,
       ROUND(CAST(p.inter AS DOUBLE) / (sa.sz + sb.sz - p.inter), 6) AS jaccard
FROM pairs p JOIN sizes sa ON sa.doc_id = p.a JOIN sizes sb ON sb.doc_id = p.b
WHERE CAST(p.inter AS DOUBLE) / (sa.sz + sb.sz - p.inter) >= {threshold}"""


def _planes_literals(dim: int, num_planes: int, seed: int = 42) -> list[str]:
    """The engine's seeded hyperplane matrix as SQL list literals —
    same numpy draw, full-precision repr (round-trips exactly)."""
    import numpy as np

    planes = np.random.default_rng(seed).standard_normal((dim, num_planes))
    return [
        "[" + ", ".join(repr(float(x)) for x in planes[:, p]) + "]"
        for p in range(num_planes)
    ]


def embedding_near_dup_sql(threshold: float = 0.4, num_planes: int = 4, dim: int = 64) -> str:
    """Mirror of data_ops.dedup.embedding_near_dup: same seeded
    hyperplane buckets (plane p at bit num_planes-1-p), exact cosine
    within each bucket, canonical a < b."""
    planes = _planes_literals(dim, num_planes)
    bits = " + ".join(
        f"(CASE WHEN list_inner_product(vn, {planes[p]}) > 0 THEN {1 << (num_planes - 1 - p)} ELSE 0 END)"
        for p in range(num_planes)
    )
    return f"""WITH c AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
n AS (
  SELECT vec_id, list_transform(v, x -> x / sqrt(list_inner_product(v, v))) AS vn FROM c),
b AS (
  SELECT vec_id, vn, ({bits}) AS bucket FROM n)
SELECT x.vec_id AS a, y.vec_id AS b,
       ROUND(list_inner_product(x.vn, y.vn), 6) AS cos
FROM b x JOIN b y ON x.bucket = y.bucket AND x.vec_id < y.vec_id
WHERE list_inner_product(x.vn, y.vn) >= {threshold}
ORDER BY a, b"""


def knn_lsh_sql(
    n_queries: int = 5, k: int = 10, num_planes: int = 8, num_probes: int = 3, dim: int = 64
) -> str:
    """Mirror of data_ops.ann.knn_lsh: probing every bucket within
    Hamming ≤ num_probes of the query's bucket ⇔ candidates with
    popcount(xor(buckets)) ≤ num_probes; top-k by (sim desc, id asc),
    self excluded."""
    planes = _planes_literals(dim, num_planes)
    bits = " + ".join(
        f"(CASE WHEN list_inner_product(vn, {planes[p]}) > 0 THEN {1 << (num_planes - 1 - p)} ELSE 0 END)"
        for p in range(num_planes)
    )
    return f"""WITH c AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
n AS (
  SELECT vec_id, list_transform(v, x -> x / sqrt(list_inner_product(v, v))) AS vn FROM c),
b AS (
  SELECT vec_id, vn, ({bits}) AS bucket FROM n),
q AS (SELECT vec_id AS qid, vn AS qv, bucket AS qb FROM b WHERE vec_id < {n_queries}),
cand AS (
  SELECT q.qid, b.vec_id AS neighbor_id, list_inner_product(b.vn, q.qv) AS sim
  FROM q JOIN b ON bit_count(xor(q.qb, b.bucket)) <= {num_probes} AND b.vec_id <> q.qid),
rk AS (
  SELECT qid, neighbor_id, sim,
         row_number() OVER (PARTITION BY qid ORDER BY sim DESC, neighbor_id ASC) AS rn
  FROM cand)
SELECT qid, neighbor_id, ROUND(sim, 5) AS sim FROM rk WHERE rn <= {k}"""


def doc_minhash_clusters_sql(
    num_hashes: int = 128, bands: int = 32, shingle_k: int = 5, threshold: float = 0.8
) -> str:
    """Mirror of data_ops.dedup.minhash_lsh_dedup end-to-end: char
    5-shingle hashes → the same seeded multiply-shift minhash family →
    GOLD-folded band buckets → candidate pairs → exact hashed-shingle
    Jaccard ≥ τ → transitive closure (min-id cluster labels)."""
    import numpy as np

    rng = np.random.default_rng(42)
    a = (rng.integers(0, 1 << 62, num_hashes, dtype=np.uint64) << np.uint64(1)) | np.uint64(1)
    b = rng.integers(0, 1 << 63, num_hashes, dtype=np.uint64)
    alo = "[" + ", ".join(str(int(x) & 0xFFFFFFFF) for x in a) + "]"
    ahi = "[" + ", ".join(str(int(x) >> 32) for x in a) + "]"
    bl = "[" + ", ".join(str(int(x)) for x in b) + "]"
    gold = 0x9E3779B97F4A7C15
    rows = num_hashes // bands
    k = shingle_k
    return f"""WITH RECURSIVE nt AS (
  SELECT doc_id, encode(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS bb FROM documents),
meta AS (SELECT doc_id, octet_length(bb) AS L, hex(bb) AS hx FROM nt WHERE octet_length(bb) > 0),
wins AS (
  SELECT doc_id, L, hx, unnest(range(greatest(L - {k - 1}, 1))) AS w FROM meta),
rawsh AS (
  SELECT doc_id, w, list_reduce(
     list_prepend(CAST(0 AS HUGEINT),
       list_transform(range(least({k}, L - w)), i ->
         CAST(CAST(('0x' || substr(hx, CAST(2*(w+i)+1 AS INT), 2)) AS INT) AS HUGEINT))),
     (h, x) -> (h * 1099511628211 + x) & {_M64}) AS h
  FROM wins),
{_mix64_ctes('rawsh', 'doc_id, w', prefix='sm')},
ug AS MATERIALIZED (SELECT DISTINCT doc_id, h FROM sm5),
params AS (
  SELECT unnest(range({num_hashes})) AS i,
         unnest(CAST({alo} AS HUGEINT[])) AS alo,
         unnest(CAST({ahi} AS HUGEINT[])) AS ahi,
         unnest(CAST({bl} AS HUGEINT[])) AS bv),
sig AS MATERIALIZED (
  SELECT f.doc_id, p.i,
         MIN((((p.alo * (f.h & 4294967295)
              + (((p.alo * (f.h >> 32) + p.ahi * (f.h & 4294967295)) & 4294967295)
                << 32)) & {_M64}) + p.bv) & {_M64}) AS s
  FROM ug f CROSS JOIN params p GROUP BY f.doc_id, p.i),
bandfold AS MATERIALIZED (
  SELECT doc_id, i // {rows} AS band,
         list_reduce(list_prepend(CAST(0 AS HUGEINT), list(s ORDER BY i)),
                     (acc, v) -> (({_mulmod64('acc', gold)} + v) & {_M64})) AS g
  FROM sig GROUP BY doc_id, i // {rows}),
bandkey AS MATERIALIZED (
  SELECT doc_id, band, (({_mulmod64('g', gold)} + band) & {_M64}) AS h FROM bandfold),
{_mix64_ctes('bandkey', 'doc_id, band', prefix='bm')},
bmx AS MATERIALIZED (SELECT doc_id, band, h FROM bm5),
cand AS MATERIALIZED (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
  FROM bmx x JOIN bmx y ON x.band = y.band AND x.h = y.h AND x.doc_id < y.doc_id),
sizes AS MATERIALIZED (SELECT doc_id, COUNT(*) AS sz FROM ug GROUP BY doc_id),
inter AS MATERIALIZED (
  SELECT c.a, c.b, COUNT(*) AS n
  FROM cand c JOIN ug x ON x.doc_id = c.a JOIN ug y ON y.doc_id = c.b AND y.h = x.h
  GROUP BY c.a, c.b),
verified AS MATERIALIZED (
  SELECT i.a, i.b FROM inter i
  JOIN sizes sa ON sa.doc_id = i.a JOIN sizes sb ON sb.doc_id = i.b
  WHERE CAST(i.n AS DOUBLE) / (sa.sz + sb.sz - i.n) >= {threshold}),
und AS (SELECT a AS id, b AS peer FROM verified UNION SELECT b, a FROM verified),
cc AS (
  SELECT id, id AS label FROM (SELECT DISTINCT id FROM und)
  UNION
  SELECT u.id, c.label FROM und u JOIN cc c ON c.id = u.peer
)
SELECT d.doc_id, CAST(COALESCE(m.lab, d.doc_id) AS BIGINT) AS cluster
FROM documents d LEFT JOIN (SELECT id, MIN(label) AS lab FROM cc GROUP BY id) m
  ON m.id = d.doc_id"""


def bc_random_sql(k_sources: int = 16, max_depth: int = 12) -> str:
    """Unrolled multi-source Brandes (mirror of algos/bc.py over the
    16 smallest vertex ids): forward level-synchronous BFS with
    shortest-path counts, then the backward dependency accumulation
    level by level (deepest first). ``max_depth`` unrolls past the
    link graph's diameter; empty levels are no-ops, so parity only
    needs max_depth >= true depth."""
    steps = [
        f"srcs AS MATERIALIZED (SELECT id AS s FROM v ORDER BY id LIMIT {k_sources})",
        "f0 AS MATERIALIZED (SELECT s, s AS id, 0 AS dist, CAST(1 AS DOUBLE) AS sigma FROM srcs)",
        "a0 AS MATERIALIZED (SELECT * FROM f0)",
    ]
    for l in range(max_depth):
        steps.append(
            f"""f{l + 1} AS MATERIALIZED (
  SELECT f.s, e.dst AS id, {l + 1} AS dist, SUM(f.sigma) AS sigma
  FROM f{l} f JOIN e ON e.src = f.id
  LEFT JOIN a{l} seen ON seen.s = f.s AND seen.id = e.dst
  WHERE seen.id IS NULL
  GROUP BY f.s, e.dst)"""
        )
        steps.append(
            f"a{l + 1} AS MATERIALIZED (SELECT * FROM a{l} UNION ALL SELECT * FROM f{l + 1})"
        )
    A = f"a{max_depth}"
    # backward: delta at level l uses only deltas at level l+1
    steps.append(
        f"d{max_depth} AS MATERIALIZED (SELECT s, id, CAST(0 AS DOUBLE) AS delta FROM {A} WHERE FALSE)"
    )
    for l in range(max_depth - 1, 0, -1):
        steps.append(
            f"""d{l} AS MATERIALIZED (
  SELECT av.s, av.id,
         SUM(av.sigma / aw.sigma * (1 + COALESCE(dw.delta, 0))) AS delta
  FROM {A} av JOIN e ON e.src = av.id
  JOIN {A} aw ON aw.s = av.s AND aw.id = e.dst AND aw.dist = {l + 1}
  LEFT JOIN d{l + 1} dw ON dw.s = av.s AND dw.id = e.dst
  WHERE av.dist = {l}
  GROUP BY av.s, av.id)"""
        )
    deltas = " UNION ALL ".join(f"SELECT * FROM d{l}" for l in range(1, max_depth + 1))
    body = ",\n".join(steps)
    return f"""WITH {GRAPH_CTES},
{body},
alld AS (SELECT id, SUM(delta) AS bc FROM ({deltas}) GROUP BY id)
SELECT v.id AS vertex, ROUND(COALESCE(alld.bc, 0), 6) AS bc
FROM v LEFT JOIN alld ON alld.id = v.id"""


def graph_walks_sql(steps: int = 4, seed: int = 20260818) -> str:
    """Mirror of algos.walks.random_walks: one walk per customer
    vertex, next hop = neighbor rank splitmix64((walk_id*GOLD) mod
    2^64 XOR step XOR seed) % out_degree in ascending-neighbor order
    (``row_number() OVER (PARTITION BY src ORDER BY dst)``); walks
    stop at sinks (the inner join drops them)."""
    gold = 0x9E3779B97F4A7C15
    parts = [
        """adj AS MATERIALIZED (
  SELECT src, dst,
         CAST(row_number() OVER (PARTITION BY src ORDER BY dst) - 1 AS HUGEINT) AS rn
  FROM e)""",
        "w0 AS MATERIALIZED (SELECT id AS walk_id, id AS cur FROM v WHERE id < 10000000)",
    ]
    for s in range(1, steps + 1):
        key = (
            f"xor(xor({_mulmod64('CAST(walk_id AS HUGEINT)', gold)}, "
            f"CAST({s} AS HUGEINT)), CAST({seed} AS HUGEINT))"
        )
        parts.append(f"k{s} AS MATERIALIZED (SELECT walk_id, cur, {key} AS h FROM w{s - 1})")
        parts.append(_mix64_ctes(f"k{s}", "walk_id, cur", prefix=f"wm{s}_"))
        parts.append(
            f"""w{s} AS MATERIALIZED (
  SELECT t.walk_id, adj.dst AS cur
  FROM wm{s}_5 t
  JOIN deg ON deg.src = t.cur
  JOIN adj ON adj.src = t.cur AND adj.rn = t.h % CAST(deg.d AS HUGEINT))"""
        )
    sel = "\nUNION ALL ".join(
        ["SELECT walk_id, CAST(0 AS BIGINT) AS step, walk_id AS vertex FROM w0"]
        + [
            f"SELECT walk_id, CAST({s} AS BIGINT), cur FROM w{s}"
            for s in range(1, steps + 1)
        ]
    )
    body = ",\n".join(parts)
    return f"WITH {GRAPH_CTES},\n{body}\n{sel}"


def khop_subgraph_sql(hops: int = 2, seed_bound: int = 100) -> str:
    """Mirror of queries.q_khop_subgraph: unrolled frontier expansion
    — hop h edges have src in frontier h−1 (reached minus all earlier
    frontiers), DISTINCT edge set per hop."""
    parts = [f"f0 AS MATERIALIZED (SELECT id FROM v WHERE id < {seed_bound})"]
    vis = "SELECT id FROM f0"
    sels = []
    for h in range(1, hops + 1):
        parts.append(
            f"""h{h} AS MATERIALIZED (
  SELECT DISTINCT e.src, e.dst FROM e JOIN f{h - 1} f ON f.id = e.src)"""
        )
        parts.append(
            f"""f{h} AS MATERIALIZED (
  SELECT DISTINCT dst AS id FROM h{h} WHERE dst NOT IN ({vis}))"""
        )
        vis += f" UNION SELECT id FROM f{h}"
        sels.append(f"SELECT src, dst, CAST({h} AS BIGINT) AS hop FROM h{h}")
    body = ",\n".join(parts)
    return f"WITH {GRAPH_CTES},\n{body}\n" + "\nUNION ALL ".join(sels)


def walk_skipgram_pairs_sql(window: int = 2, steps: int = 4, seed: int = 20260818) -> str:
    """Mirror of queries.q_walk_skipgram_pairs: the replayed walk
    table self-joined within ``window`` steps of the same walk,
    grouped to exact pair counts."""
    return f"""WITH wv AS MATERIALIZED (
{graph_walks_sql(steps, seed)}
)
SELECT a.vertex AS center, b.vertex AS context, CAST(COUNT(*) AS BIGINT) AS cnt
FROM wv a JOIN wv b
  ON a.walk_id = b.walk_id AND a.step <> b.step AND abs(a.step - b.step) <= {window}
GROUP BY 1, 2"""


def neighbor_sample_sql(k: int = 3, seed: int = 20260818) -> str:
    """Mirror of algos.walks.sample_neighbors: per src keep the k
    out-neighbors with the smallest splitmix64((src*GOLD) mod 2^64
    XOR dst XOR seed), ties by neighbor id."""
    gold = 0x9E3779B97F4A7C15
    key = (
        f"xor(xor({_mulmod64('CAST(src AS HUGEINT)', gold)}, "
        f"CAST(dst AS HUGEINT)), CAST({seed} AS HUGEINT))"
    )
    return f"""WITH {GRAPH_CTES},
kh AS MATERIALIZED (SELECT src, dst, {key} AS h FROM e),
{_mix64_ctes('kh', 'src, dst')},
r AS (SELECT src, dst, row_number() OVER (PARTITION BY src ORDER BY h, dst) AS rn FROM mx5)
SELECT src, dst FROM r WHERE rn <= {k}"""


def graph_walks_weighted_sql(steps: int = 4, seed: int = 20260818) -> str:
    """Weighted-walk mirror: hop probability proportional to the
    duplicate-edge count w — the point h % Σw falls in the neighbor's
    cumulative-weight interval [cw−w, cw), all integer-exact."""
    gold = 0x9E3779B97F4A7C15
    parts = [
        """ew AS MATERIALIZED (
  SELECT src, dst, CAST(COUNT(*) AS HUGEINT) AS w
  FROM raw_edges GROUP BY src, dst)""",
        """adjw AS MATERIALIZED (
  SELECT src, dst, w,
         SUM(w) OVER (PARTITION BY src ORDER BY dst
                      ROWS UNBOUNDED PRECEDING) AS cw,
         SUM(w) OVER (PARTITION BY src) AS tw
  FROM ew)""",
        "w0 AS MATERIALIZED (SELECT id AS walk_id, id AS cur FROM v WHERE id < 10000000)",
    ]
    for s in range(1, steps + 1):
        key = (
            f"xor(xor({_mulmod64('CAST(walk_id AS HUGEINT)', gold)}, "
            f"CAST({s} AS HUGEINT)), CAST({seed} AS HUGEINT))"
        )
        parts.append(f"k{s} AS MATERIALIZED (SELECT walk_id, cur, {key} AS h FROM w{s - 1})")
        parts.append(_mix64_ctes(f"k{s}", "walk_id, cur", prefix=f"wm{s}_"))
        parts.append(
            f"""w{s} AS MATERIALIZED (
  SELECT t.walk_id, a.dst AS cur
  FROM wm{s}_5 t
  JOIN adjw a ON a.src = t.cur
   AND t.h % a.tw >= a.cw - a.w AND t.h % a.tw < a.cw)"""
        )
    sel = "\nUNION ALL ".join(
        ["SELECT walk_id, CAST(0 AS BIGINT) AS step, walk_id AS vertex FROM w0"]
        + [
            f"SELECT walk_id, CAST({s} AS BIGINT), cur FROM w{s}"
            for s in range(1, steps + 1)
        ]
    )
    body = ",\n".join(parts)
    return f"WITH {GRAPH_CTES},\n{body}\n{sel}"


def graph_walks_node2vec_sql(
    steps: int = 4, seed: int = 20260818, weights: tuple[int, int, int] = (1, 4, 2)
) -> str:
    """Mirror of algos.walks.node2vec_walks: step 1 uniform; from
    step 2 each candidate ``cand`` of ``cur`` with predecessor
    ``prev`` weighs ``w_return`` when cand = prev, ``w_common`` when
    (prev, cand) ∈ e, else ``w_far`` — the hash point h % Σw falls in
    cand's cumulative interval over ascending-neighbor order."""
    gold = 0x9E3779B97F4A7C15
    w_ret, w_common, w_far = weights
    parts = [
        """adj AS MATERIALIZED (
  SELECT src, dst,
         CAST(row_number() OVER (PARTITION BY src ORDER BY dst) - 1 AS HUGEINT) AS rn
  FROM e)""",
        "w0 AS MATERIALIZED (SELECT id AS walk_id, id AS cur FROM v WHERE id < 10000000)",
    ]
    # step 1: uniform rank pick (no predecessor)
    key1 = (
        f"xor(xor({_mulmod64('CAST(walk_id AS HUGEINT)', gold)}, "
        f"CAST(1 AS HUGEINT)), CAST({seed} AS HUGEINT))"
    )
    parts.append(f"k1 AS MATERIALIZED (SELECT walk_id, cur, {key1} AS h FROM w0)")
    parts.append(_mix64_ctes("k1", "walk_id, cur", prefix="wm1_"))
    parts.append(
        """w1 AS MATERIALIZED (
  SELECT t.walk_id, t.cur AS prev, adj.dst AS cur
  FROM wm1_5 t
  JOIN deg ON deg.src = t.cur
  JOIN adj ON adj.src = t.cur AND adj.rn = t.h % CAST(deg.d AS HUGEINT))"""
    )
    for s in range(2, steps + 1):
        key = (
            f"xor(xor({_mulmod64('CAST(walk_id AS HUGEINT)', gold)}, "
            f"CAST({s} AS HUGEINT)), CAST({seed} AS HUGEINT))"
        )
        parts.append(
            f"k{s} AS MATERIALIZED (SELECT walk_id, prev, cur, {key} AS h FROM w{s - 1})"
        )
        parts.append(_mix64_ctes(f"k{s}", "walk_id, prev, cur", prefix=f"wm{s}_"))
        parts.append(
            f"""cand{s} AS MATERIALIZED (
  SELECT t.walk_id, t.prev, t.cur, t.h, a.dst AS cand,
         CAST(CASE WHEN a.dst = t.prev THEN {w_ret}
                   WHEN b.dst IS NOT NULL THEN {w_common}
                   ELSE {w_far} END AS HUGEINT) AS wt
  FROM wm{s}_5 t
  JOIN e a ON a.src = t.cur
  LEFT JOIN e b ON b.src = t.prev AND b.dst = a.dst)"""
        )
        parts.append(
            f"""cum{s} AS MATERIALIZED (
  SELECT walk_id, prev, cur, h, cand, wt,
         SUM(wt) OVER (PARTITION BY walk_id ORDER BY cand
                       ROWS UNBOUNDED PRECEDING) AS cw,
         SUM(wt) OVER (PARTITION BY walk_id) AS tw
  FROM cand{s})"""
        )
        parts.append(
            f"""w{s} AS MATERIALIZED (
  SELECT walk_id, cur AS prev, cand AS cur
  FROM cum{s}
  WHERE h % tw >= cw - wt AND h % tw < cw)"""
        )
    sel = "\nUNION ALL ".join(
        ["SELECT walk_id, CAST(0 AS BIGINT) AS step, walk_id AS vertex FROM w0"]
        + [
            f"SELECT walk_id, CAST({s} AS BIGINT), cur FROM w{s}"
            for s in range(1, steps + 1)
        ]
    )
    body = ",\n".join(parts)
    return f"WITH {GRAPH_CTES},\n{body}\n{sel}"


def feature_prop_sql(k: int = 4, rounds: int = 2, seed: int = 20260818) -> str:
    """Mirror of algos.featprop.feature_propagation: deterministic
    integer features splitmix64((id*GOLD) mod 2^64 XOR feat XOR seed)
    mod 1000, then ``rounds`` sweeps of per-dst in-neighbor sums —
    integer-valued doubles, exact in any summation order."""
    gold = 0x9E3779B97F4A7C15
    key = (
        f"xor(xor({_mulmod64('CAST(id AS HUGEINT)', gold)}, "
        f"CAST(j AS HUGEINT)), CAST({seed} AS HUGEINT))"
    )
    steps = [
        f"grid AS MATERIALIZED (SELECT id, j FROM v CROSS JOIN (SELECT unnest(range({k})) AS j) feats)",
        f"fk AS MATERIALIZED (SELECT id, j, {key} AS h FROM grid)",
        _mix64_ctes("fk", "id, j", prefix="fm"),
        "x0 AS MATERIALIZED (SELECT id, j, CAST(h % 1000 AS DOUBLE) AS x FROM fm5)",
    ]
    for r in range(1, rounds + 1):
        steps.append(
            f"""x{r} AS MATERIALIZED (
  SELECT g.id, g.j, COALESCE(s.val, 0) AS x
  FROM grid g LEFT JOIN (
    SELECT e.dst AS id, p.j, SUM(p.x) AS val
    FROM e JOIN x{r - 1} p ON p.id = e.src
    GROUP BY e.dst, p.j
  ) s ON s.id = g.id AND s.j = g.j)"""
        )
    body = ",\n".join(steps)
    return f"""WITH {GRAPH_CTES},
{body}
SELECT id AS vertex, CAST(j AS BIGINT) AS feat, ROUND(x, 6) AS value FROM x{rounds}"""


def mis_sql(rounds: int = 24, seed: int = 20260818) -> str:
    """Mirror of algos.mis.maximal_independent_set: per round the
    priority (splitmix64((id*GOLD) XOR round XOR seed) >> 38) * 2^26
    + id is unique per vertex; a vertex wins when it beats every
    undecided neighbor (self-loops excluded), winners' neighborhoods
    leave the undecided set."""
    gold = 0x9E3779B97F4A7C15
    steps = [
        """un AS MATERIALIZED (
  SELECT src AS a, dst AS b FROM e WHERE src <> dst
  UNION SELECT dst, src FROM e WHERE src <> dst)""",
        "u0 AS MATERIALIZED (SELECT id FROM v)",
    ]
    for r in range(1, rounds + 1):
        key = (
            f"xor(xor({_mulmod64('CAST(id AS HUGEINT)', gold)}, "
            f"CAST({r} AS HUGEINT)), CAST({seed} AS HUGEINT))"
        )
        steps.append(f"pk{r} AS MATERIALIZED (SELECT id, {key} AS h FROM u{r - 1})")
        steps.append(_mix64_ctes(f"pk{r}", "id", prefix=f"pm{r}_"))
        steps.append(
            f"p{r} AS MATERIALIZED (SELECT id, CAST((h >> 38) * 67108864 + id AS BIGINT) AS p FROM pm{r}_5)"
        )
        steps.append(
            f"""w{r} AS MATERIALIZED (
  SELECT u.id FROM p{r} u LEFT JOIN (
    SELECT un.b AS id, MAX(q.p) AS mp
    FROM un JOIN p{r} q ON q.id = un.a GROUP BY un.b
  ) m ON m.id = u.id
  WHERE u.p > COALESCE(m.mp, -1))"""
        )
        steps.append(
            f"""u{r} AS MATERIALIZED (
  SELECT id FROM u{r - 1}
  WHERE id NOT IN (SELECT id FROM w{r})
    AND id NOT IN (SELECT un.b FROM un JOIN w{r} ww ON ww.id = un.a))"""
        )
    mis_union = " UNION ALL ".join(f"SELECT id FROM w{r}" for r in range(1, rounds + 1))
    body = ",\n".join(steps)
    return f"""WITH {GRAPH_CTES},
{body},
mis AS (SELECT DISTINCT id FROM ({mis_union}))
SELECT v.id AS vertex,
       CAST(CASE WHEN mis.id IS NULL THEN 0 ELSE 1 END AS BIGINT) AS in_mis
FROM v LEFT JOIN mis ON mis.id = v.id"""


def hyperanf_sql(rounds: int = 4, seed: int = 20260818) -> str:
    """Mirror of algos.hyperanf.registers_table: HyperLogLog register
    init (bucket = h >> 60, rho = 61 - bit_length(h mod 2^60)) and
    ``rounds`` elementwise-max merges along out-edges — all integer."""
    gold = 0x9E3779B97F4A7C15
    key = f"xor({_mulmod64('CAST(id AS HUGEINT)', gold)}, CAST({seed} AS HUGEINT))"
    m58 = (1 << 58) - 1
    steps = [
        f"hk AS MATERIALIZED (SELECT id, {key} AS h FROM v)",
        _mix64_ctes("hk", "id", prefix="hm"),
        f"""init AS MATERIALIZED (
  SELECT id, CAST(h >> 58 AS BIGINT) AS bucket,
         59 - length(ltrim(bin(CAST(h & {m58} AS BIGINT)), '0')) AS rho
  FROM hm5)""",
        """x0 AS MATERIALIZED (
  SELECT v.id, j.j, CASE WHEN j.j = i.bucket THEN i.rho ELSE 0 END AS val
  FROM v JOIN init i ON i.id = v.id
  CROSS JOIN (SELECT unnest(range(64)) AS j) j)""",
    ]
    for r in range(1, rounds + 1):
        steps.append(
            f"""x{r} AS MATERIALIZED (
  SELECT p.id, p.j, GREATEST(p.val, COALESCE(m.mv, 0)) AS val
  FROM x{r - 1} p LEFT JOIN (
    SELECT e.src AS id, q.j, MAX(q.val) AS mv
    FROM e JOIN x{r - 1} q ON q.id = e.dst
    GROUP BY e.src, q.j
  ) m ON m.id = p.id AND m.j = p.j)"""
        )
    body = ",\n".join(steps)
    return f"""WITH {GRAPH_CTES},
{body}
SELECT id AS vertex, CAST(j AS BIGINT) AS reg, CAST(val AS BIGINT) AS value FROM x{rounds}"""


def edge_support_sql() -> str:
    """Mirror of algos.truss.edge_support: per undirected simple edge
    (a < b) the number of common neighbors — fan-out bounded by
    joining on the edge's own endpoint first (Σ_edges deg(a), not the
    full wedge square)."""
    return f"""WITH {GRAPH_CTES},
cu AS MATERIALIZED (
  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
  FROM e WHERE src <> dst),
nb AS MATERIALIZED (SELECT a, b FROM cu UNION ALL SELECT b, a FROM cu)
SELECT c.a AS src, c.b AS dst, CAST(COUNT(n2.a) AS BIGINT) AS support
FROM cu c
JOIN nb n1 ON n1.a = c.a
LEFT JOIN nb n2 ON n2.a = c.b AND n2.b = n1.b
GROUP BY c.a, c.b"""


def _hits_ctes(iters: int) -> str:
    steps = [
        "h0 AS MATERIALIZED (SELECT id, CAST(1 AS DOUBLE) / (SELECT n FROM nn) AS s FROM v)"
    ]
    for k in range(1, iters + 1):
        steps.append(
            f"""ar{k} AS MATERIALIZED (
  SELECT v.id, COALESCE(m.x, 0) AS s
  FROM v LEFT JOIN (
    SELECT e.dst AS id, SUM(h.s) AS x
    FROM e JOIN h{k - 1} h ON h.id = e.src GROUP BY e.dst
  ) m ON m.id = v.id)"""
        )
        steps.append(
            f"a{k} AS MATERIALIZED (SELECT id, s / (SELECT SUM(s) FROM ar{k}) AS s FROM ar{k})"
        )
        steps.append(
            f"""hr{k} AS MATERIALIZED (
  SELECT v.id, COALESCE(m.x, 0) AS s
  FROM v LEFT JOIN (
    SELECT e.src AS id, SUM(a.s) AS x
    FROM e JOIN a{k} a ON a.id = e.dst GROUP BY e.src
  ) m ON m.id = v.id)"""
        )
        steps.append(
            f"h{k} AS MATERIALIZED (SELECT id, s / (SELECT SUM(s) FROM hr{k}) AS s FROM hr{k})"
        )
    return ",\n".join(steps)


def hits_sql(iters: int = 5) -> str:
    """Mirror of algos.hits.hits: authority = Σ in-neighbor hubs, hub =
    Σ out-neighbor authorities, L1-normalized after each half-step,
    unrolled exactly ``iters`` synchronous iterations (assumes the
    graph has ≥1 edge, so every normalizing sum is positive)."""
    return f"""WITH {GRAPH_CTES},
{_hits_ctes(iters)}
SELECT h.id AS vertex, ROUND(h.s, 8) AS hub, ROUND(a.s, 8) AS authority
FROM h{iters} h JOIN a{iters} a ON a.id = h.id"""


def local_clustering_sql() -> str:
    """Mirror of algos.truss.local_clustering: per-vertex triangle
    count = Σ incident-edge support / 2 and the Watts–Strogatz
    coefficient, over the undirected simple graph."""
    return f"""WITH {GRAPH_CTES},
cu AS MATERIALIZED (
  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
  FROM e WHERE src <> dst),
nb AS MATERIALIZED (SELECT a, b FROM cu UNION ALL SELECT b, a FROM cu),
sup AS MATERIALIZED (
  SELECT c.a, c.b, CAST(COUNT(n2.a) AS BIGINT) AS support
  FROM cu c
  JOIN nb n1 ON n1.a = c.a
  LEFT JOIN nb n2 ON n2.a = c.b AND n2.b = n1.b
  GROUP BY c.a, c.b),
inc AS (SELECT a AS v, support FROM sup UNION ALL SELECT b, support FROM sup),
pv AS (SELECT v, CAST(SUM(support) // 2 AS BIGINT) AS triangles,
              CAST(COUNT(*) AS BIGINT) AS degree
       FROM inc GROUP BY v)
SELECT vv.id AS vertex,
       COALESCE(p.triangles, 0) AS triangles,
       COALESCE(p.degree, 0) AS degree,
       CASE WHEN COALESCE(p.degree, 0) >= 2
            THEN ROUND(2.0 * p.triangles / (p.degree * (p.degree - 1)), 6)
            ELSE 0.0 END AS coeff
FROM v vv LEFT JOIN pv p ON p.v = vv.id"""


KTRUSS_K = 4
KTRUSS_ROUNDS = 20  # ≥ peel rounds to fixpoint (measured 14 at sf0.01,
# 2 at sf0.001); extra rounds are idempotent at the fixpoint


def ktruss_sql(k: int = KTRUSS_K, rounds: int = KTRUSS_ROUNDS) -> str:
    """Mirror of algos.truss.ktruss: peel edges with < k−2 common
    neighbors, recompute on the survivors, ``rounds`` times (past the
    measured fixpoint, where further rounds are no-ops); final support
    recomputed on the fixpoint edge set."""
    thresh = k - 2
    steps = [
        """t0 AS MATERIALIZED (
  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
  FROM e WHERE src <> dst)"""
    ]
    for r in range(1, rounds + 1):
        steps.append(
            f"nb{r - 1} AS MATERIALIZED (SELECT a, b FROM t{r - 1} UNION ALL SELECT b, a FROM t{r - 1})"
        )
        steps.append(
            f"""t{r} AS MATERIALIZED (
  SELECT c.a, c.b
  FROM t{r - 1} c
  JOIN nb{r - 1} n1 ON n1.a = c.a
  JOIN nb{r - 1} n2 ON n2.a = c.b AND n2.b = n1.b
  GROUP BY c.a, c.b
  HAVING COUNT(*) >= {thresh})"""
        )
    body = ",\n".join(steps)
    return f"""WITH {GRAPH_CTES},
{body},
nbf AS MATERIALIZED (SELECT a, b FROM t{rounds} UNION ALL SELECT b, a FROM t{rounds})
SELECT c.a AS src, c.b AS dst, CAST(COUNT(n2.a) AS BIGINT) AS support
FROM t{rounds} c
JOIN nbf n1 ON n1.a = c.a
LEFT JOIN nbf n2 ON n2.a = c.b AND n2.b = n1.b
GROUP BY c.a, c.b"""


def assortativity_sql() -> str:
    """Mirror of algos.stats.degree_assortativity: Pearson r of
    (deg(u), deg(v)) over both orientations of every canonical edge,
    computed as exact integer aggregates with one double division."""
    return f"""WITH {GRAPH_CTES},
cu AS MATERIALIZED (
  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
  FROM e WHERE src <> dst),
cdeg AS MATERIALIZED (
  SELECT id, CAST(COUNT(*) AS BIGINT) AS d
  FROM (SELECT a AS id FROM cu UNION ALL SELECT b AS id FROM cu)
  GROUP BY id),
ee AS (SELECT da.d AS x, db.d AS y
       FROM cu JOIN cdeg da ON da.id = cu.a JOIN cdeg db ON db.id = cu.b),
s AS (SELECT 2 * COUNT(*) AS n,
             SUM(x) + SUM(y) AS sx,
             SUM(x * x) + SUM(y * y) AS sxx,
             2 * SUM(x * y) AS sxy
      FROM ee)
SELECT CAST(n AS BIGINT) AS n_pairs,
       ROUND(CAST(n * sxy - sx * sx AS DOUBLE)
             / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS assortativity
FROM s"""


def reciprocity_sql() -> str:
    """Mirror of algos.stats.reciprocity over the DISTINCT directed
    edge set minus self-loops."""
    return f"""WITH {GRAPH_CTES},
ns AS (SELECT src, dst FROM e WHERE src <> dst),
p AS (SELECT LEAST(src, dst) AS a, GREATEST(src, dst) AS b, COUNT(*) AS c
      FROM ns GROUP BY 1, 2),
s AS (SELECT COALESCE(SUM(CASE WHEN c = 2 THEN 2 ELSE 0 END), 0) AS mutual,
             COALESCE(SUM(c), 0) AS total
      FROM p)
SELECT CAST(mutual AS BIGINT) AS mutual_edges,
       CAST(total AS BIGINT) AS total_edges,
       ROUND(CAST(mutual AS DOUBLE) / CAST(total AS DOUBLE), 6) AS reciprocity
FROM s"""


def lp_modularity_sql(rounds: int = LP_ROUNDS) -> str:
    """Modularity of the LP partition: label_propagation_sql's exact
    rounds, then Q = intra/m − Σ_c a_c²/(4m²) as integer aggregates
    with two double divisions (mirrors algos.stats.modularity)."""
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
{body},
cdeg AS MATERIALIZED (
  SELECT id, CAST(COUNT(*) AS BIGINT) AS d
  FROM (SELECT a AS id FROM cu UNION ALL SELECT b AS id FROM cu)
  GROUP BY id),
ac AS (SELECT p.label, SUM(cd.d) AS s
       FROM p{rounds} p JOIN cdeg cd ON cd.id = p.id GROUP BY p.label),
st AS (SELECT (SELECT COUNT(*) FROM cu) AS m,
              (SELECT COUNT(*) FROM cu
               JOIN p{rounds} la ON la.id = cu.a
               JOIN p{rounds} lb ON lb.id = cu.b
               WHERE la.label = lb.label) AS intra,
              (SELECT SUM(s * s) FROM ac) AS ssq)
SELECT CAST(m AS BIGINT) AS num_edges,
       CAST(intra AS BIGINT) AS intra_edges,
       ROUND(CAST(intra AS DOUBLE) / CAST(m AS DOUBLE)
             - CAST(ssq AS DOUBLE) / CAST(4 * m * m AS DOUBLE), 6) AS modularity
FROM st"""


def coloring_sql(seed: int = 20260818) -> str:
    """Mirror of algos.coloring.greedy_coloring: fixed unique JP
    priorities (splitmix64 machinery shared with mis_sql); per round an
    uncolored vertex beating every uncolored neighbor takes the
    smallest color unused by its (already-colored) neighbors.

    The round loop is a **recursive CTE**, not an unrolled chain — JP's
    round count is the longest decreasing-priority path (52 at sf0.001,
    data-dependent), so a fixed unroll cannot converge. Two DuckDB 1.0
    constraints shape the query:

    * non-recursive CTEs referenced from the recursive arm are
      re-evaluated (parquet scans included) on EVERY iteration, so the
      edge list and priorities are carried *inside* the recursive state
      (kind 0 = edge rows, kind 1 = vertex rows) — the init branch
      evaluates them exactly once;
    * edges are re-emitted only while their dst endpoint was uncolored
      at the previous round, so the carried edge set shrinks as the
      coloring progresses (an uncolored vertex needs all its in-edges:
      max-uncolored-priority readiness + neighbor-color scan; a colored
      vertex never needs them again).

    Min free color via sorted-rank gap scan: among the distinct
    neighbor colors of a ready vertex, pos = rank-1; the first position
    with color > pos is the smallest missing color, else #colors."""
    gold = 0x9E3779B97F4A7C15
    key = (
        f"xor(xor({_mulmod64('CAST(id AS HUGEINT)', gold)}, "
        f"CAST(1 AS HUGEINT)), CAST({seed} AS HUGEINT))"
    )
    return f"""WITH RECURSIVE {GRAPH_CTES},
un AS (SELECT a, b FROM (
  SELECT src AS a, dst AS b FROM e WHERE src <> dst
  UNION SELECT dst, src FROM e WHERE src <> dst)),
pk AS (SELECT id, {key} AS h FROM v),
{_mix64_ctes("pk", "id", prefix="cm")},
pr AS (SELECT id, CAST((h >> 38) * 67108864 + id AS BIGINT) AS p FROM cm5),
st(kind, a, b, color, p) AS (
  SELECT * FROM (
    SELECT 0 AS kind, a, b, CAST(NULL AS BIGINT) AS color, CAST(NULL AS BIGINT) AS p FROM un
    UNION ALL
    SELECT 1, id, NULL, CAST(NULL AS BIGINT), p FROM pr)
  UNION ALL
  SELECT * FROM (
    WITH prev_v AS MATERIALIZED (SELECT a AS id, color, p FROM st WHERE kind = 1),
         prev_e AS MATERIALIZED (SELECT a, b FROM st WHERE kind = 0),
         nbr AS MATERIALIZED (
           SELECT pe.b AS id, y.color, y.p
           FROM prev_e pe JOIN prev_v y ON y.id = pe.a),
         rd AS MATERIALIZED (
           SELECT x.id FROM prev_v x
           LEFT JOIN (SELECT id, MAX(p) AS mp FROM nbr WHERE color IS NULL GROUP BY id) m
             ON m.id = x.id
           WHERE x.color IS NULL AND x.p > COALESCE(m.mp, -1)),
         rk AS MATERIALIZED (
           SELECT id, color,
                  ROW_NUMBER() OVER (PARTITION BY id ORDER BY color) - 1 AS pos
           FROM (SELECT DISTINCT n.id, n.color FROM nbr n JOIN rd ON rd.id = n.id
                 WHERE n.color IS NOT NULL)),
         pick AS MATERIALIZED (
           SELECT rd.id,
                  COALESCE(MIN(CASE WHEN rk.color > rk.pos THEN rk.pos END),
                           COALESCE(MAX(rk.pos) + 1, 0)) AS color
           FROM rd LEFT JOIN rk ON rk.id = rd.id
           GROUP BY rd.id)
    SELECT 0 AS kind, pe.a, pe.b, CAST(NULL AS BIGINT) AS color, CAST(NULL AS BIGINT) AS p
    FROM prev_e pe JOIN prev_v y ON y.id = pe.b AND y.color IS NULL
    UNION ALL
    SELECT 1, v0.id, NULL, COALESCE(v0.color, w.color), v0.p
    FROM prev_v v0 LEFT JOIN pick w ON w.id = v0.id)
  WHERE EXISTS (SELECT 1 FROM st WHERE kind = 1 AND color IS NULL)
)
SELECT a AS vertex, CAST(MAX(color) AS BIGINT) AS color
FROM st WHERE kind = 1 GROUP BY a"""


def link_prediction_sql(k: int = 100, cap: int = 64) -> str:
    """Mirror of algos.linkpred.link_prediction: wedges at centers with
    undirected simple degree <= cap, pairs that are already edges
    anti-joined out, ranked by (cn DESC, u, w) — an integer-exact
    ordering; the float columns (aa, jaccard) are ROUND(…, 6) on both
    sides because Adamic-Adar is an order-dependent float sum."""
    return f"""WITH {GRAPH_CTES},
cu AS MATERIALIZED (
  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
  FROM e WHERE src <> dst),
ud AS MATERIALIZED (SELECT a, b FROM (
  SELECT a, b FROM cu UNION ALL SELECT b, a FROM cu)),
dg AS MATERIALIZED (SELECT a AS id, COUNT(*) AS d FROM ud GROUP BY a),
wd AS MATERIALIZED (
  SELECT u1.b AS x, u2.b AS y, dc.d AS dcen
  FROM ud u1 JOIN ud u2 ON u1.a = u2.a AND u1.b < u2.b
  JOIN dg dc ON dc.id = u1.a
  WHERE dc.d <= {cap}),
ag AS MATERIALIZED (
  SELECT x, y, CAST(COUNT(*) AS BIGINT) AS cn,
         ROUND(SUM(1.0 / LN(dcen)), 6) AS aa
  FROM wd GROUP BY x, y),
ne AS MATERIALIZED (
  SELECT ag.x, ag.y, ag.cn, ag.aa
  FROM ag LEFT JOIN cu ON cu.a = ag.x AND cu.b = ag.y
  WHERE cu.a IS NULL)
SELECT ne.x AS u, ne.y AS w, ne.cn AS cn, ne.aa AS aa,
       ROUND(CAST(ne.cn AS DOUBLE) / (dx.d + dy.d - ne.cn), 6) AS jaccard
FROM ne JOIN dg dx ON dx.id = ne.x JOIN dg dy ON dy.id = ne.y
ORDER BY ne.cn DESC, u, w LIMIT {k}"""


def vocab_topk_sql(k: int = 100) -> str:
    """Mirror of data_ops.text.vocab_topk: exact whitespace-token
    frequency, (cnt DESC, token ASC) — integer-exact ordering."""
    return f"""WITH toks AS (
  SELECT unnest(string_split_regex(text, '\\s+')) AS token FROM documents)
SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt
FROM toks WHERE token <> ''
GROUP BY token
ORDER BY cnt DESC, token
LIMIT {k}"""


def token_fluency_sql(top_k: int = 1_000_000) -> str:
    """Mirror of data_ops.text.token_fluency: per doc the count and
    total corpus frequency of its whitespace tokens, frequencies taken
    from the top_k vocabulary (cnt desc, token asc; absent tokens
    contribute 0). Integers only — bit-exact."""
    return f"""WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS token FROM documents),
tk AS MATERIALIZED (SELECT doc_id, token FROM toks WHERE token <> ''),
vocab AS MATERIALIZED (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt FROM tk GROUP BY token
  ORDER BY cnt DESC, token LIMIT {top_k})
SELECT tk.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(COALESCE(v.cnt, 0)) AS BIGINT) AS freq_sum
FROM tk LEFT JOIN vocab v ON v.token = tk.token
GROUP BY tk.doc_id"""


def doc_split_sql(seed: int = 20260818) -> str:
    """Mirror of data_ops.text.hash_split_summary: splitmix64(doc_id *
    GOLD XOR seed) mod 1000 buckets -> 98/1/1 train/valid/test, exact
    integer doc/char counts per split."""
    gold = 0x9E3779B97F4A7C15
    key = f"xor({_mulmod64('CAST(doc_id AS HUGEINT)', gold)}, CAST({seed} AS HUGEINT))"
    return f"""WITH dk AS MATERIALIZED (
  SELECT doc_id, n_chars, {key} AS h FROM documents),
{_mix64_ctes("dk", "doc_id, n_chars", prefix="sp")},
bkt AS (SELECT n_chars, CAST(h % 1000 AS BIGINT) AS b FROM sp5)
SELECT CASE WHEN b < 980 THEN 'train' WHEN b < 990 THEN 'valid' ELSE 'test' END AS split,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS n_chars
FROM bkt GROUP BY 1"""


def doc_len_quantiles_sql() -> str:
    """Mirror of data_ops.text.exact_quantiles on documents.n_chars:
    quantile_disc == the value at 1-based position ceil(q*n)."""
    parts = [
        f"SELECT {q} AS q, CAST(quantile_disc(n_chars, {q}) AS BIGINT) AS value FROM documents"
        for q in (0.5, 0.9, 0.99)
    ]
    return "\nUNION ALL\n".join(parts)


def events_value_quantiles_sql() -> str:
    """Mirror of queries.q_events_value_quantiles: quantile_disc picks
    the exact element at 1-based position ceil(q*n), so the doubles
    compare bit-exactly."""
    parts = [
        f"SELECT {q} AS q, CAST(quantile_disc(value, {q}) AS DOUBLE) AS value FROM events"
        for q in (0.5, 0.9, 0.99)
    ]
    return "\nUNION ALL\n".join(parts)


def tfidf_topk_sql(k: int = 20) -> str:
    """Mirror of data_ops.text.tfidf_topk: lowercase whitespace tokens,
    tf = corpus frequency, df = containing-doc count, score rounded to
    6 decimals, order (score DESC, token)."""
    return f"""WITH tl AS (
  SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS l
  FROM documents),
toks AS (SELECT doc_id, unnest(l) AS token FROM tl),
tf AS (SELECT token, COUNT(*) AS tf FROM toks GROUP BY token),
df AS (SELECT token, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY token),
n AS (SELECT COUNT(*) AS n FROM documents)
SELECT t.token, CAST(t.tf AS BIGINT) AS tf, CAST(d.df AS BIGINT) AS df,
       ROUND(t.tf * LN(CAST((SELECT n FROM n) AS DOUBLE) / d.df), 6) AS score
FROM tf t JOIN df d USING (token)
ORDER BY score DESC, t.token LIMIT {k}"""


def bigram_pmi_sql(k: int = 50, min_count: int = 5) -> str:
    """Mirror of data_ops.text.bigram_pmi (identical float expression
    tree over exact counts, rounded 6 before ranking)."""
    return f"""WITH tl AS (
  SELECT row_number() OVER () AS did,
         list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS l
  FROM documents),
toks AS (SELECT did, unnest(l) AS token, generate_subscripts(l, 1) AS pos FROM tl),
uni AS MATERIALIZED (SELECT token, CAST(COUNT(*) AS BIGINT) AS c FROM toks GROUP BY token),
tu AS (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM toks),
bg AS (SELECT a.token AS w1, b.token AS w2
       FROM toks a JOIN toks b ON a.did = b.did AND b.pos = a.pos + 1),
tb AS (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM bg),
bc AS MATERIALIZED (
  SELECT w1 || ' ' || w2 AS bigram, w1, w2, CAST(COUNT(*) AS BIGINT) AS c12
  FROM bg GROUP BY w1, w2),
sel AS (
  SELECT bc.bigram, bc.c12,
         ROUND(LN(((CAST(bc.c12 AS DOUBLE) * (SELECT t FROM tu)) * (SELECT t FROM tu))
                  / ((CAST(u1.c AS DOUBLE) * u2.c) * (SELECT t FROM tb))), 6) AS pmi
  FROM bc JOIN uni u1 ON u1.token = bc.w1 JOIN uni u2 ON u2.token = bc.w2
  WHERE bc.c12 >= {min_count})
SELECT bigram, c12, pmi FROM sel ORDER BY pmi DESC, bigram LIMIT {k}"""


def bigram_topk_sql(k: int = 20) -> str:
    """Mirror of data_ops.text.bigram_topk: adjacent lowercase token
    pairs within each document, (cnt DESC, bigram) order."""
    return f"""WITH tl AS (
  SELECT row_number() OVER () AS did,
         list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS l
  FROM documents),
toks AS (SELECT did, unnest(l) AS token, generate_subscripts(l, 1) AS pos FROM tl),
bg AS (SELECT a.token || ' ' || b.token AS bigram
       FROM toks a JOIN toks b ON a.did = b.did AND b.pos = a.pos + 1)
SELECT bigram, CAST(COUNT(*) AS BIGINT) AS cnt FROM bg GROUP BY bigram
ORDER BY cnt DESC, bigram LIMIT {k}"""


def doc_lm_score_sql(scale: str = "1e6") -> str:
    """Mirror of data_ops.text.lm_score: corpus unigram/bigram counts
    over whitespace-lowercase tokens, per-bigram quantized conditional
    ⌊scale·cb/cu⌋ (left-associative, identical to the numpy
    expression), occurrence-weighted per-doc mean via the identical
    CAST/scale/count two-division formula."""
    return f"""WITH tl AS MATERIALIZED (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS l
  FROM documents),
toks AS MATERIALIZED (
  SELECT doc_id, unnest(l) AS token, generate_subscripts(l, 1) AS pos FROM tl),
bg AS MATERIALIZED (
  SELECT a.doc_id, a.token || ' ' || b.token AS bigram
  FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1),
cu AS MATERIALIZED (SELECT token, COUNT(*) AS c FROM toks GROUP BY 1),
cb AS MATERIALIZED (SELECT bigram, COUNT(*) AS c FROM bg GROUP BY 1),
sc AS MATERIALIZED (
  SELECT cb.bigram, CAST(FLOOR({scale} * cb.c / cu.c) AS BIGINT) AS s
  FROM cb JOIN cu ON cu.token = split_part(cb.bigram, ' ', 1)),
d AS (SELECT doc_id, bigram, COUNT(*) AS occ FROM bg GROUP BY 1, 2)
SELECT d.doc_id, CAST(SUM(occ) AS BIGINT) AS n_bigrams,
       CAST(SUM(occ * s) AS DOUBLE) / {scale} / SUM(occ) AS lm_score
FROM d JOIN sc USING (bigram)
GROUP BY d.doc_id ORDER BY d.doc_id"""


def ccnet_buckets_sql(k: int = 3, scale: str = "1e6") -> str:
    """Mirror of queries.q_doc_ccnet_buckets: the doc_lm_score_sql
    score joined to lang, NTILE(k) PARTITION BY lang ORDER BY (raw
    lm_score, doc_id), score RAW (the doc_lm_score convention —
    exact-ratio values can sit on rounding boundaries)."""
    return f"""WITH tl AS MATERIALIZED (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS l
  FROM documents),
toks AS MATERIALIZED (
  SELECT doc_id, unnest(l) AS token, generate_subscripts(l, 1) AS pos FROM tl),
bg AS MATERIALIZED (
  SELECT a.doc_id, a.token || ' ' || b.token AS bigram
  FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1),
cu AS MATERIALIZED (SELECT token, COUNT(*) AS c FROM toks GROUP BY 1),
cb AS MATERIALIZED (SELECT bigram, COUNT(*) AS c FROM bg GROUP BY 1),
sc AS MATERIALIZED (
  SELECT cb.bigram, CAST(FLOOR({scale} * cb.c / cu.c) AS BIGINT) AS s
  FROM cb JOIN cu ON cu.token = split_part(cb.bigram, ' ', 1)),
d AS (SELECT doc_id, bigram, COUNT(*) AS occ FROM bg GROUP BY 1, 2),
lm AS MATERIALIZED (
  SELECT d.doc_id, CAST(SUM(occ * s) AS DOUBLE) / {scale} / SUM(occ) AS lm_score
  FROM d JOIN sc USING (bigram)
  GROUP BY d.doc_id)
SELECT lm.doc_id, dd.lang, lm.lm_score,
       CAST(NTILE({k}) OVER (PARTITION BY dd.lang ORDER BY lm.lm_score ASC, lm.doc_id ASC) AS BIGINT)
         AS ppl_bucket
FROM lm JOIN documents dd USING (doc_id)"""


def label_centroid_norms_sql() -> str:
    """Mirror of queries.q_label_centroid_norms: per-dim double sums →
    centroid norm, rounded 6."""
    return """WITH x AS (
  SELECT label, generate_subscripts(embedding, 1) AS dim,
         CAST(unnest(embedding) AS DOUBLE) AS v
  FROM embeddings),
s AS (SELECT label, dim, SUM(v) AS sv FROM x GROUP BY label, dim),
n AS (SELECT label, COUNT(*) AS n FROM embeddings GROUP BY label)
SELECT CAST(s.label AS BIGINT) AS label, CAST(n.n AS BIGINT) AS n,
       ROUND(SQRT(SUM((s.sv / n.n) * (s.sv / n.n))), 6) AS centroid_norm
FROM s JOIN n USING (label) GROUP BY s.label, n.n"""


def dup_stats_by_source_sql() -> str:
    """Mirror of queries.q_dup_stats_by_source (distinct-by-text ==
    distinct-by-content-hash, the doc_exact_dedup equivalence)."""
    return """SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT text) AS BIGINT) AS n_distinct,
       ROUND(1.0 - CAST(COUNT(DISTINCT text) AS DOUBLE) / COUNT(*), 6) AS dup_pct
FROM documents GROUP BY source"""


def top_users_by_value_sql(k: int = 20) -> str:
    """Mirror of queries.q_top_users_by_value (sum rounded to 4)."""
    return f"""SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(SUM(value), 4) AS total
FROM events GROUP BY user_id
ORDER BY total DESC, user_id LIMIT {k}"""


def events_funnel_sql(steps: tuple = ("view", "click", "purchase")) -> str:
    """Mirror of queries.q_events_funnel: first-occurrence funnel —
    step s converts at the user's earliest steps[s] event strictly
    after their step s-1 conversion time."""
    ctes = [
        f"s1 AS (SELECT user_id, MIN(ts) AS t FROM events WHERE event_type = '{steps[0]}' GROUP BY user_id)"
    ]
    for i in range(1, len(steps)):
        ctes.append(
            f"""s{i + 1} AS (
  SELECT e.user_id, MIN(e.ts) AS t FROM events e
  JOIN s{i} p ON p.user_id = e.user_id AND e.ts > p.t
  WHERE e.event_type = '{steps[i]}' GROUP BY e.user_id)"""
        )
    rows = " UNION ALL ".join(
        f"SELECT {i + 1} AS step, '{s}' AS event_type, (SELECT COUNT(*) FROM s{i + 1}) AS users"
        for i, s in enumerate(steps)
    )
    body = ",\n".join(ctes)
    return f"""WITH {body}
SELECT CAST(step AS BIGINT) AS step, event_type, CAST(users AS BIGINT) AS users
FROM ({rows}) ORDER BY step"""


def matching_sql(seed: int = 20260818) -> str:
    """Mirror of algos.matching.maximal_matching: canonical undirected
    simple edges with static priority splitmix64((a·GOLD) XOR (b·FNV)
    XOR seed) >> 1; per round an edge whose priority is the max among
    all live edges at both endpoints joins the matching, its endpoints'
    edges leave the live set. Dynamic recursive CTE (round count is
    data-dependent), state-carried like coloring_sql: kind 0 = live
    edge rows, kind 1 = matched edge rows (re-emitted until the live
    set drains; the final SELECT dedups)."""
    gold = 0x9E3779B97F4A7C15
    fnv = 1099511628211
    key = (
        f"xor(xor({_mulmod64('CAST(a AS HUGEINT)', gold)}, "
        f"{_mulmod64('CAST(b AS HUGEINT)', fnv)}), CAST({seed} AS HUGEINT))"
    )
    return f"""WITH RECURSIVE {GRAPH_CTES},
ce AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
       FROM e WHERE src <> dst),
pk AS (SELECT a, b, {key} AS h FROM ce),
{_mix64_ctes("pk", "a, b", prefix="mm")},
pr AS (SELECT a, b, CAST(h >> 1 AS BIGINT) AS p FROM mm5),
st(kind, a, b, p) AS (
  SELECT 0 AS kind, a, b, p FROM pr
  UNION ALL
  SELECT * FROM (
    WITH pe AS MATERIALIZED (SELECT a, b, p FROM st WHERE kind = 0),
         pm AS MATERIALIZED (SELECT a, b FROM st WHERE kind = 1),
         vm AS MATERIALIZED (
           SELECT v, MAX(p) AS mp FROM (
             SELECT a AS v, p FROM pe UNION ALL SELECT b, p FROM pe)
           GROUP BY v),
         dom AS MATERIALIZED (
           SELECT pe.a, pe.b, pe.p FROM pe
           JOIN vm x ON x.v = pe.a AND x.mp = pe.p
           JOIN vm y ON y.v = pe.b AND y.mp = pe.p),
         mv AS MATERIALIZED (
           SELECT a AS v FROM dom UNION SELECT b FROM dom)
    SELECT 0 AS kind, pe.a, pe.b, pe.p FROM pe
    WHERE pe.a NOT IN (SELECT v FROM mv) AND pe.b NOT IN (SELECT v FROM mv)
    UNION ALL
    SELECT 1, a, b, p FROM dom
    UNION ALL
    SELECT 1, a, b, CAST(NULL AS BIGINT) FROM pm
    WHERE EXISTS (SELECT 1 FROM pe))
)
SELECT DISTINCT a, b FROM st WHERE kind = 1 ORDER BY a, b"""


def _bfs_recursion(name: str, start_sql: str, edges: str = "un") -> str:
    """One dynamic-round BFS as a recursive CTE over the simple graph
    in CTE ``edges`` (state-carried edges, same DuckDB 1.0 pattern as
    coloring_sql): kind 0 = edges whose dst is still unreached, kind 1
    = reached (vertex, dist) rows; each iteration assigns the frontier
    dist = MAX(reached dist) + 1 and stops when no carried edge leaves
    the reached set."""
    return f"""{name}(kind, a, b, d) AS (
  SELECT * FROM (
    SELECT 0 AS kind, a, b, CAST(NULL AS BIGINT) AS d FROM {edges}
    UNION ALL
    SELECT 1, ({start_sql}), NULL, 0)
  UNION ALL
  SELECT * FROM (
    WITH rv AS MATERIALIZED (SELECT a AS id, d FROM {name} WHERE kind = 1),
         pe AS MATERIALIZED (SELECT a, b FROM {name} WHERE kind = 0),
         nx AS MATERIALIZED (
           SELECT DISTINCT pe.b AS id FROM pe JOIN rv ON rv.id = pe.a
           WHERE pe.b NOT IN (SELECT id FROM rv)),
         lvl AS MATERIALIZED (SELECT MAX(d) + 1 AS d FROM rv)
    SELECT 0 AS kind, pe.a, pe.b, CAST(NULL AS BIGINT) AS d
    FROM pe
    WHERE pe.b NOT IN (SELECT id FROM nx) AND pe.b NOT IN (SELECT id FROM rv)
    UNION ALL
    SELECT 1, rv.id, NULL, rv.d FROM rv
    UNION ALL
    SELECT 1, nx.id, NULL, lvl.d FROM nx, lvl)
  WHERE EXISTS (SELECT 1 FROM {name} pe2 JOIN {name} r2 ON r2.kind = 1 AND r2.a = pe2.a
                WHERE pe2.kind = 0
                  AND pe2.b NOT IN (SELECT a FROM {name} WHERE kind = 1))
)"""


def closeness_sql(num_sources: int = 8) -> str:
    """Mirror of algos.traversal.closeness_sampled: directed BFS from
    the ``num_sources`` smallest-id vertices, classic closeness
    (reached-1)/sum_dist rounded to 6 (0 when nothing is reached).
    One dynamic recursive-CTE BFS per source."""
    bfs_parts = []
    rows = []
    for i in range(num_sources):
        start = f"SELECT id FROM v ORDER BY id OFFSET {i} LIMIT 1"
        bfs_parts.append(_bfs_recursion(f"cb{i}", start, edges="de"))
        rows.append(
            f"""SELECT ({start}) AS source,
       (SELECT COUNT(*) FROM (SELECT a, MAX(d) FROM cb{i} WHERE kind = 1 GROUP BY a)) AS reached,
       (SELECT COALESCE(SUM(d), 0) FROM (SELECT a, MAX(d) AS d FROM cb{i} WHERE kind = 1 GROUP BY a)) AS sum_dist"""
        )
    body = ",\n".join(bfs_parts)
    union = " UNION ALL ".join(rows)
    return f"""WITH RECURSIVE {GRAPH_CTES},
de AS (SELECT DISTINCT src AS a, dst AS b FROM e WHERE src <> dst),
{body}
SELECT source, CAST(reached AS BIGINT) AS reached, CAST(sum_dist AS BIGINT) AS sum_dist,
       CASE WHEN sum_dist > 0
            THEN ROUND(CAST(reached - 1 AS DOUBLE) / sum_dist, 6) ELSE 0.0 END AS closeness
FROM ({union}) ORDER BY source"""


def harmonic_sql(num_sources: int = 8) -> str:
    """Mirror of algos.traversal.harmonic_sampled: directed BFS from
    the ``num_sources`` smallest-id vertices, harmonic centrality as
    the per-distance-level sum Σ_{d≥1} cnt_d/d (≤diameter float terms,
    stable at 6-decimal rounding), rounded to 6."""
    bfs_parts = []
    rows = []
    for i in range(num_sources):
        start = f"SELECT id FROM v ORDER BY id OFFSET {i} LIMIT 1"
        bfs_parts.append(_bfs_recursion(f"hb{i}", start, edges="de"))
        rows.append(
            f"""SELECT ({start}) AS source,
       (SELECT COUNT(*) FROM (SELECT a, MAX(d) FROM hb{i} WHERE kind = 1 GROUP BY a)) AS reached,
       (SELECT COALESCE(SUM(CAST(cnt AS DOUBLE) / d), 0)
        FROM (SELECT d, COUNT(*) AS cnt
              FROM (SELECT a, MAX(d) AS d FROM hb{i} WHERE kind = 1 GROUP BY a)
              WHERE d > 0 GROUP BY d)) AS harmonic"""
        )
    body = ",\n".join(bfs_parts)
    union = " UNION ALL ".join(rows)
    return f"""WITH RECURSIVE {GRAPH_CTES},
de AS (SELECT DISTINCT src AS a, dst AS b FROM e WHERE src <> dst),
{body}
SELECT source, CAST(reached AS BIGINT) AS reached, ROUND(harmonic, 6) AS harmonic
FROM ({union}) ORDER BY source"""


def eccentricity_sql(num_sources: int = 8) -> str:
    """Mirror of algos.traversal.eccentricity_sampled: directed BFS
    from the ``num_sources`` smallest-id vertices, eccentricity = max
    per-vertex distance — all integers."""
    bfs_parts = []
    rows = []
    for i in range(num_sources):
        start = f"SELECT id FROM v ORDER BY id OFFSET {i} LIMIT 1"
        bfs_parts.append(_bfs_recursion(f"eb{i}", start, edges="de"))
        rows.append(
            f"""SELECT ({start}) AS source,
       (SELECT COUNT(*) FROM (SELECT a, MAX(d) FROM eb{i} WHERE kind = 1 GROUP BY a)) AS reached,
       (SELECT COALESCE(MAX(d), 0)
        FROM (SELECT a, MAX(d) AS d FROM eb{i} WHERE kind = 1 GROUP BY a)) AS eccentricity"""
        )
    body = ",\n".join(bfs_parts)
    union = " UNION ALL ".join(rows)
    return f"""WITH RECURSIVE {GRAPH_CTES},
de AS (SELECT DISTINCT src AS a, dst AS b FROM e WHERE src <> dst),
{body}
SELECT source, CAST(reached AS BIGINT) AS reached,
       CAST(eccentricity AS BIGINT) AS eccentricity
FROM ({union}) ORDER BY source"""


def pseudo_diameter_sql() -> str:
    """Mirror of algos.traversal.pseudo_diameter: double-sweep BFS —
    sweep 1 from the min-id vertex, sweep 2 from the farthest vertex of
    sweep 1 (ties -> smallest id); ecc_far is the diameter lower bound.
    Both sweeps are dynamic recursive CTEs (data-dependent depth)."""
    return f"""WITH RECURSIVE {GRAPH_CTES},
un AS (SELECT a, b FROM (
  SELECT src AS a, dst AS b FROM e WHERE src <> dst
  UNION SELECT dst, src FROM e WHERE src <> dst)),
s0 AS (SELECT MIN(id) AS s FROM v),
{_bfs_recursion("b1", "SELECT s FROM s0")},
dd1 AS (SELECT a AS id, MAX(d) AS d FROM b1 WHERE kind = 1 GROUP BY a),
ecc1 AS (SELECT MAX(d) AS e FROM dd1),
fv AS (SELECT MIN(id) AS f FROM dd1 WHERE d = (SELECT e FROM ecc1)),
{_bfs_recursion("b2", "SELECT f FROM fv")},
dd2 AS (SELECT a AS id, MAX(d) AS d FROM b2 WHERE kind = 1 GROUP BY a),
ecc2 AS (SELECT MAX(d) AS e FROM dd2)
SELECT (SELECT s FROM s0) AS start,
       CAST((SELECT e FROM ecc1) AS BIGINT) AS ecc_start,
       (SELECT f FROM fv) AS far,
       CAST((SELECT e FROM ecc2) AS BIGINT) AS ecc_far"""


def seq_pack_sql(seq_len: int = 2048) -> str:
    """Mirror of data_ops.packing.pack_sequences: per-doc slot count
    (whitespace tokens + 1 EOS), exclusive prefix sum in doc_id order,
    each doc expanded over the fixed seq_len windows its span touches,
    then per-window doc stats."""
    return rf"""WITH toks AS (
  SELECT doc_id,
         CASE WHEN TRIM(text) = '' THEN 0
              ELSE len(regexp_split_to_array(TRIM(text), '\s+')) END + 1 AS slots
  FROM documents),
sp AS (
  SELECT doc_id, slots,
         COALESCE(SUM(slots) OVER (ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS st
  FROM toks),
ex AS (
  SELECT doc_id,
         UNNEST(range(CAST(st // {seq_len} AS BIGINT),
                      CAST((st + slots - 1) // {seq_len} + 1 AS BIGINT))) AS seq
  FROM sp)
SELECT CAST(seq AS BIGINT) AS seq_id, CAST(COUNT(*) AS BIGINT) AS n_docs,
       MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
FROM ex GROUP BY seq"""


def contamination_sql(n: int = 8, seed: int = 20260818) -> str:
    """Mirror of data_ops.packing.contamination: 10% id-hash holdout
    (bucket >= 900) as the bench side, the rest scanned, word n-grams in the engine's hashed
    feature space (token polynomial -> splitmix64 -> GOLD-rolled
    window -> splitmix64; short docs one whole-doc gram), train docs
    sharing >= 1 distinct gram with the bench union."""
    gold = 0x9E3779B97F4A7C15
    key = f"xor({_mulmod64('CAST(doc_id AS HUGEINT)', gold)}, CAST({seed} AS HUGEINT))"
    return f"""WITH dk AS MATERIALIZED (SELECT doc_id, {key} AS h FROM documents),
{_mix64_ctes("dk", "doc_id", prefix="sp")},
split AS MATERIALIZED (SELECT doc_id, CAST(h % 1000 AS BIGINT) AS b FROM sp5),
toks AS (
  SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS tl
  FROM documents),
tokr AS (
  SELECT doc_id, unnest(tl) AS tok, unnest(range(len(tl))) AS pos, len(tl) AS ntok
  FROM toks),
raw AS (SELECT doc_id, pos, ntok, {_TOKEN_FOLD} AS h FROM tokr),
{_mix64_ctes('raw', 'doc_id, pos, ntok', prefix='tm')},
win AS (
  SELECT doc_id, pos, ntok,
         list(h) OVER (PARTITION BY doc_id ORDER BY pos
           ROWS BETWEEN CURRENT ROW AND {n - 1} FOLLOWING) AS hl
  FROM tm5),
grams AS (
  SELECT doc_id, pos, list_reduce(list_prepend(CAST(0 AS HUGEINT), hl),
         (a, v) -> (({_mulmod64('a', gold)} + v) & {_M64})) AS g
  FROM win WHERE (ntok >= {n} AND pos + {n} <= ntok) OR (ntok < {n} AND pos = 0)),
g2 AS (SELECT doc_id, pos, g AS h FROM grams),
{_mix64_ctes('g2', 'doc_id, pos', prefix='gm')},
ug AS MATERIALIZED (SELECT DISTINCT doc_id, h FROM gm5),
bench AS (SELECT DISTINCT u.h FROM ug u JOIN split s USING (doc_id) WHERE s.b >= 900),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM ug GROUP BY doc_id),
hits AS (
  SELECT u.doc_id, COUNT(*) AS nh
  FROM ug u JOIN bench b ON u.h = b.h JOIN split s ON s.doc_id = u.doc_id
  WHERE s.b < 900 GROUP BY u.doc_id)
SELECT h.doc_id, CAST(h.nh AS BIGINT) AS n_hits, CAST(z.sz AS BIGINT) AS n_ngrams,
       ROUND(CAST(h.nh AS DOUBLE) / z.sz, 6) AS contam_frac
FROM hits h JOIN sizes z ON z.doc_id = h.doc_id"""


def source_temperature_sample_sql(
    total: int = 300, seed: int = 20260818, w_scale: int = 1 << 20,
) -> str:
    """Mirror of data_ops.curation.source_temperature_sample: integer
    √n weights, largest-remainder apportionment (ties → source asc),
    per-source smallest-hash draw."""
    gold = 0x9E3779B97F4A7C15
    key = f"xor({_mulmod64('CAST(doc_id AS HUGEINT)', gold)}, CAST({seed} AS HUGEINT))"
    return f"""WITH cnt AS MATERIALIZED (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM documents GROUP BY source),
w AS (SELECT source, n,
             CAST(floor(sqrt(CAST(n AS DOUBLE)) * {float(w_scale)} + 0.5) AS BIGINT) AS w
      FROM cnt),
tt AS (SELECT SUM(w) AS wsum FROM w),
ap AS (SELECT source, n, ({total} * w) // tt.wsum AS base,
              {total} * w - (({total} * w) // tt.wsum) * tt.wsum AS rem
       FROM w, tt),
lv AS (SELECT {total} - SUM(base) AS leftover FROM ap),
tgt AS MATERIALIZED (
  SELECT source, base + CASE WHEN rnk <= (SELECT leftover FROM lv) THEN 1 ELSE 0 END AS target
  FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY rem DESC, source ASC) AS rnk FROM ap)),
dk AS MATERIALIZED (SELECT doc_id, source, {key} AS h FROM documents),
{_mix64_ctes('dk', 'doc_id, source', prefix='ts')},
rk AS (
  SELECT doc_id, source,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY h ASC, doc_id ASC) AS rk
  FROM ts5)
SELECT rk.doc_id, rk.source
FROM rk JOIN tgt USING (source)
WHERE rk.rk <= tgt.target"""


def dsir_weights_sql(
    buckets: int = 1024, seed: int = 20260818, r_scale: int = 1 << 20,
) -> str:
    """Mirror of data_ops.curation.dsir_weights (n-grams (1, 2)): the
    contamination gram space per n, distinct per (doc, n), bucketed
    ``h % buckets``; per-bucket add-one log-likelihood ratio floored
    to an int64 at r_scale (single ln per bucket — the PMI
    convention); per-source-doc exact integer score sum."""
    gold = 0x9E3779B97F4A7C15
    key = f"xor({_mulmod64('CAST(doc_id AS HUGEINT)', gold)}, CAST({seed} AS HUGEINT))"

    def gram_ctes(n: int, p: str) -> str:
        return f"""win{p} AS (
  SELECT doc_id, pos, ntok,
         list(h) OVER (PARTITION BY doc_id ORDER BY pos
           ROWS BETWEEN CURRENT ROW AND {n - 1} FOLLOWING) AS hl
  FROM tm5),
grams{p} AS (
  SELECT doc_id, pos, list_reduce(list_prepend(CAST(0 AS HUGEINT), hl),
         (a, v) -> (({_mulmod64('a', gold)} + v) & {_M64})) AS g
  FROM win{p} WHERE (ntok >= {n} AND pos + {n} <= ntok) OR (ntok < {n} AND pos = 0)),
g2{p} AS (SELECT doc_id, pos, g AS h FROM grams{p}),
{_mix64_ctes(f'g2{p}', 'doc_id, pos', prefix=f'gm{p}')},
ug{p} AS MATERIALIZED (SELECT DISTINCT doc_id, h FROM gm{p}5)"""

    return f"""WITH dk AS MATERIALIZED (SELECT doc_id, {key} AS h FROM documents),
{_mix64_ctes("dk", "doc_id", prefix="sp")},
split AS MATERIALIZED (SELECT doc_id, CAST(h % 1000 AS BIGINT) AS b FROM sp5),
toks AS (
  SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS tl
  FROM documents),
tokr AS (
  SELECT doc_id, unnest(tl) AS tok, unnest(range(len(tl))) AS pos, len(tl) AS ntok
  FROM toks),
raw AS (SELECT doc_id, pos, ntok, {_TOKEN_FOLD} AS h FROM tokr),
{_mix64_ctes('raw', 'doc_id, pos, ntok', prefix='tm')},
{gram_ctes(1, 'a')},
{gram_ctes(2, 'b')},
ga AS MATERIALIZED (
  SELECT doc_id, h % {buckets} AS f FROM uga
  UNION ALL
  SELECT doc_id, h % {buckets} AS f FROM ugb),
ct AS MATERIALIZED (
  SELECT g.f,
         SUM(CASE WHEN s.b >= 900 THEN 1 ELSE 0 END) AS t,
         SUM(CASE WHEN s.b < 900 THEN 1 ELSE 0 END) AS s
  FROM ga g JOIN split s USING (doc_id) GROUP BY g.f),
tot AS (SELECT SUM(t) AS tt, SUM(s) AS ss FROM ct),
r AS MATERIALIZED (
  SELECT ct.f,
         CAST(floor(ln(
             CAST((CAST(ct.t AS HUGEINT) + 1) * (tot.ss + {buckets}) AS DOUBLE)
           / CAST((CAST(ct.s AS HUGEINT) + 1) * (tot.tt + {buckets}) AS DOUBLE)
         ) * {float(r_scale)} + 0.5) AS BIGINT) AS r
  FROM ct, tot)
SELECT g.doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
       CAST(SUM(r.r) AS BIGINT) AS score_q,
       ROUND(CAST(SUM(r.r) AS DOUBLE) / {float(r_scale)}, 6) AS weight
FROM ga g JOIN r USING (f) JOIN split s USING (doc_id)
WHERE s.b < 900
GROUP BY g.doc_id"""


def doc_repetition_sql(n: int = 2) -> str:
    """Mirror of data_ops.curation.repetition_ratio: per-doc total vs
    distinct word n-grams in the engine's hashed gram space (token
    polynomial -> splitmix64 -> GOLD-rolled window; short docs one
    whole-doc gram, empty docs dropped)."""
    gold = 0x9E3779B97F4A7C15
    return f"""WITH toks AS (
  SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS tl
  FROM documents),
tokr AS (
  SELECT doc_id, unnest(tl) AS tok, unnest(range(len(tl))) AS pos, len(tl) AS ntok
  FROM toks),
raw AS (SELECT doc_id, pos, ntok, {_TOKEN_FOLD} AS h FROM tokr),
{_mix64_ctes('raw', 'doc_id, pos, ntok', prefix='tm')},
win AS (
  SELECT doc_id, pos, ntok,
         list(h) OVER (PARTITION BY doc_id ORDER BY pos
           ROWS BETWEEN CURRENT ROW AND {n - 1} FOLLOWING) AS hl
  FROM tm5),
grams AS (
  SELECT doc_id, list_reduce(list_prepend(CAST(0 AS HUGEINT), hl),
         (a, v) -> (({_mulmod64('a', gold)} + v) & {_M64})) AS g
  FROM win WHERE (ntok >= {n} AND pos + {n} <= ntok) OR (ntok < {n} AND pos = 0))
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
       CAST(COUNT(DISTINCT g) AS BIGINT) AS n_distinct,
       ROUND(1.0 - CAST(COUNT(DISTINCT g) AS DOUBLE) / COUNT(*), 6) AS rep_frac
FROM grams GROUP BY doc_id"""


def corpus_select_sql(k: int = 10, n: int = 3) -> str:
    """Mirror of data_ops.curation.greedy_coverage_select: the same
    hashed word-n-gram space (contamination's CTEs), k unrolled greedy
    steps each re-counting uncovered grams per remaining doc."""
    gold = 0x9E3779B97F4A7C15
    steps = [
        "cv0 AS (SELECT CAST(NULL AS HUGEINT) AS h WHERE 1 = 0)",
        "pk0 AS (SELECT CAST(NULL AS BIGINT) AS doc_id, CAST(NULL AS BIGINT) AS gain WHERE 1 = 0)",
    ]
    for t in range(1, k + 1):
        steps.append(
            f"""gain{t} AS MATERIALIZED (
  SELECT z.doc_id, COALESCE(u.c, 0) AS gain
  FROM alldocs z LEFT JOIN (
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS c FROM ug
    WHERE h NOT IN (SELECT h FROM cv{t - 1}) GROUP BY doc_id) u
    ON u.doc_id = z.doc_id
  WHERE z.doc_id NOT IN (SELECT doc_id FROM pk{t - 1})),
pick{t} AS MATERIALIZED (
  SELECT doc_id, gain FROM gain{t} ORDER BY gain DESC, doc_id LIMIT 1),
cv{t} AS MATERIALIZED (
  SELECT h FROM cv{t - 1}
  UNION SELECT u.h FROM ug u JOIN pick{t} p ON p.doc_id = u.doc_id),
pk{t} AS MATERIALIZED (
  SELECT doc_id, gain FROM pk{t - 1} UNION ALL SELECT doc_id, gain FROM pick{t})"""
        )
    finals = "\nUNION ALL\n".join(
        f"SELECT CAST({t} AS BIGINT) AS rank, doc_id, gain FROM pick{t}"
        for t in range(1, k + 1)
    )
    body = ",\n".join(steps)
    return f"""WITH toks AS (
  SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS tl
  FROM documents),
tokr AS (
  SELECT doc_id, unnest(tl) AS tok, unnest(range(len(tl))) AS pos, len(tl) AS ntok
  FROM toks),
raw AS (SELECT doc_id, pos, ntok, {_TOKEN_FOLD} AS h FROM tokr),
{_mix64_ctes('raw', 'doc_id, pos, ntok', prefix='tm')},
win AS (
  SELECT doc_id, pos, ntok,
         list(h) OVER (PARTITION BY doc_id ORDER BY pos
           ROWS BETWEEN CURRENT ROW AND {n - 1} FOLLOWING) AS hl
  FROM tm5),
grams AS (
  SELECT doc_id, pos, list_reduce(list_prepend(CAST(0 AS HUGEINT), hl),
         (a, v) -> (({_mulmod64('a', gold)} + v) & {_M64})) AS g
  FROM win WHERE (ntok >= {n} AND pos + {n} <= ntok) OR (ntok < {n} AND pos = 0)),
g2 AS (SELECT doc_id, pos, g AS h FROM grams),
{_mix64_ctes('g2', 'doc_id, pos', prefix='gm')},
ug AS MATERIALIZED (SELECT DISTINCT doc_id, h FROM gm5),
alldocs AS MATERIALIZED (SELECT doc_id FROM documents),
{body}
{finals}"""


def contamination_bloom_sql(
    n: int = 8, seed: int = 20260818, log2_bits: int = 20, k_hashes: int = 4
) -> str:
    """Mirror of data_ops.packing.contamination_bloom: the Bloom
    filter is semantically the distinct position set of the bench
    grams' splitmix64 probes; a train gram is flagged iff ALL its
    probes land in that set."""
    gold = 0x9E3779B97F4A7C15
    mask64 = (1 << 64) - 1
    salts = [(gold * (j + 1)) & mask64 for j in range(k_hashes)]
    pmask = (1 << log2_bits) - 1
    key = f"xor({_mulmod64('CAST(doc_id AS HUGEINT)', gold)}, CAST({seed} AS HUGEINT))"
    bsel = "\n  UNION ALL\n".join(
        f"  SELECT h AS g, {j} AS j, xor(h, CAST('{s}' AS HUGEINT)) AS h FROM bench"
        for j, s in enumerate(salts)
    )
    tsel = "\n  UNION ALL\n".join(
        f"  SELECT doc_id, h AS g, {j} AS j, xor(h, CAST('{s}' AS HUGEINT)) AS h FROM tug"
        for j, s in enumerate(salts)
    )
    return f"""WITH dk AS MATERIALIZED (SELECT doc_id, {key} AS h FROM documents),
{_mix64_ctes("dk", "doc_id", prefix="sp")},
split AS MATERIALIZED (SELECT doc_id, CAST(h % 1000 AS BIGINT) AS b FROM sp5),
toks AS (
  SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS tl
  FROM documents),
tokr AS (
  SELECT doc_id, unnest(tl) AS tok, unnest(range(len(tl))) AS pos, len(tl) AS ntok
  FROM toks),
raw AS (SELECT doc_id, pos, ntok, {_TOKEN_FOLD} AS h FROM tokr),
{_mix64_ctes('raw', 'doc_id, pos, ntok', prefix='tm')},
win AS (
  SELECT doc_id, pos, ntok,
         list(h) OVER (PARTITION BY doc_id ORDER BY pos
           ROWS BETWEEN CURRENT ROW AND {n - 1} FOLLOWING) AS hl
  FROM tm5),
grams AS (
  SELECT doc_id, pos, list_reduce(list_prepend(CAST(0 AS HUGEINT), hl),
         (a, v) -> (({_mulmod64('a', gold)} + v) & {_M64})) AS g
  FROM win WHERE (ntok >= {n} AND pos + {n} <= ntok) OR (ntok < {n} AND pos = 0)),
g2 AS (SELECT doc_id, pos, g AS h FROM grams),
{_mix64_ctes('g2', 'doc_id, pos', prefix='gm')},
ug AS MATERIALIZED (SELECT DISTINCT doc_id, h FROM gm5),
bench AS (SELECT DISTINCT u.h FROM ug u JOIN split s USING (doc_id) WHERE s.b >= 900),
bp0 AS (
{bsel}),
{_mix64_ctes('bp0', 'g, j', prefix='bb')},
pset AS MATERIALIZED (SELECT DISTINCT CAST(h & {pmask} AS BIGINT) AS p FROM bb5),
tug AS (SELECT u.doc_id, u.h FROM ug u JOIN split s USING (doc_id) WHERE s.b < 900),
tp0 AS (
{tsel}),
{_mix64_ctes('tp0', 'doc_id, g, j', prefix='tb')},
tpos AS (SELECT doc_id, g, CAST(h & {pmask} AS BIGINT) AS p FROM tb5),
fg AS (SELECT doc_id, g FROM tpos JOIN pset USING (p)
       GROUP BY doc_id, g HAVING COUNT(*) = {k_hashes}),
hits AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS nh FROM fg GROUP BY doc_id),
sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS sz FROM ug GROUP BY doc_id)
SELECT h.doc_id, h.nh AS n_maybe_hits, z.sz AS n_ngrams,
       ROUND(CAST(h.nh AS DOUBLE) / z.sz, 6) AS flag_frac
FROM hits h JOIN sizes z ON z.doc_id = h.doc_id"""


def vocab_edit_pairs_sql(min_len: int = 2, max_len: int = 20, max_distance: int = 2) -> str:
    """Mirror of data_ops.text.edit_distance_pairs: the same ≤2-deletion
    neighborhood (self, every single deletion, every deletion pair)
    self-joined, verified with DuckDB's levenshtein."""
    d2 = (
        """
  UNION ALL
  SELECT tok, substr(tok, 1, i) || substr(tok, i + 2, j - i - 1) || substr(tok, j + 2) AS v
  FROM pos2"""
        if max_distance >= 2
        else ""
    )
    return f"""WITH toks0 AS (
  SELECT DISTINCT unnest(list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')) AS tok
  FROM documents),
toks AS MATERIALIZED (
  SELECT tok FROM toks0
  WHERE len(tok) BETWEEN {min_len} AND {max_len}
    AND len(tok) = strlen(tok)),
pos AS (SELECT tok, unnest(range(len(tok))) AS i FROM toks),
pos2 AS (SELECT tok, i, j FROM (
  SELECT tok, i, unnest(range(len(tok))) AS j FROM pos) WHERE j > i),
var AS MATERIALIZED (
  SELECT tok, tok AS v FROM toks
  UNION ALL
  SELECT tok, substr(tok, 1, i) || substr(tok, i + 2) AS v FROM pos{d2}),
p AS (SELECT DISTINCT a.tok AS tok_a, b.tok AS tok_b
      FROM var a JOIN var b ON a.v = b.v AND a.tok < b.tok)
SELECT tok_a, tok_b FROM p
WHERE levenshtein(tok_a, tok_b) BETWEEN 1 AND {max_distance}"""


def _gopher_ctes(
    min_words: int = 50,
    max_words: int = 100_000,
    min_mwl: int = 3,
    max_mwl: int = 10,
    min_stop: int = 2,
    sym_pct: int = 10,
    rep_pct: int = 20,
    n: int = 2,
) -> str:
    """CTE prefix shared by the gopher-filter oracles; final CTE ``m``
    has (doc_id, n_words, mask)."""
    gold = 0x9E3779B97F4A7C15
    stop = r"\b(the|and|of|to|in|is|that|with|for)\b"
    return f"""f AS (
  SELECT doc_id,
    length(regexp_extract_all(text, '\\S+')) AS n_words,
    length(regexp_extract_all(text, '\\S')) AS n_wchars,
    length(regexp_extract_all(lower(text), '{stop}')) AS n_stop,
    length(regexp_extract_all(text, '[^\\p{{L}}\\p{{N}}_\\s]')) AS n_sym,
    length(text) AS n_chars
  FROM documents),
toks AS (
  SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS tl
  FROM documents),
tokr AS (
  SELECT doc_id, unnest(tl) AS tok, unnest(range(len(tl))) AS pos, len(tl) AS ntok
  FROM toks),
raw AS (SELECT doc_id, pos, ntok, {_TOKEN_FOLD} AS h FROM tokr),
{_mix64_ctes('raw', 'doc_id, pos, ntok', prefix='tm')},
win AS (
  SELECT doc_id, pos, ntok,
         list(h) OVER (PARTITION BY doc_id ORDER BY pos
           ROWS BETWEEN CURRENT ROW AND {n - 1} FOLLOWING) AS hl
  FROM tm5),
grams AS (
  SELECT doc_id, list_reduce(list_prepend(CAST(0 AS HUGEINT), hl),
         (a, v) -> (({_mulmod64('a', gold)} + v) & {_M64})) AS g
  FROM win WHERE (ntok >= {n} AND pos + {n} <= ntok) OR (ntok < {n} AND pos = 0)),
rep AS (SELECT doc_id, COUNT(*) AS ng, COUNT(DISTINCT g) AS nd FROM grams GROUP BY doc_id),
m AS (
  SELECT f.doc_id, f.n_words,
    (CASE WHEN n_words < {min_words} OR n_words > {max_words} THEN 1 ELSE 0 END
   + CASE WHEN n_wchars < {min_mwl} * n_words OR n_wchars > {max_mwl} * n_words THEN 2 ELSE 0 END
   + CASE WHEN n_stop < {min_stop} THEN 4 ELSE 0 END
   + CASE WHEN 100 * n_sym > {sym_pct} * n_chars THEN 8 ELSE 0 END
   + CASE WHEN 100 * (COALESCE(ng, 0) - COALESCE(nd, 0)) > {rep_pct} * COALESCE(ng, 0) THEN 16 ELSE 0 END
    ) AS mask
  FROM f LEFT JOIN rep ON rep.doc_id = f.doc_id)"""


def doc_gopher_filter_sql(**kw) -> str:
    """Mirror of data_ops.curation.gopher_filter: the same RE2 counts,
    the same hashed-gram repetition space (doc_repetition's CTEs), the
    same integer cross-multiplied rules."""
    return f"""WITH {_gopher_ctes(**kw)}
SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
       CAST(mask AS BIGINT) AS reason_mask,
       CAST(CASE WHEN mask = 0 THEN 1 ELSE 0 END AS BIGINT) AS keep
FROM m"""


def source_lang_pivot_sql(langs=("de", "en", "es", "fr", "zh")) -> str:
    """Mirror of queries.q_source_lang_pivot (conditional aggregation
    over the (source, lang) base)."""
    cols = ",\n".join(
        f"       CAST(COALESCE(SUM(n) FILTER (lang = '{lg}'), 0) AS BIGINT) AS n_{lg}"
        for lg in langs
    )
    inlist = ", ".join(f"'{lg}'" for lg in langs)
    return f"""WITH b AS (
  SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS n
  FROM documents GROUP BY 1, 2)
SELECT source,
{cols},
       CAST(COALESCE(SUM(n) FILTER (lang NOT IN ({inlist})), 0) AS BIGINT) AS n_other,
       CAST(SUM(n) AS BIGINT) AS n_total
FROM b GROUP BY source"""


def source_quality_rollup_sql(**kw) -> str:
    """Mirror of queries.q_source_quality_rollup (the gopher mask
    rolled up per source; BIT_OR of reasons)."""
    return f"""WITH {_gopher_ctes(**kw)}
SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN m.mask = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(BIT_OR(m.mask) AS BIGINT) AS reasons_seen
FROM m JOIN documents d USING (doc_id)
GROUP BY d.source"""


def dag_layers_sql() -> str:
    """Mirror of algos.dag.dag_layers over the canonical acyclic
    orientation (a < b): longest-path level per vertex via monotone
    max-plus relaxation. State-carrying recursive CTE (edges + layers
    re-emitted while any layer changed — the coloring_sql pattern);
    layers are monotone nondecreasing, so the final value is the MAX
    across iterations."""
    return f"""WITH RECURSIVE {GRAPH_CTES},
cu AS MATERIALIZED (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b FROM e WHERE src <> dst),
cv AS MATERIALIZED (SELECT a AS id FROM cu UNION SELECT b AS id FROM cu),
st(kind, a, b, layer) AS (
  SELECT * FROM (
    SELECT 0 AS kind, a, b, CAST(NULL AS BIGINT) AS layer FROM cu
    UNION ALL
    SELECT 1, id, NULL, CAST(0 AS BIGINT) FROM cv)
  UNION ALL
  SELECT * FROM (
    WITH prev_e AS MATERIALIZED (SELECT a, b FROM st WHERE kind = 0),
         prev_v AS MATERIALIZED (SELECT a AS id, layer FROM st WHERE kind = 1),
         relax AS MATERIALIZED (
           SELECT pv.id,
                  GREATEST(pv.layer, COALESCE(m.mx + 1, 0)) AS layer
           FROM prev_v pv LEFT JOIN (
             SELECT pe.b AS id, MAX(u.layer) AS mx
             FROM prev_e pe JOIN prev_v u ON u.id = pe.a GROUP BY pe.b) m
           ON m.id = pv.id),
         ch AS MATERIALIZED (
           SELECT COUNT(*) AS c FROM relax r
           JOIN prev_v p ON p.id = r.id AND p.layer <> r.layer)
    SELECT 0 AS kind, a, b, CAST(NULL AS BIGINT) FROM prev_e
    WHERE (SELECT c FROM ch) > 0
    UNION ALL
    SELECT 1, id, NULL, layer FROM relax WHERE (SELECT c FROM ch) > 0))
SELECT a AS vertex, CAST(MAX(layer) AS BIGINT) AS layer
FROM st WHERE kind = 1 GROUP BY a"""


def corpus_pipeline_sql(
    patterns: tuple[str, ...],
    *,
    quality_min: float = 0.5,
    seq_len: int = 512,
    repl: str = "[REDACTED]",
) -> str:
    """Mirror of queries.q_corpus_pipeline: dedup survivors (min id per
    exact text) → quality >= threshold (doc_quality_sql's formula,
    rounded to 6 like the engine so the boundary matches) → the scrub
    chain → seq_pack_sql's slot expansion over the SCRUBBED text in
    doc_id order → one audit row."""

    def lit(x: str) -> str:
        return "'" + x.replace("'", "''") + "'"

    stop = r"\b(the|and|of|to|in|is|that|with|for)\b"
    steps = ["s0 AS (SELECT doc_id, text AS t, CAST(0 AS BIGINT) AS hits FROM keepq)"]
    for k, pat in enumerate(patterns):
        steps.append(
            f"""s{k + 1} AS (
  SELECT doc_id, regexp_replace(t, {lit(pat)}, {lit(repl)}, 'g') AS t,
         hits + len(regexp_extract_all(t, {lit(pat)})) AS hits
  FROM s{k})"""
        )
    last = f"s{len(patterns)}"
    return f"""WITH surv AS MATERIALIZED (
  SELECT MIN(doc_id) AS doc_id, text FROM documents GROUP BY text),
f AS (
  SELECT doc_id,
         CAST(length(text) AS DOUBLE) AS len,
         CAST(length(regexp_extract_all(text, '[^\\p{{L}}\\p{{N}}_\\s]')) AS DOUBLE) AS n_punct,
         CAST(length(regexp_extract_all(lower(text), '[\\p{{L}}\\p{{N}}_]+')) AS DOUBLE) AS n_words,
         CAST(length(regexp_extract_all(lower(text), '[\\p{{L}}\\p{{N}}_]')) AS DOUBLE) AS n_word_chars,
         CAST(length(regexp_extract_all(lower(text), {lit(stop)})) AS DOUBLE) AS n_stop
  FROM surv),
g AS (
  SELECT doc_id, len,
         n_punct / greatest(len, 1.0) AS punct_ratio,
         n_stop / greatest(n_words, 1.0) AS stop_ratio,
         CASE WHEN n_words > 0 THEN n_word_chars / greatest(n_words, 1.0) ELSE 0.0 END AS mwl
  FROM f),
qual AS (
  SELECT doc_id,
         ROUND(least(greatest(len / 500.0, 0), 1) * 0.3
             + least(greatest(1 - punct_ratio * 4, 0), 1) * 0.3
             + least(greatest(stop_ratio * 5, 0), 1) * 0.2
             + least(greatest(1 - abs(mwl - 5) / 5, 0), 1) * 0.2, 6) AS quality
  FROM g),
keepq AS MATERIALIZED (
  SELECT s.doc_id, s.text FROM surv s JOIN qual q ON q.doc_id = s.doc_id
  WHERE q.quality >= {quality_min}),
{','.join(steps)},
toks AS (
  SELECT doc_id,
         CASE WHEN TRIM(t) = '' THEN 0
              ELSE len(regexp_split_to_array(TRIM(t), '\\s+')) END + 1 AS slots
  FROM {last}),
sp AS (
  SELECT doc_id, slots,
         COALESCE(SUM(slots) OVER (ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS st
  FROM toks),
ex AS (
  SELECT UNNEST(range(CAST(st // {seq_len} AS BIGINT),
                      CAST((st + slots - 1) // {seq_len} + 1 AS BIGINT))) AS seq
  FROM sp)
SELECT (SELECT COUNT(*) FROM documents) AS n_docs,
       (SELECT COUNT(*) FROM surv) AS n_unique,
       (SELECT COUNT(*) FROM keepq) AS n_quality,
       (SELECT CAST(COALESCE(SUM(hits), 0) AS BIGINT) FROM {last}) AS n_redactions,
       (SELECT CAST(COUNT(DISTINCT seq) AS BIGINT) FROM ex) AS n_seqs"""


def scrub_sql(patterns: tuple[str, ...], repl: str = "[REDACTED]") -> str:
    """Mirror of data_ops.text.scrub_patterns: patterns applied in
    order, each counted on the text state it sees (DuckDB's regex is
    RE2 like Arrow's, so matches are byte-identical)."""

    def lit(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    steps = ["s0 AS (SELECT doc_id, text AS t, CAST(0 AS BIGINT) AS hits FROM documents)"]
    for k, pat in enumerate(patterns):
        steps.append(
            f"""s{k + 1} AS (
  SELECT doc_id,
         regexp_replace(t, {lit(pat)}, {lit(repl)}, 'g') AS t,
         hits + len(regexp_extract_all(t, {lit(pat)})) AS hits
  FROM s{k})"""
        )
    last = f"s{len(patterns)}"
    return f"""WITH {','.join(steps)}
SELECT doc_id, t AS text, CAST(hits AS BIGINT) AS n_redactions,
       CAST(length(t) AS BIGINT) AS n_chars FROM {last}"""


def duplicate_spans_sql(n: int = 8) -> str:
    """Mirror of data_ops.curation.duplicate_spans: per doc the count
    of its DISTINCT word n-grams shared with at least one other doc.
    Same gram CTEs as doc_repetition_sql; grouping on the rolled gram
    is equivalent to the engine's mixed key because the splitmix64
    finalizer is a bijection."""
    gold = 0x9E3779B97F4A7C15
    return f"""WITH toks AS (
  SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS tl
  FROM documents),
tokr AS (
  SELECT doc_id, unnest(tl) AS tok, unnest(range(len(tl))) AS pos, len(tl) AS ntok
  FROM toks),
raw AS (SELECT doc_id, pos, ntok, {_TOKEN_FOLD} AS h FROM tokr),
{_mix64_ctes('raw', 'doc_id, pos, ntok', prefix='tm')},
win AS (
  SELECT doc_id, pos, ntok,
         list(h) OVER (PARTITION BY doc_id ORDER BY pos
           ROWS BETWEEN CURRENT ROW AND {n - 1} FOLLOWING) AS hl
  FROM tm5),
grams AS (
  SELECT doc_id, list_reduce(list_prepend(CAST(0 AS HUGEINT), hl),
         (a, v) -> (({_mulmod64('a', gold)} + v) & {_M64})) AS g
  FROM win WHERE (ntok >= {n} AND pos + {n} <= ntok) OR (ntok < {n} AND pos = 0)),
ug AS MATERIALIZED (SELECT DISTINCT doc_id, g FROM grams),
cnt AS MATERIALIZED (SELECT g, COUNT(*) AS nd FROM ug GROUP BY g)
SELECT u.doc_id, CAST(COUNT(*) AS BIGINT) AS n_ngrams,
       CAST(SUM(CASE WHEN c.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
       ROUND(CAST(SUM(CASE WHEN c.nd >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 6) AS dup_frac
FROM ug u JOIN cnt c USING (g) GROUP BY u.doc_id"""


def source_cap_sql(k: int = 10) -> str:
    """Mirror of queries.q_source_cap: row_number per source under
    (n_chars desc, doc_id asc), capped at k."""
    return f"""WITH r AS (
  SELECT source, doc_id, n_chars,
         row_number() OVER (PARTITION BY source
           ORDER BY n_chars DESC, doc_id) AS rank
  FROM documents)
SELECT source, doc_id, n_chars, CAST(rank AS BIGINT) AS rank
FROM r WHERE rank <= {k}"""


def _bpe_round_ctes(num_merges: int) -> list:
    """Shared CTE chain of the BPE oracles (train rounds t0..tN — see
    bpe_merges_sql for the semantics)."""
    parts = [
        """toks AS (SELECT unnest(string_split_regex(text, '\\s+')) AS token FROM documents)""",
        """wf AS MATERIALIZED (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS freq FROM toks WHERE token <> '' GROUP BY token)""",
        """t0 AS MATERIALIZED (
  SELECT w, pos, substr(h, CAST(2 * pos + 1 AS INT), 2) AS sym, freq FROM (
    SELECT token AS w, freq, hex(encode(token)) AS h,
           CAST(unnest(range(octet_length(encode(token)))) AS BIGINT) AS pos
    FROM wf))""",
    ]
    for r in range(num_merges):
        parts.append(
            f"""p{r} AS MATERIALIZED (
  SELECT a.sym AS x, b.sym AS y, SUM(a.freq) AS c
  FROM t{r} a JOIN t{r} b ON b.w = a.w AND b.pos = a.pos + 1
  GROUP BY 1, 2)"""
        )
        parts.append(
            f"b{r} AS MATERIALIZED (SELECT x, y, c FROM p{r} ORDER BY c DESC, x, y LIMIT 1)"
        )
        parts.append(
            f"""c{r} AS MATERIALIZED (
  SELECT a.w, a.pos FROM t{r} a JOIN t{r} bb ON bb.w = a.w AND bb.pos = a.pos + 1, b{r}
  WHERE a.sym = b{r}.x AND bb.sym = b{r}.y)"""
        )
        parts.append(
            f"""k{r} AS MATERIALIZED (
  SELECT w, pos FROM (
    SELECT w, pos, row_number() OVER (PARTITION BY w, rid ORDER BY pos) AS rn
    FROM (SELECT w, pos, pos - row_number() OVER (PARTITION BY w ORDER BY pos) AS rid
          FROM c{r}))
  WHERE rn % 2 = 1)"""
        )
        parts.append(
            f"""t{r + 1} AS MATERIALIZED (
  SELECT w, row_number() OVER (PARTITION BY w ORDER BY pos) - 1 AS pos, sym, freq FROM (
    SELECT t.w, t.pos,
           CASE WHEN k.pos IS NOT NULL THEN t.sym || (SELECT y FROM b{r}) ELSE t.sym END AS sym,
           t.freq
    FROM t{r} t
    LEFT JOIN k{r} k ON k.w = t.w AND k.pos = t.pos
    LEFT JOIN k{r} kp ON kp.w = t.w AND kp.pos = t.pos - 1
    WHERE kp.pos IS NULL))"""
        )
    return parts


def bpe_merges_sql(num_merges: int = 3) -> str:
    """Mirror of data_ops.text.bpe_merges: unrolled byte-level BPE
    rounds over the exact word-frequency table. Symbols are hex byte
    strings (merges concatenate them — fixed-width monotone digits
    make hex order ≡ byte order); pair counts weight by word
    frequency with overlapping pairs included; the merge rewrite is
    leftmost-greedy (alternating keeps within runs of position-
    adjacent candidates)."""
    parts = _bpe_round_ctes(num_merges)
    sel = "\nUNION ALL ".join(
        f"SELECT CAST({r + 1} AS BIGINT) AS rank, x AS lhs, y AS rhs, CAST(c AS BIGINT) AS cnt FROM b{r}"
        for r in range(num_merges)
    )
    return "WITH " + ",\n".join(parts) + "\n" + sel


def bpe_encode_sql(num_merges: int = 8) -> str:
    """Mirror of data_ops.text.bpe_encode_counts: the training rounds'
    final word table t{N} collapsed to per-word symbol counts, joined
    back to the document token occurrences."""
    parts = _bpe_round_ctes(num_merges)
    parts.append(
        f"""wlen AS MATERIALIZED (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS ns FROM t{num_merges} GROUP BY w)"""
    )
    parts.append(
        """occ AS (
  SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS token FROM documents)"""
    )
    return (
        "WITH "
        + ",\n".join(parts)
        + """
SELECT occ.doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(wlen.ns) AS BIGINT) AS n_tokens_bpe
FROM occ JOIN wlen ON wlen.w = occ.token
GROUP BY occ.doc_id"""
    )


def doc_chunks_sql(size: int = 200, stride: int = 150) -> str:
    """Mirror of data_ops.curation.chunk_documents: chunk k covers
    chars [k·stride, k·stride+size) while k·stride < length (ASCII
    corpus: char offsets ≡ byte offsets on both sides)."""
    return f"""WITH g AS (
  SELECT doc_id, text,
         CAST(unnest(range((length(text) + {stride} - 1) // {stride})) AS BIGINT) AS chunk_id
  FROM documents)
SELECT doc_id, chunk_id, CAST(chunk_id * {stride} AS BIGINT) AS start,
       substr(text, CAST(chunk_id * {stride} + 1 AS INT), {size}) AS chunk
FROM g"""


def keyword_search_sql(terms: tuple = ("merge", "join")) -> str:
    """Mirror of queries.q_keyword_search: docs whose lowered
    whitespace tokens contain ALL terms."""
    quoted = ", ".join(f"'{t}'" for t in terms)
    return f"""WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS tok FROM documents)
SELECT doc_id FROM toks WHERE tok IN ({quoted})
GROUP BY doc_id HAVING COUNT(DISTINCT tok) = {len(terms)}"""


def group_sample_sql(k: int = 5, seed: int = 424242) -> str:
    """Mirror of queries.q_group_sample: uniform k-subset per source
    by the splitmix64 doc rank (shifted >>2 like the Ray side so the
    comparison space is identical)."""
    gold = 0x9E3779B97F4A7C15
    key = f"xor({_mulmod64('CAST(doc_id AS HUGEINT)', gold)}, CAST({seed} AS HUGEINT))"
    return f"""WITH kh AS MATERIALIZED (SELECT doc_id, source, {key} AS h FROM documents),
{_mix64_ctes('kh', 'doc_id, source')},
r AS (
  SELECT source, doc_id,
         row_number() OVER (PARTITION BY source ORDER BY h >> 2, doc_id) AS rank
  FROM mx5)
SELECT source, doc_id, CAST(rank AS BIGINT) AS rank FROM r WHERE rank <= {k}"""


def lang_mix_sql(seed: int = 777) -> str:
    """Mirror of data_ops.curation.lang_mix_sample: per-lang counts,
    integer threshold (min_count*10^6)//count, keep iff
    splitmix64(doc_id*GOLD xor seed) mod 10^6 < threshold."""
    gold = 0x9E3779B97F4A7C15
    key = f"xor({_mulmod64('CAST(doc_id AS HUGEINT)', gold)}, CAST({seed} AS HUGEINT))"
    return f"""WITH c AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
m AS (SELECT MIN(n) AS mn FROM c),
th AS (SELECT lang, n, (mn * 1000000) // n AS thresh FROM c, m),
dk AS MATERIALIZED (SELECT doc_id, lang, {key} AS h FROM documents),
{_mix64_ctes("dk", "doc_id, lang", prefix="lx")},
b AS (SELECT lang, CAST(h % 1000000 AS BIGINT) AS bkt FROM lx5)
SELECT t.lang, CAST(t.n AS BIGINT) AS n_total, CAST(t.thresh AS BIGINT) AS threshold,
       CAST(COUNT(CASE WHEN b.bkt < t.thresh THEN 1 END) AS BIGINT) AS n_kept
FROM b JOIN th t USING (lang) GROUP BY t.lang, t.n, t.thresh"""


def events_retention_sql() -> str:
    """Mirror of queries.q_events_retention: distinct (user, epoch-day)
    pairs; per day the active count and the users also present on
    day+1."""
    return """WITH ud AS (
  SELECT DISTINCT user_id,
         CAST(epoch(date_trunc('day', ts)) AS BIGINT) // 86400 AS day
  FROM events),
act AS (SELECT day, COUNT(*) AS n_active FROM ud GROUP BY day),
ret AS (
  SELECT a.day, COUNT(*) AS n_ret
  FROM ud a JOIN ud b ON b.user_id = a.user_id AND b.day = a.day + 1
  GROUP BY a.day)
SELECT act.day, CAST(act.n_active AS BIGINT) AS n_active,
       CAST(COALESCE(ret.n_ret, 0) AS BIGINT) AS n_retained_next,
       ROUND(CAST(COALESCE(ret.n_ret, 0) AS DOUBLE) / act.n_active, 6) AS retention
FROM act LEFT JOIN ret ON ret.day = act.day"""


def cms_heavy_hitters_sql(
    depth: int = 4, width: int = 1024, k: int = 20, seed: int = 20260818,
) -> str:
    """Mirror of data_ops.text.cms_heavy_hitters: distinct lowered
    tokens hashed (token fold -> splitmix64), per sketch row r bucket
    = splitmix64(h XOR (seed+r)) % width, bucket sums weighted by the
    exact token counts, estimate = LEAST over rows for the exact
    top-k tokens."""
    parts = [f"""toks AS (
  SELECT unnest(list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')) AS tok
  FROM documents),
cnts AS MATERIALIZED (SELECT tok, CAST(COUNT(*) AS BIGINT) AS cnt FROM toks GROUP BY tok),
raw AS (SELECT tok, {{fold}} AS h FROM (SELECT tok FROM cnts)),
{_mix64_ctes('raw', 'tok', prefix='tm')}""".replace("{fold}", _TOKEN_FOLD)]
    for r in range(depth):
        parts.append(
            f"""xr{r} AS (SELECT tok, xor(h, CAST({seed + r} AS HUGEINT)) AS h FROM tm5),
{_mix64_ctes(f'xr{r}', 'tok', prefix=f'bk{r}')},
bb{r} AS MATERIALIZED (SELECT tok, CAST(h % {width} AS BIGINT) AS b FROM bk{r}5),
sk{r} AS MATERIALIZED (
  SELECT bb{r}.b, CAST(SUM(cnts.cnt) AS BIGINT) AS c
  FROM bb{r} JOIN cnts USING (tok) GROUP BY bb{r}.b)"""
        )
    joins = "\n".join(
        f"JOIN bb{r} ON bb{r}.tok = t.tok JOIN sk{r} ON sk{r}.b = bb{r}.b"
        for r in range(depth)
    )
    least = ", ".join(f"sk{r}.c" for r in range(depth))
    body = ",\n".join(parts)
    return f"""WITH {body},
topk AS MATERIALIZED (SELECT tok, cnt FROM cnts ORDER BY cnt DESC, tok ASC LIMIT {k})
SELECT t.tok AS token, t.cnt AS exact_cnt, LEAST({least}) AS cms_est
FROM topk t
{joins}"""


def events_user_hll_sql(seed: int = 20260818) -> str:
    """Mirror of queries.q_events_user_hll: HLL register maxima per
    event_type over splitmix64(user_id*GOLD xor seed) (bucket = h>>58,
    rho = 59 - bit_length(h mod 2^58)) and the alpha_64 estimate with
    the small-range correction."""
    gold = 0x9E3779B97F4A7C15
    key = f"xor({_mulmod64('CAST(user_id AS HUGEINT)', gold)}, CAST({seed} AS HUGEINT))"
    m58 = (1 << 58) - 1
    return f"""WITH hk AS MATERIALIZED (SELECT event_type, {key} AS h FROM events),
{_mix64_ctes("hk", "event_type", prefix="hm")},
r AS (
  SELECT event_type, CAST(h >> 58 AS BIGINT) AS bucket,
         59 - length(ltrim(bin(CAST(h & {m58} AS BIGINT)), '0')) AS rho
  FROM hm5),
regs AS (
  SELECT t.event_type, j.j,
         COALESCE((SELECT MAX(rho) FROM r
                   WHERE r.event_type = t.event_type AND r.bucket = j.j), 0) AS val
  FROM (SELECT DISTINCT event_type FROM events) t
  CROSS JOIN (SELECT unnest(range(64)) AS j) j),
est AS (
  SELECT event_type,
         0.709 * 64 * 64 / SUM(pow(2.0, -val)) AS raw,
         SUM(CASE WHEN val = 0 THEN 1 ELSE 0 END) AS zeros
  FROM regs GROUP BY event_type)
SELECT event_type,
       ROUND(CASE WHEN raw <= 2.5 * 64 AND zeros > 0
                  THEN 64 * ln(64.0 / zeros) ELSE raw END, 4) AS hll_distinct
FROM est"""


# ----------------------------------------------------- relational joins


def orders_customers_sql() -> str:
    """Mirror of queries.q_orders_customers (inner equi-join)."""
    return """SELECT o.o_orderkey, o.o_totalprice, c.c_name, c.c_mktsegment
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey"""


def events_asof_view_sql() -> str:
    """Mirror of queries.q_events_asof_view: latest view ≤ purchase ts
    per user, ties to the largest view event id; unmatched → -1 / 0."""
    return """WITH p AS (
  SELECT event_id, user_id, epoch_us(ts) AS ts_u
  FROM events WHERE event_type = 'purchase'),
v AS (
  SELECT user_id, epoch_us(ts) AS vts, event_id AS vid, value AS vval
  FROM events WHERE event_type = 'view'),
m AS (
  SELECT p.event_id, v.vid, v.vval,
         ROW_NUMBER() OVER (PARTITION BY p.event_id
                            ORDER BY v.vts DESC, v.vid DESC) AS rn
  FROM p JOIN v ON v.user_id = p.user_id AND v.vts <= p.ts_u)
SELECT p.event_id, p.user_id, p.ts_u,
       COALESCE(m.vid, -1) AS view_event_id,
       COALESCE(m.vval, 0.0) AS view_value
FROM p LEFT JOIN (SELECT * FROM m WHERE rn = 1) m USING (event_id)"""


def events_next_view_sql() -> str:
    """Mirror of queries.q_events_next_view (earliest view ≥ purchase
    ts per user, ties to the largest view event id)."""
    return """WITH p AS (
  SELECT event_id, user_id, epoch_us(ts) AS ts_u
  FROM events WHERE event_type = 'purchase'),
v AS (
  SELECT user_id, epoch_us(ts) AS vts, event_id AS vid, value AS vval
  FROM events WHERE event_type = 'view'),
m AS (
  SELECT p.event_id, v.vid, v.vval,
         ROW_NUMBER() OVER (PARTITION BY p.event_id
                            ORDER BY v.vts ASC, v.vid DESC) AS rn
  FROM p JOIN v ON v.user_id = p.user_id AND v.vts >= p.ts_u)
SELECT p.event_id, p.user_id, p.ts_u,
       COALESCE(m.vid, -1) AS view_event_id,
       COALESCE(m.vval, 0.0) AS view_value
FROM p LEFT JOIN (SELECT * FROM m WHERE rn = 1) m USING (event_id)"""


def events_attribution_sql(window_us: int = 3_600_000_000) -> str:
    """Mirror of queries.q_events_attribution."""
    return f"""WITH p AS (
  SELECT event_id, user_id, epoch_us(ts) AS ts_u,
         CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT) AS val_u
  FROM events WHERE event_type = 'purchase'),
v AS (
  SELECT user_id, epoch_us(ts) AS vts, event_id AS vid
  FROM events WHERE event_type = 'view'),
m AS (
  SELECT p.event_id, p.val_u, p.ts_u, v.vts,
         ROW_NUMBER() OVER (PARTITION BY p.event_id
                            ORDER BY v.vts DESC, v.vid DESC) AS rn
  FROM p JOIN v ON v.user_id = p.user_id AND v.vts <= p.ts_u),
j AS (
  SELECT p.event_id, p.val_u, p.ts_u, m.vts
  FROM p LEFT JOIN (SELECT * FROM m WHERE rn = 1) m USING (event_id)),
f AS (SELECT *, (vts IS NOT NULL AND ts_u - vts <= {window_us}) AS attributed FROM j)
SELECT CAST(SUM(CASE WHEN attributed THEN 1 ELSE 0 END) AS BIGINT) AS n_attributed,
       CAST(SUM(CASE WHEN attributed THEN 0 ELSE 1 END) AS BIGINT) AS n_organic,
       CAST(COALESCE(SUM(CASE WHEN attributed THEN val_u END), 0) AS BIGINT) AS attributed_value_u
FROM f"""


def cust_region_rollup_sql() -> str:
    """Mirror of queries.q_cust_region_rollup (sum rounded to 4)."""
    return """SELECT r.r_name, CAST(COUNT(*) AS BIGINT) AS n_cust,
       ROUND(SUM(c.c_acctbal), 4) AS sum_acctbal
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name"""


def events_running_total_sql() -> str:
    """Mirror of queries.q_events_running_total (integer micro-units,
    unique window order → no RANGE-peer ambiguity)."""
    return """WITH t AS (
  SELECT event_id, user_id, epoch_us(ts) AS ts_u,
         CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT) AS val_u
  FROM events)
SELECT event_id, user_id, ts_u,
       ROW_NUMBER() OVER w AS rn,
       CAST(SUM(val_u) OVER w AS BIGINT) AS run_total_u,
       COALESCE(LAG(val_u) OVER w, -1) AS prev_u
FROM t WINDOW w AS (PARTITION BY user_id ORDER BY ts_u, event_id)"""


def events_hourly_anomaly_sql() -> str:
    """Mirror of queries.q_events_hourly_anomaly (identical double
    expression tree over identical integer moments; 3σ flag)."""
    return """WITH t AS (
  SELECT event_type, CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS ws
  FROM events),
b AS (SELECT event_type, ws, CAST(COUNT(*) AS BIGINT) AS n FROM t GROUP BY 1, 2),
s AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS h,
             CAST(SUM(n) AS BIGINT) AS sn, CAST(SUM(n*n) AS BIGINT) AS ssn
      FROM b GROUP BY 1),
z AS (SELECT b.event_type, b.ws, b.n,
             CAST(s.sn AS DOUBLE) / s.h AS mean,
             (CAST(s.ssn AS DOUBLE) - CAST(s.sn AS DOUBLE) * s.sn / s.h) / s.h AS var
      FROM b JOIN s USING (event_type))
SELECT event_type, ws AS window_start, n,
       ROUND(CASE WHEN var > 0 THEN (n - mean) * (n - mean) / var ELSE 0 END, 6) AS z2,
       CAST(CASE WHEN var > 0 AND (n - mean) * (n - mean) > 9 * var
            THEN 1 ELSE 0 END AS BIGINT) AS is_anomaly
FROM z"""


def events_ntile_sql(k: int = 4) -> str:
    """Mirror of queries.q_events_ntile (unique order → exact NTILE)."""
    return f"""WITH t AS (
  SELECT event_id, CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT) AS val_u
  FROM events)
SELECT event_id, val_u,
       CAST(NTILE({k}) OVER (ORDER BY val_u, event_id) AS BIGINT) AS bucket
FROM t"""


def events_quantiles_cont_sql(qs=(0.5, 0.9, 0.99)) -> str:
    """Mirror of queries.q_events_quantiles_cont (same interpolation
    expression as DuckDB's quantile_cont; rounded 6)."""
    rows = "\nUNION ALL\n".join(
        f"SELECT CAST({q} AS DOUBLE) AS q, ROUND(quantile_cont(value, {q}), 6) AS value FROM events"
        for q in qs
    )
    return rows


def events_type_quantiles_cont_sql(qs=(0.5, 0.9)) -> str:
    """Mirror of queries.q_events_type_quantiles_cont."""
    rows = "\nUNION ALL\n".join(
        f"""SELECT event_type, CAST({q} AS DOUBLE) AS q,
       ROUND(quantile_cont(value, {q}), 6) AS value
FROM events GROUP BY event_type"""
        for q in qs
    )
    return rows


def lineitem_correlations_sql() -> str:
    """Mirror of queries.q_lineitem_correlations (HUGEINT exact
    moments, identical double correlation expression, rounded 6)."""
    scales = {
        "l_quantity": 100,
        "l_extendedprice": 100,
        "l_discount": 1_000_000,
        "l_tax": 1_000_000,
    }
    cols = list(scales)
    qex = {
        c: f"CAST(FLOOR({c} * {s} + 0.5) AS HUGEINT)" for c, s in scales.items()
    }
    qcols = ",\n  ".join(f"{qex[c]} AS q_{c}" for c in cols)
    moments = ["CAST(COUNT(*) AS HUGEINT) AS n"]
    moments += [f"SUM(q_{c}) AS s_{c}" for c in cols]
    for i, a in enumerate(cols):
        for c in cols[i:]:
            moments.append(f"SUM(q_{a} * q_{c}) AS m_{a}_{c}")
    rows = []
    for i, a in enumerate(cols):
        for c in cols[i + 1 :]:
            rows.append(
                f"""SELECT '{a}' AS col_a, '{c}' AS col_b,
  ROUND(CAST(n * m_{a}_{c} - s_{a} * s_{c} AS DOUBLE)
        / SQRT(CAST(n * m_{a}_{a} - s_{a} * s_{a} AS DOUBLE)
               * CAST(n * m_{c}_{c} - s_{c} * s_{c} AS DOUBLE)), 6) AS r
FROM m"""
            )
    body = ",\n  ".join(moments)
    final = "\nUNION ALL\n".join(rows)
    return f"""WITH t AS (
  SELECT {qcols}
  FROM lineitem),
m AS (SELECT {body} FROM t)
{final}"""


def events_profile_sql() -> str:
    """Mirror of queries.q_events_profile (one aggregate per numeric
    column, integer units)."""
    cols = {
        "event_id": "event_id",
        "user_id": "user_id",
        "ts_u": "epoch_us(ts)",
        "val_u": "CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT)",
    }
    sel = "\nUNION ALL\n".join(
        f"""SELECT '{name}' AS "column", CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(*) - COUNT({expr}) AS BIGINT) AS n_null,
       CAST(MIN({expr}) AS BIGINT) AS min_v, CAST(MAX({expr}) AS BIGINT) AS max_v,
       CAST({'0' if name == 'ts_u' else f'SUM({expr})'} AS BIGINT) AS sum_v
FROM events"""
        for name, expr in cols.items()
    )
    return sel


def events_transitions_sql() -> str:
    """Mirror of queries.q_events_transitions (string LAG per user,
    first event from 'START')."""
    return """WITH t AS (
  SELECT user_id, event_type, epoch_us(ts) AS ts_u, event_id
  FROM events),
l AS (
  SELECT COALESCE(LAG(event_type) OVER (PARTITION BY user_id
           ORDER BY ts_u, event_id), 'START') AS prev_type,
         event_type
  FROM t)
SELECT prev_type, event_type, CAST(COUNT(*) AS BIGINT) AS n
FROM l GROUP BY 1, 2"""


def events_rollup_sql() -> str:
    """Mirror of queries.q_events_rollup (ROLLUP grouping sets;
    sentinels 'ALL'/-1 for the rolled-up keys, integer micro-units)."""
    return """WITH t AS (
  SELECT event_type,
         CAST(epoch(date_trunc('day', ts)) AS BIGINT) // 86400 AS day,
         CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT) AS val_u
  FROM events)
SELECT COALESCE(event_type, 'ALL') AS event_type,
       COALESCE(day, -1) AS day,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(val_u) AS BIGINT) AS value_u
FROM t GROUP BY ROLLUP(event_type, day)"""


def events_promo_windows_sql(k: int = 50, window_us: int = 1_800_000_000) -> str:
    """Mirror of queries.q_events_promo_windows (range join against
    the top-k anchor windows; integer micro-units, deterministic
    anchor tie order)."""
    return f"""WITH t AS (
  SELECT event_id, epoch_us(ts) AS ts_u,
         CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT) AS val_u
  FROM events),
a AS (SELECT event_id AS anchor_id, ts_u AS s FROM t
      ORDER BY val_u DESC, event_id LIMIT {k})
SELECT a.anchor_id, CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(t.val_u) AS BIGINT) AS value_u
FROM a JOIN t ON t.ts_u >= a.s AND t.ts_u < a.s + {window_us}
GROUP BY a.anchor_id"""


def events_sliding_window_sql(window_us: int = 21_600_000_000) -> str:
    """Mirror of queries.q_events_sliding_window (RANGE frame — the
    peer-inclusive windowed aggregate; integer micro-units)."""
    return f"""WITH t AS (
  SELECT event_id, user_id, epoch_us(ts) AS ts_u,
         CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT) AS val_u
  FROM events)
SELECT event_id, user_id, ts_u,
       CAST(COUNT(*) OVER w AS BIGINT) AS w_cnt,
       CAST(SUM(val_u) OVER w AS BIGINT) AS w_sum_u
FROM t WINDOW w AS (PARTITION BY user_id ORDER BY ts_u
  RANGE BETWEEN {window_us} PRECEDING AND CURRENT ROW)"""


def revenue_by_nation_sql() -> str:
    """Mirror of queries.q_revenue_by_nation (integer micro-units;
    the per-row double product is IEEE-identical on both sides)."""
    return """WITH l AS (
  SELECT l_orderkey,
         CAST(FLOOR(l_extendedprice * (1 - l_discount) * 1000000 + 0.5) AS BIGINT) AS rev_u
  FROM lineitem)
SELECT n.n_name, CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(l.rev_u) AS BIGINT) AS revenue_u
FROM l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name"""


def source_overlap_sql(n: int = 3, max_df: int = 64, min_shared: int = 1) -> str:
    """Mirror of data_ops.curation.source_overlap: distinct word
    n-gram hashes per source in the engine's hashed feature space
    (same gram CTEs as contamination/repetition), df-windowed at
    max_df, pairwise shared counts + Jaccard over the windowed sets."""
    gold = 0x9E3779B97F4A7C15
    return f"""WITH toks AS (
  SELECT doc_id, source, list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS tl
  FROM documents),
tokr AS (
  SELECT doc_id, source, unnest(tl) AS tok, unnest(range(len(tl))) AS pos, len(tl) AS ntok
  FROM toks),
raw AS (SELECT doc_id, source, pos, ntok, {_TOKEN_FOLD} AS h FROM tokr),
{_mix64_ctes("raw", "doc_id, source, pos, ntok", prefix="tm")},
win AS (
  SELECT doc_id, source, pos, ntok,
         list(h) OVER (PARTITION BY doc_id ORDER BY pos
           ROWS BETWEEN CURRENT ROW AND {n - 1} FOLLOWING) AS hl
  FROM tm5),
grams AS (
  SELECT source, list_reduce(list_prepend(CAST(0 AS HUGEINT), hl),
         (a, v) -> (({_mulmod64("a", gold)} + v) & {_M64})) AS g
  FROM win WHERE (ntok >= {n} AND pos + {n} <= ntok) OR (ntok < {n} AND pos = 0)),
ug AS MATERIALIZED (SELECT DISTINCT source, g FROM grams),
keep AS (SELECT g FROM ug GROUP BY g HAVING COUNT(*) <= {max_df}),
u2 AS MATERIALIZED (SELECT source, g FROM ug JOIN keep USING (g)),
nsrc AS (SELECT source, COUNT(*) AS nd FROM u2 GROUP BY source),
p AS (
  SELECT a.source AS source_a, b.source AS source_b, CAST(COUNT(*) AS BIGINT) AS shared
  FROM u2 a JOIN u2 b ON a.g = b.g AND a.source < b.source
  GROUP BY 1, 2)
SELECT source_a, source_b, shared,
       ROUND(CAST(shared AS DOUBLE) / (na.nd + nb.nd - shared), 6) AS jaccard
FROM p JOIN nsrc na ON na.source = p.source_a JOIN nsrc nb ON nb.source = p.source_b
WHERE shared >= {min_shared}
ORDER BY source_a, source_b"""


def top_unshipped_sql(k: int = 10, cutoff: str = "1998-07-01") -> str:
    """Mirror of queries.q_top_unshipped (TPC-H Q3 shape; integer
    micro-units, (revenue desc, orderkey) tie order)."""
    return f"""WITH l AS (
  SELECT l_orderkey,
         CAST(FLOOR(l_extendedprice * (1 - l_discount) * 1000000 + 0.5) AS BIGINT) AS rev_u
  FROM lineitem WHERE l_shipdate > TIMESTAMP '{cutoff}'),
o AS (
  SELECT o_orderkey, epoch_us(o_orderdate) AS o_date_u, o_orderpriority
  FROM orders
  SEMI JOIN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING') c
    ON c.c_custkey = orders.o_custkey
  WHERE o_orderdate < TIMESTAMP '{cutoff}')
SELECT l.l_orderkey, CAST(SUM(l.rev_u) AS BIGINT) AS revenue_u,
       o.o_date_u, o.o_orderpriority
FROM l JOIN o ON l.l_orderkey = o.o_orderkey
GROUP BY 1, 3, 4
ORDER BY revenue_u DESC, l_orderkey
LIMIT {k}"""


def forecast_revenue_sql(year: int = 1997) -> str:
    """Mirror of queries.q_forecast_revenue (TPC-H Q6 shape; the same
    per-row double product, floor-quantized before summation)."""
    return f"""SELECT
  CAST(COALESCE(SUM(CAST(FLOOR(l_extendedprice * l_discount * 1000000 + 0.5) AS BIGINT)), 0) AS BIGINT) AS revenue_u,
  CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '{year}-01-01'
  AND l_shipdate < TIMESTAMP '{year + 1}-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24"""


def customers_no_orders_sql() -> str:
    """Mirror of queries.q_customers_no_orders (anti-join against
    completed orders)."""
    return """SELECT c_custkey, c_acctbal, c_mktsegment
FROM customer c
ANTI JOIN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F') o
  ON o.o_custkey = c.c_custkey
ORDER BY c_custkey"""


def cust_status_rollup_sql() -> str:
    """Mirror of queries.q_cust_status_rollup (FULL OUTER join of the
    per-custkey 'F' vs 'O' order rollups; totals are exact int64
    micro-units divided once by 1e6 — the identical IEEE division)."""
    return """WITH f AS (
  SELECT o_custkey AS custkey, COUNT(*) AS f_orders,
         SUM(CAST(FLOOR(o_totalprice * 1e6 + 0.5) AS BIGINT)) AS f_total_u
  FROM orders WHERE o_orderstatus = 'F' GROUP BY 1),
o AS (
  SELECT o_custkey AS custkey, COUNT(*) AS o_orders,
         SUM(CAST(FLOOR(o_totalprice * 1e6 + 0.5) AS BIGINT)) AS o_total_u
  FROM orders WHERE o_orderstatus = 'O' GROUP BY 1)
SELECT COALESCE(f.custkey, o.custkey) AS custkey,
       COALESCE(f.f_orders, 0) AS f_orders,
       CAST(COALESCE(f.f_total_u, 0) AS DOUBLE) / 1e6 AS f_total,
       COALESCE(o.o_orders, 0) AS o_orders,
       CAST(COALESCE(o.o_total_u, 0) AS DOUBLE) / 1e6 AS o_total
FROM f FULL OUTER JOIN o ON f.custkey = o.custkey
ORDER BY custkey"""


def pricing_summary_sql() -> str:
    """Mirror of queries.q_pricing_summary (TPC-H Q1 shape).  Every
    per-row measure is the identical left-associative IEEE expression
    floor-quantized to int64 micro-units; averages are the identical
    CAST/1e6/count two-division formula — bit-exact, no tolerance."""
    return """SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(FLOOR(l_quantity * 1e6 + 0.5) AS BIGINT)) AS DOUBLE) / 1e6 AS sum_qty,
       CAST(SUM(CAST(FLOOR(l_extendedprice * 1e6 + 0.5) AS BIGINT)) AS DOUBLE) / 1e6 AS sum_base_price,
       CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 1e6 + 0.5) AS BIGINT)) AS DOUBLE) / 1e6 AS sum_disc_price,
       CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 1e6 + 0.5) AS BIGINT)) AS DOUBLE) / 1e6 AS sum_charge,
       CAST(SUM(CAST(FLOOR(l_quantity * 1e6 + 0.5) AS BIGINT)) AS DOUBLE) / 1e6 / COUNT(*) AS avg_qty,
       CAST(SUM(CAST(FLOOR(l_extendedprice * 1e6 + 0.5) AS BIGINT)) AS DOUBLE) / 1e6 / COUNT(*) AS avg_price,
       CAST(SUM(CAST(FLOOR(l_discount * 1e6 + 0.5) AS BIGINT)) AS DOUBLE) / 1e6 / COUNT(*) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate < TIMESTAMP '2000-01-01'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus"""


def embedding_pca_sql(
    out_dim: int = 8, iters: int = 96, dim: int = 64, scale: int = 1 << 16,
) -> str:
    """Mirror of data_ops.ann.embedding_pca_exact: the integer Gram
    matrix (embedding_gram_sql CTEs), one truncation-normalization
    (DuckDB ``//`` truncates — the engine's _tdiv mirrors it), then
    per component a RECURSIVE fixed-count power iteration whose every
    step is an exact HUGEINT matvec + the deterministic float
    renormalization ``floor(CAST(y AS DOUBLE)/sqrt(CAST(nsq AS
    DOUBLE))·scale + ½)``, sign canonicalization, Rayleigh deflation
    in truncated integer arithmetic, and the integer-exact projection
    ``ROUND((n·(q·v) − s·v)/(n·scale²), 6)``."""
    fs = float(scale)
    sc2 = scale * scale
    base = f"""x AS (
  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS dim,
         CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * {fs} + 0.5) AS BIGINT) AS q
  FROM embeddings),
s AS MATERIALIZED (SELECT dim, CAST(SUM(q) AS BIGINT) AS sq FROM x GROUP BY dim),
nr AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM embeddings),
gg AS MATERIALIZED (
  SELECT a.dim AS i, b.dim AS j, CAST(SUM(a.q * b.q) AS BIGINT) AS gram
  FROM x a JOIN x b ON a.vec_id = b.vec_id AND a.dim <= b.dim
  GROUP BY 1, 2),
gf AS (
  SELECT i, j, gram FROM gg
  UNION ALL
  SELECT j, i, gram FROM gg WHERE i <> j),
mf AS MATERIALIZED (
  SELECT gf.i, gf.j,
         CAST(nr.n AS HUGEINT) * gf.gram - CAST(si.sq AS HUGEINT) * sj.sq AS val
  FROM gf, nr
  JOIN s si ON si.dim = gf.i
  JOIN s sj ON sj.dim = gf.j),
dn AS (SELECT GREATEST(CAST(1 AS HUGEINT), MAX(ABS(val)) // {1 << 36}) AS dv FROM mf),
mt0 AS MATERIALIZED (SELECT i, j, val // dn.dv AS val FROM mf, dn),
qv AS MATERIALIZED (
  SELECT vec_id,
         list_transform(embedding, e -> CAST(floor(CAST(e AS DOUBLE)*{fs} + 0.5) AS BIGINT)) AS q
  FROM embeddings)"""
    parts = [base]
    for c in range(out_dim):
        parts.append(f"""mat{c} AS MATERIALIZED (
  SELECT list(rowl ORDER BY i) AS M
  FROM (SELECT i, list(val ORDER BY j) AS rowl FROM mt{c} GROUP BY i)),
it{c} AS (
  SELECT 0 AS step,
         list_transform(range({dim}), i -> CAST((i*2654435761 + {c * 40503}) % 997 + 1 AS HUGEINT)) AS xv,
         (SELECT M FROM mat{c}) AS M
  UNION ALL
  SELECT step + 1,
         CASE WHEN nsq = 0 THEN xv
              ELSE list_transform(y, e -> CAST(floor(CAST(e AS DOUBLE)/sqrt(CAST(nsq AS DOUBLE))*{fs} + 0.5) AS HUGEINT)) END,
         M
  FROM (SELECT step, xv, M, y, list_sum(list_transform(y, e -> e*e)) AS nsq
        FROM (SELECT step, xv, M,
                     list_transform(M, row -> list_sum(list_transform(list_zip(row, xv), p -> p[1]*p[2]))) AS y
              FROM it{c} WHERE step < {iters}))),
v{c} AS MATERIALIZED (
  SELECT list_transform(xv, e -> e * sgn) AS v
  FROM (SELECT xv,
               CASE WHEN xv[list_position(list_transform(xv, e -> abs(e)),
                                          list_max(list_transform(xv, e -> abs(e))))] < 0
                    THEN -1 ELSE 1 END AS sgn
        FROM it{c} WHERE step = {iters})),
vt{c} AS (SELECT unnest(range({dim})) AS i, unnest(v) AS vi FROM v{c}),
lam{c} AS MATERIALIZED (
  SELECT list_sum(list_transform(list_zip(v, mv), p -> p[1]*p[2])) AS num,
         list_sum(list_transform(v, e -> e*e)) AS den
  FROM (SELECT v,
               list_transform((SELECT M FROM mat{c}), row -> list_sum(list_transform(list_zip(row, v), p -> p[1]*p[2]))) AS mv
        FROM v{c})),
mt{c + 1} AS MATERIALIZED (
  SELECT m.i, m.j,
         CASE WHEN l.den = 0 THEN m.val
              ELSE m.val - ((l.num // l.den) * a.vi * b.vi) // l.den END AS val
  FROM mt{c} m
  JOIN vt{c} a ON a.i = m.i
  JOIN vt{c} b ON b.i = m.j
  CROSS JOIN lam{c} l)""")
    pcs = ",\n       ".join(
        f"""ROUND(CAST(CAST(nr.n AS HUGEINT) * list_sum(list_transform(list_zip(qv.q, (SELECT v FROM v{c})), p -> p[1]*p[2]))
              - (SELECT list_sum(list_transform(list_zip((SELECT list(CAST(sq AS HUGEINT) ORDER BY dim) FROM s), v), p -> p[1]*p[2])) FROM v{c}) AS DOUBLE)
          / CAST(nr.n * {sc2} AS DOUBLE), 6) AS pc{c}"""
        for c in range(out_dim)
    )
    parts.append(f"""final AS (
  SELECT qv.vec_id,
       {pcs}
  FROM qv, nr)
SELECT * FROM final""")
    return "WITH RECURSIVE " + ",\n".join(parts)


def embedding_gram_sql(scale: int = 1 << 16) -> str:
    """Mirror of queries.q_embedding_gram: quantize each embedding
    value to ⌊v·scale + ½⌋ (float32→double is exact, ·2^16 shifts the
    exponent only, so the quantization is bit-identical to numpy),
    then exact integer Gram/sum/count aggregates per dimension pair."""
    return f"""WITH x AS (
  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS dim,
         CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * {scale} + 0.5) AS BIGINT) AS q
  FROM embeddings),
s AS (SELECT dim, SUM(q) AS sq FROM x GROUP BY dim),
n AS (SELECT COUNT(*) AS n FROM embeddings),
g AS (
  SELECT a.dim AS dim_i, b.dim AS dim_j, SUM(a.q * b.q) AS gram
  FROM x a JOIN x b ON a.vec_id = b.vec_id AND a.dim <= b.dim
  GROUP BY 1, 2)
SELECT g.dim_i, g.dim_j, CAST(n.n AS BIGINT) AS n,
       CAST(si.sq AS BIGINT) AS sum_i, CAST(sj.sq AS BIGINT) AS sum_j,
       CAST(g.gram AS BIGINT) AS gram,
       ROUND((CAST(g.gram AS DOUBLE) - CAST(si.sq AS DOUBLE) * CAST(sj.sq AS DOUBLE) / n.n) / n.n, 6) AS cov
FROM g, n
JOIN s si ON si.dim = g.dim_i
JOIN s sj ON sj.dim = g.dim_j
ORDER BY dim_i, dim_j"""


def events_robust_anomaly_sql(threshold: float = 3.5) -> str:
    """Mirror of data_ops.text.robust_group_anomaly over events:
    per-type median and MAD as quantile_disc order statistics, the
    modified z (v − med)/(1.4826·MAD) rounded 1e-6, MAD=0 groups
    excluded."""
    return f"""WITH med AS MATERIALIZED (
  SELECT event_type, quantile_disc(value, 0.5) AS med FROM events GROUP BY 1),
mad AS MATERIALIZED (
  SELECT e.event_type, quantile_disc(abs(e.value - m.med), 0.5) AS mad
  FROM events e JOIN med m USING (event_type) GROUP BY 1)
SELECT e.event_id, e.event_type, e.value,
       ROUND((e.value - m.med) / (1.4826 * d.mad), 6) AS robust_z,
       abs(ROUND((e.value - m.med) / (1.4826 * d.mad), 6)) > {threshold} AS is_outlier
FROM events e
JOIN med m USING (event_type)
JOIN mad d USING (event_type)
WHERE d.mad > 0"""


def events_type_quantiles_sql(qs=(0.5, 0.9, 0.99)) -> str:
    """Mirror of queries.q_events_type_quantiles (quantile_disc =
    element at 1-based ceil(q·n) of the sorted group)."""
    qlist = ", ".join(str(q) for q in qs)
    vlist = ", ".join(f"quantile_disc(value, {q})" for q in qs)
    return f"""SELECT event_type, unnest([{qlist}]) AS q, unnest([{vlist}]) AS value
FROM events GROUP BY event_type ORDER BY event_type, q"""
