"""Graph + raw-SQL suite (q91–q93): fixed-iteration PageRank over the
part co-occurrence graph, and two queries submitted as RAW SQL text
through spark.sql() — exercising the engine's SQL entry point (the
reference is SQL-string-driven throughout; everything else in this
repo uses the DataFrame API, so these pin the other door).

The PageRank oracle replays all three iterations as unrolled CTEs
with the same decimal-summed contributions — see operators/graph.py
for why that is bit-stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from industrial_data_pipeline_spark.operators.graph import pagerank
from industrial_data_pipeline_spark.suite_common import load

MIN_COOC = 3
PR_ITERS = 3
PR_DAMPING = 0.85


# ---------------------------------------------------- q91 PageRank

def _cooc_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    bi = load(spark, sf_dir, "lineitem") \
        .select(F.col("l_orderkey").alias("b"),
                F.col("l_partkey").alias("i")).distinct()
    l, r = bi.alias("l"), bi.alias("r")
    return (l.join(r, (F.col("l.b") == F.col("r.b"))
                   & (F.col("l.i") < F.col("r.i")))
            .groupBy(F.col("l.i").alias("src"),
                     F.col("r.i").alias("dst"))
            .agg(F.count("*").alias("c"))
            .where(F.col("c") >= MIN_COOC)
            .select("src", "dst"))


def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-iteration PageRank on parts co-bought ≥3 times; full rank
    vector (rounded) — the driver compares it order-insensitively."""
    pr = pagerank(_cooc_edges(spark, sf_dir), iters=PR_ITERS,
                  damping=PR_DAMPING)
    return pr.select("node", F.round("rank", 6).alias("rank"))


def _pr_iter_sql(prev: str, cur: str) -> str:
    return f"""
{cur} AS (
  SELECT nodes.node,
         0.15 / n + 0.85 * coalesce(t.insum, CAST(0 AS DOUBLE)) AS rank
  FROM nodes CROSS JOIN nn
  LEFT JOIN (SELECT d,
                    CAST(sum(CAST(c AS DECIMAL(28,15))) AS DOUBLE)
                        AS insum
             FROM (SELECT e.d, {prev}.rank / deg.deg AS c
                   FROM e JOIN {prev} ON {prev}.node = e.s
                          JOIN deg ON deg.s = e.s)
             GROUP BY d) t ON t.d = nodes.node)"""


ORACLE_PAGERANK = f"""
WITH bi AS (SELECT DISTINCT l_orderkey AS b, l_partkey AS i
            FROM lineitem),
p AS (SELECT l.i AS a, r.i AS z FROM bi l
      JOIN bi r ON l.b = r.b AND l.i < r.i
      GROUP BY 1, 2 HAVING count(*) >= {MIN_COOC}),
e AS (SELECT a AS s, z AS d FROM p UNION SELECT z, a FROM p),
nodes AS (SELECT DISTINCT s AS node FROM e),
nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
deg AS (SELECT s, count(*) AS deg FROM e GROUP BY 1),
r0 AS (SELECT node, 1.0 / n AS rank FROM nodes CROSS JOIN nn),
{_pr_iter_sql('r0', 'r1')},
{_pr_iter_sql('r1', 'r2')},
{_pr_iter_sql('r2', 'r3')}
SELECT node, round(rank, 6) AS rank FROM r3
"""


# ------------------------------------------- q92 raw-SQL revenue (Q6)

_SQL_REVENUE = """
SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                     * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE),
             6) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


def q_sql_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape submitted as RAW SQL — identical text runs on
    both engines (ANSI subset). Catalyst still pushes the three
    filters into the scan; asserted in test_plans."""
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(_SQL_REVENUE)


# ---------------------------------------------- q93 raw-SQL CUBE

_SQL_CUBE = """
SELECT l_returnflag, l_linestatus, count(*) AS n,
       round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 6)
           AS sum_qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""


def q_sql_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets as raw SQL (q56 covers ROLLUP via the
    DataFrame API; this pins the SQL spelling and the missing
    (·, linestatus) slices)."""
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(_SQL_CUBE)


# ----------------------------------------- q160 triangle enumeration

TRI_MIN_COOC = 2  # >= 3 leaves a triangle-free graph at gate scale


def q_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact triangles in the parts-co-bought-twice graph via
    degree-ordered orientation (operators/graph.py::triangles) — the
    clustering-structure statistic next to q91's centrality. The
    oracle is the naive a<b<c three-way join: same set, quadratic
    wedge cost the oriented plan avoids on skewed graphs. Threshold 2
    (not q91's 3): the >=3 graph is triangle-free at the gate scale,
    which would make the check vacuous."""
    from industrial_data_pipeline_spark.operators.graph import triangles
    bi = load(spark, sf_dir, "lineitem") \
        .select(F.col("l_orderkey").alias("b"),
                F.col("l_partkey").alias("i")).distinct()
    l, r = bi.alias("l"), bi.alias("r")
    edges = (l.join(r, (F.col("l.b") == F.col("r.b"))
                    & (F.col("l.i") < F.col("r.i")))
             .groupBy(F.col("l.i").alias("src"),
                      F.col("r.i").alias("dst"))
             .agg(F.count("*").alias("c"))
             .where(F.col("c") >= TRI_MIN_COOC)
             .select("src", "dst"))
    return triangles(edges)


ORACLE_TRIANGLES = f"""
WITH bi AS (SELECT DISTINCT l_orderkey AS b, l_partkey AS i
            FROM lineitem),
p AS (SELECT l.i AS a, r.i AS z FROM bi l
      JOIN bi r ON l.b = r.b AND l.i < r.i
      GROUP BY 1, 2 HAVING count(*) >= {TRI_MIN_COOC})
SELECT p1.a AS a, p1.z AS b, p2.z AS c
FROM p p1 JOIN p p2 ON p2.a = p1.z
          JOIN p p3 ON p3.a = p1.a AND p3.z = p2.z
"""


REGISTRY_GRAPH: dict[str, tuple] = {
    "q91_pagerank": (q_pagerank, ORACLE_PAGERANK),
    "q92_sql_revenue": (q_sql_revenue, _SQL_REVENUE),
    "q93_sql_cube": (q_sql_cube, _SQL_CUBE),
    "q160_triangles": (q_triangles, ORACLE_TRIANGLES),
}


# ------------------------------ q187 personalized PageRank (seeded)

PPR_ITERS = 3


def q_personalized_pagerank(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    """Seeded (personalized) PageRank on the parts-co-bought-twice
    graph: teleport mass returns to the two lowest-id nodes instead
    of spreading uniformly — 'parts related to THESE parts', the
    recommendation primitive (operators/graph.py::
    personalized_pagerank). Seeds derive deterministically from the
    edge set; the oracle replays all three rounds as unrolled CTEs
    with repr-rendered float constants so the restart vector is the
    identical double on both engines."""
    from industrial_data_pipeline_spark.operators.graph import (
        personalized_pagerank)
    bi = load(spark, sf_dir, "lineitem") \
        .select(F.col("l_orderkey").alias("b"),
                F.col("l_partkey").alias("i")).distinct()
    l, r = bi.alias("l"), bi.alias("r")
    edges = (l.join(r, (F.col("l.b") == F.col("r.b"))
                    & (F.col("l.i") < F.col("r.i")))
             .groupBy(F.col("l.i").alias("src"),
                      F.col("r.i").alias("dst"))
             .agg(F.count("*").alias("c"))
             .where(F.col("c") >= TRI_MIN_COOC)
             .select("src", "dst"))
    seeds = [r[0] for r in
             (edges.select(F.col("src").alias("n"))
              .unionByName(edges.select(F.col("dst").alias("n")))
              .distinct().orderBy("n").limit(2).collect())]
    pr = personalized_pagerank(edges, seeds, iters=PPR_ITERS)
    return pr.select("node", F.round("rank", 6).alias("rank"))


def _ppr_iter_sql(prev: str, cur: str, restart: str) -> str:
    return f"""
{cur} AS (
  SELECT nodes.node,
         CASE WHEN nodes.node IN (SELECT node FROM seedset)
              THEN {restart} ELSE CAST(0 AS DOUBLE) END
           + 0.85 * coalesce(t.insum, CAST(0 AS DOUBLE)) AS rank
  FROM nodes
  LEFT JOIN (SELECT d,
                    CAST(sum(CAST(c AS DECIMAL(28,15))) AS DOUBLE)
                        AS insum
             FROM (SELECT e.d, {prev}.rank / deg.deg AS c
                   FROM e JOIN {prev} ON {prev}.node = e.s
                          JOIN deg ON deg.s = e.s)
             GROUP BY d) t ON t.d = nodes.node)"""


def _oracle_personalized_pagerank() -> str:
    restart = repr((1.0 - 0.85) / 2)
    init = repr(1.0 / 2)
    return f"""
WITH bi AS (SELECT DISTINCT l_orderkey AS b, l_partkey AS i
            FROM lineitem),
p AS (SELECT l.i AS a, r.i AS z FROM bi l
      JOIN bi r ON l.b = r.b AND l.i < r.i
      GROUP BY 1, 2 HAVING count(*) >= {TRI_MIN_COOC}),
e AS (SELECT a AS s, z AS d FROM p UNION SELECT z, a FROM p),
nodes AS (SELECT DISTINCT s AS node FROM e),
seedset AS (SELECT node FROM nodes ORDER BY node LIMIT 2),
deg AS (SELECT s, count(*) AS deg FROM e GROUP BY 1),
r0 AS (SELECT node,
              CASE WHEN node IN (SELECT node FROM seedset)
                   THEN {init} ELSE CAST(0 AS DOUBLE) END AS rank
       FROM nodes),
{_ppr_iter_sql('r0', 'r1', restart)},
{_ppr_iter_sql('r1', 'r2', restart)},
{_ppr_iter_sql('r2', 'r3', restart)}
SELECT node, round(rank, 6) AS rank FROM r3
"""


REGISTRY_GRAPH.update({
    "q187_personalized_pagerank": (q_personalized_pagerank,
                                   _oracle_personalized_pagerank()),
})
