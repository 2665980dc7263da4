"""OLAP batch 3 + streaming/scale additions (q94–q100): stream-static
dimension enrichment, Zipf-law slope fit, salted skew join, and the
remaining TPC-H shapes (Q2 min-cost supplier, Q11 important inventory,
Q15 top supplier, Q20 part-variety suppliers) adapted to the synthetic
columns.

Same determinism/scale discipline as batches 1–2 (suite_olap.py,
suite_olap2.py): dims broadcast, DECIMAL money, one double division
at the end, 6dp rounding on both engines. The Zipf fit sums
per-point ln() terms through DECIMAL so the OLS normal equations are
summation-order independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from industrial_data_pipeline_spark.operators.scale import salted_join
from industrial_data_pipeline_spark.operators.text import tokens
from industrial_data_pipeline_spark.suite_common import load

_dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
_one = lambda: F.lit(1).cast("decimal(18,2)")  # noqa: E731


# ------------------------------------------- q94 stream-static enrich

def q_stream_enriched_counts(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """Streaming events ⋈ static customer dim → hourly counts per
    market segment, through a real availableNow streaming run."""
    from industrial_data_pipeline_spark.streaming.queries import (
        enriched_counts_stream)
    return enriched_counts_stream(spark, sf_dir)


ORACLE_STREAM_ENRICHED = """
SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour_start,
       c_mktsegment AS segment, count(*) AS n
FROM events JOIN customer ON c_custkey = user_id
GROUP BY 1, 2
"""


# ------------------------------------------------- q95 Zipf slope

ZIPF_TOP = 1000


def q_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-law fit over the corpus: OLS slope/intercept of
    ln(freq) ~ ln(rank) for the top-1000 tokens. Token counting is
    one explode+groupBy; the fit is a single tiny aggregation with
    DECIMAL-summed normal equations."""
    tok = (load(spark, sf_dir, "documents")
           .select(F.explode(tokens(F.col("text"))).alias("t"))
           .groupBy("t").agg(F.count("*").alias("f")))
    # Top-k FIRST via distributed TakeOrderedAndProject — a global
    # row_number window over the full vocabulary would shuffle every
    # distinct token to one partition (billions of rows at 100×
    # corpus scale). Ranks for the surviving ≤ ZIPF_TOP rows come
    # from a single-partition sort + sequential id (one bounded
    # task; limit() alone doesn't guarantee order, the
    # sortWithinPartitions does), so the plan has NO WindowExec.
    top = (tok.orderBy(F.desc("f"), F.asc("t")).limit(ZIPF_TOP)
           .coalesce(1).sortWithinPartitions(F.desc("f"), F.asc("t"))
           .withColumn("r", (F.monotonically_increasing_id() + 1)
                       .cast("int")))
    x = F.log(F.col("r").cast("double"))
    y = F.log(F.col("f").cast("double"))
    d = lambda c: c.cast("decimal(28,15)")  # noqa: E731
    s = top.agg(F.count("*").alias("n"),
                F.sum(d(x)).cast("double").alias("sx"),
                F.sum(d(y)).cast("double").alias("sy"),
                F.sum(d(x * x)).cast("double").alias("sxx"),
                F.sum(d(x * y)).cast("double").alias("sxy"))
    n = F.col("n").cast("double")
    slope = ((n * F.col("sxy") - F.col("sx") * F.col("sy"))
             / (n * F.col("sxx") - F.col("sx") * F.col("sx")))
    return s.select(
        F.col("n").alias("n_tokens"),
        F.round(slope, 6).alias("slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / n, 6)
        .alias("intercept"))


_TOKS_SQL = ("list_filter(string_split_regex(trim(text), '\\s+'),"
             " x -> x <> '')")  # == tokens(): no phantom '' token

ORACLE_ZIPF_SLOPE = f"""
WITH tok AS (SELECT unnest({_TOKS_SQL}) AS t FROM documents),
fr AS (SELECT t, count(*) AS f FROM tok GROUP BY 1),
top AS (SELECT f, row_number() OVER (ORDER BY f DESC, t ASC) AS r
        FROM fr QUALIFY r <= {ZIPF_TOP}),
s AS (SELECT count(*) AS n,
             CAST(sum(CAST(ln(CAST(r AS DOUBLE)) AS DECIMAL(28,15)))
                  AS DOUBLE) AS sx,
             CAST(sum(CAST(ln(CAST(f AS DOUBLE)) AS DECIMAL(28,15)))
                  AS DOUBLE) AS sy,
             CAST(sum(CAST(ln(CAST(r AS DOUBLE))
                           * ln(CAST(r AS DOUBLE))
                      AS DECIMAL(28,15))) AS DOUBLE) AS sxx,
             CAST(sum(CAST(ln(CAST(r AS DOUBLE))
                           * ln(CAST(f AS DOUBLE))
                      AS DECIMAL(28,15))) AS DOUBLE) AS sxy
      FROM top)
SELECT n AS n_tokens,
       round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
       round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx)
             / n, 6) AS intercept
FROM s
"""


# ------------------------------------------------ q96 salted join

def q_salted_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue per order priority through the salted skew join —
    result must equal the plain join (the oracle IS the plain join)."""
    li = load(spark, sf_dir, "lineitem") \
        .select("l_orderkey", "l_extendedprice", "l_discount")
    orders = load(spark, sf_dir, "orders") \
        .select(F.col("o_orderkey").alias("l_orderkey"),
                "o_orderpriority")
    joined = salted_join(li, orders, "l_orderkey", salt=8)
    return (joined.groupBy("o_orderpriority")
            .agg(F.sum(_dec("l_extendedprice")
                       * (_one() - _dec("l_discount")))
                 .cast("double").alias("revenue")))


ORACLE_SALTED_JOIN = """
SELECT o_orderpriority,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,2))
                   - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
           AS revenue
FROM lineitem JOIN orders ON o_orderkey = l_orderkey
GROUP BY 1
"""


# ------------------------------------------- q97 min-cost supplier

def q_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (partsupp stood in by observed lineitem pairs):
    for each Brand#5 part, the shipped-from supplier with the lowest
    account balance (suppkey tiebreak). Pairs dedup first; the window
    runs on the partkey shuffle."""
    part = load(spark, sf_dir, "part") \
        .where(F.col("p_brand") == "Brand#5").select("p_partkey")
    pairs = load(spark, sf_dir, "lineitem") \
        .select("l_partkey", "l_suppkey").distinct()
    supp = load(spark, sf_dir, "supplier") \
        .select("s_suppkey", "s_name", "s_acctbal")
    w = Window.partitionBy("l_partkey") \
        .orderBy(F.asc("s_acctbal"), F.asc("s_suppkey"))
    return (pairs.join(F.broadcast(part),
                       pairs.l_partkey == part.p_partkey)
            .join(F.broadcast(supp), pairs.l_suppkey == supp.s_suppkey)
            .withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .select("p_partkey", "s_name", "s_acctbal"))


ORACLE_MIN_COST_SUPPLIER = """
SELECT p_partkey, s_name, s_acctbal
FROM (SELECT p_partkey, s_name, s_acctbal,
             row_number() OVER (PARTITION BY l_partkey
                                ORDER BY s_acctbal ASC, s_suppkey ASC)
                 AS rn
      FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) pairs
      JOIN part ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      WHERE p_brand = 'Brand#5')
WHERE rn = 1
"""


# --------------------------------------- q98 important inventory

IMPORTANT_NUM, IMPORTANT_DEN = 5, 4  # parts > 1.25× mean value

def q_important_inventory(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-part shipped value (qty · retailprice in
    exact DECIMAL), keep parts above 1.25× the MEAN part value (scale-
    free, unlike Q11's fixed fraction). The threshold compare stays in
    DECIMAL (4·value·n_parts > 5·total, integer factors) — exact on
    both engines — and
    converts to double only for display."""
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_quantity")
    part = load(spark, sf_dir, "part") \
        .select("p_partkey", "p_retailprice")
    val = (li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
           .groupBy("p_partkey")
           .agg(F.sum(F.col("l_quantity").cast("decimal(9,2)")
                      * F.col("p_retailprice").cast("decimal(9,2)"))
                .alias("_v")))
    total = val.agg(F.sum("_v").alias("_t"),
                    F.count("*").alias("_n"))
    return (val.crossJoin(F.broadcast(total))
            .where(F.col("_v") * F.col("_n") * IMPORTANT_DEN
                   > F.col("_t") * IMPORTANT_NUM)
            .select("p_partkey",
                    F.round(F.col("_v").cast("double"), 6)
                    .alias("part_value")))


ORACLE_IMPORTANT_INVENTORY = f"""
WITH v AS (SELECT p_partkey,
                  sum(CAST(l_quantity AS DECIMAL(9,2))
                      * CAST(p_retailprice AS DECIMAL(9,2))) AS val
           FROM lineitem JOIN part ON p_partkey = l_partkey
           GROUP BY 1),
t AS (SELECT sum(val) AS total, count(*) AS n FROM v)
SELECT p_partkey, round(CAST(val AS DOUBLE), 6) AS part_value
FROM v CROSS JOIN t
WHERE val * n * {IMPORTANT_DEN} > total * {IMPORTANT_NUM}
"""


# ------------------------------------------------ q99 top supplier

def q_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) with the maximum 1997-Q1 revenue.
    The max rides a broadcast scalar; equality compares the EXACT
    DECIMAL revenue (double ties would be ambiguous)."""
    li = load(spark, sf_dir, "lineitem") \
        .where((F.col("l_shipdate") >= F.lit("1997-01-01"))
               & (F.col("l_shipdate") < F.lit("1997-04-01"))) \
        .select("l_suppkey", "l_extendedprice", "l_discount")
    rev = (li.groupBy("l_suppkey")
           .agg(F.sum(_dec("l_extendedprice")
                      * (_one() - _dec("l_discount"))).alias("_r")))
    mx = rev.agg(F.max("_r").alias("_mx"))
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (rev.crossJoin(F.broadcast(mx))
            .where(F.col("_r") == F.col("_mx"))
            .join(F.broadcast(supp), rev.l_suppkey == supp.s_suppkey)
            .select("s_suppkey", "s_name",
                    F.round(F.col("_r").cast("double"), 6)
                    .alias("total_rev")))


ORACLE_TOP_SUPPLIER = """
WITH rev AS (SELECT l_suppkey,
                    sum(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (CAST(1 AS DECIMAL(18,2))
                           - CAST(l_discount AS DECIMAL(18,2)))) AS r
             FROM lineitem
             WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
               AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
             GROUP BY 1)
SELECT s_suppkey, s_name, round(CAST(r AS DOUBLE), 6) AS total_rev
FROM rev JOIN supplier ON s_suppkey = l_suppkey
WHERE r = (SELECT max(r) FROM rev)
"""


# -------------------------------------- q100 part-variety suppliers

MIN_PROMO_PARTS = 5

def q_variety_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers who shipped ≥5 distinct PROMO parts
    during 1997 — distinct pairs first (combinable), then one count
    per supplier, names broadcast in."""
    part = load(spark, sf_dir, "part") \
        .where(F.col("p_type") == "PROMO").select("p_partkey")
    pairs = (load(spark, sf_dir, "lineitem")
             .where((F.col("l_shipdate") >= F.lit("1997-01-01"))
                    & (F.col("l_shipdate") < F.lit("1998-01-01")))
             .join(F.broadcast(part),
                   F.col("l_partkey") == F.col("p_partkey"))
             .select("l_suppkey", "l_partkey").distinct())
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (pairs.groupBy("l_suppkey")
            .agg(F.countDistinct("l_partkey").alias("n_promo_parts"))
            .where(F.col("n_promo_parts") >= MIN_PROMO_PARTS)
            .join(F.broadcast(supp),
                  F.col("l_suppkey") == F.col("s_suppkey"))
            .select("s_suppkey", "s_name", "n_promo_parts"))


ORACLE_VARIETY_SUPPLIERS = f"""
SELECT s_suppkey, s_name, n_promo_parts
FROM (SELECT l_suppkey, count(DISTINCT l_partkey) AS n_promo_parts
      FROM (SELECT DISTINCT l_suppkey, l_partkey
            FROM lineitem JOIN part ON p_partkey = l_partkey
            WHERE p_type = 'PROMO'
              AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
              AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00')
      GROUP BY 1)
JOIN supplier ON s_suppkey = l_suppkey
WHERE n_promo_parts >= {MIN_PROMO_PARTS}
"""


# ------------------------------------------ q201 shipmode priority
# TPC-H Q12 shape — the last of the 22 classic shapes this engine
# lacked. The synthetic lineitem ships no shipmode/commitdate
# columns (see suite_olap2 module doc), so mode is derived
# deterministically from l_partkey and "late" from a 45-day
# ship-after-order threshold. Scale shape: the fact is date-filtered
# BEFORE the orderkey shuffle join (predicate reaches the scan), the
# late filter then prunes again before the 3-row aggregation.

_SHIPMODES = ["AIR", "RAIL", "SHIP"]


def q_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12: for each derived ship mode, how many LATE lines belong to
    high-priority orders vs the rest — the shipping-SLA question."""
    li = (load(spark, sf_dir, "lineitem")
          .where((F.col("l_shipdate") >= "1997-01-01")
                 & (F.col("l_shipdate") < "1998-01-01"))
          .select("l_orderkey", "l_partkey", "l_shipdate"))
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority")
    mode = F.element_at(
        F.array(*[F.lit(m) for m in _SHIPMODES]),
        (F.pmod(F.col("l_partkey"), F.lit(3)) + 1).cast("int"))
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (li.join(o, li.l_orderkey == o.o_orderkey)
            .where(F.col("l_shipdate")
                   > F.col("o_orderdate") + F.expr("INTERVAL 45 DAYS"))
            .select(mode.alias("shipmode"), high.alias("_hi"))
            .groupBy("shipmode")
            .agg(F.count(F.when(F.col("_hi"), 1))
                 .alias("high_line_count"),
                 F.count(F.when(~F.col("_hi"), 1))
                 .alias("low_line_count")))


ORACLE_SHIPMODE_PRIORITY = """
SELECT CASE l_partkey % 3 WHEN 0 THEN 'AIR' WHEN 1 THEN 'RAIL'
            ELSE 'SHIP' END AS shipmode,
       count(*) FILTER (WHERE o_orderpriority IN ('1-URGENT',
                                                  '2-HIGH'))
           AS high_line_count,
       count(*) FILTER (WHERE o_orderpriority NOT IN ('1-URGENT',
                                                      '2-HIGH'))
           AS low_line_count
FROM lineitem JOIN orders ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND l_shipdate > o_orderdate + INTERVAL 45 DAY
GROUP BY 1
"""


REGISTRY_OLAP3: dict[str, tuple] = {
    "q94_stream_enriched_counts": (q_stream_enriched_counts,
                                   ORACLE_STREAM_ENRICHED),
    "q95_zipf_slope": (q_zipf_slope, ORACLE_ZIPF_SLOPE),
    "q96_salted_join_revenue": (q_salted_join_revenue,
                                ORACLE_SALTED_JOIN),
    "q97_min_cost_supplier": (q_min_cost_supplier,
                              ORACLE_MIN_COST_SUPPLIER),
    "q98_important_inventory": (q_important_inventory,
                                ORACLE_IMPORTANT_INVENTORY),
    "q99_top_supplier": (q_top_supplier, ORACLE_TOP_SUPPLIER),
    "q100_variety_suppliers": (q_variety_suppliers,
                               ORACLE_VARIETY_SUPPLIERS),
    "q201_shipmode_priority": (q_shipmode_priority,
                               ORACLE_SHIPMODE_PRIORITY),
}


# ----------------------------- q220 weighted median (by quantity)

def q_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-weighted median price per return flag — the 'half the
    QUANTITY traded below this price' statistic, which an unweighted
    median misrepresents whenever cheap lines carry big volumes.

    Scale shape (VERDICT r4 item 4): the naive plan windows the FULL
    fact on 3 group keys — 3 reducers sort ~everything. Here the
    median is found by two-level integer prefix sums with NO
    fact-wide sort:
    1. map-side-combinable groupBy into (flag, whole-dollar bucket)
       partial weights — output is dimension-sized (#dollars), so
       its cumulative window is cheap and partitioned;
    2. integer threshold arithmetic (2·cum ≥ T crosses exactly once
       for positive weights) finds each flag's crossing BUCKET and
       the weight offset below it (broadcast, ≤ #flags rows);
    3. only the crossing bucket's rows (≤ one dollar of price space)
       are re-aggregated per EXACT price — ≤ 100 cent-values per
       flag — and the same threshold picks the median price.
    The crossing price is invariant to intra-price row order, so
    every shuffle is an aggregation and the result is engine-exact
    integer arithmetic end to end. Algorithm lives in
    operators/scale.py::weighted_median (shared with the adversarial
    property test, so the suite entry can't drift from what the test
    pins)."""
    from industrial_data_pipeline_spark.operators.scale import (
        weighted_median)
    li = load(spark, sf_dir, "lineitem")
    return (weighted_median(li, "l_returnflag", "l_extendedprice",
                            "l_quantity")
            .select("l_returnflag",
                    F.col("total_w").alias("total_qty"),
                    F.col("weighted_median")
                    .alias("weighted_median_price")))


ORACLE_WEIGHTED_MEDIAN = """
WITH li AS (SELECT l_returnflag,
                   CAST(l_quantity AS BIGINT) AS w,
                   l_extendedprice, l_orderkey, l_linenumber
            FROM lineitem),
r AS (SELECT l_returnflag, w, l_extendedprice,
             sum(w) OVER (PARTITION BY l_returnflag
                          ORDER BY l_extendedprice, l_orderkey,
                                   l_linenumber
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS cumw
      FROM li),
t AS (SELECT l_returnflag, sum(w) AS T FROM li GROUP BY 1)
SELECT r.l_returnflag, CAST(t.T AS BIGINT) AS total_qty,
       r.l_extendedprice AS weighted_median_price
FROM r JOIN t USING (l_returnflag)
WHERE 2 * r.cumw >= t.T AND 2 * (r.cumw - r.w) < t.T
"""

REGISTRY_OLAP3.update({
    "q220_weighted_median": (q_weighted_median,
                             ORACLE_WEIGHTED_MEDIAN),
})


# ------------------------------ q221 equi-depth price histogram

EQD_BUCKETS = 8


def q_equidepth_histogram(spark: SparkSession,
                          sf_dir: str) -> DataFrame:
    """Equi-DEPTH price histogram: bucket boundaries at the exact
    k/8 quantiles of o_totalprice, then per-bucket count + min/max —
    the optimizer-statistics shape (equi-width q88 starves on skewed
    money columns; equi-depth puts equal weight in every bucket).
    Boundaries come from one exact percentile aggregate (a single
    ≤7-value array broadcast into the bucketing expression), counts
    from one combinable groupBy — no sort, no window, no second
    scan of the fact at shuffle width.

    100-TB bound: Spark's exact Percentile aggregates into a
    value→count map, so reduce-side state is #DISTINCT prices — the
    cent-valued o_totalprice domain (≤ ~6e7 entries), independent of
    row count, with map-side partial aggregation compressing each
    partition first. The plan carries no Sort and no Window
    (asserted in tests/test_plans.py); the single-partition final
    step reduces pre-combined maps, not rows."""
    o = load(spark, sf_dir, "orders").select("o_totalprice")
    qs = [i / EQD_BUCKETS for i in range(1, EQD_BUCKETS)]
    bounds = o.agg(F.percentile("o_totalprice", qs).alias("b"))
    bucket = F.lit(1)
    for i in range(EQD_BUCKETS - 1):
        bucket = bucket + (F.col("o_totalprice")
                           > F.element_at("b", i + 1)).cast("int")
    return (o.crossJoin(F.broadcast(bounds))
            .select(bucket.alias("bucket"), "o_totalprice")
            .groupBy("bucket")
            .agg(F.count("*").alias("n"),
                 F.min("o_totalprice").alias("lo"),
                 F.max("o_totalprice").alias("hi")))


def _oracle_equidepth() -> str:
    qs = ", ".join(str(i / EQD_BUCKETS)
                   for i in range(1, EQD_BUCKETS))
    inc = " + ".join(
        f"CASE WHEN o_totalprice > b[{i + 1}] THEN 1 ELSE 0 END"
        for i in range(EQD_BUCKETS - 1))
    return f"""
WITH bounds AS (SELECT quantile_cont(o_totalprice, [{qs}]) AS b
                FROM orders)
SELECT 1 + {inc} AS bucket, count(*) AS n,
       min(o_totalprice) AS lo, max(o_totalprice) AS hi
FROM orders, bounds
GROUP BY 1
"""

REGISTRY_OLAP3.update({
    "q221_equidepth_histogram": (q_equidepth_histogram,
                                 _oracle_equidepth()),
})
