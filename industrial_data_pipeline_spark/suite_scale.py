"""Driver-facing suite, part 6: scale-technique operators whose point
is the PHYSICAL plan — skew-tolerant salted aggregation, binned
interval (range) joins, exact distinct aggregation — plus the stateful
streaming sessionizer (applyInPandasWithState) checked against the
same oracle as batch sessionization (q43).

All results are exact: the techniques change shuffle shape, not
semantics, so every query here carries a plain-SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from industrial_data_pipeline_spark.suite_common import load
from industrial_data_pipeline_spark.suite_events import ORACLE_SESSIONIZE


# ---------------------------------------------- q63 salted aggregation
# event_type has 5 distinct values over the whole table — the textbook
# skewed-key aggregation. Two-stage (key × partition) partials keep
# every reducer busy; result identical to a plain GROUP BY.

def q_salted_skew_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from industrial_data_pipeline_spark.operators.scale import (
        salted_grouped_sum)
    ev = load(spark, sf_dir, "events").select("event_type", "value")
    return salted_grouped_sum(ev, ["event_type"], "value")


ORACLE_SALTED_SKEW_AGG = """
SELECT event_type, count(*) AS n,
       round(CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE), 6)
           AS sum_value,
       round(CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE)
             / count(*), 6) AS avg_value
FROM events GROUP BY event_type
"""


# ---------------------------------------------- q64 binned range join
# Containment join events.ts ∈ [window.start, window.end] — intervals
# derive deterministically from every 499th event (30-minute windows).
# The binned equi-join replaces the O(n·m) broadcast-nested-loop theta
# join Spark would otherwise pick; the exact filter restores precise
# containment after the coarse bin match.

def q_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from industrial_data_pipeline_spark.operators.scale import (
        interval_join_binned)
    ev = load(spark, sf_dir, "events").select("event_id", "ts", "value")
    windows = (ev.where(F.col("event_id") % 499 == 0)
               .select(F.col("event_id").alias("window_id"),
                       F.col("ts").alias("start"),
                       (F.col("ts") + F.expr("INTERVAL 30 MINUTES"))
                       .alias("end")))
    joined = interval_join_binned(ev, windows, ts_col="ts")
    return (joined.groupBy("window_id")
            .agg(F.count("*").alias("n_events"),
                 F.round(F.sum(F.col("value").cast("decimal(28,6)"))
                         .cast("double"), 6).alias("sum_value")))


ORACLE_INTERVAL_JOIN = """
WITH ev AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, value
            FROM events),
w AS (SELECT event_id AS window_id, ts AS s,
             ts + INTERVAL 30 MINUTE AS e
      FROM ev WHERE event_id % 499 = 0)
SELECT window_id, count(*) AS n_events,
       round(CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE), 6)
           AS sum_value
FROM ev JOIN w ON ev.ts >= w.s AND ev.ts <= w.e
GROUP BY window_id
"""


# ------------------------------------------- q65 exact distinct counts
# Distinct aggregation (absent from the reference, SURVEY.md §2.4):
# exact per-group count(DISTINCT user_id) — Spark expands to a two-
# phase plan (partial distinct per partition, then merge) on its own.

def q_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (ev.groupBy("event_type")
            .agg(F.countDistinct("user_id").alias("n_users"),
                 F.count("*").alias("n_events")))


ORACLE_DISTINCT_USERS = """
SELECT event_type, count(DISTINCT user_id) AS n_users,
       count(*) AS n_events
FROM events GROUP BY event_type
"""


# ------------------------------------------ q66 stateful stream session
# applyInPandasWithState sessionization — an actual stateful streaming
# execution whose bounded (availableNow, single-batch) output must
# equal batch sessionization, so q43's oracle applies verbatim.

def q_stream_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from industrial_data_pipeline_spark.streaming.queries import (
        sessionize_stream)
    return sessionize_stream(spark, sf_dir)


# ------------------------------------------ q125 bucketed co-located join
# The 100-TB answer to repeated fact⋈fact joins: both sides written
# bucketed (and sorted) by the join key, so the join needs NO exchange
# and NO sort — each task zips matching buckets. At scale this turns
# the nightly orders⋈lineitem reconciliation from the cluster's
# biggest shuffle into a scan. tests/test_plans.py asserts the
# exchange-free plan; the oracle proves bucketing changed the physical
# plan only, never the result.

_BUCKETS = 8


def bucketed_tables(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Write orders+lineitem as bucketed, bucket-sorted tables (once
    per session+sf; the in-memory catalog dies with the session, like
    any staging table)."""
    import os
    import shutil

    tag = sf_dir.strip("/").replace("/", "_").replace(".", "_")
    lt, ot = f"idp_li_bkt_{tag}", f"idp_ord_bkt_{tag}"
    # the in-memory catalog forgets tables between sessions but their
    # warehouse directories persist; clear orphaned locations so
    # saveAsTable doesn't fail with LOCATION_ALREADY_EXISTS
    wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse") \
        .removeprefix("file:")
    for t in (lt, ot):
        loc = os.path.join(wh, t)
        if not spark.catalog.tableExists(t) and os.path.exists(loc):
            shutil.rmtree(loc, ignore_errors=True)
    # coalesce(1): one writer task ⇒ exactly one file per bucket, so
    # the files' bucket-sort satisfies the SMJ's ordering requirement
    # outright. (A distributed bucketed write leaves several sorted
    # files per bucket; the join then pays a cheap within-bucket merge
    # sort but still no exchange.)
    if not spark.catalog.tableExists(lt):
        (load(spark, sf_dir, "lineitem")
         .select("l_orderkey", "l_extendedprice", "l_discount")
         .coalesce(1)
         .write.bucketBy(_BUCKETS, "l_orderkey").sortBy("l_orderkey")
         .mode("overwrite").saveAsTable(lt))
    if not spark.catalog.tableExists(ot):
        (load(spark, sf_dir, "orders")
         .select("o_orderkey", "o_orderpriority")
         .coalesce(1)
         .write.bucketBy(_BUCKETS, "o_orderkey").sortBy("o_orderkey")
         .mode("overwrite").saveAsTable(ot))
    return lt, ot


def q_bucketed_join_revenue(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    li_t, ord_t = bucketed_tables(spark, sf_dir)
    li = spark.table(li_t)
    orders = spark.table(ord_t)
    return (li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.round(F.sum(
                (F.col("l_extendedprice").cast("decimal(18,2)")
                 * (F.lit(1).cast("decimal(18,2)")
                    - F.col("l_discount").cast("decimal(18,2)")))
            ).cast("double"), 2).alias("revenue"),
                F.count("*").alias("n_items")))


ORACLE_BUCKETED_JOIN = """
SELECT o_orderpriority,
       round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (CAST(1 AS DECIMAL(18,2))
                         - CAST(l_discount AS DECIMAL(18,2))))
                  AS DOUBLE), 2) AS revenue,
       count(*) AS n_items
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
"""


# ----------------------------- q157 native session_window streaming
# The built-in session operator, same batch truth as q43/q66 modulo
# the documented half-open boundary (exact-gap splits, so the oracle
# replays >= where the gap-walk uses >).

def q_session_window_stream(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    from industrial_data_pipeline_spark.streaming.queries import (
        session_window_stream)
    # gap single-sourced from the oracle's constant so the two sides
    # can't drift apart
    return session_window_stream(spark, sf_dir,
                                 gap=f"{SESSION_GAP_S} seconds")


from industrial_data_pipeline_spark.suite_events import (  # noqa: E402
    _EV_SQL,
    SESSION_GAP_S,
)

ORACLE_SESSION_WINDOW = f"""
WITH {_EV_SQL},
s AS (SELECT user_id, event_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                          >= {SESSION_GAP_S * 1_000_000}
                  THEN 1 ELSE 0 END AS ns
      FROM ev
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
t AS (SELECT user_id, event_id, ts, value,
             sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) AS sid
      FROM s)
SELECT user_id,
       min(ts) AS session_start,
       max(ts) + INTERVAL {SESSION_GAP_S} SECOND AS session_end,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value
FROM t GROUP BY user_id, sid
"""


# --------------------------------- q158 stream-stream attribution join
# The remaining join class: both inputs unbounded, watermark+range
# bounded state (see streaming/queries.py::stream_stream_attribution).

def q_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from industrial_data_pipeline_spark.streaming.queries import (
        stream_stream_attribution)
    return stream_stream_attribution(spark, sf_dir)


ORACLE_STREAM_STREAM_JOIN = """
WITH ev AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id,
                   event_type FROM events),
v AS (SELECT event_id AS view_id, user_id, ts AS view_ts
      FROM ev WHERE event_type = 'view'),
p AS (SELECT event_id AS purchase_id, user_id, ts AS purchase_ts
      FROM ev WHERE event_type = 'purchase')
SELECT v.user_id, v.view_id, p.purchase_id,
       epoch_us(p.purchase_ts) - epoch_us(v.view_ts) AS lag_us
FROM v JOIN p ON p.user_id = v.user_id
             AND p.purchase_ts >= v.view_ts
             AND p.purchase_ts <= v.view_ts + INTERVAL 1 HOUR
"""


# --------------------------- q166 replayable Bloom semi-join funnel

def q_bloom_filter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime-filter pattern made explicit and AUDITABLE: a 4096-bit
    Bloom filter over BUILDING-segment customers, shipped as a
    literal long-array, prunes the orders scan with pure bit
    arithmetic before any join. Portable hashes ⇒ the oracle builds
    the SAME filter with the SAME false positives, so the funnel
    (rows → candidates → matches → false positives) hash-checks
    exactly (operators/scale.py::bloom_filter_join_stats)."""
    from industrial_data_pipeline_spark.operators.scale import (
        bloom_filter_join_stats)
    dim = (load(spark, sf_dir, "customer")
           .where(F.col("c_mktsegment") == "BUILDING")
           .select("c_custkey").distinct())
    fact = load(spark, sf_dir, "orders").select("o_custkey")
    return bloom_filter_join_stats(fact, dim, "o_custkey", "c_custkey")


def _oracle_bloom_filter_join() -> str:
    from industrial_data_pipeline_spark.suite_llm import _h64
    hp = _h64("k || ':bloom' || i")
    return f"""
WITH dim AS (SELECT DISTINCT c_custkey AS k FROM customer
             WHERE c_mktsegment = 'BUILDING'),
iii AS (SELECT unnest([0, 1, 2]) AS i),
bits AS (SELECT DISTINCT {hp} % 4096 AS p FROM dim CROSS JOIN iii),
f AS (SELECT o_custkey AS k FROM orders),
keys AS (SELECT DISTINCT k FROM f),
kp AS (SELECT k, i, {hp} % 4096 AS p FROM keys CROSS JOIN iii),
km AS (SELECT kp.k, count(*) = 3 AS m
       FROM kp JOIN bits USING (p) GROUP BY kp.k),
km2 AS (SELECT keys.k, coalesce(km.m, FALSE) AS m
        FROM keys LEFT JOIN km USING (k)),
dimk AS (SELECT k, TRUE AS hit FROM dim),
j AS (SELECT f.k, km2.m, dimk.hit
      FROM f JOIN km2 USING (k) LEFT JOIN dimk USING (k))
SELECT count(*) AS n_fact,
       CAST(sum(CASE WHEN m THEN 1 ELSE 0 END) AS BIGINT)
           AS n_candidates,
       CAST(sum(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT)
           AS n_matches,
       CAST(sum(CASE WHEN m AND hit IS NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_false_positives
FROM j
"""


REGISTRY_SCALE: dict[str, tuple] = {
    "q63_salted_skew_agg": (q_salted_skew_agg, ORACLE_SALTED_SKEW_AGG),
    "q64_interval_join": (q_interval_join, ORACLE_INTERVAL_JOIN),
    "q65_distinct_users": (q_distinct_users, ORACLE_DISTINCT_USERS),
    "q66_stream_sessionize": (q_stream_sessionize, ORACLE_SESSIONIZE),
    "q125_bucketed_join_revenue": (q_bucketed_join_revenue,
                                   ORACLE_BUCKETED_JOIN),
    "q157_session_window_stream": (q_session_window_stream,
                                   ORACLE_SESSION_WINDOW),
    "q158_stream_stream_join": (q_stream_stream_join,
                                ORACLE_STREAM_STREAM_JOIN),
    "q166_bloom_filter_join": (q_bloom_filter_join,
                               _oracle_bloom_filter_join()),
}


# ----------------------- q168 watermark late-drop accounting (proof)

def q_watermark_drops(spark: SparkSession, sf_dir: str) -> DataFrame:
    from industrial_data_pipeline_spark.streaming.queries import (
        watermark_drop_accounting)
    return watermark_drop_accounting(spark, sf_dir)


ORACLE_WATERMARK_DROPS = """
WITH ev AS (SELECT CAST(ts AS TIMESTAMP) AS ts FROM events),
wm AS (SELECT max(ts) - INTERVAL 1 HOUR AS w FROM ev),
h AS (SELECT date_trunc('hour', ts) AS hour_start, count(*) AS n
      FROM ev WHERE ts >= '2024-01-08' GROUP BY 1)
SELECT hour_start, n FROM h, wm
WHERE hour_start + INTERVAL 1 HOUR <= wm.w
"""

REGISTRY_SCALE.update({
    "q168_watermark_drops": (q_watermark_drops,
                             ORACLE_WATERMARK_DROPS),
})


# ------------------------------ q172 Z-order layout locality proof

def q_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustering over orders on (customer, order-day): rows
    sort by the Morton key, split into 16 equal tiles (the stand-ins
    for files), and each tile's min/max of BOTH raw dimensions is
    emitted — the spans a reader's min/max-stats pruning would see.
    A linear sort clusters one dimension; the Z-curve bounds both —
    the emitted spans ARE the proof, and they hash-check because the
    key is pure replayable bit arithmetic
    (operators/scale.py::zorder_key)."""
    from pyspark.sql import Window

    from industrial_data_pipeline_spark.operators.scale import zorder_key
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.pmod(F.col("o_custkey"), F.lit(256)).alias("x"),
        F.pmod(F.datediff(F.col("o_orderdate"),
                          F.lit("1995-01-01").cast("date")),
               F.lit(256)).alias("y"))
    z = o.withColumn("z", zorder_key(F.col("x"), F.col("y")))
    # Exact ntile(16) WITHOUT the global single-partition sort: z is
    # 16-bit by construction, so bucketing on its high bits is a
    # deterministic range partition (no sampling — lineage recompute
    # between the two jobs is stable). Job 1 collects the ≤64-row
    # bucket-count table (driver-bounded) and turns it into exact
    # global offsets; job 2 ranks within buckets (distributed window,
    # partitioned on bkt) and applies ntile's quota rule as pure
    # integer arithmetic on offset + local rank. No unpartitioned
    # WindowExec anywhere in the plan.
    zb_bits = 6  # 2^6 = 64 buckets over the 16-bit z key space
    b = z.withColumn("bkt", F.shiftright(F.col("z"),
                                         16 - zb_bits).cast("int"))
    wloc = Window.partitionBy("bkt").orderBy("z", "o_orderkey")
    r = b.withColumn("lrn", F.row_number().over(wloc))
    counts = sorted((row["bkt"], row["c"]) for row in
                    b.groupBy("bkt").agg(F.count("*").alias("c"))
                    .collect())
    offsets, running = [], 0
    for bkt, c in counts:
        offsets.append((bkt, running))
        running += c
    n_total, ntq, rem = running, running // 16, running % 16
    off = spark.createDataFrame(offsets, "bkt int, off long")
    # integer-exact quota arithmetic (doubles would round at 1e11
    # rows): first `rem` tiles take ntq+1 rows, the rest ntq
    cut = rem * (ntq + 1)
    tile = F.expr(
        f"CAST(CASE WHEN off + lrn - 1 < {cut}"
        f"     THEN (off + lrn - 1) div {ntq + 1} + 1"
        f"     ELSE {rem} + (off + lrn - 1 - {cut})"
        f"                  div {max(ntq, 1)} + 1 END AS INT)"
    ).alias("tile")
    t = (r.join(F.broadcast(off), "bkt")
         .select("x", "y", "z", tile))
    return (t.groupBy("tile")
            .agg(F.count("*").alias("n_rows"),
                 F.min("x").alias("x_min"), F.max("x").alias("x_max"),
                 F.min("y").alias("y_min"), F.max("y").alias("y_max"),
                 F.min("z").alias("z_min"), F.max("z").alias("z_max")))


ORACLE_ZORDER_LAYOUT = """
WITH o AS (SELECT o_orderkey,
                  o_custkey % 256 AS x,
                  ((CAST(date_diff('day', DATE '1995-01-01',
                                   CAST(o_orderdate AS DATE)) AS BIGINT)
                    % 256) + 256) % 256 AS y
           FROM orders),
z AS (SELECT o_orderkey, x, y,
             ( ((((x >> 0) & 1)) << 0)
             + ((((y >> 0) & 1)) << 1)
             + ((((x >> 1) & 1)) << 2)
             + ((((y >> 1) & 1)) << 3)
             + ((((x >> 2) & 1)) << 4)
             + ((((y >> 2) & 1)) << 5)
             + ((((x >> 3) & 1)) << 6)
             + ((((y >> 3) & 1)) << 7)
             + ((((x >> 4) & 1)) << 8)
             + ((((y >> 4) & 1)) << 9)
             + ((((x >> 5) & 1)) << 10)
             + ((((y >> 5) & 1)) << 11)
             + ((((x >> 6) & 1)) << 12)
             + ((((y >> 6) & 1)) << 13)
             + ((((x >> 7) & 1)) << 14)
             + ((((y >> 7) & 1)) << 15) ) AS z
      FROM o),
t AS (SELECT x, y, z,
             ntile(16) OVER (ORDER BY z, o_orderkey) AS tile
      FROM z)
SELECT tile, count(*) AS n_rows,
       min(x) AS x_min, max(x) AS x_max,
       min(y) AS y_min, max(y) AS y_max,
       CAST(min(z) AS BIGINT) AS z_min, CAST(max(z) AS BIGINT) AS z_max
FROM t GROUP BY tile
"""

REGISTRY_SCALE.update({
    "q172_zorder_layout": (q_zorder_layout, ORACLE_ZORDER_LAYOUT),
})


# ------------------------------------ q207 join-key skew diagnostics

SKEW_TOP = 20


def q_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 'why is my join slow' report: per-key row counts for the
    events⋈users join key, top-20 hottest keys with their share of
    all rows and their ratio to the mean key size — the numbers that
    decide between a plain shuffle join, AQE skew split, and salting
    (operators/scale.py::salted_join). Scale shape: one combinable
    groupBy, a 2-value global agg, and a distributed top-k
    (TakeOrderedAndProject) — never a global sort or window."""
    c = (load(spark, sf_dir, "events")
         .groupBy("user_id").agg(F.count("*").alias("n")))
    stats = c.agg(F.sum("n").alias("_tot"),
                  F.count("*").alias("_k"))
    top = c.orderBy(F.desc("n"), F.asc("user_id")).limit(SKEW_TOP)
    return (top.crossJoin(F.broadcast(stats))
            .select("user_id", "n",
                    (F.round(F.col("n") / F.col("_tot"), 6) + 0.0)
                    .alias("share"),
                    (F.round(F.col("n").cast("double")
                             / (F.col("_tot").cast("double")
                                / F.col("_k")), 6) + 0.0)
                    .alias("ratio_to_mean")))


ORACLE_SKEW_PROFILE = f"""
WITH c AS (SELECT user_id, count(*) AS n FROM events GROUP BY 1),
s AS (SELECT sum(n) AS tot, count(*) AS k FROM c),
top AS (SELECT user_id, n FROM c
        ORDER BY n DESC, user_id ASC LIMIT {SKEW_TOP})
SELECT user_id, CAST(n AS BIGINT) AS n,
       round(CAST(n AS DOUBLE) / tot, 6) + 0.0 AS share,
       round(CAST(n AS DOUBLE) / (CAST(tot AS DOUBLE) / k), 6) + 0.0
           AS ratio_to_mean
FROM top, s
"""

REGISTRY_SCALE.update({
    "q207_skew_profile": (q_skew_profile, ORACLE_SKEW_PROFILE),
})
