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


REGISTRY_SCALE: dict[str, tuple] = {
    "q63_salted_skew_agg": (q_salted_skew_agg, ORACLE_SALTED_SKEW_AGG),
    "q64_interval_join": (q_interval_join, ORACLE_INTERVAL_JOIN),
    "q65_distinct_users": (q_distinct_users, ORACLE_DISTINCT_USERS),
    "q66_stream_sessionize": (q_stream_sessionize, ORACLE_SESSIONIZE),
}
