"""Advanced-operator suite (q105–q108): watermarked streaming
deduplication, forward as-of join, dense-rank ties, and a 2-D pivot
matrix — the remaining operator variants the earlier suites don't
reach (streaming dedup state, the forward ASOF direction, rank-with-
ties semantics, multi-value pivot with conditional-aggregation
parity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from industrial_data_pipeline_spark.operators import timeseries as TS
from industrial_data_pipeline_spark.suite_common import (
    archive_analog, events_stream, load)
from industrial_data_pipeline_spark.suite_ts import _ARCH_SQL, HOUR_US


# -------------------------------------------- q105 streaming dedup

def q_stream_dedup_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked streaming dedup (`dropDuplicatesWithinWatermark`
    on (user_id, event_type)) through a real availableNow run into an
    append memory sink, then a batch count per type over the sink —
    distinct users per event type. Dedup state is keyed by the pair
    and expires with the watermark, so state size tracks the active
    key set, not the stream length."""
    table = "idp_stream_dedup"
    src = events_stream(spark, sf_dir)
    deduped = (src.select("ts", "user_id", "event_type")
               .withWatermark("ts", "1 hour")
               .dropDuplicatesWithinWatermark(["user_id", "event_type"]))
    if any(t.name == table for t in spark.catalog.listTables()):
        spark.catalog.dropTempView(table)
    q = (deduped.writeStream.format("memory").queryName(table)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    return (spark.table(table).groupBy("event_type")
            .agg(F.count("*").alias("n_users")))


ORACLE_STREAM_DEDUP = """
SELECT event_type, count(DISTINCT user_id) AS n_users
FROM events GROUP BY 1
"""


# ------------------------------------------ q106 forward as-of join

def q_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of: each raw event aligned to the EARLIEST hourly
    rollup bucket at-or-after it — same union-sort scan as q39, run
    descending. DuckDB replays it with ASOF JOIN on `<=`."""
    arch = archive_analog(spark, sf_dir)
    right = TS.rollup(arch, 3600).select(
        "attribute_id", F.col("bucket_ts").alias("timestamp"),
        F.col("avg_value").alias("value"))
    return TS.asof_join(arch, right, by="attribute_id",
                        direction="forward")


ORACLE_ASOF_FORWARD = f"""
WITH {_ARCH_SQL},
r AS (SELECT attribute_id,
             make_timestamp(epoch_us("timestamp")
                            - epoch_us("timestamp") % {HOUR_US})
                 AS bucket_ts,
             round(avg(value), 6) AS avg_value
      FROM arch GROUP BY 1, 2)
SELECT a.attribute_id, a."timestamp", a.value,
       r.avg_value AS asof_value
FROM arch a
ASOF LEFT JOIN r
  ON a.attribute_id = r.attribute_id AND a."timestamp" <= r.bucket_ts
"""


# ---------------------------------------------- q107 dense-rank ties

def q_top_prices_with_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 PRICE LEVELS per priority (dense_rank ≤ 3 keeps ties) —
    the with-ties semantics row_number-based top-k (q57) can't give."""
    orders = load(spark, sf_dir, "orders") \
        .select("o_orderpriority", "o_orderkey", "o_totalprice")
    w = Window.partitionBy("o_orderpriority") \
        .orderBy(F.desc("o_totalprice"))
    return (orders.withColumn("price_rank", F.dense_rank().over(w))
            .where(F.col("price_rank") <= 3)
            .select("o_orderpriority", "o_orderkey", "o_totalprice",
                    "price_rank"))


ORACLE_TOP_PRICES_TIES = """
SELECT o_orderpriority, o_orderkey, o_totalprice, price_rank
FROM (SELECT o_orderpriority, o_orderkey, o_totalprice,
             dense_rank() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice DESC)
                 AS price_rank
      FROM orders)
WHERE price_rank <= 3
"""


# ------------------------------------------------ q108 pivot matrix

_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
               "5-LOW"]


def q_segment_priority_matrix(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """2-D pivot: order counts per (market segment × priority) as a
    wide matrix — `groupBy(segment).pivot(priority, explicit values)`.
    The explicit value list keeps the pivot single-pass (no extra
    distinct scan) and makes the output schema static."""
    orders = load(spark, sf_dir, "orders").select("o_custkey",
                                                  "o_orderpriority")
    cust = load(spark, sf_dir, "customer").select("c_custkey",
                                                  "c_mktsegment")
    return (orders.join(F.broadcast(cust),
                        orders.o_custkey == cust.c_custkey)
            .groupBy(F.col("c_mktsegment").alias("segment"))
            .pivot("o_orderpriority", _PRIORITIES)
            .agg(F.count(F.lit(1))))


ORACLE_SEGMENT_PRIORITY_MATRIX = """
SELECT c_mktsegment AS segment,
       CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END)
            AS BIGINT) AS "1-URGENT",
       CAST(sum(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 END)
            AS BIGINT) AS "2-HIGH",
       CAST(sum(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 END)
            AS BIGINT) AS "3-MEDIUM",
       CAST(sum(CASE WHEN o_orderpriority = '4-NOT SPECIFIED'
                     THEN 1 END) AS BIGINT) AS "4-NOT SPECIFIED",
       CAST(sum(CASE WHEN o_orderpriority = '5-LOW' THEN 1 END)
            AS BIGINT) AS "5-LOW"
FROM orders JOIN customer ON c_custkey = o_custkey
GROUP BY 1
"""


REGISTRY_ADVANCED: dict[str, tuple] = {
    "q105_stream_dedup_counts": (q_stream_dedup_counts,
                                 ORACLE_STREAM_DEDUP),
    "q106_asof_forward": (q_asof_forward, ORACLE_ASOF_FORWARD),
    "q107_top_prices_with_ties": (q_top_prices_with_ties,
                                  ORACLE_TOP_PRICES_TIES),
    "q108_segment_priority_matrix": (q_segment_priority_matrix,
                                     ORACLE_SEGMENT_PRIORITY_MATRIX),
}
