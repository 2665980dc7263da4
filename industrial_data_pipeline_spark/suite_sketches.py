"""Sketch + conversion suite (q109–q111): a Count-Min sketch whose
estimates the oracle REPLAYS EXACTLY in SQL (portable-hash counters —
the sketch is deterministic, so its error is auditable, not just
bounded), funnel conversion latency, and the lines-per-order
distribution.

Count-Min at scale: the counter table is (depth × width) rows — bytes,
regardless of input size — built by one explode + groupBy; estimating
a key is a broadcast join against the counters. The synthetic corpus
has only ~31 distinct tokens, so width is deliberately 8 (≪ vocab):
collisions are guaranteed, the `overestimate` column is non-zero, and
the sketch's accuracy trade-off is demonstrated honestly instead of
vacuously. Production sizing is width ≈ e/ε, depth ≈ ln(1/δ).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from industrial_data_pipeline_spark.operators.text import hash64, tokens
from industrial_data_pipeline_spark.suite_common import load

CM_DEPTH = 4
CM_WIDTH = 8
CM_TOPK = 10

_EV = """
ev AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id,
              event_type, value FROM events)
"""


# ------------------------------------------- q109 count-min sketch

def q_countmin_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min estimates vs exact counts for the top-10 tokens:
    (token, exact, est, overestimate). est = min over 4 hash rows of
    an 8-wide counter array; overestimate ≥ 0 always (CM never
    undercounts). All integers — bit-exact replay in the oracle."""
    tok = (load(spark, sf_dir, "documents")
           .select(F.explode(tokens(F.col("text"))).alias("t")))
    # counters: one explode to (depth, bucket) per token occurrence
    depths = F.array(*[F.lit(d) for d in range(CM_DEPTH)])
    buckets = (tok.select(
        F.col("t"), F.explode(depths).alias("d"))
        .withColumn("b", F.pmod(
            hash64(F.concat(F.col("d").cast("string"), F.lit(":"),
                            F.col("t"))), F.lit(CM_WIDTH))))
    counters = buckets.groupBy("d", "b").agg(F.count("*").alias("c"))
    exact = (tok.groupBy("t").agg(F.count("*").alias("exact"))
             .orderBy(F.desc("exact"), F.asc("t")).limit(CM_TOPK))
    probes = exact.select(
        "t", "exact", F.explode(depths).alias("d")) \
        .withColumn("b", F.pmod(
            hash64(F.concat(F.col("d").cast("string"), F.lit(":"),
                            F.col("t"))), F.lit(CM_WIDTH)))
    return (probes.join(F.broadcast(counters), ["d", "b"])
            .groupBy("t", "exact")
            .agg(F.min("c").alias("est"))
            .select(F.col("t").alias("token"), "exact", "est",
                    (F.col("est") - F.col("exact"))
                    .alias("overestimate")))


_TOKS_SQL = ("list_filter(string_split_regex(trim(text), '\\s+'),"
             " x -> x <> '')")
_H = ("('0x' || substr(md5(CAST(d AS VARCHAR) || ':' || t), 1, 15))"
      f"::BIGINT % {CM_WIDTH}")

ORACLE_COUNTMIN = f"""
WITH tok AS (SELECT unnest({_TOKS_SQL}) AS t FROM documents),
dd AS (SELECT unnest(range(0, {CM_DEPTH})) AS d),
bk AS (SELECT d, {_H} AS b FROM tok CROSS JOIN dd),
counters AS (SELECT d, b, count(*) AS c FROM bk GROUP BY 1, 2),
exact AS (SELECT t, count(*) AS exact FROM tok GROUP BY 1
          ORDER BY exact DESC, t ASC LIMIT {CM_TOPK}),
probes AS (SELECT t, exact, d, {_H} AS b FROM exact CROSS JOIN dd)
SELECT t AS token, exact, min(c) AS est,
       min(c) - exact AS overestimate
FROM probes JOIN counters USING (d, b)
GROUP BY 1, 2
"""


# ----------------------------------------- q110 conversion latency

def q_conversion_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel latency: per user, seconds from first 'view' to the
    first 'purchase' after it; one summary row (converted users,
    mean/median gap). Gaps are exact epoch-µs ints; the mean divides
    once; the median interpolates the same way on both engines."""
    ev = load(spark, sf_dir, "events") \
        .select("user_id", "event_type", "ts")
    first_view = (ev.where(F.col("event_type") == "view")
                  .groupBy("user_id")
                  .agg(F.min("ts").alias("view_ts")))
    conv = (ev.where(F.col("event_type") == "purchase")
            .join(first_view, "user_id")
            .where(F.col("ts") >= F.col("view_ts"))
            .groupBy("user_id")
            .agg(F.min(F.unix_micros("ts")
                       - F.unix_micros("view_ts")).alias("_gap_us")))
    return conv.agg(
        F.count("*").alias("n_converted"),
        F.round(F.sum("_gap_us").cast("double")
                / F.count("*") / 1e6, 6).alias("avg_gap_s"),
        F.round(F.percentile("_gap_us", F.lit(0.5)) / 1e6, 6)
        .alias("p50_gap_s"))


ORACLE_CONVERSION_LATENCY = f"""
WITH {_EV},
fv AS (SELECT user_id, min(ts) AS view_ts FROM ev
       WHERE event_type = 'view' GROUP BY 1),
conv AS (SELECT ev.user_id,
                min(epoch_us(ts) - epoch_us(view_ts)) AS gap_us
         FROM ev JOIN fv USING (user_id)
         WHERE event_type = 'purchase' AND ts >= view_ts
         GROUP BY 1)
SELECT count(*) AS n_converted,
       round(CAST(sum(gap_us) AS DOUBLE) / count(*) / 1e6, 6)
           AS avg_gap_s,
       round(quantile_cont(gap_us, 0.5) / 1e6, 6) AS p50_gap_s
FROM conv
"""


# --------------------------------------- q111 lines-per-order dist

def q_order_size_distribution(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Distribution of lineitem counts per order — the double
    aggregation (fact → per-order count → count-of-counts) that
    shows up in every cardinality audit. Both shuffles combinable."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey")
    per_order = li.groupBy("l_orderkey").agg(F.count("*").alias("n_lines"))
    return per_order.groupBy("n_lines").agg(F.count("*").alias("n_orders"))


ORACLE_ORDER_SIZE_DIST = """
SELECT n_lines, count(*) AS n_orders
FROM (SELECT l_orderkey, count(*) AS n_lines FROM lineitem GROUP BY 1)
GROUP BY 1
"""


REGISTRY_SKETCHES: dict[str, tuple] = {
    "q109_countmin_topk": (q_countmin_topk, ORACLE_COUNTMIN),
    "q110_conversion_latency": (q_conversion_latency,
                                ORACLE_CONVERSION_LATENCY),
    "q111_order_size_distribution": (q_order_size_distribution,
                                     ORACLE_ORDER_SIZE_DIST),
}
