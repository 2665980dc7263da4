"""Behavioral / statistical suite (q85–q90): weekly retention
cohorts, level-shift detection, market-basket lift, equi-width
histogram, inter-arrival stats, deterministic weighted sampling —
operators/behavior.py wired to the driver contract with DuckDB
oracles.

Determinism notes per query live on the operator docstrings; the
oracle SQL mirrors the exact expression order (same integer gap
arithmetic, same double division order, same md5-derived hash)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from industrial_data_pipeline_spark.operators import behavior as B
from industrial_data_pipeline_spark.suite_common import load

_EV = """
ev AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id,
              event_type, value FROM events)
"""


# ------------------------------------------------ q85 weekly retention

def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return B.retention_cohorts(load(spark, sf_dir, "events"))


ORACLE_RETENTION = f"""
WITH {_EV},
uw AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS week FROM ev),
c AS (SELECT user_id, min(week) AS cohort_week FROM uw GROUP BY 1)
SELECT cohort_week,
       CAST(date_diff('day', cohort_week, week) // 7 AS INTEGER)
           AS week_offset,
       count(DISTINCT user_id) AS n_users
FROM uw JOIN c USING (user_id)
GROUP BY 1, 2
"""


# ------------------------------------------------- q86 level shifts

WINDOW_HOURS = 24
TOP_SHIFTS = 10


def q_level_shifts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return B.level_shifts(load(spark, sf_dir, "events"),
                          window_hours=WINDOW_HOURS, top_n=TOP_SHIFTS)


ORACLE_LEVEL_SHIFTS = f"""
WITH {_EV},
hc AS (SELECT event_type AS grp, date_trunc('hour', ts) AS hour,
              count(*) AS n
       FROM ev GROUP BY 1, 2),
f AS (SELECT grp, hour,
             count(n) OVER wb AS nb, count(n) OVER wa AS na,
             CAST(sum(n) OVER wb AS DOUBLE) / {WINDOW_HOURS}
                 AS before_avg,
             CAST(sum(n) OVER wa AS DOUBLE) / {WINDOW_HOURS}
                 AS after_avg
      FROM hc
      WINDOW wb AS (PARTITION BY grp ORDER BY hour
                    ROWS BETWEEN {WINDOW_HOURS} PRECEDING
                    AND 1 PRECEDING),
             wa AS (PARTITION BY grp ORDER BY hour
                    ROWS BETWEEN 1 FOLLOWING
                    AND {WINDOW_HOURS} FOLLOWING))
SELECT grp AS event_type, hour,
       round(before_avg, 6) AS before_avg,
       round(after_avg, 6) AS after_avg,
       round(after_avg - before_avg, 6) AS shift
FROM f
WHERE nb = {WINDOW_HOURS} AND na = {WINDOW_HOURS}
ORDER BY abs(after_avg - before_avg) DESC, grp, hour
LIMIT {TOP_SHIFTS}
"""


# ------------------------------------------------- q87 basket pairs

MIN_PAIR_COUNT = 3


def q_basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return B.basket_pairs(load(spark, sf_dir, "lineitem"),
                          min_count=MIN_PAIR_COUNT)


ORACLE_BASKET_PAIRS = f"""
WITH bi AS (SELECT DISTINCT l_orderkey AS b, l_partkey AS i
            FROM lineitem),
nb AS (SELECT count(DISTINCT b) AS n_baskets FROM bi),
pairs AS (SELECT l.i AS item_a, r.i AS item_b, count(*) AS pair_count
          FROM bi l JOIN bi r ON l.b = r.b AND l.i < r.i
          GROUP BY 1, 2
          HAVING count(*) >= {MIN_PAIR_COUNT}),
freq AS (SELECT i, count(*) AS cnt FROM bi GROUP BY 1)
SELECT item_a, item_b, pair_count,
       round(CAST(pair_count AS DOUBLE) * n_baskets
             / (fa.cnt * fb.cnt), 6) AS lift
FROM pairs
JOIN freq fa ON fa.i = item_a
JOIN freq fb ON fb.i = item_b
CROSS JOIN nb
"""


# ---------------------------------------------------- q88 histogram

N_BINS = 20


def q_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    return B.equi_width_histogram(
        load(spark, sf_dir, "orders").select("o_totalprice"),
        "o_totalprice", n_bins=N_BINS)


ORACLE_PRICE_HISTOGRAM = f"""
WITH s AS (SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi
           FROM orders),
b AS (SELECT CAST(least({N_BINS - 1},
                        floor((o_totalprice - lo) / (hi - lo)
                              * {N_BINS})) AS INTEGER) AS bin,
             lo, hi
      FROM orders CROSS JOIN s)
SELECT bin, count(*) AS n,
       round(lo + bin * ((hi - lo) / {N_BINS}), 6) AS bin_lo,
       round(lo + (bin + 1) * ((hi - lo) / {N_BINS}), 6) AS bin_hi
FROM b GROUP BY bin, lo, hi
"""


# ---------------------------------------------- q89 inter-arrival

def q_interarrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return B.interarrival_stats(load(spark, sf_dir, "events"))


ORACLE_INTERARRIVAL = f"""
WITH {_EV},
g AS (SELECT event_type,
             epoch_us(ts) - lag(epoch_us(ts))
                 OVER (PARTITION BY event_type
                       ORDER BY ts, event_id) AS gap_us
      FROM ev)
SELECT event_type, count(*) AS n_gaps,
       round(CAST(sum(gap_us) AS DOUBLE) / count(*) / 1e6, 6)
           AS avg_gap_s,
       round(CAST(max(gap_us) AS DOUBLE) / 1e6, 6) AS max_gap_s
FROM g WHERE gap_us IS NOT NULL
GROUP BY 1
"""


# ---------------------------------------------- q90 weighted sample

SAMPLE_K = 5


def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return B.weighted_sample(
        load(spark, sf_dir, "events")
        .select("event_type", "event_id", "value"),
        group_col="event_type", id_col="event_id",
        weight_col="value", k=SAMPLE_K)


ORACLE_WEIGHTED_SAMPLE = f"""
WITH k AS (SELECT event_type, event_id, value,
                  pow((('0x' || substr(md5(CAST(event_id AS VARCHAR)),
                                       1, 15))::BIGINT % 1048576 + 1)
                      / 1048577.0,
                      1.0 / value) AS key
           FROM events WHERE value > 0),
r AS (SELECT event_type, event_id, value, key,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY key DESC, event_id) AS rn
      FROM k)
SELECT event_type, event_id, value,
       round(key, 6) AS sample_key
FROM r WHERE rn <= {SAMPLE_K}
"""


REGISTRY_BEHAVIOR: dict[str, tuple] = {
    "q85_retention_cohorts": (q_retention_cohorts, ORACLE_RETENTION),
    "q86_level_shifts": (q_level_shifts, ORACLE_LEVEL_SHIFTS),
    "q87_basket_pairs": (q_basket_pairs, ORACLE_BASKET_PAIRS),
    "q88_price_histogram": (q_price_histogram, ORACLE_PRICE_HISTOGRAM),
    "q89_interarrival_stats": (q_interarrival_stats, ORACLE_INTERARRIVAL),
    "q90_weighted_sample": (q_weighted_sample, ORACLE_WEIGHTED_SAMPLE),
}
