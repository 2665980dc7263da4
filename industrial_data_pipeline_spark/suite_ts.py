"""Time-series suite entries (q38–q42): rollup, as-of join, gap-fill,
rolling early-warning stats — the operators the reference outsources
to the PI ``/interpolated`` endpoint (SURVEY.md §1.2, ingest.py:102),
owned engine-side. Oracles mirror the exact epoch-µs bucket arithmetic
so the comparison is timezone-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from industrial_data_pipeline_spark.operators import timeseries as TS
from industrial_data_pipeline_spark.suite_common import archive_analog

HOUR_US = 3_600_000_000

# shared oracle prelude: events recast to the archive shape
_ARCH_SQL = """
arch AS (SELECT user_id AS attribute_id, CAST(ts AS TIMESTAMP) AS "timestamp",
                value
         FROM events)
"""

_OBS_GRID_SQL = f"""
obs AS (SELECT attribute_id,
               epoch_us("timestamp") - epoch_us("timestamp") % {HOUR_US}
                   AS gus,
               arg_min(value, "timestamp") AS _obs
        FROM arch GROUP BY 1, 2),
span AS (SELECT attribute_id, min(gus) AS lo, max(gus) AS hi
         FROM obs GROUP BY 1),
grid AS (SELECT attribute_id,
                unnest(generate_series(lo, hi, {HOUR_US})) AS gus
         FROM span),
j AS (SELECT g.attribute_id, g.gus, o._obs
      FROM grid g LEFT JOIN obs o USING (attribute_id, gus))
"""


def q_rollup_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly downsample of the 1-min-ish archive: per (attribute,
    bucket) avg/min/max/count + first/last by time — the hypertable
    continuous-aggregate shape."""
    return TS.rollup(archive_analog(spark, sf_dir), 3600)


ORACLE_ROLLUP_HOURLY = f"""
WITH {_ARCH_SQL}
SELECT attribute_id,
       make_timestamp(epoch_us("timestamp")
                      - epoch_us("timestamp") % {HOUR_US}) AS bucket_ts,
       round(avg(value), 6) AS avg_value,
       min(value) AS min_value,
       max(value) AS max_value,
       count(value) AS n_values,
       arg_min(value, "timestamp") AS first_value,
       arg_max(value, "timestamp") AS last_value
FROM arch
GROUP BY 1, 2
"""


def q_asof_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each raw event aligned to the latest hourly rollup
    average at-or-before it. Union-sort implementation — one shuffle
    on the key, no range-join candidate explosion."""
    arch = archive_analog(spark, sf_dir)
    right = TS.rollup(arch, 3600).select(
        "attribute_id", F.col("bucket_ts").alias("timestamp"),
        F.col("avg_value").alias("value"))
    return TS.asof_join(arch, right, by="attribute_id")


ORACLE_ASOF_ROLLUP = f"""
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
  ON a.attribute_id = r.attribute_id AND a."timestamp" >= r.bucket_ts
"""


def q_locf_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resample onto a regular hourly grid, last observation carried
    forward — engine-side stand-in for the PI interpolated pull."""
    return TS.fill_grid(archive_analog(spark, sf_dir), 3600, "locf")


ORACLE_LOCF_GRID = f"""
WITH {_ARCH_SQL},
{_OBS_GRID_SQL}
SELECT attribute_id, make_timestamp(gus) AS grid_ts,
       last_value(_obs IGNORE NULLS) OVER (
           PARTITION BY attribute_id ORDER BY gus
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS filled_value
FROM j
"""


def q_interp_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly grid with linear interpolation between the nearest
    observations (endpoints fall back one-sided)."""
    return TS.fill_grid(archive_analog(spark, sf_dir), 3600, "linear")


ORACLE_INTERP_GRID = f"""
WITH {_ARCH_SQL},
{_OBS_GRID_SQL},
f AS (SELECT attribute_id, gus, _obs,
             last_value(_obs IGNORE NULLS) OVER wb AS prev_v,
             last_value(CASE WHEN _obs IS NOT NULL THEN gus END
                        IGNORE NULLS) OVER wb AS prev_t,
             first_value(_obs IGNORE NULLS) OVER wf AS next_v,
             first_value(CASE WHEN _obs IS NOT NULL THEN gus END
                         IGNORE NULLS) OVER wf AS next_t
      FROM j
      WINDOW wb AS (PARTITION BY attribute_id ORDER BY gus
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             wf AS (PARTITION BY attribute_id ORDER BY gus
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
SELECT attribute_id, make_timestamp(gus) AS grid_ts,
       CASE WHEN prev_v IS NULL THEN next_v
            WHEN next_v IS NULL OR next_t = prev_t THEN prev_v
            ELSE prev_v + (next_v - prev_v)
                 * (gus - prev_t) / (next_t - prev_t)
       END AS filled_value
FROM f
"""


def q_rolling_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling early-warning stats: trailing-10-row mean/σ per
    attribute, z-score, |z|>3 anomaly flag — the alerting computation
    the reference's "Early Warning System" leaves to operators."""
    return TS.rolling_anomaly(archive_analog(spark, sf_dir),
                              window_rows=10, z_threshold=3.0)


ORACLE_ROLLING_ANOMALY = f"""
WITH {_ARCH_SQL},
s AS (SELECT attribute_id, "timestamp", value,
             avg(value) OVER w AS mean_,
             avg(value * value) OVER w AS meansq_,
             count(value) OVER w AS n_
      FROM arch
      WINDOW w AS (PARTITION BY attribute_id
                   ORDER BY "timestamp", value
                   ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING)),
z AS (SELECT *,
             sqrt(greatest(meansq_ - mean_ * mean_, 0.0)) AS sd_,
             CASE WHEN sqrt(greatest(meansq_ - mean_ * mean_, 0.0)) > 0
                  THEN (value - mean_)
                       / sqrt(greatest(meansq_ - mean_ * mean_, 0.0))
             END AS z_
      FROM s)
SELECT attribute_id, "timestamp", value,
       round(mean_, 6) AS roll_mean,
       round(sd_, 6) AS roll_sd,
       round(z_, 6) AS zscore,
       (n_ >= 10 AND abs(z_) > 3.0) AS is_anomaly
FROM z
"""


def q_trend_slopes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-attribute OLS drift line (slope/sec + intercept) — the
    Early Warning trend fit. Exact decimal OLS sums over integer-µs
    x; the slope division is the only floating step, mirrored
    op-for-op in the oracle so doubles match bit-for-bit."""
    return TS.trend_slopes(archive_analog(spark, sf_dir))


ORACLE_TREND_SLOPES = f"""
WITH {_ARCH_SQL},
t0 AS (SELECT attribute_id, min(epoch_us("timestamp")) AS t0
       FROM arch GROUP BY 1),
d AS (SELECT a.attribute_id,
             epoch_us(a."timestamp") - t0.t0 AS x,
             CAST(a.value AS DECIMAL(18,6)) AS y
      FROM arch a JOIN t0 USING (attribute_id)),
agg AS (SELECT attribute_id,
               CAST(count(*) AS DOUBLE) AS n,
               CAST(sum(CAST(x AS DECIMAL(20,0))) AS DOUBLE) AS sx,
               CAST(sum(y) AS DOUBLE) AS sy,
               CAST(sum(CAST(x AS DECIMAL(20,0)) * y) AS DOUBLE) AS sxy,
               CAST(sum(CAST(x AS DECIMAL(19,0))
                        * CAST(x AS DECIMAL(19,0))) AS DOUBLE) AS sxx
        FROM d GROUP BY 1)
SELECT attribute_id, CAST(n AS BIGINT) AS n,
       round((n * sxy - sx * sy) / (n * sxx - sx * sx) * 1000000.0, 6)
           + 0.0 AS slope_per_sec,
       round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n,
             6) + 0.0 AS intercept
FROM agg
"""


# -------------------------------------------- q142 CUSUM drift alarms

def q_cusum_alarms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sided self-calibrated CUSUM control chart per attribute —
    the classic process-drift detector of the Early Warning use case,
    via the closed form S⁺ = runsum − runmin (window functions, no
    recursion)."""
    return TS.cusum_alarms(archive_analog(spark, sf_dir))


ORACLE_CUSUM_ALARMS = f"""
WITH {_ARCH_SQL},
st AS (SELECT attribute_id,
              CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE)
              / count(*) AS mu,
              CAST(sum(CAST(CAST(value AS DECIMAL(28,6))
                            * CAST(value AS DECIMAL(28,6))
                            AS DECIMAL(38,12))) AS DOUBLE)
              / count(*) AS ex2
       FROM arch GROUP BY 1),
s2 AS (SELECT attribute_id, mu,
              sqrt(greatest(ex2 - mu * mu, 0.0)) AS sd FROM st),
d AS (SELECT a.attribute_id, a."timestamp", a.value, s2.mu, s2.sd
      FROM arch a JOIN s2 USING (attribute_id)),
c AS (SELECT attribute_id, "timestamp", value, sd,
             sum(value - mu - 0.5 * sd) OVER w AS c_hi,
             sum(value - mu + 0.5 * sd) OVER w AS c_lo
      FROM d WINDOW w AS (PARTITION BY attribute_id
                          ORDER BY "timestamp", value
                          ROWS UNBOUNDED PRECEDING)),
s AS (SELECT attribute_id, "timestamp", value, sd,
             round(c_hi - min(c_hi) OVER w, 6) + 0.0 AS s_hi,
             round(max(c_lo) OVER w - c_lo, 6) + 0.0 AS s_lo
      FROM c WINDOW w AS (PARTITION BY attribute_id
                          ORDER BY "timestamp", value
                          ROWS UNBOUNDED PRECEDING))
SELECT attribute_id, "timestamp", value, s_hi, s_lo,
       CASE WHEN s_hi >= s_lo THEN 'high' ELSE 'low' END AS side
FROM s WHERE s_hi > 4.0 * sd OR s_lo > 4.0 * sd
"""


# --------------------------------- q143 Western Electric SPC rules

def q_spc_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The four Western Electric run rules per tag as rolling
    integer-indicator counts — the classical Shewhart-chart alarm set
    beside q42's rolling z and q142's CUSUM."""
    return TS.spc_rule_alarms(archive_analog(spark, sf_dir))


ORACLE_SPC_RULES = f"""
WITH {_ARCH_SQL},
st AS (SELECT attribute_id,
              CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE)
              / count(*) AS mu,
              CAST(sum(CAST(CAST(value AS DECIMAL(28,6))
                            * CAST(value AS DECIMAL(28,6))
                            AS DECIMAL(38,12))) AS DOUBLE)
              / count(*) AS ex2
       FROM arch GROUP BY 1),
s2 AS (SELECT attribute_id, mu,
              sqrt(greatest(ex2 - mu * mu, 0.0)) AS sd FROM st),
z AS (SELECT a.attribute_id, a."timestamp", a.value,
             (a.value - s2.mu) / s2.sd AS z
      FROM arch a JOIN s2 USING (attribute_id)),
r AS (SELECT attribute_id, "timestamp", value, z,
             sum(CASE WHEN z > 2 THEN 1 ELSE 0 END) OVER w3 AS u2,
             sum(CASE WHEN z < -2 THEN 1 ELSE 0 END) OVER w3 AS d2,
             sum(CASE WHEN z > 1 THEN 1 ELSE 0 END) OVER w5 AS u1,
             sum(CASE WHEN z < -1 THEN 1 ELSE 0 END) OVER w5 AS d1,
             sum(CASE WHEN z > 0 THEN 1 ELSE 0 END) OVER w8 AS u0,
             sum(CASE WHEN z < 0 THEN 1 ELSE 0 END) OVER w8 AS d0
      FROM z
      WINDOW w3 AS (PARTITION BY attribute_id
                    ORDER BY "timestamp", value
                    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
             w5 AS (PARTITION BY attribute_id
                    ORDER BY "timestamp", value
                    ROWS BETWEEN 4 PRECEDING AND CURRENT ROW),
             w8 AS (PARTITION BY attribute_id
                    ORDER BY "timestamp", value
                    ROWS BETWEEN 7 PRECEDING AND CURRENT ROW))
SELECT attribute_id, "timestamp", value,
       round(z, 6) + 0.0 AS zscore,
       abs(z) > 3 AS r1_beyond_3s,
       (u2 >= 2 OR d2 >= 2) AS r2_two_of_three_2s,
       (u1 >= 4 OR d1 >= 4) AS r3_four_of_five_1s,
       (u0 >= 8 OR d0 >= 8) AS r4_eight_one_side
FROM r
WHERE abs(z) > 3 OR u2 >= 2 OR d2 >= 2 OR u1 >= 4 OR d1 >= 4
      OR u0 >= 8 OR d0 >= 8
"""


# ---------------------- q149 as-of join with staleness tolerance

TOL_S = 7200  # 2 h: a stale rollup must not be carried further


def q_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of alignment with a staleness bound: matches older than
    ``TOL_S`` null out — the industrial rule that a sensor reading
    must not be carried forward indefinitely. Same union-sort scan
    as q39; the tolerance is a post-window predicate, not a second
    join."""
    arch = archive_analog(spark, sf_dir)
    right = TS.rollup(arch, 3600).select(
        "attribute_id", F.col("bucket_ts").alias("timestamp"),
        F.col("avg_value").alias("value"))
    return TS.asof_join(arch, right, by="attribute_id",
                        tolerance_seconds=TOL_S)


ORACLE_ASOF_TOLERANCE = f"""
WITH {_ARCH_SQL},
r AS (SELECT attribute_id,
             make_timestamp(epoch_us("timestamp")
                            - epoch_us("timestamp") % {HOUR_US})
                 AS bucket_ts,
             round(avg(value), 6) AS avg_value
      FROM arch GROUP BY 1, 2)
SELECT a.attribute_id, a."timestamp", a.value,
       CASE WHEN epoch_us(a."timestamp") - epoch_us(r.bucket_ts)
                 <= {TOL_S * 1_000_000}
            THEN r.avg_value END AS asof_value
FROM arch a
ASOF LEFT JOIN r
  ON a.attribute_id = r.attribute_id AND a."timestamp" >= r.bucket_ts
"""


# ----------------------------- q147 tag correlation vs reference

DAY_S = 86400


def q_tag_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson r of every tag against reference tag 0 over aligned
    daily bucket means — redundancy discovery / virtual-sensor
    candidates, linear in tags (each joins the broadcast reference
    series, never tag×tag)."""
    return TS.tag_correlation(archive_analog(spark, sf_dir), ref_key=0,
                              interval_seconds=DAY_S, min_buckets=10)


ORACLE_TAG_CORRELATION = f"""
WITH {_ARCH_SQL},
b AS (SELECT attribute_id,
             epoch_us("timestamp")
                 - epoch_us("timestamp") % {DAY_S * 1_000_000} AS gus,
             CAST(round(CAST(sum(CAST(value AS DECIMAL(28,6)))
                             AS DOUBLE) / count(*), 6)
                  AS DECIMAL(18,6)) AS v
      FROM arch GROUP BY 1, 2),
r AS (SELECT gus, v AS rv FROM b WHERE attribute_id = 0),
j AS (SELECT b.attribute_id, b.v, r.rv FROM b JOIN r USING (gus)
      WHERE b.attribute_id <> 0),
agg AS (SELECT attribute_id, count(*) AS n_buckets,
               CAST(count(*) AS DOUBLE) AS n,
               CAST(sum(v) AS DOUBLE) AS sx,
               CAST(sum(rv) AS DOUBLE) AS sy,
               CAST(sum(v * rv) AS DOUBLE) AS sxy,
               CAST(sum(v * v) AS DOUBLE) AS sxx,
               CAST(sum(rv * rv) AS DOUBLE) AS syy
        FROM j GROUP BY 1)
SELECT attribute_id, n_buckets::BIGINT AS n_buckets,
       round(CASE WHEN sqrt(n * sxx - sx * sx)
                       * sqrt(n * syy - sy * sy) > 0
                  THEN (n * sxy - sx * sy)
                       / (sqrt(n * sxx - sx * sx)
                          * sqrt(n * syy - sy * sy)) END, 6) + 0.0
           AS pearson_r
FROM agg WHERE n_buckets >= 10
"""


REGISTRY_TS: dict[str, tuple] = {
    "q38_rollup_hourly": (q_rollup_hourly, ORACLE_ROLLUP_HOURLY),
    "q39_asof_rollup": (q_asof_rollup, ORACLE_ASOF_ROLLUP),
    "q40_locf_grid": (q_locf_grid, ORACLE_LOCF_GRID),
    "q41_interp_grid": (q_interp_grid, ORACLE_INTERP_GRID),
    "q42_rolling_anomaly": (q_rolling_anomaly, ORACLE_ROLLING_ANOMALY),
    "q67_trend_slopes": (q_trend_slopes, ORACLE_TREND_SLOPES),
    "q142_cusum_alarms": (q_cusum_alarms, ORACLE_CUSUM_ALARMS),
    "q143_spc_rules": (q_spc_rules, ORACLE_SPC_RULES),
    "q147_tag_correlation": (q_tag_correlation, ORACLE_TAG_CORRELATION),
    "q149_asof_tolerance": (q_asof_tolerance, ORACLE_ASOF_TOLERANCE),
}


# ------------------------------------------ q130 seasonal-naive backtest

def q_seasonal_baseline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-over-day seasonal-naive forecast scored per attribute
    (MAE + bias over the hourly rollup) — the baseline any real
    forecaster must beat, and a standing data-quality monitor."""
    return TS.seasonal_baseline(archive_analog(spark, sf_dir),
                                interval_seconds=3600,
                                period_buckets=24)


DAY_US = 24 * HOUR_US

ORACLE_SEASONAL_BASELINE = f"""
WITH {_ARCH_SQL},
r AS (SELECT attribute_id,
             epoch_us("timestamp") - epoch_us("timestamp") % {HOUR_US}
                 AS gus,
             round(avg(value), 6) AS avg_value
      FROM arch GROUP BY 1, 2),
s AS (SELECT cur.attribute_id,
             cur.avg_value - prev.avg_value AS err
      FROM r cur JOIN r prev
        ON cur.attribute_id = prev.attribute_id
       AND cur.gus = prev.gus + {DAY_US})
SELECT attribute_id, count(*) AS n_scored,
       round(avg(abs(err)), 6) AS mae,
       round(avg(err), 6) AS bias
FROM s GROUP BY 1
"""


# ---------------------------------------------- q131 rate-of-change alarms

ROC_THRESHOLD = 150.0


def q_roc_alarms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Historian alarm rule run retrospectively: consecutive-reading
    jumps with |Δ| > 150 per attribute, summarized per tag."""
    return TS.roc_alarms(archive_analog(spark, sf_dir),
                         threshold=ROC_THRESHOLD)


ORACLE_ROC_ALARMS = f"""
WITH {_ARCH_SQL},
d AS (SELECT attribute_id, "timestamp",
             abs(value - lag(value) OVER
                 (PARTITION BY attribute_id
                  ORDER BY "timestamp", value)) AS ad
      FROM arch)
SELECT attribute_id, count(*) AS n_alarms,
       min("timestamp") AS first_alarm_ts,
       max("timestamp") AS last_alarm_ts,
       round(max(ad), 6) AS max_abs_delta
FROM d WHERE ad > {ROC_THRESHOLD} GROUP BY 1
"""

REGISTRY_TS.update({
    "q130_seasonal_baseline": (q_seasonal_baseline,
                               ORACLE_SEASONAL_BASELINE),
    "q131_roc_alarms": (q_roc_alarms, ORACLE_ROC_ALARMS),
})


# --------------------------------------------- q161 EWMA control chart

def q_ewma_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA smoother per tag (operators/timeseries.py::ewma) over the
    archive analog, tags < 200 to bound the oracle's recursive-CTE
    replay. The Python-loop recursion and the SQL recursion perform
    the same IEEE op sequence — byte-identical, so the smoothed
    series is emitted RAW (no rounding: the recursion bits agree by
    construction, while rounding the same double to 6 dp can differ
    between engines when it lands exactly on a half — Spark rounds
    the double's exact binary expansion, DuckDB its shortest repr;
    observed on 3/10000 rows)."""
    arch = archive_analog(spark, sf_dir).where(
        F.col("attribute_id") < 200)
    out = TS.ewma(arch, alpha=0.25)
    return out.select(
        "attribute_id", "timestamp", "value",
        (F.col("ewma") + F.lit(0.0)).alias("ewma"))


ORACLE_EWMA_CHART = f"""
WITH RECURSIVE {_ARCH_SQL},
ev AS (SELECT attribute_id, "timestamp", value,
              row_number() OVER (PARTITION BY attribute_id
                                 ORDER BY "timestamp", value) AS rn
       FROM arch WHERE attribute_id < 200),
r AS (
  SELECT attribute_id, rn, "timestamp", value, value AS s
  FROM ev WHERE rn = 1
  UNION ALL
  SELECT ev.attribute_id, ev.rn, ev."timestamp", ev.value,
         0.25 * ev.value + 0.75 * r.s
  FROM ev JOIN r ON ev.attribute_id = r.attribute_id
                AND ev.rn = r.rn + 1)
SELECT attribute_id, "timestamp", value,
       s + 0.0 AS ewma
FROM r
"""

REGISTRY_TS.update({
    "q161_ewma_chart": (q_ewma_chart, ORACLE_EWMA_CHART),
})


# ---------------------------------------- q173 data-gap report (T2 kin)

def q_gap_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sensor downtime detection — the report behind the reference's
    density circuit breaker (T2): per tag, every gap between
    consecutive readings exceeding 2 hours, as (gap_start, gap_end,
    gap_seconds) intervals. One lag window per tag, exact integer
    second durations."""
    arch = archive_analog(spark, sf_dir).where(
        F.col("attribute_id") < 100)
    from pyspark.sql import Window
    w = Window.partitionBy("attribute_id").orderBy("timestamp", "value")
    prev = F.lag("timestamp").over(w)
    gap_s = ((F.unix_micros("timestamp") - F.unix_micros(prev))
             / F.lit(1_000_000)).cast("long")
    return (arch.withColumn("_prev", prev).withColumn("_gap", gap_s)
            .where(F.col("_gap") > 7200)
            .select("attribute_id",
                    F.col("_prev").alias("gap_start"),
                    F.col("timestamp").alias("gap_end"),
                    F.col("_gap").alias("gap_seconds")))


ORACLE_GAP_REPORT = f"""
WITH {_ARCH_SQL},
g AS (SELECT attribute_id, "timestamp",
             lag("timestamp") OVER (PARTITION BY attribute_id
                                    ORDER BY "timestamp", value)
                 AS prev
      FROM arch WHERE attribute_id < 100)
SELECT attribute_id, prev AS gap_start, "timestamp" AS gap_end,
       CAST((epoch_us("timestamp") - epoch_us(prev)) // 1000000
            AS BIGINT) AS gap_seconds
FROM g
WHERE (epoch_us("timestamp") - epoch_us(prev)) // 1000000 > 7200
"""

REGISTRY_TS.update({
    "q173_gap_report": (q_gap_report, ORACLE_GAP_REPORT),
})


# ------------------------------- q174 rollup cascade (hour→day→month)

def q_rollup_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The materialized-view cascade every warehouse runs: the DAILY
    rollup is computed FROM the hourly rollup, and the MONTHLY from
    the daily — never from raw — so each level costs one narrow
    re-aggregation of the level below (at 100 TB the hourly table is
    ~1/3600 of raw; day and month are near-free). Decimal sums make
    the cascade ALGEBRAICALLY exact: sum-of-sums equals the direct
    sum, which is precisely what the oracle checks by aggregating
    the raw table straight to months."""
    arch = archive_analog(spark, sf_dir)
    dec = F.col("value").cast("decimal(28,6)")
    hourly = (arch.groupBy("attribute_id",
                           F.date_trunc("hour", "timestamp")
                           .alias("h"))
              .agg(F.count("*").alias("n"), F.sum(dec).alias("s")))
    daily = (hourly.groupBy("attribute_id",
                            F.date_trunc("day", "h").alias("d"))
             .agg(F.sum("n").alias("n"), F.sum("s").alias("s")))
    monthly = (daily.groupBy("attribute_id",
                             F.date_trunc("month", "d").alias("month"))
               .agg(F.sum("n").alias("n_values"),
                    F.round(F.sum("s").cast("double"), 6)
                    .alias("sum_value")))
    return monthly


ORACLE_ROLLUP_CASCADE = f"""
WITH {_ARCH_SQL}
SELECT attribute_id, date_trunc('month', "timestamp") AS month,
       count(*) AS n_values,
       round(CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE), 6)
           AS sum_value
FROM arch GROUP BY 1, 2
"""

REGISTRY_TS.update({
    "q174_rollup_cascade": (q_rollup_cascade, ORACLE_ROLLUP_CASCADE),
})


# --------------------- q179 seasonal band anomalies (hour-of-day envelope)

def q_seasonal_band_anomalies(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Profile-based anomaly detection, the industrial complement to
    the rolling z-score (q42) and the seasonal-naive backtest (q130):
    a TRAIN window (before 2024-01-22) builds a nearest-rank
    [p10, p90] envelope per (tag, hour-of-day); the TEST window is
    scored against its hour's own band. Nearest-rank bounds are
    selected data values — byte-reproducible, no interpolation.
    Emits per (tag, hour-of-day): band, test count, anomaly count."""
    from pyspark.sql import Window
    arch = archive_analog(spark, sf_dir).where(
        F.col("attribute_id") < 50)
    hod = F.hour("timestamp")
    train = arch.where(F.col("timestamp") < "2024-01-22") \
        .withColumn("hod", hod)
    test = arch.where(F.col("timestamp") >= "2024-01-22") \
        .withColumn("hod", hod)
    wo = Window.partitionBy("attribute_id", "hod") \
        .orderBy("value", "timestamp")
    wn = Window.partitionBy("attribute_id", "hod")
    d = (train.withColumn("_rn", F.row_number().over(wo))
         .withColumn("_n", F.count("*").over(wn)))
    lo_i = F.greatest(F.ceil(F.lit(0.10) * F.col("_n")), F.lit(1))
    hi_i = F.ceil(F.lit(0.90) * F.col("_n"))
    band = (d.groupBy("attribute_id", "hod")
            .agg(F.max(F.when(F.col("_rn") == lo_i, F.col("value")))
                 .alias("p10"),
                 F.max(F.when(F.col("_rn") == hi_i, F.col("value")))
                 .alias("p90")))
    scored = test.join(band, ["attribute_id", "hod"])
    return (scored.groupBy("attribute_id", "hod")
            .agg(F.first("p10").alias("p10"),
                 F.first("p90").alias("p90"),
                 F.count("*").alias("n_test"),
                 F.sum(F.when((F.col("value") < F.col("p10"))
                              | (F.col("value") > F.col("p90")), 1)
                       .otherwise(0)).alias("n_anomalous")))


ORACLE_SEASONAL_BAND = f"""
WITH {_ARCH_SQL},
a AS (SELECT * FROM arch WHERE attribute_id < 50),
tr AS (SELECT attribute_id, hour("timestamp") AS hod, value,
              "timestamp"
       FROM a WHERE "timestamp" < '2024-01-22'),
d AS (SELECT attribute_id, hod, value,
             row_number() OVER (PARTITION BY attribute_id, hod
                                ORDER BY value, "timestamp") AS rn,
             count(*) OVER (PARTITION BY attribute_id, hod) AS n
      FROM tr),
band AS (SELECT attribute_id, hod,
                max(CASE WHEN rn = greatest(
                      CAST(ceil(0.10 * n) AS BIGINT), 1)
                    THEN value END) AS p10,
                max(CASE WHEN rn = CAST(ceil(0.90 * n) AS BIGINT)
                    THEN value END) AS p90
         FROM d GROUP BY 1, 2),
te AS (SELECT attribute_id, hour("timestamp") AS hod, value
       FROM a WHERE "timestamp" >= '2024-01-22')
SELECT te.attribute_id, te.hod,
       any_value(band.p10) AS p10, any_value(band.p90) AS p90,
       count(*) AS n_test,
       CAST(sum(CASE WHEN te.value < band.p10 OR te.value > band.p90
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalous
FROM te JOIN band USING (attribute_id, hod)
GROUP BY 1, 2
"""

REGISTRY_TS.update({
    "q179_seasonal_band_anomalies": (q_seasonal_band_anomalies,
                                     ORACLE_SEASONAL_BAND),
})


# ------------------- q180 incremental rollup maintenance (late data)

def q_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized-rollup maintenance when data arrives LATE: the
    late batch (every 7th event, scattered across past hours) names
    its affected hourly buckets, and ONLY those buckets re-aggregate
    from base ∪ late — at 100 TB the affected-bucket set is the
    partition-pruning predicate that keeps maintenance cost
    proportional to the late batch's time span, not to history. The
    oracle aggregates the full table directly over the same buckets:
    recompute-affected must equal direct — the correctness contract
    of every incremental view."""
    ev = archive_analog(spark, sf_dir)
    base = ev.where(F.col("value").isNotNull()
                    & (F.col("attribute_id") % 7 != 0))
    late = ev.where(F.col("attribute_id") % 7 == 0)
    hour = F.date_trunc("hour", "timestamp").alias("hour_start")
    affected = late.select(hour).distinct()
    return (base.unionByName(late)
            .select("attribute_id", hour, "value")
            .join(F.broadcast(affected), "hour_start")
            .groupBy("hour_start")
            .agg(F.count("*").alias("n"),
                 F.round(F.sum(F.col("value").cast("decimal(28,6)"))
                         .cast("double"), 6).alias("sum_value")))


ORACLE_INCREMENTAL_ROLLUP = f"""
WITH {_ARCH_SQL},
aff AS (SELECT DISTINCT date_trunc('hour', "timestamp") AS hour_start
        FROM arch WHERE attribute_id % 7 = 0)
SELECT a.hour_start, count(*) AS n,
       round(CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE), 6)
           AS sum_value
FROM (SELECT date_trunc('hour', "timestamp") AS hour_start, value
      FROM arch) a
JOIN aff USING (hour_start)
GROUP BY a.hour_start
"""

REGISTRY_TS.update({
    "q180_incremental_rollup": (q_incremental_rollup,
                                ORACLE_INCREMENTAL_ROLLUP),
})


# ------------------------- q181 Theil–Sen robust trend slopes per tag

def q_theilsen_slopes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust trend estimation: the Theil–Sen slope (median of all
    pairwise slopes) per tag over each tag's first 40 hourly means —
    the estimator that shrugs off the outliers that drag q67's OLS.
    The within-tag pair join is O(k²) with k capped at 40 (6.5 k
    pairs/tag — the documented window; at 100 TB you run it per
    maintenance window, not per full history). The median is
    nearest-rank — a SELECTED exact slope value, byte-reproducible;
    slopes themselves are single IEEE divisions of decimal-exact
    hourly means over integer hour gaps."""
    from pyspark.sql import Window
    arch = archive_analog(spark, sf_dir).where(
        F.col("attribute_id") < 30)
    hourly = (arch.groupBy("attribute_id",
                           F.date_trunc("hour", "timestamp")
                           .alias("h"))
              .agg(F.sum(F.col("value").cast("decimal(28,6)"))
                   .cast("double").alias("_s"),
                   F.count("*").alias("_n")))
    wk = Window.partitionBy("attribute_id").orderBy("h")
    pts = (hourly.withColumn("_i", F.row_number().over(wk))
           .where(F.col("_i") <= 40)
           .select("attribute_id", "_i",
                   (F.col("_s") / F.col("_n")).alias("_y")))
    a = pts.select("attribute_id", F.col("_i").alias("_ia"),
                   F.col("_y").alias("_ya"))
    b = pts.select("attribute_id", F.col("_i").alias("_ib"),
                   F.col("_y").alias("_yb"))
    slopes = (a.join(b, "attribute_id")
              .where(F.col("_ib") > F.col("_ia"))
              .select("attribute_id",
                      ((F.col("_yb") - F.col("_ya"))
                       / (F.col("_ib") - F.col("_ia")))
                      .alias("_m")))
    ws = Window.partitionBy("attribute_id").orderBy("_m")
    wn = Window.partitionBy("attribute_id")
    ranked = (slopes.withColumn("_rn", F.row_number().over(ws))
              .withColumn("_cnt", F.count("*").over(wn)))
    med_i = F.ceil(F.col("_cnt") / F.lit(2.0))
    return (ranked.where(F.col("_rn") == med_i)
            .select("attribute_id",
                    F.col("_m").alias("theilsen_slope"),
                    F.col("_cnt").alias("n_pairs")))


ORACLE_THEILSEN = f"""
WITH {_ARCH_SQL},
hourly AS (SELECT attribute_id, date_trunc('hour', "timestamp") AS h,
                  CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE)
                      AS s,
                  count(*) AS n
           FROM arch WHERE attribute_id < 30 GROUP BY 1, 2),
pts AS (SELECT attribute_id, i, y FROM
          (SELECT attribute_id,
                  row_number() OVER (PARTITION BY attribute_id
                                     ORDER BY h) AS i,
                  s / n AS y
           FROM hourly)
        WHERE i <= 40),
sl AS (SELECT a.attribute_id, (b.y - a.y) / (b.i - a.i) AS m
       FROM pts a JOIN pts b ON a.attribute_id = b.attribute_id
                            AND b.i > a.i),
r AS (SELECT attribute_id, m,
             row_number() OVER (PARTITION BY attribute_id
                                ORDER BY m) AS rn,
             count(*) OVER (PARTITION BY attribute_id) AS cnt
      FROM sl)
SELECT attribute_id, m AS theilsen_slope, cnt AS n_pairs
FROM r WHERE rn = CAST(ceil(cnt / 2.0) AS BIGINT)
"""

REGISTRY_TS.update({
    "q181_theilsen_slopes": (q_theilsen_slopes, ORACLE_THEILSEN),
})


# --------------------- q192 time-weighted average (the PI aggregate)

def q_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE PI-system aggregate the reference's plain averages stand in
    for: the time-weighted mean — each reading weighted by how long
    it REMAINED CURRENT (LOCF weighting, to the next reading or the
    day boundary), so irregular sampling can't bias the daily figure
    the way row-averages do. Per (tag < 50, day) over the observed
    span: weights are exact integer microseconds, values quantize to
    MILLI units (industrial 3-dp precision — and the choice is
    load-bearing: the milli weighted sum fits int64, so every emitted
    number is an exact integer or an int64→double HARDWARE conversion
    plus one IEEE division. A micro-unit sum forces a wide
    DECIMAL→DOUBLE cast whose software rounding was measured to
    differ between engines by 1 ulp above 2^53)."""
    from pyspark.sql import Window
    arch = archive_analog(spark, sf_dir).where(
        F.col("attribute_id") < 50)
    day = F.date_trunc("day", "timestamp")
    us = F.unix_micros("timestamp")
    day_end = F.unix_micros(
        F.date_trunc("day", "timestamp") + F.expr("INTERVAL 1 DAY"))
    nxt = F.lead(us).over(
        Window.partitionBy("attribute_id", day)
        .orderBy("timestamp", "value"))
    dt = F.coalesce(nxt, day_end) - us
    v_milli = (F.col("value").cast("decimal(15,3)")
               * F.lit(1000)).cast("long")
    # product in DECIMAL(25,0) (exact; v_milli < 1e7, dt < 1e11),
    # summed exactly, then cast long (< 8.7e16 — int64-safe)
    d = (arch.withColumn("_dt", dt)
         .withColumn("_wv", v_milli.cast("decimal(13,0)")
                     * dt.cast("decimal(12,0)")))
    return (d.groupBy("attribute_id", day.alias("day"))
            .agg(F.count("*").alias("n_readings"),
                 F.sum("_wv").cast("long").alias("twa_num_milli_us"),
                 F.sum("_dt").alias("twa_den_us"))
            .withColumn("twa",
                        (F.col("twa_num_milli_us").cast("double")
                         / (F.col("twa_den_us").cast("double")
                            * F.lit(1000.0))) + F.lit(0.0)))


ORACLE_TIME_WEIGHTED_AVG = f"""
WITH {_ARCH_SQL},
a AS (SELECT attribute_id, "timestamp", value,
             date_trunc('day', "timestamp") AS day,
             epoch_us("timestamp") AS us,
             epoch_us(date_trunc('day', "timestamp")
                      + INTERVAL 1 DAY) AS day_end
      FROM arch WHERE attribute_id < 50),
d AS (SELECT attribute_id, day, value,
             coalesce(lead(us) OVER (PARTITION BY attribute_id, day
                                     ORDER BY "timestamp", value),
                      day_end) - us AS dt
      FROM a)
SELECT attribute_id, day, count(*) AS n_readings,
       CAST(sum(CAST(CAST(CAST(value AS DECIMAL(15,3)) * 1000
                          AS BIGINT) AS DECIMAL(19,0))
                * CAST(dt AS DECIMAL(19,0))) AS BIGINT)
           AS twa_num_milli_us,
       CAST(sum(dt) AS BIGINT) AS twa_den_us,
       (CAST(CAST(sum(CAST(CAST(CAST(value AS DECIMAL(15,3)) * 1000
                               AS BIGINT) AS DECIMAL(19,0))
                      * CAST(dt AS DECIMAL(19,0))) AS BIGINT)
             AS DOUBLE)
        / (CAST(CAST(sum(dt) AS BIGINT) AS DOUBLE) * 1000.0)) + 0.0
           AS twa
FROM d GROUP BY 1, 2
"""

REGISTRY_TS.update({
    "q192_time_weighted_avg": (q_time_weighted_avg,
                               ORACLE_TIME_WEIGHTED_AVG),
})


# ------------------------ q200 sensor fusion (chained as-of aligns)

def q_sensor_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sensor fusion — the milestone query: three tags aligned onto
    tag 1's clock by CHAINED as-of joins (each reading of the
    reference tag picks up the latest value of tags 2 and 3 at or
    before it), the way a model-input frame is assembled from
    unsynchronized industrial sensors. Each tag is its hourly mean
    (unique timestamps per tag); the as-of operator's union-sort scan
    keys on a constant group — one shuffle per align, no range join.
    Values are selections of decimal-rounded means: byte-exact."""
    arch = archive_analog(spark, sf_dir)

    def tag(i: int, name: str) -> DataFrame:
        return (arch.where(F.col("attribute_id") == i)
                .groupBy(F.date_trunc("hour", "timestamp")
                         .alias("timestamp"))
                .agg(F.round(F.sum(F.col("value").cast("decimal(28,6)"))
                             .cast("double")
                             / F.count("*"), 6).alias(name))
                .withColumn("g", F.lit(1)))

    base = tag(1, "v1")
    f2 = TS.asof_join(base, tag(2, "v2"), by="g",
                      value_cols=("v2",))
    f3 = TS.asof_join(f2, tag(3, "v3"), by="g",
                      value_cols=("v3",))
    return f3.select("timestamp", "v1",
                     F.col("asof_v2").alias("v2"),
                     F.col("asof_v3").alias("v3"))


ORACLE_SENSOR_FUSION = f"""
WITH {_ARCH_SQL},
h AS (SELECT attribute_id, date_trunc('hour', "timestamp") AS t,
             round(CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE)
                   / count(*), 6) AS v
      FROM arch WHERE attribute_id IN (1, 2, 3) GROUP BY 1, 2),
t1 AS (SELECT t, v AS v1 FROM h WHERE attribute_id = 1),
t2 AS (SELECT t, v AS v2 FROM h WHERE attribute_id = 2),
t3 AS (SELECT t, v AS v3 FROM h WHERE attribute_id = 3),
f2 AS (SELECT t1.t, t1.v1, t2.v2
       FROM t1 ASOF LEFT JOIN t2 ON t1.t >= t2.t)
SELECT f2.t AS "timestamp", f2.v1, f2.v2, t3.v3
FROM f2 ASOF LEFT JOIN t3 ON f2.t >= t3.t
"""

REGISTRY_TS.update({
    "q200_sensor_fusion": (q_sensor_fusion, ORACLE_SENSOR_FUSION),
})


# ------------------------------ q209 rolling exact median per tag

ROLL_FRAME = 23  # previous readings in the frame (24 incl. current)


def q_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling EXACT median over the last 24 readings per tag — the
    robust companion to q42's rolling mean/stddev anomaly scores
    (a single spike shifts a mean but not a median). Exact
    percentile as a moving-frame window aggregate, partitioned by
    tag: state is the 24-row frame, work is |rows|×frame, fully
    distributed — never a global sort. Interpolated medians of
    identical double inputs are bit-identical across engines (q46
    established percentile_cont parity), so values ship raw."""
    arch = archive_analog(spark, sf_dir).where(
        F.col("attribute_id").isin(1, 2, 3))
    arch.createOrReplaceTempView("_roll_arch")
    return spark.sql(f"""
        SELECT attribute_id, timestamp, value,
               percentile(value, 0.5) OVER (
                   PARTITION BY attribute_id ORDER BY timestamp, value
                   ROWS BETWEEN {ROLL_FRAME} PRECEDING AND CURRENT ROW
               ) + 0.0 AS rolling_med
        FROM _roll_arch
    """)


ORACLE_ROLLING_MEDIAN = f"""
WITH {_ARCH_SQL}
SELECT attribute_id, "timestamp", value,
       quantile_cont(value, 0.5) OVER (
           PARTITION BY attribute_id ORDER BY "timestamp", value
           ROWS BETWEEN {ROLL_FRAME} PRECEDING AND CURRENT ROW
       ) + 0.0 AS rolling_med
FROM arch
WHERE attribute_id IN (1, 2, 3)
"""

REGISTRY_TS.update({
    "q209_rolling_median": (q_rolling_median, ORACLE_ROLLING_MEDIAN),
})


# ------------------------- q223 stuck-at (flatline) sensor runs

STUCK_MIN_RUN = 4


def q_stuck_sensor_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE industrial data-quality screen: a transmitter that keeps
    reporting exactly the same value has usually died with its
    output latched — averages stay plausible, so only a run-length
    scan catches it. Gaps-and-islands per tag on consecutive-equal
    values (lag → change flag → running island id), islands of
    ≥ STUCK_MIN_RUN readings emitted with their span. One shuffle
    on the tag key; bitwise equality on doubles is deterministic.

    The synthetic feed's random doubles never repeat, so latch
    faults are INJECTED deterministically first (every 37-reading
    stretch starts with 6 readings latched at the tag id) — the
    detector then has real runs to find and the oracle replays the
    same injection."""
    from pyspark.sql import Window
    arch = archive_analog(spark, sf_dir).where(
        F.col("attribute_id").isin(1, 2, 3, 4, 5))
    # (timestamp, value) ordering — the repo-wide tie discipline: a
    # bare-timestamp order leaves duplicate-µs rows in arbitrary
    # engine-specific order, and here the order decides WHERE the
    # injection lands ("_r" binds to the ORIGINAL value; the run
    # windows below re-resolve "value" to the rewritten column)
    w = Window.partitionBy("attribute_id").orderBy("timestamp", "value")
    arch = (arch.withColumn("_r", F.row_number().over(w))
            .withColumn("value",
                        F.when(F.col("_r") % 37 < 6,
                               F.col("attribute_id").cast("double"))
                        .otherwise(F.col("value"))))
    run = (arch.withColumn(
        "_chg", F.when(F.lag("value").over(w).isNull()
                       | (F.lag("value").over(w) != F.col("value")),
                       1).otherwise(0))
        .withColumn("_isl", F.sum("_chg").over(
            w.rowsBetween(Window.unboundedPreceding,
                          Window.currentRow))))
    return (run.groupBy("attribute_id", "_isl")
            .agg(F.count("*").alias("n_readings"),
                 F.min("timestamp").alias("run_start"),
                 F.max("timestamp").alias("run_end"),
                 F.first("value").alias("stuck_value"))
            .where(F.col("n_readings") >= STUCK_MIN_RUN)
            .select("attribute_id", "run_start", "run_end",
                    "n_readings", "stuck_value"))


ORACLE_STUCK_RUNS = f"""
WITH {_ARCH_SQL},
a0 AS (SELECT *, row_number() OVER (PARTITION BY attribute_id
                                    ORDER BY "timestamp", value) AS rr
       FROM arch WHERE attribute_id IN (1, 2, 3, 4, 5)),
a AS (SELECT attribute_id, "timestamp",
             CASE WHEN rr % 37 < 6
                  THEN CAST(attribute_id AS DOUBLE)
                  ELSE value END AS value
      FROM a0),
r AS (SELECT attribute_id, "timestamp", value,
             CASE WHEN lag(value) OVER w IS NULL
                       OR lag(value) OVER w <> value
                  THEN 1 ELSE 0 END AS chg
      FROM a WINDOW w AS (PARTITION BY attribute_id
                          ORDER BY "timestamp", value)),
i AS (SELECT attribute_id, "timestamp", value,
             sum(chg) OVER (PARTITION BY attribute_id
                            ORDER BY "timestamp", value
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS isl
      FROM r)
SELECT attribute_id, min("timestamp") AS run_start,
       max("timestamp") AS run_end,
       count(*) AS n_readings,
       any_value(value) AS stuck_value
FROM i GROUP BY attribute_id, isl
HAVING count(*) >= {STUCK_MIN_RUN}
"""

REGISTRY_TS.update({
    "q223_stuck_sensor_runs": (q_stuck_sensor_runs,
                               ORACLE_STUCK_RUNS),
})


# ----------------------------- q224 shift-calendar rollup

def q_shift_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The plant operations report: per tag × 8-hour shift (A/B/C)
    × weekday/weekend, reading count and DECIMAL-exact average —
    the aggregation every shift handover meeting reads. Calendar
    derivation is pure codegen (hour div 8, ISO day-of-week); one
    combinable groupBy."""
    arch = archive_analog(spark, sf_dir).where(
        F.col("attribute_id").isin(1, 2, 3))
    shift = F.element_at(
        F.array(F.lit("A"), F.lit("B"), F.lit("C")),
        (F.floor(F.hour("timestamp") / 8) + 1).cast("int"))
    weekend = F.dayofweek("timestamp").isin(1, 7)  # Sun=1, Sat=7
    return (arch.groupBy("attribute_id", shift.alias("shift"),
                         weekend.alias("is_weekend"))
            .agg(F.count("*").alias("n"),
                 F.round(F.sum(F.col("value").cast("decimal(28,6)"))
                         .cast("double")
                         / F.count("*"), 6).alias("avg_value")))


ORACLE_SHIFT_ROLLUP = f"""
WITH {_ARCH_SQL}
SELECT attribute_id,
       CASE CAST(floor(extract(hour FROM "timestamp") / 8) AS INT)
            WHEN 0 THEN 'A' WHEN 1 THEN 'B' ELSE 'C' END AS shift,
       dayofweek("timestamp") IN (0, 6) AS is_weekend,
       count(*) AS n,
       round(CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE)
             / count(*), 6) AS avg_value
FROM arch WHERE attribute_id IN (1, 2, 3)
GROUP BY 1, 2, 3
"""

REGISTRY_TS.update({
    "q224_shift_rollup": (q_shift_rollup, ORACLE_SHIFT_ROLLUP),
})
