"""Behavioral / statistical analytics: retention cohorts, level-shift
detection, market-basket co-occurrence, equi-width histograms,
inter-arrival statistics, deterministic weighted sampling.

Scale shapes: every operator is one or two combinable shuffles on its
natural key (user, event_type, order, bin). Nothing collects to the
driver; the only scalars (histogram min/max, basket order count) ride
broadcast cross joins. Determinism follows the house rules — integer
arithmetic where possible (epoch-µs gaps, scaled counts), identical
double expression order on both engines elsewhere, hash-derived
pseudo-randomness (portable md5 hash64) instead of RNG state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from industrial_data_pipeline_spark.operators.text import hash64


def retention_cohorts(df: DataFrame, user_col: str = "user_id",
                      ts_col: str = "ts") -> DataFrame:
    """Weekly retention: cohort = the user's first active week
    (Monday-truncated); one row per (cohort_week, week_offset) with
    the distinct users still active that week.

    Plan: distinct (user, week) first — the heavy dedup is map-side
    combinable — then a user-keyed min for the cohort and one final
    aggregation. The cohort frame is user-cardinality, joined back on
    the same user key (no extra shuffle under AQE)."""
    uw = df.select(F.col(user_col).alias("user_id"),
                   F.date_trunc("week", F.col(ts_col)).alias("week")) \
        .distinct()
    cohort = uw.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (uw.join(cohort, "user_id")
            .groupBy("cohort_week",
                     F.floor(F.datediff("week", "cohort_week") / 7)
                     .cast("int").alias("week_offset"))
            .agg(F.countDistinct("user_id").alias("n_users")))


def level_shifts(df: DataFrame, group_col: str = "event_type",
                 ts_col: str = "ts", window_hours: int = 24,
                 top_n: int = 10) -> DataFrame:
    """Level-shift detector over hourly event counts: for each hour,
    compare the mean count of the previous `window_hours` observed
    hours against the next `window_hours`; report the top-N largest
    absolute shifts. Counts are exact ints, each mean is one double
    division, so the ordering is engine-independent. One shuffle
    (group, hour) + one window sort per group."""
    hc = df.groupBy(F.col(group_col).alias("grp"),
                    F.date_trunc("hour", F.col(ts_col)).alias("hour")) \
        .agg(F.count("*").alias("n"))
    w = Window.partitionBy("grp").orderBy("hour")
    before = w.rowsBetween(-window_hours, -1)
    after = w.rowsBetween(1, window_hours)
    # every window must be computed BEFORE the completeness filter —
    # filtering first would re-evaluate the frames over the filtered
    # neighbors (and silently disagree with any SQL replay).
    full = (hc
            .withColumn("_nb", F.count("n").over(before))
            .withColumn("_na", F.count("n").over(after))
            .withColumn("before_avg",
                        F.sum("n").over(before).cast("double")
                        / window_hours)
            .withColumn("after_avg",
                        F.sum("n").over(after).cast("double")
                        / window_hours)
            .where((F.col("_nb") == window_hours)
                   & (F.col("_na") == window_hours))
            .withColumn("shift", F.col("after_avg") - F.col("before_avg")))
    return (full.orderBy(F.abs(F.col("shift")).desc(), "grp", "hour")
            .limit(top_n)
            .select(F.col("grp").alias("event_type"), "hour",
                    F.round("before_avg", 6).alias("before_avg"),
                    F.round("after_avg", 6).alias("after_avg"),
                    F.round("shift", 6).alias("shift")))


def basket_pairs(df: DataFrame, basket_col: str = "l_orderkey",
                 item_col: str = "l_partkey",
                 min_count: int = 3) -> DataFrame:
    """Market-basket co-occurrence with lift. The (basket, item) set
    is deduped FIRST (combinable, shrinks the self-join input), the
    pair join shuffles once on the basket key, and the item-frequency
    frame joins back broadcast. lift = P(a,b)/(P(a)·P(b)) as one
    double expression identical on both engines."""
    bi = df.select(F.col(basket_col).alias("b"),
                   F.col(item_col).alias("i")).distinct()
    n_baskets = bi.select(F.countDistinct("b").alias("_nb"))
    l, r = bi.alias("l"), bi.alias("r")
    pairs = (l.join(r, (F.col("l.b") == F.col("r.b"))
                    & (F.col("l.i") < F.col("r.i")))
             .groupBy(F.col("l.i").alias("item_a"),
                      F.col("r.i").alias("item_b"))
             .agg(F.count("*").alias("pair_count"))
             .where(F.col("pair_count") >= min_count))
    freq = bi.groupBy("i").agg(F.count("*").alias("_cnt"))
    fa = freq.select(F.col("i").alias("item_a"),
                     F.col("_cnt").alias("_ca"))
    fb = freq.select(F.col("i").alias("item_b"),
                     F.col("_cnt").alias("_cb"))
    return (pairs.join(F.broadcast(fa), "item_a")
            .join(F.broadcast(fb), "item_b")
            .crossJoin(F.broadcast(n_baskets))
            .select("item_a", "item_b", "pair_count",
                    F.round(F.col("pair_count").cast("double")
                            * F.col("_nb")
                            / (F.col("_ca") * F.col("_cb")), 6)
                    .alias("lift")))


def equi_width_histogram(df: DataFrame, value_col: str,
                         n_bins: int = 20) -> DataFrame:
    """Global-range equi-width histogram: bin ids, bounds and counts.
    min/max are one tiny aggregate broadcast back; binning is a
    map-only expression (floor((x-lo)/(hi-lo)·n), top edge clamped
    into the last bin). Same expression order on both engines →
    identical bin assignment."""
    x = F.col(value_col).cast("double")
    stats = df.agg(F.min(x).alias("_lo"), F.max(x).alias("_hi"))
    b = F.least(F.lit(n_bins - 1),
                F.floor((x - F.col("_lo")) / (F.col("_hi") - F.col("_lo"))
                        * n_bins)).cast("int")
    width = (F.col("_hi") - F.col("_lo")) / n_bins
    return (df.crossJoin(F.broadcast(stats))
            .groupBy(b.alias("bin"), F.col("_lo"), F.col("_hi"))
            .agg(F.count("*").alias("n"))
            .select("bin", "n",
                    F.round(F.col("_lo") + F.col("bin") * width, 6)
                    .alias("bin_lo"),
                    F.round(F.col("_lo") + (F.col("bin") + 1) * width, 6)
                    .alias("bin_hi")))


def interarrival_stats(df: DataFrame, group_col: str = "event_type",
                       ts_col: str = "ts",
                       id_col: str = "event_id") -> DataFrame:
    """Per-group inter-arrival gaps in exact epoch-µs integers
    (lag over a (ts, id)-deterministic order), aggregated to count /
    mean / max seconds. One shuffle on the group key."""
    w = Window.partitionBy(group_col).orderBy(ts_col, id_col)
    gap = (df.withColumn(
        "_gap_us",
        F.unix_micros(F.col(ts_col))
        - F.lag(F.unix_micros(F.col(ts_col))).over(w))
        .where(F.col("_gap_us").isNotNull()))
    return (gap.groupBy(group_col)
            .agg(F.count("*").alias("n_gaps"),
                 F.round(F.sum("_gap_us").cast("double")
                         / F.count("*") / 1e6, 6).alias("avg_gap_s"),
                 F.round(F.max("_gap_us").cast("double") / 1e6, 6)
                 .alias("max_gap_s")))


def weighted_sample(df: DataFrame, group_col: str, id_col: str,
                    weight_col: str, k: int = 5) -> DataFrame:
    """Deterministic weighted sampling (Efraimidis–Spirakis A-Res):
    key = u^(1/w) with u derived from the portable md5 hash64 — no RNG
    state, reproducible on any engine, any partitioning, any run.
    Top-k per group by key is one window over the group shuffle."""
    u = ((F.pmod(hash64(F.col(id_col).cast("string")), F.lit(1048576))
          + 1) / F.lit(1048577.0))
    key = F.pow(u, F.lit(1.0) / F.col(weight_col).cast("double"))
    w = Window.partitionBy(group_col) \
        .orderBy(F.desc("_key"), F.col(id_col))
    return (df.where(F.col(weight_col) > 0)  # A-Res needs w > 0
            .withColumn("_key", key)
            .withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= k)
            .select(F.col(group_col), F.col(id_col),
                    F.col(weight_col),
                    F.round("_key", 6).alias("sample_key")))
