"""Time-series operators the reference delegates to its data source.

The reference never computes these itself — it asks the PI Web API for
``/interpolated`` data at a fixed interval (/root/reference/src/pi/
extraction/ingest.py:102) and stores the result, so downsampling,
alignment, and gap-filling all happen upstream. A standalone engine
has to own them: given only the raw ``archive`` long table, these
operators reproduce (and extend) what the PI layer provided —
fixed-interval rollups, as-of alignment, LOCF/linear interpolation
onto a regular grid, and rolling early-warning statistics.

All are compositions of built-in DataFrame ops (one shuffle on the
partition key each, window functions inside the key partition); no
UDFs, fully codegen-able, and the shapes hold at 100 TB because every
window/group is keyed by ``attribute_id`` (bounded state per key,
parallel across keys).

Timezone discipline: bucketing is pure epoch-µs arithmetic
(``unix_micros``/``timestamp_micros``), never ``date_trunc`` — the
result is identical under any session timezone, which keeps the
DuckDB oracle comparison (and a real cluster with mixed TZ configs)
honest.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def time_bucket(ts: Column | str, interval_seconds: int) -> Column:
    """Floor a timestamp to a fixed interval via epoch-µs arithmetic
    (timezone-independent, unlike ``date_trunc``)."""
    us = int(interval_seconds) * 1_000_000
    c = F.col(ts) if isinstance(ts, str) else ts
    cus = F.unix_micros(c)
    # exact long arithmetic (x - x % us), not double division — a
    # double quotient can land a hair under an exact bucket boundary
    # and truncate into the wrong bucket
    return F.timestamp_micros(cus - F.pmod(cus, F.lit(us)))


def rollup(archive: DataFrame, interval_seconds: int,
           key_col: str = "attribute_id", ts_col: str = "timestamp",
           value_col: str = "value", round_dp: int = 6) -> DataFrame:
    """Fixed-interval downsample: per (key, bucket) avg/min/max/count
    plus first/last by time (``min_by``/``max_by`` — no sort, map-side
    partial agg). The 1-min archive → hourly rollup is the hypertable
    continuous-aggregate shape; at scale this is one shuffle on
    (key, bucket) with partial aggregation upstream of it."""
    return (archive
            .groupBy(F.col(key_col).alias(key_col),
                     time_bucket(ts_col, interval_seconds)
                     .alias("bucket_ts"))
            .agg(F.round(F.avg(value_col), round_dp).alias("avg_value"),
                 F.min(value_col).alias("min_value"),
                 F.max(value_col).alias("max_value"),
                 F.count(value_col).alias("n_values"),
                 F.min_by(value_col, ts_col).alias("first_value"),
                 F.max_by(value_col, ts_col).alias("last_value")))


def asof_join(left: DataFrame, right: DataFrame, by: str,
              left_ts: str = "timestamp", right_ts: str = "timestamp",
              value_cols: tuple[str, ...] = ("value",),
              tolerance_seconds: int | None = None,
              direction: str = "backward") -> DataFrame:
    """As-of join: for each left row, the latest right row with
    ``right_ts <= left_ts`` in the same ``by`` group (DuckDB/kdb ASOF
    semantics). ``direction="forward"`` flips it — the EARLIEST right
    row with ``right_ts >= left_ts`` (same one-shuffle scan, run over
    the descending order).

    Implemented with the union-sort trick, not a range join: tag both
    sides, union, and carry the last-seen right values forward with a
    running ``last(ignorenulls)`` window inside each key — one shuffle
    on ``by``, O(n log n) per key, no O(n·m) candidate pairs. This is
    the form that survives 100 TB; an inequality join would
    cross-product within keys.

    Equal timestamps match (right sorts before left at the same
    instant). ``tolerance_seconds`` nulls out matches older than the
    tolerance, like pandas ``merge_asof(tolerance=...)``.
    """
    lcols = [c for c in left.columns if c != by and c != left_ts]
    tagged_l = left.select(
        F.col(by).alias("_k"), F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"_r_{c}")
          for c in value_cols],
        F.lit(None).cast("timestamp").alias("_rts"))
    tagged_r = right.select(
        F.col(by).alias("_k"), F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in lcols],
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
        F.col(right_ts).alias("_rts"))
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction}")
    order = [F.asc("_ts"), F.asc("_side")] if direction == "backward" \
        else [F.desc("_ts"), F.asc("_side")]
    w = (Window.partitionBy("_k").orderBy(*order)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    filled = tagged_l.unionByName(tagged_r).select(
        "*",
        *[F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_f_{c}")
          for c in value_cols],
        F.last("_rts", ignorenulls=True).over(w).alias("_f_rts"))
    out = filled.where(F.col("_side") == 1)
    gap = (F.unix_micros(F.col("_ts")) - F.unix_micros(F.col("_f_rts"))
           if direction == "backward"
           else F.unix_micros(F.col("_f_rts")) - F.unix_micros(F.col("_ts")))
    keep = F.lit(True) if tolerance_seconds is None else (
        gap <= int(tolerance_seconds) * 1_000_000)
    return out.select(
        F.col("_k").alias(by), F.col("_ts").alias(left_ts),
        *[F.col(c) for c in lcols],
        *[F.when(keep, F.col(f"_f_{c}")).alias(f"asof_{c}")
          for c in value_cols])


def _grid(archive: DataFrame, interval_seconds: int, key_col: str,
          ts_col: str) -> DataFrame:
    """Regular per-key timestamp grid spanning each key's observed
    range. ``sequence`` + ``explode`` — rows are generated inside the
    executors, grid size is (range/interval) per key."""
    us = int(interval_seconds) * 1_000_000
    span = archive.groupBy(key_col).agg(
        F.min(ts_col).alias("_lo"), F.max(ts_col).alias("_hi"))
    lo = F.unix_micros("_lo") - F.pmod(F.unix_micros("_lo"), F.lit(us))
    hi = F.unix_micros("_hi") - F.pmod(F.unix_micros("_hi"), F.lit(us))
    return span.select(
        key_col,
        F.explode(F.sequence(lo, hi, F.lit(us))).alias("_gus")
    ).select(key_col, F.timestamp_micros("_gus").alias("grid_ts"))


def fill_grid(archive: DataFrame, interval_seconds: int,
              method: str = "locf", key_col: str = "attribute_id",
              ts_col: str = "timestamp",
              value_col: str = "value") -> DataFrame:
    """Resample each key onto a regular grid and fill gaps — the
    engine-side equivalent of the PI ``/interpolated`` endpoint the
    reference's ingest consumes (1-minute interpolated pulls,
    /root/reference/src/pi/extraction/ingest.py:102,236).

    ``method='locf'``: last observation carried forward.
    ``method='linear'``: linear interpolation between the nearest
    observations before/after the grid point; endpoints fall back to
    the one-sided neighbor (LOCF/NOCB).

    Observations landing between grid points are snapped to their
    bucket's first value (matching 1-min-aligned source data exactly).
    One shuffle on the key; two windows per key partition.
    """
    if method not in ("locf", "linear"):
        raise ValueError(f"unknown fill method: {method}")
    obs = (archive
           .groupBy(F.col(key_col).alias(key_col),
                    time_bucket(ts_col, interval_seconds).alias("grid_ts"))
           .agg(F.min_by(value_col, ts_col).alias("_obs")))
    grid = _grid(archive, interval_seconds, key_col, ts_col)
    joined = grid.join(obs, [key_col, "grid_ts"], "left")
    wb = (Window.partitionBy(key_col).orderBy("grid_ts")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    prev_v = F.last("_obs", ignorenulls=True).over(wb)
    if method == "locf":
        return joined.select(
            key_col, "grid_ts", prev_v.alias("filled_value"))
    # "first non-null at-or-after" as a RUNNING frame over descending
    # order: Spark executes [current, unbounded following) frames by
    # rescanning to the partition end for every row — O(rows²) per key
    # (64 s vs 2.6 s for the LOCF path at sf0.1). The reversed running
    # frame is the same value computed in O(rows).
    wf = (Window.partitionBy(key_col).orderBy(F.desc("grid_ts"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    prev_t = F.last(F.when(F.col("_obs").isNotNull(),
                           F.unix_micros("grid_ts")),
                    ignorenulls=True).over(wb)
    next_v = F.last("_obs", ignorenulls=True).over(wf)
    next_t = F.last(F.when(F.col("_obs").isNotNull(),
                           F.unix_micros("grid_ts")),
                    ignorenulls=True).over(wf)
    t = F.unix_micros("grid_ts")
    interp = F.when(
        prev_v.isNull(), next_v
    ).when(
        next_v.isNull() | (next_t == prev_t), prev_v
    ).otherwise(
        prev_v + (next_v - prev_v) * (t - prev_t) / (next_t - prev_t))
    # no rounding: the fill is a deterministic per-row IEEE expression
    # (no aggregation-order variance), so raw doubles are reproducible
    # bit-for-bit — rounding would only introduce half-way-tie skew
    # between engines' rounding rules
    return joined.select(
        key_col, "grid_ts", interp.alias("filled_value"))


def rolling_anomaly(archive: DataFrame, window_rows: int = 10,
                    z_threshold: float = 3.0,
                    key_col: str = "attribute_id",
                    ts_col: str = "timestamp", value_col: str = "value",
                    round_dp: int = 6) -> DataFrame:
    """Early-warning rolling statistics: per key, trailing-window mean
    and population stddev over the previous ``window_rows`` rows
    (current row excluded — the forecast baseline), plus the z-score
    and an anomaly flag at ``|z| > z_threshold``.

    This is the "early warning" in the reference's Early Warning
    System name (/root/reference/README.md:21) made concrete: the
    reference stores the data and leaves alerting to operators; the
    engine computes it. Bounded window per key → constant state,
    single shuffle on the key."""
    # (ts, value) order: a bare ts sort leaves the frame contents
    # nondeterministic on duplicate timestamps (the cusum/SPC rule,
    # applied here too)
    w = (Window.partitionBy(key_col).orderBy(ts_col, value_col)
         .rowsBetween(-window_rows, -1))
    mean = F.avg(value_col).over(w)
    # population stddev via E[x²]−E[x]² in one pass over the frame
    var = F.avg(F.col(value_col) * F.col(value_col)).over(w) - mean * mean
    sd = F.sqrt(F.greatest(var, F.lit(0.0)))
    n = F.count(value_col).over(w)
    z = F.when(sd > 0, (F.col(value_col) - mean) / sd)
    return archive.select(
        key_col, ts_col, value_col,
        F.round(mean, round_dp).alias("roll_mean"),
        F.round(sd, round_dp).alias("roll_sd"),
        F.round(z, round_dp).alias("zscore"),
        ((n >= F.lit(window_rows)) & (F.abs(z) > F.lit(z_threshold)))
        .cast("boolean").alias("is_anomaly"))


def trend_slopes(archive: DataFrame, key_col: str = "attribute_id",
                 ts_col: str = "timestamp", value_col: str = "value",
                 round_dp: int = 6) -> DataFrame:
    """Per-key OLS linear trend (slope per second + intercept) of value
    over time — drift detection for the Early Warning use case.

    Numerics: x = exact integer MICROSECONDS since the key's first
    observation (no division, no rounding), y in DECIMAL — all five
    OLS sums (n, Σx, Σy, Σxy, Σx²) are then EXACT and order-
    independent, so the distributed aggregation matches a serial
    oracle bit-for-bit; only the final slope/intercept division runs
    in IEEE double (slope rescaled ×1e6 to per-second). One small
    self-agg join (min ts per key) + one grouped aggregation — two
    key-shuffles total, no window.
    """
    x0 = (archive.groupBy(key_col)
          .agg(F.min(F.unix_micros(F.col(ts_col))).alias("_t0")))
    d = (archive.join(x0, key_col)
         .select(
             key_col,
             (F.unix_micros(F.col(ts_col)) - F.col("_t0"))
             .cast("decimal(16,0)").alias("_x"),
             F.col(value_col).cast("decimal(18,6)").alias("_y")))
    agg = (d.groupBy(key_col)
           .agg(F.count("*").cast("decimal(12,0)").alias("_n"),
                F.sum("_x").alias("_sx"), F.sum("_y").alias("_sy"),
                F.sum(F.col("_x") * F.col("_y")).alias("_sxy"),
                F.sum(F.col("_x") * F.col("_x")).alias("_sxx")))
    # exact decimal sums → double ONCE each, then combine in IEEE
    # double (same op sequence as the oracle ⇒ bit-identical); a
    # decimal n·Σxy product would hit the precision-38 cap and round
    # differently per engine
    nD, sxD, syD, sxyD, sxxD = (F.col(c).cast("double") for c in
                                ("_n", "_sx", "_sy", "_sxy", "_sxx"))
    num = nD * sxyD - sxD * syD
    den = nD * sxxD - sxD * sxD
    slope_us = num / den                      # per-microsecond
    intercept = (syD - slope_us * sxD) / nD
    # + 0.0 normalizes IEEE negative zero: a slope that rounds to
    # -0.0 here may round to +0.0 in another engine (or vice versa)
    # and equality-passes but byte-hash-fails; -0.0 + 0.0 == +0.0
    return agg.select(
        key_col,
        F.col("_n").cast("long").alias("n"),
        (F.round(slope_us * F.lit(1_000_000.0), round_dp) + F.lit(0.0))
        .alias("slope_per_sec"),
        (F.round(intercept, round_dp) + F.lit(0.0)).alias("intercept"))


def seasonal_baseline(archive: DataFrame, interval_seconds: int = 3600,
                      period_buckets: int = 24,
                      key_col: str = "attribute_id",
                      ts_col: str = "timestamp",
                      value_col: str = "value",
                      round_dp: int = 6) -> DataFrame:
    """Seasonal-naive forecast backtest: predict each rollup bucket
    from the bucket one period (default 24 h) earlier and score MAE /
    bias per key. The baseline every fancier forecaster must beat —
    and the standing data-quality monitor an industrial historian
    runs over every tag.

    An equality self-join on (key, bucket − period) rather than a
    dense-series ``lag``: gaps in the series honestly produce no
    forecast instead of silently comparing against the wrong bucket.
    Both sides share the (key, bucket) shuffle; the scorer is one
    partial-aggable groupBy(key)."""
    r = rollup(archive, interval_seconds, key_col, ts_col, value_col,
               round_dp).select(key_col, "bucket_ts", "avg_value")
    us = period_buckets * interval_seconds * 1_000_000
    base = r.select(
        F.col(key_col),
        F.timestamp_micros(F.unix_micros("bucket_ts") + F.lit(us))
        .alias("bucket_ts"),
        F.col("avg_value").alias("forecast"))
    scored = r.join(base, [key_col, "bucket_ts"])
    err = F.col("avg_value") - F.col("forecast")
    return (scored.groupBy(key_col)
            .agg(F.count("*").alias("n_scored"),
                 F.round(F.avg(F.abs(err)), round_dp).alias("mae"),
                 F.round(F.avg(err), round_dp).alias("bias")))


def roc_alarms(archive: DataFrame, threshold: float,
               key_col: str = "attribute_id", ts_col: str = "timestamp",
               value_col: str = "value",
               round_dp: int = 6) -> DataFrame:
    """Rate-of-change alarm sweep: flag consecutive-reading jumps with
    |Δvalue| > threshold per key — the classic historian alarm rule,
    run retrospectively over raw archive history. One window per key
    (bounded state, parallel across keys), one groupBy."""
    w = Window.partitionBy(key_col).orderBy(ts_col, value_col)
    delta = F.col(value_col) - F.lag(value_col).over(w)
    alarms = (archive
              .withColumn("_ad", F.abs(delta))
              .where(F.col("_ad") > threshold))
    return (alarms.groupBy(key_col)
            .agg(F.count("*").alias("n_alarms"),
                 F.min(ts_col).alias("first_alarm_ts"),
                 F.max(ts_col).alias("last_alarm_ts"),
                 F.round(F.max("_ad"), round_dp).alias("max_abs_delta")))


def cusum_alarms(archive: DataFrame, slack: float = 0.5,
                 h_sigmas: float = 4.0, key_col: str = "attribute_id",
                 ts_col: str = "timestamp", value_col: str = "value",
                 round_dp: int = 6) -> DataFrame:
    """Two-sided CUSUM control chart per key — the classic
    process-drift detector an Early Warning historian runs on every
    tag (Page 1954). Emits rows where either side's statistic crosses
    ``h = h_sigmas·σ``: (key, ts, value, s_hi, s_lo, side).

    The textbook recurrence S⁺_t = max(0, S⁺_{t-1} + y_t) is NOT a
    window aggregate, but its closed form is: with C_t = Σ_{j≤t} y_j,
    S⁺_t = C_t − min_{j≤t} C_j. So both sides become running-sum −
    running-extremum — two ordinary window functions over one sort,
    one shuffle on the key, no recursion/UDF. Window frames evaluate
    sequentially over the sorted partition, so the double arithmetic
    is order-deterministic (unlike a commutative groupBy sum).

    μ and σ are the key's own full-series mean / population stddev
    (exact decimal sum → one double division; E[x²]−E[x]² with exact
    decimal sums), the standard self-calibrated chart; y_t =
    x_t − μ ∓ slack·σ.
    """
    dec = F.col(value_col).cast("decimal(28,6)")
    stats = (archive.groupBy(key_col)
             .agg((F.sum(dec).cast("double") / F.count("*"))
                  .alias("_mu"),
                  (F.sum((dec * dec).cast("decimal(38,12)"))
                   .cast("double") / F.count("*")).alias("_ex2")))
    stats = stats.select(
        key_col, "_mu",
        F.sqrt(F.greatest(F.col("_ex2") - F.col("_mu") * F.col("_mu"),
                          F.lit(0.0))).alias("_sd"))
    # value as tiebreak: rows tied on ts get a deterministic total
    # order in both engines (exact (ts,value) dups are interchangeable
    # — swapping them permutes identical output rows)
    w = (Window.partitionBy(key_col).orderBy(ts_col, value_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    d = archive.join(stats, key_col)
    y_hi = F.col(value_col) - F.col("_mu") - F.lit(slack) * F.col("_sd")
    y_lo = F.col(value_col) - F.col("_mu") + F.lit(slack) * F.col("_sd")
    c_hi = F.sum(y_hi).over(w)
    c_lo = F.sum(y_lo).over(w)
    s_hi = c_hi - F.min(c_hi).over(w)
    s_lo = F.max(c_lo).over(w) - c_lo
    out = d.select(
        key_col, ts_col, value_col,
        (F.round(s_hi, round_dp) + F.lit(0.0)).alias("s_hi"),
        (F.round(s_lo, round_dp) + F.lit(0.0)).alias("s_lo"),
        (F.lit(h_sigmas) * F.col("_sd")).alias("_h"))
    return (out.where((F.col("s_hi") > F.col("_h"))
                      | (F.col("s_lo") > F.col("_h")))
            .select(key_col, ts_col, value_col, "s_hi", "s_lo",
                    F.when(F.col("s_hi") >= F.col("s_lo"), "high")
                    .otherwise("low").alias("side")))


def spc_rule_alarms(archive: DataFrame, key_col: str = "attribute_id",
                    ts_col: str = "timestamp", value_col: str = "value",
                    round_dp: int = 6) -> DataFrame:
    """Western Electric run rules over a Shewhart chart — the
    classical SPC alarm set an Early Warning system evaluates on
    every tag, as pure window arithmetic:

      r1: the point is beyond 3σ;
      r2: ≥2 of the last 3 points beyond 2σ on the SAME side;
      r3: ≥4 of the last 5 points beyond 1σ on the same side;
      r4: 8 consecutive points on the same side of the mean.

    z-scores come from the tag's own exact-decimal μ/σ (the
    :func:`cusum_alarms` discipline). Every rule is a rolling COUNT
    of integer side indicators — no floats accumulate, so the rule
    verdicts are bit-stable on any engine; only the reported z is
    floating, rounded and −0.0-normalized. One shuffle on the key.
    Emits only rows that fire at least one rule.
    """
    dec = F.col(value_col).cast("decimal(28,6)")
    stats = (archive.groupBy(key_col)
             .agg((F.sum(dec).cast("double") / F.count("*"))
                  .alias("_mu"),
                  (F.sum((dec * dec).cast("decimal(38,12)"))
                   .cast("double") / F.count("*")).alias("_ex2")))
    stats = stats.select(
        key_col, "_mu",
        F.sqrt(F.greatest(F.col("_ex2") - F.col("_mu") * F.col("_mu"),
                          F.lit(0.0))).alias("_sd"))
    d = archive.join(stats, key_col)
    z = (F.col(value_col) - F.col("_mu")) / F.col("_sd")
    d = d.withColumn("_z", z)
    # integer side indicators — the rolling counts never touch floats
    up1, dn1 = (F.col("_z") > 1).cast("int"), (F.col("_z") < -1).cast("int")
    up2, dn2 = (F.col("_z") > 2).cast("int"), (F.col("_z") < -2).cast("int")
    up0, dn0 = (F.col("_z") > 0).cast("int"), (F.col("_z") < 0).cast("int")
    w3 = (Window.partitionBy(key_col).orderBy(ts_col, value_col)
          .rowsBetween(-2, 0))
    w5 = (Window.partitionBy(key_col).orderBy(ts_col, value_col)
          .rowsBetween(-4, 0))
    w8 = (Window.partitionBy(key_col).orderBy(ts_col, value_col)
          .rowsBetween(-7, 0))
    out = d.select(
        key_col, ts_col, value_col,
        (F.round(F.col("_z"), round_dp) + F.lit(0.0)).alias("zscore"),
        (F.abs(F.col("_z")) > 3).alias("r1_beyond_3s"),
        ((F.sum(up2).over(w3) >= 2) | (F.sum(dn2).over(w3) >= 2))
        .alias("r2_two_of_three_2s"),
        ((F.sum(up1).over(w5) >= 4) | (F.sum(dn1).over(w5) >= 4))
        .alias("r3_four_of_five_1s"),
        ((F.sum(up0).over(w8) >= 8) | (F.sum(dn0).over(w8) >= 8))
        .alias("r4_eight_one_side"))
    return out.where(F.col("r1_beyond_3s") | F.col("r2_two_of_three_2s")
                     | F.col("r3_four_of_five_1s")
                     | F.col("r4_eight_one_side"))


def tag_correlation(archive: DataFrame, ref_key: int,
                    interval_seconds: int = 3600,
                    key_col: str = "attribute_id",
                    ts_col: str = "timestamp", value_col: str = "value",
                    min_buckets: int = 24,
                    round_dp: int = 6) -> DataFrame:
    """Which sensors track sensor ``ref_key``: Pearson r between each
    tag and the reference over ALIGNED fixed-interval buckets (bucket
    averages, inner-joined on the bucket so only co-observed hours
    count). The plant-analytics staple for redundancy discovery and
    virtual-sensor candidates.

    Linear in tags — each tag joins the broadcast reference series,
    never tag×tag pairs. All five correlation sums run in exact
    DECIMAL over the 6-dp bucket means, so the per-tag aggregation is
    merge-order independent; only the final r is IEEE (single
    deterministic expression), rounded and −0.0-normalized. Tags
    sharing fewer than ``min_buckets`` aligned buckets are dropped
    (spurious r on tiny overlap).
    """
    mean_dec = (F.sum(F.col(value_col).cast("decimal(28,6)"))
                .cast("double") / F.count("*"))
    buckets = (archive.groupBy(
        F.col(key_col).alias(key_col),
        time_bucket(ts_col, interval_seconds).alias("_b"))
        .agg(F.round(mean_dec, 6).cast("decimal(18,6)").alias("_v")))
    ref = (buckets.where(F.col(key_col) == ref_key)
           .select("_b", F.col("_v").alias("_r")))
    j = buckets.where(F.col(key_col) != ref_key) \
        .join(F.broadcast(ref), "_b")
    agg = (j.groupBy(key_col)
           .agg(F.count("*").alias("n_buckets"),
                F.sum("_v").alias("_sx"), F.sum("_r").alias("_sy"),
                F.sum(F.col("_v") * F.col("_r")).alias("_sxy"),
                F.sum(F.col("_v") * F.col("_v")).alias("_sxx"),
                F.sum(F.col("_r") * F.col("_r")).alias("_syy")))
    nD, sx, sy, sxy, sxx, syy = (F.col(c).cast("double") for c in
                                 ("n_buckets", "_sx", "_sy", "_sxy",
                                  "_sxx", "_syy"))
    num = nD * sxy - sx * sy
    den = F.sqrt(nD * sxx - sx * sx) * F.sqrt(nD * syy - sy * sy)
    r = F.when(den > 0, num / den)
    return (agg.where(F.col("n_buckets") >= min_buckets)
            .select(key_col, F.col("n_buckets").cast("long")
                    .alias("n_buckets"),
                    (F.round(r, round_dp) + F.lit(0.0))
                    .alias("pearson_r")))


def ewma(archive: DataFrame, alpha: float = 0.25,
         key_col: str = "attribute_id", ts_col: str = "timestamp",
         val_col: str = "value") -> DataFrame:
    """EWMA smoother per tag — the third classic control chart next to
    CUSUM (q142) and the Western Electric rules (q143): s_t = α·x_t +
    (1−α)·s_{t−1}, seeded with the first observation.

    The recursion is inherently order-dependent, so this is the
    legitimate applyInPandas case: one sequential float64 pass WITHIN
    each tag (state = one float), full parallelism ACROSS tags — at
    100 TB the cost profile is a keyed shuffle plus a linear scan per
    tag, exactly like any stateful per-key pass. The Python loop
    performs the same IEEE op sequence (α·x, (1−α)·s, add) a
    recursive-CTE oracle replays, measured bit-identical; rows order
    by (ts, value) so exact-duplicate timestamps cannot wobble the
    order (equal values commute through the recursion).

    Closed-form window alternatives ((1−α)^(t−i) sums) overflow
    double for long series and truncation changes bits — rejected.
    """
    import pandas as pd  # noqa: F401  (worker-side)

    a = float(alpha)
    schema = (f"{key_col} long, {ts_col} timestamp, "
              f"{val_col} double, ewma double")

    def fn(pdf):
        pdf = pdf.sort_values([ts_col, val_col])
        s, out = None, []
        for v in pdf[val_col].astype(float):
            s = v if s is None else a * v + (1.0 - a) * s
            out.append(s)
        pdf = pdf.assign(ewma=out)
        return pdf[[key_col, ts_col, val_col, "ewma"]]

    return archive.groupBy(key_col).applyInPandas(fn, schema)


def peak_concurrency(intervals: DataFrame,
                     key_col: str = "event_type",
                     s_col: str = "s_us",
                     e_col: str = "e_us") -> DataFrame:
    """Maximum number of simultaneously-open intervals per key, and
    the earliest instant that maximum is reached — the load/staffing
    statistic (how many alarms were active at the worst moment). The
    complement of q189's union-coverage: that measures covered TIME,
    this measures peak DEPTH.

    Classic sweep line: each interval emits (+1 at s) and (−1 at e),
    a running sum ordered by (time, delta) — ends sort before starts
    at the same instant, matching half-open [s, e) — and the per-key
    max of that sum is the peak. One shuffle on the key, one window
    inside it; integer arithmetic end to end.
    """
    deltas = intervals.select(
        key_col, F.col(s_col).alias("_t"), F.lit(1).alias("_d")
    ).unionByName(intervals.select(
        key_col, F.col(e_col).alias("_t"), F.lit(-1).alias("_d")))
    w = (Window.partitionBy(key_col).orderBy("_t", "_d")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    depth = deltas.select(key_col, "_t",
                          F.sum("_d").over(w).alias("_depth"))
    # earliest instant AT the peak: per-key max as a second window
    # (no frame → whole partition), then min(t) among peak rows —
    # deterministic on ties, mirrors 1:1 as a join+filter in SQL
    peak = F.max("_depth").over(Window.partitionBy(key_col))
    return (depth.withColumn("_peak", peak)
            .where(F.col("_depth") == F.col("_peak"))
            .groupBy(key_col)
            .agg(F.max("_peak").cast("long").alias("peak"),
                 F.min("_t").alias("peak_at_us")))
