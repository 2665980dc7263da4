"""Unit semantics for the time-series operators (rollup / as-of /
gap-fill / rolling anomaly) on hand-built rows, plus the plan property
that the as-of join never degenerates into a cartesian/range join."""

import io
import contextlib
from datetime import datetime

import pytest
from pyspark.sql import functions as F

from industrial_data_pipeline_spark.operators import timeseries as TS

T = datetime


def _arch(spark, rows):
    return spark.createDataFrame(
        rows, "attribute_id long, timestamp timestamp, value double")


@pytest.fixture()
def arch(spark):
    # key 1: 00:10, 00:50, 01:10 (bucket boundary exercised), key 2: one row
    return _arch(spark, [
        (1, T(2025, 1, 1, 0, 10), 10.0),
        (1, T(2025, 1, 1, 0, 50), 20.0),
        (1, T(2025, 1, 1, 1, 10), 40.0),
        (2, T(2025, 1, 1, 0, 30), 5.0),
    ])


def test_time_bucket_boundary(spark):
    df = spark.range(1).select(
        TS.time_bucket(F.lit("2025-01-01 01:00:00").cast("timestamp"),
                       3600).alias("exact"),
        TS.time_bucket(F.lit("2025-01-01 01:59:59.999999")
                       .cast("timestamp"), 3600).alias("within"))
    r = df.first()
    assert r.exact == T(2025, 1, 1, 1, 0) == r.within


def test_rollup_hourly(arch):
    out = {(r.attribute_id, r.bucket_ts): r
           for r in TS.rollup(arch, 3600).collect()}
    assert len(out) == 3
    b0 = out[(1, T(2025, 1, 1, 0, 0))]
    assert (b0.avg_value, b0.min_value, b0.max_value, b0.n_values,
            b0.first_value, b0.last_value) == (15.0, 10.0, 20.0, 2,
                                               10.0, 20.0)
    assert out[(1, T(2025, 1, 1, 1, 0))].n_values == 1
    assert out[(2, T(2025, 1, 1, 0, 0))].avg_value == 5.0


def test_asof_join_basic(spark, arch):
    left = _arch(spark, [
        (1, T(2025, 1, 1, 0, 50), 99.0),   # equal ts → matches 20.0
        (1, T(2025, 1, 1, 0, 55), 99.0),   # between → still 20.0
        (1, T(2025, 1, 1, 0, 5), 99.0),    # before first right row → null
        (2, T(2025, 1, 1, 2, 0), 99.0),    # long gap → 5.0
        (3, T(2025, 1, 1, 0, 30), 99.0),   # key absent on right → null
    ])
    got = {(r.attribute_id, r.timestamp): r.asof_value
           for r in TS.asof_join(left, arch, by="attribute_id").collect()}
    assert got[(1, T(2025, 1, 1, 0, 50))] == 20.0
    assert got[(1, T(2025, 1, 1, 0, 55))] == 20.0
    assert got[(1, T(2025, 1, 1, 0, 5))] is None
    assert got[(2, T(2025, 1, 1, 2, 0))] == 5.0
    assert got[(3, T(2025, 1, 1, 0, 30))] is None


def test_asof_join_tolerance(spark, arch):
    left = _arch(spark, [
        (2, T(2025, 1, 1, 0, 40), 99.0),   # 10 min stale → within
        (2, T(2025, 1, 1, 2, 0), 99.0),    # 90 min stale → nulled
    ])
    got = {r.timestamp: r.asof_value
           for r in TS.asof_join(left, arch, by="attribute_id",
                                 tolerance_seconds=3600).collect()}
    assert got[T(2025, 1, 1, 0, 40)] == 5.0
    assert got[T(2025, 1, 1, 2, 0)] is None


def test_asof_join_plan_no_cartesian(spark, arch):
    df = TS.asof_join(arch, arch, by="attribute_id")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    p = buf.getvalue()
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_fill_locf(spark):
    a = _arch(spark, [(1, T(2025, 1, 1, 0, 30), 10.0),
                      (1, T(2025, 1, 1, 3, 30), 40.0)])
    got = {r.grid_ts: r.filled_value
           for r in TS.fill_grid(a, 3600, "locf").collect()}
    assert got == {T(2025, 1, 1, 0, 0): 10.0, T(2025, 1, 1, 1, 0): 10.0,
                   T(2025, 1, 1, 2, 0): 10.0, T(2025, 1, 1, 3, 0): 40.0}


def test_fill_linear(spark):
    a = _arch(spark, [(1, T(2025, 1, 1, 0, 0), 10.0),
                      (1, T(2025, 1, 1, 3, 0), 40.0)])
    got = {r.grid_ts: r.filled_value
           for r in TS.fill_grid(a, 3600, "linear").collect()}
    assert got == {T(2025, 1, 1, 0, 0): 10.0, T(2025, 1, 1, 1, 0): 20.0,
                   T(2025, 1, 1, 2, 0): 30.0, T(2025, 1, 1, 3, 0): 40.0}


def test_fill_linear_endpoints_one_sided(spark):
    # gap before the first obs bucket can't happen (grid starts at it),
    # but a null tail after the last obs must LOCF, and a single-obs
    # key must emit its value
    a = _arch(spark, [(1, T(2025, 1, 1, 0, 30), 7.0)])
    got = TS.fill_grid(a, 3600, "linear").collect()
    assert [(r.grid_ts, r.filled_value) for r in got] == [
        (T(2025, 1, 1, 0, 0), 7.0)]


def test_fill_rejects_unknown_method(spark, arch):
    with pytest.raises(ValueError):
        TS.fill_grid(arch, 3600, "cubic")


def test_rolling_anomaly_flags_spike(spark):
    rows = [(1, T(2025, 1, 1, 0, m), 10.0) for m in range(12)]
    rows[11] = (1, T(2025, 1, 1, 0, 11), 10.5)  # σ=0 window → z null
    rows.append((1, T(2025, 1, 1, 0, 12), 50.0))  # spike vs tiny σ
    out = sorted(TS.rolling_anomaly(_arch(spark, rows), 10, 3.0).collect(),
                 key=lambda r: r.timestamp)
    assert out[0].roll_mean is None          # empty trailing window
    assert out[5].roll_sd == 0.0 and out[5].zscore is None
    assert out[5].is_anomaly is False        # n < window_rows
    spike = out[-1]
    assert spike.is_anomaly is True and spike.zscore > 3.0
    flagged = [r for r in out if r.is_anomaly]
    assert flagged == [spike]


def test_trend_slopes_exact_line(spark):
    # key 1: y = 2x + 3 over x = 0,60,120 s → slope 2/s, intercept 3;
    # key 2: constant → slope 0, intercept = the value
    df = _arch(spark, [
        (1, T(2025, 1, 1, 0, 0, 0), 3.0),
        (1, T(2025, 1, 1, 0, 1, 0), 123.0),
        (1, T(2025, 1, 1, 0, 2, 0), 243.0),
        (2, T(2025, 1, 1, 0, 0, 0), 7.5),
        (2, T(2025, 1, 1, 0, 5, 0), 7.5),
    ])
    out = {r.attribute_id: r for r in TS.trend_slopes(df).collect()}
    assert out[1].n == 3
    assert out[1].slope_per_sec == pytest.approx(2.0)
    assert out[1].intercept == pytest.approx(3.0)
    assert out[2].slope_per_sec == 0.0
    assert out[2].intercept == pytest.approx(7.5)


def test_trend_slopes_noisy_matches_numpy(spark):
    import numpy as np
    from datetime import timedelta
    ts = [T(2025, 1, 1) + timedelta(seconds=i * 7) for i in range(20)]
    ys = [((i * 37) % 11) * 0.25 + 0.1 * i for i in range(20)]
    df = _arch(spark, [(1, t, y) for t, y in zip(ts, ys)])
    r = TS.trend_slopes(df).first()
    x = np.array([(t - ts[0]).total_seconds() for t in ts])
    slope, intercept = np.polyfit(x, np.array(ys), 1)
    assert r.slope_per_sec == pytest.approx(round(slope, 6), abs=1e-6)
    assert r.intercept == pytest.approx(round(intercept, 6), abs=1e-6)


def test_asof_forward_direction(spark):
    from datetime import datetime
    from industrial_data_pipeline_spark.operators.timeseries import (
        asof_join)
    left = spark.createDataFrame(
        [(1, datetime(2024, 1, 1, 0, 30), 1.0)],
        "attribute_id long, timestamp timestamp, value double")
    right = spark.createDataFrame(
        [(1, datetime(2024, 1, 1, 0, 0), 10.0),
         (1, datetime(2024, 1, 1, 1, 0), 20.0),
         (1, datetime(2024, 1, 1, 2, 0), 30.0)],
        "attribute_id long, timestamp timestamp, value double")
    back = asof_join(left, right, by="attribute_id").collect()[0]
    fwd = asof_join(left, right, by="attribute_id",
                    direction="forward").collect()[0]
    assert back.asof_value == 10.0  # latest at-or-before 00:30
    assert fwd.asof_value == 20.0   # earliest at-or-after 00:30


def test_cusum_detects_level_shift(spark):
    """Flat series then a +10 step: the high-side CUSUM must alarm
    after the shift and name the 'high' side; closed form
    S+ = runsum - runmin checked against the textbook recurrence."""
    from datetime import datetime, timedelta
    from industrial_data_pipeline_spark.operators.timeseries import (
        cusum_alarms)
    t0 = datetime(2025, 1, 1)
    vals = [0.0, 0.1, -0.1, 0.0, 0.1, -0.1] * 5 + [10.0] * 6
    rows = [(1, t0 + timedelta(minutes=i), v)
            for i, v in enumerate(vals)]
    df = spark.createDataFrame(
        rows, "attribute_id long, timestamp timestamp, value double")
    out = cusum_alarms(df, slack=0.5, h_sigmas=2.0).collect()
    assert out, "step shift must raise alarms"
    assert all(r.side == "high" for r in out)
    # alarms only after the step lands
    assert min(r.timestamp for r in out) >= t0 + timedelta(minutes=30)
    # replay the textbook recurrence for the flagged rows
    import statistics
    mu = statistics.fmean(vals)
    sd = statistics.pstdev(vals)
    s, expect = 0.0, {}
    for i, v in enumerate(vals):
        s = max(0.0, s + (v - mu - 0.5 * sd))
        expect[t0 + timedelta(minutes=i)] = s
    for r in out:
        assert abs(expect[r.timestamp] - r.s_hi) < 1e-6


def test_spc_rules_hand_built_patterns(spark):
    """Synthetic series with one planted pattern per rule; each rule
    must fire exactly where constructed."""
    from datetime import datetime, timedelta
    from industrial_data_pipeline_spark.operators.timeseries import (
        spc_rule_alarms)
    t0 = datetime(2025, 1, 1)
    # base: alternating mild noise keeps mu~0, sd modest; then:
    #  - a single huge spike (r1)
    #  - two of three beyond 2 sigma (r2)
    #  - eight consecutive slightly-positive points (r4)
    vals = [1.0, -1.0] * 20
    vals += [30.0]                 # r1 spike (also r2 contributor)
    vals += [-1.0, 14.0, 14.0]     # r2: 2 of 3 beyond 2s (high side)
    vals += [0.5] * 8              # r4: 8 on one side of mean
    rows = [(1, t0 + timedelta(minutes=i), v)
            for i, v in enumerate(vals)]
    df = spark.createDataFrame(
        rows, "attribute_id long, timestamp timestamp, value double")
    out = {r.timestamp: r for r in spc_rule_alarms(df).collect()}
    i_spike = len([1.0, -1.0] * 20)
    t_spike = t0 + timedelta(minutes=i_spike)
    assert out[t_spike].r1_beyond_3s
    t_r2 = t0 + timedelta(minutes=i_spike + 3)   # second 14.0
    assert out[t_r2].r2_two_of_three_2s
    t_r4 = t0 + timedelta(minutes=len(vals) - 1)  # 8th 0.5
    assert out[t_r4].r4_eight_one_side


def test_tag_correlation_hand_computed(spark):
    """Perfectly correlated, anti-correlated, and constant tags vs
    the reference: r = 1, -1, NULL (zero variance)."""
    from datetime import datetime, timedelta
    from industrial_data_pipeline_spark.operators.timeseries import (
        tag_correlation)
    t0 = datetime(2025, 1, 1)
    rows = []
    for d in range(12):
        ts = t0 + timedelta(days=d)
        rows += [(0, ts, float(d)),          # reference ramp
                 (1, ts, 2.0 * d + 5.0),     # affine -> r = 1
                 (2, ts, -3.0 * d),          # negative -> r = -1
                 (3, ts, 7.0)]               # constant -> undefined
    df = spark.createDataFrame(
        rows, "attribute_id long, timestamp timestamp, value double")
    out = {r.attribute_id: r for r in
           tag_correlation(df, ref_key=0, interval_seconds=86400,
                           min_buckets=10).collect()}
    assert out[1].pearson_r == 1.0
    assert out[2].pearson_r == -1.0
    assert out[3].pearson_r is None
    assert all(r.n_buckets == 12 for r in out.values())


def test_ewma_hand_computed(spark):
    from industrial_data_pipeline_spark.operators.timeseries import ewma
    from datetime import datetime as T
    rows = [(1, T(2024, 1, 1, 0, m), float(v))
            for m, v in enumerate([8.0, 4.0, 4.0, 12.0])]
    df = spark.createDataFrame(
        rows, "attribute_id long, timestamp timestamp, value double")
    got = [r.ewma for r in ewma(df, alpha=0.25).orderBy("timestamp")
           .collect()]
    # s0=8; s1=.25*4+.75*8=7; s2=.25*4+.75*7=6.25; s3=.25*12+.75*6.25
    assert got == [8.0, 7.0, 6.25, 0.25 * 12 + 0.75 * 6.25]


def test_ewma_duplicate_ts_commutes(spark):
    """Equal (ts, value) duplicates must not wobble the result: two
    identical readings in either order give the same series."""
    from industrial_data_pipeline_spark.operators.timeseries import ewma
    from datetime import datetime as T
    t = T(2024, 1, 1)
    rows = [(1, t, 5.0), (1, t, 5.0), (1, T(2024, 1, 2), 9.0)]
    df = spark.createDataFrame(
        rows, "attribute_id long, timestamp timestamp, value double")
    got = sorted(r.ewma for r in ewma(df, alpha=0.25).collect())
    assert got == [5.0, 5.0, 0.25 * 9 + 0.75 * 5.0]


def test_peak_concurrency_hand_computed(spark):
    """[0,10) [5,15) [10,20): depth peaks at 2, first reached at t=5;
    half-open means [0,10) and [10,20) are never concurrent."""
    from industrial_data_pipeline_spark.operators.timeseries import (
        peak_concurrency)
    iv = spark.createDataFrame(
        [("a", 0, 10), ("a", 5, 15), ("a", 10, 20),
         ("b", 0, 10), ("b", 10, 20)],
        "event_type string, s_us long, e_us long")
    got = {r.event_type: (r.peak, r.peak_at_us)
           for r in peak_concurrency(iv).collect()}
    assert got == {"a": (2, 5), "b": (1, 0)}


def test_peak_concurrency_matches_brute_force(spark):
    """Random intervals vs a brute-force sweep in Python: peak depth
    and earliest peak instant must agree exactly (half-open [s, e))."""
    import random
    from industrial_data_pipeline_spark.operators.timeseries import (
        peak_concurrency)
    rng = random.Random(11)
    ivs = []
    for k in ("a", "b"):
        for _ in range(60):
            s = rng.randrange(0, 500)
            ivs.append((k, s, s + rng.randrange(1, 80)))
    df = spark.createDataFrame(
        ivs, "event_type string, s_us long, e_us long")
    got = {r.event_type: (r.peak, r.peak_at_us)
           for r in peak_concurrency(df).collect()}
    for k in ("a", "b"):
        mine = [(s, e) for kk, s, e in ivs if kk == k]
        # depth only changes at start points; earliest max start wins
        best = max((sum(1 for s2, e2 in mine if s2 <= t < e2), -t)
                   for t in sorted({s for s, _ in mine}))
        assert got[k] == (best[0], -best[1])
