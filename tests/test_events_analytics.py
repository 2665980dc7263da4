"""Unit semantics for the event-analytics operators on hand-built
rows: session boundaries (gap exactly at / over the threshold,
timestamp ties), top-k tiebreaks, funnel strictness, percentile
interpolation, and sampler determinism/stratification."""

import hashlib
from datetime import datetime

from pyspark.sql import functions as F

from industrial_data_pipeline_spark.operators import events_analytics as EA

T = datetime


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double")


def test_sessionize_gap_boundary(spark):
    # gap == threshold stays in-session; gap > threshold splits
    ev = _events(spark, [
        (1, T(2025, 1, 1, 0, 0), 1, "view", 1.0),
        (2, T(2025, 1, 1, 0, 30), 1, "view", 2.0),     # exactly 30 min
        (3, T(2025, 1, 1, 1, 0, 1), 1, "view", 4.0),   # 30m01s → new
        (4, T(2025, 1, 1, 0, 0), 2, "view", 8.0),
    ])
    out = {(r.user_id, r.session_id): r
           for r in EA.sessionize(ev, 1800).collect()}
    assert len(out) == 3
    s1 = out[(1, 1)]
    assert (s1.n_events, s1.sum_value) == (2, 3.0)
    assert s1.session_start == T(2025, 1, 1, 0, 0)
    assert s1.session_end == T(2025, 1, 1, 0, 30)
    assert out[(1, 2)].n_events == 1
    assert out[(2, 1)].sum_value == 8.0


def test_sessionize_ties_stable(spark):
    ev = _events(spark, [
        (2, T(2025, 1, 1, 0, 0), 1, "view", 1.0),
        (1, T(2025, 1, 1, 0, 0), 1, "view", 1.0),  # tied ts
        (3, T(2025, 1, 1, 2, 0), 1, "view", 1.0),
    ])
    out = sorted(EA.sessionize(ev, 1800).collect(),
                 key=lambda r: r.session_id)
    assert [(r.session_id, r.n_events) for r in out] == [(1, 2), (2, 1)]


def test_top_k_tiebreak(spark):
    ev = _events(spark, [
        (10, T(2025, 1, 1), 1, "a", 5.0),
        (11, T(2025, 1, 1), 1, "a", 5.0),   # tie → lower id first
        (12, T(2025, 1, 1), 1, "a", 9.0),
        (13, T(2025, 1, 1), 1, "a", 1.0),
        (14, T(2025, 1, 1), 1, "b", 2.0),
    ]).select("event_type", "event_id", "value")
    got = [(r.event_type, r.event_id, r.rn)
           for r in EA.top_k_per_group(ev, "event_type", "value", 2,
                                       "event_id")
           .orderBy("event_type", "rn").collect()]
    assert got == [("a", 12, 1), ("a", 10, 2), ("b", 14, 1)]


def test_funnel_strict_order(spark):
    ev = _events(spark, [
        # u1 converts; u2 clicked before viewing; u3 never purchased;
        # u4 view==click timestamp (not strictly after) → not converted
        (1, T(2025, 1, 1, 0), 1, "view", 0.0),
        (2, T(2025, 1, 1, 1), 1, "click", 0.0),
        (3, T(2025, 1, 1, 2), 1, "purchase", 0.0),
        (4, T(2025, 1, 1, 1), 2, "click", 0.0),
        (5, T(2025, 1, 1, 2), 2, "view", 0.0),
        (6, T(2025, 1, 1, 3), 2, "purchase", 0.0),
        (7, T(2025, 1, 1, 0), 3, "view", 0.0),
        (8, T(2025, 1, 1, 1), 3, "click", 0.0),
        (9, T(2025, 1, 1, 0), 4, "view", 0.0),
        (10, T(2025, 1, 1, 0), 4, "click", 0.0),
        (11, T(2025, 1, 1, 1), 4, "purchase", 0.0),
    ])
    got = {r.user_id: r.converted
           for r in EA.funnel(ev, ("view", "click", "purchase"))
           .collect()}
    assert got == {1: True, 2: False, 3: False, 4: False}


def test_grouped_percentiles_interpolation(spark):
    ev = _events(spark, [
        (i, T(2025, 1, 1), 1, "a", v)
        for i, v in enumerate([1.0, 2.0, 3.0, 10.0])
    ])
    r = EA.grouped_percentiles(ev, "event_type", "value",
                               (0.5, 0.75)).first()
    assert (r.n, r.avg_value) == (4, 4.0)
    assert r.p50 == 2.5            # midpoint of 2,3
    assert r.p75 == 4.75           # 3 + 0.25*(10-3)


def test_stratified_sample_matches_python_hash(spark):
    df = spark.range(500).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "en").otherwise("de")
        .alias("lang"))
    got = sorted(r.doc_id for r in EA.stratified_hash_sample(
        df, "doc_id", "lang", {"en": 15}, 40).collect())

    def h(i):
        return int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16)

    want = sorted(i for i in range(500)
                  if h(i) % 100 < (15 if i % 2 == 0 else 40))
    assert got == want and 0 < len(got) < 500


def test_approx_profile_error_bounds(spark):
    """q70 emits its sketch-vs-exact verdicts IN-PLAN (HLL within
    ±10%, GK p50/p95 inside the exact 49/51 / 94/96 envelope); every
    group must report its bounds held, and n_events must match the
    plain count."""
    from industrial_data_pipeline_spark.suite_pipeline import (
        q_approx_profile)
    from industrial_data_pipeline_spark.suite_common import load
    sf = "/root/testdata/sf0.001"
    rows = {r.event_type: r for r in
            q_approx_profile(spark, sf).collect()}
    ev = load(spark, sf, "events")
    exact_n = {r.event_type: r.n for r in
               ev.groupBy("event_type")
               .agg(F.count("*").alias("n")).collect()}
    assert set(rows) == set(exact_n)
    for et, r in rows.items():
        assert r.n_events == exact_n[et]
        assert r.approx_users_ok and r.p50_ok and r.p95_ok, (et, r)


def test_winsorized_stats_clamps_outliers(spark):
    from industrial_data_pipeline_spark.operators.events_analytics import (
        winsorized_stats)
    # 20 values 1..19 plus one wild outlier 1000: p95 bound = rank
    # ceil(.95*20)=19 → 19th smallest = 19; p05 = rank 1 → value 1
    rows = [("a", i, float(v)) for i, v in enumerate(
        list(range(1, 20)) + [1000])]
    df = spark.createDataFrame(
        rows, "event_type string, event_id long, value double")
    out = winsorized_stats(df).collect()
    assert len(out) == 1
    r = out[0]
    assert r.p_lo == 1.0 and r.p_hi == 19.0
    assert r.n_clipped == 1  # only the outlier clamps (1000 → 19)
    expect = (sum(range(1, 20)) + 19) / 20.0
    assert abs(r.robust_mean - expect) < 1e-6
    assert r.n_events == 20


def test_shard_assignment_deterministic_and_balanced(spark):
    from industrial_data_pipeline_spark.operators.text import (
        shard_assignment)
    docs = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"))
    a = shard_assignment(docs).collect()
    b = shard_assignment(docs).collect()
    assert {(r.doc_id, r.shard) for r in a} == \
        {(r.doc_id, r.shard) for r in b}
    sizes = {}
    for r in a:
        assert 0 <= r.shard < 8
        sizes[r.shard] = sizes.get(r.shard, 0) + 1
    assert len(sizes) == 8
    assert max(sizes.values()) < 2 * min(sizes.values())


def test_chi_square_independence_hand_computed(spark):
    """2x2 table [[10, 20], [30, 40]]: expected = rt*ct/100, term =
    (o-e)^2/e — checked against the hand arithmetic."""
    from industrial_data_pipeline_spark.operators.events_analytics import (
        chi_square_independence)
    rows = ([("a", 0)] * 10 + [("a", 1)] * 20
            + [("b", 0)] * 30 + [("b", 1)] * 40)
    df = spark.createDataFrame(rows, "r string, c long")
    got = {(x.r, x.c): x for x in
           chi_square_independence(df, "r", "c").collect()}
    e_a0 = 30 * 40 / 100.0
    assert got[("a", 0)].observed == 10
    assert got[("a", 0)].expected == e_a0
    assert got[("a", 0)].chi2_term == (10 - e_a0) ** 2 / e_a0
    assert got[("b", 1)].expected == 70 * 60 / 100.0


def test_temperature_mix_copy_law(spark):
    """temperature_mix (q268): the dominant domain stays at exactly
    one copy, a 4x-smaller domain gets sqrt(4)=2 copies exactly (no
    fractional part — hash plays no role), every doc appears at
    least once, and the realized counts are deterministic."""
    from industrial_data_pipeline_spark.operators.text import (
        temperature_mix)
    rows = [(i, "big") for i in range(16)] + \
           [(100 + i, "small") for i in range(4)]
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    out = temperature_mix(docs, id_col="doc_id",
                          domain_col="source").collect()
    per_doc = {}
    for r in out:
        per_doc.setdefault(r.doc_id, []).append(r.copy_idx)
    # every doc present, copy_idx dense from 0
    assert set(per_doc) == {i for i in range(16)} | \
        {100 + i for i in range(4)}
    for d, idxs in per_doc.items():
        assert sorted(idxs) == list(range(len(idxs)))
        assert len(idxs) == (1 if d < 100 else 2)
    again = temperature_mix(docs, id_col="doc_id",
                            domain_col="source").collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, out))


def test_temperature_mix_fractional_copies_expected_rate(spark):
    """The fractional copy is hash-realized: with ratio 16/9 the
    copy count is sqrt(16/9)=4/3 — every small-domain doc gets 1
    copy plus a ~1/3-rate hash-gated extra; the mean realized copy
    count over many ids lands near 4/3 and is reproducible."""
    from industrial_data_pipeline_spark.operators.text import (
        temperature_mix)
    rows = [(i, "big") for i in range(1600)] + \
           [(10_000 + i, "small") for i in range(900)]
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    out = temperature_mix(docs, id_col="doc_id",
                          domain_col="source")
    n_small = (out.where("source = 'small'")
               .groupBy("doc_id").count().collect())
    assert all(r["count"] in (1, 2) for r in n_small)
    mean = sum(r["count"] for r in n_small) / len(n_small)
    assert abs(mean - 4 / 3) < 0.05  # hash-uniformity, not RNG
