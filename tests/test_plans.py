"""Physical-plan regression checks: the scale properties we rely on
(predicate pushdown into parquet, partition pruning on the archive's
date partitions, broadcast dimension joins) must survive refactors —
these are the properties that matter at 100 TB, asserted on .explain
output."""

import io
import contextlib
from datetime import datetime

import pytest

from industrial_data_pipeline_spark.api import Pipeline

from tests.fixtures import archive_rows, write_tree


from industrial_data_pipeline_spark.plans import (  # noqa: E402
    formatted_plan as plan,
    pushed_filters,
    whole_stage_codegen_spans,
)


@pytest.fixture()
def pipe(spark, tmp_path):
    p = Pipeline(spark, str(tmp_path / "wh"))
    p.create_database("plant")
    p.load_tree("plant", write_tree(tmp_path))
    p.store.append_archive("plant", spark.createDataFrame(
        archive_rows(), "attribute_id long, timestamp timestamp, value double"))
    return p


def test_export_pushdown_and_broadcast(pipe):
    df = pipe.get_timeseries("plant", [2, 3], wide=False,
                             start=datetime(2025, 1, 1),
                             end=datetime(2025, 1, 1, 0, 30))
    p = plan(df)
    # attribute IN-list and both timestamp bounds reach the parquet scan
    assert "PushedFilters" in p and "In(attribute_id" in p
    assert "GreaterThanOrEqual(timestamp" in p
    assert "LessThanOrEqual(timestamp" in p
    # dims broadcast — no shuffle join in the export
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_suite_export_range_reaches_scan(spark):
    """Round-1 regression: q01's time-range must reach the EVENTS
    parquet scan. With events.ts read as TIMESTAMP_NTZ the normalizing
    cast blocked pushdown and the range stayed in a post-scan Filter —
    at 100 TB that is a full-table read of the selected attributes."""
    from industrial_data_pipeline_spark.suite import q_export_long
    filters = pushed_filters(q_export_long(spark,
                                           "/root/testdata/sf0.001"))
    assert any(f.startswith("GreaterThanOrEqual(ts") for f in filters), \
        filters
    assert any(f.startswith("LessThanOrEqual(ts") for f in filters)
    assert any(f.startswith("In(user_id") for f in filters)


def test_bucketed_join_no_exchange(spark):
    """q125: both sides bucketed+sorted by the join key → the join
    itself needs no Exchange and no Sort. At sf0.001 the planner
    would (correctly) broadcast the tiny side instead, so force the
    at-scale path — the whole point is what happens when NEITHER side
    fits in memory."""
    from industrial_data_pipeline_spark.suite_scale import (
        bucketed_tables)
    li_t, ord_t = bucketed_tables(spark, "/root/testdata/sf0.001")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        li, orders = spark.table(li_t), spark.table(ord_t)
        joined = li.join(orders, li.l_orderkey == orders.o_orderkey)
        p = plan(joined)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "SortMergeJoin" in p
    # THE property: no network. (Spark still inserts per-bucket local
    # sorts — it only trusts bucket-file sort order under a legacy
    # conf — but those are linear, memory-bounded and shuffle-free.)
    assert "Exchange" not in p, p
    assert "Bucketed: true" in p
    assert "SelectedBucketsCount: 8 out of 8" in p


def test_archive_partition_pruning(pipe):
    arch = pipe.store.archive("plant")
    df = arch.where("ts_date = DATE'2025-01-01'")
    p = plan(df)
    assert "PartitionFilters" in p
    assert "ts_date" in p.split("PartitionFilters", 1)[1][:200]


def test_archive_column_pruning(pipe):
    df = pipe.store.archive_values("plant").select("attribute_id")
    p = plan(df)
    # scan must not read timestamp/value for an id-only projection
    read_schema = p.split("ReadSchema:", 1)[1].splitlines()[0]
    assert "attribute_id" in read_schema
    assert "value" not in read_schema


def test_orphan_purge_is_broadcast_semi_join(pipe):
    from industrial_data_pipeline_spark.operators.maintenance import (
        purge_orphans)
    df = purge_orphans(pipe.store.archive_values("plant"),
                       pipe.store.attribute("plant"))
    p = plan(df)
    assert "LeftSemi" in p and "Broadcast" in p


def test_interval_join_is_equi_not_nested_loop(spark):
    """The binned range join must execute as a hash/sort-merge equi-join
    on the bin key — NOT the BroadcastNestedLoopJoin Spark picks for a
    raw theta join (O(n·m) at scale)."""
    from industrial_data_pipeline_spark.operators.scale import (
        interval_join_binned)
    ev = spark.range(1000).selectExpr(
        "id AS event_id",
        "timestamp_micros(cast(id * 60000000 as long)) AS ts",
        "cast(id as double) AS value")
    iv = spark.range(5).selectExpr(
        "id AS window_id",
        "timestamp_micros(cast(id * 7200000000 as long)) AS start",
        "timestamp_micros(cast(id * 7200000000 + 1800000000 as long)) AS end")
    df = interval_join_binned(ev, iv, ts_col="ts")
    p = plan(df)
    assert "BroadcastNestedLoopJoin" not in p
    assert ("BroadcastHashJoin" in p) or ("SortMergeJoin" in p)
    # correctness spot check: window k covers minutes [120k, 120k+30]
    got = sorted((r.window_id, r.event_id) for r in df.collect())
    want = sorted((w, e) for w in range(5)
                  for e in range(1000) if w * 120 <= e <= w * 120 + 30)
    assert got == want


def test_salted_agg_two_stage(spark):
    """Salted aggregation: result identical to plain groupBy."""
    from industrial_data_pipeline_spark.operators.scale import (
        salted_grouped_sum)
    from pyspark.sql import functions as F
    df = spark.range(10000).selectExpr(
        "case when id % 100 < 97 then 'hot' else concat('k', id % 100) end"
        " AS k",
        "cast(id % 7 as double) + 0.25 AS value").repartition(8)
    got = {(r.k, r.n, r.sum_value, r.avg_value)
           for r in salted_grouped_sum(df, ["k"], "value").collect()}
    plain = {(r.k, r.n, r.sum_value, r.avg_value) for r in
             df.groupBy("k").agg(
                 F.count("*").alias("n"),
                 F.round(F.sum(F.col("value").cast("decimal(28,6)"))
                         .cast("double"), 6).alias("sum_value"),
                 F.round(F.sum(F.col("value").cast("decimal(28,6)"))
                         .cast("double") / F.count("*"), 6)
                 .alias("avg_value")).collect()}
    assert got == plain


def test_olap2_nation_trade_broadcasts_dims(spark):
    """q73: the nation-filtered supplier/customer dims must broadcast;
    the only shuffle join is fact⋈orders on the orderkey."""
    from industrial_data_pipeline_spark.suite_olap2 import (
        q_nation_trade_volume)
    p = plan(q_nation_trade_volume(spark, "/root/testdata/sf0.001"))
    assert "BroadcastHashJoin" in p
    assert "BroadcastNestedLoopJoin" not in p


def test_olap2_sole_late_supplier_no_nested_loop(spark):
    """q79: the semi/anti self-joins carry a non-equi suppkey clause —
    it must ride the orderkey equi-join, never a nested loop."""
    from industrial_data_pipeline_spark.suite_olap2 import (
        q_sole_late_supplier)
    p = plan(q_sole_late_supplier(spark, "/root/testdata/sf0.001"))
    assert "BroadcastNestedLoopJoin" not in p


def test_sql_revenue_pushdown(spark):
    """q92 (raw spark.sql text): all three predicates must reach the
    parquet scan as PushedFilters — the SQL door gets the same
    Catalyst treatment as the DataFrame door."""
    from industrial_data_pipeline_spark.suite_graph import q_sql_revenue
    p = plan(q_sql_revenue(spark, "/root/testdata/sf0.001"))
    assert "PushedFilters" in p
    assert "GreaterThanOrEqual(l_shipdate" in p
    assert "LessThan(l_quantity" in p


def test_salted_join_exact_parity(spark):
    """salted_join must return exactly the rows of the plain join."""
    from industrial_data_pipeline_spark.operators.scale import salted_join
    from pyspark.sql import functions as F
    left = spark.range(2000).selectExpr(
        "case when id % 10 < 9 then 42 else id end AS k", "id AS lv")
    right = spark.range(100).selectExpr("id AS k", "id * 2 AS rv")
    got = sorted((r.k, r.lv, r.rv) for r in
                 salted_join(left, right, "k", salt=4).collect())
    want = sorted((r.k, r.lv, r.rv) for r in
                  left.join(right, "k").collect())
    assert got == want and len(got) > 0


def test_plan_inspect_helpers(spark):
    """plans/ package: pushed_filters parses scan predicates; codegen
    counting works on a non-adaptive plan (under AQE it reports 0 —
    stages compile at run time)."""
    from industrial_data_pipeline_spark.suite_graph import q_sql_revenue
    df = q_sql_revenue(spark, "/root/testdata/sf0.001")
    pf = pushed_filters(df)
    assert any("l_quantity" in p for p in pf)
    assert any("l_shipdate" in p for p in pf)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        df2 = q_sql_revenue(spark, "/root/testdata/sf0.001")
        assert whole_stage_codegen_spans(df2) >= 1
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_zipf_slope_no_global_window(spark):
    """q95: the vocabulary ranking must be TakeOrderedAndProject
    (distributed top-k), never a row_number window over the full
    token table — at 100× corpus scale an unpartitioned WindowExec
    ships every distinct token to one partition (the round-3 bench
    tail's 'Moving all data to a single partition' warnings)."""
    from industrial_data_pipeline_spark.suite_olap3 import q_zipf_slope
    p = plan(q_zipf_slope(spark, "/root/testdata/sf0.001"))
    assert "TakeOrderedAndProject" in p
    assert "Window" not in p


def test_zorder_layout_window_is_partitioned(spark):
    """q172: exact-ntile tiling must never sort the full fact table
    on one partition. The only Window allowed is the within-bucket
    row_number, partitioned on bkt; tile quotas come from the
    collected bucket counts (driver-bounded, ≤64 rows)."""
    from industrial_data_pipeline_spark.suite_scale import q_zorder_layout
    p = plan(q_zorder_layout(spark, "/root/testdata/sf0.001"))
    wins = [ln for ln in p.splitlines() if "windowspecdefinition" in ln]
    assert wins, "expected the within-bucket rank window"
    for ln in wins:
        spec = ln.split("windowspecdefinition(")[1]
        # partition columns precede the ORDER BY spec; an empty
        # partition list would start with the frame or an ASC/DESC key
        assert spec.split(",")[0].strip().startswith("bkt"), ln


def test_salted_join_no_single_key_hotspot(spark):
    """q96: the salted join's shuffle key must be (k, salt), so one
    hot key hashes to `salt` distinct partitions instead of one. The
    plan must show the salt column inside the join key expression."""
    from industrial_data_pipeline_spark.operators.scale import salted_join
    left = spark.range(2000).selectExpr(
        "case when id % 10 < 9 then 42 else id end AS k", "id AS lv")
    right = spark.range(100).selectExpr("id AS k", "id * 2 AS rv")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        p = plan(salted_join(left, right, "k", salt=4))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "SortMergeJoin" in p or "ShuffledHashJoin" in p
    assert "salt" in p, "join must carry the salt in its key"


def test_skew_profile_distributed_topk(spark):
    """q207: the hottest-keys report must rank via distributed
    TakeOrderedAndProject, never a global sort or window — the
    diagnostic for skew must not itself create a skew hotspot."""
    from industrial_data_pipeline_spark.suite_scale import q_skew_profile
    p = plan(q_skew_profile(spark, "/root/testdata/sf0.001"))
    assert "TakeOrderedAndProject" in p
    assert "Window" not in p


def test_boilerplate_shingles_jvm_side(spark):
    """q202: the 5-gram expansion must be JVM-side Generate (explode
    of a transform over the token array) — no Python evaluation in
    the shingle path; and the gram threshold must land before the
    hit-join (the join build side is the filtered gram set)."""
    from industrial_data_pipeline_spark.suite_corpus import (
        q_boilerplate_ngrams)
    p = plan(q_boilerplate_ngrams(spark, "/root/testdata/sf0.001"))
    assert "Generate" in p and "transform(sequence(" in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_sliding_window_single_aggregate(spark):
    """q214: the slide expansion must be plan-side (Expand/Generate
    feeding ONE partial-aggregable groupBy) — no join, no window
    function, no Python."""
    from industrial_data_pipeline_spark.suite_events import (
        q_sliding_windows)
    p = plan(q_sliding_windows(spark, "/root/testdata/sf0.001"))
    assert "HashAggregate" in p
    assert "windowspecdefinition" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_weighted_median_no_fact_wide_sort(spark):
    """q220 (VERDICT r4 item 4): the median must come from two-level
    bucketed prefix sums — every window runs over an AGGREGATED
    (dimension-sized) input, partitioned on the group key; the fact
    table itself is never sorted. The old fact-wide window ordered on
    (price, l_orderkey, l_linenumber); the bucketed plan never even
    references the tie-break columns, so their absence is the
    regression signal."""
    from industrial_data_pipeline_spark.suite_olap3 import (
        q_weighted_median)
    p = plan(q_weighted_median(spark, "/root/testdata/sf0.001"))
    wins = [ln for ln in p.splitlines() if "windowspecdefinition" in ln]
    assert wins
    for ln in wins:
        spec = ln.split("windowspecdefinition(")[1]
        # the shared operator's internal group alias is _g
        assert spec.split(",")[0].strip().startswith("_g"), ln
    assert "l_orderkey" not in p and "l_linenumber" not in p
    assert "BroadcastHashJoin" in p and "HashAggregate" in p


def test_interval_join_binned_half_open(spark):
    """end_inclusive=False: a point AT the interval end must not
    match; a point at the start must; an interval ending exactly on a
    bin boundary must not leak into the next bin; a pair meeting
    across a bin edge appears exactly once."""
    from datetime import datetime as T
    from industrial_data_pipeline_spark.operators.scale import (
        interval_join_binned)
    iv = spark.createDataFrame(
        [(1, T(2024, 1, 1, 0, 30), T(2024, 1, 1, 1, 30)),  # spans 2 bins
         (2, T(2024, 1, 1, 0, 0), T(2024, 1, 1, 1, 0)),    # ends on edge
         (3, T(2024, 1, 1, 1, 10), T(2024, 1, 1, 1, 20))],
        "window_id long, start timestamp, end timestamp")
    pt = spark.createDataFrame(
        [(T(2024, 1, 1, 0, 30),), (T(2024, 1, 1, 0, 59),),
         (T(2024, 1, 1, 1, 0),), (T(2024, 1, 1, 1, 15),),
         (T(2024, 1, 1, 1, 29),), (T(2024, 1, 1, 1, 30),)],
        "ts timestamp")
    got = sorted((r.window_id, r.ts.minute + 60 * r.ts.hour)
                 for r in interval_join_binned(
                     pt, iv, ts_col="ts", end_inclusive=False)
                 .collect())
    assert got == [(1, 30), (1, 59), (1, 60), (1, 75), (1, 89),
                   (2, 30), (2, 59), (3, 75)]


def test_set_similarity_join_no_theta_join(spark):
    """q227's AllPairs set-similarity join must contain no
    CartesianProduct / BroadcastNestedLoopJoin and no unpartitioned
    window: prefixes equi-join on the item, verification equi-joins
    on (id, item), ranks are per-set windows."""
    from industrial_data_pipeline_spark.operators.dedup import (
        set_similarity_join)
    df = spark.createDataFrame(
        [(i, str((i * 7 + j) % 15)) for i in range(40)
         for j in range(i % 6 + 1)],
        "doc_id long, item string")
    p = plan(set_similarity_join(df, t_millis=500))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    wins = [ln for ln in p.splitlines() if "windowspecdefinition" in ln]
    assert wins
    for ln in wins:  # every window partitioned by the set id
        spec = ln.split("windowspecdefinition(")[1]
        assert spec.split(",")[0].strip().startswith("_id"), ln


def test_equidepth_histogram_no_sort_no_window(spark):
    """q221 (VERDICT r4 item 4): the equi-depth boundaries must come
    from ONE percentile aggregate (distinct-bounded counts-map state,
    see suite_olap3 docstring) and the bucketing from a broadcast —
    never a global sort or a window over the fact."""
    from industrial_data_pipeline_spark.suite_olap3 import (
        q_equidepth_histogram)
    p = plan(q_equidepth_histogram(spark, "/root/testdata/sf0.001"))
    assert "windowspecdefinition" not in p
    assert "Sort " not in p and "+- Sort" not in p
    assert "percentile" in p
    assert "BroadcastNestedLoopJoin" in p or "BroadcastExchange" in p


def test_bm25_broadcast_stats_and_partitioned_window(spark):
    """q233's scale contract: query terms / df / (N, avgdl) all enter
    broadcast; the rank window partitions by query_id (never a global
    window); the posting explode is filtered to the query vocabulary
    (an In/INSET predicate below the aggregate)."""
    from industrial_data_pipeline_spark.suite import REGISTRY
    p = plan(REGISTRY["q233_bm25_topk"][0](spark,
                                           "/root/testdata/sf0.001"))
    assert p.count("BroadcastExchange") >= 3, p
    assert "Window" in p
    assert "partitionBy=[query_id" not in p  # formatted style differs
    import re
    w = re.search(r"Arguments: \[row_number\(\).*", p)
    assert w and "query_id" in w.group(0), w
    assert ("_t#" in p and (" IN " in p or "INSET" in p)), \
        "vocabulary filter missing"


def test_k_anonymity_single_aggregate_no_window(spark):
    """q234: one combinable aggregate pair over the quasi key + a
    1-row broadcast total — no window, no sort-merge join."""
    from industrial_data_pipeline_spark.suite import REGISTRY
    p = plan(REGISTRY["q234_k_anonymity"][0](spark,
                                             "/root/testdata/sf0.001"))
    assert "Window" not in p
    assert "SortMergeJoin" not in p
    assert "BroadcastNestedLoopJoin" in p  # the 1-row total cross
    assert p.count("HashAggregate") >= 2  # partial + final


def test_bpe_apply_zero_shuffle_projection(spark):
    """q235: no shuffle beyond the loader's round-robin input spread,
    no Python stage, no explode/Generate, no join, no window."""
    from industrial_data_pipeline_spark.suite import REGISTRY
    p = plan(REGISTRY["q235_bpe_apply"][0](spark,
                                           "/root/testdata/sf0.001"))
    import re
    shuffles = re.findall(r"Arguments: (\w+)Partitioning", p)
    assert all(s == "RoundRobin" for s in shuffles), shuffles
    for bad in ("Generate", "Window", "Join", "ArrowEvalPython",
                "BatchEvalPython"):
        assert bad not in p, bad


def test_incremental_lsh_broadcast_verify(spark):
    """q236: the verify joins are broadcast hash joins (the candidate
    set is batch-sized by construction) — the corpus is never
    sort-merge-shuffled for the verify, and there is no theta join."""
    from industrial_data_pipeline_spark.suite import REGISTRY
    p = plan(REGISTRY["q236_incremental_lsh"][0](
        spark, "/root/testdata/sf0.001"))
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_text_normalize_projection_only(spark):
    """q237: pure regexp projection — no join, window, Generate,
    Python stage, or aggregate anywhere in the plan."""
    from industrial_data_pipeline_spark.suite import REGISTRY
    p = plan(REGISTRY["q237_text_normalize"][0](
        spark, "/root/testdata/sf0.001"))
    for bad in ("Join", "Window", "Generate", "HashAggregate",
                "SortAggregate", "ArrowEvalPython", "BatchEvalPython"):
        assert bad not in p, bad


def test_dup_span_excise_equi_antijoin(spark):
    """q239: the token-vs-span anti-join executes as an equi-join on
    doc_id with the range as residual — never a
    BroadcastNestedLoopJoin/CartesianProduct theta join; the rebuild
    window/sort stays doc-partitioned (via the shared q231 substrate
    the window_audit already covers)."""
    from industrial_data_pipeline_spark.suite import REGISTRY
    p = plan(REGISTRY["q239_dup_span_excise"][0](
        spark, "/root/testdata/sf0.001"))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "LeftAnti" in p


def test_stored_lsh_gate_probe_plan(spark, tmp_path):
    """q242/q243's scale claim, asserted on the PROBE plan itself
    (the registered query localCheckpoints before returning, so
    EXPLAINS dumps only the result scan): the stored gate's plan
    contains the two persisted parquet scans (bands + shingles),
    broadcast joins for the batch-sized sides, and NO corpus
    signature rebuild — no min-aggregate over exploded corpus
    shingles anywhere."""
    from pyspark.sql import functions as F

    from industrial_data_pipeline_spark.operators.lsh_index import (
        StoredLshIndex)

    docs = spark.createDataFrame(
        [(i, f"alpha{i} beta{i} gamma{i} delta{i} eps{i}")
         for i in range(30)], "doc_id long, text string")
    idx = StoredLshIndex(spark, str(tmp_path / "idx"), threshold=0.3)
    idx.build(docs)
    batch = docs.where(F.col("doc_id") < 3).select(
        (F.col("doc_id") + 1000).alias("doc_id"), "text")
    import re

    # --- prune=False: the measurement baseline keeps the one-plan
    # shape — two stored parquet scans, broadcast batch sides, batch
    # signing in-plan, and NO corpus signature rebuild
    p = plan(idx.probe(batch, prune=False))
    assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 2, p
    assert "BroadcastHashJoin" in p
    # no corpus-side signature rebuild: signing needs TEXT, and no
    # parquet scan in the plan reads a text column — only the stored
    # band/shingle assets (min-aggregates in the plan are the batch's,
    # printed once in the tree and once in AQE's broadcast section)
    assert "split(trim(text" in p  # batch signing IS in-plan
    for schema in re.findall(r"ReadSchema: .*", p):
        assert "text" not in schema, "corpus re-signed in-plan?"

    # --- prune=True (the default, r8 verdict item 1): the probe's
    # batch keys are PUSHED into both index scans, so I/O is
    # O(probed rows), not O(index)
    pruned = idx.probe(batch)  # runs the candidate stage eagerly
    band_plan = plan(idx.last_band_scan)
    assert re.search(r"PartitionFilters: \[.*band", band_plan), \
        band_plan  # band IN-list prunes partitions
    assert re.search(r"PushedFilters: \[.*In\(bucket", band_plan), \
        band_plan  # bucket IN-list reaches the parquet row groups
    verify_plan = plan(pruned)
    assert re.search(r"PushedFilters: \[.*In\(doc_id", verify_plan), \
        verify_plan  # candidate ids pushed into the shingle scan
    # and pruning is invisible to results (q242/q243 pin byte-equality
    # against the in-plan oracle; cheap structural echo here)
    got = {(r.new_id, r.old_id) for r in pruned.collect()}
    want = {(r.new_id, r.old_id)
            for r in idx.probe(batch, prune=False).collect()}
    assert got == want


def test_stored_span_excise_plan_reads_parquet_spans(spark, tmp_path):
    """q244's production shape at the operator level: _excise_tokens
    over a parquet-backed span table has NO posting substrate in its
    plan — one parquet scan for the spans, the token posexplode, the
    doc_id anti-join with the range residual, one rebuild agg."""
    from pyspark.sql import functions as F

    from industrial_data_pipeline_spark.suite_corpus import (
        _excise_tokens)

    docs = spark.createDataFrame(
        [(1, "a b c d e f g h i j"), (2, "k l m n o p q r s t")],
        "doc_id long, text string")
    spans = spark.createDataFrame(
        [(1, 0, 2, 9)], "doc_id long, isl long, s long, e long")
    spath = str(tmp_path / "spans")
    spans.write.parquet(spath)
    p = plan(_excise_tokens(docs, spark.read.parquet(spath)))
    assert "Scan parquet" in p
    # the q231 substrate would put an xxhash64 posting build + a lag
    # window in the plan; the stored shape must have neither
    assert "xxhash64" not in p
    out = {r.doc_id: (r.kept_tokens, r.removed_tokens)
           for r in _excise_tokens(
               docs, spark.read.parquet(spath)).collect()}
    assert out[1] == (2, 8) and out[2] == (10, 0)


def test_stored_ivf_probe_partition_prunes(spark, tmp_path):
    """q259's scale claim on the PLAN: a stored-IVF probe's scan
    carries the probed cells as PartitionFilters and lists only
    those cells' files — directory-level pruning (the coarse-key
    complement of the LSH index's row-group pruning); and the probe
    result equals a full-scan rank over the same cells."""
    import re

    from pyspark.sql import functions as F

    from industrial_data_pipeline_spark.operators.similarity import (
        StoredIvfIndex)

    rows = [(i, [float(i % 7), float((i * 3) % 5), 1.0])
            for i in range(64)]
    corpus = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>")
    idx = StoredIvfIndex(spark, str(tmp_path / "ivf"), n_cells=8)
    idx.build(corpus)
    idx.append(spark.createDataFrame(
        [(100, [1.0, 2.0, 1.0])], "vec_id long, embedding array<double>"))
    qv = [1.0, 2.0, 1.0]
    cells = idx.probe_cells(qv, nprobe=2)
    p = plan(idx.probe(qv, k=5, nprobe=2))
    m = re.search(r"PartitionFilters: \[.*_cell.*\]", p)
    assert m, p  # the cell IN-list prunes partitions
    # every probed cell is in the filter; at least one cell is NOT
    # (so the scan really is a subset of the index)
    for c in cells:
        assert str(c) in m.group(0), (cells, m.group(0))
    assert len(cells) < 8
    # the appended vector landed in a cell and is probe-visible when
    # its cell is probed (cosine 1.0 with the query; corpus rows with
    # the same direction tie ahead of it on the id tie-break)
    got = {r.vec_id: r.cosine_sim for r in
           idx.probe(qv, k=10, nprobe=8).collect()}
    assert got.get(100) == 1.0


def test_pruned_signature_scan_pushes_keys(spark, tmp_path):
    """q248/q254's probe-side I/O: pruned_signature_scan pushes the
    batch's table IN-list into PartitionFilters (table is the
    partition column of write_signature_index's layout) and the sig
    IN-list into PushedFilters — and the pruned scan's rows are a
    superset of what the probe join keeps, so results match the
    full scan."""
    import re

    from industrial_data_pipeline_spark.operators.similarity import (
        ann_signature_index, pruned_signature_scan,
        write_signature_index)

    corpus = spark.createDataFrame(
        [(i, [float(i), 1.0, -float(i), 0.5]) for i in range(40)],
        "vec_id long, embedding array<double>")
    path = str(tmp_path / "sigs")
    write_signature_index(ann_signature_index(corpus, 4), path)
    batch = spark.createDataFrame(
        [(100, [2.0, 2.0, -2.0, 1.0])],
        "vec_id long, embedding array<double>")
    bidx = ann_signature_index(batch, 4).localCheckpoint(eager=True)
    scan = pruned_signature_scan(spark, path, bidx)
    p = plan(scan)
    assert re.search(r"PartitionFilters: \[.*table", p), p
    assert re.search(r"PushedFilters: \[.*In\(sig", p), p
    # pruning is a superset filter of the probe's (table, sig) join:
    # joining either scan against the batch keys gives the same rows
    full = spark.read.parquet(path)
    keys = bidx.select("table", "sig").distinct()
    want = sorted(map(tuple, full.join(keys, ["table", "sig"])
                      .select("vec_id", "table", "sig").collect()))
    got = sorted(map(tuple, scan.join(keys, ["table", "sig"])
                     .select("vec_id", "table", "sig").collect()))
    assert got == want


def test_ivf_probe_batch_single_pruned_scan(spark, tmp_path):
    """q264/q265's scale claim on the PLAN (VERDICT r9 item 3): a
    BATCH probe of the stored IVF index issues ONE scan of the data
    asset — pruned to the union of the batch's probed cells via
    PartitionFilters — instead of q259's per-query scan union; the
    routing pairs and query vectors enter as broadcasts; and the
    probed-cell union is a strict subset of the index's cells."""
    import re

    from industrial_data_pipeline_spark.operators.similarity import (
        StoredIvfIndex)

    corpus = spark.createDataFrame(
        [(i, [float(i % 7), float((i * 3) % 5), 1.0])
         for i in range(64)],
        "vec_id long, embedding array<double>")
    idx = StoredIvfIndex(spark, str(tmp_path / "ivf"), n_cells=8)
    idx.build(corpus)
    queries = spark.createDataFrame(
        [(1000 + j, [1.0, float(j % 5), 1.0]) for j in range(12)],
        "vec_id long, embedding array<double>")
    out = idx.probe_batch(queries, k=5, nprobe=2)
    p = plan(out)
    # exactly ONE parquet scan in the whole plan (the cells asset,
    # partition-pruned); the routing pairs and query vectors are
    # in-memory broadcasts, never a second scan
    scans = re.findall(r"^\(\d+\) Scan parquet", p, re.MULTILINE)
    assert len(scans) == 1, p
    m = re.search(r"PartitionFilters: \[.*_cell.*\]", p)
    assert m, p
    probed = {c for r in queries.collect()
              for c in idx.probe_cells(list(map(float, r.embedding)),
                                       nprobe=2)}
    assert len(probed) < 8      # strict subset: pruning is real
    for c in probed:
        assert str(c) in m.group(0), (probed, m.group(0))
    # both small sides broadcast — no shuffle join against the scan
    assert p.count("BroadcastExchange") >= 2, p
    assert "SortMergeJoin" not in p, p


def test_escalated_probe_reads_only_escalation_cells(spark, tmp_path):
    """q285/q286's scale claim on the PLAN (VERDICT r11 item 1): a
    min_results-escalated filtered probe still issues ONE scan of
    the data asset, partition-pruned to EXACTLY the escalation
    contract's cells — the brute path lists only cells CONTAINING
    the stratum, and the prefix path lists only the widened prefix's
    non-empty cells (more than nprobe, fewer than all). The
    candidate-mass counting pass happens driver-side before the plan
    exists, so it never appears in the probe's own plan."""
    import re

    from pyspark.sql import functions as F

    from industrial_data_pipeline_spark.operators.similarity import (
        StoredIvfIndex)

    corpus = spark.createDataFrame(
        [(i, [float(i % 7), float((i * 3) % 5), 1.0],
          1 if i % 21 == 0 else 0) for i in range(64)],
        "vec_id long, embedding array<double>, label int")
    idx = StoredIvfIndex(spark, str(tmp_path / "esc"), n_cells=8,
                         extra_schema="label int")
    idx.build(corpus)
    rows, _ = idx._collect_queries(
        corpus.where(F.col("label") == 1), "vec_id", "embedding",
        "label", None)

    # brute path: stratum (4 rows) ≤ threshold → only its cells
    esc = idx._escalation_cells(rows, nprobe=1, min_results=3,
                                brute_force_threshold=4096,
                                filter_col="label",
                                exclude_epoch=None, as_of_epoch=None)
    brute_cells = {c for cs in esc.values() for c in cs}
    out = idx.probe_batch(corpus.where(F.col("label") == 1), k=3,
                          nprobe=1, filter_col="label",
                          min_results=3)
    p = plan(out)
    scans = re.findall(r"^\(\d+\) Scan parquet", p, re.MULTILINE)
    assert len(scans) == 1, p
    m = re.search(r"PartitionFilters: \[.*_cell.*\]", p)
    assert m, p
    inlist = re.search(r"_cell#?\d* IN \(([^)]*)\)", m.group(0))
    assert inlist, m.group(0)
    listed = set(map(int, re.findall(r"\d+", inlist.group(1))))
    assert listed == brute_cells, (listed, brute_cells)
    # the candidate-mass counting pass reads ONLY the filter column
    # (+ partition cols) — never the vector bytes
    mass_plan = plan(idx.last_mass_scan)
    rs = re.search(r"ReadSchema: ([^\n]*)", mass_plan)
    assert rs and "label" in rs.group(1), mass_plan
    assert "v:array" not in rs.group(1), rs.group(1)
    # every query got its full guarantee: stratum − self = 3 rows
    got = {}
    for r in out.collect():
        got[r.query_id] = got.get(r.query_id, 0) + 1
    assert got == {r["query_id"]: 3 for r in rows}, got

    # prefix path: threshold 0 forces escalation on a common label;
    # the prefix is wider than nprobe but narrower than the ring
    rows0, _ = idx._collect_queries(
        corpus.where(F.col("vec_id") < 2), "vec_id", "embedding",
        "label", None)
    esc0 = idx._escalation_cells(rows0, nprobe=1, min_results=10,
                                 brute_force_threshold=0,
                                 filter_col="label",
                                 exclude_epoch=None,
                                 as_of_epoch=None)
    for qid, cs in esc0.items():
        assert len(cs) > 1, (qid, cs)          # widened past nprobe
        assert len(cs) < idx.n_cells, (qid, cs)  # but not the ring


def test_asof_probe_prunes_newer_epochs(spark, tmp_path):
    """q267's scale claim on the PLAN: as_of_epoch=N lands as a
    `_epoch <= N` PartitionFilter on the stored band scan — newer
    epoch partitions are pruned out of the file listing, composed
    with (not replacing) the band/bucket key pruning."""
    import re

    from pyspark.sql import functions as F

    from industrial_data_pipeline_spark.operators.lsh_index import (
        StoredLshIndex)

    docs = spark.createDataFrame(
        [(i, f"alpha{i} beta{i} gamma{i} delta{i} eps{i}")
         for i in range(10)], "doc_id long, text string")
    idx = StoredLshIndex(spark, str(tmp_path / "idx"), threshold=0.3)
    idx.build(docs)
    extra = spark.createDataFrame(
        [(100, "nu0 nu1 nu2 nu3 nu4")], "doc_id long, text string")
    idx.append_frames(*idx.signature_frames(extra), epoch_id=1)
    batch = docs.where(F.col("doc_id") < 2).select(
        (F.col("doc_id") + 1000).alias("doc_id"), "text")
    idx.probe(batch, as_of_epoch=0).collect()
    band_plan = plan(idx.last_band_scan)
    m = re.search(r"PartitionFilters: \[(.*)\]", band_plan)
    assert m and "_epoch" in m.group(1) and "band" in m.group(1), \
        band_plan


def test_ivf_adc_probe_plans_prune_columns_and_ids(spark, tmp_path):
    """q271's scale claims on the PLANS: the ADC stage's scan reads
    the code columns and NOT the vector (ReadSchema drops `v` — the
    dominant bytes stay on disk), with the probed cells as
    PartitionFilters; the re-rank stage's scan pushes the shortlist
    ids (In(vec_id)) into the parquet row groups. And the two-stage
    result ranks by exact cosine — its top-k for a clusterable query
    equals probe_batch's."""
    import re

    from pyspark.sql import functions as F

    from industrial_data_pipeline_spark.operators.similarity import (
        StoredIvfIndex)

    def vec(seed):
        return [float((seed * 13 + d * 7) % 19) for d in range(8)]

    rows = [(i, vec(i)) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, v array<double>")
    idx = StoredIvfIndex(spark, str(tmp_path / "ivf"), id_col="vec_id",
                         vec_col="v", n_cells=4, pq_m=2, pq_k=4)
    idx.build(df)
    qs = df.where("vec_id < 3")
    adc = idx.probe_batch_adc(qs, k=5, nprobe=2, rerank=20).collect()
    adc_plan = plan(idx.last_adc_scan)
    schemas = re.findall(r"ReadSchema: .*", adc_plan)
    assert schemas and all("codes" in s for s in schemas), adc_plan
    assert all("v:" not in s.replace("vec_id", "")
               .replace("vnorm2", "") for s in schemas), adc_plan
    assert re.search(r"PartitionFilters: \[.*_cell", adc_plan), \
        adc_plan
    rr_plan = plan(idx.last_rerank_scan)
    assert re.search(r"PushedFilters: \[.*In\(vec_id", rr_plan), \
        rr_plan
    exact = idx.probe_batch(qs, k=5, nprobe=2).collect()
    assert {(r.query_id, r.vec_id, r.rk) for r in adc} \
        == {(r.query_id, r.vec_id, r.rk) for r in exact}


def test_unfiltered_guaranteed_k_after_retraction(spark, tmp_path):
    """q299's contract (VERDICT r12 item 4): with NO filter column,
    min_results escalates on per-cell TOTAL mass. Constructed
    corner: 64 one-hot vectors in 8 directions → cell i%8; retract
    everything except direction 2 — cells 0,1,3..7 are now EMPTY,
    so a plain nprobe=1 probe aimed at direction 5 returns ZERO
    rows; with min_results=5 the routing brute-forces the surviving
    cells and returns the exact top-k, and the mass scan reads NO
    data columns at all (counts come from the partition listing +
    parquet footers)."""
    import re

    from pyspark.sql import functions as F  # noqa: F401

    from industrial_data_pipeline_spark.operators.similarity import (
        StoredIvfIndex)

    def onehot(d, jig=0.0):
        v = [0.0] * 8
        v[d] = 1.0
        return v

    corpus = spark.createDataFrame(
        [(i, onehot(i % 8)) for i in range(64)],
        "vec_id long, embedding array<double>")
    idx = StoredIvfIndex(spark, str(tmp_path / "ugk"), n_cells=8)
    idx.build(corpus)
    idx.retract([i for i in range(64) if i % 8 != 2])

    queries = spark.createDataFrame(
        [(1000, onehot(5))], "vec_id long, embedding array<double>")
    # plain probe: the probed cell was emptied by retraction →
    # silent under-delivery (zero rows)
    assert idx.probe_batch(queries, k=5, nprobe=1).count() == 0
    # guaranteed-k: full k, exact top-k over the 8 survivors
    out = idx.probe_batch(queries, k=5, nprobe=1, min_results=5)
    got = [(r.query_id, r.vec_id, r.rk) for r in
           sorted(out.collect(), key=lambda r: r.rk)]
    # survivors are orthogonal to the query (cos 0) → vec_id order
    assert got == [(1000, 2 + 8 * j, j + 1) for j in range(5)], got
    # plan: ONE scan, pruned to exactly the surviving cell
    p = plan(out)
    scans = re.findall(r"^\(\d+\) Scan parquet", p, re.MULTILINE)
    assert len(scans) == 1, p
    m = re.search(r"PartitionFilters: \[.*_cell.*\]", p)
    assert m, p
    cf = re.search(r"_cell#?\d*\)? (?:IN \(([^)]*)\)|= (\d+))",
                   m.group(0))
    assert cf, m.group(0)
    listed = set(map(int, re.findall(
        r"\d+", cf.group(1) or cf.group(2))))
    assert listed == {2}, m.group(0)
    # the mass scan reads no data columns — ReadSchema is empty
    mass_plan = plan(idx.last_mass_scan)
    rs = re.search(r"ReadSchema: ([^\n]*)", mass_plan)
    assert rs and rs.group(1).strip() == "struct<>", mass_plan
