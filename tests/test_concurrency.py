"""Pin tests for the governed-concurrency helper (optimization r15,
VERDICT r14 items 3/4): run_writes_concurrently's empty-call guard,
result ordering, ROOT-CAUSE exception propagation (a sibling
cancelled by our own cancelJobGroup must never mask the original
failure), rewrite_under_lease's empty-assets no-op (ADVICE r14), and
per-writer dynamic-overwrite option isolation across the concurrent
writer threads."""

import time

import pytest
from pyspark.sql import functions as F

from industrial_data_pipeline_spark.operators.lsh_index import (
    rewrite_under_lease, run_writes_concurrently)
from industrial_data_pipeline_spark.suite_common import run_chains


class _Boom(RuntimeError):
    pass


def test_empty_thunks_is_noop():
    assert run_writes_concurrently() == []
    run_chains()  # ADVICE r14: zero chains must not raise


def test_results_in_submission_order():
    assert run_writes_concurrently(
        lambda: 1, lambda: 2, lambda: 3) == [1, 2, 3]


def test_root_cause_exception_propagates_over_slow_sibling():
    order = []

    def slow_ok():
        time.sleep(0.5)
        order.append("slow done")
        return "ok"

    def fail_fast():
        raise _Boom("root cause")

    with pytest.raises(_Boom, match="root cause"):
        run_writes_concurrently(slow_ok, fail_fast)
    # the pool exit joined the sibling before propagating
    assert order == ["slow done"]


def test_sibling_spark_jobs_cancelled_and_root_cause_wins(spark):
    """When one thunk fails, the sibling's IN-FLIGHT Spark job is
    cancelled (best effort) and the FIRST failure — never the
    induced cancellation error — propagates."""

    def fail_soon():
        time.sleep(0.3)
        raise _Boom("root")

    def long_job():
        # long enough to be in flight when the sibling fails; the
        # cancel keeps this test fast — without it the aggregation
        # runs for many seconds. avg over doubles: a long-domain sum
        # at this row count would ANSI-overflow and could out-race
        # the sibling's intended failure
        (spark.range(0, 1 << 34, 1, 8)
         .selectExpr("avg(cast(id as double))").collect())

    t0 = time.perf_counter()
    with pytest.raises(_Boom, match="root"):
        run_writes_concurrently(long_job, fail_soon)
    # generous bound: far below the uncancelled job's runtime
    assert time.perf_counter() - t0 < 30


def test_rewrite_under_lease_empty_assets_is_noop(spark, tmp_path):
    stats = rewrite_under_lease(spark, str(tmp_path), ())
    assert stats == {"files_before": 0, "files_after": 0}


def test_per_writer_dynamic_overwrite_isolation(spark, tmp_path):
    """Concurrent writers: one dynamic partition overwrite, one
    plain append — the per-writer .option() must neither leak into
    the sibling writer nor mutate the session conf."""
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    (spark.range(0, 3).withColumn("p", F.lit(0))
     .unionByName(spark.range(100, 102).withColumn("p", F.lit(9)))
     .write.partitionBy("p").parquet(a))
    (spark.range(0, 3).withColumn("p", F.lit(0))
     .write.partitionBy("p").parquet(b))
    before = spark.conf.get(
        "spark.sql.sources.partitionOverwriteMode", "static")
    run_writes_concurrently(
        lambda: (spark.range(10, 15).withColumn("p", F.lit(0))
                 .write.mode("overwrite")
                 .option("partitionOverwriteMode", "dynamic")
                 .partitionBy("p").parquet(a)),
        lambda: (spark.range(7, 9).withColumn("p", F.lit(1))
                 .write.mode("append").partitionBy("p").parquet(b)))
    # dynamic overwrite replaced ONLY p=0; the untouched p=9
    # partition survives (a session-level static overwrite would
    # have dropped it, a leaked dynamic option would be invisible
    # here but the session-conf assert below pins non-mutation)
    assert sorted(r.id for r in spark.read.parquet(a).collect()) \
        == [10, 11, 12, 13, 14, 100, 101]
    assert sorted(r.id for r in spark.read.parquet(b).collect()) \
        == [0, 1, 2, 7, 8]
    assert spark.conf.get(
        "spark.sql.sources.partitionOverwriteMode", "static") == before
