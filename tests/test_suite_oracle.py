"""Every suite entry vs its DuckDB oracle at sf0.001 — the local
stand-in for the driver's CORRECTNESS gate (it runs the same pairs at
sf0.01)."""

import pytest

from industrial_data_pipeline_spark.suite import REGISTRY

from tests.oracle import compare, run_oracle


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(spark, sf_dir, name):
    fn, sql = REGISTRY[name]
    df = fn(spark, sf_dir)
    if sql is None:
        assert df.count() >= 0  # rows-only smoke, mirrors driver fallback
        return
    compare(df, run_oracle(sql, sf_dir), name)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert len(df.columns) > 1
    assert set(e.oracle_sql()) <= set(e.queries())


def test_quality_filter_reasons_split(spark):
    """q68 must actually exercise the gate: at sf0.001 some docs keep,
    some reject, and >1 distinct reject_reason fires."""
    from industrial_data_pipeline_spark.suite_pipeline import (
        q_quality_filter)
    rows = q_quality_filter(spark, "/root/testdata/sf0.001").collect()
    kept = [r for r in rows if r.keep]
    reasons = {r.reject_reason for r in rows if not r.keep}
    assert kept and reasons and len(reasons) >= 2
    assert all(r.reject_reason is None for r in kept)
