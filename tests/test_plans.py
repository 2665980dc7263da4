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


def plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


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
