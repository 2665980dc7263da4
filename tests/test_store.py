"""ParquetStore: partitioned archive, first-wins/last-wins upsert (T6/T7)."""

import os
from datetime import datetime

from industrial_data_pipeline_spark.catalog.store import ParquetStore


def _mk(spark, tmp_path):
    store = ParquetStore(spark, str(tmp_path / "warehouse"))
    store.create_database("db1")
    return store


def _arch(spark, rows):
    return spark.createDataFrame(
        rows, "attribute_id long, timestamp timestamp, value double")


T1 = datetime(2025, 1, 1, 12, 0)
T2 = datetime(2025, 1, 2, 12, 0)


def test_create_and_list(spark, tmp_path):
    store = _mk(spark, tmp_path)
    assert store.list_databases() == ["db1"]
    assert store.archive_values("db1").count() == 0


def test_append_partitions_by_date(spark, tmp_path):
    store = _mk(spark, tmp_path)
    store.append_archive("db1", _arch(spark, [(1, T1, 1.0), (1, T2, 2.0)]))
    arch_dir = tmp_path / "warehouse" / "db1" / "archive"
    parts = {p for p in os.listdir(arch_dir) if p.startswith("ts_date=")}
    assert parts == {"ts_date=2025-01-01", "ts_date=2025-01-02"}


def test_upsert_first_wins(spark, tmp_path):
    store = _mk(spark, tmp_path)
    store.append_archive("db1", _arch(spark, [(1, T1, 1.0)]))
    store.upsert_archive("db1", _arch(spark, [(1, T1, 99.0), (2, T1, 5.0)]),
                         mode="first_wins")
    got = {(r.attribute_id, r.value)
           for r in store.archive_values("db1").collect()}
    assert got == {(1, 1.0), (2, 5.0)}  # existing wins, new key inserted


def test_upsert_last_wins(spark, tmp_path):
    store = _mk(spark, tmp_path)
    store.append_archive("db1", _arch(spark, [(1, T1, 1.0)]))
    store.upsert_archive("db1", _arch(spark, [(1, T1, 99.0)]),
                         mode="last_wins")
    got = [(r.attribute_id, r.value)
           for r in store.archive_values("db1").collect()]
    assert got == [(1, 99.0)]


def test_upsert_leaves_other_partitions_untouched(spark, tmp_path):
    store = _mk(spark, tmp_path)
    store.append_archive("db1", _arch(spark, [(1, T1, 1.0), (1, T2, 2.0)]))
    # upsert touching only T1's date partition
    store.upsert_archive("db1", _arch(spark, [(1, T1, 7.0)]),
                         mode="last_wins")
    got = {(r.attribute_id, r.timestamp, r.value)
           for r in store.archive_values("db1").collect()}
    assert got == {(1, T1, 7.0), (1, T2, 2.0)}
