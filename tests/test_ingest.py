"""Incremental ingestion: cleansing (F7/F8), mapping join (J7),
watermark (T1), density gate (T2), hourly recovery (T3)."""

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from industrial_data_pipeline_spark.catalog.store import ParquetStore
from industrial_data_pipeline_spark.sources.ingest import (
    DensityError,
    IncrementalIngestor,
    RAW_SCHEMA,
    cleanse,
)
from industrial_data_pipeline_spark.sources.mapping import mapping_df

MAP = {"\\\\SRV\\Plant1\\Boiler\\FanA|Temperature": 1,
       "\\\\SRV\\Plant1\\Boiler\\FanA|Pressure": 2}


def _mapping(spark):
    return mapping_df(spark, MAP)


def test_cleanse_tz_shift_and_coercion(spark):
    key = "\\\\SRV\\Plant1\\Boiler\\FanA|Temperature"
    raw = spark.createDataFrame([
        (key, "2025-01-01T00:00:00Z", "12.5"),
        (key, "2025-01-01T00:01:00Z", "True"),
        (key, "2025-01-01T00:02:00Z", "false"),
        (key, "2025-01-01T00:03:00Z", "Bad Value"),   # → NULL
        ("unmapped|key", "2025-01-01T00:00:00Z", "1"),  # dropped (P8)
        (key, "2025-01-01T00:00:00Z", "99.0"),        # dup ts (P9)
    ], RAW_SCHEMA)
    out = cleanse(raw, _mapping(spark), tz_shift_hours=7)
    rows = {r.timestamp: r.value for r in out.collect()}
    # +7h shift (ingest.py:146 parity)
    assert datetime(2025, 1, 1, 7, 0) in rows
    assert out.count() == 4  # unmapped dropped, dup collapsed
    assert rows[datetime(2025, 1, 1, 7, 0)] == 12.5  # first-wins (by value)
    assert rows[datetime(2025, 1, 1, 7, 1)] == 1.0   # True → 1
    assert rows[datetime(2025, 1, 1, 7, 2)] == 0.0   # false → 0
    assert rows[datetime(2025, 1, 1, 7, 3)] is None  # bad → NULL


def _fake_fetch(spark, key, rows_per_min):
    """Deterministic PI-batch stand-in: one row per minute per key."""
    def fetch(start: datetime, end: datetime):
        rows = []
        t = start
        while t < end:
            for i in range(rows_per_min):
                rows.append(
                    (key, t.strftime("%Y-%m-%dT%H:%M:%S") + f".{i:02d}0Z",
                     "1.0"))
            t += timedelta(minutes=1)
        return spark.createDataFrame(rows, RAW_SCHEMA)
    return fetch


def test_watermark_resume_and_append(spark, tmp_path):
    store = ParquetStore(spark, str(tmp_path / "wh"))
    store.create_database("db1")
    key = "\\\\SRV\\Plant1\\Boiler\\FanA|Temperature"
    # tz_shift 0: watermark lives in archive time; with a shift the
    # resume point would be 7h ahead of the fetch clock (as in the
    # reference, where PI server time and archive time share the zone)
    ing = IncrementalIngestor(
        spark, store, "db1", _mapping(spark),
        _fake_fetch(spark, key, rows_per_min=1),
        expected_rows_per_min=1, tz_shift_hours=0,
        default_start=datetime(2025, 1, 1, 0, 0))
    now = datetime(2025, 1, 1, 0, 30)
    n = ing.run(now)
    assert n == 30
    # watermark advanced: next run pulls only the delta
    wm = ing.watermark()
    assert wm == store.archive_values("db1").agg(
        F.max("timestamp")).first()[0] + timedelta(minutes=1)
    n2 = ing.run(datetime(2025, 1, 1, 1, 0))
    assert n2 > 0 and store.archive_values("db1").count() == n + n2


def test_density_gate_triggers_recovery(spark, tmp_path):
    store = ParquetStore(spark, str(tmp_path / "wh"))
    store.create_database("db1")
    key = "\\\\SRV\\Plant1\\Boiler\\FanA|Temperature"
    calls = []
    inner = _fake_fetch(spark, key, rows_per_min=1)

    def counting_fetch(start, end):
        calls.append((start, end))
        return inner(start, end)

    ing = IncrementalIngestor(
        spark, store, "db1", _mapping(spark), counting_fetch,
        expected_rows_per_min=10,   # demands 10× what the fake returns
        default_start=datetime(2025, 1, 1, 0, 0))
    n = ing.run(datetime(2025, 1, 1, 2, 0))
    # recovery pulled 59-min blocks (T3): first failed full pull, then ≥2
    assert len(calls) >= 3
    assert n == store.archive_values("db1").count() > 0
    block = calls[1]
    assert (block[1] - block[0]) <= timedelta(minutes=59)


def test_density_error_message(spark, tmp_path):
    store = ParquetStore(spark, str(tmp_path / "wh"))
    store.create_database("db1")
    key = "\\\\SRV\\Plant1\\Boiler\\FanA|Temperature"
    ing = IncrementalIngestor(
        spark, store, "db1", _mapping(spark),
        _fake_fetch(spark, key, 1), expected_rows_per_min=10)
    with pytest.raises(DensityError, match="expected >="):
        ing.pull(datetime(2025, 1, 1), datetime(2025, 1, 1, 0, 10))
