"""PI batch extraction as a PySpark custom DataSource (S2+T4):
partitioned parallel pulls through the real request/flatten path."""

import json

from pyspark.sql import functions as F

from industrial_data_pipeline_spark.sources.pi_datasource import (
    PIBatchDataSource,
    PIBatchReader,
    fake_grid_transport_factory,
    resolve_factory,
)

_FACTORY = ("industrial_data_pipeline_spark.sources.pi_datasource:"
            "fake_grid_transport_factory")


def _options(n_tags=5, n_parts=3):
    return {
        "base_url": "https://pi.example/piwebapi",
        "webids": json.dumps({f"tag_{i}": f"W{i}" for i in range(n_tags)}),
        "start": "2024-01-01T00:00:00",
        "end": "2024-01-01T00:59:00",
        "interval": "1m",
        "num_partitions": str(n_parts),
        "transport_factory": _FACTORY,
    }


def test_partitions_round_robin_and_drop_empty():
    r = PIBatchReader(_options(n_tags=2, n_parts=4))
    parts = r.partitions()
    assert len(parts) == 2  # empty chunks dropped
    assert sorted(k for p in parts for k in p.webids) == ["tag_0", "tag_1"]
    r5 = PIBatchReader(_options(n_tags=5, n_parts=3))
    sizes = sorted(len(p.webids) for p in r5.partitions())
    assert sizes == [1, 2, 2]


def test_resolve_factory_validates():
    import pytest
    assert resolve_factory(_FACTORY) is fake_grid_transport_factory
    with pytest.raises(ValueError, match="module:function"):
        resolve_factory("not-a-spec")


def test_datasource_reads_parallel_grid(spark):
    spark.dataSource.register(PIBatchDataSource)
    df = (spark.read.format("pi_batch")
          .options(**_options(n_tags=5, n_parts=3)).load())
    assert df.rdd.getNumPartitions() == 3  # one task per chunk
    rows = df.collect()
    assert len(rows) == 5 * 60  # 5 tags x 60 minutes
    # wire contract: values replay the deterministic grid formula
    got = {(r.lookup_key, r.timestamp): r.value for r in rows}
    from datetime import datetime
    t0 = datetime.fromisoformat("2024-01-01T00:30:00")
    minute = int(t0.timestamp() // 60)
    key = ("\\\\SRV\\Plant|tag_3", t0.isoformat(sep="T"))
    assert got[key] == str((3 * 1000003 + minute) % 997)


def test_stream_reader_offsets_and_bounded_run(spark):
    """Streaming PI source: minute-watermark offsets advance in
    max_minutes chunks; a bounded availableNow run lands every minute
    in [start, end_bound) exactly once."""
    from industrial_data_pipeline_spark.sources.pi_datasource import (
        PIBatchStreamReader)
    opts = {
        "base_url": "https://pi.example/piwebapi",
        "webids": json.dumps({f"tag_{i}": f"W{i}" for i in range(2)}),
        "start": "2024-03-01T00:00:00",
        "end_bound": "2024-03-01T02:00:00",
        "max_minutes_per_batch": "45",
        "transport_factory": _FACTORY,
    }
    # unit level: offsets advance by 46-minute strides then clamp
    r = PIBatchStreamReader(opts)
    assert r.initialOffset() == {"next": "2024-03-01T00:00:00"}
    # read() returns (ITERATOR, offset) — the prefetch wrapper calls
    # next() on the rows (q229 regression)
    it1, o1 = r.read({"next": "2024-03-01T00:00:00"})
    rows1 = list(it1)
    assert o1 == {"next": "2024-03-01T00:46:00"}
    assert len(rows1) == 46 * 2
    it2, o2 = r.read(o1)
    rows2 = list(it2)
    assert o2 == {"next": "2024-03-01T01:32:00"}
    it3, o3 = r.read(o2)
    rows3 = list(it3)
    assert o3 == {"next": "2024-03-01T02:00:00"}
    itX, oX = r.read(o3)
    assert list(itX) == [] and oX == o3  # caught up
    assert len(rows1) + len(rows2) + len(rows3) == 120 * 2
    # replay determinism: re-reading a committed range is identical
    assert list(r.readBetweenOffsets(
        {"next": "2024-03-01T00:00:00"}, o1)) == rows1

    # end to end through Structured Streaming (availableNow consumes
    # ONE prefetched batch from a simple stream reader, so cover the
    # bounded range in a single stride; multi-batch offset
    # progression is pinned by the unit assertions above)
    spark.dataSource.register(PIBatchDataSource)
    stream = (spark.readStream.format("pi_batch")
              .options(**{**opts, "max_minutes_per_batch": "200"})
              .load())
    name = "pi_stream_sink"
    q = (stream.writeStream.format("memory").queryName(name)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    got = spark.table(name).collect()
    assert len(got) == 120 * 2
    assert len({(r.lookup_key, r.timestamp) for r in got}) == 240


def test_datasource_feeds_cleanse(spark):
    from industrial_data_pipeline_spark.sources.ingest import cleanse
    from industrial_data_pipeline_spark.sources.mapping import mapping_df
    spark.dataSource.register(PIBatchDataSource)
    raw = (spark.read.format("pi_batch")
           .options(**_options(n_tags=3, n_parts=2)).load())
    mapping = mapping_df(
        spark, {f"\\\\SRV\\Plant|tag_{i}": i for i in range(3)})
    out = cleanse(raw, mapping, tz_shift_hours=0)
    assert out.count() == 3 * 60
    assert out.where(F.col("value").isNull()).count() == 0
    assert set(out.columns) == {"attribute_id", "timestamp", "value"}
