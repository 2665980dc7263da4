"""Batch-parity Structured Streaming queries: the same aggregation a
batch query would run, executed through ``readStream`` → windowed agg →
memory sink with ``Trigger.AvailableNow`` — so the result is a bounded,
collectable DataFrame whose contents must equal the batch oracle.

This is the suite's proof that the streaming path (T1/T5 shapes,
SURVEY.md §2.8) produces the same answers as batch: the driver's
correctness gate compares the memory-sink table against plain SQL.

Scale notes: on an unbounded source the same plan runs with a real
watermark + append mode; ``complete`` output here is what makes the
bounded availableNow run return the full aggregate in one table. State
is keyed by (hour window × event_type) — cardinality-bounded, not
row-bounded, so executor state stays small at any input size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def hourly_event_counts_stream(
        spark: SparkSession, sf_dir: str,
        table_name: str = "idp_stream_hourly_counts") -> DataFrame:
    """Hourly (window-start, event_type) counts over the events table,
    computed by an actual streaming query (availableNow) into a memory
    sink; returns the sink table as a batch DataFrame."""
    # the driver's vanilla session needs the nanos conf at runtime —
    # events.parquet is TIMESTAMP(NANOS) (read as long ns, see
    # suite_common.load).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = f"{sf_dir}/events.parquet"
    schema = spark.read.parquet(path).schema  # stream sources need one
    # the file stream source requires a DIRECTORY path; select just the
    # events file out of the shared sf_dir with a glob filter
    src = (spark.readStream.schema(schema)
           .option("pathGlobFilter", "events.parquet").parquet(sf_dir))
    ts_col = dict(src.dtypes).get("ts")
    ts = (F.timestamp_micros(F.expr("ts div 1000")) if ts_col == "bigint"
          else F.col("ts"))
    agg = (
        src.select(ts.alias("ts"), "event_type")
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("hour_start"), "event_type", "n")
    )
    # a leftover temp view from a prior run in the same session would
    # collide with the memory sink's queryName
    spark.catalog.dropTempView(table_name) if any(
        t.name == table_name for t in spark.catalog.listTables()) else None
    q = (agg.writeStream.format("memory").queryName(table_name)
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination()
    return spark.table(table_name)
