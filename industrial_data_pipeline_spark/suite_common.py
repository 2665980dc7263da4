"""Shared loaders for the driver-facing query suites: the synthetic
tables (TESTDATA.md) and their recasts onto the reference's archive/
attribute/element shapes (FIXTURES.md §F7)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # runtime-settable SQL conf; the caller's session (e.g. the
        # driver's) won't have it — without it the TIMESTAMP(NANOS)
        # parquet column fails the scan with PARQUET_TYPE_ILLEGAL.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    # events.ts is TIMESTAMP(NANOS) parquet → read as long ns (see
    # session.py nanosAsLong) and truncate to Spark's µs precision.
    # Matches the oracle-side CAST(ts AS TIMESTAMP) (DuckDB truncates).
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def archive_analog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events recast to the archive shape (attribute_id, timestamp, value)."""
    return load(spark, sf_dir, "events").select(
        F.col("user_id").alias("attribute_id"),
        F.col("ts").alias("timestamp"),
        "value",
    )


def attribute_analog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer recast to the attribute-dim shape."""
    return load(spark, sf_dir, "customer").select(
        F.col("c_nationkey").cast("long").alias("element_id"),
        F.col("c_custkey").alias("attribute_id"),
        F.col("c_name").alias("name"),
    )


def element_analog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nation recast to the element-dim shape."""
    return load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("long").alias("element_id"),
        F.col("n_name").alias("name"),
    )
