"""Driver-facing query suite: SURVEY.md §2 operators mapped onto the
driver's synthetic tables (TESTDATA.md / FIXTURES.md §F7 correspondence).

Each entry is (spark_fn, oracle_sql). The spark_fn builds the DataFrame
plan with this package's operators; the oracle is ANSI SQL DuckDB runs
on the same parquet files. Column names/aliases are kept identical on
both sides (the driver hash-compares after sorting columns by name).

Correspondence (FIXTURES.md §F7):
    archive  (attribute_id, timestamp, value)  ←  events (user_id, ts, value)
    attribute dim                              ←  customer (c_custkey, c_name, c_nationkey)
    element dim / hierarchy                    ←  region → nation → customer
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from industrial_data_pipeline_spark.operators.export import (
    pivot_wide,
    timeseries_long,
)

# ---------------------------------------------------------------- loaders

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


# Fixed export parameters shared by the Spark plan and the oracle SQL.
EXPORT_IDS = list(range(8))  # user_ids 0..7 → customers 0..7
EXPORT_START = "2024-01-05 00:00:00"
EXPORT_END = "2024-01-25 00:00:00"
EXPORT_COLS = [f"Customer#{i:09d}" for i in EXPORT_IDS]


# ----------------------------------------------------------- q01 / q02

def q_export_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship long export: IN-list (P2) + inclusive range (P3) +
    3-way broadcast join (J2) + ORDER BY (W1).
    Reference: /root/reference/database/database.py:357-432."""
    return timeseries_long(
        archive_analog(spark, sf_dir),
        attribute_analog(spark, sf_dir),
        element_analog(spark, sf_dir),
        attribute_ids=EXPORT_IDS,
        start=EXPORT_START,
        end=EXPORT_END,
    )


# events.ts is TIMESTAMP_NS in DuckDB; CAST truncates to µs exactly like
# our Spark-side loader (suite.load), so values and predicates align.
ORACLE_EVENTS = "SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value, props FROM events"

ORACLE_EXPORT_LONG = f"""
SELECT e.ts AS timestamp,
       c.c_name AS attribute_name,
       e.value AS value,
       n.n_name AS element_name,
       CAST(c.c_nationkey AS BIGINT) AS element_id,
       e.user_id AS attribute_id
FROM ({ORACLE_EVENTS}) e
JOIN customer c ON e.user_id = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE e.user_id IN ({",".join(map(str, EXPORT_IDS))})
  AND e.ts >= TIMESTAMP '{EXPORT_START}'
  AND e.ts <= TIMESTAMP '{EXPORT_END}'
"""


def q_export_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship wide export: the signature long→wide pivot (A7),
    explicit column list from the dim (SURVEY.md §7.2 dynamic-pivot
    note). Reference: /root/reference/database/database.py:415-421."""
    long_df = q_export_long(spark, sf_dir)
    return pivot_wide(long_df, column_names=EXPORT_COLS)


def _oracle_pivot() -> str:
    cols = ",\n       ".join(
        f"""any_value(value) FILTER (WHERE attribute_name = '{c}') AS "{c}\""""
        for c in EXPORT_COLS
    )
    return f"""
SELECT timestamp,
       {cols}
FROM ({ORACLE_EXPORT_LONG})
GROUP BY timestamp
"""


REGISTRY: dict[str, tuple] = {
    "q01_export_long": (q_export_long, ORACLE_EXPORT_LONG),
    "q02_export_pivot": (q_export_pivot, _oracle_pivot()),
}
