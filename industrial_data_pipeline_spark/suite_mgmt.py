"""Driver-facing suite, part 12 (q112–q121): the MANAGEMENT PLANE as
oracle-checkable queries. Round-1 left D1–D6, D8, D9, T1–T3, T5,
F7–F10, S5, S8–S10 verified only by pytest; each query here runs a
real ``Pipeline``/``ParquetStore``/ingest/streaming flow against a
throwaway store seeded deterministically from the sf tables, reads the
result BACK from storage (so the parquet round-trip is part of what is
checked), and emits a table DuckDB can recompute from the raw inputs.

Fixture mapping (deterministic across SFs):
- element dim  ← region (level 0, id = r_regionkey+1)
               ∪ nation (level 1, id = n_nationkey+10, parent = region)
- attribute    ← customer c_custkey < N (element = nation analog)
- archive      ← hourly avg of events per user (values rounded to 6dp
  at seed time so derived-formula arithmetic is bit-identical between
  the engine and the oracle)

Every store is a ``tempfile.mkdtemp`` cleaned up after the result is
materialized with ``localCheckpoint`` — the returned DataFrame must
outlive the store it was read from.
"""

from __future__ import annotations

import os
import shutil
import tempfile
from datetime import datetime

from pyspark.sql import DataFrame, SparkSession, functions as F

from industrial_data_pipeline_spark.api import Pipeline
from industrial_data_pipeline_spark.suite_common import load

DB = "plant"


def _pipe(spark: SparkSession) -> tuple[Pipeline, str]:
    root = tempfile.mkdtemp(prefix="idp_mgmt_")
    return Pipeline(spark, root), root


def _finish(df: DataFrame, root: str) -> DataFrame:
    """Materialize before the store under it disappears."""
    out = df.localCheckpoint(eager=True)
    shutil.rmtree(root, ignore_errors=True)
    return out


def _element_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load(spark, sf_dir, "region").select(
        F.lit(0).cast("int").alias("level"),
        (F.col("r_regionkey") + 1).cast("long").alias("element_id"),
        F.col("r_name").alias("name"),
        F.lit(None).cast("long").alias("parent_id"))
    nation = load(spark, sf_dir, "nation").select(
        F.lit(1).cast("int").alias("level"),
        (F.col("n_nationkey") + 10).cast("long").alias("element_id"),
        F.col("n_name").alias("name"),
        (F.col("n_regionkey") + 1).cast("long").alias("parent_id"))
    return region.unionByName(nation)


def _attribute_dim(spark: SparkSession, sf_dir: str,
                   n_cust: int) -> DataFrame:
    return load(spark, sf_dir, "customer") \
        .where(F.col("c_custkey") < n_cust).select(
            (F.col("c_nationkey") + 10).cast("long").alias("element_id"),
            F.col("c_custkey").cast("long").alias("attribute_id"),
            F.col("c_name").alias("name"),
            F.lit(None).cast("string").alias("kks"),
            F.lit(None).cast("string").alias("formula"))


# three days only: every archive write costs one commit per ts_date
# partition, so the seed's date span is a direct multiplier on every
# mgmt query's wall clock (events span a month; 3 partitions exercise
# the partition-scoped paths just as well as 30)
_CUTOFF = "2024-01-04"


def _hourly_archive(spark: SparkSession, sf_dir: str,
                    user_ids: list[int]) -> DataFrame:
    """events → per-(user, hour) avg, rounded at seed time (see module
    docstring)."""
    ev = (load(spark, sf_dir, "events")
          .where(F.col("user_id").isin(user_ids))
          .where(F.col("ts") < F.lit(_CUTOFF)))
    return (ev.groupBy(
        F.col("user_id").alias("attribute_id"),
        F.date_trunc("hour", "ts").alias("timestamp"))
        .agg(F.round(F.avg("value"), 6).alias("value")))


_HOURLY_SQL = f"""
SELECT user_id AS attribute_id,
       date_trunc('hour', CAST(ts AS TIMESTAMP)) AS "timestamp",
       round(avg(value), 6) AS value
FROM events
WHERE user_id IN ({{ids}}) AND CAST(ts AS TIMESTAMP) < '{_CUTOFF}'
GROUP BY 1, 2
"""


def _seed(spark: SparkSession, sf_dir: str, n_cust: int = 50,
          archive_users: list[int] | None = None) -> tuple[Pipeline, str]:
    pipe, root = _pipe(spark)
    pipe.create_database(DB)
    pipe.store.overwrite_dim(DB, "element", _element_dim(spark, sf_dir))
    pipe.store.overwrite_dim(DB, "attribute",
                             _attribute_dim(spark, sf_dir, n_cust))
    if archive_users:
        pipe.store.append_archive(
            DB, _hourly_archive(spark, sf_dir, archive_users))
    return pipe, root


# ------------------------------------------- q112 store round-trip (D1/S8)

def q_store_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D1 create + S8 bulk load + S7 parquet round-trip: write the three
    tables, read them back from disk, emit per-table row counts."""
    pipe, root = _seed(spark, sf_dir, n_cust=50, archive_users=[1, 2, 3])
    counts = [("archive", pipe.store.archive_values(DB).count()),
              ("attribute", pipe.store.attribute(DB).count()),
              ("element", pipe.store.element(DB).count())]
    out = spark.createDataFrame(counts, "table_name string, n_rows long")
    return _finish(out, root)


ORACLE_STORE_ROUNDTRIP = f"""
SELECT 'archive' AS table_name,
       (SELECT count(*) FROM
         (SELECT user_id, date_trunc('hour', CAST(ts AS TIMESTAMP))
          FROM events WHERE user_id IN (1, 2, 3)
            AND CAST(ts AS TIMESTAMP) < '{_CUTOFF}' GROUP BY 1, 2))
           AS n_rows
UNION ALL
SELECT 'attribute', (SELECT count(*) FROM customer WHERE c_custkey < 50)
UNION ALL
SELECT 'element', (SELECT count(*) + 5 FROM nation)
"""


# ---------------------------------------------- q113 insert element (D4)

def q_insert_element(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D4: id = max+1 allocation + dim overwrite, read back from disk."""
    pipe, root = _seed(spark, sf_dir, n_cust=10)
    new_id = pipe.insert_element(DB, "NEW_UNIT", parent_id=1, level=1)
    elem = pipe.store.element(DB)
    out = (elem.where(F.col("element_id") == new_id)
           .select("element_id", "name", "parent_id", "level")
           .crossJoin(elem.agg(F.count("*").alias("n_elements"))))
    return _finish(out, root)


ORACLE_INSERT_ELEMENT = """
SELECT (SELECT max(n_nationkey) + 11 FROM nation)::BIGINT AS element_id,
       'NEW_UNIT' AS name, 1::BIGINT AS parent_id, 1 AS level,
       (SELECT count(*) + 6 FROM nation) AS n_elements
"""


# ----------------------------- q114 insert derived + backfill (D5/P10/J3)

_FORMULA = "($1 + $2) / 2"

_DERIVED_SQL = """
wide AS (
  SELECT "timestamp",
         any_value(value) FILTER (WHERE attribute_id = 1) AS v1,
         any_value(value) FILTER (WHERE attribute_id = 2) AS v2
  FROM hourly GROUP BY 1)
"""


def q_insert_attribute_backfill(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """D5: derived-attribute insert with formula validation and
    first-wins history backfill ($1+$2)/2 over the seeded hourly
    archive; emits the derived history read back from the store."""
    pipe, root = _seed(spark, sf_dir, n_cust=50, archive_users=[1, 2])
    did = pipe.insert_attribute(DB, element_id=10, name="Calc",
                                formula=_FORMULA)
    out = (pipe.store.archive_values(DB)
           .where(F.col("attribute_id") == did)
           .select("attribute_id", "timestamp",
                   F.round("value", 6).alias("value")))
    return _finish(out, root)


ORACLE_INSERT_ATTRIBUTE = f"""
WITH hourly AS ({_HOURLY_SQL.format(ids="1, 2")}),
{_DERIVED_SQL}
SELECT 50::BIGINT AS attribute_id, "timestamp",
       round((v1 + v2) / nullif(CAST(2 AS DOUBLE), 0.0), 6) AS value
FROM wide
WHERE (v1 + v2) / nullif(CAST(2 AS DOUBLE), 0.0) IS NOT NULL
"""


# -------------------------------------- q115 update derived formula (D6)

def q_update_attribute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D6: formula change on a derived attribute → old history deleted,
    new formula recomputed ($1*2); emits the full post-update history
    of the derived id (proves the old rows are gone too)."""
    pipe, root = _seed(spark, sf_dir, n_cust=50, archive_users=[1, 2])
    did = pipe.insert_attribute(DB, element_id=10, name="Calc",
                                formula=_FORMULA)
    pipe.update_attribute(DB, did, formula="$1 * 2")
    out = (pipe.store.archive_values(DB)
           .where(F.col("attribute_id") == did)
           .select("attribute_id", "timestamp",
                   F.round("value", 6).alias("value")))
    return _finish(out, root)


ORACLE_UPDATE_ATTRIBUTE = f"""
WITH hourly AS ({_HOURLY_SQL.format(ids="1, 2")})
SELECT 50::BIGINT AS attribute_id, "timestamp",
       round(value * 2, 6) AS value
FROM hourly WHERE attribute_id = 1 AND value * 2 IS NOT NULL
"""


# ------------------------------------------ q116 delete attribute (D8)

def q_delete_attribute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D8: attribute + archive cascade; emits the reference's count
    dict plus post-state counts read back from the store."""
    pipe, root = _seed(spark, sf_dir, n_cust=50,
                       archive_users=[1, 2, 3, 4, 5])
    res = pipe.delete_attribute(DB, 3)
    out = spark.createDataFrame(
        [(res["attributes_deleted"], res["archive_records_deleted"],
          pipe.store.attribute(DB).count(),
          pipe.store.archive_values(DB).count())],
        "attributes_deleted long, archive_records_deleted long, "
        "attrs_remaining long, archive_remaining long")
    return _finish(out, root)


ORACLE_DELETE_ATTRIBUTE = f"""
WITH h AS (SELECT user_id, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS t
           FROM events WHERE user_id IN (1, 2, 3, 4, 5)
             AND CAST(ts AS TIMESTAMP) < '{_CUTOFF}' GROUP BY 1, 2)
SELECT 1::BIGINT AS attributes_deleted,
       (SELECT count(*) FROM h WHERE user_id = 3)
           AS archive_records_deleted,
       (SELECT count(*) - 1 FROM customer WHERE c_custkey < 50)
           AS attrs_remaining,
       (SELECT count(*) FROM h WHERE user_id <> 3) AS archive_remaining
"""


# ------------------------------------- q117 mapping regen + reload (D9/S5)

def q_mapping_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D9 regenerate {path: id} from the catalog → F10 JSON write →
    S5 reload → J7 broadcastable mapping table. Emits the mapping rows
    after the full file round-trip."""
    from industrial_data_pipeline_spark.sources.mapping import (
        load_mapping, mapping_df)
    pipe, root = _seed(spark, sf_dir, n_cust=30)
    path = os.path.join(root, "db_map.json")
    pipe.update_mapping_cache(DB, path)
    out = mapping_df(spark, load_mapping(path))
    return _finish(out, root)


ORACLE_MAPPING_ROUNDTRIP = """
SELECT r.r_name || '|' || n.n_name || '|' || c.c_name AS lookup_key,
       c.c_custkey AS attribute_id
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE c.c_custkey < 30
"""


# ------------------------------------ q118 ingest cleanse (F7/F8/P8/J7/P9)

def q_ingest_cleanse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full cleanse pipeline on a raw batch derived from events:
    ISO strings shifted -7h (so the reference's +7h ICT shift, F7,
    lands back on the original ts), booleans mixed in (F8), unmapped
    tags dropped (P8/J7), first-wins dedup (P9)."""
    from industrial_data_pipeline_spark.sources.ingest import cleanse
    from industrial_data_pipeline_spark.sources.mapping import mapping_df
    ev = load(spark, sf_dir, "events").where(F.col("user_id") < 40)
    raw = ev.select(
        F.concat(F.lit("tag_"), F.col("user_id")).alias("lookup_key"),
        F.date_format(F.col("ts") - F.expr("INTERVAL 7 HOURS"),
                      "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("timestamp"),
        F.when(F.col("user_id") % 3 == 0, F.lit("true"))
        .when(F.col("user_id") % 3 == 1, F.lit("false"))
        .otherwise(F.col("value").cast("string")).alias("value"))
    mapping = mapping_df(
        spark, {f"tag_{i}": i for i in range(30)})  # 30..39 unmapped
    return cleanse(raw, mapping, tz_shift_hours=7)


ORACLE_INGEST_CLEANSE = """
WITH raw AS (
  SELECT user_id AS attribute_id, CAST(ts AS TIMESTAMP) AS "timestamp",
         CASE WHEN user_id % 3 = 0 THEN 1.0
              WHEN user_id % 3 = 1 THEN 0.0
              ELSE value END AS value
  FROM events WHERE user_id < 30)
SELECT attribute_id, "timestamp", min(value) AS value
FROM raw GROUP BY 1, 2
"""


# --------------------------- q119 watermark + density + recovery (T1-T3)

_T0 = "2024-03-01 08:00:00"
_WM = "2024-03-01 08:01:00"
_NOW = "2024-03-01 09:05:00"  # 2 recovery blocks: 59-min + remainder


def q_ingest_recovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1 watermark resume + T2 density circuit breaker + T3 59-minute
    block recovery, end to end: a 3-tag minute-grid fetcher against an
    expected density of 10 rows/min trips the breaker; recovery
    re-pulls in blocks without enforcement. Emits the run's ledger."""
    from industrial_data_pipeline_spark.sources.ingest import (
        IncrementalIngestor)
    from industrial_data_pipeline_spark.sources.mapping import mapping_df
    pipe, root = _pipe(spark)
    pipe.create_database(DB)
    # timestamps enter Spark as STRINGS parsed JVM-side (session TZ) —
    # a Python datetime would be interpreted in the PROCESS timezone
    # and shift the seed whenever the two differ
    pipe.store.append_archive(DB, spark.sql(
        f"SELECT 1L AS attribute_id, timestamp'{_T0}' AS timestamp, "
        f"cast(0.0 AS double) AS value"))
    fetches = []

    def fetch(start: datetime, end: datetime) -> DataFrame:
        fetches.append((start, end))
        minutes = spark.sql(
            f"SELECT explode(sequence(timestamp'{start}', "
            f"timestamp'{end}', interval 1 minute)) AS m")
        tags = spark.createDataFrame(
            [(f"tag_{i}",) for i in (1, 2, 3)], "lookup_key string")
        return minutes.crossJoin(tags).select(
            "lookup_key",
            F.date_format("m", "yyyy-MM-dd HH:mm:ss").alias("timestamp"),
            F.expr("cast(cast(unix_timestamp(m) / 60 AS BIGINT) % 997 "
                   "AS string)").alias("value"))

    ing = IncrementalIngestor(
        spark, pipe.store, DB,
        mapping_df(spark, {f"tag_{i}": i for i in (1, 2, 3)}),
        fetch, expected_rows_per_min=10, tz_shift_hours=0)
    wm = ing.watermark()
    appended = ing.run(datetime.fromisoformat(_NOW))
    arch = pipe.store.archive_values(DB)
    # ledger built JVM-side: wm re-enters as a string literal and
    # max_ts never leaves the JVM, so the emitted timestamps are
    # session-TZ-consistent under any process timezone
    out = (arch.agg(F.count("*").alias("archive_rows"),
                    F.max("timestamp").alias("max_ts"))
           .select(F.to_timestamp(F.lit(wm.isoformat(sep=" ")))
                   .alias("watermark"),
                   F.lit(appended).cast("long").alias("rows_appended"),
                   F.lit(len(fetches)).cast("long").alias("n_fetches"),
                   "archive_rows", "max_ts"))
    return _finish(out, root)


ORACLE_INGEST_RECOVERY = f"""
WITH m AS (SELECT count(*) AS mins FROM generate_series(
    TIMESTAMP '{_WM}', TIMESTAMP '{_NOW}', INTERVAL 1 MINUTE))
SELECT TIMESTAMP '{_WM}' AS watermark,
       (mins * 3)::BIGINT AS rows_appended,
       3::BIGINT AS n_fetches,
       (mins * 3 + 1)::BIGINT AS archive_rows,
       TIMESTAMP '{_NOW}' AS max_ts
FROM m
"""


# ------------------------ q135 F9 minute-truncated now() ingest bound

_F9_T0 = "2024-03-01 08:00:00"
_F9_WM = "2024-03-01 08:01:00"
_F9_WALL = "2024-03-01 08:31:17.654321"  # → bound 08:31:00
_F9_BOUND = "2024-03-01 08:31:00"


def q_ingest_now_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9 + T1: a scheduled ingest cycle whose upper bound is the
    wall clock truncated to the minute (``run_now``) — the fetch must
    stop at hh:mm:00, never a partial trailing minute, so the next
    watermark stays on the minute grid. The wall clock is injected
    with stray seconds+µs; the emitted ledger pins the truncated
    bound, the rows pulled, and the archive max."""
    from industrial_data_pipeline_spark.sources.ingest import (
        IncrementalIngestor)
    from industrial_data_pipeline_spark.sources.mapping import mapping_df
    pipe, root = _pipe(spark)
    pipe.create_database(DB)
    pipe.store.append_archive(DB, spark.sql(
        f"SELECT 1L AS attribute_id, timestamp'{_F9_T0}' AS timestamp, "
        f"cast(0.0 AS double) AS value"))

    def fetch(start: datetime, end: datetime) -> DataFrame:
        minutes = spark.sql(
            f"SELECT explode(sequence(timestamp'{start}', "
            f"timestamp'{end}', interval 1 minute)) AS m")
        tags = spark.createDataFrame(
            [(f"tag_{i}",) for i in (1, 2, 3)], "lookup_key string")
        return minutes.crossJoin(tags).select(
            "lookup_key",
            F.date_format("m", "yyyy-MM-dd HH:mm:ss").alias("timestamp"),
            F.expr("cast(cast(unix_timestamp(m) / 60 AS BIGINT) % 997 "
                   "AS string)").alias("value"))

    ing = IncrementalIngestor(
        spark, pipe.store, DB,
        mapping_df(spark, {f"tag_{i}": i for i in (1, 2, 3)}),
        fetch, expected_rows_per_min=3, tz_shift_hours=0)
    bound = ing.now_bound(datetime.fromisoformat(_F9_WALL))
    appended = ing.run_now(datetime.fromisoformat(_F9_WALL))
    arch = pipe.store.archive_values(DB)
    out = (arch.agg(F.count("*").alias("archive_rows"),
                    F.max("timestamp").alias("max_ts"))
           .select(F.to_timestamp(F.lit(bound.isoformat(sep=" ")))
                   .alias("now_bound"),
                   F.lit(appended).cast("long").alias("rows_appended"),
                   "archive_rows", "max_ts"))
    return _finish(out, root)


ORACLE_INGEST_NOW_BOUND = f"""
WITH m AS (SELECT count(*) AS mins FROM generate_series(
    TIMESTAMP '{_F9_WM}', TIMESTAMP '{_F9_BOUND}', INTERVAL 1 MINUTE))
SELECT TIMESTAMP '{_F9_BOUND}' AS now_bound,
       (mins * 3)::BIGINT AS rows_appended,
       (mins * 3 + 1)::BIGINT AS archive_rows,
       TIMESTAMP '{_F9_BOUND}' AS max_ts
FROM m
"""


# ----------------- q138 PI batch source as a custom Spark DataSource

_DS_START = "2024-02-01T00:00:00"
_DS_END = "2024-02-01T01:59:00"


def q_pi_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2 as an idiomatic PySpark custom DataSource (+T4): the tag set
    is partitioned across Spark tasks, each issuing its own batched
    pull — the scheduler replaces the reference's thread pool. The
    deterministic grid transport makes the wire content SQL-
    replayable, so request fan-out, per-partition fetch, flattening
    AND cleansing all land under the hash check."""
    import json as _json

    from industrial_data_pipeline_spark.sources.ingest import cleanse
    from industrial_data_pipeline_spark.sources.mapping import mapping_df
    from industrial_data_pipeline_spark.sources.pi_datasource import (
        PIBatchDataSource)
    spark.dataSource.register(PIBatchDataSource)
    raw = (spark.read.format("pi_batch")
           .option("base_url", "https://pi.example/piwebapi")
           .option("webids",
                   _json.dumps({f"tag_{i}": f"W{i}" for i in range(6)}))
           .option("start", _DS_START).option("end", _DS_END)
           .option("num_partitions", "3")
           .option("transport_factory",
                   "industrial_data_pipeline_spark.sources."
                   "pi_datasource:fake_grid_transport_factory")
           .load())
    mapping = mapping_df(
        spark, {f"\\\\SRV\\Plant|tag_{i}": i for i in range(6)})
    return cleanse(raw, mapping, tz_shift_hours=0)


ORACLE_PI_DATASOURCE = f"""
WITH g AS (SELECT ts FROM generate_series(
    TIMESTAMP '{_DS_START.replace("T", " ")}',
    TIMESTAMP '{_DS_END.replace("T", " ")}', INTERVAL 1 MINUTE) t(ts)),
u AS (SELECT unnest(range(6)) AS uid)
SELECT uid::BIGINT AS attribute_id, ts AS "timestamp",
       ((uid * 1000003 + epoch(ts)::BIGINT // 60) % 997)::DOUBLE AS value
FROM g CROSS JOIN u
"""


def q_pi_stream_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1 as a Structured Streaming SOURCE: the `pi_batch` stream
    reader's offset IS the ingest watermark ({"next": iso-minute});
    a bounded availableNow run pulls [start, end_bound) through the
    same wire path and cleanses into archive rows. Crash-resume is
    Spark's offset log instead of a max(timestamp) query."""
    import json as _json

    from industrial_data_pipeline_spark.sources.ingest import cleanse
    from industrial_data_pipeline_spark.sources.mapping import mapping_df
    from industrial_data_pipeline_spark.sources.pi_datasource import (
        PIBatchDataSource)
    spark.dataSource.register(PIBatchDataSource)
    end_excl = "2024-02-01T02:00:00"  # == _DS_END + 1 min (exclusive)
    raw = (spark.readStream.format("pi_batch")
           .option("base_url", "https://pi.example/piwebapi")
           .option("webids",
                   _json.dumps({f"tag_{i}": f"W{i}" for i in range(6)}))
           .option("start", _DS_START).option("end_bound", end_excl)
           .option("max_minutes_per_batch", "200")
           .option("transport_factory",
                   "industrial_data_pipeline_spark.sources."
                   "pi_datasource:fake_grid_transport_factory")
           .load())
    name = "idp_pi_stream_source"
    spark.catalog.dropTempView(name) if any(
        t.name == name for t in spark.catalog.listTables()) else None
    q = (raw.writeStream.format("memory").queryName(name)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    mapping = mapping_df(
        spark, {f"\\\\SRV\\Plant|tag_{i}": i for i in range(6)})
    return cleanse(spark.table(name), mapping, tz_shift_hours=0)


# ----------------------------------- q120 streaming CSV round-trip (S9)

def q_stream_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S9: constant-driver-memory CSV streaming (toLocalIterator) —
    the emitted text is parsed back into rows, so header, escaping and
    completeness are all under the hash check."""
    from industrial_data_pipeline_spark.operators.table_export import (
        export_table, stream_csv)
    orders = load(spark, sf_dir, "orders").where(
        F.col("o_orderkey") % 97 == 0)
    df = export_table(orders, "none").select(
        "o_orderkey", "o_custkey", "o_orderpriority")
    text = "".join(stream_csv(df, chunk_rows=500))
    lines = text.splitlines()
    assert lines[0] == "o_orderkey,o_custkey,o_orderpriority"
    rows = [(int(k), int(c), p)
            for k, c, p in (ln.split(",") for ln in lines[1:])]
    return spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_orderpriority string")


ORACLE_STREAM_CSV = """
SELECT o_orderkey, o_custkey, o_orderpriority
FROM orders WHERE o_orderkey % 97 = 0
"""


# ------------------------------- q121 streaming derived maintenance (T5)

def q_derived_maintenance_stream(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """T5: the trigger-parity maintenance job as an actual Structured
    Streaming run — source rows land as parquet files in a staging dir,
    foreachBatch appends them (last-wins) and recomputes affected
    derived timestamps. Attribute 1's rows arrive in a separate file
    from attribute 2's, so the derived values depend on the archive
    sibling lookup, not on intra-batch luck. Emits the derived history
    read back from the store."""
    from industrial_data_pipeline_spark.streaming.derived import (
        DerivedMaintenance)
    pipe, root = _seed(spark, sf_dir, n_cust=3)
    did = pipe.insert_attribute(DB, element_id=10, name="Calc",
                                formula=_FORMULA, backfill=False)
    staging = os.path.join(root, "staging")
    checkpoint = os.path.join(root, "ckpt")
    hourly = _hourly_archive(spark, sf_dir, [1, 2])
    for attr in (1, 2):  # one file per source attribute
        (hourly.where(F.col("attribute_id") == attr).coalesce(1)
         .write.mode("append").parquet(staging))
    q = DerivedMaintenance(spark, pipe.store, DB).attach_staging_dir(
        staging, checkpoint)
    q.processAllAvailable()
    q.stop()
    out = (pipe.store.archive_values(DB)
           .where(F.col("attribute_id") == did)
           .select("attribute_id", "timestamp",
                   F.round("value", 6).alias("value")))
    return _finish(out, root)


ORACLE_DERIVED_MAINTENANCE = f"""
WITH hourly AS ({_HOURLY_SQL.format(ids="1, 2")}),
{_DERIVED_SQL}
SELECT 3::BIGINT AS attribute_id, "timestamp",
       round((v1 + v2) / nullif(CAST(2 AS DOUBLE), 0.0), 6) AS value
FROM wide
WHERE (v1 + v2) / nullif(CAST(2 AS DOUBLE), 0.0) IS NOT NULL
"""


# ------------------------------------------ q123 tree reload (D2/D3/S4)

def q_tree_reload(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's scariest flow (populate.py:369-597): reload the
    hierarchy from a tree-cache file while PRESERVING derived
    attributes (backed up by path, restored under the matching parent)
    and REMAPPING archive history from old attribute ids to the new
    depth-first preorder ids. Seeds a catalog + derived backfill, then
    reloads from a JSON tree built out of region/nation/customer, and
    emits the post-reload catalog joined with per-attribute archive
    extents — id remap, derived restore and orphan purge all land in
    the hash. Oracle replays the preorder ids with one window."""
    import json

    pipe, root = _seed(spark, sf_dir, n_cust=20, archive_users=[1, 2])
    pipe.insert_attribute(DB, element_id=10, name="Calc",
                          formula=_FORMULA)  # derived id 20, backfilled

    # new tree: same logical hierarchy, fresh preorder id space
    regions = sorted(load(spark, sf_dir, "region").collect(),
                     key=lambda r: r["r_regionkey"])
    nations = sorted(load(spark, sf_dir, "nation").collect(),
                     key=lambda r: r["n_nationkey"])
    custs = sorted(load(spark, sf_dir, "customer")
                   .where(F.col("c_custkey") < 20).collect(),
                   key=lambda r: r["c_custkey"])
    doc = [{
        "name": r["r_name"],
        "children": [{
            "name": n["n_name"], "children": [],
            "attributes": [{"name": c["c_name"]} for c in custs
                           if c["c_nationkey"] == n["n_nationkey"]],
        } for n in nations if n["n_regionkey"] == r["r_regionkey"]],
        "attributes": [],
    } for r in regions]
    tree_path = os.path.join(root, "tree_cache.json")
    with open(tree_path, "w", encoding="utf-8") as f:
        json.dump(doc, f, ensure_ascii=False)

    pipe.load_tree(DB, tree_path)
    attrs = pipe.store.attribute(DB).select(
        "attribute_id", "name",
        F.col("formula").isNotNull().alias("is_derived"))
    extents = (pipe.store.archive_values(DB).groupBy("attribute_id")
               .agg(F.count("*").alias("n_rows"),
                    F.min("timestamp").alias("min_ts"),
                    F.max("timestamp").alias("max_ts")))
    out = (attrs.join(extents, "attribute_id", "left")
           .select("attribute_id", "name", "is_derived",
                   F.coalesce("n_rows", F.lit(0)).alias("n_rows"),
                   "min_ts", "max_ts"))
    return _finish(out, root)


ORACLE_TREE_RELOAD = f"""
WITH pre AS (
  SELECT c.c_custkey, c.c_name,
         row_number() OVER (ORDER BY r.r_regionkey, n.n_nationkey,
                            c.c_custkey) AS new_id
  FROM customer c
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  WHERE c.c_custkey < 20),
h AS (SELECT user_id AS aid,
             date_trunc('hour', CAST(ts AS TIMESTAMP)) AS t,
             round(avg(value), 6) AS v
      FROM events WHERE user_id IN (1, 2)
        AND CAST(ts AS TIMESTAMP) < '{_CUTOFF}' GROUP BY 1, 2),
arch AS (SELECT p.new_id AS attribute_id, h.t
         FROM h JOIN pre p ON h.aid = p.c_custkey),
dts AS (SELECT t FROM
          (SELECT t, any_value(CASE WHEN aid = 1 THEN v END) AS v1,
                  any_value(CASE WHEN aid = 2 THEN v END) AS v2
           FROM h GROUP BY t)
        WHERE (v1 + v2) / nullif(CAST(2 AS DOUBLE), 0.0) IS NOT NULL),
allrows AS (SELECT attribute_id, t FROM arch
            UNION ALL SELECT 21, t FROM dts),
agg AS (SELECT attribute_id, count(*) AS n_rows, min(t) AS min_ts,
               max(t) AS max_ts
        FROM allrows GROUP BY 1),
cat AS (SELECT new_id AS attribute_id, c_name AS name,
               FALSE AS is_derived FROM pre
        UNION ALL SELECT 21, 'Calc', TRUE)
SELECT cat.attribute_id, cat.name, cat.is_derived,
       coalesce(agg.n_rows, 0) AS n_rows, agg.min_ts, agg.max_ts
FROM cat LEFT JOIN agg USING (attribute_id)
"""


# ------------------------------------ q122 PI batch source seam (S2/J7)

def q_pi_batch_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2 end to end through the REAL request/flatten code path
    (sources/pi_client.py): a deterministic fake transport answers the
    PI batch wire shape with events-derived payloads; the engine
    builds the bulk request, flattens Content.Items[].Items[], and
    cleanses (+7h shift, coercion, mapping join, dedup). Only the
    socket is faked — same seam production injects requests into."""
    from industrial_data_pipeline_spark.sources import pi_client as PI
    from industrial_data_pipeline_spark.sources.ingest import cleanse
    from industrial_data_pipeline_spark.sources.mapping import mapping_df
    ev = (load(spark, sf_dir, "events").where(F.col("user_id") < 10)
          .select("user_id",
                  F.date_format(F.col("ts") - F.expr("INTERVAL 7 HOURS"),
                                "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
                  .alias("iso"),
                  F.col("value").cast("string").alias("v"))
          .collect())  # wire payloads are driver-side JSON by nature
    by_user: dict[int, list] = {}
    for r in ev:
        by_user.setdefault(r["user_id"], []).append(
            {"Timestamp": r["iso"], "Value": r["v"]})

    def transport(method: str, url: str, body: dict | None = None):
        assert method == "POST" and url.endswith("/batch")
        out = {}
        for rname, req in (body or {}).items():
            webid = req["resource"].split("/streamsets/")[1].split("/")[0]
            uid = int(webid.removeprefix("W"))
            out[rname] = {"Content": {"Items": [
                {"Path": f"\\\\SRV\\Plant|tag_{uid}",
                 "Items": by_user.get(uid, [])}]}}
        return out

    raw = PI.fetch_interpolated(
        spark, transport, "https://pi.example/piwebapi",
        {f"tag_{i}": f"W{i}" for i in range(10)},
        "2024-01-01T00:00:00Z", "2024-12-31T00:00:00Z")
    mapping = mapping_df(
        spark, {f"\\\\SRV\\Plant|tag_{i}": i for i in range(10)})
    return cleanse(raw, mapping, tz_shift_hours=7)


ORACLE_PI_BATCH_SOURCE = """
SELECT user_id AS attribute_id, CAST(ts AS TIMESTAMP) AS "timestamp",
       min(value) AS value
FROM events WHERE user_id < 10 GROUP BY 1, 2
"""


# -------------------------------------- q124 hierarchy crawler (S3/S4)

def q_pi_crawler(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3 end to end: the recursive PI Web API walk (assetserver →
    database → elements → leaf attributes with Point-link kks) against
    a fake transport serving region/nation/customer as the asset
    model, then S4's depth-first preorder flatten into catalog rows.
    Emits the crawled attributes with their element names."""
    from industrial_data_pipeline_spark.sources import pi_client as PI
    from industrial_data_pipeline_spark.sources.tree import flatten_tree
    regions = sorted(load(spark, sf_dir, "region").collect(),
                     key=lambda r: r["r_regionkey"])
    nations = sorted(load(spark, sf_dir, "nation").collect(),
                     key=lambda r: r["n_nationkey"])
    custs = sorted(load(spark, sf_dir, "customer")
                   .where(F.col("c_custkey") < 20).collect(),
                   key=lambda r: r["c_custkey"])
    base = "https://pi.example/piwebapi"

    def transport(method: str, url: str, body: dict | None = None):
        if url.endswith("/assetservers"):
            return {"Items": [{"WebId": "SRV1", "Name": "SRV"}]}
        if url.endswith("/assetservers/SRV1/assetdatabases"):
            return {"Items": [{"WebId": "DB", "Name": "Plant"}]}
        if url.endswith("/assetdatabases/DB/elements"):
            return {"Items": [{"WebId": f"R{r['r_regionkey']}",
                               "Name": r["r_name"]} for r in regions]}
        if "/elements/R" in url and url.endswith("/elements"):
            rk = int(url.split("/elements/R")[1].split("/")[0])
            return {"Items": [{"WebId": f"N{n['n_nationkey']}",
                               "Name": n["n_name"]}
                              for n in nations
                              if n["n_regionkey"] == rk]}
        if "/elements/N" in url and url.endswith("/elements"):
            return {"Items": []}
        if "/elements/N" in url and url.endswith("/attributes"):
            nk = int(url.split("/elements/N")[1].split("/")[0])
            return {"Items": [
                {"Name": c["c_name"], "WebId": f"A{c['c_custkey']}",
                 "Links": {"Point": f"{base}/points/P{c['c_custkey']}"}}
                for c in custs if c["c_nationkey"] == nk]}
        if "/points/P" in url:
            return {"Name": "KKS-" + url.split("/points/P")[1]}
        raise AssertionError(f"unexpected call: {method} {url}")

    roots = PI.crawl_server(transport, base)
    elements, attributes = flatten_tree(roots)
    elem = spark.createDataFrame(
        elements, "level int, element_id long, name string, "
                  "parent_id long")
    attr = spark.createDataFrame(
        attributes, "element_id long, attribute_id long, name string, "
                    "kks string, formula string")
    return (attr.join(F.broadcast(elem.select(
        "element_id", F.col("name").alias("element_name"))),
        "element_id")
        .select("attribute_id", "name", "kks", "element_name"))


ORACLE_PI_CRAWLER = """
SELECT row_number() OVER (ORDER BY r.r_regionkey, n.n_nationkey,
                          c.c_custkey) AS attribute_id,
       c.c_name AS name, 'KKS-' || c.c_custkey AS kks,
       n.n_name AS element_name
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE c.c_custkey < 20
"""


REGISTRY_MGMT: dict[str, tuple] = {
    "q112_store_roundtrip": (q_store_roundtrip, ORACLE_STORE_ROUNDTRIP),
    "q113_insert_element": (q_insert_element, ORACLE_INSERT_ELEMENT),
    "q114_insert_attribute_backfill": (q_insert_attribute_backfill,
                                       ORACLE_INSERT_ATTRIBUTE),
    "q115_update_attribute": (q_update_attribute, ORACLE_UPDATE_ATTRIBUTE),
    "q116_delete_attribute": (q_delete_attribute, ORACLE_DELETE_ATTRIBUTE),
    "q117_mapping_roundtrip": (q_mapping_roundtrip,
                               ORACLE_MAPPING_ROUNDTRIP),
    "q118_ingest_cleanse": (q_ingest_cleanse, ORACLE_INGEST_CLEANSE),
    "q119_ingest_recovery": (q_ingest_recovery, ORACLE_INGEST_RECOVERY),
    "q120_stream_csv_roundtrip": (q_stream_csv_roundtrip,
                                  ORACLE_STREAM_CSV),
    "q121_derived_maintenance_stream": (q_derived_maintenance_stream,
                                        ORACLE_DERIVED_MAINTENANCE),
    "q122_pi_batch_source": (q_pi_batch_source, ORACLE_PI_BATCH_SOURCE),
    "q123_tree_reload": (q_tree_reload, ORACLE_TREE_RELOAD),
    "q124_pi_crawler": (q_pi_crawler, ORACLE_PI_CRAWLER),
    "q135_ingest_now_bound": (q_ingest_now_bound,
                              ORACLE_INGEST_NOW_BOUND),
    "q138_pi_datasource": (q_pi_datasource, ORACLE_PI_DATASOURCE),
    # same deterministic wire content → same oracle as the batch read
    "q139_pi_stream_source": (q_pi_stream_source, ORACLE_PI_DATASOURCE),
}


# --------------------------------- q176 retention TTL partition drop

def q_retention_cleanup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention enforcement at partition granularity: seed a 3-day
    archive, TTL-expire everything before day 2
    (store.drop_archive_partitions — a directory unlink per expired
    day, metadata cost, vs the anti-join rewrite that would shuffle
    the whole history), and emit the post-TTL per-attribute extents
    plus the dropped-partition count. The reference's only retention
    is its 24 h export cleanup (web_app.py:207-222); this is the
    archive-side analog at the layout level."""
    pipe, root = _seed(spark, sf_dir, n_cust=10, archive_users=[1, 2])
    n_dropped = pipe.store.drop_archive_partitions(DB, "2024-01-02")
    out = (pipe.store.archive_values(DB)
           .groupBy("attribute_id")
           .agg(F.count("*").alias("n_rows"),
                F.min("timestamp").alias("min_ts"),
                F.max("timestamp").alias("max_ts"))
           .withColumn("n_partitions_dropped", F.lit(n_dropped)))
    return _finish(out, root)


ORACLE_RETENTION_CLEANUP = f"""
WITH h AS ({_HOURLY_SQL.format(ids="1, 2")})
SELECT attribute_id, count(*) AS n_rows,
       min("timestamp") AS min_ts, max("timestamp") AS max_ts,
       1 AS n_partitions_dropped
FROM h WHERE "timestamp" >= '2024-01-02'
GROUP BY attribute_id
"""

REGISTRY_MGMT.update({
    "q176_retention_cleanup": (q_retention_cleanup,
                               ORACLE_RETENTION_CLEANUP),
})


# -------------------------- q183 ingest quarantine (dead-letter path)

def q_ingest_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dead-letter pattern the cleanse pipeline (F7/F8/P8) implies
    but never surfaces: a deliberately dirtied wire batch (every 13th
    timestamp mangled, every 17th value non-numeric, every 23rd tag
    unmapped) is classified row by row — first-failing reason wins,
    same ordered-rules discipline as the quality gate — and the query
    emits per-reason counts plus the min/max quarantined row ids (the
    audit handle an operator actually pages through). Good rows pass
    untouched; nothing is silently dropped. All JVM-side try-casts
    (try_to_timestamp / try_cast), no Python."""
    ev = (load(spark, sf_dir, "events")
          .where(F.col("event_id") < 5000)
          .select("event_id",
                  F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS")
                  .alias("ts_raw"),
                  F.col("value").cast("string").alias("value_raw"),
                  F.col("user_id").alias("tag_id")))
    dirty = ev.select(
        "event_id",
        F.when(F.col("event_id") % 13 == 0,
               F.concat(F.lit("BAD:"), F.col("ts_raw")))
        .otherwise(F.col("ts_raw")).alias("ts_raw"),
        F.when(F.col("event_id") % 17 == 0, F.lit("n/a"))
        .otherwise(F.col("value_raw")).alias("value_raw"),
        F.when(F.col("event_id") % 23 == 0, F.lit(None).cast("long"))
        .otherwise(F.col("tag_id")).alias("tag_id"))
    ts_ok = F.try_to_timestamp(
        F.col("ts_raw"),
        F.lit("yyyy-MM-dd HH:mm:ss.SSSSSS")).isNotNull()
    val_ok = F.col("value_raw").try_cast("double").isNotNull()
    reason = (F.when(~ts_ok, F.lit("bad_timestamp"))
              .when(~val_ok, F.lit("bad_value"))
              .when(F.col("tag_id").isNull(), F.lit("unmapped_tag"))
              .otherwise(F.lit("ok")))
    return (dirty.withColumn("reason", reason)
            .groupBy("reason")
            .agg(F.count("*").alias("n_rows"),
                 F.min("event_id").alias("first_id"),
                 F.max("event_id").alias("last_id")))


ORACLE_INGEST_QUARANTINE = """
WITH d AS (SELECT event_id,
                  CASE WHEN event_id % 13 = 0 THEN 'bad_timestamp'
                       WHEN event_id % 17 = 0 THEN 'bad_value'
                       WHEN event_id % 23 = 0 THEN 'unmapped_tag'
                       ELSE 'ok' END AS reason
           FROM events WHERE event_id < 5000)
SELECT reason, count(*) AS n_rows,
       min(event_id) AS first_id, max(event_id) AS last_id
FROM d GROUP BY reason
"""

REGISTRY_MGMT.update({
    "q183_ingest_quarantine": (q_ingest_quarantine,
                               ORACLE_INGEST_QUARANTINE),
})


# -------------------- q184 referential pseudonymization (privacy op)

def q_pseudonymization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Privacy-preserving key rotation: user ids are replaced by
    salted hash64 pseudonyms INDEPENDENTLY in the fact table and the
    dimension, then the two sides join on the pseudonym — per-segment
    event/user counts must equal the raw-key join, proving the
    transformation preserved referential structure (the contract a
    GDPR-safe analytics export needs; q127 redacts content, this
    rotates identity). The oracle aggregates the raw-key join: a hash
    match IS the referential-consistency proof. 60-bit pseudonyms on
    a ~1.5k-key domain make collisions vanishingly unlikely — and a
    collision would surface as a count mismatch, not silently."""
    from industrial_data_pipeline_spark.operators.text import hash64
    salt = ":rot1"

    def pseud(col):
        return hash64(F.concat(col.cast("string"), F.lit(salt)))

    ev = (load(spark, sf_dir, "events")
          .select(pseud(F.col("user_id")).alias("puid"), "event_id"))
    cust = (load(spark, sf_dir, "customer")
            .select(pseud(F.col("c_custkey")).alias("puid"),
                    F.col("c_mktsegment").alias("segment")))
    return (ev.join(F.broadcast(cust), "puid")
            .groupBy("segment")
            .agg(F.count("*").alias("n_events"),
                 F.countDistinct("puid").alias("n_users")))


ORACLE_PSEUDONYMIZATION = """
SELECT c.c_mktsegment AS segment, count(*) AS n_events,
       count(DISTINCT e.user_id) AS n_users
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY 1
"""

REGISTRY_MGMT.update({
    "q184_pseudonymization": (q_pseudonymization,
                              ORACLE_PSEUDONYMIZATION),
})


# ----------------------- q185 JSON-lines export/ingest round-trip (S6 kin)

def q_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Format interop beyond the reference's CSV (S6/S9): an archive
    slice exports as JSON-lines (the interchange format every
    downstream ML stack ingests), reads back through an explicit
    schema, and the round-tripped slice must aggregate identically —
    timestamps via ISO-µs strings so the text round-trip is lossless
    by construction, values as exact decimal sums."""
    import tempfile

    from industrial_data_pipeline_spark.suite_common import (
        archive_analog)
    arch = (archive_analog(spark, sf_dir)
            .where(F.col("attribute_id") < 20))
    out = (arch.select(
        "attribute_id",
        F.date_format("timestamp", "yyyy-MM-dd HH:mm:ss.SSSSSS")
        .alias("ts_iso"), "value"))
    root = tempfile.mkdtemp(prefix="idp_jsonl_")
    path = os.path.join(root, "slice")
    out.write.mode("overwrite").json(path)
    back = (spark.read.schema(
        "attribute_id long, ts_iso string, value double").json(path)
        .select("attribute_id",
                F.to_timestamp("ts_iso", "yyyy-MM-dd HH:mm:ss.SSSSSS")
                .alias("timestamp"), "value"))
    res = (back.groupBy("attribute_id")
           .agg(F.count("*").alias("n_rows"),
                F.min("timestamp").alias("min_ts"),
                F.max("timestamp").alias("max_ts"),
                F.round(F.sum(F.col("value").cast("decimal(28,6)"))
                        .cast("double"), 6).alias("sum_value")))
    return _finish(res, root)


ORACLE_JSONL_ROUNDTRIP = """
SELECT user_id AS attribute_id, count(*) AS n_rows,
       min(CAST(ts AS TIMESTAMP)) AS min_ts,
       max(CAST(ts AS TIMESTAMP)) AS max_ts,
       round(CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE), 6)
           AS sum_value
FROM events WHERE user_id < 20 GROUP BY 1
"""


# -------------------- q186 order-independent table checksums (migration)

def q_table_checksums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine-replacement validation op this whole repo implies:
    an order-independent content checksum per table — bit_xor of a
    portable per-row hash over canonical string renderings — so two
    systems can certify "same rows" without shipping data. XOR makes
    the fold commutative/associative (any partitioning, any order,
    same checksum); the row hash is the same md5-derived hash64 both
    engines compute, so the oracle doesn't just replay counts, it
    replays the checksum itself."""
    from industrial_data_pipeline_spark.operators.text import hash64

    out = []
    for name, cols in (("region", ["r_regionkey", "r_name"]),
                       ("nation", ["n_nationkey", "n_name",
                                   "n_regionkey"]),
                       ("customer", ["c_custkey", "c_name",
                                     "c_nationkey"])):
        df = load(spark, sf_dir, name)
        rendered = F.concat_ws("|", *[F.col(c).cast("string")
                                      for c in cols])
        h = df.select(hash64(rendered).alias("h"))
        out.append(h.agg(F.count("*").alias("n_rows"),
                         F.expr("bit_xor(h)").alias("checksum"))
                   .withColumn("table_name", F.lit(name)))
    res = out[0]
    for o in out[1:]:
        res = res.unionByName(o)
    return res


def _oracle_table_checksums() -> str:
    def h(cols):
        rendered = " || '|' || ".join(
            f"CAST({c} AS VARCHAR)" for c in cols)
        return ("(('0x' || substr(md5(" + rendered
                + "), 1, 15))::BIGINT)")
    parts = []
    for name, cols in (("region", ["r_regionkey", "r_name"]),
                       ("nation", ["n_nationkey", "n_name",
                                   "n_regionkey"]),
                       ("customer", ["c_custkey", "c_name",
                                     "c_nationkey"])):
        parts.append(
            f"SELECT count(*) AS n_rows, bit_xor({h(cols)}) AS checksum,"
            f" '{name}' AS table_name FROM {name}")
    return " UNION ALL ".join(parts)


REGISTRY_MGMT.update({
    "q185_jsonl_roundtrip": (q_jsonl_roundtrip, ORACLE_JSONL_ROUNDTRIP),
    "q186_table_checksums": (q_table_checksums,
                             _oracle_table_checksums()),
})


# ------------------------- q193 schema evolution (add column + read)

def q_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lakehouse schema evolution on the archive: day-one files have
    the original (attribute_id, timestamp, value) schema; a later
    batch lands WITH a new `quality` column — and one mergeSchema
    read serves both vintages, old rows surfacing NULL→'good' via
    coalesce (the default-backfill contract, no rewrite of history —
    at 100 TB rewriting old files to add a column is exactly what
    this avoids). Emits per-(attribute, quality) counts across both
    vintages."""
    import tempfile

    root = tempfile.mkdtemp(prefix="idp_evo_")
    path = os.path.join(root, "archive")
    hourly = _hourly_archive(spark, sf_dir, [1, 2])
    old_rows = hourly.where(F.col("timestamp") < "2024-01-02")
    new_rows = (hourly.where(F.col("timestamp") >= "2024-01-02")
                .withColumn("quality",
                            F.when(F.col("value") > 50, "suspect")
                            .otherwise("good")))
    old_rows.write.mode("append").parquet(path)
    new_rows.write.mode("append").parquet(path)
    evolved = (spark.read.option("mergeSchema", "true").parquet(path)
               .withColumn("quality",
                           F.coalesce("quality", F.lit("good"))))
    out = (evolved.groupBy("attribute_id", "quality")
           .agg(F.count("*").alias("n_rows"),
                F.min("timestamp").alias("min_ts"),
                F.max("timestamp").alias("max_ts")))
    return _finish(out, root)


ORACLE_SCHEMA_EVOLUTION = f"""
WITH h AS ({_HOURLY_SQL.format(ids="1, 2")}),
q AS (SELECT attribute_id, "timestamp",
             CASE WHEN "timestamp" >= '2024-01-02' AND value > 50
                  THEN 'suspect' ELSE 'good' END AS quality
      FROM h)
SELECT attribute_id, quality, count(*) AS n_rows,
       min("timestamp") AS min_ts, max("timestamp") AS max_ts
FROM q GROUP BY 1, 2
"""


# -------------------- q194 upsert idempotence under redelivery (proof)

def q_upsert_idempotence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The exactly-once-sink invariant stated as a checked result:
    applying the SAME batch to the store twice (at-least-once
    redelivery) must leave the archive byte-identical — last-wins
    upsert on (attribute_id, timestamp) makes the operation
    idempotent. The query seeds, upserts a batch, upserts it AGAIN,
    and emits per-attribute extents plus row counts: any duplicate or
    drift would show in n_rows/hash. The oracle aggregates the batch
    once — applied-twice must equal applied-once."""
    pipe, root = _pipe(spark)
    pipe.create_database(DB)
    batch = _hourly_archive(spark, sf_dir, [1, 2])
    pipe.store.upsert_archive(DB, batch, mode="last_wins")
    pipe.store.upsert_archive(DB, batch, mode="last_wins")  # redeliver
    out = (pipe.store.archive_values(DB)
           .groupBy("attribute_id")
           .agg(F.count("*").alias("n_rows"),
                F.min("timestamp").alias("min_ts"),
                F.max("timestamp").alias("max_ts"),
                F.round(F.sum(F.col("value").cast("decimal(28,6)"))
                        .cast("double"), 6).alias("sum_value")))
    return _finish(out, root)


ORACLE_UPSERT_IDEMPOTENCE = f"""
WITH h AS ({_HOURLY_SQL.format(ids="1, 2")})
SELECT attribute_id, count(*) AS n_rows,
       min("timestamp") AS min_ts, max("timestamp") AS max_ts,
       round(CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE), 6)
           AS sum_value
FROM h GROUP BY 1
"""

REGISTRY_MGMT.update({
    "q193_schema_evolution": (q_schema_evolution,
                              ORACLE_SCHEMA_EVOLUTION),
    "q194_upsert_idempotence": (q_upsert_idempotence,
                                ORACLE_UPSERT_IDEMPOTENCE),
})


# --------------------------------- q205 archive compaction (S7/S8)

def q_compact_archive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction through the store: three separate
    appends (users 1, 2, 3) leave one file per appending user in
    every date partition it touches — the accumulation pattern of
    any incremental loader —
    then ``compact_archive`` rewrites each partition to one sorted
    file. Emits per-partition files before/after plus the row count
    read back AFTER compaction, so the hash match proves both the
    file-count arithmetic and that no row was lost or duplicated."""
    pipe, root = _seed(spark, sf_dir, n_cust=10)
    for u in (1, 2, 3):
        pipe.store.append_archive(
            DB, _hourly_archive(spark, sf_dir, [u]))
    stats = pipe.store.compact_archive(DB)
    sdf = spark.createDataFrame(
        stats, "ts_date string, files_before int, files_after int")
    from industrial_data_pipeline_spark.catalog.schemas import (
        ARCHIVE_PARTITION_COL)
    rows = (pipe.store.archive(DB)
            .groupBy(F.col(ARCHIVE_PARTITION_COL).cast("string")
                     .alias("ts_date"))
            .agg(F.count("*").alias("n_rows")))
    out = sdf.join(rows, "ts_date").select(
        "ts_date", "files_before", "files_after", "n_rows")
    return _finish(out, root)


ORACLE_COMPACT_ARCHIVE = f"""
WITH h AS (SELECT user_id,
                  date_trunc('hour', CAST(ts AS TIMESTAMP)) AS t
           FROM events
           WHERE user_id IN (1, 2, 3)
             AND CAST(ts AS TIMESTAMP) < '{_CUTOFF}'
           GROUP BY 1, 2)
SELECT strftime(CAST(t AS DATE), '%Y-%m-%d') AS ts_date,
       CAST(count(DISTINCT user_id) AS INT) AS files_before,
       1 AS files_after,
       count(*) AS n_rows
FROM h GROUP BY 1
"""

REGISTRY_MGMT.update({
    "q205_compact_archive": (q_compact_archive,
                             ORACLE_COMPACT_ARCHIVE),
})


# ------------------- q218 anti-entropy repair plan (checksum diff)

def q_repair_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replica reconciliation the cheap way: compare two copies of
    the event archive per DATE PARTITION with q186's
    order-independent XOR checksum first, then count row-level
    deltas ONLY for partitions whose checksums disagree — the
    anti-entropy pattern that repairs a 100 TB replica by shipping
    per-partition fingerprints instead of data. Replica B is the
    archive with a deterministic loss slice (event_id % 977 == 0
    missing), so ground truth is replayable. Emits one row per
    partition: both checksums, match flag, and (for mismatches) the
    number of rows to re-ship."""
    from industrial_data_pipeline_spark.operators.text import hash64
    ev = load(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "value")
    a = ev.withColumn("d", F.to_date("ts"))
    b = a.where(F.col("event_id") % 977 != 0)
    rendered = F.concat_ws("|", F.col("event_id").cast("string"),
                           F.col("user_id").cast("string"))

    def sums(df, tag):
        return (df.select("d", hash64(rendered).alias("h"))
                .groupBy("d")
                .agg(F.count("*").alias(f"n_{tag}"),
                     F.expr("bit_xor(h)").alias(f"ck_{tag}")))

    cmp = (sums(a, "a").join(sums(b, "b"), "d", "left")
           .select("d", "n_a", "ck_a",
                   F.coalesce("n_b", F.lit(0)).alias("n_b"),
                   F.coalesce("ck_b", F.lit(0)).alias("ck_b")))
    match = F.col("ck_a") == F.col("ck_b")
    # rows to re-ship: only computed where checksums disagree — at
    # scale the expensive row diff never runs on healthy partitions
    return cmp.select(
        F.col("d").cast("string").alias("ts_date"),
        "n_a", "n_b", match.alias("checksums_match"),
        F.when(match, F.lit(0)).otherwise(F.col("n_a") - F.col("n_b"))
        .cast("long").alias("rows_to_ship"))


def _oracle_repair_plan() -> str:
    h = ("('0x' || substr(md5(CAST(event_id AS VARCHAR) || '|' "
         "|| CAST(user_id AS VARCHAR)), 1, 15))::BIGINT")
    return f"""
WITH ev AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id
            FROM events),
a AS (SELECT CAST(ts AS DATE) AS d, count(*) AS n_a,
             bit_xor({h}) AS ck_a
      FROM ev GROUP BY 1),
b AS (SELECT CAST(ts AS DATE) AS d, count(*) AS n_b,
             bit_xor({h}) AS ck_b
      FROM ev WHERE event_id % 977 <> 0 GROUP BY 1)
SELECT strftime(a.d, '%Y-%m-%d') AS ts_date, a.n_a,
       coalesce(b.n_b, 0) AS n_b,
       a.ck_a = coalesce(b.ck_b, 0) AS checksums_match,
       CASE WHEN a.ck_a = coalesce(b.ck_b, 0) THEN 0
            ELSE a.n_a - coalesce(b.n_b, 0) END AS rows_to_ship
FROM a LEFT JOIN b USING (d)
"""

REGISTRY_MGMT.update({
    "q218_repair_plan": (q_repair_plan, _oracle_repair_plan()),
})


# ---------- q229 full trigger loop: stream → cleanse → upsert → derived

def q_stream_derived_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's complete real-time loop as ONE pipeline
    (ingest.py:217-236 fetch/cleanse/insert + database.py:694-734
    trigger): the offset-resumed ``pi_batch`` STREAM source (T1) feeds
    foreachBatch maintenance (T5) — every micro-batch is cleansed
    (F7/F8/P8/P9), upserted last-wins (W3/T7), and the derived
    attribute recomputed at the batch's affected timestamps (J3),
    sibling values coming from the just-updated archive.
    ``max_minutes_per_batch=50`` forces THREE micro-batches over the
    120-minute window, so the upsert→recompute path runs repeatedly
    against a growing archive — cross-batch state, not intra-batch
    luck. Emits source (attrs 1,2) + derived histories read back from
    the store, all SQL-replayable via the deterministic grid
    transport."""
    import json as _json

    from industrial_data_pipeline_spark.sources.ingest import cleanse
    from industrial_data_pipeline_spark.sources.mapping import mapping_df
    from industrial_data_pipeline_spark.sources.pi_datasource import (
        PIBatchDataSource)
    from industrial_data_pipeline_spark.streaming.derived import (
        DerivedMaintenance)

    spark.dataSource.register(PIBatchDataSource)
    pipe, root = _seed(spark, sf_dir, n_cust=6)
    did = pipe.insert_attribute(DB, element_id=10, name="Calc",
                                formula=_FORMULA, backfill=False)
    end_excl = "2024-02-01T02:00:00"  # == _DS_END + 1 min (exclusive)
    raw = (spark.readStream.format("pi_batch")
           .option("base_url", "https://pi.example/piwebapi")
           .option("webids",
                   _json.dumps({f"tag_{i}": f"W{i}" for i in range(6)}))
           .option("start", _DS_START).option("end_bound", end_excl)
           .option("max_minutes_per_batch", "50")
           .option("transport_factory",
                   "industrial_data_pipeline_spark.sources."
                   "pi_datasource:fake_grid_transport_factory")
           .load())
    mapping = mapping_df(
        spark, {f"\\\\SRV\\Plant|tag_{i}": i for i in range(6)})
    checkpoint = os.path.join(root, "ckpt")
    q = DerivedMaintenance(spark, pipe.store, DB).attach(
        raw, checkpoint,
        prepare=lambda b: cleanse(b, mapping, tz_shift_hours=0))
    q.processAllAvailable()
    q.stop()
    out = (pipe.store.archive_values(DB)
           .where(F.col("attribute_id").isin([1, 2, did]))
           .select("attribute_id", "timestamp", "value"))
    return _finish(out, root)


ORACLE_STREAM_DERIVED_CHAIN = f"""
WITH g AS (SELECT ts FROM generate_series(
    TIMESTAMP '{_DS_START.replace("T", " ")}',
    TIMESTAMP '{_DS_END.replace("T", " ")}', INTERVAL 1 MINUTE) t(ts)),
u AS (SELECT unnest([1, 2]) AS uid),
src AS (SELECT uid::BIGINT AS attribute_id, ts AS "timestamp",
               ((uid * 1000003 + epoch(ts)::BIGINT // 60) % 997)::DOUBLE
                   AS value
        FROM g CROSS JOIN u),
wide AS (SELECT "timestamp",
                any_value(value) FILTER (WHERE attribute_id = 1) AS v1,
                any_value(value) FILTER (WHERE attribute_id = 2) AS v2
         FROM src GROUP BY 1)
SELECT attribute_id, "timestamp", value FROM src
UNION ALL
SELECT 6::BIGINT AS attribute_id, "timestamp",
       (v1 + v2) / nullif(CAST(2 AS DOUBLE), 0.0) AS value
FROM wide
WHERE (v1 + v2) / nullif(CAST(2 AS DOUBLE), 0.0) IS NOT NULL
"""

REGISTRY_MGMT.update({
    "q229_stream_derived_chain": (q_stream_derived_chain,
                                  ORACLE_STREAM_DERIVED_CHAIN),
})
