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

from industrial_data_pipeline_spark.suite_common import (  # noqa: F401
    TABLES,
    archive_analog,
    attribute_analog,
    element_analog,
    load,
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


# ------------------------------------------------------- hierarchy analog
# region → nation → customer as a 3-level element tree (FIXTURES.md §F7);
# id offsets keep element_id unique across levels.

def hierarchy_analog(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load(spark, sf_dir, "region").select(
        F.lit(0).alias("level"),
        F.col("r_regionkey").cast("long").alias("element_id"),
        F.col("r_name").alias("name"),
        F.lit(None).cast("long").alias("parent_id"))
    nation = load(spark, sf_dir, "nation").select(
        F.lit(1).alias("level"),
        (F.col("n_nationkey") + 100).cast("long").alias("element_id"),
        F.col("n_name").alias("name"),
        F.col("n_regionkey").cast("long").alias("parent_id"))
    customer = load(spark, sf_dir, "customer").select(
        F.lit(2).alias("level"),
        (F.col("c_custkey") + 1000).cast("long").alias("element_id"),
        F.col("c_name").alias("name"),
        (F.col("c_nationkey") + 100).cast("long").alias("parent_id"))
    return region.unionByName(nation).unionByName(customer)


ORACLE_HIER = """
SELECT 0 AS level, CAST(r_regionkey AS BIGINT) AS element_id,
       r_name AS name, CAST(NULL AS BIGINT) AS parent_id FROM region
UNION ALL
SELECT 1, CAST(n_nationkey + 100 AS BIGINT), n_name,
       CAST(n_regionkey AS BIGINT) FROM nation
UNION ALL
SELECT 2, CAST(c_custkey + 1000 AS BIGINT), c_name,
       CAST(c_nationkey + 100 AS BIGINT) FROM customer
"""


# --------------------------------------------------- lookups (P5, P6, W2)

def q_lookup_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    from industrial_data_pipeline_spark.operators.lookup import lookup_dispatch
    attrs = attribute_analog(spark, sf_dir)
    return lookup_dispatch(attrs, "customer#00000000%", "attribute_id")


ORACLE_LOOKUP_LIKE = """
SELECT CAST(c_nationkey AS BIGINT) AS element_id, c_custkey AS attribute_id,
       c_name AS name
FROM customer WHERE lower(c_name) LIKE lower('customer#00000000%')
"""


def q_lookup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from industrial_data_pipeline_spark.operators.lookup import lookup_dispatch
    attrs = attribute_analog(spark, sf_dir)
    return lookup_dispatch(attrs, "Customer#000000042", "attribute_id")


ORACLE_LOOKUP_EXACT = """
SELECT CAST(c_nationkey AS BIGINT) AS element_id, c_custkey AS attribute_id,
       c_name AS name
FROM customer WHERE c_name = 'Customer#000000042'
ORDER BY c_custkey LIMIT 1
"""


# ------------------------------------------------- leaf listings (P7, A3)

def q_leaf_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    from industrial_data_pipeline_spark.operators.lookup import (
        leaf_elements_heuristic)
    return leaf_elements_heuristic(hierarchy_analog(spark, sf_dir))


ORACLE_LEAF_HEURISTIC = f"""
WITH h AS ({ORACLE_HIER})
SELECT * FROM h
WHERE parent_id IS NULL OR level = (SELECT MAX(level) FROM h)
"""


def q_leaf_true(spark: SparkSession, sf_dir: str) -> DataFrame:
    from industrial_data_pipeline_spark.operators.lookup import (
        leaf_elements_true)
    return leaf_elements_true(hierarchy_analog(spark, sf_dir))


ORACLE_LEAF_TRUE = f"""
WITH h AS ({ORACLE_HIER})
SELECT * FROM h
WHERE element_id NOT IN (
    SELECT parent_id FROM h WHERE parent_id IS NOT NULL)
"""


# ------------------------------------------------ hierarchy closure (J4)

def q_hierarchy_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    from industrial_data_pipeline_spark.operators.closure import (
        hierarchy_paths)
    return hierarchy_paths(hierarchy_analog(spark, sf_dir)) \
        .select("element_id", "path")


ORACLE_HIERARCHY_PATHS = f"""
WITH RECURSIVE h AS ({ORACLE_HIER}),
p AS (
  SELECT element_id, name, CAST(name AS VARCHAR) AS path
  FROM h WHERE parent_id IS NULL
  UNION ALL
  SELECT c.element_id, c.name, p.path || '|' || c.name
  FROM h c JOIN p ON c.parent_id = p.element_id
)
SELECT element_id, path FROM p
"""


def q_attribute_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mapping-file key computation (D9): elem|...|elem|attr."""
    from industrial_data_pipeline_spark.operators.closure import (
        attribute_paths)
    elements = hierarchy_analog(spark, sf_dir).where(F.col("level") <= 1)
    attrs = load(spark, sf_dir, "customer").select(
        (F.col("c_nationkey") + 100).cast("long").alias("element_id"),
        F.col("c_custkey").alias("attribute_id"),
        F.col("c_name").alias("name"))
    return attribute_paths(elements, attrs)


ORACLE_ATTRIBUTE_PATHS = """
SELECT c.c_custkey AS attribute_id,
       r.r_name || '|' || n.n_name || '|' || c.c_name AS attribute_path
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
"""


# ------------------------------------------- aggregates (A1, A2, A4, A5)

def q_timestamp_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-attribute available range (A1; database.py:435-450)."""
    return (archive_analog(spark, sf_dir)
            .where(F.col("attribute_id").isin(EXPORT_IDS))
            .agg(F.min("timestamp").alias("min_ts"),
                 F.max("timestamp").alias("max_ts")))


ORACLE_TIMESTAMP_RANGE = f"""
SELECT min(CAST(ts AS TIMESTAMP)) AS min_ts,
       max(CAST(ts AS TIMESTAMP)) AS max_ts
FROM events WHERE user_id IN ({",".join(map(str, EXPORT_IDS))})
"""


def q_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingestion resume point: max(ts) + 1 minute (A2+F7;
    ingest.py:217-220)."""
    return (archive_analog(spark, sf_dir)
            .agg(F.max("timestamp").alias("high_water"))
            .select(
                "high_water",
                (F.col("high_water") + F.expr("INTERVAL 1 MINUTE"))
                .alias("next_start")))


ORACLE_WATERMARK = """
SELECT max(CAST(ts AS TIMESTAMP)) AS high_water,
       max(CAST(ts AS TIMESTAMP)) + INTERVAL 1 MINUTE AS next_start
FROM events
"""


def q_distinct_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backfill driver rows (A5; database.py:589-591)."""
    return (archive_analog(spark, sf_dir)
            .where(F.col("attribute_id").isin([0, 1, 2]))
            .select("timestamp").distinct())


ORACLE_DISTINCT_TS = """
SELECT DISTINCT CAST(ts AS TIMESTAMP) AS timestamp
FROM events WHERE user_id IN (0, 1, 2)
"""


def q_grouped_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped aggregates (A4/A6): per-attribute row count + value
    stats. Float aggregates rounded to 6dp on both sides — summation
    order differs between engines."""
    return (archive_analog(spark, sf_dir)
            .groupBy("attribute_id")
            .agg(F.count("*").alias("n"),
                 F.round(F.min("value"), 6).alias("min_v"),
                 F.round(F.max("value"), 6).alias("max_v"),
                 F.round(F.avg("value"), 6).alias("avg_v")))


ORACLE_GROUPED_STATS = """
SELECT user_id AS attribute_id, count(*) AS n,
       round(min(value), 6) AS min_v, round(max(value), 6) AS max_v,
       round(avg(value), 6) AS avg_v
FROM events GROUP BY user_id
"""


def q_above_global_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-subquery filter (A3 shape): rows above the global mean."""
    ev = archive_analog(spark, sf_dir)
    g = ev.agg(F.avg("value").alias("_gavg"))
    return (ev.crossJoin(F.broadcast(g))
            .where(F.col("value") > F.col("_gavg"))
            .select("attribute_id", "timestamp", "value"))


ORACLE_ABOVE_GLOBAL_AVG = """
SELECT user_id AS attribute_id, CAST(ts AS TIMESTAMP) AS timestamp, value
FROM events WHERE value > (SELECT avg(value) FROM events)
"""


# ------------------------------------ cascades & purge (D7, J5, J6, A4)

def q_cascade_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Element cascade-delete report (D7; database.py:915-958): delete
    nation-element 110 → its customer-attributes → their events."""
    from industrial_data_pipeline_spark.operators.maintenance import (
        cascade_delete_element)
    element = hierarchy_analog(spark, sf_dir).where(F.col("level") == 1)
    attribute = load(spark, sf_dir, "customer").select(
        (F.col("c_nationkey") + 100).cast("long").alias("element_id"),
        F.col("c_custkey").alias("attribute_id"),
        F.col("c_name").alias("name"))
    archive = archive_analog(spark, sf_dir)
    _, _, _, counts = cascade_delete_element(element, attribute, archive, 110)
    return counts


ORACLE_CASCADE_COUNTS = """
SELECT CAST(1 AS BIGINT) AS elements_deleted,
       (SELECT count(*) FROM customer WHERE c_nationkey = 10)
           AS attributes_deleted,
       (SELECT count(*) FROM events
        WHERE user_id IN (SELECT c_custkey FROM customer
                          WHERE c_nationkey = 10))
           AS archive_records_deleted
"""


def q_orphan_purge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orphan purge (J6; populate.py:409-417): keep events whose
    attribute (custkey < 10) still exists."""
    from industrial_data_pipeline_spark.operators.maintenance import (
        purge_orphans)
    archive = archive_analog(spark, sf_dir)
    attrs = load(spark, sf_dir, "customer").where(
        F.col("c_custkey") < 10).select(
        F.col("c_custkey").alias("attribute_id"))
    return purge_orphans(archive, attrs)


ORACLE_ORPHAN_PURGE = """
SELECT user_id AS attribute_id, CAST(ts AS TIMESTAMP) AS timestamp, value
FROM events WHERE user_id IN (SELECT c_custkey FROM customer
                              WHERE c_custkey < 10)
"""


# ------------------------------------------ upsert semantics (W3, P9, T6)

def q_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-wins (W3; trigger ON CONFLICT DO UPDATE, database.py:710-713):
    latest event per (attribute, type)."""
    from industrial_data_pipeline_spark.operators.maintenance import (
        latest_per_key)
    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "value")
    return latest_per_key(ev, ["user_id", "event_type"], "ts")


ORACLE_LATEST_PER_KEY = """
SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, value
FROM (SELECT user_id, event_type, ts, value,
             row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts DESC) AS rn
      FROM events) WHERE rn = 1
"""


def q_dedup_first_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-wins dedup (P9/T6; ingest.py:156): earliest event per
    (attribute, type)."""
    from industrial_data_pipeline_spark.operators.maintenance import (
        dedup_first_wins)
    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "value")
    return dedup_first_wins(ev, ["user_id", "event_type"], "ts")


ORACLE_DEDUP_FIRST_WINS = """
SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, value
FROM (SELECT user_id, event_type, ts, value,
             row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts ASC) AS rn
      FROM events) WHERE rn = 1
"""


# -------------------------------------- formula backfill (J3, F6, P10, A5)

BACKFILL_FORMULA = "($1 + $2) / 2"


def q_formula_backfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived-attribute backfill (J3 via pivot + F6 + P10;
    database.py:539-605): sources = hourly click/view averages, derived
    = their mean where both present."""
    from industrial_data_pipeline_spark.operators.derived import (
        backfill_derived)
    # archive analog keyed by event_type: attr 1 = click, 2 = view,
    # timestamps aligned to the hour so sources can coincide.
    ev = load(spark, sf_dir, "events")
    archive = (
        ev.where(F.col("event_type").isin(["click", "view"]))
        .groupBy(
            F.when(F.col("event_type") == "click", F.lit(1)).otherwise(2)
            .cast("long").alias("attribute_id"),
            F.date_trunc("hour", F.col("ts")).alias("timestamp"))
        .agg(F.avg("value").alias("value"))
    )
    out = backfill_derived(archive, derived_id=99, formula=BACKFILL_FORMULA)
    return out.select("attribute_id", "timestamp",
                      F.round("value", 6).alias("value"))


ORACLE_FORMULA_BACKFILL = """
WITH src AS (
  SELECT CASE WHEN event_type = 'click' THEN 1 ELSE 2 END AS attribute_id,
         date_trunc('hour', CAST(ts AS TIMESTAMP)) AS timestamp,
         avg(value) AS value
  FROM events WHERE event_type IN ('click', 'view')
  GROUP BY 1, 2
),
wide AS (
  SELECT timestamp,
         any_value(value) FILTER (WHERE attribute_id = 1) AS c1,
         any_value(value) FILTER (WHERE attribute_id = 2) AS c2
  FROM src GROUP BY timestamp
)
SELECT CAST(99 AS BIGINT) AS attribute_id, timestamp,
       round((c1 + c2) / NULLIF(CAST(2 AS DOUBLE), 0.0), 6) AS value
FROM wide WHERE (c1 + c2) / NULLIF(CAST(2 AS DOUBLE), 0.0) IS NOT NULL
"""


# ---------------------------------------- legacy export / set ops / OLAP


def q_legacy_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Legacy generic-export BETWEEN filter (P4; routes.py:53-67)."""
    from industrial_data_pipeline_spark.operators.table_export import (
        export_table)
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_shipdate", "l_quantity")
    return export_table(li, "time_range", "l_shipdate",
                        "1996-01-01 00:00:00", "1996-12-31 00:00:00")


ORACLE_LEGACY_BETWEEN = """
SELECT l_orderkey, l_linenumber, l_shipdate, l_quantity
FROM lineitem
WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                     AND TIMESTAMP '1996-12-31 00:00:00'
"""


def q_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set op (U1): overlapping event slices unioned + distinct."""
    ev = load(spark, sf_dir, "events").select("event_id", "user_id")
    a = ev.where(F.col("user_id") < 8)
    b = ev.where(F.col("user_id").between(4, 12))
    return a.unionByName(b).distinct()


ORACLE_UNION_DISTINCT = """
SELECT DISTINCT event_id, user_id FROM (
  SELECT event_id, user_id FROM events WHERE user_id < 8
  UNION ALL
  SELECT event_id, user_id FROM events WHERE user_id BETWEEN 4 AND 12)
"""


def q_olap_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-shaped pricing summary on lineitem. Money sums run in
    DECIMAL (exact, order-independent — a parallel double sum would
    differ from the oracle in the last ulps) and convert to DOUBLE once
    at the end."""
    li = load(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").cast("double").alias("sum_qty"),
            F.sum(dec("l_extendedprice")).cast("double")
            .alias("sum_base_price"),
            F.sum(dec("l_extendedprice")
                  * (F.lit(1).cast("decimal(18,2)") - dec("l_discount")))
            .cast("double").alias("sum_disc_price"),
            F.count("*").alias("count_order"),
        )
    )


ORACLE_OLAP_PRICING = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(l_quantity) AS DOUBLE) AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
           AS sum_base_price,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,2))
                   - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
           AS sum_disc_price,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def q_star_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join: fact ⋈ two broadcast dims with pushed-down filters —
    the shape every 100 TB fact query takes."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").where(F.col("p_size") <= 20) \
        .select("p_partkey", "p_brand")
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .groupBy("p_brand", "s_name")
        .agg(F.sum(dec("l_extendedprice") *
                   (F.lit(1).cast("decimal(18,2)") - dec("l_discount")))
             .cast("double").alias("revenue"),
             F.count("*").alias("n_items"))
    )


ORACLE_STAR_JOIN = """
SELECT p_brand, s_name,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,2))
                   - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
           AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
WHERE p_size <= 20
GROUP BY p_brand, s_name
"""


def q_recursive_cte_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 in the reference's LITERAL shape: the hierarchy closure as a
    Spark ≥ 4.0 ``WITH RECURSIVE`` CTE (SPARK-24497 — SURVEY §4.2's
    named forward path), against the same recursive-SQL oracle as
    q07's iterative loop. Feature-probed: on a Spark without
    recursive CTEs the call falls back to the loop, so the query is
    green either way and the verdict certifies whichever path ran.
    The loop remains the project default (localCheckpoint per level;
    see operators/closure.py docstrings)."""
    from industrial_data_pipeline_spark.operators.closure import (
        hierarchy_paths_recursive)
    return hierarchy_paths_recursive(hierarchy_analog(spark, sf_dir)) \
        .select("element_id", "path")


from industrial_data_pipeline_spark.suite_llm import REGISTRY_LLM  # noqa: E402

REGISTRY: dict[str, tuple] = {
    "q01_export_long": (q_export_long, ORACLE_EXPORT_LONG),
    "q02_export_pivot": (q_export_pivot, _oracle_pivot()),
    "q03_lookup_like": (q_lookup_like, ORACLE_LOOKUP_LIKE),
    "q04_lookup_exact": (q_lookup_exact, ORACLE_LOOKUP_EXACT),
    "q05_leaf_heuristic": (q_leaf_heuristic, ORACLE_LEAF_HEURISTIC),
    "q06_leaf_true": (q_leaf_true, ORACLE_LEAF_TRUE),
    "q07_hierarchy_paths": (q_hierarchy_paths, ORACLE_HIERARCHY_PATHS),
    "q08_attribute_paths": (q_attribute_paths, ORACLE_ATTRIBUTE_PATHS),
    "q09_timestamp_range": (q_timestamp_range, ORACLE_TIMESTAMP_RANGE),
    "q10_watermark": (q_watermark, ORACLE_WATERMARK),
    "q11_distinct_ts": (q_distinct_ts, ORACLE_DISTINCT_TS),
    "q12_grouped_stats": (q_grouped_stats, ORACLE_GROUPED_STATS),
    "q13_above_global_avg": (q_above_global_avg, ORACLE_ABOVE_GLOBAL_AVG),
    "q14_cascade_counts": (q_cascade_counts, ORACLE_CASCADE_COUNTS),
    "q15_orphan_purge": (q_orphan_purge, ORACLE_ORPHAN_PURGE),
    "q16_latest_per_key": (q_latest_per_key, ORACLE_LATEST_PER_KEY),
    "q17_dedup_first_wins": (q_dedup_first_wins, ORACLE_DEDUP_FIRST_WINS),
    "q18_formula_backfill": (q_formula_backfill, ORACLE_FORMULA_BACKFILL),
    "q230_recursive_cte_paths": (q_recursive_cte_paths,
                                 ORACLE_HIERARCHY_PATHS),
}
REGISTRY.update(REGISTRY_LLM)
from industrial_data_pipeline_spark.suite_ts import REGISTRY_TS  # noqa: E402

REGISTRY.update(REGISTRY_TS)
from industrial_data_pipeline_spark.suite_events import REGISTRY_EVENTS  # noqa: E402

REGISTRY.update(REGISTRY_EVENTS)
from industrial_data_pipeline_spark.suite_olap import REGISTRY_OLAP  # noqa: E402

REGISTRY.update(REGISTRY_OLAP)
from industrial_data_pipeline_spark.suite_corpus import REGISTRY_CORPUS  # noqa: E402

REGISTRY.update(REGISTRY_CORPUS)
from industrial_data_pipeline_spark.suite_scale import REGISTRY_SCALE  # noqa: E402

REGISTRY.update(REGISTRY_SCALE)
from industrial_data_pipeline_spark.suite_pipeline import REGISTRY_PIPELINE  # noqa: E402

REGISTRY.update(REGISTRY_PIPELINE)
REGISTRY.update({
    "q32_legacy_between": (q_legacy_between, ORACLE_LEGACY_BETWEEN),
    "q33_union_distinct": (q_union_distinct, ORACLE_UNION_DISTINCT),
    "q34_olap_pricing_summary": (q_olap_pricing_summary,
                                 ORACLE_OLAP_PRICING),
    "q35_star_join": (q_star_join, ORACLE_STAR_JOIN),
})
from industrial_data_pipeline_spark.suite_olap2 import REGISTRY_OLAP2  # noqa: E402

REGISTRY.update(REGISTRY_OLAP2)
from industrial_data_pipeline_spark.suite_vectors import REGISTRY_VECTORS  # noqa: E402

REGISTRY.update(REGISTRY_VECTORS)
from industrial_data_pipeline_spark.suite_behavior import REGISTRY_BEHAVIOR  # noqa: E402

REGISTRY.update(REGISTRY_BEHAVIOR)
from industrial_data_pipeline_spark.suite_graph import REGISTRY_GRAPH  # noqa: E402

REGISTRY.update(REGISTRY_GRAPH)
from industrial_data_pipeline_spark.suite_olap3 import REGISTRY_OLAP3  # noqa: E402

REGISTRY.update(REGISTRY_OLAP3)
from industrial_data_pipeline_spark.suite_dataeng import REGISTRY_DATAENG  # noqa: E402

REGISTRY.update(REGISTRY_DATAENG)
from industrial_data_pipeline_spark.suite_advanced import REGISTRY_ADVANCED  # noqa: E402

REGISTRY.update(REGISTRY_ADVANCED)
from industrial_data_pipeline_spark.suite_sketches import REGISTRY_SKETCHES  # noqa: E402

REGISTRY.update(REGISTRY_SKETCHES)
from industrial_data_pipeline_spark.suite_mgmt import REGISTRY_MGMT  # noqa: E402

REGISTRY.update(REGISTRY_MGMT)

# query name → suite label, for bench rollups (bench.py prints one
# compact per-suite line; the full per-query map goes to
# BENCH_DETAIL.json because the driver keeps only the output tail)
SUITE_OF: dict[str, str] = {}
for _label, _reg in [
    ("llm", REGISTRY_LLM), ("ts", REGISTRY_TS),
    ("events", REGISTRY_EVENTS), ("olap", REGISTRY_OLAP),
    ("corpus", REGISTRY_CORPUS), ("scale", REGISTRY_SCALE),
    ("pipeline", REGISTRY_PIPELINE), ("olap2", REGISTRY_OLAP2),
    ("vectors", REGISTRY_VECTORS), ("behavior", REGISTRY_BEHAVIOR),
    ("graph", REGISTRY_GRAPH), ("olap3", REGISTRY_OLAP3),
    ("dataeng", REGISTRY_DATAENG), ("advanced", REGISTRY_ADVANCED),
    ("sketches", REGISTRY_SKETCHES), ("mgmt", REGISTRY_MGMT),
]:
    for _n in _reg:
        SUITE_OF.setdefault(_n, _label)
for _n in REGISTRY:  # everything defined in this module directly
    SUITE_OF.setdefault(_n, "core")


# ------------------- q190 hierarchy contribution (share of parent)

def q_hierarchy_contribution(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """Contribution analysis over the reference's own asset tree: each
    element's archive total as a SHARE of its parent's total — the
    "which unit drives the plant's consumption" rollup (hierarchy =
    region→nation→customer analog, values = events). Decimal sums at
    every level (child totals sum exactly into parent totals), shares
    as single IEEE divisions of the exact totals, emitted raw."""
    ev = (load(spark, sf_dir, "events")
          .groupBy("user_id")
          .agg(F.sum(F.col("value").cast("decimal(28,6)"))
               .alias("_s"), F.count("*").alias("_n")))
    cust = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_nationkey").alias("nation_id"))
    nat = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("nation_id"),
        F.col("n_regionkey").alias("region_id"))
    per_nation = (ev.join(F.broadcast(cust), "user_id")
                  .join(F.broadcast(nat), "nation_id")
                  .groupBy("region_id", "nation_id")
                  .agg(F.sum("_s").alias("_ns"),
                       F.sum("_n").alias("n_events")))
    per_region = (per_nation.groupBy("region_id")
                  .agg(F.sum("_ns").alias("_rs")))
    return (per_nation.join(F.broadcast(per_region), "region_id")
            .select("region_id", "nation_id", "n_events",
                    F.col("_ns").cast("double").alias("nation_sum"),
                    ((F.col("_ns").cast("double")
                      / F.col("_rs").cast("double")) + F.lit(0.0))
                    .alias("share_of_region")))


ORACLE_HIERARCHY_CONTRIBUTION = """
WITH pn AS (SELECT n.n_regionkey AS region_id,
                   c.c_nationkey AS nation_id,
                   count(*) AS n_events,
                   sum(CAST(e.value AS DECIMAL(28,6))) AS ns
            FROM events e
            JOIN customer c ON e.user_id = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            GROUP BY 1, 2),
pr AS (SELECT region_id, sum(ns) AS rs FROM pn GROUP BY 1)
SELECT pn.region_id, pn.nation_id, pn.n_events,
       CAST(pn.ns AS DOUBLE) AS nation_sum,
       (CAST(pn.ns AS DOUBLE) / CAST(pr.rs AS DOUBLE)) + 0.0
           AS share_of_region
FROM pn JOIN pr USING (region_id)
"""

REGISTRY["q190_hierarchy_contribution"] = (
    q_hierarchy_contribution, ORACLE_HIERARCHY_CONTRIBUTION)
