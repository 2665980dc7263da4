"""Fixed schemas for the three catalog tables.

Mirrors the reference's data model (SURVEY.md §1.1; reference DDL at
/root/reference/src/database/populate.py:86-110) with two deliberate
changes (SURVEY.md §7.0):

- ``archive_id`` surrogate is dropped — identity is the unique
  ``(attribute_id, timestamp)`` pair, which is what every query and
  the upsert discipline actually use.
- ``attribute.formula`` is a first-class nullable column — derived ⇔
  ``formula IS NOT NULL`` — replacing the reference's "probe pg_proc
  for a generated trigger function" metadata smell
  (/root/reference/database/database.py:991-1005).
"""

from __future__ import annotations

from pyspark.sql import types as T

ELEMENT_SCHEMA = T.StructType([
    T.StructField("level", T.IntegerType(), False),
    T.StructField("element_id", T.LongType(), False),
    T.StructField("name", T.StringType(), False),
    T.StructField("parent_id", T.LongType(), True),  # NULL for roots
])

ATTRIBUTE_SCHEMA = T.StructType([
    T.StructField("element_id", T.LongType(), False),
    T.StructField("attribute_id", T.LongType(), False),
    T.StructField("name", T.StringType(), False),
    T.StructField("kks", T.StringType(), True),
    T.StructField("formula", T.StringType(), True),  # non-null ⇔ derived
])

ARCHIVE_SCHEMA = T.StructType([
    T.StructField("attribute_id", T.LongType(), False),
    T.StructField("timestamp", T.TimestampType(), False),
    T.StructField("value", T.DoubleType(), True),
])

#: Partition column added to `archive` on write: date(timestamp).
#: At 100 TB scale this gives day-level partition pruning for the
#: time-range export path; within a file, parquet min/max row-group
#: stats prune on attribute_id.
ARCHIVE_PARTITION_COL = "ts_date"
