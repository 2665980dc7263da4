"""Time-series export — the reference's flagship read path.

Reference lifecycle (SURVEY.md §3.1; /root/reference/database/
database.py:357-432): string-build a 3-way join SQL with an IN-list +
optional timestamp bounds, materialize into pandas, pivot long→wide
(timestamp × attribute-name), optionally bolt on an element_name
column, write CSV/Parquet.

Spark shape: one declarative plan — ``filter(isin + between)`` →
broadcast dim joins → ``groupBy(ts).pivot(name).agg(...)`` — Catalyst
pushes the attribute_id IN-list and both timestamp bounds into the
parquet scan, and the date-partitioned archive prunes whole partitions
for the range. The dims are thousands of rows → broadcast, so the only
shuffle in the whole export is the pivot's groupBy(timestamp).

Divergences from the reference, by design (SURVEY.md §2.12):
- multi-element export qualifies columns as ``element|attribute``
  instead of the reference's positionally-misaligned element_name
  column (§2.12.1 bug);
- the duplicate ``attribute_id AS attribute_id`` projection (§2.12.2)
  is dropped.
"""

from __future__ import annotations

from collections.abc import Sequence
from datetime import datetime

from pyspark.sql import DataFrame, functions as F


def timeseries_long(archive: DataFrame, attribute: DataFrame,
                    element: DataFrame,
                    attribute_ids: Sequence[int],
                    start: datetime | str | None = None,
                    end: datetime | str | None = None) -> DataFrame:
    """Long-format export rows, one per (attribute, timestamp).

    Mirrors /root/reference/database/database.py:381-408: IN-list on
    attribute_id (P2), inclusive-both-ends timestamp range (P3), 3-way
    join archive⋈attribute⋈element (J2), ORDER BY timestamp, name (W1).
    """
    fact = archive.where(F.col("attribute_id").isin(list(attribute_ids)))
    if start is not None:
        fact = fact.where(F.col("timestamp") >= F.lit(start))
    if end is not None:
        fact = fact.where(F.col("timestamp") <= F.lit(end))
    attr = attribute.select(
        "attribute_id",
        F.col("name").alias("attribute_name"),
        "element_id",
    )
    elem = element.select("element_id", F.col("name").alias("element_name"))
    return (
        fact.join(F.broadcast(attr), "attribute_id")
        .join(F.broadcast(elem), "element_id")
        .select("timestamp", "attribute_name", "value",
                "element_name", "element_id", "attribute_id")
        .orderBy("timestamp", "attribute_name")
    )


def pivot_wide(long_df: DataFrame,
               column_names: Sequence[str] | None = None,
               qualify_element: bool = False) -> DataFrame:
    """Long→wide reshape: timestamp rows × attribute columns (A7).

    Reference: pandas ``pivot_table(aggfunc='first')``
    (/root/reference/database/database.py:415-421). Post-dedup the
    (attribute, timestamp) key is unique, so first == the only value;
    we use ``F.any_value`` (deterministic under uniqueness, no sort).

    ``column_names``: pass the collected attribute-name list to skip
    the pivot's extra distinct-values job — the list comes from the
    tiny attribute dim, not from the fact table (SURVEY.md §7.2).

    ``qualify_element=True`` → columns named ``element|attribute``
    (our fix for reference bug §2.12.1; use when >1 element selected).
    """
    col = (
        F.concat_ws("|", "element_name", "attribute_name")
        if qualify_element else F.col("attribute_name")
    )
    shaped = long_df.select("timestamp", col.alias("_col"), "value")
    grouped = shaped.groupBy("timestamp")
    pivoted = (grouped.pivot("_col", list(column_names))
               if column_names is not None else grouped.pivot("_col"))
    return pivoted.agg(F.any_value("value")).orderBy("timestamp")


def export_csv(df: DataFrame, path: str, single_file: bool = True) -> None:
    """CSV sink (S6). ``single_file`` coalesces for parity with the
    reference's one-file pandas export; leave False at scale."""
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").option("header", True).csv(path)


def export_parquet(df: DataFrame, path: str) -> None:
    """Parquet sink (S7)."""
    df.write.mode("overwrite").parquet(path)
