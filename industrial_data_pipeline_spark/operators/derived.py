"""Derived-attribute backfill (batch compute path).

Reference (/root/reference/database/database.py:539-605): rewrite each
``$N`` into a correlated scalar subquery against the distinct-timestamp
driver set, INSERT ... WHERE expr IS NOT NULL, ON CONFLICT DO NOTHING.

Spark shape (SURVEY.md J3): the N correlated subqueries are an N-way
self-join of archive on equal timestamp — we instead pivot the source
attributes into columns in ONE shuffle (`groupBy(ts).pivot(attr_id)`),
evaluate the compiled formula JVM-side, and keep non-NULL rows. The
all-sources-present guard falls out of NULL propagation exactly as in
the reference. First-wins insertion is the caller's job
(ParquetStore.upsert_archive(mode="first_wins")).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from industrial_data_pipeline_spark.functions.formula import (
    compile_formula,
    referenced_ids,
    validate,
)


def backfill_derived(archive: DataFrame, derived_id: int, formula: str,
                     known_ids: set[int] | None = None) -> DataFrame:
    """Rows (attribute_id=derived_id, timestamp, value=formula(...)) for
    every timestamp where the formula evaluates non-NULL.

    Scale: one shuffle on timestamp; the pivot's column list is the
    (small) set of referenced ids, passed explicitly so no extra
    distinct-values job runs. The source scan pushes the attribute_id
    IN-list into parquet.
    """
    ids = validate(formula, known_ids)
    if not ids:
        # no $N references → no-op, matching database.py:561-562
        return archive.sparkSession.createDataFrame(
            [], "attribute_id long, timestamp timestamp, value double")
    src = archive.where(F.col("attribute_id").isin(ids))
    wide = (
        src.groupBy("timestamp")
        .pivot("attribute_id", [str(i) for i in ids])
        .agg(F.any_value("value"))
    )
    expr = compile_formula(formula, lambda i: f"`{i}`")
    return (
        wide.select(
            F.lit(derived_id).cast("long").alias("attribute_id"),
            "timestamp",
            expr.cast("double").alias("value"),
        )
        .where(F.col("value").isNotNull())
    )
