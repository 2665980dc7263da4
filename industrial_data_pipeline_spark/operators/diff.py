"""Table diff — the change-data-capture primitive: compare two
versions of a table on a key and classify every row as
added / removed / changed / unchanged, naming the changed columns.

This is what a Delta/Iceberg CDF emits per commit; expressed on plain
tables it is ONE full outer join on the key (shuffle both sides on
the key — or zero shuffle when both versions are bucketed/co-located
on it) plus null-safe column compares. At 100 TB the diff of two
snapshot partitions is exactly this plan per partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def table_diff(old: DataFrame, new: DataFrame, key_cols: list[str],
               compare_cols: list[str]) -> DataFrame:
    """Row-level diff of ``new`` vs ``old``. Returns the key columns +
    ``change_type`` ('added'|'removed'|'changed'|'unchanged') +
    ``changed_cols`` (comma-joined names, '' unless changed).
    Null-safe per-column compares (``<=>``), so NULL→value and
    value→NULL both count as changes."""
    o = old.select(*key_cols,
                   *[F.col(c).alias(f"_o_{c}") for c in compare_cols],
                   F.lit(True).alias("_in_o"))
    n = new.select(*key_cols,
                   *[F.col(c).alias(f"_n_{c}") for c in compare_cols],
                   F.lit(True).alias("_in_n"))
    j = o.join(n, key_cols, "full")
    same = None
    for c in compare_cols:
        eq = F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}"))
        same = eq if same is None else (same & eq)
    ct = (F.when(F.col("_in_o").isNull(), F.lit("added"))
          .when(F.col("_in_n").isNull(), F.lit("removed"))
          .when(same, F.lit("unchanged"))
          .otherwise(F.lit("changed")))
    changed = F.concat_ws(",", *[
        F.when(~F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}")),
               F.lit(c))
        for c in compare_cols])
    return j.select(
        *key_cols, ct.alias("change_type"),
        F.when(ct == "changed", changed).otherwise(F.lit(""))
        .alias("changed_cols"))


def apply_changelog(snapshot: DataFrame, changes: DataFrame,
                    key_cols: list[str], op_col: str = "op",
                    seq_col: str | None = None) -> DataFrame:
    """Apply a CDC changelog to a snapshot — the WRITE half of CDC
    (q162's :func:`table_diff` computes one; this replays one), i.e.
    MERGE semantics on immutable storage: ``D`` removes the keyed
    row, ``I``/``U`` replace-or-insert it. With ``seq_col`` given,
    multiple entries per key first collapse to the LATEST (total-order
    tie handling via :func:`...maintenance.latest_per_key`); without
    it the changelog must carry at most one entry per key.

    Both contract violations fail LOUDLY at execution time (plan-side
    ``raise_error``, no driver collect): an op outside {I, U, D}
    would otherwise be silently treated as a delete (its key leaves
    via the anti-join but never re-inserts), and — without
    ``seq_col`` — a second entry for the same key would emit
    duplicate keyed rows into the merged snapshot.

    Plan shape: one left_anti join removes every keyed row touched by
    any change, one unionByName adds the I/U images — two shuffles on
    the key, no window over the snapshot, partial-agg-free. At 100 TB
    this is the same anti-join + append the store's partition-scoped
    upsert uses, applied table-wide; row-level MERGE engines
    (Delta/Iceberg) slot in behind the same signature."""
    payload = [c for c in changes.columns if c != op_col]
    # unknown op → runtime error (op_col is consumed by the filters
    # below, so the guard expression is never pruned)
    ch = changes.withColumn(
        op_col,
        F.when(F.col(op_col).isin("I", "U", "D"), F.col(op_col))
        .otherwise(F.raise_error(F.concat(
            F.lit("apply_changelog: unknown op "),
            F.coalesce(F.col(op_col), F.lit("NULL")),
            F.lit(" (expected I/U/D)")))))
    if seq_col is not None:
        from industrial_data_pipeline_spark.operators.maintenance import (
            latest_per_key)
        ch = latest_per_key(ch, key_cols, seq_col)
    else:
        # enforce the at-most-one-entry-per-key contract: a window
        # count partitioned on the key (changelogs are delta-sized)
        from pyspark.sql import Window
        w = Window.partitionBy(*key_cols)
        ch = (ch.withColumn("_n_per_key", F.count("*").over(w))
              .withColumn(
                  op_col,
                  F.when(F.col("_n_per_key") == 1, F.col(op_col))
                  .otherwise(F.raise_error(F.lit(
                      "apply_changelog: multiple changelog entries "
                      "for one key — pass seq_col to collapse "
                      "last-wins"))))
              .drop("_n_per_key"))
    upserts = (ch.where(F.col(op_col).isin("I", "U"))
               .select(*[c for c in payload if c != seq_col]))
    touched = ch.select(*key_cols).distinct()
    kept = snapshot.join(touched, key_cols, "left_anti")
    return kept.unionByName(upserts)
