"""Scale-technique operators: patterns that keep plans healthy at
100 TB — skew-tolerant two-stage aggregation and binned interval
(range) joins. Results are EXACT (identical to the naive plan); only
the physical shape changes.

These are beyond-reference additions (the reference delegates all
physical strategy to PostgreSQL, SURVEY.md §4.1); here they are
first-class operators with oracle-checked parity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def salted_grouped_sum(df: DataFrame, key_cols: list[str],
                       value_col: str,
                       round_dp: int = 6) -> DataFrame:
    """Two-stage skew-tolerant aggregation: count + sum + avg per key.

    Stage 1 pre-aggregates per (key, physical partition) — the manual
    equivalent of a map-side combine, but robust even when one key owns
    most of the data: the heavy key's partials are spread over every
    input partition instead of converging on a single reducer before
    any reduction happens. Stage 2 reduces the (keys × partitions)
    partials — a shuffle of at most |keys|·|partitions| tiny rows.

    Exact for algebraic aggregates (sum/count; avg = sum/count at the
    end). Sum runs in DECIMAL so the two-stage reduction is
    order-independent and matches a serial oracle bit-for-bit.
    """
    dec = F.col(value_col).cast("decimal(28,6)")
    partial = (df.withColumn("_pid", F.spark_partition_id())
               .groupBy(*key_cols, "_pid")
               .agg(F.count("*").alias("_n"), F.sum(dec).alias("_s")))
    return (partial.groupBy(*key_cols)
            .agg(F.sum("_n").alias("n"),
                 F.round(F.sum("_s").cast("double"), round_dp)
                 .alias("sum_value"),
                 # divide AFTER the double cast: decimal-division result
                 # scales differ between engines, IEEE division doesn't
                 F.round(F.sum("_s").cast("double") / F.sum("_n"),
                         round_dp).alias("avg_value")))


def interval_join_binned(events: DataFrame, intervals: DataFrame,
                         ts_col: str = "ts",
                         start_col: str = "start",
                         end_col: str = "end",
                         bin_unit: str = "hour") -> DataFrame:
    """Range-containment join (event.ts ∈ [interval.start, end]) as an
    equi-join on time bins instead of a broadcast-nested-loop theta
    join.

    Each interval explodes to its covered bins (bounded by interval
    length / bin size); events map to one bin; the join is a plain
    hash/sort-merge equi-join on the bin key, followed by the exact
    containment filter. Turns O(|events|·|intervals|) into
    O(|events| + Σ bins) with a shuffle both sides partition-prune on.

    Returns events ⋈ intervals rows (all columns from both sides).
    """
    one_bin = F.expr(f"INTERVAL 1 {bin_unit}")
    binned_iv = intervals.withColumn(
        "_bin", F.explode(F.sequence(
            F.date_trunc(bin_unit, F.col(start_col)),
            F.date_trunc(bin_unit, F.col(end_col)),
            one_bin)))
    binned_ev = events.withColumn(
        "_bin", F.date_trunc(bin_unit, F.col(ts_col)))
    return (binned_ev.join(binned_iv, "_bin")
            .where((F.col(ts_col) >= F.col(start_col))
                   & (F.col(ts_col) <= F.col(end_col)))
            .drop("_bin"))


def salted_join(left: DataFrame, right: DataFrame, key: str,
                salt: int = 8) -> DataFrame:
    """Skew-tolerant inner equi-join, exact-equivalent to
    ``left.join(right, key)``.

    The (potentially skewed) left side scatters each row to one of
    `salt` sub-keys via a deterministic hash of the whole row's
    position-independent content — here simply a cheap xxhash of all
    columns — so one hot key's rows spread over `salt` reducers. The
    (smaller) right side replicates each row `salt` times via a
    posexploded literal range. The shuffle key becomes (key, salt):
    the hot key's partition shrinks by ~`salt`×, at the cost of
    |right|·salt replicated rows — the classic trade when AQE's
    skew-join split can't kick in (e.g. pre-shuffled inputs).
    """
    lsalt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]),
                   F.lit(salt))
    l = left.withColumn("_salt", lsalt)
    r = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1))))
    return l.join(r, [key, "_salt"]).drop("_salt")
