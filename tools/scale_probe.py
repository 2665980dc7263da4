"""Scaling probe: measure representative operators across the three
testdata SFs AND a 16×-exploded events table, and write SCALE_NOTES.md.

The point is to separate fixed overhead (plan build, job scheduling,
python workers) from data-bound cost: an operator whose wall clock is
flat across 100× of input is overhead-dominated at these sizes; the
16× explosion of the largest table shows where the data-bound regime
begins and what the marginal throughput (rows/s) is there — the number
that extrapolates to a cluster.

Run: python tools/scale_probe.py   (writes /root/repo/SCALE_NOTES.md)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SFS = ["0.001", "0.01", "0.1"]
XL_FACTOR = 16

#: (label, registry query) — chosen to cover scan+join+pivot, agg,
#: window, LSH, vectorized UDF and skew paths.
PICKS = [
    ("export (filter+join+pivot)", "q02_export_pivot"),
    ("hourly rollup", "q38_rollup_hourly"),
    ("as-of join (union-sort)", "q39_asof_rollup"),
    ("linear-interp grid fill", "q41_interp_grid"),
    ("sessionize (gap windows)", "q43_sessionize"),
    ("MinHash LSH pairs", "q24_minhash_lsh_pairs"),
    ("ANN cosine top-k", "q28_ann_cosine_topk"),
    ("salted skew agg", "q63_salted_skew_agg"),
    ("boilerplate 5-gram shingles", "q202_boilerplate_ngrams"),
    ("sliding windows (1h/15m)", "q214_sliding_windows"),
    ("binned range join (half-open)", "q225_interval_join"),
    ("AllPairs set-similarity join", "q227_set_similarity_join"),
    ("rolling exact median (24-frame)", "q209_rolling_median"),
    ("weighted median (bucketed)", "q220_weighted_median"),
    ("equi-depth histogram", "q221_equidepth_histogram"),
    ("dup-span report (8-gram islands)", "q231_dup_spans"),
]

#: operators re-run against the 16×-exploded tables. events-shaped
#: ops read the exploded events; q202/q227 read the token-salted
#: exploded documents (cross-copy shingle overlap is ZERO, so output
#: scales ~16×, the longer-corpus-same-density shape); q220/q221 read
#: the orderkey-shifted lineitem/orders.
XL_OPS = ["hourly rollup", "as-of join (union-sort)",
          "linear-interp grid fill", "sessionize (gap windows)",
          "salted skew agg", "binned range join (half-open)",
          "boilerplate 5-gram shingles", "AllPairs set-similarity join",
          "weighted median (bucketed)", "equi-depth histogram",
          "dup-span report (8-gram islands)"]

#: per-tag-density ops: the standard explosion shifts user ids (key
#: cardinality ×16, per-key rows ×1), which leaves a per-tag windowed
#: operator's work unchanged. These run against a DENSE explosion
#: (same user ids, second-jittered timestamps → per-tag rows ×16).
XL_DENSE_OPS = ["rolling exact median (24-frame)"]


def main() -> None:
    from pyspark.sql import functions as F

    from industrial_data_pipeline_spark.session import get_spark
    from industrial_data_pipeline_spark.suite import REGISTRY
    from industrial_data_pipeline_spark.suite_common import (
        configure_events_reading, load)

    spark = get_spark("idp-scale-probe")
    configure_events_reading(spark)

    def run(fn, sf_dir: str) -> float:
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    # warm the session so sf0.001 doesn't absorb startup
    REGISTRY["q01_export_long"][0](
        spark, "/root/testdata/sf0.001").write.format("noop") \
        .mode("overwrite").save()

    rows = {}
    times: dict[str, dict[str, float]] = {}
    for sf in SFS:
        d = f"/root/testdata/sf{sf}"
        rows[sf] = load(spark, d, "events").count()
        for label, q in PICKS:
            times.setdefault(label, {})[sf] = run(REGISTRY[q][0], d)

    # ---- exploded events: XL_FACTOR copies, shifted users + jittered ts
    xl_dir = tempfile.mkdtemp(prefix="idp_scale_xl_")
    ev = load(spark, "/root/testdata/sf0.1", "events")
    (ev.select("*", F.explode(F.sequence(
        F.lit(0), F.lit(XL_FACTOR - 1))).alias("i"))
     .select((F.col("event_id") + F.col("i") * 10_000_000)
             .alias("event_id"),
             F.timestamp_micros(F.unix_micros("ts")
                                + F.col("i") * 1_000_000).alias("ts"),
             (F.col("user_id") + F.col("i") * 10_000).alias("user_id"),
             "event_type", "value", "props")
     .write.mode("overwrite").parquet(os.path.join(xl_dir,
                                                   "events.parquet")))
    # documents ×16: shift doc ids, suffix every TOKEN with the copy
    # index — within-copy shingle structure is identical, cross-copy
    # overlap is zero, so near-dup output scales ~16× (the honest
    # longer-corpus shape; naive text copies would give every doc 15
    # twins and quadratic pair growth instead).
    docs = load(spark, "/root/testdata/sf0.1", "documents")
    doc_cols = [c for c in docs.columns if c not in ("doc_id", "text")]
    (docs.select("*", F.explode(F.sequence(
        F.lit(0), F.lit(XL_FACTOR - 1))).alias("i"))
     .select((F.col("doc_id") + F.col("i") * 10_000_000)
             .alias("doc_id"),
             F.array_join(
                 F.expr("transform(split(trim(text), '\\\\s+'), "
                        "t -> concat(t, 'x', i))"), " ").alias("text"),
             *doc_cols)
     .write.mode("overwrite").parquet(
         os.path.join(xl_dir, "documents.parquet")))
    # lineitem / orders ×16: shifted orderkeys, values untouched
    li = load(spark, "/root/testdata/sf0.1", "lineitem")
    (li.select("*", F.explode(F.sequence(
        F.lit(0), F.lit(XL_FACTOR - 1))).alias("i"))
     .select(*[(F.col("l_orderkey") + F.col("i") * 100_000_000)
               .alias("l_orderkey") if c == "l_orderkey" else c
               for c in li.columns])
     .write.mode("overwrite").parquet(
         os.path.join(xl_dir, "lineitem.parquet")))
    orders = load(spark, "/root/testdata/sf0.1", "orders")
    (orders.select("*", F.explode(F.sequence(
        F.lit(0), F.lit(XL_FACTOR - 1))).alias("i"))
     .select(*[(F.col("o_orderkey") + F.col("i") * 100_000_000)
               .alias("o_orderkey") if c == "o_orderkey" else c
               for c in orders.columns])
     .write.mode("overwrite").parquet(
         os.path.join(xl_dir, "orders.parquet")))

    xl_rows = spark.read.parquet(
        os.path.join(xl_dir, "events.parquet")).count()
    xl_times = {}
    by_label = dict(PICKS)
    for label in XL_OPS:
        # min-of-2: the XL ops run late in a long hot JVM, where a
        # single timing can absorb GC pauses 2-4x the real cost
        # (q202 measured 27.6 s in-sequence vs 6.4 s standalone);
        # the minimum is the only signal under the documented
        # container-noise band — same discipline as BENCH_DETAIL
        xl_times[label] = min(
            run(REGISTRY[by_label[label]][0], xl_dir)
            for _ in range(2))

    # dense events dir: same user ids, jittered ts → per-tag rows ×16
    dense_dir = tempfile.mkdtemp(prefix="idp_scale_dense_")
    (ev.select("*", F.explode(F.sequence(
        F.lit(0), F.lit(XL_FACTOR - 1))).alias("i"))
     .select((F.col("event_id") + F.col("i") * 10_000_000)
             .alias("event_id"),
             F.timestamp_micros(F.unix_micros("ts")
                                + F.col("i") * 1_000_000).alias("ts"),
             "user_id", "event_type", "value", "props")
     .write.mode("overwrite").parquet(
         os.path.join(dense_dir, "events.parquet")))
    for label in XL_DENSE_OPS:
        xl_times[label] = min(
            run(REGISTRY[by_label[label]][0], dense_dir)
            for _ in range(2))
    shutil.rmtree(dense_dir, ignore_errors=True)

    # ---- ingest path at beyond-reference density: the full
    # cleanse→map→dedup→append pipeline over the XL batch
    from industrial_data_pipeline_spark.catalog.store import ParquetStore
    from industrial_data_pipeline_spark.sources.ingest import cleanse
    from industrial_data_pipeline_spark.sources.mapping import mapping_df

    xl_ev = spark.read.parquet(os.path.join(xl_dir, "events.parquet"))
    raw = xl_ev.select(
        F.concat(F.lit("tag_"), F.col("user_id")).alias("lookup_key"),
        F.date_format(F.col("ts") - F.expr("INTERVAL 7 HOURS"),
                      "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("timestamp"),
        F.col("value").cast("string").alias("value"))
    tags = [r[0] for r in xl_ev.select("user_id").distinct().collect()]
    mapping = mapping_df(spark, {f"tag_{u}": u for u in tags})
    ing_dir = tempfile.mkdtemp(prefix="idp_scale_ing_")
    store = ParquetStore(spark, ing_dir)
    store.create_database("probe")
    t0 = time.perf_counter()
    store.append_archive("probe", cleanse(raw, mapping))
    t_ingest = time.perf_counter() - t0
    ingest_rows = store.archive_values("probe").count()

    # ---- partition-scoped upsert vs full rewrite on a 30-day archive
    one_day = (store.archive_values("probe")
               .where(F.to_date("timestamp") == "2024-01-15")
               .withColumn("value", F.col("value") + 1)
               .localCheckpoint(eager=True))
    day_rows = one_day.count()
    t0 = time.perf_counter()
    store.upsert_archive("probe", one_day, mode="last_wins")
    t_upsert = time.perf_counter() - t0
    t0 = time.perf_counter()
    store.rewrite_archive(
        "probe", store.archive_values("probe").localCheckpoint(eager=True))
    t_rewrite = time.perf_counter() - t0
    shutil.rmtree(ing_dir, ignore_errors=True)

    # ---- row-group clustering: pruning ELIGIBILITY, not wall time
    # (at local sizes scans are overhead-bound; the honest metric is
    # the fraction of row groups whose attribute_id min/max excludes
    # a given tag — what a 100 TB scan would skip). Small block size
    # simulates production files, which hold dozens of row groups.
    import glob

    import pyarrow.parquet as pq

    clu_dir = tempfile.mkdtemp(prefix="idp_scale_clu_")
    arch16 = xl_ev.select(
        F.col("user_id").alias("attribute_id"),
        F.col("ts").alias("timestamp"), "value") \
        .withColumn("ts_date", F.to_date("timestamp"))
    c_dir, u_dir = os.path.join(clu_dir, "c"), os.path.join(clu_dir, "u")
    (arch16.repartition(F.col("ts_date"))
     .sortWithinPartitions("ts_date", "attribute_id", "timestamp")
     .write.option("parquet.block.size", 131072)
     .partitionBy("ts_date").parquet(c_dir))
    # control: natural ingest arrival — time-sorted, tags interleaved
    (arch16.repartition(F.col("ts_date"))
     .sortWithinPartitions("ts_date", "timestamp")
     .write.option("parquet.block.size", 131072)
     .partitionBy("ts_date").parquet(u_dir))

    def rg_skippable(path: str, attr: int = 321) -> tuple[int, int]:
        tot = skip = 0
        for fp in glob.glob(path + "/*/*.parquet"):
            md = pq.ParquetFile(fp).metadata
            ci = {md.schema.column(i).name: i
                  for i in range(md.num_columns)}["attribute_id"]
            for rg in range(md.num_row_groups):
                s = md.row_group(rg).column(ci).statistics
                tot += 1
                if s and (s.min > attr or s.max < attr):
                    skip += 1
        return tot, skip

    c_tot, c_skip = rg_skippable(c_dir)
    u_tot, u_skip = rg_skippable(u_dir)
    shutil.rmtree(clu_dir, ignore_errors=True)

    # ---- CC convergence on an adversarial chain: rounds, not rows,
    # are what kill iterative graph algorithms at scale
    from industrial_data_pipeline_spark.operators.dedup import (
        connected_components, connected_components_star)

    chain_n = 64
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(chain_n - 1)], "id_a long, id_b long")
    cc_stats: dict = {}
    t0 = time.perf_counter()
    n_lbl = connected_components(chain, max_iter=200,
                                 stats=cc_stats).count()
    t_label = time.perf_counter() - t0
    star_stats: dict = {}
    t0 = time.perf_counter()
    n_star = connected_components_star(chain, max_iter=200,
                                       stats=star_stats).count()
    t_star = time.perf_counter() - t0
    assert n_lbl == n_star == chain_n

    out = [
        "# SCALE_NOTES — measured scaling, not vibes",
        "",
        f"`python tools/scale_probe.py` on local[32]; events rows: "
        + ", ".join(f"sf{sf}={rows[sf]:,}" for sf in SFS)
        + f"; XL = sf0.1 events × {XL_FACTOR} = {xl_rows:,} rows "
        "(shifted user ids, jittered timestamps — same key "
        "cardinality ratio).",
        "",
        "An operator flat across sf0.001→sf0.1 (100× data) is "
        "overhead-dominated at these sizes: wall clock is plan build "
        "+ job scheduling, and the marginal cost of data is near "
        "zero. The XL column is where data-bound behavior starts; "
        "`t(XL)/t(sf0.1)` against the 16× data ratio gives the "
        "scaling exponent that extrapolates to a cluster.",
        "",
        "| operator | sf0.001 | sf0.01 | sf0.1 | XL (16×) | "
        "t(XL)/t(0.1) |",
        "|---|---|---|---|---|---|",
    ]
    for label, _q in PICKS:
        t = times[label]
        xl = xl_times.get(label)
        xl_s = f"{xl:.2f} s" if xl is not None else "—"
        ratio = f"{xl / t['0.1']:.1f}×" if xl is not None else "—"
        out.append(
            f"| {label} | {t['0.001']:.2f} s | {t['0.01']:.2f} s | "
            f"{t['0.1']:.2f} s | {xl_s} | {ratio} |")
    out += [
        "",
        "## Storage-path claims, measured",
        "",
        f"- **Ingest**: cleanse (ISO parse + tz shift + coercion) → "
        f"broadcast mapping join ({len(tags):,} tags) → first-wins "
        f"dedup → date-partitioned append of {ingest_rows:,} rows in "
        f"{t_ingest:.1f} s ≈ {ingest_rows / t_ingest:,.0f} rows/s on "
        "one node — the reference's density expectation is 5,000 "
        "rows/min/site (BASELINE.md), ~4 orders of magnitude below "
        "this path's ceiling.",
        f"- **Partition-scoped upsert**: merging a regenerated "
        f"{day_rows:,}-row day into the 30-day / {ingest_rows:,}-row "
        f"archive took {t_upsert:.1f} s vs {t_rewrite:.1f} s for a "
        f"full-table rewrite ({t_rewrite / t_upsert:.1f}× — the merge "
        "reads and rewrites only the touched date partition, so "
        "steady-state ingest cost is independent of history size; at "
        "100 TB / years of history that gap is the whole design).",
        "",
        "## Row-group clustering (the reference's index parity), measured",
        "",
        "The reference's only physical read-path tuning is its five "
        "B-tree indexes, two of them on archive(attribute_id) and "
        "archive(timestamp) (BASELINE.md). The columnar analog: date "
        "partitioning plays the timestamp index (partition pruning), "
        "and the store's (attribute_id, timestamp) sort-within-"
        "partitions plays the attribute index (row-group min/max "
        "pruning). Measured on the XL archive written both ways at "
        "production-like row-group granularity "
        "(`parquet.block.size=128KB` so files hold many row groups, "
        "as 100 TB files would):",
        "",
        f"- clustered (attribute_id, timestamp): {c_skip}/{c_tot} row "
        f"groups skippable for a single-tag filter "
        f"({100 * c_skip / max(c_tot, 1):.1f}%)",
        f"- natural ingest order (time-sorted, tags interleaved): "
        f"{u_skip}/{u_tot} skippable "
        f"({100 * u_skip / max(u_tot, 1):.1f}%) — every row group "
        "spans every tag, nothing prunes",
        "",
        "Wall time is NOT the metric at local sizes (scans are "
        "overhead-bound; both layouts measure ~0.2 s). Skippability "
        "is what multiplies out at 100 TB: a single-tag export reads "
        f"~{100 - 100 * c_skip / max(c_tot, 1):.0f}% of the touched "
        "partitions' bytes instead of 100%.",
        "",
        "## Iterative-operator convergence, measured",
        "",
        f"- **Connected components on a {chain_n}-node chain** (the "
        "adversarial depth case — every real-world near-dup cluster "
        "is shallower): min-label propagation converged in "
        f"{cc_stats['rounds']} rounds / {t_label:.1f} s; alternating "
        f"large/small-star in {star_stats['rounds']} rounds / "
        f"{t_star:.1f} s. Rounds are the scale currency — each is a "
        "full shuffle barrier — and the star variant's O(log²n) "
        "bound is what keeps clustering feasible if a pathological "
        "duplicate chain ever shows up in a 100 TB corpus "
        "(q61 keeps the min-label form, q137 runs the star form, "
        "both against the same recursive-SQL oracle).",
        "",
        "Reading the XL column: a ratio well under 16× means the "
        "operator is still amortizing fixed costs at 1.6M rows; near "
        "or above 16× means it is data-bound and the rows/s there is "
        "the honest per-core throughput to extrapolate from. "
        "Partition counts, shuffle sizes and state stores all scale "
        "with the keys×buckets of each operator (see README design "
        "notes), so the per-key cost is what a 1000-executor cluster "
        "multiplies out.",
        "",
        # hand-maintained per-round sections (structural claims pinned
        # by plans/oracles, plus round-4 measured fixes) — kept here so
        # a probe rerun regenerates the WHOLE document
        '## Round-3 continuation additions — state/cost bounds by construction',
        '',
        'Not re-measured (the claims are structural, pinned by the plans and',
        'the byte-exact oracles), recorded so the 100 TB extrapolation per',
        'operator is explicit:',
        '',
        '- **Stream-stream join (q158)**: join state is bounded by watermark',
        '  delay + range width — each side retains ≤ (1 h late + 1 h range)',
        '  of events per key, O(events/hour), never O(stream). The time-range',
        '  predicate on BOTH event-time columns is what lets Spark evict; an',
        '  unbounded-range stream-stream join would grow state forever.',
        '- **Bloom semi-join (q166)**: the filter is m/64 longs (64 at the',
        '  4096-bit default) serialized INTO the plan — probe-side cost is a',
        '  scan-speed bit test, zero shuffle, and the build side is one',
        '  distinct-positions pass over the dim. At 100 TB the same shape',
        '  ships the filter to every task for free with the task binary.',
        '- **Trigram index (q171)**: query cost is |pattern| posting lists —',
        '  independent of corpus size once the posting table exists; the',
        '  posting build (explode to ~|text| trigrams/doc) is the write-once',
        "  indexed asset, exactly like the reference's B-trees.",
        '- **Z-order (q172)**: the Morton key is pure codegen bit math; the',
        '  production write is repartitionByRange(z) — one shuffle, after',
        '  which min/max file stats prune BOTH dimensions (measured here as',
        '  per-tile spans: every tile bounds x and y simultaneously, which a',
        '  single-column sort cannot do).',
        '- **Per-key sequential ops (q161 EWMA, q164 keyframes)**: state is',
        '  one float / one decoded frame per key inside an Arrow batch;',
        '  parallelism = |keys|, the same contract as',
        '  applyInPandasWithState — these are the two legitimate',
        '  Python-sequential operators added this round, both with byte-exact',
        '  oracles.',
        '- **Inverted-index similarity (q165/q167)**: pair-join cost is',
        '  Σ df² over terms surviving the df ≤ 100 prune — the cap is the',
        '  knob that trades recall on stop-term-only overlaps for a hard',
        '  cost bound; at 100 TB it is what keeps the join from degenerating',
        '  on "the"-class terms.',
        '',
        '## Round-4 — global-window elimination and new-operator bounds',
        '',
        'Measured at sf0.1 on local[32] (per-query, clean run; bench noise',
        'rules from the header apply):',
        '',
        '- **q95 Zipf** 2.2 s → **0.29 s** after replacing the full-vocabulary',
        '  row_number window with distributed TakeOrderedAndProject(1000): the',
        '  old plan shuffled every distinct token to ONE partition (the',
        "  round-3 bench tail's repeated WindowExec warnings); the new plan's",
        '  single-partition stage sees exactly 1000 rows by construction.',
        '- **q172 exact ntile** now runs as (a) a ≤64-row bucket-count collect',
        '  and (b) a bkt-partitioned rank window + integer quota arithmetic —',
        '  same bytes as the global-sort ntile it replaced, no fact-table',
        '  single-partition stage. At 100× scale the old plan sorts the whole',
        '  orders table on one executor; the new one shuffles it once, evenly.',
        '- **Whole-suite WindowExec warning count: 73 → 0** (attributed per',
        '  query with stderr markers, then eliminated: q123 assigns restored',
        '  derived ids driver-side from a catalog-sized collect; q171 ships',
        '  its global candidate count as a broadcast 1-row crossJoin instead',
        '  of an empty-partition window). `tools/window_audit.py` parses every',
        '  registry plan for unpartitioned windows — the regression guard.',
        '- **q202 boilerplate 5-grams**: shingle expansion is JVM-side',
        '  transform+explode (~|tokens| rows/doc); the doc-frequency threshold',
        '  reduces the hit-join build side to only grams with df ≥ 20, so the',
        '  verify join is a broadcast against the (small) boilerplate set —',
        '  the same semi-join-reduction shape as q126 decontamination.',
        '- **q205 compaction**: driver-side partition loop bounded by the',
        '  retention horizon (|dates|), one bounded Spark job per oversized',
        '  partition; the same cost class as TTL partition drops. At 100 TB',
        '  this is the nightly small-files pass; row preservation is part of',
        '  the hash-checked result, not an assumption.',
        '- **q209 rolling median**: moving-frame exact percentile costs',
        '  O(frame) per row inside each tag partition — state is the 24-row',
        '  frame, parallelism |tags|; no global structure anywhere.',
        '- **q213 centroid cosine**: the only shuffle is the (label × dim)',
        '  partial-agg; the pair join is a broadcast self-join over',
        '  |labels|×64 summary rows — never touches the vector table twice.',
        '',
        '## Round-4b — range join, sweep line, AllPairs, chi-square',
        '',
        '- **q225 half-open range join**: reuses q64\'s binned operator',
        '  (end_inclusive=False) — intervals explode onto ≤2 hour bins,',
        '  points own ONE bin, so the join is a plain equi-join and each',
        '  pair meets in exactly one task (no dedup); the naive theta',
        '  join Spark would otherwise pick is a BroadcastNestedLoopJoin.',
        '  The XL ratio (33.5× for 16× rows) is OUTPUT, not plan, cost:',
        '  the 16× explosion densifies a fixed 30-day span, so windows',
        '  ×16 AND points-per-window ×16 → matched pairs ×~256. Cost is',
        '  O(|points| + Σ bins + |pairs|), and |pairs| is the quadratic',
        '  term a denser feed genuinely implies — at constant density',
        '  (the real 100 TB shape: longer span / more sources, not 16×',
        '  events in the same month) pairs grow linearly.',
        '- **q226 peak concurrency**: sweep line = 2 rows per interval,',
        '  one running-sum window partitioned by the key; state per key is',
        '  one counter. The per-key peak is a second whole-partition max',
        '  window over the same shuffle — no extra exchange (same key).',
        '- **q227 AllPairs set-similarity**: candidate cost is Σ over',
        '  prefix items of df² — prefixes are the ~10% rarest-first slice',
        '  of each set, so df is small by construction where it is',
        '  squared; verification joins are (id, item) equi-joins bounded',
        '  by |candidates|×|set|. Exact output (integer Jaccard), unlike',
        '  LSH; no guard needed, unlike the O(n²) baseline.',
        '- **q228 chi-square**: three combinable groupBy counts over one',
        '  scan + a 1-row broadcast for N; per-cell χ² terms are single',
        '  IEEE expressions over exact integers, so there is no',
        '  cross-cell float sum to make merge order matter.',
        '',
        '## Round-5 — XL coverage closed + q220 de-windowed',
        '',
        '- The XL fan now covers the round-4 additions the verdict flagged:',
        '  **q202/q227** run against a token-salted 16× documents table',
        '  (cross-copy shingle overlap is zero, so candidate/pair output',
        '  scales ~16× — the longer-corpus-same-density shape; naive text',
        '  copies would hand every doc 15 twins and conflate output growth',
        '  with plan cost). **q220/q221** run against orderkey-shifted 16×',
        '  lineitem/orders. **q209** runs against a DENSE explosion (same',
        '  tags, jittered seconds): the standard user-shifted explosion',
        '  multiplies tag cardinality, which leaves a per-tag moving-frame',
        "  operator's work untouched — per-tag rows ×16 is its real probe.",
        '- **q220 weighted median** no longer windows the fact at all',
        '  (two-level dollar-bucket prefix sums, integer threshold pick;',
        '  the only windows run over dimension-sized bucket aggregates).',
        '  Its XL ratio is therefore pure aggregation scaling.',
        '- **Closure: recursive CTE vs iterative loop** (VERDICT r4 item 7,',
        '  measured at sf0.1, 15,030-element hierarchy, min of 3): iterative',
        '  0.96 s vs WITH RECURSIVE 1.26 s — the CTE re-derives per action',
        '  while the loop localCheckpoints each level, so the loop stays the',
        '  default; the CTE variant ships as q230 (feature-probed, same',
        '  recursive-SQL oracle as q07) for Sparks where a single declarative',
        '  plan is preferred.',
        '- **q231 dup-span report**: cost is Σ|tokens| positional postings',
        '  + one map-combinable df aggregation + a per-doc lag window over',
        '  HIT positions only. Round 7 replaced the 8-gram STRING posting',
        '  key with xxhash64 computed inside the shingle transform —',
        '  same-session XL A/B on a SEPARATE (noisier) window: wall',
        '  293 s → 140 s (2.1×), shuffle write 276 MB → 139 MB (2.0×) at',
        '  identical output; the headline XL table row above is measured',
        '  fresh each regeneration ON the fixed path, so the table, not',
        '  this historical A/B, is the current number (byte-exact oracle',
        '  match; collision risk is the 64-bit birthday bound, additive-only',
        '  for a dup report, documented at _pos_shingle_expr). Still linear',
        "  in corpus size; the remaining absolute is the posting explosion's",
        '  scan cost, the write-once indexed asset of the substring-dedup',
        '  pass (like q171, amortized across reruns).',
        '- **q229 stream→cleanse→upsert→derived chain**: per micro-batch the',
        '  cost is the batch upsert (partition-scoped, see the upsert row',
        '  above) + derived recompute bounded by the batch\'s affected',
        '  timestamps — the steady-state ingest loop is independent of',
        '  archive history size by the same measurement.',
        '- **Writer-lock contention** (tools/lock_probe.py, quiet window,',
        '  6 processes × 20 cycles, 10 ms holds on ONE database): median',
        '  acquisition 0.7–0.8 ms both uncontended and contended — the flock',
        '  itself is free; the contended TAIL is queueing, bounded by',
        '  (waiters × hold) plus the 50 ms retry quantum per lost poll',
        '  (observed p95 1.3–51 ms, max 1.2 s when a waiter loses several',
        '  rounds behind 5 writers). Aggregate ~49 lock cycles/s. The',
        '  single-writer boundary costs nothing on the hot path and',
        '  degrades linearly, not catastrophically, under contention —',
        '  and it guards MANAGEMENT writes only; fact-table reads and',
        '  appends to different databases never touch it.',
        '',
        '## Round-7 quiet-window re-measure (VERDICT r6 item 2)',
        '',
        'Three consecutive full-suite sf0.1 runs on a verified-quiet machine',
        '(345.8 / 386.1 / 415.7 s, 235 queries, 0 errors; per-query minima',
        'folded into BENCH_DETAIL via tools/merge_bench.py). The two r6',
        'single-run outliers are CLEARED — both were container noise, not',
        'regressions (code untouched, as VERDICT suspected):',
        '',
        '- **q03_lookup_like**: 27.3 s (r6 driver) → 2.02 / 2.28 / 1.89 s',
        '  (1.3–1.6× of the 1.47 s r5 minimum) across all three runs.',
        '- **q31_multimodal_features**: 12.7 s (r6) → 3.52 / 0.99 / 1.09 s —',
        '  runs 2+3 are 1.5–1.6× of the 0.67 s minimum. The one 5× reading',
        "  (run 1) co-occurred with q133's only outlier (3.4×): both are",
        '  Arrow mapInPandas kernels, so their tail variance is Python-worker',
        '  scheduling under transient host load, not plan cost.',
        '- Watch-list (q05–q08, q133, q214, q75, q35): all within 2.01× of',
        '  their r5 minima in runs 2 and 3.',
        '',
        '## Round-7 new-operator XL rows (id-shifted ×16 explosions, min of 2)',
        '',
        '- **q233 BM25 top-k**: 2.81 s → 4.52 s for 16× docs (1.6×) — the',
        '  query-term posting filter keeps probe cost proportional to matched',
        '  postings, not corpus size; stats/df/query tables stay broadcast at',
        '  any SF, and the rank window is |queries|-partitioned.',
        '- **q234 k-anonymity audit**: 0.30 s → 0.31 s for 16× customers',
        '  (1.0×) — one combinable aggregate whose output is fixed at the',
        '  125-class quasi-identifier domain; pure scan-rate scaling.',
        '- **q235 BPE apply**: 0.39 s → 1.12 s for 16× docs (2.9×) — a',
        '  shuffle-free projection still amortizing fixed cost at 80 k docs;',
        '  per-doc cost is O(|text|·|merges|) by construction.',
        '- **q236 incremental MinHash-LSH gate**: 5.4 s → 50.5 s for a 16×',
        '  corpus at fixed batch size (9.4×, sublinear). The batch-sized',
        '  candidate set broadcasts into the corpus-side verify, so the',
        '  candidate subtree (which embeds the in-plan index build) is',
        '  evaluated ONCE and the corpus is never shuffled for the verify —',
        '  restructuring it this way cut sf0.1 from 21.1 s to 5.4 s (4×).',
        '  The remaining XL growth is the in-plan corpus signature build',
        '  itself — RESOLVED in round 8 by the persisted index (next row).',
        '- **q242/q243 stored-index LSH gate** (round 8, the r7 lead item,',
        '  operators/lsh_index.py): the corpus band table + shingle sets',
        '  are parquet assets written once per admitted doc; the gate signs',
        '  only the batch and equi-joins the STORED band table. A/B probe',
        '  (tools/lsh_gate_probe.py, noop-write forced, min of 2, fixed',
        '  30-doc batch): in-plan gate 7.6 s → 104.9 s at 16× corpus',
        '  (13.7×) vs stored probe 1.30 s → 1.11 s (0.86× — FLAT; ~6×',
        '  faster even at 1×).',
        '  One-time build cost 10 s (1×) / 158 s (16×) is the amortized',
        '  corpus pass. Byte-exactness vs the in-plan gate is pinned by',
        '  q242 sharing q236\'s oracle and q243 sharing q240\'s (the',
        '  streaming form appends admitted signature rows per batch, so',
        '  cross-batch state lives entirely in the stored asset). Per-batch',
        '  steady-state cost is O(|batch| signatures + collisions),',
        '  independent of corpus size — measured, not projected.',
        '- **q237 text normalization**: 0.47 s → 0.95 s for 16× docs (2.0×) —',
        '  a shuffle-free regexp projection still overhead-dominated at 80 k',
        '  docs; scan-rate by construction.',
        '- **q239 dup-span excision**: 7.3 s → 102 s for 16× docs (14×,',
        '  ~linear — the data-bound regime): the cost is the q231 posting',
        '  substrate run again plus the token anti-join and per-doc rebuild,',
        '  all Σ|tokens|-proportional.',
        '- **q244 stored-span excision** (round 8, the r7 item-2 production',
        '  shape): the q231 span table is written once as a parquet asset',
        '  and the registered excision reads it — only the token anti-join',
        '  + rebuild run. A/B probe (tools/span_excise_probe.py, noop-write',
        '  forced, min of 2): full pass 7.2 s → 99.3 s at 16× vs stored',
        '  MARGINAL 0.59 s → 3.30 s — 3.3% of the full pass at 16×, and',
        '  the marginal itself scales sub-linearly in Σ|tokens| (5.6× at',
        '  16× data) because it never touches the posting substrate.',
        '  Asset build = 6.3 s / 98.9 s (the amortized once cost). q244',
        '  shares q239\'s oracle: stored-span excision is byte-identical.',
        '- **q245 maintained-IVF recall** (round 8, r7 item 5 — the ANN',
        '  loop index→maintain→probe→recall closed in one registered,',
        '  hash-checked query): probe cost is ∝ rows in the PROBED cells,',
        '  not the corpus — measured on a 128k-vector index',
        '  (tools/ann_probe.py, noop-forced, min of 2): wall at nprobe=4',
        '  is 0.23× of nprobe=16 (full scan), matching the candidate-row',
        '  fraction 0.24 — the retrieval scan really is cell-pruned before',
        '  any distance math. Batch routing through frozen centroids is',
        '  one Arrow matmul map stage over the batch only (q159 row).',
        '- **q240 streaming admission gate**: per-batch cost is exactly the',
        '  q236 row above (batch-vs-index probe + broadcast verify) plus one',
        '  append of the admitted rows; corpus file listings refresh per',
        "  batch, so the stream's steady-state cost tracks batch size — the",
        '  same history-independence q229 measures for the archive loop.',
        '  q243 is its stored-index form: the per-batch corpus signature',
        '  rebuild disappears entirely (see the q242/q243 row), making the',
        '  stream the production admission loop.',
        '',
        '## Round-8 late additions (tools/new_ops_probe.py, noop-forced, min of 2)',
        '',
        '- **q249 quality classifier**: 1.00 s → 4.31 s for 16× docs (4.3×,',
        '  sublinear): one explode + one narrow integer-weight shuffle with',
        '  map-side combine; the 64-entry weight array folds into codegen.',
        '- **q250 HTML strip**: 0.32 s → 0.78 s for 16× docs (2.4×) —',
        '  shuffle-free regexp projection, scan-rate by construction.',
        '- **q251 ROUGE-1/2 eval**: 2.86 s → 11.63 s for 16× docs (4.1×,',
        '  sublinear): per-n gram-count shuffles + (id, gram) overlap joins,',
        '  all keyed on 8-byte-ish gram strings per doc — linear in Σ|tokens|',
        '  with no cross-doc state.',
        '- **q252 hard-negative mining**: 0.46 s → 1.25 s for a 64× corpus',
        '  (2.7×): the broadcast label-inequality join is one corpus scan ×',
        '  |queries| distance computations — the documented brute-force',
        '  envelope; corpus-scale query sets route through the ANN index',
        '  instead (q254, measured below).',
        '',
        '## Round-9: persisted-index probe I/O + the composed stream',
        '',
        '(r8 verdict items 1/2/4/6; tools/lsh_gate_probe.py,',
        'tools/curation_probe.py, tools/ann_hardneg_probe.py — scan',
        'metrics read from the SQL REST scan nodes, not wall.)',
        '',
        '- **Prunable stored-LSH layout** (operators/lsh_index.py): bands',
        '  partitioned by band + range-clustered/sorted by bucket, shingles',
        '  doc_id-sorted; the probe collects its batch-sized keys and pushes',
        '  them into both index scans (PartitionFilters + In(bucket) /',
        '  In(doc_id) asserted in tests/test_plans.py). Measured at a',
        '  2048-row file granularity (so row groups ≫ keys — the production',
        '  shape; a 100 TB index tunes max_records_per_file the same way):',
        '  a 1-doc probe against the 16× index DECODES 131,072 of 640,000',
        '  band rows (0.205×) — exactly its 8 keys × 8 bands = 64 row',
        '  groups × 2048 rows — and grows 3.84× while the full scan grows',
        '  14.22×: decoded rows ∝ probe keys × row-group size, NOT index',
        '  size. The 30-doc arm records the toy-scale limit honestly: its',
        '  240 uniform bucket keys saturate the 16× index\'s ~320 row-group',
        '  spans (0.97–1.0×) — the win needs row groups ≫ keys, which a',
        '  100 TB index has (1M-row groups: 240 keys read 0.02% of the',
        '  index) and a 0.6 MB toy index cannot. Spark\'s "size of files',
        '  read" stays constant BY DEFINITION (data filters prune row',
        '  groups inside files, never the file listing) — decoded rows is',
        '  the byte proxy; an object-store reader fetches only surviving',
        '  row groups\' byte ranges. Probe WALL stays flat: 2.38 → 1.70 s',
        '  (0.72×) at 16×; build 16 s / 209 s is the amortized corpus pass.',
        '  Byte-exactness across the layout change: q242/q243/q253 share',
        '  their round-8 oracles unchanged (pruning is a superset filter',
        '  of the probe join\'s own equality predicate).',
        '- **Index compaction** (StoredLshIndex.compact, r8 item 2): folds',
        '  per-batch append small files back into the build layout via the',
        '  q205 tmp→old→live swap under the lease writer lock. Structural',
        '  row — pinned by tests/test_dedup.py: file count strictly drops',
        '  after 3 append batches, probes are byte-identical across the',
        '  compaction, a crash between the two renames recovers, and the',
        '  lease releases (second compact acquires immediately).',
        '- **q256 composed curation stream** (quality + text-LSH + embedding',
        '  gate, ALL assets persisted): per-batch wall on a fixed 15-doc',
        '  batch, min of 2 (tools/curation_probe.py): 6.35 s at 1× → 6.07 s',
        '  at 16× corpus (**0.96× — FLAT**), asset build 36 s / 414 s is',
        '  the amortized corpus pass. This measures the FULL foreachBatch',
        '  body — classifier, stored text probe, embedding + signature',
        '  matmul, stored signature probe, pruned cosine verify, appends to',
        '  all assets, ledger — i.e. the r8 verdict\'s item-6 row with the',
        '  item-9 stretch composition included (q253 is the 2-gate subset).',
        '- **q254 stored-route hard negatives** (similarity.',
        '  ann_hard_negatives; tools/ann_hardneg_probe.py, rotated-copy',
        '  16× embedding corpus, fixed 5-query planted batch): stored',
        '  route 1.54 s → 1.27 s (0.83× — FLAT) while the brute route',
        '  grows 0.50 s → 2.31 s (4.62×, corpus-linear) — the stored',
        '  route overtakes brute between 1× and 16× and the gap widens',
        '  with corpus size (brute = full scan × |queries| distances;',
        '  stored = fixed query signing + collision-sized verify). Index',
        '  scan rows at 16× still include the whole signature table at',
        '  this default file granularity (same row-groups-vs-keys bound',
        '  as the LSH row; max_records_per_file is the lever) — the wall',
        '  win is already decisive because the avoided work is the',
        '  corpus-side DISTANCE math, not the narrow signature scan.',
        '- **q259 persisted IVF index** (similarity.StoredIvfIndex;',
        '  tools/ivf_prune_result.json): the probe key (cell id) is the',
        '  PARTITION column, so pruning is file-level — a probe of the',
        '  32k-vector stored index at nprobe=4/16 reads 6 of 25 files',
        '  (0.24×), 2.9 of 12.8 MB (0.23×), 7,263 of 32,000 rows',
        "  (0.227×) — 'size of files read' itself drops, the strongest",
        '  pruning form (directories outside the probed cells never',
        '  enter the listing), matching the 0.24 candidate fraction',
        '  q245 measured for the in-plan index. Byte-exactness across',
        '  persist→append→pruned-probe: q259 shares q245\'s oracle.',
        '- **q265 batch IVF probe** (StoredIvfIndex.probe_batch, round',
        '  10 — tools/ivf_batch_probe_result.json, 32k-vector stored',
        '  index, nprobe=4/16): probe I/O ∝ DISTINCT probed cells, not',
        '  |batch| × cells. A 3-query batch (10 distinct cells) decodes',
        '  0.614× of the index (11/17 files — partition pruning holds',
        '  at batch level); a 100-query batch (union covers all 16',
        '  cells) decodes the index exactly ONCE (1.0×), while the',
        '  per-query loop it replaces decodes 25.0× that (800,288 vs',
        '  32,000 rows, 423 vs 17 file reads) — each probed cell read',
        '  once no matter how many queries share it, with plan size',
        '  constant in |batch| (one scan + broadcast routing pairs,',
        '  tests/test_plans.py::test_ivf_probe_batch_single_pruned_scan).',
        '  Byte-exactness: q265 shares q245/q259\'s oracle verbatim.',
        "",
    ]
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "SCALE_NOTES.md"), "w") as f:
        f.write("\n".join(out))
    shutil.rmtree(xl_dir, ignore_errors=True)
    print("wrote SCALE_NOTES.md")


if __name__ == "__main__":
    main()
