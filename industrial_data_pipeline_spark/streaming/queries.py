"""Batch-parity Structured Streaming queries: the same aggregation a
batch query would run, executed through ``readStream`` → windowed agg →
memory sink with ``Trigger.AvailableNow`` — so the result is a bounded,
collectable DataFrame whose contents must equal the batch oracle.

This is the suite's proof that the streaming path (T1/T5 shapes,
SURVEY.md §2.8) produces the same answers as batch: the driver's
correctness gate compares the memory-sink table against plain SQL.

Scale notes: on an unbounded source the same plan runs with a real
watermark + append mode; ``complete`` output here is what makes the
bounded availableNow run return the full aggregate in one table. State
is keyed by (hour window × event_type) — cardinality-bounded, not
row-bounded, so executor state stays small at any input size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from industrial_data_pipeline_spark.suite_common import events_stream

#: observability (VERDICT r12 item 7): the EXECUTED micro-batch
#: physical plan of each memory-sink run, keyed by sink table name —
#: captured right after awaitTermination from the terminated query's
#: last execution (StreamingQuery.explain's own source), because a
#: batch read-back of the sink can never show the stream-stream join
#: / watermark operators the run actually executed.
#: tools/explain_dump.py folds these into EXPLAINS.md.
LAST_STREAM_PLANS: dict[str, str] = {}


def _capture_stream_plan(q, table_name: str) -> None:
    """Best-effort plan capture — never fails the flow (the plan is
    evidence, not behavior)."""
    try:
        LAST_STREAM_PLANS[table_name] = q._jsq.explainInternal(False)
    except Exception:  # noqa: BLE001
        pass


def hourly_event_counts_stream(
        spark: SparkSession, sf_dir: str,
        table_name: str = "idp_stream_hourly_counts") -> DataFrame:
    """Hourly (window-start, event_type) counts over the events table,
    computed by an actual streaming query (availableNow) into a memory
    sink; returns the sink table as a batch DataFrame."""
    src = events_stream(spark, sf_dir)
    agg = (
        src.select("ts", "event_type")
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("hour_start"), "event_type", "n")
    )
    # a leftover temp view from a prior run in the same session would
    # collide with the memory sink's queryName
    spark.catalog.dropTempView(table_name) if any(
        t.name == table_name for t in spark.catalog.listTables()) else None
    q = (agg.writeStream.format("memory").queryName(table_name)
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination()
    _capture_stream_plan(q, table_name)
    return spark.table(table_name)


def _merge_session_events(cur: list | None, us: list, micros: list,
                          gap_us: int) -> tuple[list, list]:
    """Core of the stateful sessionization handler, extracted pure so
    the cross-batch merge rules are unit-testable without a state
    store: fold (timestamp_us, value_micro) pairs — sorted within the
    batch, but possibly EARLIER than the carried open session ``cur``
    — into ``cur``, splitting on the inactivity gap. Returns
    (sessions closed by evidence, trailing open session). A late
    event merging into the open session can only WIDEN its span
    (min/max), never regress ``end``: a regressed end would make the
    next gap test measure from a false early end and split a live
    session."""
    done: list[list] = []
    for t, m in zip(us, micros):
        if cur is None:
            cur = [t, t, 1, m]
        elif t - cur[1] > gap_us:
            done.append(cur)
            cur = [t, t, 1, m]
        else:
            cur[0] = min(cur[0], t)
            cur[1] = max(cur[1], t)
            cur[2] += 1
            cur[3] += m
    return done, cur


def sessionize_stream(spark: SparkSession, sf_dir: str,
                      gap_seconds: int = 1800,
                      table_name: str = "idp_stream_sessions") -> DataFrame:
    """Stateful streaming sessionization via ``applyInPandasWithState``
    keyed by user: per group the handler merges the state-resident open
    session with the batch's rows, splits on the inactivity gap, emits
    every session whose extent is known so far, and stores the trailing
    open session (+ closed-session count for ordinal continuity) back
    into state.

    Emission semantics: closed sessions are exact; the trailing open
    session is emitted optimistically and would be re-emitted extended
    by a later batch (at-least-once; downstream dedupes last-wins on
    (user_id, session_start)). On a bounded availableNow run over a
    single-file source there is one batch, so the output equals batch
    sessionization exactly — the oracle for q43 applies verbatim.

    State per user is one fixed-size row (5 scalars) — state store
    size tracks |users|, never |events|.
    """
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    src = events_stream(spark, sf_dir)
    ev = src.select("ts", "user_id", "event_id", "value")

    out_schema = ("user_id long, session_id long, "
                  "session_start timestamp, session_end timestamp, "
                  "n_events long, sum_value double")
    # value sum carried as exact integer micro-units (value quantized
    # to 6 dp, same as Spark's double→DECIMAL(18,6) cast), so the
    # accumulated sum is order-independent and bit-matches the batch
    # operator / oracle regardless of batch boundaries
    state_schema = ("closed long, start_us long, end_us long, "
                    "n long, sum_micro long")
    gap_us = gap_seconds * 1_000_000

    from decimal import ROUND_HALF_UP, Decimal
    _Q = Decimal("0.000001")

    def _micro(v: float) -> int:
        # mirrors Spark's Decimal(double) cast: shortest string repr,
        # then HALF_UP quantize at scale 6
        return int(Decimal(repr(float(v))).quantize(_Q, ROUND_HALF_UP)
                   .scaleb(6))

    def handler(key, pdfs, state: GroupState):
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["ts", "event_id"])
        us = (rows["ts"].astype("int64") // 1000).tolist()
        vals = rows["value"].astype(float).tolist()
        closed, cur = 0, None
        if state.exists:
            closed, s_us, e_us, n0, sum0 = state.get
            cur = [s_us, e_us, n0, sum0]
        # sessions closed by evidence: a later event past the gap
        done, cur = _merge_session_events(
            cur, us, [_micro(v) for v in vals], gap_us)
        state.update((closed + len(done),
                      cur[0], cur[1], cur[2], cur[3]))
        done.append(cur)  # trailing open session, emitted optimistically
        uid = key[0]
        out = pd.DataFrame(
            [(uid, closed + i + 1, s[0], s[1], s[2],
              float(Decimal(s[3]).scaleb(-6)))
             for i, s in enumerate(done)],
            columns=["user_id", "session_id", "session_start",
                     "session_end", "n_events", "sum_value"])
        out["session_start"] = pd.to_datetime(out["session_start"],
                                              unit="us")
        out["session_end"] = pd.to_datetime(out["session_end"], unit="us")
        yield out

    sessions = ev.groupBy("user_id").applyInPandasWithState(
        handler, out_schema, state_schema, "append",
        GroupStateTimeout.NoTimeout)

    spark.catalog.dropTempView(table_name) if any(
        t.name == table_name for t in spark.catalog.listTables()) else None
    q = (sessions.writeStream.format("memory").queryName(table_name)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    _capture_stream_plan(q, table_name)
    return spark.table(table_name)


def enriched_counts_stream(
        spark: SparkSession, sf_dir: str,
        table_name: str = "idp_stream_enriched") -> DataFrame:
    """Stream-static join: the streaming events source enriched with
    the STATIC customer dimension (user_id → mktsegment), then a
    watermarked hourly count per (hour, segment). The static side of
    a stream-static join is re-read per micro-batch and broadcast —
    no state beyond the windowed counts, so this is the scale-correct
    shape for dimension enrichment on an unbounded stream."""
    src = events_stream(spark, sf_dir)
    from industrial_data_pipeline_spark.suite_common import load
    cust = (load(spark, sf_dir, "customer")
            .select(F.col("c_custkey").alias("user_id"),
                    F.col("c_mktsegment").alias("segment")))
    agg = (
        src.select("ts", "user_id")
        .join(cust, "user_id")  # stream-static broadcast join
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), "segment")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("hour_start"), "segment", "n")
    )
    if any(t.name == table_name for t in spark.catalog.listTables()):
        spark.catalog.dropTempView(table_name)
    q = (agg.writeStream.format("memory").queryName(table_name)
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination()
    _capture_stream_plan(q, table_name)
    return spark.table(table_name)


def session_window_stream(
        spark: SparkSession, sf_dir: str, gap: str = "30 minutes",
        table_name: str = "idp_stream_swindow") -> DataFrame:
    """Sessionization via Spark's NATIVE ``session_window`` aggregate
    (vs q66's applyInPandasWithState): the engine merges overlapping
    [event, event+gap) intervals per user in JVM state — no Python
    handler, no custom state schema, and the state store compacts
    windows as they merge. This is the built-in operator a pipeline
    should reach for FIRST; the applyInPandasWithState variant exists
    for semantics the built-in can't express (session ordinals,
    custom emission) — having both, checked against the same batch
    truth, documents exactly where the built-in's contract ends.

    Boundary semantics differ from the gap-walk by design: windows
    are half-open, so a gap of EXACTLY ``gap`` starts a new session
    (the walk's ``>`` keeps it). The oracle replays ``>=``.

    sum_value sums DECIMAL (order-independent, the q43 rule)."""
    src = events_stream(spark, sf_dir)
    agg = (
        src.select("ts", "user_id", "value")
        .withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"),
             F.sum(F.col("value").cast("decimal(28,6)"))
             .cast("double").alias("sum_value"))
        .select("user_id", F.col("w.start").alias("session_start"),
                F.col("w.end").alias("session_end"),
                "n_events", "sum_value")
    )
    if any(t.name == table_name for t in spark.catalog.listTables()):
        spark.catalog.dropTempView(table_name)
    q = (agg.writeStream.format("memory").queryName(table_name)
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination()
    _capture_stream_plan(q, table_name)
    return spark.table(table_name)


def stream_stream_attribution(
        spark: SparkSession, sf_dir: str,
        table_name: str = "idp_stream_attrib") -> DataFrame:
    """STREAM-STREAM inner join (the last join class the suite lacked;
    q94 is stream-static): purchase events attributed to every view by
    the same user within the preceding hour. Both sides are unbounded
    sources with watermarks; the time-range predicate bounds join
    state — Spark retains each side only within the watermark+range
    horizon, so state is O(events/hour), never O(stream). Lag is
    emitted in exact integer microseconds (no float in the hash).

    On the bounded availableNow run the append-mode output equals the
    batch join, which is the oracle."""
    v = (events_stream(spark, sf_dir)
         .where(F.col("event_type") == "view")
         .select(F.col("event_id").alias("view_id"),
                 "user_id", F.col("ts").alias("view_ts"))
         .withWatermark("view_ts", "1 hour"))
    p = (events_stream(spark, sf_dir)
         .where(F.col("event_type") == "purchase")
         .select(F.col("event_id").alias("purchase_id"),
                 F.col("user_id").alias("p_user"),
                 F.col("ts").alias("purchase_ts"))
         .withWatermark("purchase_ts", "1 hour"))
    j = v.join(p, (F.col("user_id") == F.col("p_user"))
               & (F.col("purchase_ts") >= F.col("view_ts"))
               & (F.col("purchase_ts")
                  <= F.col("view_ts") + F.expr("INTERVAL 1 HOUR")))
    out = j.select(
        "user_id", "view_id", "purchase_id",
        (F.unix_micros("purchase_ts")
         - F.unix_micros("view_ts")).alias("lag_us"))
    if any(t.name == table_name for t in spark.catalog.listTables()):
        spark.catalog.dropTempView(table_name)
    q = (out.writeStream.format("memory").queryName(table_name)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    _capture_stream_plan(q, table_name)
    return spark.table(table_name)


def watermark_drop_accounting(
        spark: SparkSession, sf_dir: str, cutoff: str = "2024-01-15",
        table_name: str = "idp_stream_wmdrop") -> DataFrame:
    """PROOF of watermark late-data semantics — the behavior
    complete-mode runs (q62) never exercise: the events table is
    staged as THREE files with forced modification-time order
    (newest slice, a mid slice, then everything older as the late
    batch) and streamed with ``maxFilesPerTrigger=1``, so
    availableNow runs three micro-batches. The watermark computed
    from batch 1's data (max recent ts − 1 h) becomes OPERATIVE one
    batch later (measured: batch 2 still admits rows under the prior
    watermark; batch 3 drops against the advanced one) — so every
    batch-3 row, weeks older than the watermark, is excluded, and
    append mode emits exactly the batch-1/2 windows whose end ≤ the
    final watermark. The oracle replays that arithmetic (hourly
    counts of rows ≥ cutoff, window end ≤ max ts − 1 h) — a hash
    match pins the late drop AND the append-emission boundary.

    State is hour-keyed — bounded by the watermark horizon; at scale
    this is the exact shape of a production late-tolerant rollup."""
    import os
    import shutil
    import tempfile

    from industrial_data_pipeline_spark.suite_common import load

    staging = tempfile.mkdtemp(prefix="idp_wm_")
    try:
        ev = load(spark, sf_dir, "events").select("ts", "event_type")
        mid_lo = "2024-01-08"
        recent = ev.where(F.col("ts") >= cutoff)
        mid = ev.where((F.col("ts") >= mid_lo)
                       & (F.col("ts") < cutoff))
        late = ev.where(F.col("ts") < mid_lo)
        for i, part in ((1, recent), (2, mid), (3, late)):
            tmp = os.path.join(staging, f"_w{i}")
            part.coalesce(1).write.parquet(tmp)
            src_file = next(f for f in os.listdir(tmp)
                            if f.endswith(".parquet"))
            dst = os.path.join(staging, f"batch{i}.parquet")
            shutil.move(os.path.join(tmp, src_file), dst)
            shutil.rmtree(tmp)
            os.utime(dst,
                     (1_700_000_000 + i * 1000,) * 2)  # force order

        src = (spark.readStream.schema(recent.schema)
               .option("maxFilesPerTrigger", "1").parquet(staging))
        agg = (src.withWatermark("ts", "1 hour")
               .groupBy(F.window("ts", "1 hour").alias("w"))
               .agg(F.count("*").alias("n"))
               .select(F.col("w.start").alias("hour_start"), "n"))
        if any(t.name == table_name
               for t in spark.catalog.listTables()):
            spark.catalog.dropTempView(table_name)
        q = (agg.writeStream.format("memory").queryName(table_name)
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination()
        _capture_stream_plan(q, table_name)
        # eager checkpoint so the result survives the staging cleanup
        return spark.table(table_name).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(staging, ignore_errors=True)
