"""Real-time derived-attribute maintenance (T5) — Structured Streaming.

The reference generates one plpgsql ``AFTER INSERT FOR EACH ROW``
trigger per derived attribute (/root/reference/database/
database.py:644-743): on every source-row insert it looks up all
sibling source values at the same timestamp and, if all are present,
upserts ``formula(values)`` for the derived id (ON CONFLICT DO UPDATE
— last-wins).

Spark has no per-row triggers; the equivalent with identical
*final-state* semantics (SURVEY.md §2.8/T5, §7.2) is a micro-batch
maintenance job: for each batch of incoming source rows,

  1. append the batch to the archive,
  2. for every derived attribute whose source set intersects the
     batch: recompute the formula at the batch's affected timestamps
     (sibling values come from the just-updated archive, so
     cross-batch alignment works exactly like the trigger's SELECTs),
  3. upsert the derived rows last-wins.

Visibility latency changes (micro-batch vs synchronous trigger); the
resulting archive state is the same.

Scale notes: affected timestamps per batch are bounded by batch size;
the sibling lookup prunes archive date-partitions by the batch's dates
before joining, so cost tracks batch span, not history size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery

from industrial_data_pipeline_spark.catalog.store import ParquetStore
from industrial_data_pipeline_spark.functions.formula import referenced_ids
from industrial_data_pipeline_spark.operators.derived import backfill_derived
from industrial_data_pipeline_spark.sources.ingest import RAW_SCHEMA, cleanse


class DerivedMaintenance:
    """foreachBatch handler maintaining all derived attributes of one
    database. Derived definitions are re-read from the catalog each
    batch (cheap — dimension table) so inserts/updates of derived
    attributes take effect without restarting the stream."""

    def __init__(self, spark: SparkSession, store: ParquetStore,
                 database: str):
        self.spark = spark
        self.store = store
        self.database = database

    def derived_formulas(self) -> dict[int, str]:
        rows = (self.store.attribute(self.database)
                .where(F.col("formula").isNotNull())
                .select("attribute_id", "formula").collect())
        return {r["attribute_id"]: r["formula"] for r in rows}

    def process_batch(self, batch: DataFrame, epoch_id: int = 0) -> None:
        """One micro-batch of archive-shaped source rows."""
        batch = batch.select("attribute_id", "timestamp", "value") \
            .localCheckpoint(eager=True)
        if batch.isEmpty():
            return
        # 1. the insert itself (the reference's COPY; last-wins so a
        #    re-sent reading updates, matching trigger-era behavior).
        #    The returned merged frame is the MATERIALIZED post-write
        #    content of the batch's date partitions (optimization
        #    r15): the first derived recompute reads those local
        #    blocks instead of re-listing + re-scanning the files
        #    this call just wrote.
        merged = self.store.upsert_archive(self.database, batch,
                                           mode="last_wins")

        formulas = self.derived_formulas()
        if not formulas:
            return
        # ONE distinct collect feeds both driver-side sets
        # (optimization r15 — previously two jobs over the same
        # materialized batch)
        meta = (batch.select("attribute_id",
                             F.to_date("timestamp").alias("d"))
                .distinct().collect())
        batch_ids = {r["attribute_id"] for r in meta}
        affected_dates = sorted({r["d"] for r in meta})

        for did, formula in formulas.items():
            src_ids = referenced_ids(formula)
            if not (set(src_ids) & batch_ids):
                continue  # this batch can't change the derived value
            affected_ts = (batch
                           .where(F.col("attribute_id").isin(src_ids))
                           .select("timestamp").distinct())
            if merged is not None:
                # the merged frame == the affected partitions'
                # post-write content, so the FIRST formula's sibling
                # lookup needs no store re-read
                archive = merged
            else:
                # a previous formula's upsert rewrote the affected
                # partitions via dynamic-partition overwrite, so a
                # frame built before that write would scan a stale
                # file listing and die with FileNotFoundException —
                # re-list fresh per subsequent formula (also the
                # chained-derived case: formula N+1 must see formula
                # N's rows)
                archive = self.store.archive(self.database).where(
                    F.col("ts_date").isin(affected_dates))
            src = (archive
                   .where(F.col("attribute_id").isin(src_ids))
                   .join(F.broadcast(affected_ts), "timestamp")
                   .select("attribute_id", "timestamp", "value"))
            rows = backfill_derived(src, did, formula)
            # 3. trigger upsert is ON CONFLICT DO UPDATE → last-wins
            self.store.upsert_archive(self.database, rows,
                                      mode="last_wins")
            merged = None  # later formulas re-read (see above)

    # ------------------------------------------------------------ wiring

    def attach(self, source_rows: DataFrame, checkpoint: str,
               trigger_seconds: int | None = None,
               prepare=None) -> StreamingQuery:
        """Start maintenance over a streaming DataFrame of archive-shaped
        rows (attribute_id, timestamp, value). ``prepare`` optionally
        maps each (static) micro-batch before processing — cleansing
        stays inside foreachBatch because it aggregates (first-wins
        dedup), which a plain streaming plan would reject without a
        watermark."""

        def handle(batch: DataFrame, epoch_id: int) -> None:
            if prepare is not None:
                batch = prepare(batch)
            self.process_batch(batch, epoch_id)

        writer = (source_rows.writeStream
                  .foreachBatch(handle)
                  .option("checkpointLocation", checkpoint)
                  .outputMode("update"))
        if trigger_seconds:
            writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
        return writer.start()

    def attach_staging_dir(self, staging_dir: str, checkpoint: str,
                           raw: bool = False,
                           mapping: DataFrame | None = None,
                           tz_shift_hours: int = 7) -> StreamingQuery:
        """Stream from a staging directory where the fetcher drops
        parquet batches. ``raw=True`` expects RAW_SCHEMA rows (PI batch
        shape) and applies the ingest cleansing per micro-batch — the
        streaming twin of sources/ingest.py."""
        if raw:
            src = (self.spark.readStream.schema(RAW_SCHEMA)
                   .parquet(staging_dir))
            return self.attach(
                src, checkpoint,
                prepare=lambda b: cleanse(b, mapping, tz_shift_hours))
        src = (self.spark.readStream
               .schema("attribute_id long, timestamp timestamp, "
                       "value double")
               .parquet(staging_dir))
        return self.attach(src, checkpoint)
