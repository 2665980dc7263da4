"""Incremental time-series ingestion (batch form of the reference's
cron-style ingest daemon, /root/reference/src/pi/extraction/ingest.py).

Pipeline per pull (SURVEY.md §3.3):
  fetch raw rows {lookup_key, timestamp(ISO8601 UTC str), value(any)}
    → cleanse: tz shift (+7h default, F7), bool/num coercion (F8)
    → broadcast mapping join lookup_key → attribute_id (J7)
    → drop unmapped (P8), first-wins in-batch dedup (P9)
    → bulk append to archive (S8)

The HTTP fetcher is injected (``fetch_fn``) — the reference's one
batched POST /batch fanning out N interpolated GETs
(ingest.py:91-133) is a network concern outside the engine; tests use
a deterministic fake. Everything after the fetch is columnar Spark.

Streaming semantics implemented batch-incrementally, as the reference
does (§2.8): watermark resume (T1), density circuit breaker (T2),
hourly-block recovery (T3).
"""

from __future__ import annotations

from collections.abc import Callable
from datetime import datetime, timedelta

from pyspark.sql import DataFrame, SparkSession, functions as F

from industrial_data_pipeline_spark.catalog.store import ParquetStore

RAW_SCHEMA = "lookup_key string, timestamp string, value string"

#: reference expectation: ~5000 rows per wall-clock minute per site
#: (ingest.py:233-234).
DEFAULT_EXPECTED_ROWS_PER_MIN = 5000


class DensityError(RuntimeError):
    """Raised when a pull returns fewer rows than expected (T2;
    ingest.py:232-239) — triggers hourly-block recovery."""


def cleanse(raw: DataFrame, mapping: DataFrame,
            tz_shift_hours: int = 7) -> DataFrame:
    """Raw batch → archive-shaped rows.

    - ISO8601 UTC string → timestamp + ``tz_shift_hours`` (the
      reference hard-codes +7 for ICT, ingest.py:146; we default-match).
    - booleans → 1/0, non-numeric strings → NULL
      (ingest.py:147-148 coercion, F8).
    - unmapped lookup_keys dropped (P8; ingest.py:149).
    - first-wins dedup on (attribute_id, timestamp) (P9;
      ingest.py:156) — 'first' = lowest COERCED value with non-null
      preferred (a garbage reading must never beat a real one on a
      duplicate key; NULL survives only when every duplicate is
      garbage). Deterministic total order — pandas kept implicit
      input order, which Spark does not have.
    """
    shifted = F.to_timestamp("timestamp") + F.expr(
        f"INTERVAL {int(tz_shift_hours)} HOURS")
    coerced = (
        F.when(F.lower("value") == "true", F.lit(1.0))
        .when(F.lower("value") == "false", F.lit(0.0))
        .otherwise(F.expr("try_cast(value AS DOUBLE)"))
    )
    rows = (
        raw.select(
            F.col("lookup_key"),
            shifted.alias("timestamp"),
            coerced.alias("value"),
        )
        .join(mapping, "lookup_key")  # inner join drops unmapped (P8)
        .select("attribute_id", "timestamp", "value")
    )
    ordk = F.struct(F.col("value").isNull(), F.col("value"))
    return (rows.groupBy("attribute_id", "timestamp")
            .agg(F.min_by(F.struct("value"), ordk).alias("_r"))
            .select("attribute_id", "timestamp",
                    F.col("_r.value").alias("value")))


class IncrementalIngestor:
    """One reference 'site thread' (process_database_thread,
    ingest.py:194-275) as a restartable batch job."""

    def __init__(self, spark: SparkSession, store: ParquetStore,
                 database: str, mapping: DataFrame,
                 fetch_fn: Callable[[datetime, datetime], DataFrame],
                 expected_rows_per_min: int = DEFAULT_EXPECTED_ROWS_PER_MIN,
                 tz_shift_hours: int = 7,
                 default_start: datetime | None = None):
        self.spark = spark
        self.store = store
        self.database = database
        self.mapping = mapping
        self.fetch_fn = fetch_fn
        self.expected = expected_rows_per_min
        self.tz_shift_hours = tz_shift_hours
        self.default_start = default_start

    def watermark(self) -> datetime | None:
        """T1/A2: resume point = max(timestamp) + 1 minute
        (ingest.py:217-220).

        Rendered to a naive datetime VIA a session-TZ string
        (date_format), not via first()'s raw timestamp: PySpark
        converts collected timestamps in the PYTHON PROCESS timezone
        while every JVM-side parse/format uses the session timezone —
        a raw round trip silently shifts the resume point whenever the
        two differ."""
        row = (self.store.archive_values(self.database)
               .agg(F.date_format(F.max("timestamp"),
                                  "yyyy-MM-dd HH:mm:ss.SSSSSS")
                    .alias("m")).first())
        if row and row["m"] is not None:
            return datetime.fromisoformat(row["m"]) \
                + timedelta(minutes=1)
        return self.default_start

    def pull(self, start: datetime, end: datetime,
             enforce_density: bool = True) -> int:
        """One fetch→cleanse→append cycle; returns rows appended."""
        raw = self.fetch_fn(start, end)
        batch = cleanse(raw, self.mapping, self.tz_shift_hours)
        batch = batch.localCheckpoint(eager=True)  # fetch once, use twice
        n = batch.count()
        if enforce_density:
            minutes = max(int((end - start).total_seconds() // 60), 1)
            if n < minutes * self.expected:
                raise DensityError(
                    f"expected >= {minutes * self.expected} rows for "
                    f"{minutes} min, got {n}")
        self.store.append_archive(self.database, batch)
        return n

    def now_bound(self, wallclock: datetime | None = None) -> datetime:
        """F9: the ingest upper bound is the wall clock truncated to
        the whole minute (reference ``now().replace(second=0,
        microsecond=0)``, src/pi/extraction/ingest.py:221) — a pull
        never covers a partial trailing minute, so the next watermark
        lands exactly on the minute grid.

        Truncation runs JVM-side (``date_trunc('minute', …)``) and
        returns via a session-TZ string for the same reason as
        :meth:`watermark`: a collected raw timestamp would re-enter
        Python in the PROCESS timezone. ``wallclock`` is injectable
        for deterministic replay; None means the cluster clock
        (``current_timestamp``)."""
        col = (F.to_timestamp(F.lit(wallclock.isoformat(sep=" ")))
               if wallclock is not None else F.current_timestamp())
        row = self.spark.range(1).select(
            F.date_format(F.date_trunc("minute", col),
                          "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("b")) \
            .first()
        return datetime.fromisoformat(row["b"])

    def run_now(self, wallclock: datetime | None = None) -> int:
        """One scheduled cycle exactly as the reference's cron entry
        point runs it: upper bound = minute-truncated now (F9), then
        the normal watermark-resume pull with recovery."""
        return self.run(self.now_bound(wallclock))

    def run(self, now: datetime) -> int:
        """Normal incremental cycle with hourly-block recovery on
        density failure (T3; ingest.py:256-270)."""
        start = self.watermark()
        if start is None or start >= now:
            return 0
        try:
            return self.pull(start, now)
        except DensityError:
            return self.recover(start, now)

    def recover(self, start: datetime, now: datetime) -> int:
        """T3: re-pull 59-minute blocks sequentially until caught up
        (density not enforced per-block, matching the reference's
        recovery loop)."""
        total, q = 0, start
        while q < now:
            block_end = min(q + timedelta(minutes=59), now)
            total += self.pull(q, block_end, enforce_density=False)
            q = block_end + timedelta(minutes=1)
        return total
