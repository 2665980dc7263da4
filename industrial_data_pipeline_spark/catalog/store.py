"""Parquet-backed multi-database store.

Layout (one directory per "database", mirroring the reference's
one-PostgreSQL-database-per-plant layout, SURVEY.md §1.1):

    {root}/{database}/element/    — tiny dim, plain parquet
    {root}/{database}/attribute/  — tiny dim, plain parquet
    {root}/{database}/archive/    — fact table, partitioned by ts_date

Scale notes (the design target is ~100 TB of archive):

- ``archive`` is hive-partitioned by ``ts_date = date(timestamp)``:
  time-range queries prune partitions at plan time; within files,
  parquet min/max row-group stats prune on ``attribute_id``.
- Upserts (the reference's ON CONFLICT paths,
  /root/reference/database/database.py:594 and :712) are implemented
  as *partition-scoped merges*: only the date partitions present in
  the incoming batch are read, deduped and rewritten via dynamic
  partition overwrite. Steady-state 1-minute ingest therefore touches
  one partition per day regardless of history size.
- Deletes (catalog cascades, /root/reference/database/database.py:915-958)
  are anti-join rewrites. They are rare management-plane operations in
  the reference; we rewrite the full table for dims and all partitions
  for archive (a Delta/Iceberg MERGE slots in behind the same method
  signatures when those jars are available — import-gated, not assumed).
- Dims are small (thousands of rows); every fact⋈dim join should
  broadcast them — readers get them via :meth:`element` /
  :meth:`attribute` and join with ``F.broadcast``.

Single-writer assumption matches the reference (one Flask app, one
ingest daemon per database).
"""

from __future__ import annotations

import contextlib
import functools
import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from industrial_data_pipeline_spark.catalog.schemas import (
    ARCHIVE_PARTITION_COL,
    ARCHIVE_SCHEMA,
    ATTRIBUTE_SCHEMA,
    ELEMENT_SCHEMA,
)

_TABLES = ("element", "attribute", "archive")


class ConcurrentWriterError(RuntimeError):
    """A second PROCESS tried to mutate a database another process is
    writing. The store's contract is single-writer-per-database
    (module docstring — the reference runs one Flask app + one ingest
    daemon per database); this error turns a silent-corruption
    scenario (interleaved dynamic-partition overwrites) into a loud
    one."""


def _pid_alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:
        return True  # exists, owned by someone else
    return True


def _locked(method):
    """Run a store write under the database's writer lock."""
    @functools.wraps(method)
    def wrapper(self, database, *args, **kwargs):
        with self.write_lock(database):
            return method(self, database, *args, **kwargs)
    return wrapper


class ParquetStore:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)
        self._lock_depth: dict[str, int] = {}
        self._mutex = __import__("threading").Lock()

    # ------------------------------------------------------ writer lock
    def _lock_path(self, database: str) -> str:
        # ROOT-level dotfile, NOT inside the database directory: the
        # lock must never create a phantom database dir for a
        # misspelled name (list_databases only reports directories,
        # and a dotFILE at root is invisible to it either way).
        return os.path.join(self.root, f".{database}.writer.lock")

    def _acquire_lock_file(self, database: str, timeout_s: float) -> bool:
        """Claim the lock file. Returns False when another store
        INSTANCE in this same process holds it (cooperative —
        single-writer is a per-PROCESS contract); raises
        :class:`ConcurrentWriterError` on a live foreign holder.

        Race-free claim and steal: the pid payload is written to a
        private temp file FIRST and published with ``os.link`` —
        atomic, and the lock file is therefore always fully written
        when it becomes visible (no half-written-JSON window). A
        stale lock is stolen by ``os.rename`` to a private name:
        exactly ONE stealer wins the rename (the losers see
        FileNotFoundError and re-race the link), so two waiters can
        never both 'steal' and double-acquire."""
        path = self._lock_path(database)
        payload = json.dumps(
            {"pid": os.getpid(), "ts": time.time()}).encode()
        import uuid as _uuid

        tmp = f"{path}.{os.getpid()}.{_uuid.uuid4().hex[:8]}"
        with open(tmp, "wb") as fh:
            fh.write(payload)
        deadline = time.monotonic() + timeout_s
        try:
            while True:
                try:
                    os.link(tmp, path)
                    return True
                except FileExistsError:
                    pass
                try:
                    with open(path, encoding="utf-8") as fh:
                        pid = int(json.load(fh).get("pid", -1))
                except FileNotFoundError:
                    continue  # released between link and read: re-race
                except (OSError, ValueError):
                    pid = -1  # unreadable: treat as stale
                if pid == os.getpid():
                    return False  # our process already holds it
                if pid < 0 or not _pid_alive(pid):
                    steal = f"{path}.stale.{os.getpid()}." \
                            f"{_uuid.uuid4().hex[:8]}"
                    try:
                        os.rename(path, steal)  # one winner only
                    except FileNotFoundError:
                        continue  # lost the steal race: re-race link
                    with contextlib.suppress(FileNotFoundError):
                        os.unlink(steal)
                    continue
                if time.monotonic() >= deadline:
                    raise ConcurrentWriterError(
                        f"database {database!r} is being written by "
                        f"pid {pid} (lock {path}); the store is "
                        "single-writer per database")
                time.sleep(0.05)
        finally:
            with contextlib.suppress(FileNotFoundError):
                os.unlink(tmp)

    @contextlib.contextmanager
    def write_lock(self, database: str, timeout_s: float = 10.0):
        """Enforce the single-writer-per-database boundary (module
        docstring). The lock is a pid-stamped root-level file:
        best-effort (NFS link() caveats apply; on a real deployment a
        catalog service or Delta/Iceberg commit protocol replaces
        it), but it converts the previously silent assumption into a
        checked property — a second WRITER PROCESS gets
        :class:`ConcurrentWriterError` instead of interleaved
        partition overwrites. Reentrant within one process AND across
        its threads (the management plane nests writes, e.g. upsert
        inside a foreachBatch thread inside an API call): depth
        accounting is mutex-guarded, and only the exit that returns
        the depth to zero releases the file."""
        with self._mutex:
            depth = self._lock_depth.get(database, 0)
            self._lock_depth[database] = depth + 1
        owns_file = False
        try:
            if depth == 0:
                owns_file = self._acquire_lock_file(database, timeout_s)
            yield
        finally:
            release = False
            with self._mutex:
                if database in self._lock_depth:
                    self._lock_depth[database] -= 1
                    if self._lock_depth[database] <= 0:
                        del self._lock_depth[database]
                        release = True
            if release and owns_file:
                with contextlib.suppress(FileNotFoundError):
                    os.unlink(self._lock_path(database))

    # ---------------------------------------------------------- databases
    def list_databases(self) -> list[str]:
        """Reference: enumerate config sections (database.py:54-60)."""
        return sorted(
            d for d in os.listdir(self.root)
            if os.path.isdir(os.path.join(self.root, d))
        )

    @_locked
    def create_database(self, database: str) -> None:
        """Reference DDL create_tables (populate.py:69-160): creates the
        three tables; existing archive data is preserved."""
        for table, schema in (
            ("element", ELEMENT_SCHEMA),
            ("attribute", ATTRIBUTE_SCHEMA),
        ):
            path = self._path(database, table)
            if not os.path.exists(path):
                self.spark.createDataFrame([], schema).write.parquet(path)
        arch = self._path(database, "archive")
        if not os.path.exists(arch):
            empty = self.spark.createDataFrame([], ARCHIVE_SCHEMA)
            self._with_partition(empty).write.partitionBy(
                ARCHIVE_PARTITION_COL
            ).parquet(arch)

    @_locked
    def drop_database(self, database: str) -> None:
        shutil.rmtree(os.path.join(self.root, database), ignore_errors=True)

    # -------------------------------------------------------------- reads
    def _path(self, database: str, table: str) -> str:
        assert table in _TABLES, table
        return os.path.join(self.root, database, table)

    def element(self, database: str) -> DataFrame:
        return self.spark.read.schema(ELEMENT_SCHEMA).parquet(
            self._path(database, "element"))

    def attribute(self, database: str) -> DataFrame:
        return self.spark.read.schema(ATTRIBUTE_SCHEMA).parquet(
            self._path(database, "attribute"))

    def archive(self, database: str) -> DataFrame:
        """Fact table scan; ts_date partition column retained so callers'
        date filters prune partitions (drop it with .select if unwanted).
        Explicit schema: a freshly created archive has no files yet, and
        schema inference would fail (UNABLE_TO_INFER_SCHEMA)."""
        schema = T.StructType(
            list(ARCHIVE_SCHEMA.fields)
            + [T.StructField(ARCHIVE_PARTITION_COL, T.DateType(), True)])
        return self.spark.read.schema(schema).parquet(
            self._path(database, "archive"))

    def archive_values(self, database: str) -> DataFrame:
        """Archive projected to its logical schema (no partition col)."""
        return self.archive(database).select("attribute_id", "timestamp", "value")

    # ------------------------------------------------------------- writes
    @staticmethod
    def _with_partition(df: DataFrame) -> DataFrame:
        return df.withColumn(ARCHIVE_PARTITION_COL, F.to_date("timestamp"))

    @staticmethod
    def _clustered(df: DataFrame) -> DataFrame:
        """Archive write layout: one shuffle clusters rows by date
        (file count tracks date count — the small-files guard), then
        an in-task sort by (attribute_id, timestamp) so every parquet
        row group covers a narrow attribute range and min/max stats
        prune attribute filters at scan time. This is the columnar
        analog of the reference's only physical read-path tuning —
        its archive(attribute_id) / archive(timestamp) B-tree indexes
        (populate.py:113-118): partition pruning plays the timestamp
        index, row-group clustering plays the attribute index.
        Measured effect in SCALE_NOTES.md."""
        return df.repartition(F.col(ARCHIVE_PARTITION_COL)) \
            .sortWithinPartitions(ARCHIVE_PARTITION_COL,
                                  "attribute_id", "timestamp")

    @_locked
    def overwrite_dim(self, database: str, table: str, df: DataFrame) -> None:
        assert table in ("element", "attribute")
        path = self._path(database, table)
        tmp = path + ".tmp"
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        # atomic-ish swap: dims are tiny; single-writer assumption
        if os.path.exists(path):
            shutil.rmtree(path)
        os.rename(tmp, path)

    @_locked
    def append_archive(self, database: str, df: DataFrame) -> None:
        """Blind bulk append (reference COPY path, ingest.py:166-176).
        Caller is responsible for (attribute_id, timestamp) uniqueness
        against existing data; use :meth:`upsert_archive` otherwise.

        Writes go through :meth:`_clustered`: one shuffle on the date
        (file count tracks date count — the small-files guard; without
        it every task emits its own file per date, |tasks|×|dates|
        files per append) + in-task (attribute_id, timestamp) sort for
        row-group pruning."""
        self._clustered(self._with_partition(df)) \
            .write.mode("append").partitionBy(
                ARCHIVE_PARTITION_COL
            ).parquet(self._path(database, "archive"))

    @_locked
    def drop_archive_partitions(self, database: str,
                                before_date: str) -> int:
        """Retention/TTL enforcement as a PARTITION DROP: remove every
        ``ts_date=`` directory strictly older than ``before_date`` —
        a metadata-cost operation (directory unlink per expired day),
        the 100 TB answer to retention where the anti-join rewrite
        (:meth:`rewrite_archive`) would re-shuffle years of history
        to delete the oldest slice. The reference's only retention is
        its 24 h export cleanup (web_app.py:207-222); archive TTL is
        the engine-side analog. Returns the number of partitions
        dropped."""
        root = self._path(database, "archive")
        dropped = 0
        prefix = ARCHIVE_PARTITION_COL + "="
        if not os.path.isdir(root):
            return 0
        for d in sorted(os.listdir(root)):
            if not d.startswith(prefix):
                continue
            if d[len(prefix):] < before_date:
                target = os.path.join(root, d)
                shutil.rmtree(target, ignore_errors=True)
                # only count partitions actually gone — a failed
                # rmtree must not overstate retention enforcement
                if not os.path.isdir(target):
                    dropped += 1
        return dropped

    @_locked
    def compact_archive(self, database: str,
                        target_files: int = 1
                        ) -> list[tuple[str, int, int]]:
        """Small-file compaction, per date partition: every append
        leaves one file per date (see :meth:`append_archive`), so a
        day that receives K appends accumulates K files — at 100 TB
        the classic small-files problem (each file is a scan task
        and a namenode entry). Rewrite every partition holding more
        than ``target_files`` parquet files into ``target_files``
        (restoring the (attribute_id, timestamp) row-group sort).
        Returns (date, files_before, files_after) per partition.

        Crash safety: staging dirs are ``_``-prefixed, which Spark/
        Hadoop partition discovery IGNORES, so a half-finished
        compaction never double-counts or pollutes reads (a tmp dir
        named inside the partition namespace would be discovered as
        a bogus partition). The swap is write ``_compact_tmp`` →
        rename live → ``_compact_old`` → rename tmp → live → drop
        old; the only vulnerable instant is between the two renames,
        and the recovery sweep at the start of the next run restores
        an orphaned ``_compact_old`` whose live dir is missing and
        clears stale staging.

        The loop is driver-side metadata work bounded by the
        retention horizon (|dates|), same cost class as
        :meth:`drop_archive_partitions`; each rewrite is its own
        bounded Spark job over one day of data."""
        root = self._path(database, "archive")
        prefix = ARCHIVE_PARTITION_COL + "="
        stats: list[tuple[str, int, int]] = []
        if not os.path.isdir(root):
            return stats

        # recovery sweep for a previously crashed compaction
        for d in sorted(os.listdir(root)):
            p = os.path.join(root, d)
            if d.startswith("_compact_old_"):
                live = os.path.join(root,
                                    prefix + d[len("_compact_old_"):])
                if os.path.isdir(live):
                    shutil.rmtree(p, ignore_errors=True)
                else:
                    os.rename(p, live)
            elif d.startswith("_compact_tmp_"):
                shutil.rmtree(p, ignore_errors=True)

        def parquet_files(p: str) -> int:
            return sum(f.endswith(".parquet") for f in os.listdir(p))

        for d in sorted(os.listdir(root)):
            if not d.startswith(prefix):
                continue
            part = os.path.join(root, d)
            date = d[len(prefix):]
            n_before = parquet_files(part)
            if n_before <= target_files:
                stats.append((date, n_before, n_before))
                continue
            tmp = os.path.join(root, f"_compact_tmp_{date}")
            old = os.path.join(root, f"_compact_old_{date}")
            (self.spark.read.parquet(part)
             .coalesce(target_files)
             .sortWithinPartitions("attribute_id", "timestamp")
             .write.mode("overwrite").parquet(tmp))
            os.rename(part, old)
            os.rename(tmp, part)
            shutil.rmtree(old, ignore_errors=True)
            stats.append((date, n_before, parquet_files(part)))
        return stats

    @_locked
    def upsert_archive(self, database: str, df: DataFrame,
                       mode: str = "first_wins") -> None:
        """Partition-scoped merge on (attribute_id, timestamp).

        mode="first_wins"  — existing rows win (reference backfill
            ON CONFLICT DO NOTHING, database.py:594)
        mode="last_wins"   — incoming rows win (reference trigger
            ON CONFLICT DO UPDATE, database.py:710-713)

        Only the date partitions present in ``df`` are read and
        rewritten (dynamic partition overwrite), so cost scales with
        the batch's date span, not with history size.
        """
        assert mode in ("first_wins", "last_wins")
        path = self._path(database, "archive")
        # one evaluation of the caller's plan: the dates collect AND
        # the merge both read it, and for derived maintenance that
        # plan is a pivot+join worth not recomputing
        incoming = self._with_partition(
            df.select("attribute_id", "timestamp", "value")
        ).localCheckpoint(eager=True)
        # affected partitions: tiny driver-side list (dates in the batch)
        dates = [r[0] for r in
                 incoming.select(ARCHIVE_PARTITION_COL).distinct().collect()]
        if not dates:
            return
        existing = (
            self.archive(database)
            .where(F.col(ARCHIVE_PARTITION_COL).isin(dates))
        )
        # precedence via a source rank instead of a window sort over
        # everything: groupBy + min_by/max_by is a single partial-aggable
        # shuffle on the merge key.
        old = existing.withColumn("_src", F.lit(0))
        new = incoming.withColumn("_src", F.lit(1))
        unioned = old.unionByName(new)
        pick = F.min_by if mode == "first_wins" else F.max_by
        # ordering struct: _src (old-vs-new precedence) THEN value —
        # duplicate keys WITHIN one batch would otherwise tie on _src
        # and pick a partition-order-dependent winner
        merged = (
            unioned.groupBy("attribute_id", "timestamp")
            .agg(
                pick(F.struct("value", ARCHIVE_PARTITION_COL),
                     F.struct(F.col("_src"), F.col("value")))
                .alias("_row"))
            .select("attribute_id", "timestamp",
                    F.col("_row.value").alias("value"),
                    F.col(f"_row.{ARCHIVE_PARTITION_COL}")
                    .alias(ARCHIVE_PARTITION_COL))
        )
        # materialize before the overwrite: the merged plan reads the
        # same partitions it is about to replace. Bounded by the
        # batch's affected partitions, not history size.
        merged = merged.localCheckpoint(eager=True)
        with self._dynamic_overwrite():
            self._clustered(merged) \
                .write.mode("overwrite").partitionBy(
                    ARCHIVE_PARTITION_COL
                ).parquet(path)

    @_locked
    def rewrite_archive(self, database: str, df: DataFrame) -> None:
        """Full rewrite with the logical schema (delete/remap paths)."""
        path = self._path(database, "archive")
        tmp = path + ".tmp"
        self._clustered(self._with_partition(
            df.select("attribute_id", "timestamp", "value")
        )).write.partitionBy(ARCHIVE_PARTITION_COL).parquet(tmp)
        shutil.rmtree(path)
        os.rename(tmp, path)

    def _dynamic_overwrite(self):
        spark, key = self.spark, "spark.sql.sources.partitionOverwriteMode"

        class _Ctx:
            def __enter__(self_inner):
                self_inner.prev = spark.conf.get(key, "static")
                spark.conf.set(key, "dynamic")

            def __exit__(self_inner, *exc):
                spark.conf.set(key, self_inner.prev)

        return _Ctx()
