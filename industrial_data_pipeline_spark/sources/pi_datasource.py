"""PI batch extraction as a PySpark 4 custom Python DataSource (S2+T4).

``spark.read.format("pi_batch")`` with the tag→WebId map as an option:
the reader PARTITIONS the tag set and each Spark task issues its own
``POST /batch`` for its chunk — extraction parallelism becomes the
Spark scheduler's job, which is the idiomatic replacement for the
reference's thread pool (T4, /root/reference/src/pi/extraction/
ingest.py:283-294: ``ThreadPoolExecutor(max_workers=len(configs))``).
The function-style seam (`pi_client.fetch_interpolated`, one
driver-side POST) remains for the incremental ingestor; this connector
is the bulk/backfill path where a big tag set × long time range is
worth fanning out.

Executor-side transport: DataSource options are strings, so the
transport is named by a ``transport_factory`` option in
``"module:function"`` form — resolved with importlib ON THE EXECUTOR
and called with the options dict to build the transport (the same
pattern as naming a JDBC driver class). Production:
``industrial_data_pipeline_spark.sources.pi_datasource:ntlm_transport_factory``
(reads credentials from options); tests inject their own factory
module serving canned wire shapes.

Usage::

    spark.dataSource.register(PIBatchDataSource)
    df = (spark.read.format("pi_batch")
          .option("base_url", "https://pi.example/piwebapi")
          .option("webids", json.dumps({"tag_a": "W1", ...}))
          .option("start", "2024-01-01T00:00:00")
          .option("end", "2024-01-01T01:00:00")
          .option("interval", "1m")
          .option("num_partitions", "4")
          .option("transport_factory", "my_pkg.transports:make")
          .load())        # → RAW_SCHEMA rows, cleanse() downstream
"""

from __future__ import annotations

import importlib
import json
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

from industrial_data_pipeline_spark.sources.ingest import RAW_SCHEMA
from industrial_data_pipeline_spark.sources.pi_client import (
    build_batch_request,
    flatten_batch_response,
)


def resolve_factory(spec: str):
    """``"module.path:callable"`` → the callable (executor-side)."""
    mod_name, _, fn_name = spec.partition(":")
    if not mod_name or not fn_name:
        raise ValueError(
            f"transport_factory must be 'module:function', got {spec!r}")
    return getattr(importlib.import_module(mod_name), fn_name)


def ntlm_transport_factory(options: dict):
    """Production factory: NTLM transport from options
    (username/password/verify). Import-gated like requests_transport."""
    from industrial_data_pipeline_spark.sources.pi_client import (
        requests_transport)
    return requests_transport(
        options["username"], options["password"],
        verify=_verify_option(options.get("verify", "true")))


def _verify_option(raw: str):
    """'true'/'false' → bool; anything else is a CA-bundle PATH and
    must pass through verbatim (collapsing it to True would silently
    validate against the default store instead of the private CA)."""
    low = raw.lower()
    if low in ("true", "false"):
        return low == "true"
    return raw


def fake_grid_transport_factory(options: dict):
    """Sandbox/test factory: serves the PI batch wire shape with a
    deterministic minute grid derived ONLY from the request (webid +
    time range), so executors need no closure state and a SQL oracle
    can replay it exactly: value = (uid*1000003 + epoch_minute) % 997
    for webids of the form ``W{uid}``."""
    from datetime import datetime, timedelta, timezone

    def transport(method: str, url: str, body: dict | None = None):
        assert method == "POST" and url.endswith("/batch")
        out = {}
        for rname, req in (body or {}).items():
            res = req["resource"]
            webid = res.split("/streamsets/")[1].split("/")[0]
            uid = int(webid.removeprefix("W"))
            start = datetime.fromisoformat(
                res.split("startTime=")[1].split("&")[0])
            end = datetime.fromisoformat(
                res.split("endTime=")[1].split("&")[0])
            items, t = [], start
            while t <= end:
                # naive datetime.timestamp() applies the HOST tz; the
                # oracle replays epoch(ts) in UTC — pin UTC so q138/
                # q139 hold on any host timezone
                minute = int(t.replace(tzinfo=timezone.utc)
                             .timestamp() // 60)
                items.append({
                    "Timestamp": t.isoformat(sep="T"),
                    "Value": str((uid * 1000003 + minute) % 997)})
                t += timedelta(minutes=1)
            out[rname] = {"Content": {"Items": [
                {"Path": f"\\\\SRV\\Plant|tag_{uid}", "Items": items}]}}
        return out

    return transport


class PIBatchPartition(InputPartition):
    def __init__(self, webids: dict[str, str]):
        self.webids = webids


class PIBatchReader(DataSourceReader):
    def __init__(self, options: dict):
        self.options = dict(options)
        self.base_url = options["base_url"]
        self.webids: dict[str, str] = json.loads(options["webids"])
        self.start = options["start"]
        self.end = options["end"]
        self.interval = options.get("interval", "1m")
        self.n_parts = max(int(options.get("num_partitions", "4")), 1)
        self.factory_spec = options["transport_factory"]

    def partitions(self) -> Sequence[PIBatchPartition]:
        """Round-robin the tag set into ``num_partitions`` chunks —
        each becomes one Spark task issuing one POST /batch. Empty
        chunks are dropped so a 2-tag read doesn't schedule 4 tasks."""
        chunks: list[dict[str, str]] = [{} for _ in range(self.n_parts)]
        for i, (tag, webid) in enumerate(sorted(self.webids.items())):
            chunks[i % self.n_parts][tag] = webid
        return [PIBatchPartition(c) for c in chunks if c]

    def read(self, partition: PIBatchPartition) -> Iterator[tuple]:
        transport = resolve_factory(self.factory_spec)(self.options)
        body = build_batch_request(
            self.base_url, partition.webids, self.start, self.end,
            self.interval)
        if not body:
            return
        resp = transport("POST", f"{self.base_url}/batch", body)
        yield from flatten_batch_response(resp)


class PIBatchStreamReader(SimpleDataSourceStreamReader):
    """The reference's cron ingest daemon (T1 watermark resume) as a
    real Structured Streaming SOURCE: the offset IS the watermark —
    ``{"next": iso_minute}`` — and each micro-batch pulls
    ``[next, min(next + max_minutes, end_bound))`` through the same
    batch endpoint, so resume-after-crash is Spark's offset log
    instead of a hand-rolled max(timestamp) query. Exactly-once
    delivery into a transactional sink comes from offset replay:
    ``readBetweenOffsets`` re-issues the identical pull (the PI
    interpolated endpoint is deterministic for a fixed range).

    ``end_bound`` (ISO minute, exclusive) keeps sandbox runs bounded;
    production omits it and the source follows the wall clock,
    F9-truncated to whole minutes per pull.
    """

    def __init__(self, options: dict):
        self.options = dict(options)
        self.base_url = options["base_url"]
        self.webids: dict[str, str] = json.loads(options["webids"])
        self.interval = options.get("interval", "1m")
        self.start = options["start"]
        self.end_bound = options.get("end_bound")
        self.max_minutes = int(options.get("max_minutes_per_batch", "59"))
        self.factory_spec = options["transport_factory"]
        self._transport = None

    def initialOffset(self) -> dict:
        return {"next": self.start}

    def _now_minute(self) -> "datetime":
        from datetime import datetime
        if self.end_bound is not None:
            return datetime.fromisoformat(self.end_bound)
        return datetime.now().replace(second=0, microsecond=0)  # F9

    def _pull(self, start_iso: str, end_iso: str) -> list[tuple]:
        if self._transport is None:
            self._transport = resolve_factory(self.factory_spec)(
                self.options)
        body = build_batch_request(self.base_url, self.webids,
                                   start_iso, end_iso, self.interval)
        if not body:
            return []
        resp = self._transport("POST", f"{self.base_url}/batch", body)
        return flatten_batch_response(resp)

    def read(self, start: dict):
        # returns (ITERATOR, offset): the non-availableNow microbatch
        # path (_SimpleStreamReaderWrapper prefetch, used by
        # processAllAvailable) calls next() on the rows — a bare list
        # dies with "'list' object is not an iterator"; the
        # availableNow path merely iterates, so an iterator satisfies
        # both.
        from datetime import datetime, timedelta
        lo = datetime.fromisoformat(start["next"])
        now = self._now_minute()
        if lo >= now:
            return iter([]), start  # caught up: empty batch, same offset
        hi = min(lo + timedelta(minutes=self.max_minutes),
                 now - timedelta(minutes=1))
        rows = self._pull(lo.isoformat(sep="T"), hi.isoformat(sep="T"))
        nxt = (hi + timedelta(minutes=1)).isoformat(sep="T")
        return iter(rows), {"next": nxt}

    def readBetweenOffsets(self, start: dict, end: dict):
        from datetime import datetime, timedelta
        lo = datetime.fromisoformat(start["next"])
        hi = datetime.fromisoformat(end["next"]) - timedelta(minutes=1)
        if hi < lo:
            return iter([])
        return iter(self._pull(lo.isoformat(sep="T"),
                               hi.isoformat(sep="T")))

    def commit(self, end: dict) -> None:
        pass  # nothing to clean up: the PI server holds no cursor


class PIBatchDataSource(DataSource):
    """``format("pi_batch")`` — see module docstring. Batch reads
    partition the tag set (:class:`PIBatchReader`); streaming reads
    follow the minute watermark (:class:`PIBatchStreamReader`)."""

    @classmethod
    def name(cls) -> str:
        return "pi_batch"

    def schema(self) -> str:
        return RAW_SCHEMA

    def reader(self, schema) -> PIBatchReader:
        return PIBatchReader(self.options)

    def simpleStreamReader(self, schema) -> PIBatchStreamReader:
        return PIBatchStreamReader(self.options)
