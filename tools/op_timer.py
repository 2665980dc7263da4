"""Phase-timer for registered queries (optimization round 14, guide
§1: measure first).

Wraps every eager lifecycle method of the stored-index classes (build
/ append / retract / compact — the parquet-writing calls) plus
rewrite_under_lease and DataFrame.localCheckpoint with wall timers,
then runs REGISTRY[<query>] exactly the way bench.py does (noop sink)
and prints a phase breakdown: how much of the query's wall clock is
asset lifecycle vs. the final probe/fusion action.

Usage::

    python tools/op_timer.py q304_tenant_asof_hybrid [q307_...]
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python tools/op_timer.py q304...
    OT_RUNS=2 python tools/op_timer.py q304   # repeat (2nd run = warm)

Output: one line per timed call in call order, then the query total.
Measurement-only tool — never imported by the suite.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

EVENTS: list[tuple[str, float]] = []
_DEPTH = [0]


def _wrap(cls, name: str) -> None:
    orig = getattr(cls, name)
    if getattr(orig, "_ot_wrapped", False):
        return

    @functools.wraps(orig)
    def timed(*a, **kw):
        label = f"{cls.__name__}.{name}"
        _DEPTH[0] += 1
        t0 = time.perf_counter()
        try:
            return orig(*a, **kw)
        finally:
            _DEPTH[0] -= 1
            if _DEPTH[0] == 0:  # only top-level calls (retract wraps
                # rewrite_under_lease; don't double-count)
                EVENTS.append((label, time.perf_counter() - t0))

    timed._ot_wrapped = True
    setattr(cls, name, timed)


def _wrap_fn(mod, name: str) -> None:
    orig = getattr(mod, name)
    if getattr(orig, "_ot_wrapped", False):
        return

    @functools.wraps(orig)
    def timed(*a, **kw):
        _DEPTH[0] += 1
        t0 = time.perf_counter()
        try:
            return orig(*a, **kw)
        finally:
            _DEPTH[0] -= 1
            if _DEPTH[0] == 0:
                EVENTS.append((name, time.perf_counter() - t0))

    timed._ot_wrapped = True
    setattr(mod, name, timed)


def main() -> None:
    names = sys.argv[1:]
    if not names:
        print("usage: op_timer.py <query_name> [...]", file=sys.stderr)
        sys.exit(2)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR",
                            "/root/testdata/sf0.1")
    runs = int(os.environ.get("OT_RUNS", "1"))

    from industrial_data_pipeline_spark.session import get_spark
    from industrial_data_pipeline_spark.suite import REGISTRY

    from industrial_data_pipeline_spark.operators import (
        bm25_index, lsh_index, similarity)
    from industrial_data_pipeline_spark.operators.bm25_index import (
        StoredBm25Index)
    from industrial_data_pipeline_spark.operators.lsh_index import (
        StoredLshIndex)
    from industrial_data_pipeline_spark.operators.similarity import (
        StoredIvfIndex, StoredSignatureIndex)
    from pyspark.sql import DataFrame

    from industrial_data_pipeline_spark.operators.retrieval import (
        HybridRetriever)

    for cls in (StoredBm25Index, StoredIvfIndex, StoredLshIndex,
                StoredSignatureIndex, HybridRetriever):
        for meth in ("build", "append", "append_frames", "retract",
                     "compact", "rebuild", "probe", "probe_frames",
                     "probe_batch", "probe_batch_adc",
                     "probe_batch_sq", "phrase_probe",
                     "phrase_probe_frames", "overlap_probe_frames",
                     "retrieve", "retrieve_frames"):
            if hasattr(cls, meth):
                _wrap(cls, meth)
    _wrap_fn(lsh_index, "rewrite_under_lease")
    _wrap_fn(lsh_index, "compact_parquet_dir")
    _wrap(DataFrame, "localCheckpoint")
    from industrial_data_pipeline_spark.api import Pipeline
    from industrial_data_pipeline_spark.catalog.store import (
        ParquetStore)
    wrap_classes = ((ParquetStore,)
                    if os.environ.get("OT_WRAP") == "store"
                    else (Pipeline, ParquetStore))
    for cls in wrap_classes:
        for meth in [m for m in vars(cls)
                     if not m.startswith("_")
                     and callable(getattr(cls, m, None))]:
            _wrap(cls, meth)
    # keep bm25_index/similarity module-level references honest: they
    # import rewrite_under_lease at module top
    bm25_index.rewrite_under_lease = lsh_index.rewrite_under_lease
    similarity.rewrite_under_lease = lsh_index.rewrite_under_lease

    evdir = "/tmp/idp_eventlog"
    os.makedirs(evdir, exist_ok=True)
    spark = get_spark("idp-op-timer", extra_conf={
        "spark.eventLog.enabled": "true",
        "spark.eventLog.dir": evdir,
        "spark.eventLog.compress": "false",
        "spark.eventLog.rolling.enabled": "false",
    })
    # bench-identical warmup
    REGISTRY["q01_export_long"][0](spark, sf_dir).write \
        .format("noop").mode("overwrite").save()

    def job_window():
        """(job_id floor) marker: jobs with id >= this belong to the
        next query."""
        tracker = spark.sparkContext.statusTracker()
        ids = tracker.getJobIdsForGroup(None)
        return (max(ids) + 1) if ids else 0

    out = {}
    for qname in names:
        fn, _ = REGISTRY[qname]
        for r in range(runs):
            EVENTS.clear()
            j0 = job_window()
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t_plan = time.perf_counter() - t0
            df.write.format("noop").mode("overwrite").save()
            total = time.perf_counter() - t0
            out.setdefault("_jobs", {})[f"{qname}#{r}"] = j0
            phases = [(lbl, round(s, 3)) for lbl, s in EVENTS]
            acct = sum(s for _, s in EVENTS)
            print(f"\n=== {qname} run {r}: total={total:.2f}s "
                  f"(fn={t_plan:.2f}s, final action="
                  f"{total - t_plan:.2f}s; timed lifecycle="
                  f"{acct:.2f}s, untimed={t_plan - acct:.2f}s)")
            for lbl, s in phases:
                print(f"  {s:8.3f}  {lbl}")
            out[f"{qname}#{r}"] = {
                "total": round(total, 3),
                "fn": round(t_plan, 3),
                "action": round(total - t_plan, 3),
                "phases": phases,
            }
    with open("/tmp/op_timer_result.json", "w") as fh:
        json.dump(out, fh, indent=1)

    app_id = spark.sparkContext.applicationId
    spark.stop()
    _report_jobs(os.path.join(evdir, app_id),
                 out.get("_jobs", {}), names, runs)


def _report_jobs(log_path: str, job_floors: dict, names, runs) -> None:
    """Parse the event log: per-job wall duration + callsite, grouped
    per query by job-id floor."""
    jobs = {}
    stages = {}
    try:
        with open(log_path) as fh:
            for line in fh:
                if '"SparkListenerJobStart"' in line:
                    ev = json.loads(line)
                    jid = ev["Job ID"]
                    jobs[jid] = {
                        "t0": ev["Submission Time"],
                        "site": ev.get("Properties", {}).get(
                            "callSite.short", "?"),
                        "n_stages": len(ev.get("Stage IDs", [])),
                        "sids": ev.get("Stage IDs", []),
                    }
                elif '"SparkListenerJobEnd"' in line:
                    ev = json.loads(line)
                    jid = ev["Job ID"]
                    if jid in jobs:
                        jobs[jid]["t1"] = ev["Completion Time"]
                elif '"SparkListenerStageCompleted"' in line:
                    si = json.loads(line)["Stage Info"]
                    if "Completion Time" in si:
                        stages[si["Stage ID"]] = (
                            (si["Completion Time"]
                             - si.get("Submission Time",
                                      si["Completion Time"]))
                            / 1000.0,
                            si["Stage Name"],
                            si["Number of Tasks"])
    except OSError as exc:
        print(f"[op_timer] no event log: {exc}", file=sys.stderr)
        return
    floors = sorted(((f, key) for key, f in job_floors.items()),
                    key=lambda kv: kv[0])

    def owner(jid: int) -> str:
        name = "_warmup"
        for f, key in floors:
            if jid >= f:
                name = key
        return name

    per = {}
    for jid, j in sorted(jobs.items()):
        if "t1" not in j:
            continue
        per.setdefault(owner(jid), []).append(
            (jid, (j["t1"] - j["t0"]) / 1000.0, j["n_stages"],
             j["site"]))
    for key, rows in per.items():
        if key == "_warmup":
            continue
        tot = sum(d for _, d, _, _ in rows)
        print(f"\n### {key}: {len(rows)} jobs, {tot:.2f}s summed "
              f"job wall")
        for jid, d, ns, site in sorted(rows, key=lambda x: -x[1])[:25]:
            print(f"  {d:7.3f}s  job{jid:<5d} stages={ns:<3d} {site}")
            for sid in jobs[jid]["sids"]:
                if sid in stages and stages[sid][0] > 0.3:
                    sd, sname, nt = stages[sid]
                    print(f"      stage{sid} {sd:6.2f}s "
                          f"tasks={nt:<3d} {sname[:80]}")


if __name__ == "__main__":
    main()
