"""A/B probe for the LSH admission gate's corpus-size coupling.

Measures PER-BATCH gate wall at 1× (sf0.1) and 16× (id-shifted,
token-suffixed explosion — scale_probe.py's documents convention)
corpus, fixed 30-doc batch, for:

  in-plan  dedup.incremental_minhash_lsh   (re-signs corpus per call)
  stored   lsh_index.StoredLshIndex.probe  (probes persisted assets)

The stored index's build cost is reported separately — it is the
one-time corpus pass the persistence amortizes. The claim under test
(VERDICT r7 item 1): stored probe wall stays FLAT (≤2×) at 16×
corpus while in-plan grows ~9×.

Run:  python tools/lsh_gate_probe.py        (min of N runs, default 2)
"""

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession, functions as F  # noqa: E402

from industrial_data_pipeline_spark.operators import dedup as D  # noqa: E402
from industrial_data_pipeline_spark.operators.lsh_index import (  # noqa: E402
    StoredLshIndex)

XL_FACTOR = 16
N_RUNS = int(os.environ.get("LSH_PROBE_RUNS", "2"))
NUM_PERM, BANDS, THRESH = 32, 8, 0.35


def timed(fn) -> float:
    best = float("inf")
    for _ in range(N_RUNS):
        t0 = time.monotonic()
        fn()
        best = min(best, time.monotonic() - t0)
    return best


_UNITS = {"B": 1, "KiB": 1024, "MiB": 1024**2, "GiB": 1024**3,
          "TiB": 1024**4}


def _parse_size(s: str) -> int:
    num, unit = s.strip().split()
    return int(float(num) * _UNITS[unit])


def _sql_queries(spark) -> list:
    import urllib.request

    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(
            f"{base}/api/v1/applications/{app}/sql?details=true"
            f"&planDescription=false&offset=0&length=10000") as resp:
        return json.load(resp)


def scan_metrics_of(spark, fn) -> dict:
    """Run ``fn`` and aggregate the PARQUET SCAN node metrics of every
    SQL execution it issued (UI REST API): files read, size of files
    read, and scan OUTPUT rows — the rows actually decoded after
    row-group min/max pruning. This is the r8 verdict's bytesRead
    measurement (wall can hide an I/O-bound full scan behind 32 local
    threads): file size shows listing/partition-level pruning, output
    rows shows row-group-level pruning, and together they are the
    probe's real I/O envelope."""
    import time as _t

    before = max((q["id"] for q in _sql_queries(spark)), default=-1)
    fn()
    _t.sleep(1.0)  # let the UI store drain its event queue
    tot = {"scan_files": 0, "scan_bytes": 0, "scan_rows": 0}
    for q in _sql_queries(spark):
        if q["id"] <= before:
            continue
        for n in q.get("nodes", []):
            if not n.get("nodeName", "").startswith("Scan parquet"):
                continue
            m = {x["name"]: x["value"] for x in n.get("metrics", [])}
            tot["scan_files"] += int(
                m.get("number of files read", "0").replace(",", ""))
            tot["scan_bytes"] += _parse_size(
                m.get("size of files read", "0 B"))
            tot["scan_rows"] += int(
                m.get("number of output rows", "0").replace(",", ""))
    return tot


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .config("spark.sql.shuffle.partitions", cpus)
             # UI on: the REST stage metrics are the bytesRead source
             .config("spark.ui.enabled", "true")
             .config("spark.ui.retainedStages", "100000")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    docs1 = (spark.read.parquet(f"{sf_dir}/documents.parquet")
             .select("doc_id", "text"))
    tmp = tempfile.mkdtemp(prefix="idp_lsh_probe_")
    # 16× corpus: shifted ids, per-copy token suffix → zero cross-copy
    # shingle overlap (scale_probe.py's honest longer-corpus shape)
    xl_path = os.path.join(tmp, "docs16.parquet")
    (docs1.select("*", F.explode(F.sequence(
        F.lit(0), F.lit(XL_FACTOR - 1))).alias("i"))
     .select((F.col("doc_id") + F.col("i") * 10_000_000)
             .alias("doc_id"),
             F.array_join(
                 F.expr("transform(split(trim(text), '\\\\s+'), "
                        "t -> concat(t, 'x', i))"), " ").alias("text"))
     .write.mode("overwrite").parquet(xl_path))
    docs16 = spark.read.parquet(xl_path)

    # fixed batch: 20 near-dup mutants + 10 disjoint decoys (q236's)
    batch = (docs1.where(F.col("doc_id") < 20)
             .select((F.col("doc_id") + 400000).alias("doc_id"),
                     F.concat("text", F.lit(" qqq")).alias("text"))
             .unionByName(
                 docs1.where((F.col("doc_id") >= 100)
                             & (F.col("doc_id") < 110))
                 .select((F.col("doc_id") + 500000).alias("doc_id"),
                         F.array_join(F.reverse(F.expr(
                             "split(trim(lower(text)), '\\\\s+')")),
                             " ").alias("text")))
             .localCheckpoint(eager=True))

    res = {"xl_factor": XL_FACTOR, "n_runs": N_RUNS,
           "corpus_rows_1x": docs1.count(),
           "corpus_rows_16x": docs16.count()}

    skip_inplan = os.environ.get("LSH_PROBE_SKIP_INPLAN") == "1"
    for label, corpus in (("1x", docs1), ("16x", docs16)):
        if not skip_inplan:  # r8 baseline arms: 7.6 s / 104.9 s
            res[f"inplan_probe_{label}_s"] = timed(
                lambda c=corpus: D.incremental_minhash_lsh(
                    c, batch, "doc_id", num_perm=NUM_PERM, bands=BANDS,
                    threshold=THRESH).write.format("noop")
                .mode("overwrite").save())
        root = os.path.join(tmp, f"idx_{label}")
        # pruning granularity: a probe reads whole row groups, so the
        # I/O win needs row groups ≫ probe keys. 2048 rows/file makes
        # the toy index's granularity production-SHAPED (16×: ~310
        # band files) — at 100 TB the same ratio holds with ~1M-row
        # row groups against batch-sized key lists.
        idx = StoredLshIndex(spark, root, num_perm=NUM_PERM,
                             bands=BANDS, threshold=THRESH,
                             max_records_per_file=2048)
        t0 = time.monotonic()
        idx.build(corpus)
        res[f"stored_build_{label}_s"] = time.monotonic() - t0
        res[f"stored_probe_{label}_s"] = timed(
            lambda i=idx: i.probe(batch).write.format("noop").mode("overwrite").save())
        # scan-I/O A/B (r8 verdict item 1 'Done' condition): the
        # pruned probe's index reads must be ≪ the full index scan.
        # The batch side is checkpointed (no parquet scan), so every
        # counted scan is an INDEX read.
        one_doc = batch.where(F.col("doc_id") == 400000) \
            .localCheckpoint(eager=True)
        for bname, b in (("batch30", batch), ("batch1", one_doc)):
            for mode, prune in (("full", False), ("pruned", True)):
                m = scan_metrics_of(
                    spark, lambda i=idx, p=prune, bb=b:
                    i.probe(bb, prune=p)
                    .write.format("noop").mode("overwrite").save())
                for k, v in m.items():
                    res[f"{bname}_{mode}_{k}_{label}"] = v

    if not skip_inplan:
        res["inplan_ratio"] = round(
            res["inplan_probe_16x_s"] / res["inplan_probe_1x_s"], 2)
    res["stored_ratio"] = round(
        res["stored_probe_16x_s"] / res["stored_probe_1x_s"], 2)
    # the headline: the pruned probe DECODES rows ∝ its keys × the
    # row-group size (flat in index size once granularity ≫ keys),
    # while the full scan decodes the whole index (grows 16×)
    for bname in ("batch30", "batch1"):
        for k in ("scan_rows", "scan_bytes"):
            for label in ("1x", "16x"):
                res[f"{bname}_pruned_frac_{k}_{label}"] = round(
                    res[f"{bname}_pruned_{k}_{label}"]
                    / max(res[f"{bname}_full_{k}_{label}"], 1), 4)
            res[f"{bname}_full_growth_{k}"] = round(
                res[f"{bname}_full_{k}_16x"]
                / max(res[f"{bname}_full_{k}_1x"], 1), 2)
            res[f"{bname}_pruned_growth_{k}"] = round(
                res[f"{bname}_pruned_{k}_16x"]
                / max(res[f"{bname}_pruned_{k}_1x"], 1), 2)
    for k, v in list(res.items()):
        if isinstance(v, float):
            res[k] = round(v, 3)
    shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
