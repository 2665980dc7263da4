"""Scan-metric A/B for the stored BM25 probe (q293): the claim under
test is that a probe's postings I/O is ∝ the probed terms' bucket
partitions + their row groups, NOT the index size. Builds the index
over a 16× documents corpus (id-shifted copies, text unchanged so
the query vocabulary stays realistic), then measures the parquet
scan metrics (files listed, size of files read, rows decoded) of

  full    — an unpruned count over the whole postings asset
  pruned  — the SAME count over the probe's own pruned scan
            (bucket PartitionFilters + term IN pushdown,
            idx.last_postings_scan)

via the UI REST scan-node metrics (the r8 bytesRead discipline:
wall time hides I/O behind 32 local threads). Writes
tools/bm25_probe_metrics_result.json.

Run: python tools/bm25_probe_metrics.py
"""

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession, functions as F  # noqa: E402

from tools.lsh_gate_probe import scan_metrics_of  # noqa: E402

XL_FACTOR = 16
N_BUCKETS = 32
QUERIES = {0: "merge batch spark", 1: "stream window join",
           2: "customer order hash"}


def main() -> None:
    from industrial_data_pipeline_spark.operators.bm25_index import (
        StoredBm25Index, py_hash64)

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .config("spark.sql.shuffle.partitions", cpus)
             .config("spark.ui.enabled", "true")
             .config("spark.ui.retainedStages", "100000")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR",
                            "/root/testdata/sf0.1")
    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", "text"))
    xl = (docs.select("*", F.explode(F.sequence(
        F.lit(0), F.lit(XL_FACTOR - 1))).alias("i"))
        .select((F.col("doc_id") + F.col("i") * 10_000_000)
                .alias("doc_id"), "text"))

    tmp = tempfile.mkdtemp(prefix="idp_bm25_metrics_")
    try:
        idx = StoredBm25Index(spark, os.path.join(tmp, "bm25"),
                              n_buckets=N_BUCKETS,
                              max_records_per_file=20_000)
        idx.build(xl)
        vocab = sorted({t for qs in QUERIES.values()
                        for t in qs.lower().split()})
        buckets = sorted({py_hash64(t) % N_BUCKETS for t in vocab})

        full_scan = (spark.read.schema(idx.POSTINGS_SCHEMA)
                     .parquet(idx._postings_path))
        full = scan_metrics_of(spark,
                               lambda: full_scan.count())
        idx.probe(QUERIES, k=10).collect()  # sets last_postings_scan
        pruned_scan = idx.last_postings_scan
        pruned = scan_metrics_of(spark,
                                 lambda: pruned_scan.count())
        out = {
            "xl_factor": XL_FACTOR, "n_buckets": N_BUCKETS,
            "n_query_terms": len(vocab),
            "n_probed_buckets": len(buckets),
            "postings_rows": full["scan_rows"],
            "full": full, "pruned": pruned,
            "files_frac": round(pruned["scan_files"]
                                / max(full["scan_files"], 1), 4),
            "bytes_frac": round(pruned["scan_bytes"]
                                / max(full["scan_bytes"], 1), 4),
            "rows_frac": round(pruned["scan_rows"]
                               / max(full["scan_rows"], 1), 4),
            "note": ("pruned = the probe's own postings scan "
                     "(bucket PartitionFilters + In(term) row-group "
                     "pushdown); bytes = 'size of files read', rows "
                     "= decoded after row-group pruning"),
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "bm25_probe_metrics_result.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
