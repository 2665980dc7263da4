"""Scan-metric A/B of StoredIvfIndex.probe_batch (VERDICT r9 item 3).

Claim under test: at a production QUERY BATCH, the batch probe's I/O
is proportional to the DISTINCT probed cells — each probed cell's
partition is read ONCE no matter how many queries route to it — while
the per-query loop (q259's old shape) re-scans every cell per query,
so its decoded rows grow ∝ |batch|. Measured from the SQL REST scan
node metrics (files / size of files / output rows — the honest
pruning evidence; see tools/lsh_gate_probe.py::scan_metrics_of).

    python tools/ivf_batch_probe.py     # writes ivf_batch_probe_result.json

Corpus: the sf0.1 embeddings replicated 16x (32k vectors, 64-dim) —
the same stored-index fixture as tools/ivf_prune_result.json, so the
rows compose. 100-query batch, nprobe=4, n_cells=16.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

from tools.lsh_gate_probe import scan_metrics_of  # noqa: E402


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .config("spark.sql.shuffle.partitions", cpus)
             .config("spark.ui.enabled", "true")
             .config("spark.ui.retainedStages", "100000")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    from industrial_data_pipeline_spark.operators.similarity import (
        StoredIvfIndex)

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR",
                            "/root/testdata/sf0.1")
    emb = (spark.read.parquet(f"{sf_dir}/embeddings.parquet")
           .select("vec_id", "embedding"))
    n0 = emb.count()
    copies = spark.range(16).select(F.col("id").alias("_copy"))
    corpus = (emb.crossJoin(copies)
              .select((F.col("vec_id") + F.col("_copy") * n0)
                      .alias("vec_id"), "embedding")
              .localCheckpoint(eager=True))

    root = tempfile.mkdtemp(prefix="idp_ivf_batch_probe_")
    try:
        idx = StoredIvfIndex(spark, root, n_cells=16)
        idx.build(corpus)
        queries = (emb.where(F.col("vec_id") < 100)
                   .localCheckpoint(eager=True))
        small = (queries.where(F.col("vec_id") < 3)
                 .localCheckpoint(eager=True))
        qvecs = [(int(r["vec_id"]),
                  [float(x) for x in r["embedding"]])
                 for r in queries.collect()]
        routing = {qid: idx.probe_cells(qv, 4) for qid, qv in qvecs}

        def cells_of(n):
            return sorted({c for qid, cs in routing.items()
                           if qid < n for c in cs})

        def run_batch(q):
            return lambda: (idx.probe_batch(q, k=10, nprobe=4)
                            .write.format("noop").mode("overwrite")
                            .save())

        def run_loop():
            for qid, qv in qvecs:
                (idx.probe(qv, k=10, nprobe=4)
                 .write.format("noop").mode("overwrite").save())

        def run_full():
            (spark.read.schema(idx.DATA_SCHEMA).parquet(idx._data_path)
             .write.format("noop").mode("overwrite").save())

        batch100 = scan_metrics_of(spark, run_batch(queries))
        batch10 = scan_metrics_of(spark, run_batch(small))
        loop = scan_metrics_of(spark, run_loop)
        full = scan_metrics_of(spark, run_full)
        out = {
            "corpus_rows": corpus.count(),
            "n_queries": len(qvecs),
            "nprobe": 4, "n_cells": 16,
            "distinct_cells_3q": len(cells_of(3)),
            "distinct_cells_100q": len(cells_of(100)),
            "full_scan": full,
            "batch_probe_3q": batch10,
            "batch_probe_100q": batch100,
            "per_query_loop_100q": loop,
            "batch3_rows_over_full":
                round(batch10["scan_rows"] / full["scan_rows"], 3),
            "batch100_rows_over_full":
                round(batch100["scan_rows"] / full["scan_rows"], 3),
            "loop_rows_over_batch":
                round(loop["scan_rows"] / batch100["scan_rows"], 1),
        }
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "ivf_batch_probe_result.json")
        with open(path, "w") as fh:
            json.dump(out, fh, indent=1)
        print(json.dumps(out, indent=1))
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
