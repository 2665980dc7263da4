"""Scan-metric A/B of StoredIvfIndex.probe_batch_adc (round 10).

Claims under test, at a 16x-replicated corpus (32k vectors, 64-dim):

1. COLUMN pruning (the PQ win): the ADC stage needs only the
   vec_id+codes+vnorm2 column chunks — measured from the parquet
   footers (total compressed column-chunk bytes), the layout-level
   truth of what stage 1 must read vs the 64-double vector column.
2. The re-rank stage's decoded rows ∝ |batch|·rerank shortlist, not
   the probed cells (In(vec_id) row-group pushdown) — from the SQL
   REST scan metrics (tools/lsh_gate_probe.py::scan_metrics_of).
3. The two-stage route's total decoded rows stay in the same envelope
   as the exact probe_batch (both are cell-pruned), while the bytes
   the ADC stage decodes are the small columns only.

    python tools/ivf_adc_probe.py   # writes ivf_adc_probe_result.json
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

from tools.lsh_gate_probe import scan_metrics_of  # noqa: E402


def column_chunk_bytes(data_path: str) -> dict:
    """Total compressed column-chunk bytes per column across every
    data file — what a column-pruned scan of the whole asset must
    read, straight from the parquet footers."""
    import pyarrow.parquet as pq

    out: dict[str, int] = {}
    for f in glob.glob(os.path.join(data_path, "**", "*.parquet"),
                       recursive=True):
        md = pq.ParquetFile(f).metadata
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                c = g.column(ci)
                root = c.path_in_schema.split(".")[0]
                out[root] = out.get(root, 0) + c.total_compressed_size
    return out


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

    root = tempfile.mkdtemp(prefix="idp_ivf_adc_probe_")
    try:
        # 64 cells (vs q271's 16): at 16 cells ANY batch >= ~8
        # queries probes every cell and partition pruning reads as a
        # no-op regardless of batch size (ADVICE r10) — 64 cells is
        # the realistic cells >> nprobe regime where probed-cell
        # pruning is visible at mid-size batches too
        idx = StoredIvfIndex(spark, root, n_cells=64,
                             pq_m=4, pq_k=8,
                             max_records_per_file=256)
        idx.build(corpus)
        queries = (emb.where(F.col("vec_id") < 100)
                   .localCheckpoint(eager=True))
        batch10 = (queries.where(F.col("vec_id") < 10)
                   .localCheckpoint(eager=True))
        batch1 = (queries.where(F.col("vec_id") < 1)
                  .localCheckpoint(eager=True))

        colb = column_chunk_bytes(idx._data_path)
        adc_cols = sum(colb.get(c, 0)
                       for c in ("vec_id", "codes", "vnorm2"))

        def run_adc(q, rerank=50):
            return lambda: (
                idx.probe_batch_adc(q, k=10, nprobe=4, rerank=rerank)
                .write.format("noop").mode("overwrite").save())

        def run_exact():
            (idx.probe_batch(queries, k=10, nprobe=4)
             .write.format("noop").mode("overwrite").save())

        def run_full():
            (spark.read.schema(idx.DATA_SCHEMA)
             .parquet(idx._data_path)
             .write.format("noop").mode("overwrite").save())

        adc = scan_metrics_of(spark, run_adc(queries))
        rerank100_scan = idx.last_rerank_scan
        # mid-size arm (ADVICE r10): 10 queries x rerank=40 = <=400
        # shortlist ids, well under MAX_PUSHDOWN_KEYS, and 10x4
        # probes cover well under the 64 cells — BOTH prunings
        # engaged at a realistic batch, so the headline measurement
        # demonstrates the mechanism, not just the 1q corner
        adc10 = scan_metrics_of(spark, run_adc(batch10, rerank=40))
        rerank10_scan = idx.last_rerank_scan
        rerank10 = scan_metrics_of(
            spark, lambda: rerank10_scan.write.format("noop")
            .mode("overwrite").save())
        adc1 = scan_metrics_of(spark, run_adc(batch1))
        rerank1_scan = idx.last_rerank_scan
        rerank1 = scan_metrics_of(
            spark, lambda: rerank1_scan.write.format("noop")
            .mode("overwrite").save())
        exact = scan_metrics_of(spark, run_exact)
        full = scan_metrics_of(spark, run_full)

        # isolate the re-rank stages: replay each pruned scan with
        # the shortlist its probe computed (last_rerank_scan holds
        # the In(vec_id)-pushed frame, captured per arm above)
        rerank = scan_metrics_of(
            spark, lambda: rerank100_scan.write.format("noop")
            .mode("overwrite").save())

        out = {
            "corpus_rows": corpus.count(),
            "n_queries": 100, "nprobe": 4, "n_cells": 64,
            "pq": {"m": 4, "k": 8},
            "column_chunk_bytes": colb,
            "adc_stage_column_bytes": adc_cols,
            "vector_column_bytes": colb.get("v", 0),
            "adc_over_vector_bytes": round(
                adc_cols / max(colb.get("v", 1), 1), 4),
            "full_scan": full,
            "adc_two_stage_100q": adc,
            "adc_two_stage_10q_rerank40": adc10,
            "adc_two_stage_1q": adc1,
            "exact_probe_batch_100q": exact,
            "rerank_scan_only_100q": rerank,
            "rerank_scan_only_10q": rerank10,
            "rerank_scan_only_1q": rerank1,
            "rerank1_rows_over_full": round(
                rerank1["scan_rows"] / full["scan_rows"], 4),
            "rerank10_rows_over_full": round(
                rerank10["scan_rows"] / full["scan_rows"], 4),
            "rerank100_rows_over_full": round(
                rerank["scan_rows"] / full["scan_rows"], 4),
            "notes": [
                "scan_bytes is 'size of files read' (whole files) "
                "and CANNOT see column pruning; the column story is "
                "adc_stage_column_bytes from the parquet footers",
                "100q x 50 = 5000 shortlist ids > MAX_PUSHDOWN_KEYS "
                "(4096) -> documented fallback; 100 queries x "
                "nprobe=4 also cover ~all 64 cells, so partition "
                "pruning is a no-op at that arm — the 10q arm "
                "(rerank=40, <=400 ids: pushdown under the cap AND "
                "partition pruning live at a realistic batch) and "
                "the 1q arm show the prunings engaged",
                "row-group pruning scales with id DENSITY: 5000 "
                "uniform ids over 125 x 256-row groups hit every "
                "group (expected 40/group); at production density "
                "(shortlist << cell rows / row-group size) the same "
                "mechanism drops groups ∝ shortlist — the LSH "
                "decoded-rows law (SCALE_NOTES r9)",
            ],
        }
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "ivf_adc_probe_result.json")
        with open(path, "w") as fh:
            json.dump(out, fh, indent=1)
        print(json.dumps(out, indent=1))
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
