"""16× A/B for q254's stored-route hard-negative mining (VERDICT r8
item 4 'Done' condition): per-query-batch cost must be sublinear in
corpus size when routed through the persisted signature index, vs the
brute-force route's full corpus scan.

Corpus explosion: id-shifted ×16 with per-copy deterministic vector
rotation (np.roll by copy index — norms/labels preserved, cross-copy
signatures decorrelated). The query set is fixed (5 scaled copies of
the 1× vectors under a sentinel label, q254's planting), so the work
per query batch is comparable at both scales.

Reports wall (min of N) for the stored route vs brute force, plus the
stored route's decoded index rows (scan-node metrics, the
lsh_gate_probe methodology).

Run:  python tools/ann_hardneg_probe.py
"""

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession, functions as F  # noqa: E402

from industrial_data_pipeline_spark.operators import (  # noqa: E402
    similarity as SIM)
from tools.lsh_gate_probe import scan_metrics_of  # noqa: E402

XL_FACTOR = 16
N_RUNS = int(os.environ.get("ANN_PROBE_RUNS", "2"))
DIM = 64


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .config("spark.sql.shuffle.partitions", cpus)
             .config("spark.ui.enabled", "true")
             .config("spark.ui.retainedStages", "100000")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR",
                            "/root/testdata/sf0.1")
    emb1 = (spark.read.parquet(f"{sf_dir}/embeddings.parquet")
            .select("vec_id", "label",
                    F.transform("embedding",
                                lambda x: x.cast("double"))
                    .alias("vec")))
    tmp = tempfile.mkdtemp(prefix="idp_hardneg_probe_")
    xl_path = os.path.join(tmp, "emb16.parquet")
    # per-copy rotation: slice+concat by copy index — decorrelates
    # signatures across copies while preserving norms and labels
    (emb1.select("*", F.explode(F.sequence(
        F.lit(0), F.lit(XL_FACTOR - 1))).alias("i"))
     .select((F.col("vec_id") + F.col("i") * 10_000_000)
             .alias("vec_id"), "label",
             F.concat(F.slice("vec", F.col("i") + 1,
                              F.lit(DIM) - F.col("i")),
                      F.slice("vec", F.lit(1), F.col("i")))
             .alias("vec"))
     .write.mode("overwrite").parquet(xl_path))
    emb16 = spark.read.parquet(xl_path)

    queries = (emb1.where(F.col("vec_id") < 5)
               .select((F.col("vec_id") + 950000).alias("vec_id"),
                       F.lit(-1).cast("int").alias("label"),
                       F.transform("vec", lambda x: x * F.lit(1.25))
                       .alias("vec"))
               .localCheckpoint(eager=True))

    res = {"xl_factor": XL_FACTOR, "n_runs": N_RUNS,
           "corpus_rows_1x": emb1.count(),
           "corpus_rows_16x": emb16.count()}
    for label, corpus in (("1x", emb1), ("16x", emb16)):
        sig_path = os.path.join(tmp, f"sigs_{label}")
        t0 = time.monotonic()
        SIM.write_signature_index(
            SIM.ann_signature_index(corpus, DIM, vec_col="vec"),
            sig_path)
        res[f"sig_build_{label}_s"] = round(time.monotonic() - t0, 3)
        qidx = (SIM.ann_signature_index(queries, DIM, vec_col="vec")
                .localCheckpoint(eager=True))

        def stored_route():
            stored = SIM.pruned_signature_scan(spark, sig_path, qidx)
            (SIM.ann_hard_negatives(stored, corpus, queries, qidx,
                                    k=3, vec_col="vec")
             .write.format("noop").mode("overwrite").save())

        def brute_route():
            (SIM.hard_negatives(corpus, queries, k=3, vec_col="vec")
             .write.format("noop").mode("overwrite").save())

        best = float("inf")
        for _ in range(N_RUNS):
            t0 = time.monotonic()
            stored_route()
            best = min(best, time.monotonic() - t0)
        res[f"stored_wall_{label}_s"] = round(best, 3)
        best = float("inf")
        for _ in range(N_RUNS):
            t0 = time.monotonic()
            brute_route()
            best = min(best, time.monotonic() - t0)
        res[f"brute_wall_{label}_s"] = round(best, 3)
        m = scan_metrics_of(spark, stored_route)
        for k, v in m.items():
            res[f"stored_{k}_{label}"] = v

    res["stored_growth"] = round(
        res["stored_wall_16x_s"] / res["stored_wall_1x_s"], 2)
    res["brute_growth"] = round(
        res["brute_wall_16x_s"] / res["brute_wall_1x_s"], 2)
    shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
