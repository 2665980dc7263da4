"""Probe-cost measurement for the maintained IVF index (q245).

Claim under test (VERDICT r7 item 5): probe cost is proportional to
the rows in the PROBED cells, not the corpus — the candidate set is
cell-pruned before any query distance math.

Method: explode sf0.1 embeddings 64x (~128k vectors x 64 dims),
build the index once (seed centroids, frozen), then time the
10-query retrieval at nprobe = 1 / 4 / 16-of-16 over the SAME
assigned corpus. Wall should track candidate rows, with nprobe=16
equal to the brute-force scan.

Run:  python tools/ann_probe.py
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession, Window, functions as F  # noqa: E402

from industrial_data_pipeline_spark.operators import similarity as SIM  # noqa: E402

N_RUNS = int(os.environ.get("ANN_PROBE_RUNS", "2"))
FACTOR = 64


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .config("spark.sql.shuffle.partitions", cpus)
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    emb = (spark.read.parquet(f"{sf_dir}/embeddings.parquet")
           .select("vec_id", "embedding"))
    big = (emb.select("*", F.explode(F.sequence(
        F.lit(0), F.lit(FACTOR - 1))).alias("i"))
        .select((F.col("vec_id") + F.col("i") * 1_000_000)
                .alias("vec_id"), "embedding"))
    assigned, centroids = SIM.ivf_build(big, n_cells=16,
                                        refine_iters=0)
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    corpus = (assigned.select("vec_id", "_cell", v.alias("_v"))
              .localCheckpoint(eager=True))  # index build paid once
    qs = (corpus.where(F.col("vec_id") < 10)
          .select(F.col("vec_id").alias("qid"),
                  F.col("_v").alias("_qv"))
          .localCheckpoint(eager=True))
    cent = spark.createDataFrame(
        [(c, vec) for c, vec in enumerate(centroids)],
        "cell int, cv array<double>")

    def retrieval(nprobe: int):
        ccos = SIM._dot(F.col("cv"), F.col("_qv")) \
            / (SIM._norm(F.col("cv")) * SIM._norm(F.col("_qv")))
        wp = Window.partitionBy("qid").orderBy(F.desc("_cc"),
                                               F.col("cell"))
        probe = (cent.crossJoin(F.broadcast(qs))
                 .withColumn("_cc", ccos)
                 .withColumn("_pr", F.row_number().over(wp))
                 .where(F.col("_pr") <= nprobe).select("qid", "cell"))
        cos = SIM._dot(F.col("_v"), F.col("_qv")) \
            / (SIM._norm(F.col("_v")) * SIM._norm(F.col("_qv")))
        w = Window.partitionBy("qid").orderBy(F.desc("_c"),
                                              F.col("vec_id"))
        return (corpus.join(F.broadcast(probe),
                            corpus._cell == probe.cell)
                .select("vec_id", "_v", "qid")
                .join(F.broadcast(qs.withColumnRenamed("qid", "q2")),
                      (F.col("qid") == F.col("q2"))
                      & (F.col("vec_id") != F.col("qid")))
                .withColumn("_c", cos)
                .withColumn("_r", F.row_number().over(w))
                .where(F.col("_r") <= 10)
                .select("qid", F.col("vec_id").alias("aid")))

    res = {"corpus_rows": corpus.count(), "factor": FACTOR,
           "n_runs": N_RUNS}
    for nprobe in (1, 4, 16):
        # candidate rows actually scanned by the distance math
        ccos = SIM._dot(F.col("cv"), F.col("_qv")) \
            / (SIM._norm(F.col("cv")) * SIM._norm(F.col("_qv")))
        wp = Window.partitionBy("qid").orderBy(F.desc("_cc"),
                                               F.col("cell"))
        probe = (cent.crossJoin(F.broadcast(qs))
                 .withColumn("_cc", ccos)
                 .withColumn("_pr", F.row_number().over(wp))
                 .where(F.col("_pr") <= nprobe).select("qid", "cell"))
        res[f"cand_rows_np{nprobe}"] = (
            corpus.join(probe, corpus._cell == probe.cell).count())
        best = float("inf")
        for _ in range(N_RUNS):
            t0 = time.monotonic()
            retrieval(nprobe).write.format("noop") \
                .mode("overwrite").save()
            best = min(best, time.monotonic() - t0)
        res[f"wall_np{nprobe}_s"] = round(best, 3)
    res["wall_np4_vs_np16"] = round(
        res["wall_np4_s"] / res["wall_np16_s"], 3)
    res["cand_np4_vs_np16"] = round(
        res["cand_rows_np4"] / res["cand_rows_np16"], 3)
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
