"""XL scaling rows for the late round-8 operators (q249-q252):
1x (sf0.1) vs 16x id-shifted documents (64x embeddings for q252),
noop-forced, min of 2. Results are appended to SCALE_NOTES.md's
round-8 block (and mirrored in scale_probe.py's static text).
"""

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession, functions as F  # noqa: E402

N_RUNS = int(os.environ.get("NEW_OPS_RUNS", "2"))


def timed(fn) -> float:
    best = float("inf")
    for _ in range(N_RUNS):
        t0 = time.monotonic()
        fn().write.format("noop").mode("overwrite").save()
        best = min(best, time.monotonic() - t0)
    return best


def main() -> None:
    from industrial_data_pipeline_spark.session import get_spark
    spark = get_spark("idp-new-ops-probe")  # 48g heap (session.py)
    spark.sparkContext.setLogLevel("ERROR")
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    tmp = tempfile.mkdtemp(prefix="idp_newops_")
    xl = os.path.join(tmp, "xl")
    os.makedirs(xl)
    docs = (spark.read.parquet(f"{sf}/documents.parquet")
            .select("doc_id", "text"))
    (docs.select("*", F.explode(F.sequence(F.lit(0), F.lit(15)))
                 .alias("i"))
     .select((F.col("doc_id") + F.col("i") * 10_000_000)
             .alias("doc_id"),
             F.array_join(
                 F.expr("transform(split(trim(text), '\\\\s+'), "
                        "t -> concat(t, 'x', i))"), " ").alias("text"))
     .write.parquet(os.path.join(xl, "documents.parquet")))
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    (emb.select("*", F.explode(F.sequence(F.lit(0), F.lit(63)))
                .alias("i"))
     .select((F.col("vec_id") + F.col("i") * 1_000_000)
             .alias("vec_id"), "label", "embedding")
     .write.parquet(os.path.join(xl, "embeddings.parquet")))

    from industrial_data_pipeline_spark.suite import REGISTRY
    res = {"n_runs": N_RUNS}
    for q in ("q249_quality_classifier", "q250_strip_html",
              "q251_rouge_eval"):
        res[f"{q}_1x_s"] = timed(lambda: REGISTRY[q][0](spark, sf))
        res[f"{q}_16x_s"] = timed(lambda: REGISTRY[q][0](spark, xl))
        res[f"{q}_ratio"] = round(res[f"{q}_16x_s"]
                                  / res[f"{q}_1x_s"], 2)
    q = "q252_hard_negatives"
    res[f"{q}_1x_s"] = timed(lambda: REGISTRY[q][0](spark, sf))
    res[f"{q}_64x_s"] = timed(lambda: REGISTRY[q][0](spark, xl))
    res[f"{q}_ratio"] = round(res[f"{q}_64x_s"] / res[f"{q}_1x_s"], 2)
    for k, v in list(res.items()):
        if isinstance(v, float):
            res[k] = round(v, 3)
    shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
