"""A/B probe for substring-dedup excision: in-plan vs stored spans.

Measures at sf0.1 (1×) and a 16× id-shifted corpus:

  full      q239 shape — posting substrate + excision in one plan
  build     writing the q231 span table as a parquet asset (once)
  marginal  q244 shape — excision from the STORED span table only

The claim under test (VERDICT r7 item 2 / SCALE_NOTES): the stored
marginal is the token anti-join + rebuild only, a small fraction of
the full pass, so reruns and downstream excisions amortize the
corpus-sized posting scan.

Run:  python tools/span_excise_probe.py   (min of N, default 2)
"""

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession, functions as F  # noqa: E402

from industrial_data_pipeline_spark.suite_corpus import (  # noqa: E402
    _dup_spans_frames, _excise_tokens, q_dup_span_excise)

XL_FACTOR = 16
N_RUNS = int(os.environ.get("SPAN_PROBE_RUNS", "2"))


def timed(fn) -> float:
    best = float("inf")
    for _ in range(N_RUNS):
        t0 = time.monotonic()
        fn()
        best = min(best, time.monotonic() - t0)
    return best


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .config("spark.sql.shuffle.partitions", cpus)
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    tmp = tempfile.mkdtemp(prefix="idp_span_probe_")
    docs1 = (spark.read.parquet(f"{sf_dir}/documents.parquet")
             .select("doc_id", "text"))
    xl_sf = os.path.join(tmp, "xl")
    os.makedirs(xl_sf)
    (docs1.select("*", F.explode(F.sequence(
        F.lit(0), F.lit(XL_FACTOR - 1))).alias("i"))
     .select((F.col("doc_id") + F.col("i") * 10_000_000)
             .alias("doc_id"),
             F.array_join(
                 F.expr("transform(split(trim(text), '\\\\s+'), "
                        "t -> concat(t, 'x', i))"), " ").alias("text"))
     .write.mode("overwrite").parquet(
         os.path.join(xl_sf, "documents.parquet")))

    res = {"xl_factor": XL_FACTOR, "n_runs": N_RUNS}
    for label, d in (("1x", sf_dir), ("16x", xl_sf)):
        res[f"full_{label}_s"] = timed(
            lambda d=d: q_dup_span_excise(spark, d).write.format("noop").mode("overwrite").save())
        _base, spans = _dup_spans_frames(spark, d)
        asset = os.path.join(tmp, f"spans_{label}")
        t0 = time.monotonic()
        spans.write.mode("overwrite").parquet(asset)
        res[f"asset_build_{label}_s"] = time.monotonic() - t0
        docs = spark.read.parquet(
            os.path.join(d, "documents.parquet")).select("doc_id",
                                                         "text")
        stored = spark.read.parquet(asset)
        res[f"marginal_{label}_s"] = timed(
            lambda docs=docs, stored=stored:
            _excise_tokens(docs, stored).write.format("noop").mode("overwrite").save())
    res["full_ratio"] = round(res["full_16x_s"] / res["full_1x_s"], 2)
    res["marginal_ratio"] = round(
        res["marginal_16x_s"] / res["marginal_1x_s"], 2)
    res["marginal_vs_full_16x"] = round(
        res["marginal_16x_s"] / res["full_16x_s"], 3)
    for k, v in list(res.items()):
        if isinstance(v, float):
            res[k] = round(v, 3)
    shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
