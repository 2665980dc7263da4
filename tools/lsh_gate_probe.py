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


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .config("spark.sql.shuffle.partitions", cpus)
             .config("spark.ui.enabled", "false")
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

    for label, corpus in (("1x", docs1), ("16x", docs16)):
        res[f"inplan_probe_{label}_s"] = timed(
            lambda c=corpus: D.incremental_minhash_lsh(
                c, batch, "doc_id", num_perm=NUM_PERM, bands=BANDS,
                threshold=THRESH).write.format("noop").mode("overwrite").save())
        root = os.path.join(tmp, f"idx_{label}")
        idx = StoredLshIndex(spark, root, num_perm=NUM_PERM,
                             bands=BANDS, threshold=THRESH)
        t0 = time.monotonic()
        idx.build(corpus)
        res[f"stored_build_{label}_s"] = time.monotonic() - t0
        res[f"stored_probe_{label}_s"] = timed(
            lambda i=idx: i.probe(batch).write.format("noop").mode("overwrite").save())

    res["inplan_ratio"] = round(
        res["inplan_probe_16x_s"] / res["inplan_probe_1x_s"], 2)
    res["stored_ratio"] = round(
        res["stored_probe_16x_s"] / res["stored_probe_1x_s"], 2)
    for k, v in list(res.items()):
        if isinstance(v, float):
            res[k] = round(v, 3)
    shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
