"""Per-batch A/B for the COMPOSED curation admission stream (q253 /
q256 shape) at 1× vs 16× corpus — VERDICT r8 item 6.

Measures the full foreachBatch body with ALL gates active on a fixed
15-doc batch (5 text near-dups + 5 reversed-token embedding dups +
5 novel docs):

  quality classifier → stored text-LSH probe → hashed-BoW embedding +
  signature matmul → stored signature probe + pruned cosine verify →
  stats → appends to all assets → ledger append

The claim under test: per-batch wall stays FLAT (≤2×) when the corpus
behind the persisted assets grows 16× — i.e. the composed stream, not
just the isolated gate (q242/q243's rows), is corpus-independent.
Novel-doc ids/tokens vary per run so a prior run's admissions never
turn this run's novel docs into dups (runs stay comparable).

Run:  python tools/curation_probe.py      (min of N runs, default 2)
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
    similarity as SIM, text as TX)
from industrial_data_pipeline_spark.operators.lsh_index import (  # noqa: E402
    StoredLshIndex)

XL_FACTOR = 16
N_RUNS = int(os.environ.get("CURATION_PROBE_RUNS", "2"))
NUM_PERM, BANDS, THRESH = 32, 8, 0.35
DEMB_DIM = 16


def batch_for(docs, run: int):
    """Fixed-shape 15-doc batch; novel family varies per run."""
    toks = TX.tokens(F.col("text"))
    rev = F.array_join(F.reverse(toks), " ")
    suf = F.array_join(
        F.transform(toks, lambda t: F.concat(t, F.lit(f"z{run}"))),
        " ")
    return (docs.where(F.col("doc_id") < 5)
            .select((F.col("doc_id") + 400000 + run * 100)
                    .alias("doc_id"),
                    F.concat("text", F.lit(" qqq")).alias("text"))
            .unionByName(
                docs.where((F.col("doc_id") >= 100)
                           & (F.col("doc_id") < 105))
                .select((F.col("doc_id") + 500000 + run * 100)
                        .alias("doc_id"), rev.alias("text")))
            .unionByName(
                docs.where((F.col("doc_id") >= 105)
                           & (F.col("doc_id") < 110))
                .select((F.col("doc_id") + 600000 + run * 100)
                        .alias("doc_id"), suf.alias("text")))
            .localCheckpoint(eager=True))


def handle_once(spark, idx, sig_path, vec_path, ledger, batch):
    """q256's foreachBatch body, verbatim shape."""
    clf = TX.quality_classifier(batch).select(
        "doc_id", F.coalesce("keep", F.lit(False)).alias("qk"))
    bands_df, shingles_df = idx.signature_frames(batch)
    bands_df = bands_df.localCheckpoint(eager=True)
    shingles_df = shingles_df.localCheckpoint(eager=True)
    tmatch = idx.probe_frames(bands_df, shingles_df)
    vecs = (batch.select(F.col("doc_id").alias("vec_id"),
                         TX.hashed_bow_embedding(F.col("text"),
                                                 DEMB_DIM).alias("v"))
            .localCheckpoint(eager=True))
    bsig = (SIM.ann_signature_index(vecs, DEMB_DIM, vec_col="v")
            .localCheckpoint(eager=True))
    stored_sig = SIM.pruned_signature_scan(spark, sig_path, bsig)
    ematch = SIM.ann_gate(stored_sig, spark.read.parquet(vec_path),
                          vecs, bsig, id_col="vec_id", vec_col="v",
                          threshold=0.98)
    per_t = (tmatch.groupBy("new_id")
             .agg(F.count("*").alias("nt"))
             .withColumnRenamed("new_id", "_tid"))
    per_e = (ematch.groupBy("new_id")
             .agg(F.count("*").alias("ne"))
             .withColumnRenamed("new_id", "_eid"))
    stats = (batch.join(clf, "doc_id")
             .join(per_t, F.col("doc_id") == F.col("_tid"), "left")
             .join(per_e, F.col("doc_id") == F.col("_eid"), "left")
             .select("doc_id", "qk",
                     F.coalesce("nt", F.lit(0)).alias("nt"),
                     F.coalesce("ne", F.lit(0)).alias("ne"))
             .localCheckpoint(eager=True))
    admitted = stats.where(F.col("qk") & (F.col("nt") == 0)
                           & (F.col("ne") == 0)).select("doc_id")
    adm_vec = admitted.select(F.col("doc_id").alias("vec_id"))
    idx.append_frames(
        bands_df.join(F.broadcast(admitted), "doc_id"),
        shingles_df.join(F.broadcast(admitted), "doc_id"))
    (vecs.join(F.broadcast(adm_vec), "vec_id").coalesce(1)
     .sortWithinPartitions("vec_id")
     .write.mode("append").parquet(vec_path))
    (bsig.join(F.broadcast(adm_vec), "vec_id").coalesce(1)
     .sortWithinPartitions("table", "sig")
     .write.mode("append").partitionBy("table").parquet(sig_path))
    stats.write.mode("append").parquet(ledger)


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .config("spark.sql.shuffle.partitions", cpus)
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR",
                            "/root/testdata/sf0.1")
    docs1 = (spark.read.parquet(f"{sf_dir}/documents.parquet")
             .select("doc_id", "text"))
    tmp = tempfile.mkdtemp(prefix="idp_curation_probe_")
    xl_path = os.path.join(tmp, "docs16.parquet")
    # copy 0 keeps the ORIGINAL text so the fixed batch's near-dups
    # exist at 16× too (the gates do identical verify work at both
    # scales); copies 1..15 are token-suffixed (zero cross-copy
    # shingle/embedding overlap — honest longer corpus)
    (docs1.select("*", F.explode(F.sequence(
        F.lit(0), F.lit(XL_FACTOR - 1))).alias("i"))
     .select((F.col("doc_id") + F.col("i") * 10_000_000)
             .alias("doc_id"),
             F.array_join(
                 F.expr("transform(split(trim(text), '\\\\s+'), t -> "
                        "CASE WHEN i = 0 THEN t "
                        "ELSE concat(t, 'x', i) END)"), " ")
             .alias("text"))
     .write.mode("overwrite").parquet(xl_path))
    docs16 = spark.read.parquet(xl_path)

    res = {"xl_factor": XL_FACTOR, "n_runs": N_RUNS,
           "corpus_rows_1x": docs1.count(),
           "corpus_rows_16x": docs16.count()}
    for label, corpus in (("1x", docs1), ("16x", docs16)):
        root = os.path.join(tmp, f"assets_{label}")
        idx = StoredLshIndex(spark, os.path.join(root, "lsh"),
                             num_perm=NUM_PERM, bands=BANDS,
                             threshold=THRESH)
        t0 = time.monotonic()
        idx.build(corpus)
        vec_path = os.path.join(root, "vecs")
        sig_path = os.path.join(root, "sigs")
        (corpus.select(F.col("doc_id").alias("vec_id"),
                       TX.hashed_bow_embedding(F.col("text"),
                                               DEMB_DIM).alias("v"))
         .repartitionByRange("vec_id").sortWithinPartitions("vec_id")
         .write.mode("overwrite").parquet(vec_path))
        SIM.write_signature_index(
            SIM.ann_signature_index(spark.read.parquet(vec_path),
                                    DEMB_DIM, vec_col="v"), sig_path)
        res[f"assets_build_{label}_s"] = round(
            time.monotonic() - t0, 3)
        ledger = os.path.join(root, "ledger")
        best = float("inf")
        for run in range(N_RUNS):
            # batch always derives from the 1× docs: copy-0 of the
            # 16× corpus carries the same ids + text, so the batch's
            # near-dups exist (and verify) identically at both scales
            batch = batch_for(docs1, run)
            t0 = time.monotonic()
            handle_once(spark, idx, sig_path, vec_path, ledger, batch)
            best = min(best, time.monotonic() - t0)
        res[f"batch_wall_{label}_s"] = round(best, 3)
    res["batch_ratio_16x_over_1x"] = round(
        res["batch_wall_16x_s"] / res["batch_wall_1x_s"], 2)
    shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
