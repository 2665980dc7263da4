"""Isolate the q256 batch-2 StoredSignatureIndex.probe_frames
slowdown: build → append(epoch 0) → compact → probe, timing each
eager step with job descriptions (measurement-only tool)."""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def t(spark, label, fn):
    spark.sparkContext.setJobDescription(label)
    t0 = time.perf_counter()
    out = fn()
    print(f"{time.perf_counter() - t0:8.3f}s  {label}", flush=True)
    spark.sparkContext.setJobDescription(None)
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR",
                            "/root/testdata/sf0.1")
    from industrial_data_pipeline_spark import suite_llm as L
    from industrial_data_pipeline_spark.operators import (
        similarity as SIM, text as TX)
    from industrial_data_pipeline_spark.session import get_spark

    spark = get_spark("idp-sigprobe-repro")
    docs = L._load_docs(spark, sf_dir).select("doc_id", "text")
    corpus_vecs = docs.select(
        F.col("doc_id").alias("vec_id"),
        TX.hashed_bow_embedding(F.col("text"), L._DEMB_DIM).alias("v"))
    root = tempfile.mkdtemp(prefix="idp_sigrepro_")
    sidx = SIM.StoredSignatureIndex(
        spark, os.path.join(root, "emb_idx"), dim=L._DEMB_DIM,
        id_col="vec_id", vec_col="v", threshold=0.98)
    t(spark, "build", lambda: sidx.build(corpus_vecs))

    toks = TX.tokens(F.col("text"))
    suf_t = F.transform(toks, lambda x: F.concat(x, F.lit("z9")))
    suf = F.array_join(suf_t, " ")
    b1 = (docs.where((F.col("doc_id") >= 105) & (F.col("doc_id") < 110))
          .select((F.col("doc_id") + 760000).alias("doc_id"),
                  suf.alias("text")))

    def mkvecs(b):
        return (b.select(F.col("doc_id").alias("vec_id"),
                         TX.hashed_bow_embedding(F.col("text"),
                                                 L._DEMB_DIM)
                         .alias("v")).localCheckpoint(eager=True))

    for epoch, b in ((0, b1), (1, b1.select(
            (F.col("doc_id") + 10000).alias("doc_id"), "text"))):
        if epoch >= 1:
            t(spark, f"compact e{epoch}",
              lambda: sidx.compact(in_flight_epoch=epoch))
        vecs = t(spark, f"e{epoch} vecs ckpt", lambda: mkvecs(b))
        bsig = t(spark, f"e{epoch} bsig ckpt",
                 lambda: sidx.signature_frame(vecs)
                 .localCheckpoint(eager=True))
        # probe_frames exploded into its eager pieces
        from industrial_data_pipeline_spark.operators.lsh_index import (
            isin_prune)
        from industrial_data_pipeline_spark.operators.similarity import (
            ann_gate)
        sig, vec = sidx.sig_table(), sidx.vec_table()
        sig = sig.where(F.col("_epoch") != epoch)
        vec = vec.where(F.col("_epoch") != epoch)
        keys = t(spark, f"e{epoch} keys collect",
                 lambda: bsig.select("table", "sig").distinct()
                 .collect())
        sig = isin_prune(sig, {"table": [r["table"] for r in keys],
                               "sig": [r["sig"] for r in keys]})
        cand0 = (bsig.select(F.col("vec_id").alias("new_id"),
                             "table", "sig")
                 .join(sig.select(F.col("vec_id").alias("old_id"),
                                  "table", "sig"),
                       ["table", "sig"])
                 .select("new_id", "old_id").distinct())
        cand = t(spark, f"e{epoch} cand ckpt",
                 lambda: cand0.localCheckpoint(eager=True))
        old_ids = t(spark, f"e{epoch} old_ids collect",
                    lambda: [r["old_id"] for r in
                             cand.select("old_id").distinct()
                             .collect()])
        gate = ann_gate(sidx.sig_table().where(
            F.col("_epoch") != epoch), vec, vecs, bsig,
            id_col="vec_id", vec_col="v", threshold=0.98)
        t(spark, f"e{epoch} gate noop",
          lambda: gate.write.format("noop").mode("overwrite").save())
        bv = vecs
        t(spark, f"e{epoch} append_frames",
          lambda: sidx.append_frames(bv, bsig, epoch_id=epoch))
    print("done", root)


if __name__ == "__main__":
    main()
