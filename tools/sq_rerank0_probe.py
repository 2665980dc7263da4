"""Measure WHERE the int8-only probe (probe_batch_sq(rerank=0))
breaks — the VERDICT r11 stretch guardrail: stage-1 recall@10 = 1.0
on the test embeddings suggests skipping the exact re-rank is safe,
but the claim needs its failure boundary measured, not guessed.

Two measurements, written to tools/sq_rerank0_result.json:

1. ``embeddings``: recall@10 of rerank=0 vs the exact probe_batch on
   the sf0.01 test embeddings (250 vectors, 10 queries, all cells
   probed so routing drops out of the comparison).
2. ``adversarial``: the variable that decides whether rerank=0 is
   safe is the exact-cosine GAP between competing candidates at the
   k boundary (the int8 quantization step is ~1/254 of each
   vector's max-abs, i.e. ~0.4% relative resolution — candidates
   separated by more than the induced cosine error cannot swap).
   Per gap δ, each query gets a ladder of candidates at EXACT
   cosines 0.9 − i·δ (c·q + sqrt(1−c²)·u with u ⊥ q), so the
   top-10/11 boundary gap IS δ; the recorded recall@10-vs-exact per
   δ locates the boundary the probe_batch_sq docstring cites.

Run: python tools/sq_rerank0_probe.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def recall_vs_exact(idx, qs, k=10, nprobe=16):
    fast = idx.probe_batch_sq(qs, k=k, nprobe=nprobe, rerank=0)
    exact = idx.probe_batch(qs, k=k, nprobe=nprobe)
    f = {(r.query_id, r.vec_id) for r in fast.collect()}
    e = {(r.query_id, r.vec_id) for r in exact.collect()}
    per_q = {}
    for qid, vid in e:
        per_q.setdefault(qid, [0, 0])
        per_q[qid][1] += 1
        if (qid, vid) in f:
            per_q[qid][0] += 1
    hits = sum(h for h, _ in per_q.values())
    tot = sum(t for _, t in per_q.values())
    return hits / tot if tot else None


def main() -> None:
    import numpy as np

    from industrial_data_pipeline_spark.operators.similarity import (
        StoredIvfIndex)
    from industrial_data_pipeline_spark.session import get_spark
    from industrial_data_pipeline_spark.suite_llm import _load_emb

    import tempfile

    from pyspark.sql import functions as F

    spark = get_spark("sq-rerank0-probe", cores=8)
    out = {"k": 10, "note": "recall@10 of probe_batch_sq(rerank=0) "
           "vs the exact probe_batch, all cells probed"}

    # 1. the real test embeddings
    emb = _load_emb(spark, SF)
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    base = emb.where(F.col("vec_id") < 250) \
        .select("vec_id", v.alias("_v"))
    qs = base.where(F.col("vec_id") < 10)
    root = tempfile.mkdtemp(prefix="sq0_emb_")
    idx = StoredIvfIndex(spark, root, id_col="vec_id",
                         vec_col="_v", n_cells=16, sq_int8=True)
    idx.build(base)
    out["embeddings"] = {"n": 250, "recall10":
                         recall_vs_exact(idx, qs)}

    # 2. adversarial cosine-gap ladders: per gap δ, 20 queries ×
    #    30 candidates at EXACT cosines 0.9 − i·δ — the top-10/11
    #    boundary gap is exactly δ
    rng = np.random.default_rng(290)
    dim, n_q, n_cand = 16, 20, 30
    adv = {}
    for gap in (3e-2, 1e-2, 3e-3, 1e-3, 3e-4, 1e-4):
        rows, qrows, vid = [], [], 1000
        for q_i in range(n_q):
            q = rng.normal(size=dim)
            q /= np.linalg.norm(q)
            qrows.append((q_i, [float(x) for x in q]))
            for i in range(n_cand):
                c = 0.9 - i * gap
                u = rng.normal(size=dim)
                u -= (u @ q) * q
                u /= np.linalg.norm(u)
                v_ = c * q + np.sqrt(1.0 - c * c) * u
                rows.append((vid, [float(x) for x in v_]))
                vid += 1
        corpus = spark.createDataFrame(
            rows, "vec_id long, _v array<double>")
        queries = spark.createDataFrame(
            qrows, "vec_id long, _v array<double>")
        r = tempfile.mkdtemp(prefix="sq0_adv_")
        ix = StoredIvfIndex(spark, r, id_col="vec_id",
                            vec_col="_v", n_cells=4, sq_int8=True)
        ix.build(corpus)
        adv[f"{gap:g}"] = round(
            recall_vs_exact(ix, queries, k=10, nprobe=4), 4)
    out["adversarial_recall10_by_cosine_gap"] = adv
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "sq_rerank0_result.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
