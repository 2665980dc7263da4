"""operators/retrieval.py (VERDICT r13 item 1): the first-class RRF
fusion must (a) compute the canonical fixed-order reciprocal-rank
sum exactly, (b) be byte-identical to the inline composition the
suite queries used before the extraction (q294's shape), and (c)
pass every cross-cutting knob — tenant filter, as-of pin,
guaranteed-k — through to BOTH legs from one call."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from industrial_data_pipeline_spark.operators.retrieval import (
    HybridRetriever, rrf_fuse)


def _leg(spark, rows):
    return spark.createDataFrame(
        rows, "query_id long, cand_id long, rank int")


def test_rrf_fuse_exact_values(spark):
    """Hand-computed fusion: doc 7 in both legs, 8 lexical-only,
    9 dense-only — score, rank, and both membership flags."""
    lex = _leg(spark, [(1, 7, 1), (1, 8, 2)])
    den = _leg(spark, [(1, 7, 2), (1, 9, 1)])
    out = {r["cand_id"]: r for r in
           rrf_fuse(lex, den, k=10).collect()}
    assert set(out) == {7, 8, 9}
    assert out[7]["rrf_score"] == 1.0 / 61 + 1.0 / 62
    assert out[8]["rrf_score"] == 1.0 / 62
    assert out[9]["rrf_score"] == 1.0 / 61
    assert [out[c]["rrf_rank"] for c in (7, 9, 8)] == [1, 2, 3]
    assert (out[7]["in_lexical"], out[7]["in_dense"]) == (True, True)
    assert (out[8]["in_lexical"], out[8]["in_dense"]) == (True, False)
    assert (out[9]["in_lexical"], out[9]["in_dense"]) == (False, True)


def test_rrf_fuse_k_truncation_and_tiebreak(spark):
    """Equal scores break ties to the LOWER cand_id (the suite
    oracles' ORDER BY score DESC, doc_id), and k truncates."""
    lex = _leg(spark, [(1, 30, 1), (1, 20, 2), (1, 10, 3)])
    den = _leg(spark, [(1, 30, 1), (1, 10, 2), (1, 20, 3)])
    # 20 and 10 tie on 1/62 + 1/63: lower id first
    rows = rrf_fuse(lex, den, k=2).collect()
    assert [(r["cand_id"], r["rrf_rank"]) for r in
            sorted(rows, key=lambda r: r["rrf_rank"])] \
        == [(30, 1), (10, 2)]


def test_rrf_fuse_flag_names(spark):
    lex = _leg(spark, [(1, 7, 1)])
    den = _leg(spark, [(1, 7, 1)])
    cols = rrf_fuse(lex, den, flags=("in_lexical",
                                     "in_fuzzy")).columns
    assert cols == ["query_id", "cand_id", "rrf_rank", "rrf_score",
                    "in_lexical", "in_fuzzy"]


def _corpus(spark, n=60):
    return spark.createDataFrame(
        [(i, f"spark merge batch row{i % 5} alpha beta"
          + " spark" * (i % 3),
          int(i % 2)) for i in range(n)],
        "doc_id long, text string, lbl int")


def _build_pair(spark, tmp_path, docs, labeled: bool):
    from industrial_data_pipeline_spark.operators.bm25_index import (
        StoredBm25Index)
    from industrial_data_pipeline_spark.operators.similarity import (
        StoredIvfIndex)
    from industrial_data_pipeline_spark.operators.text import (
        hashed_bow_embedding)

    extra = "lbl int" if labeled else None
    emb_cols = ["doc_id",
                hashed_bow_embedding(F.col("text"), 8).alias("_v")]
    if labeled:
        emb_cols.append(F.col("lbl"))
    emb = docs.select(*emb_cols)
    bidx = StoredBm25Index(spark, os.path.join(str(tmp_path), "b"),
                           n_buckets=4, extra_schema=extra)
    bidx.build(docs.where(F.col("doc_id") < 40))
    bidx.append(docs.where(F.col("doc_id") >= 40), epoch_id=0)
    vidx = StoredIvfIndex(spark, os.path.join(str(tmp_path), "v"),
                          id_col="doc_id", vec_col="_v", n_cells=4,
                          extra_schema=extra)
    vidx.build(emb.where(F.col("doc_id") < 40))
    vidx.append(emb.where(F.col("doc_id") >= 40), epoch_id=0)
    return bidx, vidx, emb


def _qvecs(spark, queries):
    from industrial_data_pipeline_spark.operators.text import (
        hashed_bow_embedding)
    return (spark.createDataFrame(sorted(queries.items()),
                                  "qid long, qtext string")
            .select("qid",
                    hashed_bow_embedding(F.col("qtext"), 8)
                    .alias("_qv")))


QUERIES = {1000: "spark merge", 1001: "alpha batch row1"}


def test_retriever_matches_inline_composition(spark, tmp_path):
    """The operator is a refactor, not a re-derivation: retrieve()
    must be row-for-row identical to hand-composing the two probes
    and rrf_fuse — the byte-parity the q294/q298/q303 re-registration
    relies on."""
    docs = _corpus(spark)
    bidx, vidx, _ = _build_pair(spark, tmp_path, docs, labeled=False)
    qv = _qvecs(spark, QUERIES)

    hyb = HybridRetriever(bidx, vidx)
    got = sorted(hyb.retrieve(QUERIES, qv, k=5, leg_k=8, nprobe=2,
                              id_col="qid", vec_col="_qv")
                 .collect())

    lex = (bidx.probe(QUERIES, k=8)
           .select("query_id", F.col("doc_id").alias("cand_id"),
                   "rank"))
    den = (vidx.probe_batch(qv, k=8, nprobe=2, id_col="qid",
                            vec_col="_qv")
           .select("query_id", F.col("vec_id").alias("cand_id"),
                   F.col("rk").alias("rank")))
    want = sorted(rrf_fuse(lex, den, k=5).collect())
    assert got == want


def test_retriever_filter_scopes_both_legs(spark, tmp_path):
    """One query_filters dict must scope BOTH legs: every fused
    candidate belongs to the query's own stratum — on the lexical
    leg AND the dense leg (flag-wise, not just in aggregate)."""
    docs = _corpus(spark)
    bidx, vidx, _ = _build_pair(spark, tmp_path, docs, labeled=True)
    qv = _qvecs(spark, QUERIES)
    qf = {1000: 0, 1001: 1}

    hyb = HybridRetriever(bidx, vidx)
    rows = hyb.retrieve(QUERIES, qv, k=10, leg_k=8, nprobe=2,
                        id_col="qid", vec_col="_qv",
                        filter_col="lbl",
                        query_filters=qf).collect()
    assert rows
    for r in rows:
        assert r["cand_id"] % 2 == qf[r["query_id"]], r


def test_retriever_asof_pins_both_legs(spark, tmp_path):
    """as_of_epoch=-1 (build only) through ONE retrieve() call:
    no candidate from the appended epoch on either leg."""
    docs = _corpus(spark)
    bidx, vidx, _ = _build_pair(spark, tmp_path, docs, labeled=False)
    qv = _qvecs(spark, QUERIES)
    hyb = HybridRetriever(bidx, vidx)
    rows = hyb.retrieve(QUERIES, qv, k=10, leg_k=8, nprobe=2,
                        id_col="qid", vec_col="_qv",
                        as_of_epoch=-1).collect()
    assert rows
    assert all(r["cand_id"] < 40 for r in rows)


def test_retriever_error_contracts(spark, tmp_path):
    docs = _corpus(spark)
    bidx, vidx, _ = _build_pair(spark, tmp_path, docs, labeled=True)
    qv = _qvecs(spark, QUERIES)
    hyb = HybridRetriever(bidx, vidx)
    import pytest
    with pytest.raises(ValueError, match="dense_tier"):
        hyb.retrieve(QUERIES, qv, dense_tier="pq",
                     id_col="qid", vec_col="_qv")
    with pytest.raises(ValueError, match="query_filters"):
        hyb.retrieve(QUERIES, qv, filter_col="lbl",
                     id_col="qid", vec_col="_qv")


def test_retriever_sq_tier_plans_and_guarantee(spark, tmp_path):
    """The q308 capstone's plan claims: through ONE retrieve() call
    with dense_tier='sq' + filter + min_results, the dense stage-1
    scan reads ONLY the int8 code columns (no vector bytes) of the
    probed cells (PartitionFilters), and the guarantee delivers the
    whole rare stratum — matching the direct probe_batch_sq
    composition row-for-row."""
    import re

    from pyspark.sql import functions as F

    from industrial_data_pipeline_spark.operators.bm25_index import (
        StoredBm25Index)
    from industrial_data_pipeline_spark.operators.similarity import (
        StoredIvfIndex)
    from industrial_data_pipeline_spark.operators.text import (
        hashed_bow_embedding)

    docs = _corpus(spark).withColumn(
        "lbl", F.when(F.col("doc_id") % 13 == 2, 9)
        .otherwise(F.col("doc_id") % 2).cast("int"))
    emb = docs.select(
        "doc_id", hashed_bow_embedding(F.col("text"), 8).alias("_v"),
        "lbl")
    bidx = StoredBm25Index(spark, str(tmp_path / "b"), n_buckets=4,
                           extra_schema="lbl int")
    bidx.build(docs)
    vidx = StoredIvfIndex(spark, str(tmp_path / "v"),
                          id_col="doc_id", vec_col="_v", n_cells=4,
                          sq_int8=True, extra_schema="lbl int")
    vidx.build(emb)
    rare = sorted(r.doc_id for r in
                  docs.where("lbl = 9").collect())
    assert 3 <= len(rare) <= 6
    qf = {1000: 9, 1001: 9}
    qv = _qvecs(spark, QUERIES)

    hyb = HybridRetriever(bidx, vidx)
    got = hyb.retrieve(QUERIES, qv, k=10, leg_k=3, nprobe=1,
                       id_col="qid", vec_col="_qv",
                       filter_col="lbl", query_filters=qf,
                       min_results=len(rare), dense_tier="sq",
                       rerank=3).collect()
    # stage-1 scan: int8 codes only, cell-partition pruned
    from tests.test_retrieval import _plan_str
    p = _plan_str(vidx.last_sq_scan)
    schemas = re.findall(r"ReadSchema: .*", p)
    assert schemas and all("q8" in s for s in schemas), p
    assert all("v:" not in s.replace("vec_id", "")
               for s in schemas), p
    assert re.search(r"PartitionFilters: \[.*_cell", p), p

    # parity with the hand-composed legs
    lex = (bidx.probe(QUERIES, k=3, filter_col="lbl",
                      query_filters=qf)
           .select("query_id", F.col("doc_id").alias("cand_id"),
                   "rank"))
    qvf = qv.withColumn("_qf", F.lit(9).cast("int"))
    den = (vidx.probe_batch_sq(qvf, k=3, nprobe=1, rerank=3,
                               id_col="qid", vec_col="_qv",
                               filter_col="lbl",
                               query_filter_col="_qf",
                               min_results=len(rare))
           .select("query_id", F.col("vec_id").alias("cand_id"),
                   F.col("rk").alias("rank")))
    want = rrf_fuse(lex, den, k=10).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
    # every dense candidate is in the rare stratum
    dense_ids = {r.cand_id for r in got if r.in_dense}
    assert dense_ids and dense_ids <= set(rare)


def _plan_str(df) -> str:
    import io
    from contextlib import redirect_stdout
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_retrieve_frames_matches_dict_form(spark, tmp_path):
    """retrieve_frames must land on retrieve()'s exact bytes over
    the same queries (the q300 twin discipline on the fused
    operator) — unfiltered AND tenant-filtered — and reject a bad
    dense tier."""
    import pytest
    from pyspark.sql import functions as F

    docs = _corpus(spark)
    bidx, vidx, _ = _build_pair(spark, tmp_path, docs, labeled=True)
    qf = {1000: 0, 1001: 1}
    from industrial_data_pipeline_spark.operators.text import (
        hashed_bow_embedding)
    qdf = (spark.createDataFrame(
        [(qid, QUERIES[qid], qf[qid]) for qid in sorted(QUERIES)],
        "qid long, qtext string, lbl int")
        .select("qid", "qtext",
                hashed_bow_embedding(F.col("qtext"), 8)
                .alias("_qv"), "lbl"))
    hyb = HybridRetriever(bidx, vidx)

    plain = sorted(map(tuple, hyb.retrieve(
        QUERIES, qdf, k=5, leg_k=8, nprobe=2,
        id_col="qid", vec_col="_qv").collect()))
    plain_f = sorted(map(tuple, hyb.retrieve_frames(
        qdf, k=5, leg_k=8, nprobe=2, id_col="qid",
        text_col="qtext", vec_col="_qv").collect()))
    assert plain_f == plain

    filt = sorted(map(tuple, hyb.retrieve(
        QUERIES, qdf, k=5, leg_k=8, nprobe=2,
        id_col="qid", vec_col="_qv", filter_col="lbl",
        query_filters=qf).collect()))
    filt_f = sorted(map(tuple, hyb.retrieve_frames(
        qdf, k=5, leg_k=8, nprobe=2, id_col="qid",
        text_col="qtext", vec_col="_qv", filter_col="lbl",
        query_filter_col="lbl").collect()))
    assert filt_f == filt

    with pytest.raises(ValueError, match="dense_tier"):
        hyb.retrieve_frames(qdf, dense_tier="pq", id_col="qid",
                            text_col="qtext", vec_col="_qv")
