"""StoredBm25Index (q293): the persisted lexical index must be
byte-identical to the in-plan bm25_topk over the same corpus across
the WHOLE lifecycle (build / exactly-once append / reopen / retract
/ compact / as-of), its probe must actually prune (bucket partition
filters + term pushdown), and the driver-side hash twin must stay
bit-identical to the Spark expression it prunes with."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _docs(spark, n=40):
    return spark.createDataFrame(
        [(i, f"spark merge batch row{i % 5} alpha beta"
          + " spark" * (i % 3)) for i in range(n)],
        "doc_id long, text string")


Q = {0: "spark merge", 1: "alpha batch"}


def test_py_hash64_twin_matches_spark(spark):
    """Bucket pruning is only correct if the driver-side md5 twin
    equals the Spark expression bit-for-bit — else probes would
    LIST THE WRONG PARTITIONS and return empty, the worst failure
    mode (silent, not slow)."""
    from industrial_data_pipeline_spark.operators.bm25_index import (
        py_hash64)
    from industrial_data_pipeline_spark.operators.text import hash64

    terms = ["merge", "spark", "ünïcode", "", " ", "a b",
             "ZZZ-q293", "漢字", "x" * 200]
    rows = (spark.createDataFrame([(t,) for t in terms],
                                  "term string")
            .select("term", hash64(F.col("term")).alias("h"))
            .collect())
    for r in rows:
        assert py_hash64(r.term) == r.h, r.term


def test_stored_bm25_equals_inplan_full_lifecycle(spark, tmp_path):
    from industrial_data_pipeline_spark.operators.bm25_index import (
        StoredBm25Index)
    from industrial_data_pipeline_spark.operators.text import (
        bm25_topk)

    docs = _docs(spark)
    idx = StoredBm25Index(spark, str(tmp_path / "bm"), n_buckets=8)
    idx.build(docs.where("doc_id < 30"))
    idx.append(docs.where("doc_id >= 30"), epoch_id=0)

    def got(ix, **kw):
        return sorted(map(tuple, ix.probe(Q, k=5, **kw).collect()))

    def want(d):
        return sorted(map(tuple, bm25_topk(d, Q, k=5).collect()))

    assert got(idx) == want(docs)
    # reopen from meta alone
    idx2 = StoredBm25Index.open(spark, str(tmp_path / "bm"))
    assert got(idx2) == want(docs)
    # as-of: history only (epoch 0 pruned, stats shrink with it)
    assert got(idx2, as_of_epoch=-1) == want(docs.where("doc_id < 30"))
    # exactly-once: replaying the epoch replaces, never doubles
    idx2.append(docs.where("doc_id >= 30"), epoch_id=0)
    assert got(idx2) == want(docs)
    # retraction removes docs from scoring AND stats
    idx2.retract([0, 1, 2])
    assert got(idx2) == want(docs.where("doc_id >= 3"))
    # compaction bounds files, probes byte-identical
    before = idx2.file_count()
    idx2.compact()
    assert idx2.file_count() <= before
    assert got(idx2) == want(docs.where("doc_id >= 3"))


def test_stored_bm25_probe_plan_prunes(spark, tmp_path):
    """The probe's postings scan must carry the probed buckets as
    PartitionFilters (file-level pruning — the reason the asset is
    bucket-partitioned) and the term IN-list in PushedFilters
    (row-group pruning in the term-sorted files); and the probed
    bucket set must be a strict subset when the vocabulary is
    small."""
    import re

    from industrial_data_pipeline_spark.operators.bm25_index import (
        StoredBm25Index, py_hash64)

    idx = StoredBm25Index(spark, str(tmp_path / "bp"),
                          n_buckets=16)
    idx.build(_docs(spark))
    out = idx.probe({0: "spark merge"}, k=3)
    out.collect()
    p = _plan(idx.last_postings_scan)
    m = re.search(r"PartitionFilters: \[.*_tb.*\]", p)
    assert m, p
    want = sorted({py_hash64(t) % 16 for t in ("spark", "merge")})
    assert len(want) < 16
    for b_ in want:
        assert str(b_) in m.group(0), (want, m.group(0))
    assert re.search(r"PushedFilters: \[.*[Ii]n\(term", p), p
