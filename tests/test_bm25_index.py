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
    # the positional column is phrase-probe-only: the BM25 scoring
    # plan must column-prune it out of the parquet read entirely
    full = _plan(out)
    schemas = re.findall(r"ReadSchema: [^\n]*", full)
    assert schemas and all("pos:" not in s for s in schemas), schemas


def test_analyzer_index_finds_what_raw_misses(spark, tmp_path):
    """VERDICT r12 item 1, the acceptance shape: over a punctuated /
    zero-width-noisy corpus, the analyzer-composed index retrieves
    documents the raw whitespace index misses entirely; the stored
    probe stays byte-identical to bm25_topk with the SAME analyzer;
    and open() restores the analyzer from meta (a probe can never
    tokenize differently than the build wrote)."""
    from industrial_data_pipeline_spark.operators.analyzer import (
        Analyzer)
    from industrial_data_pipeline_spark.operators.bm25_index import (
        StoredBm25Index)
    from industrial_data_pipeline_spark.operators.text import (
        bm25_topk)

    # «word, word.» punctuation on every boundary + a zero-width
    # space inside every "spark" — raw whitespace tokens are
    # "«merge," / "sp<zw>ark.»", never "merge"/"spark"
    noisy = _docs(spark).select(
        "doc_id",
        F.concat(F.lit("«"),
                 F.regexp_replace(F.regexp_replace(
                     "text", " ", ", "), "spark", "sp​ark"),
                 F.lit(".»")).alias("text"))
    az = Analyzer(stopwords=("the", "a"), stem_s=True)
    q = {0: "Merge! SPARK?", 1: "the rows — a batch."}

    idx = StoredBm25Index(spark, str(tmp_path / "az"), n_buckets=8,
                          analyzer=az)
    idx.build(noisy.where("doc_id < 30"))
    idx.append(noisy.where("doc_id >= 30"), epoch_id=0)
    got = sorted(map(tuple, idx.probe(q, k=5).collect()))
    want = sorted(map(tuple,
                      bm25_topk(noisy, q, k=5, analyzer=az)
                      .collect()))
    assert got == want and len(got) == 10

    raw = StoredBm25Index(spark, str(tmp_path / "raw"), n_buckets=8)
    raw.build(noisy)
    # the raw index has no "merge"/"spark"/"batch" terms at all
    assert raw.probe(q, k=5).where(
        F.col("query_id").isin(0, 1)).count() == 0

    reopened = StoredBm25Index.open(spark, str(tmp_path / "az"))
    assert reopened.analyzer == az
    assert sorted(map(tuple,
                      reopened.probe(q, k=5).collect())) == got


def test_reappended_doc_tf_merges_before_saturation(spark, tmp_path):
    """ADVICE r12: a doc_id re-appended in a later epoch must score
    exactly as bm25_topk over the concatenated corpus — tf summed
    across epochs BEFORE saturation (equal dl), not two
    independently-saturated contributions."""
    from industrial_data_pipeline_spark.operators.bm25_index import (
        StoredBm25Index)
    from industrial_data_pipeline_spark.operators.text import (
        bm25_topk)

    docs = _docs(spark, n=20)
    dup = docs.where("doc_id < 4")  # same text, same dl
    idx = StoredBm25Index(spark, str(tmp_path / "re"), n_buckets=8)
    idx.build(docs)
    idx.append(dup, epoch_id=0)
    got = sorted(map(tuple, idx.probe(Q, k=8).collect()))
    want = sorted(map(tuple,
                      bm25_topk(docs.unionAll(dup), Q, k=8)
                      .collect()))
    assert got == want
    # changed-dl re-append stays split on both sides too
    dup2 = dup.select("doc_id",
                      F.concat("text", F.lit(" extra tail words"))
                      .alias("text"))
    idx.append(dup2, epoch_id=1)
    got2 = sorted(map(tuple, idx.probe(Q, k=8).collect()))
    want2 = sorted(map(tuple,
                       bm25_topk(docs.unionAll(dup).unionAll(dup2),
                                 Q, k=8).collect()))
    assert got2 == want2


def test_probe_frames_matches_probe(spark, tmp_path):
    """probe_frames (VERDICT r12 item 5) must be byte-identical to
    probe over the dict form of the same queries — legacy AND
    analyzer tokenization — and its postings scan must keep the
    bucket PartitionFilters (the pruning the driver-side distinct
    term collection exists to compute)."""
    import re

    from industrial_data_pipeline_spark.operators.analyzer import (
        Analyzer)
    from industrial_data_pipeline_spark.operators.bm25_index import (
        StoredBm25Index)

    docs = _docs(spark)
    for name, az in (("legacy", None),
                     ("an", Analyzer(stopwords=("the",),
                                     stem_s=True))):
        idx = StoredBm25Index(spark, str(tmp_path / name),
                              n_buckets=16, analyzer=az)
        idx.build(docs)
        want = sorted(map(tuple, idx.probe(Q, k=5).collect()))
        qdf = spark.createDataFrame(
            sorted(Q.items()), "query_id long, query_text string")
        got = sorted(map(tuple,
                         idx.probe_frames(qdf, k=5).collect()))
        assert got == want, name
        p = _plan(idx.last_postings_scan)
        assert re.search(r"PartitionFilters: \[.*_tb.*\]", p), p

    with __import__("pytest").raises(ValueError):
        idx.probe_frames(spark.createDataFrame(
            [(9, "«—»")], "query_id long, query_text string"))


def test_phrase_probe_semantics(spark, tmp_path):
    """Positional postings + the anchor trick (q301): exact
    adjacency in order, repeated-token phrases can't double-vote one
    slot, occurrences count per starting anchor, re-appended epochs
    distinct-merge positions, and the scan stays bucket-pruned."""
    import re

    from industrial_data_pipeline_spark.operators.bm25_index import (
        StoredBm25Index)

    docs = spark.createDataFrame(
        [(1, "a b a b c"),        # "a b" twice; "b a" once
         (2, "a a a"),            # "a a" twice (overlapping)
         (3, "b c a"),            # "a b" never (wrong order)
         (4, "x a y b")],         # "a b" never (not adjacent)
        "doc_id long, text string")
    idx = StoredBm25Index(spark, str(tmp_path / "ph"), n_buckets=8)
    idx.build(docs)

    def got(q, **kw):
        return sorted((r.query_id, r.doc_id, r.n_occ, r.rank)
                      for r in idx.phrase_probe(q, **kw).collect())

    assert got({0: "a b"}) == [(0, 1, 2, 1)]
    assert got({0: "a a"}) == [(0, 2, 2, 1)]
    assert got({0: "b a"}) == [(0, 1, 1, 1)]
    assert got({0: "a b c"}) == [(0, 1, 1, 1)]
    assert got({0: "c x"}) == []
    # pruning: the phrase scan lists only the probed terms' buckets
    p = _plan(idx.last_postings_scan)
    assert re.search(r"PartitionFilters: \[.*_tb.*\]", p), p
    # re-appending the same doc in a later epoch must not double
    # occurrences (positions distinct-merge per doc)
    idx.append(docs.where("doc_id = 1"), epoch_id=0)
    assert got({0: "a b"}) == [(0, 1, 2, 1)]
    # as-of still sees the phrase; ranking caps at k
    assert got({0: "a b"}, as_of_epoch=-1) == [(0, 1, 2, 1)]


def test_filtered_probe_per_stratum_stats(spark, tmp_path):
    """Metadata-filtered BM25 (q302): a filtered probe must score as
    if the query's stratum were ITS OWN index — per-label N/avgdl/df
    — so for every label it equals bm25_topk over exactly that
    stratum's sub-corpus; the label rides both assets denormalized
    (compact/retract must preserve it), and probe_frames carries the
    labels on the query frame."""
    from industrial_data_pipeline_spark.operators.bm25_index import (
        StoredBm25Index)
    from industrial_data_pipeline_spark.operators.text import (
        bm25_topk)

    docs = _docs(spark).select(
        "doc_id", "text", (F.col("doc_id") % 3).cast("int")
        .alias("lbl"))
    idx = StoredBm25Index(spark, str(tmp_path / "fl"), n_buckets=8,
                          extra_schema="lbl int")
    idx.build(docs.where("doc_id < 30"))
    idx.append(docs.where("doc_id >= 30"), epoch_id=0)

    q = {0: "spark merge", 1: "alpha batch", 2: "spark batch"}
    qf = {0: 0, 1: 1, 2: 2}
    got = sorted(map(tuple, idx.probe(q, k=5, filter_col="lbl",
                                      query_filters=qf).collect()))
    want = []
    for qid, lbl in qf.items():
        want += [tuple(r) for r in bm25_topk(
            docs.where(F.col("lbl") == lbl), {qid: q[qid]},
            k=5).collect()]
    assert got == sorted(want) and len(got) == 15

    # probe_frames symmetry: labels ride the query frame
    qdf = spark.createDataFrame(
        [(qid, q[qid], qf[qid]) for qid in sorted(q)],
        "query_id long, query_text string, lbl int")
    got2 = sorted(map(tuple, idx.probe_frames(
        qdf, k=5, filter_col="lbl").collect()))
    assert got2 == got

    # the rewrite path must carry the metadata column: retract +
    # compact, then the filtered probe still works and matches the
    # shrunk strata
    idx.retract([0, 1, 2])
    idx.compact()
    got3 = sorted(map(tuple, idx.probe(q, k=5, filter_col="lbl",
                                       query_filters=qf).collect()))
    want3 = []
    for qid, lbl in qf.items():
        want3 += [tuple(r) for r in bm25_topk(
            docs.where((F.col("lbl") == lbl) & (F.col("doc_id") >= 3)),
            {qid: q[qid]}, k=5).collect()]
    assert got3 == sorted(want3)

    # unfiltered probe on the same index unchanged by extra_schema
    plain = sorted(map(tuple, idx.probe(Q, k=5).collect()))
    wplain = sorted(map(tuple, bm25_topk(
        _docs(spark).where("doc_id >= 3"), Q, k=5).collect()))
    assert plain == wplain

    with __import__("pytest").raises(ValueError):
        idx.probe(q, k=5, filter_col="nope", query_filters=qf)
    with __import__("pytest").raises(ValueError):
        idx.probe(q, k=5, filter_col="lbl", query_filters={0: 0})


def test_phrase_probe_tenant_scoping_and_frames_parity(
        spark, tmp_path):
    """Phrase parity with the BM25 probe contract (VERDICT r13
    item 2): (a) filter_col scopes the anchor join to each query's
    own stratum, (b) phrase_probe_frames is byte-identical to the
    dict form — unfiltered AND filtered, legacy AND analyzer
    tokenization — and (c) the filtered scan pushes the label
    IN-list next to the term IN-list."""
    import re

    import pytest

    from industrial_data_pipeline_spark.operators.analyzer import (
        Analyzer)
    from industrial_data_pipeline_spark.operators.bm25_index import (
        StoredBm25Index)

    docs = spark.createDataFrame(
        [(1, "a b c", 0), (2, "a b c", 1),    # "a b" in BOTH strata
         (3, "a b a b", 0), (4, "b a", 1)],
        "doc_id long, text string, lbl int")
    idx = StoredBm25Index(spark, str(tmp_path / "tp"), n_buckets=8,
                          extra_schema="lbl int")
    idx.build(docs.where("doc_id < 3"))
    idx.append(docs.where("doc_id >= 3"), epoch_id=0)

    q = {0: "a b", 1: "a b"}
    qf = {0: 0, 1: 1}
    got = sorted((r.query_id, r.doc_id, r.n_occ, r.rank)
                 for r in idx.phrase_probe(
                     q, filter_col="lbl",
                     query_filters=qf).collect())
    # query 0 sees only stratum 0 (docs 1, 3); query 1 only doc 2
    assert got == [(0, 1, 1, 2), (0, 3, 2, 1), (1, 2, 1, 1)]
    p = _plan(idx.last_postings_scan)
    assert re.search(r"PushedFilters: \[.*In\(term", p), p
    assert re.search(r"PushedFilters: \[.*In\(lbl", p), p

    # frames twin, filtered: labels ride the query frame
    qdf = spark.createDataFrame(
        [(qid, q[qid], qf[qid]) for qid in sorted(q)],
        "query_id long, query_text string, lbl int")
    got2 = sorted((r.query_id, r.doc_id, r.n_occ, r.rank)
                  for r in idx.phrase_probe_frames(
                      qdf, filter_col="lbl").collect())
    assert got2 == got

    # frames twin, unfiltered + analyzer tokenization
    adocs = _docs(spark)
    for name, az in (("legacy", None),
                     ("an", Analyzer(stopwords=("the",),
                                     stem_s=True))):
        aidx = StoredBm25Index(spark, str(tmp_path / f"fp{name}"),
                               n_buckets=8, analyzer=az)
        aidx.build(adocs)
        ph = {0: "spark merge", 1: "batch row1"}
        want = sorted(map(tuple,
                          aidx.phrase_probe(ph, k=5).collect()))
        pdf = spark.createDataFrame(
            sorted(ph.items()), "query_id long, query_text string")
        assert sorted(map(tuple, aidx.phrase_probe_frames(
            pdf, k=5).collect())) == want, name

    # error contracts: incomplete filters dict; no analyzable term
    with pytest.raises(ValueError, match="query_filters"):
        idx.phrase_probe(q, filter_col="lbl", query_filters={0: 0})
    with pytest.raises(ValueError, match="analyzable"):
        idx.phrase_probe_frames(spark.createDataFrame(
            [(9, "   ", 0)],
            "query_id long, query_text string, lbl int"),
            filter_col="lbl")


def test_phrase_probe_refuses_pre_positions_index(spark, tmp_path):
    """ADVICE r13: an index persisted before the positional-postings
    schema must FAIL LOUDLY on a phrase probe (the missing pos
    column would read all-NULL → every anchor vote vanishes → a
    silent all-miss). meta without a schema_version key opens as
    version 1; BM25 probes still work, phrase probes raise."""
    import json

    import pytest

    from industrial_data_pipeline_spark.operators.bm25_index import (
        StoredBm25Index)

    docs = _docs(spark, n=10)
    idx = StoredBm25Index(spark, str(tmp_path / "v1"), n_buckets=4)
    idx.build(docs)
    meta_path = idx._meta_path
    meta = json.load(open(meta_path))
    assert meta["schema_version"] == 2
    del meta["schema_version"]  # simulate a pre-positions index
    json.dump(meta, open(meta_path, "w"))

    old = StoredBm25Index.open(spark, str(tmp_path / "v1"))
    assert old.schema_version == 1
    assert old.probe(Q, k=3).count() > 0  # BM25 path unaffected
    with pytest.raises(ValueError, match="positional"):
        old.phrase_probe({0: "spark merge"})
    with pytest.raises(ValueError, match="positional"):
        old.phrase_probe_frames(spark.createDataFrame(
            [(0, "spark merge")],
            "query_id long, query_text string"))


def test_unicode_index_finds_what_ascii_drops(spark, tmp_path):
    """Analyzer(unicode_words=True) on the index (q306): over a
    multilingual corpus the ASCII analyzer extracts ZERO terms from
    every non-Latin query (probe refuses: nothing analyzable — the
    silent-invisibility failure made loud), while the unicode
    analyzer retrieves, with the fold-sensitive forms (trailing-Σ
    Greek, dotted-İ Turkish) matching across case variants."""
    import pytest

    from industrial_data_pipeline_spark.operators.analyzer import (
        Analyzer)
    from industrial_data_pipeline_spark.operators.bm25_index import (
        StoredBm25Index)

    docs = spark.createDataFrame(
        [(1, "Спарк ΣΥΓΧΩΝΕΥΣΙΣ データ"),
         (2, "спарк слияние"),
         (3, "İŞLEM işlem data")],
        "doc_id long, text string")
    q = {0: "СПАРК!", 1: "συγχωνευσισ", 2: "İşlem"}

    uni = StoredBm25Index(spark, str(tmp_path / "uni"), n_buckets=8,
                          analyzer=Analyzer(unicode_words=True))
    uni.build(docs)
    got = {(r.query_id, r.doc_id)
           for r in uni.probe(q, k=5).collect()}
    # Cyrillic query matches both case variants; the Greek query
    # (typed with plain σ...σ) matches the corpus's Σ...Σ via the
    # final-sigma fold; İşlem matches İŞLEM via the U+0307 fold
    assert {(0, 1), (0, 2), (1, 1), (2, 3)} <= got

    asc = StoredBm25Index(spark, str(tmp_path / "asc"), n_buckets=8,
                          analyzer=Analyzer())
    asc.build(docs)
    # the ASCII analyzer MANGLES Turkish into fragments: both
    # "İşlem" and "İŞLEM"/"işlem" shed the run "lem", so the only
    # ASCII retrieval is a fragment-to-fragment accident — the
    # Cyrillic/Greek/CJK queries contribute nothing at all
    assert {(r.query_id, r.doc_id)
            for r in asc.probe(q, k=5).collect()} == {(2, 3)}
    with pytest.raises(ValueError, match="analyzable"):
        # pure non-Latin queries: every term analyzer-dropped
        asc.probe({0: "СПАРК!", 1: "συγχωνευσισ"}, k=5)


def test_lexical_gate_stream_semantics(spark, tmp_path):
    """q309's pinned claims: (a) overlap_probe_frames is the
    order-invariant novelty gate (a reversed copy matches, a
    suffixed doc doesn't) riding the pruned scan, (b) a REPLAYED
    epoch is exactly-once — re-running the same admission batch
    leaves the asset byte-identical (exclude_epoch keeps the
    crashed attempt invisible to its own retry), and (c) after the
    stream, the streamed asset probes byte-identically to a
    one-shot batch rebuild over corpus + admits."""
    from pyspark.sql import functions as F

    from industrial_data_pipeline_spark.operators.bm25_index import (
        StoredBm25Index)

    corpus = _docs(spark, n=20)
    idx = StoredBm25Index(spark, str(tmp_path / "lg"), n_buckets=8)
    idx.build(corpus)

    toks = F.split(F.col("text"), " ")
    rev = F.array_join(F.reverse(toks), " ")
    suf = F.array_join(
        F.transform(toks, lambda t: F.concat(t, F.lit("q7"))), " ")
    batch = (corpus.where("doc_id < 2")
             .select((F.col("doc_id") + 900).alias("doc_id"),
                     rev.alias("text"))
             .unionByName(
                 corpus.where("doc_id < 2")
                 .select((F.col("doc_id") + 910).alias("doc_id"),
                         suf.alias("text"))))

    def admit(epoch):
        pairs = idx.overlap_probe_frames(batch, min_overlap=0.9,
                                         exclude_epoch=epoch)
        matched = {r.new_id for r in pairs.collect()}
        # reversed copies match (order-invariant), suffixed don't
        assert matched == {900, 901}
        admitted = batch.where(~F.col("doc_id").isin(900, 901))
        idx.append(admitted, epoch_id=epoch)

    admit(0)
    after_once = sorted(map(tuple, idx.probe(Q, k=8).collect()))
    import re
    p = _plan(idx.last_postings_scan)
    assert re.search(r"PartitionFilters: \[.*_tb.*\]", p), p

    # replayed epoch (crashed-attempt retry): same decisions —
    # the probe can't see the attempt's own appended postings —
    # and the dynamic overwrite REPLACES, never double-appends
    admit(0)
    assert sorted(map(tuple, idx.probe(Q, k=8).collect())) \
        == after_once

    # probe byte-parity with a one-shot batch rebuild
    rebuilt = StoredBm25Index(spark, str(tmp_path / "rb"),
                              n_buckets=8)
    rebuilt.build(corpus.unionByName(
        batch.where(~F.col("doc_id").isin(900, 901))))
    assert sorted(map(tuple, rebuilt.probe(Q, k=8).collect())) \
        == after_once

    # compaction (the in-stream cadence) stays invisible to probes
    idx.compact()
    assert sorted(map(tuple, idx.probe(Q, k=8).collect())) \
        == after_once
