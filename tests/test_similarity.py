"""Similarity search: brute-force exactness, LSH/IVF recall."""

import pytest
from pyspark.sql import functions as F

from industrial_data_pipeline_spark.operators import similarity as S

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def qv(emb):
    return [float(x) for x in
            emb.where(F.col("vec_id") == 0).first()["embedding"]]


def test_bruteforce_self_is_top1(emb, qv):
    top = S.cosine_topk(emb, qv, k=5).collect()
    assert top[0].vec_id == 0
    assert top[0].cosine_sim == pytest.approx(1.0, abs=1e-6)
    sims = [r.cosine_sim for r in top]
    assert sims == sorted(sims, reverse=True)


def test_lsh_recall_on_planted_neighbors(spark, emb, qv):
    """The testdata embeddings are near-uniform w.r.t. any query (top-10
    cosine ≈ 0.3), where LSH provably cannot filter — so recall is
    asserted on PLANTED high-similarity neighbors (cos ≳ 0.95), the
    regime hyperplane LSH is built for: per-table collision
    (1-θ/π)^6 ≈ 0.5, 8 tables → ≈ 0.997 expected recall."""
    import math

    n = math.sqrt(sum(x * x for x in qv))
    planted = []
    for i in range(10):
        v = [x / n + (0.02 if d % 10 == i else 0.0)
             for d, x in enumerate(qv)]
        planted.append((10000 + i, v, 99))
    extra = spark.createDataFrame(
        planted, "vec_id long, embedding array<float>, label int")
    corpus = emb.unionByName(extra)
    approx_rows = S.hyperplane_lsh_topk(corpus, qv, k=11, n_tables=8,
                                        n_planes=6).collect()
    got = {r.vec_id for r in approx_rows}
    planted_ids = {10000 + i for i in range(10)}
    recall = len(got & planted_ids) / 10
    assert recall >= 0.8, f"LSH recall on planted neighbors: {recall}"
    # approximate results are still exactly-scored: agree with brute force
    exact_rows = {r.vec_id: r.cosine_sim
                  for r in S.cosine_topk(corpus, qv, k=600).collect()}
    for r in approx_rows:
        assert exact_rows[r.vec_id] == r.cosine_sim


def test_ivf_recall_vs_bruteforce(emb, qv):
    exact = {r.vec_id for r in S.cosine_topk(emb, qv, k=10).collect()}
    assigned, centroids = S.ivf_build(emb, n_cells=8)
    approx = {r.vec_id for r in
              S.ivf_topk(assigned, centroids, qv, k=10, nprobe=4).collect()}
    recall = len(exact & approx) / 10
    assert recall >= 0.5, f"IVF recall {recall}"


def test_cosine_pairs_lsh_recall_vs_bruteforce(spark):
    from industrial_data_pipeline_spark.suite_llm import _emb_dup_corpus

    corpus = _emb_dup_corpus(spark, SF).cache()
    exact = {(r.id_a, r.id_b): r.cosine_sim
             for r in S.cosine_pairs_bruteforce(
                 corpus, threshold=0.9).collect()}
    lsh = {(r.id_a, r.id_b): r.cosine_sim
           for r in S.cosine_pairs_lsh(corpus, dim=64,
                                       threshold=0.9).collect()}
    assert len(exact) >= 250  # the planted pairs exist
    assert set(lsh) <= set(exact)  # verified: no false positives
    recall = len(lsh) / len(exact)
    assert recall >= 0.9, f"cosine LSH recall {recall}"
    for k, v in lsh.items():
        assert exact[k] == v  # same exact scoring


def test_ivf_assignment_covers_all(emb):
    assigned, centroids = S.ivf_build(emb, n_cells=8)
    assert assigned.where(F.col("_cell").isNull()).count() == 0
    n_cells = assigned.select("_cell").distinct().count()
    assert 2 <= n_cells <= 8


def test_filtered_topk_prefilter_semantics(emb):
    """Every neighbor shares its query's label (pre-filter), no self
    matches, exactly k per query when the stratum is big enough, and
    ranks are dense from 1."""
    queries = emb.where(F.col("vec_id") < 5)
    out = S.filtered_cosine_topk(emb, queries, k=3).collect()
    qlabel = {r.vec_id: r.label for r in queries.collect()}
    strata = {lab: c for lab, c in
              emb.groupBy("label").count().collect()}
    by_q = {}
    for r in out:
        assert r.neighbor_id != r.query_id
        by_q.setdefault(r.query_id, []).append(r)
    for qid, rows in by_q.items():
        want = min(3, strata[qlabel[qid]] - 1)
        assert len(rows) == want
        assert sorted(r.rk for r in rows) == list(range(1, want + 1))
        sims = [r.cosine_sim for r in
                sorted(rows, key=lambda r: r.rk)]
        assert sims == sorted(sims, reverse=True)


def test_filtered_topk_matches_bruteforce_within_stratum(emb):
    """rk-1 neighbor == brute-force top-1 over the label-filtered
    corpus minus the query itself."""
    q = emb.where(F.col("vec_id") == 0).first()
    sub = emb.where((F.col("label") == q.label)
                    & (F.col("vec_id") != 0))
    brute = S.cosine_topk(sub, [float(x) for x in q.embedding],
                          k=1).first()
    got = (S.filtered_cosine_topk(emb, emb.where(F.col("vec_id") == 0),
                                  k=1).first())
    assert got.neighbor_id == brute.vec_id
    assert got.cosine_sim == brute.cosine_sim


def test_cosine_topk_zero_vector_ranks_last(spark):
    """A zero-norm embedding must never top the ranking: its cosine
    is NULL (sorted last), not NaN (which Spark sorts first desc)."""
    from industrial_data_pipeline_spark.operators.similarity import (
        cosine_topk)
    rows = [(1, [1.0, 0.0]), (2, [0.0, 0.0]), (3, [0.5, 0.5])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = [r.vec_id for r in cosine_topk(df, [1.0, 0.0], k=3).collect()]
    assert got[0] == 1 and got[-1] == 2


def test_filtered_topk_nan_vector_never_displaces(spark):
    """ADVICE r4: a corpus vector with a NaN component must not rank
    first (Spark NaN > 0 is TRUE, and NaN sorts above every double
    under desc). With the _usable_norm guard its cosine is NULL —
    sorted last — so real neighbors keep their ranks."""
    rows = [(1, [1.0, 0.0], "a"), (2, [float("nan"), 1.0], "a"),
            (3, [0.5, 0.5], "a"), (4, [float("inf"), 0.0], "a")]
    corpus = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label string")
    q = corpus.where(F.col("vec_id") == 1)
    got = S.filtered_cosine_topk(corpus, q, k=2,
                                 filter_col="label").collect()
    ranked = [r.neighbor_id for r in sorted(got, key=lambda r: r.rk)]
    # the only finite non-self neighbor is 3; NaN/inf rows sort last
    assert ranked[0] == 3
    sims = {r.neighbor_id: r.cosine_sim for r in got}
    assert sims.get(2) is None and sims.get(4) is None


def test_ann_gate_batch_vs_index_only(spark, tmp_path):
    """ann_gate (q248): a positively-scaled copy collides in EVERY
    table (hyperplane signs are scale-invariant) and verifies at
    cosine 1.0; an orthogonal batch vector matches nothing; two
    identical batch vectors never pair with each other (no
    batch-vs-batch); and the probe works off the PERSISTED index."""
    from pyspark.sql import functions as F

    from industrial_data_pipeline_spark.operators.similarity import (
        ann_gate, ann_signature_index)

    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0, 2.0, 0.5]), (2, [0.0, 3.0, 0.0, -1.0])],
        "vec_id long, vec array<double>")
    batch = spark.createDataFrame(
        [(10, [2.0, 0.0, 4.0, 1.0]),    # 2x of vec 1 -> cosine 1.0
         (11, [-1.0, 0.0, -2.0, -0.5]),  # negated: signs all flip
         (12, [-1.0, 0.0, -2.0, -0.5])],
        "vec_id long, vec array<double>")
    path = str(tmp_path / "sigs")
    ann_signature_index(corpus, 4, vec_col="vec") \
        .write.parquet(path)
    stored = spark.read.parquet(path)
    batch_idx = ann_signature_index(batch, 4, vec_col="vec")
    got = {(r.new_id, r.old_id): r.cosine_sim
           for r in ann_gate(stored, corpus, batch, batch_idx,
                             vec_col="vec",
                             threshold=0.98).collect()}
    assert set(got) == {(10, 1)} and got[(10, 1)] == 1.0


def test_hard_negatives_cross_label_only(spark):
    """hard_negatives (q252): only DIFFERENT-label rows are returned,
    ranked by cosine — the nearest cross-label vector wins; same-label
    near-duplicates never appear."""
    from industrial_data_pipeline_spark.operators.similarity import (
        hard_negatives)
    corpus = spark.createDataFrame(
        [(1, "a", [1.0, 0.0]), (2, "a", [0.99, 0.14]),  # same label
         (3, "b", [0.9, 0.44]), (4, "b", [0.0, 1.0]),
         (5, "c", [-1.0, 0.0])],
        "vec_id long, label string, embedding array<double>")
    q = corpus.where("vec_id = 1")
    got = [(r.neighbor_id, r.rk) for r in
           hard_negatives(corpus, q, k=2).orderBy("rk").collect()]
    # 2 (same label) excluded though nearest; 3 > 4 > 5 by cosine
    assert got == [(3, 1), (4, 2)]


def test_hard_negatives_nan_query_never_displaces(spark):
    """ADVICE r8: a NaN component in a QUERY vector must not produce
    NaN cosines (which sort first desc and displace every real hard
    negative) — the guarded cosine goes NULL and real queries are
    unaffected."""
    from industrial_data_pipeline_spark.operators.similarity import (
        hard_negatives)
    corpus = spark.createDataFrame(
        [(1, "a", [1.0, 0.0]), (3, "b", [0.9, 0.44]),
         (4, "b", [0.0, 1.0])],
        "vec_id long, label string, embedding array<double>")
    queries = spark.createDataFrame(
        [(1, "a", [1.0, 0.0]), (9, "a", [float("nan"), 1.0])],
        "vec_id long, label string, embedding array<double>")
    rows = hard_negatives(corpus, queries, k=2).collect()
    good = sorted((r.neighbor_id, r.rk) for r in rows
                  if r.query_id == 1)
    assert good == [(3, 1), (4, 2)]  # real query: unchanged ranking
    bad = {r.neighbor_id: r.cosine_sim for r in rows
           if r.query_id == 9}
    # NaN query: cosines are NULL (sorted last), never NaN-first
    assert all(v is None for v in bad.values())


def test_ann_gate_nan_vector_cannot_pass(spark, tmp_path):
    """ADVICE r8: NaN >= threshold is TRUE under Spark NaN ordering —
    an unguarded gate would ADMIT-as-duplicate (or worse, pass) NaN
    vectors. The guarded cosine is NULL, so NaN batch vectors produce
    no collision rows at all."""
    from industrial_data_pipeline_spark.operators.similarity import (
        ann_gate, ann_signature_index)
    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0, 2.0, 0.5])], "vec_id long, vec array<double>")
    batch = spark.createDataFrame(
        [(10, [float("nan"), 0.0, 0.0, 0.0]),
         (11, [2.0, 0.0, 4.0, 1.0])],
        "vec_id long, vec array<double>")
    idx = ann_signature_index(corpus, 4, vec_col="vec")
    bidx = ann_signature_index(batch, 4, vec_col="vec")
    got = {(r.new_id, r.old_id): r.cosine_sim
           for r in ann_gate(idx, corpus, batch, bidx, vec_col="vec",
                             threshold=0.98).collect()}
    assert set(got) == {(11, 1)} and got[(11, 1)] == 1.0


def test_ann_hard_negatives_planted_equals_bruteforce(spark, tmp_path):
    """ann_hard_negatives (q254): on a planted fixture where every
    true top-k cross-label neighbor is a guaranteed LSH collision
    (scaled copies — sign-invariant), the stored-index route returns
    EXACTLY the brute-force top-k; and its corpus read is pruned to
    the candidate ids (In(vec_id) pushed to the scan)."""
    from pyspark.sql import functions as F

    from industrial_data_pipeline_spark.operators.similarity import (
        ann_hard_negatives, ann_signature_index, hard_negatives,
        pruned_signature_scan, write_signature_index)

    base = [[1.0, 0.0, 2.0, 0.5], [0.0, 3.0, 0.0, -1.0],
            [-1.0, 1.0, 0.0, 2.0]]
    rows = []
    for i, v in enumerate(base):            # 3 strata × 4 scaled
        for s, scale in enumerate((1.0, 2.0, 0.5, 4.0)):
            rows.append((i * 10 + s, i, [x * scale for x in v]))
    corpus = spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<double>")
    cpath = str(tmp_path / "corp")
    corpus.write.parquet(cpath)
    corpus = spark.read.parquet(cpath)
    queries = (corpus.where(F.col("vec_id") == 0)
               .select((F.col("vec_id") + 100).alias("vec_id"),
                       F.lit(-1).cast("int").alias("label"),
                       F.transform("embedding",
                                   lambda x: x * F.lit(1.25))
                       .alias("embedding")))
    write_signature_index(ann_signature_index(corpus, 4),
                          str(tmp_path / "sigs"))
    qidx = ann_signature_index(queries, 4).localCheckpoint(eager=True)
    stored = pruned_signature_scan(spark, str(tmp_path / "sigs"), qidx)
    ann = ann_hard_negatives(stored, corpus, queries, qidx, k=3)
    got = sorted((r.query_id, r.neighbor_id, r.rk)
                 for r in ann.collect())
    want = sorted((r.query_id, r.neighbor_id, r.rk)
                  for r in hard_negatives(corpus, queries,
                                          k=3).collect())
    # the query is a scaled copy of stratum 0, and the sentinel label
    # makes every corpus row cross-label — so the TRUE top-3 are the
    # stratum-0 scaled copies at cosine 1.0, all guaranteed LSH
    # collisions (identical signatures in every table): the ANN route
    # must reproduce brute force exactly on this planted overlap
    assert got == want
    assert {n for _, n, _ in got} <= {0, 1, 2, 10}  # stratum 0 rows


# ------------------- StoredIvfIndex lifecycle (round 10, r9 ADVICE)


def test_ivf_retried_epoch_excluded_and_dropped(spark, tmp_path):
    """ADVICE r9 item 1 — the StoredLshIndex exactly-once discipline
    mirrored on the IVF asset: (a) a retried epoch's probe must
    EXCLUDE the crashed attempt's own _epoch=N vectors (they would
    enter the candidate cells as duplicates); (b) an in-stream
    compact(in_flight_epoch=N) DROPS the leftovers instead of folding
    them into history where the retry's dynamic overwrite could never
    replace them; (c) committed epochs (< in-flight) fold normally."""
    emb = spark.createDataFrame(
        [(i, [1.0, float(i % 3), 0.1 * i]) for i in range(10)],
        "vec_id long, embedding array<double>")
    batch = spark.createDataFrame(
        [(100 + i, [1.0, float(i % 3), 5.0]) for i in range(4)],
        "vec_id long, embedding array<double>")
    idx = S.StoredIvfIndex(spark, str(tmp_path / "ivf"), n_cells=2)
    idx.build(emb)
    idx.append(batch, epoch_id=3)        # crashed attempt of epoch 3
    qv = [1.0, 1.0, 1.0]
    # (a) excluded probe sees only history; unexcluded sees the hazard
    excl = {r.vec_id for r in
            idx.probe(qv, k=20, nprobe=2, exclude_epoch=3).collect()}
    assert excl == set(range(10))
    full = {r.vec_id for r in idx.probe(qv, k=20, nprobe=2).collect()}
    assert {100, 101, 102, 103} <= full
    # retry replaces its own partition: no duplicate vectors
    idx.append(batch, epoch_id=3)
    scan = idx.cell_scan([0, 1])
    assert scan.where("vec_id >= 100").count() == 4
    # (b) a retry that compacts FIRST purges the in-flight leftovers
    idx.compact(in_flight_epoch=3)
    assert idx.cell_scan([0, 1]).where("vec_id >= 100").count() == 0
    idx.append(batch, epoch_id=3)        # the retry re-appends
    assert idx.cell_scan([0, 1]).where("vec_id >= 100").count() == 4
    # (c) committed epochs fold into history
    idx.compact(in_flight_epoch=4)
    scan = idx.cell_scan([0, 1])
    assert scan.where("vec_id >= 100").count() == 4
    eps = {r._epoch for r in scan.select("_epoch").distinct().collect()}
    assert eps == {-1}


def test_ivf_retract_removes_vectors_and_stays_probeable(
        spark, tmp_path):
    """VERDICT r9 item 2, IVF half: retract() removes exactly the
    requested vectors from every subsequent probe; retracting ALL
    vectors leaves an emptied asset that still answers (empty) probes
    thanks to the explicit read schema; a later append revives it."""
    emb = spark.createDataFrame(
        [(i, [1.0, float(i % 3), 0.1 * i]) for i in range(8)],
        "vec_id long, embedding array<double>")
    idx = S.StoredIvfIndex(spark, str(tmp_path / "ivf"), n_cells=2)
    idx.build(emb)
    qv = [1.0, 1.0, 1.0]
    assert {r.vec_id for r in
            idx.probe(qv, k=20, nprobe=2).collect()} == set(range(8))
    idx.retract([0, 3, 5])
    got = {r.vec_id for r in idx.probe(qv, k=20, nprobe=2).collect()}
    assert got == {1, 2, 4, 6, 7}
    idx.retract(list(range(8)))          # take down everything
    assert idx.probe(qv, k=20, nprobe=2).count() == 0
    idx.append(emb.where("vec_id < 2"))  # revive
    assert {r.vec_id for r in
            idx.probe(qv, k=20, nprobe=2).collect()} == {0, 1}


def test_ivf_probe_batch_equals_per_query_loop(spark, tmp_path):
    """VERDICT r9 item 3: probe_batch's single pruned scan returns,
    per query, exactly the per-query probe() loop's top-k (modulo the
    loop lacking self-exclusion — compared on a disjoint query set),
    with ties to the lower vec_id."""
    emb = spark.createDataFrame(
        [(i, [1.0, float(i % 4), 0.05 * i, float((i * 7) % 5)])
         for i in range(40)],
        "vec_id long, embedding array<double>")
    idx = S.StoredIvfIndex(spark, str(tmp_path / "ivf"), n_cells=4)
    idx.build(emb)
    queries = spark.createDataFrame(
        [(1000 + j, [1.0, float(j % 4), 0.5, float(j % 5)])
         for j in range(6)],
        "vec_id long, embedding array<double>")
    got = sorted((r.query_id, r.rk, r.vec_id, r.cosine_sim)
                 for r in idx.probe_batch(queries, k=5,
                                          nprobe=2).collect())
    want = []
    for row in queries.collect():
        hits = idx.probe(list(map(float, row.embedding)), k=5,
                         nprobe=2).collect()
        want += [(row.vec_id, rk, h.vec_id, h.cosine_sim)
                 for rk, h in enumerate(hits, 1)]
    assert got == sorted(want)


# --------------- StoredSignatureIndex (round 10, VERDICT r9 item 2)


def _sig_fixture(spark, tmp_path, n=10):
    corpus = spark.createDataFrame(
        [(i, [float(i % 4) + 0.5, 1.0, 0.2 * i, float((i * 3) % 7)])
         for i in range(n)],
        "vec_id long, embedding array<double>")
    idx = S.StoredSignatureIndex(spark, str(tmp_path / "sig"), dim=4,
                                 threshold=0.98)
    idx.build(corpus)
    return corpus, idx


def test_stored_sig_index_equals_in_plan_gate(spark, tmp_path):
    """Probing the persisted assets is byte-identical to the in-plan
    ann_gate over the same corpus — the equality that lets q256 keep
    its oracle across the refactor onto the class."""
    corpus, idx = _sig_fixture(spark, tmp_path)
    batch = corpus.where("vec_id < 3").select(
        (F.col("vec_id") + 700).alias("vec_id"),
        F.transform("embedding", lambda x: x * F.lit(1.5))
        .alias("embedding"))
    stored = {(r.new_id, r.old_id, r.cosine_sim)
              for r in idx.probe(batch).collect()}
    vecs = corpus.select("vec_id",
                         F.col("embedding").alias("v"))
    bv = batch.select("vec_id", F.col("embedding").alias("v"))
    bsig = S.ann_signature_index(bv, 4, vec_col="v")
    inplan = {(r.new_id, r.old_id, r.cosine_sim)
              for r in S.ann_gate(
                  S.ann_signature_index(vecs, 4, vec_col="v"),
                  vecs, bv, bsig, vec_col="v",
                  threshold=0.98).collect()}
    assert stored == inplan and stored
    # scaled copies collide in every table (sign invariance): all 3
    assert {a for a, _, _ in stored} == {700, 701, 702}


def test_stored_sig_index_lifecycle_roundtrip(spark, tmp_path):
    """open() restores parameters; append advances the gate;
    exactly-once epoch retries replace rather than double-append;
    compact(in_flight_epoch) drops crashed leftovers; retract
    restores admissibility and an emptied index stays probeable."""
    corpus, idx = _sig_fixture(spark, tmp_path)
    re = S.StoredSignatureIndex.open(spark, str(tmp_path / "sig"))
    assert (re.dim, re.n_tables, re.n_planes,
            re.threshold) == (4, 8, 6, 0.98)
    newcomer = spark.createDataFrame(
        [(50, [9.0, -3.0, 7.0, -1.0])],
        "vec_id long, embedding array<double>")
    assert re.probe(newcomer).count() == 0
    # crashed attempt of epoch 2: admitted + appended
    vecs = re._vec_rows(newcomer).localCheckpoint(eager=True)
    sigs = re.signature_frame(vecs).localCheckpoint(eager=True)
    re.append_frames(vecs, sigs, epoch_id=2)
    dup = spark.createDataFrame(
        [(51, [4.5, -1.5, 3.5, -0.5])],  # scaled copy of 50
        "vec_id long, embedding array<double>")
    # retry's probe must exclude the in-flight epoch (no self-match
    # hazard on the gate's decisions)...
    assert re.probe(newcomer, exclude_epoch=2).count() == 0
    # ...while a normal later probe sees the admitted vector
    assert {r.old_id for r in re.probe(dup).collect()} == {50}
    # retry replaces its own partition: still exactly one row
    re.append_frames(vecs, sigs, epoch_id=2)
    assert re.vec_table().where("vec_id = 50").count() == 1
    # in-stream compact during the retry drops the leftovers
    re.compact(in_flight_epoch=2)
    assert re.vec_table().where("vec_id = 50").count() == 0
    re.append_frames(vecs, sigs, epoch_id=2)
    # committed epochs fold into history; probe unchanged
    files = re.file_count()
    re.compact(in_flight_epoch=3)
    assert re.file_count() <= files
    assert {r.old_id for r in re.probe(dup).collect()} == {50}
    eps = {r._epoch for r in re.vec_table()
           .select("_epoch").distinct().collect()}
    assert eps == {-1}
    # retraction: 50's former match becomes admissible again
    re.retract([50])
    assert re.probe(dup).count() == 0
    # take down everything — emptied assets stay probeable
    re.retract([r.vec_id for r in
                re.vec_table().select("vec_id").collect()])
    assert re.probe(dup).count() == 0
    re.append_frames(vecs, sigs)   # ad-hoc re-ingest revives
    assert {r.old_id for r in re.probe(dup).collect()} == {50}


def test_stored_sig_and_ivf_asof_probe(spark, tmp_path):
    """as_of_epoch uniformity (q269): the time-travel predicate
    behaves identically on the embedding signature index and the IVF
    index — epochs newer than the snapshot are invisible, history
    always is visible."""
    from industrial_data_pipeline_spark.operators.similarity import (
        StoredIvfIndex, StoredSignatureIndex)

    def vec(seed: int) -> list[float]:
        return [1.0 if i == seed else 0.1 for i in range(8)]

    base = spark.createDataFrame(
        [(1, vec(0))], "vec_id long, v array<double>")
    e0 = spark.createDataFrame(
        [(2, vec(3))], "vec_id long, v array<double>")
    e1 = spark.createDataFrame(
        [(3, vec(6))], "vec_id long, v array<double>")

    sidx = StoredSignatureIndex(spark, str(tmp_path / "sig"), dim=8,
                                id_col="vec_id", vec_col="v",
                                threshold=0.98)
    sidx.build(base)
    for e, b in ((0, e0), (1, e1)):
        bv = sidx._vec_rows(b)
        sidx.append_frames(bv, sidx.signature_frame(bv), epoch_id=e)
    probe = spark.createDataFrame(
        [(10, vec(0)), (11, vec(3)), (12, vec(6))],
        "vec_id long, v array<double>")
    full = {(r.new_id, r.old_id) for r in sidx.probe(probe).collect()}
    assert full == {(10, 1), (11, 2), (12, 3)}
    asof0 = {(r.new_id, r.old_id)
             for r in sidx.probe(probe, as_of_epoch=0).collect()}
    assert asof0 == {(10, 1), (11, 2)}

    ividx = StoredIvfIndex(spark, str(tmp_path / "ivf"), n_cells=2,
                           id_col="vec_id", vec_col="v")
    ividx.build(base.unionByName(e0))
    ividx.append(e1, epoch_id=1)
    got_full = {r.vec_id for r in ividx.probe_batch(
        spark.createDataFrame([(99, vec(6))],
                              "vec_id long, v array<double>"),
        k=3, nprobe=2).collect()}
    assert 3 in got_full
    got_asof = {r.vec_id for r in ividx.probe_batch(
        spark.createDataFrame([(99, vec(6))],
                              "vec_id long, v array<double>"),
        k=3, nprobe=2, as_of_epoch=0).collect()}
    assert 3 not in got_asof and got_asof  # epoch-1 vector pruned


def test_pq_index_compact_and_retract_keep_codes(spark, tmp_path):
    """The PQ columns survive the lifecycle verbs: compact folds
    append accretion without touching codes (ADC probe byte-identical
    across it), and retract removes exactly the requested vectors
    from the coded rows — including under a subsequent as-of probe
    (takedown overrides time-travel on this asset too)."""
    from industrial_data_pipeline_spark.operators.similarity import (
        StoredIvfIndex)

    def vec(seed):
        return [float((seed * 13 + d * 7) % 19) for d in range(8)]

    base = spark.createDataFrame(
        [(i, vec(i)) for i in range(30)],
        "vec_id long, v array<double>")
    idx = StoredIvfIndex(spark, str(tmp_path / "ivf"), id_col="vec_id",
                         vec_col="v", n_cells=4, pq_m=2, pq_k=4)
    idx.build(base)
    extra = spark.createDataFrame(
        [(100 + i, vec(100 + i)) for i in range(3)],
        "vec_id long, v array<double>")
    idx.append(extra, epoch_id=0)
    qs = base.where("vec_id < 2")
    before_files = idx.file_count()
    before = sorted(map(tuple, idx.probe_batch_adc(
        qs, k=5, nprobe=2, rerank=20).collect()))
    stats = idx.compact()
    assert stats["files_after"] < before_files
    after = sorted(map(tuple, idx.probe_batch_adc(
        qs, k=5, nprobe=2, rerank=20).collect()))
    assert after == before
    victim = before[0][1]  # a vec_id the probe currently returns
    idx.retract([victim])
    post = {r.vec_id for r in idx.probe_batch_adc(
        qs, k=5, nprobe=2, rerank=20).collect()}
    assert victim not in post and post
    reopened = StoredIvfIndex.open(spark, str(tmp_path / "ivf"))
    post2 = {r.vec_id for r in reopened.probe_batch_adc(
        qs, k=5, nprobe=2, rerank=20, as_of_epoch=0).collect()}
    assert victim not in post2


def _seq_vec(seed, dim=8, shift=0.0):
    return [float((seed * 13 + d * 7) % 19) + shift
            for d in range(dim)]


def test_residual_adc_full_rerank_equals_exact(spark, tmp_path):
    """Residual-PQ two-stage probe with rerank >= corpus must equal
    the exact probe_batch row-for-row (stage 2 re-ranks EVERYTHING
    the stage-1 shortlist admits, and with rerank = |corpus| the
    shortlist is every probed-cell row): the decomposed numerator
    ⟨q,c_cell⟩ + Σ⟨q_s,r̃_s⟩ may approximate, but the CANDIDATE SET
    and the exact re-rank may not — this pins the plumbing (cell
    routing, residual encode, cdot join) independent of recall."""
    from industrial_data_pipeline_spark.operators.similarity import (
        StoredIvfIndex)

    base = spark.createDataFrame(
        [(i, _seq_vec(i)) for i in range(40)],
        "vec_id long, v array<double>")
    idx = StoredIvfIndex(spark, str(tmp_path / "rivf"),
                         id_col="vec_id", vec_col="v", n_cells=4,
                         pq_m=2, pq_k=4, pq_residual=True)
    idx.build(base)
    qs = base.where("vec_id < 3")
    exact = sorted(map(tuple, idx.probe_batch(
        qs, k=5, nprobe=4).collect()))
    adc = sorted(map(tuple, idx.probe_batch_adc(
        qs, k=5, nprobe=4, rerank=40).collect()))
    assert adc == exact


def test_residual_index_lifecycle_and_drift(spark, tmp_path):
    """Residual index end-to-end: append a SHIFTED epoch (the q273
    drift scenario) — quantization_drift (measured against the
    residual reconstruction) jumps on that epoch; rebuild() retrains
    centroids + codebook on the full corpus, folds epochs to history
    and the drift audit collapses to ONE epoch whose mean error sits
    far below the pre-rebuild shifted epoch's; probes keep working
    and a reopened handle sees the retrained meta."""
    from industrial_data_pipeline_spark.operators.similarity import (
        StoredIvfIndex)

    base = spark.createDataFrame(
        [(i, _seq_vec(i)) for i in range(30)],
        "vec_id long, v array<double>")
    shifted = spark.createDataFrame(
        [(100 + i, _seq_vec(100 + i, shift=40.0)) for i in range(10)],
        "vec_id long, v array<double>")
    idx = StoredIvfIndex(spark, str(tmp_path / "rivf"),
                         id_col="vec_id", vec_col="v", n_cells=4,
                         pq_m=2, pq_k=4, pq_residual=True)
    idx.build(base)
    idx.append(shifted, epoch_id=0)
    pre = {r.epoch: r.mean_err
           for r in idx.quantization_drift().collect()}
    assert pre[0] > pre[-1] * 5, pre  # the drift signal fires
    old_cb = list(idx.pq_codebook)
    idx.rebuild()
    assert idx.pq_codebook != old_cb  # actually retrained
    post = {r.epoch: r.mean_err
            for r in idx.quantization_drift().collect()}
    assert set(post) == {-1}          # epochs folded
    assert post[-1] < pre[0] / 2      # retrain absorbed the shift
    qs = shifted.where("vec_id < 103")
    rows = idx.probe_batch_adc(qs, k=5, nprobe=4,
                               rerank=40).collect()
    assert {r.query_id for r in rows} == {100, 101, 102}
    reopened = StoredIvfIndex.open(spark, str(tmp_path / "rivf"))
    assert reopened.pq_residual is True
    # JSON round-trips tuples as lists; compare values
    assert [[s, c, list(cq)] for s, c, cq in reopened.pq_codebook] \
        == [[s, c, list(cq)] for s, c, cq in idx.pq_codebook]
    rows2 = reopened.probe_batch_adc(qs, k=5, nprobe=4,
                                     rerank=40).collect()
    assert sorted(map(tuple, rows2)) == sorted(map(tuple, rows))


def test_sq_full_rerank_equals_exact_and_composes_with_pq(
        spark, tmp_path):
    """int8-SQ tier plumbing pinned independent of its accuracy:
    with rerank >= corpus, probe_batch_sq must equal the exact
    probe_batch row-for-row (shared _exact_rerank seals stage 2);
    and the tiers COMPOSE — one asset built with pq_residual AND
    sq_int8 serves probe_batch, probe_batch_adc and probe_batch_sq,
    surviving append + compact + reopen."""
    from industrial_data_pipeline_spark.operators.similarity import (
        StoredIvfIndex)

    base = spark.createDataFrame(
        [(i, _seq_vec(i)) for i in range(40)],
        "vec_id long, v array<double>")
    idx = StoredIvfIndex(spark, str(tmp_path / "sq"),
                         id_col="vec_id", vec_col="v", n_cells=4,
                         pq_m=2, pq_k=4, pq_residual=True,
                         sq_int8=True)
    idx.build(base)
    extra = spark.createDataFrame(
        [(100 + i, _seq_vec(100 + i)) for i in range(5)],
        "vec_id long, v array<double>")
    idx.append(extra, epoch_id=0)
    qs = base.where("vec_id < 3")
    exact = sorted(map(tuple, idx.probe_batch(
        qs, k=5, nprobe=4).collect()))
    sq = sorted(map(tuple, idx.probe_batch_sq(
        qs, k=5, nprobe=4, rerank=45).collect()))
    assert sq == exact
    adc = sorted(map(tuple, idx.probe_batch_adc(
        qs, k=5, nprobe=4, rerank=45).collect()))
    assert adc == exact
    idx.compact()
    assert sorted(map(tuple, idx.probe_batch_sq(
        qs, k=5, nprobe=4, rerank=45).collect())) == exact
    reopened = StoredIvfIndex.open(spark, str(tmp_path / "sq"))
    assert reopened.sq_int8 and reopened.pq_residual
    assert sorted(map(tuple, reopened.probe_batch_sq(
        qs, k=5, nprobe=4, rerank=45).collect())) == exact
    # stage-1 scan reads the int8 columns, never the vector
    plan = reopened.last_sq_scan._jdf.queryExecution() \
        .executedPlan().toString()
    assert "q8" in plan and "ReadSchema" in plan


def test_filtered_probe_and_rebuild_carry_extras(spark, tmp_path):
    """extra_schema metadata columns: the filtered probe_batch is a
    PRE-filter (every neighbor shares its query's label; full k
    when the stratum allows), the filter composes with append, and
    rebuild() re-routes WITHOUT dropping the extra or tier columns
    (a rebuild that lost `label`/`q8` would break the next filtered
    or SQ probe's declared read schema)."""
    from industrial_data_pipeline_spark.operators.similarity import (
        StoredIvfIndex)

    base = spark.createDataFrame(
        [(i, _seq_vec(i), i % 3) for i in range(36)],
        "vec_id long, v array<double>, label int")
    idx = StoredIvfIndex(spark, str(tmp_path / "fivf"),
                         id_col="vec_id", vec_col="v", n_cells=4,
                         sq_int8=True, extra_schema="label int")
    idx.build(base)
    extra = spark.createDataFrame(
        [(100 + i, _seq_vec(100 + i), i % 3) for i in range(6)],
        "vec_id long, v array<double>, label int")
    idx.append(extra, epoch_id=0)
    qs = base.where("vec_id < 3")
    out = idx.probe_batch(qs, k=5, nprobe=4,
                          filter_col="label").collect()
    qlabel = {r.vec_id: r.label for r in qs.collect()}
    vlabel = {r.vec_id: r.label
              for r in base.unionByName(extra).collect()}
    by_q = {}
    for r in out:
        assert vlabel[r.vec_id] == qlabel[r.query_id]  # pre-filter
        assert r.vec_id != r.query_id
        by_q.setdefault(r.query_id, []).append(r)
    for qid, rs in by_q.items():
        stratum = sum(1 for v, l in vlabel.items()
                      if l == qlabel[qid] and v != qid)
        assert len(rs) == min(5, stratum)
    before = sorted(map(tuple, out))
    idx.rebuild()
    after = sorted(map(tuple, idx.probe_batch(
        qs, k=5, nprobe=4, filter_col="label").collect()))
    # same corpus, refine_iters=0 -> same seeds/routing: identical
    assert after == before
    # SQ tier survived the rebuild rewrite
    sq = sorted(map(tuple, idx.probe_batch_sq(
        qs, k=5, nprobe=4, rerank=42).collect()))
    exact = sorted(map(tuple, idx.probe_batch(
        qs, k=5, nprobe=4).collect()))
    assert sq == exact


def test_filtered_two_stage_probes_equal_filtered_exact(
        spark, tmp_path):
    """The filter x tier matrix closes: with rerank >= corpus, the
    filtered ADC and filtered SQ two-stage probes must equal the
    filtered exact probe row-for-row — the shared _apply_filter
    lands BEFORE each stage-1 shortlist, so the rerank budget is
    spent inside the stratum (a post-filter at equal rerank could
    return fewer than k)."""
    from industrial_data_pipeline_spark.operators.similarity import (
        StoredIvfIndex)

    base = spark.createDataFrame(
        [(i, _seq_vec(i), i % 2) for i in range(40)],
        "vec_id long, v array<double>, label int")
    idx = StoredIvfIndex(spark, str(tmp_path / "fm"),
                         id_col="vec_id", vec_col="v", n_cells=4,
                         pq_m=2, pq_k=4, pq_residual=True,
                         sq_int8=True, extra_schema="label int")
    idx.build(base)
    qs = base.where("vec_id < 3")
    exact = sorted(map(tuple, idx.probe_batch(
        qs, k=5, nprobe=4, filter_col="label").collect()))
    adc = sorted(map(tuple, idx.probe_batch_adc(
        qs, k=5, nprobe=4, rerank=40,
        filter_col="label").collect()))
    sq = sorted(map(tuple, idx.probe_batch_sq(
        qs, k=5, nprobe=4, rerank=40,
        filter_col="label").collect()))
    assert adc == exact and sq == exact
    # every neighbor shares its query's label
    lab = {r.vec_id: r.label for r in base.collect()}
    for qid_, vid, _cs, _rk in exact:
        assert lab[vid] == lab[qid_]


def test_extra_schema_parses_parameterized_types(spark, tmp_path):
    """Review r11: extra_cols must split the DDL fragment on
    TOP-LEVEL commas only — decimal(p,s)/map<k,v>/struct types are
    legal in extra_schema (DATA_SCHEMA embeds it verbatim)."""
    from industrial_data_pipeline_spark.operators.similarity import (
        StoredIvfIndex)

    idx = StoredIvfIndex(
        spark, str(tmp_path / "x"),
        extra_schema=("price decimal(10,2), tags map<string,int>, "
                      "label int"))
    assert idx.extra_cols == ["price", "tags", "label"]
    assert "decimal(10,2)" in idx.DATA_SCHEMA


def test_probe_coverage_consistent_with_probe(spark, tmp_path):
    """probe_coverage's claims are consistent with what the probe
    actually does: covered_rows equals the candidate rows the
    batch probe scans for that query (+1 when the query's own
    stored twin sits in a probed cell — the probe self-excludes),
    and whenever top1_in_probe is True the probe's rank-1 equals
    the exact corpus-wide top-1."""
    from pyspark.sql import Window, functions as FF

    from industrial_data_pipeline_spark.operators.similarity import (
        StoredIvfIndex, _rank_exact_cosine)

    base = spark.createDataFrame(
        [(i, _seq_vec(i)) for i in range(40)],
        "vec_id long, v array<double>")
    idx = StoredIvfIndex(spark, str(tmp_path / "cov"),
                         id_col="vec_id", vec_col="v", n_cells=4)
    idx.build(base)
    qs = base.where("vec_id < 4")
    cov = {r.query_id: r for r in
           idx.probe_coverage(qs, nprobe=2).collect()}
    assert set(cov) == {0, 1, 2, 3}
    total = base.count()
    for r in cov.values():
        assert r.total_rows == total
        assert r.n_probed_cells == 2
        assert 0 < r.covered_rows <= total
    # exact corpus-wide top-1 per query
    exact1 = {r.query_id: r.vec_id for r in
              idx.probe_batch(qs, k=1, nprobe=4).collect()
              if r.rk == 1}
    probe1 = {r.query_id: r.vec_id for r in
              idx.probe_batch(qs, k=1, nprobe=2).collect()
              if r.rk == 1}
    for qid, r in cov.items():
        if r.top1_in_probe:
            assert probe1[qid] == exact1[qid], qid


def test_min_results_guarantees_k_filtered(spark, tmp_path):
    """VERDICT r11 item 1 — guaranteed-k filtered ANN. A rare
    stratum (label 1: three rows) and a tight nprobe make the plain
    pre-filter under-deliver; min_results=k must return
    min(k, |stratum| − self) rows for EVERY query, on all three
    tiers (exact / ADC / int8-SQ), via both escalation paths:
    brute-force-the-stratum (default threshold — small strata) and
    prefix widening (threshold 0)."""
    from industrial_data_pipeline_spark.operators.similarity import (
        StoredIvfIndex)

    n, k = 60, 5
    base = spark.createDataFrame(
        [(i, _seq_vec(i), 1 if i % 20 == 0 else 0)
         for i in range(n)],
        "vec_id long, v array<double>, label int")
    idx = StoredIvfIndex(spark, str(tmp_path / "gk"),
                         id_col="vec_id", vec_col="v", n_cells=6,
                         pq_m=2, pq_k=4, sq_int8=True,
                         extra_schema="label int")
    idx.build(base)
    strata = {0: n - 3, 1: 3}
    # queries 0 (rare label 1) and 1, 2 (common label 0)
    qs = base.where("vec_id < 3")

    def counts(df):
        out = {}
        for r in df.collect():
            out[r.query_id] = out.get(r.query_id, 0) + 1
        return out

    lab = {0: 1, 1: 0, 2: 0}
    # each query's own stored row is in its stratum and the probe
    # self-excludes, so deliverable capacity is |stratum| − 1
    want = {q: min(k, strata[lab[q]] - 1) for q in lab}

    # guaranteed: exact tier, brute path (default threshold)
    gk = idx.probe_batch(qs, k=k, nprobe=1, filter_col="label",
                         min_results=k)
    assert counts(gk) == want
    # every neighbor shares its query's label
    blab = {r.vec_id: r.label for r in base.collect()}
    for r in gk.collect():
        assert blab[r.vec_id] == lab[r.query_id]
    # brute path == exact top-k over the stratum (all cells probed)
    full = idx.probe_batch(qs, k=k, nprobe=6, filter_col="label")
    assert sorted(map(tuple, gk.collect())) == \
        sorted(map(tuple, full.collect()))

    # guaranteed: prefix-escalation path (threshold 0 disables the
    # brute shortcut) still delivers full counts
    esc = idx.probe_batch(qs, k=k, nprobe=1, filter_col="label",
                          min_results=k, brute_force_threshold=0)
    assert counts(esc) == want

    # ADC and SQ tiers: same guarantee, same rows as the exact tier
    # on the brute path with rerank ≥ stratum
    adc = idx.probe_batch_adc(qs, k=k, nprobe=1, rerank=60,
                              filter_col="label", min_results=k)
    sq = idx.probe_batch_sq(qs, k=k, nprobe=1, rerank=60,
                            filter_col="label", min_results=k)
    assert sorted(map(tuple, adc.collect())) == \
        sorted(map(tuple, gk.collect()))
    assert sorted(map(tuple, sq.collect())) == \
        sorted(map(tuple, gk.collect()))

    # and WITHOUT min_results the rare stratum really does
    # under-deliver at nprobe=1 (the gap this feature closes) —
    # otherwise the test proves nothing
    plain = counts(idx.probe_batch(qs, k=k, nprobe=1,
                                   filter_col="label"))
    assert any(plain.get(q, 0) < want[q] for q in want), plain


def test_adc_cross_epoch_duplicate_id(spark, tmp_path):
    """ADVICE r11: exactly-once dedup is per-epoch, so the same
    vec_id appended in a LATER epoch with a different vector is a
    legitimate second stored row (possibly in a different cell).
    probe_batch surfaces it as two candidate rows; probe_batch_adc
    used to groupBy (query_id, vec_id) and blend the two rows' code
    explosions into one garbage numerator. The group key is now the
    stored row (vec_id, _cell, _epoch) and the shortlist dedups, so
    ADC must agree with the exact probe row-for-row."""
    from industrial_data_pipeline_spark.operators.similarity import (
        StoredIvfIndex)

    base = spark.createDataFrame(
        [(i, _seq_vec(i)) for i in range(24)],
        "vec_id long, v array<double>")
    idx = StoredIvfIndex(spark, str(tmp_path / "dup"),
                         id_col="vec_id", vec_col="v", n_cells=4,
                         pq_m=2, pq_k=4)
    idx.build(base)
    # re-append id 5 with a very different vector
    dup = base.where("vec_id = 20").selectExpr(
        "CAST(5 AS LONG) AS vec_id", "transform(v, x -> -x) AS v")
    idx.append(dup, epoch_id=0)
    qs = base.where("vec_id < 2")
    exact = sorted(map(tuple, idx.probe_batch(
        qs, k=30, nprobe=4).collect()))
    adc = sorted(map(tuple, idx.probe_batch_adc(
        qs, k=30, nprobe=4, rerank=60).collect()))
    assert adc == exact
    # and the duplicate id really is TWO candidate rows per query
    per_q: dict = {}
    for qid, vid, _cs, _rk in exact:
        per_q.setdefault(qid, []).append(vid)
    for qid, vids in per_q.items():
        assert vids.count(5) == 2, (qid, vids)


def test_rebuild_crash_window_detected(spark, tmp_path, monkeypatch):
    """VERDICT r11 item 4 / ADVICE r11: a rebuild that dies between
    its data swap and its meta replace leaves NEW data (re-routed,
    re-encoded against the retrained codebook) under OLD meta — for
    a PQ index that mis-ranks ADC shortlists, not just recall. The
    routing fingerprint stamped into the staged dir INSIDE the swap
    makes the state detectable: a fresh open() raises
    RoutingMismatchError instead of serving corrupt probes, and
    re-running rebuild() (idempotent) is the repair."""
    import pytest

    from industrial_data_pipeline_spark.operators.similarity import (
        RoutingMismatchError, StoredIvfIndex)

    base = spark.createDataFrame(
        [(i, _seq_vec(i)) for i in range(40)],
        "vec_id long, v array<double>")
    root = str(tmp_path / "fsck")
    idx = StoredIvfIndex(spark, root, id_col="vec_id", vec_col="v",
                         n_cells=4, pq_m=2, pq_k=4,
                         pq_residual=True)
    idx.build(base)
    healthy = StoredIvfIndex.open(spark, root).verify()
    assert healthy["ok"] and healthy["stamped"]

    # drift the corpus so the retrained codebook differs, then
    # crash the rebuild at exactly the window: after the fenced
    # data swap, before the meta replace
    idx.append(base.selectExpr(
        "vec_id + 100 AS vec_id",
        "transform(v, x -> x * 3.0 + 1.0) AS v"), epoch_id=0)

    def _boom(self):
        raise OSError("simulated crash before meta replace")

    monkeypatch.setattr(StoredIvfIndex, "_write_meta", _boom)
    with pytest.raises(OSError):
        idx.rebuild()
    monkeypatch.undo()

    # the crashed process itself still holds the retrained state in
    # memory — ITS probes stay consistent with the swapped data
    assert idx.verify()["ok"]
    # but a fresh open() reads OLD meta over NEW data: detected
    with pytest.raises(RoutingMismatchError):
        StoredIvfIndex.open(spark, root)
    # repair recipe from the error: reopen unverified, rebuild again
    repaired = StoredIvfIndex.open(spark, root, verify_routing=False)
    repaired.rebuild()
    assert StoredIvfIndex.open(spark, root).verify()["ok"]


def test_cell_balance_and_recall_curve(spark, tmp_path):
    """cell_balance (q291): counts empty cells against the full
    0..n_cells-1 range and computes the FAISS imbalance factor
    exactly; recall_curve (q292): recall is 1.0 by construction
    when nprobe = n_cells and non-decreasing in nprobe."""
    from industrial_data_pipeline_spark.operators.similarity import (
        StoredIvfIndex)

    a = [1.0, 0.0, 0.0, 0.0]
    b = [0.0, 1.0, 0.0, 0.0]
    base = spark.createDataFrame(
        [(0, a), (1, a), (2, b), (3, b)],
        "vec_id long, v array<double>")
    idx = StoredIvfIndex(spark, str(tmp_path / "bal"),
                         id_col="vec_id", vec_col="v", n_cells=4)
    idx.build(base)
    # duplicate seeds tie-route to the lower cell: 0 and 2 hold 2
    # rows each, 1 and 3 are empty
    r = idx.cell_balance().collect()[0]
    assert (r.n_cells_total, r.n_cells_empty) == (4, 2)
    assert (r.total_rows, r.max_cell_rows) == (4, 2)
    assert r.imbalance == 2.0

    big = spark.createDataFrame(
        [(i, _seq_vec(i)) for i in range(40)],
        "vec_id long, v array<double>")
    idx2 = StoredIvfIndex(spark, str(tmp_path / "rc"),
                          id_col="vec_id", vec_col="v", n_cells=4)
    idx2.build(big)
    qs = big.where("vec_id < 4")
    curve = {r.nprobe: r for r in
             idx2.recall_curve(qs, k=5, nprobes=(1, 2, 4))
             .collect()}
    assert curve[4].recall == 1.0          # all cells = exact
    assert curve[4].n_truth == 4 * 5
    assert (curve[1].recall <= curve[2].recall
            <= curve[4].recall)


def test_drift_rebuild_policy_mechanics(spark, tmp_path):
    """DriftRebuildPolicy (q289): a same-distribution epoch leaves
    the policy quiet; a planted-shift epoch ARMS it (after_append,
    never an inline rebuild — the appended epoch is still in
    flight); the armed rebuild FIRES at the next batch boundary
    (before_append) exactly once, records its trigger, and the
    rebuilt index routes by the post-drift corpus' lowest-id
    seeds."""
    from industrial_data_pipeline_spark.operators.similarity import (
        DriftRebuildPolicy, StoredIvfIndex)

    base = spark.createDataFrame(
        [(i, _seq_vec(i)) for i in range(16, 60)],
        "vec_id long, v array<double>")
    idx = StoredIvfIndex(spark, str(tmp_path / "pol"),
                         id_col="vec_id", vec_col="v", n_cells=4,
                         pq_m=2, pq_k=4, pq_residual=True)
    idx.build(base)
    policy = DriftRebuildPolicy(idx, ratio=4.0)

    # batch 0: same distribution — evaluate, stay quiet
    assert policy.before_append() is False
    idx.append(spark.createDataFrame(
        [(i, _seq_vec(i)) for i in range(16)],
        "vec_id long, v array<double>"), epoch_id=0)
    assert policy.after_append() is False and not policy.pending

    # batch 1: planted drift (x*9 + 40) — arms, does NOT rebuild yet
    assert policy.before_append() is False
    idx.append(spark.createDataFrame(
        [(i, [x * 9.0 + 40.0 for x in _seq_vec(i)])
         for i in range(60, 80)],
        "vec_id long, v array<double>"), epoch_id=1)
    assert policy.after_append() is True and policy.pending
    assert policy.fired == 0          # in-flight epoch untouched
    trigger_epoch, ratio = policy.last_trigger
    assert trigger_epoch == 1 and (ratio is None or ratio > 4.0)

    # batch 2 boundary: the armed rebuild fires exactly once
    assert policy.before_append() is True
    assert policy.fired == 1 and not policy.pending
    assert policy.before_append() is False   # no double fire
    # post-rebuild: seeds are the corpus' lowest ids (0..3), the
    # asset folded to history, fingerprint consistent
    assert idx.centroids[0] == _seq_vec(0)
    assert idx.verify()["ok"]
    # and the rebuilt index still probes exactly (vs brute force)
    qs = base.where("vec_id < 20")
    got = idx.probe_batch(qs, k=3, nprobe=4)
    assert got.where("rk = 1").count() == qs.count()


def test_fingerprint_survives_compact_and_retract(spark, tmp_path):
    """compact/retract rewrite the data dir through the same fenced
    swap — the stamp hook must re-stamp the (unchanged) routing
    fingerprint into the staged dir or every compaction would strand
    the asset unverifiable."""
    from industrial_data_pipeline_spark.operators.similarity import (
        StoredIvfIndex)

    base = spark.createDataFrame(
        [(i, _seq_vec(i)) for i in range(30)],
        "vec_id long, v array<double>")
    idx = StoredIvfIndex(spark, str(tmp_path / "fp"),
                         id_col="vec_id", vec_col="v", n_cells=4)
    idx.build(base)
    fp = idx.stored_fingerprint()
    assert fp == idx.routing_fingerprint()
    idx.append(base.selectExpr("vec_id + 50 AS vec_id", "v"),
               epoch_id=0)
    idx.compact()
    assert idx.stored_fingerprint() == fp and idx.verify()["ok"]
    idx.retract([3, 7])
    assert idx.stored_fingerprint() == fp and idx.verify()["ok"]


def test_probe_coverage_counts_empty_probed_cells(spark, tmp_path):
    """ADVICE r11: probed-but-EMPTY cells still count in
    n_probed_cells (the docstring's 'how many distinct cells it
    probes'), and a query whose probed cells are ALL empty still
    emits a row with covered_rows 0 instead of vanishing — the old
    inner join to the per-cell counts dropped both.

    Construction: duplicate seed vectors tie-route every row to the
    LOWER duplicate cell (argmax ties → lowest index), so cells 1
    and 3 are born empty; the all-empty case additionally empties
    cell 0 the way a retraction would (removing its partition
    directory)."""
    import shutil

    from industrial_data_pipeline_spark.operators.similarity import (
        StoredIvfIndex)

    a = [1.0, 0.0, 0.0, 0.0]
    b = [0.0, 1.0, 0.0, 0.0]
    base = spark.createDataFrame(
        [(0, a), (1, a), (2, b), (3, b)],
        "vec_id long, v array<double>")
    idx = StoredIvfIndex(spark, str(tmp_path / "emp"),
                         id_col="vec_id", vec_col="v", n_cells=4)
    idx.build(base)
    qs = spark.createDataFrame([(100, a)],
                               "vec_id long, v array<double>")
    # query a: centroid cosines (1, 1, 0, 0), ties → cells [0, 1];
    # cell 1 is empty (its rows tie-routed to cell 0)
    row = idx.probe_coverage(qs, nprobe=2).collect()[0]
    assert row.n_probed_cells == 2, row
    assert row.covered_rows == 2 and row.total_rows == 4
    assert row.coverage == 0.5 and row.top1_in_probe

    # empty cell 0 too (retraction-shaped): BOTH probed cells empty
    # -> the query must still emit a row, covered_rows 0
    shutil.rmtree(tmp_path / "emp" / "cells" / "_epoch=-1"
                  / "_cell=0")
    row = idx.probe_coverage(qs, nprobe=2).collect()[0]
    assert row.n_probed_cells == 2, row
    assert row.covered_rows == 0 and row.total_rows == 2
    assert row.coverage == 0.0 and not row.top1_in_probe


def test_build_evaluates_caller_expression_boundedly(spark, tmp_path):
    """Optimization r14 pin: StoredIvfIndex.build materializes the
    routed rows ONCE, so the caller's (possibly expensive) vector
    expression is evaluated a BOUNDED number of times per row — the
    kmeans seed collect plus the one checkpoint pass (= 2), never the
    pre-r14 3+ (range-boundary sampling and the write each re-ran the
    full plan). Counted via a side-effect file written by a pandas
    UDF feeding the vector column."""
    import glob
    import os

    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    from industrial_data_pipeline_spark.operators.similarity import (
        StoredIvfIndex)

    marker_dir = str(tmp_path / "evals")
    os.makedirs(marker_dir)

    def _vec(ids):
        import os as _os
        import uuid
        with open(os.path.join(marker_dir,
                               f"{uuid.uuid4().hex}.cnt"), "w") as fh:
            fh.write(str(len(ids)))
        return pd.Series([[float(i % 5), 1.0, 0.0, float(i % 3)]
                          for i in ids])

    _vec.__annotations__ = {"ids": pd.Series, "return": pd.Series}
    u = pandas_udf(_vec, "array<double>")
    base = (spark.range(40).toDF("vec_id")
            .repartition(4)
            .select("vec_id", u(F.col("vec_id")).alias("v"))
            )
    idx = StoredIvfIndex(spark, str(tmp_path / "idx"),
                         id_col="vec_id", vec_col="v", n_cells=4)
    idx.build(base)
    rows_evaluated = 0
    for path in glob.glob(os.path.join(marker_dir, "*.cnt")):
        with open(path) as fh:
            rows_evaluated += int(fh.read())
    # 40 rows: one pass for the seed collect + one for the routed-row
    # checkpoint = at most 2 evaluations/row (sampling + write would
    # push this to 3-4x)
    assert rows_evaluated <= 2 * 40, rows_evaluated
    # and the built asset still probes correctly end to end
    qs = spark.createDataFrame([(100, [1.0, 1.0, 0.0, 1.0])],
                               "vec_id long, v array<double>")
    out = idx.probe_batch(qs, k=3, nprobe=4).collect()
    assert len(out) == 3
