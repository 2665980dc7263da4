"""Hand-computed semantics for operators/vectors.py (the suite-level
DuckDB parity is covered by test_suite_oracle q81–q84)."""

import math

from industrial_data_pipeline_spark.operators.vectors import (
    kmeans_lloyd, label_cohesion, neighbor_confusion, quantization_error)


def test_kmeans_two_obvious_clusters(spark):
    # ids 0,1 near the origin; 2,3 near (10,10) — k=2 must split them
    # and converge in one iteration (init = ids 0 and 1).
    rows = [(0, [0.0, 0.0]), (1, [1.0, 1.0]),
            (2, [10.0, 10.0]), (3, [11.0, 11.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r.cluster: r for r in
           kmeans_lloyd(df, k=2, iters=2).collect()}
    assert set(out) == {0, 1}
    # iter 1 pulls cluster 1's centroid toward (10,10); iter 2 then
    # assigns {0,1} to cluster 0 and {2,3} to cluster 1.
    assert out[0].n_points == 2 and out[1].n_points == 2
    # cluster 0: d2 = 0 + 2 = 2 exactly (vs centroid (0,0))
    assert abs(out[0].inertia - 2.0) < 1e-6


def test_quantization_error_zero_for_representable(spark):
    # components are exact multiples of max/127 → zero reconstruction
    # error; a second label with a non-representable value is > 0.
    rows = [(0, [127.0, -127.0, 0.0], 1), (1, [0.3, 0.1, 0.2], 2)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int")
    out = {r.label: r for r in quantization_error(df).collect()}
    assert out[1].avg_quant_err == 0.0
    assert out[2].avg_quant_err > 0.0
    assert out[2].max_quant_err >= out[2].avg_quant_err


def test_label_cohesion_identical_vectors(spark):
    # identical members → centroid == member → cosine exactly 1
    rows = [(0, [1.0, 2.0], 7), (1, [1.0, 2.0], 7),
            (2, [1.0, 0.0], 8), (3, [0.0, 1.0], 8)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int")
    out = {r.label: r for r in label_cohesion(df).collect()}
    assert out[7].avg_cos == 1.0 and out[7].n_vecs == 2
    # orthogonal pair: centroid (.5,.5), cos(v, c) = cos 45° each
    assert abs(out[8].avg_cos - round(1 / math.sqrt(2), 6)) < 1e-6


def test_neighbor_confusion_matches_geometry(spark):
    # query id 0 (label A) sits next to id 1 (label A); id 20
    # (label B) sits next to id 21 (label B) — diagonal confusion.
    rows = [(0, [1.0, 0.0], 1), (1, [0.9, 0.1], 1),
            (20, [0.0, 1.0], 2), (21, [0.1, 0.9], 2)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int")
    got = {(r.q_label, r.n_label): r.n_queries
           for r in neighbor_confusion(df, every=20).collect()}
    assert got == {(1, 1): 1, (2, 2): 1}


def test_semantic_dedup_recall_vs_bruteforce(spark):
    """SemDeDup finds every within-cell near-dup pair; on the planted
    corpus (perturbed twins land in the same cell) recall vs brute
    force must be total, and every reported pair must be a brute
    force pair (precision 1 by construction — same cosine, same
    threshold)."""
    from industrial_data_pipeline_spark.operators.similarity import (
        cosine_pairs_bruteforce)
    from industrial_data_pipeline_spark.operators.vectors import (
        semantic_dedup_pairs)
    from industrial_data_pipeline_spark.suite_llm import _emb_dup_corpus
    from industrial_data_pipeline_spark.operators.vectors import (
        kmeans_assign)
    corpus = _emb_dup_corpus(spark, "/root/testdata/sf0.001")
    brute = {(r.id_a, r.id_b) for r in
             cosine_pairs_bruteforce(corpus, threshold=0.9).collect()}
    sem = {(r.id_a, r.id_b) for r in
           semantic_dedup_pairs(corpus, k=4, iters=2,
                                threshold=0.9).collect()}
    assert brute, "planted corpus must produce near-dup pairs"
    # exact contract: sem == the same-cell subset of the brute pairs
    # (precision 1; the ONLY misses are cross-cell — the documented
    # SemDeDup recall trade)
    cell = {r.vec_id: r.cluster for r in
            kmeans_assign(corpus, k=4, iters=2).collect()}
    same_cell = {(a, b) for a, b in brute if cell[a] == cell[b]}
    assert sem == same_cell
    # at k=4 on this corpus the split-twin fraction is modest; the
    # measured recall (250/300 here) must stay in a sane band
    assert len(sem) / len(brute) >= 0.7


def test_lloyd_seeds_k_lowest_ids_any_id_space(spark):
    """k-means must seed k centroids from the k LOWEST ids even when
    the id space does not start at zero (the old `_id < k` filter
    produced zero centroids and silently empty output)."""
    from industrial_data_pipeline_spark.operators.vectors import (
        kmeans_assign)
    rows = [(1000 + i, [float(i % 4), float((i * 7) % 5)])
            for i in range(40)]
    df = spark.createDataFrame(rows,
                               "vec_id long, embedding array<double>")
    out = kmeans_assign(df, k=4, iters=2)
    assert out.count() == 40
    assert out.select("cluster").distinct().count() >= 2


def test_pq_roundtrip_on_separated_clusters(spark):
    """PQ on data that IS its codebook: 4 well-separated groups per
    subspace; with one refinement iteration the codebook converges
    to the group means, every member encodes to its group's code,
    and ADC ranks a query's own group first — exact recall when
    quantization error is within-group noise."""
    from industrial_data_pipeline_spark.operators.vectors import (
        pq_adc_topk, pq_encode, pq_train)

    # 8 dims, m=2 subspaces of 4; vectors cluster by (id % 4)
    def vec(i):
        g = i % 4
        bump = 0.001 * (i // 4)  # tiny within-group jitter
        return [10.0 * g + bump if d % 4 == 0 else float(g)
                for d in range(8)]

    rows = [(i, vec(i)) for i in range(16)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cb = pq_train(df, dim=8, m=2, k=4, iters=1)
    cbr = cb.collect()
    assert {r.subspace for r in cbr} == {0, 1}
    assert all(len(r._cq) == 4 for r in cbr)
    codes = pq_encode(df, cb, dim=8, m=2)
    by_vec = {}
    for r in codes.collect():
        by_vec.setdefault(r._id, {})[r.subspace] = r.code
    assert all(len(v) == 2 for v in by_vec.values())
    # same group -> same code word in every subspace
    for i in range(16):
        for j in range(16):
            if i % 4 == j % 4:
                assert by_vec[i] == by_vec[j], (i, j, by_vec)
    # ADC: query 0's nearest by code distance are its own group
    top = pq_adc_topk(codes, cb,
                      df.where("vec_id = 0"), dim=8, m=2, k_top=3)
    got = {r.vec_id for r in top.collect()}
    assert got == {4, 8, 12}, got


def test_pq_train_deterministic(spark):
    """Two trainings over the same frame produce the identical
    quantized codebook (seeded init, scaled-int argmin, DECIMAL
    means — no RNG anywhere)."""
    from industrial_data_pipeline_spark.operators.vectors import (
        pq_train)
    rows = [(i, [float((i * 7 + d * 3) % 11) for d in range(8)])
            for i in range(30)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    a = {(r.subspace, r.code): list(r._cq)
         for r in pq_train(df, dim=8, m=2, k=4, iters=1).collect()}
    b = {(r.subspace, r.code): list(r._cq)
         for r in pq_train(df, dim=8, m=2, k=4, iters=1).collect()}
    assert a == b and len(a) >= 2


def test_pq_train_ints_matches_reference_means(spark):
    """pq_train_ints on a hand-computable input: 4 one-dim-subspace
    'vectors' whose residual slices cluster into the k=2 seeds —
    after one Lloyd pass each centroid must be floor(mean + 0.5) of
    its members, computed exactly, and encode must argmin with ties
    to the lowest code."""
    from industrial_data_pipeline_spark.operators.vectors import (
        pq_encode_ints, pq_train_ints)

    # _id 0 seeds code 0 at 0; _id 1 seeds code 1 at 100;
    # members: {0, 10} -> code 0, {100, 104} -> code 1
    slices = spark.createDataFrame(
        [(0, 0, [0]), (1, 0, [100]), (2, 0, [10]), (3, 0, [104])],
        "_id long, subspace int, _sq array<long>")
    cb = {(r["subspace"], r["code"]): list(r["_cq"])
          for r in pq_train_ints(slices, k=2, iters=1).collect()}
    assert cb == {(0, 0): [5], (0, 1): [102]}  # floor(mean+0.5)
    enc = {r["_id"]: r["code"]
           for r in pq_encode_ints(
               slices, pq_train_ints(slices, k=2, iters=1)).collect()}
    assert enc == {0: 0, 2: 0, 1: 1, 3: 1}


def test_pq_train_ints_negative_means_round_half_up(spark):
    """Signed residuals: floor(S/n + 0.5) is round-half-UP toward
    +inf on negatives too (floor(-2.5 + 0.5) = -2), matching the
    oracle's floor(CAST(sum AS DOUBLE)/count + 0.5) — integer
    division semantics (which differ between engines on negatives)
    are never involved."""
    from industrial_data_pipeline_spark.operators.vectors import (
        pq_train_ints)

    # one seed (k=1): all rows form one cluster; mean = -2.5
    slices = spark.createDataFrame(
        [(0, 0, [-1]), (1, 0, [-4]), (2, 0, [-2]), (3, 0, [-3])],
        "_id long, subspace int, _sq array<long>")
    cb = pq_train_ints(slices, k=1, iters=1).collect()
    assert [list(r["_cq"]) for r in cb] == [[-2]]
