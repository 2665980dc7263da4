"""Dedup operators: exact, MinHash+LSH recall vs exact Jaccard, SimHash."""

import pytest
from pyspark.sql import functions as F

from industrial_data_pipeline_spark.operators import dedup as D

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def corpus(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet") \
        .select("doc_id", "text")
    mut = (docs.where(F.col("doc_id") < 20)
           .select((F.col("doc_id") + 100000).alias("doc_id"),
                   F.concat("text", F.lit(" zzz")).alias("text")))
    return docs.unionByName(mut).cache()


def test_exact_dedup_collapses_copies(spark):
    df = spark.createDataFrame(
        [(1, "Hello  World"), (2, "hello world"), (3, "other text")],
        "doc_id long, text string")
    kept = D.exact_dedup(df, "doc_id").collect()
    got = {(r.doc_id, r.dup_count) for r in kept}
    # normalization: case + whitespace collapse → 1 and 2 merge
    assert got == {(1, 2), (3, 1)}


def test_minhash_lsh_finds_planted_pairs(corpus):
    pairs = D.minhash_lsh_pairs(corpus, "doc_id", threshold=0.35).collect()
    found = {(p.id_a, p.id_b) for p in pairs}
    planted = {(i, i + 100000) for i in range(20)}
    recall = len(found & planted) / len(planted)
    assert recall >= 0.9, f"LSH recall {recall} on planted near-dups"
    for p in pairs:
        assert p.jaccard_sim >= 0.35


def test_minhash_matches_exact_jaccard(corpus):
    """Every LSH-verified pair must carry the same Jaccard value the
    exact all-pairs operator computes."""
    small = corpus.where((F.col("doc_id") < 10)
                         | (F.col("doc_id").between(100000, 100009)))
    lsh = {(p.id_a, p.id_b): p.jaccard_sim
           for p in D.minhash_lsh_pairs(small, "doc_id",
                                        threshold=0.35).collect()}
    exact = {(p.id_a, p.id_b): p.jaccard_sim
             for p in D.ngram_jaccard_pairs(small, "doc_id",
                                            threshold=0.35).collect()}
    for k, v in lsh.items():
        assert exact[k] == v
    # LSH finds a subset of exact pairs (approximation), never extras
    assert set(lsh) <= set(exact)


def test_simhash_hamming_small_for_near_dups(corpus):
    pairs = D.simhash_pairs(corpus, "doc_id", max_hamming=8).collect()
    found = {(p.id_a, p.id_b) for p in pairs}
    planted = {(i, i + 100000) for i in range(20)}
    recall = len(found & planted) / len(planted)
    assert recall >= 0.9, f"SimHash recall {recall}"


def test_simhash_is_deterministic(spark):
    df = spark.createDataFrame([(1, "a b c d e")], "doc_id long, text string")
    a = D.simhash64(df, "doc_id").first().simhash
    b = D.simhash64(df, "doc_id").first().simhash
    assert a == b and a > 0


def test_connected_components_chain_and_islands(spark):
    # chain 1-2-3-4 (via pairs), island 7-8, singleton pair 10-11
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (7, 8), (10, 11)],
        "id_a long, id_b long")
    got = {(r.doc_id, r.cluster_id)
           for r in D.connected_components(pairs).collect()}
    assert got == {(1, 1), (2, 1), (3, 1), (4, 1),
                   (7, 7), (8, 7), (10, 10), (11, 10)}


def test_star_cc_matches_min_label_on_random_graph(spark):
    import random
    rng = random.Random(42)
    edges = {(rng.randrange(60), rng.randrange(60)) for _ in range(70)}
    edges = [(a, b) for a, b in edges if a != b]
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    want = {(r.doc_id, r.cluster_id)
            for r in D.connected_components(pairs).collect()}
    got = {(r.doc_id, r.cluster_id)
           for r in D.connected_components_star(pairs).collect()}
    assert got == want


def test_star_cc_keeps_self_loop_only_nodes(spark):
    # contract parity: a node whose only pair is a self-loop is its
    # own singleton cluster in BOTH variants
    pairs = spark.createDataFrame([(7, 7), (1, 2)], "id_a long, id_b long")
    want = {(r.doc_id, r.cluster_id)
            for r in D.connected_components(pairs).collect()}
    got = {(r.doc_id, r.cluster_id)
           for r in D.connected_components_star(pairs).collect()}
    assert got == want == {(7, 7), (1, 1), (2, 1)}


def test_star_cc_beats_min_label_rounds_on_chain(spark):
    # adversarial 40-node chain: min-label needs ~diameter rounds,
    # alternating stars collapse it in O(log^2 n)
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(39)], "id_a long, id_b long")
    stats: dict = {}
    got = {(r.doc_id, r.cluster_id)
           for r in D.connected_components_star(
               pairs, stats=stats).collect()}
    assert got == {(i, 0) for i in range(40)}
    # 13 = 11 productive rounds + 2 confirming the fixed point;
    # min-label propagation would need ~39 (one hop per round)
    assert stats["rounds"] <= 16


def test_incremental_exact_dedup(spark):
    from industrial_data_pipeline_spark.operators.dedup import (
        incremental_exact_dedup)
    corpus = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma delta")], "doc_id long, text string")
    batch = spark.createDataFrame(
        [(10, "alpha beta"),      # already in corpus → dropped
         (11, "epsilon zeta"),    # new → kept
         (12, "epsilon zeta"),    # in-batch dup, higher id → dropped
         (13, "eta theta")],      # new → kept
        "doc_id long, text string")
    out = incremental_exact_dedup(corpus, batch)
    assert sorted(r.doc_id for r in out.collect()) == [11, 13]


def test_contamination_hand_computed(spark):
    from industrial_data_pipeline_spark.operators.text import (
        ngram_contamination)
    bench = spark.createDataFrame(
        [(1, "a b c d e f")], "doc_id long, text string")
    train = spark.createDataFrame(
        [(10, "a b c d e x"),   # grams: abcde? k=3: abc bcd cde dex -> 2 shared of 4
         (11, "z z z z")],      # no overlap
        "doc_id long, text string")
    out = {r.doc_id: r for r in
           ngram_contamination(train, bench, k=3).collect()}
    # doc 10 3-grams: {a b c, b c d, c d e, d e x}; bench has first 3
    assert out[10].n_grams == 4 and out[10].n_shared == 3
    assert out[10].contamination_ratio == 0.75
    assert out[11].n_shared == 0 and out[11].contamination_ratio == 0.0


def test_redact_pii_order_and_counts(spark):
    from industrial_data_pipeline_spark.operators.text import redact_pii
    df = spark.createDataFrame(
        [(1, "mail bob@x10.0.0.9.com or 10.0.0.9 call 555-123-4567")],
        "doc_id long, text string")
    r = redact_pii(df).collect()[0]
    # the email (with an IP-looking host) is consumed by the email rule
    # FIRST, so the ip count sees only the bare literal
    assert r.n_email == 1 and r.n_phone == 1 and r.n_ip == 1
    assert r.redacted == "mail <EMAIL> or <IP> call <PHONE>"


def test_lm_cross_entropy_hand_computed(spark):
    """All-train corpus (forced split): Laplace bigram LM checked
    against hand math. Corpus 'a b' x2 + 'x': c2(a,b)=2, c1(a)=2,
    V=3 (a,b,x) -> p(b|a) = (2+1)/(2+3) = 0.6; scored docs get
    -ln(0.6)."""
    import math
    from industrial_data_pipeline_spark.operators.text import (
        lm_cross_entropy)
    docs = spark.createDataFrame([(1, "a b"), (2, "a b"), (3, "x")],
                                 "doc_id long, text string")
    out = {r.doc_id: r for r in
           lm_cross_entropy(docs, train_pct=100).collect()}
    assert all(r.is_train for r in out.values())
    expected = round(-math.log(3 / 5), 6)
    assert out[1].n_bigrams == 1
    assert out[1].cross_entropy_nats == expected
    assert out[2].cross_entropy_nats == expected
    assert out[3].n_bigrams == 0 and out[3].cross_entropy_nats is None
    # unseen-history doc under a 0% train LM: p = 1/V with V=0 ->
    # degenerate; use train_pct=100 LM scoring an unseen bigram doc
    docs2 = spark.createDataFrame([(1, "a b"), (2, "q z")],
                                  "doc_id long, text string")
    out2 = {r.doc_id: r for r in
            lm_cross_entropy(docs2, train_pct=100).collect()}
    # V=4 (a,b,q,z both docs train): doc2 bigram (q,z): c2=1,c1=1
    assert out2[2].cross_entropy_nats == round(-math.log(2 / 5), 6)


def test_chunk_documents_hand_computed(spark):
    from industrial_data_pipeline_spark.operators.text import (
        chunk_documents, hash64)
    import pytest as _pt
    docs = spark.createDataFrame(
        [(1, "a b c d e f g"), (2, "x y")], "doc_id long, text string")
    rows = chunk_documents(docs, window=3, stride=2).collect()
    got = {(r.doc_id, r.chunk_idx): (r.start_token, r.n_tokens)
           for r in rows}
    # doc 1: 7 tokens -> starts 0,2,4; the tail chunk is full here
    assert got == {(1, 0): (0, 3), (1, 1): (2, 3), (1, 2): (4, 3),
                   (2, 0): (0, 2)}
    # stable identity: same text -> same chunk hash on a second run
    again = {(r.doc_id, r.chunk_idx): r.chunk_hash
             for r in chunk_documents(docs, window=3,
                                      stride=2).collect()}
    first = {(r.doc_id, r.chunk_idx): r.chunk_hash for r in rows}
    assert again == first
    with _pt.raises(ValueError, match="stride"):
        chunk_documents(docs, window=3, stride=4)


def test_mixture_weights_hand_computed(spark):
    """Two sources, weights 3:1, tokens 300 vs 300: binding source is
    the weight-3 one (T = 300*4/3 = 400), so it keeps rate 1.0 and
    the other thins to 100/300."""
    from industrial_data_pipeline_spark.operators.text import (
        mixture_weights)
    docs = spark.createDataFrame(
        [(i, "a " * 99 + "a", "big" if i < 3 else "small")
         for i in range(6)], "doc_id long, text string, source string")
    out = {r.source: r for r in
           mixture_weights(docs, {"big": 3, "small": 1}).collect()}
    assert out["big"].n_tokens == 300 and out["small"].n_tokens == 300
    assert out["big"].sample_rate == 1.0
    assert out["small"].sample_rate == round(100 / 300, 6)
    assert out["big"].target_share == 0.75
    # absent-from-targets source gets rate 0
    extra = docs.union(spark.createDataFrame(
        [(9, "x y z", "other")], "doc_id long, text string, source string"))
    out2 = {r.source: r.sample_rate for r in
            mixture_weights(extra, {"big": 3, "small": 1}).collect()}
    assert out2["other"] == 0.0


def test_first_wins_tie_is_total_order(spark):
    """Rows tying on the order column must resolve by the remaining
    columns (total order) — the same survivor on every run and any
    partitioning."""
    from industrial_data_pipeline_spark.operators.maintenance import (
        dedup_first_wins, latest_per_key)
    rows = [("k", 5, "b"), ("k", 5, "a"), ("k", 7, "z")]
    df = spark.createDataFrame(rows, "key string, ord int, val string") \
        .repartition(8)
    first = dedup_first_wins(df, ["key"], "ord").collect()[0]
    assert (first.ord, first.val) == (5, "a")
    last = latest_per_key(df, ["key"], "ord").collect()[0]
    assert (last.ord, last.val) == (7, "z")


def test_set_similarity_join_hand_computed(spark):
    """A={x,y,z} B={x,y,z,w} C={p,q}: only (A,B) with J=3/4 passes
    t=0.5; output carries the exact integer sizes."""
    from industrial_data_pipeline_spark.operators.dedup import (
        set_similarity_join)
    rows = [(1, i) for i in "xyz"] + [(2, i) for i in "xyzw"] \
        + [(3, i) for i in "pq"]
    df = spark.createDataFrame(rows, "doc_id long, item string")
    got = [(r.id_a, r.id_b, r.n_inter, r.n_union)
           for r in set_similarity_join(df, t_millis=500).collect()]
    assert got == [(1, 2, 3, 4)]


def test_set_similarity_join_matches_naive(spark):
    """Prefix filtering is lossless: against a brute-force quadratic
    Jaccard over random small sets, the pair set is identical."""
    import itertools
    from industrial_data_pipeline_spark.operators.dedup import (
        set_similarity_join)
    import random
    rng = random.Random(7)
    sets = {i: frozenset(rng.sample(range(20), rng.randint(1, 10)))
            for i in range(30)}
    rows = [(i, str(x)) for i, s in sets.items() for x in s]
    df = spark.createDataFrame(rows, "doc_id long, item string")
    got = sorted((r.id_a, r.id_b)
                 for r in set_similarity_join(df, t_millis=600)
                 .collect())
    want = sorted(
        (a, b) for a, b in itertools.combinations(sorted(sets), 2)
        if 1000 * len(sets[a] & sets[b])
        >= 600 * len(sets[a] | sets[b]))
    assert got == want


def test_set_similarity_join_rejects_bad_threshold(spark):
    from industrial_data_pipeline_spark.operators.dedup import (
        set_similarity_join)
    df = spark.createDataFrame([(1, "x")], "doc_id long, item string")
    for t in (0, -1, 1001):
        with pytest.raises(ValueError):
            set_similarity_join(df, t_millis=t)


def test_dedup_map_payload_column_supported(spark):
    """ADVICE r4 + review: a map-typed payload column must not break
    analysis (maps are unorderable in Spark) AND must still yield a
    deterministic survivor when rows tie on every other column — maps
    enter the tie key via canonical sorted-entries JSON."""
    from industrial_data_pipeline_spark.operators.maintenance import (
        dedup_first_wins, latest_per_key)
    rows = [("k", 5, {"a": 1}), ("k", 7, {"b": 2})]
    df = spark.createDataFrame(
        rows, "key string, ord int, props map<string,int>")
    first = dedup_first_wins(df, ["key"], "ord").collect()[0]
    assert first.ord == 5 and first.props == {"a": 1}
    last = latest_per_key(df, ["key"], "ord").collect()[0]
    assert last.ord == 7 and last.props == {"b": 2}
    # tie on ord, differ ONLY in the map: '{"x":1}' < '{"x":2}' in the
    # canonical JSON order, every run, any partitioning
    tie = spark.createDataFrame(
        [("k", 5, {"x": 2}), ("k", 5, {"x": 1})],
        "key string, ord int, props map<string,int>").repartition(8)
    for _ in range(3):
        assert dedup_first_wins(
            tie, ["key"], "ord").collect()[0].props == {"x": 1}
        assert latest_per_key(
            tie, ["key"], "ord").collect()[0].props == {"x": 2}


def test_incremental_lsh_batch_vs_index_only(spark):
    """incremental_minhash_lsh is a batch-vs-corpus gate: an exact
    copy in the batch pairs with its original at jaccard 1.0; a
    shingle-disjoint batch doc pairs with nothing; two identical
    batch docs do NOT pair with each other (no batch-vs-batch), and
    corpus-vs-corpus duplicates are likewise never emitted."""
    from industrial_data_pipeline_spark.operators.dedup import (
        incremental_minhash_lsh)
    corpus = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta"),
         (2, "alpha beta gamma delta epsilon zeta"),   # corpus dup
         (3, "one two three four five six")],
        "doc_id long, text string")
    batch = spark.createDataFrame(
        [(10, "alpha beta gamma delta epsilon zeta"),  # copy of 1/2
         (11, "seven eight nine ten eleven twelve"),   # no overlap
         (12, "seven eight nine ten eleven twelve")],  # batch dup
        "doc_id long, text string")
    rows = incremental_minhash_lsh(corpus, batch, "doc_id",
                                   threshold=0.5).collect()
    got = {(r.new_id, r.old_id): r.jaccard_sim for r in rows}
    assert set(got) == {(10, 1), (10, 2)}
    assert all(v == 1.0 for v in got.values())


def test_dup_span_excise_hand_built(spark, tmp_path):
    """q239 surgery on a planted corpus: two docs share one 8-token
    run; the excision must remove exactly those 8 positions from
    each and rebuild the remaining text verbatim (md5-pinned);
    a third unrelated doc passes through untouched."""
    import hashlib
    from industrial_data_pipeline_spark.suite_corpus import (
        q_dup_span_excise)
    shared = "a1 a2 a3 a4 a5 a6 a7 a8"
    d1 = f"left1 left2 {shared} right1"
    d2 = f"{shared} tail1 tail2"
    d3 = "x1 x2 x3 x4 x5 x6 x7 x8 x9"
    sf = tmp_path / "sf"
    sf.mkdir()
    (spark.createDataFrame([(1, d1), (2, d2), (3, d3)],
                           "doc_id long, text string")
     .write.parquet(str(sf / "documents.parquet")))
    out = {r.doc_id: r for r in
           q_dup_span_excise(spark, str(sf)).collect()}
    e1, e2, e3 = out[1], out[2], out[3]
    assert (e1.total_tokens, e1.removed_tokens, e1.kept_tokens) \
        == (11, 8, 3)
    assert e1.clean_md5 == hashlib.md5(
        b"left1 left2 right1").hexdigest()
    assert (e2.total_tokens, e2.removed_tokens, e2.kept_tokens) \
        == (10, 8, 2)
    assert e2.clean_md5 == hashlib.md5(b"tail1 tail2").hexdigest()
    assert (e3.removed_tokens, e3.kept_tokens) == (0, 9)
    assert e3.clean_md5 == hashlib.md5(d3.encode()).hexdigest()


def test_incremental_cc_merges_and_extends(spark):
    """incremental_connected_components on a hand-built state: one
    delta edge MERGES two existing clusters (all five nodes re-label
    to the global min), another extends a cluster with a brand-new
    node, and an untouched cluster keeps its label."""
    from industrial_data_pipeline_spark.operators.dedup import (
        incremental_connected_components)
    labels = spark.createDataFrame(
        [(1, 1), (2, 1),          # cluster 1
         (5, 5), (6, 5), (7, 5),  # cluster 5
         (9, 9)],                 # untouched cluster
        "doc_id long, cluster_id long")
    delta = spark.createDataFrame(
        [(2, 6),     # bridges cluster 1 and cluster 5
         (20, 7)],   # new node 20 joins cluster 5's component
        "id_a long, id_b long")
    got = {r.doc_id: r.cluster_id for r in
           incremental_connected_components(labels, delta).collect()}
    assert got == {1: 1, 2: 1, 5: 1, 6: 1, 7: 1, 20: 1, 9: 9}


# ----------------------------- persisted LSH index (lsh_index.py)


def test_stored_lsh_index_equals_in_plan_gate(spark, tmp_path, corpus):
    """Probing the PERSISTED index is byte-identical to the in-plan
    incremental_minhash_lsh over the same corpus — the equality that
    makes q242 share q236's oracle."""
    from industrial_data_pipeline_spark.operators.lsh_index import (
        StoredLshIndex)
    docs = corpus
    batch = (docs.where(F.col("doc_id") < 10)
             .select((F.col("doc_id") + 900000).alias("doc_id"),
                     F.concat("text", F.lit(" yyy")).alias("text")))
    idx = StoredLshIndex(spark, str(tmp_path / "idx"), threshold=0.35)
    idx.build(docs)
    stored = {(r.new_id, r.old_id, r.jaccard_sim)
              for r in idx.probe(batch).collect()}
    inplan = {(r.new_id, r.old_id, r.jaccard_sim)
              for r in D.incremental_minhash_lsh(
                  docs, batch, "doc_id", threshold=0.35).collect()}
    assert stored == inplan and stored


def test_stored_lsh_index_append_advances_gate(spark, tmp_path):
    """An admitted batch's appended signature rows really advance the
    index: a later near-copy of the admitted doc is caught, and
    open() round-trips the build parameters."""
    from industrial_data_pipeline_spark.operators.lsh_index import (
        StoredLshIndex)
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta"),
         (2, "one two three four five six")],
        "doc_id long, text string")
    idx = StoredLshIndex(spark, str(tmp_path / "idx"), threshold=0.5)
    idx.build(docs)
    newcomer = spark.createDataFrame(
        [(10, "red orange yellow green blue indigo violet")],
        "doc_id long, text string")
    bands_df, shingles_df = idx.signature_frames(newcomer)
    assert idx.probe_frames(bands_df, shingles_df).count() == 0
    idx.append_frames(bands_df, shingles_df)  # admit
    probe2 = spark.createDataFrame(
        [(11, "red orange yellow green blue indigo violet")],
        "doc_id long, text string")
    reopened = StoredLshIndex.open(spark, str(tmp_path / "idx"))
    assert (reopened.num_perm, reopened.bands,
            reopened.threshold) == (32, 8, 0.5)
    got = {(r.new_id, r.old_id, r.jaccard_sim)
           for r in reopened.probe(probe2).collect()}
    assert got == {(11, 10, 1.0)}


def test_stored_index_compaction_bounds_files_probe_unchanged(
        spark, tmp_path):
    """VERDICT r8 item 2: per-batch appends accrete small files;
    compact() folds them back into the build layout. Pins (a) file
    count strictly drops after >= 3 append batches, (b) a probe is
    BYTE-identical across the compaction, (c) the writer lease is
    released (a second compact() doesn't dead-wait), and (d) a crash
    between the two renames is recovered on the next compact()."""
    import os

    from industrial_data_pipeline_spark.operators.lsh_index import (
        StoredLshIndex)

    base = spark.createDataFrame(
        [(i, f"w{i}a w{i}b w{i}c w{i}d w{i}e") for i in range(20)],
        "doc_id long, text string")
    root = str(tmp_path / "idx")
    idx = StoredLshIndex(spark, root, threshold=0.5)
    idx.build(base)
    for b in range(3):  # three admission micro-batches
        batch = spark.createDataFrame(
            [(100 + b, f"x{b}a x{b}b x{b}c x{b}d x{b}e")],
            "doc_id long, text string")
        bands_df, shingles_df = idx.signature_frames(batch)
        idx.append_frames(bands_df, shingles_df)
    probe = spark.createDataFrame(
        [(900, "x1a x1b x1c x1d x1e"),       # dup of batch-1 admit
         (901, "w3a w3b w3c w3d w3e"),       # dup of base corpus
         (902, "zz1 zz2 zz3 zz4 zz5")],      # novel
        "doc_id long, text string")
    before_files = idx.file_count()
    before = sorted((r.new_id, r.old_id, r.jaccard_sim)
                    for r in idx.probe(probe).collect())
    assert {(900, 101), (901, 3)} == {(a, b) for a, b, _ in before}
    stats = idx.compact()
    assert stats["files_after"] < before_files
    after = sorted((r.new_id, r.old_id, r.jaccard_sim)
                   for r in idx.probe(probe).collect())
    assert after == before  # byte-identical across compaction
    # lease released: a second compaction acquires immediately
    stats2 = idx.compact()
    assert stats2["files_after"] <= stats["files_after"]
    # crash recovery: simulate death between the two renames
    os.rename(idx._shingles_path, idx._shingles_path + "_compact_old")
    idx.compact()  # _recover() restores, then compacts
    assert sorted((r.new_id, r.old_id, r.jaccard_sim)
                  for r in idx.probe(probe).collect()) == before


def test_stored_index_retract_restores_admissibility(spark, tmp_path):
    """retract() (q260): a retracted document's former near-dups
    become admissible again — and a later append can re-admit it,
    the full takedown/re-ingest cycle on one asset."""
    from industrial_data_pipeline_spark.operators.lsh_index import (
        StoredLshIndex)

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta"),
         (2, "one two three four five six")],
        "doc_id long, text string")
    idx = StoredLshIndex(spark, str(tmp_path / "idx"), threshold=0.5)
    idx.build(docs)
    probe = spark.createDataFrame(
        [(10, "alpha beta gamma delta epsilon zeta")],
        "doc_id long, text string")
    assert {r.old_id for r in idx.probe(probe).collect()} == {1}
    idx.retract([1])
    assert idx.probe(probe).count() == 0  # former dup now admissible
    # the OTHER doc is untouched
    probe2 = spark.createDataFrame(
        [(11, "one two three four five six")],
        "doc_id long, text string")
    assert {r.old_id for r in idx.probe(probe2).collect()} == {2}
    # re-ingest the retracted doc -> matches again
    idx.append_frames(*idx.signature_frames(
        docs.where("doc_id = 1")))
    assert {r.old_id for r in idx.probe(probe).collect()} == {1}


def test_stored_lsh_index_asof_probe_time_travel(spark, tmp_path):
    """as_of_epoch (q267): a probe as-of epoch N sees history plus
    epochs <= N and nothing newer; as_of=-1 is the build-only
    snapshot; and compaction COARSENS resolution (folded epochs stop
    being separately addressable but their rows stay visible)."""
    from industrial_data_pipeline_spark.operators.lsh_index import (
        StoredLshIndex)

    base = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta")],
        "doc_id long, text string")
    idx = StoredLshIndex(spark, str(tmp_path / "idx"), threshold=0.5)
    idx.build(base)
    e0 = spark.createDataFrame(
        [(2, "one two three four five six")],
        "doc_id long, text string")
    e1 = spark.createDataFrame(
        [(3, "red orange yellow green blue indigo")],
        "doc_id long, text string")
    idx.append_frames(*idx.signature_frames(e0), epoch_id=0)
    idx.append_frames(*idx.signature_frames(e1), epoch_id=1)
    probe = spark.createDataFrame(
        [(10, "alpha beta gamma delta epsilon zeta"),
         (11, "one two three four five six"),
         (12, "red orange yellow green blue indigo")],
        "doc_id long, text string")
    full = {(r.new_id, r.old_id)
            for r in idx.probe(probe).collect()}
    assert full == {(10, 1), (11, 2), (12, 3)}
    asof0 = {(r.new_id, r.old_id)
             for r in idx.probe(probe, as_of_epoch=0).collect()}
    assert asof0 == {(10, 1), (11, 2)}  # epoch-1 doc invisible
    build_only = {(r.new_id, r.old_id)
                  for r in idx.probe(probe, as_of_epoch=-1).collect()}
    assert build_only == {(10, 1)}
    # compaction folds epochs into history: rows stay visible at any
    # as-of, but pre-compaction boundaries are no longer addressable
    idx.compact()
    assert {(r.new_id, r.old_id)
            for r in idx.probe(probe, as_of_epoch=-1).collect()} \
        == full


def test_retraction_overrides_time_travel(spark, tmp_path):
    """Takedown compliance: retract() rewrites EVERY epoch partition,
    so a retracted document cannot be resurrected by an as-of probe —
    snapshots answer 'what did the index contain', takedowns answer
    'what are we allowed to serve', and the second wins."""
    from industrial_data_pipeline_spark.operators.lsh_index import (
        StoredLshIndex)

    base = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta")],
        "doc_id long, text string")
    idx = StoredLshIndex(spark, str(tmp_path / "idx"), threshold=0.5)
    idx.build(base)
    e0 = spark.createDataFrame(
        [(2, "one two three four five six")],
        "doc_id long, text string")
    idx.append_frames(*idx.signature_frames(e0), epoch_id=0)
    probe = spark.createDataFrame(
        [(10, "one two three four five six")],
        "doc_id long, text string")
    assert {r.old_id for r in
            idx.probe(probe, as_of_epoch=0).collect()} == {2}
    idx.retract([2])
    # the as-of snapshot that USED to contain doc 2 must not serve it
    assert idx.probe(probe, as_of_epoch=0).count() == 0
    assert idx.probe(probe).count() == 0
