"""Every suite entry vs its DuckDB oracle at sf0.001 — the local
stand-in for the driver's CORRECTNESS gate (it runs the same pairs at
sf0.01)."""

import pytest

from industrial_data_pipeline_spark.suite import REGISTRY

from tests.oracle import compare, run_oracle


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(spark, sf_dir, name):
    fn, sql = REGISTRY[name]
    df = fn(spark, sf_dir)
    if sql is None:
        assert df.count() >= 0  # rows-only smoke, mirrors driver fallback
        return
    compare(df, run_oracle(sql, sf_dir), name)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert len(df.columns) > 1
    assert set(e.oracle_sql()) <= set(e.queries())


def test_quality_filter_reasons_split(spark):
    """q68 must actually exercise the gate: at sf0.001 some docs keep,
    some reject, and >1 distinct reject_reason fires."""
    from industrial_data_pipeline_spark.suite_pipeline import (
        q_quality_filter)
    rows = q_quality_filter(spark, "/root/testdata/sf0.001").collect()
    kept = [r for r in rows if r.keep]
    reasons = {r.reject_reason for r in rows if not r.keep}
    assert kept and reasons and len(reasons) >= 2
    assert all(r.reject_reason is None for r in kept)


def test_token_rarity_hand_computed(spark):
    from industrial_data_pipeline_spark.operators.text import token_rarity
    # corpus: a a a b b c  → freqs a=3 b=2 c=1, total=6, |V|=3, mean=2
    # rare ⟺ f*3 < 6 ⟺ f < 2 → only c
    df = spark.createDataFrame(
        [(1, "a a a b"), (2, "b c")], "doc_id long, text string")
    out = {r.doc_id: r for r in token_rarity(df).collect()}
    assert out[1].n_tokens == 4
    assert out[1].avg_token_freq == round((3 + 3 + 3 + 2) / 4, 6)
    assert out[1].rare_token_ratio == 0.0
    assert out[2].avg_token_freq == round((2 + 1) / 2, 6)
    assert out[2].rare_token_ratio == 0.5


def test_repetition_metrics_hand_computed(spark):
    from industrial_data_pipeline_spark.operators.text import (
        repetition_metrics)
    # "x x x y": tokens 4, distinct 2, top 3; bigrams [x x, x x, x y]
    df = spark.createDataFrame(
        [(1, "x x x y"), (2, "solo")], "doc_id long, text string")
    out = {r.doc_id: r for r in repetition_metrics(df).collect()}
    assert out[1].n_tokens == 4
    assert out[1].dup_token_ratio == 0.5
    assert out[1].top_token_ratio == 0.75
    assert out[1].top_bigram_ratio == round(2 / 3, 6)
    assert out[2].n_tokens == 1 and out[2].dup_token_ratio == 0.0
    assert out[2].top_bigram_ratio is None


def test_bpe_merge_pairs_hand_computed(spark):
    from industrial_data_pipeline_spark.operators.text import (
        bpe_merge_pairs)
    # "aaab aab": pairs aa,aa,ab + aa,ab → aa:3 ab:2; "x" too short
    df = spark.createDataFrame(
        [(1, "aaab aab"), (2, "x")], "doc_id long, text string")
    out = {r.pair: r.n for r in bpe_merge_pairs(df).collect()}
    assert out == {"aa": 3, "ab": 2}


def test_triangles_hand_built(spark):
    from industrial_data_pipeline_spark.operators.graph import triangles
    # K4 on {1,2,3,4} (4 triangles) + pendant edge 4-5 (none) +
    # disconnected path 6-7-8 (none)
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
             (4, 5), (6, 7), (7, 8)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = sorted((r.a, r.b, r.c) for r in triangles(df).collect())
    assert got == [(1, 2, 3), (1, 2, 4), (1, 3, 4), (2, 3, 4)]


def test_table_diff_classifications(spark):
    from industrial_data_pipeline_spark.operators.diff import table_diff
    old = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, "c", None), (4, "d", 4.0)],
        "k long, s string, x double")
    new = spark.createDataFrame(
        [(2, "b", 2.0), (3, "c", 3.0), (4, "D", 40.0), (5, "e", 5.0)],
        "k long, s string, x double")
    got = {r.k: (r.change_type, r.changed_cols)
           for r in table_diff(old, new, ["k"], ["s", "x"]).collect()}
    assert got == {
        1: ("removed", ""), 2: ("unchanged", ""),
        3: ("changed", "x"),          # NULL -> value counts
        4: ("changed", "s,x"), 5: ("added", "")}


def test_tfidf_pairs_hand_built(spark):
    from industrial_data_pipeline_spark.operators.text import (
        tfidf_cosine_pairs)
    # docs 1,2 share rare terms (high cosine); 3 is disjoint; the
    # shared-by-all term 'common' is pruned by max_df=2
    df = spark.createDataFrame(
        [(1, "alpha beta gamma common"),
         (2, "alpha beta delta common"),
         (3, "zeta eta theta common")],
        "doc_id long, text string")
    out = tfidf_cosine_pairs(df, max_df=2, threshold=0.1).collect()
    assert [(r.id_a, r.id_b) for r in out] == [(1, 2)]
    # shared terms (df=2) carry LESS idf weight than each doc's unique
    # term (df=1): cos = 2·ln(4/3)² / (2·ln(4/3)² + ln(4/2)²) ≈ 0.256
    import math
    shared, uniq = math.log(4 / 3), math.log(4 / 2)
    expect = 2 * shared**2 / (2 * shared**2 + uniq**2)
    assert abs(out[0].cosine_sim - expect) < 1e-4


def test_trigram_search_rejects_wildcards(spark):
    import pytest as _pt
    from industrial_data_pipeline_spark.operators.text import (
        trigram_like_search)
    df = spark.createDataFrame([(1, "abc")], "doc_id long, text string")
    for bad in ("a_c", "ab%", "ab"):
        with _pt.raises(ValueError):
            trigram_like_search(df, bad)


def test_keyframes_custom_columns(spark):
    import numpy as np
    from industrial_data_pipeline_spark.operators import multimodal as MM
    px = ((np.arange(8)[None, :, None] + np.arange(6)[:, None, None]
           + np.arange(3)[None, None, :]) % 256).astype(np.uint8)
    df = spark.createDataFrame(
        [(7, 0, MM.png_encode(px))],
        "video_id long, seq int, data binary")
    out = MM.keyframes(df, id_col="video_id", idx_col="seq").collect()
    assert out[0].video_id == 7 and out[0].is_keyframe


def test_boilerplate_short_docs_no_crash(spark):
    """q202 regression: documents with fewer tokens than one shingle
    must produce an EMPTY gram array (matching the oracle's empty
    range), not a descending sequence(1, 0) that makes slice()
    throw INVALID_PARAMETER_VALUE. Short docs drop out of the
    report entirely on both engines."""
    from industrial_data_pipeline_spark.operators.text import tokens  # noqa: F401
    from industrial_data_pipeline_spark.suite_corpus import (
        BOILER_N, q_boilerplate_ngrams)
    import tempfile, os, shutil
    d = tempfile.mkdtemp(prefix="idp_short_docs_")
    try:
        rows = [(1, "a b c d"), (2, "one"), (3, ""),
                (4, "w1 w2 w3 w4 w5 w6")]
        spark.createDataFrame(rows, "doc_id long, text string") \
            .write.parquet(os.path.join(d, "documents.parquet"))
        out = {r.doc_id: r.n_grams
               for r in q_boilerplate_ngrams(spark, d).collect()}
        # only doc 4 has >= BOILER_N tokens → 2 shingle positions
        assert out == {4: 6 - BOILER_N + 1}
    finally:
        shutil.rmtree(d, ignore_errors=True)


def _synthetic_events_compare(spark, tmp_path, rows, qname):
    """Run a suite query AND its oracle over a synthetic events table,
    compare byte-exactly — the degenerate-data harness the fixed
    testdata can't exercise."""
    import duckdb
    from industrial_data_pipeline_spark.suite import REGISTRY
    d = str(tmp_path / "sfX")
    (spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long,"
              " event_type string, value double, props string")
     .coalesce(1).write.mode("overwrite")
     .parquet(f"{d}/events.parquet"))
    fn, sql = REGISTRY[qname]
    con = duckdb.connect()
    # Spark writes a part-file directory; DuckDB needs the glob
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"'{d}/events.parquet/*.parquet'")
    compare(fn(spark, d), con.execute(sql).fetchdf(), qname)


def test_psi_drift_keeps_retired_event_types(spark, tmp_path):
    """q182 degenerate case: an event type with reference-week rows
    but ZERO current-week rows must still be reported (n_cur=0,
    smoothed PSI) — the engine's old inner join dropped it."""
    from datetime import datetime as T
    rows = [(i, T(2024, 1, 2, i % 24), 1, "retired", 10.0 + i, None)
            for i in range(30)]
    rows += [(100 + i, T(2024, 1, 2, i % 24), 2, "alive",
              5.0 + i, None) for i in range(30)]
    rows += [(200 + i, T(2024, 1, 26, i % 24), 2, "alive",
              6.0 + i, None) for i in range(20)]
    _synthetic_events_compare(spark, tmp_path, rows, "q182_psi_drift")


def test_stuck_runs_duplicate_timestamp_ties(spark, tmp_path):
    """q223 degenerate case: duplicate (attribute, µs) readings — the
    (timestamp, value) tiebreak must make the injection landing spots
    and run boundaries identical across engines."""
    from datetime import datetime as T
    rows = []
    for i in range(200):
        # every 5th reading duplicates its timestamp with a
        # DIFFERENT value → real (ts) ties, ordered only by value
        t = T(2024, 1, 1, 0, i // 2 % 60, i % 60)
        rows.append((i, t, 1 + i % 3, "view", float(i % 7), None))
    _synthetic_events_compare(spark, tmp_path, rows,
                              "q223_stuck_sensor_runs")


def test_sequence_motifs_null_event_type(spark, tmp_path):
    """q175 degenerate case: NULL event_type rows — concat_ws skips
    nulls while SQL || null-propagates; both sides now require all
    three motif parts non-null."""
    from datetime import datetime as T
    rows = [(i, T(2024, 1, 1, 0, i), 1,
             None if i % 4 == 2 else ("view", "click", "buy")[i % 3],
             1.0, None) for i in range(40)]
    _synthetic_events_compare(spark, tmp_path, rows,
                              "q175_sequence_motifs")


def test_tokenizer_parity_on_empty_docs(spark, tmp_path):
    """Oracle tokenizers must not emit the phantom '' token a bare
    string_split_regex produces for empty/whitespace-only text —
    engine tokens() strips it. Compare q19 and q59 over a corpus
    containing empty and whitespace-only docs."""
    import duckdb
    from industrial_data_pipeline_spark.suite import REGISTRY
    d = str(tmp_path / "sfX")
    rows = [(1, "alpha beta alpha end.", "en", "web", 21),
            (2, "", "en", "web", 0),
            (3, "   ", "en", "web", 3),
            (4, "beta gamma", "en", "book", 10)]
    (spark.createDataFrame(
        rows, "doc_id long, text string, lang string,"
              " source string, n_chars long")
     .coalesce(1).write.mode("overwrite")
     .parquet(f"{d}/documents.parquet"))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{d}/documents.parquet/*.parquet'")
    for qname in ("q19_text_quality", "q59_tfidf_top_terms"):
        fn, sql = REGISTRY[qname]
        compare(fn(spark, d), con.execute(sql).fetchdf(), qname)


def test_bm25_hand_computed(spark):
    """Pin BM25 semantics on a 3-doc corpus computed by hand: Okapi
    idf = ln(1 + (N-df+0.5)/(df+0.5)), saturating tf, per-term
    contributions rounded to 6dp BEFORE the sum (the oracle-
    determinism design), rank ties broken by doc_id."""
    import math
    from industrial_data_pipeline_spark.operators.text import bm25_topk
    docs = spark.createDataFrame(
        [(1, "apple banana apple"), (2, "banana cherry"),
         (3, "durian")], "doc_id long, text string")
    out = bm25_topk(docs, {7: "apple banana"}, k=10).collect()
    n, avgdl, k1, b = 3, 2.0, 1.2, 0.75

    def contrib(tf, dl, df):
        idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
        return round(idf * (tf * (k1 + 1.0))
                     / (tf + k1 * (1 - b + b * dl / avgdl)), 6)

    want = {1: round(contrib(2, 3, 1) + contrib(1, 3, 2), 6),
            2: round(contrib(1, 2, 2), 6)}
    got = {r.doc_id: r.bm25 for r in out}
    assert got == want
    ranks = {r.doc_id: r.rank for r in out}
    assert ranks == {1: 1, 2: 2}  # d1 outranks d2; d3 absent
    assert all(r.query_id == 7 for r in out)


def test_bm25_empty_queries_raises(spark):
    import pytest as _pytest
    from industrial_data_pipeline_spark.operators.text import bm25_topk
    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with _pytest.raises(ValueError):
        bm25_topk(docs, {})
    with _pytest.raises(ValueError):
        bm25_topk(docs, {0: "   "})


def test_k_anonymity_flags_and_null_semantics(spark):
    """Hand-built equivalence classes: k/l flags fire per the
    documented thresholds, and NULL sensitive values are NOT counted
    as diversity (all-NULL group reports n_sensitive=0 and violates
    l) — the conservative over-flagging contract in the docstring."""
    from industrial_data_pipeline_spark.operators.privacy import (
        k_anonymity_audit)
    rows = ([("a", 1, "s1"), ("a", 1, "s2"), ("a", 1, "s3")]
            + [("b", 2, "s1")]              # size 1 -> k_violation
            + [("c", 3, None), ("c", 3, None)])  # all-NULL sensitive
    df = spark.createDataFrame(
        rows, "seg string, nat int, sens string")
    out = {(r.seg, r.nat): r for r in
           k_anonymity_audit(df, ["seg", "nat"], "sens",
                             k=2, l=2).collect()}
    a, b, c = out[("a", 1)], out[("b", 2)], out[("c", 3)]
    assert (a.group_size, a.n_sensitive, a.k_violation,
            a.l_violation) == (3, 3, False, False)
    assert (b.group_size, b.k_violation) == (1, True)
    assert (c.group_size, c.n_sensitive, c.l_violation) == (2, 0, True)
    assert abs(a.pct_of_table - 0.5) < 1e-12


def test_tfidf_weights_construction_is_lazy(spark):
    """Pin the ADVICE fix: constructing tfidf_weights launches no
    Spark job (N rides a broadcast 1-row crossJoin, not an eager
    docs.count()) — plan-only tooling stays free."""
    from industrial_data_pipeline_spark.operators.text import (
        tfidf_weights)
    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "beta gamma")],
        "doc_id long, text string")
    tracker = spark.sparkContext.statusTracker()
    before = set(tracker.getJobIdsForGroup())
    w, norm = tfidf_weights(docs)
    w.schema, norm.schema  # analysis only
    after = set(tracker.getJobIdsForGroup())
    assert after == before, "tfidf_weights construction ran a job"
    assert w.count() == 4 and norm.count() == 2  # still computes


def test_bpe_apply_hand_computed(spark):
    """Pin bpe_apply merge semantics by hand: in-order exhaustive
    replace-chain application, merges never cross word boundaries,
    empty docs yield a NULL ratio."""
    from industrial_data_pipeline_spark.operators.text import bpe_apply
    from industrial_data_pipeline_spark.suite_pipeline import BPE_MERGES
    docs = spark.createDataFrame(
        [(1, "The tab join x"), (2, "")], "doc_id long, text string")
    out = {r.doc_id: r for r in bpe_apply(docs, BPE_MERGES).collect()}
    # the->t,h,e->th,e->the(1); tab->ta,b->tab(1); join->jo,i,n->
    # joi,n(2; no i unit remains for ("i","n")); x(1)
    r1 = out[1]
    assert (r1.n_units, r1.n_subwords, r1.merged_units) == (11, 5, 6)
    assert r1.bpe_ratio == 2.2
    r2 = out[2]
    assert (r2.n_units, r2.n_subwords, r2.merged_units) == (0, 0, 0)
    assert r2.bpe_ratio is None
    import pytest as _pytest
    with _pytest.raises(ValueError):
        bpe_apply(docs, [])


def test_normalize_text_hand_computed(spark):
    """Pin normalize_text stage semantics on a hand-built dirty doc:
    zero-width strip, NBSP/tab->space, control strip, space collapse,
    trim — and a clean doc passes through byte-identical."""
    import hashlib
    from industrial_data_pipeline_spark.operators.text import (
        normalize_text)
    dirty = "​﻿x a b\t\x07  y  ‍"
    clean = "plain text"
    docs = spark.createDataFrame([(1, dirty), (2, clean)],
                                 "doc_id long, text string")
    out = {r.doc_id: r for r in normalize_text(docs).collect()}
    r1 = out[1]
    # stages: strip 3 zw; nbsp/tab->' '; strip BEL; collapse 2 runs
    # of 2 spaces (-2); trim trailing ' ' -> "x a b  y" collapsed...
    assert r1.n_zero_width == 3
    assert r1.n_ctrl == 1
    assert r1.raw_len == len(dirty)
    expect = "x a b y"
    assert r1.clean_len == len(expect)
    assert r1.clean_md5 == hashlib.md5(expect.encode()).hexdigest()
    assert r1.changed
    r2 = out[2]
    assert (not r2.changed and r2.n_zero_width == 0 and r2.n_ctrl == 0
            and r2.n_collapsed == 0
            and r2.clean_md5
            == hashlib.md5(clean.encode()).hexdigest())


def test_ndcg_hand_computed(spark, sf_dir):
    """q238 invariants on the live fixture: idcg >= dcg (the ideal
    reordering can only improve a linear-gain DCG), 0 < ndcg <= 1,
    and at least the formula's discount math reproduces one row
    recomputed by hand from the q233 run + raw term occurrences."""
    import math
    from industrial_data_pipeline_spark.suite import REGISTRY
    rows = REGISTRY["q238_ndcg"][0](spark, sf_dir).collect()
    assert len(rows) == 3
    for r in rows:
        assert r.idcg >= r.dcg > 0
        assert 0 < r.ndcg <= 1.0
    # recompute query 0 by hand
    run = {(r.query_id, r.doc_id): r.rank
           for r in REGISTRY["q233_bm25_topk"][0](spark,
                                                  sf_dir).collect()}
    docs = {d.doc_id: d.text.lower().split() for d in
            spark.read.parquet(f"{sf_dir}/documents.parquet")
            .collect()}
    from industrial_data_pipeline_spark.suite_pipeline import (
        BM25_QUERIES)
    terms = BM25_QUERIES[0].split()
    rel = {doc: sum(docs[doc].count(t) for t in terms)
           for (q, doc), _rk in run.items() if q == 0}
    dcg = round(sum(round(rel[d] / math.log2(rk + 1), 6)
                    for (q, d), rk in run.items() if q == 0), 6)
    ideal = sorted(rel.items(), key=lambda kv: (-kv[1], kv[0]))
    idcg = round(sum(round(v / math.log2(i + 2), 6)
                     for i, (_d, v) in enumerate(ideal)), 6)
    got = {r.query_id: r for r in rows}[0]
    assert (got.dcg, got.idcg) == (dcg, idcg)
    assert got.ndcg == round(dcg / idcg, 6)
