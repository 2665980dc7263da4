"""Driver-facing suite, part 7: end-to-end training-data pipeline
stages over ``documents`` — the quality gate, incremental corpus
dedup, and sketch-based approximate stats. q68/q69 are exact
compositions with plain-SQL oracles; q70 is honestly approximate
(HLL++ / Greenwald-Khanna sketches) so it ships rows-only with the
error-bound assertion living in tests/test_dedup.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from industrial_data_pipeline_spark.operators import dedup as D
from industrial_data_pipeline_spark.operators import text as TX
from industrial_data_pipeline_spark.operators.analyzer import Analyzer
from industrial_data_pipeline_spark.suite_common import load, run_chains
from industrial_data_pipeline_spark.suite_llm import _h64, _load_docs

_TOKS = ("list_filter(string_split_regex(trim(text), '\\s+'),"
         " x -> x <> '')")
_EN = "['" + "','".join(TX.LANG_LEXICONS["en"]) + "']"

# quality_metrics columns rendered in DuckDB SQL (same as q19's oracle)
_METRICS_SQL = f"""
m AS (SELECT doc_id,
             len({_TOKS}) AS n_words,
             round(length(regexp_replace(text, '\\s', '', 'g'))
                   / nullif(len({_TOKS})::DOUBLE, 0.0), 6)
                 AS avg_word_len,
             round(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]'))
                   / nullif(length(text)::DOUBLE, 0.0), 6)
                 AS punct_ratio,
             round(len(regexp_extract_all(text, '[0-9]'))
                   / nullif(length(text)::DOUBLE, 0.0), 6)
                 AS digit_ratio,
             round(len(list_filter({_TOKS},
                                   x -> list_contains({_EN}, x)))
                   / nullif(len({_TOKS})::DOUBLE, 0.0), 6)
                 AS stopword_ratio
      FROM documents)
"""


# ----------------------------------------------------- q68 quality gate

def q_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style quality gate: ordered rule evaluation, keep flag +
    first-firing reject_reason. Pure codegen projection."""
    out = TX.quality_filter(_load_docs(spark, sf_dir))
    return out.select("doc_id", "n_words", "keep", "reject_reason")


def _oracle_quality_filter() -> str:
    rules = TX.quality_rules_sql()
    # first-firing rule via a CASE in declared order
    case = "CASE " + " ".join(
        f"WHEN ({pred}) THEN '{name}'" for name, pred in rules
    ) + " ELSE NULL END"
    anyfired = " OR ".join(f"coalesce(({pred}), FALSE)"
                           for _n, pred in rules)
    return f"""
WITH {_METRICS_SQL}
SELECT doc_id, n_words, NOT ({anyfired}) AS keep,
       {case} AS reject_reason
FROM m
"""


ORACLE_QUALITY_FILTER = _oracle_quality_filter()


# ----------------------------------------- q69 incremental corpus dedup

def q_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """New-batch-vs-corpus exact dedup: batch = doc_id % 5 == 0,
    corpus = the rest; survivors = in-batch first-wins minus any text
    already in the corpus (hash anti-join — bytes move, not docs)."""
    docs = _load_docs(spark, sf_dir)
    corpus = docs.where(F.col("doc_id") % 5 != 0)
    batch = docs.where(F.col("doc_id") % 5 == 0)
    return D.incremental_exact_dedup(corpus, batch)


ORACLE_INCREMENTAL_DEDUP = """
WITH h AS (SELECT doc_id,
                  ('0x' || substr(md5(text), 1, 15))::BIGINT AS content_hash
           FROM documents),
b AS (SELECT content_hash, min(doc_id) AS doc_id
      FROM h WHERE doc_id % 5 = 0 GROUP BY 1)
SELECT b.doc_id, b.content_hash
FROM b
WHERE NOT EXISTS (SELECT 1 FROM h c
                  WHERE c.doc_id % 5 <> 0
                    AND c.content_hash = b.content_hash)
"""


# -------------------------------------------- q70 sketch-based profile

def q_approx_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based corpus profile per event_type: HLL++ distinct
    users (order-independent register-max merge ⇒ deterministic) and
    Greenwald-Khanna p50/p95 of value. The 100 TB answer to q46/q65's
    exact versions: fixed-size sketch state per group instead of a
    distinct expansion or full sort.

    Sketch outputs can't be replayed by another engine, but the
    accuracy CLAIM can: each group emits booleans asserting the sketch
    answer lies within its documented error band of the exact answer
    computed in the same plan (HLL rsd=2% checked at ±10%; GK rank
    error 1e-4 checked against the exact 49/51 and 94/96 percentile
    envelope). The oracle computes the exact side and emits `true`
    constants — so a hash match proves the bounds held.

    Cost note: the exact side (count_distinct + exact percentiles)
    exists ONLY as the verification harness and makes this query
    ~10× the sketch-alone cost (q70 bench 0.4 s → 4 s). The
    production plan at 100 TB is the sketch aggregation alone —
    fixed-size state per group, no distinct expansion, no per-group
    sort — which this query's first three agg expressions are.
    """
    ev = load(spark, sf_dir, "events")
    agg = (ev.groupBy("event_type")
           .agg(F.approx_count_distinct("user_id", rsd=0.02)
                .alias("_au"),
                F.count_distinct("user_id").alias("_eu"),
                F.percentile_approx("value", [0.5, 0.95], 10_000)
                .alias("_ap"),
                F.percentile("value", [0.49, 0.51, 0.94, 0.96])
                .alias("_ep"),
                F.count("*").alias("n_events")))
    return agg.select(
        "event_type", "n_events",
        (F.abs(F.col("_au") - F.col("_eu"))
         <= 0.10 * F.col("_eu")).alias("approx_users_ok"),
        F.col("_ap")[0].between(F.col("_ep")[0], F.col("_ep")[1])
        .alias("p50_ok"),
        F.col("_ap")[1].between(F.col("_ep")[2], F.col("_ep")[3])
        .alias("p95_ok"))


ORACLE_APPROX_PROFILE = """
SELECT event_type, count(*) AS n_events,
       true AS approx_users_ok, true AS p50_ok, true AS p95_ok
FROM events GROUP BY 1
"""


# ----------------------------------------------- q71 token rarity score

def q_token_rarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-relative rarity per doc: mean corpus token frequency +
    fraction of tokens below the vocabulary's mean frequency (integer-
    exact predicate freq·|V| < total — no float compare)."""
    return TX.token_rarity(_load_docs(spark, sf_dir))


ORACLE_TOKEN_RARITY = f"""
WITH tok AS (SELECT doc_id, unnest({_TOKS}) AS t FROM documents),
freq AS (SELECT t, count(*) AS f FROM tok GROUP BY 1),
tot AS (SELECT CAST(sum(f) AS BIGINT) AS total,
               count(*) AS vocab FROM freq)
SELECT tok.doc_id,
       count(*) AS n_tokens,
       round(CAST(sum(f) AS BIGINT)
             / CAST(count(*) AS DOUBLE), 6) AS avg_token_freq,
       round(CAST(sum(CASE WHEN f * vocab < total THEN 1 ELSE 0 END)
                  AS BIGINT)
             / CAST(count(*) AS DOUBLE), 6) AS rare_token_ratio
FROM tok JOIN freq USING (t) CROSS JOIN tot
GROUP BY tok.doc_id
"""


# -------------------------------------------- q72 repetition (Gopher)

def q_repetition_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-doc repetition: duplicate-token, top-token and top-bigram
    fractions — exact integer ratios, two combinable aggregations."""
    return TX.repetition_metrics(_load_docs(spark, sf_dir))


ORACLE_REPETITION_METRICS = f"""
WITH d AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
tok AS (SELECT doc_id, unnest(toks) AS t FROM d),
pt AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
              count(*) AS dist, max(c) AS top
       FROM (SELECT doc_id, t, count(*) AS c FROM tok GROUP BY 1, 2)
       GROUP BY 1),
big AS (SELECT doc_id,
               unnest(list_transform(range(1, len(toks)),
                                     i -> toks[i] || ' ' || toks[i+1]))
                   AS g
        FROM d WHERE len(toks) >= 2),
pb AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS nb, max(c) AS topb
       FROM (SELECT doc_id, g, count(*) AS c FROM big GROUP BY 1, 2)
       GROUP BY 1)
SELECT pt.doc_id, pt.n_tokens,
       round((pt.n_tokens - pt.dist) / CAST(pt.n_tokens AS DOUBLE), 6)
           AS dup_token_ratio,
       round(pt.top / CAST(pt.n_tokens AS DOUBLE), 6)
           AS top_token_ratio,
       round(pb.topb / CAST(pb.nb AS DOUBLE), 6) AS top_bigram_ratio
FROM pt LEFT JOIN pb USING (doc_id)
"""


# ------------------------------------- q126 benchmark contamination

def q_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination pass: 5-gram overlap of every training doc
    (doc_id ≥ 20) against the 'benchmark' slice (doc_id < 20) —
    benchmark grams collapse to a broadcast hash set, the corpus side
    never self-joins."""
    docs = _load_docs(spark, sf_dir)
    return TX.ngram_contamination(
        docs.where(F.col("doc_id") >= 20),
        docs.where(F.col("doc_id") < 20), k=5)


_GRAMS5 = ("list_distinct(list_transform("
           "generate_series(0, greatest(len(toks) - 5, 0)), "
           "i -> array_to_string(toks[i+1:i+5], ' ')))")

ORACLE_CONTAMINATION = f"""
WITH tk AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
g AS (SELECT doc_id, unnest({_GRAMS5}) AS gram FROM tk),
bench AS (SELECT DISTINCT gram FROM g WHERE doc_id < 20),
tr AS (SELECT doc_id, gram,
              CASE WHEN gram IN (SELECT gram FROM bench)
                   THEN 1 ELSE 0 END AS hit
       FROM g WHERE doc_id >= 20)
SELECT doc_id, count(*) AS n_grams,
       CAST(sum(hit) AS BIGINT) AS n_shared,
       round(sum(hit) / CAST(count(*) AS DOUBLE), 6)
           AS contamination_ratio
FROM tr GROUP BY doc_id
"""


# ------------------------------------------------ q127 PII redaction

def q_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub over a corpus with deterministically injected
    emails / phone numbers / IPv4s (the synthetic docs carry none);
    emits per-kind counts plus an md5 fingerprint of the redacted
    text so the replacement itself is under the hash check."""
    docs = _load_docs(spark, sf_dir)
    suffix = (
        F.when(F.col("doc_id") % 3 == 0,
               F.concat(F.lit(" contact user"),
                        F.col("doc_id").cast("string"),
                        F.lit("@example.com now")))
        .when(F.col("doc_id") % 3 == 1,
              F.concat(F.lit(" call 555-010-"),
                       F.lpad((F.col("doc_id") % 10000).cast("string"),
                              4, "0")))
        .otherwise(F.concat(F.lit(" from 10.0.0."),
                            (F.col("doc_id") % 256).cast("string"))))
    seeded = docs.select("doc_id",
                         F.concat("text", suffix).alias("text"))
    out = TX.redact_pii(seeded)
    return out.select("doc_id", "n_email", "n_phone", "n_ip",
                      F.md5("redacted").alias("redacted_md5"))


def _oracle_pii() -> str:
    stages = []
    cur = "seeded.text"
    for name, pat, repl in TX.PII_PATTERNS:
        stages.append(
            (f"len(regexp_extract_all({cur}, '{pat}')) AS n_{name}", cur))
        cur = f"regexp_replace({cur}, '{pat}', '{repl}', 'g')"
    counts = ",\n       ".join(s for s, _ in stages)
    return f"""
WITH seeded AS (
  SELECT doc_id,
         text || CASE
           WHEN doc_id % 3 = 0
             THEN ' contact user' || doc_id || '@example.com now'
           WHEN doc_id % 3 = 1
             THEN ' call 555-010-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
           ELSE ' from 10.0.0.' || CAST(doc_id % 256 AS VARCHAR)
         END AS text
  FROM documents)
SELECT doc_id,
       {counts},
       md5({cur}) AS redacted_md5
FROM seeded
"""


# ---------------------------------------- q128 sequence packing plan

def q_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window packing plan: per-source token streams chunked
    into 1024-token windows; emits each doc's (start/end pack,
    offset). Window runs per source shard — no global sort."""
    return TX.sequence_packing(_load_docs(spark, sf_dir), budget=1024)


ORACLE_SEQUENCE_PACKING = f"""
WITH t AS (SELECT doc_id, source AS part, len({_TOKS}) AS n
           FROM documents),
c AS (SELECT doc_id, part, n,
             CAST(sum(n) OVER (PARTITION BY part ORDER BY doc_id
                               ROWS UNBOUNDED PRECEDING) - n AS BIGINT)
                 AS before
      FROM t)
SELECT doc_id, part, CAST(n AS BIGINT) AS n_tokens,
       before // 1024 AS start_pack,
       (before + n - 1) // 1024 AS end_pack,
       before % 1024 AS start_offset
FROM c
"""


# ----------------------------------------- q129 deterministic splits

def q_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/10/10 train/val/test by salted id hash (stable across runs
    and engines); emits per-(source, split) doc counts."""
    out = TX.hash_split(_load_docs(spark, sf_dir), salt="v1")
    return (out.groupBy("source", "split")
            .agg(F.count("*").alias("n_docs")))


ORACLE_HASH_SPLIT = f"""
WITH b AS (SELECT source,
                  {{h}} % 100 AS bucket
           FROM documents)
SELECT source,
       CASE WHEN bucket < 80 THEN 'train'
            WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split,
       count(*) AS n_docs
FROM b GROUP BY 1, 2
""".format(h=_h64("doc_id || ':v1'"))


# --------------------------- q141 bigram-LM cross-entropy (CCNet-ish)

def q_lm_cross_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-bucket quality scoring: a Laplace-smoothed bigram LM
    trained on the 80% hash split scores every doc's cross-entropy —
    the CCNet filter shape with the corpus itself as the LM."""
    return TX.lm_cross_entropy(_load_docs(spark, sf_dir))


_LTOKS_P = ("list_filter(string_split_regex(trim(lower(text)),"
            " '\\s+'), x -> x <> '')")

ORACLE_LM_CROSS_ENTROPY = f"""
WITH d AS (SELECT doc_id, {_LTOKS_P} AS t,
                  {_h64("doc_id || ':lm1'")} % 100 AS b
           FROM documents),
bi AS (SELECT doc_id, b,
              unnest(t[1:len(t)-1]) AS w1,
              unnest(t[2:len(t)]) AS w2
       FROM d WHERE len(t) >= 2),
c2 AS (SELECT w1, w2, count(*) AS c2 FROM bi WHERE b < 80 GROUP BY 1, 2),
c1 AS (SELECT w1, count(*) AS c1 FROM bi WHERE b < 80 GROUP BY 1),
v AS (SELECT count(DISTINCT w) AS v
      FROM (SELECT unnest(t) AS w FROM d WHERE b < 80)),
terms AS (SELECT bi.doc_id,
                 CAST(-ln((coalesce(c2.c2, 0) + 1)::DOUBLE
                          / (coalesce(c1.c1, 0) + v.v)::DOUBLE)
                      AS DECIMAL(28,12)) AS term
          FROM bi LEFT JOIN c2 USING (w1, w2)
          LEFT JOIN c1 USING (w1) CROSS JOIN v),
agg AS (SELECT doc_id, count(*) AS n_bigrams, sum(term) AS s
        FROM terms GROUP BY 1)
SELECT d.doc_id, (d.b < 80) AS is_train,
       coalesce(agg.n_bigrams, 0) AS n_bigrams,
       round(CAST(agg.s AS DOUBLE) / agg.n_bigrams, 6) + 0.0
           AS cross_entropy_nats
FROM d LEFT JOIN agg USING (doc_id)
"""


# ------------------------------------------ q150 chunk-level dedup

def q_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup at CHUNK granularity — the pass that catches boilerplate
    repeated across documents that doc-level dedup misses: chunk the
    corpus (q146 shape), group by content hash, keep the first
    (doc, idx) owner, count the copies. One shuffle on the 8-byte
    chunk hash; emits only duplicated chunks."""
    chunks = TX.chunk_documents(_load_docs(spark, sf_dir),
                                window=16, stride=16)
    return (chunks.groupBy("chunk_hash")
            .agg(F.count("*").alias("n_copies"),
                 F.min(F.struct("doc_id", "chunk_idx")).alias("_first"))
            .where(F.col("n_copies") > 1)
            .select("chunk_hash", "n_copies",
                    F.col("_first.doc_id").alias("owner_doc"),
                    F.col("_first.chunk_idx").alias("owner_chunk")))


def _oracle_chunk_dedup() -> str:
    # the q146 chunk CTE at window=stride=16 (disjoint chunks), then
    # hash-grouped ownership
    return f"""
WITH d AS (SELECT doc_id, {_TOKS} AS t FROM documents),
b AS (SELECT doc_id, t, len(t) AS n,
             (CAST(ceil(greatest(len(t) - 16, 0) / 16.0) AS INTEGER)
              + 1) AS k
      FROM d WHERE len(t) > 0),
c AS (SELECT doc_id, t, n,
             unnest(generate_series(0, k - 1)) AS chunk_idx
      FROM b),
p AS (SELECT doc_id, chunk_idx,
             t[chunk_idx * 16 + 1 :
               chunk_idx * 16 + least(16, n - chunk_idx * 16)] AS piece
      FROM c),
h AS (SELECT doc_id, chunk_idx,
             {_h64("array_to_string(piece, ' ')")} AS chunk_hash
      FROM p)
SELECT chunk_hash, count(*) AS n_copies,
       min(struct_pack(doc_id := doc_id, chunk_idx := chunk_idx))
           .doc_id AS owner_doc,
       min(struct_pack(doc_id := doc_id, chunk_idx := chunk_idx))
           .chunk_idx AS owner_chunk
FROM h GROUP BY 1 HAVING count(*) > 1
"""


# ------------------------------------ q148 source-mixture reweighting

_MIX_TARGETS = {f"src{i}": i % 4 + 1 for i in range(20)}


def q_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data mixing: downsample-only rates per source that hit skewed
    integer target weights at the largest achievable corpus size —
    the rates feed the deterministic hash sampler unchanged."""
    return TX.mixture_weights(_load_docs(spark, sf_dir), _MIX_TARGETS)


def _oracle_mixture_weights() -> str:
    w_case = " ".join(
        f"WHEN source = 'src{i}' THEN {i % 4 + 1}" for i in range(20))
    W = sum(i % 4 + 1 for i in range(20))
    return f"""
WITH per AS (SELECT source, count(*) AS n_docs,
                    CAST(sum(len({_TOKS})) AS BIGINT) AS n_tokens,
                    (CASE {w_case} ELSE 0 END) AS w
             FROM documents GROUP BY source),
t AS (SELECT min(n_tokens::DOUBLE * {W}.0 / w) AS T
      FROM per WHERE w > 0)
SELECT source, n_docs, n_tokens,
       round(w / {W}.0, 6) + 0.0 AS target_share,
       round(CASE WHEN w > 0
                  THEN w * t.T / ({W}.0 * n_tokens) ELSE 0.0 END, 6)
           + 0.0 AS sample_rate
FROM per, t
"""


# ----------------------------- q146 sliding-window document chunking

def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG/pretraining chunk prep: 64-token windows, stride 48, with
    stable (doc, idx) identity, offsets and a portable chunk hash."""
    return TX.chunk_documents(_load_docs(spark, sf_dir),
                              window=64, stride=48)


ORACLE_CHUNK_DOCUMENTS = f"""
WITH d AS (SELECT doc_id, {_TOKS} AS t FROM documents),
b AS (SELECT doc_id, t, len(t) AS n,
             (CAST(ceil(greatest(len(t) - 64, 0) / 48.0) AS INTEGER)
              + 1) AS k
      FROM d WHERE len(t) > 0),
c AS (SELECT doc_id, t, n,
             unnest(generate_series(0, k - 1)) AS chunk_idx
      FROM b),
p AS (SELECT doc_id, chunk_idx,
             (chunk_idx * 48)::BIGINT AS start_token,
             t[chunk_idx * 48 + 1 :
               chunk_idx * 48 + least(64, n - chunk_idx * 48)] AS piece
      FROM c)
SELECT doc_id, chunk_idx::INTEGER AS chunk_idx, start_token,
       len(piece)::BIGINT AS n_tokens,
       {_h64("array_to_string(piece, ' ')")} AS chunk_hash
FROM p
"""


# ------------------------------------ q152 training-shard manifest

def q_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic shuffle+shard of the corpus for a training export
    (operators/text.py::shard_assignment): 8 shards by id hash, a
    second hash as the within-shard shuffle order. Emits the shard
    MANIFEST — per shard: doc count, byte volume, and the first/last
    doc in shuffle order (the reproducibility contract a training job
    checks before consuming). One groupBy shuffle; first/last via
    partial-aggable min_by/max_by, no window sort."""
    d = TX.shard_assignment(_load_docs(spark, sf_dir))
    key = F.struct(F.col("_okey"), F.col("doc_id"))
    return (d.groupBy("shard")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("n_chars").alias("n_bytes"),
                 F.min_by("doc_id", key).alias("first_doc"),
                 F.max_by("doc_id", key).alias("last_doc")))


ORACLE_SHARD_MANIFEST = f"""
WITH b AS (SELECT doc_id, n_chars,
                  {_h64("doc_id || ':shard1'")} % 8 AS shard,
                  {_h64("doc_id || ':ord1'")} AS okey
           FROM documents),
r AS (SELECT *,
             row_number() OVER (PARTITION BY shard
                                ORDER BY okey, doc_id) AS rn_a,
             row_number() OVER (PARTITION BY shard
                                ORDER BY okey DESC, doc_id DESC) AS rn_d
      FROM b)
SELECT shard, count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS n_bytes,
       max(CASE WHEN rn_a = 1 THEN doc_id END) AS first_doc,
       max(CASE WHEN rn_d = 1 THEN doc_id END) AS last_doc
FROM r GROUP BY shard
"""


# ------------------------------------- q153 leakage-safe corpus split

def q_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup-aware train/val/test split: hash-split on the near-dup
    CLUSTER representative (q61's connected components over the
    materialized MinHash-LSH pair graph) instead of the raw doc id, so
    near-duplicates can never straddle splits — the train/test-leakage
    failure mode of id-hash splits on undeduplicated corpora. Emits
    per-split doc/cluster counts plus the straddling-pair count
    (0 by construction — computed, not asserted, so the oracle hash
    actually checks the property)."""
    from industrial_data_pipeline_spark.operators.dedup import (
        connected_components)
    from industrial_data_pipeline_spark.suite_corpus import (
        _pairs_materialized)
    from industrial_data_pipeline_spark.suite_llm import _mut_corpus
    pairs = _pairs_materialized(spark, sf_dir)
    clusters = connected_components(pairs, "id_a", "id_b")
    docs = _mut_corpus(spark, sf_dir).select("doc_id")
    lab = (docs.join(clusters, "doc_id", "left")
           .withColumn("cluster_id",
                       F.coalesce("cluster_id", F.col("doc_id"))))
    sp = TX.hash_split(lab, salt="cs1", id_col="cluster_id")
    a = sp.select(F.col("doc_id").alias("id_a"),
                  F.col("split").alias("_sa"))
    b = sp.select(F.col("doc_id").alias("id_b"),
                  F.col("split").alias("_sb"))
    leak = (pairs.join(a, "id_a").join(b, "id_b")
            .where(F.col("_sa") != F.col("_sb"))
            .agg(F.count("*").alias("n_leaky_pairs")))
    out = (sp.groupBy("split")
           .agg(F.count("*").alias("n_docs"),
                F.countDistinct("cluster_id").alias("n_clusters")))
    return out.crossJoin(F.broadcast(leak))


def _oracle_leakage_safe_split() -> str:
    from industrial_data_pipeline_spark.suite_llm import (
        _MUT_SQL,
        ORACLE_MINHASH_LSH,
    )
    return f"""
WITH RECURSIVE pairs AS ({ORACLE_MINHASH_LSH}),
edges AS (SELECT id_a AS u, id_b AS v FROM pairs
          UNION SELECT id_b, id_a FROM pairs),
walk AS (
  SELECT u AS node, u AS reach FROM (SELECT DISTINCT u FROM edges)
  UNION
  SELECT w.node, e.v FROM walk w JOIN edges e ON w.reach = e.u
),
cl AS (SELECT node AS doc_id, min(reach) AS cluster_id
       FROM walk GROUP BY node),
corpus AS (SELECT doc_id FROM ({_MUT_SQL}) _m),
lab AS (SELECT c.doc_id,
               coalesce(cl.cluster_id, c.doc_id) AS cluster_id
        FROM corpus c LEFT JOIN cl USING (doc_id)),
sp AS (SELECT doc_id, cluster_id,
              CASE WHEN {_h64("cluster_id || ':cs1'")} % 100 < 80
                     THEN 'train'
                   WHEN {_h64("cluster_id || ':cs1'")} % 100 < 90
                     THEN 'val' ELSE 'test' END AS split
       FROM lab),
leak AS (SELECT count(*) AS n_leaky_pairs
         FROM pairs p JOIN sp a ON p.id_a = a.doc_id
                      JOIN sp b ON p.id_b = b.doc_id
         WHERE a.split != b.split)
SELECT sp.split, count(*) AS n_docs,
       CAST(count(DISTINCT sp.cluster_id) AS BIGINT) AS n_clusters,
       leak.n_leaky_pairs
FROM sp, leak GROUP BY sp.split, leak.n_leaky_pairs
"""


# ------------------------------- q163 end-to-end curation pipeline

def q_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The WHOLE curation pipeline as ONE lazy DAG — quality gate →
    exact dedup (first-wins) → deterministic hash split → packing
    budget — the way a production run actually composes these
    operators: Catalyst sees every stage at once, so column pruning
    reaches the scan (only doc_id/text survive the gate) and the
    dedup shuffle reuses the gate's narrow projection. Emits
    per-split doc/token/pack totals — the numbers a training job
    checks before consuming the export."""
    docs = _load_docs(spark, sf_dir)
    gated = (TX.quality_filter(docs).where(F.col("keep"))
             .select("doc_id", "text"))
    kept = D.exact_dedup(gated, "doc_id")
    split = TX.hash_split(kept, salt="v1")
    ntok = F.size(TX.tokens(F.col("text")))
    return (split.groupBy("split")
            .agg(F.count("*").alias("n_docs"),
                 F.sum(ntok).alias("n_tokens"),
                 (F.floor((F.sum(ntok) - 1) / 1024) + 1)
                 .alias("n_packs")))


def _oracle_curation_pipeline() -> str:
    from industrial_data_pipeline_spark.suite_llm import _NORM_TEXT
    rules = TX.quality_rules_sql()
    anyfired = " OR ".join(f"coalesce(({pred}), FALSE)"
                           for _n, pred in rules)
    return f"""
WITH {_METRICS_SQL},
gate AS (SELECT doc_id FROM m WHERE NOT ({anyfired})),
keyed AS (SELECT d.doc_id, {_NORM_TEXT} AS fp,
                 len({_TOKS}) AS ntok
          FROM documents d JOIN gate USING (doc_id)),
g AS (SELECT fp, min(doc_id) AS keep FROM keyed GROUP BY fp),
kept AS (SELECT k.doc_id, k.ntok
         FROM keyed k JOIN g ON k.fp = g.fp AND k.doc_id = g.keep),
sp AS (SELECT ntok,
              CASE WHEN {_h64("doc_id || ':v1'")} % 100 < 80
                     THEN 'train'
                   WHEN {_h64("doc_id || ':v1'")} % 100 < 90
                     THEN 'val' ELSE 'test' END AS split
       FROM kept)
SELECT split, count(*) AS n_docs,
       CAST(sum(ntok) AS BIGINT) AS n_tokens,
       CAST(floor((CAST(sum(ntok) AS DOUBLE) - 1) / 1024) + 1
            AS BIGINT) AS n_packs
FROM sp GROUP BY split
"""


REGISTRY_PIPELINE: dict[str, tuple] = {
    "q68_quality_filter": (q_quality_filter, ORACLE_QUALITY_FILTER),
    "q69_incremental_dedup": (q_incremental_dedup,
                              ORACLE_INCREMENTAL_DEDUP),
    "q70_approx_profile": (q_approx_profile, ORACLE_APPROX_PROFILE),
    "q71_token_rarity": (q_token_rarity, ORACLE_TOKEN_RARITY),
    "q72_repetition_metrics": (q_repetition_metrics,
                               ORACLE_REPETITION_METRICS),
    "q126_contamination": (q_contamination, ORACLE_CONTAMINATION),
    "q127_pii_redaction": (q_pii_redaction, _oracle_pii()),
    "q128_sequence_packing": (q_sequence_packing,
                              ORACLE_SEQUENCE_PACKING),
    "q129_hash_split": (q_hash_split, ORACLE_HASH_SPLIT),
    "q141_lm_cross_entropy": (q_lm_cross_entropy,
                              ORACLE_LM_CROSS_ENTROPY),
    "q146_chunk_documents": (q_chunk_documents, ORACLE_CHUNK_DOCUMENTS),
    "q148_mixture_weights": (q_mixture_weights,
                             _oracle_mixture_weights()),
    "q150_chunk_dedup": (q_chunk_dedup, _oracle_chunk_dedup()),
    "q152_shard_manifest": (q_shard_manifest, ORACLE_SHARD_MANIFEST),
    "q153_leakage_safe_split": (q_leakage_safe_split,
                                _oracle_leakage_safe_split()),
    "q163_curation_pipeline": (q_curation_pipeline,
                               _oracle_curation_pipeline()),
}


# ------------------------ q171 trigram-index LIKE search (P6 at scale)

_LIKE_PATTERN = "merge batch"


def q_trigram_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's '%pattern%' lookup (P6/q03) at 100 TB: a
    character-trigram inverted index intersects posting lists to a
    candidate set, exact LIKE verifies survivors — identical results
    to the scan at index-lookup cost (operators/text.py::
    trigram_like_search). n_candidates rides along so the pruning
    claim is itself hash-checked."""
    return TX.trigram_like_search(_load_docs(spark, sf_dir),
                                  _LIKE_PATTERN)


def _oracle_trigram_search() -> str:
    qgrams = sorted({_LIKE_PATTERN[i:i + 3]
                     for i in range(len(_LIKE_PATTERN) - 2)})
    glist = ", ".join("'" + g.replace("'", "''") + "'" for g in qgrams)
    return f"""
WITH tri AS (SELECT doc_id,
                    unnest(list_distinct(list_transform(
                        generate_series(1, length(text) - 2),
                        i -> substr(text, i, 3)))) AS tg
             FROM documents),
q AS (SELECT unnest([{glist}]) AS tg),
cand AS (SELECT doc_id FROM tri JOIN q USING (tg)
         GROUP BY doc_id HAVING count(DISTINCT tg) = {len(qgrams)}),
nc AS (SELECT count(*) AS n_candidates FROM cand)
SELECT d.doc_id, nc.n_candidates
FROM documents d JOIN cand USING (doc_id) CROSS JOIN nc
WHERE d.text LIKE '%{_LIKE_PATTERN}%'
"""


REGISTRY_PIPELINE.update({
    "q171_trigram_search": (q_trigram_search, _oracle_trigram_search()),
})


# --------------------------- q191 golden-record survivorship (MDM)

def q_golden_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivorship after dedup — the MDM step q132 stops short of:
    for every exact-duplicate cluster (normalized-text fingerprint),
    BUILD the merged golden record field by field: lowest id as the
    stable key, the longest raw text's length, every contributing
    source (sorted, deduped), and the member count. One fingerprint
    shuffle + partial-aggable min/max_by/collect_set — no windows.
    The corpus has no exact dups at gate scale, so 30 exact mirrors
    (new ids, source='mirror') are planted — the merge then has real
    multi-source clusters to survive."""
    base = _load_docs(spark, sf_dir).select("doc_id", "text", "source")
    mirror = (base.where(F.col("doc_id") < 30)
              .select((F.col("doc_id") + 200000).alias("doc_id"),
                      "text", F.lit("mirror").alias("source")))
    docs = base.unionByName(mirror)
    fp = TX.hash64(F.regexp_replace(
        F.lower(F.trim(F.col("text"))), r"\s+", " "))
    keyed = docs.withColumn("_fp", fp)
    return (keyed.groupBy("_fp")
            .agg(F.min("doc_id").alias("golden_id"),
                 F.count("*").alias("n_members"),
                 F.max(F.length("text")).alias("best_text_len"),
                 F.concat_ws(",", F.array_sort(
                     F.collect_set("source"))).alias("sources"))
            .where(F.col("n_members") > 1)
            .drop("_fp"))


ORACLE_GOLDEN_RECORDS = """
WITH corpus AS (
  SELECT doc_id, text, source FROM documents
  UNION ALL
  SELECT doc_id + 200000, text, 'mirror' FROM documents
  WHERE doc_id < 30),
keyed AS (
  SELECT doc_id, source, length(text) AS tl,
         ('0x' || substr(md5(regexp_replace(lower(trim(text)),
                                            '\\s+', ' ', 'g')),
                         1, 15))::BIGINT AS fp
  FROM corpus)
SELECT min(doc_id) AS golden_id, count(*) AS n_members,
       max(tl) AS best_text_len,
       array_to_string(list_sort(list_distinct(list(source))), ',')
           AS sources
FROM keyed GROUP BY fp HAVING count(*) > 1
"""

REGISTRY_PIPELINE.update({
    "q191_golden_records": (q_golden_records, ORACLE_GOLDEN_RECORDS),
})


# ------------------------------ q196 dataset card (corpus manifest)

def q_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dataset card as ONE query: the corpus-level numbers every
    dataset release publishes — document and token volume, source and
    language diversity, exact-duplicate rate, quality-gate pass rate
    — composed from the suite's own exact machinery in a single row.
    Counts are exact integers; the two ratios are single IEEE
    divisions of exact integers, emitted raw."""
    docs = _load_docs(spark, sf_dir)
    fp = TX.hash64(F.regexp_replace(
        F.lower(F.trim(F.col("text"))), r"\s+", " "))
    gated = TX.quality_filter(docs)
    base = (docs.withColumn("_fp", fp)
            .agg(F.count("*").alias("n_docs"),
                 F.sum(F.size(TX.tokens(F.col("text"))))
                 .alias("n_tokens"),
                 F.countDistinct("source").alias("n_sources"),
                 F.countDistinct("lang").alias("n_langs"),
                 F.countDistinct("_fp").alias("_nfp")))
    keep = gated.agg(
        F.sum(F.when(F.col("keep"), 1).otherwise(0)).alias("_nkeep"))
    return (base.crossJoin(F.broadcast(keep))
            .select("n_docs", "n_tokens", "n_sources", "n_langs",
                    (F.col("n_docs") - F.col("_nfp"))
                    .alias("n_exact_dups"),
                    ((F.col("n_docs") - F.col("_nfp")).cast("double")
                     / F.col("n_docs") + F.lit(0.0))
                    .alias("dup_rate"),
                    F.col("_nkeep").alias("n_quality_keep"),
                    (F.col("_nkeep").cast("double") / F.col("n_docs")
                     + F.lit(0.0)).alias("quality_keep_rate")))


def _oracle_dataset_card() -> str:
    rules = TX.quality_rules_sql()
    anyfired = " OR ".join(f"coalesce(({pred}), FALSE)"
                           for _n, pred in rules)
    return f"""
WITH {_METRICS_SQL},
g AS (SELECT count(*) AS nkeep FROM m WHERE NOT ({anyfired})),
b AS (SELECT count(*) AS n_docs,
             CAST(sum(len({_TOKS})) AS BIGINT) AS n_tokens,
             count(DISTINCT source) AS n_sources,
             count(DISTINCT lang) AS n_langs,
             count(DISTINCT ('0x' || substr(md5(
                 regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')),
                 1, 15))::BIGINT) AS nfp
      FROM documents)
SELECT b.n_docs, b.n_tokens, b.n_sources, b.n_langs,
       b.n_docs - b.nfp AS n_exact_dups,
       (CAST(b.n_docs - b.nfp AS DOUBLE) / b.n_docs) + 0.0
           AS dup_rate,
       g.nkeep AS n_quality_keep,
       (CAST(g.nkeep AS DOUBLE) / b.n_docs) + 0.0
           AS quality_keep_rate
FROM b CROSS JOIN g
"""


REGISTRY_PIPELINE.update({
    "q196_dataset_card": (q_dataset_card, _oracle_dataset_card()),
})


# ------------------------- q198 curation funnel (per-stage drop-off)

def q_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The drop-off report of the whole curation pipeline — the chart
    every dataset paper prints: survivor counts per stage, raw →
    quality gate → exact dedup → decontamination (>10% 5-gram
    benchmark overlap drops) → train split. Each stage filters the
    previous stage's survivors (q163 emits the end state; this emits
    the funnel), all counts exact, one row per stage with the stage
    ordinal so the driver's order-insensitive hash still pins the
    sequence."""
    docs = _load_docs(spark, sf_dir)
    train_docs = docs.where(F.col("doc_id") >= 20)
    s0 = train_docs.select("doc_id")
    s1 = (TX.quality_filter(train_docs).where(F.col("keep"))
          .select("doc_id", "text"))
    s2 = D.exact_dedup(s1, "doc_id").select("doc_id", "text")
    cont = TX.ngram_contamination(
        s2, docs.where(F.col("doc_id") < 20), k=5)
    s3 = (s2.join(cont.where(F.col("contamination_ratio") <= 0.10)
                  .select("doc_id"), "doc_id"))
    s4 = TX.hash_split(s3, salt="v1").where(F.col("split") == "train")
    stages = [("0_raw", s0), ("1_quality", s1), ("2_dedup", s2),
              ("3_decontaminated", s3), ("4_train", s4)]
    out = None
    for name, df in stages:
        row = df.agg(F.count("*").alias("n_docs")) \
            .withColumn("stage", F.lit(name))
        out = row if out is None else out.unionByName(row)
    return out.select("stage", "n_docs")


def _oracle_curation_funnel() -> str:
    from industrial_data_pipeline_spark.suite_llm import _NORM_TEXT
    rules = TX.quality_rules_sql()
    anyfired = " OR ".join(f"coalesce(({pred}), FALSE)"
                           for _n, pred in rules)
    return f"""
WITH {_METRICS_SQL},
s1 AS (SELECT d.doc_id, d.text FROM documents d
       JOIN m USING (doc_id)
       WHERE d.doc_id >= 20 AND NOT ({anyfired})),
keyed AS (SELECT doc_id, text, {_NORM_TEXT} AS fp FROM s1),
g2 AS (SELECT fp, min(doc_id) AS keep FROM keyed GROUP BY fp),
s2 AS (SELECT k.doc_id, k.text FROM keyed k
       JOIN g2 ON k.fp = g2.fp AND k.doc_id = g2.keep),
tkb AS (SELECT doc_id, {_TOKS} AS toks FROM documents
        WHERE doc_id < 20),
bench AS (SELECT DISTINCT {_h64('gram')} AS h FROM
            (SELECT unnest({_GRAMS5_B}) AS gram FROM tkb)),
tk2 AS (SELECT doc_id, {_TOKS} AS toks FROM s2),
tr AS (SELECT doc_id, {_h64('gram')} AS h FROM
         (SELECT doc_id, unnest({_GRAMS5_B}) AS gram FROM tk2)),
cont AS (SELECT tr.doc_id,
                count(*) AS ng,
                sum(CASE WHEN tr.h IN (SELECT h FROM bench)
                    THEN 1 ELSE 0 END) AS ns
         FROM tr GROUP BY tr.doc_id),
s3 AS (SELECT s2.doc_id FROM s2 JOIN cont USING (doc_id)
       WHERE ns / CAST(ng AS DOUBLE) <= 0.10),
s4 AS (SELECT doc_id FROM s3
       WHERE {_h64("doc_id || ':v1'")} % 100 < 80)
SELECT '0_raw' AS stage, count(*) AS n_docs FROM documents
  WHERE doc_id >= 20
UNION ALL SELECT '1_quality', count(*) FROM s1
UNION ALL SELECT '2_dedup', count(*) FROM s2
UNION ALL SELECT '3_decontaminated', count(*) FROM s3
UNION ALL SELECT '4_train', count(*) FROM s4
"""


_GRAMS5_B = ("list_distinct(list_transform("
             "generate_series(0, greatest(len(toks) - 5, 0)), "
             "i -> array_to_string(toks[i+1:i+5], ' ')))")

REGISTRY_PIPELINE.update({
    "q198_curation_funnel": (q_curation_funnel,
                             _oracle_curation_funnel()),
})


# ----------------------------- q233 BM25 top-k lexical retrieval

#: Fixed query batch: plain free-text strings tokenized exactly like
#: documents (lower + whitespace). Terms chosen from the corpus
#: vocabulary so every query retrieves a full top-k.
BM25_QUERIES = {0: "merge batch spark",
                1: "customer order stream",
                2: "hash join window"}
BM25_K = 10
_BM25_K1, _BM25_B = 1.2, 0.75


def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 (Okapi) ranked retrieval over ``documents`` — the
    saturating-tf lexical ranker behind decontamination sweeps and
    the sparse leg of hybrid RAG (pairs with q167's TF-IDF/RRF
    fusion). The reference's only text search is a full-scan LIKE
    (database.py lookup path); this is its corpus-scale ranked
    counterpart (operators/text.py::bm25_topk). Query terms, df
    stats and the (N, avgdl) scalar are all broadcast; the posting
    explode is filtered to query terms immediately, so the probe
    never touches the full index."""
    return TX.bm25_topk(_load_docs(spark, sf_dir), BM25_QUERIES,
                        k=BM25_K, k1=_BM25_K1, b=_BM25_B)


def _oracle_bm25_topk() -> str:
    k1, b = _BM25_K1, _BM25_B
    qterms = sorted({(qid, t)
                     for qid, qs in BM25_QUERIES.items()
                     for t in qs.lower().split()})
    vals = ", ".join(f"(CAST({qid} AS BIGINT), '{t}')"
                     for qid, t in qterms)
    vocab = ", ".join(f"'{t}'" for t in sorted({t for _, t in qterms}))
    return f"""
WITH docs AS (SELECT doc_id, {_TOKS} AS tk
              FROM (SELECT doc_id, lower(text) AS text
                    FROM documents)),
q(query_id, t) AS (SELECT * FROM (VALUES {vals})),
stats AS (SELECT count(*) AS n_docs, avg(len(tk)) AS avgdl FROM docs),
posting AS (SELECT doc_id, dl, t, count(*) AS tf
            FROM (SELECT doc_id, len(tk) AS dl, unnest(tk) AS t
                  FROM docs)
            WHERE t IN ({vocab})
            GROUP BY 1, 2, 3),
dfreq AS (SELECT t, count(*) AS df FROM posting GROUP BY 1),
scored AS (SELECT q.query_id, p.doc_id,
                  round(sum(round(
                      ln(1.0 + ((s.n_docs - d.df)::DOUBLE + 0.5)
                              / (d.df::DOUBLE + 0.5))
                      * (p.tf * CAST({k1 + 1.0!r} AS DOUBLE))
                      / (p.tf + CAST({k1!r} AS DOUBLE)
                         * (CAST({1.0 - b!r} AS DOUBLE)
                            + CAST({b!r} AS DOUBLE)
                              * p.dl / s.avgdl)), 6)), 6) AS bm25
           FROM posting p
           JOIN q ON q.t = p.t
           JOIN dfreq d ON d.t = p.t
           CROSS JOIN stats s
           GROUP BY 1, 2)
SELECT query_id, doc_id, bm25, rank FROM
    (SELECT *, CAST(row_number() OVER
         (PARTITION BY query_id ORDER BY bm25 DESC, doc_id) AS INT)
         AS rank
     FROM scored)
WHERE rank <= {BM25_K}
"""


REGISTRY_PIPELINE.update({
    "q233_bm25_topk": (q_bm25_topk, _oracle_bm25_topk()),
})


# -- q293 PERSISTED BM25 index: q233 promoted to a stored asset with
# -- the full lifecycle (the q242/q248/q259 pattern on lexical
# -- retrieval — the sparse leg of hybrid RAG, probed pruned)

def q_stored_bm25_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """StoredBm25Index (operators/bm25_index.py): build on doc_id <
    100, append 100–149 as an exactly-once epoch, probe q233's
    queries — the posting lists persist once (term-bucket
    partitioned, term-sorted files; dl denormalized into postings so
    scoring never joins doclen), and the probe scans ONLY the probed
    terms' bucket directories with the term IN-list pushed into row
    groups. Stats (N, avgdl, df) read the scanned corpus, so the
    stored probe is byte-identical to bm25_topk over the same 150
    documents — the oracle is exactly q233's SQL with the corpus
    bound moved, which is the point: persistence changed the I/O
    shape, not one scored bit."""
    import shutil
    import tempfile

    from industrial_data_pipeline_spark.operators.bm25_index import (
        StoredBm25Index)

    docs = _load_docs(spark, sf_dir).select("doc_id", "text")
    root = tempfile.mkdtemp(prefix="idp_q293_")
    try:
        idx = StoredBm25Index(spark, root, n_buckets=16,
                              k1=_BM25_K1, b=_BM25_B)
        idx.build(docs.where(F.col("doc_id") < 100))
        idx.append(docs.where((F.col("doc_id") >= 100)
                              & (F.col("doc_id") < 150)),
                   epoch_id=0)
        out = (idx.probe(BM25_QUERIES, k=BM25_K)
               .localCheckpoint(eager=True))
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


def _oracle_stored_bm25_probe() -> str:
    k1, b = _BM25_K1, _BM25_B
    qterms = sorted({(qid, t)
                     for qid, qs in BM25_QUERIES.items()
                     for t in qs.lower().split()})
    vals = ", ".join(f"(CAST({qid} AS BIGINT), '{t}')"
                     for qid, t in qterms)
    vocab = ", ".join(f"'{t}'"
                      for t in sorted({t for _, t in qterms}))
    return f"""
WITH docs AS (SELECT doc_id, {_TOKS} AS tk
              FROM (SELECT doc_id, lower(text) AS text
                    FROM documents WHERE doc_id < 150)),
q(query_id, t) AS (SELECT * FROM (VALUES {vals})),
stats AS (SELECT count(*) AS n_docs, avg(len(tk)) AS avgdl FROM docs),
posting AS (SELECT doc_id, dl, t, count(*) AS tf
            FROM (SELECT doc_id, len(tk) AS dl, unnest(tk) AS t
                  FROM docs)
            WHERE t IN ({vocab})
            GROUP BY 1, 2, 3),
dfreq AS (SELECT t, count(*) AS df FROM posting GROUP BY 1),
scored AS (SELECT q.query_id, p.doc_id,
                  round(sum(round(
                      ln(1.0 + ((s.n_docs - d.df)::DOUBLE + 0.5)
                              / (d.df::DOUBLE + 0.5))
                      * (p.tf * CAST({k1 + 1.0!r} AS DOUBLE))
                      / (p.tf + CAST({k1!r} AS DOUBLE)
                         * (CAST({1.0 - b!r} AS DOUBLE)
                            + CAST({b!r} AS DOUBLE)
                              * p.dl / s.avgdl)), 6)), 6) AS bm25
           FROM posting p
           JOIN q ON q.t = p.t
           JOIN dfreq d ON d.t = p.t
           CROSS JOIN stats s
           GROUP BY 1, 2)
SELECT query_id, doc_id, bm25, rank FROM
    (SELECT *, CAST(row_number() OVER
         (PARTITION BY query_id ORDER BY bm25 DESC, doc_id) AS INT)
         AS rank
     FROM scored)
WHERE rank <= {BM25_K}
"""


REGISTRY_PIPELINE.update({
    "q293_stored_bm25_probe": (q_stored_bm25_probe,
                               _oracle_stored_bm25_probe()),
})


# -- q294 HYBRID stored retrieval: the q167 RRF fusion over the TWO
# -- persisted assets (BM25 postings + IVF over hashed-BoW
# -- embeddings) — production hybrid RAG, both legs probed PRUNED

#: query ids offset past every doc_id so probe_batch's
#: self-exclusion (vec_id != query_id) is inert — a query must be
#: able to retrieve a doc whose id equals its raw key
_HYB_QOFF = 1000


def q_hybrid_stored_retrieval(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion (q167's Σ 1/(60+rank), fixed-order
    two-term double sum) of q293's stored-BM25 leg and a stored-IVF
    dense leg over hashed-BoW document embeddings — the full hybrid
    retriever every production RAG stack ships, with BOTH legs
    reading persisted, pruned assets: the lexical probe lists only
    the probed terms' bucket directories, the dense probe only the
    probed cells' partitions. Same corpus (doc_id < 150), same
    build<100 / epoch-0-append split on both assets, so the fusion
    also pins that two independently-appended indexes stay
    consistent. The oracle replays both legs (q233's scoring SQL;
    hashed-BoW + seed routing + exact cosine rank) and the fusion's
    coalesced two-term sum."""
    import os
    import shutil
    import tempfile

    from industrial_data_pipeline_spark.operators.bm25_index import (
        StoredBm25Index)
    from industrial_data_pipeline_spark.operators.retrieval import (
        HybridRetriever)
    from industrial_data_pipeline_spark.operators.similarity import (
        StoredIvfIndex)

    docs = (_load_docs(spark, sf_dir).select("doc_id", "text")
            .where(F.col("doc_id") < 150))
    emb = docs.select(
        "doc_id",
        TX.hashed_bow_embedding(F.col("text"), 16).alias("_v"))
    queries = {qid + _HYB_QOFF: qs
               for qid, qs in BM25_QUERIES.items()}
    qdf = (spark.createDataFrame(sorted(queries.items()),
                                 "qid long, qtext string")
           .select("qid",
                   TX.hashed_bow_embedding(F.col("qtext"), 16)
                   .alias("_qv"))
           .localCheckpoint(eager=True))
    root = tempfile.mkdtemp(prefix="idp_q294_")
    try:
        bidx = StoredBm25Index(spark, os.path.join(root, "bm25"),
                               n_buckets=16, k1=_BM25_K1, b=_BM25_B)
        vidx = StoredIvfIndex(spark, os.path.join(root, "ivf"),
                              id_col="doc_id", vec_col="_v",
                              n_cells=8)
        # independent per-asset chains, run concurrently
        # (optimization r14 -- the q298 pattern)
        run_chains(
            lambda: (bidx.build(docs.where(F.col("doc_id") < 100)),
                     bidx.append(docs.where(F.col("doc_id") >= 100),
                                 epoch_id=0)),
            lambda: (vidx.build(emb.where(F.col("doc_id") < 100)),
                     vidx.append(emb.where(F.col("doc_id") >= 100),
                                 epoch_id=0)))

        hyb = HybridRetriever(bidx, vidx, rrf_k=_RRF60)
        out = (hyb.retrieve(queries, qdf, k=10, leg_k=BM25_K,
                            nprobe=4, id_col="qid", vec_col="_qv")
               .localCheckpoint(eager=True))
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


_RRF60 = 60


def _oracle_hybrid_stored_retrieval() -> str:
    from industrial_data_pipeline_spark.suite_llm import (
        _COS, _demb_sql)

    k1, b = _BM25_K1, _BM25_B
    queries = {qid + _HYB_QOFF: qs
               for qid, qs in BM25_QUERIES.items()}
    qterms = sorted({(qid, t) for qid, qs in queries.items()
                     for t in qs.lower().split()})
    vals = ", ".join(f"(CAST({qid} AS BIGINT), '{t}')"
                     for qid, t in qterms)
    vocab = ", ".join(f"'{t}'"
                      for t in sorted({t for _, t in qterms}))
    qvals = ", ".join(f"(CAST({qid} AS BIGINT), '{qs}')"
                      for qid, qs in sorted(queries.items()))
    cos_b = _COS.format(a="b.v", b="seed.cv")
    ccos = _COS.format(a="seed.cv", b="qe.v")
    cos = _COS.format(a="cc.v", b="qe.v")
    return f"""
WITH docs AS (SELECT doc_id, text FROM documents
              WHERE doc_id < 150),
tdocs AS (SELECT doc_id, {_TOKS} AS tk
          FROM (SELECT doc_id, lower(text) AS text FROM docs)),
q(query_id, t) AS (SELECT * FROM (VALUES {vals})),
stats AS (SELECT count(*) AS n_docs, avg(len(tk)) AS avgdl
          FROM tdocs),
posting AS (SELECT doc_id, dl, t, count(*) AS tf
            FROM (SELECT doc_id, len(tk) AS dl, unnest(tk) AS t
                  FROM tdocs)
            WHERE t IN ({vocab})
            GROUP BY 1, 2, 3),
dfreq AS (SELECT t, count(*) AS df FROM posting GROUP BY 1),
scored AS (SELECT q.query_id, p.doc_id,
                  round(sum(round(
                      ln(1.0 + ((s.n_docs - d.df)::DOUBLE + 0.5)
                              / (d.df::DOUBLE + 0.5))
                      * (p.tf * CAST({k1 + 1.0!r} AS DOUBLE))
                      / (p.tf + CAST({k1!r} AS DOUBLE)
                         * (CAST({1.0 - b!r} AS DOUBLE)
                            + CAST({b!r} AS DOUBLE)
                              * p.dl / s.avgdl)), 6)), 6) AS bm25
           FROM posting p
           JOIN q ON q.t = p.t
           JOIN dfreq d ON d.t = p.t
           CROSS JOIN stats s
           GROUP BY 1, 2),
lexleg AS (SELECT query_id AS qid, doc_id, rl FROM
    (SELECT *, CAST(row_number() OVER
         (PARTITION BY query_id ORDER BY bm25 DESC, doc_id) AS INT)
         AS rl
     FROM scored)
  WHERE rl <= {BM25_K}),
de AS ({_demb_sql('docs')}),
qt(qid, text) AS (SELECT * FROM (VALUES {qvals})),
qdocs AS (SELECT qid AS doc_id, text FROM qt),
qe AS (SELECT doc_id AS qid, v FROM ({_demb_sql('qdocs')})),
seed AS (SELECT CAST(row_number() OVER (ORDER BY doc_id) - 1
                     AS INT) AS cell, v AS cv
         FROM de WHERE doc_id < 100 ORDER BY doc_id LIMIT 8),
asg AS (SELECT doc_id, cell FROM
         (SELECT b.doc_id, seed.cell,
                 row_number() OVER (PARTITION BY b.doc_id
                                    ORDER BY {cos_b} DESC,
                                             seed.cell) AS rn
          FROM de b CROSS JOIN seed)
       WHERE rn = 1),
probe AS (SELECT qid, cell FROM
            (SELECT qe.qid, seed.cell,
                    row_number() OVER (PARTITION BY qe.qid
                                       ORDER BY {ccos} DESC,
                                                seed.cell) AS pr
             FROM seed CROSS JOIN qe)
          WHERE pr <= 4),
denseleg AS (SELECT qid, doc_id, rf FROM
    (SELECT p.qid, cc.doc_id,
            CAST(row_number() OVER (PARTITION BY p.qid
                                    ORDER BY {cos} DESC,
                                             cc.doc_id) AS INT)
                AS rf
     FROM probe p
     JOIN asg ON asg.cell = p.cell
     JOIN de cc ON cc.doc_id = asg.doc_id
     JOIN qe ON qe.qid = p.qid
     WHERE cc.doc_id <> p.qid)
  WHERE rf <= {BM25_K}),
fused AS (SELECT coalesce(l.qid, d.qid) AS qid,
                 coalesce(l.doc_id, d.doc_id) AS doc_id,
                 coalesce(1.0 / ({_RRF60} + l.rl), 0.0)
                 + coalesce(1.0 / ({_RRF60} + d.rf), 0.0) AS score,
                 l.rl IS NOT NULL AS in_lexical,
                 d.rf IS NOT NULL AS in_dense
          FROM lexleg l
          FULL JOIN denseleg d
            ON d.qid = l.qid AND d.doc_id = l.doc_id)
SELECT qid AS query_id, doc_id AS cand_id, rrf_rank,
       score + 0.0 AS rrf_score, in_lexical, in_dense
FROM (SELECT *, CAST(row_number() OVER
          (PARTITION BY qid ORDER BY score DESC, doc_id) AS INT)
          AS rrf_rank
      FROM fused)
WHERE rrf_rank <= 10
"""


REGISTRY_PIPELINE.update({
    "q294_hybrid_stored_retrieval": (q_hybrid_stored_retrieval,
                                     _oracle_hybrid_stored_retrieval()),
})


# -- q295 as-of TIME-TRAVEL on the BM25 asset (the q267/q269
# -- snapshot contract on the fourth index class)

def q_bm25_asof_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q293's build<100 + epoch-0-append scenario probed with
    ``as_of_epoch=-1`` — the snapshot BEFORE the append: the
    ``_epoch <= -1`` partition filter prunes epoch 0 out of BOTH
    asset listings (postings AND doclen), so N, avgdl, df and every
    posting come from exactly the pre-append corpus — the oracle is
    q233's scoring SQL over doc_id < 100, proving time-travel moves
    the STATISTICS with the snapshot, not just the candidate rows
    (a BM25-specific subtlety the vector assets don't have)."""
    import shutil
    import tempfile

    from industrial_data_pipeline_spark.operators.bm25_index import (
        StoredBm25Index)

    docs = _load_docs(spark, sf_dir).select("doc_id", "text")
    root = tempfile.mkdtemp(prefix="idp_q295_")
    try:
        idx = StoredBm25Index(spark, root, n_buckets=16,
                              k1=_BM25_K1, b=_BM25_B)
        idx.build(docs.where(F.col("doc_id") < 100))
        idx.append(docs.where((F.col("doc_id") >= 100)
                              & (F.col("doc_id") < 150)),
                   epoch_id=0)
        out = (idx.probe(BM25_QUERIES, k=BM25_K, as_of_epoch=-1)
               .localCheckpoint(eager=True))
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


def _oracle_bm25_asof_probe() -> str:
    # q233's scoring chain over the PRE-APPEND corpus: the as-of
    # probe must reproduce it exactly, statistics included
    return _oracle_stored_bm25_probe().replace(
        "WHERE doc_id < 150", "WHERE doc_id < 100")


REGISTRY_PIPELINE.update({
    "q295_bm25_asof_probe": (q_bm25_asof_probe,
                             _oracle_bm25_asof_probe()),
})


# -- q298 SNAPSHOT-CONSISTENT hybrid as-of probe (VERDICT r12
# -- item 2): q294's RRF fusion with BOTH stored legs probed at ONE
# -- logical snapshot (as_of_epoch=0) after a later epoch 1 landed on
# -- each — the reproducible-eval path a RAG stack needs when
# -- re-running yesterday's retrieval — plus a retraction on both
# -- assets, pinning that retraction OVERRIDES time travel through
# -- the fusion (a taken-down document cannot be resurrected by
# -- probing the past)

def q_hybrid_asof_retrieval(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    """q294's hybrid retriever probed snapshot-consistently: both
    assets build on doc_id<100, append [100,150) as epoch 0 and
    [150,200) as epoch 1, then retract doc_ids {50, 105} from BOTH;
    both legs probe with ``as_of_epoch=0`` — the ``_epoch <= 0``
    partition filter prunes epoch 1 from postings, doclen AND cell
    scans, while the retraction's fenced rewrite removed {50, 105}
    from every epoch, so the fused result is exactly q294's replay
    over (doc_id < 150) minus the retracted ids: statistics, df,
    cell contents and the RRF fusion all move with the snapshot,
    and time travel cannot resurrect a takedown. Retracted ids are
    chosen outside the centroid seeds (doc_id 0–7): retraction
    removes VECTORS, never retrains centroids, and the oracle's
    seed replay must keep matching the stored routing."""
    import os
    import shutil
    import tempfile

    from industrial_data_pipeline_spark.operators.bm25_index import (
        StoredBm25Index)
    from industrial_data_pipeline_spark.operators.retrieval import (
        HybridRetriever)
    from industrial_data_pipeline_spark.operators.similarity import (
        StoredIvfIndex)

    docs = (_load_docs(spark, sf_dir).select("doc_id", "text")
            .where(F.col("doc_id") < 200))
    emb = docs.select(
        "doc_id",
        TX.hashed_bow_embedding(F.col("text"), 16).alias("_v"))
    queries = {qid + _HYB_QOFF: qs
               for qid, qs in BM25_QUERIES.items()}
    qdf = (spark.createDataFrame(sorted(queries.items()),
                                 "qid long, qtext string")
           .select("qid",
                   TX.hashed_bow_embedding(F.col("qtext"), 16)
                   .alias("_qv"))
           .localCheckpoint(eager=True))
    root = tempfile.mkdtemp(prefix="idp_q298_")
    try:
        bidx = StoredBm25Index(spark, os.path.join(root, "bm25"),
                               n_buckets=16, k1=_BM25_K1, b=_BM25_B)
        vidx = StoredIvfIndex(spark, os.path.join(root, "ivf"),
                              id_col="doc_id", vec_col="_v",
                              n_cells=8)

        # the two assets' lifecycle chains are independent until the
        # probe — run them concurrently (optimization r14, guide
        # §2.6; disjoint directories, identical final state)
        def _lex_chain() -> None:
            bidx.build(docs.where(F.col("doc_id") < 100))
            bidx.append(docs.where((F.col("doc_id") >= 100)
                                   & (F.col("doc_id") < 150)),
                        epoch_id=0)
            bidx.append(docs.where(F.col("doc_id") >= 150),
                        epoch_id=1)
            bidx.retract([50, 105])

        def _dense_chain() -> None:
            vidx.build(emb.where(F.col("doc_id") < 100))
            vidx.append(emb.where((F.col("doc_id") >= 100)
                                  & (F.col("doc_id") < 150)),
                        epoch_id=0)
            vidx.append(emb.where(F.col("doc_id") >= 150),
                        epoch_id=1)
            vidx.retract([50, 105])

        run_chains(_lex_chain, _dense_chain)

        hyb = HybridRetriever(bidx, vidx, rrf_k=_RRF60)
        out = (hyb.retrieve(queries, qdf, k=10, leg_k=BM25_K,
                            nprobe=4, id_col="qid", vec_col="_qv",
                            as_of_epoch=0)
               .localCheckpoint(eager=True))
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


def _oracle_hybrid_asof_retrieval() -> str:
    # q294's replay over the snapshot corpus: epoch 1 pruned by the
    # as-of filter, the retracted ids gone from every epoch. The
    # seed CTE (centroid routing) is untouched — {50, 105} are not
    # among the doc_id 0–7 seeds, and retraction never retrains.
    return _oracle_hybrid_stored_retrieval().replace(
        "WHERE doc_id < 150",
        "WHERE doc_id < 150 AND doc_id NOT IN (50, 105)")


REGISTRY_PIPELINE.update({
    "q298_hybrid_asof_retrieval": (q_hybrid_asof_retrieval,
                                   _oracle_hybrid_asof_retrieval()),
})


# -- q297 ANALYZER-composed lexical retrieval (VERDICT r12 item 1):
# -- ONE normalize→extract→stopword→stem pipeline shared by the index
# -- build, the probe's driver-side query tokenization, AND this
# -- oracle — over a corpus noisy enough that the raw whitespace
# -- index retrieves nothing (the punctuation/unicode mismatch every
# -- real web-corpus BM25 user hits on their first query)

#: the analyzer under test: stopwords + light plural stemming on top
#: of the zero-width/control normalization and ASCII word extraction
_Q297_AZ = Analyzer(stopwords=("the", "a"), stem_s=True)
#: punctuated, cased, apostrophed queries — raw lower().split() terms
#: ("merge!", "customer's") match no posting of ANY tokenizer; the
#: analyzer maps them onto the corpus vocabulary ("rows"→"row" only
#: exists via stemming; "spark" only via zero-width stripping)
_Q297_QUERIES = {0: "Merge! SPARK?",
                 1: "the rows — a batch.",
                 2: "Customer's order; streams"}


def _noisy_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents (doc_id < 150) decorated into web-grade noise,
    deterministically in BOTH engines: «-wrapped, every word
    boundary comma-punctuated, and a zero-width space injected
    inside every 'spark' — whitespace tokens are '«merge,' /
    'sp​ark,», never 'merge'/'spark'."""
    return (_load_docs(spark, sf_dir)
            .select("doc_id", "text")
            .where(F.col("doc_id") < 150)
            .select("doc_id",
                    F.concat(F.lit("«"),
                             F.regexp_replace(
                                 F.regexp_replace("text", " ", ", "),
                                 "spark", "sp​ark"),
                             F.lit(".»")).alias("text")))


#: DuckDB twin of :func:`_noisy_docs`'s text expression
_NOISY_SQL = ("'«' || replace(replace(text, ' ', ', '), 'spark',"
              " 'sp' || chr(8203) || 'ark') || '.»'")


def q_analyzer_bm25_probe(spark: SparkSession,
                          sf_dir: str) -> DataFrame:
    """StoredBm25Index with an Analyzer (operators/analyzer.py):
    q293's build<100 + epoch-0-append lifecycle over the noisy
    corpus, probed with punctuated/cased query strings — build,
    probe and oracle all tokenize through the ONE shared analyzer
    (its Spark / driver-Python / DuckDB twins are pinned
    bit-identical in tests/test_analyzer.py), and the analyzer
    choice persists in the index meta so open() can never probe a
    different tokenization than the build wrote. The raw-index-
    retrieves-nothing contrast is pinned in
    tests/test_bm25_index.py::test_analyzer_index_finds_what_raw_misses."""
    import shutil
    import tempfile

    from industrial_data_pipeline_spark.operators.bm25_index import (
        StoredBm25Index)

    docs = _noisy_docs(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="idp_q297_")
    try:
        idx = StoredBm25Index(spark, root, n_buckets=16,
                              k1=_BM25_K1, b=_BM25_B,
                              analyzer=_Q297_AZ)
        idx.build(docs.where(F.col("doc_id") < 100))
        idx.append(docs.where(F.col("doc_id") >= 100), epoch_id=0)
        out = (idx.probe(_Q297_QUERIES, k=BM25_K)
               .localCheckpoint(eager=True))
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


def _oracle_analyzer_bm25_probe() -> str:
    k1, b = _BM25_K1, _BM25_B
    qterms = sorted({(qid, t)
                     for qid, qs in _Q297_QUERIES.items()
                     for t in _Q297_AZ.py(qs)})
    vals = ", ".join(f"(CAST({qid} AS BIGINT), '{t}')"
                     for qid, t in qterms)
    vocab = ", ".join(f"'{t}'"
                      for t in sorted({t for _, t in qterms}))
    tk = _Q297_AZ.sql("text")
    return f"""
WITH docs AS (SELECT doc_id, {tk} AS tk
              FROM (SELECT doc_id, {_NOISY_SQL} AS text
                    FROM documents WHERE doc_id < 150)),
q(query_id, t) AS (SELECT * FROM (VALUES {vals})),
stats AS (SELECT count(*) AS n_docs, avg(len(tk)) AS avgdl FROM docs),
posting AS (SELECT doc_id, dl, t, count(*) AS tf
            FROM (SELECT doc_id, len(tk) AS dl, unnest(tk) AS t
                  FROM docs)
            WHERE t IN ({vocab})
            GROUP BY 1, 2, 3),
dfreq AS (SELECT t, count(*) AS df FROM posting GROUP BY 1),
scored AS (SELECT q.query_id, p.doc_id,
                  round(sum(round(
                      ln(1.0 + ((s.n_docs - d.df)::DOUBLE + 0.5)
                              / (d.df::DOUBLE + 0.5))
                      * (p.tf * CAST({k1 + 1.0!r} AS DOUBLE))
                      / (p.tf + CAST({k1!r} AS DOUBLE)
                         * (CAST({1.0 - b!r} AS DOUBLE)
                            + CAST({b!r} AS DOUBLE)
                              * p.dl / s.avgdl)), 6)), 6) AS bm25
           FROM posting p
           JOIN q ON q.t = p.t
           JOIN dfreq d ON d.t = p.t
           CROSS JOIN stats s
           GROUP BY 1, 2)
SELECT query_id, doc_id, bm25, rank FROM
    (SELECT *, CAST(row_number() OVER
         (PARTITION BY query_id ORDER BY bm25 DESC, doc_id) AS INT)
         AS rank
     FROM scored)
WHERE rank <= {BM25_K}
"""


REGISTRY_PIPELINE.update({
    "q297_analyzer_bm25_probe": (q_analyzer_bm25_probe,
                                 _oracle_analyzer_bm25_probe()),
})


# -- q300 probe_frames: the DataFrame-of-queries probe form (VERDICT
# -- r12 item 5 — a 100k-query eval batch shouldn't live in a driver
# -- dict); shares q293's oracle VERBATIM on the dict→DataFrame
# -- translation of the same queries

def q_stored_bm25_probe_frames(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """StoredBm25Index.probe_frames (operators/bm25_index.py):
    q293's exact build<100 + epoch-0-append scenario, probed via a
    DataFrame of (query_id, query_text) rows — query text tokenizes
    IN-PLAN through the index's build-time tokenizer, the driver
    collects only the distinct analyzed terms (to compute the bucket
    list and term IN-list — bounded like the ANN probe keys), and
    the result is byte-identical to q293's dict-form probe, which is
    why this query's oracle IS q293's oracle string, unchanged."""
    import shutil
    import tempfile

    from industrial_data_pipeline_spark.operators.bm25_index import (
        StoredBm25Index)

    docs = _load_docs(spark, sf_dir).select("doc_id", "text")
    qdf = spark.createDataFrame(
        sorted(BM25_QUERIES.items()),
        "query_id long, query_text string")
    root = tempfile.mkdtemp(prefix="idp_q300_")
    try:
        idx = StoredBm25Index(spark, root, n_buckets=16,
                              k1=_BM25_K1, b=_BM25_B)
        idx.build(docs.where(F.col("doc_id") < 100))
        idx.append(docs.where((F.col("doc_id") >= 100)
                              & (F.col("doc_id") < 150)),
                   epoch_id=0)
        out = (idx.probe_frames(qdf, k=BM25_K)
               .localCheckpoint(eager=True))
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


REGISTRY_PIPELINE.update({
    "q300_bm25_probe_frames": (q_stored_bm25_probe_frames,
                               _oracle_stored_bm25_probe()),
})


# -- q301 PHRASE probe on the positional BM25 asset (VERDICT r12
# -- stretch): exact-adjacency retrieval via the anchor trick, fully
# -- relational so the oracle replays it — probe still bucket-pruned

#: phrases chosen to exercise the corners: a plain bigram, a
#: REPEATED-token bigram (one term voting two phrase slots — the
#: distinct-index guard), and a trigram
_Q301_PHRASES = {0: "merge batch",
                 1: "table table",
                 2: "the line sort"}


def q_bm25_phrase_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """StoredBm25Index.phrase_probe (operators/bm25_index.py): the
    postings carry 0-based token positions (the classic positional-
    postings trade — BM25 probes column-prune them away; only phrase
    probes read them), and exact-phrase matching is the anchor
    trick: phrase token i at position p votes for anchor p − i; an
    anchor with all |phrase| distinct indices voting is one
    occurrence. Same build<100 + epoch-0-append lifecycle and the
    SAME bucket + term-IN pruned scan as q293 — adjacency costs one
    extra pruned column, never a rescan. The oracle replays
    positions (UNNEST over range), anchors and the distinct-index
    vote in SQL."""
    import shutil
    import tempfile

    from industrial_data_pipeline_spark.operators.bm25_index import (
        StoredBm25Index)

    docs = _load_docs(spark, sf_dir).select("doc_id", "text")
    root = tempfile.mkdtemp(prefix="idp_q301_")
    try:
        idx = StoredBm25Index(spark, root, n_buckets=16,
                              k1=_BM25_K1, b=_BM25_B)
        idx.build(docs.where(F.col("doc_id") < 100))
        idx.append(docs.where((F.col("doc_id") >= 100)
                              & (F.col("doc_id") < 150)),
                   epoch_id=0)
        out = (idx.phrase_probe(_Q301_PHRASES, k=BM25_K)
               .localCheckpoint(eager=True))
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


def _oracle_bm25_phrase_probe() -> str:
    qterms = [(qid, i, t)
              for qid, qs in sorted(_Q301_PHRASES.items())
              for i, t in enumerate(qs.lower().split())]
    vals = ", ".join(f"(CAST({qid} AS BIGINT), {i}, '{t}')"
                     for qid, i, t in qterms)
    vocab = ", ".join(f"'{t}'"
                      for t in sorted({t for _, _, t in qterms}))
    return f"""
WITH docs AS (SELECT doc_id, {_TOKS} AS tk
              FROM (SELECT doc_id, lower(text) AS text
                    FROM documents WHERE doc_id < 150)),
tok AS (SELECT doc_id, r.i - 1 AS p, tk[r.i] AS t
        FROM docs, UNNEST(range(1, len(tk) + 1)) AS r(i)),
q(query_id, idx, t) AS (SELECT * FROM (VALUES {vals})),
m AS (SELECT query_id, count(*) AS m FROM q GROUP BY 1),
anch AS (SELECT q.query_id, tok.doc_id, tok.p - q.idx AS a,
                count(DISTINCT q.idx) AS nn
         FROM tok JOIN q ON q.t = tok.t
         WHERE tok.t IN ({vocab})
         GROUP BY 1, 2, 3),
occ AS (SELECT a.query_id, a.doc_id, count(*) AS n_occ
        FROM anch a JOIN m ON m.query_id = a.query_id
        WHERE a.nn = m.m GROUP BY 1, 2)
SELECT query_id, doc_id, n_occ, rank FROM
    (SELECT *, CAST(row_number() OVER
         (PARTITION BY query_id ORDER BY n_occ DESC, doc_id) AS INT)
         AS rank
     FROM occ)
WHERE rank <= {BM25_K}
"""


REGISTRY_PIPELINE.update({
    "q301_bm25_phrase_probe": (q_bm25_phrase_probe,
                               _oracle_bm25_phrase_probe()),
})


# -- q302 METADATA-FILTERED BM25 with per-stratum statistics: the
# -- q151/q280 pre-filter contract on the LEXICAL asset — BM25 within
# -- the tenant's/language's own corpus, label pushed into both scans

#: per-query stratum labels (doc_id % 3 — every query retrieves from
#: a different third of the corpus, with that third's OWN N/avgdl/df)
_Q302_FILTERS = {0: 0, 1: 1, 2: 2}


def q_filtered_bm25_probe(spark: SparkSession,
                          sf_dir: str) -> DataFrame:
    """StoredBm25Index.probe(filter_col=, query_filters=)
    (operators/bm25_index.py): the label column is DENORMALIZED into
    both assets at build (the dl trade again — dictionary-encoded
    bytes buy a filter that pushes into the parquet scan, no join
    materializes non-stratum candidates), and the statistics are
    PER-STRATUM: N/avgdl aggregate per label over doclen, df counts
    per (term, label) — each query scores as if its stratum were its
    own index, without storing one index per stratum. Same build<100
    + epoch-0-append lifecycle; the oracle replays the per-label
    stats chain. Per-stratum == sub-corpus-index parity is pinned in
    tests/test_bm25_index.py::test_filtered_probe_per_stratum_stats
    (including through retract + compact, which must carry the
    metadata column)."""
    import shutil
    import tempfile

    from industrial_data_pipeline_spark.operators.bm25_index import (
        StoredBm25Index)

    docs = (_load_docs(spark, sf_dir)
            .where(F.col("doc_id") < 150)
            .select("doc_id", "text",
                    (F.col("doc_id") % 3).cast("int").alias("lbl")))
    root = tempfile.mkdtemp(prefix="idp_q302_")
    try:
        idx = StoredBm25Index(spark, root, n_buckets=16,
                              k1=_BM25_K1, b=_BM25_B,
                              extra_schema="lbl int")
        idx.build(docs.where(F.col("doc_id") < 100))
        idx.append(docs.where(F.col("doc_id") >= 100), epoch_id=0)
        out = (idx.probe(BM25_QUERIES, k=BM25_K, filter_col="lbl",
                         query_filters=_Q302_FILTERS)
               .localCheckpoint(eager=True))
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


def _oracle_filtered_bm25_probe() -> str:
    k1, b = _BM25_K1, _BM25_B
    qterms = sorted({(qid, t)
                     for qid, qs in BM25_QUERIES.items()
                     for t in qs.lower().split()})
    vals = ", ".join(
        f"(CAST({qid} AS BIGINT), '{t}',"
        f" CAST({_Q302_FILTERS[qid]} AS INT))"
        for qid, t in qterms)
    vocab = ", ".join(f"'{t}'"
                      for t in sorted({t for _, t in qterms}))
    return f"""
WITH docs AS (SELECT doc_id, {_TOKS} AS tk,
                     CAST(doc_id % 3 AS INT) AS lbl
              FROM (SELECT doc_id, lower(text) AS text
                    FROM documents WHERE doc_id < 150)),
q(query_id, t, lbl) AS (SELECT * FROM (VALUES {vals})),
stats AS (SELECT lbl, count(*) AS n_docs, avg(len(tk)) AS avgdl
          FROM docs GROUP BY 1),
posting AS (SELECT doc_id, dl, lbl, t, count(*) AS tf
            FROM (SELECT doc_id, len(tk) AS dl, lbl,
                         unnest(tk) AS t
                  FROM docs)
            WHERE t IN ({vocab})
            GROUP BY 1, 2, 3, 4),
dfreq AS (SELECT t, lbl, count(*) AS df FROM posting
          GROUP BY 1, 2),
scored AS (SELECT q.query_id, p.doc_id,
                  round(sum(round(
                      ln(1.0 + ((s.n_docs - d.df)::DOUBLE + 0.5)
                              / (d.df::DOUBLE + 0.5))
                      * (p.tf * CAST({k1 + 1.0!r} AS DOUBLE))
                      / (p.tf + CAST({k1!r} AS DOUBLE)
                         * (CAST({1.0 - b!r} AS DOUBLE)
                            + CAST({b!r} AS DOUBLE)
                              * p.dl / s.avgdl)), 6)), 6) AS bm25
           FROM posting p
           JOIN q ON q.t = p.t AND q.lbl = p.lbl
           JOIN dfreq d ON d.t = p.t AND d.lbl = p.lbl
           JOIN stats s ON s.lbl = q.lbl
           GROUP BY 1, 2)
SELECT query_id, doc_id, bm25, rank FROM
    (SELECT *, CAST(row_number() OVER
         (PARTITION BY query_id ORDER BY bm25 DESC, doc_id) AS INT)
         AS rank
     FROM scored)
WHERE rank <= {BM25_K}
"""


REGISTRY_PIPELINE.update({
    "q302_filtered_bm25_probe": (q_filtered_bm25_probe,
                                 _oracle_filtered_bm25_probe()),
})


# -- q303 TENANT-SCOPED hybrid retrieval: q294's RRF fusion with BOTH
# -- stored legs metadata-FILTERED to each query's stratum — the
# -- multi-tenant RAG shape (every production store serves per-tenant
# -- retrieval over one shared asset)

def q_tenant_hybrid_retrieval(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """The multi-tenant capstone: ONE shared BM25 asset and ONE
    shared IVF asset (both carrying ``lbl`` as denormalized
    metadata), probed per-tenant — the lexical leg with q302's
    per-stratum statistics (BM25 within the tenant's own corpus),
    the dense leg with q280's candidate pre-filter (centroids stay
    label-blind; the label equality evaluates on the pruned cell
    scan) — then q294's RRF fusion. One index pair serves every
    tenant; no per-tenant index copies, no post-filter holes. The
    oracle replays both filtered legs (per-label stats chain +
    label-equality routing replay) and the coalesced fusion."""
    import os
    import shutil
    import tempfile

    from industrial_data_pipeline_spark.operators.bm25_index import (
        StoredBm25Index)
    from industrial_data_pipeline_spark.operators.retrieval import (
        HybridRetriever)
    from industrial_data_pipeline_spark.operators.similarity import (
        StoredIvfIndex)

    docs = (_load_docs(spark, sf_dir)
            .where(F.col("doc_id") < 150)
            .select("doc_id", "text",
                    (F.col("doc_id") % 3).cast("int").alias("lbl")))
    emb = docs.select(
        "doc_id",
        TX.hashed_bow_embedding(F.col("text"), 16).alias("_v"),
        "lbl")
    queries = {qid + _HYB_QOFF: qs
               for qid, qs in BM25_QUERIES.items()}
    qfilters = {qid + _HYB_QOFF: lbl
                for qid, lbl in _Q302_FILTERS.items()}
    qdf = (spark.createDataFrame(
        [(qid, qs, qfilters[qid])
         for qid, qs in sorted(queries.items())],
        "qid long, qtext string, lbl int")
        .select("qid",
                TX.hashed_bow_embedding(F.col("qtext"), 16)
                .alias("_qv"), "lbl")
        .localCheckpoint(eager=True))
    root = tempfile.mkdtemp(prefix="idp_q303_")
    try:
        bidx = StoredBm25Index(spark, os.path.join(root, "bm25"),
                               n_buckets=16, k1=_BM25_K1, b=_BM25_B,
                               extra_schema="lbl int")
        vidx = StoredIvfIndex(spark, os.path.join(root, "ivf"),
                              id_col="doc_id", vec_col="_v",
                              n_cells=8, extra_schema="lbl int")
        # independent per-asset chains, run concurrently
        # (optimization r14 -- the q298 pattern)
        run_chains(
            lambda: (bidx.build(docs.where(F.col("doc_id") < 100)),
                     bidx.append(docs.where(F.col("doc_id") >= 100),
                                 epoch_id=0)),
            lambda: (vidx.build(emb.where(F.col("doc_id") < 100)),
                     vidx.append(emb.where(F.col("doc_id") >= 100),
                                 epoch_id=0)))

        hyb = HybridRetriever(bidx, vidx, rrf_k=_RRF60)
        out = (hyb.retrieve(queries, qdf, k=10, leg_k=BM25_K,
                            nprobe=4, id_col="qid", vec_col="_qv",
                            filter_col="lbl",
                            query_filters=qfilters)
               .localCheckpoint(eager=True))
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


def _oracle_tenant_hybrid_retrieval() -> str:
    from industrial_data_pipeline_spark.suite_llm import (
        _COS, _demb_sql)

    k1, b = _BM25_K1, _BM25_B
    queries = {qid + _HYB_QOFF: qs
               for qid, qs in BM25_QUERIES.items()}
    qfilters = {qid + _HYB_QOFF: lbl
                for qid, lbl in _Q302_FILTERS.items()}
    qterms = sorted({(qid, t) for qid, qs in queries.items()
                     for t in qs.lower().split()})
    vals = ", ".join(
        f"(CAST({qid} AS BIGINT), '{t}',"
        f" CAST({qfilters[qid]} AS INT))"
        for qid, t in qterms)
    vocab = ", ".join(f"'{t}'"
                      for t in sorted({t for _, t in qterms}))
    qvals = ", ".join(
        f"(CAST({qid} AS BIGINT), '{qs}',"
        f" CAST({qfilters[qid]} AS INT))"
        for qid, qs in sorted(queries.items()))
    cos_b = _COS.format(a="b.v", b="seed.cv")
    ccos = _COS.format(a="seed.cv", b="qe.v")
    cos = _COS.format(a="cc.v", b="qe.v")
    return f"""
WITH docs AS (SELECT doc_id, text, CAST(doc_id % 3 AS INT) AS lbl
              FROM documents WHERE doc_id < 150),
tdocs AS (SELECT doc_id, {_TOKS} AS tk, lbl
          FROM (SELECT doc_id, lower(text) AS text, lbl FROM docs)),
q(query_id, t, lbl) AS (SELECT * FROM (VALUES {vals})),
stats AS (SELECT lbl, count(*) AS n_docs, avg(len(tk)) AS avgdl
          FROM tdocs GROUP BY 1),
posting AS (SELECT doc_id, dl, lbl, t, count(*) AS tf
            FROM (SELECT doc_id, len(tk) AS dl, lbl,
                         unnest(tk) AS t
                  FROM tdocs)
            WHERE t IN ({vocab})
            GROUP BY 1, 2, 3, 4),
dfreq AS (SELECT t, lbl, count(*) AS df FROM posting GROUP BY 1, 2),
scored AS (SELECT q.query_id, p.doc_id,
                  round(sum(round(
                      ln(1.0 + ((s.n_docs - d.df)::DOUBLE + 0.5)
                              / (d.df::DOUBLE + 0.5))
                      * (p.tf * CAST({k1 + 1.0!r} AS DOUBLE))
                      / (p.tf + CAST({k1!r} AS DOUBLE)
                         * (CAST({1.0 - b!r} AS DOUBLE)
                            + CAST({b!r} AS DOUBLE)
                              * p.dl / s.avgdl)), 6)), 6) AS bm25
           FROM posting p
           JOIN q ON q.t = p.t AND q.lbl = p.lbl
           JOIN dfreq d ON d.t = p.t AND d.lbl = p.lbl
           JOIN stats s ON s.lbl = q.lbl
           GROUP BY 1, 2),
lexleg AS (SELECT query_id AS qid, doc_id, rl FROM
    (SELECT *, CAST(row_number() OVER
         (PARTITION BY query_id ORDER BY bm25 DESC, doc_id) AS INT)
         AS rl
     FROM scored)
  WHERE rl <= {BM25_K}),
de AS ({_demb_sql('docs')}),
qt(qid, text, qlbl) AS (SELECT * FROM (VALUES {qvals})),
qdocs AS (SELECT qid AS doc_id, text FROM qt),
qe AS (SELECT e.doc_id AS qid, e.v, qt.qlbl
       FROM ({_demb_sql('qdocs')}) e
       JOIN qt ON qt.qid = e.doc_id),
seed AS (SELECT CAST(row_number() OVER (ORDER BY doc_id) - 1
                     AS INT) AS cell, v AS cv
         FROM de WHERE doc_id < 100 ORDER BY doc_id LIMIT 8),
asg AS (SELECT doc_id, cell FROM
         (SELECT b.doc_id, seed.cell,
                 row_number() OVER (PARTITION BY b.doc_id
                                    ORDER BY {cos_b} DESC,
                                             seed.cell) AS rn
          FROM de b CROSS JOIN seed)
       WHERE rn = 1),
probe AS (SELECT qid, cell FROM
            (SELECT qe.qid, seed.cell,
                    row_number() OVER (PARTITION BY qe.qid
                                       ORDER BY {ccos} DESC,
                                                seed.cell) AS pr
             FROM seed CROSS JOIN qe)
          WHERE pr <= 4),
denseleg AS (SELECT qid, doc_id, rf FROM
    (SELECT p.qid, cc.doc_id,
            CAST(row_number() OVER (PARTITION BY p.qid
                                    ORDER BY {cos} DESC,
                                             cc.doc_id) AS INT)
                AS rf
     FROM probe p
     JOIN asg ON asg.cell = p.cell
     JOIN de cc ON cc.doc_id = asg.doc_id
     JOIN docs dd ON dd.doc_id = cc.doc_id
     JOIN qe ON qe.qid = p.qid
     WHERE cc.doc_id <> p.qid AND dd.lbl = qe.qlbl)
  WHERE rf <= {BM25_K}),
fused AS (SELECT coalesce(l.qid, d.qid) AS qid,
                 coalesce(l.doc_id, d.doc_id) AS doc_id,
                 coalesce(1.0 / ({_RRF60} + l.rl), 0.0)
                 + coalesce(1.0 / ({_RRF60} + d.rf), 0.0) AS score,
                 l.rl IS NOT NULL AS in_lexical,
                 d.rf IS NOT NULL AS in_dense
          FROM lexleg l
          FULL JOIN denseleg d
            ON d.qid = l.qid AND d.doc_id = l.doc_id)
SELECT qid AS query_id, doc_id AS cand_id, rrf_rank,
       score + 0.0 AS rrf_score, in_lexical, in_dense
FROM (SELECT *, CAST(row_number() OVER
          (PARTITION BY qid ORDER BY score DESC, doc_id) AS INT)
          AS rrf_rank
      FROM fused)
WHERE rrf_rank <= 10
"""


REGISTRY_PIPELINE.update({
    "q303_tenant_hybrid_retrieval": (q_tenant_hybrid_retrieval,
                                     _oracle_tenant_hybrid_retrieval()),
})


# -- q304 TENANT + AS-OF hybrid through the FIRST-CLASS operator:
# -- the composition no prior query exercised (VERDICT r13 item 1's
# -- done-gate) — per-tenant scoping AND snapshot pinning AND a
# -- takedown retraction, all through HybridRetriever, both legs

def q_tenant_asof_hybrid(spark: SparkSession,
                         sf_dir: str) -> DataFrame:
    """q303's multi-tenant shape composed with q298's snapshot
    pinning, registered THROUGH ``operators/retrieval.py``'s
    :class:`HybridRetriever` (the round-14 first-class fusion
    operator — q294/q298/q303 were re-registered through it
    byte-identically; this query exercises the composition none of
    them had): ONE shared BM25 asset + ONE shared IVF asset, both
    labeled, both appended a second epoch AFTER the probed snapshot,
    both hit by a takedown retraction — then probed per-tenant at
    ``as_of_epoch=0``. Pins that (a) tenant scoping and snapshot
    pinning pass through ONE operator call to both legs, (b) epoch 1
    is invisible to the pinned probe on both legs, and (c) the
    retraction overrides time travel THROUGH the tenant-scoped
    fusion (takedowns must win even inside a pinned snapshot — the
    q298 legal contract, now per-tenant). The oracle replays q303's
    filtered two-leg chain over the snapshot-minus-retraction
    corpus."""
    import os
    import shutil
    import tempfile

    from industrial_data_pipeline_spark.operators.bm25_index import (
        StoredBm25Index)
    from industrial_data_pipeline_spark.operators.retrieval import (
        HybridRetriever)
    from industrial_data_pipeline_spark.operators.similarity import (
        StoredIvfIndex)

    docs = (_load_docs(spark, sf_dir)
            .where(F.col("doc_id") < 200)
            .select("doc_id", "text",
                    (F.col("doc_id") % 3).cast("int").alias("lbl")))
    emb = docs.select(
        "doc_id",
        TX.hashed_bow_embedding(F.col("text"), 16).alias("_v"),
        "lbl")
    queries = {qid + _HYB_QOFF: qs
               for qid, qs in BM25_QUERIES.items()}
    qfilters = {qid + _HYB_QOFF: lbl
                for qid, lbl in _Q302_FILTERS.items()}
    qdf = (spark.createDataFrame(sorted(queries.items()),
                                 "qid long, qtext string")
           .select("qid",
                   TX.hashed_bow_embedding(F.col("qtext"), 16)
                   .alias("_qv"))
           .localCheckpoint(eager=True))
    root = tempfile.mkdtemp(prefix="idp_q304_")
    try:
        bidx = StoredBm25Index(spark, os.path.join(root, "bm25"),
                               n_buckets=16, k1=_BM25_K1, b=_BM25_B,
                               extra_schema="lbl int")
        vidx = StoredIvfIndex(spark, os.path.join(root, "ivf"),
                              id_col="doc_id", vec_col="_v",
                              n_cells=8, extra_schema="lbl int")

        # independent per-asset chains, run concurrently
        # (optimization r14 — the q298 pattern)
        def _lex_chain() -> None:
            bidx.build(docs.where(F.col("doc_id") < 100))
            bidx.append(docs.where((F.col("doc_id") >= 100)
                                   & (F.col("doc_id") < 150)),
                        epoch_id=0)
            bidx.append(docs.where(F.col("doc_id") >= 150),
                        epoch_id=1)
            bidx.retract([50, 105])

        def _dense_chain() -> None:
            vidx.build(emb.where(F.col("doc_id") < 100))
            vidx.append(emb.where((F.col("doc_id") >= 100)
                                  & (F.col("doc_id") < 150)),
                        epoch_id=0)
            vidx.append(emb.where(F.col("doc_id") >= 150),
                        epoch_id=1)
            vidx.retract([50, 105])

        run_chains(_lex_chain, _dense_chain)

        hyb = HybridRetriever(bidx, vidx, rrf_k=_RRF60)
        out = (hyb.retrieve(queries, qdf, k=10, leg_k=BM25_K,
                            nprobe=4, id_col="qid", vec_col="_qv",
                            filter_col="lbl",
                            query_filters=qfilters,
                            as_of_epoch=0)
               .localCheckpoint(eager=True))
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


def _oracle_tenant_asof_hybrid() -> str:
    # q303's filtered replay over the snapshot corpus: epoch 1
    # pruned by the as-of pin, the retracted ids gone from every
    # epoch (takedowns override time travel). The seed CTE is
    # untouched — {50, 105} are not among the doc_id 0–7 seeds, and
    # retraction never retrains centroids.
    return _oracle_tenant_hybrid_retrieval().replace(
        "WHERE doc_id < 150",
        "WHERE doc_id < 150 AND doc_id NOT IN (50, 105)")


REGISTRY_PIPELINE.update({
    "q304_tenant_asof_hybrid": (q_tenant_asof_hybrid,
                                _oracle_tenant_asof_hybrid()),
})


# -- q305 TENANT-SCOPED PHRASE search, DataFrame-of-queries form:
# -- q301's positional anchor trick composed with q302's pre-filter
# -- contract, phrases tokenized IN-PLAN (VERDICT r13 item 2)

#: per-query stratum labels for the phrase batch (q302's shape)
_Q305_FILTERS = {0: 0, 1: 1, 2: 2}


def q_tenant_phrase_probe(spark: SparkSession,
                          sf_dir: str) -> DataFrame:
    """StoredBm25Index.phrase_probe_frames(filter_col=) — phrase
    search at parity with the BM25 probe contract (VERDICT r13
    item 2): the phrase batch is a DATAFRAME (query_id, query_text,
    lbl), tokenized in-plan through the index's own build-time
    expression with ``posexplode`` supplying the anchor offsets, and
    the probe is TENANT-SCOPED — the label IN-list pushes into the
    pruned postings scan next to the term IN-list and each query
    anchors only within its own stratum's documents. Same labeled
    build<100 + epoch-0-append lifecycle as q302. The oracle replays
    the anchor trick per label stratum (position unnest → anchor =
    p − idx → distinct-index vote, with the q.lbl = tok.lbl
    stratum equality in the anchor join). Dict-vs-frames byte-parity
    and the pre-positions-index refusal are pinned in
    tests/test_bm25_index.py."""
    import shutil
    import tempfile

    from industrial_data_pipeline_spark.operators.bm25_index import (
        StoredBm25Index)

    docs = (_load_docs(spark, sf_dir)
            .where(F.col("doc_id") < 150)
            .select("doc_id", "text",
                    (F.col("doc_id") % 3).cast("int").alias("lbl")))
    qdf = spark.createDataFrame(
        [(qid, qs, _Q305_FILTERS[qid])
         for qid, qs in sorted(_Q301_PHRASES.items())],
        "query_id long, query_text string, lbl int")
    root = tempfile.mkdtemp(prefix="idp_q305_")
    try:
        idx = StoredBm25Index(spark, root, n_buckets=16,
                              k1=_BM25_K1, b=_BM25_B,
                              extra_schema="lbl int")
        idx.build(docs.where(F.col("doc_id") < 100))
        idx.append(docs.where(F.col("doc_id") >= 100), epoch_id=0)
        out = (idx.phrase_probe_frames(qdf, k=BM25_K,
                                       filter_col="lbl")
               .localCheckpoint(eager=True))
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


def _oracle_tenant_phrase_probe() -> str:
    qterms = [(qid, i, t)
              for qid, qs in sorted(_Q301_PHRASES.items())
              for i, t in enumerate(qs.lower().split())]
    vals = ", ".join(
        f"(CAST({qid} AS BIGINT), {i}, '{t}',"
        f" CAST({_Q305_FILTERS[qid]} AS INT))"
        for qid, i, t in qterms)
    vocab = ", ".join(f"'{t}'"
                      for t in sorted({t for _, _, t in qterms}))
    return f"""
WITH docs AS (SELECT doc_id, {_TOKS} AS tk, lbl
              FROM (SELECT doc_id, lower(text) AS text,
                           CAST(doc_id % 3 AS INT) AS lbl
                    FROM documents WHERE doc_id < 150)),
tok AS (SELECT doc_id, lbl, r.i - 1 AS p, tk[r.i] AS t
        FROM docs, UNNEST(range(1, len(tk) + 1)) AS r(i)),
q(query_id, idx, t, lbl) AS (SELECT * FROM (VALUES {vals})),
m AS (SELECT query_id, count(*) AS m FROM q GROUP BY 1),
anch AS (SELECT q.query_id, tok.doc_id, tok.p - q.idx AS a,
                count(DISTINCT q.idx) AS nn
         FROM tok JOIN q ON q.t = tok.t AND q.lbl = tok.lbl
         WHERE tok.t IN ({vocab})
         GROUP BY 1, 2, 3),
occ AS (SELECT a.query_id, a.doc_id, count(*) AS n_occ
        FROM anch a JOIN m ON m.query_id = a.query_id
        WHERE a.nn = m.m GROUP BY 1, 2)
SELECT query_id, doc_id, n_occ, rank FROM
    (SELECT *, CAST(row_number() OVER
         (PARTITION BY query_id ORDER BY n_occ DESC, doc_id) AS INT)
         AS rank
     FROM occ)
WHERE rank <= {BM25_K}
"""


REGISTRY_PIPELINE.update({
    "q305_tenant_phrase_probe": (q_tenant_phrase_probe,
                                 _oracle_tenant_phrase_probe()),
})


# -- q306 UNICODE analyzer retrieval (VERDICT r13 item 3): a
# -- multilingual corpus where the ASCII analyzer extracts ZERO terms
# -- from every query — CJK/Cyrillic/Greek/Turkish text stops being
# -- invisible to lexical retrieval

#: the analyzer under test: Unicode letter/digit extraction with the
#: two documented lowercase folds (final sigma, U+0307), stopwords
#: still composing after extraction+folds
_Q306_AZ = Analyzer(unicode_words=True, stopwords=("the", "a"))
#: punctuated, MIXED-CASE multilingual queries. Through the ASCII
#: analyzer every one of these yields ZERO analyzable terms (probe
#: raises — pinned in tests/test_bm25_index.py); through the unicode
#: analyzer they hit the corpus vocabulary, exercising both folds:
#: ΣΥΓΧΩΝΕΥΣΙΣ lowers with a contextual final ς in Spark/Python but
#: a plain σ in DuckDB (fold equalizes), İŞLEM full-lowers with a
#: combining dot in Spark/Python but a bare i in DuckDB (fold strips)
_Q306_QUERIES = {0: "Спарк? ΣΥΓΧΩΝΕΥΣΙΣ!",
                 1: "«バッチ処理»…",
                 2: "işlem; спарк"}


def _multi_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents (doc_id < 150) rewritten into a multilingual
    corpus, deterministically in BOTH engines: four high-frequency
    English words become Cyrillic / Greek (trailing Σ — the
    final-sigma fold) / CJK / Turkish-dotted-İ words."""
    text = F.col("text")
    for src, dst in _MULTI_MAP:
        text = F.regexp_replace(text, src, dst)
    return (_load_docs(spark, sf_dir)
            .select("doc_id", "text")
            .where(F.col("doc_id") < 150)
            .select("doc_id", text.alias("text")))


#: literal replacement table (no pattern overlaps; suffixes like
#: "batches" → "バッチ処理es" keep mixed-script single tokens, which
#: both engines extract identically)
_MULTI_MAP = [("spark", "Спарк"), ("merge", "ΣΥΓΧΩΝΕΥΣΙΣ"),
              ("batch", "バッチ処理"), ("stream", "İŞLEM")]

#: DuckDB twin of :func:`_multi_docs`'s text expression
_MULTI_SQL = "text"
for _src, _dst in _MULTI_MAP:
    _MULTI_SQL = f"replace({_MULTI_SQL}, '{_src}', '{_dst}')"


def q_unicode_analyzer_probe(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """StoredBm25Index with Analyzer(unicode_words=True)
    (operators/analyzer.py — VERDICT r13 item 3): q293's build<100
    + epoch-0-append lifecycle over the multilingual corpus, probed
    with punctuated mixed-case multilingual query strings. Build,
    probe and oracle tokenize through the ONE unicode analyzer —
    its Spark / driver-Python / DuckDB twins pinned bit-identical
    on the CJK/Cyrillic/Greek/diacritic matrix in
    tests/test_analyzer.py, including the two documented lowercase
    folds where the engines' Unicode case mappings genuinely differ
    (final sigma; U+0130's combining dot). The
    ASCII-analyzer-retrieves-nothing contrast is pinned in
    tests/test_bm25_index.py::test_unicode_index_finds_what_ascii_drops."""
    import shutil
    import tempfile

    from industrial_data_pipeline_spark.operators.bm25_index import (
        StoredBm25Index)

    docs = _multi_docs(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="idp_q306_")
    try:
        idx = StoredBm25Index(spark, root, n_buckets=16,
                              k1=_BM25_K1, b=_BM25_B,
                              analyzer=_Q306_AZ)
        idx.build(docs.where(F.col("doc_id") < 100))
        idx.append(docs.where(F.col("doc_id") >= 100), epoch_id=0)
        out = (idx.probe(_Q306_QUERIES, k=BM25_K)
               .localCheckpoint(eager=True))
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


def _oracle_unicode_analyzer_probe() -> str:
    k1, b = _BM25_K1, _BM25_B
    qterms = sorted({(qid, t)
                     for qid, qs in _Q306_QUERIES.items()
                     for t in _Q306_AZ.py(qs)})
    vals = ", ".join(f"(CAST({qid} AS BIGINT), '{t}')"
                     for qid, t in qterms)
    vocab = ", ".join(f"'{t}'"
                      for t in sorted({t for _, t in qterms}))
    tk = _Q306_AZ.sql("text")
    return f"""
WITH docs AS (SELECT doc_id, {tk} AS tk
              FROM (SELECT doc_id, {_MULTI_SQL} AS text
                    FROM documents WHERE doc_id < 150)),
q(query_id, t) AS (SELECT * FROM (VALUES {vals})),
stats AS (SELECT count(*) AS n_docs, avg(len(tk)) AS avgdl FROM docs),
posting AS (SELECT doc_id, dl, t, count(*) AS tf
            FROM (SELECT doc_id, len(tk) AS dl, unnest(tk) AS t
                  FROM docs)
            WHERE t IN ({vocab})
            GROUP BY 1, 2, 3),
dfreq AS (SELECT t, count(*) AS df FROM posting GROUP BY 1),
scored AS (SELECT q.query_id, p.doc_id,
                  round(sum(round(
                      ln(1.0 + ((s.n_docs - d.df)::DOUBLE + 0.5)
                              / (d.df::DOUBLE + 0.5))
                      * (p.tf * CAST({k1 + 1.0!r} AS DOUBLE))
                      / (p.tf + CAST({k1!r} AS DOUBLE)
                         * (CAST({1.0 - b!r} AS DOUBLE)
                            + CAST({b!r} AS DOUBLE)
                              * p.dl / s.avgdl)), 6)), 6) AS bm25
           FROM posting p
           JOIN q ON q.t = p.t
           JOIN dfreq d ON d.t = p.t
           CROSS JOIN stats s
           GROUP BY 1, 2)
SELECT query_id, doc_id, bm25, rank FROM
    (SELECT *, CAST(row_number() OVER
         (PARTITION BY query_id ORDER BY bm25 DESC, doc_id) AS INT)
         AS rank
     FROM scored)
WHERE rank <= {BM25_K}
"""


REGISTRY_PIPELINE.update({
    "q306_unicode_analyzer_probe": (q_unicode_analyzer_probe,
                                    _oracle_unicode_analyzer_probe()),
})


# -- q307 SNAPSHOT-MANIFEST hybrid retrieval (VERDICT r13 item 4):
# -- q298's two-asset snapshot consistency held by CONVENTION (the
# -- caller passing the same int twice); here ONE published manifest
# -- id pins BOTH assets, validated per asset at probe time

def q_snapshot_hybrid_retrieval(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """catalog/snapshot.py's SnapshotStore + q298's flow: both
    stored assets build + append epoch 0, then ONE
    ``publish(\"eval-...\")`` records each asset's epoch layout under
    one id; epoch 1 lands on both AFTER the publish, a takedown
    retraction hits both, and the probe passes the SNAPSHOT — not
    two raw ints — through HybridRetriever to both legs, each
    resolving (and validating: covered asset, epoch partitions
    unmoved) against its own root. Results are exactly q298's:
    epoch 1 invisible, retractions winning through time travel
    (retraction never moves epoch partitions, so the manifest stays
    valid — the designed takedown semantics). The
    compacted-away-epoch loud failure, the uncovered-asset refusal
    and the immutable-id contract are pinned in
    tests/test_snapshot.py."""
    import os
    import shutil
    import tempfile

    from industrial_data_pipeline_spark.catalog.snapshot import (
        SnapshotStore)
    from industrial_data_pipeline_spark.operators.bm25_index import (
        StoredBm25Index)
    from industrial_data_pipeline_spark.operators.retrieval import (
        HybridRetriever)
    from industrial_data_pipeline_spark.operators.similarity import (
        StoredIvfIndex)

    docs = (_load_docs(spark, sf_dir).select("doc_id", "text")
            .where(F.col("doc_id") < 200))
    emb = docs.select(
        "doc_id",
        TX.hashed_bow_embedding(F.col("text"), 16).alias("_v"))
    queries = {qid + _HYB_QOFF: qs
               for qid, qs in BM25_QUERIES.items()}
    qdf = (spark.createDataFrame(sorted(queries.items()),
                                 "qid long, qtext string")
           .select("qid",
                   TX.hashed_bow_embedding(F.col("qtext"), 16)
                   .alias("_qv"))
           .localCheckpoint(eager=True))
    root = tempfile.mkdtemp(prefix="idp_q307_")
    try:
        bidx = StoredBm25Index(spark, os.path.join(root, "bm25"),
                               n_buckets=16, k1=_BM25_K1, b=_BM25_B)
        vidx = StoredIvfIndex(spark, os.path.join(root, "ivf"),
                              id_col="doc_id", vec_col="_v",
                              n_cells=8)
        # the publish is the cross-asset barrier: both chains run
        # concurrently up to it (optimization r14 — the q298
        # pattern, phased), the manifest pins the quiesced state,
        # then both post-snapshot chains run concurrently again
        run_chains(
            lambda: (bidx.build(docs.where(F.col("doc_id") < 100)),
                     bidx.append(docs.where((F.col("doc_id") >= 100)
                                            & (F.col("doc_id") < 150)),
                                 epoch_id=0)),
            lambda: (vidx.build(emb.where(F.col("doc_id") < 100)),
                     vidx.append(emb.where((F.col("doc_id") >= 100)
                                           & (F.col("doc_id") < 150)),
                                 epoch_id=0)))
        snap = SnapshotStore(os.path.join(root, "snapshots")).publish(
            "eval-pin", [bidx.root, vidx.root])
        # the store moves on AFTER the publish: a second epoch on
        # both assets, then a takedown on both
        run_chains(
            lambda: (bidx.append(docs.where(F.col("doc_id") >= 150),
                                 epoch_id=1),
                     bidx.retract([50, 105])),
            lambda: (vidx.append(emb.where(F.col("doc_id") >= 150),
                                 epoch_id=1),
                     vidx.retract([50, 105])))

        hyb = HybridRetriever(bidx, vidx, rrf_k=_RRF60)
        out = (hyb.retrieve(queries, qdf, k=10, leg_k=BM25_K,
                            nprobe=4, id_col="qid", vec_col="_qv",
                            as_of_epoch=snap)
               .localCheckpoint(eager=True))
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


REGISTRY_PIPELINE.update({
    # one manifest id == q298's two correctly-paired ints, so the
    # oracle IS q298's replay (same corpus, same pins, same fusion)
    "q307_snapshot_hybrid_retrieval": (
        q_snapshot_hybrid_retrieval,
        _oracle_hybrid_asof_retrieval()),
})


# -- q308 TENANT capstone on the COMPRESSED tier (VERDICT r13
# -- item 5): rare-tenant hybrid retrieval where the dense leg rides
# -- the int8-SQ two-stage probe with per-tenant guaranteed-k — the
# -- at-scale variant of q303 (q303's dense leg read raw vectors)

#: rare-tenant labeling: two 5-doc strata (3 and 4) injected into
#: the common 0/1/2 split — the stratum size every escalation corner
#: lives in (guaranteed-k exists for exactly these tenants)
_Q308_RARE = {3: 5, 4: 11}  # lbl -> doc_id % 31 residue
#: per-query tenant: every query targets a RARE stratum, so with
#: min_results = |stratum| the routing deterministically covers the
#: whole stratum (either the probed cell already holds all of it, or
#: the brute escalation probes exactly the stratum's cells) — the
#: oracle replays candidates = whole stratum with NO routing CTEs,
#: then the REAL two-stage chain (rerank 3 < stratum 5: stage 1 is
#: genuinely selective)
_Q308_FILTERS = {0: 3, 1: 4, 2: 3}
_Q308_LEG_K = 3
_Q308_STRATUM = 5


def _q308_lbl() -> "F.Column":
    return (F.when(F.col("doc_id") % 31 == _Q308_RARE[3], F.lit(3))
            .when(F.col("doc_id") % 31 == _Q308_RARE[4], F.lit(4))
            .otherwise((F.col("doc_id") % 3).cast("int"))
            .cast("int"))


_Q308_LBL_SQL = (f"CAST(CASE WHEN doc_id % 31 = {_Q308_RARE[3]} "
                 f"THEN 3 WHEN doc_id % 31 = {_Q308_RARE[4]} "
                 f"THEN 4 ELSE doc_id % 3 END AS INT)")


def q_tenant_sq_hybrid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The multi-tenant capstone ON THE COMPRESSED TIER (VERDICT
    r13 item 5): ONE shared BM25 asset + ONE shared int8-SQ IVF
    asset serving RARE tenants (5-doc strata), fused through
    :class:`~.operators.retrieval.HybridRetriever` with
    ``dense_tier=\"sq\"`` — the dense leg's stage 1 reads ONLY the
    int8 code columns of the probed cells (no vector bytes —
    plan-asserted in tests/test_retrieval.py), ranks the stratum by
    the exact-int int8 cosine, and only the ``rerank=3`` shortlist
    is exact-re-ranked; ``min_results=5`` (the stratum size) makes
    per-tenant guaranteed-k bite: nprobe=1 cannot cover a scattered
    5-doc stratum, so the escalation's brute path probes exactly the
    stratum's cells (q285's contract) and stage 1 sees the WHOLE
    stratum — deterministically, which is what lets the oracle skip
    routing CTEs and still replay the genuine two-stage rank chain
    per stratum (int8 shortlist of 3 from 5, then exact re-rank).
    The lexical leg is q302's per-stratum-statistics BM25. One
    retrieve() call passes tenant filter + guarantee to both legs."""
    import os
    import shutil
    import tempfile

    from industrial_data_pipeline_spark.operators.bm25_index import (
        StoredBm25Index)
    from industrial_data_pipeline_spark.operators.retrieval import (
        HybridRetriever)
    from industrial_data_pipeline_spark.operators.similarity import (
        StoredIvfIndex)

    docs = (_load_docs(spark, sf_dir)
            .where(F.col("doc_id") < 150)
            .select("doc_id", "text", _q308_lbl().alias("lbl")))
    emb = docs.select(
        "doc_id",
        TX.hashed_bow_embedding(F.col("text"), 16).alias("_v"),
        "lbl")
    queries = {qid + _HYB_QOFF: qs
               for qid, qs in BM25_QUERIES.items()}
    qfilters = {qid + _HYB_QOFF: lbl
                for qid, lbl in _Q308_FILTERS.items()}
    qdf = (spark.createDataFrame(sorted(queries.items()),
                                 "qid long, qtext string")
           .select("qid",
                   TX.hashed_bow_embedding(F.col("qtext"), 16)
                   .alias("_qv"))
           .localCheckpoint(eager=True))
    root = tempfile.mkdtemp(prefix="idp_q308_")
    try:
        bidx = StoredBm25Index(spark, os.path.join(root, "bm25"),
                               n_buckets=16, k1=_BM25_K1, b=_BM25_B,
                               extra_schema="lbl int")
        vidx = StoredIvfIndex(spark, os.path.join(root, "ivf"),
                              id_col="doc_id", vec_col="_v",
                              n_cells=8, sq_int8=True,
                              extra_schema="lbl int")
        # independent per-asset chains, run concurrently
        # (optimization r14 -- the q298 pattern)
        run_chains(
            lambda: (bidx.build(docs.where(F.col("doc_id") < 100)),
                     bidx.append(docs.where(F.col("doc_id") >= 100),
                                 epoch_id=0)),
            lambda: (vidx.build(emb.where(F.col("doc_id") < 100)),
                     vidx.append(emb.where(F.col("doc_id") >= 100),
                                 epoch_id=0)))

        hyb = HybridRetriever(bidx, vidx, rrf_k=_RRF60)
        out = (hyb.retrieve(queries, qdf, k=10,
                            leg_k=_Q308_LEG_K, nprobe=1,
                            id_col="qid", vec_col="_qv",
                            filter_col="lbl",
                            query_filters=qfilters,
                            min_results=_Q308_STRATUM,
                            dense_tier="sq",
                            rerank=_Q308_LEG_K)
               .localCheckpoint(eager=True))
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


def _oracle_tenant_sq_hybrid() -> str:
    from industrial_data_pipeline_spark.suite_llm import (
        _COS, _demb_sql)
    from industrial_data_pipeline_spark.suite_vectors import _QV

    def idot(a: str, b: str) -> str:
        return (f"list_aggregate(list_transform(list_zip({a}, {b}),"
                f" p -> p[1]*p[2]), 'sum')")

    k1, b = _BM25_K1, _BM25_B
    lk = _Q308_LEG_K
    queries = {qid + _HYB_QOFF: qs
               for qid, qs in BM25_QUERIES.items()}
    qfilters = {qid + _HYB_QOFF: lbl
                for qid, lbl in _Q308_FILTERS.items()}
    qterms = sorted({(qid, t) for qid, qs in queries.items()
                     for t in qs.lower().split()})
    vals = ", ".join(
        f"(CAST({qid} AS BIGINT), '{t}',"
        f" CAST({qfilters[qid]} AS INT))"
        for qid, t in qterms)
    vocab = ", ".join(f"'{t}'"
                      for t in sorted({t for _, t in qterms}))
    qvals = ", ".join(
        f"(CAST({qid} AS BIGINT), '{qs}',"
        f" CAST({qfilters[qid]} AS INT))"
        for qid, qs in sorted(queries.items()))
    cos = _COS.format(a="cc.v", b="qe.v")
    return f"""
WITH docs AS (SELECT doc_id, text, {_Q308_LBL_SQL} AS lbl
              FROM documents WHERE doc_id < 150),
tdocs AS (SELECT doc_id, {_TOKS} AS tk, lbl
          FROM (SELECT doc_id, lower(text) AS text, lbl FROM docs)),
q(query_id, t, lbl) AS (SELECT * FROM (VALUES {vals})),
stats AS (SELECT lbl, count(*) AS n_docs, avg(len(tk)) AS avgdl
          FROM tdocs GROUP BY 1),
posting AS (SELECT doc_id, dl, lbl, t, count(*) AS tf
            FROM (SELECT doc_id, len(tk) AS dl, lbl,
                         unnest(tk) AS t
                  FROM tdocs)
            WHERE t IN ({vocab})
            GROUP BY 1, 2, 3, 4),
dfreq AS (SELECT t, lbl, count(*) AS df FROM posting GROUP BY 1, 2),
scored AS (SELECT q.query_id, p.doc_id,
                  round(sum(round(
                      ln(1.0 + ((s.n_docs - d.df)::DOUBLE + 0.5)
                              / (d.df::DOUBLE + 0.5))
                      * (p.tf * CAST({k1 + 1.0!r} AS DOUBLE))
                      / (p.tf + CAST({k1!r} AS DOUBLE)
                         * (CAST({1.0 - b!r} AS DOUBLE)
                            + CAST({b!r} AS DOUBLE)
                              * p.dl / s.avgdl)), 6)), 6) AS bm25
           FROM posting p
           JOIN q ON q.t = p.t AND q.lbl = p.lbl
           JOIN dfreq d ON d.t = p.t AND d.lbl = p.lbl
           JOIN stats s ON s.lbl = q.lbl
           GROUP BY 1, 2),
lexleg AS (SELECT query_id AS qid, doc_id, rl FROM
    (SELECT *, CAST(row_number() OVER
         (PARTITION BY query_id ORDER BY bm25 DESC, doc_id) AS INT)
         AS rl
     FROM scored)
  WHERE rl <= {lk}),
de AS ({_demb_sql('docs')}),
qt(qid, text, qlbl) AS (SELECT * FROM (VALUES {qvals})),
qdocs AS (SELECT qid AS doc_id, text FROM qt),
qe AS (SELECT e.doc_id AS qid, e.v, qt.qlbl
       FROM ({_demb_sql('qdocs')}) e
       JOIN qt ON qt.qid = e.doc_id),
-- stage 0 (routing): min_results = |stratum| makes the candidate
-- set the WHOLE tenant stratum deterministically (brute escalation
-- or a cell already holding all of it) — no routing CTEs needed
v8 AS (SELECT doc_id,
              list_transform(v, x -> CAST(greatest(-127.0,
                  least(127.0, floor(x * scale + 0.5))) AS BIGINT))
                  AS q8
       FROM (SELECT doc_id, v,
                    CASE WHEN amax > 0 THEN 127.0 / amax
                         ELSE 1.0 END AS scale
             FROM (SELECT doc_id, v,
                          list_aggregate(list_transform(v,
                              x -> abs(x)), 'max') AS amax
                   FROM de))),
vn8 AS (SELECT doc_id, q8,
               list_aggregate(list_transform(q8, x -> x*x), 'sum')
                   AS q8n2
        FROM v8),
qq AS (SELECT qid, {_QV.format(c='v')} AS qqv FROM qe),
qn AS (SELECT qid, list_aggregate(list_transform(qqv, x -> x*x),
                                  'sum') AS qn2
       FROM qq),
-- stage 1: int8 cosine over the whole stratum, shortlist {lk} of 5
sdot AS (SELECT qe.qid, w.doc_id,
                {idot('qq.qqv', 'w.q8')} AS num, w.q8n2
         FROM qe
         JOIN docs dd ON dd.lbl = qe.qlbl
         JOIN vn8 w ON w.doc_id = dd.doc_id
         JOIN qq ON qq.qid = qe.qid
         WHERE w.doc_id <> qe.qid AND w.q8n2 > 0),
short AS (SELECT qid, doc_id FROM (
            SELECT s.qid, s.doc_id,
                   row_number() OVER (PARTITION BY s.qid ORDER BY
                       (CAST(num AS DOUBLE)
                        / (sqrt(CAST(qn2 AS DOUBLE))
                           * sqrt(CAST(q8n2 AS DOUBLE)))) DESC,
                       s.doc_id) AS srk
            FROM sdot s JOIN qn USING (qid) WHERE qn2 > 0)
          WHERE srk <= {lk}),
-- stage 2: exact re-rank of the shortlist
denseleg AS (SELECT qid, doc_id, rf FROM
    (SELECT s.qid, s.doc_id,
            CAST(row_number() OVER (PARTITION BY s.qid
                                    ORDER BY {cos} DESC,
                                             s.doc_id) AS INT)
                AS rf
     FROM short s
     JOIN de cc ON cc.doc_id = s.doc_id
     JOIN qe ON qe.qid = s.qid)
  WHERE rf <= {lk}),
fused AS (SELECT coalesce(l.qid, d.qid) AS qid,
                 coalesce(l.doc_id, d.doc_id) AS doc_id,
                 coalesce(1.0 / ({_RRF60} + l.rl), 0.0)
                 + coalesce(1.0 / ({_RRF60} + d.rf), 0.0) AS score,
                 l.rl IS NOT NULL AS in_lexical,
                 d.rf IS NOT NULL AS in_dense
          FROM lexleg l
          FULL JOIN denseleg d
            ON d.qid = l.qid AND d.doc_id = l.doc_id)
SELECT qid AS query_id, doc_id AS cand_id, rrf_rank,
       score + 0.0 AS rrf_score, in_lexical, in_dense
FROM (SELECT *, CAST(row_number() OVER
          (PARTITION BY qid ORDER BY score DESC, doc_id) AS INT)
          AS rrf_rank
      FROM fused)
WHERE rrf_rank <= 10
"""


REGISTRY_PIPELINE.update({
    "q308_tenant_sq_hybrid": (q_tenant_sq_hybrid,
                              _oracle_tenant_sq_hybrid()),
})


# -- q310 HYBRID retrieval, DataFrame-of-queries form: the q300
# -- probe_frames lesson applied to the first-class operator — ONE
# -- query frame (id, text, vector, label) drives both legs

def q_tenant_hybrid_frames(spark: SparkSession,
                           sf_dir: str) -> DataFrame:
    """HybridRetriever.retrieve_frames (operators/retrieval.py):
    q303's tenant-scoped hybrid driven by ONE DataFrame of queries
    carrying id + text + vector + label — no driver dict anywhere
    (a 100k-query eval batch stays a frame): the lexical leg rides
    probe_frames (text tokenizes IN-PLAN through the index's
    persisted analyzer), the dense leg probe_batch, the label
    column scopes both. Shares q303's oracle VERBATIM — the frames
    form must land on the same bytes as the dict form (the q300
    twin discipline, now on the fused operator)."""
    import os
    import shutil
    import tempfile

    from industrial_data_pipeline_spark.operators.bm25_index import (
        StoredBm25Index)
    from industrial_data_pipeline_spark.operators.retrieval import (
        HybridRetriever)
    from industrial_data_pipeline_spark.operators.similarity import (
        StoredIvfIndex)

    docs = (_load_docs(spark, sf_dir)
            .where(F.col("doc_id") < 150)
            .select("doc_id", "text",
                    (F.col("doc_id") % 3).cast("int").alias("lbl")))
    emb = docs.select(
        "doc_id",
        TX.hashed_bow_embedding(F.col("text"), 16).alias("_v"),
        "lbl")
    queries = {qid + _HYB_QOFF: qs
               for qid, qs in BM25_QUERIES.items()}
    qfilters = {qid + _HYB_QOFF: lbl
                for qid, lbl in _Q302_FILTERS.items()}
    qdf = (spark.createDataFrame(
        [(qid, qs, qfilters[qid])
         for qid, qs in sorted(queries.items())],
        "qid long, qtext string, lbl int")
        .select("qid", "qtext",
                TX.hashed_bow_embedding(F.col("qtext"), 16)
                .alias("_qv"), "lbl")
        .localCheckpoint(eager=True))
    root = tempfile.mkdtemp(prefix="idp_q310_")
    try:
        bidx = StoredBm25Index(spark, os.path.join(root, "bm25"),
                               n_buckets=16, k1=_BM25_K1, b=_BM25_B,
                               extra_schema="lbl int")
        vidx = StoredIvfIndex(spark, os.path.join(root, "ivf"),
                              id_col="doc_id", vec_col="_v",
                              n_cells=8, extra_schema="lbl int")
        # independent per-asset chains, run concurrently
        # (optimization r14 -- the q298 pattern)
        run_chains(
            lambda: (bidx.build(docs.where(F.col("doc_id") < 100)),
                     bidx.append(docs.where(F.col("doc_id") >= 100),
                                 epoch_id=0)),
            lambda: (vidx.build(emb.where(F.col("doc_id") < 100)),
                     vidx.append(emb.where(F.col("doc_id") >= 100),
                                 epoch_id=0)))

        hyb = HybridRetriever(bidx, vidx, rrf_k=_RRF60)
        out = (hyb.retrieve_frames(qdf, k=10, leg_k=BM25_K,
                                   nprobe=4, id_col="qid",
                                   text_col="qtext",
                                   vec_col="_qv",
                                   filter_col="lbl",
                                   query_filter_col="lbl")
               .localCheckpoint(eager=True))
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


REGISTRY_PIPELINE.update({
    # the frames form must produce q303's bytes — oracle verbatim
    "q310_tenant_hybrid_frames": (q_tenant_hybrid_frames,
                                  _oracle_tenant_hybrid_retrieval()),
})


# -- q311 MULTILINGUAL TENANT PHRASE search: the full round-14
# -- composition — unicode analyzer × positional postings × tenant
# -- scoping × DataFrame-of-phrases, in ONE probe

#: q306's map extended so every q301 phrase word goes non-Latin
#: (Greek Τραπέζι has no trailing sigma — the fold is a no-op on
#: it; Линия/СОРТИРОВКА exercise Cyrillic case folding)
_Q311_MAP = _MULTI_MAP + [("table", "Τραπέζι"),
                          ("line", "Линия"),
                          ("sort", "СОРТИРОВКА")]
#: unicode analyzer WITHOUT stopwords: positions are indices into
#: the analyzed token array, so the phrase fixture keeps every word
_Q311_AZ = Analyzer(unicode_words=True)
#: the q301 phrases, spoken multilingually and MIXED-CASE — the
#: probe must fold them onto the corpus's forms
_Q311_PHRASES = {0: "ΣΥΓΧΩΝΕΥΣΙΣ バッチ処理",
                 1: "τραπέζι Τραπέζι",
                 2: "the линия СОРТИРОВКА"}
_Q311_FILTERS = {0: 0, 1: 1, 2: 2}


def _q311_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    text = F.col("text")
    for src, dst in _Q311_MAP:
        text = F.regexp_replace(text, src, dst)
    return (_load_docs(spark, sf_dir)
            .where(F.col("doc_id") < 150)
            .select("doc_id", text.alias("text"),
                    (F.col("doc_id") % 3).cast("int").alias("lbl")))


_Q311_SQL = "text"
for _src, _dst in _Q311_MAP:
    _Q311_SQL = f"replace({_Q311_SQL}, '{_src}', '{_dst}')"


def q_multilingual_phrase_probe(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Every round-14 lexical capability composed in one probe:
    a MULTILINGUAL corpus (Cyrillic/Greek/CJK replacements the
    ASCII analyzer would shed) indexed under
    Analyzer(unicode_words=True) with POSITIONAL postings and
    tenant labels, probed by a DATAFRAME of mixed-case multilingual
    PHRASES with per-tenant scoping — phrase_probe_frames tokenizes
    the phrases in-plan through the same unicode analyzer the build
    wrote (posexplode anchor offsets over the folded tokens), the
    label IN-list pushes into the pruned postings scan, and the
    anchor trick runs per stratum. Exercises both lowercase folds
    positionally: the query's τραπέζι/ΣΥΓΧΩΝΕΥΣΙΣ forms must land
    on the corpus's Τραπέζι/ΣΥΓΧΩΝΕΥΣΙΣ tokens or the phrase
    silently misses. The oracle replays the analyzer twin +
    per-stratum anchor vote in SQL."""
    import shutil
    import tempfile

    from industrial_data_pipeline_spark.operators.bm25_index import (
        StoredBm25Index)

    docs = _q311_docs(spark, sf_dir)
    qdf = spark.createDataFrame(
        [(qid, qs, _Q311_FILTERS[qid])
         for qid, qs in sorted(_Q311_PHRASES.items())],
        "query_id long, query_text string, lbl int")
    root = tempfile.mkdtemp(prefix="idp_q311_")
    try:
        idx = StoredBm25Index(spark, root, n_buckets=16,
                              k1=_BM25_K1, b=_BM25_B,
                              analyzer=_Q311_AZ,
                              extra_schema="lbl int")
        idx.build(docs.where(F.col("doc_id") < 100))
        idx.append(docs.where(F.col("doc_id") >= 100), epoch_id=0)
        out = (idx.phrase_probe_frames(qdf, k=BM25_K,
                                       filter_col="lbl")
               .localCheckpoint(eager=True))
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


def _oracle_multilingual_phrase_probe() -> str:
    qterms = [(qid, i, t)
              for qid, qs in sorted(_Q311_PHRASES.items())
              for i, t in enumerate(_Q311_AZ.py(qs))]
    vals = ", ".join(
        f"(CAST({qid} AS BIGINT), {i}, '{t}',"
        f" CAST({_Q311_FILTERS[qid]} AS INT))"
        for qid, i, t in qterms)
    vocab = ", ".join(f"'{t}'"
                      for t in sorted({t for _, _, t in qterms}))
    tk = _Q311_AZ.sql("text")
    return f"""
WITH docs AS (SELECT doc_id, {tk} AS tk,
                     CAST(doc_id % 3 AS INT) AS lbl
              FROM (SELECT doc_id, {_Q311_SQL} AS text
                    FROM documents WHERE doc_id < 150)),
tok AS (SELECT doc_id, lbl, r.i - 1 AS p, tk[r.i] AS t
        FROM docs, UNNEST(range(1, len(tk) + 1)) AS r(i)),
q(query_id, idx, t, lbl) AS (SELECT * FROM (VALUES {vals})),
m AS (SELECT query_id, count(*) AS m FROM q GROUP BY 1),
anch AS (SELECT q.query_id, tok.doc_id, tok.p - q.idx AS a,
                count(DISTINCT q.idx) AS nn
         FROM tok JOIN q ON q.t = tok.t AND q.lbl = tok.lbl
         WHERE tok.t IN ({vocab})
         GROUP BY 1, 2, 3),
occ AS (SELECT a.query_id, a.doc_id, count(*) AS n_occ
        FROM anch a JOIN m ON m.query_id = a.query_id
        WHERE a.nn = m.m GROUP BY 1, 2)
SELECT query_id, doc_id, n_occ, rank FROM
    (SELECT *, CAST(row_number() OVER
         (PARTITION BY query_id ORDER BY n_occ DESC, doc_id) AS INT)
         AS rank
     FROM occ)
WHERE rank <= {BM25_K}
"""


REGISTRY_PIPELINE.update({
    "q311_multilingual_phrase_probe": (
        q_multilingual_phrase_probe,
        _oracle_multilingual_phrase_probe()),
})


# ------------------------------- q235 BPE-apply corpus tokenization

#: Fixed learned-merge table (priority order). Rules' outputs are
#: produced only by earlier rules, the property that makes in-order
#: exhaustive application == rank-priority BPE (see bpe_apply).
BPE_MERGES = [("t", "a"), ("ta", "b"), ("s", "c"), ("sc", "a"),
              ("o", "w"), ("e", "r"), ("j", "o"), ("jo", "i"),
              ("i", "n"), ("t", "h"), ("th", "e")]


def q_bpe_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the fixed BPE merge table to the whole corpus
    (operators/text.py::bpe_apply) — the tokenizer-application pass
    every LLM pipeline runs per tokenizer version; q156 learns the
    pairs, this bills the corpus with them. One shuffle-free
    projection: symbol encoding + len(BPE_MERGES) chained JVM
    replaces + separator-count arithmetic."""
    return TX.bpe_apply(_load_docs(spark, sf_dir), BPE_MERGES)


def _oracle_bpe_apply() -> str:
    sep = "chr(31)"
    enc = ("array_to_string(list_transform(tk, "
           f"w -> regexp_replace(w, '(.)', {sep} || '\\1' || {sep},"
           " 'g')), ' ')")
    sym_chain = "sym"
    for a, b in BPE_MERGES:
        sym_chain = (f"replace({sym_chain}, "
                     f"{sep} || '{a}' || {sep} || {sep} || '{b}' || {sep}, "
                     f"{sep} || '{a}{b}' || {sep})")
    return f"""
WITH docs AS (SELECT doc_id, {_TOKS} AS tk
              FROM (SELECT doc_id,
                           replace(lower(text), chr(31), '') AS text
                    FROM documents)),
-- chr(31) stripped first: bpe_apply removes any literal BPE_SEP
enc AS (SELECT doc_id, {enc} AS sym FROM docs),
m AS (SELECT doc_id, sym, {sym_chain} AS merged FROM enc),
c AS (SELECT doc_id,
             (length(sym) - length(replace(sym, {sep}, ''))) // 2
                 AS n_units,
             (length(merged) - length(replace(merged, {sep}, ''))) // 2
                 AS n_subwords
      FROM m)
SELECT doc_id, CAST(n_units AS BIGINT) AS n_units,
       CAST(n_subwords AS BIGINT) AS n_subwords,
       CAST(n_units - n_subwords AS BIGINT) AS merged_units,
       round(n_units / nullif(n_subwords, 0)::DOUBLE, 6) + 0.0
           AS bpe_ratio
FROM c
"""


REGISTRY_PIPELINE.update({
    "q235_bpe_apply": (q_bpe_apply, _oracle_bpe_apply()),
})


# ------------------------------- q237 corpus text normalization

def q_text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The cleaning pass before any tokenize/shingle/quality stage
    (operators/text.py::normalize_text). The synthetic corpus is
    clean, so 10 dirty mirrors are planted (zero-width prefix, BOM,
    NBSP, tab, BEL control char, double spaces, trailing ZWJ) —
    the normalizer must both FIX those and leave the 500 originals
    byte-identical (changed=false, md5 = md5(text))."""
    docs = _load_docs(spark, sf_dir).select("doc_id", "text")
    dirty = (docs.where(F.col("doc_id") < 10)
             .select((F.col("doc_id") + 600000).alias("doc_id"),
                     F.concat(F.lit("​﻿x "),
                              F.col("text"),
                              F.lit("\t\x07  y  ‍"))
                     .alias("text")))
    return TX.normalize_text(docs.unionByName(dirty))


def _oracle_text_normalize() -> str:
    zw = "chr(8203) || chr(8204) || chr(8205) || chr(65279)"
    ws = "chr(160) || chr(9) || chr(10) || chr(13)"
    dirty = ("chr(8203) || chr(65279) || 'x' || chr(160) || text"
             " || chr(9) || chr(7) || '  y  ' || chr(8205)")
    return f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 600000, {dirty} FROM documents WHERE doc_id < 10),
st AS (SELECT doc_id, text,
              regexp_replace(text, '[' || {zw} || ']', '', 'g') AS s1
       FROM corpus),
st2 AS (SELECT *,
               regexp_replace(s1, '[' || {ws} || ']', ' ', 'g') AS s2
        FROM st),
st3 AS (SELECT *,
               regexp_replace(
                   s2, '[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]',
                   '', 'g') AS s3
        FROM st2),
st4 AS (SELECT *, regexp_replace(s3, ' {{2,}}', ' ', 'g') AS s4
        FROM st3),
fin AS (SELECT *, trim(s4) AS s5 FROM st4)
SELECT doc_id,
       CAST(length(text) AS INT) AS raw_len,
       CAST(length(text) - length(s1) AS INT) AS n_zero_width,
       CAST(length(s2) - length(s3) AS INT) AS n_ctrl,
       CAST(length(s3) - length(s4) AS INT) AS n_collapsed,
       CAST(length(s5) AS INT) AS clean_len,
       s5 <> text AS changed,
       md5(s5) AS clean_md5
FROM fin
"""


REGISTRY_PIPELINE.update({
    "q237_text_normalize": (q_text_normalize,
                            _oracle_text_normalize()),
})


# ----------------------- q238 nDCG@10 ranking-quality evaluation

#: shared IEEE formula (the q228 chi-square pattern): rendered
#: identically into the Spark plan and the DuckDB oracle, with the
#: per-position contribution rounded BEFORE the sum (the q233
#: determinism design). Linear gain (rel / log2(rank+1)): rel is an
#: exact integer and rank ∈ 1..10, so each term is one IEEE division
#: of identical inputs on both engines.
_DCG_TERM = "round({rel} / log2({rank} + 1), 6)"


def q_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nDCG@10 of the q233 BM25 run — the GRADED ranking-quality
    metric beside q195's MRR (first-hit only) and q169's recall
    (set overlap): relevance = TOTAL occurrences of the query's terms
    in the retrieved document (integer, fully derivable so the
    oracle can replay it — and deliberately NOT what BM25 optimizes,
    since BM25 saturates tf and length-normalizes, so the metric
    discriminates: 0.86-1.0 across the fixture queries), linear-gain
    DCG discounts by log2(rank+1), IDCG re-ranks the SAME retrieved
    list ideally (rel desc, doc_id tie-break), nDCG = DCG/IDCG. One
    broadcast qterm join + one |k|-row query-partitioned window over
    the 30-row run — evaluation cost is O(queries x k), independent
    of corpus size."""
    from pyspark.sql import Window
    run = q_bm25_topk(spark, sf_dir)  # (query_id, doc_id, bm25, rank)
    docs = _load_docs(spark, sf_dir).select(
        "doc_id", TX.tokens(F.lower(F.col("text"))).alias("_toks"))
    qterms = sorted({(qid, t) for qid, qs in BM25_QUERIES.items()
                     for t in qs.lower().split()})
    qdf = spark.createDataFrame(qterms, "query_id long, _t string")
    occ = F.size(F.filter("_toks", lambda x: x == F.col("_t")))
    rel = (run.join(docs, "doc_id")
           .join(F.broadcast(qdf), "query_id")
           .groupBy("query_id", "doc_id", "rank")
           .agg(F.sum(occ).cast("int").alias("rel")))
    wi = Window.partitionBy("query_id").orderBy(F.desc("rel"),
                                                F.col("doc_id"))
    scored = rel.withColumn("irank", F.row_number().over(wi)).select(
        "query_id",
        F.expr(_DCG_TERM.format(rel="rel", rank="rank")).alias("_d"),
        F.expr(_DCG_TERM.format(rel="rel", rank="irank")).alias("_i"))
    agg = scored.groupBy("query_id").agg(
        F.round(F.sum("_d"), 6).alias("dcg"),
        F.round(F.sum("_i"), 6).alias("idcg"))
    return agg.select(
        "query_id", "dcg", "idcg",
        (F.round(F.col("dcg") / F.nullif(F.col("idcg"), F.lit(0.0)), 6)
         + F.lit(0.0)).alias("ndcg")).orderBy("query_id")


def _oracle_ndcg() -> str:
    run = _oracle_bm25_topk().strip().rstrip()
    qterms = sorted({(qid, t) for qid, qs in BM25_QUERIES.items()
                     for t in qs.lower().split()})
    vals = ", ".join(f"(CAST({qid} AS BIGINT), '{t}')"
                     for qid, t in qterms)
    d = _DCG_TERM.format(rel="rel", rank="rank")
    i = _DCG_TERM.format(rel="rel", rank="irank")
    return f"""
WITH run AS ({run}),
qt(query_id, t) AS (SELECT * FROM (VALUES {vals})),
dt AS (SELECT doc_id, {_TOKS} AS toks
       FROM (SELECT doc_id, lower(text) AS text FROM documents)),
rel AS (SELECT r.query_id, r.doc_id, r.rank,
               CAST(sum(len(list_filter(dt.toks, x -> x = qt.t)))
                    AS INT) AS rel
        FROM run r JOIN dt USING (doc_id) JOIN qt USING (query_id)
        GROUP BY 1, 2, 3),
ranked AS (SELECT *, CAST(row_number() OVER
               (PARTITION BY query_id ORDER BY rel DESC, doc_id)
               AS INT) AS irank
           FROM rel),
agg AS (SELECT query_id, round(sum({d}), 6) AS dcg,
               round(sum({i}), 6) AS idcg
        FROM ranked GROUP BY 1)
SELECT query_id, dcg, idcg,
       round(dcg / nullif(idcg, 0.0), 6) + 0.0 AS ndcg
FROM agg
"""


REGISTRY_PIPELINE.update({
    "q238_ndcg": (q_ndcg, _oracle_ndcg()),
})


# ----------------------- q250 HTML markup stripping (web-corpus tier)

def q_strip_html(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markup removal, the FIRST pass of every web-corpus pipeline
    (operators/text.py::strip_html): the synthetic corpus is plain
    text, so every document is wrapped IN-QUERY in a deterministic
    HTML shell (head with script+style blocks whose bodies must
    vanish entirely, heading/paragraph tags, a br, entity-encoded
    tail) — the stripper must drop the non-content subtrees, strip
    tags to word boundaries, decode entities, and collapse
    whitespace; the cleaned md5 hash-checks the extraction against
    the oracle's identical-regex replay."""
    docs = _load_docs(spark, sf_dir).select("doc_id", "text")
    wrapped = docs.select(
        "doc_id",
        F.concat(
            F.lit("<html><head><script type=\"a\">var x=1;</script>"
                  "<style>p{color:red}</style></head>"
                  "<body><h1>T</h1><p id=\"d\">"),
            F.col("text"),
            F.lit("</p><br>&nbsp;&amp;&lt;end&gt;</body></html>"))
        .alias("text"))
    return TX.strip_html(wrapped)


def _oracle_strip_html() -> str:
    wrap_pre = ('\'<html><head><script type="a">var x=1;</script>'
                "<style>p{color:red}</style></head>"
                '<body><h1>T</h1><p id="d">\'')
    wrap_post = "'</p><br>&nbsp;&amp;&lt;end&gt;</body></html>'"
    block = ("'<script[^>]*>[^<]*</script>"
             "|<style[^>]*>[^<]*</style>'")
    # entity chain written out explicitly (e1..e6) for readability —
    # it mirrors HTML_ENTITIES order, &amp; last
    return f"""
WITH wrapped AS (
  SELECT doc_id, {wrap_pre} || text || {wrap_post} AS text
  FROM documents),
s1t AS (SELECT doc_id, text,
               regexp_replace(text, {block}, ' ', 'g') AS s1,
               len(regexp_extract_all(text, {block})) AS n_blocks
        FROM wrapped),
s2t AS (SELECT *, regexp_replace(s1, '<[^>]*>', ' ', 'g') AS s2,
               len(regexp_extract_all(s1, '<[^>]*>')) AS n_tags
        FROM s1t),
e1 AS (SELECT *, replace(s2, '&nbsp;', ' ') AS x1,
              len(regexp_extract_all(s2, '&nbsp;')) AS c1 FROM s2t),
e2 AS (SELECT *, replace(x1, '&lt;', '<') AS x2,
              len(regexp_extract_all(x1, '&lt;')) AS c2 FROM e1),
e3 AS (SELECT *, replace(x2, '&gt;', '>') AS x3,
              len(regexp_extract_all(x2, '&gt;')) AS c3 FROM e2),
e4 AS (SELECT *, replace(x3, '&quot;', '"') AS x4,
              len(regexp_extract_all(x3, '&quot;')) AS c4 FROM e3),
e5 AS (SELECT *, replace(x4, '&#39;', '''') AS x5,
              len(regexp_extract_all(x4, '&#39;')) AS c5 FROM e4),
e6 AS (SELECT *, replace(x5, '&amp;', '&') AS x6,
              len(regexp_extract_all(x5, '&amp;')) AS c6 FROM e5),
fin AS (SELECT *, trim(regexp_replace(x6, '\\s+', ' ', 'g')) AS s4
        FROM e6)
SELECT doc_id,
       CAST(length(text) AS INT) AS raw_len,
       CAST(n_blocks AS BIGINT) AS n_dropped_blocks,
       CAST(n_tags AS BIGINT) AS n_tags,
       CAST(c1 + c2 + c3 + c4 + c5 + c6 AS BIGINT) AS n_entities,
       CAST(length(s4) AS INT) AS clean_len,
       md5(s4) AS clean_md5
FROM fin
"""


REGISTRY_PIPELINE.update({
    "q250_strip_html": (q_strip_html, _oracle_strip_html()),
})


# -------------------- q251 ROUGE-N summary-overlap evaluation

def q_rouge_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROUGE-1/2 eval harness (operators/text.py::rouge_n) over
    deterministic candidate/reference pairs: candidate = the doc
    with every 3rd token dropped (a lossy 'summary' whose true
    overlap statistics are computable), reference = the full doc.
    Clipped multiset counts — the naive set-overlap shortcut would
    diverge on repeated tokens and hash-mismatch. Completes the
    eval family (q169 recall, q195 MRR, q238 nDCG) with the
    generation-side metric every summarization/distillation
    pipeline reports."""
    docs = _load_docs(spark, sf_dir).select("doc_id", "text")
    toks = TX.tokens(F.col("text"))
    cand = F.array_join(
        F.filter(toks, lambda x, i: i % 3 != 0), " ")
    pairs = docs.select(
        "doc_id", cand.alias("candidate"),
        F.col("text").alias("reference"))
    return TX.rouge_n(pairs)


def _oracle_rouge_eval() -> str:
    ltoks = ("list_filter(string_split_regex(trim(lower(text)),"
             " '\\s+'), x -> x <> '')")

    def big(lst: str) -> str:
        return (f"CASE WHEN len({lst}) >= 2 THEN "
                f"list_transform(generate_series(1, len({lst}) - 1),"
                f" i -> {lst}[i] || ' ' || {lst}[i+1])"
                f" ELSE [] END")

    def metric(n: int, cg: str, rg: str) -> str:
        return f"""
c{n} AS (SELECT doc_id, g, count(*) AS n FROM
           (SELECT doc_id, unnest({cg}) AS g FROM pairs)
         GROUP BY 1, 2),
r{n} AS (SELECT doc_id, g, count(*) AS n FROM
           (SELECT doc_id, unnest({rg}) AS g FROM pairs)
         GROUP BY 1, 2),
o{n} AS (SELECT doc_id, CAST(sum(least(c{n}.n, r{n}.n)) AS BIGINT)
                AS ov
         FROM c{n} JOIN r{n} USING (doc_id, g) GROUP BY 1),
m{n} AS (SELECT p.doc_id,
                round(coalesce(ov, 0)
                      / nullif(len({cg})::DOUBLE, 0.0), 6)
                    AS rouge{n}_p,
                round(coalesce(ov, 0)
                      / nullif(len({rg})::DOUBLE, 0.0), 6)
                    AS rouge{n}_r,
                round(2.0 * (coalesce(ov, 0)
                             / nullif(len({cg})::DOUBLE, 0.0))
                          * (coalesce(ov, 0)
                             / nullif(len({rg})::DOUBLE, 0.0))
                      / nullif((coalesce(ov, 0)
                                / nullif(len({cg})::DOUBLE, 0.0))
                               + (coalesce(ov, 0)
                                  / nullif(len({rg})::DOUBLE, 0.0)),
                               0.0), 6) AS rouge{n}_f1
         FROM pairs p LEFT JOIN o{n} USING (doc_id))"""

    return f"""
WITH base AS (SELECT doc_id, {ltoks} AS rt FROM documents),
pairs AS (SELECT doc_id, rt,
                 list_transform(
                     list_filter(generate_series(1, len(rt)),
                                 i -> (i - 1) % 3 <> 0),
                     i -> rt[i]) AS ct
          FROM base),
{metric(1, 'ct', 'rt').lstrip()},
{metric(2, big('ct'), big('rt')).lstrip()}
SELECT m1.doc_id, m1.rouge1_p, m1.rouge1_r, m1.rouge1_f1,
       m2.rouge2_p, m2.rouge2_r, m2.rouge2_f1
FROM m1 JOIN m2 USING (doc_id)
"""


REGISTRY_PIPELINE.update({
    "q251_rouge_eval": (q_rouge_eval, _oracle_rouge_eval()),
})


# ------------------------- q258 BLEU-4 generation evaluation

def q_bleu_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentence BLEU-4 (operators/text.py::bleu) over q251's
    deterministic lossy-summary pairs (candidate = every 3rd token
    dropped, reference = the full doc): clipped modified precisions
    p1..p4, brevity penalty, geometric-mean BLEU — the
    translation/generation-side metric that completes the eval
    family (q251 ROUGE-1/2, q255 ROUGE-L, q169 recall, q195 MRR,
    q238 nDCG). Dropping interior tokens leaves real but degraded
    higher-n overlaps (adjacent kept tokens still form shared
    bigrams), so all four precisions are exercised non-trivially;
    the oracle replays the clipped counts, BP and the ln/exp chain
    generically in SQL."""
    docs = _load_docs(spark, sf_dir).select("doc_id", "text")
    toks = TX.tokens(F.col("text"))
    cand = F.array_join(
        F.filter(toks, lambda x, i: i % 3 != 0), " ")
    pairs = docs.select(
        "doc_id", cand.alias("candidate"),
        F.col("text").alias("reference"))
    return TX.bleu(pairs)


def bleu_chain_sql(with_pairs: str) -> str:
    """Generic DuckDB BLEU-4 over a caller-supplied CTE chain ending
    in ``pairs(doc_id, ct, rt)`` (candidate / reference token lists)
    — the replayable half of operators/text.py::bleu, reusable by
    the q258 oracle AND the engine-parity property tests
    (tests/test_kernel_properties.py, VERDICT r9 item 5)."""
    def ngrams(lst: str, n: int) -> str:
        if n == 1:
            return lst
        return (f"CASE WHEN len({lst}) >= {n} THEN "
                f"list_transform(generate_series(1,"
                f" len({lst}) - {n - 1}),"
                f" i -> array_to_string({lst}[i:i+{n - 1}], ' '))"
                f" ELSE [] END")

    parts = []
    for n in range(1, 5):
        cg, rg = ngrams("ct", n), ngrams("rt", n)
        parts.append(f"""
c{n} AS (SELECT doc_id, g, count(*) AS n FROM
           (SELECT doc_id, unnest({cg}) AS g FROM pairs)
         GROUP BY 1, 2),
r{n} AS (SELECT doc_id, g, count(*) AS n FROM
           (SELECT doc_id, unnest({rg}) AS g FROM pairs)
         GROUP BY 1, 2),
o{n} AS (SELECT doc_id, CAST(sum(least(c{n}.n, r{n}.n)) AS BIGINT)
                AS ov
         FROM c{n} JOIN r{n} USING (doc_id, g) GROUP BY 1),
t{n} AS (SELECT doc_id, len({cg}) AS tc FROM pairs)""")
    pr = ", ".join(
        f"coalesce(o{n}.ov, 0) / nullif(t{n}.tc::DOUBLE, 0.0) AS rp{n}"
        for n in range(1, 5))
    joins = "\n".join(
        f"JOIN t{n} USING (doc_id) LEFT JOIN o{n} USING (doc_id)"
        for n in range(1, 5))
    dead = " OR ".join(f"rp{n} IS NULL OR rp{n} = 0.0"
                       for n in range(1, 5))
    lsum = " + ".join(f"ln(rp{n})" for n in range(1, 5))
    return f"""
WITH {with_pairs.strip().rstrip(',')},
{",".join(p.lstrip() for p in parts)},
raw AS (SELECT p.doc_id, len(p.ct) AS c, len(p.rt) AS r, {pr}
        FROM pairs p
        {joins}),
scored AS (SELECT doc_id, c, r, rp1, rp2, rp3, rp4,
                  CASE WHEN c >= r THEN 1.0
                       ELSE exp(1.0 - r / c::DOUBLE) END AS rbp
           FROM raw)
SELECT doc_id,
       round(CASE WHEN c = 0 THEN NULL ELSE rp1 END, 6) AS p1,
       round(CASE WHEN c = 0 THEN NULL ELSE rp2 END, 6) AS p2,
       round(CASE WHEN c = 0 THEN NULL ELSE rp3 END, 6) AS p3,
       round(CASE WHEN c = 0 THEN NULL ELSE rp4 END, 6) AS p4,
       round(CASE WHEN c = 0 THEN NULL ELSE rbp END, 6) AS bp,
       round(CASE WHEN c = 0 THEN NULL
                  WHEN {dead} THEN 0.0
                  ELSE rbp * exp(({lsum}) / 4.0) END, 6) AS bleu
FROM scored
"""


def _oracle_bleu_eval() -> str:
    ltoks = ("list_filter(string_split_regex(trim(lower(text)),"
             " '\\s+'), x -> x <> '')")
    return bleu_chain_sql(f"""
base AS (SELECT doc_id, {ltoks} AS rt FROM documents),
pairs AS (SELECT doc_id, rt,
                 list_transform(
                     list_filter(generate_series(1, len(rt)),
                                 i -> (i - 1) % 3 <> 0),
                     i -> rt[i]) AS ct
          FROM base)""")


REGISTRY_PIPELINE.update({
    "q258_bleu_eval": (q_bleu_eval, _oracle_bleu_eval()),
})


# ----------------------------- q262 chrF character-level evaluation

def q_chrf_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """chrF (operators/text.py::chrf) over q251's lossy-summary
    pairs: character 1..6-gram clipped overlaps of the
    whitespace-stripped lowered texts, per-order precision/recall
    means, β=2 F-score — the tokenization-free eval metric
    completing the family (BLEU q258, ROUGE-1/2 q251, ROUGE-L q255).
    Dropping every 3rd token removes contiguous character runs, so
    all six orders score non-trivially; the oracle replays the
    character n-grams, clipping, the zero-order convention and the
    F-beta chain generically in SQL."""
    docs = _load_docs(spark, sf_dir).select("doc_id", "text")
    toks = TX.tokens(F.col("text"))
    cand = F.array_join(
        F.filter(toks, lambda x, i: i % 3 != 0), " ")
    pairs = docs.select(
        "doc_id", cand.alias("candidate"),
        F.col("text").alias("reference"))
    return TX.chrf(pairs)


#: the strip set pinned on both engines — ONE constant, defined next
#: to the Spark kernel it must match (self-review r10); re-exported
#: here for the oracle builders and tests
from industrial_data_pipeline_spark.operators.text import (  # noqa: E402,F401
    CHRF_WS)


def chrf_chain_sql(with_base: str) -> str:
    """Generic DuckDB chrF over a caller-supplied CTE chain ending in
    ``base(doc_id, cc, rc)`` (whitespace-stripped lowered candidate /
    reference) — the replayable half of operators/text.py::chrf,
    reusable by the q262 oracle AND the engine-parity property tests
    (tests/test_kernel_properties.py, VERDICT r9 item 5)."""
    def ngrams(src: str, n: int) -> str:
        return (f"CASE WHEN length({src}) >= {n} THEN "
                f"list_transform(generate_series(1,"
                f" length({src}) - {n - 1}),"
                f" i -> substring({src}, i, {n}))"
                f" ELSE CAST([] AS VARCHAR[]) END")

    parts, pterms, rterms = [], [], []
    for n in range(1, 7):
        cg, rg = ngrams("cc", n), ngrams("rc", n)
        parts.append(f"""
c{n} AS (SELECT doc_id, g, count(*) AS n FROM
           (SELECT doc_id, unnest({cg}) AS g FROM base)
         GROUP BY 1, 2),
r{n} AS (SELECT doc_id, g, count(*) AS n FROM
           (SELECT doc_id, unnest({rg}) AS g FROM base)
         GROUP BY 1, 2),
o{n} AS (SELECT doc_id, sum(least(c{n}.n, r{n}.n)) AS ov
         FROM c{n} JOIN r{n} USING (doc_id, g) GROUP BY 1),
t{n} AS (SELECT doc_id, len({cg}) AS tc, len({rg}) AS tr
         FROM base)""")
        pterms.append(f"CASE WHEN t{n}.tc > 0 THEN"
                      f" coalesce(o{n}.ov, 0) / t{n}.tc::DOUBLE"
                      f" ELSE 0.0 END")
        rterms.append(f"CASE WHEN t{n}.tr > 0 THEN"
                      f" coalesce(o{n}.ov, 0) / t{n}.tr::DOUBLE"
                      f" ELSE 0.0 END")
    joins = "\n".join(
        f"JOIN t{n} USING (doc_id) LEFT JOIN o{n} USING (doc_id)"
        for n in range(1, 7))
    psum = " + ".join(pterms)
    rsum = " + ".join(rterms)
    return f"""
WITH {with_base.strip().rstrip(',')},
{",".join(p.lstrip() for p in parts)},
raw AS (SELECT b.doc_id, length(b.cc) AS lc, length(b.rc) AS lr,
               ({psum}) / 6.0 AS p, ({rsum}) / 6.0 AS r
        FROM base b
        {joins})
SELECT doc_id,
       round(CASE WHEN lc = 0 OR lr = 0 THEN NULL ELSE p END, 6)
           AS chrf_p,
       round(CASE WHEN lc = 0 OR lr = 0 THEN NULL ELSE r END, 6)
           AS chrf_r,
       round(CASE WHEN lc = 0 OR lr = 0 THEN NULL
                  ELSE coalesce(5.0 * p * r
                                / nullif(4.0 * p + r, 0.0), 0.0)
             END, 6) AS chrf
FROM raw
"""


def _oracle_chrf_eval() -> str:
    ltoks = ("list_filter(string_split_regex(trim(lower(text)),"
             " '\\s+'), x -> x <> '')")
    return chrf_chain_sql(f"""
tk AS (SELECT doc_id, {ltoks} AS rt FROM documents),
base AS (SELECT doc_id,
                regexp_replace(lower(array_to_string(
                    list_transform(
                        list_filter(generate_series(1, len(rt)),
                                    i -> (i - 1) % 3 <> 0),
                        i -> rt[i]), ' ')), '{CHRF_WS}', '', 'g')
                    AS cc,
                regexp_replace(lower(array_to_string(rt, ' ')),
                               '{CHRF_WS}', '', 'g') AS rc
         FROM tk)""")


REGISTRY_PIPELINE.update({
    "q262_chrf_eval": (q_chrf_eval, _oracle_chrf_eval()),
})


# --------------- q268 temperature-based domain mixing (upsampling)

def q_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based domain mixing (operators/text.py::
    temperature_mix): every document is emitted
    ``sqrt(max_n / n_lang)`` times — the dominant language stays at
    one copy, smaller languages are upsampled toward parity with the
    alpha=0.5 temper of multilingual pretraining mixes. The
    repetition half q48's rate sampler cannot express: fractional
    copies are realized by the portable md5 hash, copy counts are
    computed from sqrt/div only (IEEE correctly-rounded, so Spark
    and the oracle agree BIT-for-bit — pow would not), and the fact
    table is never shuffled (counts partial-agg, spec broadcast
    back, map-side explode)."""
    return TX.temperature_mix(
        load(spark, sf_dir, "documents").select("doc_id", "lang"),
        id_col="doc_id", domain_col="lang", alpha=0.5)


ORACLE_TEMPERATURE_MIX = f"""
WITH n AS (SELECT lang, count(*) AS n_s FROM documents
           GROUP BY lang),
m AS (SELECT max(n_s) AS mx FROM n),
c AS (SELECT lang,
             sqrt(CAST(mx AS DOUBLE) / CAST(n_s AS DOUBLE)) AS cop
      FROM n, m),
d AS (SELECT lang, CAST(floor(cop) AS BIGINT) AS base,
             CAST(floor((cop - floor(cop)) * 1000000) AS BIGINT)
                 AS fs
      FROM c),
docs AS (SELECT doc_id, d.lang,
                base + CASE WHEN {_h64("doc_id || ':mix1'")}
                                 % 1000000 < fs
                            THEN 1 ELSE 0 END AS n_copies
         FROM documents JOIN d USING (lang))
SELECT doc_id, lang, n_copies, CAST(i AS INT) AS copy_idx
FROM docs, UNNEST(generate_series(0, n_copies - 1)) AS t(i)
"""

REGISTRY_PIPELINE.update({
    "q268_temperature_mix": (q_temperature_mix,
                             ORACLE_TEMPERATURE_MIX),
})


# ---------- q272 epoch-plan export: temperature mix -> shard shuffle

def q_mixed_shard_manifest(spark: SparkSession,
                           sf_dir: str) -> DataFrame:
    """The training-epoch EXPORT plan end to end: the q268
    temperature mix (rare languages upsampled, repeats materialized
    as (doc_id, copy_idx) rows) flows straight into the q152
    deterministic shuffle+shard — the shard key hashes
    (doc_id, copy_idx) so a document's copies SPREAD across shards
    (a repeated doc must not land twice in one reader's shard
    window), the order key is a second independent hash. Emits the
    per-shard manifest a training job checks before consuming:
    row count, distinct docs, char volume, first/last row in
    shuffle order. Composition is the point: mix (no fact shuffle)
    → one groupBy shuffle for the manifest; at 100 TB the same
    plan writes shards via repartition(shard) with the manifest as
    the verification artifact."""
    mixed = TX.temperature_mix(
        load(spark, sf_dir, "documents").select("doc_id", "lang"),
        id_col="doc_id", domain_col="lang", alpha=0.5)
    tag = F.concat(F.col("doc_id").cast("string"), F.lit(":"),
                   F.col("copy_idx").cast("string"))
    d = (mixed
         .withColumn("shard", F.pmod(
             TX.hash64(F.concat(tag, F.lit(":epoch1"))), F.lit(8)))
         .withColumn("_okey",
                     TX.hash64(F.concat(tag, F.lit(":ord1"))))
         .join(load(spark, sf_dir, "documents")
               .select("doc_id", "n_chars"), "doc_id"))
    key = F.struct(F.col("_okey"), F.col("doc_id"),
                   F.col("copy_idx"))
    return (d.groupBy("shard")
            .agg(F.count("*").alias("n_rows"),
                 F.countDistinct("doc_id").alias("n_docs"),
                 F.sum("n_chars").alias("total_chars"),
                 F.min_by("doc_id", key).alias("first_doc"),
                 F.max_by("doc_id", key).alias("last_doc")))


ORACLE_MIXED_SHARD_MANIFEST = f"""
WITH n AS (SELECT lang, count(*) AS n_s FROM documents
           GROUP BY lang),
m AS (SELECT max(n_s) AS mx FROM n),
c AS (SELECT lang,
             sqrt(CAST(mx AS DOUBLE) / CAST(n_s AS DOUBLE)) AS cop
      FROM n, m),
d AS (SELECT lang, CAST(floor(cop) AS BIGINT) AS base,
             CAST(floor((cop - floor(cop)) * 1000000) AS BIGINT)
                 AS fs
      FROM c),
docs AS (SELECT doc_id, d.lang,
                base + CASE WHEN {_h64("doc_id || ':mix1'")}
                                 % 1000000 < fs
                            THEN 1 ELSE 0 END AS n_copies
         FROM documents JOIN d USING (lang)),
mixed AS (SELECT doc_id, CAST(i AS INT) AS copy_idx
          FROM docs, UNNEST(generate_series(0, n_copies - 1))
              AS t(i)),
k AS (SELECT doc_id, copy_idx,
             {_h64("doc_id || ':' || copy_idx || ':epoch1'")} % 8
                 AS shard,
             {_h64("doc_id || ':' || copy_idx || ':ord1'")} AS okey
      FROM mixed),
j AS (SELECT k.*, dd.n_chars
      FROM k JOIN documents dd USING (doc_id)),
r AS (SELECT *,
             row_number() OVER (PARTITION BY shard
                                ORDER BY okey, doc_id, copy_idx)
                 AS rn_a,
             row_number() OVER (PARTITION BY shard
                                ORDER BY okey DESC, doc_id DESC,
                                         copy_idx DESC) AS rn_d
      FROM j)
SELECT shard, count(*) AS n_rows,
       count(DISTINCT doc_id) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       max(CASE WHEN rn_a = 1 THEN doc_id END) AS first_doc,
       max(CASE WHEN rn_d = 1 THEN doc_id END) AS last_doc
FROM r GROUP BY shard
"""

REGISTRY_PIPELINE.update({
    "q272_mixed_shard_manifest": (q_mixed_shard_manifest,
                                  ORACLE_MIXED_SHARD_MANIFEST),
})


# -------- q278 corpus-level multi-reference BLEU (WMT reporting)

def q_corpus_bleu(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus BLEU-4 with THREE references per candidate
    (operators/text.py::corpus_bleu — VERDICT r10 item 6, the
    WMT-style reporting form): references = [full doc, every-3rd
    -token-dropped, doc + two extra tokens]; candidates by family —
    doc_id < 40 the full doc (perfect vs ref 1), 40–79 the dropped
    variant (perfect vs ref 2 — the MULTI-reference clip is what
    keeps these at p_n = 1), 80–119 three never-in-corpus tokens
    (all-miss — dilutes the POOLED precisions instead of zeroing
    its own row, the exact corpus-vs-sentence distinction). One
    output row: pooled p1..p4 over exact corpus-summed counts,
    corpus brevity from closest-reference effective lengths, the
    unsmoothed geometric mean. The oracle replays clip-max, pooling,
    effective lengths and the single float chain generically in
    SQL."""
    docs = _load_docs(spark, sf_dir).where(F.col("doc_id") < 120)
    toks = TX.tokens(F.col("text"))
    dropped = F.array_join(
        F.filter(toks, lambda x, i: i % 3 != 0), " ")
    extra = F.concat(F.col("text"), F.lit(" zzq278x zzq278y"))
    cand = (F.when(F.col("doc_id") < 40, F.col("text"))
            .when(F.col("doc_id") < 80, dropped)
            .otherwise(F.lit("zzzq278a zzzq278b zzzq278c")))
    pairs = docs.select(
        "doc_id", cand.alias("candidate"),
        F.array(F.col("text"), dropped, extra).alias("references"))
    return TX.corpus_bleu(pairs)


def corpus_bleu_chain_sql(with_ctes: str) -> str:
    """Generic DuckDB corpus-BLEU-4 over caller CTEs ending in
    ``cpairs(doc_id, ct)`` (candidate token list) and
    ``crefs(doc_id, ri, rt)`` (one row per reference, token list) —
    the replayable half of operators/text.py::corpus_bleu."""
    def ngrams(lst: str, n: int) -> str:
        if n == 1:
            return lst
        return (f"CASE WHEN len({lst}) >= {n} THEN "
                f"list_transform(generate_series(1,"
                f" len({lst}) - {n - 1}),"
                f" i -> array_to_string({lst}[i:i+{n - 1}], ' '))"
                f" ELSE [] END")

    parts = []
    for n in range(1, 5):
        cg, rg = ngrams("ct", n), ngrams("rt", n)
        parts.append(f"""
cb{n} AS (SELECT doc_id, g, count(*) AS n FROM
            (SELECT doc_id, unnest({cg}) AS g FROM cpairs)
          GROUP BY 1, 2),
rb{n} AS (SELECT doc_id, g, max(n) AS n FROM (
            SELECT doc_id, ri, g, count(*) AS n FROM
              (SELECT doc_id, ri, unnest({rg}) AS g FROM crefs)
            GROUP BY 1, 2, 3) GROUP BY 1, 2),
ob{n} AS (SELECT CAST(coalesce(sum(least(cb{n}.n, rb{n}.n)), 0)
                      AS BIGINT) AS ov{n}
          FROM cb{n} JOIN rb{n} USING (doc_id, g)),
tb{n} AS (SELECT CAST(coalesce(sum(len({cg})), 0) AS BIGINT)
                 AS tc{n}
          FROM cpairs)""")
    rps = ", ".join(
        f"ov{n} / nullif(tc{n}::DOUBLE, 0.0) AS rp{n}"
        for n in range(1, 5))
    crosses = " ".join(f"CROSS JOIN ob{n} CROSS JOIN tb{n}"
                       for n in range(1, 5))
    dead = " OR ".join(f"rp{n} IS NULL OR rp{n} = 0.0"
                       for n in range(1, 5))
    lsum = " + ".join(f"ln(rp{n})" for n in range(1, 5))
    return f"""
WITH {with_ctes.strip().rstrip(',')},
clen AS (SELECT doc_id, len(ct) AS c FROM cpairs),
eff AS (SELECT doc_id, rl FROM (
          SELECT r.doc_id, len(r.rt) AS rl,
                 row_number() OVER (PARTITION BY r.doc_id
                                    ORDER BY abs(len(r.rt) - c.c),
                                             len(r.rt)) AS rn
          FROM crefs r JOIN clen c USING (doc_id)) WHERE rn = 1),
lens AS (SELECT (SELECT count(*) FROM clen) AS n_pairs,
                (SELECT CAST(coalesce(sum(c), 0) AS BIGINT)
                 FROM clen) AS cc,
                (SELECT CAST(coalesce(sum(rl), 0) AS BIGINT)
                 FROM eff) AS rr),
{",".join(p.lstrip() for p in parts)},
raw AS (SELECT n_pairs, cc, rr, {rps}
        FROM lens {crosses}),
scored AS (SELECT *, CASE WHEN cc >= rr THEN 1.0
                          ELSE exp(1.0 - rr / cc::DOUBLE) END AS rbp
           FROM raw)
SELECT n_pairs, cc AS c_len, rr AS r_len,
       round(CASE WHEN cc = 0 THEN NULL ELSE rp1 END, 6) AS p1,
       round(CASE WHEN cc = 0 THEN NULL ELSE rp2 END, 6) AS p2,
       round(CASE WHEN cc = 0 THEN NULL ELSE rp3 END, 6) AS p3,
       round(CASE WHEN cc = 0 THEN NULL ELSE rp4 END, 6) AS p4,
       round(CASE WHEN cc = 0 THEN NULL ELSE rbp END, 6) AS bp,
       round(CASE WHEN cc = 0 THEN NULL
                  WHEN {dead} THEN 0.0
                  ELSE rbp * exp(({lsum}) / 4.0) END, 6) AS bleu
FROM scored
"""


def _oracle_corpus_bleu() -> str:
    ltoks = ("list_filter(string_split_regex(trim(lower(text)),"
             " '\\s+'), x -> x <> '')")
    return corpus_bleu_chain_sql(f"""
b278 AS (SELECT doc_id, {ltoks} AS rt0 FROM documents
         WHERE doc_id < 120),
v278 AS (SELECT doc_id, rt0,
                list_transform(
                    list_filter(generate_series(1, len(rt0)),
                                i -> (i - 1) % 3 <> 0),
                    i -> rt0[i]) AS dropped,
                list_concat(rt0, ['zzq278x', 'zzq278y']) AS extra
         FROM b278),
cpairs AS (SELECT doc_id,
                  CASE WHEN doc_id < 40 THEN rt0
                       WHEN doc_id < 80 THEN dropped
                       ELSE ['zzzq278a', 'zzzq278b', 'zzzq278c']
                  END AS ct
           FROM v278),
crefs AS (SELECT doc_id, 0 AS ri, rt0 AS rt FROM v278
          UNION ALL
          SELECT doc_id, 1, dropped FROM v278
          UNION ALL
          SELECT doc_id, 2, extra FROM v278)""")


REGISTRY_PIPELINE.update({
    "q278_corpus_bleu": (q_corpus_bleu, _oracle_corpus_bleu()),
})


# ------ q287 corpus-level multi-reference chrF (WMT reporting form)

def q_corpus_chrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus chrF with THREE references per candidate
    (operators/text.py::corpus_chrf — VERDICT r11 item 3,
    completing the q262 sentence metric the way q278 completed
    BLEU): the q278 scenario verbatim — references = [full doc,
    every-3rd-token-dropped, doc + two extra tokens]; candidates by
    family (full / dropped / three never-in-corpus tokens). The
    max-clip across references keeps the first two families'
    overlaps whole while the all-miss family dilutes the POOLED
    per-order ratios instead of zeroing its own row — the
    corpus-vs-sentence distinction, now on character n-grams. The
    oracle replays char grams, clip-max, corpus pooling, the
    zero-order convention and the F-beta chain generically in
    SQL."""
    docs = _load_docs(spark, sf_dir).where(F.col("doc_id") < 120)
    toks = TX.tokens(F.col("text"))
    dropped = F.array_join(
        F.filter(toks, lambda x, i: i % 3 != 0), " ")
    extra = F.concat(F.col("text"), F.lit(" zzq287x zzq287y"))
    cand = (F.when(F.col("doc_id") < 40, F.col("text"))
            .when(F.col("doc_id") < 80, dropped)
            .otherwise(F.lit("zzzq287a zzzq287b zzzq287c")))
    pairs = docs.select(
        "doc_id", cand.alias("candidate"),
        F.array(F.col("text"), dropped, extra).alias("references"))
    return TX.corpus_chrf(pairs)


def corpus_chrf_chain_sql(with_ctes: str) -> str:
    """Generic DuckDB corpus-chrF (β=2, orders 1..6) over caller
    CTEs ending in ``cbase(doc_id, cc)`` (stripped lowered
    candidate chars) and ``crefs(doc_id, ri, rc)`` (one row per
    reference, stripped chars) — the replayable half of
    operators/text.py::corpus_chrf."""
    def ngrams(src: str, n: int) -> str:
        return (f"CASE WHEN length({src}) >= {n} THEN "
                f"list_transform(generate_series(1,"
                f" length({src}) - {n - 1}),"
                f" i -> substring({src}, i, {n}))"
                f" ELSE CAST([] AS VARCHAR[]) END")

    parts, pterms, rterms = [], [], []
    for n in range(1, 7):
        cg, rg = ngrams("cc", n), ngrams("rc", n)
        parts.append(f"""
kc{n} AS (SELECT doc_id, g, count(*) AS n FROM
            (SELECT doc_id, unnest({cg}) AS g FROM cbase)
          GROUP BY 1, 2),
kr{n} AS (SELECT doc_id, g, max(n) AS n FROM (
            SELECT doc_id, ri, g, count(*) AS n FROM
              (SELECT doc_id, ri, unnest({rg}) AS g FROM crefs)
            GROUP BY 1, 2, 3) GROUP BY 1, 2),
ko{n} AS (SELECT CAST(coalesce(sum(least(kc{n}.n, kr{n}.n)), 0)
                      AS BIGINT) AS ov{n}
          FROM kc{n} JOIN kr{n} USING (doc_id, g)),
kt{n} AS (SELECT CAST(coalesce(sum(len({cg})), 0) AS BIGINT)
                 AS tc{n}
          FROM cbase),
ku{n} AS (SELECT CAST(coalesce(sum(n), 0) AS BIGINT) AS tr{n}
          FROM kr{n})""")
        pterms.append(f"CASE WHEN tc{n} > 0 THEN"
                      f" ov{n} / tc{n}::DOUBLE ELSE 0.0 END")
        rterms.append(f"CASE WHEN tr{n} > 0 THEN"
                      f" ov{n} / tr{n}::DOUBLE ELSE 0.0 END")
    crosses = " ".join(f"CROSS JOIN ko{n} CROSS JOIN kt{n}"
                       f" CROSS JOIN ku{n}" for n in range(1, 7))
    psum = " + ".join(pterms)
    rsum = " + ".join(rterms)
    return f"""
WITH {with_ctes.strip().rstrip(',')},
np AS (SELECT count(*) AS n_pairs FROM cbase),
{",".join(p.lstrip() for p in parts)},
raw AS (SELECT n_pairs, tc1 AS c_chars, tr1 AS r_chars,
               ({psum}) / 6.0 AS p, ({rsum}) / 6.0 AS r
        FROM np {crosses})
SELECT n_pairs, c_chars, r_chars,
       round(CASE WHEN n_pairs = 0 THEN NULL ELSE p END, 6)
           AS chrf_p,
       round(CASE WHEN n_pairs = 0 THEN NULL ELSE r END, 6)
           AS chrf_r,
       round(CASE WHEN n_pairs = 0 THEN NULL
                  ELSE coalesce(5.0 * p * r
                                / nullif(4.0 * p + r, 0.0), 0.0)
             END, 6) AS chrf
FROM raw
"""


def _oracle_corpus_chrf() -> str:
    ltoks = ("list_filter(string_split_regex(trim(lower(text)),"
             " '\\s+'), x -> x <> '')")

    def strip(expr: str) -> str:
        return (f"regexp_replace(lower({expr}), '{CHRF_WS}',"
                f" '', 'g')")

    return corpus_chrf_chain_sql(f"""
b287 AS (SELECT doc_id, text, {ltoks} AS rt0 FROM documents
         WHERE doc_id < 120),
v287 AS (SELECT doc_id, text, rt0,
                array_to_string(list_transform(
                    list_filter(generate_series(1, len(rt0)),
                                i -> (i - 1) % 3 <> 0),
                    i -> rt0[i]), ' ') AS dropped_s,
                text || ' zzq287x zzq287y' AS extra_s
         FROM b287),
cbase AS (SELECT doc_id,
                 CASE WHEN doc_id < 40 THEN {strip('text')}
                      WHEN doc_id < 80 THEN {strip('dropped_s')}
                      ELSE 'zzzq287azzzq287bzzzq287c' END AS cc
          FROM v287),
crefs AS (SELECT doc_id, 0 AS ri, {strip('text')} AS rc FROM v287
          UNION ALL
          SELECT doc_id, 1, {strip('dropped_s')} FROM v287
          UNION ALL
          SELECT doc_id, 2, {strip('extra_s')} FROM v287)""")


# ---- q288 corpus-level multi-reference TER (pooled edit counts)

def q_corpus_ter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus TER with THREE references per candidate
    (operators/text.py::corpus_ter — VERDICT r11 item 3, completing
    q274 the way q278 completed BLEU): per pair the BEST reference
    (min edits, ties to the shorter) is chosen, then edit counts
    and chosen-reference lengths pool corpus-wide into ONE ratio.
    Planted families make every choice closed-form (the q274
    discipline — the general DP kernel cannot see the planting):
    identity candidates pick the full doc at 0 edits; dropped
    candidates pick the dropped reference at 0 edits; disjoint
    candidates cost max(|ref|, 3) against EVERY reference, so the
    struct-min lands on the shortest (the dropped one) — the oracle
    knows all three from token lengths alone."""
    docs = _load_docs(spark, sf_dir).where(F.col("doc_id") < 120)
    toks = TX.tokens(F.col("text"))
    dropped = F.array_join(
        F.filter(toks, lambda x, i: i % 3 != 0), " ")
    extra = F.concat(F.col("text"), F.lit(" zzq288x zzq288y"))
    cand = (F.when(F.col("doc_id") < 30, F.col("text"))
            .when(F.col("doc_id") < 90, dropped)
            .otherwise(F.lit("zzzq288a zzzq288b zzzq288c")))
    pairs = docs.select(
        "doc_id", cand.alias("candidate"),
        F.array(F.col("text"), dropped, extra).alias("references"))
    return TX.corpus_ter(pairs)


def _oracle_corpus_ter() -> str:
    ltoks = ("list_filter(string_split_regex(trim(text),"
             " '\\s+'), x -> x <> '')")
    return f"""
WITH base AS (SELECT doc_id, len({ltoks}) AS n
              FROM documents WHERE doc_id < 120),
per AS (SELECT doc_id,
    CASE WHEN doc_id < 90 THEN 0
         ELSE greatest(n - (n + 2) // 3, 3) END AS e,
    CASE WHEN doc_id < 30 THEN n
         ELSE n - (n + 2) // 3 END AS rl
    FROM base)
SELECT count(*) AS n_pairs,
       CAST(coalesce(sum(e), 0) AS BIGINT) AS edits,
       CAST(coalesce(sum(rl), 0) AS BIGINT) AS ref_len,
       round(sum(e) / nullif(CAST(sum(rl) AS DOUBLE), 0.0), 6)
           AS ter
FROM per
"""


REGISTRY_PIPELINE.update({
    "q287_corpus_chrf": (q_corpus_chrf, _oracle_corpus_chrf()),
    "q288_corpus_ter": (q_corpus_ter, _oracle_corpus_ter()),
})
