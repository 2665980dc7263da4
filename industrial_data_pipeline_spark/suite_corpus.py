"""Driver-facing suite, part 5: corpus-level analytics for a training-
data pipeline — TF-IDF term weighting, n-gram frequency tables,
near-dup cluster formation (connected components over the MinHash-LSH
pair graph), and a Structured-Streaming batch-parity aggregation.

Tokenization matches operators/text.py::tokens (whitespace split of the
trimmed text) so the DuckDB oracles reproduce token streams exactly;
TF-IDF ranks on the UNROUNDED score (identical double math on both
engines) and rounds only the reported value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from industrial_data_pipeline_spark.operators import text as TX
from industrial_data_pipeline_spark.suite_llm import (
    ORACLE_MINHASH_LSH,
    _MUT_SQL,
    _load_docs,
    _mut_corpus,
    q_minhash_lsh_pairs,
)

_LTOKS = ("list_filter(string_split_regex(trim(lower(text)),"
          " '\\s+'), x -> x <> '')")


# Materialized near-dup pair set, keyed by (session, sf_dir): three
# consumers (q61 clustering, q132 representatives, q137 star
# clustering) build on the SAME deterministic pair graph, and a
# production pipeline materializes it once rather than re-deriving
# shingles+signatures per consumer. q24 itself still measures the
# honest derivation cost — only downstream consumers reuse. The
# checkpointed frame is tiny (id pairs + similarity).
def _pairs_materialized(spark: SparkSession, sf_dir: str) -> DataFrame:
    # lives in suite_common's WEAKLY-session-keyed cache (the same
    # store load() uses): a stopped session's entries — and their
    # checkpoint blocks — die with it, and a key can never be served
    # to a different session (the id()-reuse hazard that cache's
    # docstring warns about)
    from industrial_data_pipeline_spark.suite_common import (
        _session_cache)
    cache = _session_cache(spark)
    key = ("lsh_pairs", sf_dir)
    hit = cache.get(key)
    if hit is None:
        # bound the LIVE-session footprint too: unlike load()'s lazy
        # frames, each entry here pins eager checkpoint blocks, so a
        # session sweeping many sf_dirs (scale probes, bench loops)
        # must not accumulate one block set per dir — evict the
        # oldest entry beyond 4 and free its RDD blocks now rather
        # than at session stop
        stale = [k for k in cache if k[0] == "lsh_pairs"]
        for k in stale[:max(0, len(stale) - 3)]:
            # dropping the last reference lets the ContextCleaner
            # reclaim the checkpoint blocks (localCheckpoint has no
            # explicit release API — GC of the JVM-side RDD is the
            # documented mechanism)
            del cache[k]
        hit = q_minhash_lsh_pairs(spark, sf_dir) \
            .localCheckpoint(eager=True)
        cache[key] = hit
    return hit


# ------------------------------------------------- q59 TF-IDF top terms
# Classic sparse term weighting at corpus scale: explode to a long
# (doc, term) table — one narrow shuffle for tf, a tiny term-keyed agg
# for df (broadcast back), ranking window per doc. No collect anywhere;
# the doc count is the only scalar and comes from a count() action at
# plan-build time (a metadata-cheap scan).

def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _load_docs(spark, sf_dir).select("doc_id", "text")
    n_docs = docs.count()
    toks = docs.select(
        "doc_id",
        F.explode(TX.tokens(F.lower(F.col("text")))).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .withColumn(
            "_tfidf",
            F.col("tf") * F.log((F.lit(n_docs) + F.lit(1.0))
                                / (F.col("df") + F.lit(1.0))))
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("_tfidf"), F.asc("term"))
    return (scored.withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") <= 3)
            .select("doc_id", "term",
                    F.round("_tfidf", 6).alias("tfidf"), "rk"))


ORACLE_TFIDF_TOP_TERMS = f"""
WITH tok AS (SELECT doc_id, unnest({_LTOKS}) AS term FROM documents),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
n AS (SELECT count(*) AS n_docs FROM documents),
s AS (SELECT doc_id, term,
             round(tf * ln((n_docs + 1.0) / (df + 1.0)), 6) AS tfidf,
             row_number() OVER (
                 PARTITION BY doc_id
                 ORDER BY tf * ln((n_docs + 1.0) / (df + 1.0)) DESC,
                          term ASC) AS rk
      FROM tf JOIN dfreq USING (term), n)
SELECT doc_id, term, tfidf, rk FROM s WHERE rk <= 3
"""


# --------------------------------------------------- q60 bigram counts
# Global n-gram frequency table (the language-model-ish statistic):
# overlapping bigrams (NOT distinct — frequencies), one explode + one
# count shuffle, top-50 with a lexicographic tiebreak.

def q_bigram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _load_docs(spark, sf_dir)
    toks = TX.tokens(F.lower(F.col("text")))
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - 2, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, 2)))
    return (docs.select(F.explode(grams).alias("bigram"))
            .groupBy("bigram").agg(F.count("*").alias("n"))
            .orderBy(F.desc("n"), F.asc("bigram"))
            .limit(50))


ORACLE_BIGRAM_COUNTS = f"""
WITH t AS (SELECT {_LTOKS} AS toks FROM documents),
g AS (SELECT unnest(list_transform(
                generate_series(0, greatest(len(toks) - 2, 0)),
                i -> array_to_string(toks[i+1:i+2], ' '))) AS bigram
      FROM t)
SELECT bigram, count(*) AS n FROM g
GROUP BY bigram ORDER BY n DESC, bigram ASC LIMIT 50
"""


# --------------------------------------------- q61 near-dup clustering
# The step after pair finding in every dedup pipeline: fold the
# MinHash-LSH pair graph into clusters (connected components, min-id
# canonical label) so one representative per cluster survives. Oracle =
# recursive CTE reachability over the SAME pair SQL the q24 oracle uses.

def q_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from industrial_data_pipeline_spark.operators.dedup import (
        connected_components)
    pairs = _pairs_materialized(spark, sf_dir)
    return connected_components(pairs, "id_a", "id_b")


ORACLE_DUP_CLUSTERS = f"""
WITH RECURSIVE pairs AS ({ORACLE_MINHASH_LSH}),
edges AS (SELECT id_a AS u, id_b AS v FROM pairs
          UNION SELECT id_b, id_a FROM pairs),
walk AS (
  SELECT u AS node, u AS reach FROM (SELECT DISTINCT u FROM edges)
  UNION
  SELECT w.node, e.v FROM walk w JOIN edges e ON w.reach = e.u
)
SELECT node AS doc_id, min(reach) AS cluster_id
FROM walk GROUP BY node
"""


def q_dup_clusters_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same clustering as q61 through the O(log² n)-round alternating
    large-star/small-star operator (the scale path for deep/chained
    components); identical output contract, same recursive-SQL
    oracle."""
    from industrial_data_pipeline_spark.operators.dedup import (
        connected_components_star)
    pairs = _pairs_materialized(spark, sf_dir)
    return connected_components_star(pairs, "id_a", "id_b")


# ------------------------------------------ q62 streaming batch parity
# An actual Structured Streaming execution (readStream → watermark →
# windowed agg → memory sink, Trigger.AvailableNow) whose result must
# equal the plain batch aggregation — the suite's streaming/batch
# equivalence proof.

def q_stream_hourly_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from industrial_data_pipeline_spark.streaming.queries import (
        hourly_event_counts_stream)
    return hourly_event_counts_stream(spark, sf_dir)


ORACLE_STREAM_HOURLY_COUNTS = """
SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour_start,
       event_type, count(*) AS n
FROM events GROUP BY 1, 2
"""


# ------------------------------- q132 cluster representative selection
# The step AFTER clustering in a real dedup pipeline: per duplicate
# cluster keep exactly one survivor — the longest member (quality
# heuristic), ties to the lowest id. Docs in no pair are their own
# singleton cluster and survive by definition.

def q_cluster_representatives(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    from industrial_data_pipeline_spark.operators.dedup import (
        connected_components)
    pairs = _pairs_materialized(spark, sf_dir)
    clusters = connected_components(pairs, "id_a", "id_b")
    corpus = _mut_corpus(spark, sf_dir).select(
        "doc_id", F.length("text").alias("_len"))
    labeled = (corpus.join(clusters, "doc_id", "left")
               .withColumn("cluster_id",
                           F.coalesce("cluster_id", F.col("doc_id"))))
    # argmax by (length, -id): one partial-aggable max_by per cluster,
    # no window sort
    rep = (labeled.groupBy("cluster_id")
           .agg(F.max_by("doc_id",
                         F.struct(F.col("_len"), -F.col("doc_id")))
                .alias("_rep")))
    return (labeled.join(rep, "cluster_id")
            .select("doc_id", "cluster_id",
                    (F.col("doc_id") == F.col("_rep")).alias("keep")))


ORACLE_CLUSTER_REPRESENTATIVES = f"""
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
corpus AS (SELECT doc_id, length(text) AS len
           FROM ({_MUT_SQL}) _m),
lab AS (SELECT c.doc_id,
               coalesce(cl.cluster_id, c.doc_id) AS cluster_id, c.len
        FROM corpus c LEFT JOIN cl USING (doc_id)),
rep AS (SELECT cluster_id, doc_id AS rep_id FROM
          (SELECT cluster_id, doc_id,
                  row_number() OVER (PARTITION BY cluster_id
                                     ORDER BY len DESC, doc_id) AS rn
           FROM lab)
        WHERE rn = 1)
SELECT lab.doc_id, lab.cluster_id,
       lab.doc_id = rep.rep_id AS keep
FROM lab JOIN rep USING (cluster_id)
"""


# ---------------------------------------- q156 BPE merge-pair counts
# The tokenizer-training statistic: the corpus-wide adjacent
# character-pair frequency table whose argmax is BPE's next merge.

def q_bpe_merge_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return TX.bpe_merge_pairs(_load_docs(spark, sf_dir), k=20)


ORACLE_BPE_MERGE_PAIRS = f"""
WITH tok AS (SELECT unnest({_LTOKS}) AS t FROM documents),
p AS (SELECT unnest(list_transform(
               generate_series(1, length(t) - 1),
               i -> substr(t, i, 2))) AS pair
      FROM tok WHERE length(t) >= 2)
SELECT pair, count(*) AS n FROM p
GROUP BY pair ORDER BY n DESC, pair ASC LIMIT 20
"""


# ------------------------------- q165 sparse TF-IDF similarity join
# The no-embeddings similarity path: inverted-index pair join over
# TF-IDF posting lists, stop-term-pruned (df <= 100) so the join is
# Σ df² over rare terms. Runs on the mutated corpus so the 0.5–0.99
# band contains the planted near-dups, not just exact copies.

def q_tfidf_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return TX.tfidf_cosine_pairs(_mut_corpus(spark, sf_dir),
                                 max_df=100, threshold=0.5)


def _oracle_tfidf_pairs() -> str:
    return f"""
WITH corpus AS ({_MUT_SQL}),
toks AS (SELECT doc_id, unnest({_LTOKS}) AS t FROM corpus),
tf AS (SELECT doc_id, t, count(*) AS tf FROM toks GROUP BY 1, 2),
dfreq AS (SELECT t, count(*) AS df FROM tf GROUP BY t),
n AS (SELECT count(*) AS n_docs FROM corpus),
w AS (SELECT tf.doc_id, tf.t,
             CAST(tf.tf * ln((n.n_docs + 1.0) / (dfreq.df + 1.0))
                  AS DECIMAL(18,6)) AS w
      FROM tf JOIN dfreq USING (t) CROSS JOIN n
      WHERE dfreq.df <= 100),
nrm AS (SELECT doc_id, sqrt(CAST(sum(w*w) AS DOUBLE)) AS nn
        FROM w GROUP BY doc_id),
p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             CAST(sum(a.w * b.w) AS DOUBLE) AS dot
      FROM w a JOIN w b ON a.t = b.t AND a.doc_id < b.doc_id
      GROUP BY 1, 2)
SELECT id_a, id_b, dot / (na.nn * nb.nn) + 0.0 AS cosine_sim
FROM p JOIN nrm na ON p.id_a = na.doc_id
       JOIN nrm nb ON p.id_b = nb.doc_id
WHERE dot / (na.nn * nb.nn) + 0.0 >= 0.5
"""


# --------------------------- q167 hybrid retrieval (RRF fusion)
# The RAG hybrid-search shape: a lexical ranking (TF-IDF cosine) and
# a fuzzy ranking (3-gram Jaccard) fused by Reciprocal Rank Fusion
# score = Σ 1/(60 + rank). Ranks are integers and the fused score is
# a fixed-order two-term double sum — deterministic end to end.

_RRF_K = 60
_RRF_QIDS = [1, 2, 3]


def q_hybrid_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from industrial_data_pipeline_spark.operators.dedup import (
        jaccard,
        word_shingles,
    )
    corpus = _mut_corpus(spark, sf_dir)
    qids = F.col("doc_id").isin(_RRF_QIDS)

    # lexical: query-vs-corpus TF-IDF cosine over pruned postings
    w, norm = TX.tfidf_weights(corpus)
    a = (w.where(F.col("_id").isin(_RRF_QIDS))
         .select(F.col("_id").alias("qid"), "t", F.col("w").alias("_wa")))
    b = w.select(F.col("_id").alias("cid"), "t", F.col("w").alias("_wb"))
    dots = (a.join(b, "t").where(F.col("cid") != F.col("qid"))
            .groupBy("qid", "cid")
            .agg(F.sum(F.col("_wa") * F.col("_wb")).cast("double")
                 .alias("_dot")))
    na = norm.select(F.col("_id").alias("qid"), F.col("_n").alias("_na"))
    nb = norm.select(F.col("_id").alias("cid"), F.col("_n").alias("_nb"))
    lex = (dots.join(F.broadcast(na), "qid").join(nb, "cid")
           .select("qid", "cid",
                   (F.col("_dot") / (F.col("_na") * F.col("_nb")))
                   .alias("_s")))
    wl = Window.partitionBy("qid").orderBy(F.desc("_s"), F.col("cid"))
    lex20 = (lex.withColumn("r", F.row_number().over(wl))
             .where(F.col("r") <= 20).select("qid", "cid", "r"))

    # fuzzy: query-vs-corpus 3-gram Jaccard (3 query shingle sets
    # broadcast against the corpus — never all-pairs)
    sh = corpus.select("doc_id",
                       word_shingles(F.col("text")).alias("sh"))
    q = (sh.where(qids)
         .select(F.col("doc_id").alias("qid"), F.col("sh").alias("qsh")))
    c = sh.select(F.col("doc_id").alias("cid"), F.col("sh").alias("csh"))
    fz = (c.join(F.broadcast(q), F.col("cid") != F.col("qid"))
          .select("qid", "cid",
                  jaccard(F.col("qsh"), F.col("csh")).alias("_s")))
    fz20 = (fz.withColumn("r", F.row_number().over(wl))
            .where(F.col("r") <= 20).select("qid", "cid", "r"))

    # RRF fusion: fixed-order two-term sum, full outer on candidates
    l = lex20.withColumnsRenamed({"r": "rl"})
    f = fz20.withColumnsRenamed({"r": "rf"})
    u = (l.join(f, ["qid", "cid"], "full")
         .select("qid", "cid",
                 (F.coalesce(1.0 / (F.lit(_RRF_K) + F.col("rl")),
                             F.lit(0.0))
                  + F.coalesce(1.0 / (F.lit(_RRF_K) + F.col("rf")),
                               F.lit(0.0))).alias("_score"),
                 F.col("rl").isNotNull().alias("in_lexical"),
                 F.col("rf").isNotNull().alias("in_fuzzy")))
    wr = Window.partitionBy("qid").orderBy(F.desc("_score"),
                                          F.col("cid"))
    return (u.withColumn("rrf_rank", F.row_number().over(wr))
            .where(F.col("rrf_rank") <= 10)
            .select(F.col("qid").alias("query_id"),
                    F.col("cid").alias("cand_id"), "rrf_rank",
                    (F.col("_score") + F.lit(0.0)).alias("rrf_score"),
                    "in_lexical", "in_fuzzy"))


def _oracle_hybrid_retrieval() -> str:
    from industrial_data_pipeline_spark.suite_llm import (
        _GRAMS,
        _MUT_SQL,
        _TOKS,
    )
    ids = ", ".join(map(str, _RRF_QIDS))
    return f"""
WITH corpus AS ({_MUT_SQL}),
tok AS (SELECT doc_id,
               unnest(string_split_regex(trim(lower(text)), '\\s+'))
                   AS t
        FROM corpus),
tf AS (SELECT doc_id, t, count(*) AS tf FROM tok GROUP BY 1, 2),
dfreq AS (SELECT t, count(*) AS df FROM tf GROUP BY t),
n AS (SELECT count(*) AS n_docs FROM corpus),
w AS (SELECT tf.doc_id, tf.t,
             CAST(tf.tf * ln((n.n_docs + 1.0) / (dfreq.df + 1.0))
                  AS DECIMAL(18,6)) AS w
      FROM tf JOIN dfreq USING (t) CROSS JOIN n
      WHERE dfreq.df <= 100),
nrm AS (SELECT doc_id, sqrt(CAST(sum(w*w) AS DOUBLE)) AS nn
        FROM w GROUP BY doc_id),
lx AS (SELECT a.doc_id AS qid, b.doc_id AS cid,
              CAST(sum(a.w * b.w) AS DOUBLE) AS dot
       FROM w a JOIN w b ON a.t = b.t
       WHERE a.doc_id IN ({ids}) AND b.doc_id != a.doc_id
       GROUP BY 1, 2),
lxs AS (SELECT qid, cid, dot / (na.nn * nb.nn) AS s
        FROM lx JOIN nrm na ON lx.qid = na.doc_id
                JOIN nrm nb ON lx.cid = nb.doc_id),
lx20 AS (SELECT qid, cid, r FROM
           (SELECT qid, cid, row_number() OVER (
                PARTITION BY qid ORDER BY s DESC, cid) AS r
            FROM lxs) WHERE r <= 20),
tk AS (SELECT doc_id, {_TOKS} AS toks FROM corpus),
sh AS (SELECT doc_id, list_distinct({_GRAMS}) AS sh FROM tk),
fz AS (SELECT q.doc_id AS qid, c.doc_id AS cid,
              len(list_intersect(q.sh, c.sh))::DOUBLE
              / (len(q.sh) + len(c.sh)
                 - len(list_intersect(q.sh, c.sh))) AS s
       FROM sh q JOIN sh c ON c.doc_id != q.doc_id
       WHERE q.doc_id IN ({ids})),
fz20 AS (SELECT qid, cid, r FROM
           (SELECT qid, cid, row_number() OVER (
                PARTITION BY qid ORDER BY s DESC, cid) AS r
            FROM fz) WHERE r <= 20),
u AS (SELECT coalesce(l.qid, f.qid) AS qid,
             coalesce(l.cid, f.cid) AS cid,
             coalesce(CAST(1 AS DOUBLE) / ({_RRF_K} + l.r), 0.0)
               + coalesce(CAST(1 AS DOUBLE) / ({_RRF_K} + f.r), 0.0)
                 AS score,
             l.r IS NOT NULL AS in_lexical,
             f.r IS NOT NULL AS in_fuzzy
      FROM lx20 l FULL JOIN fz20 f
        ON l.qid = f.qid AND l.cid = f.cid)
SELECT qid AS query_id, cid AS cand_id,
       row_number() OVER (PARTITION BY qid
                          ORDER BY score DESC, cid) AS rrf_rank,
       score + 0.0 AS rrf_score, in_lexical, in_fuzzy
FROM u QUALIFY rrf_rank <= 10
"""


REGISTRY_CORPUS: dict[str, tuple] = {
    "q59_tfidf_top_terms": (q_tfidf_top_terms, ORACLE_TFIDF_TOP_TERMS),
    "q60_bigram_counts": (q_bigram_counts, ORACLE_BIGRAM_COUNTS),
    "q61_dup_clusters": (q_dup_clusters, ORACLE_DUP_CLUSTERS),
    "q137_dup_clusters_star": (q_dup_clusters_star, ORACLE_DUP_CLUSTERS),
    "q132_cluster_representatives": (q_cluster_representatives,
                                     ORACLE_CLUSTER_REPRESENTATIVES),
    "q62_stream_hourly_counts": (q_stream_hourly_counts,
                                 ORACLE_STREAM_HOURLY_COUNTS),
    "q156_bpe_merge_pairs": (q_bpe_merge_pairs, ORACLE_BPE_MERGE_PAIRS),
    "q165_tfidf_pairs": (q_tfidf_pairs, _oracle_tfidf_pairs()),
    "q167_hybrid_retrieval": (q_hybrid_retrieval,
                              _oracle_hybrid_retrieval()),
}


# ----------------------------- q177 cross-source duplication matrix

def q_source_dup_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Provenance analytics over the near-dup pair graph: which
    SOURCES duplicate each other — the matrix behind "crawl X is 30%
    mirrors of crawl Y" decisions. Reuses the session-materialized
    LSH pair set; each endpoint maps to its origin document's source
    (mutated ids inherit id % 100000's source); unordered source
    pairs canonicalize via least/greatest. One broadcast dim join +
    one count shuffle on ~25 keys."""
    from industrial_data_pipeline_spark.suite_common import load
    pairs = _pairs_materialized(spark, sf_dir)
    src = (load(spark, sf_dir, "documents")
           .select(F.col("doc_id").alias("_k"), "source"))
    a = src.select(F.col("_k").alias("_ka"),
                   F.col("source").alias("_sa"))
    b = src.select(F.col("_k").alias("_kb"),
                   F.col("source").alias("_sb"))
    j = (pairs
         .withColumn("_ka", F.col("id_a") % 100000)
         .withColumn("_kb", F.col("id_b") % 100000)
         .join(F.broadcast(a), "_ka").join(F.broadcast(b), "_kb"))
    return (j.groupBy(F.least("_sa", "_sb").alias("source_a"),
                      F.greatest("_sa", "_sb").alias("source_b"))
            .agg(F.count("*").alias("n_pairs")))


def _oracle_source_dup_matrix() -> str:
    return f"""
WITH pairs AS ({ORACLE_MINHASH_LSH})
SELECT least(da.source, db.source) AS source_a,
       greatest(da.source, db.source) AS source_b,
       count(*) AS n_pairs
FROM pairs p
JOIN documents da ON p.id_a % 100000 = da.doc_id
JOIN documents db ON p.id_b % 100000 = db.doc_id
GROUP BY 1, 2
"""


REGISTRY_CORPUS.update({
    "q177_source_dup_matrix": (q_source_dup_matrix,
                               _oracle_source_dup_matrix()),
})


# ----------------------- q195 retrieval MRR against planted truth

def q_retrieval_mrr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-quality evaluation of the q167 hybrid retriever
    against KNOWN ground truth: each query doc's planted mutated twin
    (id + 100000) is the relevant item, so reciprocal rank and hit@k
    are facts, not judgments — the eval-harness row every retriever
    ships with (q169 does this for the ANN index; this closes the
    loop for hybrid text retrieval). Exact integers and 1/rank
    ratios."""
    # <=30 rows; eager checkpoint so the expensive retrieval subtree
    # runs ONCE instead of relying on ReuseExchange to dedupe the two
    # references below (the simhash_pairs precedent)
    fused = q_hybrid_retrieval(spark, sf_dir) \
        .localCheckpoint(eager=True)
    truth = F.col("query_id") + F.lit(100000)
    hit = fused.where(F.col("cand_id") == truth)
    found = (hit.select("query_id",
                        F.col("rrf_rank").alias("rank_of_truth")))
    qs = fused.select("query_id").distinct()
    out = (qs.join(found, "query_id", "left")
           .select("query_id", "rank_of_truth",
                   (F.when(F.col("rank_of_truth").isNotNull(),
                           1.0 / F.col("rank_of_truth"))
                    .otherwise(F.lit(0.0)) + F.lit(0.0))
                   .alias("reciprocal_rank"),
                   F.coalesce(F.col("rank_of_truth") <= 1,
                              F.lit(False)).alias("hit_at_1"),
                   F.coalesce(F.col("rank_of_truth") <= 5,
                              F.lit(False)).alias("hit_at_5")))
    return out


def _oracle_retrieval_mrr() -> str:
    inner = _oracle_hybrid_retrieval().strip()
    return f"""
WITH fused AS ({inner}),
truthed AS (SELECT query_id, rrf_rank AS rank_of_truth
            FROM fused WHERE cand_id = query_id + 100000),
qs AS (SELECT DISTINCT query_id FROM fused)
SELECT qs.query_id, t.rank_of_truth,
       coalesce(CAST(1 AS DOUBLE) / t.rank_of_truth, 0.0) + 0.0
           AS reciprocal_rank,
       coalesce(t.rank_of_truth <= 1, FALSE) AS hit_at_1,
       coalesce(t.rank_of_truth <= 5, FALSE) AS hit_at_5
FROM qs LEFT JOIN truthed t USING (query_id)
"""


REGISTRY_CORPUS.update({
    "q195_retrieval_mrr": (q_retrieval_mrr, _oracle_retrieval_mrr()),
})


# ----------------------------- q202 boilerplate n-gram suppression

BOILER_N = 5          # shingle width
BOILER_DF = 20        # doc-frequency threshold → boilerplate


def _word_shingle_expr(n: int) -> str:
    """Guarded JVM-side n-word shingle expression over `text` —
    shared by q202 and q227 so the short-doc guard lives ONCE.
    Docs shorter than one shingle get an EMPTY array (and drop out
    of every downstream table, matching the oracle's empty range):
    an unguarded sequence(1, size-(n-1)) turns DESCENDING for short
    docs — Spark's default step is -1 when stop < start — and
    slice(..., 0, n) then throws INVALID_PARAMETER_VALUE."""
    return (f"CASE WHEN size(split(trim(text), '\\\\s+')) >= {n}"
            f" THEN transform(sequence(1, size(split(trim(text),"
            f" '\\\\s+')) - {n - 1}),"
            f" i -> concat_ws(' ', slice(split(trim(text),"
            f" '\\\\s+'), i, {n})))"
            f" ELSE array() END")


def _oracle_shingle_cte(n: int) -> str:
    """The DuckDB mirror of :func:`_word_shingle_expr`: CTEs `toks`
    (token list per doc) and `g` ((doc_id, gram) long table; empty
    range for short docs)."""
    return f"""toks AS (SELECT doc_id, string_split_regex(trim(text), '\\s+')
                     AS tk
              FROM documents),
g AS (SELECT doc_id,
             unnest([array_to_string(tk[i:i + {n - 1}], ' ')
                     FOR i IN range(1, greatest(len(tk)
                                                - {n - 2}, 1))])
                 AS gram
      FROM toks)"""


def q_boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4/RefinedWeb-style boilerplate suppression, phrase-level: a
    5-gram that appears in ≥ BOILER_DF distinct documents is
    boilerplate (nav bars, cookie banners, licence footers at web
    scale); per document report total 5-gram positions, how many hit
    a boilerplate phrase, and the distinct boilerplate phrases — the
    cleaning report a corpus curation run emits before stripping.
    Scale shape: shingles explode JVM-side (transform over the token
    array, no Python), doc-frequency is one distinct+groupBy on the
    gram hash, the hit-join shuffles on the gram string only for
    grams that cleared the threshold (semi-join reduction)."""
    docs = _load_docs(spark, sf_dir).select("doc_id", "text")
    g = docs.select(
        "doc_id",
        F.explode(F.expr(_word_shingle_expr(BOILER_N))).alias("gram"))
    boiler = (g.select("doc_id", "gram").distinct()
              .groupBy("gram").agg(F.count("*").alias("df"))
              .where(F.col("df") >= BOILER_DF)
              .select("gram"))
    hits = (g.join(boiler.hint("broadcast"), "gram")
            .groupBy("doc_id")
            .agg(F.count("*").alias("boiler_positions"),
                 F.countDistinct("gram").alias("boiler_phrases")))
    totals = g.groupBy("doc_id").agg(F.count("*").alias("n_grams"))
    return (totals.join(hits, "doc_id", "left")
            .select("doc_id", "n_grams",
                    F.coalesce("boiler_positions", F.lit(0))
                    .alias("boiler_positions"),
                    F.coalesce("boiler_phrases", F.lit(0))
                    .alias("boiler_phrases")))


_ORACLE_BOILER = f"""
WITH {_oracle_shingle_cte(BOILER_N)},
b AS (SELECT gram FROM (SELECT DISTINCT doc_id, gram FROM g)
      GROUP BY gram HAVING count(*) >= {BOILER_DF}),
h AS (SELECT doc_id, count(*) AS boiler_positions,
             count(DISTINCT gram) AS boiler_phrases
      FROM g JOIN b USING (gram) GROUP BY doc_id),
t AS (SELECT doc_id, count(*) AS n_grams FROM g GROUP BY doc_id)
SELECT t.doc_id, t.n_grams,
       CAST(coalesce(h.boiler_positions, 0) AS BIGINT)
           AS boiler_positions,
       CAST(coalesce(h.boiler_phrases, 0) AS BIGINT)
           AS boiler_phrases
FROM t LEFT JOIN h USING (doc_id)
"""

REGISTRY_CORPUS.update({
    "q202_boilerplate_ngrams": (q_boilerplate_ngrams, _ORACLE_BOILER),
})


# -------------------- q227 exact set-similarity join (prefix filter)

SETSIM_N = 5          # shingle width (shared shape with q202)
SETSIM_T_MILLIS = 500  # Jaccard threshold, integer millis


def q_set_similarity_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT near-dup pairs by Jaccard >= 0.5 over 5-word shingle
    SETS, via the AllPairs prefix filter
    (operators/dedup.set_similarity_join) — exact like q25's all-pairs
    baseline but with no O(n²) stage: rarest-first prefixes equi-join
    on the shingle, then exact verification of the survivors only.
    Pure integer output (intersection/union sizes); the oracle is the
    naive quadratic join as the semantics spec."""
    from industrial_data_pipeline_spark.operators.dedup import (
        set_similarity_join)
    docs = _load_docs(spark, sf_dir).select("doc_id", "text")
    sh = docs.select(
        "doc_id",
        F.explode(F.expr(_word_shingle_expr(SETSIM_N))).alias("item"))
    return set_similarity_join(sh, id_col="doc_id", item_col="item",
                               t_millis=SETSIM_T_MILLIS)


_ORACLE_SETSIM = f"""
WITH {_oracle_shingle_cte(SETSIM_N)},
sh AS (SELECT DISTINCT doc_id, gram AS s FROM g),
sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                 count(*) AS i
          FROM sh a JOIN sh b
               ON a.s = b.s AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
SELECT id_a, id_b,
       CAST(i AS BIGINT) AS n_inter,
       CAST(sa.n + sb.n - i AS BIGINT) AS n_union
FROM inter
JOIN sz sa ON sa.doc_id = id_a
JOIN sz sb ON sb.doc_id = id_b
WHERE i * 1000 >= {SETSIM_T_MILLIS} * (sa.n + sb.n - i)
"""

REGISTRY_CORPUS.update({
    "q227_set_similarity_join": (q_set_similarity_join, _ORACLE_SETSIM),
})


# --------------- q231 cross-doc duplicate spans (exact substring dedup)

DUPSPAN_N = 8  # token n-gram width: a hit = an 8-token run seen elsewhere


def _pos_shingle_expr(n: int) -> str:
    """Positional variant of :func:`_word_shingle_expr`: array of
    struct(pos, gh) with 1-based token positions (same short-doc
    empty-array guard). ``gh`` is xxhash64 of the gram STRING,
    computed JVM-side inside the transform — the ~60-char gram never
    leaves the project, so the explode/distinct/semi-join downstream
    shuffle 16 bytes/row instead of the string (the dominant byte
    volume of the posting scan at XL). Collision risk is the
    standard 64-bit birthday bound (~n²/2⁶⁵: < 1e-9 even at 10⁸
    distinct grams per corpus) and can only ADD a false shared span
    to the report, never drop a true one — acceptable for a
    dup-span report. NOTE: q239's excision consumes the same
    substrate, where a false shared span DELETES unique text; see
    q_dup_span_excise's docstring for the accepted-loss bound."""
    tk = "split(trim(text), '\\\\s+')"
    return (f"CASE WHEN size({tk}) >= {n}"
            f" THEN transform(sequence(1, size({tk}) - {n - 1}),"
            f" i -> struct(i AS pos,"
            f" xxhash64(concat_ws(' ', slice({tk}, i, {n}))) AS gh))"
            f" ELSE array() END")


def _dup_spans_frames(spark: SparkSession,
                      sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """Shared substrate of q231 (report) and q239 (excision):
    returns (base(doc_id, total_tokens, _pg), spans(doc_id, isl, s,
    e)) with ``[s, e]`` the 1-based inclusive token range of each
    maximal duplicated span."""
    n = DUPSPAN_N
    docs = _load_docs(spark, sf_dir).select("doc_id", "text")
    base = docs.select(
        "doc_id",
        F.expr("size(split(trim(text), '\\\\s+'))")
        .cast("bigint").alias("total_tokens"),
        F.expr(_pos_shingle_expr(n)).alias("_pg"))
    pg = (base.select("doc_id", F.explode("_pg").alias("s"))
          .select("doc_id", F.col("s.pos").alias("pos"),
                  F.col("s.gh").alias("gh")))
    shared = (pg.select("gh", "doc_id").distinct()
              .groupBy("gh").agg(F.count("*").alias("df"))
              .where(F.col("df") >= 2).select("gh"))
    hits = pg.join(shared, "gh", "left_semi")
    from pyspark.sql import Window
    w = Window.partitionBy("doc_id").orderBy("pos")
    isl = (hits
           .withColumn("brk", (F.col("pos")
                               - F.coalesce(F.lag("pos").over(w),
                                            F.lit(-n)) > n)
                  .cast("int"))
           .withColumn("isl", F.sum("brk").over(
               w.rowsBetween(Window.unboundedPreceding, 0))))
    spans = (isl.groupBy("doc_id", "isl")
             .agg(F.min("pos").alias("s"),
                  (F.max("pos") + F.lit(DUPSPAN_N - 1)).alias("e")))
    return base, spans


def q_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cross-document duplicate-SPAN report — the token-level
    substring-dedup signal (Lee et al., 'Deduplicating Training Data
    Makes Language Models Better'): any {DUPSPAN_N}-token run that
    also appears in ANOTHER document marks its positions duplicated;
    overlapping/adjacent hits merge into maximal spans
    (gaps-and-islands: with fixed n and ascending positions, a new
    island starts iff pos > prev_pos + n). Emits per doc the span
    count, duplicated-token total and duplicated fraction — the
    numbers a span-excision pass or a dup-aware loss weighting
    (q212) consumes at token granularity rather than q150's chunk
    granularity.

    Scale shape: positional shingles explode JVM-side AS 64-bit
    xxhash64 keys (the gram string never leaves the project — see
    :func:`_pos_shingle_expr` for the shuffle-byte and collision
    analysis); the shared-gram set is one distinct+groupBy
    (map-side combinable) and the hit filter a semi-join on the
    8-byte hash; island merging is one lag window PARTITIONED BY
    doc (state bounded by doc length). Nothing global, nothing
    quadratic."""
    base, spans = _dup_spans_frames(spark, sf_dir)
    per_doc = (spans.groupBy("doc_id")
               .agg(F.count("*").alias("n_spans"),
                    F.sum(F.col("e") - F.col("s") + 1)
                    .alias("dup_tokens")))
    return (base.select("doc_id", "total_tokens")
            .join(per_doc, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("n_spans", F.lit(0)).alias("n_spans"),
                    F.coalesce("dup_tokens", F.lit(0))
                    .alias("dup_tokens"),
                    "total_tokens",
                    (F.coalesce("dup_tokens", F.lit(0))
                     / F.col("total_tokens")).alias("dup_fraction")))


def _oracle_dup_spans() -> str:
    n = DUPSPAN_N
    return f"""
WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS tk
              FROM documents),
p AS (SELECT doc_id,
             unnest(range(1, greatest(len(tk) - {n - 2}, 1))) AS pos,
             unnest([array_to_string(tk[i:i + {n - 1}], ' ')
                     FOR i IN range(1, greatest(len(tk)
                                                - {n - 2}, 1))]) AS gram
      FROM toks),
shared AS (SELECT gram FROM (SELECT DISTINCT gram, doc_id FROM p)
           GROUP BY gram HAVING count(*) >= 2),
h AS (SELECT doc_id, pos FROM p JOIN shared USING (gram)),
flags AS (SELECT doc_id, pos,
                 CASE WHEN pos - coalesce(lag(pos) OVER
                      (PARTITION BY doc_id ORDER BY pos), -{n}) > {n}
                      THEN 1 ELSE 0 END AS brk
          FROM h),
isl AS (SELECT doc_id, pos,
               sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
                              ROWS UNBOUNDED PRECEDING) AS isl_id
        FROM flags),
spans AS (SELECT doc_id, isl_id, min(pos) AS s,
                 max(pos) + {n - 1} AS e
          FROM isl GROUP BY 1, 2),
per_doc AS (SELECT doc_id, count(*) AS n_spans,
                   CAST(sum(e - s + 1) AS BIGINT) AS dup_tokens
            FROM spans GROUP BY 1)
SELECT t.doc_id,
       CAST(coalesce(d.n_spans, 0) AS BIGINT) AS n_spans,
       CAST(coalesce(d.dup_tokens, 0) AS BIGINT) AS dup_tokens,
       CAST(len(t.tk) AS BIGINT) AS total_tokens,
       CAST(coalesce(d.dup_tokens, 0) AS BIGINT)
           / CAST(len(t.tk) AS BIGINT) AS dup_fraction
FROM toks t LEFT JOIN per_doc d USING (doc_id)
"""


REGISTRY_CORPUS.update({
    "q231_dup_spans": (q_dup_spans, _oracle_dup_spans()),
})


# --------------- q239 duplicate-span EXCISION (apply the q231 report)

def q_dup_span_excise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """APPLY the q231 duplicate-span report: drop every token inside
    a maximal duplicated span and rebuild the document — the actual
    excision step of Lee et al.'s substring dedup (q231 measures,
    q239 cuts; q212's loss-weights are the keep-everything
    alternative). Emits per doc the kept/removed token counts and
    the md5 of the REBUILT text, so the surgery itself — not just
    its arithmetic — is hash-checked against the oracle.

    Collision disposition: the substrate keys grams by xxhash64
    (_pos_shingle_expr). For q231's REPORT a collision can only ADD
    a false shared span; HERE the same false positive would EXCISE
    unique text — accepted data loss, bounded by the 64-bit birthday
    rate (< 1e-9 expected false grams even at 10⁸ distinct grams;
    each costs ≤ one span of ~2n tokens from one document). A
    pipeline that cannot accept that bound should verify candidate
    spans against raw grams before cutting (one extra semi-join on
    the span rows only).

    Scale shape: the span table rides the q231 substrate (hashed
    postings, doc-partitioned island window); the excision is one
    anti-join of positional tokens against the doc's spans (equi on
    doc_id, range residual — spans per doc are few) and the rebuild
    one doc-partitioned sort-aggregate. Nothing global; cost is
    O(|tokens|) plus the report itself."""
    _base, spans = _dup_spans_frames(spark, sf_dir)
    docs = _load_docs(spark, sf_dir).select("doc_id", "text")
    return _excise_tokens(docs, spans)


def _excise_tokens(docs: DataFrame, spans: DataFrame) -> DataFrame:
    """The excision MARGINAL, shared by q239 (spans built in-plan)
    and q244 (spans read from the persisted q231 asset): positional
    tokens anti-join the span ranges, one doc-partitioned rebuild.
    Cost is O(|tokens| of the excised docs + |spans|) — it never
    touches the posting substrate that FOUND the spans."""
    toks = docs.select(
        "doc_id",
        F.posexplode(F.expr("split(trim(text), '\\\\s+')"))
        .alias("pos0", "tok")).select(
        "doc_id", (F.col("pos0") + 1).alias("pos"), "tok")
    # spans may share lineage with toks (both derive from the docs
    # scan), so rename its columns before the anti-join — the bare
    # `toks.doc_id == spans.doc_id` form makes Spark warn about (and
    # potentially resolve) a trivially-true self-comparison
    sp = spans.select(F.col("doc_id").alias("_sdoc"),
                      F.col("s").alias("_s"), F.col("e").alias("_e"))
    kept = toks.join(
        sp,
        (F.col("doc_id") == F.col("_sdoc"))
        & (F.col("pos") >= F.col("_s")) & (F.col("pos") <= F.col("_e")),
        "left_anti")
    rebuilt = (kept.groupBy("doc_id")
               .agg(F.count("*").alias("kept_tokens"),
                    F.array_join(
                        F.transform(
                            F.array_sort(F.collect_list(
                                F.struct("pos", "tok"))),
                            lambda x: x.tok), " ").alias("_txt")))
    # total_tokens recomputed from docs with the substrate's exact
    # expression (identical to _dup_spans_frames' base column) so the
    # stored-span path needs no base frame
    return (docs.select(
        "doc_id",
        F.expr("size(split(trim(text), '\\\\s+'))")
        .cast("bigint").alias("total_tokens"))
        .join(rebuilt, "doc_id", "left")
        .select("doc_id", "total_tokens",
                F.coalesce("kept_tokens", F.lit(0))
                .alias("kept_tokens"),
                (F.col("total_tokens")
                 - F.coalesce("kept_tokens", F.lit(0)))
                .alias("removed_tokens"),
                F.md5(F.coalesce("_txt", F.lit("")))
                .alias("clean_md5")))


def _oracle_dup_span_excise() -> str:
    n = DUPSPAN_N
    return f"""
WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS tk
              FROM documents),
p AS (SELECT doc_id,
             unnest(range(1, greatest(len(tk) - {n - 2}, 1))) AS pos,
             unnest([array_to_string(tk[i:i + {n - 1}], ' ')
                     FOR i IN range(1, greatest(len(tk)
                                                - {n - 2}, 1))]) AS gram
      FROM toks),
shared AS (SELECT gram FROM (SELECT DISTINCT gram, doc_id FROM p)
           GROUP BY gram HAVING count(*) >= 2),
h AS (SELECT doc_id, pos FROM p JOIN shared USING (gram)),
flags AS (SELECT doc_id, pos,
                 CASE WHEN pos - coalesce(lag(pos) OVER
                      (PARTITION BY doc_id ORDER BY pos), -{n}) > {n}
                      THEN 1 ELSE 0 END AS brk
          FROM h),
isl AS (SELECT doc_id, pos,
               sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
                              ROWS UNBOUNDED PRECEDING) AS isl_id
        FROM flags),
spans AS (SELECT doc_id, isl_id, min(pos) AS s,
                 max(pos) + {n - 1} AS e
          FROM isl GROUP BY 1, 2),
pt AS (SELECT doc_id, unnest(range(1, len(tk) + 1)) AS pos,
              unnest(tk) AS tok
       FROM toks),
keep AS (SELECT * FROM pt
         WHERE NOT EXISTS (SELECT 1 FROM spans sp
                           WHERE sp.doc_id = pt.doc_id
                             AND pt.pos >= sp.s AND pt.pos <= sp.e)),
reb AS (SELECT doc_id, count(*) AS kept_tokens,
               string_agg(tok, ' ' ORDER BY pos) AS txt
        FROM keep GROUP BY 1)
SELECT t.doc_id,
       CAST(len(t.tk) AS BIGINT) AS total_tokens,
       CAST(coalesce(r.kept_tokens, 0) AS BIGINT) AS kept_tokens,
       CAST(len(t.tk) - coalesce(r.kept_tokens, 0) AS BIGINT)
           AS removed_tokens,
       md5(coalesce(r.txt, '')) AS clean_md5
FROM toks t LEFT JOIN reb r USING (doc_id)
"""


REGISTRY_CORPUS.update({
    "q239_dup_span_excise": (q_dup_span_excise,
                             _oracle_dup_span_excise()),
})


# ------------- q241 incremental cluster maintenance (gate -> clusters)

def q_incremental_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maintain the q61 duplicate clusters as an ingest batch lands,
    WITHOUT re-clustering the historical pair graph: delta edges come
    from the q236 admission gate (20 new mutants of docs 10-29 probed
    against the mutated corpus), and incremental_connected_components
    folds them into the existing labels via the label-star reduction
    (operators/dedup.py) — |labels| + |delta| edges per round instead
    of the full pair graph, rounds bounded by the delta's bridging
    depth. The oracle recomputes components over base ∪ delta pairs
    from scratch — equality IS the incremental-correctness proof."""
    from industrial_data_pipeline_spark.operators.dedup import (
        connected_components, incremental_minhash_lsh)
    from industrial_data_pipeline_spark.suite_llm import (
        _BANDS, _NUM_PERM, _THRESH)
    base_labels = connected_components(
        _pairs_materialized(spark, sf_dir), "id_a", "id_b")
    corpus = _mut_corpus(spark, sf_dir)
    docs = _load_docs(spark, sf_dir).select("doc_id", "text")
    new = (docs.where((F.col("doc_id") >= 10) & (F.col("doc_id") < 30))
           .select((F.col("doc_id") + 310000).alias("doc_id"),
                   F.concat("text", F.lit(" qq ww")).alias("text")))
    delta = incremental_minhash_lsh(
        corpus, new, "doc_id",
        num_perm=_NUM_PERM, bands=_BANDS, threshold=_THRESH)
    from industrial_data_pipeline_spark.operators.dedup import (
        incremental_connected_components)
    return incremental_connected_components(
        base_labels,
        delta.select(F.col("new_id").alias("id_a"),
                     F.col("old_id").alias("id_b")))


def _oracle_incremental_clusters() -> str:
    from industrial_data_pipeline_spark.suite_llm import _gate_ctes
    nb = ("SELECT doc_id + 310000 AS doc_id, text || ' qq ww' AS text "
          "FROM documents WHERE doc_id >= 10 AND doc_id < 30")
    return f"""
WITH RECURSIVE
bp AS (SELECT id_a, id_b FROM ({ORACLE_MINHASH_LSH})),
dp AS (SELECT new_id AS id_a, old_id AS id_b FROM (
    WITH mutc AS ({_MUT_SQL}),
    nb AS ({nb}),
    {_gate_ctes('d', 'mutc', 'nb').lstrip()}
    SELECT new_id, old_id FROM dver)),
pairs AS (SELECT * FROM bp UNION ALL SELECT * FROM dp),
edges AS (SELECT id_a AS u, id_b AS v FROM pairs
          UNION SELECT id_b, id_a FROM pairs),
walk AS (
  SELECT u AS node, u AS reach FROM (SELECT DISTINCT u FROM edges)
  UNION
  SELECT w.node, e.v FROM walk w JOIN edges e ON w.reach = e.u
)
SELECT node AS doc_id, min(reach) AS cluster_id
FROM walk GROUP BY node
"""


REGISTRY_CORPUS.update({
    "q241_incremental_clusters": (q_incremental_clusters,
                                  _oracle_incremental_clusters()),
})


# ------- q244 span excision from the PERSISTED q231 span table (store asset)

def q_dup_span_excise_stored(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """The PRODUCTION shape of substring-dedup excision: the q231
    span table is computed ONCE and persisted as a parquet asset
    (the write-once indexed artifact SCALE_NOTES describes); the
    registered excision then READS the stored spans and applies only
    the token anti-join + per-doc rebuild (_excise_tokens) — it
    never re-runs the posting substrate. SAME ORACLE as q239:
    byte-equality proves excising from the stored asset equals
    excising from the in-plan spans.

    Scale shape: marginal cost is O(Σ|tokens| of excised docs +
    |spans|); the corpus-sized posting scan is paid once at asset
    build and amortized across every downstream excision/rerun
    (measured: tools/span_excise_probe.py)."""
    import shutil
    import tempfile

    _base, spans = _dup_spans_frames(spark, sf_dir)
    docs = _load_docs(spark, sf_dir).select("doc_id", "text")
    root = tempfile.mkdtemp(prefix="idp_q244_")
    try:
        # the write-once asset build (amortized, corpus-sized)
        spans.write.mode("overwrite").parquet(root + "/spans")
        stored = spark.read.parquet(root + "/spans")
        # the registered shape: excision marginal over stored spans
        out = _excise_tokens(docs, stored).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


REGISTRY_CORPUS.update({
    # oracle intentionally shared with q239: stored-span excision
    # must be indistinguishable from the in-plan form
    "q244_dup_span_excise_stored": (q_dup_span_excise_stored,
                                    _oracle_dup_span_excise()),
})
