"""Vector-analytics suite (q81–q84): distributed k-means, int8
quantization error, per-label cohesion, top-1 neighbor confusion —
the embedding-column operations a training-data pipeline runs beside
dedup/ANN (suite_llm q23–q31).

Every query here is oracle-checked: the k-means assignment runs in
scaled integers so the DuckDB replay is bit-identical, centroid/err
averages use the exact-DECIMAL-sum-then-one-double-division
discipline, and cosines follow the q28 sequential-double-fold
pattern. See operators/vectors.py for the determinism argument.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from industrial_data_pipeline_spark.operators import vectors as V
from industrial_data_pipeline_spark.suite_common import load


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "embeddings")


# --------------------------------------------------- q81 Lloyd k-means

def q_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k=4, 2 Lloyd iterations, init = 4 lowest vec_ids. Output:
    (cluster, n_points, inertia)."""
    return V.kmeans_lloyd(_emb(spark, sf_dir), k=4, iters=2)


_QV = "list_transform({c}, x -> CAST(floor(x*1000000 + 0.5) AS BIGINT))"
_D2 = ("list_aggregate(list_transform(list_zip(qv, cq), "
       "p -> (p[1]-p[2])*(p[1]-p[2])), 'sum')")

ORACLE_KMEANS = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT vec_id, v, {_QV.format(c='v')} AS qv FROM e),
c1 AS (SELECT CAST(vec_id AS BIGINT) AS cluster, qv AS cq
       FROM q WHERE vec_id < 4),
a1 AS (SELECT vec_id, cluster,
              row_number() OVER (PARTITION BY vec_id
                                 ORDER BY d2, cluster) AS rn
       FROM (SELECT q.vec_id, c1.cluster, {_D2} AS d2
             FROM q CROSS JOIN c1)),
m1 AS (SELECT cluster, ord,
              CAST(sum(CAST(val AS DECIMAL(28,12))) AS DOUBLE)
              / count(*) AS mean
       FROM (SELECT a1.cluster, unnest(q.v) AS val,
                    generate_subscripts(q.v, 1) AS ord
             FROM a1 JOIN q USING (vec_id) WHERE rn = 1)
       GROUP BY cluster, ord),
c2 AS (SELECT cluster, {_QV.format(c='list(mean ORDER BY ord)')} AS cq
       FROM m1 GROUP BY cluster),
a2 AS (SELECT vec_id, cluster, d2,
              row_number() OVER (PARTITION BY vec_id
                                 ORDER BY d2, cluster) AS rn
       FROM (SELECT q.vec_id, c2.cluster, {_D2} AS d2
             FROM q CROSS JOIN c2))
SELECT cluster, count(*) AS n_points,
       round(CAST(sum(d2) AS DOUBLE) / 1000000000000.0, 6) AS inertia
FROM a2 WHERE rn = 1 GROUP BY cluster
"""


# ------------------------------------------- q82 quantization error

def q_quantization_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    return V.quantization_error(_emb(spark, sf_dir))


ORACLE_QUANTIZATION_ERROR = """
WITH e AS (SELECT label, embedding::DOUBLE[] AS v FROM embeddings),
p AS (SELECT label, v,
             CASE WHEN amax > 0 THEN 127.0 / amax ELSE 1.0 END AS scale
      FROM (SELECT label, v,
                   list_aggregate(list_transform(v, x -> abs(x)), 'max')
                       AS amax
            FROM e)),
err AS (SELECT label,
               list_aggregate(list_transform(v,
                   x -> abs(x - greatest(-127.0,
                            least(127.0, floor(x*scale + 0.5))) / scale)),
                   'sum') AS e_sum
        FROM p)
SELECT label, count(*) AS n_vecs,
       round(CAST(sum(CAST(e_sum AS DECIMAL(28,12))) AS DOUBLE)
             / count(*), 6) AS avg_quant_err,
       round(max(e_sum), 6) AS max_quant_err
FROM err GROUP BY label
"""


# ----------------------------------------------- q83 label cohesion

def q_label_cohesion(spark: SparkSession, sf_dir: str) -> DataFrame:
    return V.label_cohesion(_emb(spark, sf_dir))


ORACLE_LABEL_COHESION = """
WITH e AS (SELECT label, vec_id, embedding::DOUBLE[] AS v
           FROM embeddings),
m AS (SELECT label, ord,
             CAST(sum(CAST(val AS DECIMAL(28,12))) AS DOUBLE)
             / count(*) AS mean
      FROM (SELECT label, unnest(v) AS val,
                   generate_subscripts(v, 1) AS ord FROM e)
      GROUP BY label, ord),
c AS (SELECT label, list(mean ORDER BY ord) AS cvec FROM m
      GROUP BY label),
s AS (SELECT e.label,
             list_dot_product(v, cvec)
             / (sqrt(list_dot_product(v, v))
                * sqrt(list_dot_product(cvec, cvec))) AS cs
      FROM e JOIN c USING (label))
SELECT label, count(*) AS n_vecs,
       round(CAST(sum(CAST(cs AS DECIMAL(28,12))) AS DOUBLE)
             / count(*), 6) AS avg_cos,
       round(min(cs), 6) AS min_cos
FROM s GROUP BY label
"""


# ------------------------------------------ q84 neighbor confusion

def q_neighbor_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-1 cosine neighbor for the deterministic 5% query
    sample → (query label, neighbor label) counts."""
    return V.neighbor_confusion(_emb(spark, sf_dir), every=20)


ORACLE_NEIGHBOR_CONFUSION = """
WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v
           FROM embeddings),
qs AS (SELECT vec_id AS q_id, label AS q_label, v AS qv
       FROM e WHERE vec_id % 20 = 0),
sc AS (SELECT q_id, q_label, e.label AS n_label, e.vec_id AS n_id,
              list_dot_product(e.v, qv)
              / (sqrt(list_dot_product(e.v, e.v))
                 * sqrt(list_dot_product(qv, qv))) AS cs
       FROM e CROSS JOIN qs WHERE e.vec_id <> q_id),
top AS (SELECT q_id, q_label, n_label,
               row_number() OVER (PARTITION BY q_id
                                  ORDER BY cs DESC, n_id) AS rn
        FROM sc)
SELECT q_label, n_label, count(*) AS n_queries
FROM top WHERE rn = 1 GROUP BY 1, 2
"""


# -------------------------------------- q140 SemDeDup semantic dedup

def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup over the planted-near-dup embedding corpus (q36's):
    k-means cells → within-cell cosine pairs ≥ 0.9. The cell-scoped
    join is the scale path (Σ|cell|² work, shuffled on the cluster
    id); the oracle replays the full 2-iteration Lloyd assignment in
    scaled integers and the same cosine fold."""
    from industrial_data_pipeline_spark.suite_llm import _emb_dup_corpus
    return V.semantic_dedup_pairs(_emb_dup_corpus(spark, sf_dir),
                                  k=4, iters=2, threshold=0.9)


def _oracle_semantic_dedup() -> str:
    from industrial_data_pipeline_spark.suite_llm import _EMB_DUP_SQL
    cos = ("round(list_dot_product(a.v, b.v)"
           " / (sqrt(list_dot_product(a.v, a.v))"
           " * sqrt(list_dot_product(b.v, b.v))), 6)")
    return f"""
WITH corpus AS ({_EMB_DUP_SQL}),
q AS (SELECT vec_id, embedding AS v,
             {_QV.format(c='embedding')} AS qv FROM corpus),
c1 AS (SELECT CAST(vec_id AS BIGINT) AS cluster, qv AS cq
       FROM q WHERE vec_id < 4),
a1 AS (SELECT vec_id, cluster,
              row_number() OVER (PARTITION BY vec_id
                                 ORDER BY d2, cluster) AS rn
       FROM (SELECT q.vec_id, c1.cluster, {_D2} AS d2
             FROM q CROSS JOIN c1)),
m1 AS (SELECT cluster, ord,
              CAST(sum(CAST(val AS DECIMAL(28,12))) AS DOUBLE)
              / count(*) AS mean
       FROM (SELECT a1.cluster, unnest(q.v) AS val,
                    generate_subscripts(q.v, 1) AS ord
             FROM a1 JOIN q USING (vec_id) WHERE rn = 1)
       GROUP BY cluster, ord),
c2 AS (SELECT cluster, {_QV.format(c='list(mean ORDER BY ord)')} AS cq
       FROM m1 GROUP BY cluster),
a2 AS (SELECT vec_id, cluster,
              row_number() OVER (PARTITION BY vec_id
                                 ORDER BY d2, cluster) AS rn
       FROM (SELECT q.vec_id, c2.cluster, {_D2} AS d2
             FROM q CROSS JOIN c2)),
asg AS (SELECT vec_id, cluster FROM a2 WHERE rn = 1),
j AS (SELECT q.vec_id, q.v, asg.cluster
      FROM q JOIN asg USING (vec_id)),
p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.cluster,
             {cos} AS cosine_sim
      FROM j a JOIN j b
        ON a.cluster = b.cluster AND a.vec_id < b.vec_id)
SELECT id_a, id_b, cluster, cosine_sim FROM p WHERE cosine_sim >= 0.9
"""


REGISTRY_VECTORS: dict[str, tuple] = {
    "q81_kmeans": (q_kmeans, ORACLE_KMEANS),
    "q82_quantization_error": (q_quantization_error,
                               ORACLE_QUANTIZATION_ERROR),
    "q83_label_cohesion": (q_label_cohesion, ORACLE_LABEL_COHESION),
    "q84_neighbor_confusion": (q_neighbor_confusion,
                               ORACLE_NEIGHBOR_CONFUSION),
    "q140_semantic_dedup": (q_semantic_dedup, _oracle_semantic_dedup()),
}


# ------------------------------------ q170 per-label centroid stats

def q_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean-pooled class prototypes over the embedding table
    (operators/vectors.py::label_centroids) — long-form decimal-exact
    per-dimension means, centroid L2 norms hash-checked raw."""
    from industrial_data_pipeline_spark.operators.vectors import (
        label_centroids)
    from industrial_data_pipeline_spark.suite_llm import _load_emb
    return label_centroids(_load_emb(spark, sf_dir))


ORACLE_LABEL_CENTROIDS = """
WITH ex AS (SELECT label, i.i AS dim,
                   CAST(embedding[i.i] AS DOUBLE) AS x
            FROM embeddings CROSS JOIN
                 (SELECT unnest(generate_series(1, 64)) AS i) i),
sd AS (SELECT label, dim,
              CAST(sum(CAST(x AS DECIMAL(28,6))) AS DECIMAL(18,6))
                  AS s
       FROM ex GROUP BY 1, 2),
sq AS (SELECT label, sqrt(CAST(sum(s * s) AS DOUBLE)) AS sn
       FROM sd GROUP BY label),
n AS (SELECT label, count(*) AS n_vectors FROM embeddings GROUP BY 1)
SELECT n.label, n.n_vectors,
       sq.sn / n.n_vectors + 0.0 AS centroid_norm
FROM n JOIN sq USING (label)
"""

REGISTRY_VECTORS.update({
    "q170_label_centroids": (q_label_centroids,
                             ORACLE_LABEL_CENTROIDS),
})


# ------------------------- q188 per-dimension standardization stats

def q_dim_standardization(spark: SparkSession,
                          sf_dir: str) -> DataFrame:
    """The feature-standardization preprocessing pass: per embedding
    dimension, mean and population std over the whole corpus — the
    (μ, σ) table a whitening/z-score transform broadcasts. Long-form
    explode, decimal-exact S and SS at the proven-safe scale 6, then
    mean = S/n and σ = sqrt((SS − S²/n)/n) as fixed-order IEEE ops on
    identical inputs — emitted RAW (the q161 rule: same op sequence ⇒
    same bits; rounding the same double can differ at a half)."""
    from industrial_data_pipeline_spark.suite_llm import _load_emb
    emb = _load_emb(spark, sf_dir)
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    ex = emb.select(F.posexplode(v).alias("dim", "x"))
    x6 = F.col("x").cast("decimal(18,6)")
    agg = (ex.groupBy("dim")
           .agg(F.count("*").alias("n"),
                F.sum(x6).cast("double").alias("_s"),
                F.sum(x6 * x6).cast("double").alias("_ss")))
    mean = F.col("_s") / F.col("n")
    var = (F.col("_ss") - F.col("_s") * F.col("_s") / F.col("n")) \
        / F.col("n")
    return agg.select("dim", "n",
                      (mean + F.lit(0.0)).alias("mean"),
                      (F.sqrt(var) + F.lit(0.0)).alias("std"))


ORACLE_DIM_STANDARDIZATION = """
WITH ex AS (SELECT i.i - 1 AS dim,
                   CAST(embedding[i.i] AS DOUBLE) AS x
            FROM embeddings CROSS JOIN
                 (SELECT unnest(generate_series(1, 64)) AS i) i),
a AS (SELECT dim, count(*) AS n,
             CAST(sum(CAST(x AS DECIMAL(18,6))) AS DOUBLE) AS s,
             CAST(sum(CAST(x AS DECIMAL(18,6))
                      * CAST(x AS DECIMAL(18,6))) AS DOUBLE) AS ss
      FROM ex GROUP BY dim)
SELECT CAST(dim AS INT) AS dim, n,
       s / n + 0.0 AS mean,
       sqrt((ss - s * s / n) / n) + 0.0 AS std
FROM a
"""

REGISTRY_VECTORS.update({
    "q188_dim_standardization": (q_dim_standardization,
                                 ORACLE_DIM_STANDARDIZATION),
})


# ----------------------- q213 centroid pairwise cosine similarity

def q_centroid_similarity(spark: SparkSession,
                          sf_dir: str) -> DataFrame:
    """Class-confusability matrix: cosine similarity between every
    pair of label centroids — the first thing to read before trusting
    a labeled embedding space (two classes whose prototypes sit at
    cos > 0.9 will confuse any nearest-centroid routing; q84 measures
    that confusion empirically, this predicts it geometrically).
    Determinism: the 1/n mean factors cancel inside cosine, so the
    whole statistic computes from the exact per-dim DECIMAL sums
    (q170's representation) — dot and squared norms stay in DECIMAL
    (order-free), then exactly one sqrt/divide in IEEE doubles.
    Shapes: long-form explode, (label × dim) partial-agg shuffle,
    |labels|²/2 pair rows via a broadcast self-join on dim."""
    from industrial_data_pipeline_spark.suite_llm import _load_emb
    emb = _load_emb(spark, sf_dir)
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    ex = emb.select("label", F.posexplode(v).alias("dim", "x"))
    sd = (ex.groupBy("label", "dim")
          .agg(F.sum(F.col("x").cast("decimal(28,6)"))
               .cast("decimal(18,6)").alias("s")))
    nrm = (sd.groupBy("label")
           .agg(F.sum(F.col("s") * F.col("s")).alias("ss")))
    a, b = sd.alias("a"), sd.alias("b")
    dots = (a.join(F.broadcast(b),
                   (F.col("a.dim") == F.col("b.dim"))
                   & (F.col("a.label") < F.col("b.label")))
            .groupBy(F.col("a.label").alias("label_a"),
                     F.col("b.label").alias("label_b"))
            .agg(F.sum(F.col("a.s") * F.col("b.s")).alias("dot")))
    na = nrm.select(F.col("label").alias("label_a"),
                    F.col("ss").alias("ss_a"))
    nb = nrm.select(F.col("label").alias("label_b"),
                    F.col("ss").alias("ss_b"))
    return (dots.join(F.broadcast(na), "label_a")
            .join(F.broadcast(nb), "label_b")
            .select("label_a", "label_b",
                    (F.col("dot").cast("double")
                     / (F.sqrt(F.col("ss_a").cast("double"))
                        * F.sqrt(F.col("ss_b").cast("double")))
                     + 0.0).alias("cosine")))


ORACLE_CENTROID_SIMILARITY = """
WITH ex AS (SELECT label, i.i AS dim,
                   CAST(embedding[i.i] AS DOUBLE) AS x
            FROM embeddings CROSS JOIN
                 (SELECT unnest(generate_series(1, 64)) AS i) i),
sd AS (SELECT label, dim,
              CAST(sum(CAST(x AS DECIMAL(28,6))) AS DECIMAL(18,6))
                  AS s
       FROM ex GROUP BY 1, 2),
nrm AS (SELECT label, sum(s * s) AS ss FROM sd GROUP BY 1),
dots AS (SELECT a.label AS label_a, b.label AS label_b,
                sum(a.s * b.s) AS dot
         FROM sd a JOIN sd b
           ON a.dim = b.dim AND a.label < b.label
         GROUP BY 1, 2)
SELECT d.label_a, d.label_b,
       CAST(d.dot AS DOUBLE)
       / (sqrt(CAST(na.ss AS DOUBLE)) * sqrt(CAST(nb.ss AS DOUBLE)))
       + 0.0 AS cosine
FROM dots d JOIN nrm na ON d.label_a = na.label
            JOIN nrm nb ON d.label_b = nb.label
"""

REGISTRY_VECTORS.update({
    "q213_centroid_similarity": (q_centroid_similarity,
                                 ORACLE_CENTROID_SIMILARITY),
})


# ------------------- q217 quantization impact on retrieval recall

QREC_NQ = 20   # query vectors (vec_id < QREC_NQ)
QREC_K = 10    # neighbors compared


def q_quantized_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Does int8 quantization change what retrieval RETURNS?  q82
    measures reconstruction error; this measures the consequence:
    per query, the overlap between the exact-fp cosine top-10 and
    the top-10 under q82's symmetric int8 scheme, plus whether the
    top-1 neighbor survives. The per-vector scales cancel inside
    cosine, so the quantized score is arithmetic on small integers
    (|q| ≤ 127, 64-dim dot ≤ 1.04e6 — exactly representable, any
    summation order, any engine). Shapes: the query set broadcasts,
    scores are JVM-side zip_with/aggregate map work, ranking is one
    window per ordering partitioned by query id — the corpus never
    shuffles."""
    from pyspark.sql import Window

    from industrial_data_pipeline_spark.operators.similarity import (
        _as_double, _dot)
    from industrial_data_pipeline_spark.suite_llm import _load_emb
    v = _as_double(F.col("embedding"))
    amax = F.array_max(F.transform(v, F.abs))
    scale = F.when(amax > 0, F.lit(127.0) / amax).otherwise(F.lit(1.0))
    qarr = F.transform(v, lambda x: F.greatest(
        F.lit(-127.0),
        F.least(F.lit(127.0), F.floor(x * scale + 0.5)
                .cast("double"))))
    base = (_load_emb(spark, sf_dir)
            .select("vec_id", v.alias("v"), qarr.alias("q"))
            .withColumn("nv", _dot(F.col("v"), F.col("v")))
            .withColumn("nq", _dot(F.col("q"), F.col("q"))))
    queries = base.where(F.col("vec_id") < QREC_NQ).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("Qv"),
        F.col("q").alias("Qq"), F.col("nv").alias("Qnv"),
        F.col("nq").alias("Qnq"))
    pairs = (base.crossJoin(F.broadcast(queries))
             .where(F.col("vec_id") != F.col("query_id"))
             .select("query_id", "vec_id",
                     (_dot(F.col("v"), F.col("Qv"))
                      / (F.sqrt("nv") * F.sqrt("Qnv")))
                     .alias("cos_fp"),
                     (_dot(F.col("q"), F.col("Qq"))
                      / (F.sqrt("nq") * F.sqrt("Qnq")))
                     .alias("cos_q")))
    wf = Window.partitionBy("query_id").orderBy(F.desc("cos_fp"),
                                                "vec_id")
    wq = Window.partitionBy("query_id").orderBy(F.desc("cos_q"),
                                                "vec_id")
    exact = (pairs.withColumn("rn", F.row_number().over(wf))
             .where(F.col("rn") <= QREC_K)
             .select("query_id", "vec_id", "rn"))
    quant = (pairs.withColumn("qrn", F.row_number().over(wq))
             .where(F.col("qrn") <= QREC_K)
             .select("query_id", "vec_id", "qrn"))
    overlap = (exact.join(quant, ["query_id", "vec_id"], "left")
               .groupBy("query_id")
               .agg(F.count(F.when(F.col("qrn").isNotNull(), 1))
                    .alias("n_overlap"),
                    F.max(F.when(F.col("rn") == 1, F.col("vec_id")))
                    .alias("_e1")))
    q1 = quant.where(F.col("qrn") == 1).select(
        "query_id", F.col("vec_id").alias("_q1"))
    return (overlap.join(q1, "query_id")
            .select("query_id", "n_overlap",
                    (F.col("_e1") == F.col("_q1"))
                    .alias("top1_match")))


ORACLE_QUANTIZED_RECALL = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
p AS (SELECT vec_id, v,
             CASE WHEN amax > 0 THEN 127.0 / amax ELSE 1.0 END
                 AS scale
      FROM (SELECT vec_id, v,
                   list_aggregate(list_transform(v, x -> abs(x)),
                                  'max') AS amax
            FROM e)),
b AS (SELECT vec_id, v,
             list_transform(v, x -> greatest(-127.0,
                 least(127.0, floor(x * scale + 0.5)))) AS q
      FROM p),
pr AS (SELECT c.vec_id, qq.vec_id AS query_id,
              list_dot_product(c.v, qq.v)
              / (sqrt(list_dot_product(c.v, c.v))
                 * sqrt(list_dot_product(qq.v, qq.v))) AS cos_fp,
              list_dot_product(c.q, qq.q)
              / (sqrt(list_dot_product(c.q, c.q))
                 * sqrt(list_dot_product(qq.q, qq.q))) AS cos_q
       FROM b c JOIN b qq ON qq.vec_id < {QREC_NQ}
                         AND c.vec_id <> qq.vec_id),
ex AS (SELECT query_id, vec_id,
              row_number() OVER (PARTITION BY query_id
                                 ORDER BY cos_fp DESC, vec_id) AS rn
       FROM pr QUALIFY rn <= {QREC_K}),
qt AS (SELECT query_id, vec_id,
              row_number() OVER (PARTITION BY query_id
                                 ORDER BY cos_q DESC, vec_id) AS qrn
       FROM pr QUALIFY qrn <= {QREC_K})
SELECT ex.query_id,
       count(CASE WHEN qt.qrn IS NOT NULL THEN 1 END) AS n_overlap,
       max(CASE WHEN ex.rn = 1 THEN ex.vec_id END)
       = max(CASE WHEN ex.rn = 1 THEN q1._q1 END) AS top1_match
FROM ex LEFT JOIN qt USING (query_id, vec_id)
JOIN (SELECT query_id, vec_id AS _q1 FROM qt WHERE qrn = 1) q1
  USING (query_id)
GROUP BY ex.query_id
"""

REGISTRY_VECTORS.update({
    "q217_quantized_recall": (q_quantized_recall,
                              ORACLE_QUANTIZED_RECALL),
})


# ------------------- q270 product-quantization (PQ) recall audit

def q_pq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ's compression half, audited end to end
    (operators/vectors.py::pq_train/pq_encode/pq_adc_topk): a 4-
    subspace, 8-code product-quantization codebook is TRAINED on the
    embeddings (one distributed Lloyd job for all subspaces), every
    vector is ENCODED to 4 small ints (64 float64 dims → 4 codes,
    ~128× smaller than the raw vectors), and 10 queries rank the
    corpus by ASYMMETRIC distance — a broadcast lookup-table add
    over the code columns that never touches the original vectors.
    Per query: overlap of the ADC top-10 with the exact scaled-int
    L2 top-10, whether the true nearest neighbor survives, AND the
    production two-stage number — ADC shortlists 50 candidates,
    the exact distance re-ranks just those 50 (vectors touched for
    0.1%% of the corpus), top-10 taken from the re-rank. The spread
    between recall_at_10 and recall_rerank50 is the measured answer
    to 'what does 128× compression cost, and how much does the
    standard re-rank stage buy back'. Every arithmetic step
    (codebook means, argmin encode, ADC sums, exact distances) is
    the kmeans scaled-int / DECIMAL discipline, so the oracle
    replays training, encoding and all three rankings bit-for-bit
    in SQL."""
    from pyspark.sql import Window

    emb = _emb(spark, sf_dir)
    cb = V.pq_train(emb, dim=64, m=4, k=8, iters=1)
    codes = V.pq_encode(emb, cb, dim=64, m=4)
    queries = emb.where(F.col("vec_id") < 10)
    shortlist = V.pq_adc_topk(codes, cb, queries, dim=64, m=4,
                              k_top=50)
    approx = (shortlist.where(F.col("rk") <= 10)
              .select("query_id", "vec_id"))

    base = emb.select(
        F.col("vec_id").alias("_id"),
        V._quantize(V._as_double(F.col("embedding"))).alias("_q"))
    qf = (base.where(F.col("_id") < 10)
          .select(F.col("_id").alias("query_id"),
                  F.col("_q").alias("_qq")))
    w = Window.partitionBy("query_id").orderBy("_d", "_id")
    exact = (base.join(F.broadcast(qf),
                       F.col("_id") != F.col("query_id"))
             .withColumn("_d", V._d2_scaled(F.col("_q"),
                                            F.col("_qq")))
             .withColumn("rk", F.row_number().over(w))
             .where(F.col("rk") <= 10)
             .select("query_id", F.col("_id").alias("vec_id"), "rk"))
    hits = (exact.join(approx, ["query_id", "vec_id"])
            .groupBy("query_id").agg(F.count("*").alias("n_hits")))
    wr = Window.partitionBy("query_id").orderBy("_d", "vec_id")
    rerank = (shortlist.select("query_id", "vec_id")
              .join(base, F.col("vec_id") == F.col("_id"))
              .join(F.broadcast(qf.withColumnRenamed(
                  "query_id", "_qid")),
                    F.col("query_id") == F.col("_qid"))
              .withColumn("_d", V._d2_scaled(F.col("_q"),
                                             F.col("_qq")))
              .withColumn("rrk", F.row_number().over(wr))
              .where(F.col("rrk") <= 10)
              .select("query_id", "vec_id"))
    rhits = (exact.join(rerank, ["query_id", "vec_id"])
             .groupBy("query_id").agg(F.count("*").alias("n_rhits")))
    top1 = (exact.where(F.col("rk") == 1)
            .join(approx.withColumn("_in", F.lit(True)),
                  ["query_id", "vec_id"], "left")
            .select("query_id",
                    F.coalesce("_in", F.lit(False))
                    .alias("top1_survives")))
    return (qf.select("query_id")
            .join(hits, "query_id", "left")
            .join(rhits, "query_id", "left")
            .join(top1, "query_id")
            .select("query_id",
                    F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
                    (F.coalesce("n_hits", F.lit(0)) / F.lit(10.0))
                    .alias("recall_at_10"),
                    (F.coalesce("n_rhits", F.lit(0)) / F.lit(10.0))
                    .alias("recall_rerank50"),
                    "top1_survives"))


def _oracle_pq_recall(m: int = 4, k: int = 8, ds: int = 16,
                      nq: int = 10) -> str:
    def d2(a: str, b: str) -> str:
        return (f"list_aggregate(list_transform(list_zip({a}, {b}),"
                f" p -> (p[1]-p[2])*(p[1]-p[2])), 'sum')")

    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT vec_id, v, {_QV.format(c='v')} AS qv FROM e),
sl AS (SELECT vec_id, i AS subspace,
              v[i*{ds}+1 : i*{ds}+{ds}] AS sv,
              qv[i*{ds}+1 : i*{ds}+{ds}] AS sq
       FROM q, UNNEST(generate_series(0, {m - 1})) AS t(i)),
seeds AS (SELECT CAST(vec_id AS BIGINT) AS code FROM e
          ORDER BY vec_id LIMIT {k}),
c0 AS (SELECT subspace, seeds.code, sq AS cq
       FROM sl JOIN seeds ON sl.vec_id = seeds.code),
a1 AS (SELECT vec_id, subspace, code FROM (
         SELECT sl.vec_id, sl.subspace, c0.code,
                row_number() OVER (
                    PARTITION BY sl.vec_id, sl.subspace
                    ORDER BY {d2('sq', 'cq')}, c0.code) AS rn
         FROM sl JOIN c0 USING (subspace))
       WHERE rn = 1),
m1 AS (SELECT subspace, code, ord,
              CAST(sum(CAST(val AS DECIMAL(28,12))) AS DOUBLE)
              / count(*) AS mean
       FROM (SELECT a1.subspace, a1.code, unnest(sl.sv) AS val,
                    generate_subscripts(sl.sv, 1) AS ord
             FROM a1 JOIN sl USING (vec_id, subspace))
       GROUP BY 1, 2, 3),
c1 AS (SELECT subspace, code,
              {_QV.format(c='list(mean ORDER BY ord)')} AS cq
       FROM m1 GROUP BY subspace, code),
enc AS (SELECT vec_id, subspace, code FROM (
          SELECT sl.vec_id, sl.subspace, c1.code,
                 row_number() OVER (
                     PARTITION BY sl.vec_id, sl.subspace
                     ORDER BY {d2('sq', 'cq')}, c1.code) AS rn
          FROM sl JOIN c1 USING (subspace))
        WHERE rn = 1),
lut AS (SELECT sl.vec_id AS query_id, sl.subspace, c1.code,
               {d2('sq', 'cq')} AS qd2
        FROM sl JOIN c1 USING (subspace) WHERE sl.vec_id < {nq}),
adc AS (SELECT query_id, enc.vec_id, sum(qd2) AS d
        FROM enc JOIN lut USING (subspace, code)
        WHERE enc.vec_id <> query_id
        GROUP BY 1, 2),
short AS (SELECT query_id, vec_id, rk FROM (
            SELECT query_id, vec_id,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY d, vec_id) AS rk
            FROM adc) WHERE rk <= 50),
atop AS (SELECT query_id, vec_id FROM short WHERE rk <= 10),
rr AS (SELECT s.query_id, s.vec_id,
              {d2('q.qv', 'qq.qv')} AS d
       FROM short s
       JOIN q ON q.vec_id = s.vec_id
       JOIN q qq ON qq.vec_id = s.query_id),
rtop AS (SELECT query_id, vec_id FROM (
           SELECT query_id, vec_id,
                  row_number() OVER (PARTITION BY query_id
                                     ORDER BY d, vec_id) AS rrk
           FROM rr) WHERE rrk <= 10),
ex AS (SELECT qq.vec_id AS query_id, q.vec_id,
              {d2('q.qv', 'qq.qv')} AS d
       FROM q CROSS JOIN
            (SELECT vec_id, qv FROM q WHERE vec_id < {nq}) qq
       WHERE q.vec_id <> qq.vec_id),
etop AS (SELECT query_id, vec_id, rk FROM (
           SELECT query_id, vec_id,
                  row_number() OVER (PARTITION BY query_id
                                     ORDER BY d, vec_id) AS rk
           FROM ex) WHERE rk <= 10),
hits AS (SELECT query_id, count(*) AS n_hits
         FROM etop JOIN atop USING (query_id, vec_id) GROUP BY 1),
rhits AS (SELECT query_id, count(*) AS n_rhits
          FROM etop JOIN rtop USING (query_id, vec_id) GROUP BY 1),
t1 AS (SELECT e1.query_id, (a.vec_id IS NOT NULL) AS top1_survives
       FROM (SELECT query_id, vec_id FROM etop WHERE rk = 1) e1
       LEFT JOIN atop a USING (query_id, vec_id))
SELECT qq.vec_id AS query_id,
       CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
       coalesce(h.n_hits, 0) / 10.0 AS recall_at_10,
       coalesce(rh.n_rhits, 0) / 10.0 AS recall_rerank50,
       t1.top1_survives
FROM (SELECT vec_id FROM e WHERE vec_id < {nq}) qq
LEFT JOIN hits h ON h.query_id = qq.vec_id
LEFT JOIN rhits rh ON rh.query_id = qq.vec_id
JOIN t1 ON t1.query_id = qq.vec_id
"""


REGISTRY_VECTORS.update({
    "q270_pq_recall": (q_pq_recall, _oracle_pq_recall()),
})


# ---------------- q273 PQ codebook STALENESS audit (drift monitor)

def q_pq_drift_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The retrain trigger a production IVF-PQ must monitor
    (StoredIvfIndex.quantization_drift): the codebook is trained
    once on the build corpus and FROZEN (the centroid discipline —
    retraining would re-mean committed codes and break
    append/as-of equality), so when ingest drifts away from the
    build distribution the codes reconstruct their vectors worse
    and worse. The audit reports per EPOCH the count, mean and max
    reconstruction error ||quantize(v) − centroid(code)||²
    (descaled): epoch 0 appends in-distribution vectors (error ≈
    build), epoch 1 appends a SHIFTED distribution (every value
    +2 — far outside the build range) whose error visibly jumps —
    the auditable 'rebuild the codebook' signal. All distances are
    exact scaled int64s; per-epoch sums ride a DECIMAL aggregate
    with ONE double cast + two correctly-rounded divisions, so the
    oracle replays training, encoding and the error arithmetic
    bit-for-bit."""
    import shutil
    import tempfile

    from industrial_data_pipeline_spark.operators.similarity import (
        StoredIvfIndex)
    from industrial_data_pipeline_spark.suite_llm import _load_emb

    emb = _load_emb(spark, sf_dir)
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    base = emb.where(F.col("vec_id") < 150) \
        .select("vec_id", v.alias("_v"))
    e0 = (emb.where((F.col("vec_id") >= 150) & (F.col("vec_id") < 200))
          .select("vec_id", v.alias("_v")))
    e1 = (emb.where((F.col("vec_id") >= 200) & (F.col("vec_id") < 250))
          .select("vec_id",
                  F.transform(v, lambda x: x + F.lit(2.0))
                  .alias("_v")))
    root = tempfile.mkdtemp(prefix="idp_q273_")
    try:
        idx = StoredIvfIndex(spark, root, id_col="vec_id",
                             vec_col="_v", n_cells=16,
                             pq_m=4, pq_k=8)
        idx.build(base)
        idx.append(e0, epoch_id=0)
        idx.append(e1, epoch_id=1)
        out = idx.quantization_drift().localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


def _oracle_pq_drift(m: int = 4, k: int = 8, ds: int = 16) -> str:
    def d2(a: str, b: str) -> str:
        return (f"list_aggregate(list_transform(list_zip({a}, {b}),"
                f" p -> (p[1]-p[2])*(p[1]-p[2])), 'sum')")

    return f"""
WITH c0 AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
base AS (SELECT vec_id, v FROM c0 WHERE vec_id < 150),
all_rows AS (
  SELECT vec_id, v, -1 AS epoch FROM base
  UNION ALL
  SELECT vec_id, v, 0 FROM c0
  WHERE vec_id >= 150 AND vec_id < 200
  UNION ALL
  SELECT vec_id, list_transform(v, x -> x + 2.0), 1
  FROM c0 WHERE vec_id >= 200 AND vec_id < 250),
p0 AS (SELECT vec_id, v, {_QV.format(c='v')} AS pqv FROM base),
sl AS (SELECT vec_id, i AS subspace,
              v[i*{ds}+1 : i*{ds}+{ds}] AS sv,
              pqv[i*{ds}+1 : i*{ds}+{ds}] AS sq
       FROM p0, UNNEST(generate_series(0, {m - 1})) AS t(i)),
pseeds AS (SELECT CAST(vec_id AS BIGINT) AS code FROM base
           ORDER BY vec_id LIMIT {k}),
pc0 AS (SELECT subspace, pseeds.code, sq AS cq
        FROM sl JOIN pseeds ON sl.vec_id = pseeds.code),
pa1 AS (SELECT vec_id, subspace, code FROM (
          SELECT sl.vec_id, sl.subspace, pc0.code,
                 row_number() OVER (
                     PARTITION BY sl.vec_id, sl.subspace
                     ORDER BY {d2('sq', 'cq')}, pc0.code) AS rn
          FROM sl JOIN pc0 USING (subspace))
        WHERE rn = 1),
pm1 AS (SELECT subspace, code, ord,
               CAST(sum(CAST(val AS DECIMAL(28,12))) AS DOUBLE)
               / count(*) AS mean
        FROM (SELECT pa1.subspace, pa1.code, unnest(sl.sv) AS val,
                     generate_subscripts(sl.sv, 1) AS ord
              FROM pa1 JOIN sl USING (vec_id, subspace))
        GROUP BY 1, 2, 3),
pc1 AS (SELECT subspace, code,
               {_QV.format(c='list(mean ORDER BY ord)')} AS cq
        FROM pm1 GROUP BY subspace, code),
aq AS (SELECT vec_id, epoch, {_QV.format(c='v')} AS pqv
       FROM all_rows),
asl AS (SELECT vec_id, epoch, i AS subspace,
               pqv[i*{ds}+1 : i*{ds}+{ds}] AS sq
        FROM aq, UNNEST(generate_series(0, {m - 1})) AS t(i)),
perr AS (SELECT vec_id, epoch, subspace,
                min({d2('sq', 'cq')}) AS d2min
         FROM asl JOIN pc1 USING (subspace)
         GROUP BY 1, 2, 3),
verr AS (SELECT vec_id, epoch,
                CAST(sum(d2min) AS BIGINT) AS err
         FROM perr GROUP BY 1, 2)
SELECT CAST(epoch AS INT) AS epoch, count(*) AS n_vecs,
       round(CAST(CAST(sum(CAST(err AS DECIMAL(38,0)))
                       AS BIGINT) AS DOUBLE)
             / count(*) / 1000000000000.0, 6) AS mean_err,
       round(CAST(max(err) AS DOUBLE) / 1000000000000.0, 6)
           AS max_err
FROM verr GROUP BY epoch
"""


REGISTRY_VECTORS.update({
    "q273_pq_drift_audit": (q_pq_drift_audit, _oracle_pq_drift()),
})


# ------- q276 residual-PQ recall A/B: IVF-PQ proper vs raw encoding

def q_residual_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The accuracy half of IVF-PQ (VERDICT r10 item 1), measured as
    a controlled A/B: the SAME corpus, the SAME trainer
    (operators/vectors.py::pq_train_ints, 1 Lloyd pass, k lowest-id
    seeds) and the SAME (m=4, k=8) budget encode (a) the RAW
    quantized vectors and (b) the CELL RESIDUALS
    ``quantize(v) − quantize(centroid(cell))`` over a 16-cell IVF
    (seed centroids, the q259/q271 discipline) — so the only varied
    factor is WHAT the codebook describes. Per query (vec_id < 10):
    overlap of each ADC top-10 with the exact-cosine top-10. The
    residual numerator regains the coarse structure exactly —
    ⟨q, c_cell⟩ (one int per (query, cell)) + Σ_s⟨q_s, r̃_s⟩ (the
    LUT) — which is why capacity spent on residuals buys recall:
    raw encoding wastes the 3-bit-per-subspace budget re-describing
    what the cell id already pins. All arithmetic is exact int64
    sums + one double division per ranked pair (the q270/q271
    discipline), so the oracle replays BOTH trainings, encodings
    and all three rankings bit-for-bit. Measured on these random
    embeddings: recall lifts 0.27→0.32 ADC-only and 0.65→0.85 after
    rerank-50 (tools/residual_recall_ab.py) — random vectors are
    PQ-hostile (no cluster structure), a floor not a ceiling."""
    import math

    from pyspark.sql import Window

    from industrial_data_pipeline_spark.operators import (
        similarity as S)

    NQ, NC, M, K = 10, 16, 4, 8
    dim = 64
    ds = dim // M
    emb = _emb(spark, sf_dir)
    base = emb.select(F.col("vec_id").cast("long").alias("vec_id"),
                      V._as_double(F.col("embedding")).alias("v"))
    cents = [list(map(float, r["v"]))
             for r in base.orderBy("vec_id").limit(NC).collect()]
    cents_q = [[int(math.floor(c * 1_000_000 + 0.5)) for c in ct]
               for ct in cents]
    cells_df = spark.createDataFrame(
        [(i, cq) for i, cq in enumerate(cents_q)],
        "cell int, _ccq array<long>")

    def idot(a, b):
        return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                           F.lit(0).cast("long"),
                           lambda acc, x: acc + x)

    rows = (S.ivf_assign(base, cents, "v")
            .withColumn("_q", V._quantize(F.col("v")))
            .join(F.broadcast(cells_df),
                  F.col("_cell") == F.col("cell"))
            .withColumn("_rq", F.zip_with("_q", "_ccq",
                                          lambda x, y: x - y))
            .withColumn("_vn2", idot(F.col("_q"), F.col("_q")))
            .drop("cell", "_ccq", "v")
            .localCheckpoint(eager=True))

    def slices_of(col: str) -> DataFrame:
        arr = F.array(*[F.slice(F.col(col), j * ds + 1, ds)
                        for j in range(M)])
        return (rows.select(F.col("vec_id").alias("_id"),
                            F.posexplode(arr).alias("subspace",
                                                    "_sq"))
                .localCheckpoint(eager=True))

    raw_sl, res_sl = slices_of("_q"), slices_of("_rq")
    cb_raw = V.pq_train_ints(raw_sl, k=K)
    cb_res = V.pq_train_ints(res_sl, k=K)
    enc_raw = V.pq_encode_ints(raw_sl, cb_raw)
    enc_res = V.pq_encode_ints(res_sl, cb_res)

    # query-side frames (the probe_batch_adc driver arithmetic,
    # expressed in-plan: LUT over RAW query slices for BOTH arms —
    # residualization applies to the STORED side only)
    qsl = (raw_sl.where(F.col("_id") < NQ)
           .select(F.col("_id").alias("query_id"), "subspace",
                   F.col("_sq").alias("_qs")))
    qn = (rows.where(F.col("vec_id") < NQ)
          .select(F.col("vec_id").alias("query_id"),
                  F.col("_vn2").alias("_qn2"), F.col("_q")))
    cd = (qn.crossJoin(F.broadcast(cells_df))
          .select("query_id", F.col("cell").alias("_vcell"),
                  idot(F.col("_q"), F.col("_ccq")).alias("_cdot")))
    cellmap = rows.select("vec_id", F.col("_cell").alias("_vcell"))
    vn = rows.select("vec_id", "_vn2")

    def lut_of(cb: DataFrame) -> DataFrame:
        return (qsl.join(F.broadcast(cb), "subspace")
                .select("query_id", "subspace", "code",
                        idot(F.col("_qs"), F.col("_cq"))
                        .alias("_qdot")))

    def topk_adc(enc: DataFrame, lut: DataFrame,
                 residual: bool) -> DataFrame:
        s = (enc.withColumnRenamed("_id", "vec_id")
             .join(F.broadcast(lut), ["subspace", "code"])
             .where(F.col("vec_id") != F.col("query_id"))
             .groupBy("query_id", "vec_id")
             .agg(F.sum("_qdot").alias("_fine")))
        if residual:
            s = (s.join(cellmap, "vec_id")
                 .join(F.broadcast(cd), ["query_id", "_vcell"])
                 .withColumn("_num", F.col("_fine") + F.col("_cdot")))
        else:
            s = s.withColumn("_num", F.col("_fine"))
        acos = (F.col("_num").cast("double")
                / (F.sqrt(F.col("_qn2").cast("double"))
                   * F.sqrt(F.col("_vn2").cast("double"))))
        w = Window.partitionBy("query_id").orderBy(
            F.desc("_acos"), F.col("vec_id"))
        return (s.join(vn, "vec_id")
                .join(F.broadcast(qn.select("query_id", "_qn2")),
                      "query_id")
                .where((F.col("_vn2") > 0) & (F.col("_qn2") > 0))
                .withColumn("_acos", acos)
                .withColumn("_rk", F.row_number().over(w))
                .where(F.col("_rk") <= 10)
                .select("query_id", "vec_id"))

    top_raw = topk_adc(enc_raw, lut_of(cb_raw), residual=False)
    top_res = topk_adc(enc_res, lut_of(cb_res), residual=True)

    qx = qn.select("query_id", F.col("_q").alias("_qq"), "_qn2")
    cosx = (idot(F.col("_q"), F.col("_qq")).cast("double")
            / (F.sqrt(F.col("_qn2").cast("double"))
               * F.sqrt(F.col("_vn2").cast("double"))))
    wx = Window.partitionBy("query_id").orderBy(
        F.desc("_cos"), F.col("vec_id"))
    exact = (rows.select("vec_id", "_q", "_vn2")
             .crossJoin(F.broadcast(qx))
             .where((F.col("vec_id") != F.col("query_id"))
                    & (F.col("_vn2") > 0) & (F.col("_qn2") > 0))
             .withColumn("_cos", cosx)
             .withColumn("_rk", F.row_number().over(wx))
             .where(F.col("_rk") <= 10)
             .select("query_id", "vec_id"))

    h_raw = (exact.join(top_raw, ["query_id", "vec_id"])
             .groupBy("query_id").agg(F.count("*").alias("_nr")))
    h_res = (exact.join(top_res, ["query_id", "vec_id"])
             .groupBy("query_id").agg(F.count("*").alias("_ns")))
    return (qn.select("query_id")
            .join(h_raw, "query_id", "left")
            .join(h_res, "query_id", "left")
            .select("query_id",
                    F.coalesce("_nr", F.lit(0)).alias("n_hits_raw"),
                    (F.coalesce("_nr", F.lit(0)).cast("double")
                     / F.lit(10.0)).alias("recall_raw"),
                    F.coalesce("_ns", F.lit(0)).alias("n_hits_res"),
                    (F.coalesce("_ns", F.lit(0)).cast("double")
                     / F.lit(10.0)).alias("recall_res")))


def _oracle_residual_recall(m: int = 4, k: int = 8, ds: int = 16,
                            nc: int = 16, nq: int = 10) -> str:
    def d2(a: str, b: str) -> str:
        return (f"list_aggregate(list_transform(list_zip({a}, {b}),"
                f" p -> (p[1]-p[2])*(p[1]-p[2])), 'sum')")

    def idot(a: str, b: str) -> str:
        return (f"list_aggregate(list_transform(list_zip({a}, {b}),"
                f" p -> p[1]*p[2]), 'sum')")

    # float cosine for the cell ASSIGNMENT ranking (the ivf_assign
    # kernel's arithmetic — the q271 `ab` CTE, pinned byte-exact)
    cos_a = ("(list_dot_product(q0.v, seed.cv)"
             " / (sqrt(list_dot_product(q0.v, q0.v))"
             " * sqrt(list_dot_product(seed.cv, seed.cv))))")

    def train(prefix: str, sl: str) -> str:
        """pq_train_ints replay: seeds = k lowest ids' slices, one
        exact-int Lloyd pass, centroid update floor(S/n + 0.5) on
        the int64 sum cast once to double."""
        return f"""
{prefix}c0 AS (SELECT subspace, pseeds.code, sq AS cq
        FROM {sl} JOIN pseeds ON {sl}.vec_id = pseeds.code),
{prefix}a1 AS (SELECT vec_id, subspace, code FROM (
          SELECT {sl}.vec_id, {sl}.subspace, {prefix}c0.code,
                 row_number() OVER (
                     PARTITION BY {sl}.vec_id, {sl}.subspace
                     ORDER BY {d2('sq', 'cq')}, {prefix}c0.code)
                     AS rn
          FROM {sl} JOIN {prefix}c0 USING (subspace))
        WHERE rn = 1),
{prefix}m1 AS (SELECT subspace, code, ord,
               CAST(floor(CAST(sum(val) AS DOUBLE) / count(*)
                          + 0.5) AS BIGINT) AS mean
        FROM (SELECT a.subspace, a.code, unnest({sl}.sq) AS val,
                     generate_subscripts({sl}.sq, 1) AS ord
              FROM {prefix}a1 a
              JOIN {sl} USING (vec_id, subspace))
        GROUP BY 1, 2, 3),
{prefix}c1 AS (SELECT subspace, code, list(mean ORDER BY ord) AS cq
        FROM {prefix}m1 GROUP BY subspace, code),
{prefix}enc AS (SELECT vec_id, subspace, code FROM (
          SELECT {sl}.vec_id, {sl}.subspace, {prefix}c1.code,
                 row_number() OVER (
                     PARTITION BY {sl}.vec_id, {sl}.subspace
                     ORDER BY {d2('sq', 'cq')}, {prefix}c1.code)
                     AS rn
          FROM {sl} JOIN {prefix}c1 USING (subspace))
        WHERE rn = 1),
{prefix}lut AS (SELECT s.vec_id AS qid, s.subspace, c.code,
               {idot('s.sq', 'c.cq')} AS qdot
        FROM qsl s JOIN {prefix}c1 c USING (subspace)
        WHERE s.vec_id < {nq})"""

    acos = ("(CAST(num AS DOUBLE) / (sqrt(CAST(qn2 AS DOUBLE))"
            " * sqrt(CAST(vn2 AS DOUBLE))))")
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q0 AS (SELECT vec_id, v, {_QV.format(c='v')} AS qv FROM e),
seed AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT)
                AS cell, v AS cv
         FROM e ORDER BY vec_id LIMIT {nc}),
scq AS (SELECT cell, {_QV.format(c='cv')} AS ccq FROM seed),
asg AS (SELECT vec_id, cell FROM (
          SELECT q0.vec_id, seed.cell,
                 row_number() OVER (PARTITION BY q0.vec_id
                                    ORDER BY {cos_a} DESC, seed.cell)
                     AS rn
          FROM q0 CROSS JOIN seed)
        WHERE rn = 1),
r0 AS (SELECT q0.vec_id, q0.qv,
              list_transform(list_zip(q0.qv, scq.ccq),
                             p -> p[1]-p[2]) AS rv,
              {idot('q0.qv', 'q0.qv')} AS vn2, asg.cell
       FROM q0 JOIN asg USING (vec_id) JOIN scq USING (cell)),
rsl AS (SELECT vec_id, i AS subspace,
               qv[i*{ds}+1 : i*{ds}+{ds}] AS sq
        FROM r0, UNNEST(generate_series(0, {m - 1})) AS t(i)),
ssl AS (SELECT vec_id, i AS subspace,
               rv[i*{ds}+1 : i*{ds}+{ds}] AS sq
        FROM r0, UNNEST(generate_series(0, {m - 1})) AS t(i)),
qsl AS (SELECT vec_id, subspace, sq FROM rsl WHERE vec_id < {nq}),
pseeds AS (SELECT CAST(vec_id AS BIGINT) AS code FROM e
           ORDER BY vec_id LIMIT {k}),
{train('r', 'rsl').lstrip()},
{train('s', 'ssl').lstrip()},
cd AS (SELECT r0.vec_id AS qid, scq.cell,
              {idot('r0.qv', 'scq.ccq')} AS cdot
       FROM r0 CROSS JOIN scq WHERE r0.vec_id < {nq}),
qn AS (SELECT vec_id AS qid, vn2 AS qn2 FROM r0
       WHERE vec_id < {nq}),
rsc AS (SELECT l.qid, e2.vec_id, sum(l.qdot) AS num
        FROM renc e2 JOIN rlut l ON l.subspace = e2.subspace
                                AND l.code = e2.code
        WHERE e2.vec_id <> l.qid GROUP BY 1, 2),
ssc AS (SELECT l.qid, e2.vec_id,
               max(cd.cdot) + sum(l.qdot) AS num
        FROM senc e2 JOIN slut l ON l.subspace = e2.subspace
                                AND l.code = e2.code
        JOIN r0 v2 ON v2.vec_id = e2.vec_id
        JOIN cd ON cd.qid = l.qid AND cd.cell = v2.cell
        WHERE e2.vec_id <> l.qid GROUP BY 1, 2),
rtop AS (SELECT qid, vec_id FROM (
           SELECT x.qid, x.vec_id,
                  row_number() OVER (PARTITION BY x.qid
                                     ORDER BY {acos} DESC, x.vec_id)
                      AS rk
           FROM (SELECT rsc.qid, rsc.vec_id, rsc.num, qn.qn2, r0.vn2
                 FROM rsc JOIN qn USING (qid)
                 JOIN r0 ON r0.vec_id = rsc.vec_id
                 WHERE qn.qn2 > 0 AND r0.vn2 > 0) x)
         WHERE rk <= 10),
stop AS (SELECT qid, vec_id FROM (
           SELECT x.qid, x.vec_id,
                  row_number() OVER (PARTITION BY x.qid
                                     ORDER BY {acos} DESC, x.vec_id)
                      AS rk
           FROM (SELECT ssc.qid, ssc.vec_id, ssc.num, qn.qn2, r0.vn2
                 FROM ssc JOIN qn USING (qid)
                 JOIN r0 ON r0.vec_id = ssc.vec_id
                 WHERE qn.qn2 > 0 AND r0.vn2 > 0) x)
         WHERE rk <= 10),
etop AS (SELECT qid, vec_id FROM (
           SELECT x.qid, x.vec_id,
                  row_number() OVER (PARTITION BY x.qid
                                     ORDER BY {acos} DESC, x.vec_id)
                      AS rk
           FROM (SELECT qq.vec_id AS qid, t.vec_id,
                        {idot('t.qv', 'qq.qv')} AS num,
                        qq.vn2 AS qn2, t.vn2
                 FROM r0 t CROSS JOIN
                      (SELECT vec_id, qv, vn2 FROM r0
                       WHERE vec_id < {nq}) qq
                 WHERE t.vec_id <> qq.vec_id
                   AND t.vn2 > 0 AND qq.vn2 > 0) x)
         WHERE rk <= 10),
hr AS (SELECT qid, count(*) AS n FROM etop
       JOIN rtop USING (qid, vec_id) GROUP BY 1),
hs AS (SELECT qid, count(*) AS n FROM etop
       JOIN stop USING (qid, vec_id) GROUP BY 1)
SELECT q.qid AS query_id,
       CAST(coalesce(hr.n, 0) AS BIGINT) AS n_hits_raw,
       CAST(coalesce(hr.n, 0) AS DOUBLE) / 10.0 AS recall_raw,
       CAST(coalesce(hs.n, 0) AS BIGINT) AS n_hits_res,
       CAST(coalesce(hs.n, 0) AS DOUBLE) / 10.0 AS recall_res
FROM qn q LEFT JOIN hr ON hr.qid = q.qid
LEFT JOIN hs ON hs.qid = q.qid
"""


REGISTRY_VECTORS.update({
    "q276_residual_recall": (q_residual_recall,
                             _oracle_residual_recall()),
})


# -------- q277 rebuild(): the retrain verb q273's drift signal fires

def q_ivf_rebuild_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The verb that ACTS on q273's staleness signal (VERDICT r10
    item 2 — StoredIvfIndex.rebuild): q273's exact drift scenario
    (build on base, epoch 0 in-distribution, epoch 1 every-value+2
    — the 280× reconstruction-error jump) is followed by
    ``rebuild()``, which retrains centroids AND the residual
    codebook on the CURRENT corpus, re-routes + re-encodes every
    stored row and swaps the asset through the shared fenced-lease
    protocol (epochs fold to history — the documented as-of reset).
    A 10-query batch FROM THE SHIFTED distribution then runs the
    two-stage ADC probe: the oracle replays the whole post-rebuild
    state in SQL — retrained-from-everything codebook, residual
    encoding of all 250 vectors, decomposed numerator, both
    rankings — so byte-equality pins that the rewrite really
    retrained (the frozen pre-rebuild codebook would rank the
    shifted candidates differently). The zombie-rebuilder abort and
    the drift-collapse assertion live in tests/test_lease.py and
    tests/test_similarity.py."""
    import shutil
    import tempfile

    from industrial_data_pipeline_spark.operators.similarity import (
        StoredIvfIndex)
    from industrial_data_pipeline_spark.suite_llm import _load_emb

    emb = _load_emb(spark, sf_dir)
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    base = emb.where(F.col("vec_id") < 150) \
        .select("vec_id", v.alias("_v"))
    e0 = (emb.where((F.col("vec_id") >= 150) & (F.col("vec_id") < 200))
          .select("vec_id", v.alias("_v")))
    e1 = (emb.where((F.col("vec_id") >= 200) & (F.col("vec_id") < 250))
          .select("vec_id",
                  F.transform(v, lambda x: x + F.lit(2.0))
                  .alias("_v")))
    qs = (e1.where(F.col("vec_id") < 210)
          .select(F.col("vec_id").alias("qid"),
                  F.col("_v").alias("_qv"))
          .localCheckpoint(eager=True))
    root = tempfile.mkdtemp(prefix="idp_q277_")
    try:
        idx = StoredIvfIndex(spark, root, id_col="vec_id",
                             vec_col="_v", n_cells=16,
                             pq_m=4, pq_k=8, pq_residual=True)
        idx.build(base)
        idx.append(e0, epoch_id=0)
        idx.append(e1, epoch_id=1)
        idx.rebuild()
        out = (idx.probe_batch_adc(qs, k=10, nprobe=4, rerank=50,
                                   id_col="qid", vec_col="_qv")
               .select("query_id", "vec_id",
                       (F.col("cosine_sim") + F.lit(0.0))
                       .alias("cosine_sim"), "rk")
               .localCheckpoint(eager=True))
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


def _oracle_ivf_rebuild_probe(m: int = 4, k: int = 8, ds: int = 16,
                              nprobe: int = 4,
                              rerank: int = 50) -> str:
    """The q275 oracle machinery over the POST-REBUILD state: the
    corpus is base ∪ epoch-0 ∪ shifted epoch-1, and centroids,
    cell assignment AND the residual codebook all derive from that
    full corpus (rebuild trains on everything) — seeds stay the
    lowest ids, which the shifted appends cannot displace, so the
    retrain shows up purely in the codebook/codes."""
    from industrial_data_pipeline_spark.suite_llm import _COS

    def d2(a: str, b: str) -> str:
        return (f"list_aggregate(list_transform(list_zip({a}, {b}),"
                f" p -> (p[1]-p[2])*(p[1]-p[2])), 'sum')")

    def idot(a: str, b: str) -> str:
        return (f"list_aggregate(list_transform(list_zip({a}, {b}),"
                f" p -> p[1]*p[2]), 'sum')")

    cos = _COS.format(a="c.v", b="q.qv")
    ccos = _COS.format(a="seed.cv", b="q.qv")
    cos_c = _COS.format(a="b.v", b="seed.cv")
    return f"""
WITH c0 AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
c AS (SELECT vec_id, v FROM c0 WHERE vec_id < 200
      UNION ALL
      SELECT vec_id, list_transform(v, x -> x + 2.0)
      FROM c0 WHERE vec_id >= 200 AND vec_id < 250),
q AS (SELECT vec_id AS qid, v AS qv FROM c
      WHERE vec_id >= 200 AND vec_id < 210),
seed AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT)
                AS cell, v AS cv
         FROM c ORDER BY vec_id LIMIT 16),
scq AS (SELECT cell, {_QV.format(c='cv')} AS ccq FROM seed),
asg AS (SELECT vec_id, cell FROM
         (SELECT b.vec_id, seed.cell,
                 row_number() OVER (PARTITION BY b.vec_id
                                    ORDER BY {cos_c} DESC, seed.cell)
                     AS rn
          FROM c b CROSS JOIN seed)
       WHERE rn = 1),
probe AS (SELECT qid, cell FROM
            (SELECT q.qid, seed.cell,
                    row_number() OVER (PARTITION BY q.qid
                                       ORDER BY {ccos} DESC,
                                                seed.cell) AS pr
             FROM seed CROSS JOIN q)
          WHERE pr <= {nprobe}),
cq2 AS (SELECT c.vec_id, {_QV.format(c='c.v')} AS pqv, asg.cell
        FROM c JOIN asg ON asg.vec_id = c.vec_id),
cr AS (SELECT cq2.vec_id, cq2.cell,
              list_transform(list_zip(cq2.pqv, scq.ccq),
                             p -> p[1]-p[2]) AS rv
       FROM cq2 JOIN scq USING (cell)),
rsl AS (SELECT cr.vec_id, i AS subspace,
               rv[i*{ds}+1 : i*{ds}+{ds}] AS sq
        FROM cr, UNNEST(generate_series(0, {m - 1})) AS t(i)),
pseeds AS (SELECT CAST(vec_id AS BIGINT) AS code FROM c
           ORDER BY vec_id LIMIT {k}),
pc0 AS (SELECT subspace, pseeds.code, sq AS cq
        FROM rsl JOIN pseeds ON rsl.vec_id = pseeds.code),
pa1 AS (SELECT vec_id, subspace, code FROM (
          SELECT rsl.vec_id, rsl.subspace, pc0.code,
                 row_number() OVER (
                     PARTITION BY rsl.vec_id, rsl.subspace
                     ORDER BY {d2('sq', 'cq')}, pc0.code) AS rn
          FROM rsl JOIN pc0 USING (subspace))
        WHERE rn = 1),
pm1 AS (SELECT subspace, code, ord,
               CAST(floor(CAST(sum(val) AS DOUBLE) / count(*)
                          + 0.5) AS BIGINT) AS mean
        FROM (SELECT pa1.subspace, pa1.code, unnest(rsl.sq) AS val,
                     generate_subscripts(rsl.sq, 1) AS ord
              FROM pa1 JOIN rsl USING (vec_id, subspace))
        GROUP BY 1, 2, 3),
pc1 AS (SELECT subspace, code, list(mean ORDER BY ord) AS cq
        FROM pm1 GROUP BY subspace, code),
enc AS (SELECT vec_id, subspace, code FROM (
          SELECT rsl.vec_id, rsl.subspace, pc1.code,
                 row_number() OVER (
                     PARTITION BY rsl.vec_id, rsl.subspace
                     ORDER BY {d2('sq', 'cq')}, pc1.code) AS rn
          FROM rsl JOIN pc1 USING (subspace))
        WHERE rn = 1),
vn AS (SELECT vec_id,
              list_aggregate(list_transform(pqv, x -> x*x), 'sum')
                  AS vn2
       FROM cq2),
qq AS (SELECT qid, {_QV.format(c='qv')} AS qqv FROM q),
qsl AS (SELECT qid, i AS subspace,
               qqv[i*{ds}+1 : i*{ds}+{ds}] AS sq
        FROM qq, UNNEST(generate_series(0, {m - 1})) AS t(i)),
lut AS (SELECT qsl.qid, qsl.subspace, pc1.code,
               {idot('qsl.sq', 'pc1.cq')} AS qdot
        FROM qsl JOIN pc1 USING (subspace)),
cdp AS (SELECT p.qid, p.cell, {idot('qq.qqv', 'scq.ccq')} AS cdot
        FROM probe p JOIN qq USING (qid) JOIN scq USING (cell)),
qn AS (SELECT qid, list_aggregate(list_transform(qqv, x -> x*x),
                                  'sum') AS qn2
       FROM qq),
adot AS (SELECT p.qid, e.vec_id,
                max(cdp.cdot) + sum(l.qdot) AS ad,
                max(vn.vn2) AS vn2
         FROM probe p
         JOIN cdp ON cdp.qid = p.qid AND cdp.cell = p.cell
         JOIN asg ON asg.cell = p.cell
         JOIN enc e ON e.vec_id = asg.vec_id
         JOIN lut l ON l.qid = p.qid AND l.subspace = e.subspace
                       AND l.code = e.code
         JOIN vn ON vn.vec_id = e.vec_id
         WHERE e.vec_id <> p.qid AND vn.vn2 > 0
         GROUP BY 1, 2),
short AS (SELECT qid, vec_id FROM (
            SELECT a.qid, a.vec_id,
                   row_number() OVER (PARTITION BY a.qid ORDER BY
                       (CAST(ad AS DOUBLE)
                        / (sqrt(CAST(qn2 AS DOUBLE))
                           * sqrt(CAST(vn2 AS DOUBLE)))) DESC,
                       a.vec_id) AS srk
            FROM adot a JOIN qn USING (qid) WHERE qn2 > 0)
          WHERE srk <= {rerank}),
rr AS (SELECT s.qid, s.vec_id, {cos} AS cs
       FROM short s JOIN c ON c.vec_id = s.vec_id
       JOIN q ON q.qid = s.qid)
SELECT qid AS query_id, vec_id,
       round(cs, 6) + 0.0 AS cosine_sim, rk
FROM (SELECT qid, vec_id, cs,
             CAST(row_number() OVER (PARTITION BY qid
                                     ORDER BY cs DESC, vec_id)
                  AS INT) AS rk
      FROM rr)
WHERE rk <= 10
"""


REGISTRY_VECTORS.update({
    "q277_ivf_rebuild_probe": (q_ivf_rebuild_probe,
                               _oracle_ivf_rebuild_probe()),
})


# ------ q283 staleness audit on the RESIDUAL index (q273's monitor
# ------ measuring what residual codes actually reconstruct)

def q_residual_drift_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q273's staleness audit on a RESIDUAL-coded index
    (StoredIvfIndex.quantization_drift with ``pq_residual`` — the
    branch that measures reconstruction error against
    ``quantize(v) − quantize(centroid(cell))``, the quantity the
    codes actually describe): build on base, epoch 0 appends
    in-distribution, epoch 1 appends the every-value+2 shift. The
    shifted epoch's error jumps for a subtler reason than q273's:
    the shift moves vectors' RESIDUALS (their cells' frozen
    centroids stay put), so the residual codebook — trained on
    base residuals — mis-describes them; the audit sees it without
    ever touching raw reconstruction. Oracle replays cell routing,
    residual computation, int-domain training and the per-epoch
    error sums bit-for-bit."""
    import shutil
    import tempfile

    from industrial_data_pipeline_spark.operators.similarity import (
        StoredIvfIndex)
    from industrial_data_pipeline_spark.suite_llm import _load_emb

    emb = _load_emb(spark, sf_dir)
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    base = emb.where(F.col("vec_id") < 150) \
        .select("vec_id", v.alias("_v"))
    e0 = (emb.where((F.col("vec_id") >= 150) & (F.col("vec_id") < 200))
          .select("vec_id", v.alias("_v")))
    e1 = (emb.where((F.col("vec_id") >= 200) & (F.col("vec_id") < 250))
          .select("vec_id",
                  F.transform(v, lambda x: x + F.lit(2.0))
                  .alias("_v")))
    root = tempfile.mkdtemp(prefix="idp_q283_")
    try:
        idx = StoredIvfIndex(spark, root, id_col="vec_id",
                             vec_col="_v", n_cells=16,
                             pq_m=4, pq_k=8, pq_residual=True)
        idx.build(base)
        idx.append(e0, epoch_id=0)
        idx.append(e1, epoch_id=1)
        out = idx.quantization_drift().localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


def _oracle_residual_drift(m: int = 4, k: int = 8,
                           ds: int = 16) -> str:
    from industrial_data_pipeline_spark.suite_llm import _COS

    def d2(a: str, b: str) -> str:
        return (f"list_aggregate(list_transform(list_zip({a}, {b}),"
                f" p -> (p[1]-p[2])*(p[1]-p[2])), 'sum')")

    cos_b = _COS.format(a="b.v", b="seed.cv")
    return f"""
WITH c0 AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
base AS (SELECT vec_id, v FROM c0 WHERE vec_id < 150),
all_rows AS (
  SELECT vec_id, v, -1 AS epoch FROM base
  UNION ALL
  SELECT vec_id, v, 0 FROM c0
  WHERE vec_id >= 150 AND vec_id < 200
  UNION ALL
  SELECT vec_id, list_transform(v, x -> x + 2.0), 1
  FROM c0 WHERE vec_id >= 200 AND vec_id < 250),
seed AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT)
                AS cell, v AS cv
         FROM base ORDER BY vec_id LIMIT 16),
scq AS (SELECT cell, {_QV.format(c='cv')} AS ccq FROM seed),
asg AS (SELECT vec_id, epoch, cell FROM
         (SELECT b.vec_id, b.epoch, seed.cell,
                 row_number() OVER (PARTITION BY b.vec_id
                                    ORDER BY {cos_b} DESC, seed.cell)
                     AS rn
          FROM all_rows b CROSS JOIN seed)
       WHERE rn = 1),
cr AS (SELECT a.vec_id, a.epoch,
              list_transform(list_zip({_QV.format(c='r.v')},
                                      scq.ccq),
                             p -> p[1]-p[2]) AS rv
       FROM asg a JOIN all_rows r
         ON r.vec_id = a.vec_id AND r.epoch = a.epoch
       JOIN scq ON scq.cell = a.cell),
rsl AS (SELECT vec_id, epoch, i AS subspace,
               rv[i*{ds}+1 : i*{ds}+{ds}] AS sq
        FROM cr, UNNEST(generate_series(0, {m - 1})) AS t(i)),
bsl AS (SELECT vec_id, subspace, sq FROM rsl WHERE epoch = -1),
pseeds AS (SELECT CAST(vec_id AS BIGINT) AS code FROM base
           ORDER BY vec_id LIMIT {k}),
pc0 AS (SELECT subspace, pseeds.code, sq AS cq
        FROM bsl JOIN pseeds ON bsl.vec_id = pseeds.code),
pa1 AS (SELECT vec_id, subspace, code FROM (
          SELECT bsl.vec_id, bsl.subspace, pc0.code,
                 row_number() OVER (
                     PARTITION BY bsl.vec_id, bsl.subspace
                     ORDER BY {d2('sq', 'cq')}, pc0.code) AS rn
          FROM bsl JOIN pc0 USING (subspace))
        WHERE rn = 1),
pm1 AS (SELECT subspace, code, ord,
               CAST(floor(CAST(sum(val) AS DOUBLE) / count(*)
                          + 0.5) AS BIGINT) AS mean
        FROM (SELECT pa1.subspace, pa1.code, unnest(bsl.sq) AS val,
                     generate_subscripts(bsl.sq, 1) AS ord
              FROM pa1 JOIN bsl USING (vec_id, subspace))
        GROUP BY 1, 2, 3),
pc1 AS (SELECT subspace, code, list(mean ORDER BY ord) AS cq
        FROM pm1 GROUP BY subspace, code),
perr AS (SELECT vec_id, epoch, subspace,
                min({d2('sq', 'cq')}) AS d2min
         FROM rsl JOIN pc1 USING (subspace)
         GROUP BY 1, 2, 3),
verr AS (SELECT vec_id, epoch,
                CAST(sum(d2min) AS BIGINT) AS err
         FROM perr GROUP BY 1, 2)
SELECT CAST(epoch AS INT) AS epoch, count(*) AS n_vecs,
       round(CAST(CAST(sum(CAST(err AS DECIMAL(38,0)))
                       AS BIGINT) AS DOUBLE)
             / count(*) / 1000000000000.0, 6) AS mean_err,
       round(CAST(max(err) AS DOUBLE) / 1000000000000.0, 6)
           AS max_err
FROM verr GROUP BY epoch
"""


REGISTRY_VECTORS.update({
    "q283_residual_drift_audit": (q_residual_drift_audit,
                                  _oracle_residual_drift()),
})


# ------- q284 probe-coverage audit: the nprobe tuning question

def q_probe_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """StoredIvfIndex.probe_coverage — "is nprobe big enough and
    what does it cost" as a hash-checked query: per query, the
    distinct probed cells, the stored rows inside them (EXACTLY the
    probe's I/O — coverage is that count over the corpus; the
    operator computes it from per-cell counts without reading a
    single vector), and whether the true exact-cosine top-1 lives
    in a probed cell (when false no rerank can recover the miss —
    grow nprobe). Build on base + one appended epoch so the counts
    span the lifecycle. The oracle replays routing, the per-cell
    counts, the exact top-1 and the membership test."""
    import shutil
    import tempfile

    from industrial_data_pipeline_spark.operators.similarity import (
        StoredIvfIndex)
    from industrial_data_pipeline_spark.suite_llm import _load_emb

    emb = _load_emb(spark, sf_dir)
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    base = emb.where(F.col("vec_id") < 150) \
        .select("vec_id", v.alias("_v"))
    batch = (emb.where((F.col("vec_id") >= 150)
                       & (F.col("vec_id") < 250))
             .select("vec_id", v.alias("_v")))
    qs = (base.where(F.col("vec_id") < 10)
          .select(F.col("vec_id").alias("qid"),
                  F.col("_v").alias("_qv"))
          .localCheckpoint(eager=True))
    root = tempfile.mkdtemp(prefix="idp_q284_")
    try:
        idx = StoredIvfIndex(spark, root, id_col="vec_id",
                             vec_col="_v", n_cells=16)
        idx.build(base)
        idx.append(batch, epoch_id=0)
        out = (idx.probe_coverage(qs, nprobe=4, id_col="qid",
                                  vec_col="_qv")
               .localCheckpoint(eager=True))
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


def _oracle_probe_coverage(nq: int = 10, nprobe: int = 4) -> str:
    from industrial_data_pipeline_spark.suite_llm import _COS

    cos = _COS.format(a="cc.v", b="q.qv")
    ccos = _COS.format(a="seed.cv", b="q.qv")
    cos_b = _COS.format(a="b.v", b="seed.cv")
    return f"""
WITH c0 AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
c AS (SELECT vec_id, v FROM c0 WHERE vec_id < 250),
q AS (SELECT vec_id AS qid, v AS qv FROM c0 WHERE vec_id < {nq}),
seed AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT)
                AS cell, v AS cv
         FROM c0 WHERE vec_id < 150 ORDER BY vec_id LIMIT 16),
asg AS (SELECT vec_id, cell FROM
         (SELECT b.vec_id, seed.cell,
                 row_number() OVER (PARTITION BY b.vec_id
                                    ORDER BY {cos_b} DESC, seed.cell)
                     AS rn
          FROM c b CROSS JOIN seed)
       WHERE rn = 1),
probe AS (SELECT qid, cell FROM
            (SELECT q.qid, seed.cell,
                    row_number() OVER (PARTITION BY q.qid
                                       ORDER BY {ccos} DESC,
                                                seed.cell) AS pr
             FROM seed CROSS JOIN q)
          WHERE pr <= {nprobe}),
counts AS (SELECT cell, count(*) AS n FROM asg GROUP BY cell),
-- LEFT join (ADVICE r11, mirrors the operator): a probed-but-empty
-- cell still counts in n_probed_cells, and an all-empty probe set
-- still emits a row with covered_rows 0
cov AS (SELECT p.qid, count(*) AS n_probed_cells,
               CAST(coalesce(sum(counts.n), 0) AS BIGINT)
                   AS covered_rows
        FROM probe p LEFT JOIN counts USING (cell) GROUP BY 1),
tot AS (SELECT count(*) AS total_rows FROM c),
t1 AS (SELECT qid, vec_id FROM (
         SELECT q.qid, cc.vec_id,
                row_number() OVER (PARTITION BY q.qid
                                   ORDER BY {cos} DESC, cc.vec_id)
                    AS rk
         FROM c cc CROSS JOIN q WHERE cc.vec_id <> q.qid)
       WHERE rk = 1),
hit AS (SELECT t1.qid, TRUE AS top1_in_probe
        FROM t1 JOIN asg ON asg.vec_id = t1.vec_id
        JOIN probe p ON p.qid = t1.qid AND p.cell = asg.cell)
SELECT cov.qid AS query_id, cov.n_probed_cells, cov.covered_rows,
       tot.total_rows,
       round(CAST(cov.covered_rows AS DOUBLE)
             / CAST(tot.total_rows AS DOUBLE), 6) AS coverage,
       coalesce(hit.top1_in_probe, FALSE) AS top1_in_probe
FROM cov CROSS JOIN tot
LEFT JOIN hit ON hit.qid = cov.qid
"""


REGISTRY_VECTORS.update({
    "q284_probe_coverage": (q_probe_coverage,
                            _oracle_probe_coverage()),
})


# ------- q285 guaranteed-k filtered ANN, brute-the-stratum path
# ------- (VERDICT r11 item 1: the rare-stratum RAG contract gap)

def q_guaranteed_k_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``probe_batch(min_results=k)`` on a RARE stratum: the index
    carries a derived rare label (vec_id % 17 = 3 → ~15 of 250
    rows); at nprobe=1 the plain pre-filter would under-deliver
    (the probed cell rarely holds 10 stratum rows), and the
    escalation's candidate-mass counts (driver-side, no vectors
    read) see stratum_total ≤ brute_force_threshold — so the
    routing becomes exactly the cells CONTAINING the stratum and
    the result is the EXACT top-k over the stratum (the q151
    contract), full k per query. The oracle needs no routing CTEs
    at all: label equality + self-exclusion + the unrounded-cosine
    rank — byte-equality proves the brute path delivers exact
    stratum retrieval through the partition-pruned asset."""
    import shutil
    import tempfile

    from industrial_data_pipeline_spark.operators.similarity import (
        StoredIvfIndex)
    from industrial_data_pipeline_spark.suite_llm import _load_emb

    emb = _load_emb(spark, sf_dir)
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    rl = F.when(F.col("vec_id") % 17 == 3, F.lit(1)) \
        .otherwise(F.lit(0)).cast("int")
    base = emb.where(F.col("vec_id") < 150) \
        .select("vec_id", v.alias("_v"), rl.alias("rl"))
    batch = (emb.where((F.col("vec_id") >= 150)
                       & (F.col("vec_id") < 250))
             .select("vec_id", v.alias("_v"), rl.alias("rl")))
    qs = (base.where((F.col("rl") == 1) & (F.col("vec_id") < 60))
          .select(F.col("vec_id").alias("qid"),
                  F.col("_v").alias("_qv"), "rl")
          .localCheckpoint(eager=True))
    root = tempfile.mkdtemp(prefix="idp_q285_")
    try:
        idx = StoredIvfIndex(spark, root, id_col="vec_id",
                             vec_col="_v", n_cells=16,
                             extra_schema="rl int")
        idx.build(base)
        idx.append(batch, epoch_id=0)
        out = (idx.probe_batch(qs, k=10, nprobe=1, id_col="qid",
                               vec_col="_qv", filter_col="rl",
                               min_results=10)
               .select("query_id", "vec_id",
                       (F.col("cosine_sim") + F.lit(0.0))
                       .alias("cosine_sim"), "rk")
               .localCheckpoint(eager=True))
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


def _oracle_guaranteed_k_probe() -> str:
    from industrial_data_pipeline_spark.suite_llm import _COS

    cos = _COS.format(a="cc.v", b="q.qv")
    return f"""
WITH c0 AS (SELECT vec_id, embedding::DOUBLE[] AS v,
                   CASE WHEN vec_id % 17 = 3 THEN 1 ELSE 0 END AS rl
            FROM embeddings),
c AS (SELECT * FROM c0 WHERE vec_id < 250),
q AS (SELECT vec_id AS qid, v AS qv FROM c0
      WHERE vec_id < 60 AND rl = 1),
cand AS (SELECT q.qid, cc.vec_id, {cos} AS cs
         FROM c cc CROSS JOIN q
         WHERE cc.vec_id <> q.qid AND cc.rl = 1)
SELECT qid AS query_id, vec_id,
       round(cs, 6) + 0.0 AS cosine_sim, rk
FROM (SELECT qid, vec_id, cs,
             CAST(row_number() OVER (PARTITION BY qid
                                     ORDER BY cs DESC, vec_id)
                  AS INT) AS rk
      FROM cand)
WHERE rk <= 10
"""


# ------- q286 guaranteed-k filtered ANN, prefix-ESCALATION path
# ------- (cumulative candidate-mass widening, SQL-replayed)

def q_escalated_prefix_probe(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """The OTHER escalation path: ``brute_force_threshold=0``
    disables the small-stratum shortcut, so every query walks its
    full centroid-cosine cell ranking and takes the shortest prefix
    that is ≥ nprobe cells AND holds cumulative stratum mass ≥
    min_results + 1 (the +1 absorbs a possible stored self-row),
    zero-mass prefix cells dropped from the routing (no candidate
    can live there — results identical, I/O strictly less). The
    oracle replays the whole contract: per-cell stratum counts, the
    per-query cell ranking, a cumulative-sum window for the prefix
    length, then the exact cosine rank over stratum rows inside the
    prefix — byte-equality pins that escalation widens by EXACTLY
    the contract's cells, not 'until it happened to work'."""
    import shutil
    import tempfile

    from industrial_data_pipeline_spark.operators.similarity import (
        StoredIvfIndex)
    from industrial_data_pipeline_spark.suite_llm import _load_emb

    emb = _load_emb(spark, sf_dir)
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    rl = F.when(F.col("vec_id") % 17 == 3, F.lit(1)) \
        .otherwise(F.lit(0)).cast("int")
    base = emb.where(F.col("vec_id") < 150) \
        .select("vec_id", v.alias("_v"), rl.alias("rl"))
    batch = (emb.where((F.col("vec_id") >= 150)
                       & (F.col("vec_id") < 250))
             .select("vec_id", v.alias("_v"), rl.alias("rl")))
    qs = (base.where((F.col("rl") == 0) & (F.col("vec_id") < 6))
          .select(F.col("vec_id").alias("qid"),
                  F.col("_v").alias("_qv"), "rl")
          .localCheckpoint(eager=True))
    root = tempfile.mkdtemp(prefix="idp_q286_")
    try:
        idx = StoredIvfIndex(spark, root, id_col="vec_id",
                             vec_col="_v", n_cells=16,
                             extra_schema="rl int")
        idx.build(base)
        idx.append(batch, epoch_id=0)
        out = (idx.probe_batch(qs, k=10, nprobe=2, id_col="qid",
                               vec_col="_qv", filter_col="rl",
                               min_results=10,
                               brute_force_threshold=0)
               .select("query_id", "vec_id",
                       (F.col("cosine_sim") + F.lit(0.0))
                       .alias("cosine_sim"), "rk")
               .localCheckpoint(eager=True))
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


def _oracle_escalated_prefix_probe(nq: int = 6, nprobe: int = 2,
                                   need: int = 11) -> str:
    from industrial_data_pipeline_spark.suite_llm import _COS

    cos = _COS.format(a="cc.v", b="q.qv")
    ccos = _COS.format(a="seed.cv", b="q.qv")
    cos_b = _COS.format(a="b.v", b="seed.cv")
    return f"""
WITH c0 AS (SELECT vec_id, embedding::DOUBLE[] AS v,
                   CASE WHEN vec_id % 17 = 3 THEN 1 ELSE 0 END AS rl
            FROM embeddings),
base AS (SELECT * FROM c0 WHERE vec_id < 150),
c AS (SELECT * FROM c0 WHERE vec_id < 250),
q AS (SELECT vec_id AS qid, v AS qv FROM base
      WHERE vec_id < {nq} AND rl = 0),
seed AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT)
                AS cell, v AS cv
         FROM base ORDER BY vec_id LIMIT 16),
asg AS (SELECT vec_id, cell FROM
         (SELECT b.vec_id, seed.cell,
                 row_number() OVER (PARTITION BY b.vec_id
                                    ORDER BY {cos_b} DESC, seed.cell)
                     AS rn
          FROM c b CROSS JOIN seed)
       WHERE rn = 1),
mass AS (SELECT asg.cell, count(*) AS n
         FROM asg JOIN c ON c.vec_id = asg.vec_id
         WHERE c.rl = 0 GROUP BY asg.cell),
ranked AS (SELECT q.qid, seed.cell,
                  row_number() OVER (PARTITION BY q.qid
                                     ORDER BY {ccos} DESC,
                                              seed.cell) AS pr
           FROM seed CROSS JOIN q),
cum AS (SELECT r.qid, r.cell, r.pr,
               sum(coalesce(m.n, 0)) OVER (PARTITION BY r.qid
                                           ORDER BY r.pr) AS cm
        FROM ranked r LEFT JOIN mass m ON m.cell = r.cell),
pl AS (SELECT qid,
              coalesce(min(pr) FILTER (WHERE pr >= {nprobe}
                                       AND cm >= {need}), 16) AS L
       FROM cum GROUP BY qid),
probe AS (SELECT cum.qid, cum.cell
          FROM cum JOIN pl ON pl.qid = cum.qid
          WHERE cum.pr <= pl.L),
cand AS (SELECT p.qid, cc.vec_id, {cos} AS cs
         FROM probe p
         JOIN asg ON asg.cell = p.cell
         JOIN c cc ON cc.vec_id = asg.vec_id
         JOIN q ON q.qid = p.qid
         WHERE cc.vec_id <> p.qid AND cc.rl = 0)
SELECT qid AS query_id, vec_id,
       round(cs, 6) + 0.0 AS cosine_sim, rk
FROM (SELECT qid, vec_id, cs,
             CAST(row_number() OVER (PARTITION BY qid
                                     ORDER BY cs DESC, vec_id)
                  AS INT) AS rk
      FROM cand)
WHERE rk <= 10
"""


REGISTRY_VECTORS.update({
    "q285_guaranteed_k_probe": (q_guaranteed_k_probe,
                                _oracle_guaranteed_k_probe()),
    "q286_escalated_prefix_probe": (q_escalated_prefix_probe,
                                    _oracle_escalated_prefix_probe()),
})


# ------- q299 UNFILTERED guaranteed-k (VERDICT r12 item 4: the
# ------- same escalation contract with no filter column — the
# ------- under-delivery corner is probed cells EMPTIED by
# ------- retraction on a skewed index)

def q_unfiltered_guaranteed_k(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """``probe_batch(min_results=k)`` with NO ``filter_col``: build
    on 250 vectors, then retract every id except ``vec_id % 9 = 2``
    (28 survivors) — most of the 16 cells are now EMPTY, so a plain
    ``nprobe=1`` probe whose top cell was emptied silently returns
    fewer than k (often zero). With ``min_results=10`` the
    escalation counts per-cell TOTAL mass from the partition column
    alone (the mass scan reads NO data columns — row counts come
    from parquet footers), sees total 28 ≤ brute_force_threshold,
    and probes exactly the non-empty cells: the result is the EXACT
    top-k over the surviving corpus, full k per query. The oracle
    needs no routing CTEs: survivors + self-exclusion + the
    unrounded-cosine rank. The plain-probe under-delivery contrast
    and the no-data-columns mass-scan plan are pinned in
    tests/test_similarity.py / tests/test_plans.py."""
    import shutil
    import tempfile

    from industrial_data_pipeline_spark.operators.similarity import (
        StoredIvfIndex)
    from industrial_data_pipeline_spark.suite_llm import _load_emb

    emb = _load_emb(spark, sf_dir)
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    base = emb.where(F.col("vec_id") < 250) \
        .select("vec_id", v.alias("_v"))
    qs = (base.where((F.col("vec_id") % 9 == 2)
                     & (F.col("vec_id") < 30))
          .select(F.col("vec_id").alias("qid"),
                  F.col("_v").alias("_qv"))
          .localCheckpoint(eager=True))
    root = tempfile.mkdtemp(prefix="idp_q299_")
    try:
        idx = StoredIvfIndex(spark, root, id_col="vec_id",
                             vec_col="_v", n_cells=16)
        idx.build(base)
        idx.retract([i for i in range(250) if i % 9 != 2])
        out = (idx.probe_batch(qs, k=10, nprobe=1, id_col="qid",
                               vec_col="_qv", min_results=10)
               .select("query_id", "vec_id",
                       (F.col("cosine_sim") + F.lit(0.0))
                       .alias("cosine_sim"), "rk")
               .localCheckpoint(eager=True))
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


def _oracle_unfiltered_guaranteed_k() -> str:
    from industrial_data_pipeline_spark.suite_llm import _COS

    cos = _COS.format(a="cc.v", b="q.qv")
    return f"""
WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
           WHERE vec_id < 250 AND vec_id % 9 = 2),
q AS (SELECT vec_id AS qid, v AS qv FROM c WHERE vec_id < 30),
cand AS (SELECT q.qid, cc.vec_id, {cos} AS cs
         FROM c cc CROSS JOIN q
         WHERE cc.vec_id <> q.qid)
SELECT qid AS query_id, vec_id,
       round(cs, 6) + 0.0 AS cosine_sim, rk
FROM (SELECT qid, vec_id, cs,
             CAST(row_number() OVER (PARTITION BY qid
                                     ORDER BY cs DESC, vec_id)
                  AS INT) AS rk
      FROM cand)
WHERE rk <= 10
"""


REGISTRY_VECTORS.update({
    "q299_unfiltered_guaranteed_k": (q_unfiltered_guaranteed_k,
                                     _oracle_unfiltered_guaranteed_k()),
})


# ------- q290 int8-only fast path recall A/B (rerank=0 — the
# ------- VERDICT r11 stretch, the q276 pattern on the warm tier)

def q_sq_rerank0_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``probe_batch_sq(rerank=0)`` — the sanctioned int8-only fast
    path (no stage 2, no vector column ever read) — A/B'd against
    the exact probe per query: (query_id, n_hits, recall) with all
    cells probed so routing drops out and the comparison isolates
    the QUANTIZED ORDER. Both rankings replay in SQL exactly: the
    int8 codes are a pure map (clamp(floor(x·127/max|x| + 0.5))),
    the fast cosine an exact int64 dot over them, the exact cosine
    the standard chain — so the oracle recomputes BOTH top-10 sets
    and their intersection. The measured failure boundary (order
    flips only under ~1e-3 k-boundary cosine gaps) lives in
    tools/sq_rerank0_result.json; this query pins the real-corpus
    recall the docstring cites."""
    import shutil
    import tempfile

    from industrial_data_pipeline_spark.operators.similarity import (
        StoredIvfIndex)
    from industrial_data_pipeline_spark.suite_llm import _load_emb

    emb = _load_emb(spark, sf_dir)
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    base = emb.where(F.col("vec_id") < 250) \
        .select("vec_id", v.alias("_v"))
    qs = (base.where(F.col("vec_id") < 10)
          .select(F.col("vec_id").alias("qid"),
                  F.col("_v").alias("_qv"))
          .localCheckpoint(eager=True))
    root = tempfile.mkdtemp(prefix="idp_q290_")
    try:
        idx = StoredIvfIndex(spark, root, id_col="vec_id",
                             vec_col="_v", n_cells=16,
                             sq_int8=True)
        idx.build(base)
        fast = (idx.probe_batch_sq(qs, k=10, nprobe=16, rerank=0,
                                   id_col="qid", vec_col="_qv")
                .select("query_id", "vec_id"))
        exact = (idx.probe_batch(qs, k=10, nprobe=16, id_col="qid",
                                 vec_col="_qv")
                 .select("query_id", "vec_id"))
        out = (exact.join(fast, ["query_id", "vec_id"], "left_semi")
               .groupBy("query_id")
               .agg(F.count("*").alias("n_hits"))
               .join(exact.select("query_id").distinct(),
                     "query_id", "right")
               .select("query_id",
                       F.coalesce("n_hits", F.lit(0))
                       .alias("n_hits"))
               .select("query_id", "n_hits",
                       (F.col("n_hits").cast("double") / F.lit(10.0))
                       .alias("recall"))
               .localCheckpoint(eager=True))
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


def _oracle_sq_rerank0_recall(nq: int = 10) -> str:
    from industrial_data_pipeline_spark.suite_llm import _COS

    def idot(a: str, b: str) -> str:
        return (f"list_aggregate(list_transform(list_zip({a}, {b}),"
                f" p -> p[1]*p[2]), 'sum')")

    cos = _COS.format(a="c.v", b="q.qv")
    return f"""
WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
           WHERE vec_id < 250),
q AS (SELECT vec_id AS qid, v AS qv,
             list_transform(v, x -> CAST(floor(x * 1000000 + 0.5)
                                         AS BIGINT)) AS qi
      FROM c WHERE vec_id < {nq}),
qn AS (SELECT qid, {idot('qi', 'qi')} AS qn2 FROM q),
q8t AS (SELECT vec_id,
               list_transform(v, x -> greatest(CAST(-127 AS BIGINT),
                   least(CAST(127 AS BIGINT),
                         CAST(floor(x * (CASE WHEN amax > 0
                                         THEN 127.0 / amax
                                         ELSE 1.0 END) + 0.5)
                              AS BIGINT)))) AS q8
        FROM (SELECT vec_id, v,
                     list_max(list_transform(v, x -> abs(x)))
                         AS amax
              FROM c)),
q8n AS (SELECT vec_id,
               list_aggregate(list_transform(q8, x -> x * x),
                              'sum') AS q8n2
        FROM q8t),
fast AS (SELECT qid, vec_id FROM (
           SELECT q.qid, t.vec_id,
                  row_number() OVER (PARTITION BY q.qid ORDER BY
                      (CAST({idot('t.q8', 'q.qi')} AS DOUBLE)
                       / (sqrt(CAST(qn.qn2 AS DOUBLE))
                          * sqrt(CAST(n.q8n2 AS DOUBLE)))) DESC,
                      t.vec_id) AS rk
           FROM q8t t JOIN q8n n USING (vec_id)
           CROSS JOIN q JOIN qn USING (qid)
           WHERE t.vec_id <> q.qid AND n.q8n2 > 0 AND qn.qn2 > 0)
         WHERE rk <= 10),
ex AS (SELECT qid, vec_id FROM (
         SELECT q.qid, c.vec_id,
                row_number() OVER (PARTITION BY q.qid
                                   ORDER BY {cos} DESC, c.vec_id)
                    AS rk
         FROM c CROSS JOIN q WHERE c.vec_id <> q.qid)
       WHERE rk <= 10),
hits AS (SELECT qid, count(*) AS n FROM ex
         JOIN fast USING (qid, vec_id) GROUP BY 1)
SELECT q.qid AS query_id,
       CAST(coalesce(hits.n, 0) AS BIGINT) AS n_hits,
       CAST(coalesce(hits.n, 0) AS DOUBLE) / 10.0 AS recall
FROM q LEFT JOIN hits ON hits.qid = q.qid
"""


REGISTRY_VECTORS.update({
    "q290_sq_rerank0_recall": (q_sq_rerank0_recall,
                               _oracle_sq_rerank0_recall()),
})


# ------- q291 cell-balance audit: the OTHER IVF tuning signal
# ------- (skewed cells = straggler probes) next to q284's nprobe

def q_cell_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """StoredIvfIndex.cell_balance over a built+appended asset: one
    row of exact counts — total/empty cells, total/max-cell rows —
    plus the FAISS-style imbalance factor max·n_cells/total (1.0
    uniform; n_cells means one hot cell holds everything, and every
    probe touching it pays near-full-scan I/O with a straggler
    task). Empty cells are counted against the full 0..n_cells-1
    range (a data-only groupBy cannot see them — the q284 ADVICE
    lesson applied from birth). The oracle replays routing, the
    per-cell counts, the empty-cell join and the one float
    division."""
    import shutil
    import tempfile

    from industrial_data_pipeline_spark.operators.similarity import (
        StoredIvfIndex)
    from industrial_data_pipeline_spark.suite_llm import _load_emb

    emb = _load_emb(spark, sf_dir)
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    base = emb.where(F.col("vec_id") < 150) \
        .select("vec_id", v.alias("_v"))
    batch = (emb.where((F.col("vec_id") >= 150)
                       & (F.col("vec_id") < 250))
             .select("vec_id", v.alias("_v")))
    root = tempfile.mkdtemp(prefix="idp_q291_")
    try:
        idx = StoredIvfIndex(spark, root, id_col="vec_id",
                             vec_col="_v", n_cells=16)
        idx.build(base)
        idx.append(batch, epoch_id=0)
        out = idx.cell_balance().localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


def _oracle_cell_balance() -> str:
    from industrial_data_pipeline_spark.suite_llm import _COS

    cos_b = _COS.format(a="b.v", b="seed.cv")
    return f"""
WITH c0 AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
c AS (SELECT vec_id, v FROM c0 WHERE vec_id < 250),
seed AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT)
                AS cell, v AS cv
         FROM c0 WHERE vec_id < 150 ORDER BY vec_id LIMIT 16),
asg AS (SELECT vec_id, cell FROM
         (SELECT b.vec_id, seed.cell,
                 row_number() OVER (PARTITION BY b.vec_id
                                    ORDER BY {cos_b} DESC, seed.cell)
                     AS rn
          FROM c b CROSS JOIN seed)
       WHERE rn = 1),
counts AS (SELECT cell, count(*) AS n FROM asg GROUP BY 1),
cells AS (SELECT CAST(unnest(generate_series(0, 15)) AS INT)
              AS cell),
per AS (SELECT cells.cell, coalesce(counts.n, 0) AS n
        FROM cells LEFT JOIN counts USING (cell))
SELECT CAST(count(*) AS BIGINT) AS n_cells_total,
       CAST(sum(CASE WHEN n = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_cells_empty,
       CAST(sum(n) AS BIGINT) AS total_rows,
       CAST(max(n) AS BIGINT) AS max_cell_rows,
       round(CAST(max(n) * count(*) AS DOUBLE)
             / nullif(CAST(sum(n) AS DOUBLE), 0.0), 6) AS imbalance
FROM per
"""


# ------- q292 recall-vs-nprobe tuning curve (the question q284's
# ------- coverage audit informs, answered as measured recall)

def q_recall_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """StoredIvfIndex.recall_curve: per nprobe ∈ (1, 2, 4, 8) the
    pruned batch probe's top-10 against the exact all-cells top-10,
    hit counts pooled over the query batch — the empirical
    'what nprobe buys recall X' curve a production IVF tunes by,
    here hash-checked end-to-end. The oracle replays the exact
    ground truth once and each curve point's routing + rank,
    per-nprobe rows unioned."""
    import shutil
    import tempfile

    from industrial_data_pipeline_spark.operators.similarity import (
        StoredIvfIndex)
    from industrial_data_pipeline_spark.suite_llm import _load_emb

    emb = _load_emb(spark, sf_dir)
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    base = emb.where(F.col("vec_id") < 150) \
        .select("vec_id", v.alias("_v"))
    batch = (emb.where((F.col("vec_id") >= 150)
                       & (F.col("vec_id") < 250))
             .select("vec_id", v.alias("_v")))
    qs = (base.where(F.col("vec_id") < 10)
          .select(F.col("vec_id").alias("qid"),
                  F.col("_v").alias("_qv"))
          .localCheckpoint(eager=True))
    root = tempfile.mkdtemp(prefix="idp_q292_")
    try:
        idx = StoredIvfIndex(spark, root, id_col="vec_id",
                             vec_col="_v", n_cells=16)
        idx.build(base)
        idx.append(batch, epoch_id=0)
        out = (idx.recall_curve(qs, k=10, nprobes=(1, 2, 4, 8),
                                id_col="qid", vec_col="_qv")
               .localCheckpoint(eager=True))
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


def _oracle_recall_curve(nq: int = 10,
                         nprobes: tuple = (1, 2, 4, 8)) -> str:
    from industrial_data_pipeline_spark.suite_llm import _COS

    cos = _COS.format(a="cc.v", b="q.qv")
    ccos = _COS.format(a="seed.cv", b="q.qv")
    cos_b = _COS.format(a="b.v", b="seed.cv")
    arms = []
    for np_ in nprobes:
        arms.append(f"""
SELECT {np_} AS nprobe,
       CAST((SELECT count(*) FROM truth t
             JOIN cand{np_} p USING (qid, vec_id)) AS BIGINT)
           AS n_hits,
       CAST((SELECT count(*) FROM truth) AS BIGINT) AS n_truth,
       round(CAST((SELECT count(*) FROM truth t
                   JOIN cand{np_} p USING (qid, vec_id)) AS DOUBLE)
             / nullif(CAST((SELECT count(*) FROM truth) AS DOUBLE),
                      0.0), 6) AS recall""")
    cands = []
    for np_ in nprobes:
        cands.append(f"""
probe{np_} AS (SELECT qid, cell FROM ranked WHERE pr <= {np_}),
cand{np_} AS (SELECT qid, vec_id FROM (
         SELECT p.qid, cc.vec_id,
                row_number() OVER (PARTITION BY p.qid
                                   ORDER BY {cos} DESC, cc.vec_id)
                    AS rk
         FROM probe{np_} p
         JOIN asg ON asg.cell = p.cell
         JOIN c cc ON cc.vec_id = asg.vec_id
         JOIN q ON q.qid = p.qid
         WHERE cc.vec_id <> p.qid)
       WHERE rk <= 10)""")
    return f"""
WITH c0 AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
c AS (SELECT vec_id, v FROM c0 WHERE vec_id < 250),
q AS (SELECT vec_id AS qid, v AS qv FROM c0 WHERE vec_id < {nq}),
seed AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT)
                AS cell, v AS cv
         FROM c0 WHERE vec_id < 150 ORDER BY vec_id LIMIT 16),
asg AS (SELECT vec_id, cell FROM
         (SELECT b.vec_id, seed.cell,
                 row_number() OVER (PARTITION BY b.vec_id
                                    ORDER BY {cos_b} DESC, seed.cell)
                     AS rn
          FROM c b CROSS JOIN seed)
       WHERE rn = 1),
ranked AS (SELECT q.qid, seed.cell,
                  row_number() OVER (PARTITION BY q.qid
                                     ORDER BY {ccos} DESC,
                                              seed.cell) AS pr
           FROM seed CROSS JOIN q),
truth AS (SELECT qid, vec_id FROM (
         SELECT q.qid, cc.vec_id,
                row_number() OVER (PARTITION BY q.qid
                                   ORDER BY {cos} DESC, cc.vec_id)
                    AS rk
         FROM c cc CROSS JOIN q WHERE cc.vec_id <> q.qid)
       WHERE rk <= 10),
{",".join(x.lstrip() for x in cands)}
{" UNION ALL ".join(arms)}
"""


REGISTRY_VECTORS.update({
    "q291_cell_balance": (q_cell_balance, _oracle_cell_balance()),
    "q292_recall_curve": (q_recall_curve, _oracle_recall_curve()),
})


# ------- q296 guaranteed-k on the ADC tier: min_results composed
# ------- with the two-stage code-column probe (q285's contract,
# ------- q271's I/O shape)

def q_guaranteed_k_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q285's rare-stratum scenario probed through
    ``probe_batch_adc(min_results=k)``: the escalation guarantees ≥
    min_results stratum rows enter the STAGE-1 ADC ranking, and with
    ``rerank`` ≥ the stratum size the exact re-rank covers the whole
    stratum — so the two-stage code-column probe must return exactly
    the stratum's exact top-k (q285's oracle VERBATIM: brute path,
    no routing CTEs). Pins that the guarantee composes with the
    tiered probes, not just the exact one: the stage-1 shortlist
    window can never starve a rare stratum the escalation routed
    in."""
    import shutil
    import tempfile

    from industrial_data_pipeline_spark.operators.similarity import (
        StoredIvfIndex)
    from industrial_data_pipeline_spark.suite_llm import _load_emb

    emb = _load_emb(spark, sf_dir)
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    rl = F.when(F.col("vec_id") % 17 == 3, F.lit(1)) \
        .otherwise(F.lit(0)).cast("int")
    base = emb.where(F.col("vec_id") < 150) \
        .select("vec_id", v.alias("_v"), rl.alias("rl"))
    batch = (emb.where((F.col("vec_id") >= 150)
                       & (F.col("vec_id") < 250))
             .select("vec_id", v.alias("_v"), rl.alias("rl")))
    qs = (base.where((F.col("rl") == 1) & (F.col("vec_id") < 60))
          .select(F.col("vec_id").alias("qid"),
                  F.col("_v").alias("_qv"), "rl")
          .localCheckpoint(eager=True))
    root = tempfile.mkdtemp(prefix="idp_q296_")
    try:
        idx = StoredIvfIndex(spark, root, id_col="vec_id",
                             vec_col="_v", n_cells=16,
                             pq_m=2, pq_k=4, pq_residual=True,
                             extra_schema="rl int")
        idx.build(base)
        idx.append(batch, epoch_id=0)
        out = (idx.probe_batch_adc(qs, k=10, nprobe=1, rerank=40,
                                   id_col="qid", vec_col="_qv",
                                   filter_col="rl", min_results=10)
               .select("query_id", "vec_id",
                       (F.col("cosine_sim") + F.lit(0.0))
                       .alias("cosine_sim"), "rk")
               .localCheckpoint(eager=True))
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


REGISTRY_VECTORS.update({
    # oracle: exact top-k over the stratum — q285's, verbatim (the
    # ADC tier must land on the same bytes)
    "q296_guaranteed_k_adc": (q_guaranteed_k_adc,
                              _oracle_guaranteed_k_probe()),
})
