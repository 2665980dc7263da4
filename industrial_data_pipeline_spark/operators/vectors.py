"""Vector / embedding analytics: distributed Lloyd k-means, int8
scalar quantization, per-label cohesion, top-1 neighbor confusion.

All of it runs on the DataFrame API — the embedding column stays an
array, per-vector math is a sequential higher-order-function fold
(deterministic left-to-right double summation, bitwise-reproducible
across engines), and the only shuffles are the per-cluster/per-label
aggregations.

Cross-engine determinism rules (same as the money/decimal discipline
in suite_olap.py):
- k-means ASSIGNMENT distances run in scaled integers
  (floor(x·1e6 + 0.5) per dim, int64 squared-diff sums) — exact under
  any summation order, so the argmin never flips on a last-ulp.
- centroid means: exact DECIMAL sums divided ONCE in double. A binary
  double never sits exactly on a decimal rounding boundary (k/2^n is
  never m·5/10^p), so the decimal cast is deterministic too.
- cosine similarities follow the q28 pattern: sequential double fold
  on both engines, rounded at the very end.

At 100 TB: k·d centroids are a broadcast (bytes); assignment is a
map-only stage over the fact; the update is one map-side-combinable
groupBy(cluster, dim). Iterations localCheckpoint the (tiny) centroid
frame so lineage doesn't stack across rounds.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_SCALE = 1_000_000  # 1e-6 assignment grid (see module docstring)


def _as_double(c: Column) -> Column:
    return F.transform(c, lambda x: x.cast("double"))


def _quantize(c: Column) -> Column:
    """floor(x·1e6 + 0.5) per dim — deterministic round-half-up that
    both Spark and DuckDB express identically (no banker's rounding)."""
    return F.transform(
        c, lambda x: F.floor(x.cast("double") * _SCALE + F.lit(0.5))
        .cast("long"))


def _d2_scaled(a: Column, b: Column) -> Column:
    """Exact int64 squared L2 distance between two quantized vectors.
    64 dims × (2·10^7)² ≈ 2.6e16 ≪ int64 max — no overflow."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"), lambda acc, x: acc + x)


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def _cos(a: Column, b: Column) -> Column:
    return _dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b)))


def _lloyd_assign(df: DataFrame, k: int, iters: int,
                  id_col: str, vec_col: str) -> DataFrame:
    """Shared Lloyd loop → final assignment (_id, cluster, _d2).
    Deterministic init from the k lowest ids; exact integer argmin
    (ties → lowest cluster id); means via exact DECIMAL sums."""
    emb = df.select(F.col(id_col).alias("_id"),
                    _as_double(F.col(vec_col)).alias("_v")) \
        .withColumn("_q", _quantize(F.col("_v")))
    # genuinely the k LOWEST ids (the ivf_build pattern) — the old
    # `_id < k` filter assumed ids start at 0 and silently seeded
    # fewer than k centroids (or none) on any other id space
    cents = (emb.orderBy("_id").limit(k)
             .select(F.col("_id").cast("long").alias("cluster"),
                     F.col("_q").alias("_cq")).localCheckpoint())

    assign = None
    for _ in range(iters):
        assign = (
            emb.crossJoin(F.broadcast(cents))
            .withColumn("_d2", _d2_scaled(F.col("_q"), F.col("_cq")))
            .groupBy("_id")
            .agg(F.min(F.struct("_d2", "cluster")).alias("_m"))
            .select("_id", F.col("_m.cluster").alias("cluster"),
                    F.col("_m._d2").alias("_d2")))
        means = (
            assign.join(emb, "_id")
            .select("cluster", F.posexplode("_v").alias("_pos", "_x"))
            .groupBy("cluster", "_pos")
            .agg((F.sum(F.col("_x").cast("decimal(28,12)"))
                  .cast("double")
                  / F.count("*")).alias("_mean")))
        cents = (means.groupBy("cluster")
                 .agg(F.transform(
                     F.sort_array(F.collect_list(
                         F.struct("_pos", "_mean"))),
                     lambda s: s["_mean"]).alias("_c"))
                 .select("cluster", _quantize(F.col("_c")).alias("_cq"))
                 .localCheckpoint())

    return assign


def kmeans_lloyd(df: DataFrame, k: int = 4, iters: int = 2,
                 id_col: str = "vec_id",
                 vec_col: str = "embedding") -> DataFrame:
    """Lloyd's k-means, deterministically initialized from the k lowest
    ids. Returns (cluster, n_points, inertia) — inertia is the exact
    scaled-int squared-distance sum, descaled once in double.

    Each iteration: broadcast the k·d centroid frame, assign by exact
    integer argmin (ties → lowest cluster id), recompute means with
    exact DECIMAL sums. No data-sized collect — the only driver-side
    state is the iteration counter.
    """
    assign = _lloyd_assign(df, k, iters, id_col, vec_col)
    return (assign.groupBy("cluster")
            .agg(F.count("*").alias("n_points"),
                 F.round((F.sum("_d2").cast("double")
                          / F.lit(float(_SCALE) * _SCALE)), 6)
                 .alias("inertia")))


def kmeans_assign(df: DataFrame, k: int = 4, iters: int = 2,
                  id_col: str = "vec_id",
                  vec_col: str = "embedding") -> DataFrame:
    """Final cluster per vector — (id_col, cluster)."""
    return (_lloyd_assign(df, k, iters, id_col, vec_col)
            .select(F.col("_id").alias(id_col), "cluster"))


def semantic_dedup_pairs(df: DataFrame, k: int = 4, iters: int = 2,
                         threshold: float = 0.9,
                         id_col: str = "vec_id",
                         vec_col: str = "embedding",
                         round_dp: int = 6) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    near-duplicate pairs via cluster-scoped cosine — embed → k-means →
    compare pairs only WITHIN each cell. The pair join shuffles on the
    cluster id and costs Σ|cell|² instead of the corpus n² that
    cosine_pairs_bruteforce pays, which is the whole trick that made
    semantic dedup feasible on LAION-scale corpora: k grows with the
    corpus so cells stay bounded.

    Returns (id_a, id_b, cluster, cosine_sim ≥ threshold), id_a <
    id_b. Norms precomputed per vector (same expression shapes as
    cosine_pairs_bruteforce, so the SQL oracle replays bit-for-bit);
    misses only cross-cell pairs — the documented SemDeDup recall
    trade, bounded in tests against the brute-force pair set.
    """
    assign = kmeans_assign(df, k, iters, id_col, vec_col)
    withn = df.select(F.col(id_col).alias("_id"),
                      _as_double(F.col(vec_col)).alias("_v")) \
        .withColumn("_n", F.sqrt(_dot(F.col("_v"), F.col("_v"))))
    j = withn.join(assign.withColumnRenamed(id_col, "_id"), "_id")
    a, b = j.alias("a"), j.alias("b")
    cos = _dot(F.col("a._v"), F.col("b._v")) \
        / (F.col("a._n") * F.col("b._n"))
    return (a.join(b, (F.col("a.cluster") == F.col("b.cluster"))
                   & (F.col("a._id") < F.col("b._id")))
            .select(F.col("a._id").alias("id_a"),
                    F.col("b._id").alias("id_b"),
                    F.col("a.cluster").alias("cluster"),
                    F.round(cos, round_dp).alias("cosine_sim"))
            .where(F.col("cosine_sim") >= threshold))


def quantization_error(df: DataFrame, id_col: str = "vec_id",
                       vec_col: str = "embedding",
                       label_col: str = "label") -> DataFrame:
    """Int8 scalar quantization (symmetric, per-vector scale
    127/max|x|) and its reconstruction error, aggregated per label.
    Map-only per vector, one combinable groupBy."""
    v = _as_double(F.col(vec_col))
    amax = F.array_max(F.transform(v, F.abs))
    scale = F.when(amax > 0, F.lit(127.0) / amax).otherwise(F.lit(1.0))
    q = F.transform(
        v, lambda x: F.greatest(
            F.lit(-127.0),
            F.least(F.lit(127.0), F.floor(x * scale + 0.5).cast("double"))))
    err = F.aggregate(
        F.zip_with(v, q, lambda x, qq: F.abs(x - qq / scale)),
        F.lit(0.0), lambda acc, x: acc + x)
    per_vec = df.select(F.col(label_col).alias("label"),
                        err.alias("_err"))
    return (per_vec.groupBy("label")
            .agg(F.count("*").alias("n_vecs"),
                 F.round((F.sum(F.col("_err").cast("decimal(28,12)"))
                          .cast("double") / F.count("*")), 6)
                 .alias("avg_quant_err"),
                 F.round(F.max("_err"), 6).alias("max_quant_err")))


def label_cohesion(df: DataFrame, id_col: str = "vec_id",
                   vec_col: str = "embedding",
                   label_col: str = "label") -> DataFrame:
    """Intra-label cohesion: exact-decimal per-dim centroid per label,
    then each member's cosine to its centroid (sequential double
    fold), averaged per label. Two combinable shuffles on the label
    key; the centroid set is broadcast back."""
    emb = df.select(F.col(label_col).alias("label"),
                    F.col(id_col).alias("_id"),
                    _as_double(F.col(vec_col)).alias("_v"))
    cents = (emb.select("label", F.posexplode("_v").alias("_pos", "_x"))
             .groupBy("label", "_pos")
             .agg((F.sum(F.col("_x").cast("decimal(28,12)"))
                   .cast("double") / F.count("*")).alias("_mean"))
             .groupBy("label")
             .agg(F.transform(
                 F.sort_array(F.collect_list(F.struct("_pos", "_mean"))),
                 lambda s: s["_mean"]).alias("_c")))
    return (emb.join(F.broadcast(cents), "label")
            .withColumn("_cos", _cos(F.col("_v"), F.col("_c")))
            .groupBy("label")
            .agg(F.count("*").alias("n_vecs"),
                 F.round((F.sum(F.col("_cos").cast("decimal(28,12)"))
                          .cast("double") / F.count("*")), 6)
                 .alias("avg_cos"),
                 F.round(F.min("_cos"), 6).alias("min_cos")))


def neighbor_confusion(df: DataFrame, every: int = 20,
                       id_col: str = "vec_id",
                       vec_col: str = "embedding",
                       label_col: str = "label") -> DataFrame:
    """Label confusion via exact top-1 cosine neighbor for a
    deterministic 1/`every` query sample (id % every == 0): counts of
    (query label, neighbor label). The query side is the SMALL side —
    broadcast it and stream the corpus once; argmax is
    max_by(struct(cos, -id)) so equal-cosine ties take the lowest
    neighbor id on both engines."""
    corpus = df.select(F.col(id_col).alias("n_id"),
                       F.col(label_col).alias("n_label"),
                       _as_double(F.col(vec_col)).alias("_nv"))
    queries = df.where(F.col(id_col) % every == 0) \
        .select(F.col(id_col).alias("q_id"),
                F.col(label_col).alias("q_label"),
                _as_double(F.col(vec_col)).alias("_qv"))
    top1 = (corpus.crossJoin(F.broadcast(queries))
            .where(F.col("n_id") != F.col("q_id"))
            .withColumn("_cos", _cos(F.col("_nv"), F.col("_qv")))
            .groupBy("q_id", "q_label")
            .agg(F.max_by(
                "n_label", F.struct(F.col("_cos"), -F.col("n_id")))
                .alias("n_label")))
    return (top1.groupBy("q_label", "n_label")
            .agg(F.count("*").alias("n_queries")))


def label_centroids(df: DataFrame, label_col: str = "label",
                    vec_col: str = "embedding") -> DataFrame:
    """Per-class centroid statistics (the mean-pooling aggregate
    behind classifier prototypes and SemDeDup init): explode vectors
    to LONG FORM (label, dim, x) so the per-dimension mean is an
    ordinary decimal-summed aggregation — the 100 TB shape, since the
    wide form would need one agg expression per dimension and the
    long form shuffles (label × dim) keys with map-side partials.

    Determinism: the norm is algebraically ||Σx||/n, so it computes
    ENTIRELY from the exact per-dim decimal sums — Σ_d S_d² in
    decimal (order-free, no re-quantization of any computed double;
    double→decimal casts of computed means — and even of raw doubles
    at scale 12 — were measured to differ at rounding boundaries
    between engines; scale 6 is the suite's proven-safe quantization,
    so components quantize there), then one IEEE sqrt and division. Emits (label, n_vectors,
    centroid_norm)."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    ex = df.select(F.col(label_col).alias("label"),
                   F.posexplode(v).alias("dim", "x"))
    sd = (ex.groupBy("label", "dim")
          .agg(F.sum(F.col("x").cast("decimal(28,6)"))
               .cast("decimal(18,6)").alias("s")))
    sq = (sd.groupBy("label")
          .agg(F.sqrt(F.sum(F.col("s") * F.col("s")).cast("double"))
               .alias("_sn")))
    n = df.groupBy(F.col(label_col).alias("label")).agg(
        F.count("*").alias("n_vectors"))
    return n.join(sq, "label").select(
        "label", "n_vectors",
        (F.col("_sn") / F.col("n_vectors") + F.lit(0.0))
        .alias("centroid_norm"))


# ------------------------------------------ product quantization (PQ)

def _pq_slices(df: DataFrame, dim: int, m: int,
               id_col: str, vec_col: str) -> DataFrame:
    """(_id, subspace, _sv double-slice, _sq quantized slice) — every
    vector split into ``m`` contiguous subvectors in ONE posexplode
    pass. Quantize-then-slice equals slice-then-quantize (elementwise
    op), so both engines may slice whichever representation is
    cheaper."""
    assert dim % m == 0, (dim, m)
    ds = dim // m
    v = _as_double(F.col(vec_col))
    slices = F.array(*[F.slice(v, j * ds + 1, ds) for j in range(m)])
    return (df.select(F.col(id_col).alias("_id"),
                      F.posexplode(slices).alias("subspace", "_sv"))
            .withColumn("_sq", _quantize(F.col("_sv"))))


def pq_train(df: DataFrame, dim: int, m: int = 4, k: int = 8,
             iters: int = 1, id_col: str = "vec_id",
             vec_col: str = "embedding") -> DataFrame:
    """Train a product-quantization codebook — the FAISS IVF-PQ
    compression half, Spark-first: each of the ``m`` subspaces gets
    its own ``k``-centroid Lloyd codebook, and ALL m trainings run as
    ONE distributed job (the subspace id rides along as a grouping
    column — m× the rows through the same three-shuffle Lloyd round,
    never m sequential jobs). Returns (subspace, code, _cq) with _cq
    the 1e-6-quantized centroid, broadcastable (m·k rows).

    Determinism is the kmeans_lloyd discipline verbatim: init = the
    k lowest ids' subvectors (code label = the seed id), assignment
    by exact scaled-int argmin with ties to the lowest code, means
    via exact DECIMAL sums — so a SQL oracle replays the codebook
    bit-for-bit (q270).

    At 100 TB: PQ codes store m small ints per vector instead of
    dim doubles (64-dim float64 → 4 codes ≈ 128× compression); the
    codebook is k·dim doubles TOTAL (broadcast-sized at any corpus
    scale), and encode/ADC are map-only stages against it.

    Contract: every vector must be exactly ``dim`` long (the
    StoredSignatureIndex assumption) — a short vector yields short
    or empty subspace slices whose NULL-padded distances poison the
    argmin; validate length upstream if the source is untrusted."""
    slices = _pq_slices(df, dim, m, id_col, vec_col)
    seeds = (df.select(F.col(id_col).cast("long").alias("_sid"))
             .orderBy("_sid").limit(k))
    cents = (slices.join(F.broadcast(seeds),
                         slices["_id"].cast("long") == seeds["_sid"])
             .select("subspace", F.col("_sid").alias("code"),
                     F.col("_sq").alias("_cq"))
             .localCheckpoint())
    for _ in range(int(iters)):
        assign = (slices.join(F.broadcast(cents), "subspace")
                  .withColumn("_d2", _d2_scaled(F.col("_sq"),
                                                F.col("_cq")))
                  .groupBy("_id", "subspace")
                  .agg(F.min(F.struct("_d2", "code")).alias("_m"))
                  .select("_id", "subspace",
                          F.col("_m.code").alias("code")))
        means = (assign.join(slices, ["_id", "subspace"])
                 .select("subspace", "code",
                         F.posexplode("_sv").alias("_pos", "_x"))
                 .groupBy("subspace", "code", "_pos")
                 .agg((F.sum(F.col("_x").cast("decimal(28,12)"))
                       .cast("double") / F.count("*")).alias("_mean")))
        cents = (means.groupBy("subspace", "code")
                 .agg(F.transform(
                     F.sort_array(F.collect_list(
                         F.struct("_pos", "_mean"))),
                     lambda s: s["_mean"]).alias("_c"))
                 .select("subspace", "code",
                         _quantize(F.col("_c")).alias("_cq"))
                 .localCheckpoint())
    return cents


def pq_train_ints(slices: DataFrame, k: int = 8,
                  iters: int = 1) -> DataFrame:
    """Train a PQ codebook directly in the SCALED-INT domain —
    ``slices`` is (_id long, subspace int, _sq array<long>), e.g.
    RESIDUAL subvectors ``quantize(v) − quantize(centroid(cell))``
    (the FAISS IVF-PQ discipline: spend codebook capacity on what the
    coarse quantizer did NOT capture, not on re-describing it).
    Returns (subspace, code, _cq array<long>) like :func:`pq_train`.

    Staying in ints end-to-end avoids the one hazard an int→double→
    decimal round-trip would add (computed doubles cast to decimal
    were measured to differ at rounding boundaries between engines —
    module docstring): seeds are the k lowest ids' slices verbatim;
    assignment is the exact ``_d2_scaled`` argmin (ties → lowest
    code); the centroid update is ``floor(S/n + 0.5)`` computed as
    exact int64 component sums cast ONCE to double (components are
    ≤ ~4e7, so S stays exactly representable to n ≈ 2e8 vectors per
    (subspace, code, dim) group; beyond that the long→double cast
    rounds-to-nearest-even identically in Spark and DuckDB) — every
    step replayable in ANSI SQL (q275/q276)."""
    seeds = (slices.select(F.col("_id").cast("long").alias("_sid"))
             .distinct().orderBy("_sid").limit(k))
    cents = (slices.join(F.broadcast(seeds),
                         slices["_id"].cast("long") == seeds["_sid"])
             .select("subspace", F.col("_sid").alias("code"),
                     F.col("_sq").alias("_cq"))
             .localCheckpoint())
    for _ in range(int(iters)):
        assign = (slices.join(F.broadcast(cents), "subspace")
                  .withColumn("_d2", _d2_scaled(F.col("_sq"),
                                                F.col("_cq")))
                  .groupBy("_id", "subspace")
                  .agg(F.min(F.struct("_d2", "code")).alias("_m"))
                  .select("_id", "subspace",
                          F.col("_m.code").alias("code")))
        means = (assign.join(slices, ["_id", "subspace"])
                 .select("subspace", "code",
                         F.posexplode("_sq").alias("_pos", "_x"))
                 .groupBy("subspace", "code", "_pos")
                 .agg(F.floor(F.sum("_x").cast("double")
                              / F.count("*") + F.lit(0.5))
                      .cast("long").alias("_mean")))
        cents = (means.groupBy("subspace", "code")
                 .agg(F.transform(
                     F.sort_array(F.collect_list(
                         F.struct("_pos", "_mean"))),
                     lambda s: s["_mean"]).alias("_cq"))
                 .select("subspace", "code", "_cq")
                 .localCheckpoint())
    return cents


def pq_encode_ints(slices: DataFrame,
                   codebook: DataFrame) -> DataFrame:
    """Encode scaled-int slices (``pq_train_ints``'s input shape)
    against a trained int-domain codebook: per (_id, subspace) the
    exact argmin code, ties → lowest code. Map-only against the
    broadcast codebook + one argmin aggregate (pq_encode's plan on
    the int representation)."""
    return (slices.join(F.broadcast(codebook), "subspace")
            .withColumn("_d2", _d2_scaled(F.col("_sq"), F.col("_cq")))
            .groupBy("_id", "subspace")
            .agg(F.min(F.struct("_d2", "code")).alias("_m"))
            .select("_id", "subspace", F.col("_m.code").alias("code")))


def pq_encode(df: DataFrame, codebook: DataFrame, dim: int,
              m: int = 4, id_col: str = "vec_id",
              vec_col: str = "embedding") -> DataFrame:
    """Encode every vector against a trained codebook: per subspace,
    the exact scaled-int argmin code (ties → lowest code). Returns
    (_id, subspace, code) — the stored representation is m codes per
    vector. Map-only against the broadcast codebook plus one
    (_id, subspace)-keyed argmin aggregate."""
    slices = _pq_slices(df, dim, m, id_col, vec_col)
    return (slices.join(F.broadcast(codebook), "subspace")
            .withColumn("_d2", _d2_scaled(F.col("_sq"), F.col("_cq")))
            .groupBy("_id", "subspace")
            .agg(F.min(F.struct("_d2", "code")).alias("_m"))
            .select("_id", "subspace", F.col("_m.code").alias("code")))


def pq_adc_topk(codes: DataFrame, codebook: DataFrame,
                queries: DataFrame, dim: int, m: int = 4,
                k_top: int = 10, id_col: str = "vec_id",
                vec_col: str = "embedding") -> DataFrame:
    """Asymmetric-distance (ADC) top-k over PQ codes: per query, the
    distance to every coded vector is the SUM over subspaces of
    d2(query subvector, that subspace's centroid for the vector's
    code) — a lookup-table add, never a touch of the original
    vectors. The LUT is |queries|·m·k rows (broadcast-sized); the
    scan side reads ONLY the m-int code columns. Distances are exact
    int64 sums of scaled-int d2s, so ranking (ties → lowest id) is
    engine-stable. Self-matches excluded (the recall-audit
    convention). Returns (query_id, vec_id, adc_d2, rk)."""
    from pyspark.sql import Window

    qs = _pq_slices(queries, dim, m, id_col, vec_col) \
        .select(F.col("_id").alias("query_id"), "subspace", "_sq")
    lut = (qs.join(F.broadcast(codebook), "subspace")
           .withColumn("_qd2", _d2_scaled(F.col("_sq"), F.col("_cq")))
           .select("query_id", "subspace", "code", "_qd2"))
    w = Window.partitionBy("query_id").orderBy("adc_d2", "vec_id")
    return (codes.join(F.broadcast(lut), ["subspace", "code"])
            .where(F.col("_id") != F.col("query_id"))
            .groupBy("query_id", F.col("_id").alias("vec_id"))
            .agg(F.sum("_qd2").alias("adc_d2"))
            .withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") <= int(k_top)))
