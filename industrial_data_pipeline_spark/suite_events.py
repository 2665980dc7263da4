"""Event-analytics suite entries (q43–q48): sessionization, top-k per
group, funnel conversion, exact grouped percentiles, JSON property
extraction, and deterministic stratified sampling — the downstream
analyses a user runs on the reference's stored event archive
(SURVEY.md §2.8 stores the stream; analysis is left to operators).

Oracle discipline: identical expression shapes on both sides (same
gap arithmetic in epoch-µs, same md5-derived hash64, same linear
interpolation for percentile_cont), floats rounded to 6 dp on both.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from industrial_data_pipeline_spark.operators import events_analytics as EA
from industrial_data_pipeline_spark.suite_common import load

# shared oracle prelude: events with ns→µs timestamp truncation
_EV_SQL = """
ev AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id,
              event_type, value, props
       FROM events)
"""

SESSION_GAP_S = 1800
FUNNEL_STEPS = ("view", "click", "purchase")
SAMPLE_RATES = {"en": 15}  # downsample dominant language
SAMPLE_DEFAULT = 40


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-min-gap sessions per user: ordinal session id, span, size,
    value sum. Single shuffle on user_id."""
    return EA.sessionize(load(spark, sf_dir, "events"),
                         gap_seconds=SESSION_GAP_S)


ORACLE_SESSIONIZE = f"""
WITH {_EV_SQL},
s AS (SELECT user_id, event_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                          > {SESSION_GAP_S * 1_000_000}
                  THEN 1 ELSE 0 END AS ns
      FROM ev
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
t AS (SELECT user_id, ts, value,
             CAST(sum(ns) OVER (PARTITION BY user_id ORDER BY ts,
                                event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS BIGINT)
                 AS session_id
      FROM s)
SELECT user_id, session_id,
       min(ts) AS session_start, max(ts) AS session_end,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value
FROM t GROUP BY 1, 2
"""


def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 events by value within each event_type (row_number
    window, deterministic event_id tiebreak)."""
    return EA.top_k_per_group(
        load(spark, sf_dir, "events")
        .select("event_type", "event_id", "value"),
        group_col="event_type", order_col="value", k=3,
        tiebreak_col="event_id")


ORACLE_TOPK = f"""
WITH {_EV_SQL},
r AS (SELECT event_type, event_id, value,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY value DESC, event_id) AS rn
      FROM ev)
SELECT * FROM r WHERE rn <= 3
"""


def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """view→click→purchase funnel: per-user first times and strict
    ordered-conversion flag — one conditional aggregation, no
    self-joins."""
    return EA.funnel(load(spark, sf_dir, "events"), FUNNEL_STEPS)


ORACLE_FUNNEL = f"""
WITH {_EV_SQL}
SELECT user_id,
       min(CASE WHEN event_type = 'view' THEN ts END) AS first_view,
       min(CASE WHEN event_type = 'click' THEN ts END) AS first_click,
       min(CASE WHEN event_type = 'purchase' THEN ts END)
           AS first_purchase,
       coalesce(
           min(CASE WHEN event_type = 'view' THEN ts END)
             < min(CASE WHEN event_type = 'click' THEN ts END)
           AND min(CASE WHEN event_type = 'click' THEN ts END)
             < min(CASE WHEN event_type = 'purchase' THEN ts END),
           FALSE) AS converted
FROM ev GROUP BY 1
"""


def q_grouped_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact p50/p95 of value per event_type (percentile_cont linear
    interpolation) plus count and mean."""
    return EA.grouped_percentiles(load(spark, sf_dir, "events"),
                                  "event_type", "value")


ORACLE_PERCENTILES = f"""
WITH {_EV_SQL}
SELECT event_type, count(value) AS n,
       round(avg(value), 6) AS avg_value,
       round(quantile_cont(value, 0.5), 6) AS p50,
       round(quantile_cont(value, 0.95), 6) AS p95
FROM ev GROUP BY 1
"""


def q_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction: pull props.$.k out of the JSON
    string column and aggregate per event_type — JSON path evaluation
    stays JVM-side (get_json_object, codegen)."""
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (ev.groupBy("event_type")
            .agg(F.round(F.avg(k), 6).alias("avg_k"),
                 F.max(k).alias("max_k"),
                 F.count(F.when(k >= 50, 1)).alias("n_hi")))


ORACLE_JSON_PROPS = f"""
WITH {_EV_SQL},
x AS (SELECT event_type,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      FROM ev)
SELECT event_type, round(avg(k), 6) AS avg_k, max(k) AS max_k,
       count(CASE WHEN k >= 50 THEN 1 END) AS n_hi
FROM x GROUP BY 1
"""


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sample of documents: keep
    hash64(doc_id) mod 100 < rate(lang), en downsampled to 15%,
    others 40% — reproducible across engines, no RNG, no shuffle."""
    return EA.stratified_hash_sample(
        load(spark, sf_dir, "documents").select("doc_id", "lang",
                                                "source"),
        id_col="doc_id", stratum_col="lang",
        rates=SAMPLE_RATES, default_rate=SAMPLE_DEFAULT)


ORACLE_STRATIFIED_SAMPLE = f"""
SELECT doc_id, lang, source
FROM documents
WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
      % 100
      < CASE WHEN lang = 'en' THEN {SAMPLE_RATES['en']}
             ELSE {SAMPLE_DEFAULT} END
"""


def q_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-event-type stats: values clamped to nearest-rank
    [p05, p95] before averaging (operators/events_analytics.py::
    winsorized_stats) — outlier-trimmed means over the event archive."""
    return EA.winsorized_stats(load(spark, sf_dir, "events"))


ORACLE_WINSORIZED_STATS = f"""
WITH {_EV_SQL},
d AS (SELECT event_type, event_id, value,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY value, event_id) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM ev),
b AS (SELECT event_type,
             max(CASE WHEN rn = greatest(
                   CAST(ceil(0.05 * n) AS BIGINT), 1)
                 THEN value END) AS p_lo,
             max(CASE WHEN rn = CAST(ceil(0.95 * n) AS BIGINT)
                 THEN value END) AS p_hi
      FROM d GROUP BY event_type),
c AS (SELECT d.event_type, d.value, b.p_lo, b.p_hi,
             least(greatest(d.value, b.p_lo), b.p_hi) AS cv
      FROM d JOIN b USING (event_type))
SELECT event_type, count(*) AS n_events,
       round(CAST(sum(CAST(round(cv, 6) AS DECIMAL(28,6))) AS DOUBLE)
             / count(*), 6) AS robust_mean,
       max(p_lo) AS p_lo, max(p_hi) AS p_hi,
       CAST(sum(CASE WHEN value < p_lo OR value > p_hi
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped
FROM c GROUP BY event_type
"""


REGISTRY_EVENTS: dict[str, tuple] = {
    "q43_sessionize": (q_sessionize, ORACLE_SESSIONIZE),
    "q44_topk_per_group": (q_topk_per_group, ORACLE_TOPK),
    "q45_funnel": (q_funnel, ORACLE_FUNNEL),
    "q46_grouped_percentiles": (q_grouped_percentiles,
                                ORACLE_PERCENTILES),
    "q47_json_props": (q_json_props, ORACLE_JSON_PROPS),
    "q48_stratified_sample": (q_stratified_sample,
                              ORACLE_STRATIFIED_SAMPLE),
    "q154_winsorized_stats": (q_winsorized_stats,
                              ORACLE_WINSORIZED_STATS),
}


# ----------------------------- q175 sequence motifs (3-step patterns)

def q_sequence_motifs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral sequence mining, the counting core of
    next-event-prediction features: the 20 most common CONSECUTIVE
    3-step event-type sequences per user stream (two lead windows,
    one count shuffle — n-gram counting on the event axis instead of
    the token axis). Ties break lexicographically."""
    from pyspark.sql import Window
    ev = load(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s2 = F.lead("event_type", 1).over(w)
    s3 = F.lead("event_type", 2).over(w)
    motif = F.concat_ws(">", F.col("event_type"), s2, s3)
    # all three parts must be non-null: concat_ws SKIPS nulls while
    # the oracle's || null-propagates — requiring completeness on
    # both sides keeps the semantics identical even if event_type
    # is ever null in the data
    return (ev.withColumn("_m", motif).withColumn("_s2", s2)
            .withColumn("_s3", s3)
            .where(F.col("_s3").isNotNull() & F.col("_s2").isNotNull()
                   & F.col("event_type").isNotNull())
            .groupBy(F.col("_m").alias("motif"))
            .agg(F.count("*").alias("n"))
            .orderBy(F.desc("n"), F.asc("motif")).limit(20))


ORACLE_SEQUENCE_MOTIFS = f"""
WITH {_EV_SQL},
s AS (SELECT event_type,
             lead(event_type, 1) OVER w AS e2,
             lead(event_type, 2) OVER w AS e3
      FROM ev
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
SELECT event_type || '>' || e2 || '>' || e3 AS motif,
       count(*) AS n
FROM s WHERE e3 IS NOT NULL AND e2 IS NOT NULL
      AND event_type IS NOT NULL
GROUP BY 1 ORDER BY n DESC, motif ASC LIMIT 20
"""

REGISTRY_EVENTS.update({
    "q175_sequence_motifs": (q_sequence_motifs,
                             ORACLE_SEQUENCE_MOTIFS),
})


# --------------------------- q178 event-type association (PMI matrix)

def q_event_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association mining over the event stream: pointwise mutual
    information of event-type pairs co-occurring in the same
    (user, hour) bucket — the basket-lift statistic in information
    units. Counts are exact integers; the PMI argument is assembled
    with one fixed op order ((double(n_xy)·N)/(n_x·n_y)) so both
    engines take ln of the identical double; rounded to 6 dp (the
    q59 ln-parity precedent)."""
    ev = load(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("hour", "ts").alias("h"), "event_type")
    b = ev.distinct()
    # bucket total stays IN the plan as a 1-row broadcast cross join
    # (the q13/chi-square shape) — an eager .count() here ran a full
    # extra scan+shuffle at every plan BUILD, not just at execution
    nb = (b.select("user_id", "h").distinct()
          .agg(F.count("*").alias("_nbk")))
    tx = b.groupBy("event_type").agg(F.count("*").alias("n_x"))
    l = b.select("user_id", "h", F.col("event_type").alias("ta"))
    r = b.select("user_id", "h", F.col("event_type").alias("tb"))
    pairs = (l.join(r, ["user_id", "h"])
             .where(F.col("ta") < F.col("tb"))
             .groupBy("ta", "tb").agg(F.count("*").alias("n_xy")))
    ja = tx.select(F.col("event_type").alias("ta"),
                   F.col("n_x").alias("_na"))
    jb = tx.select(F.col("event_type").alias("tb"),
                   F.col("n_x").alias("_nb"))
    arg = (F.col("n_xy").cast("double") * F.col("_nbk")) \
        / (F.col("_na") * F.col("_nb"))
    return (pairs.join(F.broadcast(ja), "ta")
            .join(F.broadcast(jb), "tb")
            .crossJoin(F.broadcast(nb))
            .select(F.col("ta").alias("type_a"),
                    F.col("tb").alias("type_b"), "n_xy",
                    (F.round(F.log(arg), 6) + F.lit(0.0))
                    .alias("pmi")))


ORACLE_EVENT_PMI = f"""
WITH {_EV_SQL},
b AS (SELECT DISTINCT user_id, date_trunc('hour', ts) AS h,
             event_type FROM ev),
n AS (SELECT count(*) AS nb FROM
        (SELECT DISTINCT user_id, h FROM b)),
tx AS (SELECT event_type, count(*) AS n_x FROM b GROUP BY 1),
p AS (SELECT l.event_type AS ta, r.event_type AS tb,
             count(*) AS n_xy
      FROM b l JOIN b r ON l.user_id = r.user_id AND l.h = r.h
                        AND l.event_type < r.event_type
      GROUP BY 1, 2)
SELECT p.ta AS type_a, p.tb AS type_b, p.n_xy,
       round(ln((CAST(p.n_xy AS DOUBLE) * n.nb)
                / (a.n_x * b2.n_x)), 6) + 0.0 AS pmi
FROM p JOIN tx a ON p.ta = a.event_type
       JOIN tx b2 ON p.tb = b2.event_type
       CROSS JOIN n
"""

REGISTRY_EVENTS.update({
    "q178_event_pmi": (q_event_pmi, ORACLE_EVENT_PMI),
})


# ----------------------- q182 distribution drift (PSI between weeks)

def q_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE production data-drift metric: Population Stability Index of
    each event type's value distribution, week 1 (reference) vs the
    final week (current), over 10 equal-width bins anchored on the
    reference week's min/max. PSI = Σ (pᵢ−qᵢ)·ln(pᵢ/qᵢ) with Laplace
    smoothing ((nᵢ+1)/(N+10)) so empty bins can't blow up the log.
    Determinism: bin edges and proportions are identical doubles on
    both engines; the 10 PSI terms sum as one explicit left-to-right
    addition chain (fixed order — never a data-dependent float sum);
    rounded at 6 dp."""
    ev = load(spark, sf_dir, "events").select("event_type", "ts",
                                              "value")
    ref = ev.where(F.col("ts") < "2024-01-08")
    cur = ev.where(F.col("ts") >= "2024-01-25")
    edges = (ref.groupBy("event_type")
             .agg(F.min("value").alias("_lo"),
                  F.max("value").alias("_hi")))

    def binned(df, label):
        j = df.join(F.broadcast(edges), "event_type")
        w = (F.col("_hi") - F.col("_lo")) / F.lit(10.0)
        # degenerate distribution (constant reference week): w == 0
        # → everything lands in bin 0, instead of NaN-bin rows being
        # silently dropped by the pivot
        b = (F.when(F.col("_hi") == F.col("_lo"), F.lit(0))
             .otherwise(F.least(F.greatest(F.floor(
                 (F.col("value") - F.col("_lo")) / w), F.lit(0)),
                 F.lit(9)))).cast("int")
        return (j.withColumn("_b", b)
                .groupBy("event_type")
                .pivot("_b", list(range(10)))
                .agg(F.count(F.lit(1)))
                .na.fill(0)
                .withColumnsRenamed({str(i): f"{label}{i}"
                                     for i in range(10)}))

    r = binned(ref, "r")
    c = binned(cur, "c")
    # LEFT join from the reference side: a type with reference rows
    # but no current-week rows (retired event type) must still report
    # (n_cur=0, smoothed psi) — the oracle aggregates ONE table and
    # keeps such groups; an inner join here silently dropped them
    m = r.join(c, "event_type", "left").na.fill(0)
    rn = sum(F.col(f"r{i}") for i in range(10))
    cn = sum(F.col(f"c{i}") for i in range(10))

    def term(i):
        p = (F.col(f"r{i}") + F.lit(1)) / (rn + F.lit(10))
        q = (F.col(f"c{i}") + F.lit(1)) / (cn + F.lit(10))
        return (p - q) * F.log(p / q)

    psi = term(0)
    for i in range(1, 10):
        psi = psi + term(i)
    return m.select("event_type",
                    rn.cast("long").alias("n_ref"),
                    cn.cast("long").alias("n_cur"),
                    (F.round(psi, 6) + F.lit(0.0)).alias("psi"))


def _oracle_psi_drift() -> str:
    def cnt(side, i):
        return (f"sum(CASE WHEN {side} AND b = {i} "
                f"THEN 1 ELSE 0 END)")
    rterms = " + ".join(cnt("is_ref", i) for i in range(10))
    cterms = " + ".join(cnt("NOT is_ref", i) for i in range(10))
    terms = " + ".join(
        f"((({cnt('is_ref', i)} + 1) / (CAST({rterms} AS DOUBLE) + 10)"
        f" - ({cnt('NOT is_ref', i)} + 1)"
        f" / (CAST({cterms} AS DOUBLE) + 10))"
        f" * ln((({cnt('is_ref', i)} + 1)"
        f" / (CAST({rterms} AS DOUBLE) + 10))"
        f" / (({cnt('NOT is_ref', i)} + 1)"
        f" / (CAST({cterms} AS DOUBLE) + 10))))"
        for i in range(10))
    return f"""
WITH ev AS (SELECT event_type, CAST(ts AS TIMESTAMP) AS ts, value
            FROM events),
edges AS (SELECT event_type, min(value) AS lo, max(value) AS hi
          FROM ev WHERE ts < '2024-01-08' GROUP BY 1),
x AS (SELECT e.event_type, e.ts < TIMESTAMP '2024-01-08' AS is_ref,
             CASE WHEN d.hi = d.lo THEN 0
                  ELSE CAST(least(greatest(floor((e.value - d.lo)
                                       / ((d.hi - d.lo) / 10.0)), 0),
                        9) AS INT) END AS b
      FROM ev e JOIN edges d USING (event_type)
      WHERE e.ts < '2024-01-08' OR e.ts >= '2024-01-25')
SELECT event_type,
       CAST({rterms} AS BIGINT) AS n_ref,
       CAST({cterms} AS BIGINT) AS n_cur,
       round({terms}, 6) + 0.0 AS psi
FROM x GROUP BY event_type
"""

REGISTRY_EVENTS.update({
    "q182_psi_drift": (q_psi_drift, _oracle_psi_drift()),
})


# ---------------------- q189 interval coverage (union of overlapping)

def q_interval_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The union-of-intervals measure: total UNIQUE time covered per
    user by possibly-overlapping activity windows (each error event
    opens a 30-minute window) — the downtime/maintenance-coverage
    statistic naive SUM(duration) double-counts. Classic
    gaps-and-islands merge: order windows by start, an island starts
    where start > running max(end) so far, sum each island's span.
    Exact integer-microsecond arithmetic end to end."""
    from pyspark.sql import Window
    ev = (load(spark, sf_dir, "events")
          .where(F.col("event_type") == "error")
          .select("user_id",
                  F.unix_micros("ts").alias("s"),
                  (F.unix_micros("ts") + F.lit(1_800_000_000))
                  .alias("e")))
    wo = Window.partitionBy("user_id").orderBy("s", "e")
    prev_max = F.max("e").over(
        wo.rowsBetween(Window.unboundedPreceding, -1))
    flagged = ev.withColumn(
        "_new", F.when(prev_max.isNull()
                       | (F.col("s") > prev_max), 1).otherwise(0))
    wi = Window.partitionBy("user_id").orderBy("s", "e") \
        .rowsBetween(Window.unboundedPreceding, 0)
    islands = flagged.withColumn("_isl", F.sum("_new").over(wi))
    per_island = (islands.groupBy("user_id", "_isl")
                  .agg(((F.max("e") - F.min("s"))
                        / F.lit(1_000_000)).cast("long")
                       .alias("span_s")))
    return (per_island.groupBy("user_id")
            .agg(F.count("*").alias("n_islands"),
                 F.sum("span_s").alias("covered_seconds")))


ORACLE_INTERVAL_COVERAGE = f"""
WITH {_EV_SQL},
w AS (SELECT user_id, epoch_us(ts) AS s,
             epoch_us(ts) + 1800000000 AS e
      FROM ev WHERE event_type = 'error'),
fl AS (SELECT user_id, s, e,
              CASE WHEN max(e) OVER (PARTITION BY user_id
                                     ORDER BY s, e
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND 1 PRECEDING) IS NULL
                        OR s > max(e) OVER (PARTITION BY user_id
                                            ORDER BY s, e
                                            ROWS BETWEEN UNBOUNDED
                                            PRECEDING AND 1 PRECEDING)
                   THEN 1 ELSE 0 END AS nw
       FROM w),
isl AS (SELECT user_id, s, e,
               sum(nw) OVER (PARTITION BY user_id ORDER BY s, e
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS i
        FROM fl),
per AS (SELECT user_id, i,
               CAST((max(e) - min(s)) // 1000000 AS BIGINT) AS span_s
        FROM isl GROUP BY 1, 2)
SELECT user_id, count(*) AS n_islands,
       CAST(sum(span_s) AS BIGINT) AS covered_seconds
FROM per GROUP BY user_id
"""

REGISTRY_EVENTS.update({
    "q189_interval_coverage": (q_interval_coverage,
                               ORACLE_INTERVAL_COVERAGE),
})


# -------------------- q199 event-type Markov transition matrix

def q_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order behavior model: the event-type transition matrix —
    counts of consecutive (from → to) pairs per user stream and the
    row-normalized transition probabilities (q175 counts 3-gram
    motifs; this is the Markov matrix those motifs marginalize).
    Counts exact; probabilities are single divisions of exact
    integers, emitted raw."""
    from pyspark.sql import Window
    ev = load(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = (ev.withColumn("_to", F.lead("event_type").over(w))
         .where(F.col("_to").isNotNull())
         .groupBy(F.col("event_type").alias("from_type"),
                  F.col("_to").alias("to_type"))
         .agg(F.count("*").alias("n")))
    wf = Window.partitionBy("from_type")
    return t.withColumn(
        "p", (F.col("n").cast("double")
              / F.sum("n").over(wf).cast("double")) + F.lit(0.0))


ORACLE_TRANSITION_MATRIX = f"""
WITH {_EV_SQL},
s AS (SELECT user_id, event_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS nxt
      FROM ev),
t AS (SELECT event_type AS from_type, nxt AS to_type,
             count(*) AS n
      FROM s WHERE nxt IS NOT NULL GROUP BY 1, 2)
SELECT from_type, to_type, n,
       (CAST(n AS DOUBLE)
        / CAST(sum(n) OVER (PARTITION BY from_type) AS DOUBLE)) + 0.0
           AS p
FROM t
"""

REGISTRY_EVENTS.update({
    "q199_transition_matrix": (q_transition_matrix,
                               ORACLE_TRANSITION_MATRIX),
})


# ------------------------------- q204 hour-of-day entropy per type

def q_type_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of each event type's hour-of-day activity
    profile — THE monitoring statistic for 'did this signal's daily
    rhythm change' (a flatlined sensor collapses toward 0 bits of
    surprise... actually uniform → high entropy; a burst → low).
    Per (type, hour) counts → p = n/N (one exact int/int double
    division) → each p·ln(p) term routed through DECIMAL(28,15) so
    the 24-term sum is order-independent across partitions and
    engines (the q95/PSI discipline). Scale: two combinable groupBys
    over at most |types|×24 rows of state."""
    ev = load(spark, sf_dir, "events").select(
        "event_type", F.hour("ts").alias("h"))
    c = ev.groupBy("event_type", "h").agg(F.count("*").alias("n"))
    tot = c.groupBy("event_type").agg(F.sum("n").alias("n_tot"))
    p = (c.join(F.broadcast(tot), "event_type")
         .withColumn("_p", F.col("n") / F.col("n_tot")))
    term = (F.col("_p") * F.log(F.col("_p"))).cast("decimal(28,15)")
    return (p.groupBy("event_type")
            .agg(F.max("n_tot").alias("n_events"),
                 F.count("*").alias("active_hours"),
                 (F.round(-F.sum(term).cast("double"), 6) + 0.0)
                 .alias("entropy_nats")))


ORACLE_TYPE_ENTROPY = f"""
WITH {_EV_SQL},
c AS (SELECT event_type, extract(hour FROM ts) AS h, count(*) AS n
      FROM ev GROUP BY 1, 2),
t AS (SELECT event_type, sum(n) AS N FROM c GROUP BY 1),
p AS (SELECT c.event_type, CAST(c.n AS DOUBLE) / t.N AS p
      FROM c JOIN t ON c.event_type = t.event_type)
SELECT t.event_type, CAST(t.N AS BIGINT) AS n_events,
       (SELECT count(*) FROM c WHERE c.event_type = t.event_type)
           AS active_hours,
       round(-CAST(sum(CAST(p.p * ln(p.p) AS DECIMAL(28,15)))
                   AS DOUBLE), 6) + 0.0 AS entropy_nats
FROM p JOIN t ON p.event_type = t.event_type
GROUP BY t.event_type, t.N
"""

REGISTRY_EVENTS.update({
    "q204_type_entropy": (q_type_entropy, ORACLE_TYPE_ENTROPY),
})


# ----------------------------- q210 purchase touch attribution

def q_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marketing-style attribution: for every purchase, the user's
    FIRST view ever (first-touch) and the LAST view preceding the
    purchase (last-touch), plus the view→purchase latency in seconds
    — exact integer µs arithmetic. One window partitioned by user
    (conditional min/max over the running frame), no self-join: the
    classic correlated-subquery shape collapsed into a single pass."""
    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type")
    from pyspark.sql import Window
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    vts = F.when(F.col("event_type") == "view", F.col("ts"))
    enriched = (ev.withColumn("first_touch", F.min(vts).over(w))
                .withColumn("last_touch", F.max(vts).over(w)))
    return (enriched.where(F.col("event_type") == "purchase")
            .select("user_id", "event_id",
                    F.col("ts").alias("purchase_ts"),
                    "first_touch", "last_touch",
                    ((F.unix_micros("ts")
                      - F.unix_micros("last_touch"))
                     / F.lit(1_000_000)).cast("bigint")
                    .alias("latency_s")))


ORACLE_TOUCH_ATTRIBUTION = f"""
WITH {_EV_SQL},
e AS (SELECT user_id, event_id, ts, event_type,
             min(CASE WHEN event_type = 'view' THEN ts END)
                 OVER w AS first_touch,
             max(CASE WHEN event_type = 'view' THEN ts END)
                 OVER w AS last_touch
      FROM ev
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
SELECT user_id, event_id, ts AS purchase_ts, first_touch, last_touch,
       CAST((epoch_us(ts) - epoch_us(last_touch)) // 1000000
            AS BIGINT) AS latency_s
FROM e WHERE event_type = 'purchase'
"""

REGISTRY_EVENTS.update({
    "q210_touch_attribution": (q_touch_attribution,
                               ORACLE_TOUCH_ATTRIBUTION),
})


# ----------------------------- q211 MAD robust outlier detection

def q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median-absolute-deviation outlier screen per event type — the
    robust alternative to q42's mean/stddev z-scores (one wild value
    inflates a stddev and hides itself; it cannot move a median).
    Two grouped exact percentiles (median, then median of absolute
    deviations) + a broadcast join of the 5-row medians back onto the
    stream; flag |v − med| > 3·1.4826·MAD. All doubles flow through
    identical IEEE op sequences on both engines (q46 percentile
    parity), so med/MAD ship raw."""
    ev = load(spark, sf_dir, "events").select("event_type", "value")
    med = ev.groupBy("event_type").agg(
        F.percentile("value", 0.5).alias("med"))
    dev = (ev.join(F.broadcast(med), "event_type")
           .withColumn("_dev", F.abs(F.col("value") - F.col("med"))))
    mad = dev.groupBy("event_type").agg(
        F.percentile("_dev", 0.5).alias("mad"))
    return (dev.join(F.broadcast(mad), "event_type")
            .groupBy("event_type")
            .agg(F.count("*").alias("n"),
                 (F.max("med") + 0.0).alias("med"),
                 (F.max("mad") + 0.0).alias("mad"),
                 F.count(F.when(
                     F.col("_dev") > 3.0 * 1.4826 * F.col("mad"), 1))
                 .alias("n_outliers")))


ORACLE_MAD_OUTLIERS = f"""
WITH {_EV_SQL},
med AS (SELECT event_type, quantile_cont(value, 0.5) AS med
        FROM ev GROUP BY 1),
dev AS (SELECT e.event_type, abs(e.value - m.med) AS dv, m.med
        FROM ev e JOIN med m USING (event_type)),
mad AS (SELECT event_type, quantile_cont(dv, 0.5) AS mad
        FROM dev GROUP BY 1)
SELECT d.event_type, count(*) AS n,
       max(d.med) + 0.0 AS med, max(a.mad) + 0.0 AS mad,
       count(CASE WHEN d.dv > 3.0 * 1.4826 * a.mad THEN 1 END)
           AS n_outliers
FROM dev d JOIN mad a USING (event_type)
GROUP BY d.event_type
"""

REGISTRY_EVENTS.update({
    "q211_mad_outliers": (q_mad_outliers, ORACLE_MAD_OUTLIERS),
})


# --------------------------- q214 sliding-window rate monitoring

def q_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping (sliding) time windows — the rate-monitoring shape
    tumbling windows (q62) can't express: a 1-hour window advancing
    every 15 minutes, so each event contributes to 4 windows and a
    burst is visible within 15 min instead of an hour. Spark's
    native F.window(slide=) expands events JVM-side; one combinable
    groupBy on (window, event_type). The oracle replays the window
    algebra with a 4-slot generate_series per event."""
    ev = load(spark, sf_dir, "events").select("ts", "event_type",
                                              "value")
    w = F.window("ts", "1 hour", "15 minutes")
    return (ev.groupBy(w.alias("w"), "event_type")
            .agg(F.count("*").alias("n"),
                 F.sum(F.col("value").cast("decimal(28,6)"))
                 .cast("double").alias("sum_value"))
            .select(F.col("w.start").alias("window_start"),
                    "event_type", "n", "sum_value"))


ORACLE_SLIDING_WINDOWS = f"""
WITH {_EV_SQL},
slots AS (SELECT event_type, value,
                 make_timestamp((epoch_us(ts) // 900000000 - s.i)
                                * 900000000) AS window_start
          FROM ev CROSS JOIN
               (SELECT unnest(generate_series(0, 3)) AS i) s
          WHERE epoch_us(ts) // 900000000 - s.i >= 0)
SELECT window_start, event_type, count(*) AS n,
       CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value
FROM slots GROUP BY 1, 2
"""

REGISTRY_EVENTS.update({
    "q214_sliding_windows": (q_sliding_windows,
                             ORACLE_SLIDING_WINDOWS),
})


# -------------------- q219 exact higher moments (skew / kurtosis)

# shared central-moment arithmetic, one string parsed by BOTH engines
# so the IEEE op tree is identical by construction; sk_* are the
# milli-unit INT64 power sums divided back to doubles
_MOM_MEAN = "(s1 / 1e3 / n)"
_MOM_M2 = f"(s2 / 1e3 / n - {_MOM_MEAN} * {_MOM_MEAN})"
_MOM_M3 = (f"(s3 / 1e3 / n - 3 * {_MOM_MEAN} * s2 / 1e3 / n"
           f" + 2 * {_MOM_MEAN} * {_MOM_MEAN} * {_MOM_MEAN})")
_MOM_M4 = (f"(s4 / 1e3 / n - 4 * {_MOM_MEAN} * s3 / 1e3 / n"
           f" + 6 * {_MOM_MEAN} * {_MOM_MEAN} * s2 / 1e3 / n"
           f" - 3 * {_MOM_MEAN} * {_MOM_MEAN} * {_MOM_MEAN}"
           f" * {_MOM_MEAN})")
# m2^1.5 as m2*sqrt(m2): sqrt is correctly rounded IEEE on every
# engine, libm pow() is not (measured 1-ulp divergence at sf0.001)
_MOM_SKEW = f"{_MOM_M3} / ({_MOM_M2} * sqrt({_MOM_M2})) + 0e0"
_MOM_KURT = f"{_MOM_M4} / ({_MOM_M2} * {_MOM_M2}) - 3e0 + 0e0"


def q_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population skewness and excess kurtosis per event type from
    exact power sums — the distribution-shape profile behind every
    'is this sensor Gaussian' decision. Each x^k is the same double
    product on both engines, quantized by floor(·1000) to INT64
    milli-units and summed as integers — exact in any order, and
    int→double is a hardware conversion identical everywhere
    (DECIMAL sums were measured to diverge here: the scaled s4
    integer exceeds 2^53, where DECIMAL→DOUBLE takes divergent
    software paths — the q192 lesson). The closed-form moment
    arithmetic is ONE shared SQL string parsed by both engines, so
    the IEEE op tree matches by construction. Built-in skewness()/
    kurtosis() use order-dependent running float merges — exactly
    what this avoids."""
    x = F.col("value")
    mi = lambda c: F.floor(c * F.lit(1000.0)).cast("long")  # noqa: E731
    ev = load(spark, sf_dir, "events").select("event_type", "value")
    s = (ev.groupBy("event_type")
         .agg(F.count("*").alias("n"),
              F.sum(mi(x)).alias("s1"),
              F.sum(mi(x * x)).alias("s2"),
              F.sum(mi(x * x * x)).alias("s3"),
              F.sum(mi(x * x * x * x)).alias("s4")))
    return s.selectExpr(
        "event_type", "n",
        f"{_MOM_MEAN} + 0e0 AS mean",
        f"{_MOM_SKEW} AS skewness",
        f"{_MOM_KURT} AS excess_kurtosis")


ORACLE_MOMENTS = f"""
WITH {{ev}},
s AS (SELECT event_type, count(*) AS n,
             sum(CAST(floor(value * 1000.0) AS BIGINT)) AS s1,
             sum(CAST(floor(value * value * 1000.0) AS BIGINT))
                 AS s2,
             sum(CAST(floor(value * value * value * 1000.0)
                      AS BIGINT)) AS s3,
             sum(CAST(floor(value * value * value * value * 1000.0)
                      AS BIGINT)) AS s4
      FROM ev GROUP BY 1)
SELECT event_type, n,
       {_MOM_MEAN} + 0e0 AS mean,
       {_MOM_SKEW} AS skewness,
       {_MOM_KURT} AS excess_kurtosis
FROM s
""".format(ev=_EV_SQL)

REGISTRY_EVENTS.update({
    "q219_moments": (q_moments, ORACLE_MOMENTS),
})


# ----------------------- q222 time-constrained funnel conversion

def q_constrained_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production funnel: a conversion only counts if each step
    lands within its window — click ≤ 1 h after a view, purchase
    ≤ 24 h after that click (q45's strict-order funnel has no
    deadline, so a purchase a month later still 'converts').  Per
    user: earliest view, the first click within an hour of ANY
    prior view, the first purchase within a day of that click —
    all in one window pass per user (conditional running mins over
    integer µs), zero self-joins. Emits per-user step timestamps
    and the constrained conversion flag."""
    from pyspark.sql import Window
    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type")
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(Window.unboundedPreceding, -1))
    us = F.unix_micros(F.col("ts"))
    last_view = F.max(F.when(F.col("event_type") == "view",
                             us)).over(w)
    is_click_in = ((F.col("event_type") == "click")
                   & (us - last_view <= 3_600_000_000))
    w_row = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_run = w_row.rowsBetween(Window.unboundedPreceding,
                              Window.currentRow)
    e = (ev.withColumn("_click_us",
                       F.min(F.when(is_click_in, us)).over(w_run))
         .withColumn("_prev_click", F.lag("_click_us").over(w_row))
         .withColumn("_purch_us",
                     F.min(F.when((F.col("event_type") == "purchase")
                                  & (us - F.col("_prev_click")
                                     <= 86_400_000_000), us))
                     .over(w_run)))
    agg = (e.groupBy("user_id")
           .agg(F.min(F.when(F.col("event_type") == "view",
                             us)).alias("first_view_us"),
                F.max("_click_us").alias("click_us"),
                F.max("_purch_us").alias("purch_us")))
    return agg.select(
        "user_id", "first_view_us", "click_us", "purch_us",
        (F.col("purch_us").isNotNull()).alias("converted"))


ORACLE_CONSTRAINED_FUNNEL = f"""
WITH {_EV_SQL},
b AS (SELECT user_id, event_id, ts, event_type, epoch_us(ts) AS us,
             max(CASE WHEN event_type = 'view' THEN epoch_us(ts) END)
                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING) AS last_view
      FROM ev),
c AS (SELECT *,
             min(CASE WHEN event_type = 'click'
                       AND us - last_view <= 3600000000
                      THEN us END)
                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW) AS click_run
      FROM b),
c2 AS (SELECT *,
              lag(click_run) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id)
                  AS prev_click
       FROM c),
d AS (SELECT *,
             min(CASE WHEN event_type = 'purchase'
                       AND us - prev_click <= 86400000000
                      THEN us END)
                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW) AS purch_run
      FROM c2)
SELECT user_id,
       CAST(min(CASE WHEN event_type = 'view' THEN us END)
            AS BIGINT) AS first_view_us,
       CAST(max(click_run) AS BIGINT) AS click_us,
       CAST(max(purch_run) AS BIGINT) AS purch_us,
       max(purch_run) IS NOT NULL AS converted
FROM d GROUP BY 1
"""

REGISTRY_EVENTS.update({
    "q222_constrained_funnel": (q_constrained_funnel,
                                ORACLE_CONSTRAINED_FUNNEL),
})


# ---------------------- q225 bucketed interval (range) join

INCIDENT_VALUE_MIN = 90
INCIDENT_WINDOW_US = 1_800_000_000


def q_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: high-value error events open 30-minute incident
    windows; count the click/purchase events (and distinct users)
    landing inside each HALF-OPEN [s, e) window — ANY user, so there
    is no equi key and a naive join is a BroadcastNestedLoopJoin.
    The engine side reuses q64's binned range join
    (``operators/scale.interval_join_binned``) with
    ``end_inclusive=False``: intervals explode onto their covered
    hour bins, points equi-join on their single bin, exact filter
    after. The oracle keeps the naive inequality join as the
    semantics spec. Zero-hit incidents are kept (LEFT join,
    counts 0)."""
    from industrial_data_pipeline_spark.operators.scale import (
        interval_join_binned)
    ev = load(spark, sf_dir, "events")
    inc = (ev.where((F.col("event_type") == "error")
                    & (F.col("value") > INCIDENT_VALUE_MIN))
           .select(F.col("event_id").alias("incident_id"),
                   F.col("ts").alias("start"),
                   (F.col("ts") + F.expr("INTERVAL 30 MINUTES"))
                   .alias("end")))
    pts = (ev.where(F.col("event_type").isin("click", "purchase"))
           .select("ts", "user_id"))
    pairs = interval_join_binned(pts, inc, ts_col="ts",
                                 end_inclusive=False)
    hits = (pairs.groupBy("incident_id")
            .agg(F.count("*").alias("_n"),
                 F.countDistinct("user_id").alias("_u")))
    return (inc.select("incident_id").join(hits, "incident_id", "left")
            .select("incident_id",
                    F.coalesce("_n", F.lit(0)).cast("long")
                    .alias("n_hits"),
                    F.coalesce("_u", F.lit(0)).cast("long")
                    .alias("n_users")))


ORACLE_INTERVAL_JOIN = f"""
WITH {_EV_SQL},
inc AS (SELECT event_id AS incident_id, epoch_us(ts) AS s,
               epoch_us(ts) + {INCIDENT_WINDOW_US} AS e
        FROM ev WHERE event_type = 'error'
              AND value > {INCIDENT_VALUE_MIN}),
p AS (SELECT epoch_us(ts) AS t, user_id FROM ev
      WHERE event_type IN ('click', 'purchase'))
SELECT i.incident_id,
       CAST(count(p.t) AS BIGINT) AS n_hits,
       CAST(count(DISTINCT p.user_id) AS BIGINT) AS n_users
FROM inc i LEFT JOIN p ON p.t >= i.s AND p.t < i.e
GROUP BY 1
"""


# ---------------------- q226 peak concurrency (sweep line)

def q_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak interval depth per event type: every event opens a
    30-minute window; how many were simultaneously open at the worst
    moment, and when that moment first occurred. Sweep-line running
    sum (operators/timeseries.peak_concurrency) — the DEPTH
    complement of q189's union-coverage TIME measure."""
    from industrial_data_pipeline_spark.operators import timeseries as TS
    ev = load(spark, sf_dir, "events")
    iv = ev.select("event_type",
                   F.unix_micros("ts").alias("s_us"),
                   (F.unix_micros("ts") + F.lit(INCIDENT_WINDOW_US))
                   .alias("e_us"))
    return TS.peak_concurrency(iv)


ORACLE_PEAK_CONCURRENCY = f"""
WITH {_EV_SQL},
iv AS (SELECT event_type, epoch_us(ts) AS s,
              epoch_us(ts) + {INCIDENT_WINDOW_US} AS e
       FROM ev),
d AS (SELECT event_type, s AS t, 1 AS d FROM iv
      UNION ALL
      SELECT event_type, e AS t, -1 AS d FROM iv),
r AS (SELECT event_type, t,
             sum(d) OVER (PARTITION BY event_type ORDER BY t, d
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS depth
      FROM d),
m AS (SELECT event_type, max(depth) AS peak FROM r GROUP BY 1)
SELECT r.event_type, CAST(m.peak AS BIGINT) AS peak,
       CAST(min(r.t) AS BIGINT) AS peak_at_us
FROM r JOIN m ON r.event_type = m.event_type AND r.depth = m.peak
GROUP BY 1, 2
"""

REGISTRY_EVENTS.update({
    "q225_interval_join": (q_interval_join, ORACLE_INTERVAL_JOIN),
    "q226_peak_concurrency": (q_peak_concurrency,
                              ORACLE_PEAK_CONCURRENCY),
})


# ---------------------- q228 chi-square test of independence

def q_chi_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Is event type independent of day-of-week? Pearson chi-square
    contingency cells (observed, expected under independence, cell
    chi2 term) — the drift/seasonality screening companion to q182's
    PSI. Day-of-week is pure integer epoch arithmetic ((days+4)%7,
    0=Sunday), identical under any session timezone; the float
    expressions are the shared formula strings both engines parse
    (operators/events_analytics.CHI2_*)."""
    ev = load(spark, sf_dir, "events")
    base = ev.selectExpr(
        "event_type",
        "(unix_micros(ts) div 86400000000 + 4) % 7 AS dow")
    return EA.chi_square_independence(base, "event_type", "dow") \
        .orderBy("event_type", "dow")


ORACLE_CHI_SQUARE = f"""
WITH {_EV_SQL},
b AS (SELECT event_type,
             (epoch_us(ts) // 86400000000 + 4) % 7 AS dow
      FROM ev
      WHERE event_type IS NOT NULL AND ts IS NOT NULL),
cells AS (SELECT event_type, dow, count(*) AS o FROM b GROUP BY 1, 2),
r AS (SELECT event_type, count(*) AS rt FROM b GROUP BY 1),
c AS (SELECT dow, count(*) AS ct FROM b GROUP BY 1),
g AS (SELECT count(*) AS n FROM b)
SELECT event_type, CAST(dow AS BIGINT) AS dow,
       CAST(o AS BIGINT) AS observed,
       {EA.CHI2_EXPECTED} AS expected,
       {EA.CHI2_TERM} AS chi2_term
FROM cells JOIN r USING (event_type) JOIN c USING (dow) CROSS JOIN g
"""

REGISTRY_EVENTS.update({
    "q228_chi_square": (q_chi_square, ORACLE_CHI_SQUARE),
})
