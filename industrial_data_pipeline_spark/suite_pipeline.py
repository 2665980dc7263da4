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
from industrial_data_pipeline_spark.suite_common import load
from industrial_data_pipeline_spark.suite_llm import _load_docs

_TOKS = "string_split_regex(trim(text), '\\s+')"
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
    distinct expansion or full sort. Approximate by design → rows-only
    driver check; error bounds vs the exact answers are asserted in
    tests/test_events_analytics.py.
    """
    ev = load(spark, sf_dir, "events")
    return (ev.groupBy("event_type")
            .agg(F.approx_count_distinct("user_id", rsd=0.02)
                 .alias("approx_users"),
                 F.percentile_approx("value", [0.5, 0.95], 10_000)
                 .alias("approx_p50_p95"),
                 F.count("*").alias("n_events"))
            .select("event_type", "approx_users",
                    F.round(F.col("approx_p50_p95")[0], 6).alias("p50"),
                    F.round(F.col("approx_p50_p95")[1], 6).alias("p95"),
                    "n_events"))


REGISTRY_PIPELINE: dict[str, tuple] = {
    "q68_quality_filter": (q_quality_filter, ORACLE_QUALITY_FILTER),
    "q69_incremental_dedup": (q_incremental_dedup,
                              ORACLE_INCREMENTAL_DEDUP),
    "q70_approx_profile": (q_approx_profile, None),
}
