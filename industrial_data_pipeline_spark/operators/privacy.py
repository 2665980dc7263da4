"""Privacy-risk auditing for training-data exports.

The reference pipeline ships raw industrial telemetry with user- and
site-identifying dimensions straight into analyst-facing exports
(web_app.py export endpoints); a modern training-data pipeline must
instead PROVE an export's re-identification risk before release.
q127 redacts content (PII regexes), q184 rotates identity (salted
pseudonyms); this module audits STRUCTURE: k-anonymity (is every
quasi-identifier combination shared by >= k records?) and l-diversity
(does every group carry >= l distinct sensitive values, so group
membership doesn't leak the sensitive attribute?) — Sweeney 2002 /
Machanavajjhala et al. 2007, both public literature.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def k_anonymity_audit(df: DataFrame, quasi_cols: list[str],
                      sensitive_col: str, k: int = 5, l: int = 2,
                      round_dp: int = 6) -> DataFrame:
    """Per-equivalence-class privacy audit. Groups ``df`` by the
    quasi-identifier columns and reports, per group: ``group_size``,
    ``n_sensitive`` (distinct sensitive values), ``pct_of_table``,
    and the two violation flags — ``k_violation`` (size < k: the
    group is re-identifiable) and ``l_violation`` (fewer than l
    distinct sensitive values: membership discloses the attribute).
    A release gate suppresses or generalizes exactly the flagged
    rows; emitting the full per-group table keeps the audit itself
    checkable.

    NULL semantics (deliberate, conservative): ``count_distinct``
    ignores NULL sensitive values, so an all-NULL group reports
    ``n_sensitive = 0`` and partial NULLs don't add diversity — NULL
    never *satisfies* l-diversity, so the audit over-flags rather
    than under-flags (a NULL sensitive value offers the attacker no
    ambiguity an analyst can rely on). Callers who model NULL as a
    real category should ``coalesce(sensitive_col, '<null>')``
    before calling.

    Scale shape: one groupBy shuffle over the quasi-identifier key
    (map-side combined; distinct-count via the same hash aggregate),
    plus a broadcast 1-row total for the percentage — no window, no
    second pass over the fact table. Equivalence-class cardinality is
    bounded by the quasi-identifier domain product, so the output is
    dimension-sized regardless of input row count.
    """
    total = df.agg(F.count("*").alias("_total"))
    return (df.groupBy(*quasi_cols)
            .agg(F.count("*").alias("group_size"),
                 F.count_distinct(F.col(sensitive_col))
                 .alias("n_sensitive"))
            .crossJoin(F.broadcast(total))
            .select(*quasi_cols, "group_size", "n_sensitive",
                    F.round(F.col("group_size")
                            / F.col("_total").cast("double"),
                            round_dp).alias("pct_of_table"),
                    (F.col("group_size") < k).alias("k_violation"),
                    (F.col("n_sensitive") < l).alias("l_violation")))
