"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``industrial_data_pipeline_spark``; this file
is the thin registry adapter.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from industrial_data_pipeline_spark.suite import REGISTRY  # noqa: E402

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the time-series wide
    export (filter → broadcast dim joins → pivot), SURVEY.md §3.1."""
    fn, _ = REGISTRY["q02_export_pivot"]
    return fn(spark, SF0001)


# Queries holding a green (hash_match) verdict from a prior driver
# run — the r01 ∪ r02 ∪ r03 union, latest verdict wins, computed from
# the committed CORRECTNESS_r0*.json artifacts (134 greens; the only
# ever-red queries q43/q66/q108 were repaired this round and sort
# first). The driver truncates at ~50 queries/round, so the dict is
# ordered: repaired reds + never-driver-checked SURVEY §2 evidence
# rows first, then the 59 remaining never-checked round-3 additions
# in registration order, greens last. Greens carrying this round's
# behavior-identical plan fixes (q95 window→limit, q172 ntile→range
# boundaries, q123 driver-side derived-id assignment replacing the
# dimension-sized window, q168 staging-dir try/finally) stay listed
# green: each re-verified values=MATCH in the committed full-suite
# local artifact CORRECTNESS_LOCAL_r04.json after its change.
_VERIFIED_GREEN = {
    "q01_export_long", "q02_export_pivot", "q03_lookup_like",
    "q04_lookup_exact", "q05_leaf_heuristic", "q06_leaf_true",
    "q07_hierarchy_paths", "q08_attribute_paths",
    "q09_timestamp_range", "q100_variety_suppliers",
    "q101_scd2_user_state", "q102_table_profile", "q103_fk_audit",
    "q104_price_deciles", "q105_stream_dedup_counts",
    "q106_asof_forward", "q107_top_prices_with_ties",
    "q109_countmin_topk", "q10_watermark", "q110_conversion_latency",
    "q111_order_size_distribution", "q112_store_roundtrip",
    "q113_insert_element", "q114_insert_attribute_backfill",
    "q115_update_attribute", "q116_delete_attribute",
    "q117_mapping_roundtrip", "q118_ingest_cleanse",
    "q119_ingest_recovery", "q11_distinct_ts",
    "q120_stream_csv_roundtrip", "q121_derived_maintenance_stream",
    "q122_pi_batch_source", "q123_tree_reload", "q124_pi_crawler",
    "q125_bucketed_join_revenue", "q126_contamination",
    "q127_pii_redaction", "q128_sequence_packing", "q129_hash_split",
    "q12_grouped_stats", "q130_seasonal_baseline", "q131_roc_alarms",
    "q132_cluster_representatives", "q133_frame_sampling",
    "q134_image_resize", "q136_real_image_resize",
    "q13_above_global_avg", "q14_cascade_counts", "q15_orphan_purge",
    "q16_latest_per_key", "q17_dedup_first_wins",
    "q18_formula_backfill", "q199_transition_matrix",
    "q19_text_quality", "q200_sensor_fusion", "q20_token_counts",
    "q21_lang_id", "q22_fingerprints", "q23_exact_dedup",
    "q24_minhash_lsh_pairs", "q25_ngram_jaccard_pairs", "q26_simhash",
    "q27_simhash_pairs", "q28_ann_cosine_topk", "q29_ann_lsh_topk",
    "q30_ann_ivf_topk", "q31_multimodal_features",
    "q32_legacy_between", "q33_union_distinct",
    "q34_olap_pricing_summary", "q35_star_join",
    "q36_cosine_near_dup", "q37_cosine_near_dup_lsh",
    "q38_rollup_hourly", "q39_asof_rollup", "q40_locf_grid",
    "q41_interp_grid", "q42_rolling_anomaly", "q44_topk_per_group",
    "q45_funnel", "q46_grouped_percentiles", "q47_json_props",
    "q48_stratified_sample", "q49_shipping_priority",
    "q50_local_supplier_volume", "q51_order_priority_count",
    "q52_returned_items", "q53_customer_order_distribution",
    "q54_small_quantity_revenue", "q55_large_volume_customers",
    "q56_pricing_rollup", "q57_order_rank",
    "q58_cumulative_user_value", "q59_tfidf_top_terms",
    "q60_bigram_counts", "q61_dup_clusters",
    "q62_stream_hourly_counts", "q63_salted_skew_agg",
    "q64_interval_join", "q65_distinct_users", "q67_trend_slopes",
    "q68_quality_filter", "q69_incremental_dedup",
    "q70_approx_profile", "q71_token_rarity",
    "q72_repetition_metrics", "q73_nation_trade_volume",
    "q74_market_share", "q75_product_profit", "q76_promo_revenue",
    "q77_supplier_part_variety", "q78_disjunctive_revenue",
    "q79_sole_late_supplier", "q80_dormant_customers", "q81_kmeans",
    "q82_quantization_error", "q83_label_cohesion",
    "q84_neighbor_confusion", "q85_retention_cohorts",
    "q86_level_shifts", "q87_basket_pairs", "q88_price_histogram",
    "q89_interarrival_stats", "q90_weighted_sample", "q91_pagerank",
    "q92_sql_revenue", "q93_sql_cube", "q94_stream_enriched_counts",
    "q95_zipf_slope", "q96_salted_join_revenue",
    "q97_min_cost_supplier", "q98_important_inventory",
    "q99_top_supplier",
}

# Repaired / never-driver-checked SURVEY §2 evidence rows — the only
# queries whose absence blocks a §2 coverage line (F9: q135, T4:
# q138/q139) plus the three ex-red HUGEINT-oracle queries and q137
# (star-variant clustering, §2's dup-cluster scale path).
_VERIFY_FIRST = {
    "q43_sessionize", "q66_stream_sessionize",
    "q108_segment_priority_matrix", "q135_ingest_now_bound",
    "q137_dup_clusters_star", "q138_pi_datasource",
    "q139_pi_stream_source",
}


def _qnum(name: str) -> int:
    return int(name.split("_")[0][1:])


def _priority(name: str) -> tuple[int, int]:
    # Tier, then NUMERIC query id (registration order within a tier is
    # module-dependent and round 3 showed it pushes low-numbered
    # flagships like q140 past the ~50-query budget). Numeric order
    # makes the budget cut predictable: tier 0 (7) + the first 43
    # unchecked (q140–q186) land in round 4; the q187+ tail is round 5.
    if name in _VERIFY_FIRST:
        return (0, _qnum(name))
    if name in _VERIFIED_GREEN:
        return (2, _qnum(name))  # re-confirm only after the rest
    return (1, _qnum(name))  # never-driver-checked


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    ordered = sorted(REGISTRY, key=_priority)
    return {name: REGISTRY[name][0] for name in ordered}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted ⇒ rows-only check)."""
    return {name: sql for name, (_fn, sql) in REGISTRY.items() if sql}
