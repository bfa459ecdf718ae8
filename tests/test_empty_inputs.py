"""Empty-input robustness: a representative query from every family
must run (not crash) against zero-row tables — the behavior of a
pipeline pointed at an empty ingest day."""

from __future__ import annotations

import os

import pytest

from kinesis_analytics_demo_spark.caching import release_tracked
from kinesis_analytics_demo_spark.plans.registry import all_queries
from tests.conftest import SF_SMALL, TABLE_NAMES

SAMPLE = [
    "pricing_summary",
    "candlestick_tumbling",
    "dedup_exact",
    "dedup_minhash_pairs",
    "dedup_minhash_clusters",
    "text_quality_score",
    "similarity_cosine_topk",
    "corpus_prep_pipeline",
    "exact_percentiles",
    "sessionize_events",
    "quantile_histogram_events",
    "corr_matrix_lineitem",
    "pagerank_trade_graph",
    "doc_lm_cross_entropy",
    "rollup_hierarchy_events",
    "cumulate_window_revenue",
    "data_quality_expectations",
    "corpus_token_budget_select",
    "temporal_split_embargo",
    "bm25_search",
    "cdc_upsert_latest",
    "asof_join_events",
    "zorder_key_events",
    "embedding_sq8_error",
    "similarity_rp_topk_rerank",
    # round-4 families
    "corpus_dsir_weights",
    "bpe_pair_counts",
    "bpe_train_merges",
    "k_anonymity_audit",
    "l_diversity_audit",
    "label_knn_disagreement",
    "dedup_image_phash",
    "attribution_last_touch",
    "inverted_index_incremental_merge",
    "corpus_rebalance_shards",
    "dp_noisy_counts",
    # round-4 batch-3 families
    "fuzzy_match_entity_names",
    "pareto_quality_frontier",
    "cluster_topic_terms",
    "dedup_containment_pairs",
    "dedup_cross_source_matrix",
    "skew_profile_lineitem",
    "anomaly_mad_events",
    "bootstrap_ci_event_values",
    "ab_test_welch_events",
    "cusum_changepoint_events",
    # round-5 families
    "attribution_position_weighted",
    "collocation_lift_bigrams",
    "quantile_normalize_sources",
    "holt_forecast_event_types",
    "gini_user_revenue",
    "roc_auc_purchase_propensity",
    "lift_gains_deciles",
    "survival_km_conversion",
    "benford_first_digit_values",
    "similarity_topk_label_quota",
    "similarity_mmr_diversified",
    "hll_distinct_event_ids",
    "ams_f2_user_events",
    "feature_drift_halves",
    "retrieval_rrf_fusion",
    # round-6 families
    "textrank_keywords",
    "hll_rolling_distinct_users",
    "theil_sen_trend_event_types",
    "calibration_bins_propensity",
    "winnowing_fingerprint_matches",
    "ngram_novelty_decay",
    "langid_confusion_audit",
    "multimodal_keyframe_select",
    "retrieval_prf_expansion",
    # round-6 second-session families
    "acf_event_type_daily",
    "ivf_kmeans_balance_audit",
    "mann_kendall_event_types",
    "ccf_view_purchase_daily",
    "graph_kcore_membership",
    "hill_tail_index_event_values",
    "repeated_substring_audit",
    "heavy_hitters_spacesaving",
    "woe_iv_feature_screening",
    "matrix_profile_daily",
    "gd_quality_classifier_train",
    "bitmap_type_overlap",
    "incremental_agg_maintenance",
    "did_error_impact",
    "markov_attribution_removal",
    "stratified_kfold_assignment",
    "markov_next_event_accuracy",
    "ranker_agreement_tau",
    # round-6 third-session families
    "ks_test_purchase_view",
    "lorenz_curve_deciles",
    "burstiness_interevent",
    "user_diversity_entropy",
    "shapley_attribution_exact",
    "adamic_adar_link_prediction",
    "isotonic_calibration_pava",
    "power_iteration_top_pc",
    "rfm_segmentation",
    "abc_classification_parts",
    "conformal_interval_event_values",
    "chao1_vocab_estimate",
    "largest_remainder_quota",
    "mutual_nearest_neighbors",
    "readability_flesch_docs",
    "sprt_purchase_rate",
    "good_turing_counts",
    "kneser_ney_bigram_probs",
    # (streaming_* replays are excluded: the replay source needs a
    # single parquet FILE per table, the empty fixture writes a dir)
    "hurst_exponent_daily",
    "sax_words_daily",
    "cramers_v_type_weekday",
    "theil_index_by_type",
    "source_loo_influence",
    "retrieval_ndcg_audit",
    # round-9: the adaptive-centroid bucketed twins — their 1-row
    # stats agg divides by the corpus count, which an empty table
    # turned into an ANSI div-by-zero before the greatest(n, 1)
    # guard (ADVICE r8)
    "dedup_embedding_cosine_bucketed",
    "dedup_embedding_clusters",
    "mutual_nearest_neighbors_bucketed",
    "label_knn_disagreement_bucketed",
]


@pytest.fixture(scope="module")
def empty_sf(spark, tmp_path_factory):
    dst = str(tmp_path_factory.mktemp("empty_sf"))
    for t in TABLE_NAMES:
        p = os.path.join(SF_SMALL, f"{t}.parquet")
        if os.path.exists(p):
            spark.read.parquet(p).limit(0).coalesce(1).write.mode(
                "overwrite"
            ).parquet(os.path.join(dst, f"{t}.parquet"))
    return dst


@pytest.mark.parametrize("name", SAMPLE)
def test_query_survives_empty_tables(spark, empty_sf, name):
    try:
        df = all_queries()[name].fn(spark, empty_sf)
        assert df.count() >= 0
        assert len(df.columns) > 0
    finally:
        release_tracked()
