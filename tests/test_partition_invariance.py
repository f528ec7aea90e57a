"""Partition-count invariance: the catalog's determinism contract.

Every oracle-checked query must produce bit-identical values no
matter how the data is partitioned — that is what makes the DuckDB
comparison meaningful and what makes results stable between a 4-core
laptop and a 1000-executor cluster. The decimal-accumulation and
rounded-message-passing conventions exist exactly for this; these
tests re-execute representative float-accumulating queries under a
deliberately tiny shuffle-partition count and compare full result
sets against the default-partitioning run.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"

#: queries whose results pass through float aggregation, iterative
#: message passing, or global ordering — the partition-sensitive risks
SPOT_CHECK = [
    "groupby_agg_pricing",
    "stats_moments",
    "tfidf_top_terms",
    "bigram_doc_score",
    "pagerank_bipartite",
    "vocab_coverage_topk",
    "regression_per_user",
    "corr_family_exact",
    "approx_median_bounded",
    "tpch_q8_market_share",
    "tpch_q14_promo_revenue",
    "tpch_q2_min_cost_supplier",
    "tpch_q11_important_stock",
    "tpch_q21_waiting_suppliers",
    "token_count_bpe_regex",
    "sql_interface_weekly_share",
    "cms_frequency_sketch",
    "array_hof_family",
    "bucketed_colocated_join",
    # round-2 additions: fixed-point embedding sums, hash-based
    # sampling, integer-ratio diversity, LSH-candidate containment
    "embedding_norm_buckets",
    "stratified_sample_quota",
    "token_diversity_simpson",
    "minhash_containment",
    # round-2 second tranche: content-keyed span sampling, iterative
    # label voting, log-quantized moments, cumulative PPS thresholds,
    # float projections, grid-bucketed distances
    "duplicate_span_pairs",
    "label_propagation_communities",
    "zipf_slope_fit",
    "pps_systematic_sample",
    "jl_random_projection",
    "spatial_radius_pairs",
    "incremental_agg_merge",
    # third tranche: collect_list ordering, multi-detector composition
    "sequence_pattern_match",
    "dedup_detector_agreement",
    # round-4: DSIR's decimal log-ratio sums, temperature quotas from
    # decimal sqrt, silhouette's decimal means, RRF's decimal fusion
    # and the eval's literal-DECIMAL metrics, the skyline's bucketed
    # prefix max (partitioning-shaped by construction), BPE's global
    # top-k tie-break, line dedup's join-through counts, k-core's
    # fixed-round peel
    "dsir_importance_resample",
    "temperature_resample_mixture",
    "cluster_silhouette_eval",
    "token_budget_epochs",
    "line_dedup_ccnet",
    "bpe_merge_candidates",
    "rrf_hybrid_retrieval",
    "retrieval_eval_ndcg",
    "skyline_pareto_parts",
    "kcore_interaction_prune",
    "classifier_calibration_bins",
    "video_scene_cuts",
    "er_blocked_fuzzy_match",
    "cusum_mean_shift",
    # round-4 eval tranche: rank-sum cumsums, rounded-ln cumulations,
    # decimal moments, argmax windows
    "auc_roc_exact",
    "kaplan_meier_survival",
    "cuped_variance_reduction",
    "info_gain_feature_split",
    "naive_bayes_langid",
    "isotonic_calibration_pav",
    "weighted_sample_ares",
    "pmi_collocations_topk",
    "multitouch_attribution_linear",
    "hits_hub_authority",
    "power_iteration_top_eigvec",
    "ams_f2_sketch",
    "udtf_table_argument_sessions",
    "spearman_rank_correlation",
    "mutual_information_binned",
    "dbscan_core_border_noise",
    "weighted_median_exact",
    "conversion_latency_quantiles",
    "rfm_segmentation",
    "link_prediction_jaccard",
    "key_skew_gini",
    "mix_shift_decomposition",
    "embedding_centroid_drift",
    "revenue_concentration_deciles",
    # round-5 (verification round): the r4-late tranche enters the
    # driver window next — every partition-sensitive shape in it gets
    # the invariance check BEFORE the driver sees it. Rank cumsums
    # (Kendall/KW/AP/Ljung-Box), median-of-slopes, iterative decimal
    # message passing, md5-coin bootstraps, greedy unrolled argmax
    # ties, window-min fingerprint selection, df-gated pair emitters,
    # HRW argmax packing, Merkle hash concat-aggs, decimal
    # cross-moments
    "kendall_tau_concordance",
    "kruskal_wallis_rank_test",
    "average_precision_exact",
    "ljung_box_whiteness",
    "theilsen_robust_slope",
    "degree_assortativity",
    "personalized_pagerank_seeded",
    "ann_hubness_audit",
    "decontaminate_ngram_windows",
    "lsh_scurve_tuning_audit",
    "poisson_bootstrap_ci",
    "brier_score_decomposition",
    "phrase_query_positional",
    "mmr_diversified_topk",
    "winnowing_fingerprint",
    "winnowing_overlap_pairs",
    "skipgram_window_counts",
    "heaps_law_curve",
    "zorder_layout_audit",
    "dp_randomized_response",
    "source_ablation_influence",
    "containment_similarity_join",
    "hrw_shard_rebalance_audit",
    "partition_backfill_planner",
    "merkle_partition_diff",
    "delta_method_ratio_variance",
    # round-5 window completion: every remaining driver-window name
    # with a partition-sensitive shape — iterative relax rounds
    # (Bellman-Ford), modularity's degree cross-moments, conformal
    # quantile thresholds, DiD / lead-lag cross-moments, rank-based
    # quantile normalization, md5-coin negative sampling, support-
    # gated triple counting, windowed burst rates, seasonal moments,
    # cohort cumsums, path trigram ordering, bounce ratios, hit-rate
    # joins, k-anonymity grouping, per-entity top-k ties, margin-
    # ranked negatives, bloom probe counts
    "bellman_ford_weighted_hops",
    "bloom_filter_probe_audit",
    "lateral_topk_per_entity",
    "hard_negative_mining",
    "modularity_communities_eval",
    "conformal_threshold_coverage",
    "diff_in_differences",
    "k_anonymity_audit",
    "crosscorr_lead_lag",
    "quantile_normalization_sources",
    "negative_sampling_table",
    "apriori_frequent_triples",
    "rate_burst_windows",
    "seasonal_zscore_anomalies",
    "cohort_ltv_curve",
    "event_path_trigrams",
    "session_bounce_rate",
    "popularity_recsys_hitrate",
]


def _canon(df):
    cols = sorted(df.columns)
    return sorted(
        tuple(str(row[c]) for c in cols) for row in df.collect()
    )


@pytest.mark.parametrize("name", SPOT_CHECK)
def test_result_invariant_under_partitioning(spark, name):
    queries = entrymod.queries()
    fn = queries[name]

    baseline = _canon(fn(spark, SF_DIR))

    orig = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        reshuffled = _canon(fn(spark, SF_DIR))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig)

    assert baseline == reshuffled
