"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query on sf0.001.
``queries()``    — named (spark, sf_dir) -> DataFrame callables, one
                   per implemented operator from SURVEY.md §2.
``oracle_sql()`` — DuckDB-runnable ANSI SQL equivalents; column names
                   are aliased identically on both sides (the driver
                   sorts columns by name and value-hashes).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from concurrent_etl_spark import catalog
from concurrent_etl_spark import queries_analytics  # noqa: F401 — registers queries
from concurrent_etl_spark import queries_catalog  # noqa: F401 — registers queries
from concurrent_etl_spark import queries_clustering  # noqa: F401 — registers queries
from concurrent_etl_spark import queries_llm  # noqa: F401 — registers queries
from concurrent_etl_spark import queries_llm2  # noqa: F401 — registers queries
from concurrent_etl_spark import queries_llm3  # noqa: F401 — registers queries
from concurrent_etl_spark import queries_llm4  # noqa: F401 — registers queries
from concurrent_etl_spark import queries_llm5  # noqa: F401 — registers queries
from concurrent_etl_spark import queries_llm6  # noqa: F401 — registers queries
from concurrent_etl_spark import queries_llm7  # noqa: F401 — registers queries
from concurrent_etl_spark import queries_llm8  # noqa: F401 — registers queries
from concurrent_etl_spark import queries_mining  # noqa: F401 — registers queries
from concurrent_etl_spark import queries_mining2  # noqa: F401 — registers queries
from concurrent_etl_spark import queries_relational2  # noqa: F401 — registers queries
from concurrent_etl_spark import queries_relational3  # noqa: F401 — registers queries
from concurrent_etl_spark import queries_relational4  # noqa: F401 — registers queries
from concurrent_etl_spark import queries_stats  # noqa: F401 — registers queries
from concurrent_etl_spark import queries_stats2  # noqa: F401 — registers queries
from concurrent_etl_spark import queries_streaming  # noqa: F401 — registers queries
from concurrent_etl_spark import queries_temporal  # noqa: F401 — registers queries
from concurrent_etl_spark import queries_tpch  # noqa: F401 — registers queries
from concurrent_etl_spark import queries_training  # noqa: F401 — registers queries
from concurrent_etl_spark import queries_tpch2  # noqa: F401 — registers queries
from concurrent_etl_spark import queries_tpch3  # noqa: F401 — registers queries
from concurrent_etl_spark.engine import DEFAULT_SF_DIR, load_tables
from concurrent_etl_spark.operators.etl import flagship_confirmation


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: lineitem fact -> 4-dim broadcast join chain -> load projection."""
    return flagship_confirmation(load_tables(spark, DEFAULT_SF_DIR))


#: Driver-verification rotation. The driver's correctness harness
#: checks a fixed-size 50-name prefix of ``queries()`` per round.
#: Ordering policy (VERDICT r4 items 1/2/8): the catalog is FROZEN
#: this round and the list below enumerates every driver-unchecked
#: name exactly once, in the order it should drain —
#:   1. the r5 window (50 never-checked names, loaded at the end of
#:      r4 — shipped unchanged per VERDICT item 1);
#:   2. the r4-late tranche (VERDICT item 8: green rows by
#:      CORRECTNESS_r06 at the latest);
#:   3. the five oldest r2/r3-era names the verdict called out by
#:      name (VERDICT item 2: inside the r6 window at the latest);
#:   4. every remaining unchecked name, FIRST-REGISTERED-FIRST
#:      (ordered by first appearance in git history), so old names
#:      are never again queue-jumped by newer tranches.
#: Already-verified names are pushed to the back by ``_rotated``;
#: the dict contents are identical either way — only ordering
#: changes. Cohorts 1-3 fill the r5+r6 windows (50+24) with 26
#: oldest cohort-4 names completing r6; the remaining 40 drain in
#: r7, taking the unchecked tail 140 -> 90 -> 40 -> 0.
_CHECK_FIRST = [
    # --- cohort 1: r5 driver window (positions 0-49), pinned ---
    "bellman_ford_weighted_hops",
    "bloom_filter_probe_audit",
    "jsonl_gzip_source_roundtrip",
    "isotonic_calibration_pav",
    "weighted_sample_ares",
    "pmi_collocations_topk",
    "image_sobel_edges",
    "multitouch_attribution_linear",
    "hits_hub_authority",
    "power_iteration_top_eigvec",
    "lateral_topk_per_entity",
    "hard_negative_mining",
    "modularity_communities_eval",
    "stream_static_enrich_roundtrip",
    "udtf_table_argument_sessions",
    "ams_f2_sketch",
    "conformal_threshold_coverage",
    "diff_in_differences",
    "k_anonymity_audit",
    "crosscorr_lead_lag",
    "txn_vacuum_retention_audit",
    "spearman_rank_correlation",
    "mutual_information_binned",
    "quantile_normalization_sources",
    "negative_sampling_table",
    "apriori_frequent_triples",
    "conversion_latency_quantiles",
    "dbscan_core_border_noise",
    "weighted_median_exact",
    "rate_burst_windows",
    "seasonal_zscore_anomalies",
    "rfm_segmentation",
    "link_prediction_jaccard",
    "cohort_ltv_curve",
    "event_path_trigrams",
    "embedding_centroid_drift",
    "mix_shift_decomposition",
    "key_skew_gini",
    "session_bounce_rate",
    "stream_multibatch_incremental_roundtrip",
    "revenue_concentration_deciles",
    "popularity_recsys_hitrate",
    "kendall_tau_concordance",
    "kruskal_wallis_rank_test",
    "average_precision_exact",
    "ljung_box_whiteness",
    "theilsen_robust_slope",
    "degree_assortativity",
    "personalized_pagerank_seeded",
    "ann_hubness_audit",
    # --- cohort 2: r4-late tranche (driver rows due by r6) ---
    "decontaminate_ngram_windows",
    "lsh_scurve_tuning_audit",
    "write_audit_publish_txn",
    "poisson_bootstrap_ci",
    "brier_score_decomposition",
    "phrase_query_positional",
    "mmr_diversified_topk",
    "winnowing_fingerprint",
    "skipgram_window_counts",
    "heaps_law_curve",
    "zorder_layout_audit",
    "dp_randomized_response",
    "source_ablation_influence",
    "containment_similarity_join",
    "winnowing_overlap_pairs",
    "hrw_shard_rebalance_audit",
    "partition_backfill_planner",
    "merkle_partition_diff",
    "delta_method_ratio_variance",
    # --- cohort 3: oldest r2/r3-era names (verdict item 2) ---
    "integrity_constraint_audit",
    "zorder_locality",
    "incremental_agg_merge",
    "label_propagation_communities",
    "benford_digit_audit",
    # --- cohort 4: remaining unchecked, first-registered-first ---
    "tumbling_window_agg",
    "json_props_extract",
    "join_right",
    "join_cross",
    "scalar_subquery_filter",
    "having_filter",
    "cube_agg",
    "conditional_agg",
    "pivot_status_by_priority",
    "window_lag_lead_running",
    "date_arithmetic",
    "null_scalars",
    "lateral_explode_tokens",
    "union_all_dedup",
    "sort_nulls_ordering",
    "grouping_sets_agg",
    "exists_correlated",
    "cte_revenue_topn",
    "unpivot_measures",
    "hash_sample",
    "regional_supplier_volume",
    "price_histogram",
    "null_safe_join_agg",
    "range_frame_running_value",
    "token_length_histogram",
    "vocab_coverage_topk",
    "data_mixture_sampling",
    "bigram_doc_score",
    "contamination_check",
    "multiset_intersect_except",
    "pattern_predicate_stats",
    "collect_sorted_suppliers",
    "explode_outer_tokens",
    "rolling_hash_fingerprint",
    "ann_recall_eval",
    "knn_label_vote",
    "decimal_money_arithmetic",
    "curation_rank_topk",
    "corpus_composition",
    "boolean_agg_family",
    "train_eval_split",
    "schema_evolution_union",
    "token_count_bpe_regex",
    "json_struct_map_parse",
    "embedding_quantize_int8",
    "sql_interface_weekly_share",
    "array_hof_family",
    "map_functions_family",
    "bpe_pair_merge_step",
    "token_diversity_simpson",
    "minhash_containment",
    "blocked_candidate_pairs",
    "embedding_norm_buckets",
    "stratified_sample_quota",
    "dedup_keep_best",
    "rolling_zscore_anomaly",
    "audio_window_energy",
    "image_bmp_resize",
    "zipf_slope_fit",
    "spatial_radius_pairs",
    "sequence_pattern_match",
    "pps_systematic_sample",
    "jl_random_projection",
    "yoy_revenue_growth",
    "cdc_apply_changes",
    "attribution_left_outer",
    # --- cohort 5: post-freeze registrations (r7+) — appended in
    #     registration order, behind every frozen-era name ---
    "image_jpeg_decode",
    "image_jpeg_color_decode",
    "unicode_casefold_dedup",
    "dedup_simhash64",
    "image_jpeg_progressive_decode",
]

#: Re-verification tier (VERDICT r7 item 4). Every name below is
#: already driver-green, but its Spark plan or oracle text changed
#: AFTER the round that verified it — the r7 ascii_fold sweep
#: touched every tokenize path, the r7 broadcast-hint audit changed
#: 18 physical plans, and round 8 itself edited token_count_bpe
#: (trim() drop) and triangle_count (degree-table persist). With the
#: catalog at 339/339 verified, the 50-name window is free capacity:
#: ``_rotated`` orders these FIRST within the verified tail so the
#: driver re-proves plan-changed-since-last-verified names before
#: burning slots on untouched ones. Names fall off this list once a
#: CORRECTNESS artifact newer than the change records them green
#: (kept simple: the list is pruned by hand each round).
_REVERIFY = [
    # round-8 semantic/plan edits first
    "token_count_bpe_regex",
    "triangle_count",
    # ascii_fold-touched (r7 UNICODE_SET; r1-r5-era rows predate the fold)
    "ams_f2_sketch",
    "chunk_documents_udtf",
    "bigram_doc_score",
    "bigram_lm_counts",
    "ccnet_perplexity_buckets",
    "contamination_check",
    "curation_pipeline",
    "dedup_exact",
    "dedup_incremental_batch",
    "dedup_simhash",
    "dsir_importance_resample",
    "feature_hashing",
    "heaps_law_curve",
    "lsh_scurve_tuning_audit",
    "minhash_containment",
    "negative_sampling_table",
    "ngram_novelty",
    "pmi_collocations_topk",
    "rolling_hash_fingerprint",
    "text_stats",
    "tfidf_top_terms",
    "token_diversity_simpson",
    "unigram_logprob_quality",
    "vocab_coverage_topk",
    "winnowing_fingerprint",
    "winnowing_overlap_pairs",
    "zipf_slope_fit",
    # more fold-touched text rows verified r1-r5, pre-fold
    "lateral_explode_tokens",
    "c4_line_filters",
    "gopher_quality_rules",
    "text_normalize_dedup",
    "explode_outer_tokens",
    "dedup_detector_agreement",
    "duplicate_span_pairs",
    "auc_roc_exact",
    "isotonic_calibration_pav",
    # broadcast-audit plan-changed (r7 hint drops), not covered above
    "prefix_filter_jaccard_join",
    "retrieval_eval_ndcg",
    "skipgram_window_counts",
    "bfs_bipartite_hops",
    "link_prediction_jaccard",
    "degree_assortativity",
    "personalized_pagerank_seeded",
    "pagerank_bipartite",
    "ab_srm_bucketing_audit",
    "tpch_q2_min_cost_supplier",
    "tpch_q11_important_stock",
    "tpch_q16_supplier_counts",
    "tpch_q20_promotion_suppliers",
    "tpch_q21_waiting_suppliers",
]

def _driver_verified() -> set[str]:
    """Names already driver-green in ANY past round's artifact.

    Reads CORRECTNESS_r*.json as the SINGLE source of truth (no
    hardcoded name lists — a second copy could diverge if an
    artifact row is later invalidated): once the driver records a
    passing row for a query, that query yields its prefix slot to
    still-unchecked ones automatically next round. A row counts only
    if every recorded check passed — failures stay in front to be
    rechecked after a fix.
    """
    import glob
    import json
    import os

    verified: set[str] = set()
    here = os.path.dirname(os.path.abspath(__file__))
    for path in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        try:
            with open(path) as f:
                rows = json.load(f)
        except (OSError, ValueError):
            continue
        for name, row in rows.items():
            if not isinstance(row, dict):
                continue
            checks = [
                v
                for k, v in row.items()
                if k.endswith("_match") and v is not None
            ]
            if checks and all(checks) and not row.get("err"):
                verified.add(name)
    return verified


def _rotated(names: dict) -> list[str]:
    done = _driver_verified()
    front = [n for n in _CHECK_FIRST if n in names and n not in done]
    # verified tail: plan-changed-since-last-verified first
    reverify = [n for n in _REVERIFY if n in names and n in done]
    back = [n for n in names if n in done and n not in set(reverify)]
    placed = set(front) | set(reverify) | set(back)
    middle = [n for n in names if n not in placed]
    return front + middle + reverify + back


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {n: catalog.QUERIES[n] for n in _rotated(catalog.QUERIES)}


def oracle_sql() -> dict[str, str]:
    return {n: catalog.ORACLES[n] for n in _rotated(catalog.ORACLES)}
