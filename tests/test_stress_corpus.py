"""Adversarial stress-corpus regression net.

``tools/make_stress_data.py`` builds a schema-identical corpus whose
content holds the degenerate pockets a real 100 TB corpus is
guaranteed to contain (empty / whitespace / 1-token documents,
zero-norm and identical embeddings, tied timestamps, a priority /
segment class that is entirely absent, zero weights and prices,
leading-space strings, non-ASCII text). Round 5's full-catalog run of
the oracle gate over that corpus surfaced 32 latent failures in six
mechanistic classes; each got a two-engine fix. This suite pins every
one of those queries to the stress corpus forever — the Spark result
and the DuckDB oracle must agree on rowcount, column set, and an
order-insensitive value hash, exactly the driver's comparison.

Mechanism classes covered (see the round-5 commits for the fixes):
  1. ANSI DIVIDE_BY_ZERO job kills: zero-norm cosine, zero weights
     (A-Res), zero-variance correlations (CUPED / crosscorr / delta
     method / hubness skew), empty-union Jaccard (RRF).
  2. Quadratic empty-doc LSH blow-up + cross-engine pair-set
     divergence (concat_ws-skips-NULL vs NULL band hash).
  3. DuckDB array_to_string([], sep) = NULL vs Spark '' before md5.
  4. Empty-input plan hazards: zero-arg create_map (VOID type),
     slice() with a -1 length.
  5. Representation edges: IEEE -0.0 after rounding, first BYTE vs
     first CODEPOINT of a non-ASCII payload, XML surrounding-space
     trimming, unfiltered-vs-filtered empty tokens in explode.
  6. Absent-class semantics: rank tests emit zero rows (not NULL
     rows) when a sample class is missing; quantile grids survive
     zero converters.
"""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

import duckdb
import pytest

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT / "tools"))

from check_oracle import TABLES, value_hash  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402

#: every query the round-5 stress sweep flagged (plus ks_two_sample,
#: which got the same absent-class guard preemptively)
STRESS_SET = [
    # class 1: division guards
    "ann_topk_cosine",
    "embedding_neardup_lsh",
    "ann_recall_eval",
    "knn_label_vote",
    "ann_hubness_audit",
    "hard_negative_mining",
    "ivf_ann_topk",
    "jl_random_projection",
    "weighted_sample_ares",
    "crosscorr_lead_lag",
    "cuped_variance_reduction",
    "delta_method_ratio_variance",
    "rrf_hybrid_retrieval",
    "retrieval_eval_ndcg",
    "dedup_fuzzy_levenshtein",
    # class 2+3: dedup family / md5 canon
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_clusters",
    "dedup_keep_best",
    "dedup_detector_agreement",
    "minhash_containment",
    "text_stats",
    "llm_pipeline_end2end",
    # class 4: empty-input plan hazards
    "conversion_latency_quantiles",
    "mann_whitney_u",
    "ks_two_sample",
    "bigram_doc_score",
    "bigram_lm_counts",
    "curation_rank_topk",
    # class 5: representation edges
    "array_hof_family",
    "multimodal_features",
    "lateral_explode_tokens",
    "xml_source_roundtrip",
]


@pytest.fixture(scope="module")
def stress_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("stress_sf")
    subprocess.run(
        [sys.executable, str(REPO_ROOT / "tools" / "make_stress_data.py"), str(d)],
        check=True,
        capture_output=True,
    )
    return str(d)


@pytest.fixture(scope="module")
def oracle_con(stress_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{stress_dir}/{t}.parquet'"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", STRESS_SET)
def test_stress_query_matches_oracle(spark, stress_dir, oracle_con, name):
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    try:
        sdf = queries[name](spark, stress_dir).toPandas()
    finally:
        spark.catalog.clearCache()
    odf = oracle_con.sql(oracles[name]).fetchdf()
    assert sorted(sdf.columns) == sorted(odf.columns)
    assert len(sdf) == len(odf)
    assert value_hash(sdf) == value_hash(odf)


# ---------------------------------------------------------------------------
# zero-row corpus: the "empty day-partition feed" case
# ---------------------------------------------------------------------------

#: every query the round-5 EMPTY-corpus sweep flagged — driver-side
#: collects that crashed on zero rows (centroid literals, int(None)
#: scalars, empty create_map, a literal 1/n division), empty-write
#: parquet audits that could not re-read their fixture, NULL-vs-0
#: aggregate edges, and the cube/rollup empty-relation semantics now
#: pinned in the oracles
EMPTY_SET = [
    "kmeans_embedding_clusters",
    "semantic_dedup_prune",
    "cluster_silhouette_eval",
    "pq_ann_topk",
    "kendall_tau_concordance",
    "theilsen_robust_slope",
    "gd_quality_classifier",
    "classifier_calibration_bins",
    "pagerank_bipartite",
    "personalized_pagerank_seeded",
    "global_id_assignment",
    "skyline_pareto_parts",
    "conformal_threshold_coverage",
    "k_anonymity_audit",
    "degree_assortativity",
    "triangle_count",
    "gdpr_erasure_audit",
    "partitioned_merge_audit",
    "parquet_zonemap_audit",
    "dynamic_partition_pruning_audit",
    "cube_agg",
    "rollup_agg",
    "grouping_sets_agg",
]


@pytest.fixture(scope="module")
def empty_dir(tmp_path_factory):
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("empty_sf")
    for t in TABLES:
        schema = pq.read_schema(f"/root/testdata/sf0.001/{t}.parquet")
        pq.write_table(schema.empty_table(), str(d / f"{t}.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def empty_con(empty_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{empty_dir}/{t}.parquet'"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", EMPTY_SET)
def test_empty_corpus_query_matches_oracle(spark, empty_dir, empty_con, name):
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    try:
        sdf = queries[name](spark, empty_dir).toPandas()
    finally:
        spark.catalog.clearCache()
    odf = empty_con.sql(oracles[name]).fetchdf()
    assert sorted(sdf.columns) == sorted(odf.columns)
    assert len(sdf) == len(odf)
    assert value_hash(sdf) == value_hash(odf)


# ---------------------------------------------------------------------------
# partition invariance ON the tie-heavy corpus
# ---------------------------------------------------------------------------

#: the stress corpus is deliberately tie-saturated (identical texts,
#: identical vectors, equal weights/prices, shared timestamps) — the
#: exact content where a missing tie-break turns partition order into
#: the result. These queries' argmax/top-k/sampling paths re-run
#: under shuffle.partitions=3 must be bit-identical.
TIE_SENSITIVE = [
    "dedup_minhash_lsh",
    "dedup_clusters",
    "dedup_keep_best",
    "minhash_containment",
    "weighted_sample_ares",
    "rrf_hybrid_retrieval",
    "mmr_diversified_topk",
    "ann_topk_cosine",
    "kendall_tau_concordance",
    "weighted_median_exact",
    "rfm_segmentation",
    "skyline_pareto_parts",
    "heavy_hitters_tokens",
    "window_topk_per_group",
]


def _canon_rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(str(row[c]) for c in cols) for row in df.collect())


@pytest.mark.parametrize("name", TIE_SENSITIVE)
def test_stress_partition_invariance(spark, stress_dir, name):
    fn = entrymod.queries()[name]
    try:
        baseline = _canon_rows(fn(spark, stress_dir))
        orig = spark.conf.get("spark.sql.shuffle.partitions")
        try:
            spark.conf.set("spark.sql.shuffle.partitions", "3")
            reshuffled = _canon_rows(fn(spark, stress_dir))
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", orig)
    finally:
        spark.catalog.clearCache()
    assert baseline == reshuffled


# ---------------------------------------------------------------------------
# single-day corpus: the degenerate trend-fit domain (ADVICE r5)
# ---------------------------------------------------------------------------

#: queries whose math degenerates when the whole corpus spans ONE
#: day (zero day-pairs): the Theil-Sen slope median is empty, and a
#: substituted slope of 0 would silently diverge from the oracle's
#: NULL-through-CTE propagation (slope_e4 AND intercept_e4 NULL).
ONE_DAY_SET = [
    "theilsen_robust_slope",
    # round-6 full one-day sweep finds: ANSI float-division job kills
    # on zero-variance / zero-weight degeneracies, each now a
    # NULL-propagating guard matching the oracle (DuckDB x/0 = NULL)
    "spearman_rank_correlation",  # n=1 -> zero rank variance
    "kruskal_wallis_rank_test",  # n=1 -> 0/0 tie correction
    "poisson_bootstrap_ci",  # all-zero Poisson replicate weights
]


@pytest.fixture(scope="module")
def one_day_dir(tmp_path_factory):
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("one_day_sf")
    for t in TABLES:
        src = f"/root/testdata/sf0.001/{t}.parquet"
        if t == "orders":
            tab = pq.read_table(src)
            first = pc.min(tab.column("o_orderdate")).as_py()
            tab = tab.filter(pc.equal(tab.column("o_orderdate"), first))
            assert tab.num_rows >= 1
            pq.write_table(tab, str(d / f"{t}.parquet"))
        else:
            pq.write_table(pq.read_table(src), str(d / f"{t}.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def one_day_con(one_day_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{one_day_dir}/{t}.parquet'"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", ONE_DAY_SET)
def test_one_day_corpus_query_matches_oracle(spark, one_day_dir, one_day_con, name):
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    try:
        sdf = queries[name](spark, one_day_dir).toPandas()
    finally:
        spark.catalog.clearCache()
    odf = one_day_con.sql(oracles[name]).fetchdf()
    assert sorted(sdf.columns) == sorted(odf.columns)
    assert len(sdf) == len(odf)
    assert value_hash(sdf) == value_hash(odf)
    # the degeneracy must actually be exercised: one observed day
    if name == "theilsen_robust_slope":
        assert len(sdf) == 1 and sdf["slope_e4"].isna().all()


# ---------------------------------------------------------------------------
# NULL-text corpus: the residual md5-canon asymmetry (ADVICE r5)
# ---------------------------------------------------------------------------

#: the hash-canon / dedup family: every query whose cross-engine
#: agreement depends on how NULL text canonicalizes before md5.
#: Spark's array_join over a NULL token array is NULL while the
#: oracles' md5(coalesce(array_to_string(...), '')) hashes to
#: md5('') — operators/text.content_hash and text_stats now coalesce
#: identically, so a NULL-text document groups with empty/whitespace
#: documents in BOTH engines.
NULL_TEXT_SET = [
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_clusters",
    "dedup_keep_best",
    "dedup_detector_agreement",
    "minhash_containment",
    "text_stats",
    "llm_pipeline_end2end",
    # round-6 full null-text sweep finds, each fixed two-engine:
    "multimodal_features",  # pandas UDF len(None) -> NULL features
    "multimodal_features_arrow",  # pa scalar null: as_py() is None
    "multimodal_resize",  # None decode -> NULL clip/md5
    "multimodal_frame_sample",  # NULL payload -> zero frames
    "warc_source_roundtrip",  # NULL doc never became a crawl record
    "greedy_pack_bins",  # NULL text packs as 0 tokens (both engines)
    "quantile_normalization_sources",  # unmeasured docs excluded
    "average_precision_exact",  # unscorable docs excluded
    "gd_quality_classifier",  # featureless docs excluded (train+eval)
    "classifier_calibration_bins",  # featureless docs excluded
]


@pytest.fixture(scope="module")
def null_text_dir(tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("null_text_sf")
    for t in TABLES:
        src = f"/root/testdata/sf0.001/{t}.parquet"
        tab = pq.read_table(src)
        if t == "documents":
            cols = {c: tab.column(c).to_pylist() for c in tab.column_names}
            n_nulled = 0
            for i in range(len(cols["doc_id"])):
                # three NULL-text rows (two must GROUP together in
                # dedup_exact alongside any empty/whitespace docs)
                if cols["doc_id"][i] % 97 == 5 and n_nulled < 3:
                    cols["text"][i] = None
                    cols["n_chars"][i] = None
                    n_nulled += 1
            assert n_nulled == 3
            tab = pa.table(cols, schema=tab.schema)
        pq.write_table(tab, str(d / f"{t}.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def null_text_con(null_text_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{null_text_dir}/{t}.parquet'"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", NULL_TEXT_SET)
def test_null_text_corpus_query_matches_oracle(
    spark, null_text_dir, null_text_con, name
):
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    try:
        sdf = queries[name](spark, null_text_dir).toPandas()
    finally:
        spark.catalog.clearCache()
    odf = null_text_con.sql(oracles[name]).fetchdf()
    assert sorted(sdf.columns) == sorted(odf.columns)
    assert len(sdf) == len(odf)
    assert value_hash(sdf) == value_hash(odf)


# ---------------------------------------------------------------------------
# all-duplicate corpus: the pathological dedup input (round 6)
# ---------------------------------------------------------------------------

#: every document IDENTICAL — the worst case for pair-emitting
#: detectors (one LSH bucket holds the whole corpus; every pair is a
#: true duplicate). The round-6 full 338-query gate over this corpus
#: was green with no code changes — the df-gates (containment/span
#: windows drop tokens with df > cap as boilerplate), the banding
#: design (candidates bounded by true-duplicate mass, which here IS
#: C(n,2)), and hash-min cluster formation (one cluster) all hold;
#: this suite pins the representative family so that stays true.
ALL_DUP_SET = [
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_clusters",
    "dedup_keep_best",
    "minhash_containment",
    "duplicate_span_pairs",
    "containment_similarity_join",
    "prefix_filter_jaccard_join",
    "winnowing_overlap_pairs",
    "decontaminate_ngram_windows",
]


@pytest.fixture(scope="module")
def all_dup_dir(tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("all_dup_sf")
    same = "the quick brown fox jumps over the lazy dog and runs far away"
    for t in TABLES:
        tab = pq.read_table(f"/root/testdata/sf0.001/{t}.parquet")
        if t == "documents":
            cols = {c: tab.column(c).to_pylist() for c in tab.column_names}
            cols["text"] = [same] * len(cols["text"])
            cols["n_chars"] = [len(same)] * len(cols["n_chars"])
            tab = pa.table(cols, schema=tab.schema)
        pq.write_table(tab, str(d / f"{t}.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def all_dup_con(all_dup_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{all_dup_dir}/{t}.parquet'"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", ALL_DUP_SET)
def test_all_dup_corpus_query_matches_oracle(
    spark, all_dup_dir, all_dup_con, name
):
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    try:
        sdf = queries[name](spark, all_dup_dir).toPandas()
    finally:
        spark.catalog.clearCache()
    odf = all_dup_con.sql(oracles[name]).fetchdf()
    assert sorted(sdf.columns) == sorted(odf.columns)
    assert len(sdf) == len(odf)
    assert value_hash(sdf) == value_hash(odf)


# ---------------------------------------------------------------------------
# unicode corpus: cross-engine string-semantics divergence (round 7)
# ---------------------------------------------------------------------------

#: every query the round-7 unicode sweep flagged. Two mechanism
#: classes, both fixed two-engine:
#:   1. lower() is not cross-engine deterministic (Java's contextual
#:      case mapping vs DuckDB/utf8proc: lower('İ') is 'i'+U+0307 vs
#:      'i', lower('ΟΔΟΣ') ends ς vs σ) — every tokenize/normalize
#:      path now uses operators/text.ascii_fold (translate A-Z→a-z,
#:      per-codepoint, bit-identical in both engines).
#:   2. trim() whitespace sets differ outside ASCII (DuckDB strips
#:      U+3000 ideographic space, Spark does not) — trim() left both
#:      tokenizers (the empty-token filter already covers ASCII).
#: Plus one latent bug only this corpus could catch:
#: dedup_incremental_batch's missing empty-shingle gate (a
#: single-token batch doc's degenerate minhash — aggregate over an
#: empty hash list collapses to the seed constants — probed 11
#: spurious index candidates; the oracle's NULL minhash matched none).
#: (chunk_documents_udtf joined the set late: its Python UDTF used
#: str.strip() — a THIRD trim definition, unicode-wide — fixed by
#: dropping the strip and keeping the empty filter.)
UNICODE_SET = [
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
    "token_count_bpe_regex",  # pocket 12: U+3000 adjacent to ASCII ws
    "token_diversity_simpson",
    "unigram_logprob_quality",
    "vocab_coverage_topk",
    "winnowing_fingerprint",
    "winnowing_overlap_pairs",
    "zipf_slope_fit",
]


@pytest.fixture(scope="module")
def unicode_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("unicode_sf")
    subprocess.run(
        [sys.executable, str(REPO_ROOT / "tools" / "make_unicode_data.py"), str(d)],
        check=True,
        capture_output=True,
    )
    return str(d)


@pytest.fixture(scope="module")
def unicode_con(unicode_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{unicode_dir}/{t}.parquet'"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", UNICODE_SET)
def test_unicode_corpus_query_matches_oracle(
    spark, unicode_dir, unicode_con, name
):
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    try:
        sdf = queries[name](spark, unicode_dir).toPandas()
    finally:
        spark.catalog.clearCache()
    odf = unicode_con.sql(oracles[name]).fetchdf()
    assert sorted(sdf.columns) == sorted(odf.columns)
    assert len(sdf) == len(odf)
    assert value_hash(sdf) == value_hash(odf)
    # the divergence must actually be exercised: the incremental
    # batch must CONTAIN a gated-out single-token unicode doc
    if name == "dedup_incremental_batch":
        assert 157 not in set(sdf["batch_doc"])


# ---------------------------------------------------------------------------
# giant-document corpus: extreme per-document skew (round 7)
# ---------------------------------------------------------------------------

#: the per-row-skew representatives: token/shingle/char-window
#: pipelines that each process doc 42 (50k tokens, hot vocab) and
#: doc 84 (one 100k-char token, zero shingles) without per-document
#: quadratics or gate failures. The round-7 full 339-query gate over
#: this corpus was green with NO engine changes — the df-gates,
#: _MAX_CHARS caps, empty-shingle gates, and staged-token idiom all
#: hold; what it broke (and what this suite keeps fixed) was the
#: ORACLE side's O(n^2) slice-per-position n-gram form, now the
#: linear zip-with-shifts (queries_llm._shingles).
GIANT_SET = [
    "text_stats",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_incremental_batch",
    "minhash_containment",
    "containment_similarity_join",
    "duplicate_span_pairs",
    "winnowing_fingerprint",
    "winnowing_overlap_pairs",
    "repetition_ratio",
    "decontaminate_ngram_windows",
    "contamination_check",
    "chunk_documents_udtf",
    "rolling_hash_fingerprint",
    "token_diversity_simpson",
    "greedy_pack_bins",
]


@pytest.fixture(scope="module")
def giant_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("giant_sf")
    subprocess.run(
        [sys.executable, str(REPO_ROOT / "tools" / "make_giant_data.py"), str(d)],
        check=True,
        capture_output=True,
    )
    return str(d)


@pytest.fixture(scope="module")
def giant_con(giant_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{giant_dir}/{t}.parquet'"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", GIANT_SET)
def test_giant_corpus_query_matches_oracle(spark, giant_dir, giant_con, name):
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    try:
        sdf = queries[name](spark, giant_dir).toPandas()
    finally:
        spark.catalog.clearCache()
    odf = giant_con.sql(oracles[name]).fetchdf()
    assert sorted(sdf.columns) == sorted(odf.columns)
    assert len(sdf) == len(odf)
    assert value_hash(sdf) == value_hash(odf)


# ---------------------------------------------------------------------------
# Heaps'-law corpus: realistic text statistics (round 8)
# ---------------------------------------------------------------------------

#: the pair-emitter family on REALISTIC corpus shape — unbounded-Zipf
#: vocabulary (Heaps growth, a true stopword head), log-normal
#: lengths, and a PLANTED duplicate structure (1% exact + 4% near
#: copies) instead of the fixed-30-word fixture whose every shingle
#: has corpus-proportional df. What this corpus found (round 8): the
#: 32-bit simhash fingerprint saturates (~1% of ALL doc pairs within
#: hamming 3 — quadratic output by construction), fixed by the 60-bit
#: dedup_simhash64; everything else held green at first contact, the
#: strongest evidence yet that the df-gates/LSH bands generalize off
#: the synthetic fixtures. At-scale growth evidence: HEAPS_r8.json
#: (12.5k vs 50k docs, rows_ratio per emitter).
HEAPS_SET = [
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_clusters",
    "dedup_keep_best",
    "dedup_simhash64",
    "dedup_incremental_batch",
    "minhash_containment",
    "containment_similarity_join",
    "prefix_filter_jaccard_join",
    "duplicate_span_pairs",
    "winnowing_overlap_pairs",
    "text_stats",
]


@pytest.fixture(scope="module")
def heaps_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("heaps_sf")
    subprocess.run(
        [
            sys.executable,
            str(REPO_ROOT / "tools" / "make_heaps_data.py"),
            "2000",
            str(d),
        ],
        check=True,
        capture_output=True,
    )
    return str(d)


@pytest.fixture(scope="module")
def heaps_con(heaps_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{heaps_dir}/{t}.parquet'"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", HEAPS_SET)
def test_heaps_corpus_query_matches_oracle(spark, heaps_dir, heaps_con, name):
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    try:
        sdf = queries[name](spark, heaps_dir).toPandas()
    finally:
        spark.catalog.clearCache()
    odf = heaps_con.sql(oracles[name]).fetchdf()
    assert sorted(sdf.columns) == sorted(odf.columns)
    assert len(sdf) == len(odf)
    assert value_hash(sdf) == value_hash(odf)
