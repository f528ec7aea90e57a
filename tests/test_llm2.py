"""Tests for the tranche-2 LLM-pipeline queries (corpus statistics,
data mixing, LM scoring, contamination)."""

from __future__ import annotations

from pyspark.sql import functions as F

import pytest

from concurrent_etl_spark import queries_llm2 as Q2

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def histogram(spark):
    return Q2.q_token_length_histogram(spark, SF_DIR).collect()


class TestTokenLengthHistogram:
    def test_buckets_are_bit_lengths(self, histogram):
        # bucket b holds token counts in [2^(b-1), 2^b)
        for r in histogram:
            assert r["bucket"] >= 1
            assert r["n_docs"] >= 1

    def test_totals_cover_corpus(self, spark, histogram):
        n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
        assert sum(r["n_docs"] for r in histogram) == n_docs


class TestVocabCoverage:
    def test_monotone_and_bounded(self, spark):
        rows = Q2.q_vocab_coverage_topk(spark, SF_DIR).orderBy("rnk").collect()
        assert rows, "empty coverage curve"
        shares = [r["cum_share"] for r in rows]
        assert all(b >= a for a, b in zip(shares, shares[1:]))
        assert shares[-1] <= 1.0 + 1e-9
        # counts are rank-ordered descending
        ns = [r["n"] for r in rows]
        assert all(a >= b for a, b in zip(ns, ns[1:]))


class TestDataMixture:
    def test_quota_per_stratum(self, spark):
        rows = Q2.q_data_mixture_sampling(spark, SF_DIR).collect()
        per = {}
        for r in rows:
            per.setdefault((r["lang_guess"], r["q_bucket"]), []).append(r["rk"])
        for (lang, q), rks in per.items():
            assert len(rks) <= 20, (lang, q)
            assert sorted(rks) == list(range(1, len(rks) + 1))

    def test_deterministic(self, spark):
        a = sorted(
            (r["doc_id"], r["rk"])
            for r in Q2.q_data_mixture_sampling(spark, SF_DIR).collect()
        )
        b = sorted(
            (r["doc_id"], r["rk"])
            for r in Q2.q_data_mixture_sampling(spark, SF_DIR).collect()
        )
        assert a == b


class TestBigramDocScore:
    def test_scores_negative_and_finite(self, spark):
        rows = Q2.q_bigram_doc_score(spark, SF_DIR).collect()
        assert rows
        for r in rows:
            # log-probs are <= 0; a doc of pure singleton bigrams under
            # a rich LM scores far below 0 but never -inf (its own
            # bigrams are always in the corpus counts by construction)
            assert r["avg_logp"] <= 0.0
            assert r["avg_logp"] > -50.0
            assert r["n_bigrams"] >= 1


class TestContamination:
    def test_mutants_flag_their_source(self, spark):
        rows = Q2.q_contamination_check(spark, SF_DIR).collect()
        pairs = {(r["eval_id"], r["train_id"]) for r in rows}
        # every injected mutant (doc_id+100000) must hit its own source
        n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
        expected = {(i + 100_000, i) for i in range(min(40, n_docs))}
        assert expected <= pairs
        for r in rows:
            assert 0.5 <= r["overlap_frac"] <= 1.0


class TestKnnVote:
    def test_votes_bounded_and_labels_valid(self, spark):
        from concurrent_etl_spark.queries_llm2 import q_knn_label_vote

        rows = q_knn_label_vote(spark, SF_DIR).collect()
        assert len(rows) == 20  # one prediction per query vector
        emb_labels = {
            r["label"]
            for r in spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
            .select("label")
            .distinct()
            .collect()
        }
        for r in rows:
            assert 1 <= r["n_votes"] <= 10
            assert r["predicted_label"] in emb_labels


class TestCurationRank:
    def test_topk_sorted_and_composite(self, spark):
        from concurrent_etl_spark.queries_llm2 import q_curation_rank_topk

        rows = q_curation_rank_topk(spark, SF_DIR).collect()
        assert len(rows) == 20
        scores = [r["score"] for r in rows]
        assert sorted(scores, reverse=True) == scores or len(set(scores)) < 20
        for r in rows:
            assert abs(
                r["score"]
                - round(r["quality"] + r["novelty"] + r["avg_logp"] / 10.0, 9)
            ) < 1e-9


class TestTrainEvalSplit:
    def test_split_partitions_and_roughly_90_10(self, spark):
        from concurrent_etl_spark.queries_llm2 import q_train_eval_split

        rows = {r["split"]: r["n_docs"] for r in
                q_train_eval_split(spark, SF_DIR).collect()}
        n = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
        assert rows.get("train", 0) + rows.get("eval", 0) == n
        # md5 is uniform: the 90% bucket should hold 80-98% at any sf
        assert 0.80 <= rows["train"] / n <= 0.98


class TestBpeTokenCount:
    def test_hand_computed_example(self, spark, tmp_path):
        """"it's 42 red-widgets" -> ws=3; bpe: [it]["'s"][ 42][ red][-][widgets] = 6."""
        import pandas as pd

        p = str(tmp_path / "documents.parquet")
        pd.DataFrame(
            {"doc_id": [1], "text": ["it's 42 red-widgets"],
             "lang": ["en"], "source": ["t"], "n_chars": [19]}
        ).to_parquet(p)
        from concurrent_etl_spark.queries_llm2 import q_token_count_bpe

        row = q_token_count_bpe(spark, str(tmp_path)).collect()[0]
        assert row["n_ws_tokens"] == 3
        assert row["n_bpe_tokens"] == 6
        assert row["n_space_prefixed"] == 2
        assert abs(row["bpe_per_word"] - 2.0) < 1e-12

    def test_fertility_at_least_one(self, spark):
        from concurrent_etl_spark.queries_llm2 import q_token_count_bpe

        for r in q_token_count_bpe(spark, "/root/testdata/sf0.001").collect():
            assert r["n_bpe_tokens"] >= r["n_ws_tokens"] >= 1


class TestEmbeddingQuantizeInt8:
    def test_roundtrip_error_bounded_by_half_step(self, spark):
        """|x - q*scale| <= scale/2 per dim => mse <= (scale/2)^2."""
        from concurrent_etl_spark.queries_llm2 import q_embedding_quantize_int8

        rows = q_embedding_quantize_int8(spark, "/root/testdata/sf0.001").collect()
        assert rows
        for r in rows:
            assert r["n_dims"] == 64
            assert r["qscale"] > 0
            assert 0 <= r["recon_mse"] <= (r["qscale"] / 2) ** 2 + 1e-15
            # max|x| maps exactly to +/-127, so saturation happens
            assert r["n_saturated"] >= 1

    def test_zero_vector_degrades_gracefully(self, spark, tmp_path):
        import pandas as pd

        p = str(tmp_path / "embeddings.parquet")
        pd.DataFrame(
            {"vec_id": [7], "embedding": [[0.0] * 8], "label": [0]}
        ).to_parquet(p)
        from concurrent_etl_spark.queries_llm2 import q_embedding_quantize_int8

        r = q_embedding_quantize_int8(spark, str(tmp_path)).collect()[0]
        assert r["qscale"] == 0.0 and r["recon_mse"] == 0.0 and r["n_saturated"] == 0

    def test_pretokenization_is_lossless(self, spark):
        """GPT-2-style pre-tokenizers must partition the string: the
        matches concatenate back to the exact input."""
        from concurrent_etl_spark.queries_llm2 import _BPE_PAT
        from concurrent_etl_spark.engine import load_table

        bad = (
            load_table(spark, "/root/testdata/sf0.001", "documents")
            .select(
                F.array_join(
                    F.regexp_extract_all(F.col("text"), F.lit(_BPE_PAT), F.lit(0)),
                    "",
                ).alias("rebuilt"),
                "text",
            )
            .where(F.col("rebuilt") != F.col("text"))
            .count()
        )
        assert bad == 0
