"""Tests for the tranche-4 LLM-pipeline queries (sequence packing,
shard manifests, unigram-LM scoring) and the recursive SQL surface."""

from __future__ import annotations

import math

import pytest

from concurrent_etl_spark import queries_llm4 as Q4
from concurrent_etl_spark.queries_llm4 import _N_SHARDS, _PACK_CAPACITY
from concurrent_etl_spark.queries_relational4 import q_recursive_cte_hierarchy

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def doc_tokens(spark):
    """(doc_id, n_tok) for every document, via the same tokenizer."""
    from pyspark.sql import functions as F

    from concurrent_etl_spark.operators import text as T

    rows = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", F.size(T.tokens(F.col("text"))).alias("n_tok"))
        .collect()
    )
    return {r["doc_id"]: r["n_tok"] for r in rows}


class TestSequencePackFixed:
    def test_offsets_tile_the_shard_stream(self, spark, doc_tokens):
        rows = Q4.q_sequence_pack_fixed(spark, SF_DIR).collect()
        assert len(rows) == len(doc_tokens)
        by_shard: dict[int, list] = {}
        for r in rows:
            by_shard.setdefault(r["shard"], []).append(r)
        for shard, rs in by_shard.items():
            rs.sort(key=lambda r: r["doc_id"])
            off = 0
            for r in rs:
                assert r["doc_id"] % _N_SHARDS == shard
                assert r["start_off"] == off, "gapless concatenation"
                assert r["n_tok"] == doc_tokens[r["doc_id"]]
                assert r["first_pack"] == off // _PACK_CAPACITY
                end = off + r["n_tok"] - 1
                assert r["last_pack"] == end // _PACK_CAPACITY
                assert r["straddles"] == int(r["last_pack"] > r["first_pack"])
                off = end + 1

    def test_straddlers_exist_at_this_capacity(self, spark):
        # with ~25-token docs and C=512 roughly 1/20 of docs straddle;
        # zero straddlers would mean the query degenerated
        rows = Q4.q_sequence_pack_fixed(spark, SF_DIR).collect()
        assert sum(r["straddles"] for r in rows) > 0


class TestGreedyPackBins:
    def test_matches_brute_force_fold(self, spark, doc_tokens):
        got = {
            (r["shard"], r["bin_id"]): (
                r["n_docs"],
                r["n_tokens"],
                r["first_doc"],
                r["last_doc"],
            )
            for r in Q4.q_greedy_pack_bins(spark, SF_DIR).collect()
        }
        # brute-force the same next-fit fold in plain python
        want: dict[tuple, list] = {}
        for shard in range(_N_SHARDS):
            docs = sorted(d for d in doc_tokens if d % _N_SHARDS == shard)
            bin_id, fill = 0, 0
            for d in docs:
                n = doc_tokens[d]
                if fill + n > _PACK_CAPACITY and fill > 0:
                    bin_id, fill = bin_id + 1, 0
                key = (shard, bin_id)
                agg = want.setdefault(key, [0, 0, d, d])
                agg[0] += 1
                agg[1] += n
                agg[3] = d
                fill += n
        assert got == {k: tuple(v) for k, v in want.items()}

    def test_no_bin_overflows_unless_single_doc(self, spark):
        for r in Q4.q_greedy_pack_bins(spark, SF_DIR).collect():
            assert r["n_tokens"] <= _PACK_CAPACITY or r["n_docs"] == 1

    def test_zero_token_doc_guard_both_engines(self, spark, tmp_path):
        """The ``fill > 0`` guard, pinned on a synthetic corpus (the
        real fixture has no 0-token docs): a zero-token doc opens a
        bin with fill=0, and the over-capacity doc that follows must
        JOIN that bin (fill==0 disarms the overflow test) — not be
        bumped into a fresh one on one engine only. Runs the actual
        Spark fold AND the recursive-CTE oracle on the same parquet."""
        import duckdb
        import pandas as pd

        from concurrent_etl_spark.catalog import ORACLES

        big = " ".join(["tok"] * (_PACK_CAPACITY + 88))  # > capacity
        rows = [
            # shard 0: 0-token doc, then the over-capacity doc, then a
            # small doc that must overflow into bin 1
            (0, ""),
            (_N_SHARDS, big),
            (2 * _N_SHARDS, " ".join(["tok"] * 10)),
            # shard 1: plain control docs
            (1, " ".join(["tok"] * 300)),
            (1 + _N_SHARDS, " ".join(["tok"] * 300)),
        ]
        pdf = pd.DataFrame(
            {
                "doc_id": [r[0] for r in rows],
                "text": [r[1] for r in rows],
                "lang": "en",
                "source": "synthetic",
                "n_chars": [len(r[1]) for r in rows],
            }
        )
        pdf.to_parquet(tmp_path / "documents.parquet")

        got = sorted(
            map(tuple, Q4.q_greedy_pack_bins(spark, str(tmp_path)).collect())
        )
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM"
            f" read_parquet('{tmp_path / 'documents.parquet'}')"
        )
        want = sorted(map(tuple, con.execute(
            ORACLES["greedy_pack_bins"]
        ).fetchall()))
        assert got == want
        by_bin = {(r[0], r[1]): r for r in got}
        # guard honored: the 0-token doc and the over-capacity doc
        # SHARE shard-0 bin 0 (without the guard the big doc would
        # open bin 1 and first/last/doc counts all shift)
        assert by_bin[(0, 0)][2:] == (2, _PACK_CAPACITY + 88, 0, _N_SHARDS)
        assert by_bin[(0, 1)][2:] == (1, 10, 2 * _N_SHARDS, 2 * _N_SHARDS)


class TestShardManifest:
    def test_totals_and_fingerprint_partition_invariant(self, spark):
        import hashlib

        rows = Q4.q_shard_manifest_audit(spark, SF_DIR).collect()
        assert len(rows) == _N_SHARDS
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        ids = [r["doc_id"] for r in docs.select("doc_id").collect()]
        assert sum(r["n_docs"] for r in rows) == len(ids)
        for r in rows:
            members = sorted(i for i in ids if i % _N_SHARDS == r["shard"])
            want = hashlib.md5(
                ",".join(str(i) for i in members).encode()
            ).hexdigest()
            assert r["content_fingerprint"] == want
            assert r["min_doc_id"] == members[0]
            assert r["max_doc_id"] == members[-1]


class TestUnigramLogprob:
    def test_scores_are_smoothed_surprisals(self, spark):
        rows = Q4.q_unigram_logprob_quality(spark, SF_DIR).collect()
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
        assert len(rows) == docs
        for r in rows:
            assert r["mean_neg_logprob"] > 0.0
            assert r["n_tok"] >= 1

    def test_rare_token_docs_score_higher(self, spark):
        # the doc containing the corpus's rarest tokens must score
        # above the doc built from the most common ones
        from pyspark.sql import functions as F

        from concurrent_etl_spark.operators import text as T

        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        tok = docs.select(
            "doc_id", F.explode(T.tokens(F.lower(F.col("text")))).alias("t")
        )
        counts = {
            r["t"]: r["c"]
            for r in tok.groupBy("t").agg(F.count("*").alias("c")).collect()
        }
        per_doc = {}
        for r in tok.collect():
            per_doc.setdefault(r["doc_id"], []).append(counts[r["t"]])
        mean_count = {d: sum(v) / len(v) for d, v in per_doc.items()}
        rarest = min(mean_count, key=mean_count.get)
        commonest = max(mean_count, key=mean_count.get)
        scores = {
            r["doc_id"]: r["mean_neg_logprob"]
            for r in Q4.q_unigram_logprob_quality(spark, SF_DIR).collect()
        }
        assert scores[rarest] > scores[commonest]


class TestRecursiveHierarchy:
    def test_heap_depths_and_paths(self, spark):
        rows = q_recursive_cte_hierarchy(spark, SF_DIR).collect()
        n = spark.read.parquet(f"{SF_DIR}/supplier.parquet").count()
        assert len(rows) == n, "every supplier reachable from the root"
        for r in rows:
            k = r["s_suppkey"]
            assert r["depth"] == (int(math.log2(k + 1)) if k else 0)
            hops = [int(h) for h in r["path"].split("->")]
            assert hops[0] == 0 and hops[-1] == k
            for parent, child in zip(hops, hops[1:]):
                assert (child - 1) // 2 == parent


class TestPipelineEnd2End:
    def test_stage_accounting_matches_components(self, spark):
        """The composite must agree with its component queries: the
        kept set is dedup-exact winners passing the quality gate, and
        per-shard totals are consistent with the manifest shapes."""
        from pyspark.sql import functions as F

        from concurrent_etl_spark.operators import text as T

        rows = Q4.q_llm_pipeline_end2end(spark, SF_DIR).collect()
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        toks = T.tokens(F.lower(F.col("text")))
        hashed = docs.select(
            "doc_id",
            F.md5(F.concat_ws(" ", toks)).alias("h"),
            F.size(T.tokens(F.col("text"))).alias("n_tok"),
            F.size(F.array_distinct(toks)).alias("n_uniq"),
        ).collect()
        winners = {}
        for r in hashed:
            if r["h"] not in winners or r["doc_id"] < winners[r["h"]]["doc_id"]:
                winners[r["h"]] = r
        kept = [
            r
            for r in winners.values()
            if r["n_tok"] >= 10 and r["n_uniq"] * 10 >= r["n_tok"] * 3
        ]
        assert kept, "gate must keep something at this SF"
        by_shard = {}
        for r in kept:
            by_shard.setdefault(r["doc_id"] % 8, []).append(r)
        got = {r["shard"]: r for r in rows}
        assert set(got) == set(by_shard)
        for shard, members in by_shard.items():
            toks_total = sum(m["n_tok"] for m in members)
            assert got[shard]["n_docs"] == len(members)
            assert got[shard]["n_tokens"] == toks_total
            assert got[shard]["n_packs"] == -(-toks_total // 512)

    def test_pipeline_drops_duplicates(self, spark):
        rows = Q4.q_llm_pipeline_end2end(spark, SF_DIR).collect()
        n_kept = sum(r["n_docs"] for r in rows)
        n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
        assert n_kept < n_docs, "fixture contains exact duplicates"


class TestTextNormalizeDedup:
    def test_norm_never_splits_raw_groups(self, spark):
        rows = Q4.q_text_normalize_dedup(spark, SF_DIR).collect()
        assert rows
        for r in rows:
            # normalization is a function of the raw text, so it can
            # only MERGE hash groups, never split them
            assert r["distinct_norm"] <= r["distinct_raw"]
            assert r["distinct_raw"] <= r["n_docs"]
            assert (
                r["dups_surfaced_by_norm"]
                == r["distinct_raw"] - r["distinct_norm"]
            )


class TestPrefixFilterJaccard:
    def test_no_false_negatives_vs_brute_force(self, spark):
        """Prefix filtering must find EVERY pair at/above threshold —
        the completeness guarantee LSH can't give. Brute-force all
        pairs over the real corpus and compare the per-doc rollup."""
        from pyspark.sql import functions as F

        from concurrent_etl_spark.operators import text as T
        from concurrent_etl_spark.queries_llm4 import (
            _JACCARD_T_PCT,
            q_prefix_filter_jaccard_join,
        )

        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        rows = docs.select(
            "doc_id",
            F.array_distinct(T.tokens(F.lower(F.col("text")))).alias("s"),
        ).collect()
        sets = {r["doc_id"]: frozenset(r["s"]) for r in rows}
        ids = sorted(sets)
        per_doc: dict[int, list] = {}
        for i, a in enumerate(ids):
            for b in ids[i + 1 :]:
                inter = len(sets[a] & sets[b])
                un = len(sets[a]) + len(sets[b]) - inter
                if inter * 100 >= un * _JACCARD_T_PCT:
                    per_doc.setdefault(a, []).append((b, inter * 1000 // un))
                    per_doc.setdefault(b, []).append((a, inter * 1000 // un))
        got = {
            r["doc_id"]: (
                r["n_neighbors"],
                r["max_jaccard_pm"],
                r["min_neighbor"],
            )
            for r in q_prefix_filter_jaccard_join(spark, SF_DIR).collect()
        }
        want = {
            d: (
                len(nbrs),
                max(j for _, j in nbrs),
                min(n for n, _ in nbrs),
            )
            for d, nbrs in per_doc.items()
        }
        assert got == want


class TestIncrementalDedup:
    def test_partners_come_only_from_the_index_side(self, spark):
        rows = Q4.q_dedup_incremental_batch(spark, SF_DIR).collect()
        assert rows
        for r in rows:
            assert r["batch_doc"] % 10 == 7
            assert r["best_partner"] % 10 != 7, "index side only"
            assert 0 <= r["n_matches"] <= r["n_candidates"]
            assert 0 <= r["best_agree"] <= 24

    def test_exact_duplicate_across_boundary_scores_full_agreement(self, spark):
        """Any batch doc whose token stream equals an index doc's
        must reach agree=24 (identical shingle sets => identical
        signatures)."""
        from pyspark.sql import functions as F

        from concurrent_etl_spark.operators import text as T

        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        hashed = docs.select(
            "doc_id",
            F.md5(
                F.concat_ws(" ", T.tokens(F.lower(F.col("text"))))
            ).alias("h"),
        ).collect()
        by_hash = {}
        for r in hashed:
            by_hash.setdefault(r["h"], []).append(r["doc_id"])
        cross = [
            ids
            for ids in by_hash.values()
            if any(d % 10 == 7 for d in ids)
            and any(d % 10 != 7 for d in ids)
        ]
        if not cross:
            pytest.skip("no exact dup straddles the batch/index split")
        best = {
            r["batch_doc"]: r["best_agree"]
            for r in Q4.q_dedup_incremental_batch(spark, SF_DIR).collect()
        }
        for ids in cross:
            for d in ids:
                if d % 10 == 7:
                    assert best.get(d) == 24
