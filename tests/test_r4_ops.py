"""Property depth for the round-4 tranche: line-grain curation, BPE
pair counts, RRF fusion, k-core peeling, skyline dominance, schema
evolution. The oracle gate already hash-verifies each against DuckDB;
these assert the INVARIANTS the SQL comparison can't state (dominance
semantics, monotonicity, rank-formula consistency)."""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR


def _rows(spark, name):
    import __spark_entry__ as entrymod

    return entrymod.queries()[name](spark, SF_DIR).collect()


class TestLineDedupCCNet:
    def test_injected_copies_lose_everything_unique_docs_keep_all(self, spark):
        rows = {r["doc_id"]: r for r in _rows(spark, "line_dedup_ccnet")}
        # 500 originals + 40 injected copies
        assert len(rows) == 540
        for doc_id, r in rows.items():
            assert 0 <= r["kept_lines"] <= r["n_lines"], doc_id
            if doc_id >= 100000 or doc_id < 40:
                # copied docs and their originals: every line duplicated
                assert r["kept_lines"] == 0, doc_id
                assert r["kept_tokens"] == 0, doc_id
        # the corpus also contains NATURAL near-dup docs sharing 8-token
        # runs (the MinHash fixtures), so some uninjected docs lose lines
        # too — but most of the corpus is unique and keeps everything
        full_keepers = sum(
            1
            for doc_id, r in rows.items()
            if 40 <= doc_id < 100000 and r["kept_lines"] == r["n_lines"]
        )
        assert full_keepers > 300


class TestC4LineFilters:
    def test_every_probe_rule_fires_and_probe_docs_drop(self, spark):
        m = {r["metric"]: r["value"] for r in _rows(spark, "c4_line_filters")}
        assert m["lines_brace"] >= 1
        assert m["lines_javascript"] >= 1
        assert m["lines_lorem"] >= 1
        assert m["lines_short"] >= 1
        assert m["lines_kept"] < m["lines_total"]
        # 500 corpus docs + 4 probes; every probe has < 3 surviving lines
        assert m["docs_total"] == 504
        assert m["docs_kept"] <= 500


class TestBpeMergeCandidates:
    def test_pairs_are_adjacent_bigrams_in_descending_count(self, spark):
        rows = _rows(spark, "bpe_merge_candidates")
        assert len(rows) == 30
        counts = [r["pair_count"] for r in rows]
        assert counts == sorted(counts, reverse=True)
        assert all(len(r["pair"]) == 2 for r in rows)


class TestRrfHybridRetrieval:
    def test_rank_formula_and_shape(self, spark):
        rows = _rows(spark, "rrf_hybrid_retrieval")
        by_q: dict[int, list] = {}
        for r in rows:
            by_q.setdefault(r["query_id"], []).append(r)
        assert set(by_q) == {0, 1, 2}
        for q, rs in by_q.items():
            assert sorted(r["fused_rank"] for r in rs) == list(range(1, 11))
            for r in rs:
                expect = 0.0
                if r["sparse_rank"] is not None:
                    expect += 1.0 / (60 + r["sparse_rank"])
                if r["dense_rank"] is not None:
                    expect += 1.0 / (60 + r["dense_rank"])
                assert r["rrf_score"] == pytest.approx(expect, abs=1e-6)
                # at least one ranker proposed every fused result
                assert (
                    r["sparse_rank"] is not None or r["dense_rank"] is not None
                )


class TestKcorePeel:
    def test_survival_curve_monotone_and_round0_is_distinct_pairs(self, spark):
        from pyspark.sql import functions as F

        from concurrent_etl_spark.engine import load_table

        rows = sorted(
            _rows(spark, "kcore_interaction_prune"),
            key=lambda r: r["peel_round"],
        )
        assert [r["peel_round"] for r in rows] == [0, 1, 2, 3, 4]
        for a, b in zip(rows, rows[1:]):
            assert b["n_edges"] <= a["n_edges"]
            assert b["n_users"] <= a["n_users"]
            assert b["n_items"] <= a["n_items"]
        o = load_table(spark, SF_DIR, "orders").select(
            F.col("o_orderkey").alias("ok"), F.col("o_custkey").alias("u")
        )
        li = load_table(spark, SF_DIR, "lineitem").select(
            F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("v")
        )
        n0 = o.join(li, "ok").select("u", "v").distinct().count()
        assert rows[0]["n_edges"] == n0


class TestSkylineDominance:
    def test_matches_naive_dominance_filter(self, spark):
        from pyspark.sql import functions as F

        from concurrent_etl_spark.engine import load_table

        pts = (
            load_table(spark, SF_DIR, "part")
            .groupBy("p_retailprice", "p_size")
            .count()
            .collect()
        )
        naive = {
            (p["p_retailprice"], p["p_size"])
            for p in pts
            if not any(
                q["p_retailprice"] <= p["p_retailprice"]
                and q["p_size"] >= p["p_size"]
                and (
                    q["p_retailprice"] < p["p_retailprice"]
                    or q["p_size"] > p["p_size"]
                )
                for q in pts
            )
        }
        got = {
            (r["retail_price"], r["p_size"])
            for r in _rows(spark, "skyline_pareto_parts")
        }
        assert got == naive and got


class TestSchemaEvolutionMergeRead:
    def test_null_fill_is_exactly_batch_shaped(self, spark):
        rows = _rows(spark, "schema_evolution_merge_read")
        assert rows
        for r in rows:
            if r["batch"] == 1:
                assert r["legacy_code"] == f"L{r['suppkey']}"
                assert r["acctbal"] is None
            else:
                assert r["batch"] == 2
                assert r["legacy_code"] is None
                assert r["acctbal"] is not None


class TestVideoSceneCuts:
    def test_exactly_one_cut_per_clip(self, spark):
        rows = _rows(spark, "video_scene_cuts")
        by_doc: dict[int, list] = {}
        for r in rows:
            by_doc.setdefault(r["doc_id"], []).append(r)
        assert by_doc
        for doc_id, rs in by_doc.items():
            cuts = [r for r in rs if r["is_cut"]]
            assert len(cuts) == 1, doc_id
            # calm transitions: exactly 13 per sample of raster drift
            for r in rs:
                if not r["is_cut"]:
                    assert r["sad_circ"] == 13 * r["n_px"], doc_id
