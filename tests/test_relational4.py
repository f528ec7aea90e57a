"""Tests for the fourth relational tranche (rank family, multiset
ops, pattern predicates, damped-walk centrality)."""

from __future__ import annotations

from pyspark.sql import functions as F

from concurrent_etl_spark import queries_relational4 as Q4

SF_DIR = "/root/testdata/sf0.001"


class TestRankFamily:
    def test_bounds_and_tie_semantics(self, spark):
        rows = Q4.q_rank_distribution_family(spark, SF_DIR).collect()
        assert rows
        for r in rows:
            assert 0.0 <= r["pct_rank"] <= 1.0
            assert 0.0 < r["cdist"] <= 1.0
            assert r["drnk"] <= r["rnk"]  # dense rank never exceeds rank


class TestMultisetOps:
    def test_bag_semantics(self, spark):
        df = Q4.q_multiset_intersect_except(spark, SF_DIR)
        rows = df.collect()
        assert {r["op"] for r in rows} <= {"intersect_all", "except_all"}
        # intersect-all multiplicity = min(open_n, done_n) for a key:
        # it can never exceed either side's count of that key
        inter = {r["l_partkey"]: r["n"] for r in rows if r["op"] == "intersect_all"}
        assert all(n >= 1 for n in inter.values())


class TestPatternPredicates:
    def test_filter_excludes_widgets(self, spark, tables):
        out = Q4.q_pattern_predicate_stats(spark, SF_DIR)
        n_kept = out.agg(F.sum("n_parts")).collect()[0][0]
        part = tables["part"]
        expected = part.where(~F.col("p_name").like("%widget%")).count()
        assert n_kept == expected

    def test_flag_counts_bounded(self, spark):
        for r in Q4.q_pattern_predicate_stats(spark, SF_DIR).collect():
            for flag in ("n_bolt", "n_red", "n_small_type", "n_first_half"):
                assert 0 <= r[flag] <= r["n_parts"]


class TestPagerank:
    def test_topk_shape_and_mass(self, spark):
        rows = Q4.q_pagerank_bipartite(spark, SF_DIR).collect()
        assert len(rows) == 50
        scores = [r["rank_score"] for r in rows]
        assert all(s > 0 for s in scores)
        # suppliers are the high-degree side of the bipartite graph at
        # every sf (100 suppliers vs 1500+N customers) — the top node
        # must be a supplier
        top = max(rows, key=lambda r: r["rank_score"])
        assert top["node"].startswith("s")

    def test_deterministic_across_partitionings(self, spark):
        a = sorted((r["node"], r["rank_score"])
                   for r in Q4.q_pagerank_bipartite(spark, SF_DIR).collect())
        b = sorted((r["node"], r["rank_score"])
                   for r in Q4.q_pagerank_bipartite(spark, SF_DIR).collect())
        assert a == b


class TestFactFactSelfJoin:
    def test_pair_counts_vs_manual(self, spark, tables):
        from itertools import combinations

        out = {
            r["orderkey"]: r["n_supplier_pairs"]
            for r in Q4.q_fact_fact_selfjoin(spark, SF_DIR).collect()
        }
        li = tables["lineitem"].select(
            "l_orderkey", "l_linenumber", "l_suppkey"
        ).collect()
        per_order: dict[int, list] = {}
        for r in li:
            per_order.setdefault(r["l_orderkey"], []).append(r)
        for ok, rows in list(per_order.items())[:200]:
            # mirror the query's pair definition exactly: strictly
            # increasing linenumber (synthetic data repeats linenumbers
            # within an order, so equal-ln pairs are excluded)
            expected = sum(
                1
                for a, b in combinations(rows, 2)
                if a["l_linenumber"] != b["l_linenumber"]
                and a["l_suppkey"] != b["l_suppkey"]
            )
            assert out.get(ok, 0) == expected


class TestProfileTable:
    def test_counts_and_coverage(self, spark, tables):
        rows = {r["col"]: r for r in Q4.q_profile_table(spark, SF_DIR).collect()}
        n = tables["orders"].count()
        assert set(rows) == {
            "o_orderkey", "o_custkey", "o_totalprice",
            "o_orderstatus", "o_orderdate",
        }
        for r in rows.values():
            assert r["n_rows"] == n
            assert r["n_nonnull"] <= r["n_rows"]
            assert r["n_distinct"] <= r["n_nonnull"]
            assert r["min_str"] <= r["max_str"]
        assert rows["o_orderkey"]["n_distinct"] == n  # primary key


class TestIntegrityConstraintAudit:
    def test_clean_star_and_violation_detection(self, spark, tmp_path):
        from concurrent_etl_spark.queries_relational4 import (
            q_integrity_constraint_audit,
        )

        got = {
            r["check_name"]: r["n_violations"]
            for r in q_integrity_constraint_audit(
                spark, "/root/testdata/sf0.001"
            ).collect()
        }
        assert len(got) == 5
        # the synthetic star is referentially clean on every FK edge
        # and the orders PK; the generator DOES reuse lineitem's
        # (orderkey, linenumber) composite key — a real data finding
        # this audit surfaced (1161 duplicate combos at sf0.001)
        for name in ("orders_pk_dup", "lineitem_orderkey_orphan",
                     "orders_custkey_orphan", "customer_nationkey_orphan"):
            assert got[name] == 0, name
        assert got["lineitem_pk_dup"] > 0

        # corrupt a copy: duplicate an order row, orphan a lineitem
        import shutil, os
        for t in ("lineitem", "orders", "customer", "nation"):
            shutil.copy(
                f"/root/testdata/sf0.001/{t}.parquet", tmp_path / f"{t}.parquet"
            )
        o = spark.read.parquet(str(tmp_path / "orders.parquet"))
        dup = o.limit(1)
        o.unionByName(dup).write.mode("overwrite").parquet(
            str(tmp_path / "orders2")
        )
        os.remove(tmp_path / "orders.parquet")
        shutil.move(
            str(tmp_path / "orders2"), str(tmp_path / "orders.parquet")
        )
        got2 = {
            r["check_name"]: r["n_violations"]
            for r in q_integrity_constraint_audit(spark, str(tmp_path)).collect()
        }
        assert got2["orders_pk_dup"] == 1


class TestBucketedColocatedJoin:
    def test_join_has_no_exchange_below_it(self, spark):
        """The whole point of bucketing: both join inputs are read
        pre-hash-clustered, so the plan's only Exchange is the final
        aggregation's — the join itself never shuffles."""
        from concurrent_etl_spark.plans.explain import plan_string

        # at sf0.001 Catalyst rightly broadcasts the tiny dim side,
        # which hides the bucket alignment; disabling broadcast shows
        # the plan a 100 TB x 100 TB join would get
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            df = Q4.q_bucketed_colocated_join(spark, SF_DIR)
            plan = plan_string(df, "simple")
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert "Bucketed: true" in plan
        # one shuffle for the groupBy(mktsegment); ZERO for the join —
        # both inputs arrive pre-clustered from the bucketed layout
        assert plan.count("Exchange hashpartitioning") == 1, plan

    def test_matches_unbucketed_join(self, spark, tables):
        got = {
            r["mktsegment"]: (r["n_orders"], round(r["sum_price"], 4))
            for r in Q4.q_bucketed_colocated_join(spark, SF_DIR).collect()
        }
        o, c = tables["orders"], tables["customer"]
        exp = {
            r["c_mktsegment"]: (r["n"], round(r["s"], 4))
            for r in o.join(c, o["o_custkey"] == c["c_custkey"])
            .groupBy("c_mktsegment")
            .agg(
                F.count("*").alias("n"),
                F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
                .cast("double")
                .alias("s"),
            )
            .collect()
        }
        assert got == exp


class TestArrayHofFamily:
    def test_norm_and_counts_consistent(self, spark):
        from concurrent_etl_spark import queries_llm2 as QL2

        rows = QL2.q_array_hof_family(spark, SF_DIR).collect()
        assert rows
        for r in rows:
            assert r["l2_norm"] >= r["max_abs"] - 1e-9  # norm dominates any |x|
            assert r["n_pos"] >= 0
            assert r["has_large"] == (r["max_abs"] > 2.0)
            assert abs(r["mean_val"]) <= r["max_abs"] + 1e-9


class TestMapFunctionsFamily:
    def test_map_ops_semantics(self, spark, tables):
        rows = Q4.q_map_functions_family(spark, SF_DIR).collect()
        assert rows
        part = {r["p_partkey"]: r for r in tables["part"].collect()}
        for r in rows:
            src = part[r["partkey"]]
            assert r["n_keys"] == 3  # type dropped, size appended
            assert r["keys_sorted"] == "brand,name,size"
            assert r["brand_up"] == src["p_brand"].upper()
            assert r["size_plus_price"] == float(src["p_size"]) + src["p_retailprice"]


class TestBitwiseAggFamily:
    def test_algebraic_identities(self, spark):
        from concurrent_etl_spark.queries_relational4 import (
            q_bitwise_agg_family,
        )

        rows = q_bitwise_agg_family(spark, "/root/testdata/sf0.001").collect()
        assert rows
        for r in rows:
            # AND result is a submask of OR result
            assert r["key_and"] & r["key_or"] == r["key_and"]
            assert bin(r["key_xor"]).count("1") == r["xor_popcount"]

    def test_xor_digest_matches_python_fold(self, spark):
        from functools import reduce

        from concurrent_etl_spark.engine import load_table
        from concurrent_etl_spark.queries_relational4 import (
            q_bitwise_agg_family,
        )

        o = load_table(spark, "/root/testdata/sf0.001", "orders")
        keys = {}
        for r in o.select("o_orderpriority", "o_orderkey").collect():
            keys.setdefault(r["o_orderpriority"], []).append(r["o_orderkey"])
        got = {
            r["o_orderpriority"]: r["key_xor"]
            for r in q_bitwise_agg_family(
                spark, "/root/testdata/sf0.001"
            ).collect()
        }
        for p, ks in keys.items():
            assert got[p] == reduce(lambda a, b: a ^ b, ks)
