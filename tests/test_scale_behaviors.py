"""Runtime scale behaviors: evidence that the engine's 100 TB story
engages at execution time, not just in docs — AQE re-plans skewed
shuffle joins by splitting the hot partition.

These complement the static plan invariants: a plan can LOOK right
and still hot-spot one executor; AQE's skew-join is the runtime
mitigation the SCALE.md design leans on, so this suite proves it
actually fires under a skewed key distribution.
"""

from __future__ import annotations

from pyspark.sql import functions as F

_SKEW_CONF = {
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # scaled-down thresholds so the test-sized hot partition (~11 MB
    # vs ~1 MB median) counts as skewed the way a hot 10 GB partition
    # would against defaults on a real cluster
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    # force the shuffle join a data-scaled right side would force
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


class TestAqeSkewJoin:
    def test_skewed_join_is_split_at_runtime(self, spark):
        old = {k: spark.conf.get(k, None) for k in _SKEW_CONF}
        for k, v in _SKEW_CONF.items():
            spark.conf.set(k, v)
        try:
            # 200k rows, half on one hot key, fat payload so the hot
            # shuffle partition dwarfs the median
            fact = spark.range(200_000).select(
                F.when(F.col("id") % 2 == 0, F.lit(7))
                .otherwise(F.col("id") % 1000)
                .alias("k"),
                F.concat(F.lit("x" * 100), F.col("id").cast("string")).alias(
                    "payload"
                ),
            )
            dim = spark.range(1000).select(
                F.col("id").alias("k"), (F.col("id") * 2).alias("v")
            )
            j = fact.join(dim, "k")
            rows = j.collect()
            # correctness first: every fact row matches exactly one dim row
            assert len(rows) == 200_000
            assert all(r["v"] == r["k"] * 2 for r in rows[:100])
            # runtime evidence: the final adaptive plan split the hot
            # partition (skew=true on the join, skewed shuffle read)
            plan = j._jdf.queryExecution().executedPlan().toString()
            assert "skew=true" in plan, plan
            assert "skewed" in plan, plan
        finally:
            for k, v in old.items():
                if v is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, v)


_BLOOM_CONF = {
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    # the 10 GB default application-side gate is exactly the 100 TB
    # design point (the filter pays off when the probe side is huge);
    # lower it so the test-sized probe side qualifies
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    # force the shuffle join a data-scaled build side would force —
    # a broadcast join already semi-filters, bloom targets SMJ
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


class TestRuntimeBloomFilter:
    def test_selective_join_injects_bloom_prefilter(self, spark, tables):
        """When a selective filter sits on one join side and the
        other side is too big to broadcast, Catalyst builds a Bloom
        filter from the filtered side and pushes might_contain onto
        the probe side's SCAN — rows that cannot join are dropped
        before the shuffle. At 100 TB this turns 'shuffle all of
        lineitem' into 'shuffle the ~20% that can match'; the configs
        only scale the size gates down to test data."""
        old = {k: spark.conf.get(k, None) for k in _BLOOM_CONF}
        for k, v in _BLOOM_CONF.items():
            spark.conf.set(k, v)
        try:
            o = tables["orders"].where("o_orderpriority = '1-URGENT'")
            li = tables["lineitem"]
            j = (
                li.join(o, li.l_orderkey == o.o_orderkey)
                .groupBy("o_orderpriority")
                .agg(F.count("*").alias("n"))
            )
            from concurrent_etl_spark.plans.explain import plan_string

            plan = plan_string(j, "formatted")
            assert "might_contain" in plan, plan[:2000]
            assert "bloom_filter_agg" in plan.lower(), plan[:2000]
            # correctness: identical to the bloom-free result
            got = {(r["o_orderpriority"], r["n"]) for r in j.collect()}
            spark.conf.set(
                "spark.sql.optimizer.runtime.bloomFilter.enabled", "false"
            )
            exp = {(r["o_orderpriority"], r["n"]) for r in j.collect()}
            assert got == exp and len(got) == 1
        finally:
            for k, v in old.items():
                if v is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, v)


class TestDynamicPartitionPruning:
    def test_fact_scan_is_partition_pruned_both_ways(self, spark):
        """The partitioned fact scan must carry BOTH the statically
        inferred partition predicate (constraint propagation through
        the equi-join) and a dynamicpruning subquery expression."""
        from concurrent_etl_spark.queries_catalog import (
            q_dynamic_partition_pruning_audit,
        )

        df = q_dynamic_partition_pruning_audit(
            spark, "/root/testdata/sf0.001"
        )
        plan = df._jdf.queryExecution().toString()
        scan_lines = [
            line for line in plan.splitlines() if "PartitionFilters" in line
        ]
        assert scan_lines, "expected a partitioned FileScan"
        assert "dynamicpruning" in plan
        assert any("substring" in line for line in scan_lines), (
            "inferred static partition predicate missing from scan"
        )

    def test_result_covers_only_hot_partitions(self, spark):
        from concurrent_etl_spark.queries_catalog import (
            q_dynamic_partition_pruning_audit,
        )

        rows = q_dynamic_partition_pruning_audit(
            spark, "/root/testdata/sf0.001"
        ).collect()
        assert {r["priority"][:1] for r in rows} <= {"1", "2"}
        assert all(r["n_orders"] > 0 for r in rows)
