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
