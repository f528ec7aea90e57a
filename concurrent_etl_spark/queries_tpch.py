"""TPC-H-shaped end-to-end analytics queries (Q3, Q10 analogs).

The flagship and regional_supplier_volume already cover Q1/Q5 shapes;
these add the two other canonical warehouse patterns — a date-banded
top-k revenue ranking (Q3) and a returned-items customer ranking
(Q10) — over the synthetic star schema. Revenue terms round the
double product once, then accumulate as DECIMAL (partition-invariant,
bit-identical to the oracle's sequential sum); every top-k is
tie-broken on the key so LIMIT is deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from concurrent_etl_spark.catalog import query
from concurrent_etl_spark.engine import load_table

#: revenue term shared by both queries: price * (1 - discount),
#: rounded once then DECIMAL-accumulated
_REV = "CAST(round(l_extendedprice * (1 - l_discount), 6) AS DECIMAL(18,6))"


def _rev_col() -> F.Column:
    return F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")), 6
    ).cast("decimal(18,6)")


@query(
    "tpch_q3_shipping_priority",
    oracle=f"""
    SELECT l_orderkey AS orderkey,
           CAST(SUM({_REV}) AS DOUBLE) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-06-01'
      AND l_shipdate > TIMESTAMP '1998-06-01'
    GROUP BY 1, 3, 4
    ORDER BY SUM({_REV}) DESC, orderkey
    LIMIT 10
    """,
)
def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 analog — shipping priority: top-10 unshipped BUILDING-segment
    orders by outstanding revenue. Both date predicates and the
    segment filter push to the scans (visible as PushedFilters);
    customer joins broadcast; the revenue agg reduces BEFORE the
    top-k, so the ordering sorts order-cardinality rows and
    TakeOrdered keeps only 10 per partition. Deterministic under the
    orderkey tiebreak.
    """
    c = load_table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-06-01").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-06-01").cast("timestamp")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("l_orderkey").alias("orderkey"),
            "o_orderdate",
            "o_orderpriority",
        )
        .agg(F.sum(_rev_col()).alias("_srev"))
        .orderBy(F.desc("_srev"), F.asc("orderkey"))
        .limit(10)
        .select(
            "orderkey",
            F.col("_srev").cast("double").alias("revenue"),
            "o_orderdate",
            "o_orderpriority",
        )
    )


@query(
    "tpch_q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name, n_name,
           round(c_acctbal, 6) AS acctbal,
           CAST(SUM({_REV}) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1999-01-01'
      AND o_orderdate < TIMESTAMP '1999-04-01'
    GROUP BY 1, 2, 3, 4
    ORDER BY SUM({_REV}) DESC, c_custkey
    LIMIT 20
    """,
)
def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 analog — returned-item reporting: top-20 customers by
    revenue lost to returns in 1999Q1, with nation context. The
    quarter band and the return flag prune at the scans; nation
    broadcasts; the agg keys on the customer (already-unique)
    attributes so no second dedup is needed. TakeOrdered top-20 with
    custkey tiebreak.
    """
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-04-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_returnflag") == "R"
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(
            "c_custkey",
            "c_name",
            "n_name",
            F.round("c_acctbal", 6).alias("acctbal"),
        )
        .agg(F.sum(_rev_col()).alias("_srev"))
        .orderBy(F.desc("_srev"), F.asc("c_custkey"))
        .limit(20)
        .select(
            "c_custkey",
            "c_name",
            "n_name",
            "acctbal",
            F.col("_srev").cast("double").alias("revenue"),
        )
    )
