"""TPC-H-shaped analytics tranche 2 (Q6/Q7/Q13/Q14/Q15/Q17/Q18/Q19/Q22).

Completes the canonical warehouse query shapes over the synthetic star
schema (the reference's case_2 pipeline feeds exactly this kind of
star — `case_2/Normal.py:210-236` builds the dims these queries would
consume). Shapes covered here and why they matter at 100 TB:

  * Q6  — single-scan selective filter + agg: the pure pushdown test.
  * Q7  — two aliased dimension joins (supplier-nation x
          customer-nation) + year rollup: join-reorder stress.
  * Q13 — left outer join + two-level aggregation (count distribution).
  * Q14 — conditional-aggregation ratio over a scan-pruned month band.
  * Q15 — scalar-subquery max against a persisted aggregate (view
          reuse without recompute).
  * Q17 — correlated per-group average threshold (join-back form).
  * Q18 — HAVING over a large group-by, joined back to dimensions,
          deterministic top-k.
  * Q19 — disjunctive multi-band predicate evaluated post-join.
  * Q22 — anti-join against a time-banded fact + scalar average gate.

All revenue terms round once then accumulate as DECIMAL (partition-
invariant, bit-identical to the DuckDB oracle's sequential sum); every
LIMIT carries a total-order tiebreak. Table subset note: the testdata
star has no partsupp/phone/shipmode/commitdate columns, so Q7/Q17/Q18/
Q22 use the closest expressible adaptation (documented per query).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from concurrent_etl_spark.catalog import query
from concurrent_etl_spark.engine import load_table

#: revenue term: price * (1 - discount), rounded once, DECIMAL-summed
_REV = "CAST(round(l_extendedprice * (1 - l_discount), 6) AS DECIMAL(18,6))"


def _rev_col() -> F.Column:
    return F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")), 6
    ).cast("decimal(18,6)")


# ---------------------------------------------------------------------------
# Q6 — forecasting revenue change: one scan, fully pushed-down filters
# ---------------------------------------------------------------------------

@query(
    "tpch_q6_forecast_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(round(l_extendedprice * l_discount, 6)
                         AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 analog — discount-band revenue. The whole WHERE clause is
    scan-level (PushedFilters on shipdate/discount/quantity), so at
    100 TB this reads only row groups whose min/max stats overlap the
    band; the agg is a single map-side-partial global sum.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(
                F.round(F.col("l_extendedprice") * F.col("l_discount"), 6)
                .cast("decimal(18,6)")
            )
            .cast("double")
            .alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# Q7 — volume shipping: two aliased nation joins, year rollup
# ---------------------------------------------------------------------------

@query(
    "tpch_q7_nation_volume",
    oracle=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(EXTRACT(year FROM l_shipdate) AS INT) AS ship_year,
           CAST(SUM({_REV}) AS DOUBLE) AS volume,
           COUNT(*) AS n_items
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE n1.n_nationkey <> n2.n_nationkey
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY 1, 2, 3
    """,
)
def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 analog — cross-nation shipping volume by year. The same
    nation dimension joins TWICE under different aliases (supplier
    side and customer side) — both broadcast; the inequality filter
    runs post-join on the two small keys. Adaptation: TPC-H fixes two
    nations, but the sf0.001 fixture has too few suppliers for that
    to be non-trivial, so we keep the full cross-nation matrix (same
    plan shape, more output groups).
    """
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    n1 = n.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .where(F.col("n1_key") != F.col("n2_key"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("ship_year"),
        )
        .agg(
            F.sum(_rev_col()).cast("double").alias("volume"),
            F.count("*").alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# Q13 — customer order-count distribution: left join + 2-level agg
# ---------------------------------------------------------------------------

@query(
    "tpch_q13_customer_distribution",
    oracle="""
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
      SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey)
    GROUP BY c_count
    """,
)
def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 analog — how many customers placed k orders, for each k.
    Left outer join keeps zero-order customers (COUNT of a null
    column is 0, not 1 — the semantics the left join exists for);
    two cascaded aggregations, the second over a tiny domain. At
    scale the first agg shuffles on c_custkey; the second is
    near-free after AQE coalescing.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


# ---------------------------------------------------------------------------
# Q14 — promotion effect: conditional-aggregation ratio
# ---------------------------------------------------------------------------

@query(
    "tpch_q14_promo_revenue",
    oracle=f"""
    SELECT 100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {_REV}
                              ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
                 / CAST(SUM({_REV}) AS DOUBLE) AS promo_pct,
           CAST(SUM({_REV}) AS DOUBLE) AS total_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-03-01'
      AND l_shipdate < TIMESTAMP '1996-04-01'
    """,
)
def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 analog — share of one month's revenue from PROMO parts.
    The month band prunes the fact scan before the part join; both
    sums come out of ONE aggregate pass (conditional term inside),
    and the ratio divides two decimal-exact doubles, so the quotient
    is bit-identical cross-engine.
    """
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part")
    agg = (
        li.join(p, li.l_partkey == p.p_partkey)
        .agg(
            F.sum(
                F.when(F.col("p_type") == "PROMO", _rev_col()).otherwise(
                    F.lit(0).cast("decimal(18,6)")
                )
            )
            .cast("double")
            .alias("_promo"),
            F.sum(_rev_col()).cast("double").alias("total_revenue"),
        )
    )
    return agg.select(
        (F.lit(100.0) * F.col("_promo") / F.col("total_revenue")).alias(
            "promo_pct"
        ),
        "total_revenue",
    )


# ---------------------------------------------------------------------------
# Q15 — top supplier: scalar-subquery max over a reused aggregate
# ---------------------------------------------------------------------------

@query(
    "tpch_q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no, SUM({_REV}) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_rev = (SELECT MAX(total_rev) FROM revenue)
    """,
)
def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 analog — supplier(s) with max quarterly revenue. The
    revenue aggregate is referenced twice (rows + its max), so it is
    persisted — Spark unions/reuses do NOT share subplans, and
    recomputing a 100 TB scan for a 1-row max would double the job.
    The max-vs-row comparison happens on the DECIMAL (exact), not the
    double, so ties and equality are well-defined cross-engine.
    """
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(_rev_col()).alias("total_rev"))
        .persist()
    )
    mx = rev.agg(F.max("total_rev").alias("_mx"))
    s = load_table(spark, sf_dir, "supplier")
    return (
        rev.crossJoin(F.broadcast(mx))
        .where(F.col("total_rev") == F.col("_mx"))
        .join(s, F.col("supplier_no") == s.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_rev").cast("double").alias("total_revenue"),
        )
    )


# ---------------------------------------------------------------------------
# Q17 — small-quantity-order revenue: correlated per-group average
# ---------------------------------------------------------------------------

@query(
    "tpch_q17_small_quantity_revenue",
    oracle="""
    WITH avgq AS (
      SELECT l_partkey AS ap_key,
             0.2 * (CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
                    / COUNT(*)) AS qty_threshold
      FROM lineitem GROUP BY l_partkey)
    SELECT CAST(SUM(CAST(round(l_extendedprice, 6) AS DECIMAL(18,6)))
                AS DOUBLE) / 7.0 AS avg_yearly,
           COUNT(*) AS n_small
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    JOIN avgq ON l_partkey = ap_key
    WHERE p_brand = 'Brand#23' AND l_quantity < qty_threshold
    """,
)
def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 analog — revenue that would vanish without small-quantity
    orders of one brand. The correlated `l_quantity < 0.2 * avg(qty)
    per part` becomes a per-part aggregate joined back to the fact
    (the plan Catalyst would decorrelate to anyway). The average is
    exact-decimal-sum / count so the threshold double — and therefore
    every row's filter verdict — is bit-identical to the oracle's.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#23")
    avgq = li.groupBy(F.col("l_partkey").alias("ap_key")).agg(
        (
            F.lit(0.2)
            * (
                F.sum(F.col("l_quantity").cast("decimal(18,4)")).cast("double")
                / F.count("*")
            )
        ).alias("qty_threshold")
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(avgq, li.l_partkey == F.col("ap_key"))
        .where(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            (
                F.sum(F.round("l_extendedprice", 6).cast("decimal(18,6)"))
                .cast("double")
                / F.lit(7.0)
            ).alias("avg_yearly"),
            F.count("*").alias("n_small"),
        )
    )


# ---------------------------------------------------------------------------
# Q18 — large-volume orders: HAVING + join-back + deterministic top-k
# ---------------------------------------------------------------------------

@query(
    "tpch_q18_large_orders",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY 1, 2, 3, 4, 5
    HAVING SUM(CAST(l_quantity AS DECIMAL(18,4))) >
           CAST(200 AS DECIMAL(18,4))
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 50
    """,
)
def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 analog — top-50 largest orders by quantity (threshold 200
    ~ top few % at every SF; TPC-H's 300+ is empty at sf0.001). The
    HAVING compares DECIMALs (exact) so the surviving set is
    identical cross-engine; ordering ties broken by orderkey. At
    scale the groupBy shuffles on the (already co-located) orderkey;
    the customer join happens AFTER the reduction, touching only
    surviving groups.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            "c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice"
        )
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,4)")).alias("_sq"))
        .where(F.col("_sq") > F.lit(200).cast("decimal(18,4)"))
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(50)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            F.col("_sq").cast("double").alias("sum_qty"),
        )
    )


# ---------------------------------------------------------------------------
# Q19 — discounted revenue: disjunctive multi-band predicate
# ---------------------------------------------------------------------------

@query(
    "tpch_q19_disjunctive_revenue",
    oracle=f"""
    SELECT CAST(SUM({_REV}) AS DOUBLE) AS revenue, COUNT(*) AS n_items
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#11' AND l_quantity BETWEEN 1 AND 11
           AND p_size BETWEEN 1 AND 5)
       OR (p_brand = 'Brand#21' AND l_quantity BETWEEN 10 AND 20
           AND p_size BETWEEN 1 AND 10)
       OR (p_brand = 'Brand#23' AND l_quantity BETWEEN 20 AND 30
           AND p_size BETWEEN 1 AND 15)
    """,
)
def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 analog — OR of three (brand, quantity-band, size-band)
    conjuncts straddling both join sides. Catalyst extracts the
    common join key and pushes the per-side residuals (quantity bands
    to the fact scan, brand/size union to the part scan) — the
    disjunction itself evaluates post-join. The classic test that
    OR-predicates don't silently become a cartesian filter.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    j = li.join(p, li.l_partkey == p.p_partkey)
    band = (
        (
            (F.col("p_brand") == "Brand#11")
            & F.col("l_quantity").between(1, 11)
            & F.col("p_size").between(1, 5)
        )
        | (
            (F.col("p_brand") == "Brand#21")
            & F.col("l_quantity").between(10, 20)
            & F.col("p_size").between(1, 10)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("l_quantity").between(20, 30)
            & F.col("p_size").between(1, 15)
        )
    )
    return j.where(band).agg(
        F.sum(_rev_col()).cast("double").alias("revenue"),
        F.count("*").alias("n_items"),
    )


# ---------------------------------------------------------------------------
# Q8 — market share: per-group conditional-aggregation ratio, 7-way join
# ---------------------------------------------------------------------------

@query(
    "tpch_q8_market_share",
    oracle=f"""
    SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS order_year,
           CAST(SUM(CASE WHEN sr.r_name = 'EUROPE' THEN {_REV}
                         ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
             / CAST(SUM({_REV}) AS DOUBLE) AS europe_share,
           CAST(SUM({_REV}) AS DOUBLE) AS total_volume
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    JOIN region cr ON cn.n_regionkey = cr.r_regionkey
    JOIN part ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    JOIN region sr ON sn.n_regionkey = sr.r_regionkey
    WHERE cr.r_name = 'ASIA' AND p_type = 'STANDARD'
    GROUP BY 1
    """,
)
def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 analog — EUROPE suppliers' share of STANDARD-part revenue
    sold to ASIA customers, per order year. Nation and region each
    join TWICE under customer/supplier aliases (all four broadcast);
    the share is a per-group conditional-aggregation ratio (vs Q14's
    global ratio) — numerator and denominator come out of the same
    decimal-exact aggregate pass, so the quotient hashes identically.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    p = load_table(spark, sf_dir, "part").where(F.col("p_type") == "STANDARD")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    cn = n.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_rkey")
    )
    cr = r.where(F.col("r_name") == "ASIA").select(
        F.col("r_regionkey").alias("cr_key")
    )
    sn = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_regionkey").alias("sn_rkey")
    )
    sr = r.select(
        F.col("r_regionkey").alias("sr_key"), F.col("r_name").alias("supp_region")
    )
    agg = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(cr), F.col("cn_rkey") == F.col("cr_key"))
        .join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(sr), F.col("sn_rkey") == F.col("sr_key"))
        .groupBy(F.year("o_orderdate").alias("order_year"))
        .agg(
            F.sum(
                F.when(F.col("supp_region") == "EUROPE", _rev_col()).otherwise(
                    F.lit(0).cast("decimal(18,6)")
                )
            )
            .cast("double")
            .alias("_eur"),
            F.sum(_rev_col()).cast("double").alias("total_volume"),
        )
    )
    return agg.select(
        "order_year",
        (F.col("_eur") / F.col("total_volume")).alias("europe_share"),
        "total_volume",
    )


# ---------------------------------------------------------------------------
# Q9 — product-type profit: computed measure over a 5-way join
# ---------------------------------------------------------------------------

@query(
    "tpch_q9_product_profit",
    oracle="""
    SELECT sn.n_name AS supp_nation,
           CAST(EXTRACT(year FROM o_orderdate) AS INT) AS order_year,
           CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount)
                               - 0.5 * p_retailprice * l_quantity, 6)
                         AS DECIMAL(18,6))) AS DOUBLE) AS profit,
           COUNT(*) AS n_items
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    JOIN orders ON l_orderkey = o_orderkey
    WHERE p_name LIKE '%rod%'
    GROUP BY 1, 2
    """,
)
def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 analog — profit (revenue minus a retail-price cost proxy;
    the fixture has no partsupp.ps_supplycost) by supplier nation and
    order year, for parts whose name contains 'rod'. The LIKE filter
    prunes part before the fact join; the profit term is rounded ONCE
    as a whole then decimal-accumulated, the same discipline as the
    revenue term — rounding sub-terms separately would diverge.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(F.col("p_name").like("%rod%"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders")
    profit = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.5 * F.col("p_retailprice") * F.col("l_quantity"),
        6,
    ).cast("decimal(18,6)")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n.select(F.col("n_nationkey").alias("sn_key"),
                                   F.col("n_name").alias("supp_nation"))),
              F.col("s_nationkey") == F.col("sn_key"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("supp_nation", F.year("o_orderdate").alias("order_year"))
        .agg(
            F.sum(profit).cast("double").alias("profit"),
            F.count("*").alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# Q22 — dormant high-balance customers: anti-join + scalar average gate
# ---------------------------------------------------------------------------

@query(
    "tpch_q22_dormant_customers",
    oracle="""
    SELECT c_nationkey,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           CAST(SUM(CAST(round(c_acctbal, 6) AS DECIMAL(18,6)))
                AS DOUBLE) AS totacctbal
    FROM customer
    WHERE c_acctbal > (
        SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE)
                 / COUNT(*)
        FROM customer WHERE c_acctbal > 0.0)
      AND NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey
          AND o_orderdate >= TIMESTAMP '2001-01-01')
    GROUP BY c_nationkey
    """,
)
def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 analog — per-nation count/balance of above-average-balance
    customers with no RECENT orders (the fixture has no phone column
    for country codes, and every customer has some historic order, so
    the dormancy window makes the anti-join non-trivial). The scalar
    average gate broadcasts; the NOT EXISTS is a left_anti join
    against the date-pruned orders scan.
    """
    c = load_table(spark, sf_dir, "customer")
    avg_bal = c.where(F.col("c_acctbal") > 0.0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(18,4)")).cast("double")
            / F.count("*")
        ).alias("_avg")
    )
    recent = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp")
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("_avg"))
        .join(recent, c.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            F.sum(F.round("c_acctbal", 6).cast("decimal(18,6)"))
            .cast("double")
            .alias("totacctbal"),
        )
    )
