"""Extended relational surface: the engine capabilities beyond the
reference that SURVEY §2.4 commits to ("the engine must still ship
groupBy/Window/orderBy/set-ops...") plus the SQL idioms any
warehouse-shaped user of the reference would reach for next.

All built-in Spark primitives — the value here is the oracle-checked
pairing and the deterministic cross-engine formulations:

  * statistical aggs (stddev/variance) via exact decimal moments —
    partitioned accumulation order cannot perturb the result;
  * day-of-week normalized to ISO (Spark dayofweek is 1=Sunday,
    DuckDB dow is 0=Sunday);
  * pivot with an explicit value list so output columns are stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from concurrent_etl_spark.catalog import dsum, query
from concurrent_etl_spark.engine import load_table


# ---------------------------------------------------------------------------
# joins beyond the reference's left/anti/semi
# ---------------------------------------------------------------------------

@query(
    "join_right",
    oracle="""
    SELECT o.o_orderkey AS orderkey, c.c_custkey AS custkey,
           c.c_name AS customer_name
    FROM orders o
    RIGHT JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def q_join_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return o.join(c, o["o_custkey"] == c["c_custkey"], "right").select(
        F.col("o_orderkey").alias("orderkey"),
        F.col("c_custkey").alias("custkey"),
        F.col("c_name").alias("customer_name"),
    )


@query(
    "join_cross",
    oracle="""
    SELECT r.r_name AS region_name, s.s_name AS supplier_name
    FROM region r CROSS JOIN supplier s
    """,
)
def q_join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load_table(spark, sf_dir, "region")
    s = load_table(spark, sf_dir, "supplier")
    return r.crossJoin(s).select(
        F.col("r_name").alias("region_name"),
        F.col("s_name").alias("supplier_name"),
    )


@query(
    "scalar_subquery_filter",
    oracle="""
    SELECT o_orderkey AS orderkey, o_totalprice AS totalprice
    FROM orders
    WHERE o_totalprice > (
      SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
               / COUNT(*)
      FROM orders)
    """,
)
def q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter against a computed scalar (above-average orders).

    Expressed as a cross join against a 1-row aggregate — the plan
    Catalyst produces for an uncorrelated scalar subquery; the
    average uses the exact-decimal pattern for cross-engine equality.
    """
    o = load_table(spark, sf_dir, "orders")
    avg = o.agg(
        (
            F.sum(F.col("o_totalprice").cast("decimal(18,4)")).cast("double")
            / F.count("*")
        ).alias("avg_price")
    )
    return (
        o.crossJoin(F.broadcast(avg))
        .where(F.col("o_totalprice") > F.col("avg_price"))
        .select(
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_totalprice").alias("totalprice"),
        )
    )


# ---------------------------------------------------------------------------
# aggregation surface
# ---------------------------------------------------------------------------

@query(
    "having_filter",
    oracle="""
    SELECT o_custkey AS custkey, COUNT(*) AS n_orders
    FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 12
    """,
)
def q_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(F.count("*").alias("n_orders"))
        .where(F.col("n_orders") >= 12)
    )


@query(
    "cube_agg",
    oracle="""
    SELECT l_returnflag AS returnflag, l_linestatus AS linestatus,
           COUNT(*) AS n
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    -- engine semantics: zero rows over an empty relation (see rollup_agg)
    HAVING COUNT(*) > 0 OR (SELECT COUNT(*) FROM lineitem) > 0
    """,
)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "lineitem")
        .cube(
            F.col("l_returnflag").alias("returnflag"),
            F.col("l_linestatus").alias("linestatus"),
        )
        .agg(F.count("*").alias("n"))
    )


@query(
    "stats_moments",
    oracle="""
    WITH m AS (
      SELECT l_returnflag AS returnflag, COUNT(*) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS s1,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))
                      * CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS s2
      FROM lineitem GROUP BY 1)
    SELECT returnflag, n,
           s1 / n AS mean_qty,
           (s2 - s1 * s1 / n) / (n - 1) AS var_qty
    FROM m
    """,
)
def q_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean/variance via exact decimal moments — deterministic under
    any partitioning (built-in stddev would differ in last bits
    between engines/partitionings)."""
    li = load_table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("decimal(18,4)")
    m = li.groupBy(F.col("l_returnflag").alias("returnflag")).agg(
        F.count("*").alias("n"),
        F.sum(q).cast("double").alias("s1"),
        F.sum(q * q).cast("double").alias("s2"),
    )
    return m.select(
        "returnflag",
        "n",
        (F.col("s1") / F.col("n")).alias("mean_qty"),
        ((F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")) / (F.col("n") - 1)).alias(
            "var_qty"
        ),
    )


@query(
    "conditional_agg",
    oracle="""
    SELECT o_orderpriority AS priority,
           COUNT(*) AS n_total,
           COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_finished,
           CAST(SUM(CASE WHEN o_totalprice > 100000
                         THEN CAST(o_totalprice AS DECIMAL(18,4)) END)
                AS DOUBLE) AS big_order_value
    FROM orders GROUP BY 1
    """,
)
def q_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.count("*").alias("n_total"),
        F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("n_finished"),
        F.sum(
            F.when(
                F.col("o_totalprice") > 100000,
                F.col("o_totalprice").cast("decimal(18,4)"),
            )
        )
        .cast("double")
        .alias("big_order_value"),
    )


@query(
    "pivot_status_by_priority",
    oracle="""
    SELECT o_orderpriority AS priority,
           COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS F,
           COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS O,
           COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS P
    FROM orders GROUP BY 1
    """,
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with an explicit value list => stable output columns."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .na.fill(0, ["F", "O", "P"])
    )


# ---------------------------------------------------------------------------
# window-function surface
# ---------------------------------------------------------------------------

@query(
    "window_lag_lead_running",
    oracle="""
    SELECT o_custkey AS custkey, o_orderkey AS orderkey,
           o_totalprice AS totalprice,
           lag(o_orderkey) OVER w AS prev_orderkey,
           lead(o_orderkey) OVER w AS next_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER
                (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_spend,
           CAST(rank() OVER (PARTITION BY o_custkey
                             ORDER BY o_totalprice DESC, o_orderkey)
                AS INTEGER) AS price_rank,
           CAST(dense_rank() OVER (PARTITION BY o_custkey
                                   ORDER BY o_orderstatus)
                AS INTEGER) AS status_dense_rank
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def q_window_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("orderkey"),
        F.col("o_totalprice").alias("totalprice"),
        F.lag("o_orderkey").over(w).alias("prev_orderkey"),
        F.lead("o_orderkey").over(w).alias("next_orderkey"),
        F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("double")
        .alias("running_spend"),
        F.rank()
        .over(
            Window.partitionBy("o_custkey").orderBy(
                F.col("o_totalprice").desc(), "o_orderkey"
            )
        )
        .alias("price_rank"),
        F.dense_rank()
        .over(Window.partitionBy("o_custkey").orderBy("o_orderstatus"))
        .alias("status_dense_rank"),
    )


# ---------------------------------------------------------------------------
# date/time arithmetic
# ---------------------------------------------------------------------------

@query(
    "date_arithmetic",
    oracle="""
    SELECT o_orderkey AS orderkey,
           CAST(o_orderdate AS DATE) AS orderdate,
           CAST(year(o_orderdate) AS INTEGER) AS order_year,
           CAST(month(o_orderdate) AS INTEGER) AS order_month,
           CAST((CASE WHEN dayofweek(o_orderdate) = 0 THEN 7
                      ELSE dayofweek(o_orderdate) END) AS INTEGER) AS iso_dow,
           CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS due_date,
           date_diff('day', CAST(o_orderdate AS DATE), DATE '1999-01-01')
             AS days_to_1999,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start
    FROM orders
    """,
)
def q_date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date part extraction + arithmetic; day-of-week normalized to
    ISO (Mon=1..Sun=7) because engines disagree on the raw numbering."""
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    spark_dow = F.dayofweek(d)  # 1=Sunday .. 7=Saturday
    iso_dow = F.when(spark_dow == 1, 7).otherwise(spark_dow - 1)
    return o.select(
        F.col("o_orderkey").alias("orderkey"),
        d.alias("orderdate"),
        F.year(d).alias("order_year"),
        F.month(d).alias("order_month"),
        iso_dow.cast("int").alias("iso_dow"),
        F.date_add(d, 30).cast("timestamp").alias("due_date"),
        F.datediff(F.lit("1999-01-01").cast("date"), d).cast("bigint").alias(
            "days_to_1999"
        ),
        F.date_trunc("month", d).cast("date").alias("month_start"),
    )


# ---------------------------------------------------------------------------
# null handling / conditional scalars
# ---------------------------------------------------------------------------

@query(
    "null_scalars",
    oracle="""
    SELECT c_custkey AS custkey,
           coalesce(nullif(c_mktsegment, 'MACHINERY'), 'OTHER') AS segment_masked,
           greatest(c_acctbal, 0.0) AS acctbal_floor,
           least(c_acctbal, 5000.0) AS acctbal_cap,
           CASE WHEN c_acctbal < 0 THEN 'debt'
                WHEN c_acctbal < 5000 THEN 'mid'
                ELSE 'high' END AS balance_band
    FROM customer
    """,
)
def q_null_scalars(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        F.col("c_custkey").alias("custkey"),
        F.coalesce(
            F.nullif(F.col("c_mktsegment"), F.lit("MACHINERY")), F.lit("OTHER")
        ).alias("segment_masked"),
        F.greatest(F.col("c_acctbal"), F.lit(0.0)).alias("acctbal_floor"),
        F.least(F.col("c_acctbal"), F.lit(5000.0)).alias("acctbal_cap"),
        F.when(F.col("c_acctbal") < 0, "debt")
        .when(F.col("c_acctbal") < 5000, "mid")
        .otherwise("high")
        .alias("balance_band"),
    )


# ---------------------------------------------------------------------------
# lateral explode (UDTF-shaped surface, §2.9)
# ---------------------------------------------------------------------------

@query(
    "lateral_explode_tokens",
    oracle="""
    SELECT doc_id,
           unnest(list_filter(string_split_regex(text,
                                '[ \\t\\n\\x0B\\f\\r]+'),
                              t -> t <> '')) AS token
    FROM documents WHERE doc_id < 20
    """,
)
def q_lateral_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-to-many expansion (explode) — the built-in UDTF shape."""
    from concurrent_etl_spark.operators.text import tokens

    return (
        load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") < 20)
        .select("doc_id", F.explode(tokens("text")).alias("token"))
    )


@query(
    "union_all_dedup",
    oracle="""
    SELECT nationkey, src FROM (
      SELECT c_nationkey AS nationkey, 'cust' AS src FROM customer
      UNION ALL
      SELECT s_nationkey AS nationkey, 'supp' AS src FROM supplier)
    """,
)
def q_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey"), F.lit("cust").alias("src")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey"), F.lit("supp").alias("src")
    )
    return c.unionByName(s)


@query(
    "sort_nulls_ordering",
    oracle="""
    SELECT orderkey, joined_custkey FROM (
      SELECT o.o_orderkey AS orderkey, c.c_custkey AS joined_custkey,
             row_number() OVER (ORDER BY c.c_custkey DESC NULLS LAST,
                                o.o_orderkey) AS rn
      FROM orders o
      LEFT JOIN customer c
        ON o.o_custkey = c.c_custkey AND c.c_acctbal > 9000)
    WHERE rn <= 50
    """,
)
def q_sort_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit NULLS LAST ordering (engines default differently)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").where(F.col("c_acctbal") > 9000)
    joined = o.join(c, o["o_custkey"] == c["c_custkey"], "left").select(
        F.col("o_orderkey").alias("orderkey"),
        F.col("c_custkey").alias("joined_custkey"),
    )
    return (
        joined.orderBy(
            F.col("joined_custkey").desc_nulls_last(), F.col("orderkey")
        )
        .limit(50)
        .select("orderkey", "joined_custkey")
    )
