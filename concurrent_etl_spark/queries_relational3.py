"""Third relational tranche: SQL-surface idioms a warehouse user of
the reference reaches for that SURVEY §2.4 doesn't enumerate —
grouping sets, correlated EXISTS, CTE pipelines, exact percentiles,
distribution ranks, unpivot, deterministic hash sampling, and an
explicit salted-join formulation of the skew mitigation AQE does
automatically.

Determinism conventions as elsewhere: decimal-exact sums, explicit
tiebreaks on every ranking, md5 (never engine hash) for sampling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from concurrent_etl_spark.catalog import dsum, query
from concurrent_etl_spark.engine import load_table


@query(
    "grouping_sets_agg",
    oracle="""
    SELECT coalesce(o_orderstatus, 'ALL') AS status,
           coalesce(o_orderpriority, 'ALL') AS priority,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
             AS total_value
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                            (o_orderstatus), ())
    -- engine semantics: zero rows over an empty relation (see rollup_agg)
    HAVING COUNT(*) > 0 OR (SELECT COUNT(*) FROM orders) > 0
    """,
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS — the general form of rollup/cube (both already
    covered); exercises Spark's Expand operator via the SQL path."""
    o = load_table(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT coalesce(o_orderstatus, 'ALL') AS status,
               coalesce(o_orderpriority, 'ALL') AS priority,
               COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
                 AS total_value
        FROM {o}
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                (o_orderstatus), ())
        """,
        o=o,
    )


@query(
    "exists_correlated",
    oracle="""
    SELECT c.c_custkey AS custkey, c.c_name AS name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
      AND NOT EXISTS (SELECT 1 FROM orders o2
                      WHERE o2.o_custkey = c.c_custkey
                        AND o2.o_orderstatus = 'P')
    """,
)
def q_exists_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS / NOT EXISTS — Catalyst rewrites these to the
    semi/anti joins the reference hand-built with isin masks
    (``case_2/Normal.py:63-67``)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT c.c_custkey AS custkey, c.c_name AS name
        FROM {c} c
        WHERE EXISTS (SELECT 1 FROM {o} o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
          AND NOT EXISTS (SELECT 1 FROM {o} o2
                          WHERE o2.o_custkey = c.c_custkey
                            AND o2.o_orderstatus = 'P')
        """,
        c=c,
        o=o,
    )


@query(
    "cte_revenue_topn",
    oracle="""
    WITH rev AS (
      SELECT c.c_nationkey AS nationkey,
             CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
               AS revenue,
             COUNT(*) AS n_orders
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1)
    SELECT n.n_name AS nation_name, r.revenue, r.n_orders
    FROM rev r JOIN nation n ON n.n_nationkey = r.nationkey
    ORDER BY r.revenue DESC, nation_name LIMIT 5
    """,
)
def q_cte_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-CTE pipeline: fact->dim agg, second dim join, global
    top-N. The orders->customer join shuffles on custkey; the
    25-row nation join broadcasts."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    rev = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(dsum("o_totalprice", "revenue"), F.count("*").alias("n_orders"))
    )
    return (
        rev.join(F.broadcast(n), n["n_nationkey"] == rev["nationkey"])
        .select(F.col("n_name").alias("nation_name"), "revenue", "n_orders")
        .orderBy(F.col("revenue").desc(), "nation_name")
        .limit(5)
    )


@query(
    "percentiles_acctbal",
    oracle="""
    SELECT c_mktsegment AS segment,
           COUNT(*) AS n,
           quantile_cont(c_acctbal, 0.25) AS p25,
           quantile_cont(c_acctbal, 0.5) AS p50,
           quantile_cont(c_acctbal, 0.75) AS p75,
           quantile_cont(c_acctbal, 0.9) AS p90,
           MIN(c_acctbal) AS lo, MAX(c_acctbal) AS hi
    FROM customer GROUP BY 1
    """,
)
def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (verified bit-identical
    to DuckDB quantile_cont). At scale swap in approx_percentile —
    single-pass sketch — when exactness isn't contractual."""
    c = load_table(spark, sf_dir, "customer")
    return (
        c.groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count("*").alias("n"),
            F.expr("percentile(c_acctbal, array(0.25D, 0.5D, 0.75D, 0.9D))").alias(
                "_p"
            ),
            F.min("c_acctbal").alias("lo"),
            F.max("c_acctbal").alias("hi"),
        )
        .select(
            "segment",
            "n",
            F.col("_p")[0].alias("p25"),
            F.col("_p")[1].alias("p50"),
            F.col("_p")[2].alias("p75"),
            F.col("_p")[3].alias("p90"),
            "lo",
            "hi",
        )
    )


@query(
    "ntile_ranks",
    oracle="""
    SELECT c_custkey AS custkey, c_mktsegment AS segment,
           CAST(ntile(4) OVER w AS INTEGER) AS quartile,
           percent_rank() OVER w AS pct_rank,
           cume_dist() OVER w AS cum_dist
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    """,
)
def q_ntile_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution ranks: ntile/percent_rank/cume_dist (exact integer
    ratios => cross-engine identical doubles)."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return c.select(
        F.col("c_custkey").alias("custkey"),
        F.col("c_mktsegment").alias("segment"),
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cum_dist"),
    )


@query(
    "unpivot_measures",
    oracle="""
    SELECT l_orderkey AS orderkey, l_linenumber AS linenumber,
           measure, value
    FROM (
      SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure,
             l_quantity AS value FROM lineitem
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice
      FROM lineitem
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
      FROM lineitem)
    """,
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide->long unpivot (melt) — the inverse of the pivot query;
    narrow scan of exactly 5 columns feeds a 3x row expansion."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_discount"],
        "measure",
        "value",
    ).select(
        F.col("l_orderkey").alias("orderkey"),
        F.col("l_linenumber").alias("linenumber"),
        "measure",
        "value",
    )


@query(
    "hash_sample",
    oracle="""
    SELECT o_orderkey AS orderkey, o_custkey AS custkey,
           o_totalprice AS totalprice
    FROM orders
    WHERE ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT
          % 10 = 0
    """,
)
def q_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~10% sample by key hash. Unlike TABLESAMPLE this
    is reproducible across engines/runs/partitionings and stable under
    re-execution — the property a 100 TB pipeline needs for sampled
    QA and holdout splits; md5, never engine-native hash."""
    o = load_table(spark, sf_dir, "orders")
    h = F.conv(
        F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 8), 16, 10
    ).cast("bigint")
    return o.where(h % 10 == 0).select(
        F.col("o_orderkey").alias("orderkey"),
        F.col("o_custkey").alias("custkey"),
        F.col("o_totalprice").alias("totalprice"),
    )


@query(
    "salted_skew_join",
    oracle="""
    SELECT o.o_orderpriority AS priority,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
             AS total_price
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY 1
    """,
)
def q_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit salted join: fact side gets a hash salt, dim side
    explodes over all 8 salts, join keys on (orderkey, salt). The
    manual form of AQE skew-split for when one key holds a double-digit
    percentage of rows; results provably equal the unsalted join (the
    oracle is the plain join). Salt uses Spark's hash — it only routes
    rows, never reaches the result."""
    n_salt = 8
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_extendedprice",
        F.pmod(F.hash("l_partkey", "l_suppkey", "l_linenumber"), F.lit(n_salt)).alias(
            "salt"
        ),
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.explode(F.array(*[F.lit(i) for i in range(n_salt)])).alias("salt"),
    )
    return (
        li.join(
            o,
            (li["l_orderkey"] == o["o_orderkey"]) & (li["salt"] == o["salt"]),
        )
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count("*").alias("n_items"),
            dsum("l_extendedprice", "total_price"),
        )
    )


@query(
    "regional_supplier_volume",
    oracle="""
    SELECT n.n_name AS nation_name,
           CAST(SUM(CAST(round(l.l_extendedprice * (1 - l.l_discount), 4)
                         AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= DATE '1996-01-01'
      AND o.o_orderdate < DATE '1998-01-01'
    GROUP BY n.n_name
    """,
)
def q_regional_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped 6-way join + aggregation — the multi-join shape
    the reference's star pipeline grows into at warehouse scale.

    Scale/plan contract (see tests/test_operators.py):
      * No broadcast hints on lineitem/orders/customer — all three
        scale with data volume; Catalyst orders the joins and AQE
        picks broadcast only where runtime sizes allow.
      * The region filter reaches the region scan (pushdown) and
        prunes nations before they touch the fact; the date filter is
        pushed into the orders scan (PushedFilters in the plan).
      * supplier joins on BOTH l_suppkey and the customer nation —
        Catalyst resolves the conjunctive equi-join without a theta
        fallback.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("date"))
    )
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    joined = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(
            s,
            (li["l_suppkey"] == s["s_suppkey"])
            & (c["c_nationkey"] == s["s_nationkey"]),
        )
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
    )
    return (
        joined.withColumn(
            "revenue_item",
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4),
        )
        .groupBy(F.col("n_name").alias("nation_name"))
        .agg(
            dsum("revenue_item", "revenue"),
            F.count("*").alias("n_items"),
        )
    )


@query(
    "price_histogram",
    oracle="""
    SELECT CAST(floor(l_extendedprice / 5000.0) AS BIGINT) AS bucket,
           CAST(floor(l_extendedprice / 5000.0) AS BIGINT) * 5000.0
             AS bucket_lo,
           COUNT(*) AS n,
           CAST(MIN(l_extendedprice) AS DOUBLE) AS min_price,
           CAST(MAX(l_extendedprice) AS DOUBLE) AS max_price
    FROM lineitem
    GROUP BY 1, 2
    """,
)
def q_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of extended price — the distribution-
    profiling pass run before choosing partition/bucket boundaries.
    One map-side-combinable aggregation: the shuffle carries one row
    per (partition x bucket), never the fact rows. Fixed bucket edges
    (not data-dependent quantiles) keep it single-pass."""
    li = load_table(spark, sf_dir, "lineitem")
    bucket = F.floor(F.col("l_extendedprice") / F.lit(5000.0)).cast("bigint")
    return (
        li.groupBy(
            bucket.alias("bucket"),
            (bucket * F.lit(5000.0)).alias("bucket_lo"),
        )
        .agg(
            F.count("*").alias("n"),
            F.min("l_extendedprice").cast("double").alias("min_price"),
            F.max("l_extendedprice").cast("double").alias("max_price"),
        )
    )


@query(
    "null_safe_join_agg",
    oracle="""
    WITH l AS (
      SELECT o_orderkey,
             CASE WHEN o_orderpriority = '1-URGENT' THEN NULL
                  ELSE o_orderpriority END AS prio
      FROM orders),
    r AS (
      SELECT DISTINCT prio, coalesce(prio, 'UNKNOWN') AS label
      FROM l)
    SELECT r.label, COUNT(*) AS n
    FROM l JOIN r ON l.prio IS NOT DISTINCT FROM r.prio
    GROUP BY r.label
    """,
)
def q_null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (<=> / IS NOT DISTINCT FROM): NULL keys
    match each other instead of silently dropping — the join the
    reference would have needed had a dimension key been nullable
    (its left joins drop nothing but attach nothing for NULLs either).
    Still hash-joinable: <=> is an equi-predicate, not a theta join.
    """
    o = load_table(spark, sf_dir, "orders")
    left = o.select(
        "o_orderkey",
        F.when(F.col("o_orderpriority") == "1-URGENT", F.lit(None))
        .otherwise(F.col("o_orderpriority"))
        .alias("prio"),
    )
    right = left.select(
        "prio", F.coalesce("prio", F.lit("UNKNOWN")).alias("label")
    ).distinct()
    return (
        left.join(right, left["prio"].eqNullSafe(right["prio"]))
        .groupBy("label")
        .agg(F.count("*").alias("n"))
    )


@query(
    "gapfill_hourly_events",
    oracle="""
    WITH b AS (
      SELECT time_bucket(INTERVAL 1 HOUR, ts) AS hour_start, COUNT(*) AS n
      FROM events WHERE event_type = 'purchase' GROUP BY 1),
    bounds AS (SELECT MIN(hour_start) AS lo, MAX(hour_start) AS hi FROM b),
    spine AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour_start
      FROM bounds)
    SELECT s.hour_start, coalesce(b.n, 0) AS n
    FROM spine s LEFT JOIN b USING (hour_start)
    """,
)
def q_gapfill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling: hourly purchase counts with empty
    hours materialized as zero rows.

    A dense spine is generated with sequence()+explode between the
    observed bounds (a one-row broadcast, never a driver loop), then
    left-joined to the sparse aggregate. Dashboards and window
    functions both need the dense form — a rolling average over a
    sparse series silently skips the empty buckets. Spine size =
    time range / bucket, independent of event volume, so at 100 TB
    the spine is still tiny; the only fact-sized work is the keyed
    aggregation.
    """
    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type") == "purchase"
    )
    hourly = (
        ev.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour_start")
        ).agg(F.count("*").alias("n_obs"))
    )
    bounds = hourly.agg(
        F.min("hour_start").alias("lo"), F.max("hour_start").alias("hi")
    )
    spine = bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
        ).alias("hour_start")
    )
    return (
        spine.join(hourly, "hour_start", "left")
        .select("hour_start", F.coalesce("n_obs", F.lit(0)).alias("n"))
    )


@query(
    "range_frame_running_value",
    oracle="""
    SELECT event_id, user_id, ts,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER (
             PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
             AS DOUBLE) AS value_1h
    FROM events
    """,
)
def q_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time RANGE window frame: per-user sum of `value` over the
    trailing hour of each event — frame bounds in TIME, not row
    counts (a rows-frame is wrong when event spacing is uneven).
    One shuffle on user_id, one sort; frame evaluation is a sliding
    pointer over the sorted run, not a self-join.

    Frame bounds are in MICROSECONDS (unix_micros), not seconds:
    casting ts to long truncates sub-second precision, which silently
    shifts the frame boundary for events with fractional seconds —
    caught by the sf0.1 oracle run where denser data hits exact
    1-hour-boundary pairs (sf0.01 never did).
    """
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.sum(F.col("value").cast("decimal(18,4)"))
        .over(w)
        .cast("double")
        .alias("value_1h"),
    )


@query(
    "iqr_outliers",
    oracle="""
    WITH cust AS (
      SELECT c_custkey, c_mktsegment,
             CASE WHEN c_custkey % 97 = 0 THEN c_acctbal * 50.0
                  ELSE c_acctbal END AS c_acctbal
      FROM customer),
    fences AS (
      SELECT c_mktsegment AS segment,
             quantile_cont(c_acctbal, 0.25) AS q1,
             quantile_cont(c_acctbal, 0.75) AS q3
      FROM cust GROUP BY 1)
    SELECT c.c_custkey AS custkey, f.segment, c.c_acctbal AS acctbal,
           round(f.q1 - 1.5 * (f.q3 - f.q1), 9) AS fence_lo,
           round(f.q3 + 1.5 * (f.q3 - f.q1), 9) AS fence_hi
    FROM cust c JOIN fences f ON c.c_mktsegment = f.segment
    WHERE c.c_acctbal < round(f.q1 - 1.5 * (f.q3 - f.q1), 9)
       OR c.c_acctbal > round(f.q3 + 1.5 * (f.q3 - f.q1), 9)
    """,
)
def q_iqr_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence outlier detection per segment — the numeric data-
    cleaning gate of a curation pipeline. The per-group fences are a
    tiny aggregate broadcast back onto the scan; the fact rows are
    filtered where they live, never shuffled. Fences rounded to 9
    decimals before comparison so the boundary test can't flip on
    sub-ulp quantile differences between engines. The uniform
    synthetic balances produce no natural Tukey outliers, so every
    97th customer's balance is scaled 50x (reproduced by the oracle)
    to make the check non-trivial."""
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_mktsegment",
        F.when(
            F.col("c_custkey") % 97 == 0, F.col("c_acctbal") * 50.0
        )
        .otherwise(F.col("c_acctbal"))
        .alias("c_acctbal"),
    )
    fences = c.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.expr("percentile(c_acctbal, 0.25D)").alias("q1"),
        F.expr("percentile(c_acctbal, 0.75D)").alias("q3"),
    )
    lo = F.round(F.col("q1") - 1.5 * (F.col("q3") - F.col("q1")), 9)
    hi = F.round(F.col("q3") + 1.5 * (F.col("q3") - F.col("q1")), 9)
    return (
        c.join(
            # broadcast-ok: one row per mktsegment (5-value enum)
            F.broadcast(fences), c["c_mktsegment"] == fences["segment"]
        )
        .withColumns({"fence_lo": lo, "fence_hi": hi})
        .where(
            (F.col("c_acctbal") < F.col("fence_lo"))
            | (F.col("c_acctbal") > F.col("fence_hi"))
        )
        .select(
            F.col("c_custkey").alias("custkey"),
            "segment",
            F.col("c_acctbal").alias("acctbal"),
            "fence_lo",
            "fence_hi",
        )
    )


@query(
    "regression_per_user",
    oracle="""
    SELECT user_id,
           round(regr_slope(value, (epoch_us(ts) - 1704067200000000)
                                   / 3600000000.0), 6) AS slope,
           round(regr_intercept(value, (epoch_us(ts) - 1704067200000000)
                                       / 3600000000.0), 6) AS intercept,
           CAST(regr_count(value, epoch_us(ts)) AS BIGINT) AS n
    FROM events
    GROUP BY user_id
    """,
)
def q_regression_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key least-squares trend (regr_slope/intercept) of event
    value over time — drift detection per entity, as a single
    map-side-combinable aggregation (the regression moments merge
    associatively; no window, no collect). x is hours since a FIXED
    epoch (2024-01-01), keeping magnitudes small so the closed-form
    cancellations stay far above double noise; outputs rounded to 6
    decimals for cross-engine stability."""
    ev = load_table(spark, sf_dir, "events")
    x = (F.unix_micros("ts") - F.lit(1704067200000000)) / F.lit(3.6e9)
    return (
        ev.select("user_id", F.col("value").alias("y"), x.alias("x"))
        .groupBy("user_id")
        .agg(
            F.round(F.expr("regr_slope(y, x)"), 6).alias("slope"),
            F.round(F.expr("regr_intercept(y, x)"), 6).alias("intercept"),
            F.expr("regr_count(y, x)").cast("bigint").alias("n"),
        )
    )
