"""TPC-H-shaped analytics tranche 3 (Q2/Q4/Q11/Q12/Q16/Q20/Q21).

Completes the full 22-query TPC-H shape coverage (Q1/Q5 live in the
flagship + regional_supplier_volume, tranche 1 has Q3/Q10, tranche 2
has Q6/Q7/Q8/Q9/Q13/Q14/Q15/Q17/Q18/Q19/Q22). The testdata star has
no ``partsupp`` table, so the part-supplier relation is derived from
``lineitem`` (distinct ``(l_partkey, l_suppkey)`` pairs, with the
observed minimum unit price standing in for ``ps_supplycost`` and
shipped-quantity sums standing in for ``ps_availqty``); no commit/
receipt dates, so "late" is ``l_shipdate > o_orderdate + N days``.
Each adaptation is documented per query. Shapes covered and why they
matter at 100 TB:

  * Q2  — per-group min join-back across a derived relation: the
          argmin pattern without a window sort over the fact.
  * Q4  — EXISTS with a cross-table predicate as a conditioned
          semi join (never a count-then-filter materialization).
  * Q11 — group value vs a fraction of the global total: single
          aggregate reused via an empty-frame window, no recompute.
  * Q12 — fact-fact join + conditional (CASE) aggregation.
  * Q16 — count-distinct over a derived bridge with an anti-joined
          exclusion list.
  * Q20 — nested aggregate threshold feeding a semi-join chain.
  * Q21 — multi-EXISTS self-correlation collapsed to one grouped
          scan (distinct supplier counts) instead of three fact
          self-joins.

All money/quantity accumulation goes through DECIMAL (partition-
invariant, bit-identical to the DuckDB oracle); fractional thresholds
are DECIMAL literals so the comparison is exact in both engines;
every LIMIT carries a total-order tiebreak.

Reference parity note: the reference repo has no analytic queries at
all (its heavy lifting is delegated to opaque MSSQL merge procs,
``case_2/Normal.py:285-286``); this surface is the engine capability
bar from SURVEY.md §2.4's "beyond the reference" requirement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from concurrent_etl_spark.catalog import query
from concurrent_etl_spark.engine import load_table


def _region_suppliers(spark: SparkSession, sf_dir: str, region: str) -> DataFrame:
    """Suppliers in one region, with their nation name attached.

    supplier x nation x region are all dims — the chain folds into
    one broadcastable lookup regardless of fact scale.
    """
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == region)
    return (
        s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .select("s_suppkey", "s_name", "s_acctbal", F.col("n_name").alias("nation_name"))
    )


# ---------------------------------------------------------------------------
# Q2 — minimum-cost supplier: per-part argmin join-back
# ---------------------------------------------------------------------------

@query(
    "tpch_q2_min_cost_supplier",
    oracle="""
    WITH eu_supp AS (
      SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name AS nation_name
      FROM supplier s
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'EUROPE'
    ),
    cost AS (
      SELECT l_partkey, l_suppkey,
             MIN(l_extendedprice / l_quantity) AS supply_cost
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    eu_cost AS (
      SELECT c.l_partkey, c.l_suppkey, c.supply_cost,
             s.s_name, s.s_acctbal, s.nation_name
      FROM cost c JOIN eu_supp s ON c.l_suppkey = s.s_suppkey
    ),
    best AS (
      SELECT l_partkey, MIN(supply_cost) AS min_cost
      FROM eu_cost GROUP BY l_partkey
    )
    SELECT e.s_acctbal AS acctbal, e.s_name AS supplier_name,
           e.nation_name, p.p_partkey AS partkey, p.p_name AS part_name,
           e.supply_cost
    FROM eu_cost e
    JOIN best b ON e.l_partkey = b.l_partkey AND e.supply_cost = b.min_cost
    JOIN part p ON e.l_partkey = p.p_partkey
    WHERE p.p_type = 'STANDARD' AND p.p_size BETWEEN 10 AND 20
    ORDER BY acctbal DESC, nation_name, supplier_name, partkey
    LIMIT 100
    """,
)
def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 analog — cheapest regional supplier per part.

    ``ps_supplycost`` is derived as the minimum observed unit price
    per (part, supplier) — the raw IEEE quotient, deliberately
    unrounded: round() on a double is not cross-engine-stable at
    half-way points, while the same division produces the same bits
    everywhere and MIN is order-insensitive. The per-part minimum is computed by a second
    map-side-combinable aggregate and joined back — at 100 TB this is
    two keyed shuffles of pre-aggregated pairs, never a window sort
    over raw lineitem; part/supplier filters ride broadcast joins.
    """
    part = load_table(spark, sf_dir, "part").where(
        (F.col("p_type") == "STANDARD")
        & F.col("p_size").between(10, 20)
    )
    # the per-part minimum is independent across parts, so the part
    # band prunes the fact BEFORE the wide (part, supplier) aggregate
    # — a broadcast semi join cuts the grouped rows ~25x here and
    # turns the 100 TB plan into band-sized work (the oracle filters
    # after the aggregate; restriction commutes with per-part mins)
    li = load_table(spark, sf_dir, "lineitem").join(
        # no hint: filtered part keys scale with SF — AQE broadcasts when small
        (part.select("p_partkey")),
        F.col("l_partkey") == F.col("p_partkey"),
        "left_semi",
    )
    cost = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("supply_cost")
    )
    eu_cost = cost.join(
        # no hint: region suppliers scale with SF
        (_region_suppliers(spark, sf_dir, "EUROPE")),
        cost["l_suppkey"] == F.col("s_suppkey"),
    )
    best = eu_cost.groupBy(F.col("l_partkey").alias("b_partkey")).agg(
        F.min("supply_cost").alias("min_cost")
    )
    return (
        eu_cost.join(
            best,
            (eu_cost["l_partkey"] == best["b_partkey"])
            & (eu_cost["supply_cost"] == best["min_cost"]),
        )
        # no hint: part scales with SF
        .join((part), eu_cost["l_partkey"] == part["p_partkey"])
        .select(
            F.col("s_acctbal").alias("acctbal"),
            F.col("s_name").alias("supplier_name"),
            "nation_name",
            F.col("p_partkey").alias("partkey"),
            F.col("p_name").alias("part_name"),
            "supply_cost",
        )
        .orderBy(
            F.col("acctbal").desc(), "nation_name", "supplier_name", "partkey"
        )
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Q4 — order priority checking: conditioned EXISTS as a semi join
# ---------------------------------------------------------------------------

@query(
    "tpch_q4_priority_check",
    oracle="""
    SELECT o_orderpriority AS orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-07-01'
      AND o.o_orderdate < TIMESTAMP '1996-10-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
    GROUP BY o_orderpriority
    """,
)
def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 analog — priority distribution of late-shipping orders.

    "Late" adapts commit<receipt to ship > order date + 90 days (the
    testdata carries no commit/receipt dates). The EXISTS is a left-
    semi join whose condition references both sides — Spark evaluates
    it inside the join, so lineitem is never aggregated or
    materialized per order. The quarter filter prunes the orders scan
    before the shuffle; at 100 TB the semi join shuffles only
    (orderkey, shipdate)-projected lineitem rows.
    """
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        o.join(
            li,
            (o["o_orderkey"] == li["l_orderkey"])
            & (li["l_shipdate"] > o["o_orderdate"] + F.expr("INTERVAL 90 DAYS")),
            "left_semi",
        )
        .groupBy(F.col("o_orderpriority").alias("orderpriority"))
        .agg(F.count("*").alias("order_count"))
    )


# ---------------------------------------------------------------------------
# Q11 — important stock: group value vs a fraction of the global total
# ---------------------------------------------------------------------------

@query(
    "tpch_q11_important_stock",
    oracle="""
    WITH eu_supp AS (
      SELECT s.s_suppkey
      FROM supplier s
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'EUROPE'
    ),
    part_value AS (
      SELECT l.l_partkey,
             SUM(CAST(round(l.l_extendedprice * (1 - l.l_discount), 6)
                      AS DECIMAL(18,6))) AS value_dec
      FROM lineitem l
      JOIN eu_supp s ON l.l_suppkey = s.s_suppkey
      GROUP BY l.l_partkey
    )
    SELECT l_partkey AS partkey, CAST(value_dec AS DOUBLE) AS part_value
    FROM (
      SELECT l_partkey, value_dec,
             SUM(value_dec) OVER () AS total_dec,
             COUNT(*) OVER () AS n_parts
      FROM part_value
    )
    WHERE CAST(value_dec AS DOUBLE)
            > CAST(total_dec AS DOUBLE) * 1.5 / n_parts
    """,
)
def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 analog — parts whose regional revenue exceeds 1.5x the
    mean part share (TPC-H scales its 0.0001 fraction by 1/SF; a
    fixed fraction is degenerate here — all parts pass at sf0.001,
    none at sf0.1 — so the gate adapts as 1.5/n_parts, selecting a
    non-empty above-mean cohort at every scale: 14/331/2922 parts
    at sf0.001/0.01/0.1). The derived part
    value replaces ps_supplycost*ps_availqty. Total and part count
    reuse the per-part aggregate through one empty-frame window —
    a single-partition exchange of the *aggregated* rows (one per
    part), never a second fact scan. The gate compares doubles built
    from decimal-exact sums by identical IEEE ops on both engines.
    """
    li = load_table(spark, sf_dir, "lineitem")
    eu = _region_suppliers(spark, sf_dir, "EUROPE").select("s_suppkey")
    part_value = (
        # no hint: region suppliers scale with SF
        li.join((eu), li["l_suppkey"] == eu["s_suppkey"])
        .groupBy("l_partkey")
        .agg(
            F.sum(
                F.round(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")), 6
                ).cast("decimal(18,6)")
            ).alias("value_dec")
        )
    )
    total = Window.partitionBy()
    return (
        part_value.withColumn("total_dec", F.sum("value_dec").over(total))
        .withColumn("n_parts", F.count("*").over(total))
        .where(
            F.col("value_dec").cast("double")
            > F.col("total_dec").cast("double") * 1.5 / F.col("n_parts")
        )
        .select(
            F.col("l_partkey").alias("partkey"),
            F.col("value_dec").cast("double").alias("part_value"),
        )
    )


# ---------------------------------------------------------------------------
# Q12 — shipping categories: fact-fact join + conditional aggregation
# ---------------------------------------------------------------------------

@query(
    "tpch_q12_ship_priority",
    oracle="""
    SELECT l.l_returnflag AS returnflag,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY l.l_returnflag
    """,
)
def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 analog — urgent vs non-urgent line counts per return flag
    (l_returnflag stands in for the absent l_shipmode). Both join
    sides are facts, so no broadcast hint: the year filter prunes
    lineitem at the scan, then AQE picks the join strategy from
    runtime sizes. The CASE counts are integer partial aggregates —
    exactly associative.
    """
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy(F.col("l_returnflag").alias("returnflag"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# ---------------------------------------------------------------------------
# Q16 — supplier counts per part attribute, with an exclusion list
# ---------------------------------------------------------------------------

@query(
    "tpch_q16_supplier_counts",
    oracle="""
    WITH bridge AS (
      SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
    ),
    ok_bridge AS (
      SELECT b.l_partkey, b.l_suppkey
      FROM bridge b
      WHERE NOT EXISTS (
        SELECT 1 FROM supplier s
        WHERE s.s_suppkey = b.l_suppkey AND s.s_acctbal < 0)
    )
    SELECT p.p_brand AS brand, p.p_type AS part_type, p.p_size AS size,
           COUNT(DISTINCT b.l_suppkey) AS supplier_cnt
    FROM ok_bridge b
    JOIN part p ON b.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#3'
      AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
)
def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 analog — how many suppliers can supply each part shape.

    The part-supplier bridge is the distinct (partkey, suppkey)
    projection of lineitem (partsupp stand-in); suppliers with
    negative balance are the "complaints" exclusion, removed by an
    anti join against a broadcast list. The distinct + count-distinct
    both partial-aggregate map-side; the part attribute filter is a
    broadcast join after pruning the 2000-row dim.
    """
    li = load_table(spark, sf_dir, "lineitem")
    bridge = li.select("l_partkey", "l_suppkey").distinct()
    bad = (
        load_table(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    part = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#3")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29)
    )
    return (
        bridge.join(
            # no hint: supplier scales with SF
            (bad), bridge["l_suppkey"] == bad["s_suppkey"], "left_anti"
        )
        # no hint: part scales with SF
        .join((part), F.col("l_partkey") == part["p_partkey"])
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.col("p_type").alias("part_type"),
            F.col("p_size").alias("size"),
        )
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# ---------------------------------------------------------------------------
# Q20 — potential part promotion: nested aggregate threshold -> semi chain
# ---------------------------------------------------------------------------

@query(
    "tpch_q20_promotion_suppliers",
    oracle="""
    WITH red_parts AS (
      SELECT p_partkey FROM part WHERE p_name LIKE 'red%'
    ),
    supp_qty AS (
      SELECT l.l_suppkey,
             SUM(CASE WHEN l.l_shipdate >= TIMESTAMP '1997-01-01'
                       AND l.l_shipdate < TIMESTAMP '1998-01-01'
                      THEN CAST(l.l_quantity AS DECIMAL(18,4))
                      ELSE CAST(0 AS DECIMAL(18,4)) END) AS qty_1997,
             SUM(CAST(l.l_quantity AS DECIMAL(18,4))) AS qty_total
      FROM lineitem l
      JOIN red_parts p ON l.l_partkey = p.p_partkey
      GROUP BY l.l_suppkey
    ),
    hot_suppliers AS (
      SELECT l_suppkey FROM supp_qty
      WHERE qty_1997 > qty_total * CAST(0.16 AS DECIMAL(3,2))
    )
    SELECT s.s_suppkey AS suppkey, s.s_name AS supplier_name,
           n.n_name AS nation_name
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND EXISTS (SELECT 1 FROM hot_suppliers h
                  WHERE h.l_suppkey = s.s_suppkey)
    """,
)
def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 analog — regional suppliers whose 1997 shipments of
    red-named parts exceed 16% of their all-time red-part quantity
    (the uniform share over the 6.6-year order horizon is ~15%, so
    the gate selects genuinely recent-heavy suppliers — the pair-
    level formulation was degenerate on this data, every supplier
    has some all-1997 pair). One conditional aggregate produces both
    the recent and total sums in a single pass — no self-join of the
    fact against its own aggregate. The qualifying supplier set is a
    broadcastable projection driving a semi join against the dim
    chain.
    """
    li = load_table(spark, sf_dir, "lineitem")
    red = (
        load_table(spark, sf_dir, "part")
        .where(F.col("p_name").like("red%"))
        .select("p_partkey")
    )
    in_1997 = (
        F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp")
    ) & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    qty_dec = F.col("l_quantity").cast("decimal(18,4)")
    zero_dec = F.lit(0).cast("decimal(18,4)")
    supp_qty = (
        # no hint: filtered part keys scale with SF
        li.join((red), li["l_partkey"] == red["p_partkey"])
        .groupBy("l_suppkey")
        .agg(
            F.sum(F.when(in_1997, qty_dec).otherwise(zero_dec)).alias("qty_1997"),
            F.sum(qty_dec).alias("qty_total"),
        )
    )
    hot = supp_qty.where(
        F.col("qty_1997")
        > F.col("qty_total") * F.expr("CAST(0.16 AS DECIMAL(3,2))")
    ).select("l_suppkey")
    return _region_suppliers(spark, sf_dir, "ASIA").join(
        # no hint: qualifying suppliers scale with SF
        (hot), F.col("s_suppkey") == hot["l_suppkey"], "left_semi"
    ).select(
        F.col("s_suppkey").alias("suppkey"),
        F.col("s_name").alias("supplier_name"),
        "nation_name",
    )


# ---------------------------------------------------------------------------
# Q21 — suppliers who kept orders waiting: multi-EXISTS as one grouped scan
# ---------------------------------------------------------------------------

@query(
    "tpch_q21_waiting_suppliers",
    oracle="""
    WITH li AS (
      SELECT l.l_orderkey, l.l_suppkey,
             (l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY) AS is_late
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE o.o_orderstatus = 'F'
    ),
    order_stats AS (
      SELECT l_orderkey,
             COUNT(DISTINCT l_suppkey) AS n_supp,
             COUNT(DISTINCT CASE WHEN is_late THEN l_suppkey END) AS n_late_supp
      FROM li GROUP BY l_orderkey
    ),
    late_pairs AS (
      SELECT DISTINCT l_orderkey, l_suppkey FROM li WHERE is_late
    ),
    blamed AS (
      SELECT p.l_suppkey, p.l_orderkey
      FROM late_pairs p
      JOIN order_stats s ON p.l_orderkey = s.l_orderkey
      WHERE s.n_supp > 1 AND s.n_late_supp = 1
    )
    SELECT s.s_name AS supplier_name, COUNT(*) AS numwait
    FROM blamed b
    JOIN supplier s ON b.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'AMERICA'
    GROUP BY s.s_name
    ORDER BY numwait DESC, supplier_name
    LIMIT 100
    """,
)
def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 analog — suppliers solely responsible for late multi-
    supplier orders ("late" = shipped >60 days after order date;
    finalized orders only). The classic formulation is three
    correlated EXISTS over lineitem self-joins; here one grouped
    pass computes per-order supplier counts and late-supplier counts
    (count-distinct partial aggregates), and the blame condition
    (n_supp > 1 AND n_late_supp = 1) is a filter on the joined
    aggregate — the fact is shuffled once on orderkey, reused for
    both the stats and the late pairs, instead of three times.
    """
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    li = (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .select(
            "l_orderkey",
            "l_suppkey",
            (
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
            ).alias("is_late"),
        )
    )
    # collapse to (order, supplier) grain once — max(is_late) is a
    # map-side-combinable partial, so one shuffle replaces two
    # count-distinct expansions plus a distinct; the per-order
    # supplier counts then come from a window over the pair-grain
    # rows (orders have bounded line counts, so no skew), which
    # avoids both a self-join and a persist — the pair subtree
    # executes exactly once
    pair = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.max(F.col("is_late").cast("int")).alias("any_late")
    )
    w = Window.partitionBy("l_orderkey")
    blamed = (
        pair.withColumn("n_supp", F.count("*").over(w))
        .withColumn("n_late_supp", F.sum("any_late").over(w))
        .where(
            (F.col("any_late") == 1)
            & (F.col("n_supp") > 1)
            & (F.col("n_late_supp") == 1)
        )
        .select("l_orderkey", "l_suppkey")
    )
    am = _region_suppliers(spark, sf_dir, "AMERICA")
    return (
        # no hint: region suppliers scale with SF
        blamed.join((am), blamed["l_suppkey"] == am["s_suppkey"])
        .groupBy(F.col("s_name").alias("supplier_name"))
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "supplier_name")
        .limit(100)
    )
