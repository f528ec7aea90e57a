"""Named query catalog: Spark callable + DuckDB oracle SQL pairs.

Every operator from SURVEY.md §2 (plus the LLM-pipeline extensions)
registers here as ``(spark, sf_dir) -> DataFrame`` with an equivalent
ANSI-SQL oracle. Conventions that make the driver's hash comparison
deterministic:

  * every computed column is aliased identically on both sides;
  * double aggregates go through exact DECIMAL accumulation and are
    cast back to DOUBLE (`CAST(SUM(CAST(x AS DECIMAL(18,4))) AS
    DOUBLE)`) — bit-identical regardless of accumulation order, so
    Spark's partitioned sums match DuckDB's sequential ones;
  * per-row IEEE arithmetic is left unrounded (same ops => same bits);
  * cross-engine hashing uses md5 (hex string in both engines),
    never engine-native hash functions;
  * every query is order-insensitive (the driver sorts) but any
    LIMIT/top-k query carries a total tiebreak order.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from concurrent_etl_spark.engine import load_table, load_tables
from concurrent_etl_spark.functions.casts import parse_date, parse_time_of_day, staged_cast
from concurrent_etl_spark.functions.strings import (
    drop_last_chars,
    first_chars,
    last_chars,
    path_stem,
    template_token,
)
from concurrent_etl_spark.operators.dims import upsert_dimension
from concurrent_etl_spark.operators.etl import flagship_confirmation
from concurrent_etl_spark.operators.relational import (
    anti_join,
    composite_key_join,
    dedup_by_key,
    new_keys,
    semi_join,
)

from concurrent_etl_spark.catalog import QUERIES, ORACLES, query
from concurrent_etl_spark.catalog import dsum as _dsum


# ---------------------------------------------------------------------------
# Flagship (EP3 transform re-shaped; SURVEY §3, §7 step 1)
# ---------------------------------------------------------------------------

@query(
    "flagship_confirmation",
    oracle="""
    SELECT
      l.l_orderkey   AS orderkey,
      l.l_linenumber AS linenumber,
      l.l_quantity   AS quantity,
      ROUND(l.l_extendedprice * (1 - l.l_discount), 4) AS gross_revenue,
      CAST(year(l.l_shipdate) AS INTEGER) AS ship_year,
      l.l_returnflag AS returnflag,
      o.o_orderstatus AS orderstatus,
      c.c_name       AS customer_name,
      c.c_mktsegment AS mktsegment,
      n.n_name       AS nation_name,
      r.r_name       AS region_name
    FROM lineitem l
    LEFT JOIN orders   o ON l.l_orderkey  = o.o_orderkey
    LEFT JOIN customer c ON o.o_custkey   = c.c_custkey
    LEFT JOIN nation   n ON c.c_nationkey = n.n_nationkey
    LEFT JOIN region   r ON n.n_regionkey = r.r_regionkey
    """,
)
def q_flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-dim broadcast left-join chain (J1) + load projection (P3).

    Reference: case_2/Normal.py:232-236 (joins), :266-273 (projection).
    """
    return flagship_confirmation(load_tables(spark, sf_dir))


# ---------------------------------------------------------------------------
# Projection / rename / filter (P1-P4)
# ---------------------------------------------------------------------------

@query(
    "projection_rename",
    oracle="""
    SELECT o_orderkey AS order_id, o_orderstatus AS status,
           o_totalprice AS total_price
    FROM orders
    """,
)
def q_projection_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered column subset + bulk rename (P1/P2, case_2/Normal.py:173-174)."""
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .toDF("order_id", "status", "total_price")
    )


@query(
    "template_route",
    oracle="""
    WITH files AS (
      SELECT doc_id,
             '/data/sample/export_' || CAST(doc_id AS VARCHAR) || '_'
               || CASE WHEN doc_id % 2 = 0 THEN 'OPERATIONS' ELSE 'CONFIRMATION' END
               || '.xlsx' AS path
      FROM documents
    )
    SELECT doc_id, path,
           regexp_replace(list_extract(string_split_regex(path, '[/\\\\]'), -1), '\\.[^.]*$', '') AS stem,
           list_extract(string_split(regexp_replace(list_extract(string_split_regex(path, '[/\\\\]'), -1), '\\.[^.]*$', ''), '_'), -1) AS template
    FROM files
    """,
)
def q_template_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filename -> stem -> template-token routing (P4/F1/F2).

    Reference: case_1/NormalETL.py:13-24. Synthesizes paths from
    doc_id so the oracle can reproduce them.
    """
    docs = load_table(spark, sf_dir, "documents")
    files = docs.select(
        "doc_id",
        F.concat(
            F.lit("/data/sample/export_"),
            F.col("doc_id").cast("string"),
            F.lit("_"),
            F.when(F.col("doc_id") % 2 == 0, "OPERATIONS").otherwise("CONFIRMATION"),
            F.lit(".xlsx"),
        ).alias("path"),
    )
    stem = path_stem("path")
    return files.select(
        "doc_id",
        "path",
        stem.alias("stem"),
        template_token(stem).alias("template"),
    )


@query(
    "filter_predicates",
    oracle="""
    SELECT l_orderkey AS orderkey, l_linenumber AS linenumber,
           l_quantity AS quantity, l_returnflag AS returnflag
    FROM lineitem
    WHERE l_quantity > 30 AND l_returnflag = 'R' AND l_shipdate IS NOT NULL
    """,
)
def q_filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive predicates pushed to the parquet scan (P4-class)."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .where(
            (F.col("l_quantity") > 30)
            & (F.col("l_returnflag") == "R")
            & F.col("l_shipdate").isNotNull()
        )
        .select(
            F.col("l_orderkey").alias("orderkey"),
            F.col("l_linenumber").alias("linenumber"),
            F.col("l_quantity").alias("quantity"),
            F.col("l_returnflag").alias("returnflag"),
        )
    )


# ---------------------------------------------------------------------------
# Joins (J1-J4, P5, P6)
# ---------------------------------------------------------------------------

@query(
    "anti_join_new_keys",
    oracle="""
    SELECT DISTINCT c.c_custkey AS custkey
    FROM customer c
    WHERE c.c_custkey IS NOT NULL
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """New-key detection: distinct non-null keys absent from dim (P5/J3).

    Reference: ``~isin & ~isnull`` mask, case_2/Normal.py:63-67.
    left_anti matches pandas semantics (SQL NOT IN would drop all
    rows if the subquery ever contains a NULL).
    """
    customer = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey")
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey")
    )
    return new_keys(customer, orders, "custkey")


@query(
    "semi_join_inlist",
    oracle="""
    SELECT o_orderkey AS orderkey, o_custkey AS custkey,
           o_totalprice AS totalprice
    FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
    """,
)
def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Remote IN-list fetch as a broadcast semi join (P6/J4/S4).

    Reference collected keys and spliced a SQL string
    (case_2/Normal.py:244-257); the driver round-trip disappears.
    """
    orders = load_table(spark, sf_dir, "orders")
    keys = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_acctbal") > 5000)
        .select(F.col("c_custkey").alias("o_custkey"))
    )
    return semi_join(orders, keys, "o_custkey").select(
        F.col("o_orderkey").alias("orderkey"),
        F.col("o_custkey").alias("custkey"),
        F.col("o_totalprice").alias("totalprice"),
    )


@query(
    "composite_key_join",
    oracle="""
    WITH lookup AS (
      SELECT user_id, event_type, COUNT(*) AS type_events,
             CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS type_value
      FROM events GROUP BY user_id, event_type
    )
    SELECT e.event_id, e.user_id, e.event_type,
           l.type_events, l.type_value
    FROM events e
    LEFT JOIN lookup l
      ON e.user_id = l.user_id AND e.event_type = l.event_type
    """,
)
def q_composite_key_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left join on a composite key (J2, case_2/Normal.py:263)."""
    events = load_table(spark, sf_dir, "events")
    lookup = events.groupBy("user_id", "event_type").agg(
        F.count("*").alias("type_events"),
        _dsum("value", "type_value"),
    )
    return composite_key_join(
        events.select("event_id", "user_id", "event_type"),
        lookup,
        ["user_id", "event_type"],
    )


@query(
    "join_inner",
    oracle="""
    SELECT s.s_name AS supplier_name, n.n_name AS nation_name,
           s.s_acctbal AS acctbal
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    """,
)
def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join (engine surface beyond the reference, §2.3)."""
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    return s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"]).select(
        F.col("s_name").alias("supplier_name"),
        F.col("n_name").alias("nation_name"),
        F.col("s_acctbal").alias("acctbal"),
    )


@query(
    "join_full_outer",
    oracle="""
    SELECT c.c_custkey AS custkey, c.c_name AS customer_name,
           o.o_orderkey AS orderkey
    FROM customer c
    FULL OUTER JOIN orders o ON c.c_custkey = o.o_custkey
    """,
)
def q_join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join (engine surface, §2.3)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c["c_custkey"] == o["o_custkey"], "full").select(
        F.col("c_custkey").alias("custkey"),
        F.col("c_name").alias("customer_name"),
        F.col("o_orderkey").alias("orderkey"),
    )


# ---------------------------------------------------------------------------
# Aggregation / distinct / set ops (A1-A6 + engine surface)
# ---------------------------------------------------------------------------

@query(
    "dedup_by_key",
    oracle="""
    SELECT l_orderkey AS orderkey,
           MIN(l_partkey) AS partkey, MIN(l_linenumber) AS linenumber,
           MIN(l_quantity) AS quantity
    FROM lineitem GROUP BY l_orderkey
    """,
)
def q_dedup_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic drop_duplicates(subset=[key]) (A1, case_2/Normal.py:70)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("orderkey"),
        F.col("l_partkey").alias("partkey"),
        F.col("l_linenumber").alias("linenumber"),
        F.col("l_quantity").alias("quantity"),
    )
    return dedup_by_key(li, ["orderkey"])


@query(
    "distinct_rows",
    oracle="SELECT DISTINCT l_returnflag AS returnflag, l_linestatus AS linestatus FROM lineitem",
)
def q_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT DISTINCT (A2, case_2/Normal.py:253-255)."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .select(
            F.col("l_returnflag").alias("returnflag"),
            F.col("l_linestatus").alias("linestatus"),
        )
        .distinct()
    )


@query(
    "count_audit",
    oracle="""
    SELECT 'lineitem' AS table_name, COUNT(*) AS n FROM lineitem
    UNION ALL SELECT 'orders' AS table_name, COUNT(*) AS n FROM orders
    UNION ALL SELECT 'customer' AS table_name, COUNT(*) AS n FROM customer
    """,
)
def q_count_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-count audit (A3/S10, case_2/Normal.py:280-282)."""
    parts = []
    for t in ("lineitem", "orders", "customer"):
        parts.append(
            load_table(spark, sf_dir, t).agg(
                F.count("*").alias("n")
            ).select(F.lit(t).alias("table_name"), "n")
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


@query(
    "string_agg_inlist",
    oracle="""
    SELECT n_regionkey AS regionkey,
           string_agg(CAST(n_nationkey AS VARCHAR), ', ' ORDER BY n_nationkey) AS key_list
    FROM nation GROUP BY n_regionkey
    """,
)
def q_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collect + string-agg IN-list building (A5, case_2/Normal.py:245).

    Distributed: sort_array(collect_list()) per group, never a driver
    collect.
    """
    return (
        load_table(spark, sf_dir, "nation")
        .groupBy(F.col("n_regionkey").alias("regionkey"))
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list("n_nationkey")),
                    lambda x: x.cast("string"),
                ),
                ", ",
            ).alias("key_list")
        )
    )


@query(
    "except_completeness",
    oracle="""
    SELECT n_nationkey AS nationkey FROM nation
    EXCEPT
    SELECT c_nationkey AS nationkey FROM customer
    """,
)
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-difference completeness check (A6, case_2/Normal.py:314)."""
    nations = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("nationkey")
    )
    seen = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    return nations.exceptAll(seen.distinct()).distinct()


@query(
    "groupby_agg_pricing",
    oracle="""
    SELECT l_returnflag AS returnflag, l_linestatus AS linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
           CAST(MIN(l_extendedprice) AS DOUBLE) AS min_price,
           CAST(MAX(l_extendedprice) AS DOUBLE) AS max_price,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_groupby_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style groupBy aggregation (engine surface, §2.4).

    Partial (map-side) aggregation then a key shuffle — the only
    shuffle in the plan; scales linearly at 100 TB.
    """
    return (
        load_table(spark, sf_dir, "lineitem")
        .where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy(
            F.col("l_returnflag").alias("returnflag"),
            F.col("l_linestatus").alias("linestatus"),
        )
        .agg(
            _dsum("l_quantity", "sum_qty"),
            _dsum("l_extendedprice", "sum_base_price"),
            F.min("l_extendedprice").cast("double").alias("min_price"),
            F.max("l_extendedprice").cast("double").alias("max_price"),
            F.count("*").alias("count_order"),
        )
    )


@query(
    "rollup_agg",
    oracle="""
    SELECT o_orderstatus AS orderstatus, o_orderpriority AS orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    -- engine semantics: Spark's Expand+groupBy yields ZERO rows for
    -- grouping sets over an empty relation (no standard grand-total
    -- row); the HAVING mirrors that contract
    HAVING COUNT(*) > 0 OR (SELECT COUNT(*) FROM orders) > 0
    """,
)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets (engine surface, §2.4)."""
    return (
        load_table(spark, sf_dir, "orders")
        .rollup(
            F.col("o_orderstatus").alias("orderstatus"),
            F.col("o_orderpriority").alias("orderpriority"),
        )
        .agg(
            F.count("*").alias("n_orders"),
            _dsum("o_totalprice", "sum_price"),
        )
    )


@query(
    "window_topk_per_group",
    oracle="""
    SELECT custkey, orderkey, totalprice FROM (
      SELECT o_custkey AS custkey, o_orderkey AS orderkey,
             o_totalprice AS totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
)
def q_window_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group via window row_number (engine surface, §2.4).

    Total tiebreak (price desc, orderkey) keeps it deterministic.
    """
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        load_table(spark, sf_dir, "orders")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select(
            F.col("o_custkey").alias("custkey"),
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_totalprice").alias("totalprice"),
        )
    )


@query(
    "orderby_limit_topk",
    oracle="""
    SELECT o_orderkey AS orderkey, o_totalprice AS totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def q_orderby_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: TakeOrderedAndProject, no global sort (§2.4)."""
    return (
        load_table(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
        .select(
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_totalprice").alias("totalprice"),
        )
    )


@query(
    "union_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT set op (engine surface, §2.4)."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.intersect(s)


# ---------------------------------------------------------------------------
# Scalar functions over staged strings (F3-F11)
# ---------------------------------------------------------------------------

@query(
    "staged_casts",
    oracle="""
    WITH staged AS (
      SELECT
        CAST(o_orderkey AS VARCHAR)  AS orderkey_s,
        CAST(o_totalprice AS VARCHAR) AS totalprice_s,
        strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS orderdate_s
      FROM orders
    )
    SELECT
      TRY_CAST(orderkey_s AS BIGINT) AS orderkey,
      TRY_CAST(totalprice_s AS DOUBLE) AS totalprice,
      TRY_CAST(substring(orderdate_s, 1, 10) AS DATE) AS orderdate,
      substring(orderdate_s, length(orderdate_s) - 7, 8) AS ordertime,
      TRY_CAST('garbage' AS BIGINT) AS bad_int
    FROM staged
    """,
)
def q_staged_casts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-string staging -> typed casts (F3-F11, case_2/Normal.py:177-198).

    Rebuilds the reference's dtype=str staging from typed parquet,
    then applies the cast battery: int, float, date (first 10 chars),
    time-of-day (last 8 chars), garbage -> NULL coercion.
    """
    staged = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").cast("string").alias("orderkey_s"),
        F.col("o_totalprice").cast("string").alias("totalprice_s"),
        F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("orderdate_s"),
    )
    return staged.select(
        staged_cast("orderkey_s", "int").alias("orderkey"),
        staged_cast("totalprice_s", "float").alias("totalprice"),
        parse_date(first_chars("orderdate_s", 10)).alias("orderdate"),
        parse_time_of_day(last_chars("orderdate_s", 8)).alias("ordertime"),
        staged_cast(F.lit("garbage"), "int").alias("bad_int"),
    )


@query(
    "string_slicing",
    oracle="""
    SELECT p_partkey AS partkey,
           substring(p_type, 1, 10) AS type_head,
           CASE WHEN length(p_name) <= 3 THEN ''
                ELSE substring(p_name, 1, length(p_name) - 3) END AS name_trimmed,
           upper(p_brand) AS brand_upper,
           p_brand || '_' || p_type AS brand_type
    FROM part
    """,
)
def q_string_slicing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring battery (F6-F8) + concat (F13) on part attributes.

    The drop-last-3 mirrors the workCentre plant-suffix strip
    (case_2/Normal.py:201).
    """
    return load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("partkey"),
        first_chars("p_type", 10).alias("type_head"),
        drop_last_chars("p_name", 3).alias("name_trimmed"),
        F.upper("p_brand").alias("brand_upper"),
        F.concat_ws("_", "p_brand", "p_type").alias("brand_type"),
    )


# ---------------------------------------------------------------------------
# Composite: surrogate-key dimension upsert (§2.6)
# ---------------------------------------------------------------------------

@query(
    "dimension_upsert",
    oracle="""
    WITH dim AS (
      SELECT CAST(row_number() OVER (ORDER BY n_nationkey) AS BIGINT) AS id,
             n_nationkey AS key
      FROM nation WHERE n_nationkey < 15
    ),
    fresh AS (
      SELECT DISTINCT c.c_nationkey AS key
      FROM customer c
      WHERE c.c_nationkey IS NOT NULL
        AND NOT EXISTS (SELECT 1 FROM dim d WHERE d.key = c.c_nationkey)
    )
    SELECT id, key FROM dim
    UNION ALL
    SELECT CAST(row_number() OVER (ORDER BY key)
             + (SELECT COALESCE(MAX(id), 0) FROM dim) AS BIGINT) AS id,
           key
    FROM fresh
    """,
)
def q_dimension_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """update_master_table re-expressed (§2.6, case_2/Normal.py:54-80).

    Existing dim = nations < 15 with surrogate ids; batch = customer
    nation keys; new members get max(id)+row_number in key order —
    deterministic, race-free (single batch-level maintenance instead
    of the reference's per-chunk read-check-insert).
    """
    nation = load_table(spark, sf_dir, "nation")
    w = Window.orderBy("key")
    dim = (
        nation.where(F.col("n_nationkey") < 15)
        .select(F.col("n_nationkey").alias("key"))
        .select(F.row_number().over(w).cast("bigint").alias("id"), "key")
    )
    batch = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("key")
    )
    return upsert_dimension(dim, batch, "key")


# ---------------------------------------------------------------------------
# Event-time windows (§2.8 engine surface; batch semantics of the
# streaming windows implemented in streaming/windows.py)
# ---------------------------------------------------------------------------

@query(
    "tumbling_window_agg",
    oracle="""
    SELECT time_bucket(INTERVAL 1 HOUR, ts) AS window_start,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def q_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling event-time window aggregation (T1-analog, §2.8)."""
    return (
        load_table(spark, sf_dir, "events")
        .groupBy(
            F.window("ts", "1 hour").alias("w"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            _dsum("value", "sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@query(
    "json_props_extract",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS BIGINT) AS prop_k,
           event_type
    FROM events
    """,
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON property extraction (multimodal/semi-structured surface)."""
    return load_table(spark, sf_dir, "events").select(
        "event_id",
        F.get_json_object("props", "$.k").cast("bigint").alias("prop_k"),
        "event_type",
    )


@query(
    "scd2_user_state",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type, ts, event_id,
             LAG(event_type) OVER
               (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
      FROM events),
    changes AS (
      SELECT user_id, event_type, ts AS valid_from, event_id
      FROM ordered WHERE prev_type IS NULL OR event_type <> prev_type)
    SELECT user_id, event_type, valid_from,
           LEAD(valid_from) OVER
             (PARTITION BY user_id ORDER BY valid_from, event_id) AS valid_to,
           (LEAD(valid_from) OVER
             (PARTITION BY user_id ORDER BY valid_from, event_id) IS NULL)
             AS is_current
    FROM changes
    """,
)
def q_scd2_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 SCD history of each user's event_type state (§2.6
    extension): consecutive unchanged states collapse, each change
    opens a version row with half-open validity. One shuffle on
    user_id; lag + lead share a single sort."""
    from concurrent_etl_spark.operators.dims import scd2_history

    return scd2_history(
        load_table(spark, sf_dir, "events"),
        key="user_id",
        ts_col="ts",
        attr="event_type",
        tiebreak="event_id",
    )


@query(
    "cdc_latest_state",
    oracle="""
    SELECT user_id, event_type AS last_event_type, value AS last_value,
           ts AS last_ts, n_events
    FROM (
      SELECT user_id, event_type, value, ts,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn,
             COUNT(*) OVER (PARTITION BY user_id) AS n_events
      FROM events)
    WHERE rn = 1
    """,
)
def q_cdc_latest_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-feed compaction: collapse each key's event history to
    its latest state (max_by on (ts, event_id) — the deterministic
    CDC tiebreak). The compaction every snapshot-from-log rebuild
    needs; one map-side-combinable aggregation, no window sort —
    max_by partial states merge associatively, so at 100 TB this is
    a single shuffle of one row per (partition x key)."""
    ev = load_table(spark, sf_dir, "events")
    ord_key = F.struct(F.col("ts"), F.col("event_id"))
    return ev.groupBy("user_id").agg(
        F.max_by("event_type", ord_key).alias("last_event_type"),
        F.max_by("value", ord_key).alias("last_value"),
        F.max("ts").alias("last_ts"),
        F.count("*").alias("n_events"),
    )


@query(
    "xlsx_source_roundtrip",
    oracle="""
    SELECT CAST(n_nationkey AS BIGINT) AS nationkey,
           n_name AS name,
           CAST(n_regionkey AS BIGINT) AS regionkey
    FROM nation
    """,
)
def q_xlsx_source_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2 driver-visible: the nation dimension passes through GENUINE
    .xlsx files — written as real ECMA-376 packages (zip, shared
    strings, worksheet XML), split across two workbooks, then read
    back by the engine's Excel source (binaryFile + mapInPandas +
    the vendored SpreadsheetML decoder) and re-typed through the
    staged-cast path. The oracle reads the same rows straight from
    parquet, so any decode/typing defect anywhere in the xlsx path
    breaks the hash — the reference's actual input format
    (case_1/NormalETL.py:26), exercised end-to-end under the
    correctness gate, not just in unit tests.

    Synthesis is a guarded construction-time side effect (bounded:
    25 dimension rows, keyed by application id + sf so concurrent
    sessions never collide), same precedent as the bucketed-table
    build.
    """
    import hashlib as _hashlib
    import os as _os
    import tempfile as _tempfile

    from concurrent_etl_spark.sources.excel import (
        read_excel_dir,
        write_xlsx_minimal,
    )

    try:
        app = spark.sparkContext.applicationId
    except Exception:  # Spark Connect: no gateway
        app = spark.conf.get("spark.app.id", "app")
    tag = _hashlib.md5(f"{app}|{sf_dir}".encode()).hexdigest()[:12]
    d = _os.path.join(_tempfile.gettempdir(), "ces_xlsx", tag)
    if not _os.path.isdir(d) or not any(
        f.endswith(".xlsx") for f in _os.listdir(d)
    ):
        _os.makedirs(d, exist_ok=True)
        rows = [
            [int(r["n_nationkey"]), r["n_name"], int(r["n_regionkey"])]
            for r in load_table(spark, sf_dir, "nation").collect()
        ]
        header = ["nationkey", "name", "regionkey"]
        mid = len(rows) // 2
        write_xlsx_minimal(
            _os.path.join(d, "nation_a_OPERATIONS.xlsx"), header, rows[:mid]
        )
        write_xlsx_minimal(
            _os.path.join(d, "nation_b_OPERATIONS.xlsx"), header, rows[mid:]
        )
    staged = read_excel_dir(
        spark, _os.path.join(d, "*.xlsx"), ["nationkey", "name", "regionkey"]
    )
    return staged.select(
        F.col("nationkey").cast("bigint").alias("nationkey"),
        "name",
        F.col("regionkey").cast("bigint").alias("regionkey"),
    )


@query(
    "jdbc_source_roundtrip",
    oracle="""
    SELECT CAST(n_nationkey AS BIGINT) AS nationkey,
           n_name AS name,
           CAST(n_regionkey AS BIGINT) AS regionkey
    FROM nation WHERE n_regionkey < 3
    """,
)
def q_jdbc_source_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3/S4/S7 driver-visible: the nation dimension round-trips
    through a REAL JDBC database — batched append into embedded
    Derby (in Spark's own classpath), then a server-side pushdown
    read (``read_query`` with a WHERE evaluated by Derby, not by
    Spark). The oracle applies the same predicate to the parquet
    source, so the write path, the remote query execution, and the
    type mapping are all under the correctness gate — the
    warehouse half of the reference (case_2/Normal.py:58,74)
    verified end-to-end, not option-level.

    The in-memory database is keyed by application id + sf (no
    cross-session collisions); the build is a guarded
    construction-time side effect over 25 dimension rows.
    """
    import hashlib as _hashlib

    from concurrent_etl_spark.sources.jdbc import JdbcAdapter

    try:
        app = spark.sparkContext.applicationId
    except Exception:
        app = spark.conf.get("spark.app.id", "app")
    tag = _hashlib.md5(f"{app}|{sf_dir}".encode()).hexdigest()[:12]
    url = f"jdbc:derby:memory:ces{tag}"
    adapter = JdbcAdapter(url=url + ";create=true", batch_size=7)
    probe = JdbcAdapter(url=url)
    try:
        probe.read_query(spark, "SELECT COUNT(*) AS N FROM NATION").collect()
    except Exception:
        src = load_table(spark, sf_dir, "nation").select(
            F.col("n_nationkey").cast("bigint").alias("NATIONKEY"),
            F.col("n_name").alias("NAME"),
            F.col("n_regionkey").cast("bigint").alias("REGIONKEY"),
        )
        adapter.write_append(src, "NATION")
    out = probe.read_query(
        spark,
        "SELECT NATIONKEY, NAME, REGIONKEY FROM NATION WHERE REGIONKEY < 3",
    )
    return out.select(
        F.col("NATIONKEY").alias("nationkey"),
        F.col("NAME").alias("name"),
        F.col("REGIONKEY").alias("regionkey"),
    )


@query(
    "cdc_apply_changes",
    oracle="""
    WITH ops AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op
      FROM events),
    last AS (
      SELECT user_id, op, value, ts,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn,
             COUNT(*) OVER (PARTITION BY user_id) AS n_ops
      FROM ops)
    SELECT user_id, value AS last_value, ts AS last_ts,
           CAST(n_ops AS BIGINT) AS n_ops
    FROM last WHERE rn = 1 AND op = 'U'
    """,
)
def q_cdc_apply_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-feed APPLY with delete semantics — the half of CDC that
    ``cdc_latest_state`` (pure compaction) doesn't cover: each key's
    ops are ordered by (ts, event_id), the last op wins, and a key
    whose final op is a DELETE ('error' events stand in for the D
    records a real feed carries) is absent from the applied snapshot
    entirely. Same scale shape as the compaction: one map-side-
    combinable max_by aggregation per key, no window sort — the
    filter on the final op is a post-aggregation row predicate.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        "value",
        F.when(F.col("event_type") == "error", "D").otherwise("U").alias("op"),
    )
    pick = F.struct("ts", "event_id", "op", "value")
    agg = ev.groupBy("user_id").agg(
        F.max_by(pick, F.struct("ts", "event_id")).alias("last"),
        F.count("*").cast("bigint").alias("n_ops"),
    )
    return agg.where(F.col("last.op") == "U").select(
        "user_id",
        F.col("last.value").alias("last_value"),
        F.col("last.ts").alias("last_ts"),
        "n_ops",
    )


@query(
    "snapshot_diff_audit",
    oracle="""
    WITH v1 AS (SELECT n_nationkey AS k, n_name AS name FROM nation),
    v2 AS (
      SELECT n_nationkey AS k,
             CASE WHEN n_regionkey < 2 THEN lower(n_name)
                  ELSE n_name END AS name
      FROM nation WHERE n_nationkey <> 0
      UNION ALL SELECT 99 AS k, 'NEWLAND' AS name)
    SELECT 'added' AS op, k FROM v2
    WHERE k NOT IN (SELECT k FROM v1)
    UNION ALL
    SELECT 'removed' AS op, k FROM v1
    WHERE k NOT IN (SELECT k FROM v2)
    UNION ALL
    SELECT 'changed' AS op, v2.k
    FROM v2 JOIN v1 ON v1.k = v2.k WHERE v1.name <> v2.name
    """,
)
def q_snapshot_diff_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time travel under the oracle gate: two REAL snapshot versions
    of the nation dimension are written to the versioned layout
    (immutable ``v=N`` directories + atomic pointer), v2 carrying a
    deterministic edit script — one key removed, one added, the
    region-0/1 names lowercased (source names are already uppercase,
    so the edit genuinely flips bytes and the 'changed' branch of
    snapshot_diff flows through the driver gate) — and
    ``snapshot_diff`` reads BOTH
    versions back through time travel to produce the row-level
    added/removed/changed audit. The oracle recomputes the same diff
    from the parquet source, so the whole snapshot lifecycle (write,
    pointer, historical read, diff joins) sits under the correctness
    harness. Guarded construction-time build, bounded at 25 dim
    rows, keyed by application id + sf.
    """
    import hashlib as _hashlib
    import os as _os
    import tempfile as _tempfile

    from concurrent_etl_spark.sources.warehouse import (
        latest_version,
        snapshot_diff,
        versioned_write,
    )

    try:
        app = spark.sparkContext.applicationId
    except Exception:
        app = spark.conf.get("spark.app.id", "app")
    tag = _hashlib.md5(f"{app}|{sf_dir}".encode()).hexdigest()[:12]
    path = _os.path.join(_tempfile.gettempdir(), "ces_snap", tag)
    if latest_version(path) != 2:
        # crash-safe rebuild: a prior run that died between the two
        # versioned_write calls leaves v=1 behind — resuming would
        # append v1's content again as v=2 and the diff would be
        # empty forever. Any state other than the complete 2-version
        # history is torn down and rebuilt from scratch.
        import shutil as _shutil

        _shutil.rmtree(path, ignore_errors=True)
        n = load_table(spark, sf_dir, "nation")
        v1 = n.select(
            F.col("n_nationkey").alias("k"), F.col("n_name").alias("name")
        )
        v2 = (
            n.where(F.col("n_nationkey") != 0)
            .select(
                F.col("n_nationkey").alias("k"),
                F.when(
                    F.col("n_regionkey") < 2, F.lower("n_name")
                )
                .otherwise(F.col("n_name"))
                .alias("name"),
            )
            .unionByName(
                spark.createDataFrame([(99, "NEWLAND")], "k long, name string")
            )
        )
        versioned_write(v1, path)
        versioned_write(v2, path)
    return snapshot_diff(spark, path, 1, 2, ["k"]).select(
        "op", F.col("k").cast("bigint").alias("k")
    )


@query(
    "variant_semistructured_agg",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
             AS sum_k,
           CAST(MIN(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
             AS min_k,
           CAST(MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
             AS max_k,
           CAST(COUNT(json_extract(props, '$.missing')) AS BIGINT)
             AS n_missing_path
    FROM events GROUP BY event_type
    """,
)
def q_variant_semistructured_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured aggregation through Spark 4's VARIANT type:
    ``parse_json`` decodes each props payload ONCE into the binary
    variant encoding, then every downstream path extraction
    (``try_variant_get``) is a cheap binary probe — vs the
    string-JSON path (``json_props_extract``) that re-parses the
    text per extraction. Missing paths yield NULL (counted here to
    pin that semantic), absent-key behavior and integer typing both
    matched against DuckDB's json_extract in the oracle. At 100 TB
    the parse-once property is the difference between one and N
    text-JSON parses per row for an N-field extraction — and VARIANT
    columns can be written to parquet and pruned like any other.
    """
    ev = load_table(spark, sf_dir, "events")
    v = ev.select(
        "event_type", F.parse_json("props").alias("v")
    ).select(
        "event_type",
        F.try_variant_get("v", "$.k", "bigint").alias("k"),
        F.try_variant_get("v", "$.missing", "bigint").alias("miss"),
    )
    return v.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("k").cast("bigint").alias("sum_k"),
        F.min("k").cast("bigint").alias("min_k"),
        F.max("k").cast("bigint").alias("max_k"),
        F.count("miss").cast("bigint").alias("n_missing_path"),
    )


@query(
    "json_corrupt_record_capture",
    oracle="""
    WITH src AS (
      SELECT event_id,
             CASE WHEN event_id % 7 = 3 THEN substr(props, 1, 3)
                  ELSE props END AS payload
      FROM events),
    parsed AS (
      SELECT event_id, payload,
             CASE WHEN json_valid(payload)
                  THEN CAST(json_extract(payload, '$.k') AS BIGINT)
             END AS k,
             NOT json_valid(payload) AS is_corrupt
      FROM src)
    SELECT is_corrupt,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(COALESCE(k, 0)) AS BIGINT) AS sum_k
    FROM parsed GROUP BY 1
    """,
)
def q_json_corrupt_record_capture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dead-letter capture at the parse boundary: a deterministic
    slice of the JSON payloads is corrupted (truncated — standing in
    for the malformed rows every real feed carries), then parsed
    with ``from_json`` in PERMISSIVE mode so bad rows surface as a
    corrupt-record column instead of failing the job — the
    row-level quarantine the reference's abort-on-error loop
    (case_1/NormalETL.py:22-24) cannot express. Good rows aggregate
    normally; corrupt rows are counted into their own bucket. The
    oracle reproduces the corruption and the valid/invalid split
    with json_valid.
    """
    from pyspark.sql.types import LongType as _L
    from pyspark.sql.types import StringType as _S
    from pyspark.sql.types import StructField as _SF
    from pyspark.sql.types import StructType as _ST

    ev = load_table(spark, sf_dir, "events")
    src = ev.select(
        "event_id",
        F.when(
            F.col("event_id") % 7 == 3, F.substring("props", 1, 3)
        )
        .otherwise(F.col("props"))
        .alias("payload"),
    )
    schema = _ST([_SF("k", _L()), _SF("_corrupt", _S())])
    parsed = src.select(
        F.from_json(
            "payload",
            schema,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt"},
        ).alias("p")
    ).select(
        F.col("p.k").alias("k"),
        F.col("p._corrupt").isNotNull().alias("is_corrupt"),
    )
    return parsed.groupBy("is_corrupt").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.coalesce(F.col("k"), F.lit(0))).cast("bigint").alias("sum_k"),
    )


@query(
    "txn_merge_audit",
    oracle="""
    WITH batch AS (
      SELECT n_nationkey AS k, lower(n_name) AS name
      FROM nation WHERE n_regionkey < 2
      UNION ALL SELECT 99 AS k, 'newland' AS name),
    base AS (SELECT n_nationkey AS k, n_name AS name FROM nation)
    SELECT k, name, CAST(2 AS BIGINT) AS latest_version
    FROM (SELECT k, name FROM batch
          UNION ALL
          SELECT k, name FROM base
          WHERE k NOT IN (SELECT k FROM batch))
    """,
)
def q_txn_merge_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The multi-writer commit protocol under the correctness gate:
    the nation dimension is committed through the TRANSACTION LOG
    (``sources/txn.py`` — data dirs published by O_EXCL commit
    records, the CAS a Delta/Iceberg log makes against an object
    store), then a second ``txn_merge`` upserts an edit batch
    (region-0/1 names lowercased, key 99 inserted). The query reads
    the latest committed snapshot back THROUGH the log and carries
    the version counter; the oracle recomputes the upsert from the
    parquet source. Any defect in the claim/publish/read path — a
    lost update, a phantom version, an orphan read — changes the
    rows or the version column and fails the hash. The concurrent
    path (racing writers, CAS retry, recompute-on-conflict) is
    pinned by tests/test_txn.py; this query pins the protocol's
    single-history correctness at driver scale.

    Guarded construction-time build keyed by application id + sf;
    any partial state (crash between commits) tears down and
    rebuilds — the log makes partial state detectable by version
    count alone.
    """
    import hashlib as _hashlib
    import os as _os
    import shutil as _shutil
    import tempfile as _tempfile

    from concurrent_etl_spark.sources.txn import (
        txn_latest,
        txn_merge,
        txn_read,
    )

    try:
        app = spark.sparkContext.applicationId
    except Exception:
        app = spark.conf.get("spark.app.id", "app")
    tag = _hashlib.md5(f"{app}|{sf_dir}".encode()).hexdigest()[:12]
    path = _os.path.join(_tempfile.gettempdir(), "ces_txn", tag)
    if txn_latest(path) != 2:
        _shutil.rmtree(path, ignore_errors=True)
        n = load_table(spark, sf_dir, "nation")
        v1 = n.select(
            F.col("n_nationkey").alias("k"), F.col("n_name").alias("name")
        )
        batch = (
            n.where(F.col("n_regionkey") < 2)
            .select(
                F.col("n_nationkey").alias("k"),
                F.lower("n_name").alias("name"),
            )
            .unionByName(
                spark.createDataFrame([(99, "newland")], "k long, name string")
            )
        )
        txn_merge(spark, path, v1, ["k"])
        txn_merge(spark, path, batch, ["k"])
    return txn_read(spark, path).select(
        F.col("k").cast("bigint").alias("k"),
        "name",
        F.lit(txn_latest(path)).cast("bigint").alias("latest_version"),
    )


@query(
    "weblog_text_parse",
    oracle="""
    SELECT '/' || event_type AS path,
           CAST(CASE WHEN event_type = 'error' THEN 500 ELSE 200 END
                AS INTEGER) AS status,
           CAST(COUNT(*) AS BIGINT) AS n_req,
           CAST(SUM(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
             AS total_bytes
    FROM events
    GROUP BY event_type
    UNION ALL
    SELECT '_malformed' AS path, CAST(-1 AS INTEGER) AS status,
           CAST(3 AS BIGINT) AS n_req, CAST(0 AS BIGINT) AS total_bytes
    """,
)
def q_weblog_text_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unstructured-text source under the gate: the events table is
    rendered as GENUINE Apache-combined-log lines (plus three
    injected malformed lines), written as multi-file raw text, read
    back through ``spark.read.text`` — the schema-less source every
    log pipeline starts from — and parsed with one anchored
    ``regexp_extract_all`` pass into typed columns. Lines the
    pattern rejects are counted into a dead-letter row instead of
    being silently dropped (the same capture discipline as
    json_corrupt_record_capture). The oracle recomputes the rollup
    from the structured source, so the render -> text -> regex ->
    cast -> aggregate loop must be lossless to hash-match.

    At 100 TB: text scan is splittable by line, the regex runs
    row-local inside codegen (no Python), and only the per-(path,
    status) partials shuffle. Guarded construction-time build keyed
    by application id + sf.

    Reference parity: the reference's file watcher globs and
    filename-parses its drop directory (case_2/Normal.py:304-323);
    this is the body-parsing half a log-structured source needs.
    """
    import hashlib as _hashlib
    import os as _os
    import tempfile as _tempfile

    try:
        app = spark.sparkContext.applicationId
    except Exception:
        app = spark.conf.get("spark.app.id", "app")
    tag = _hashlib.md5(f"{app}|{sf_dir}".encode()).hexdigest()[:12]
    d = _os.path.join(_tempfile.gettempdir(), "ces_weblog", tag)
    marker = _os.path.join(d, "_SUCCESS")
    if not _os.path.exists(marker):
        ev = load_table(spark, sf_dir, "events")
        lines = ev.select(
            F.format_string(
                '10.0.%d.%d - - [01/Jul/1997:00:00:00 +0000] '
                '"GET /%s HTTP/1.1" %d %d',
                (F.col("user_id") % 256).cast("int"),
                ((F.col("user_id") / 256) % 256).cast("int"),
                F.col("event_type"),
                F.when(F.col("event_type") == "error", 500)
                .otherwise(200)
                .cast("int"),
                F.floor(F.col("value") * 100).cast("bigint"),
            ).alias("value")
        )
        bad = spark.createDataFrame(
            [("totally not a log line",), ("GET /x",), ("- - -",)],
            "value string",
        )
        lines.unionByName(bad).coalesce(4).write.mode("overwrite").text(d)
    raw = spark.read.text(d)
    pat = (
        r'^(\d+\.\d+\.\d+\.\d+) - - \[([^\]]+)\] '
        r'"([A-Z]+) (\S+) HTTP/[\d.]+" (\d+) (\d+)$'
    )
    parsed = raw.select(
        F.regexp_extract("value", pat, 4).alias("path"),
        F.nullif(F.regexp_extract("value", pat, 5), F.lit(""))
        .try_cast("int")
        .alias("status"),
        F.nullif(F.regexp_extract("value", pat, 6), F.lit(""))
        .try_cast("bigint")
        .alias("bytes"),
    )
    ok = parsed.where(F.col("status").isNotNull())
    dead = parsed.where(F.col("status").isNull())
    agg = ok.groupBy("path", "status").agg(
        F.count("*").cast("bigint").alias("n_req"),
        F.sum("bytes").cast("bigint").alias("total_bytes"),
    )
    dead_row = dead.agg(
        F.count("*").cast("bigint").alias("n_req")
    ).select(
        F.lit("_malformed").alias("path"),
        F.lit(-1).cast("int").alias("status"),
        "n_req",
        F.lit(0).cast("bigint").alias("total_bytes"),
    )
    return agg.unionByName(dead_row)


@query(
    "orc_source_roundtrip",
    oracle="""
    SELECT CAST(n_nationkey AS BIGINT) AS nationkey,
           n_name AS name,
           CAST(n_regionkey AS BIGINT) AS regionkey
    FROM nation
    """,
)
def q_orc_source_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC as a first-class source/sink under the driver gate: the
    nation dimension is written as real ORC files and read back
    through the ORC reader — proving the engine's scan boundary is
    storage-format-agnostic (same pushdown/pruning surface as
    parquet, asserted in tests/test_scale_behaviors.py; this query
    puts the byte-level round trip itself under the hash check).
    Guarded construction-time build keyed by application id + sf.
    """
    import hashlib as _hashlib
    import os as _os
    import tempfile as _tempfile

    try:
        app = spark.sparkContext.applicationId
    except Exception:
        app = spark.conf.get("spark.app.id", "app")
    tag = _hashlib.md5(f"{app}|{sf_dir}".encode()).hexdigest()[:12]
    d = _os.path.join(_tempfile.gettempdir(), "ces_orc", tag)
    if not _os.path.exists(_os.path.join(d, "_SUCCESS")):
        (
            load_table(spark, sf_dir, "nation")
            .select(
                F.col("n_nationkey").cast("bigint").alias("nationkey"),
                F.col("n_name").alias("name"),
                F.col("n_regionkey").cast("bigint").alias("regionkey"),
            )
            .write.mode("overwrite")
            .orc(d)
        )
    return spark.read.orc(d)


@query(
    "csv_quirks_roundtrip",
    oracle="""
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           'line1' || chr(10) || 'line2;' || CAST(doc_id AS VARCHAR)
             AS tricky,
           'he said ' || chr(34) || 'hi' || chr(34) AS quoted,
           CAST(NULL AS VARCHAR) AS missing
    FROM documents WHERE doc_id < 50
    """,
)
def q_csv_quirks_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV edge-case battery under the gate: values carrying the
    DELIMITER, embedded NEWLINES, and embedded DOUBLE QUOTES are
    written with a semicolon separator + RFC-4180 quote doubling,
    then read back with ``multiLine`` parsing and an explicit
    nullValue so empty-vs-null survives the trip. These are exactly
    the cases a naive line-splitting reader (the reference's
    pandas.read_csv delegation, case_1/NormalETL.py:26) corrupts
    silently; the oracle reconstructs every value from the source
    table, so one mis-parsed row fails the hash. multiLine forfeits
    line-level splitting (a quoted newline makes byte offsets
    ambiguous) — the documented trade: quirky CSVs parse per-FILE,
    so at 100 TB the parallel unit is many files, not splits of one.
    Guarded build keyed by application id + sf.
    """
    import hashlib as _hashlib
    import os as _os
    import tempfile as _tempfile

    try:
        app = spark.sparkContext.applicationId
    except Exception:
        app = spark.conf.get("spark.app.id", "app")
    tag = _hashlib.md5(f"{app}|{sf_dir}".encode()).hexdigest()[:12]
    d = _os.path.join(_tempfile.gettempdir(), "ces_csvq", tag)
    if not _os.path.exists(_os.path.join(d, "_SUCCESS")):
        src = (
            load_table(spark, sf_dir, "documents")
            .where(F.col("doc_id") < 50)
            .select(
                F.col("doc_id").cast("bigint"),
                F.concat(
                    F.lit("line1\nline2;"), F.col("doc_id").cast("string")
                ).alias("tricky"),
                F.lit('he said "hi"').alias("quoted"),
                F.lit(None).cast("string").alias("missing"),
            )
        )
        (
            src.coalesce(2)
            .write.mode("overwrite")
            .options(header=True, sep=";", quoteAll=True, nullValue="\\N")
            .csv(d)
        )
    return spark.read.options(
        header=True,
        sep=";",
        multiLine=True,
        nullValue="\\N",
        inferSchema=False,
    ).schema("doc_id bigint, tricky string, quoted string, missing string").csv(d)


@query(
    "pyds_txn_source_roundtrip",
    oracle="""
    SELECT CAST(n_nationkey AS BIGINT) AS k,
           n_name AS name,
           CAST(n_regionkey AS BIGINT) AS region
    FROM nation WHERE n_regionkey >= 2
    """,
)
def q_pyds_txn_source_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine's EXTENSION surface under the gate: the nation
    dimension is committed to a transaction-log table and read back
    through the registered custom Python DataSource
    (``format("ces_txn")``, sources/pyds.py) with a predicate the
    source accepts via ``pushFilters`` and evaluates inside its
    pyarrow scan. The oracle applies the same predicate to the
    parquet source — so the commit-log resolution, file-partitioned
    Arrow scan, filter pushdown, AND Spark's residual re-application
    are all inside the hash comparison. Guarded construction-time
    build keyed by application id + sf.
    """
    import hashlib as _hashlib
    import os as _os
    import tempfile as _tempfile

    from concurrent_etl_spark.sources import pyds
    from concurrent_etl_spark.sources.txn import txn_commit, txn_latest

    try:
        app = spark.sparkContext.applicationId
    except Exception:
        app = spark.conf.get("spark.app.id", "app")
    tag = _hashlib.md5(f"{app}|{sf_dir}".encode()).hexdigest()[:12]
    path = _os.path.join(_tempfile.gettempdir(), "ces_pyds", tag)
    if txn_latest(path) < 1:
        txn_commit(
            load_table(spark, sf_dir, "nation").select(
                F.col("n_nationkey").cast("bigint").alias("k"),
                F.col("n_name").alias("name"),
                F.col("n_regionkey").cast("bigint").alias("region"),
            ),
            path,
        )
    pyds.register(spark)
    return (
        spark.read.format("ces_txn")
        .option("path", path)
        .load()
        .where(F.col("region") >= 2)
    )


@query(
    "txn_time_travel_diff",
    oracle="""
    SELECT CAST(n_nationkey AS BIGINT) AS k,
           n_name AS name_v1,
           CASE WHEN n_nationkey % 2 = 0 THEN upper(n_name)
                ELSE n_name END AS name_v2,
           CAST(CASE WHEN n_nationkey % 2 = 0
                      AND upper(n_name) <> n_name
                THEN 1 ELSE 0 END AS INTEGER) AS changed
    FROM nation
    """,
)
def q_txn_time_travel_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME TRAVEL through the custom Python DataSource: the nation
    dimension is committed twice to a transaction-log table (v2
    uppercases even-keyed names), then BOTH versions are read back
    through ``format("ces_txn")`` — v1 pinned with
    ``option("version", 1)``, v2 as the latest — and joined into a
    row-level diff. The oracle recomputes both versions from the
    parquet source, so version resolution, snapshot isolation of the
    immutable v1 data dir, and the diff itself are all inside the
    hash. This is the audit-query shape a warehouse runs against any
    log-structured table format (Delta/Iceberg ``VERSION AS OF``).

    Scale: each version is an independent file-partitioned Arrow
    scan; the join keys on the table's primary key. Guarded
    construction-time build keyed by application id + sf; a partial
    build (v1 only) completes rather than re-commits.
    """
    import hashlib as _hashlib
    import os as _os
    import tempfile as _tempfile

    from concurrent_etl_spark.sources import pyds
    from concurrent_etl_spark.sources.txn import txn_commit, txn_latest

    try:
        app = spark.sparkContext.applicationId
    except Exception:
        app = spark.conf.get("spark.app.id", "app")
    tag = _hashlib.md5(f"{app}|{sf_dir}|tt".encode()).hexdigest()[:12]
    path = _os.path.join(_tempfile.gettempdir(), "ces_pyds_tt", tag)
    base = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("bigint").alias("k"),
        F.col("n_name").alias("name"),
    )
    if txn_latest(path) < 1:
        txn_commit(base, path)
    if txn_latest(path) < 2:
        txn_commit(
            base.withColumn(
                "name",
                F.when(F.col("k") % 2 == 0, F.upper("name")).otherwise(
                    F.col("name")
                ),
            ),
            path,
        )
    pyds.register(spark)
    v1 = (
        spark.read.format("ces_txn")
        .option("path", path)
        .option("version", "1")
        .load()
        .select("k", F.col("name").alias("name_v1"))
    )
    v2 = (
        spark.read.format("ces_txn")
        .option("path", path)
        .load()
        .select("k", F.col("name").alias("name_v2"))
    )
    return v1.join(v2, "k").select(
        "k",
        "name_v1",
        "name_v2",
        F.when(F.col("name_v1") != F.col("name_v2"), 1)
        .otherwise(0)
        .cast("int")
        .alias("changed"),
    )


@query(
    "partitioned_merge_audit",
    oracle="""
    SELECT o_orderstatus AS status,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(round(
                 CASE WHEN o_orderstatus = 'P' AND o_orderkey % 10 = 0
                      THEN o_totalprice + 1000.0 ELSE o_totalprice END,
                 2) AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def q_partitioned_merge_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-scoped MERGE under the gate: orders land as a
    hive-partitioned table (one directory per order status), then a
    delta batch repricing every 10th 'P'-status order merges through
    ``merge_into_partitioned_parquet`` — which rewrites ONLY the 'P'
    partition (dynamic partition overwrite after an anti-join
    against the delta's keys, staged before the swap). The query
    aggregates the merged table per partition; the oracle recomputes
    the expected post-merge state from the source — so key matching,
    the partition-pruned rewrite, and the untouched partitions'
    integrity are all inside the hash. The scale contract this pins:
    a delta that touches one partition costs one partition's
    rewrite, never the table's.

    Guarded construction-time build keyed by application id + sf;
    any partial state rebuilds from scratch.
    """
    import hashlib as _hashlib
    import os as _os
    import shutil as _shutil
    import tempfile as _tempfile

    from concurrent_etl_spark.streaming.file_stream import (
        merge_into_partitioned_parquet,
    )

    try:
        app = spark.sparkContext.applicationId
    except Exception:
        app = spark.conf.get("spark.app.id", "app")
    tag = _hashlib.md5(f"{app}|{sf_dir}".encode()).hexdigest()[:12]
    d = _os.path.join(_tempfile.gettempdir(), "ces_pmerge", tag)
    marker = _os.path.join(d, "_MERGED")
    if not _os.path.exists(marker):
        _shutil.rmtree(d, ignore_errors=True)
        base = load_table(spark, sf_dir, "orders").select(
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_totalprice").alias("totalprice"),
            F.col("o_orderstatus").alias("status"),
        )
        (
            base.write.mode("overwrite")
            .partitionBy("status")
            .parquet(d)
        )
        delta = base.where(
            (F.col("status") == "P") & (F.col("orderkey") % 10 == 0)
        ).withColumn("totalprice", F.col("totalprice") + 1000.0)
        touched = merge_into_partitioned_parquet(
            spark, d, delta, keys=["orderkey"], partition_col="status"
        )
        # an empty source yields an empty delta: zero partitions
        # touched is the correct (and cheapest) merge
        assert touched in (["P"], []), touched
        with open(marker, "w") as fh:
            fh.write(",".join(touched))
    # explicit schema: a zero-row source writes no part files and
    # schema inference would fail — an empty feed must read back as
    # an empty table, not a job kill
    merged = spark.read.schema(
        "orderkey bigint, totalprice double, status string"
    ).parquet(d)
    return merged.groupBy("status").agg(
        F.count("*").cast("bigint").alias("n_orders"),
        F.sum(F.round("totalprice", 2).cast("decimal(18,2)"))
        .cast("double")
        .alias("total"),
    )


@query(
    "compaction_audit",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(round(o_totalprice, 2) AS DECIMAL(18,2)))
                AS DOUBLE) AS total,
           TRUE AS compacted_to_few_files
    FROM orders WHERE o_orderkey % 7 = 0
    """,
)
def q_compaction_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction under the gate: a deliberately
    over-fragmented table (40 tiny files — the residue streaming
    micro-batches leave) is rewritten by ``compact_small_files``
    into byte-budgeted files via an atomic staging swap, and the
    query asserts IN the result that (a) every row and the
    decimal-exact total survived and (b) the file count actually
    collapsed. At 100 TB compaction is the difference between scans
    dominated by per-file open/footer overhead and scans dominated
    by bytes — and it must be a lossless, reader-safe background
    op, which is exactly what the hash pins. Guarded build keyed by
    application id + sf.
    """
    import glob as _glob
    import hashlib as _hashlib
    import os as _os
    import shutil as _shutil
    import tempfile as _tempfile

    from concurrent_etl_spark.sources.warehouse import compact_small_files

    try:
        app = spark.sparkContext.applicationId
    except Exception:
        app = spark.conf.get("spark.app.id", "app")
    tag = _hashlib.md5(f"{app}|{sf_dir}".encode()).hexdigest()[:12]
    d = _os.path.join(_tempfile.gettempdir(), "ces_compact", tag)
    marker = _os.path.join(d, "_COMPACTED")
    if not _os.path.exists(marker):
        _shutil.rmtree(d, ignore_errors=True)
        (
            load_table(spark, sf_dir, "orders")
            .where(F.col("o_orderkey") % 7 == 0)
            .select("o_orderkey", "o_totalprice", "o_orderstatus")
            .repartition(40)
            .write.mode("overwrite")
            .parquet(d)
        )
        n_after = compact_small_files(spark, d)
        with open(marker, "w") as fh:
            fh.write(str(n_after))
    n_files = len(_glob.glob(_os.path.join(d, "*.parquet")))
    out = spark.read.parquet(d)
    return out.agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.sum(F.round("o_totalprice", 2).cast("decimal(18,2)"))
        .cast("double")
        .alias("total"),
        F.lit(n_files <= 4).alias("compacted_to_few_files"),
    )


@query(
    "xml_source_roundtrip",
    oracle="""
    SELECT CAST(s_suppkey AS BIGINT) AS suppkey,
           s_name || ' <tag> & "q"' AS tricky,
           'city_' || CAST(s_nationkey AS VARCHAR) AS city,
           CAST(s_suppkey % 100 AS BIGINT) AS zip
    FROM supplier
    """,
)
def q_xml_source_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML as a first-class source/sink under the gate (Spark 4's
    built-in XML data source): the supplier dimension is written as
    real XML documents — values carrying markup metacharacters
    (``<tag>``, ``&``, quotes) that MUST entity-escape to survive,
    plus a NESTED address element — then read back with an explicit
    schema through the XML reader and flattened. The oracle
    reconstructs every value from the parquet source, so one
    mis-escaped or mis-nested value fails the hash. Completes the
    format surface next to parquet/ORC/CSV-quirks/JSON/xlsx/text/
    JDBC/binary: schema-on-read over tree-shaped documents.

    Scale shape: XML is the one format here that (like quirky CSV)
    cannot split inside a file — rowTag framing needs the document
    tree — so parallelism is the FILE count (this build writes
    multiple parts; a 100 TB feed arrives as many documents). One
    linear parse pass, no shuffle.

    Guarded construction-time build keyed by application id + sf.
    """
    import hashlib as _hashlib
    import os as _os
    import tempfile as _tempfile

    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    try:
        app = spark.sparkContext.applicationId
    except Exception:
        app = spark.conf.get("spark.app.id", "app")
    tag = _hashlib.md5(f"{app}|{sf_dir}".encode()).hexdigest()[:12]
    d = _os.path.join(_tempfile.gettempdir(), "ces_xml", tag)
    if not _os.path.exists(_os.path.join(d, "_SUCCESS")):
        (
            load_table(spark, sf_dir, "supplier")
            .select(
                F.col("s_suppkey").cast("bigint").alias("suppkey"),
                F.concat(F.col("s_name"), F.lit(' <tag> & "q"')).alias(
                    "tricky"
                ),
                F.struct(
                    F.concat(F.lit("city_"), F.col("s_nationkey").cast("string"))
                    .alias("city"),
                    (F.col("s_suppkey") % 100).cast("bigint").alias("zip"),
                ).alias("addr"),
            )
            .repartition(3)
            .write.mode("overwrite")
            .format("xml")
            .option("rootTag", "suppliers")
            .option("rowTag", "supplier")
            .save(d)
        )
    schema = StructType(
        [
            StructField("suppkey", LongType()),
            StructField("tricky", StringType()),
            StructField(
                "addr",
                StructType(
                    [
                        StructField("city", StringType()),
                        StructField("zip", LongType()),
                    ]
                ),
            ),
        ]
    )
    return (
        spark.read.format("xml")
        .option("rowTag", "supplier")
        # true roundtrip fidelity: the default trims surrounding
        # whitespace inside elements, silently corrupting values
        # that START with a space (an empty dim name concatenated
        # with the escape probe produces exactly that)
        .option("ignoreSurroundingSpaces", "false")
        .schema(schema)
        .load(d)
        .select(
            "suppkey",
            "tricky",
            F.col("addr.city").alias("city"),
            F.col("addr.zip").alias("zip"),
        )
    )


@query(
    "warc_source_roundtrip",
    oracle="""
    SELECT doc_id,
           'http://corpus.example/doc/' || CAST(doc_id AS VARCHAR) AS uri,
           '2024-01-' || lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0')
             || 'T00:00:00Z' AS warc_date,
           CAST(octet_length(encode(text)) AS BIGINT) AS content_length,
           md5(text) AS payload_md5
    FROM documents WHERE doc_id < 200 AND text IS NOT NULL
    """,
)
def q_warc_source_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC (ISO 28500, Common Crawl's container) as a first-class
    source under the gate, through the VENDORED zero-dependency codec
    (``sources/warc.py`` — the format is a public spec): a document
    slice is written as genuine WARC/1.0 response records (CRLF
    header blocks, exact Content-Length octet counts, UTF-8 payloads)
    split across four archive files, then read back DISTRIBUTED
    (binaryFile -> one parse task per archive -> Arrow batches). The
    query extracts doc ids from the target URIs and fingerprints
    every payload; the oracle reconstructs uri/date/octet-length/md5
    from the parquet source — one wrong Content-Length, mis-split
    record boundary, or corrupted payload byte fails the hash.

    This is the raw-ingest mouth of a web-scale LLM pipeline: at
    100 TB the parallel unit is the archive file (how Common Crawl
    ships), Spark owns listing/scheduling/retries, Python owns only
    the byte parse. Guarded construction-time build keyed by
    application id + sf (bounded: 200 docs).
    """
    import hashlib as _hashlib
    import os as _os
    import tempfile as _tempfile

    from pyspark.sql.types import (
        BinaryType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from concurrent_etl_spark.sources.warc import read_warc_dir, write_warc

    try:
        app = spark.sparkContext.applicationId
    except Exception:
        app = spark.conf.get("spark.app.id", "app")
    tag = _hashlib.md5(f"{app}|{sf_dir}".encode()).hexdigest()[:12]
    d = _os.path.join(_tempfile.gettempdir(), "ces_warc", tag)
    done = _os.path.join(d, "_DONE")
    if not _os.path.exists(done):
        _os.makedirs(d, exist_ok=True)
        rows = (
            load_table(spark, sf_dir, "documents")
            # a NULL document never became a crawl record — same
            # predicate in the oracle (no-op on non-NULL corpora)
            .where((F.col("doc_id") < 200) & F.col("text").isNotNull())
            .select("doc_id", "text")
            .collect()
        )
        for part in range(4):
            recs = [
                (
                    f"http://corpus.example/doc/{r['doc_id']}",
                    f"2024-01-{r['doc_id'] % 28 + 1:02d}T00:00:00Z",
                    r["text"].encode("utf-8"),
                )
                for r in rows
                if r["doc_id"] % 4 == part
            ]
            write_warc(recs, _os.path.join(d, f"part-{part}.warc"))
        with open(done, "w") as f:
            f.write("ok")
    out_schema = StructType(
        [
            StructField("target_uri", StringType()),
            StructField("warc_date", StringType()),
            StructField("content_length", LongType()),
            StructField("payload", BinaryType()),
        ]
    )
    recs = read_warc_dir(spark, _os.path.join(d, "*.warc"), out_schema)
    return recs.select(
        F.regexp_extract("target_uri", r"/doc/(\d+)$", 1)
        .cast("bigint")
        .alias("doc_id"),
        F.col("target_uri").alias("uri"),
        "warc_date",
        "content_length",
        F.md5("payload").alias("payload_md5"),
    )


@query(
    "avro_source_roundtrip",
    oracle="""
    SELECT CAST(s_suppkey AS BIGINT) AS suppkey,
           s_name AS name,
           s_acctbal AS acctbal,
           s_suppkey % 2 = 0 AS even_flag,
           CASE WHEN s_suppkey % 7 = 0 THEN NULL
                ELSE 'ph_' || CAST(s_suppkey AS VARCHAR) END AS phone
    FROM supplier WHERE s_suppkey <= 100000
    """,
)
def q_avro_source_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Avro as a first-class source under the gate, through the
    VENDORED zero-dependency container codec (``sources/avro.py`` —
    the external spark-avro module is not deployed here, and the
    format is a public spec): the supplier dimension is written as
    genuine deflate-compressed Avro object-container files — zigzag
    varints (negative-capable longs), length-prefixed UTF-8, IEEE
    doubles byte-exact, booleans, and a nullable ``["null","string"]``
    union column — split across three files and multiple blocks, then
    read back DISTRIBUTED (binaryFile -> one decode task per file ->
    Arrow batches). The oracle reconstructs every value from the
    parquet source, so one mis-decoded varint, union branch, or
    dropped block fails the hash. Same adapter architecture the xlsx
    source proves (sources/excel.py): Spark owns listing/scheduling/
    retries, Python owns only the byte decode.

    Guarded construction-time build keyed by application id + sf
    (bounded: dimension-sized).
    """
    import hashlib as _hashlib
    import os as _os
    import tempfile as _tempfile

    from pyspark.sql.types import (
        BooleanType,
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from concurrent_etl_spark.sources.avro import read_avro_dir, write_avro

    try:
        app = spark.sparkContext.applicationId
    except Exception:
        app = spark.conf.get("spark.app.id", "app")
    tag = _hashlib.md5(f"{app}|{sf_dir}".encode()).hexdigest()[:12]
    d = _os.path.join(_tempfile.gettempdir(), "ces_avro", tag)
    done = _os.path.join(d, "_DONE")
    if not _os.path.exists(done):
        _os.makedirs(d, exist_ok=True)
        rows = (
            load_table(spark, sf_dir, "supplier")
            # driver-safety cap (VERDICT r5 item 4): suppkey is dense
            # 1..SF*10k, so the fixture collect is bounded at 100k
            # rows at any scale factor; identical predicate in the
            # oracle. No-op at the tested SFs (sf0.1 = 1k suppliers).
            .where(F.col("s_suppkey") <= 100_000)
            .select("s_suppkey", "s_name", "s_acctbal")
            .collect()
        )
        schema = {
            "type": "record",
            "name": "supplier",
            "fields": [
                {"name": "suppkey", "type": "long"},
                {"name": "name", "type": "string"},
                {"name": "acctbal", "type": "double"},
                {"name": "even_flag", "type": "boolean"},
                {"name": "phone", "type": ["null", "string"]},
            ],
        }
        for part in range(3):
            recs = [
                {
                    "suppkey": r["s_suppkey"],
                    "name": r["s_name"],
                    "acctbal": r["s_acctbal"],
                    "even_flag": r["s_suppkey"] % 2 == 0,
                    "phone": (
                        None
                        if r["s_suppkey"] % 7 == 0
                        else f"ph_{r['s_suppkey']}"
                    ),
                }
                for r in rows
                if r["s_suppkey"] % 3 == part
            ]
            write_avro(
                _os.path.join(d, f"part-{part}.avro"),
                schema,
                recs,
                codec="deflate",
                block_records=16,
            )
        with open(done, "w") as f:
            f.write("ok")
    out_schema = StructType(
        [
            StructField("suppkey", LongType()),
            StructField("name", StringType()),
            StructField("acctbal", DoubleType()),
            StructField("even_flag", BooleanType()),
            StructField("phone", StringType()),
        ]
    )
    return read_avro_dir(spark, _os.path.join(d, "*.avro"), out_schema)


@query(
    "parquet_zonemap_audit",
    oracle="""
    WITH s0 AS (
      SELECT o_orderkey FROM orders WHERE o_orderkey % 5 = 0
      ORDER BY o_orderkey LIMIT 100000),
    s AS (
      SELECT o_orderkey,
             row_number() OVER (ORDER BY o_orderkey) AS rn
      FROM s0)
    SELECT CAST((rn - 1) // 4096 AS INTEGER) AS rg_id,
           COUNT(*) AS n_rows,
           CAST(MIN(o_orderkey) AS BIGINT) AS min_key,
           CAST(MAX(o_orderkey) AS BIGINT) AS max_key,
           CASE WHEN MAX(o_orderkey) < 20000 OR MIN(o_orderkey) >= 40000
                THEN 1 ELSE 0 END AS skippable_for_probe
    FROM s GROUP BY 1
    """,
)
def q_parquet_zonemap_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zonemap (row-group statistics) audit — the observability half
    of data skipping: a fixture parquet is written key-SORTED with a
    fixed 4096-row row-group size, and the query reads the ACTUAL
    footer metadata back (binaryFile -> pyarrow footer parse per
    file, distributed — the bytes scanned are the footer, not the
    data pages) to report each row group's min/max zonemap and
    whether a probe predicate (``key in [20000, 40000)``) could skip
    it. The oracle recomputes the zonemaps the layout PROMISES
    (row_number over the sorted key, grouped in 4096s), so the hash
    pins the end-to-end contract: sorted write + sized groups =>
    footers that prune exactly the predicted groups. This is the
    audit a lake job runs to decide whether a table needs
    re-clustering (zorder_locality's 1-D cousin, measured from real
    footers instead of data).

    Fixture build is construction-time-guarded and bounded (a ~20%
    key slice HARD-CAPPED at 100k sorted keys — deterministic because
    o_orderkey is unique — driver-staged once per app+sf through
    pyarrow for exact row-group sizing); the AUDIT path itself is the
    distributed operator — at 100 TB it reads footers of every file
    in parallel, bytes proportional to file count not data size.
    """
    import hashlib as _hashlib
    import os as _os
    import tempfile as _tempfile
    from collections.abc import Iterator as _Iterator

    import pandas as _pd

    from pyspark.sql.types import (
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    try:
        app = spark.sparkContext.applicationId
    except Exception:
        app = spark.conf.get("spark.app.id", "app")
    tag = _hashlib.md5(f"{app}|{sf_dir}".encode()).hexdigest()[:12]
    d = _os.path.join(_tempfile.gettempdir(), "ces_zonemap", tag)
    fpath = _os.path.join(d, "orders_sorted.parquet")
    if not _os.path.exists(fpath):
        import pyarrow as _pa
        import pyarrow.parquet as _pq

        _os.makedirs(d, exist_ok=True)
        pdf = (
            load_table(spark, sf_dir, "orders")
            .where(F.col("o_orderkey") % 5 == 0)
            .select("o_orderkey", "o_totalprice")
            .orderBy("o_orderkey")
            # driver-safety cap (VERDICT r5 item 4): the fixture
            # writer is the ONLY driver materialization here and the
            # slice grows with SF; 100k sorted unique keys bound the
            # toPandas at ~2 MB at any scale factor. Both engines
            # apply the identical cap (oracle: ORDER BY .. LIMIT).
            # No-op at the tested SFs (sf0.1 slice = 30k rows).
            .limit(100_000)
            .toPandas()
        )
        _pq.write_table(
            _pa.Table.from_pandas(pdf, preserve_index=False),
            fpath + ".tmp",
            row_group_size=4096,
        )
        _os.replace(fpath + ".tmp", fpath)

    out_schema = StructType(
        [
            StructField("rg_id", IntegerType()),
            StructField("n_rows", LongType()),
            StructField("min_key", LongType()),
            StructField("max_key", LongType()),
            StructField("skippable_for_probe", IntegerType()),
        ]
    )

    def read_footers(
        batches: _Iterator[_pd.DataFrame],
    ) -> _Iterator[_pd.DataFrame]:
        import pyarrow as _pa
        import pyarrow.parquet as _pq

        for pdf in batches:
            for _, row in pdf.iterrows():
                pf = _pq.ParquetFile(_pa.BufferReader(bytes(row["content"])))
                md = pf.metadata
                names = pf.schema_arrow.names
                ci = names.index("o_orderkey")
                recs = []
                for rg in range(md.num_row_groups):
                    st = md.row_group(rg).column(ci).statistics
                    if st is None or md.row_group(rg).num_rows == 0:
                        # a zero-row file's footer carries no column
                        # statistics — nothing to audit, not a crash
                        continue
                    lo, hi = int(st.min), int(st.max)
                    recs.append(
                        {
                            "rg_id": rg,
                            "n_rows": md.row_group(rg).num_rows,
                            "min_key": lo,
                            "max_key": hi,
                            "skippable_for_probe": int(
                                hi < 20000 or lo >= 40000
                            ),
                        }
                    )
                yield _pd.DataFrame(
                    recs,
                    columns=[
                        "rg_id",
                        "n_rows",
                        "min_key",
                        "max_key",
                        "skippable_for_probe",
                    ],
                )

    binary = spark.read.format("binaryFile").load(fpath).select("content")
    return binary.mapInPandas(read_footers, out_schema)


def _dpp_fixture(spark: SparkSession, sf_dir: str) -> str:
    """Hive-partitioned orders fixture (partition column =
    o_orderpriority), guarded construction-time build."""
    import hashlib as _hashlib
    import os as _os
    import tempfile as _tempfile

    try:
        app = spark.sparkContext.applicationId
    except Exception:
        app = spark.conf.get("spark.app.id", "app")
    tag = _hashlib.md5(f"{app}|{sf_dir}".encode()).hexdigest()[:12]
    d = _os.path.join(_tempfile.gettempdir(), "ces_dpp", tag)
    if not _os.path.exists(_os.path.join(d, "_SUCCESS")):
        (
            load_table(spark, sf_dir, "orders")
            .select(
                "o_orderkey",
                "o_custkey",
                "o_totalprice",
                "o_orderpriority",
            )
            .write.mode("overwrite")
            .partitionBy("o_orderpriority")
            .parquet(d)
        )
    return d


@query(
    "dynamic_partition_pruning_audit",
    oracle="""
    WITH dim AS (
      SELECT DISTINCT o_orderpriority AS priority,
             CASE WHEN substr(o_orderpriority, 1, 1) IN ('1', '2')
                  THEN 'hot' ELSE 'cold' END AS urgency
      FROM orders)
    SELECT o.o_orderpriority AS priority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(round(o.o_totalprice, 2) AS DECIMAL(18,2)))
                AS DOUBLE) AS revenue
    FROM orders o
    JOIN dim ON o.o_orderpriority = dim.priority
    WHERE dim.urgency = 'hot'
    GROUP BY o.o_orderpriority
    """,
)
def q_dynamic_partition_pruning_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Partition pruning through a join, under the gate: the fact
    side is a REAL hive-partitioned table (orders partitioned by
    priority) and the dim side carries a derived filter (urgency
    class computed from the priority string, kept 'hot'). Catalyst
    prunes the fact scan BOTH ways — constraint propagation pushes
    the inferred ``substring(priority,1,1) IN ('1','2')`` through
    the equi-join as a STATIC partition filter, and a
    ``dynamicpruning`` subquery is planted besides (the dim executes
    first; its surviving join keys filter the fact's partition
    listing at runtime — the mechanism that survives when the dim
    filter is NOT expressible over the join key, e.g. a selective
    date-dim predicate). 3 of the 5 fact partitions are never read.
    At 100 TB this is THE difference between full-fact scans and
    selected-partition scans for star joins. The oracle computes the
    same join unpartitioned; both pruning expressions are asserted
    on the physical plan in tests/test_scale_behaviors.py.
    """
    # explicit schema: an empty source writes no part files and
    # schema inference would fail — an empty feed reads back empty
    fact = spark.read.schema(
        "o_orderkey bigint, o_custkey bigint, o_totalprice double,"
        " o_orderpriority string"
    ).parquet(_dpp_fixture(spark, sf_dir))
    dim = (
        load_table(spark, sf_dir, "orders")
        .select(F.col("o_orderpriority").alias("priority"))
        .distinct()
        .withColumn(
            "urgency",
            F.when(
                F.substring("priority", 1, 1).isin("1", "2"), F.lit("hot")
            ).otherwise(F.lit("cold")),
        )
    )
    joined = fact.join(
        # broadcast-ok: distinct of the 5-value o_orderpriority enum; the hint also plants the dynamicpruning subquery under audit
        F.broadcast(dim.where(F.col("urgency") == "hot")),
        fact.o_orderpriority == F.col("priority"),
    )
    return joined.groupBy(
        F.col("o_orderpriority").alias("priority")
    ).agg(
        F.count("*").alias("n_orders"),
        F.sum(F.round("o_totalprice", 2).cast("decimal(18,2)"))
        .cast("double")
        .alias("revenue"),
    )


@query(
    "gdpr_erasure_audit",
    oracle="""
    WITH e AS (SELECT user_id FROM events)
    SELECT CAST(1 AS INT) AS version,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COALESCE(SUM(CASE WHEN user_id = 7 THEN 1 ELSE 0 END), 0)
                AS BIGINT) AS n_subject_rows,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM e
    UNION ALL
    SELECT CAST(2 AS INT),
           CAST(COUNT(*)
                - COALESCE(SUM(CASE WHEN user_id = 7 THEN 1 ELSE 0 END), 0)
                AS BIGINT),
           CAST(0 AS BIGINT),
           CAST(COUNT(DISTINCT CASE WHEN user_id <> 7 THEN user_id END)
                AS BIGINT)
    FROM e
    """,
)
def q_gdpr_erasure_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten on the snapshot layer: v1 holds the
    events table, v2 is the erasure rewrite with data subject
    user_id=7 removed; the audit reads BOTH snapshots back through
    time travel and reports per-version row/subject/user counts —
    v1 proves the history retains the pre-erasure state (for the
    legally-mandated audit trail), v2 proves the current version
    carries zero subject rows.

    Same crash-safe rebuild rule as ``snapshot_diff_audit``: any
    on-disk state other than the complete 2-version history is torn
    down and rebuilt. Scale shape: the erasure rewrite is one
    filtered scan (at 100 TB it would be partition-scoped — rewrite
    only partitions containing the subject, found via the zonemap /
    partition index — under the same atomic version pointer).
    """
    import hashlib as _hashlib
    import os as _os
    import shutil as _shutil
    import tempfile as _tempfile

    from concurrent_etl_spark.sources.warehouse import (
        latest_version,
        read_snapshot,
        versioned_write,
    )

    try:
        app = spark.sparkContext.applicationId
    except Exception:
        app = spark.conf.get("spark.app.id", "app")
    tag = _hashlib.md5(f"gdpr|{app}|{sf_dir}".encode()).hexdigest()[:12]
    path = _os.path.join(_tempfile.gettempdir(), "ces_gdpr", tag)
    if latest_version(path) != 2:
        _shutil.rmtree(path, ignore_errors=True)
        ev = load_table(spark, sf_dir, "events").select(
            "event_id", "user_id", "event_type"
        )
        versioned_write(ev, path)
        versioned_write(ev.where(F.col("user_id") != 7), path)
    audits = []
    for v in (1, 2):
        snap = read_snapshot(spark, path, version=v)
        audits.append(
            snap.agg(
                F.lit(v).cast("int").alias("version"),
                F.count(F.lit(1)).alias("n_rows"),
                # coalesce: SUM over an empty snapshot is NULL; an
                # empty table has 0 subject rows (both engines)
                F.coalesce(
                    F.sum((F.col("user_id") == 7).cast("long")), F.lit(0)
                ).alias("n_subject_rows"),
                F.countDistinct("user_id").alias("n_users"),
            )
        )
    return audits[0].unionByName(audits[1])


@query(
    "schema_evolution_merge_read",
    oracle="""
    SELECT 1 AS batch, s_suppkey AS suppkey, s_name AS name,
           'L' || CAST(s_suppkey AS VARCHAR) AS legacy_code,
           CAST(NULL AS DOUBLE) AS acctbal
    FROM supplier WHERE s_suppkey % 2 = 0
    UNION ALL
    SELECT 2 AS batch, s_suppkey, s_name,
           CAST(NULL AS VARCHAR), s_acctbal
    FROM supplier WHERE s_suppkey % 2 = 1
    """,
)
def q_schema_evolution_merge_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution under the gate: two parquet batches with
    DIFFERENT column sets — batch 1 carries a legacy column the new
    writer dropped, batch 2 carries a column added later — land in
    one hive-partitioned directory and are read back through
    ``mergeSchema=true``, the evolution path every long-lived lake
    table exercises (the reference's Excel loads assume a frozen
    layout, case_2/Normal.py:24-40; a 100 TB corpus never has one).

    The unified read must (a) union the column sets, (b) null-fill
    each batch's missing columns, (c) recover the ``batch`` partition
    key from the directory name. The oracle replays the same logical
    content from the supplier view — proving the merged read loses no
    rows and invents no values.

    Shape at 100 TB: schema merge reads parquet FOOTERS, not data
    (one task per file footer); the data scan stays one pass with
    column pruning intact across both physical layouts.
    """
    import hashlib as _hashlib
    import os as _os
    import shutil as _shutil
    import tempfile as _tempfile

    try:
        app = spark.sparkContext.applicationId
    except Exception:
        app = spark.conf.get("spark.app.id", "app")
    tag = _hashlib.md5(f"{app}|{sf_dir}".encode()).hexdigest()[:12]
    d = _os.path.join(_tempfile.gettempdir(), "ces_schevo", tag)
    done = _os.path.join(d, "_DONE")
    if not _os.path.exists(done):
        _shutil.rmtree(d, ignore_errors=True)
        _os.makedirs(d, exist_ok=True)
        sup = load_table(spark, sf_dir, "supplier")
        b1 = sup.where(F.col("s_suppkey") % 2 == 0).select(
            F.col("s_suppkey").alias("suppkey"),
            F.col("s_name").alias("name"),
            F.concat(F.lit("L"), F.col("s_suppkey").cast("string")).alias(
                "legacy_code"
            ),
        )
        b2 = sup.where(F.col("s_suppkey") % 2 == 1).select(
            F.col("s_suppkey").alias("suppkey"),
            F.col("s_name").alias("name"),
            F.col("s_acctbal").alias("acctbal"),
        )
        b1.write.mode("overwrite").parquet(_os.path.join(d, "batch=1"))
        b2.write.mode("overwrite").parquet(_os.path.join(d, "batch=2"))
        with open(done, "w") as f:
            f.write("ok")
    merged = (
        spark.read.option("mergeSchema", "true")
        .option("basePath", d)
        .parquet(_os.path.join(d, "batch=1"), _os.path.join(d, "batch=2"))
    )
    return merged.select(
        F.col("batch").cast("int").alias("batch"),
        "suppkey",
        "name",
        "legacy_code",
        "acctbal",
    )


@query(
    "fixed_width_source_roundtrip",
    oracle="""
    SELECT c_mktsegment AS segment,
           CAST(COUNT(*) AS BIGINT) AS n_cust,
           CAST(SUM(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100
                         AS BIGINT)) AS BIGINT) AS sum_cents,
           CAST(MIN(c_custkey) AS BIGINT) AS min_key,
           CAST(MAX(c_custkey) AS BIGINT) AS max_key
    FROM customer GROUP BY 1
    UNION ALL
    SELECT '_malformed' AS segment, CAST(3 AS BIGINT) AS n_cust,
           CAST(0 AS BIGINT) AS sum_cents, CAST(0 AS BIGINT) AS min_key,
           CAST(0 AS BIGINT) AS max_key
    """,
)
def q_fixed_width_source_roundtrip(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Fixed-width (COBOL/mainframe-export-style) text source under
    the gate: the customer table is rendered as 57-byte fixed-layout
    records — zero-padded key (cols 1-10), space-padded name (11-35),
    right-aligned signed cents (36-47), segment (48-57) — written as
    multi-file raw text, read back through ``spark.read.text``, and
    sliced with positional ``substring`` + trim + cast entirely inside
    codegen (no regex, no Python). Three injected off-layout lines
    land in a dead-letter row (the json_corrupt_record_capture
    discipline). The oracle recomputes the rollup from the structured
    source, so render -> pad -> slice -> cast must be lossless to
    hash-match — including negative balances surviving the
    right-aligned signed-integer field.

    At 100 TB: fixed-width text splits by line like any text source,
    slicing is row-local whole-stage codegen, and only per-segment
    partials shuffle. Guarded construction-time build keyed by
    application id + sf (same pattern as weblog_text_parse).

    Reference parity: the reference ingests only Excel exports
    (case_2/Normal.py:93); fixed-width is the other classic ERP/SAP
    export format a drop-directory ETL must parse.
    """
    import hashlib as _hashlib
    import os as _os
    import tempfile as _tempfile

    try:
        app = spark.sparkContext.applicationId
    except Exception:
        app = spark.conf.get("spark.app.id", "app")
    tag = _hashlib.md5(f"{app}|{sf_dir}".encode()).hexdigest()[:12]
    d = _os.path.join(_tempfile.gettempdir(), "ces_fixedwidth", tag)
    marker = _os.path.join(d, "_SUCCESS")
    if not _os.path.exists(marker):
        cust = load_table(spark, sf_dir, "customer")
        cents = (
            F.col("c_acctbal").cast("decimal(18,2)") * 100
        ).cast("long")
        lines = cust.select(
            F.concat(
                F.lpad(F.col("c_custkey").cast("string"), 10, "0"),
                F.rpad(F.col("c_name"), 25, " "),
                F.lpad(cents.cast("string"), 12, " "),
                F.rpad(F.col("c_mktsegment"), 10, " "),
            ).alias("value")
        )
        bad = spark.createDataFrame(
            [("0000000001SHORT",), ("not fixed width at all",), ("",)],
            "value string",
        )
        lines.unionByName(bad).coalesce(4).write.mode("overwrite").text(d)
    raw = spark.read.text(d)
    parsed = raw.select(
        F.when(
            F.length("value") == 57,
            F.substring("value", 1, 10).try_cast("long"),
        ).alias("key"),
        F.trim(F.substring("value", 36, 12)).try_cast("long").alias(
            "cents"
        ),
        F.trim(F.substring("value", 48, 10)).alias("segment"),
    )
    ok = parsed.where(F.col("key").isNotNull())
    dead = parsed.where(F.col("key").isNull())
    agg = ok.groupBy("segment").agg(
        F.count(F.lit(1)).cast("long").alias("n_cust"),
        F.sum("cents").cast("long").alias("sum_cents"),
        F.min("key").cast("long").alias("min_key"),
        F.max("key").cast("long").alias("max_key"),
    )
    dead_row = dead.agg(
        F.count(F.lit(1)).cast("long").alias("n_cust")
    ).select(
        F.lit("_malformed").alias("segment"),
        "n_cust",
        F.lit(0).cast("long").alias("sum_cents"),
        F.lit(0).cast("long").alias("min_key"),
        F.lit(0).cast("long").alias("max_key"),
    )
    return agg.unionByName(dead_row)


@query(
    "jsonl_gzip_source_roundtrip",
    oracle="""
    SELECT n_nationkey AS nationkey,
           CAST(COUNT(*) AS BIGINT) AS n_supp,
           CAST(SUM(CAST(CAST(s_acctbal AS DECIMAL(18,2)) * 100
                         AS BIGINT)) AS BIGINT) AS sum_cents,
           CAST(SUM(length(s_name)) AS BIGINT) AS sum_comment_len
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    GROUP BY 1
    UNION ALL
    SELECT CAST(-1 AS BIGINT) AS nationkey, CAST(2 AS BIGINT) AS n_supp,
           CAST(0 AS BIGINT) AS sum_cents,
           CAST(0 AS BIGINT) AS sum_comment_len
    """,
)
def q_jsonl_gzip_source_roundtrip(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """GZIP-compressed JSON-Lines source under the gate: the supplier
    table is rendered to multi-file .json.gz (Spark's native gzip
    codec on write), read back through ``spark.read.json`` with
    PERMISSIVE corrupt-record capture, joined to nation, and rolled
    up — so codec, schema inference boundary (schema is pinned
    explicitly: inference would sample-scan every gzip member twice),
    and dead-lettering are all on the verified path. Two injected
    malformed lines land in the -1 dead-letter row.

    The 100 TB note IS the point of this query: gzip is a
    NON-SPLITTABLE codec — each .json.gz file is one task regardless
    of size (a single 10 GB member serializes one executor thread).
    The write side therefore controls parallelism by file count
    (8 members here); a production pipeline re-chunks oversized
    members or moves to zstd/bgzf. Read cost is one linear scan per
    member, no shuffle until the rollup partials.

    Reference parity: the reference reads only Excel drops
    (case_2/Normal.py:93); compressed JSONL is the other standard
    drop-directory interchange format.
    """
    import hashlib as _hashlib
    import os as _os
    import tempfile as _tempfile

    try:
        app = spark.sparkContext.applicationId
    except Exception:
        app = spark.conf.get("spark.app.id", "app")
    tag = _hashlib.md5(f"{app}|{sf_dir}".encode()).hexdigest()[:12]
    d = _os.path.join(_tempfile.gettempdir(), "ces_jsonlgz", tag)
    marker = _os.path.join(d, "_SUCCESS")
    if not _os.path.exists(marker):
        supp = load_table(spark, sf_dir, "supplier")
        lines = supp.select(
            F.to_json(
                F.struct(
                    F.col("s_suppkey").alias("suppkey"),
                    F.col("s_nationkey").alias("nationkey"),
                    (F.col("s_acctbal").cast("decimal(18,2)") * 100)
                    .cast("long")
                    .alias("cents"),
                    F.col("s_name").alias("comment"),
                )
            ).alias("value")
        )
        bad = spark.createDataFrame(
            [('{"suppkey": broken',), ("not json at all",)],
            "value string",
        )
        (
            lines.unionByName(bad)
            .coalesce(8)
            .write.mode("overwrite")
            .option("compression", "gzip")
            .text(d)
        )
    schema = (
        "suppkey long, nationkey long, cents long, comment string,"
        " _corrupt string"
    )
    # read.text drives the gzip codec; from_json does the parse with
    # corrupt-record capture (the file-source JSON reader disallows
    # plans that touch only the corrupt column)
    raw = spark.read.text(d).select(
        F.from_json(
            "value",
            schema,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt"},
        ).alias("p")
    ).select("p.*")
    ok = raw.where(
        F.col("_corrupt").isNull() & F.col("suppkey").isNotNull()
    )
    nat = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("nationkey")
    )
    agg = (
        ok.join(F.broadcast(nat), "nationkey")
        .groupBy("nationkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_supp"),
            F.sum("cents").cast("long").alias("sum_cents"),
            F.sum(F.length("comment")).cast("long").alias(
                "sum_comment_len"
            ),
        )
    )
    dead = raw.where(F.col("_corrupt").isNotNull()).agg(
        F.count(F.lit(1)).cast("long").alias("n_supp")
    ).select(
        F.lit(-1).cast("long").alias("nationkey"),
        "n_supp",
        F.lit(0).cast("long").alias("sum_cents"),
        F.lit(0).cast("long").alias("sum_comment_len"),
    )
    return agg.unionByName(dead)


@query(
    "txn_vacuum_retention_audit",
    oracle="""
    WITH cur AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(SUM(n_nationkey * 4) AS BIGINT) AS keysum
      FROM nation),
    prev AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(SUM(n_nationkey * 3) AS BIGINT) AS keysum
      FROM nation)
    SELECT CAST(4 AS BIGINT) AS latest_version,
           CAST(2 AS BIGINT) AS n_versions_vacuumed,
           CAST(1 AS BIGINT) AS n_orphans_removed,
           cur.n_rows AS rows_latest, cur.keysum AS keysum_latest,
           prev.n_rows AS rows_retained_v3,
           prev.keysum AS keysum_retained_v3
    FROM cur, prev
    """,
)
def q_txn_vacuum_retention_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """VACUUM / retention on the commit-log table format: four
    versions are committed (v_k scales the key column by k), an
    ORPHAN data directory is planted (a crashed writer's leftovers —
    the thing CAS losers leave behind), then ``txn_vacuum``
    (sources/txn.py) expires everything but the last two versions
    and sweeps the orphan. The audit proves the retention CONTRACT:
    the vacuumed-version and orphan counts from the vacuum report,
    plus full reads of BOTH retained versions through the custom
    Python DataSource — latest (v4) and time-travel v3 — whose
    rollups the oracle recomputes from the parquet source. Expired
    v1/v2 data is gone; the log records remain so version numbering
    is stable (the Delta/Iceberg VACUUM semantics).

    Guarded build keyed by application id + sf; the vacuum report is
    persisted beside the table at build time so re-invocations
    return identical numbers (the guarded-fixture idempotence
    discipline).

    Scale shape: vacuum is log-sized directory arithmetic (no data
    scan); the audit reads are ordinary file-partitioned Arrow
    scans of the retained versions.
    """
    import hashlib as _hashlib
    import json as _json
    import os as _os
    import tempfile as _tempfile

    from concurrent_etl_spark.sources import pyds
    from concurrent_etl_spark.sources.txn import (
        txn_commit,
        txn_latest,
        txn_vacuum,
    )

    try:
        app = spark.sparkContext.applicationId
    except Exception:
        app = spark.conf.get("spark.app.id", "app")
    tag = _hashlib.md5(f"{app}|{sf_dir}|vac".encode()).hexdigest()[:12]
    path = _os.path.join(_tempfile.gettempdir(), "ces_pyds_vac", tag)
    report_path = _os.path.join(path, "_vacuum_report.json")
    base = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("bigint").alias("k"),
        F.col("n_name").alias("name"),
    )
    if not _os.path.exists(report_path):
        for mult in (1, 2, 3, 4):
            if txn_latest(path) < mult:
                txn_commit(
                    base.select(
                        (F.col("k") * mult).alias("k"), "name"
                    ),
                    path,
                )
        orphan = _os.path.join(path, "d-orphan-crashed-writer")
        _os.makedirs(orphan, exist_ok=True)
        with open(_os.path.join(orphan, "junk.bin"), "wb") as fh:
            fh.write(b"\x00" * 64)
        report = txn_vacuum(path, keep_last=2)
        with open(report_path, "w") as fh:
            _json.dump(
                {
                    "latest": txn_latest(path),
                    "n_versions": len(report["versions"]),
                    "n_orphans": len(report["orphans"]),
                },
                fh,
            )
    with open(report_path) as fh:
        rep = _json.load(fh)
    pyds.register(spark)
    v4 = (
        spark.read.format("ces_txn")
        .option("path", path)
        .load()
        .agg(
            F.count(F.lit(1)).cast("long").alias("rows_latest"),
            F.sum("k").cast("long").alias("keysum_latest"),
        )
    )
    v3 = (
        spark.read.format("ces_txn")
        .option("path", path)
        .option("version", "3")
        .load()
        .agg(
            F.count(F.lit(1)).cast("long").alias("rows_retained_v3"),
            F.sum("k").cast("long").alias("keysum_retained_v3"),
        )
    )
    return (
        v4.crossJoin(F.broadcast(v3))
        .select(
            F.lit(rep["latest"]).cast("long").alias("latest_version"),
            F.lit(rep["n_versions"])
            .cast("long")
            .alias("n_versions_vacuumed"),
            F.lit(rep["n_orphans"]).cast("long").alias("n_orphans_removed"),
            "rows_latest",
            "keysum_latest",
            "rows_retained_v3",
            "keysum_retained_v3",
        )
    )


@query(
    "write_audit_publish_txn",
    oracle="""
    WITH base AS (
      SELECT CAST(s_suppkey AS BIGINT) AS k, s_name AS name,
             CAST(floor(s_acctbal * 100) AS BIGINT) AS bal_cents
      FROM supplier),
    cand AS (
      SELECT k, name, bal_cents + 500 AS bal_cents
      FROM base JOIN supplier ON k = s_suppkey
      WHERE s_nationkey < 2),
    final AS (
      SELECT k, name, bal_cents FROM cand
      UNION ALL
      SELECT k, name, bal_cents FROM base
      WHERE k NOT IN (SELECT k FROM cand))
    SELECT k, name, bal_cents,
           CAST(2 AS BIGINT) AS latest_version,
           CAST(2 AS BIGINT) AS n_rejected
    FROM final
    """,
)
def q_write_audit_publish_txn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WRITE-AUDIT-PUBLISH on the commit-log table format — the
    Iceberg/Delta staging pattern (public: Netflix's WAP workflow):
    a batch is fully materialized and AUDITED before any commit
    record can publish it, so downstream readers never observe a
    snapshot that failed its quality gate.

    Lifecycle under the gate: v1 = supplier base snapshot through
    ``txn_commit``; then a candidate batch (nation-0/1 suppliers with
    a 500-cent credit) arrives CARRYING TWO POISON ROWS — a NULL key
    and an empty name, the classic feed defects. The audit (key NOT
    NULL, name non-empty) fails the dirty batch, so it is NOT
    published; the repaired batch re-audits clean and publishes as v2
    via ``txn_merge``. The query reads the latest snapshot back
    through the log with the version counter and the rejected-row
    count attached (data-side 1-row aggregate, broadcast). If the
    gate ever published the dirty batch — or refused the clean one —
    the rows, the version column, or n_rejected change and the hash
    fails. The oracle recomputes the expected published state from
    the parquet source.

    Guarded construction-time build keyed by application id + sf
    (txn_merge_audit's discipline: any partial state is detectable
    by version count alone and rebuilds).

    100 TB shape: the audit runs on the STAGED data directory before
    the O_EXCL commit-record CAS — cost is one scan of the batch,
    never of the table; publish is metadata-only on top of the
    already-written files.
    """
    import hashlib as _hashlib
    import os as _os
    import shutil as _shutil
    import tempfile as _tempfile

    from concurrent_etl_spark.sources.txn import (
        txn_commit,
        txn_latest,
        txn_merge,
        txn_read,
    )

    try:
        app = spark.sparkContext.applicationId
    except Exception:
        app = spark.conf.get("spark.app.id", "app")
    tag = _hashlib.md5(f"{app}|{sf_dir}|wap".encode()).hexdigest()[:12]
    path = _os.path.join(_tempfile.gettempdir(), "ces_wap", tag)

    sup = load_table(spark, sf_dir, "supplier")
    base = sup.select(
        F.col("s_suppkey").cast("bigint").alias("k"),
        F.col("s_name").alias("name"),
        F.floor(F.col("s_acctbal") * 100).cast("long").alias("bal_cents"),
    )
    # poison key must sit OUTSIDE the supplier key range at ANY scale
    # factor (sf0.1 already has suppkey 998) — a colliding key would
    # make "poison absent from the published table" unobservable
    poison = spark.createDataFrame(
        [(None, "ghost", 100), (10_000_000_998, "", 77)],
        "k long, name string, bal_cents long",
    )
    candidate = (
        base.join(
            sup.where(F.col("s_nationkey") < 2).select(
                F.col("s_suppkey").cast("bigint").alias("k")
            ),
            "k",
            "left_semi",
        )
        .withColumn("bal_cents", F.col("bal_cents") + 500)
        .unionByName(poison)
    )
    viol = F.col("k").isNull() | (F.col("name") == "")

    if txn_latest(path) != 2:
        _shutil.rmtree(path, ignore_errors=True)
        txn_commit(base, path)
        # WAP gate: audit the staged batch; publish ONLY a batch
        # whose audit comes back clean. The dirty candidate must
        # fail here — publishing it would change the final rows and
        # fail the oracle hash.
        for staged in (candidate, candidate.where(~viol)):
            if staged.where(viol).count() == 0:
                txn_merge(spark, path, staged, ["k"])
                break

    rejected = candidate.where(viol).agg(
        F.count(F.lit(1)).cast("long").alias("n_rejected")
    )
    return (
        txn_read(spark, path)
        .select("k", "name", "bal_cents")
        .withColumn(
            "latest_version", F.lit(txn_latest(path)).cast("bigint")
        )
        .crossJoin(F.broadcast(rejected))
    )
