"""Fourth relational tranche: distribution-rank window family,
multiset set-operations (INTERSECT/EXCEPT ALL), pattern-match
predicate pushdown, and an iterative graph algorithm (damped
random-walk centrality over the customer-supplier bipartite graph).

The reference has none of these (its only set-like op is the seen-set
diff, SURVEY §2.4 A6); they complete the warehouse SQL surface the
oracle harness can exercise. Determinism conventions as elsewhere:
explicit tiebreaks, rounded-then-DECIMAL accumulation for any
float sum, md5 never engine hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from concurrent_etl_spark.catalog import query
from concurrent_etl_spark.catalog import dsum as _dsum
from concurrent_etl_spark.engine import load_table
from concurrent_etl_spark.operators.text import ascii_fold, fold_sql


@query(
    "rank_distribution_family",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(RANK() OVER w AS BIGINT) AS rnk,
           CAST(DENSE_RANK() OVER w AS BIGINT) AS drnk,
           round(PERCENT_RANK() OVER w, 9) AS pct_rank,
           round(CUME_DIST() OVER w, 9) AS cdist,
           NTH_VALUE(o_totalprice, 2) OVER w2 AS second_price
    FROM orders
    WHERE o_custkey < 100
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderpriority),
           w2 AS (PARTITION BY o_custkey
                  ORDER BY o_totalprice DESC, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def q_rank_distribution_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full ranking/distribution window family: RANK and
    DENSE_RANK over a genuinely tied ordering (order priority — their
    tie semantics are the point), PERCENT_RANK and CUME_DIST (both
    deterministic under ties by definition), and NTH_VALUE over a
    totally-ordered explicit ROWS frame (ties broken by orderkey —
    nth_value is physical-order-sensitive, so the total order is a
    correctness requirement, not style). One shuffle on o_custkey
    serves all five functions; both windows share the partition key
    so Catalyst plans a single Exchange.
    """
    o = load_table(spark, sf_dir, "orders").where(F.col("o_custkey") < 100)
    w = Window.partitionBy("o_custkey").orderBy("o_orderpriority")
    w2 = (
        Window.partitionBy("o_custkey")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.rank().over(w).cast("bigint").alias("rnk"),
        F.dense_rank().over(w).cast("bigint").alias("drnk"),
        F.round(F.percent_rank().over(w), 9).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 9).alias("cdist"),
        F.nth_value("o_totalprice", 2).over(w2).alias("second_price"),
    )


@query(
    "multiset_intersect_except",
    oracle="""
    WITH open_parts AS (
      SELECT l_partkey FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderstatus = 'O'),
    done_parts AS (
      SELECT l_partkey FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderstatus = 'F'),
    both_ms AS (
      SELECT l_partkey FROM open_parts
      INTERSECT ALL
      SELECT l_partkey FROM done_parts),
    only_open AS (
      SELECT l_partkey FROM open_parts
      EXCEPT ALL
      SELECT l_partkey FROM done_parts)
    SELECT 'intersect_all' AS op, l_partkey, COUNT(*) AS n
    FROM both_ms GROUP BY 1, 2
    UNION ALL
    SELECT 'except_all' AS op, l_partkey, COUNT(*) AS n
    FROM only_open GROUP BY 1, 2
    """,
)
def q_multiset_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset set operations — INTERSECT ALL / EXCEPT ALL preserve
    duplicate counts (bag semantics), unlike the DISTINCT variants
    already covered by union_intersect. Spark compiles both to a
    single aggregate producing min/diff of per-side multiplicities
    then a Generate replicating rows — one shuffle per operator, no
    join explosion. The bag results are re-aggregated to (key, n) so
    the oracle hash stays compact.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    j = li.join(o, li.l_orderkey == o.o_orderkey)
    open_parts = j.where(F.col("o_orderstatus") == "O").select("l_partkey")
    done_parts = j.where(F.col("o_orderstatus") == "F").select("l_partkey")
    both_ms = (
        open_parts.intersectAll(done_parts)
        .groupBy("l_partkey")
        .agg(F.count("*").alias("n"))
        .select(F.lit("intersect_all").alias("op"), "l_partkey", "n")
    )
    only_open = (
        open_parts.exceptAll(done_parts)
        .groupBy("l_partkey")
        .agg(F.count("*").alias("n"))
        .select(F.lit("except_all").alias("op"), "l_partkey", "n")
    )
    return both_ms.unionByName(only_open)


@query(
    "pattern_predicate_stats",
    oracle="""
    SELECT p_brand,
           COUNT(*) AS n_parts,
           CAST(SUM(CASE WHEN p_name LIKE '%bolt%' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_bolt,
           CAST(SUM(CASE WHEN p_name LIKE 'red%' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_red,
           CAST(SUM(CASE WHEN p_type LIKE 'SM%' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_small_type,
           CAST(SUM(CASE WHEN regexp_matches(p_name, '^[a-m]') THEN 1 ELSE 0
                     END) AS BIGINT) AS n_first_half
    FROM part
    WHERE p_name NOT LIKE '%widget%'
    GROUP BY 1
    """,
)
def q_pattern_predicate_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE / prefix-LIKE / regexp predicate family as both a filter
    (NOT LIKE — pushed to the scan as a data filter) and conditional
    aggregation. Prefix patterns ('red%', 'SM%') compile to
    StartsWith, which parquet can evaluate against min/max statistics;
    the contains pattern stays a row filter. One scan, one agg keyed
    by the low-cardinality brand.
    """
    p = load_table(spark, sf_dir, "part").where(~F.col("p_name").like("%widget%"))
    flag = lambda c: c.cast("int")  # noqa: E731
    return p.groupBy("p_brand").agg(
        F.count("*").alias("n_parts"),
        F.sum(flag(F.col("p_name").like("%bolt%"))).alias("n_bolt"),
        F.sum(flag(F.col("p_name").like("red%"))).alias("n_red"),
        F.sum(flag(F.col("p_type").like("SM%"))).alias("n_small_type"),
        F.sum(flag(F.col("p_name").rlike("^[a-m]"))).alias("n_first_half"),
    )


# damping factor for the random-walk centrality
_PR_D = 0.85


def _pr_sql() -> str:
    """Two unrolled damped-walk iterations as oracle SQL.

    Node ids are integers (even = customer 2k, odd = supplier 2k+1) —
    string labels are attached only to the final 50 rows; integer
    shuffle/sort keys are the difference between a 4.5s and a ~2s
    run at sf0.1 on the Spark side, and the oracle mirrors the id
    scheme so every intermediate value matches.
    """
    return f"""
    WITH raw AS (
      SELECT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
    -- MATERIALIZED: ew is referenced 4x (deg/nodes/it1/it2) and cw
    -- 2x — DuckDB's default inlining re-derives the 6M-row raw join
    -- per reference, which blew temp spill at the sf1 gate (the
    -- kcore-oracle lesson); materializing mirrors Spark's persist
    cw AS MATERIALIZED (SELECT src, dst, COUNT(*) AS w FROM raw
                        GROUP BY 1, 2),
    ew AS MATERIALIZED (SELECT src, dst, w FROM cw
           UNION ALL SELECT dst AS src, src AS dst, w FROM cw),
    deg AS MATERIALIZED (SELECT src, SUM(w) AS deg FROM ew GROUP BY 1),
    nodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM ew),
    n AS (SELECT COUNT(*) AS n FROM nodes),
    r0 AS (SELECT node, round(1.0 / n.n, 12) AS r FROM nodes, n),
    it1 AS MATERIALIZED (
      SELECT e.dst AS node,
             round((1 - {_PR_D}) / any_value(n.n) + {_PR_D} *
               (CAST(SUM(CAST(round(r0.r * e.w / d.deg * 1e12, 0)
                              AS BIGINT)) AS DOUBLE) / 1e12), 12) AS r
      FROM ew e JOIN r0 ON r0.node = e.src
      JOIN deg d ON d.src = e.src, n
      GROUP BY e.dst),
    it2 AS (
      SELECT e.dst AS node,
             round((1 - {_PR_D}) / any_value(n.n) + {_PR_D} *
               (CAST(SUM(CAST(round(it1.r * e.w / d.deg * 1e12, 0)
                              AS BIGINT)) AS DOUBLE) / 1e12), 12) AS r
      FROM ew e JOIN it1 ON it1.node = e.src
      JOIN deg d ON d.src = e.src, n
      GROUP BY e.dst)
    SELECT CASE WHEN node % 2 = 0 THEN 'c' || CAST(node // 2 AS VARCHAR)
                ELSE 's' || CAST((node - 1) // 2 AS VARCHAR) END AS node,
           round(r, 9) AS rank_score
    FROM (SELECT node, r, ROW_NUMBER() OVER (ORDER BY r DESC, node) AS rk
          FROM it2)
    WHERE rk <= 50
    """


@query("pagerank_bipartite", oracle=_pr_sql())
def q_pagerank_bipartite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Damped random-walk centrality (PageRank iteration) over the
    undirected customer-supplier bipartite graph induced by
    lineitem x orders, two fixed iterations, top-50 nodes.

    The iterative structure: each step is contributions-join (rank /
    weighted-degree along edges) + per-node agg — the canonical
    message-passing shape, expressed as two unrolled DataFrame
    passes (the oracle unrolls identical CTEs). Per-edge
    contributions are rounded then accumulated as DECIMAL, making
    the distributed sum order-invariant and bit-identical to the
    oracle's sequential sum — the same trick the decimal `dsum`
    headline aggs use. At 100 TB the edge list shuffles on uniform
    node keys; each iteration is one shuffle (agg) over
    vocabulary-sized state, and more iterations chain linearly
    without growing state. Tie-broken top-k keeps output bounded.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    raw = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
    )
    # integer node ids (even = customer, odd = supplier): string keys
    # measured ~2x slower through the shuffles; labels attach only to
    # the final 50 rows. Multiplicities aggregate BEFORE mirroring
    # (the graph is symmetric) so the heavy shuffle sees half the
    # rows; cw is persisted because the union references it twice
    # (union subtrees execute independently — no common-subplan reuse)
    cw = raw.groupBy("src", "dst").agg(F.count("*").alias("w")).persist()
    ew = cw.unionByName(
        cw.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "w")
    )
    # deg is one-row-per-node (every node appears as src in the
    # mirrored edge list), so it doubles as the node set — computing
    # nodes = ewd.distinct() separately was a second full shuffle of
    # the edge list for information deg already holds
    deg = ew.groupBy("src").agg(F.sum("w").alias("deg")).persist()
    # pre-join degrees into the edge list once and persist THAT: each
    # iteration then joins only the rank vector (one join per step,
    # and the upstream fact join never re-executes)
    ewd = ew.join(deg, "src").persist()
    n_nodes = deg.count()  # scalar graph size: bounded driver value
    # empty-graph guard: with zero nodes every frame below is empty
    # (0 rows out either way) — the max(…, 1) only keeps the two
    # driver-side literal divisions from raising ZeroDivisionError
    n_div = max(n_nodes, 1)

    r = deg.select(
        F.col("src").alias("node"),
        F.round(F.lit(1.0) / n_div, 12).alias("r"),
    )
    for _ in range(2):
        # scaled-integer message passing: contributions round to 1e-12
        # resolution as BIGINTs, so the distributed sum is exact and
        # partition-invariant like the DECIMAL form but stays in
        # codegen'd long arithmetic (measured: decimal agg cost ~1.3s
        # per iteration at sf0.1, long agg ~0.1s). Overflow-safe at
        # ANY graph size: rank mass conservation bounds each node's
        # incoming sum by total mass ~1, i.e. <= ~1e12 after scaling.
        contrib = F.round(
            F.col("r") * F.col("w") / F.col("deg") * 1e12, 0
        ).cast("bigint")
        # the rank vector is node-set-sized, which SCALES with the
        # data (r7: the explicit F.broadcast hint was dropped for
        # exactly that reason) — at this schema's node counts AQE
        # still broadcasts it at runtime, keeping each iteration a
        # map-side join over the cached edge list with the per-node
        # agg as the only shuffle; on a web-scale graph the same
        # plan degrades gracefully to a shuffle join instead of a
        # driver OOM. (Measured negative result: localCheckpoint
        # between iterations to truncate lineage was noise-level at
        # best and hides the plan from the audit tooling — the
        # broadcast side executes its chain once per query, which is
        # the cost model you'd want anyway.)
        r = (
            # no hint: the rank vector is one row per node — corpus-proportional
            ewd.join((r), ewd.src == r.node)
            .groupBy(F.col("dst").alias("node"))
            .agg(
                F.round(
                    F.lit((1 - _PR_D) / n_div)
                    + _PR_D * (F.sum(contrib).cast("double") / F.lit(1e12)),
                    12,
                ).alias("r")
            )
        )
    label = F.when(
        F.col("node") % 2 == 0,
        F.concat(
            F.lit("c"), (F.col("node") / 2).cast("bigint").cast("string")
        ),
    ).otherwise(
        F.concat(
            F.lit("s"),
            ((F.col("node") - 1) / 2).cast("bigint").cast("string"),
        )
    )
    # top-50 via sort+limit -> TakeOrderedAndProject (per-partition
    # k-row heaps + driver merge of 50-row lists), NOT a global
    # row_number window (which would sort the full node set on one
    # partition). rk is not part of the output, so no window at all.
    # The persisted edge list is released by the harness-level
    # clearCache teardown documented in catalog.py (the result is
    # lazy, so unpersisting here would defeat the caches).
    return (
        r.orderBy(F.desc("r"), F.asc("node"))
        .limit(50)
        .select(label.alias("node"), F.round(F.col("r"), 9).alias("rank_score"))
    )


@query(
    "fact_fact_selfjoin",
    oracle="""
    SELECT a.l_orderkey AS orderkey, COUNT(*) AS n_supplier_pairs
    FROM lineitem a JOIN lineitem b
      ON a.l_orderkey = b.l_orderkey
     AND a.l_linenumber < b.l_linenumber
     AND a.l_suppkey <> b.l_suppkey
    GROUP BY 1
    """,
)
def q_fact_fact_selfjoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-to-fact self-join: per order, count lineitem pairs from
    different suppliers (multi-supplier order detection). Both sides
    are data-scaled, so this is the one join family that CANNOT
    broadcast at 100 TB — it shuffles both sides on l_orderkey and
    sort-merge joins (at test sf, AQE legitimately downgrades to
    broadcast; the strategy choice is stats-driven, which is the
    point). The linenumber inequality halves the pair space and the
    per-key group is order-sized (<= ~7 rows), so no skew.
    """
    li = load_table(spark, sf_dir, "lineitem")
    a = li.select(
        F.col("l_orderkey"),
        F.col("l_linenumber").alias("ln_a"),
        F.col("l_suppkey").alias("sk_a"),
    )
    b = li.select(
        F.col("l_orderkey"),
        F.col("l_linenumber").alias("ln_b"),
        F.col("l_suppkey").alias("sk_b"),
    )
    return (
        a.join(
            b,
            (a.l_orderkey == b.l_orderkey)
            & (F.col("ln_a") < F.col("ln_b"))
            & (F.col("sk_a") != F.col("sk_b")),
        )
        .groupBy(a.l_orderkey.alias("orderkey"))
        .agg(F.count("*").alias("n_supplier_pairs"))
    )


def _profile_sql() -> str:
    specs = [
        ("o_orderkey", "CAST(%s AS VARCHAR)"),
        ("o_custkey", "CAST(%s AS VARCHAR)"),
        ("o_totalprice", "CAST(CAST(round(%s, 4) AS DECIMAL(18,4)) AS VARCHAR)"),
        ("o_orderstatus", "CAST(%s AS VARCHAR)"),
        ("o_orderdate", "CAST(%s AS VARCHAR)"),
    ]
    parts = []
    for col, fmt in specs:
        mn, mx = fmt % f"MIN({col})", fmt % f"MAX({col})"
        parts.append(
            f"SELECT '{col}' AS col, COUNT(*) AS n_rows,"
            f" COUNT({col}) AS n_nonnull,"
            f" CAST(COUNT(DISTINCT {col}) AS BIGINT) AS n_distinct,"
            f" {mn} AS min_str, {mx} AS max_str FROM orders"
        )
    return "\nUNION ALL\n".join(parts)


@query("profile_table", oracle=_profile_sql())
def q_profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-profiling audit: per-column row/non-null/distinct
    counts plus min/max — the data-quality pass an ETL pipeline runs
    before loading (the engine-owned version of the reference's
    count-audit, case_2/Normal.py:280-282, S10). One pass per column
    over a columnar scan that reads ONLY that column (Parquet column
    pruning makes each branch cheap); doubles are canonicalized
    through DECIMAL before stringifying so both engines print
    identically. At scale, replace exact DISTINCT with HLL if the
    audit budget demands — kept exact here for the oracle.
    """
    o = load_table(spark, sf_dir, "orders")
    fmt_plain = lambda c: F.col(c).cast("string")  # noqa: E731
    fmt_money = (
        lambda c: F.round(F.col(c), 4).cast("decimal(18,4)").cast("string")
    )  # noqa: E731
    specs = [
        ("o_orderkey", fmt_plain),
        ("o_custkey", fmt_plain),
        ("o_totalprice", fmt_money),
        ("o_orderstatus", fmt_plain),
        ("o_orderdate", fmt_plain),
    ]
    out = None
    for col, fmt in specs:
        branch = (
            o.select(F.col(col))
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.count(col).alias("n_nonnull"),
                F.count_distinct(F.col(col)).cast("bigint").alias("n_distinct"),
                F.min(col).alias("_mn"),
                F.max(col).alias("_mx"),
            )
            .select(
                F.lit(col).alias("col"),
                "n_rows",
                "n_nonnull",
                "n_distinct",
                fmt("_mn").alias("min_str"),
                fmt("_mx").alias("max_str"),
            )
        )
        out = branch if out is None else out.unionByName(branch)
    return out


@query(
    "collect_sorted_suppliers",
    oracle="""
    SELECT l_orderkey AS orderkey,
           array_to_string(list_sort(list(DISTINCT CAST(l_suppkey AS VARCHAR))),
                           ',') AS suppliers,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_suppliers
    FROM lineitem
    GROUP BY 1
    """,
)
def q_collect_sorted_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array aggregation made deterministic: per-order supplier set,
    sorted then joined to a canonical string. collect_set's element
    order is partition-dependent — array_sort is what turns it into
    a value with a stable cross-engine hash (the same discipline the
    string_agg_inlist query applies to string aggregation). One
    keyed agg; the per-key array is order-sized, never data-scaled.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy(F.col("l_orderkey").alias("orderkey")).agg(
        F.array_join(
            F.array_sort(F.collect_set(F.col("l_suppkey").cast("string"))), ","
        ).alias("suppliers"),
        F.count_distinct("l_suppkey").cast("bigint").alias("n_suppliers"),
    )


@query(
    "winsorized_stats",
    oracle="""
    WITH bounds AS (
      SELECT o_orderstatus,
             quantile_cont(o_totalprice, 0.05) AS p05,
             quantile_cont(o_totalprice, 0.95) AS p95
      FROM orders GROUP BY 1)
    SELECT o.o_orderstatus AS status, COUNT(*) AS n,
           round(b.p05, 6) AS p05, round(b.p95, 6) AS p95,
           CAST(SUM(CAST(round(
             CASE WHEN o.o_totalprice < b.p05 THEN b.p05
                  WHEN o.o_totalprice > b.p95 THEN b.p95
                  ELSE o.o_totalprice END, 6) AS DECIMAL(18,6)))
             AS DOUBLE) AS winsorized_sum
    FROM orders o JOIN bounds b ON o.o_orderstatus = b.o_orderstatus
    GROUP BY 1, round(b.p05, 6), round(b.p95, 6)
    """,
)
def q_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized aggregation: clamp each group's order values to its
    own exact [p5, p95] percentile band before summing — the
    outlier-robust statistic next to the Tukey-fence filter
    (iqr_outliers). Exact percentile_cont needs a per-group sort of
    the values (percentile_approx trades that for a mergeable sketch
    when the audit budget demands); the bounds table is
    group-cardinality-sized and broadcast back onto the fact. Clamped
    values are rounded then DECIMAL-summed for partition invariance.
    """
    o = load_table(spark, sf_dir, "orders")
    bounds = o.groupBy("o_orderstatus").agg(
        F.expr("percentile(o_totalprice, 0.05)").alias("p05"),
        F.expr("percentile(o_totalprice, 0.95)").alias("p95"),
    )
    clamped = F.round(
        F.when(F.col("o_totalprice") < F.col("p05"), F.col("p05"))
        .when(F.col("o_totalprice") > F.col("p95"), F.col("p95"))
        .otherwise(F.col("o_totalprice")),
        6,
    ).cast("decimal(18,6)")
    return (
        # broadcast-ok: one row per o_orderstatus (3-value enum)
        o.join(F.broadcast(bounds), "o_orderstatus")
        .groupBy(
            F.col("o_orderstatus").alias("status"),
            F.round("p05", 6).alias("p05"),
            F.round("p95", 6).alias("p95"),
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(clamped).cast("double").alias("winsorized_sum"),
        )
        .select("status", "n", "p05", "p95", "winsorized_sum")
    )


@query(
    "explode_outer_tokens",
    oracle=f"""
    WITH d AS (
      SELECT doc_id,
             list_filter(string_split_regex({fold_sql('text')},
                           '[ \\t\\n\\x0B\\f\\r]+'),
                         t -> t LIKE 'w%') AS tz
      FROM documents)
    SELECT d.doc_id, u.tok
    FROM d LEFT JOIN LATERAL (SELECT unnest(d.tz) AS tok) AS u ON true
    """,
)
def q_explode_outer_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode_outer vs explode: documents with NO matching token
    (the 'w'-prefix filter leaves ~20% of docs with empty arrays)
    must survive as
    a (doc_id, NULL) row — the left-lateral null-preserving unnest
    that plain explode silently drops. The distinction matters in
    ETL joins where losing parent rows corrupts counts; the oracle
    expresses the same semantics as LEFT JOIN LATERAL unnest.
    """
    docs = load_table(spark, sf_dir, "documents")
    tz = F.filter(
        F.split(ascii_fold("text"), r"[ \t\n\x0B\f\r]+"),
        lambda t: t.startswith("w"),
    )
    return docs.select("doc_id", tz.alias("tz")).select(
        "doc_id", F.explode_outer("tz").alias("tok")
    )


@query(
    "locf_forward_fill",
    oracle="""
    WITH e AS (
      SELECT user_id, ts, event_id,
             CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v
      FROM events)
    SELECT user_id, ts, event_id, v,
           last_value(v IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled
    FROM e
    """,
)
def q_locf_forward_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-observation-carried-forward: error events null out their
    reading and inherit the user's most recent non-null value —
    the sensor/telemetry forward-fill (IGNORE NULLS window
    semantics, which gapfill_hourly_events' dense spine does not
    cover). Total ordering (ts, event_id) makes the fill
    deterministic; one shuffle on user_id, running frame state is a
    single value. Values pass through without arithmetic, so no
    DECIMAL staging is needed.
    """
    e = load_table(spark, sf_dir, "events")
    v = F.when(F.col("event_type") == "error", F.lit(None)).otherwise(
        F.col("value")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return e.select("user_id", "ts", "event_id", v.alias("v")).select(
        "user_id",
        "ts",
        "event_id",
        "v",
        F.last("v", ignorenulls=True).over(w).alias("v_filled"),
    )


@query(
    "decimal_money_arithmetic",
    oracle="""
    WITH m AS (
      SELECT o_orderstatus,
             CAST(round(o_totalprice, 2) AS DECIMAL(18,2)) AS price
      FROM orders)
    SELECT o_orderstatus AS status,
           CAST(SUM(price) AS VARCHAR) AS gross,
           CAST(SUM(CAST(price * CAST('0.07' AS DECIMAL(4,2))
                         AS DECIMAL(18,4))) AS VARCHAR) AS tax,
           CAST(MAX(price) AS VARCHAR) AS max_price
    FROM m GROUP BY 1
    """,
)
def q_decimal_money_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Money arithmetic done in DECIMAL end-to-end (SURVEY §1 flags
    money-as-float as a reference smell): prices quantized to
    DECIMAL(18,2), a 7% tax computed at DECIMAL(18,4), sums exact by
    type — no float drift at any row count, no rounding conventions
    needed. Results are stringified from DECIMAL so both engines
    print the full fixed scale identically ('123.4500'), proving the
    scale survives aggregation. One map-side-combinable agg.
    """
    o = load_table(spark, sf_dir, "orders")
    price = F.round(F.col("o_totalprice"), 2).cast("decimal(18,2)")
    tax = (price * F.lit("0.07").cast("decimal(4,2)")).cast("decimal(18,4)")
    return (
        o.select(F.col("o_orderstatus").alias("status"),
                 price.alias("price"), tax.alias("tax"))
        .groupBy("status")
        .agg(
            F.sum("price").cast("string").alias("gross"),
            F.sum("tax").cast("string").alias("tax"),
            F.max("price").cast("string").alias("max_price"),
        )
    )


@query(
    "skew_diagnostics",
    oracle="""
    WITH g AS (SELECT l_orderkey, COUNT(*) AS n FROM lineitem GROUP BY 1)
    SELECT COUNT(*) AS n_keys,
           CAST(MIN(n) AS BIGINT) AS min_n,
           CAST(MAX(n) AS BIGINT) AS max_n,
           CAST(SUM(n) AS BIGINT) AS n_rows,
           round(CAST(SUM(n) AS DOUBLE) / COUNT(*), 9) AS mean_n,
           round(CAST(MAX(n) AS DOUBLE) * COUNT(*) / SUM(n), 9)
             AS skew_factor
    FROM g
    """,
)
def q_skew_diagnostics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join/agg-key skew diagnostics: group-size distribution of the
    shuffle key (min/max/mean group size and skew factor =
    max/mean) — the health check run BEFORE choosing salting or AQE
    skew-join thresholds on a new key at scale. Two cheap aggs; the
    second reduces key-cardinality rows to one diagnostic row.
    skew_factor ~1 means uniform; >>1 flags a hot key.
    """
    li = load_table(spark, sf_dir, "lineitem")
    g = li.groupBy("l_orderkey").agg(F.count("*").alias("n"))
    return g.agg(
        F.count("*").alias("n_keys"),
        F.min("n").cast("bigint").alias("min_n"),
        F.max("n").cast("bigint").alias("max_n"),
        F.sum("n").cast("bigint").alias("n_rows"),
        F.round(F.sum("n").cast("double") / F.count("*"), 9).alias("mean_n"),
        F.round(
            F.max("n").cast("double") * F.count("*") / F.sum("n"), 9
        ).alias("skew_factor"),
    )


@query(
    "boolean_agg_family",
    oracle="""
    SELECT o_orderstatus AS status,
           bool_or(o_totalprice > 400000) AS any_jumbo,
           bool_and(o_totalprice > 100) AS all_above_floor,
           CAST(count_if(o_orderpriority = '1-URGENT') AS BIGINT)
             AS n_urgent,
           CAST(count_if(o_totalprice > 200000) AS BIGINT) AS n_large
    FROM orders
    GROUP BY 1
    """,
)
def q_boolean_agg_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean/conditional aggregate family: bool_or / bool_and (ANY
    / EVERY) existence tests and count_if conditional counting — the
    idioms that replace correlated EXISTS subqueries with one
    map-side-combinable agg when only a flag is needed. One scan,
    one tiny keyed agg.
    """
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy(F.col("o_orderstatus").alias("status")).agg(
        F.bool_or(F.col("o_totalprice") > 400000).alias("any_jumbo"),
        F.bool_and(F.col("o_totalprice") > 100).alias("all_above_floor"),
        F.count_if(F.col("o_orderpriority") == "1-URGENT")
        .cast("bigint")
        .alias("n_urgent"),
        F.count_if(F.col("o_totalprice") > 200000)
        .cast("bigint")
        .alias("n_large"),
    )


@query(
    "schema_evolution_union",
    oracle="""
    WITH old_batch AS (
      SELECT o_orderkey, o_totalprice
      FROM orders WHERE o_orderkey % 2 = 0),
    new_batch AS (
      SELECT o_orderkey, o_totalprice, o_orderpriority AS priority
      FROM orders WHERE o_orderkey % 2 = 1),
    unioned AS (
      SELECT * FROM old_batch
      UNION ALL BY NAME
      SELECT * FROM new_batch)
    SELECT coalesce(priority, '<pre-migration>') AS priority,
           COUNT(*) AS n,
           CAST(SUM(CAST(round(o_totalprice, 2) AS DECIMAL(18,2)))
                AS VARCHAR) AS total
    FROM unioned GROUP BY 1
    """,
)
def q_schema_evolution_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution union: an old batch lacking a column unions
    with a new batch that has it — name-based alignment null-fills
    the missing column (unionByName(allowMissingColumns) / UNION ALL
    BY NAME) instead of the silent positional mismatch the
    reference's positional rename (case_2/Normal.py:174) would
    produce. The null-filled rows stay distinguishable downstream
    (coalesced to a sentinel here); money sums ride DECIMAL.
    """
    o = load_table(spark, sf_dir, "orders")
    old_batch = o.where(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", "o_totalprice"
    )
    new_batch = o.where(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey", "o_totalprice", F.col("o_orderpriority").alias("priority")
    )
    unioned = old_batch.unionByName(new_batch, allowMissingColumns=True)
    return unioned.groupBy(
        F.coalesce(F.col("priority"), F.lit("<pre-migration>")).alias("priority")
    ).agg(
        F.count("*").alias("n"),
        F.sum(F.round(F.col("o_totalprice"), 2).cast("decimal(18,2)"))
        .cast("string")
        .alias("total"),
    )


@query(
    "approx_distinct_bounded",
    oracle="""
    SELECT o_orderstatus AS status,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_exact,
           TRUE AS approx_within_5pct
    FROM orders GROUP BY 1
    """,
)
def q_approx_distinct_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL cardinality with a verified error bound: Spark computes
    both exact COUNT(DISTINCT) and approx_count_distinct (rsd=0.02)
    per group and asserts |approx-exact|/exact <= 5% IN the result;
    the oracle pins the exact count and expects the flag TRUE — if
    the sketch ever drifts past the bound, the value hash fails.
    This is how approximate operators stay honest in the catalog:
    the approximation is used, the bound is the contract. At 100 TB
    the approx path needs one map-side-mergeable sketch per group
    instead of a distinct shuffle of every key.
    """
    o = load_table(spark, sf_dir, "orders")
    agg = o.groupBy(F.col("o_orderstatus").alias("status")).agg(
        F.count_distinct("o_custkey").cast("bigint").alias("n_exact"),
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("_n_approx"),
    )
    within = (
        F.abs(F.col("_n_approx") - F.col("n_exact"))
        / F.col("n_exact") <= 0.05
    )
    return agg.select("status", "n_exact", within.alias("approx_within_5pct"))


@query(
    "json_struct_map_parse",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT))
                AS BIGINT) AS sum_k,
           COUNT(DISTINCT CAST(json_extract(props, '$.k') AS BIGINT))
             AS n_distinct_k,
           CAST(MAX(len(json_keys(props))) AS INTEGER) AS max_n_keys
    FROM events
    GROUP BY event_type
    """,
)
def q_json_struct_map_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed JSON parsing two ways — ``from_json`` into a declared
    struct (the schema-on-read path every semi-structured pipeline
    needs) and into ``map<string,bigint>`` for key introspection —
    then an integer-exact rollup per event type. Complements
    json_props_extract (per-row get_json_object): here the parse
    feeds aggregation, so Catalyst prunes the parsed struct to the
    single accessed field and the JSON decode happens once per row
    inside codegen. At 100 TB this is scan + one keyed shuffle of
    3-int partial states; BIGINT sums are order-invariant.

    Reference parity: the reference reads its config JSON driver-side
    (case_2/Normal.py:20-31) and has no data-plane JSON — this is the
    engine-surface extension (SURVEY §7 step 5, from_json for props).
    """
    ev = load_table(spark, sf_dir, "events")
    parsed = ev.select(
        "event_type",
        F.from_json("props", "k BIGINT").alias("s"),
        F.from_json("props", "map<string,bigint>").alias("m"),
    )
    return parsed.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("s.k")).alias("sum_k"),
        F.countDistinct(F.col("s.k")).alias("n_distinct_k"),
        F.max(F.size(F.map_keys(F.col("m")))).alias("max_n_keys"),
    )


#: one source of truth: the oracle AND the spark.sql() body are this
#: exact ANSI string (executable by both engines unchanged)
_WEEKLY_SHARE_SQL = """
    WITH weekly AS (
      SELECT r.r_name AS region_name,
             date_trunc('week', o.o_orderdate) AS week_start,
             SUM(CAST(round(l.l_extendedprice * (1 - l.l_discount), 6)
                      AS DECIMAL(18,6))) AS revenue_dec
      FROM lineitem l
      JOIN orders o   ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n   ON c.c_nationkey = n.n_nationkey
      JOIN region r   ON n.n_regionkey = r.r_regionkey
      WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
        AND o.o_orderdate < TIMESTAMP '1997-04-01'
      GROUP BY 1, 2)
    SELECT region_name, week_start,
           CAST(revenue_dec AS DOUBLE) AS revenue,
           CAST(revenue_dec AS DOUBLE)
             / CAST(SUM(revenue_dec) OVER (PARTITION BY region_name)
                    AS DOUBLE) AS region_share
    FROM weekly
"""


@query(
    "sql_interface_weekly_share",
    oracle=_WEEKLY_SHARE_SQL,
)
def q_sql_interface_weekly_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL entry path: the whole query is one ANSI string through
    ``spark.sql()`` over the registered temp views — proving the
    engine's second API surface (SURVEY §7: "DataFrame / SQL").
    Catalyst compiles it to the identical plan a DataFrame chain
    would get (star join + partial agg + one windowed share), so
    every pushdown/broadcast property carries over; the only
    difference is the parser front-end. Decimal-exact weekly sums;
    the share is a double ratio of decimal-exact numerators.
    """
    from concurrent_etl_spark.engine import register_temp_views

    register_temp_views(spark, sf_dir)
    return spark.sql(_WEEKLY_SHARE_SQL)


@query(
    "integrity_constraint_audit",
    oracle="""
    SELECT 'orders_pk_dup' AS check_name,
           (SELECT COUNT(*) FROM (
              SELECT o_orderkey FROM orders
              GROUP BY o_orderkey HAVING COUNT(*) > 1)) AS n_violations
    UNION ALL
    SELECT 'lineitem_orderkey_orphan',
           (SELECT COUNT(*) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_orderkey = l.l_orderkey))
    UNION ALL
    SELECT 'orders_custkey_orphan',
           (SELECT COUNT(*) FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c
                              WHERE c.c_custkey = o.o_custkey))
    UNION ALL
    SELECT 'customer_nationkey_orphan',
           (SELECT COUNT(*) FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM nation n
                              WHERE n.n_nationkey = c.c_nationkey))
    UNION ALL
    SELECT 'lineitem_pk_dup',
           (SELECT COUNT(*) FROM (
              SELECT l_orderkey, l_linenumber FROM lineitem
              GROUP BY l_orderkey, l_linenumber HAVING COUNT(*) > 1))
    """,
)
def q_integrity_constraint_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint audit over the star: primary-key uniqueness
    (orders; lineitem's composite key) and foreign-key orphan counts
    for every edge of the dimension chain — the checks a warehouse
    load runs before publishing a batch (the reference trusts its DB
    constraints to do this server-side; a lakehouse engine must own
    them). Each uniqueness check is a map-side-combinable
    group-count; each orphan check is a left-anti join against the
    (broadcastable) parent keys; five small aggregates union into
    one audit row set. At 100 TB every check is one scan + one
    bounded shuffle, and the audit composes with `observe()` so a
    violating batch fails before the merge, not after.
    """
    from concurrent_etl_spark.engine import load_table

    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")

    def dup_count(df, keys):
        return (
            df.groupBy(*keys)
            .agg(F.count("*").alias("_n"))
            .where(F.col("_n") > 1)
            .agg(F.count("*").alias("n_violations"))
        )

    def orphan_count(child, child_key, parent, parent_key):
        return (
            child.join(
                parent.select(parent_key).distinct(),
                child[child_key] == F.col(parent_key),
                "left_anti",
            ).agg(F.count("*").alias("n_violations"))
        )

    checks = [
        ("orders_pk_dup", dup_count(o, ["o_orderkey"])),
        ("lineitem_orderkey_orphan", orphan_count(li, "l_orderkey", o, "o_orderkey")),
        ("orders_custkey_orphan", orphan_count(o, "o_custkey", c, "c_custkey")),
        (
            "customer_nationkey_orphan",
            orphan_count(c, "c_nationkey", n, "n_nationkey"),
        ),
        ("lineitem_pk_dup", dup_count(li, ["l_orderkey", "l_linenumber"])),
    ]
    out = None
    for name, df in checks:
        part = df.select(F.lit(name).alias("check_name"), "n_violations")
        out = part if out is None else out.unionByName(part)
    return out


@query(
    "bucketed_colocated_join",
    oracle="""
    SELECT c.c_mktsegment AS mktsegment,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
             AS sum_price
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY 1
    """,
)
def q_bucketed_colocated_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-free join via bucketed table layout (S3-class source +
    J1-class join, re-planned for the lake): orders and customer are
    written hash-clustered into 8 buckets on the customer key, so the
    sort-merge join consumes bucket-aligned scans directly — zero
    Exchange below the join (vs two for the plain parquet plan; the
    only shuffle left is the final low-cardinality aggregation).
    This is the pay-once-at-ingest layout that makes every subsequent
    key join/agg on a 100 TB fact table shuffle-free; results are
    byte-identical to the unbucketed join, which is exactly what the
    oracle checks.

    Reference parity: the reference re-reads + re-joins master tables
    per 1000-row chunk over JDBC (case_2/Normal.py:58,232-236),
    paying layout cost on EVERY query; bucketing inverts that.

    The bucketed copies are (re)built only when this SparkSession has
    not registered them yet. The build path is keyed by (application
    id, sf_dir) so concurrent sessions on the SAME sf_dir never
    overwrite each other's files, and the tableExists short-circuit
    is trusted only after validating the table's parquet files still
    exist on disk (a catalog entry can outlive a cleaned tempdir).
    """
    import glob as _glob
    import hashlib as _hashlib
    import os as _os
    import tempfile as _tempfile

    from concurrent_etl_spark.sources.warehouse import write_bucketed

    tag = _hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    try:
        app = spark.sparkContext.applicationId
    except Exception:  # Spark Connect: no sparkContext gateway
        app = spark.conf.get("spark.app.id", "app")
    app_tag = _hashlib.md5(f"{app}|{tag}".encode()).hexdigest()[:12]
    base = _os.path.join(_tempfile.gettempdir(), "ces_bucketed", app_tag)
    tables = {
        "orders": (f"bco_orders_{app_tag}_{tag}", ["o_custkey"]),
        "customer": (f"bco_customer_{app_tag}_{tag}", ["c_custkey"]),
    }
    for src, (tbl, keys) in tables.items():
        path = _os.path.join(base, src)
        built = spark.catalog.tableExists(tbl) and bool(
            _glob.glob(_os.path.join(path, "*.parquet"))
            or _glob.glob(_os.path.join(path, "**", "*.parquet"))
        )
        if not built:
            write_bucketed(
                load_table(spark, sf_dir, src),
                tbl,
                path,
                keys,
                n_buckets=8,
            )
    o = spark.table(tables["orders"][0])
    c = spark.table(tables["customer"][0])
    return (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy(F.col("c_mktsegment").alias("mktsegment"))
        .agg(
            F.count("*").alias("n_orders"),
            _dsum("o_totalprice", "sum_price"),
        )
    )


@query(
    "map_functions_family",
    oracle="""
    SELECT p_partkey AS partkey,
           3 AS n_keys,
           'brand,name,size' AS keys_sorted,
           upper(p_brand) AS brand_up,
           upper(p_name) AS name_up,
           CAST(p_size AS VARCHAR) AS size_s,
           CAST(p_size AS DOUBLE) + p_retailprice AS size_plus_price
    FROM part
    """,
)
def q_map_functions_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType manipulation family: create_map / map_filter /
    transform_values / map_concat / map_zip_with / map_keys, the full
    key-value column surface (SURVEY §1 maps 'MapType/JSON strings
    for props' into the data model; json_struct_map_parse covers the
    parse-in, this covers compute-on-map). The maps are built from
    part attributes in-row, so the oracle states the expected output
    of each map op directly — semantics checked, mechanism Spark's.
    All ops are per-row codegen'd expressions: zero shuffle, scales
    as a pure map stage like the array HOF family.

    Reference parity: none — the reference has no map/dict-valued
    columns anywhere (SURVEY §1 'no nested, array, map types').
    """
    p = load_table(spark, sf_dir, "part")
    m = F.create_map(
        F.lit("brand"), F.col("p_brand"),
        F.lit("type"), F.col("p_type"),
        F.lit("name"), F.col("p_name"),
    )
    # drop one key, uppercase the survivors, then append a new key
    no_type = F.map_filter(m, lambda k, v: k != "type")
    upped = F.transform_values(no_type, lambda k, v: F.upper(v))
    merged = F.map_concat(
        upped, F.create_map(F.lit("size"), F.col("p_size").cast("string"))
    )
    # numeric map combine: per-key addition across two aligned maps
    m1 = F.create_map(F.lit("v"), F.col("p_size").cast("double"))
    m2 = F.create_map(F.lit("v"), F.col("p_retailprice"))
    zipped = F.map_zip_with(m1, m2, lambda k, a, b: a + b)
    return p.select(
        F.col("p_partkey").alias("partkey"),
        F.size(F.map_keys(merged)).alias("n_keys"),
        F.array_join(F.sort_array(F.map_keys(merged)), ",").alias("keys_sorted"),
        F.element_at(merged, "brand").alias("brand_up"),
        F.element_at(merged, "name").alias("name_up"),
        F.element_at(merged, "size").alias("size_s"),
        F.element_at(zipped, "v").alias("size_plus_price"),
    )


@query(
    "zorder_locality",
    oracle="""
    WITH d AS (
      SELECT o_orderkey,
             o_custkey % 4096 AS x,
             (CAST(o_orderdate AS DATE) - DATE '1970-01-01') % 4096 AS y
      FROM orders),
    z AS (
      SELECT x, y,
             list_aggregate(list_transform(range(0, 12), b ->
               (((x >> b) & 1) << (2 * b)) +
               (((y >> b) & 1) << (2 * b + 1))), 'sum') AS zkey
      FROM d)
    SELECT CAST(zkey >> 18 AS BIGINT) AS segment,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(MIN(x) AS BIGINT) AS x_min, CAST(MAX(x) AS BIGINT) AS x_max,
           CAST(MIN(y) AS BIGINT) AS y_min, CAST(MAX(y) AS BIGINT) AS y_max
    FROM z GROUP BY 1
    """,
)
def q_zorder_locality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering key, computed entirely in JVM
    bitwise expressions, with its locality property surfaced as data:
    group orders by curve segment (zkey >> 18) and report each
    segment's bounding box over BOTH interleaved dimensions. Because
    a Morton segment of length 2^18 covers a 512x512 quad, every
    segment's (x_max - x_min) and (y_max - y_min) are bounded at
    once — the property that makes parquet min/max stats prune
    multi-column predicates after ``write_zordered`` lays a table out
    by this key (tests/test_warehouse.py measures the row-group
    skipping). The oracle recomputes the interleaving in closed form,
    so a bit-order or off-by-one error in the key fails the hash.
    """
    from concurrent_etl_spark.sources.warehouse import zorder_key

    d = load_table(spark, sf_dir, "orders").select(
        (F.col("o_custkey") % 4096).alias("x"),
        (
            F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01"))
            % 4096
        ).alias("y"),
    )
    z = d.select("x", "y", zorder_key(["x", "y"], bits=12).alias("zkey"))
    return (
        z.groupBy(F.shiftright("zkey", 18).cast("bigint").alias("segment"))
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            F.min("x").cast("bigint").alias("x_min"),
            F.max("x").cast("bigint").alias("x_max"),
            F.min("y").cast("bigint").alias("y_min"),
            F.max("y").cast("bigint").alias("y_max"),
        )
    )


@query(
    "incremental_agg_merge",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value,
           MIN(ts) AS min_ts, MAX(ts) AS max_ts,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE)
                 / COUNT(*), 9) AS avg_value
    FROM events GROUP BY event_type
    """,
)
def q_incremental_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized-view maintenance: per-group totals computed as a
    MERGE of partial aggregates, never a rescan of history. Stage 1
    aggregates each (event_type, base-vs-delta) slice to mergeable
    state — count, DECIMAL sum (associative-exact, so partial order
    never changes the result), min/max. Stage 2 merges the partials
    per event_type and only then derives avg (avg itself is not
    mergeable; sum/count are — the algebraic-vs-distributive measure
    distinction every incremental-agg system is built on). The
    oracle is the full-scan GROUP BY, proving merge(partials) ==
    recompute(all) exactly.

    At 100 TB the base partials are a stored table maintained per
    ingest batch: each new day touches only its own partials, history
    is never rescanned, and the same merge runs across arbitrarily
    many stored slices. Spark's own map-side partial aggregation is
    this exact law applied inside one job; this query materializes it
    across jobs.
    """
    ev = load_table(spark, sf_dir, "events")
    partials = (
        ev.withColumn(
            "is_base", F.col("ts") < F.lit("2024-01-24").cast("timestamp")
        )
        .groupBy("event_type", "is_base")
        .agg(
            F.count("*").alias("pn"),
            F.sum(F.col("value").cast("decimal(18,4)")).alias("psum"),
            F.min("ts").alias("pmin"),
            F.max("ts").alias("pmax"),
        )
    )
    merged = partials.groupBy("event_type").agg(
        F.sum("pn").cast("bigint").alias("n_events"),
        F.sum("psum").cast("double").alias("sum_value"),
        F.min("pmin").alias("min_ts"),
        F.max("pmax").alias("max_ts"),
    )
    return merged.select(
        "event_type",
        "n_events",
        "sum_value",
        "min_ts",
        "max_ts",
        F.round(F.col("sum_value") / F.col("n_events"), 9).alias("avg_value"),
    )


def _lpa_sql() -> str:
    """Two unrolled synchronous label-propagation rounds as oracle SQL."""
    pick = (
        "SELECT node, lbl FROM ("
        "SELECT node, lbl, ROW_NUMBER() OVER (PARTITION BY node "
        "ORDER BY wt DESC, lbl) AS rn FROM {src}) WHERE rn = 1"
    )
    return f"""
    WITH raw AS (
      SELECT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
    cw AS (SELECT src, dst, COUNT(*) AS w FROM raw GROUP BY 1, 2),
    ew AS (SELECT src, dst, w FROM cw
           UNION ALL SELECT dst AS src, src AS dst, w FROM cw),
    l0 AS (SELECT DISTINCT src AS node, src AS lbl FROM ew),
    v1 AS (SELECT e.src AS node, l.lbl, SUM(e.w) AS wt
           FROM ew e JOIN l0 l ON l.node = e.dst GROUP BY 1, 2),
    l1 AS ({pick.format(src='v1')}),
    v2 AS (SELECT e.src AS node, l.lbl, SUM(e.w) AS wt
           FROM ew e JOIN l1 l ON l.node = e.dst GROUP BY 1, 2),
    l2 AS ({pick.format(src='v2')})
    SELECT CAST(lbl AS BIGINT) AS community,
           CAST(COUNT(*) AS BIGINT) AS n_nodes,
           CAST(SUM(CASE WHEN node % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_customers,
           CAST(SUM(CASE WHEN node % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_suppliers,
           CAST(MIN(node) AS BIGINT) AS min_node
    FROM l2 GROUP BY 1
    """


@query("label_propagation_communities", oracle=_lpa_sql())
def q_label_propagation_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection by synchronous label propagation over the
    customer-supplier bipartite graph: every node starts as its own
    label; each round it adopts the label with the largest total edge
    weight among its neighbors (ties broken toward the smaller
    label, which makes the classically order-sensitive LPA fully
    deterministic — the property that lets an oracle exist at all).
    Two unrolled rounds, then a per-community census. Completes the
    graph family: connected components answers "reachable at all",
    pagerank ranks within the structure, LPA partitions it into
    densely-linked groups.

    At 100 TB each round is one shuffle keyed on integer node ids
    (weight-vote agg) plus one partitioned top-1 window (bounded per
    node by its neighbor-label count); label state stays one row per
    node, and rounds chain linearly like the pagerank iterations.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    raw = li.join(o, li.l_orderkey == o.o_orderkey).select(
        (F.col("o_custkey") * 2).alias("src"),
        (F.col("l_suppkey") * 2 + 1).alias("dst"),
    )
    from concurrent_etl_spark.operators.graph import label_propagation

    cw = raw.groupBy("src", "dst").agg(F.count("*").alias("w")).persist()
    ew = cw.unionByName(
        cw.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "w")
    ).persist()
    labels = label_propagation(ew, rounds=2)
    out = labels.groupBy(F.col("lbl").cast("bigint").alias("community")).agg(
        F.count("*").cast("bigint").alias("n_nodes"),
        F.sum(F.when(F.col("node") % 2 == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_customers"),
        F.sum(F.when(F.col("node") % 2 == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_suppliers"),
        F.min("node").cast("bigint").alias("min_node"),
    )
    # cw/ew persists are registration-only until the caller's action
    # runs; the bench/oracle harnesses clearCache() per query (repo
    # convention) — an eager unpersist here would fire at plan-build
    # time and silently disable the caching it means to clean up
    return out


# ---------------------------------------------------------------------------
# recursive CTE: hierarchy expansion (Spark 4 WITH RECURSIVE)
# ---------------------------------------------------------------------------

_HIERARCHY_SQL = """
WITH RECURSIVE tree (s_suppkey, depth, path, cum_acctbal) AS (
  SELECT s_suppkey, 0, CAST(s_suppkey AS STRING),
         CAST(CAST(s_acctbal AS DECIMAL(18,2)) AS DECIMAL(18,2))
  FROM supplier WHERE s_suppkey = 0
  UNION ALL
  SELECT c.s_suppkey, t.depth + 1,
         CONCAT(t.path, '->', CAST(c.s_suppkey AS STRING)),
         CAST(t.cum_acctbal + CAST(c.s_acctbal AS DECIMAL(18,2))
              AS DECIMAL(18,2))
  FROM supplier c JOIN tree t
    ON (c.s_suppkey - 1) DIV 2 = t.s_suppkey AND c.s_suppkey >= 1
)
SELECT s_suppkey, CAST(depth AS INT) AS depth, path,
       CAST(cum_acctbal AS DOUBLE) AS cum_acctbal
FROM tree
"""


@query(
    "recursive_cte_hierarchy",
    oracle="""
    WITH RECURSIVE tree (s_suppkey, depth, path, cum_acctbal) AS (
      SELECT s_suppkey, 0, CAST(s_suppkey AS VARCHAR),
             CAST(s_acctbal AS DECIMAL(18,2))
      FROM supplier WHERE s_suppkey = 0
      UNION ALL
      SELECT c.s_suppkey, t.depth + 1,
             t.path || '->' || CAST(c.s_suppkey AS VARCHAR),
             CAST(t.cum_acctbal + CAST(c.s_acctbal AS DECIMAL(18,2))
                  AS DECIMAL(18,2))
      FROM supplier c JOIN tree t
        ON (c.s_suppkey - 1) // 2 = t.s_suppkey AND c.s_suppkey >= 1
    )
    SELECT s_suppkey, CAST(depth AS INTEGER) AS depth, path,
           CAST(cum_acctbal AS DOUBLE) AS cum_acctbal
    FROM tree
    """,
)
def q_recursive_cte_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE through the SQL front-end (Spark 4 ``WITH
    RECURSIVE``, SPARK-24497): expand an implicit binary-heap
    hierarchy over the supplier dimension (parent(k) = (k-1) div 2,
    root 0) into root-to-node paths with depth and a decimal-exact
    running account-balance along each path.

    This is the org-chart / bill-of-materials query shape — the one
    relational idiom the DataFrame API cannot express without a
    driver-side loop; the recursive front-end keeps the iteration
    inside Catalyst (each step is a planned self-join, unioned to
    fixpoint). Depth is log2(|supplier|) so the recursion is shallow
    at ANY scale — 100 TB changes the per-step join width, not the
    number of steps; each step is a broadcast-able equi-join on the
    parent key. Oracle: the identical recursion in DuckDB; decimal
    accumulation keeps path sums bit-exact across engines.

    Reference parity: none — the reference has no recursive or
    hierarchical query surface at all; this is engine-surface parity
    with ANSI SQL:1999, not with the reference.
    """
    from concurrent_etl_spark.engine import register_temp_views

    register_temp_views(spark, sf_dir)
    return spark.sql(_HIERARCHY_SQL)


@query(
    "bitwise_agg_family",
    oracle="""
    SELECT o_orderpriority,
           CAST(bit_and(o_orderkey) AS BIGINT) AS key_and,
           CAST(bit_or(o_orderkey) AS BIGINT) AS key_or,
           CAST(bit_xor(o_orderkey) AS BIGINT) AS key_xor,
           CAST(bit_count(bit_xor(o_orderkey)) AS INTEGER) AS xor_popcount,
           COUNT(*) AS n
    FROM orders GROUP BY o_orderpriority
    """,
)
def q_bitwise_agg_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise aggregate family — bit_and / bit_or / bit_xor plus a
    popcount of the XOR digest. All three are associative and
    commutative, so they partial-aggregate map-side like SUM (the
    XOR aggregate doubles as a cheap order-invariant set digest:
    replaying a partition twice flips it, which is how it's used in
    shuffle-integrity checks). One scan, one low-cardinality
    shuffle; pure codegen long arithmetic.
    """
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.bit_and("o_orderkey").cast("bigint").alias("key_and"),
        F.bit_or("o_orderkey").cast("bigint").alias("key_or"),
        F.bit_xor("o_orderkey").cast("bigint").alias("key_xor"),
        F.bit_count(F.bit_xor("o_orderkey")).cast("int").alias("xor_popcount"),
        F.count("*").alias("n"),
    )


_PIPE_SQL = """
FROM lineitem
|> WHERE l_shipdate >= TIMESTAMP '1996-01-01'
   AND l_shipdate < TIMESTAMP '1997-01-01'
|> JOIN orders ON l_orderkey = o_orderkey
|> EXTEND CAST(round(l_extendedprice * (1 - l_discount), 6)
               AS DECIMAL(18,6)) AS net
|> AGGREGATE CAST(SUM(net) AS DOUBLE) AS revenue,
             COUNT(*) AS n_lines,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
               AS qty
   GROUP BY o_orderstatus, l_returnflag
|> SELECT o_orderstatus AS orderstatus, l_returnflag AS returnflag,
          revenue, n_lines, qty
"""


@query(
    "pipe_syntax_rollup",
    oracle="""
    SELECT o.o_orderstatus AS orderstatus, l.l_returnflag AS returnflag,
           CAST(SUM(CAST(round(l.l_extendedprice * (1 - l.l_discount), 6)
                         AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_lines,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS qty
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY o.o_orderstatus, l.l_returnflag
    """,
)
def q_pipe_syntax_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL pipe syntax (Spark 4, SPARK-49555): the same filter ->
    join -> extend -> aggregate rollup the DataFrame API chains,
    expressed as the `|>` pipeline the SQL front-end now parses —
    the third query-authoring surface next to classic ANSI
    (sql_interface_weekly_share) and WITH RECURSIVE
    (recursive_cte_hierarchy). Catalyst compiles pipe stages to the
    identical plan classic SQL gets (the parser desugars each stage;
    pushdown/broadcast/partial-agg properties all carry over), so
    this is front-end parity with zero execution cost — proven by
    hashing against the classic-SQL oracle with decimal-exact sums.
    """
    from concurrent_etl_spark.engine import register_temp_views

    register_temp_views(spark, sf_dir)
    return spark.sql(_PIPE_SQL)


@query(
    "er_blocked_fuzzy_match",
    oracle="""
    WITH dirty AS (
      SELECT c_custkey AS dirty_id, c_nationkey, c_mktsegment,
             substr(c_name, 1, CAST(9 + c_custkey % 9 AS INTEGER)) || 'X' ||
             substr(c_name, CAST(11 + c_custkey % 9 AS INTEGER)) AS dirty_name
      FROM customer WHERE c_custkey % 7 = 0),
    cand AS (
      SELECT d.dirty_id, m.c_custkey AS cand_id,
             levenshtein(d.dirty_name, m.c_name) AS dist
      FROM dirty d JOIN customer m
        ON d.c_nationkey = m.c_nationkey
       AND d.c_mktsegment = m.c_mktsegment
      WHERE levenshtein(d.dirty_name, m.c_name) <= 1),
    ranked AS (
      SELECT *,
             row_number() OVER (PARTITION BY dirty_id
                                ORDER BY dist, cand_id) AS rk,
             COUNT(*) OVER (PARTITION BY dirty_id) AS n_cand
      FROM cand)
    SELECT dirty_id, cand_id AS best_match,
           CAST(dist AS INTEGER) AS best_distance,
           CAST(n_cand AS BIGINT) AS n_candidates,
           dirty_id = cand_id AS correct
    FROM ranked WHERE rk = 1
    """,
)
def q_er_blocked_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution with blocking + edit-distance verify — the
    classic record-linkage shape (Fellegi-Sunter framing; blocking
    surveyed in Christen, "A Survey of Indexing Techniques for
    Scalable Record Linkage", TKDE 2012 — public literature): a
    deterministically dirtied batch (one name digit replaced by 'X',
    position keyed on the custkey) is resolved against the master
    customer table. Candidate pairs form ONLY within attribute
    blocks (nation x market segment); Levenshtein <= 1 verifies;
    per dirty record the best match is ranked (distance, then id)
    with the ambiguity count carried — mutating a digit makes every
    master differing only at that digit a distance-1 candidate, the
    real-world ambiguity an ER pipeline must adjudicate.

    Shape at 100 TB: the join is keyed on the BLOCK (never a cross
    join — the pair count is sum of |dirty_b| x |master_b| over
    blocks, controlled by block granularity); Levenshtein runs
    JVM-side on blocked pairs only; ranking is a window PARTITIONED
    by dirty record.
    """
    cust = load_table(spark, sf_dir, "customer")
    dirty = cust.where(F.col("c_custkey") % 7 == 0).select(
        F.col("c_custkey").alias("dirty_id"),
        "c_nationkey",
        "c_mktsegment",
        F.expr(
            "concat(substring(c_name, 1, cast(9 + c_custkey % 9 as int)),"
            " 'X', substring(c_name, cast(11 + c_custkey % 9 as int), 64))"
        ).alias("dirty_name"),
    )
    cand = (
        dirty.join(
            cust.select(
                F.col("c_custkey").alias("cand_id"),
                F.col("c_name").alias("m_name"),
                "c_nationkey",
                "c_mktsegment",
            ),
            ["c_nationkey", "c_mktsegment"],
        )
        .withColumn("dist", F.levenshtein("dirty_name", "m_name"))
        .where(F.col("dist") <= 1)
    )
    w = Window.partitionBy("dirty_id").orderBy("dist", "cand_id")
    wc = Window.partitionBy("dirty_id")
    return (
        cand.withColumn("rk", F.row_number().over(w))
        .withColumn("n_cand", F.count(F.lit(1)).over(wc))
        .where(F.col("rk") == 1)
        .select(
            "dirty_id",
            F.col("cand_id").alias("best_match"),
            F.col("dist").cast("int").alias("best_distance"),
            F.col("n_cand").cast("bigint").alias("n_candidates"),
            (F.col("dirty_id") == F.col("cand_id")).alias("correct"),
        )
    )


@query(
    "bloom_filter_probe_audit",
    oracle="""
    WITH keys AS (
      SELECT c_custkey AS k,
             c_mktsegment = 'BUILDING' AS member
      FROM customer),
    hashes AS (
      SELECT k, member, i,
             ('0x' || substr(md5('bf' || i || '_' || k), 1, 8))::BIGINT
               % 4096 AS pos
      FROM keys, unnest(range(0, 4)) u(i)),
    words AS (
      SELECT pos // 32 AS word,
             bit_or(CAST(1 AS BIGINT) << CAST(pos % 32 AS INTEGER))
               AS bits
      FROM hashes WHERE member GROUP BY 1),
    probe AS (
      SELECT h.k, h.member,
             CAST(SUM(CASE WHEN (COALESCE(w.bits, 0)
                                 & (CAST(1 AS BIGINT)
                                    << CAST(h.pos % 32 AS INTEGER)))
                            = (CAST(1 AS BIGINT)
                               << CAST(h.pos % 32 AS INTEGER))
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_hits
      FROM hashes h LEFT JOIN words w ON w.word = h.pos // 32
      GROUP BY 1, 2)
    SELECT CAST(SUM(CASE WHEN member THEN 1 ELSE 0 END) AS BIGINT)
             AS n_inserted,
           CAST(COUNT(*) AS BIGINT) AS n_probed,
           CAST(SUM(CASE WHEN n_hits = 4 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_maybe,
           CAST(SUM(CASE WHEN member AND n_hits < 4
                         THEN 1 ELSE 0 END) AS BIGINT)
             AS n_false_neg,
           CAST(SUM(CASE WHEN NOT member AND n_hits = 4
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_false_pos,
           CAST((SUM(CASE WHEN NOT member AND n_hits = 4
                          THEN 1 ELSE 0 END) * 2000000
                 + SUM(CASE WHEN NOT member THEN 1 ELSE 0 END))
                // (2 * SUM(CASE WHEN NOT member THEN 1 ELSE 0 END))
                AS BIGINT) AS fp_rate_e6
    FROM probe
    """,
)
def q_bloom_filter_probe_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Distributed Bloom filter build + probe with exact false-
    positive accounting — the runtime join-pruning primitive (Spark's
    own runtime row-group filters and semi-join pushdowns are Bloom
    filters; this query certifies the mechanics with a deterministic
    md5 hash family so both engines build bit-identical filters).

    Build: the 'BUILDING' customer segment is inserted into an
    m=4096-bit / k=4 filter materialized as <=128 32-bit-packed (word, bits) longs
    via a bit_or aggregation — the filter is A DATAFRAME, built in
    one shuffle, mergeable across partitions by construction (bit_or
    is commutative), never a driver-side bitmap. Probe: every
    customer checks its 4 word/mask pairs with a broadcast join
    against the word table; missing words read as 0. The audit
    proves: zero false negatives (a Bloom filter's hard guarantee —
    asserted as a COUNT, not a boolean, so any nonzero leaks into the
    hash), and the exact false-positive rate (e6 half-up) against
    ground-truth membership.

    Scale shape: filter size is constant (<=128 rows broadcast
    everywhere); build and probe are each one scan + one
    map-side-combinable agg. At 100 TB this is exactly how a
    dimension-built filter prunes a fact scan before a shuffle join.

    Reference parity: none — join-infrastructure surface (Bloom
    1970, public).
    """
    cust = load_table(spark, sf_dir, "customer")
    keys = cust.select(
        F.col("c_custkey").alias("k"),
        (F.col("c_mktsegment") == "BUILDING").alias("member"),
    )
    idx = spark.range(0, 4).select(F.col("id").cast("int").alias("i"))
    pos = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("bf"),
                        F.col("i").cast("string"),
                        F.lit("_"),
                        F.col("k").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 4096
    )
    hashes = keys.crossJoin(F.broadcast(idx)).select(
        "k", "member", pos.alias("pos")
    )
    mask = F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 32 AS INT))")
    words = (
        hashes.where("member")
        .groupBy(F.expr("pos div 32").alias("word"))
        .agg(F.bit_or(mask).alias("bits"))
    )
    probe = (
        hashes.withColumn("word", F.expr("pos div 32"))
        # broadcast-ok: bloom bit-words — at most m/32 = 128 rows
        .join(F.broadcast(words), "word", "left")
        .groupBy("k", "member")
        .agg(
            F.sum(
                F.when(
                    F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(mask)
                    == mask,
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_hits")
        )
    )
    maybe = F.col("n_hits") == 4
    neg = ~F.col("member")
    return probe.agg(
        F.sum(F.when(F.col("member"), 1).otherwise(0))
        .cast("long")
        .alias("n_inserted"),
        F.count(F.lit(1)).cast("long").alias("n_probed"),
        F.sum(F.when(maybe, 1).otherwise(0)).cast("long").alias("n_maybe"),
        F.sum(F.when(F.col("member") & ~maybe, 1).otherwise(0))
        .cast("long")
        .alias("n_false_neg"),
        F.sum(F.when(neg & maybe, 1).otherwise(0))
        .cast("long")
        .alias("n_false_pos"),
        F.expr(
            "CAST((SUM(CASE WHEN (NOT member) AND n_hits = 4"
            " THEN 1 ELSE 0 END) * 2000000"
            " + SUM(CASE WHEN NOT member THEN 1 ELSE 0 END))"
            " div (2 * SUM(CASE WHEN NOT member THEN 1 ELSE 0 END))"
            " AS BIGINT)"
        ).alias("fp_rate_e6"),
    )


_LATERAL_TOPK_SQL = """
SELECT c.c_custkey AS custkey, c.c_mktsegment AS segment,
       t.o_orderkey AS orderkey, t.rnk,
       t.cents AS order_cents
FROM customer c,
LATERAL (
      SELECT * FROM (
        SELECT o.o_orderkey,
               CAST(floor(o.o_totalprice * 100) AS BIGINT) AS cents,
               ROW_NUMBER() OVER (ORDER BY o.o_totalprice DESC,
                                  o.o_orderkey) AS rnk
        FROM orders o
        WHERE o.o_custkey = c.c_custkey) r
      WHERE r.rnk <= 2
    ) t
WHERE c.c_custkey % 10 = 0
"""


@query(
    "lateral_topk_per_entity",
    oracle="""
    SELECT c.c_custkey AS custkey, c.c_mktsegment AS segment,
           t.o_orderkey AS orderkey, CAST(t.rnk AS BIGINT) AS rnk,
           t.cents AS order_cents
    FROM customer c,
    LATERAL (
      SELECT * FROM (
        SELECT o.o_orderkey,
               CAST(floor(o.o_totalprice * 100) AS BIGINT) AS cents,
               ROW_NUMBER() OVER (ORDER BY o.o_totalprice DESC,
                                  o.o_orderkey) AS rnk
        FROM orders o
        WHERE o.o_custkey = c.c_custkey) r
      WHERE r.rnk <= 2
    ) t
    WHERE c.c_custkey % 10 = 0
    """,
)
def q_lateral_topk_per_entity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery through the SQL front-end: each
    sampled customer's top-2 orders by value, written as the
    for-each-row-run-a-subquery shape analysts actually type — the
    LAST major ANSI join form the catalog had not exercised (Spark 4
    supports lateral correlated subqueries natively; inner-join
    semantics drop order-less customers).

    Catalyst DECORRELATES the lateral into the same
    partitioned-window + filter plan `window_topk_per_group` builds
    by hand (no per-row re-execution survives — verify with
    .explain: one shuffle on custkey, one Window, no nested loops),
    which is exactly why the form is safe at 100 TB while a naive
    row-at-a-time interpretation would be 1.5M subquery runs per SF.
    The rank tiebreak (price DESC, orderkey) makes top-2 exact.

    Reference parity: none (the reference has no subquery surface);
    completes the correlated family: scalar_subquery_filter (scalar),
    exists_correlated (EXISTS), this (LATERAL relation).
    """
    from concurrent_etl_spark.engine import register_temp_views

    register_temp_views(spark, sf_dir)
    return spark.sql(_LATERAL_TOPK_SQL).select(
        "custkey",
        "segment",
        "orderkey",
        F.col("rnk").cast("long").alias("rnk"),
        "order_cents",
    )


def _lpa_prefix_sql() -> str:
    """The LPA CTE chain (shared with _lpa_sql) up to l2."""
    pick = (
        "SELECT node, lbl FROM ("
        "SELECT node, lbl, ROW_NUMBER() OVER (PARTITION BY node "
        "ORDER BY wt DESC, lbl) AS rn FROM {src}) WHERE rn = 1"
    )
    return f"""
    raw AS (
      SELECT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
    cw AS (SELECT src, dst, COUNT(*) AS w FROM raw GROUP BY 1, 2),
    ew AS (SELECT src, dst, w FROM cw
           UNION ALL SELECT dst AS src, src AS dst, w FROM cw),
    l0 AS (SELECT DISTINCT src AS node, src AS lbl FROM ew),
    v1 AS (SELECT e.src AS node, l.lbl, SUM(e.w) AS wt
           FROM ew e JOIN l0 l ON l.node = e.dst GROUP BY 1, 2),
    l1 AS ({pick.format(src='v1')}),
    v2 AS (SELECT e.src AS node, l.lbl, SUM(e.w) AS wt
           FROM ew e JOIN l1 l ON l.node = e.dst GROUP BY 1, 2),
    l2 AS ({pick.format(src='v2')})"""


@query(
    "modularity_communities_eval",
    oracle=f"""
    WITH {_lpa_prefix_sql()},
    m2 AS (SELECT CAST(SUM(w) AS BIGINT) AS m2 FROM ew),
    deg AS (SELECT src AS node, CAST(SUM(w) AS BIGINT) AS d
            FROM ew GROUP BY 1),
    cdeg AS (
      SELECT l.lbl AS community, CAST(SUM(deg.d) AS BIGINT) AS d_c,
             CAST(COUNT(*) AS BIGINT) AS n_nodes
      FROM deg JOIN l2 l ON l.node = deg.node GROUP BY 1),
    cin AS (
      SELECT la.lbl AS community, CAST(SUM(e.w) AS BIGINT) AS w_in
      FROM ew e JOIN l2 la ON la.node = e.src
                JOIN l2 lb ON lb.node = e.dst
      WHERE la.lbl = lb.lbl GROUP BY 1),
    contrib AS (
      SELECT cd.community, cd.n_nodes, cd.d_c,
             COALESCE(cin.w_in, 0) AS w_in,
             CAST(COALESCE(cin.w_in, 0) AS DECIMAL(38,0)) * m2.m2
               - CAST(cd.d_c AS DECIMAL(38,0)) * cd.d_c AS num
      FROM cdeg cd LEFT JOIN cin ON cin.community = cd.community
      CROSS JOIN m2),
    q AS (
      SELECT CAST(round(CAST(SUM(num) AS DOUBLE) * 1000000000
                        / (CAST(m2.m2 AS DOUBLE) * m2.m2)) AS BIGINT)
               AS modularity_e9
      FROM contrib, m2 GROUP BY m2.m2)
    SELECT c.community, c.n_nodes, c.d_c, CAST(c.w_in AS BIGINT) AS w_in,
           CAST(CAST(c.num AS DECIMAL(38,0)) AS VARCHAR) AS contrib_str,
           q.modularity_e9
    FROM contrib c, q
    """,
)
def q_modularity_communities_eval(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Newman modularity of the label-propagation communities — the
    standard 'was this partition any good' score for a community
    detector, carried exactly: Q*(2m)^2 = sum_c [w_in(c)*2m -
    d(c)^2] is pure integer arithmetic (DECIMAL(38,0) products), and
    modularity_e9 is ONE double division of exact operands at the
    end. Per-community contributions are also emitted exactly (as
    strings — pandas narrows DECIMAL(38,0)), so a reviewer can see
    WHICH communities carry the structure.

    Reuses the same deterministic 2-round LPA as
    label_propagation_communities (operators/graph.py) — this query
    is its EVALUATOR, the graph analogue of what
    ann_recall_eval/langid_confusion_eval do for their operators.

    Scale shape: degrees and internal-edge weights are each one
    map-side-combinable agg over the edge list joined to the
    node-sized label table (two broadcastable label joins); the
    community table is bounded by community count. 2m enters as a
    broadcast scalar.

    Reference parity: none — public formula (Newman & Girvan 2004).
    """
    from concurrent_etl_spark.operators.graph import label_propagation

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    raw = orders.join(li, orders["o_orderkey"] == li["l_orderkey"]).select(
        (F.col("o_custkey") * 2).alias("src"),
        (F.col("l_suppkey") * 2 + 1).alias("dst"),
    )
    cw = raw.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("w"))
    ew = cw.unionByName(
        cw.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "w"
        )
    ).localCheckpoint(eager=True)
    labels = label_propagation(ew, rounds=2)
    m2 = ew.agg(F.sum("w").cast("long").alias("m2"))
    deg = ew.groupBy("src").agg(F.sum("w").cast("long").alias("d"))
    cdeg = (
        deg.join(labels, deg["src"] == labels["node"])
        .groupBy(F.col("lbl").alias("community"))
        .agg(
            F.sum("d").cast("long").alias("d_c"),
            F.count(F.lit(1)).cast("long").alias("n_nodes"),
        )
    )
    la = labels.select(F.col("node").alias("src"), F.col("lbl").alias("ca"))
    lb = labels.select(F.col("node").alias("dst"), F.col("lbl").alias("cb"))
    cin = (
        ew.join(la, "src")
        .join(lb, "dst")
        .where(F.col("ca") == F.col("cb"))
        .groupBy(F.col("ca").alias("community"))
        .agg(F.sum("w").cast("long").alias("w_in"))
    )
    contrib = (
        cdeg.join(cin, "community", "left")
        .crossJoin(F.broadcast(m2))
        .select(
            "community",
            "n_nodes",
            "d_c",
            F.coalesce(F.col("w_in"), F.lit(0)).cast("long").alias("w_in"),
            (
                F.coalesce(F.col("w_in"), F.lit(0)).cast("decimal(38,0)")
                * F.col("m2")
                - F.col("d_c").cast("decimal(38,0)") * F.col("d_c")
            )
            .cast("decimal(38,0)")
            .alias("num"),
            "m2",
        )
    )
    q = contrib.agg(
        F.round(
            F.sum("num").cast("double")
            * 1000000000
            / (F.max("m2").cast("double") * F.max("m2"))
        )
        .cast("long")
        .alias("modularity_e9")
    )
    return contrib.crossJoin(F.broadcast(q)).select(
        "community",
        "n_nodes",
        "d_c",
        "w_in",
        F.col("num").cast("string").alias("contrib_str"),
        "modularity_e9",
    )


@query(
    "k_anonymity_audit",
    oracle="""
    WITH qi AS (
      SELECT c_mktsegment AS segment, c_nationkey AS nationkey,
             CASE WHEN c_acctbal < 0 THEN 'neg'
                  WHEN c_acctbal < 5000 THEN 'mid'
                  ELSE 'high' END AS sensitive
      FROM customer),
    grp AS (
      SELECT segment, nationkey,
             CAST(COUNT(*) AS BIGINT) AS grp_size,
             CAST(COUNT(DISTINCT sensitive) AS BIGINT) AS l_div
      FROM qi GROUP BY segment, nationkey),
    tot AS (SELECT CAST(SUM(grp_size) AS BIGINT) AS n FROM grp)
    SELECT CAST(5 AS BIGINT) AS k,
           tot.n AS n_rows,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(MIN(grp_size) AS BIGINT) AS min_group,
           CAST(SUM(CASE WHEN grp_size < 5 THEN grp_size ELSE 0 END)
                AS BIGINT) AS n_rows_violating,
           CAST((SUM(CASE WHEN grp_size < 5 THEN grp_size ELSE 0 END)
                 * 2000000 + tot.n) // (2 * tot.n) AS BIGINT)
             AS violation_rate_e6,
           CAST(MIN(l_div) AS BIGINT) AS min_l_diversity,
           CAST(SUM(CASE WHEN l_div < 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_groups_l_homogeneous
    FROM grp, tot GROUP BY tot.n
    """,
)
def q_k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity / l-diversity release audit (Sweeney 2002;
    Machanavajjhala et al. 2007 — public): treat (segment, nation) as
    the quasi-identifier, bucketed balance as the sensitive
    attribute, and report the re-identification surface of a would-be
    data release — rows in QI groups smaller than k=5 (linkable) and
    QI groups where the sensitive value is homogeneous (l < 2:
    membership alone discloses the attribute). The governance gate
    that sits beside gdpr_erasure_audit and pii_redaction in a
    release pipeline.

    All counts exact; the violation rate is the e6 half-up ratio.

    Scale shape: ONE map-side-combinable groupBy over the
    QI-cardinality-bounded group domain (|segments| x |nations|),
    then constant-size algebra. COUNT(DISTINCT sensitive) inside the
    group agg expands to the standard two-level aggregate — still
    QI-bounded. At 100 TB this audit costs one scan.

    Reference parity: none — data-governance surface.
    """
    cust = load_table(spark, sf_dir, "customer")
    qi = cust.select(
        F.col("c_mktsegment").alias("segment"),
        F.col("c_nationkey").alias("nationkey"),
        F.when(F.col("c_acctbal") < 0, "neg")
        .when(F.col("c_acctbal") < 5000, "mid")
        .otherwise("high")
        .alias("sensitive"),
    )
    grp = qi.groupBy("segment", "nationkey").agg(
        F.count(F.lit(1)).cast("long").alias("grp_size"),
        F.countDistinct("sensitive").cast("long").alias("l_div"),
    )
    # the trailing .where mirrors the oracle's GROUP BY tot.n over an
    # empty group table: no release to audit -> zero rows, not a row
    # of NULL counts
    return grp.agg(
        F.lit(5).cast("long").alias("k"),
        F.sum("grp_size").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.min("grp_size").cast("long").alias("min_group"),
        F.sum(
            F.when(F.col("grp_size") < 5, F.col("grp_size")).otherwise(0)
        )
        .cast("long")
        .alias("n_rows_violating"),
        F.expr(
            "CAST((SUM(CASE WHEN grp_size < 5 THEN grp_size ELSE 0 END)"
            " * 2000000 + SUM(grp_size)) div (2 * SUM(grp_size))"
            " AS BIGINT)"
        ).alias("violation_rate_e6"),
        F.min("l_div").cast("long").alias("min_l_diversity"),
        F.sum(F.when(F.col("l_div") < 2, 1).otherwise(0))
        .cast("long")
        .alias("n_groups_l_homogeneous"),
    ).where(F.col("n_rows").isNotNull() & (F.col("n_rows") > 0))
