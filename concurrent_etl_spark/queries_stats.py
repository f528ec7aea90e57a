"""Statistical aggregate surface: bounded-error approx percentile and
exact-moment bivariate statistics.

Extends the univariate moments of ``stats_moments`` (mean/variance)
with (a) the sketch-vs-exact percentile contract — the same
self-verifying pattern as ``approx_distinct_bounded`` (HLL) and
``ann_recall_eval`` (IVF): Spark runs BOTH the exact and the
approximate path and asserts the error bound inside the result, so the
oracle hash fails if the sketch ever drifts — and (b) correlation /
covariance / regression slope derived from exact DECIMAL cross-moments
so the doubles are bit-identical cross-engine (built-in ``corr`` /
``covar_samp`` accumulate floats in partition order and would not be).

The reference has no statistics at all (SURVEY §2.4 — its only
aggregate is COUNT); this is engine surface the training-data
pipeline needs for corpus profiling and drift checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from concurrent_etl_spark.catalog import query
from concurrent_etl_spark.engine import load_table
from concurrent_etl_spark.operators.text import ascii_fold, fold_sql


@query(
    "approx_median_bounded",
    oracle="""
    WITH ranked AS (
      SELECT l_returnflag AS returnflag, l_extendedprice,
             ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                ORDER BY l_extendedprice) AS rn,
             COUNT(*) OVER (PARTITION BY l_returnflag) AS n
      FROM lineitem)
    SELECT returnflag, CAST(n AS BIGINT) AS n,
           l_extendedprice AS exact_median,
           TRUE AS approx_ok
    FROM ranked
    WHERE rn = CAST(floor((n + 1) / 2) AS BIGINT)
    """,
)
def q_approx_median_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate median with a verified rank-error bound.

    Spark computes the exact lower median (value at rank
    floor((n+1)/2) — value-at-rank is well-defined even with
    duplicate prices) AND ``approx_percentile(…, 0.5, accuracy=100)``
    per group, then counts how many rows sit at or below the approx
    value: the flag asserts |rank(approx) − n/2| ≤ 6 % · n (the
    sketch guarantees 1 % = n/accuracy; the margin covers the ≤ vs <
    rank convention). The oracle pins group, n, exact median, and
    expects the flag TRUE.

    Scale note: the exact path needs a per-group total order — at
    100 TB you would run ONLY the approx path (one pass, mergeable
    sketches); this query exists to certify that path at test scale,
    exactly like ann_recall_eval does for IVF.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("returnflag"), "l_extendedprice"
    )
    w = Window.partitionBy("returnflag").orderBy("l_extendedprice")
    wn = Window.partitionBy("returnflag")
    exact = (
        li.withColumn("rn", F.row_number().over(w))
        .withColumn("n", F.count("*").over(wn))
        .where(F.col("rn") == F.floor((F.col("n") + 1) / 2).cast("long"))
        .select("returnflag", "n", F.col("l_extendedprice").alias("exact_median"))
    )
    approx = li.groupBy("returnflag").agg(
        F.expr("approx_percentile(l_extendedprice, 0.5, 100)").alias("_approx")
    )
    below = (
        # broadcast-ok: one row per returnflag (3-value enum)
        li.join(F.broadcast(approx), "returnflag")
        .groupBy("returnflag")
        .agg(
            F.sum(
                F.when(F.col("l_extendedprice") <= F.col("_approx"), 1).otherwise(0)
            ).alias("_cnt_le")
        )
    )
    return (
        # broadcast-ok: one row per returnflag (3-value enum)
        exact.join(F.broadcast(below), "returnflag")
        .select(
            "returnflag",
            "n",
            "exact_median",
            (
                F.abs(F.col("_cnt_le") - F.col("n") / 2.0)
                <= 0.06 * F.col("n")
            ).alias("approx_ok"),
        )
    )


@query(
    "corr_family_exact",
    oracle="""
    WITH m AS (
      SELECT l_returnflag AS returnflag, COUNT(*) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sy,
             -- DECIMAL(19,4) operands force DuckDB onto int128
             -- storage (int64 DECIMAL(18) overflows on the squares);
             -- the values are exact either way and match Spark's
             -- DECIMAL(37,8) products bit-for-bit after the cast
             CAST(SUM(CAST(l_quantity AS DECIMAL(19,4))
                      * CAST(l_quantity AS DECIMAL(19,4))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(19,4))
                      * CAST(l_extendedprice AS DECIMAL(19,4))) AS DOUBLE) AS syy,
             CAST(SUM(CAST(l_quantity AS DECIMAL(19,4))
                      * CAST(l_extendedprice AS DECIMAL(19,4))) AS DOUBLE) AS sxy
      FROM lineitem GROUP BY 1)
    SELECT returnflag, n,
           (sxy - sx * sy / n) / (n - 1) AS covar_qp,
           (n * sxy - sx * sy)
             / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)) AS corr_qp,
           (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope_price_per_qty
    FROM m
    """,
)
def q_corr_family_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bivariate statistics (covariance, Pearson correlation, OLS
    slope) of quantity vs extended price per return flag, computed
    from five exact DECIMAL cross-moments in ONE aggregation pass.

    Deterministic by construction: decimal sums are partition-
    invariant; the closed-form expressions then apply identical IEEE
    double arithmetic on both engines. One shuffle on the 3-value
    group key; map-side partials do almost all the work — the shape
    that holds at 100 TB (built-in corr/covar_samp would be the same
    plan but accumulate floats in partition order, breaking the
    cross-engine hash).
    """
    li = load_table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("decimal(18,4)")
    y = F.col("l_extendedprice").cast("decimal(18,4)")
    m = li.groupBy(F.col("l_returnflag").alias("returnflag")).agg(
        F.count("*").alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(x * x).cast("double").alias("sxx"),
        F.sum(y * y).cast("double").alias("syy"),
        F.sum(x * y).cast("double").alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    return m.select(
        "returnflag",
        "n",
        ((sxy - sx * sy / n) / (n - 1)).alias("covar_qp"),
        (
            (n * sxy - sx * sy)
            / (F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy))
        ).alias("corr_qp"),
        ((n * sxy - sx * sy) / (n * sxx - sx * sx)).alias("slope_price_per_qty"),
    )


#: Benford first-digit probabilities log10(1 + 1/d), rounded to 9 dp —
#: fixed public constants so both engines compare against identical
#: literals (no transcendental evaluation in either engine)
_BENFORD = {
    1: 0.301029996, 2: 0.176091259, 3: 0.124938737,
    4: 0.096910013, 5: 0.079181246, 6: 0.066946790,
    7: 0.057991947, 8: 0.051152522, 9: 0.045757491,
}


def _benford_case(col: str) -> str:
    return (
        "CASE " + " ".join(
            f"WHEN {col} = {d} THEN CAST({p!r} AS DOUBLE)"
            for d, p in _BENFORD.items()
        ) + " END"
    )


@query(
    "benford_digit_audit",
    oracle=f"""
    WITH d AS (
      SELECT CAST(substr(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR),
                  1, 1) AS BIGINT) AS digit
      FROM orders WHERE o_totalprice >= 1),
    c AS (SELECT digit, COUNT(*) AS n FROM d GROUP BY 1),
    t AS (SELECT SUM(n) AS total FROM c)
    SELECT digit, CAST(n AS BIGINT) AS n,
           ROUND(CAST(n AS DOUBLE) / t.total, 9) AS observed,
           {_benford_case('digit')} AS expected,
           ROUND(CAST(n AS DOUBLE) / t.total
                 - {_benford_case('digit')}, 9) AS deviation
    FROM c, t
    """,
)
def q_benford_digit_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit over order amounts — the
    classic fabricated-data / unit-mismatch forensic: natural
    multi-magnitude amounts follow log10(1+1/d); synthetic uniform
    amounts (like this generator's) deviate hugely, and the audit
    SHOWS that — the deviation column is the finding, not a bug.
    Digit extraction goes through DECIMAL(18,2) string form so both
    engines see identical renderings; expected frequencies are
    shared public constants (no transcendental evaluation). One
    9-group aggregation; scale cost is the scan.
    """
    o = load_table(spark, sf_dir, "orders").where(F.col("o_totalprice") >= 1)
    d = o.select(
        F.substring(
            F.col("o_totalprice").cast("decimal(18,2)").cast("string"), 1, 1
        )
        .cast("bigint")
        .alias("digit")
    )
    c = d.groupBy("digit").agg(F.count("*").alias("n"))
    total = c.agg(F.sum("n").alias("total"))
    expected = F.expr(_benford_case("digit"))
    return c.crossJoin(F.broadcast(total)).select(
        "digit",
        F.col("n").cast("bigint").alias("n"),
        F.round(F.col("n").cast("double") / F.col("total"), 9).alias(
            "observed"
        ),
        expected.alias("expected"),
        F.round(
            F.col("n").cast("double") / F.col("total") - expected, 9
        ).alias("deviation"),
    )


@query(
    "hll_partial_merge_bounded",
    oracle="""
    WITH halves AS (
      SELECT o_orderstatus AS status, o_custkey,
             o_orderkey % 2 AS half
      FROM orders),
    exact AS (
      SELECT status,
             CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_exact
      FROM halves GROUP BY status)
    SELECT status, n_exact, TRUE AS merged_within_5pct
    FROM exact
    """,
)
def q_hll_partial_merge_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MERGEABLE-sketch law under the gate: per-status HLL
    sketches (DataSketches ``hll_sketch_agg``) are built on two
    DISJOINT halves of orders, union-merged with ``hll_union``, and
    the merged estimate must land within 5% of the exact distinct
    count — asserted IN the result, so a drifting merge fails the
    hash. Mergeability is the property that makes 100 TB distinct
    counting a map-side-combinable aggregation plus a tiny partial
    merge (and lets stored per-day sketch partials answer any-range
    cardinality without rescanning history) — the same merge law
    ``incremental_agg_merge`` pins for sums, extended to the
    sketch family (KMV/CMS/HLL).
    """
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderstatus").alias("status"),
        "o_custkey",
        (F.col("o_orderkey") % 2).alias("half"),
    )
    parts = o.groupBy("status", "half").agg(
        F.hll_sketch_agg("o_custkey").alias("sk")
    )
    merged = parts.groupBy("status").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("n_merged")
    )
    exact = o.groupBy("status").agg(
        F.count_distinct("o_custkey").cast("bigint").alias("n_exact")
    )
    return exact.join(merged, "status").select(
        "status",
        "n_exact",
        (
            F.abs(F.col("n_merged") - F.col("n_exact"))
            / F.col("n_exact")
            <= 0.05
        ).alias("merged_within_5pct"),
    )


# ---------------------------------------------------------------------------
# grouped-aggregate pandas UDAF — the custom-aggregator point of §2.9
# ---------------------------------------------------------------------------

@query(
    "grouped_agg_pandas_udaf",
    oracle="""
    WITH c AS (
      SELECT c_nationkey,
             CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS cents
      FROM customer),
    med AS (
      SELECT c_nationkey,
             CAST(COUNT(*) AS BIGINT) AS n_customers,
             CAST(quantile_disc(cents, 0.5) AS BIGINT) AS median_cents
      FROM c GROUP BY c_nationkey),
    mad AS (
      SELECT c.c_nationkey,
             CAST(quantile_disc(abs(c.cents - m.median_cents), 0.5)
                  AS BIGINT) AS mad_cents
      FROM c JOIN med m USING (c_nationkey)
      GROUP BY c.c_nationkey)
    SELECT CAST(med.c_nationkey AS BIGINT) AS nationkey,
           med.n_customers, med.median_cents, mad.mad_cents
    FROM med JOIN mad ON med.c_nationkey = mad.c_nationkey
    """,
)
def q_grouped_agg_pandas_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom aggregators via GROUPED_AGG pandas UDFs — the last §2.9
    Python-boundary form (scalar pandas_udf, applyInPandas,
    mapInPandas, mapInArrow, UDTF, applyInPandasWithState, and
    cogrouped-map are all already exercised elsewhere): per-nation
    LOWER MEDIAN of customer balances (in exact integer cents) and
    the median absolute deviation around it — MAD is a genuinely
    UDAF-shaped statistic (a nested median no built-in aggregate
    expresses).

    Determinism: the lower-median convention (element at sorted
    index (n-1)//2) is tie- and order-exact — no interpolated
    averages, no float accumulation; DuckDB's quantile_disc(0.5)
    implements the identical pick.

    Spark refuses to mix GROUPED_AGG pandas UDFs with built-in
    aggregates in one agg (INVALID_PANDAS_UDF_PLACEMENT), so the
    row count is also a UDAF here. Scale: Arrow-batched per-group
    reduction — one shuffle on the group key, each group's series
    folded vectorized in a single Python worker pass; groups are
    nation-sized (bounded), so no per-key skew concern.
    """
    from concurrent_etl_spark.functions.udafs import (
        lower_median,
        mad_lower,
        n_rows,
    )

    cust = load_table(spark, sf_dir, "customer")
    cents = (F.col("c_acctbal").cast("decimal(18,2)") * 100).cast("long")
    return (
        cust.select(
            F.col("c_nationkey").cast("long").alias("nationkey"),
            cents.alias("cents"),
        )
        .groupBy("nationkey")
        .agg(
            n_rows(F.col("cents")).alias("n_customers"),
            lower_median(F.col("cents")).alias("median_cents"),
            mad_lower(F.col("cents")).alias("mad_cents"),
        )
    )


# ---------------------------------------------------------------------------
# Hypothesis-test / time-series tranche (round 4): chi-square
# independence, two-sample Kolmogorov-Smirnov, Mann-Whitney U, and
# autocorrelation — the inferential half of corpus drift monitoring
# (kl_mixture_drift measures divergence; these attach test statistics).
# The reference has no statistics at all (SURVEY §2.4); this is engine
# surface a 100 TB curation pipeline needs to decide whether a new
# crawl slice differs from the corpus it joins.
#
# Determinism: every statistic is carried as exact integers (counts,
# cents, scaled cross-moments in DECIMAL(38,0)) until one final
# division, which either stays integral (the (2a+b) div 2b half-up
# trick on nonnegative longs) or is a single IEEE double division
# rounded to a fixed scale — bit-identical cross-engine either way.
# ---------------------------------------------------------------------------


def _cum_by_value(pv: DataFrame, width_bits: int = 20):
    """Global cumulative counts over a per-distinct-value table
    WITHOUT a global window.

    ``pv`` has one row per distinct value: (v long, a long, t long)
    — ``a`` = group-1 count, ``t`` = total count at that value.
    Returns (v, a, t, cum_a, cum_t) where cum_* are inclusive
    running sums in global ``v`` order.

    Scale shape: values are bucketed by ``v div 2^width_bits``; the
    per-bucket totals are collected (BOUNDED: bucket count is
    value-range / 2^20 — price-domain-bounded, ~60 buckets at every
    SF, independent of row count) and turned into driver-side
    offsets; the running sum inside each bucket is a PARTITIONED
    window. This is the same partition-offset cumsum
    ``global_id_assignment`` uses to number rows without a global
    sort — no single-task total order anywhere.
    """
    from pyspark.sql import Window

    width = 1 << width_bits
    # persist: the caller's pv pipeline (often a multi-join pair
    # build, e.g. Theil-Sen's 2.9M pairwise slopes at sf0.1) would
    # otherwise be re-evaluated by BOTH the bucket-totals collect
    # below and every downstream consumer of the returned frame —
    # measured 3 full evaluations in theilsen_robust_slope (25-45 s
    # -> the persisted pv is computed once). Harness clearCache()'s
    # per query, per the catalog persist convention.
    pv = pv.withColumn("bucket", F.expr(f"v div {width}")).persist()
    totals = sorted(
        pv.groupBy("bucket")
        .agg(F.sum("a").alias("ba"), F.sum("t").alias("bt"))
        .collect(),
        key=lambda r: r["bucket"],
    )
    offs: list[tuple[int, int, int]] = []
    acc_a = acc_t = 0
    for r in totals:
        offs.append((r["bucket"], acc_a, acc_t))
        acc_a += r["ba"]
        acc_t += r["bt"]
    w = Window.partitionBy("bucket").orderBy("v")
    if not offs:
        # empty input: F.create_map() with zero args is map<void,void>
        # and map_a[bucket] fails ANALYSIS — the zero-offset window
        # sum alone is the (vacuously correct) cumsum over no rows
        return pv.select(
            "v", "a", "t",
            F.sum("a").over(w).alias("cum_a"),
            F.sum("t").over(w).alias("cum_t"),
        )
    # bucket offsets re-attach via a BROADCAST-JOINED offsets table,
    # not a create_map literal: GetMapValue on a literal map is a
    # LINEAR scan of the entries per row, and the bucket count is
    # value-domain-driven — Theil-Sen's 33-bit buckets over the
    # slope domain produced ~1.1k entries, so the map probe alone
    # cost ~550 comparisons/row across 2.9M rows (measured 9.6 s for
    # the median pass at sf0.1; the hash-join form is ~1 s). The
    # offsets frame is bounded exactly like the collect above.
    offs_df = pv.sparkSession.createDataFrame(
        offs, "bucket long, _off_a long, _off_t long"
    )
    return pv.join(F.broadcast(offs_df), "bucket").select(
        "v",
        "a",
        "t",
        (F.col("_off_a") + F.sum("a").over(w)).alias("cum_a"),
        (F.col("_off_t") + F.sum("t").over(w)).alias("cum_t"),
    )


@query(
    "ks_two_sample",
    oracle="""
    WITH vals AS (
      SELECT CASE WHEN c.c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS g,
             CAST(floor(o.o_totalprice * 100) AS BIGINT) AS v
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      WHERE c.c_mktsegment IN ('BUILDING', 'MACHINERY')),
    tot AS (
      SELECT CAST(SUM(g) AS BIGINT) AS n1,
             CAST(SUM(1 - g) AS BIGINT) AS n2
      FROM vals),
    pv AS (
      SELECT v, SUM(g) AS a, COUNT(*) AS t FROM vals GROUP BY v),
    cum AS (
      SELECT SUM(a) OVER (ORDER BY v) AS c1,
             SUM(t - a) OVER (ORDER BY v) AS c2
      FROM pv)
    SELECT n1, n2,
           CAST(MAX(abs(c1 * n2 - c2 * n1)) AS BIGINT) AS ks_num,
           CAST((MAX(abs(c1 * n2 - c2 * n1)) * 2000000 + n1 * n2)
                // (2 * n1 * n2) AS BIGINT) AS ks_e6
    FROM cum, tot
    WHERE n1 > 0 AND n2 > 0
    GROUP BY n1, n2
    """,
)
def q_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov D between the order-value
    distributions of two customer segments.

    D = max_v |F1(v) - F2(v)| has the integer identity
    max |c1(v)*n2 - c2(v)*n1| / (n1*n2), so the whole statistic is
    carried in exact longs: per-distinct-value counts (one shuffle),
    global cumulative counts via the bucket-offset cumsum (bounded
    ~60-row collect, partitioned windows only — no global sort), one
    max aggregate. ks_e6 = round(1e6*D) computed with the integral
    half-up trick (num*2e6 + den) div (2*den) — nonnegative, so
    DuckDB's truncating // and Spark's div agree exactly. Long
    arithmetic is safe while n1*n2*2e6 < 2^63, i.e. groups up to
    ~2.1e6 rows each at the gate scales; beyond that the same
    expressions promote to DECIMAL(38,0).

    The oracle states the same identity with DuckDB's (single-node,
    legal there) global cumulative window as the independent spec.

    Reference parity: no inferential statistics exist in the
    reference (SURVEY §2.4 — COUNT is its only aggregate); this is
    corpus-drift surface for the training-data pipeline.
    """
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    vals = (
        orders.join(
            cust.where(
                F.col("c_mktsegment").isin("BUILDING", "MACHINERY")
            ).select("c_custkey", "c_mktsegment"),
            orders["o_custkey"] == F.col("c_custkey"),
        )
        .select(
            F.when(F.col("c_mktsegment") == "BUILDING", 1)
            .otherwise(0)
            .cast("long")
            .alias("g"),
            F.floor(F.col("o_totalprice") * 100).cast("long").alias("v"),
        )
    )
    tot = vals.agg(
        F.sum("g").cast("long").alias("n1"),
        F.sum(F.lit(1) - F.col("g")).cast("long").alias("n2"),
    )
    pv = vals.groupBy("v").agg(
        F.sum("g").alias("a"), F.count(F.lit(1)).alias("t")
    )
    cum = _cum_by_value(pv).crossJoin(F.broadcast(tot))
    diff = F.abs(
        F.col("cum_a") * F.col("n2")
        - (F.col("cum_t") - F.col("cum_a")) * F.col("n1")
    )
    return (
        cum.select("n1", "n2", diff.alias("d"))
        # KS is undefined without both samples; also guards the
        # integral div's n1*n2 denominator (zero rows, both engines)
        .where((F.col("n1") > 0) & (F.col("n2") > 0))
        .groupBy("n1", "n2")
        .agg(F.max("d").alias("ks_num"))
        .select(
            "n1",
            "n2",
            F.col("ks_num").cast("long").alias("ks_num"),
            F.expr(
                "CAST((ks_num * 2000000 + n1 * n2) div (2 * n1 * n2)"
                " AS BIGINT)"
            ).alias("ks_e6"),
        )
    )


@query(
    "mann_whitney_u",
    oracle="""
    WITH vals AS (
      SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS g,
             CAST(floor(o_totalprice * 100) AS BIGINT) AS v
      FROM orders
      WHERE o_orderpriority IN ('1-URGENT', '5-LOW')),
    tot AS (
      SELECT CAST(SUM(g) AS BIGINT) AS n1,
             CAST(SUM(1 - g) AS BIGINT) AS n2
      FROM vals),
    pv AS (
      SELECT v, SUM(g) AS a, COUNT(*) AS t FROM vals GROUP BY v),
    cum AS (
      SELECT a, t, SUM(t) OVER (ORDER BY v) AS ct FROM pv),
    sums AS (
      SELECT CAST(SUM(a * (2 * (ct - t) + t + 1)) AS BIGINT) AS r1_x2,
             CAST(SUM((t - a) * (2 * (ct - t) + t + 1)) AS BIGINT) AS r2_x2,
             CAST(SUM(t * t * t - t) AS BIGINT) AS ties_cubed
      FROM cum)
    SELECT n1, n2, r1_x2,
           CAST(r1_x2 - n1 * (n1 + 1) AS BIGINT) AS u1_x2,
           CAST(2 * n1 * n2 - (r1_x2 - n1 * (n1 + 1)) AS BIGINT) AS u2_x2,
           ties_cubed,
           r1_x2 + r2_x2 = (n1 + n2) * (n1 + n2 + 1) AS rank_sum_ok
    FROM sums, tot
    WHERE n1 > 0 AND n2 > 0
    """,
)
def q_mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U (rank-sum) test statistic, exact with ties,
    between URGENT and LOW priority order values.

    Average ranks under ties are half-integers, so everything is
    carried as 2x-scaled exact longs: for a distinct value with
    group-1 count a, total count t and strictly-smaller total count
    cb = ct - t, each member's doubled average rank is
    2*cb + t + 1, giving R1_x2 = sum a*(2*cb + t + 1) from the same
    bucket-offset cumulative machinery as ks_two_sample (bounded
    collect + partitioned windows, never a global sort).
    U1_x2 = R1_x2 - n1*(n1+1); ties_cubed = sum(t^3 - t) is the
    exact tie-correction numerator the normal approximation needs.
    rank_sum_ok asserts the computed cumsums satisfy the rank-sum
    identity R1 + R2 = N(N+1)/2 — a real end-to-end invariant, not
    true by construction of the output expressions.
    """
    orders = load_table(spark, sf_dir, "orders")
    vals = orders.where(
        F.col("o_orderpriority").isin("1-URGENT", "5-LOW")
    ).select(
        F.when(F.col("o_orderpriority") == "1-URGENT", 1)
        .otherwise(0)
        .cast("long")
        .alias("g"),
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("v"),
    )
    tot = vals.agg(
        F.sum("g").cast("long").alias("n1"),
        F.sum(F.lit(1) - F.col("g")).cast("long").alias("n2"),
    )
    pv = vals.groupBy("v").agg(
        F.sum("g").alias("a"), F.count(F.lit(1)).alias("t")
    )
    cum = _cum_by_value(pv)
    rank2 = 2 * (F.col("cum_t") - F.col("t")) + F.col("t") + 1
    sums = cum.agg(
        F.sum(F.col("a") * rank2).cast("long").alias("r1_x2"),
        F.sum((F.col("t") - F.col("a")) * rank2).cast("long").alias("r2_x2"),
        F.sum(
            F.col("t") * F.col("t") * F.col("t") - F.col("t")
        )
        .cast("long")
        .alias("ties_cubed"),
    )
    u1 = F.col("r1_x2") - F.col("n1") * (F.col("n1") + 1)
    return (
        sums.crossJoin(F.broadcast(tot))
        # rank-sum test is undefined without BOTH samples: zero rows
        # (not an all-NULL row) when a group is empty, both engines
        .where((F.col("n1") > 0) & (F.col("n2") > 0))
        .select(
            "n1",
            "n2",
            "r1_x2",
            u1.cast("long").alias("u1_x2"),
            (2 * F.col("n1") * F.col("n2") - u1).cast("long").alias("u2_x2"),
            "ties_cubed",
            (
                F.col("r1_x2") + F.col("r2_x2")
                == (F.col("n1") + F.col("n2"))
                * (F.col("n1") + F.col("n2") + 1)
            ).alias("rank_sum_ok"),
        )
    )


@query(
    "chisq_independence",
    oracle="""
    WITH cells AS (
      SELECT o_orderstatus AS status, o_orderpriority AS priority,
             CAST(COUNT(*) AS BIGINT) AS n_obs
      FROM orders GROUP BY 1, 2),
    rt AS (SELECT status, CAST(SUM(n_obs) AS BIGINT) AS r
           FROM cells GROUP BY 1),
    ct AS (SELECT priority, CAST(SUM(n_obs) AS BIGINT) AS c
           FROM cells GROUP BY 1),
    tt AS (SELECT CAST(SUM(n_obs) AS BIGINT) AS n FROM cells),
    per AS (
      SELECT cells.status, cells.priority, n_obs, r, c,
             CAST(round(
               CAST((CAST(n AS DECIMAL(38,0)) * n_obs
                     - CAST(r AS DECIMAL(38,0)) * c)
                    * (CAST(n AS DECIMAL(38,0)) * n_obs
                       - CAST(r AS DECIMAL(38,0)) * c) AS DOUBLE)
               / (CAST(n AS DOUBLE) * CAST(r AS DOUBLE)
                  * CAST(c AS DOUBLE)),
               12) AS DECIMAL(24,12)) AS contrib
      FROM cells JOIN rt USING (status) JOIN ct USING (priority)
           CROSS JOIN tt)
    SELECT status, priority, n_obs,
           r AS row_total, c AS col_total,
           CAST(contrib * 1000000000000 AS BIGINT) AS contrib_e12,
           CAST(SUM(contrib * 1000000000000) OVER () AS BIGINT)
             AS chisq_e12
    FROM per
    """,
)
def q_chisq_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square test of independence between order status and
    priority, carried exactly until one IEEE division per cell.

    Per cell: contribution = (N*O - R*C)^2 / (N*R*C) — numerator and
    denominator are exact integers (DECIMAL(38,0) products so the
    squared term cannot wrap), divided once in double (IEEE
    exactly-rounded, bit-identical cross-engine), rounded to a fixed
    12-dp DECIMAL whose 1e12-scaled value is an exact long. The
    statistic is the exact decimal sum of per-cell contributions.

    Scale shape: the contingency table has |status| x |priority|
    rows (15 here — bounded by category cardinalities, NOT by row
    count), produced by one map-side-combinable groupBy over the
    fact table; row totals, column totals and N are broadcast joins
    over that bounded table. The total re-enters each output row via
    the approved crossJoin(broadcast(1-row)) pattern; the oracle
    states it with a (single-node-legal) global window instead.
    """
    orders = load_table(spark, sf_dir, "orders")
    cells = orders.groupBy(
        F.col("o_orderstatus").alias("status"),
        F.col("o_orderpriority").alias("priority"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n_obs"))
    rt = cells.groupBy("status").agg(F.sum("n_obs").cast("long").alias("r"))
    ct = cells.groupBy("priority").agg(
        F.sum("n_obs").cast("long").alias("c")
    )
    tt = cells.agg(F.sum("n_obs").cast("long").alias("n"))
    d = F.col("n").cast("decimal(38,0)") * F.col("n_obs") - F.col(
        "r"
    ).cast("decimal(38,0)") * F.col("c")
    contrib = F.round(
        (d * d).cast("double")
        / (
            F.col("n").cast("double")
            * F.col("r").cast("double")
            * F.col("c").cast("double")
        ),
        12,
    ).cast("decimal(24,12)")
    per = (
        # broadcast-ok: one row per status (bounded enum)
        cells.join(F.broadcast(rt), "status")
        # broadcast-ok: one row per priority (bounded enum)
        .join(F.broadcast(ct), "priority")
        .crossJoin(F.broadcast(tt))
        .select(
            "status",
            "priority",
            "n_obs",
            F.col("r").alias("row_total"),
            F.col("c").alias("col_total"),
            (contrib * 1000000000000).cast("long").alias("contrib_e12"),
        )
    )
    total = per.agg(
        F.sum("contrib_e12").cast("long").alias("chisq_e12")
    )
    return per.crossJoin(F.broadcast(total))


@query(
    "acf_lags",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS x
      FROM orders GROUP BY 1),
    st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                  CAST(SUM(x) AS BIGINT) AS s FROM daily),
    den AS (
      SELECT SUM(CAST(n * x - s AS DECIMAL(38,0)) * (n * x - s)) AS dd
      FROM daily, st),
    lags AS (SELECT unnest(range(1, 8)) AS k),
    num AS (
      SELECT k, CAST(COUNT(*) AS BIGINT) AS n_pairs,
             SUM(CAST(st.n * a.x - st.s AS DECIMAL(38,0))
                 * (st.n * b.x - st.s)) AS nn
      FROM daily a
      CROSS JOIN lags
      JOIN daily b ON b.d = a.d + CAST(k AS INTEGER)
      CROSS JOIN st
      GROUP BY k)
    SELECT CAST(k AS BIGINT) AS k, n_pairs,
           CAST(round(CAST(nn AS DOUBLE) * 1000000
                      / CAST(dd AS DOUBLE)) AS BIGINT) AS acf_e6
    FROM num, den
    ORDER BY k
    """,
)
def q_acf_lags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation of the daily-revenue series at lags 1..7.

    The demeaned cross-moment sum(x_t - m)(x_{t+k} - m) is scaled by
    N^2 into the all-integer identity sum(N*x_t - S)(N*x_{t+k} - S),
    accumulated in DECIMAL(38,0) (per-term magnitude ~1e25 at sf0.1
    — far outside int64, exact in decimal), with the standard
    full-series demeaned sum of squares as denominator; one double
    division per lag, rounded half-away to 1e-6 (both engines round
    doubles away from zero at .5).

    Scale shape: the daily rollup is one map-side-combinable groupBy
    (output bounded by the date domain, not row count); each lag is
    an EQUI-join of the daily series to itself on d = d+k — a
    7-way-broadcast lag table against a date-bounded series, no
    window over the raw facts, no sequential recurrence. Missing
    days simply drop pairs (n_pairs records how many survive), same
    convention both engines.
    """
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.to_date("o_orderdate").alias("d")
    ).agg(
        F.sum(F.floor(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("x")
    )
    st = daily.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("s"),
    )
    dev = F.col("n").cast("decimal(38,0)") * F.col("x") - F.col("s")
    den = (
        daily.crossJoin(F.broadcast(st))
        .agg(F.sum(dev * dev).alias("dd"))
    )
    lags = spark.range(1, 8).select(F.col("id").cast("long").alias("k"))
    a = daily.select(F.col("d").alias("da"), F.col("x").alias("xa"))
    b = daily.select(F.col("d").alias("db"), F.col("x").alias("xb"))
    pairs = (
        a.crossJoin(F.broadcast(lags))
        .withColumn("dt", F.date_add(F.col("da"), F.col("k").cast("int")))
        .join(b, F.col("db") == F.col("dt"))
        .crossJoin(F.broadcast(st))
    )
    deva = F.col("n").cast("decimal(38,0)") * F.col("xa") - F.col("s")
    devb = F.col("n").cast("decimal(38,0)") * F.col("xb") - F.col("s")
    num = pairs.groupBy("k").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum(deva * devb).alias("nn"),
    )
    return (
        num.crossJoin(F.broadcast(den))
        .select(
            "k",
            "n_pairs",
            F.round(
                F.col("nn").cast("double")
                * 1000000
                / F.col("dd").cast("double")
            )
            .cast("long")
            .alias("acf_e6"),
        )
        .orderBy("k")
    )


# ---------------------------------------------------------------------------
# Classifier-evaluation / survival / experimentation tranche (round 4,
# second batch): exact AUC-ROC, Kaplan-Meier survival, CUPED variance
# reduction, information-gain feature split, and a Markov transition
# matrix. The reference has none of this (SURVEY §2.4); it is the
# model-evaluation and experimentation surface of a training-data
# platform: "did the quality scorer actually rank good docs higher"
# (AUC), "how long do users survive before churn" (KM), "how much
# variance does the pre-period covariate remove from the experiment
# metric" (CUPED), "which feature threshold best separates the
# classes" (info gain), "what does the user journey look like as a
# first-order chain" (Markov).
# ---------------------------------------------------------------------------


@query(
    "auc_roc_exact",
    oracle=f"""
    WITH scored AS (
      SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS g,
             (100000 * (length({fold_sql('text')})
                        - length(replace({fold_sql('text')}, 'e', ''))))
               // length(text) AS v
      FROM documents WHERE length(text) > 0),
    tot AS (
      SELECT CAST(SUM(g) AS BIGINT) AS n_pos,
             CAST(SUM(1 - g) AS BIGINT) AS n_neg
      FROM scored),
    pv AS (
      SELECT v, SUM(g) AS a, COUNT(*) AS t FROM scored GROUP BY v),
    cum AS (
      SELECT a, t, SUM(t) OVER (ORDER BY v) AS ct FROM pv),
    sums AS (
      SELECT CAST(SUM(a * (2 * (ct - t) + t + 1)) AS BIGINT) AS r1_x2
      FROM cum)
    SELECT n_pos, n_neg,
           CAST(r1_x2 - n_pos * (n_pos + 1) AS BIGINT) AS u1_x2,
           CAST(((r1_x2 - n_pos * (n_pos + 1)) * 1000000
                 + n_pos * n_neg) // (2 * n_pos * n_neg)
                AS BIGINT) AS auc_e6,
           CAST(2 * (((r1_x2 - n_pos * (n_pos + 1)) * 1000000
                      + n_pos * n_neg) // (2 * n_pos * n_neg))
                - 1000000 AS BIGINT) AS gini_e6
    FROM sums, tot
    """,
)
def q_auc_roc_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact AUC-ROC of an integer scorer, via the rank-sum identity.

    AUC = P(score_pos > score_neg) + P(score_pos = score_neg)/2 =
    U1/(n_pos*n_neg), with U1 from tie-aware average ranks — so AUC
    is evaluated EXACTLY, in integers, with one groupBy and the same
    bucket-offset cumulative machinery as ks_two_sample/mann_whitney_u
    (bounded collect + partitioned windows; no global sort, no
    per-threshold sweep). The scorer under evaluation is the
    'e'-frequency-per-100k-chars heuristic for English (label:
    lang = 'en') — deliberately simple so the query certifies the
    EVALUATOR, not the scorer. auc_e6 = round(1e6*AUC) via the
    half-up (a*1e6 + den/2-free) integral trick on nonnegative longs;
    gini_e6 = 2*auc - 1 derives from auc_e6 in exact integers.

    Long-arithmetic bound: u1_x2*1e6 <= 2e6*n_pos*n_neg stays below
    2^63 while n_pos*n_neg < 4.6e12 — i.e. up to ~2.1M docs per
    class; beyond that the identical expressions promote to
    DECIMAL(38,0). At 100 TB the plan is one map-side-combinable
    groupBy(score) over the corpus (output bounded by the score
    domain, 0..100000) plus bounded-width windows.

    Reference parity: no evaluation surface exists in the reference;
    this is the standard ranking-quality gate for the trainable
    quality classifier (gd_quality_classifier).
    """
    docs = load_table(spark, sf_dir, "documents")
    scored = docs.where(F.length("text") > 0).select(
        F.when(F.col("lang") == "en", 1).otherwise(0).cast("long").alias("g"),
        F.expr(
            f"(100000 * (length({fold_sql('text')})"
            f" - length(replace({fold_sql('text')}, 'e', '')))) div length(text)"
        ).alias("v"),
    )
    tot = scored.agg(
        F.sum("g").cast("long").alias("n_pos"),
        F.sum(F.lit(1) - F.col("g")).cast("long").alias("n_neg"),
    )
    pv = scored.groupBy("v").agg(
        F.sum("g").alias("a"), F.count(F.lit(1)).alias("t")
    )
    cum = _cum_by_value(pv)
    rank2 = 2 * (F.col("cum_t") - F.col("t")) + F.col("t") + 1
    sums = cum.agg(F.sum(F.col("a") * rank2).cast("long").alias("r1_x2"))
    u1 = F.col("r1_x2") - F.col("n_pos") * (F.col("n_pos") + 1)
    auc = F.expr(
        "CAST((u1_x2 * 1000000 + n_pos * n_neg)"
        " div (2 * n_pos * n_neg) AS BIGINT)"
    )
    return (
        sums.crossJoin(F.broadcast(tot))
        .select("n_pos", "n_neg", u1.cast("long").alias("u1_x2"))
        .select(
            "n_pos",
            "n_neg",
            "u1_x2",
            auc.alias("auc_e6"),
        )
        .select(
            "n_pos",
            "n_neg",
            "u1_x2",
            "auc_e6",
            (2 * F.col("auc_e6") - 1000000).cast("long").alias("gini_e6"),
        )
    )


@query(
    "kaplan_meier_survival",
    oracle="""
    WITH pu AS (
      SELECT user_id, MIN(epoch_us(ts)) AS t0,
             MIN(CASE WHEN event_type = 'error'
                      THEN epoch_us(ts) END) AS te
      FROM events GROUP BY user_id),
    per_user AS (
      SELECT CASE WHEN te IS NOT NULL
                   AND te - t0 <= 48 * 3600000000
                  THEN 1 ELSE 0 END AS ev,
             CASE WHEN te IS NOT NULL
                   AND te - t0 <= 48 * 3600000000
                  THEN (te - t0) // 3600000000 ELSE 48 END AS dur
      FROM pu),
    n_tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM per_user),
    by_dur AS (
      SELECT dur, CAST(SUM(ev) AS BIGINT) AS d,
             CAST(COUNT(*) AS BIGINT) AS leaves
      FROM per_user GROUP BY dur),
    risk AS (
      SELECT dur, d, leaves,
             n - (SUM(leaves) OVER (ORDER BY dur) - leaves) AS n_risk
      FROM by_dur, n_tot),
    terms AS (
      SELECT dur, d, leaves, n_risk,
             CASE WHEN d = 0 OR n_risk <= d THEN CAST(0 AS BIGINT)
                  ELSE CAST(CAST(round(ln(CAST(n_risk - d AS DOUBLE)
                                          / CAST(n_risk AS DOUBLE)), 12)
                                 AS DECIMAL(24,12)) * 1000000000000
                            AS BIGINT) END AS l_e12,
             CASE WHEN d >= n_risk THEN 1 ELSE 0 END AS absorbed
      FROM risk),
    cum AS (
      SELECT dur, d, leaves, n_risk,
             SUM(l_e12) OVER (ORDER BY dur) AS cum_l,
             SUM(absorbed) OVER (ORDER BY dur) AS cum_abs
      FROM terms)
    SELECT CAST(dur AS BIGINT) AS dur_hours,
           CAST(n_risk AS BIGINT) AS n_at_risk,
           d AS d_events,
           CAST(leaves - d AS BIGINT) AS c_censored,
           CAST(CASE WHEN cum_abs > 0 THEN NULL ELSE cum_l END
                AS BIGINT) AS log_surv_e12
    FROM cum
    """,
)
def q_kaplan_meier_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival estimator for time-to-first-failure,
    carried in exact integers with the curve in e12-scaled log space.

    Per user: duration = whole hours from first event to first
    'error' event (the DEATH), administratively right-CENSORED at a
    48-hour horizon — users whose first error falls past the horizon
    (or who never error) are censored at 48 h, the standard
    fixed-observation-window design. At each distinct duration t:
    n_at_risk = users with duration >= t (deaths-before-censoring
    convention — same-time censored users still count at risk),
    d_events deaths, and the KM product S(t) =
    prod_{s<=t}(1 - d_s/n_s) reported as log_surv_e12 = sum of
    round(ln((n-d)/n), 12) e12-scaled exact longs (the repo's
    rounded-ln convention — one transcendental per distinct duration,
    then exact integer cumulation; no exp, so no second libm
    dependency). If the risk set is ever fully absorbed (d = n),
    survival is 0 from that duration on: log_surv_e12 is NULL there —
    both engines state the same CASE.

    Scale shape: per-user rollup is one map-side-combinable groupBy
    (MIN with a CASE projects first-error time in the same pass); the
    duration axis is HORIZON-bounded (49 values max, not row-bounded),
    so the two cumulations ride the bucket-offset cumsum (bounded
    collect + partitioned windows, no global sort).

    Reference parity: none (the reference has no temporal analytics);
    this is the standard reliability/churn curve over the events
    stream, the survival counterpart of retention_cohorts.
    """
    ev = load_table(spark, sf_dir, "events")
    pu = ev.groupBy("user_id").agg(
        F.min(F.unix_micros("ts")).alias("t0"),
        F.min(
            F.when(
                F.col("event_type") == "error", F.unix_micros("ts")
            )
        ).alias("te"),
    )
    horizon_us = 48 * 3600000000
    died = F.col("te").isNotNull() & (
        F.col("te") - F.col("t0") <= horizon_us
    )
    per_user = pu.select(
        F.when(died, 1).otherwise(0).cast("long").alias("ev"),
        F.when(
            died, F.expr("(te - t0) div 3600000000")
        )
        .otherwise(48)
        .cast("long")
        .alias("v"),
    )
    n_tot = per_user.agg(F.count(F.lit(1)).cast("long").alias("n"))
    by_dur = per_user.groupBy("v").agg(
        F.sum("ev").alias("a"), F.count(F.lit(1)).alias("t")
    )
    risk = (
        _cum_by_value(by_dur)
        .crossJoin(F.broadcast(n_tot))
        .select(
            "v",
            F.col("a").alias("d"),
            F.col("t").alias("leaves"),
            (F.col("n") - (F.col("cum_t") - F.col("t"))).alias("n_risk"),
        )
    )
    l_e12 = (
        F.when(
            (F.col("d") == 0) | (F.col("n_risk") <= F.col("d")),
            F.lit(0).cast("long"),
        ).otherwise(
            (
                F.round(
                    F.log(
                        (F.col("n_risk") - F.col("d")).cast("double")
                        / F.col("n_risk").cast("double")
                    ),
                    12,
                ).cast("decimal(24,12)")
                * 1000000000000
            ).cast("long")
        )
    )
    absorbed = F.when(F.col("d") >= F.col("n_risk"), 1).otherwise(0)
    terms = risk.select(
        "v",
        "d",
        "leaves",
        "n_risk",
        l_e12.alias("a"),
        absorbed.cast("long").alias("t"),
    )
    # second bucket-offset pass: cumulate the log terms and the
    # absorption flag along the (day-bounded) duration axis.
    cum2 = _cum_by_value(terms.select("v", "a", "t")).select(
        "v",
        F.col("cum_a").alias("cum_l"),
        F.col("cum_t").alias("cum_abs"),
    )
    return (
        terms.select("v", "d", "leaves", "n_risk")
        .join(cum2, "v")
        .select(
            F.col("v").cast("long").alias("dur_hours"),
            F.col("n_risk").cast("long").alias("n_at_risk"),
            F.col("d").cast("long").alias("d_events"),
            (F.col("leaves") - F.col("d")).cast("long").alias("c_censored"),
            F.when(F.col("cum_abs") > 0, F.lit(None))
            .otherwise(F.col("cum_l"))
            .cast("long")
            .alias("log_surv_e12"),
        )
    )


@query(
    "cuped_variance_reduction",
    oracle="""
    WITH per_user AS (
      SELECT user_id,
             CAST(SUM(CASE WHEN ts < TIMESTAMP '2024-01-16'
                           THEN CAST(floor(value * 100) AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS x,
             CAST(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-16'
                           THEN CAST(floor(value * 100) AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS y
      FROM events GROUP BY user_id),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             SUM(CAST(x AS DECIMAL(38,0)) * x) AS sxx,
             SUM(CAST(x AS DECIMAL(38,0)) * y) AS sxy,
             SUM(CAST(y AS DECIMAL(38,0)) * y) AS syy
      FROM per_user),
    c AS (
      SELECT n, sx, sy,
             CAST(n AS DECIMAL(38,0)) * sxx
               - CAST(sx AS DECIMAL(38,0)) * sx AS cxx,
             CAST(n AS DECIMAL(38,0)) * sxy
               - CAST(sx AS DECIMAL(38,0)) * sy AS cxy,
             CAST(n AS DECIMAL(38,0)) * syy
               - CAST(sy AS DECIMAL(38,0)) * sy AS cyy
      FROM m)
    SELECT n AS n_users, sx AS sum_x_cents, sy AS sum_y_cents,
           CAST(CAST(cxx AS DECIMAL(38,0)) AS VARCHAR) AS cxx_str,
           CAST(CAST(cxy AS DECIMAL(38,0)) AS VARCHAR) AS cxy_str,
           CAST(CAST(cyy AS DECIMAL(38,0)) AS VARCHAR) AS cyy_str,
           CASE WHEN cxx > 0 THEN
             CAST(round(CAST(cxy AS DOUBLE) * 1000000000
                        / CAST(cxx AS DOUBLE)) AS BIGINT) END AS theta_e9,
           CASE WHEN cxx > 0 AND cyy > 0 THEN
             CAST(round((CAST(cxy AS DOUBLE) * CAST(cxy AS DOUBLE))
                        * 1000000
                        / (CAST(cxx AS DOUBLE) * CAST(cyy AS DOUBLE)))
                  AS BIGINT) END AS rho2_e6
    FROM c
    """,
)
def q_cuped_variance_reduction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED (Controlled-experiment Using Pre-Existing Data, Deng et
    al. 2013 — public paper) variance reduction over the events
    stream: pre-period spend (before 2024-01-16) is the covariate X,
    post-period spend the metric Y; theta = cov(X,Y)/var(X) is the
    adjustment coefficient and rho^2 = cov^2/(varX*varY) the fraction
    of metric variance CUPED removes — the number an experimentation
    platform quotes as "sensitivity gain".

    Exactness: per-user sums are exact cents; the n^2-scaled central
    moments Cxx = n*Sxx - Sx^2 (etc.) accumulate in DECIMAL(38,0);
    theta and rho^2 are each ONE double expression over those exact
    integers, rounded to fixed scales — bit-identical cross-engine.
    The raw moments are also emitted as strings (pandas narrows
    DECIMAL(38,0), the same convention as kmeans' inertia).

    Scale shape: one map-side-combinable groupBy(user) + one 1-row
    aggregate. No windows, no joins; the covariate split is a
    branch-free conditional inside the scan. At 100 TB this is the
    cheapest possible two-pass-collapsed-to-one experiment readout.
    """
    ev = load_table(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100).cast("long")
    cut = F.lit("2024-01-16 00:00:00").cast("timestamp")
    per_user = ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("ts") < cut, cents).otherwise(0))
        .cast("long")
        .alias("x"),
        F.sum(F.when(F.col("ts") >= cut, cents).otherwise(0))
        .cast("long")
        .alias("y"),
    )
    xd = F.col("x").cast("decimal(38,0)")
    yd = F.col("y").cast("decimal(38,0)")
    m = per_user.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(xd * F.col("x")).cast("decimal(38,0)").alias("sxx"),
        F.sum(xd * F.col("y")).cast("decimal(38,0)").alias("sxy"),
        F.sum(yd * F.col("y")).cast("decimal(38,0)").alias("syy"),
    )
    nd = F.col("n").cast("decimal(38,0)")
    c = m.select(
        "n",
        "sx",
        "sy",
        (nd * F.col("sxx") - F.col("sx").cast("decimal(38,0)") * F.col("sx"))
        .cast("decimal(38,0)")
        .alias("cxx"),
        (nd * F.col("sxy") - F.col("sx").cast("decimal(38,0)") * F.col("sy"))
        .cast("decimal(38,0)")
        .alias("cxy"),
        (nd * F.col("syy") - F.col("sy").cast("decimal(38,0)") * F.col("sy"))
        .cast("decimal(38,0)")
        .alias("cyy"),
    )
    dxx = F.col("cxx").cast("double")
    dxy = F.col("cxy").cast("double")
    dyy = F.col("cyy").cast("double")
    return c.select(
        F.col("n").alias("n_users"),
        F.col("sx").alias("sum_x_cents"),
        F.col("sy").alias("sum_y_cents"),
        F.col("cxx").cast("string").alias("cxx_str"),
        F.col("cxy").cast("string").alias("cxy_str"),
        F.col("cyy").cast("string").alias("cyy_str"),
        # zero-variance guards: theta/rho^2 undefined when the
        # covariate (or metric) is constant — NULL in both engines
        F.when(F.col("cxx") > 0, F.round(dxy * 1000000000 / dxx))
        .cast("long")
        .alias("theta_e9"),
        F.when(
            (F.col("cxx") > 0) & (F.col("cyy") > 0),
            F.round((dxy * dxy) * 1000000 / (dxx * dyy)),
        )
        .cast("long")
        .alias("rho2_e6"),
    )


#: candidate split thresholds for the decision stump — powers of two
#: spanning the document-length domain; a FIXED, bounded grid (the
#: oracle enumerates the same literals), never data-derived.
_IG_THETAS = [1 << k for k in range(3, 13)]


@query(
    "info_gain_feature_split",
    oracle=f"""
    WITH th AS (
      SELECT unnest(ARRAY{_IG_THETAS}) AS theta),
    lab AS (
      SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y, n_chars
      FROM documents),
    per AS (
      SELECT theta,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(y) AS BIGINT) AS p,
             CAST(SUM(CASE WHEN n_chars <= theta THEN 1 ELSE 0 END)
                  AS BIGINT) AS nl,
             CAST(SUM(CASE WHEN n_chars <= theta THEN y ELSE 0 END)
                  AS BIGINT) AS pl
      FROM lab, th GROUP BY theta),
    ig AS (
      SELECT theta, nl, pl, n - nl AS nr, p - pl AS pr,
             (CASE WHEN p > 0 THEN p * CAST(CAST(round(ln(CAST(n AS DOUBLE) / p), 12) AS DECIMAL(24,12)) * 1000000000000 AS BIGINT) ELSE 0 END
              + CASE WHEN n - p > 0 THEN (n - p) * CAST(CAST(round(ln(CAST(n AS DOUBLE) / (n - p)), 12) AS DECIMAL(24,12)) * 1000000000000 AS BIGINT) ELSE 0 END)
             - (CASE WHEN pl > 0 THEN pl * CAST(CAST(round(ln(CAST(nl AS DOUBLE) / pl), 12) AS DECIMAL(24,12)) * 1000000000000 AS BIGINT) ELSE 0 END
                + CASE WHEN nl - pl > 0 THEN (nl - pl) * CAST(CAST(round(ln(CAST(nl AS DOUBLE) / (nl - pl)), 12) AS DECIMAL(24,12)) * 1000000000000 AS BIGINT) ELSE 0 END)
             - (CASE WHEN p - pl > 0 THEN (p - pl) * CAST(CAST(round(ln(CAST(n - nl AS DOUBLE) / (p - pl)), 12) AS DECIMAL(24,12)) * 1000000000000 AS BIGINT) ELSE 0 END
                + CASE WHEN (n - nl) - (p - pl) > 0 THEN ((n - nl) - (p - pl)) * CAST(CAST(round(ln(CAST(n - nl AS DOUBLE) / ((n - nl) - (p - pl))), 12) AS DECIMAL(24,12)) * 1000000000000 AS BIGINT) ELSE 0 END)
               AS ig_n_e12
      FROM per),
    mx AS (SELECT MAX(ig_n_e12) AS best FROM ig)
    SELECT CAST(theta AS BIGINT) AS theta,
           nl AS n_left, pl AS pos_left,
           CAST(nr AS BIGINT) AS n_right, CAST(pr AS BIGINT) AS pos_right,
           CAST(ig_n_e12 AS BIGINT) AS ig_n_e12,
           ig_n_e12 = best AS is_best
    FROM ig, mx
    """,
)
def q_info_gain_feature_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decision-stump feature selection: information gain of the
    split n_chars <= theta against the label lang = 'en', over a
    fixed power-of-two threshold grid.

    The n-scaled identity removes every division from the entropy:
    n*H(S) = sum_c c * ln(n/c), so IG*n = T(parent) - T(left) -
    T(right) where each term is (exact count) * (rounded-ln e12
    long) — the repo's round(ln, 12) DECIMAL convention — summed in
    exact integer arithmetic. ig_n_e12 is therefore reproducible to
    the last digit; is_best marks the argmax threshold (ties all
    flagged, deterministically).

    Scale shape: ONE scan of the corpus cross-joined with the
    broadcast 10-row threshold grid, one map-side-combinable
    groupBy(theta) producing 4 integer partials per threshold; the
    per-threshold entropy algebra runs on the 10-row result. No
    windows, no data-sized joins. Long bound: c * |L| <
    n * ln(n)*1e12 — promotes past int64 only beyond ~6e5 docs, so
    terms multiply as DECIMAL(38,0) and only the final difference
    casts down.

    Reference parity: none (no ML surface in the reference) — this is
    the feature-audit step ahead of gd_quality_classifier, answering
    "is document length even informative about the target class".
    """
    docs = load_table(spark, sf_dir, "documents")
    th = spark.createDataFrame(
        [(t,) for t in _IG_THETAS], "theta long"
    )
    lab = docs.select(
        F.when(F.col("lang") == "en", 1).otherwise(0).cast("long").alias("y"),
        "n_chars",
    )
    per = (
        lab.crossJoin(F.broadcast(th))
        .groupBy("theta")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("y").cast("long").alias("p"),
            F.sum(F.when(F.col("n_chars") <= F.col("theta"), 1).otherwise(0))
            .cast("long")
            .alias("nl"),
            F.sum(
                F.when(F.col("n_chars") <= F.col("theta"), F.col("y")).otherwise(
                    0
                )
            )
            .cast("long")
            .alias("pl"),
        )
    )

    def _t(n_grp, c):
        # c * round(ln(n_grp/c), 12)·1e12 as exact DECIMAL product;
        # zero when the class is empty (lim x→0 x·ln(n/x) = 0).
        l_e12 = (
            F.round(F.log(n_grp.cast("double") / c.cast("double")), 12)
            .cast("decimal(24,12)")
            * 1000000000000
        ).cast("long")
        return F.when(c > 0, c.cast("decimal(38,0)") * l_e12).otherwise(
            F.lit(0).cast("decimal(38,0)")
        )

    n, p = F.col("n"), F.col("p")
    nl, pl = F.col("nl"), F.col("pl")
    nr, pr = n - nl, p - pl
    ig = per.select(
        "theta",
        "nl",
        "pl",
        nr.alias("nr"),
        pr.alias("pr"),
        (
            _t(n, p)
            + _t(n, n - p)
            - (_t(nl, pl) + _t(nl, nl - pl))
            - (_t(nr, pr) + _t(nr, nr - pr))
        )
        .cast("long")
        .alias("ig_n_e12"),
    )
    mx = ig.agg(F.max("ig_n_e12").alias("best"))
    return ig.crossJoin(F.broadcast(mx)).select(
        F.col("theta").cast("long").alias("theta"),
        F.col("nl").cast("long").alias("n_left"),
        F.col("pl").cast("long").alias("pos_left"),
        F.col("nr").cast("long").alias("n_right"),
        F.col("pr").cast("long").alias("pos_right"),
        "ig_n_e12",
        (F.col("ig_n_e12") == F.col("best")).alias("is_best"),
    )


@query(
    "markov_transition_matrix",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events),
    trans AS (
      SELECT prev_type AS from_type, event_type AS to_type,
             CAST(COUNT(*) AS BIGINT) AS n_trans
      FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2),
    rt AS (
      SELECT from_type, CAST(SUM(n_trans) AS BIGINT) AS row_total
      FROM trans GROUP BY 1)
    SELECT t.from_type, t.to_type, t.n_trans, r.row_total,
           CAST((t.n_trans * 2000000 + r.row_total)
                // (2 * r.row_total) AS BIGINT) AS p_e6
    FROM trans t JOIN rt r USING (from_type)
    """,
)
def q_markov_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: P(next event type | current event type), exact counts
    with e6-scaled probabilities via the integral half-up trick.

    The lag runs over a window PARTITIONED by user (per-user
    sequences are session-sized, never corpus-sized) ordered by
    (ts, event_id) — the event_id tiebreak makes equal-timestamp
    ordering deterministic in both engines. Transition counts and
    row totals are two map-side-combinable aggregations over the
    |event_types|^2-bounded pair domain; the row-total join is a
    broadcast of a category-bounded table.

    Reference parity: none — this is the user-journey model a
    product-analytics engine derives from the same event stream the
    funnel/retention/sessionization queries consume.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    )
    trans = (
        seq.where(F.col("prev_type").isNotNull())
        .groupBy(
            F.col("prev_type").alias("from_type"),
            F.col("event_type").alias("to_type"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_trans"))
    )
    rt = trans.groupBy("from_type").agg(
        F.sum("n_trans").cast("long").alias("row_total")
    )
    # broadcast-ok: one row per event_type — bounded enum
    return trans.join(F.broadcast(rt), "from_type").select(
        "from_type",
        "to_type",
        "n_trans",
        "row_total",
        F.expr(
            "CAST((n_trans * 2000000 + row_total) div (2 * row_total)"
            " AS BIGINT)"
        ).alias("p_e6"),
    )


@query(
    "permutation_test_signflip",
    oracle="""
    WITH per_user AS (
      SELECT user_id,
             CAST(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-16'
                           THEN CAST(floor(value * 100) AS BIGINT)
                           ELSE 0 END)
                  - SUM(CASE WHEN ts < TIMESTAMP '2024-01-16'
                             THEN CAST(floor(value * 100) AS BIGINT)
                             ELSE 0 END) AS BIGINT) AS d
      FROM events GROUP BY user_id),
    reps AS (SELECT unnest(range(0, 64)) AS b),
    flips AS (
      SELECT b,
             CAST(SUM(CASE WHEN ('0x' || substr(md5('perm' || b || '_'
                                  || user_id), 1, 8))::BIGINT % 2 = 0
                           THEN d ELSE -d END) AS BIGINT) AS t_b
      FROM per_user, reps GROUP BY b),
    obs AS (SELECT CAST(SUM(d) AS BIGINT) AS t_obs,
                   CAST(COUNT(*) AS BIGINT) AS n_users
            FROM per_user)
    SELECT t_obs, n_users, CAST(64 AS BIGINT) AS n_reps,
           CAST(SUM(CASE WHEN abs(t_b) >= abs(t_obs)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_ge,
           CAST(((SUM(CASE WHEN abs(t_b) >= abs(t_obs)
                           THEN 1 ELSE 0 END) + 1) * 2000000 + 65)
                // (2 * 65) AS BIGINT) AS p_e6
    FROM flips, obs
    GROUP BY t_obs, n_users
    """,
)
def q_permutation_test_signflip(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Sign-flip permutation test (Fisher randomization) for the
    paired pre/post spend difference, with DETERMINISTIC md5-derived
    sign assignments so both engines run the identical 64 permutations.

    Per user d = post - pre cents (the CUPED pairing). Under H0 the
    signs of d are exchangeable: replicate b flips user u's sign by
    parity of md5('perm{b}_{u}'); T_b = sum of signed d is an exact
    long, the two-sided p-value is the standard add-one estimate
    (n_ge+1)/(B+1) reported as a half-up e6 integer. Everything is
    integer arithmetic end to end — no distributional approximation,
    the test is exact given the sign set.

    Scale shape: one groupBy(user) rollup, then one scan of the
    user-level table cross-joined with the broadcast 64-row replicate
    grid into a 64-group map-side-combinable agg — permutations cost
    B partial sums, NOT B shuffles. The observed statistic enters via
    crossJoin(broadcast(1-row)).

    Reference parity: none — inferential surface for experiment
    readouts where the CLT-based z-test (chisq_independence's cousin)
    is untrusted.
    """
    ev = load_table(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100).cast("long")
    cut = F.lit("2024-01-16 00:00:00").cast("timestamp")
    per_user = ev.groupBy("user_id").agg(
        (
            F.sum(F.when(F.col("ts") >= cut, cents).otherwise(0))
            - F.sum(F.when(F.col("ts") < cut, cents).otherwise(0))
        )
        .cast("long")
        .alias("d")
    )
    reps = spark.range(0, 64).select(F.col("id").alias("b"))
    sign_even = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("perm"),
                        F.col("b").cast("string"),
                        F.lit("_"),
                        F.col("user_id").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 2
        == 0
    )
    flips = (
        per_user.crossJoin(F.broadcast(reps))
        .groupBy("b")
        .agg(
            F.sum(
                F.when(sign_even, F.col("d")).otherwise(-F.col("d"))
            )
            .cast("long")
            .alias("t_b")
        )
    )
    obs = per_user.agg(
        F.sum("d").cast("long").alias("t_obs"),
        F.count(F.lit(1)).cast("long").alias("n_users"),
    )
    return (
        flips.crossJoin(F.broadcast(obs))
        .groupBy("t_obs", "n_users")
        .agg(
            F.sum(
                F.when(F.abs(F.col("t_b")) >= F.abs(F.col("t_obs")), 1)
                .otherwise(0)
            )
            .cast("long")
            .alias("n_ge")
        )
        .select(
            "t_obs",
            "n_users",
            F.lit(64).cast("long").alias("n_reps"),
            "n_ge",
            F.expr(
                "CAST(((n_ge + 1) * 2000000 + 65) div (2 * 65) AS BIGINT)"
            ).alias("p_e6"),
        )
    )


@query(
    "ab_srm_bucketing_audit",
    oracle="""
    WITH assign AS (
      SELECT user_id,
             ('0x' || substr(md5('ab_' || user_id), 1, 8))::BIGINT % 2
               AS bucket
      FROM (SELECT DISTINCT user_id FROM events)),
    conv AS (
      SELECT a.bucket,
             CAST(COUNT(*) AS BIGINT) AS n_users,
             CAST(SUM(CASE WHEN p.user_id IS NOT NULL
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_converted
      FROM assign a
      LEFT JOIN (SELECT DISTINCT user_id FROM events
                 WHERE event_type = 'purchase') p
        ON p.user_id = a.user_id
      GROUP BY a.bucket),
    tot AS (
      SELECT CAST(SUM(n_users) AS BIGINT) AS n,
             CAST(MAX(CASE WHEN bucket = 0 THEN n_users END)
                  - MAX(CASE WHEN bucket = 1 THEN n_users END)
                  AS BIGINT) AS diff
      FROM conv)
    SELECT bucket, n_users, n_converted,
           CAST((n_converted * 2000000 + n_users)
                // (2 * n_users) AS BIGINT) AS conv_rate_e6,
           CAST(round(CAST(diff * diff AS DOUBLE) * 1000000
                      / CAST(n AS DOUBLE)) AS BIGINT) AS srm_chisq_e6
    FROM conv, tot
    """,
)
def q_ab_srm_bucketing_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment assignment audit: deterministic md5 hash-split
    of users into two buckets, per-bucket conversion rates, and the
    sample-ratio-mismatch (SRM) chi-square — the gate every
    experimentation platform runs before trusting a readout (a
    skewed split means the bucketing itself is broken).

    Assignment is md5(user) parity — the industry-standard
    deterministic bucketing (same user always lands in the same arm,
    reproducible across engines and reruns, no RNG). For a 50/50
    design the 2-cell chi-square collapses to (n0-n1)^2/n, computed
    as ONE double expression over exact longs, e6-rounded.
    Conversion = user ever fired a 'purchase' event; rates use the
    integral half-up trick.

    Scale shape: distinct users (one shuffle), a broadcast-able
    distinct converter set (semi-join shape), one 2-group agg. The
    SRM scalar re-enters via crossJoin(broadcast(1-row)).

    Reference parity: none — experimentation surface over the same
    events stream as funnel_conversion/retention_cohorts.
    """
    ev = load_table(spark, sf_dir, "events")
    users = ev.select("user_id").distinct()
    assign = users.select(
        "user_id",
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("ab_"), F.col("user_id").cast("string"))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % 2
        ).alias("bucket"),
    )
    conv_users = (
        ev.where(F.col("event_type") == "purchase")
        .select("user_id")
        .distinct()
        .withColumn("converted", F.lit(1))
    )
    conv = (
        # no hint: the converted-user set grows with the corpus
        assign.join((conv_users), "user_id", "left")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            F.sum(F.coalesce(F.col("converted"), F.lit(0)))
            .cast("long")
            .alias("n_converted"),
        )
    )
    tot = conv.agg(
        F.sum("n_users").cast("long").alias("n"),
        (
            F.max(F.when(F.col("bucket") == 0, F.col("n_users")))
            - F.max(F.when(F.col("bucket") == 1, F.col("n_users")))
        )
        .cast("long")
        .alias("diff"),
    )
    return conv.crossJoin(F.broadcast(tot)).select(
        "bucket",
        "n_users",
        "n_converted",
        F.expr(
            "CAST((n_converted * 2000000 + n_users) div (2 * n_users)"
            " AS BIGINT)"
        ).alias("conv_rate_e6"),
        F.round(
            (F.col("diff") * F.col("diff")).cast("double")
            * 1000000
            / F.col("n").cast("double")
        )
        .cast("long")
        .alias("srm_chisq_e6"),
    )


@query(
    "seasonality_profile",
    oracle="""
    WITH base AS (
      SELECT ((epoch_us(ts) // 86400000000) + 4) % 7 AS dow,
             (epoch_us(ts) % 86400000000) // 3600000000 AS hod,
             CAST(floor(value * 100) AS BIGINT) AS cents
      FROM events),
    cell AS (
      SELECT dow, hod, CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(SUM(cents) AS BIGINT) AS sum_cents
      FROM base GROUP BY 1, 2),
    tot AS (
      SELECT CAST(SUM(n_events) AS BIGINT) AS n,
             CAST(SUM(sum_cents) AS BIGINT) AS s,
             CAST(COUNT(*) AS BIGINT) AS n_cells
      FROM cell)
    SELECT CAST(dow AS BIGINT) AS dow, CAST(hod AS BIGINT) AS hod,
           n_events, sum_cents,
           CAST(round(CAST(n_events * n_cells - n AS DOUBLE) * 1000000
                      / CAST(n AS DOUBLE)) AS BIGINT) AS load_dev_e6,
           CAST(round(CAST(CAST(sum_cents AS DECIMAL(38,0)) * n
                           - CAST(s AS DECIMAL(38,0)) * n_events
                           AS DOUBLE) * 1000000
                      / (CAST(s AS DOUBLE) * n_events))
                AS BIGINT) AS value_dev_e6
    FROM cell, tot
    """,
)
def q_seasonality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly seasonality profile: the (day-of-week x hour-of-day)
    event-load and mean-value matrix with e6-scaled relative
    deviations from the uniform/global baseline — the fingerprint a
    capacity planner or anomaly detector keeps of "normal" traffic.

    Calendar arithmetic is PURE INTEGER epoch math — dow =
    (days_since_epoch + 4) % 7 (1970-01-01 was a Thursday; 0=Sunday)
    and hod = in-day microseconds div 3600e6 — so both engines derive
    identical cells with no calendar/timezone library in the loop.
    load_dev_e6 = (n_cell * n_cells / n - 1) in e6 (deviation from
    uniform load); value_dev_e6 = (mean_cell / mean_global - 1) in e6
    via the cross-multiplied integer form before ONE double division.

    Scale shape: one map-side-combinable groupBy over a 168-cell
    domain; the global totals re-enter via the approved broadcast
    scalar. This is the cheapest possible profile at any scale.

    Reference parity: none — time-series surface over events, the
    static complement of acf_lags.
    """
    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        F.unix_micros("ts").alias("_us"),
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
    ).select(
        F.expr("((_us div 86400000000) + 4) % 7").alias("dow"),
        F.expr("(_us % 86400000000) div 3600000000").alias("hod"),
        "cents",
    )
    cell = base.groupBy("dow", "hod").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum("cents").cast("long").alias("sum_cents"),
    )
    tot = cell.agg(
        F.sum("n_events").cast("long").alias("n"),
        F.sum("sum_cents").cast("long").alias("s"),
        F.count(F.lit(1)).cast("long").alias("n_cells"),
    )
    return cell.crossJoin(F.broadcast(tot)).select(
        F.col("dow").cast("long").alias("dow"),
        F.col("hod").cast("long").alias("hod"),
        "n_events",
        "sum_cents",
        F.round(
            (F.col("n_events") * F.col("n_cells") - F.col("n")).cast(
                "double"
            )
            * 1000000
            / F.col("n").cast("double")
        )
        .cast("long")
        .alias("load_dev_e6"),
        F.round(
            (
                F.col("sum_cents").cast("decimal(38,0)") * F.col("n")
                - F.col("s").cast("decimal(38,0)") * F.col("n_events")
            ).cast("double")
            * 1000000
            / (F.col("s").cast("double") * F.col("n_events"))
        )
        .cast("long")
        .alias("value_dev_e6"),
    )


@query(
    "isotonic_calibration_pav",
    oracle=f"""
    WITH scored AS (
      SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
             (100000 * (length({fold_sql('text')})
                        - length(replace({fold_sql('text')}, 'e', ''))))
               // length(text) // 1000 AS bin
      FROM documents WHERE length(text) > 0),
    bins AS (
      SELECT bin, CAST(COUNT(*) AS BIGINT) AS nb,
             CAST(SUM(y) AS BIGINT) AS pb
      FROM scored GROUP BY bin),
    cum AS (
      SELECT bin, nb, pb,
             SUM(nb) OVER (ORDER BY bin) AS cn,
             SUM(pb) OVER (ORDER BY bin) AS cp
      FROM bins),
    pairs AS (
      SELECT a.bin AS j, b.bin AS k,
             CAST(b.cp - a.cp + a.pb AS DOUBLE)
               / CAST(b.cn - a.cn + a.nb AS DOUBLE) AS avg_jk
      FROM cum a JOIN cum b ON b.bin >= a.bin),
    minsuf AS (
      SELECT j, MIN(avg_jk) AS ms FROM pairs GROUP BY j),
    iso AS (
      SELECT b.bin, MAX(m.ms) AS iso_rate
      FROM bins b JOIN minsuf m ON m.j <= b.bin
      GROUP BY b.bin)
    SELECT CAST(b.bin AS BIGINT) AS bin, b.nb AS n_docs, b.pb AS n_pos,
           CAST((b.pb * 2000000 + b.nb) // (2 * b.nb) AS BIGINT)
             AS raw_rate_e6,
           CAST(round(i.iso_rate * 1000000000) AS BIGINT) AS iso_rate_e9
    FROM bins b JOIN iso i ON i.bin = b.bin
    """,
)
def q_isotonic_calibration_pav(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Isotonic regression (pool-adjacent-violators) calibration of a
    score against the label, computed by the exact MINIMAX identity
    iso(i) = max_{j<=i} min_{k>=j} mean(y_j..y_k) — the closed form
    of PAV (Ayer et al. 1955, public), which turns the sequential
    pooling algorithm into three BOUNDED relational steps: an
    all-pairs (j,k) table over the ~14-bin score axis, a per-j suffix
    min, and a per-i prefix max. The calibrated rate is therefore
    monotone non-decreasing by construction, the property raw bin
    rates (classifier_calibration_bins) lack.

    Determinism: each candidate mean is ONE double division of exact
    longs (identical operands both engines); min/max over identical
    doubles are identical; iso_rate_e9 is one half-away round.

    Scale shape: the corpus collapses to a per-mille-bounded bin table in one
    map-side-combinable groupBy; everything after runs on O(B^2)~200
    rows via broadcast joins — bin count is FIXED by the score
    domain, not data. At 100 TB the plan is unchanged: one scan, then
    constant-size algebra (bin count is fixed by the score domain
    0..100 per-mille, not by data).

    Reference parity: none — the standard score-calibration operator
    between the reliability diagram and downstream sampling weights.
    """
    docs = load_table(spark, sf_dir, "documents")
    scored = docs.where(F.length("text") > 0).select(
        F.when(F.col("lang") == "en", 1).otherwise(0).cast("long").alias("y"),
        F.expr(
            f"((100000 * (length({fold_sql('text')})"
            f" - length(replace({fold_sql('text')}, 'e', ''))))"
            " div length(text)) div 1000"
        ).alias("bin"),
    )
    bins = scored.groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("nb"),
        F.sum("y").cast("long").alias("pb"),
    )
    cum = _cum_by_value(
        bins.select(F.col("bin").alias("v"), F.col("pb").alias("a"), F.col("nb").alias("t"))
    ).select(
        F.col("v").alias("bin"),
        F.col("a").alias("pb"),
        F.col("t").alias("nb"),
        F.col("cum_a").alias("cp"),
        F.col("cum_t").alias("cn"),
    )
    a = cum.select(
        F.col("bin").alias("j"),
        F.col("cp").alias("cp_j"),
        F.col("cn").alias("cn_j"),
        F.col("pb").alias("pb_j"),
        F.col("nb").alias("nb_j"),
    )
    b = cum.select(
        F.col("bin").alias("k"),
        F.col("cp").alias("cp_k"),
        F.col("cn").alias("cn_k"),
    )
    # broadcast-ok: one row per score bin — fixed bin count
    pairs = a.join(F.broadcast(b), F.col("k") >= F.col("j")).select(
        "j",
        (
            (F.col("cp_k") - F.col("cp_j") + F.col("pb_j")).cast("double")
            / (F.col("cn_k") - F.col("cn_j") + F.col("nb_j")).cast("double")
        ).alias("avg_jk"),
    )
    minsuf = pairs.groupBy("j").agg(F.min("avg_jk").alias("ms"))
    iso = (
        bins.select("bin")
        # broadcast-ok: one row per score bin — fixed bin count
        .join(F.broadcast(minsuf), F.col("j") <= F.col("bin"))
        .groupBy("bin")
        .agg(F.max("ms").alias("iso_rate"))
    )
    return (
        # broadcast-ok: one row per score bin — fixed bin count
        bins.join(F.broadcast(iso), "bin")
        .select(
            F.col("bin").cast("long").alias("bin"),
            F.col("nb").alias("n_docs"),
            F.col("pb").alias("n_pos"),
            F.expr(
                "CAST((pb * 2000000 + nb) div (2 * nb) AS BIGINT)"
            ).alias("raw_rate_e6"),
            F.round(F.col("iso_rate") * 1000000000)
            .cast("long")
            .alias("iso_rate_e9"),
        )
    )


@query(
    "weighted_sample_ares",
    oracle="""
    WITH w AS (
      SELECT o_orderkey, o_orderpriority AS priority,
             CAST(floor(o_totalprice * 100) AS BIGINT) AS w_cents,
             ('0x' || substr(md5('ares_' || o_orderkey), 1, 8))::BIGINT
               AS h
      FROM orders),
    keyed AS (
      SELECT o_orderkey, priority, w_cents,
             CAST(round(ln((h + 1) / 4294967296.0) * 1000000000000
                        / w_cents, 12) AS DECIMAL(28,12)) AS k
      FROM w WHERE w_cents > 0),
    ranked AS (
      SELECT o_orderkey AS orderkey, priority, w_cents,
             ROW_NUMBER() OVER (PARTITION BY priority
                                ORDER BY k DESC, o_orderkey) AS rnk
      FROM keyed)
    SELECT priority, CAST(rnk AS BIGINT) AS rnk, orderkey, w_cents
    FROM ranked WHERE rnk <= 10
    """,
)
def q_weighted_sample_ares(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement, A-Res (Efraimidis &
    Spirakis 2006, public): per priority stratum, the 10 orders with
    the largest u^(1/w) key, where u is a DETERMINISTIC md5-derived
    uniform — so the 'random' sample is reproducible across engines,
    reruns, and partitionings, the property a 100 TB pipeline needs
    for auditable sampling.

    The key is compared in log space (ln(u)/w, order-isomorphic to
    u^(1/w)) and ROUNDED to 12 dp before ranking — the repo's
    rounded-ln convention applied to an ORDERING: both engines rank
    identical DECIMAL keys, and the orderkey tiebreak settles exact
    collisions. u = (h+1)/2^32 in (0, 1] from the md5 32-bit prefix;
    weights are exact cents (always positive for order totals).

    Scale shape: one scan computes keys; per-stratum top-k is a
    partitioned window over priority (5 strata). At larger k/strata
    counts this becomes TakeOrdered per group — never a global sort.

    Reference parity: none — the weighted counterpart of hash_sample
    / stratified_sample_quota / pps_systematic_sample.
    """
    orders = load_table(spark, sf_dir, "orders")
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("ares_"), F.col("o_orderkey").cast("string"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    keyed = orders.select(
        F.col("o_orderkey").alias("orderkey"),
        F.col("o_orderpriority").alias("priority"),
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("w_cents"),
        h.alias("h"),
    ).where(
        # A-Res: a zero-weight item has zero selection probability —
        # excluded by definition (also guards the ln/w division)
        F.col("w_cents") > 0
    ).select(
        "orderkey",
        "priority",
        "w_cents",
        F.round(
            F.log((F.col("h") + 1) / F.lit(4294967296.0))
            * 1000000000000
            / F.col("w_cents"),
            12,
        )
        .cast("decimal(28,12)")
        .alias("k"),
    )
    w = Window.partitionBy("priority").orderBy(
        F.col("k").desc(), F.col("orderkey").asc()
    )
    return (
        keyed.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 10)
        .select(
            "priority",
            F.col("rnk").cast("long").alias("rnk"),
            "orderkey",
            "w_cents",
        )
    )


@query(
    "ams_f2_sketch",
    oracle=f"""
    WITH tok AS (
      SELECT unnest(list_filter(string_split_regex({fold_sql('text')},
                                '[ \\t\\n\\x0B\\f\\r]+'), t -> t <> '')) AS t
      FROM documents),
    freq AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS f FROM tok GROUP BY t),
    reps AS (SELECT unnest(range(0, 16)) AS j),
    z AS (
      SELECT j,
             CAST(SUM(CASE WHEN ('0x' || substr(md5('ams' || j || '_'
                                  || t), 1, 8))::BIGINT % 2 = 0
                           THEN f ELSE -f END) AS BIGINT) AS z
      FROM freq, reps GROUP BY j),
    est AS (SELECT j, z * z AS e FROM z),
    ranked AS (
      SELECT a.e,
             CAST(COUNT(*) AS BIGINT) AS rnk
      FROM est a JOIN est b
        ON b.e < a.e OR (b.e = a.e AND b.j <= a.j)
      GROUP BY a.e, a.j),
    med AS (SELECT e AS f2_est FROM ranked WHERE rnk = 8),
    ex AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_distinct,
             CAST(SUM(f * f) AS BIGINT) AS f2_exact
      FROM freq)
    SELECT ex.n_distinct, ex.f2_exact, med.f2_est,
           CAST(round(abs(CAST(med.f2_est - ex.f2_exact AS DOUBLE))
                      * 1000000 / CAST(ex.f2_exact AS DOUBLE))
                AS BIGINT) AS rel_err_e6
    FROM ex, med
    """,
)
def q_ams_f2_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AMS second-moment (F2) sketch (Alon-Matias-Szegedy 1996,
    public) with EXACT self-verification — the sketch family member
    CMS/HLL/KMV don't cover: 16 independent +/-1-hash estimators
    z_j = sum sign_j(t)*f(t), each squaring to an unbiased F2
    estimate, combined by the LOWER MEDIAN (exact integer — no
    averaging) and reported against the exact F2 = sum f^2 with the
    relative error, so the hash fails if the estimator ever drifts
    (the approx_median_bounded / ann_recall_eval self-certifying
    pattern).

    Determinism: signs are md5 parity (identical both engines); every
    z_j is an exact long; the 16-estimator median comes from a
    broadcast rank self-join over 16 rows with a (value, j) total
    order — no global window.

    Scale shape: ONE groupBy(token) frequency shuffle, then a 16-way
    conditional-sum agg (map-side combinable — the permutation-test
    discipline: replicates cost partials, not shuffles). At 100 TB
    the sketch is mergeable by construction: z vectors add across
    partitions.

    Reference parity: none — sketch surface (SURVEY beyond-reference
    mandate).
    """
    from concurrent_etl_spark.operators.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    freq = (
        docs.select(
            F.explode(tokens(ascii_fold("text"))).alias("t")
        )
        .groupBy("t")
        .agg(F.count(F.lit(1)).cast("long").alias("f"))
    )
    reps = spark.range(0, 16).select(F.col("id").alias("j"))
    sign_even = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("ams"),
                        F.col("j").cast("string"),
                        F.lit("_"),
                        F.col("t"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 2
        == 0
    )
    z = (
        freq.crossJoin(F.broadcast(reps))
        .groupBy("j")
        .agg(
            F.sum(F.when(sign_even, F.col("f")).otherwise(-F.col("f")))
            .cast("long")
            .alias("z")
        )
    )
    est = z.select("j", (F.col("z") * F.col("z")).alias("e"))
    a = est.select(F.col("j").alias("ja"), F.col("e").alias("ea"))
    b = est.select(F.col("j").alias("jb"), F.col("e").alias("eb"))
    ranked = (
        a.join(
            # broadcast-ok: one row per AMS repetition (16 rows)
            F.broadcast(b),
            (F.col("eb") < F.col("ea"))
            | ((F.col("eb") == F.col("ea")) & (F.col("jb") <= F.col("ja"))),
        )
        .groupBy("ja", "ea")
        .agg(F.count(F.lit(1)).alias("rnk"))
    )
    med = ranked.where(F.col("rnk") == 8).select(
        F.col("ea").alias("f2_est")
    )
    ex = freq.agg(
        F.count(F.lit(1)).cast("long").alias("n_distinct"),
        F.sum(F.col("f") * F.col("f")).cast("long").alias("f2_exact"),
    )
    # broadcast-ok: single median row
    return ex.crossJoin(F.broadcast(med)).select(
        "n_distinct",
        "f2_exact",
        "f2_est",
        F.round(
            F.abs((F.col("f2_est") - F.col("f2_exact")).cast("double"))
            * 1000000
            / F.col("f2_exact").cast("double")
        )
        .cast("long")
        .alias("rel_err_e6"),
    )


@query(
    "conformal_threshold_coverage",
    oracle="""
    WITH base AS (
      SELECT event_id, event_type,
             CAST(floor(value * 100) AS BIGINT) AS cents
      FROM events),
    mu AS (
      SELECT event_type,
             CAST((SUM(cents) * 2 + COUNT(*))
                  // (2 * COUNT(*)) AS BIGINT) AS mean_cents
      FROM base WHERE event_id % 2 = 0 GROUP BY event_type),
    cal AS (
      SELECT abs(b.cents - m.mean_cents) AS s
      FROM base b JOIN mu m USING (event_type)
      WHERE b.event_id % 2 = 0),
    n_cal AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM cal),
    thr AS (
      SELECT s AS threshold FROM (
        SELECT s, ROW_NUMBER() OVER (ORDER BY s, s) AS rn FROM cal),
        n_cal
      WHERE rn = CAST(ceil((n + 1) * 0.9) AS BIGINT)),
    test AS (
      SELECT abs(b.cents - m.mean_cents) AS s
      FROM base b JOIN mu m USING (event_type)
      WHERE b.event_id % 2 = 1)
    SELECT n_cal.n AS n_calibration,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM test) AS n_test,
           thr.threshold,
           (SELECT CAST(SUM(CASE WHEN s <= thr.threshold
                                 THEN 1 ELSE 0 END) AS BIGINT)
            FROM test) AS n_covered,
           CAST(((SELECT SUM(CASE WHEN s <= thr.threshold
                                  THEN 1 ELSE 0 END) FROM test)
                 * 2000000 + (SELECT COUNT(*) FROM test))
                // (2 * (SELECT COUNT(*) FROM test)) AS BIGINT)
             AS coverage_e6
    FROM n_cal, thr
    WHERE (SELECT COUNT(*) FROM test) > 0
    """,
)
def q_conformal_threshold_coverage(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Split conformal prediction (Vovk et al.; Angelopoulos & Bates
    2021 tutorial — public): calibrate a distribution-free 90%
    prediction band for event value around a per-type mean predictor
    on the even-id half, then AUDIT empirical coverage on the odd-id
    half. The threshold is the ceil((n+1)*0.9)-th smallest
    nonconformity score — an EXACT order statistic (integer cents),
    found here without a global sort: the bucket-offset cumsum gives
    each distinct score its exact rank, and the target rank selects
    the threshold (the oracle states it with DuckDB's single-node
    row_number instead).

    Everything is integer: per-type means use the half-up integral
    trick, scores are absolute cent deviations, coverage is an e6
    ratio of exact counts. The conformal guarantee (coverage >=
    90% in expectation) shows up as an auditable number, not a
    belief — tests assert the threshold's defining rank property on
    the calibration set.

    Scale shape: one groupBy(type) for the predictor; score
    computation is a broadcast join; the rank lookup rides the
    bounded-collect cumsum; the coverage audit is one
    map-side-combinable agg. No global sort at any size.

    Reference parity: none — uncertainty-quantification surface for
    the model-evaluation family (auc/calibration/isotonic).
    """
    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        "event_id",
        "event_type",
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
    )
    cal_half = base.where(F.col("event_id") % 2 == 0)
    mu = cal_half.groupBy("event_type").agg(
        F.expr(
            "CAST((SUM(cents) * 2 + COUNT(*)) div (2 * COUNT(*))"
            " AS BIGINT)"
        ).alias("mean_cents")
    )
    # broadcast-ok: one row per event_type — bounded enum
    cal = cal_half.join(F.broadcast(mu), "event_type").select(
        F.abs(F.col("cents") - F.col("mean_cents")).alias("v")
    )
    n_cal = cal.agg(F.count(F.lit(1)).cast("long").alias("n"))
    pv = cal.groupBy("v").agg(
        F.lit(0).cast("long").alias("a"), F.count(F.lit(1)).alias("t")
    )
    # exact order statistic via the bucket-offset cumsum: the
    # threshold is the smallest distinct score whose inclusive
    # cumulative count reaches rank = ceil((n+1)*0.9)
    ranked = _cum_by_value(pv).crossJoin(F.broadcast(n_cal))
    rank_target = F.ceil((F.col("n") + 1) * 0.9).cast("long")
    thr = (
        ranked.where(F.col("cum_t") >= rank_target)
        .agg(F.min("v").alias("threshold"))
    )
    test = (
        base.where(F.col("event_id") % 2 == 1)
        # broadcast-ok: one row per event_type — bounded enum
        .join(F.broadcast(mu), "event_type")
        .select(F.abs(F.col("cents") - F.col("mean_cents")).alias("s"))
    )
    cov = test.crossJoin(F.broadcast(thr)).agg(
        F.count(F.lit(1)).cast("long").alias("n_test"),
        F.sum(F.when(F.col("s") <= F.col("threshold"), 1).otherwise(0))
        .cast("long")
        .alias("n_covered"),
        F.max("threshold").alias("threshold"),
    )
    return (
        n_cal.crossJoin(F.broadcast(cov))
        # coverage undefined without BOTH halves: zero rows, matching
        # the oracle's empty-thr join collapse + its n_test guard
        .where(F.col("threshold").isNotNull() & (F.col("n_test") > 0))
        .select(
            F.col("n").alias("n_calibration"),
            "n_test",
            "threshold",
            "n_covered",
            F.expr(
                "CAST((n_covered * 2000000 + n_test) div (2 * n_test)"
                " AS BIGINT)"
            ).alias("coverage_e6"),
        )
    )


@query(
    "diff_in_differences",
    oracle="""
    WITH cells AS (
      SELECT ('0x' || substr(md5('ab_' || user_id), 1, 8))::BIGINT % 2
               AS treated,
             CASE WHEN ts >= TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END
               AS post,
             CAST(floor(value * 100) AS BIGINT) AS cents
      FROM events),
    agg AS (
      SELECT treated, post,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(cents) AS BIGINT) AS s
      FROM cells GROUP BY treated, post),
    did AS (
      SELECT CAST(round(
               (MAX(CASE WHEN treated = 1 AND post = 1
                         THEN CAST(s AS DOUBLE) / n END)
                - MAX(CASE WHEN treated = 1 AND post = 0
                           THEN CAST(s AS DOUBLE) / n END))
               - (MAX(CASE WHEN treated = 0 AND post = 1
                           THEN CAST(s AS DOUBLE) / n END)
                  - MAX(CASE WHEN treated = 0 AND post = 0
                             THEN CAST(s AS DOUBLE) / n END)))
             AS BIGINT) AS did_cents
      FROM agg)
    SELECT treated, post, n, s,
           CAST((s * 200 + n) // (2 * n) AS BIGINT) AS mean_e2,
           did.did_cents
    FROM agg, did
    """,
)
def q_diff_in_differences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences estimator over the hash-assigned
    experiment (ab_srm_bucketing_audit's md5 arms x the CUPED
    pre/post split): DID = (treated_post - treated_pre) -
    (control_post - control_pre), the workhorse causal readout when
    assignment is clean but a time trend contaminates the naive
    post-only comparison.

    The 2x2 cell table is exact integers (counts + cent sums); each
    cell mean is one double division of exact longs and the DID
    estimate one rounded combination of the four — identical IEEE
    ops both engines. Per-cell e2 means use the integral half-up
    trick so the table itself is integer-auditable.

    Scale shape: one map-side-combinable groupBy to the 4-cell
    table; the estimate is constant-size algebra on it. The cheapest
    possible causal readout at any scale.

    Reference parity: none — completes the experimentation family
    (SRM gate -> CUPED sensitivity -> permutation significance ->
    DID effect estimate).
    """
    ev = load_table(spark, sf_dir, "events")
    treated = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("ab_"), F.col("user_id").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 2
    )
    cut = F.lit("2024-01-16 00:00:00").cast("timestamp")
    cells = ev.select(
        treated.alias("treated"),
        F.when(F.col("ts") >= cut, 1).otherwise(0).cast("long").alias("post"),
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
    )
    agg = cells.groupBy("treated", "post").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("s"),
    )
    mean_of = lambda t, p: F.max(
        F.when(
            (F.col("treated") == t) & (F.col("post") == p),
            F.col("s").cast("double") / F.col("n"),
        )
    )
    did = agg.agg(
        F.round(
            (mean_of(1, 1) - mean_of(1, 0)) - (mean_of(0, 1) - mean_of(0, 0))
        )
        .cast("long")
        .alias("did_cents")
    )
    return agg.crossJoin(F.broadcast(did)).select(
        "treated",
        "post",
        "n",
        "s",
        F.expr("CAST((s * 200 + n) div (2 * n) AS BIGINT)").alias("mean_e2"),
        "did_cents",
    )


@query(
    "crosscorr_lead_lag",
    oracle="""
    WITH daily AS (
      SELECT (epoch_us(ts) // 86400000000) AS d,
             CAST(SUM(CASE WHEN event_type = 'view'
                           THEN CAST(floor(value * 100) AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS x,
             CAST(SUM(CASE WHEN event_type = 'purchase'
                           THEN CAST(floor(value * 100) AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS y
      FROM events GROUP BY 1),
    st AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy
      FROM daily),
    dd AS (
      SELECT SUM(CAST(n * x - sx AS DECIMAL(38,0)) * (n * x - sx)) AS dx,
             SUM(CAST(n * y - sy AS DECIMAL(38,0)) * (n * y - sy)) AS dy
      FROM daily, st),
    lags AS (SELECT unnest(range(-3, 4)) AS k),
    num AS (
      SELECT k, CAST(COUNT(*) AS BIGINT) AS n_pairs,
             SUM(CAST(st.n * a.x - st.sx AS DECIMAL(38,0))
                 * (st.n * b.y - st.sy)) AS nn
      FROM daily a
      CROSS JOIN lags
      JOIN daily b ON b.d = a.d + k
      CROSS JOIN st
      GROUP BY k)
    SELECT CAST(k AS BIGINT) AS k, n_pairs,
           CASE WHEN dx > 0 AND dy > 0 THEN
             CAST(round(CAST(nn AS DOUBLE) * 1000000
                        / sqrt(CAST(dx AS DOUBLE) * CAST(dy AS DOUBLE)))
                  AS BIGINT) END AS xcorr_e6
    FROM num, dd
    ORDER BY k
    """,
)
def q_crosscorr_lead_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lead-lag cross-correlation between the daily VIEW and PURCHASE
    revenue series at lags -3..+3 — the do-views-lead-purchases
    question, the bivariate counterpart of acf_lags. A positive-lag
    peak means x leads y; the asymmetry across k is the directional
    signal autocorrelation cannot express.

    Same exactness scheme as acf_lags: the N^2-scaled demeaned
    cross-moment sum((N*x_t - Sx)(N*y_{t+k} - Sy)) accumulates in
    DECIMAL(38,0); the normalizer sqrt(dx*dy) and one division happen
    once per lag in double on exact operands, rounded to e6.

    Scale shape: one map-side-combinable daily rollup (conditional
    sums split the two series in the same pass — no second scan);
    each lag is an equi-join of the date-bounded series against
    itself with a broadcast 7-row lag table. Day arithmetic is pure
    epoch integer math.

    Reference parity: none — time-series surface over events.
    """
    ev = load_table(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100).cast("long")
    daily = ev.groupBy(
        F.expr("unix_micros(ts) div 86400000000").alias("d")
    ).agg(
        F.sum(F.when(F.col("event_type") == "view", cents).otherwise(0))
        .cast("long")
        .alias("x"),
        F.sum(
            F.when(F.col("event_type") == "purchase", cents).otherwise(0)
        )
        .cast("long")
        .alias("y"),
    )
    st = daily.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
    )
    devx = F.col("n").cast("decimal(38,0)") * F.col("x") - F.col("sx")
    devy = F.col("n").cast("decimal(38,0)") * F.col("y") - F.col("sy")
    dd = daily.crossJoin(F.broadcast(st)).agg(
        F.sum(devx * devx).alias("dx"), F.sum(devy * devy).alias("dy")
    )
    lags = spark.range(-3, 4).select(F.col("id").cast("long").alias("k"))
    a = daily.select(F.col("d").alias("da"), F.col("x").alias("xa"))
    b = daily.select(F.col("d").alias("db"), F.col("y").alias("yb"))
    pairs = (
        a.crossJoin(F.broadcast(lags))
        .withColumn("dt", F.col("da") + F.col("k"))
        .join(b, F.col("db") == F.col("dt"))
        .crossJoin(F.broadcast(st))
    )
    deva = F.col("n").cast("decimal(38,0)") * F.col("xa") - F.col("sx")
    devb = F.col("n").cast("decimal(38,0)") * F.col("yb") - F.col("sy")
    num = pairs.groupBy("k").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum(deva * devb).alias("nn"),
    )
    return (
        num.crossJoin(F.broadcast(dd))
        .select(
            "k",
            "n_pairs",
            # constant-series guard: correlation undefined when a
            # series has zero variance — NULL, not a job kill
            F.when(
                (F.col("dx") > 0) & (F.col("dy") > 0),
                F.round(
                    F.col("nn").cast("double")
                    * 1000000
                    / F.sqrt(
                        F.col("dx").cast("double")
                        * F.col("dy").cast("double")
                    )
                ),
            )
            .cast("long")
            .alias("xcorr_e6"),
        )
        .orderBy("k")
    )


@query(
    "spearman_rank_correlation",
    oracle="""
    WITH vals AS (
      SELECT CAST(floor(o_totalprice * 100) AS BIGINT) AS x,
             CAST(length(o_orderpriority) * 1000
                  + o_orderkey % 97 AS BIGINT) AS y
      FROM orders),
    rkx AS (
      SELECT x, CAST(2 * cum - t + 1 AS BIGINT) AS rx2 FROM (
        SELECT x, COUNT(*) AS t,
               SUM(COUNT(*)) OVER (ORDER BY x) AS cum
        FROM vals GROUP BY x)),
    rky AS (
      SELECT y, CAST(2 * cum - t + 1 AS BIGINT) AS ry2 FROM (
        SELECT y, COUNT(*) AS t,
               SUM(COUNT(*)) OVER (ORDER BY y) AS cum
        FROM vals GROUP BY y)),
    r AS (
      SELECT rkx.rx2, rky.ry2 FROM vals
      JOIN rkx USING (x) JOIN rky USING (y)),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(rx2) AS BIGINT) AS sx,
             CAST(SUM(ry2) AS BIGINT) AS sy,
             SUM(CAST(rx2 AS DECIMAL(38,0)) * rx2) AS sxx,
             SUM(CAST(ry2 AS DECIMAL(38,0)) * ry2) AS syy,
             SUM(CAST(rx2 AS DECIMAL(38,0)) * ry2) AS sxy
      FROM r)
    SELECT n,
           CAST(round(
             CAST(CAST(n AS DECIMAL(38,0)) * sxy
                  - CAST(sx AS DECIMAL(38,0)) * sy AS DOUBLE) * 1000000
             / sqrt(CAST(CAST(n AS DECIMAL(38,0)) * sxx
                         - CAST(sx AS DECIMAL(38,0)) * sx AS DOUBLE)
                    * CAST(CAST(n AS DECIMAL(38,0)) * syy
                           - CAST(sy AS DECIMAL(38,0)) * sy AS DOUBLE)))
             AS BIGINT) AS spearman_e6
    FROM m
    """,
)
def q_spearman_rank_correlation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Spearman rank correlation, exact with ties: both variables map
    to DOUBLED average ranks (2*cum - t + 1 per distinct value — the
    mann_whitney_u identity), every row gets its rank pair by joining
    the rank tables back, and rho is Pearson on the exact integer
    ranks — DECIMAL(38,0) cross-moments, ONE double expression at the
    end. The monotone-dependence measure corr_family_exact's linear
    Pearson cannot see.

    No global sort: per-distinct-value rank tables come from the
    bucket-offset cumsum (value-domain-bounded), then broadcast back
    onto the rows. The oracle states the ranks with single-node
    cumulative windows instead.

    Scale shape: two groupBys (one per variable's distinct values) +
    two rank joins + one 1-row moment aggregate. At 100 TB the rank
    tables are value-domain-sized, not row-sized.
    """
    orders = load_table(spark, sf_dir, "orders")
    vals = orders.select(
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("x"),
        (
            F.length("o_orderpriority") * 1000
            + F.col("o_orderkey") % 97
        )
        .cast("long")
        .alias("y"),
    )

    def _ranks(col: str) -> DataFrame:
        pv = vals.groupBy(F.col(col).alias("v")).agg(
            F.lit(0).cast("long").alias("a"),
            F.count(F.lit(1)).alias("t"),
        )
        return _cum_by_value(pv).select(
            F.col("v").alias(col),
            (2 * F.col("cum_t") - F.col("t") + 1).alias(f"r{col}2"),
        )

    # rank tables are value-domain-sized: small enough for AQE to
    # broadcast at test scale, shuffle-joinable when the domain is
    # large — no forced hint (the no-forced-broadcast-on-scaled-
    # tables rule, SCALE.md section 12)
    r = vals.join(_ranks("x"), "x").join(_ranks("y"), "y")
    rx = F.col("rx2").cast("decimal(38,0)")
    ry = F.col("ry2").cast("decimal(38,0)")
    m = r.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("rx2").cast("long").alias("sx"),
        F.sum("ry2").cast("long").alias("sy"),
        F.sum(rx * F.col("rx2")).alias("sxx"),
        F.sum(ry * F.col("ry2")).alias("syy"),
        F.sum(rx * F.col("ry2")).alias("sxy"),
    )
    nd = F.col("n").cast("decimal(38,0)")
    cxy = (nd * F.col("sxy") - F.col("sx").cast("decimal(38,0)") * F.col("sy")).cast("double")
    cxx = (nd * F.col("sxx") - F.col("sx").cast("decimal(38,0)") * F.col("sx")).cast("double")
    cyy = (nd * F.col("syy") - F.col("sy").cast("decimal(38,0)") * F.col("sy")).cast("double")
    return m.select(
        "n",
        # zero-variance guard (one-day corpus sweep, round 6): with
        # n = 1 or an all-tied variable the denominator is 0 — DuckDB
        # float x/0 is NULL while Spark ANSI kills the job; emit NULL
        # exactly where the oracle does
        F.when(
            cxx * cyy > 0,
            F.round(cxy * 1000000 / F.sqrt(cxx * cyy)).cast("long"),
        )
        .otherwise(F.lit(None).cast("long"))
        .alias("spearman_e6"),
    )


@query(
    "mutual_information_binned",
    oracle="""
    WITH b AS (
      SELECT CAST(floor(l_extendedprice / 10000) AS BIGINT) AS px,
             CAST(l_quantity AS BIGINT) // 10 AS qy
      FROM lineitem),
    cells AS (
      SELECT px, qy, CAST(COUNT(*) AS BIGINT) AS c
      FROM b GROUP BY px, qy),
    rt AS (SELECT px, CAST(SUM(c) AS BIGINT) AS r FROM cells GROUP BY px),
    ct AS (SELECT qy, CAST(SUM(c) AS BIGINT) AS t FROM cells GROUP BY qy),
    nn AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM cells),
    terms AS (
      SELECT cells.px, cells.qy, c, r, t,
             CAST(c AS DECIMAL(38,0))
               * CAST(CAST(round(ln(CAST(n AS DOUBLE) * c
                                    / (CAST(r AS DOUBLE) * t)), 12)
                           AS DECIMAL(24,12)) * 1000000000000 AS BIGINT)
               AS term
      FROM cells JOIN rt USING (px) JOIN ct USING (qy) CROSS JOIN nn)
    SELECT nn.n AS n_rows,
           CAST(COUNT(*) AS BIGINT) AS n_cells,
           CAST(SUM(term) AS BIGINT) AS mi_n_e12
    FROM terms, nn GROUP BY nn.n
    """,
)
def q_mutual_information_binned(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Mutual information between binned price and quantity — the
    nonlinear-dependence measure completing the trio (Pearson:
    linear; Spearman: monotone; MI: any): n*I(X;Y) = sum_cells
    c * ln(n*c/(r*t)), each term an exact count times a rounded-ln
    e12 long (the info_gain identity extended to two dimensions), so
    the statistic is integer-exact and partition-invariant.

    Scale shape: ONE map-side-combinable groupBy to the bin-domain-
    bounded contingency table; marginals broadcast back onto it;
    constant-size algebra after. Bin widths are fixed by the data
    model (price/10000, quantity/10), not data-derived.
    """
    li = load_table(spark, sf_dir, "lineitem")
    b = li.select(
        F.floor(F.col("l_extendedprice") / 10000).cast("long").alias("px"),
        F.expr("CAST(l_quantity AS BIGINT) div 10").alias("qy"),
    )
    cells = b.groupBy("px", "qy").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    rt = cells.groupBy("px").agg(F.sum("c").cast("long").alias("r"))
    ct = cells.groupBy("qy").agg(F.sum("c").cast("long").alias("t"))
    nn = cells.agg(F.sum("c").cast("long").alias("n"))
    term = F.col("c").cast("decimal(38,0)") * (
        F.round(
            F.log(
                F.col("n").cast("double")
                * F.col("c")
                / (F.col("r").cast("double") * F.col("t"))
            ),
            12,
        ).cast("decimal(24,12)")
        * 1000000000000
    ).cast("long")
    return (
        # broadcast-ok: marginals over fixed histogram bins
        cells.join(F.broadcast(rt), "px")
        # broadcast-ok: marginals over fixed histogram bins
        .join(F.broadcast(ct), "qy")
        .crossJoin(F.broadcast(nn))
        .select("n", term.alias("term"))
        .groupBy("n")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_cells"),
            F.sum("term").cast("long").alias("mi_n_e12"),
        )
        .select(
            F.col("n").alias("n_rows"),
            "n_cells",
            "mi_n_e12",
        )
    )


@query(
    "conversion_latency_quantiles",
    oracle="""
    WITH pu AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'view'
                      THEN epoch_us(ts) END) AS tv,
             MIN(CASE WHEN event_type = 'purchase'
                      THEN epoch_us(ts) END) AS tp
      FROM events GROUP BY user_id),
    lat AS (
      SELECT (tp - tv) // 60000000 AS mins FROM pu
      WHERE tv IS NOT NULL AND tp IS NOT NULL AND tp > tv),
    n_tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM lat),
    ranked AS (
      SELECT mins, COUNT(*) AS t,
             SUM(COUNT(*)) OVER (ORDER BY mins) AS cum
      FROM lat GROUP BY mins),
    qs AS (SELECT unnest(ARRAY[25, 50, 90]) AS q),
    picks AS (
      SELECT q,
             (SELECT MIN(mins) FROM ranked, n_tot
              WHERE cum * 100 >= q * n) AS latency_mins
      FROM qs)
    SELECT CAST(q AS BIGINT) AS q, n_tot.n AS n_converters,
           CAST(latency_mins AS BIGINT) AS latency_mins
    FROM picks, n_tot
    """,
)
def q_conversion_latency_quantiles(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Time-to-convert distribution: exact p25/p50/p90 of the
    first-view -> first-purchase latency in whole minutes — the
    funnel's 'how long does conversion take' readout, with every
    quantile an EXACT order statistic (smallest value whose
    cumulative count covers q% of converters — the integer-safe
    cum*100 >= q*n form, no interpolation, no floats).

    No global sort: the latency axis is groupBy'd per distinct
    minute and ranked by the bucket-offset cumsum; the three
    quantile probes are a broadcast 3-row grid joined against the
    (domain-bounded) ranked table.

    Scale shape: one groupBy(user) with conditional MINs (both
    funnel stages in one pass), one latency-domain groupBy, bounded
    algebra after. Complements funnel_conversion (who converts) and
    retention_cohorts (when they return).
    """
    ev = load_table(spark, sf_dir, "events")
    pu = ev.groupBy("user_id").agg(
        F.min(
            F.when(F.col("event_type") == "view", F.unix_micros("ts"))
        ).alias("tv"),
        F.min(
            F.when(
                F.col("event_type") == "purchase", F.unix_micros("ts")
            )
        ).alias("tp"),
    )
    lat = pu.where(
        F.col("tv").isNotNull()
        & F.col("tp").isNotNull()
        & (F.col("tp") > F.col("tv"))
    ).select(F.expr("(tp - tv) div 60000000").alias("v"))
    n_tot = lat.agg(F.count(F.lit(1)).cast("long").alias("n"))
    pv = lat.groupBy("v").agg(
        F.lit(0).cast("long").alias("a"), F.count(F.lit(1)).alias("t")
    )
    ranked = _cum_by_value(pv).crossJoin(F.broadcast(n_tot))
    qs = spark.createDataFrame([(25,), (50,), (90,)], "q long")
    # grid-preserving: with zero converters the oracle's correlated
    # MIN yields a 3-row grid with NULL latencies — mirror that with
    # a left join instead of a filter+groupBy (which would drop the
    # probe grid entirely)
    hit = (
        ranked.crossJoin(F.broadcast(qs))
        .where(F.col("cum_t") * 100 >= F.col("q") * F.col("n"))
        .groupBy("q")
        .agg(F.min("v").alias("latency_mins"))
    )
    picks = qs.crossJoin(F.broadcast(n_tot)).join(hit, "q", "left")
    return picks.select(
        F.col("q").cast("long").alias("q"),
        F.col("n").alias("n_converters"),
        F.col("latency_mins").cast("long").alias("latency_mins"),
    )


@query(
    "weighted_median_exact",
    oracle="""
    WITH v AS (
      SELECT l_returnflag AS flag,
             CAST(floor(l_extendedprice * 100) AS BIGINT) AS cents,
             CAST(l_quantity AS BIGINT) AS w
      FROM lineitem),
    g AS (
      SELECT flag, cents, CAST(SUM(w) AS BIGINT) AS w
      FROM v GROUP BY flag, cents),
    c AS (
      SELECT flag, cents, w,
             SUM(w) OVER (PARTITION BY flag ORDER BY cents) AS cum,
             SUM(w) OVER (PARTITION BY flag) AS tot
      FROM g)
    SELECT flag, CAST(MIN(tot) AS BIGINT) AS total_weight,
           CAST(MIN(CASE WHEN 2 * cum >= tot THEN cents END) AS BIGINT)
             AS wmedian_cents
    FROM c GROUP BY flag
    """,
)
def q_weighted_median_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact WEIGHTED median per group: the smallest price whose
    cumulative quantity-weight covers half the group's total weight
    (lower weighted median, 2*cum >= tot in pure integers) — the
    robust 'typical price per unit SOLD' that the unweighted median
    (approx_median_bounded) and the mean (groupby_agg_pricing) both
    misstate when cheap items move in bulk.

    The cumulative weight runs over the DISTINCT (group, price) table
    — price-domain-bounded, not row-bounded — with a window
    PARTITIONED by group; weights and the threshold comparison are
    exact longs, so the median is an exact order statistic at any
    partitioning.

    Scale shape: one map-side-combinable groupBy to the domain table,
    one partitioned window, one rollup. No global sort.
    """
    li = load_table(spark, sf_dir, "lineitem")
    g = (
        li.select(
            F.col("l_returnflag").alias("flag"),
            F.floor(F.col("l_extendedprice") * 100)
            .cast("long")
            .alias("cents"),
            F.col("l_quantity").cast("long").alias("w"),
        )
        .groupBy("flag", "cents")
        .agg(F.sum("w").cast("long").alias("w"))
    )
    wc = Window.partitionBy("flag").orderBy("cents")
    wt = Window.partitionBy("flag")
    c = g.select(
        "flag",
        "cents",
        F.sum("w").over(wc).alias("cum"),
        F.sum("w").over(wt).alias("tot"),
    )
    return c.groupBy("flag").agg(
        F.min("tot").cast("long").alias("total_weight"),
        F.min(
            F.when(2 * F.col("cum") >= F.col("tot"), F.col("cents"))
        )
        .cast("long")
        .alias("wmedian_cents"),
    )


@query(
    "rate_burst_windows",
    oracle="""
    WITH hourly AS (
      SELECT epoch_us(ts) // 3600000000 AS h,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM events GROUP BY 1),
    base AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_hours,
             CAST(SUM(n_events) AS BIGINT) AS total
      FROM hourly)
    SELECT CAST(h AS BIGINT) AS hour_epoch, n_events,
           CAST((total * 200 + n_hours) // (2 * n_hours) AS BIGINT)
             AS baseline_e2,
           CAST(n_events * n_hours AS BIGINT) AS rate_num,
           CAST(2 * total AS BIGINT) AS rate_den_2x
    FROM hourly, base
    WHERE n_events * n_hours > 2 * total
    """,
)
def q_rate_burst_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burst detection: hours whose event rate exceeds TWICE the
    all-corpus hourly baseline — the paging threshold of a rate
    monitor, stated as the pure integer cross-product test
    n_events * n_hours > 2 * total (no division decides a flag).
    Emitted with the e2-scaled baseline and both comparison sides so
    the alert is auditable.

    Scale shape: one map-side-combinable hourly rollup (hour domain
    bounded by the time span); the baseline is a broadcast scalar.
    The streaming form is the same rollup under a tumbling window —
    this is its batch certification.
    """
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.expr("unix_micros(ts) div 3600000000").alias("h")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    base = hourly.agg(
        F.count(F.lit(1)).cast("long").alias("n_hours"),
        F.sum("n_events").cast("long").alias("total"),
    )
    return (
        hourly.crossJoin(F.broadcast(base))
        .where(F.col("n_events") * F.col("n_hours") > 2 * F.col("total"))
        .select(
            F.col("h").cast("long").alias("hour_epoch"),
            "n_events",
            F.expr(
                "CAST((total * 200 + n_hours) div (2 * n_hours)"
                " AS BIGINT)"
            ).alias("baseline_e2"),
            (F.col("n_events") * F.col("n_hours"))
            .cast("long")
            .alias("rate_num"),
            (2 * F.col("total")).cast("long").alias("rate_den_2x"),
        )
    )


@query(
    "seasonal_zscore_anomalies",
    oracle="""
    WITH base AS (
      SELECT ((epoch_us(ts) // 86400000000) + 4) % 7 AS dow,
             (epoch_us(ts) % 86400000000) // 3600000000 AS hod,
             CAST(floor(value * 100) AS BIGINT) AS cents
      FROM events),
    cell AS (
      SELECT dow, hod, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(cents) AS BIGINT) AS s,
             SUM(CAST(cents AS DECIMAL(38,0)) * cents) AS ss
      FROM base GROUP BY dow, hod),
    flagged AS (
      SELECT b.dow, b.hod, c.n,
             CAST(SUM(CASE WHEN c.n >= 2
                   AND CAST(c.n AS DECIMAL(38,0))
                       * (CAST(c.n AS DECIMAL(38,0)) * b.cents - c.s)
                       * (CAST(c.n AS DECIMAL(38,0)) * b.cents - c.s)
                     > 9 * (CAST(c.n AS DECIMAL(38,0)) * c.ss
                            - CAST(c.s AS DECIMAL(38,0)) * c.s)
                   THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies
      FROM base b JOIN cell c ON c.dow = b.dow AND c.hod = b.hod
      GROUP BY b.dow, b.hod, c.n)
    SELECT CAST(dow AS BIGINT) AS dow, CAST(hod AS BIGINT) AS hod,
           n AS n_events, n_anomalies
    FROM flagged WHERE n_anomalies > 0
    """,
)
def q_seasonal_zscore_anomalies(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Seasonality-adjusted anomaly counts: an event is anomalous if
    its value sits more than 3 population-sigma from ITS OWN
    (day-of-week x hour) cell mean — the baseline seasonality_profile
    tabulates — with the 3-sigma test stated ENTIRELY in integers:
    n*(n*x - s)^2 > 9*(n*ss - s^2) cross-multiplies the z-score
    definition so no division, sqrt, or float ever decides a flag
    (DECIMAL(38,0) products; cells with n < 2 cannot flag).

    Scale shape: one groupBy to the 168-cell moment table, one
    broadcast join back onto the stream, one map-side-combinable
    flag count. The two scans are inherent (moments must exist
    before any row can be judged); at 100 TB the cell table is a
    constant-size broadcast.
    """
    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        F.expr("((unix_micros(ts) div 86400000000) + 4) % 7").alias("dow"),
        F.expr("(unix_micros(ts) % 86400000000) div 3600000000").alias(
            "hod"
        ),
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
    )
    cd = F.col("cents").cast("decimal(38,0)")
    cell = base.groupBy("dow", "hod").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("s"),
        F.sum(cd * F.col("cents")).alias("ss"),
    )
    nd = F.col("n").cast("decimal(38,0)")
    dev = nd * F.col("cents") - F.col("s")
    var_n2 = nd * F.col("ss") - F.col("s").cast("decimal(38,0)") * F.col("s")
    flagged = (
        # broadcast-ok: one row per (dow, hod) cell — at most 168 rows
        base.join(F.broadcast(cell), ["dow", "hod"])
        .groupBy("dow", "hod", "n")
        .agg(
            F.sum(
                F.when(
                    (F.col("n") >= 2) & (nd * dev * dev > 9 * var_n2), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_anomalies")
        )
    )
    return flagged.where(F.col("n_anomalies") > 0).select(
        F.col("dow").cast("long").alias("dow"),
        F.col("hod").cast("long").alias("hod"),
        F.col("n").alias("n_events"),
        "n_anomalies",
    )
