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
        li.join(F.broadcast(approx), "returnflag")
        .groupBy("returnflag")
        .agg(
            F.sum(
                F.when(F.col("l_extendedprice") <= F.col("_approx"), 1).otherwise(0)
            ).alias("_cnt_le")
        )
    )
    return (
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
