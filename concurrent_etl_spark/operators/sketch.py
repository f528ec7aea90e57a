"""Deterministic cardinality sketches for 100 TB-scale profiling.

KMV (k-minimum-values) distinct-count sketch: hash every value to a
uniform 60-bit integer, keep the k smallest DISTINCT hashes per group,
and estimate |distinct| from how densely the minima pack the hash
space:  est = (k-1) * 2^60 / h_(k)   (Bar-Yossef et al. 2002).

Why KMV and not HyperLogLog here: Spark's approx_count_distinct and
DuckDB's approx functions use engine-specific HLL variants whose
estimates cannot be compared across engines. KMV over md5 is fully
deterministic — both engines compute the identical k-th minimum hash
and therefore the identical estimate, so the sketch itself is
oracle-checkable, not just its error bound.

Scale shape (the reason sketches exist): the distinct pre-aggregation
shuffles at most the distinct hashes (map-side partial dedup), and the
rank<=k filter compiles to WindowGroupLimit (Spark 3.5+), which keeps
only k rows per group on the MAP side before the shuffle — the merge
of per-partition k-minima is exactly the KMV union operation, done by
the engine. Nothing in the plan holds more than k values per group.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

KMV_K = 256  #: sketch size (relative error ~ 1/sqrt(k) ≈ 6%)
HASH_BITS = 60  #: md5-prefix hash width (fits bigint, exact in double)
HASH_SPACE = float(2**HASH_BITS)


def hash60(col: Column | str) -> Column:
    """Uniform 60-bit hash of a value: first 15 hex digits of md5.

    Cross-engine deterministic (DuckDB: ('0x' || substr(md5(v),1,15))
    ::BIGINT); 60 bits so (k-1)*2^60 stays exact in a double.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 15), 16, 10).cast(
        "bigint"
    )


def kmv_distinct(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    k: int = KMV_K,
) -> DataFrame:
    """Per-group KMV distinct-count estimate.

    Returns (group..., n_kept, kth_min_hash, est_distinct):
      * n_kept < k  -> the group's distinct count is exact (= n_kept);
      * n_kept == k -> est = (k-1) * 2^60 / h_(k).

    est_distinct is a double computed identically in any IEEE engine:
    (k-1)*2^60 is exactly representable, and int64->double conversion
    + one division are deterministic.
    """
    group_cols = group_cols or []
    hashed = df.select(
        *group_cols, hash60(value_col).alias("h")
    ).dropDuplicates([*group_cols, "h"])
    if group_cols:
        # per-group k-minima: partitioned window; rank<=k compiles to
        # WindowGroupLimit (map-side k-row cap before the shuffle)
        w = Window.partitionBy(*group_cols).orderBy("h")
        kept = (
            hashed.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= k)
        )
    else:
        # global k-minima: sort+limit -> TakeOrderedAndProject
        # (per-partition k-row heaps, driver merge) — never a global
        # single-partition window
        kept = hashed.orderBy("h").limit(k)
    n_kept = F.count("*")
    kth = F.max("h")
    est = F.when(
        n_kept < k, n_kept.cast("double")
    ).otherwise(F.lit(float((k - 1) * 2**HASH_BITS)) / kth)
    return kept.groupBy(*group_cols).agg(
        n_kept.alias("n_kept"),
        kth.alias("kth_min_hash"),
        est.alias("est_distinct"),
    )


def kmv_oracle_sql(
    table: str,
    value_expr: str,
    group_expr: str | None = None,
    group_alias: str = "grp",
    k: int = KMV_K,
) -> str:
    """DuckDB SQL that reproduces :func:`kmv_distinct` exactly."""
    grp_sel = f"{group_expr} AS {group_alias}, " if group_expr else ""
    grp_cols = group_alias if group_expr else ""
    part = f"PARTITION BY {group_alias} " if group_expr else ""
    grp_by = f"GROUP BY {group_alias}" if group_expr else ""
    grp_out = f"{group_alias}, " if group_expr else ""
    scale = repr(float((k - 1) * 2**HASH_BITS))
    return f"""
    WITH h AS (
      SELECT DISTINCT {grp_sel}
             ('0x' || substr(md5(CAST({value_expr} AS VARCHAR)), 1, 15))::BIGINT AS h
      FROM {table}),
    r AS (SELECT {grp_out} h,
                 row_number() OVER ({part}ORDER BY h) AS rn
          FROM h)
    SELECT {grp_out}
           CAST(COUNT(*) AS BIGINT) AS n_kept,
           MAX(h) AS kth_min_hash,
           CASE WHEN COUNT(*) < {k} THEN CAST(COUNT(*) AS DOUBLE)
                ELSE {scale} / MAX(h) END AS est_distinct
    FROM r WHERE rn <= {k} {grp_by}
    """


def kmv_overlap(
    df_a: DataFrame,
    df_b: DataFrame,
    value_col: str,
    k: int = KMV_K,
) -> DataFrame:
    """Set-overlap estimate between two value sets from merged KMV
    sketches — the mergeability story that makes sketches the 100 TB
    profiling tool: each side's k-minima are computed independently
    (map-side bounded, see kmv_distinct), then merged with set ops on
    2k rows, never touching the raw sets again.

      est_union     = (k-1) * 2^60 / h_(k)   over the merged minima
      est_intersect = (|union minima in BOTH sketches| / n_kept)
                      * est_union            (Beyer et al. 2007)

    When n_kept < k every hash survived, so both estimates collapse to
    the exact counts. One row out: n_kept, kth_min_hash, est_union,
    n_common, est_intersect — all deterministic (md5 hashing, integer
    counts, one double division).
    """
    ha = df_a.select(hash60(value_col).alias("h")).dropDuplicates(["h"])
    hb = df_b.select(hash60(value_col).alias("h")).dropDuplicates(["h"])
    # merged k-minima via sort+limit (TakeOrderedAndProject), not a
    # global row_number window — bounded driver merge of k-row heaps
    union_kept = (
        ha.unionByName(hb)
        .dropDuplicates(["h"])
        .orderBy("h")
        .limit(k)
        .select("h")
    )
    tagged = (
        union_kept.join(ha.withColumn("in_a", F.lit(1)), "h", "left")
        .join(hb.withColumn("in_b", F.lit(1)), "h", "left")
    )
    n_kept = F.count("*")
    kth = F.max("h")
    est_union = F.when(n_kept < k, n_kept.cast("double")).otherwise(
        F.lit(float((k - 1) * 2**HASH_BITS)) / kth
    )
    n_common = F.sum(
        F.when(F.col("in_a").isNotNull() & F.col("in_b").isNotNull(), 1).otherwise(0)
    )
    return tagged.agg(
        n_kept.alias("n_kept"),
        kth.alias("kth_min_hash"),
        est_union.alias("est_union"),
        n_common.cast("bigint").alias("n_common"),
        (n_common / n_kept * est_union).alias("est_intersect"),
    )


def kmv_overlap_oracle_sql(
    table: str,
    value_expr: str,
    pred_a: str,
    pred_b: str,
    k: int = KMV_K,
) -> str:
    """DuckDB SQL reproducing :func:`kmv_overlap` exactly."""
    scale = repr(float((k - 1) * 2**HASH_BITS))
    h = f"('0x' || substr(md5(CAST({value_expr} AS VARCHAR)), 1, 15))::BIGINT"
    return f"""
    WITH a AS (SELECT DISTINCT {h} AS h FROM {table} WHERE {pred_a}),
    b AS (SELECT DISTINCT {h} AS h FROM {table} WHERE {pred_b}),
    u AS (SELECT h FROM (
            SELECT h, row_number() OVER (ORDER BY h) AS rn
            FROM (SELECT h FROM a UNION SELECT h FROM b))
          WHERE rn <= {k}),
    t AS (SELECT u.h,
                 CASE WHEN a.h IS NOT NULL AND b.h IS NOT NULL
                      THEN 1 ELSE 0 END AS common
          FROM u LEFT JOIN a ON u.h = a.h LEFT JOIN b ON u.h = b.h)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_kept,
           MAX(h) AS kth_min_hash,
           CASE WHEN COUNT(*) < {k} THEN CAST(COUNT(*) AS DOUBLE)
                ELSE {scale} / MAX(h) END AS est_union,
           CAST(SUM(common) AS BIGINT) AS n_common,
           SUM(common) / COUNT(*) *
             (CASE WHEN COUNT(*) < {k} THEN CAST(COUNT(*) AS DOUBLE)
                   ELSE {scale} / MAX(h) END) AS est_intersect
    FROM t
    """
