"""Distributed k-means (Lloyd's) over embedding columns, and the
SemDeDup-style semantic-dedup prune built on top of it.

The reference has no clustering at all (its closest analogue is the
GROUP BY dedup in case_2/Normal.py:203-210); this is beyond-the-
reference surface for the training-data pipeline: cluster the corpus
once, then prune near-duplicate documents *within* each cluster —
pairwise similarity is computed only among cluster members, never
across the whole corpus (Abbas et al., "SemDeDup", 2023 — public
paper; implemented here from the paper's description on Spark
primitives only).

Determinism contract (the whole point of this module's design):

  * vectors are quantized to fixed-point BIGINT via
    ``floor(x * 2^14)`` — float->int floor is unambiguous across
    engines (no round-half ties), and every subsequent sum /
    distance / comparison is exact integer arithmetic, so cluster
    assignments are bit-identical between Spark and the DuckDB
    oracle and invariant to partitioning and reduction order.
  * argmin tie-break is "lowest centroid id" on both sides
    (``array_position`` returns the FIRST match; the oracle orders
    ``(dist, cid)``).
  * centroid update is ``floor(sum / count)`` with the division in
    DOUBLE (sums stay far below 2^53, so the double division is
    exact) — identical in Python driver code and SQL.
  * empty clusters keep their previous centroid (LEFT JOIN +
    COALESCE in the oracle; a dict-merge in the driver).

Scale shape (100 TB): assignment is a narrow map — the k centroids
travel as plan literals (k*dim ints, a few KiB), so NO shuffle and
no join; each row folds ``zip_with`` distances JVM-side inside
whole-stage codegen. The per-iteration reduce is one map-side-
combinable groupBy producing exactly k rows; collecting k rows to
the driver per iteration is the same bounded collect MLlib's KMeans
does. Total cost: iters * (1 scan + 1 k-row shuffle).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: fixed-point scale: floor(x * 2^14). Unambiguous (floor, not
#: round) and large enough that quantization noise never flips an
#: assignment that matters for the gate.
SCALE = 16384


def quantize(v: Column) -> Column:
    """array<float> -> array<bigint> via floor(x * SCALE)."""
    return F.transform(
        v.cast("array<double>"), lambda x: F.floor(x * F.lit(float(SCALE)))
    )


def sq_dist(a: Column, b: Column) -> Column:
    """Exact integer squared L2 distance between two array<bigint>."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def _centroid_lit(centroids: list[list[int]]) -> Column:
    if not centroids:
        # empty input corpus => init_centroids collected nothing. A
        # zero-arg F.array() is array<void> and every downstream
        # zip_with fails ANALYSIS even though no row would ever be
        # evaluated — give the literal its real type so the (empty)
        # plan still compiles and the query returns zero rows.
        return F.lit([]).cast("array<array<bigint>>")
    return F.array(
        *[F.array(*[F.lit(int(c)) for c in cent]) for cent in centroids]
    )


def assign(df: DataFrame, centroids: list[list[int]], vec_col: str = "qv") -> DataFrame:
    """Add ``cluster`` (0-based argmin, ties -> lowest id) and ``d``.

    Centroids are plan literals => the assignment is a narrow,
    shuffle-free projection; ``array_position`` of the min realizes
    the first-index tie-break exactly (distances are integers, so
    equality is well-defined).
    """
    dists = F.transform(
        _centroid_lit(centroids), lambda c: sq_dist(F.col(vec_col), c)
    )
    df = df.withColumn("_dists", dists)
    df = df.withColumn("d", F.array_min("_dists"))
    return df.withColumn(
        "cluster",
        (F.array_position("_dists", F.col("d")) - 1).cast("int"),
    ).drop("_dists")


def update_centroids(
    assigned: DataFrame,
    prev: list[list[int]],
    dim: int,
    vec_col: str = "qv",
) -> list[list[int]]:
    """One Lloyd reduce: k-row groupBy, floor(sum/count) per dim.

    Exactly k rows cross the wire and are collected (bounded — the
    same driver-side step MLlib uses); empty clusters inherit
    ``prev``'s centroid.
    """
    aggs = [F.count(F.lit(1)).alias("_n")] + [
        F.sum(F.element_at(F.col(vec_col), i + 1)).alias(f"_s{i}")
        for i in range(dim)
    ]
    rows = assigned.groupBy("cluster").agg(*aggs).collect()
    out = [list(c) for c in prev]
    for r in rows:
        cid, n = r["cluster"], r["_n"]
        out[cid] = [int(math.floor(r[f"_s{i}"] / n)) for i in range(dim)]
    return out


def init_centroids(
    df: DataFrame, k: int, id_col: str = "vec_id", vec_col: str = "qv"
) -> list[list[int]]:
    """Deterministic init: quantized vectors of the k smallest ids."""
    rows = (
        df.where(F.col(id_col) < k)
        .select(id_col, vec_col)
        .orderBy(id_col)
        .collect()
    )
    return [list(r[vec_col]) for r in rows]


def lloyd_state(
    df: DataFrame,
    k: int,
    iters: int,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "qv",
) -> tuple[DataFrame, list[list[int]]]:
    """Run ``iters`` assignment passes (iters-1 centroid updates).

    Returns (final assignment frame, final centroids) — the centroid
    list is what downstream evaluation (silhouette, ADC tables) needs
    as plan literals. The input should be cached by the caller when
    iters > 1 — every iteration rescans it.
    """
    cents = init_centroids(df, k, id_col=id_col, vec_col=vec_col)
    assigned = assign(df, cents, vec_col=vec_col)
    for _ in range(iters - 1):
        cents = update_centroids(assigned, cents, dim, vec_col=vec_col)
        assigned = assign(df, cents, vec_col=vec_col)
    return assigned, cents


def lloyd(
    df: DataFrame,
    k: int,
    iters: int,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "qv",
) -> DataFrame:
    """:func:`lloyd_state` returning only the assignment frame."""
    return lloyd_state(df, k, iters, dim, id_col=id_col, vec_col=vec_col)[0]


def silhouette(
    df: DataFrame, centroids: list[list[int]], vec_col: str = "qv"
) -> DataFrame:
    """Add ``sil``: the simplified (centroid-based) silhouette.

    a = distance to the nearest centroid (the assignment), b = the
    second-nearest — both exact integers from the quantized vectors,
    so (b - a) / max(a, b) is one double division pinned through
    round(...,9) DECIMAL. The classic pairwise silhouette is O(n^2)
    within clusters; the centroid form is the standard scalable
    substitute and needs only the k plan-literal centroids — a
    narrow, shuffle-free map even at 100 TB.
    """
    dists = F.array_sort(
        F.transform(
            _centroid_lit(centroids), lambda c: sq_dist(F.col(vec_col), c)
        )
    )
    a = dists[0]
    b = dists[1]
    sil = (
        F.when(F.greatest(a, b) > 0, F.round((b - a) / F.greatest(a, b), 9))
        .otherwise(F.lit(0.0))
        .cast("decimal(12,9)")
    )
    return df.withColumn("sil", sil)


# ---------------------------------------------------------------------------
# DuckDB oracle builder — the identical computation as chained CTEs
# ---------------------------------------------------------------------------

def kmeans_oracle_ctes(
    source_sql: str, k: int, iters: int, dim: int, prefix: str = ""
) -> str:
    """CTE chain ``qv -> cent0 -> asg0 -> cent1 -> asg1 -> ...``.

    ``source_sql`` must yield (vec_id, v DOUBLE[]). The final
    assignment CTE is named ``{prefix}asg{iters-1}`` with columns
    (vec_id, qv, cluster, d). Mirrors :func:`lloyd` step for step:
    floor-quantize, integer distances, (d, cid) argmin, floor(sum/
    count) centroid update with COALESCE for empty clusters.
    ``prefix`` namespaces every CTE NAME (``{prefix}src``,
    ``{prefix}qv``, ``{prefix}cent{t}``, …) so several independent
    runs (one per PQ subvector block) can chain inside one WITH
    clause. Names are rendered already-prefixed — never rewritten by
    a post-hoc regex over the whole body, which would also corrupt a
    caller-supplied ``source_sql`` containing one of those
    identifiers (e.g. a column named ``qv``). Column names inside the
    CTEs (vec_id, qv, cluster, d, cid, cv) are CTE-scoped and stay
    unprefixed.
    """
    c_src, c_qv = f"{prefix}src", f"{prefix}qv"

    def c_cent(t: int) -> str:
        return f"{prefix}cent{t}"

    def c_sums(t: int) -> str:
        return f"{prefix}sums{t}"

    def c_asg(t: int) -> str:
        return f"{prefix}asg{t}"

    dist = (
        "CAST(list_aggregate(list_transform(list_zip(q.qv, c.cv), "
        "x -> (x[1]-x[2])*(x[1]-x[2])), 'sum') AS BIGINT)"
    )
    parts = [
        f"{c_src} AS ({source_sql})",
        (
            f"{c_qv} AS (SELECT vec_id, list_transform(v, "
            f"x -> CAST(floor(x * {SCALE}.0) AS BIGINT)) AS qv FROM {c_src})"
        ),
        (
            f"{c_cent(0)} AS (SELECT vec_id AS cid, qv AS cv FROM {c_qv} "
            f"WHERE vec_id < {k})"
        ),
    ]
    for t in range(iters):
        if t > 0:
            # centroid update from asg{t-1}: per-dim exact integer
            # sums via positional unnest, floor(sum/count) in DOUBLE
            parts.append(
                f"""{c_sums(t)} AS (
      SELECT cluster, p.ord, CAST(sum(qv[p.ord]) AS DOUBLE) AS s,
             count(*) AS cnt
      FROM {c_asg(t - 1)} CROSS JOIN
           (SELECT unnest(range(1, {dim + 1})) AS ord) p
      GROUP BY cluster, p.ord)"""
            )
            parts.append(
                f"""{c_cent(t)} AS (
      SELECT p.cid, COALESCE(n.cv, p.cv) AS cv
      FROM {c_cent(t - 1)} p LEFT JOIN (
        SELECT cluster AS cid,
               list(CAST(floor(s / cnt) AS BIGINT) ORDER BY ord) AS cv
        FROM {c_sums(t)} GROUP BY cluster) n ON p.cid = n.cid)"""
            )
        parts.append(
            f"""{c_asg(t)} AS (
      SELECT vec_id, qv, cluster, d FROM (
        SELECT q.vec_id, q.qv, c.cid AS cluster, {dist} AS d,
               row_number() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY {dist}, c.cid) AS rn
        FROM {c_qv} q CROSS JOIN {c_cent(t)} c) WHERE rn = 1)"""
        )
    return ",\n    ".join(parts)
