"""Embedding similarity search (ANN) over array<float> columns.

Two paths (north star, SURVEY §7 step 5):

  * brute-force cosine top-k — the exact baseline: broadcast the
    (small) query set, stream the corpus through a local cross
    product, window top-k. At 100 TB the corpus side never shuffles;
    cost is O(corpus x queries) FLOPs spread across executors.

  * random-hyperplane LSH buckets — the scale path: 8 signed
    projections -> 8-bit bucket id; only same-bucket pairs are
    compared. Hyperplanes are md5-seeded constants (deterministic,
    reproducible across engines and runs — no rand()).

All vector math is built-in higher-order functions (zip_with +
aggregate over DOUBLE), evaluated in element order => bit-identical
between Spark and the DuckDB oracle. No Python in the hot path.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

EMB_DIM = 64
N_PLANES = 8


def _hp_component(plane: int, dim: int) -> float:
    """Deterministic pseudo-random hyperplane component in [-1, 1].

    Derived from md5 so the oracle SQL (or any other engine) can
    reproduce the planes; materialized as literals on both sides.
    """
    h = int(hashlib.md5(f"{plane}_{dim}".encode()).hexdigest()[:15], 16)
    return ((h % 2001) - 1000) / 1000.0


def hyperplanes(n_planes: int = N_PLANES, dim: int = EMB_DIM) -> list[list[float]]:
    return [[_hp_component(p, i) for i in range(dim)] for p in range(n_planes)]


def dot(a: Column, b: Column) -> Column:
    """Element-order dot product of two array<double> columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
        )
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity, defined as 0.0 when either vector has zero
    norm — a zero vector has no direction, so it ranks below every
    real match and never crosses a near-dup threshold. Without the
    guard a single all-zero embedding (guaranteed to exist in a real
    100 TB corpus: failed encoders emit them) kills the whole job
    under ANSI mode with DIVIDE_BY_ZERO."""
    den = norm(a) * norm(b)
    return F.when(den > F.lit(0.0), dot(a, b) / den).otherwise(F.lit(0.0))


def _as_double(col: str) -> Column:
    return F.col(col).cast("array<double>")


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k neighbours for each query vector.

    queries is expected small (it is broadcast); ties broken by
    neighbour id for full determinism. Self-matches excluded.

    Norms are hoisted to a per-SIDE projection below the join
    (VERDICT r5 item 3): inlining ``cosine()`` evaluates norm(cv)
    once per (corpus x query) PAIR — with the r5 zero-norm guard
    that put the norm product in both the predicate and the branch
    of the CASE, the per-pair cost tripled vs the dot product alone.
    Computing qn/cn once per row keeps the per-pair work to one dot
    + one multiply; the division tree (dot / (qn * cn)) is the same
    float-op order as before, so results stay bit-identical.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        _as_double(vec_col).alias("qv"),
    ).withColumn("qn", norm(F.col("qv")))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        _as_double(vec_col).alias("cv"),
    ).withColumn("cn", norm(F.col("cv")))
    den = F.col("qn") * F.col("cn")
    scored = (
        # broadcast-ok: ANN query side — a bounded query batch by
        # contract (the corpus side streams through, never collected)
        c.crossJoin(F.broadcast(q))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.when(den > F.lit(0.0), dot(F.col("qv"), F.col("cv")) / den)
            .otherwise(F.lit(0.0))
            .alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def lsh_bucket(vec_col: Column, planes: list[list[float]] | None = None) -> Column:
    """8-bit random-hyperplane bucket id for a vector (bigint)."""
    planes = planes if planes is not None else hyperplanes()
    bucket = F.lit(0).cast("bigint")
    for p, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(v) for v in plane])
        bit = (dot(vec_col, lit_plane) > 0).cast("bigint")
        bucket = bucket + F.shiftleft(bit, p)
    return bucket


def lsh_neardup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.99,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Near-duplicate vector pairs: same LSH bucket AND cosine >= threshold.

    Scale shape: one narrow projection computes the bucket per row;
    the shuffle keys on bucket; within-bucket self-join only. With 8
    planes a cos=0.999 pair lands in the same bucket w.p. ~0.97.
    """
    e = (
        embeddings.select(
            F.col(id_col).alias("vid"),
            _as_double(vec_col).alias("v"),
        )
        .withColumn("bucket", lsh_bucket(F.col("v")))
        # per-row norm below the join (same hoist as brute_force_topk:
        # pairs pay one dot + one multiply, not two norm re-computes)
        .withColumn("n", norm(F.col("v")))
    )
    a = e.select(
        F.col("vid").alias("vec_a"),
        F.col("v").alias("va"),
        F.col("n").alias("na"),
        "bucket",
    )
    b = e.select(
        F.col("vid").alias("vec_b"),
        F.col("v").alias("vb"),
        F.col("n").alias("nb"),
        "bucket",
    )
    den = F.col("na") * F.col("nb")
    return (
        a.join(b, "bucket")
        .where(F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a",
            "vec_b",
            F.when(den > F.lit(0.0), dot(F.col("va"), F.col("vb")) / den)
            .otherwise(F.lit(0.0))
            .alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= threshold)
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    n_centroids: int = 8,
    nprobe: int = 2,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF-style ANN: coarse quantize the corpus, probe only the
    ``nprobe`` closest inverted lists per query.

    The scale path for similarity search at 100 TB: assignment is one
    broadcast-join pass over the corpus (the centroid table is tiny),
    the inverted lists are just a cluster_id column to hash-join on,
    and each query scans |corpus| * nprobe / n_centroids vectors
    instead of all of them. Recall < 1 by design — ``brute_force_topk``
    is the exact baseline.

    Centroids here are the first ``n_centroids`` corpus vectors
    (deterministic stand-in for a trained k-means codebook — training
    is an offline job; the serving plumbing is identical). Ties broken
    by centroid id, then neighbour id: bit-stable across engines
    because all vector math is element-ordered built-ins.
    """
    e = corpus.select(
        F.col(id_col).alias("vid"), _as_double(vec_col).alias("v")
    )
    cent = e.where(F.col("vid") < n_centroids).select(
        F.col("vid").alias("cid"), F.col("v").alias("cv")
    )

    def nearest(df: DataFrame, in_id: str, in_vec: str, keep: int) -> DataFrame:
        # broadcast-ok: `cent` is n_centroids rows (k-sized model side)
        scored = df.crossJoin(F.broadcast(cent)).select(
            "*", cosine(F.col(in_vec), F.col("cv")).alias("_cos_c")
        )
        w = Window.partitionBy(in_id).orderBy(
            F.col("_cos_c").desc(), F.col("cid")
        )
        return (
            scored.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= keep)
            .drop("cv", "_cos_c", "_rn")
        )

    assigned = nearest(e, "vid", "v", keep=1)  # corpus -> 1 inverted list
    probes = nearest(
        queries.select(
            F.col(id_col).alias("query_id"), _as_double(vec_col).alias("qv")
        ),
        "query_id",
        "qv",
        keep=nprobe,
    )
    scored = (
        probes.join(assigned, "cid")
        .where(F.col("vid") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vid").alias("neighbor_id"),
            cosine(F.col("qv"), F.col("v")).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


FIXED_POINT_SCALE = 1 << 20  #: 2^20 — power of two => x*SCALE is exact


def bucket_centroids(
    embeddings: DataFrame,
    n_buckets: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Per-bucket dimension-wise mean vector (the k-means/IVF update step).

    Returns one row per (bucket, dim): (bucket, dim, n_vectors,
    centroid_val). Long format — at 100 TB the re-assembled
    array<double> row is a driver-side nicety; the aggregation itself
    is the scale-bearing part (shuffle keys on (bucket, dim), fully
    map-side combinable).

    Determinism across engines AND partitionings: doubles are
    quantized to 2^-20 fixed point BEFORE summing — x * 2^20 is an
    exact IEEE operation (power-of-two scale), floor is exact, and
    bigint addition is associative/commutative, so any shuffle order
    and any SQL engine produce the identical centroid. (Naive double
    summation would differ run-to-run under AQE partition coalescing.)

    Bucket here is id % n_buckets (a deterministic stand-in for the
    previous iteration's nearest-centroid assignment, which is an
    ivf_topk-style broadcast join — the aggregation below is identical
    either way).
    """
    e = embeddings.select(
        (F.col(id_col) % n_buckets).alias("bucket"),
        F.posexplode(_as_double(vec_col)).alias("dim", "x"),
    ).select(
        "bucket",
        "dim",
        F.floor(F.col("x") * FIXED_POINT_SCALE).cast("bigint").alias("q"),
    )
    return e.groupBy("bucket", "dim").agg(
        F.count("*").alias("n_vectors"),
        (
            F.sum("q").cast("double")
            / (F.count("*") * F.lit(float(FIXED_POINT_SCALE)))
        ).alias("centroid_val"),
    )


def oracle_hyperplane_sql_array(plane: list[float]) -> str:
    """Render one hyperplane as a DuckDB DOUBLE[] literal."""
    return "[" + ", ".join(repr(v) for v in plane) + "]::DOUBLE[]"


def cosine_pandas_udf():
    """Arrow-vectorized cosine as a pandas_udf — the escape hatch
    when built-ins can't express a kernel (SURVEY §2.9).

    The built-in zip_with/aggregate path (``cosine``) is preferred —
    it stays JVM-side inside codegen. This exists to (a) demonstrate
    the vectorized-UDF pattern the engine standardizes on (never
    row-at-a-time Python) and (b) host real kernels later (e.g. numpy
    matmul block top-k). Benchmarked equivalent at sf0.1; numerically
    identical on unit vectors.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _cos(a: pd.Series, b: pd.Series) -> pd.Series:
        av = np.stack(a.to_numpy())
        bv = np.stack(b.to_numpy())
        num = (av * bv).sum(axis=1)
        den = np.sqrt((av * av).sum(axis=1)) * np.sqrt((bv * bv).sum(axis=1))
        return pd.Series(num / den)

    return _cos


def radius_pairs_grid(
    points: DataFrame,
    radius: float,
    id_col: str = "vec_id",
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """All point pairs within ``radius`` in 2D, via grid bucketing —
    the metric-range complement of the top-k ANN path. Each point
    lands in cell (floor(x/r), floor(y/r)); one side explodes to its
    3x3 cell neighborhood, the other stays at its home cell, and the
    equi-join on cell ids yields every candidate pair exactly once
    (the id ordering kills the mirror match). Exact distance verifies
    candidates. Never O(n^2): candidate count is sum over cells of
    |cell| x |neighborhood|, i.e. density-bounded; a hot cell is a
    data-skew fact the same salting remedy applies to. One explode
    (x9) + one shuffle on integer cell keys.
    """
    r2 = radius * radius
    cells = points.select(
        F.col(id_col).alias("pid"),
        F.col(x_col).cast("double").alias("px"),
        F.col(y_col).cast("double").alias("py"),
        F.floor(F.col(x_col).cast("double") / radius).alias("cx"),
        F.floor(F.col(y_col).cast("double") / radius).alias("cy"),
    )
    offsets = F.expr(
        "explode(transform(sequence(0, 8), "
        "d -> struct(d div 3 - 1 AS dx, d % 3 - 1 AS dy)))"
    )
    a = cells.select(
        F.col("pid").alias("a_id"),
        F.col("px").alias("ax"),
        F.col("py").alias("ay"),
        "cx",
        "cy",
        offsets.alias("o"),
    ).select(
        "a_id",
        "ax",
        "ay",
        (F.col("cx") + F.col("o.dx")).alias("jx"),
        (F.col("cy") + F.col("o.dy")).alias("jy"),
    )
    b = cells.select(
        F.col("pid").alias("b_id"),
        F.col("px").alias("bx"),
        F.col("py").alias("by"),
        F.col("cx").alias("jx"),
        F.col("cy").alias("jy"),
    )
    d2 = (F.col("ax") - F.col("bx")) * (F.col("ax") - F.col("bx")) + (
        F.col("ay") - F.col("by")
    ) * (F.col("ay") - F.col("by"))
    return (
        a.join(b, ["jx", "jy"])
        .where(F.col("a_id") < F.col("b_id"))
        .where(d2 <= F.lit(r2))
        .select(
            F.col("a_id").alias("vec_lo"),
            F.col("b_id").alias("vec_hi"),
            F.round(F.sqrt(d2), 9).alias("dist"),
        )
    )
