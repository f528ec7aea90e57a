"""Embedding clustering queries: distributed k-means (Lloyd's) and
the SemDeDup-style semantic-dedup prune built on top of it.

Beyond-the-reference surface (the reference at ``/root/reference``
has no clustering; its closest analogue is GROUP BY dedup,
case_2/Normal.py:203-210). The pipeline role: cluster the corpus
once, then compute pairwise similarity only *within* each cluster —
never across the whole corpus (Abbas et al., "SemDeDup", 2023, public
paper; re-derived here on Spark primitives).

Determinism: everything downstream of ``operators.clustering``'s
floor-quantization is exact integer arithmetic (distances, argmin
tie-breaks, counts), so cluster assignments — and therefore the prune
sets — are bit-identical between Spark and the DuckDB oracle and
invariant to partitioning. See ``operators/clustering.py`` for the
full contract.

Scale shape (100 TB):

* assignment is a narrow shuffle-free map (centroids travel as plan
  literals); the per-iteration reduce produces exactly k rows;
* the SemDeDup self-join keys on ``cluster`` — at production scale k
  is chosen ~sqrt(N) so per-cluster membership stays bounded and the
  within-cluster pair count never approaches O(N^2). k=8 here keeps
  the sf-gate clusters non-trivial; the 8-key skew this creates at
  1000 executors is exactly what a larger k removes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from concurrent_etl_spark.catalog import query
from concurrent_etl_spark.engine import load_table
from concurrent_etl_spark.operators import clustering as C

_K = 8
_ITERS = 3
_DIM = 64
#: within-cluster prune threshold on the exact quantized squared L2
#: distance (scale 2^14 per axis => ~4e8 ≈ the 5th percentile of the
#: all-pairs distance distribution of the synthetic embeddings — low
#: enough to be selective, high enough that some pairs fire).
_PRUNE_T = 400_000_000


def _qv(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select("vec_id", C.quantize(F.col("embedding")).alias("qv"))


_SRC = "SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings"


@query(
    "kmeans_embedding_clusters",
    oracle=f"""
    WITH {C.kmeans_oracle_ctes(_SRC, _K, _ITERS, _DIM)}
    SELECT CAST(cluster AS INT) AS cluster,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           CAST(SUM(d) AS BIGINT) AS sum_sq_dist,
           CAST(MIN(vec_id) AS BIGINT) AS min_vec_id,
           CAST(MAX(d) AS BIGINT) AS max_sq_dist
    FROM asg{_ITERS - 1}
    GROUP BY cluster
    """,
)
def q_kmeans_embedding_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-means over the embeddings table: {_K} clusters, {_ITERS}
    Lloyd iterations, per-cluster profile (size, exact integer
    inertia, representative id).

    Plan: per iteration, one scan of the cached quantized frame + one
    k-row map-side-combinable reduce; assignment itself is a narrow
    projection (centroid literals in the plan — no join, no shuffle).
    The final groupBy is the only shuffle of the output stage.
    """
    qv = _qv(spark, sf_dir).persist()
    assigned = C.lloyd(qv, _K, _ITERS, _DIM)
    return assigned.groupBy(F.col("cluster").cast("int").alias("cluster")).agg(
        F.count(F.lit(1)).alias("n_members"),
        F.sum("d").alias("sum_sq_dist"),
        F.min("vec_id").alias("min_vec_id"),
        F.max("d").alias("max_sq_dist"),
    )


@query(
    "semantic_dedup_prune",
    oracle=f"""
    WITH {C.kmeans_oracle_ctes(_SRC, _K, _ITERS, _DIM)},
    pairs AS (
      SELECT a.cluster, a.vec_id AS keep_id, b.vec_id AS prune_id
      FROM asg{_ITERS - 1} a JOIN asg{_ITERS - 1} b
        ON a.cluster = b.cluster AND a.vec_id < b.vec_id
      WHERE CAST(list_aggregate(list_transform(list_zip(a.qv, b.qv),
              x -> (x[1]-x[2])*(x[1]-x[2])), 'sum') AS BIGINT)
            <= {_PRUNE_T}),
    pruned AS (SELECT DISTINCT cluster, prune_id FROM pairs)
    SELECT CAST(m.cluster AS INT) AS cluster,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           CAST(COUNT(p.prune_id) AS BIGINT) AS n_pruned,
           CAST(COUNT(*) - COUNT(p.prune_id) AS BIGINT) AS n_kept,
           CAST(COALESCE(MIN(p.prune_id), -1) AS BIGINT)
             AS first_pruned_id
    FROM asg{_ITERS - 1} m
    LEFT JOIN pruned p
      ON m.cluster = p.cluster AND m.vec_id = p.prune_id
    GROUP BY m.cluster
    """,
)
def q_semantic_dedup_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup prune: within each k-means cluster, any vector whose
    exact quantized squared distance to a LOWER-id cluster-mate is
    <= the threshold is pruned (lowest id of each near-dup group
    survives). Output: per-cluster members / pruned / kept counts.

    The pairwise join is an equi-join on ``cluster`` — candidate
    pairs are generated per cluster only, which is the entire point
    of SemDeDup's cluster-then-compare design: at 100 TB with
    k~sqrt(N) the per-key fan-out stays bounded, versus the O(N^2)
    all-pairs comparison this replaces.
    """
    qv = _qv(spark, sf_dir).persist()
    assigned = C.lloyd(qv, _K, _ITERS, _DIM).select(
        "vec_id", "qv", "cluster"
    ).persist()
    a = assigned.alias("a")
    b = assigned.alias("b")
    pairs = a.join(
        b,
        (F.col("a.cluster") == F.col("b.cluster"))
        & (F.col("a.vec_id") < F.col("b.vec_id")),
    ).where(
        C.sq_dist(F.col("a.qv"), F.col("b.qv")) <= F.lit(_PRUNE_T)
    )
    pruned = pairs.select(
        F.col("a.cluster").alias("cluster"),
        F.col("b.vec_id").alias("prune_id"),
    ).distinct()
    return (
        assigned.join(
            pruned,
            (assigned["cluster"] == pruned["cluster"])
            & (assigned["vec_id"] == pruned["prune_id"]),
            "left",
        )
        .groupBy(assigned["cluster"].cast("int").alias("cluster"))
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.count(pruned["prune_id"]).alias("n_pruned"),
            (F.count(F.lit(1)) - F.count(pruned["prune_id"])).alias(
                "n_kept"
            ),
            F.coalesce(F.min(pruned["prune_id"]), F.lit(-1))
            .cast("bigint")
            .alias("first_pruned_id"),
        )
    )
