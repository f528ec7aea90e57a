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
           CAST(CAST(SUM(d) AS DECIMAL(38,0)) AS VARCHAR) AS sum_sq_dist,
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
        # inertia accumulates in DECIMAL(38,0), not BIGINT: per-row
        # squared distances reach ~2^50 at dim=64/SCALE=2^14, so a
        # long sum can overflow int64 within one large cluster at
        # 100 TB scale (ADVICE r3). Projected as the canonical decimal
        # string because pandas narrows DuckDB DECIMAL(38,0) to
        # float64 (~15 digits) — the string is exact at any scale and
        # hashes identically on both engines.
        F.sum(F.col("d").cast("decimal(38,0)"))
        .cast("string")
        .alias("sum_sq_dist"),
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


@query(
    "cluster_silhouette_eval",
    oracle=f"""
    WITH {C.kmeans_oracle_ctes(_SRC, _K, _ITERS, _DIM)},
    alld AS (
      SELECT a.vec_id, a.cluster, a.d AS da,
             MIN(CASE WHEN c.cid <> a.cluster THEN
               CAST(list_aggregate(list_transform(list_zip(a.qv, c.cv),
                 x -> (x[1]-x[2])*(x[1]-x[2])), 'sum') AS BIGINT)
             END) AS db
      FROM asg{_ITERS - 1} a CROSS JOIN cent{_ITERS - 1} c
      GROUP BY a.vec_id, a.cluster, a.d),
    sil AS (
      SELECT vec_id, cluster,
             CASE WHEN greatest(da, db) > 0
                  THEN CAST(round((db - da) / greatest(da, db), 9)
                       AS DECIMAL(12,9))
                  ELSE CAST(0 AS DECIMAL(12,9)) END AS s
      FROM alld)
    SELECT CAST(cluster AS INT) AS cluster,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           round(CAST(SUM(s) AS DOUBLE) / COUNT(*), 6) AS avg_sil,
           CAST(MIN(s) AS DOUBLE) AS min_sil,
           CAST(MAX(s) AS DOUBLE) AS max_sil
    FROM sil GROUP BY cluster
    """,
)
def q_cluster_silhouette_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clustering-quality evaluation: per-cluster simplified
    silhouette over the k-means result. a(i) is the (exact integer)
    distance to the assigned centroid, b(i) the second-nearest
    centroid's distance; (b-a)/max(a,b) in [-0..1] is pinned through
    round(...,9) DECIMAL so the per-cluster mean is an exact sum.

    The pairwise silhouette is O(n^2)-within-cluster; the centroid
    form evaluates the same separation signal as a SHUFFLE-FREE
    narrow map (centroids are plan literals), making cluster-quality
    monitoring affordable on every pipeline run at 100 TB — the one
    shuffle here is the final per-cluster groupBy of k rows.
    """
    qv = _qv(spark, sf_dir).persist()
    assigned, cents = C.lloyd_state(qv, _K, _ITERS, _DIM)
    per_row = C.silhouette(assigned, cents)
    return per_row.groupBy(
        F.col("cluster").cast("int").alias("cluster")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_members"),
        F.round(
            F.sum("sil").cast("double") / F.count(F.lit(1)), 6
        ).alias("avg_sil"),
        F.min("sil").cast("double").alias("min_sil"),
        F.max("sil").cast("double").alias("max_sil"),
    )


# ---------------------------------------------------------------------------
# Product quantization ANN (Jégou et al. 2011, public paper) — built by
# composing the k-means operator per subvector block
# ---------------------------------------------------------------------------

_PQ_M = 4        #: subvector blocks
_PQ_DSUB = 16    #: dims per block (4 x 16 = 64)
_PQ_K = 16       #: centroids per block codebook
_PQ_ITERS = 2
_PQ_NQ = 5       #: query vectors (vec_id < 5)
_PQ_TOPK = 10


def _pq_oracle() -> str:
    """Four prefixed k-means CTE chains (one per block), encode,
    ADC tables, approx + exact rankings."""
    chains = []
    for b in range(_PQ_M):
        lo, hi = b * _PQ_DSUB + 1, (b + 1) * _PQ_DSUB
        src = (
            f"SELECT vec_id, (embedding::DOUBLE[])[{lo}:{hi}] AS v "
            "FROM embeddings"
        )
        chains.append(
            C.kmeans_oracle_ctes(src, _PQ_K, _PQ_ITERS, _PQ_DSUB, prefix=f"b{b}_")
        )
    a = _PQ_ITERS - 1
    dist = (
        "CAST(list_aggregate(list_transform(list_zip({x}, {y}), "
        "t -> (t[1]-t[2])*(t[1]-t[2])), 'sum') AS BIGINT)"
    )
    enc_joins = " ".join(
        f"JOIN b{b}_asg{a} a{b} ON a{b}.vec_id = f.vec_id"
        for b in range(_PQ_M)
    )
    enc_cols = ", ".join(f"a{b}.cluster AS c{b}" for b in range(_PQ_M))
    adcs = []
    for b in range(_PQ_M):
        lo, hi = b * _PQ_DSUB + 1, (b + 1) * _PQ_DSUB
        adcs.append(
            f"adc{b} AS (SELECT q.query_id, c.cid, "
            + dist.format(x=f"q.qv[{lo}:{hi}]", y="c.cv")
            + f" AS d FROM qs q CROSS JOIN b{b}_cent{a} c)"
        )
    adc_joins = " ".join(
        f"JOIN adc{b} a{b} ON a{b}.query_id = q.query_id "
        f"AND a{b}.cid = e.c{b}"
        for b in range(_PQ_M)
    )
    adc_sum = " + ".join(f"a{b}.d" for b in range(_PQ_M))
    chains_sql = ",\n    ".join(chains)
    adcs_sql = ",\n    ".join(adcs)
    return f"""
    {chains_sql},
    fullqv AS (SELECT vec_id, list_transform(embedding::DOUBLE[],
                 x -> CAST(floor(x * {C.SCALE}.0) AS BIGINT)) AS qv
               FROM embeddings),
    enc AS (SELECT f.vec_id, {enc_cols} FROM fullqv f {enc_joins}),
    qs AS (SELECT vec_id AS query_id, qv FROM fullqv
           WHERE vec_id < {_PQ_NQ}),
    {adcs_sql},
    approx AS (
      SELECT q.query_id, e.vec_id, {adc_sum} AS adc_dist
      FROM qs q CROSS JOIN enc e {adc_joins}),
    exact AS (
      SELECT q.query_id, f.vec_id,
             {dist.format(x="q.qv", y="f.qv")} AS d,
             row_number() OVER (
               PARTITION BY q.query_id
               ORDER BY {dist.format(x="q.qv", y="f.qv")}, f.vec_id)
               AS exact_rank
      FROM qs q CROSS JOIN fullqv f),
    ranked AS (
      SELECT query_id, vec_id, adc_dist,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY adc_dist, vec_id) AS pq_rank
      FROM approx)
    SELECT r.query_id, CAST(r.pq_rank AS INT) AS pq_rank, r.vec_id,
           r.adc_dist, x.d AS exact_dist,
           CASE WHEN x.exact_rank <= {_PQ_TOPK} THEN 1 ELSE 0 END
             AS in_exact_topk
    FROM ranked r
    JOIN exact x ON x.query_id = r.query_id AND x.vec_id = r.vec_id
    WHERE r.pq_rank <= {_PQ_TOPK}
    """


def _pq_sq_dist_py(a: list[int], b: list[int]) -> int:
    return sum((x - y) * (x - y) for x, y in zip(a, b))


@query("pq_ann_topk", oracle=f"WITH {_pq_oracle()}")
def q_pq_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (Jégou et al. 2011): train a {_PQ_K}-
    centroid codebook per {_PQ_DSUB}-dim subvector block via the
    k-means operator, encode every vector as {_PQ_M} small codes,
    then answer top-{_PQ_TOPK} queries with asymmetric-distance
    lookups (ADC) — self-evaluating: each returned neighbor carries
    its exact distance and whether it sits in the exact top-k.

    Scale shape: codebooks are tiny literals, so ENCODING is one
    shuffle-free projection over the corpus ({_PQ_M} argmins per
    row), and the stored index is {_PQ_M} bytes-ish per vector — the
    64x compression that makes billion-vector search fit in memory.
    Query-time ADC tables (NQ x M x K ints) broadcast with the query
    batch; distances are {_PQ_M} array lookups + adds per (query,
    vector) — no floating point anywhere. Exact re-ranking here
    covers the whole corpus only to *measure* recall; production
    would re-rank the ADC short-list.
    """
    qv = _qv(spark, sf_dir).persist()
    a = _PQ_ITERS - 1

    # --- train all M codebooks TOGETHER (optimization round 8) ---
    # The per-block loop ran init + update as separate driver jobs
    # per block (2 collects x M blocks = 8 serial jobs over the
    # cached corpus, almost all fixed job latency). Batched: ONE
    # bounded collect seeds every block (the seeds are slices of the
    # same k rows), and each Lloyd iteration updates every codebook
    # with ONE (block, cluster, subvec)-exploded k*M-row-bounded
    # reduce. Centroid trajectories are bit-identical: same seed
    # rows, same per-(block, cluster) integer sums and counts, same
    # floor(sum/count) arithmetic as operators/clustering.
    import math as _math

    # NB: capture `sl` via a closure factory, NOT a default arg —
    # pyspark infers the HOF lambda's arity from its signature, so
    # `lambda c, _sl=sl:` would become the binary (element, index)
    # form and bind _sl to the INT index.
    def _dist_to(block_slice):
        return lambda c: C.sq_dist(block_slice, c)

    def _slice(b: int):
        return F.slice(F.col("qv"), b * _PQ_DSUB + 1, _PQ_DSUB)

    def _cluster_col(b: int, cents: list[list[int]]):
        dists = F.transform(C._centroid_lit(cents), _dist_to(_slice(b)))
        return (F.array_position(dists, F.array_min(dists)) - 1).cast(
            "int"
        )

    seed_rows = sorted(
        qv.where(F.col("vec_id") < _PQ_K).select("vec_id", "qv").collect(),
        key=lambda r: r["vec_id"],
    )
    codebooks: list[list[list[int]]] = [
        [
            list(r["qv"])[b * _PQ_DSUB : (b + 1) * _PQ_DSUB]
            for r in seed_rows
        ]
        for b in range(_PQ_M)
    ]
    for _ in range(_PQ_ITERS - 1):
        ex = qv.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(b).alias("blk"),
                            _cluster_col(b, codebooks[b]).alias("cluster"),
                            _slice(b).alias("sv"),
                        )
                        for b in range(_PQ_M)
                    ]
                )
            ).alias("e")
        ).select("e.blk", "e.cluster", "e.sv")
        aggs = [F.count(F.lit(1)).alias("_n")] + [
            F.sum(F.element_at(F.col("sv"), i + 1)).alias(f"_s{i}")
            for i in range(_PQ_DSUB)
        ]
        rows = ex.groupBy("blk", "cluster").agg(*aggs).collect()
        nxt = [[list(c) for c in codebooks[b]] for b in range(_PQ_M)]
        for r in rows:
            nxt[r["blk"]][r["cluster"]] = [
                int(_math.floor(r[f"_s{i}"] / r["_n"]))
                for i in range(_PQ_DSUB)
            ]
        codebooks = nxt
    enc_cols = [
        _cluster_col(b, codebooks[b]).alias(f"c{b}") for b in range(_PQ_M)
    ]

    # --- encode the corpus: one shuffle-free projection ---
    enc = qv.select("vec_id", "qv", *enc_cols)

    # --- ADC tables for the query batch (bounded NQ-row collect) ---
    qrows = sorted(
        qv.where(F.col("vec_id") < _PQ_NQ).collect(),
        key=lambda r: r["vec_id"],
    )
    qdata = []
    for r in qrows:
        full = list(r["qv"])
        adc = [
            [
                _pq_sq_dist_py(
                    full[b * _PQ_DSUB : (b + 1) * _PQ_DSUB], cent
                )
                for cent in codebooks[b]
            ]
            for b in range(_PQ_M)
        ]
        qdata.append((r["vec_id"], full, *adc))
    qdf = spark.createDataFrame(
        qdata,
        "query_id long, qqv array<bigint>, "
        + ", ".join(f"adc{b} array<bigint>" for b in range(_PQ_M)),
    )

    # --- broadcast query batch across the encoded corpus ---
    joined = enc.crossJoin(F.broadcast(qdf))
    adc_dist = sum(
        (
            F.element_at(F.col(f"adc{b}"), F.col(f"c{b}") + 1)
            for b in range(_PQ_M)
        ),
        F.lit(0).cast("long"),
    )
    exact_dist = C.sq_dist(F.col("qv"), F.col("qqv"))
    scored = joined.select(
        "query_id",
        "vec_id",
        adc_dist.alias("adc_dist"),
        exact_dist.alias("exact_dist"),
    )
    from pyspark.sql import Window

    wq = Window.partitionBy("query_id")
    scored = scored.withColumn(
        "pq_rank",
        F.row_number().over(wq.orderBy("adc_dist", "vec_id")).cast("int"),
    ).withColumn(
        "exact_rank",
        F.row_number().over(wq.orderBy("exact_dist", "vec_id")),
    )
    return scored.where(F.col("pq_rank") <= _PQ_TOPK).select(
        "query_id",
        "pq_rank",
        "vec_id",
        "adc_dist",
        "exact_dist",
        (F.col("exact_rank") <= _PQ_TOPK).cast("int").alias("in_exact_topk"),
    )


def _pi_round_sql(k: int) -> str:
    """One power-iteration round as oracle CTEs: multiply the exact
    Gram by v{k-1}, then renormalize to an e6 integer vector by the
    floor of a double ratio of exactly-representable decimals."""
    return f"""
    w{k} AS (
      SELECT g.i, SUM(g.g * v{k - 1}.v) AS w
      FROM g JOIN v{k - 1} ON v{k - 1}.i = g.j GROUP BY g.i),
    m{k} AS (SELECT MAX(abs(w)) AS m FROM w{k}),
    v{k} AS (
      SELECT i, CAST(floor(CAST(w AS DOUBLE) * 1000000
                           / CAST(m AS DOUBLE)) AS BIGINT) AS v
      FROM w{k}, m{k})"""


@query(
    "power_iteration_top_eigvec",
    oracle=f"""
    WITH q AS (
      SELECT vec_id, list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * 16384.0) AS BIGINT))
               AS qv
      FROM embeddings),
    nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM q),
    tr AS (
      SELECT vec_id, CAST(ii AS BIGINT) AS i, qv[CAST(ii AS INTEGER)] AS x
      FROM q, unnest(range(1, len(qv) + 1)) t(ii)),
    p AS (
      SELECT a.i, b.i AS j, SUM(CAST(a.x AS DECIMAL(38,0)) * b.x) AS p
      FROM tr a JOIN tr b ON a.vec_id = b.vec_id GROUP BY a.i, b.i),
    s AS (SELECT i, CAST(SUM(x) AS BIGINT) AS s FROM tr GROUP BY i),
    g AS (
      SELECT p.i, p.j,
             CAST(nn.n AS DECIMAL(38,0)) * p.p
               - CAST(si.s AS DECIMAL(38,0)) * sj.s AS g
      FROM p JOIN s si ON si.i = p.i JOIN s sj ON sj.i = p.j
      CROSS JOIN nn),
    v0 AS (SELECT i, CAST(1000000 AS BIGINT) AS v FROM s),
    {_pi_round_sql(1)},
    {_pi_round_sql(2)},
    {_pi_round_sql(3)}
    SELECT g.i AS dim,
           CAST(CAST(g.g AS DECIMAL(38,0)) AS VARCHAR) AS cov_diag_str,
           v3.v AS eig_e6
    FROM g JOIN v3 ON v3.i = g.i
    WHERE g.i = g.j
    """,
)
def q_power_iteration_top_eigvec(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Dominant principal direction of the embedding cloud by POWER
    ITERATION on the exact centered Gram matrix — the first step of
    PCA/spectral analysis, run entirely in exact integer arithmetic:
    embeddings quantize at the k-means fixed-point scale (floor
    x*2^14), the centered Gram G = n*Sum(q q^T) - (Sum q)(Sum q)^T
    accumulates in DECIMAL(38,0) long-form (i, j, g) rows, and each
    of 3 unrolled iterations is ONE join + ONE decimal-sum groupBy
    followed by an L-inf renormalization to an e6 integer vector
    (floor of a double ratio of exactly-representable decimals —
    identical IEEE ops both engines; the iterate re-enters exactly).

    Output: per dimension, the exact covariance diagonal (as string —
    pandas narrows DECIMAL(38,0)) and the e6 eigvector estimate;
    tests check Rayleigh-quotient ascent against numpy (the
    synthetic spectrum is nearly flat, so 3 rounds certify variance
    CAPTURE, not final eigvector identity).

    Scale shape: the Gram is DIMENSION-bounded (d^2 = 4096 rows),
    built by a vec_id-keyed self-join whose fan-out is d per row —
    at 100 TB the same partials come from a mapInPandas per-batch
    numpy Gram (one pass, mergeable); iterations then run on the
    4096-row table alone, broadcast everywhere. The d x d shape
    never depends on corpus size.

    Reference parity: none — embedding-analytics surface above
    kmeans/SemDeDup/PQ (variance structure before choosing k or PQ
    subspaces).
    """
    e = load_table(spark, sf_dir, "embeddings")
    q = e.select(
        "vec_id",
        F.expr(
            "transform(embedding,"
            " x -> CAST(floor(CAST(x AS DOUBLE) * 16384.0) AS BIGINT))"
        ).alias("qv"),
    )
    nn = q.agg(F.count(F.lit(1)).cast("long").alias("n"))
    # _outer + pos-isNotNull (house idiom): plain posexplode over the
    # Project-computed qv lets InferFiltersFromGenerate clone the
    # whole transform into an inferred size()>0 filter below the
    # projection, re-evaluating the 64-dim quantization per row.
    tr = (
        q.select("vec_id", F.posexplode_outer("qv").alias("i0", "x"))
        .where(F.col("i0").isNotNull())
        .select("vec_id", (F.col("i0") + 1).cast("long").alias("i"), "x")
    )
    a = tr.select(F.col("vec_id").alias("va"), F.col("i"), F.col("x").alias("xa"))
    b = tr.select(F.col("vec_id").alias("va"), F.col("i").alias("j"), F.col("x").alias("xb"))
    p = (
        a.join(b, "va")
        .groupBy("i", "j")
        .agg(
            F.sum(F.col("xa").cast("decimal(38,0)") * F.col("xb")).alias("p")
        )
    )
    s = tr.groupBy("i").agg(F.sum("x").cast("long").alias("s"))
    g = (
        # broadcast-ok: one row per embedding dimension (fixed model width)
        p.join(F.broadcast(s.select(F.col("i"), F.col("s").alias("si"))), "i")
        .join(
            # broadcast-ok: one row per embedding dimension (fixed model width)
            F.broadcast(s.select(F.col("i").alias("j"), F.col("s").alias("sj"))),
            "j",
        )
        .crossJoin(F.broadcast(nn))
        .select(
            "i",
            "j",
            (
                F.col("n").cast("decimal(38,0)") * F.col("p")
                - F.col("si").cast("decimal(38,0)") * F.col("sj")
            )
            .cast("decimal(38,0)")
            .alias("g"),
        )
        .localCheckpoint(eager=True)
    )
    v = s.select("i", F.lit(1000000).cast("long").alias("v"))
    for _ in range(3):
        w = (
            g.join(
                # broadcast-ok: dim-sized iteration vector (fixed model width)
                F.broadcast(v.select(F.col("i").alias("j"), F.col("v"))), "j"
            )
            .groupBy("i")
            .agg(F.sum(F.col("g") * F.col("v")).alias("w"))
        )
        mx = w.agg(F.max(F.abs(F.col("w"))).alias("m"))
        # measured negative result (r8): checkpointing v per round is
        # SLOWER here (4.4 -> 5.1 s) — the loop state is DIM-bounded
        # (64 rows over the checkpointed 4096-row Gram), so the lazy
        # plan's duplicated subtrees are near-free while eager
        # round-by-round materialization serializes six extra jobs.
        # The bellman/hits checkpoint discipline applies to
        # CORPUS-scaled loop state only.
        v = w.crossJoin(F.broadcast(mx)).select(
            "i",
            F.floor(
                F.col("w").cast("double") * 1000000 / F.col("m").cast("double")
            )
            .cast("long")
            .alias("v"),
        )
    return (
        g.where(F.col("i") == F.col("j"))
        .join(v, "i")
        .select(
            F.col("i").alias("dim"),
            F.col("g").cast("string").alias("cov_diag_str"),
            F.col("v").alias("eig_e6"),
        )
    )


@query(
    "dbscan_core_border_noise",
    oracle="""
    WITH pts AS (
      SELECT vec_id, CAST(embedding[1] AS DOUBLE) AS x,
             CAST(embedding[2] AS DOUBLE) AS y
      FROM embeddings),
    nbrs AS (
      SELECT a.vec_id,
             CAST(SUM(CASE WHEN b.vec_id <> a.vec_id
                            AND (a.x - b.x) * (a.x - b.x)
                              + (a.y - b.y) * (a.y - b.y) <= 0.0025
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_nbrs
      FROM pts a, pts b GROUP BY a.vec_id),
    core AS (SELECT vec_id FROM nbrs WHERE n_nbrs + 1 >= 4),
    border AS (
      SELECT DISTINCT p.vec_id
      FROM pts p JOIN pts c
        ON (p.x - c.x) * (p.x - c.x) + (p.y - c.y) * (p.y - c.y)
             <= 0.0025
       AND p.vec_id <> c.vec_id
      JOIN core ON core.vec_id = c.vec_id
      WHERE p.vec_id NOT IN (SELECT vec_id FROM core)),
    role AS (
      SELECT vec_id, 'core' AS role FROM core
      UNION ALL SELECT vec_id, 'border' FROM border
      UNION ALL
      SELECT vec_id, 'noise' FROM pts
      WHERE vec_id NOT IN (SELECT vec_id FROM core)
        AND vec_id NOT IN (SELECT vec_id FROM border))
    SELECT role, CAST(COUNT(*) AS BIGINT) AS n_points,
           CAST(SUM(vec_id) AS BIGINT) AS id_checksum
    FROM role GROUP BY role
    """,
)
def q_dbscan_core_border_noise(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """DBSCAN role classification (Ester et al. 1996 — public): every
    point in the 2D embedding projection is labeled CORE (>= minPts=4
    points within eps=0.05, self included), BORDER (non-core within
    eps of a core), or NOISE — the density work that is 90% of
    DBSCAN, the member of the clustering family (k-means: centroid;
    LPA: graph; this: density) that needs no centroids and finds no
    cluster where there is none.

    The Spark side computes neighborhoods via the grid-bucketed
    radius join (radius_pairs_grid — cell-size eps, 3x3 neighborhood
    equi-join, exact distance verify on candidates only), so the
    O(n^2) brute-force NEVER materializes; the oracle IS that
    brute-force definition, which is the point: grid bucketing is a
    plan optimization, not an approximation. Roles aggregate to
    exact counts + id checksums, so one misclassified point fails
    the hash.

    Scale shape: one explode(x9) + one integer-cell shuffle for
    candidates, two map-side-combinable aggs for degrees and roles.
    Density-bounded per cell, uniform keys — the spatial_radius_pairs
    scale story. (Cluster MERGING over core points is iterative
    pointer-jumping — dedup_clusters' machinery — deliberately out of
    scope here; role assignment is the per-point data-parallel part.)
    """
    from concurrent_etl_spark.operators.similarity import radius_pairs_grid

    e = load_table(spark, sf_dir, "embeddings")
    pts = e.select(
        "vec_id",
        F.element_at("embedding", 1).alias("x"),
        F.element_at("embedding", 2).alias("y"),
    )
    pairs = radius_pairs_grid(pts, radius=0.05).select(
        "vec_lo", "vec_hi"
    )
    sym = pairs.select(
        F.col("vec_lo").alias("a_id"), F.col("vec_hi").alias("b_id")
    ).unionByName(
        pairs.select(
            F.col("vec_hi").alias("a_id"), F.col("vec_lo").alias("b_id")
        )
    )
    deg = sym.groupBy(F.col("a_id").alias("vec_id")).agg(
        F.count(F.lit(1)).cast("long").alias("n_nbrs")
    )
    all_pts = pts.select("vec_id").join(deg, "vec_id", "left").select(
        "vec_id", F.coalesce(F.col("n_nbrs"), F.lit(0)).alias("n_nbrs")
    )
    core = all_pts.where(F.col("n_nbrs") + 1 >= 4).select("vec_id")
    # border: non-core with at least one CORE neighbor
    border = (
        sym.join(
            core.select(F.col("vec_id").alias("b_id")), "b_id", "left_semi"
        )
        .select(F.col("a_id").alias("vec_id"))
        .distinct()
        .join(core, "vec_id", "left_anti")
    )
    role = (
        core.select("vec_id", F.lit("core").alias("role"))
        .unionByName(border.select("vec_id", F.lit("border").alias("role")))
        .unionByName(
            all_pts.select("vec_id")
            .join(core, "vec_id", "left_anti")
            .join(border, "vec_id", "left_anti")
            .select("vec_id", F.lit("noise").alias("role"))
        )
    )
    return role.groupBy("role").agg(
        F.count(F.lit(1)).cast("long").alias("n_points"),
        F.sum("vec_id").cast("long").alias("id_checksum"),
    )


@query(
    "embedding_centroid_drift",
    oracle="""
    WITH q AS (
      SELECT vec_id, vec_id % 2 AS half,
             list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * 16384.0) AS BIGINT))
               AS qv
      FROM embeddings),
    tr AS (
      SELECT half, CAST(ii AS BIGINT) AS i,
             qv[CAST(ii AS INTEGER)] AS x
      FROM q, unnest(range(1, len(qv) + 1)) t(ii)),
    sums AS (
      SELECT i,
             CAST(SUM(CASE WHEN half = 0 THEN x ELSE 0 END) AS BIGINT)
               AS s0,
             CAST(SUM(CASE WHEN half = 1 THEN x ELSE 0 END) AS BIGINT)
               AS s1
      FROM tr GROUP BY i),
    mom AS (
      SELECT SUM(CAST(s0 AS DECIMAL(38,0)) * s1) AS dot01,
             SUM(CAST(s0 AS DECIMAL(38,0)) * s0) AS n0,
             SUM(CAST(s1 AS DECIMAL(38,0)) * s1) AS n1
      FROM sums)
    SELECT CAST(64 AS BIGINT) AS n_dims,
           CAST(round(CAST(dot01 AS DOUBLE) * 1000000000
                      / sqrt(CAST(n0 AS DOUBLE) * CAST(n1 AS DOUBLE)))
                AS BIGINT) AS centroid_cos_e9
    FROM mom
    """,
)
def q_embedding_centroid_drift(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Embedding-space drift check: the cosine between the mean
    vectors of two deterministic corpus halves (vec_id parity) —
    near 1.0 means the halves share a distribution; a falling value
    is the cheapest possible detector that a new embedding batch
    drifted (the embedding-space analogue of kl_mixture_drift).

    Exactness: per-dimension QUANTIZED sums per half are exact longs
    (the k-means fixed-point scale), so the two centroid directions
    are exact integer vectors (unnormalized means — cosine is
    scale-invariant, so dividing by the half sizes cancels); the
    cosine is one double expression over DECIMAL(38,0) moments.

    Scale shape: one posexplode + one 64-row-per-half conditional-sum
    agg (map-side combinable); constant-size algebra after. At 100 TB
    this is a single pass however large the corpus.
    """
    e = load_table(spark, sf_dir, "embeddings")
    tr = e.select(
        (F.col("vec_id") % 2).alias("half"),
        F.posexplode(
            F.expr(
                "transform(embedding,"
                " x -> CAST(floor(CAST(x AS DOUBLE) * 16384.0) AS BIGINT))"
            )
        ).alias("i0", "x"),
    )
    sums = tr.groupBy(F.col("i0").alias("i")).agg(
        F.sum(F.when(F.col("half") == 0, F.col("x")).otherwise(0))
        .cast("long")
        .alias("s0"),
        F.sum(F.when(F.col("half") == 1, F.col("x")).otherwise(0))
        .cast("long")
        .alias("s1"),
    )
    s0d = F.col("s0").cast("decimal(38,0)")
    s1d = F.col("s1").cast("decimal(38,0)")
    mom = sums.agg(
        F.sum(s0d * F.col("s1")).alias("dot01"),
        F.sum(s0d * F.col("s0")).alias("n0"),
        F.sum(s1d * F.col("s1")).alias("n1"),
    )
    return mom.select(
        F.lit(64).cast("long").alias("n_dims"),
        F.round(
            F.col("dot01").cast("double")
            * 1000000000
            / F.sqrt(F.col("n0").cast("double") * F.col("n1").cast("double"))
        )
        .cast("long")
        .alias("centroid_cos_e9"),
    )
