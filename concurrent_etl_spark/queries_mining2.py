"""Graph- and embedding-diagnostics tranche (round 4, final batch):
degree assortativity, seeded (personalized) PageRank, and the ANN
hubness audit — the structural health checks that sit NEXT TO the
existing graph battery (pagerank_bipartite, triangle_count, k-core,
modularity) and the ANN stack (brute force, IVF, PQ): is the graph
degree-assortative or hub-dominated, what does a seed cohort's random
walk actually reach, and does the embedding space suffer hubness (a
few points appearing in everyone's top-k — the classic
high-dimensional ANN failure mode, Radovanovic et al. 2010, public).

The reference has no graph or vector surface at all (SURVEY §2);
these are engine capabilities the 100 TB curation platform needs.
Determinism follows house rules: exact integer/DECIMAL carriage into
one fixed chain of exactly-rounded IEEE ops, fixed-scale rounding;
iteration state re-enters as rounded e12 longs exactly like
pagerank_bipartite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from concurrent_etl_spark.catalog import query
from concurrent_etl_spark.engine import load_table
from concurrent_etl_spark.operators import similarity as S

_PPR_D = 0.85


@query(
    "degree_assortativity",
    oracle="""
    WITH raw AS (
      SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
    ew AS (SELECT src, dst FROM raw
           UNION ALL SELECT dst AS src, src AS dst FROM raw),
    deg AS (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS deg
            FROM ew GROUP BY 1),
    per AS (
      SELECT CAST(ds.deg AS BIGINT) AS dx, CAST(dd.deg AS BIGINT) AS dy
      FROM ew JOIN deg ds ON ds.node = ew.src
              JOIN deg dd ON dd.node = ew.dst),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS m,
             CAST(SUM(dx) AS BIGINT) AS sx,
             CAST(SUM(dy) AS BIGINT) AS sy,
             SUM(CAST(dx AS DECIMAL(18,0)) * dx) AS sxx,
             SUM(CAST(dy AS DECIMAL(18,0)) * dy) AS syy,
             SUM(CAST(dx AS DECIMAL(18,0)) * dy) AS sxy
      FROM per),
    nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes FROM deg)
    SELECT n_nodes, m // 2 AS n_edges,
           COALESCE(sx = sy, TRUE) AS sym_ok,
           CASE WHEN CAST(m AS DECIMAL(38,0)) * sxx
                     - CAST(sx AS DECIMAL(38,0)) * sx > 0
                 AND CAST(m AS DECIMAL(38,0)) * syy
                     - CAST(sy AS DECIMAL(38,0)) * sy > 0 THEN
             CAST(round(
               CAST(CAST(m AS DECIMAL(38,0)) * sxy
                    - CAST(sx AS DECIMAL(38,0)) * sy AS DOUBLE)
               / sqrt(CAST(CAST(m AS DECIMAL(38,0)) * sxx
                           - CAST(sx AS DECIMAL(38,0)) * sx AS DOUBLE)
                      * CAST(CAST(m AS DECIMAL(38,0)) * syy
                             - CAST(sy AS DECIMAL(38,0)) * sy AS DOUBLE))
               * 1000000) AS BIGINT) END AS assortativity_e6
    FROM m, nn
    """,
)
def q_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity coefficient (Newman 2002, public) of the
    customer-supplier bipartite graph: the Pearson correlation of
    endpoint degrees over the mirrored directed edge list — negative
    means hubs attach to leaves (the typical bipartite/commerce
    shape), positive means hubs cluster.

    Exactness: degrees are exact longs from one groupBy over the
    DISTINCT mirrored edge list; the five cross-moments accumulate in
    DECIMAL (order-invariant), and r = (M*Sxy - Sx*Sy) /
    sqrt((M*Sxx - Sx^2)(M*Syy - Sy^2)) is one fixed chain of
    exactly-rounded IEEE ops over DECIMAL(38,0)-exact operands,
    reported at 1e-6. sym_ok pins Sx = Sy — true iff the mirror
    really contains both directions of every edge.

    100 TB shape: edges shuffle once to dedupe, once to degree-count;
    the two degree attachments are joins against the node-set-sized
    degree table (this schema's dim class — broadcast); the moment
    pass is one map-side-combinable aggregate. Same plan at any edge
    count.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    raw = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    ew = raw.unionByName(
        raw.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = ew.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("deg")
    ).persist()
    per = (
        ew.join(
            # no hint: degree table is one row per node — corpus-proportional
            (deg.select(F.col("node"), F.col("deg").alias("dx"))),
            F.col("src") == F.col("node"),
        )
        .drop("node")
        .join(
            # no hint: degree table is one row per node
            (deg.select(F.col("node"), F.col("deg").alias("dy"))),
            F.col("dst") == F.col("node"),
        )
        .select("dx", "dy")
    )
    m = per.agg(
        F.count(F.lit(1)).cast("long").alias("m"),
        F.sum("dx").cast("long").alias("sx"),
        F.sum("dy").cast("long").alias("sy"),
        F.sum(F.col("dx").cast("decimal(18,0)") * F.col("dx")).alias("sxx"),
        F.sum(F.col("dy").cast("decimal(18,0)") * F.col("dy")).alias("syy"),
        F.sum(F.col("dx").cast("decimal(18,0)") * F.col("dy")).alias("sxy"),
    )
    nn = deg.agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
    md = F.col("m").cast("decimal(38,0)")
    num = (md * F.col("sxy") - F.col("sx").cast("decimal(38,0)") * F.col("sy"))
    denx = md * F.col("sxx") - F.col("sx").cast("decimal(38,0)") * F.col("sx")
    deny = md * F.col("syy") - F.col("sy").cast("decimal(38,0)") * F.col("sy")
    return m.crossJoin(F.broadcast(nn)).select(
        "n_nodes",
        F.expr("m div 2").alias("n_edges"),
        # coalesce TRUE: the symmetry identity is vacuous on an empty
        # edge set (NULL sums) — both engines agree
        F.coalesce(F.col("sx") == F.col("sy"), F.lit(True)).alias("sym_ok"),
        # zero-variance guard (regular/empty graph): assortativity is
        # undefined — NULL in both engines, never NaN or a job kill
        F.when(
            (denx > 0) & (deny > 0),
            F.round(
                num.cast("double")
                / F.sqrt(denx.cast("double") * deny.cast("double"))
                * 1000000
            ),
        )
        .cast("long")
        .alias("assortativity_e6"),
    )


def _ppr_sql() -> str:
    """Three unrolled seeded-restart walk iterations as oracle SQL —
    the personalized counterpart of queries_relational4._pr_sql, with
    the teleport vector concentrated on the seed cohort and a FULL
    OUTER join per step (teleport-only nodes must survive a round
    with no incoming messages)."""
    it = """
    msgs{i} AS (
      SELECT e.dst AS node,
             CAST(SUM(CAST(round(r.r * e.w / d.deg * 1e12, 0)
                           AS BIGINT)) AS BIGINT) AS ms
      FROM ew e JOIN it{p} r ON r.node = e.src
      JOIN deg d ON d.src = e.src
      GROUP BY e.dst),
    it{i} AS (
      SELECT COALESCE(t.node, m.node) AS node,
             round(COALESCE(t.tele, 0) + {d} *
                   (CAST(COALESCE(m.ms, 0) AS DOUBLE) / 1e12), 12) AS r
      FROM tele t FULL JOIN msgs{i} m ON t.node = m.node)"""
    its = ",".join(
        it.format(i=i, p=i - 1, d=_PPR_D) for i in (1, 2, 3)
    ).replace("it0", "r0")
    return f"""
    WITH raw AS (
      SELECT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
    cw AS (SELECT src, dst, COUNT(*) AS w FROM raw GROUP BY 1, 2),
    ew AS (SELECT src, dst, w FROM cw
           UNION ALL SELECT dst AS src, src AS dst, w FROM cw),
    deg AS (SELECT src, SUM(w) AS deg FROM ew GROUP BY 1),
    seeds AS (SELECT c_custkey * 2 AS node FROM customer
              WHERE c_nationkey = 0),
    ns AS (SELECT COUNT(*) AS s FROM seeds),
    tele AS (SELECT node, round({1 - _PPR_D} / ns.s, 12) AS tele
             FROM seeds, ns),
    r0 AS (SELECT node, round(1.0 / ns.s, 12) AS r FROM seeds, ns),{its}
    SELECT CASE WHEN node % 2 = 0 THEN 'c' || CAST(node // 2 AS VARCHAR)
                ELSE 's' || CAST((node - 1) // 2 AS VARCHAR) END AS node,
           round(r, 9) AS ppr_score
    FROM (SELECT node, r, ROW_NUMBER() OVER (ORDER BY r DESC, node) AS rk
          FROM it3)
    WHERE rk <= 50
    """


@query("personalized_pagerank_seeded", oracle=_ppr_sql())
def q_personalized_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank from a seed cohort (nation-0 customers)
    over the customer-supplier bipartite graph, three unrolled
    damped-walk iterations, top-50 — "what does THIS cohort's random
    walk actually reach", the relevance-propagation primitive behind
    seed-based curation (pick documents/suppliers structurally close
    to a trusted set) and graph-based recommendation.

    Differs from pagerank_bipartite exactly where PPR differs from
    PageRank: the teleport vector is (1-d)/|S| ON THE SEEDS, zero
    elsewhere, so mass concentrates near the cohort instead of
    spreading globally — and the rank vector stays SPARSE (state ∝
    the t-hop reachable set, not the node set), which is the scale
    win: at 100 TB a 3-hop PPR touches a neighborhood, not the graph.
    Each step joins the frontier to the degree-prejoined edge list,
    aggregates rounded-e12 long contributions per target (exact,
    partition-invariant — pagerank_bipartite's machinery), then FULL
    OUTER joins the teleport vector so seed nodes survive rounds with
    no incoming messages.

    The bounded 1-scalar collect is the seed count (the pagerank
    n_nodes pattern).
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    raw = li.join(o, li.l_orderkey == o.o_orderkey).select(
        (F.col("o_custkey") * 2).alias("src"),
        (F.col("l_suppkey") * 2 + 1).alias("dst"),
    )
    cw = raw.groupBy("src", "dst").agg(F.count("*").alias("w")).persist()
    ew = cw.unionByName(
        cw.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "w")
    )
    deg = ew.groupBy("src").agg(F.sum("w").alias("deg"))
    ewd = ew.join(deg, "src").persist()
    seeds = cust.where(F.col("c_nationkey") == 0).select(
        (F.col("c_custkey") * 2).alias("node")
    ).persist()
    n_seeds = seeds.count()
    # empty-seed guard: zero seeds means every frame below is empty
    # (zero rows out) — max(…, 1) only keeps the driver-side literal
    # divisions from raising ZeroDivisionError
    n_div = max(n_seeds, 1)
    tele = seeds.select(
        "node", F.round(F.lit(1 - _PPR_D) / n_div, 12).alias("tele")
    )
    r = seeds.select(
        "node", F.round(F.lit(1.0) / n_div, 12).alias("r")
    )
    for _ in range(3):
        contrib = F.round(
            F.col("r") * F.col("w") / F.col("deg") * 1e12, 0
        ).cast("bigint")
        msgs = (
            # no hint: the PPR rank vector spans all reached nodes — corpus-proportional in the limit
            ewd.join((r), ewd.src == r.node)
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(contrib).cast("long").alias("ms"))
        )
        r = (
            tele.withColumnRenamed("node", "tn")
            .join(msgs, F.col("tn") == F.col("node"), "full_outer")
            .select(
                F.coalesce(F.col("tn"), F.col("node")).alias("node"),
                F.round(
                    F.coalesce(F.col("tele"), F.lit(0.0))
                    + _PPR_D
                    * (
                        F.coalesce(F.col("ms"), F.lit(0)).cast("double")
                        / 1e12
                    ),
                    12,
                ).alias("r"),
            )
        )
    label = F.when(
        F.col("node") % 2 == 0,
        F.concat(
            F.lit("c"), F.expr("node div 2").cast("string")
        ),
    ).otherwise(
        F.concat(
            F.lit("s"), F.expr("(node - 1) div 2").cast("string")
        )
    )
    top = (
        r.orderBy(F.col("r").desc(), "node")
        .limit(50)
        .select(label.alias("node"), F.round("r", 9).alias("ppr_score"))
    )
    return top


@query(
    "ann_hubness_audit",
    oracle="""
    WITH c AS (
      SELECT vec_id, embedding::DOUBLE[] AS v
      FROM embeddings WHERE vec_id % 40 = 0),
    scored AS (
      SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
             CASE WHEN sqrt(list_aggregate(list_transform(q.v,
                        x -> x * x), 'sum'))
                     * sqrt(list_aggregate(list_transform(e.v,
                        x -> x * x), 'sum')) > 0
             THEN list_aggregate(list_transform(list_zip(q.v, e.v),
                            x -> x[1] * x[2]), 'sum')
             / (sqrt(list_aggregate(list_transform(q.v, x -> x * x),
                     'sum'))
                * sqrt(list_aggregate(list_transform(e.v, x -> x * x),
                       'sum')))
             ELSE 0.0 END AS cos_sim
      FROM c q JOIN c e ON e.vec_id <> q.vec_id),
    top AS (
      SELECT neighbor_id FROM (
        SELECT neighbor_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cos_sim DESC, neighbor_id)
                 AS rn
        FROM scored)
      WHERE rn <= 10),
    occ AS (
      SELECT c.vec_id, CAST(COALESCE(t.cnt, 0) AS BIGINT) AS k_occ
      FROM c LEFT JOIN (SELECT neighbor_id, COUNT(*) AS cnt
                        FROM top GROUP BY 1) t
             ON t.neighbor_id = c.vec_id),
    mom AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(k_occ) AS BIGINT) AS s,
                   CAST(MAX(k_occ) AS BIGINT) AS max_occ FROM occ),
    m23 AS (
      SELECT SUM(dv * dv) AS m2, SUM(dv * dv * dv) AS m3
      FROM (SELECT CAST(n * k_occ - s AS DECIMAL(12,0)) AS dv
            FROM occ, mom))
    SELECT k_occ, CAST(COUNT(*) AS BIGINT) AS n_vecs,
           n AS n_cohort, max_occ,
           s = n * 10 AS occ_sum_ok,
           CASE WHEN m2 > 0 THEN
             CAST(round(sqrt(CAST(n AS DOUBLE)) * CAST(m3 AS DOUBLE)
                        / (CAST(m2 AS DOUBLE) * sqrt(CAST(m2 AS DOUBLE)))
                        * 1000000) AS BIGINT) END AS skew_e6
    FROM occ, mom, m23
    GROUP BY k_occ, n, max_occ, s, m2, m3
    """,
)
def q_ann_hubness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN hubness audit (Radovanovic et al. 2010, public): the
    k-occurrence distribution — how many times each vector appears in
    other vectors' exact cosine top-10 — over a deterministic cohort
    (vec_id % 40 = 0). High positive SKEW of k-occurrence means a few
    hub points dominate everyone's neighbor lists, which silently
    degrades recall of any bucketed ANN (IVF/PQ/LSH) and biases
    SemDeDup-style pruning; this is the metric that says whether the
    embedding space needs normalization before the 100 TB ANN build.

    Output: the k-occurrence histogram plus the cohort moments —
    occ_sum_ok pins sum(k_occ) = 10 * n (every query emits exactly
    ten list slots, so the audit catches a dropped or duplicated
    top-k row anywhere in the pipeline), and the exact-moment
    skewness g1 = sqrt(n) * m3 / m2^1.5 carried in N-scaled integer
    deviations (DECIMAL — dv^3 exceeds int64 at sf0.1) with m2^1.5
    as m2 * sqrt(m2), exactly-rounded IEEE ops only.

    100 TB shape: the audit CONSUMES top-k lists; at scale those come
    from the IVF/PQ path (pq_ann_topk) instead of brute force, and
    the histogram/moment passes are one groupBy + one aggregate
    regardless of corpus size. The brute-force cohort here is the
    same exact-baseline convention as ann_recall_eval.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    cohort = emb.where(F.col("vec_id") % 40 == 0).persist()
    top10 = S.brute_force_topk(cohort, cohort, k=10)
    occ = (
        cohort.select("vec_id")
        .join(
            top10.groupBy(F.col("neighbor_id")).agg(
                F.count(F.lit(1)).alias("cnt")
            ),
            F.col("vec_id") == F.col("neighbor_id"),
            "left",
        )
        .select(
            "vec_id",
            F.coalesce(F.col("cnt"), F.lit(0)).cast("long").alias("k_occ"),
        )
        .persist()
    )
    mom = occ.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("k_occ").cast("long").alias("s"),
        F.max("k_occ").cast("long").alias("max_occ"),
    )
    dv = (F.col("n") * F.col("k_occ") - F.col("s")).cast("decimal(12,0)")
    m23 = occ.crossJoin(F.broadcast(mom)).agg(
        F.sum(dv * dv).alias("m2"),
        F.sum(dv * dv * dv).alias("m3"),
    )
    hist = occ.groupBy("k_occ").agg(
        F.count(F.lit(1)).cast("long").alias("n_vecs")
    )
    m2d = F.col("m2").cast("double")
    return (
        hist.crossJoin(F.broadcast(mom))
        .crossJoin(F.broadcast(m23))
        .select(
            "k_occ",
            "n_vecs",
            F.col("n").alias("n_cohort"),
            "max_occ",
            (F.col("s") == F.col("n") * 10).alias("occ_sum_ok"),
            # degenerate-cohort guard: identical k_occ everywhere
            # (tiny or perfectly regular corpora) gives m2 = 0 and an
            # undefined skew — NULL in both engines, not a job kill
            F.when(
                m2d > 0,
                F.round(
                    F.sqrt(F.col("n").cast("double"))
                    * F.col("m3").cast("double")
                    / (m2d * F.sqrt(m2d))
                    * 1000000
                ),
            )
            .cast("long")
            .alias("skew_e6"),
        )
    )
