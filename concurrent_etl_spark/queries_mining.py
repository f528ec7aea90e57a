"""Pattern-mining shapes: co-occurrence (market-basket) and triangle
counting — the two canonical self-join mining plans.

The reference never self-joins its fact (SURVEY §2.3 — its joins are
fact-to-dimension only); these add the plan family where the SAME
large table appears on both sides of an equi-join, which changes the
scale calculus: the join key (order / node) bounds the quadratic
blow-up, so the 100 TB guard is a per-key cardinality cap applied
BEFORE pairing, not after.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from concurrent_etl_spark.catalog import query
from concurrent_etl_spark.engine import load_table


@query(
    "cooccurrence_topk",
    oracle="""
    WITH items AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    pairs AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey)
    SELECT part_a, part_b, CAST(COUNT(*) AS BIGINT) AS support
    FROM pairs
    GROUP BY 1, 2
    ORDER BY support DESC, part_a, part_b
    LIMIT 20
    """,
)
def q_cooccurrence_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: top-20 part pairs most often
    bought in the same order. Dedup to distinct (order, part) first —
    otherwise multi-line items inflate support quadratically — then a
    keyed self-join emits each unordered pair once (a < b), and the
    pair-count agg reduces before the deterministic top-k.

    Scale: pairs-per-order grows as k² in basket size, so at 100 TB
    the guard is a per-order item cap (baskets here are ~4 items; a
    real pipeline would filter or sample mega-baskets first) and a
    frequent-item prefilter — the join itself co-partitions on
    l_orderkey, one shuffle each side.
    """
    items = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .dropDuplicates(["l_orderkey", "l_partkey"])
    )
    a = items.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_a")
    )
    b = items.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_b")
    )
    return (
        a.join(b, "ok")
        .where(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count("*").alias("support"))
        .orderBy(F.desc("support"), F.asc("part_a"), F.asc("part_b"))
        .limit(20)
    )


@query(
    "triangle_count",
    oracle="""
    WITH items AS (
      SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
    edges AS (
      SELECT DISTINCT a.l_suppkey AS u, b.l_suppkey AS v
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM edges) AS n_edges
    FROM edges e1
    JOIN edges e2 ON e1.v = e2.u
    JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v
    """,
)
def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count on the supplier co-occurrence graph (suppliers
    linked when they serve the same order). Edges are canonicalized
    u < v; each triangle (a<b<c) is counted exactly once at its base
    edge (a,b) as |out(a) ∩ out(b)| — the adjacency-intersection
    formulation. The wedge-JOIN alternative (e1⋈e2⋈e3) materializes
    one row per wedge (~1.2e8 at sf0.1 on this 91%-dense graph) and
    measured 8.3s; intersecting out-neighbor arrays IN-ROW does the
    same element work inside whole-stage codegen with no wedge rows
    shuffled at all: 2.5s, identical count.

    The edge list is referenced three times, so it is persisted.
    Scale: the two adjacency joins key on u then v (AQE broadcasts
    the node-sized adjacency table here; at web scale they shuffle,
    still never materializing wedges), and in-flight array size is
    bounded by max OUT-degree — which the degree orientation below
    caps at O(sqrt(m)): edges are re-directed from the lower-ranked
    endpoint under the total order (degree, id), so a celebrity node
    with degree d receives d-1 in-edges but keeps only out-neighbors
    of rank above it. Triangle count is orientation-invariant (any
    total order gives each triangle exactly one directed wedge
    u->v, u->w with v->w), so the id-ordered oracle is unchanged;
    total work is the classic O(m^1.5) bound instead of
    O(m * d_max). SCALING_r04 leashes this with a sec/m^1.5 column
    (VERDICT r3 item 6).
    """
    # one fact shuffle: per-order supplier sets, then pairs expand
    # IN-ROW from the sorted array (u < v by position) — replaces the
    # order-key self-join of two full fact copies (measured ~2x at
    # sf0.1; at 100 TB it halves the shuffled bytes and the pair
    # blow-up happens after the per-order reduction, bounded by the
    # per-order line count, not by a join)
    per_order = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_suppkey")).alias("ss"))
    )
    edges = (
        # ss is an Aggregate output (attribute explode is clone-free),
        # but the house lint bans plain posexplode over staged columns
        per_order.select(
            F.posexplode_outer("ss").alias("i", "u"), F.col("ss")
        )
        .where(F.col("i").isNotNull())
        .select(
            "u",
            F.explode(
                F.slice(F.col("ss"), F.col("i") + 2, F.size("ss"))
            ).alias("v"),
        )
        .distinct()
        .persist()
    )
    # degree orientation: redirect each undirected edge from the
    # endpoint ranked lower under (degree, id) — max out-degree drops
    # to O(sqrt(m)), bounding both the in-row arrays and the skew of
    # the two adjacency joins. The degree table is node-sized
    # (broadcast here; shuffle-join at web scale, still node-sized).
    deg = (
        edges.select(F.col("u").alias("n"))
        .unionAll(edges.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("deg"))
        # referenced twice (du and dv sides): persist so the
        # union+agg shuffle runs ONCE, not once per join — the r7
        # hint-drop left this node-sized subtree materializing twice
        # (4.05->9.91 s at sf0.1); caching it is the lint-clean way
        # to recover the latency (no F.broadcast on node-scaled data)
        .persist()
    )
    oriented = (
        edges.join(
            # no hint: degree table is one row per node — corpus-proportional
            (deg.select(F.col("n").alias("u"), F.col("deg").alias("du"))),
            "u",
        )
        .join(
            # no hint: degree table is one row per node
            (deg.select(F.col("n").alias("v"), F.col("deg").alias("dv"))),
            "v",
        )
        .select(
            F.when(
                (F.col("du") < F.col("dv"))
                | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))),
                F.struct(F.col("u").alias("s"), F.col("v").alias("t")),
            )
            .otherwise(F.struct(F.col("v").alias("s"), F.col("u").alias("t")))
            .alias("e")
        )
        .select(F.col("e.s").alias("u"), F.col("e.t").alias("v"))
        .persist()
    )
    out_nbrs = oriented.groupBy("u").agg(
        F.sort_array(F.collect_set("v")).alias("nb")
    ).persist()  # referenced twice (nb_u and nb_v sides), node-sized
    j = (
        oriented.join(
            out_nbrs.select(F.col("u"), F.col("nb").alias("nb_u")), "u"
        ).join(
            out_nbrs.select(F.col("u").alias("v"), F.col("nb").alias("nb_v")),
            "v",
        )
    )
    tri = j.agg(
        # coalesce: SUM over an empty edge set is NULL, the oracle's
        # COUNT(*) is 0 — an empty graph has zero triangles
        F.coalesce(
            F.sum(F.size(F.array_intersect("nb_u", "nb_v"))), F.lit(0)
        )
        .cast("bigint")
        .alias("n_triangles")
    )
    n_edges = edges.agg(F.count("*").alias("n_edges"))
    return tri.crossJoin(F.broadcast(n_edges))


@query(
    "bfs_bipartite_hops",
    oracle="""
    WITH e AS (
      SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
    c0 AS (SELECT DISTINCT c FROM e WHERE c <= 5),
    s1 AS (SELECT DISTINCT s FROM e WHERE c IN (SELECT c FROM c0)),
    c2 AS (SELECT DISTINCT c FROM e
           WHERE s IN (SELECT s FROM s1)
             AND c NOT IN (SELECT c FROM c0)),
    s3 AS (SELECT DISTINCT s FROM e
           WHERE c IN (SELECT c FROM c2)
             AND s NOT IN (SELECT s FROM s1))
    SELECT 'c' AS node_type, c AS node_id, CAST(0 AS INTEGER) AS dist FROM c0
    UNION ALL
    SELECT 's', s, CAST(1 AS INTEGER) FROM s1
    UNION ALL
    SELECT 'c', c, CAST(2 AS INTEGER) FROM c2
    UNION ALL
    SELECT 's', s, CAST(3 AS INTEGER) FROM s3
    """,
)
def q_bfs_bipartite_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Breadth-first reachability with exact minimum-hop labels over
    the customer-supplier bipartite graph (who supplies whom,
    transitively) — the bounded-round iterative-join family next to
    pagerank (fixed damped iterations) and label propagation
    (convergent rounds): BFS frontiers with per-level dedup against
    the visited set.

    Shape at 100 TB: each round is one equi-join of the FRONTIER
    (shrinking) against the edge list keyed on the frontier's side,
    plus an anti-join against visited — never edge x edge. Frontier
    and visited sets are node-cardinality-bounded; rounds chain
    linearly and each is a checkpointable unit on a real cluster.
    The oracle unrolls the same three levels as set algebra.
    """
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("ok"), F.col("o_custkey").alias("c")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("s")
    )
    e = o.join(li, "ok").select("c", "s").distinct()
    c0 = e.select("c").where(F.col("c") <= 5).distinct()
    s1 = (
        # broadcast-ok: seed set — distinct c <= 5, at most 6 rows
        e.join(F.broadcast(c0), "c")
        .select("s")
        .distinct()
    )
    c2 = (
        # no hint: a BFS frontier can be hub-sized — not provably bounded
        e.join((s1), "s")
        .select("c")
        .distinct()
        .join(c0, "c", "left_anti")
    )
    s3 = (
        # no hint: a BFS frontier can be hub-sized
        e.join((c2), "c")
        .select("s")
        .distinct()
        .join(s1, "s", "left_anti")
    )
    lvl = lambda df, t, d: df.select(  # noqa: E731
        F.lit(t).alias("node_type"),
        F.col(t).alias("node_id"),
        F.lit(d).cast("int").alias("dist"),
    )
    return (
        lvl(c0, "c", 0)
        .unionByName(lvl(s1, "s", 1))
        .unionByName(lvl(c2, "c", 2))
        .unionByName(lvl(s3, "s", 3))
    )


# ---------------------------------------------------------------------------
# bipartite k-core pruning
# ---------------------------------------------------------------------------

#: k-core threshold and fixed peel rounds. Peeling is defined as
#: exactly ``_KCORE_R`` simultaneous-removal rounds (not run to
#: fixpoint): both engines execute the identical bounded recursion,
#: so the comparison is exact even where the peel has not converged.
_KCORE_K = 5
_KCORE_R = 4


def _kcore_oracle() -> str:
    # AS MATERIALIZED: each e{r} is referenced three times by e{r+1}
    # (the edge scan + both degree subqueries) and once more by the
    # stats union — DuckDB's default CTE inlining re-derives e0
    # O(3^R) times, which at the sf1 gate scale (6M edges) exploded
    # temp spill past the sandbox disk. Materializing each round once
    # mirrors the Spark side's per-round localCheckpoint exactly.
    ctes = [
        "e0 AS MATERIALIZED (SELECT DISTINCT o.o_custkey AS u,"
        " l.l_suppkey AS v"
        "       FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey)"
    ]
    for r in range(1, _KCORE_R + 1):
        p = f"e{r - 1}"
        ctes.append(
            f"e{r} AS MATERIALIZED (SELECT e.u, e.v FROM {p} e"
            f" JOIN (SELECT u FROM {p} GROUP BY u"
            f"       HAVING COUNT(*) >= {_KCORE_K}) du ON e.u = du.u"
            f" JOIN (SELECT v FROM {p} GROUP BY v"
            f"       HAVING COUNT(*) >= {_KCORE_K}) dv ON e.v = dv.v)"
        )
    stats = " UNION ALL ".join(
        f"SELECT {r} AS peel_round, CAST(COUNT(*) AS BIGINT) AS n_edges,"
        f" CAST(COUNT(DISTINCT u) AS BIGINT) AS n_users,"
        f" CAST(COUNT(DISTINCT v) AS BIGINT) AS n_items FROM e{r}"
        for r in range(_KCORE_R + 1)
    )
    return "WITH " + ",\n".join(ctes) + "\n" + stats


@query("kcore_interaction_prune", oracle=_kcore_oracle())
def q_kcore_interaction_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bipartite k-core pruning of the customer-supplier interaction
    graph — the iterative degree filter recommender / interaction
    datasets are cleaned with before training (drop users with < k
    distinct items AND items with < k distinct users, repeat): 4
    simultaneous-removal rounds at k=5, reporting the per-round
    (edges, users, items) survival curve.

    The reference has no graph layer (closest: row filters,
    case_2/Normal.py:203); published precedent is the standard k-core
    preprocessing of collaborative-filtering corpora.

    Shape at 100 TB: each round is two degree aggregations (map-side
    combinable, keyed on each side of the edge) and two semi-join
    filters back onto the edge list — no pairwise expansion anywhere.
    Each round is materialized with an EAGER ``localCheckpoint``
    (house precedent: power_iteration): unlike persist+count, the
    checkpoint TRUNCATES lineage, so every round's plan is a flat
    scan→agg→join over the previous round's blocks instead of a tree
    Catalyst re-analyzes from the raw scans each time (plan depth
    3^r — re-optimization was the dominant per-round cost at every
    SF: the r6 survival curve showed nsec-per-edge-round falling
    850k→3.5k down the decades, i.e. fixed orchestration, and this
    change cut the isolated sf0.1 time 8.2→3.6 s with a bit-identical
    curve). Driver-blocking jobs: R+1 eager checkpoints plus one
    stats job over the checkpointed rounds. On a real cluster swap
    ``localCheckpoint`` for ``checkpoint`` against a reliable dir —
    same plan shape, executor-loss-proof at the price of one HDFS
    write per round (checkpoint-per-round is also the standard
    fixpoint-loop recipe). The per-round survival stats return as
    one lazy 5-agg union over the checkpointed rounds. Rounds are a
    FIXED unroll (the oracle chains the same CTEs); production
    fixpoint looping adds a converged-check on the same plan.
    Checkpointed blocks are reclaimed by the ContextCleaner when the
    result frame is dropped (no explicit unpersist handle exists for
    checkpoint blocks, so there is no leak path for a mid-build
    failure either — the ADVICE r5 cleanup concern applied to the
    old persist() formulation only).
    """
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("ok"), F.col("o_custkey").alias("u")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("v")
    )
    rounds = [
        o.join(li, "ok")
        .select("u", "v")
        .distinct()
        .localCheckpoint(eager=True)
    ]
    for _ in range(_KCORE_R):
        e = rounds[-1]
        du = e.groupBy("u").agg(F.count(F.lit(1)).alias("du"))
        dv = e.groupBy("v").agg(F.count(F.lit(1)).alias("dv"))
        nxt = (
            e.join(du.where(F.col("du") >= _KCORE_K).select("u"), "u")
            .join(dv.where(F.col("dv") >= _KCORE_K).select("v"), "v")
            .select("u", "v")
            .localCheckpoint(eager=True)
        )
        rounds.append(nxt)
    stats = None
    for r, er in enumerate(rounds):
        s = er.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_edges"),
            F.countDistinct("u").cast("bigint").alias("n_users"),
            F.countDistinct("v").cast("bigint").alias("n_items"),
        ).select(
            F.lit(r).cast("int").alias("peel_round"),
            "n_edges",
            "n_users",
            "n_items",
        )
        stats = s if stats is None else stats.unionByName(s)
    return stats


def _bf_sql_round(prev: str, k: int) -> str:
    return f"""
    d{k} AS (
      SELECT node, MIN(dist) AS dist FROM (
        SELECT node, dist FROM {prev}
        UNION ALL
        SELECT e.v AS node, d.dist + e.w AS dist
        FROM {prev} d JOIN edges e ON e.u = d.node)
      GROUP BY node)"""


@query(
    "bellman_ford_weighted_hops",
    oracle=f"""
    WITH items AS (
      SELECT l_orderkey, l_suppkey,
             MIN(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS c
      FROM lineitem GROUP BY 1, 2),
    edges AS (
      SELECT a.l_suppkey AS u, b.l_suppkey AS v, MIN(a.c + b.c) AS w
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.l_suppkey <> b.l_suppkey
      GROUP BY 1, 2),
    d0 AS (
      SELECT s_suppkey AS node, CAST(0 AS BIGINT) AS dist
      FROM supplier WHERE s_nationkey % 5 = 0),
    {_bf_sql_round('d0', 1)},
    {_bf_sql_round('d1', 2)},
    {_bf_sql_round('d2', 3)},
    {_bf_sql_round('d3', 4)}
    SELECT node AS suppkey, CAST(dist AS BIGINT) AS dist_cents
    FROM d4
    """,
)
def q_bellman_ford_weighted_hops(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Weighted single-source-set shortest paths, Bellman-Ford
    relaxation unrolled to 4 rounds: cheapest <=4-hop connection cost
    from the nation%5==0 supplier cohort through the co-supply graph (edge weight
    = the cheapest pair of line prices any shared order offers, in
    exact cents).

    The weighted counterpart of bfs_bipartite_hops: each round is ONE
    equi-join of the current distance frontier against the edge list
    plus ONE min-combine groupBy — both map-side combinable, both
    partitioned on the node key, no windows. Distances are exact
    longs, so min() is deterministic and the unrolled oracle CTE
    chain states the same fixed-round semantics (Bellman-Ford after k
    rounds = exact min-cost-over-<=k-hop-paths, a well-defined result
    independent of execution order; negative edges cannot exist —
    weights are sums of prices).

    Scale shape: the distance table is node-sized (broadcastable for
    most graphs; shuffles cleanly when not); the per-order pair
    expansion is bounded by basket size as in triangle_count. Rounds
    are a fixed constant — at 100 TB, hop-bounded reachability is the
    production form (unbounded SSSP would iterate to convergence with
    the same per-round plan).

    Reference parity: none — graph surface. Public-algorithm citation:
    Bellman 1958 / the standard synchronous relaxation on Pregel-like
    systems.
    """
    li = load_table(spark, sf_dir, "lineitem")
    items = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.min(F.floor(F.col("l_extendedprice") * 100).cast("long")).alias(
            "c"
        )
    )
    a = items.select(
        F.col("l_orderkey").alias("ok"),
        F.col("l_suppkey").alias("u"),
        F.col("c").alias("cu"),
    )
    b = items.select(
        F.col("l_orderkey").alias("ok"),
        F.col("l_suppkey").alias("v"),
        F.col("c").alias("cv"),
    )
    # materialize the edge list once (it feeds all 4 relaxation
    # rounds); localCheckpoint also truncates the lineage so the
    # unrolled plan stays linear in rounds, the kcore discipline
    edges = (
        a.join(b, "ok")
        .where(F.col("u") != F.col("v"))
        .groupBy("u", "v")
        .agg(F.min(F.col("cu") + F.col("cv")).alias("w"))
    ).localCheckpoint(eager=True)
    sup = load_table(spark, sf_dir, "supplier")
    dist = sup.where(F.col("s_nationkey") % 5 == 0).select(
        F.col("s_suppkey").alias("node"), F.lit(0).cast("long").alias("dist")
    )
    for _ in range(4):
        relaxed = (
            dist.join(edges, dist["node"] == edges["u"])
            .select(
                F.col("v").alias("node"),
                (F.col("dist") + F.col("w")).alias("dist"),
            )
        )
        # dist is referenced twice per round (relax join + union), so
        # the lazy unrolled plan doubled per round (2^4 copies of the
        # seed chain, each re-executed); the node-sized frontier
        # checkpoints per round like the kcore peel — plan and
        # execution stay linear in rounds
        dist = (
            dist.unionByName(relaxed)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint()
        )
    return dist.select(
        F.col("node").alias("suppkey"),
        F.col("dist").cast("long").alias("dist_cents"),
    )


@query(
    "hits_hub_authority",
    oracle="""
    WITH e AS (
      SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
    a1 AS (
      SELECT s, CAST(SUM(1000000) AS BIGINT) AS v FROM e GROUP BY s),
    a1n AS (
      SELECT s, CAST(v * 1000000 // (SELECT SUM(v) FROM a1) AS BIGINT)
        AS v FROM a1),
    h1 AS (
      SELECT c, CAST(SUM(a1n.v) AS BIGINT) AS v
      FROM e JOIN a1n USING (s) GROUP BY c),
    h1n AS (
      SELECT c, CAST(v * 1000000 // (SELECT SUM(v) FROM h1) AS BIGINT)
        AS v FROM h1),
    a2 AS (
      SELECT s, CAST(SUM(h1n.v) AS BIGINT) AS v
      FROM e JOIN h1n USING (c) GROUP BY s),
    a2n AS (
      SELECT s, CAST(v * 1000000 // (SELECT SUM(v) FROM a2) AS BIGINT)
        AS v FROM a2),
    deg AS (SELECT s, CAST(COUNT(*) AS BIGINT) AS n_buyers
            FROM e GROUP BY s)
    SELECT a2n.s AS suppkey, deg.n_buyers, a2n.v AS auth_e6
    FROM a2n JOIN deg USING (s)
    """,
)
def q_hits_hub_authority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS (Kleinberg 1999, public) on the customer->supplier
    purchase graph, two full hub/authority rounds unrolled, with
    L1 (sum-to-one) normalization carried as exact e6-scaled longs —
    the truncating nonnegative division both engines share, so every
    iteration is integer-exact and partition-invariant (float HITS
    would drift cross-engine).

    a_{k+1}(s) = sum of h_k over buyers of s; h_{k+1}(c) = sum of a
    over suppliers c buys from; each vector renormalizes to 1e6 total
    before re-entering the next message pass. Authorities after round
    2 separate high-fan-in suppliers from the uniform start — the
    mutual-reinforcement signal PageRank's single score conflates.

    Scale shape: each half-round is ONE equi-join of the edge list
    against a node-sized score table plus ONE map-side-combinable
    sum — the same bounded-unrolling discipline as
    pagerank_bipartite/bfs; normalization totals enter as broadcast
    scalars. Long bound: score*1e6 <= 1e12 * |nodes| — promotes to
    DECIMAL beyond ~1e6 nodes per side; exact at every tested SF.

    Reference parity: none — graph-analytics surface.
    """
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    e = (
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
        .select(
            F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )

    def _norm(scores: DataFrame, key: str) -> DataFrame:
        # scores is referenced twice (L1 total + rescale) and every
        # half-round norms the previous one — left lazy the unrolled
        # plan doubled per half-round (2^3 copies of the e-join
        # chains, each re-executed). The node-sized vector checkpoints
        # so each half-round runs exactly once (kcore discipline).
        tot = scores.agg(F.sum("v").alias("t"))
        return (
            scores.crossJoin(F.broadcast(tot))
            .select(
                key, F.expr("CAST(v * 1000000 div t AS BIGINT)").alias("v")
            )
            .localCheckpoint()
        )

    a1 = e.groupBy("s").agg(
        F.sum(F.lit(1000000)).cast("long").alias("v")
    )
    a1n = _norm(a1, "s")
    h1 = (
        e.join(a1n, "s")
        .groupBy("c")
        .agg(F.sum("v").cast("long").alias("v"))
    )
    h1n = _norm(h1, "c")
    a2 = (
        e.join(h1n, "c")
        .groupBy("s")
        .agg(F.sum("v").cast("long").alias("v"))
    )
    a2n = _norm(a2, "s")
    deg = e.groupBy("s").agg(F.count(F.lit(1)).cast("long").alias("n_buyers"))
    return a2n.join(deg, "s").select(
        F.col("s").alias("suppkey"), "n_buyers", F.col("v").alias("auth_e6")
    )


@query(
    "apriori_frequent_triples",
    oracle="""
    WITH items AS (
      SELECT DISTINCT l_orderkey AS ok, l_suppkey AS it FROM lineitem),
    pairs AS (
      SELECT a.it AS i1, b.it AS i2, CAST(COUNT(*) AS BIGINT) AS sup
      FROM items a JOIN items b ON a.ok = b.ok AND a.it < b.it
      GROUP BY 1, 2),
    fp AS (SELECT i1, i2 FROM pairs WHERE sup >= 6),
    cand AS (
      SELECT p.i1, p.i2, q.i2 AS i3
      FROM fp p JOIN fp q ON p.i1 = q.i1 AND p.i2 < q.i2
      WHERE EXISTS (SELECT 1 FROM fp r
                    WHERE r.i1 = p.i2 AND r.i2 = q.i2)),
    tri AS (
      SELECT c.i1, c.i2, c.i3, CAST(COUNT(*) AS BIGINT) AS support
      FROM cand c
      JOIN items a ON a.it = c.i1
      JOIN items b ON b.ok = a.ok AND b.it = c.i2
      JOIN items d ON d.ok = a.ok AND d.it = c.i3
      GROUP BY 1, 2, 3)
    SELECT i1, i2, i3, support FROM tri WHERE support >= 6
    """,
)
def q_apriori_frequent_triples(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Frequent 3-itemsets by the APRIORI candidate-pruning step
    (Agrawal & Srikant 1994 — public): a triple can only be frequent
    if ALL THREE of its sub-pairs are, so candidates are generated by
    self-joining the frequent-pair set on a shared prefix and
    EXISTS-checking the third pair — the pruning that keeps k-itemset
    mining from enumerating the k-combinatorial space. Candidate
    triples are then support-counted against the basket table and
    thresholded (min-support 6 keeps the frequent set non-trivial
    at every gate scale).

    Scale shape: the basket self-join for pairs is bounded by basket
    size (the cooccurrence_topk guard); the candidate generator runs
    ENTIRELY on the frequent-pair table (support-thresholded, tiny);
    the final count joins candidates back through order-key
    co-location. This is exactly the distributed Apriori layering —
    corpus-sized work only at k=2, prefix-join pruning above it.

    Determinism: all counts exact; min-support 6 fixed.
    """
    items = (
        load_table(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("it"))
        .distinct()
    )
    a = items.select(F.col("ok"), F.col("it").alias("i1"))
    b = items.select(F.col("ok"), F.col("it").alias("i2"))
    pairs = (
        a.join(b, "ok")
        .where(F.col("i1") < F.col("i2"))
        .groupBy("i1", "i2")
        .agg(F.count(F.lit(1)).cast("long").alias("sup"))
    )
    fp = pairs.where(F.col("sup") >= 6).select("i1", "i2").localCheckpoint(
        eager=True
    )
    cand = (
        fp.alias("p")
        .join(
            fp.select(
                F.col("i1").alias("q1"), F.col("i2").alias("i3")
            ).alias("q"),
            (F.col("p.i1") == F.col("q1")) & (F.col("p.i2") < F.col("i3")),
        )
        .select("p.i1", "p.i2", "i3")
        .join(
            fp.select(
                F.col("i1").alias("r1"), F.col("i2").alias("r2")
            ),
            (F.col("p.i2") == F.col("r1")) & (F.col("i3") == F.col("r2")),
            "left_semi",
        )
    )
    t1 = items.select("ok", F.col("it").alias("i1"))
    t2 = items.select(F.col("ok").alias("ok2"), F.col("it").alias("i2"))
    t3 = items.select(F.col("ok").alias("ok3"), F.col("it").alias("i3"))
    tri = (
        cand.join(t1, "i1")
        .join(
            t2,
            (F.col("ok2") == F.col("ok")) & (t2["i2"] == cand["i2"]),
        )
        .join(
            t3,
            (F.col("ok3") == F.col("ok")) & (t3["i3"] == cand["i3"]),
        )
        .groupBy(cand["i1"], cand["i2"], cand["i3"])
        .agg(F.count(F.lit(1)).cast("long").alias("support"))
        .where(F.col("support") >= 6)
    )
    return tri


@query(
    "link_prediction_jaccard",
    oracle="""
    WITH items AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    edges AS (
      SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
    deg AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS d FROM edges GROUP BY u),
    cn AS (
      SELECT e1.u AS a, e2.u AS b, CAST(COUNT(*) AS BIGINT) AS common
      FROM edges e1 JOIN edges e2
        ON e1.v = e2.v AND e1.u < e2.u
      WHERE NOT EXISTS (SELECT 1 FROM edges x
                        WHERE x.u = e1.u AND x.v = e2.u)
      GROUP BY e1.u, e2.u),
    scored AS (
      SELECT cn.a, cn.b, cn.common, da.d AS deg_a, db.d AS deg_b,
             CAST((cn.common * 2000000 + (da.d + db.d - cn.common))
                  // (2 * (da.d + db.d - cn.common)) AS BIGINT)
               AS jaccard_e6
      FROM cn JOIN deg da ON da.u = cn.a JOIN deg db ON db.u = cn.b)
    SELECT a, b, common, deg_a, deg_b, jaccard_e6
    FROM scored
    ORDER BY jaccard_e6 DESC, a, b
    LIMIT 20
    """,
)
def q_link_prediction_jaccard(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Link prediction by neighborhood Jaccard (Liben-Nowell &
    Kleinberg 2003 — public): the 20 NON-adjacent part pairs
    (co-purchase graph — the supplier graph is near-complete at every
    SF, leaving nothing to predict)
    whose neighbor sets overlap most — |N(a) n N(b)| /
    |N(a) u N(b)| as an exact e6 integer — the "who should be
    connected but isn't" readout that drives recommendation and
    graph-completion pipelines.

    Common-neighbor counting is the triangle wedge join (e1.v = e2.v)
    restricted to canonical a < b; existing edges are removed by an
    anti-join BEFORE scoring, so only genuine predictions rank. The
    union size comes from degrees by inclusion-exclusion — no second
    neighborhood materialization.

    Scale shape: the wedge join is the triangle_count shape (degree
    orientation applies at scale); degrees broadcast; top-k is a
    TakeOrdered. All-integer scoring, ties broken on the pair.
    """
    li = load_table(spark, sf_dir, "lineitem")
    # no items-level distinct: the edge list is deduplicated below
    # anyway, so the extra (ok, it) exchange+aggregate bought nothing
    items = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("it")
    )
    a = items.select("ok", F.col("it").alias("u"))
    b = items.select("ok", F.col("it").alias("v"))
    # Edge list partitioned by u up front: dropDuplicates only needs
    # (u, v) clustering and HashPartitioning(u) satisfies it (subset
    # rule), so the dedup rides the same exchange. localCheckpoint
    # stops the items self-join re-executing for each of the four
    # consumers (deg, nbrs, wedge stream, anti-join build).
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    edges = (
        a.join(b, "ok")
        .where(F.col("u") != F.col("v"))
        .select("u", "v")
        .repartition(n_parts, "u")
        .dropDuplicates(["u", "v"])
        .localCheckpoint(eager=True)
    )
    deg = edges.groupBy("u").agg(F.count(F.lit(1)).cast("long").alias("d"))
    # Wedge enumeration rewritten (guide §8/§2.4): per-node neighbor
    # arrays attach to the edge list by a node-keyed join (AQE sizes
    # it as broadcast at this scale — plain join, no hint; on a
    # web-scale graph it degrades to a shuffle join, never a driver
    # bottleneck) and wedges explode from the arrays — the previous
    # e1 x e2 SMJ self-join and its two edge-stream exchanges+sorts
    # are gone. Wedge count, pair set and common counts are
    # definitionally identical: (a, w) edge + b in N(w), b > a
    # enumerates exactly the e1.v = e2.v, a < b wedges.
    nbrs = edges.groupBy("u").agg(F.collect_list("v").alias("nb"))
    wl = edges.select(F.col("u").alias("a"), F.col("v").alias("w")).join(
        nbrs.select(F.col("u").alias("w"), "nb"), "w"
    )
    # The pair aggregation's keys are near-unique (~105M distinct
    # pairs from ~149M wedges at sf0.1), so map-side partial
    # aggregation compresses nothing and its overflowing hash maps
    # degenerate to per-task sort+spill — measured 39 s for the bare
    # groupBy(a, b) vs 13 s with an explicit repartition that skips
    # the partial pass (guide §1.2: don't compute things you throw
    # away). Partitioning by "a" alone (subset rule again) leaves the
    # final aggregate exchange-free, and the partition count derives
    # from the EXACT wedge total sum(deg^2)/2 — a bounded one-row
    # scalar off the checkpointed degree table — targeting ~2M pair
    # rows (~50 MB of aggregate map) per task at any corpus size.
    n_wedges = (
        deg.agg(F.sum(F.col("d") * F.col("d")).alias("s")).collect()[0]["s"]
        or 0
    ) // 2
    m_pair = max(n_parts, min(32768, -(-n_wedges // 2_000_000)))
    cn = (
        # explode-ok: nb is a join-attached ARRAY COLUMN — nothing for
        # InferFiltersFromGenerate to re-derive below the Generate
        wl.select("a", F.explode("nb").alias("b"))
        .where(F.col("b") > F.col("a"))
        .repartition(m_pair, "a")
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("common"))
        .join(
            # only u < v edge rows can ever match an a < b pair, so
            # pre-halving the anti-join build side is result-identical
            # and keeps it comfortably inside the broadcast threshold
            edges.where(F.col("u") < F.col("v")).select(
                F.col("u").alias("a"), F.col("v").alias("b")
            ),
            ["a", "b"],
            "left_anti",
        )
    )
    return (
        cn.join(
            # no hint: degree table is one row per node — corpus-proportional
            (deg.select(F.col("u").alias("a"), F.col("d").alias("deg_a"))),
            "a",
        )
        .join(
            # no hint: degree table is one row per node
            (deg.select(F.col("u").alias("b"), F.col("d").alias("deg_b"))),
            "b",
        )
        .select(
            "a",
            "b",
            "common",
            "deg_a",
            "deg_b",
            F.expr(
                "CAST((common * 2000000 + (deg_a + deg_b - common))"
                " div (2 * (deg_a + deg_b - common)) AS BIGINT)"
            ).alias("jaccard_e6"),
        )
        .orderBy(F.desc("jaccard_e6"), F.asc("a"), F.asc("b"))
        .limit(20)
    )
