"""Rank-statistics tranche (round 4, final batch): Kendall tau-b by
2-D dominance counting, Kruskal-Wallis across k groups, exact
average-precision over score blocks, Ljung-Box whiteness, and the
Theil-Sen robust trend — the remaining classical statistics a corpus
drift/evaluation pipeline runs that the earlier batteries (KS,
Mann-Whitney, chi-square, ACF, AUC) don't cover.

The reference has no statistics at all (SURVEY §2.4 — its only
aggregate is COUNT, case_2/Normal.py:280-282); this whole module is
engine surface the 100 TB training-data platform needs.

House determinism rules apply throughout: every statistic is carried
as exact integers (counts, cents, DECIMAL(38,0) cross-moments) until
a final float step built only from exactly-rounded IEEE ops (one
division, sqrt, or a literal-factor product) evaluated in the same
operation order by both engines, then rounded to a fixed scale.
No global sorts: cumulations run on the bucket-offset cumsum
(``queries_stats._cum_by_value``) or value-domain-bounded grids with
PARTITIONED windows only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from concurrent_etl_spark.catalog import query
from concurrent_etl_spark.engine import load_table
from concurrent_etl_spark.queries_stats import _cum_by_value


@query(
    "kendall_tau_concordance",
    oracle="""
    WITH cells AS (
      SELECT CAST(l_quantity AS BIGINT) AS x,
             CAST(floor(l_extendedprice / 1000) AS BIGINT) AS y,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM lineitem GROUP BY 1, 2),
    marg AS (
      SELECT CAST(SUM(c) AS BIGINT) AS n,
             CAST(SUM(c * (c - 1) // 2) AS BIGINT) AS txy
      FROM cells),
    tx AS (SELECT CAST(SUM(r * (r - 1) // 2) AS BIGINT) AS tx
           FROM (SELECT SUM(c) AS r FROM cells GROUP BY x)),
    ty AS (SELECT CAST(SUM(r * (r - 1) // 2) AS BIGINT) AS ty
           FROM (SELECT SUM(c) AS r FROM cells GROUP BY y)),
    cd AS (
      SELECT CAST(COALESCE(SUM(CASE WHEN a.y < b.y THEN a.c * b.c END), 0)
                  AS BIGINT) AS c_pairs,
             CAST(COALESCE(SUM(CASE WHEN a.y > b.y THEN a.c * b.c END), 0)
                  AS BIGINT) AS d_pairs
      FROM cells a JOIN cells b ON a.x < b.x)
    SELECT n, c_pairs, d_pairs,
           tx AS ties_x, ty AS ties_y, txy AS ties_xy,
           (c_pairs + d_pairs + tx + ty - txy) = n * (n - 1) // 2
             AS pair_identity_ok,
           CASE WHEN n * (n - 1) // 2 - tx > 0
                 AND n * (n - 1) // 2 - ty > 0 THEN
             CAST(round(CAST(c_pairs - d_pairs AS DOUBLE)
                  / sqrt(CAST(n * (n - 1) // 2 - tx AS DOUBLE)
                         * CAST(n * (n - 1) // 2 - ty AS DOUBLE))
                  * 1000000) AS BIGINT) END AS tau_b_e6
    FROM cd, marg, tx, ty
    WHERE n > 0
    """,
)
def q_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau-b rank correlation between order quantity and
    price bucket, exact with ties, WITHOUT an O(n^2) pair join.

    All n(n-1)/2 observation pairs are classified through the
    (quantity x price-bucket) CONTINGENCY GRID — value-domain-bounded
    (50 x ~105 here), independent of row count. Concordant pairs per
    cell are c(x,y) * A(x,y) where A = #observations strictly smaller
    in both coordinates = the 2-D dominance prefix sum D(x-1, y-1);
    discordant use B = Cx(x-1) - D(x-1, y). D comes from two chained
    PARTITIONED windows over the dense grid (cum over y within each
    x, then cum over x within each y) — the separable 2-D prefix-sum
    decomposition; the strict-shift lookups are equi-joins of the
    grid against itself at (x+1, y+1) / (x+1, y) / (x+1, y_max). Tie
    terms come from the cell and marginal counts. The pair-accounting
    identity C + D + (Tx - Txy) + (Ty - Txy) + Txy = n(n-1)/2 is
    carried IN the result — it only holds if every dominance count is
    right, so a off-by-one in any prefix sum fails the hash.

    tau_b = (C - D) / sqrt((T - Tx)(T - Ty)): exact longs into one
    IEEE product/sqrt/division chain, rounded to 1e-6. Long carriage
    is safe while pair counts < 2^53 (n up to ~9e7 rows; promote the
    final expression to DECIMAL beyond).

    The oracle states the same statistic from its definition — a cell
    PAIR join (bounded: cells^2, legal single-node) — independent of
    the dominance decomposition, so the two derivations check each
    other.

    100 TB shape: one map-side-combinable groupBy to the bounded cell
    table; everything after runs on grid-sized data (thousands of
    rows) regardless of input scale.
    """
    li = load_table(spark, sf_dir, "lineitem")
    cells = (
        li.select(
            F.col("l_quantity").cast("long").alias("x"),
            F.floor(F.col("l_extendedprice") / 1000).cast("long").alias("y"),
        )
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .persist()
    )
    # bounded collect: 4 scalars of the value domain (quantity /
    # price-bucket ranges), the same class as pagerank's n_nodes
    b = cells.agg(
        F.min("x").alias("x0"),
        F.max("x").alias("x1"),
        F.min("y").alias("y0"),
        F.max("y").alias("y1"),
    ).collect()[0]
    # empty-input guard: no value domain to grid — degenerate 1-cell
    # bounds keep the plan analyzable; the final n > 0 filter (both
    # engines) returns zero rows
    x0 = int(b["x0"]) if b["x0"] is not None else 0
    x1 = int(b["x1"]) if b["x1"] is not None else 0
    y0 = int(b["y0"]) if b["y0"] is not None else 0
    y1 = int(b["y1"]) if b["y1"] is not None else 0
    ny = y1 - y0 + 1
    nx = x1 - x0 + 1
    # dense integer grid from ONE range (no cross join): id -> (x, y)
    grid = spark.range(nx * ny).select(
        (F.lit(x0) + F.expr(f"id div {ny}")).alias("x"),
        (F.lit(y0) + F.col("id") % ny).alias("y"),
    )
    # broadcast-ok: value-domain cell grid — bounded by quantity x price-bucket domain, not row count (see docstring)
    g = grid.join(F.broadcast(cells), ["x", "y"], "left").select(
        "x", "y", F.coalesce("c", F.lit(0)).alias("c")
    )
    wy = Window.partitionBy("x").orderBy("y")
    wx = Window.partitionBy("y").orderBy("x")
    dom = (
        g.withColumn("dy", F.sum("c").over(wy))
        .withColumn("dom", F.sum("dy").over(wx))
        .select("x", "y", "dom")
        .persist()
    )
    a_shift = dom.select(
        (F.col("x") + 1).alias("x"),
        (F.col("y") + 1).alias("y"),
        F.col("dom").alias("a_cnt"),
    )
    left_shift = dom.select(
        (F.col("x") + 1).alias("x"), "y", F.col("dom").alias("d_left")
    )
    cx_shift = dom.where(F.col("y") == y1).select(
        (F.col("x") + 1).alias("x"), F.col("dom").alias("cx_left")
    )
    per = (
        # broadcast-ok: value-domain grid shift (see docstring)
        cells.join(F.broadcast(a_shift), ["x", "y"], "left")
        # broadcast-ok: value-domain grid shift
        .join(F.broadcast(left_shift), ["x", "y"], "left")
        # broadcast-ok: value-domain grid shift
        .join(F.broadcast(cx_shift), ["x"], "left")
        .select(
            "c",
            F.coalesce("a_cnt", F.lit(0)).alias("a_cnt"),
            (
                F.coalesce("cx_left", F.lit(0))
                - F.coalesce("d_left", F.lit(0))
            ).alias("b_cnt"),
        )
    )
    sums = per.agg(
        F.sum(F.col("c").cast("decimal(38,0)") * F.col("a_cnt"))
        .cast("long")
        .alias("c_pairs"),
        F.sum(F.col("c").cast("decimal(38,0)") * F.col("b_cnt"))
        .cast("long")
        .alias("d_pairs"),
    )
    marg = cells.agg(
        F.sum("c").cast("long").alias("n"),
        F.sum(F.expr("c * (c - 1) div 2")).cast("long").alias("txy"),
    )
    txr = (
        cells.groupBy("x")
        .agg(F.sum("c").alias("r"))
        .agg(F.sum(F.expr("r * (r - 1) div 2")).cast("long").alias("tx"))
    )
    tyr = (
        cells.groupBy("y")
        .agg(F.sum("c").alias("r"))
        .agg(F.sum(F.expr("r * (r - 1) div 2")).cast("long").alias("ty"))
    )
    t_all = F.expr("n * (n - 1) div 2")
    return (
        sums.crossJoin(F.broadcast(marg))
        # broadcast-ok: per grid-axis marginals — value-domain bounded
        .crossJoin(F.broadcast(txr))
        # broadcast-ok: per grid-axis marginals — value-domain bounded
        .crossJoin(F.broadcast(tyr))
        .select(
            "n",
            "c_pairs",
            "d_pairs",
            F.col("tx").alias("ties_x"),
            F.col("ty").alias("ties_y"),
            F.col("txy").alias("ties_xy"),
            (
                F.col("c_pairs")
                + F.col("d_pairs")
                + F.col("tx")
                + F.col("ty")
                - F.col("txy")
                == t_all
            ).alias("pair_identity_ok"),
            # tau-b undefined when either margin is all-ties; the
            # final n > 0 filter mirrors the oracle's empty-input
            # zero-row convention
            F.when(
                (t_all - F.col("tx") > 0) & (t_all - F.col("ty") > 0),
                F.round(
                    (F.col("c_pairs") - F.col("d_pairs")).cast("double")
                    / F.sqrt(
                        (t_all - F.col("tx")).cast("double")
                        * (t_all - F.col("ty")).cast("double")
                    )
                    * 1000000
                ),
            )
            .cast("long")
            .alias("tau_b_e6"),
        )
        .where(F.col("n").isNotNull() & (F.col("n") > 0))
    )


@query(
    "kruskal_wallis_rank_test",
    oracle="""
    WITH vals AS (
      SELECT o_orderpriority AS priority,
             CAST(floor(o_totalprice * 100) AS BIGINT) AS v
      FROM orders),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM vals),
    pv AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS t FROM vals GROUP BY v),
    ranked AS (
      SELECT v, 2 * (SUM(t) OVER (ORDER BY v) - t) + t + 1 AS rank2
      FROM pv),
    grp AS (
      SELECT priority, CAST(COUNT(*) AS BIGINT) AS n_g,
             CAST(SUM(r.rank2) AS BIGINT) AS r_x2
      FROM vals JOIN ranked r USING (v) GROUP BY priority),
    ties AS (SELECT CAST(SUM(t * t * t - t) AS BIGINT) AS ties_cubed
             FROM pv),
    contrib AS (
      SELECT priority, n_g, r_x2,
             CAST(round(CAST(CAST(r_x2 AS DECIMAL(38,0)) * r_x2 AS DOUBLE)
                        / (4.0 * n_g)) AS BIGINT) AS contrib_r2
      FROM grp),
    tc AS (SELECT CAST(SUM(contrib_r2) AS BIGINT) AS total_c FROM contrib)
    SELECT priority, n_g, r_x2, contrib_r2, ties_cubed,
           CAST(round(
             (12.0 / (CAST(n AS DOUBLE) * (n + 1)) * total_c
              - 3.0 * (n + 1))
             / (1.0 - CAST(ties_cubed AS DOUBLE)
                / CAST(CAST(n AS DECIMAL(38,0)) * n * n - n AS DOUBLE))
             * 1000000) AS BIGINT) AS h_e6
    FROM contrib, tc, tot, ties
    """,
)
def q_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis H across the five order priorities on order
    value — the k-group generalization of mann_whitney_u, exact with
    the tie correction.

    Doubled average ranks ride the same bucket-offset cumulative
    machinery (``_cum_by_value`` — bounded collect + partitioned
    windows, never a global sort): for a distinct value with total
    count t and strictly-smaller count cb, each member's doubled rank
    is 2*cb + t + 1; per-group doubled rank sums R_g_x2 are exact
    longs. H's group term R_g^2 / n_g squares in DECIMAL(38,0)
    (R_x2^2 ~ 5e20 at sf0.1 — outside int64) before its one double
    division, rounded to integers whose sum is exact; the final
    H = [12/(N(N+1)) * sum - 3(N+1)] / (1 - sum(t^3-t)/(N^3-N))
    is a fixed chain of exactly-rounded IEEE ops over exact operands,
    identical cross-engine, reported at 1e-6.

    100 TB shape: one shuffle to the per-value table, one to the
    5-row group table; the rank join streams the fact side against
    the per-value rank map. N^3 is carried in DECIMAL so no scale
    overflows the tie correction.
    """
    orders = load_table(spark, sf_dir, "orders")
    vals = orders.select(
        F.col("o_orderpriority").alias("priority"),
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("v"),
    )
    tot = vals.agg(F.count(F.lit(1)).cast("long").alias("n"))
    pv = vals.groupBy("v").agg(
        F.count(F.lit(1)).cast("long").alias("t")
    ).withColumn("a", F.col("t"))
    cum = _cum_by_value(pv)
    ranked = cum.select(
        "v",
        (2 * (F.col("cum_t") - F.col("t")) + F.col("t") + 1).alias("rank2"),
    )
    grp = (
        vals.join(ranked, "v")
        .groupBy("priority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_g"),
            F.sum("rank2").cast("long").alias("r_x2"),
        )
    )
    ties = cum.agg(
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t"))
        .cast("long")
        .alias("ties_cubed")
    )
    contrib = grp.select(
        "priority",
        "n_g",
        "r_x2",
        F.round(
            (F.col("r_x2").cast("decimal(38,0)") * F.col("r_x2")).cast(
                "double"
            )
            / (4.0 * F.col("n_g"))
        )
        .cast("long")
        .alias("contrib_r2"),
    )
    tc = contrib.agg(F.sum("contrib_r2").cast("long").alias("total_c"))
    n = F.col("n")
    # degenerate-domain guards (one-day corpus sweep, round 6): n = 1
    # makes the tie term 0/0, and a single distinct value makes the
    # whole correction 1 - 1 = 0 — DuckDB propagates NULL through the
    # float division where Spark ANSI kills the job. Split the term
    # so each zero denominator yields NULL exactly like the oracle.
    n3n = (n.cast("decimal(38,0)") * n * n - n).cast("double")
    tie_term = F.when(
        n3n > 0, F.col("ties_cubed").cast("double") / n3n
    ).otherwise(F.lit(None).cast("double"))
    den = F.lit(1.0) - tie_term
    num = (
        F.lit(12.0) / (n.cast("double") * (n + 1)) * F.col("total_c")
        - 3.0 * (n + 1)
    )
    h = F.when(den != 0, num / den).otherwise(F.lit(None).cast("double"))
    return (
        contrib.crossJoin(F.broadcast(tc))
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(ties))
        .select(
            "priority",
            "n_g",
            "r_x2",
            "contrib_r2",
            "ties_cubed",
            F.round(h * 1000000).cast("long").alias("h_e6"),
        )
    )


@query(
    "average_precision_exact",
    oracle="""
    WITH d AS (
      -- a doc without a score (NULL n_chars, e.g. NULL text) cannot
      -- be ranked: excluded in BOTH engines
      SELECT 1024 - n_chars AS v,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS rel
      FROM documents WHERE n_chars IS NOT NULL),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(rel) AS BIGINT) AS n_rel FROM d),
    pv AS (SELECT v, CAST(SUM(rel) AS BIGINT) AS a,
                  CAST(COUNT(*) AS BIGINT) AS t
           FROM d GROUP BY v),
    cum AS (SELECT v, a, t,
                   SUM(a) OVER (ORDER BY v) AS ca,
                   SUM(t) OVER (ORDER BY v) AS ct
            FROM pv),
    blocks AS (
      SELECT CAST(round(CAST(a * ca AS DOUBLE)
                        / (CAST(ct AS DOUBLE) * n_rel)
                        * 1000000000) AS BIGINT) AS contrib_e9,
             CAST(2 * ca AS DOUBLE) / (ct + n_rel) AS f1,
             ca, ct
      FROM cum, tot)
    SELECT n_docs, n_rel,
           CAST(COUNT(*) AS BIGINT) AS n_blocks,
           CAST(SUM(contrib_e9) AS BIGINT) AS ap_e9,
           CAST(round(MAX(f1) * 1000000) AS BIGINT) AS best_f1_e6,
           MAX(ca) = n_rel AND MAX(ct) = n_docs AS totals_ok
    FROM blocks, tot
    GROUP BY n_docs, n_rel
    """,
)
def q_average_precision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact block-pessimistic average precision (and best threshold
    F1) of a document scorer against a relevance label, via the
    rank-sum family's per-distinct-score blocks — no per-row ranking.

    Scorer = n_chars (the length prior a curation pipeline starts
    from), relevance = lang = 'en'. Under ties the pessimistic
    convention charges every relevant doc its BLOCK-END precision
    (cum_rel / cum_total at the block boundary, descending score) —
    well-defined without an intra-block order, so the whole curve
    exists on the per-distinct-score table: AP = sum_blocks
    a * ca / (ct * P). Scores invert (v = 1024 - n_chars) so the
    ascending bucket-offset cumsum walks descending score; per-block
    contributions are one exact integer product into one IEEE
    division, rounded to e9 integers whose sum is exact. best_f1
    maximizes 2*ca/(ct + P) over blocks — each value one division of
    exact longs, max over identical doubles cross-engine. totals_ok
    pins the last block's cumulatives against the global totals: the
    cumsum machinery must land exactly on (n_rel, n_docs).

    100 TB shape: one groupBy to the score-domain table (bounded by
    the score's value range, not rows), bounded-collect cumsum,
    one-row output. The same plan evaluates any (score, label) pair —
    this is the evaluation surface for the trained quality classifier
    (classifier_calibration_bins evaluates calibration; this ranks).
    """
    docs = load_table(spark, sf_dir, "documents")
    d = docs.where(F.col("n_chars").isNotNull()).select(
        # a doc without a score cannot be ranked (see oracle) — and
        # the cumsum's driver sort cannot order a NULL bucket
        (F.lit(1024) - F.col("n_chars")).cast("long").alias("v"),
        F.when(F.col("lang") == "en", 1).otherwise(0).cast("long").alias("rel"),
    )
    tot = d.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("rel").cast("long").alias("n_rel"),
    )
    pv = d.groupBy("v").agg(
        F.sum("rel").cast("long").alias("a"),
        F.count(F.lit(1)).cast("long").alias("t"),
    )
    cum = _cum_by_value(pv, width_bits=8).crossJoin(F.broadcast(tot))
    blocks = cum.select(
        "n_docs",
        "n_rel",
        F.round(
            (F.col("a") * F.col("cum_a")).cast("double")
            / (F.col("cum_t").cast("double") * F.col("n_rel"))
            * 1000000000
        )
        .cast("long")
        .alias("contrib_e9"),
        (
            (2 * F.col("cum_a")).cast("double")
            / (F.col("cum_t") + F.col("n_rel"))
        ).alias("f1"),
        F.col("cum_a").alias("ca"),
        F.col("cum_t").alias("ct"),
    )
    return blocks.groupBy("n_docs", "n_rel").agg(
        F.count(F.lit(1)).cast("long").alias("n_blocks"),
        F.sum("contrib_e9").cast("long").alias("ap_e9"),
        F.round(F.max("f1") * 1000000).cast("long").alias("best_f1_e6"),
        (
            (F.max("ca") == F.first("n_rel"))
            & (F.max("ct") == F.first("n_docs"))
        ).alias("totals_ok"),
    )


@query(
    "ljung_box_whiteness",
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
      GROUP BY k),
    per AS (
      SELECT CAST(k AS BIGINT) AS k, n_pairs,
             CAST(round(
               (CAST(nn AS DOUBLE) / CAST(dd AS DOUBLE))
               * (CAST(nn AS DOUBLE) / CAST(dd AS DOUBLE))
               * (CAST(n AS DOUBLE) * (n + 2) / (n - k))
               * 1000000000) AS BIGINT) AS contrib_e9
      FROM num, den, st)
    SELECT k, n_pairs, contrib_e9,
           CAST(SUM(contrib_e9) OVER () AS BIGINT) AS q_e9
    FROM per
    ORDER BY k
    """,
)
def q_ljung_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung-Box portmanteau whiteness statistic over the daily
    revenue series, lags 1..7 — "is there ANY autocorrelation
    structure left", the joint test on top of acf_lags' per-lag
    readout (Ljung & Box 1978, public).

    Q = n(n+2) * sum_k rho_k^2 / (n - k). rho_k reuses acf_lags'
    exact machinery verbatim: N^2-scaled demeaned cross-moments
    accumulated in DECIMAL(38,0) over date-equi-joined lag pairs (the
    7-row lag table broadcasts; the daily rollup is bounded by the
    date domain). Each lag's contribution is a fixed chain of
    exactly-rounded IEEE ops on exact operands — (nn/dd)^2 times the
    integer-ratio factor — rounded to e9; Q is their exact sum,
    attached to every row (oracle: one global window over 7 rows;
    Spark: crossJoin of the broadcast 1-row total — the approved
    pattern).

    Missing days drop pairs, same convention as acf_lags (n_pairs
    records how many survive); the statistic is over the observed
    series both ways.
    """
    orders = load_table(spark, sf_dir, "orders")
    # the daily rollup feeds FIVE consumers (st, den, both pair
    # sides, the final stat join) — persist the date-bounded table so
    # the fact scan happens once, not once per consumer
    daily = orders.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.sum(F.floor(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("x")
    ).persist()
    st = daily.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("s"),
    )
    dev = F.col("n").cast("decimal(38,0)") * F.col("x") - F.col("s")
    den = daily.crossJoin(F.broadcast(st)).agg(F.sum(dev * dev).alias("dd"))
    lags = spark.range(1, 8).select(F.col("id").cast("long").alias("k"))
    a = daily.select(F.col("d").alias("da"), F.col("x").alias("xa"))
    bdf = daily.select(F.col("d").alias("db"), F.col("x").alias("xb"))
    pairs = (
        a.crossJoin(F.broadcast(lags))
        .withColumn("dt", F.date_add(F.col("da"), F.col("k").cast("int")))
        .join(bdf, F.col("db") == F.col("dt"))
        .crossJoin(F.broadcast(st))
    )
    deva = F.col("n").cast("decimal(38,0)") * F.col("xa") - F.col("s")
    devb = F.col("n").cast("decimal(38,0)") * F.col("xb") - F.col("s")
    num = pairs.groupBy("k").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum(deva * devb).alias("nn"),
    )
    rho = F.col("nn").cast("double") / F.col("dd").cast("double")
    per = (
        num.crossJoin(F.broadcast(den))
        .crossJoin(F.broadcast(st))
        .select(
            "k",
            "n_pairs",
            F.round(
                rho
                * rho
                * (
                    F.col("n").cast("double")
                    * (F.col("n") + 2)
                    / (F.col("n") - F.col("k"))
                )
                * 1000000000
            )
            .cast("long")
            .alias("contrib_e9"),
        )
    )
    total = per.agg(F.sum("contrib_e9").cast("long").alias("q_e9"))
    return per.crossJoin(F.broadcast(total)).orderBy("k")


@query(
    "theilsen_robust_slope",
    oracle="""
    WITH daily AS (
      SELECT date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
               AS d,
             CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS x
      FROM orders GROUP BY 1),
    stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
                     CAST(MIN(d) AS BIGINT) AS dmin FROM daily),
    pairs AS (
      SELECT (b.x - a.x) * 10000 AS num, b.d - a.d AS k
      FROM daily a JOIN daily b ON b.d > a.d),
    slopes AS (
      SELECT (num - ((num % k) + k) % k) // k AS sl FROM pairs),
    pv AS (SELECT sl AS v, CAST(COUNT(*) AS BIGINT) AS t
           FROM slopes GROUP BY 1),
    tot AS (SELECT CAST(SUM(t) AS BIGINT) AS n_pairs FROM pv),
    cum AS (SELECT v, SUM(t) OVER (ORDER BY v) AS ct FROM pv),
    med AS (SELECT CAST(MIN(v) AS BIGINT) AS slope_e4
            FROM cum, tot WHERE 2 * ct >= n_pairs),
    resid AS (
      SELECT x * 10000 - slope_e4 * (d - dmin) AS rv
      FROM daily, med, stats),
    rpv AS (SELECT rv, CAST(COUNT(*) AS BIGINT) AS t
            FROM resid GROUP BY 1),
    rcum AS (SELECT rv, SUM(t) OVER (ORDER BY rv) AS ct FROM rpv),
    imed AS (SELECT CAST(MIN(rv) AS BIGINT) AS intercept_e4
             FROM rcum, stats WHERE 2 * ct >= n_days)
    SELECT n_days, n_pairs,
           coalesce(n_pairs, 0) = n_days * (n_days - 1) // 2 AS pairs_ok,
           slope_e4, intercept_e4
    FROM stats, tot, med, imed
    WHERE n_days > 0
    """,
)
def q_theilsen_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend of daily revenue: the median of all
    pairwise slopes (Theil 1950 / Sen 1968, public) — the
    breakdown-resistant trend estimate an anomaly-tolerant revenue
    monitor fits instead of OLS (one outlier day moves OLS; it takes
    29% contamination to move Theil-Sen).

    Exactness: slopes are floor((x_j - x_i) * 1e4 / (d_j - d_i)) in
    cents-e4 per day, computed with the sign-safe floormod identity
    (num - ((num % k) + k) % k) / k — truncating '%' agrees between
    Spark and DuckDB, the adjusted numerator divides exactly, so the
    quotient is the true floor in both engines with no float anywhere.
    The median is the exact lower order statistic via the
    bucket-offset cumsum (33-bit buckets — slope domain / 2^33 keeps
    the offset collect bounded); the intercept is a second exact
    median over the per-day residuals at the fitted slope (the
    1-scalar collect between passes is the dims-max-id pattern).
    pairs_ok carries n_pairs = C(n_days, 2) — every observed day pair
    must enter exactly once or the hash fails.

    100 TB shape: the pair set is DAY-domain-bounded (C(|days|, 2) —
    ~2.9M at a 6.5-year range, constant in row count); pairs build as
    a broadcast lag-table equi-join (gap k = 1..max range), the same
    shape as acf_lags, never an inequality self-join of data-scaled
    tables.
    """
    orders = load_table(spark, sf_dir, "orders")
    daily = (
        orders.groupBy(
            F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01"))
            .cast("long")
            .alias("d")
        )
        .agg(
            F.sum(F.floor(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("x")
        )
        .persist()
    )
    b = daily.agg(
        F.min("d").alias("d0"),
        F.max("d").alias("d1"),
        F.count(F.lit(1)).alias("nd"),
    ).collect()[0]
    # empty-input guard: zero observed days — degenerate literals
    # keep the plan analyzable; the final n_days > 0 filter (both
    # engines) returns zero rows
    dmin = int(b["d0"]) if b["d0"] is not None else 0
    dmax = int(b["d1"]) if b["d1"] is not None else 0
    n_days = int(b["nd"])
    lags = spark.range(1, dmax - dmin + 1).select(F.col("id").alias("k"))
    a = daily.select(F.col("d").alias("da"), F.col("x").alias("xa"))
    bb = daily.select(F.col("d").alias("db"), F.col("x").alias("xb"))
    pairs = (
        a.crossJoin(F.broadcast(lags))
        .join(bb, F.col("db") == F.col("da") + F.col("k"))
        .select(
            ((F.col("xb") - F.col("xa")) * 10000).alias("num"), "k"
        )
    )
    slopes = pairs.select(
        F.expr("(num - ((num % k) + k) % k) div k").alias("v")
    )
    # BUCKET-TARGETED exact median (replaces the r7 full-cumsum
    # path): the slopes are at sf0.1 a 2.9M-row, nearly-all-distinct
    # multiset, so the old groupBy-v + bucket-offset window cumsum
    # shuffled and window-sorted the whole pair table just to read
    # one order statistic (measured 7.5 s of the query's 15). The
    # lower median only needs (a) per-bucket COUNTS — a map-side
    # partial agg whose output is value-domain-bounded (slope domain
    # / 2^33, ~1.3k rows at every SF) and driver-collected like every
    # _cum_by_value offset table, and (b) a full sort of the ONE
    # bucket holding the median rank (~|slopes|/buckets rows). The
    # selected v is identical: grouping ties cannot move the minimal
    # qualifying value.
    sl = slopes.withColumn(
        "bucket", F.expr(f"v div {1 << 33}")
    ).persist()
    _btotals = sorted(
        sl.groupBy("bucket").agg(F.count(F.lit(1)).alias("bt")).collect(),
        key=lambda r: r["bucket"],
    )
    _n_pairs = sum(int(r["bt"]) for r in _btotals)
    _slope_row = None
    if _btotals:
        _acc = 0
        for r in _btotals:
            if 2 * (_acc + int(r["bt"])) >= _n_pairs:
                _b_star, _off_t = int(r["bucket"]), _acc
                break
            _acc += int(r["bt"])
        wv = Window.partitionBy("bucket").orderBy("v")
        in_b = (
            sl.where(F.col("bucket") == _b_star)
            .groupBy("bucket", "v")
            .agg(F.count(F.lit(1)).cast("long").alias("t"))
            .select(
                "v",
                (F.lit(_off_t) + F.sum("t").over(wv)).alias("cum_t"),
            )
        )
        med = in_b.where(2 * F.col("cum_t") >= _n_pairs).agg(
            F.min("v").cast("long").alias("slope_e4")
        )
        # bounded 1-scalar collect between the two median passes (the
        # dims max-id pattern): the fitted slope re-enters as a literal
        _slope_row = med.collect()[0]["slope_e4"]
    # n_pairs as a 1-row frame: NULL on the empty pair set (the
    # oracle's SUM-over-empty), else the exact driver-side count
    tot = spark.range(1).select(
        (
            F.lit(_n_pairs if _btotals else None).cast("long")
        ).alias("n_pairs")
    )
    if _slope_row is None:
        # degenerate domain (n_days <= 1 -> zero pairwise slopes):
        # the oracle's med/imed CTEs propagate NULL through BOTH
        # medians, so fitting residuals at a substituted slope 0
        # would silently diverge on a single-day corpus (ADVICE r5).
        # Mirror the NULL flow: n_pairs stays the sum-over-empty
        # NULL, slope/intercept NULL; pairs_ok is kept TOTAL via
        # coalesce (zero pairs expected, zero observed -> true) so
        # neither engine emits a NULL boolean (pandas object-NaN vs
        # None hash differently in the driver canon).
        return tot.select(
            F.lit(n_days).cast("long").alias("n_days"),
            "n_pairs",
            (
                F.coalesce(F.col("n_pairs"), F.lit(0).cast("long"))
                == F.lit(n_days * (n_days - 1) // 2).cast("long")
            ).alias("pairs_ok"),
            F.lit(None).cast("long").alias("slope_e4"),
            F.lit(None).cast("long").alias("intercept_e4"),
        ).where(F.lit(n_days > 0))
    slope_e4 = int(_slope_row)
    resid = daily.select(
        (F.col("x") * 10000 - F.lit(slope_e4) * (F.col("d") - dmin)).alias(
            "v"
        )
    )
    rpv = resid.groupBy("v").agg(
        F.count(F.lit(1)).cast("long").alias("t")
    ).withColumn("a", F.col("t"))
    rcum = _cum_by_value(rpv, width_bits=33)
    imed = rcum.where(2 * F.col("cum_t") >= n_days).agg(
        F.min("v").cast("long").alias("intercept_e4")
    )
    return (
        tot.crossJoin(F.broadcast(imed))
        .select(
            F.lit(n_days).cast("long").alias("n_days"),
            "n_pairs",
            (
                F.coalesce(F.col("n_pairs"), F.lit(0).cast("long"))
                == F.lit(n_days * (n_days - 1) // 2).cast("long")
            ).alias("pairs_ok"),
            F.lit(slope_e4).cast("long").alias("slope_e4"),
            "intercept_e4",
        )
        .where(F.lit(n_days > 0))
    )


# ---------------------------------------------------------------------------
# Poisson bootstrap confidence interval (deterministic replicates)
# ---------------------------------------------------------------------------

#: cumulative Poisson(1) CDF at 1e-9 resolution, k = 0..7 (k >= 8 is
#: the residual 1e-5 tail, capped). Computed ONCE in Python and
#: injected as identical literals into both engines — exp/factorial
#: must not run in-engine.
_POIS_CDF_E9 = [
    367879441,
    735758882,
    919698603,
    981011843,
    996340153,
    999405815,
    999916759,
    999989751,
]
_BOOT_B = 64


def _pois_weight_sql(u: str) -> str:
    return (
        "("
        + " + ".join(f"CASE WHEN {u} >= {c} THEN 1 ELSE 0 END" for c in _POIS_CDF_E9)
        + ")"
    )


@query(
    "poisson_bootstrap_ci",
    oracle=f"""
    WITH rows_in AS (
      SELECT o_orderkey AS k,
             CAST(floor(o_totalprice * 100) AS BIGINT) AS x
      FROM orders),
    obs AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS sx
      FROM rows_in),
    reps AS (SELECT unnest(range(0, {_BOOT_B})) AS b),
    weighted AS (
      SELECT b,
             CAST(SUM(w) AS BIGINT) AS sw,
             CAST(SUM(w * x) AS BIGINT) AS swx
      FROM (
        SELECT r.b, rows_in.x,
               {_pois_weight_sql(
                   "('0x' || substr(md5('boot' || r.b || '_' || rows_in.k), 1, 8))"
                   "::BIGINT % 1000000000"
               )} AS w
        FROM rows_in, reps r)
      GROUP BY b),
    means AS (
      SELECT b, CAST((swx * 20000 + sw) // (2 * sw) AS BIGINT) AS m_e4
      FROM weighted),
    ranked AS (
      SELECT a.b, a.m_e4,
             SUM(CASE WHEN m2.m_e4 < a.m_e4
                       OR (m2.m_e4 = a.m_e4 AND m2.b <= a.b)
                      THEN 1 ELSE 0 END) AS rk
      FROM means a, means m2
      GROUP BY a.b, a.m_e4)
    SELECT n,
           CAST((sx * 20000 + n) // (2 * n) AS BIGINT) AS mean_e4,
           CAST({_BOOT_B} AS BIGINT) AS n_reps,
           CAST(MIN(CASE WHEN rk = 2 THEN m_e4 END) AS BIGINT) AS ci_lo_e4,
           CAST(MIN(CASE WHEN rk = {_BOOT_B - 1} THEN m_e4 END)
                AS BIGINT) AS ci_hi_e4,
           COALESCE(MIN(CASE WHEN rk = 2 THEN m_e4 END)
             <= MIN(CASE WHEN rk = {_BOOT_B - 1} THEN m_e4 END),
             FALSE) AS ci_ok
    FROM ranked, obs
    GROUP BY n, sx
    """,
)
def q_poisson_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson bootstrap 95% CI for the mean order value with
    DETERMINISTIC md5-derived replicate weights — the
    single-pass bootstrap for datasets too large to resample by
    index (Chamandy et al., "Estimating Uncertainty for Massive Data
    Streams", 2012 — public): per replicate b each row enters with an
    independent Poisson(1) count, realized here by inverting the
    Poisson CDF (Python-computed e9 thresholds, identical literals
    both engines) on the md5 uniform of (replicate, order key).

    All {_BOOT_B} replicates ride ONE map-side-combinable aggregate
    (the permutation-test discipline: replicates cost partial sums,
    not shuffles); each replicate mean is the exact half-up e4
    integer (swx*2e4 + sw) div (2*sw). The CI endpoints are the 2nd
    and 63rd order statistics of the 64 replicate means, found by an
    exact rank self-join of the bounded 64-row replicate table (no
    window, no sort). ci_ok pins lo <= hi.

    100 TB shape: one scan of the fact table fanned out 64x into
    partial sums; the rank join is 64 x 64 rows however large the
    data. Long carriage is safe while 8 * max_cents * rows * 2e4
    < 2^63 (~2e13 at sf0.1); DECIMAL promotion beyond.
    """
    orders = load_table(spark, sf_dir, "orders")
    rows_in = orders.select(
        F.col("o_orderkey").alias("k"),
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("x"),
    )
    obs = rows_in.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
    )
    reps = spark.range(_BOOT_B).select(F.col("id").alias("b"))
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("boot"),
                        F.col("b").cast("string"),
                        F.lit("_"),
                        F.col("k").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % 1000000000
    )
    w = sum(
        (u >= c).cast("long") for c in _POIS_CDF_E9
    )
    weighted = (
        rows_in.crossJoin(F.broadcast(reps))
        .select("b", "x", w.alias("w"))
        .groupBy("b")
        .agg(
            F.sum("w").cast("long").alias("sw"),
            F.sum(F.col("w") * F.col("x")).cast("long").alias("swx"),
        )
    )
    # a replicate whose Poisson weights are ALL zero (P ~ 0.37^n —
    # real at a one-day/one-row domain) has no mean: DuckDB's
    # integer // by zero is NULL, Spark ANSI div kills the job —
    # guard to NULL so the rank join sees the same 64-row table
    # (one-day corpus sweep, round 6)
    means = weighted.select(
        "b",
        F.expr(
            "CASE WHEN sw > 0 THEN "
            "CAST((swx * 20000 + sw) div (2 * sw) AS BIGINT) END"
        ).alias("m_e4"),
    )
    m2 = means.select(F.col("b").alias("b2"), F.col("m_e4").alias("m2_e4"))
    ranked = (
        # broadcast-ok: one row per bootstrap replicate (_BOOT_B rows)
        means.crossJoin(F.broadcast(m2))
        .groupBy("b", "m_e4")
        .agg(
            F.sum(
                (
                    (F.col("m2_e4") < F.col("m_e4"))
                    | (
                        (F.col("m2_e4") == F.col("m_e4"))
                        & (F.col("b2") <= F.col("b"))
                    )
                ).cast("long")
            ).alias("rk")
        )
    )
    lo = F.min(F.when(F.col("rk") == 2, F.col("m_e4")))
    hi = F.min(F.when(F.col("rk") == _BOOT_B - 1, F.col("m_e4")))
    return (
        ranked.crossJoin(F.broadcast(obs))
        .groupBy("n", "sx")
        .agg(
            lo.cast("long").alias("ci_lo_e4"),
            hi.cast("long").alias("ci_hi_e4"),
            # total boolean: an undefined endpoint means "no CI
            # established" = false in BOTH engines (a NULL boolean
            # hashes differently per engine in the driver canon)
            F.coalesce(lo <= hi, F.lit(False)).alias("ci_ok"),
        )
        .select(
            "n",
            F.expr("CAST((sx * 20000 + n) div (2 * n) AS BIGINT)").alias(
                "mean_e4"
            ),
            F.lit(_BOOT_B).cast("long").alias("n_reps"),
            "ci_lo_e4",
            "ci_hi_e4",
            "ci_ok",
        )
    )


# ---------------------------------------------------------------------------
# Brier score decomposition (reliability / resolution / uncertainty)
# ---------------------------------------------------------------------------


@query(
    "brier_score_decomposition",
    oracle="""
    WITH d AS (
      SELECT least(15, n_chars // 64) AS p16,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS o
      FROM documents),
    tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(o) AS BIGINT) AS s,
             CAST(SUM((p16 - 16 * o) * (p16 - 16 * o)) AS BIGINT) AS sq256
      FROM d),
    bins AS (
      SELECT p16, CAST(COUNT(*) AS BIGINT) AS n_k,
             CAST(SUM(o) AS BIGINT) AS s_k
      FROM d GROUP BY p16),
    per AS (
      SELECT p16, n_k, s_k,
             CAST(round(
               CAST((n_k * p16 - 16 * s_k) * (n_k * p16 - 16 * s_k)
                    AS DOUBLE)
               / (256.0 * n_k * t.n) * 1000000000) AS BIGINT)
               AS rel_contrib_e9,
             CAST(round(
               CAST(CAST(t.n AS DECIMAL(38,0)) * s_k
                    - CAST(n_k AS DECIMAL(38,0)) * t.s AS DOUBLE)
               * CAST(CAST(t.n AS DECIMAL(38,0)) * s_k
                      - CAST(n_k AS DECIMAL(38,0)) * t.s AS DOUBLE)
               / (CAST(n_k AS DOUBLE) * CAST(t.n AS DOUBLE) * t.n * t.n)
               * 1000000000) AS BIGINT) AS res_contrib_e9
      FROM bins, tot t),
    sums AS (
      SELECT CAST(SUM(rel_contrib_e9) AS BIGINT) AS rel_e9,
             CAST(SUM(res_contrib_e9) AS BIGINT) AS res_e9
      FROM per)
    SELECT p16, n_k, s_k, rel_contrib_e9, res_contrib_e9,
           CAST(round(CAST(sq256 AS DOUBLE) / (256.0 * n) * 1000000000)
                AS BIGINT) AS brier_e9,
           rel_e9, res_e9,
           CAST(round(CAST(CAST(s AS DECIMAL(38,0)) * (n - s) AS DOUBLE)
                      / (CAST(n AS DOUBLE) * n) * 1000000000)
                AS BIGINT) AS unc_e9,
           CAST(round(CAST(sq256 AS DOUBLE) / (256.0 * n) * 1000000000)
                AS BIGINT)
             - (rel_e9 - res_e9
                + CAST(round(CAST(CAST(s AS DECIMAL(38,0)) * (n - s)
                                  AS DOUBLE)
                             / (CAST(n AS DOUBLE) * n) * 1000000000)
                       AS BIGINT)) AS identity_gap_e9
    FROM per, sums, tot
    """,
)
def q_brier_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Murphy decomposition of the Brier score (Murphy 1973, public):
    BS = reliability - resolution + uncertainty, for a discrete
    length-based probability forecast (p = min(15, n_chars/64)/16) of
    the lang='en' outcome — the forecast-quality readout that says
    WHY a score is bad (miscalibrated vs uninformative), one level
    deeper than classifier_calibration_bins' reliability diagram.

    The forecast is discrete by construction (16ths), so the
    decomposition identity holds exactly in rationals: the Brier
    numerator sum((p16 - 16o)^2) is an exact long; per-bin
    reliability (n_k*p16 - 16*s_k)^2 / (256*n_k*N) and resolution
    (N*s_k - n_k*S)^2 / (n_k*N^3) numerators are exact
    integers/DECIMALs into one IEEE division each, rounded to e9.
    identity_gap_e9 = brier - (rel - res + unc) carries the rounding
    residue (a few e-9 units): both engines compute identical
    per-term roundings, so the gap itself is deterministic — and
    near-zero, which pins all four terms against each other.

    100 TB shape: one scan to the 16-row bin table + one 3-scalar
    total; everything after is bin-table algebra. N^3 rides inside
    doubles built from DECIMAL-exact operands.
    """
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        F.least(F.lit(15), F.expr("n_chars div 64")).cast("long").alias("p16"),
        F.when(F.col("lang") == "en", 1).otherwise(0).cast("long").alias("o"),
    )
    tot = d.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("o").cast("long").alias("s"),
        F.sum(
            (F.col("p16") - 16 * F.col("o")) * (F.col("p16") - 16 * F.col("o"))
        )
        .cast("long")
        .alias("sq256"),
    )
    bins = d.groupBy("p16").agg(
        F.count(F.lit(1)).cast("long").alias("n_k"),
        F.sum("o").cast("long").alias("s_k"),
    )
    reln = F.col("n_k") * F.col("p16") - 16 * F.col("s_k")
    resn = (
        F.col("n").cast("decimal(38,0)") * F.col("s_k")
        - F.col("n_k").cast("decimal(38,0)") * F.col("s")
    )
    per = bins.crossJoin(F.broadcast(tot)).select(
        "p16",
        "n_k",
        "s_k",
        "n",
        "s",
        "sq256",
        F.round(
            (reln * reln).cast("double")
            / (256.0 * F.col("n_k") * F.col("n"))
            * 1000000000
        )
        .cast("long")
        .alias("rel_contrib_e9"),
        F.round(
            resn.cast("double")
            * resn.cast("double")
            / (
                F.col("n_k").cast("double")
                * F.col("n").cast("double")
                * F.col("n")
                * F.col("n")
            )
            * 1000000000
        )
        .cast("long")
        .alias("res_contrib_e9"),
    )
    sums = per.agg(
        F.sum("rel_contrib_e9").cast("long").alias("rel_e9"),
        F.sum("res_contrib_e9").cast("long").alias("res_e9"),
    )
    brier = F.round(
        F.col("sq256").cast("double") / (256.0 * F.col("n")) * 1000000000
    ).cast("long")
    unc = F.round(
        (F.col("s").cast("decimal(38,0)") * (F.col("n") - F.col("s"))).cast(
            "double"
        )
        / (F.col("n").cast("double") * F.col("n"))
        * 1000000000
    ).cast("long")
    return per.crossJoin(F.broadcast(sums)).select(
        "p16",
        "n_k",
        "s_k",
        "rel_contrib_e9",
        "res_contrib_e9",
        brier.alias("brier_e9"),
        "rel_e9",
        "res_e9",
        unc.alias("unc_e9"),
        (brier - (F.col("rel_e9") - F.col("res_e9") + unc)).alias(
            "identity_gap_e9"
        ),
    )
