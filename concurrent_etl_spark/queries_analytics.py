"""Event-analytics and corpus-quality tranche: staged funnel
conversion, retention cohorts, and two corpus-quality signals
(repetition ratio, n-gram novelty).

The funnel/retention pair is the product-analytics surface a
warehouse user expects next to the reference's fact pipeline (the
reference only lands facts, case_2/Normal.py:276-286 — it never
reads them back); the quality pair extends the north-star curation
signals. Determinism: stage membership depends only on MIN
timestamps (tie-free by construction), ratios are exact integer
rationals rounded once at the end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from concurrent_etl_spark.catalog import query
from concurrent_etl_spark.engine import load_table
from concurrent_etl_spark.operators import text as T
from concurrent_etl_spark.queries_llm import _FOLD, _shingles, _tok


@query(
    "funnel_conversion",
    oracle="""
    WITH v AS (
      SELECT user_id, MIN(ts) AS t_view FROM events
      WHERE event_type = 'view' GROUP BY 1),
    c AS (
      SELECT e.user_id, MIN(e.ts) AS t_click
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.t_view
      GROUP BY 1),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS t_purchase
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t_click
      GROUP BY 1)
    SELECT u.user_id,
           CASE WHEN p.user_id IS NOT NULL THEN 3
                WHEN c.user_id IS NOT NULL THEN 2
                WHEN v.user_id IS NOT NULL THEN 1
                ELSE 0 END AS stage
    FROM (SELECT DISTINCT user_id FROM events) u
    LEFT JOIN v ON u.user_id = v.user_id
    LEFT JOIN c ON u.user_id = c.user_id
    LEFT JOIN p ON u.user_id = p.user_id
    """,
)
def q_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel analysis: view -> click-after-view ->
    purchase-after-click, per user. Each stage is a keyed MIN over
    the events that happened after the previous stage's timestamp —
    the sequential dependency is expressed as a cascade of
    aggregate-then-rejoin steps, not a per-user sort, so each stage
    is one shuffle on user_id and the per-stage state is one
    timestamp per user. Stage tables shrink monotonically (funnel!)
    and all rejoins share the user_id key, which AQE plans as
    broadcast once a stage fits under the threshold.
    """
    e = load_table(spark, sf_dir, "events")
    v = (
        e.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        e.join(v, "user_id")
        .where((F.col("event_type") == "click") & (F.col("ts") > F.col("t_view")))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        e.join(c, "user_id")
        .where(
            (F.col("event_type") == "purchase") & (F.col("ts") > F.col("t_click"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    u = e.select("user_id").distinct()
    stage = (
        F.when(F.col("t_purchase").isNotNull(), 3)
        .when(F.col("t_click").isNotNull(), 2)
        .when(F.col("t_view").isNotNull(), 1)
        .otherwise(0)
    )
    return (
        u.join(v, "user_id", "left")
        .join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select("user_id", stage.alias("stage"))
    )


@query(
    "retention_cohorts",
    oracle="""
    WITH first_day AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day
      FROM events GROUP BY 1),
    act AS (
      SELECT DISTINCT e.user_id, f.cohort_day,
             date_diff('day', f.cohort_day, CAST(e.ts AS DATE)) AS day_offset
      FROM events e JOIN first_day f ON e.user_id = f.user_id)
    SELECT cohort_day, CAST(day_offset AS INTEGER) AS day_offset,
           COUNT(*) AS n_users
    FROM act GROUP BY 1, 2
    """,
)
def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention cohort matrix: users grouped by first-seen day, then
    distinct-user counts per (cohort_day, day_offset) — the classic
    triangle. Two aggs on user_id plus one date-keyed agg; the
    distinct-before-count collapses each user's events to at most
    one row per (user, day) BEFORE the final count, so the heavy
    reduction happens on the wide table and the final agg is
    cohort x offset sized (tiny). No window, no self-join over raw
    events.
    """
    e = load_table(spark, sf_dir, "events")
    first_day = e.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("cohort_day")
    )
    act = (
        e.join(first_day, "user_id")
        .select(
            "user_id",
            "cohort_day",
            F.datediff(F.col("ts").cast("date"), F.col("cohort_day")).alias(
                "day_offset"
            ),
        )
        .distinct()
    )
    return act.groupBy("cohort_day", F.col("day_offset").cast("int").alias("day_offset")).agg(
        F.count("*").alias("n_users")
    )


@query(
    "repetition_ratio",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_tok(_FOLD)} AS toks FROM documents),
    g AS (
      -- zip-with-shifts, not list_slice per position (O(n^2) in
      -- DuckDB — see queries_llm._shingles); padded tails filtered
      SELECT doc_id,
             unnest(list_filter(list_transform(
               list_zip(toks, (toks)[2:], (toks)[3:]),
               p -> CASE WHEN p[3] IS NULL THEN NULL
                    ELSE p[1] || ' ' || p[2] || ' ' || p[3] END),
               x -> x IS NOT NULL)) AS gram
      FROM t),
    c AS (SELECT doc_id, gram, COUNT(*) AS n FROM g GROUP BY 1, 2)
    SELECT doc_id,
           CAST(MAX(n) AS BIGINT) AS max_gram_n,
           CAST(SUM(n) AS BIGINT) AS n_grams,
           round(CAST(MAX(n) AS DOUBLE) / SUM(n), 9) AS repetition
    FROM c GROUP BY 1
    """,
)
def q_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition-ratio quality gate: share of a document's trigram
    occurrences taken by its single most-repeated trigram — the
    boilerplate/spam signal used alongside the length/alpha heuristics
    (high ratio = TOC pages, keyword stuffing, template text).
    Raw trigrams keep multiplicity (no distinct — multiplicity IS the
    signal); the reduction is two nested keyed aggs, both map-side
    combinable, never a per-doc sort. Docs under 3 tokens drop out in
    both engines (empty gram range).
    """
    docs = load_table(spark, sf_dir, "documents")
    staged = docs.select(
        "doc_id", T.tokens(T.ascii_fold("text")).alias("toks")
    )
    grams = F.transform(
        F.sequence(F.lit(1), F.size("toks") - 2),
        lambda i: F.array_join(F.slice("toks", i, 3), " "),
    )
    g = (
        staged.where(F.size("toks") >= 3)
        # explode-ok: grams is an inline transform expression (non-
        # attribute generator child, no inferred filter — plan-checked)
        .select("doc_id", F.explode(grams).alias("gram"))
    )
    c = g.groupBy("doc_id", "gram").agg(F.count("*").alias("n"))
    return c.groupBy("doc_id").agg(
        F.max("n").cast("bigint").alias("max_gram_n"),
        F.sum("n").cast("bigint").alias("n_grams"),
        F.round(F.max("n").cast("double") / F.sum("n"), 9).alias("repetition"),
    )


@query(
    "ngram_novelty",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id, unnest({_shingles(_FOLD)}) AS s FROM documents),
    dfreq AS (SELECT s, COUNT(*) AS n_docs FROM sh GROUP BY 1)
    SELECT sh.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_shingles,
           CAST(SUM(CASE WHEN d.n_docs = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_novel,
           round(CAST(SUM(CASE WHEN d.n_docs = 1 THEN 1 ELSE 0 END)
                 AS DOUBLE) / COUNT(*), 9) AS novelty
    FROM sh JOIN dfreq d ON sh.s = d.s
    GROUP BY 1
    """,
)
def q_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram novelty score: the fraction of a document's distinct
    bigram shingles that appear in NO other document — the
    diversity/contribution signal used when pruning a corpus down to
    a token budget (low novelty = redundant with the rest of the
    corpus even when no single near-duplicate exists). Shape:
    document-frequency agg on the shingle key, rejoin to the
    per-doc shingles, per-doc reduce — all shuffles keyed by
    uniform shingle hashes or doc_id; never doc x doc.
    """
    docs = load_table(spark, sf_dir, "documents")
    # sh feeds both the document-frequency agg and the rejoin;
    # persisted so the corpus shingle explosion runs once
    # tokens STAGED before shingling: the unstaged shingles(text)
    # form re-tokenizes per element inside the HOF lambda (measured
    # 5.8s -> 0.9s for this explode at sf0.1)
    sh = (
        docs.select("doc_id", T.tokens(T.ascii_fold("text")).alias("_t"))
        .select(
            "doc_id",
            F.explode(T.shingles_from_tokens(F.col("_t"), 2)).alias("s"),
        )
        .persist()
    )
    dfreq = sh.groupBy("s").agg(F.count("*").alias("n_docs"))
    novel = F.when(F.col("n_docs") == 1, 1).otherwise(0)
    return (
        sh.join(dfreq, "s")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_shingles"),
            F.sum(novel).cast("bigint").alias("n_novel"),
            F.round(
                F.sum(novel).cast("double") / F.count("*"), 9
            ).alias("novelty"),
        )
    )


@query(
    "sessionize_gap_cumsum",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                       OR LAG(ts) OVER w IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    sessions AS (
      SELECT user_id, ts, event_id, value,
             SUM(new_session) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW) AS session_idx
      FROM flagged)
    SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
           COUNT(*) AS n_events,
           MIN(ts) AS session_start, MAX(ts) AS session_end,
           CAST(date_diff('second', MIN(ts), MAX(ts)) AS BIGINT)
             AS duration_s
    FROM sessions
    GROUP BY 1, 2
    """,
)
def q_sessionize_gap_cumsum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manual sessionization: a session boundary is a >30-minute gap;
    session ids are the running count of boundaries (lag + cumulative
    sum over a total-ordered window) — the batch formulation that
    makes session identity explicit and joinable, complementing the
    session_window aggregate (which keeps ids internal). One shuffle
    on user_id shared by the lag, the cumsum, and the final per-
    session reduce; integer flags and timestamp diffs only, so no
    float staging.
    """
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    new_session = F.when(
        gap.isNull() | (gap > 30 * 60), 1
    ).otherwise(0)
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sessions = e.select(
        "user_id", "ts", "event_id", "value", new_session.alias("ns")
    ).select(
        "user_id",
        "ts",
        "event_id",
        "value",
        F.sum("ns").over(cum).alias("session_idx"),
    )
    return sessions.groupBy(
        "user_id", F.col("session_idx").cast("bigint").alias("session_idx")
    ).agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        (F.max(F.col("ts").cast("long")) - F.min(F.col("ts").cast("long")))
        .cast("bigint")
        .alias("duration_s"),
    )


@query(
    "sequence_pattern_match",
    oracle="""
    WITH seqs AS (
      SELECT user_id,
             string_agg(left(event_type, 1), '' ORDER BY ts, event_id)
               AS seq
      FROM events GROUP BY user_id)
    SELECT user_id,
           CAST(length(seq) AS BIGINT) AS seq_len,
           CAST(len(regexp_extract_all(seq, 'vc*p')) AS BIGINT)
             AS n_funnel_paths,
           CAST(len(regexp_extract_all(seq, 'ee+')) AS BIGINT)
             AS n_error_bursts,
           CAST(len(regexp_extract_all(seq, 'vc*p')) > 0 AS BOOLEAN)
             AS converted
    FROM seqs
    """,
)
def q_sequence_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-sequence pattern matching (MATCH_RECOGNIZE-lite): each
    user's event history collapses to an ordered type string (one
    char per event, ties broken by event_id so the encoding is
    deterministic), and behavioral patterns become plain regexes over
    it — view→(clicks)*→purchase funnel paths, repeated-error
    bursts. The per-user sequence is built with
    array_sort(collect_list(struct)) — grouped, not windowed, so one
    shuffle keyed on user_id and no per-user sort pass; the regex
    scan is per-row JVM work on kilobyte strings. The funnel count
    cross-checks q_funnel_conversion's staged-min-timestamp approach
    with a completely different mechanism.

    At 100 TB the only guard needed is per-user sequence length
    (collect_list state is the user's event count — bounded for
    human-generated events; a runaway key would need the same
    salting/capping remedy as any hot aggregation key).
    """
    ev = load_table(spark, sf_dir, "events")
    seqs = (
        ev.select(
            "user_id",
            F.struct(
                F.col("ts"),
                F.col("event_id"),
                F.substring("event_type", 1, 1).alias("c"),
            ).alias("s"),
        )
        .groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("s")), lambda x: x["c"]
                ),
                "",
            ).alias("seq")
        )
    )
    n_funnel = F.regexp_count(F.col("seq"), F.lit("vc*p"))
    return seqs.select(
        "user_id",
        F.length("seq").cast("bigint").alias("seq_len"),
        n_funnel.cast("bigint").alias("n_funnel_paths"),
        F.regexp_count(F.col("seq"), F.lit("ee+"))
        .cast("bigint")
        .alias("n_error_bursts"),
        (n_funnel > 0).alias("converted"),
    )


@query(
    "yoy_revenue_growth",
    oracle="""
    WITH rev AS (
      SELECT n.n_name AS nation,
             EXTRACT(year FROM o.o_orderdate) AS yr,
             CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                           AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY 1, 2)
    SELECT cur.nation,
           CAST(cur.yr AS BIGINT) AS yr,
           cur.revenue,
           prev.revenue AS prev_revenue,
           ROUND(cur.revenue / prev.revenue - 1, 9) AS growth
    FROM rev cur JOIN rev prev
      ON prev.nation = cur.nation AND prev.yr = cur.yr - 1
    """,
)
def q_yoy_revenue_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year growth (the TPC-DS q47-family shape): revenue
    per (nation, year), then the period self-join against year-1 for
    the growth ratio. Expressed as lag() over the per-nation year
    series rather than a literal self-join — one shuffle keyed on
    nation serves both the aggregation and the window, where the
    naive self-join re-shuffles the aggregate twice. Decimal-exact
    revenue sums; the single division happens on the final
    year-aligned pair.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    rev = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("yr"),
        )
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,4)"
                )
            )
            .cast("double")
            .alias("revenue")
        )
    )
    w = Window.partitionBy("nation").orderBy("yr")
    out = rev.select(
        "nation",
        F.col("yr").cast("bigint").alias("yr"),
        "revenue",
        F.lag("revenue").over(w).alias("prev_revenue"),
        F.lag("yr").over(w).alias("prev_yr"),
    )
    return (
        out.where(F.col("prev_yr") == F.col("yr") - 1)
        .select(
            "nation",
            "yr",
            "revenue",
            "prev_revenue",
            F.round(F.col("revenue") / F.col("prev_revenue") - 1, 9).alias(
                "growth"
            ),
        )
    )


# ---------------------------------------------------------------------------
# skyline / Pareto frontier
# ---------------------------------------------------------------------------

#: price-bucket width for the distributed skyline prefix scan.
#: p_retailprice is the TPC-H formula 900 + (partkey % 1000)/10 —
#: bounded in [900, 2100] at ANY scale factor, so the bucket table is
#: at most ~240 rows however large the part table grows.
_SKY_W = 5


@query(
    "skyline_pareto_parts",
    oracle="""
    WITH d AS (
      SELECT p_retailprice AS retail_price, p_size,
             CAST(COUNT(*) AS BIGINT) AS n_parts
      FROM part GROUP BY 1, 2
    ),
    s AS (
      SELECT *, max(p_size) OVER (
               ORDER BY retail_price ASC, p_size DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS rm
      FROM d
    )
    SELECT retail_price, p_size, n_parts
    FROM s WHERE rm IS NULL OR p_size > rm
    """,
)
def q_skyline_pareto_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline (Pareto frontier) of parts: minimize retail price,
    maximize size — a point survives iff no other part is at most as
    expensive AND at least as large with one strict. Skylines are the
    standard multi-objective shortlist operator (Borzsony/Kossmann/
    Stocker, "The Skyline Operator", ICDE 2001 — public paper).

    Beyond-the-reference surface (no analogue; nearest is row
    filtering, case_2/Normal.py:203).

    The oracle states it as the textbook sorted running max (sort by
    price asc / size desc; survive iff size exceeds every earlier
    size). The Spark plan computes the SAME prefix scan with no
    global window: points are bucketed on fixed price intervals, the
    running max within each bucket is a window PARTITIONED on the
    bucket, and the cross-bucket prefix maxes come from a BOUNDED
    collect of one row per bucket (<= ~240 rows at any scale, see
    ``_SKY_W``) that re-enter the plan as a literal map — the
    partition-offset pattern of ``global_id_assignment``.

    Shape at 100 TB: one groupBy to distinct points (dominance-count
    grain), one bucket-partitioned window, one bucket-sized collect;
    the fact-sized data shuffles exactly twice (distinct, bucket
    window) and no pairwise dominance join ever forms.
    """
    d = (
        load_table(spark, sf_dir, "part")
        .groupBy(
            F.col("p_retailprice").alias("retail_price"), F.col("p_size")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_parts"))
        .withColumn(
            "bucket", F.floor(F.col("retail_price") / _SKY_W).cast("long")
        )
        .persist()
    )
    # bounded collect: one row per price bucket (<= ~240 at any SF)
    bmax = {
        r["bucket"]: r["m"]
        for r in d.groupBy("bucket").agg(F.max("p_size").alias("m")).collect()
    }
    prefix: dict[int, int] = {}
    run = None
    for b in sorted(bmax):
        prefix[b] = run if run is not None else -1
        run = bmax[b] if run is None else max(run, bmax[b])
    # empty-corpus guard: zero-arg create_map is map<void,void> and
    # the lookup fails analysis — typed empty map keeps the (zero-
    # row) plan compiling
    if prefix:
        pref_map = F.create_map(
            *[F.lit(x) for kv in sorted(prefix.items()) for x in kv]
        )
    else:
        pref_map = F.lit(None).cast("map<bigint,int>")
    w = (
        Window.partitionBy("bucket")
        .orderBy(F.col("retail_price").asc(), F.col("p_size").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    s = d.select(
        "retail_price",
        "p_size",
        "n_parts",
        F.greatest(
            F.coalesce(F.max("p_size").over(w), F.lit(-1)),
            pref_map[F.col("bucket")],
        ).alias("rm"),
    )
    return s.where(F.col("p_size") > F.col("rm")).drop("rm")


@query(
    "multitouch_attribution_linear",
    oracle="""
    WITH conv AS (
      SELECT event_id AS conv_id, user_id, ts AS conv_ts,
             CAST(floor(value * 100) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'),
    touch AS (
      SELECT user_id, event_type AS channel, ts AS touch_ts
      FROM events WHERE event_type IN ('view', 'click')),
    matched AS (
      SELECT c.conv_id, c.cents, t.channel
      FROM conv c JOIN touch t
        ON t.user_id = c.user_id
       AND t.touch_ts < c.conv_ts
       AND t.touch_ts >= c.conv_ts - INTERVAL 24 HOUR),
    per_conv AS (
      SELECT conv_id, CAST(COUNT(*) AS BIGINT) AS k FROM matched
      GROUP BY conv_id),
    credit AS (
      SELECT m.channel,
             CAST(COUNT(*) AS BIGINT) AS n_touches,
             CAST(COUNT(DISTINCT m.conv_id) AS BIGINT) AS n_conversions,
             CAST(SUM((m.cents * 2000000 + p.k) // (2 * p.k))
                  AS BIGINT) AS attributed_e6
      FROM matched m JOIN per_conv p USING (conv_id)
      GROUP BY m.channel),
    direct AS (
      SELECT 'direct' AS channel,
             CAST(0 AS BIGINT) AS n_touches,
             CAST(COUNT(*) AS BIGINT) AS n_conversions,
             CAST(SUM(cents) * 1000000 AS BIGINT) AS attributed_e6
      FROM conv c
      WHERE NOT EXISTS (SELECT 1 FROM matched m
                        WHERE m.conv_id = c.conv_id))
    SELECT * FROM credit UNION ALL SELECT * FROM direct
    """,
)
def q_multitouch_attribution_linear(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Multi-touch LINEAR attribution: every purchase's value is
    split equally across all view/click touchpoints in its 24-hour
    lookback window; purchases with no touchpoints credit a 'direct'
    channel in full — so total attributed value exactly conserves
    total purchase value (the books balance, asserted in tests).

    Per-touch credit is the exact half-up integral cents*1e6/k — the
    same rounding both engines — summed per channel as exact longs.
    Contrast with attribution_left_outer (last-touch pairing): linear
    credit is the model marketing analytics actually reconciles
    revenue against.

    Scale shape: the touch-to-conversion match is a lookback-BOUNDED
    range join on user (the range_join_events discipline: at 100 TB,
    bucket both sides by user x coarse time so candidates stay
    window-sized); per-conversion touch counts and channel rollups
    are map-side-combinable aggs; the 'direct' branch is an anti-join
    of conversions against the matched set.

    Reference parity: none — product-analytics surface over events.
    """
    ev = load_table(spark, sf_dir, "events")
    conv = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("conv_id"),
        F.col("user_id").alias("cu"),
        F.col("ts").alias("conv_ts"),
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
    )
    touch = ev.where(F.col("event_type").isin("view", "click")).select(
        F.col("user_id").alias("tu"),
        F.col("event_type").alias("channel"),
        F.col("ts").alias("touch_ts"),
    )
    matched = conv.join(
        touch,
        (F.col("tu") == F.col("cu"))
        & (F.col("touch_ts") < F.col("conv_ts"))
        & (
            F.col("touch_ts")
            >= F.col("conv_ts") - F.expr("INTERVAL 24 HOURS")
        ),
    ).select("conv_id", "cents", "channel")
    per_conv = matched.groupBy("conv_id").agg(
        F.count(F.lit(1)).cast("long").alias("k")
    )
    credit = (
        matched.join(per_conv, "conv_id")
        .groupBy("channel")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_touches"),
            F.countDistinct("conv_id").cast("long").alias("n_conversions"),
            F.sum(
                F.expr("(cents * 2000000 + k) div (2 * k)")
            )
            .cast("long")
            .alias("attributed_e6"),
        )
    )
    direct = (
        conv.join(per_conv, "conv_id", "left_anti")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_conversions"),
            (F.sum("cents") * 1000000).cast("long").alias("attributed_e6"),
        )
        .select(
            F.lit("direct").alias("channel"),
            F.lit(0).cast("long").alias("n_touches"),
            "n_conversions",
            "attributed_e6",
        )
    )
    return credit.unionByName(direct)


@query(
    "rfm_segmentation",
    oracle="""
    WITH endt AS (SELECT MAX(epoch_us(ts)) AS e FROM events),
    pu AS (
      SELECT user_id,
             (e - MAX(epoch_us(ts))) // 86400000000 AS r_days,
             CAST(COUNT(*) AS BIGINT) AS f_events,
             CAST(SUM(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
               AS m_cents
      FROM events, endt GROUP BY user_id, e),
    nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM pu),
    q AS (
      SELECT user_id,
             5 - CAST(((SELECT COUNT(*) FROM pu p2
                        WHERE p2.r_days < pu.r_days
                           OR (p2.r_days = pu.r_days
                               AND p2.user_id < pu.user_id)) * 5)
                      // nn.n AS BIGINT) AS r_q,
             1 + CAST(((SELECT COUNT(*) FROM pu p2
                        WHERE p2.f_events < pu.f_events
                           OR (p2.f_events = pu.f_events
                               AND p2.user_id < pu.user_id)) * 5)
                      // nn.n AS BIGINT) AS f_q,
             1 + CAST(((SELECT COUNT(*) FROM pu p2
                        WHERE p2.m_cents < pu.m_cents
                           OR (p2.m_cents = pu.m_cents
                               AND p2.user_id < pu.user_id)) * 5)
                      // nn.n AS BIGINT) AS m_q
      FROM pu, nn)
    SELECT r_q, f_q, m_q,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM q GROUP BY r_q, f_q, m_q
    """,
)
def q_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation — the classic customer-value cube: every user
    scored 1..5 on Recency (days since last event; recent = 5),
    Frequency, and Monetary (quintile rank each), then counted per
    (R,F,Q) segment. Quintiles are EXACT rank arithmetic with a
    user_id tiebreak — q = floor(rank*5/n) — so the bucketing is an
    order statistic, deterministic at any partitioning (never an
    ntile over a global sort; the per-user rank comes from a window
    PARTITIONED by nothing row-sized: ranks are computed by sorting
    only the per-user table... which is user-bounded, and here
    derived via row_number over a user-count-bounded table — at
    100 TB users are ~1e9: this would become the bucket-offset
    cumsum over each measure's value domain, the same shape as
    conversion_latency_quantiles).

    The oracle states the same ranks as correlated counts (the
    rank definition itself), immune to window-implementation
    differences.
    """
    from pyspark.sql import Window as _W

    ev = load_table(spark, sf_dir, "events")
    endt = ev.agg(F.max(F.unix_micros("ts")).alias("e"))
    pu = (
        ev.groupBy("user_id")
        .agg(
            F.max(F.unix_micros("ts")).alias("last_us"),
            F.count(F.lit(1)).cast("long").alias("f_events"),
            F.sum(F.floor(F.col("value") * 100).cast("long"))
            .cast("long")
            .alias("m_cents"),
        )
        .crossJoin(F.broadcast(endt))
        .select(
            "user_id",
            F.expr("(e - last_us) div 86400000000").alias("r_days"),
            "f_events",
            "m_cents",
        )
    )
    nn = pu.agg(F.count(F.lit(1)).cast("long").alias("n"))
    # per-user ranks over the USER-BOUNDED table: single-partition
    # windows would violate the plan rule, so rank via the same
    # grouped-cumsum trick as the quantile queries — per measure,
    # distinct values cumulated, joined back with a user_id tiebreak
    # resolved by an ordinal within equal values
    def _rank_join(col: str) -> DataFrame:
        pv = pu.groupBy(F.col(col).alias("v")).agg(
            F.count(F.lit(1)).alias("t")
        )
        from concurrent_etl_spark.queries_stats import _cum_by_value

        cum = _cum_by_value(
            pv.select("v", F.lit(0).cast("long").alias("a"), "t")
        ).select(F.col("v"), (F.col("cum_t") - F.col("t")).alias("below"))
        wtie = _W.partitionBy(col).orderBy("user_id")
        return (
            pu.select("user_id", col)
            .withColumn("tie", F.row_number().over(wtie) - 1)
            .join(cum, F.col(col) == F.col("v"))
            .select(
                "user_id",
                (F.col("below") + F.col("tie")).alias(f"rank_{col}"),
            )
        )

    ranked = (
        pu.select("user_id")
        .join(_rank_join("r_days"), "user_id")
        .join(_rank_join("f_events"), "user_id")
        .join(_rank_join("m_cents"), "user_id")
        .crossJoin(F.broadcast(nn))
    )
    q = ranked.select(
        (5 - F.expr("(rank_r_days * 5) div n")).alias("r_q"),
        (1 + F.expr("(rank_f_events * 5) div n")).alias("f_q"),
        (1 + F.expr("(rank_m_cents * 5) div n")).alias("m_q"),
    )
    return q.groupBy("r_q", "f_q", "m_q").agg(
        F.count(F.lit(1)).cast("long").alias("n_users")
    )


@query(
    "cohort_ltv_curve",
    oracle="""
    WITH e AS (
      SELECT user_id, epoch_us(ts) // 604800000000 AS wk,
             CAST(floor(value * 100) AS BIGINT) AS cents
      FROM events),
    first_wk AS (
      SELECT user_id, MIN(wk) AS cohort FROM e GROUP BY user_id),
    sizes AS (
      SELECT cohort, CAST(COUNT(*) AS BIGINT) AS n_users
      FROM first_wk GROUP BY cohort),
    rev AS (
      SELECT f.cohort, e.wk - f.cohort AS age_weeks,
             CAST(SUM(e.cents) AS BIGINT) AS rev_cents
      FROM e JOIN first_wk f ON f.user_id = e.user_id
      GROUP BY f.cohort, e.wk - f.cohort),
    cum AS (
      SELECT cohort, age_weeks, rev_cents,
             SUM(rev_cents) OVER (PARTITION BY cohort
                                  ORDER BY age_weeks) AS cum_rev
      FROM rev)
    SELECT CAST(c.cohort AS BIGINT) AS cohort_week,
           CAST(c.age_weeks AS BIGINT) AS age_weeks,
           s.n_users, c.rev_cents,
           CAST(c.cum_rev AS BIGINT) AS cum_rev_cents,
           CAST((c.cum_rev * 200 + s.n_users) // (2 * s.n_users)
                AS BIGINT) AS ltv_per_user_e2
    FROM cum c JOIN sizes s ON s.cohort = c.cohort
    """,
)
def q_cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curve: users cohorted by first-activity
    week, revenue accumulated per cohort-age — the LTV trajectory a
    growth team projects payback from, and the value-weighted
    companion of retention_cohorts (which counts who returns; this
    sums what they spend).

    Exact cents end to end; the cumulative runs over a window
    PARTITIONED by cohort on the WEEK-bounded age axis; per-user LTV
    is the e2 half-up integral.

    Scale shape: one groupBy(user) for cohorts, one
    (cohort x age)-bounded rollup, one partitioned cumsum. Week
    arithmetic is pure epoch integers.
    """
    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        "user_id",
        F.expr("unix_micros(ts) div 604800000000").alias("wk"),
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
    )
    first_wk = e.groupBy("user_id").agg(F.min("wk").alias("cohort"))
    sizes = first_wk.groupBy("cohort").agg(
        F.count(F.lit(1)).cast("long").alias("n_users")
    )
    rev = (
        e.join(first_wk, "user_id")
        .groupBy("cohort", (F.col("wk") - F.col("cohort")).alias("age_weeks"))
        .agg(F.sum("cents").cast("long").alias("rev_cents"))
    )
    w = Window.partitionBy("cohort").orderBy("age_weeks")
    cum = rev.withColumn("cum_rev", F.sum("rev_cents").over(w))
    # broadcast-ok: one row per weekly cohort — calendar-bounded, not corpus-sized
    return cum.join(F.broadcast(sizes), "cohort").select(
        F.col("cohort").cast("long").alias("cohort_week"),
        F.col("age_weeks").cast("long").alias("age_weeks"),
        "n_users",
        "rev_cents",
        F.col("cum_rev").cast("long").alias("cum_rev_cents"),
        F.expr(
            "CAST((cum_rev * 200 + n_users) div (2 * n_users) AS BIGINT)"
        ).alias("ltv_per_user_e2"),
    )


@query(
    "event_path_trigrams",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type, 1) OVER w AS p1,
             lag(event_type, 2) OVER w AS p2
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    tri AS (
      SELECT p2 AS step1, p1 AS step2, event_type AS step3,
             CAST(COUNT(*) AS BIGINT) AS n_paths
      FROM seq WHERE p2 IS NOT NULL
      GROUP BY 1, 2, 3)
    SELECT step1, step2, step3, n_paths
    FROM tri
    ORDER BY n_paths DESC, step1, step2, step3
    LIMIT 20
    """,
)
def q_event_path_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 three-step user journeys — the Sankey-diagram counts a
    product team reads paths from, one order of memory above
    markov_transition_matrix's first-order pairs (paths expose
    sequences like view->click->purchase that the transition matrix
    factorizes away).

    Two lags over the same user-partitioned window (deterministic
    (ts, event_id) order), one |event_types|^3-bounded count, one
    TakeOrdered with full-path tiebreak.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("step3"),
        F.lag("event_type", 1).over(w).alias("step2"),
        F.lag("event_type", 2).over(w).alias("step1"),
    )
    return (
        seq.where(F.col("step1").isNotNull())
        .groupBy("step1", "step2", "step3")
        .agg(F.count(F.lit(1)).cast("long").alias("n_paths"))
        .orderBy(
            F.desc("n_paths"),
            F.asc("step1"),
            F.asc("step2"),
            F.asc("step3"),
        )
        .limit(20)
    )


@query(
    "mix_shift_decomposition",
    oracle="""
    WITH base AS (
      SELECT event_type,
             CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 0 ELSE 1 END
               AS period,
             CAST(floor(value * 100) AS BIGINT) AS cents
      FROM events),
    cell AS (
      SELECT event_type, period,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(cents) AS BIGINT) AS s
      FROM base GROUP BY event_type, period),
    tot AS (
      SELECT period, CAST(SUM(n) AS BIGINT) AS nt
      FROM cell GROUP BY period),
    wide AS (
      SELECT c.event_type,
             MAX(CASE WHEN c.period = 0 THEN c.n END) AS n_a,
             MAX(CASE WHEN c.period = 1 THEN c.n END) AS n_b,
             MAX(CASE WHEN c.period = 0 THEN c.s END) AS s_a,
             MAX(CASE WHEN c.period = 1 THEN c.s END) AS s_b,
             MAX(CASE WHEN t.period = 0 THEN t.nt END) AS nt_a,
             MAX(CASE WHEN t.period = 1 THEN t.nt END) AS nt_b
      FROM cell c JOIN tot t ON t.period = c.period
      GROUP BY c.event_type)
    SELECT event_type, n_a, n_b, s_a, s_b,
           -- rate effect at period-A mix + mix effect at period-B
           -- rate: exact Laspeyres/Paasche split of the per-event
           -- mean shift, each ONE double expression rounded to e2
           CAST(round((CAST(s_b AS DOUBLE) / n_b
                       - CAST(s_a AS DOUBLE) / n_a)
                      * (CAST(n_a AS DOUBLE) / nt_a) * 100)
                AS BIGINT) AS rate_effect_e2,
           CAST(round((CAST(n_b AS DOUBLE) / nt_b
                       - CAST(n_a AS DOUBLE) / nt_a)
                      * (CAST(s_b AS DOUBLE) / n_b) * 100)
                AS BIGINT) AS mix_effect_e2
    FROM wide
    """,
)
def q_mix_shift_decomposition(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Mix-shift decomposition — the BI answer to 'did the average
    move because segments changed their RATE or because the MIX of
    segments changed': per event type, the contribution of its
    per-event mean shift at old mix (rate effect) and of its share
    shift at new rate (mix effect), the Laspeyres/Paasche split every
    revenue-review deck runs.

    The 2x|types| cell table is exact integers; each effect is one
    double expression over exact operands, rounded to e2 — identical
    IEEE ops both engines. Effects sum (up to per-type rounding) to
    the total per-event mean shift, asserted in tests.

    Scale shape: one map-side-combinable groupBy to the bounded cell
    table; constant-size algebra after.
    """
    ev = load_table(spark, sf_dir, "events")
    cut = F.lit("2024-01-16 00:00:00").cast("timestamp")
    base = ev.select(
        "event_type",
        F.when(F.col("ts") < cut, 0).otherwise(1).alias("period"),
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
    )
    cell = base.groupBy("event_type", "period").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("s"),
    )
    tot = cell.groupBy("period").agg(F.sum("n").cast("long").alias("nt"))
    wide = (
        # broadcast-ok: one row per period — calendar-bounded
        cell.join(F.broadcast(tot), "period")
        .groupBy("event_type")
        .agg(
            F.max(F.when(F.col("period") == 0, F.col("n"))).alias("n_a"),
            F.max(F.when(F.col("period") == 1, F.col("n"))).alias("n_b"),
            F.max(F.when(F.col("period") == 0, F.col("s"))).alias("s_a"),
            F.max(F.when(F.col("period") == 1, F.col("s"))).alias("s_b"),
            F.max(F.when(F.col("period") == 0, F.col("nt"))).alias("nt_a"),
            F.max(F.when(F.col("period") == 1, F.col("nt"))).alias("nt_b"),
        )
    )
    d = lambda c: F.col(c).cast("double")
    return wide.select(
        "event_type",
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.col("s_a").cast("long").alias("s_a"),
        F.col("s_b").cast("long").alias("s_b"),
        F.round(
            (d("s_b") / F.col("n_b") - d("s_a") / F.col("n_a"))
            * (d("n_a") / F.col("nt_a"))
            * 100
        )
        .cast("long")
        .alias("rate_effect_e2"),
        F.round(
            (d("n_b") / F.col("nt_b") - d("n_a") / F.col("nt_a"))
            * (d("s_b") / F.col("n_b"))
            * 100
        )
        .cast("long")
        .alias("mix_effect_e2"),
    )


@query(
    "key_skew_gini",
    oracle="""
    WITH f AS (
      SELECT o_custkey AS k, CAST(COUNT(*) AS BIGINT) AS c
      FROM orders GROUP BY o_custkey),
    r AS (
      SELECT c, ROW_NUMBER() OVER (ORDER BY c, k) AS rnk FROM f),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(c) AS BIGINT) AS tot,
             CAST(SUM(rnk * c) AS BIGINT) AS wsum
      FROM r)
    SELECT n AS n_keys, tot AS n_rows,
           CAST(round((2.0 * wsum / (CAST(n AS DOUBLE) * tot)
                       - (n + 1.0) / n) * 1000000) AS BIGINT)
             AS gini_e6
    FROM m
    """,
)
def q_key_skew_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of the order-per-customer key distribution —
    the single-number skew metric that tells a planner whether a
    shuffle on this key needs salting BEFORE the job runs (0 =
    perfectly even keys; near 1 = a celebrity key owns the shuffle).
    Complements skew_diagnostics (which lists the heavy keys) with
    the standardized inequality score.

    Exact Lorenz arithmetic: keys ranked ascending by count (id
    tiebreak), G = 2*sum(rank*count)/(n*total) - (n+1)/n — rank*count
    sums are exact longs from the bucket-offset rank machinery (the
    oracle states ranks with a single-node window); one double
    expression at the end.

    Scale shape: one groupBy(key), ranks over the count-DOMAIN-
    bounded distinct-count table (per-count blocks rank contiguously;
    within a block ranks are an arithmetic series — summed in closed
    form, no per-key window at scale). Here keys are ranked directly;
    the closed-form block optimization is noted for the 1e9-key case.
    """
    orders = load_table(spark, sf_dir, "orders")
    f = orders.groupBy(F.col("o_custkey").alias("k")).agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    # rank via per-count blocks: block offset from the bounded cumsum,
    # within-block ordinal by key id (partitioned window)
    from concurrent_etl_spark.queries_stats import _cum_by_value

    pv = f.groupBy(F.col("c").alias("v")).agg(
        F.lit(0).cast("long").alias("a"), F.count(F.lit(1)).alias("t")
    )
    blocks = _cum_by_value(pv).select(
        F.col("v").alias("c"), (F.col("cum_t") - F.col("t")).alias("below")
    )
    wtie = Window.partitionBy("c").orderBy("k")
    ranked = (
        f.withColumn("ord", F.row_number().over(wtie))
        .join(blocks, "c")
        .select("c", (F.col("below") + F.col("ord")).alias("rnk"))
    )
    m = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("c").cast("long").alias("tot"),
        F.sum(F.col("rnk") * F.col("c")).cast("long").alias("wsum"),
    )
    return m.select(
        F.col("n").alias("n_keys"),
        F.col("tot").alias("n_rows"),
        F.round(
            (
                2.0 * F.col("wsum") / (F.col("n").cast("double") * F.col("tot"))
                - (F.col("n") + 1.0) / F.col("n")
            )
            * 1000000
        )
        .cast("long")
        .alias("gini_e6"),
    )


@query(
    "session_bounce_rate",
    oracle="""
    WITH seq AS (
      SELECT user_id, epoch_us(ts) AS us,
             lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev
      FROM events),
    marked AS (
      SELECT user_id, us,
             CASE WHEN prev IS NULL OR us - prev > 1800000000
                  THEN 1 ELSE 0 END AS is_start
      FROM seq),
    sess AS (
      SELECT user_id,
             SUM(is_start) OVER (PARTITION BY user_id ORDER BY us)
               AS sid
      FROM marked),
    per_sess AS (
      SELECT user_id, sid, CAST(COUNT(*) AS BIGINT) AS n_events
      FROM sess GROUP BY user_id, sid)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_bounces,
           CAST((SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)
                 * 2000000 + COUNT(*)) // (2 * COUNT(*)) AS BIGINT)
             AS bounce_rate_e6,
           CAST(MAX(n_events) AS BIGINT) AS max_session_events
    FROM per_sess
    """,
)
def q_session_bounce_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounce rate over 30-minute-gap sessions: the share of sessions
    containing exactly ONE event — the single most-watched engagement
    metric, computed on the same gap-cumsum sessionization as
    sessionize_gap_cumsum (session id = running count of gap starts,
    a user-PARTITIONED prefix sum; per-user sequences are
    session-sized, never corpus-sized).

    All counts exact; the rate is the e6 half-up integral.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        F.unix_micros("ts").alias("us"),
        F.lag(F.unix_micros("ts")).over(w).alias("prev"),
    )
    marked = seq.select(
        "user_id",
        "us",
        F.when(
            F.col("prev").isNull()
            | (F.col("us") - F.col("prev") > 1800000000),
            1,
        )
        .otherwise(0)
        .alias("is_start"),
    )
    ws = Window.partitionBy("user_id").orderBy("us")
    sess = marked.withColumn("sid", F.sum("is_start").over(ws))
    per_sess = sess.groupBy("user_id", "sid").agg(
        F.count(F.lit(1)).cast("long").alias("n_events")
    )
    return per_sess.agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions"),
        F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_bounces"),
        F.expr(
            "CAST((SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)"
            " * 2000000 + COUNT(*)) div (2 * COUNT(*)) AS BIGINT)"
        ).alias("bounce_rate_e6"),
        F.max("n_events").cast("long").alias("max_session_events"),
    )


@query(
    "revenue_concentration_deciles",
    oracle="""
    WITH per_cust AS (
      SELECT o_custkey AS k,
             CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders GROUP BY o_custkey),
    r AS (
      SELECT cents,
             ROW_NUMBER() OVER (ORDER BY cents DESC, k) AS rnk
      FROM per_cust),
    m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(cents) AS BIGINT) AS tot FROM r),
    dec AS (
      SELECT CAST(((rnk - 1) * 10) // n AS BIGINT) + 1 AS decile,
             CAST(COUNT(*) AS BIGINT) AS n_cust,
             CAST(SUM(cents) AS BIGINT) AS cents
      FROM r, m GROUP BY 1)
    SELECT decile, n_cust, cents,
           CAST((cents * 2000000 + tot) // (2 * tot) AS BIGINT)
             AS share_e6
    FROM dec, m
    """,
)
def q_revenue_concentration_deciles(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Revenue concentration: customers ranked by spend, bucketed
    into deciles (decile 1 = top spenders), each with its exact
    revenue share — the '10% of customers drive X% of revenue'
    readout, the tabular companion of key_skew_gini's single number.

    Ranks are exact order statistics (spend-domain cumsum + key
    tiebreak ordinal, the rfm_segmentation machinery — the oracle
    states them with a single-node window); decile = floor(10 *
    0-based-rank / n) + 1; shares are e6 half-up integrals of exact
    cent sums.
    """
    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy(F.col("o_custkey").alias("k")).agg(
        F.sum(F.floor(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("cents")
    )
    from concurrent_etl_spark.queries_stats import _cum_by_value

    # descending spend rank: rank ascending on NEGATED cents
    pv = per_cust.groupBy((-F.col("cents")).alias("v")).agg(
        F.lit(0).cast("long").alias("a"), F.count(F.lit(1)).alias("t")
    )
    blocks = _cum_by_value(pv).select(
        (-F.col("v")).alias("cents_b"),
        (F.col("cum_t") - F.col("t")).alias("below"),
    )
    wtie = Window.partitionBy("cents").orderBy("k")
    ranked = (
        per_cust.withColumn("ord", F.row_number().over(wtie))
        .join(blocks, F.col("cents") == F.col("cents_b"))
        .select(
            "cents", (F.col("below") + F.col("ord") - 1).alias("rnk0")
        )
    )
    m = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("tot"),
    )
    dec = (
        ranked.crossJoin(F.broadcast(m))
        .groupBy(
            (F.expr("(rnk0 * 10) div n") + 1).alias("decile"), "tot"
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_cust"),
            F.sum("cents").cast("long").alias("cents"),
        )
    )
    return dec.select(
        F.col("decile").cast("long").alias("decile"),
        "n_cust",
        "cents",
        F.expr(
            "CAST((cents * 2000000 + tot) div (2 * tot) AS BIGINT)"
        ).alias("share_e6"),
    )


@query(
    "popularity_recsys_hitrate",
    oracle="""
    WITH train AS (
      SELECT l.l_partkey AS part, CAST(COUNT(*) AS BIGINT) AS n
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE o.o_orderdate < DATE '1996-01-01'
      GROUP BY l.l_partkey),
    topk AS (
      SELECT part FROM (
        SELECT part, ROW_NUMBER() OVER (ORDER BY n DESC, part) AS rnk
        FROM train)
      WHERE rnk <= 20),
    test AS (
      SELECT DISTINCT o.o_custkey AS cust, l.l_partkey AS part
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE o.o_orderdate >= DATE '1996-01-01'),
    hits AS (
      SELECT cust,
             CAST(COUNT(*) AS BIGINT) AS n_test,
             CAST(SUM(CASE WHEN topk.part IS NOT NULL
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_hit
      FROM test LEFT JOIN topk ON topk.part = test.part
      GROUP BY cust)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_test_users,
           CAST(SUM(n_test) AS BIGINT) AS n_test_pairs,
           CAST(SUM(n_hit) AS BIGINT) AS n_hits,
           CAST(SUM(CASE WHEN n_hit > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_users_hit,
           CAST((SUM(CASE WHEN n_hit > 0 THEN 1 ELSE 0 END) * 2000000
                 + COUNT(*)) // (2 * COUNT(*)) AS BIGINT)
             AS user_hitrate_e6
    FROM hits
    """,
)
def q_popularity_recsys_hitrate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Popularity-recommender baseline evaluation: train = part
    purchase counts before 1996; recommend the global top-20; test =
    whether post-1996 buyers actually bought a recommended part
    (hit-rate@20 per user, the floor every recommender must beat —
    the recsys counterpart of the majority-class baseline in
    classification).

    Temporal train/test split on order date (no leakage — the
    evaluation discipline train_eval_split certifies for documents,
    applied to the transactional stream); top-k is a TakeOrdered on
    exact counts with part tiebreak; hits are a broadcast join of
    the 20-row recommendation set.
    """
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    j = li.join(
        orders.select("o_orderkey", "o_custkey", "o_orderdate"),
        li["l_orderkey"] == orders["o_orderkey"],
    )
    cut = F.lit("1996-01-01").cast("date")
    train = (
        j.where(F.to_date("o_orderdate") < cut)
        .groupBy(F.col("l_partkey").alias("part"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    topk = (
        train.orderBy(F.desc("n"), F.asc("part"))
        .limit(20)
        .select("part", F.lit(1).alias("rec"))
    )
    test = (
        j.where(F.to_date("o_orderdate") >= cut)
        .select(
            F.col("o_custkey").alias("cust"),
            F.col("l_partkey").alias("part"),
        )
        .distinct()
    )
    hits = (
        test.join(F.broadcast(topk), "part", "left")
        .groupBy("cust")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_test"),
            F.sum(F.coalesce(F.col("rec"), F.lit(0)))
            .cast("long")
            .alias("n_hit"),
        )
    )
    return hits.agg(
        F.count(F.lit(1)).cast("long").alias("n_test_users"),
        F.sum("n_test").cast("long").alias("n_test_pairs"),
        F.sum("n_hit").cast("long").alias("n_hits"),
        F.sum(F.when(F.col("n_hit") > 0, 1).otherwise(0))
        .cast("long")
        .alias("n_users_hit"),
        F.expr(
            "CAST((SUM(CASE WHEN n_hit > 0 THEN 1 ELSE 0 END) * 2000000"
            " + COUNT(*)) div (2 * COUNT(*)) AS BIGINT)"
        ).alias("user_hitrate_e6"),
    )
