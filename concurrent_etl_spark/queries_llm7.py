"""Corpus-forensics tranche (round 4, late batch): winnowing document
fingerprints (the MOSS algorithm), skip-gram context-window pair
counts (word2vec training-pair extraction), the Heaps'-law vocabulary
growth curve, and a Z-order (Morton) physical-layout audit.

The reference has none of these (its text surface is zero — SURVEY
§2.4); they are engine surface a 100 TB training-data platform needs:
winnowing is the classical position-robust fingerprint for local
plagiarism/overlap detection (Schleimer, Wilkerson & Aiken, SIGMOD
2003), skip-gram pairs are the raw material of embedding training,
Heaps' law is the standard vocabulary-saturation diagnostic for
corpus growth planning, and Z-order interleaving is how a lakehouse
clusters files so multi-dimensional predicates prune.

House determinism rules: md5-derived integer gram hashes (the same
auditable-uniform idiom as weighted_sample_ares), pure-integer epoch
math (the seasonality_profile idiom), per-mille / e2 integer ratios,
windows PARTITIONED by doc or metric only, scalars re-entering via
the approved 1-row broadcast cross join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from concurrent_etl_spark.catalog import query
from concurrent_etl_spark.engine import load_table
from concurrent_etl_spark.queries_llm import _tok

#: winnowing parameters: char-gram length K, window width W.
#: Guarantee (Schleimer et al. §3): any shared substring of length
#: >= K + W - 1 = 8 chars produces at least one shared fingerprint.
_WIN_K = 5
_WIN_W = 4

#: position packing: key = hash * 2^20 + (2^20-1 - pos). min(key)
#: over a window is (min hash, rightmost position attaining it) —
#: exactly the winnowing tie rule — in ONE integer window-min that
#: both engines evaluate identically. Valid while pos < 2^20.
_POS_BITS = 20
_POS_W = 1 << _POS_BITS
_POS_MAX = _POS_W - 1


@query(
    "winnowing_fingerprint",
    oracle=f"""
    WITH src AS (
      SELECT doc_id, lower(text) AS txt FROM documents
      WHERE length(text) >= {_WIN_K + _WIN_W - 1}),
    g AS (
      SELECT doc_id, i AS pos,
             ('0x' || substr(md5(substr(txt, i, {_WIN_K})), 1, 8))::BIGINT
               * {_POS_W} + ({_POS_MAX} - i) AS key,
             length(txt) - {_WIN_K - 1} AS n_grams
      FROM src, LATERAL (
        SELECT unnest(range(1, length(txt) - {_WIN_K - 2})) AS i)),
    w AS (
      SELECT doc_id, pos, n_grams,
             min(key) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS BETWEEN CURRENT ROW
                            AND {_WIN_W - 1} FOLLOWING) AS sk
      FROM g),
    sel AS (
      SELECT DISTINCT doc_id, sk FROM w
      WHERE pos <= n_grams - {_WIN_W - 1}),
    fp AS (SELECT doc_id, sk // {_POS_W} AS h FROM sel),
    dfreq AS (SELECT h, COUNT(DISTINCT doc_id) AS nd FROM fp GROUP BY h),
    agg AS (
      SELECT f.doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_fp,
             CAST(COUNT(DISTINCT f.h) AS BIGINT) AS n_fp_hashes,
             CAST(COUNT(DISTINCT CASE WHEN d.nd >= 2 THEN f.h END)
                  AS BIGINT) AS n_shared_fp
      FROM (SELECT doc_id, sk, sk // {_POS_W} AS h FROM sel) f
      JOIN dfreq d ON d.h = f.h
      GROUP BY 1)
    SELECT s.doc_id,
           CAST(length(s.txt) - {_WIN_K - 1} AS BIGINT) AS n_grams,
           CAST(length(s.txt) - {_WIN_K + _WIN_W - 2} AS BIGINT)
             AS n_windows,
           a.n_fp, a.n_fp_hashes, a.n_shared_fp,
           CAST(1000 * a.n_fp
                // (length(s.txt) - {_WIN_K + _WIN_W - 2}) AS BIGINT)
             AS density_pm
    FROM src s JOIN agg a ON a.doc_id = s.doc_id
    """,
)
def q_winnowing_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints (MOSS; Schleimer, Wilkerson &
    Aiken, SIGMOD 2003): slide a W-window over the rolling char
    K-gram hash sequence of each document and keep each window's
    minimum hash (rightmost on ties); the distinct kept positions are
    the document's fingerprint set. Guarantees every shared substring
    of length >= K+W-1 yields a shared fingerprint while storing only
    ~2/(W+1) of the grams — the position-robust sketch that survives
    local edits, unlike whole-doc MinHash/SimHash (which this catalog
    already has) whose signatures shift globally.

    Determinism: gram hash = md5-prefix integer (the
    weighted_sample_ares idiom) so both engines derive identical
    hashes; the winnowing tie rule (rightmost minimum) is encoded in
    ONE integer key — hash * 2^20 + (2^20-1 - pos) — whose window-min
    both engines compute exactly. Per-doc output: gram/window/
    fingerprint counts, how many fingerprints are shared with >= 1
    other doc, and the selection density (per-mille, expected
    ~2000/(W+1) = 400 pm for random hashes).

    100 TB shape: char-gram explode is ONE linear scan; the window
    min is PARTITIONED by doc (bounded by doc length, never global);
    the only shuffles are the per-doc repartition and the
    fingerprint-hash doc-frequency groupBy, both map-side
    combinable. Fingerprint storage is ~2/(W+1) of corpus grams by
    the winnowing density theorem — tunable via W with a proven
    detection guarantee, the property naive every-Nth sampling lacks.

    Reference parity: none — SURVEY §2.4 (reference has no text
    surface at all).
    """
    docs = load_table(spark, sf_dir, "documents").where(
        F.length("text") >= _WIN_K + _WIN_W - 1
    )
    src = docs.select("doc_id", F.lower(F.col("text")).alias("txt"))
    grams = src.select(
        "doc_id",
        F.expr(
            f"transform(sequence(1, length(txt) - {_WIN_K - 1}),"
            f" i -> substring(txt, i, {_WIN_K}))"
        ).alias("gs"),
        (F.length("txt") - (_WIN_K - 1)).alias("n_grams"),
    ).select(
        "doc_id",
        "n_grams",
        F.posexplode("gs").alias("p0", "g"),
    )
    keyed = grams.select(
        "doc_id",
        "n_grams",
        (F.col("p0") + 1).alias("pos"),
        (
            F.conv(F.substring(F.md5("g"), 1, 8), 16, 10).cast("long")
            * _POS_W
            + (_POS_MAX - (F.col("p0") + 1))
        ).alias("key"),
    )
    win = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, _WIN_W - 1)
    sel = (
        keyed.withColumn("sk", F.min("key").over(win))
        .where(F.col("pos") <= F.col("n_grams") - (_WIN_W - 1))
        .select("doc_id", "sk")
        .distinct()
    )
    fp = sel.withColumn("h", F.expr(f"sk div {_POS_W}"))
    dfreq = fp.groupBy("h").agg(F.countDistinct("doc_id").alias("nd"))
    agg = (
        fp.join(dfreq, "h")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_fp"),
            F.countDistinct("h").cast("long").alias("n_fp_hashes"),
            F.countDistinct(F.when(F.col("nd") >= 2, F.col("h")))
            .cast("long")
            .alias("n_shared_fp"),
        )
    )
    dims = src.select(
        "doc_id",
        (F.length("txt") - (_WIN_K - 1)).cast("long").alias("n_grams"),
        (F.length("txt") - (_WIN_K + _WIN_W - 2)).cast("long").alias("n_windows"),
    )
    return dims.join(agg, "doc_id").select(
        "doc_id",
        "n_grams",
        "n_windows",
        "n_fp",
        "n_fp_hashes",
        "n_shared_fp",
        F.expr("1000 * n_fp div n_windows").cast("long").alias("density_pm"),
    )


@query(
    "skipgram_window_counts",
    oracle=f"""
    WITH src AS (SELECT doc_id, {_tok('lower(text)')} AS tk FROM documents),
    tok AS (
      SELECT doc_id, unnest(tk) AS t,
             generate_subscripts(tk, 1) AS pos
      FROM src),
    ordered AS (
      SELECT a.t AS w1, b.t AS w2
      FROM tok a JOIN tok b
        ON b.doc_id = a.doc_id AND b.pos - a.pos IN (1, 2)),
    pairs AS (
      SELECT w1 AS center, w2 AS context FROM ordered
      UNION ALL
      SELECT w2 AS center, w1 AS context FROM ordered),
    c AS (
      SELECT center, context, CAST(COUNT(*) AS BIGINT) AS n_pairs
      FROM pairs GROUP BY 1, 2),
    mc AS (SELECT center, SUM(n_pairs) AS cn FROM c GROUP BY 1),
    xc AS (SELECT context, SUM(n_pairs) AS xn FROM c GROUP BY 1),
    tot AS (SELECT SUM(n_pairs) AS t FROM c)
    SELECT c.center, c.context, c.n_pairs,
           CAST(1000 * c.n_pairs * tot.t // (mc.cn * xc.xn) AS BIGINT)
             AS lift_pm
    FROM c
    JOIN mc ON mc.center = c.center
    JOIN xc ON xc.context = c.context
    CROSS JOIN tot
    ORDER BY c.n_pairs DESC, c.center, c.context
    LIMIT 50
    """,
)
def q_skipgram_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skip-gram (center, context) pair counts over a +/-2 token
    window — the raw co-occurrence statistics a word2vec/GloVe-style
    embedding trainer consumes (the sampling side of which
    negative_sampling_distribution already covers). Each ordered
    token pair at distance 1 or 2 contributes symmetrically (both
    directions), then the pair table is aggregated and the top-50
    pairs emitted with an exact integer association lift:
    lift_pm = 1000 * n(c,x) * N / (n(c)*n(x)) — the PMI argument in
    per-mille before any log, so no float transcendentals cross the
    engine boundary.

    100 TB shape: positions come from ONE posexplode scan; the
    distance-d neighbor pairs are EQUI-joins on (doc_id, pos+d) —
    never a range/theta join — so the only shuffles are hash
    partitions on (doc, position) and the map-side-combinable pair
    groupBy, whose key domain is vocabulary^2 bounded, not
    corpus-sized. Marginals re-enter by joining vocabulary-sized
    aggregates; the grand total via the approved 1-row broadcast.

    Reference parity: none — SURVEY §2.4 (no text surface).
    """
    from concurrent_etl_spark.operators.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    tok = (
        docs.select("doc_id", tokens(F.lower(F.col("text"))).alias("tk"))
        .select("doc_id", F.posexplode("tk").alias("p0", "t"))
        .select("doc_id", (F.col("p0") + 1).alias("pos"), "t")
    )
    a = tok.select("doc_id", "pos", F.col("t").alias("w1"))
    parts = []
    for d in (1, 2):
        b = tok.select(
            "doc_id",
            (F.col("pos") - d).alias("pos"),
            F.col("t").alias("w2"),
        )
        parts.append(a.join(b, ["doc_id", "pos"]).select("w1", "w2"))
    ordered = parts[0].unionByName(parts[1])
    pairs = ordered.select(
        F.col("w1").alias("center"), F.col("w2").alias("context")
    ).unionByName(
        ordered.select(F.col("w2").alias("center"), F.col("w1").alias("context"))
    )
    c = pairs.groupBy("center", "context").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs")
    )
    mc = c.groupBy("center").agg(F.sum("n_pairs").alias("cn"))
    xc = c.groupBy("context").agg(F.sum("n_pairs").alias("xn"))
    tot = c.agg(F.sum("n_pairs").alias("t"))
    return (
        c.join(F.broadcast(mc), "center")
        .join(F.broadcast(xc), "context")
        .crossJoin(F.broadcast(tot))
        .select(
            "center",
            "context",
            "n_pairs",
            F.expr("1000 * n_pairs * t div (cn * xn)").cast("long").alias("lift_pm"),
        )
        .orderBy(F.desc("n_pairs"), "center", "context")
        .limit(50)
    )


@query(
    "heaps_law_curve",
    oracle=f"""
    WITH src AS (SELECT doc_id, {_tok('lower(text)')} AS tk FROM documents),
    mx AS (SELECT max(doc_id) + 1 AS m FROM src),
    d AS (
      SELECT s.doc_id * 10 // mx.m + 1 AS dec, len(s.tk) AS n_tok
      FROM src s, mx),
    docs10 AS (
      SELECT dec, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_tok) AS BIGINT) AS n_tokens
      FROM d GROUP BY 1),
    tok AS (SELECT doc_id, unnest(tk) AS t FROM src),
    big AS (
      SELECT doc_id, tk[i] || ' ' || tk[i+1] AS bg
      FROM src, LATERAL (SELECT unnest(range(1, len(tk))) AS i)),
    uni10 AS (
      SELECT fd * 10 // mx.m + 1 AS dec, CAST(COUNT(*) AS BIGINT) AS n_uni
      FROM (SELECT t, min(doc_id) AS fd FROM tok GROUP BY t), mx
      GROUP BY 1),
    bi10 AS (
      SELECT fd * 10 // mx.m + 1 AS dec, CAST(COUNT(*) AS BIGINT) AS n_bi
      FROM (SELECT bg, min(doc_id) AS fd FROM big GROUP BY bg), mx
      GROUP BY 1),
    spine AS (SELECT unnest(range(1, 11)) AS dec),
    j AS (
      SELECT s.dec,
             COALESCE(docs10.n_docs, 0) AS n_docs,
             COALESCE(docs10.n_tokens, 0) AS n_tokens,
             COALESCE(uni10.n_uni, 0) AS n_uni,
             COALESCE(bi10.n_bi, 0) AS n_bi
      FROM spine s
      LEFT JOIN docs10 ON docs10.dec = s.dec
      LEFT JOIN uni10 ON uni10.dec = s.dec
      LEFT JOIN bi10 ON bi10.dec = s.dec)
    SELECT CAST(dec AS BIGINT) AS decile,
           CAST(SUM(n_docs) OVER w AS BIGINT) AS cum_docs,
           CAST(SUM(n_tokens) OVER w AS BIGINT) AS cum_tokens,
           CAST(SUM(n_uni) OVER w AS BIGINT) AS cum_types_unigram,
           CAST(SUM(n_bi) OVER w AS BIGINT) AS cum_types_bigram,
           CAST(n_uni AS BIGINT) AS new_types_unigram,
           CAST(1000 * (SUM(n_uni) OVER w) // (SUM(n_tokens) OVER w)
                AS BIGINT) AS ttr_pm
    FROM j
    WINDOW w AS (ORDER BY dec ROWS BETWEEN UNBOUNDED PRECEDING
                 AND CURRENT ROW)
    """,
)
def q_heaps_law_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary growth curve: cumulative distinct
    unigram and bigram types vs cumulative token count at ten
    doc-id-order checkpoints — the standard corpus diagnostic for
    vocabulary saturation (V ~ K*n^beta), which tells a training-data
    curator whether further crawl growth still buys new vocabulary or
    only repeats it. The type-token ratio is emitted in exact
    per-mille; no float crosses the engine boundary.

    Each type is attributed to the decile of its FIRST occurrence
    (min doc_id per type) — one vocabulary-sized groupBy — so the
    cumulative type count at checkpoint c counts exactly the types
    seen in docs [0, c), with no per-checkpoint rescan.

    100 TB shape: two map-side-combinable groupBys (type -> first
    doc; doc-decile -> counts); the cumulation runs on the 10-row
    decile frame UNPIVOTED to (metric, decile) and windowed
    PARTITIONED BY metric — bounded 10-row partitions, never a
    global window over data. The doc-id max re-enters via the
    approved 1-row broadcast.

    Reference parity: none — SURVEY §2.4 (no text surface).
    """
    from concurrent_etl_spark.operators.text import (
        shingles_from_tokens,
        tokens,
    )

    docs = load_table(spark, sf_dir, "documents")
    src = docs.select("doc_id", tokens(F.lower(F.col("text"))).alias("tk"))
    mx = src.agg((F.max("doc_id") + 1).alias("m"))
    d = src.crossJoin(F.broadcast(mx)).select(
        F.expr("doc_id * 10 div m + 1").alias("dec"),
        F.size("tk").alias("n_tok"),
    )
    docs10 = d.groupBy("dec").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tok").cast("long").alias("n_tokens"),
    )
    tok = src.select("doc_id", F.explode("tk").alias("t"))
    big = src.select("doc_id", F.explode(shingles_from_tokens(F.col("tk"))).alias("bg"))
    uni10 = (
        tok.groupBy("t")
        .agg(F.min("doc_id").alias("fd"))
        .crossJoin(F.broadcast(mx))
        .groupBy(F.expr("fd * 10 div m + 1").alias("dec"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_uni"))
    )
    bi10 = (
        big.groupBy("bg")
        .agg(F.min("doc_id").alias("fd"))
        .crossJoin(F.broadcast(mx))
        .groupBy(F.expr("fd * 10 div m + 1").alias("dec"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_bi"))
    )
    spine = spark.range(1, 11).select(F.col("id").alias("dec"))
    j = (
        spine.join(F.broadcast(docs10), "dec", "left")
        .join(F.broadcast(uni10), "dec", "left")
        .join(F.broadcast(bi10), "dec", "left")
        .fillna(0, ["n_docs", "n_tokens", "n_uni", "n_bi"])
    )
    # unpivot -> PARTITIONED cumsum (10-row partitions per metric)
    # -> pivot back: keeps every window partitioned, never global.
    unp = j.select(
        "dec",
        F.expr(
            "stack(4, 'docs', n_docs, 'tokens', n_tokens,"
            " 'uni', n_uni, 'bi', n_bi) AS (metric, v)"
        ),
    )
    cw = (
        Window.partitionBy("metric")
        .orderBy("dec")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = unp.withColumn("cv", F.sum("v").over(cw))
    piv = cum.groupBy("dec").agg(
        F.max(F.when(F.col("metric") == "docs", F.col("cv"))).alias("cum_docs"),
        F.max(F.when(F.col("metric") == "tokens", F.col("cv"))).alias("cum_tokens"),
        F.max(F.when(F.col("metric") == "uni", F.col("cv"))).alias(
            "cum_types_unigram"
        ),
        F.max(F.when(F.col("metric") == "bi", F.col("cv"))).alias(
            "cum_types_bigram"
        ),
        F.max(F.when(F.col("metric") == "uni", F.col("v"))).alias(
            "new_types_unigram"
        ),
    )
    return piv.select(
        F.col("dec").cast("long").alias("decile"),
        F.col("cum_docs").cast("long"),
        F.col("cum_tokens").cast("long"),
        F.col("cum_types_unigram").cast("long"),
        F.col("cum_types_bigram").cast("long"),
        F.col("new_types_unigram").cast("long"),
        F.expr("1000 * cum_types_unigram div cum_tokens")
        .cast("long")
        .alias("ttr_pm"),
    )


def _interleave_sql(x: str, y: str, bits: int = 8) -> str:
    """Morton interleave as pure +/&/shift arithmetic — identical
    text compiles in both engines (x gets odd bit positions)."""
    terms = []
    for b in range(bits):
        terms.append(f"((({x} >> {b}) & 1) << {2 * b + 1})")
        terms.append(f"((({y} >> {b}) & 1) << {2 * b})")
    return " + ".join(terms)


#: epoch-hour of 2024-01-01T00:00:00Z — the events table's origin —
#: so the y dimension starts at 0 (1704067200 // 3600).
_ZORDER_H0 = 473352

@query(
    "zorder_layout_audit",
    oracle=f"""
    WITH base AS (
      SELECT event_id,
             user_id & 255 AS x,
             ((((epoch_us(ts) // 3600000000) - {_ZORDER_H0}) % 256)
              + 256) % 256 AS y
      FROM events),
    mx AS (SELECT max(event_id) + 1 AS m FROM base),
    boxes AS (
      SELECT scheme, bucket,
             min(x) AS x0, max(x) AS x1, min(y) AS y0, max(y) AS y1
      FROM (
        SELECT 'zorder' AS scheme,
               ({_interleave_sql('x', 'y')}) >> 8 AS bucket, x, y
        FROM base
        UNION ALL
        SELECT 'natural' AS scheme, b.event_id * 256 // mx.m AS bucket,
               b.x, b.y
        FROM base b, mx)
      GROUP BY 1, 2),
    probes AS (SELECT DISTINCT x, y FROM base),
    pt AS (
      SELECT b.scheme, CAST(COUNT(*) AS BIGINT) AS hits
      FROM probes p JOIN boxes b
        ON p.x BETWEEN b.x0 AND b.x1 AND p.y BETWEEN b.y0 AND b.y1
      GROUP BY 1),
    px AS (
      SELECT b.scheme, CAST(COUNT(*) AS BIGINT) AS hits
      FROM (SELECT DISTINCT x FROM probes) p JOIN boxes b
        ON p.x BETWEEN b.x0 AND b.x1
      GROUP BY 1),
    py AS (
      SELECT b.scheme, CAST(COUNT(*) AS BIGINT) AS hits
      FROM (SELECT DISTINCT y FROM probes) p JOIN boxes b
        ON p.y BETWEEN b.y0 AND b.y1
      GROUP BY 1),
    nb AS (
      SELECT scheme, CAST(COUNT(*) AS BIGINT) AS n_buckets,
             CAST(SUM((x1 - x0 + 1) * (y1 - y0 + 1)) AS BIGINT)
               AS sum_bbox_area
      FROM boxes GROUP BY 1),
    np AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_pt,
             CAST(COUNT(DISTINCT x) AS BIGINT) AS n_x,
             CAST(COUNT(DISTINCT y) AS BIGINT) AS n_y
      FROM probes)
    SELECT nb.scheme, nb.n_buckets, nb.sum_bbox_area,
           CAST(100 * pt.hits // np.n_pt AS BIGINT) AS point_scan_x100,
           CAST(100 * px.hits // np.n_x AS BIGINT) AS xonly_scan_x100,
           CAST(100 * py.hits // np.n_y AS BIGINT) AS yonly_scan_x100
    FROM nb
    JOIN pt ON pt.scheme = nb.scheme
    JOIN px ON px.scheme = nb.scheme
    JOIN py ON py.scheme = nb.scheme
    CROSS JOIN np
    """,
)
def q_zorder_layout_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton-curve) physical-layout audit: interleave the
    bits of two scan dimensions — user bucket (user_id & 255) and
    hour-of-history bucket — into one Morton key, bucket events by
    z-prefix, and measure ZONE-MAP PRUNING head-to-head against the
    same table in natural (arrival/event-id) order: for every
    distinct (x, y) probe point — and for x-only and y-only
    predicates — how many buckets' min/max bounding boxes must be
    scanned (x100 averages, exact integers). Natural order prunes
    the time dimension for free but leaves every x-predicate reading
    ALL files; z-order spends one shuffle on the rewrite and buys
    BALANCED pruning on both dimensions — the measured argument for
    why a lakehouse Z-ORDERs multi-dimensional scan keys (the 2-D
    complement of parquet_zonemap_audit's 1-D sort-key audit).

    Determinism: calendar math is pure integer epoch microseconds
    (the seasonality_profile idiom); the interleave is the same
    +/&/shift arithmetic text compiled by both engines; hit counts
    and e2 averages are exact integers.

    100 TB shape: bucket boxes come from map-side-combinable
    groupBys over <= 256-key domains in ONE scan each; the probe
    containment joins are broadcast of the <= 512-row box table
    against a probe set bounded by the 256x256 value DOMAIN (never
    row count). The rewrite it models is a repartition by z-prefix —
    one shuffle that every later multi-dim scan amortizes; max
    event_id re-enters via the approved 1-row broadcast.

    Reference parity: none — physical-layout surface beyond the
    reference (SURVEY §2.8 stops at filename routing).
    """
    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        "event_id",
        F.expr("user_id & 255").alias("x"),
        F.expr(
            f"(((unix_micros(ts) div 3600000000) - {_ZORDER_H0}) % 256"
            " + 256) % 256"
        ).alias("y"),
    )
    mx = base.agg((F.max("event_id") + 1).alias("m"))
    zb = base.select(
        F.lit("zorder").alias("scheme"),
        F.expr(f"({_interleave_sql('x', 'y')}) >> 8").alias("bucket"),
        "x",
        "y",
    )
    nb_rows = base.crossJoin(F.broadcast(mx)).select(
        F.lit("natural").alias("scheme"),
        F.expr("event_id * 256 div m").alias("bucket"),
        "x",
        "y",
    )
    boxes = (
        zb.unionByName(nb_rows)
        .groupBy("scheme", "bucket")
        .agg(
            F.min("x").alias("x0"),
            F.max("x").alias("x1"),
            F.min("y").alias("y0"),
            F.max("y").alias("y1"),
        )
    )
    probes = base.select("x", "y").distinct()
    pt = (
        probes.join(
            F.broadcast(boxes),
            (F.col("x").between(F.col("x0"), F.col("x1")))
            & (F.col("y").between(F.col("y0"), F.col("y1"))),
        )
        .groupBy("scheme")
        .agg(F.count(F.lit(1)).cast("long").alias("pt_hits"))
    )
    px = (
        probes.select("x")
        .distinct()
        .join(F.broadcast(boxes), F.col("x").between(F.col("x0"), F.col("x1")))
        .groupBy("scheme")
        .agg(F.count(F.lit(1)).cast("long").alias("px_hits"))
    )
    py = (
        probes.select("y")
        .distinct()
        .join(F.broadcast(boxes), F.col("y").between(F.col("y0"), F.col("y1")))
        .groupBy("scheme")
        .agg(F.count(F.lit(1)).cast("long").alias("py_hits"))
    )
    nbx = boxes.groupBy("scheme").agg(
        F.count(F.lit(1)).cast("long").alias("n_buckets"),
        F.sum((F.col("x1") - F.col("x0") + 1) * (F.col("y1") - F.col("y0") + 1))
        .cast("long")
        .alias("sum_bbox_area"),
    )
    np_ = probes.agg(
        F.count(F.lit(1)).cast("long").alias("n_pt"),
        F.countDistinct("x").cast("long").alias("n_x"),
        F.countDistinct("y").cast("long").alias("n_y"),
    )
    return (
        nbx.join(F.broadcast(pt), "scheme")
        .join(F.broadcast(px), "scheme")
        .join(F.broadcast(py), "scheme")
        .crossJoin(F.broadcast(np_))
        .select(
            "scheme",
            "n_buckets",
            "sum_bbox_area",
            F.expr("100 * pt_hits div n_pt").cast("long").alias("point_scan_x100"),
            F.expr("100 * px_hits div n_x").cast("long").alias("xonly_scan_x100"),
            F.expr("100 * py_hits div n_y").cast("long").alias("yonly_scan_x100"),
        )
    )
