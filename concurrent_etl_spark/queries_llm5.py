"""LLM training-data pipeline queries, tranche 5: DSIR importance
resampling and temperature-scaled mixture quotas.

Beyond-the-reference surface (the reference at ``/root/reference`` has
no corpus-selection layer; its closest analogue is a WHERE clause,
case_2/Normal.py:203). Both ops here are the published
domain-reweighting techniques a pretraining pipeline runs between
dedup and packing:

* DSIR (Xie et al., "Data Selection for Language Models via
  Importance Resampling", 2023 — public paper): score every raw
  document by the log-likelihood ratio of a hashed n-gram bag model
  fit on a target domain vs the raw pool, then resample the raw pool
  toward the target. Implemented from the paper's description on
  Spark primitives: the feature space is ``md5(token) % B`` buckets,
  the two bucket distributions come from ONE conditional-aggregate
  scan, and the per-bucket log-ratio table (B rows) broadcasts back
  onto the token stream.
* Temperature-scaled mixture (the multilingual-sampling rule of
  XLM-R / mT5, alpha = 0.5): per-source quotas proportional to
  n_l^alpha — upsamples the tail, downsamples the head — realized
  deterministically by ranking each source's docs on md5(doc_id).

Determinism: token counts are integers; every ``ln`` is rounded to
12 decimals and accumulated as DECIMAL(24,12) (the repo's float-sum
convention); sqrt goes through round(...,9) DECIMAL before the
quota arithmetic; ties break on doc_id everywhere.

Scale notes (100 TB): the DSIR weight table is B=256 rows however
large the corpus — a broadcast; scoring is one shuffle (groupBy
doc_id). The mixture quota table is one row per source (broadcast
join); the per-source ranking window partitions on source, never
globally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from concurrent_etl_spark.catalog import query
from concurrent_etl_spark.operators import text as T
from concurrent_etl_spark.queries_llm import _FOLD, _docs, _tok

#: hashed-feature buckets for the DSIR bag model. 256 keeps every
#: bucket populated at sf0.001 while still forcing real collisions —
#: the hashing-trick regime the paper's estimator assumes.
_B = 256
#: resample size (top-N raw docs by importance weight).
_DSIR_N = 50
#: mixture temperature alpha and total sampling budget.
_ALPHA_SQRT_BUDGET = 200

_BUCKET_SQL = f"(('0x' || substr(md5(token), 1, 8))::BIGINT % {_B})"


@query(
    "dsir_importance_resample",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, lang, unnest({_tok(_FOLD)}) AS token
      FROM documents),
    tb AS (
      SELECT doc_id, lang, {_BUCKET_SQL} AS b FROM tok),
    counts AS (
      SELECT b,
             CAST(COUNT(*) AS BIGINT) AS n_raw,
             CAST(COUNT(*) FILTER (WHERE lang = 'en') AS BIGINT) AS n_tgt
      FROM tb GROUP BY b),
    tot AS (
      SELECT CAST(SUM(n_raw) AS BIGINT) AS nr,
             CAST(SUM(n_tgt) AS BIGINT) AS nt
      FROM counts),
    w AS (
      SELECT b,
             CAST(round(ln(((n_tgt + 1.0) * (t.nr + {_B})) /
                           ((n_raw + 1.0) * (t.nt + {_B}))), 12)
                  AS DECIMAL(24,12)) AS lr
      FROM counts, tot t),
    scored AS (
      SELECT tb.doc_id, tb.lang,
             CAST(COUNT(*) AS BIGINT) AS n_tok,
             SUM(w.lr) AS imp
      FROM tb JOIN w USING (b)
      GROUP BY tb.doc_id, tb.lang)
    SELECT doc_id, lang, n_tok,
           round(CAST(imp AS DOUBLE), 6) AS imp,
           CAST(rk AS INTEGER) AS rk
    FROM (
      SELECT *, ROW_NUMBER() OVER (ORDER BY imp DESC, doc_id) AS rk
      FROM scored WHERE lang <> 'en')
    WHERE rk <= {_DSIR_N}
    """,
)
def q_dsir_importance_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR: importance-resample non-English documents toward the
    English target domain. One scan builds BOTH bucket distributions
    (conditional aggregate — no second pass over the tokens), the
    B-row log-ratio table broadcasts onto the token stream, and the
    per-doc score is an exact DECIMAL sum of round-12 log-ratios, so
    the ranking is reduction-order-invariant. Returns the top-{_DSIR_N}
    raw docs by importance (the resampled set), rank included.

    Scale shape: ln(p_target/p_raw) estimated once per bucket —
    however large the corpus, the model is {_B} rows; scoring is one
    doc-keyed shuffle. The paper's resampling step (Gumbel top-k) is
    here the deterministic top-N — same selection pressure, no RNG.
    """
    docs = _docs(spark, sf_dir)
    tb = docs.select(
        "doc_id",
        "lang",
        F.explode(T.tokens(T.ascii_fold("text"))).alias("token"),
    ).select(
        "doc_id",
        "lang",
        (
            F.conv(F.substring(F.md5("token"), 1, 8), 16, 10).cast("bigint")
            % _B
        ).alias("b"),
    )
    counts = tb.groupBy("b").agg(
        F.count(F.lit(1)).alias("n_raw"),
        F.count(F.when(F.col("lang") == "en", F.lit(1))).alias("n_tgt"),
    )
    tot = counts.agg(
        F.sum("n_raw").cast("bigint").alias("nr"),
        F.sum("n_tgt").cast("bigint").alias("nt"),
    )
    w = counts.crossJoin(F.broadcast(tot)).select(
        "b",
        F.round(
            F.ln(
                ((F.col("n_tgt") + 1.0) * (F.col("nr") + _B))
                / ((F.col("n_raw") + 1.0) * (F.col("nt") + _B))
            ),
            12,
        )
        .cast("decimal(24,12)")
        .alias("lr"),
    )
    scored = (
        # broadcast-ok: one row per hash bucket — fixed _B buckets
        tb.join(F.broadcast(w), "b")
        .groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tok"),
            F.sum("lr").alias("imp"),
        )
    )
    # TakeOrderedAndProject head FIRST, then rank the 50-row result —
    # the global row_number never sees the corpus-sized frame (same
    # bounded-window discipline as vocab_coverage_topk)
    top = (
        scored.where(F.col("lang") != "en")
        .orderBy(F.desc("imp"), F.asc("doc_id"))
        .limit(_DSIR_N)
    )
    rk = Window.orderBy(F.desc("imp"), F.asc("doc_id"))
    return (
        top.withColumn("rk", F.row_number().over(rk))
        .select(
            "doc_id",
            "lang",
            "n_tok",
            F.round(F.col("imp").cast("double"), 6).alias("imp"),
            F.col("rk").cast("int").alias("rk"),
        )
    )


@query(
    "temperature_resample_mixture",
    oracle=f"""
    WITH s AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_l FROM documents
      GROUP BY source),
    w AS (
      SELECT source, n_l,
             CAST(round(sqrt(CAST(n_l AS DOUBLE)), 9)
                  AS DECIMAL(18,9)) AS wgt
      FROM s),
    tot AS (SELECT SUM(wgt) AS tw FROM w),
    q AS (
      SELECT source, n_l,
             round(CAST(wgt AS DOUBLE) / CAST(t.tw AS DOUBLE), 9) AS p_l,
             CAST(greatest(1, floor({_ALPHA_SQRT_BUDGET} *
                  round(CAST(wgt AS DOUBLE) / CAST(t.tw AS DOUBLE), 9)))
                  AS BIGINT) AS quota
      FROM w, tot t)
    SELECT d.source, q.n_l, q.p_l, q.quota, d.doc_id,
           CAST(rk AS INTEGER) AS rk
    FROM (
      SELECT source, doc_id,
             ROW_NUMBER() OVER (PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
      FROM documents) d
    JOIN q ON d.source = q.source
    WHERE d.rk <= q.quota
    """,
)
def q_temperature_resample_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled mixture sampling (alpha = 0.5): per-source
    quotas proportional to sqrt(n_l) — the XLM-R/mT5 rule that
    up-weights tail sources. sqrt is IEEE-correctly-rounded on both
    engines, but the share division is still pinned through
    round(...,9) and the quota through floor so no representation
    detail can flip a boundary. Each source then contributes its
    quota of docs picked by the deterministic md5(doc_id) order.

    Scale shape: the quota table is one row per source (broadcast);
    the pick is a per-source window — partitioned by source, never a
    global sort; budget {_ALPHA_SQRT_BUDGET} scales as a constant.
    """
    docs = _docs(spark, sf_dir)
    s = docs.groupBy("source").agg(F.count(F.lit(1)).cast("bigint").alias("n_l"))
    w = s.select(
        "source",
        "n_l",
        F.round(F.sqrt(F.col("n_l").cast("double")), 9)
        .cast("decimal(18,9)")
        .alias("wgt"),
    )
    tot = w.agg(F.sum("wgt").alias("tw"))
    p = F.round(
        F.col("wgt").cast("double") / F.col("tw").cast("double"), 9
    )
    q = w.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_l",
        p.alias("p_l"),
        F.greatest(F.lit(1), F.floor(_ALPHA_SQRT_BUDGET * p))
        .cast("bigint")
        .alias("quota"),
    )
    rk = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    ranked = docs.select(
        "source", "doc_id", F.row_number().over(rk).alias("rk")
    )
    return (
        # broadcast-ok: one row per source — bounded source enum
        ranked.join(F.broadcast(q), "source")
        .where(F.col("rk") <= F.col("quota"))
        .select(
            "source",
            "n_l",
            "p_l",
            "quota",
            "doc_id",
            F.col("rk").cast("int").alias("rk"),
        )
    )


@query(
    "token_budget_epochs",
    oracle=f"""
    WITH t AS (
      SELECT source,
             CAST(SUM(len({_tok('text')})) AS BIGINT) AS n_tok
      FROM documents GROUP BY source),
    tot AS (SELECT CAST(SUM(n_tok) AS BIGINT) AS total FROM t),
    a AS (
      SELECT source, n_tok,
             CAST(floor(100000 * round(CAST(n_tok AS DOUBLE)
                  / CAST(tot.total AS DOUBLE), 9)) AS BIGINT) AS budget
      FROM t, tot)
    SELECT source, n_tok, budget,
           CAST(least(budget, 4 * n_tok) AS BIGINT) AS alloc,
           -- nonnegative numerator: DuckDB // truncation == the
           -- (x - pmod(x, n)) / n form on the Spark side
           CAST((1000 * least(budget, 4 * n_tok)) // n_tok
                AS BIGINT) AS epochs_milli
    FROM a
    """,
)
def q_token_budget_epochs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-constrained token-budget allocation (Muennighoff et al.,
    "Scaling Data-Constrained Language Models", 2023 — public paper:
    repeating data beyond ~4 epochs stops helping): each source gets
    a share of the global training budget proportional to its token
    count, CAPPED at 4 epochs of its unique tokens. Output per
    source: unique tokens, proportional budget, capped allocation,
    and the realized epoch count in exact milli-epochs (truncating
    integer division spelled as ``(x - pmod(x, n)) / n`` — identical
    on both engines regardless of their ``/`` semantics).

    Scale: one token-count scan + a sources-sized (tiny) allocation
    table; the budget arithmetic is integer-exact end to end apart
    from the share, which is pinned through round(...,9).
    """
    docs = _docs(spark, sf_dir)
    t = docs.groupBy("source").agg(
        F.sum(F.size(T.tokens(F.col("text")))).cast("bigint").alias("n_tok")
    )
    tot = t.agg(F.sum("n_tok").cast("bigint").alias("total"))
    a = t.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_tok",
        F.floor(
            100000
            * F.round(
                F.col("n_tok").cast("double") / F.col("total").cast("double"),
                9,
            )
        )
        .cast("bigint")
        .alias("budget"),
    )
    alloc = F.least(F.col("budget"), 4 * F.col("n_tok"))
    milli = 1000 * alloc
    return a.select(
        "source",
        "n_tok",
        "budget",
        alloc.cast("bigint").alias("alloc"),
        ((milli - F.pmod(milli, F.col("n_tok"))) / F.col("n_tok"))
        .cast("bigint")
        .alias("epochs_milli"),
    )


# ---------------------------------------------------------------------------
# decontamination: n-gram window overlap between eval and train splits
# ---------------------------------------------------------------------------


@query(
    "decontaminate_ngram_windows",
    oracle=f"""
    WITH ev AS (
      SELECT doc_id, {_tok(_FOLD)} AS toks
      FROM documents WHERE doc_id % 10 = 0),
    tr AS (
      SELECT {_tok(_FOLD)} AS toks
      FROM documents WHERE doc_id % 10 <> 0),
    -- zip-with-shifts, not list_slice per position (O(n^2) in
    -- DuckDB — see queries_llm._shingles); padded tails filtered
    evw AS (
      SELECT DISTINCT doc_id,
             unnest(list_filter(list_transform(
               list_zip(toks, (toks)[2:], (toks)[3:], (toks)[4:],
                        (toks)[5:]),
               p -> CASE WHEN p[5] IS NULL THEN NULL
                    ELSE p[1] || ' ' || p[2] || ' ' || p[3] || ' '
                         || p[4] || ' ' || p[5] END),
               x -> x IS NOT NULL)) AS w
      FROM ev WHERE len(toks) >= 5),
    trw AS (
      SELECT DISTINCT
             unnest(list_filter(list_transform(
               list_zip(toks, (toks)[2:], (toks)[3:], (toks)[4:],
                        (toks)[5:]),
               p -> CASE WHEN p[5] IS NULL THEN NULL
                    ELSE p[1] || ' ' || p[2] || ' ' || p[3] || ' '
                         || p[4] || ' ' || p[5] END),
               x -> x IS NOT NULL)) AS w
      FROM tr WHERE len(toks) >= 5),
    nw AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM evw
           GROUP BY doc_id),
    hits AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS nh
             FROM evw WHERE w IN (SELECT w FROM trw)
             GROUP BY doc_id)
    SELECT e.doc_id,
           COALESCE(nw.n, 0) AS n_windows,
           COALESCE(h.nh, 0) AS n_contam,
           CAST(CASE WHEN COALESCE(nw.n, 0) > 0
                     THEN (COALESCE(h.nh, 0) * 2000000 + nw.n)
                          // (2 * nw.n)
                     ELSE 0 END AS BIGINT) AS contam_e6,
           COALESCE(h.nh, 0) * 5 > COALESCE(nw.n, 0) AS drop_doc
    FROM ev e
    LEFT JOIN nw ON nw.doc_id = e.doc_id
    LEFT JOIN hits h ON h.doc_id = e.doc_id
    """,
)
def q_decontaminate_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval decontamination by exact 5-token-window overlap —
    the n-gram decontamination procedure of the GPT-3 appendix and
    Lee et al. 2022 (public): an eval document is contaminated in
    proportion to how many of its distinct 5-gram token windows
    appear verbatim anywhere in the training split, and dropped when
    the contaminated fraction exceeds 20%.

    Complements contamination_check (bigram-shingle containment
    against ONE candidate train doc): windows here are longer
    (5 tokens — precise, few chance collisions) and matched against
    the train split's GLOBAL window vocabulary, which is the actual
    production shape — the train side compiles once to a distinct
    window table and every eval batch probes it.

    Exactness: windows are staged arrays (sequence + slice over the
    token array — computed once per doc, no per-window
    re-tokenization), counts are integers, the fraction uses the
    half-up (2a+b) div 2b trick, and the drop verdict is the pure
    integer comparison n_contam * 5 > n_windows. Docs under 5 tokens
    (e.g. the zh slice, whose chars the whitespace tokenizer keeps
    as one token) report zero windows and never drop.

    100 TB shape: the train window table is ONE hash groupBy
    (distinct), the probe is a broadcast-or-shuffle semi-join keyed
    on the window string; eval cost is proportional to the eval
    split, never to train x eval.
    """
    docs = _docs(spark, sf_dir)
    toks = docs.select(
        "doc_id",
        (F.col("doc_id") % 10 == 0).alias("is_eval"),
        T.tokens(T.ascii_fold("text")).alias("toks"),
    )
    wins = toks.select(
        "doc_id",
        "is_eval",
        F.when(
            F.size("toks") >= 5,
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.size("toks") - 4),
                    lambda i: F.concat_ws(" ", F.slice(F.col("toks"), i, 5)),
                )
            ),
        )
        .otherwise(F.array().cast("array<string>"))
        .alias("ws"),
    )
    # _outer + pos-isNotNull, NOT plain explode: ws is Project-
    # computed, so the plain form's inferred size()>0 filter clones
    # the 5-gram window transform below the projection (per-row
    # re-evaluation; the queries_llm7 winnowing trap).
    evw = (
        wins.where(F.col("is_eval"))
        .select("doc_id", F.posexplode_outer("ws").alias("_wp", "w"))
        .where(F.col("_wp").isNotNull())
        .select("doc_id", "w")
    )
    trw = (
        wins.where(~F.col("is_eval"))
        .select(F.posexplode_outer("ws").alias("_wp", "w"))
        .where(F.col("_wp").isNotNull())
        .select("w")
        .distinct()
    )
    nw = evw.groupBy("doc_id").agg(F.count(F.lit(1)).cast("long").alias("n"))
    hits = (
        evw.join(trw, "w", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("nh"))
    )
    base = docs.where(F.col("doc_id") % 10 == 0).select("doc_id")
    n = F.coalesce(F.col("n"), F.lit(0))
    nh = F.coalesce(F.col("nh"), F.lit(0))
    return (
        base.join(nw, "doc_id", "left")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            n.alias("n_windows"),
            nh.alias("n_contam"),
            F.when(
                n > 0,
                F.expr(
                    "(coalesce(nh, 0) * 2000000 + coalesce(n, 0))"
                    " div (2 * coalesce(n, 0))"
                ),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("contam_e6"),
            (nh * 5 > n).alias("drop_doc"),
        )
    )


# ---------------------------------------------------------------------------
# LSH banding S-curve: observed recall vs the analytic 1-(1-s^r)^b
# ---------------------------------------------------------------------------

from concurrent_etl_spark.operators import dedup as D  # noqa: E402
from concurrent_etl_spark.operators.dedup import (  # noqa: E402
    LSH_BANDS,
    MINHASH_K,
)
from concurrent_etl_spark.queries_llm import (  # noqa: E402
    _LSH_PAIRS,
    _shingles,
)

#: S-curve audit cohort: a fixed doc_id slice plus every injected
#: mutant's source — banding recall is a property of the DETECTOR
#: CONFIG, not of corpus size, so the audit measures it on a bounded
#: sample (exactly how you'd tune bands/rows before a 100 TB run;
#: truth generation on the full corpus would be a second dedup job).
_SCURVE_COHORT_SQL = "doc_id % 10 = 0 OR doc_id < 40"

_CORPUS_NEAR_COHORT = f"""corpus AS (
  SELECT doc_id, text FROM documents WHERE {_SCURVE_COHORT_SQL}
  UNION ALL
  SELECT doc_id + 100000 AS doc_id,
         array_to_string(list_slice({_tok('text')}, 3, 100000000), ' ')
           AS text
  FROM documents WHERE doc_id < 40
)"""

#: analytic band-collision probability per exact-Jaccard decile
#: bucket (bucket b covers permille [b*100, b*100+99]; midpoint s);
#: computed ONCE in Python and injected as identical literals into
#: both engines — pow() differs across libms, so it must never run
#: inside either engine's expression tree.
_SCURVE_ROWS = MINHASH_K // LSH_BANDS
_SCURVE_EXPECTED_E6 = {
    b: round(
        (
            1.0
            - (
                1.0
                - ((1.0 if b == 10 else (b * 100 + 50) / 1000.0))
                ** _SCURVE_ROWS
            )
            ** LSH_BANDS
        )
        * 1e6
    )
    for b in range(5, 11)
}


def _scurve_case_sql() -> str:
    whens = " ".join(
        f"WHEN {b} THEN {e6}" for b, e6 in _SCURVE_EXPECTED_E6.items()
    )
    return f"CASE bucket {whens} END"


@query(
    "lsh_scurve_tuning_audit",
    oracle=f"""
    WITH {_CORPUS_NEAR_COHORT},
    {_LSH_PAIRS},
    shl AS (SELECT doc_id, {_shingles(_FOLD)} AS shg FROM corpus),
    tokf AS (SELECT doc_id, unnest(shg) AS t FROM shl),
    sizes AS (SELECT doc_id, len(shg) AS sz FROM shl),
    dfr AS (SELECT t, COUNT(*) AS df FROM tokf GROUP BY t),
    ranked AS (
      SELECT tokf.doc_id, tokf.t,
             row_number() OVER (PARTITION BY tokf.doc_id
                                ORDER BY dfr.df, tokf.t) AS pos
      FROM tokf JOIN dfr ON tokf.t = dfr.t),
    prefix AS (
      SELECT r.doc_id, r.t, s.sz
      FROM ranked r JOIN sizes s ON r.doc_id = s.doc_id
      WHERE r.pos <= s.sz - CAST(ceil(s.sz * 50 / 100.0) AS BIGINT) + 1),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM prefix a JOIN prefix b
        ON a.t = b.t AND a.doc_id < b.doc_id
       AND b.sz * 100 >= a.sz * 50 AND a.sz * 100 >= b.sz * 50),
    truth AS (
      SELECT c.doc_a, c.doc_b,
             len(list_intersect(sa.shg, sb.shg)) AS inter,
             len(list_distinct(list_concat(sa.shg, sb.shg))) AS un
      FROM cand c
      JOIN shl sa ON sa.doc_id = c.doc_a
      JOIN shl sb ON sb.doc_id = c.doc_b),
    tp AS (
      SELECT doc_a, doc_b, inter * 1000 // un AS pm
      FROM truth WHERE inter * 2 >= un),
    joined AS (
      SELECT tp.pm // 100 AS bucket,
             CASE WHEN lp.doc_a IS NOT NULL THEN 1 ELSE 0 END AS hit
      FROM tp LEFT JOIN pairs lp
        ON lp.doc_a = tp.doc_a AND lp.doc_b = tp.doc_b)
    SELECT bucket,
           CAST(COUNT(*) AS BIGINT) AS n_true_pairs,
           CAST(SUM(hit) AS BIGINT) AS n_lsh_hit,
           CAST((SUM(hit) * 2000000 + COUNT(*)) // (2 * COUNT(*))
                AS BIGINT) AS recall_e6,
           CAST({_scurve_case_sql()} AS BIGINT) AS expected_e6
    FROM joined GROUP BY bucket
    """,
)
def q_lsh_scurve_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MinHash-LSH banding S-curve, measured against EXACT ground
    truth — the tuning artifact that decides (bands, rows) before a
    100 TB dedup run (the S-curve analysis of Leskovec/Rajaraman/
    Ullman, "Mining of Massive Datasets" ch.3 — public).

    Ground truth: every pair with exact bigram-shingle Jaccard >= 0.5
    WITHIN a fixed audit cohort (doc_id % 10 = 0 plus every injected
    mutant's source — banding recall is a property of the detector
    CONFIG, so it is measured on a bounded sample, exactly how
    banding is tuned before a full run; truth over the whole corpus
    would itself be a second dedup job). Pairs come from a PPJoin
    prefix-filter self-join with the canonical length filter
    (rare-first global shingle order — complete, no false negatives;
    the same machinery as prefix_filter_jaccard_join but over SHINGLE
    sets at the lower threshold the audit needs). Pairs bucket by
    exact Jaccard decile; the
    production 8-band x 3-row detector's candidate set left-joins on,
    and each bucket reports observed recall next to the analytic
    1 - (1 - s^r)^b at the bucket midpoint. The expected values are
    Python-computed literals injected into BOTH engines (pow differs
    across libms — it must not run in either engine). The gap column
    pair (recall vs expected) is the audit's finding: a detector
    drifting from its analytic curve means broken hashing or band
    wiring, and LOW buckets (5-6) are SUPPOSED to show partial
    recall — that is what banding trades away.

    100 TB shape: truth generation is the PPJoin bound (sum of
    prefix-posting-list squares); the LSH side is the production
    banded join; the comparison joins two pair sets on their keys.
    Nothing is all-pairs.
    """
    corpus = D.with_injected_near_dups(
        _docs(spark, sf_dir).where(
            (F.col("doc_id") % 10 == 0) | (F.col("doc_id") < 40)
        )
    )
    shl = (
        D.staged_shingles(corpus)
        .select("doc_id", F.array_distinct("sh").alias("shg"))
        .persist()
    )
    # shl is persisted (attribute explode is clone-free), but the
    # house lint bans plain explode over staged columns uniformly
    tokf = (
        shl.select("doc_id", F.posexplode_outer("shg").alias("_sp", "t"))
        .where(F.col("_sp").isNotNull())
        .select("doc_id", "t")
    )
    sizes = shl.select("doc_id", F.size("shg").alias("sz"))
    dfr = tokf.groupBy("t").agg(F.count(F.lit(1)).alias("df"))
    w = Window.partitionBy("doc_id").orderBy("df", "t")
    ranked = tokf.join(dfr, "t").select(
        "doc_id", "t", F.row_number().over(w).alias("pos")
    )
    # `sizes` is one row per audit-cohort document, and the cohort is
    # doc_id % 10 = 0 — 10% of the corpus, i.e. corpus-proportional,
    # not bounded. No broadcast hint; AQE broadcasts when it fits.
    prefix = (
        ranked.join(sizes, "doc_id")
        .where(
            F.col("pos")
            <= F.col("sz") - F.ceil(F.col("sz") * 50 / 100.0).cast("bigint") + 1
        )
        .select("doc_id", "t", "sz")
        # persisted: both sides of the self-join below otherwise
        # re-run the df join and the row_number window (same fix as
        # prefix_filter_jaccard_join)
        .persist()
    )
    # canonical PPJoin length filter: |A| and |B| must be within a
    # factor 1/t of each other or Jaccard >= t is impossible
    cand = (
        prefix.select(F.col("doc_id").alias("doc_a"), "t", F.col("sz").alias("sza"))
        .join(
            prefix.select(
                F.col("doc_id").alias("doc_b"), "t", F.col("sz").alias("szb")
            ),
            "t",
        )
        .where(
            (F.col("doc_a") < F.col("doc_b"))
            & (F.col("szb") * 100 >= F.col("sza") * 50)
            & (F.col("sza") * 100 >= F.col("szb") * 50)
        )
        .select("doc_a", "doc_b")
        .distinct()
    )
    truth = (
        cand.join(
            shl.select(F.col("doc_id").alias("doc_a"), F.col("shg").alias("sa")),
            "doc_a",
        )
        .join(
            shl.select(F.col("doc_id").alias("doc_b"), F.col("shg").alias("sb")),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect("sa", "sb")).alias("inter"),
            # inclusion-exclusion on the DISTINCT shingle arrays:
            # |A u B| = |A| + |B| - |A n B| — drops the second
            # per-pair set materialization (array_union built and
            # hashed both arrays again just to take its size)
            (F.size("sa") + F.size("sb")).alias("_szsum"),
        )
        .withColumn("un", F.col("_szsum") - F.col("inter"))
        .where(F.col("inter") * 2 >= F.col("un"))
        .select("doc_a", "doc_b", F.expr("inter * 1000 div un").alias("pm"))
    )
    lsh = D.minhash_lsh_pairs(corpus).select(
        F.col("doc_a").alias("la"), F.col("doc_b").alias("lb"), F.lit(1).alias("hit")
    )
    joined = truth.join(
        lsh,
        (F.col("doc_a") == F.col("la")) & (F.col("doc_b") == F.col("lb")),
        "left",
    ).select(
        F.expr("pm div 100").alias("bucket"),
        F.coalesce("hit", F.lit(0)).alias("hit"),
    )
    expected = F.lit(None).cast("long")
    for b, e6 in _SCURVE_EXPECTED_E6.items():
        expected = F.when(F.col("bucket") == b, F.lit(e6)).otherwise(expected)
    return joined.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_true_pairs"),
        F.sum("hit").cast("long").alias("n_lsh_hit"),
        F.expr(
            "CAST((sum(hit) * 2000000 + count(1)) div (2 * count(1)) AS BIGINT)"
        ).alias("recall_e6"),
    ).select(
        "bucket",
        "n_true_pairs",
        "n_lsh_hit",
        "recall_e6",
        expected.cast("long").alias("expected_e6"),
    )
