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
from concurrent_etl_spark.queries_llm import _docs, _tok

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
      SELECT doc_id, lang, unnest({_tok('lower(text)')}) AS token
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
        F.explode(T.tokens(F.lower(F.col("text")))).alias("token"),
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
