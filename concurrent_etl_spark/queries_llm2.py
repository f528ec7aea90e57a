"""LLM training-data pipeline queries, tranche 2: corpus statistics,
data mixing, LM-based quality scoring, train/eval contamination.

Beyond-the-reference surface (north star; the reference at
`/root/reference` has no text operators at all — its transform layer
is column casts, case_2/Normal.py:177-198). Each query pairs a Spark
implementation with a DuckDB oracle reproducing the identical
pipeline; determinism rules are the same as queries_llm.py (md5
hashing, integer/decimal-exact accumulation, explicit ROWS frames).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from concurrent_etl_spark.catalog import query
from concurrent_etl_spark.operators import text as T
from concurrent_etl_spark.queries_llm import (
    _FOLD,
    _fold,
    _docs,
    _shingles,
    _text_stats_sql,
    _tok,
)


@query(
    "token_length_histogram",
    oracle=f"""
    WITH t AS (SELECT len({_tok('text')}) AS n_tok FROM documents)
    SELECT CAST(length(bin(n_tok)) AS INTEGER) AS bucket,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS n_tokens_total
    FROM t GROUP BY 1
    """,
)
def q_token_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Power-of-two token-length histogram — the sequence-length
    planning pass of a training pipeline (how many docs fit a 2^k
    context window). Bucket = bit-length of the token count (pure
    integer arithmetic: length of the binary string, identical in
    both engines — no float log2 edge cases). One linear scan + one
    tiny agg; map-side combinable, no skew (≤ ~40 buckets).
    """
    docs = _docs(spark, sf_dir)
    n_tok = F.size(T.tokens(F.col("text")))
    return (
        docs.select(n_tok.alias("n_tok"))
        .groupBy(F.length(F.bin(F.col("n_tok"))).cast("int").alias("bucket"))
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("n_tokens_total"),
        )
    )


@query(
    "vocab_coverage_topk",
    oracle=f"""
    WITH tok AS (
      SELECT unnest({_tok(_FOLD)}) AS token FROM documents),
    c AS (SELECT token, COUNT(*) AS n FROM tok GROUP BY 1),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM c),
    r AS (
      SELECT token, n,
             ROW_NUMBER() OVER (ORDER BY n DESC, token) AS rnk,
             SUM(n) OVER (ORDER BY n DESC, token
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS cum
      FROM c)
    SELECT CAST(rnk AS INTEGER) AS rnk, token, n,
           CAST(cum AS BIGINT) AS cum_tokens,
           round(CAST(cum AS DOUBLE) / t.total, 9) AS cum_share
    FROM r, tot t
    WHERE rnk <= 100
    """,
)
def q_vocab_coverage_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage curve: cumulative share of all token
    occurrences covered by the top-100 terms — the vocabulary-sizing /
    tokenizer-design statistic. Scale path: the global ordering is
    materialized ONLY for the top-100 candidate set (TakeOrderedAndProject
    via orderBy+limit — no single-partition sort of the full vocab);
    the cumulative window then runs over those 100 rows. Cumulative
    sums are integer-exact; the share divides once at the end.
    """
    docs = _docs(spark, sf_dir)
    tok = docs.select(F.explode(T.tokens(T.ascii_fold("text"))).alias("token"))
    c = tok.groupBy("token").agg(F.count("*").alias("n"))
    total = c.agg(F.sum("n").cast("bigint").alias("total"))
    top = c.orderBy(F.desc("n"), F.asc("token")).limit(100)
    w = Window.orderBy(F.desc("n"), F.asc("token"))
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        top.withColumn("rnk", F.row_number().over(w))
        .withColumn("cum", F.sum("n").over(cum))
        .crossJoin(F.broadcast(total))
        .select(
            F.col("rnk").cast("int").alias("rnk"),
            "token",
            "n",
            F.col("cum").cast("bigint").alias("cum_tokens"),
            F.round(F.col("cum").cast("double") / F.col("total"), 9).alias(
                "cum_share"
            ),
        )
    )


@query(
    "data_mixture_sampling",
    oracle=f"""
    WITH stats AS ({_text_stats_sql('documents')}),
    s AS (
      SELECT doc_id, lang_guess,
             CASE WHEN quality >= 0.75 THEN 'high' ELSE 'low' END AS q_bucket
      FROM stats)
    SELECT doc_id, lang_guess, q_bucket, CAST(rk AS INTEGER) AS rk
    FROM (
      SELECT *, ROW_NUMBER() OVER (
               PARTITION BY lang_guess, q_bucket
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
      FROM s)
    WHERE rk <= 20
    """,
)
def q_data_mixture_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified data-mixture sampling: a fixed quota of 20 docs per
    (language, quality-bucket) stratum, picked by md5(doc_id) — a
    deterministic uniform draw that needs no RNG state and reshuffles
    identically on re-run (reproducible training mixtures). The
    per-stratum rank is a window over the stratum key; stratum
    cardinality is tiny (languages x 2) so the partitions are
    balanced by the hash-ordering, not by data skew.
    """
    stats = T.text_stats(_docs(spark, sf_dir))
    s = stats.select(
        "doc_id",
        "lang_guess",
        F.when(F.col("quality") >= 0.75, "high").otherwise("low").alias("q_bucket"),
    )
    w = Window.partitionBy("lang_guess", "q_bucket").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        s.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 20)
        .select("doc_id", "lang_guess", "q_bucket", F.col("rk").cast("int").alias("rk"))
    )


@query(
    "bigram_doc_score",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_tok(_FOLD)} AS toks FROM documents),
    bg AS (
      SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
      FROM t, LATERAL (SELECT unnest(range(1, len(toks))) AS i)),
    c AS (SELECT w1, w2, COUNT(*) AS n FROM bg GROUP BY 1, 2),
    tot AS (SELECT w1, SUM(n) AS n_w1 FROM c GROUP BY 1),
    j AS (
      SELECT bg.doc_id,
             CAST(round(ln(c.n / tot.n_w1), 12) AS DECIMAL(24,12)) AS lp
      FROM bg JOIN c USING (w1, w2) JOIN tot USING (w1))
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           round(CAST(SUM(lp) AS DOUBLE) / COUNT(*), 6) AS avg_logp
    FROM j GROUP BY 1
    """,
)
def q_bigram_doc_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-proxy document scoring: mean bigram log-probability
    under the corpus's own bigram LM — the classic LM-based quality
    filter (low avg log-prob = unusual/garbled text). ONE pass over
    the exploded bigrams into per-doc multiplicities; corpus counts
    n(w1,w2) and n(w1) and the scoring join all derive from that
    aggregate. Per-bigram log-probs are rounded then accumulated as
    DECIMAL (weighted by multiplicity — exact repeated addition) so
    the partitioned Spark sum and the oracle's sequential sum are
    bit-identical regardless of order.
    At 100 TB the count tables are corpus-vocabulary-sized (<< data)
    and the join keys are uniform token hashes — no skew salt needed.
    """
    docs = _docs(spark, sf_dir)
    toks = docs.select("doc_id", T.tokens(T.ascii_fold("text")).alias("toks"))
    bg = (
        toks.select(
            "doc_id",
            F.explode(
                F.expr(
                    # greatest(...,0): ANSI slice() rejects the -1 length an
                # empty/1-token doc produces
                "transform(slice(toks, 1, greatest(size(toks) - 1, 0)),"
                " (w, i) ->"
                    " struct(w AS w1, toks[i + 1] AS w2))"
                )
            ).alias("p"),
        )
        .select("doc_id", "p.w1", "p.w2")
    )
    # collapse to per-doc bigram MULTIPLICITIES first: every later
    # consumer (corpus counts, totals, the scoring join) derives
    # from db, so the exploded stream is aggregated exactly once
    # and the join input shrinks from one row per occurrence to one
    # per distinct (doc, bigram) — the compression grows with doc
    # length, which is what survives a 100x scale-up. The corpus
    # count tables are vocabulary-sized (<< data), hence the
    # explicit broadcasts; the weighted sum m*lp in DECIMAL equals
    # the oracle's per-occurrence sum exactly (repeated addition).
    db = bg.groupBy("doc_id", "w1", "w2").agg(F.count("*").alias("m"))
    c = db.groupBy("w1", "w2").agg(F.sum("m").alias("n"))
    tot = c.groupBy("w1").agg(F.sum("n").alias("n_w1"))
    lp = F.round(F.log(F.col("n") / F.col("n_w1")), 12).cast("decimal(24,12)")
    return (
        # no hint: the bigram-count table is vocabulary-squared-scale — corpus-proportional (Heaps' law); AQE broadcasts when it fits
        db.join((c), ["w1", "w2"])
        # no hint: per-w1 totals are vocabulary-sized — corpus-proportional
        .join((tot), ["w1"])
        .groupBy("doc_id")
        .agg(
            F.sum("m").cast("bigint").alias("n_bigrams"),
            # m as decimal(8,0), not bigint: bigint*decimal(24,12)
            # needs precision 45 > 38 and Spark trims the SCALE to
            # fit (silent 6-dp rounding); 8+24+1 = 33 stays exact
            F.sum(F.col("m").cast("decimal(8,0)") * lp).alias("_slp"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            F.round(
                F.col("_slp").cast("double") / F.col("n_bigrams"), 6
            ).alias("avg_logp"),
        )
    )


@query(
    "contamination_check",
    oracle=f"""
    WITH corpus AS (
      SELECT doc_id, 'train' AS split, text FROM documents
      UNION ALL
      SELECT doc_id + 100000 AS doc_id, 'eval' AS split,
             array_to_string(list_slice({_tok('text')}, 3, 100000000), ' ')
               AS text
      FROM documents WHERE doc_id < 40),
    sh AS (
      SELECT doc_id, split, unnest({_shingles(_FOLD)}) AS s
      FROM corpus),
    pairs AS (
      SELECT e.doc_id AS eval_id, t.doc_id AS train_id,
             COUNT(*) AS n_common
      FROM sh e JOIN sh t ON e.s = t.s
      WHERE e.split = 'eval' AND t.split = 'train'
      GROUP BY 1, 2),
    esz AS (
      SELECT doc_id AS eval_id, COUNT(*) AS n_eval
      FROM sh WHERE split = 'eval' GROUP BY 1)
    SELECT eval_id, train_id, CAST(n_common AS BIGINT) AS n_common,
           round(CAST(n_common AS DOUBLE) / e.n_eval, 9) AS overlap_frac
    FROM pairs JOIN esz e USING (eval_id)
    WHERE CAST(n_common AS DOUBLE) / e.n_eval >= 0.5
    """,
)
def q_contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval contamination detection: fraction of an eval doc's
    distinct bigram shingles that appear verbatim in a train doc —
    the n-gram-overlap leakage check run before every training run.
    The synthetic corpus has no natural near-dups, so the eval side
    is injected inside the query (first-two-words-dropped mutants of
    doc_id < 40, mirroring the dedup queries); a pair survives only
    at >= 50% overlap, which exactly selects the 40 mutant->source
    pairs. Shape: shingle-equality equi-join (shuffle on the shingle
    hash — uniform, no skew) then a pair-keyed agg; never all-pairs.
    """
    docs = _docs(spark, sf_dir)
    base = docs.select("doc_id", F.lit("train").alias("split"), "text")
    mutants = docs.where(F.col("doc_id") < 40).select(
        (F.col("doc_id") + 100_000).alias("doc_id"),
        F.lit("eval").alias("split"),
        F.array_join(F.slice(T.tokens(F.col("text")), 3, 1_000_000), " ").alias(
            "text"
        ),
    )
    corpus = base.unionByName(mutants)
    # tokens staged first — unstaged shingles(text) re-tokenizes per
    # element inside the HOF (the O(n^2) trap text.py documents)
    sh = corpus.select(
        "doc_id", "split", T.tokens(T.ascii_fold("text")).alias("_t")
    ).select(
        "doc_id",
        "split",
        F.explode(T.shingles_from_tokens(F.col("_t"), 2)).alias("s"),
    )
    ev = sh.where(F.col("split") == "eval").select(
        F.col("doc_id").alias("eval_id"), "s"
    )
    tr = sh.where(F.col("split") == "train").select(
        F.col("doc_id").alias("train_id"), "s"
    )
    pairs = ev.join(tr, "s").groupBy("eval_id", "train_id").agg(
        F.count("*").alias("n_common")
    )
    esz = ev.groupBy("eval_id").agg(F.count("*").alias("n_eval"))
    frac = F.col("n_common").cast("double") / F.col("n_eval")
    return (
        pairs.join(esz, "eval_id")
        .where(frac >= 0.5)
        .select(
            "eval_id",
            "train_id",
            F.col("n_common").cast("bigint").alias("n_common"),
            F.round(frac, 9).alias("overlap_frac"),
        )
    )


#: Rabin-Karp polynomial base/modulus (shared with the oracle SQL)
_RK_B = 31
_RK_P = 1_000_000_007
_RK_K = 8  # window length in characters


@query(
    "rolling_hash_fingerprint",
    oracle=f"""
    WITH chars AS (
      SELECT doc_id,
             list_transform(regexp_extract_all({_fold('text')}, '.'),
                            c -> ord(c)) AS cs
      FROM documents),
    hashes AS (
      SELECT doc_id,
             list_transform(range(1, len(cs) - {_RK_K} + 2), i ->
               list_aggregate(
                 list_transform(range(0, {_RK_K}), j ->
                   cs[i + j] * CAST(pow({_RK_B}, {_RK_K} - 1 - j) AS BIGINT)),
                 'sum') % {_RK_P}) AS hs
      FROM chars
      WHERE len(cs) >= {_RK_K})
    SELECT doc_id,
           CAST(len(hs) AS BIGINT) AS n_windows,
           CAST(len(list_distinct(hs)) AS BIGINT) AS n_distinct,
           array_to_string(list_slice(list_sort(list_distinct(hs)), 1, 4),
                           '-') AS fingerprint
    FROM hashes
    """,
)
def q_rolling_hash_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting with a true rolling-hash family:
    Rabin-Karp polynomial hashes (base 31 mod 1e9+7) of every 8-char
    window, bottom-4 kept as the fingerprint — the character-level
    complement to the word-shingle/md5 fingerprint in text_stats
    (robust to whitespace/tokenization changes the way winnowing
    fingerprints are). All arithmetic is exact 64-bit integer
    (max window sum ~3e13 << 2^63, the modulus applied once per
    window), so both engines agree bit-for-bit. One linear scan, no
    shuffle; per-doc work is O(chars x 8) inside JVM higher-order
    functions.
    """
    docs = _docs(spark, sf_dir)
    cs = F.transform(
        F.regexp_extract_all(T.ascii_fold("text"), F.lit("."), 0), F.ascii
    )
    staged = docs.select("doc_id", cs.alias("cs")).where(
        F.size("cs") >= _RK_K
    )
    weights = [int(_RK_B ** (_RK_K - 1 - j)) for j in range(_RK_K)]
    window_hash = (
        "aggregate(transform(sequence(0, {k} - 1), "
        "j -> cs[i + j - 1] * element_at(array({w}), j + 1)), "
        "0L, (acc, x) -> acc + x) % {p}"
    ).format(k=_RK_K, w=", ".join(f"{w}L" for w in weights), p=_RK_P)
    hs = F.expr(
        f"transform(sequence(1, size(cs) - {_RK_K} + 1), i -> {window_hash})"
    )
    return staged.select("doc_id", hs.alias("hs")).select(
        "doc_id",
        F.size("hs").cast("bigint").alias("n_windows"),
        F.size(F.array_distinct("hs")).cast("bigint").alias("n_distinct"),
        F.array_join(
            F.slice(F.array_sort(F.array_distinct("hs")), 1, 4), "-"
        ).alias("fingerprint"),
    )


def _ann_recall_sql() -> str:
    from concurrent_etl_spark.queries_llm import _oracle_cos

    cos_ev = _oracle_cos("q.qv", "e.v")
    cos_ec = _oracle_cos("e.v", "c.cv")
    cos_qc = _oracle_cos("q.qv", "c.cv")
    cos_pa = _oracle_cos("p.qv", "a.v")
    return f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 3),
    exact AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.query_id, e.vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY q.query_id
                                  ORDER BY {cos_ev} DESC, e.vec_id) AS rn
        FROM e CROSS JOIN q WHERE e.vec_id <> q.query_id)
      WHERE rn <= 5),
    cent AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 8),
    assigned AS (
      SELECT vec_id, v, cid FROM (
        SELECT e.vec_id, e.v, c.cid,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY {cos_ec} DESC, c.cid) AS rn
        FROM e CROSS JOIN cent c) WHERE rn = 1),
    probes AS (
      SELECT query_id, qv, cid FROM (
        SELECT q.query_id, q.qv, c.cid,
               row_number() OVER (PARTITION BY q.query_id
                                  ORDER BY {cos_qc} DESC, c.cid) AS rn
        FROM q CROSS JOIN cent c) WHERE rn <= 2),
    ivf AS (
      SELECT query_id, neighbor_id FROM (
        SELECT p.query_id, a.vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY p.query_id
                                  ORDER BY {cos_pa} DESC, a.vec_id) AS rn
        FROM probes p JOIN assigned a ON a.cid = p.cid
        WHERE a.vec_id <> p.query_id)
      WHERE rn <= 5)
    SELECT x.query_id,
           CAST(COUNT(i.neighbor_id) AS BIGINT) AS n_matched,
           round(COUNT(i.neighbor_id) / 5.0, 9) AS recall_at_5
    FROM exact x LEFT JOIN ivf i
      ON x.query_id = i.query_id AND x.neighbor_id = i.neighbor_id
    GROUP BY 1
    """


@query("ann_recall_eval", oracle=_ann_recall_sql())
def q_ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-evaluating ANN quality: recall@5 of the IVF scale path
    against the exact brute-force baseline for the same queries —
    the metric that decides nprobe/centroid settings before trading
    exactness for speed at 100 TB. Both pipelines run as one plan
    (the exact side is query-count-bounded work, the IVF side scans
    only the probed inverted lists); recall joins the two top-k sets
    on (query, neighbor) and counts matches — exact 5ths, stable
    cross-engine.
    """
    from concurrent_etl_spark.engine import load_table
    from concurrent_etl_spark.operators import similarity as S2

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 3)
    exact = S2.brute_force_topk(emb, queries, k=5).select(
        "query_id", "neighbor_id"
    )
    ivf = S2.ivf_topk(emb, queries, n_centroids=8, nprobe=2, k=5).select(
        "query_id", "neighbor_id"
    )
    hits = ivf.select(
        F.col("query_id").alias("_qid"),
        F.col("neighbor_id").alias("_nid"),
        F.lit(1).alias("_hit"),
    )
    return (
        exact.join(
            hits,
            (F.col("query_id") == F.col("_qid"))
            & (F.col("neighbor_id") == F.col("_nid")),
            "left",
        )
        .groupBy("query_id")
        .agg(
            F.count("_hit").cast("bigint").alias("n_matched"),
            F.round(F.count("_hit") / F.lit(5.0), 9).alias("recall_at_5"),
        )
    )


def _knn_vote_sql() -> str:
    from concurrent_etl_spark.queries_llm import _oracle_cos

    cos_ev = _oracle_cos("q.qv", "e.v")
    return f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v, label
               FROM embeddings),
    q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 20),
    topk AS (
      SELECT query_id, neighbor_id, nlabel FROM (
        SELECT q.query_id, e.vec_id AS neighbor_id, e.label AS nlabel,
               row_number() OVER (PARTITION BY q.query_id
                                  ORDER BY {cos_ev} DESC, e.vec_id) AS rn
        FROM e CROSS JOIN q WHERE e.vec_id <> q.query_id)
      WHERE rn <= 10),
    votes AS (
      SELECT query_id, nlabel, COUNT(*) AS n_votes
      FROM topk GROUP BY 1, 2)
    SELECT query_id, CAST(nlabel AS INTEGER) AS predicted_label,
           CAST(n_votes AS BIGINT) AS n_votes
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY n_votes DESC, nlabel) AS vr
          FROM votes)
    WHERE vr = 1
    """


@query("knn_label_vote", oracle=_knn_vote_sql())
def q_knn_label_vote(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN classification by majority vote: each query vector takes
    the modal label of its 10 exact nearest neighbors (deterministic
    tiebreaks: neighbor id inside the top-k, smallest label among
    tied votes) — the label-propagation / weak-annotation primitive
    built directly on the ANN surface. Same scale shape as
    ann_topk_cosine (queries broadcast, corpus streams, window
    top-k); the vote is a tiny keyed agg over k x queries rows.
    """
    from concurrent_etl_spark.engine import load_table
    from concurrent_etl_spark.operators import similarity as S2

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 20)
    topk = S2.brute_force_topk(emb, queries, k=10)
    labeled = topk.join(
        emb.select(F.col("vec_id").alias("neighbor_id"),
                   F.col("label").alias("nlabel")),
        "neighbor_id",
    )
    votes = labeled.groupBy("query_id", "nlabel").agg(
        F.count("*").alias("n_votes")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("n_votes"), F.asc("nlabel")
    )
    return (
        votes.withColumn("vr", F.row_number().over(w))
        .where(F.col("vr") == 1)
        .select(
            "query_id",
            F.col("nlabel").cast("int").alias("predicted_label"),
            F.col("n_votes").cast("bigint").alias("n_votes"),
        )
    )


def _curation_rank_sql() -> str:
    return f"""
    WITH stats AS ({_text_stats_sql('documents')}),
    sh AS (
      SELECT doc_id, unnest({_shingles(_FOLD)}) AS s FROM documents),
    dfreq AS (SELECT s, COUNT(*) AS n_docs FROM sh GROUP BY 1),
    nov AS (
      SELECT sh.doc_id,
             round(CAST(SUM(CASE WHEN d.n_docs = 1 THEN 1 ELSE 0 END)
                   AS DOUBLE) / COUNT(*), 9) AS novelty
      FROM sh JOIN dfreq d ON sh.s = d.s GROUP BY 1),
    t AS (SELECT doc_id, {_tok(_FOLD)} AS toks FROM documents),
    bg AS (
      SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
      FROM t, LATERAL (SELECT unnest(range(1, len(toks))) AS i)),
    c AS (SELECT w1, w2, COUNT(*) AS n FROM bg GROUP BY 1, 2),
    tot AS (SELECT w1, SUM(n) AS n_w1 FROM c GROUP BY 1),
    lm AS (
      SELECT bg.doc_id,
             round(CAST(SUM(CAST(round(ln(c.n / tot.n_w1), 12)
                   AS DECIMAL(24,12))) AS DOUBLE) / COUNT(*), 6) AS avg_logp
      FROM bg JOIN c USING (w1, w2) JOIN tot USING (w1) GROUP BY 1),
    scored AS (
      SELECT s.doc_id,
             round(s.quality + n.novelty + l.avg_logp / 10.0, 9) AS score,
             s.quality, n.novelty, l.avg_logp
      FROM stats s JOIN nov n ON s.doc_id = n.doc_id
      JOIN lm l ON s.doc_id = l.doc_id)
    SELECT doc_id, score, quality, novelty, avg_logp
    FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rk
          FROM scored)
    WHERE rk <= 20
    """


@query("curation_rank_topk", oracle=_curation_rank_sql())
def q_curation_rank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite curation ranking: one plan chains three independent
    per-document signals — heuristic quality (text_stats), corpus
    novelty (document-frequency of shingles), and LM plausibility
    (mean bigram log-prob) — joins them on doc_id and takes the
    top-20 by the blended score. This is the shape of a real data-
    curation pass: N signal pipelines fan out over the same corpus
    scan, reduce to doc-keyed scores (each shuffle bounded by doc
    count, not token count), and a cheap key-join + TakeOrdered
    finishes. Signal weights are illustrative; the engineering point
    is the composition staying one lazy Catalyst plan end-to-end.
    """
    from concurrent_etl_spark.engine import load_table as _lt

    docs = _docs(spark, sf_dir)
    stats = T.text_stats(docs).select("doc_id", "quality")

    # sh and bg each feed two+ branches of the plan; persisted, the
    # corpus-wide explode/tokenize executes once per signal instead of
    # once per branch (measured ~1.5x on the whole composite at sf0.1)
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
    nov = (
        sh.join(dfreq, "s")
        .groupBy("doc_id")
        .agg(F.round(F.sum(novel).cast("double") / F.count("*"), 9).alias("novelty"))
    )

    toks = docs.select("doc_id", T.tokens(T.ascii_fold("text")).alias("toks"))
    bg = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                # greatest(...,0): ANSI slice() rejects the -1 length an
                # empty/1-token doc produces
                "transform(slice(toks, 1, greatest(size(toks) - 1, 0)),"
                " (w, i) ->"
                " struct(w AS w1, toks[i + 1] AS w2))"
            )
        ).alias("p"),
    ).select("doc_id", "p.w1", "p.w2").persist()
    cnt = bg.groupBy("w1", "w2").agg(F.count("*").alias("n")).persist()
    tot = cnt.groupBy("w1").agg(F.sum("n").alias("n_w1"))
    lp = F.round(F.log(F.col("n") / F.col("n_w1")), 12).cast("decimal(24,12)")
    lm = (
        bg.join(cnt, ["w1", "w2"])
        .join(tot, ["w1"])
        .groupBy("doc_id")
        .agg(
            F.round(
                F.sum(lp).cast("double") / F.count("*"), 6
            ).alias("avg_logp")
        )
    )

    scored = (
        stats.join(nov, "doc_id")
        .join(lm, "doc_id")
        .select(
            "doc_id",
            F.round(
                F.col("quality") + F.col("novelty") + F.col("avg_logp") / 10.0, 9
            ).alias("score"),
            "quality",
            "novelty",
            "avg_logp",
        )
    )
    return (
        scored.orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(20)
        .select("doc_id", "score", "quality", "novelty", "avg_logp")
    )


@query(
    "corpus_composition",
    oracle=f"""
    WITH stats AS ({_text_stats_sql('documents')}),
    j AS (SELECT s.doc_id, s.lang_guess, s.quality, s.n_tokens, d.source
          FROM stats s JOIN documents d ON s.doc_id = d.doc_id)
    SELECT lang_guess, source,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
           CAST(SUM(CAST(round(quality, 6) AS DECIMAL(10,6))) AS DOUBLE)
             AS quality_sum
    FROM j
    GROUP BY 1, 2
    """,
)
def q_corpus_composition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus composition report: doc counts, token totals, and
    summed quality per (language x source) cell — the mixture
    dashboard a training run is provisioned from (token budgets are
    allocated against exactly this table). Reuses the text_stats
    projection and reduces it by the two low-cardinality dimensions;
    quality sums go through DECIMAL for partition invariance, and
    downstream consumers derive means as quality_sum / n_docs.
    """
    docs = _docs(spark, sf_dir)
    stats = T.text_stats(docs).select("doc_id", "lang_guess", "quality", "n_tokens")
    j = stats.join(docs.select("doc_id", "source"), "doc_id")
    return j.groupBy("lang_guess", "source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("n_tokens"),
        F.sum(F.round(F.col("quality"), 6).cast("decimal(10,6)"))
        .cast("double")
        .alias("quality_sum"),
    )


@query(
    "train_eval_split",
    oracle="""
    WITH assigned AS (
      SELECT doc_id,
             CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                       ::BIGINT % 100 < 90
                  THEN 'train' ELSE 'eval' END AS split
      FROM documents)
    SELECT split, COUNT(*) AS n_docs,
           CAST(MIN(doc_id) AS BIGINT) AS min_doc_id,
           CAST(MAX(doc_id) AS BIGINT) AS max_doc_id
    FROM assigned GROUP BY 1
    """,
)
def q_train_eval_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 90/10 train/eval split: md5(doc_id) mod 100 —
    no RNG state, stable across reruns and cluster sizes, and any
    derived doc (augmentation, chunking) can recompute its parent's
    split membership locally, which a random split cannot offer.
    The check reduces to per-split counts + id ranges; the split
    expression itself is the operator (one linear scan).
    """
    docs = _docs(spark, sf_dir)
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint") % 100
    )
    split = F.when(bucket < 90, "train").otherwise("eval")
    return (
        docs.select("doc_id", split.alias("split"))
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").cast("bigint").alias("min_doc_id"),
            F.max("doc_id").cast("bigint").alias("max_doc_id"),
        )
    )


# GPT-2-style pre-tokenizer: contraction suffixes, space-prefixed
# letter/digit runs, space-prefixed punctuation runs, whitespace runs.
# Deliberately lookahead-free: DuckDB's RE2 has no lookahead, and both
# engines use leftmost-first alternation, so the same pattern splits
# identically JVM-side and oracle-side.
# explicit whitespace chars, not \s: the pattern string is shared by
# Java (Spark) and RE2 (DuckDB), whose \s classes differ on \x0B
_BPE_PAT = (
    r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+"
    r"| ?[^ \t\n\x0B\f\r\p{L}\p{N}]+|[ \t\n\x0B\f\r]+"
)


@query(
    "token_count_bpe_regex",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             len(list_filter(string_split_regex(text,
                 '[ \\t\\n\\x0B\\f\\r]+'), t -> t <> '')) AS n_ws_tokens,
             list_filter(regexp_extract_all(text, '{_BPE_PAT.replace("'", "''")}'),
                         tok -> NOT regexp_matches(tok,
                           '^[ \\t\\n\\x0B\\f\\r]+$')) AS toks
      FROM documents)
    SELECT doc_id, n_ws_tokens,
           CAST(len(toks) AS INTEGER) AS n_bpe_tokens,
           CAST(len(list_filter(toks, tok -> tok LIKE ' %')) AS INTEGER)
             AS n_space_prefixed,
           CASE WHEN n_ws_tokens > 0
                THEN CAST(len(toks) AS DOUBLE) / n_ws_tokens END
             AS bpe_per_word
    FROM t
    """,
)
def q_token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways (north star: token budgeting): naive
    whitespace count vs a BPE-ish GPT-2 pre-tokenizer regex — the
    fertility ratio (bpe_per_word) is the standard proxy for how many
    model tokens a document will cost before running a real BPE merge
    table. Pure per-row regexp work: one linear scan, trivially
    data-parallel at 100 TB (no shuffle at all), and the regex stays
    JVM-side (regexp_extract_all in codegen, no Python).

    The reference has no tokenizer surface (its only string ops are
    substring slices, case_2/Normal.py:191-201); pattern chosen
    lookahead-free so Spark (Java regex) and DuckDB (RE2) agree.
    """
    docs = _docs(spark, sf_dir)
    toks = F.filter(
        F.regexp_extract_all(F.col("text"), F.lit(_BPE_PAT), F.lit(0)),
        lambda t: ~t.rlike(r"^[ \t\n\x0B\f\r]+$"),
    )
    # No trim(): DuckDB trim strips U+3000 (any Unicode whitespace),
    # Spark trim strips ASCII space only — a document with U+3000
    # adjacent to ASCII whitespace at a string edge would diverge.
    # Instead split on the shared explicit-ws class and drop empty
    # tokens on BOTH engines; an all-whitespace doc now counts 0
    # (bpe_per_word guarded to NULL), identically on both sides.
    n_ws = F.size(
        F.filter(
            F.split(F.col("text"), r"[ \t\n\x0B\f\r]+"),
            lambda t: t != "",
        )
    )
    return docs.select(
        "doc_id",
        n_ws.alias("n_ws_tokens"),
        F.size(toks).alias("n_bpe_tokens"),
        F.size(
            F.filter(toks, lambda t: t.startswith(" "))
        ).alias("n_space_prefixed"),
        F.when(n_ws > 0, F.size(toks).cast("double") / n_ws)
        .alias("bpe_per_word"),
    ).withColumn("n_bpe_tokens", F.col("n_bpe_tokens").cast("int")) \
     .withColumn("n_space_prefixed", F.col("n_space_prefixed").cast("int"))


@query(
    "embedding_quantize_int8",
    oracle="""
    WITH scaled AS (
      SELECT vec_id, len(embedding) AS n_dims,
             list_max(list_transform(embedding,
                      v -> abs(CAST(v AS DOUBLE)))) / 127.0 AS qscale
      FROM embeddings),
    q AS (
      SELECT s.vec_id, s.n_dims, s.qscale,
             CASE WHEN s.qscale = 0 THEN NULL
                  ELSE list_transform(e.embedding,
                       v -> floor(CAST(v AS DOUBLE) / s.qscale + 0.5)) END
               AS codes
      FROM scaled s JOIN embeddings e ON s.vec_id = e.vec_id)
    SELECT vec_id, CAST(n_dims AS INTEGER) AS n_dims, qscale,
           CAST(COALESCE(len(list_filter(codes, c -> abs(c) >= 127)), 0)
                AS INTEGER) AS n_saturated,
           CASE WHEN qscale = 0 THEN 0.0 ELSE
             (SELECT list_sum(list_transform(range(1, n_dims + 1),
                i -> (CAST(e2.embedding[i] AS DOUBLE) - codes[i] * qscale)
                   * (CAST(e2.embedding[i] AS DOUBLE) - codes[i] * qscale)))
              FROM embeddings e2 WHERE e2.vec_id = q.vec_id) / n_dims
           END AS recon_mse
    FROM q
    """,
)
def q_embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 vector quantization (north star: ANN storage
    compression — 4x smaller vectors before an IVF/LSH index is
    built). Per vector: qscale = max|x|/127, codes = floor(x/qscale
    + 0.5) (floor(x+0.5) instead of round(): both engines evaluate
    it with identical IEEE ops, where round() on doubles is not
    cross-engine-stable), saturation count, and reconstruction MSE.

    Everything is per-row higher-order-function work over the array
    column — no shuffle at any scale; the lambda chain stays in
    codegen. The quantized codes themselves stay internal (arrays
    hash differently across engines); the query returns the scalar
    audit a compression pass reports. Zero vectors degrade to
    qscale=0 / mse=0 rather than NaN.
    """
    from concurrent_etl_spark.engine import load_table

    e = load_table(spark, sf_dir, "embeddings")
    xd = F.transform(F.col("embedding"), lambda v: v.cast("double"))
    staged = e.select(
        "vec_id",
        F.size("embedding").alias("n_dims"),
        xd.alias("xd"),
        (F.array_max(F.transform(xd, lambda v: F.abs(v))) / 127.0).alias(
            "qscale"
        ),
    )
    codes = F.transform(
        F.col("xd"), lambda v: F.floor(v / F.col("qscale") + 0.5)
    )
    staged = staged.withColumn(
        "codes", F.when(F.col("qscale") != 0, codes)
    )
    err = F.zip_with(
        F.col("xd"),
        F.col("codes"),
        lambda x, c: (x - c * F.col("qscale")) * (x - c * F.col("qscale")),
    )
    return staged.select(
        "vec_id",
        F.col("n_dims").cast("int").alias("n_dims"),
        "qscale",
        F.coalesce(
            F.size(
                F.filter(F.col("codes"), lambda c: F.abs(c) >= 127)
            ),
            F.lit(0),
        ).cast("int").alias("n_saturated"),
        F.when(F.col("qscale") == 0, F.lit(0.0))
        .otherwise(
            F.aggregate(err, F.lit(0.0), lambda acc, v: acc + v)
            / F.col("n_dims")
        )
        .alias("recon_mse"),
    )


# count-min sketch geometry: 4 independent hash rows x 64 buckets.
# Row hashes are md5("<row>:<token>") — deterministic, engine-neutral.
_CMS_D, _CMS_W = 4, 64


def cms_bucket(i_col, tok_col):
    """Row-i bucket of a token: md5("<i>:<tok>") first 8 hex chars as
    an integer mod the sketch width. Shared by the catalog query and
    the merge-law test so the tested sketch IS the shipped sketch."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(i_col.cast("string"), F.lit(":"), tok_col)),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % _CMS_W
    )


def cms_cells(tok_counts: DataFrame) -> DataFrame:
    """(i, bucket) -> cell_count sketch table from per-token counts.

    Summing counts per cell is identical to counting exploded token
    occurrences per cell, but aggregates vocabulary-sized input."""
    rows = F.array(*[F.lit(i) for i in range(_CMS_D)])
    return (
        # explode-ok: rows is a foldable literal array (no inferred filter)
        tok_counts.withColumn("i", F.explode(rows))
        .groupBy("i", cms_bucket(F.col("i"), F.col("tok")).alias("bucket"))
        .agg(F.sum("exact_count").alias("cell_count"))
    )


@query(
    "cms_frequency_sketch",
    oracle=f"""
    WITH tok AS (
      SELECT unnest({_tok(_FOLD)}) AS tok FROM documents),
    exact AS (
      SELECT tok, COUNT(*) AS exact_count FROM tok GROUP BY tok),
    rows_ AS (SELECT unnest(range(0, {_CMS_D})) AS i),
    cells AS (
      SELECT r.i,
             ('0x' || substr(md5(CAST(r.i AS VARCHAR) || ':' || t.tok), 1, 8))
               ::BIGINT % {_CMS_W} AS bucket,
             COUNT(*) AS cell_count
      FROM tok t CROSS JOIN rows_ r
      GROUP BY 1, 2),
    topk AS (
      SELECT tok, exact_count FROM exact
      ORDER BY exact_count DESC, tok LIMIT 10),
    est AS (
      SELECT k.tok, k.exact_count, MIN(c.cell_count) AS cms_estimate
      FROM topk k
      CROSS JOIN rows_ r
      JOIN cells c
        ON c.i = r.i
       AND c.bucket = ('0x' || substr(md5(CAST(r.i AS VARCHAR) || ':' || k.tok), 1, 8))
                        ::BIGINT % {_CMS_W}
      GROUP BY k.tok, k.exact_count)
    SELECT tok, exact_count, cms_estimate,
           cms_estimate >= exact_count AS never_underestimates
    FROM est
    """,
)
def q_cms_frequency_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch: the mergeable frequency sketch (completes
    the sketch family next to KMV cardinality and HLL distinct).
    The corpus is scanned ONCE into per-token exact counts (persisted
    — both the sketch and the top-k read it); the 4x64 = 256 sketch
    cells are then an aggregation of the vocabulary-sized counts, so
    the state that crosses the final shuffle is CONSTANT at 100 TB
    (each partition's partial cells merge by addition, the CMS merge
    law — tested in tests/test_sketch.py against these same
    helpers). Estimates for the exact top-10 tokens are read back
    via a broadcast join of the 256-cell table; the defining
    guarantee (estimates never undercount) is a checked column.

    Deterministic md5 row hashes make the sketch content —
    not just its error bound — reproducible in the oracle.
    """
    from concurrent_etl_spark.engine import load_table
    from concurrent_etl_spark.operators.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    tok_counts = (
        docs.select(F.explode(tokens(T.ascii_fold("text"))).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("exact_count"))
        .persist()
    )
    cells = cms_cells(tok_counts)
    topk = tok_counts.orderBy(F.col("exact_count").desc(), "tok").limit(10)
    rows = F.array(*[F.lit(i) for i in range(_CMS_D)])
    cells_r = cells.select(
        F.col("i").alias("ci"),
        F.col("bucket").alias("cbucket"),
        "cell_count",
    )
    est = (
        # explode-ok: rows is a foldable literal array (no inferred filter)
        topk.withColumn("i", F.explode(rows))
        .join(
            # broadcast-ok: CMS sketch cells — fixed depth x width = 256 rows
            F.broadcast(cells_r),
            (F.col("i") == F.col("ci"))
            & (cms_bucket(F.col("i"), F.col("tok")) == F.col("cbucket")),
        )
        .groupBy("tok", "exact_count")
        .agg(F.min("cell_count").alias("cms_estimate"))
    )
    return est.select(
        "tok",
        "exact_count",
        "cms_estimate",
        (F.col("cms_estimate") >= F.col("exact_count")).alias(
            "never_underestimates"
        ),
    )


@query(
    "array_hof_family",
    oracle="""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
    SELECT vec_id,
           round(sqrt(list_aggregate(list_transform(v, x -> x * x), 'sum')),
                 9) AS l2_norm,
           CAST(len(list_filter(v, x -> x > 0)) AS INTEGER) AS n_pos,
           list_max(list_transform(v, x -> abs(x))) AS max_abs,
           (len(list_filter(v, x -> abs(x) > 2.0)) > 0) AS has_large,
           round(list_aggregate(v, 'sum') / len(v), 9) + 0 AS mean_val
    FROM e
    """,
)
def q_array_hof_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array function family over embedding vectors:
    transform / filter / exists / aggregate (fold) / array_max, all
    evaluated JVM-side inside codegen — the zero-Python path for
    vector feature engineering. The fold is a sequential left fold in
    element order, so the double sum is bit-reproducible per row (no
    partition-order dependence: the array lives inside one row), and
    the oracle's list_aggregate walks the same order. The float32
    elements are widened to double BEFORE any arithmetic on both
    sides so intermediate precision matches exactly. Per-row work,
    no shuffle at all: at 100 TB this is a pure map stage bounded by
    scan bandwidth.

    Reference parity: none — the reference has no array type
    (SURVEY §1 'no nested, array, map types'); this is north-star
    surface for embedding-column pipelines.
    """
    from concurrent_etl_spark.engine import load_table as _lt

    emb = _lt(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    total = F.aggregate(v, F.lit(0.0), lambda a, x: a + x)
    sq_sum = F.aggregate(
        F.transform(v, lambda x: x * x), F.lit(0.0), lambda a, x: a + x
    )
    return emb.select(
        "vec_id",
        F.round(F.sqrt(sq_sum), 9).alias("l2_norm"),
        F.size(F.filter(v, lambda x: x > 0)).alias("n_pos"),
        F.array_max(F.transform(v, lambda x: F.abs(x))).alias("max_abs"),
        F.exists(v, lambda x: F.abs(x) > 2.0).alias("has_large"),
        # + 0.0 normalizes IEEE negative zero: rounding a tiny
        # negative mean yields -0.0 in one engine and +0.0 in the
        # other; adding positive zero maps both to +0.0
        (F.round(total / F.size(v), 9) + F.lit(0.0)).alias("mean_val"),
    )
