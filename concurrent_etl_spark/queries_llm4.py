"""LLM training-data pipeline queries, tranche 4: sequence packing,
deterministic shard manifests, unigram-LM quality scoring.

Beyond-the-reference surface (the reference at `/root/reference` has
no tokenizer or packing layer at all — its transform step is column
casts and substring slices, case_2/Normal.py:177-201). These are the
last-mile ops of a pretraining pipeline: after dedup + curation, the
surviving documents are scored, sharded deterministically, and packed
into fixed-size context windows for the trainer.

Determinism rules follow queries_llm.py: integer/decimal-exact
accumulation, ``round(ln(x), 12)`` cast to DECIMAL before any sum,
md5 fingerprints over canonically-ordered strings, explicit ordering
keys everywhere. Each query pairs the Spark implementation with a
DuckDB oracle reproducing the identical pipeline.

Scale notes (100 TB): every op here shards by ``doc_id % K`` —
packing and manifest construction are embarrassingly parallel across
shards (one shuffle to co-locate a shard, sequential only *within*
a shard, which is exactly the contract a trainer's data loader
needs: shard files are independent, docs within a shard are
ordered). The unigram LM is a vocabulary-sized broadcast model.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from concurrent_etl_spark.catalog import query
from concurrent_etl_spark.operators import text as T
from concurrent_etl_spark.queries_llm import _FOLD, _docs, _fold, _tok

#: context-window capacity (tokens) for both packers; small enough
#: that the sf0.01 gate exercises many bins per shard, large enough
#: that docs (~25 whitespace tokens) pack ~20-deep.
_PACK_CAPACITY = 512
#: shard fan-out for the packers/manifest. At 100 TB this is the
#: number of independent trainer shards (thousands); 8 keeps the
#: sf0.01 gate's per-shard sequences long enough to be interesting.
_N_SHARDS = 8


# ---------------------------------------------------------------------------
# fixed-boundary sequence packing (pure window SQL)
# ---------------------------------------------------------------------------

@query(
    "sequence_pack_fixed",
    oracle=f"""
    WITH d AS (
      SELECT doc_id % {_N_SHARDS} AS shard, doc_id,
             len({_tok('text')}) AS n_tok
      FROM documents),
    c AS (
      SELECT shard, doc_id, n_tok,
             SUM(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
                              ROWS UNBOUNDED PRECEDING) AS run
      FROM d)
    SELECT CAST(shard AS BIGINT) AS shard, doc_id,
           CAST(n_tok AS BIGINT) AS n_tok,
           CAST(run - n_tok AS BIGINT) AS start_off,
           CAST((run - n_tok) // {_PACK_CAPACITY} AS BIGINT) AS first_pack,
           CAST((run - 1) // {_PACK_CAPACITY} AS BIGINT) AS last_pack,
           CASE WHEN (run - 1) // {_PACK_CAPACITY}
                     > (run - n_tok) // {_PACK_CAPACITY}
                THEN 1 ELSE 0 END AS straddles
    FROM c
    """,
)
def q_sequence_pack_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-boundary sequence packing — the 'concatenate the shard's
    token stream, cut every C tokens' layout used by most pretraining
    loaders. Per document: its byte offset in the shard's token
    stream (window cumsum), the first/last context window it lands
    in, and whether it straddles a window boundary (the fraction of
    straddlers is the loss-masking overhead the trainer pays).

    Pure integer window arithmetic: one hash shuffle to co-locate
    shards, one running sum per shard (no global window — the
    partition key is the shard), everything JVM-side codegen. At
    100 TB the shard count is the parallelism knob; each shard's
    cumsum is an independent sorted scan.
    """
    docs = _docs(spark, sf_dir)
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cap = F.lit(_PACK_CAPACITY)
    d = docs.select(
        (F.col("doc_id") % _N_SHARDS).alias("shard"),
        "doc_id",
        F.size(T.tokens(F.col("text"))).cast("bigint").alias("n_tok"),
    ).withColumn("run", F.sum("n_tok").over(w))
    start = F.col("run") - F.col("n_tok")
    first_pack = (start / cap).cast("bigint")
    last_pack = ((F.col("run") - 1) / cap).cast("bigint")
    return d.select(
        F.col("shard").cast("bigint").alias("shard"),
        "doc_id",
        "n_tok",
        start.cast("bigint").alias("start_off"),
        first_pack.alias("first_pack"),
        last_pack.alias("last_pack"),
        F.when(last_pack > first_pack, F.lit(1))
        .otherwise(F.lit(0))
        .alias("straddles"),
    )


# ---------------------------------------------------------------------------
# greedy next-fit bin packing (applyInPandas; oracle = recursive CTE)
# ---------------------------------------------------------------------------

def _greedy_pack(pdf: pd.DataFrame) -> pd.DataFrame:
    """Sequential next-fit fold over ONE shard (already co-located):
    place each doc in the current bin unless it would overflow
    capacity, else open a new bin. A doc larger than the capacity
    gets a bin of its own (placed, overflows, next doc opens fresh).
    """
    pdf = pdf.sort_values("doc_id", kind="mergesort").reset_index(drop=True)
    bin_ids = []
    bin_id, fill = 0, 0
    for n in pdf["n_tok"]:
        if fill + n > _PACK_CAPACITY and fill > 0:
            bin_id += 1
            fill = 0
        bin_ids.append(bin_id)
        fill += int(n)
    pdf["bin_id"] = pd.Series(bin_ids, dtype="int64")
    return pdf[["shard", "bin_id", "doc_id", "n_tok"]]


@query(
    "greedy_pack_bins",
    oracle=f"""
    WITH RECURSIVE d AS (
      SELECT doc_id % {_N_SHARDS} AS shard, doc_id,
             coalesce(len({_tok('text')}), 0) AS n_tok,
             row_number() OVER (PARTITION BY doc_id % {_N_SHARDS}
                                ORDER BY doc_id) AS rn
      FROM documents),
    r AS (
      SELECT shard, doc_id, rn, n_tok, 0 AS bin_id, n_tok AS fill
      FROM d WHERE rn = 1
      UNION ALL
      -- `AND r.fill > 0` mirrors the Python fold's guard exactly
      -- (_greedy_pack): a zero-token doc opening a bin must NOT force
      -- the next overflowing doc into a fresh bin on one side only
      SELECT d.shard, d.doc_id, d.rn, d.n_tok,
             CASE WHEN r.fill + d.n_tok > {_PACK_CAPACITY} AND r.fill > 0
                  THEN r.bin_id + 1 ELSE r.bin_id END,
             CASE WHEN r.fill + d.n_tok > {_PACK_CAPACITY} AND r.fill > 0
                  THEN d.n_tok ELSE r.fill + d.n_tok END
      FROM r JOIN d ON d.shard = r.shard AND d.rn = r.rn + 1)
    SELECT CAST(shard AS BIGINT) AS shard,
           CAST(bin_id AS BIGINT) AS bin_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
           CAST(MIN(doc_id) AS BIGINT) AS first_doc,
           CAST(MAX(doc_id) AS BIGINT) AS last_doc
    FROM r GROUP BY shard, bin_id
    """,
)
def q_greedy_pack_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy next-fit bin packing — the 'no document crosses a
    context boundary' packing mode (each bin is one training sequence;
    bins are padded, so the packer's fill ratio is the padding-waste
    metric). The fold is inherently sequential *within* a shard and
    embarrassingly parallel *across* shards, so the Spark shape is
    ``groupBy(shard).applyInPandas(fold)`` — one shuffle to co-locate
    each shard, then a linear Arrow-batched pass; at 100 TB the shard
    count (thousands) is the parallelism, and no shard's token stream
    ever needs to fit anywhere but one task.

    The oracle reproduces the same fold as a DuckDB recursive CTE
    stepping all shards in lockstep (depth = max docs/shard), proving
    the Python fold against a pure-SQL sequential recurrence.
    """
    docs = _docs(spark, sf_dir)
    d = docs.select(
        (F.col("doc_id") % _N_SHARDS).cast("bigint").alias("shard"),
        "doc_id",
        # NULL text packs as 0 tokens (coalesced identically in the
        # oracle): without it the fold's int(NaN) kills the task and
        # the oracle's recurrence NULL-poisons everything downstream
        # of the first NULL doc (null-text corpus sweep, round 6)
        F.coalesce(
            F.size(T.tokens(F.col("text"))), F.lit(0)
        ).cast("bigint").alias("n_tok"),
    )
    packed = d.groupBy("shard").applyInPandas(
        _greedy_pack,
        schema="shard bigint, bin_id bigint, doc_id bigint, n_tok bigint",
    )
    return packed.groupBy("shard", "bin_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").cast("bigint").alias("n_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


# ---------------------------------------------------------------------------
# deterministic shard manifest
# ---------------------------------------------------------------------------

@query(
    "shard_manifest_audit",
    oracle=f"""
    WITH d AS (
      SELECT doc_id % {_N_SHARDS} AS shard, doc_id,
             len({_tok('text')}) AS n_tok, n_chars
      FROM documents)
    SELECT CAST(shard AS BIGINT) AS shard,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
           CAST(SUM(n_chars) AS BIGINT) AS n_bytes,
           CAST(MIN(doc_id) AS BIGINT) AS min_doc_id,
           CAST(MAX(doc_id) AS BIGINT) AS max_doc_id,
           md5(string_agg(CAST(doc_id AS VARCHAR), ','
                          ORDER BY doc_id)) AS content_fingerprint
    FROM d GROUP BY shard
    """,
)
def q_shard_manifest_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic shard manifest — the audit artifact a training
    job publishes next to its shard files: per shard, the doc/token/
    byte totals plus an order-sensitive md5 fingerprint of the
    member doc_ids (so a re-run, a backfill, or a second writer can
    prove byte-identical shard membership without re-reading data).

    One hash shuffle on the shard key; the fingerprint uses
    ``sort_array(collect_list(...))`` — bounded per shard by
    construction (shard count is chosen so shards are file-sized),
    the same WindowGroupLimit-style boundedness argument the sketch
    queries document.
    """
    docs = _docs(spark, sf_dir)
    d = docs.select(
        (F.col("doc_id") % _N_SHARDS).cast("bigint").alias("shard"),
        "doc_id",
        F.size(T.tokens(F.col("text"))).cast("bigint").alias("n_tok"),
        "n_chars",
    )
    return d.groupBy("shard").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").cast("bigint").alias("n_tokens"),
        F.sum("n_chars").cast("bigint").alias("n_bytes"),
        F.min("doc_id").alias("min_doc_id"),
        F.max("doc_id").alias("max_doc_id"),
        F.md5(
            F.concat_ws(
                ",",
                F.transform(
                    F.sort_array(F.collect_list("doc_id")),
                    lambda x: x.cast("string"),
                ),
            )
        ).alias("content_fingerprint"),
    )


# ---------------------------------------------------------------------------
# unigram-LM quality scoring (perplexity proxy)
# ---------------------------------------------------------------------------

@query(
    "unigram_logprob_quality",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest({_tok(_FOLD)}) AS t FROM documents),
    vocab AS (
      SELECT t, COUNT(*) AS c FROM tok GROUP BY t),
    tot AS (
      SELECT CAST(SUM(c) AS BIGINT) AS n,
             COUNT(*) AS v FROM vocab),
    lp AS (
      SELECT vocab.t,
             CAST(round(ln((vocab.c + 1.0) / (tot.n + tot.v)), 12)
                  AS DECIMAL(24,12)) AS lp
      FROM vocab, tot),
    scored AS (
      SELECT tok.doc_id, COUNT(*) AS n_tok,
             CAST(SUM(lp.lp) AS DECIMAL(38,12)) AS sum_lp
      FROM tok JOIN lp ON tok.t = lp.t
      GROUP BY tok.doc_id)
    SELECT doc_id, n_tok,
           CAST(-(CAST(sum_lp AS DOUBLE)) / n_tok AS DOUBLE)
             AS mean_neg_logprob
    FROM scored
    """,
)
def q_unigram_logprob_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM perplexity proxy — the classic cheap quality filter
    (docs whose mean token surprisal under a corpus-fitted unigram
    model is anomalously high are boilerplate/garbled; anomalously
    low are repetitive). Model: add-one-smoothed unigram
    p(t) = (c_t + 1) / (N + V) fitted on the corpus itself; score =
    -mean log p over the doc's tokens.

    Determinism: per-token log-probs are rounded to 12 decimals and
    summed as DECIMAL (order-insensitive exact), so Spark's partial
    aggregation and the oracle's sequential sum agree bit-for-bit;
    the final mean is one exact IEEE divide. Scale shape: the model
    is vocabulary-sized (broadcast join), the scan is linear —
    token explode, one groupBy(token) for the model, one
    broadcast-join + groupBy(doc) for the scores.
    """
    docs = _docs(spark, sf_dir)
    tok = docs.select(
        "doc_id",
        F.explode(T.tokens(T.ascii_fold("text"))).alias("t"),
    )
    vocab = tok.groupBy("t").agg(F.count("*").alias("c"))
    tot = vocab.agg(
        F.sum("c").cast("bigint").alias("n"), F.count("*").alias("v")
    )
    lp = vocab.crossJoin(F.broadcast(tot)).select(
        "t",
        F.round(
            F.log((F.col("c") + F.lit(1.0)) / (F.col("n") + F.col("v"))), 12
        )
        .cast("decimal(24,12)")
        .alias("lp"),
    )
    scored = (
        # broadcast-ok: unigram LM — model side by design (SCALE.md: a deployment ships a frozen capped-vocab LM; the fixture trains it in-query)
        tok.join(F.broadcast(lp), "t")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tok"),
            F.sum("lp").cast("decimal(38,12)").alias("sum_lp"),
        )
    )
    return scored.select(
        "doc_id",
        "n_tok",
        (-(F.col("sum_lp").cast("double")) / F.col("n_tok"))
        .cast("double")
        .alias("mean_neg_logprob"),
    )


# ---------------------------------------------------------------------------
# composite: the whole training-data pipeline as ONE declarative plan
# ---------------------------------------------------------------------------

@query(
    "llm_pipeline_end2end",
    oracle=f"""
    WITH hashed AS (
      SELECT doc_id,
             md5(coalesce(array_to_string({_tok(_FOLD)}, ' '), ''))
               AS h,
             len({_tok('text')}) AS n_tok,
             len(list_distinct({_tok(_FOLD)})) AS n_uniq
      FROM documents),
    kept AS (
      SELECT doc_id, n_tok FROM (
        SELECT doc_id, n_tok, n_uniq,
               row_number() OVER (PARTITION BY h ORDER BY doc_id) AS rn
        FROM hashed)
      WHERE rn = 1
        AND n_tok >= 10
        AND n_uniq * 10 >= n_tok * 3),
    sharded AS (
      SELECT doc_id % {_N_SHARDS} AS shard, doc_id, n_tok FROM kept)
    SELECT CAST(shard AS BIGINT) AS shard,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
           CAST((SUM(n_tok) + {_PACK_CAPACITY} - 1) // {_PACK_CAPACITY}
                AS BIGINT) AS n_packs,
           md5(string_agg(CAST(doc_id AS VARCHAR), ','
                          ORDER BY doc_id)) AS keep_fingerprint
    FROM sharded GROUP BY shard
    """,
)
def q_llm_pipeline_end2end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole curation pipeline as ONE declarative DAG — exact
    dedup (canonical-token md5, min-doc_id winner), quality gate
    (length floor + a 30% distinct-token diversity floor, both in
    exact integer arithmetic), deterministic sharding, and
    fixed-capacity pack accounting with a per-shard keep-set
    fingerprint. This is the composition claim behind the whole
    catalog: every stage is a building block proven separately
    (dedup_exact, quality_threshold_sweep, shard_manifest_audit,
    sequence_pack_fixed), and because each stage is declarative the
    composite is a single Catalyst plan — the dedup window, the
    filter, and the shard agg fuse into one pipeline with exactly
    two shuffles (hash groupBy, shard groupBy); no materialization
    boundaries between stages, which is what makes the end-to-end
    run at 100 TB cost what its slowest stage costs rather than the
    sum of per-stage write-outs.

    Reference parity: the reference's pipeline is also a composed
    chain (read -> transform -> dims -> load, case_1/NormalETL.py),
    but materialized stepwise through pandas frames; here
    composition is free plan fusion.
    """
    docs = _docs(spark, sf_dir)
    toks = T.tokens(T.ascii_fold("text"))
    hashed = docs.select(
        "doc_id",
        F.md5(F.concat_ws(" ", toks)).alias("h"),
        F.size(T.tokens(F.col("text"))).alias("n_tok"),
        F.size(F.array_distinct(toks)).alias("n_uniq"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("h").orderBy("doc_id")
    kept = (
        hashed.withColumn("rn", F.row_number().over(w))
        .where(
            (F.col("rn") == 1)
            & (F.col("n_tok") >= 10)
            & (F.col("n_uniq") * 10 >= F.col("n_tok") * 3)
        )
        .select("doc_id", "n_tok")
    )
    sharded = kept.select(
        (F.col("doc_id") % _N_SHARDS).cast("bigint").alias("shard"),
        "doc_id",
        "n_tok",
    )
    cap = F.lit(_PACK_CAPACITY)
    return sharded.groupBy("shard").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").cast("bigint").alias("n_tokens"),
        F.floor((F.sum("n_tok") + cap - 1) / cap)
        .cast("bigint")
        .alias("n_packs"),
        F.md5(
            F.concat_ws(
                ",",
                F.transform(
                    F.sort_array(F.collect_list("doc_id")),
                    lambda x: x.cast("string"),
                ),
            )
        ).alias("keep_fingerprint"),
    )


# ---------------------------------------------------------------------------
# text canonicalization ahead of dedup
# ---------------------------------------------------------------------------

@query(
    "text_normalize_dedup",
    oracle=f"""
    WITH n AS (
      SELECT source,
             md5(text) AS raw_h,
             md5(trim(regexp_replace(
                   regexp_replace({_fold('text')}, '[^a-z0-9 ]', ' ', 'g'),
                   '\\s+', ' ', 'g'))) AS norm_h
      FROM documents)
    SELECT source,
           COUNT(*) AS n_docs,
           COUNT(DISTINCT raw_h) AS distinct_raw,
           COUNT(DISTINCT norm_h) AS distinct_norm,
           CAST(COUNT(DISTINCT raw_h) - COUNT(DISTINCT norm_h) AS BIGINT)
             AS dups_surfaced_by_norm
    FROM n GROUP BY source
    """,
)
def q_text_normalize_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text canonicalization ahead of dedup — the normalization pass
    every exact-dedup stage runs first (lowercase, strip punctuation
    to spaces, collapse whitespace, trim), measured by what it buys:
    per source, the number of additional duplicate groups surfaced
    by hashing the NORMALIZED text vs the raw bytes. Canon uses only
    cross-engine-identical primitives (lower / POSIX-class
    regexp_replace / trim); both hashes are md5 over UTF-8.

    Per-row regex work in codegen + one distinct-agg shuffle per
    source; at 100 TB the normalization is free (fused into the
    scan) and the distinct counts become sketch partials
    (approx_count_distinct) without changing the canon itself.
    """
    docs = _docs(spark, sf_dir)
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(T.ascii_fold("text"), "[^a-z0-9 ]", " "),
            r"\s+",
            " ",
        )
    )
    n = docs.select(
        "source",
        F.md5(F.col("text")).alias("raw_h"),
        F.md5(norm).alias("norm_h"),
    )
    return n.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("raw_h").alias("distinct_raw"),
        F.countDistinct("norm_h").alias("distinct_norm"),
        (F.countDistinct("raw_h") - F.countDistinct("norm_h"))
        .cast("bigint")
        .alias("dups_surfaced_by_norm"),
    )


# ---------------------------------------------------------------------------
# exact set-similarity self-join via prefix filtering (ppjoin-style)
# ---------------------------------------------------------------------------

_JACCARD_T_PCT = 90  # threshold as integer percent: exact arithmetic


@query(
    "prefix_filter_jaccard_join",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(list_distinct({_tok(_FOLD)})) AS t
      FROM documents),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM tok GROUP BY doc_id),
    df AS (SELECT t, COUNT(*) AS df FROM tok GROUP BY t),
    ranked AS (
      SELECT tok.doc_id, tok.t,
             row_number() OVER (PARTITION BY tok.doc_id
                                ORDER BY df.df, tok.t) AS pos
      FROM tok JOIN df ON tok.t = df.t),
    prefix AS (
      SELECT r.doc_id, r.t
      FROM ranked r JOIN sizes s ON r.doc_id = s.doc_id
      WHERE r.pos <= s.sz - CAST(ceil(s.sz * {_JACCARD_T_PCT} / 100.0)
                                 AS BIGINT) + 1),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM prefix a JOIN prefix b
        ON a.t = b.t AND a.doc_id < b.doc_id),
    verified AS (
      SELECT c.doc_a, c.doc_b, COUNT(*) AS inter
      FROM cand c
      JOIN tok ta ON ta.doc_id = c.doc_a
      JOIN tok tb ON tb.doc_id = c.doc_b AND tb.t = ta.t
      GROUP BY c.doc_a, c.doc_b),
    pairs AS (
      SELECT v.doc_a, v.doc_b, v.inter,
             sa.sz + sb.sz - v.inter AS un
      FROM verified v
      JOIN sizes sa ON sa.doc_id = v.doc_a
      JOIN sizes sb ON sb.doc_id = v.doc_b
      WHERE v.inter * 100 >= (sa.sz + sb.sz - v.inter)
                             * {_JACCARD_T_PCT}),
    sym AS (
      SELECT doc_a AS doc_id, doc_b AS nbr, inter, un FROM pairs
      UNION ALL
      SELECT doc_b AS doc_id, doc_a AS nbr, inter, un FROM pairs)
    SELECT doc_id,
           COUNT(*) AS n_neighbors,
           CAST(MAX(inter * 1000 // un) AS BIGINT) AS max_jaccard_pm,
           CAST(MIN(nbr) AS BIGINT) AS min_neighbor
    FROM sym GROUP BY doc_id
    """,
)
def q_prefix_filter_jaccard_join(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """EXACT set-similarity self-join via prefix filtering (the
    PPJoin family) — the deterministic complement to the
    probabilistic near-dup detectors (minhash/simhash LSH): every
    pair with token-set Jaccard >= 0.9 is found, no false negatives,
    no banding to tune. The pigeonhole: sort each doc's distinct
    tokens rarest-first (global document frequency, token tiebreak);
    two sets can only reach threshold t if they share a token within
    each other's first ``|x| - ceil(t*|x|) + 1`` tokens — so only
    PREFIX tokens join, and rare-first ordering keeps hot tokens out
    of prefixes (join keys are exactly the shortest postings lists).
    Candidates verify by exact intersection with integer threshold
    arithmetic (``inter*100 >= union*90``); per-doc output keeps the
    result doc-bounded even on this deliberately self-similar
    fixture corpus (the pair set itself is output-driven — same
    contract as duplicate_span_pairs): neighbor count, max Jaccard
    in exact integer permille, smallest neighbor id.

    Scale shape: prefix-join fan-out is sum over prefix tokens of
    postings^2 (the PPJoin bound), cut down BEFORE the distinct by
    the length filter (t*|x| <= |y| <= |x|/t) and the positional
    filter (the unseen-suffix overlap bound min(|x|-px, |y|-py)+1
    must reach the required intersection ceil(t/(1+t)*(|x|+|y|)) —
    both are upper-bound arguments, so they only drop pairs the
    verify stage would reject: the result set is provably
    unchanged). Verification is a per-PAIR sorted-array
    intersection (size(array_intersect)) on the candidate rows —
    O(|x|+|y|) per pair with NO row expansion — replacing the
    token-level double join that exploded each candidate by its
    full token list (the triangle-count wedge lesson applied to set
    similarity; measured 135 s -> ~8 s at sf0.1 on the deliberately
    self-similar fixture corpus, identical output). Everything
    shuffles on token or doc keys; the token arrays are staged once
    and persisted (three consumers).
    """
    docs = _docs(spark, sf_dir)
    arrs = docs.select(
        "doc_id",
        F.array_sort(
            F.array_distinct(T.tokens(T.ascii_fold("text")))
        ).alias("arr"),
    ).persist()
    # arr is persisted (attribute explode is clone-free), but the
    # house lint bans plain (pos)explode over staged columns uniformly
    tok = (
        arrs.select(
            "doc_id", F.posexplode_outer("arr").alias("_tp", "t")
        )
        .where(F.col("_tp").isNotNull())
        .select("doc_id", "t")
    )
    sizes = arrs.select("doc_id", F.size("arr").alias("sz"))
    df = tok.groupBy("t").agg(F.count("*").alias("df"))
    w = Window.partitionBy("doc_id").orderBy("df", "t")
    # NO broadcast hints here: the token-df table is vocabulary-sized
    # (grows with the corpus per Heaps' law) and `sizes` is one row
    # per document — both corpus-proportional, so forcing a broadcast
    # would be a driver-side collect-and-ship bottleneck at 100 TB.
    # AQE still picks a broadcast join at small SF where they fit.
    ranked = (
        tok.join(df, "t")
        .select("doc_id", "t", F.row_number().over(w).alias("pos"))
    )
    prefix = (
        ranked.join(sizes, "doc_id")
        .where(
            F.col("pos")
            <= F.col("sz")
            - F.ceil(F.col("sz") * _JACCARD_T_PCT / 100.0).cast("bigint")
            + 1
        )
        .select("doc_id", "t", "pos", "sz")
        # persisted: BOTH sides of the prefix self-join read this
        # frame, and without it each side re-runs the df join and the
        # row_number window (the plan has no common-subtree reuse
        # above exchanges)
        .persist()
    )
    a = prefix.select(
        F.col("doc_id").alias("doc_a"),
        "t",
        F.col("pos").alias("pa"),
        F.col("sz").alias("size_a"),
    )
    b = prefix.select(
        F.col("doc_id").alias("doc_b"),
        "t",
        F.col("pos").alias("pb"),
        F.col("sz").alias("size_b"),
    )
    # required intersection for J >= t: alpha = ceil(t/(1+t) * (sa+sb));
    # overlap reachable from a shared prefix token at (pa, pb):
    # min(sa-pa, sb-pb) + 1. Integer form of bound >= alpha:
    # (100+T)*bound >= T*(sa+sb).
    bound = (
        F.least(
            F.col("size_a") - F.col("pa"), F.col("size_b") - F.col("pb")
        )
        + 1
    )
    cand = (
        a.join(b, "t")
        .where(
            (F.col("doc_a") < F.col("doc_b"))
            # length filter
            & (F.col("size_a") * 100 >= F.col("size_b") * _JACCARD_T_PCT)
            & (F.col("size_b") * 100 >= F.col("size_a") * _JACCARD_T_PCT)
            # positional filter
            & (
                bound * (100 + _JACCARD_T_PCT)
                >= (F.col("size_a") + F.col("size_b")) * _JACCARD_T_PCT
            )
        )
        .select("doc_a", "doc_b")
        .distinct()
    )
    aa = arrs.select(F.col("doc_id").alias("doc_a"), F.col("arr").alias("arr_a"))
    ab = arrs.select(F.col("doc_id").alias("doc_b"), F.col("arr").alias("arr_b"))
    pairs = (
        cand.join(aa, "doc_a")
        .join(ab, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect("arr_a", "arr_b")).alias("inter"),
            (F.size("arr_a") + F.size("arr_b")).alias("_sum_sz"),
        )
        .withColumn("un", F.col("_sum_sz") - F.col("inter"))
        .where(F.col("inter") * 100 >= F.col("un") * _JACCARD_T_PCT)
        .select("doc_a", "doc_b", "inter", "un")
    )
    # symmetrize with ONE pass: the union form referenced `pairs`
    # twice, and union subtrees execute independently — the whole
    # candidate+verify chain (the query's dominant cost) ran TWICE.
    # explode of a 2-struct literal array emits both orientations
    # from a single evaluation; row multiset identical to the union.
    sym = pairs.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("doc_a").alias("doc_id"),
                    F.col("doc_b").alias("nbr"),
                    F.col("inter").alias("inter"),
                    F.col("un").alias("un"),
                ),
                F.struct(
                    F.col("doc_b").alias("doc_id"),
                    F.col("doc_a").alias("nbr"),
                    F.col("inter").alias("inter"),
                    F.col("un").alias("un"),
                ),
            )
        ).alias("s")
    ).select("s.doc_id", "s.nbr", "s.inter", "s.un")
    return sym.groupBy("doc_id").agg(
        F.count("*").alias("n_neighbors"),
        F.max(F.floor(F.col("inter") * 1000 / F.col("un")))
        .cast("bigint")
        .alias("max_jaccard_pm"),
        F.min("nbr").cast("bigint").alias("min_neighbor"),
    )


# ---------------------------------------------------------------------------
# incremental dedup: new batch vs existing index (asymmetric LSH probe)
# ---------------------------------------------------------------------------

@query(
    "dedup_incremental_batch",
    oracle=None,  # set below: needs queries_llm's signature fragments
)
def q_dedup_incremental_batch(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """INCREMENTAL near-dedup — the ingestion-time shape: a new batch
    (docs with ``doc_id % 10 == 7``) is deduplicated AGAINST the
    existing corpus index, not against itself. The batch's MinHash
    band hashes probe the index's band buckets in an ASYMMETRIC join
    (batch side x index side — never index x index), so the work per
    ingest is proportional to the batch, while corpus-internal pairs
    are never recomputed. This is what daily ingestion at 100 TB
    actually runs: signatures of the standing corpus are a stored
    table (here recomputed since the gate is stateless; the plan
    shape is identical when they're read from the signature store),
    and only (band, batch-side) keys shuffle.

    Per batch doc with >=1 candidate: candidate count, the match
    count at est-Jaccard >= 0.5 (integer compare: agree*2 >= K), the
    best agreement count, and the best partner (smallest index doc
    among max-agreement, via exact integer arg-max encoding) — all
    integer arithmetic, no float at any decision point.
    """
    from concurrent_etl_spark.operators.dedup import (
        MINHASH_K,
        hash_shingles,
        lsh_bands,
        minhash_signature_from_hashes,
        staged_shingles,
    )

    docs = _docs(spark, sf_dir)
    # empty-shingle gate (same as operators/dedup.minhash_lsh_pairs,
    # same scan-pushed raw-text form): a <2-token doc has no bigrams,
    # and an EMPTY hash list degenerates the minhash to the seed
    # constants — every empty doc would share one band bucket and
    # pair all-pairs (found by the unicode corpus: a single-token doc
    # in the batch probed 11 spurious index candidates while the
    # oracle's NULL minhash matched none)
    gated = docs.where(
        F.col("text").rlike(
            r"[^ \t\n\x0B\f\r][ \t\n\x0B\f\r]+[^ \t\n\x0B\f\r]"
        )
    )
    sigs = (
        staged_shingles(gated, "text")
        .select("doc_id", hash_shingles(F.col("sh")).alias("hs"))
        .select(
            "doc_id", minhash_signature_from_hashes(F.col("hs")).alias("sig")
        )
        .withColumn("bands", lsh_bands(F.col("sig")))
        .persist()
    )
    # sigs is persisted (attribute explode is clone-free), but the
    # house lint bans plain posexplode over staged columns uniformly
    exploded = sigs.select(
        "doc_id", F.posexplode_outer("bands").alias("band_idx", "band_hash")
    ).where(F.col("band_idx").isNotNull())
    batch = exploded.where(F.col("doc_id") % 10 == 7).select(
        F.col("doc_id").alias("batch_doc"), "band_idx", "band_hash"
    )
    index = exploded.where(F.col("doc_id") % 10 != 7).select(
        F.col("doc_id").alias("index_doc"), "band_idx", "band_hash"
    )
    cand = (
        batch.join(index, ["band_idx", "band_hash"])
        .select("batch_doc", "index_doc")
        .dropDuplicates(["batch_doc", "index_doc"])
        .join(
            sigs.select(
                F.col("doc_id").alias("batch_doc"),
                F.col("sig").alias("sig_a"),
            ),
            "batch_doc",
        )
        .join(
            sigs.select(
                F.col("doc_id").alias("index_doc"),
                F.col("sig").alias("sig_b"),
            ),
            "index_doc",
        )
    )
    agree = F.aggregate(
        F.zip_with(
            F.col("sig_a"),
            F.col("sig_b"),
            lambda x, y: F.when(x == y, 1).otherwise(0),
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    scored = cand.select(
        "batch_doc",
        "index_doc",
        agree.alias("agree"),
    )
    enc = F.col("agree") * 10_000_000 - F.col("index_doc")
    return scored.groupBy("batch_doc").agg(
        F.count("*").alias("n_candidates"),
        F.sum(F.when(F.col("agree") * 2 >= MINHASH_K, 1).otherwise(0))
        .cast("bigint")
        .alias("n_matches"),
        F.max("agree").cast("bigint").alias("best_agree"),
        (F.max("agree") * 10_000_000 - F.max(enc))
        .cast("bigint")
        .alias("best_partner"),
    )


def _incremental_oracle() -> str:
    from concurrent_etl_spark.queries_llm import _BANDS, _SIG, _shingles

    return f"""
    WITH corpus AS (SELECT doc_id, text FROM documents),
    sh AS MATERIALIZED (SELECT * FROM (SELECT doc_id, {_shingles(_FOLD)} AS sh
           FROM corpus) WHERE len(sh) > 0),
    hs AS MATERIALIZED (SELECT doc_id, sh,
                  list_transform(sh,
                    x -> ('0x' || substr(md5(x), 1, 8))::BIGINT) AS hs
           FROM sh),
    sig AS MATERIALIZED (SELECT doc_id, sh, {_SIG} AS sig FROM hs),
    bands AS MATERIALIZED (
      SELECT doc_id, sig, sh,
             unnest({_BANDS}) AS band_hash,
             generate_subscripts({_BANDS}, 1) AS band_idx
      FROM sig),
    cand AS MATERIALIZED (
      SELECT DISTINCT a.doc_id AS batch_doc, b.doc_id AS index_doc
      FROM bands a
      JOIN bands b ON a.band_idx = b.band_idx
                  AND a.band_hash = b.band_hash
      WHERE a.doc_id % 10 = 7 AND b.doc_id % 10 <> 7),
    scored AS MATERIALIZED (
      SELECT c.batch_doc, c.index_doc,
             list_aggregate(list_transform(list_zip(sa.sig, sb.sig),
               x -> CASE WHEN x[1] = x[2] THEN 1 ELSE 0 END), 'sum')
               AS agree
      FROM cand c
      JOIN sig sa ON sa.doc_id = c.batch_doc
      JOIN sig sb ON sb.doc_id = c.index_doc)
    SELECT batch_doc,
           COUNT(*) AS n_candidates,
           CAST(SUM(CASE WHEN agree * 2 >= 24 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_matches,
           CAST(MAX(agree) AS BIGINT) AS best_agree,
           CAST(MAX(agree) * 10000000
                - MAX(agree * 10000000 - index_doc) AS BIGINT)
             AS best_partner
    FROM scored GROUP BY batch_doc
    """


from concurrent_etl_spark.catalog import ORACLES as _ORACLES  # noqa: E402

_ORACLES["dedup_incremental_batch"] = _incremental_oracle()


# ---------------------------------------------------------------------------
# Gopher quality-rule battery (Rae et al. 2021, public paper)
# ---------------------------------------------------------------------------

_GOPHER_STOPWORDS = "'the','be','to','of','and','that','have','with'"


@query(
    "gopher_quality_rules",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, string_split({_fold('text')}, ' ') AS w,
             {_fold('text')} AS t
      FROM documents),
    m AS (
      SELECT doc_id,
             len(w) AS n,
             list_aggregate(list_transform(w, x -> len(x)), 'sum')
               AS sumlen,
             len(list_filter(w, x -> regexp_matches(x, '[a-z]')))
               AS n_alpha,
             len(list_intersect(list_distinct(w),
                 [{_GOPHER_STOPWORDS}])) AS n_sw,
             (len(t) - len(replace(t, '#', '')))
               + (len(t) - len(replace(t, '...', ''))) // 3 AS n_sym
      FROM d),
    r AS (
      SELECT doc_id,
             CASE WHEN n >= 50 AND n <= 100000 THEN 1 ELSE 0 END AS r1,
             CASE WHEN 3 * n <= sumlen AND sumlen <= 10 * n
                  THEN 1 ELSE 0 END AS r2,
             CASE WHEN n_sw >= 1 THEN 1 ELSE 0 END AS r3,
             CASE WHEN 5 * n_alpha >= 4 * n THEN 1 ELSE 0 END AS r4,
             CASE WHEN 10 * n_sym <= n THEN 1 ELSE 0 END AS r5
      FROM m),
    u AS (
      SELECT 'word_count_50_100k' AS rule, r1 AS pass FROM r
      UNION ALL SELECT 'mean_word_len_3_10', r2 FROM r
      UNION ALL SELECT 'stopword_present', r3 FROM r
      UNION ALL SELECT 'alpha_word_frac_80', r4 FROM r
      UNION ALL SELECT 'symbol_ratio_10', r5 FROM r
      UNION ALL SELECT 'all_rules', r1 * r2 * r3 * r4 * r5 FROM r)
    SELECT rule,
           CAST(SUM(pass) AS BIGINT) AS n_pass,
           CAST(COUNT(*) - SUM(pass) AS BIGINT) AS n_fail
    FROM u GROUP BY rule
    """,
)
def q_gopher_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Gopher quality-rule battery (Rae et al. 2021): per-rule
    corpus pass/fail counts for word-count bounds, mean word length,
    stopword presence (threshold adapted 2 -> 1: the synthetic
    corpus draws from a vocabulary where no document carries two of
    the eight Gopher stopwords), alphabetic-word fraction, and
    symbol-to-word ratio, plus the all-rules conjunction — the
    filter-rate dashboard consulted before committing a 100 TB sweep
    to these thresholds.

    Every ratio rule is cross-multiplied into integer comparisons
    (3n <= sumlen, 5*n_alpha >= 4n, 10*n_sym <= n): no division, no
    float drift, bit-identical across engines and partitionings.
    Plan: ONE corpus scan, all five rules evaluated per row inside
    codegen, a 6-way stack (no re-scan per rule), one vocabulary-
    free map-side-combinable agg. At 100 TB: a single linear pass.
    """
    docs = _docs(spark, sf_dir)
    w = F.split(T.ascii_fold("text"), " ")
    t = T.ascii_fold("text")
    m = docs.select(
        F.size(w).alias("n"),
        F.aggregate(
            F.transform(w, lambda x: F.length(x)),
            F.lit(0),
            lambda a, x: a + x,
        ).alias("sumlen"),
        F.size(F.filter(w, lambda x: x.rlike("[a-z]"))).alias("n_alpha"),
        F.size(
            F.array_intersect(
                F.array_distinct(w),
                F.array(*[F.lit(s.strip("'")) for s in _GOPHER_STOPWORDS.split(",")]),
            )
        ).alias("n_sw"),
        (
            (F.length(t) - F.length(F.replace(t, F.lit("#"), F.lit(""))))
            + (
                F.length(t)
                - F.length(F.replace(t, F.lit("..."), F.lit("")))
            )
            / 3
        ).cast("long").alias("n_sym"),
    )
    r = m.select(
        ((F.col("n") >= 50) & (F.col("n") <= 100000)).cast("int").alias("r1"),
        (
            (3 * F.col("n") <= F.col("sumlen"))
            & (F.col("sumlen") <= 10 * F.col("n"))
        ).cast("int").alias("r2"),
        (F.col("n_sw") >= 1).cast("int").alias("r3"),
        (5 * F.col("n_alpha") >= 4 * F.col("n")).cast("int").alias("r4"),
        (10 * F.col("n_sym") <= F.col("n")).cast("int").alias("r5"),
    )
    u = r.selectExpr(
        "stack(6, "
        "'word_count_50_100k', r1, "
        "'mean_word_len_3_10', r2, "
        "'stopword_present', r3, "
        "'alpha_word_frac_80', r4, "
        "'symbol_ratio_10', r5, "
        "'all_rules', r1 * r2 * r3 * r4 * r5) AS (rule, pass)"
    )
    return u.groupBy("rule").agg(
        F.sum("pass").cast("bigint").alias("n_pass"),
        (F.count(F.lit(1)) - F.sum("pass")).cast("bigint").alias("n_fail"),
    )


# ---------------------------------------------------------------------------
# CCNet-style per-language perplexity buckets (Wenzek et al. 2020)
# ---------------------------------------------------------------------------

@query(
    "ccnet_perplexity_buckets",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest({_tok(_FOLD)}) AS t FROM documents),
    vocab AS (SELECT t, COUNT(*) AS c FROM tok GROUP BY t),
    tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n, COUNT(*) AS v FROM vocab),
    lp AS (
      SELECT vocab.t,
             CAST(round(ln((vocab.c + 1.0) / (tot.n + tot.v)), 12)
                  AS DECIMAL(24,12)) AS lp
      FROM vocab, tot),
    scored AS (
      SELECT tok.doc_id, COUNT(*) AS n_tok,
             CAST(SUM(lp.lp) AS DECIMAL(38,12)) AS sum_lp
      FROM tok JOIN lp ON tok.t = lp.t
      GROUP BY tok.doc_id),
    s AS (
      SELECT d.lang, scored.doc_id,
             CAST(-(CAST(sum_lp AS DOUBLE)) / n_tok AS DOUBLE) AS score
      FROM scored JOIN documents d ON d.doc_id = scored.doc_id),
    ranked AS (
      SELECT lang, doc_id, score,
             row_number() OVER (PARTITION BY lang
                                ORDER BY score, doc_id) AS rnk,
             COUNT(*) OVER (PARTITION BY lang) AS n
      FROM s)
    SELECT lang,
           CASE (3 * (rnk - 1)) // n WHEN 0 THEN 'head'
                WHEN 1 THEN 'middle' ELSE 'tail' END AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           MIN(score) AS min_score,
           MAX(score) AS max_score
    FROM ranked GROUP BY 1, 2
    """,
)
def q_ccnet_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet's head/middle/tail split (Wenzek et al. 2020, public):
    per LANGUAGE, rank documents by unigram-LM perplexity proxy and
    cut into terciles — 'head' is the most-fluent third that
    pretraining keeps preferentially, and the per-bucket score
    boundaries are the thresholds a 100 TB sweep would then apply
    stream-side without re-ranking.

    Determinism: the score inherits unigram_logprob_quality's
    contract (12-decimal-quantized log-probs, DECIMAL sums, one
    exact IEEE divide — bit-identical across engines), ranking ties
    break on doc_id, and the tercile cut is integer arithmetic
    (3*(rank-1)) div n, NOT ntile() (whose remainder placement is a
    cross-engine hazard). Plan: vocabulary-sized broadcast model,
    one doc-level agg, one partitioned window per language — no
    global sort.
    """
    docs = _docs(spark, sf_dir)
    tok = docs.select(
        "doc_id", F.explode(T.tokens(T.ascii_fold("text"))).alias("t")
    )
    vocab = tok.groupBy("t").agg(F.count("*").alias("c"))
    tot = vocab.agg(
        F.sum("c").cast("bigint").alias("n"), F.count("*").alias("v")
    )
    lp = vocab.crossJoin(F.broadcast(tot)).select(
        "t",
        F.round(
            F.log((F.col("c") + F.lit(1.0)) / (F.col("n") + F.col("v"))), 12
        )
        .cast("decimal(24,12)")
        .alias("lp"),
    )
    scored = (
        # broadcast-ok: unigram LM — model side by design (see SCALE.md unigram_logprob_quality row)
        tok.join(F.broadcast(lp), "t")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tok"),
            F.sum("lp").cast("decimal(38,12)").alias("sum_lp"),
        )
        .select(
            "doc_id",
            (-(F.col("sum_lp").cast("double")) / F.col("n_tok"))
            .cast("double")
            .alias("score"),
        )
    )
    s = scored.join(docs.select("doc_id", "lang"), "doc_id")
    wl = Window.partitionBy("lang")
    ranked = s.select(
        "lang",
        "score",
        F.row_number().over(wl.orderBy("score", "doc_id")).alias("rnk"),
        F.count(F.lit(1)).over(wl).alias("n"),
    )
    bucket_ix = F.floor((3 * (F.col("rnk") - 1)) / F.col("n"))
    return (
        ranked.select(
            "lang",
            "score",
            F.when(bucket_ix == 0, "head")
            .when(bucket_ix == 1, "middle")
            .otherwise("tail")
            .alias("bucket"),
        )
        .groupBy("lang", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("score").alias("min_score"),
            F.max("score").alias("max_score"),
        )
    )


# ---------------------------------------------------------------------------
# URL / domain curation (parse_url surface)
# ---------------------------------------------------------------------------

@query(
    "url_domain_curation",
    oracle="""
    WITH d AS (
      SELECT 'https://' || source || '-' || (doc_id % 7)
               || '.example.'
               || CASE doc_id % 3 WHEN 0 THEN 'com'
                                  WHEN 1 THEN 'org'
                                  ELSE 'biz' END
               || '/' || lang || '/doc-' || doc_id
               || '?ref=r' || (doc_id % 5) || '&v=2' AS url,
             n_chars
      FROM documents),
    p AS (
      SELECT regexp_extract(url, '^https://([^/]+)', 1) AS host,
             regexp_extract(url, '^https://[^/]+([^?]*)', 1) AS path,
             regexp_extract(url, '[?&]ref=([^&]*)', 1) AS ref,
             n_chars
      FROM d),
    e AS (
      SELECT host,
             regexp_extract(host, '\\.([a-z]+)$', 1) AS tld,
             string_split(path, '/')[2] AS path_lang,
             ref, n_chars
      FROM p)
    SELECT host, tld,
           CASE WHEN tld = 'biz' THEN FALSE ELSE TRUE END AS kept,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT path_lang) AS BIGINT) AS n_langs,
           CAST(COUNT(DISTINCT ref) AS BIGINT) AS n_refs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM e GROUP BY host, tld
    """,
)
def q_url_domain_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Web-corpus domain curation through Spark's ``parse_url``:
    deterministic per-document URLs (the corpus has no real ones) are
    DECOMPOSED by the JVM-side java.net URL parser — HOST, PATH, and
    a keyed QUERY parameter — then rolled up per host with a
    TLD-blocklist keep/drop flag, per-host doc/lang/ref cardinalities
    and byte mass. This is the domain-level triage every web-scale
    pretraining sweep runs before content-level filters (blocklists,
    per-domain caps, host-level dedup all key on exactly these
    columns); the oracle reproduces the decomposition with anchored
    regexes, so the hash also pins parse_url's component semantics.

    Beyond the reference (its sources are xlsx/JDBC rows, no web
    provenance — case_2/Normal.py:100-140). Plan: one linear scan,
    all parsing inside codegen (parse_url is a builtin, zero Python),
    one hash agg on host — at 100 TB the host key is Zipf-skewed in
    real crawls, which is exactly what the repo's salting/AQE-skew
    machinery (salted_skew_join, skew_diagnostics) exists for; the
    curation roll-up itself stays one map-side-combinable shuffle.
    """
    docs = _docs(spark, sf_dir)
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit("-"),
        (F.col("doc_id") % 7).cast("string"),
        F.lit(".example."),
        F.when(F.col("doc_id") % 3 == 0, "com")
        .when(F.col("doc_id") % 3 == 1, "org")
        .otherwise("biz"),
        F.lit("/"),
        F.col("lang"),
        F.lit("/doc-"),
        F.col("doc_id").cast("string"),
        F.lit("?ref=r"),
        (F.col("doc_id") % 5).cast("string"),
        F.lit("&v=2"),
    )
    d = docs.select(url.alias("url"), "n_chars")
    p = d.select(
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY"), F.lit("ref")).alias("ref"),
        "n_chars",
    )
    e = p.select(
        "host",
        F.regexp_extract("host", r"\.([a-z]+)$", 1).alias("tld"),
        F.split("path", "/").getItem(1).alias("path_lang"),
        "ref",
        "n_chars",
    )
    return (
        e.groupBy("host", "tld")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("path_lang").alias("n_langs"),
            F.countDistinct("ref").alias("n_refs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
        .select(
            "host",
            "tld",
            (F.col("tld") != "biz").alias("kept"),
            "n_docs",
            "n_langs",
            "n_refs",
            "total_chars",
        )
    )
