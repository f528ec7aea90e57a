"""LLM training-data pipeline queries, tranche 6: line-grain curation
and tokenizer-training statistics.

Beyond-the-reference surface (the reference at ``/root/reference`` has
no text-curation layer; its closest analogue is row-level filtering,
case_2/Normal.py:203). These are the published line-grain passes a
pretraining pipeline runs before/alongside document-level dedup:

* CCNet line-level dedup (Wenzek et al., "CCNet: Extracting High
  Quality Monolingual Datasets from Web Crawl Data", 2020 — public
  paper): hash every LINE of every document, count how many distinct
  documents each line hash appears in corpus-wide, and drop lines
  that appear in more than one document — the pass that strips
  navigation bars, cookie banners and boilerplate that document-level
  MinHash cannot see (the surrounding document is unique).
* C4-style line-filter cascade (Raffel et al., "Exploring the Limits
  of Transfer Learning with a Unified Text-to-Text Transformer",
  2020 — public paper, §2.2): per-line rules (minimum word count, no
  curly brace, no "javascript", no "lorem ipsum"), then a document
  retention rule (keep documents with >= 3 surviving lines).
* BPE merge-candidate counting (Sennrich et al., "Neural Machine
  Translation of Rare Words with Subword Units", 2016 — public
  paper): the inner statistic of BPE tokenizer training — adjacent
  symbol-pair frequencies over the word-frequency table; the
  top-count pair is the next merge.

The synthetic documents are single-line word streams, so "lines" are
derived deterministically as fixed windows of ``_LINE_W`` consecutive
tokens — the same pseudo-structure convention the chunking queries
use. Duplicate lines are guaranteed by the repo's standard injected
corpus (exact copies of doc_id < 40 re-keyed at +100000); the C4
corpus additionally injects four eight-token documents that each trip
exactly one literal rule.

Determinism: every output value is an integer count (DuckDB integer
SUM returns HUGEINT — final projections CAST to BIGINT per the repo
convention); line hashes are md5 over the canonical space-joined
token window, identical in both engines; top-k ties break on the
pair/line string.

Scale notes (100 TB): line construction is array-native per document
(no explode-then-regroup shuffle; a collect_list regroup would also
need an explicit sort to be deterministic). CCNet dedup is two
shuffles: one groupBy(line_hash) to count, one join of the dup-line
set back onto the line stream — the dup set is a small fraction of
all lines and AQE will broadcast it when it fits; per-doc stats are a
third map-side-combinable agg. The C4 cascade is one linear scan plus
two one-row aggregates. BPE counting aggregates pairs over the
DISTINCT-WORD table (vocabulary-sized, not corpus-sized) weighted by
word frequency — the corpus-sized work is the single word-count
shuffle; the pair fan-out is bounded by vocabulary * max word length.
"""

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from concurrent_etl_spark.catalog import query
from concurrent_etl_spark.engine import load_table
from concurrent_etl_spark.operators import similarity as S
from concurrent_etl_spark.operators.text import ascii_fold, tokens
from concurrent_etl_spark.queries_llm import _FOLD, _docs, _fold, _oracle_cos, _tok

#: tokens per derived line. 8 keeps multi-line documents at sf0.001
#: (docs run ~25-110 tokens) while making natural 8-gram collisions
#: essentially impossible — every duplicate line comes from the
#: injected exact-copy docs, so the expected answer is auditable.
_LINE_W = 8

#: DuckDB line-array expression over a token-list expression.
#: DuckDB ``//`` (not ``/``) — integer ``/`` returns DOUBLE and CAST
#: rounds half-even rather than flooring; numerator is nonnegative so
#: ``//`` matches Spark's ``div`` exactly.
_LINES_SQL = (
    f"list_transform(range(0, (len(tk) + {_LINE_W - 1}) // {_LINE_W}), "
    f"i -> array_to_string(list_slice(tk, i * {_LINE_W} + 1, i * {_LINE_W} + {_LINE_W}), ' '))"
)


def _doc_lines(spark: SparkSession, sf_dir: str, extra=None) -> DataFrame:
    """(doc_id, line_no, line, n_words) — fixed token windows per doc.

    Array-native: slice the staged token array with transform over a
    sequence, then ONE posexplode — no groupBy to reassemble lines.
    """
    base = _docs(spark, sf_dir).select("doc_id", "text")
    if extra is not None:
        base = base.unionByName(extra)
    t = base.select("doc_id", tokens("text").alias("tk")).filter(
        F.size("tk") > 0
    )
    lines = t.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(
                    F.lit(0),
                    F.expr(f"(size(tk) + {_LINE_W - 1}) div {_LINE_W}") - 1,
                ),
                lambda i: F.array_join(
                    F.slice(F.col("tk"), i * _LINE_W + 1, _LINE_W), " "
                ),
            )
        ).alias("line_no", "line"),
    )
    return lines.withColumn("n_words", F.size(tokens("line")))


@query(
    "line_dedup_ccnet",
    oracle=f"""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id < 40
    ),
    tk AS (SELECT doc_id, {_tok('text')} AS tk FROM corpus),
    lines AS (
      SELECT doc_id, u.line,
             len({_tok('u.line')}) AS n_words
      FROM tk, unnest({_LINES_SQL}) AS u(line)
    ),
    freq AS (
      SELECT md5(line) AS line_hash,
             COUNT(DISTINCT doc_id) AS n_docs
      FROM lines GROUP BY md5(line)
    )
    SELECT l.doc_id,
           COUNT(*) AS n_lines,
           CAST(COUNT(*) FILTER (WHERE f.n_docs = 1) AS BIGINT) AS kept_lines,
           CAST(COALESCE(SUM(l.n_words) FILTER (WHERE f.n_docs = 1), 0) AS BIGINT)
             AS kept_tokens
    FROM lines l JOIN freq f ON md5(l.line) = f.line_hash
    GROUP BY l.doc_id
    """,
)
def q_line_dedup_ccnet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet line dedup: drop lines appearing in >1 document.

    Per-doc retention stats over the injected-duplicate corpus: the
    40 copied docs (and their originals) lose every line; unique docs
    keep all of theirs. Two shuffles (line-hash count, join back) plus
    a map-side-combinable doc rollup — at 100 TB the dup-line side of
    the join is the small side and AQE broadcast-joins it.
    """
    docs = _docs(spark, sf_dir)
    extra = docs.filter(F.col("doc_id") < 40).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    lines = _doc_lines(spark, sf_dir, extra=extra).withColumn(
        "line_hash", F.md5("line")
    )
    freq = lines.groupBy("line_hash").agg(
        F.countDistinct("doc_id").alias("n_docs")
    )
    kept = F.col("n_docs") == 1
    return (
        lines.join(freq, "line_hash")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(kept.cast("long")).alias("kept_lines"),
            F.sum(F.when(kept, F.col("n_words")).otherwise(0)).alias(
                "kept_tokens"
            ),
        )
    )


#: injected C4 probe docs: one eight-token line each, tripping exactly
#: one literal rule (curly brace / javascript / lorem ipsum) plus one
#: two-token doc for the minimum-word-count rule.
_C4_PROBES = [
    (200001, "function window var brace { code block end"),
    (200002, "please enable javascript to view this page now"),
    (200003, "lorem ipsum dolor sit amet consectetur adipiscing elit"),
    (200004, "tiny line"),
]
_C4_PROBES_SQL = ", ".join(f"({i}, '{t}')" for i, t in _C4_PROBES)


@query(
    "c4_line_filters",
    oracle=f"""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT * FROM (VALUES {_C4_PROBES_SQL}) probes(doc_id, text)
    ),
    tk AS (SELECT doc_id, {_tok('text')} AS tk FROM corpus),
    lines AS (
      SELECT doc_id, u.line, len({_tok('u.line')}) AS n_words
      FROM tk, unnest({_LINES_SQL}) AS u(line)
    ),
    flagged AS (
      SELECT doc_id, n_words,
             (n_words < 5)                              AS f_short,
             contains(line, '{{')                       AS f_brace,
             contains({_fold('line')}, 'javascript')        AS f_js,
             contains({_fold('line')}, 'lorem ipsum')       AS f_lorem
      FROM lines
    ),
    l AS (
      SELECT *, NOT (f_short OR f_brace OR f_js OR f_lorem) AS kept
      FROM flagged
    ),
    line_agg AS (
      SELECT COUNT(*) AS lines_total,
             CAST(COUNT(*) FILTER (WHERE f_short) AS BIGINT) AS lines_short,
             CAST(COUNT(*) FILTER (WHERE f_brace) AS BIGINT) AS lines_brace,
             CAST(COUNT(*) FILTER (WHERE f_js) AS BIGINT) AS lines_javascript,
             CAST(COUNT(*) FILTER (WHERE f_lorem) AS BIGINT) AS lines_lorem,
             CAST(COUNT(*) FILTER (WHERE kept) AS BIGINT) AS lines_kept
      FROM l
    ),
    per_doc AS (
      SELECT doc_id,
             COUNT(*) FILTER (WHERE kept) AS k,
             COALESCE(SUM(n_words) FILTER (WHERE kept), 0) AS tk_kept
      FROM l GROUP BY doc_id
    ),
    doc_agg AS (
      SELECT COUNT(*) AS docs_total,
             CAST(COUNT(*) FILTER (WHERE k >= 3) AS BIGINT) AS docs_kept,
             CAST(COALESCE(SUM(tk_kept) FILTER (WHERE k >= 3), 0) AS BIGINT)
               AS tokens_kept
      FROM per_doc
    )
    SELECT metric, value FROM (
      SELECT 'lines_total' AS metric, lines_total AS value FROM line_agg
      UNION ALL SELECT 'lines_short', lines_short FROM line_agg
      UNION ALL SELECT 'lines_brace', lines_brace FROM line_agg
      UNION ALL SELECT 'lines_javascript', lines_javascript FROM line_agg
      UNION ALL SELECT 'lines_lorem', lines_lorem FROM line_agg
      UNION ALL SELECT 'lines_kept', lines_kept FROM line_agg
      UNION ALL SELECT 'docs_total', docs_total FROM doc_agg
      UNION ALL SELECT 'docs_kept', docs_kept FROM doc_agg
      UNION ALL SELECT 'tokens_kept', tokens_kept FROM doc_agg
    )
    """,
)
def q_c4_line_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 §2.2 line-filter cascade + >=3-surviving-lines doc rule.

    One linear scan computes the per-line rule flags; the dashboard is
    two one-row aggregates (line grain, doc grain) cross-joined and
    unpivoted with stack() — no corpus-sized shuffle beyond the doc
    rollup. The four injected probe docs make every literal C4 rule
    fire at least once, so the counts are auditable.
    """
    extra = spark.createDataFrame(_C4_PROBES, "doc_id: long, text: string")
    l = _doc_lines(spark, sf_dir, extra=extra).select(
        "doc_id",
        "n_words",
        (F.col("n_words") < 5).alias("f_short"),
        F.col("line").contains("{").alias("f_brace"),
        ascii_fold("line").contains("javascript").alias("f_js"),
        ascii_fold("line").contains("lorem ipsum").alias("f_lorem"),
    )
    l = l.withColumn(
        "kept", ~(F.col("f_short") | F.col("f_brace") | F.col("f_js") | F.col("f_lorem"))
    )
    cnt = lambda c: F.sum(F.col(c).cast("long"))  # noqa: E731
    line_agg = l.agg(
        F.count(F.lit(1)).alias("lines_total"),
        cnt("f_short").alias("lines_short"),
        cnt("f_brace").alias("lines_brace"),
        cnt("f_js").alias("lines_javascript"),
        cnt("f_lorem").alias("lines_lorem"),
        cnt("kept").alias("lines_kept"),
    )
    per_doc = l.groupBy("doc_id").agg(
        F.sum(F.col("kept").cast("long")).alias("k"),
        F.sum(F.when(F.col("kept"), F.col("n_words")).otherwise(0)).alias(
            "tk_kept"
        ),
    )
    doc_agg = per_doc.agg(
        F.count(F.lit(1)).alias("docs_total"),
        F.sum((F.col("k") >= 3).cast("long")).alias("docs_kept"),
        F.sum(F.when(F.col("k") >= 3, F.col("tk_kept")).otherwise(0)).alias(
            "tokens_kept"
        ),
    )
    return line_agg.crossJoin(F.broadcast(doc_agg)).select(
        F.expr(
            "stack(9, "
            "'lines_total', lines_total, 'lines_short', lines_short, "
            "'lines_brace', lines_brace, 'lines_javascript', lines_javascript, "
            "'lines_lorem', lines_lorem, 'lines_kept', lines_kept, "
            "'docs_total', docs_total, 'docs_kept', docs_kept, "
            "'tokens_kept', tokens_kept) AS (metric, value)"
        )
    )


@query(
    "bpe_merge_candidates",
    oracle=f"""
    WITH tok AS (
      SELECT u.token FROM documents, unnest({_tok(_FOLD)}) AS u(token)
    ),
    words AS (SELECT token AS word, COUNT(*) AS n FROM tok GROUP BY token),
    pairs AS (
      SELECT substr(word, CAST(i AS INT), 2) AS pair, n
      FROM words, unnest(range(1, length(word))) AS g(i)
      WHERE length(word) >= 2
    )
    SELECT pair, CAST(SUM(n) AS BIGINT) AS pair_count
    FROM pairs GROUP BY pair
    ORDER BY pair_count DESC, pair
    LIMIT 30
    """,
)
def q_bpe_merge_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE training inner loop: adjacent char-pair counts, top 30.

    The corpus-sized work is one word-count shuffle; pair generation
    then runs over the DISTINCT-word table (vocabulary-sized) weighted
    by frequency — exactly how BPE trainers avoid rescanning the
    corpus per merge. Top-k is a TakeOrdered, tie-broken on the pair.
    """
    docs = _docs(spark, sf_dir)
    words = (
        docs.select(F.explode(tokens(ascii_fold("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    pairs = (
        words.filter(F.length("word") >= 2)
        .select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.length("word") - 1),
                    lambda i: F.col("word").substr(i, F.lit(2)),
                )
            ).alias("pair"),
            "n",
        )
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("n").alias("pair_count"))
        .orderBy(F.desc("pair_count"), "pair")
        .limit(30)
    )


# ---------------------------------------------------------------------------
# hybrid retrieval + ranking evaluation
# ---------------------------------------------------------------------------

#: RRF constant (Cormack et al., 2009 — the published default).
_RRF_K = 60
#: per-ranker candidate depth and fused result depth.
_RRF_DEPTH, _RRF_TOPK = 50, 10

#: shared oracle core: the docs∩embeddings base, the 3 query docs,
#: the sparse (token-Jaccard) and dense (cosine) rankings, and the
#: RRF-fused ranking. ``rrf_hybrid_retrieval`` projects the fused
#: top-k; ``retrieval_eval_ndcg`` scores all three rankers against
#: label relevance.
_RRF_CORE_SQL = f"""d AS (
      SELECT doc_id, list_distinct({_tok(_FOLD)}) AS tk FROM documents
    ),
    e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    base AS (
      SELECT d.doc_id AS id, d.tk, e.v FROM d JOIN e ON d.doc_id = e.vec_id
    ),
    q AS (SELECT id AS query_id, tk AS qtk, v AS qv FROM base WHERE id < 3),
    sp AS (
      SELECT q.query_id, b.id AS cand_id,
             len(list_intersect(b.tk, q.qtk)) * 1.0
               / greatest(len(list_distinct(b.tk || q.qtk)), 1) AS jac
      FROM base b CROSS JOIN q WHERE b.id <> q.query_id
    ),
    spr AS (
      SELECT query_id, cand_id,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY jac DESC, cand_id) AS sparse_rank
      FROM sp QUALIFY sparse_rank <= {_RRF_DEPTH}
    ),
    dn AS (
      SELECT q.query_id, b.id AS cand_id,
             {_oracle_cos('q.qv', 'b.v')} AS cos_sim
      FROM base b CROSS JOIN q WHERE b.id <> q.query_id
    ),
    dnr AS (
      SELECT query_id, cand_id,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cos_sim DESC, cand_id) AS dense_rank
      FROM dn QUALIFY dense_rank <= {_RRF_DEPTH}
    ),
    fused AS (
      SELECT query_id, cand_id, s.sparse_rank, n.dense_rank,
             COALESCE(CAST(round(1.0 / ({_RRF_K} + s.sparse_rank), 12)
                           AS DECIMAL(24,12)), 0)
             + COALESCE(CAST(round(1.0 / ({_RRF_K} + n.dense_rank), 12)
                             AS DECIMAL(24,12)), 0) AS rrf_dec
      FROM spr s FULL JOIN dnr n USING (query_id, cand_id)
    ),
    fused_ranked AS (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY rrf_dec DESC, cand_id) AS fr
      FROM fused
    )"""


def _rrf_frames(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Spark twin of ``_RRF_CORE_SQL``: returns the base corpus, the
    query side, both depth-50 rankings, and the fused ranking."""
    docs = _docs(spark, sf_dir).select(
        "doc_id", F.array_distinct(tokens(ascii_fold("text"))).alias("tk")
    )
    emb = load_table(spark, sf_dir, "embeddings")
    base = docs.join(
        emb.select(F.col("vec_id").alias("doc_id"), "embedding"), "doc_id"
    )
    q = base.where(F.col("doc_id") < 3).select(
        F.col("doc_id").alias("query_id"),
        F.col("tk").alias("qtk"),
        F.col("embedding").alias("qemb"),
    )

    sp = (
        # broadcast-ok: fixed 3-query probe set (doc_id < 3)
        base.crossJoin(F.broadcast(q))
        .where(F.col("doc_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("doc_id").alias("cand_id"),
            # greatest(...,1): two empty token sets define jac = 0
            # (the MMR zero-union idiom), never a division by zero
            (
                F.size(F.array_intersect("tk", "qtk")).cast("double")
                / F.greatest(F.size(F.array_union("tk", "qtk")), F.lit(1))
            ).alias("jac"),
        )
    )
    w_s = Window.partitionBy("query_id").orderBy(F.desc("jac"), "cand_id")
    spr = (
        sp.withColumn("sparse_rank", F.row_number().over(w_s))
        .where(F.col("sparse_rank") <= _RRF_DEPTH)
        .select("query_id", "cand_id", "sparse_rank")
    )

    dnr = S.brute_force_topk(
        base.select(F.col("doc_id").alias("vec_id"), "embedding"),
        q.select(F.col("query_id").alias("vec_id"), F.col("qemb").alias("embedding")),
        k=_RRF_DEPTH,
    ).select(
        "query_id",
        F.col("neighbor_id").alias("cand_id"),
        F.col("rank").alias("dense_rank"),
    )

    contrib = lambda r: F.coalesce(  # noqa: E731
        F.round(F.lit(1.0) / (F.lit(_RRF_K) + F.col(r)), 12).cast(
            "decimal(24,12)"
        ),
        F.lit(0).cast("decimal(24,12)"),
    )
    fused = spr.join(dnr, ["query_id", "cand_id"], "full").withColumn(
        "rrf_dec", contrib("sparse_rank") + contrib("dense_rank")
    )
    w_f = Window.partitionBy("query_id").orderBy(F.desc("rrf_dec"), "cand_id")
    fused_ranked = fused.withColumn("fr", F.row_number().over(w_f))
    return {"base": base, "q": q, "spr": spr, "dnr": dnr, "fused": fused_ranked}


@query(
    "rrf_hybrid_retrieval",
    oracle=f"""
    WITH {_RRF_CORE_SQL}
    SELECT query_id, cand_id,
           CAST(sparse_rank AS INTEGER) AS sparse_rank,
           CAST(dense_rank AS INTEGER) AS dense_rank,
           round(CAST(rrf_dec AS DOUBLE), 6) AS rrf_score,
           CAST(fr AS INTEGER) AS fused_rank
    FROM fused_ranked WHERE fr <= {_RRF_TOPK}
    """,
)
def q_rrf_hybrid_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval with reciprocal-rank fusion (Cormack et al.,
    2009): a sparse ranker (token-set Jaccard vs the query document)
    and a dense ranker (embedding cosine) each produce a top-50 list
    per query; RRF fuses them as sum(1 / (60 + rank)) and the fused
    top-10 is returned — the standard first-stage of a modern RAG /
    contamination-triage stack, fusing the two retrievers this
    catalog already implements (``bm25_retrieval_topk``,
    ``ann_topk_cosine``).

    Determinism: ranks are integers with doc-id tiebreaks; each RRF
    contribution rounds to 12 dp into DECIMAL(24,12) before the sum
    (the repo's float-sum convention), so fusion order cannot matter.

    Shape at 100 TB: the 3-query side broadcasts against the corpus
    (query-sized cross join, corpus streams once per ranker); each
    ranker's top-k is a window PARTITIONED on query_id (never
    global); fusion joins two query_id-keyed top-50 lists — tiny.
    """
    fr = _rrf_frames(spark, sf_dir)["fused"]
    return fr.where(F.col("fr") <= _RRF_TOPK).select(
        "query_id",
        "cand_id",
        F.col("sparse_rank").cast("int").alias("sparse_rank"),
        F.col("dense_rank").cast("int").alias("dense_rank"),
        F.round(F.col("rrf_dec").cast("double"), 6).alias("rrf_score"),
        F.col("fr").cast("int").alias("fused_rank"),
    )


def _dec_case(col: str, mapping: dict[int, str], default: str = "0") -> str:
    """CASE expression mapping an integer column to DECIMAL(24,12)
    literals — identical text runs on Spark (F.expr) and DuckDB, so
    every transcendental (log2 discounts, reciprocal ranks) enters
    BOTH engines as the same pre-computed literal and cross-engine
    float drift is impossible by construction."""
    whens = " ".join(
        f"WHEN {k} THEN CAST('{v}' AS DECIMAL(24,12))"
        for k, v in sorted(mapping.items())
    )
    return (
        f"CASE {col} {whens} ELSE CAST('{default}' AS DECIMAL(24,12)) END"
    )


def _eval_literals() -> tuple[dict[int, str], dict[int, str], dict[int, str]]:
    import math
    from decimal import Decimal

    disc = {
        i: f"{round(1.0 / math.log2(i + 1), 12):.12f}"
        for i in range(1, _RRF_TOPK + 1)
    }
    cum: dict[int, str] = {}
    acc = Decimal(0)
    for i in range(1, _RRF_TOPK + 1):
        acc += Decimal(disc[i])
        cum[i] = str(acc)
    mrr = {i: f"{round(1.0 / i, 12):.12f}" for i in range(1, _RRF_TOPK + 1)}
    return disc, cum, mrr


_DISC, _CUM, _MRR = _eval_literals()


@query(
    "retrieval_eval_ndcg",
    oracle=f"""
    WITH {_RRF_CORE_SQL},
    rankings AS (
      SELECT query_id, cand_id, 'sparse' AS ranker, sparse_rank AS rk
      FROM spr WHERE sparse_rank <= {_RRF_TOPK}
      UNION ALL
      SELECT query_id, cand_id, 'dense', dense_rank
      FROM dnr WHERE dense_rank <= {_RRF_TOPK}
      UNION ALL
      SELECT query_id, cand_id, 'fused', fr
      FROM fused_ranked WHERE fr <= {_RRF_TOPK}
    ),
    lab AS (SELECT vec_id AS id, label FROM embeddings),
    qlab AS (
      SELECT q.query_id, lab.label AS qlabel
      FROM q JOIN lab ON q.query_id = lab.id
    ),
    nrel AS (
      SELECT ql.query_id, CAST(COUNT(*) AS BIGINT) AS n_rel
      FROM base b JOIN lab lb ON b.id = lb.id
                  JOIN qlab ql ON lb.label = ql.qlabel
      WHERE b.id <> ql.query_id
      GROUP BY ql.query_id
    ),
    scored AS (
      SELECT r.query_id, r.ranker, r.rk,
             CASE WHEN lb.label = ql.qlabel THEN 1 ELSE 0 END AS rel
      FROM rankings r
      JOIN lab lb ON r.cand_id = lb.id
      JOIN qlab ql ON r.query_id = ql.query_id
    ),
    m AS (
      SELECT query_id, ranker,
             CAST(SUM(rel) AS BIGINT) AS rel_in_topk,
             SUM(CASE WHEN rel = 1
                      THEN {_dec_case('rk', _DISC)}
                      ELSE CAST('0' AS DECIMAL(24,12)) END) AS dcg_dec,
             COALESCE(MAX(CASE WHEN rel = 1
                               THEN {_dec_case('rk', _MRR)} END),
                      CAST('0' AS DECIMAL(24,12))) AS mrr_dec
      FROM scored GROUP BY query_id, ranker
    )
    SELECT m.query_id, m.ranker, n.n_rel, m.rel_in_topk,
           round(m.rel_in_topk / 10.0, 6) AS prec_at_10,
           round(CAST(m.mrr_dec AS DOUBLE), 6) AS mrr,
           round(CAST(m.dcg_dec AS DOUBLE)
                 / CAST({_dec_case(f'LEAST(n.n_rel, {_RRF_TOPK})', _CUM, '1')}
                        AS DOUBLE), 6) AS ndcg
    FROM m JOIN nrel n ON m.query_id = n.query_id
    """,
)
def q_retrieval_eval_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IR-metric evaluation of the three retrievers — precision@10,
    MRR and nDCG@10 per (query, ranker), with relevance = shared
    embedding label (the standard labeled-benchmark protocol; TREC's
    binary-relevance formulation). The dashboard a pipeline uses to
    decide WHICH retriever (sparse / dense / fused) curates its
    corpus.

    Every transcendental enters both engines as the same precomputed
    DECIMAL literal (``_dec_case``): DCG position discounts
    1/log2(rank+1), their ideal-DCG prefix sums, and reciprocal
    ranks — so the only floating-point ops are two final divisions of
    identical operands. nDCG divides by the ideal DCG of
    min(n_relevant, 10) positions.

    Shape at 100 TB: rankings are the RRF core's (query-count x 50)
    lists; label joins key on candidate id (broadcast — the label
    side is corpus-sized but arrives pre-filtered to ranked
    candidates); the relevant-pool count is one map-side-combinable
    agg over the base corpus.
    """
    f = _rrf_frames(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    lab = emb.select(F.col("vec_id").alias("id"), "label")
    qlab = (
        f["q"]
        .select("query_id")
        .join(lab, F.col("query_id") == F.col("id"))
        .select("query_id", F.col("label").alias("qlabel"))
    )
    nrel = (
        f["base"]
        .select(F.col("doc_id").alias("id"))
        .join(lab, "id")
        # broadcast-ok: 3-query label set
        .crossJoin(F.broadcast(qlab))
        .where(
            (F.col("label") == F.col("qlabel"))
            & (F.col("id") != F.col("query_id"))
        )
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_rel"))
    )
    rankings = (
        f["spr"]
        .where(F.col("sparse_rank") <= _RRF_TOPK)
        .select(
            "query_id",
            "cand_id",
            F.lit("sparse").alias("ranker"),
            F.col("sparse_rank").alias("rk"),
        )
        .unionByName(
            f["dnr"]
            .where(F.col("dense_rank") <= _RRF_TOPK)
            .select(
                "query_id",
                "cand_id",
                F.lit("dense").alias("ranker"),
                F.col("dense_rank").alias("rk"),
            )
        )
        .unionByName(
            f["fused"]
            .where(F.col("fr") <= _RRF_TOPK)
            .select(
                "query_id",
                "cand_id",
                F.lit("fused").alias("ranker"),
                F.col("fr").alias("rk"),
            )
        )
    )
    scored = (
        # no hint: lab is the full embeddings table — corpus-proportional
        rankings.join((lab), rankings["cand_id"] == lab["id"])
        .drop("id")
        # broadcast-ok: 3-query label set
        .join(F.broadcast(qlab), "query_id")
        .withColumn(
            "rel", (F.col("label") == F.col("qlabel")).cast("int")
        )
    )
    zero = F.expr("CAST('0' AS DECIMAL(24,12))")
    m = scored.groupBy("query_id", "ranker").agg(
        F.sum("rel").cast("bigint").alias("rel_in_topk"),
        F.sum(
            F.when(F.col("rel") == 1, F.expr(_dec_case("rk", _DISC))).otherwise(
                zero
            )
        ).alias("dcg_dec"),
        F.coalesce(
            F.max(F.when(F.col("rel") == 1, F.expr(_dec_case("rk", _MRR)))),
            zero,
        ).alias("mrr_dec"),
    )
    idcg = F.expr(
        _dec_case(f"LEAST(n_rel, {_RRF_TOPK})", _CUM, "1")
    ).cast("double")
    # broadcast-ok: one row per query — 3-query probe set
    return m.join(F.broadcast(nrel), "query_id").select(
        "query_id",
        "ranker",
        "n_rel",
        "rel_in_topk",
        F.round(F.col("rel_in_topk") / 10.0, 6).alias("prec_at_10"),
        F.round(F.col("mrr_dec").cast("double"), 6).alias("mrr"),
        F.round(F.col("dcg_dec").cast("double") / idcg, 6).alias("ndcg"),
    )


#: per-language marker phrases (real high-frequency function words —
#: the signal a char-bigram model keys on) and the shared noise
#: vocabulary mixed into every document regardless of language. The
#: corpus labels in documents.parquet are synthetic-random w.r.t. the
#: text (verified: bigram-vs-lang chi-square ~ dof), so the NB query
#: builds its OWN separable ground truth from doc_id in closed form —
#: the same formula-fixture pattern as audio_zero_crossings.
_NB_LANGS = ["de", "en", "es", "fr", "zh"]
_NB_PHRASES = [
    "der die das und ist nicht ein",
    "the and of to in is that",
    "el la los que y en una con",
    "le les et des une dans par",
    "的一是了我不人在",
]
_NB_NOISE = [
    "data", "row", "key", "scan", "merge", "table", "query", "batch",
]


def _nb_sql_list(items: list[str]) -> str:
    inner = ", ".join("'" + s + "'" for s in items)
    return f"[{inner}]"


@query(
    "naive_bayes_langid",
    oracle=f"""
    WITH d AS (
      SELECT doc_id,
             list_extract({_nb_sql_list(_NB_LANGS)},
                          CAST(doc_id % 5 AS INTEGER) + 1) AS lang,
             list_extract({_nb_sql_list(_NB_PHRASES)},
                          CAST(doc_id % 5 AS INTEGER) + 1)
               || ' ' || list_extract({_nb_sql_list(_NB_NOISE)},
                          CAST((doc_id * 7) % 8 AS INTEGER) + 1)
               || ' ' || list_extract({_nb_sql_list(_NB_NOISE)},
                          CAST((doc_id * 3 + 1) % 8 AS INTEGER) + 1)
               || ' ' || list_extract({_nb_sql_list(_NB_NOISE)},
                          CAST((doc_id * 5 + 2) % 8 AS INTEGER) + 1)
               AS t
      FROM documents WHERE doc_id < 200),
    bg AS (
      SELECT doc_id, lang, substr(t, CAST(i AS INTEGER), 2) AS b
      FROM d, unnest(range(1, length(t))) u(i)),
    docb AS (
      SELECT doc_id, b, CAST(COUNT(*) AS BIGINT) AS c FROM bg
      GROUP BY 1, 2),
    cnt AS (
      SELECT lang, b, CAST(COUNT(*) AS BIGINT) AS c FROM bg
      GROUP BY 1, 2),
    nl AS (SELECT lang, CAST(SUM(c) AS BIGINT) AS n_l FROM cnt GROUP BY 1),
    vocab AS (SELECT DISTINCT b FROM bg),
    vsz AS (SELECT CAST(COUNT(*) AS BIGINT) AS v FROM vocab),
    prior AS (
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs FROM d GROUP BY 1),
    ndoc AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd FROM d),
    grid AS (
      SELECT nl.lang, vocab.b,
             CAST(CAST(round(ln(CAST(COALESCE(cnt.c, 0) + 1 AS DOUBLE)
                                / CAST(nl.n_l + vsz.v AS DOUBLE)), 12)
                       AS DECIMAL(24,12)) * 1000000000000 AS BIGINT) AS w
      FROM nl CROSS JOIN vocab CROSS JOIN vsz
      LEFT JOIN cnt ON cnt.lang = nl.lang AND cnt.b = vocab.b),
    scores AS (
      SELECT docb.doc_id, grid.lang,
             CAST(SUM(docb.c * grid.w) AS BIGINT)
               + ANY_VALUE(CAST(CAST(round(ln(CAST(prior.n_docs AS DOUBLE)
                                    / CAST(ndoc.nd AS DOUBLE)), 12)
                           AS DECIMAL(24,12)) * 1000000000000 AS BIGINT))
               AS score
      FROM docb
      JOIN grid ON grid.b = docb.b
      JOIN prior ON prior.lang = grid.lang
      CROSS JOIN ndoc
      GROUP BY 1, 2),
    pred AS (
      SELECT doc_id, lang AS lang_pred
      FROM (SELECT doc_id, lang,
                   ROW_NUMBER() OVER (PARTITION BY doc_id
                                      ORDER BY score DESC, lang) AS rn
            FROM scores)
      WHERE rn = 1)
    SELECT d.lang AS lang_true, p.lang_pred,
           CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM d JOIN pred p ON p.doc_id = d.doc_id
    GROUP BY 1, 2
    """,
)
def q_naive_bayes_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRAINABLE language identification: a multinomial Naive Bayes
    classifier over character bigrams, trained and evaluated on a
    deterministic 5-language benchmark, reported as the (true lang x
    predicted lang) confusion matrix — the learned counterpart of the
    rule-based heuristic that langid_confusion_eval certifies.

    The benchmark is built in closed form from doc_id (the corpus's
    own lang column is label noise by construction — bigram-vs-lang
    chi-square ~ dof — so no classifier could demonstrate learning on
    it): each doc gets one language's real function-word phrase plus
    three doc_id-selected words from a shared noise vocabulary, the
    formula-fixture pattern of audio_zero_crossings. A correct NB
    implementation must recover a near-diagonal confusion matrix;
    tests assert it beats the majority class by a wide margin.

    Training is counting: per-(lang, bigram) counts with add-one
    smoothing over the corpus vocabulary V; every log weight
    ln((c+1)/(N_lang+V)) and log prior ln(n_docs_lang/n_docs) is the
    repo's round(ln, 12) e12 long, so per-document scores are EXACT
    integer sums (count x weight) and the argmax (tie-break: lexical
    lang order) is reproducible at any parallelism.

    Scale shape: bigram extraction is array-native (transform over a
    sequence + one explode, no regroup); (lang, bigram) counts and
    per-doc features are map-side-combinable aggs; the weight grid is
    |langs| x |vocab| — charset-bounded, NOT corpus-bounded — and
    broadcasts into the scoring join, so the only corpus-sized
    shuffle is the per-(doc, lang) score aggregation (|langs| x docs
    rows). The prediction window partitions BY DOCUMENT (|langs| rows
    each). Self-scoring on the training corpus is the standard
    fit-quality readout; holdout evaluation is train_eval_split's
    job.

    Reference parity: none — the reference has no ML surface; this is
    the trainable lang-ID a multilingual curation pipeline needs when
    script alone cannot separate languages (en/es/fr/de share Latin
    script — exactly where a script heuristic is blind).
    """
    sel = (F.col("doc_id") % 5).cast("int") + 1
    noise = F.array(*[F.lit(w) for w in _NB_NOISE])
    docs = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") < 200)
        .select(
            "doc_id",
            F.element_at(
                F.array(*[F.lit(x) for x in _NB_LANGS]), sel
            ).alias("lang"),
            F.concat_ws(
                " ",
                F.element_at(
                    F.array(*[F.lit(x) for x in _NB_PHRASES]), sel
                ),
                F.element_at(
                    noise, ((F.col("doc_id") * 7) % 8).cast("int") + 1
                ),
                F.element_at(
                    noise, ((F.col("doc_id") * 3 + 1) % 8).cast("int") + 1
                ),
                F.element_at(
                    noise, ((F.col("doc_id") * 5 + 2) % 8).cast("int") + 1
                ),
            ).alias("t"),
        )
    )
    bg = docs.select(
        "doc_id",
        "lang",
        F.explode(
            F.expr(
                "transform(sequence(1, length(t) - 1),"
                " i -> substring(t, i, 2))"
            )
        ).alias("b"),
    )
    docb = bg.groupBy("doc_id", "b").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    cnt = bg.groupBy("lang", "b").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    nl = cnt.groupBy("lang").agg(F.sum("c").cast("long").alias("n_l"))
    vocab = bg.select("b").distinct()
    vsz = vocab.agg(F.count(F.lit(1)).cast("long").alias("v"))
    prior = docs.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    ndoc = docs.agg(F.count(F.lit(1)).cast("long").alias("nd"))

    def _ln_e12(num, den):
        return (
            F.round(F.log(num.cast("double") / den.cast("double")), 12)
            .cast("decimal(24,12)")
            * 1000000000000
        ).cast("long")

    grid = (
        # broadcast-ok: char-bigram vocab — bounded by alphabet^2, not corpus size
        nl.crossJoin(F.broadcast(vocab))
        .crossJoin(F.broadcast(vsz))
        .join(
            cnt.withColumnRenamed("c", "c_lb"),
            ["lang", "b"],
            "left",
        )
        .select(
            "lang",
            "b",
            _ln_e12(
                F.coalesce(F.col("c_lb"), F.lit(0)) + 1,
                F.col("n_l") + F.col("v"),
            ).alias("w"),
        )
    )
    prior_w = (
        prior.crossJoin(F.broadcast(ndoc))
        .select("lang", _ln_e12(F.col("n_docs"), F.col("nd")).alias("pw"))
    )
    scores = (
        # broadcast-ok: langs x char-bigram vocab — alphabet-bounded
        docb.join(F.broadcast(grid), "b")
        .groupBy("doc_id", "lang")
        .agg(F.sum(F.col("c") * F.col("w")).cast("long").alias("s"))
        # broadcast-ok: one row per language
        .join(F.broadcast(prior_w), "lang")
        .select(
            "doc_id", "lang", (F.col("s") + F.col("pw")).alias("score")
        )
    )
    w_pred = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("lang").asc()
    )
    pred = (
        scores.withColumn("rn", F.row_number().over(w_pred))
        .where(F.col("rn") == 1)
        .select("doc_id", F.col("lang").alias("lang_pred"))
    )
    return (
        docs.select("doc_id", F.col("lang").alias("lang_true"))
        .join(pred, "doc_id")
        .groupBy("lang_true", "lang_pred")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )


@query(
    "pmi_collocations_topk",
    oracle=f"""
    WITH dt AS (
      SELECT DISTINCT doc_id, unnest({_tok(_FOLD)}) AS tok
      FROM documents),
    nd AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n
           FROM documents),
    df AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS c FROM dt GROUP BY 1),
    pairs AS (
      SELECT a.tok AS tok_a, b.tok AS tok_b,
             CAST(COUNT(*) AS BIGINT) AS c_ab
      FROM dt a JOIN dt b
        ON a.doc_id = b.doc_id AND a.tok < b.tok
      GROUP BY 1, 2),
    pmi AS (
      SELECT tok_a, tok_b, c_ab, da.c AS c_a, db.c AS c_b,
             CAST(CAST(round(ln(CAST(n AS DOUBLE) * c_ab
                                / (CAST(da.c AS DOUBLE) * db.c)), 12)
                       AS DECIMAL(24,12)) * 1000000000000 AS BIGINT)
               AS pmi_e12
      FROM pairs JOIN df da ON da.tok = pairs.tok_a
                 JOIN df db ON db.tok = pairs.tok_b
                 CROSS JOIN nd
      WHERE c_ab >= 5)
    SELECT tok_a, tok_b, c_ab, c_a, c_b, pmi_e12
    FROM pmi
    ORDER BY pmi_e12 DESC, tok_a, tok_b
    LIMIT 20
    """,
)
def q_pmi_collocations_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual information collocations: the 20 token pairs
    most strongly ASSOCIATED at the document level — pmi =
    ln(N * c_ab / (c_a * c_b)) over document frequencies, the classic
    collocation statistic (Church & Hanks 1990, public). High
    RAW co-occurrence (cooccurrence_topk) just finds frequent pairs;
    PMI normalizes away both marginals and surfaces pairs that travel
    together far above chance.

    Determinism: counts are exact; pmi is the repo's round(ln, 12)
    e12 long; the top-k orders by (pmi_e12, tok_a, tok_b) — a total
    order on exact values.

    Scale shape: distinct (doc, token) in one shuffle; the pair
    emitter is a per-document self-join keyed on doc_id (bounded by
    per-doc DISTINCT vocabulary, the same guard as cooccurrence);
    document frequencies broadcast into the pair table; min-support
    c_ab >= 5 prunes the tail before ranking, and the top-k is a
    TakeOrdered, never a global sort.

    Reference parity: none — corpus-mining surface for tokenizer and
    phrase-table construction.
    """
    from concurrent_etl_spark.operators.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    dt = (
        docs.select(
            "doc_id",
            F.explode(tokens(ascii_fold("text"))).alias("tok"),
        )
        .distinct()
    )
    nd = docs.agg(F.countDistinct("doc_id").cast("long").alias("n"))
    df = dt.groupBy("tok").agg(F.count(F.lit(1)).cast("long").alias("c"))
    a = dt.select(F.col("doc_id").alias("d"), F.col("tok").alias("tok_a"))
    b = dt.select(F.col("doc_id").alias("d"), F.col("tok").alias("tok_b"))
    pairs = (
        a.join(b, "d")
        .where(F.col("tok_a") < F.col("tok_b"))
        .groupBy("tok_a", "tok_b")
        .agg(F.count(F.lit(1)).cast("long").alias("c_ab"))
        .where(F.col("c_ab") >= 5)
    )
    pmi_e12 = (
        F.round(
            F.log(
                F.col("n").cast("double")
                * F.col("c_ab")
                / (F.col("c_a").cast("double") * F.col("c_b"))
            ),
            12,
        ).cast("decimal(24,12)")
        * 1000000000000
    ).cast("long")
    return (
        # The unigram-count table is vocabulary-sized (Heaps' law:
        # grows with the corpus), so no forced broadcast — unlike the
        # frozen reference LMs in unigram_logprob_quality, this df is
        # derived from the input corpus itself. AQE broadcasts it
        # when it fits. `nd` is a 1-row scalar: always broadcast-ok.
        pairs.join(
            df.select(F.col("tok").alias("tok_a"), F.col("c").alias("c_a")),
            "tok_a",
        )
        .join(
            df.select(F.col("tok").alias("tok_b"), F.col("c").alias("c_b")),
            "tok_b",
        )
        .crossJoin(F.broadcast(nd))  # broadcast-ok: single-row global count
        .select("tok_a", "tok_b", "c_ab", "c_a", "c_b", pmi_e12.alias("pmi_e12"))
        .orderBy(F.desc("pmi_e12"), F.asc("tok_a"), F.asc("tok_b"))
        .limit(20)
    )


@query(
    "quantile_normalization_sources",
    oracle="""
    WITH d AS (
      -- unmeasured docs (NULL n_chars, e.g. NULL text) have no rank
      -- to normalize: excluded in BOTH engines
      SELECT doc_id, source, n_chars FROM documents
      WHERE n_chars IS NOT NULL),
    pooled AS (
      SELECT n_chars AS v, COUNT(*) AS t,
             SUM(COUNT(*)) OVER (ORDER BY n_chars) AS cum
      FROM d GROUP BY n_chars),
    nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM d),
    per_src AS (
      SELECT source, n_chars AS v, COUNT(*) AS t,
             SUM(COUNT(*)) OVER (PARTITION BY source ORDER BY n_chars)
               AS cum
      FROM d GROUP BY source, n_chars),
    ns AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_s
           FROM d GROUP BY source),
    mapped AS (
      SELECT p.source, p.v, p.t,
             CAST((CAST(p.cum AS HUGEINT) * 2 * nn.n + ns.n_s)
                  // (2 * ns.n_s)
                  AS BIGINT) AS target_rank
      FROM per_src p JOIN ns USING (source) CROSS JOIN nn),
    xlat AS (
      SELECT m.source, m.v, m.t, m.target_rank,
             (SELECT MIN(pl.v) FROM pooled pl
              WHERE pl.cum >= m.target_rank) AS v_norm
      FROM mapped m)
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_distinct_vals,
           CAST(SUM(t) AS BIGINT) AS n_docs,
           CAST(SUM(t * v) AS BIGINT) AS sum_raw,
           CAST(SUM(t * v_norm) AS BIGINT) AS sum_normalized
    FROM xlat GROUP BY source
    """,
)
def q_quantile_normalization_sources(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Quantile normalization across sources (the batch-effect
    remover of bioinformatics/data-mixing, Bolstad et al. 2003 —
    public): every document's length maps to the POOLED corpus
    value at its own source-relative rank, so after mapping each
    source's length distribution matches the pooled one — the
    normalization a mixture pipeline applies before comparing
    per-source quality thresholds. Reported as per-source
    raw-vs-normalized sums (exact longs), the auditable footprint of
    the full mapping.

    Exact rank machinery end to end: per-source ranks and the pooled
    rank->value lookup both ride the bucket-offset cumsum
    (length-domain-bounded); target_rank = round(cum/n_s * N) via the
    nonnegative half-up trick; the lookup is min v with pooled
    cum >= rank — an exact order statistic, no interpolation, no
    global sort (the oracle states both cumulations with single-node
    windows and a correlated MIN).

    Scale shape: two bounded-domain groupBys + one join of
    domain-sized tables. At 100 TB nothing row-sized shuffles twice.
    """
    docs = (
        load_table(spark, sf_dir, "documents")
        # NULL n_chars has no rank to normalize (see oracle) — and the
        # bucket-offset cumsum's driver sort cannot order a NULL bucket
        .where(F.col("n_chars").isNotNull())
        .select("source", F.col("n_chars").alias("v"))
    )
    from concurrent_etl_spark.queries_stats import _cum_by_value

    pooled = _cum_by_value(
        docs.groupBy("v").agg(
            F.lit(0).cast("long").alias("a"), F.count(F.lit(1)).alias("t")
        )
    ).select(F.col("v").alias("pv"), F.col("cum_t").alias("pcum"))
    nn = docs.agg(F.count(F.lit(1)).cast("long").alias("n"))
    ns = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_s")
    )
    # per-source cumulative counts: partitioned window per source over
    # the length-domain-bounded distinct-value table
    per_src = docs.groupBy("source", "v").agg(
        F.count(F.lit(1)).cast("long").alias("t")
    )
    w = Window.partitionBy("source").orderBy("v")
    per_src = per_src.withColumn("cum", F.sum("t").over(w))
    mapped = (
        # broadcast-ok: one row per source — bounded enum
        per_src.join(F.broadcast(ns), "source")
        .crossJoin(F.broadcast(nn))
        .select(
            "source",
            "v",
            "t",
            # cum*2*n is a corpus-squared cross-moment — DECIMAL(38,0)
            # before the multiply (house big-product convention; at
            # 10^11 docs the BIGINT product wraps silently in
            # non-ANSI Spark while DuckDB errors)
            F.expr(
                "CAST((cast(cum as decimal(38,0)) * 2 * n + n_s)"
                " div (2 * n_s) AS BIGINT)"
            ).alias("target_rank"),
        )
    )
    # exact order-statistic lookup: smallest pooled value whose
    # cumulative count reaches the target rank (non-equi join on the
    # domain-sized pooled table, then a min per mapped row)
    xlat = (
        mapped.join(
            # broadcast-ok: one row per distinct length value — bounded by the doc-length cap, not corpus size
            F.broadcast(pooled), F.col("pcum") >= F.col("target_rank")
        )
        .groupBy("source", "v", "t")
        .agg(F.min("pv").alias("v_norm"))
    )
    return xlat.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_distinct_vals"),
        F.sum("t").cast("long").alias("n_docs"),
        F.sum(F.col("t") * F.col("v")).cast("long").alias("sum_raw"),
        F.sum(F.col("t") * F.col("v_norm"))
        .cast("long")
        .alias("sum_normalized"),
    )


@query(
    "negative_sampling_table",
    oracle=f"""
    WITH tok AS (
      SELECT unnest({_tok(_FOLD)}) AS t FROM documents),
    freq AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS f FROM tok GROUP BY t),
    pow34 AS (
      SELECT t, f,
             CAST(round(sqrt(sqrt(CAST(f AS DOUBLE) * f * f)) * 1000000)
                  AS BIGINT) AS w_e6
      FROM freq),
    tot AS (SELECT CAST(SUM(w_e6) AS BIGINT) AS tw FROM pow34),
    ranked AS (
      SELECT t, f, w_e6,
             -- HUGEINT, not DECIMAL: DuckDB's // on DECIMAL
             -- routes through DOUBLE and loses exactness
             CAST((CAST(w_e6 AS HUGEINT) * 2000000000 + tw)
                  // (2 * tw) AS BIGINT) AS p_e9,
             ROW_NUMBER() OVER (ORDER BY w_e6 DESC, t) AS rn
      FROM pow34, tot)
    SELECT t AS token, f AS freq, w_e6, p_e9
    FROM ranked WHERE rn <= 30
    """,
)
def q_negative_sampling_table(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """word2vec/NCE negative-sampling distribution (Mikolov et al.
    2013 — public): token weights proportional to unigram
    frequency^(3/4), the exponent that keeps frequent words from
    dominating the negative pool. The top-30 table with e9-scaled
    probabilities is what a training loop aliases into its sampler.

    The only fractional power in the repo, made deterministic
    WITHOUT the rounded-ln/exp chain: f^(3/4) = sqrt(sqrt(f^3)), and
    IEEE-754 requires sqrt to be correctly rounded — so both engines
    compute the identical double, which is then rounded ONCE to an
    e6 long so the normalizing sum is exact integer arithmetic
    (a float sum would be partition-order-dependent). p_e9 uses the
    nonnegative half-up integral trick.

    Scale shape: one token-count shuffle; the weight map is
    vocabulary-sized row-local math; the top-30 is a TakeOrdered.

    Reference parity: none — tokenizer/embedding-training
    infrastructure (SURVEY beyond-reference mandate).
    """
    docs = load_table(spark, sf_dir, "documents")
    freq = (
        docs.select(
            F.explode(tokens(ascii_fold("text"))).alias("t")
        )
        .groupBy("t")
        .agg(F.count(F.lit(1)).cast("long").alias("f"))
    )
    w_e6 = (
        F.round(
            F.sqrt(
                F.sqrt(
                    F.col("f").cast("double") * F.col("f") * F.col("f")
                )
            )
            * 1000000
        )
        .cast("long")
        .alias("w_e6")
    )
    pow34 = freq.select("t", "f", w_e6)
    tot = pow34.agg(F.sum("w_e6").cast("long").alias("tw"))
    return (
        pow34.crossJoin(F.broadcast(tot))
        .select(
            F.col("t").alias("token"),
            F.col("f").alias("freq"),
            "w_e6",
            # DECIMAL(38,0): w_e6*2e9 can pass 2^63 once corpus
            # frequencies reach ~1e6 (f^0.75 * 1e6 * 2e9)
            F.expr(
                "CAST((CAST(w_e6 AS DECIMAL(38,0)) * 2000000000 + tw)"
                " div (2 * tw) AS BIGINT)"
            ).alias("p_e9"),
        )
        .orderBy(F.desc("w_e6"), F.asc("token"))
        .limit(30)
    )


# ---------------------------------------------------------------------------
# positional phrase query over the inverted index
# ---------------------------------------------------------------------------

#: query phrases for the positional index; chosen from the synthetic
#: corpus vocabulary so every scale factor has matches
_PHRASES = [("merge data", ["merge", "data"]), ("sort the table", ["sort", "the", "table"])]


@query(
    "phrase_query_positional",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id,
             unnest({_tok(_FOLD)}) AS t,
             generate_subscripts({_tok(_FOLD)}, 1) AS pos
      FROM documents),
    m1 AS (
      SELECT 'merge data' AS phrase, p1.doc_id, p1.pos
      FROM tok p1
      JOIN tok p2 ON p2.doc_id = p1.doc_id AND p2.pos = p1.pos + 1
      WHERE p1.t = 'merge' AND p2.t = 'data'),
    m2 AS (
      SELECT 'sort the table' AS phrase, p1.doc_id, p1.pos
      FROM tok p1
      JOIN tok p2 ON p2.doc_id = p1.doc_id AND p2.pos = p1.pos + 1
      JOIN tok p3 ON p3.doc_id = p1.doc_id AND p3.pos = p1.pos + 2
      WHERE p1.t = 'sort' AND p2.t = 'the' AND p3.t = 'table'),
    hits AS (SELECT * FROM m1 UNION ALL SELECT * FROM m2)
    SELECT phrase, doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_matches,
           CAST(MIN(pos) AS BIGINT) AS first_pos
    FROM hits GROUP BY phrase, doc_id
    """,
)
def q_phrase_query_positional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact PHRASE matching over a positional inverted index — the
    positional-postings half of the retrieval stack that
    ``inverted_index_postings`` (docfreq postings) and
    ``bm25_retrieval_topk`` (bag-of-words scoring) don't cover: a
    phrase matches only where its terms appear CONSECUTIVELY, found
    by equi-joining each term's postings on (doc_id, pos + offset) —
    the Lucene positional-query plan.

    Per (phrase, doc): match count and first match position, both
    exact integers. Two phrases (a bigram and a trigram) run in one
    plan; the trigram chains a second offset join.

    100 TB shape: postings build is one posexplode scan; each term's
    postings list is docfreq-proportional, and the adjacency join
    keys on (doc_id, pos) — selective terms first would prune
    hardest, but even as-is nothing joins beyond the phrase terms'
    postings. Output is match-bounded.
    """
    docs = _docs(spark, sf_dir)
    tok = docs.select(
        "doc_id",
        F.posexplode(tokens(ascii_fold("text"))).alias("pos0", "t"),
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "t")
    tok = tok.persist()

    hits = None
    for phrase, terms in _PHRASES:
        m = tok.where(F.col("t") == terms[0]).select(
            "doc_id", F.col("pos").alias("p1")
        )
        for i, term in enumerate(terms[1:], start=1):
            nxt = tok.where(F.col("t") == term).select(
                F.col("doc_id").alias("d2"), F.col("pos").alias("p2")
            )
            m = m.join(
                nxt,
                (F.col("d2") == F.col("doc_id"))
                & (F.col("p2") == F.col("p1") + i),
            ).select("doc_id", "p1")
        m = m.select(
            F.lit(phrase).alias("phrase"), "doc_id", F.col("p1").alias("pos")
        )
        hits = m if hits is None else hits.unionByName(m)
    return hits.groupBy("phrase", "doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_matches"),
        F.min("pos").cast("long").alias("first_pos"),
    )


# ---------------------------------------------------------------------------
# MMR diversified top-k retrieval (unrolled greedy, integer-exact)
# ---------------------------------------------------------------------------

_MMR_TERMS = ["merge", "data", "table", "sort"]
_MMR_POOL = 20
_MMR_K = 5


def _mmr_oracle() -> str:
    terms = ", ".join(f"'{t}'" for t in _MMR_TERMS)
    step = """
    cand{k} AS (
      SELECT p.doc_id, p.rel_pm,
             MAX(s.sim_pm) AS max_sim_pm
      FROM pool_sc p
      JOIN sims s ON s.da = p.doc_id
      JOIN sel{p} ON s.db = sel{p}.doc_id
      WHERE p.doc_id NOT IN (SELECT doc_id FROM sel{p})
      GROUP BY p.doc_id, p.rel_pm),
    pick{k} AS (
      SELECT CAST({k} AS BIGINT) AS rank, doc_id, rel_pm, max_sim_pm,
             7 * rel_pm - 3 * max_sim_pm AS mmr_x10
      FROM cand{k}
      ORDER BY 7 * rel_pm - 3 * max_sim_pm DESC, doc_id LIMIT 1),
    sel{k} AS (SELECT * FROM sel{p} UNION ALL SELECT * FROM pick{k})"""
    steps = ",".join(
        step.format(k=k, p=k - 1) for k in range(2, _MMR_K + 1)
    )
    return f"""
    WITH tok AS (
      SELECT doc_id, unnest({_tok(_FOLD)}) AS t FROM documents),
    rel AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS rel
      FROM tok WHERE t IN ({terms}) GROUP BY doc_id),
    pool AS (
      SELECT doc_id, rel FROM rel ORDER BY rel DESC, doc_id
      LIMIT {_MMR_POOL}),
    mx AS (SELECT MAX(rel) AS mr FROM pool),
    pool_sc AS (
      SELECT doc_id, rel * 1000 // mx.mr AS rel_pm FROM pool, mx),
    shl AS (
      SELECT doc_id, {_shingles_sql(_FOLD)} AS shg
      FROM documents
      WHERE doc_id IN (SELECT doc_id FROM pool)),
    sims AS (
      SELECT a.doc_id AS da, b.doc_id AS db,
             len(list_intersect(a.shg, b.shg)) * 1000
               // greatest(len(list_distinct(list_concat(a.shg, b.shg))), 1)
               AS sim_pm
      FROM shl a JOIN shl b ON a.doc_id <> b.doc_id),
    sel1 AS (
      SELECT CAST(1 AS BIGINT) AS rank, doc_id, rel_pm,
             CAST(0 AS BIGINT) AS max_sim_pm,
             7 * rel_pm AS mmr_x10
      FROM pool_sc ORDER BY rel_pm DESC, doc_id LIMIT 1),{steps}
    SELECT rank, doc_id, rel_pm, max_sim_pm, mmr_x10 FROM sel{_MMR_K}
    """


from concurrent_etl_spark.queries_llm import _shingles as _shingles_sql  # noqa: E402


@query("mmr_diversified_topk", oracle=_mmr_oracle())
def q_mmr_diversified_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal Marginal Relevance diversified top-k (Carbonell &
    Goldstein 1998, public) — the re-ranking step between retrieval
    and consumption that trades pure relevance for coverage: each of
    5 greedy rounds picks argmax of 0.7*relevance - 0.3*max-
    similarity-to-already-selected, so near-duplicate hits can't
    crowd the result list (the retrieval-side cousin of SemDeDup).

    Everything is integer-exact: relevance is the query-term
    occurrence count normalized to permille of the pool max (floor
    division), similarity is exact bigram-shingle Jaccard permille,
    and the MMR objective is 7*rel_pm - 3*sim_pm in x10 units — no
    floats anywhere, ties broken by doc_id. The greedy loop is
    UNROLLED as five lazy DataFrame steps over the broadcast 20-row
    candidate pool (anti-join the selected set, max-sim join, ordered
    limit 1) — no driver-side collect; the oracle unrolls the same
    five CTEs.

    100 TB shape: only the relevance scan and the pool TakeOrdered
    touch corpus-sized data; the pool (20 rows) and its 400-pair
    similarity table bound every greedy step. Pool size and k are the
    product knobs; the plan is identical at any corpus size.
    """
    docs = _docs(spark, sf_dir)
    tok = docs.select(
        "doc_id", F.explode(tokens(ascii_fold("text"))).alias("t")
    )
    rel = (
        tok.where(F.col("t").isin(*_MMR_TERMS))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("rel"))
    )
    pool = rel.orderBy(F.desc("rel"), "doc_id").limit(_MMR_POOL)
    mx = pool.agg(F.max("rel").alias("mr"))
    pool_sc = (
        pool.crossJoin(F.broadcast(mx))
        .select("doc_id", F.expr("rel * 1000 div mr").alias("rel_pm"))
        .persist()
    )
    from concurrent_etl_spark.operators.dedup import staged_shingles

    shl = (
        staged_shingles(
            docs.join(F.broadcast(pool.select("doc_id")), "doc_id", "left_semi")
        )
        .select("doc_id", F.array_distinct("sh").alias("shg"))
        .persist()
    )
    a = shl.select(F.col("doc_id").alias("da"), F.col("shg").alias("sha"))
    b = shl.select(F.col("doc_id").alias("db"), F.col("shg").alias("shb"))
    sims = (
        # broadcast-ok: shingles of the 20-row candidate pool
        a.crossJoin(F.broadcast(b))
        .where(F.col("da") != F.col("db"))
        .select(
            "da",
            "db",
            F.expr(
                "size(array_intersect(sha, shb)) * 1000"
                " div greatest(size(array_union(sha, shb)), 1)"
            ).alias("sim_pm"),
        )
        .persist()
    )
    # each greedy step references the selected set THREE times
    # (anti-join, max-sim join, union) — left lazy, the unrolled plan
    # grew ~3^k (measured: 1123 physical operators, 6.1 s at sf0.1,
    # nearly all of it analysis + re-executed limit-1 subtrees). The
    # kcore lesson applies: localCheckpoint each k-row selected set
    # so every step starts from materialized rows (k <= 5 rows — the
    # eager job is a no-shuffle micro-materialization, and on a
    # cluster the same call swaps to reliable checkpoint).
    sel = (
        pool_sc.orderBy(F.desc("rel_pm"), "doc_id")
        .limit(1)
        .select(
            F.lit(1).cast("long").alias("rank"),
            "doc_id",
            "rel_pm",
            F.lit(0).cast("long").alias("max_sim_pm"),
            (7 * F.col("rel_pm")).cast("long").alias("mmr_x10"),
        )
        .localCheckpoint()
    )
    for k in range(2, _MMR_K + 1):
        cand = (
            pool_sc.join(sel.select("doc_id"), "doc_id", "left_anti")
            # broadcast-ok: pool^2 pairs — at most _MMR_POOL^2 = 400 rows
            .join(F.broadcast(sims), F.col("doc_id") == F.col("da"))
            .join(
                F.broadcast(sel.select(F.col("doc_id").alias("sd"))),
                F.col("db") == F.col("sd"),
            )
            .groupBy("doc_id", "rel_pm")
            .agg(F.max("sim_pm").cast("long").alias("max_sim_pm"))
        )
        pick = (
            cand.select(
                F.lit(k).cast("long").alias("rank"),
                "doc_id",
                "rel_pm",
                "max_sim_pm",
                (7 * F.col("rel_pm") - 3 * F.col("max_sim_pm"))
                .cast("long")
                .alias("mmr_x10"),
            )
            .orderBy(F.desc("mmr_x10"), "doc_id")
            .limit(1)
        )
        sel = sel.unionByName(pick).localCheckpoint()
    return sel
