"""LLM training-data pipeline queries: dedup, similarity, text, multimodal.

Each query pairs a Spark implementation (operators/dedup.py,
similarity.py, text.py, multimodal.py) with a DuckDB oracle that
reproduces the identical pipeline in SQL. Cross-engine determinism
comes from md5-based hashing, element-ordered list arithmetic, and
exact integer/double operations (see operators' docstrings).

The synthetic corpus has no natural near-duplicates (measured: max
bigram Jaccard 0.12, embedding cosine uncorrelated with labels), so
dedup/near-dup queries inject deterministic mutants inside the query
— the oracle reproduces the injection, making the checks non-trivial
at every scale factor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from concurrent_etl_spark.catalog import query
from concurrent_etl_spark.engine import load_table
from concurrent_etl_spark.operators import dedup as D
from concurrent_etl_spark.operators import multimodal as M
from concurrent_etl_spark.operators import similarity as S
from concurrent_etl_spark.operators import text as T

# ---------------------------------------------------------------------------
# shared oracle SQL fragments (must mirror operators/text.py exactly)
# ---------------------------------------------------------------------------

#: ASCII case fold of an arbitrary SQL expression — mirrors
#: operators/text.ascii_fold exactly (translate is per-codepoint 1:1
#: in both engines; lower() is NOT cross-engine deterministic — see
#: the ascii_fold docstring for the İ/Σ/ß divergence table). ONE
#: source for the translate literal: every inlined oracle site calls
#: this instead of hand-copying the 80-char string.
_fold = T.fold_sql

#: the common case — fold of the `text` column.
_FOLD = _fold("text")


def _tok(x: str) -> str:
    # explicit class, not \s: RE2's \s lacks \x0B, Java's has it —
    # mirror operators/text.tokens exactly (no trim(): the empty
    # filter covers ASCII edges, and DuckDB's trim strips U+3000
    # where Spark's does not)
    return (
        f"list_filter(string_split_regex({x},"
        f" '[ \\t\\n\\x0B\\f\\r]+'), t -> t <> '')"
    )


def _shingles(x: str) -> str:
    # zip-with-shifted-self, NOT list_slice per position: DuckDB's
    # list_slice copies O(len) per call, making per-position slicing
    # O(n^2) per document (measured 20.7 s for ONE 20k-token doc vs
    # 0.04 s for the zip form — identical output, exact order). The
    # padded last pair (p[2] IS NULL) is filtered.
    t = _tok(x)
    return (
        f"list_distinct(list_filter(list_transform("
        f"list_zip({t}, ({t})[2:]), "
        f"p -> CASE WHEN p[2] IS NULL THEN NULL "
        f"ELSE p[1] || ' ' || p[2] END), x -> x IS NOT NULL))"
    )


_CORPUS_NEAR = f"""corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000 AS doc_id,
         array_to_string(list_slice({_tok('text')}, 3, 100000000), ' ') AS text
  FROM documents WHERE doc_id < 40
)"""

_CORPUS_EXACT = """corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id < 40
)"""

def _sql_int_list(vals: list[int]) -> str:
    return "[" + ", ".join(str(v) for v in vals) + "]"


# affine-permutation minhash over 32-bit shingle hashes; A/B literals
# mirror operators/dedup.py MINHASH_A/MINHASH_B exactly
from concurrent_etl_spark.operators.dedup import (  # noqa: E402
    MINHASH_A,
    MINHASH_B,
    MINHASH_PRIME,
)

_SIG = (
    f"list_transform(range(0, 24), s -> list_aggregate("
    f"list_transform(hs, h -> (h * {_sql_int_list(MINHASH_A)}[s+1] "
    f"+ {_sql_int_list(MINHASH_B)}[s+1]) % {MINHASH_PRIME}), 'min'))"
)

_BANDS = (
    "list_transform(range(0, 8), b -> "
    "md5(sig[b*3+1]::VARCHAR || '|' || sig[b*3+2]::VARCHAR || '|' "
    "|| sig[b*3+3]::VARCHAR))"
)

# MATERIALIZED: each CTE below is referenced 2-3x downstream and
# DuckDB inlines non-materialized CTEs (recomputing the minhash
# lambda pipeline per reference) - measured 133 s -> 29.5 s for
# dedup_minhash_lsh's oracle at sf0.1, identical output.
_LSH_PAIRS = f"""
sh AS MATERIALIZED (SELECT * FROM (SELECT doc_id, {_shingles(_FOLD)} AS sh
       FROM corpus) WHERE len(sh) > 0),
hs AS MATERIALIZED (SELECT doc_id, sh,
              list_transform(sh, x -> ('0x' || substr(md5(x), 1, 8))::BIGINT) AS hs
       FROM sh),
sig AS MATERIALIZED (SELECT doc_id, sh, {_SIG} AS sig FROM hs),
bands AS MATERIALIZED (
  SELECT doc_id, sig, sh,
         unnest({_BANDS}) AS band_hash,
         generate_subscripts({_BANDS}, 1) AS band_idx
  FROM sig),
pairs AS MATERIALIZED (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a
  JOIN bands b ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
              AND a.doc_id < b.doc_id)
"""


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


# ---------------------------------------------------------------------------
# deduplication
# ---------------------------------------------------------------------------

@query(
    "dedup_exact",
    oracle=f"""
    WITH {_CORPUS_EXACT},
    h AS (SELECT doc_id,
                 md5(coalesce(array_to_string({_tok(_FOLD)}, ' '), ''))
                   AS content_hash
          FROM corpus)
    SELECT content_hash, COUNT(*) AS n_docs, MIN(doc_id) AS keep_doc_id,
           string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS doc_ids
    FROM h GROUP BY content_hash HAVING COUNT(*) > 1
    """,
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: content-hash groupBy; one shuffle, no pairwise work."""
    return D.exact_dup_groups(D.with_injected_exact_dups(_docs(spark, sf_dir)))


@query(
    "dedup_minhash_lsh",
    oracle=f"""
    WITH {_CORPUS_NEAR},
    {_LSH_PAIRS}
    SELECT p.doc_a, p.doc_b,
           list_aggregate(list_transform(list_zip(sa.sig, sb.sig),
             x -> CASE WHEN x[1] = x[2] THEN 1 ELSE 0 END), 'sum') / 24.0
             AS est_jaccard
    FROM pairs p
    JOIN sig sa ON sa.doc_id = p.doc_a
    JOIN sig sb ON sb.doc_id = p.doc_b
    """,
)
def q_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dedup: 24 md5-minhashes, 8 bands x 3 rows.

    Candidate pairs share >=1 band; estimated Jaccard = agreeing
    signature fraction. Only the band bucket join shuffles.
    """
    return D.minhash_lsh_pairs(D.with_injected_near_dups(_docs(spark, sf_dir)))


@query(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH {_CORPUS_NEAR},
    {_LSH_PAIRS}
    SELECT * FROM (
      SELECT p.doc_a, p.doc_b,
             len(list_intersect(sa.sh, sb.sh)) /
             len(list_distinct(list_concat(sa.sh, sb.sh))) AS jaccard
      FROM pairs p
      JOIN sh sa ON sa.doc_id = p.doc_a
      JOIN sh sb ON sb.doc_id = p.doc_b
    ) WHERE jaccard >= 0.8
    """,
)
def q_dedup_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact bigram-Jaccard verify over the LSH candidates only."""
    return D.ngram_jaccard_pairs(
        D.with_injected_near_dups(_docs(spark, sf_dir)), threshold=0.8
    )


@query(
    "dedup_clusters",
    oracle=f"""
    WITH RECURSIVE {_CORPUS_NEAR},
    {_LSH_PAIRS},
    edges AS (
      SELECT doc_a AS s, doc_b AS d FROM pairs
      UNION
      SELECT doc_b AS s, doc_a AS d FROM pairs),
    reach (n, m) AS (
      SELECT s, s FROM edges
      UNION
      SELECT r.n, e.d FROM reach r JOIN edges e ON e.s = r.m),
    comp AS (SELECT n AS doc_id, MIN(m) AS cluster_id FROM reach GROUP BY n)
    SELECT c.doc_id, c.cluster_id, s.cluster_size
    FROM comp c
    JOIN (SELECT cluster_id, COUNT(*) AS cluster_size
          FROM comp GROUP BY cluster_id) s USING (cluster_id)
    """,
)
def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster formation: LSH pairs -> connected components.

    Spark side is iterative hash-min label propagation
    (operators/dedup.connected_components); the oracle computes the
    same components via a recursive-CTE transitive closure — feasible
    for DuckDB at oracle scale, not at 100 TB, which is exactly why
    the engine ships the iterative distributed form.
    """
    return D.dup_clusters(D.with_injected_near_dups(_docs(spark, sf_dir)))


@query(
    "dedup_simhash",
    oracle=f"""
    WITH {_CORPUS_NEAR},
    tok AS (SELECT doc_id, unnest({_tok(_FOLD)}) AS t FROM corpus),
    h AS (SELECT doc_id, ('0x' || substr(md5(t), 1, 8))::BIGINT AS h FROM tok),
    bitsum AS (
      SELECT doc_id, i.bit_idx,
             SUM(CASE WHEN CAST(floor(h / power(2, i.bit_idx)) AS BIGINT) % 2 = 1
                      THEN 1 ELSE -1 END) AS s
      FROM h CROSS JOIN (SELECT unnest(range(0, 32)) AS bit_idx) i
      GROUP BY 1, 2),
    fp AS (
      SELECT doc_id,
             SUM(CASE WHEN s > 0 THEN CAST(power(2, bit_idx) AS BIGINT)
                      ELSE 0 END) AS simhash
      FROM bitsum GROUP BY 1),
    bytes AS (
      SELECT doc_id, simhash, k.byte_idx,
             CAST(floor(simhash / power(2, k.byte_idx * 8)) AS BIGINT) % 256 AS byte_val
      FROM fp CROSS JOIN (SELECT unnest(range(0, 4)) AS byte_idx) k),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
             a.simhash AS sim_a, b.simhash AS sim_b
      FROM bytes a
      JOIN bytes b ON a.byte_idx = b.byte_idx AND a.byte_val = b.byte_val
                  AND a.doc_id < b.doc_id)
    SELECT doc_a, doc_b, CAST(bit_count(xor(sim_a, sim_b)) AS INTEGER) AS hamming
    FROM cand WHERE bit_count(xor(sim_a, sim_b)) <= 3
    """,
)
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dedup: 32-bit fingerprints, byte-band Hamming-LSH.

    Pigeonhole: hamming <= 3 over 4 bytes => >=1 byte agrees, so the
    byte-bucket join is a complete candidate generator.

    SCALE WARNING (measured, SCALE.md §11e): on realistic Zipf text
    the 32-bit unigram fingerprint SATURATES — ~1% of ALL doc pairs
    fall within hamming 3 at just 5k docs, so the output itself is
    quadratic in corpus size. This query stays registered as the
    textbook form; production corpora should use
    :func:`queries_llm8.q_dedup_simhash64` (60-bit fingerprint over
    bigram shingles — measured linear pair growth on the Heaps
    corpus, HEAPS_r8.json).
    """
    pairs = D.simhash_pairs(
        D.with_injected_near_dups(_docs(spark, sf_dir)), max_hamming=3
    )
    return pairs.withColumn("hamming", F.col("hamming").cast("int"))


# ---------------------------------------------------------------------------
# embedding similarity
# ---------------------------------------------------------------------------

def _oracle_dot(a: str, b: str) -> str:
    return (
        f"list_aggregate(list_transform(list_zip({a}, {b}), "
        f"x -> x[1] * x[2]), 'sum')"
    )


def _oracle_norm(a: str) -> str:
    return (
        f"sqrt(list_aggregate(list_transform({a}, x -> x * x), 'sum'))"
    )


def _oracle_cos(a: str, b: str) -> str:
    # zero-norm guard mirrors operators/similarity.py cosine(): a
    # zero vector's cosine is defined as 0.0 in both engines
    return (
        f"(CASE WHEN {_oracle_norm(a)} * {_oracle_norm(b)} > 0 "
        f"THEN {_oracle_dot(a, b)} / ({_oracle_norm(a)} * {_oracle_norm(b)}) "
        f"ELSE 0.0 END)"
    )


def _oracle_bucket(v: str) -> str:
    terms = []
    for p, plane in enumerate(S.hyperplanes()):
        arr = S.oracle_hyperplane_sql_array(plane)
        terms.append(
            f"(CASE WHEN {_oracle_dot(v, arr)} > 0 THEN {2 ** p} ELSE 0 END)"
        )
    return "(" + " + ".join(terms) + ")::BIGINT"


@query(
    "ann_topk_cosine",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
    scored AS (
      SELECT q.query_id, e.vec_id AS neighbor_id,
             {_oracle_cos('q.qv', 'e.v')} AS cos_sim
      FROM e CROSS JOIN q WHERE e.vec_id <> q.query_id)
    SELECT query_id, neighbor_id, cos_sim, CAST(rn AS INTEGER) AS rank FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos_sim DESC, neighbor_id) AS rn
      FROM scored)
    WHERE rn <= 10
    """,
)
def q_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 for 5 query vectors (exact baseline).

    Queries broadcast; corpus streams; window top-k per query.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    return S.brute_force_topk(emb, emb.where(F.col("vec_id") < 5), k=10)


@query(
    "embedding_neardup_lsh",
    oracle=f"""
    WITH corpus AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
      UNION ALL
      SELECT vec_id + 100000 AS vec_id,
             list_transform(embedding::DOUBLE[], x -> x * 1.02 + 0.005) AS v
      FROM embeddings WHERE vec_id < 40),
    b AS (SELECT vec_id, v, {_oracle_bucket('v')} AS bucket FROM corpus),
    cand AS (
      SELECT a.vec_id AS vec_a, b2.vec_id AS vec_b,
             {_oracle_cos('a.v', 'b2.v')} AS cos_sim
      FROM b a JOIN b b2 ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id)
    SELECT vec_a, vec_b, cos_sim FROM cand WHERE cos_sim >= 0.99
    """,
)
def q_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup via random-hyperplane LSH buckets + cosine verify.

    Hyperplanes are md5-seeded constants => reproducible across
    engines/runs. Only same-bucket pairs are compared.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    mutants = emb.where(F.col("vec_id") < 40).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform(
            F.col("embedding").cast("array<double>"), lambda x: x * 1.02 + 0.005
        ).alias("embedding"),
    )
    corpus = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    ).unionByName(mutants)
    return S.lsh_neardup_pairs(corpus, threshold=0.99)


@query(
    "embedding_centroids",
    oracle="""
    WITH e AS (
      SELECT vec_id % 8 AS bucket,
             generate_subscripts(embedding, 1) - 1 AS dim,
             CAST(floor(unnest(embedding::DOUBLE[]) * 1048576.0) AS BIGINT) AS q
      FROM embeddings)
    SELECT bucket, dim,
           CAST(COUNT(*) AS BIGINT) AS n_vectors,
           CAST(SUM(q) AS BIGINT) / (COUNT(*) * 1048576.0) AS centroid_val
    FROM e GROUP BY bucket, dim
    """,
)
def q_embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-bucket dimension-wise mean embedding (k-means update step),
    partition-order-independent via 2^-20 fixed-point accumulation."""
    emb = load_table(spark, sf_dir, "embeddings")
    return S.bucket_centroids(emb, n_buckets=8)


_IVF_ORACLE = f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    cent AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 8),
    assigned AS (
      SELECT vec_id, v, cid FROM (
        SELECT e.vec_id, e.v, c.cid,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY {_oracle_cos('e.v', 'c.cv')} DESC,
                                           c.cid) AS rn
        FROM e CROSS JOIN cent c) WHERE rn = 1),
    q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 3),
    probes AS (
      SELECT query_id, qv, cid FROM (
        SELECT q.query_id, q.qv, c.cid,
               row_number() OVER (PARTITION BY q.query_id
                                  ORDER BY {_oracle_cos('q.qv', 'c.cv')} DESC,
                                           c.cid) AS rn
        FROM q CROSS JOIN cent c) WHERE rn <= 2),
    scored AS (
      SELECT p.query_id, a.vec_id AS neighbor_id,
             {_oracle_cos('p.qv', 'a.v')} AS cos_sim
      FROM probes p JOIN assigned a ON a.cid = p.cid
      WHERE a.vec_id <> p.query_id)
    SELECT query_id, neighbor_id, cos_sim, CAST(rn AS INTEGER) AS rank FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos_sim DESC, neighbor_id) AS rn
      FROM scored)
    WHERE rn <= 5
    """


@query("ivf_ann_topk", oracle=_IVF_ORACLE)
def q_ivf_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN (scale path): coarse-quantize corpus into 8 inverted
    lists, probe the 2 best lists per query, exact-rerank only those.
    Complements ann_topk_cosine (the exact brute-force baseline)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return S.ivf_topk(
        emb, emb.where(F.col("vec_id") < 3), n_centroids=8, nprobe=2, k=5
    )


# ---------------------------------------------------------------------------
# cardinality sketches
# ---------------------------------------------------------------------------

from concurrent_etl_spark.operators import sketch as K  # noqa: E402


@query(
    "kmv_distinct_sketch",
    oracle=K.kmv_oracle_sql(
        "orders", "o_custkey", group_expr="o_orderpriority"
    ),
)
def q_kmv_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV distinct-count sketch: estimated distinct customers per
    order priority from the k=256 smallest md5 hashes. Deterministic
    across engines (unlike HLL), so the sketch VALUE is oracle-checked,
    not just its error bound; WindowGroupLimit keeps state at k rows
    per group map-side."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        K.kmv_distinct(orders, "o_custkey", group_cols=["o_orderpriority"])
        .withColumnRenamed("o_orderpriority", "grp")
    )


# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------

def _oracle_lang_sql() -> str:
    tl = _tok(_FOLD)
    scores = []
    for lang in sorted(T.LANG_STOPWORDS):
        words = ", ".join(f"'{w}'" for w in T.LANG_STOPWORDS[lang])
        scores.append(
            f"CASE WHEN len({tl}) > 0 THEN "
            f"len(list_filter({tl}, t -> list_contains([{words}], t))) / len({tl}) "
            f"ELSE 0.0 END AS s_{lang}"
        )
    return ",\n           ".join(scores)


def _text_stats_sql(src: str = "documents") -> str:
    """The text_stats projection as oracle SQL over table/CTE ``src``
    (shared by text_stats and the curation pipeline)."""
    return f"""
    SELECT doc_id,
           CAST(n_tok AS INTEGER) AS n_tokens,
           CAST(len(regexp_extract_all(text,
                '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 \\t\\n\\x0B\\f\\r]'))
             AS INTEGER) AS n_subwords,
           CAST(n_chars AS INTEGER) AS n_chars_actual,
           ((CASE WHEN n_chars >= 20 AND n_chars <= 2000 THEN 1 ELSE 0 END) +
            (CASE WHEN n_tok > 0 AND nonspace / n_tok >= 3.0
                       AND nonspace / n_tok <= 12.0 THEN 1 ELSE 0 END) +
            (CASE WHEN nonspace > 0 AND alpha / nonspace >= 0.8
                  THEN 1 ELSE 0 END) +
            (CASE WHEN n_tok > 0 AND n_distinct / n_tok >= 0.3
                  THEN 1 ELSE 0 END)) / 4.0 AS quality,
           CASE WHEN greatest(s_de, s_en, s_es, s_fr) <= 0 THEN 'und'
                WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr THEN 'de'
                WHEN s_en >= s_es AND s_en >= s_fr THEN 'en'
                WHEN s_es >= s_fr THEN 'es'
                ELSE 'fr' END AS lang_guess,
           md5(coalesce(array_to_string({_tok(_FOLD)}, ' '), ''))
             AS content_hash,
           coalesce(array_to_string(list_slice(list_sort(
             list_transform({_shingles(_FOLD)}, x -> md5(x))), 1, 4), ''),
             '') AS fingerprint
    FROM (
      SELECT doc_id, text,
           {_oracle_lang_sql()},
           len({_tok('text')}) AS n_tok,
           length(text) AS n_chars,
           length(regexp_replace(text, '[ \\t\\n\\x0B\\f\\r]', '', 'g'))
             AS nonspace,
           length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS alpha,
           len(list_distinct({_tok('text')})) AS n_distinct
      FROM {src})
    """


@query("text_stats", oracle=_text_stats_sql("documents"))
def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document text analysis: token counts, quality, lang-ID,
    content hash, bottom-k fingerprint — one linear scan."""
    return T.text_stats(_docs(spark, sf_dir))


def _pii_oracle() -> str:
    email, ip, phone = (p[1] for p in T.PII_PATTERNS)
    return f"""
    WITH injected AS (
      SELECT doc_id,
             CASE WHEN doc_id % 7 = 0
                  THEN text || ' Contact: user' || CAST(doc_id AS VARCHAR)
                       || '@example.com or 10.0.'
                       || CAST(doc_id % 200 AS VARCHAR)
                       || '.7 or +1 555-123-4567.'
                  ELSE text END AS text
      FROM documents)
    SELECT doc_id,
           regexp_replace(regexp_replace(regexp_replace(text,
             '{email}', '[EMAIL]', 'g'),
             '{ip}', '[IP]', 'g'),
             '{phone}', '[PHONE]', 'g') AS clean_text,
           CAST(len(regexp_extract_all(text, '{email}')) AS INTEGER)
             AS n_email,
           CAST(len(regexp_extract_all(text, '{ip}')) AS INTEGER) AS n_ipv4,
           CAST(len(regexp_extract_all(text, '{phone}')) AS INTEGER)
             AS n_phone
    FROM injected
    """


@query("pii_redaction", oracle=_pii_oracle())
def q_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction (emails / IPv4 / phones -> typed placeholders) with
    per-class match counts — a standard pre-training scrub pass. The
    corpus has no natural PII, so deterministic contact strings are
    injected into every 7th doc; the oracle reproduces the injection.
    One linear JVM-side regex pass per class, no shuffle."""
    docs = _docs(spark, sf_dir)
    injected = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(
                F.col("text"),
                F.lit(" Contact: user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com or 10.0."),
                (F.col("doc_id") % 200).cast("string"),
                F.lit(".7 or +1 555-123-4567."),
            ),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    counts = T.pii_counts("text")
    return injected.select(
        "doc_id",
        T.redact_pii("text").alias("clean_text"),
        counts["email"].alias("n_email"),
        counts["ipv4"].alias("n_ipv4"),
        counts["phone"].alias("n_phone"),
    )


# ---------------------------------------------------------------------------
# multimodal plumbing
# ---------------------------------------------------------------------------

@query(
    "multimodal_frame_sample",
    oracle="""
    WITH media AS (
      SELECT doc_id, text FROM documents WHERE doc_id % 3 = 2),
    idx AS (SELECT unnest(range(0, 4096)) AS f),
    frames AS (
      SELECT m.doc_id, i.f AS frame_idx,
             substring(m.text, i.f * 256 + 1, 256) AS fr
      FROM media m JOIN idx i
        ON i.f * 256 < length(m.text) AND i.f % 4 = 0)
    SELECT doc_id, frame_idx,
           CAST(length(fr) AS BIGINT) AS n_frame_units,
           md5(fr) AS frame_md5
    FROM frames
    """,
)
def q_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling: every 4th 256-byte stride of each video
    payload becomes a row (the 1->N multimodal expansion), hashed
    per-frame. Exercises row-expanding mapInPandas over binary with a
    byte-exact oracle."""
    return M.frame_sample(
        M.synthesize_payloads(_docs(spark, sf_dir)), every_k=4
    )


@query(
    "multimodal_resize",
    oracle="""
    SELECT doc_id,
           CAST(length(substring(text, 1, 256)) AS BIGINT) AS n_units,
           CAST(octet_length(encode(substring(text, 1, 256))) AS BIGINT)
             AS n_bytes,
           md5(substring(text, 1, 256)) AS payload_md5
    FROM documents WHERE doc_id % 3 = 0
    """,
)
def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image 'resize' stage: decode -> clip to 256 units -> re-encode
    inside mapInPandas; the oracle reproduces the decoded-unit clip.
    Payload binary is dropped from the checked projection (the md5
    column pins its exact bytes)."""
    return M.resize_payload(
        M.synthesize_payloads(_docs(spark, sf_dir)), target_units=256
    ).select("doc_id", "n_units", "n_bytes", "payload_md5")


@query(
    "multimodal_features",
    oracle="""
    SELECT doc_id,
           CASE WHEN doc_id % 3 = 0 THEN 'image'
                WHEN doc_id % 3 = 1 THEN 'audio'
                ELSE 'video' END AS modality,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           md5(text) AS payload_md5,
           CAST(CASE WHEN octet_length(encode(text)) = 0 THEN -1
                     ELSE ('0x' || substr(to_hex(encode(text)), 1, 2))::BIGINT
                END AS BIGINT) AS first_byte
    FROM documents
    """,
)
def q_multimodal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-payload feature extraction through Arrow mapInPandas.

    Exercises the real multimodal plumbing (binary column, typed
    metadata, batched pandas UDF) with a deterministic byte-level
    'decoder' the oracle can verify; the five vendored real codecs
    (WAV/BMP/PNG/Y4M/JPEG) have their own queries
    (operators/multimodal.py).
    """
    return M.extract_features(M.synthesize_payloads(_docs(spark, sf_dir)))


@query(
    "heavy_hitters_tokens",
    oracle=f"""
    WITH tok AS (
      SELECT unnest({_tok(_FOLD)}) AS token FROM documents)
    SELECT token, COUNT(*) AS n
    FROM tok GROUP BY token
    ORDER BY n DESC, token ASC
    LIMIT 20
    """,
)
def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide top-20 most frequent tokens (heavy hitters).

    The vocabulary/stopword profiling pass of a training-data
    pipeline. Plan shape: explode -> hash-agg with map-side partial
    aggregation (token counts combine before the shuffle), then
    TakeOrderedAndProject — each partition keeps only its local
    top-20, so the driver merges k*partitions rows, never the
    vocabulary. Tiebreak on token ascending makes top-k deterministic
    across engines and partitionings.
    """
    docs = _docs(spark, sf_dir)
    return (
        docs.select(F.explode(T.tokens(T.ascii_fold("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("token").asc())
        .limit(20)
    )


@query(
    "tfidf_top_terms",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest({_tok(_FOLD)}) AS token FROM documents),
    tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
    dfq AS (SELECT token, COUNT(*) AS doc_freq FROM tf GROUP BY 1),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
      SELECT t.doc_id, t.token, t.tf, d.doc_freq,
             round(t.tf * ln(n.n_docs / d.doc_freq), 9) AS score
      FROM tf t JOIN dfq d USING (token) CROSS JOIN n)
    SELECT doc_id, token, tf, doc_freq, score FROM (
      SELECT *, ROW_NUMBER() OVER
               (PARTITION BY doc_id ORDER BY score DESC, token ASC) AS rk
      FROM scored) WHERE rk <= 3
    """,
)
def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document — the keyword-extraction pass.

    Two keyed aggregations (term counts, then document frequency —
    both map-side combinable) + a broadcast of the one-row corpus
    count + a per-doc window top-k. The doc-frequency side is
    vocabulary-sized, far smaller than the (doc, term) side, and joins
    back on the uniform token key. Scores are rounded to 9 decimals
    BEFORE ranking so the ordering never depends on sub-ulp float
    differences between engines.
    """
    docs = _docs(spark, sf_dir)
    from pyspark.sql import Window

    tok = docs.select(
        "doc_id", F.explode(T.tokens(T.ascii_fold("text"))).alias("token")
    )
    tf = tok.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    dfq = tf.groupBy("token").agg(F.count("*").alias("doc_freq"))
    n = docs.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(dfq, "token")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "score",
            F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("doc_freq")), 9),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("token").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .select("doc_id", "token", "tf", "doc_freq", "score")
    )


@query(
    "curation_pipeline",
    oracle=f"""
    WITH {_CORPUS_EXACT},
    stats AS ({_text_stats_sql('corpus')})
    SELECT doc_id, lang_guess, quality, n_tokens, content_hash FROM (
      SELECT doc_id, lang_guess, quality, n_tokens, content_hash,
             ROW_NUMBER() OVER
               (PARTITION BY content_hash ORDER BY doc_id) AS rn
      FROM stats
      WHERE quality >= 1.0 AND lang_guess <> 'und')
    WHERE rn = 1
    """,
)
def q_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-data curation: score -> filter -> dedup.

    The composed form of the LLM-pipeline operators: per-doc stats
    (one linear scan), quality + language gates (row filters, pushed
    before any shuffle), then exact dedup keeping the min doc_id per
    content hash (the single shuffle, on the uniform md5 key).
    Filter-before-shuffle is the scale-critical ordering: at 100 TB
    the gates cut the corpus before the dedup exchange ever moves it.
    Exact dups are injected (reproduced by the oracle) since the
    corpus has none naturally.
    """
    from pyspark.sql import Window

    stats = T.text_stats(D.with_injected_exact_dups(_docs(spark, sf_dir)))
    kept = stats.where(
        (F.col("quality") >= 1.0) & (F.col("lang_guess") != "und")
    )
    # measured negative result (optimization round 8): rewriting this
    # keep-min as groupBy(content_hash).agg(min(struct(...))) was
    # 4.3 -> 4.6 s at sf0.1 — content hashes are near-unique, so the
    # map-side partial agg builds a full-size struct hash map and
    # compresses nothing (the link_prediction partial-agg lesson);
    # the window's sort of the kept rows is cheaper here. Reverted.
    w = Window.partitionBy("content_hash").orderBy("doc_id")
    return (
        kept.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("doc_id", "lang_guess", "quality", "n_tokens", "content_hash")
    )


@query(
    "chunk_documents_udtf",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_tok('text')} AS toks FROM documents),
    idx AS (
      SELECT doc_id, toks,
             unnest(range(0, CAST(ceil(len(toks) / 50.0) AS BIGINT)))
               AS chunk_idx
      FROM t)
    SELECT doc_id,
           CAST(chunk_idx AS INTEGER) AS chunk_idx,
           array_to_string(
             list_slice(toks, chunk_idx * 50 + 1, chunk_idx * 50 + 50), ' ')
             AS chunk_text,
           CAST(least(50, len(toks) - chunk_idx * 50) AS INTEGER) AS n_tokens
    FROM idx
    """,
)
def q_chunk_documents_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking via a Python UDTF (§2.9 surface).

    Splits each document into 50-token chunks — the 1-row-to-N-rows
    shape Spark 3.5+ models as a user-defined *table* function,
    invoked through a correlated LATERAL join. This is the API-surface
    demo of UDTFs; the same op is expressible with built-in
    slice/sequence (zero Python) and big corpora should prefer that —
    the UDTF path here shows where genuinely imperative row-expansion
    logic would plug in. Chunk boundaries are pure token arithmetic,
    so the DuckDB oracle reproduces them exactly.
    """
    import math
    import re

    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id bigint, chunk_idx int, chunk_text string, n_tokens int")
    class ChunkDoc:
        def eval(self, doc_id, text):  # noqa: ANN001 — UDTF contract
            # explicit class: Python \s is unicode-wide (NBSP, \x85)
            # — a third whitespace definition neither engine uses.
            # No .strip() either: Python strips U+3000 where the SQL
            # tokenizers do not; the empty filter covers ASCII edges
            toks = [
                t
                for t in re.split(r"[ \t\n\x0B\f\r]+", text or "")
                if t
            ]
            for i in range(math.ceil(len(toks) / 50)):
                c = toks[i * 50 : (i + 1) * 50]
                yield doc_id, i, " ".join(c), len(c)

    spark.udtf.register("chunk_doc", ChunkDoc)
    docs = _docs(spark, sf_dir)
    return spark.sql(
        "SELECT c.* FROM {d} d, LATERAL chunk_doc(d.doc_id, d.text) c",
        d=docs,
    )


@query(
    "kmv_set_overlap",
    oracle=K.kmv_overlap_oracle_sql(
        "orders",
        "o_custkey",
        "o_orderpriority = '1-URGENT'",
        "o_orderpriority = '5-LOW'",
    ),
)
def q_kmv_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer-set overlap between urgent and low-priority orders,
    estimated from merged KMV sketches (operators/sketch.kmv_overlap).
    At 100 TB each side's k-minima come from its own bounded scan; the
    merge touches 2k rows. Exact when the union fits in k."""
    o = load_table(spark, sf_dir, "orders")
    return K.kmv_overlap(
        o.where(F.col("o_orderpriority") == "1-URGENT"),
        o.where(F.col("o_orderpriority") == "5-LOW"),
        "o_custkey",
    )


@query(
    "dedup_fuzzy_levenshtein",
    oracle=f"""
    WITH {_CORPUS_NEAR},
    {_LSH_PAIRS}
    SELECT doc_a, doc_b, lev, sim FROM (
      SELECT p.doc_a, p.doc_b,
             CAST(levenshtein(ta.text, tb.text) AS INTEGER) AS lev,
             round(1.0 - levenshtein(ta.text, tb.text) /
                   greatest(length(ta.text), length(tb.text)), 9) AS sim
      FROM pairs p
      JOIN corpus ta ON ta.doc_id = p.doc_a
      JOIN corpus tb ON tb.doc_id = p.doc_b)
    WHERE sim >= 0.8
    """,
)
def q_dedup_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance verify over the LSH candidates: normalized
    Levenshtein similarity >= 0.8. The character-level complement to
    token-level Jaccard (catches in-word edits Jaccard misses).
    O(len^2) per pair, which is exactly why it runs on LSH candidates
    only — never the cross product.
    """
    docs = D.with_injected_near_dups(_docs(spark, sf_dir))
    cand = D.minhash_lsh_pairs(docs).select("doc_a", "doc_b")
    ta = docs.select(F.col("doc_id").alias("doc_a"), F.col("text").alias("text_a"))
    tb = docs.select(F.col("doc_id").alias("doc_b"), F.col("text").alias("text_b"))
    # banded DP (guide §1.2 per-task work): sim >= 0.8 already bounds
    # the edit distance by 0.2*maxlen (+rounding slack), so the
    # 3-arg THRESHOLD levenshtein computes the same value inside an
    # O(len * 0.2 len) band instead of the full O(len^2) table; a
    # pair beyond the band returns -1, and those are exactly the
    # rows the sim filter discards (lossless, same contract as the
    # length prefilter below)
    lev = F.expr(
        "levenshtein(text_a, text_b,"
        " cast(greatest(length(text_a), length(text_b)) * 0.2 as int) + 1)"
    )
    sim = F.round(
        1.0 - lev / F.greatest(F.length("text_a"), F.length("text_b")), 9
    )
    # provably lossless prefilter: lev >= |len_a - len_b|, so a pair
    # whose lengths differ by more than 20% (+1 slack for the rounded
    # boundary) can never reach sim >= 0.8 — the O(len^2) DP runs
    # only on length-compatible candidates
    len_ok = (
        F.abs(F.length("text_a") - F.length("text_b"))
        <= 0.2 * F.greatest(F.length("text_a"), F.length("text_b")) + 1
    )
    return (
        cand.join(ta, "doc_a")
        .join(tb, "doc_b")
        .where(len_ok)
        .select(
            "doc_a",
            "doc_b",
            lev.cast("int").alias("lev"),
            sim.alias("sim"),
        )
        # lev = -1 marks beyond-band pairs; provably sim < 0.8 there
        .where((F.col("lev") >= 0) & (F.col("sim") >= 0.8))
    )


@query(
    "bigram_lm_counts",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_tok(_FOLD)} AS toks FROM documents),
    bg AS (
      SELECT toks[i] AS w1, toks[i + 1] AS w2
      FROM t, LATERAL (SELECT unnest(range(1, len(toks))) AS i)),
    c AS (SELECT w1, w2, COUNT(*) AS n FROM bg GROUP BY 1, 2),
    tot AS (SELECT w1, SUM(n) AS n_w1 FROM c GROUP BY 1)
    SELECT c.w1, c.w2, c.n, CAST(t.n_w1 AS BIGINT) AS n_w1,
           round(c.n / t.n_w1, 9) AS p_cond
    FROM c JOIN tot t USING (w1)
    WHERE c.n >= 3
    """,
)
def q_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus bigram language-model counts with conditional
    probabilities P(w2|w1) — the n-gram statistics pass of a
    training-data pipeline (both for quality heuristics and leakage/
    contamination checks). Two map-side-combinable aggregations over
    the exploded bigrams; the per-w1 totals join back on the uniform
    token key. Probabilities are exact integer ratios rounded to 9
    decimals, so cross-engine hashing is stable. Thresholded at
    n >= 3 to keep the result the size of the frequent-bigram set.
    """
    docs = _docs(spark, sf_dir)
    toks = docs.select(T.tokens(T.ascii_fold("text")).alias("toks"))
    bg = toks.select(
        F.explode(
            F.expr(
                # greatest(...,0): ANSI slice() rejects the -1 length an
                # empty/1-token doc produces
                "transform(slice(toks, 1, greatest(size(toks) - 1, 0)),"
                " (w, i) ->"
                " struct(w AS w1, toks[i + 1] AS w2))"
            )
        ).alias("p")
    ).select("p.w1", "p.w2")
    c = bg.groupBy("w1", "w2").agg(F.count("*").alias("n"))
    tot = c.groupBy("w1").agg(F.sum("n").alias("n_w1"))
    return (
        c.join(tot, "w1")
        .where(F.col("n") >= 3)
        .select(
            "w1",
            "w2",
            "n",
            F.col("n_w1").cast("bigint").alias("n_w1"),
            F.round(F.col("n") / F.col("n_w1"), 9).alias("p_cond"),
        )
    )


@query(
    "feature_hashing",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest({_tok(_FOLD)}) AS token FROM documents)
    SELECT doc_id,
           CAST(('0x' || substr(md5(token), 1, 8))::BIGINT % 1024
                AS INTEGER) AS bucket,
           COUNT(*) AS n
    FROM tok
    WHERE doc_id < 50
    GROUP BY 1, 2
    """,
)
def q_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick featurization: token -> md5 bucket (1024-dim),
    long-form (doc_id, bucket, count) sparse vectors — the fixed-width
    text features fed to downstream ML without a vocabulary build or
    its driver-side dictionary. One exploded scan + one keyed agg;
    bucket ids are md5-uniform so the agg never skews. Restricted to
    doc_id < 50 to keep the oracle result compact.
    """
    docs = _docs(spark, sf_dir).where(F.col("doc_id") < 50)
    tok = docs.select(
        "doc_id", F.explode(T.tokens(T.ascii_fold("text"))).alias("token")
    )
    bucket = (
        F.conv(F.substring(F.md5("token"), 1, 8), 16, 10).cast("bigint")
        % 1024
    ).cast("int")
    return tok.groupBy("doc_id", bucket.alias("bucket")).agg(
        F.count("*").alias("n")
    )


@query(
    "multimodal_features_arrow",
    oracle="""
    SELECT doc_id,
           CASE WHEN doc_id % 3 = 0 THEN 'image'
                WHEN doc_id % 3 = 1 THEN 'audio'
                ELSE 'video' END AS modality,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           md5(text) AS payload_md5,
           lower(substr(hex(encode(text)), 1, 16)) AS prefix_hex
    FROM documents
    """,
)
def q_multimodal_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mapInArrow point on the Python-boundary surface (§2.9,
    next to pandas_udf / applyInPandas / mapInPandas / UDTF /
    applyInPandasWithState): the same binary-payload feature pass as
    ``multimodal_features``, but at RecordBatch granularity — Arrow
    buffers in, Arrow arrays out, no pandas materialization. The
    right boundary when per-payload work is byte-wise (codecs,
    hashing, framing): one fewer copy per batch than mapInPandas,
    identical distribution properties (batch-local, zero shuffle).
    The oracle recomputes length/md5/prefix straight from the source
    bytes, so the Arrow path's byte fidelity is inside the hash.
    """
    return M.extract_features_arrow(
        M.synthesize_payloads(_docs(spark, sf_dir))
    )


@query(
    "hard_negative_mining",
    oracle=f"""
    WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v
               FROM embeddings),
    q AS (SELECT vec_id AS query_id, label AS query_label, v AS qv
          FROM e WHERE vec_id < 8),
    scored AS (
      SELECT q.query_id, q.query_label, e.vec_id AS neighbor_id,
             e.label AS neighbor_label,
             {_oracle_cos('q.qv', 'e.v')} AS cos_sim
      FROM e CROSS JOIN q WHERE e.vec_id <> q.query_id),
    pos AS (
      SELECT query_id, MAX(cos_sim) AS best_pos_sim
      FROM scored WHERE neighbor_label = query_label
      GROUP BY query_id),
    neg AS (
      SELECT query_id, query_label, neighbor_id, neighbor_label,
             cos_sim,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cos_sim DESC, neighbor_id)
               AS rnk
      FROM scored WHERE neighbor_label <> query_label)
    SELECT n.query_id, n.query_label, n.neighbor_id, n.neighbor_label,
           n.cos_sim, CAST(n.rnk AS INTEGER) AS rank, p.best_pos_sim,
           n.cos_sim > p.best_pos_sim AS harder_than_best_pos
    FROM neg n JOIN pos p USING (query_id)
    WHERE n.rnk <= 5
    """,
)
def q_hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive/retrieval training: for
    each query vector, the 5 most-similar vectors with a DIFFERENT
    label — the negatives that actually teach an embedding model —
    each annotated with the query's best same-label similarity and a
    flag for negatives that outrank it (the label-noise /
    false-negative suspects curation reviews by hand).

    Scale shape: queries broadcast against the corpus stream (one
    scan, no shuffle on the corpus side); the per-query top-5 is a
    window PARTITIONED by query; the positive baseline is one
    map-side-combinable max. At 100 TB the corpus side swaps to the
    IVF/PQ bucket probes (ivf_ann_topk / pq_ann_topk) with the same
    different-label predicate pushed into the candidate filter —
    this query certifies the exact semantics those approximate.

    Determinism: cosine accumulates row-locally in list order
    (identical IEEE sums both engines, the ann_topk discipline);
    ties break on neighbor_id.

    Reference parity: none — the training-pair factory of the
    similarity stack (SURVEY beyond-reference mandate).
    """
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("query_label"),
        F.col("embedding").cast("array<double>").alias("qv"),
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("neighbor_label"),
        F.col("embedding").cast("array<double>").alias("cv"),
    )
    scored = (
        # broadcast-ok: fixed 8-query probe set (vec_id < 8)
        c.crossJoin(F.broadcast(q))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "query_label",
            "neighbor_id",
            "neighbor_label",
            S.cosine(F.col("qv"), F.col("cv")).alias("cos_sim"),
        )
    )
    pos = (
        scored.where(F.col("neighbor_label") == F.col("query_label"))
        .groupBy("query_id")
        .agg(F.max("cos_sim").alias("best_pos_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    neg = (
        scored.where(F.col("neighbor_label") != F.col("query_label"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 5)
    )
    # broadcast-ok: one row per query — fixed 8-query probe set
    return neg.join(F.broadcast(pos), "query_id").select(
        "query_id",
        "query_label",
        "neighbor_id",
        "neighbor_label",
        "cos_sim",
        F.col("rank").cast("int").alias("rank"),
        "best_pos_sim",
        (F.col("cos_sim") > F.col("best_pos_sim")).alias(
            "harder_than_best_pos"
        ),
    )
