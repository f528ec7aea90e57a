"""Text-analysis operators for LLM training-data pipelines.

Beyond-the-reference surface (north star, SURVEY §7 step 5): token
counting, shingling, quality scoring, language-ID heuristic, document
fingerprinting. Everything is built-in Column expressions — JVM-side,
codegen-friendly, linear scans with no shuffle; at 100 TB these run
embarrassingly parallel over the document partitions.

Cross-engine determinism rules (the DuckDB oracle must reproduce every
value): md5 for hashing (lowercase hex in both engines), list/array
higher-order functions that iterate in element order, and no
engine-native hash/random functions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: tiny per-language stopword lists for the n-gram/stopword language
#: heuristic — deliberately small and hardcoded so the oracle SQL can
#: embed the identical lists.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "it"),
    "de": ("der", "die", "und", "das", "ist", "ein", "zu", "den"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "es"),
    "fr": ("le", "la", "et", "les", "des", "un", "une", "est"),
}


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


#: translate() argument pair for the ASCII case fold — see ascii_fold.
ASCII_UPPER = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
ASCII_LOWER = "abcdefghijklmnopqrstuvwxyz"


def ascii_fold(col: Column | str) -> Column:
    """ASCII-only case fold: translate A-Z to a-z, leave every other
    codepoint untouched.

    This — not lower() — is the catalog's text-normalization
    primitive, because full Unicode case mapping is library-dependent
    and therefore not cross-engine (or cross-version) deterministic:
    Java (Spark) applies contextual rules — lower('İ') is i + U+0307
    (two codepoints), lower('ΟΔΟΣ') ends in final sigma ς — while
    utf8proc (DuckDB) maps İ to plain 'i' and every Σ to σ, and
    upper('ß') is 'SS' in Java but 'ẞ' in utf8proc. A dedup/token
    pipeline whose groups depend on which C library lowercased the
    shard is not reproducible at 100 TB; the deterministic
    cross-engine subset is the ASCII fold (per-codepoint translate,
    bit-identical everywhere), the same choice C4's and many
    production dedup pipelines make. Non-ASCII case pairs simply stay
    distinct — a documented semantics trade, not an accident (the
    unicode adversarial corpus pins it).
    """
    return F.translate(_c(col), ASCII_UPPER, ASCII_LOWER)


def fold_sql(x: str) -> str:
    """The DuckDB-oracle fragment mirroring :func:`ascii_fold` on an
    arbitrary SQL expression ``x`` — the ONE source for the 80-char
    translate literal so the Spark side and every inlined oracle site
    can never drift (queries_llm._FOLD is ``fold_sql('text')``)."""
    return f"translate({x}, '{ASCII_UPPER}', '{ASCII_LOWER}')"


def nfc_casefold(col: Column | str) -> Column:
    """OPT-IN full-Unicode canonicalization: NFC(casefold(x)), as an
    Arrow-batched pandas UDF over Python's unicodedata.

    :func:`ascii_fold` stays the DEFAULT normalization — it is the
    cross-engine-deterministic subset and every tokenize/dedup path
    in the catalog uses it. But a multilingual 100 TB pipeline that
    WANTS non-ASCII case pairs to dedup (Straße == STRASSE,
    ΟΔΟΣ == οδος, NFC café == NFD café) needs a full casefold
    somewhere, and that is inherently library-versioned: the canon
    is defined by the Unicode version of the PYTHON RUNTIME on the
    executors, not by the JVM — pin the Python minor version across
    the cluster (and across reruns) or hashes of the canon column
    drift. Choose this operator when within-pipeline consistency at
    one pinned runtime is enough; keep ascii_fold when outputs must
    be bit-reproducible across engines and library versions forever.

    Semantics: ``unicodedata.normalize("NFC", x.casefold())`` —
    casefold first (ß→ss, Σ/ς→σ, full foldings), then NFC so
    composed/decomposed inputs land on one spelling. NULL→NULL.
    Famous consequence kept on purpose: İ casefolds to i+U+0307,
    which does NOT equal plain "istanbul" — Turkish-locale folding
    is a locale TAILORING no locale-independent canon performs.

    Scale shape: one Arrow-batched projection, no shuffle; the UDF
    is the slow path (~10-100x a JVM translate), so apply it to the
    column once and reuse, never inside a per-token lambda.
    """
    import pandas
    from pyspark.sql.functions import pandas_udf

    def _cf(s: "pandas.Series") -> "pandas.Series":
        import unicodedata

        return s.map(
            lambda x: None
            if x is None
            else unicodedata.normalize("NFC", x.casefold())
        )

    _cf.__annotations__ = {"s": pandas.Series, "return": pandas.Series}
    return pandas_udf(_cf, "string")(_c(col))


def unpushable(pred: Column) -> Column:
    """Wrap a filter predicate so Catalyst cannot push it down.

    Value-identical to ``pred`` (`rand() >= -1` is always true, and a
    NULL ``pred`` stays NULL — Filter drops NULL exactly like false),
    but the CaseWhen containing ``rand()`` makes the whole condition
    non-deterministic and non-splittable, so PushDownPredicates leaves
    the Filter where the query placed it instead of pushing it through
    Project/Repartition to the scan.

    Why this exists (guide §2.5 + §1.2; VERDICT r8 item 1): the
    post-scan spread inserts an Exchange right after a single-split
    scan so map-side work parallelizes — but a *pushable* filter over
    compute-dense derived columns (the gopher/langid quality gates:
    several regexes + HOF token passes per row) gets pushed below that
    Exchange and runs on the one scan core, serializing the most
    expensive per-row compute in the pipeline. Wrapping the heavy,
    non-selective predicate keeps it above the Exchange where all
    cores evaluate it. Use ONLY for compute-dense, non-selective
    predicates: a cheap selective predicate belongs at the scan
    (PushedFilters), where it cuts exchange bytes.

    The same guide-§4.4 mechanism (non-determinism as an optimizer
    fence) Spark documents for expensive UDFs, applied to a built-in
    expression tree.
    """
    return F.when(F.rand() >= F.lit(-1.0), pred).otherwise(F.lit(False))


def tokens(col: Column | str) -> Column:
    """Whitespace tokens, empties dropped (array<string>)."""
    # explicit class, not \s: Java \s includes vertical tab \x0B but
    # RE2 (the oracle engine) does not — the one character where the
    # two engines' whitespace definitions diverge. No trim(): the
    # empty-token filter already handles leading/trailing ASCII
    # whitespace, and the two engines' trim() sets differ outside
    # ASCII (DuckDB strips U+3000 ideographic space, Spark does not).
    return F.filter(
        F.split(_c(col), r"[ \t\n\x0B\f\r]+"), lambda x: x != ""
    )


def shingles_from_tokens(t: Column, n: int = 2) -> Column:
    """Word n-gram shingles from an ALREADY-STAGED token array column.

    Pass a bound column (staged via a prior select), not a tokens()
    expression: higher-order lambdas re-evaluate embedded
    subexpressions per element, which turns shingling into O(n^2)
    re-tokenization (measured ~8x slower at sf0.1).

    Guarded for short docs (fewer than n tokens -> empty array);
    Spark's sequence() would otherwise produce a descending range.
    """
    if n == 2:
        # hot path: direct concat of adjacent elements skips the
        # per-position slice+array_join allocations (measured ~20%
        # faster at sf0.1, identical output)
        gram = lambda i: F.concat(  # noqa: E731
            F.element_at(t, i), F.lit(" "), F.element_at(t, i + 1)
        )
    else:
        gram = lambda i: F.array_join(F.slice(t, i, n), " ")  # noqa: E731
    grams = F.transform(F.sequence(F.lit(1), F.size(t) - (n - 1)), gram)
    return F.array_distinct(
        F.when(F.size(t) >= n, grams).otherwise(F.array().cast("array<string>"))
    )


def shingles(col: Column | str, n: int = 2) -> Column:
    """Word n-gram shingles straight from a text column (convenience).

    Prefer staging tokens first (see shingles_from_tokens) in hot
    paths.
    """
    return shingles_from_tokens(tokens(col), n)


def token_count(col: Column | str) -> Column:
    """Whitespace token count."""
    return F.size(tokens(col))


def bpe_ish_token_count(col: Column | str) -> Column:
    """BPE-ish subword count: alpha runs, digit runs, other symbols.

    A cheap proxy for tokenizer cost accounting over a corpus — the
    regex mirrors common pre-tokenizers (letters / numbers / other).
    """
    # explicit whitespace chars, not \s (Java-vs-RE2 \x0B divergence)
    return F.size(
        F.regexp_extract_all(
            _c(col),
            F.lit(r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 \t\n\x0B\f\r]"),
            0,
        )
    )


def quality_score(text_col: Column | str) -> Column:
    """Heuristic quality score in [0,1] from length/structure ratios.

    Components (equal weight):
      * length_ok : 20..2000 chars
      * token_len : mean token length in [3, 12]
      * alpha_ratio: alphabetic chars / all non-space chars >= 0.8
      * dedup_ratio: distinct tokens / tokens >= 0.3 (boilerplate guard)
    """
    c = _c(text_col)
    t = tokens(c)
    n_tok = F.size(t)
    n_chars = F.length(c)
    nonspace = F.length(F.regexp_replace(c, r"[ \t\n\x0B\f\r]", ""))
    alpha = F.length(F.regexp_replace(c, r"[^a-zA-Z]", ""))
    mean_tok_len = F.when(n_tok > 0, nonspace / n_tok).otherwise(F.lit(0.0))
    distinct_ratio = F.when(n_tok > 0, F.size(F.array_distinct(t)) / n_tok).otherwise(
        F.lit(0.0)
    )
    length_ok = ((n_chars >= 20) & (n_chars <= 2000)).cast("int")
    tok_len_ok = ((mean_tok_len >= 3.0) & (mean_tok_len <= 12.0)).cast("int")
    alpha_ok = (
        F.when(nonspace > 0, alpha / nonspace).otherwise(F.lit(0.0)) >= 0.8
    ).cast("int")
    dedup_ok = (distinct_ratio >= 0.3).cast("int")
    return ((length_ok + tok_len_ok + alpha_ok + dedup_ok) / F.lit(4.0)).alias(
        "quality"
    )


def lang_scores(text_col: Column | str) -> dict[str, Column]:
    """Stopword-hit ratio per language (the language-ID heuristic)."""
    t = tokens(ascii_fold(text_col))
    out = {}
    for lang, words in LANG_STOPWORDS.items():
        hits = F.size(F.filter(t, lambda x: x.isin(*words)))  # noqa: B023
        out[lang] = F.when(F.size(t) > 0, hits / F.size(t)).otherwise(F.lit(0.0))
    return out


def lang_id(text_col: Column | str) -> Column:
    """Argmax language by stopword ratio; 'und' (undetermined) when all 0.

    Deterministic tiebreak: language name ascending — the oracle SQL
    uses the same CASE ladder ordering.
    """
    scores = lang_scores(text_col)
    langs = sorted(scores)  # deterministic evaluation order
    best = None
    best_score = None
    for lang in langs:
        s = scores[lang]
        if best is None:
            best, best_score = F.lit(lang), s
        else:
            cond = s > best_score
            best = F.when(cond, F.lit(lang)).otherwise(best)
            best_score = F.when(cond, s).otherwise(best_score)
    return F.when(best_score > 0, best).otherwise(F.lit("und"))


def fingerprint(text_col: Column | str, k: int = 4) -> Column:
    """Bottom-k shingle-hash document fingerprint (winnowing-style).

    md5 each bigram shingle, sort, keep the k smallest, concatenate —
    a compact near-dup-stable sketch. Normalization: ASCII fold.
    """
    sh = shingles(ascii_fold(text_col), 2)
    hashed = F.array_sort(F.transform(sh, F.md5))
    return F.array_join(F.slice(hashed, 1, k), "")


#: PII patterns shared verbatim with the oracle SQL (RE2/Java-common
#: syntax only: no lookaround, no \b-adjacent unicode classes).
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
    ("phone", r"\+\d{1,2}[ -]\d{3}[ -]\d{3}[ -]\d{4}", "[PHONE]"),
)


def redact_pii(text_col: Column | str) -> Column:
    """Replace emails / IPv4s / phone numbers with typed placeholders.

    Order matters (emails contain dots that the IP pattern could
    otherwise chew on) — applied email -> ip -> phone, identically in
    the oracle. One linear regex pass per pattern, JVM-side."""
    out = _c(text_col)
    for _, pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def pii_counts(text_col: Column | str) -> dict[str, Column]:
    """Match count per PII class (for corpus-level redaction stats)."""
    c = _c(text_col)
    return {
        name: F.size(F.regexp_extract_all(c, F.lit(pat), 0))
        for name, pat, _ in PII_PATTERNS
    }


def content_hash(text_col: Column | str) -> Column:
    """Exact-dup content hash: md5 of whitespace-normalized folded text.

    TOTAL over NULL text (ADVICE r5): array_join of the NULL token
    array is NULL, so without the coalesce a NULL-text row would keep
    a NULL hash on the Spark side while the oracle's
    md5(coalesce(array_to_string(...), '')) canon hashes it to
    md5('') — NULL text canonicalizes with empty/whitespace-only text
    in BOTH engines (they are the same document for dedup purposes).
    """
    norm = F.array_join(tokens(ascii_fold(text_col)), " ")
    return F.md5(F.coalesce(norm, F.lit("")))


def text_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document stats projection used by the catalog query.

    Tokenization is staged ONCE into array columns (toks, toks_l,
    sh_l) and every downstream stat reads the staged arrays —
    without this, each of the ~10 stats re-tokenizes the document
    (higher-order functions are not common-subexpression-eliminated
    across a Project), which measured 5-10x slower.
    """
    c = F.col(text_col)
    staged = docs.select(
        "doc_id",
        c.alias("_text"),
        tokens(c).alias("toks"),
        tokens(ascii_fold(c)).alias("toks_l"),
        F.length(c).alias("n_chars_actual"),
        F.length(
            F.regexp_replace(c, r"[ \t\n\x0B\f\r]", "")
        ).alias("_nonspace"),
        F.length(F.regexp_replace(c, r"[^a-zA-Z]", "")).alias("_alpha"),
    ).withColumn("sh_l", shingles_from_tokens(F.col("toks_l"), 2))

    n_tok = F.size("toks")
    mean_tok_len = F.when(n_tok > 0, F.col("_nonspace") / n_tok).otherwise(F.lit(0.0))
    distinct_ratio = F.when(
        n_tok > 0, F.size(F.array_distinct(F.col("toks"))) / n_tok
    ).otherwise(F.lit(0.0))
    quality = (
        ((F.col("n_chars_actual") >= 20) & (F.col("n_chars_actual") <= 2000)).cast("int")
        + ((mean_tok_len >= 3.0) & (mean_tok_len <= 12.0)).cast("int")
        + (
            F.when(
                F.col("_nonspace") > 0, F.col("_alpha") / F.col("_nonspace")
            ).otherwise(F.lit(0.0))
            >= 0.8
        ).cast("int")
        + (distinct_ratio >= 0.3).cast("int")
    ) / F.lit(4.0)
    # total over NULL text: each CASE in the oracle falls to ELSE 0
    # for a NULL condition, so its quality is 0.0 where Spark's
    # boolean-cast sum is NULL — coalesce to the oracle's semantics
    # (NULL text fails every quality check, like empty text)
    quality = F.coalesce(quality, F.lit(0.0))

    # language scores STAGED as real columns before the argmax ladder:
    # the when-chain references each score ~3x, and repeated
    # higher-order filter subtrees are not reliably CSE'd inside one
    # Project — staging them measured 1.45s -> 0.89s at sf0.1 with
    # identical output
    score_cols = {}
    for lang, words in LANG_STOPWORDS.items():
        def _pred(words=words):  # bind per-language list (not via a
            return lambda x: x.isin(*words)  # 2-arg lambda: F.filter
            # would pass the element INDEX as the second argument)
        hits = F.size(F.filter(F.col("toks_l"), _pred()))
        score_cols[f"_s_{lang}"] = F.when(
            F.size("toks_l") > 0, hits / F.size("toks_l")
        ).otherwise(F.lit(0.0))
    staged = staged.withColumns(score_cols)
    best, best_score = None, None
    for lang in sorted(LANG_STOPWORDS):
        s = F.col(f"_s_{lang}")
        if best is None:
            best, best_score = F.lit(lang), s
        else:
            cond = s > best_score
            best = F.when(cond, F.lit(lang)).otherwise(best)
            best_score = F.when(cond, s).otherwise(best_score)
    lang_guess = F.when(best_score > 0, best).otherwise(F.lit("und"))

    hashed_sh = F.array_sort(F.transform(F.col("sh_l"), F.md5))
    return staged.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        bpe_ish_token_count("_text").alias("n_subwords"),
        "n_chars_actual",
        quality.alias("quality"),
        lang_guess.alias("lang_guess"),
        # coalesce: NULL text must hash/print like empty text, matching
        # the oracle's md5(coalesce(...)) / coalesce(...) canon
        F.md5(
            F.coalesce(F.array_join(F.col("toks_l"), " "), F.lit(""))
        ).alias("content_hash"),
        F.coalesce(
            F.array_join(F.slice(hashed_sh, 1, 4), ""), F.lit("")
        ).alias("fingerprint"),
    )
