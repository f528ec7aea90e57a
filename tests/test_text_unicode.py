"""Unit pins for the ASCII case fold and the trim-free tokenizer.

The executable form of the cross-engine divergence table that made
``operators/text.ascii_fold`` the house normalization (SCALE.md §11c):
Java's contextual case mapping and DuckDB/utf8proc's simple mapping
disagree on İ / final sigma / ß, and their trim() whitespace sets
differ outside ASCII — so ``lower()`` and ``trim()`` must never touch
document text. These tests pin (a) the divergences are REAL in this
environment (if an engine upgrade ever makes lower() agree, the
asserts say so), and (b) ascii_fold / tokens produce bit-identical
results in both engines on exactly those inputs.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from concurrent_etl_spark.operators.text import ascii_fold, tokens

#: inputs where lower()/trim() diverge between the JVM and utf8proc
DIVERGENT = [
    "İSTANBUL",          # Turkish dotted capital I
    "ΟΔΟΣ",  # Greek all-caps, final-position sigma
    "　leading and trailing　",  # ideographic space
]

#: inputs both engines must treat identically after the fold
FOLD_CASES = [
    "MiXeD ASCII 123",
    "straße STRASSE",
    "İstanbul ISTANBUL ı I",
    "ΟΔΟΣ σίσυφος",
    "café café",
    "non breaking NBSP",
    "　U+3000　EDGES　",
    "zero​width‍ZWJ",
    "\U0001d573\U0001d58a astral \U0001f469‍\U0001f469",
]


def _spark_one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0]["v"]


def test_lower_actually_diverges(spark):
    """The reason ascii_fold exists: engine lower() disagrees."""
    con = duckdb.connect()
    diverged = 0
    for s in DIVERGENT[:2]:
        j = _spark_one(spark, F.lower(F.lit(s)))
        d = con.execute("SELECT lower(?)", [s]).fetchone()[0]
        if j != d:
            diverged += 1
    assert diverged == 2, (
        "Java and utf8proc lower() now agree on İ/Σ — ascii_fold's "
        "rationale needs re-checking (not wrong, just re-document)"
    )
    # trim: DuckDB strips U+3000, Spark does not
    j = _spark_one(spark, F.trim(F.lit(DIVERGENT[2])))
    d = con.execute("SELECT trim(?)", [DIVERGENT[2]]).fetchone()[0]
    assert j.startswith("　") and not d.startswith("　")
    con.close()


@pytest.mark.parametrize("s", FOLD_CASES)
def test_ascii_fold_bit_identical_across_engines(spark, s):
    j = _spark_one(spark, ascii_fold(F.lit(s)))
    con = duckdb.connect()
    d = con.execute(
        "SELECT translate(?, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ',"
        " 'abcdefghijklmnopqrstuvwxyz')",
        [s],
    ).fetchone()[0]
    con.close()
    assert j == d
    # fold is 1:1 per codepoint: length invariant (lower() breaks
    # this on İ — 'İSTANBUL' lowercases to 9 codepoints in the JVM)
    assert len(j) == len(s)
    # non-ASCII untouched, ASCII folded
    assert j == "".join(
        chr(ord(c) + 32) if "A" <= c <= "Z" else c for c in s
    )


@pytest.mark.parametrize(
    "s,expect",
    [
        # ASCII whitespace splits and empties drop — trim not needed
        ("  a  b\tc\n", ["a", "b", "c"]),
        # U+3000 / NBSP / ZWSP are NOT separators (and NOT trimmed)
        ("　x　 y", ["　x　", "y"]),
        ("a b c", ["a b", "c"]),
        ("z​w v", ["z​w", "v"]),
        # vertical tab IS a separator (the Java-vs-RE2 \s pin)
        ("a\x0bb", ["a", "b"]),
        ("", []),
        ("   ", []),
    ],
)
def test_tokens_unicode_semantics(spark, s, expect):
    got = _spark_one(spark, tokens(F.lit(s)))
    assert got == expect
    # the oracle fragment agrees byte-for-byte
    con = duckdb.connect()
    d = con.execute(
        "SELECT list_filter(string_split_regex(?,"
        " '[ \\t\\n\\x0B\\f\\r]+'), t -> t <> '')",
        [s],
    ).fetchone()[0]
    con.close()
    assert d == expect


@pytest.mark.parametrize(
    "s,expect",
    [
        # ß full-folds to ss (case pair collapses)
        ("Straße", "strasse"),
        ("STRASSE", "strasse"),
        # final sigma folds to σ
        ("ΟΔΟΣ", "οδοσ"),
        ("οδος", "οδοσ"),
        # NFC and NFD spellings land on ONE composed form
        ("caf\u00e9", "caf\u00e9"),
        ("cafe\u0301", "caf\u00e9"),  # NFD source: e + combining acute
        # the İ tailoring trap: folds to i + U+0307, NOT plain i
        ("İstanbul", "i̇stanbul"),
        # accents survive casefold — pairs that must NOT collapse
        ("Σίσυφος",
         "σίσυφοσ"),
        # ASCII is just lowercase
        ("MiXeD ascii 123", "mixed ascii 123"),
        # NULL propagates
        (None, None),
    ],
)
def test_nfc_casefold_semantics(spark, s, expect):
    from concurrent_etl_spark.operators.text import nfc_casefold

    got = _spark_one(spark, nfc_casefold(F.lit(s)))
    assert got == expect
