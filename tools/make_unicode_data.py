"""Deterministic Unicode adversarial corpus for the oracle gate.

Sixth adversarial axis (after stress / zero-row / one-day / NULL-text /
all-duplicate): aggressive non-ASCII text. Clones ``/root/testdata/
sf0.001`` byte-for-byte except ``documents.text``, where every
``doc_id % 7 == 3`` row is replaced by one of thirteen Unicode pockets
(cycled by ``doc_id // 7``), each chosen to expose a class of
cross-engine string-semantics divergence between Spark's JVM string
functions and DuckDB's utf8proc:

 0. German sharp-s case pairs      (upper('ß'): Java 'SS', utf8proc 'ẞ')
 1. Turkish dotted/dotless I       (lower('İ'): Java 'i'+U+0307, utf8proc 'i')
 2. Greek final sigma              (lower('ΟΔΟΣ'): Java '…ς', utf8proc '…σ')
 3. NFC vs NFD pairs               (no engine normalizes — must stay distinct)
 4. Emoji ZWJ / modifier / flags   (codepoint counting through sequences)
 5. Astral-plane letters           (surrogate pairs vs UTF-8 4-byte)
 6. RTL Arabic + Hebrew            (no bidi processing may leak in)
 7. Zero-width chars inside tokens (must NOT split tokens)
 8. NBSP separators                (NOT whitespace in either tokenizer)
 9. CJK with no spaces             (single giant token)
10. Fullwidth forms + U+3000       (ideographic space is NOT a separator)
11. Leading/trailing U+3000        (DuckDB trim() strips it, Spark's does not)
12. U+3000 adjacent to ASCII ws    (edge trim asymmetry shifts token counts)

The round-7 full-gate sweep over this corpus surfaced 26 divergent
queries (every tokenizing query: Java's contextual case mapping vs
utf8proc's on pockets 1-2, and the trim() asymmetry on pocket 11) plus
one real latent bug (dedup_incremental_batch's missing empty-shingle
gate: a single-token batch doc's degenerate minhash probed 11 spurious
candidates). Fix: operators/text.ascii_fold (translate-based ASCII
case fold, the cross-engine-deterministic subset) replaced lower() in
every tokenize/normalize path, trim() left both tokenizers, and the
incremental path got the scan-pushed empty-doc gate.

Corpus invariants queries rely on are PRESERVED: dense doc_id,
``n_chars == len(text)`` (codepoints), all five langs present, every
other table untouched. Closed-form deterministic (no RNG).

Usage: python tools/make_unicode_data.py [out_dir]   (default
/tmp/unicode_sf)
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

REF_DIR = "/root/testdata/sf0.001"

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

POCKETS = [
    # 0: sharp-s case pairs
    "stra\u00dfe STRASSE Stra\u00dfe gro\u00df GROSS weiss",
    # 1: Turkish dotted/dotless I
    "\u0130stanbul ISTANBUL istanbul \u0131 I \u0130 i",
    # 2: Greek final sigma
    "\u039f\u0394\u039f\u03a3 \u03bf\u03b4\u03bf\u03c2 "
    "\u03a3\u03af\u03c3\u03c5\u03c6\u03bf\u03c2 "
    "\u03a3\u0399\u03a3\u03a5\u03a6\u039f\u03a3",
    # 3: NFC vs NFD pairs (combining U+0301/U+0308 in the 2nd of each pair)
    "caf\u00e9 cafe\u0301 na\u00efve nai\u0308ve resume\u0301",
    # 4: emoji ZWJ family, skin-tone modifier, regional-indicator flag
    "\U0001f469\u200d\U0001f469\u200d\U0001f467\u200d\U0001f466 "
    "family \U0001f44d\U0001f3fd thumbs \U0001f1ef\U0001f1f5 "
    "flag",
    # 5: astral-plane letters (mathematical fraktur + Gothic)
    "\U0001d573\U0001d58a\U0001d591\U0001d591\U0001d594 "
    "\U0001d582\U0001d594\U0001d597\U0001d591\U0001d589 "
    "\U00010348\U00010330\U00010339",
    # 6: RTL Arabic + Hebrew
    "\u0645\u0631\u062d\u0628\u0627 "
    "\u0628\u0627\u0644\u0639\u0627\u0644\u0645 "
    "\u05e9\u05dc\u05d5\u05dd \u05e2\u05d5\u05dc\u05dd",
    # 7: zero-width space / joiner inside a token
    "zero\u200bwidth\u200djoined token run",
    # 8: NBSP separators (NOT in the tokenizer's whitespace class)
    "non\u00a0breaking\u00a0space words here",
    # 9: CJK, no spaces
    "\u65e5\u672c\u8a9e\u306e\u30c6\u30ad\u30b9\u30c8\u4e2d\u6587\u6587\u672c\ud55c\uad6d\uc5b4\ud14d\uc2a4\ud2b8",
    # 10: fullwidth forms with internal ideographic spaces
    "\uff26\uff35\uff2c\uff2c\uff37\uff29\uff24\uff34\uff28\u3000\uff54\uff45\uff58\uff54\u3000\uff11\uff12\uff13",
    # 11: leading/trailing ideographic space (the trim() divergence)
    "\u3000leading ideographic space and trailing\u3000",
    # 12: U+3000 ADJACENT to ASCII whitespace at string edges \u2014 the
    # narrow miss of pocket 11 (where U+3000 abuts letters): with a
    # trim() on either engine, DuckDB strips "\u3000 " entirely while
    # Spark strips only the ASCII space, so a whitespace-split token
    # count diverges ('\u3000 x' -> duckdb 1 vs spark 2). Pins the
    # round-8 token_count_bpe_regex fix (trim() dropped, empty tokens
    # filtered on both sides).
    "\u3000 leading pair and trailing pair \u3000",
]


def main(out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    for t in TABLES:
        tab = pq.read_table(os.path.join(REF_DIR, f"{t}.parquet"))
        if t == "documents":
            cols = {c: tab.column(c).to_pylist() for c in tab.column_names}
            n = 0
            for i, did in enumerate(cols["doc_id"]):
                if did % 7 == 3:
                    txt = POCKETS[(did // 7) % len(POCKETS)]
                    cols["text"][i] = txt
                    cols["n_chars"][i] = len(txt)
                    n += 1
            assert n > 0
            tab = pa.table(cols, schema=tab.schema)
        pq.write_table(tab, os.path.join(out_dir, f"{t}.parquet"))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/unicode_sf")
