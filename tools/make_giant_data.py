"""Deterministic giant-document corpus for the oracle gate.

Seventh adversarial axis (after stress / zero-row / one-day /
NULL-text / all-duplicate / unicode): extreme PER-DOCUMENT skew.
Clones ``/root/testdata/sf0.001`` byte-for-byte except two documents:

- doc 42 becomes a 50,000-token document drawn from the corpus's own
  50-word vocabulary (every bigram extremely hot, per-doc token/
  shingle arrays three orders of magnitude beyond the ambient docs) —
  the one-pathological-row case every 100 TB corpus contains, which
  stresses per-row array state, position arithmetic, window sampling,
  and any hidden O(tokens^2) in a per-document pipeline;
- doc 84 becomes a single 100,000-char token with no whitespace at
  all (a minified-JS/base64-blob analog) — zero shingles, maximal
  char-level arrays, the empty-shingle gates' worst input.

The round-7 full-gate run over this corpus was **339/339 green with
no engine changes** — the df-gates, the winnowing/span _MAX_CHARS
caps, the empty-shingle gates, and the staged-token idiom all hold.
What it DID break was the ORACLE side: DuckDB's list_slice copies
O(len) per call, so every slice-per-position n-gram oracle was
O(n^2) per document (one query ran 9+ minutes on doc 42 alone).
Those oracles now use zip-with-shifted-self / per-position element
indexing (see queries_llm._shingles) — measured ~500x faster at 20k
tokens, output-identical, and the whole-catalog sf0.1 gate dropped
proportionally.

Corpus invariants PRESERVED: dense doc_id, ``n_chars == len(text)``,
all five langs, every other table untouched. Closed-form
deterministic (no RNG).

Usage: python tools/make_giant_data.py [out_dir]   (default
/tmp/giant_sf)
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


def giant_text() -> str:
    """50k tokens over the ambient 50-word vocabulary."""
    return " ".join(f"tok{(i * 7) % 50}" for i in range(50_000))


def mono_text() -> str:
    """One 100k-char token, no whitespace anywhere."""
    return "".join("abcdefghij"[(i * 3) % 10] for i in range(100_000))


def main(out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    for t in TABLES:
        tab = pq.read_table(os.path.join(REF_DIR, f"{t}.parquet"))
        if t == "documents":
            cols = {c: tab.column(c).to_pylist() for c in tab.column_names}
            hit = 0
            for i, did in enumerate(cols["doc_id"]):
                if did == 42:
                    cols["text"][i] = giant_text()
                    cols["n_chars"][i] = len(cols["text"][i])
                    hit += 1
                elif did == 84:
                    cols["text"][i] = mono_text()
                    cols["n_chars"][i] = len(cols["text"][i])
                    hit += 1
            assert hit == 2
            tab = pa.table(cols, schema=tab.schema)
        pq.write_table(tab, os.path.join(out_dir, f"{t}.parquet"))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/giant_sf")
