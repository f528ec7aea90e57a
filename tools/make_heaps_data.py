"""Heaps'-law corpus generator: at-scale evidence for the pair emitters.

Why this exists (VERDICT r7 missing item 3 / SCALE.md §11b): the
sf-scaled fixture family (`make_scaled_data.py`) draws document text
from a FIXED ~30-word vocabulary, so every shingle's document
frequency grows LINEARLY with corpus size and the df-gated pair
emitters (minhash-LSH, span pairs, containment, PPJoin) — quadratic
in df by design, bounded at real corpora by vocabulary growth — are
intentionally quadratic on that fixture. That is a fixture artifact,
not an engine property: a real crawl obeys Heaps' law (vocabulary
V(n) ≈ K·n^beta) and Zipf's law (rank-frequency ∝ rank^-s), under
which the candidate generators' df-gates and LSH bands keep pair
counts near-linear in corpus size.

This generator produces that corpus shape deterministically:

* tokens drawn from an UNBOUNDED Zipf distribution (numpy `zipf`,
  s = 1.1 → top word ≈ 9.5% of tokens, like "the"; observed
  vocabulary grows ≈ n^0.9 — faster than a real crawl's ≈ n^0.5,
  i.e. CONSERVATIVE: fewer shingle collisions than real text, while
  the stopword-like head still stresses the df-gates and the LSH
  banding exactly the way real text does),
* log-normal document lengths (10..400 words, mean ≈ 70),
* a planted duplicate structure — 1% exact copies and 4% near
  copies (each token of a randomly chosen earlier doc resampled
  with p = 0.05, bigram-shingle Jaccard ≈ 0.8, LSH detection
  probability at 8 bands × 3 rows ≈ 0.998) — so the emitters have
  REAL pairs to find and their outputs stay verifiable against the
  DuckDB oracles,
* pure-ASCII words ("w{rank}"), so every tokenize path is inside
  the cross-engine-deterministic subset.

The other nine tables are copied from ``/root/testdata/sf0.01``
(the emitters only read ``documents``; the gate harness registers
all ten views).

Deterministic: numpy PCG64 seed=11; identical output on every run.

Usage: python tools/make_heaps_data.py [n_docs] [out_dir]
       (defaults: 50000 /tmp/heaps50k)
"""

from __future__ import annotations

import os
import shutil
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REF_DIR = "/root/testdata/sf0.001"
COPY_DIR = "/root/testdata/sf0.01"
COPY_TABLES = (
    "region nation customer supplier part orders lineitem events embeddings"
).split()

ZIPF_S = 1.1
EXACT_DUP_FRAC = 0.01
NEAR_DUP_FRAC = 0.04
MUTATE_P = 0.05
_LANGS = ["en", "en", "zh", "es", "fr", "de"]


def main() -> int:
    n_doc = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/heaps50k"
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(11)

    # --- fresh text: Zipf tokens, log-normal lengths -------------------
    nw = np.clip(np.exp(rng.normal(4.0, 0.7, n_doc)), 10, 400).astype(int)
    draws = rng.zipf(ZIPF_S, int(nw.sum()))
    offs = np.concatenate([[0], np.cumsum(nw)])
    toks = [draws[offs[i] : offs[i + 1]] for i in range(n_doc)]

    # --- planted duplicate structure ----------------------------------
    # decided per doc AFTER the first 100 (so sources exist); exact
    # dups copy verbatim, near dups resample each token with p=0.05.
    roll = rng.random(n_doc)
    src = rng.integers(0, np.maximum(np.arange(n_doc), 1))
    n_exact = n_near = 0
    for i in range(100, n_doc):
        if roll[i] < EXACT_DUP_FRAC:
            toks[i] = toks[src[i]]
            n_exact += 1
        elif roll[i] < EXACT_DUP_FRAC + NEAR_DUP_FRAC:
            base = toks[src[i]].copy()
            mask = rng.random(len(base)) < MUTATE_P
            base[mask] = rng.zipf(ZIPF_S, int(mask.sum()))
            toks[i] = base
            n_near += 1

    texts = [" ".join(f"w{t}" for t in doc) for doc in toks]

    schema = pq.read_schema(os.path.join(REF_DIR, "documents.parquet"))
    tbl = pa.Table.from_pydict(
        {
            "doc_id": np.arange(n_doc),
            "text": texts,
            "lang": [_LANGS[i] for i in rng.integers(0, len(_LANGS), n_doc)],
            "source": [f"src{i}" for i in rng.integers(0, 20, n_doc)],
            "n_chars": np.array([len(t) for t in texts], dtype="int64"),
        }
    ).cast(schema)
    pq.write_table(tbl, os.path.join(out, "documents.parquet"))

    for t in COPY_TABLES:
        shutil.copyfile(
            os.path.join(COPY_DIR, f"{t}.parquet"),
            os.path.join(out, f"{t}.parquet"),
        )

    # --- corpus-shape report (the reason this generator exists) -------
    n_tok = int(nw.sum())
    top = np.bincount(draws[draws < 10_000]).max()
    # Heaps exponent: log-log slope of V(n) between 10% and 100% of
    # the token stream (head checkpoints are startup-transient).
    v_10 = len(np.unique(draws[: n_tok // 10]))
    v_all = len(np.unique(draws))
    beta = np.log(v_all / v_10) / np.log(10)
    print(f"wrote {n_doc} docs ({n_tok} tokens) to {out}")
    print(f"  vocab: {v_all} distinct words, Heaps beta≈{beta:.2f}")
    print(f"  top-word token share: {top / len(draws):.3f}")
    print(f"  planted dups: {n_exact} exact, {n_near} near (p_mut={MUTATE_P})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
