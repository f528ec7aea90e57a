"""Pair-emitter scaling evidence on the Heaps'-law corpus.

Runs the df-gated pair emitters — the queries deliberately EXCLUDED
from the sf1 gate because the fixed-vocabulary fixture makes them
quadratic (SCALE.md §11b) — on the realistic corpus shape from
``make_heaps_data.py``, at two sizes a 4x apart, with the full
cross-engine hash compare AND per-query wall/rows measurements.

The decisive number is ``growth.rows_ratio`` per query: candidate /
pair counts on a 4x corpus should grow ≈4x (linear, the at-scale
claim) — a quadratic emitter would grow ≈16x. ``spark_sec_ratio``
is the wall-clock corroboration (noisy on this VM; rows_out is the
signal). Planted duplicates (1% exact + 4% near) scale linearly
with the corpus, so the TRUE pair set itself is linear — any
superlinear growth would come from the candidate generators, which
is exactly what the gates/bands are supposed to prevent.

Usage: python tools/heaps_gate.py [round_tag] [n_small] [n_big]
       (defaults: 8 12500 50000)
Writes /root/repo/HEAPS_r{tag}.json.  Corpora are generated into
/tmp/heaps{n} if not already present.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

QUERIES = [
    # the four SCALE.md §11b exclusions
    "dedup_minhash_lsh",
    "duplicate_span_pairs",
    "containment_similarity_join",
    "prefix_filter_jaccard_join",
    # the rest of the shingle-pair family riding the same emitters
    "minhash_containment",
    "dedup_ngram_jaccard",
    "dedup_clusters",
    "winnowing_overlap_pairs",
    "dedup_incremental_batch",
    # the round-8 saturation fix, measured on the corpus that found it
    "dedup_simhash64",
]
# dedup_simhash is deliberately NOT here, and that is itself a Heaps-
# corpus finding (SCALE.md §11e): its 32-bit fingerprint SATURATES on
# realistic Zipf text — at only 5k docs it emits 123k hamming<=3
# pairs (~1% of ALL doc pairs), because short lognormal docs'
# fingerprints are dominated by the shared stopword head. The TRUE
# pair set under that query's definition is quadratic, so running it
# bigger measures output materialization, not candidate generation.
# The scale fix is a wider fingerprint: see dedup_simhash64.


def _corpus(n: int) -> str:
    out = f"/tmp/heaps{n}"
    if not os.path.exists(os.path.join(out, "documents.parquet")):
        subprocess.run(
            [sys.executable, "tools/make_heaps_data.py", str(n), out],
            check=True,
            cwd="/root/repo",
        )
    return out


def main() -> int:
    tag = sys.argv[1] if len(sys.argv) > 1 else "8"
    n_small = int(sys.argv[2]) if len(sys.argv) > 2 else 12_500
    n_big = int(sys.argv[3]) if len(sys.argv) > 3 else 50_000

    sys.path.insert(0, "/root/repo")
    import duckdb
    import __spark_entry__ as entrymod
    from concurrent_etl_spark.engine import get_spark
    from tools.check_oracle import TABLES, value_hash

    spark = get_spark(
        app_name="heaps-gate", extra_conf={"spark.driver.memory": "8g"}
    )
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()

    result: dict = {
        "corpus": "heaps-zipf s=1.1, lognormal lengths, 1% exact + 4% near dups",
        "sizes": {"small": n_small, "big": n_big},
        "queries": {},
    }
    for label, n in (("small", n_small), ("big", n_big)):
        sf_dir = _corpus(n)
        con = duckdb.connect()
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
            )
        for name in QUERIES:
            t0 = time.monotonic()
            sdf = queries[name](spark, sf_dir).toPandas()
            t_spark = time.monotonic() - t0
            spark.catalog.clearCache()
            t0 = time.monotonic()
            odf = con.sql(oracles[name]).fetchdf()
            t_oracle = time.monotonic() - t0
            ok = (
                len(sdf) == len(odf)
                and sorted(sdf.columns) == sorted(odf.columns)
                and value_hash(sdf) == value_hash(odf)
            )
            result["queries"].setdefault(name, {})[label] = {
                "rows": len(sdf),
                "spark_sec": round(t_spark, 2),
                "oracle_sec": round(t_oracle, 2),
                "hash_match": ok,
            }
            print(
                f"{label:5s} {name}: {len(sdf)} rows, spark {t_spark:.1f}s,"
                f" oracle {t_oracle:.1f}s, {'OK' if ok else 'FAIL'}",
                flush=True,
            )
        con.close()

    scale = n_big / n_small
    for name, r in result["queries"].items():
        s, b = r["small"], r["big"]
        r["growth"] = {
            "scale": scale,
            "rows_ratio": round(b["rows"] / max(s["rows"], 1), 2),
            "spark_sec_ratio": round(b["spark_sec"] / max(s["spark_sec"], 0.01), 2),
            "oracle_sec_ratio": round(
                b["oracle_sec"] / max(s["oracle_sec"], 0.01), 2
            ),
        }
    n_ok = sum(
        r[lab]["hash_match"]
        for r in result["queries"].values()
        for lab in ("small", "big")
    )
    result["hash_matches"] = f"{n_ok}/{2 * len(QUERIES)}"
    path = f"/root/repo/HEAPS_r{tag}.json"
    with open(path, "w") as f:
        json.dump(result, f, indent=2)
    print(f"\n{result['hash_matches']} hash-green; wrote {path}")
    return 0 if n_ok == 2 * len(QUERIES) else 1


if __name__ == "__main__":
    raise SystemExit(main())
