"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on
DuckDB over the same parquet dir, then compares row count, sorted
column names, and an order-insensitive value hash.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes for hashing: everything to string via repr-ish canon
    out = pd.DataFrame(index=df.index)
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_float_dtype(s):
            out[c] = s.map(lambda v: None if pd.isna(v) else f"{v:.10g}")
        elif pd.api.types.is_datetime64_any_dtype(s):
            out[c] = s.astype(str)
        else:
            out[c] = s.map(lambda v: None if v is None or v is pd.NaT else str(v))
    out = out.fillna("\x00NULL")
    return out.sort_values(by=list(out.columns)).reset_index(drop=True)


def value_hash(df: pd.DataFrame) -> str:
    import hashlib

    canon = _canon(df)
    h = hashlib.md5()
    h.update("|".join(canon.columns).encode())
    for row in canon.itertuples(index=False):
        h.update(("\x1f".join(row) + "\x1e").encode())
    return h.hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entrymod
    from concurrent_etl_spark.engine import get_spark

    # local-mode driver == whole JVM: the 1 GiB default heap can OOM a
    # broadcast/localCheckpoint-heavy sf0.1 query when other JVMs share
    # the box (seen once: link_prediction_jaccard under 3 concurrent
    # gates). Tool-process-only bump; a real cluster sets its own.
    spark = get_spark(
        app_name="oracle-check",
        extra_conf={"spark.driver.memory": "8g"},
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failed = []
    ran = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        ran += 1
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}", flush=True)
            failed.append(name)
            continue
        finally:
            # catalog-level teardown: queries may persist() internal
            # intermediates whose consumer is the returned (lazy)
            # DataFrame — once evaluated, drop them so a full-catalog
            # run never accumulates cached blocks across 149 queries
            spark.catalog.clearCache()
        if name not in oracles:
            print(f"rows-only  {name}: {len(sdf)} rows (no oracle)", flush=True)
            continue
        try:
            rel = con.sql(oracles[name])
            # driver-canon hazard: DuckDB integer SUM in a final
            # projection returns HUGEINT, which the driver hashes
            # differently from Spark BIGINT even when values match.
            # The %.10g float canon below masks it locally, so make
            # it a hard local failure instead (VERDICT r2 item 3).
            hazard = [
                c
                for c, t in zip(rel.columns, rel.types)
                if str(t).upper() in ("HUGEINT", "UHUGEINT")
            ]
            odf = rel.fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}", flush=True)
            failed.append(name)
            continue
        problems = []
        if hazard:
            problems.append(
                f"oracle HUGEINT cols {hazard} (wrap in CAST(... AS BIGINT))"
            )
        for c in set(sdf.columns) & set(odf.columns):
            skind = "f" if pd.api.types.is_float_dtype(sdf[c]) else (
                "i" if pd.api.types.is_integer_dtype(sdf[c]) else "o"
            )
            okind = "f" if pd.api.types.is_float_dtype(odf[c]) else (
                "i" if pd.api.types.is_integer_dtype(odf[c]) else "o"
            )
            if skind != okind and "o" not in (skind, okind):
                problems.append(
                    f"dtype kind mismatch on {c}: spark {sdf[c].dtype}"
                    f" vs oracle {odf[c].dtype}"
                )
        if len(sdf) != len(odf):
            problems.append(f"rowcount {len(sdf)} != {len(odf)}")
        if sorted(sdf.columns) != sorted(odf.columns):
            problems.append(f"cols {sorted(sdf.columns)} != {sorted(odf.columns)}")
        if not problems and value_hash(sdf) != value_hash(odf):
            problems.append("value hash mismatch")
            # show a small diff sample
            cs, co = _canon(sdf), _canon(odf)
            neq = (cs != co).any(axis=1)
            if neq.any():
                i = neq.idxmax()
                problems.append(f"first diff row {i}: spark={cs.loc[i].tolist()} oracle={co.loc[i].tolist()}")
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems), flush=True)
            failed.append(name)
        else:
            print(f"OK    {name}: {len(sdf)} rows", flush=True)
    print(f"\n{ran - len(failed)}/{ran} passed ({len(queries)} registered)", flush=True)
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
