"""Run any registered catalog query from the command line.

Usage:
    python tools/run_query.py NAME [sf_dir] [--explain] [--limit N]

Examples:
    python tools/run_query.py dedup_minhash_lsh
    python tools/run_query.py tpch_q6_forecast_revenue /root/testdata/sf0.1
    python tools/run_query.py flagship_confirmation --explain

The user-facing entry point for ad-hoc use of the 170+ query catalog
(`QUERIES.md` lists every name with a one-line description); the same
callables the driver harness and bench use, so what you see here is
exactly what gets verified.
"""

from __future__ import annotations

import sys


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    flags = {a for a in sys.argv[1:] if a.startswith("--")}
    limit = 50
    for a in list(flags):
        if a.startswith("--limit="):
            limit = int(a.split("=")[1])
            flags.discard(a)
            flags.add("--limit")
    if not args:
        print(__doc__)
        return 2
    name = args[0]
    sf_dir = args[1] if len(args) > 1 else "/root/testdata/sf0.01"

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entrymod
    from concurrent_etl_spark.engine import get_spark

    queries = entrymod.queries()
    if name not in queries:
        import difflib

        close = difflib.get_close_matches(name, queries, n=5)
        print(f"unknown query {name!r}; close matches: {close}")
        return 2
    spark = get_spark(app_name=f"run-{name}")
    df = queries[name](spark, sf_dir)
    if "--explain" in flags:
        df.explain("formatted")
    # one execution: show() + count() would run the query twice
    rows = df.limit(limit + 1).collect()
    shown = rows[:limit]
    import pandas as pd

    print(pd.DataFrame([r.asDict() for r in shown]).to_string(index=False))
    more = " (more rows not shown)" if len(rows) > limit else ""
    print(f"[{name}] showed {len(shown)} rows at {sf_dir}{more}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
