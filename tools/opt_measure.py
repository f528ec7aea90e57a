"""Optimization-round measurement harness (guide §1).

Times registered queries in isolation with the noop sink (best-of-N
after a warmup rep), labels each job, and optionally dumps
``explain("formatted")`` to ``plans/r08/<name>_<tag>.txt``.

Usage:
    python tools/opt_measure.py [--sf=/root/testdata/sf0.1] [--reps=3]
        [--explain-tag=before] [--plans-dir=/root/repo/plans/r09]
        [--all | NAME ...]

Prints one JSON line: {"sf": ..., "timings": {name: best_sec},
"reps": N}. Methodology matches bench.py: clearCache between reps so
every rep pays the full compute; noop sink so every column of every
row is computed (guide §1.4).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    flags = {a for a in sys.argv[1:] if a.startswith("--")}
    sf_dir = "/root/testdata/sf0.1"
    reps = 3
    explain_tag = None
    plans_dir = "/root/repo/plans/r09"
    for fl in list(flags):
        if fl.startswith("--sf="):
            sf_dir = fl.split("=", 1)[1]
        elif fl.startswith("--reps="):
            reps = int(fl.split("=", 1)[1])
        elif fl.startswith("--explain-tag="):
            explain_tag = fl.split("=", 1)[1]
        elif fl.startswith("--plans-dir="):
            plans_dir = fl.split("=", 1)[1]

    import __spark_entry__ as entrymod
    from concurrent_etl_spark.engine import get_spark

    queries = entrymod.queries()
    names = list(queries) if "--all" in flags else args
    unknown = [n for n in names if n not in queries]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        return 2

    spark = get_spark(
        app_name="opt-measure",
        extra_conf={"spark.driver.memory": "8g"},
    )
    os.makedirs(plans_dir, exist_ok=True)

    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in names:
        sc = spark.sparkContext
        try:
            if explain_tag:
                df = queries[name](spark, sf_dir)
                plan = df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"
                )
                with open(f"{plans_dir}/{name}_{explain_tag}.txt", "w") as f:
                    f.write(plan)
                spark.catalog.clearCache()
            # warmup rep (codegen + parquet footers), untimed
            sc.setJobDescription(f"warmup: {name}")
            spark.catalog.clearCache()
            queries[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            best = float("inf")
            for r in range(reps):
                spark.catalog.clearCache()
                sc.setJobDescription(f"timed[{r}]: {name}")
                t0 = time.perf_counter()
                queries[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                best = min(best, time.perf_counter() - t0)
            timings[name] = round(best, 4)
        except Exception as exc:  # record and continue the sweep
            errors[name] = f"{type(exc).__name__}: {exc}"[:300]
            spark.catalog.clearCache()
        finally:
            sc.setJobDescription(None)
        print(f"  {name}: {timings.get(name, 'ERR')}", file=sys.stderr)

    out = {"sf": sf_dir, "reps": reps, "timings": timings}
    if errors:
        out["errors"] = errors
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
