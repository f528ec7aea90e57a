"""Benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": "...", "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "probe": {...}, "sf": ...}

Each query executes to completion with a cheap terminal action
(count via noop write semantics) so the measured time is the real
plan execution, not just plan construction. A warmup query absorbs
JVM/codegen startup so numbers reflect steady-state throughput.

Noise normalization (VERDICT r7 item 1): this VM's same-binary
headline has measured 12.03 / 17.12 / 35.06 s across one afternoon
(host contention; guest idle), so a raw wall-clock total is not a
round-over-round signal. The bench therefore interleaves a FIXED
null-workload probe — a data-independent compute-bound
spark.range->md5->max that never changes between rounds — through the run, one probe
execution before every timed query. probe_ratio = min(probe)/
PROBE_REF_SEC (the probe's pinned quiet-machine seconds) estimates
how contended this run's quietest moments were; value_normalized =
value / probe_ratio is the comparable number. Interpretation rule:
if probe ratio ~1.0 the raw value IS the signal; a ratio >> 1 says
"machine was busy, trust value_normalized (and re-run if the two
disagree wildly)". Caveat: PROBE_REF_SEC is calibrated at the full
32-core session, and the probe is compute-bound, so running with a
reduced $SPARK_GRAFT_CPUS inflates the ratio by ~32/cores as well —
cross-core-count scaling comparisons must use the RAW value (the
probe separates host contention from engine time only at a fixed
core count).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

#: headline subset — representative of scan, join, agg, window, text ops
HEADLINE = [
    "flagship_confirmation",
    "groupby_agg_pricing",
    "window_topk_per_group",
    "semi_join_inlist",
    "dedup_by_key",
    "tumbling_window_agg",
    "dedup_minhash_lsh",
    "text_stats",
    "ann_topk_cosine",
    "asof_join_prior_click",
    "range_join_events",
    "bigram_doc_score",
    "pagerank_bipartite",
    "funnel_conversion",
]

#: the catalog's true heavies at sf0.1 (VERDICT r4 item 4) — timed
#: and reported as SEPARATE lines so they are regression-tracked
#: round over round, while the 14-query HEADLINE subtotal above
#: stays comparable to BENCH_r01..r04. best-of-3 (not 5): each rep
#: costs 6-10s and the three plans are iterative/pair-emitting, so
#: the steady-state min stabilizes by the third rep.
HEAVY = [
    "kcore_interaction_prune",
    "duplicate_span_pairs",
    "winnowing_fingerprint",
]

#: pinned quiet-machine seconds for one null-probe execution — the
#: probe min observed INSIDE a full isolated bench run (round 8,
#: quiet window: min 0.747 / median 0.828 over 19 probes; a
#: standalone 12-rep calibration saw 0.839 because bench's deeper
#: warmup regime runs the JVM hotter). NEVER recalibrate on a noisy
#: day: the whole point is that this constant encodes "what the
#: probe costs when the host is quiet".
PROBE_REF_SEC = 0.75


def _null_probe(spark) -> float:
    """One execution of the fixed reference workload: 25M-row range
    -> md5(cast) -> global max, noop sink. Data-independent (no file
    IO), 32-way parallel, COMPUTE-BOUND (md5 per row dwarfs the
    scheduling overhead — a shuffle-shaped probe measured ±45%
    rep-to-rep jitter from scheduler latency alone; this one holds
    ±10%), single stage so the default 1g driver heap is never at
    risk. Returns wall seconds."""
    from pyspark.sql import functions as F

    t0 = time.perf_counter()
    (
        spark.range(0, 25_000_000, 1, 32)
        .select(F.md5(F.col("id").cast("string")).alias("h"))
        .agg(F.max("h"))
        .write.format("noop")
        .mode("overwrite")
        .save()
    )
    return time.perf_counter() - t0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]

    from concurrent_etl_spark.engine import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark(app_name="bench")
    queries = entrymod.queries()

    # warmup: run every headline query once untimed — JVM/JIT warmup,
    # codegen compilation, and parquet footer caches are per-plan, so
    # warming one query leaves the others paying compilation inside
    # their timed reps (measured ~2x on the first query in the list)
    # two passes: deep iterative plans (pagerank's unrolled message
    # passing) measured 4.3-5.3s on their first post-warmup rep vs
    # 3.4s steady-state — one warmup leaves C2 compilation inside the
    # timed reps; the second pass costs ~15s once and removes it
    for _ in range(2):
        for name in HEADLINE:
            if name in queries:
                spark.catalog.clearCache()
                queries[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()

    # probe codegen warmup (untimed), then one timed probe per query
    # below — sampling ambient load THROUGH the run, not just at the
    # start
    _null_probe(spark)
    probe_times: list[float] = [_null_probe(spark)]

    timings: dict[str, float] = {}
    for name in HEADLINE:
        if name not in queries:
            continue
        probe_times.append(_null_probe(spark))
        # best-of-5: a single shot conflates engine throughput with
        # ambient machine load and first-use codegen compilation; the
        # min is the reproducible steady-state number. Three isolated
        # best-of-3 runs (r4) landed 13.2-13.6s while their per-query
        # MINIMA summed to 12.6s — the per-rep jitter, not the plans,
        # kept the total high; two extra reps recover most of that
        # envelope for ~30s of extra bench wall time.
        best = float("inf")
        # settle the JVM between queries: earlier queries' cached
        # blocks and shuffle buffers otherwise bleed GC pauses into
        # whichever query happens to run late in the list
        spark.catalog.clearCache()
        try:
            # classic-session only: _jvm is a private gateway absent
            # under Spark Connect — skip the GC settle there
            spark.sparkContext._jvm.System.gc()
        except Exception:
            pass
        for _ in range(5):
            # drop caches a previous rep's internal persist() left
            # behind — each rep must pay the query's full compute
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            df = queries[name](spark, sf_dir)
            # force full execution of every operator in the plan
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)

    heavy: dict[str, float] = {}
    for name in HEAVY:
        if name not in queries:
            continue
        probe_times.append(_null_probe(spark))
        spark.catalog.clearCache()
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:
            pass
        # one untimed warmup rep per heavy plan (codegen + parquet
        # footers), then best-of-3
        queries[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        best = float("inf")
        for _ in range(3):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            queries[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            best = min(best, time.perf_counter() - t0)
        heavy[name] = round(best, 4)

    probe_times.append(_null_probe(spark))

    total = round(sum(timings.values()), 4)
    probe_sorted = sorted(probe_times)
    probe_min = probe_sorted[0]
    probe_median = probe_sorted[len(probe_sorted) // 2]
    # min pairs with the per-query min-of-N: both capture the run's
    # quietest moments; clamp at 1.0 — a quieter-than-calibration
    # machine must not inflate the normalized number
    probe_ratio = max(1.0, probe_min / PROBE_REF_SEC)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "value_normalized": round(total / probe_ratio, 4),
                "probe": {
                    "ref_sec": PROBE_REF_SEC,
                    "min_sec": round(probe_min, 4),
                    "median_sec": round(probe_median, 4),
                    "n": len(probe_times),
                    "ratio": round(probe_ratio, 4),
                },
                "queries": timings,
                "heavy_queries": heavy,
                "heavy_total": round(sum(heavy.values()), 4),
                "heavy_total_normalized": round(
                    sum(heavy.values()) / probe_ratio, 4
                ),
                "sf": float(sf),
            }
        )
    )


if __name__ == "__main__":
    main()
