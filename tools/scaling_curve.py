"""Measured scaling evidence: wall time vs scale factor.

Runs representative headline queries at sf0.001 / sf0.01 / sf0.1
(100x data spread) and records best-of-2 wall times plus the
time-ratio per 10x data step. A plan that holds at scale shows
sublinear-to-linear steps (fixed overhead dominates small SFs; the
10x step ratio approaching ~10 means compute scales with data, far
above ~10 means a superlinear blow-up is hiding in the plan).

Usage: python tools/scaling_curve.py [round_tag]
Writes /root/repo/SCALING_r{tag}.json
"""

from __future__ import annotations

import json
import sys
import time

QUERIES = [
    "flagship_confirmation",
    "groupby_agg_pricing",
    "dedup_minhash_lsh",
    "text_stats",
    "pagerank_bipartite",
    "triangle_count",
    "ann_topk_cosine",
    "duplicate_span_pairs",
    "label_propagation_communities",
    # round-3 tranche-4 heavies: the sequential-within-shard packer
    # (Arrow fold), the broadcast-model scorer, and the sweep-line
    # windows — each a different 100 TB shape worth a measured curve
    "greedy_pack_bins",
    "unigram_logprob_quality",
    "max_concurrency_sweep",
    # round-3 final tranche: the two iterative bounded-collect loops
    # (k-means assignment scans, GD's 1-row-per-iteration reduces) —
    # both should track input size linearly
    "kmeans_embedding_clusters",
    "gd_quality_classifier",
    # round-4 tranche: corpus-wide line-hash dedup (two shuffles +
    # doc rollup), fixed-round bipartite degree peeling (fact-sized
    # semi-joins per round), and the bucketed skyline prefix scan
    # (distinct + one partitioned window + bucket-sized collect)
    "line_dedup_ccnet",
    "kcore_interaction_prune",
    "skyline_pareto_parts",
    # round-4 late tranche: the per-char md5 winnowing scan (the
    # catalog's densest per-row expression work) and the df-gated
    # containment pair emitter (output-proportional like span pairs)
    "winnowing_fingerprint",
    "containment_similarity_join",
]

SF_DIRS = {
    "0.001": "/root/testdata/sf0.001",
    "0.01": "/root/testdata/sf0.01",
    "0.1": "/root/testdata/sf0.1",
}

#: queries whose wall time tracks RESULT SIZE, not input size (pair
#: emitters): record rows-out alongside seconds so the curve shows
#: sec/row staying flat while rows grow — the boundedness argument
#: is output-proportionality, not sublinearity
ROWS_OUT = {"duplicate_span_pairs", "containment_similarity_join"}

#: k-core peeling's work unit is the surviving edge set per round
#: (each round = two degree aggs + two semi-joins over the CURRENT
#: edges), so the honest leash is the per-round survival curve the
#: query already returns, plus time normalized by total edges
#: processed across rounds (VERDICT r5 item 8): flat-to-falling
#: nsec/edge across sf steps = the steps are edge-count-driven, not
#: a plan defect.
SURVIVAL = {"kcore_interaction_prune"}

#: triangle counting is inherently superlinear in edges — the honest
#: leash is work-normalized time: with degree orientation the total
#: intersection work is O(m^1.5), so sec / m^1.5 should stay flat or
#: fall as data grows. The query's own result row carries n_edges and
#: n_triangles, so the evidence is free (VERDICT r3 item 6).
WORK_M15 = {"triangle_count"}


def _containment_extra(spark, sf_dir, times):
    """VERDICT r4 item 3: the candidate-pair stage between the
    df-gate and the verify was uninstrumented — record candidates
    and their analytic gate ceiling so the curve shows CANDIDATES
    (not wall time) scaling with the bound."""
    from concurrent_etl_spark import queries_llm7 as L7

    stats = L7.containment_candidate_stats(spark, sf_dir)
    return stats


def _winnowing_extra(spark, sf_dir, times):
    """VERDICT r4 item 3: winnowing's work unit is char-grams; the
    extra columns let the JSON carry ns/gram (flat = linear in
    corpus chars) plus the distinct-hash saturation evidence."""
    from concurrent_etl_spark import queries_llm7 as L7

    return L7.winnowing_work_stats(spark, sf_dir)


#: per-query extra instrumentation: name -> fn(spark, sf_dir, times)
#: returning extra JSON columns for that scale point
EXTRA_STATS = {
    "containment_similarity_join": _containment_extra,
    "winnowing_fingerprint": _winnowing_extra,
}


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "02"
    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entrymod
    from concurrent_etl_spark.engine import get_spark

    spark = get_spark(app_name="scaling-curve")
    queries = entrymod.queries()

    # Protocol (upgraded round 8 after the r7 "unexplained movers"
    # all turned out to be harness-regime artifacts, not plans: the
    # old 1-warmup best-of-2 with no GC settle left C2 compilation
    # and accumulated-session GC pauses inside the timed reps —
    # max_concurrency_sweep read 2.51 s under it and 0.65 s under
    # this protocol, same binary, same plan): TWO untimed passes per
    # plan, a System.gc settle between queries, then best-of-3.
    # An interleaved null probe (bench.py's) records how contended
    # the run was — compare rounds via the ratio when it is > 1.
    import bench

    probe_times: list[float] = []
    _ = bench._null_probe(spark)  # probe codegen warmup
    out: dict[str, dict] = {}
    for name in QUERIES:
        fn = queries[name]
        probe_times.append(bench._null_probe(spark))
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:
            pass
        times: dict[str, float] = {}
        for sf, sf_dir in SF_DIRS.items():
            spark.catalog.clearCache()
            for _ in range(2):
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = float("inf")
            for _ in range(3):
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            times[sf] = round(best, 4)
        out[name] = {
            "sec": times,
            "step_ratio_10x": [
                round(times["0.01"] / times["0.001"], 2),
                round(times["0.1"] / times["0.01"], 2),
            ],
        }
        if name in ROWS_OUT:
            rows = {}
            for sf, sf_dir in SF_DIRS.items():
                spark.catalog.clearCache()
                rows[sf] = fn(spark, sf_dir).count()
            out[name]["rows_out"] = rows
            out[name]["usec_per_row"] = {
                sf: round(times[sf] / max(rows[sf], 1) * 1e6, 1)
                for sf in rows
            }
        if name in EXTRA_STATS:
            extras: dict[str, dict] = {}
            for sf, sf_dir in SF_DIRS.items():
                spark.catalog.clearCache()
                for k, v in EXTRA_STATS[name](spark, sf_dir, times).items():
                    extras.setdefault(k, {})[sf] = v
            out[name].update(extras)
            if "n_candidate_pairs" in extras:
                out[name]["usec_per_candidate"] = {
                    sf: round(
                        times[sf]
                        / max(extras["n_candidate_pairs"][sf], 1)
                        * 1e6,
                        1,
                    )
                    for sf in extras["n_candidate_pairs"]
                }
            if "n_grams_total" in extras:
                out[name]["nsec_per_gram"] = {
                    sf: round(
                        times[sf] / max(extras["n_grams_total"][sf], 1) * 1e9,
                        1,
                    )
                    for sf in extras["n_grams_total"]
                }
        if name in SURVIVAL:
            curve, work_norm = {}, {}
            for sf, sf_dir in SF_DIRS.items():
                spark.catalog.clearCache()
                rows = sorted(
                    fn(spark, sf_dir).collect(),
                    key=lambda r: r["peel_round"],
                )
                curve[sf] = [
                    {
                        "round": r["peel_round"],
                        "edges": r["n_edges"],
                        "users": r["n_users"],
                        "items": r["n_items"],
                    }
                    for r in rows
                ]
                total_edges = sum(r["n_edges"] for r in rows)
                work_norm[sf] = round(
                    times[sf] / max(total_edges, 1) * 1e9, 1
                )
            out[name]["survival_curve"] = curve
            out[name]["nsec_per_edge_round"] = work_norm
        if name in WORK_M15:
            edges, tris, norm = {}, {}, {}
            for sf, sf_dir in SF_DIRS.items():
                spark.catalog.clearCache()
                row = fn(spark, sf_dir).collect()[0]
                edges[sf] = row["n_edges"]
                tris[sf] = row["n_triangles"]
                # nanoseconds per unit of m^1.5 work — flat/falling
                # across sf steps = the O(m^1.5) bound holds measured
                norm[sf] = round(
                    times[sf] / max(edges[sf], 1) ** 1.5 * 1e9, 3
                )
            out[name]["n_edges"] = edges
            out[name]["n_triangles"] = tris
            out[name]["nsec_per_m15"] = norm

    ps = sorted(probe_times)
    out["_probe"] = {
        "ref_sec": bench.PROBE_REF_SEC,
        "min_sec": round(ps[0], 4),
        "median_sec": round(ps[len(ps) // 2], 4),
        "n": len(ps),
        "ratio": round(max(1.0, ps[0] / bench.PROBE_REF_SEC), 4),
    }

    path = f"/root/repo/SCALING_r{tag}.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
