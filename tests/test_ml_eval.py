"""Property depth for the evaluation/experimentation tranche: the
oracle gate hash-verifies each statistic against DuckDB; these assert
agreement with an INDEPENDENT numpy/pandas recomputation (a third
engine, so a shared-mistake hash match can't hide), plus the
mathematical invariants the SQL comparison can't state (AUC bounds,
KM monotonicity, IG non-negativity, transition rows summing to one).
"""

from __future__ import annotations

import hashlib
import math

import duckdb
import pytest

from tests.conftest import SF_DIR


def _md5_32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _rows(spark, name):
    import __spark_entry__ as entrymod

    return entrymod.queries()[name](spark, SF_DIR).collect()


def _duck(sql):
    con = duckdb.connect()
    for t in ("documents", "events", "orders", "lineitem"):
        con.execute(
            f"CREATE VIEW {t} AS FROM '{SF_DIR}/{t}.parquet'"
        )
    return con.execute(sql).fetchall()


class TestAucRoc:
    def test_matches_numpy_rank_auc(self, spark):
        [(n_pos, n_neg, u1_x2, auc_e6, gini_e6)] = [
            tuple(r) for r in _rows(spark, "auc_roc_exact")
        ]
        pairs = _duck(
            """
            SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END,
                   (100000 * (length(lower(text))
                    - length(replace(lower(text), 'e', ''))))
                     // length(text)
            FROM documents WHERE length(text) > 0
            """
        )
        pos = sorted(v for g, v in pairs if g == 1)
        neg = sorted(v for g, v in pairs if g == 0)
        # brute-force P(pos > neg) + 0.5 P(pos == neg), exact in 2x ints
        wins2 = 0
        for p in pos:
            wins2 += 2 * sum(1 for q in neg if q < p)
            wins2 += sum(1 for q in neg if q == p)
        assert n_pos == len(pos) and n_neg == len(neg)
        assert u1_x2 == wins2
        assert auc_e6 == (wins2 * 1000000 + n_pos * n_neg) // (
            2 * n_pos * n_neg
        )
        assert 0 <= auc_e6 <= 1000000
        assert gini_e6 == 2 * auc_e6 - 1000000

    def test_perfect_and_reversed_ranking_bounds(self, spark):
        # directly exercise the rank-sum identity on constructed data
        from concurrent_etl_spark.queries_stats import _cum_by_value

        import pyspark.sql.functions as F

        df = spark.createDataFrame(
            [(1, v + 100) for v in range(20)]
            + [(0, v) for v in range(20)],
            "g long, v long",
        )
        pv = df.groupBy("v").agg(
            F.sum("g").alias("a"), F.count(F.lit(1)).alias("t")
        )
        cum = _cum_by_value(pv)
        rank2 = 2 * (F.col("cum_t") - F.col("t")) + F.col("t") + 1
        [r1_x2] = cum.agg(F.sum(F.col("a") * rank2)).first()
        u1_x2 = r1_x2 - 20 * 21
        assert u1_x2 == 2 * 20 * 20  # perfect separation -> AUC 1


class TestKaplanMeier:
    def test_matches_python_km(self, spark):
        rows = {
            r["dur_hours"]: r for r in _rows(spark, "kaplan_meier_survival")
        }
        pu = _duck(
            """
            WITH pu AS (
              SELECT user_id, MIN(epoch_us(ts)) AS t0,
                     MIN(CASE WHEN event_type = 'error'
                              THEN epoch_us(ts) END) AS te
              FROM events GROUP BY user_id)
            SELECT CASE WHEN te IS NOT NULL
                         AND te - t0 <= 48 * 3600000000
                        THEN 1 ELSE 0 END,
                   CASE WHEN te IS NOT NULL
                         AND te - t0 <= 48 * 3600000000
                        THEN (te - t0) // 3600000000 ELSE 48 END
            FROM pu
            """
        )
        by_dur: dict[int, list[int]] = {}
        for ev, dur in pu:
            d = by_dur.setdefault(int(dur), [0, 0])
            d[0] += int(ev)
            d[1] += 1
        n_risk = len(pu)
        cum_l = 0
        absorbed = False
        for dur in sorted(by_dur):
            d, leaves = by_dur[dur]
            row = rows[dur]
            assert row["n_at_risk"] == n_risk
            assert row["d_events"] == d
            assert row["c_censored"] == leaves - d
            if d >= n_risk:
                absorbed = True
            elif d > 0:
                # outer round: float*1e12 can sit 1 ulp under the
                # integer the engines' exact decimal multiply yields
                cum_l += round(
                    round(math.log((n_risk - d) / n_risk), 12) * 10**12
                )
            if absorbed:
                assert row["log_surv_e12"] is None
            else:
                assert row["log_surv_e12"] == cum_l
            n_risk -= leaves
        assert set(rows) == {int(d) for d in by_dur}

    def test_curve_monotone(self, spark):
        rows = sorted(
            _rows(spark, "kaplan_meier_survival"),
            key=lambda r: r["dur_hours"],
        )
        risks = [r["n_at_risk"] for r in rows]
        assert risks == sorted(risks, reverse=True)
        logs = [
            r["log_surv_e12"] for r in rows if r["log_surv_e12"] is not None
        ]
        assert all(a >= b for a, b in zip(logs, logs[1:]))
        assert all(v <= 0 for v in logs)


class TestCuped:
    def test_matches_python_moments(self, spark):
        [row] = _rows(spark, "cuped_variance_reduction")
        per_user = _duck(
            """
            SELECT SUM(CASE WHEN ts < TIMESTAMP '2024-01-16'
                            THEN CAST(floor(value * 100) AS BIGINT)
                            ELSE 0 END),
                   SUM(CASE WHEN ts >= TIMESTAMP '2024-01-16'
                            THEN CAST(floor(value * 100) AS BIGINT)
                            ELSE 0 END)
            FROM events GROUP BY user_id
            """
        )
        n = len(per_user)
        sx = sum(x for x, _ in per_user)
        sy = sum(y for _, y in per_user)
        cxx = n * sum(x * x for x, _ in per_user) - sx * sx
        cxy = n * sum(x * y for x, y in per_user) - sx * sy
        cyy = n * sum(y * y for _, y in per_user) - sy * sy
        assert row["n_users"] == n
        assert (row["cxx_str"], row["cxy_str"], row["cyy_str"]) == (
            str(cxx),
            str(cxy),
            str(cyy),
        )
        assert row["theta_e9"] == round(cxy * 1e9 / cxx)
        assert row["rho2_e6"] == round(
            (float(cxy) * float(cxy)) * 1e6 / (float(cxx) * float(cyy))
        )
        assert 0 <= row["rho2_e6"] <= 1000000

    def test_cauchy_schwarz(self, spark):
        [row] = _rows(spark, "cuped_variance_reduction")
        # rho^2 <= 1 is Cauchy-Schwarz on the exact moments
        assert int(row["cxy_str"]) ** 2 <= int(row["cxx_str"]) * int(
            row["cyy_str"]
        )


class TestInfoGain:
    def test_gain_nonnegative_and_best_unique_max(self, spark):
        rows = _rows(spark, "info_gain_feature_split")
        assert len(rows) == 10
        # IG >= 0 for every split (Jensen); rounding slack 1 ulp/term
        assert all(r["ig_n_e12"] >= -4 for r in rows)
        best = max(r["ig_n_e12"] for r in rows)
        flagged = [r for r in rows if r["is_best"]]
        assert flagged and all(r["ig_n_e12"] == best for r in flagged)

    def test_counts_consistent(self, spark):
        rows = _rows(spark, "info_gain_feature_split")
        n = rows[0]["n_left"] + rows[0]["n_right"]
        p = rows[0]["pos_left"] + rows[0]["pos_right"]
        for r in rows:
            assert r["n_left"] + r["n_right"] == n
            assert r["pos_left"] + r["pos_right"] == p
            assert 0 <= r["pos_left"] <= r["n_left"]
            assert 0 <= r["pos_right"] <= r["n_right"]
        # monotone threshold grid -> monotone left sizes
        srt = sorted(rows, key=lambda r: r["theta"])
        sizes = [r["n_left"] for r in srt]
        assert sizes == sorted(sizes)


class TestMarkov:
    def test_rows_sum_to_one_and_totals(self, spark):
        rows = _rows(spark, "markov_transition_matrix")
        by_from: dict[str, list] = {}
        for r in rows:
            by_from.setdefault(r["from_type"], []).append(r)
        for from_type, grp in by_from.items():
            rt = grp[0]["row_total"]
            assert all(r["row_total"] == rt for r in grp)
            assert sum(r["n_trans"] for r in grp) == rt
            p_sum = sum(r["p_e6"] for r in grp)
            # each p rounds within 1/2 ulp -> total within len(grp)/2
            assert abs(p_sum - 1000000) <= (len(grp) + 1) // 2
        [(n_events, n_users)] = _duck(
            "SELECT COUNT(*), COUNT(DISTINCT user_id) FROM events"
        )
        assert (
            sum(r["n_trans"] for r in rows) == n_events - n_users
        )


class TestNaiveBayes:
    def test_confusion_complete_and_learns_the_separable_task(self, spark):
        from concurrent_etl_spark.queries_llm6 import _NB_LANGS

        rows = _rows(spark, "naive_bayes_langid")
        [(n_docs,)] = _duck(
            "SELECT COUNT(*) FROM documents WHERE doc_id < 200"
        )
        assert sum(r["n_docs"] for r in rows) == n_docs
        assert {r["lang_true"] for r in rows} <= set(_NB_LANGS)
        assert {r["lang_pred"] for r in rows} <= set(_NB_LANGS)
        correct = sum(
            r["n_docs"] for r in rows if r["lang_true"] == r["lang_pred"]
        )
        # the benchmark is separable by construction: a correct NB
        # recovers (nearly) all of it; majority-class is 1/5
        assert correct >= 0.9 * n_docs


class TestIsotonicPav:
    def test_matches_sklearn_free_pav(self, spark):
        rows = sorted(
            _rows(spark, "isotonic_calibration_pav"), key=lambda r: r["bin"]
        )
        # classic sequential PAV on the same bins, pooled exactly
        blocks = []  # (pos, n)
        for r in rows:
            blocks.append((r["n_pos"], r["n_docs"]))
            while len(blocks) > 1 and (
                blocks[-2][0] * blocks[-1][1]
                >= blocks[-1][0] * blocks[-2][1]
            ):
                p2, n2 = blocks.pop()
                p1, n1 = blocks.pop()
                blocks.append((p1 + p2, n1 + n2))
        # expand: each block covers as many bins as it pooled
        expanded = []
        i = 0
        for p, n in blocks:
            cnt = 0
            acc_n = 0
            while acc_n < n:
                acc_n += rows[i + cnt]["n_docs"]
                cnt += 1
            expanded.extend([(p, n)] * cnt)
            i += cnt
        assert len(expanded) == len(rows)
        for r, (p, n) in zip(rows, expanded):
            assert r["iso_rate_e9"] == round(p / n * 1e9)

    def test_monotone_and_mean_preserving(self, spark):
        rows = sorted(
            _rows(spark, "isotonic_calibration_pav"), key=lambda r: r["bin"]
        )
        iso = [r["iso_rate_e9"] for r in rows]
        assert iso == sorted(iso)
        assert all(0 <= v <= 10**9 for v in iso)
        # PAV preserves the weighted mean (up to e9 rounding per bin)
        tot_n = sum(r["n_docs"] for r in rows)
        tot_p = sum(r["n_pos"] for r in rows)
        approx = sum(r["n_docs"] * r["iso_rate_e9"] for r in rows) / 1e9
        assert abs(approx - tot_p) <= tot_n / 1e9 + 1e-6


class TestWeightedSampleAres:
    def test_matches_python_ares(self, spark):
        rows = _rows(spark, "weighted_sample_ares")
        got = {}
        for r in rows:
            got.setdefault(r["priority"], []).append((r["rnk"], r["orderkey"]))
        orders = _duck(
            """SELECT o_orderkey, o_orderpriority,
                      CAST(floor(o_totalprice * 100) AS BIGINT)
               FROM orders"""
        )
        by_pri = {}
        for ok, pri, w in orders:
            h = _md5_32(f"ares_{ok}")
            k = round(math.log((h + 1) / 4294967296.0) * 1e12 / w, 12)
            by_pri.setdefault(pri, []).append((-k, ok))
        for pri, lst in by_pri.items():
            lst.sort()
            exp = [(i + 1, ok) for i, (_, ok) in enumerate(lst[:10])]
            assert sorted(got[pri]) == exp

    def test_rank_complete_per_stratum(self, spark):
        rows = _rows(spark, "weighted_sample_ares")
        by_pri = {}
        for r in rows:
            by_pri.setdefault(r["priority"], []).append(r["rnk"])
        for pri, rnks in by_pri.items():
            assert sorted(rnks) == list(range(1, 11))


class TestPmi:
    def test_pmi_formula_and_bounds(self, spark):
        rows = _rows(spark, "pmi_collocations_topk")
        assert len(rows) == 20
        [(n_docs,)] = _duck("SELECT COUNT(DISTINCT doc_id) FROM documents")
        for r in rows:
            assert r["c_ab"] >= 5
            assert r["c_ab"] <= min(r["c_a"], r["c_b"])
            expect = round(
                round(
                    math.log(n_docs * r["c_ab"] / (r["c_a"] * r["c_b"])), 12
                )
                * 10**12
            )
            assert r["pmi_e12"] == expect
            assert r["tok_a"] < r["tok_b"]
        vals = [r["pmi_e12"] for r in rows]
        assert vals == sorted(vals, reverse=True)


class TestHardNegatives:
    def test_ranked_negatives_only_and_flag_semantics(self, spark):
        rows = _rows(spark, "hard_negative_mining")
        by_q = {}
        for r in rows:
            assert r["neighbor_label"] != r["query_label"]
            assert -1.0 - 1e-12 <= r["cos_sim"] <= 1.0 + 1e-12
            assert r["harder_than_best_pos"] == (
                r["cos_sim"] > r["best_pos_sim"]
            )
            by_q.setdefault(r["query_id"], []).append(r)
        for q, grp in by_q.items():
            grp.sort(key=lambda r: r["rank"])
            assert [r["rank"] for r in grp] == [1, 2, 3, 4, 5]
            sims = [r["cos_sim"] for r in grp]
            assert sims == sorted(sims, reverse=True)

    def test_lateral_topk_matches_window_formulation(self, spark):
        import __spark_entry__ as entrymod
        from pyspark.sql import Window
        import pyspark.sql.functions as F
        from concurrent_etl_spark.engine import load_table

        got = sorted(
            tuple(r)
            for r in _rows(spark, "lateral_topk_per_entity")
        )
        cust = load_table(spark, SF_DIR, "customer").where(
            F.col("c_custkey") % 10 == 0
        )
        orders = load_table(spark, SF_DIR, "orders")
        w = Window.partitionBy("o_custkey").orderBy(
            F.col("o_totalprice").desc(), F.col("o_orderkey")
        )
        exp = (
            orders.withColumn("rnk", F.row_number().over(w))
            .where(F.col("rnk") <= 2)
            .join(cust, F.col("o_custkey") == F.col("c_custkey"))
            .select(
                F.col("c_custkey").alias("custkey"),
                F.col("c_mktsegment").alias("segment"),
                F.col("o_orderkey").alias("orderkey"),
                F.col("rnk").cast("long"),
                F.floor(F.col("o_totalprice") * 100)
                .cast("long")
                .alias("order_cents"),
            )
        )
        assert got == sorted(tuple(r) for r in exp.collect())


class TestConformal:
    def test_threshold_is_exact_order_statistic(self, spark):
        [row] = _rows(spark, "conformal_threshold_coverage")
        scores = [
            s for (s,) in _duck(
                """
                WITH base AS (
                  SELECT event_id, event_type,
                         CAST(floor(value * 100) AS BIGINT) AS cents
                  FROM events),
                mu AS (
                  SELECT event_type,
                         CAST((SUM(cents) * 2 + COUNT(*))
                              // (2 * COUNT(*)) AS BIGINT) AS m
                  FROM base WHERE event_id % 2 = 0 GROUP BY event_type)
                SELECT abs(b.cents - mu.m)
                FROM base b JOIN mu USING (event_type)
                WHERE b.event_id % 2 = 0
                """
            )
        ]
        n = len(scores)
        assert row["n_calibration"] == n
        rank = math.ceil((n + 1) * 0.9)
        assert row["threshold"] == sorted(scores)[rank - 1]
        # conformal guarantee holds empirically on exchangeable halves
        assert row["coverage_e6"] >= 850000
        assert (
            row["coverage_e6"]
            == (row["n_covered"] * 2000000 + row["n_test"])
            // (2 * row["n_test"])
        )


class TestDiffInDifferences:
    def test_did_combines_cell_means(self, spark):
        rows = _rows(spark, "diff_in_differences")
        assert len(rows) == 4
        cells = {(r["treated"], r["post"]): r for r in rows}
        assert set(cells) == {(0, 0), (0, 1), (1, 0), (1, 1)}
        mean = lambda t, p: cells[(t, p)]["s"] / cells[(t, p)]["n"]
        expect = round(
            (mean(1, 1) - mean(1, 0)) - (mean(0, 1) - mean(0, 0))
        )
        dids = {r["did_cents"] for r in rows}
        assert dids == {expect}
        for r in rows:
            assert r["mean_e2"] == (r["s"] * 200 + r["n"]) // (2 * r["n"])
        [(n_events,)] = _duck("SELECT COUNT(*) FROM events")
        assert sum(r["n"] for r in rows) == n_events


class TestSpearmanMi:
    def test_spearman_matches_scipy_free_recompute(self, spark):
        [row] = _rows(spark, "spearman_rank_correlation")
        vals = _duck(
            """SELECT CAST(floor(o_totalprice * 100) AS BIGINT),
                      CAST(length(o_orderpriority) * 1000
                           + o_orderkey % 97 AS BIGINT)
               FROM orders"""
        )

        def ranks2(xs):
            from collections import Counter

            cnt = Counter(xs)
            cum = 0
            r = {}
            for v in sorted(cnt):
                t = cnt[v]
                cum += t
                r[v] = 2 * cum - t + 1
            return [r[v] for v in xs]

        rx = ranks2([x for x, _ in vals])
        ry = ranks2([y for _, y in vals])
        n = len(vals)
        sx, sy = sum(rx), sum(ry)
        sxx = sum(v * v for v in rx)
        syy = sum(v * v for v in ry)
        sxy = sum(a * b for a, b in zip(rx, ry))
        num = n * sxy - sx * sy
        den = math.sqrt(float(n * sxx - sx * sx) * float(n * syy - sy * sy))
        assert row["n"] == n
        assert row["spearman_e6"] == round(float(num) * 1e6 / den)
        assert -1000000 <= row["spearman_e6"] <= 1000000

    def test_mi_nonnegative_and_term_identity(self, spark):
        [row] = _rows(spark, "mutual_information_binned")
        cells = _duck(
            """
            WITH b AS (
              SELECT CAST(floor(l_extendedprice / 10000) AS BIGINT) AS px,
                     CAST(l_quantity AS BIGINT) // 10 AS qy
              FROM lineitem)
            SELECT px, qy, COUNT(*) FROM b GROUP BY 1, 2
            """
        )
        n = sum(c for _, _, c in cells)
        from collections import Counter

        r = Counter()
        t = Counter()
        for px, qy, c in cells:
            r[px] += c
            t[qy] += c
        total = 0
        for px, qy, c in cells:
            term = round(round(math.log(n * c / (r[px] * t[qy])), 12) * 10**12)
            total += c * term
        assert row["n_rows"] == n
        assert row["n_cells"] == len(cells)
        assert row["mi_n_e12"] == total
        # MI >= 0 up to per-cell rounding slack
        assert row["mi_n_e12"] >= -len(cells)


class TestQuantileNormalization:
    def test_normalized_distributions_converge_and_identity(self, spark):
        rows = _rows(spark, "quantile_normalization_sources")
        # 20 sources at the test scales
        assert len(rows) >= 2
        [(n_docs,)] = _duck("SELECT COUNT(*) FROM documents")
        assert sum(r["n_docs"] for r in rows) == n_docs
        # after normalization, per-source MEAN lengths must be far
        # closer together than before (that's what the op is for)
        def spread(key):
            means = [r[key] / r["n_docs"] for r in rows]
            return max(means) - min(means)

        assert spread("sum_normalized") <= spread("sum_raw") * 0.5

    def test_mapping_is_exact_order_statistic(self, spark):
        rows = {r["source"]: r for r in _rows(spark, "quantile_normalization_sources")}
        pairs = _duck("SELECT source, n_chars FROM documents")
        from collections import Counter, defaultdict

        pooled = Counter(v for _, v in pairs)
        pcum = {}
        cum = 0
        for v in sorted(pooled):
            cum += pooled[v]
            pcum[v] = cum
        pooled_sorted = sorted(pcum)
        n = len(pairs)
        by_src = defaultdict(Counter)
        for s, v in pairs:
            by_src[s][v] += 1
        for s, cnt in by_src.items():
            n_s = sum(cnt.values())
            cumv = 0
            total = 0
            for v in sorted(cnt):
                cumv += cnt[v]
                tr = (cumv * 2 * n + n_s) // (2 * n_s)
                vn = next(
                    pv for pv in pooled_sorted if pcum[pv] >= tr
                )
                total += cnt[v] * vn
            assert rows[s]["sum_normalized"] == total


class TestNegativeSampling:
    def test_pow34_weights_exact(self, spark):
        rows = _rows(spark, "negative_sampling_table")
        assert len(rows) == 30
        for r in rows:
            w = round(math.sqrt(math.sqrt(float(r["freq"]) ** 3)) * 1e6)
            assert r["w_e6"] == w
            assert 0 < r["p_e9"] <= 10**9
        ws = [r["w_e6"] for r in rows]
        assert ws == sorted(ws, reverse=True)
