"""Property depth for the round-4 final tranche: independent Python
recomputation of the rank statistics (Kendall from the raw pair
definition, Kruskal-Wallis from raw ranks, AP from the sorted list,
Theil-Sen from the literal all-pairs median), structural invariants
for PPR / hubness / S-curve / decontamination, and the WAP gate's
publish/reject contract.
"""

from __future__ import annotations

import math

import duckdb

from tests.conftest import SF_DIR


def _rows(spark, name):
    import __spark_entry__ as entrymod

    return entrymod.queries()[name](spark, SF_DIR).collect()


def _duck(sql):
    con = duckdb.connect()
    for t in ("events", "customer", "lineitem", "supplier", "orders",
              "documents", "embeddings"):
        con.execute(f"CREATE VIEW {t} AS FROM '{SF_DIR}/{t}.parquet'")
    return con.execute(sql).fetchall()


class TestKendallTau:
    def test_matches_pair_definition(self, spark):
        [row] = _rows(spark, "kendall_tau_concordance")
        cells = _duck(
            """
            SELECT CAST(l_quantity AS BIGINT),
                   CAST(floor(l_extendedprice / 1000) AS BIGINT),
                   COUNT(*)
            FROM lineitem GROUP BY 1, 2
            """
        )
        c = d = 0
        for i, (xa, ya, ca) in enumerate(cells):
            for xb, yb, cb in cells[i + 1:]:
                if xa == xb or ya == yb:
                    continue
                if (xa < xb) == (ya < yb):
                    c += ca * cb
                else:
                    d += ca * cb
        n = sum(cc for _, _, cc in cells)
        assert row["n"] == n
        assert row["c_pairs"] == c
        assert row["d_pairs"] == d
        assert row["pair_identity_ok"] is True
        tx = row["ties_x"]
        ty = row["ties_y"]
        t_all = n * (n - 1) // 2
        tau = (c - d) / math.sqrt(float(t_all - tx) * float(t_all - ty))
        assert abs(row["tau_b_e6"] - round(tau * 1e6)) <= 1


class TestKruskalWallis:
    def test_matches_raw_rank_recompute(self, spark):
        rows = _rows(spark, "kruskal_wallis_rank_test")
        vals = _duck(
            """
            SELECT o_orderpriority,
                   CAST(floor(o_totalprice * 100) AS BIGINT)
            FROM orders
            """
        )
        n = len(vals)
        svals = sorted(v for _, v in vals)
        # doubled average rank per distinct value
        rank2 = {}
        i = 0
        while i < n:
            j = i
            while j < n and svals[j] == svals[i]:
                j += 1
            rank2[svals[i]] = (i + 1) + j  # 2 * avg of ranks i+1..j
            i = j
        by_g: dict[str, list[int]] = {}
        for g, v in vals:
            by_g.setdefault(g, []).append(v)
        for r in rows:
            vs = by_g[r["priority"]]
            assert r["n_g"] == len(vs)
            assert r["r_x2"] == sum(rank2[v] for v in vs)
            assert r["contrib_r2"] == round(
                float(r["r_x2"] * r["r_x2"]) / (4.0 * r["n_g"])
            )
        total_c = sum(r["contrib_r2"] for r in rows)
        ties = rows[0]["ties_cubed"]
        h = (12.0 / (float(n) * (n + 1)) * total_c - 3.0 * (n + 1)) / (
            1.0 - float(ties) / float(n**3 - n)
        )
        assert all(abs(r["h_e6"] - round(h * 1e6)) <= 1 for r in rows)


class TestAveragePrecision:
    def test_matches_sorted_list_recompute(self, spark):
        [row] = _rows(spark, "average_precision_exact")
        docs = _duck(
            "SELECT 1024 - n_chars, CASE WHEN lang = 'en' THEN 1 ELSE 0 END"
            " FROM documents"
        )
        from collections import defaultdict

        blocks: dict[int, list[int]] = defaultdict(lambda: [0, 0])
        for v, rel in docs:
            blocks[v][0] += rel
            blocks[v][1] += 1
        p_total = sum(a for a, _ in blocks.values())
        ca = ct = 0
        ap_e9 = 0
        best_f1 = 0.0
        for v in sorted(blocks):
            a, t = blocks[v]
            ca += a
            ct += t
            ap_e9 += round(float(a * ca) / (float(ct) * p_total) * 1e9)
            best_f1 = max(best_f1, float(2 * ca) / (ct + p_total))
        assert row["n_docs"] == len(docs)
        assert row["n_rel"] == p_total
        assert row["ap_e9"] == ap_e9
        assert row["best_f1_e6"] == round(best_f1 * 1e6)
        assert row["totals_ok"] is True
        assert 0 <= row["ap_e9"] <= 10**9


class TestLjungBox:
    def test_q_is_sum_of_contribs_and_matches_recompute(self, spark):
        rows = sorted(
            _rows(spark, "ljung_box_whiteness"), key=lambda r: r["k"]
        )
        assert [r["k"] for r in rows] == list(range(1, 8))
        q = rows[0]["q_e9"]
        assert all(r["q_e9"] == q for r in rows)
        assert q == sum(r["contrib_e9"] for r in rows)
        daily = dict(
            _duck(
                """
                SELECT CAST(o_orderdate AS DATE),
                       SUM(CAST(floor(o_totalprice * 100) AS BIGINT))
                FROM orders GROUP BY 1
                """
            )
        )
        n = len(daily)
        s = sum(daily.values())
        dd = sum((n * x - s) ** 2 for x in daily.values())
        import datetime

        for r in rows:
            k = r["k"]
            nn = sum(
                (n * daily[d] - s) * (n * daily[d + datetime.timedelta(k)] - s)
                for d in daily
                if d + datetime.timedelta(k) in daily
            )
            rho = float(nn) / float(dd)
            contrib = rho * rho * (float(n) * (n + 2) / (n - k)) * 1e9
            assert abs(r["contrib_e9"] - round(contrib)) <= 1


class TestTheilSen:
    def test_matches_allpairs_median(self, spark):
        [row] = _rows(spark, "theilsen_robust_slope")
        daily = sorted(
            _duck(
                """
                SELECT date_diff('day', DATE '1970-01-01',
                                 CAST(o_orderdate AS DATE)),
                       SUM(CAST(floor(o_totalprice * 100) AS BIGINT))
                FROM orders GROUP BY 1
                """
            )
        )
        slopes = []
        for i, (da, xa) in enumerate(daily):
            for db, xb in daily[i + 1:]:
                num = (xb - xa) * 10000
                k = db - da
                slopes.append((num - ((num % k) + k) % k) // k)
        slopes.sort()
        n_pairs = len(slopes)
        lower_med = slopes[(n_pairs - 1) // 2]
        assert row["n_days"] == len(daily)
        assert row["n_pairs"] == n_pairs
        assert row["pairs_ok"] is True
        assert row["slope_e4"] == lower_med
        dmin = daily[0][0]
        resid = sorted(
            x * 10000 - lower_med * (d - dmin) for d, x in daily
        )
        assert row["intercept_e4"] == resid[(len(resid) - 1) // 2]


class TestAssortativity:
    def test_matches_python_recompute(self, spark):
        [row] = _rows(spark, "degree_assortativity")
        edges = _duck(
            """
            SELECT DISTINCT o_custkey * 2, l_suppkey * 2 + 1
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            """
        )
        deg: dict[int, int] = {}
        for a, b in edges:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        pairs = [(deg[a], deg[b]) for a, b in edges]
        pairs += [(dy, dx) for dx, dy in pairs]
        m = len(pairs)
        sx = sum(dx for dx, _ in pairs)
        sy = sum(dy for _, dy in pairs)
        sxx = sum(dx * dx for dx, _ in pairs)
        syy = sum(dy * dy for _, dy in pairs)
        sxy = sum(dx * dy for dx, dy in pairs)
        r = float(m * sxy - sx * sy) / math.sqrt(
            float(m * sxx - sx * sx) * float(m * syy - sy * sy)
        )
        assert row["n_nodes"] == len(deg)
        assert row["n_edges"] == len(edges)
        assert row["sym_ok"] is True
        assert abs(row["assortativity_e6"] - round(r * 1e6)) <= 1
        assert -1_000_000 <= row["assortativity_e6"] <= 1_000_000


class TestPersonalizedPageRank:
    def test_mass_bounded_and_partition_invariant(self, spark):
        rows = _rows(spark, "personalized_pagerank_seeded")
        assert 0 < len(rows) <= 50
        assert all(r["ppr_score"] > 0 for r in rows)
        # total walk mass is <= 1 (+ rounding slack): top-50 is a
        # subset of the full sparse vector
        assert sum(r["ppr_score"] for r in rows) <= 1.0 + 1e-6
        before = sorted((r["node"], r["ppr_score"]) for r in rows)
        old = spark.conf.get("spark.sql.shuffle.partitions")
        try:
            spark.conf.set("spark.sql.shuffle.partitions", "3")
            after = sorted(
                (r["node"], r["ppr_score"])
                for r in _rows(spark, "personalized_pagerank_seeded")
            )
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", old)
        assert before == after


class TestHubness:
    def test_skew_consistent_with_histogram(self, spark):
        rows = _rows(spark, "ann_hubness_audit")
        assert rows and all(r["occ_sum_ok"] is True for r in rows)
        n = rows[0]["n_cohort"]
        hist = {r["k_occ"]: r["n_vecs"] for r in rows}
        assert sum(hist.values()) == n
        s = sum(k * v for k, v in hist.items())
        assert s == n * 10
        m2 = sum(v * (n * k - s) ** 2 for k, v in hist.items())
        m3 = sum(v * (n * k - s) ** 3 for k, v in hist.items())
        skew = math.sqrt(float(n)) * float(m3) / (
            float(m2) * math.sqrt(float(m2))
        )
        assert all(
            abs(r["skew_e6"] - round(skew * 1e6)) <= 1 for r in rows
        )
        assert max(hist) == rows[0]["max_occ"]


class TestDecontamination:
    def test_flags_consistent(self, spark):
        rows = _rows(spark, "decontaminate_ngram_windows")
        ids = [r["doc_id"] for r in rows]
        assert len(ids) == len(set(ids))
        assert all(i % 10 == 0 for i in ids)
        for r in rows:
            assert 0 <= r["n_contam"] <= r["n_windows"]
            assert r["drop_doc"] == (r["n_contam"] * 5 > r["n_windows"])
            if r["n_windows"]:
                e6 = (r["n_contam"] * 2000000 + r["n_windows"]) // (
                    2 * r["n_windows"]
                )
            else:
                e6 = 0
            assert r["contam_e6"] == e6


class TestScurve:
    def test_exact_dup_bucket_has_full_recall(self, spark):
        from concurrent_etl_spark.queries_llm5 import (
            _SCURVE_EXPECTED_E6,
            _SCURVE_ROWS,
        )
        from concurrent_etl_spark.operators.dedup import LSH_BANDS

        rows = {r["bucket"]: r for r in _rows(spark, "lsh_scurve_tuning_audit")}
        # identical shingle sets => identical signatures => identical
        # bands: the exact-duplicate bucket cannot miss
        if 10 in rows:
            assert rows[10]["recall_e6"] == 1_000_000
        for b, r in rows.items():
            assert 0 <= r["n_lsh_hit"] <= r["n_true_pairs"]
            assert 0 <= r["recall_e6"] <= 1_000_000
            s = 1.0 if b == 10 else (b * 100 + 50) / 1000.0
            expect = round(
                (1.0 - (1.0 - s**_SCURVE_ROWS) ** LSH_BANDS) * 1e6
            )
            assert r["expected_e6"] == expect == _SCURVE_EXPECTED_E6[b]


class TestWriteAuditPublish:
    def test_gate_blocks_poison_and_is_idempotent(self, spark):
        rows = _rows(spark, "write_audit_publish_txn")
        assert all(r["k"] is not None and r["name"] != "" for r in rows)
        assert all(r["latest_version"] == 2 for r in rows)
        assert all(r["n_rejected"] == 2 for r in rows)
        # the poison tuples themselves, not a bare key that a larger
        # SF's supplier table could legitimately contain
        assert not any(
            r["k"] == 10_000_000_998 or r["name"] == "ghost" for r in rows
        )
        assert not any(r["name"] == "" for r in rows)
        again = _rows(spark, "write_audit_publish_txn")
        assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


class TestPoissonBootstrap:
    def test_matches_python_replicates(self, spark):
        import hashlib

        from concurrent_etl_spark.queries_stats2 import (
            _BOOT_B,
            _POIS_CDF_E9,
        )

        [row] = _rows(spark, "poisson_bootstrap_ci")
        data = _duck(
            "SELECT o_orderkey, CAST(floor(o_totalprice * 100) AS BIGINT)"
            " FROM orders"
        )
        n = len(data)
        sx = sum(x for _, x in data)
        assert row["n"] == n
        assert row["mean_e4"] == (sx * 20000 + n) // (2 * n)
        means = []
        for b in range(_BOOT_B):
            sw = swx = 0
            for k, x in data:
                u = (
                    int(
                        hashlib.md5(f"boot{b}_{k}".encode()).hexdigest()[:8],
                        16,
                    )
                    % 1000000000
                )
                w = sum(1 for c in _POIS_CDF_E9 if u >= c)
                sw += w
                swx += w * x
            means.append((swx * 20000 + sw) // (2 * sw))
        means.sort()
        assert row["ci_lo_e4"] == means[1]
        assert row["ci_hi_e4"] == means[_BOOT_B - 2]
        assert row["ci_ok"] is True
        assert row["ci_lo_e4"] <= row["mean_e4"] <= row["ci_hi_e4"]


class TestBrierDecomposition:
    def test_identity_and_recompute(self, spark):
        rows = _rows(spark, "brier_score_decomposition")
        docs = _duck(
            "SELECT least(15, n_chars // 64),"
            " CASE WHEN lang = 'en' THEN 1 ELSE 0 END FROM documents"
        )
        n = len(docs)
        s = sum(o for _, o in docs)
        sq = sum((p - 16 * o) ** 2 for p, o in docs)
        brier_e9 = round(float(sq) / (256.0 * n) * 1e9)
        unc_e9 = round(float(s * (n - s)) / (float(n) * n) * 1e9)
        for r in rows:
            assert r["brier_e9"] == brier_e9
            assert r["unc_e9"] == unc_e9
            # rounding residue only: one e-9 unit per bin each term
            assert abs(r["identity_gap_e9"]) <= 4 * len(rows)
            assert (
                r["identity_gap_e9"]
                == r["brier_e9"] - (r["rel_e9"] - r["res_e9"] + r["unc_e9"])
            )
        bins = {(r["p16"]): (r["n_k"], r["s_k"]) for r in rows}
        assert sum(nk for nk, _ in bins.values()) == n
        assert sum(sk for _, sk in bins.values()) == s


class TestPhraseQuery:
    def test_matches_python_scan(self, spark):
        rows = _rows(spark, "phrase_query_positional")
        docs = _duck("SELECT doc_id, lower(text) FROM documents")
        expect = {}
        for doc_id, text in docs:
            toks = [t for t in text.strip().split() if t]
            for phrase in ("merge data", "sort the table"):
                terms = phrase.split()
                hits = [
                    i + 1
                    for i in range(len(toks) - len(terms) + 1)
                    if toks[i : i + len(terms)] == terms
                ]
                if hits:
                    expect[(phrase, doc_id)] = (len(hits), hits[0])
        got = {
            (r["phrase"], r["doc_id"]): (r["n_matches"], r["first_pos"])
            for r in rows
        }
        assert got == expect


class TestMMR:
    def test_greedy_recompute(self, spark):
        rows = sorted(_rows(spark, "mmr_diversified_topk"), key=lambda r: r["rank"])
        assert [r["rank"] for r in rows] == [1, 2, 3, 4, 5]
        ids = [r["doc_id"] for r in rows]
        assert len(set(ids)) == 5
        # step 1 is the pure-relevance argmax: no other selected doc
        # may have higher rel_pm than rank 1 (doc_id tiebreak)
        assert all(
            (r["rel_pm"], -r["doc_id"]) <= (rows[0]["rel_pm"], -rows[0]["doc_id"])
            for r in rows[1:]
        )
        assert rows[0]["max_sim_pm"] == 0
        for r in rows:
            assert r["mmr_x10"] == 7 * r["rel_pm"] - 3 * r["max_sim_pm"]
