"""Property depth for the round-4 infrastructure/inference tranche:
independent recomputation and the invariants the oracle hash can't
state (permutation exactness, SRM identity, Bloom no-false-negatives,
Bellman-Ford relaxation monotonicity, seasonality closure).
"""

from __future__ import annotations

import gzip
import hashlib
import math

import duckdb
import pytest

from tests.conftest import SF_DIR


def _rows(spark, name):
    import __spark_entry__ as entrymod

    return entrymod.queries()[name](spark, SF_DIR).collect()


def _duck(sql):
    con = duckdb.connect()
    for t in ("events", "customer", "lineitem", "supplier", "orders"):
        con.execute(f"CREATE VIEW {t} AS FROM '{SF_DIR}/{t}.parquet'")
    return con.execute(sql).fetchall()


def _md5_32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


class TestPermutationTest:
    def test_matches_python_signflip(self, spark):
        [row] = _rows(spark, "permutation_test_signflip")
        diffs = _duck(
            """
            SELECT user_id,
                   SUM(CASE WHEN ts >= TIMESTAMP '2024-01-16'
                            THEN CAST(floor(value * 100) AS BIGINT)
                            ELSE 0 END)
                   - SUM(CASE WHEN ts < TIMESTAMP '2024-01-16'
                              THEN CAST(floor(value * 100) AS BIGINT)
                              ELSE 0 END)
            FROM events GROUP BY user_id
            """
        )
        t_obs = sum(d for _, d in diffs)
        assert row["t_obs"] == t_obs
        assert row["n_users"] == len(diffs)
        n_ge = 0
        for b in range(64):
            t_b = sum(
                d if _md5_32(f"perm{b}_{u}") % 2 == 0 else -d
                for u, d in diffs
            )
            if abs(t_b) >= abs(t_obs):
                n_ge += 1
        assert row["n_ge"] == n_ge
        assert row["p_e6"] == ((n_ge + 1) * 2000000 + 65) // 130
        assert 0 < row["p_e6"] <= 1000000


class TestSrmAudit:
    def test_buckets_partition_users_and_identity(self, spark):
        rows = {r["bucket"]: r for r in _rows(spark, "ab_srm_bucketing_audit")}
        assert set(rows) == {0, 1}
        [(n_users,)] = _duck("SELECT COUNT(DISTINCT user_id) FROM events")
        n0, n1 = rows[0]["n_users"], rows[1]["n_users"]
        assert n0 + n1 == n_users
        for r in rows.values():
            assert 0 <= r["n_converted"] <= r["n_users"]
            assert (
                r["conv_rate_e6"]
                == (r["n_converted"] * 2000000 + r["n_users"])
                // (2 * r["n_users"])
            )
            assert r["srm_chisq_e6"] == round(
                (n0 - n1) ** 2 * 1e6 / (n0 + n1)
            )
        # assignment is the md5 parity, recomputed independently
        users = _duck("SELECT DISTINCT user_id FROM events")
        exp0 = sum(1 for (u,) in users if _md5_32(f"ab_{u}") % 2 == 0)
        assert n0 == exp0


class TestSeasonality:
    def test_cells_close_and_deviations_center(self, spark):
        rows = _rows(spark, "seasonality_profile")
        [(n_events, sum_cents)] = _duck(
            "SELECT COUNT(*), SUM(CAST(floor(value*100) AS BIGINT))"
            " FROM events"
        )
        assert sum(r["n_events"] for r in rows) == n_events
        assert sum(r["sum_cents"] for r in rows) == sum_cents
        assert all(0 <= r["dow"] <= 6 and 0 <= r["hod"] <= 23 for r in rows)
        # load deviations are relative-to-uniform: weighted mean ~ 0
        n_cells = len(rows)
        w = sum(r["n_events"] * n_cells - n_events for r in rows)
        assert w == 0  # exact identity on the integer numerators

    def test_epoch_dow_is_calendar_dow(self, spark):
        import datetime

        rows = _rows(spark, "seasonality_profile")
        # 2024-01-01 is a Monday; convention 0=Sunday -> Monday=1.
        # recompute one cell membership from the raw table
        [(us, ts)] = _duck("SELECT MIN(epoch_us(ts)), MIN(ts) FROM events")
        py_dow = (ts.weekday() + 1) % 7  # python Monday=0 -> Sunday=0
        formula_dow = ((us // 86400000000) + 4) % 7
        assert formula_dow == py_dow
        assert any(r["dow"] == formula_dow for r in rows)


class TestBellmanFord:
    def _python_bf(self):
        items = _duck(
            """
            SELECT l_orderkey, l_suppkey,
                   MIN(CAST(floor(l_extendedprice * 100) AS BIGINT))
            FROM lineitem GROUP BY 1, 2
            """
        )
        by_order: dict[int, list[tuple[int, int]]] = {}
        for ok, s, c in items:
            by_order.setdefault(ok, []).append((s, c))
        edges: dict[tuple[int, int], int] = {}
        for members in by_order.values():
            for u, cu in members:
                for v, cv in members:
                    if u != v:
                        k = (u, v)
                        w = cu + cv
                        if k not in edges or w < edges[k]:
                            edges[k] = w
        sources = [
            s for (s,) in _duck(
                "SELECT s_suppkey FROM supplier WHERE s_nationkey % 5 = 0"
            )
        ]
        dist = {s: 0 for s in sources}
        for _ in range(4):
            nxt = dict(dist)
            for (u, v), w in edges.items():
                if u in dist and dist[u] + w < nxt.get(v, math.inf):
                    nxt[v] = dist[u] + w
            dist = nxt
        return dist

    def test_matches_python_relaxation(self, spark):
        got = {
            r["suppkey"]: r["dist_cents"]
            for r in _rows(spark, "bellman_ford_weighted_hops")
        }
        assert got == self._python_bf()

    def test_sources_at_zero_and_triangle_inequality_rounds(self, spark):
        got = {
            r["suppkey"]: r["dist_cents"]
            for r in _rows(spark, "bellman_ford_weighted_hops")
        }
        sources = {
            s for (s,) in _duck(
                "SELECT s_suppkey FROM supplier WHERE s_nationkey % 5 = 0"
            )
        }
        assert sources <= set(got)
        assert all(got[s] == 0 for s in sources)
        assert all(v >= 0 for v in got.values())


class TestBloomFilter:
    def test_no_false_negatives_and_counts(self, spark):
        [row] = _rows(spark, "bloom_filter_probe_audit")
        [(n_building, n_cust)] = _duck(
            """SELECT SUM(CASE WHEN c_mktsegment = 'BUILDING'
                               THEN 1 ELSE 0 END), COUNT(*)
               FROM customer"""
        )
        assert row["n_inserted"] == n_building
        assert row["n_probed"] == n_cust
        assert row["n_false_neg"] == 0  # the Bloom guarantee
        assert row["n_maybe"] == n_building + row["n_false_pos"]
        negatives = n_cust - n_building
        assert (
            row["fp_rate_e6"]
            == (row["n_false_pos"] * 2000000 + negatives) // (2 * negatives)
        )
        # m=4096, k=4, n~n_building: classical bound with slack
        n = n_building
        p_theory = (1 - math.exp(-4 * n / 4096)) ** 4
        assert row["fp_rate_e6"] <= (p_theory + 0.15) * 1e6


class TestJsonlGzip:
    def test_members_are_real_gzip_and_dead_letter_exact(self, spark):
        import glob
        import os
        import tempfile

        rows = _rows(spark, "jsonl_gzip_source_roundtrip")
        dead = [r for r in rows if r["nationkey"] == -1]
        assert len(dead) == 1 and dead[0]["n_supp"] == 2
        [(n_supp,)] = _duck("SELECT COUNT(*) FROM supplier")
        assert sum(r["n_supp"] for r in rows) == n_supp + 2
        # the fixture really is gzip on disk (not renamed plaintext)
        app = spark.sparkContext.applicationId
        tag = hashlib.md5(f"{app}|{SF_DIR}".encode()).hexdigest()[:12]
        d = os.path.join(tempfile.gettempdir(), "ces_jsonlgz", tag)
        parts = glob.glob(os.path.join(d, "part-*.gz"))
        assert parts, "expected gzip members"
        with gzip.open(parts[0], "rt") as fh:
            first = fh.readline()
        assert first.strip().startswith(("{", "not", '{"'))


class TestMultitouchAttribution:
    def test_value_conservation(self, spark):
        rows = _rows(spark, "multitouch_attribution_linear")
        [(total_cents, n_purch)] = _duck(
            """SELECT SUM(CAST(floor(value * 100) AS BIGINT)), COUNT(*)
               FROM events WHERE event_type = 'purchase'"""
        )
        total_attr = sum(
            r["attributed_e6"] or 0 for r in rows
        )
        # each conversion's k credits round within 1/2 each
        slack = sum(r["n_touches"] for r in rows)
        assert abs(total_attr - total_cents * 1000000) <= slack
        assert {r["channel"] for r in rows} <= {"view", "click", "direct"}
        assert sum(r["n_conversions"] for r in rows) >= n_purch

    def test_direct_plus_touched_partition_conversions(self, spark):
        rows = {r["channel"]: r for r in _rows(spark, "multitouch_attribution_linear")}
        [(n_purch,)] = _duck(
            "SELECT COUNT(*) FROM events WHERE event_type = 'purchase'"
        )
        touched = _duck(
            """
            SELECT COUNT(DISTINCT c.event_id)
            FROM events c JOIN events t
              ON t.user_id = c.user_id
             AND c.event_type = 'purchase'
             AND t.event_type IN ('view', 'click')
             AND t.ts < c.ts AND t.ts >= c.ts - INTERVAL 24 HOUR
            """
        )[0][0]
        assert rows["direct"]["n_conversions"] == n_purch - touched


class TestHits:
    def test_matches_python_hits(self, spark):
        got = {
            r["suppkey"]: (r["n_buyers"], r["auth_e6"])
            for r in _rows(spark, "hits_hub_authority")
        }
        edges = _duck(
            """SELECT DISTINCT o.o_custkey, l.l_suppkey
               FROM orders o JOIN lineitem l
                 ON o.o_orderkey = l.l_orderkey"""
        )
        from collections import defaultdict

        by_s, by_c = defaultdict(list), defaultdict(list)
        for c, s in edges:
            by_s[s].append(c)
            by_c[c].append(s)
        a = {s: 1000000 * len(cs) for s, cs in by_s.items()}
        t = sum(a.values())
        a = {s: v * 1000000 // t for s, v in a.items()}
        h = {c: sum(a[s] for s in ss) for c, ss in by_c.items()}
        t = sum(h.values())
        h = {c: v * 1000000 // t for c, v in h.items()}
        a2 = {s: sum(h[c] for c in cs) for s, cs in by_s.items()}
        t = sum(a2.values())
        a2 = {s: v * 1000000 // t for s, v in a2.items()}
        assert got == {
            s: (len(by_s[s]), a2[s]) for s in by_s
        }

    def test_normalized_and_degree_positive(self, spark):
        rows = _rows(spark, "hits_hub_authority")
        total = sum(r["auth_e6"] for r in rows)
        # truncating normalization loses < 1 per node
        assert 1000000 - len(rows) <= total <= 1000000
        assert all(r["n_buyers"] >= 1 for r in rows)


class TestModularity:
    def test_identities_and_bounds(self, spark):
        rows = _rows(spark, "modularity_communities_eval")
        [(m2,)] = _duck(
            """
            WITH raw AS (
              SELECT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
              FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
            cw AS (SELECT src, dst, COUNT(*) AS w FROM raw GROUP BY 1, 2)
            SELECT 2 * SUM(w) FROM cw
            """
        )
        # per-row identity: contrib = w_in * 2m - d_c^2 exactly
        for r in rows:
            assert int(r["contrib_str"]) == r["w_in"] * m2 - r["d_c"] ** 2
            assert 0 <= r["w_in"] <= r["d_c"]
        # degrees partition the total weighted degree
        assert sum(r["d_c"] for r in rows) == m2
        # Q in [-0.5, 1], identical on every row, matches the sum
        qs = {r["modularity_e9"] for r in rows}
        assert len(qs) == 1
        q = qs.pop()
        total = sum(int(r["contrib_str"]) for r in rows)
        assert q == round(total * 1e9 / (float(m2) * m2))
        assert -500000000 <= q <= 1000000000


class TestKAnonymity:
    def test_counts_and_rate(self, spark):
        [row] = _rows(spark, "k_anonymity_audit")
        groups = _duck(
            """SELECT COUNT(*), COUNT(DISTINCT CASE
                 WHEN c_acctbal < 0 THEN 'neg'
                 WHEN c_acctbal < 5000 THEN 'mid' ELSE 'high' END)
               FROM customer GROUP BY c_mktsegment, c_nationkey"""
        )
        sizes = [g for g, _ in groups]
        assert row["n_groups"] == len(groups)
        assert row["n_rows"] == sum(sizes)
        assert row["min_group"] == min(sizes)
        viol = sum(g for g in sizes if g < 5)
        assert row["n_rows_violating"] == viol
        assert row["violation_rate_e6"] == (
            viol * 2000000 + row["n_rows"]
        ) // (2 * row["n_rows"])
        assert row["min_l_diversity"] == min(l for _, l in groups)
        assert row["n_groups_l_homogeneous"] == sum(
            1 for _, l in groups if l < 2
        )


class TestCrossCorrelation:
    def test_symmetric_domain_and_bounds(self, spark):
        rows = sorted(_rows(spark, "crosscorr_lead_lag"), key=lambda r: r["k"])
        assert [r["k"] for r in rows] == list(range(-3, 4))
        for r in rows:
            assert -1000000 <= r["xcorr_e6"] <= 1000000
            assert r["n_pairs"] >= 1
        # pair counts shrink symmetrically with |k| over a dense axis
        n0 = dict((r["k"], r["n_pairs"]) for r in rows)
        assert n0[-1] == n0[1] and n0[-3] == n0[3]


class TestAprioriTriples:
    def test_downward_closure_and_exact_supports(self, spark):
        rows = _rows(spark, "apriori_frequent_triples")
        assert rows
        baskets = _duck(
            "SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem"
        )
        from collections import defaultdict

        by_ok = defaultdict(set)
        for ok, it in baskets:
            by_ok[ok].add(it)

        def support(items):
            return sum(1 for s in by_ok.values() if items <= s)

        for r in rows:
            tri = {r["i1"], r["i2"], r["i3"]}
            assert r["i1"] < r["i2"] < r["i3"]
            assert r["support"] == support(tri)
            assert r["support"] >= 6
            # downward closure: every sub-pair at least as frequent
            for a in tri:
                assert support(tri - {a}) >= r["support"]


class TestConversionLatency:
    def test_quantiles_are_exact_order_statistics(self, spark):
        rows = {r["q"]: r for r in _rows(spark, "conversion_latency_quantiles")}
        lats = [
            m for (m,) in _duck(
                """
                WITH pu AS (
                  SELECT user_id,
                         MIN(CASE WHEN event_type = 'view'
                                  THEN epoch_us(ts) END) AS tv,
                         MIN(CASE WHEN event_type = 'purchase'
                                  THEN epoch_us(ts) END) AS tp
                  FROM events GROUP BY user_id)
                SELECT (tp - tv) // 60000000 FROM pu
                WHERE tv IS NOT NULL AND tp IS NOT NULL AND tp > tv
                """
            )
        ]
        lats.sort()
        n = len(lats)
        for q in (25, 50, 90):
            rank = math.ceil(q * n / 100)
            assert rows[q]["latency_mins"] == lats[rank - 1]
            assert rows[q]["n_converters"] == n
        assert (
            rows[25]["latency_mins"]
            <= rows[50]["latency_mins"]
            <= rows[90]["latency_mins"]
        )


class TestBurstAndSeasonalAnomalies:
    def test_burst_flag_is_the_integer_test(self, spark):
        rows = _rows(spark, "rate_burst_windows")
        hourly = _duck(
            """SELECT epoch_us(ts) // 3600000000, COUNT(*)
               FROM events GROUP BY 1"""
        )
        n_hours = len(hourly)
        total = sum(c for _, c in hourly)
        expect = {
            int(h): c for h, c in hourly if c * n_hours > 2 * total
        }
        got = {r["hour_epoch"]: r["n_events"] for r in rows}
        assert got == expect
        for r in rows:
            assert r["rate_num"] > r["rate_den_2x"]

    def test_seasonal_anomalies_match_python_zscore(self, spark):
        rows = {
            (r["dow"], r["hod"]): r
            for r in _rows(spark, "seasonal_zscore_anomalies")
        }
        base = _duck(
            """SELECT ((epoch_us(ts) // 86400000000) + 4) % 7,
                      (epoch_us(ts) % 86400000000) // 3600000000,
                      CAST(floor(value * 100) AS BIGINT)
               FROM events"""
        )
        from collections import defaultdict

        cells = defaultdict(list)
        for dow, hod, c in base:
            cells[(int(dow), int(hod))].append(int(c))
        expect = {}
        for key, vals in cells.items():
            n = len(vals)
            if n < 2:
                continue
            s = sum(vals)
            ss = sum(v * v for v in vals)
            cnt = sum(
                1
                for v in vals
                if n * (n * v - s) ** 2 > 9 * (n * ss - s * s)
            )
            if cnt:
                expect[key] = cnt
        assert {k: r["n_anomalies"] for k, r in rows.items()} == expect


class TestMixShiftAndGini:
    def test_effects_reconcile_to_total_shift(self, spark):
        rows = _rows(spark, "mix_shift_decomposition")
        agg = _duck(
            """SELECT CASE WHEN ts < TIMESTAMP '2024-01-16'
                           THEN 0 ELSE 1 END AS p,
                      COUNT(*), SUM(CAST(floor(value*100) AS BIGINT))
               FROM events GROUP BY 1 ORDER BY 1"""
        )
        (_, na, sa), (_, nb, sb) = agg
        total_shift_e2 = (sb / nb - sa / na) * 100
        recon = sum(
            r["rate_effect_e2"] + r["mix_effect_e2"] for r in rows
        )
        # per-type e2 rounding leaves at most 1 cent-percent per term
        assert abs(recon - total_shift_e2) <= 2 * len(rows) + 1

    def test_gini_matches_python_lorenz(self, spark):
        [row] = _rows(spark, "key_skew_gini")
        counts = sorted(
            (c, k)
            for k, c in _duck(
                "SELECT o_custkey, COUNT(*) FROM orders GROUP BY 1"
            )
        )
        n = len(counts)
        tot = sum(c for c, _ in counts)
        wsum = sum((i + 1) * c for i, (c, _) in enumerate(counts))
        expect = round((2.0 * wsum / (n * tot) - (n + 1.0) / n) * 1e6)
        assert (row["n_keys"], row["n_rows"]) == (n, tot)
        assert row["gini_e6"] == expect
        assert 0 <= row["gini_e6"] < 1000000


class TestBounceRate:
    def test_rate_identity_and_bounds(self, spark):
        [row] = _rows(spark, "session_bounce_rate")
        assert 0 <= row["n_bounces"] <= row["n_sessions"]
        assert row["bounce_rate_e6"] == (
            row["n_bounces"] * 2000000 + row["n_sessions"]
        ) // (2 * row["n_sessions"])
        assert row["max_session_events"] >= 1
