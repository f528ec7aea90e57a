"""Property depth for the hypothesis-test tranche: the oracle gate
hash-verifies each statistic against DuckDB; these assert the
INVARIANTS the SQL comparison can't state — agreement with an
independent numpy computation, partition invariance of the
bucket-offset cumsum, and the fixed-width dead-letter contract."""

from __future__ import annotations

import math

import pytest

from tests.conftest import SF_DIR


def _rows(spark, name):
    import __spark_entry__ as entrymod

    return entrymod.queries()[name](spark, SF_DIR).collect()


class TestCumByValue:
    def _pv(self, spark, n_parts):
        data = [(v, v % 3, 1 + v % 2) for v in range(-50, 2_100_000, 997)]
        df = spark.createDataFrame(data, "v long, a long, t long")
        return df.repartition(n_parts)

    @pytest.mark.parametrize("n_parts", [1, 7])
    def test_matches_sequential_cumsum_any_partitioning(self, spark, n_parts):
        from concurrent_etl_spark.queries_stats import _cum_by_value

        got = {
            r["v"]: (r["cum_a"], r["cum_t"])
            for r in _cum_by_value(self._pv(spark, n_parts)).collect()
        }
        ca = ct = 0
        for v, a, t in sorted(
            (v, v % 3, 1 + v % 2) for v in range(-50, 2_100_000, 997)
        ):
            ca += a
            ct += t
            assert got[v] == (ca, ct), v

    def test_negative_values_bucket_correctly(self, spark):
        # v div 2^20 on negatives: all sample values must still come
        # out in global order with exact cumulative counts
        from concurrent_etl_spark.queries_stats import _cum_by_value

        df = spark.createDataFrame(
            [(-3_000_000, 1, 1), (-1, 0, 2), (0, 1, 1), (5, 0, 3)],
            "v long, a long, t long",
        )
        rows = sorted(_cum_by_value(df).collect(), key=lambda r: r["v"])
        assert [(r["cum_a"], r["cum_t"]) for r in rows] == [
            (1, 1),
            (1, 3),
            (2, 4),
            (2, 7),
        ]


class TestKSTwoSample:
    def test_matches_numpy_ecdf_max_gap(self, spark, tables):
        import numpy as np

        row = _rows(spark, "ks_two_sample")[0]
        cust = tables["customer"].toPandas()
        orders = tables["orders"].toPandas()
        j = orders.merge(
            cust[cust.c_mktsegment.isin(["BUILDING", "MACHINERY"])],
            left_on="o_custkey",
            right_on="c_custkey",
        )
        v = np.floor(j.o_totalprice.to_numpy() * 100).astype(np.int64)
        g1 = np.sort(v[j.c_mktsegment.to_numpy() == "BUILDING"])
        g2 = np.sort(v[j.c_mktsegment.to_numpy() != "BUILDING"])
        assert (row["n1"], row["n2"]) == (len(g1), len(g2))
        allv = np.unique(v)
        c1 = np.searchsorted(g1, allv, side="right")
        c2 = np.searchsorted(g2, allv, side="right")
        num = np.abs(c1 * len(g2) - c2 * len(g1)).max()
        assert row["ks_num"] == num
        den = len(g1) * len(g2)
        assert row["ks_e6"] == (num * 2_000_000 + den) // (2 * den)


class TestMannWhitneyU:
    def test_matches_scipy_free_rank_sum(self, spark, tables):
        import numpy as np
        import pandas as pd

        row = _rows(spark, "mann_whitney_u")[0]
        orders = tables["orders"].toPandas()
        sel = orders[orders.o_orderpriority.isin(["1-URGENT", "5-LOW"])]
        v = np.floor(sel.o_totalprice.to_numpy() * 100).astype(np.int64)
        g = (sel.o_orderpriority == "1-URGENT").to_numpy()
        ranks = pd.Series(v).rank(method="average").to_numpy()
        r1_x2 = int(round(2 * ranks[g].sum()))
        n1, n2 = int(g.sum()), int((~g).sum())
        assert (row["n1"], row["n2"]) == (n1, n2)
        assert row["r1_x2"] == r1_x2
        assert row["u1_x2"] == r1_x2 - n1 * (n1 + 1)
        assert row["u1_x2"] + row["u2_x2"] == 2 * n1 * n2
        assert row["rank_sum_ok"] is True


class TestChisqIndependence:
    def test_matches_numpy_contingency(self, spark, tables):
        import numpy as np
        import pandas as pd

        rows = _rows(spark, "chisq_independence")
        orders = tables["orders"].toPandas()
        tab = pd.crosstab(orders.o_orderstatus, orders.o_orderpriority)
        n = tab.to_numpy().sum()
        chisq = 0.0
        for r in rows:
            o = tab.loc[r["status"], r["priority"]]
            assert r["n_obs"] == o
            assert r["row_total"] == tab.loc[r["status"]].sum()
            assert r["col_total"] == tab[r["priority"]].sum()
            num = (n * o - r["row_total"] * r["col_total"]) ** 2
            expect = round(
                num / (n * r["row_total"] * r["col_total"]), 12
            )
            # Python round is half-even, Spark/DuckDB are half-up:
            # the driver oracle is the exact check, allow 1 ulp here
            assert abs(r["contrib_e12"] - int(round(expect * 1e12))) <= 1
            chisq += num / (n * r["row_total"] * r["col_total"])
        # one total repeated on every row; equals the float sum to 1e-6
        assert len({r["chisq_e12"] for r in rows}) == 1
        assert math.isclose(
            rows[0]["chisq_e12"] / 1e12, chisq, rel_tol=0, abs_tol=1e-5
        )

    def test_cell_count_bounded_by_category_product(self, spark):
        assert len(_rows(spark, "chisq_independence")) <= 3 * 5


class TestAcfLags:
    def test_matches_numpy_acf(self, spark, tables):
        import numpy as np

        rows = {r["k"]: r for r in _rows(spark, "acf_lags")}
        assert sorted(rows) == [1, 2, 3, 4, 5, 6, 7]
        orders = tables["orders"].toPandas()
        cents = np.floor(orders.o_totalprice.to_numpy() * 100).astype(
            np.int64
        )
        daily = (
            orders.assign(d=orders.o_orderdate.dt.date, x=cents)
            .groupby("d")["x"]
            .sum()
            .sort_index()
        )
        dates = daily.index.to_numpy()
        x = daily.to_numpy(dtype=float)
        m = x.mean()
        den = ((x - m) ** 2).sum()
        pos = {d: i for i, d in enumerate(dates)}
        import datetime

        for k in range(1, 8):
            num = 0.0
            n_pairs = 0
            for d, i in pos.items():
                d2 = d + datetime.timedelta(days=k)
                if d2 in pos:
                    num += (x[i] - m) * (x[pos[d2]] - m)
                    n_pairs += 1
            assert rows[k]["n_pairs"] == n_pairs
            assert abs(rows[k]["acf_e6"] - round(num / den * 1e6)) <= 1
            assert abs(rows[k]["acf_e6"]) <= 1_000_000


class TestFixedWidthSource:
    def test_dead_letter_and_segment_rollup(self, spark, tables):
        rows = {r["segment"]: r for r in _rows(spark, "fixed_width_source_roundtrip")}
        assert rows["_malformed"]["n_cust"] == 3
        cust = tables["customer"].toPandas()
        assert set(rows) == set(cust.c_mktsegment.unique()) | {"_malformed"}
        total = sum(
            r["n_cust"] for s, r in rows.items() if s != "_malformed"
        )
        assert total == len(cust)
        # negative balances must survive the signed fixed-width field
        seg = cust.c_mktsegment.iloc[0]
        want = int(
            round((cust[cust.c_mktsegment == seg].c_acctbal * 100).round().sum())
        )
        assert rows[seg]["sum_cents"] == want
