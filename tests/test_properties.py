"""Property-based tests (hypothesis): distributed ops must agree with
single-node reference implementations and be partition-invariant.

Spark sessions are expensive, so strategies are kept small and
examples few — the point is structural coverage (random graph shapes,
random event interleavings), not volume.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SETTINGS = dict(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _union_find(edges: list[tuple[int, int]]) -> dict[int, int]:
    """Reference single-node components: min reachable node label."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


class TestConnectedComponentsProperty:
    @settings(**SETTINGS)
    @given(
        edges=st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=30),
                st.integers(min_value=0, max_value=30),
            ).filter(lambda e: e[0] != e[1]),
            min_size=1,
            max_size=25,
        )
    )
    def test_matches_union_find(self, spark, edges):
        from concurrent_etl_spark.operators.dedup import connected_components

        df = spark.createDataFrame(edges, ["doc_a", "doc_b"])
        got = {
            r.node: r.component for r in connected_components(df).collect()
        }
        assert got == _union_find(edges)


class TestScd2PartitionInvariance:
    @settings(**SETTINGS)
    @given(
        rows=st.lists(
            st.tuples(
                st.integers(min_value=1, max_value=3),  # key
                st.sampled_from(["a", "b", "c"]),  # attr
                st.integers(min_value=0, max_value=20),  # hour offset
            ),
            min_size=1,
            max_size=20,
        ),
        n_parts=st.sampled_from([1, 3, 7]),
    )
    def test_history_independent_of_partitioning(self, spark, rows, n_parts):
        """scd2_history must produce identical version rows no matter
        how the input is partitioned (event_id tiebreak covers ts
        collisions the random generator produces freely)."""
        import datetime as dt

        from concurrent_etl_spark.operators.dims import scd2_history

        t0 = dt.datetime(2026, 1, 1)
        data = [
            (k, a, t0 + dt.timedelta(hours=h), i)
            for i, (k, a, h) in enumerate(rows)
        ]
        schema = "user_id long, event_type string, ts timestamp, event_id long"
        base = spark.createDataFrame(data, schema)

        def run(df):
            # valid_to is None on the current row; map it to datetime.max
            # so the sort key stays comparable when hypothesis produces
            # tied timestamps (same valid_from, one open segment)
            return sorted(
                (
                    r.user_id,
                    r.event_type,
                    r.valid_from,
                    r.valid_to or dt.datetime.max,
                    r.is_current,
                )
                for r in scd2_history(
                    df, key="user_id", ts_col="ts", attr="event_type",
                    tiebreak="event_id",
                ).collect()
            )

        assert run(base) == run(base.repartition(n_parts))


def _span_pairs_reference(docs, k=6, base=5, mod=1_000_000_007,
                          sample_w=2, df_max=4, min_shared=1):
    """Brute-force python reference for operators.dedup.span_pairs:
    same definition, sequential implementation."""
    from collections import Counter

    subs = {}
    for doc_id, text in docs:
        cs = [ord(c) for c in text.lower()]
        if len(cs) < k:
            continue
        wins = set()
        for i in range(len(cs) - k + 1):
            h = sum(
                cs[i + j] * base ** (k - 1 - j) for j in range(k)
            ) % mod
            if h % sample_w == 0:
                wins.add("-".join(str(c) for c in cs[i : i + k]))
        if wins:
            subs[doc_id] = wins
    df = Counter()
    for wins in subs.values():
        for w in wins:
            df[w] += 1
    keep = {w for w, n in df.items() if 2 <= n <= df_max}
    ids = sorted(subs)
    out = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            shared = len(subs[a] & subs[b] & keep)
            if shared >= min_shared:
                nlo = min(len(subs[a]), len(subs[b]))
                out[(a, b)] = (
                    shared,
                    shared * sample_w,
                    round(shared / nlo, 9),
                )
    return out


class TestSpanPairsProperty:
    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=list(HealthCheck),
    )
    @given(
        st.lists(
            st.text(alphabet="ab ", min_size=0, max_size=60),
            min_size=2,
            max_size=8,
        )
    )
    def test_matches_bruteforce(self, spark, texts):
        """span_pairs over a low-entropy random corpus (which forces
        genuine shared windows) must equal the sequential brute-force
        evaluation of the same definition — sampling, DF gate,
        threshold, containment and all."""
        from concurrent_etl_spark.operators.dedup import span_pairs

        docs = [(i, t) for i, t in enumerate(texts)]
        df = spark.createDataFrame(docs, "doc_id bigint, text string")
        got = {
            (r["doc_lo"], r["doc_hi"]): (
                r["n_shared"],
                r["est_span_chars"],
                round(r["containment"], 9),
            )
            for r in span_pairs(
                df, k=6, sample_w=2, df_max=4, min_shared=1
            ).collect()
        }
        exp = _span_pairs_reference(docs)
        assert got == exp


def _lpa_reference(edges, rounds=2):
    """Sequential synchronous LPA with the same deterministic
    semantics: vote weight sums over in-neighbors, max weight wins,
    smaller label breaks ties."""
    from collections import defaultdict

    nodes = sorted({s for s, _, _ in edges})
    lbl = {n: n for n in nodes}
    inn = defaultdict(list)
    for s, d, w in edges:
        inn[s].append((d, w))
    for _ in range(rounds):
        new = {}
        for n in nodes:
            votes = defaultdict(int)
            for d, w in inn[n]:
                if d in lbl:
                    votes[lbl[d]] += w
            if votes:
                new[n] = min(
                    votes, key=lambda v: (-votes[v], v)
                )
        lbl = new
    return lbl


class TestLabelPropagationProperty:
    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=list(HealthCheck),
    )
    @given(
        st.lists(
            st.tuples(st.integers(0, 9), st.integers(0, 9)),
            min_size=1,
            max_size=25,
        )
    )
    def test_matches_sequential_reference(self, spark, raw_edges):
        """label_propagation on random small multigraphs (mirrored,
        multiplicity-weighted, self-loops dropped) must equal the
        sequential evaluation of the same synchronous definition."""
        from collections import Counter

        from concurrent_etl_spark.operators.graph import label_propagation

        pairs = [(a, b) for a, b in raw_edges if a != b]
        if not pairs:
            return
        weights = Counter()
        for a, b in pairs:
            weights[(a, b)] += 1
            weights[(b, a)] += 1
        edges = [(s, d, w) for (s, d), w in weights.items()]
        df = spark.createDataFrame(edges, "src bigint, dst bigint, w bigint")
        got = {
            r["node"]: r["lbl"]
            for r in label_propagation(df, rounds=2).collect()
        }
        assert got == _lpa_reference(edges, rounds=2)


class TestRadiusPairsProperty:
    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=list(HealthCheck),
    )
    @given(
        st.lists(
            st.tuples(
                st.integers(-50, 50),  # coords on a 0.01 lattice so
                st.integers(-50, 50),  # distances are exact in binary
            ),
            min_size=2,
            max_size=30,
            unique=True,
        ),
        st.sampled_from([0.02, 0.05, 0.11]),
    )
    def test_matches_bruteforce(self, spark, pts, radius):
        """Grid-bucketed radius join == brute-force all-pairs on
        random point sets: the 3x3 neighborhood must find every pair
        (a missed neighbor cell is invisible on happy-path data where
        points cluster away from cell borders — the lattice points
        sit ON borders deliberately)."""
        import math

        from concurrent_etl_spark.operators.similarity import (
            radius_pairs_grid,
        )

        rows = [
            (i, x * 0.01, y * 0.01) for i, (x, y) in enumerate(pts)
        ]
        df = spark.createDataFrame(
            rows, "vec_id bigint, x double, y double"
        )
        got = {
            (r["vec_lo"], r["vec_hi"])
            for r in radius_pairs_grid(df, radius=radius).collect()
        }
        exp = set()
        for i, xi, yi in rows:
            for j, xj, yj in rows:
                if i < j and (xi - xj) ** 2 + (yi - yj) ** 2 <= radius**2:
                    exp.add((i, j))
        assert got == exp


class TestZorderKeyProperty:
    def test_matches_python_interleave(self, spark):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from concurrent_etl_spark.sources.warehouse import zorder_key

        @settings(max_examples=20, deadline=None)
        @given(
            st.lists(
                st.tuples(st.integers(0, 2**16 - 1), st.integers(0, 2**16 - 1)),
                min_size=1,
                max_size=10,
            )
        )
        def check(vals):
            df = spark.createDataFrame(vals, "x bigint, y bigint").select(
                "x", "y", zorder_key(["x", "y"], bits=16).alias("z")
            )
            for r in df.collect():
                exp = 0
                for b in range(16):
                    exp |= ((r["x"] >> b) & 1) << (2 * b)
                    exp |= ((r["y"] >> b) & 1) << (2 * b + 1)
                assert r["z"] == exp

        check()
