"""Behavior tests for operators/clustering.py: exactness of the
quantized k-means against a NumPy brute force, partition invariance,
and the empty-cluster inheritance rule."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from concurrent_etl_spark.engine import load_table
from concurrent_etl_spark.operators import clustering as C

from tests.conftest import SF_DIR

K, ITERS, DIM = 8, 3, 64


def _np_lloyd(vecs: np.ndarray, k: int, iters: int):
    """Brute-force reference on int64 quantized vectors, mirroring
    the documented contract: first-index argmin, floor(sum/count)
    with the division in float64, empty clusters inherit."""
    q = np.floor(vecs * C.SCALE).astype(np.int64)
    cents = q[:k].copy()
    for t in range(iters):
        if t > 0:
            new = cents.copy()
            for c in range(k):
                members = q[assign == c]
                if len(members):
                    new[c] = np.floor(
                        members.sum(axis=0, dtype=np.int64) / len(members)
                    ).astype(np.int64)
            cents = new
        d = ((q[:, None, :] - cents[None, :, :]) ** 2).sum(
            axis=2, dtype=np.int64
        )
        assign = d.argmin(axis=1)  # numpy argmin = first index on ties
        best = d.min(axis=1)
    return assign, best


@pytest.fixture(scope="module")
def emb(spark):
    df = load_table(spark, SF_DIR, "embeddings")
    rows = df.orderBy("vec_id").select("vec_id", "embedding").collect()
    vecs = np.array([r["embedding"] for r in rows], dtype=np.float64)
    qv = df.select(
        "vec_id", C.quantize(F.col("embedding")).alias("qv")
    ).persist()
    yield vecs, qv
    qv.unpersist()


def test_lloyd_matches_numpy_brute_force(spark, emb):
    vecs, qv = emb
    want_assign, want_best = _np_lloyd(vecs, K, ITERS)
    got = {
        r["vec_id"]: (r["cluster"], r["d"])
        for r in C.lloyd(qv, K, ITERS, DIM).collect()
    }
    for vid in range(len(vecs)):
        assert got[vid] == (want_assign[vid], want_best[vid])


def test_assignment_partition_invariant(spark, emb):
    _, qv = emb
    cents = C.init_centroids(qv, K)
    a1 = sorted(
        (r["vec_id"], r["cluster"]) for r in C.assign(qv, cents).collect()
    )
    a2 = sorted(
        (r["vec_id"], r["cluster"])
        for r in C.assign(qv.repartition(7, "qv"), cents).collect()
    )
    assert a1 == a2


def test_empty_cluster_inherits_previous_centroid(spark):
    # 3 centroids seeded from ids 0..2, but every point sits at the
    # origin-adjacent corner => clusters 1,2 go empty after the
    # first update and must keep their seed centroids verbatim.
    data = [(i, [0.0, 0.0]) for i in range(3)]
    data[1] = (1, [10.0, 0.0])
    data[2] = (2, [0.0, 10.0])
    df = spark.createDataFrame(data, "vec_id long, v array<double>")
    qv = df.select("vec_id", C.quantize(F.col("v")).alias("qv"))
    cents = C.init_centroids(qv, 3)
    assigned = C.assign(qv, cents)
    new = C.update_centroids(assigned, cents, 2)
    assert new[1] == cents[1] and new[2] == cents[2]
    assert new[0] == [0, 0]


def test_update_centroid_is_floor_of_mean(spark):
    df = spark.createDataFrame(
        [(0, [0.0]), (1, [0.0001]), (2, [0.0003])],
        "vec_id long, v array<double>",
    )
    qv = df.select("vec_id", C.quantize(F.col("v")).alias("qv"))
    # one centroid at the quantized first vector: all 3 join cluster 0
    cents = [[0]]
    assigned = C.assign(qv, cents)
    got = C.update_centroids(assigned, cents, 1)
    q = [math.floor(x * C.SCALE) for x in (0.0, 0.0001, 0.0003)]
    assert got == [[math.floor(sum(q) / 3)]]


def test_lloyd_invariant_under_repartition(spark, emb):
    """Full multi-iteration Lloyd (not just one assignment pass) must
    produce identical (cluster, d) per vector regardless of input
    partitioning — the centroid update is a floor(sum/count) over
    exact integer sums, so reduction order cannot leak in."""
    _, qv = emb
    base = sorted(
        (r["vec_id"], r["cluster"], r["d"])
        for r in C.lloyd(qv, K, ITERS, DIM).collect()
    )
    for parts in (1, 13):
        again = sorted(
            (r["vec_id"], r["cluster"], r["d"])
            for r in C.lloyd(
                qv.repartition(parts, "vec_id"), K, ITERS, DIM
            ).collect()
        )
        assert again == base, f"lloyd drifted at repartition({parts})"


def test_pq_ann_recall_lower_bound(spark):
    """PQ-ANN self-evaluation: each returned neighbor carries an
    in_exact_topk flag; overall recall@k on the fixture must clear a
    floor well above chance (exact top-k over 500 vectors ≈ 2%
    chance). A codebook/encode/ADC regression craters this first."""
    from concurrent_etl_spark.queries_clustering import q_pq_ann_topk

    rows = q_pq_ann_topk(spark, SF_DIR).collect()
    spark.catalog.clearCache()
    hits = sum(r["in_exact_topk"] for r in rows)
    recall = hits / len(rows)
    # measured 0.44 on the fixture — synthetic i.i.d. embeddings are
    # PQ's worst case (no subspace structure to exploit); the floor
    # guards collapse, not the measured point
    assert recall >= 0.3, f"PQ recall@k collapsed: {recall:.2f}"
    # and the self-match (query vector is in the corpus): its ADC
    # distance is exactly the query's own quantization error — the
    # minimum possible — so it must surface at pq_rank 1 for every
    # query (note it is NOT zero: ADC measures query-to-centroid)
    best = {r["query_id"]: r["vec_id"] for r in rows if r["pq_rank"] == 1}
    assert all(vid == qid for qid, vid in best.items()), best


def test_kmeans_oracle_prefix_namespaces_all_ctes():
    import re

    from concurrent_etl_spark.operators.clustering import kmeans_oracle_ctes

    body = kmeans_oracle_ctes(
        "SELECT vec_id, v FROM embeddings", 4, 3, 8, prefix="bX_"
    )
    # every kmeans-internal CTE *name* (definition or FROM/JOIN
    # reference) must carry the prefix; an unprefixed leak would
    # silently couple two blocks' chains. Column names (qv, cv, …)
    # are CTE-scoped and intentionally unprefixed.
    for m in re.finditer(
        r"(?:FROM|JOIN)\s+(src|qv|cent\d+|sums\d+|asg\d+)\b"
        r"|^\s*(src|qv|cent\d+|sums\d+|asg\d+)\s+AS\s*\(",
        body,
        re.MULTILINE,
    ):
        raise AssertionError(f"unprefixed CTE reference leaked: {m.group(0)}")
    assert "bX_asg2" in body and "bX_cent1" in body


def test_kmeans_oracle_prefix_leaves_source_sql_untouched():
    """ADVICE r3: the prefix renderer must not rewrite identifiers
    inside the caller-supplied source_sql (the old post-hoc regex
    corrupted a source containing e.g. a column named ``qv``)."""
    from concurrent_etl_spark.operators.clustering import kmeans_oracle_ctes

    src = "SELECT vec_id, qv AS v FROM (SELECT vec_id, emb AS qv FROM t)"
    body = kmeans_oracle_ctes(src, 2, 2, 4, prefix="bX_")
    assert f"bX_src AS ({src})" in body


class TestPowerIteration:
    def test_converges_to_numpy_dominant_eigvec(self, spark):
        import numpy as np
        import pyarrow.parquet as pq

        import __spark_entry__ as entrymod
        from tests.conftest import SF_DIR

        rows = entrymod.queries()["power_iteration_top_eigvec"](
            spark, SF_DIR
        ).collect()
        got = np.array(
            [r["eig_e6"] for r in sorted(rows, key=lambda r: r["dim"])],
            dtype=float,
        )
        emb = pq.read_table(f"{SF_DIR}/embeddings.parquet").to_pandas()
        x = np.floor(
            np.stack(emb["embedding"].to_numpy()).astype(np.float64) * 16384.0
        )
        n = len(x)
        gram = n * (x.T @ x) - np.outer(x.sum(0), x.sum(0))
        lam1 = np.linalg.eigvalsh(gram)[-1]
        # the synthetic embedding spectrum is nearly flat
        # (lam2/lam1 ~ 0.93), so 3 rounds cannot pin the eigVECTOR —
        # the testable invariant is Rayleigh-quotient ASCENT: the
        # iterate must capture far more variance than the start
        # vector and most of lam1 (numpy confirms ~0.81 lam1 here)
        def rayleigh(v):
            return (v @ gram @ v) / (v @ v)

        r0 = rayleigh(np.ones(64))
        r3 = rayleigh(got)
        assert r3 > r0
        assert r3 >= 0.75 * lam1
        assert r3 <= lam1 * (1 + 1e-12)
        # diag matches the exact integer covariance diagonal
        diag = {r["dim"]: int(r["cov_diag_str"]) for r in rows}
        for d in (1, 32, 64):
            col = [int(v) for v in x[:, d - 1]]
            exact = n * sum(v * v for v in col) - sum(col) ** 2
            assert diag[d] == exact

    def test_vector_normalized_linf(self, spark):
        import __spark_entry__ as entrymod
        from tests.conftest import SF_DIR

        rows = entrymod.queries()["power_iteration_top_eigvec"](
            spark, SF_DIR
        ).collect()
        vals = [r["eig_e6"] for r in rows]
        assert max(abs(v) for v in vals) == 1000000
        assert len(rows) == 64
