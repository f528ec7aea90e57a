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


def test_kmeans_oracle_prefix_namespaces_all_ctes():
    import re

    from concurrent_etl_spark.operators.clustering import kmeans_oracle_ctes

    body = kmeans_oracle_ctes(
        "SELECT vec_id, v FROM embeddings", 4, 3, 8, prefix="bX_"
    )
    # every kmeans-internal CTE reference must carry the prefix; an
    # unprefixed leak would silently couple two blocks' chains
    for name in re.findall(r"\b(?:src|qv|cent\d+|sums\d+|asg\d+)\b", body):
        raise AssertionError(f"unprefixed CTE reference leaked: {name}")
    assert "bX_asg2" in body and "bX_cent1" in body
