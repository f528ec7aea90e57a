"""Behavior tests for operators/training.py: floor-division
exactness on negatives, fast-sigmoid properties, and the GD loop
against a sequential pure-Python reference."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from concurrent_etl_spark.operators import training as TR


def test_floor_div_matches_python_on_negatives(spark):
    cases = [(-7, 2), (7, 2), (-7, 3), (-1, 16384), (0, 5), (-16385, 16384)]
    df = spark.createDataFrame(cases, "a long, b long")
    got = [
        r["q"]
        for r in df.select(
            TR.floor_div(F.col("a"), F.col("b")).alias("q")
        ).collect()
    ]
    assert got == [a // b for a, b in cases]


def test_fast_sigmoid_properties(spark):
    zs = [-5 * TR.W, -TR.W, -1, 0, 1, TR.W, 5 * TR.W]
    df = spark.createDataFrame([(z,) for z in zs], "z long")
    ps = [
        r["p"]
        for r in df.select(TR.p_scaled(F.col("z")).alias("p")).collect()
    ]
    # bounded to [0, P], monotone, symmetric around P/2 at z=0
    assert all(0 <= p <= TR.P for p in ps)
    assert ps == sorted(ps)
    assert ps[3] == TR.P // 2
    # symmetry: sigma(-z) + sigma(z) ~ P (floor can drop 1)
    for lo, hi in zip(ps[:3], reversed(ps[4:])):
        assert TR.P - 1 <= lo + hi <= TR.P


def _py_train(rows, iters, s):
    W = P = TR.W
    w = [0] * 4
    for _ in range(iters):
        g = [0] * 4
        for r in rows:
            z = sum(w[j] * r[j] for j in range(4))
            d = W + abs(z)
            p = (P * (d + z)) // (2 * d)
            resid = p - r[4] * P
            for j in range(4):
                g[j] += r[j] * resid
        den = len(rows) * P * (1 << s)
        w = [w[j] - (g[j] * W) // den for j in range(4)]
    return w


@pytest.mark.parametrize("iters,shift", [(1, 5), (3, 5), (4, 3)])
def test_gd_train_matches_sequential_reference(spark, iters, shift):
    rows = [
        (1, x1 - 3, (x1 * 7) % 5 - 2, (x1 * 3) % 11 - 5, 1 if x1 >= 3 else 0)
        for x1 in range(8)
        for _ in range(3)
    ]
    df = spark.createDataFrame(
        rows, "x0 long, x1 long, x2 long, x3 long, y long"
    ).repartition(4)
    got = TR.gd_train(df, ["x0", "x1", "x2", "x3"], "y", iters, shift)
    assert got == _py_train(rows, iters, shift)


def test_predict_is_sign_of_logit(spark):
    df = spark.createDataFrame(
        [(1, -2), (1, 0), (1, 5)], "x0 long, x1 long"
    )
    preds = [
        r["p"]
        for r in df.select(
            TR.predict(["x0", "x1"], [0, TR.W]).alias("p")
        ).collect()
    ]
    assert preds == [0, 0, 1]
