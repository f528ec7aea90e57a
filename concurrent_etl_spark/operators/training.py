"""Distributed classifier training: full-batch gradient descent for
a logistic quality/language probe, in exact fixed-point arithmetic.

The reference has no model training at all (its closest analogue is
the static CASE-expression scoring in case_2/Normal.py:177-201); this
is beyond-the-reference surface for the training-data pipeline: the
"train a small classifier on labels, then score the corpus with it"
step that decides what survives curation at 100 TB (the fasttext-
style quality filter of public data-pipeline papers — CCNet, GPT-3's
quality classifier; re-derived from scratch on Spark aggregates).

Determinism contract (same philosophy as ``operators/clustering``):

* integer features; fixed-point weights at scale ``W = 2^14``;
* the logistic is the *rational* fast sigmoid
  ``sigma(t) = 1/2 + t / (2(1+|t|))`` — exactly computable in
  integer arithmetic (one integer division), unlike ``exp``;
  monotone, bounded to (0,1), sign-compatible with the true
  sigmoid, so gradients point the same way and the decision
  boundary (z = 0) is identical;
* the P-scaled probability's division has a NON-NEGATIVE numerator
  by construction, so truncating division (Spark ``div``, DuckDB
  ``//``) equals floor division on both engines;
* the weight update's division CAN be negative, so both sides use
  true floor division — Python ``//`` in the driver, and the
  ``(a - pmod(a, b)) / b`` identity in the oracle SQL (the
  numerator becomes an exact multiple of b, making truncation
  exact; DuckDB's bare ``//`` truncates toward zero and would
  disagree on negatives);
* the per-iteration gradient is ONE global aggregate row (dim long
  sums) collected by the driver — the same bounded collect the
  k-means reduce makes. Weights re-enter the next pass as plan
  literals: no joins, no windows, no shuffle beyond the 1-row agg.

Scale shape (100 TB): one scan per iteration, each a narrow map +
map-side-combinable global agg; the model (a handful of ints)
travels as plan literals. Total: iters * (scan + 1-row reduce) —
the textbook cluster shape of full-batch GD.

Magnitude audit (longs never overflow): |x_j| <= 2^7 and |w_j| <=
2^7 * W keep |z| < 2^33; p in [0, P]; gradient sums over n <= 10^7
rows stay < n * 2^7 * P < 2^45; the update multiplies by W (2^14)
-> < 2^59 < 2^63. Beyond ~10^9 rows the gradient would switch to
per-partition partial means — documented, not needed here.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: fixed-point scales: weights and probabilities both at 2^14.
W = 16384
P = 16384


def z_expr(features: list[Column], weights: list[int]) -> Column:
    """Exact long logit <w, x>; weights are W-scaled plan literals."""
    acc = F.lit(0).cast("long")
    for wj, xj in zip(weights, features):
        acc = acc + F.lit(int(wj)) * xj.cast("long")
    return acc


def p_scaled(z: Column) -> Column:
    """P-scaled fast sigmoid of a W-scaled logit, exact integer.

    With d = W + |z| (> 0) and t = z/W:
        P * sigma(t) = P * (d + z) / (2 d)   truncated to a long;
    the numerator P*(d+z) >= 0 because d >= |z|, so truncating
    ``div`` == floor on both engines.
    """
    d = F.lit(W).cast("long") + F.abs(z)
    num = F.lit(P).cast("long") * (d + z)
    den = F.lit(2).cast("long") * d
    return floor_div(num, den)


def floor_div(num: Column, den: Column) -> Column:
    """Exact floor division of longs (den > 0, |num| < 2^53).

    ``num - pmod(num, den)`` is an exact multiple of ``den`` in long
    arithmetic, so the one double division that follows is of an
    exactly-representable dividend by its own divisor — IEEE returns
    the integer quotient exactly. Avoids both Spark's float ``/``
    rounding and the truncate-vs-floor disagreement on negatives
    (DuckDB ``//`` truncates; Python ``//`` floors)."""
    num = num.cast("long")
    den = den.cast("long")
    return ((num - F.pmod(num, den)) / den).cast("long")


def gradient_row(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    weights: list[int],
):
    """The 1-row gradient aggregate: n plus one long sum per weight."""
    feats = [F.col(c) for c in feature_cols]
    z = z_expr(feats, weights)
    p = p_scaled(z)
    resid = p - F.col(label_col).cast("long") * F.lit(P)
    aggs = [F.count(F.lit(1)).alias("_n")] + [
        F.sum(feats[j].cast("long") * resid).alias(f"_g{j}")
        for j in range(len(feature_cols))
    ]
    return df.agg(*aggs).collect()[0]


def gd_train(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    iters: int,
    lr_shift: int,
) -> list[int]:
    """Train from zero weights; returns final W-scaled weights.

    Update (floor division — Python ``//`` floors):
        w_j <- w_j - (g_j * W) // (n * P * 2^lr_shift)
    """
    weights = [0] * len(feature_cols)
    for _ in range(iters):
        row = gradient_row(df, feature_cols, label_col, weights)
        if not row["_n"]:
            # empty training set: no gradient exists — keep the zero
            # weights instead of dividing by n = 0 (the caller's
            # result frame is empty anyway)
            return weights
        den = row["_n"] * P * (1 << lr_shift)
        weights = [
            int(weights[j]) - (int(row[f"_g{j}"]) * W) // den
            for j in range(len(feature_cols))
        ]
    return weights


def predict(feature_cols: list[str], weights: list[int]) -> Column:
    """Predicted label column: 1 iff the logit is positive."""
    return (
        z_expr([F.col(c) for c in feature_cols], weights) > 0
    ).cast("int")
