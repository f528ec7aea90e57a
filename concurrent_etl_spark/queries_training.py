"""Model-training + ID-assignment queries: the iterative-GD quality
probe from ``operators/training.py``, and contiguous global ID
assignment — two primitives every production training-data pipeline
needs that the reference (a static-transform ETL, case_2/Normal.py)
has no analogue for.

Both follow the bounded-collect pattern of ``operators/clustering``:
the only driver-side state is O(model) / O(#shards) rows; everything
row-scaled stays distributed.

The classifier's label is a deterministic length rule (``n_chars >=
256``) rather than the ``lang`` column: the synthetic corpus draws
every language from the same vocabulary, so language is unlearnable
by construction — a length rule gives the gradient a real signal to
descend (the trained probe reaches ~95% accuracy, imperfect because
docs at the boundary bucket are ambiguous), while exercising exactly
the machinery a real quality classifier would use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from concurrent_etl_spark.catalog import query
from concurrent_etl_spark.engine import load_table
from concurrent_etl_spark.operators import training as TR

_ITERS = 3
_LR_SHIFT = 5
_FEATS = ["x0", "x1", "x2", "x3"]


def _features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer features, centered so the bias isn't swamped (classic
    unscaled-feature failure: uncentered, GD plateaus at the base
    rate; centered, the same loop reaches ~95%)."""
    docs = load_table(spark, sf_dir, "documents")
    the_cnt = (
        F.length("text")
        - F.length(F.regexp_replace("text", F.lit("the"), F.lit("")))
    ) / 3
    e_cnt = (
        F.length("text")
        - F.length(F.regexp_replace("text", F.lit("e"), F.lit("")))
    ) / 4
    # a doc with no measurable features (NULL text/n_chars) can be
    # neither trained on nor scored: excluded in BOTH engines. (A
    # NULL row contributed nothing to the gradients anyway — NULL
    # poisons its products so SUM skips it in both engines — but its
    # prediction CASE/cast semantics DIVERGED per engine at eval
    # time; null-text corpus sweep, round 6.)
    return docs.where(F.col("n_chars").isNotNull()).select(
        "doc_id",
        "lang",
        F.lit(1).alias("x0"),
        (F.least(F.floor(F.col("n_chars") / 32), F.lit(127)) - 8)
        .cast("long")
        .alias("x1"),
        (F.floor(the_cnt) - 2).cast("long").alias("x2"),
        (F.floor(e_cnt) - 6).cast("long").alias("x3"),
        (F.col("n_chars") >= 256).cast("long").alias("y"),
    )


def _feat_sql() -> str:
    return """
    SELECT doc_id, lang, CAST(1 AS BIGINT) AS x0,
           CAST(least(n_chars // 32, 127) - 8 AS BIGINT) AS x1,
           CAST((len(text) - len(replace(text, 'the', ''))) // 3 - 2
                AS BIGINT) AS x2,
           CAST((len(text) - len(replace(text, 'e', ''))) // 4 - 6
                AS BIGINT) AS x3,
           CASE WHEN n_chars >= 256 THEN CAST(1 AS BIGINT)
                ELSE CAST(0 AS BIGINT) END AS y
    FROM documents WHERE n_chars IS NOT NULL"""


def _gd_oracle() -> str:
    """Unroll _ITERS GD steps as chained CTEs mirroring gd_train.

    fdiv(a, b) (true floor division, b > 0) is spelled
    ``(a - ((a % b) + b) % b) // b``: the adjusted numerator is an
    exact multiple of b, so DuckDB's truncating ``//`` is exact —
    bare ``//`` would truncate toward zero and disagree with
    Python's floored ``//`` on negative gradients.
    """
    Wc, Pc = TR.W, TR.P
    parts = [f"feats AS ({_feat_sql()})",
             "w0 AS (SELECT " + ", ".join(
                 f"CAST(0 AS BIGINT) AS w{j}" for j in range(4)) + ")"]
    for t in range(_ITERS):
        z = " + ".join(f"w.w{j} * f.x{j}" for j in range(4))
        parts.append(
            f"""p{t} AS (
      SELECT f.*, ({Pc} * (({Wc} + abs(z_)) + z_))
                  // (2 * ({Wc} + abs(z_))) AS p
      FROM (SELECT f.*, {z} AS z_
            FROM feats f CROSS JOIN w{t} w) f)"""
        )
        gs = ", ".join(
            f"CAST(sum(x{j} * (p - y * {Pc})) AS BIGINT) AS g{j}"
            for j in range(4)
        )
        parts.append(
            f"g{t} AS (SELECT count(*) AS n, {gs} FROM p{t})"
        )
        den = f"(g.n * {Pc} * {1 << _LR_SHIFT})"
        ws = ", ".join(
            f"w.w{j} - ((g.g{j} * {Wc}) - (((g.g{j} * {Wc}) % {den})"
            f" + {den}) % {den}) // {den} AS w{j}"
            for j in range(4)
        )
        parts.append(
            f"w{t + 1} AS (SELECT {ws} FROM w{t} w CROSS JOIN g{t} g)"
        )
    return ",\n    ".join(parts)


@query(
    "gd_quality_classifier",
    oracle=f"""
    WITH {_gd_oracle()},
    scored AS (
      SELECT f.lang, f.y,
             CASE WHEN {" + ".join(f"w.w{j} * f.x{j}" for j in range(4))}
                  > 0 THEN 1 ELSE 0 END AS pred,
             w.w0 AS wb, w.w1 AS wl, w.w2 AS wt, w.w3 AS we
      FROM feats f CROSS JOIN w{_ITERS} w)
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(y) AS BIGINT) AS n_label_pos,
           CAST(SUM(pred) AS BIGINT) AS n_pred_pos,
           CAST(SUM(CASE WHEN pred = y THEN 1 ELSE 0 END) AS BIGINT)
             AS n_correct,
           CAST(MIN(wb) AS BIGINT) AS w_bias,
           CAST(MIN(wl) AS BIGINT) AS w_len,
           CAST(MIN(wt) AS BIGINT) AS w_the,
           CAST(MIN(we) AS BIGINT) AS w_e
    FROM scored GROUP BY lang
    """,
)
def q_gd_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-batch gradient-descent training of a logistic quality
    probe (rational fast-sigmoid, exact fixed-point — see
    ``operators/training.py``), then a whole-corpus scoring pass:
    per-language confusion counts plus the learned weights.

    Plan: _ITERS scans, each a narrow map + ONE map-side-combinable
    global aggregate whose single row the driver collects (the
    bounded collect of k-means); weights re-enter as plan literals —
    no joins, no windows, no per-row Python anywhere.
    """
    feats = _features(spark, sf_dir).persist()
    weights = TR.gd_train(feats, _FEATS, "y", _ITERS, _LR_SHIFT)
    pred = TR.predict(_FEATS, weights).cast("long")
    return (
        feats.withColumn("pred", pred)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("y").alias("n_label_pos"),
            F.sum("pred").alias("n_pred_pos"),
            F.sum((F.col("pred") == F.col("y")).cast("long")).alias(
                "n_correct"
            ),
            F.lit(weights[0]).cast("long").alias("w_bias"),
            F.lit(weights[1]).cast("long").alias("w_len"),
            F.lit(weights[2]).cast("long").alias("w_the"),
            F.lit(weights[3]).cast("long").alias("w_e"),
        )
    )


@query(
    "global_id_assignment",
    oracle="""
    SELECT doc_id, source,
           CAST(row_number() OVER (PARTITION BY source ORDER BY doc_id)
                AS BIGINT) AS local_rank,
           CAST(row_number() OVER (ORDER BY source, doc_id) - 1
                AS BIGINT) AS global_id
    FROM documents
    """,
)
def q_global_id_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contiguous dense global IDs for every document WITHOUT a
    global window: per-source counts (one bounded k-row collect)
    become cumulative offsets in the driver; each row's id is
    offset[source] + its rank within the source (a PARTITIONED
    window). This is how you number 100B rows on a cluster — a
    global row_number() would serialize the entire dataset through
    one task, banned here by test_plan_invariants; the oracle states
    the same result with DuckDB's (single-node, legal there) global
    window as the independent spec.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    counts = {
        r["source"]: r["n"]
        for r in docs.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    offsets: dict[str, int] = {}
    acc = 0
    for src in sorted(counts):
        offsets[src] = acc
        acc += counts[src]
    # empty-corpus guard: a zero-arg create_map is map<void,void> and
    # the lookup below fails analysis — the typed empty map keeps the
    # (zero-row) plan compiling
    if offsets:
        off_map = F.create_map(
            *[F.lit(x) for kv in sorted(offsets.items()) for x in kv]
        )
    else:
        off_map = F.lit(None).cast("map<string,bigint>")
    from pyspark.sql import Window

    local = F.row_number().over(
        Window.partitionBy("source").orderBy("doc_id")
    )
    return docs.select(
        "doc_id",
        "source",
        local.cast("long").alias("local_rank"),
        (
            off_map[F.col("source")].cast("long")
            + local.cast("long")
            - 1
        ).alias("global_id"),
    )


@query(
    "classifier_calibration_bins",
    oracle=f"""
    WITH {_gd_oracle()},
    scored AS (
      SELECT f.y, ({TR.P} * (({TR.W} + abs(z_)) + z_))
                  // (2 * ({TR.W} + abs(z_))) AS p
      FROM (SELECT f.*, {" + ".join(f"w.w{j} * f.x{j}" for j in range(4))} AS z_
            FROM feats f CROSS JOIN w{_ITERS} w) f)
    SELECT CAST(p * 10 // {TR.P + 1} AS INTEGER) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(y) AS BIGINT) AS n_pos,
           round(CAST(SUM(y) AS DOUBLE) / COUNT(*), 6) AS frac_pos,
           round(CAST(SUM(p) AS DOUBLE) / COUNT(*) / {TR.P}, 6) AS mean_p
    FROM scored GROUP BY 1
    """,
)
def q_classifier_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram for the trained quality probe: P-scaled
    fast-sigmoid probabilities bucketed into 10 fixed bins, each with
    its empirical positive rate vs mean predicted probability — the
    calibration check (Guo et al., "On Calibration of Modern Neural
    Networks", 2017 — public paper) a pipeline runs before using a
    classifier's scores as sampling weights rather than as a hard
    threshold.

    Everything is exact integer arithmetic up to two final double
    divisions of identical operands: the model re-trains through the
    same bounded 1-row-per-iteration GD collects, probabilities are
    P-scaled longs, and the bin index is a truncating division of
    nonnegative ints (floor == truncate on both engines).

    Shape at 100 TB: _ITERS training scans (each a narrow map + one
    map-side-combinable 1-row aggregate) + ONE scoring scan into a
    10-row groupBy. The model never leaves plan literals.
    """
    feats = _features(spark, sf_dir).persist()
    weights = TR.gd_train(feats, _FEATS, "y", _ITERS, _LR_SHIFT)
    z = TR.z_expr([F.col(c) for c in _FEATS], weights)
    p = TR.p_scaled(z)
    return (
        feats.select(
            "y",
            p.alias("p"),
        )
        .withColumn(
            "bin",
            TR.floor_div(F.col("p") * 10, F.lit(TR.P + 1)).cast("int"),
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("y").cast("bigint").alias("n_pos"),
            F.round(
                F.sum("y").cast("double") / F.count(F.lit(1)), 6
            ).alias("frac_pos"),
            F.round(
                F.sum("p").cast("double") / F.count(F.lit(1)) / F.lit(TR.P),
                6,
            ).alias("mean_p"),
        )
    )
