"""Driver-visible evidence that the streaming path (T1-T5) is correct.

Round 1 verified streaming only inside pytest; this tool produces a
committed artifact (``STREAMING_r{N}.json``) a reviewer can check
without running the suite:

  * **batch_equivalence** — the same deterministic input processed by
    ``file_stream_etl`` (availableNow micro-batches, T1) and by a
    plain batch read + identical transform must produce identical
    order-insensitive value hashes.
  * **restart_exactly_once** — wave 1 of files is processed, the
    query terminates (graceful shutdown, T5), wave 2 lands, a NEW
    query restarts from the same checkpoint (T3): every row appears
    exactly once (T2), and an idle third run adds zero rows.
  * **merge_idempotent_replay** — ``merge_into_parquet`` applied to
    the same batch twice leaves the target hash unchanged (the
    idempotent upsert that makes foreachBatch replay safe, T4).

Round 6 (VERDICT r5 item 5): the checks run at sf0.01 scale — the
stream input is the REAL orders table (15k rows) split into 12 CSV
files processed one per micro-batch, and the merge replays a
2,000-row batch — so hash equality is over thousands of rows and the
restart path crosses a genuine multi-batch checkpoint history, not a
4-row toy.

Usage: python tools/streaming_evidence.py [round_tag]
Writes /root/repo/STREAMING_r{tag}.json
"""

from __future__ import annotations

import hashlib
import json
import shutil
import sys
import tempfile
from pathlib import Path

from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("qty", StringType()),
        StructField("price", DoubleType()),
    ]
)


def value_hash(df) -> str:
    """Order-insensitive md5 over canonicalized rows (same idea as
    the oracle gate's hash)."""
    rows = sorted(
        tuple("\x00NULL" if v is None else str(v) for v in row)
        for row in df.select(*sorted(df.columns)).collect()
    )
    h = hashlib.md5()
    for r in rows:
        h.update("\x1f".join(r).encode())
        h.update(b"\x1e")
    return h.hexdigest()


def _write_csv(path: Path, rows: list[str]) -> None:
    path.write_text("id,qty,price\n" + "\n".join(rows) + "\n")


def _transform(df):
    return df.select(
        "id",
        F.col("qty").try_cast("long").alias("qty"),
        "price",
        F.regexp_extract(F.col("_source_file"), r"([^/]+)\.csv$", 1).alias(
            "stem"
        ),
    )


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "02"
    sys.path.insert(0, "/root/repo")
    from concurrent_etl_spark.engine import get_spark
    from concurrent_etl_spark.streaming.file_stream import (
        file_stream_etl,
        merge_into_parquet,
    )

    spark = get_spark(app_name="streaming-evidence")
    base = Path(tempfile.mkdtemp(prefix="stream_ev_"))
    evidence: dict[str, dict] = {}
    try:
        src = base / "sample"
        src.mkdir()
        sink, ckpt = str(base / "out"), str(base / "ckpt")

        # sf0.01-scale input: the real orders table (15k rows) as 12
        # deterministic CSV files, ~1.25k rows each, one micro-batch
        # per file. Every ~97th qty is garbage to keep try_cast's
        # NULL path inside the hash. Wave 1 = files 0-9 (~12.5k
        # rows), wave 2 = files 10-11 (restart evidence crosses a
        # 10-batch checkpoint history).
        import duckdb

        sf_dir = "/root/testdata/sf0.01"
        orows = duckdb.connect().execute(
            f"SELECT o_orderkey, o_custkey, o_totalprice FROM "
            f"'{sf_dir}/orders.parquet' ORDER BY o_orderkey"
        ).fetchall()
        n_files = 12
        per = (len(orows) + n_files - 1) // n_files
        waves: list[dict[str, list[str]]] = [{}, {}]
        for i in range(n_files):
            chunk = orows[i * per : (i + 1) * per]
            rows = [
                f"{ok},{'oops' if ok % 97 == 0 else ck},{tp}"
                for ok, ck, tp in chunk
            ]
            waves[0 if i < 10 else 1][f"f{i:02d}_OPERATIONS"] = rows
        wave1, wave2 = waves
        for stem, rows in wave1.items():
            _write_csv(src / f"{stem}.csv", rows)

        # --- T1: availableNow micro-batch run over wave 1
        q = file_stream_etl(
            spark, str(src), SCHEMA, _transform, sink, ckpt,
            available_now=True, max_files_per_trigger=1,
        )
        q.awaitTermination(120)
        n_wave1 = spark.read.parquet(sink).count()

        # --- batch equivalence on the same input
        batch = _transform(
            spark.read.option("header", "true")
            .schema(SCHEMA)
            .csv(str(src))
            .withColumn("_source_file", F.input_file_name())
        )
        stream_hash = value_hash(spark.read.parquet(sink))
        batch_hash = value_hash(batch)
        evidence["batch_equivalence"] = {
            "stream_hash": stream_hash,
            "batch_hash": batch_hash,
            "match": stream_hash == batch_hash,
            "rows": n_wave1,
        }

        # --- T2/T3: restart from checkpoint with wave 2 present
        for stem, rows in wave2.items():
            _write_csv(src / f"{stem}.csv", rows)
        q2 = file_stream_etl(
            spark, str(src), SCHEMA, _transform, sink, ckpt,
            available_now=True, max_files_per_trigger=1,
        )
        q2.awaitTermination(120)
        after_restart = spark.read.parquet(sink)
        n_after = after_restart.count()
        per_id = (
            after_restart.groupBy("id").count().where(F.col("count") > 1).count()
        )
        # idle third run: no new files -> no new rows
        q3 = file_stream_etl(
            spark, str(src), SCHEMA, _transform, sink, ckpt,
            available_now=True,
        )
        q3.awaitTermination(120)
        n_idle = spark.read.parquet(sink).count()
        total_rows = sum(len(r) for r in wave1.values()) + sum(
            len(r) for r in wave2.values()
        )
        evidence["restart_exactly_once"] = {
            "rows_wave1": n_wave1,
            "rows_after_restart": n_after,
            "rows_after_idle_run": n_idle,
            "expected_total": total_rows,
            "duplicate_ids": per_id,
            "pass": (
                n_after == total_rows == n_idle and per_id == 0
            ),
        }

        # --- T4: idempotent merge replay (2,000-row batch)
        tgt = str(base / "fact")
        batch_df = spark.createDataFrame(
            [
                (ok, f"k{ck}", float(tp))
                for ok, ck, tp in orows[:2000]
            ],
            "id bigint, k string, v double",
        )
        merge_into_parquet(spark, tgt, batch_df, ["id"])
        h1 = value_hash(spark.read.parquet(tgt))
        merge_into_parquet(spark, tgt, batch_df, ["id"])  # replay
        h2 = value_hash(spark.read.parquet(tgt))
        evidence["merge_idempotent_replay"] = {
            "hash_first": h1,
            "hash_replayed": h2,
            "rows": spark.read.parquet(tgt).count(),
            "match": h1 == h2,
        }

        evidence["all_pass"] = all(
            sec.get("match", sec.get("pass", False))
            for sec in evidence.values()
            if isinstance(sec, dict)
        )
        out_path = f"/root/repo/STREAMING_r{tag}.json"
        with open(out_path, "w") as f:
            json.dump(evidence, f, indent=2)
        print(json.dumps(evidence, indent=2))
        print(f"wrote {out_path}")
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
