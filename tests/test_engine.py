"""Engine/session regression tests."""

from __future__ import annotations

from concurrent_etl_spark.engine import load_table

SF_DIR = "/root/testdata/sf0.001"


class TestEventsTimestampNormalization:
    def test_ts_is_ltz_timestamp(self, spark):
        """events.ts is TIMESTAMP(NANOS) parquet; depending on the
        Spark version it arrives as long-nanos (<=4.0 with
        nanosAsLong) or timestamp_ntz (4.1+, which ignores the legacy
        conf). load_table must normalize both to plain TIMESTAMP so
        epoch casts (cast ts as long) stay legal downstream."""
        df = load_table(spark, SF_DIR, "events")
        assert dict(df.dtypes)["ts"] == "timestamp"

    def test_epoch_cast_works_and_utc_pinned(self, spark):
        from pyspark.sql import functions as F

        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
        row = (
            load_table(spark, SF_DIR, "events")
            .select(
                F.min(F.col("ts").cast("long")).alias("lo"),
                F.max(F.col("ts").cast("long")).alias("hi"),
            )
            .collect()[0]
        )
        assert 0 < row["lo"] <= row["hi"]
