"""In-session rerun stability for fixture-building queries.

A subset of catalog queries materialize their own input fixture on
first call (Excel/XML/WARC/Avro/ORC/CSV/fixed-width codecs, the
transactional-table and snapshot layers, the partition-merge and
pruning audits) behind a construction-time guard keyed by
application id. The contract this suite pins: a SECOND call in the
same session must NOT rebuild, mutate, or double-append the fixture
— the result set is bit-identical to the first call's. This is the
idempotence a scheduler retry or a downstream re-read relies on; a
broken rebuild guard shows up here as a duplicate batch or a
rewritten file, not in the single-shot oracle gate.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"

FIXTURE_BUILDERS = [
    "xlsx_source_roundtrip",
    "jdbc_source_roundtrip",
    "xml_source_roundtrip",
    "warc_source_roundtrip",
    "avro_source_roundtrip",
    "orc_source_roundtrip",
    "csv_quirks_roundtrip",
    "fixed_width_source_roundtrip",
    "jsonl_gzip_source_roundtrip",
    "json_corrupt_record_capture",
    "txn_merge_audit",
    "txn_time_travel_diff",
    "txn_vacuum_retention_audit",
    "pyds_txn_source_roundtrip",
    "snapshot_diff_audit",
    "gdpr_erasure_audit",
    "write_audit_publish_txn",
    "partitioned_merge_audit",
    "compaction_audit",
    "parquet_zonemap_audit",
    "dynamic_partition_pruning_audit",
    "schema_evolution_merge_read",
]


def _canon(df):
    cols = sorted(df.columns)
    return sorted(tuple(str(row[c]) for c in cols) for row in df.collect())


@pytest.mark.parametrize("name", FIXTURE_BUILDERS)
def test_second_call_is_stable(spark, name):
    fn = entrymod.queries()[name]
    try:
        first = _canon(fn(spark, SF_DIR))
        second = _canon(fn(spark, SF_DIR))
    finally:
        spark.catalog.clearCache()
    assert first, f"{name} returned no rows at {SF_DIR}"
    assert first == second
