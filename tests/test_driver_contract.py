"""Guard the driver contract in __spark_entry__: the rotation,
queries()/oracle_sql() pairing, and name hygiene — the things the
correctness harness depends on but no query test exercises."""

from __future__ import annotations

import __spark_entry__ as entrymod


class TestDriverContract:
    def test_every_oracle_has_a_query(self):
        q, o = entrymod.queries(), entrymod.oracle_sql()
        assert set(o) <= set(q)
        # the catalog's own rule: everything oracle-checked
        missing = sorted(set(q) - set(o))
        assert not missing, f"queries without oracles: {missing}"

    def test_rotation_names_exist_and_front_is_unverified(self):
        q = entrymod.queries()
        ghosts = [n for n in entrymod._CHECK_FIRST if n not in q]
        assert not ghosts, f"_CHECK_FIRST names not registered: {ghosts}"
        order = list(q)
        done = entrymod._driver_verified()
        # every driver-verified name must sit behind every unverified one
        first_done = min(
            (order.index(n) for n in order if n in done),
            default=len(order),
        )
        last_pending = max(
            (order.index(n) for n in order if n not in done),
            default=-1,
        )
        assert last_pending < first_done or first_done == len(order)

    def test_columns_are_lowercase_identifiers(self):
        # the driver sorts columns by name before hashing: exotic
        # column names (spaces, uppercase surprises) break silently
        import re

        q = entrymod.queries()
        ident = re.compile(r"^[a-z][a-z0-9_]*$")
        # spot-check a handful registered this round
        spark = None
        names = [
            "duplicate_span_pairs", "zorder_locality", "zipf_slope_fit",
            "pps_systematic_sample", "jl_random_projection",
            "sequence_pattern_match", "dedup_detector_agreement",
        ]
        from concurrent_etl_spark.engine import get_spark

        spark = get_spark(app_name="contract-test", master="local[4]")
        for n in names:
            df = q[n](spark, "/root/testdata/sf0.001")
            bad = [c for c in df.columns if not ident.match(c)]
            assert not bad, f"{n}: non-canonical columns {bad}"


class TestSideEffectfulQueryIdempotence:
    def test_guarded_builds_rerun_identically(self, spark):
        """Queries with guarded construction-time side effects (xlsx
        synthesis, Derby load, snapshot writes, bucketed-table build)
        must return identical results when invoked twice in one
        session — the second call must hit the existence guard, not
        re-build or double-append."""
        import __spark_entry__ as entrymod

        q = entrymod.queries()
        for name in [
            "xlsx_source_roundtrip",
            "jdbc_source_roundtrip",
            "snapshot_diff_audit",
            "bucketed_colocated_join",
        ]:
            first = sorted(
                tuple(r) for r in q[name](spark, "/root/testdata/sf0.001").collect()
            )
            second = sorted(
                tuple(r) for r in q[name](spark, "/root/testdata/sf0.001").collect()
            )
            assert first == second and first, name
