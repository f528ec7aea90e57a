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
        # round-5 invariant: the rotation list enumerates names
        # uniquely (a duplicate would double-fill a driver window
        # slot) and — with the catalog frozen — covers every
        # currently-unchecked name, so nothing can hide from the
        # drain schedule
        assert len(entrymod._CHECK_FIRST) == len(set(entrymod._CHECK_FIRST))
        uncovered = [
            n
            for n in q
            if n not in done and n not in set(entrymod._CHECK_FIRST)
        ]
        assert not uncovered, f"unchecked names outside rotation: {uncovered}"

    def test_columns_are_lowercase_identifiers(self, spark):
        # the driver sorts columns by name before hashing: exotic
        # column names (spaces, uppercase surprises) break silently
        import re

        q = entrymod.queries()
        ident = re.compile(r"^[a-z][a-z0-9_]*$")
        # spot-check a handful registered this round
        names = [
            "duplicate_span_pairs", "zorder_locality", "zipf_slope_fit",
            "pps_systematic_sample", "jl_random_projection",
            "sequence_pattern_match", "dedup_detector_agreement",
        ]
        for n in names:
            df = q[n](spark, "/root/testdata/sf0.001")
            bad = [c for c in df.columns if not ident.match(c)]
            assert not bad, f"{n}: non-canonical columns {bad}"


class TestOracleTypeHygiene:
    def test_no_hugeint_in_any_oracle_final_projection(self):
        """DuckDB SUM over integers returns HUGEINT, which the
        driver's canonicalizer hashes differently from Spark BIGINT
        even when values match (VERDICT r2's only driver failure,
        tpch_q12). Bind every oracle lazily — no execution — and
        assert no final-projection column is HUGEINT/UHUGEINT; the
        fix at the offending site is CAST(SUM(...) AS BIGINT)."""
        import duckdb

        con = duckdb.connect()
        for t in (
            "region nation customer supplier part orders lineitem "
            "events documents embeddings"
        ).split():
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"'/root/testdata/sf0.001/{t}.parquet'"
            )
        offenders = {}
        for name, sql in entrymod.oracle_sql().items():
            try:
                rel = con.sql(sql)
            except Exception:  # noqa: BLE001
                # fixture-path oracles (xlsx/Derby/snapshot round
                # trips) may reference dirs a query builder writes
                # at runtime; the runtime gate covers their types
                continue
            huge = [
                c
                for c, ty in zip(rel.columns, rel.types)
                if str(ty).upper() in ("HUGEINT", "UHUGEINT")
            ]
            if huge:
                offenders[name] = huge
        assert not offenders, (
            f"uncast integer aggregates (HUGEINT) in oracles: {offenders}"
        )


class TestBareSessionPortability:
    def test_queries_survive_a_driverlike_default_session(self, spark):
        """The driver harness runs ``queries()`` on its OWN default
        SparkSession, with none of ``engine.get_spark``'s confs —
        round 3's only driver failure (``pyds_txn_source_roundtrip``,
        DATA_SOURCE_PUSHDOWN_DISABLED) was exactly such a session-conf
        portability bug. Simulate it: a ``newSession()`` (fresh
        SQLConf, shared JVM) with every ``engine.SESSION_PINS`` conf
        forced to its Spark DEFAULT, then run the slice of the catalog
        most exposed to session confs (custom Python DataSource,
        streaming sinks, VARIANT, XML, recursive CTE, pipe syntax,
        timestamp-nanos tables) and assert each executes. The
        ``catalog.query`` pin hook is what must make these pass."""
        import __spark_entry__ as entrymod

        bare = spark.newSession()
        # Spark out-of-the-box defaults (the driver's session state)
        bare.conf.set("spark.sql.python.filterPushdown.enabled", "false")
        bare.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
        bare.conf.set(
            "spark.sql.session.timeZone", "America/Los_Angeles"
        )  # deliberately NOT UTC — worst-case driver host tz
        q = entrymod.queries()
        for name in [
            "pyds_txn_source_roundtrip",   # Python DataSource pushFilters
            "txn_merge_audit",             # commit-log merge lifecycle
            "stream_etl_roundtrip",        # readStream->checkpoint->sink
            "variant_semistructured_agg",  # VARIANT
            "xml_source_roundtrip",        # built-in XML source
            "recursive_cte_hierarchy",     # WITH RECURSIVE
            "pipe_syntax_rollup",          # SQL pipe syntax
            "tumbling_window_full",        # events TIMESTAMP(NANOS) + tz
            "asof_join_prior_click",       # events + window semantics
            "flagship_confirmation",       # the entry() headline path
            # round-4 second tranche: session-state-touching newcomers
            "udtf_table_argument_sessions",  # udtf.register + temp view
            "lateral_topk_per_entity",       # temp views + LATERAL SQL
            "stream_static_enrich_roundtrip",  # readStream + dim join
            "jsonl_gzip_source_roundtrip",   # gzip write/read fixture
            "kaplan_meier_survival",         # events tz + cumsum collect
            "cuped_variance_reduction",      # timestamp-literal cutoff
        ]:
            rows = q[name](bare, "/root/testdata/sf0.001").collect()
            assert rows, name
        # and the pins must not have leaked wrong values back: the hook
        # re-pins per call, so after the run the bare session holds them
        assert bare.conf.get("spark.sql.session.timeZone") == "UTC"
        assert (
            bare.conf.get("spark.sql.python.filterPushdown.enabled")
            == "true"
        )


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
            "txn_merge_audit",
            "stream_etl_roundtrip",
            "weblog_text_parse",
            "orc_source_roundtrip",
            "csv_quirks_roundtrip",
            "pyds_txn_source_roundtrip",
            "partitioned_merge_audit",
            "compaction_audit",
            # round-4 guarded builds: two-batch parquet evolution dir,
            # WARC archive fixture
            "schema_evolution_merge_read",
            "warc_source_roundtrip",
            # round-4 second tranche: fixed-width text, gzip JSONL,
            # stream-static sink (all _SUCCESS/_DONE-guarded)
            "fixed_width_source_roundtrip",
            "jsonl_gzip_source_roundtrip",
            "stream_static_enrich_roundtrip",
            "txn_vacuum_retention_audit",
            "stream_multibatch_incremental_roundtrip",
        ]:
            first = sorted(
                tuple(r) for r in q[name](spark, "/root/testdata/sf0.001").collect()
            )
            second = sorted(
                tuple(r) for r in q[name](spark, "/root/testdata/sf0.001").collect()
            )
            assert first == second and first, name
