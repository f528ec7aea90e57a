"""Tests for dedup / similarity / text / multimodal operators."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from concurrent_etl_spark.operators import dedup as D
from concurrent_etl_spark.operators import multimodal as M
from concurrent_etl_spark.operators import similarity as S
from concurrent_etl_spark.operators import text as T


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog again and again"),
        (1, "the quick brown fox jumps over the lazy dog again and again"),  # exact dup of 0
        (2, "quick brown fox jumps over the lazy dog again and again"),  # near dup (1 word off)
        (3, "completely different content about spark query engines here"),
        (4, "der hund und die katze und der vogel und das haus"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


class TestTextOps:
    def test_token_count(self, docs):
        out = {r["doc_id"]: r["n"] for r in docs.select(
            "doc_id", T.token_count("text").alias("n")).collect()}
        assert out[0] == 12 and out[3] == 8

    def test_tokens_handle_extra_whitespace(self, spark):
        df = spark.createDataFrame([(0, "  a   b  c ")], ["doc_id", "text"])
        assert df.select(T.token_count("text")).collect()[0][0] == 3

    def test_shingles_short_doc(self, spark):
        df = spark.createDataFrame([(0, "one")], ["doc_id", "text"])
        assert df.select(T.shingles("text", 2)).collect()[0][0] == []

    def test_content_hash_normalizes(self, spark):
        df = spark.createDataFrame(
            [(0, "Hello  World"), (1, "hello world")], ["doc_id", "text"]
        )
        h = [r[0] for r in df.select(T.content_hash("text")).collect()]
        assert h[0] == h[1]

    def test_lang_id_german(self, docs):
        out = {r["doc_id"]: r["lang"] for r in docs.select(
            "doc_id", T.lang_id("text").alias("lang")).collect()}
        assert out[4] == "de"
        assert out[0] == "en"

    def test_quality_in_unit_interval(self, docs):
        vals = [r[0] for r in docs.select(T.quality_score("text")).collect()]
        assert all(0.0 <= v <= 1.0 for v in vals)


class TestExactDedup:
    def test_finds_exact_group(self, docs):
        groups = D.exact_dup_groups(docs).collect()
        assert len(groups) == 1
        g = groups[0]
        assert g["n_docs"] == 2 and g["keep_doc_id"] == 0 and g["doc_ids"] == "0,1"


class TestMinHash:
    def test_near_dup_found_random_not(self, docs):
        pairs = {(r["doc_a"], r["doc_b"]): r["est_jaccard"]
                 for r in D.minhash_lsh_pairs(docs).collect()}
        assert (0, 1) in pairs and pairs[(0, 1)] == 1.0  # identical text
        assert (0, 2) in pairs and pairs[(0, 2)] > 0.5  # near dup
        assert (0, 3) not in pairs  # unrelated

    def test_ngram_jaccard_threshold(self, docs):
        out = {(r["doc_a"], r["doc_b"]): r["jaccard"]
               for r in D.ngram_jaccard_pairs(docs, threshold=0.5).collect()}
        assert out[(0, 1)] == 1.0
        assert 0.5 <= out[(0, 2)] < 1.0


class TestSimHash:
    def test_fingerprint_in_32_bits(self, docs):
        fps = [r["simhash"] for r in D.simhash(docs).collect()]
        assert all(0 <= f < 2**32 for f in fps)

    def test_identical_docs_same_fingerprint(self, docs):
        fp = {r["doc_id"]: r["simhash"] for r in D.simhash(docs).collect()}
        assert fp[0] == fp[1]

    def test_pairs_find_exact_dup(self, docs):
        pairs = {(r["doc_a"], r["doc_b"]): r["hamming"]
                 for r in D.simhash_pairs(docs, max_hamming=3).collect()}
        assert pairs[(0, 1)] == 0


class TestSimHash64:
    def test_fingerprint_in_60_bits(self, docs):
        fps = [r["simhash"] for r in D.simhash64(docs).collect()]
        assert all(0 <= f < 2**60 for f in fps)

    def test_identical_docs_same_fingerprint(self, docs):
        fp = {r["doc_id"]: r["simhash"] for r in D.simhash64(docs).collect()}
        assert fp[0] == fp[1]

    def test_pairs_find_exact_dup_reject_unrelated(self, docs):
        pairs = {(r["doc_a"], r["doc_b"]): r["hamming"]
                 for r in D.simhash64_pairs(docs, max_hamming=3).collect()}
        assert pairs[(0, 1)] == 0
        assert (0, 3) not in pairs

    def test_band_join_complete_vs_brute_force(self, docs):
        # pigeonhole completeness: every pair within hamming<=3 of the
        # BRUTE-FORCE fingerprint cross must be emitted by the band join
        fp = {r["doc_id"]: r["simhash"] for r in D.simhash64(docs).collect()}
        ids = sorted(fp)
        want = {
            (a, b)
            for i, a in enumerate(ids)
            for b in ids[i + 1 :]
            if bin(fp[a] ^ fp[b]).count("1") <= 3
        }
        got = {(r["doc_a"], r["doc_b"])
               for r in D.simhash64_pairs(docs, max_hamming=3).collect()}
        assert got == want

    def test_less_saturated_than_32_bit(self, spark):
        # the Heaps-corpus finding in miniature: short docs sharing a
        # stopword head collide at 32 bits, separate at 60
        rows = [
            (i, f"the of and to in w{i}a w{i}b w{i}c w{i}d w{i}e")
            for i in range(30)
        ]
        docs = spark.createDataFrame(rows, ["doc_id", "text"])
        n32 = D.simhash_pairs(docs, max_hamming=3).count()
        n64 = D.simhash64_pairs(docs, max_hamming=3).count()
        assert n64 <= n32


class TestSimilarity:
    def test_hyperplanes_deterministic(self):
        a, b = S.hyperplanes(), S.hyperplanes()
        assert a == b
        assert all(-1.0 <= v <= 1.0 for row in a for v in row)

    def test_brute_force_topk_self_similarity(self, spark):
        import math

        vecs = [
            (0, [1.0, 0.0, 0.0]),
            (1, [0.9, 0.1, 0.0]),   # closest to 0
            (2, [0.0, 1.0, 0.0]),
            (3, [-1.0, 0.0, 0.0]),  # opposite of 0
        ]
        df = spark.createDataFrame(vecs, ["vec_id", "embedding"])
        out = S.brute_force_topk(df, df.where(F.col("vec_id") == 0), k=3).collect()
        ranked = [r["neighbor_id"] for r in sorted(out, key=lambda r: r["rank"])]
        assert ranked[0] == 1 and ranked[-1] == 3
        top = [r for r in out if r["rank"] == 1][0]
        assert math.isclose(top["cos_sim"], 0.9 / math.sqrt(0.82), rel_tol=1e-9)

    def test_lsh_neardup_finds_parallel_vectors(self, spark):
        base = [0.5] * 8 + [-0.25] * 56
        near = [v * 1.01 for v in base]
        far = [(-1) ** i * 0.3 for i in range(64)]
        df = spark.createDataFrame(
            [(0, base), (1, near), (2, far)], ["vec_id", "embedding"]
        )
        pairs = {(r["vec_a"], r["vec_b"]) for r in S.lsh_neardup_pairs(df).collect()}
        assert (0, 1) in pairs
        assert (0, 2) not in pairs


class TestMultimodal:
    def test_feature_extraction_roundtrip(self, docs):
        feats = {r["doc_id"]: r for r in
                 M.extract_features(M.synthesize_payloads(docs)).collect()}
        import hashlib

        text0 = docs.where(F.col("doc_id") == 0).collect()[0]["text"]
        assert feats[0]["n_bytes"] == len(text0.encode())
        assert feats[0]["payload_md5"] == hashlib.md5(text0.encode()).hexdigest()
        assert feats[0]["first_byte"] == ord(text0[0])
        assert feats[0]["modality"] == "image"

    def test_decode_stubs_raise(self):
        with pytest.raises(NotImplementedError):
            M.decode_image(b"\x89PNG")
        with pytest.raises(NotImplementedError):
            M.decode_audio(b"RIFF")


class TestMultimodalFrames:
    def test_frame_sample_short_and_stride(self, spark):
        """Docs shorter than one frame yield exactly one frame; longer
        docs sample frames 0, k, 2k, ... with the tail truncated."""
        import pandas as pd

        from concurrent_etl_spark.operators.multimodal import (
            frame_sample,
            synthesize_payloads,
        )

        docs = spark.createDataFrame(
            pd.DataFrame(
                {
                    # doc_id % 3 == 2 => modality 'video'
                    "doc_id": [2, 5],
                    "text": ["short", "x" * 1300],
                }
            )
        )
        rows = frame_sample(
            synthesize_payloads(docs), every_k=4, frame_units=256
        ).collect()
        by_doc = {}
        for r in rows:
            by_doc.setdefault(r.doc_id, []).append(r)
        assert [(r.frame_idx, r.n_frame_units) for r in by_doc[2]] == [(0, 5)]
        # 1300 chars -> frames 0..5 (6 strides), sampled {0, 4}
        assert sorted((r.frame_idx, r.n_frame_units) for r in by_doc[5]) == [
            (0, 256),
            (4, 256),
        ]

    def test_resize_truncates_images_only(self, spark):
        import pandas as pd

        from concurrent_etl_spark.operators.multimodal import (
            resize_payload,
            synthesize_payloads,
        )

        docs = spark.createDataFrame(
            pd.DataFrame(
                {
                    "doc_id": [0, 3, 2],  # 0,3 -> image; 2 -> video
                    # doc 3: é is 1 unit but 2 utf-8 bytes
                    "text": ["a" * 500, "é" * 100, "c" * 500],
                }
            )
        )
        rows = {
            r.doc_id: (r.n_units, r.n_bytes)
            for r in resize_payload(
                synthesize_payloads(docs), target_units=256
            ).collect()
        }
        # video excluded; long doc clipped to 256 units; multibyte doc
        # keeps all 100 units = 200 bytes (units are decoded chars)
        assert rows == {0: (256, 256), 3: (100, 200)}


class TestConnectedComponents:
    def test_chain_and_disjoint_pair(self, spark):
        """A 4-node chain (diameter 3 => multiple propagation rounds)
        plus a disjoint pair resolve to two min-labeled components."""
        from concurrent_etl_spark.operators.dedup import connected_components

        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4), (10, 11)], ["doc_a", "doc_b"]
        )
        out = {
            r.node: r.component for r in connected_components(edges).collect()
        }
        assert out == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}

    def test_cluster_sizes(self, spark):
        from concurrent_etl_spark.operators.dedup import dup_clusters

        docs = spark.createDataFrame(
            [
                (1, "the quick brown fox jumps over the lazy dog again"),
                (2, "the quick brown fox jumps over the lazy dog again"),
                (3, "completely different text about spark and parquet files"),
            ],
            ["doc_id", "text"],
        )
        rows = {r.doc_id: (r.cluster_id, r.cluster_size) for r in dup_clusters(docs).collect()}
        # identical docs cluster under the min id; the unrelated doc is absent
        assert rows == {1: (1, 2), 2: (1, 2)}

    def test_long_chain_converges(self, spark):
        """A 80-node chain (diameter 79) must converge well inside
        max_iter=25 via pointer jumping — plain neighbor-min would
        need 79 rounds and silently truncate."""
        from concurrent_etl_spark.operators.dedup import connected_components

        edges = spark.createDataFrame(
            [(i, i + 1) for i in range(80)], ["doc_a", "doc_b"]
        )
        out = {r.node: r.component for r in connected_components(edges).collect()}
        assert out == {i: 0 for i in range(81)}
