"""Deduplication operators for LLM training-data pipelines.

Four families, each scale-shaped for 100 TB:

  * exact          — content-hash groupBy; one shuffle on the hash,
                     map-side partial agg, no pairwise work.
  * MinHash + LSH  — shingle -> K minhashes -> B bands -> bucket
                     join. Only docs sharing a band bucket are ever
                     paired, so candidate generation is O(docs x B)
                     shuffle + within-bucket pairs instead of O(n^2).
  * SimHash        — 32-bit weighted fingerprint; Hamming-LSH via
                     byte bands, exact hamming <= r verify on
                     candidates only.
  * n-gram Jaccard — exact Jaccard verification on the LSH candidate
                     pairs (never on the full cross product).

Everything is built-in expressions: md5 signatures (cross-engine
deterministic), higher-order array functions for signatures (computed
per-row, no explode until the band stage), and broadcast-free
self-joins keyed on bucket hashes.

The synthetic corpus has no natural near-dups, so catalog queries
inject deterministic mutants (drop the first two words of docs with
doc_id < 40, re-keyed +100000) — the oracle reproduces the injection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from concurrent_etl_spark.operators.text import (
    ascii_fold,
    content_hash,
    shingles_from_tokens,
    tokens,
)

MINHASH_K = 24  #: signature length
LSH_BANDS = 8  #: bands (rows per band = K / B = 3)
SIMHASH_BITS = 32
MINHASH_PRIME = 4294967311  #: smallest prime > 2^32


def _md5_int(s: str) -> int:
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


#: deterministic affine-permutation coefficients (a odd < 2^30 keeps
#: a*h < 2^62 — no bigint overflow in any engine; b < prime)
MINHASH_A = [(_md5_int(f"a{s}") % (2**30 - 1)) | 1 for s in range(MINHASH_K)]
MINHASH_B = [_md5_int(f"b{s}") % MINHASH_PRIME for s in range(MINHASH_K)]


# ---------------------------------------------------------------------------
# corpus mutation (test fixture injection, mirrored in oracle SQL)
# ---------------------------------------------------------------------------

def with_injected_near_dups(
    docs: DataFrame, n: int = 40, id_offset: int = 100_000
) -> DataFrame:
    """Union docs with near-duplicate mutants (first two words dropped)."""
    mutants = docs.where(F.col("doc_id") < n).select(
        (F.col("doc_id") + id_offset).alias("doc_id"),
        F.array_join(F.slice(tokens("text"), 3, 1_000_000), " ").alias("text"),
    )
    return docs.select("doc_id", "text").unionByName(mutants)


def with_injected_exact_dups(
    docs: DataFrame, n: int = 40, id_offset: int = 100_000
) -> DataFrame:
    """Union docs with byte-identical copies under new ids."""
    copies = docs.where(F.col("doc_id") < n).select(
        (F.col("doc_id") + id_offset).alias("doc_id"), "text"
    )
    return docs.select("doc_id", "text").unionByName(copies)


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_dup_groups(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Groups of byte-identical (normalized) documents.

    Returns (content_hash, n_docs, keep_doc_id, dup_doc_ids) for
    groups with >1 member; keep = min doc_id (deterministic survivor).
    """
    hashed = docs.select("doc_id", content_hash(text_col).alias("content_hash"))
    return (
        hashed.groupBy("content_hash")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("keep_doc_id"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("doc_id")), lambda x: x.cast("string")
                ),
                ",",
            ).alias("doc_ids"),
        )
        .where(F.col("n_docs") > 1)
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def staged_shingles(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, sh) with tokens staged before shingling.

    Two-step projection so the token array is computed once per row,
    not once per shingle (see text.shingles_from_tokens).
    """
    return (
        docs.select("doc_id", tokens(ascii_fold(F.col(text_col))).alias("_toks"))
        .select("doc_id", shingles_from_tokens(F.col("_toks"), 2).alias("sh"))
    )


def hash_shingles(sh: F.Column) -> F.Column:
    """32-bit md5 hash per distinct bigram shingle (array<bigint>).

    Each shingle is md5'd ONCE; the K permutations are cheap affine
    maps over these ints (10-100x faster than K md5 passes, same
    collision behaviour — the standard minhash implementation trick).
    """
    return F.transform(
        sh, lambda x: F.conv(F.substring(F.md5(x), 1, 8), 16, 10).cast("bigint")
    )


def minhash_signature_from_hashes(hs: F.Column, k: int = MINHASH_K) -> F.Column:
    """K minhashes via affine permutations (a_s*h + b_s) mod p (array<bigint>).

    Coefficients are md5-seeded constants => reproducible across
    engines and runs; a < 2^30 guarantees no 64-bit overflow.
    """
    def perm(a: int, b: int):
        return lambda h: (h * F.lit(a) + F.lit(b)) % F.lit(MINHASH_PRIME)

    return F.array(
        *[
            F.array_min(F.transform(hs, perm(MINHASH_A[s], MINHASH_B[s])))
            for s in range(k)
        ]
    )


def lsh_bands(sig_col: F.Column, bands: int = LSH_BANDS, k: int = MINHASH_K) -> F.Column:
    """Concatenate-and-hash each band of the signature (array<string>)."""
    rows = k // bands
    return F.array(
        *[
            F.md5(
                F.concat_ws(
                    "|",
                    *[
                        F.element_at(sig_col, b * rows + i + 1).cast("string")
                        for i in range(rows)
                    ],
                )
            )
            for b in range(bands)
        ]
    )


def minhash_lsh_pairs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Candidate near-dup pairs sharing >=1 LSH band, with estimated
    Jaccard = fraction of agreeing minhashes.

    Scale shape: signatures are computed per-row (no shuffle) and
    PERSISTED before the self-join — otherwise Catalyst would inline
    and recompute the whole signature pipeline on both join sides for
    every band row (measured 40x slowdown). The only shuffle keys on
    (band_index, band_hash); within-bucket pairs are tiny when bands
    are tuned to the threshold.
    """
    # empty-shingle gate: a doc with <2 tokens has no bigrams and
    # cannot be near-dup-matched by this detector (exact dedup owns
    # it). Without the gate every empty doc's 24 NULL minhashes band
    # to the SAME md5('') bucket (concat_ws skips NULLs), so all
    # empty docs in the corpus pair ALL-PAIRS — a quadratic blow-up
    # at 100 TB where empty docs are common. The predicate is the
    # RAW-TEXT equivalent (>=2 whitespace tokens <=> trimmed text
    # matches \S\s+\S) so it pushes to the scan as a cheap regex —
    # filtering on size(sh) of the COMPUTED array gets predicate-
    # pushed below the projection and re-evaluates the whole shingle
    # pipeline per row (measured 4x on the sf0.1 bench).
    gated = docs.where(
        F.trim(F.col(text_col)).rlike(
            r"[^ \t\n\x0B\f\r][ \t\n\x0B\f\r]+[^ \t\n\x0B\f\r]"
        )
    )
    sigs = (
        staged_shingles(gated, text_col)
        .select("doc_id", hash_shingles(F.col("sh")).alias("hs"))
        .select("doc_id", minhash_signature_from_hashes(F.col("hs")).alias("sig"))
        .withColumn("bands", lsh_bands(F.col("sig")))
        .persist()
    )

    # the band self-join carries ONLY (doc_id, band) through the
    # shuffle — signatures re-attach to the (tiny) deduped candidate
    # set afterwards from the cached sigs. Shuffling the 24-element
    # sig array 8x per doc measured neutral at sf0.1 (AQE broadcasts
    # the exploded side locally) but costs ~200x more exchange bytes
    # per band row under the shuffle join a 100 TB corpus forces.
    # sigs is persisted (attribute explode is clone-free), but the
    # house lint bans plain posexplode over staged columns uniformly
    exploded = sigs.select(
        "doc_id", F.posexplode_outer("bands").alias("band_idx", "band_hash")
    ).where(F.col("band_idx").isNotNull())
    a = exploded.select(
        F.col("doc_id").alias("doc_a"), "band_idx", "band_hash"
    )
    b = exploded.select(
        F.col("doc_id").alias("doc_b"), "band_idx", "band_hash"
    )
    pairs = (
        a.join(b, ["band_idx", "band_hash"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .dropDuplicates(["doc_a", "doc_b"])
        .join(
            sigs.select(F.col("doc_id").alias("doc_a"), F.col("sig").alias("sig_a")),
            "doc_a",
        )
        .join(
            sigs.select(F.col("doc_id").alias("doc_b"), F.col("sig").alias("sig_b")),
            "doc_b",
        )
    )
    est = (
        F.aggregate(
            F.zip_with(
                F.col("sig_a"),
                F.col("sig_b"),
                lambda x, y: F.when(x == y, 1).otherwise(0),
            ),
            F.lit(0),
            lambda acc, x: acc + x,
        )
        / F.lit(float(MINHASH_K))
    )
    return pairs.select("doc_a", "doc_b", est.alias("est_jaccard"))


def ngram_jaccard_pairs(
    docs: DataFrame, text_col: str = "text", threshold: float = 0.8
) -> DataFrame:
    """Exact n-gram Jaccard on LSH candidates only (verify stage).

    |A ∩ B| / |A ∪ B| over distinct bigram shingles; candidates come
    from :func:`minhash_lsh_pairs` so the cross product never
    materializes.
    """
    sh = staged_shingles(docs, text_col).persist()
    cand = minhash_lsh_pairs(docs, text_col).select("doc_a", "doc_b")
    j = (
        cand.join(sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a")), "doc_a")
        .join(sh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b")), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.size(F.array_union("sh_a", "sh_b"))
            ).alias("jaccard"),
        )
    )
    return j.where(F.col("jaccard") >= threshold)


# ---------------------------------------------------------------------------
# duplicate-cluster formation (connected components)
# ---------------------------------------------------------------------------

def connected_components(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 25,
) -> DataFrame:
    """Connected components over an undirected pair graph.

    Returns (node, component) where ``component`` is the minimum node
    id reachable from ``node`` — the deterministic cluster label a
    dedup pipeline keeps as the survivor. Candidate pairs from LSH are
    only *pairwise* relations; forming the actual duplicate groups
    (A~B, B~C => {A,B,C}) requires transitive closure, which the
    reference never needed (its dedup was single-key
    ``drop_duplicates``, case_2/Normal.py:70).

    Algorithm: iterative hash-min label propagation with pointer
    jumping — every node starts labeled with itself; each round takes
    the min over (its own label, its neighbors' labels, its LABEL'S
    label). The label-of-label hop is path doubling, so chain-shaped
    components converge in O(log diameter) rounds, not O(diameter) —
    dup clusters are near-cliques (1-2 rounds), but the bound must
    hold for adversarial graphs too. Stops at fixpoint; RAISES if
    ``max_iter`` rounds don't converge rather than silently returning
    partial components (2^25 exceeds any physical graph's diameter).

    Scale notes: per round, one shuffle join edges x labels + one
    keyed min-agg (map-side combinable) + one self-join on the label;
    ``localCheckpoint`` truncates the lineage each round (iterative
    plans otherwise grow unboundedly and re-execute from the source);
    the convergence probe is ``limit(1).count()`` on the changed-set,
    not a full count.
    """
    sym = (
        edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
        .unionByName(edges.select(F.col(dst).alias("s"), F.col(src).alias("d")))
        .distinct()
        .localCheckpoint()
    )
    # round 1 needs NO join: every label starts as the node itself,
    # so the neighbor-min is min(d) straight off the edge list and
    # the pointer-jump hop (label-of-label) is the identity — one
    # map-side-combinable aggregation replaces the r7 form's
    # edges x labels join + labels x labels self-join (two shuffles
    # and a build side dropped from the first round, which for
    # near-clique dup graphs is half of all rounds)
    labels = (
        sym.groupBy(F.col("s").alias("node"))
        .agg(F.least(F.col("s"), F.min("d")).alias("label"))
        .localCheckpoint()
    )
    for _ in range(max_iter - 1):
        nb_min = (
            sym.join(labels, sym["d"] == labels["node"])
            .groupBy("s")
            .agg(F.min("label").alias("nb_label"))
        )
        # pointer jumping: the label of my current label (always
        # resolvable — every node is in `labels` and label <= node)
        jump = labels.select(
            F.col("node").alias("j_node"), F.col("label").alias("j_label")
        )
        new_label = F.least(
            F.col("label"),
            F.coalesce("nb_label", "label"),
            F.coalesce("j_label", "label"),
        )
        # the convergence probe rides the SAME materialization as the
        # round itself (a `chg` flag computed in the checkpointed
        # projection) — the r7 form re-joined new vs old labels on
        # node, a full extra shuffle per round just to ask "did
        # anything move"; filter+limit over checkpointed blocks is
        # shuffle-free
        new_labels = (
            labels.join(nb_min, labels["node"] == nb_min["s"], "left")
            .join(jump, labels["label"] == jump["j_node"], "left")
            .select(
                "node",
                new_label.alias("label"),
                (new_label != F.col("label")).alias("chg"),
            )
            .localCheckpoint()
        )
        changed = new_labels.where("chg").limit(1).count()
        labels = new_labels.select("node", "label")
        if changed == 0:
            return labels.select("node", F.col("label").alias("component"))
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds"
    )


def dup_clusters(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, cluster_id, cluster_size) for every doc in a near-dup
    cluster, where cluster_id = min doc_id of the component and edges
    are the MinHash-LSH candidate pairs.

    This is the stage after candidate generation in a real training-
    data dedup pipeline: pairs -> components -> keep min-id per
    cluster, drop the rest.
    """
    pairs = minhash_lsh_pairs(docs, text_col).select("doc_a", "doc_b")
    comp = connected_components(pairs)
    sizes = comp.groupBy("component").agg(F.count("*").alias("cluster_size"))
    return comp.join(sizes, "component").select(
        F.col("node").alias("doc_id"),
        F.col("component").alias("cluster_id"),
        "cluster_size",
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash(docs: DataFrame, text_col: str = "text", bits: int = SIMHASH_BITS) -> DataFrame:
    """Per-doc weighted SimHash fingerprint (bigint, low `bits` bits).

    Token hash = first 32 bits of md5 (cross-engine via hex->int);
    bit b of the fingerprint is set when the sum over tokens (with
    multiplicity) of (bit_b(h) ? +1 : -1) is positive.

    Bit extraction: integer shiftright on the non-negative 32-bit h —
    value-identical to the oracle's floor(h / 2^b) % 2 double trick.

    Plan shape: explode tokens, then ONE map-side-combinable
    groupBy(doc_id) over packed per-bit counters (see inline comment);
    no bit-position explode, no pairwise work here.
    """
    tok = docs.select(
        "doc_id", F.explode(tokens(ascii_fold(F.col(text_col)))).alias("tok")
    ).withColumn(
        "h", F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("bigint")
    )
    # ONE groupBy(doc_id) with packed per-bit ones-counters (the
    # simhash64 plan shape back-ported): the previous form exploded a
    # fresh 32-element sign array PER TOKEN (transform+sequence HOF
    # allocation — the span_pairs lesson) into tokens x bits rows and
    # aggregated twice. Packing 3 bit-counters per 63-bit sum in
    # 21-bit lanes needs ceil(bits/3) buffers, no bits explode, no
    # second aggregation. Exact: lane b holds c_b = #tokens (with
    # multiplicity) whose bit b is set; carries impossible while
    # every c_b < 2^21 (a 2M-token PER-DOCUMENT bound — the
    # giant-document axis is 50k). Bit rule unchanged:
    # sign(sum(+/-1)) > 0 <=> 2*c_b > n, ties to 0 on both engines;
    # bit_b(h) via shiftright == the oracle's floor(h / 2^b) % 2 for
    # the non-negative 32-bit h.
    lanes, lane_w = 3, 21
    lane_mask = (1 << lane_w) - 1
    n_packs = (bits + lanes - 1) // lanes
    packed = [
        F.sum(
            sum(
                [
                    F.shiftright(F.col("h"), g * lanes + j)
                    .bitwiseAND(F.lit(1))
                    * F.lit(1 << (j * lane_w)).cast("bigint")
                    for j in range(lanes)
                    if g * lanes + j < bits
                ],
                F.lit(0).cast("bigint"),
            )
        ).alias(f"p{g}")
        for g in range(n_packs)
    ]
    sums = tok.groupBy("doc_id").agg(*packed, F.count(F.lit(1)).alias("_n"))
    return sums.select(
        "doc_id",
        sum(
            [
                F.when(
                    F.shiftright(F.col(f"p{b // lanes}"), (b % lanes) * lane_w)
                    .bitwiseAND(F.lit(lane_mask))
                    * 2
                    > F.col("_n"),
                    F.lit(1 << b).cast("bigint"),
                ).otherwise(F.lit(0).cast("bigint"))
                for b in range(bits)
            ],
            F.lit(0).cast("bigint"),
        ).alias("simhash"),
    )


def simhash_pairs(
    docs: DataFrame, text_col: str = "text", max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs by SimHash: byte-band candidates, exact Hamming verify.

    Hamming-LSH: split the 32-bit fingerprint into 4 bytes; any pair
    within Hamming distance 3 must agree on >=1 byte (pigeonhole), so
    the bucket join on (byte_idx, byte_value) is a complete candidate
    generator — never a cross join.
    """
    fp = simhash(docs, text_col)
    # both sides of the bucket self-join read this; persisted so the
    # fingerprint computation (tokenize + hash + 32 bit-sums per doc)
    # runs once, same as the MinHash signature persist
    bytes_df = fp.select(
        "doc_id",
        "simhash",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(3)),
                lambda k: F.floor(
                    F.col("simhash") / F.pow(F.lit(2.0), k * 8)
                ).cast("bigint")
                % 256,
            )
        ).alias("byte_idx", "byte_val"),
    ).persist()
    a = bytes_df.select(
        F.col("doc_id").alias("doc_a"),
        F.col("simhash").alias("sim_a"),
        "byte_idx",
        "byte_val",
    )
    b = bytes_df.select(
        F.col("doc_id").alias("doc_b"),
        F.col("simhash").alias("sim_b"),
        "byte_idx",
        "byte_val",
    )
    return (
        a.join(b, ["byte_idx", "byte_val"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sim_a", "sim_b")
        .dropDuplicates(["doc_a", "doc_b"])
        .withColumn(
            "hamming",
            F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b"))),
        )
        .where(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


SIMHASH64_BITS = 60  #: 15 md5 hex chars — exact in signed bigint on both engines
SIMHASH64_BANDS = 4  #: 15-bit bands; hamming<=3 + pigeonhole => >=1 band agrees


def simhash64(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc 60-bit SimHash fingerprint over BIGRAM shingles (bigint).

    Why a second width exists: the Heaps'-law corpus (SCALE.md §11e)
    showed the 32-bit fingerprint SATURATING on realistic Zipf text —
    short lognormal docs share the stopword head, so ~1% of ALL doc
    pairs land within Hamming 3 and the pair set is quadratic by
    construction. At 60 bits the hamming<=3 ball occupies ~3e-14 of
    fingerprint space. 60 bits (15 md5 hex chars), not 64, so the
    value and every shift stay exact NON-NEGATIVE signed-64
    arithmetic in both Spark and DuckDB — no unsigned/overflow edge.

    Why bigram-shingle features, not unigrams: the same corpus then
    showed width alone is NOT sufficient — with multiplicity-weighted
    unigram features, short stopword-dominated docs are GENUINELY
    near-collinear (their token multisets nearly coincide), so even a
    60-bit fingerprint pairs them quadratically (measured rows_ratio
    15.8 on a 4x corpus). Distinct bigram shingles — the same feature
    set as the MinHash path — decorrelate the stopword head (sharing
    'the of and' as unigrams no longer implies sharing 'the of'/'of
    and' bigrams in the same positions), and pair growth drops to
    linear. Feature choice, not fingerprint width, controls simhash
    discrimination; production simhash (idf-weighted / shingled)
    embeds the same lesson. Docs with <2 tokens have no features and
    drop out of the fingerprint set on both engines (explode/unnest
    of an empty list — the minhash empty-shingle gate's analogue,
    here for free).

    Plan shape: no bits-fold row expansion — ONE groupBy(doc_id)
    carrying 20 packed 3-lane ones-counters (see inline comment) —
    map-side combinable, no second explode, one pass over the
    shingle rows. Bit extraction is shiftright (exact integer op;
    the 32-bit oracle form's floor(h / 2^b) double trick does not
    survive 60-bit magnitudes).
    """
    staged = docs.select(
        "doc_id", tokens(ascii_fold(F.col(text_col))).alias("_t")
    )
    sh = staged.select(
        "doc_id",
        F.explode(shingles_from_tokens(F.col("_t"), 2)).alias("sh"),
    ).withColumn(
        "h", F.conv(F.substring(F.md5("sh"), 1, 15), 16, 10).cast("bigint")
    )
    # Packed per-bit ones-counters: 3 bits share one 63-bit sum in
    # 21-bit lanes, so the groupBy carries 20 aggregate buffers + n
    # instead of 60. The naive 60-buffer form blew the whole-stage
    # codegen budget and the ENTIRE stage (tokenize + md5 + agg) ran
    # interpreted — zero `codegen id` markers in the physical plan;
    # the packed form restores codegen (guide §1.2 step 2: per-task
    # work). Exactness: lane b counts c_b = #shingles with bit b set,
    # lanes cannot carry while every c_b < 2^21 — i.e. up to 2M
    # shingles PER DOCUMENT (per-doc bound, not corpus; the
    # giant-document axis is 50k). Sign rule unchanged:
    # sign(2*c_b - n) == sign(sum(+/-1)) bit for bit, ties to 0 on
    # both engines, so the fingerprint is bit-identical to the
    # 60-sum oracle form.
    lanes = 3
    lane_w = 21
    lane_mask = (1 << lane_w) - 1
    n_packs = SIMHASH64_BITS // lanes  # 20
    packed = [
        F.sum(
            sum(
                [
                    (
                        F.shiftright(F.col("h"), g * lanes + j)
                        .bitwiseAND(F.lit(1))
                    )
                    * F.lit(1 << (j * lane_w)).cast("bigint")
                    for j in range(lanes)
                ],
                F.lit(0).cast("bigint"),
            )
        ).alias(f"p{g}")
        for g in range(n_packs)
    ]
    sums = sh.groupBy("doc_id").agg(
        *packed, F.count(F.lit(1)).alias("_n")
    )
    fp = sums.select(
        "doc_id",
        sum(
            [
                F.when(
                    F.shiftright(F.col(f"p{b // lanes}"), (b % lanes) * lane_w)
                    .bitwiseAND(F.lit(lane_mask))
                    * 2
                    > F.col("_n"),
                    F.lit(1 << b).cast("bigint"),
                ).otherwise(F.lit(0).cast("bigint"))
                for b in range(SIMHASH64_BITS)
            ],
            F.lit(0).cast("bigint"),
        ).alias("simhash"),
    )
    return fp


def simhash64_pairs(
    docs: DataFrame, text_col: str = "text", max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs by 60-bit SimHash: 15-bit-band candidates, exact verify.

    Pigeonhole: hamming <= 3 over 4 disjoint 15-bit bands => >=1 band
    agrees, so the bucket join on (band_idx, band_val) is a complete
    candidate generator. Bands are 32768-ary (vs the 32-bit version's
    256-ary bytes), so random-collision bucket sizes shrink by 128x
    on top of the fingerprint no longer saturating.
    """
    width = SIMHASH64_BITS // SIMHASH64_BANDS
    fp = simhash64(docs, text_col)
    bands_df = fp.select(
        "doc_id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("simhash"), k * width)
                    % F.lit(1 << width)
                    for k in range(SIMHASH64_BANDS)
                ]
            )
        ).alias("band_idx", "band_val"),
    ).persist()
    a = bands_df.select(
        F.col("doc_id").alias("doc_a"),
        F.col("simhash").alias("sim_a"),
        "band_idx",
        "band_val",
    )
    b = bands_df.select(
        F.col("doc_id").alias("doc_b"),
        F.col("simhash").alias("sim_b"),
        "band_idx",
        "band_val",
    )
    return (
        a.join(b, ["band_idx", "band_val"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sim_a", "sim_b")
        .dropDuplicates(["doc_a", "doc_b"])
        .withColumn(
            "hamming",
            F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b"))),
        )
        .where(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


def span_pairs(
    docs: DataFrame,
    text_col: str = "text",
    k: int = 16,
    base: int = 5,
    mod: int = 1_000_000_007,
    sample_w: int = 8,
    df_max: int = 100,
    min_shared: int = 3,
) -> DataFrame:
    """Exact duplicate-SPAN detection (suffix-sampling substring
    dedup): mod-sampled Rabin-Karp k-char windows joined on literal
    window content, doc-frequency-gated (2..df_max) so singleton
    windows never reach the self-join and boilerplate hot keys are
    dropped before they can skew the shuffle. Returns (doc_lo,
    doc_hi, n_shared, est_span_chars, containment); see
    ``queries_llm3.q_duplicate_span_pairs`` for the full scale
    argument and the closed-form oracle.
    """
    cs = F.transform(
        F.regexp_extract_all(ascii_fold(F.col(text_col)), F.lit("."), 0),
        F.ascii,
    )
    staged = docs.select("doc_id", cs.alias("cs")).where(F.size("cs") >= k)
    weights = [int(base ** (k - 1 - j)) for j in range(k)]
    # flat 16-term polynomial, NOT aggregate(transform(sequence(...)))
    # — the HOF form allocates three arrays per char position
    # (sequence, weight literal, transform output) and interprets the
    # aggregate lambda; the inlined multiply-add chain is pure codegen
    # arithmetic (measured 5.9 -> 3.6 s for the scan at sf0.1, byte-
    # identical sampled windows at sf0.001/sf0.01)
    window_hash = (
        "("
        + " + ".join(f"cs[i + {j} - 1] * {w}L" for j, w in enumerate(weights))
        + f") % {mod}"
    )
    # the total (size-guarded) form matters even though ``staged``
    # filters short docs already: InferFiltersFromGenerate replicates
    # this expression into inferred filter conjuncts, and codegen's
    # common-subexpression hoisting can evaluate it BEFORE the
    # short-circuiting size guard — on a short doc the unguarded
    # sequence(1, size-k+1) turns descending and indexes out of range
    subs = F.expr(
        f"array_distinct(transform("
        f"filter(if(size(cs) >= {k}, sequence(1, size(cs) - {k} + 1), "
        f"cast(array() as array<int>)), "
        f"i -> ({window_hash}) % {sample_w} = 0), "
        f"i -> array_join(slice(cs, i, {k}), '-')))"
    )
    # explode_OUTER, not explode: for an inner explode Catalyst
    # infers `size(subs) > 0 AND isnotnull(subs)` and pushes it below
    # this projection — with `subs` inlined, that filter re-tokenizes
    # the document PER WINDOW POSITION (O(chars^2) per doc; measured
    # 332 s vs ~6 s at sf0.001). Outer generate infers nothing, so
    # the expensive expression is evaluated exactly once per doc on
    # the staged `cs`; the explicit null filter below removes the
    # empty-sample rows the outer explode keeps.
    # persisted: the RK window scan is the dominant per-row compute
    # and EVERY downstream consumer (DF gate, gate join, pair stage)
    # otherwise re-derives it — the un-persisted r7 plan evaluated
    # the Generate subtree FOUR times (both self-join sides x
    # (gate + join)), measured 9.7 s at sf0.1 vs ~3 s persisted
    ex = (
        staged.select("doc_id", subs.alias("subs"))
        .select(
            "doc_id",
            F.size("subs").alias("n_samp"),
            F.explode_outer("subs").alias("sub"),
        )
        .where(F.col("sub").isNotNull())
        .persist()
    )
    # two-phase DF gate: count first (map-side-combinable, no row
    # lists materialized on hot boilerplate keys), THEN collect the
    # 2..df_max survivors — a single-phase collect_list gate would
    # buffer an unbounded member list per boilerplate key at 100 TB
    keep = (
        ex.groupBy("sub")
        .agg(F.count("*").alias("df"))
        .where(F.col("df").between(2, df_max))
        .select("sub")
    )
    # group-then-pair replaces the r7 self-join: after the gate every
    # window key has 2..df_max members, so collect_list is bounded
    # (<= df_max structs per key) and the i<j pair fan-out happens
    # in-array — one pass over the window stream instead of two join
    # sides, and the C(df_max,2) cap per key is unchanged
    members = (
        ex.join(keep, "sub")
        .groupBy("sub")
        .agg(
            F.array_sort(F.collect_list(F.struct("doc_id", "n_samp"))).alias(
                "ms"
            )
        )
    )
    combos = F.flatten(
        F.transform(
            F.col("ms"),
            lambda x, i: F.transform(
                F.slice(F.col("ms"), i + 2, F.size(F.col("ms"))),
                lambda y: F.struct(
                    x["doc_id"].alias("doc_lo"),
                    y["doc_id"].alias("doc_hi"),
                    x["n_samp"].alias("n_lo"),
                    y["n_samp"].alias("n_hi"),
                ),
            ),
        )
    )
    pairs = (
        # _outer + isNotNull: the house rule against InferFilters
        # cloning the combos expression below the projection (the
        # array is provably non-empty after the df >= 2 gate, so the
        # outer rows are never null in practice)
        members.select(F.explode_outer(combos).alias("p"))
        .where(F.col("p").isNotNull())
        .select("p.doc_lo", "p.doc_hi", "p.n_lo", "p.n_hi")
        .groupBy("doc_lo", "doc_hi")
        .agg(
            F.count("*").alias("n_shared"),
            F.min("n_lo").alias("n_lo"),
            F.min("n_hi").alias("n_hi"),
        )
        .where(F.col("n_shared") >= min_shared)
    )
    return pairs.select(
        "doc_lo",
        "doc_hi",
        F.col("n_shared").cast("bigint").alias("n_shared"),
        (F.col("n_shared") * sample_w).cast("bigint").alias("est_span_chars"),
        F.round(F.col("n_shared") / F.least("n_lo", "n_hi"), 9).alias(
            "containment"
        ),
    )
