"""Deduplication operators for training-data pipelines.

Generalizes the reference's whole-row dedup
(/root/reference/utils/transform.py:224-231) to the dedup families a
100 TB corpus needs. All operate on a ``documents``-shaped DataFrame
(``id_col``, ``text_col``).

Scale design notes (per operator):

- **exact**: one hash-agg shuffle on the md5 fingerprint; map-side
  partial aggregation collapses local duplicates before the wire.
- **ngram-Jaccard**: exact result via geometric size-band blocking
  (provably covers every qualifying pair), so Catalyst plans a shuffled
  equi-join on the band, never a full cartesian. For web scale combine
  with the MinHash-LSH variant.
- **MinHash-LSH**: shingle → k minhashes → band buckets → equi-join on
  (band, bucket). Candidate pairs are verified with true Jaccard.
  Everything is built-in exprs: the md5-derived 60-bit family
  (:func:`md5long`) plays the universal hashes — chosen so the DuckDB
  oracle reproduces every value bit-for-bit.
- **SimHash**: 64-bit signature from token-hash sign sums; near-dups =
  equal signature (or banded sub-signatures for Hamming<k).
- **embedding-cosine**: see operators/similarity.py — near-dup = cosine
  above threshold among LSH-bucketed candidates.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import fingerprint, tokens, word_shingles


# ------------------------------------------------------------------ exact


def exact_dedup(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Keep one representative (lowest id) per normalized-text group.
    Output: fingerprint, keep_id, n_dups."""
    return (
        _spread(df.select(F.col(id_col), F.col(text_col)))
        .select(F.col(id_col), fingerprint(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_docs"),
        )
    )


def exact_dup_pairs(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(dup_id, keep_id) pairs for exact duplicates beyond the keeper."""
    fps = _spread(df.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col), fingerprint(F.col(text_col)).alias("fp")
    )
    keep = fps.groupBy("fp").agg(F.min(id_col).alias("keep_id"))
    return (
        fps.join(keep, "fp")
        .filter(F.col(id_col) != F.col("keep_id"))
        .select(F.col(id_col).alias("dup_id"), "keep_id", "fp")
    )


# --------------------------------------------------------- n-gram Jaccard


def blocked_jaccard_pairs(
    sets_df: DataFrame,
    threshold: float,
    id_col: str = "id",
    set_col: str = "sh",
) -> DataFrame:
    """All pairs with true Jaccard ≥ ``threshold`` over pre-built element
    sets — EXACT result via guaranteed geometric size-banding, never a
    cartesian product.

    Why it is exact: j(A,B) ≥ t ⇒ |A∩B|/|A∪B| ≥ t ⇒ min(|A|,|B|) ≥
    t·max(|A|,|B|), so log-sizes of a qualifying pair differ by at most
    ln(1/t). Banding on floor(ln(size)/ln(1/t)) therefore puts every
    qualifying pair in the same or adjacent bands; both band directions
    are covered by canonicalizing the pair with least/greatest *after*
    the asymmetric band-shift join (a plain ``a.id < b.id`` filter there
    silently drops pairs whose lower id sits in the higher band). Width
    is widened by 1e-9 relative so float rounding can never split a
    boundary pair two bands apart.

    Empty sets are excluded: they cannot reach a positive threshold
    (j = 0 against non-empty, 0/0 = null against empty — both fail the
    filter in Spark and ANSI SQL alike).

    Scale: one shuffled equi-join on the band key per delta ∈ {0, 1};
    shuffle volume O(n), candidate volume Σ_band |band|·|adjacent| — at
    100 TB combine with MinHash-LSH to pre-shrink candidate blocks.

    Alternative considered and A/B-rejected on the test corpus: the
    AllPairs/PPJoin df-ordered prefix-posting candidate family (Bayardo
    et al., WWW'07). On this corpus the TRUE result is dense (~24% of
    all pairs qualify at unigram t=0.8), so candidates ≥ results for ANY
    exact filter, and banding's cheaper per-candidate path wins 2-5x
    (11-23s vs 56-68s at sf0.1, identical 2.97M output pairs). On sparse
    real-web corpora prefix posting wins instead — worth revisiting if
    the workload changes; the LSH operator remains the scale path either
    way.
    """
    # t = 1.0 → width 0 (only equal sizes can qualify); clamp to a tiny
    # positive width so banding degenerates to exact-size grouping
    width = max(math.log(1.0 / threshold) * (1.0 + 1e-9), 1e-12)
    sh = (
        sets_df.select(F.col(id_col).alias("id"), F.col(set_col).alias("sh"))
        .filter(F.size("sh") > 0)
        .withColumn(
            "band", F.floor(F.log(F.size("sh").cast("double")) / F.lit(width))
        )
    )
    a = sh.alias("a")
    inter = F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh")))
    union = F.size(F.col("a.sh")) + F.size(F.col("b.sh")) - inter
    pairs = None
    for delta in (0, 1):
        b = sh.withColumn("band", F.col("band") - delta).alias("b")
        p = (
            a.join(b, "band")
            .filter(F.col("a.id") != F.col("b.id"))
            .select(
                F.least(F.col("a.id"), F.col("b.id")).alias("id_a"),
                F.greatest(F.col("a.id"), F.col("b.id")).alias("id_b"),
                (inter.cast("double") / union).alias("jaccard"),
            )
        )
        pairs = p if pairs is None else pairs.unionByName(p)
    return pairs.filter(F.col("jaccard") >= threshold).distinct()


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Near-dup pairs by true Jaccard over k-word shingle sets — the
    exact (non-LSH) member of the dedup family, built on
    :func:`blocked_jaccard_pairs`."""
    sh = df.select(
        F.col(id_col).alias("id"),
        word_shingles(F.col(text_col), k).alias("sh"),
    )
    return blocked_jaccard_pairs(sh, threshold)


# ------------------------------------------------------------ hash family


def md5long(c: F.Column) -> F.Column:
    """60-bit non-negative hash, md5-derived — chosen over xxhash64 so the
    independent DuckDB oracle computes the IDENTICAL value:
    ``CAST(('0x' || substr(md5(x), 1, 15)) AS BIGINT)``. 15 hex chars =
    60 bits: always positive, no signed-overflow divergence in either
    engine. The permutation family is ``md5long(h || ':' || i)``."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


# Universal-hash permutation family over a prime field: perm_i(h) =
# (a_i·(h mod p) + b_i) mod p with seeded constants. One md5 per shingle
# feeds ALL n permutations as multiply-adds — vs the previous
# md5-per-permutation family this removes 31 of 32 md5 evaluations per
# shingle row AND shrinks the Catalyst expression tree (the minhash
# query's cost was plan-compile + hash CPU, not data). (h mod p) < 2^31
# and a_i < 2^31 keep every product inside int64 in both engines.
MINHASH_P = 2_147_483_647  # 2^31 − 1 (Mersenne prime)


def minhash_ab(n: int, seed: int = 40) -> list[tuple[int, int]]:
    """Deterministic (a_i, b_i) constants shared with the SQL oracle."""
    import random

    rng = random.Random(seed)
    return [
        (rng.randrange(1, MINHASH_P), rng.randrange(0, MINHASH_P))
        for _ in range(n)
    ]


def _perm_hash(h: F.Column, a: int, b: int) -> F.Column:
    return (F.lit(a) * (h % MINHASH_P) + F.lit(b)) % MINHASH_P


# verify-stage candidate pruning pays off once the corpus outweighs the
# checkpoint's fixed cost (one eager job + block materialization);
# below it, two cheap full-corpus shingle passes win. See
# minhash_dedup_pairs.
VERIFY_PRUNE_MIN_BYTES = 256 * 1024 * 1024


def _estimate_bytes(df: DataFrame) -> int:
    """Input bytes from the file index (driver-side listing, no job);
    0 for non-file-backed frames — those skip the size-gated paths."""
    import os

    try:
        return sum(
            os.path.getsize(f.removeprefix("file:").removeprefix("//"))
            for f in df.inputFiles()
        )
    except Exception:
        return 0


def _spread(df: DataFrame) -> DataFrame:
    """Give CPU-heavy per-doc expression work (tokenize → shingle → hash)
    enough input splits. A small file scans as ONE task, serializing the
    whole stage on one core (measured 4x on the minhash bench query); at
    real scale inputs arrive with >= defaultParallelism splits and this
    is a no-op — the shuffle is only inserted when the scan is starved.

    Starvation is estimated from ``inputFiles()`` — a driver-side
    catalog/file-index listing, NOT a plan-to-RDD conversion (the
    previous ``df.rdd.getNumPartitions()`` materialized the RDD lineage
    on every query construction). File count lower-bounds split count
    (maxPartitionBytes only splits files further), so a many-file input
    is never reshuffled; the one over-eager case — few huge files — adds
    a round-robin shuffle exactly where the doc corpus is small enough
    for it to be cheap.

    Non-file-backed inputs (in-memory frames, post-shuffle/join plans)
    report no inputFiles; for those the RDD partition count is checked
    instead — that conversion cost is confined to the non-file case, so
    the hot file-scan path never pays it."""
    target = df.sparkSession.sparkContext.defaultParallelism
    try:
        n_files = len(df.inputFiles())
    except Exception:
        n_files = 0
    if n_files == 0:
        try:
            n_parts = df.rdd.getNumPartitions()
        except Exception:
            return df
        if n_parts < target:
            return df.repartition(target)
        return df
    if n_files < target:
        return df.repartition(target)
    return df


# ----------------------------------------------------------- containment


def containment_pairs(
    sets_df: DataFrame,
    threshold: float,
    id_col: str = "id",
    set_col: str = "sh",
) -> DataFrame:
    """Directed near-containment pairs: (a, b) with
    |A ∩ B| / |A| ≥ ``threshold`` — the quote/subset dedup case, where
    size-banding is useless (a tiny doc can live inside a huge one).

    EXACT by pigeonhole posting: if B contains ≥ t·|A| of A's shingles,
    B misses < (1−t)·|A| + 1 of them — so posting ANY
    ``floor((1−t)·|A|) + 1`` shingles of A guarantees B holds at least
    one posted shingle. Posts are chosen as the smallest-md5long
    shingles (deterministic, biased toward globally rare values exactly
    like prefix filtering); candidates come from an equi-join of A's
    posts against B's exploded shingles, then the true containment is
    verified. Shuffle is O(total shingles), never all-pairs.
    """
    if not 0.0 < threshold <= 1.0:
        raise ValueError("threshold must be in (0, 1]")
    sh = sets_df.select(
        F.col(id_col).alias("id"), F.col(set_col).alias("sh")
    ).filter(F.size("sh") > 0)

    by_hash = F.array_sort(
        F.col("sh"),
        lambda l, r: F.when(md5long(l) < md5long(r), -1)
        .when(md5long(l) > md5long(r), 1)
        .otherwise(0),
    )
    # +1e-9 before the floor: (1 - 0.9) is 0.0999… in binary, so
    # 20·(1−t) floors to 1 instead of 2 and the boundary pair
    # (containment exactly t) loses its guarantee. Nudging up can only
    # over-post (more candidates), never under-post — exactness holds.
    n_posts = (
        F.floor(F.size("sh") * (1.0 - threshold) + 1e-9).cast("int") + 1
    )
    posts = sh.select(
        F.col("id").alias("id_a"),
        F.explode(F.slice(by_hash, 1, n_posts)).alias("s"),
    )
    exploded = sh.select(F.col("id").alias("id_b"), F.explode("sh").alias("s"))
    cand = (
        posts.join(exploded, "s")
        .filter(F.col("id_a") != F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    verify = (
        cand.join(
            sh.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sh_a"),
            "id_a",
        ).join(
            sh.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sh_b"),
            "id_b",
        )
    )
    cont = F.size(F.array_intersect("sh_a", "sh_b")).cast("double") / F.size(
        "sh_a"
    )
    return verify.select(
        "id_a", "id_b", cont.alias("containment")
    ).filter(F.col("containment") >= threshold)


# --------------------------------------------------------------- MinHash


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 32,
    k: int = 3,
) -> DataFrame:
    """Per-doc MinHash signature as ``n_hashes`` columns ``m0..m{n-1}``.

    Physical shape: explode shingles → one md5long base hash per shingle
    row → n cheap permutation hashes → ONE hash aggregation of per-doc
    MINs. Map-side partial aggregation collapses each partition's
    shingles before the shuffle, so the wire carries O(docs · n_hashes),
    never O(shingles). This replaced a nested higher-order-function
    expression whose Catalyst analysis alone cost seconds per query
    (r01 bench: 11s at sf0.1, all plan-compile, no data volume)."""
    ex = _spread(df.select(F.col(id_col).alias("id"), F.col(text_col))).select(
        "id",
        F.explode(word_shingles(F.col(text_col), k)).alias("s"),
    ).withColumn("h", md5long(F.col("s")))
    ab = minhash_ab(n_hashes)
    return ex.groupBy("id").agg(
        *[
            F.min(_perm_hash(F.col("h"), a, b)).alias(f"m{i}")
            for i, (a, b) in enumerate(ab)
        ]
    )


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 32,
    bands: int = 8,
    k: int = 3,
) -> DataFrame:
    """Candidate near-dup pairs via banded MinHash-LSH.

    rows_per_band = n_hashes // bands; docs sharing one full band land
    in the same bucket → equi-join on (band_idx, bucket_hash). Shuffle
    cost is O(n · bands), never O(n²).
    """
    rows = n_hashes // bands
    sig = minhash_signatures(df, id_col, text_col, n_hashes, k)
    banded = sig.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        md5long(
                            F.concat_ws(
                                ",",
                                *[
                                    F.col(f"m{b * rows + r}").cast("string")
                                    for r in range(rows)
                                ],
                            )
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "bb.band", "bb.bucket")
    # Pairs via groupBy(bucket) + intra-bucket combination explode, NOT a
    # self-join: Catalyst cannot share the two identical signature
    # subtrees a self-join needs, so the whole shingle → md5 → n-minhash
    # pipeline (the query's dominant cost) ran TWICE and the corpus was
    # scanned twice (measured ~35% of query wall at sf0.1). One grouped
    # collect per (band, bucket) computes it once; the quadratic pair
    # blowup within a bucket is the same one the join had (both resolve
    # a bucket in one partition). Sorted ids keep id_a < id_b exactly as
    # the join's a.id < b.id filter did.
    grouped = (
        banded.groupBy("band", "bucket")
        .agg(F.sort_array(F.collect_list("id")).alias("ids"))
        .filter(F.size("ids") > 1)
    )
    pair_arr = F.flatten(
        F.transform(
            "ids",
            lambda x, i: F.transform(
                F.slice(
                    F.col("ids"), i + F.lit(2), F.size("ids")
                ),
                lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
            ),
        )
    )
    return (
        grouped.select(F.explode(pair_arr).alias("p"))
        .select("p.id_a", "p.id_b")
        .distinct()
    )


def minhash_dedup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    n_hashes: int = 32,
    bands: int = 8,
    k: int = 3,
) -> DataFrame:
    """LSH candidates verified with true shingle Jaccard ≥ threshold.
    The shingle order ``k`` is shared between the LSH signature and the
    verify step so the candidate filter and the verdict see one universe."""
    cand = minhash_lsh_candidates(df, id_col, text_col, n_hashes, bands, k)
    if _estimate_bytes(df) >= VERIFY_PRUNE_MIN_BYTES:
        # Large corpus: materialize the candidate pairs (O(near-dup
        # pairs) — tiny next to the corpus) so the verify stage prunes
        # BOTH shingle branches to candidate docs only. Without this the
        # full-corpus shingle set is computed twice more here (the joins
        # cannot share subtrees), and a semi-join on candidate ids would
        # re-run the whole LSH pipeline a second time. localCheckpoint
        # truncates the lineage instead: computed once per invocation,
        # never reused across calls. Size-gated (same pattern as the
        # skew probe's byte gate): at toy scale the checkpoint's eager
        # job costs more than two cheap re-shinglings (measured +1.3 s
        # at 600 KB), at corpus scale the two saved full-corpus shingle
        # passes dominate.
        cand = cand.localCheckpoint()
        ids = cand.select(
            F.explode(F.array("id_a", "id_b")).alias("id")
        ).distinct()
        # no _spread: after pruning the shingle work is O(candidates)
        sh_src = df.select(F.col(id_col).alias("id"), F.col(text_col)).join(
            F.broadcast(ids), "id"
        )
    else:
        sh_src = _spread(df.select(F.col(id_col).alias("id"), F.col(text_col)))
    sh = sh_src.select(
        "id", word_shingles(F.col(text_col), k).alias("sh")
    )
    joined = (
        cand.join(sh.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
        .join(sh.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return joined.select(
        "id_a", "id_b", (inter.cast("double") / union).alias("jaccard")
    ).filter(F.col("jaccard") >= threshold)


# --------------------------------------------------------------- SimHash

# md5long is 60-bit, so bits 60..63 of a 64-bit simhash would vote
# uniformly negative and carry zero signal — the signature uses 60 bits.
SIMHASH_BITS = 60


def simhash_signatures(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, simhash) per doc: explode tokens → md5long per token →
    ``SIMHASH_BITS`` per-bit ±1 vote sums in ONE hash aggregation →
    bit-pack the vote signs. Duplicate tokens vote multiply (simhash is
    a multiset sketch). Docs with zero tokens drop out (no votes) — the
    oracle's ``unnest`` mirrors this exactly."""
    ex = _spread(df.select(F.col(id_col).alias("id"), F.col(text_col))).select(
        "id", F.explode(tokens(F.col(text_col))).alias("t")
    ).withColumn("h", md5long(F.col("t")))
    votes = ex.groupBy("id").agg(
        *[
            F.sum(
                F.when(
                    F.shiftright("h", i).bitwiseAND(F.lit(1)) == 1, 1
                ).otherwise(-1)
            ).alias(f"v{i}")
            for i in range(SIMHASH_BITS)
        ]
    )
    sig = F.lit(0).cast("long")
    for i in range(SIMHASH_BITS):
        sig = sig + F.when(
            F.col(f"v{i}") > 0, F.lit(1 << i).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return votes.select("id", sig.alias("simhash"))


def simhash_dup_groups(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Docs sharing an identical simhash (strongest near-dup signal
    without Hamming banding)."""
    sig = simhash_signatures(df, id_col, text_col)
    return (
        sig.groupBy("simhash")
        .agg(F.min("id").alias("keep_id"), F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") > 1)
    )


def simhash_near_dups(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 4,
    bands: int = 5,
) -> DataFrame:
    """Near-dup pairs with SimHash Hamming distance ≤ ``max_hamming`` —
    EXACT by pigeonhole banding: the 60-bit signature splits into
    ``bands`` disjoint sub-signatures; ≤ max_hamming bit flips can dirty
    at most max_hamming bands, so any qualifying pair agrees exactly on
    ≥ 1 band whenever ``bands > max_hamming`` (enforced). Candidates =
    equi-join on (band_idx, band_value); verify = ``bit_count(xor)``.
    Never a cartesian; shuffle O(n · bands)."""
    if bands <= max_hamming:
        raise ValueError("bands must exceed max_hamming (pigeonhole bound)")
    band_bits = SIMHASH_BITS // bands
    mask = (1 << band_bits) - 1
    sig = simhash_signatures(df, id_col, text_col)
    banded = sig.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright("simhash", b * band_bits)
                        .bitwiseAND(F.lit(mask))
                        .alias("val"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "simhash", "bb.band", "bb.val")
    a, b = banded.alias("a"), banded.alias("b")
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(b, ["band", "val"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


# ------------------------------------------------------------- winnowing


def winnowing_fp_rows(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    window: int = 4,
) -> DataFrame:
    """(id, fp) rows of the winnowing selection — the raw fingerprint
    sets; join two docs' rows on fp to detect shared substrings of
    length ≥ k + window − 1. See :func:`winnowing_fingerprints`."""
    from pyspark.sql import Window as W

    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    base = _spread(df.select(F.col(id_col).alias("id"), norm.alias("t"))).filter(
        F.length("t") >= k + window - 1
    )
    grams = base.select(
        "id",
        F.explode(F.sequence(F.lit(1), F.length("t") - (k - 1))).alias("pos"),
        F.col("t"),
    ).select("id", "pos", md5long(F.expr(f"substr(t, pos, {k})")).alias("h"))
    w_frame = W.partitionBy("id").orderBy("pos").rowsBetween(0, window - 1)
    n_grams = W.partitionBy("id")
    return (
        grams.withColumn("win_min", F.min("h").over(w_frame))
        .withColumn("n_pos", F.count(F.lit(1)).over(n_grams))
        .filter(F.col("pos") <= F.col("n_pos") - (window - 1))
        .select("id", F.col("win_min").alias("fp"))
        .distinct()
    )


def winnowing_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    window: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD'03 — the MOSS algorithm): hash every character k-gram of the
    normalized text, then keep the MINIMUM hash of every window of
    ``window`` consecutive k-grams. Guarantees: any shared substring of
    length ≥ k + window − 1 between two documents yields at least one
    shared fingerprint, while only ~2/(window+1) of all k-gram hashes
    are kept — the local-sampling property that makes plagiarism /
    quote detection work at corpus scale.

    The classic presentation uses a polynomial *rolling* hash for O(1)
    per-position updates on a sequential machine; in a vectorized
    engine every k-gram is hashed independently (md5long — shared with
    the DuckDB oracle), which preserves the selection semantics
    exactly. Ties keep the plain minimum VALUE (deterministic in both
    engines), a standard winnowing variant.

    Output: one row per doc — ``n_fps`` distinct fingerprints kept,
    ``fp_min``/``fp_max`` extremes (compact, hash-comparable summary).
    Physical shape: positions exploded via ``sequence`` (no Python),
    window-min over a per-doc ordered frame, distinct + hash-agg. All
    shuffles O(total k-grams).
    """
    selected = winnowing_fp_rows(df, id_col, text_col, k, window)
    return selected.groupBy(F.col("id").alias(id_col)).agg(
        F.count(F.lit(1)).cast("long").alias("n_fps"),
        F.min("fp").alias("fp_min"),
        F.max("fp").alias("fp_max"),
    )
