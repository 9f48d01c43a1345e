"""Deduplication operators for training-data pipelines.

Generalizes the reference's whole-row dedup
(/root/reference/utils/transform.py:224-231) to the dedup families a
100 TB corpus needs. All operate on a ``documents``-shaped DataFrame
(``id_col``, ``text_col``).

Scale design notes (per operator):

- **exact**: one hash-agg shuffle on the md5 fingerprint; map-side
  partial aggregation collapses local duplicates before the wire.
- **ngram-Jaccard**: O(n²) cross product is only viable within small
  candidate blocks — here gated by a cheap length-band blocking key so
  Catalyst plans a shuffled equi-join on the block, never a full
  cartesian. For web scale use the MinHash-LSH variant.
- **MinHash-LSH**: shingle → k minhashes → band buckets → equi-join on
  (band, bucket). Candidate pairs are verified with true Jaccard.
  Everything is built-in exprs: xxhash64 with per-permutation seeds
  plays the universal-hash family.
- **SimHash**: 64-bit signature from token-hash sign sums; near-dups =
  equal signature (or banded sub-signatures for Hamming<k).
- **embedding-cosine**: see operators/similarity.py — near-dup = cosine
  above threshold among LSH-bucketed candidates.
"""

from __future__ import annotations

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
        df.select(F.col(id_col), fingerprint(F.col(text_col)).alias("fp"))
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
    fps = df.select(F.col(id_col), fingerprint(F.col(text_col)).alias("fp"))
    keep = fps.groupBy("fp").agg(F.min(id_col).alias("keep_id"))
    return (
        fps.join(keep, "fp")
        .filter(F.col(id_col) != F.col("keep_id"))
        .select(F.col(id_col).alias("dup_id"), "keep_id", "fp")
    )


# --------------------------------------------------------- n-gram Jaccard


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    threshold: float = 0.8,
    length_band: int = 16,
) -> DataFrame:
    """Near-dup pairs by true Jaccard over k-word shingle sets.

    Blocked by token-length band (near-dups have near-equal lengths:
    |A∩B|/|A∪B| ≥ t forces |len_a - len_b| small), so the join is a
    shuffled equi-join per band — never a full cross product. Adjacent
    bands are also compared to avoid boundary misses.
    """
    sh = df.select(
        F.col(id_col).alias("id"),
        word_shingles(F.col(text_col), k).alias("sh"),
    ).withColumn("band", (F.size("sh") / length_band).cast("int"))
    a = sh.alias("a")
    inter = F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh")))
    union = F.size(F.col("a.sh")) + F.size(F.col("b.sh")) - inter
    pairs = None
    for delta in (0, 1):
        b = sh.withColumn("band", F.col("band") - delta).alias("b")
        p = (
            a.join(b, "band")
            .filter(F.col("a.id") < F.col("b.id"))
            .select(
                F.col("a.id").alias("id_a"),
                F.col("b.id").alias("id_b"),
                (inter.cast("double") / union).alias("jaccard"),
            )
        )
        pairs = p if pairs is None else pairs.unionByName(p)
    return pairs.filter(F.col("jaccard") >= threshold).distinct()


# --------------------------------------------------------------- MinHash


def minhash_signature(text_col, n_hashes: int = 32):
    """array<long> of n minhash values over word shingles. Universal
    hash family = xxhash64(shingle, seed_i) via per-i salt concat."""
    sh = word_shingles(text_col)

    def _hasher(i: int):
        # NB: a default-arg lambda (lambda s, _i=i: ...) breaks here —
        # pyspark derives the lambda-variable count from the signature.
        return lambda s: F.xxhash64(F.concat(F.lit(f"mh{i}:"), s))

    sigs = [F.array_min(F.transform(sh, _hasher(i))) for i in range(n_hashes)]
    return F.array(*sigs)


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 32,
    bands: int = 8,
) -> DataFrame:
    """Candidate near-dup pairs via banded MinHash-LSH.

    rows_per_band = n_hashes // bands; docs sharing one full band land
    in the same bucket → equi-join on (band_idx, bucket_hash). Shuffle
    cost is O(n · bands), never O(n²).
    """
    rows = n_hashes // bands
    sig = df.select(
        F.col(id_col).alias("id"),
        minhash_signature(F.col(text_col), n_hashes).alias("sig"),
    )
    banded = sig.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            F.concat_ws(
                                ",",
                                *[
                                    F.element_at("sig", b * rows + r + 1).cast(
                                        "string"
                                    )
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
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
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
    """LSH candidates verified with true shingle Jaccard ≥ threshold."""
    cand = minhash_lsh_candidates(df, id_col, text_col, n_hashes, bands)
    sh = df.select(
        F.col(id_col).alias("id"), word_shingles(F.col(text_col), k).alias("sh")
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


def simhash64(text_col) -> F.Column:
    """64-bit SimHash over tokens: per-bit sign of the sum of token-hash
    bits. Pure built-ins: token → xxhash64 → per-bit ±1 vote via
    bitwise ops inside transform/aggregate."""
    toks = tokens(text_col)
    hashes = F.transform(toks, lambda t: F.xxhash64(t))

    def _voter(i: int):
        return lambda acc, h: acc + F.when(
            F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1
        ).otherwise(-1)

    bit_votes = [
        F.aggregate(hashes, F.lit(0), _voter(i)) for i in range(64)
    ]
    out = F.lit(0).cast("long")
    for i, v in enumerate(bit_votes):
        out = out + F.when(v > 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(
            F.lit(0).cast("long")
        )
    return out


def simhash_dup_groups(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Docs sharing an identical 64-bit simhash (strongest near-dup
    signal without Hamming banding)."""
    return (
        df.select(F.col(id_col), simhash64(F.col(text_col)).alias("simhash"))
        .groupBy("simhash")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") > 1)
    )
