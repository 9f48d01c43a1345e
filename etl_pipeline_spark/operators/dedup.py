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
    """
    width = math.log(1.0 / threshold) * (1.0 + 1e-9)
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


# --------------------------------------------------------------- MinHash


def with_minhash_signature(
    df: DataFrame,
    text_col: str = "text",
    n_hashes: int = 32,
    out_col: str = "sig",
) -> DataFrame:
    """Append an ``array<long>`` MinHash signature column.

    Staged on purpose: shingles → base hashes → n permutations. A naive
    single expression embeds the whole shingle tree n times, which blows
    up Catalyst analysis + codegen (measured 30s/query at n=32 — plan
    compilation, not data). Staging keeps the tree linear: shingle+hash
    each token string ONCE, then n cheap long→long re-hashes."""
    staged = df.withColumn("_sh", word_shingles(F.col(text_col))).withColumn(
        "_hs", F.transform("_sh", lambda s: F.xxhash64(s))
    )
    # single aggregate with a running element-wise min — ONE expression
    # instead of n_hashes separate transform trees (equal output,
    # verified; keeps the Catalyst tree small for downstream operators)
    max_long = (1 << 63) - 1
    sig = F.aggregate(
        F.col("_hs"),
        F.array_repeat(F.lit(max_long).cast("long"), n_hashes),
        lambda acc, h: F.zip_with(
            acc,
            F.transform(
                F.sequence(F.lit(0), F.lit(n_hashes - 1)),
                lambda i: F.xxhash64(h, i),
            ),
            lambda a, b: F.least(a, b),
        ),
    )
    return staged.withColumn(out_col, sig).drop("_sh", "_hs")


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
    sig = with_minhash_signature(
        df.select(F.col(id_col).alias("id"), text_col), text_col, n_hashes
    ).select("id", "sig")
    banded = sig.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            *[
                                F.element_at("sig", b * rows + r + 1)
                                for r in range(rows)
                            ]
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


def _simhash_from_hashes(hashes_col) -> F.Column:
    """64-bit SimHash from a pre-staged array<long> of token hashes:
    per-bit sign of the ±1 votes, packed little-endian."""

    def _voter(i: int):
        return lambda acc, h: acc + F.when(
            F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1
        ).otherwise(-1)

    out = F.lit(0).cast("long")
    for i in range(64):
        vote = F.aggregate(hashes_col, F.lit(0), _voter(i))
        out = out + F.when(
            vote > 0, F.shiftleft(F.lit(1).cast("long"), i)
        ).otherwise(F.lit(0).cast("long"))
    return out


def simhash64(text_col) -> F.Column:
    """64-bit SimHash over tokens (single-expression form — prefer
    :func:`with_simhash` on DataFrames: staging the token hashes keeps
    the Catalyst tree from embedding the tokenizer 64 times)."""
    return _simhash_from_hashes(F.transform(tokens(text_col), lambda t: F.xxhash64(t)))


def with_simhash(
    df: DataFrame, text_col: str = "text", out_col: str = "simhash"
) -> DataFrame:
    staged = df.withColumn("_hs", F.transform(tokens(F.col(text_col)), lambda t: F.xxhash64(t)))
    return staged.withColumn(out_col, _simhash_from_hashes(F.col("_hs"))).drop(
        "_hs"
    )


def simhash_dup_groups(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Docs sharing an identical 64-bit simhash (strongest near-dup
    signal without Hamming banding)."""
    sh = with_simhash(df.select(F.col(id_col), text_col), text_col)
    return (
        sh.groupBy("simhash")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") > 1)
    )
