"""Corpus-curation operators: repetition signals, boilerplate detection,
token-distribution entropy.

The Gopher/C4-style quality rules a pre-training pipeline applies after
dedup: drop documents dominated by one token, measure vocabulary
diversity, and strip shingles shared by a large fraction of the corpus
(navigation chrome, license footers).

Physical shapes — all explode → hash-aggregate → (equi-join) pipelines:

- per-doc token stats shuffle O(Σ |doc vocab|) rows (map-side partials
  collapse each partition's repeats), never O(tokens);
- boilerplate shingle frequencies shuffle O(|distinct shingles|); the
  frequency table that flows back is filtered to the boilerplate set
  (tiny by construction) before the join, so AQE broadcasts it;
- no window functions, no cartesian products, no Python in the loop.

Generalizes the reference's per-record validation/drop rules
(/root/reference/utils/transform.py:112-129, 224-231) from exact-match
row filters to corpus-statistical document filters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens, word_shingles


def _doc_token_counts(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, token, n) — one shuffle, map-side combined."""
    return (
        df.select(F.col(id_col).alias("id"), F.explode(tokens(F.col(text_col))).alias("token"))
        .groupBy("id", "token")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def token_repetition_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_top_token_frac: float = 0.25,
) -> DataFrame:
    """Per-doc repetition signals: token count, distinct-token ratio, the
    most-frequent token's share, and the keep/drop verdict
    (``top_token_frac <= max_top_token_frac``). Empty docs yield no row
    (no tokens → nothing to judge)."""
    counts = _doc_token_counts(df, id_col, text_col)
    stats = counts.groupBy("id").agg(
        F.sum("n").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.max("n").alias("_top_n"),
    )
    return stats.select(
        F.col("id").alias(id_col),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
        F.round(F.col("n_distinct") / F.col("n_tokens"), 6).alias("distinct_ratio"),
        F.round(F.col("_top_n") / F.col("n_tokens"), 6).alias("top_token_frac"),
        ((F.col("_top_n") / F.col("n_tokens")) <= max_top_token_frac).alias("keep"),
    )


def unigram_entropy(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-doc Shannon entropy (nats) of the unigram distribution:
    ``H = ln(n) - Σ c·ln(c) / n``. The factored form needs only integer
    counts inside the aggregate — both engines compute identical doubles
    up to summation order (rounded 6 dp)."""
    counts = _doc_token_counts(df, id_col, text_col)
    agg = counts.groupBy("id").agg(
        F.sum("n").alias("n_tokens"),
        F.sum(F.col("n") * F.log(F.col("n").cast("double"))).alias("_clc"),
    )
    return agg.select(
        F.col("id").alias(id_col),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.round(
            F.log(F.col("n_tokens").cast("double")) - F.col("_clc") / F.col("n_tokens"),
            6,
        ).alias("entropy"),
    )


def boilerplate_fraction(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    min_doc_frac: float = 0.05,
) -> DataFrame:
    """Per-doc fraction of k-word shingles that are corpus boilerplate
    (present in ≥ ``min_doc_frac`` of all docs).

    Document frequency is exact: ``word_shingles`` is distinct-per-doc,
    so a plain count per shingle is the doc frequency — no
    count-distinct. The boilerplate set is broadcast back (it is small by
    definition: at 5% min frequency there can be at most 20/min_doc_frac
    distinct members per corpus-size unit)."""
    sh = df.select(
        F.col(id_col).alias("id"),
        F.explode(word_shingles(F.col(text_col), k)).alias("sh"),
    )
    n_docs = df.select(F.count(F.lit(1)).alias("_n_docs"))
    doc_freq = sh.groupBy("sh").agg(F.count(F.lit(1)).alias("df"))
    boiler = (
        doc_freq.join(F.broadcast(n_docs))
        .filter(F.col("df") >= F.col("_n_docs") * min_doc_frac)
        .select("sh", F.lit(True).alias("_boiler"))
    )
    marked = sh.join(F.broadcast(boiler), "sh", "left")
    return (
        marked.groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.when(F.col("_boiler"), 1).otherwise(0)).alias("n_boiler"),
        )
        .select(
            F.col("id").alias(id_col),
            F.col("n_shingles").cast("long").alias("n_shingles"),
            F.col("n_boiler").cast("long").alias("n_boiler"),
            F.round(F.col("n_boiler") / F.col("n_shingles"), 6).alias(
                "boiler_frac"
            ),
        )
    )


def tfidf_top_terms(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_dp: int = 6,
) -> DataFrame:
    """Per-doc top TF-IDF term (keyword extraction / topic signal):
    score(doc, tok) = tf(doc, tok) · ln(n_docs / df(tok)), winner by
    (score desc, token asc) for determinism.

    Physical shape: one explode → (id, token) hash-agg for tf, one
    token-level hash-agg for df (O(|vocab|) rows — AQE broadcasts it back
    to the tf side), per-doc window for the argmax. The corpus-size
    scalar rides a broadcast literal join, never a collect."""
    counts = _doc_token_counts(df, id_col, text_col)
    n_docs = df.select(F.count(F.lit(1)).alias("_n_docs"))
    doc_freq = (
        counts.groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
        .join(F.broadcast(n_docs))
        .select(
            "token",
            F.log(F.col("_n_docs").cast("double") / F.col("df")).alias("idf"),
        )
    )
    scored = counts.join(doc_freq, "token").select(
        "id", "token", (F.col("n") * F.col("idf")).alias("score")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("id").orderBy(F.desc("score"), F.asc("token"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            F.col("id").alias(id_col),
            F.col("token").alias("top_term"),
            F.round("score", round_dp).alias("tfidf"),
        )
    )
