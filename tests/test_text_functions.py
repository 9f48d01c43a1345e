"""Text-analysis functions: tokenization, quality, language-ID,
fingerprint, shingles."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_pipeline_spark.functions.text import (
    fingerprint,
    lang_guess,
    normalize_text,
    punct_ratio,
    quality_score,
    token_count,
    tokens,
    word_shingles,
)


def _one(spark, text, expr):
    df = spark.createDataFrame([(text,)], "text string")
    return df.select(expr.alias("v")).collect()[0]["v"]


def test_tokens_and_count(spark):
    assert _one(spark, "Hello, world! foo-bar", tokens(F.col("text"))) == [
        "hello",
        "world",
        "foo",
        "bar",
    ]
    assert _one(spark, "", token_count(F.col("text"))) == 0
    assert _one(spark, "one", token_count(F.col("text"))) == 1


def test_normalize_and_fingerprint(spark):
    a = _one(spark, "  Hello   World ", fingerprint(F.col("text")))
    b = _one(spark, "hello world", fingerprint(F.col("text")))
    assert a == b
    assert _one(spark, "  A  b ", normalize_text(F.col("text"))) == "a b"


def test_punct_ratio(spark):
    assert _one(spark, "abcd", punct_ratio(F.col("text"))) == 0.0
    assert _one(spark, "a!b!", punct_ratio(F.col("text"))) == 0.5
    assert _one(spark, "", punct_ratio(F.col("text"))) == 0.0


def test_quality_score_orders_sensibly(spark):
    good = "the quick brown fox is that it jumps with the dog for fun and more " * 4
    bad = "@@ ## !!"
    assert _one(spark, good, quality_score(F.col("text"))) > _one(
        spark, bad, quality_score(F.col("text"))
    )


def test_lang_guess(spark):
    assert _one(spark, "the cat and the dog are in that house", lang_guess(F.col("text"))) == "en"
    assert _one(spark, "der Hund und die Katze ist nicht da", lang_guess(F.col("text"))) == "de"
    assert _one(spark, "le chat et la maison dans les champs", lang_guess(F.col("text"))) == "fr"
    assert _one(spark, "zzz qqq xxx", lang_guess(F.col("text"))) == "und"


def test_word_shingles(spark):
    sh = _one(spark, "a b c d", word_shingles(F.col("text"), 3))
    assert sorted(sh) == ["a b c", "b c d"]
    # shorter than k → single whole-text shingle
    assert _one(spark, "a b", word_shingles(F.col("text"), 3)) == ["a b"]
