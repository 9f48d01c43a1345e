"""Curation operators: repetition stats, boilerplate, entropy, PII,
salted aggregation."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from etl_pipeline_spark.functions.text import redact_pii
from etl_pipeline_spark.operators.curation import (
    boilerplate_fraction,
    token_repetition_stats,
    unigram_entropy,
)
from etl_pipeline_spark.operators.skew import salted_agg


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_repetition_stats_flags_degenerate_doc(spark):
    d = _docs(
        spark,
        [
            (1, "spam spam spam spam"),          # top frac 1.0 -> drop
            (2, "alpha beta gamma delta"),        # top frac 0.25 -> keep
            (3, ""),                              # no tokens -> no row
        ],
    )
    got = {r["doc_id"]: r for r in token_repetition_stats(d).collect()}
    assert set(got) == {1, 2}
    assert got[1]["top_token_frac"] == 1.0 and got[1]["keep"] is False
    assert got[1]["n_distinct"] == 1
    assert got[2]["distinct_ratio"] == 1.0 and got[2]["keep"] is True


def test_unigram_entropy_values(spark):
    d = _docs(spark, [(1, "a a b b"), (2, "x x x x")])
    got = {r["doc_id"]: r["entropy"] for r in unigram_entropy(d).collect()}
    assert got[1] == round(math.log(2), 6)  # two equiprobable tokens
    assert got[2] == 0.0                    # degenerate distribution


def test_boilerplate_fraction_detects_shared_shingle(spark):
    footer = "all rights reserved by the example corp"
    rows = [(i, f"unique words number {i} " + footer) for i in range(10)]
    rows.append((99, "completely different text with no shared part here"))
    d = _docs(spark, rows)
    got = {r["doc_id"]: r for r in boilerplate_fraction(d, min_doc_frac=0.5).collect()}
    assert got[99]["n_boiler"] == 0
    assert got[0]["n_boiler"] > 0
    assert 0.0 < got[0]["boiler_frac"] <= 1.0


def test_redact_pii_and_plain_text_unchanged(spark):
    d = _docs(
        spark,
        [
            (1, "mail a.b@x.org or call +62-812-0099 from 10.1.2.3 ok"),
            (2, "no pii here just words"),
        ],
    )
    got = {r["doc_id"]: r["red"] for r in
           d.select("doc_id", redact_pii(F.col("text")).alias("red")).collect()}
    assert got[1] == "mail <EMAIL> or call <PHONE> from <IP> ok"
    assert got[2] == "no pii here just words"


def test_salted_agg_equals_plain_agg(spark):
    df = spark.range(0, 5000).select(
        (F.col("id") % 7).alias("k"),
        F.col("id").alias("uid"),
        (F.col("id") * 0.5).alias("v"),
    )
    got = {
        r["k"]: r
        for r in salted_agg(
            df,
            ["k"],
            {"n": ("count", "v"), "s": ("sum", "v"), "mx": ("max", "v"),
             "mn": ("min", "v")},
            salt_col="uid",
            n_salts=8,
        ).collect()
    }
    exp = {
        r["k"]: r
        for r in df.groupBy("k")
        .agg(F.count("v").alias("n"), F.sum("v").alias("s"),
             F.max("v").alias("mx"), F.min("v").alias("mn"))
        .collect()
    }
    assert set(got) == set(exp)
    for k in exp:
        assert got[k]["n"] == exp[k]["n"]
        assert abs(got[k]["s"] - exp[k]["s"]) < 1e-6
        assert got[k]["mx"] == exp[k]["mx"] and got[k]["mn"] == exp[k]["mn"]


def test_salted_agg_default_salt_is_split_invariant(spark):
    """Without salt_col the salt must be content-derived, so the result
    (including the exact per-salt partials) is identical whatever the
    input partition layout — a retry under a different split aggregates
    the same way (r3 verdict: monotonically_increasing_id was
    partition-dependent)."""
    df = spark.range(0, 3000).select(
        (F.col("id") % 5).alias("k"), (F.col("id") * 1.5).alias("v")
    )
    spec = {"n": ("count", "v"), "s": ("sum", "v"), "mx": ("max", "v")}

    def run(parts):
        return sorted(
            (r["k"], r["n"], round(r["s"], 6), r["mx"])
            for r in salted_agg(
                df.repartition(parts), ["k"], spec, n_salts=8
            ).collect()
        )

    assert run(1) == run(64)
    exp = sorted(
        (r["k"], r["n"], round(r["s"], 6), r["mx"])
        for r in df.groupBy("k")
        .agg(F.count("v").alias("n"), F.sum("v").alias("s"),
             F.max("v").alias("mx"))
        .collect()
    )
    assert run(8) == exp


def test_salted_agg_rejects_non_splittable(spark):
    import pytest

    df = spark.range(3).select(F.col("id").alias("k"), F.col("id").alias("v"))
    with pytest.raises(ValueError):
        salted_agg(df, ["k"], {"a": ("avg", "v")}, salt_col="v")
