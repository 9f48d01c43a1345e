"""Dedup + similarity operators: semantic unit tests on crafted inputs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_pipeline_spark.operators.dedup import (
    exact_dedup,
    exact_dup_pairs,
    minhash_dedup_pairs,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    simhash_dup_groups,
)
from etl_pipeline_spark.operators.multimodal import attach_binary, extract_features
from etl_pipeline_spark.operators.similarity import (
    cosine_topk_bruteforce,
    lsh_topk,
    make_planes,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "  The QUICK  brown fox jumps over the lazy dog  "),  # exact dup (normalized)
        (3, "the quick brown fox jumps over the lazy cat"),  # near dup
        (4, "completely different content about spark engines"),
        (5, "spark engines about content different completely"),  # same word set
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(spark, docs):
    groups = {r["keep_id"]: r["n_docs"] for r in exact_dedup(docs).collect()}
    assert groups[1] == 2  # docs 1+2 collapse
    pairs = exact_dup_pairs(docs).collect()
    assert [(r["dup_id"], r["keep_id"]) for r in pairs] == [(2, 1)]


def test_ngram_jaccard(spark, docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, k=1, threshold=0.5).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] == 1.0
    assert (1, 3) in pairs  # 7/9 overlap on word sets
    assert (4, 5) in pairs and pairs[(4, 5)] == 1.0  # same word set
    assert (1, 4) not in pairs


def test_minhash_lsh_finds_near_dups(spark, docs):
    cand = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_candidates(docs, n_hashes=32, bands=16).collect()
    }
    assert (1, 2) in cand  # identical shingle sets always collide
    verified = {
        (r["id_a"], r["id_b"])
        for r in minhash_dedup_pairs(
            docs, threshold=0.5, n_hashes=32, bands=16, k=1
        ).collect()
    }
    assert (1, 2) in verified
    assert all(a < b for a, b in verified)


def test_simhash_groups(spark, docs):
    groups = simhash_dup_groups(docs).collect()
    # identical token multisets (1,2) share a simhash
    assert any(r["n_docs"] >= 2 for r in groups)


def test_cosine_topk_bruteforce(spark):
    vecs = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0]),
            (1, [0.9, 0.1, 0.0]),  # closest to 0
            (2, [0.0, 1.0, 0.0]),
            (3, [-1.0, 0.0, 0.0]),  # farthest from 0
        ],
        "vec_id long, embedding array<double>",
    )
    out = cosine_topk_bruteforce(
        vecs, vecs.filter(F.col("vec_id") == 0), k=3
    ).collect()
    order = [r["neighbor_id"] for r in sorted(out, key=lambda r: r["rank"])]
    assert order == [1, 2, 3]
    assert all(r["query_id"] == 0 for r in out)


def test_lsh_topk_recall_on_exact_dup(spark):
    import numpy as np

    rng = np.random.default_rng(0)
    base = rng.standard_normal((50, 16)).tolist()
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(base)]
    rows.append((99, rows[7][1]))  # exact duplicate of vec 7
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    planes = make_planes(16, n_planes=8, seed=1)
    out = lsh_topk(vecs, vecs.filter(F.col("vec_id") == 99), planes, k=3).collect()
    assert out, "exact duplicate must share every LSH bucket"
    best = min(out, key=lambda r: r["rank"])
    assert best["neighbor_id"] == 7 and best["cosine_sim"] == 1.0


def test_multimodal_plumbing(spark, docs):
    feats = extract_features(attach_binary(docs, "doc_id", "text", "image"))
    rows = {r["id"]: r for r in feats.collect()}
    assert len(rows) == 5
    r1 = rows[1]
    assert r1["modality"] == "image"
    assert r1["byte_len"] == len("the quick brown fox jumps over the lazy dog")
    assert len(r1["feat"]) == 8
    assert all(0 <= x < 1 for x in r1["feat"])
    # deterministic: same content → same hash+features
    import hashlib

    assert r1["content_hash"] == hashlib.md5(
        b"the quick brown fox jumps over the lazy dog"
    ).hexdigest()


def test_winnowing_shared_substring_guarantee(spark):
    """Winnowing guarantee: two docs sharing a substring of length
    >= k + window - 1 share at least one fingerprint; unrelated docs
    (disjoint alphabets) share none."""
    from etl_pipeline_spark.operators.dedup import winnowing_fp_rows

    shared = "the quick brown fox jumps over the lazy dog"
    docs = [
        (1, "AAAA xxxx " + shared + " yyyy BBBB"),
        (2, "qqqq " + shared + " zzzz"),
        (3, "0123 4567 89.. ,,,, ;;;; !!!!"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    rows = winnowing_fp_rows(df, k=5, window=4).collect()
    fps = {i: set() for i in (1, 2, 3)}
    for r in rows:
        fps[r["id"]].add(r["fp"])
    assert fps[1] & fps[2], "shared substring must yield a shared fingerprint"
    assert not (fps[1] & fps[3])
    assert not (fps[2] & fps[3])


def test_winnowing_density(spark):
    """Selection keeps roughly 2/(w+1) of k-gram positions (distinct
    fps can only be fewer), never all of them."""
    from etl_pipeline_spark.operators.dedup import winnowing_fingerprints

    text = "abcdefghij" * 30  # 300 chars, highly repetitive
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    row = winnowing_fingerprints(df, k=5, window=4).collect()[0]
    n_kgrams = 300 - 4
    assert 0 < row["n_fps"] < n_kgrams * 0.5


def test_resize_stub_contract(spark):
    """resize_stub keeps the multimodal contract and truncates payloads
    columnar-side."""
    from etl_pipeline_spark.operators.multimodal import attach_binary, resize_stub

    df = spark.createDataFrame(
        [(1, "x" * 500), (2, "short")], ["doc_id", "text"]
    )
    out = resize_stub(
        attach_binary(df, "doc_id", "text", "image"), target_bytes=100
    ).collect()
    by_id = {r["id"]: r for r in out}
    assert by_id[1]["byte_len"] == 100 and len(by_id[1]["content"]) == 100
    assert by_id[2]["byte_len"] == 5
    assert by_id[1]["modality"] == "image"
