"""Property tests: the blocked/banded pair operators are EXACT.

The r01 advisor found a boundary-miss bug in the banded Jaccard join
(pairs split across adjacent size bands dropped when the lower id sat in
the higher band). These properties pin the exactness claims against a
brute-force reference over randomized inputs — every qualifying pair
found, nothing extra, any threshold.
"""

from __future__ import annotations

import itertools
import math

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from etl_pipeline_spark.operators.dedup import blocked_jaccard_pairs
from etl_pipeline_spark.operators.similarity import cosine_pairs_blocked

VOCAB = [f"w{i}" for i in range(12)]

doc_sets = st.lists(
    st.sets(st.sampled_from(VOCAB), min_size=0, max_size=8),
    min_size=2,
    max_size=12,
)


def _jaccard(a: set, b: set) -> float:
    if not a and not b:
        return float("nan")  # 0/0 — excluded by any >= t filter
    return len(a & b) / len(a | b)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(sets=doc_sets, threshold=st.sampled_from([0.34, 0.5, 0.8, 1.0]))
def test_blocked_jaccard_equals_bruteforce(spark, sets, threshold):
    rows = [(i, sorted(s)) for i, s in enumerate(sets)]
    df = spark.createDataFrame(rows, "id long, sh array<string>")
    got = {
        (r["id_a"], r["id_b"])
        for r in blocked_jaccard_pairs(df, threshold).collect()
    }
    want = {
        (i, j)
        for (i, a), (j, b) in itertools.combinations(enumerate(sets), 2)
        if not math.isnan(_jaccard(a, b)) and _jaccard(a, b) >= threshold
    }
    assert got == want


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(sets=doc_sets, threshold=st.sampled_from([0.5, 0.75, 0.9, 1.0]))
def test_containment_equals_bruteforce(spark, sets, threshold):
    """Includes exact-boundary cases (containment == t): the pigeonhole
    post count must survive binary-float (1 - t) truncation."""
    from etl_pipeline_spark.operators.dedup import containment_pairs

    rows = [(i, sorted(s)) for i, s in enumerate(sets)]
    df = spark.createDataFrame(rows, "id long, sh array<string>")
    got = {
        (r["id_a"], r["id_b"])
        for r in containment_pairs(df, threshold).collect()
    }
    want = {
        (i, j)
        for i, a in enumerate(sets)
        for j, b in enumerate(sets)
        if i != j and a and len(a & b) / len(a) >= threshold
    }
    assert got == want


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    lefts=st.lists(st.tuples(st.sampled_from(["u1", "u2"]),
                             st.integers(-50, 50)), min_size=1, max_size=8),
    rights=st.lists(st.tuples(st.sampled_from(["u1", "u2"]),
                              st.integers(-50, 50)), min_size=0, max_size=8),
    lower=st.integers(-20, 0),
    width=st.integers(0, 25),
)
def test_range_join_equals_bruteforce(spark, lefts, rights, lower, width):
    from etl_pipeline_spark.operators.ranges import range_join_bucketed

    upper = lower + width
    ldf = spark.createDataFrame(
        [(i, u, t) for i, (u, t) in enumerate(lefts)],
        "pid long, user string, t long",
    )
    rdf = spark.createDataFrame(rights, "user string, rt long") if rights else (
        spark.createDataFrame([], "user string, rt long")
    )
    got = sorted(
        (r["pid"], r["rt"])
        for r in range_join_bucketed(
            ldf, rdf, on=["user"], left_ts="t", right_ts="rt",
            lower=lower, upper=upper,
        ).collect()
    )
    want = sorted(
        (i, rt)
        for i, (u, t) in enumerate(lefts)
        for (ru, rt) in rights
        if ru == u and t + lower <= rt <= t + upper
    )
    assert got == want


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(seed=st.integers(0, 10_000),
       threshold=st.sampled_from([0.6, 0.8, 0.95]))
def test_cosine_blocked_equals_bruteforce(spark, seed, threshold):
    rng = np.random.default_rng(seed)
    n, dim = 14, 6
    base = rng.standard_normal((n, dim))
    # plant near-dup structure: some rows are noisy copies of others
    for i in range(0, n, 3):
        base[i] = base[(i + 1) % n] + rng.standard_normal(dim) * 0.05
    vecs = [(i, [float(x) for x in v]) for i, v in enumerate(base)]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    got = {
        (r["id_a"], r["id_b"])
        for r in cosine_pairs_blocked(df, threshold).collect()
    }
    norms = np.linalg.norm(base, axis=1)
    want = set()
    for i, j in itertools.combinations(range(n), 2):
        if base[i] @ base[j] / (norms[i] * norms[j]) >= threshold:
            want.add((i, j))
    # recall must be exactly 1.0 (the whole point of guaranteed banding);
    # borderline float disagreement between numpy and Spark on the
    # threshold itself is tolerated in the precision direction only
    assert want <= got or want == got, f"missed pairs: {want - got}"
    for extra in got - want:
        i, j = extra
        sim = base[i] @ base[j] / (norms[i] * norms[j])
        assert sim == pytest.approx(threshold, abs=1e-9)
