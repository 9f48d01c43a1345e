"""connected_components / dup_clusters unit tests."""

from __future__ import annotations

import pytest

from etl_pipeline_spark.operators.graph import connected_components, dup_clusters


def _cc(spark, edges, **kw):
    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    out = connected_components(df, **kw)
    return {r["id"]: r["component"] for r in out.collect()}


def test_two_components_with_chain(spark):
    # component {1,2,3,4} is a path (diameter 3, needs >1 round);
    # component {10, 11} is a lone edge
    got = _cc(spark, [(1, 2), (2, 3), (3, 4), (10, 11)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_duplicate_and_reversed_edges_are_harmless(spark):
    got = _cc(spark, [(2, 1), (1, 2), (2, 3), (2, 3)])
    assert got == {1: 1, 2: 1, 3: 1}


def test_triangle_plus_bridge(spark):
    # transitivity through a bridge node: {5,6,7} triangle + 7-8 bridge
    got = _cc(spark, [(5, 6), (6, 7), (5, 7), (7, 8)])
    assert set(got.values()) == {5}


def test_non_convergence_raises(spark):
    df = spark.createDataFrame([(1, 2), (2, 3), (3, 4), (4, 5)], ["id_a", "id_b"])
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, max_iter=1)


def test_dup_clusters_keeper_flag(spark):
    pairs = spark.createDataFrame([(3, 9), (9, 27)], ["id_a", "id_b"])
    rows = {r["doc_id"]: r for r in dup_clusters(pairs).collect()}
    assert all(r["cluster_id"] == 3 for r in rows.values())
    assert rows[3]["is_keeper"] and not rows[9]["is_keeper"]
    assert not rows[27]["is_keeper"]


def _union_find_oracle(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def test_random_graphs_match_union_find(spark):
    import random

    rng = random.Random(7)
    for trial in range(3):
        n = 40
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(25)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        got = _cc(spark, edges)
        assert got == _union_find_oracle(edges), f"trial {trial}"
