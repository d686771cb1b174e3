"""Property tests for the large-star/small-star connected-components
operator against a plain union-find model (SURVEY §5: the iterative
operator gets an independent implementation check beyond its recursive-CTE
oracle, which only covers the corpus's own candidate edge set)."""

from __future__ import annotations

import random

import pytest

from changesetmd_spark.operators.corpus import connected_components


def _union_find(edges):
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
    # path-compress everything to the component minimum
    return {n: find(n) for n in parent}


def _spark_labels(spark, edges):
    df = spark.createDataFrame(edges, "a long, b long")
    got = connected_components(df).collect()
    labels = {}
    for r in got:
        # a node must never be assigned twice (the fixpoint is a star)
        assert labels.setdefault(r.node, r.component) == r.component
    return labels


CASES = [
    ("single_edge", [(1, 2)]),
    ("self_loop_only", [(3, 3)]),
    ("chain_high_diameter", [(i, i + 1) for i in range(1, 40)]),
    ("star", [(1, i) for i in range(2, 20)]),
    ("two_components_and_dup_edges", [(1, 2), (2, 3), (2, 1), (10, 11), (11, 10)]),
    ("reversed_orientation", [(5, 1), (9, 5), (2, 9)]),
]


@pytest.mark.parametrize("name,edges", CASES, ids=[c[0] for c in CASES])
def test_cc_structured_cases(spark, name, edges):
    model = _union_find(e for e in edges if e[0] != e[1])
    assert _spark_labels(spark, edges) == model


def test_cc_random_graphs_match_union_find(spark):
    rng = random.Random(0xC0FFEE)
    for _ in range(3):
        n = rng.randint(20, 60)
        m = rng.randint(10, 80)
        edges = [
            (rng.randint(1, n), rng.randint(1, n)) for _ in range(m)
        ]
        model = _union_find(e for e in edges if e[0] != e[1])
        assert _spark_labels(spark, edges) == model
