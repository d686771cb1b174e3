"""ANN recall tests (SURVEY.md §2.11 E2): the approximate paths (random-
hyperplane LSH buckets, IVF multi-probe) must recover most of the exact
brute-force top-k.  Thresholds are deliberately loose — ANN trades recall
for sub-linearity — but a broken bucketing (e.g. a constant signature or an
empty probe set) drops recall to ~0 and fails loudly here."""

from __future__ import annotations

import pytest

from changesetmd_spark import registry


def _topk(df):
    out = {}
    for r in df.collect():
        out.setdefault(r.query_id, set()).add(r.neighbor_id)
    return out


@pytest.fixture(scope="module")
def exact(spark, sf_dir):
    return _topk(registry.queries()["q_embedding_topk_cosine"](spark, sf_dir))


@pytest.mark.parametrize("name,min_recall", [
    ("q_embedding_ann_lsh", 0.3),
    ("q_embedding_ann_ivf", 0.3),
])
def test_ann_recall(spark, sf_dir, exact, name, min_recall):
    approx = _topk(registry.queries()[name](spark, sf_dir))
    assert set(exact) == set(approx), "every query must produce neighbors"
    hits = sum(len(exact[q] & approx[q]) for q in exact)
    total = sum(len(exact[q]) for q in exact)
    recall = hits / total
    assert recall >= min_recall, f"{name} recall@10 = {recall:.2f}"
    # every reported neighbor must be a real corpus vector with k results max
    for q, ns in approx.items():
        assert len(ns) <= 10 and q not in ns
