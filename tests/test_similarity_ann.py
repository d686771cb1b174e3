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


def test_pq_adc_matches_python_referee(spark, sf_dir):
    """Exact pure-Python PQ reimplementation (encode by squared-L2 argmin
    with (d, k) tie-break, ADC as the subspace-ordered 8-term sum) must
    reproduce q_embedding_pq_adc's full output — codes, distances (to the
    5-decimal round), and top-k ranking."""
    import duckdb

    from changesetmd_spark.operators.similarity import (
        _N_QUERIES,
        _PQ_CODEBOOK_IDS,
        _PQ_DSUB,
        _PQ_K,
        _PQ_M,
        _TOP_K,
    )

    rows = duckdb.sql(
        f"SELECT vec_id, embedding FROM read_parquet('{sf_dir}/embeddings.parquet')"
    ).fetchall()
    vecs = {int(v): [float(x) for x in e] for v, e in rows}
    cb = [vecs[i] for i in sorted(_PQ_CODEBOOK_IDS)]

    def subv(e, m):
        return e[m * _PQ_DSUB : (m + 1) * _PQ_DSUB]

    def l2sq(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + (x - y) * (x - y)
        return acc

    def encode(e):
        return [
            min(
                range(_PQ_K),
                key=lambda k: (l2sq(subv(e, m), subv(cb[k], m)), k),
            )
            for m in range(_PQ_M)
        ]

    codes = {v: encode(e) for v, e in vecs.items()}
    expected = {}
    for q in range(_N_QUERIES):
        lut = [
            [l2sq(subv(vecs[q], m), subv(cb[k], m)) for k in range(_PQ_K)]
            for m in range(_PQ_M)
        ]
        scored = []
        for v, cs in codes.items():
            if v == q:
                continue
            acc = 0.0
            for m in range(_PQ_M):
                acc = acc + lut[m][cs[m]]
            scored.append((round(acc, 5), v))
        scored.sort()
        expected[q] = [(v, d) for d, v in scored[:_TOP_K]]

    got = {}
    for r in (
        registry.queries()["q_embedding_pq_adc"](spark, sf_dir).collect()
    ):
        got.setdefault(r.query_id, []).append((r.neighbor_id, float(r.adc_dist)))
    assert set(got) == set(expected)
    for q in expected:
        assert got[q] == expected[q], (q, got[q], expected[q])


def test_pq_adc_recall_vs_exact_l2(spark, sf_dir):
    """PQ-ADC ranks by approximate squared-L2; against the exact L2 top-k
    it must keep usable recall (loose gate — 16 codewords per subspace is
    a deliberately small pinned codebook, not a trained one)."""
    import duckdb

    rows = duckdb.sql(
        f"SELECT vec_id, embedding FROM read_parquet('{sf_dir}/embeddings.parquet')"
    ).fetchall()
    vecs = {int(v): [float(x) for x in e] for v, e in rows}

    def l2sq(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    exact = {
        q: {
            v
            for _, v in sorted(
                (l2sq(vecs[q], vecs[v]), v) for v in vecs if v != q
            )[:10]
        }
        for q in range(5)
    }
    approx = _topk(registry.queries()["q_embedding_pq_adc"](spark, sf_dir))
    hits = sum(len(exact[q] & approx[q]) for q in exact)
    recall = hits / sum(len(exact[q]) for q in exact)
    # random top-10 over this corpus would land ≈0.02; the pinned 16-word
    # codebook measures 0.18-0.36 across SFs — gate at 5× random so only a
    # genuinely broken encode (constant codes, wrong LUT index) fails
    assert recall >= 0.1, f"pq-adc recall@10 = {recall:.2f}"


def test_semdedup_ivf_finds_planted_twins_and_recall(spark, sf_dir):
    """The IVF-assigned SemDeDup twin must (a) still pair every planted
    twin with its base vector — a 2% perturbation cannot flip the probed
    coarse cells — and (b) recover a high fraction of the exact variant's
    near-dup pairs (the only loss channel is a vector routed to a
    different seed than its true argmin when that seed hides outside the
    probed coarse cells)."""
    qs = registry.queries()
    exact = {
        (r.vec_id_1, r.vec_id_2)
        for r in qs["q_semdedup_clustered"](spark, sf_dir).collect()
    }
    ivf = {
        (r.vec_id_1, r.vec_id_2)
        for r in qs["q_semdedup_ivf"](spark, sf_dir).collect()
    }
    from changesetmd_spark.operators.similarity import (
        _ND_PLANT_MOD,
        _ND_PLANT_OFFSET,
    )

    planted_expected = {
        (a, b) for a, b in exact if b - a == _ND_PLANT_OFFSET and a % _ND_PLANT_MOD == 0
    }
    assert planted_expected, "exact twin must find planted pairs at test SF"
    missed_planted = planted_expected - ivf
    assert not missed_planted, f"IVF path lost planted twins: {missed_planted}"
    recall = len(exact & ivf) / len(exact)
    assert recall >= 0.9, f"pair recall vs exact SemDeDup too low: {recall:.3f}"
