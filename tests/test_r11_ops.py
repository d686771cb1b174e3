"""Referee tests for the round-11 operators: Matryoshka truncation audit,
dedup-threshold sweep, calibration ECE bins, incremental hash dedup.
Each pins a property the DuckDB hash-check cannot see (cross-engine
agreement proves both engines compute the same thing, not that the thing
is right)."""

from __future__ import annotations

import math

import pytest

from tests.conftest import TEST_SF_DIR as _  # noqa: F401  (fixture reuse)


def test_matryoshka_cosines_bounded_and_self_consistent(spark, sf_dir):
    """Every truncated/full cosine lies in [-1, 1]; half_agree recomputes
    from the rounded columns wherever the rounded values are not boundary-
    ambiguous; a numpy referee reproduces full-dim cosine."""
    import numpy as np

    from changesetmd_spark.operators.quantize import (
        _MRL_THRESH,
        q_matryoshka_truncation_audit,
    )

    rows = q_matryoshka_truncation_audit(spark, sf_dir).collect()
    assert rows
    for r in rows:
        for c in (r.cos_full5, r.cos_half5, r.cos_quarter5):
            assert -1.0 - 1e-9 <= c <= 1.0 + 1e-9, r
        # away from the threshold the rounded columns decide agreement
        if (
            abs(r.cos_half5 - _MRL_THRESH) > 1e-4
            and abs(r.cos_full5 - _MRL_THRESH) > 1e-4
        ):
            assert r.half_agree == (
                (r.cos_half5 >= _MRL_THRESH) == (r.cos_full5 >= _MRL_THRESH)
            ), r

    # numpy referee on a handful of pairs
    emb = {
        x.vec_id: np.array(x.embedding, dtype=np.float64)
        for x in spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    }
    for r in rows[:20]:
        a, b = emb[r.vec_id_1], emb[r.vec_id_2]
        want = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert abs(want - r.cos_full5) < 1e-4, (r, want)


def test_threshold_sweep_monotone_and_total(spark, sf_dir):
    """n_dup is non-increasing in the threshold, n_pairs is constant across
    rows, dup_rate5 == n_dup/n_pairs, and every configured threshold is
    present exactly once."""
    from changesetmd_spark.operators.similarity import (
        _SWEEP_BP,
        q_dedup_threshold_sweep,
    )

    rows = sorted(
        q_dedup_threshold_sweep(spark, sf_dir).collect(), key=lambda r: r.t_bp
    )
    assert [r.t_bp for r in rows] == sorted(_SWEEP_BP)
    totals = {r.n_pairs for r in rows}
    assert len(totals) == 1
    last = None
    for r in rows:
        assert 0 <= r.n_dup <= r.n_pairs, r
        assert abs(r.dup_rate5 - r.n_dup / r.n_pairs) < 1e-5, r
        if last is not None:
            assert r.n_dup <= last, rows
        last = r.n_dup


def test_calibration_bins_total_and_ece(spark, sf_dir):
    """Bin totality (sum n == corpus rows with nonzero norm), bin ids in
    range, gap5 == |conf5 - acc5| up to rounding, and the weighted ECE
    assembled from the bins is finite and in [0, 1]."""
    from changesetmd_spark.operators.calibration import (
        _N_BINS,
        q_calibration_ece_bins,
    )

    rows = q_calibration_ece_bins(spark, sf_dir).collect()
    assert rows
    n_total = sum(r.n for r in rows)
    n_vecs = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    )
    assert n_total == n_vecs  # synthetic vectors are never all-zero
    for r in rows:
        assert 0 <= r.bin < _N_BINS, r
        assert 0 <= r.n_pos <= r.n, r
        assert abs(r.gap5 - abs(r.conf5 - r.acc5)) <= 2e-5, r
    ece = sum(r.n * r.gap5 for r in rows) / n_total
    assert 0.0 <= ece <= 1.0 and math.isfinite(ece)


def test_incremental_hash_dedup_semantics(spark, tmp_path):
    """Constructed-corpus referee: base = {A}, incoming = {A, B, B, C} →
    survivors are B (kept once, n_batch_dups 2, min doc_id wins) and C;
    A is suppressed by the base anti-join.  Normalization (lower+trim)
    must unify case/whitespace variants."""
    from changesetmd_spark.operators.dedup import q_incremental_hash_dedup

    rows_in = [
        (0, "s0", "Alpha text", "en", 10),   # base: A
        (2, "s0", "unrelated base", "en", 14),
        (1, "s1", "  alpha TEXT ", "en", 13),  # incoming: A (normalizes to base)
        (3, "s2", "bravo", "en", 5),           # incoming: B
        (5, "s3", "BRAVO  ", "en", 7),         # incoming: B (trim+lower → "bravo")
        (7, "s4", "charlie", "en", 7),         # incoming: C
    ]
    spark.createDataFrame(
        rows_in, "doc_id long, source string, text string, lang string, n_chars long"
    ).write.parquet(str(tmp_path / "documents.parquet"))
    out = {
        r.keep_doc_id: r
        for r in q_incremental_hash_dedup(spark, str(tmp_path)).collect()
    }
    assert set(out) == {3, 7}, out
    assert out[3].n_batch_dups == 2 and out[3].source == "s2"
    assert out[7].n_batch_dups == 1


@pytest.mark.parametrize(
    "name",
    [
        "q_matryoshka_truncation_audit",
        "q_dedup_threshold_sweep",
        "q_calibration_ece_bins",
        "q_incremental_hash_dedup",
        # q_skew_key_advisor is excluded: its 1-row global-stats broadcast
        # crossJoin legitimately plans as a singleton BroadcastNestedLoopJoin
        # (the repo-wide accepted scalar-join idiom), which this blanket
        # assert would misflag.
        "q_quality_rule_attribution",
    ],
)
def test_r11_plan_shapes(spark, sf_dir, name):
    """None of the round-11 operators may plan a cartesian / nested-loop
    pair enumeration or a SinglePartition funnel."""
    from changesetmd_spark import registry

    plan = (
        registry.queries()[name](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan, name
    assert "BroadcastNestedLoopJoin" not in plan, name
    assert "Exchange SinglePartition" not in plan, name


def test_hybrid_rrf_fusion_math(spark, sf_dir):
    """RRF referee: every returned rrf5 equals 1/(K+lex_rank) +
    1/(K+vec_rank) with 0 contribution for a 0 (absent) rank; ranks stay
    within the pool; a doc nominated by BOTH arms at equal ranks always
    beats a doc nominated by one arm at the same rank."""
    from changesetmd_spark.operators.corpus import (
        _RRF_K,
        _RRF_POOL,
        _RRF_TOP,
        q_hybrid_rrf_search,
    )

    rows = q_hybrid_rrf_search(spark, sf_dir).collect()
    assert 0 < len(rows) <= _RRF_TOP
    for r in rows:
        assert 0 <= r.lex_rank <= _RRF_POOL, r
        assert 0 <= r.vec_rank <= _RRF_POOL, r
        assert r.lex_rank > 0 or r.vec_rank > 0, r
        want = (1.0 / (_RRF_K + r.lex_rank) if r.lex_rank else 0.0) + (
            1.0 / (_RRF_K + r.vec_rank) if r.vec_rank else 0.0
        )
        assert abs(want - r.rrf5) < 1e-5, r
    # descending fusion order
    scores = [r.rrf5 for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_mmr_rerank_python_referee(spark, sf_dir):
    """Pure-Python MMR referee: rebuild the pool (top-POOL by rounded
    cosine to the pinned query), run the textbook greedy selection, and
    demand the identical (sel_rank, doc_id) sequence."""
    import numpy as np

    from changesetmd_spark.operators.calibration import _DIM
    from changesetmd_spark.operators.similarity import (
        _MMR_K,
        _MMR_LAMBDA,
        _MMR_POOL,
        q_mmr_diversified_rerank,
    )
    import hashlib

    got = [
        (r.sel_rank, r.doc_id)
        for r in q_mmr_diversified_rerank(spark, sf_dir)
        .orderBy("sel_rank")
        .collect()
    ]
    assert [r for r, _ in got] == list(range(1, _MMR_K + 1))

    # pinned probe, exactly as probe_vector("hq")
    probe = np.array(
        [
            (
                int(hashlib.md5(f"hq:{j}".encode()).hexdigest()[:15], 16)
                % 2001
                - 1000
            )
            / 1000.0
            for j in range(_DIM)
        ]
    )
    rows = spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    vecs = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in rows}
    rel = {
        i: round(
            float(v @ probe / (np.linalg.norm(v) * np.linalg.norm(probe))), 5
        )
        for i, v in vecs.items()
        if np.linalg.norm(v) > 0
    }
    pool = sorted(rel, key=lambda i: (-rel[i], i))[:_MMR_POOL]
    # round() matches similarity.py:1810 exactly — unrounded 1-lambda is
    # 0.30000000000000004, which can flip exact-tie argmax ordering
    lam, mu = _MMR_LAMBDA, round(1 - _MMR_LAMBDA, 10)
    sel = [min(pool, key=lambda i: (-rel[i], i))]
    while len(sel) < _MMR_K:
        rem = [i for i in pool if i not in sel]

        def mmr(i):
            msim = max(
                round(
                    float(
                        vecs[i]
                        @ vecs[s]
                        / (np.linalg.norm(vecs[i]) * np.linalg.norm(vecs[s]))
                    ),
                    5,
                )
                for s in sel
            )
            return lam * rel[i] - mu * msim

        sel.append(min(rem, key=lambda i: (-mmr(i), i)))
    want = list(enumerate(sel, start=1))
    assert got == want, (got, want)


def test_stream_incremental_dedup_nonvacuous(spark, sf_dir):
    """The stream-static anti-join must actually produce first-touch pairs
    on the driver corpus (an all-pairs-overlap key choice once made this
    query pass vacuously with 0 rows), and totals must match the batch
    recomputation."""
    from changesetmd_spark import registry

    rows = registry.queries()["q_stream_incremental_dedup"](
        spark, sf_dir
    ).collect()
    assert rows, "anti-join produced no first-touch pairs — vacuous"
    assert all(r.n_new_users > 0 for r in rows)


def test_skew_advisor_math(spark, sf_dir):
    """Advisor referee: shares and skew factors recompute from an exact
    pandas count of the key column; suggested salts = ceil(n/target)."""
    import math as _math

    from changesetmd_spark.operators.skew import (
        _SKEW_TARGET_ROWS,
        _SKEW_TOP,
        q_skew_key_advisor,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select("user_id")
    counts = {}
    for r in ev.collect():
        counts[r.user_id] = counts.get(r.user_id, 0) + 1
    total, n_keys = sum(counts.values()), len(counts)
    rows = q_skew_key_advisor(spark, sf_dir).collect()
    assert 0 < len(rows) <= _SKEW_TOP
    want_order = sorted(counts, key=lambda k: (-counts[k], k))[: len(rows)]
    assert [r.user_id for r in rows] == want_order
    for r in rows:
        n = counts[r.user_id]
        assert r.n_rows == n
        assert abs(r.share5 - n / total) < 1e-5
        assert abs(r.skew_factor5 - n * n_keys / total) < 1e-5
        assert r.suggested_salts == _math.ceil(n / _SKEW_TARGET_ROWS)


def test_quality_rule_attribution_consistency(spark, sf_dir):
    """Attribution referee: per source, n_keep <= n_docs, every kill count
    <= n_docs, keep_rate5 == n_keep/n_docs, and n_keep >= n_docs - sum of
    kills (inclusion-exclusion lower bound).  Totals must cover the whole
    corpus."""
    from changesetmd_spark.operators.curation import (
        q_quality_rule_attribution,
    )

    rows = q_quality_rule_attribution(spark, sf_dir).collect()
    assert rows
    n_total = sum(r.n_docs for r in rows)
    n_corpus = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert n_total == n_corpus
    for r in rows:
        kills = (r.kill_len, r.kill_rep, r.kill_wlen, r.kill_stop)
        assert all(0 <= k <= r.n_docs for k in kills), r
        assert 0 <= r.n_keep <= r.n_docs, r
        assert r.n_keep >= r.n_docs - sum(kills), r
        assert abs(r.keep_rate5 - r.n_keep / r.n_docs) < 1e-5, r


def test_jsonl_reader_corrupt_isolation(spark, tmp_path):
    """Constructed-shard referee for the JSONL source: N clean lines + K
    malformed lines → clean frame has exactly the N rows with intact
    values, corrupt frame exactly K, and no line is silently dropped."""
    import gzip

    from changesetmd_spark.sources.jsonl_source import read_jsonl_corpus

    shard = tmp_path / "part-00.jsonl.gz"
    with gzip.open(shard, "wt") as f:
        f.write('{"doc_id": 1, "text": "alpha", "lang": "en", "source": "s", "n_chars": 5}\n')
        f.write('{"doc_id": 2, "text": "beta"\n')  # truncated
        f.write('not json at all\n')
        f.write('{"doc_id": 3, "text": "gamma", "lang": "en", "source": "s", "n_chars": 5}\n')
    clean, corrupt, raw = read_jsonl_corpus(spark, str(tmp_path))
    try:
        crows = sorted(r.doc_id for r in clean.collect())
        assert crows == [1, 3]
        texts = {r.doc_id: r.text for r in clean.collect()}
        assert texts == {1: "alpha", 3: "gamma"}
        assert corrupt.count() == 2
    finally:
        raw.unpersist()
