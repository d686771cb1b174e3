"""Round-17 operators: the advisor-switched sessionization and friends."""

from __future__ import annotations

import datetime
import os
import shutil

import pytest
from pyspark.sql import functions as F

from changesetmd_spark.operators import windows_batch
from changesetmd_spark.operators.windows_batch import (
    q_session_advised,
    q_session_two_phase_scalable,
    q_window_session_per_user,
)


@pytest.fixture(scope="module")
def hot_events_dir(spark, tmp_path_factory):
    """A tiny events corpus with one celebrity user: user 7 owns 300 of
    360 rows spread over several days; nine cold users own the rest."""
    root = str(tmp_path_factory.mktemp("hot_events"))
    base = datetime.datetime(2024, 3, 1, 20, 0, 0)
    rows = []
    # hot user: six 50-event blocks at 20-minute spacing (one session
    # each: gaps < 30 min), blocks 48h apart (new session each), every
    # block starting 20:00 so the session crosses midnight — the chunk
    # boundary the two-phase plan must reassemble
    for i in range(300):
        ts = base + datetime.timedelta(
            hours=48 * (i // 50), minutes=20 * (i % 50)
        )
        etype = "purchase" if i % 5 == 4 else "view"
        rows.append((i, ts, 7, etype, float(i), None))
    for u in range(9):
        for j in range(1, 8):
            ts = base + datetime.timedelta(days=u, hours=j * 2)
            rows.append((1000 + u * 10 + j, ts, 100 + u, "view", 1.0, None))
    # as-of cross-chunk case: a purchase whose only prior view sits on an
    # earlier calendar day (exercises the two-phase plan's phase-2 fallback)
    rows.append(
        (2000, datetime.datetime(2024, 3, 10, 10, 0), 150, "view", 1.0, None)
    )
    rows.append(
        (2001, datetime.datetime(2024, 3, 11, 9, 0), 150, "purchase", 1.0, None)
    )
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    )
    df.write.mode("overwrite").parquet(os.path.join(root, "events.parquet"))
    yield root
    shutil.rmtree(root, ignore_errors=True)


def test_session_advised_cold_path_matches_native(spark, sf_dir):
    """On the driver's uniform corpus no key is near the crossover: the
    advisor must pick the native plan and the output must equal it
    row-for-row (plus the decision column)."""
    adv = q_session_advised(spark, sf_dir)
    nat = q_window_session_per_user(spark, sf_dir)
    assert adv.select(F.max("used_two_phase")).first()[0] == 0
    assert adv.drop("used_two_phase").exceptAll(nat).count() == 0
    assert nat.exceptAll(adv.drop("used_two_phase")).count() == 0


def test_session_advised_hot_path_switches_and_matches(
    spark, hot_events_dir, monkeypatch
):
    """With the crossover lowered under the celebrity fixture's hot-key
    volume, the advisor must pick the two-phase plan — and the result must
    stay row-identical to BOTH physical strategies (the switch may only
    change the shuffle shape, never the sessions)."""
    monkeypatch.setattr(windows_batch, "_SESSION_HOT_KEY_ROWS", 100)
    adv = q_session_advised(spark, hot_events_dir)
    assert adv.select(F.max("used_two_phase")).first()[0] == 1
    two = q_session_two_phase_scalable(spark, hot_events_dir)
    nat = q_window_session_per_user(spark, hot_events_dir)
    core = adv.drop("used_two_phase")
    assert core.exceptAll(two).count() == 0
    assert two.exceptAll(core).count() == 0
    assert core.exceptAll(nat).count() == 0
    assert nat.exceptAll(core).count() == 0
    # the fixture really exercises the merge: six midnight-spanning
    # sessions — phase 2 reassembled every one across its chunk boundary
    hot = core.filter(F.col("user_id") == 7)
    assert hot.count() == 6
    assert (
        hot.filter(
            F.to_date("session_start") != F.to_date("session_end")
        ).count()
        == 6
    )


def test_session_advised_threshold_is_call_time(spark, hot_events_dir):
    """Same fixture, real 100k threshold: 300 rows on the hot key is far
    below the crossover, so the advisor stays on the native plan."""
    adv = q_session_advised(spark, hot_events_dir)
    assert adv.select(F.max("used_two_phase")).first()[0] == 0


def test_quality_classifier_train_step_python_referee(spark, sf_dir):
    """Independent pure-Python recomputation of the whole Newton step —
    tokenization, md5 bucketing, capped counts, exact-integer Gram and
    gradient, Fraction-free Cramer solve, and both loss passes — compared
    against the distributed query's output value-for-value."""
    import hashlib
    import math
    import re

    import duckdb

    from changesetmd_spark.operators.mlstep import (
        _D,
        _RIDGE4,
        _X_CAP,
        q_quality_classifier_train_step,
    )

    docs = duckdb.sql(
        f"SELECT doc_id, source, text FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    ).fetchall()
    X, Y = [], []
    for _doc_id, source, text in docs:
        y = 1 if len(source or "") % 2 == 0 else 0
        toks = re.findall(r"\S+", (text or "").lower())
        cnt = [0] * _D
        for t in toks:
            h = int(hashlib.md5(t.encode()).hexdigest()[:15], 16)
            cnt[h % _D] += 1
        X.append([min(c, _X_CAP) for c in cnt])
        Y.append(y)
    n = len(X)
    M = [
        [
            sum(x[i] * x[j] for x in X) + (_RIDGE4 if i == j else 0)
            for j in range(_D)
        ]
        for i in range(_D)
    ]
    g = [sum(x[j] * (2 * y - 1) for x, y in zip(X, Y)) for j in range(_D)]

    def minor(mat, j, k):
        rows = [r for r in range(_D) if r != j]
        cols = [c for c in range(_D) if c != k]
        a = [[mat[r][c] for c in cols] for r in rows]
        return (
            a[0][0] * (a[1][1] * a[2][2] - a[1][2] * a[2][1])
            - a[0][1] * (a[1][0] * a[2][2] - a[1][2] * a[2][0])
            + a[0][2] * (a[1][0] * a[2][1] - a[1][1] * a[2][0])
        )

    det = sum((-1) ** k * M[0][k] * minor(M, 0, k) for k in range(_D))
    ws = [
        round(
            float(
                2
                * sum(
                    (-1) ** (j + k) * minor(M, j, k) * g[k]
                    for k in range(_D)
                )
            )
            / float(det),
            6,
        )
        for j in range(_D)
    ]
    loss_before = round(n * math.log(2.0), 6)
    la = sum(
        round(
            math.log(
                1.0
                + math.exp(
                    -(2 * y - 1) * sum(ws[j] * x[j] for j in range(_D))
                )
            ),
            8,
        )
        for x, y in zip(X, Y)
    )
    loss_after = round(la, 6)

    out = {
        r["feature_idx"]: r.asDict()
        for r in q_quality_classifier_train_step(spark, sf_dir).collect()
    }
    assert len(out) == _D
    for j in range(_D):
        assert out[j]["grad2"] == g[j]
        assert out[j]["w_new"] == ws[j]
        assert out[j]["n_docs"] == n
        assert out[j]["loss_before"] == loss_before
        assert abs(out[j]["loss_after"] - loss_after) < 5e-7
        assert out[j]["loss_delta"] < 0  # the step actually descended


def test_asof_advised_switches_and_matches(
    spark, hot_events_dir, monkeypatch
):
    """The as-of advisor (q_session_advised's sibling): hot fixture +
    lowered crossover → two-phase arm, output row-identical to both
    physical strategies; real threshold → native arm."""
    from changesetmd_spark.operators import relational as rel

    adv_cold = rel.q_asof_advised(spark, hot_events_dir)
    assert adv_cold.select(F.max("used_two_phase")).first()[0] == 0

    monkeypatch.setattr(rel, "_ASOF_HOT_KEY_ROWS", 100)
    adv = rel.q_asof_advised(spark, hot_events_dir)
    assert adv.select(F.max("used_two_phase")).first()[0] == 1
    core = adv.drop("used_two_phase")
    naive = rel.q_asof_purchase_last_view(spark, hot_events_dir)
    two = rel.q_asof_two_phase_scalable(spark, hot_events_dir)
    for other in (naive, two):
        assert core.exceptAll(other).count() == 0
        assert other.exceptAll(core).count() == 0
    # the fixture exercises the cross-chunk fallback: at least one
    # purchase's latest prior view is in an earlier calendar day
    import datetime as _dt

    crossed = core.filter(
        F.to_date("purchase_ts") != F.to_date("last_view_ts")
    )
    assert crossed.count() >= 1


def test_newton_solve_matches_fraction_inverse():
    """Property: the integer Cramer solve equals the exact Fraction-matrix
    inverse for arbitrary symmetric positive-definite integer systems —
    the driver-side closed form can never drift from textbook algebra."""
    from fractions import Fraction

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from changesetmd_spark.operators.mlstep import _D, newton_step_exact

    @settings(max_examples=200, deadline=None)
    @given(
        st.lists(
            st.integers(min_value=-50, max_value=50),
            min_size=_D * _D,
            max_size=_D * _D,
        ),
        st.lists(
            st.integers(min_value=-1000, max_value=1000),
            min_size=_D,
            max_size=_D,
        ),
    )
    def check(raw, g):
        # build a guaranteed-PD symmetric integer matrix: A^T A + 4I
        a = [raw[i * _D : (i + 1) * _D] for i in range(_D)]
        m = {
            (i, j): sum(a[r][i] * a[r][j] for r in range(_D))
            + (4 if i == j else 0)
            for i in range(_D)
            for j in range(i, _D)
        }
        ws, det = newton_step_exact(m, g)
        assert det > 0  # PD by construction
        # exact rational solve of M w = 2g via Gaussian elimination
        mat = [
            [Fraction(m[(min(i, j), max(i, j))]) for j in range(_D)]
            + [Fraction(2 * g[i])]
            for i in range(_D)
        ]
        for col in range(_D):
            piv = next(r for r in range(col, _D) if mat[r][col] != 0)
            mat[col], mat[piv] = mat[piv], mat[col]
            for r in range(_D):
                if r != col and mat[r][col] != 0:
                    f = mat[r][col] / mat[col][col]
                    mat[r] = [x - f * y for x, y in zip(mat[r], mat[col])]
        exact = [mat[i][_D] / mat[i][i] for i in range(_D)]
        for w, ex in zip(ws, exact):
            # the engine rounds the float(2·num)/float(det) quotient; the
            # exact rational must be within half an ulp-of-6dp of it
            assert abs(w - float(ex)) <= 5.0000001e-7, (w, float(ex))

    check()


def test_winnowing_shared_run_guarantee(spark, tmp_path):
    """The winnowing GUARANTEE (Schleimer et al. 2003): two documents
    sharing a run of >= k + w - 1 tokens must share at least one selected
    fingerprint.  Deterministically generated doc pairs with planted
    shared runs at varying offsets; checked through the real registered
    query's selection by re-deriving each doc's selected hashes."""
    import os

    from changesetmd_spark.operators.text import (
        _WIN_K,
        _WIN_W,
        q_winnowed_fingerprints,
    )

    rows = []
    vocab = [f"tok{i}" for i in range(40)]
    run = " ".join(f"shared{i}" for i in range(_WIN_K + _WIN_W - 1))
    for pair in range(6):
        left = " ".join(vocab[(pair * 7 + i) % 40] for i in range(9 + pair))
        right = " ".join(vocab[(pair * 11 + i) % 40] for i in range(5 + pair))
        rows.append((pair * 2, f"{left} {run}", "en", "src0", 0))
        rows.append((pair * 2 + 1, f"{run} {right}", "en", "src0", 0))
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    d = str(tmp_path / "winnow")
    df.write.parquet(os.path.join(d, "documents.parquet"))
    out = {r.doc_id: r for r in q_winnowed_fingerprints(spark, d).collect()}
    assert len(out) == 12  # every doc long enough to fingerprint
    # the registered query reports per-doc counts; re-derive the selected
    # fingerprint SETS with the same engine expressions to check sharing
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from changesetmd_spark.operators.text import (
        _WIN_POS_BITS,
        token_count,
        word_ngrams,
    )

    n_tok = token_count(F.col("text"))
    hash32 = F.conv(
        F.substring(F.md5(F.col("gram")), 1, 8), 16, 10
    ).cast("long")
    posts = (
        df.select("doc_id", "text", n_tok.alias("n_tok"))
        .select(
            "doc_id",
            (F.col("n_tok") - (_WIN_K - 1)).alias("n_grams"),
            F.posexplode(word_ngrams(F.col("text"), _WIN_K)).alias(
                "pos0", "gram"
            ),
        )
        .select(
            "doc_id",
            "n_grams",
            (F.col("pos0") + 1).alias("pos"),
            (
                hash32 * (1 << _WIN_POS_BITS)
                + ((1 << _WIN_POS_BITS) - 1 - (F.col("pos0") + 1))
            ).alias("key"),
        )
    )
    frame = (
        Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, _WIN_W - 1)
    )
    sel = (
        posts.withColumn("sel", F.min("key").over(frame))
        .filter(F.col("pos") <= F.col("n_grams") - (_WIN_W - 1))
        .select(
            "doc_id",
            F.shiftright("sel", _WIN_POS_BITS).alias("fp"),  # strip position
        )
        .collect()
    )
    fps = {}
    for r in sel:
        fps.setdefault(r.doc_id, set()).add(r.fp)
    for pair in range(6):
        shared = fps[pair * 2] & fps[pair * 2 + 1]
        assert shared, f"pair {pair}: guarantee violated"
