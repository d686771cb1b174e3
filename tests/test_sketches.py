"""Sketch error-bound tests: approximate answers must sit inside their
documented error envelopes around the exact answers — the correctness
contract an oracle hash can't express.

percentile_approx returns a real data point with bounded RANK error
(≤ n/accuracy), while exact `percentile` interpolates between ranks — so
the right assertion is on ranks, not values (a sparse tail makes nearby
ranks far apart in value)."""

from __future__ import annotations

import bisect

from pyspark.sql import functions as F

from changesetmd_spark import registry
from changesetmd_spark.tables import load_table


def test_sketches_within_error_bounds(spark, sf_dir):
    approx = {
        r.event_type: r
        for r in registry.queries()["q_sketch_cardinality_and_quantiles"](
            spark, sf_dir
        ).collect()
    }
    ev = load_table(spark, sf_dir, "events")
    exact_users = {
        r.event_type: r.users
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("users"))
        .collect()
    }
    values = {}
    for r in ev.select("event_type", "value").collect():
        values.setdefault(r.event_type, []).append(r.value)
    assert set(approx) == set(exact_users)

    for t, a in approx.items():
        # HLL++ rsd=0.02 -> generous 10% gate (observed well under)
        e_users = exact_users[t]
        assert abs(a.approx_users - e_users) <= max(1, 0.10 * e_users), t

        vs = sorted(values[t])
        n = len(vs)
        for q, got in ((0.5, a.p50_approx), (0.99, a.p99_approx)):
            # the sketch must return an actual data point...
            assert got in values[t], (t, q, got)
            # ...whose rank is within a tiny window of the target rank
            # (rank error bound is n/accuracy = n/10000 < 1 here, plus
            # duplicates widen the window)
            lo = bisect.bisect_left(vs, got)
            hi = bisect.bisect_right(vs, got) - 1
            target = q * (n - 1)
            assert lo - 2 <= target <= hi + 2, (t, q, got, lo, hi, target)


def test_mg_merge_of_batch_counts_superset_guarantee():
    """Referee for the vectorized Misra-Gries pass (`sketches._mg_merge_counts`):
    feeding batch-level EXACT counts through MG MERGE must keep every term
    whose stream frequency is >= phi, for capacity >= 1/phi, at any batch
    split.  Adversarial stream: a long unique-token tail (maximal decrement
    pressure) interleaved with genuine heavy hitters near the threshold."""
    import random

    from changesetmd_spark.operators.sketches import _mg_merge_counts

    rng = random.Random(8)
    phi, capacity = 1 / 30, 64
    n = 30_000
    # heavy hitters sit just above phi*n; tail tokens are all distinct
    heavy = {f"hh{i}": int(phi * n) + 1 + i for i in range(8)}
    stream = [t for t, c in heavy.items() for _ in range(c)]
    stream += [f"tail{i}" for i in range(n - len(stream))]
    assert len(stream) == n
    rng.shuffle(stream)

    for batch_size in (1, 7, 100, 4096, n):
        counters: dict = {}
        for start in range(0, n, batch_size):
            batch = stream[start : start + batch_size]
            counts: dict = {}
            for t in batch:
                counts[t] = counts.get(t, 0) + 1
            counters = _mg_merge_counts(counters, counts, capacity)
        assert len(counters) <= capacity
        missing = set(heavy) - set(counters)
        assert not missing, (batch_size, missing)
        # undercount bound: counter >= true - n/(capacity+1)
        for t, true_c in heavy.items():
            assert counters[t] >= true_c - n / (capacity + 1), (batch_size, t)


def test_vocab_sketch_error_bound(spark, sf_dir):
    """q_vocab_growth_sketched must track the exact Heaps curve within the
    HLL sketch's error envelope (default lgConfigK=12 ⇒ ~1.6% RSE; 5%
    bound leaves 3σ headroom), with identical checkpoint/n_docs frames."""
    from changesetmd_spark import registry

    qs = registry.queries()
    exact = {
        r.checkpoint: (r.n_docs, r.vocab_size)
        for r in qs["q_vocab_growth"](spark, sf_dir).collect()
    }
    sk = {
        r.checkpoint: (r.n_docs, r.vocab_size_est)
        for r in qs["q_vocab_growth_sketched"](spark, sf_dir).collect()
    }
    assert set(sk) == set(exact)
    for c, (nd, vs) in exact.items():
        nd2, est = sk[c]
        assert nd2 == nd, f"checkpoint {c}: n_docs mismatch"
        assert abs(est - vs) <= max(2, 0.05 * vs), (
            f"checkpoint {c}: estimate {est} vs exact {vs}"
        )


def test_countmin_matches_python(spark, sf_dir):
    """Pure-Python CMS referee: same md5 bucket hashes, same d×w geometry;
    estimates must match exactly, overestimate must be >= 0, and at the
    chosen geometry some collision must actually be exercised."""
    import hashlib
    import re as _re
    from collections import Counter

    from changesetmd_spark.operators.sketches import (
        _CMS_D,
        _CMS_TOPK,
        _CMS_W,
        q_countmin_estimates,
    )
    from changesetmd_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("text").collect()
    counts = Counter()
    for r in docs:
        counts.update(_re.split(r"\s+", r.text.strip().lower()))

    def bucket(i: int, term: str) -> int:
        h = hashlib.md5(f"{i}:{term}".encode()).hexdigest()
        return int(h[:15], 16) % _CMS_W

    cells = Counter()
    for term, c in counts.items():
        for i in range(_CMS_D):
            cells[(i, bucket(i, term))] += c

    topk = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:_CMS_TOPK]
    exp = {
        t: (c, min(cells[(i, bucket(i, t))] for i in range(_CMS_D)))
        for t, c in topk
    }

    got = {r.term: r for r in q_countmin_estimates(spark, sf_dir).collect()}
    assert set(got) == set(exp)
    any_over = False
    for t, (c, est) in exp.items():
        g = got[t]
        assert (g.exact_cnt, g.cms_estimate) == (c, est), (t, c, est, g)
        assert g.overestimate == est - c >= 0
        any_over = any_over or g.overestimate > 0
    assert any_over, "CMS geometry too wide: overestimate never exercised"
