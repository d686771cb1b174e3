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
