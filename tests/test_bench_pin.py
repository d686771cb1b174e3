"""Regression-pin contamination hardening (VERDICT r16 #2).

The r16 driver rerun inflated the entire 251-query distribution ~1.22x
median (p90 1.70x) with a flat pure-JVM sentinel (1.07x) — host
contention the probe-gated resample then "confirmed" on 9 queries because
the resample leg ran inside the same hot window.  ``bench.pin_candidates``
is the pure layer of the fix; these tests replay the real r16
close-vs-rerun payloads through it (fixture:
``tests/fixtures/bench_pin_r16_replay.json``) and assert the verdict's
done-criterion: zero confirmable flags on the contaminated rerun, while a
synthetic single-query slowdown on a flat run still trips the pin.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from bench import pin_candidates  # noqa: E402

FIXTURE = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    "fixtures",
    "bench_pin_r16_replay.json",
)


def _replay():
    with open(FIXTURE) as f:
        fix = json.load(f)
    close, rerun = fix["close"], fix["rerun"]
    pins = pin_candidates(
        close,
        rerun["sf"],
        rerun["queries_median"],
        rerun["query_fingerprints"],
    )
    return close, rerun, pins


def test_r16_rerun_declared_contaminated():
    _, _, pins = _replay()
    # 251 fingerprint-stable common queries, uniform ~1.22x inflation
    assert pins["n_common_stable"] >= 200
    assert pins["run_median_ratio"] is not None
    assert pins["run_median_ratio"] > 1.15
    assert pins["run_contaminated"] is True


def test_r16_rerun_yields_zero_confirmable_flags():
    """The verdict's replay criterion: pushing the r16 driver rerun
    through the new logic — candidate gating + scaled reproduction bar +
    the contamination veto — produces 0 ``resample_confirmed``.  The
    resample medians and cool-probe ratios recorded by the actual r16
    rerun stand in for the live resample leg."""
    _, rerun, pins = _replay()
    run_med = pins["run_median_ratio"]
    recorded = rerun["regressions"]
    confirmed = []
    for name, rec in pins["candidates"].items():
        old = recorded.get(name)
        if old is None or old.get("resample_median") is None:
            continue
        re_med = old["resample_median"]
        cool = old.get("resample_probe_vs_floor")
        probe_cool = cool is None or cool < 1.3
        reproduced = re_med > 1.5 * rec["prev"] * max(run_med, 1.0)
        if reproduced and probe_cool and not pins["run_contaminated"]:
            confirmed.append(name)
    assert confirmed == []
    # and the normalization alone already suppressed a third of the raw
    # breaches (uniform-inflation victims, recorded for transparency)
    assert len(pins["suppressed"]) >= 8
    # every query the r16 run falsely confirmed is either suppressed or,
    # if still a candidate, vetoed by the contamination declaration above
    falsely_confirmed = {
        n for n, r in recorded.items() if r.get("resample_confirmed")
    }
    assert falsely_confirmed  # the r16 failure mode actually happened
    assert pins["run_contaminated"]  # ... and the veto covers all of it


def test_synthetic_single_query_regression_still_trips():
    """A genuinely regressed plan on an otherwise flat run must still be
    flagged AND confirmable: flat ratios keep the run median at ~1.0, so
    neither normalization nor the contamination veto applies."""
    close, rerun, _ = _replay()
    flat = {n: t for n, t in close["queries_median"].items()}
    victim = "q_pagerank_items"
    assert flat[victim] > 0.5  # big enough that the abs-delta gate passes
    now = dict(flat)
    now[victim] = round(flat[victim] * 3.0, 3)
    pins = pin_candidates(
        close, close["sf"], now, close["query_fingerprints"]
    )
    assert pins["run_contaminated"] is False
    assert 0.95 <= pins["run_median_ratio"] <= 1.05
    assert list(pins["candidates"]) == [victim]
    rec = pins["candidates"][victim]
    # the scaled reproduction bar reduces to the classic 1.5x on a flat
    # run: a resample that reproduces 3x prev is confirmable
    assert 3.0 * rec["prev"] > 1.5 * rec["prev"] * max(
        pins["run_median_ratio"], 1.0
    )


def test_redefined_queries_rebaseline_not_flag():
    close, _, _ = _replay()
    now = dict(close["queries_median"])
    victim = "q_triangle_count"
    now[victim] = round(now[victim] * 4.0 + 1.0, 3)
    fps = dict(close["query_fingerprints"])
    fps[victim] = "deadbeef0000"
    pins = pin_candidates(close, close["sf"], now, fps)
    assert victim in pins["redefined"]
    assert victim not in pins["candidates"]


def test_sf_mismatch_is_inert():
    close, rerun, _ = _replay()
    pins = pin_candidates(
        close, 0.01, rerun["queries_median"], rerun["query_fingerprints"]
    )
    assert pins["candidates"] == {} and pins["run_median_ratio"] is None
