"""Round-13 operator referees: properties the DuckDB oracles can't see —
algebraic identities, plan shapes, and skew-tier semantics."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from changesetmd_spark import registry


def test_ease_grid_projected_area_equals_band_formula(spark, sf_dir):
    """The algebraic identity the exact-parity claim rests on: the projected
    rectangle's Δx·Δy must equal bbox_area_m2's spherical-band formula
    R²·|Δλ|·|Δsin φ| for every envelope (cos φ₁ cancels), including ones
    needing the ±90 latitude clamp."""
    from changesetmd_spark.operators.geometry import (
        bbox_area_m2,
        ease_grid_xy,
    )

    rows = spark.createDataFrame(
        [
            (-30.0, -20.0, 60.0, 55.0),
            (0.0, 0.0, 1.0, 1.0),
            (-180.0, -95.0, 180.0, 95.0),  # needs the clamp
            (10.0, 89.0, 11.0, 92.0),
        ],
        "min_lon double, min_lat double, max_lon double, max_lat double",
    )
    x1, y1 = ease_grid_xy(F.col("min_lon"), F.col("min_lat"))
    x2, y2 = ease_grid_xy(F.col("max_lon"), F.col("max_lat"))
    band = bbox_area_m2(
        F.col("min_lon"), F.col("min_lat"), F.col("max_lon"), F.col("max_lat")
    )
    out = rows.select(
        ((x2 - x1) * (y2 - y1)).alias("projected"), band.alias("band")
    ).collect()
    for r in out:
        assert math.isclose(r.projected, r.band, rel_tol=1e-12), r


def test_ease_grid_project_no_shuffle_no_udf(spark, sf_dir):
    """The transform is pure column math: the executed plan must contain no
    exchange besides the TakeOrdered's implicit single-partition collect and
    no Python evaluation."""
    plan = (
        registry.queries()["q_ease_grid_project"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange hashpartitioning" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "TakeOrderedAndProject" in plan


def test_stream_left_outer_expiry_three_outcomes(spark, sf_dir):
    """The left-outer expiry query must exhibit ALL THREE append-mode
    outcomes at every SF, or the pinned semantics are vacuous: matched
    pairs (click_id set), null-padded expired emissions (click_id null),
    and WITHHELD purchases — unmatched rows younger than the watermark
    that never appear in the output at all."""
    rows = registry.queries()["q_stream_join_left_outer_expiry"](
        spark, sf_dir
    ).collect()
    matched = [r for r in rows if r.click_id is not None]
    null_emitted = [r for r in rows if r.click_id is None]
    from changesetmd_spark.tables import load_table

    n_purchases = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .count()
    )
    emitted_purchases = {r.purchase_id for r in rows}
    withheld = n_purchases - len(emitted_purchases)
    assert matched, "no matched pair emitted"
    assert null_emitted, "no null-padded expiry emission"
    assert withheld > 0, "no purchase withheld inside the watermark horizon"
    # null rows must carry null minutes_before too (fully null-padded)
    assert all(r.minutes_before is None for r in null_emitted)


def test_market_share_star_broadcasts_all_dims(spark, sf_dir):
    """Q8-shape star: every dimension side must broadcast; the fact table
    must never be shuffled for a dimension join (one aggregate exchange
    only)."""
    plan = (
        registry.queries()["q_market_share_by_nation"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("BroadcastHashJoin") >= 4, plan
    assert "SortMergeJoin" not in plan, plan


def test_dedup_reemit_has_suppressed_population(spark, sf_dir):
    """The re-emission query is only a meaningful pin if some history keys
    are SUPPRESSED (state still live) while others re-emit (state
    expired) — otherwise the expiry rule is vacuously satisfied."""
    from changesetmd_spark.streaming.events_stream import _INC_CUTOFF
    from changesetmd_spark.tables import load_table

    rows = registry.queries()["q_stream_dedup_reemit_after_expiry"](
        spark, sf_dir
    ).collect()
    n_reemitted = sum(r.n_reemitted for r in rows)
    n_new = sum(r.n_new for r in rows)
    item = F.get_json_object(F.col("props"), "$.k").cast("long")
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", item.alias("item_id"), "ts"
    )
    cutoff = F.lit(_INC_CUTOFF).cast("timestamp")
    base = ev.filter(F.col("ts") < cutoff).select("user_id", "item_id").distinct()
    delta = ev.filter(F.col("ts") >= cutoff).select("user_id", "item_id").distinct()
    n_overlap = delta.join(base, ["user_id", "item_id"]).count()
    assert n_reemitted > 0, "no expired key re-emitted"
    assert n_new > 0, "no never-seen key emitted"
    assert n_overlap > n_reemitted, (
        "every history key re-emitted — no live-state suppression exercised"
    )


def test_multitouch_all_split_branches_exercised(spark, sf_dir):
    """Attribution must see single-touch, two-touch, and >=3-touch
    purchases at every SF (else the U-shaped split with remainder-to-first
    is dead code), and every group's credits must sum to exactly
    10000 bp x purchases."""
    rows = registry.queries()["q_multitouch_attribution"](
        spark, sf_dir
    ).collect()
    ks = {r.n_touches for r in rows}
    assert 1 in ks and 2 in ks and any(k >= 3 for k in ks), ks
    for r in rows:
        assert r.total_bp == 10000 * r.n_purchases, r


def test_two_phase_sessionization_row_identical_to_native(
    spark, sf_dir, tmp_path
):
    """The hot-key-proof two-phase plan must reproduce the native
    session_window output row-for-row — chunk-boundary merges included
    (midnight-spanning sessions are the failure mode)."""
    two = registry.queries()["q_session_two_phase_scalable"](spark, sf_dir)
    naive = registry.queries()["q_window_session_per_user"](spark, sf_dir)
    assert sorted(map(tuple, two.collect())) == sorted(
        map(tuple, naive.collect())
    )
    # Non-vacuity (ADVICE r13): a date(session_start) != date(session_end)
    # check is satisfiable with ZERO merges (end = last_ts + 30min can
    # cross midnight on its own — and on the sf fixture it does: phase-1
    # chunk-session count equals the final count there, i.e. no event-pair
    # actually straddles a day boundary within one gap).  So exercise the
    # phase-2 island-merge path on a crafted table instead: one user whose
    # events run 23:40 → 00:35 at 15-min gaps (one session spanning three
    # chunk-sessions' worth of day-boundary splits would be overkill — two
    # chunks merge into one), plus a control user fully inside one day.
    import datetime as dt

    rows = [
        # user 1: 23:40, 23:55, 00:10 (+1d), 00:25 — one true session
        # crossing midnight; phase 1 splits it into a Jan-1 chunk-session
        # and a Jan-2 chunk-session that phase 2 must re-merge.
        (1, dt.datetime(2024, 1, 1, 23, 40), 1, "view", 1.0, "{}"),
        (2, dt.datetime(2024, 1, 1, 23, 55), 1, "view", 1.0, "{}"),
        (3, dt.datetime(2024, 1, 2, 0, 10), 1, "view", 1.0, "{}"),
        (4, dt.datetime(2024, 1, 2, 0, 25), 1, "view", 1.0, "{}"),
        # user 2: two separate same-day sessions (gap > 30min) — the
        # no-merge control; phase 2 must NOT merge these.
        (5, dt.datetime(2024, 1, 1, 10, 0), 2, "view", 1.0, "{}"),
        (6, dt.datetime(2024, 1, 1, 12, 0), 2, "view", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    )
    crafted = str(tmp_path)
    df.coalesce(1).write.parquet(f"{crafted}/events.parquet")
    two_c = registry.queries()["q_session_two_phase_scalable"](spark, crafted)
    naive_c = registry.queries()["q_window_session_per_user"](spark, crafted)
    got = sorted(map(tuple, two_c.collect()))
    assert got == sorted(map(tuple, naive_c.collect()))
    # exactly 3 sessions: midnight-spanner merged (4 events), two controls
    assert len(got) == 3 and {r[3] for r in got} == {4, 1}, got
    phase1 = (
        df.groupBy(
            "user_id",
            F.to_date("ts").alias("chunk"),
            F.session_window("ts", "30 minutes").alias("w"),
        )
        .count()
        .count()
    )
    assert phase1 == 4 > 3, "merge path not exercised"


def test_two_phase_asof_row_identical_to_native(spark, sf_dir):
    """The chunked as-of must reproduce the union+window plan row-for-row,
    and the strictly-earlier-day fallback path must be non-vacuous."""
    two = registry.queries()["q_asof_two_phase_scalable"](spark, sf_dir)
    naive = registry.queries()["q_asof_purchase_last_view"](spark, sf_dir)
    assert sorted(map(tuple, two.collect())) == sorted(
        map(tuple, naive.collect())
    )
    cross = two.filter(
        F.to_date("purchase_ts") != F.to_date("last_view_ts")
    ).count()
    assert cross > 0, "no cross-day fallback exercised"
