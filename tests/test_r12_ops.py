"""Referee tests for the round-12 operators: the advisor→salted-join loop
(VERDICT r11 #6) invariants the DuckDB hash can't express — lane spread and
exact row-identity with the plain join."""

from __future__ import annotations

from pyspark.sql import functions as F

from changesetmd_spark.operators.skew import (
    _SKEW_TARGET_ROWS,
    salted_join,
)
from changesetmd_spark.tables import load_table


def test_advised_salt_spreads_hot_key_and_preserves_rows(spark, sf_dir):
    """Feeding the advisor's S into salted_join must (a) keep the joined
    row multiset identical to the plain join and (b) actually spread the
    hottest key across all S salt lanes with no lane above the advisor's
    per-bucket target (within hash-uniformity slack)."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    counts = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("type_total")
    )
    max_n = counts.agg(F.max("type_total")).first()[0]
    s = max(1, (int(max_n) + _SKEW_TARGET_ROWS - 1) // _SKEW_TARGET_ROWS)

    plain = (
        ev.join(counts, "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("sv"),
        )
    )
    salted = (
        salted_join(ev, counts, on="event_type", n_salts=s)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("sv"),
        )
    )
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )

    if s > 1:
        # lane spread on the hottest key: every salt lane populated, and no
        # (key, salt) bucket above 2x the uniform share (hash slack)
        hot = counts.orderBy(F.desc("type_total")).first()
        salt = F.pmod(F.xxhash64("event_type", "value"), F.lit(s))
        lanes = (
            ev.filter(F.col("event_type") == hot.event_type)
            .select(salt.alias("salt"))
            .groupBy("salt")
            .count()
            .collect()
        )
        assert len(lanes) == s  # all lanes used
        assert max(r["count"] for r in lanes) <= 2 * (hot.type_total // s + 1)
