"""Unit referee for ``operators/twophase.two_phase_prefix`` — the
distributed prefix machinery behind the deciles / shard-manifest queries.
Its oracle coverage rides inside those queries; this pins the utility's
own contract, including the NULL-group-key path (ADVICE r8: the offset
join must be null-safe, not a silent row drop)."""

from __future__ import annotations

from pyspark.sql import functions as F

from changesetmd_spark.operators.twophase import two_phase_prefix


def _sequential_prefix(rows, group_key, order_key, value_key):
    """Driver-side referee: exclusive running sum per group."""
    out = {}
    acc = {}
    for r in sorted(rows, key=lambda r: ((r[group_key] is not None, r[group_key] or ""), r[order_key])):
        g = r[group_key]
        out[(g, r[order_key])] = acc.get(g, 0)
        acc[g] = acc.get(g, 0) + r[value_key]
    return out


def test_two_phase_matches_sequential(spark):
    data = [(f"g{i % 3}", i, i * 10) for i in range(200)]
    df = spark.createDataFrame(data, "grp string, seq int, val long")
    out, totals = two_phase_prefix(
        df, ["grp"], [F.col("seq").asc()], [("prefix", F.col("val"))],
        num_partitions=7,
    )
    got = {(r.grp, r.seq): r.prefix for r in out.collect()}
    want = _sequential_prefix(data_dicts(data), "grp", "seq", "val")
    assert got == want
    assert totals["prefix"][("g0",)] == sum(v for g, _, v in data if g == "g0")


def data_dicts(data):
    return [{"grp": g, "seq": s, "val": v} for g, s, v in data]


def test_two_phase_null_group_key_not_dropped(spark):
    """Rows with a NULL group key are a legal SQL group — the offset join
    must carry them through (null-safe <=>), with their own running sum."""
    data = [
        ("a", 1, 5),
        (None, 2, 7),
        ("a", 3, 11),
        (None, 4, 13),
        (None, 5, 17),
    ]
    df = spark.createDataFrame(data, "grp string, seq int, val long")
    out, totals = two_phase_prefix(
        df, ["grp"], [F.col("seq").asc()], [("prefix", F.col("val"))],
        num_partitions=3,
    )
    rows = {(r.grp, r.seq): r.prefix for r in out.collect()}
    assert len(rows) == 5, "NULL-group rows must not be dropped"
    assert rows[(None, 2)] == 0
    assert rows[(None, 4)] == 7
    assert rows[(None, 5)] == 20
    assert rows[("a", 1)] == 0
    assert rows[("a", 3)] == 5
    assert totals["prefix"][(None,)] == 37


def test_two_phase_no_group_cols(spark):
    df = spark.createDataFrame(
        [(i, 1) for i in range(100)], "seq int, one long"
    )
    out, totals = two_phase_prefix(
        df, [], [F.col("seq").asc()], [("rank0", F.col("one"))],
        num_partitions=5,
    )
    got = sorted((r.seq, r.rank0) for r in out.collect())
    assert got == [(i, i) for i in range(100)]
    assert totals["rank0"][()] == 100
