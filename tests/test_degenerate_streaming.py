"""Degenerate-corpus sweep, streaming family (VERDICT r16 #6).

The r16 batch sweep never exercised the stream harness: of the 12
oracle-backed streaming queries only the two whose oracles mention
``props`` were swept, and none of the stream-specific degenerate shapes
— blank/whitespace props flowing through a watermarked plan, a batch
consisting solely of duplicates of an earlier batch, an all-late batch
whose every window is watermark-expired — had a fixture at all.

This module (a) re-runs EVERY oracle-backed streaming query against the
v2 degenerate corpus with the exact driver-mirror comparison, and (b)
pins the two batch-shape semantics the per-query oracles cannot express
by construction: duplicate-only-batch idempotence and the all-late
drop.  First find: ``{"k": ""}`` killed both engines' numeric props
extraction (DuckDB ConversionException vs Spark ANSI CAST_INVALID_INPUT)
— fixed by the uniform try_cast contract in ``registry._canonicalize_oracle``
plus ``try_cast`` at all seven engine sites.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from changesetmd_spark import registry
from changesetmd_spark.streaming import events_stream as es

from .degen_corpus import build_degen_dir
from .oracle import compare_to_oracle

ALL_QUERIES = registry.queries()
ORACLES = registry.oracles()

STREAM_SWEEP = sorted(
    n for n in ALL_QUERIES if n.startswith("q_stream_") and n in ORACLES
)


@pytest.fixture(scope="session")
def degen_dir() -> str:
    return build_degen_dir()


def test_stream_sweep_is_complete():
    """Every oracle-backed streaming query is swept — the r16 gap was
    exactly the silent exclusion of 10 of the 12."""
    assert len(STREAM_SWEEP) >= 12, STREAM_SWEEP


@pytest.mark.parametrize("name", STREAM_SWEEP)
def test_degenerate_stream_matches_oracle(spark, degen_dir, name):
    df = ALL_QUERIES[name](spark, degen_dir)
    compare_to_oracle(df, ORACLES[name], degen_dir)


def test_all_late_batch_rows_dropped(spark, degen_dir):
    """The v2 fixture plants two events months before the corpus span
    with event_id % 4 == 1, so the late-drop staging replays them in the
    LATE batch after the watermark has passed their window by months:
    the engine must drop both (window end <= watermark), while the
    single-batch tumbling query — where nothing is late — must keep
    their 2023 window.  Proves the rows exist and only the watermark
    rule removed them."""
    dropped = ALL_QUERIES["q_stream_late_data_drop"](spark, degen_dir)
    assert (
        dropped.filter(F.col("window_start").startswith("2023-06-01")).count()
        == 0
    )
    kept = ALL_QUERIES["q_stream_tumbling_hourly"](spark, degen_dir)
    assert (
        kept.filter(F.col("window_start").startswith("2023-06-01")).count()
        == 1
    )


def test_duplicate_only_batch_is_idempotent(spark, degen_dir):
    """A second batch that replays the ENTIRE first batch byte-for-byte
    must not change streaming dedup output: dropDuplicates state absorbs
    the replay, and the per-type distinct-user counts still equal the
    batch COUNT(DISTINCT) oracle (which is blind to duplication by
    construction — duplicates add no keys)."""
    d = es._staged_batch_events(
        spark,
        degen_dir,
        "events-dupbatch-degen",
        (F.lit(True), F.lit(True)),  # batch-1 duplicates batch-0 exactly
    )
    import os

    with es._scoped_conf(spark, es._RUNTIME_CONF):
        schema = spark.read.parquet(
            os.path.join(d, "batch-0.parquet")
        ).schema
        sdf = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(d)
        )
    ts_type = dict(sdf.dtypes)["ts"]
    if ts_type == "bigint":
        sdf = sdf.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
    elif ts_type == "timestamp_ntz":
        sdf = sdf.withColumn("ts", F.col("ts").cast("timestamp"))
    dd = (
        sdf.withWatermark("ts", "1 hour")
        .dropDuplicates(["event_type", "user_id"])
        .select("event_type", "user_id")
    )
    out = es.run_stream_to_table(dd, output_mode="append")
    result = out.groupBy("event_type").agg(
        F.count("*").alias("n_distinct_users")
    )
    compare_to_oracle(
        result, ORACLES["q_stream_dedup_first_seen"], degen_dir
    )
