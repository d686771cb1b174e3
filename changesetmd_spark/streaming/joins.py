"""Stream-stream joins (SURVEY §2.9 T6 extension surface).

The reference has no joins at all in code (SURVEY §2.3) and no event-time
processing; a stream-stream *interval* join is the canonical Structured
Streaming capability beyond windowed aggregation: two unbounded inputs,
joined on key + event-time range, with watermarks bounding how much of each
side's past must be buffered in the state store.

Scale notes: state size is (watermark horizon × input rate) per side — the
join below buffers at most 1 hour of clicks and purchases; the join itself
shuffles both sides on ``user_id`` once.  Without the watermark + time-range
condition the state grows forever — the unbounded-state failure mode this
module exists to demonstrate handling correctly.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from .events_stream import (
    _LATE_DELAY_MS,
    _RUNTIME_CONF,
    _scoped_conf,
    _staged_batch_events,
    run_stream_to_table,
    state_width,
    stream_events,
)


@register(
    "q_stream_purchase_attribution",
    oracle="""
    SELECT p.event_id AS purchase_id,
           c.event_id AS click_id,
           p.user_id,
           (epoch_us(p.ts) - epoch_us(c.ts)) // 60000000 AS minutes_before
    FROM events p JOIN events c
      ON p.event_type = 'purchase' AND c.event_type = 'click'
     AND c.user_id = p.user_id
     AND c.ts >= p.ts - INTERVAL 30 MINUTE
     AND c.ts <= p.ts
    """,
)
def q_stream_purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purchase→click attribution as a stream-stream interval join: every
    purchase joined to the same user's clicks in the preceding 30 minutes.
    Both sides are unbounded streams with 1-hour watermarks; the time-range
    condition lets Spark evict buffered rows as the watermark advances.
    Hash-checked against the equivalent batch range join."""
    clicks = (
        stream_events(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "1 hour")
    )
    purchases = (
        stream_events(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    joined = purchases.join(
        clicks,
        (F.col("c_user") == F.col("user_id"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 30 MINUTES"))
        & (F.col("c_ts") <= F.col("p_ts")),
        "inner",
    )
    out = run_stream_to_table(
        joined,
        output_mode="append",
        shuffle_partitions=state_width(spark, sf_dir),
    )
    return out.select(
        "purchase_id",
        "click_id",
        "user_id",
        # integer division on exact microseconds on BOTH engines — a double
        # epoch()/60 could round differently at exact-minute boundaries
        F.expr("(unix_micros(p_ts) - unix_micros(c_ts)) div 60000000").alias(
            "minutes_before"
        ),
    )


@register(
    "q_stream_join_left_outer_expiry",
    oracle=f"""
    WITH p AS (
      SELECT event_id AS purchase_id, user_id, ts AS p_ts FROM events
      WHERE event_type = 'purchase'
    ), c AS (
      SELECT event_id AS click_id, user_id, ts AS c_ts FROM events
      WHERE event_type = 'click'
    ), wm AS (
      -- probed engine rules (pinned): the global watermark is the MIN of
      -- the two sides' (max event time - delay); an unmatched left row
      -- null-emits iff p_ts < that watermark (strictly) -- younger
      -- unmatched rows are WITHHELD from append output at end-of-stream
      SELECT LEAST((SELECT MAX(p_ts) FROM p), (SELECT MAX(c_ts) FROM c))
             - INTERVAL '{_LATE_DELAY_MS} milliseconds' AS w
    ), matched AS (
      SELECT p.purchase_id, p.user_id, c.click_id,
             (epoch_us(p.p_ts) - epoch_us(c.c_ts)) // 60000000
               AS minutes_before
      FROM p JOIN c ON c.user_id = p.user_id
       AND c.c_ts >= p.p_ts - INTERVAL 30 MINUTE
       AND c.c_ts <= p.p_ts
    )
    SELECT * FROM matched
    UNION ALL
    SELECT p.purchase_id, p.user_id,
           CAST(NULL AS BIGINT) AS click_id,
           CAST(NULL AS BIGINT) AS minutes_before
    FROM p, wm
    WHERE p.p_ts < wm.w
      AND NOT EXISTS (
        SELECT 1 FROM c WHERE c.user_id = p.user_id
          AND c.c_ts >= p.p_ts - INTERVAL 30 MINUTE AND c.c_ts <= p.p_ts)
    """,
)
def q_stream_join_left_outer_expiry(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Stream-stream LEFT OUTER interval join with state expiry,
    hash-checked (VERDICT r12 #8) — the semantics people get wrong: a
    matched (purchase, click) pair emits immediately, but an UNMATCHED
    purchase emits its null-padded row only when the watermark proves no
    future click can match — and purchases still inside the watermark
    horizon at end-of-stream are NOT emitted at all.  Both probed rules
    are pinned by the oracle: (1) the global watermark is the MIN across
    both sides of (max observed event time − delay), and (2) an unmatched
    left row null-emits iff its event time is STRICTLY below that
    watermark.  The 500 ms delay offset keeps the cutoff strictly between
    second-aligned timestamps, so no row sits on the </≤ edge.  Staging:
    all events in batch 0, then TWO empty spacer files — the first lets
    the batch-0 watermark take effect (a batch's watermark applies one
    batch later), during which the expired unmatched state null-emits;
    the second guards the emission landing before availableNow
    terminates.  At every SF the 72 h horizon splits purchases three
    ways: matched (emitted), old-unmatched (null-emitted), and
    recent-unmatched (withheld) — a pytest referee asserts all three
    outcomes are non-empty.

    Scale shape: one user_id shuffle per side; state is bounded by
    (watermark horizon × arrival rate) per side, and the left-outer
    expiry is exactly the mechanism that keeps it bounded — without it
    unmatched rows accumulate forever.  (ref has no joins at all —
    SURVEY §2.3; this is the T6 extension surface.)"""
    d = _staged_batch_events(
        spark,
        sf_dir,
        "eventsloj",
        (F.lit(True), F.lit(False), F.lit(False)),
    )
    with _scoped_conf(spark, _RUNTIME_CONF):
        schema = spark.read.parquet(os.path.join(d, "batch-0.parquet")).schema

        def src() -> DataFrame:
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
            return sdf

        left = (
            src()
            .filter(F.col("event_type") == "purchase")
            .select(
                F.col("event_id").alias("purchase_id"),
                "user_id",
                F.col("ts").alias("p_ts"),
            )
            .withWatermark("p_ts", f"{_LATE_DELAY_MS} milliseconds")
        )
        right = (
            src()
            .filter(F.col("event_type") == "click")
            .select(
                F.col("event_id").alias("click_id"),
                F.col("user_id").alias("c_user"),
                F.col("ts").alias("c_ts"),
            )
            .withWatermark("c_ts", f"{_LATE_DELAY_MS} milliseconds")
        )
    joined = left.join(
        right,
        (F.col("c_user") == F.col("user_id"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 30 MINUTES"))
        & (F.col("c_ts") <= F.col("p_ts")),
        "left_outer",
    )
    out = run_stream_to_table(
        joined,
        output_mode="append",
        shuffle_partitions=state_width(spark, sf_dir),
    )
    return out.select(
        "purchase_id",
        "user_id",
        "click_id",
        F.expr("(unix_micros(p_ts) - unix_micros(c_ts)) div 60000000").alias(
            "minutes_before"
        ),
    )
