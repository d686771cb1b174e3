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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from .events_stream import run_stream_to_table, stream_events


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
    out = run_stream_to_table(joined, output_mode="append")
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
