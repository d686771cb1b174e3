"""Range (interval) join (SURVEY.md §2.3 extension; the north-star's
"range join" custom operator).

Joining points to containing intervals with a raw inequality predicate
plans as a nested-loop join — O(|points|·|intervals|), hopeless at 100 TB.
The scale shape is the *bucketed range join*: quantize time into fixed
buckets, explode each interval to every bucket it overlaps, map each point
to its single bucket, equi-join on the bucket, then apply the exact range
predicate to discard same-bucket non-matches.  Work becomes
O(|points| + |intervals|·span/bucket + matches): an equi-join Catalyst can
hash/broadcast, with the inequality reduced to a residual filter.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load_table

_BUCKET_SECONDS = 4 * 86400  # must be >= the max interval span (3 days here)


def _bucket(ts: Column) -> Column:
    return (F.unix_timestamp(ts) / _BUCKET_SECONDS).cast("long")


def bucketed_range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start: str,
    end: str,
    how: str = "inner",
    broadcast_intervals: bool = False,
) -> DataFrame:
    """points ⋈ intervals ON start <= point_ts < end, bucket-accelerated.

    ``intervals`` is exploded to one row per overlapped bucket (the span/
    bucket ratio bounds the blow-up — choose _BUCKET_SECONDS >= typical
    span); points carry exactly one bucket, so no dedup is needed after
    the residual filter.  With ``broadcast_intervals`` the exploded interval
    table ships to every executor and the point side is never shuffled —
    the right call whenever intervals ≪ points (the common telemetry case);
    otherwise both sides hash-shuffle on the bucket."""
    iv = intervals.withColumn(
        "_bucket",
        F.explode(F.sequence(_bucket(F.col(start)), _bucket(F.col(end)))),
    )
    if broadcast_intervals:
        iv = F.broadcast(iv)
    pt = points.withColumn("_bucket", _bucket(F.col(point_ts)))
    joined = pt.join(iv, "_bucket", how).filter(
        (F.col(point_ts) >= F.col(start)) & (F.col(point_ts) < F.col(end))
    )
    return joined.drop("_bucket")


@register(
    "q_range_join_shipments_in_window",
    oracle="""
    WITH iv AS (
      SELECT o_orderkey AS window_key,
             o_orderdate AS w_start,
             o_orderdate + INTERVAL 3 DAY AS w_end
      FROM orders WHERE o_orderkey % 100 = 0
    )
    SELECT window_key,
           COUNT(*) AS n_shipments,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
    FROM lineitem JOIN iv
      ON l_shipdate >= w_start AND l_shipdate < w_end
    GROUP BY window_key
    """,
)
def q_range_join_shipments_in_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All shipments (any order's lineitems) falling inside each sampled
    order's 3-day window — a genuine point-in-interval join, not an
    equi-join in disguise.  The interval side is small → after bucket
    explosion it broadcasts; lineitem is scanned once, never shuffled."""
    li = load_table(spark, sf_dir, "lineitem").select("l_shipdate", "l_quantity")
    iv = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 100 == 0)
        .select(
            F.col("o_orderkey").alias("window_key"),
            F.col("o_orderdate").alias("w_start"),
            (F.col("o_orderdate") + F.expr("INTERVAL 3 DAYS")).alias("w_end"),
        )
    )
    joined = bucketed_range_join(
        li, iv, point_ts="l_shipdate", start="w_start", end="w_end",
        broadcast_intervals=True,
    )
    return joined.groupBy("window_key").agg(
        F.count("*").alias("n_shipments"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)"))
        .cast("double")
        .alias("total_qty"),
    )
