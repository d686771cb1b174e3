"""Quantile + cardinality sketch operators (SURVEY.md §2.4 A4 and the
north-star "novel sketch" custom-operator family).

Two tiers, mirroring the engine-wide exact/approximate split:

* exact — ``F.percentile`` (Spark 4's exact interpolated percentile) is
  hash-checkable against DuckDB's ``quantile_cont``: both compute the same
  type-7 linear interpolation, so values match bit-for-bit at any SF.
* approximate — HyperLogLog++ (``approx_count_distinct``) and KLL-style
  ``percentile_approx`` are the 100 TB path (bounded memory, one pass,
  mergeable partial sketches — exactly what a 1000-executor aggregation
  needs).  Sketch outputs are algorithm-specific, so no SQL oracle; pytest
  pins them inside their documented error bounds against the exact answers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load_table


@register(
    "q_value_percentiles_per_type",
    oracle="""
    SELECT event_type,
           ROUND(quantile_cont(value, 0.5), 4)  AS p50,
           ROUND(quantile_cont(value, 0.9), 4)  AS p90,
           ROUND(quantile_cont(value, 0.99), 4) AS p99,
           COUNT(*) AS n
    FROM events
    GROUP BY event_type
    """,
)
def q_value_percentiles_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group — one shuffle on the group
    key; per-group sort happens inside the aggregate buffer."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.5)), 4).alias("p50"),
        F.round(F.percentile("value", F.lit(0.9)), 4).alias("p90"),
        F.round(F.percentile("value", F.lit(0.99)), 4).alias("p99"),
        F.count("*").alias("n"),
    )


@register("q_sketch_cardinality_and_quantiles")  # no oracle: sketch outputs
def q_sketch_cardinality_and_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scale path: HLL++ distinct users + approximate quantiles per
    event type, single pass, mergeable partials — error bounds pinned
    against the exact answers in tests/test_sketches.py."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
        F.percentile_approx("value", F.lit(0.5), F.lit(10000)).alias("p50_approx"),
        F.percentile_approx("value", F.lit(0.99), F.lit(10000)).alias("p99_approx"),
    )
