"""Skew-mitigation operators (SURVEY.md §4 scale notes).

When one join key carries a disproportionate share of rows, the task owning
that key's shuffle partition becomes the straggler.  AQE's skew-join
splitting (on in this engine's sessions) handles sort-merge joins; *salting*
is the explicit, planner-independent fallback — and the only option for
stateful/windowed operators AQE can't rewrite:

  fact side:  key → (key, salt)   with salt = hash(row) mod S
  dim  side:  key → S replicas    (key, 0..S-1)
  join on (key, salt): the hot key's rows spread across S tasks.

``salted_join`` packages that rewrite.  Salt derives from ``xxhash64`` of
the fact row's columns — deterministic (safe under task retry), no RNG.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load_table


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``fact ⋈ dim`` on ``on`` with the fact side salted S ways
    and the dim side exploded S ways.  Result is row-identical to the plain
    join (every fact row still meets every matching dim row exactly once —
    at precisely one salt value); only the shuffle distribution changes.
    Use when ``dim`` is too big to broadcast AND ``on`` is skewed."""
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(n_salts))
    fact_s = fact.withColumn("_salt", salt)
    dim_s = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return fact_s.join(dim_s, [on, "_salt"], how).drop("_salt")


@register(
    "q_salted_join_skewed_types",
    oracle="""
    WITH dim AS (
      SELECT event_type, COUNT(*) AS type_total
      FROM events GROUP BY event_type
    )
    SELECT e.event_type,
           COUNT(*) AS n_events,
           MAX(d.type_total) AS type_total,
           CAST(ROUND(SUM(CAST(e.value AS DECIMAL(18,2))), 2) AS DOUBLE)
             AS sum_value
    FROM events e JOIN dim d ON e.event_type = d.event_type
    GROUP BY e.event_type
    """,
)
def q_salted_join_skewed_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pathologically skewed join demonstrated end-to-end: ``event_type``
    has ~5 distinct values over the whole events table, so a plain shuffle
    join degenerates to 5 working tasks.  The salted rewrite spreads each
    type across 16 salt lanes; results hash-match the plain-join oracle."""
    ev = load_table(spark, sf_dir, "events")
    dim = ev.groupBy("event_type").agg(F.count("*").alias("type_total"))
    joined = salted_join(ev.select("event_type", "value"), dim, on="event_type")
    return joined.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.max("type_total").alias("type_total"),
        F.round(F.sum(F.col("value").cast("decimal(18,2)")), 2)
        .cast("double")
        .alias("sum_value"),
    )
