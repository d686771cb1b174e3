"""Probability-proportional-to-size (PPS) systematic sampling
([extension]): draw a fixed-size corpus sample where each document's
inclusion count is proportional to its weight (here ``n_chars`` — a
token-budget proxy), using the classic systematic / fixed-stride rule over
the cumulative weight axis.

Why this and not rand(): training-data pipelines need REPRODUCIBLE samples
("the 100-doc eval slice of snapshot N"), and systematic PPS is the
textbook deterministic design — lay every document end-to-end on a
[0, W) axis (W = total weight), drop ``n`` equally-spaced pins, and a
document is picked once per pin that lands inside its weight segment:

    n_picks(d) = floor(cum_incl(d) * n / W) - floor(cum_excl(d) * n / W)

Everything is BIGINT arithmetic (cum * n never exceeds ~1e16 even at a
100 TB corpus with n = 100), so Spark and DuckDB agree bit-for-bit — no
float stride, no engine RNG.

Scale shape (100 TB): the global cumulative sum is the textbook
SinglePartition window trap; it goes through ``two_phase_prefix``
(operators/twophase.py — range shuffle, per-partition parallel prefix,
bounded driver offsets, broadcast join back), so every stage is parallel
and W itself falls out of the driver subtotals without an extra global
aggregate job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load_table
from .twophase import two_phase_prefix

# Target sample size (pin count). The sample's expected doc count is n
# minus collisions (a doc wider than one stride absorbs several pins —
# reported via n_picks, the true PPS-with-replacement multiplicity).
_PPS_N = 100


@register(
    "q_pps_systematic_sample",
    oracle=f"""
    WITH c AS (
      SELECT doc_id, source, n_chars,
             SUM(n_chars) OVER (ORDER BY doc_id
                                ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(n_chars) OVER () AS w
      FROM documents
    )
    SELECT doc_id, source, n_chars,
           CAST((cum * {_PPS_N}) // w
                - ((cum - n_chars) * {_PPS_N}) // w AS BIGINT) AS n_picks,
           CAST(((cum - n_chars) * {_PPS_N}) // w + 1 AS BIGINT) AS first_pin
    FROM c
    WHERE (cum * {_PPS_N}) // w > ((cum - n_chars) * {_PPS_N}) // w
    """,
)
def q_pps_systematic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted (PPS) systematic sample (n = 100 pins) by
    char-count weight — exact integer pin arithmetic over a two-phase
    parallel prefix sum; see module docstring for the scale argument."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    pre, totals = two_phase_prefix(
        docs,
        group_cols=[],
        order_cols=[F.col("doc_id").asc()],
        values=[("cum_excl", F.col("n_chars"))],
    )
    w = int(totals["cum_excl"][()])
    pin_hi = F.expr(f"(cum_excl + n_chars) * {_PPS_N} div {w}")
    pin_lo = F.expr(f"cum_excl * {_PPS_N} div {w}")
    return (
        pre.withColumn("n_picks", (pin_hi - pin_lo).cast("long"))
        .withColumn("first_pin", (pin_lo + F.lit(1)).cast("long"))
        .filter(F.col("n_picks") > 0)
        .select("doc_id", "source", "n_chars", "n_picks", "first_pin")
    )
