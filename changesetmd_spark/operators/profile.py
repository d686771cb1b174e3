"""Table profiling / statistics collection (SURVEY §2.4 extension — the
``ANALYZE TABLE … COMPUTE STATISTICS FOR COLUMNS`` pass every warehouse
runs before letting a CBO near 100 TB).

The reference leans on Postgres' own ANALYZE for its planner statistics;
a lakehouse engine materializes the same per-column profile explicitly:
row count, null count, exact distinct cardinality, min/max rendered
through deterministic casts.  One output row per column, so the whole
profile is a single hash-checkable frame.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load_table

# (column, spark min/max projection, duckdb min/max projection) — numeric
# doubles go through DECIMAL(18,2) and timestamps through DATE so the
# string rendering of min/max is identical across engines
_PROFILE_COLS: list[tuple[str, str]] = [
    ("o_orderkey", "o_orderkey"),
    ("o_custkey", "o_custkey"),
    ("o_orderstatus", "o_orderstatus"),
    ("o_totalprice", "CAST(o_totalprice AS DECIMAL(18,2))"),
    ("o_orderdate", "CAST(o_orderdate AS DATE)"),
    ("o_orderpriority", "o_orderpriority"),
]


def _profile_oracle() -> str:
    parts = []
    for name, proj in _PROFILE_COLS:
        parts.append(
            f"""
    SELECT '{name}' AS col_name,
           COUNT(*) AS n_rows,
           CAST(SUM(CASE WHEN {name} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_null,
           COUNT(DISTINCT {name}) AS n_distinct,
           CAST(MIN({proj}) AS VARCHAR) AS min_val,
           CAST(MAX({proj}) AS VARCHAR) AS max_val
    FROM orders"""
        )
    return "\nUNION ALL\n".join(parts)


@register("q_table_profile", oracle=_profile_oracle())
def q_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column statistics profile of ``orders``: row count, null count,
    EXACT distinct cardinality, and min/max through deterministic casts —
    the planner-statistics pass (ANALYZE) as an explicit query.

    Scale shape: one aggregate per column, each scanning ONLY its own
    column (columnar pruning makes the per-column union cheaper at 100 TB
    than a single Expand-based multi-distinct pass, which would widen
    every row ×{len(_PROFILE_COLS)} through one shuffle); the per-column
    aggregates run as independent small jobs unioned at the end.  Exact
    COUNT(DISTINCT) is the referee tier; the one-pass production variant
    is ``approx_count_distinct`` (HLL++, see sketches.py) with the same
    frame shape."""
    t = load_table(spark, sf_dir, "orders")
    frames = []
    for name, _ in _PROFILE_COLS:
        col = F.col(name)
        proj: Column
        if name == "o_totalprice":
            proj = col.cast("decimal(18,2)")
        elif name == "o_orderdate":
            proj = col.cast("date")
        else:
            proj = col
        frames.append(
            t.agg(
                F.lit(name).alias("col_name"),
                F.count("*").alias("n_rows"),
                F.sum(F.when(col.isNull(), 1).otherwise(0))
                .cast("long")
                .alias("n_null"),
                F.count_distinct(col).alias("n_distinct"),
                F.min(proj).cast("string").alias("min_val"),
                F.max(proj).cast("string").alias("max_val"),
            )
        )
    out = frames[0]
    for fr in frames[1:]:
        out = out.unionByName(fr)
    return out
