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


# ---------------------------------------------------------------------------
# r16: declarative data-quality expectations audit (the Great-Expectations
# shape): each expectation is a violation COUNT per source, so the report
# is actionable (which source, which rule, how many rows).
# ---------------------------------------------------------------------------
@register(
    "q_data_quality_expectations",
    oracle=r"""
    WITH checks AS (
      SELECT source,
             CASE WHEN text IS NULL OR lang IS NULL THEN 1 ELSE 0 END
               AS v_null,
             CASE WHEN n_chars <> length(text) THEN 1 ELSE 0 END
               AS v_chars,
             CASE WHEN len(regexp_extract_all(text, '\S+')) = 0 THEN 1
                  ELSE 0 END AS v_blank,
             CASE WHEN lang NOT IN ('en', 'de', 'es', 'fr', 'zh') THEN 1
                  ELSE 0 END AS v_lang,
             CASE WHEN n_chars < 0 THEN 1 ELSE 0 END AS v_range,
             doc_id
      FROM documents
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(*) - COUNT(DISTINCT doc_id) AS BIGINT) AS dup_doc_ids,
           CAST(SUM(v_null) AS BIGINT) AS null_violations,
           CAST(SUM(v_chars) AS BIGINT) AS n_chars_mismatches,
           CAST(SUM(v_blank) AS BIGINT) AS blank_docs,
           CAST(SUM(v_lang) AS BIGINT) AS lang_domain_violations,
           CAST(SUM(v_range) AS BIGINT) AS range_violations,
           (COUNT(*) - COUNT(DISTINCT doc_id)) + SUM(v_null) + SUM(v_chars)
             + SUM(v_blank) + SUM(v_lang) + SUM(v_range) = 0
             AS all_expectations_pass
    FROM checks
    GROUP BY source
    ORDER BY source
    """,
)
def q_data_quality_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative expectations audit over ``documents`` — the
    contract-check a pipeline runs before admitting a snapshot: metadata
    consistency (n_chars must equal the text's codepoint length), key
    uniqueness (doc_id), completeness (no null text/lang), non-blank
    content (at least one \\S+ token), domain membership (lang in the
    supported set), and range sanity (n_chars >= 0) — each reported as a
    per-source violation COUNT plus a rollup pass flag, the
    Great-Expectations report shape.

    Scale shape: every check is a scan-fused boolean; one hash aggregate
    on the ~20 source keys (the distinct-doc_id count shuffles (source,
    doc_id) partials map-side).  Scan-bound; no joins."""
    d = load_table(spark, sf_dir, "documents")
    v_null = F.when(
        F.col("text").isNull() | F.col("lang").isNull(), 1
    ).otherwise(0)
    v_chars = F.when(F.col("n_chars") != F.length("text"), 1).otherwise(0)
    v_blank = F.when(
        F.regexp_count(F.col("text"), F.lit(r"\S+")) == 0, 1
    ).otherwise(0)
    v_lang = F.when(
        ~F.col("lang").isin("en", "de", "es", "fr", "zh"), 1
    ).otherwise(0)
    v_range = F.when(F.col("n_chars") < 0, 1).otherwise(0)
    checks = d.select(
        "source",
        "doc_id",
        v_null.alias("v_null"),
        v_chars.alias("v_chars"),
        v_blank.alias("v_blank"),
        v_lang.alias("v_lang"),
        v_range.alias("v_range"),
    )
    g = checks.groupBy("source").agg(
        F.count("*").alias("n_rows"),
        (F.count("*") - F.count_distinct("doc_id")).alias("dup_doc_ids"),
        F.sum("v_null").alias("null_violations"),
        F.sum("v_chars").alias("n_chars_mismatches"),
        F.sum("v_blank").alias("blank_docs"),
        F.sum("v_lang").alias("lang_domain_violations"),
        F.sum("v_range").alias("range_violations"),
    )
    total_v = (
        F.col("dup_doc_ids")
        + F.col("null_violations")
        + F.col("n_chars_mismatches")
        + F.col("blank_docs")
        + F.col("lang_domain_violations")
        + F.col("range_violations")
    )
    return g.select(
        "source",
        "n_rows",
        "dup_doc_ids",
        "null_violations",
        "n_chars_mismatches",
        "blank_docs",
        "lang_domain_violations",
        "range_violations",
        (total_v == 0).alias("all_expectations_pass"),
    ).orderBy("source")
