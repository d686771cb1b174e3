"""Physical-plan inspection (SURVEY.md §4).

The reference's physical design is index DDL read by the Postgres planner
(ref queries.py:41-56); ours is whatever Catalyst emits — so plan *quality*
is a testable property: filters must reach the parquet scan (the btree
replacement), dimension joins must broadcast (the small-side hash join the
reference gets from Postgres), scans must prune columns (heap tables can't),
and the hot path must stay inside whole-stage codegen.

These helpers parse ``explain("formatted")`` output so pytest can regress
plan shape, not just row values — a query that silently loses pushdown still
returns correct rows; it just stops scaling.
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def pushed_filters(df: DataFrame) -> list[str]:
    """All non-empty PushedFilters entries across the plan's file scans."""
    plan = explain_str(df)
    out = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        entry = m.group(1).strip()
        if entry:
            out.append(entry)
    return out


def read_schema_columns(df: DataFrame) -> list[set[str]]:
    """Column sets actually read by each parquet scan (column pruning)."""
    plan = explain_str(df)
    schemas = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        cols = {
            c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()
        }
        schemas.append(cols)
    return schemas


def partition_filters(df: DataFrame) -> list[str]:
    """Non-empty PartitionFilters entries — predicates resolved against the
    partition directory layout, pruning whole partitions before any file
    is opened (the created_idx replacement, SURVEY §4.2)."""
    plan = explain_str(df)
    out = []
    for m in re.finditer(r"PartitionFilters: \[([^\]]*)\]", plan):
        entry = m.group(1).strip()
        if entry:
            out.append(entry)
    return out


def has_broadcast_join(df: DataFrame) -> bool:
    plan = explain_str(df)
    return "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def shuffle_count(df: DataFrame) -> int:
    """Number of exchange operators (each is a full shuffle of its input).
    Counts only the node-detail headers (``(4) Exchange``) so tree lines
    aren't double-counted; broadcast exchanges are not shuffles."""
    plan = explain_str(df)
    n = 0
    for m in re.finditer(r"^\(\d+\) Exchange\n(.*)", plan, re.MULTILINE):
        if "SinglePartition" not in m.group(1):
            n += 1
    return n


def wholestage_codegen_spans(df: DataFrame) -> int:
    """Count of fused codegen subtrees (``explain("codegen")``); with AQE the
    formatted plan hides codegen markers, so ask the codegen printer."""
    plan = explain_str(df, mode="codegen")
    m = re.search(r"Found (\d+) WholeStageCodegen subtrees", plan)
    return int(m.group(1)) if m else 0


def codegen_spans_noaqe(spark, build, *args) -> int:
    """Codegen count with AQE momentarily off: an un-executed
    AdaptiveSparkPlan reports 0 subtrees because fusion happens per-stage at
    runtime; disabling AQE for the plan build exposes the static fusion the
    stages will get."""
    prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        return wholestage_codegen_spans(build(*args))
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)
