"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real implementations live in the ``changesetmd_spark`` package; this
module only adapts its registry to the driver's interface.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from changesetmd_spark import registry

SF0001_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Multi-way broadcast star join + exact decimal aggregation
    (changesetmd_spark.operators.relational.q5_revenue_by_nation).
    """
    return registry.queries()["q5_revenue_by_nation"](spark, SF0001_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every hash-checkable query; entries without
    SQL-expressible semantics (xxhash64-based MinHash/SimHash, the
    mapInPandas decode stub, LSH ANN) are omitted → rows-only check."""
    return registry.oracles()
