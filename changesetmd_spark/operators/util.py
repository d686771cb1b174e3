"""Shared operator plumbing."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame


def fan_out(df: DataFrame, *keys: str | Column) -> DataFrame:
    """Widen a narrow scan to the session parallelism — conditionally.

    The local test corpora are single parquet files, so a scan plans one
    input partition and every downstream projection runs single-threaded
    (measured: a whole shingle pipeline pinned to 1 task, 20 s at sf0.1).
    Repartitioning fixes that — but unconditionally repartitioning a source
    that is ALREADY wide (a 100 TB table scans as thousands of splits) is a
    full shuffle of raw input for nothing.  Widen only when the source is
    narrower than the session's parallelism; otherwise keep the scan's own
    partitioning.
    """
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= parallelism:
        return df
    return df.repartition(parallelism, *keys)
