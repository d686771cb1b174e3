"""Shared operator plumbing."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as _F


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


def materialize_releasing(out: DataFrame, *frames: DataFrame) -> DataFrame:
    """Eagerly materialize ``out`` (localCheckpoint), then unpersist the
    cached intermediates it was computed from — the release discipline for
    query-scope persists: a registered builder returns before the driver
    collects, so a bare ``persist`` would outlive its query and evict live
    caches across a bench gauntlet (VERDICT r6 #5).  One shared helper so
    the idiom cannot drift across its many call sites."""
    result = out.localCheckpoint(eager=True)
    for f in frames:
        f.unpersist()
    return result


def drop_oversized_groups(df: DataFrame, key: str, cap: int) -> DataFrame:
    """Remove every row whose ``key`` group exceeds ``cap`` rows — the
    degenerate-key guard every bucketed self-join needs (boilerplate
    shingles, hot LSH buckets, dirty SimHash bands).

    Shaped as a skinny aggregate + anti-join on purpose: the equivalent
    ``count(*) OVER (PARTITION BY key)`` window forces a full SORT of the
    postings, while the aggregate is hash-based with map-side combine and
    its (tiny) oversized-key list anti-joins on the very exchange the
    downstream self-join needs anyway."""
    oversized = (
        df.groupBy(key)
        .agg(_F.count("*").alias("_n"))
        .filter(_F.col("_n") > cap)
        .select(key)
    )
    return df.join(oversized, key, "left_anti")
