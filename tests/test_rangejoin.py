"""Bucketed range join equivalence: the bucket acceleration must be
invisible — identical matches to the naive inequality join, including
intervals that straddle bucket boundaries and points at interval edges."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from changesetmd_spark.operators.rangejoin import _BUCKET_SECONDS, bucketed_range_join


def test_bucketed_equals_naive(spark):
    base = datetime.datetime(2024, 1, 1)
    # intervals placed to straddle bucket boundaries (bucket = 4 days)
    intervals = spark.createDataFrame(
        [
            (1, base + datetime.timedelta(days=3), base + datetime.timedelta(days=6)),
            (2, base, base + datetime.timedelta(days=2)),
            (3, base + datetime.timedelta(days=7, hours=23), base + datetime.timedelta(days=8, hours=1)),
        ],
        "k long, s timestamp, e timestamp",
    )
    points = spark.createDataFrame(
        [(i, base + datetime.timedelta(hours=6 * i)) for i in range(40)],
        "pid long, ts timestamp",
    )
    fast = {
        (r.pid, r.k)
        for r in bucketed_range_join(points, intervals, "ts", "s", "e").collect()
    }
    naive = {
        (r.pid, r.k)
        for r in points.join(
            intervals, (F.col("ts") >= F.col("s")) & (F.col("ts") < F.col("e"))
        ).collect()
    }
    assert fast == naive and fast  # identical, and non-empty
    # boundary semantics: start inclusive, end exclusive
    start_hits = {(p, k) for p, k in naive if p == 12}  # ts == interval 1 start
    assert start_hits == {(12, 1)}


def test_interval_longer_than_bucket_spans_all_buckets(spark):
    base = datetime.datetime(2024, 1, 1)
    long_iv = spark.createDataFrame(
        [(9, base, base + datetime.timedelta(seconds=3 * _BUCKET_SECONDS))],
        "k long, s timestamp, e timestamp",
    )
    points = spark.createDataFrame(
        [(i, base + datetime.timedelta(seconds=i * _BUCKET_SECONDS // 2)) for i in range(8)],
        "pid long, ts timestamp",
    )
    fast = {
        r.pid for r in bucketed_range_join(points, long_iv, "ts", "s", "e").collect()
    }
    assert fast == {0, 1, 2, 3, 4, 5}  # everything strictly inside [s, e)
