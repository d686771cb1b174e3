#!/usr/bin/env python3
"""Microbench: interpreted HOF fold (F.aggregate over zip_with) vs an
unrolled left-associated codegen chain for the 64-dim dot product — the
guide §4.1 'built-ins with codegen beat interpreted expression trees'
hypothesis, measured before the fleet-wide rewrite.

    PYTHONPATH=. python tools/microbench_fold.py [n_rows]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from changesetmd_spark import get_spark  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
DIM = 64


def main() -> None:
    spark = get_spark(app_name="microbench-fold")
    spark.sparkContext.setLogLevel("ERROR")
    df = (
        spark.range(0, N, 1, 32)
        .select(
            "id",
            F.expr(
                f"transform(sequence(1, {DIM}),"
                f" i -> cast(pmod(xxhash64(id * 100 + i), 1000) as double)"
                f" / 1000.0)"
            ).alias("a"),
            F.expr(
                f"transform(sequence(1, {DIM}),"
                f" i -> cast(pmod(xxhash64(id * 7 + i), 1000) as double)"
                f" / 1000.0)"
            ).alias("b"),
        )
        .localCheckpoint(eager=True)
    )

    def fold_dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    def unrolled_dot(a, b):
        out = F.lit(0.0)
        for i in range(DIM):
            out = out + F.get(a, i) * F.get(b, i)
        return out

    for label, fn in [("fold", fold_dot), ("unrolled", unrolled_dot)]:
        # warm
        df.select(F.sum(fn(F.col("a"), F.col("b")))).collect()
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            r = df.select(F.sum(fn(F.col("a"), F.col("b")))).collect()
            ts.append(time.perf_counter() - t0)
        print(f"{label:9s} min {min(ts):.3f}s  result {r[0][0]:.6f}", flush=True)

    # value-identity check, row by row
    diff = (
        df.select(
            (
                fold_dot(F.col("a"), F.col("b"))
                != unrolled_dot(F.col("a"), F.col("b"))
            ).alias("ne")
        )
        .filter("ne")
        .count()
    )
    print(f"rows where fold != unrolled (exact): {diff}")


if __name__ == "__main__":
    main()
