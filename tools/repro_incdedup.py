#!/usr/bin/env python3
"""Repro: q_stream_incremental_dedup at a scale tier, interleaved width A/B.
Usage: repro_incdedup.py [scale_dir] [width1,width2,...] [rounds]
Widths interleave round-robin so host drift hits all arms equally.
"auto" = unset env (size-derived width)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from changesetmd_spark import get_spark, registry  # noqa: E402

DIR = sys.argv[1] if len(sys.argv) > 1 else "/tmp/changesetmd_scale_x10"
WIDTHS = (sys.argv[2] if len(sys.argv) > 2 else "auto,21,32").split(",")
ROUNDS = int(sys.argv[3]) if len(sys.argv) > 3 else 3
QUERY = os.environ.get("REPRO_QUERY", "q_stream_incremental_dedup")

spark = get_spark(app_name="repro-incdedup")
spark.sparkContext.setLogLevel("ERROR")
qs = registry.queries()

res: dict[str, list[float]] = {w: [] for w in WIDTHS}
for rnd in range(ROUNDS):
    for width in WIDTHS:
        if width == "auto":
            os.environ.pop("SPARK_GRAFT_STREAM_STATE_PARTITIONS", None)
        else:
            os.environ["SPARK_GRAFT_STREAM_STATE_PARTITIONS"] = width
        t0 = time.perf_counter()
        out = qs[QUERY](spark, DIR).collect()
        dt = time.perf_counter() - t0
        res[width].append(dt)
        print(f"round={rnd} width={width}: {dt:.2f}s rows={len(out)}",
              flush=True)
        spark.catalog.clearCache()
for w, ts in res.items():
    print(f"width={w}: min {min(ts):.2f} med {sorted(ts)[len(ts)//2]:.2f}")
