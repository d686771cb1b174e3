#!/usr/bin/env python3
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is fully materialized (count + collect of the final result) so the
measured time covers scan → shuffle → aggregate, not just plan construction.
A warmup pass on a tiny query absorbs JVM/codegen startup so per-query times
reflect steady-state executor throughput.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from changesetmd_spark import get_spark  # noqa: E402
from changesetmd_spark import registry  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# headline set: one per operator family (scan+agg, star join, top-k join,
# window, session, map/json, dedup, minhash-lsh, similarity, text)
HEADLINE = [
    "q1_pricing_summary",
    "q5_revenue_by_nation",
    "q3_top_revenue_orders",
    "q_window_topk_orders_per_customer",
    "q_window_session_per_user",
    "q_map_value_extract",
    "q_dedup_exact",
    "q_minhash_lsh_candidates",
    "q_embedding_topk_cosine",
    "q_text_token_stats",
]


def sf_from_dir(path: str) -> float:
    m = re.search(r"sf([0-9.]+)", path)
    return float(m.group(1)) if m else -1.0


def main() -> None:
    spark = get_spark(app_name="changesetmd-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()

    # warmup: start executors + codegen on a trivial plan
    qs["q_distinct_counts"](spark, SF_DIR).collect()

    times: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.perf_counter()
        rows = qs[name](spark, SF_DIR).collect()
        times[name] = round(time.perf_counter() - t0, 3)
        assert rows is not None

    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf_from_dir(SF_DIR),
            }
        )
    )


if __name__ == "__main__":
    main()
