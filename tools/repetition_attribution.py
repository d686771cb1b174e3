#!/usr/bin/env python3
"""Attribution harness for q_text_repetition_quality's 300x scale row
(VERDICT r15 next-round #5): slice the pipeline into cumulative stages and
time each at the replica tier, so the superlinear-looking term is measured
rather than guessed.  Stages:

  s0_scan        raw text scan + trim/lower (count only)
  s1_tokenize    split into toks, size() forced (count of filtered docs)
  s2_explode     bigram transform + explode (count of gram rows)
  s3_agg1        (doc_id, gram) hash aggregate (count of distinct pairs)
  s4_full        the shipped query (collect)
  s5_full_wire   the wire-optimal arm (collect)
  s6_hash_arm    EXPERIMENT: xxhash64(gram) as the first agg key

Usage: python tools/repetition_attribution.py [SF_DIR] (default the x300
replica dir).  Prints one JSON line per stage.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from changesetmd_spark import get_spark, registry  # noqa: E402
from changesetmd_spark.operators.util import fan_out  # noqa: E402
from changesetmd_spark.tables import load_table  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/tmp/changesetmd_scale_x300"


def timed(label: str, thunk) -> None:
    samples = []
    for _ in range(2):
        t0 = time.perf_counter()
        out = thunk()
        samples.append(round(time.perf_counter() - t0, 2))
    print(json.dumps({"stage": label, "sec": samples, "result": out}))
    sys.stdout.flush()


def main() -> None:
    spark = get_spark(app_name="repetition-attribution")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()

    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - 1),
        lambda i: F.concat_ws(
            " ", F.element_at(toks, i), F.element_at(toks, i + 1)
        ),
    )

    def src():
        return fan_out(load_table(spark, SF_DIR, "documents"), "doc_id")

    timed("s0_scan", lambda: src().select("doc_id", F.length(F.trim(F.col("text"))).alias("l")).agg(F.sum("l")).collect()[0][0])
    timed("s1_tokenize", lambda: src().filter(F.size(toks) >= 2).count())
    timed(
        "s2_explode",
        lambda: src()
        .filter(F.size(toks) >= 2)
        .select("doc_id", F.explode(grams).alias("gram"))
        .count(),
    )
    timed(
        "s3_agg1",
        lambda: src()
        .filter(F.size(toks) >= 2)
        .select("doc_id", F.explode(grams).alias("gram"))
        .groupBy("doc_id", "gram")
        .agg(F.count("*").alias("c"))
        .count(),
    )
    timed(
        "s4_full",
        lambda: len(qs["q_text_repetition_quality"](spark, SF_DIR).collect()),
    )
    spark.catalog.clearCache()
    try:
        spark.conf.set("spark.changesetmd.repetition.wireOptimal", "true")
        timed(
            "s5_full_wire",
            lambda: len(
                qs["q_text_repetition_quality"](spark, SF_DIR).collect()
            ),
        )
    finally:
        spark.conf.unset("spark.changesetmd.repetition.wireOptimal")
    spark.catalog.clearCache()

    # experiment: hash the gram to a long before the first exchange
    def hash_arm():
        docs = (
            src()
            .filter(F.size(toks) >= 2)
            .select("doc_id", F.explode(grams).alias("gram"))
            .select("doc_id", F.xxhash64("gram").alias("g"))
        )
        counted = docs.groupBy("doc_id", "g").agg(F.count("*").alias("c"))
        frac = F.max("c") * 1.0 / F.sum("c")
        return counted.groupBy("doc_id").agg(
            F.sum("c").alias("n_bigrams"),
            F.max("c").alias("top_bigram_count"),
            F.round(frac, 6).alias("top_bigram_frac"),
            (frac > 0.05).alias("is_repetitive"),
        ).count()

    timed("s6_hash_arm", hash_arm)


if __name__ == "__main__":
    main()
