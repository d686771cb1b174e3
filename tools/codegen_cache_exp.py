#!/usr/bin/env python3
"""Codegen-cache pressure experiment (VERDICT r17 #9).

Hypothesis from r17's "left alone" #5: across a 254-query gauntlet the
JVM's bounded generated-code cache (`spark.sql.codegen.cache.maxEntries`,
default 100) thrashes, so codegen-heavy queries recompile their generated
classes on every bench sample (q_embedding_neardup_cosine ~2.6-3.5 s in
the gauntlet vs ~1.0 s steady-state).  This driver runs a fixed 24-query
codegen-heavy block TWICE in one session (second pass = the "warm
gauntlet revisit" the bench's 3 samples approximate) under the cache size
given in SPARK_GRAFT_CODEGEN_CACHE (the conf is read once when the first
query compiles, so each size needs a fresh JVM):

    SPARK_GRAFT_CODEGEN_CACHE=100  python tools/codegen_cache_exp.py
    SPARK_GRAFT_CODEGEN_CACHE=5000 python tools/codegen_cache_exp.py

Prints one JSON line per run; compare `second_pass_total`.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from changesetmd_spark import get_spark, registry  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CACHE = os.environ.get("SPARK_GRAFT_CODEGEN_CACHE", "100")

# codegen-heavy, moderately expensive block: similarity folds, wide
# aggregates, windows — the shapes whose generated classes are large
QUERIES = [
    "q_embedding_neardup_cosine",
    "q_embedding_topk_cosine",
    "q_simhash_near_dup",
    "q_simhash_checked",
    "q_minhash_lsh_candidates",
    "q_ngram_jaccard_pairs",
    "q_embedding_pq_adc",
    "q_kmeans_assign_update",
    "q_semdedup_clustered",
    "q_winnowed_fingerprints",
    "q_fellegi_sunter_scores",
    "q_fuzzy_name_pairs",
    "q_bm25_keyword_search",
    "q_tfidf_top_terms",
    "q_quality_classifier_train_step",
    "q_brier_decomposition",
    "q_chi2_independence",
    "q_spearman_hourly_correlation",
    "q_kendall_tau_hourly",
    "q_grouping_sets_order_stats",
    "q_cube_order_status_priority",
    "q_text_repetition_quality",
    "q_countmin_sketch_only",
    "q_calibration_ece_bins",
]


def main() -> None:
    spark = get_spark(
        app_name=f"codegen-cache-{CACHE}",
        extra_conf={
            "spark.sql.codegen.cache.maxEntries": CACHE,
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()
    qs["q_distinct_counts"](spark, SF_DIR).collect()
    passes = []
    for _ in range(2):
        per = {}
        for name in QUERIES:
            t0 = time.perf_counter()
            qs[name](spark, SF_DIR).collect()
            per[name] = round(time.perf_counter() - t0, 3)
            spark.catalog.clearCache()
        passes.append(per)
    print(
        json.dumps(
            {
                "cache_max_entries": CACHE,
                "first_pass_total": round(sum(passes[0].values()), 2),
                "second_pass_total": round(sum(passes[1].values()), 2),
                "second_pass": passes[1],
            }
        )
    )


if __name__ == "__main__":
    main()
