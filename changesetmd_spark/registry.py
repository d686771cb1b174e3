"""Central query registry backing ``__spark_entry__.queries()`` /
``oracle_sql()``.

Every operator from SURVEY.md §2 lands here as a named builder
``(spark, sf_dir) -> DataFrame`` plus (when SQL-expressible) a DuckDB oracle
string over the pre-registered views.  The driver hash-compares the two at
sf0.01, so builders must be **value-deterministic**: exact decimal aggregation
for money columns, explicit rounding for derived doubles, timestamps emitted
as formatted strings, deterministic tie-breaks before any LIMIT.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a query builder and its optional DuckDB oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


# WITNESSED_ROUNDS — the external-verification ledger (ADVICE r6 high;
# VERDICT r6 #1/#6).  For every registered query: the rounds whose driver
# CORRECTNESS_r{N}.json passed its strongest applicable check — hash_match
# for oracled rows; a clean rows-only run for the oracle-less ones.  A row
# whose hash comparison FAILED never counts, even if its row count matched.
# The ledger is regenerated each round from the driver's own output files
# by ``tools/update_witnessed.py`` (run with --check to verify) — it
# records facts, not preferences.
#
# Query ordering is a single rule derived from it: LEAST-RECENTLY
# EXTERNALLY VERIFIED FIRST (never-verified queries lead, in registration
# order; ties broken by registration order).  The external gate budgets a
# fixed number of checks per round, so this order maximizes how quickly
# every query accumulates an external witness and guarantees that NEWLY
# REGISTERED queries enter the checked set before anything already verified
# — new code can never hide behind old green rows.  The previous hand-tuned
# priority list is gone; there is nothing to tune — landing a new query or
# a new driver round updates the order mechanically.
WITNESSED_ROUNDS: dict[str, tuple[int, ...]] = {
    "q1_pricing_summary": (1, 2, 3, 4, 5, 6),
    "q3_top_revenue_orders": (1, 2, 3, 4, 5, 6),
    "q5_revenue_by_nation": (1, 2, 3, 4, 5, 6),
    "q_ann_verify_rerank": (6,),
    "q_anti_join_dormant_customers": (1, 2, 3, 4, 5, 6),
    "q_asof_purchase_last_view": (1, 2, 3, 4, 6),
    "q_bbox_area_filter": (2, 3, 4, 5),
    "q_bbox_area_topk": (1, 2, 3, 4, 5, 6),
    "q_bbox_containment": (1, 2, 3, 4, 5, 6),
    "q_bigram_lm_fluency": (7,),
    "q_bm25_keyword_search": (2, 3, 4, 5),
    "q_cdc_chunk_dedup": (7,),
    "q_changeset_comments_explode": (1, 2, 3, 4, 5, 6),
    "q_changeset_ingest_normalize": (1, 2, 3, 4, 5, 6),
    "q_changeset_join_comments": (1, 2, 3, 4, 5, 6),
    "q_cohort_retention": (7,),
    "q_contamination_ngram_overlap": (5,),
    "q_cube_order_status_priority": (1, 2, 3, 4, 5, 6),
    "q_dedup_exact": (1, 2, 3, 4, 5, 6),
    "q_dedup_exact_counts": (1, 2, 3, 4, 5, 7),
    "q_dedup_groups": (2, 3, 4, 5, 6),
    "q_distinct_counts": (1, 2, 3, 4, 5, 6),
    "q_dsir_importance_weights": (7,),
    "q_duplicate_substring_spans": (7,),
    "q_embedding_ann_checked": (6,),
    "q_embedding_ann_ivf": (1, 7),
    "q_embedding_ann_lsh": (1, 7),
    "q_embedding_centroid_per_label": (1, 2, 3, 4, 7),
    "q_embedding_neardup_cosine": (1, 7),
    "q_embedding_pca_power": (7,),
    "q_embedding_topk_cosine": (1, 2, 3, 4, 7),
    "q_funnel_conversion": (7,),
    "q_grouping_sets_order_stats": (1, 2, 3, 4, 6),
    "q_heavy_hitter_terms": (7,),
    "q_intersect_segments": (1, 2, 3, 4, 5),
    "q_item_cooccurrence": (7,),
    "q_json_typed_extract": (6,),
    "q_kmeans_assign_update": (7,),
    "q_like_part_types": (2, 3, 4, 7),
    "q_line_dedup_c4": (7,),
    "q_map_explode_tag_histogram": (6,),
    "q_map_key_existence": (1, 6),
    "q_map_value_extract": (6,),
    "q_map_value_like": (6,),
    "q_media_shard_manifest": (7,),
    "q_minhash_lsh_candidates": (1, 2, 3, 4, 5, 7),
    "q_minhash_lsh_checked": (5, 6),
    "q_multimodal_byte_stats": (2, 3, 4, 5),
    "q_multimodal_decode": (1, 2, 3, 4, 5),
    "q_neardup_verify_jaccard": (2, 3, 4, 5, 7),
    "q_ngram_jaccard_pairs": (1, 2, 3, 4, 5, 7),
    "q_ngram_novelty": (7,),
    "q_orders_per_month": (1, 2, 3, 4, 7),
    "q_outer_join_order_counts": (1, 2, 3, 4, 5, 6),
    "q_pagerank_items": (7,),
    "q_pipeline_curate_end_to_end": (5, 6),
    "q_pivot_status_by_priority": (1, 2, 3, 4, 6),
    "q_rag_chunk_overlap": (7,),
    "q_range_join_shipments_in_window": (1, 2, 3, 4, 5, 6),
    "q_readme_count_comment_tag": (2, 3, 4, 5, 6),
    "q_readme_count_created_by_josm": (2, 3, 4, 5, 7),
    "q_readme_envelope_containment": (2, 3, 4, 5, 6),
    "q_rollup_nation_segment": (1, 2, 3, 4, 5, 6),
    "q_salted_join_skewed_types": (1, 7),
    "q_semdedup_clustered": (7,),
    "q_semi_join_active_customers": (1, 2, 3, 4, 5, 6),
    "q_sequence_packing": (7,),
    "q_series_ewma": (7,),
    "q_series_linear_trend": (7,),
    "q_set_ops_customer_cohorts": (1, 2, 3, 4, 5, 6),
    "q_simhash_checked": (5, 6),
    "q_simhash_near_dup": (1, 2, 3, 4, 5, 7),
    "q_sketch_cardinality_and_quantiles": (1, 7),
    "q_source_mixture_weights": (5,),
    "q_source_quota_sample": (2, 3, 4, 5),
    "q_stream_dedup_first_seen": (6,),
    "q_stream_purchase_attribution": (6,),
    "q_stream_rollup_hourly": (6,),
    "q_stream_session_windows": (6,),
    "q_stream_sliding_2h_1h": (6,),
    "q_stream_stateful_user_totals": (6,),
    "q_stream_tumbling_hourly": (6,),
    "q_temperature_mixture": (7,),
    "q_text_blocklist_scrub": (5,),
    "q_text_fingerprint": (1, 2, 3, 4, 5, 7),
    "q_text_lang_id_confusion": (1, 2, 3, 4, 5, 7),
    "q_text_quality": (1, 2, 3, 4, 5, 6),
    "q_text_quality_by_source": (1, 2, 3, 4, 5, 7),
    "q_text_repetition_quality": (5,),
    "q_text_token_budget_by_source": (5, 7),
    "q_text_token_stats": (2, 3, 4, 5, 7),
    "q_tfidf_top_terms": (2, 3, 4, 5),
    "q_time_gapfill_interpolate": (7,),
    "q_time_gapfill_locf": (7,),
    "q_token_len_histogram": (7,),
    "q_train_test_split": (2, 3, 4, 5),
    "q_triangle_count": (7,),
    "q_txn_merge_snapshot": (6,),
    "q_type_transition_matrix": (7,),
    "q_unigram_prob_mass": (7,),
    "q_unpivot_quantity_price": (1, 2, 3, 4, 7),
    "q_upsert_last_write_wins": (1, 2, 3, 4, 5, 6),
    "q_user_value_deciles": (7,),
    "q_value_mad_outliers": (7,),
    "q_value_percentiles_per_type": (1, 6),
    "q_window_running_total": (1, 2, 3, 4, 5, 6),
    "q_window_session_per_user": (6,),
    "q_window_sliding": (6,),
    "q_window_topk_orders_per_customer": (1, 2, 3, 4, 5, 6),
    "q_window_trailing_hour_sum": (6,),
    "q_window_tumbling_hourly": (6,),
    "q_winnowed_fingerprints": (7,),
}


def _window_ordered(d: dict) -> dict:
    """Return ``d`` ordered least-recently-externally-verified first
    (never-verified queries lead); registration order breaks ties.  The
    sort is stable, so equal last-witnessed rounds keep their relative
    registration order."""
    names = sorted(
        d, key=lambda n: max(WITNESSED_ROUNDS.get(n, ()), default=0)
    )
    return {n: d[n] for n in names}


def _load_all() -> None:
    # import for registration side effects; keep cheap (no Spark work at import)
    from .operators import (  # noqa: F401
        bloomjoin,
        changesets,
        cooccurrence,
        corpus,
        curation,
        dedup,
        geometry,
        layout,
        multimodal,
        rangejoin,
        relational,
        similarity,
        sketches,
        skew,
        tags_json,
        text,
        txn,
        windows_batch,
    )
    from .streaming import events_stream, joins, rollup, stateful  # noqa: F401


def queries() -> dict[str, QueryFn]:
    _load_all()
    return _window_ordered(_QUERIES)


def oracles() -> dict[str, str]:
    _load_all()
    return _window_ordered(_ORACLES)
