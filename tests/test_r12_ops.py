"""Referee tests for the round-12 operators: the advisor→salted-join loop
(VERDICT r11 #6) invariants the DuckDB hash can't express — lane spread and
exact row-identity with the plain join."""

from __future__ import annotations

from pyspark.sql import functions as F

from changesetmd_spark.operators.skew import (
    _SKEW_TARGET_ROWS,
    salted_join,
)
from changesetmd_spark.tables import load_table


def test_advised_salt_spreads_hot_key_and_preserves_rows(spark, sf_dir):
    """Feeding the advisor's S into salted_join must (a) keep the joined
    row multiset identical to the plain join and (b) actually spread the
    hottest key across all S salt lanes with no lane above the advisor's
    per-bucket target (within hash-uniformity slack)."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    counts = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("type_total")
    )
    max_n = counts.agg(F.max("type_total")).first()[0]
    s = max(1, (int(max_n) + _SKEW_TARGET_ROWS - 1) // _SKEW_TARGET_ROWS)

    plain = (
        ev.join(counts, "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("sv"),
        )
    )
    salted = (
        salted_join(ev, counts, on="event_type", n_salts=s)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("sv"),
        )
    )
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )

    if s > 1:
        # lane spread on the hottest key: every salt lane populated, and no
        # (key, salt) bucket above 2x the uniform share (hash slack)
        hot = counts.orderBy(F.desc("type_total")).first()
        salt = F.pmod(F.xxhash64("event_type", "value"), F.lit(s))
        lanes = (
            ev.filter(F.col("event_type") == hot.event_type)
            .select(salt.alias("salt"))
            .groupBy("salt")
            .count()
            .collect()
        )
        assert len(lanes) == s  # all lanes used
        assert max(r["count"] for r in lanes) <= 2 * (hot.type_total // s + 1)


def test_doremi_step_moves_weights_the_right_way(spark, sf_dir):
    """The multiplicative-weights step must (a) renormalize (Σw_new ≈ 1),
    (b) boost the max-excess source, (c) never boost a zero-excess source,
    and (d) be non-vacuous (at least one source with positive excess —
    otherwise the step is the identity and the test proves nothing)."""
    from changesetmd_spark import registry

    rows = registry.queries()["q_doremi_mixture_step"](spark, sf_dir).collect()
    assert len(rows) >= 2
    assert any(r.excess_bp > 0 for r in rows)
    assert abs(sum(r.w_new for r in rows) - 1.0) < 1e-4
    assert abs(sum(r.w0 for r in rows) - 1.0) < 1e-4
    mx = max(rows, key=lambda r: r.excess_bp)
    assert mx.w_new > mx.w0
    assert all(r.w_new <= r.w0 for r in rows if r.excess_bp == 0)
    # budget plan: allocations never exceed the half-corpus budget
    total_tokens = sum(r.n_tokens for r in rows)
    assert sum(r.alloc_tokens for r in rows) <= total_tokens // 2


def test_ndcg_eval_discriminates_and_bounds(spark, sf_dir):
    """NDCG must be a real metric here: strictly between 0 and 1 (the
    term-mass gold is deliberately not what BM25 orders by — a vacuous 1.0
    means the gold degenerated), DCG ≤ IDCG, and a full pool."""
    from changesetmd_spark import registry

    row = registry.queries()["q_retrieval_ndcg_eval"](spark, sf_dir).collect()[0]
    assert row.k == 10 and row.n_pool == 10
    assert 0.0 < row.ndcg < 1.0
    assert row.dcg < row.idcg
    assert 0 <= row.n_rel_at_k <= 10


def test_incremental_minhash_neardup_routing_contract(spark, sf_dir):
    """Delta-vs-base routing: every reported row is an incoming (odd) doc
    matched against a base (even) doc, the near-dup verdict is exactly the
    integer 2|∩| ≥ |∪| gate re-expressed through the rounded jaccard, and
    the screen is non-vacuous (the corpus's planted near-dups cross the
    parity split)."""
    from changesetmd_spark import registry

    rows = registry.queries()["q_incremental_minhash_neardup"](
        spark, sf_dir
    ).collect()
    assert rows  # non-vacuous
    assert any(r.is_neardup for r in rows)
    for r in rows:
        assert r.delta_doc_id % 2 == 1
        assert r.best_match_doc_id % 2 == 0
        assert r.n_candidates >= 1
        assert 0.0 <= r.best_jaccard5 <= 1.0
        # the gate is integer-exact; at the 0.5 boundary the rounded
        # jaccard agrees with it to within rounding slack
        if r.is_neardup:
            assert r.best_jaccard5 >= 0.49999


def test_cross_source_leakage_contract(spark, sf_dir):
    """The leakage audit must be non-vacuous (the corpus plants shared
    prefix keys across sources), canonically oriented (source_1 <
    source_2, each unordered pair once), and every count positive."""
    from changesetmd_spark import registry

    rows = registry.queries()["q_cross_source_leakage"](
        spark, sf_dir
    ).collect()
    assert rows  # zero rows = the vacuous-0 trap this key choice avoids
    seen = set()
    for r in rows:
        assert r.source_1 < r.source_2
        assert (r.source_1, r.source_2) not in seen
        seen.add((r.source_1, r.source_2))
        assert r.n_shared_keys >= 1
        assert r.n_docs_involved >= 2 * r.n_shared_keys


def test_unigram_drift_bounds(spark, sf_dir):
    """KL ≥ 0 (Gibbs), TV in [0, 1], and the drift must be non-zero —
    the parity split halves differ, so a 0.0 reading means the fold
    degenerated."""
    from changesetmd_spark import registry

    row = registry.queries()["q_unigram_drift_kl"](spark, sf_dir).collect()[0]
    assert row.n_terms == 64
    assert row.kl_nats >= 0.0
    assert 0.0 <= row.tv_distance <= 1.0
    assert row.tv_distance > 0.0
    assert row.top_drift_term


def test_txn_changes_classification(spark, tmp_path):
    """TxnTable.changes on a planted lifecycle: v0 {a:1, b:2, c:null} →
    v1 {a:1 (unchanged), b:9 (update), d:4 (insert)} with c deleted; the
    diff must classify all four outcomes, null-safely (c's null value must
    read as a delete, not explode the comparison), and drop unchanged."""
    from changesetmd_spark.sinks.txn_table import TxnTable

    t = TxnTable(spark, str(tmp_path / "cdf_unit"))
    v0_df = spark.createDataFrame(
        [("a", 1), ("b", 2), ("c", None)], "k string, v int"
    )
    t.overwrite(v0_df)
    v0 = t.current_version()
    t.overwrite(
        spark.createDataFrame(
            [("a", 1), ("b", 9), ("d", 4)], "k string, v int"
        )
    )
    v1 = t.current_version()
    feed = {r.k: r for r in t.changes(v0, v1, key="k").collect()}
    assert set(feed) == {"b", "c", "d"}  # 'a' unchanged → dropped
    assert feed["b"].change_type == "update"
    assert (feed["b"].old_v, feed["b"].new_v) == (2, 9)
    assert feed["c"].change_type == "delete" and feed["c"].new_v is None
    assert feed["d"].change_type == "insert" and feed["d"].old_v == None  # noqa: E711


def test_txn_change_feed_covers_all_three_types(spark, sf_dir):
    """The registered CDF query must exercise insert AND update AND delete
    (a feed without deletes is just a merge diff)."""
    from changesetmd_spark import registry

    rows = {
        r.change_type: r
        for r in registry.queries()["q_txn_change_feed"](
            spark, sf_dir
        ).collect()
    }
    assert set(rows) == {"insert", "update", "delete"}
    assert all(r.n_rows > 0 and r.event_id_checksum > 0 for r in rows.values())


def test_binary_hamming_pack_and_ordering(spark, sf_dir):
    """The sign-bit packing must be exact (verified on a hand-built vector
    with a known bit pattern) and the retrieval must return a full top-20
    ordered by (hamming, vec_id) with distances in [0, 64]."""
    from changesetmd_spark import registry
    from changesetmd_spark.operators.similarity import _bh_pack_col
    from pyspark.sql import functions as F

    # dims 1,3,5 (1-based) positive in the low word; dim 33 in the high
    vec = [0.0] * 64
    vec[0] = vec[2] = vec[4] = 1.0
    vec[32] = 2.5
    row = (
        spark.range(1)
        .select(F.array(*[F.lit(x) for x in vec]).alias("e"))
        .select(
            _bh_pack_col(F.col("e"), 0).alias("lo"),
            _bh_pack_col(F.col("e"), 32).alias("hi"),
        )
        .collect()[0]
    )
    assert row.lo == (1 << 0) | (1 << 2) | (1 << 4)
    assert row.hi == 1

    rows = registry.queries()["q_embedding_binary_hamming"](
        spark, sf_dir
    ).collect()
    assert len(rows) == 20
    assert all(0 <= r.hamming <= 64 for r in rows)
    assert rows == sorted(rows, key=lambda r: (r.hamming, r.vec_id))
    assert all(-1.0 <= r.cosine5 <= 1.0 for r in rows)


def test_dim_moments_match_numpy(spark, sf_dir):
    """Exact recount referee: numpy recomputes the scaled-integer moment
    recipe from the parquet for every dim."""
    import numpy as np
    import pyarrow.parquet as pq

    from changesetmd_spark import registry

    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["embedding"])
    mat = np.array(tbl.column("embedding").to_pylist(), dtype=np.float64)
    s6 = np.round(mat * 1_000_000).astype(np.int64)
    rows = {
        r.dim: r
        for r in registry.queries()["q_embedding_dim_moments"](
            spark, sf_dir
        ).collect()
    }
    assert set(rows) == set(range(64))
    for dim in (0, 7, 63):
        col = s6[:, dim]
        n = len(col)
        mean = col.sum() / n / 1e6
        var = (
            (col.astype(object) ** 2).sum() / n - (col.sum() / n) ** 2
        ) / 1e12
        r = rows[dim]
        assert r.n == n
        assert abs(r.mean6 - round(mean, 6)) < 2e-6
        assert abs(r.std6 - round(max(0.0, var) ** 0.5, 6)) < 2e-6
        assert r.min6 == round(col.min() / 1e6, 6)
        assert r.max6 == round(col.max() / 1e6, 6)


def test_stream_late_drop_both_sides_of_the_rule(spark, sf_dir):
    """The late-data query must exercise BOTH sides of the probed rule:
    some stragglers dropped (their windows expired) AND some stragglers
    kept (their windows still open when the watermark took effect) —
    otherwise the oracle is pinning a vacuous case."""
    import duckdb

    from changesetmd_spark import registry
    from changesetmd_spark.streaming.events_stream import _LATE_DELAY_MS

    rows = {
        r.window_start: r.n_events
        for r in registry.queries()["q_stream_late_data_drop"](
            spark, sf_dir
        ).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_dir}/events.parquet')"
    )
    n_all, n_ontime, dropped, kept_late = con.execute(
        f"""
        WITH a AS (SELECT ts FROM events WHERE event_id % 4 <> 1),
        b AS (SELECT ts FROM events WHERE event_id % 4 = 1),
        wm AS (SELECT MAX(ts) - INTERVAL '{_LATE_DELAY_MS} milliseconds'
                 AS w FROM a)
        SELECT (SELECT COUNT(*) FROM events),
               (SELECT COUNT(*) FROM a),
               (SELECT COUNT(*) FROM b, wm
                WHERE date_trunc('hour', b.ts) + INTERVAL 1 HOUR <= wm.w),
               (SELECT COUNT(*) FROM b, wm
                WHERE date_trunc('hour', b.ts) + INTERVAL 1 HOUR > wm.w)
        """
    ).fetchone()
    total_emitted = sum(rows.values())
    assert dropped > 0, "no straggler fell past the watermark"
    assert kept_late > 0, "no straggler landed in a still-open window"
    assert total_emitted == n_all - dropped
    assert total_emitted > n_ontime  # the kept stragglers are in there


def test_distinct_ngram_diversity_bounds(spark, sf_dir):
    """Ratios in (0, 1], distinct ≤ total, and at least one source below
    1.0 (cross-document bigram reuse exists — else the metric is vacuous)."""
    from changesetmd_spark import registry

    rows = registry.queries()["q_distinct_ngram_diversity"](
        spark, sf_dir
    ).collect()
    assert rows
    for r in rows:
        assert 0 < r.distinct_bigrams <= r.total_bigrams
        assert 0.0 < r.distinct_ratio <= 1.0
    assert any(r.distinct_ratio < 1.0 for r in rows)


def test_zipf_fit_matches_numpy_and_is_negative(spark, sf_dir):
    """The slope must be negative (frequencies decay with rank) and match
    an independent numpy least-squares over the same rounded points."""
    import math

    import duckdb
    import numpy as np

    from changesetmd_spark import registry
    from changesetmd_spark.operators.text import _ZIPF_TOP

    row = registry.queries()["q_zipf_fit_audit"](spark, sf_dir).collect()[0]
    # the synthetic vocabulary can be smaller than the spectrum depth
    assert 2 <= row.k <= _ZIPF_TOP
    assert row.slope < 0  # shallow on this templated corpus - which is
    # exactly what the audit is for - but always decaying

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    counts = con.execute(
        r"""
        WITH tf AS (SELECT unnest(string_split_regex(lower(trim(text)),
                                                     '\s+')) AS term
                    FROM documents)
        SELECT COUNT(*) AS c FROM tf GROUP BY term
        ORDER BY c DESC, MIN(term) LIMIT """
        + str(_ZIPF_TOP)
    ).fetchall()
    assert len(counts) == row.k
    x = np.array([round(math.log(r + 1), 6) for r in range(len(counts))])
    y = np.array([round(math.log(c[0]), 6) for c in counts])
    slope, intercept = np.polyfit(x, y, 1)
    assert abs(row.slope - slope) < 1e-3
    assert abs(row.intercept - intercept) < 1e-3
