"""Physical-plan regression tests (SURVEY.md §4): plan *shape* assertions.

A query that loses predicate pushdown, broadcasts, pruning or codegen still
returns correct rows — it just stops scaling.  These tests pin the plan
properties that replace the reference's index machinery (ref
queries.py:41-56): Parquet min/max pruning needs filters AT the scan;
dimension joins must broadcast (never shuffle the fact table for them);
scans must read only referenced columns."""

from __future__ import annotations

from changesetmd_spark import registry
from changesetmd_spark.plans import (
    codegen_spans_noaqe,
    has_broadcast_join,
    pushed_filters,
    read_schema_columns,
    shuffle_count,
)

QS = registry.queries()


def test_q1_filter_reaches_parquet_scan(spark, sf_dir):
    df = QS["q1_pricing_summary"](spark, sf_dir)
    pushed = pushed_filters(df)
    assert any("l_shipdate" in p for p in pushed), pushed
    # column pruning: the 16-col lineitem scan reads only the 7 used
    (cols,) = read_schema_columns(df)
    assert "l_comment" not in cols and len(cols) <= 7


def test_q5_star_join_broadcasts_dimensions(spark, sf_dir):
    df = QS["q5_revenue_by_nation"](spark, sf_dir)
    assert has_broadcast_join(df)
    # fact-side shuffles only for the final aggregate(s), never for dim joins:
    # allow the agg exchange + AQE artifacts but not 4 join shuffles
    assert shuffle_count(df) <= 2, shuffle_count(df)


def test_q3_pushes_both_filters(spark, sf_dir):
    df = QS["q3_top_revenue_orders"](spark, sf_dir)
    pushed = " / ".join(pushed_filters(df))
    assert "o_orderdate" in pushed and "l_shipdate" in pushed and "mktsegment" in pushed


def test_bbox_containment_is_pure_pushdown(spark, sf_dir):
    """J2: envelope containment must reduce to scan-level range predicates —
    no join, no shuffle (the GiST-index replacement, SURVEY §2.3)."""
    df = QS["q_bbox_containment"](spark, sf_dir)
    assert shuffle_count(df) == 0
    assert pushed_filters(df), "range predicates must reach the scan"


def test_upsert_dedup_shuffles_once(spark, sf_dir):
    df = QS["q_upsert_last_write_wins"](spark, sf_dir)
    assert shuffle_count(df) == 1  # exactly the window partitionBy


def test_bm25_is_projection_shaped(spark, sf_dir):
    """Fixed-term BM25 must not explode or build an inverted index: term
    frequencies are array expressions, corpus stats a broadcast 1-row agg —
    at most one exchange end-to-end, and the scan reads only (doc_id, text)."""
    df = QS["q_bm25_keyword_search"](spark, sf_dir)
    assert shuffle_count(df) <= 1, shuffle_count(df)
    assert has_broadcast_join(df)
    for cols in read_schema_columns(df):
        assert cols <= {"doc_id", "text"}, cols


def test_quota_sample_single_window_shuffle(spark, sf_dir):
    df = QS["q_source_quota_sample"](spark, sf_dir)
    assert shuffle_count(df) == 1  # the source window, nothing else
    (cols,) = read_schema_columns(df)
    assert cols == {"source", "doc_id", "n_chars"}


def test_train_test_split_single_agg_shuffle(spark, sf_dir):
    df = QS["q_train_test_split"](spark, sf_dir)
    assert shuffle_count(df) == 1  # the final groupBy only
    (cols,) = read_schema_columns(df)
    assert "text" not in cols  # hash key is the id, not content


def test_hot_paths_stay_in_codegen(spark, sf_dir):
    for name in ["q1_pricing_summary", "q5_revenue_by_nation", "q_dedup_exact"]:
        assert codegen_spans_noaqe(spark, QS[name], spark, sf_dir) >= 1, name


def test_date_partitioned_store_prunes_partitions(spark, sf_dir, tmp_path):
    """The ChangesetStore's partitionBy(created_date) layout (SURVEY §4.2:
    the created_idx replacement) must turn date predicates into
    PartitionFilters — whole directories skipped before any file opens."""
    from pyspark.sql import functions as F

    from changesetmd_spark.plans import partition_filters
    from changesetmd_spark.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    target = str(tmp_path / "events_by_date")
    ev.withColumn("event_date", F.to_date("ts")).write.partitionBy(
        "event_date"
    ).parquet(target)

    read = spark.read.parquet(target).filter(
        F.col("event_date") == "2024-01-02"
    )
    pf = partition_filters(read)
    assert pf and "event_date" in pf[0], pf
    assert read.count() > 0


def test_scan_prunes_unused_columns_everywhere(spark, sf_dir):
    """No scan in the core relational queries may read a column its query
    never references (documents.text is exempt where text IS the input)."""
    for name in ["q5_revenue_by_nation", "q_orders_per_month", "q_distinct_counts"]:
        for cols in read_schema_columns(QS[name](spark, sf_dir)):
            assert "l_comment" not in cols and "o_comment" not in cols, name


def _physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_cc_edges_equi_join_no_nested_loop(spark, sf_dir):
    """q_dedup_groups candidate edges must come from the inverted-index
    postings equi-join; any all-pairs formulation would plan as
    BroadcastNestedLoopJoin / CartesianProduct — dead at corpus scale."""
    from changesetmd_spark.operators.corpus import cc_candidate_edges
    from changesetmd_spark.operators.dedup import hashed_shingle_docs

    edges = cc_candidate_edges(hashed_shingle_docs(spark, sf_dir))
    plan = _physical_plan(edges)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    # the edge set must be non-empty on the driver corpus — an empty edge
    # set made every downstream component check a vacuous 0 == 0
    assert edges.count() > 0


def test_simhash_registered_query_equi_join_only(spark, sf_dir):
    """The registered simhash query (bucket-capped banding) must stay an
    equi-join on band keys — no nested-loop fallback anywhere in the plan."""
    from changesetmd_spark import registry

    plan = _physical_plan(registry.queries()["q_simhash_near_dup"](spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_embedding_neardup_equi_join_only(spark, sf_dir, monkeypatch):
    """q_embedding_neardup_cosine must generate candidates via the LSH
    bucket equi-join on (table, bucket) — the previous all-pairs
    BroadcastNestedLoopJoin was O(n²) and dead at corpus scale.

    The registered query returns a materialized (localCheckpoint) frame
    whose top-level plan is a bare RDD scan, so the shape assertions run
    on the INTERNAL plan with the materialization bypassed — otherwise
    this guard is vacuous (r18: it silently passed while the planes
    attach was a BNLJ; the non-foldable `_k` key in
    `_plane_signature_rows` is what keeps it a BroadcastHashJoin)."""
    from changesetmd_spark import registry
    from changesetmd_spark.operators import util

    monkeypatch.setattr(util, "materialize_releasing", lambda out, *f: out)
    internal = registry.queries()["q_embedding_neardup_cosine"](spark, sf_dir)
    plan = _physical_plan(internal)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan  # the 48-row planes attach
    monkeypatch.undo()

    df = registry.queries()["q_embedding_neardup_cosine"](spark, sf_dir)
    # the planted twins must actually be found (non-vacuous hash check):
    # one pair per planted vector, all at cosine ≈ 0.999+
    rows = df.collect()
    assert len(rows) > 0
    assert all(r.cosine_sim >= 0.92 for r in rows)
    assert all(r.vec_id_2 - 10_000_000 == r.vec_id_1 for r in rows)


def test_fan_out_is_conditional(spark, sf_dir):
    """fan_out must widen a narrow (single-file) scan but be a NO-OP on an
    input already at session parallelism — an extra Exchange of raw 100 TB
    input would be pure shuffle waste (VERDICT r5 #3)."""
    from changesetmd_spark.operators.util import fan_out
    from changesetmd_spark.tables import load_table

    par = spark.sparkContext.defaultParallelism
    narrow = load_table(spark, sf_dir, "documents")
    assert narrow.rdd.getNumPartitions() < par
    widened = fan_out(narrow, "doc_id")
    assert widened.rdd.getNumPartitions() == par
    # already-wide input: fan_out returns the SAME frame, no repartition node
    wide = narrow.repartition(par, "doc_id")
    assert fan_out(wide, "doc_id") is wide


def test_lsh_bucket_caps_have_no_sort_window(spark, sf_dir):
    """The MinHash-LSH and SimHash bucket caps must be aggregate+anti-join
    shaped, never a count(*) OVER (PARTITION BY bucket) window — the window
    forces a full sort of the postings (VERDICT r5 #4)."""
    for name in ("q_minhash_lsh_candidates", "q_simhash_near_dup"):
        df = QS[name](spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Window" not in plan, f"{name} plan contains a sort window"


def test_sequence_packing_single_exchange(spark, sf_dir):
    """q_sequence_packing's running-sum window and the (source, pack_id)
    aggregate must share ONE hash exchange on `source` — a second shuffle
    would resort the whole corpus at 100 TB for no semantic reason."""
    df = QS["q_sequence_packing"](spark, sf_dir)
    assert shuffle_count(df) == 1


def test_kmeans_seeds_are_broadcast(spark, sf_dir):
    """q_kmeans_assign_update must broadcast the K seed centroids (tiny
    side) so assignment stays an embarrassingly-parallel map; a shuffled
    cross join of the corpus against the seeds would be a scale-killer."""
    plan = _physical_plan(QS["q_kmeans_assign_update"](spark, sf_dir))
    assert "BroadcastExchange" in plan
    # exactly two wide exchanges: the vec_id argmin and the K-row update
    df = QS["q_kmeans_assign_update"](spark, sf_dir)
    assert shuffle_count(df) == 2


def test_dsir_no_cartesian_on_corpus(spark, sf_dir):
    """q_dsir_importance_weights joins postings to per-term counts — the
    only nested-loop join allowed is the 1-row totals broadcast."""
    plan = _physical_plan(QS["q_dsir_importance_weights"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1  # the 1-row totals


def test_semdedup_blocks_on_cluster_equi_join(spark, sf_dir):
    """q_semdedup_clustered's pair generation must be an equi-join on
    cluster_id; the only nested-loop stages allowed are the broadcast
    K-row seed expansions (tiny build side by construction)."""
    df = QS["q_semdedup_clustered"](spark, sf_dir)
    plan = _physical_plan(df)
    assert "CartesianProduct" not in plan
    assert (
        "SortMergeJoin [cluster_id" in plan
        or "ShuffledHashJoin [cluster_id" in plan
        or "BroadcastHashJoin [cluster_id" in plan
    )
    # non-vacuous: every planted twin must be recovered by cluster blocking
    rows = df.collect()
    assert len(rows) > 0
    assert all(r.cosine_sim >= 0.92 for r in rows)


def test_rag_chunk_overlap_no_exchange(spark, sf_dir):
    """q_rag_chunk_overlap is a pure per-document map (closed-form chunk
    placement + explode + hash) — the ONLY allowed exchange is fan_out's
    widen of the single-file local corpus (a no-op on a wide scan); any
    second exchange means token arrays are being shuffled, the quadratic
    trap the CDC operator fixed."""
    df = QS["q_rag_chunk_overlap"](spark, sf_dir)
    assert shuffle_count(df) <= 1, shuffle_count(df)


def test_token_len_histogram_single_exchange(spark, sf_dir):
    """One hash aggregate on (source, bits) with map-side combine — the
    exchange carries only the tiny bucket space."""
    df = QS["q_token_len_histogram"](spark, sf_dir)
    assert shuffle_count(df) == 1, shuffle_count(df)


def test_mad_outliers_broadcasts_stats(spark, sf_dir):
    """q_value_mad_outliers must broadcast the 5-row med/mad frames back
    to the events scans — a sort-merge join here would shuffle the whole
    events table three times at 100 TB."""
    df = QS["q_value_mad_outliers"](spark, sf_dir)
    plan = _physical_plan(df)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan, "stats joins must broadcast"
    assert "CartesianProduct" not in plan


def test_bigram_fluency_equi_joins_only(spark, sf_dir):
    """q_bigram_lm_fluency's postings⋈counts joins must be equi-joins on
    the bigram/prefix keys — no cartesian, no nested loop.  Pinned via
    the exposed lazy plan (the registered query checkpoints eagerly, so
    its returned frame's plan is just the materialized scan)."""
    from changesetmd_spark.operators.curation import bigram_fluency_plan

    out, _ = bigram_fluency_plan(spark, sf_dir)
    plan = _physical_plan(out)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Join" in plan  # non-vacuous: the scoring joins are present


def test_pca_power_matvec_shape(spark, sf_dir):
    """q_embedding_pca_power's matvec must aggregate on (label, pos) —
    the exchange carries labels × dim rows, never the corpus — and the
    dim-length iterate must re-join the vectors as a broadcast."""
    df = QS["q_embedding_pca_power"](spark, sf_dir)
    plan = _physical_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan  # the x-iterate re-join on label
    # two matvecs: per-pos aggregate + per-label regroup each, nothing more
    assert shuffle_count(df) <= 4, shuffle_count(df)


def test_user_value_deciles_no_single_partition_window(spark, sf_dir):
    """q_user_value_deciles must rank via the two-phase prefix machinery
    (VERDICT r7 #2): the old global un-partitioned NTILE planned
    `Exchange SinglePartition` + one Window task — a one-thread sort of
    every per-user total at 10⁹ users.  The window must be partitioned by
    the pinned range-partition id, every exchange parallel."""
    df = QS["q_user_value_deciles"](spark, sf_dir)
    plan = _physical_plan(df)
    assert "Exchange SinglePartition" not in plan, plan
    assert "Window" in plan and "_pid" in plan  # non-vacuous: 2-phase rank


def test_media_shard_manifest_no_single_partition_window(spark, sf_dir):
    """q_media_shard_manifest's cumulative-bytes scan must not serialize a
    modality (3 distinct values) through one task (VERDICT r7 #3): the
    running sum must be a per-(range-partition, modality) window plus a
    broadcast offsets join, with no SinglePartition exchange."""
    df = QS["q_media_shard_manifest"](spark, sf_dir)
    plan = _physical_plan(df)
    assert "Exchange SinglePartition" not in plan, plan
    assert "Window" in plan and "_pid" in plan
    assert "BroadcastExchange" in plan  # the offsets join rides broadcast


def test_pq_adc_plan_broadcast_only_joins(spark, sf_dir):
    """q_embedding_pq_adc must never shuffle-join: the codebook (128
    subspace rows) and the query LUTs (5 rows) ride broadcast, the code
    table is the only data-sized side, and nothing funnels through one
    task."""
    df = QS["q_embedding_pq_adc"](spark, sf_dir)
    plan = _physical_plan(df)
    assert "Exchange SinglePartition" not in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_hard_negative_mining_broadcast_anchor_scan(spark, sf_dir):
    """q_hard_negative_mining is the brute-force-baseline shape: anchors
    broadcast, one parallel corpus scan, only the per-anchor top-k window
    shuffles (anchor-partitioned, never SinglePartition)."""
    df = QS["q_hard_negative_mining"](spark, sf_dir)
    plan = _physical_plan(df)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "Exchange SinglePartition" not in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_vocab_growth_no_inequality_join_blowup(spark, sf_dir):
    """q_vocab_growth must bucket via the broadcast comparison chain — a
    10× inequality join of the term table (BroadcastNestedLoopJoin over
    first-appearances × cutoffs) would be the scale bug.  The only BNLJ
    allowed is the 1-row cutoffs broadcast; the 10-row cumulative window
    may run SinglePartition (bounded by the checkpoint count, not data)."""
    df = QS["q_vocab_growth"](spark, sf_dir)
    plan = _physical_plan(df)
    assert "SortMergeJoin" not in plan, plan
    # the cutoff row joins each frame once: ≤2 nested-loop broadcasts of a
    # single-row side, never a term×checkpoint expansion join
    assert plan.count("BroadcastNestedLoopJoin") <= 2, plan


def test_quality_gate_threshold_broadcast(spark, sf_dir):
    """q_quality_percentile_gate joins per-source thresholds back by
    broadcast — the documents scan must not shuffle for the join."""
    df = QS["q_quality_percentile_gate"](spark, sf_dir)
    plan = _physical_plan(df)
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_label_propagation_round_no_window_no_nested_loop(spark, sf_dir):
    """Each LP round must stay equi-join + hash aggregates: the
    (tw, -label) struct-MAX replaces a per-node sort window, so a Window
    (or any nested-loop join) in the round plan is a scale regression —
    at 10⁹ nodes a rank window per node re-sorts the whole candidate set."""
    from changesetmd_spark.operators.cooccurrence import (
        label_propagation_round_plan,
    )

    plan = _physical_plan(label_propagation_round_plan(spark, sf_dir))
    assert "Window" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_kcore_peel_round_equi_join_only(spark, sf_dir):
    """Each k-core peel round must be two endpoint-membership equi-joins +
    one hash aggregate — no window, no nested-loop/cartesian fallback
    (either would serialize or square a 10⁹-node graph round)."""
    from pyspark.sql import functions as F

    from changesetmd_spark.operators.cooccurrence import (
        _kcore_degrees,
        _kcore_strong_edges,
    )

    edges = _kcore_strong_edges(spark, sf_dir)
    surviving = edges.select(F.col("src").alias("item_id")).distinct()
    plan = _physical_plan(_kcore_degrees(edges, surviving))
    assert "Window" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_zorder_scan_prunes_to_two_key_columns(spark, sf_dir):
    """The Z-order stats pass must read ONLY the two clustering keys —
    a scan that drags the full 16-column lineitem row through a 100 TB
    layout job is wrong even when the answer is right."""
    plan = _physical_plan(QS["q_zorder_layout"](spark, sf_dir))
    assert "ReadSchema: struct<l_partkey:bigint,l_suppkey:bigint>" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_bloom_probe_broadcasts_never_shuffles_fact(spark, sf_dir):
    """The bloom probe must be broadcast hash joins only: the fact side of
    a 100 TB prefilter may never shuffle or sort-merge — that would cost
    more than the join the filter is saving."""
    df = QS["q_bloom_prefilter_join"](spark, sf_dir)
    plan = _physical_plan(df)
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_random_projection_is_map_only(spark, sf_dir):
    """The JL projection must be a pure map pass: zero exchanges, scan
    pruned to (vec_id, embedding) — any shuffle in a 10⁹-vector projection
    is pure waste."""
    from changesetmd_spark.plans import read_schema_columns, shuffle_count

    df = QS["q_embedding_random_projection"](spark, sf_dir)
    assert shuffle_count(df) == 0
    for cols in read_schema_columns(df):
        assert cols <= {"vec_id", "embedding"}, cols


def test_int8_quantize_is_map_only(spark, sf_dir):
    """Int8 quantization is the storage-compression pass of a 10⁹-vector
    store: it must be a pure projection — zero exchanges, scan pruned to
    (vec_id, embedding)."""
    from changesetmd_spark.plans import read_schema_columns, shuffle_count

    df = QS["q_embedding_int8_quantize"](spark, sf_dir)
    assert shuffle_count(df) == 0
    for cols in read_schema_columns(df):
        assert cols <= {"vec_id", "embedding"}, cols


def test_bpe_iterations_run_on_vocab_not_corpus(spark, sf_dir):
    """BPE's per-merge work must be vocab-sized: downstream of the (lazily
    checkpointed) word-frequency table the plan may shuffle only for the
    two vocab-sized pair aggregates, the top-k picks must compile to
    TakeOrdered (no global sort exchange), and the argmax merge join must
    stay a broadcast — never a real cartesian."""
    from changesetmd_spark.plans import shuffle_count

    df = QS["q_bpe_train_step"](spark, sf_dir)
    plan = _physical_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "TakeOrderedAndProject" in plan, plan
    assert shuffle_count(df) <= 2, plan


def test_bitext_scoring_never_shuffles_candidates(spark, sf_dir):
    """The pairwise scoring pass of margin mining must broadcast the capped
    query side and keep the candidate side map-side: zero exchanges, no
    sort-merge, no real cartesian — at 100 TB the candidate scan is the
    whole cost and must stay embarrassingly parallel."""
    from changesetmd_spark.operators.bitext import scored_pairs
    from changesetmd_spark.plans import shuffle_count

    df = scored_pairs(spark, sf_dir, checkpoint=False)
    plan = _physical_plan(df)
    assert shuffle_count(df) == 0
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan, plan


def test_ppjoin_no_single_partition_no_cartesian(spark, sf_dir):
    """q_ppjoin_similar_docs must stay equi-join-shaped end to end: the
    prefix self-join and the verify join are hash joins on (sg) / (d, sg),
    never a cartesian or nested-loop pair enumeration, and the per-doc
    rank window is partitioned by doc_id (no SinglePartition funnel)."""
    from changesetmd_spark.operators.dedup import ppjoin_similar_docs_plan

    out, posts, pref = ppjoin_similar_docs_plan(spark, sf_dir)
    try:
        plan = _physical_plan(out)
        assert "Exchange SinglePartition" not in plan, plan
        assert "CartesianProduct" not in plan, plan
        assert "BroadcastNestedLoopJoin" not in plan, plan
        assert "Window" in plan  # non-vacuous: the df-rank prefix window
    finally:
        posts.unpersist()
        pref.unpersist()


def test_phrase_search_equi_joins_only(spark, sf_dir):
    """q_phrase_search's adjacency matching must be hash equi-joins on
    (doc_id, pos±k, term) — never a cartesian / nested-loop pair walk —
    and the postings frame must be cut to the query vocabulary (the isin
    filter) BEFORE the joins, so no corpus-sized side enters a join."""
    from changesetmd_spark.operators.phrase import phrase_search_plan

    out, posts = phrase_search_plan(spark, sf_dir)
    try:
        plan = _physical_plan(out)
        assert "CartesianProduct" not in plan, plan
        assert "BroadcastNestedLoopJoin" not in plan, plan
        assert "Exchange SinglePartition" not in plan, plan
        # the vocabulary cut precedes the persist: the InMemoryRelation's
        # child plan carries the isin filter, joins read the cut frame
        assert "term#" in plan and plan.count("HashJoin") >= 1, plan
    finally:
        posts.unpersist()


def test_pps_sample_no_single_partition(spark, sf_dir):
    """q_pps_systematic_sample's global cumulative weight must go through
    the two-phase prefix machinery: per-range-partition parallel window +
    broadcast offsets join, never an un-partitioned running-sum window
    (`Exchange SinglePartition`)."""
    df = QS["q_pps_systematic_sample"](spark, sf_dir)
    plan = _physical_plan(df)
    assert "Exchange SinglePartition" not in plan, plan
    assert "Window" in plan and "_pid" in plan  # non-vacuous: 2-phase sum
    assert "BroadcastExchange" in plan  # the offsets join rides broadcast


def test_scd2_windows_partition_by_customer(spark, sf_dir):
    """q_scd2_priority_history must keep every window/aggregate partitioned
    by o_custkey — one exchange of the fact table, reused across the
    chained LAG / running-sum / groupBy / LEAD stages; no SinglePartition
    funnel anywhere."""
    df = QS["q_scd2_priority_history"](spark, sf_dir)
    plan = _physical_plan(df)
    assert "Exchange SinglePartition" not in plan, plan
    assert "Window" in plan
    # one hash-partitioning exchange on o_custkey feeds the whole chain
    assert plan.count("hashpartitioning(o_custkey") <= 2, plan


def test_bitext_ivf_blocked_scoring_shape(spark, sf_dir):
    """The IVF bitext tier's scoring must be cell-blocked: centroid routing
    rides broadcast joins (the only nested-loop pairs are vector x sqrt(n)
    centroids), the x-probe window partitions by x_id (no SinglePartition
    funnel), and the scoring itself is a hash equi-join on coarse_id —
    never an |X| x |Y| cartesian."""
    from changesetmd_spark.operators.bitext import bitext_ivf_scored

    df = bitext_ivf_scored(spark, sf_dir, checkpoint=False)
    plan = _physical_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "Exchange SinglePartition" not in plan, plan
    # the coarse_id equi-join is present as a hash join
    assert "coarse_id" in plan, plan


def test_countmin_sketch_only_single_constant_exchange(spark, sf_dir):
    """The sketch-only CMS path must be scan -> explode -> ONE hash
    aggregate keyed by (i, bucket): no join, no window, no second
    exchange.  Map-side partial aggregation onto <= d*w keys is what makes
    the shuffle payload constant in corpus size — the plan shape IS the
    100 TB claim."""
    from changesetmd_spark.plans import shuffle_count

    df = QS["q_countmin_sketch_only"](spark, sf_dir)
    plan = _physical_plan(df)
    assert shuffle_count(df) == 1, plan
    assert "Join" not in plan, plan
    assert "Window" not in plan, plan
    assert "partial_count" in plan or "HashAggregate" in plan, plan


def test_substring_spans_no_persist_cheap_probe(spark, sf_dir):
    """q_duplicate_substring_spans: no persisted postings (the old cache
    cost a 10s cold materialization - VERDICT r9 #7) and, since the r13
    one-exchange rewrite (94.4s -> 60.5s at 300x), NO join at all: the
    duplicate test is a COUNT-over-window riding the single postings
    exchange, so each window md5 is computed exactly once."""
    df = QS["q_duplicate_substring_spans"](spark, sf_dir)
    plan = _physical_plan(df)
    assert "InMemoryTableScan" not in plan, plan
    assert "Join" not in plan, plan
    # one exchange hashed on the window-hash key + the per-document span
    # merging exchange (the conditional fan_out widen may add a third when
    # the local scan is narrow)
    assert any(
        "Exchange hashpartitioning(h#" in ln for ln in plan.splitlines()
    ), plan
    assert plan.count("Exchange hashpartitioning") <= 3, plan


def test_neyman_sample_window_partitioned_no_single_partition(spark, sf_dir):
    """q_stratified_sample_neyman: the per-stratum rank window must be
    partitioned by source (never a global SinglePartition window), the
    allocation table must ride a broadcast join, and the moment sums must
    partial-aggregate (map-side combine) before their one source exchange."""
    df = QS["q_stratified_sample_neyman"](spark, sf_dir)
    plan = _physical_plan(df)
    assert "Exchange SinglePartition" not in plan, plan
    assert "hashpartitioning(source" in plan, plan
    assert "BroadcastExchange" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_minhash_audit_wide_agreement_no_explode(spark, sf_dir):
    """q_minhash_estimate_error_audit: the 16-component agreement count must
    be a WIDE-column compare inside one projection — the plan must carry the
    16 signature min-aggregates (hash-partitioned by doc_id) and must never
    cartesian; the exact-Jaccard stage joins candidate pairs only."""
    from changesetmd_spark.operators.dedup import minhash_audit_plan

    df, sig, docs = minhash_audit_plan(spark, sf_dir)
    try:
        plan = _physical_plan(df)
        assert "CartesianProduct" not in plan, plan
        assert "Exchange SinglePartition" not in plan, plan
        # the signature build is the checked-LSH pipeline: 16 min() aggregates
        assert plan.count("min(") >= 16 or plan.count("partial_min") >= 16, plan
    finally:
        sig.unpersist()
        docs.unpersist()


def test_repetition_quality_plan_arms(spark, sf_dir):
    """VERDICT r12 #3: both q_text_repetition_quality arms ship; each plan
    shape is pinned.  Wire-optimal (spark.changesetmd.repetition.wireOptimal)
    = ONE exchange of raw text hashed by doc_id, then 4 stacked
    HashAggregates (both aggregations combine map-side).  Default = the
    two-exchange pipeline ((doc_id, gram) count, then per-doc rollup)."""
    name = "q_text_repetition_quality"
    key = "spark.changesetmd.repetition.wireOptimal"
    try:
        spark.conf.set(key, "true")
        plan = _physical_plan(QS[name](spark, sf_dir))
        # exactly one shuffle: the explicit repartition by doc_id
        assert plan.count("Exchange hashpartitioning") == 1, plan
        assert "hashpartitioning(doc_id" in plan, plan
        assert plan.count("HashAggregate") == 4, plan
    finally:
        spark.conf.unset(key)
    # Default arm, WIDE-scan regime (the 100 TB case): shrink the split
    # size so the scan plans >= parallelism partitions, fan_out no-ops,
    # and the two aggregation exchanges ((doc_id, gram) then doc_id) show.
    # At the local narrow-scan regime fan_out's own doc_id repartition
    # makes the default arm collapse to the same one-exchange shape —
    # that's the widen fix, not plan (c).
    try:
        spark.conf.set("spark.sql.files.maxPartitionBytes", "1024")
        spark.conf.set("spark.sql.files.openCostInBytes", "0")
        plan = _physical_plan(QS[name](spark, sf_dir))
        assert any(
            "hashpartitioning(doc_id" in ln and "gram" in ln
            for ln in plan.splitlines()
            if "Exchange" in ln
        ), plan
        assert plan.count("HashAggregate") == 4, plan
    finally:
        spark.conf.unset("spark.sql.files.maxPartitionBytes")
        spark.conf.unset("spark.sql.files.openCostInBytes")


def test_length_bucketing_broadcast_21_rows(spark, sf_dir):
    """r14: the bucket assignment must be a BROADCAST join against the 21
    power-of-2 rows (a shuffled range join over the corpus would be the
    scale killer), and the corpus is exchanged only by the ≤21-key
    aggregate — shuffles stay ≤ 3 (bucket agg + global agg + the tiny
    broadcast's own exchange never counts)."""
    df = QS["q_length_bucket_packing"](spark, sf_dir)
    assert has_broadcast_join(df)
    assert shuffle_count(df) <= 3, shuffle_count(df)
    cols = read_schema_columns(df)
    assert all("text" in c or "doc_id" in c or len(c) <= 2 for c in cols)


def test_kneser_ney_single_corpus_exchange(spark, sf_dir):
    """r14: the bigram TYPE table c2 is the only corpus-sized exchange;
    everything downstream (c1 / pre / tot / the top panel) aggregates the
    persisted type table.  The returned frame is materialized, so pin the
    pre-materialization shape: build the same plan inline and assert the
    explode feeds exactly one wide exchange."""
    from pyspark.sql import functions as F

    from changesetmd_spark.operators.util import fan_out
    from changesetmd_spark.tables import load_table

    bg = (
        fan_out(load_table(spark, sf_dir, "documents"), "doc_id")
        .select(
            "doc_id",
            F.split(F.lower(F.trim(F.col("text"))), r"\s+").alias("toks"),
        )
        .filter(F.size("toks") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(toks) - 1), "
                    "i -> struct(toks[i - 1] AS a, toks[i] AS b))"
                )
            ).alias("p")
        )
        .select("p.a", "p.b")
    )
    c2 = bg.groupBy("a", "b").agg(F.count("*").alias("n2"))
    assert shuffle_count(c2) <= 2, shuffle_count(c2)


def test_q10_pushes_returnflag_and_broadcasts_dims(spark, sf_dir):
    """r14: the returnflag filter must reach the lineitem scan and the
    customer x nation dim must broadcast (the fact table never shuffles
    for a dimension)."""
    df = QS["q10_returned_item_revenue"](spark, sf_dir)
    assert has_broadcast_join(df)
    assert any("l_returnflag" in p for p in pushed_filters(df)), (
        pushed_filters(df)
    )


def test_q14_part_scan_prunes_to_two_columns(spark, sf_dir):
    """r14: the part side must read only (p_partkey, p_type) — a 100 TB
    part table scanned for all columns would dwarf the query."""
    df = QS["q14_promo_revenue_share"](spark, sf_dir)
    assert has_broadcast_join(df)
    part_cols = [c for c in read_schema_columns(df) if "p_partkey" in c]
    assert part_cols and all(len(c) <= 2 for c in part_cols), part_cols


def test_gini_no_single_partition_rank(spark, sf_dir):
    """q_gini_user_concentration must rank via the two-phase prefix
    machinery (VERDICT r14 #1): the old unpartitioned
    `row_number() OVER (ORDER BY x, user_id)` planned `Exchange
    SinglePartition` + a ONE-TASK sort over the full per-user frame — a
    driver-of-the-job bottleneck at 10⁹–10¹² users.  The rank window must
    be partitioned by the pinned range-partition id; the only
    SinglePartition exchange allowed is the final 1-row global aggregate
    over CONSTANT-SIZE partials (4 values × #partitions), never one
    feeding a Sort or Window."""
    df = QS["q_gini_user_concentration"](spark, sf_dir)
    plan = _physical_plan(df)
    assert "Window" in plan and "_pid" in plan, plan  # two-phase rank
    # every SinglePartition exchange must feed a final HashAggregate over
    # partials, not a Sort/Window over data
    lines = plan.splitlines()
    for idx, line in enumerate(lines):
        if "Exchange SinglePartition" not in line:
            continue
        consumer = lines[idx - 1] if idx else ""
        assert "HashAggregate" in consumer, plan
        producer = lines[idx + 1] if idx + 1 < len(lines) else ""
        assert "partial_" in producer, plan


def test_argmin_supplier_no_window_no_sort(spark, sf_dir):
    """q_argmin_supplier_per_part claims a struct-extremum argmin — the
    plan must be hash aggregates + broadcast dims, with NO Window and no
    per-group Sort (the oracle's ROW_NUMBER form is the slow shape)."""
    df = QS["q_argmin_supplier_per_part"](spark, sf_dir)
    plan = _physical_plan(df)
    assert "Window" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_drawdown_window_partitioned_by_type(spark, sf_dir):
    """q_max_drawdown's running max must ride a per-type window over the
    (type, hour) aggregate frame — never an unpartitioned sort of events."""
    df = QS["q_max_drawdown"](spark, sf_dir)
    plan = _physical_plan(df)
    assert "Exchange SinglePartition" not in plan, plan
    assert "Window" in plan and "event_type" in plan


def test_skyline_windows_domain_frame_only(spark, sf_dir):
    """q_pareto_frontier_docs' suffix-max window runs over the per-length
    aggregate (domain-bounded), which the plan shows as Window AFTER a
    HashAggregate keyed on len — and the corpus is never self-joined
    (no doc×doc shape: exactly one join, the len equi-join back)."""
    df = QS["q_pareto_frontier_docs"](spark, sf_dir)
    plan = _physical_plan(df)
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    # the window's input must be the len-keyed aggregate, not raw docs
    w = plan.index("Window")
    assert "HashAggregate" in plan[w:], plan


def test_rendezvous_is_map_only_until_rollup(spark, sf_dir):
    """q_rendezvous_shard_balance must not explode or shuffle per-shard
    rows: one aggregate exchange on the ≤16-key shard space, a broadcast
    total — no Generate (explode) node at all."""
    df = QS["q_rendezvous_shard_balance"](spark, sf_dir)
    plan = _physical_plan(df)
    assert "Generate" not in plan, plan
    assert shuffle_count(df) <= 2, shuffle_count(df)


def test_winnowing_no_regex_above_generate(spark, sf_dir):
    """r17 regression guard for the explode-sibling trap (PLANS.md r17):
    an expensive expression selected NEXT TO a posexplode lands in the
    Project ABOVE Generate and is re-evaluated once per exploded row —
    q_winnowed_fingerprints paid 45 of its 54 s at 300x recomputing the
    document token count per gram.  The staged shape keeps every regex at
    or below the Generate node."""
    import io
    from contextlib import redirect_stdout

    df = QS["q_winnowed_fingerprints"](spark, sf_dir)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    # walk the node details: any Project whose input carries the exploded
    # pos0/gram columns must not re-evaluate a regexp over the raw text
    for block in plan.split("\n\n"):
        if block.lstrip().startswith("(") and "Project" in block.split("\n")[0]:
            if "pos0" in block and "Input" in block:
                assert "regexp_extract_all(text" not in block, block


def test_quality_classifier_constant_exchange_shape(spark, sf_dir):
    """The Newton step's returned frame (the loss pass) must stay at the
    documented shape: the per-doc feature aggregate's exchange plus the
    single-row fold — never a corpus join."""
    df = QS["q_quality_classifier_train_step"](spark, sf_dir)
    assert shuffle_count(df) <= 3, shuffle_count(df)
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan  # weights x loss is broadcast
