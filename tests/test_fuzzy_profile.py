"""Referee tests for the blocked fuzzy ER join (``operators/fuzzy.py``)
and the table-profile pass (``operators/profile.py``) — wired per VERDICT
r8 next-round #1.  The DuckDB hash parity for both lives in
``test_oracle_queries.py``; these pin the operator-level invariants the
hash alone can't express."""

from __future__ import annotations

from pyspark.sql import functions as F

from changesetmd_spark.operators.fuzzy import (
    _FUZZY_BLOCK_LEN,
    _FUZZY_MAX_DIST,
    q_fuzzy_name_pairs,
)
from changesetmd_spark.operators.profile import q_table_profile


def test_fuzzy_pairs_canonical_no_self(spark, sf_dir):
    rows = q_fuzzy_name_pairs(spark, sf_dir).collect()
    for r in rows:
        # canonical orientation: each unordered pair emitted exactly once,
        # never a self-pair (symmetry is implied: lev(a,b) == lev(b,a), so
        # one orientation carries the full relation)
        assert r.custkey_1 < r.custkey_2
        assert 0 <= r.edit_dist <= _FUZZY_MAX_DIST


def test_fuzzy_blocking_is_exact_within_block(spark):
    """Referee on a hand-built frame (VERDICT r11 #5): the stacked
    prefix+suffix blocking must catch a distance-1 pair whose edit falls
    inside the PREFIX key (single-prefix blocking provably misses it — the
    prefix-only arm is re-run standalone to prove that), must not
    double-emit a pair caught by both keys, and the residual miss —
    a short name with a mid-string edit breaking both keys at once — stays
    pinned so the recall trade is visible."""
    from changesetmd_spark.operators.fuzzy import blocked_fuzzy_pairs

    df = spark.createDataFrame(
        [
            (1, "Customer#000000001"),
            (2, "Customer#000000002"),  # dist 1 from #1, same 16-prefix
            # dist 1 from #1 with the edit INSIDE the 16-prefix: prefix
            # blocking misses it, the 16-suffix ("tomer#000000001") catches
            (3, "Xustomer#000000001"),
            # 20-char name pair, edit at position 10: inside the 16-prefix
            # AND inside the 16-suffix (regions overlap below 32 chars) —
            # missed by both keys, the documented residual trade
            (4, "shortname-X-1234567a"),
            (5, "shortname-Y-1234567a"),
        ],
        "c_custkey int, c_name string",
    )
    out = blocked_fuzzy_pairs(df)
    pairs = {(r.custkey_1, r.custkey_2) for r in out.collect()}
    assert (1, 2) in pairs  # caught by prefix arm (edit beyond prefix)
    assert (1, 3) in pairs  # caught ONLY by the suffix arm
    assert (4, 5) not in pairs  # residual miss: edit inside both keys
    # no double emission: (1,2) shares prefix AND suffix blocks, but the
    # pre-gate dedup makes every unordered pair appear exactly once
    assert out.count() == len(pairs)

    # prove the single-key version misses the cross-block pair
    c = df.select(
        "c_custkey",
        "c_name",
        F.substring("c_name", 1, _FUZZY_BLOCK_LEN).alias("blk"),
    )
    a = c.select(
        F.col("c_custkey").alias("custkey_1"),
        F.col("c_name").alias("name_1"),
        "blk",
    )
    b = c.select(
        F.col("c_custkey").alias("custkey_2"),
        F.col("c_name").alias("name_2"),
        "blk",
    )
    prefix_only = {
        (r.custkey_1, r.custkey_2)
        for r in a.join(b, "blk")
        .filter(F.col("custkey_1") < F.col("custkey_2"))
        .filter(F.levenshtein("name_1", "name_2") <= _FUZZY_MAX_DIST)
        .collect()
    }
    assert (1, 2) in prefix_only
    assert (1, 3) not in prefix_only  # the single-key blind spot


def test_profile_counts_planted_nulls(spark):
    """n_null / n_distinct / min / max on a frame with planted NULLs —
    COUNT(DISTINCT) must ignore NULLs, n_null must count them, min/max
    must render through the deterministic casts."""
    df = spark.createDataFrame(
        [
            (1, None, "F", 10.50, "1994-01-01", "1-URGENT"),
            (2, 7, "O", None, "1995-06-15", "3-MEDIUM"),
            (3, 7, None, 99.99, None, "1-URGENT"),
            (4, 9, "F", 10.50, "1994-01-01", None),
        ],
        "o_orderkey int, o_custkey int, o_orderstatus string, "
        "o_totalprice double, o_orderdate string, o_orderpriority string",
    )
    import changesetmd_spark.operators.profile as prof
    import changesetmd_spark.tables as tables

    orig = tables.load_table
    try:
        tables.load_table = lambda s, d, n: df
        prof.load_table = tables.load_table
        out = {r.col_name: r for r in q_table_profile(spark, "ignored").collect()}
    finally:
        tables.load_table = orig
        prof.load_table = orig

    assert out["o_custkey"].n_null == 1
    assert out["o_custkey"].n_distinct == 2  # {7, 9}; NULL excluded
    assert out["o_orderstatus"].n_null == 1
    assert out["o_totalprice"].min_val == "10.50"
    assert out["o_totalprice"].max_val == "99.99"
    assert out["o_orderdate"].min_val == "1994-01-01"
    for r in out.values():
        assert r.n_rows == 4


def test_profile_one_row_per_column(spark, sf_dir):
    rows = q_table_profile(spark, sf_dir).collect()
    names = [r.col_name for r in rows]
    assert len(names) == len(set(names)) == 6
