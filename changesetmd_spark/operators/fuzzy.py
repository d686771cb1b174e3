"""Fuzzy (approximate-string) matching with stacked blocking (SURVEY §2.3
extension — the entity-resolution join a record-linkage / dedup pipeline
runs over customer or vendor names at warehouse scale).

The classic shape: an all-pairs Levenshtein join is O(n²) and dead at
10⁸ entities, so production ER *blocks* first — group candidates by a
cheap deterministic key, compare only within blocks, and bound the
per-block quadratic term.  A single key has a blind spot (an edit inside
the keyed region escapes its block), so this operator stacks TWO keys —
name prefix and name suffix — and unions their candidate sets, deduping
pairs BEFORE the Levenshtein gate so no pair pays the DP twice
(VERDICT r11 #5).  A single edit can only break one of the two keys when
the name is long enough that the keyed regions don't overlap (length ≥
2·block_len); the residual miss for short names with a mid-string edit
is pinned by the referee test.  Both Spark and DuckDB ship the same
classic Levenshtein DP and identical substring semantics, so the whole
stacked pipeline stays engine-exact and hash-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load_table

_FUZZY_MAX_DIST = 1     # emit pairs within this edit distance
_FUZZY_BLOCK_LEN = 16   # block keys = name prefix / suffix of this length


def blocked_fuzzy_pairs(
    df: DataFrame,
    key: str = "c_custkey",
    name: str = "c_name",
    block_len: int = _FUZZY_BLOCK_LEN,
    max_dist: int = _FUZZY_MAX_DIST,
) -> DataFrame:
    """Stacked-block fuzzy self-join: candidates share the ``block_len``-char
    prefix OR suffix of ``name``; the union is deduped per unordered pair
    (one exchange on the pair key) before the JVM-side Levenshtein gate, so
    a pair blocked by both keys runs the DP once.  Returns
    (custkey_1, custkey_2, edit_dist) in canonical key order."""
    suffix = F.expr(
        f"substring({name}, greatest(1, length({name}) - {block_len - 1}), "
        f"{block_len})"
    )
    c = df.select(
        F.col(key).alias("k"),
        F.col(name).alias("n"),
        F.substring(name, 1, block_len).alias("blk_p"),
        suffix.alias("blk_s"),
    )

    def half(blk: str) -> DataFrame:
        a = c.select(
            F.col("k").alias("custkey_1"),
            F.col("n").alias("name_1"),
            F.col(blk).alias("blk"),
        )
        b = c.select(
            F.col("k").alias("custkey_2"),
            F.col("n").alias("name_2"),
            F.col(blk).alias("blk"),
        )
        return (
            a.join(b, "blk")
            .filter(F.col("custkey_1") < F.col("custkey_2"))
            .select("custkey_1", "custkey_2", "name_1", "name_2")
        )

    cand = half("blk_p").unionAll(half("blk_s")).distinct()
    return (
        cand.withColumn(
            "edit_dist", F.levenshtein("name_1", "name_2").cast("long")
        )
        .filter(F.col("edit_dist") <= max_dist)
        .select("custkey_1", "custkey_2", "edit_dist")
    )


@register(
    "q_fuzzy_name_pairs",
    oracle=f"""
    WITH c AS (
      SELECT c_custkey, c_name,
             substr(c_name, 1, {_FUZZY_BLOCK_LEN}) AS blk_p,
             substr(c_name,
                    GREATEST(1, length(c_name) - {_FUZZY_BLOCK_LEN - 1}),
                    {_FUZZY_BLOCK_LEN}) AS blk_s
      FROM customer
    ), cand AS (
      SELECT a.c_custkey AS custkey_1, b.c_custkey AS custkey_2,
             a.c_name AS name_1, b.c_name AS name_2
      FROM c a JOIN c b
        ON a.blk_p = b.blk_p AND a.c_custkey < b.c_custkey
      UNION
      SELECT a.c_custkey, b.c_custkey, a.c_name, b.c_name
      FROM c a JOIN c b
        ON a.blk_s = b.blk_s AND a.c_custkey < b.c_custkey
    )
    SELECT custkey_1, custkey_2,
           CAST(levenshtein(name_1, name_2) AS BIGINT) AS edit_dist
    FROM cand
    WHERE levenshtein(name_1, name_2) <= {_FUZZY_MAX_DIST}
    """,
)
def q_fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stacked-block fuzzy self-join over customer names: candidates share
    a {_FUZZY_BLOCK_LEN}-char prefix OR suffix block, survivors are within
    Levenshtein distance {_FUZZY_MAX_DIST} — the record-linkage primitive
    (Fellegi-Sunter blocking + edit-distance compare; public method), with
    the multi-key candidate union production ER stacks to shrink the
    single-key blind spot (an edit inside one keyed region is caught by
    the other key whenever the name spans both).

    Scale shape: each block arm is an EQUI-join on its key (shuffle by
    block, never all-pairs; per-block quadratic bounded — a skew-prone
    corpus would cap with util.drop_oversized_groups exactly like the LSH
    buckets); the union dedups on the unordered pair key in one exchange
    BEFORE the Levenshtein gate, so the DP (JVM-side, no UDF) runs once
    per distinct candidate pair.  Residual recall trade, pinned by the
    referee: a name shorter than 2×{_FUZZY_BLOCK_LEN} chars with a
    mid-string edit escapes both keys (the regions overlap); the fix at
    ER scale is a third phonetic/sorted-token key, same union shape."""
    return blocked_fuzzy_pairs(load_table(spark, sf_dir, "customer"))
