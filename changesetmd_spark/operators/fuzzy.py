"""Fuzzy (approximate-string) matching with blocking (SURVEY §2.3
extension — the entity-resolution join a record-linkage / dedup pipeline
runs over customer or vendor names at warehouse scale).

The classic shape: an all-pairs Levenshtein join is O(n²) and dead at
10⁸ entities, so production ER *blocks* first — group candidates by a
cheap deterministic key (prefix, phonetic code, length band), compare
only within blocks, and bound the per-block quadratic term.  Both Spark
and DuckDB ship the same classic Levenshtein DP, so the whole pipeline
is engine-exact and hash-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load_table

_FUZZY_MAX_DIST = 1     # emit pairs within this edit distance
_FUZZY_BLOCK_LEN = 16   # block key = name prefix of this length


@register(
    "q_fuzzy_name_pairs",
    oracle=f"""
    WITH c AS (
      SELECT c_custkey, c_name,
             substr(c_name, 1, {_FUZZY_BLOCK_LEN}) AS blk
      FROM customer
    )
    SELECT a.c_custkey AS custkey_1,
           b.c_custkey AS custkey_2,
           CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS edit_dist
    FROM c a JOIN c b
      ON a.blk = b.blk AND a.c_custkey < b.c_custkey
    WHERE levenshtein(a.c_name, b.c_name) <= {_FUZZY_MAX_DIST}
    """,
)
def q_fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy self-join over customer names: candidates share a
    {_FUZZY_BLOCK_LEN}-char prefix block, survivors are within Levenshtein
    distance {_FUZZY_MAX_DIST} — the record-linkage primitive (Fellegi-
    Sunter blocking + edit-distance compare; public method).

    Scale shape: the self-join is an EQUI-join on the block key (shuffle
    by block, never all-pairs); the quadratic term is bounded per block
    (prefix blocking caps block size; a skew-prone corpus would cap with
    util.drop_oversized_groups exactly like the LSH buckets).  The
    Levenshtein DP runs JVM-side per candidate pair — no UDF.  Recall is
    the standard blocking trade: an edit inside the block prefix escapes
    the block, so production stacks multiple block keys (prefix + suffix
    + phonetic) and unions candidates; one deterministic key keeps this
    query hash-exact."""
    c = load_table(spark, sf_dir, "customer").select(
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
    return (
        a.join(b, "blk")
        .filter(F.col("custkey_1") < F.col("custkey_2"))
        .withColumn(
            "edit_dist",
            F.levenshtein("name_1", "name_2").cast("long"),
        )
        .filter(F.col("edit_dist") <= _FUZZY_MAX_DIST)
        .select("custkey_1", "custkey_2", "edit_dist")
    )
