"""Bloom-filter join prefiltering (SURVEY §2.3 extension — the join-side
scan-reduction a 100 TB warehouse lives on).

Spark itself injects runtime bloom filters
(``spark.sql.optimizer.runtime.bloomFilter.enabled``) when a selective
build side can prune a huge probe side BEFORE the join shuffle.  This
operator materializes that exact mechanism as an explicit, hash-checkable
query: build a Bloom bitset from the selective dimension keys, test every
fact row against it with k md5-derived positions, and report the
filter's measured selectivity and false-positive rate.  Public method
(Bloom 1970); the md5-position derivation matches the engine-portable
hashing used by the checked MinHash twin (dedup.py:404).

Everything is integer arithmetic + one rational division, so Spark and
DuckDB agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load_table

_BLOOM_M = 131072  # bits; sized for ~30k build keys at 3 hashes
# (production sizes m ≈ n·k/ln 2 from the build-side count; a fixed
# width keeps the query hash-deterministic across engines)
_BLOOM_K = 3      # hash functions per key


def _bloom_pos(key: Column, i: int) -> Column:
    """Position of hash function ``i`` for ``key`` — first 15 hex digits of
    md5 as a 60-bit long, mod the filter width.  DuckDB mirror:
    ``('0x' || substr(md5(i || ':' || key), 1, 15))::BIGINT % m``."""
    s = F.concat_ws(":", F.lit(str(i)), key.cast("string"))
    return (
        F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")
        % _BLOOM_M
    )


@register(
    "q_bloom_prefilter_join",
    oracle=f"""
    WITH urgent AS (
      SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
    ), bits AS (
      SELECT DISTINCT
        ('0x' || substr(md5(h.i || ':' || CAST(o_orderkey AS VARCHAR)),
                        1, 15))::BIGINT % {_BLOOM_M} AS pos
      FROM urgent, (VALUES (0), (1), (2)) AS h(i)
    ), fact AS (
      SELECT l_orderkey,
             ('0x' || substr(md5('0:' || CAST(l_orderkey AS VARCHAR)), 1, 15))::BIGINT
               % {_BLOOM_M} AS p0,
             ('0x' || substr(md5('1:' || CAST(l_orderkey AS VARCHAR)), 1, 15))::BIGINT
               % {_BLOOM_M} AS p1,
             ('0x' || substr(md5('2:' || CAST(l_orderkey AS VARCHAR)), 1, 15))::BIGINT
               % {_BLOOM_M} AS p2
      FROM lineitem
    ), flagged AS (
      SELECT l_orderkey,
             (p0 IN (SELECT pos FROM bits)
              AND p1 IN (SELECT pos FROM bits)
              AND p2 IN (SELECT pos FROM bits)) AS bloom_pass,
             l_orderkey IN (SELECT o_orderkey FROM urgent) AS exact_match
      FROM fact
    )
    SELECT COUNT(*) AS n_fact,
           CAST(SUM(CASE WHEN bloom_pass THEN 1 ELSE 0 END) AS BIGINT)
             AS n_bloom_pass,
           CAST(SUM(CASE WHEN exact_match THEN 1 ELSE 0 END) AS BIGINT)
             AS n_exact,
           CAST(SUM(CASE WHEN bloom_pass AND NOT exact_match THEN 1 ELSE 0 END)
                AS BIGINT) AS n_false_pos,
           ROUND(SUM(CASE WHEN bloom_pass AND NOT exact_match THEN 1 ELSE 0 END)
                 * 1.0
                 / (COUNT(*) - SUM(CASE WHEN exact_match THEN 1 ELSE 0 END)),
                 6) AS fp_rate
    FROM flagged
    """,
)
def q_bloom_prefilter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit Bloom prefilter for the urgent-orders⋈lineitem join: an
    {_BLOOM_M}-bit / {_BLOOM_K}-hash filter built from the selective build
    side (urgent order keys), probed by every lineitem row; reports fact
    cardinality, bloom-pass count, exact-match count, false positives, and
    the measured false-positive rate.  The Bloom guarantee — NO false
    negatives, i.e. ``n_exact ≤ n_bloom_pass`` — is pinned by the referee
    test.

    Scale shape: the bitset is ≤ {_BLOOM_M} distinct positions — a
    broadcast-sized frame regardless of fact size — and the probe is
    {_BLOOM_K} broadcast hash left-joins (null-check per position), so the
    100 TB fact side is never shuffled and never explodes; position
    hashing is JVM-side codegen (conv∘substring∘md5).  This is exactly
    Spark's runtime row-level bloom pushdown, made explicit and
    engine-checkable."""
    urgent = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey")
    )
    bits = (
        urgent.select(
            F.explode(
                F.array(
                    *[_bloom_pos(F.col("o_orderkey"), i) for i in range(_BLOOM_K)]
                )
            ).alias("pos")
        )
        .distinct()
    )
    fact = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    for i in range(_BLOOM_K):
        fact = fact.withColumn(f"p{i}", _bloom_pos(F.col("l_orderkey"), i))
    probed = fact
    for i in range(_BLOOM_K):
        probed = probed.join(
            F.broadcast(
                bits.select(
                    F.col("pos").alias(f"p{i}"), F.lit(True).alias(f"hit{i}")
                )
            ),
            f"p{i}",
            "left",
        )
    probed = probed.join(
        F.broadcast(
            urgent.select(
                F.col("o_orderkey").alias("l_orderkey"),
                F.lit(True).alias("exact_hit"),
            ).distinct()
        ),
        "l_orderkey",
        "left",
    )
    all_hits = F.col("hit0").isNotNull()
    for i in range(1, _BLOOM_K):
        all_hits = all_hits & F.col(f"hit{i}").isNotNull()
    flagged = probed.select(
        all_hits.alias("bloom_pass"),
        F.col("exact_hit").isNotNull().alias("exact_match"),
    )
    return flagged.agg(
        F.count("*").alias("n_fact"),
        F.sum(F.when(F.col("bloom_pass"), 1).otherwise(0))
        .cast("long")
        .alias("n_bloom_pass"),
        F.sum(F.when(F.col("exact_match"), 1).otherwise(0))
        .cast("long")
        .alias("n_exact"),
        F.sum(
            F.when(F.col("bloom_pass") & ~F.col("exact_match"), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_false_pos"),
        F.round(
            F.sum(
                F.when(
                    F.col("bloom_pass") & ~F.col("exact_match"), 1
                ).otherwise(0)
            )
            * 1.0
            / (
                F.count("*")
                - F.sum(F.when(F.col("exact_match"), 1).otherwise(0))
            ),
            6,
        ).alias("fp_rate"),
    )
