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
        # Two r17 changes, same output (oracle hash green at sf0.01):
        # 1. Threshold Levenshtein (Spark 3.5+): the banded DP stops once
        #    distance provably exceeds ``max_dist`` and returns -1; almost
        #    every candidate pair is far apart, so the common case is
        #    O(len·max_dist) instead of O(len²), and survivors' returned
        #    distances are exact — identical values to the unbounded form.
        # 2. Gate INSIDE each block arm, before the pair-dedup exchange
        #    (guide §2.3: filter before you shuffle).  The r11 "dedup
        #    before the DP" ordering was right when the DP was unbounded
        #    and dominant; with the thresholded DP at ~50 ns/pair the
        #    economics flip — shuffling every candidate pair (name payloads
        #    included) costs far more than running the cheap gate twice on
        #    the few pairs both keys block.  The distinct then dedups the
        #    tiny survivor set (keys + dist only, no name payload).
        return (
            a.join(b, "blk")
            .filter(F.col("custkey_1") < F.col("custkey_2"))
            .withColumn(
                "edit_dist",
                F.levenshtein("name_1", "name_2", max_dist).cast("long"),
            )
            .filter(F.col("edit_dist") >= 0)
            .select("custkey_1", "custkey_2", "edit_dist")
        )

    return half("blk_p").unionAll(half("blk_s")).distinct()


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


# ---------------------------------------------------------------------------
# Fellegi-Sunter match scoring (r15): log-likelihood weights over the
# blocked candidate pairs — the probabilistic tier above the edit gate.
# ---------------------------------------------------------------------------
# pinned m-probabilities (P(field agrees | true match)) — the standard
# no-labeled-data practice; u-probabilities are ESTIMATED EXACTLY from the
# data as the random-pair agreement rate Σ n_v(n_v−1) / N(N−1)
_FS_M = {"nation": 0.9, "seg": 0.9, "bal": 0.8}
_FS_TOP = 20


@register(
    "q_fellegi_sunter_scores",
    oracle=f"""
    WITH c AS (
      SELECT c_custkey, c_name, c_nationkey, c_mktsegment,
             CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS bal_bucket,
             substr(c_name, 1, {_FUZZY_BLOCK_LEN}) AS blk
      FROM customer
    ), n AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n FROM c),
    u_nation AS (
      SELECT CAST(SUM(CAST(k AS HUGEINT) * (k - 1)) AS HUGEINT) AS num
      FROM (SELECT COUNT(*) AS k FROM c GROUP BY c_nationkey)
    ), u_seg AS (
      SELECT CAST(SUM(CAST(k AS HUGEINT) * (k - 1)) AS HUGEINT) AS num
      FROM (SELECT COUNT(*) AS k FROM c GROUP BY c_mktsegment)
    ), u_bal AS (
      SELECT CAST(SUM(CAST(k AS HUGEINT) * (k - 1)) AS HUGEINT) AS num
      FROM (SELECT COUNT(*) AS k FROM c GROUP BY bal_bucket)
    ), pairs AS (
      SELECT a.c_custkey AS custkey_1, b.c_custkey AS custkey_2,
             CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS edit_dist,
             CASE WHEN a.c_nationkey = b.c_nationkey THEN 1 ELSE 0 END
               AS ag_nation,
             CASE WHEN a.c_mktsegment = b.c_mktsegment THEN 1 ELSE 0 END
               AS ag_seg,
             CASE WHEN a.bal_bucket = b.bal_bucket THEN 1 ELSE 0 END
               AS ag_bal
      FROM c a JOIN c b ON a.blk = b.blk AND a.c_custkey < b.c_custkey
    ), scored AS (
      SELECT custkey_1, custkey_2, edit_dist,
             ag_nation + ag_seg + ag_bal AS n_agree,
             ROUND(
               (CASE WHEN ag_nation = 1
                 THEN ln({_FS_M['nation']}) - ln(CAST(u_nation.num AS DOUBLE)
                                                 / CAST(n.n * (n.n-1) AS DOUBLE))
                 ELSE ln(1 - {_FS_M['nation']})
                      - ln(1 - CAST(u_nation.num AS DOUBLE)
                               / CAST(n.n * (n.n-1) AS DOUBLE)) END)
             + (CASE WHEN ag_seg = 1
                 THEN ln({_FS_M['seg']}) - ln(CAST(u_seg.num AS DOUBLE)
                                              / CAST(n.n * (n.n-1) AS DOUBLE))
                 ELSE ln(1 - {_FS_M['seg']})
                      - ln(1 - CAST(u_seg.num AS DOUBLE)
                               / CAST(n.n * (n.n-1) AS DOUBLE)) END)
             + (CASE WHEN ag_bal = 1
                 THEN ln({_FS_M['bal']}) - ln(CAST(u_bal.num AS DOUBLE)
                                              / CAST(n.n * (n.n-1) AS DOUBLE))
                 ELSE ln(1 - {_FS_M['bal']})
                      - ln(1 - CAST(u_bal.num AS DOUBLE)
                               / CAST(n.n * (n.n-1) AS DOUBLE)) END), 6)
               AS fs_weight
      FROM pairs, n, u_nation, u_seg, u_bal
    )
    SELECT custkey_1, custkey_2, edit_dist,
           CAST(n_agree AS BIGINT) AS n_agree, fs_weight
    FROM scored
    ORDER BY fs_weight DESC, custkey_1, custkey_2
    LIMIT {_FS_TOP}
    """,
)
def q_fellegi_sunter_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi-Sunter probabilistic record linkage (1969, public method)
    over the name-blocked candidate pairs: each categorical field
    (nation, market segment, $1000 balance bucket) contributes
    ln(m/u) on agreement and ln((1−m)/(1−u)) on disagreement; the pair's
    total log-likelihood weight ranks match candidates the way every
    production ER engine (Splink et al.) does.  m-probabilities are the
    pinned no-labeled-data priors; u-probabilities are estimated from
    THIS corpus as the exact random-pair agreement rate
    Σ n_v(n_v−1)/N(N−1).

    Exactness: every u numerator/denominator is an exact HUGEINT/DECIMAL
    integer; each pair's weight is ONE double expression over those
    rationals (identically parenthesized in both engines), rounded to 6
    before the (weight, key, key) ordering — the cut can't flip on a ln
    ulp.

    Scale shape: u estimation is three map-side-combined aggregates on
    low-cardinality keys + 1-row reduces (broadcast back); candidates
    come from the prefix-block equi-join (never all-pairs — per-block
    quadratic, skew-cappable like the LSH buckets); the top-{_FS_TOP} is
    a TakeOrdered."""
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000).cast("long").alias("bal_bucket"),
        F.substring("c_name", 1, _FUZZY_BLOCK_LEN).alias("blk"),
    )
    n = c.agg(F.count("*").cast("decimal(38,0)").alias("n"))

    def u_num(col: str):
        return (
            c.groupBy(col)
            .agg(F.count("*").cast("decimal(38,0)").alias("k"))
            .agg(
                F.sum(F.col("k") * (F.col("k") - 1))
                .cast("decimal(38,0)")
                .alias("num")
            )
        )

    a = c.select(
        F.col("c_custkey").alias("custkey_1"),
        F.col("c_name").alias("name_1"),
        F.col("c_nationkey").alias("nat_1"),
        F.col("c_mktsegment").alias("seg_1"),
        F.col("bal_bucket").alias("bal_1"),
        "blk",
    )
    b = c.select(
        F.col("c_custkey").alias("custkey_2"),
        F.col("c_name").alias("name_2"),
        F.col("c_nationkey").alias("nat_2"),
        F.col("c_mktsegment").alias("seg_2"),
        F.col("bal_bucket").alias("bal_2"),
        "blk",
    )
    pairs = (
        a.join(b, "blk")
        .filter(F.col("custkey_1") < F.col("custkey_2"))
        .select(
            "custkey_1",
            "custkey_2",
            # names carried through, NOT compared here: the report is the
            # top-20 by (fs_weight, keys), and fs_weight never reads
            # edit_dist — so the Levenshtein DP is deferred to after the
            # TakeOrdered and runs on 20 pairs instead of every blocked
            # candidate (guide §1.2: don't compute things you throw away;
            # r17 measurement: 4.1 s → 2.5 s warm at sf0.1).  Same rows,
            # same values: survivors' distances are computed identically.
            "name_1",
            "name_2",
            F.when(F.col("nat_1") == F.col("nat_2"), 1)
            .otherwise(0)
            .alias("ag_nation"),
            F.when(F.col("seg_1") == F.col("seg_2"), 1)
            .otherwise(0)
            .alias("ag_seg"),
            F.when(F.col("bal_1") == F.col("bal_2"), 1)
            .otherwise(0)
            .alias("ag_bal"),
        )
    )
    scored = (
        pairs.crossJoin(F.broadcast(n))
        .crossJoin(
            F.broadcast(u_num("c_nationkey").select(F.col("num").alias("un")))
        )
        .crossJoin(
            F.broadcast(u_num("c_mktsegment").select(F.col("num").alias("us")))
        )
        .crossJoin(
            F.broadcast(u_num("bal_bucket").select(F.col("num").alias("ub")))
        )
    )
    den = (F.col("n") * (F.col("n") - 1)).cast("double")

    def field_w(flag: str, num_col: str, m: float):
        u = F.col(num_col).cast("double") / den
        return F.when(
            F.col(flag) == 1, F.log(F.lit(m)) - F.log(u)
        ).otherwise(F.log(F.lit(1 - m)) - F.log(1 - u))

    return (
        scored.select(
            "custkey_1",
            "custkey_2",
            "name_1",
            "name_2",
            (F.col("ag_nation") + F.col("ag_seg") + F.col("ag_bal"))
            .cast("long")
            .alias("n_agree"),
            F.round(
                field_w("ag_nation", "un", _FS_M["nation"])
                + field_w("ag_seg", "us", _FS_M["seg"])
                + field_w("ag_bal", "ub", _FS_M["bal"]),
                6,
            ).alias("fs_weight"),
        )
        .orderBy(
            F.desc("fs_weight"), F.asc("custkey_1"), F.asc("custkey_2")
        )
        .limit(_FS_TOP)
        .select(
            "custkey_1",
            "custkey_2",
            F.levenshtein("name_1", "name_2").cast("long").alias("edit_dist"),
            "n_agree",
            "fs_weight",
        )
    )
