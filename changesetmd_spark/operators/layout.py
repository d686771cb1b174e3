"""Data-layout optimization operators (SURVEY §2.11 extension — the
physical-design side of a 100 TB lakehouse).

Z-ordering (Morton-curve interleaving) is the public technique behind
Delta/Iceberg ``OPTIMIZE ZORDER BY``: interleave the bits of two (or more)
clustering keys so that range-partitioning the interleaved value yields
files whose min/max stats are TIGHT on *every* key simultaneously — the
multi-dimensional file-skipping a single-column sort cannot give.  The
reference delegates physical design to Postgres indexes
(ref changesetmd.py:241 ``CREATE INDEX`` on created_idx/tags);
a columnar lake replaces those indexes with clustered file layout + min/max
pruning, which this operator materializes and measures.

Everything here is integer bit arithmetic end-to-end, so the whole layout
assignment hash-checks against the DuckDB oracle exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load_table

_Z_BITS = 16       # bits per dimension (keys are masked to this width)
_Z_FILES = 64      # target file (bucket) count for the layout


def _interleave(a: Column, b: Column) -> Column:
    """Morton interleave of the low ``_Z_BITS`` bits of two long columns —
    a's bit i lands at position 2i+1, b's at 2i.  A sum of 2·_Z_BITS
    disjoint single-bit terms: pure JVM-side integer arithmetic, fully
    inside whole-stage codegen (no UDF)."""
    terms = []
    for i in range(_Z_BITS):
        terms.append(
            F.shiftleft(
                F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i + 1
            )
        )
        terms.append(
            F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i)
        )
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def _interleave_sql(a: str, b: str) -> str:
    """The identical Morton interleave as a DuckDB SQL expression."""
    terms = []
    for i in range(_Z_BITS):
        terms.append(f"((({a} >> {i}) & 1) << {2 * i + 1})")
        terms.append(f"((({b} >> {i}) & 1) << {2 * i})")
    return " + ".join(terms)


@register(
    "q_zorder_layout",
    oracle=f"""
    WITH z AS (
      SELECT l_partkey, l_suppkey,
             {_interleave_sql(f"(l_partkey & {(1 << _Z_BITS) - 1})",
                              f"(l_suppkey & {(1 << _Z_BITS) - 1})")} AS zval
      FROM lineitem
    ), mx AS (
      SELECT CAST(MAX(zval) // {_Z_FILES} + 1 AS BIGINT) AS width FROM z
    )
    SELECT CAST(zval // width AS BIGINT) AS file_id,
           COUNT(*) AS n_rows,
           MIN(l_partkey) AS part_min, MAX(l_partkey) AS part_max,
           MIN(l_suppkey) AS supp_min, MAX(l_suppkey) AS supp_max,
           MAX(l_partkey) - MIN(l_partkey) + 1 AS part_span,
           MAX(l_suppkey) - MIN(l_suppkey) + 1 AS supp_span
    FROM z, mx
    GROUP BY CAST(zval // width AS BIGINT)
    """,
)
def q_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton-curve) file layout over lineitem's (l_partkey,
    l_suppkey): interleave the two keys' bits, range-split the interleaved
    value into {_Z_FILES} equal-width files, and report each file's row
    count plus per-key min/max — the exact statistics a lakehouse scan
    uses for file skipping.  The span columns quantify the win: with
    Z-order, EVERY file covers only ~1/√{_Z_FILES} of each key's range, so
    a point predicate on either key prunes ~7/8 of the files; a
    single-key sort would leave the second key's spans at full width.

    Scale shape: the interleave is 2·{_Z_BITS} shift-and-mask terms inside
    whole-stage codegen; the only scalar (max zval) comes from a partial
    aggregate broadcast back as a singleton; the final rollup is one hash
    aggregate on file_id.  At 100 TB this is exactly the shuffle-free
    stats pass a real OPTIMIZE ZORDER job runs before writing — and
    `repartitionByRange(zval)` turns this manifest into the actual
    clustered write."""
    mask = (1 << _Z_BITS) - 1
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey"
    )
    z = li.withColumn(
        "zval",
        _interleave(
            F.col("l_partkey").bitwiseAND(F.lit(mask)),
            F.col("l_suppkey").bitwiseAND(F.lit(mask)),
        ),
    )
    width = z.agg(
        (
            F.floor(F.max("zval") / F.lit(_Z_FILES)) + F.lit(1)
        ).cast("long").alias("width")
    )
    return (
        z.crossJoin(F.broadcast(width))
        .groupBy(
            F.floor(F.col("zval") / F.col("width"))
            .cast("long")
            .alias("file_id")
        )
        .agg(
            F.count("*").alias("n_rows"),
            F.min("l_partkey").alias("part_min"),
            F.max("l_partkey").alias("part_max"),
            F.min("l_suppkey").alias("supp_min"),
            F.max("l_suppkey").alias("supp_max"),
            (F.max("l_partkey") - F.min("l_partkey") + 1).alias("part_span"),
            (F.max("l_suppkey") - F.min("l_suppkey") + 1).alias("supp_span"),
        )
    )


# ---------------------------------------------------------------------------
# Rendezvous (HRW) shard assignment + balance audit (r15).
# ---------------------------------------------------------------------------
_HRW_SHARDS = 16


@register(
    "q_rendezvous_shard_balance",
    oracle=f"""
    WITH w AS (
      SELECT doc_id,
             list_transform(generate_series(0, {_HRW_SHARDS} - 1),
               s -> {{'w': ('0x' || substr(md5(CAST(doc_id AS VARCHAR)
                                              || ':' || CAST(s AS VARCHAR)),
                                          1, 15))::BIGINT,
                      's': s}}) AS ws
      FROM documents
    ), assigned AS (
      SELECT doc_id,
             (list_reduce(ws, (a, b) ->
                CASE WHEN b.w > a.w OR (b.w = a.w AND b.s < a.s)
                     THEN b ELSE a END)).s AS shard
      FROM w
    ), per AS (
      SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM assigned GROUP BY shard
    ), tot AS (
      SELECT CAST(SUM(n_docs) AS BIGINT) AS n,
             CAST(MAX(n_docs) AS BIGINT) AS mx,
             CAST(MIN(n_docs) AS BIGINT) AS mn
      FROM per
    )
    SELECT CAST(shard AS BIGINT) AS shard, n_docs,
           CAST(n_docs * {_HRW_SHARDS} * 10000 // tot.n AS BIGINT)
             AS load_x10000,
           CAST(tot.mx * 10000 // tot.mn AS BIGINT) AS imbalance_x10000
    FROM per, tot
    ORDER BY shard
    """,
)
def q_rendezvous_shard_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rendezvous / highest-random-weight sharding (Thaler & Ravishankar
    1996, public method — the assignment scheme whose property is that
    adding or removing a shard moves ONLY the keys that hashed highest
    to it, unlike mod-N which reshuffles everything) over {_HRW_SHARDS}
    shards, plus the balance audit: per-shard load relative to ideal
    (×10⁴) and the global max/min imbalance every layout review reads.

    Exactness: weights are the cross-engine md5 hash (identical 60-bit
    integers in both engines); the argmax is a deterministic left fold
    with a shard-id tie-break; loads are exact integer ratios.

    Scale shape: assignment is a map-only array fold per row ({_HRW_SHARDS}
    hashes, no explode, no shuffle), then one ≤{_HRW_SHARDS}-key hash
    aggregate and a broadcast 1-row total.  At 10¹² docs the exchange
    carries {_HRW_SHARDS} partials per task."""
    ws = F.transform(
        F.sequence(F.lit(0), F.lit(_HRW_SHARDS - 1)),
        lambda s: F.struct(
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.col("doc_id").cast("string"),
                            F.lit(":"),
                            s.cast("string"),
                        )
                    ),
                    1,
                    15,
                ),
                16,
                10,
            )
            .cast("long")
            .alias("w"),
            s.alias("s"),
        ),
    )
    assigned = load_table(spark, sf_dir, "documents").select(
        F.aggregate(
            ws,
            F.struct(F.lit(-1).cast("long").alias("w"), F.lit(-1).alias("s")),
            lambda a, b: F.when(
                (b["w"] > a["w"]) | ((b["w"] == a["w"]) & (b["s"] < a["s"])),
                b,
            ).otherwise(a),
        )["s"].alias("shard")
    )
    # materialize the ≤16-row shard frame once: tot would otherwise
    # recompute the whole scan+fold+aggregate lineage on its branch
    # (plan audit: 4 exchanges → 1 post-checkpoint)
    per = (
        assigned.groupBy("shard")
        .agg(F.count("*").cast("long").alias("n_docs"))
        .localCheckpoint(eager=True)
    )
    tot = per.agg(
        F.sum("n_docs").cast("long").alias("n"),
        F.max("n_docs").cast("long").alias("mx"),
        F.min("n_docs").cast("long").alias("mn"),
    )
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            F.col("shard").cast("long").alias("shard"),
            "n_docs",
            F.expr(f"n_docs * {_HRW_SHARDS} * 10000 div n").alias(
                "load_x10000"
            ),
            F.expr("mx * 10000 div mn").alias("imbalance_x10000"),
        )
        .orderBy("shard")
    )
