"""Bitext mining with the margin criterion (SURVEY §2.11 E2 extension —
the parallel-corpus mining pass of a multilingual training-data pipeline,
after Artetxe & Schwenk 2019 / CCMatrix).

Two embedding sets (here: the even- vs odd-``label`` halves of
``embeddings``, standing in for the two languages) are scored pairwise;
a raw cosine threshold over-selects hubs, so each pair is rescored by the
**margin**: cosine divided by the average of the two sides' k-NN cosine
averages.  Pairs whose margin clears 1.0 and win their source row's
argmax are the mined bitext.

Scale shape: the exact variant below caps the query side (the referee /
oracle tier); the production path at 100 TB composes the IVF cell
blocking already built in similarity.py (candidates = same/adjacent
cells) with this exact margin rescoring, so nothing does corpus×corpus.
All float reductions are sequential left folds (``F.aggregate`` == DuckDB
``list_reduce``) and the k-NN sums fold over an explicitly sorted list,
so the oracle matches bit-for-bit before rounding.  Reference parity:
the reference has no vector tier; this extends it per the mandated
LLM-pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load_table
from .similarity import cosine, l2_norm, to_double_vec

_DIM = 64
_K = 4  # neighborhood size for the margin denominators
_X_CAP = 200  # exact-tier query-side cap (production tier = IVF blocking)


def _knn_sum(scored: DataFrame, key: str, other: str, out: str) -> DataFrame:
    """Per-``key`` sum of its top-``_K`` cosines, folded over an explicitly
    sorted list so the summation order is engine-independent."""
    w = Window.partitionBy(key).orderBy(F.desc("cs"), F.asc(other))
    topk = scored.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= _K
    )
    return topk.groupBy(key).agg(
        F.aggregate(
            F.transform(
                F.sort_array(F.collect_list(F.struct("cs", other))),
                lambda s: s["cs"],
            ),
            F.lit(0.0),
            lambda a, b: a + b,
        ).alias(out)
    )


def scored_pairs(spark: SparkSession, sf_dir: str, *, checkpoint: bool = True) -> DataFrame:
    """Pairwise cosine between the capped even-label query side (broadcast)
    and the full odd-label candidate side.  ``checkpoint=False`` exposes
    the raw scoring plan for plan-shape tests (the production query hides
    it behind a lazy localCheckpoint because three consumers reuse it)."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", to_double_vec(F.col("embedding")).alias("e")
    )
    emb = emb.withColumn("nrm", l2_norm(F.col("e")))
    xs = emb.filter((F.col("label") % 2 == 0) & (F.col("vec_id") < _X_CAP)).select(
        F.col("vec_id").alias("x_id"),
        F.col("e").alias("xe"),
        F.col("nrm").alias("xn"),
    )
    ys = emb.filter(F.col("label") % 2 == 1).select(
        F.col("vec_id").alias("y_id"),
        F.col("e").alias("ye"),
        F.col("nrm").alias("yn"),
    )
    scored = ys.crossJoin(F.broadcast(xs)).select(
        "x_id",
        "y_id",
        cosine(F.col("xe"), F.col("ye"), F.col("xn"), F.col("yn")).alias("cs"),
    )
    return scored.localCheckpoint(eager=False) if checkpoint else scored


@register(
    "q_bitext_margin_mining",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, label,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings
    ), n AS (
      SELECT vec_id, label, e,
             sqrt(list_reduce(list_transform(e, x -> x * x), (a, b) -> a + b))
               AS nrm
      FROM v
    ), xs AS (
      SELECT vec_id AS x_id, e AS xe, nrm AS xn FROM n
      WHERE label % 2 = 0 AND vec_id < {_X_CAP}
    ), ys AS (
      SELECT vec_id AS y_id, e AS ye, nrm AS yn FROM n WHERE label % 2 = 1
    ), scored AS (
      SELECT x_id, y_id,
             list_reduce(list_transform(generate_series(1, {_DIM}),
                                        i -> xe[i] * ye[i]),
                         (a, b) -> a + b) / (xn * yn) AS cs
      FROM xs CROSS JOIN ys
    ), fwd AS (
      SELECT x_id, list_reduce(list(cs ORDER BY cs, y_id), (a, b) -> a + b)
               AS sx
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY x_id
                                         ORDER BY cs DESC, y_id) AS rn
            FROM scored)
      WHERE rn <= {_K} GROUP BY x_id
    ), bwd AS (
      SELECT y_id, list_reduce(list(cs ORDER BY cs, x_id), (a, b) -> a + b)
               AS sy
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY y_id
                                         ORDER BY cs DESC, x_id) AS rn
            FROM scored)
      WHERE rn <= {_K} GROUP BY y_id
    ), m AS (
      SELECT s.x_id, s.y_id, s.cs,
             s.cs / ((f.sx + b.sy) / (2.0 * {_K})) AS margin
      FROM scored s
      JOIN fwd f ON s.x_id = f.x_id
      JOIN bwd b ON s.y_id = b.y_id
    )
    SELECT x_id, y_id, ROUND(cs, 5) AS cosine5, ROUND(margin, 5) AS margin5
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY x_id
                                       ORDER BY margin DESC, y_id) AS rn
          FROM m)
    WHERE rn = 1 AND margin > 1.0
    """,
)
def q_bitext_margin_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Margin-criterion bitext mining between the even- and odd-label
    embedding halves: pairwise cosine, k-NN-average denominators in both
    directions, per-source argmax, margin > 1.0.

    Scale shape: the query side is broadcast (≤{_X_CAP} rows) so the
    pairwise scoring is a map-side broadcast join over the candidate
    side — no shuffle of the big side; the k-NN sums shuffle only
    (pairs × 1) tiny aggregates keyed by x/y.  The scored frame is
    lazily checkpointed because three consumers (fwd, bwd, final pick)
    would otherwise recompute the fold-heavy cosine pass."""
    scored = scored_pairs(spark, sf_dir)
    fwd = _knn_sum(scored, "x_id", "y_id", "sx")
    bwd = _knn_sum(scored, "y_id", "x_id", "sy")
    m = (
        scored.join(F.broadcast(fwd), "x_id")
        .join(F.broadcast(bwd), "y_id")
        .withColumn(
            "margin",
            F.col("cs") / ((F.col("sx") + F.col("sy")) / F.lit(2.0 * _K)),
        )
    )
    w = Window.partitionBy("x_id").orderBy(F.desc("margin"), F.asc("y_id"))
    return (
        m.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("margin") > 1.0))
        .select(
            "x_id",
            "y_id",
            F.round("cs", 5).alias("cosine5"),
            F.round("margin", 5).alias("margin5"),
        )
    )
