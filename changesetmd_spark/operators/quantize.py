"""Int8 embedding quantization (SURVEY §2.11 E2 extension — the vector
compression pass every 100 TB embedding store runs before ANN serving).

Symmetric per-vector int8: ``scale = amax / 127``, ``q_i = floor(x_i /
scale + 0.5)`` (round-half-up, branch-free and bit-identical across
engines).  This is the storage format PQ-ADC (similarity.py) and the IVF
index consume in production — 4× smaller than float32 before PQ even
starts, and the quantization itself is a **map-only, zero-shuffle** pass:
at 100 TB it runs embarrassingly parallel at scan speed with no exchange
at all (the plan is Scan → Project).

Determinism: every float reduction is a sequential left fold
(``F.aggregate`` with a 0.0 init == DuckDB ``list_reduce``, since
``0.0 + x1`` is exactly ``x1``), so the oracle matches bit-for-bit before
the final rounding.  Reference parity: the reference has no vector tier;
this extends it per the mandated LLM-pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load_table
from .similarity import to_double_vec

_DIM = 64


@register(
    "q_embedding_int8_quantize",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings
    ), a AS (
      SELECT vec_id, e,
             list_reduce(list_transform(e, x -> abs(x)),
                         (p, c) -> greatest(p, c)) AS amax
      FROM v
    ), q AS (
      SELECT vec_id, e, amax,
             list_transform(e, x -> floor(x * 127.0 / amax + 0.5)) AS qv
      FROM a WHERE amax > 0
    )
    SELECT vec_id,
           ROUND(amax / 127.0, 8) AS scale8,
           CAST(list_reduce(qv, (p, c) -> p + c) AS BIGINT) AS q_sum,
           CAST(list_reduce(qv, (p, c) -> least(p, c)) AS BIGINT) AS q_min,
           CAST(list_reduce(qv, (p, c) -> greatest(p, c)) AS BIGINT) AS q_max,
           ROUND(list_reduce(
             list_transform(generate_series(1, {_DIM}),
               i -> (e[i] - qv[i] * amax / 127.0)
                    * (e[i] - qv[i] * amax / 127.0)),
             (p, c) -> p + c) / {_DIM}, 10) AS mse10
    FROM q
    """,
)
def q_embedding_int8_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric per-vector int8 quantization of ``embeddings`` with a
    per-vector reconstruction-error audit: scale, quantized checksum,
    min/max code (range proof: always within [-127, 127]), and the mean
    squared dequantization error.

    Scale shape: map-only — one projection per row, no shuffle, no
    aggregation across rows; the whole operator runs inside one
    WholeStageCodegen span at scan speed.  The zero-vector guard
    (``amax > 0``) drops degenerate rows identically on both engines."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", to_double_vec(F.col("embedding")).alias("e")
    )
    emb = emb.withColumn(
        "amax",
        F.aggregate(
            F.transform(F.col("e"), lambda x: F.abs(x)),
            F.lit(0.0),
            lambda p, c: F.greatest(p, c),
        ),
    ).filter(F.col("amax") > 0)
    emb = emb.withColumn(
        "qv",
        F.transform(
            F.col("e"), lambda x: F.floor(x * F.lit(127.0) / F.col("amax") + F.lit(0.5))
        ),
    )
    dequant_sq = F.zip_with(
        F.col("e"),
        F.col("qv"),
        lambda x, q: (x - q * F.col("amax") / F.lit(127.0))
        * (x - q * F.col("amax") / F.lit(127.0)),
    )
    fold_sum = lambda arr: F.aggregate(arr, F.lit(0.0), lambda p, c: p + c)  # noqa: E731
    return emb.select(
        "vec_id",
        F.round(F.col("amax") / F.lit(127.0), 8).alias("scale8"),
        F.aggregate(F.col("qv"), F.lit(0).cast("long"), lambda p, c: p + c.cast("long"))
        .alias("q_sum"),
        F.aggregate(
            F.col("qv"),
            F.lit(None).cast("long"),
            lambda p, c: F.when(p.isNull() | (c.cast("long") < p), c.cast("long")).otherwise(p),
        ).alias("q_min"),
        F.aggregate(
            F.col("qv"),
            F.lit(None).cast("long"),
            lambda p, c: F.when(p.isNull() | (c.cast("long") > p), c.cast("long")).otherwise(p),
        ).alias("q_max"),
        F.round(fold_sum(dequant_sq) / F.lit(float(_DIM)), 10).alias("mse10"),
    )


# ---------------------------------------------------------------------------
# Matryoshka truncation audit ([extension]): MRL-style embeddings serve
# truncated prefixes (d/2, d/4) to cut ANN memory 2-4x; before switching a
# retrieval tier to a prefix, you audit how well truncated cosine tracks
# full cosine and whether dedup decisions (cos >= threshold) flip.  Same
# deterministic-pair discipline as q_neardup_verify_jaccard: candidates
# are consecutive vec_ids so the audit itself is hash-checkable.
_MRL_THRESH = 0.8


def _matryoshka_oracle() -> str:
    def cos(d: int) -> str:
        # unrounded: the agree flag must compare the SAME doubles Spark
        # compares, never the display-rounded values
        return f"""(
          list_reduce(list_transform(generate_series(1, {d}),
                                     i -> a.e[i] * b.e[i]), (p, c) -> p + c)
          / (sqrt(list_reduce(list_transform(generate_series(1, {d}),
                                             i -> a.e[i] * a.e[i]),
                              (p, c) -> p + c))
             * sqrt(list_reduce(list_transform(generate_series(1, {d}),
                                               i -> b.e[i] * b.e[i]),
                                (p, c) -> p + c))))"""

    return f"""
    WITH v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings
    ), nz AS (
      SELECT vec_id, e FROM v
      WHERE list_reduce(list_transform(list_slice(e, 1, {_DIM // 4}),
                                       x -> x * x), (p, c) -> p + c) > 0
    ), pairs AS (
      SELECT a.vec_id AS vec_id_1, b.vec_id AS vec_id_2,
             {cos(_DIM)} AS cf, {cos(_DIM // 2)} AS ch,
             {cos(_DIM // 4)} AS cq
      FROM nz a JOIN nz b ON b.vec_id = a.vec_id + 1
    )
    SELECT vec_id_1, vec_id_2,
           ROUND(cf, 5) AS cos_full5,
           ROUND(ch, 5) AS cos_half5,
           ROUND(cq, 5) AS cos_quarter5,
           (ch >= {_MRL_THRESH}) = (cf >= {_MRL_THRESH}) AS half_agree
    FROM pairs
    """


@register("q_matryoshka_truncation_audit", oracle=_matryoshka_oracle())
def q_matryoshka_truncation_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Matryoshka (MRL) truncation audit: cosine over the full {D} dims vs
    the {D2}-dim and {D4}-dim prefixes for deterministic consecutive-id
    pairs, plus whether the d/2 prefix AGREES with the full vector on the
    cos >= {T} dedup decision.  Every reduction is a sequential left fold
    over the sliced prefix, so all three cosines hash-check against DuckDB
    bit-for-bit before rounding.

    Scale shape (100 TB): two map-side projections and ONE shuffle
    equi-join on vec_id — identical plan class to
    `q_neardup_verify_jaccard`; no corpus cross-product, output rows =
    input rows - 1.  The d/4-prefix-norm > 0 filter drops degenerate
    vectors identically on both engines (a zero prefix makes the
    truncated cosine undefined).""".replace("{D}", str(_DIM)).replace(
        "{D2}", str(_DIM // 2)
    ).replace("{D4}", str(_DIM // 4)).replace("{T}", str(_MRL_THRESH))
    from .similarity import dot, l2_norm

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", to_double_vec(F.col("embedding")).alias("e")
    )
    q = _DIM // 4
    emb = emb.filter(
        F.aggregate(
            F.transform(F.slice(F.col("e"), 1, q), lambda x: x * x),
            F.lit(0.0),
            lambda p, c: p + c,
        )
        > 0
    )

    def cos_d(d: int):
        ea = F.slice(F.col("ea"), 1, d)
        eb = F.slice(F.col("eb"), 1, d)
        return dot(ea, eb) / (l2_norm(ea) * l2_norm(eb))

    a = emb.select(F.col("vec_id").alias("vec_id_1"), F.col("e").alias("ea"))
    b = emb.select(F.col("vec_id").alias("vec_id_2"), F.col("e").alias("eb"))
    t = F.lit(_MRL_THRESH)
    return (
        a.join(b, F.col("vec_id_2") == F.col("vec_id_1") + 1)
        .select(
            "vec_id_1",
            "vec_id_2",
            F.round(cos_d(_DIM), 5).alias("cos_full5"),
            F.round(cos_d(_DIM // 2), 5).alias("cos_half5"),
            F.round(cos_d(_DIM // 4), 5).alias("cos_quarter5"),
            ((cos_d(_DIM // 2) >= t) == (cos_d(_DIM) >= t)).alias(
                "half_agree"
            ),
        )
    )
