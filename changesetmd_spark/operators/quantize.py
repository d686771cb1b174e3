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
