"""Similarity search over embedding columns (SURVEY §2.11 E2-E3).

Two tiers over ``embeddings(vec_id, embedding array<float>, label)``:

* **brute-force cosine top-k** — the exact baseline.  Dot products are a
  left-fold in double precision (``F.aggregate`` over ``zip_with``) so the
  oracle (DuckDB ``list_reduce`` with the identical fold order) matches
  bit-for-bit before rounding.  The query side is broadcast: at 100 TB the
  candidate scan is embarrassingly parallel, and only the tiny per-query
  top-k heaps shuffle (window over queries × k rows).
* **LSH-bucketed ANN** — random-hyperplane signatures (sign of dot with
  deterministic pseudo-random planes) bucket the corpus; candidates = same
  bucket; exact cosine re-rank inside buckets.  This is the scale path:
  bucket join instead of full cross product.  Pinned by pytest recall tests
  against the brute-force baseline (no SQL oracle — rows-only check).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load_table

_DIM = 64
_N_QUERIES = 5  # vec_id < 5 are the query vectors in the checked entries
_TOP_K = 10


def to_double_vec(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product — deterministic order."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column, norm_a: Column, norm_b: Column) -> Column:
    return dot(a, b) / (norm_a * norm_b)


@register(
    "q_embedding_topk_cosine",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings
    ), n AS (
      SELECT vec_id, e,
             sqrt(list_reduce(list_transform(e, x -> x * x), (a, b) -> a + b))
               AS nrm
      FROM v
    ), scored AS (
      SELECT q.vec_id AS query_id,
             c.vec_id AS neighbor_id,
             ROUND(list_reduce(list_transform(generate_series(1, {_DIM}),
                                              i -> q.e[i] * c.e[i]),
                               (a, b) -> a + b) / (q.nrm * c.nrm), 5) AS cosine_sim
      FROM n q JOIN n c ON q.vec_id < {_N_QUERIES} AND c.vec_id <> q.vec_id
    )
    SELECT query_id, neighbor_id, cosine_sim
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY cosine_sim DESC, neighbor_id) AS rn
          FROM scored)
    WHERE rn <= {_TOP_K}
    """,
)
def q_embedding_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", to_double_vec(F.col("embedding")).alias("e")
    )
    emb = emb.withColumn("nrm", l2_norm(F.col("e")))
    queries = emb.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("e").alias("qe"),
        F.col("nrm").alias("qn"),
    )
    sim = cosine(F.col("qe"), F.col("e"), F.col("qn"), F.col("nrm"))
    scored = (
        emb.join(F.broadcast(queries), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(sim, 5).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _TOP_K)
        .select("query_id", "neighbor_id", "cosine_sim")
    )


@register(
    "q_embedding_centroid_per_label",
    oracle=f"""
    WITH v AS (
      SELECT label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings
    )
    SELECT label,
           COUNT(*) AS n_vectors,
           ROUND(CAST(SUM(CAST(e[1] AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*), 6)
             AS centroid_d0,
           ROUND(CAST(SUM(CAST(e[{_DIM}] AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*), 6)
             AS centroid_d63
    FROM v
    GROUP BY label
    """,
)
def q_embedding_centroid_per_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid components (the reduce step an IVF index needs).
    Summed in DECIMAL so shuffle order can't perturb the double sum."""
    emb = load_table(spark, sf_dir, "embeddings")
    e = to_double_vec(F.col("embedding"))
    d0 = F.element_at(e, 1).cast("decimal(28,12)")
    d63 = F.element_at(e, _DIM).cast("decimal(28,12)")
    return (
        emb.select("label", d0.alias("d0"), d63.alias("d63"))
        .groupBy("label")
        .agg(
            F.count("*").alias("n_vectors"),
            F.round(F.sum("d0").cast("double") / F.count("*"), 6).alias("centroid_d0"),
            F.round(F.sum("d63").cast("double") / F.count("*"), 6).alias(
                "centroid_d63"
            ),
        )
    )


def hyperplane(seed: int, dim: int = _DIM) -> list[float]:
    """Deterministic pseudo-random unit-free hyperplane via integer hashing
    (no numpy state, reproducible across runs/workers)."""
    # xorshift-style integer scramble -> [-1, 1)
    vals = []
    x = seed * 2654435761 % (1 << 32)
    for _ in range(dim):
        x ^= (x << 13) & 0xFFFFFFFF
        x ^= x >> 17
        x ^= (x << 5) & 0xFFFFFFFF
        vals.append((x % 20011) / 10005.5 - 1.0)
    return vals


@register("q_embedding_ann_lsh")  # no oracle: LSH recall pinned by pytest
def q_embedding_ann_lsh(
    spark: SparkSession, sf_dir: str, n_planes: int = 8
) -> DataFrame:
    """Approximate top-k: random-hyperplane LSH bucketing + exact re-rank.

    Signature = n_planes sign bits of plane·v → corpus grouped by signature;
    queries probe only their own bucket.  At 100 TB this turns the cross
    join into an equi-join on the signature key."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", to_double_vec(F.col("embedding")).alias("e")
    )
    emb = emb.withColumn("nrm", l2_norm(F.col("e")))

    sig = F.lit(0)
    for p in range(n_planes):
        plane = F.array(*[F.lit(v) for v in hyperplane(p + 1)])
        sig = sig * 2 + F.when(dot(F.col("e"), plane) >= 0, 1).otherwise(0)
    emb = emb.withColumn("bucket", sig)

    queries = emb.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("e").alias("qe"),
        F.col("nrm").alias("qn"),
        "bucket",
    )
    sim = cosine(F.col("qe"), F.col("e"), F.col("qn"), F.col("nrm"))
    scored = (
        emb.join(F.broadcast(queries), "bucket")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(sim, 5).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _TOP_K)
        .select("query_id", "neighbor_id", "cosine_sim")
    )
