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
from .util import materialize_releasing

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


def _topk_oracle() -> str:
    return f"""
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
    """


@register("q_embedding_topk_cosine", oracle=_topk_oracle())
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


# near-dup candidate generation: multi-table random-hyperplane LSH.  The
# driver corpus has NO natural near-dups (max pairwise cosine ≈ 0.51 at
# sf0.01), so the query plants deterministic perturbed copies — otherwise
# the hash check is a vacuous 0 == 0.  Planted pairs sit at cosine ≥ 0.999
# (angle ≤ 1.7°): per-plane collision ≥ 0.990, per-table (12 planes)
# ≥ 0.89, miss probability across 4 tables ≤ 2e-4 per pair — and every
# surviving candidate is exact-verified, so precision is always 1.0.
_ND_TABLES = 4
_ND_PLANES = 12
_ND_PLANT_MOD = 20  # vec_id % 20 == 0 gets a perturbed twin
_ND_PLANT_OFFSET = 10_000_000
# per-coordinate relative perturbation from pure integer arithmetic —
# bit-identical in Spark and DuckDB (no libm): eps(i) ∈ [-0.02, 0.02]
_ND_EPS = "(1.0 + CAST((i * 37) % 11 - 5 AS DOUBLE) / 250.0)"


def _plane_signature_rows(
    spark: SparkSession,
    corpus: DataFrame,
    n_tables: int,
    n_planes: int,
    seed_fn,
) -> DataFrame:
    """(vec_id, e, nrm, t, b) hyperplane-LSH bucket rows with the planes
    as a broadcast DATA table instead of literal arrays (r18, guide §1.2
    per-task work — but here the cost was per-INVOCATION driver work):
    n_tables·n_planes·64 literal leaves made a multi-thousand-node
    expression tree whose analysis/optimization/codegen cost (~3 s for
    q_embedding_neardup_cosine's 48 planes, ~1.3 s just to evaluate over
    600 rows) dwarfed the actual dot folds.  The planes join via a
    constant-key Broadcast HASH join (the no-BNLJ plan guards keep
    holding); the key must stay NON-FOLDABLE on the corpus side —
    ``lit(1) = lit(1)`` constant-folds to a keyless condition and the
    join degrades to BroadcastNestedLoopJoin — hence the
    ``coalesce(pmod(vec_id, 1), 0)`` spelling (always 0, never NULL, and
    Catalyst has no pmod-by-one rule).  The bucket id re-assembles as
    Σ 2^(n_planes-1-p)·bit_p — integer arithmetic, bucket-for-bucket
    identical to the chained ``sig*2 + bit`` form (verified row-identical
    output on the driver corpus before the swap)."""
    rows = [
        # _k rides in the DATA (a LocalRelation column is non-foldable;
        # a lit(0) projection folds and degrades the join to BNLJ)
        (t, 1 << (n_planes - 1 - p), hyperplane(seed_fn(t, p)), 0)
        for t in range(n_tables)
        for p in range(n_planes)
    ]
    planes = spark.createDataFrame(
        rows, "t int, w int, plane array<double>, _k int"
    )
    bit = F.when(dot(F.col("e"), F.col("plane")) >= 0, F.col("w")).otherwise(
        F.lit(0)
    )
    return (
        corpus.withColumn(
            "_k",
            F.coalesce(F.pmod(F.col("vec_id"), F.lit(1)), F.lit(0)).cast("int"),
        )
        .join(F.broadcast(planes), "_k")
        .groupBy("vec_id", "t")
        .agg(
            F.sum(bit).cast("int").alias("b"),
            # e/nrm are constant within a (vec_id, t) group (replicated
            # from one source row), so first() is deterministic here
            F.first("e").alias("e"),
            F.first("nrm").alias("nrm"),
        )
        .select("vec_id", "e", "nrm", "t", "b")
    )



@register(
    "q_embedding_neardup_cosine",
    oracle=f"""
    WITH base AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings WHERE vec_id % 4 = 0
    ), planted AS (
      SELECT vec_id + {_ND_PLANT_OFFSET} AS vec_id,
             list_transform(generate_series(1, {_DIM}),
                            i -> e[i] * {_ND_EPS.replace("i *", "(i - 1) *")}) AS e
      FROM base WHERE vec_id % {_ND_PLANT_MOD} = 0
    ), v AS (
      SELECT * FROM base UNION ALL SELECT * FROM planted
    ), n AS (
      SELECT vec_id, e,
             sqrt(list_reduce(list_transform(e, x -> x * x), (a, b) -> a + b))
               AS nrm
      FROM v
    )
    SELECT a.vec_id AS vec_id_1, b.vec_id AS vec_id_2,
           ROUND(list_reduce(list_transform(generate_series(1, {_DIM}),
                                            i -> a.e[i] * b.e[i]),
                             (x, y) -> x + y) / (a.nrm * b.nrm), 5) AS cosine_sim
    FROM n a JOIN n b ON a.vec_id < b.vec_id
    WHERE list_reduce(list_transform(generate_series(1, {_DIM}),
                                     i -> a.e[i] * b.e[i]),
                      (x, y) -> x + y) / (a.nrm * b.nrm) >= 0.92
    """,
)
def q_embedding_neardup_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1/E2 embedding-cosine near-dup pairs (dedup by representation):
    pairs with cosine ≥ 0.92 over the vec_id%4 subset plus deterministic
    planted twins (the corpus has no natural near-dups — see module note).

    Scale path: candidates come from a multi-table hyperplane-LSH bucket
    SELF-join (equi-join on (table, bucket), one shuffle), then the exact
    cosine fold verifies only candidates.  The all-pairs O(n²) fold lives
    solely in the DuckDB oracle; the Spark plan has no cartesian /
    broadcast-nested-loop stage (pinned by tests/test_similarity_ann.py).
    At 100 TB the expected candidate volume is Σ_buckets |bucket|² — with
    2^12 buckets × 4 tables this is ~n²/1000 for random background and
    ~n for true near-dup mass, versus n²/2 for the previous BNLJ."""
    base = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") % 4 == 0)
        .select("vec_id", to_double_vec(F.col("embedding")).alias("e"))
    )
    planted = base.filter(F.col("vec_id") % _ND_PLANT_MOD == 0).select(
        (F.col("vec_id") + _ND_PLANT_OFFSET).alias("vec_id"),
        F.expr(
            f"transform(e, (x, i) -> x * {_ND_EPS})"
        ).alias("e"),
    )
    corpus = base.unionAll(planted).withColumn("nrm", l2_norm(F.col("e")))

    hashed = _plane_signature_rows(
        spark, corpus, _ND_TABLES, _ND_PLANES,
        lambda t, p: 1000 * (t + 1) + p,
        # both sides of the bucket self-join read this frame; without
        # persist the signature build runs twice
    ).persist()

    a = hashed.select(
        "t", "b", F.col("vec_id").alias("vec_id_1"),
        F.col("e").alias("e1"), F.col("nrm").alias("n1"),
    )
    b = hashed.select(
        "t", "b", F.col("vec_id").alias("vec_id_2"),
        F.col("e").alias("e2"), F.col("nrm").alias("n2"),
    )
    sim = cosine(F.col("e1"), F.col("e2"), F.col("n1"), F.col("n2"))
    out = (
        a.join(b, ["t", "b"])
        .filter(F.col("vec_id_1") < F.col("vec_id_2"))
        .dropDuplicates(["vec_id_1", "vec_id_2"])
        .filter(sim >= 0.92)
        .select("vec_id_1", "vec_id_2", F.round(sim, 5).alias("cosine_sim"))
    )
    from .util import materialize_releasing

    return materialize_releasing(out, hashed)


@register(
    "q_ann_verify_rerank",
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
    ), scored AS (
      SELECT q.vec_id AS query_id,
             c.vec_id AS neighbor_id,
             ROUND(list_reduce(list_transform(generate_series(1, {_DIM}),
                                              i -> q.e[i] * c.e[i]),
                               (a, b) -> a + b) / (q.nrm * c.nrm), 5) AS cosine_sim
      FROM n q JOIN n c ON q.vec_id < {_N_QUERIES}
                       AND c.label = q.label AND c.vec_id <> q.vec_id
    )
    SELECT query_id, neighbor_id, cosine_sim
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY cosine_sim DESC, neighbor_id) AS rn
          FROM scored)
    WHERE rn <= {_TOP_K}
    """,
)
def q_ann_verify_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The exact re-rank stage of the ANN pipelines, isolated over a
    deterministic candidate set so it is driver-hash-checkable (bucket
    membership in the LSH/IVF paths depends on engine-specific hashing and
    stays rows-only; this pins the scoring + top-k math those pipelines end
    with).  Candidates = vectors sharing the query's label — exactly the
    IVF verify with the label as the coarse cell and n_probe=1."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", to_double_vec(F.col("embedding")).alias("e")
    )
    emb = emb.withColumn("nrm", l2_norm(F.col("e")))
    queries = emb.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("qlabel"),
        F.col("e").alias("qe"),
        F.col("nrm").alias("qn"),
    )
    sim = cosine(F.col("qe"), F.col("e"), F.col("qn"), F.col("nrm"))
    scored = (
        emb.join(
            F.broadcast(queries),
            (F.col("label") == F.col("qlabel"))
            & (F.col("vec_id") != F.col("query_id")),
        )
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


@register("q_embedding_ann_lsh")  # no oracle: LSH recall pinned by pytest
def q_embedding_ann_lsh(
    spark: SparkSession, sf_dir: str, n_tables: int = 4, n_planes: int = 5
) -> DataFrame:
    """Approximate top-k: multi-table random-hyperplane LSH + exact re-rank.

    ``n_tables`` independent signatures of ``n_planes`` sign bits each;
    every vector lands in one bucket per table and queries probe their
    bucket in ALL tables (union of candidates, deduped before re-rank).
    Multi-table is what makes recall robust — a single table strands a
    query whose bucket happens to be a singleton (observed at small SF).
    At 100 TB this replaces the cross join with an equi-join on
    (table, bucket) whose expected candidate count is n_tables·|corpus|/2^n_planes."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", to_double_vec(F.col("embedding")).alias("e")
    )
    emb = emb.withColumn("nrm", l2_norm(F.col("e")))

    hashed = _plane_signature_rows(
        spark, emb, n_tables, n_planes, lambda t, p: 100 * t + p + 1
    ).localCheckpoint(eager=False)
    # lazy checkpoint (r18): the query filter AND the candidate join both
    # read `hashed`; without the boundary the signature build runs twice

    queries = hashed.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("e").alias("qe"),
        F.col("nrm").alias("qn"),
        "t",
        "b",
    )
    sim = cosine(F.col("qe"), F.col("e"), F.col("qn"), F.col("nrm"))
    scored = (
        hashed.join(F.broadcast(queries), ["t", "b"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(sim, 5).alias("cosine_sim"),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _TOP_K)
        .select("query_id", "neighbor_id", "cosine_sim")
    )


_ANN_CHECK_TABLES = 2
_ANN_CHECK_PLANES = 4


def _ann_checked_oracle() -> str:
    """DuckDB SQL reproducing the hyperplane-LSH ANN pipeline exactly: the
    plane constants are embedded as literals (``repr`` round-trips the
    doubles bit-for-bit), the dot products use the same left-fold order as
    :func:`dot`, so bucket signatures — and therefore the approximate
    candidate sets and the re-ranked top-k — are identical by construction.
    """
    plane_rows = []
    for t in range(_ANN_CHECK_TABLES):
        sig = "0"
        for p in range(_ANN_CHECK_PLANES):
            vals = ", ".join(repr(v) for v in hyperplane(7000 * (t + 1) + p))
            d = (
                f"list_reduce(list_transform(generate_series(1, {_DIM}),"
                f" i -> e[i] * ([{vals}])[i]), (a, b) -> a + b)"
            )
            sig = f"({sig}) * 2 + (CASE WHEN {d} >= 0 THEN 1 ELSE 0 END)"
        plane_rows.append(f"SELECT vec_id, e, nrm, {t} AS t, {sig} AS b FROM n")
    hashed = " UNION ALL ".join(plane_rows)
    return f"""
    WITH v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings
    ), n AS (
      SELECT vec_id, e,
             sqrt(list_reduce(list_transform(e, x -> x * x), (a, b) -> a + b))
               AS nrm
      FROM v
    ), hashed AS (
      {hashed}
    ), q AS (
      SELECT vec_id AS query_id, e AS qe, nrm AS qn, t, b
      FROM hashed WHERE vec_id < {_N_QUERIES}
    ), cand AS (
      SELECT DISTINCT q.query_id, h.vec_id AS neighbor_id,
             q.qe, q.qn, h.e, h.nrm
      FROM hashed h JOIN q ON h.t = q.t AND h.b = q.b
      WHERE h.vec_id <> q.query_id
    ), scored AS (
      SELECT query_id, neighbor_id,
             ROUND(list_reduce(list_transform(generate_series(1, {_DIM}),
                                              i -> qe[i] * e[i]),
                               (a, b) -> a + b) / (qn * nrm), 5) AS cosine_sim
      FROM cand
    )
    SELECT query_id, neighbor_id, cosine_sim
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY cosine_sim DESC, neighbor_id) AS rn
          FROM scored)
    WHERE rn <= {_TOP_K}
    """


@register("q_embedding_ann_checked", oracle=_ann_checked_oracle())
def q_embedding_ann_checked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH ANN with the FULL pipeline hash-checked: 2 tables ×
    4 sign-bit planes, bucket equi-join candidates, exact cosine re-rank,
    deterministic top-k.  The oracle embeds the identical plane constants
    and fold order, so even this *approximate* operator's output is
    value-checked — the larger fast path (q_embedding_ann_lsh) stays
    rows-only + recall-pinned by pytest."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", to_double_vec(F.col("embedding")).alias("e")
    )
    emb = emb.withColumn("nrm", l2_norm(F.col("e")))
    tables = []
    for t in range(_ANN_CHECK_TABLES):
        sig = F.lit(0)
        for p in range(_ANN_CHECK_PLANES):
            plane = F.array(*[F.lit(v) for v in hyperplane(7000 * (t + 1) + p)])
            sig = sig * 2 + F.when(dot(F.col("e"), plane) >= 0, 1).otherwise(0)
        tables.append(F.struct(F.lit(t).alias("t"), sig.alias("b")))
    hashed = emb.select(
        "vec_id", "e", "nrm", F.explode(F.array(*tables)).alias("tb")
    ).select("vec_id", "e", "nrm", F.col("tb.t").alias("t"), F.col("tb.b").alias("b"))

    queries = hashed.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("e").alias("qe"),
        F.col("nrm").alias("qn"),
        "t",
        "b",
    )
    sim = cosine(F.col("qe"), F.col("e"), F.col("qn"), F.col("nrm"))
    scored = (
        hashed.join(F.broadcast(queries), ["t", "b"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(sim, 5).alias("cosine_sim"),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _TOP_K)
        .select("query_id", "neighbor_id", "cosine_sim")
    )


@register("q_embedding_ann_ivf")  # no oracle: ANN recall pinned by pytest
def q_embedding_ann_ivf(
    spark: SparkSession, sf_dir: str, n_probe: int = 4
) -> DataFrame:
    """IVF-flat approximate top-k: coarse quantization + multi-probe.

    Cells = the per-label centroids (the natural coarse quantizer for this
    corpus; a production index would k-means instead — same dataflow).
    Build: posexplode → per-(label, dim) avg → re-assembled centroid arrays
    (one shuffle over |corpus|·dim skinny rows).  Assign: every vector joins
    the broadcast centroid table and keeps its nearest cell.  Query: probe
    the ``n_probe`` nearest cells, exact-cosine re-rank inside them only.
    At 100 TB each query touches ~|corpus|·n_probe/n_cells candidates
    instead of the full corpus, and the centroid table stays tiny."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", to_double_vec(F.col("embedding")).alias("e")
    )
    cent = (
        emb.select("label", F.posexplode("e").alias("pos", "x"))
        .groupBy("label", "pos")
        .agg(F.avg("x").alias("cx"))
        .groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "cx"))).alias("pc"))
        .select(
            F.col("label").alias("cell"),
            F.transform("pc", lambda s: s["cx"]).alias("ce"),
        )
        .withColumn("cn", l2_norm(F.col("ce")))
    )
    emb = emb.withColumn("nrm", l2_norm(F.col("e")))

    cell_sim = cosine(F.col("e"), F.col("ce"), F.col("nrm"), F.col("cn"))
    assigned = (
        emb.join(F.broadcast(cent))
        .select("vec_id", "e", "nrm", "cell", cell_sim.alias("cs"))
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("vec_id").orderBy(F.desc("cs"), F.asc("cell"))
            ),
        )
        # read by both the corpus branch and the probe branch — persist or
        # the centroid build + assignment join runs twice
        .persist()
    )
    corpus = assigned.filter(F.col("rk") == 1).select("vec_id", "e", "nrm", "cell")

    probes = (
        assigned.filter(F.col("vec_id") < _N_QUERIES)
        .filter(F.col("rk") <= n_probe)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("e").alias("qe"),
            F.col("nrm").alias("qn"),
            "cell",
        )
    )
    sim = cosine(F.col("qe"), F.col("e"), F.col("qn"), F.col("nrm"))
    scored = (
        corpus.join(F.broadcast(probes), "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(sim, 5).alias("cosine_sim"),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    out = (
        scored.withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") <= _TOP_K)
        .select("query_id", "neighbor_id", "cosine_sim")
    )
    # materialize the top-k result, then release the assignment cache
    return materialize_releasing(out, assigned)


# Pinned IVF coarse quantizer for the hash-checked twin: cells are the
# embeddings of these literal vec_ids (no averaging — byte-identical in
# both engines), probe width fixed at 2.
_IVF_CHECK_CENTROID_IDS = (5, 6, 7, 8, 9, 10, 11, 12)
_IVF_CHECK_PROBE = 2


def _ann_ivf_checked_oracle() -> str:
    """DuckDB SQL reproducing the IVF-flat probe pipeline exactly: cell
    centers are the pinned-vec_id embeddings (same bytes both engines),
    dot products use the identical left-fold order as :func:`dot`, cell
    ranks break ties on cell id — so assignment, probe set, and re-ranked
    top-k match bit-for-bit before the final ROUND."""
    ids = ", ".join(str(i) for i in _IVF_CHECK_CENTROID_IDS)
    d = (
        "list_reduce(list_transform(generate_series(1, {dim}),"
        " i -> {a}[i] * {b}[i]), (x, y) -> x + y)"
    )
    dot_ec = d.format(dim=_DIM, a="v.e", b="c.ce")
    dot_qe = d.format(dim=_DIM, a="qe", b="e")
    return f"""
    WITH v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings
    ), n AS (
      SELECT vec_id, e,
             sqrt(list_reduce(list_transform(e, x -> x * x), (a, b) -> a + b))
               AS nrm
      FROM v
    ), cent AS (
      SELECT vec_id AS cell, e AS ce, nrm AS cn
      FROM n WHERE vec_id IN ({ids})
    ), assigned AS (
      SELECT v.vec_id, v.e, v.nrm, c.cell,
             ROW_NUMBER() OVER (
               PARTITION BY v.vec_id
               ORDER BY {dot_ec} / (v.nrm * c.cn) DESC, c.cell
             ) AS rk
      FROM n v CROSS JOIN cent c
    ), corpus AS (
      SELECT vec_id, e, nrm, cell FROM assigned WHERE rk = 1
    ), probes AS (
      SELECT vec_id AS query_id, e AS qe, nrm AS qn, cell
      FROM assigned
      WHERE vec_id < {_N_QUERIES} AND rk <= {_IVF_CHECK_PROBE}
    ), scored AS (
      SELECT DISTINCT query_id, c.vec_id AS neighbor_id,
             ROUND({dot_qe} / (qn * nrm), 5) AS cosine_sim
      FROM corpus c JOIN probes p ON c.cell = p.cell
      WHERE c.vec_id <> p.query_id
    )
    SELECT query_id, neighbor_id, cosine_sim
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY cosine_sim DESC, neighbor_id) AS rn
          FROM scored)
    WHERE rn <= {_TOP_K}
    """


@register("q_embedding_ann_ivf_checked", oracle=_ann_ivf_checked_oracle())
def q_embedding_ann_ivf_checked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-flat ANN with the FULL pipeline hash-checked (VERDICT r7 #7 —
    the IVF counterpart of q_embedding_ann_checked): the coarse quantizer
    is the 8 pinned-vec_id embeddings (literal id list, so cell centers
    are byte-identical in both engines — no float averaging to drift),
    every vector broadcast-joins the 8 cells and keeps its
    nearest-by-cosine cell (ties on cell id), queries probe their 2
    nearest cells, and candidates get the exact left-fold cosine re-rank.
    The production-scale fast path (q_embedding_ann_ivf, learned
    centroids) stays rows-only + recall-pinned by pytest; this twin
    value-checks the same dataflow end-to-end.

    Scale shape: one broadcast of an 8-row centroid table, one broadcast
    of queries×probe rows, equi-join on cell — identical plan skeleton to
    the learned-centroid IVF; nothing quadratic."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", to_double_vec(F.col("embedding")).alias("e")
    )
    emb = emb.withColumn("nrm", l2_norm(F.col("e")))
    cent = emb.filter(
        F.col("vec_id").isin(list(_IVF_CHECK_CENTROID_IDS))
    ).select(
        F.col("vec_id").alias("cell"),
        F.col("e").alias("ce"),
        F.col("nrm").alias("cn"),
    )
    cell_sim = cosine(F.col("e"), F.col("ce"), F.col("nrm"), F.col("cn"))
    assigned = (
        emb.join(F.broadcast(cent))
        .select("vec_id", "e", "nrm", "cell", cell_sim.alias("cs"))
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("vec_id").orderBy(F.desc("cs"), F.asc("cell"))
            ),
        )
        .persist()
    )
    corpus = assigned.filter(F.col("rk") == 1).select("vec_id", "e", "nrm", "cell")
    probes = (
        assigned.filter(F.col("vec_id") < _N_QUERIES)
        .filter(F.col("rk") <= _IVF_CHECK_PROBE)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("e").alias("qe"),
            F.col("nrm").alias("qn"),
            "cell",
        )
    )
    sim = cosine(F.col("qe"), F.col("e"), F.col("qn"), F.col("nrm"))
    scored = (
        corpus.join(F.broadcast(probes), "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(sim, 5).alias("cosine_sim"),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    out = (
        scored.withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") <= _TOP_K)
        .select("query_id", "neighbor_id", "cosine_sim")
    )
    return materialize_releasing(out, assigned)


# Product quantization: M subspaces × DSUB dims (= _DIM), K codewords per
# subspace.  The codebook is the subvectors of these pinned vec_ids (codeword
# index = rank of the id in the sorted list) — byte-identical in both
# engines, so even this approximate operator hash-checks end-to-end.
_PQ_M = 8
_PQ_DSUB = 8
_PQ_K = 16
_PQ_CODEBOOK_IDS = tuple(range(20, 36))


def _pq_sub(col: Column, m: int) -> Column:
    return F.slice(col, m * _PQ_DSUB + 1, _PQ_DSUB)


def _l2sq(a: Column, b: Column) -> Column:
    """Squared L2 as a sequential left fold — deterministic order."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _pq_adc_oracle() -> str:
    """DuckDB SQL reproducing PQ encode + ADC search exactly: same pinned
    codebook rows, the identical left-fold order for every squared-L2 and
    for the 8-term ADC sum (``list_reduce`` over ``generate_series`` in
    subspace order — no commutative-reduction FP ambiguity), and the same
    (distance, codeword) lexicographic tie-break for encoding."""
    ids = ", ".join(str(i) for i in sorted(_PQ_CODEBOOK_IDS))
    subd = (
        f"list_reduce(list_transform(generate_series(1, {_PQ_DSUB}),"
        f" i -> (v.e[s.m*{_PQ_DSUB}+i] - c.e[s.m*{_PQ_DSUB}+i])"
        f" * (v.e[s.m*{_PQ_DSUB}+i] - c.e[s.m*{_PQ_DSUB}+i])),"
        f" (a, b) -> a + b)"
    )
    return f"""
    WITH v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings
    ), cb AS (
      SELECT CAST(list_position([{ids}], CAST(vec_id AS INT)) - 1 AS INT) AS k, e
      FROM v WHERE vec_id IN ({ids})
    ), subm AS (
      SELECT CAST(unnest(generate_series(0, {_PQ_M - 1})) AS INT) AS m
    ), pairs AS (
      SELECT v.vec_id, s.m, c.k, {subd} AS d
      FROM v CROSS JOIN subm s CROSS JOIN cb c
    ), codes AS (
      SELECT vec_id, list(k ORDER BY m) AS codes
      FROM (SELECT vec_id, m, k,
                   ROW_NUMBER() OVER (PARTITION BY vec_id, m
                                      ORDER BY d, k) AS rn
            FROM pairs)
      WHERE rn = 1 GROUP BY vec_id
    ), lut AS (
      SELECT vec_id AS query_id, list(d ORDER BY m, k) AS lut
      FROM pairs WHERE vec_id < {_N_QUERIES} GROUP BY vec_id
    ), scored AS (
      SELECT l.query_id, c.vec_id AS neighbor_id,
             ROUND(list_reduce(
                     list_transform(generate_series(0, {_PQ_M - 1}),
                                    m -> l.lut[m*{_PQ_K} + c.codes[m+1] + 1]),
                     (a, b) -> a + b), 5) AS adc_dist
      FROM codes c CROSS JOIN lut l
      WHERE c.vec_id <> l.query_id
    )
    SELECT query_id, neighbor_id, adc_dist
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY adc_dist ASC, neighbor_id) AS rn
          FROM scored)
    WHERE rn <= {_TOP_K}
    """


@register("q_embedding_pq_adc", oracle=_pq_adc_oracle())
def q_embedding_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN with asymmetric distance computation — the
    memory-bounded scale path for 10⁹-vector corpora: each 64-dim float
    vector compresses to 8 one-byte codes (32× smaller than the raw
    column), queries scan CODES + a tiny per-query lookup table instead of
    raw vectors (Jégou et al., "Product Quantization for Nearest Neighbor
    Search", TPAMI 2011 — public method).

    Encode: split each vector into {_PQ_M} subspaces of {_PQ_DSUB} dims;
    per subspace pick the nearest of {_PQ_K} codewords (squared L2,
    (distance, codeword) lexicographic tie-break via a struct-MIN
    aggregate).  The codebook is the pinned-vec_id subvectors — no float
    k-means training to drift, so the whole pipeline is hash-checked
    against the DuckDB oracle (production would train per-subspace k-means
    with `q_kmeans_assign_update`'s machinery; identical dataflow).
    Search: ADC — each query precomputes its {_PQ_M}×{_PQ_K} distance
    LUT; a candidate's approximate distance is the M-term ordered fold of
    LUT lookups by its codes, summed in subspace order in BOTH engines so
    the doubles match bit-for-bit.

    Scale shape: encoding shuffles n×M skinny (vec, subspace) keys once
    (the codebook rides broadcast); the search side broadcasts queries×LUT
    rows and streams over the code table map-side — nothing quadratic,
    and at 100 TB the code table is the only thing rescanned per query
    batch.  At production scale ADC composes with the IVF cell pruning of
    `q_embedding_ann_ivf` (scan only probed cells' codes)."""
    ids_sorted = sorted(_PQ_CODEBOOK_IDS)
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", to_double_vec(F.col("embedding")).alias("e")
    )
    cb = emb.filter(F.col("vec_id").isin(list(ids_sorted))).select(
        (
            F.array_position(
                F.array(*[F.lit(i) for i in ids_sorted]),
                F.col("vec_id").cast("int"),
            )
            - 1
        )
        .cast("int")
        .alias("k"),
        "e",
    )
    cb_sub = cb.select(
        "k",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(m).cast("int").alias("m"),
                        _pq_sub(F.col("e"), m).alias("ce"),
                    )
                    for m in range(_PQ_M)
                ]
            )
        ).alias("s"),
    ).select(F.col("s.m").alias("m"), "k", F.col("s.ce").alias("ce"))

    vec_sub = emb.select(
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(m).cast("int").alias("m"),
                        _pq_sub(F.col("e"), m).alias("ve"),
                    )
                    for m in range(_PQ_M)
                ]
            )
        ).alias("s"),
    ).select("vec_id", F.col("s.m").alias("m"), F.col("s.ve").alias("ve"))

    paired = vec_sub.join(F.broadcast(cb_sub), "m")
    d = _l2sq(F.col("ve"), F.col("ce"))
    # nearest codeword per (vector, subspace): struct-MIN = ORDER BY d, k
    best = paired.groupBy("vec_id", "m").agg(
        F.min(F.struct(d.alias("d"), F.col("k").alias("k"))).alias("best")
    )
    codes = best.groupBy("vec_id").agg(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct(F.col("m"), F.col("best.k").alias("k"))
                )
            ),
            lambda s: s["k"],
        ).alias("codes")
    )

    # per-query LUT: flat array ordered by (m, k) — index m*K + code + 1
    q_pairs = paired.filter(F.col("vec_id") < _N_QUERIES)
    lut = q_pairs.groupBy(F.col("vec_id").alias("query_id")).agg(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct(F.col("m"), F.col("k"), d.alias("d"))
                )
            ),
            lambda s: s["d"],
        ).alias("lut")
    )

    adc = F.aggregate(
        F.sequence(F.lit(0), F.lit(_PQ_M - 1)),
        F.lit(0.0),
        lambda acc, m: acc
        + F.element_at(
            F.col("lut"),
            (m * _PQ_K + F.element_at(F.col("codes"), m + 1) + 1).cast("int"),
        ),
    )
    scored = (
        codes.join(F.broadcast(lut))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(adc, 5).alias("adc_dist"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("adc_dist"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _TOP_K)
        .select("query_id", "neighbor_id", "adc_dist")
    )


_KMEANS_K = 8  # deterministic seeds: the K smallest vec_ids


@register(
    "q_kmeans_assign_update",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings
    ), seeds AS (
      SELECT vec_id AS cluster_id, e AS c FROM v WHERE vec_id < {_KMEANS_K}
    ), assigned AS (
      SELECT vec_id, cluster_id, d, d0 FROM (
        SELECT v.vec_id, s.cluster_id,
               list_reduce(list_transform(generate_series(1, {_DIM}),
                           i -> (v.e[i] - s.c[i]) * (v.e[i] - s.c[i])),
                           (a, b) -> a + b) AS d,
               v.e[1] AS d0,
               ROW_NUMBER() OVER (PARTITION BY v.vec_id
                                  ORDER BY list_reduce(
                                    list_transform(generate_series(1, {_DIM}),
                                      i -> (v.e[i] - s.c[i]) * (v.e[i] - s.c[i])),
                                    (a, b) -> a + b), s.cluster_id) AS rn
        FROM v CROSS JOIN seeds s)
      WHERE rn = 1
    )
    SELECT cluster_id,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           ROUND(CAST(SUM(CAST(d AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*), 6)
             AS avg_sq_dist,
           ROUND(CAST(SUM(CAST(d0 AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*), 6)
             AS centroid_d0
    FROM assigned
    GROUP BY cluster_id
    """,
)
def q_kmeans_assign_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One deterministic Lloyd iteration of k-means over the embedding
    corpus (the clustering primitive behind IVF index training, SemDeDup
    semantic dedup, and topic-balanced mixture sampling): assign every
    vector to its nearest of K={K} seed centroids (the K smallest vec_ids,
    squared-L2, ties to the lower cluster id), then emit the per-cluster
    update — member count, mean within-cluster squared distance (the
    inertia the next iteration would reduce) and the first component of
    the recomputed centroid.

    Scale shape: the K seeds are a broadcast (tiny) side, so assignment is
    an embarrassingly-parallel map — the K-way candidate expansion
    collapses back to one row per vector via a min-struct partial
    aggregate BEFORE the exchange (map-side combine on vec_id), and the
    cluster update is a second K-row-wide hash aggregate.  A full Lloyd
    loop is this plan iterated with the K-row update broadcast back — per
    round exactly one wide exchange over the corpus.  Distances are the
    same sequential left-fold in both engines; cluster sums are DECIMAL so
    shuffle order can't perturb them."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", to_double_vec(F.col("embedding")).alias("e")
    )
    seeds = emb.filter(F.col("vec_id") < _KMEANS_K).select(
        F.col("vec_id").alias("cluster_id"), F.col("e").alias("c")
    )
    sq_dist = F.aggregate(
        F.zip_with(F.col("e"), F.col("c"), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    cand = emb.crossJoin(F.broadcast(seeds)).select(
        "vec_id",
        F.struct(
            sq_dist.alias("d"),
            F.col("cluster_id"),
            F.element_at(F.col("e"), 1).alias("d0"),
        ).alias("s"),
    )
    assigned = cand.groupBy("vec_id").agg(F.min("s").alias("s")).select(
        F.col("s.cluster_id").alias("cluster_id"),
        F.col("s.d").cast("decimal(28,12)").alias("d"),
        F.col("s.d0").cast("decimal(28,12)").alias("d0"),
    )
    return assigned.groupBy("cluster_id").agg(
        F.count("*").cast("long").alias("n_vecs"),
        F.round(F.sum("d").cast("double") / F.count("*"), 6).alias("avg_sq_dist"),
        F.round(F.sum("d0").cast("double") / F.count("*"), 6).alias("centroid_d0"),
    )


# Cluster seeds: every base vec_id ≡ 0 (mod stride).  A CONSTANT stride
# makes the seed count K grow linearly with the corpus (vec_ids are dense),
# which is the SemDeDup paper's K ∝ n regime: average cluster size stays
# ~stride/4 docs no matter the scale, so Σ|cluster|² grows linearly, not
# quadratically (VERDICT r6 #2 — the old vec_id < 32 rule pinned K=8 and
# had to be exempted from the 100× scale run).  64 is a multiple of 4 (so
# seeds are base rows) and divides the 10⁷ replica id-shift used by
# tools/scale_smoke.py, keeping per-replica seed density uniform.
_SD_SEED_STRIDE = 64

# Referee-tier slice cap (VERDICT r11 #2): the exact argmin-over-all-seeds
# assignment is this query's contract, and with K ∝ n it is inherently
# n·K = O(n²) work — the production tier (q_semdedup_ivf) replaces it with
# √K coarse routing.  Rather than duplicate the IVF plan here, the referee
# runs the EXACT kernel over a deterministic, SF-adaptive corpus slice:
# every m-th base vector with m = ⌈n_base / cap⌉, so the exact tier's work
# is bounded at ~cap²/stride at any corpus size while real test SFs
# (≤ 500 base vectors ⇒ m = 1) are byte-identical to the uncapped query.
# Plants, seeds, and clusters all derive from the slice, so the
# planted-twin recall contract is preserved (a twin and its base are
# always sliced together).  2 000 > sf0.1's 500 base rows with 4× headroom.
_SD_EXACT_CAP = 2_000


@register(
    "q_semdedup_clustered",
    oracle=f"""
    WITH base AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings WHERE vec_id % 4 = 0
    ), mm AS (
      SELECT GREATEST(1, (COUNT(*) + {_SD_EXACT_CAP - 1}) // {_SD_EXACT_CAP})
               AS m
      FROM base
    ), sliced AS (
      SELECT vec_id, e FROM base, mm WHERE ((vec_id // 4) % m) = 0
    ), planted AS (
      SELECT vec_id + {_ND_PLANT_OFFSET} AS vec_id,
             list_transform(generate_series(1, {_DIM}),
                            i -> e[i] * {_ND_EPS.replace("i *", "(i - 1) *")}) AS e
      FROM sliced WHERE vec_id % {_ND_PLANT_MOD} = 0
    ), v AS (
      SELECT * FROM sliced UNION ALL SELECT * FROM planted
    ), n AS (
      SELECT vec_id, e,
             sqrt(list_reduce(list_transform(e, x -> x * x), (a, b) -> a + b))
               AS nrm
      FROM v
    ), seeds AS (
      SELECT vec_id AS cluster_id, e AS c FROM sliced
      WHERE vec_id % {_SD_SEED_STRIDE} = 0
    ), assigned AS (
      SELECT vec_id, e, nrm, cluster_id FROM (
        SELECT n.vec_id, n.e, n.nrm, s.cluster_id,
               ROW_NUMBER() OVER (PARTITION BY n.vec_id
                 ORDER BY list_reduce(
                   list_transform(generate_series(1, {_DIM}),
                     i -> (n.e[i] - s.c[i]) * (n.e[i] - s.c[i])),
                   (a, b) -> a + b), s.cluster_id) AS rn
        FROM n CROSS JOIN seeds s)
      WHERE rn = 1
    )
    SELECT a.cluster_id, a.vec_id AS vec_id_1, b.vec_id AS vec_id_2,
           ROUND(list_reduce(list_transform(generate_series(1, {_DIM}),
                                            i -> a.e[i] * b.e[i]),
                             (x, y) -> x + y) / (a.nrm * b.nrm), 5) AS cosine_sim
    FROM assigned a JOIN assigned b
      ON a.cluster_id = b.cluster_id AND a.vec_id < b.vec_id
    WHERE list_reduce(list_transform(generate_series(1, {_DIM}),
                                     i -> a.e[i] * b.e[i]),
                      (x, y) -> x + y) / (a.nrm * b.nrm) >= 0.92
    """,
)
def q_semdedup_clustered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023 "SemDeDup: Data-efficient learning at
    web-scale through semantic deduplication"): cluster the embedding
    space, then search for near-duplicate pairs ONLY within each cluster —
    the cluster is the blocking key, so the quadratic pair term is bounded
    by Σ|cluster|² instead of n².  Same planted-twin corpus as
    q_embedding_neardup_cosine; the blocking here is k-means cells (seeds =
    every base vec_id ≡ 0 mod {_SD_SEED_STRIDE}, squared-L2 argmin) instead
    of hyperplane LSH buckets — the two queries are the two published
    blocking strategies over the identical exact-verification kernel, and
    their planted twins must both be found (a twin's 2% perturbation
    cannot flip its nearest seed).

    Scale shape: seeds broadcast; assignment collapses the K-way expansion
    map-side (partial min-struct per vec_id) before one exchange; the
    within-cluster self-join is an equi-join on cluster_id.  The constant
    seed STRIDE makes K ∝ n (SemDeDup uses ~100k clusters for web
    corpora): average |cluster| stays ~stride/4 at every corpus size, so
    Σ|cluster|² — the pair-generation work — grows LINEARLY with the data
    instead of quadratically (the fixed-K=8 version had to be exempted
    from the 100× scale run; this one passes it).  The exact
    argmin-over-all-seeds assignment (n·K distance evaluations, O(n²)
    with K ∝ n) is this query's referee-tier contract, so instead of
    approximating it the referee runs over a deterministic SF-adaptive
    corpus slice bounded at ~{_SD_EXACT_CAP} base vectors (VERDICT r11
    #2; see _SD_EXACT_CAP — m = 1 at every real test SF, so sf0.001/0.01/
    0.1 results are identical to the uncapped query).  The production
    path over the FULL corpus is q_semdedup_ivf's coarse-quantizer probe,
    which is how the paper's implementation assigns at web scale.
    Deliberately missing cross-cluster pairs is the algorithm's
    documented approximation."""
    base = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") % 4 == 0)
        .select("vec_id", to_double_vec(F.col("embedding")).alias("e"))
    )
    # SF-adaptive slice (see _SD_EXACT_CAP): one tiny count job, then a
    # pushdown-able modulo filter; m = 1 at every real test SF.
    n_base = base.count()
    m = max(1, (n_base + _SD_EXACT_CAP - 1) // _SD_EXACT_CAP)
    sliced = base.filter((F.expr("vec_id DIV 4") % F.lit(m)) == 0)
    planted = sliced.filter(F.col("vec_id") % _ND_PLANT_MOD == 0).select(
        (F.col("vec_id") + _ND_PLANT_OFFSET).alias("vec_id"),
        F.expr(f"transform(e, (x, i) -> x * {_ND_EPS})").alias("e"),
    )
    corpus = sliced.unionAll(planted).withColumn("nrm", l2_norm(F.col("e")))
    seeds = sliced.filter(F.col("vec_id") % _SD_SEED_STRIDE == 0).select(
        F.col("vec_id").alias("cluster_id"), F.col("e").alias("c")
    )
    sq_dist = F.aggregate(
        F.zip_with(F.col("e"), F.col("c"), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    assigned = (
        corpus.crossJoin(F.broadcast(seeds))
        .select(
            "vec_id",
            F.struct(
                sq_dist.alias("d"),
                F.col("cluster_id"),
                F.col("e"),
                F.col("nrm"),
            ).alias("s"),
        )
        .groupBy("vec_id")
        .agg(F.min("s").alias("s"))
        .select(
            "vec_id",
            F.col("s.cluster_id").alias("cluster_id"),
            F.col("s.e").alias("e"),
            F.col("s.nrm").alias("nrm"),
        )
    )
    a = assigned.select(
        "cluster_id",
        F.col("vec_id").alias("vec_id_1"),
        F.col("e").alias("e1"),
        F.col("nrm").alias("n1"),
    )
    b = assigned.select(
        "cluster_id",
        F.col("vec_id").alias("vec_id_2"),
        F.col("e").alias("e2"),
        F.col("nrm").alias("n2"),
    )
    sim = cosine(F.col("e1"), F.col("e2"), F.col("n1"), F.col("n2"))
    return (
        a.join(b, "cluster_id")
        .filter(F.col("vec_id_1") < F.col("vec_id_2"))
        .filter(sim >= 0.92)
        .select(
            "cluster_id",
            "vec_id_1",
            "vec_id_2",
            F.round(sim, 5).alias("cosine_sim"),
        )
    )


# Production-path SemDeDup (VERDICT r8 #5): the exact variant's one
# superlinear term is the argmin-over-ALL-K-seeds assignment (n·K distance
# evaluations with K ∝ n ⇒ quadratic).  The fix is the paper's coarse
# quantizer: a second, √K-sized centroid level.  Every seed hangs off its
# nearest coarse cell; each vector probes its P nearest coarse cells and
# argmins only over the seeds inside them — n·C + n·P·(K/C) work, which at
# C ≈ √K is n·√K·(1+P) instead of n·K.  Assignment becomes approximate
# (the true nearest seed can hide in an unprobed coarse cell) but the rule
# is fully deterministic, so the whole pipeline still hash-checks against
# a DuckDB oracle that applies the identical two-level rule.
# P=4 probes: P=2 loses ~4% of pairs at test SF, P=3 still drops one
# boundary twin at sf0.01 (vec 40's true seed hides in its 4th-nearest
# coarse cell); P=4 recovers 100% of the exact variant's pairs at both
# test SFs while keeping assignment work at n·√K·(1+P).
_SD_IVF_PROBE = 4


def _sd_ivf_oracle() -> str:
    l2 = (
        "list_reduce(list_transform(generate_series(1, {d}),"
        " i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i])), (x, y) -> x + y)"
    )
    return f"""
    WITH base AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings WHERE vec_id % 4 = 0
    ), planted AS (
      SELECT vec_id + {_ND_PLANT_OFFSET} AS vec_id,
             list_transform(generate_series(1, {_DIM}),
                            i -> e[i] * {_ND_EPS.replace("i *", "(i - 1) *")}) AS e
      FROM base WHERE vec_id % {_ND_PLANT_MOD} = 0
    ), v AS (
      SELECT * FROM base UNION ALL SELECT * FROM planted
    ), n AS (
      SELECT vec_id, e,
             sqrt(list_reduce(list_transform(e, x -> x * x), (a, b) -> a + b))
               AS nrm
      FROM v
    ), seeds AS (
      SELECT vec_id AS cluster_id, e AS c FROM base
      WHERE vec_id % {_SD_SEED_STRIDE} = 0
    ), sstep AS (
      SELECT GREATEST(1, CAST(floor(sqrt(COUNT(*))) AS BIGINT)) AS s
      FROM seeds
    ), coarse AS (
      SELECT cluster_id AS coarse_id, c AS cc
      FROM seeds, sstep
      WHERE ((cluster_id // {_SD_SEED_STRIDE}) % s) = 0
    ), seed_assign AS (
      SELECT cluster_id, c, coarse_id FROM (
        SELECT s.cluster_id, s.c, co.coarse_id,
               ROW_NUMBER() OVER (PARTITION BY s.cluster_id
                 ORDER BY {l2.format(d=_DIM, a="s.c", b="co.cc")},
                          co.coarse_id) AS rn
        FROM seeds s CROSS JOIN coarse co)
      WHERE rn = 1
    ), vec_probe AS (
      SELECT vec_id, e, nrm, coarse_id FROM (
        SELECT n.vec_id, n.e, n.nrm, co.coarse_id,
               ROW_NUMBER() OVER (PARTITION BY n.vec_id
                 ORDER BY {l2.format(d=_DIM, a="n.e", b="co.cc")},
                          co.coarse_id) AS rn
        FROM n CROSS JOIN coarse co)
      WHERE rn <= {_SD_IVF_PROBE}
    ), assigned AS (
      SELECT vec_id, e, nrm, cluster_id FROM (
        SELECT vp.vec_id, vp.e, vp.nrm, sa.cluster_id,
               ROW_NUMBER() OVER (PARTITION BY vp.vec_id
                 ORDER BY {l2.format(d=_DIM, a="vp.e", b="sa.c")},
                          sa.cluster_id) AS rn
        FROM vec_probe vp JOIN seed_assign sa ON sa.coarse_id = vp.coarse_id)
      WHERE rn = 1
    )
    SELECT a.cluster_id, a.vec_id AS vec_id_1, b.vec_id AS vec_id_2,
           ROUND(list_reduce(list_transform(generate_series(1, {_DIM}),
                                            i -> a.e[i] * b.e[i]),
                             (x, y) -> x + y) / (a.nrm * b.nrm), 5) AS cosine_sim
    FROM assigned a JOIN assigned b
      ON a.cluster_id = b.cluster_id AND a.vec_id < b.vec_id
    WHERE list_reduce(list_transform(generate_series(1, {_DIM}),
                                     i -> a.e[i] * b.e[i]),
                      (x, y) -> x + y) / (a.nrm * b.nrm) >= 0.92
    """


@register("q_semdedup_ivf", oracle=_sd_ivf_oracle())
def q_semdedup_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup with an IVF coarse quantizer — the production-scale
    assignment path promised by q_semdedup_clustered's docstring (that
    exact twin stays as the referee).  Identical planted corpus, seeds,
    pair verification, and 0.92 threshold; only the vector→seed assignment
    differs: a √K-sized coarse level prunes the argmin to the seeds of the
    {_SD_IVF_PROBE} probed coarse cells.

    Scale shape: C = ⌊√K⌋ coarse centroids (data-derived via one tiny
    count; deterministic rule shared with the oracle) broadcast to both
    the seed-assignment (K·C, tiny) and vector-probe (n·C) stages; the
    final argmin is an equi-join on coarse_id against the broadcast seed
    routing table — n·P·(K/C) distance evaluations.  Total assignment
    work n·√K·(1+P) vs the exact twin's n·K: with K ∝ n this is the
    difference between O(n^1.5) and O(n²).  All folds are sequential
    left-folds and every argmin tie-breaks on id, so the approximate
    pipeline is still value-deterministic and hash-checked."""
    base = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") % 4 == 0)
        .select("vec_id", to_double_vec(F.col("embedding")).alias("e"))
    )
    planted = base.filter(F.col("vec_id") % _ND_PLANT_MOD == 0).select(
        (F.col("vec_id") + _ND_PLANT_OFFSET).alias("vec_id"),
        F.expr(f"transform(e, (x, i) -> x * {_ND_EPS})").alias("e"),
    )
    corpus = base.unionAll(planted).withColumn("nrm", l2_norm(F.col("e")))
    seeds = base.filter(F.col("vec_id") % _SD_SEED_STRIDE == 0).select(
        F.col("vec_id").alias("cluster_id"), F.col("e").alias("c")
    )

    import math

    k = seeds.count()  # one tiny job over an n/256-row frame
    s = max(1, math.isqrt(k))
    coarse = seeds.filter(
        ((F.col("cluster_id") / _SD_SEED_STRIDE).cast("long") % s) == 0
    ).select(F.col("cluster_id").alias("coarse_id"), F.col("c").alias("cc"))

    d_sc = _l2sq(F.col("c"), F.col("cc"))
    seed_assign = (
        seeds.crossJoin(F.broadcast(coarse))
        .select(
            "cluster_id",
            F.struct(d_sc.alias("d"), F.col("coarse_id"), F.col("c")).alias("s"),
        )
        .groupBy("cluster_id")
        .agg(F.min("s").alias("s"))
        .select(
            "cluster_id",
            F.col("s.coarse_id").alias("coarse_id"),
            F.col("s.c").alias("c"),
        )
    )
    d_vc = _l2sq(F.col("e"), F.col("cc"))
    vec_probe = (
        corpus.crossJoin(F.broadcast(coarse))
        .select("vec_id", "e", "nrm", "coarse_id", d_vc.alias("d"))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("vec_id").orderBy("d", "coarse_id")
            ),
        )
        .filter(F.col("rn") <= _SD_IVF_PROBE)
        .select("vec_id", "e", "nrm", "coarse_id")
    )
    d_vs = _l2sq(F.col("e"), F.col("c"))
    assigned = (
        vec_probe.join(F.broadcast(seed_assign), "coarse_id")
        .select(
            "vec_id",
            F.struct(
                d_vs.alias("d"),
                F.col("cluster_id"),
                F.col("e"),
                F.col("nrm"),
            ).alias("s"),
        )
        .groupBy("vec_id")
        .agg(F.min("s").alias("s"))
        .select(
            "vec_id",
            F.col("s.cluster_id").alias("cluster_id"),
            F.col("s.e").alias("e"),
            F.col("s.nrm").alias("nrm"),
        )
    )
    a = assigned.select(
        "cluster_id",
        F.col("vec_id").alias("vec_id_1"),
        F.col("e").alias("e1"),
        F.col("nrm").alias("n1"),
    )
    b = assigned.select(
        "cluster_id",
        F.col("vec_id").alias("vec_id_2"),
        F.col("e").alias("e2"),
        F.col("nrm").alias("n2"),
    )
    sim = cosine(F.col("e1"), F.col("e2"), F.col("n1"), F.col("n2"))
    return (
        a.join(b, "cluster_id")
        .filter(F.col("vec_id_1") < F.col("vec_id_2"))
        .filter(sim >= 0.92)
        .select(
            "cluster_id",
            "vec_id_1",
            "vec_id_2",
            F.round(sim, 5).alias("cosine_sim"),
        )
    )


@register(
    "q_embedding_pca_power",
    oracle=f"""
    WITH v AS (
      SELECT label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings
    ), d1 AS (
      SELECT label, e, list_reduce(e, (a, b) -> a + b) AS d FROM v
    ), s1 AS (
      SELECT label, i AS pos,
             CAST(SUM(CAST(d * e[i] AS DECIMAL(28,12))) AS DOUBLE) AS y
      FROM d1, UNNEST(generate_series(1, {_DIM})) AS t(i)
      GROUP BY label, i
    ), y1 AS (
      SELECT label, list(y ORDER BY pos) AS y FROM s1 GROUP BY label
    ), x1 AS (
      SELECT label,
             list_transform(y, w -> w / sqrt(list_reduce(
               list_transform(y, w -> w * w), (a, b) -> a + b))) AS x
      FROM y1
    ), d2 AS (
      SELECT v.label, v.e,
             list_reduce(list_transform(generate_series(1, {_DIM}),
                         i -> v.e[i] * x1.x[i]), (a, b) -> a + b) AS d
      FROM v JOIN x1 USING (label)
    ), s2 AS (
      SELECT label, i AS pos,
             CAST(SUM(CAST(d * e[i] AS DECIMAL(28,12))) AS DOUBLE) AS y
      FROM d2, UNNEST(generate_series(1, {_DIM})) AS t(i)
      GROUP BY label, i
    ), y2 AS (
      SELECT label, list(y ORDER BY pos) AS y FROM s2 GROUP BY label
    ), fin AS (
      SELECT label, y,
             sqrt(list_reduce(list_transform(y, w -> w * w),
                              (a, b) -> a + b)) AS nrm
      FROM y2
    )
    SELECT label,
           ROUND(nrm, 6) AS lambda_1,
           ROUND(y[1] / nrm, 6) AS pc_1,
           ROUND(y[2] / nrm, 6) AS pc_2,
           ROUND(y[3] / nrm, 6) AS pc_3,
           ROUND(y[4] / nrm, 6) AS pc_4
    FROM fin
    """,
)
def q_embedding_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label dominant principal component via two power iterations —
    the embedding-space diagnostic a curation pipeline runs before
    whitening, ANN index training, or drift detection (a class whose top
    eigenvalue explodes is collapsing onto one direction; anisotropic
    embeddings break cosine ANN recall).  x₀ = 1⃗; each iteration computes
    y = Σ_v (v·x)·v — the covariance-matrix product without ever
    materializing the 64×64 Gram matrix — then normalizes.  Output per
    label: the Rayleigh-style eigenvalue estimate ‖y₂‖ (given ‖x₁‖ = 1)
    and the first four eigenvector components.

    Determinism: the dot v·x is the module's sequential left-fold; each
    per-position contribution d·v[i] folds through DECIMAL(28,12) before
    the per-(label,pos) SUM (shuffle-order-proof); sqrt is IEEE
    correctly-rounded in both engines; the final divisions are one IEEE
    expression each.  Scale shape: matvec = one posexplode → hash
    aggregate on (label, pos) — map-side combined, so the exchange
    carries labels × dim rows, NOT the corpus; the dim-length iterate
    re-joins the corpus as a broadcast.  Per iteration exactly one wide
    exchange over the vectors, the PageRank/k-means loop discipline."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "label", to_double_vec(F.col("embedding")).alias("e")
    )

    def matvec(vecs: DataFrame) -> DataFrame:
        """(label, e, d) → per-label Σ d·v as a dim-length array column."""
        sums = (
            vecs.select(
                "label", "d", F.posexplode("e").alias("pos0", "val")
            )
            .groupBy("label", (F.col("pos0") + 1).alias("pos"))
            .agg(
                F.sum((F.col("d") * F.col("val")).cast("decimal(28,12)"))
                .cast("double")
                .alias("y")
            )
        )
        return sums.groupBy("label").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "y"))),
                lambda s: s["y"],
            ).alias("y")
        )

    d1 = emb.withColumn(
        "d", F.aggregate("e", F.lit(0.0), lambda a, x: a + x)
    )
    y1 = matvec(d1)
    nrm1 = l2_norm(F.col("y"))
    x1 = y1.select(
        "label", F.transform("y", lambda w: w / nrm1).alias("x")
    )
    d2 = emb.join(F.broadcast(x1), "label").select(
        "label", "e", dot(F.col("e"), F.col("x")).alias("d")
    )
    fin = matvec(d2).withColumn("nrm", l2_norm(F.col("y")))
    return fin.select(
        "label",
        F.round("nrm", 6).alias("lambda_1"),
        F.round(F.col("y")[0] / F.col("nrm"), 6).alias("pc_1"),
        F.round(F.col("y")[1] / F.col("nrm"), 6).alias("pc_2"),
        F.round(F.col("y")[2] / F.col("nrm"), 6).alias("pc_3"),
        F.round(F.col("y")[3] / F.col("nrm"), 6).alias("pc_4"),
    )


_HN_ANCHORS = 10  # vec_id < 10 are the anchors for hard-negative mining
_HN_K = 5


@register(
    "q_hard_negative_mining",
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
    ), scored AS (
      SELECT a.vec_id AS anchor_id,
             a.label AS anchor_label,
             c.vec_id AS negative_id,
             c.label AS negative_label,
             ROUND(list_reduce(list_transform(generate_series(1, {_DIM}),
                                              i -> a.e[i] * c.e[i]),
                               (a2, b2) -> a2 + b2) / (a.nrm * c.nrm), 5)
               AS cosine_sim
      FROM n a JOIN n c
        ON a.vec_id < {_HN_ANCHORS}
       AND c.label <> a.label
    )
    SELECT anchor_id, anchor_label, negative_id, negative_label, cosine_sim
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY anchor_id
                                       ORDER BY cosine_sim DESC, negative_id)
                      AS rn
          FROM scored)
    WHERE rn <= {_HN_K}
    """,
)
def q_hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training data: for each anchor,
    the top-{_HN_K} most-similar vectors carrying a DIFFERENT label — the
    near-miss negatives that contrastive and retrieval fine-tuning actually
    learn from (random negatives are trivially separable; the hard ones sit
    just across the decision boundary).

    Scale shape: identical to the brute-force cosine baseline — anchors
    ride as a broadcast, the corpus scan is embarrassingly parallel, only
    per-anchor top-k heaps shuffle (anchors × k rows).  At 10⁹ vectors the
    corpus scan composes with the ANN tier exactly like search does: probe
    `q_embedding_ann_ivf`'s cells (or `q_embedding_pq_adc`'s codes) first,
    then apply the label-inequality filter during re-rank — same dataflow,
    candidate set instead of full scan."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", to_double_vec(F.col("embedding")).alias("e")
    )
    emb = emb.withColumn("nrm", l2_norm(F.col("e")))
    anchors = emb.filter(F.col("vec_id") < _HN_ANCHORS).select(
        F.col("vec_id").alias("anchor_id"),
        F.col("label").alias("anchor_label"),
        F.col("e").alias("ae"),
        F.col("nrm").alias("an"),
    )
    sim = cosine(F.col("ae"), F.col("e"), F.col("an"), F.col("nrm"))
    scored = (
        emb.join(
            F.broadcast(anchors),
            F.col("label") != F.col("anchor_label"),
        )
        .select(
            "anchor_id",
            "anchor_label",
            F.col("vec_id").alias("negative_id"),
            F.col("label").alias("negative_label"),
            F.round(sim, 5).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("anchor_id").orderBy(
        F.desc("cosine_sim"), F.asc("negative_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _HN_K)
        .select(
            "anchor_id",
            "anchor_label",
            "negative_id",
            "negative_label",
            "cosine_sim",
        )
    )


_RP_OUT_DIMS = 8
_RP_IN_DIMS = 64


def _rp_signs() -> list[list[float]]:
    """Deterministic Rademacher (±1) projection matrix from md5 parity —
    the Achlioptas/JL database-friendly construction (public method),
    generated once at plan-build time and embedded as literals in BOTH the
    Spark expression and the oracle SQL (no runtime hashing needed)."""
    import hashlib

    return [
        [
            1.0
            if int(hashlib.md5(f"rp:{j}:{i}".encode()).hexdigest()[0], 16) % 2
            == 0
            else -1.0
            for i in range(_RP_IN_DIMS)
        ]
        for j in range(_RP_OUT_DIMS)
    ]


def _rp_oracle() -> str:
    cols = []
    for j, row in enumerate(_rp_signs()):
        lst = "[" + ", ".join(
            "1.0" if s > 0 else "-1.0" for s in row
        ) + "]"
        cols.append(
            f"ROUND(list_reduce(list_transform("
            f"generate_series(1, {_RP_IN_DIMS}), "
            f"i -> CAST(embedding[i] AS DOUBLE) * ({lst})[i]), (a, b) -> a + b), 6) AS p{j}"
        )
    return "SELECT vec_id, " + ", ".join(cols) + " FROM embeddings"


@register("q_embedding_random_projection", oracle=_rp_oracle())
def q_embedding_random_projection(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Johnson-Lindenstrauss random projection {_RP_IN_DIMS}→{_RP_OUT_DIMS}
    dims with a pinned Rademacher sign matrix — the dimensionality-
    reduction prefilter an ANN pipeline runs before exact re-rank (project
    once, compare 8-dim sketches, re-rank survivors on the full vector;
    8× less distance arithmetic and memory traffic per comparison).

    Determinism: signs are compile-time literals shared with the oracle;
    each output dim is one left-fold over the vector in index order
    (``F.aggregate`` ≡ DuckDB ``list_reduce`` — the PQ-ADC ordered-fold
    parity recipe), so the float math is bit-identical across engines.

    Scale shape: pure projection — per-row JVM-side array arithmetic
    inside codegen, no shuffle, no UDF, no state; the scan reads only
    (vec_id, embedding).  At 10⁹ vectors this is a map-only pass."""
    signs = _rp_signs()
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    cols = []
    for j in range(_RP_OUT_DIMS):
        zipped = F.zip_with(
            F.col("embedding"),
            F.array(*[F.lit(s) for s in signs[j]]),
            lambda x, sg: x * sg,
        )
        cols.append(
            F.round(
                F.aggregate(
                    zipped, F.lit(0.0), lambda acc, x: acc + x
                ),
                6,
            ).alias(f"p{j}")
        )
    return emb.select("vec_id", *cols)


# ---------------------------------------------------------------------------
# ANN recall audit ([extension]) — the third leg of the approx-vs-exact audit
# family (count-min exact-error audit, MinHash estimate-error audit): per
# query, recall@k of the hash-checked hyperplane-LSH ANN against the
# brute-force exact top-k.  Both sides are deterministic, engine-portable
# pipelines, so the recall numbers themselves hash-check against DuckDB.
def _ann_recall_oracle() -> str:
    return f"""
    WITH exact AS ({_topk_oracle()}),
    ann AS ({_ann_checked_oracle()}),
    hit AS (
      SELECT e.query_id, COUNT(*) AS n_hit
      FROM exact e JOIN ann a
        ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
      GROUP BY e.query_id
    ), base AS (
      SELECT query_id, COUNT(*) AS n_exact FROM exact GROUP BY query_id
    )
    SELECT b.query_id, b.n_exact,
           COALESCE(h.n_hit, 0) AS n_hit,
           ROUND(COALESCE(h.n_hit, 0) * 1.0 / b.n_exact, 5) AS recall5
    FROM base b LEFT JOIN hit h ON h.query_id = b.query_id
    """


@register("q_ann_recall_audit", oracle=_ann_recall_oracle())
def q_ann_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-query recall@{k} of the hash-checked LSH ANN
    (`q_embedding_ann_checked`) against the brute-force exact top-{k}
    (`q_embedding_topk_cosine`) — the eval a pipeline team runs before
    trusting an ANN index at 100 TB, where only the sketch-surfaced tier is
    affordable corpus-wide and the exact tier exists for a query sample.

    Scale shape: both sides broadcast the fixed query set against one
    candidate scan (embarrassingly parallel, no candidate shuffle); the
    recall join touches two k-row-per-query frames.  Every number is
    deterministic (shared plane constants, ordered folds, id tie-breaks),
    so even the recall of an APPROXIMATE index hash-checks.""".replace(
        "{k}", str(_TOP_K)
    )
    exact = q_embedding_topk_cosine(spark, sf_dir).select(
        "query_id", "neighbor_id"
    )
    ann = q_embedding_ann_checked(spark, sf_dir).select(
        "query_id", "neighbor_id"
    )
    base = exact.groupBy("query_id").agg(F.count("*").alias("n_exact"))
    hit = (
        exact.join(ann, ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count("*").alias("n_hit"))
    )
    n_hit = F.coalesce(F.col("n_hit"), F.lit(0).cast("long"))
    return (
        base.join(hit, "query_id", "left")
        .select(
            "query_id",
            "n_exact",
            n_hit.alias("n_hit"),
            F.round(n_hit * F.lit(1.0) / F.col("n_exact"), 5).alias(
                "recall5"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Dedup-threshold sensitivity sweep ([extension]): before committing a
# SemDeDup/near-dup pass to a cosine threshold, sweep the candidate-pair
# duplicate rate across thresholds in ONE scan — the curve that picks the
# operating point.  Thresholds are integer basis points so the grouping
# key is never a float; each pair's cosine is the usual sequential fold,
# so the >= comparisons agree bit-for-bit across engines.
# 0.05 .. 0.50 brackets this synthetic corpus's cosine support (pairs are
# near-orthogonal, max ~0.51); production would center the sweep on the
# dedup operating point — the operator is range-agnostic.
_SWEEP_BP = tuple(range(500, 5500, 500))


def _sweep_oracle() -> str:
    return f"""
    WITH v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings
    ), n AS (
      SELECT vec_id, e,
             sqrt(list_reduce(list_transform(e, x -> x * x),
                              (p, c) -> p + c)) AS nrm
      FROM v
      WHERE list_reduce(list_transform(e, x -> x * x), (p, c) -> p + c) > 0
    ), pairs AS (
      SELECT list_reduce(list_transform(generate_series(1, {_DIM}),
                                        i -> a.e[i] * b.e[i]),
                         (p, c) -> p + c) / (a.nrm * b.nrm) AS cs
      FROM n a JOIN n b ON b.vec_id = a.vec_id + 1
    )
    SELECT t_bp,
           COUNT(*) AS n_pairs,
           CAST(SUM(CASE WHEN cs >= t_bp / 10000.0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_dup,
           ROUND(SUM(CASE WHEN cs >= t_bp / 10000.0 THEN 1 ELSE 0 END) * 1.0
                 / COUNT(*), 5) AS dup_rate5
    FROM pairs, (SELECT unnest({list(_SWEEP_BP)}) AS t_bp)
    GROUP BY t_bp
    """


@register("q_dedup_threshold_sweep", oracle=_sweep_oracle())
def q_dedup_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup threshold sensitivity curve: for each cosine threshold in
    {BP} basis points, the fraction of deterministic consecutive-id
    candidate pairs at or above it — one scan, ten numbers, the evidence
    a SemDeDup rollout uses to pick its operating threshold.

    Scale shape (100 TB): cosines are map-side after ONE equi-join shuffle
    on vec_id (the q_neardup_verify_jaccard plan class); the threshold
    explode multiplies rows by a CONSTANT {K} before a 10-group partial
    aggregate, so the exchange after it carries {K} rows per task no
    matter the corpus size.  Integer basis-point keys keep the groupBy off
    doubles.""".replace("{BP}", f"{_SWEEP_BP[0]}-{_SWEEP_BP[-1]}").replace(
        "{K}", str(len(_SWEEP_BP))
    )
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", to_double_vec(F.col("embedding")).alias("e")
    )
    sq = F.aggregate(
        F.transform(F.col("e"), lambda x: x * x), F.lit(0.0), lambda p, c: p + c
    )
    emb = emb.filter(sq > 0).withColumn("nrm", F.sqrt(sq))
    a = emb.select(
        F.col("vec_id").alias("v1"), F.col("e").alias("ea"), F.col("nrm").alias("na")
    )
    b = emb.select(
        F.col("vec_id").alias("v2"), F.col("e").alias("eb"), F.col("nrm").alias("nb")
    )
    pairs = a.join(b, F.col("v2") == F.col("v1") + 1).select(
        (
            dot(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb"))
        ).alias("cs")
    )
    swept = pairs.withColumn(
        "t_bp", F.explode(F.array(*[F.lit(bp) for bp in _SWEEP_BP]))
    )
    hit = (F.col("cs") >= F.col("t_bp") / F.lit(10000.0)).cast("long")
    return swept.groupBy("t_bp").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(hit).alias("n_dup"),
        F.round(F.sum(hit) * F.lit(1.0) / F.count(F.lit(1)), 5).alias(
            "dup_rate5"
        ),
    )


# ---------------------------------------------------------------------------
# MMR diversification rerank ([extension]): the retrieval-serving stage
# after hybrid fusion — Maximal Marginal Relevance (Carbonell & Goldstein
# 1998) re-picks k results from the relevance pool trading relevance
# against redundancy: argmax over remaining candidates of
# lambda*rel(c) - (1-lambda)*max_{s in selected} sim(c, s).
# The selection loop is inherently sequential, but each round touches only
# the POOL-row frame, so the k rounds are UNROLLED as fixed dataflow
# (the label-propagation unrolled-CTE playbook) — no driver collect, no
# iteration over data-sized frames.
_MMR_POOL = 20
_MMR_K = 5
_MMR_LAMBDA = 0.7


def _mmr_cos_sql(a: str, b: str) -> str:
    """Unit-free cosine between two pool rows (norms carried per row)."""
    return f"""(
      list_reduce(list_transform(generate_series(1, {_DIM}),
                                 i -> {a}.e[i] * {b}.e[i]), (p, c) -> p + c)
      / ({a}.nrm * {b}.nrm))"""


def _mmr_oracle() -> str:
    from .probes import probe_sql as _probe_sql

    lam, mu = _MMR_LAMBDA, round(1 - _MMR_LAMBDA, 10)
    rounds = []
    prev = "s1"
    for i in range(2, _MMR_K + 1):
        rounds.append(f"""
    rem{i} AS (
      SELECT p.* FROM pool p
      WHERE p.doc_id NOT IN (SELECT doc_id FROM {prev})
    ), ms{i} AS (
      SELECT r.doc_id, MAX(ROUND({_mmr_cos_sql("r", "s")}, 5)) AS msim
      FROM rem{i} r, {prev} s GROUP BY r.doc_id
    ), pick{i} AS (
      SELECT r.doc_id, r.rel5, r.e, r.nrm, {i} AS sel_rank,
             ROUND({lam} * r.rel5 - {mu} * m.msim, 5) AS mmr5
      FROM rem{i} r JOIN ms{i} m ON r.doc_id = m.doc_id
      ORDER BY ({lam} * r.rel5 - {mu} * m.msim) DESC, r.doc_id LIMIT 1
    ), s{i} AS (
      SELECT * FROM {prev} UNION ALL SELECT * FROM pick{i}
    )""")
        prev = f"s{i}"
    return f"""
    WITH qv AS ({_probe_sql("hq")}),
    ev AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings
    ), en AS (
      SELECT vec_id, e,
             sqrt(list_reduce(list_transform(e, x -> x * x),
                              (a, b) -> a + b)) AS nrm
      FROM ev
      WHERE list_reduce(list_transform(e, x -> x * x), (a, b) -> a + b) > 0
    ), pool AS (
      SELECT vec_id AS doc_id,
             ROUND(list_reduce(
                     list_transform(generate_series(1, {_DIM}),
                                    i -> e[i] * pr[i]), (a, b) -> a + b)
                   / (nrm * pn), 5) AS rel5,
             e, nrm
      FROM en, qv
      ORDER BY rel5 DESC, doc_id LIMIT {_MMR_POOL}
    ), s1 AS (
      SELECT doc_id, rel5, e, nrm, 1 AS sel_rank,
             ROUND({lam} * rel5, 5) AS mmr5
      FROM pool ORDER BY rel5 DESC, doc_id LIMIT 1
    ),{",".join(rounds)}
    SELECT CAST(sel_rank AS INT) AS sel_rank, doc_id, rel5, mmr5
    FROM {prev}
    """


@register("q_mmr_diversified_rerank", oracle=_mmr_oracle())
def q_mmr_diversified_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR rerank of the pinned-query relevance pool: pick {K} of {P}
    candidates, each round maximizing lambda*relevance − (1−lambda)*max
    cosine to the already-picked set (lambda = {L}).  Rounds are unrolled
    fixed dataflow; every score derives from 5-dp-rounded inputs, so both
    engines compute identical selection order.

    Scale shape (100 TB): the corpus appears ONLY in the pool stage — one
    scan ending in a TakeOrdered top-{P}; all {K} selection rounds join
    {P}-row frames against ≤{K}-row selected sets (broadcast-tiny, the
    bounded-crossJoin class).  MMR cost is POOL²·K upper-bounded = constant,
    independent of corpus size.""".replace("{K}", str(_MMR_K)).replace(
        "{P}", str(_MMR_POOL)
    ).replace("{L}", str(_MMR_LAMBDA))
    from .probes import probe_vector

    lam = F.lit(_MMR_LAMBDA)
    mu = F.lit(round(1 - _MMR_LAMBDA, 10))
    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("doc_id"),
        to_double_vec(F.col("embedding")).alias("e"),
    )
    sq = F.aggregate(
        F.transform(F.col("e"), lambda x: x * x), F.lit(0.0), lambda a, b: a + b
    )
    qv = probe_vector("hq")
    qn = l2_norm(qv)
    emb = emb.filter(sq > 0).withColumn("nrm", F.sqrt(sq))
    rel = dot(F.col("e"), qv) / (F.col("nrm") * qn)
    pool = (
        emb.select(
            "doc_id", F.round(rel, 5).alias("rel5"), "e", "nrm"
        )
        .orderBy(F.desc("rel5"), F.asc("doc_id"))
        .limit(_MMR_POOL)
        # consumed by every selection round — one TakeOrdered, k reuses
        .persist()
    )
    sel = (
        pool.orderBy(F.desc("rel5"), F.asc("doc_id"))
        .limit(1)
        .select(
            "doc_id",
            "rel5",
            "e",
            "nrm",
            F.lit(1).alias("sel_rank"),
            F.round(lam * F.col("rel5"), 5).alias("mmr5"),
        )
        # each round references the running selected set on BOTH sides of
        # its joins; an eager checkpoint per round keeps the k-round plan
        # k small jobs over ≤POOL-row frames instead of an exponentially
        # re-expanded lineage (measured 19.5 s → ~2 s at sf0.1)
        .localCheckpoint(eager=True)
    )
    pair_cos = F.aggregate(
        F.zip_with(F.col("e"), F.col("se"), lambda x, y: x * y),
        F.lit(0.0),
        lambda p, c: p + c,
    ) / (F.col("nrm") * F.col("snrm"))
    for i in range(2, _MMR_K + 1):
        chosen = sel.select("doc_id")
        rem = pool.join(chosen, "doc_id", "left_anti")
        sims = rem.crossJoin(
            F.broadcast(
                sel.select(
                    F.col("e").alias("se"), F.col("nrm").alias("snrm")
                )
            )
        )
        ms = sims.groupBy("doc_id").agg(
            F.max(F.round(pair_cos, 5)).alias("msim")
        )
        mmr = lam * F.col("rel5") - mu * F.col("msim")
        pick = (
            rem.join(ms, "doc_id")
            .orderBy(mmr.desc(), F.asc("doc_id"))
            .limit(1)
            .select(
                "doc_id",
                "rel5",
                "e",
                "nrm",
                F.lit(i).alias("sel_rank"),
                F.round(mmr, 5).alias("mmr5"),
            )
        )
        sel = sel.unionByName(pick).localCheckpoint(eager=True)
    out = sel.select("sel_rank", "doc_id", "rel5", "mmr5")
    from .util import materialize_releasing

    return materialize_releasing(out, pool)


# ---------------------------------------------------------------------------
# Binary (1-bit) quantization + Hamming retrieval ([extension]): the fourth
# rung of the compression ladder (float32 → int8 → PQ → 1 bit/dim).  Sign
# bits pack 32 dims into each of two BIGINT words, so a 64-dim vector costs
# 16 bytes and candidate distance is two XOR+popcount instructions — the
# shape binary-embedding retrieval (e.g. hashing-based recall tiers) runs
# over 10⁹ vectors where even int8 is too big.  Everything here is exact
# integer arithmetic plus one rounded cosine, so the whole tier hash-checks.
from .probes import probe_sql as _bh_probe_sql
from .probes import probe_vector as _bh_probe_vector

_BH_K = 20
_BH_SALT = "binhash"


def _bh_pack_sql(arr: str, lo_bit: int) -> str:
    """BIGINT with bit j-1 set iff ``{arr}[lo_bit + j]`` > 0, for j in 1..32."""
    return (
        f"list_reduce(list_transform(generate_series(1, 32), j -> "
        f"CASE WHEN {arr}[{lo_bit} + j] > 0 "
        f"THEN CAST(power(2, j - 1) AS BIGINT) ELSE 0 END), (a, b) -> a + b)"
    )


def _bh_pack_col(e, lo_bit: int):
    return F.aggregate(
        F.sequence(F.lit(1), F.lit(32)),
        F.lit(0).cast("long"),
        lambda acc, j: acc
        + F.when(
            F.element_at(e, (F.lit(lo_bit) + j).cast("int")) > 0,
            F.pow(F.lit(2.0), (j - 1).cast("double")).cast("long"),
        ).otherwise(F.lit(0).cast("long")),
    )


@register(
    "q_embedding_binary_hamming",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings
    ), n AS (
      SELECT vec_id, e,
             sqrt(list_reduce(list_transform(e, x -> x * x), (a, b) -> a + b))
               AS nrm,
             {_bh_pack_sql("e", 0)} AS lo,
             {_bh_pack_sql("e", 32)} AS hi
      FROM v
    ), pr AS ({_bh_probe_sql(_BH_SALT)}),
    pp AS (
      SELECT pr, pn,
             {_bh_pack_sql("pr", 0)} AS plo,
             {_bh_pack_sql("pr", 32)} AS phi
      FROM pr
    )
    SELECT vec_id,
           CAST(bit_count(xor(lo, plo)) + bit_count(xor(hi, phi)) AS BIGINT)
             AS hamming,
           ROUND(list_reduce(list_transform(generate_series(1, {_DIM}),
                                            i -> e[i] * pr[i]),
                             (a, b) -> a + b) / (nrm * pn), 5) AS cosine5
    FROM n, pp
    ORDER BY hamming, vec_id
    LIMIT {_BH_K}
    """,
)
def q_embedding_binary_hamming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{k} retrieval by Hamming distance over sign-binarized embeddings
    against the pinned probe, with the exact cosine reported next to each
    hit (the est-vs-exact audit column, q_minhash_estimate_error_audit's
    pattern applied to 1-bit quantization).  Sign bits pack into two
    BIGINT words per vector — 32× smaller than float32 — and distance is
    two XOR+popcount ops (``bit_count``), all exact integers, so the tier
    hash-checks bit-for-bit.

    Scale shape (100 TB / 10⁹ vectors): the packed index is 16 bytes/row
    — small enough to keep hot; the scan is one codegen projection (pack
    folds are per-row array expressions, probe constant-folds at plan
    time) and top-k is a TakeOrdered, no shuffle of vectors.  Production
    would pre-materialize the packed words columnar-side; packing inline
    here keeps the query self-contained without changing the plan
    shape.""".replace("{k}", str(_BH_K))
    v = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", to_double_vec(F.col("embedding")).alias("e")
    )
    e = F.col("e")
    n = v.select(
        "vec_id",
        "e",
        l2_norm(e).alias("nrm"),
        _bh_pack_col(e, 0).alias("lo"),
        _bh_pack_col(e, 32).alias("hi"),
    )
    pr = _bh_probe_vector(_BH_SALT)
    pp = spark.range(1).select(
        pr.alias("pr"),
        l2_norm(pr).alias("pn"),
        _bh_pack_col(pr, 0).alias("plo"),
        _bh_pack_col(pr, 32).alias("phi"),
    )
    hamming = (
        F.bit_count(F.col("lo").bitwiseXOR(F.col("plo")))
        + F.bit_count(F.col("hi").bitwiseXOR(F.col("phi")))
    ).cast("long")
    return (
        n.crossJoin(F.broadcast(pp))
        .select(
            "vec_id",
            hamming.alias("hamming"),
            F.round(
                cosine(F.col("e"), F.col("pr"), F.col("nrm"), F.col("pn")), 5
            ).alias("cosine5"),
        )
        .orderBy(F.asc("hamming"), F.asc("vec_id"))
        .limit(_BH_K)
    )


# Per-dimension feature moments ([extension]): the whitening-prep pass that
# precedes PCA/normalization — per-dim mean/std/min/max over the corpus.
# Float sums are order-dependent, so values scale to round-half-away 1e6
# integers first (the calibration-ECE recipe): integer sums are exact and
# order-free, and each output column spends its doubles in one rounded
# expression tree.
_DM_SCALE = 1_000_000


@register(
    "q_embedding_dim_moments",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings
    ), px AS (
      SELECT i - 1 AS dim,
             CAST(ROUND(e[i] * {_DM_SCALE}) AS BIGINT) AS s6
      FROM v, UNNEST(generate_series(1, {_DIM})) t(i)
    ), agg AS (
      -- HUGEINT sums mirror Spark's DECIMAL(38,0): neither engine can
      -- silently wrap Σx² past int64 headroom (~10^6 vectors/dim)
      SELECT dim, COUNT(*) AS n,
             SUM(CAST(s6 AS HUGEINT)) AS s,
             SUM(CAST(s6 AS HUGEINT) * s6) AS s2,
             MIN(s6) AS mn, MAX(s6) AS mx
      FROM px GROUP BY dim
    )
    SELECT dim, n,
           ROUND(CAST(s AS DOUBLE) / n / {_DM_SCALE}, 6) AS mean6,
           ROUND(sqrt(GREATEST(0.0,
                 (CAST(s2 AS DOUBLE) / n
                    - (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n))
                   / {_DM_SCALE} / {_DM_SCALE})), 6) AS std6,
           ROUND(mn * 1.0 / {_DM_SCALE}, 6) AS min6,
           ROUND(mx * 1.0 / {_DM_SCALE}, 6) AS max6
    FROM agg
    """,
)
def q_embedding_dim_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension moments of the embedding corpus (mean/std/min/max per
    dim) — the statistics a whitening or normalization layer is fit from
    before PCA/quantization.  Values scale to exact 1e6 integers before
    any aggregation (integer sums are order-free; the population-variance
    identity n·Σx² − (Σx)² then runs on exact BIGINTs), so the whole
    report hash-checks; sqrt is correctly rounded in both engines.

    Scale shape: posexplode ships (dim, int64) pairs — 16 bytes/element —
    into one hash aggregate with map-side combine on 64 keys; nothing
    else shuffles.  Σx and Σx² accumulate as DECIMAL(38,0) (HUGEINT in
    the oracle): BIGINT headroom would run out near ~10⁶ vectors/dim at
    this value range (|x| ≲ 2) and Spark would wrap silently where DuckDB
    raises — decimal keeps both engines exact to 38 digits, same plan."""
    px = (
        load_table(spark, sf_dir, "embeddings")
        .select(
            F.posexplode(to_double_vec(F.col("embedding"))).alias("dim", "x")
        )
        .select(
            "dim",
            F.round(F.col("x") * _DM_SCALE, 0).cast("long").alias("s6"),
        )
    )
    # DECIMAL(38,0) sums (the per-element product stays far inside int64 —
    # |s6| ≤ ~2e6 — but the SUM would wrap int64 near ~10^6 vectors/dim;
    # decimal keeps 38-digit headroom and DuckDB mirrors it with HUGEINT)
    agg = px.groupBy("dim").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("s6").cast("decimal(38,0)")).alias("s"),
        F.sum((F.col("s6") * F.col("s6")).cast("decimal(38,0)")).alias("s2"),
        F.min("s6").alias("mn"),
        F.max("s6").alias("mx"),
    )
    sc = F.lit(float(_DM_SCALE))
    mean_s = F.col("s").cast("double") / F.col("n")
    return agg.select(
        "dim",
        "n",
        F.round(mean_s / sc, 6).alias("mean6"),
        F.round(
            F.sqrt(
                F.greatest(
                    F.lit(0.0),
                    (F.col("s2").cast("double") / F.col("n") - mean_s * mean_s)
                    / sc
                    / sc,
                )
            ),
            6,
        ).alias("std6"),
        F.round(F.col("mn") * 1.0 / sc, 6).alias("min6"),
        F.round(F.col("mx") * 1.0 / sc, 6).alias("max6"),
    )


# semantic-outlier panel: farthest vectors from their label centroid
_OUTLIER_TOP = 3


@register(
    "q_semantic_outlier_docs",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, label,
             CAST(embedding AS DOUBLE[]) AS e
      FROM embeddings
    ), px AS (
      SELECT vec_id, label, i - 1 AS dim,
             CAST(ROUND(e[i] * {_DM_SCALE}) AS BIGINT) AS s6
      FROM v, UNNEST(generate_series(1, {_DIM})) t(i)
    ), cent AS (
      SELECT label, dim,
             SUM(CAST(s6 AS HUGEINT)) AS s,
             COUNT(*) AS n
      FROM px GROUP BY label, dim
    ), dist AS (
      SELECT px.vec_id, px.label,
             SUM((CAST(cent.n AS HUGEINT) * px.s6 - cent.s)
                 * (CAST(cent.n AS HUGEINT) * px.s6 - cent.s)) AS dd,
             ANY_VALUE(cent.n) AS n
      FROM px JOIN cent USING (label, dim)
      GROUP BY px.vec_id, px.label
    ), ranked AS (
      SELECT label, vec_id, dd, n,
             ROW_NUMBER() OVER (PARTITION BY label
                                ORDER BY dd DESC, vec_id) AS rnk
      FROM dist
    )
    SELECT label, vec_id, CAST(rnk AS BIGINT) AS rnk,
           ROUND(sqrt(CAST(dd AS DOUBLE)) / (n * {_DM_SCALE}.0), 6)
             AS dist6
    FROM ranked WHERE rnk <= {_OUTLIER_TOP}
    """,
)
def q_semantic_outlier_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic outlier mining: the {_OUTLIER_TOP} vectors FARTHEST from
    their own label's centroid, per label — the curation panel that
    surfaces mislabeled or off-topic items before contrastive training
    (the complement of SemDeDup: instead of pruning the cluster core,
    inspect its fringe).

    Exactness: coordinates scale to 1e6 integers; the squared distance to
    the centroid is cross-multiplied into the EXACT integer
    D = Σ_d (n·s6_d − S_d)² = n²·‖x − c‖²·10¹² (DECIMAL(38,0)/HUGEINT —
    headroom bound: safe to ~6·10¹¹ vectors per label, noted in the
    PLANS.md audit), so the per-label ranking can never flip on a float
    ulp; only the reported dist6 = √D/(n·10⁶) is a rounded double.

    Scale shape: posexplode ships (label, dim, int) triples into a
    64·#labels-key centroid aggregate (map-side combined); the distance
    join re-uses the same (label, dim) partitioning; the per-vector
    reduce is a second map-side-combined aggregate; the final per-label
    top-{_OUTLIER_TOP} is a rank window over a frame ALREADY reduced to
    one row per vector (the quota-sample shape)."""
    px = (
        load_table(spark, sf_dir, "embeddings")
        .select(
            "vec_id",
            "label",
            F.posexplode(to_double_vec(F.col("embedding"))).alias("dim", "x"),
        )
        .select(
            "vec_id",
            "label",
            "dim",
            F.round(F.col("x") * _DM_SCALE, 0).cast("long").alias("s6"),
        )
    )
    cent = px.groupBy("label", "dim").agg(
        F.sum(F.col("s6").cast("decimal(38,0)")).alias("s"),
        F.count(F.lit(1)).alias("n"),
    )
    term = (F.col("n").cast("decimal(38,0)") * F.col("s6") - F.col("s"))
    dist = (
        px.join(cent, ["label", "dim"])
        .groupBy("vec_id", "label")
        .agg(
            F.sum((term * term).cast("decimal(38,0)")).alias("dd"),
            F.first("n").alias("n"),
        )
    )
    w = Window.partitionBy("label").orderBy(F.desc("dd"), F.asc("vec_id"))
    return (
        dist.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _OUTLIER_TOP)
        .select(
            "label",
            "vec_id",
            F.col("rnk").cast("long").alias("rnk"),
            F.round(
                F.sqrt(F.col("dd").cast("double"))
                / (F.col("n") * float(_DM_SCALE)),
                6,
            ).alias("dist6"),
        )
    )


# ---------------------------------------------------------------------------
# Centroid silhouette audit (r15): cluster-quality score per label.
# ---------------------------------------------------------------------------
@register(
    "q_cluster_silhouette",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, label,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings
    ), dims AS (
      SELECT label, i AS dim, SUM(CAST(e[i] AS DECIMAL(28,12))) AS s,
             COUNT(*) AS n
      FROM v, UNNEST(generate_series(1, {_DIM})) AS t(i)
      GROUP BY label, i
    ), cent AS (
      SELECT label,
             list(CAST(s AS DOUBLE) / n ORDER BY dim) AS c
      FROM dims GROUP BY label
    ), pair AS (
      SELECT v.vec_id, v.label AS vlabel, cent.label AS clabel,
             sqrt(list_reduce(
               list_transform(generate_series(1, {_DIM}),
                 i -> (v.e[i] - cent.c[i]) * (v.e[i] - cent.c[i])),
               (a, b) -> a + b)) AS dist
      FROM v, cent
    ), ab AS (
      SELECT vec_id, vlabel,
             MIN(CASE WHEN vlabel = clabel THEN dist END) AS a,
             MIN(CASE WHEN vlabel != clabel THEN dist END) AS b
      FROM pair GROUP BY vec_id, vlabel
    ), s AS (
      SELECT vlabel AS label,
             CAST(ROUND((b - a) / GREATEST(a, b) * 1000000, 0) AS BIGINT)
               AS s_u
      FROM ab
    )
    SELECT label,
           CAST(COUNT(*) AS BIGINT) AS n_vectors,
           ROUND(SUM(s_u) * 1.0 / COUNT(*) / 1000000, 6) AS mean_silhouette,
           CAST(SUM(CASE WHEN s_u < 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_negative
    FROM s
    GROUP BY label
    ORDER BY label
    """,
)
def q_cluster_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Centroid-based (simplified) silhouette per label — the standard
    cluster-quality audit (Rousseeuw 1987, public method) in its
    medoid-free form: a(i) = distance to the OWN label's centroid,
    b(i) = distance to the nearest OTHER centroid, s = (b−a)/max(a,b).
    Vectors with s < 0 sit closer to a foreign centroid than their own —
    the would-be-reassigned count a k-means iteration or a label-noise
    triage reads directly.

    Exactness: centroids are DECIMAL sums divided once (shuffle-order
    proof); distances are sequential index-order left-folds in BOTH
    engines (identical double results); per-vector s quantizes to exact
    integer MICRO-UNITS before the mean so the per-label average never
    depends on summation order.

    Scale shape: the centroid build posexplodes to (label, dim) — a 64×
    row multiplication of SKINNY rows that map-side combines into
    #labels×64 partials; the 10-row centroid frame broadcasts back; the
    per-vector a/b pass is one broadcast nested loop over 10 centroids
    (embarrassingly parallel, no shuffle of vectors) followed by one
    per-label aggregate.  At 10⁹ vectors the only exchange carrying
    vector-count rows is the final ≤#labels reduce."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", to_double_vec(F.col("embedding")).alias("e")
    )
    dims = (
        emb.select(
            "label", F.posexplode(F.col("e")).alias("dim0", "val")
        )
        .groupBy("label", "dim0")
        .agg(
            F.sum(F.col("val").cast("decimal(28,12)")).alias("s"),
            F.count("*").alias("n"),
        )
    )
    cent = dims.groupBy("label").agg(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("dim0"),
                        (F.col("s").cast("double") / F.col("n")).alias("cv"),
                    )
                )
            ),
            lambda st: st["cv"],
        ).alias("c")
    )
    pair = emb.crossJoin(
        F.broadcast(cent.select(F.col("label").alias("clabel"), "c"))
    ).select(
        "vec_id",
        F.col("label").alias("vlabel"),
        "clabel",
        F.sqrt(
            F.aggregate(
                F.zip_with(
                    F.col("e"), F.col("c"), lambda x, y: (x - y) * (x - y)
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        ).alias("dist"),
    )
    ab = pair.groupBy("vec_id", "vlabel").agg(
        F.min(
            F.when(F.col("vlabel") == F.col("clabel"), F.col("dist"))
        ).alias("a"),
        F.min(
            F.when(F.col("vlabel") != F.col("clabel"), F.col("dist"))
        ).alias("b"),
    )
    s = ab.select(
        F.col("vlabel").alias("label"),
        F.round(
            (F.col("b") - F.col("a"))
            / F.greatest(F.col("a"), F.col("b"))
            * 1000000,
            0,
        )
        .cast("long")
        .alias("s_u"),
    )
    return (
        s.groupBy("label")
        .agg(
            F.count("*").cast("long").alias("n_vectors"),
            F.round(F.sum("s_u") * 1.0 / F.count("*") / 1000000, 6).alias(
                "mean_silhouette"
            ),
            F.sum(F.when(F.col("s_u") < 0, 1).otherwise(0))
            .cast("long")
            .alias("n_negative"),
        )
        .orderBy("label")
    )


# ---------------------------------------------------------------------------
# Referential-integrity + payload-sanity audit across modalities (r15).
# ---------------------------------------------------------------------------
@register(
    "q_referential_integrity_audit",
    oracle=f"""
    WITH d AS (SELECT doc_id FROM documents),
    v AS (
      SELECT vec_id,
             len(embedding) AS dim,
             len(list_filter(embedding, x -> isnan(CAST(x AS DOUBLE))))
               AS n_nan,
             list_reduce(list_transform(embedding,
               x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
               (a, b) -> a + b) AS sq
      FROM embeddings
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM d) AS n_docs,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM v) AS n_vecs,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM d
             WHERE doc_id NOT IN (SELECT vec_id FROM v))
             AS docs_without_vec,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM v
             WHERE vec_id NOT IN (SELECT doc_id FROM d))
             AS vecs_without_doc,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM v WHERE dim != {_DIM})
             AS dim_violations,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM v WHERE n_nan > 0)
             AS vecs_with_nan,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM v WHERE sq = 0.0)
             AS zero_norm_vecs
    """,
)
def q_referential_integrity_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Cross-modality referential-integrity audit — the pre-flight check a
    multimodal training pipeline runs before joining documents to their
    embeddings: orphan keys on BOTH sides (docs missing a vector, vectors
    missing a doc), plus payload sanity on the vector side (dimension
    violations, NaN contamination, zero-norm vectors that break cosine).

    Exactness: pure integer counting; the zero-norm test uses the exact
    sequential squared-norm fold (identical in both engines).

    Scale shape: two LEFT ANTI equi-joins on the id (shuffle-keyed, the
    exact/incremental-dedup shape), one embeddings scan computing the
    array predicates map-side, and constant-size 1-row aggregates unioned
    by a broadcast-only chain — no window, no collect, no skew exposure
    (ids are unique on each side)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    emb = load_table(spark, sf_dir, "embeddings")
    v = emb.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.size(
            F.filter(
                to_double_vec(F.col("embedding")), lambda x: F.isnan(x)
            )
        ).alias("n_nan"),
        dot(
            to_double_vec(F.col("embedding")),
            to_double_vec(F.col("embedding")),
        ).alias("sq"),
    )
    n_docs = docs.agg(F.count("*").cast("long").alias("n_docs"))
    n_vecs = v.agg(F.count("*").cast("long").alias("n_vecs"))
    docs_wo = docs.join(
        v.select(F.col("vec_id").alias("doc_id")), "doc_id", "left_anti"
    ).agg(F.count("*").cast("long").alias("docs_without_vec"))
    vecs_wo = v.select("vec_id").join(
        docs.select(F.col("doc_id").alias("vec_id")), "vec_id", "left_anti"
    ).agg(F.count("*").cast("long").alias("vecs_without_doc"))
    sanity = v.agg(
        F.sum(F.when(F.col("dim") != _DIM, 1).otherwise(0))
        .cast("long")
        .alias("dim_violations"),
        F.sum(F.when(F.col("n_nan") > 0, 1).otherwise(0))
        .cast("long")
        .alias("vecs_with_nan"),
        F.sum(F.when(F.col("sq") == 0.0, 1).otherwise(0))
        .cast("long")
        .alias("zero_norm_vecs"),
    )
    out = n_docs
    for frame in (n_vecs, docs_wo, vecs_wo, sanity):
        out = out.crossJoin(F.broadcast(frame))
    return out


# ---------------------------------------------------------------------------
# r16: incremental IVF index maintenance (VERDICT r15 next-round #6) — the
# delta-ingest loop that keeps q_semdedup_ivf / q_embedding_ann_ivf_checked
# serving under continuous ingest.
# ---------------------------------------------------------------------------
_IVF_MAINT_BATCH_MOD = 10  # vec_id % 10 == 7 plays the incoming batch


def _ivf_maintenance_oracle() -> str:
    ids = ", ".join(str(i) for i in _IVF_CHECK_CENTROID_IDS)
    dot_ec = (
        "list_reduce(list_transform(generate_series(1, {dim}),"
        " i -> v.e[i] * c.ce[i]), (x, y) -> x + y)"
    ).format(dim=_DIM)
    return f"""
    WITH v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings
    ), n AS (
      SELECT vec_id, e,
             sqrt(list_reduce(list_transform(e, x -> x * x), (a, b) -> a + b))
               AS nrm
      FROM v
    ), cent AS (
      SELECT vec_id AS cell, e AS ce, nrm AS cn
      FROM n WHERE vec_id IN ({ids})
    ), assigned AS (
      SELECT vec_id, cell,
             CASE WHEN vec_id % {_IVF_MAINT_BATCH_MOD} = 7 THEN 1 ELSE 0 END
               AS is_batch
      FROM (
        SELECT v.vec_id, c.cell,
               ROW_NUMBER() OVER (
                 PARTITION BY v.vec_id
                 ORDER BY {dot_ec} / (v.nrm * c.cn) DESC, c.cell
               ) AS rk
        FROM n v CROSS JOIN cent c)
      WHERE rk = 1
    ), per_cell AS (
      SELECT cell,
             CAST(SUM(1 - is_batch) AS BIGINT) AS n_base,
             CAST(SUM(is_batch) AS BIGINT) AS n_batch,
             CAST(COUNT(*) AS BIGINT) AS n_after
      FROM assigned GROUP BY cell
    ), tot AS (
      SELECT CAST(SUM(n_after) AS BIGINT) AS total_after,
             CAST(COUNT(*) AS BIGINT) AS n_cells
      FROM per_cell
    )
    SELECT cell, n_base, n_batch, n_after,
           CAST(n_batch * 10000 // GREATEST(n_base, 1) AS BIGINT)
             AS ingest_drift_bp,
           n_after * n_cells > 2 * total_after AS split_needed
    FROM per_cell, tot
    ORDER BY cell
    """


@register("q_ivf_index_maintenance", oracle=_ivf_maintenance_oracle())
def q_ivf_index_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental IVF maintenance report: an incoming batch (vec_id % 10
    == 7 plays the delta) is assigned to the EXISTING pinned coarse cells
    (same 8 centroids as q_embedding_ann_ivf_checked — no re-training),
    and each cell reports base occupancy, batch arrivals, post-ingest
    occupancy drift in exact basis points, and a split flag for cells past
    2x the mean occupancy — the production loop that tells an IVF index
    when a cell needs splitting (or the quantizer re-training) under
    continuous ingest, without touching base-corpus assignments.

    Scale shape: the batch join is broadcast(8 centroids) x batch — in
    production only the DELTA is assigned (base counts come from index
    metadata); this checkable twin recomputes base occupancy through the
    identical argmax so the driver can hash the whole report.  One 8-key
    hash aggregate, one broadcast 1-row total; the split predicate is
    division-cleared integer arithmetic (n_after * n_cells > 2 * total).
    """
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", to_double_vec(F.col("embedding")).alias("e")
    )
    emb = emb.withColumn("nrm", l2_norm(F.col("e")))
    cent = emb.filter(
        F.col("vec_id").isin(list(_IVF_CHECK_CENTROID_IDS))
    ).select(
        F.col("vec_id").alias("cell"),
        F.col("e").alias("ce"),
        F.col("nrm").alias("cn"),
    )
    cell_sim = cosine(F.col("e"), F.col("ce"), F.col("nrm"), F.col("cn"))
    assigned = (
        emb.join(F.broadcast(cent))
        .select("vec_id", "cell", cell_sim.alias("cs"))
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("vec_id").orderBy(F.desc("cs"), F.asc("cell"))
            ),
        )
        .filter(F.col("rk") == 1)
        .select(
            "vec_id",
            "cell",
            F.when(F.col("vec_id") % _IVF_MAINT_BATCH_MOD == 7, 1)
            .otherwise(0)
            .alias("is_batch"),
        )
    )
    per_cell = assigned.groupBy("cell").agg(
        F.sum(1 - F.col("is_batch")).alias("n_base"),
        F.sum("is_batch").alias("n_batch"),
        F.count("*").alias("n_after"),
    )
    tot = per_cell.agg(
        F.sum("n_after").alias("total_after"),
        F.count("*").alias("n_cells"),
    )
    return (
        per_cell.crossJoin(F.broadcast(tot))
        .select(
            "cell",
            "n_base",
            "n_batch",
            "n_after",
            F.expr("n_batch * 10000 div greatest(n_base, 1)").alias(
                "ingest_drift_bp"
            ),
            (
                F.col("n_after") * F.col("n_cells")
                > 2 * F.col("total_after")
            ).alias("split_needed"),
        )
        .orderBy("cell")
    )


# ---------------------------------------------------------------------------
# r16: leave-one-out 1-NN label accuracy — the embedding-quality eval that
# tells you whether the space separates labels at all.
# ---------------------------------------------------------------------------
def _knn_label_oracle() -> str:
    d = (
        "list_reduce(list_transform(generate_series(1, {dim}),"
        " i -> q.e[i] * c.e[i]), (x, y) -> x + y)"
    ).format(dim=_DIM)
    return f"""
    WITH v AS (
      SELECT vec_id, label,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings
    ), n AS (
      SELECT vec_id, label, e,
             sqrt(list_reduce(list_transform(e, x -> x * x), (a, b) -> a + b))
               AS nrm
      FROM v
    ), nn AS (
      SELECT query_id, q_label, n_label
      FROM (
        SELECT q.vec_id AS query_id, q.label AS q_label, c.label AS n_label,
               ROW_NUMBER() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY ROUND({d} / (q.nrm * c.nrm), 5) DESC, c.vec_id
               ) AS rn
        FROM n q JOIN n c ON c.vec_id <> q.vec_id
        WHERE q.vec_id < {_N_QUERIES})
      WHERE rn = 1
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_queries,
           CAST(SUM(CASE WHEN q_label = n_label THEN 1 ELSE 0 END) AS BIGINT)
             AS n_correct,
           CAST(SUM(CASE WHEN q_label = n_label THEN 1 ELSE 0 END) * 10000
                // COUNT(*) AS BIGINT) AS accuracy_bp
    FROM nn
    """


@register("q_knn_label_accuracy", oracle=_knn_label_oracle())
def q_knn_label_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out 1-NN classification accuracy of the label column in
    embedding space — the standard embedding-quality eval (does cosine
    geometry recover the labels?) run before trusting the space for
    SemDeDup / clustering / hard-negative mining.  Each probe vector's
    nearest OTHER vector votes with its label; accuracy is exact integer
    basis points.

    Exactness: the same rounded-cosine + vec_id tie-break as
    q_embedding_topk_cosine (the left-fold dot is bit-identical in both
    engines), so the chosen neighbor matches before any rounding matters.

    Scale shape: brute-force exact 1-NN for the 5-probe panel —
    a broadcast of the probes against one corpus scan (the measured
    ground-truth tier; the production path at 10⁹ vectors is the IVF
    probe pipeline, q_embedding_ann_ivf_checked, with this query as its
    recall referee's accuracy twin)."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", to_double_vec(F.col("embedding")).alias("e")
    )
    emb = emb.withColumn("nrm", l2_norm(F.col("e")))
    q = emb.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("q_label"),
        F.col("e").alias("qe"),
        F.col("nrm").alias("qn"),
    )
    sim = cosine(F.col("qe"), F.col("e"), F.col("qn"), F.col("nrm"))
    scored = emb.join(
        F.broadcast(q), F.col("vec_id") != F.col("query_id")
    ).select(
        "query_id",
        "q_label",
        F.col("label").alias("n_label"),
        F.round(sim, 5).alias("cs"),
        "vec_id",
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cs"), F.asc("vec_id"))
    nn = scored.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") == 1
    )
    correct = F.sum(
        F.when(F.col("q_label") == F.col("n_label"), 1).otherwise(0)
    )
    return nn.agg(
        F.count("*").alias("n_queries"),
        correct.alias("n_correct"),
    ).select(
        "n_queries",
        "n_correct",
        F.expr("n_correct * 10000 div n_queries").alias("accuracy_bp"),
    )
