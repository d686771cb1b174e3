"""Corpus-curation operators for training-data pipelines (SURVEY §2.11
extension surface, beyond the E1-E4 baseline): relevance scoring (BM25 /
TF-IDF), deterministic train/test splitting, per-source quota sampling, and
connected-component dedup groups.

All are [extension] operators (no reference citation by definition — the
reference delegates its query surface to Postgres, ref README.md:106-124);
each is hash-checked against a DuckDB oracle, including the *iterative*
connected-components operator (recursive CTE oracle).

Scale notes are per-operator; the common theme is: score with array
expressions instead of explode where the term set is fixed (no shuffle),
explode into an inverted index where it is not (shuffle carries (token,
doc_id) longs), and keep every global constant (N, avgdl) a broadcast.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load_table
from .util import fan_out, materialize_releasing
from .dedup import _JACCARD_DF_CAP, hashed_shingle_docs, ngram_jaccard_pairs

# Fixed keyword-query for the BM25 entry (deterministic; the corpus draws
# from a small synthetic vocabulary, see TESTDATA.md).
_BM25_TERMS = ("spark", "join", "window")
_BM25_K1 = 1.2
_BM25_B = 0.75
_TOP_K = 10


def tokens(text: Column) -> Column:
    """Whitespace tokens, lowercased — the shared tokenizer of text.py
    (token_count) and the DuckDB oracles (string_split_regex)."""
    return F.split(F.lower(F.trim(text)), r"\s+")


def _bm25_oracle() -> str:
    """The oracle is generated from the same term list as the Spark side so
    the two can never drift.  The per-term score sum is written as an
    explicit fixed-order expression (term0 + term1 + term2), NOT SUM() over
    rows — double addition is not associative and a GROUP BY's fold order is
    engine-dependent."""
    tf_cols = ",\n             ".join(
        f"len(list_filter(toks, t -> t = '{t}')) AS tf_{i}"
        for i, t in enumerate(_BM25_TERMS)
    )
    df_cols = ",\n             ".join(
        f"SUM(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS df_{i}"
        for i in range(len(_BM25_TERMS))
    )
    norm = f"({_BM25_K1} * (1 - {_BM25_B} + {_BM25_B} * dl / avgdl))"
    score = " + ".join(
        f"(ln(1 + (n - df_{i} + 0.5) / (df_{i} + 0.5))"
        f" * tf_{i} * ({_BM25_K1} + 1) / (tf_{i} + {norm}))"
        for i in range(len(_BM25_TERMS))
    )
    return f"""
    WITH d AS (
      SELECT doc_id, string_split_regex(lower(trim(text, ' ')), '\\s+') AS toks
      FROM documents
    ), t AS (
      SELECT doc_id, len(toks) AS dl,
             {tf_cols}
      FROM d
    ), s AS (
      SELECT COUNT(*) AS n, AVG(len(toks)) AS avgdl FROM d
    ), g AS (
      SELECT {df_cols} FROM t
    )
    SELECT doc_id, ROUND({score}, 4) AS bm25
    FROM t CROSS JOIN s CROSS JOIN g
    WHERE {" + ".join(f"tf_{i}" for i in range(len(_BM25_TERMS)))} > 0
    ORDER BY bm25 DESC, doc_id
    LIMIT {_TOP_K}
    """


@register("q_bm25_keyword_search", oracle=_bm25_oracle())
def q_bm25_keyword_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 keyword search (k1=1.2, b=0.75) for a fixed term set, top-10.

    Scale shape: the term set is FIXED, so term frequencies are per-row
    array expressions (``size(filter(toks, ...))``) — no explode, no
    inverted-index shuffle, the whole score is one codegen projection.  The
    corpus constants (N, avgdl, per-term document frequencies) reduce to a
    single 1-row aggregate that is broadcast back; top-k is a TakeOrdered,
    not a global sort.  Per-term scores are added in fixed textual order on
    both engines because double addition is order-sensitive."""
    def _eq(term: str):
        # arity matters: a (x, term=...) default-arg lambda would be read by
        # PySpark's HOF inference as the 2-arg (element, index) form
        return lambda x: x == F.lit(term)

    docs = load_table(spark, sf_dir, "documents")
    # Lazy checkpoint (r18, guide §1.2): the per-doc tf frame feeds BOTH
    # the corpus-stats aggregate and the scoring pass; without the
    # boundary the tokenizer (split + lower + one array filter per term)
    # runs twice over every document.  The frame is 5 ints per doc —
    # materialization is far cheaper than a second tokenize pass.
    t = docs.select(
        "doc_id",
        F.size(tokens(F.col("text"))).alias("dl"),
        *[
            F.size(F.filter(tokens(F.col("text")), _eq(term))).alias(f"tf_{i}")
            for i, term in enumerate(_BM25_TERMS)
        ],
    ).localCheckpoint(eager=False)
    stats = t.agg(
        F.count("*").alias("n"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum(F.when(F.col(f"tf_{i}") > 0, 1).otherwise(0)).alias(f"df_{i}")
            for i in range(len(_BM25_TERMS))
        ],
    )
    norm = _BM25_K1 * (1 - _BM25_B) + F.lit(_BM25_B * _BM25_K1) * F.col(
        "dl"
    ) / F.col("avgdl")
    score = None
    for i in range(len(_BM25_TERMS)):
        idf = F.log(
            1 + (F.col("n") - F.col(f"df_{i}") + 0.5) / (F.col(f"df_{i}") + 0.5)
        )
        part = idf * F.col(f"tf_{i}") * (_BM25_K1 + 1) / (F.col(f"tf_{i}") + norm)
        score = part if score is None else score + part
    matched = sum(F.col(f"tf_{i}") for i in range(len(_BM25_TERMS)))
    return (
        t.crossJoin(F.broadcast(stats))
        .filter(matched > 0)
        .select("doc_id", F.round(score, 4).alias("bm25"))
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(_TOP_K)
    )


# -- retrieval quality eval (NDCG@k) ----------------------------------------
# Graded relevance for the eval: total query-term mass in the document
# (grade 3 at >= _NDCG_G3_MASS occurrences, 2 at >= _NDCG_G2_MASS, else 1 for
# any match) — deterministic and content-derived, but NOT what BM25's
# length-normalized score orders by, so the metric discriminates (measured
# NDCG ~= 0.6 at sf0.01, not a vacuous 1.0) while the ideal ranking stays
# computable in closed form from three corpus counts.
_NDCG_G3_MASS = 12
_NDCG_G2_MASS = 6


def _ndcg_oracle() -> str:
    tf_cols = ",\n             ".join(
        f"len(list_filter(toks, t -> t = '{t}')) AS tf_{i}"
        for i, t in enumerate(_BM25_TERMS)
    )
    df_cols = ", ".join(
        f"SUM(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS df_{i}"
        for i in range(len(_BM25_TERMS))
    )
    norm = f"({_BM25_K1} * (1 - {_BM25_B} + {_BM25_B} * dl / avgdl))"
    score = " + ".join(
        f"(ln(1 + (n - df_{i} + 0.5) / (df_{i} + 0.5))"
        f" * tf_{i} * ({_BM25_K1} + 1) / (tf_{i} + {norm}))"
        for i in range(len(_BM25_TERMS))
    )
    mass = " + ".join(f"tf_{i}" for i in range(len(_BM25_TERMS)))
    grade = (
        f"CASE WHEN {mass} >= {_NDCG_G3_MASS} THEN 3 "
        f"WHEN {mass} >= {_NDCG_G2_MASS} THEN 2 ELSE 1 END"
    )
    gain = "CASE gd WHEN 3 THEN 7 WHEN 2 THEN 3 WHEN 1 THEN 1 ELSE 0 END"
    return f"""
    WITH d AS (
      SELECT doc_id, string_split_regex(lower(trim(text, ' ')), '\\s+') AS toks
      FROM documents
    ), t AS (
      SELECT doc_id, len(toks) AS dl,
             {tf_cols}
      FROM d
    ), s AS (
      SELECT COUNT(*) AS n, AVG(len(toks)) AS avgdl FROM d
    ), g AS (
      SELECT {df_cols} FROM t
    ), graded AS (
      SELECT doc_id, ROUND({score}, 4) AS bm25, {grade} AS gd
      FROM t CROSS JOIN s CROSS JOIN g
      WHERE {" + ".join(f"tf_{i}" for i in range(len(_BM25_TERMS)))} > 0
    ), counts AS (
      SELECT CAST(SUM(CASE WHEN gd = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n3,
             CAST(SUM(CASE WHEN gd = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
             CAST(SUM(CASE WHEN gd = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1
      FROM graded
    ), ranked AS (
      SELECT gd, ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS r
      FROM graded ORDER BY bm25 DESC, doc_id LIMIT {_TOP_K}
    ), folded AS (
      SELECT list_reduce(
               list(ROUND(({gain}) / log2(r + 1), 6) ORDER BY r),
               (a, b) -> a + b) AS dcg,
             CAST(SUM(CASE WHEN gd >= 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_rel_at_k,
             COUNT(*) AS n_pool
      FROM ranked
    ), ideal AS (
      SELECT list_reduce(
               list_transform(generate_series(1, {_TOP_K}), r ->
                 ROUND((CASE WHEN r <= n3 THEN 7
                             WHEN r <= n3 + n2 THEN 3
                             WHEN r <= n3 + n2 + n1 THEN 1
                             ELSE 0 END) / log2(r + 1), 6)),
               (a, b) -> a + b) AS idcg
      FROM counts
    )
    SELECT CAST({_TOP_K} AS BIGINT) AS k, n_pool, n_rel_at_k,
           ROUND(dcg, 5) AS dcg,
           ROUND(idcg, 5) AS idcg,
           ROUND(dcg / idcg, 5) AS ndcg
    FROM folded, ideal
    """


@register("q_retrieval_ndcg_eval", oracle=_ndcg_oracle())
def q_retrieval_ndcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@10 of the BM25 arm against graded term-coverage relevance —
    the retrieval-quality eval a RAG serving tier runs before swapping
    rankers (Järvelin & Kekäläinen 2002 discounted cumulative gain; public
    method).  Relevance grade = total query-term mass thresholds (gain
    2^g - 1; see _NDCG_G3_MASS) — deliberately NOT the quantity BM25's
    length-normalized score orders by, so the metric discriminates
    (~0.60 at sf0.01, never a vacuous 1.0) — and the IDEAL ranking is
    computable in closed form from three corpus counts (n3/n2/n1 docs per
    grade), no oracle ranking to materialize.

    Determinism recipe: each rank's gain/log2(rank+1) term is rounded to
    6 BEFORE summation (absorbing any last-ulp log2 divergence between
    engines), and both DCG and IDCG sum via a sequential left fold over a
    rank-ordered list — never a GROUP BY double sum whose fold order is
    engine-dependent.

    Scale shape: inherits BM25's — fixed term set means term frequencies
    are per-row projections (no inverted-index shuffle), corpus constants
    are one broadcast 1-row aggregate, the pool is a TakeOrdered 10, and
    everything after it folds over ≤10 rows."""
    docs = load_table(spark, sf_dir, "documents")
    # one corpus scan: t feeds stats, the graded pool, AND the grade
    # histogram — persist it so the three aggregates share the tokenize
    t = docs.select(
        "doc_id",
        F.size(tokens(F.col("text"))).alias("dl"),
        *[
            F.size(
                F.filter(tokens(F.col("text")), (lambda tm: lambda x: x == F.lit(tm))(term))
            ).alias(f"tf_{i}")
            for i, term in enumerate(_BM25_TERMS)
        ],
    )
    stats = t.agg(
        F.count("*").alias("n"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum(F.when(F.col(f"tf_{i}") > 0, 1).otherwise(0)).alias(f"df_{i}")
            for i in range(len(_BM25_TERMS))
        ],
    )
    norm = _BM25_K1 * (1 - _BM25_B) + F.lit(_BM25_B * _BM25_K1) * F.col(
        "dl"
    ) / F.col("avgdl")
    score = None
    for i in range(len(_BM25_TERMS)):
        idf = F.log(
            1 + (F.col("n") - F.col(f"df_{i}") + 0.5) / (F.col(f"df_{i}") + 0.5)
        )
        part = idf * F.col(f"tf_{i}") * (_BM25_K1 + 1) / (F.col(f"tf_{i}") + norm)
        score = part if score is None else score + part
    # one expression serves both the matched>0 pool filter and the grade
    # thresholds — a single definition can't drift into two semantics
    mass = sum(F.col(f"tf_{i}") for i in range(len(_BM25_TERMS)))
    grade = (
        F.when(mass >= _NDCG_G3_MASS, 3)
        .when(mass >= _NDCG_G2_MASS, 2)
        .otherwise(1)
    )
    t = t.persist()
    graded = (
        t.crossJoin(F.broadcast(stats))
        .filter(mass > 0)
        .select(
            "doc_id", F.round(score, 4).alias("bm25"), grade.alias("gd")
        )
    )
    counts = graded.agg(
        F.sum(F.when(F.col("gd") == 3, 1).otherwise(0)).cast("long").alias("n3"),
        F.sum(F.when(F.col("gd") == 2, 1).otherwise(0)).cast("long").alias("n2"),
        F.sum(F.when(F.col("gd") == 1, 1).otherwise(0)).cast("long").alias("n1"),
    )
    pool = graded.orderBy(F.desc("bm25"), F.asc("doc_id")).limit(_TOP_K)
    ranked = pool.withColumn(
        "r",
        F.row_number().over(Window.orderBy(F.desc("bm25"), F.asc("doc_id"))),
    )
    gain = (
        F.when(F.col("gd") == 3, 7)
        .when(F.col("gd") == 2, 3)
        .when(F.col("gd") == 1, 1)
        .otherwise(0)
    )
    folded = ranked.agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col("r"),
                    F.round(gain / F.log2(F.col("r") + 1), 6).alias("term"),
                )
            )
        ).alias("lst"),
        F.sum(F.when(F.col("gd") >= 2, 1).otherwise(0)).cast("long").alias(
            "n_rel_at_k"
        ),
        F.count(F.lit(1)).alias("n_pool"),
    ).select(
        "n_pool",
        "n_rel_at_k",
        F.aggregate(
            F.transform(F.col("lst"), lambda x: x["term"]),
            F.lit(0.0),
            lambda a, x: a + x,
        ).alias("dcg"),
    )
    idcg = counts.select(
        F.aggregate(
            F.transform(
                F.sequence(F.lit(1), F.lit(_TOP_K)),
                lambda i: i,
            ),
            F.lit(0.0),
            lambda a, i: a
            + F.round(
                (
                    F.when(i <= F.col("n3"), 7)
                    .when(i <= F.col("n3") + F.col("n2"), 3)
                    .when(i <= F.col("n3") + F.col("n2") + F.col("n1"), 1)
                    .otherwise(0)
                )
                / F.log2(i.cast("double") + 1),
                6,
            ),
        ).alias("idcg")
    )
    out = folded.crossJoin(F.broadcast(idcg)).select(
        F.lit(_TOP_K).cast("long").alias("k"),
        "n_pool",
        "n_rel_at_k",
        F.round(F.col("dcg"), 5).alias("dcg"),
        F.round(F.col("idcg"), 5).alias("idcg"),
        F.round(F.col("dcg") / F.col("idcg"), 5).alias("ndcg"),
    )
    return materialize_releasing(out, t)


def _mrr_oracle() -> str:
    tf_cols = ",\n             ".join(
        f"len(list_filter(toks, t -> t = '{t}')) AS tf_{i}"
        for i, t in enumerate(_BM25_TERMS)
    )
    df_cols = ", ".join(
        f"SUM(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS df_{i}"
        for i in range(len(_BM25_TERMS))
    )
    norm = f"({_BM25_K1} * (1 - {_BM25_B} + {_BM25_B} * dl / avgdl))"
    score = " + ".join(
        f"(ln(1 + (n - df_{i} + 0.5) / (df_{i} + 0.5))"
        f" * tf_{i} * ({_BM25_K1} + 1) / (tf_{i} + {norm}))"
        for i in range(len(_BM25_TERMS))
    )
    mass = " + ".join(f"tf_{i}" for i in range(len(_BM25_TERMS)))
    grade = (
        f"CASE WHEN {mass} >= {_NDCG_G3_MASS} THEN 3 "
        f"WHEN {mass} >= {_NDCG_G2_MASS} THEN 2 ELSE 1 END"
    )
    return f"""
    WITH d AS (
      SELECT doc_id, string_split_regex(lower(trim(text, ' ')), '\\s+') AS toks
      FROM documents
    ), t AS (
      SELECT doc_id, len(toks) AS dl,
             {tf_cols}
      FROM d
    ), s AS (
      SELECT COUNT(*) AS n, AVG(len(toks)) AS avgdl FROM d
    ), g AS (
      SELECT {df_cols} FROM t
    ), graded AS (
      SELECT doc_id, ROUND({score}, 4) AS bm25, {grade} AS gd
      FROM t CROSS JOIN s CROSS JOIN g
      WHERE {mass} > 0
    ), totals AS (
      SELECT CAST(SUM(CASE WHEN gd >= 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS total_rel
      FROM graded
    ), ranked AS (
      SELECT gd, ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS r
      FROM graded ORDER BY bm25 DESC, doc_id LIMIT {_TOP_K}
    ), atk AS (
      SELECT COALESCE(CAST(MIN(CASE WHEN gd >= 2 THEN r END) AS BIGINT), 0)
               AS first_rel_rank,
             CAST(SUM(CASE WHEN gd >= 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_rel_at_k
      FROM ranked
    )
    SELECT CAST({_TOP_K} AS BIGINT) AS k,
           first_rel_rank,
           ROUND(CASE WHEN first_rel_rank > 0
                      THEN 1.0 / first_rel_rank ELSE 0.0 END, 6) AS mrr,
           n_rel_at_k,
           total_rel,
           ROUND(n_rel_at_k * 1.0 / total_rel, 6) AS recall_at_k,
           ROUND(n_rel_at_k * 1.0 / {_TOP_K}, 6) AS precision_at_k
    FROM atk, totals
    """


@register("q_retrieval_mrr_eval", oracle=_mrr_oracle())
def q_retrieval_mrr_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MRR@10 / recall@10 / precision@10 of the BM25 arm against the same
    graded term-coverage relevance as the NDCG eval (grade ≥ 2 =
    relevant) — the second retrieval-eval lens a RAG tier reports
    (Voorhees 1999 reciprocal rank; public method).  MRR answers "how
    deep must a reader scroll for the first good hit", which NDCG's
    graded discounting deliberately blurs; recall@k vs the corpus-wide
    relevant count catches a ranker that wins the top slot but starves
    the pool.

    Determinism: rank ties break on doc_id before the LIMIT; counts are
    exact integers; the three ratios are single rounded IEEE divisions of
    integer counts — no float summation anywhere.

    Scale shape: identical to the NDCG eval — fixed query terms make tf a
    per-row projection (no inverted index), corpus constants one
    broadcast 1-row aggregate, the pool a TakeOrdered {_TOP_K}; the only
    full-corpus aggregate is the total-relevant count, map-side combined."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id",
        F.size(tokens(F.col("text"))).alias("dl"),
        *[
            F.size(
                F.filter(
                    tokens(F.col("text")),
                    (lambda tm: lambda x: x == F.lit(tm))(term),
                )
            ).alias(f"tf_{i}")
            for i, term in enumerate(_BM25_TERMS)
        ],
    )
    stats = t.agg(
        F.count("*").alias("n"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum(F.when(F.col(f"tf_{i}") > 0, 1).otherwise(0)).alias(f"df_{i}")
            for i in range(len(_BM25_TERMS))
        ],
    )
    norm = _BM25_K1 * (1 - _BM25_B) + F.lit(_BM25_B * _BM25_K1) * F.col(
        "dl"
    ) / F.col("avgdl")
    score = None
    for i in range(len(_BM25_TERMS)):
        idf = F.log(
            1 + (F.col("n") - F.col(f"df_{i}") + 0.5) / (F.col(f"df_{i}") + 0.5)
        )
        part = idf * F.col(f"tf_{i}") * (_BM25_K1 + 1) / (F.col(f"tf_{i}") + norm)
        score = part if score is None else score + part
    mass = sum(F.col(f"tf_{i}") for i in range(len(_BM25_TERMS)))
    grade = (
        F.when(mass >= _NDCG_G3_MASS, 3)
        .when(mass >= _NDCG_G2_MASS, 2)
        .otherwise(1)
    )
    t = t.persist()
    graded = (
        t.crossJoin(F.broadcast(stats))
        .filter(mass > 0)
        .select("doc_id", F.round(score, 4).alias("bm25"), grade.alias("gd"))
    )
    totals = graded.agg(
        F.sum(F.when(F.col("gd") >= 2, 1).otherwise(0)).cast("long").alias(
            "total_rel"
        )
    )
    ranked = (
        graded.orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(_TOP_K)
        .withColumn(
            "r",
            F.row_number().over(Window.orderBy(F.desc("bm25"), F.asc("doc_id"))),
        )
    )
    atk = ranked.agg(
        F.coalesce(
            F.min(F.when(F.col("gd") >= 2, F.col("r"))).cast("long"), F.lit(0)
        ).alias("first_rel_rank"),
        F.sum(F.when(F.col("gd") >= 2, 1).otherwise(0)).cast("long").alias(
            "n_rel_at_k"
        ),
    )
    out = atk.crossJoin(F.broadcast(totals)).select(
        F.lit(_TOP_K).cast("long").alias("k"),
        "first_rel_rank",
        F.round(
            F.when(
                F.col("first_rel_rank") > 0,
                F.lit(1.0) / F.col("first_rel_rank"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("mrr"),
        "n_rel_at_k",
        "total_rel",
        F.round(F.col("n_rel_at_k") * 1.0 / F.col("total_rel"), 6).alias(
            "recall_at_k"
        ),
        F.round(F.col("n_rel_at_k") * 1.0 / _TOP_K, 6).alias(
            "precision_at_k"
        ),
    )
    return materialize_releasing(out, t)


@register(
    "q_tfidf_top_terms",
    oracle=r"""
    WITH d AS (
      SELECT doc_id, lang,
             string_split_regex(lower(trim(text, ' ')), '\s+') AS toks
      FROM documents
    ), ex AS (
      SELECT doc_id, lang, unnest(toks) AS term FROM d
    ), n AS (SELECT COUNT(*) AS n FROM d),
    df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM ex GROUP BY term),
    tf AS (SELECT lang, term, COUNT(*) AS tf FROM ex GROUP BY lang, term)
    SELECT lang, term,
           ROUND(tf * ln(n.n * 1.0 / df.df), 4) AS tfidf
    FROM tf JOIN df USING (term) CROSS JOIN n
    QUALIFY ROW_NUMBER() OVER (PARTITION BY lang
                               ORDER BY ROUND(tf * ln(n.n * 1.0 / df.df), 4)
                                          DESC, term) <= 3
    """,
)
def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per language — the inverted-index shape (contrast
    with BM25's fixed-term projection): explode to (doc, lang, term)
    postings, aggregate tf and df, score, per-group top-k.

    Scale shape: the explode shuffles (term, doc_id) pairs once for the df
    aggregate and (lang, term) once for tf — both partial-aggregated
    map-side; the df table joins term-to-term (no broadcast needed, it is
    the same shuffle key).  tf is an exact integer and idf a single ln, so
    the score is deterministic (no float-sum ordering)."""
    docs = fan_out(load_table(spark, sf_dir, "documents"), "doc_id")
    ex = docs.select(
        "doc_id", "lang", F.explode(tokens(F.col("text"))).alias("term")
    ).persist()
    # corpus size as a broadcast 1-row frame, not an eager driver action
    n_df = docs.agg(F.count("*").alias("n"))
    df_t = ex.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    tf = ex.groupBy("lang", "term").agg(F.count("*").alias("tf"))
    scored = (
        tf.join(df_t, "term")
        .crossJoin(F.broadcast(n_df))
        .select(
            "lang",
            "term",
            F.round(
                F.col("tf") * F.log(F.col("n") * 1.0 / F.col("df")), 4
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("lang").orderBy(F.desc("tfidf"), F.asc("term"))
    out = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("lang", "term", "tfidf")
    )
    # materialize the tiny top-k result, then drop the postings cache (ex is
    # read by both the df and tf branches, but must not outlive the query)
    result = out.localCheckpoint(eager=True)
    ex.unpersist()
    return result


@register(
    "q_train_test_split",
    oracle="""
    SELECT CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cc'
                THEN 'train' ELSE 'test' END AS split,
           lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY 1, 2
    """,
)
def q_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~80/20 train/test assignment by content-free key hash
    (md5 of the doc id: stable across runs, engines, and partitionings —
    the property a reproducible pipeline needs; first hex byte < 0xcc keeps
    204/256 ≈ 79.7%).  Pure projection + aggregate: no shuffle beyond the
    final small groupBy."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = F.substring(
        F.md5(F.encode(F.col("doc_id").cast("string"), "UTF-8")), 1, 2
    )
    split = F.when(bucket < "cc", "train").otherwise("test")
    return (
        docs.withColumn("split", split)
        .groupBy("split", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


@register(
    "q_source_quota_sample",
    oracle="""
    SELECT source, doc_id, n_chars
    FROM (
      SELECT source, doc_id, n_chars,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY n_chars DESC, doc_id) AS rn
      FROM documents)
    WHERE rn <= 5
    """,
)
def q_source_quota_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quota sampling (corpus balancing): keep the 5 longest
    documents per source, deterministic tie-break on doc_id.  One shuffle on
    ``source``; at 100 TB a skewed source is bounded by the quota itself
    (rank ≤ 5 terminates the per-group scan under Spark's window TopK
    optimization)."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    return (
        docs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("source", "doc_id", "n_chars")
    )


# --- connected-component dedup groups --------------------------------------

# the corpus's real near-dup pairs sit at word-3-gram Jaccard ≈ 0.2-0.6
# (the q_ngram_jaccard_pairs threshold); the previous id-distance-1/2
# candidate probe at J ≥ 0.3 produced ZERO edges on the driver corpus —
# a vacuous 0 == 0 hash check that exercised nothing.
_CC_JACCARD = 0.2


def cc_candidate_edges(
    docs: DataFrame, caches: list[DataFrame] | None = None
) -> DataFrame:
    """Near-dup edges (a, b) from a (doc_id, sh: array<long>) frame.

    Edges are the corpus's actual exact-Jaccard near-dup pairs, generated
    by the same inverted-index postings EQUI-join as q_ngram_jaccard_pairs
    (shuffle on shingle, df-capped against boilerplate blowup) — no
    nested-loop / cartesian stage anywhere (pinned by test_plan_quality).
    This is the real pipeline shape: the pair stage of a dedup run IS the
    edge generator for its grouping stage."""
    return ngram_jaccard_pairs(
        docs, threshold=_CC_JACCARD, caches=caches
    ).select(F.col("doc_id_1").alias("a"), F.col("doc_id_2").alias("b"))


def _cc_edges_sql() -> str:
    # WITH RECURSIVE up front covers the `walk` CTE appended by the caller;
    # the e CTE mirrors the q_ngram_jaccard_pairs oracle (df cap included)
    return f"""
    WITH RECURSIVE d AS (
      SELECT doc_id, string_split_regex(lower(trim(text, ' ')), '\\s+') AS toks
      FROM documents
    ), s AS (
      SELECT doc_id,
             list_distinct(list_transform(generate_series(1, len(toks) - 2),
                            i -> array_to_string(toks[i:i+2], ' '))) AS sh
      FROM d WHERE len(toks) >= 3
    ), posts AS (
      SELECT doc_id, unnest(sh) AS sg FROM s
    ), kept AS (
      SELECT doc_id, sg
      FROM (SELECT doc_id, sg, COUNT(*) OVER (PARTITION BY sg) AS df FROM posts)
      WHERE df <= {_JACCARD_DF_CAP}
    ), ks AS (
      SELECT doc_id, list(sg) AS sh FROM kept GROUP BY doc_id
    ), e AS (
      SELECT a.doc_id AS a, b.doc_id AS b
      FROM ks a JOIN ks b ON a.doc_id < b.doc_id
      WHERE len(list_intersect(a.sh, b.sh)) * 1.0
            / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))
            >= {_CC_JACCARD}
    )
    """


def connected_components(edges: DataFrame, width: int = 8) -> DataFrame:
    """(a, b) undirected edge frame → (node, component) labels for every
    node with at least one edge; component = the minimum node id of its
    component.

    Large-star/small-star alternation (Kiveris et al. 2014, "Connected
    Components in MapReduce and Beyond"): each round is two groupBy-min +
    join passes over the *shrinking* edge set, converging in O(log² n)
    rounds worst-case and 2-4 alternations in practice on dedup graphs (vs
    O(diameter) hops for plain label propagation, which also re-carries the
    full edge list every round).  Property-tested against a union-find
    model on random graphs (test_connected_components.py).

    localCheckpoint (not persist) each round: the star construction
    references the previous edge set ~8 times, so a cached-but-lineage-
    carrying frame makes the LOGICAL plan grow 8x per round — Catalyst
    analysis time explodes exponentially even though the data stays tiny.
    Checkpointing truncates the plan to a constant-size LogicalRDD.

    ``width`` pins every per-round shuffle narrow with *per-operation*
    repartition on the grouping key (repartition(W, k) then groupBy(k)
    plans a single exchange) — NOT a session-global shuffle.partitions
    flip: queries planned concurrently on the same SparkSession must keep
    their own width.  A production run over billions of edges sizes it to
    |edges| / target-partition-rows instead."""
    W = width
    # canonical undirected representation: a = max endpoint, b = min
    cur = (
        edges.select(
            F.greatest("a", "b").alias("a"), F.least("a", "b").alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )

    def _min_nbr(e: DataFrame) -> DataFrame:
        # m(u) = min(Γ(u) ∪ {u})
        return (
            e.repartition(W, "a")
            .groupBy("a")
            .agg(F.min("b").alias("mn"))
            .select(F.col("a").alias("u"), F.least("a", "mn").alias("m"))
        )

    def _canon(e: DataFrame) -> DataFrame:
        return (
            e.filter(F.col("a") != F.col("b"))
            .repartition(W, "a", "b")
            .distinct()
        )

    # Convergence: the small-star output is compared to the previous round's
    # edge set by (count, XOR of xxhash64(a,b)) — one tiny action per round
    # (bit_xor, not sum: ANSI mode makes Σ of full-range hashes overflow);
    # the set is stable exactly at the star-graph fixpoint.
    prev_stats = None
    for _ in range(50):  # converges in a handful of alternations; 50 = bound
        # large-star: every neighbour v > u links to m(u); Γ is over the
        # undirected graph, so feed both directions of each edge
        both = cur.union(
            cur.select(F.col("b").alias("a"), F.col("a").alias("b"))
        )
        ml = _min_nbr(both)
        large = _canon(
            both.join(ml, both.a == ml.u)
            .filter(F.col("b") > F.col("a"))
            .select(F.col("b").alias("a"), F.col("m").alias("b"))
        )
        # small-star: key each edge by its LARGER endpoint (canonical form
        # already is), then every smaller neighbour — and u itself — links
        # to m(u)
        ms = _min_nbr(large)
        small = _canon(
            large.join(ms, large.a == ms.u)
            .select(F.col("b").alias("a"), F.col("m").alias("b"))
            .union(ms.select(F.col("u").alias("a"), F.col("m").alias("b")))
        ).localCheckpoint(eager=True)  # truncate lineage (see above)
        stats = small.agg(
            F.count("*").alias("n"), F.bit_xor(F.xxhash64("a", "b")).alias("h")
        ).first()
        cur = small
        if prev_stats == (stats["n"], stats["h"]):
            break
        prev_stats = (stats["n"], stats["h"])

    # At the fixpoint the edge set IS the component assignment: one
    # (member, root) edge per non-root member, root = component min.
    children = cur.select(
        F.col("a").alias("node"), F.col("b").alias("component")
    )
    roots = (
        cur.select(F.col("b").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("component"))
    )
    return children.union(roots)


# Memoized (node, component) labels per (application, sf_dir, data-version):
# q_dedup_groups and q_neardup_canonical run the IDENTICAL candidate-edge
# generation + large-star/small-star closure, so within one session the
# second caller reuses the materialized (localCheckpoint'ed, tiny) label
# frame instead of re-iterating (VERDICT r8 #6 — the rerun was the #3
# bench line).  Keyed by applicationId so a restarted session (whose
# checkpoint blocks are gone) recomputes; standalone behavior unchanged.
# The data-version token (max mtime + file count of the documents parquet,
# ADVICE r9) invalidates the entry if the parquet under sf_dir is rebuilt
# within the same Spark application — scale_smoke rebuilds replicas
# in-session, and any future tool doing the same must not read stale labels.
_LABELS_CACHE: dict[tuple[str, str, tuple[int, int]], DataFrame] = {}


def _documents_version(sf_dir: str) -> tuple[int, int]:
    """Cheap data-version token: (max mtime ns, file count) of the
    documents parquet path — changes whenever the data is rewritten."""
    import os

    path = os.path.join(sf_dir, "documents.parquet")
    if os.path.isdir(path):
        files = [
            os.path.join(path, f) for f in os.listdir(path)
        ]
    else:
        files = [path]
    mtimes = [os.stat(f).st_mtime_ns for f in files if os.path.exists(f)]
    return (max(mtimes, default=0), len(mtimes))


def neardup_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized connected-component labels of the near-dup graph."""
    key = (
        spark.sparkContext.applicationId,
        sf_dir,
        _documents_version(sf_dir),
    )
    got = _LABELS_CACHE.get(key)
    if got is not None:
        return got
    docs = hashed_shingle_docs(spark, sf_dir).persist()
    edge_caches: list[DataFrame] = []
    edges = cc_candidate_edges(docs, caches=edge_caches)
    labels = connected_components(edges).localCheckpoint(eager=True)
    # labels are materialized; release the postings cache the edge
    # generator parked and the docs frame
    for c in edge_caches:
        c.unpersist()
    docs.unpersist()
    if len(_LABELS_CACHE) > 4:  # bound stale-session references
        _LABELS_CACHE.clear()
    _LABELS_CACHE[key] = labels
    return labels


@register(
    "q_dedup_groups",
    oracle=_cc_edges_sql()
    + """
    , und AS (
      SELECT a, b FROM e UNION SELECT b, a FROM e
    ), nodes AS (
      SELECT doc_id FROM s
    ), walk AS (
      SELECT doc_id, doc_id AS reach FROM nodes
      UNION
      SELECT w.doc_id, u.b AS reach
      FROM walk w JOIN und u ON u.a = w.reach
    ), comp AS (
      SELECT doc_id, MIN(reach) AS component FROM walk GROUP BY doc_id
    )
    SELECT component,
           COUNT(*) AS group_size,
           MIN(doc_id) AS keep_doc_id
    FROM comp
    GROUP BY component
    HAVING COUNT(*) > 1
    """,
)
def q_dedup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected-component dedup groups: near-dup pairs form edges; each
    component keeps one canonical document (its minimum doc_id) — the
    transitive-closure step every large-scale dedup pipeline ends with
    (pairwise ≥ threshold is not transitive, so groups need components).

    Spark side: :func:`connected_components` (large-star/small-star
    alternation — see its docstring for round structure, convergence
    detection, and lineage-truncation rationale).  The oracle computes the
    same components with a recursive CTE (full reachability closure,
    tractable on the deterministic candidate edge set).  This is the
    engine's iterative-algorithm shape: a driver loop over DataFrames with
    a convergence check, not a UDF."""
    labels = neardup_labels(spark, sf_dir)
    out = (
        labels.groupBy("component")
        .agg(F.count("*").cast("long").alias("group_size"))
        .withColumn("keep_doc_id", F.col("component"))
        .filter(F.col("group_size") > 1)
    )
    # Materialize the (small) group summary with truncated lineage —
    # intermediate checkpoint blocks are reclaimed by the ContextCleaner
    # once their frames go out of scope, so repeated invocations don't
    # accumulate executor storage.
    return out.localCheckpoint(eager=True)


@register(
    "q_neardup_canonical",
    oracle=_cc_edges_sql()
    + """
    , und AS (
      SELECT a, b FROM e UNION SELECT b, a FROM e
    ), nodes AS (
      SELECT doc_id FROM s
    ), walk AS (
      SELECT doc_id, doc_id AS reach FROM nodes
      UNION
      SELECT w.doc_id, u.b AS reach
      FROM walk w JOIN und u ON u.a = w.reach
    ), comp AS (
      SELECT doc_id, MIN(reach) AS component FROM walk GROUP BY doc_id
    ), multi AS (
      SELECT component FROM comp GROUP BY component HAVING COUNT(*) > 1
    ), grp AS (
      SELECT c.doc_id, c.component FROM comp c JOIN multi USING (component)
    ), canon AS (
      SELECT component, doc_id AS canonical_doc FROM (
        SELECT g.component, g.doc_id,
               ROW_NUMBER() OVER (PARTITION BY g.component
                                  ORDER BY d.n_chars DESC, g.doc_id) AS rn
        FROM grp g JOIN documents d USING (doc_id))
      WHERE rn = 1
    )
    SELECT g.doc_id, g.component AS group_id, c.canonical_doc,
           g.doc_id = c.canonical_doc AS is_kept
    FROM grp g JOIN canon c USING (component)
    """,
)
def q_neardup_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document keep/drop verdicts for near-dup clusters, keeping the
    LONGEST member (ties → smallest doc_id) as canonical — the
    keep-best-representative selection step a curation pipeline runs after
    transitive closure (C4/RefinedWeb keep-longest heuristic; public
    method).  Complements q_dedup_groups (which reports per-GROUP
    summaries with a min-id keep): this emits the per-DOC mapping a
    downstream filter joins against, with a length-based canonical.

    Scale shape: components from the same large-star/small-star iteration
    as q_dedup_groups (corpus.py:312); the canonical pick is one hash
    aggregate per component via struct-MAX over (n_chars, -doc_id) — no
    per-group sort window — and n_chars rides a 2-column documents scan
    broadcast-joined to the (tiny) multi-member label set.  Labels come
    from :func:`neardup_labels`, shared (memoized) with q_dedup_groups."""
    labels = neardup_labels(spark, sf_dir)
    sizes = labels.groupBy("component").agg(F.count("*").alias("n"))
    grp = labels.join(
        F.broadcast(sizes.filter(F.col("n") > 1).select("component")),
        "component",
    ).select(F.col("node").alias("doc_id"), "component")
    chars = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    canon = (
        grp.join(chars, "doc_id")
        .groupBy("component")
        .agg(
            F.max(
                F.struct(F.col("n_chars"), (-F.col("doc_id")).alias("nd"))
            ).alias("b")
        )
        .select("component", (-F.col("b.nd")).alias("canonical_doc"))
    )
    return (
        grp.join(F.broadcast(canon), "component")
        .select(
            "doc_id",
            F.col("component").alias("group_id"),
            "canonical_doc",
            (F.col("doc_id") == F.col("canonical_doc")).alias("is_kept"),
        )
    )


# ---------------------------------------------------------------------------
# Hybrid retrieval with reciprocal-rank fusion ([extension]): the serving
# pattern of a RAG / retrieval pipeline — a lexical arm (BM25 over the
# fixed keyword query) and a vector arm (cosine against a pinned query
# embedding) each nominate a top-pool, and the two rank lists fuse by
# RRF(d) = sum over arms of 1/(k + rank_arm(d)) (Cormack et al. 2009,
# k = 60).  Documents and vectors are identified by the shared id space
# (vec_id == doc_id in the synthetic corpus).
_RRF_K = 60
_RRF_POOL = 50
_RRF_TOP = 10


def _hybrid_rrf_oracle() -> str:
    from .probes import probe_sql as _probe_sql

    tf_cols = ",\n             ".join(
        f"len(list_filter(toks, t -> t = '{t}')) AS tf_{i}"
        for i, t in enumerate(_BM25_TERMS)
    )
    df_cols = ",\n             ".join(
        f"SUM(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS df_{i}"
        for i in range(len(_BM25_TERMS))
    )
    norm = f"({_BM25_K1} * (1 - {_BM25_B} + {_BM25_B} * dl / avgdl))"
    score = " + ".join(
        f"(ln(1 + (n - df_{i} + 0.5) / (df_{i} + 0.5))"
        f" * tf_{i} * ({_BM25_K1} + 1) / (tf_{i} + {norm}))"
        for i in range(len(_BM25_TERMS))
    )
    matched = " + ".join(f"tf_{i}" for i in range(len(_BM25_TERMS)))
    return f"""
    WITH d AS (
      SELECT doc_id, string_split_regex(lower(trim(text, ' ')), '\\s+') AS toks
      FROM documents
    ), t AS (
      SELECT doc_id, len(toks) AS dl,
             {tf_cols}
      FROM d
    ), s AS (
      SELECT COUNT(*) AS n, AVG(len(toks)) AS avgdl FROM d
    ), g AS (
      SELECT {df_cols} FROM t
    ), lexpool AS (
      SELECT doc_id, ROUND({score}, 4) AS s_lex
      FROM t CROSS JOIN s CROSS JOIN g
      WHERE {matched} > 0
      ORDER BY s_lex DESC, doc_id LIMIT {_RRF_POOL}
    ), lex AS (
      SELECT doc_id,
             ROW_NUMBER() OVER (ORDER BY s_lex DESC, doc_id) AS lex_rank
      FROM lexpool
    ), qv AS ({_probe_sql("hq")}),
    ev AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings
    ), en AS (
      SELECT vec_id, e,
             sqrt(list_reduce(list_transform(e, x -> x * x),
                              (a, b) -> a + b)) AS nrm
      FROM ev
      WHERE list_reduce(list_transform(e, x -> x * x), (a, b) -> a + b) > 0
    ), vecpool AS (
      SELECT vec_id AS doc_id,
             ROUND(list_reduce(
                     list_transform(generate_series(1, 64),
                                    i -> e[i] * pr[i]), (a, b) -> a + b)
                   / (nrm * pn), 5) AS s_vec
      FROM en, qv
      ORDER BY s_vec DESC, doc_id LIMIT {_RRF_POOL}
    ), vec AS (
      SELECT doc_id,
             ROW_NUMBER() OVER (ORDER BY s_vec DESC, doc_id) AS vec_rank
      FROM vecpool
    ), fused AS (
      SELECT COALESCE(l.doc_id, v.doc_id) AS doc_id,
             l.lex_rank, v.vec_rank,
             COALESCE(1.0 / ({_RRF_K} + l.lex_rank), 0.0)
               + COALESCE(1.0 / ({_RRF_K} + v.vec_rank), 0.0) AS rrf
      FROM lex l FULL OUTER JOIN vec v ON l.doc_id = v.doc_id
    )
    SELECT doc_id,
           CAST(COALESCE(lex_rank, 0) AS INT) AS lex_rank,
           CAST(COALESCE(vec_rank, 0) AS INT) AS vec_rank,
           ROUND(rrf, 5) AS rrf5
    FROM fused
    ORDER BY rrf DESC, doc_id LIMIT {_RRF_TOP}
    """


@register("q_hybrid_rrf_search", oracle=_hybrid_rrf_oracle())
def q_hybrid_rrf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid lexical+vector retrieval fused by reciprocal rank: BM25
    (fixed {T}-term query) and pinned-query-embedding cosine each nominate
    their top-{P}; ranks fuse as 1/({K}+r_lex) + 1/({K}+r_vec); top-{N}
    fused results with both arm ranks (0 = not nominated by that arm).

    Scale shape (100 TB): each arm is one corpus scan ending in a
    TakeOrdered top-{P} (per-partition heads, no global sort, no
    SinglePartition over the corpus); the rank windows and the full-outer
    fusion join run on two {P}-row frames — bounded, the priority-sample
    window class.  Ranks fuse from ROUNDED arm scores with doc_id
    tie-breaks, so rank assignment is engine-exact.""".replace(
        "{T}", str(len(_BM25_TERMS))
    ).replace("{P}", str(_RRF_POOL)).replace("{K}", str(_RRF_K)).replace(
        "{N}", str(_RRF_TOP)
    )
    from .probes import probe_vector
    from .similarity import dot, to_double_vec

    # lexical arm — same fixed-order per-term expression sum as
    # q_bm25_keyword_search (kept self-contained so the witnessed BM25
    # query's fingerprint is untouched)
    def _eq(term: str):
        return lambda x: x == F.lit(term)

    docs = load_table(spark, sf_dir, "documents")
    # shared-subplan checkpoint, same rationale as q_bm25_keyword_search
    t = docs.select(
        "doc_id",
        F.size(tokens(F.col("text"))).alias("dl"),
        *[
            F.size(F.filter(tokens(F.col("text")), _eq(term))).alias(f"tf_{i}")
            for i, term in enumerate(_BM25_TERMS)
        ],
    ).localCheckpoint(eager=False)
    stats = t.agg(
        F.count("*").alias("n"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum(F.when(F.col(f"tf_{i}") > 0, 1).otherwise(0)).alias(f"df_{i}")
            for i in range(len(_BM25_TERMS))
        ],
    )
    nrm = _BM25_K1 * (1 - _BM25_B) + F.lit(_BM25_B * _BM25_K1) * F.col(
        "dl"
    ) / F.col("avgdl")
    score = None
    for i in range(len(_BM25_TERMS)):
        idf = F.log(
            1 + (F.col("n") - F.col(f"df_{i}") + 0.5) / (F.col(f"df_{i}") + 0.5)
        )
        part = idf * F.col(f"tf_{i}") * (_BM25_K1 + 1) / (F.col(f"tf_{i}") + nrm)
        score = part if score is None else score + part
    matched = sum(F.col(f"tf_{i}") for i in range(len(_BM25_TERMS)))
    lexpool = (
        t.crossJoin(F.broadcast(stats))
        .filter(matched > 0)
        .select("doc_id", F.round(score, 4).alias("s_lex"))
        .orderBy(F.desc("s_lex"), F.asc("doc_id"))
        .limit(_RRF_POOL)
    )
    # the rank window spans only the pool-row TakeOrdered result
    lex = lexpool.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.desc("s_lex"), F.asc("doc_id")))
        .alias("lex_rank"),
    )

    # vector arm — pinned query embedding, map-side cosine fold
    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("doc_id"),
        to_double_vec(F.col("embedding")).alias("e"),
    )
    sq = F.aggregate(
        F.transform(F.col("e"), lambda x: x * x), F.lit(0.0), lambda a, b: a + b
    )
    qv = probe_vector("hq")
    qn = F.sqrt(
        F.aggregate(
            F.transform(qv, lambda x: x * x), F.lit(0.0), lambda a, b: a + b
        )
    )
    cs = dot(F.col("e"), qv) / (F.sqrt(sq) * qn)
    vecpool = (
        emb.filter(sq > 0)
        .select("doc_id", F.round(cs, 5).alias("s_vec"))
        .orderBy(F.desc("s_vec"), F.asc("doc_id"))
        .limit(_RRF_POOL)
    )
    vec = vecpool.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.desc("s_vec"), F.asc("doc_id")))
        .alias("vec_rank"),
    )

    rrf = F.coalesce(
        F.lit(1.0) / (F.lit(_RRF_K) + F.col("lex_rank")), F.lit(0.0)
    ) + F.coalesce(F.lit(1.0) / (F.lit(_RRF_K) + F.col("vec_rank")), F.lit(0.0))
    return (
        lex.join(vec, "doc_id", "full_outer")
        .withColumn("rrf", rrf)
        .orderBy(F.desc("rrf"), F.asc("doc_id"))
        .limit(_RRF_TOP)
        .select(
            "doc_id",
            F.coalesce(F.col("lex_rank"), F.lit(0)).cast("int").alias("lex_rank"),
            F.coalesce(F.col("vec_rank"), F.lit(0)).cast("int").alias("vec_rank"),
            F.round("rrf", 5).alias("rrf5"),
        )
    )


_PRF_TOP_TERMS = 15


def _prf_oracle() -> str:
    """Shares _bm25_oracle's CTE structure (same term list, same top-k
    ranking SQL) so the pseudo-relevant set can never drift between the
    retrieval query and the expansion step built on it."""
    tf_cols = ",\n             ".join(
        f"len(list_filter(toks, t -> t = '{t}')) AS tf_{i}"
        for i, t in enumerate(_BM25_TERMS)
    )
    df_cols = ",\n             ".join(
        f"SUM(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS df_{i}"
        for i in range(len(_BM25_TERMS))
    )
    norm = f"({_BM25_K1} * (1 - {_BM25_B} + {_BM25_B} * dl / avgdl))"
    score = " + ".join(
        f"(ln(1 + (n - df_{i} + 0.5) / (df_{i} + 0.5))"
        f" * tf_{i} * ({_BM25_K1} + 1) / (tf_{i} + {norm}))"
        for i in range(len(_BM25_TERMS))
    )
    exclude = ", ".join(f"'{t}'" for t in _BM25_TERMS)
    return f"""
    WITH d AS (
      SELECT doc_id, string_split_regex(lower(trim(text, ' ')), '\\s+') AS toks
      FROM documents
    ), t AS (
      SELECT doc_id, len(toks) AS dl,
             {tf_cols}
      FROM d
    ), s AS (
      SELECT COUNT(*) AS n, AVG(len(toks)) AS avgdl FROM d
    ), g AS (
      SELECT {df_cols} FROM t
    ), ranked AS (
      SELECT doc_id, ROUND({score}, 4) AS bm25
      FROM t CROSS JOIN s CROSS JOIN g
      WHERE {" + ".join(f"tf_{i}" for i in range(len(_BM25_TERMS)))} > 0
      ORDER BY bm25 DESC, doc_id
      LIMIT {_TOP_K}
    ), tfr AS (
      SELECT term, COUNT(*) AS tf_r
      FROM (SELECT unnest(d.toks) AS term
            FROM d JOIN ranked USING (doc_id))
      GROUP BY term
    ), dfs AS (
      SELECT term, COUNT(DISTINCT doc_id) AS df
      FROM (SELECT doc_id, unnest(toks) AS term FROM d)
      WHERE term IN (SELECT term FROM tfr)
      GROUP BY term
    )
    SELECT f.term, CAST(f.tf_r AS BIGINT) AS tf_relevant,
           CAST(x.df AS BIGINT) AS df,
           ROUND(f.tf_r * ln(1 + (s.n - x.df + 0.5) / (x.df + 0.5)), 6)
             AS rocchio6
    FROM tfr f JOIN dfs x USING (term) CROSS JOIN s
    WHERE f.term NOT IN ({exclude})
    ORDER BY rocchio6 DESC, f.term
    LIMIT {_PRF_TOP_TERMS}
    """


@register("q_prf_expansion_terms", oracle=_prf_oracle())
def q_prf_expansion_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pseudo-relevance-feedback query expansion (the Rocchio 1971 /
    RM-family step every classic IR stack runs; public method): take the
    BM25 top-{_TOP_K} as the pseudo-relevant set, weight every term it
    contains by tf-in-relevant-set × BM25-idf, drop the original query
    terms, and emit the top {_PRF_TOP_TERMS} expansion candidates.
    Determinism recipe: integer tf/df, one ln per term, ROUND(…, 6)
    before the ordering, term tie-break — the same
    rounded-double-plus-tie-break contract as the BM25 ranking itself,
    whose top-k this reuses verbatim (one ranking definition, no drift).

    Scale shape: the pseudo-relevant set is {_TOP_K} rows (broadcast);
    its term counts are a tiny aggregate; the corpus-side df pass
    explodes tokens but CUTS to the relevant-set vocabulary with a
    broadcast semi-join before the (term, doc) distinct — the same
    postings-cut-to-query-vocab discipline as q_phrase_search.  Output
    is a TakeOrdered {_PRF_TOP_TERMS}."""
    docs = load_table(spark, sf_dir, "documents")
    top = F.broadcast(
        q_bm25_keyword_search(spark, sf_dir).select("doc_id")
    )
    tfr = (
        docs.join(top, "doc_id")
        .select(F.explode(tokens(F.col("text"))).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("tf_r"))
        .localCheckpoint(eager=False)  # read by the df semi-join AND the
        # final rocchio join — one pseudo-relevant term aggregate, not two
    )
    n_row = docs.agg(F.count("*").alias("n"))
    dfs = (
        fan_out(docs, "doc_id")
        .select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
        .join(F.broadcast(tfr.select("term")), "term", "left_semi")
        .distinct()
        .groupBy("term")
        .agg(F.count("*").alias("df"))
    )
    out = (
        tfr.join(dfs, "term")
        .crossJoin(F.broadcast(n_row))
        .filter(~F.col("term").isin(*_BM25_TERMS))
        .select(
            "term",
            F.col("tf_r").cast("long").alias("tf_relevant"),
            F.col("df").cast("long").alias("df"),
            F.round(
                F.col("tf_r")
                * F.log(
                    1 + (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5)
                ),
                6,
            ).alias("rocchio6"),
        )
    )
    return out.orderBy(F.desc("rocchio6"), F.asc("term")).limit(
        _PRF_TOP_TERMS
    )
