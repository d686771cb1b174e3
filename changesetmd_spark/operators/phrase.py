"""Positional phrase search — exact multi-word phrase matching over a
positional inverted index ([extension]; the reference delegates full-text
work to Postgres, ref README.md:106-124, and its tag queries are single-key
lookups — this is the IR-grade generalization a training-data pipeline
needs for quote mining / boilerplate hunting / benchmark-leak probes).

Semantics: for each pinned query phrase (w0 w1 w2), report every document
containing the EXACT consecutive token sequence, with its match count and
first match position (1-based).  Tokenization is the corpus-wide shared
whitespace/lowercase tokenizer (`corpus.tokens`), mirrored verbatim by the
DuckDB oracle.

Scale shape (100 TB): the positional postings explode is the only
corpus-sized stage, and it is immediately cut to the query vocabulary
(`term IN (phrase terms)` — a handful of tokens, so the surviving postings
are a vanishing fraction of the corpus) BEFORE any join.  The phrase table
is a literal broadcast; the two adjacency joins are hash equi-joins on
(doc_id, pos ± k) against the same filtered postings frame (persisted once,
released by `materialize_releasing`).  Nothing is ever quadratic in corpus
size: cost ∝ occurrences of the query terms, the same bound a posting-list
intersection gives a search engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load_table
from .corpus import tokens
from .util import fan_out, materialize_releasing

# Pinned query phrases — frequent word-trigrams of the synthetic corpus
# vocabulary (TESTDATA.md: small fixed vocab, so phrase frequency GROWS
# with corpus size; non-vacuous at every SF).
_PHRASES = ("slow hash batch", "window fast query", "part filter scan")


def _phrase_rows() -> list[tuple[str, str, str, str]]:
    rows = []
    for p in _PHRASES:
        w = p.split(" ")
        assert len(w) == 3, p
        rows.append((p, w[0], w[1], w[2]))
    return rows


def _phrase_oracle() -> str:
    values = ",\n             ".join(
        f"('{p}', '{t0}', '{t1}', '{t2}')" for p, t0, t1, t2 in _phrase_rows()
    )
    all_terms = sorted({t for _, *ts in _phrase_rows() for t in ts})
    in_list = ", ".join(f"'{t}'" for t in all_terms)
    return f"""
    WITH d AS (
      SELECT doc_id, string_split_regex(lower(trim(text, ' ')), '\\s+') AS toks
      FROM documents
    ), p AS (
      SELECT doc_id,
             unnest(generate_series(1, len(toks))) AS pos,
             unnest(toks) AS term
      FROM d
    ), q AS (
      SELECT doc_id, pos, term FROM p WHERE term IN ({in_list})
    ), ph(phrase, t0, t1, t2) AS (
      VALUES {values}
    ), m AS (
      SELECT ph.phrase, a.doc_id, a.pos
      FROM ph
      JOIN q a ON a.term = ph.t0
      JOIN q b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
              AND b.term = ph.t1
      JOIN q c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2
              AND c.term = ph.t2
    )
    SELECT phrase, doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_matches,
           CAST(MIN(pos) AS BIGINT) AS first_pos
    FROM m
    GROUP BY phrase, doc_id
    """


@register("q_phrase_search", oracle=_phrase_oracle())
def q_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact consecutive-token phrase search via positional postings with
    adjacency equi-joins (pos+1 / pos+2) — see module docstring for the
    scale argument.  Hash-checked: integer positions and counts only."""
    out, posts = phrase_search_plan(spark, sf_dir)
    return materialize_releasing(out, posts)


def phrase_search_plan(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """Lazy (result, postings-cache) pair — split out so plan tests can
    inspect the join dataflow the registered query's eager localCheckpoint
    would otherwise hide.  Caller releases ``posts``."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", tokens(F.col("text")).alias("toks")
    )
    all_terms = sorted({t for _, *ts in _phrase_rows() for t in ts})
    # posexplode is 0-based; the oracle's generate_series is 1-based.
    # The term-vocabulary cut happens BEFORE the persist and both joins:
    # the frame every join touches is already query-vocabulary-sized.
    posts = (
        fan_out(docs, "doc_id")
        .select("doc_id", F.posexplode("toks").alias("pos0", "term"))
        .select("doc_id", (F.col("pos0") + 1).alias("pos"), "term")
        .filter(F.col("term").isin(*all_terms))
        .persist()
    )
    ph = spark.createDataFrame(_phrase_rows(), ["phrase", "t0", "t1", "t2"])
    a = posts.select("doc_id", "pos", F.col("term").alias("_ta"))
    b = posts.select(
        F.col("doc_id").alias("_db"),
        F.col("pos").alias("_pb"),
        F.col("term").alias("_tb"),
    )
    c = posts.select(
        F.col("doc_id").alias("_dc"),
        F.col("pos").alias("_pc"),
        F.col("term").alias("_tc"),
    )
    m = (
        a.join(F.broadcast(ph), F.col("_ta") == F.col("t0"))
        .join(
            b,
            (F.col("_db") == F.col("doc_id"))
            & (F.col("_pb") == F.col("pos") + 1)
            & (F.col("_tb") == F.col("t1")),
        )
        .join(
            c,
            (F.col("_dc") == F.col("doc_id"))
            & (F.col("_pc") == F.col("pos") + 2)
            & (F.col("_tc") == F.col("t2")),
        )
    )
    out = m.groupBy("phrase", "doc_id").agg(
        F.count("*").cast("long").alias("n_matches"),
        F.min("pos").cast("long").alias("first_pos"),
    )
    return out, posts
