"""Text-analysis operators for training-data pipelines (SURVEY §2.11 E4).

Language-ID (stopword n-gram heuristic), quality scoring, token counting and
document fingerprinting over the ``documents`` table.  All pure native column
expressions — regexp/sha2/length run JVM-side inside whole-stage codegen, so
at 100 TB these are embarrassingly-parallel scans with no shuffle except the
final (tiny) aggregations.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load_table
from .util import fan_out

# whole-match token pattern; idx=0 selects group 0 (Spark defaults to 1)
_TOKEN_RE = r"\S+"

# tiny per-language stopword cues for the heuristic language-ID
_LANG_CUES = {
    "en": r"\b(the|and|of|to|in)\b",
    "de": r"\b(der|die|das|und|nicht)\b",
    "fr": r"\b(le|la|les|et|une)\b",
    "es": r"\b(el|los|las|y|una)\b",
}


def token_count(text: Column) -> Column:
    """Whitespace token count via regexp matches (mirrors DuckDB exactly).

    ``regexp_count`` counts non-overlapping matches WITHOUT materializing
    the match array the old ``size(regexp_extract_all(...))`` form built
    per row (r15: ~10% warm / 15x cold win at sf0.1) — identical counts."""
    return F.regexp_count(text, F.lit(_TOKEN_RE))


def fingerprint(text: Column) -> Column:
    """Canonical document fingerprint: lowercase, collapse whitespace, trim,
    sha256 — the exact-dedup key (E1)."""
    normalized = F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")
    return F.sha2(normalized, 256)


def word_ngrams(text: Column, k: int) -> Column:
    """Overlapping word k-grams (space-joined, lowercased) via ONE
    codegen'd regex instead of a higher-order ``transform`` lambda.

    The r16 attribution (PLANS.md) measured the old
    ``transform(sequence(1, n-1), i -> concat_ws(element_at ...))`` bigram
    build at 103 s for the 300x corpus — 85% of
    q_text_repetition_quality's entire runtime — because HigherOrderFunction
    evaluation is interpreted per element.  This form is a zero-width
    lookahead scan over the normalized text (`` (?<= )(?=(\\S+ … \\S+)) ``
    anchored at token boundaries by a prepended space), which stays inside
    whole-stage codegen: 2.6-3.8 s on the same corpus (~30x), with
    ``exceptAll``-verified identical output.  RE2 has no lookahead, so the
    DuckDB oracles keep their ``string_split_regex`` form — this is an
    engine-side physical rewrite, not a semantics change."""
    pat = r"(?<= )(?=(" + r" ".join([r"\S+"] * k) + r"))"
    normalized = F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")
    return F.regexp_extract_all(
        F.concat(F.lit(" "), normalized), F.lit(pat), F.lit(1)
    )


def quality_columns(text: Column) -> dict[str, Column]:
    """Length / punctuation / stopword heuristics used for corpus filtering."""
    n_chars = F.length(text)
    n_tokens = token_count(text)
    n_punct = F.size(F.regexp_extract_all(text, F.lit(r"[.,!?;:]"), 0))
    n_stop = F.size(
        F.regexp_extract_all(F.lower(text), F.lit(_LANG_CUES["en"]), 0)
    )
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "avg_token_len": F.round(
            (n_chars - (n_tokens - 1)) * 1.0 / n_tokens, 4
        ),
        "punct_ratio": F.round(n_punct * 1.0 / n_chars, 6),
        "stopword_ratio": F.round(n_stop * 1.0 / n_tokens, 6),
    }


@register(
    "q_text_token_stats",
    oracle=r"""
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(len(regexp_extract_all(text, '\S+'))) AS BIGINT)
             AS total_tokens,
           ROUND(SUM(len(regexp_extract_all(text, '\S+'))) * 1.0 / COUNT(*), 4)
             AS avg_tokens,
           MAX(len(regexp_extract_all(text, '\S+'))) AS max_tokens
    FROM documents
    GROUP BY lang
    """,
)
def q_text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    n = token_count(F.col("text"))
    return (
        docs.withColumn("n_tokens", n)
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.round(F.sum("n_tokens") * 1.0 / F.count("*"), 4).alias("avg_tokens"),
            F.max("n_tokens").alias("max_tokens"),
        )
    )


@register(
    "q_text_quality",
    oracle=r"""
    SELECT doc_id,
           len(regexp_extract_all(text, '\S+')) AS n_tokens,
           ROUND(len(regexp_extract_all(text, '[.,!?;:]')) * 1.0 / length(text), 6)
             AS punct_ratio,
           ROUND(len(regexp_extract_all(lower(text), '\b(the|and|of|to|in)\b')) * 1.0
                 / len(regexp_extract_all(text, '\S+')), 6) AS stopword_ratio
    FROM documents
    WHERE length(text) > 0 AND len(regexp_extract_all(text, '\S+')) > 0
    """,
)
def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(
        (F.length("text") > 0) & (token_count(F.col("text")) > 0)
    )
    q = quality_columns(F.col("text"))
    return docs.select(
        "doc_id",
        q["n_tokens"].alias("n_tokens"),
        q["punct_ratio"].alias("punct_ratio"),
        q["stopword_ratio"].alias("stopword_ratio"),
    )


@register(
    "q_text_lang_id_confusion",
    oracle=r"""
    WITH scored AS (
      SELECT lang,
             len(regexp_extract_all(lower(text), '\b(the|and|of|to|in)\b')) AS s_en,
             len(regexp_extract_all(lower(text), '\b(der|die|das|und|nicht)\b')) AS s_de,
             len(regexp_extract_all(lower(text), '\b(le|la|les|et|une)\b')) AS s_fr,
             len(regexp_extract_all(lower(text), '\b(el|los|las|y|una)\b')) AS s_es
      FROM documents
    )
    SELECT lang,
           CASE WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
                WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
                WHEN s_fr >= s_es THEN 'fr'
                ELSE 'es' END AS predicted_lang,
           COUNT(*) AS n_docs
    FROM scored
    GROUP BY 1, 2
    """,
)
def q_text_lang_id_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    lowered = F.lower(F.col("text"))
    scores = {
        lang: F.size(F.regexp_extract_all(lowered, F.lit(pat), 0))
        for lang, pat in _LANG_CUES.items()
    }
    predicted = (
        F.when(
            (scores["en"] >= scores["de"])
            & (scores["en"] >= scores["fr"])
            & (scores["en"] >= scores["es"]),
            "en",
        )
        .when((scores["de"] >= scores["fr"]) & (scores["de"] >= scores["es"]), "de")
        .when(scores["fr"] >= scores["es"], "fr")
        .otherwise("es")
    )
    return (
        docs.select("lang", predicted.alias("predicted_lang"))
        .groupBy("lang", "predicted_lang")
        .agg(F.count("*").alias("n_docs"))
    )


@register(
    "q_text_fingerprint",
    oracle=r"""
    SELECT doc_id,
           sha256(regexp_replace(lower(trim(text, ' ')), '\s+', ' ', 'g'))
             AS fingerprint
    FROM documents
    """,
)
def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", fingerprint(F.col("text")).alias("fingerprint"))


@register(
    "q_text_quality_by_source",
    oracle=r"""
    SELECT source, lang,
           COUNT(*) AS n_docs,
           ROUND(AVG(length(text)), 4) AS avg_chars,
           ROUND(AVG(len(regexp_extract_all(text, '\S+'))), 4) AS avg_tokens
    FROM documents
    GROUP BY source, lang
    """,
)
def q_text_quality_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-curation rollup: per-(source, lang) volume and length stats —
    the first thing a training-data pipeline reports per crawl source.
    Map-side partial aggregation; one shuffle on the tiny key space."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("source", "lang").agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg(F.length("text")), 4).alias("avg_chars"),
        F.round(F.avg(token_count(F.col("text"))), 4).alias("avg_tokens"),
    )


# GPT-2-style pre-tokenizer pattern, restricted to constructs both Java
# regex (Spark) and RE2 (DuckDB) support identically: contraction suffixes,
# optional-space letter runs, digit runs, punctuation runs.  The upstream
# pattern's trailing-whitespace lookahead is dropped (RE2 has no lookahead);
# pure-whitespace spans are simply not counted as tokens.
_BPE_RE = r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+"
# the contraction apostrophe must be doubled inside a SQL string literal
_BPE_RE_SQL = _BPE_RE.replace("'", "''")


def bpe_token_count(text: Column) -> Column:
    """Sub-word-ish token count from the BPE pre-tokenizer regex — the
    budget unit a training pipeline actually meters (whitespace tokens
    undercount punctuation-heavy and digit-heavy text)."""
    return F.size(F.regexp_extract_all(text, F.lit(_BPE_RE), 0))


@register(
    "q_text_token_budget_by_source",
    oracle=rf"""
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(len(regexp_extract_all(text, '{_TOKEN_RE}'))) AS BIGINT)
             AS ws_tokens,
           CAST(SUM(len(regexp_extract_all(text, '{_BPE_RE_SQL}'))) AS BIGINT)
             AS bpe_tokens,
           ROUND(SUM(len(regexp_extract_all(text, '{_BPE_RE_SQL}'))) * 1.0
                 / SUM(len(regexp_extract_all(text, '{_TOKEN_RE}'))), 4)
             AS bpe_per_ws
    FROM documents
    GROUP BY source
    """,
)
def q_text_token_budget_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget accounting per source in BOTH units — whitespace tokens
    and BPE-pre-tokenizer tokens — plus their ratio (the correction factor
    between "word count" and what a tokenizer will actually bill).  Pure
    codegen regex counting; one skinny aggregation shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    ws = token_count(F.col("text"))
    bpe = bpe_token_count(F.col("text"))
    return docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(ws).alias("ws_tokens"),
        F.sum(bpe).alias("bpe_tokens"),
        F.round(F.sum(bpe) * 1.0 / F.sum(ws), 4).alias("bpe_per_ws"),
    )


# Winnowing (Schleimer, Wilkerson, Aiken 2003 "Winnowing: Local Algorithms
# for Document Fingerprinting" — the MOSS selector): of every window of
# _WIN_W consecutive k-gram hashes, keep the minimum (rightmost on ties).
# Guarantees: any shared substring of length >= _WIN_K + _WIN_W - 1 tokens
# produces at least one shared selected fingerprint; expected density 2/(w+1).
_WIN_K = 4  # tokens per k-gram
_WIN_W = 4  # hashes per winnowing window
# tie-break packing: 32-bit hash above, (2^30-1 - pos) below — min picks the
# smallest hash and, among equals, the RIGHTMOST position, in one integer
# compare both engines evaluate identically (no struct-in-window needed).
# 32+30 = 62 bits stays inside int64; the position field bounds documents at
# 2^30-1 (~1e9) k-grams — beyond any single document this engine will see
# (code-review r6 #3: the earlier 21-bit field broke at ~2M tokens/doc)
_WIN_POS_BITS = 30


@register(
    "q_winnowed_fingerprints",
    oracle=rf"""
    WITH d AS (
      -- \S+ matches: mirrors the engine's normalized-whitespace k-gram
      -- build (text.word_ngrams) — no empty-string tokens
      SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS toks
      FROM documents
    ), posts AS (
      SELECT doc_id, len(toks) - {_WIN_K} + 1 AS n_grams, i AS pos,
             (('0x' || substr(md5(array_to_string(
                 toks[i : i + {_WIN_K} - 1], ' ')), 1, 8))::BIGINT
              * {1 << _WIN_POS_BITS})
             + ({(1 << _WIN_POS_BITS) - 1} - i) AS key
      FROM d, UNNEST(generate_series(1, len(toks) - {_WIN_K} + 1)) AS t(i)
      WHERE len(toks) >= {_WIN_K + _WIN_W - 1}
    ), win AS (
      SELECT doc_id, n_grams, pos,
             MIN(key) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS BETWEEN CURRENT ROW
                            AND {_WIN_W - 1} FOLLOWING) AS sel
      FROM posts
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_windows,
           CAST(COUNT(DISTINCT sel) AS BIGINT) AS n_fingerprints,
           ROUND(COUNT(DISTINCT sel) * 1.0 / COUNT(*), 6) AS density
    FROM win
    WHERE pos <= n_grams - {_WIN_W} + 1
    GROUP BY doc_id
    """,
)
def q_winnowed_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprint selection per document: k-gram hashes, then
    the min-of-each-window selector (rightmost on ties) that guarantees any
    shared run of >= k+w-1 tokens leaves a shared fingerprint while keeping
    expected density 2/(w+1) — the sampling layer a plagiarism/overlap
    detector joins on instead of every shingle.

    Scale shape: selection is a per-document ROWS window (partitioned by
    doc_id — the sort never crosses documents), and the hash+position pack
    into one 61-bit integer so the window min is a single primitive-typed
    running comparison inside codegen; the per-doc aggregate rides the same
    exchange.  Fingerprint volume is ~2/(w+1) of the shingle volume the
    Jaccard family already shuffles.

    Measured-and-rejected (r13, targeting the 72x@300x scale row):
    computing the keys INSIDE a transform(...) array and posexploding
    scalars — which avoids carrying the toks array through the explode —
    ran 98.8 s vs this plan's 65.8 s at 300x replicas: the lambda's
    slice+concat+md5 evaluates as an interpreted higher-order function,
    while this shape keeps the md5 inside whole-stage codegen after the
    explode (the same codegen-beats-HOF result as repetition-quality's
    rejected plan (a)).  Results verified identical before timing."""
    from pyspark.sql import Window

    # r16: posexplode of the codegen'd lookahead-regex k-gram array (see
    # word_ngrams) — exploding gram STRINGS beats carrying the toks array
    # through the explode and re-slicing per position (6.8 s vs 44 s at
    # 300x on the substring-span twin, identical checksums)
    hash32 = F.conv(
        F.substring(F.md5(F.col("gram")), 1, 8), 16, 10
    ).cast("long")
    n_tok = token_count(F.col("text"))
    # r17 (VERDICT r16 #3): stage n_tok in a projection BELOW the explode.
    # Deriving n_grams in the same select as posexplode lands its defining
    # expression in the Project ABOVE Generate — a full-document
    # regexp_extract_all re-evaluated once per exploded GRAM row (81M
    # document scans at 300x, ~45 of the row's 54 s).  Staged, the regex
    # runs once per document and an 8-byte long rides the explode:
    # 64 -> 9.5 s compute at 300x, identical output.
    staged = (
        fan_out(load_table(spark, sf_dir, "documents"), "doc_id")
        .select("doc_id", "text", n_tok.alias("n_tok"))
        .filter(F.col("n_tok") >= _WIN_K + _WIN_W - 1)
    )
    posts = (
        staged.select(
            "doc_id",
            (F.col("n_tok") - (_WIN_K - 1)).alias("n_grams"),
            F.posexplode(word_ngrams(F.col("text"), _WIN_K)).alias(
                "pos0", "gram"
            ),
        )
        .select(
            "doc_id",
            "n_grams",
            (F.col("pos0") + 1).alias("pos"),
            (
                hash32 * (1 << _WIN_POS_BITS)
                + ((1 << _WIN_POS_BITS) - 1 - (F.col("pos0") + 1))
            ).alias("key"),
        )
    )
    frame = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(0, _WIN_W - 1)
    )
    win = posts.withColumn("sel", F.min("key").over(frame))
    return (
        win.filter(F.col("pos") <= F.col("n_grams") - (_WIN_W - 1))
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_windows"),
            F.count_distinct("sel").cast("long").alias("n_fingerprints"),
            F.round(
                F.count_distinct("sel") * 1.0 / F.count("*"), 6
            ).alias("density"),
        )
    )


@register(
    "q_token_len_histogram",
    oracle=r"""
    WITH d AS (
      SELECT source, len(regexp_extract_all(text, '\S+')) AS n_tok
      FROM documents
    )
    SELECT source,
           CAST(length(bin(n_tok)) AS INT) AS bits,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
           CAST(MIN(n_tok) AS INT) AS min_tokens,
           CAST(MAX(n_tok) AS INT) AS max_tokens
    FROM d
    GROUP BY source, length(bin(n_tok))
    """,
)
def q_token_len_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source log2-bucketed document-length histogram — the length
    profile a curation run inspects before choosing truncation / packing
    / quality thresholds (length distributions are heavy-tailed; linear
    buckets hide the tail that matters).  The bucket key is the BIT WIDTH
    of the token count (floor(log2 n)+1) computed via base-2 string
    length — pure integer arithmetic, because floating log2 at exact
    powers of two is an engine-divergence trap.

    Scale shape: one embarrassingly-parallel projection, one hash
    aggregate on (source, bits) with map-side combine — cardinality is
    sources × ~40 buckets, so the exchange is trivially small at any
    corpus size."""
    n_tok = token_count(F.col("text"))
    d = load_table(spark, sf_dir, "documents").select(
        "source", n_tok.alias("n_tok")
    )
    bits = F.length(F.conv(F.col("n_tok"), 10, 2))
    return d.groupBy("source", bits.cast("int").alias("bits")).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_tok").cast("long").alias("total_tokens"),
        F.min("n_tok").cast("int").alias("min_tokens"),
        F.max("n_tok").cast("int").alias("max_tokens"),
    )


@register(
    "q_ngram_novelty",
    oracle=r"""
    WITH d AS (
      -- \S+ matches: mirrors word_shingles' normalized-whitespace k-gram
      -- build (text.word_ngrams) — no empty-string tokens
      SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS toks
      FROM documents
      WHERE len(regexp_extract_all(lower(text), '\S+')) >= 3
    ), g AS (
      SELECT doc_id,
             list_distinct(list_transform(generate_series(1, len(toks) - 2),
                            i -> array_to_string(toks[i:i+2], ' '))) AS gs
      FROM d
    ), posts AS (
      SELECT doc_id, unnest(gs) AS gram FROM g
    ), first AS (
      SELECT gram, MIN(doc_id) AS first_doc FROM posts GROUP BY gram
    )
    SELECT p.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_grams,
           CAST(SUM(CASE WHEN f.first_doc = p.doc_id THEN 1 ELSE 0 END)
                AS BIGINT) AS n_novel,
           ROUND(SUM(CASE WHEN f.first_doc = p.doc_id THEN 1 ELSE 0 END)
                 * 1.0 / COUNT(*), 6) AS novelty
    FROM posts p JOIN first f USING (gram)
    GROUP BY p.doc_id
    """,
)
def q_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document n-gram novelty — the dataset-diagnostics curve behind
    "is the tail of this corpus adding anything": for each document (in
    doc_id ingestion order) the fraction of its distinct word 3-grams
    that NO earlier document contains.  A crawl whose novelty collapses
    toward 0 is re-crawling itself; per-source novelty curves drive crawl
    scheduling and mixture budgets.

    Determinism: pure integer counts and one rounded IEEE division.
    Scale shape: postings explode → MIN-per-gram hash aggregate
    (map-side combined, uniform gram keys) → postings⋈first equi-join on
    gram (one row per distinct gram on the build side) → per-doc
    aggregate; shuffles are keyed by gram then doc_id, and nothing
    quadratic exists — unlike pairwise dedup, novelty only needs each
    gram's FIRST owner."""
    from .dedup import word_shingles

    docs = (
        fan_out(load_table(spark, sf_dir, "documents"), "doc_id")
        .filter(F.size(F.split(F.lower(F.trim(F.col("text"))), r"\s+")) >= 3)
        .select("doc_id", word_shingles(F.col("text")).alias("gs"))
    )
    posts = docs.select("doc_id", F.explode("gs").alias("gram"))
    first = posts.groupBy("gram").agg(F.min("doc_id").alias("first_doc"))
    is_novel = F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
    return (
        posts.join(first, "gram")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_grams"),
            F.sum(is_novel).cast("long").alias("n_novel"),
            F.round(F.sum(is_novel) * 1.0 / F.count("*"), 6).alias(
                "novelty"
            ),
        )
    )


_VG_CHECKPOINTS = 10


def _vocab_growth_oracle() -> str:
    """Inequality-join formulation (simple and exact at oracle SF).
    Percentile fractions ride as repr'd double literals so both engines
    interpolate identical ``quantile_cont`` (= ``F.percentile``) type-7
    cut values over doc_id."""
    ks = range(1, _VG_CHECKPOINTS + 1)
    q_cols = ", ".join(
        f"quantile_cont(doc_id, {c / _VG_CHECKPOINTS!r}) AS q{c}" for c in ks
    )
    cut_union = "\n      UNION ALL ".join(
        f"SELECT {c} AS c, q{c} AS cutoff FROM q" for c in ks
    )
    return rf"""
    WITH toks AS (
      SELECT doc_id,
             unnest(string_split_regex(lower(trim(text, ' ')), '\s+')) AS term
      FROM documents
    ), first AS (
      SELECT term, MIN(doc_id) AS fd FROM toks GROUP BY term
    ), q AS (
      SELECT {q_cols} FROM documents
    ), cuts AS (
      {cut_union}
    ), vocab AS (
      SELECT c, COUNT(fd) AS vocab_size
      FROM cuts LEFT JOIN first ON fd <= cutoff GROUP BY c
    ), ndocs AS (
      SELECT c, COUNT(doc_id) AS n_docs
      FROM cuts LEFT JOIN documents ON doc_id <= cutoff GROUP BY c
    )
    SELECT v.c AS checkpoint,
           n.n_docs,
           v.vocab_size,
           v.vocab_size - COALESCE(LAG(v.vocab_size)
                                   OVER (ORDER BY v.c), 0) AS new_terms
    FROM vocab v JOIN ndocs n ON v.c = n.c
    WHERE n.n_docs > 0
    """


@register("q_vocab_growth", oracle=_vocab_growth_oracle())
def q_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary-growth curve: distinct-term count after each
    10% slice of the corpus (slices cut at exact doc_id percentiles) plus
    the per-slice novel-term count — the curve that sizes a tokenizer
    vocabulary and predicts how much new text still adds new types.

    Scale shape: term first-appearances are one hash aggregate over
    exploded tokens (map-side combinable MIN); the 10 cut values ride as a
    one-row broadcast; bucket assignment is a 10-branch comparison chain
    (fully parallel projection, NOT a 10× inequality-join blowup — that
    formulation is left to the oracle where corpus size doesn't matter);
    the cumulative curve is a 10-row window.  Same shape at 100 TB: the
    only data-sized stages are the explode and two hash aggregates."""
    from pyspark.sql import Window

    ks = list(range(1, _VG_CHECKPOINTS + 1))
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    cuts = docs.agg(
        *[
            F.percentile("doc_id", F.lit(c / _VG_CHECKPOINTS)).alias(f"q{c}")
            for c in ks
        ]
    )

    def bucket(col: Column) -> Column:
        expr = F.when(col <= F.col("q1"), 1)
        for c in ks[1:]:
            expr = expr.when(col <= F.col(f"q{c}"), c)
        return expr.cast("int")

    first = (
        docs.select(
            F.explode(
                F.split(F.lower(F.trim(F.col("text"))), r"\s+")
            ).alias("term"),
            "doc_id",
        )
        .groupBy("term")
        .agg(F.min("doc_id").alias("fd"))
    )
    vocab_b = (
        first.crossJoin(F.broadcast(cuts))
        .select(bucket(F.col("fd")).alias("checkpoint"))
        .groupBy("checkpoint")
        .agg(F.count("*").alias("nv"))
    )
    docs_b = (
        docs.crossJoin(F.broadcast(cuts))
        .select(bucket(F.col("doc_id")).alias("checkpoint"))
        .groupBy("checkpoint")
        .agg(F.count("*").alias("nd"))
    )
    base = spark.range(1, _VG_CHECKPOINTS + 1).select(
        F.col("id").cast("int").alias("checkpoint")
    )
    joined = (
        base.join(vocab_b, "checkpoint", "left")
        .join(docs_b, "checkpoint", "left")
        .na.fill({"nv": 0, "nd": 0})
    )
    w = Window.orderBy("checkpoint").rowsBetween(
        Window.unboundedPreceding, 0
    )  # 10 rows total — not a data-sized window
    return joined.select(
        "checkpoint",
        F.sum("nd").over(w).cast("long").alias("n_docs"),
        F.sum("nv").over(w).cast("long").alias("vocab_size"),
        F.col("nv").cast("long").alias("new_terms"),
    ).filter(
        # ADVICE r8 parity edge: on an EMPTY corpus the oracle's joins
        # emit zero rows; dropping zero-doc checkpoints here matches that
        # shape.  Harmless otherwise — cumulative n_docs ≥ 1 from
        # checkpoint 1 onward whenever any document exists.
        F.col("n_docs") > 0
    )


@register("q_vocab_growth_sketched")
def q_vocab_growth_sketched(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary-growth curve estimated with HLL sketches —
    the 100 TB production twin of q_vocab_growth (VERDICT r8 #8): the
    exact curve's term-MIN aggregate carries the FULL vocabulary through
    the shuffle (the suite's heaviest 100× ratio, 6.4×), while this path
    reduces each checkpoint slice to one fixed-size DataSketches HLL
    (~KB), so the per-checkpoint state is O(1) in corpus size and the
    shuffle carries 10 sketches instead of 10⁸ distinct terms.

    Shape: tokens → per-slice ``hll_sketch_agg`` (map-side partial
    sketches merge associatively, exactly like a sum) → a 10×10 sketch
    union for the cumulative curve (55 tiny rows) →
    ``hll_sketch_estimate``.  Deliberately oracle-less: DuckDB's
    ``approx_count_distinct`` is a different HLL implementation with
    different register hashing, so cross-engine estimates cannot
    hash-match; the referee is ``test_vocab_sketch_error_bound`` pinning
    the estimate within the sketch's published error envelope of the
    exact curve."""
    ks = list(range(1, _VG_CHECKPOINTS + 1))
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    cuts = docs.agg(
        *[
            F.percentile("doc_id", F.lit(c / _VG_CHECKPOINTS)).alias(f"q{c}")
            for c in ks
        ]
    )

    def bucket(col: Column) -> Column:
        expr = F.when(col <= F.col("q1"), 1)
        for c in ks[1:]:
            expr = expr.when(col <= F.col(f"q{c}"), c)
        return expr.cast("int")

    toks = (
        docs.crossJoin(F.broadcast(cuts))
        .select(
            bucket(F.col("doc_id")).alias("checkpoint"),
            F.explode(
                F.split(F.lower(F.trim(F.col("text"))), r"\s+")
            ).alias("term"),
        )
    )
    per_slice = toks.groupBy("checkpoint").agg(
        F.hll_sketch_agg("term").alias("sk"),
        F.count("*").alias("n_tokens"),
    )
    docs_b = (
        docs.crossJoin(F.broadcast(cuts))
        .select(bucket(F.col("doc_id")).alias("checkpoint"))
        .groupBy("checkpoint")
        .agg(F.count("*").alias("nd"))
    )
    # Cumulative sketch union: 10×10/2 rows — a constant-size triangle
    # join, never data-sized.
    lhs = per_slice.select(F.col("checkpoint").alias("c"))
    cum = (
        lhs.join(per_slice, F.col("checkpoint") <= F.col("c"))
        .groupBy("c")
        .agg(F.hll_union_agg("sk").alias("sk"))
        .select(
            F.col("c").alias("checkpoint"),
            F.hll_sketch_estimate("sk").cast("long").alias("vocab_size_est"),
        )
    )
    from pyspark.sql import Window

    w = Window.orderBy("checkpoint").rowsBetween(
        Window.unboundedPreceding, 0
    )  # 10 rows
    nd_cum = docs_b.select(
        "checkpoint", F.sum("nd").over(w).cast("long").alias("n_docs")
    )
    return (
        cum.join(nd_cum, "checkpoint")
        .filter(F.col("n_docs") > 0)
        .select("checkpoint", "n_docs", "vocab_size_est")
        .orderBy("checkpoint")
    )


@register(
    "q_quality_percentile_gate",
    oracle=r"""
    WITH scored AS (
      SELECT source,
             ROUND(len(regexp_extract_all(lower(text), '\b(the|and|of|to|in)\b')) * 1.0
                   / len(regexp_extract_all(text, '\S+')), 6) AS score
      FROM documents
      WHERE length(text) > 0 AND len(regexp_extract_all(text, '\S+')) > 0
    ), thr AS (
      SELECT source, ROUND(quantile_cont(score, 0.25), 6) AS threshold
      FROM scored GROUP BY source
    )
    SELECT s.source, t.threshold,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN s.score >= t.threshold THEN 1 ELSE 0 END)
                AS BIGINT) AS n_kept,
           ROUND(SUM(CASE WHEN s.score >= t.threshold THEN 1 ELSE 0 END)
                 * 1.0 / COUNT(*), 6) AS kept_ratio,
           ROUND(CAST(SUM(CASE WHEN s.score >= t.threshold
                               THEN CAST(s.score AS DECIMAL(28,12)) END)
                      AS DOUBLE)
                 / SUM(CASE WHEN s.score >= t.threshold THEN 1 ELSE 0 END),
                 6) AS avg_score_kept
    FROM scored s JOIN thr t USING (source)
    GROUP BY s.source, t.threshold
    """,
)
def q_quality_percentile_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adaptive per-source quality gating — the filtering pattern real
    curation pipelines use instead of one global cutoff: each source keeps
    its own top-75% by stopword-ratio (a proxy for natural prose; same
    expression as q_text_quality), because a fixed threshold tuned on one
    crawl source over- or under-filters every other.

    Determinism: the score is rounded BEFORE the percentile so both
    engines cut identical doubles; the kept-side mean folds through
    DECIMAL(28,12) (order-proof sum) before the final double division.
    Scale shape: one aggregate for per-source thresholds (tiny — |sources|
    rows, broadcast back), one map-side-combinable aggregate for the gate
    stats; no data-sized shuffle beyond the two groupBys."""
    q = quality_columns(F.col("text"))
    scored = (
        load_table(spark, sf_dir, "documents")
        .filter((F.length("text") > 0) & (token_count(F.col("text")) > 0))
        .select("source", q["stopword_ratio"].alias("score"))
    )
    thr = scored.groupBy("source").agg(
        F.round(F.percentile("score", F.lit(0.25)), 6).alias("threshold")
    )
    kept = F.when(F.col("score") >= F.col("threshold"), 1).otherwise(0)
    kept_score = F.when(
        F.col("score") >= F.col("threshold"),
        F.col("score").cast("decimal(28,12)"),
    )
    return (
        scored.join(F.broadcast(thr), "source")
        .groupBy("source", "threshold")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(kept).cast("long").alias("n_kept"),
            F.round(F.sum(kept) * 1.0 / F.count("*"), 6).alias("kept_ratio"),
            F.round(
                F.sum(kept_score).cast("double") / F.sum(kept), 6
            ).alias("avg_score_kept"),
        )
    )


# -- corpus diversity / language-sanity audits ([extension]) -----------------
# Two corpus-QA metrics a data team reads before training: distinct-n
# diversity per source (the corpus-level twin of per-doc repetition — a
# source whose bigram space collapsed is TEMPLATED even when no single doc
# is repetitive) and a Zipf-law fit over the frequency spectrum (natural
# language shows slope ≈ −1 on log-rank/log-frequency; a slope far off
# flags synthetic/boilerplate or tokenizer damage).


@register(
    "q_distinct_ngram_diversity",
    oracle=r"""
    WITH d AS (
      -- \S+ matches: mirrors the engine's normalized-whitespace bigram
      -- build (text.word_ngrams) — no empty-string tokens
      SELECT doc_id, source,
             regexp_extract_all(lower(text), '\S+') AS toks
      FROM documents
    ), bi AS (
      SELECT doc_id, source,
             list_transform(generate_series(1, len(toks) - 1),
                            i -> toks[i] || ' ' || toks[i+1]) AS grams
      FROM d WHERE len(toks) >= 2
    ), posts AS (
      SELECT source, doc_id, unnest(grams) AS gram FROM bi
    )
    SELECT source,
           COUNT(DISTINCT doc_id) AS n_docs,
           COUNT(*) AS total_bigrams,
           COUNT(DISTINCT gram) AS distinct_bigrams,
           ROUND(COUNT(DISTINCT gram) * 1.0 / COUNT(*), 6) AS distinct_ratio
    FROM posts GROUP BY source
    """,
)
def q_distinct_ngram_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-2 diversity per source (the distinct-n metric of generation
    eval applied to corpus QA): distinct bigrams / total bigrams.  A low
    ratio marks a templated source — cross-document repetition that the
    per-document repetition filter (q_text_repetition_quality) cannot see.
    Exact integer counts and one rounded division, so it hash-checks.

    Scale shape (r13 rewrite): the old single aggregate ran TWO
    countDistincts (doc_id + gram), which planned an Expand — every
    posting duplicated per distinct column before the shuffle.  Now the
    postings take one (source, gram) exchange with map-side combine
    (repeated grams dedupe before the wire), the per-source rollup runs
    over |distinct grams| rows, and n_docs comes from the base table
    (doc_id is unique — no explode needed for it)."""
    # codegen'd lookahead-regex bigrams (see word_ngrams: ~30x over the
    # interpreted transform/element_at build at 300x); "has a bigram" is
    # token_count >= 2 on the SAME normalized tokens — a raw-split size
    # test would count whitespace-only docs (degen-corpus divergence)
    grams = word_ngrams(F.col("text"), 2)
    docs = load_table(spark, sf_dir, "documents")
    per_gram = (
        fan_out(docs, "doc_id")
        .filter(token_count(F.col("text")) >= 2)
        .select("source", F.explode(grams).alias("gram"))
        .groupBy("source", "gram")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    stats = per_gram.groupBy("source").agg(
        F.sum("c").alias("total_bigrams"),
        F.count(F.lit(1)).alias("distinct_bigrams"),
        F.round(F.count(F.lit(1)) * 1.0 / F.sum("c"), 6).alias(
            "distinct_ratio"
        ),
    )
    n_docs = (
        docs.filter(token_count(F.col("text")) >= 2)
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    return stats.join(F.broadcast(n_docs), "source").select(
        "source", "n_docs", "total_bigrams", "distinct_bigrams",
        "distinct_ratio",
    )


_ZIPF_TOP = 64  # frequency spectrum depth for the fit


@register(
    "q_zipf_fit_audit",
    oracle=rf"""
    WITH tf AS (
      SELECT unnest(string_split_regex(lower(trim(text, ' ')), '\s+')) AS term
      FROM documents
    ), counts AS (
      SELECT term, COUNT(*) AS c FROM tf GROUP BY term
    ), ranked AS (
      SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, term) AS r
      FROM counts ORDER BY c DESC, term LIMIT {_ZIPF_TOP}
    ), pts AS (
      SELECT r,
             ROUND(ln(r), 6) AS x,
             ROUND(ln(c), 6) AS y,
             ROUND(ln(r) * ln(c), 6) AS xy,
             ROUND(ln(r) * ln(r), 6) AS xx
      FROM ranked
    ), folded AS (
      SELECT COUNT(*) AS k,
             list_reduce(list(x ORDER BY r), (a, b) -> a + b) AS sx,
             list_reduce(list(y ORDER BY r), (a, b) -> a + b) AS sy,
             list_reduce(list(xy ORDER BY r), (a, b) -> a + b) AS sxy,
             list_reduce(list(xx ORDER BY r), (a, b) -> a + b) AS sxx
      FROM pts
    )
    SELECT CAST(k AS BIGINT) AS k,
           ROUND((k * sxy - sx * sy) / (k * sxx - sx * sx), 5) AS slope,
           ROUND((sy - (k * sxy - sx * sy) / (k * sxx - sx * sx) * sx) / k,
                 5) AS intercept
    FROM folded
    """,
)
def q_zipf_fit_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-law fit over the top-{k} term frequencies: least-squares slope
    and intercept of ln(frequency) against ln(rank).  Natural-language
    corpora sit near slope −1; a flat slope flags templated/synthetic text
    and a cliff flags tokenizer damage — the one-number language-sanity
    audit run before spending GPU-hours on a new crawl.

    Determinism recipe: each point's ln products are rounded to 6, then
    all four least-squares sums run as rank-ordered sequential folds in
    both engines (never a GROUP BY double sum); the closed-form slope /
    intercept are one shared expression tree.  Scale shape: one term-count
    aggregate (map-side combine) and a TakeOrdered {k}; the fit itself
    folds over {k} rows.""".replace("{k}", str(_ZIPF_TOP))
    tf = (
        fan_out(load_table(spark, sf_dir, "documents"), "doc_id")
        .select(
            F.explode(
                F.split(F.lower(F.trim(F.col("text"))), r"\s+")
            ).alias("term")
        )
    )
    counts = tf.groupBy("term").agg(F.count(F.lit(1)).alias("c"))
    ranked = (
        counts.orderBy(F.desc("c"), F.asc("term"))
        .limit(_ZIPF_TOP)
        .withColumn(
            "r",
            F.row_number().over(Window.orderBy(F.desc("c"), F.asc("term"))),
        )
    )
    pts = ranked.select(
        "r",
        F.round(F.log(F.col("r").cast("double")), 6).alias("x"),
        F.round(F.log(F.col("c").cast("double")), 6).alias("y"),
        F.round(
            F.log(F.col("r").cast("double")) * F.log(F.col("c").cast("double")),
            6,
        ).alias("xy"),
        F.round(
            F.log(F.col("r").cast("double")) * F.log(F.col("r").cast("double")),
            6,
        ).alias("xx"),
    )

    def fold(col: str):
        return F.aggregate(
            F.transform(
                F.sort_array(F.collect_list(F.struct("r", F.col(col).alias("v")))),
                lambda s: s["v"],
            ),
            F.lit(0.0),
            lambda a, v: a + v,
        )

    folded = pts.agg(
        F.count(F.lit(1)).alias("k"),
        fold("x").alias("sx"),
        fold("y").alias("sy"),
        fold("xy").alias("sxy"),
        fold("xx").alias("sxx"),
    )
    slope = (F.col("k") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("k") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return folded.select(
        F.col("k").cast("long").alias("k"),
        F.round(slope, 5).alias("slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / F.col("k"), 5).alias(
            "intercept"
        ),
    )


_VOCAB_COVER_TARGETS_BP = (5000, 9000, 9900)


@register(
    "q_vocab_prune_coverage",
    # rf-string: the UNNEST target list is interpolated from
    # _VOCAB_COVER_TARGETS_BP so one definition feeds both engines —
    # editing the Python constant can never silently desync the oracle
    oracle=rf"""
    WITH d AS (
      SELECT string_split_regex(lower(trim(text, ' ')), '\s+') AS toks
      FROM documents
    ), freq AS (
      SELECT term, COUNT(*) AS f
      FROM (SELECT unnest(toks) AS term FROM d)
      GROUP BY term
    ), cls AS (
      SELECT f, COUNT(*) AS types_c, f * COUNT(*) AS mass_c
      FROM freq GROUP BY f
    ), tot AS (
      SELECT CAST(SUM(mass_c) AS BIGINT) AS t,
             CAST(SUM(types_c) AS BIGINT) AS v
      FROM cls
    ), run AS (
      SELECT f, types_c, mass_c,
             COALESCE(SUM(mass_c) OVER (ORDER BY f DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS mass_before,
             COALESCE(SUM(types_c) OVER (ORDER BY f DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS types_before
      FROM cls
    ), tgt AS (
      SELECT t.bp, (tot.t * t.bp + 9999) // 10000 AS target_tokens,
             tot.t, tot.v
      FROM UNNEST([{', '.join(str(bp) for bp in _VOCAB_COVER_TARGETS_BP)}])
        AS t(bp), tot
    )
    SELECT CAST(g.bp AS BIGINT) AS target_bp,
           g.t AS total_tokens, g.v AS total_types,
           CAST(r.types_before
                + (g.target_tokens - r.mass_before + r.f - 1) // r.f
                AS BIGINT) AS n_types_needed,
           CAST(r.mass_before
                + ((g.target_tokens - r.mass_before + r.f - 1) // r.f) * r.f
                AS BIGINT) AS mass_covered
    FROM tgt g JOIN run r
      ON r.mass_before < g.target_tokens
     AND r.mass_before + r.mass_c >= g.target_tokens
    """,
)
def q_vocab_prune_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary pruning plan: the minimum number of vocabulary types
    (taken most-frequent-first) that covers 50% / 90% / 99% of the corpus
    token mass — the coverage curve a tokenizer-vocab or stopword-pruning
    decision reads.  All arithmetic is exact integers (ceil by
    add-and-floor-divide), so the report hash-checks.

    Scale shape — the deliberate part: ranking individual TYPES needs a
    global sort of the vocabulary (millions of rows single-partition at
    100 TB), but types with equal frequency are interchangeable for a
    coverage count, so the plan aggregates the vocabulary into FREQUENCY
    CLASSES first (distinct frequency values — Zipf-bounded, thousands at
    most) and resolves the boundary class arithmetically:
    n_needed = types_above + ceil((target − mass_above) / f).  The only
    window runs over the tiny class frame; the corpus touches one
    (term) aggregate with map-side combine and nothing else."""
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    freq = (
        fan_out(load_table(spark, sf_dir, "documents"), "doc_id")
        .select(F.explode(toks).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("f"))
    )
    cls = freq.groupBy("f").agg(
        F.count("*").alias("types_c"),
        (F.col("f") * F.count("*")).alias("mass_c"),
    )
    tot = cls.agg(
        F.sum("mass_c").cast("long").alias("t"),
        F.sum("types_c").cast("long").alias("v"),
    )
    w = Window.orderBy(F.desc("f")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    run = cls.select(
        "f",
        "types_c",
        "mass_c",
        F.coalesce(F.sum("mass_c").over(w), F.lit(0)).alias("mass_before"),
        F.coalesce(F.sum("types_c").over(w), F.lit(0)).alias("types_before"),
    )
    tgt = (
        spark.range(1)
        .select(
            F.explode(
                F.array(*[F.lit(bp) for bp in _VOCAB_COVER_TARGETS_BP])
            ).alias("bp")
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "bp", F.expr("(t * bp + 9999) DIV 10000").alias("target_tokens"),
            "t", "v",
        )
    )
    extra = F.expr("(target_tokens - mass_before + f - 1) DIV f")
    return (
        tgt.crossJoin(run)
        .filter(
            (F.col("mass_before") < F.col("target_tokens"))
            & (F.col("mass_before") + F.col("mass_c") >= F.col("target_tokens"))
        )
        .select(
            F.col("bp").cast("long").alias("target_bp"),
            F.col("t").alias("total_tokens"),
            F.col("v").alias("total_types"),
            (F.col("types_before") + extra).cast("long").alias("n_types_needed"),
            (F.col("mass_before") + extra * F.col("f"))
            .cast("long")
            .alias("mass_covered"),
        )
    )


# char classes for the entropy profile; patterns must tokenize identically
# in Spark regexp_replace and DuckDB regexp_replace(g) — plain ASCII
# classes, no shorthand that differs between RE2 and Java regex
_ENTROPY_CLASSES = (
    ("letters", "[a-zA-Z]"),
    ("digits", "[0-9]"),
    ("spaces", "[ \\t\\n]"),
)


@register(
    "q_charclass_entropy",
    oracle=r"""
    WITH cls AS (
      SELECT doc_id, source,
             length(text) AS len,
             length(text) - length(regexp_replace(text, '[a-zA-Z]', '', 'g'))
               AS c_letters,
             length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))
               AS c_digits,
             length(text) - length(regexp_replace(text, '[ \t\n]', '', 'g'))
               AS c_spaces
      FROM documents WHERE length(text) > 0
    ), h AS (
      SELECT doc_id, source, len,
             c_letters, c_digits, c_spaces,
             len - c_letters - c_digits - c_spaces AS c_other
      FROM cls
    ), ent AS (
      SELECT doc_id, source,
             ROUND(
               (CASE WHEN c_letters > 0 THEN
                 -(c_letters * 1.0 / len) * log2(c_letters * 1.0 / len)
                ELSE 0 END)
               + (CASE WHEN c_digits > 0 THEN
                 -(c_digits * 1.0 / len) * log2(c_digits * 1.0 / len)
                ELSE 0 END)
               + (CASE WHEN c_spaces > 0 THEN
                 -(c_spaces * 1.0 / len) * log2(c_spaces * 1.0 / len)
                ELSE 0 END)
               + (CASE WHEN c_other > 0 THEN
                 -(c_other * 1.0 / len) * log2(c_other * 1.0 / len)
                ELSE 0 END), 6) AS h
      FROM h
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(CAST(SUM(CAST(h AS DECIMAL(28,12))) AS DOUBLE)
                 / COUNT(*), 6) AS mean_entropy,
           ROUND(MIN(h), 6) AS min_entropy,
           ROUND(MAX(h), 6) AS max_entropy,
           CAST(SUM(CASE WHEN h < 1.0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_low_entropy
    FROM ent GROUP BY source
    """,
)
def q_charclass_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document character-class Shannon entropy (letters / digits /
    whitespace / other), rolled up per source — the cheap structural
    quality signal that flags machine-generated tables, number dumps and
    whitespace art without tokenizing (a natural-text doc sits near
    H ≈ 1.0–1.5 bits over these 4 classes; ``n_low_entropy`` counts docs
    under 1.0 bit, the "one class dominates" degenerate shape).

    Determinism recipe: class counts are exact length-difference
    integers; each document's entropy is ONE identically-parenthesized
    expression rounded to 6; the per-source mean folds those rounded
    values through DECIMAL(28,12) so shuffle order can't perturb the
    double sum (the house float-mean pattern).

    Scale shape: pure map-side projection (4 regexp_replace + length per
    row — whole-stage codegen, no UDF) into one ≤-#sources hash
    aggregate; nothing is exchanged except the tiny rollup."""
    text = F.col("text")
    ln = F.length(text)
    counts = {
        name: (ln - F.length(F.regexp_replace(text, pat, ""))).alias(
            f"c_{name}"
        )
        for name, pat in _ENTROPY_CLASSES
    }
    base = (
        load_table(spark, sf_dir, "documents")
        .filter(ln > 0)
        .select("doc_id", "source", ln.alias("len"), *counts.values())
        .withColumn(
            "c_other",
            F.col("len")
            - sum(F.col(f"c_{n}") for n, _ in _ENTROPY_CLASSES),
        )
    )
    def term(c):
        p = c * 1.0 / F.col("len")
        return F.when(c > 0, -p * F.log2(p)).otherwise(F.lit(0.0))

    h = F.round(
        term(F.col("c_letters"))
        + term(F.col("c_digits"))
        + term(F.col("c_spaces"))
        + term(F.col("c_other")),
        6,
    )
    return (
        base.select("source", h.alias("h"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(
                F.sum(F.col("h").cast("decimal(28,12)")).cast("double")
                / F.count("*"),
                6,
            ).alias("mean_entropy"),
            F.round(F.min("h"), 6).alias("min_entropy"),
            F.round(F.max("h"), 6).alias("max_entropy"),
            F.sum(F.when(F.col("h") < 1.0, 1).otherwise(0))
            .cast("long")
            .alias("n_low_entropy"),
        )
    )


# ---------------------------------------------------------------------------
# Tokenizer fertility audit (r15): chars-per-token under a BPE-ish regex
# pre-tokenizer vs plain whitespace, per source.
# ---------------------------------------------------------------------------
# GPT-2-style pre-tokenization classes: letter runs, digit runs, single
# non-alphanumeric marks — the segmentation BPE merges start from
_BPE_PRETOK_RE = r"[a-z]+|[0-9]+|[^a-z0-9\s]"


@register(
    "q_tokenizer_fertility",
    oracle=rf"""
    WITH d AS (
      SELECT source,
             len(trim(text, ' ')) AS chars,
             len(regexp_extract_all(lower(text), '{_BPE_PRETOK_RE}'))
               AS n_bpe,
             len(regexp_extract_all(text, '\S+')) AS n_ws
      FROM documents
    ), g AS (
      SELECT source,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(chars) AS BIGINT) AS total_chars,
             CAST(SUM(n_bpe) AS BIGINT) AS bpe_tokens,
             CAST(SUM(n_ws) AS BIGINT) AS ws_tokens
      FROM d WHERE n_bpe > 0 AND n_ws > 0
      GROUP BY source
    )
    SELECT source, n_docs, total_chars, bpe_tokens, ws_tokens,
           CAST(total_chars * 1000 // bpe_tokens AS BIGINT)
             AS chars_per_bpe_x1000,
           CAST(bpe_tokens * 1000 // ws_tokens AS BIGINT)
             AS fertility_x1000
    FROM g
    ORDER BY source
    """,
)
def q_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility audit per source — the cost model every
    token-budgeted pipeline derives before mixing sources: how many
    GPT-2-style pre-tokens (letter runs / digit runs / single marks — the
    segmentation BPE merges start from) each whitespace word explodes
    into ("fertility", Ács 2019 usage — public term), and how many
    characters ride per pre-token.  A source whose fertility is high
    (heavy punctuation, digit soup, non-Latin script) eats
    disproportionate token budget per byte of content.

    Exactness: both token counts are regex MATCH COUNTS evaluated by
    each engine's own regex over identical class-only patterns (no
    engine-specific syntax); ratios are exact integer floor per-mille.

    Scale shape: one documents scan with both counters computed map-side,
    one hash aggregate on the source key with map-side combine — the q1
    shape over text."""
    lower = F.lower(F.col("text"))
    # r16 close: the alternation regex ([a-z]+|[0-9]+|[^a-z0-9\s]) was the
    # new worst 300x row (92.5x, ~20 s of pure regex scanning).  The count
    # decomposes exactly: letter RUNS + digit RUNS (two simple-class
    # regexes) + isolated marks, where marks = chars - letters - digits -
    # whitespace counted by codegen'd translate() length arithmetic — no
    # alternation, no third regex pass.  A/B at 300x: 20 s -> 6.4 s with
    # an identical total (tools output in PLANS.md).
    n_letters = F.length(lower) - F.length(
        F.translate(lower, "abcdefghijklmnopqrstuvwxyz", "")
    )
    n_digits = F.length(lower) - F.length(
        F.translate(lower, "0123456789", "")
    )
    n_space = F.length(lower) - F.length(
        F.translate(lower, " \t\n\x0b\x0c\r", "")
    )
    n_bpe = (
        F.regexp_count(lower, F.lit(r"[a-z]+"))
        + F.regexp_count(lower, F.lit(r"[0-9]+"))
        + (F.length(lower) - n_letters - n_digits - n_space)
    )
    d = load_table(spark, sf_dir, "documents").select(
        "source",
        F.length(F.trim(F.col("text"))).alias("chars"),
        n_bpe.alias("n_bpe"),
        token_count(F.col("text")).alias("n_ws"),
    )
    return (
        d.filter((F.col("n_bpe") > 0) & (F.col("n_ws") > 0))
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("chars").cast("long").alias("total_chars"),
            F.sum("n_bpe").cast("long").alias("bpe_tokens"),
            F.sum("n_ws").cast("long").alias("ws_tokens"),
        )
        .select(
            "source",
            "n_docs",
            "total_chars",
            "bpe_tokens",
            "ws_tokens",
            F.expr("total_chars * 1000 div bpe_tokens").alias(
                "chars_per_bpe_x1000"
            ),
            F.expr("bpe_tokens * 1000 div ws_tokens").alias(
                "fertility_x1000"
            ),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# r16: Flesch-family readability profile per source — the classic
# surface-statistics quality signal (syllables proxied by vowel groups, the
# standard dependency-free approximation).
# ---------------------------------------------------------------------------
@register(
    "q_readability_scores",
    oracle=r"""
    WITH d AS (
      SELECT source,
             len(regexp_extract_all(text, '\S+')) AS w,
             GREATEST(len(regexp_extract_all(text, '[.!?]+')), 1) AS s,
             len(regexp_extract_all(lower(text), '[aeiouy]+')) AS y
      FROM documents
      WHERE len(regexp_extract_all(text, '\S+')) >= 1
    ), g AS (
      SELECT source,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(w) AS BIGINT) AS words,
             CAST(SUM(s) AS BIGINT) AS sentences,
             CAST(SUM(y) AS BIGINT) AS syllables
      FROM d GROUP BY source
    )
    SELECT source, n_docs, words, sentences, syllables,
           ROUND(206.835 - 1.015 * (words * 1.0 / sentences)
                 - 84.6 * (syllables * 1.0 / words), 4) AS flesch_ease,
           ROUND(0.39 * (words * 1.0 / sentences)
                 + 11.8 * (syllables * 1.0 / words) - 15.59, 4) AS fk_grade
    FROM g
    ORDER BY source
    """,
)
def q_readability_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease and Flesch-Kincaid grade per source (Kincaid
    1975, public formulas), with syllables approximated by vowel-group
    runs — the dependency-free proxy every fast quality filter uses.
    Computed on SOURCE-level exact integer totals (words, sentences,
    syllables), not per-doc doubles, so the aggregation is
    order-independent and the two formula evaluations are single IEEE
    expression trees per source.

    Empty/whitespace-only documents are excluded (zero words would zero
    the denominator); unpunctuated docs count as one sentence (the
    standard convention).

    Scale shape: three regexp_count-style counters fused into the
    documents scan, one hash aggregate on the ~20 source keys with
    map-side combine — scan-bound at 100 TB."""
    d = load_table(spark, sf_dir, "documents").select(
        "source",
        token_count(F.col("text")).alias("w"),
        F.greatest(
            F.regexp_count(F.col("text"), F.lit(r"[.!?]+")), F.lit(1)
        ).alias("s"),
        F.regexp_count(F.lower(F.col("text")), F.lit(r"[aeiouy]+")).alias("y"),
    ).filter(F.col("w") >= 1)
    g = d.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("w").alias("words"),
        F.sum("s").alias("sentences"),
        F.sum("y").alias("syllables"),
    )
    wps = F.col("words") * 1.0 / F.col("sentences")
    ypw = F.col("syllables") * 1.0 / F.col("words")
    return g.select(
        "source",
        "n_docs",
        "words",
        "sentences",
        "syllables",
        F.round(206.835 - 1.015 * wps - 84.6 * ypw, 4).alias("flesch_ease"),
        F.round(0.39 * wps + 11.8 * ypw - 15.59, 4).alias("fk_grade"),
    ).orderBy("source")
