"""Deduplication operators for training-data pipelines (SURVEY §2.11 E1-E2).

Four tiers, all expressed Spark-first:

* **exact**     — content fingerprint (sha256 of normalized text) + hash
                  groupBy keep-first.  One shuffle on the 256-bit key; at
                  100 TB the key is uniformly distributed so no skew.
* **n-gram Jaccard** — exact pairwise similarity on character shingles for a
                  candidate subset (oracle-checkable); the scale path is LSH.
* **MinHash + LSH** — shingles → K minhashes (native ``xxhash64`` + universal
                  hashing, no Python UDF) → bands → bucket self-join →
                  candidate pairs verified by exact Jaccard.  The band join is
                  the only shuffle and touches candidates only, which is what
                  survives 100 TB (brute-force pairwise is O(n²) and does not).
* **SimHash**   — 64-bit signed-bit aggregation of token hashes; near-dups are
                  pairs at small Hamming distance.

The MinHash/SimHash entries are deterministic (fixed seeds/primes) but use
Spark's xxhash64, which DuckDB cannot reproduce — they are registered without
an oracle (rows-only check per the driver contract); their correctness is
pinned by pytest against exact Jaccard instead.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load_table
from .text import fingerprint
from .util import drop_oversized_groups, fan_out, materialize_releasing

_N_MINHASH = 64
_LONG_MAX = (1 << 63) - 1  # empty-set minhash sentinel
# 32 bands x 2 rows: S-curve inflection (1/b)^(1/r) ≈ 0.18, so recall at the
# 0.5 verification threshold is 1-(1-0.5²)³² ≈ 0.9999 and ≈1-4e-5 at J=0.7
# (16x4 was measured missing a J≥0.7 pair: inflection 0.5 ⇒ only ~65% recall
# at threshold).  The permissive banding over-generates low-J candidates;
# the bucket cap and the exact-Jaccard verify keep that bounded.
_LSH_BANDS = 32
_LSH_ROWS = _N_MINHASH // _LSH_BANDS


@register(
    "q_dedup_exact",
    oracle=r"""
    SELECT doc_id, lang, n_chars
    FROM (
      SELECT doc_id, lang, n_chars,
             ROW_NUMBER() OVER (
               PARTITION BY regexp_replace(lower(trim(text, ' ')), '\s+', ' ', 'g')
               ORDER BY doc_id) AS rn
      FROM documents)
    WHERE rn = 1
    """,
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: keep the lowest doc_id per normalized-content fingerprint.

    Spark partitions by the sha256 fingerprint (collision-free in practice);
    the oracle partitions by the normalized text itself — identical grouping.
    """
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy(fingerprint(F.col("text"))).orderBy("doc_id")
    return (
        docs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "lang", "n_chars")
    )


@register(
    "q_dedup_exact_counts",
    oracle=r"""
    SELECT COUNT(*) AS n_docs,
           COUNT(DISTINCT regexp_replace(lower(trim(text, ' ')), '\s+', ' ', 'g'))
             AS n_unique
    FROM documents
    """,
)
def q_dedup_exact_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.agg(
        F.count("*").alias("n_docs"),
        F.countDistinct(fingerprint(F.col("text"))).alias("n_unique"),
    )


# drop shingles shared by more than this many documents from the Jaccard
# postings join: one boilerplate shingle with df=k makes k² join rows, so
# without a cap the inverted-index work Σ_s df(s)² is unbounded on repeated
# headers/footers.  Mirrors _LSH_BUCKET_CAP; a df>cap shingle carries no
# near-dup signal (it is corpus-wide boilerplate), and the oracle applies
# the identical filter so the measure stays hash-checked.
_JACCARD_DF_CAP = 200

# exact all-pairs ground truth stays full-corpus up to this many documents
# (covers every oracle-checked test SF: sf0.1 = 5 000); larger corpora are
# ground-truthed on a deterministic stride sample (see q_ngram_jaccard_pairs)
_JACCARD_EXACT_MAX_DOCS = 10_000


def hashed_shingle_docs(
    spark: SparkSession, sf_dir: str, source: DataFrame | None = None
) -> DataFrame:
    """documents → (doc_id, sh: array<long>) distinct word-3-gram xxhash64
    shingles — the shared input frame of the exact-Jaccard family (pairs
    query + connected-component dedup groups).  ``source`` lets a caller
    pre-filter the documents frame (e.g. the SF-aware stride) BEFORE the
    expensive shingle projection instead of shingling rows it will drop."""
    docs = load_table(spark, sf_dir, "documents") if source is None else source
    return (
        # the local corpus is one small parquet file → one input partition;
        # fan out BEFORE the expensive shingle projection or it runs
        # single-threaded (conditional — see fan_out)
        fan_out(docs, "doc_id")
        .filter(F.size(F.split(F.lower(F.trim(F.col("text"))), r"\s+")) >= 3)
        .select(
            "doc_id",
            F.transform(
                word_shingles(F.col("text")), lambda s: F.xxhash64(s)
            ).alias("sh"),
        )
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.2,
    df_cap: int = _JACCARD_DF_CAP,
    caches: list[DataFrame] | None = None,
) -> DataFrame:
    """(doc_id, sh) → exact Jaccard pairs (doc_id_1, doc_id_2, jaccard ≥
    threshold) via an *inverted index* on shingles.

    Explode (doc, shingle) postings, drop boilerplate shingles with
    document frequency > df_cap (the df window rides the same shuffle-by-
    shingle the self-join needs), self-join on the shingle, count
    co-occurrences per pair → |A∩B|; |A∪B| follows from the per-doc
    *filtered* set sizes.  Only pairs sharing ≥ 1 kept shingle are ever
    materialized — work is Σ_s min(df(s), cap)², bounded even when the
    corpus repeats a header across every document.  Earlier broadcast-
    nested-loop formulation: 17 s at sf0.1; the inverted index: ~3 s."""
    posts = docs.select("doc_id", F.explode("sh").alias("s"))
    # boilerplate-shingle guard (df cap) — see util.drop_oversized_groups
    # for why this is an aggregate + anti-join and never a count window
    occ = drop_oversized_groups(posts, "s", df_cap)
    # materialization barrier: both self-join branches read the computed
    # postings instead of re-running shingling + the df filter per branch.
    # A caller that materializes the result within its own scope can pass
    # ``caches`` to take ownership of unpersisting this frame.
    occ = occ.persist()
    if caches is not None:
        caches.append(occ)
    # filtered per-doc set sizes join the (small, post-aggregation) pair
    # table, not the postings — at corpus scale pairs ≪ postings, and the
    # postings stay partitioned by shingle straight into the self-join
    # instead of detouring through a repartition-by-doc_id sort-window.
    sizes = occ.groupBy("doc_id").agg(F.count("*").alias("sz"))
    pairs = (
        occ.alias("a")
        .join(occ.alias("b"), "s")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_id_1"),
            F.col("b.doc_id").alias("doc_id_2"),
        )
        .agg(F.count("*").alias("inter"))
        .join(
            sizes.select(
                F.col("doc_id").alias("doc_id_1"), F.col("sz").alias("sz1")
            ),
            "doc_id_1",
        )
        .join(
            sizes.select(
                F.col("doc_id").alias("doc_id_2"), F.col("sz").alias("sz2")
            ),
            "doc_id_2",
        )
    )
    jac = F.col("inter") * 1.0 / (F.col("sz1") + F.col("sz2") - F.col("inter"))
    return (
        pairs.withColumn("jaccard", F.round(jac, 4))
        .filter(jac >= threshold)
        .select("doc_id_1", "doc_id_2", "jaccard")
    )


@register(
    "q_ngram_jaccard_pairs",
    oracle=rf"""
    WITH st AS (
      SELECT (COUNT(*) + {_JACCARD_EXACT_MAX_DOCS} - 1)
             // {_JACCARD_EXACT_MAX_DOCS} AS stride
      FROM documents
    ), d AS (
      SELECT doc_id, string_split_regex(lower(trim(text, ' ')), '\s+') AS toks
      FROM documents, st WHERE doc_id % st.stride = 0
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
    )
    SELECT a.doc_id AS doc_id_1,
           b.doc_id AS doc_id_2,
           ROUND(len(list_intersect(a.sh, b.sh)) * 1.0
                 / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 4)
             AS jaccard
    FROM ks a JOIN ks b ON a.doc_id < b.doc_id
    WHERE len(list_intersect(a.sh, b.sh)) * 1.0
          / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.2
    """,
)
def q_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-3-gram Jaccard near-dup pairs over the full corpus — the
    brute-force ground truth the LSH path approximates (word shingles, not
    char shingles, for the same discriminativeness reason as word_shingles).
    Shingles fold to xxhash64 longs (collision P ≈ |union|²/2⁶⁴ per pair;
    shuffles longs, not strings); see ngram_jaccard_pairs for the
    inverted-index + df-cap dataflow.

    SF-aware bound: this query exists to CHECK the LSH path, and its one
    unbounded term is pair cardinality at the low 0.2 threshold.  At the
    oracle-checked test SFs (≤ _JACCARD_EXACT_MAX_DOCS documents) it stays
    exact over the full corpus (stride 1); beyond that it ground-truths a
    deterministic doc_id-stride sample, so the scale run's cost tracks the
    data ratio rather than the pair blowup.  The stride is computed inside
    BOTH the Spark plan and the oracle SQL from the same corpus count, so
    the two engines agree at every SF."""
    # the stride is part of the query DEFINITION, mirrored verbatim in the
    # oracle SQL (code-review r6 #1: a Spark-only sample silently diverges
    # from the registered oracle beyond the exact-max corpus size) — and
    # computed declaratively (1-row broadcast), not via an eager count()
    stride = (
        load_table(spark, sf_dir, "documents")
        .agg(
            F.floor(
                (F.count("*") + (_JACCARD_EXACT_MAX_DOCS - 1))
                / _JACCARD_EXACT_MAX_DOCS
            )
            .cast("long")
            .alias("_stride")
        )
    )
    # filter BEFORE shingling: the stride drops (stride-1)/stride of the
    # corpus, so the xxhash64 shingle projection must only run on survivors
    sampled = (
        load_table(spark, sf_dir, "documents")
        .crossJoin(F.broadcast(stride))
        .filter(F.col("doc_id") % F.col("_stride") == 0)
        .drop("_stride")
    )
    caches: list[DataFrame] = []
    out = ngram_jaccard_pairs(
        hashed_shingle_docs(spark, sf_dir, sampled), caches=caches
    )
    # materialize the pairs, then release the postings cache the helper
    # handed us ownership of
    return materialize_releasing(out, *caches)


def minhash_signatures(
    docs: DataFrame, id_col: str = "doc_id", sh_col: str = "sh",
    n_hashes: int = _N_MINHASH,
) -> DataFrame:
    """(id, shingles) → (id, sig: array<long>[K]) minhash signatures,
    entirely JVM-side.

    h_i(s) = xxhash64(i, s): K *independent* hash functions by seeding the
    hash with the permutation index.  (The textbook (a·h+b) mod P universal
    hash is a trap here: with small multipliers the product never wraps the
    Mersenne modulus, every "permutation" is order-preserving, and all K
    minhashes collapse to a function of argmin h — observed as a J=0.93 pair
    sharing 0/64 minhashes; with large multipliers the product overflows
    int64, which ANSI-mode Spark 4 throws on.)  Empty shingle sets yield the
    LONG_MAX sentinel.

    Shaped as explode → K plain ``min`` aggregates (partial map-side combine,
    one shuffle on id).  The alternative — K nested lambda-transforms over
    the shingle array — builds an expression tree Catalyst evaluates ~50×
    slower (measured 239 s vs 5 s at sf0.1); flat aggregates stay inside
    whole-stage codegen."""
    ex = docs.select(id_col, F.explode_outer(sh_col).alias("_s"))
    aggs = [
        F.coalesce(
            F.min(F.xxhash64(F.lit(i), F.col("_s"))),
            F.lit(_LONG_MAX),
        ).alias(f"_m{i}")
        for i in range(n_hashes)
    ]
    sig = ex.groupBy(id_col).agg(*aggs)
    return sig.select(
        id_col, F.array(*[f"_m{i}" for i in range(n_hashes)]).alias("sig")
    )


def word_shingles(text: Column, k: int = 3) -> Column:
    """Distinct word k-grams.  Word-level on purpose: these corpora draw from
    a shared vocabulary, so *character* shingles overlap heavily across
    unrelated documents — every LSH bucket then degenerates to
    everybody-collides and the band self-join goes quadratic (observed as an
    OOM at sf0.1).  Word n-grams keep unrelated documents' shingle sets
    disjoint, which is what makes LSH sub-quadratic."""
    from .text import word_ngrams

    toks = F.split(F.lower(F.trim(text)), r"\s+")
    n = F.size(toks)
    # codegen'd lookahead-regex k-grams (r16, see text.word_ngrams: the
    # interpreted transform build was measured 103 s vs 2.6 s at 300x on
    # the bigram twin; identical output by exceptAll)
    grams = word_ngrams(text, k)
    return F.when(n >= k, F.array_distinct(grams)).otherwise(
        F.array_distinct(F.array(F.concat_ws(" ", toks)))
    )


# LSH buckets larger than this are non-discriminative (boilerplate shingle
# sets); production MinHash-LSH drops them — every member pair is either
# found via another, smaller band bucket or is not a near-dup.  Bounds the
# per-bucket pair blowup to O(cap²) regardless of data pathology.
_LSH_BUCKET_CAP = 200


@register("q_minhash_lsh_candidates")  # no oracle: xxhash64 is Spark-specific
def q_minhash_lsh_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup candidates, verified by exact Jaccard.

    Pipeline: word-shingle → 64 minhashes → 32 bands of 2 → explode to
    (doc_id, bucket) pairs keyed by a single xxhash64 of the band slice →
    self-join buckets → distinct candidate pairs → re-attach shingle sets →
    exact-Jaccard verify ≥ 0.5.

    Scale design: the band join carries ONLY (doc_id, bucket_key long) — the
    shingle arrays rejoin after pair dedup, so shuffle volume is O(docs×bands)
    longs, not O(docs×bands×shingles) strings; oversized buckets are capped
    (_LSH_BUCKET_CAP) so a degenerate key cannot go quadratic; the final
    verify touches candidate pairs only.  This is the shape that survives
    100 TB where brute-force O(n²) cannot."""
    docs = (
        fan_out(load_table(spark, sf_dir, "documents"), "doc_id")
        # single-file corpus → fan out before the shingle projection (see
        # q_ngram_jaccard_pairs); the signature explode+agg then parallelizes
        .select("doc_id", word_shingles(F.col("text")).alias("sh"))
        # reused by the signature pass AND both sides of the verify re-attach;
        # without persist each branch recomputes the shingle projection
        .persist()
    )
    sig = minhash_signatures(docs)
    buckets = sig.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(_LSH_BANDS - 1)),
                lambda b: F.xxhash64(b, F.slice(F.col("sig"), b * _LSH_ROWS + 1, _LSH_ROWS)),
            )
        ).alias("bucket"),
    ).persist()  # feeds the cap filter and both sides of the bucket self-join
    # degenerate-bucket guard: aggregate + anti-join, never a count window
    # (see util.drop_oversized_groups for the sort-avoidance rationale)
    small = drop_oversized_groups(buckets, "bucket", _LSH_BUCKET_CAP)
    cands = (
        small.alias("a")
        .join(small.alias("b"), "bucket")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_id_1"),
            F.col("b.doc_id").alias("doc_id_2"),
        )
        .distinct()
    )
    sh1 = docs.select(F.col("doc_id").alias("doc_id_1"), F.col("sh").alias("sh1"))
    sh2 = docs.select(F.col("doc_id").alias("doc_id_2"), F.col("sh").alias("sh2"))
    pairs = cands.join(sh1, "doc_id_1").join(sh2, "doc_id_2")
    inter = F.size(F.array_intersect(F.col("sh1"), F.col("sh2")))
    union = F.size(F.col("sh1")) + F.size(F.col("sh2")) - inter
    out = (
        pairs.withColumn("jaccard", F.round(inter * 1.0 / union, 4))
        .filter(F.col("jaccard") >= 0.5)
        .select("doc_id_1", "doc_id_2", "jaccard")
    )
    # materialize the verified pairs, then release both caches
    return materialize_releasing(out, buckets, docs)


# hash-checked LSH-banding variant: xxhash64 (the fast path above) has no
# DuckDB equivalent, so the driver can only rows-check it.  This variant
# derives 60-bit hashes from md5 prefixes — computable identically in both
# engines — so the FULL banding pipeline (minhash → bands → bucket join →
# candidate pairs) is value-hash-checked, not just the verify stage.
_MH_CHECK_HASHES = 16
_MH_CHECK_ROWS = 4
_MH_CHECK_BANDS = _MH_CHECK_HASHES // _MH_CHECK_ROWS


def _md5_long(col: Column) -> Column:
    """First 15 hex digits of md5 as a non-negative 60-bit long — the
    cross-engine hash: DuckDB computes the identical value via
    ``('0x' || substr(md5(x), 1, 15))::BIGINT``."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


# Shared oracle CTE fragment for the checked-minhash signature build
# (VERDICT r12 #5): ONE md5 per shingle, split into independent 60-bit /
# 56-bit halves, with the i-th minhash drawn from the Kirsch-Mitzenmacher
# double-hash family h1 + i*h2 ("Less Hashing, Same Performance", 2006 —
# public method; the standard way MinHash implementations avoid K
# independent hashes).  Replaces the old md5(i || ':' || sg) per-i
# construction, which computed K=16 md5s per shingle posting and dominated
# the signature build (A/B at 300x replicas in the pipeline docstring).
# Max value h1 + 15*h2 < 2^60 + 15*2^56 < 2^63: no int64 overflow in
# either engine.  One definition, spliced into every oracle that builds
# signatures, so the construction cannot drift between queries.
_MH_SIG_CTES = rf"""posts AS (
      SELECT doc_id, unnest(sh) AS sg FROM s
    ), hp AS (
      SELECT doc_id,
             ('0x' || substr(md5(sg), 1, 15))::BIGINT AS h1,
             ('0x' || substr(md5(sg), 16, 14))::BIGINT AS h2
      FROM posts
    ), idx AS (
      SELECT unnest(generate_series(0, {_MH_CHECK_HASHES - 1})) AS i
    ), mh AS (
      SELECT doc_id, i, MIN(h1 + i * h2) AS m
      FROM hp, idx GROUP BY doc_id, i
    )"""


@register(
    "q_minhash_lsh_checked",
    oracle=rf"""
    WITH d AS (
      SELECT doc_id, string_split_regex(lower(trim(text, ' ')), '\s+') AS toks
      FROM documents
    ), s AS (
      SELECT doc_id,
             list_distinct(list_transform(generate_series(1, len(toks) - 2),
                            i -> array_to_string(toks[i:i+2], ' '))) AS sh
      FROM d WHERE len(toks) >= 3
    ), {_MH_SIG_CTES}, bands AS (
      SELECT doc_id,
             md5(CAST(i // {_MH_CHECK_ROWS} AS VARCHAR) || ':' ||
                 string_agg(CAST(m AS VARCHAR), ',' ORDER BY i)) AS bucket
      FROM mh GROUP BY doc_id, i // {_MH_CHECK_ROWS}
    )
    SELECT DISTINCT a.doc_id AS doc_id_1, b.doc_id AS doc_id_2
    FROM bands a JOIN bands b ON a.bucket = b.bucket AND a.doc_id < b.doc_id
    """,
)
def q_minhash_lsh_checked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH candidate generation with the full pipeline hash-checked:
    16 double-hash minhashes (one md5 per shingle, Kirsch-Mitzenmacher
    h1 + i*h2 — see _MH_SIG_CTES) → 4 bands of 4 rows → band-bucket
    equi-join → distinct candidate pairs.  Same dataflow as the xxhash64
    fast path (explode → K min-aggregates, one shuffle on doc_id; bucket
    self-join, one shuffle on bucket) with an engine-portable hash so
    DuckDB reproduces every intermediate value."""
    docs, sig, cand = _checked_minhash_pipeline(spark, sf_dir)
    return materialize_releasing(cand, sig, docs)


def _mh_band_buckets(sig: DataFrame) -> DataFrame:
    """(doc_id, bucket) band postings from a 16-column md5 signature frame —
    shared by the all-pairs checked pipeline and the incremental
    delta-vs-base variant so the banding rule cannot drift."""
    buckets = []
    for b in range(_MH_CHECK_BANDS):
        band = F.concat_ws(
            ",",
            *[
                F.col(f"_m{b * _MH_CHECK_ROWS + j}").cast("string")
                for j in range(_MH_CHECK_ROWS)
            ],
        )
        buckets.append(F.md5(F.concat_ws(":", F.lit(str(b)), band)))
    return sig.select("doc_id", F.explode(F.array(*buckets)).alias("bucket"))


def _checked_minhash_pipeline(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(shingled docs, 16-column md5 minhash signatures, distinct LSH
    candidate pairs) — the engine-portable pipeline shared by
    `q_minhash_lsh_checked` and `q_minhash_estimate_error_audit`."""
    docs = (
        fan_out(load_table(spark, sf_dir, "documents"), "doc_id")
        .filter(F.size(F.split(F.lower(F.trim(F.col("text"))), r"\s+")) >= 3)
        .select("doc_id", word_shingles(F.col("text")).alias("sh"))
        # consumed by the signature build AND both exact-Jaccard re-attach
        # sides of the audit; without persist each branch recomputes the
        # tokenize+shingle scan (same rationale as the xxhash64 variant)
        .persist()
    )
    # one md5 per shingle posting (not K=16): the two hex halves seed the
    # Kirsch-Mitzenmacher double-hash family h1 + i*h2 (see _MH_SIG_CTES) —
    # md5 is the dominant per-posting cost, so this cuts signature-build
    # compute ~K-fold (A/B numbers at 300x replicas in BENCH_scale.json).
    posts = docs.select("doc_id", F.explode("sh").alias("sg")).select(
        "doc_id",
        F.conv(F.substring(F.md5(F.col("sg")), 1, 15), 16, 10)
        .cast("long")
        .alias("h1"),
        F.conv(F.substring(F.md5(F.col("sg")), 16, 14), 16, 10)
        .cast("long")
        .alias("h2"),
    )
    aggs = [
        F.min(F.col("h1") + F.lit(i) * F.col("h2")).alias(f"_m{i}")
        for i in range(_MH_CHECK_HASHES)
    ]
    # both sides of the bucket self-join below AND the audit's two
    # signature re-attaches read sig — persist so the 16 min-aggregates
    # run once.  Callers release via materialize_releasing(out, sig, docs).
    sig = posts.groupBy("doc_id").agg(*aggs).persist()
    bk = _mh_band_buckets(sig)
    cand = (
        bk.alias("a")
        .join(bk.alias("b"), "bucket")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_id_1"),
            F.col("b.doc_id").alias("doc_id_2"),
        )
        .distinct()
    )
    return docs, sig, cand


@register(
    "q_neardup_verify_jaccard",
    oracle=r"""
    WITH d AS (
      SELECT doc_id, string_split_regex(lower(trim(text, ' ')), '\s+') AS toks
      FROM documents
    ), s AS (
      SELECT doc_id,
             list_distinct(list_transform(generate_series(1, len(toks) - 2),
                            i -> array_to_string(toks[i:i+2], ' '))) AS sh
      FROM d WHERE len(toks) >= 3
    )
    SELECT a.doc_id AS doc_id_1,
           b.doc_id AS doc_id_2,
           ROUND(len(list_intersect(a.sh, b.sh)) * 1.0
                 / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 4)
             AS jaccard,
           len(list_intersect(a.sh, b.sh)) * 1.0
             / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.5
             AS is_duplicate
    FROM s a JOIN s b ON b.doc_id = a.doc_id + 1
    """,
)
def q_neardup_verify_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The exact-verify stage of the MinHash-LSH pipeline, isolated over a
    deterministic candidate set so it is driver-hash-checkable (the LSH
    *candidate generation* is xxhash64-specific and stays rows-only; this
    pins the math that decides a candidate's fate).  Candidates here are
    consecutive doc_ids; the verify computes exact word-3-gram Jaccard and
    flags pairs at the pipeline's ≥ 0.5 dedup threshold."""
    docs = (
        fan_out(load_table(spark, sf_dir, "documents"), "doc_id")
        .filter(F.size(F.split(F.lower(F.trim(F.col("text"))), r"\s+")) >= 3)
        .select("doc_id", word_shingles(F.col("text")).alias("sh"))
    )
    a = docs.select(F.col("doc_id").alias("doc_id_1"), F.col("sh").alias("sh1"))
    b = docs.select(F.col("doc_id").alias("doc_id_2"), F.col("sh").alias("sh2"))
    inter = F.size(F.array_intersect(F.col("sh1"), F.col("sh2")))
    union = F.size(F.col("sh1")) + F.size(F.col("sh2")) - inter
    jac = inter * 1.0 / union
    return (
        a.join(b, F.col("doc_id_2") == F.col("doc_id_1") + 1)
        .select(
            "doc_id_1",
            "doc_id_2",
            F.round(jac, 4).alias("jaccard"),
            (jac >= 0.5).alias("is_duplicate"),
        )
    )


def simhash64(tokens: Column) -> Column:
    """64-bit SimHash of a token array, native expressions only.

    For each bit i: sum over tokens of +1/-1 by bit i of xxhash64(token);
    bit set iff sum > 0.  The 64 bit positions are unrolled in Python (a
    fixed-size expression tree) because shift amounts must be literals."""
    hashes = F.transform(tokens, lambda t: F.xxhash64(t))

    def _voter(i: int):
        # PySpark infers HOF arity from the signature, so the bit index must
        # be captured by closure, not default argument
        def merge(acc, h):
            bit = F.shiftright(h, i).bitwiseAND(F.lit(1))
            return acc + F.when(bit == F.lit(1), 1).otherwise(-1)

        return merge

    out = F.lit(0).cast("long")
    for i in range(64):
        vote = F.aggregate(hashes, F.lit(0), _voter(i))
        out = out.bitwiseOR(
            F.when(vote > 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(
                F.lit(0).cast("long")
            )
        )
    return out


def simhash64_signatures(
    df: DataFrame, id_col: str, tokens: Column
) -> DataFrame:
    """(id, 64-bit SimHash) via explode → 64 flat codegen vote aggregates —
    value-identical to :func:`simhash64` (pinned by
    tests/test_dedup_lsh.py::test_simhash_frame_equals_expression) but ~2.5×
    faster: the expression form re-walks the token-hash array once per bit
    through 64 interpreted ``F.aggregate`` lambdas (HOFs are
    CodegenFallback), while this shape hashes each token once and folds all
    64 bit-votes in one whole-stage-codegen hash aggregate — the
    q_simhash_checked plan shape (r17 measurement: 6.0 s → 2.3 s warm at
    sf0.1; the md5-based checked twin was already faster than the xxhash64
    "fast path" for exactly this reason).

    ``explode_outer`` keeps token-less documents (empty/NULL text): their
    single NULL-token row contributes vote 0 on every bit, so they keep the
    all-zero signature the expression form gives them and still pair with
    each other in the band join.

    NULL-element caveat (ADVICE r17): for a token array CONTAINING NULL
    elements the two forms diverge — :func:`simhash64`'s ``xxhash64`` maps
    a NULL token to the seed (42) and votes on its bits, while this form's
    NULL-guarded vote maps it to 0.  Every current caller tokenizes via
    ``regexp_extract_all``/``split``, which cannot emit NULL elements, so
    the divergence is unreachable today; a future caller feeding hand-built
    arrays must pre-filter NULL elements (``F.filter(tokens, isNotNull)``)
    on whichever form it uses."""
    toks = df.select(F.col(id_col), F.explode_outer(tokens).alias("_t"))
    h = F.when(F.col("_t").isNotNull(), F.xxhash64("_t"))
    bit = lambda i: F.shiftright(h, i).bitwiseAND(F.lit(1))  # noqa: E731
    votes = toks.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(bit(i) == 1, 1)
                .when(h.isNotNull(), -1)
                .otherwise(0)
            ).alias(f"_v{i}")
            for i in range(64)
        ]
    )
    fp = F.lit(0).cast("long")
    for i in range(64):
        fp = fp + F.when(
            F.col(f"_v{i}") > 0, F.shiftleft(F.lit(1).cast("long"), i)
        ).otherwise(F.lit(0).cast("long"))
    return votes.select(F.col(id_col), fp.alias("sim"))


def simhash_band_pairs(
    signatures: DataFrame,
    max_distance: int = 8,
    id_col: str = "doc_id",
    sim_col: str = "sim",
    bucket_cap: int | None = None,
) -> DataFrame:
    """All (id_1, id_2, hamming) pairs at Hamming distance ≤ ``max_distance``
    from a (id, 64-bit simhash) frame — via banding, never all-pairs.

    Exactness by pigeonhole: split the 64 bits into ``max_distance + 1``
    disjoint bands — at most ``max_distance`` bands can contain a differing
    bit, so every qualifying pair agrees exactly on ≥ 1 band.  Candidates are
    an equi-join on (band, band value); a Hamming verify on the carried
    signatures discards false positives.  The Manku/Jain/Sarma web-crawl
    design is the ``max_distance=3`` instance (4 bands × 16 bits).

    Scale: shuffle carries only (id, band-key long, sig long); candidate
    volume per band bucket is quadratic in bucket size, and band keys have
    ``2^(64/(d+1))`` possible values — wider tolerances mean coarser bands
    (d=8 → 7-bit bands → 128 buckets/band), so for large corpora either keep
    d small (d=3's 65 536 buckets/band) or pass ``bucket_cap`` to drop
    degenerate buckets like the MinHash-LSH path (documented recall cost:
    a capped bucket's pairs are found only via their other, smaller bands).
    """
    n_bands = max_distance + 1
    band_bits = 64 // n_bands  # bits [n_bands*band_bits, 64) ride in no band,
    # which only *reduces* the number of dirty bands — exactness holds.
    mask = (1 << band_bits) - 1
    sim = F.col(sim_col)
    keys = F.array(
        *[
            # one long key per band: band index in the high bits, slice low
            F.shiftright(sim, i * band_bits)
            .bitwiseAND(F.lit(mask))
            .bitwiseOR(F.lit((i + 1) << band_bits))
            for i in range(n_bands)
        ]
    )
    bucketed = signatures.select(
        F.col(id_col), sim.alias("_sim"), F.explode(keys).alias("_band")
    )
    if bucket_cap is not None:
        bucketed = drop_oversized_groups(bucketed, "_band", bucket_cap)
    hamming = F.bit_count(F.col("a._sim").bitwiseXOR(F.col("b._sim")))
    return (
        bucketed.alias("a")
        .join(bucketed.alias("b"), "_band")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias(f"{id_col}_1"),
            F.col(f"b.{id_col}").alias(f"{id_col}_2"),
            hamming.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_distance)
        .distinct()  # a pair can agree on several bands
    )


def _simhash_checked_oracle() -> str:
    """DuckDB SQL reproducing the md5-based 60-bit simhash pipeline bit-for-
    bit: per-token 60-bit hash → per-bit ±1 votes → fingerprint → the same
    9-band × 7-bit pigeonhole bucketing as simhash_band_pairs → hamming
    verify.  Generated (60 vote columns) rather than handwritten."""
    votes = ",\n             ".join(
        f"SUM(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS v{i}"
        for i in range(60)
    )
    fp = "\n               + ".join(
        f"CASE WHEN v{i} > 0 THEN (1::BIGINT << {i}) ELSE 0 END"
        for i in range(60)
    )
    bands = ", ".join(
        f"((fp >> {i * 7}) & 127) | {(i + 1) << 7}" for i in range(9)
    )
    return rf"""
    WITH sampled AS (
      SELECT doc_id, text FROM documents WHERE doc_id % 5 = 0
    ), toks AS (
      SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS t FROM sampled
    ), hs AS (
      SELECT doc_id, ('0x' || substr(md5(t), 1, 15))::BIGINT AS h FROM toks
    ), v AS (
      SELECT doc_id, {votes}
      FROM hs GROUP BY doc_id
    ), f AS (
      SELECT doc_id, {fp} AS fp FROM v
    ), banded AS (
      SELECT doc_id, fp, unnest([{bands}]) AS band FROM f
    )
    SELECT DISTINCT a.doc_id AS doc_id_1, b.doc_id AS doc_id_2,
           bit_count(xor(a.fp, b.fp)) AS hamming
    FROM banded a JOIN banded b ON a.band = b.band AND a.doc_id < b.doc_id
    WHERE bit_count(xor(a.fp, b.fp)) <= 8
    """


@register("q_simhash_checked", oracle=_simhash_checked_oracle())
def q_simhash_checked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs with the FULL pipeline hash-checked: md5-prefix
    60-bit token hashes (engine-portable, see _md5_long) → per-bit vote sums
    as 60 flat codegen aggregates (one shuffle on doc_id — the same
    explode→agg shape as minhash_signatures, NOT a nested lambda tree) →
    fingerprint assembly → the identical 9-band pigeonhole bucket equi-join
    as the xxhash64 fast path.  The fast path (q_simhash_near_dup) stays
    rows-only + pytest-pinned; this pins the banding/verify math against an
    independent engine."""
    toks = (
        fan_out(
            load_table(spark, sf_dir, "documents").filter(
                F.col("doc_id") % 5 == 0
            ),
            "doc_id",
        )
        .select(
            "doc_id",
            F.explode(
                F.regexp_extract_all(F.col("text"), F.lit(r"\S+"), 0)
            ).alias("t"),
        )
        .withColumn("h", _md5_long(F.col("t")))
    )
    bit = lambda i: F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1))  # noqa: E731
    votes = toks.groupBy("doc_id").agg(
        *[
            F.sum(F.when(bit(i) == 1, 1).otherwise(-1)).alias(f"v{i}")
            for i in range(60)
        ]
    )
    fp = F.lit(0).cast("long")
    for i in range(60):
        fp = fp + F.when(
            F.col(f"v{i}") > 0, F.shiftleft(F.lit(1).cast("long"), i)
        ).otherwise(F.lit(0).cast("long"))
    sigs = votes.select("doc_id", fp.alias("sim"))
    return simhash_band_pairs(sigs, max_distance=8)


# --- xxhash64 in DuckDB SQL (r18, VERDICT r17 #3) ---------------------------
# q_simhash_near_dup had been `no_oracle` since round 1 because its token
# hash is Spark's xxhash64.  XXH64 is a public spec (and Spark's
# catalyst XXH64 is a faithful implementation of it over the UTF-8 bytes),
# so the oracle can compute it in pure DuckDB SQL: hex-decode the token to a
# byte list, fold the 32-byte stripes / 8-byte words / 4-byte chunk / tail
# bytes with list_reduce, then the avalanche.  DuckDB integer ops error on
# overflow (no wraparound), so every step runs in HUGEINT with an explicit
# mod 2^64, and 64x64 multiplication is split at 32 bits so no intermediate
# exceeds HUGEINT's range.  Verified: 0 mismatches vs a pure-Python XXH64
# reference on 177 tokens of length 0-200 incl. multi-byte UTF-8, and the
# full oracle hash-compares green at every test SF (tests/
# test_oracle_queries.py).

_XXH_P1 = 0x9E3779B185EBCA87
_XXH_P2 = 0xC2B2AE3D27D4EB4F
_XXH_P3 = 0x165667B19E3779F9
_XXH_P4 = 0x85EBCA77C2B2AE63
_XXH_P5 = 0x27D4EB2F165667C5
_M64 = 1 << 64


def _sql_mul64(a: str, b: str) -> str:
    """(a*b) mod 2^64 with no HUGEINT intermediate above ~2^65."""
    return (
        f"((((({a})::HUGEINT % 4294967296) * (({b})::HUGEINT % 4294967296))"
        f" + (((({a})::HUGEINT % 4294967296) * (({b})::HUGEINT // 4294967296)"
        f" + (({a})::HUGEINT // 4294967296) * (({b})::HUGEINT % 4294967296))"
        f" % 4294967296) * 4294967296) % {_M64})::UBIGINT"
    )


def _sql_add64(*terms: str) -> str:
    s = " + ".join(f"({t})::HUGEINT" for t in terms)
    return f"(({s}) % {_M64})::UBIGINT"


def _sql_rotl64(x: str, r: int) -> str:
    keep = 1 << (64 - r)
    return (
        f"(((({x})::HUGEINT % {keep}) * {1 << r})::UBIGINT"
        f" | (({x})::UBIGINT >> {64 - r}))"
    )


def _sql_xor(a: str, b: str) -> str:
    return f"xor(({a})::UBIGINT, ({b})::UBIGINT)"


def _sql_xxh_round(acc: str, inp: str) -> str:
    return _sql_mul64(
        _sql_rotl64(_sql_add64(acc, _sql_mul64(inp, str(_XXH_P2))), 31),
        str(_XXH_P1),
    )


def _xxh64_ctes(seed: int = 42) -> str:
    """CTE chain (to splice after a ``toks`` relation carrying a ``_t``
    VARCHAR column) that computes ``_h`` = xxhash64(utf8(_t), seed) as
    UBIGINT in ``xh_final``, preserving all other columns of ``toks``."""
    p1, p2, p4, p5 = _XXH_P1, _XXH_P2, _XXH_P4, _XXH_P5
    mask = _M64 - 1
    v_init = (
        f"[{(seed + p1 + p2) & mask}::UBIGINT, {(seed + p2) & mask}::UBIGINT,"
        f" {seed & mask}::UBIGINT, {(seed - p1) & mask}::UBIGINT]"
    )
    stripe_lambda = (
        "(vs, st) -> ["
        + ", ".join(_sql_xxh_round(f"vs[{i}]", f"st[{i}]") for i in (1, 2, 3, 4))
        + "]"
    )
    # converge + the four merge rounds.  The merge is a FOLD over _vs
    # (h = (h ^ round(0, v)) * P1 + P4 per accumulator) rather than four
    # textually-nested rounds: every SQL helper here pastes its operand
    # string several times, so nesting grows the generated text as 3^depth
    # (a first cut produced a 450 KB oracle); folds and staged columns keep
    # it linear (~17 KB).
    conv = _sql_add64(
        _sql_rotl64("_vs[1]", 1), _sql_rotl64("_vs[2]", 7),
        _sql_rotl64("_vs[3]", 12), _sql_rotl64("_vs[4]", 18),
    )
    merge_step = "(h, v) -> " + _sql_add64(
        _sql_mul64(
            _sql_xor("h", _sql_xxh_round("0::UBIGINT", "v")), str(p1)
        ),
        str(p4),
    )
    merge = f"list_reduce(list_prepend({conv}, _vs), {merge_step})"
    word_step = "(h, k) -> " + _sql_add64(
        _sql_mul64(
            _sql_rotl64(_sql_xor("h", _sql_xxh_round("0::UBIGINT", "k")), 27),
            str(p1),
        ),
        str(p4),
    )
    byte_step = "(h, b) -> " + _sql_mul64(
        _sql_rotl64(_sql_xor("h", _sql_mul64("b", str(p5))), 11), str(p1)
    )
    h3 = _sql_add64(
        _sql_mul64(
            _sql_rotl64(_sql_xor("_h2", _sql_mul64("_c4", str(_XXH_P1))), 23),
            str(_XXH_P2),
        ),
        str(_XXH_P3),
    )
    word8 = " + ".join(
        f"_bs[8*j + {m + 1}]::HUGEINT * {1 << (8 * m)}" for m in range(8)
    )
    chunk4 = " + ".join(
        f"_bs[_p4 + {m + 1}]::HUGEINT * {1 << (8 * m)}" for m in range(4)
    )
    return f"""
    xh_raw AS (
      SELECT *, hex(_t) AS _hx, strlen(_t)::BIGINT AS _n FROM toks
    ), xh_bytes AS (
      SELECT * EXCLUDE (_hx),
             list_transform(range(0, _n),
               i -> ('0x' || substr(_hx, (2*i + 1)::INT, 2))::UBIGINT) AS _bs
      FROM xh_raw
    ), xh_words AS (
      SELECT *, list_transform(range(0, _n // 8),
               j -> ({word8})::UBIGINT) AS _ws
      FROM xh_bytes
    ), xh_vstate AS (
      SELECT *,
             CASE WHEN _n >= 32
                  THEN list_reduce(list_prepend({v_init},
                         list_transform(range(0, _n // 32),
                           s -> [_ws[4*s + 1], _ws[4*s + 2],
                                 _ws[4*s + 3], _ws[4*s + 4]])),
                       {stripe_lambda})
                  ELSE NULL END AS _vs
      FROM xh_words
    ), xh_hbase AS (
      SELECT * EXCLUDE (_vs),
             {_sql_add64(
                 f"CASE WHEN _n >= 32 THEN {merge} "
                 f"ELSE {(seed + p5) & mask}::UBIGINT END",
                 "_n::UBIGINT",
             )} AS _h1
      FROM xh_vstate
    ), xh_hwords AS (
      SELECT * EXCLUDE (_h1),
             list_reduce(
               list_prepend(_h1, _ws[4*(_n // 32) + 1 : _n // 8]),
               {word_step}) AS _h2,
             ((_n // 8) * 8)::BIGINT AS _p4
      FROM xh_hbase
    ), xh_hchunk_pre AS (
      SELECT *,
             CASE WHEN _n - _p4 >= 4 THEN ({chunk4})::UBIGINT END AS _c4
      FROM xh_hwords
    ), xh_hchunk AS (
      SELECT * EXCLUDE (_ws, _h2, _c4, _p4),
             CASE WHEN _c4 IS NOT NULL THEN {h3} ELSE _h2 END AS _h3,
             (_p4 + CASE WHEN _c4 IS NOT NULL THEN 4 ELSE 0 END)::BIGINT AS _pb
      FROM xh_hchunk_pre
    ), xh_hbytes AS (
      SELECT * EXCLUDE (_bs, _n, _h3, _pb),
             list_reduce(list_prepend(_h3, _bs[_pb + 1 : _n]),
               {byte_step}) AS _h4
      FROM xh_hchunk
    ), xh_av1 AS (
      SELECT * EXCLUDE (_h4),
             {_sql_mul64(_sql_xor("_h4", "(_h4) >> 33"), str(_XXH_P2))} AS _a1
      FROM xh_hbytes
    ), xh_av2 AS (
      SELECT * EXCLUDE (_a1),
             {_sql_mul64(_sql_xor("_a1", "(_a1) >> 29"), str(_XXH_P3))} AS _a2
      FROM xh_av1
    ), xh_final AS (
      SELECT * EXCLUDE (_a2), {_sql_xor("_a2", "(_a2) >> 32")} AS _h
      FROM xh_av2
    )"""


def _simhash_near_dup_oracle() -> str:
    """DuckDB SQL reproducing q_simhash_near_dup end to end: xxhash64 token
    hashes (the CTE chain above) → 64 per-bit ±1 vote sums → fingerprint →
    the 9-band × 7-bit pigeonhole bucketing of simhash_band_pairs (with the
    _LSH_BUCKET_CAP oversized-bucket drop) → hamming ≤ 8 verify.  Token-less
    sampled docs keep the all-zero signature (the explode_outer contract),
    via the LEFT JOIN back to the sample."""
    votes = ",\n             ".join(
        f"SUM(CASE WHEN (_h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS v{i}"
        for i in range(64)
    )
    fp = "\n               + ".join(
        f"CASE WHEN v{i} > 0 THEN {1 << i}::UBIGINT ELSE 0 END"
        for i in range(64)
    )
    bands = ", ".join(
        f"((fp >> {i * 7}) & 127) | {(i + 1) << 7}" for i in range(9)
    )
    return rf"""
    WITH sampled AS (
      SELECT doc_id, text FROM documents WHERE doc_id % 5 = 0
    ), toks AS (
      SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS _t
      FROM sampled
    ), {_xxh64_ctes(42).strip()}, v AS (
      SELECT doc_id, {votes}
      FROM xh_final GROUP BY doc_id
    ), f AS (
      SELECT doc_id, ({fp})::UBIGINT AS fp FROM v
    ), allf AS (
      SELECT s.doc_id, COALESCE(f.fp, 0::UBIGINT) AS fp
      FROM sampled s LEFT JOIN f USING (doc_id)
    ), banded AS (
      SELECT doc_id, fp, unnest([{bands}]) AS band FROM allf
    ), kept AS (
      SELECT * FROM banded
      WHERE band IN (SELECT band FROM banded
                     GROUP BY band HAVING COUNT(*) <= {_LSH_BUCKET_CAP})
    )
    SELECT DISTINCT a.doc_id AS doc_id_1, b.doc_id AS doc_id_2,
           bit_count(xor(a.fp, b.fp)) AS hamming
    FROM kept a JOIN kept b ON a.band = b.band AND a.doc_id < b.doc_id
    WHERE bit_count(xor(a.fp, b.fp)) <= 8
    """


@register("q_simhash_near_dup", oracle=_simhash_near_dup_oracle())
def q_simhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs at Hamming distance ≤ 8 over the sampled
    corpus, found via pigeonhole-exact 9-band × 7-bit bucketing
    (:func:`simhash_band_pairs`) — an equi-join on band keys, NOT the
    round-1 broadcast nested-loop all-pairs join.  Equivalence to the
    all-pairs formulation is pinned by pytest (test_dedup_lsh.py).

    The bucket cap bounds the band self-join at corpus scale: d=8 means
    7-bit bands (128 bucket values per band), so an uncapped degenerate
    bucket grows ~n/128 and its self-join goes quadratic.  At test scale no
    bucket reaches the cap, so the output is still the exact distance-≤8
    pair set."""
    docs = simhash64_signatures(
        load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 0),
        "doc_id",
        F.regexp_extract_all(F.col("text"), F.lit(r"\S+"), 0),
    )
    return simhash_band_pairs(docs, max_distance=8, bucket_cap=_LSH_BUCKET_CAP)


_SPAN_W = 15  # sliding-window length (tokens) for substring dedup


@register(
    "q_duplicate_substring_spans",
    oracle=rf"""
    WITH d AS (
      -- \S+ matches: mirrors the engine's normalized-whitespace k-gram
      -- build (text.word_ngrams) — no empty-string tokens
      SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS toks
      FROM documents
    ), posts AS (
      SELECT doc_id, i AS pos,
             ('0x' || substr(md5(array_to_string(
                toks[i : i + {_SPAN_W} - 1], ' ')), 1, 15))::BIGINT AS h
      FROM d, UNNEST(generate_series(1, len(toks) - {_SPAN_W} + 1)) AS t(i)
    ), dup AS (
      SELECT h FROM posts GROUP BY h HAVING COUNT(*) > 1
    ), hits AS (
      SELECT doc_id, pos FROM posts JOIN dup USING (h)
    ), flagged AS (
      SELECT doc_id, pos,
             CASE WHEN pos > COALESCE(MAX(pos + {_SPAN_W} - 1) OVER (
                    PARTITION BY doc_id ORDER BY pos
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
                  THEN 1 ELSE 0 END AS new_span
      FROM hits
    ), spans AS (
      SELECT doc_id, pos,
             SUM(new_span) OVER (PARTITION BY doc_id ORDER BY pos
                                 ROWS UNBOUNDED PRECEDING) AS span_id
      FROM flagged
    ), merged AS (
      SELECT doc_id, span_id,
             MIN(pos) AS s, MAX(pos) + {_SPAN_W} - 1 AS e
      FROM spans GROUP BY doc_id, span_id
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_spans,
           CAST(SUM(e - s + 1) AS BIGINT) AS dup_tokens
    FROM merged GROUP BY doc_id
    """,
)
def q_duplicate_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring dedup detection (the Lee et al. 2021 "Deduplicating
    Training Data" family, bounded to fixed {W}-token windows instead of a
    suffix array): every {W}-token sliding window occurring at more than one
    (doc, position) is a duplicated substring; overlapping duplicate windows
    within a document merge into maximal spans, and each document reports
    how many spans and how many tokens they cover — the removal targets of
    a substring-level dedup pass.

    Scale shape: windows fold to engine-portable 60-bit md5 longs before
    any shuffle (the shuffle key is a long, never the window text); the
    duplicate test is a COUNT-over-window on one hash-exchange of the
    postings — partitioned by the uniform 60-bit hash, so the "sort" is
    within tiny same-hash groups — and span merging is a per-document
    prefix-max window (per-document sort, never global).  Window count is
    ~|tokens|, the same order as the shingle postings the Jaccard/MinHash
    family already shuffles.

    r13 A/B at 300× replicas (VERDICT r12 #5), two stacked wins: (1) the
    previous aggregate-HAVING>1-then-rejoin plan recomputed every window
    md5 on the probe side — 94.4 s; the one-exchange count-over-window
    shape computes each md5 once and rides the same exchange into the
    duplicate filter — 60.5 s.  (2) generating postings by exploding
    POSITIONS and hashing in a plain projection keeps the md5 in
    whole-stage codegen, where the old posexplode(transform(md5(...)))
    evaluated the lambda interpreted — 44.6 s vs 35.3 s on a warm-cache
    re-measure.  Net: the 300× scale ratio fell 92× → ~20×."""
    from .text import token_count, word_ngrams

    # r16: posexplode of the codegen'd lookahead-regex k-gram array (see
    # text.word_ngrams) — the r13 explode-positions shape still carried
    # the full toks ARRAY through the explode and re-sliced it per
    # position; exploding the gram STRINGS directly measured 6.8 s vs
    # 44 s at 300x with an identical posting checksum
    posts = (
        fan_out(load_table(spark, sf_dir, "documents"), "doc_id")
        .filter(token_count(F.col("text")) >= _SPAN_W)
        .select(
            "doc_id",
            F.posexplode(word_ngrams(F.col("text"), _SPAN_W)).alias(
                "pos0", "gram"
            ),
        )
        .select(
            "doc_id",
            (F.col("pos0") + 1).alias("pos"),
            _md5_long(F.col("gram")).alias("h"),
        )
    )
    from pyspark.sql import Window

    # duplicate windows via COUNT over the hash partition: one exchange of
    # the postings, each md5 computed exactly once (the old agg+rejoin
    # shape recomputed the full md5 pass on the probe side — see the
    # docstring A/B)
    hits = (
        posts.withColumn(
            "_n", F.count("*").over(Window.partitionBy("h"))
        )
        .filter(F.col("_n") > 1)
        .select("doc_id", "pos")
    )

    prev_end = F.max(F.col("pos") + (_SPAN_W - 1)).over(
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = hits.withColumn(
        "new_span",
        F.when(F.col("pos") > F.coalesce(prev_end, F.lit(-1)), 1).otherwise(0),
    )
    spans = flagged.withColumn(
        "span_id",
        F.sum("new_span").over(
            Window.partitionBy("doc_id")
            .orderBy("pos")
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    merged = spans.groupBy("doc_id", "span_id").agg(
        F.min("pos").alias("s"),
        (F.max("pos") + (_SPAN_W - 1)).alias("e"),
    )
    return merged.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_spans"),
        F.sum(F.col("e") - F.col("s") + 1).cast("long").alias("dup_tokens"),
    )


_CDC_K = 4   # tokens hashed to decide a boundary
_CDC_MOD = 16  # expected chunk length in tokens (boundary P = 1/16)


@register(
    "q_cdc_chunk_dedup",
    oracle=rf"""
    WITH d AS (
      SELECT doc_id, string_split_regex(lower(trim(text, ' ')), '\s+') AS toks,
             len(string_split_regex(lower(trim(text, ' ')), '\s+'))
               - {_CDC_K} + 1 AS n_grams
      FROM documents
      WHERE len(string_split_regex(lower(trim(text, ' ')), '\s+')) >= {_CDC_K}
    ), grams AS (
      SELECT doc_id, i AS pos,
             CASE WHEN i = 1 OR ('0x' || substr(md5(array_to_string(
                    toks[i : i + {_CDC_K} - 1], ' ')), 1, 15))::BIGINT
                    % {_CDC_MOD} = 0
                  THEN 1 ELSE 0 END AS bnd
      FROM d, UNNEST(generate_series(1, n_grams)) AS t(i)
    ), marked AS (
      SELECT doc_id, pos,
             SUM(bnd) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS UNBOUNDED PRECEDING) AS chunk_id
      FROM grams
    ), bounds AS (
      SELECT doc_id, chunk_id, MIN(pos) AS s, MAX(pos) AS e
      FROM marked GROUP BY doc_id, chunk_id
    ), chunks AS (
      SELECT b.doc_id, b.chunk_id,
             md5(array_to_string(
               d.toks[b.s : b.e + CASE WHEN b.e = d.n_grams
                                       THEN {_CDC_K} - 1 ELSE 0 END],
               ' ')) AS h
      FROM bounds b JOIN d USING (doc_id)
    ), freq AS (
      SELECT h, COUNT(*) AS cnt FROM chunks GROUP BY h
    )
    SELECT c.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(SUM(CASE WHEN f.cnt > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_shared_chunks,
           ROUND(SUM(CASE WHEN f.cnt > 1 THEN 1 ELSE 0 END) * 1.0
                 / COUNT(*), 6) AS shared_ratio
    FROM chunks c JOIN freq f USING (h)
    GROUP BY c.doc_id
    """,
)
def q_cdc_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking dedup (the Rabin/FastCDC family storage
    systems and crawl pipelines use): chunk boundaries are declared
    wherever the content hash of a {K}-token window is ≡ 0 mod {MOD} — so
    an insertion early in a document only re-chunks its own neighborhood
    instead of shifting every downstream chunk the way fixed-size blocks
    would — then chunks are fingerprinted and each document reports how
    much of it duplicates chunks seen anywhere else in the corpus.  Chunks
    PARTITION the document: chunk i covers tokens [s_i, s_{{i+1}}), with
    the final chunk extended to the document end.  Complements the
    fixed-window substring-span detector: spans locate duplicated REGIONS
    pairwise, CDC measures corpus-level redundancy against a dedupable
    chunk store.

    Scale shape (r15 rewrite, VERDICT r14 #2): the whole per-document
    pipeline — boundary detection, chunk-extent derivation, chunk
    fingerprinting — is ONE whole-stage-codegen projection built from
    array higher-order functions: ``filter(sequence(1, n_grams))`` finds
    boundary positions (one inline window hash per gram, same md5 count
    as before), ``transform`` over that bounded boundary array emits the
    chunk hashes directly (next boundary − 1 is the chunk end; the final
    chunk extends to the document end).  The old form exploded every gram
    position (≈ corpus token count in rows) through a per-doc prefix-sum
    window, a (doc, chunk) aggregate, and a join back to the token
    arrays — three exchanges and a window over the widest frame in the
    query, and the gauntlet's longest JIT warm-up tail.  Now only the
    skinny (doc_id, chunk-hash) frame is ever shuffled: once to count
    global chunk frequency, once keyed back by the uniform hash, once for
    the per-doc rollup.  The chunk frame is persisted across its two
    consumers so document text is tokenized and hashed exactly once."""
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    docs = fan_out(load_table(spark, sf_dir, "documents"), "doc_id").filter(
        F.size(toks) >= _CDC_K
    ).select(
        "doc_id",
        toks.alias("toks"),
        (F.size(toks) - (_CDC_K - 1)).alias("n_grams"),
    )

    def _is_boundary(i):
        window_hash = _md5_long(
            F.concat_ws(" ", F.slice(F.col("toks"), i, _CDC_K))
        )
        return (i == 1) | (window_hash % _CDC_MOD == 0)

    with_bpos = docs.withColumn(
        "bpos",
        F.filter(F.sequence(F.lit(1), F.col("n_grams")), _is_boundary),
    )

    def _chunk_hash(s, idx):
        # next boundary via 0-based F.get (NULL past the end in every
        # ANSI mode, unlike element_at) → the final chunk runs to
        # n_grams and picks up the last _CDC_K - 1 trailing tokens
        e = F.coalesce(F.get(F.col("bpos"), idx + 1) - 1, F.col("n_grams"))
        ln = (
            e
            - s
            + 1
            + F.when(e == F.col("n_grams"), _CDC_K - 1).otherwise(0)
        )
        return F.md5(F.concat_ws(" ", F.slice(F.col("toks"), s, ln)))

    chunks = with_bpos.select(
        "doc_id",
        F.explode(F.transform(F.col("bpos"), _chunk_hash)).alias("h"),
    ).persist()
    freq = chunks.groupBy("h").agg(F.count("*").alias("cnt"))
    shared = F.when(F.col("cnt") > 1, 1).otherwise(0)
    out = (
        chunks.join(freq, "h")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_chunks"),
            F.sum(shared).cast("long").alias("n_shared_chunks"),
            F.round(F.sum(shared) * 1.0 / F.count("*"), 6).alias(
                "shared_ratio"
            ),
        )
    )
    # materialize the per-doc rollup, then release the chunk-frame cache
    return materialize_releasing(out, chunks)


# PPJoin threshold as an exact fraction so every filter below is integer
# arithmetic (no float threshold compare to diverge between engines):
# Jaccard >= _PPJ_T_NUM/_PPJ_T_DEN = 0.6.
_PPJ_T_NUM = 3
_PPJ_T_DEN = 5


@register(
    "q_ppjoin_similar_docs",
    oracle=rf"""
    WITH d AS (
      SELECT doc_id, string_split_regex(lower(trim(text, ' ')), '\s+') AS toks
      FROM documents
    ), s AS (
      SELECT doc_id,
             CASE WHEN len(toks) >= 3 THEN
               list_distinct(list_transform(generate_series(1, len(toks) - 2),
                              i -> array_to_string(toks[i:i+2], ' ')))
             ELSE list_distinct([array_to_string(toks, ' ')]) END AS sh
      FROM d
    ), posts AS (
      SELECT doc_id, unnest(sh) AS sg FROM s
    ), dfc AS (
      SELECT sg, COUNT(*) AS df FROM posts GROUP BY sg
    ), sz AS (
      SELECT doc_id, COUNT(*) AS sz FROM posts GROUP BY doc_id
    ), ranked AS (
      SELECT p.doc_id, p.sg, z.sz,
             ROW_NUMBER() OVER (PARTITION BY p.doc_id
                                ORDER BY f.df, p.sg) AS rk
      FROM posts p JOIN dfc f USING (sg) JOIN sz z USING (doc_id)
    ), pref AS (
      SELECT doc_id, sg, sz FROM ranked
      WHERE rk <= sz - ((sz * {_PPJ_T_NUM} + {_PPJ_T_DEN - 1})
                        // {_PPJ_T_DEN}) + 1
    ), cand AS (
      SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2,
                      a.sz AS sz1, b.sz AS sz2
      FROM pref a JOIN pref b ON a.sg = b.sg AND a.doc_id < b.doc_id
      WHERE {_PPJ_T_NUM} * greatest(a.sz, b.sz)
            <= {_PPJ_T_DEN} * least(a.sz, b.sz)
    ), inter AS (
      SELECT c.d1 AS doc_id_1, c.d2 AS doc_id_2, c.sz1, c.sz2,
             COUNT(*) AS n_common
      FROM cand c
      JOIN posts p1 ON p1.doc_id = c.d1
      JOIN posts p2 ON p2.doc_id = c.d2 AND p2.sg = p1.sg
      GROUP BY 1, 2, 3, 4
    )
    SELECT doc_id_1, doc_id_2,
           CAST(sz1 AS BIGINT) AS size_1,
           CAST(sz2 AS BIGINT) AS size_2,
           CAST(n_common AS BIGINT) AS n_common,
           ROUND(n_common * 1.0 / (sz1 + sz2 - n_common), 6) AS jaccard
    FROM inter
    WHERE n_common * {_PPJ_T_NUM + _PPJ_T_DEN}
          >= {_PPJ_T_NUM} * (sz1 + sz2)
    """,
)
def q_ppjoin_similar_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix-filtering set-similarity self-join (PPJoin family, Xiao et al.
    WWW'08): EXACT word-3-gram Jaccard >= 0.6 pairs, found without LSH and
    without a recall-losing df cap.  Each document only indexes its PREFIX —
    the (sz - ceil(t*sz) + 1) globally-rarest shingles in ascending
    document-frequency order — because two sets with Jaccard >= t must
    share at least one prefix element (pigeonhole on the overlap bound
    ceil(t*|x|)).  A size filter (t*max <= min) and the positional filter
    (1 + min(sz1-rk1, sz2-rk2) >= ceil(t/(1+t)*(sz1+sz2)) on the matched
    prefix ranks — overlap can only accrue after the matched token in the
    global df order) prune candidates before the exact-intersection
    verify, and the verify's integer cross-multiplication
    (inter*(num+den) >= num*(sz1+sz2)) keeps the threshold test
    float-free in both engines.

    Complements the two existing near-dup tiers: `q_ngram_jaccard_pairs`
    is brute-force-exact but caps posting df (bounded recall by fiat);
    MinHash-LSH is sub-quadratic but probabilistic.  PPJoin is the classic
    middle path — exact at threshold, sub-quadratic in practice because
    prefixes hold each document's RAREST tokens, so prefix-posting buckets
    are small by construction (a shingle that is globally common lands in
    almost no prefixes; the hotter the token, the less it is indexed —
    the inverse of the naive inverted index's skew problem).

    Scale shape: one postings shuffle (df join keys on shingle), one
    per-doc rank sort, a prefix-postings self-join whose buckets are
    df-small, then a candidates x postings verify join — candidate pairs,
    not corpus pairs, drive the verify cost.  Row counts stay exact at
    every SF (no stride): the prefix filter is the cost bound.
    """
    out, dsh, pref = ppjoin_similar_docs_plan(spark, sf_dir)
    return materialize_releasing(out, dsh, pref)


def ppjoin_similar_docs_plan(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Lazy (result, postings-cache) pair for `q_ppjoin_similar_docs` —
    split out so plan tests can inspect the dataflow that the registered
    query's eager localCheckpoint would otherwise hide.  Returns the lazy
    result plus the persisted intermediates the caller must release."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", word_shingles(F.col("text")).alias("sh")
    )
    dsh = fan_out(docs, "doc_id").persist()
    posts = dsh.select("doc_id", F.explode("sh").alias("sg"))
    dfc = posts.groupBy("sg").agg(F.count("*").alias("df"))
    sizes = dsh.select("doc_id", F.size("sh").alias("sz"))
    from pyspark.sql import Window

    rk = F.row_number().over(
        Window.partitionBy("doc_id").orderBy("df", "sg")
    )
    prefix_len = (
        F.col("sz")
        - F.expr(
            f"(sz * {_PPJ_T_NUM} + {_PPJ_T_DEN - 1}) div {_PPJ_T_DEN}"
        )
        + 1
    )
    # materialization barrier: `pref` feeds BOTH sides of the candidate
    # self-join; without it the df-join + rank-window subtree runs twice.
    pref = (
        posts.join(dfc, "sg")
        .join(sizes, "doc_id")
        .withColumn("rk", rk)
        .filter(F.col("rk") <= prefix_len)
        .select("doc_id", "sg", "sz", "rk")
        .persist()
    )
    # Positional filter (the "PP" of PPJoin): a prefix match on token w at
    # ranks (rk1, rk2) bounds the total overlap by 1 + min(sz1-rk1,
    # sz2-rk2) — only tokens AFTER w in the global (df, sg) order can still
    # be common.  Require that bound to reach the minimum overlap
    # alpha = ceil(t/(1+t) * (sz1+sz2)) (integer form below).  Safe without
    # sequential accumulation because ranks are monotone in the shared
    # global order: the pair's minimal common token has minimal rank in
    # BOTH docs, hence the loosest bound — if no prefix match passes, that
    # minimal common token fails too and the pair cannot reach threshold.
    cand = (
        pref.alias("a")
        .join(pref.alias("b"), "sg")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .filter(
            _PPJ_T_NUM * F.greatest(F.col("a.sz"), F.col("b.sz"))
            <= _PPJ_T_DEN * F.least(F.col("a.sz"), F.col("b.sz"))
        )
        .filter(
            (
                F.least(
                    F.col("a.sz") - F.col("a.rk"),
                    F.col("b.sz") - F.col("b.rk"),
                )
                + 1
            )
            * (_PPJ_T_NUM + _PPJ_T_DEN)
            >= (F.col("a.sz") + F.col("b.sz")) * _PPJ_T_NUM
        )
        .select(
            F.col("a.doc_id").alias("d1"),
            F.col("b.doc_id").alias("d2"),
            F.col("a.sz").alias("sz1"),
            F.col("b.sz").alias("sz2"),
        )
        .distinct()
    )
    # Verify by per-pair set intersection on the shingle arrays (two
    # equi-joins + codegen array_intersect) instead of re-exploding the
    # postings through a join+join+groupBy: the candidate count — not the
    # candidate×shingle fan-out — drives the verify cost (r9 bench
    # 7.7 s → ~4 s at sf0.1).
    verified = (
        cand.join(
            dsh.select(F.col("doc_id").alias("d1"), F.col("sh").alias("sh1")),
            "d1",
        )
        .join(
            dsh.select(F.col("doc_id").alias("d2"), F.col("sh").alias("sh2")),
            "d2",
        )
        .withColumn(
            "n_common",
            F.size(F.array_intersect("sh1", "sh2")).cast("long"),
        )
        .filter(
            F.col("n_common") * (_PPJ_T_NUM + _PPJ_T_DEN)
            >= _PPJ_T_NUM * (F.col("sz1") + F.col("sz2"))
        )
    )
    out = verified.select(
        F.col("d1").alias("doc_id_1"),
        F.col("d2").alias("doc_id_2"),
        F.col("sz1").cast("long").alias("size_1"),
        F.col("sz2").cast("long").alias("size_2"),
        "n_common",
        F.round(
            F.col("n_common")
            * 1.0
            / (F.col("sz1") + F.col("sz2") - F.col("n_common")),
            6,
        ).alias("jaccard"),
    )
    return out, dsh, pref


# ---------------------------------------------------------------------------
# MinHash estimator-error audit ([extension], the q_countmin_estimates
# pattern applied to similarity sketching): for every LSH candidate pair,
# report the MinHash-estimated Jaccard (agreeing components / K) NEXT TO the
# exact shingle-set Jaccard and their signed error — the audit a pipeline
# team runs before trusting a sketch threshold at 100 TB, where the exact
# join is only affordable on the candidate subset the sketch itself surfaces.
def _mh_audit_oracle() -> str:
    return rf"""
    WITH d AS (
      SELECT doc_id, string_split_regex(lower(trim(text, ' ')), '\s+') AS toks
      FROM documents
    ), s AS (
      SELECT doc_id,
             list_distinct(list_transform(generate_series(1, len(toks) - 2),
                            i -> array_to_string(toks[i:i+2], ' '))) AS sh
      FROM d WHERE len(toks) >= 3
    ), {_MH_SIG_CTES}, bands AS (
      SELECT doc_id,
             md5(CAST(i // {_MH_CHECK_ROWS} AS VARCHAR) || ':' ||
                 string_agg(CAST(m AS VARCHAR), ',' ORDER BY i)) AS bucket
      FROM mh GROUP BY doc_id, i // {_MH_CHECK_ROWS}
    ), cand AS (
      SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
      FROM bands a JOIN bands b ON a.bucket = b.bucket AND a.doc_id < b.doc_id
    ), agree AS (
      SELECT c.id1, c.id2,
             SUM(CASE WHEN x.m = y.m THEN 1 ELSE 0 END) AS agr
      FROM cand c
      JOIN mh x ON x.doc_id = c.id1
      JOIN mh y ON y.doc_id = c.id2 AND y.i = x.i
      GROUP BY c.id1, c.id2
    )
    SELECT g.id1 AS doc_id_1, g.id2 AS doc_id_2,
           ROUND(g.agr / {_MH_CHECK_HASHES}.0, 5) AS jaccard_est5,
           ROUND(len(list_intersect(sa.sh, sb.sh)) * 1.0
                 / (len(sa.sh) + len(sb.sh)
                    - len(list_intersect(sa.sh, sb.sh))), 5) AS jaccard5,
           ROUND(g.agr / {_MH_CHECK_HASHES}.0
                 - len(list_intersect(sa.sh, sb.sh)) * 1.0
                   / (len(sa.sh) + len(sb.sh)
                      - len(list_intersect(sa.sh, sb.sh))), 5) AS err5
    FROM agree g
    JOIN s sa ON sa.doc_id = g.id1
    JOIN s sb ON sb.doc_id = g.id2
    """


def minhash_audit_plan(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(audit frame, persisted sig, persisted docs) — un-materialized, so
    plan tests can inspect the physical plan before the localCheckpoint
    erases it; callers must unpersist sig/docs."""
    return _minhash_audit_build(spark, sf_dir)


@register("q_minhash_estimate_error_audit", oracle=_mh_audit_oracle())
def q_minhash_estimate_error_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-candidate-pair MinHash-vs-exact Jaccard audit: estimate =
    agreeing md5-minhash components / {K}, exact = |∩|/|∪| over the shingle
    sets, plus the signed error — every value engine-portable (md5-derived
    hashes, integer set sizes, one IEEE-double expression tree), so the
    whole audit hash-checks against DuckDB.

    Scale shape (100 TB): the signature build is the checked-LSH pipeline
    (one exchange on doc_id for the K min-aggregates, one on bucket for
    the banding self-join); the agreement count is a WIDE-column compare
    (16 equality flags summed in one projection — never an explode to
    K rows per pair); the exact-Jaccard join touches only LSH candidate
    pairs, the same only-verify-candidates discipline as
    `q_neardup_verify_jaccard`.  Output rows = candidate pairs (sketch-
    bounded), not corpus pairs.""".replace("{K}", str(_MH_CHECK_HASHES))
    out, sig, docs = _minhash_audit_build(spark, sf_dir)
    return materialize_releasing(out, sig, docs)


def _minhash_audit_build(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame, DataFrame]:
    docs, sig, cand = _checked_minhash_pipeline(spark, sf_dir)
    a_sig = sig.select(
        F.col("doc_id").alias("doc_id_1"),
        *[F.col(f"_m{i}").alias(f"_a{i}") for i in range(_MH_CHECK_HASHES)],
    )
    b_sig = sig.select(
        F.col("doc_id").alias("doc_id_2"),
        *[F.col(f"_m{i}").alias(f"_b{i}") for i in range(_MH_CHECK_HASHES)],
    )
    agr = sum(
        (F.col(f"_a{i}") == F.col(f"_b{i}")).cast("long")
        for i in range(_MH_CHECK_HASHES)
    )
    paired = (
        cand.join(a_sig, "doc_id_1")
        .join(b_sig, "doc_id_2")
        .select("doc_id_1", "doc_id_2", agr.alias("agr"))
    )
    a_sh = docs.select(
        F.col("doc_id").alias("doc_id_1"), F.col("sh").alias("sh_a")
    )
    b_sh = docs.select(
        F.col("doc_id").alias("doc_id_2"), F.col("sh").alias("sh_b")
    )
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    union = F.size(F.col("sh_a")) + F.size(F.col("sh_b")) - inter
    est = F.col("agr") / F.lit(float(_MH_CHECK_HASHES))
    exact = inter * F.lit(1.0) / union
    out = (
        paired.join(a_sh, "doc_id_1")
        .join(b_sh, "doc_id_2")
        .select(
            "doc_id_1",
            "doc_id_2",
            F.round(est, 5).alias("jaccard_est5"),
            F.round(exact, 5).alias("jaccard5"),
            F.round(est - exact, 5).alias("err5"),
        )
    )
    return out, sig, docs


# ---------------------------------------------------------------------------
# Incremental cross-snapshot exact dedup ([extension]): the ingest-time
# pass every continuously-crawled 100 TB corpus runs — dedup the INCOMING
# batch against itself, then anti-join its content hashes against the
# already-ingested base so only genuinely new documents land.  Snapshot
# split here: even doc_ids are the base corpus, odd doc_ids the incoming
# batch (deterministic, so the whole pass hash-checks).


@register(
    "q_incremental_hash_dedup",
    oracle="""
    WITH keyed AS (
      SELECT doc_id, source, md5(lower(trim(text, ' '))) AS content_hash
      FROM documents
    ), batch AS (
      SELECT content_hash,
             MIN(doc_id) AS keep_doc_id,
             arg_min(source, doc_id) AS source,
             COUNT(*) AS n_batch_dups
      FROM keyed WHERE doc_id % 2 = 1
      GROUP BY content_hash
    )
    SELECT b.content_hash, b.keep_doc_id, b.source, b.n_batch_dups
    FROM batch b
    WHERE NOT EXISTS (
      SELECT 1 FROM keyed k
      WHERE k.doc_id % 2 = 0 AND k.content_hash = b.content_hash
    )
    """,
)
def q_incremental_hash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingest dedup: normalize text (lower+trim), content-hash
    it, first-seen-wins dedup WITHIN the incoming batch (min doc_id per
    hash), then LEFT ANTI join against the base snapshot's hashes — the
    surviving rows are the only documents the ingest appends.

    Scale shape (100 TB): hashes are computed map-side (md5 in
    whole-stage codegen); the batch self-dedup is one hash-partitioned
    aggregate on content_hash with map-side combine, and the anti-join
    reuses the SAME key, so Spark's EnsureRequirements inserts no second
    exchange on the deduped side.  Shuffle payload is (hash, id, source)
    — never the document text.  The base side ships only its hash column
    (column pruning reaches the scan)."""
    keyed = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.md5(F.lower(F.trim(F.col("text")))).alias("content_hash"),
    )
    batch = (
        keyed.filter(F.col("doc_id") % 2 == 1)
        .groupBy("content_hash")
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.min_by("source", "doc_id").alias("source"),
            F.count(F.lit(1)).alias("n_batch_dups"),
        )
    )
    base = keyed.filter(F.col("doc_id") % 2 == 0).select("content_hash")
    return batch.join(base, "content_hash", "left_anti").select(
        "content_hash", "keep_doc_id", "source", "n_batch_dups"
    )


# ---------------------------------------------------------------------------
# Incremental cross-snapshot NEAR-dup ([extension], the near-dup twin of
# q_incremental_hash_dedup): LSH-route the INCOMING batch against the
# already-ingested base and exact-verify only the routed pairs — the
# ingest-time near-dedup a continuously-crawled corpus runs so a lightly
# paraphrased recrawl of an existing page never lands.  Same parity split
# (even doc_ids = base, odd = incoming), same md5 minhash/banding as the
# checked LSH pipeline (shared helpers, so the routing rule cannot drift).


@register(
    "q_incremental_minhash_neardup",
    oracle=rf"""
    WITH d AS (
      SELECT doc_id, string_split_regex(lower(trim(text, ' ')), '\s+') AS toks
      FROM documents
    ), s AS (
      SELECT doc_id,
             list_distinct(list_transform(generate_series(1, len(toks) - 2),
                            i -> array_to_string(toks[i:i+2], ' '))) AS sh
      FROM d WHERE len(toks) >= 3
    ), {_MH_SIG_CTES}, bands AS (
      SELECT doc_id,
             md5(CAST(i // {_MH_CHECK_ROWS} AS VARCHAR) || ':' ||
                 string_agg(CAST(m AS VARCHAR), ',' ORDER BY i)) AS bucket
      FROM mh GROUP BY doc_id, i // {_MH_CHECK_ROWS}
    ), cand AS (
      SELECT DISTINCT a.doc_id AS delta_id, b.doc_id AS base_id
      FROM bands a JOIN bands b ON a.bucket = b.bucket
      WHERE a.doc_id % 2 = 1 AND b.doc_id % 2 = 0
    ), scored AS (
      SELECT c.delta_id, c.base_id,
             len(list_intersect(sa.sh, sb.sh)) AS inter,
             len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))
               AS uni
      FROM cand c
      JOIN s sa ON sa.doc_id = c.delta_id
      JOIN s sb ON sb.doc_id = c.base_id
    ), ranked AS (
      SELECT *,
             ROW_NUMBER() OVER (PARTITION BY delta_id
               ORDER BY ROUND(inter * 1.0 / uni, 5) DESC, base_id) AS rn,
             COUNT(*) OVER (PARTITION BY delta_id) AS n_cand
      FROM scored
    )
    SELECT delta_id AS delta_doc_id,
           CAST(n_cand AS BIGINT) AS n_candidates,
           base_id AS best_match_doc_id,
           ROUND(inter * 1.0 / uni, 5) AS best_jaccard5,
           inter * 2 >= uni AS is_neardup
    FROM ranked WHERE rn = 1
    """,
)
def q_incremental_minhash_neardup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Incremental near-dup screen: for every INCOMING document (odd
    doc_ids) that shares an LSH band bucket with the existing base corpus
    (even doc_ids), report its candidate count, best-matching base
    document by exact shingle Jaccard (id tie-break), and whether it
    crosses the 0.5 near-dup bar — the gate decided with an exact integer
    cross-multiplication (2·|∩| ≥ |∪|), no floating point.

    Scale shape (100 TB ingest): the base corpus signature/bucket side is
    the persisted index a production pipeline maintains incrementally
    (here rebuilt per run — the build is the same one exchange as the
    checked LSH pipeline); the bucket join touches only buckets the DELTA
    occupies, so routing work scales with the incoming batch, not the
    corpus, and exact verification runs on routed pairs only.  The
    per-delta best-match window partitions by delta doc (bounded by its
    candidate count — never corpus-wide)."""
    docs, sig, _ = _checked_minhash_pipeline(spark, sf_dir)
    bk = _mh_band_buckets(sig)
    cand = (
        bk.filter(F.col("doc_id") % 2 == 1)
        .select(F.col("doc_id").alias("delta_id"), "bucket")
        .join(
            bk.filter(F.col("doc_id") % 2 == 0).select(
                F.col("doc_id").alias("base_id"), "bucket"
            ),
            "bucket",
        )
        .select("delta_id", "base_id")
        .distinct()
    )
    a_sh = docs.select(F.col("doc_id").alias("delta_id"), F.col("sh").alias("sh_a"))
    b_sh = docs.select(F.col("doc_id").alias("base_id"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    uni = F.size(F.col("sh_a")) + F.size(F.col("sh_b")) - inter
    scored = (
        cand.join(a_sh, "delta_id")
        .join(b_sh, "base_id")
        .select(
            "delta_id",
            "base_id",
            inter.alias("inter"),
            uni.alias("uni"),
        )
    )
    w = Window.partitionBy("delta_id")
    ranked = scored.select(
        "*",
        F.row_number()
        .over(
            w.orderBy(
                F.desc(F.round(F.col("inter") * 1.0 / F.col("uni"), 5)),
                F.asc("base_id"),
            )
        )
        .alias("rn"),
        F.count(F.lit(1)).over(w).alias("n_cand"),
    )
    out = ranked.filter(F.col("rn") == 1).select(
        F.col("delta_id").alias("delta_doc_id"),
        F.col("n_cand").cast("long").alias("n_candidates"),
        F.col("base_id").alias("best_match_doc_id"),
        F.round(F.col("inter") * 1.0 / F.col("uni"), 5).alias("best_jaccard5"),
        (F.col("inter") * 2 >= F.col("uni")).alias("is_neardup"),
    )
    return materialize_releasing(out, sig, docs)


@register(
    "q_dup_cluster_histogram",
    oracle=r"""
    WITH fp AS (
      SELECT regexp_replace(lower(trim(text, ' ')), '\s+', ' ', 'g') AS f
      FROM documents
    ), dcl AS (
      SELECT f, COUNT(*) AS sz FROM fp GROUP BY f
    ), d AS (
      SELECT doc_id, string_split_regex(lower(trim(text, ' ')), '\s+') AS toks
      FROM documents
    ), ch AS (
      SELECT unnest(list_transform(
               generate_series(0, CAST(ceil(len(toks) / 10.0) AS INT) - 1),
               i -> array_to_string(toks[i*10+1 : i*10+10], ' '))) AS chunk
      FROM d
    ), lcl AS (
      SELECT chunk, COUNT(*) AS sz FROM ch GROUP BY chunk
    )
    SELECT 'document' AS granularity,
           CAST(sz AS BIGINT) AS cluster_size,
           COUNT(*) AS n_clusters,
           CAST(sz * COUNT(*) AS BIGINT) AS n_members,
           CAST((sz - 1) * COUNT(*) AS BIGINT) AS n_removable
    FROM dcl GROUP BY sz
    UNION ALL
    SELECT 'line' AS granularity,
           CAST(sz AS BIGINT) AS cluster_size,
           COUNT(*) AS n_clusters,
           CAST(sz * COUNT(*) AS BIGINT) AS n_members,
           CAST((sz - 1) * COUNT(*) AS BIGINT) AS n_removable
    FROM lcl GROUP BY sz
    """,
)
def q_dup_cluster_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster size distribution at BOTH dedup granularities —
    the audit read BEFORE choosing a dedup strategy: whole-document
    content clusters (would exact dedup help?) and C4-style 10-token line
    clusters (is the duplication boilerplate shared across otherwise
    distinct documents?).  Answers "is the corpus 2×-duplicated or is one
    fragment repeated a million times", which the dedup outputs
    themselves cannot; the n_removable column is each strategy's exact
    keep-one removal count.

    Scale shape: two fingerprint-shuffle aggregates with map-side combine
    (uniform keys — sha256 / line text), each followed by a second
    aggregate over |distinct clusters| rows grouped by size (few distinct
    sizes).  Nothing but counts moves after the first exchanges."""
    docs = load_table(spark, sf_dir, "documents")
    dcl = docs.groupBy(fingerprint(F.col("text")).alias("f")).agg(
        F.count("*").alias("sz")
    )
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    n_chunks = F.ceil(F.size(toks) / F.lit(10.0)).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.concat_ws(" ", F.slice(toks, i * 10 + 1, 10)),
    )
    lcl = (
        fan_out(docs, "doc_id")
        .select(F.explode(chunks).alias("chunk"))
        .groupBy("chunk")
        .agg(F.count("*").alias("sz"))
    )

    def hist(cl: DataFrame, tag: str) -> DataFrame:
        return cl.groupBy("sz").agg(
            F.count("*").alias("n_clusters"),
            (F.col("sz") * F.count("*")).cast("long").alias("n_members"),
            ((F.col("sz") - 1) * F.count("*"))
            .cast("long")
            .alias("n_removable"),
        ).select(
            F.lit(tag).alias("granularity"),
            F.col("sz").cast("long").alias("cluster_size"),
            "n_clusters",
            "n_members",
            "n_removable",
        )

    return hist(dcl, "document").unionByName(hist(lcl, "line"))


# containment flag threshold: the smaller document must share this fraction
# of ITS shingles with the larger to count as (near-)contained — the quote/
# excerpt regime symmetric Jaccard under-scores (a 50-shingle doc inside a
# 5000-shingle doc has C = 1.0 but J ≈ 0.01)
_CONTAIN_MIN = 0.8


@register(
    "q_containment_pairs",
    oracle=rf"""
    WITH st AS (
      SELECT (COUNT(*) + {_JACCARD_EXACT_MAX_DOCS} - 1)
             // {_JACCARD_EXACT_MAX_DOCS} AS stride
      FROM documents
    ), d AS (
      SELECT doc_id, string_split_regex(lower(trim(text, ' ')), '\s+') AS toks
      FROM documents, st WHERE doc_id % st.stride = 0
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
    ), pairs AS (
      SELECT a.doc_id AS id1, b.doc_id AS id2,
             len(list_intersect(a.sh, b.sh)) AS inter,
             len(a.sh) AS sz1, len(b.sh) AS sz2
      FROM ks a JOIN ks b ON a.doc_id < b.doc_id
      WHERE len(list_intersect(a.sh, b.sh)) > 0
    )
    SELECT CASE WHEN sz1 < sz2 OR (sz1 = sz2 AND id1 < id2)
                THEN id1 ELSE id2 END AS contained_doc,
           CASE WHEN sz1 < sz2 OR (sz1 = sz2 AND id1 < id2)
                THEN id2 ELSE id1 END AS container_doc,
           ROUND(inter * 1.0 / LEAST(sz1, sz2), 4) AS containment,
           ROUND(inter * 1.0 / (sz1 + sz2 - inter), 4) AS jaccard
    FROM pairs
    WHERE inter * 1.0 / LEAST(sz1, sz2) >= {_CONTAIN_MIN}
    """,
)
def q_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric shingle CONTAINMENT pairs (Broder 1997's containment
    measure, the companion to resemblance — public method): C(A→B) =
    |A∩B| / |A| for the smaller shingle set A.  This is the quote /
    excerpt / boilerplate-inclusion detector every dedup pipeline needs
    BESIDE Jaccard: a short doc fully embedded in a long one scores
    C = 1.0 but a Jaccard so low every resemblance threshold misses it.
    Emits (contained_doc, container_doc, containment, jaccard) for pairs
    with C ≥ {_CONTAIN_MIN}; the contained side is the smaller filtered
    set (ties break on doc_id), so the direction is deterministic.

    Dataflow is the exact-Jaccard inverted index verbatim (postings
    equi-join, df ≤ {_JACCARD_DF_CAP} boilerplate cap, SF-aware doc_id
    stride mirrored in the oracle) — only the final measure and its
    threshold differ, so the 100 TB shape is already proven: work is
    Σ_s min(df(s), cap)², never corpus-pairs."""
    stride = (
        load_table(spark, sf_dir, "documents")
        .agg(
            F.floor(
                (F.count("*") + (_JACCARD_EXACT_MAX_DOCS - 1))
                / _JACCARD_EXACT_MAX_DOCS
            )
            .cast("long")
            .alias("_stride")
        )
    )
    sampled = (
        load_table(spark, sf_dir, "documents")
        .crossJoin(F.broadcast(stride))
        .filter(F.col("doc_id") % F.col("_stride") == 0)
        .drop("_stride")
    )
    docs = hashed_shingle_docs(spark, sf_dir, sampled)
    posts = docs.select("doc_id", F.explode("sh").alias("s"))
    occ = drop_oversized_groups(posts, "s", _JACCARD_DF_CAP).persist()
    sizes = occ.groupBy("doc_id").agg(F.count("*").alias("sz"))
    pairs = (
        occ.alias("a")
        .join(occ.alias("b"), "s")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("id1"),
            F.col("b.doc_id").alias("id2"),
        )
        .agg(F.count("*").alias("inter"))
        .join(
            sizes.select(F.col("doc_id").alias("id1"), F.col("sz").alias("sz1")),
            "id1",
        )
        .join(
            sizes.select(F.col("doc_id").alias("id2"), F.col("sz").alias("sz2")),
            "id2",
        )
    )
    small_first = (F.col("sz1") < F.col("sz2")) | (
        (F.col("sz1") == F.col("sz2")) & (F.col("id1") < F.col("id2"))
    )
    cont = F.col("inter") * 1.0 / F.least(F.col("sz1"), F.col("sz2"))
    jac = F.col("inter") * 1.0 / (
        F.col("sz1") + F.col("sz2") - F.col("inter")
    )
    out = (
        pairs.filter(cont >= _CONTAIN_MIN)
        .select(
            F.when(small_first, F.col("id1")).otherwise(F.col("id2")).alias(
                "contained_doc"
            ),
            F.when(small_first, F.col("id2")).otherwise(F.col("id1")).alias(
                "container_doc"
            ),
            F.round(cont, 4).alias("containment"),
            F.round(jac, 4).alias("jaccard"),
        )
    )
    return materialize_releasing(out, occ)
