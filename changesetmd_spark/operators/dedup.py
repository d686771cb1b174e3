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

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load_table
from .text import fingerprint

# universal-hash parameters for minhash permutations: h_i(x) = (a_i*x + b_i) mod P
_MERSENNE_P = (1 << 61) - 1
_N_MINHASH = 64
_LSH_BANDS = 16  # 16 bands x 4 rows
_LSH_ROWS = _N_MINHASH // _LSH_BANDS


def char_shingles(text: Column, k: int = 3) -> Column:
    """Distinct character k-grams; empty array for too-short texts."""
    n = F.length(text)
    seq = F.sequence(F.lit(1), n - (k - 1))
    grams = F.transform(seq, lambda i: text.substr(i, F.lit(k)))
    return F.when(n >= k, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


@register(
    "q_dedup_exact",
    oracle=r"""
    SELECT doc_id, lang, n_chars
    FROM (
      SELECT doc_id, lang, n_chars,
             ROW_NUMBER() OVER (
               PARTITION BY regexp_replace(lower(trim(text)), '\s+', ' ', 'g')
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
           COUNT(DISTINCT regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))
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


@register(
    "q_ngram_jaccard_pairs",
    oracle=r"""
    WITH d AS (
      SELECT doc_id, text FROM documents WHERE doc_id % 5 = 0
    ), s AS (
      SELECT doc_id,
             list_distinct(list_transform(generate_series(1, len(text) - 2),
                                          i -> substr(text, i, 3))) AS sh
      FROM d
    )
    SELECT a.doc_id AS doc_id_1,
           b.doc_id AS doc_id_2,
           ROUND(len(list_intersect(a.sh, b.sh)) * 1.0
                 / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 4)
             AS jaccard
    FROM s a JOIN s b ON a.doc_id < b.doc_id
    WHERE len(list_intersect(a.sh, b.sh)) * 1.0
          / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.62
    """,
)
def q_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard near-dup pairs on a deterministic candidate
    subset (doc_id % 5 = 0 keeps the oracle's O(n²) tractable)."""
    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 5 == 0)
        .select("doc_id", char_shingles(F.col("text")).alias("sh"))
    )
    a = docs.select(F.col("doc_id").alias("doc_id_1"), F.col("sh").alias("sh1"))
    b = docs.select(F.col("doc_id").alias("doc_id_2"), F.col("sh").alias("sh2"))
    inter = F.size(F.array_intersect(F.col("sh1"), F.col("sh2")))
    union = F.size(F.col("sh1")) + F.size(F.col("sh2")) - inter
    jac = inter * 1.0 / union
    return (
        a.join(F.broadcast(b), F.col("doc_id_1") < F.col("doc_id_2"))
        .withColumn("jaccard", F.round(jac, 4))
        .filter(jac >= 0.62)
        .select("doc_id_1", "doc_id_2", "jaccard")
    )


def minhash_signature(shingles: Column, n_hashes: int = _N_MINHASH) -> Column:
    """K minhash values per document, entirely JVM-side.

    h_i(s) = (a_i * h31(s) + b_i) mod (2^61-1) with h31 = xxhash64 folded to
    31 bits so the multiply never overflows int64 (Spark 4 runs ANSI mode —
    overflow would throw, not wrap).  Deterministic fixed seeds; returns
    array<long> of length K (empty shingle sets yield the max sentinel)."""
    params = F.array(
        *[
            F.struct(
                F.lit(2 * i + 1).alias("a"),
                F.lit(7919 * (i + 1)).alias("b"),
            )
            for i in range(n_hashes)
        ]
    )
    base = F.transform(shingles, lambda s: F.pmod(F.xxhash64(s), F.lit(2147483647)))
    return F.transform(
        params,
        lambda p: F.coalesce(
            F.array_min(
                F.transform(
                    base, lambda h: F.pmod(p["a"] * h + p["b"], F.lit(_MERSENNE_P))
                )
            ),
            F.lit(_MERSENNE_P),
        ),
    )


@register("q_minhash_lsh_candidates")  # no oracle: xxhash64 is Spark-specific
def q_minhash_lsh_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup candidates, verified by exact Jaccard.

    Pipeline: shingle → 64 minhashes → 16 bands of 4 → explode bands →
    self-join on (band_idx, band_signature) → distinct candidate pairs →
    exact-Jaccard verify ≥ 0.5.  At scale, the band join replaces the O(n²)
    cross join: only colliding buckets meet."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", char_shingles(F.col("text")).alias("sh")
    )
    sig = docs.withColumn("sig", minhash_signature(F.col("sh")))
    bands = sig.select(
        "doc_id",
        "sh",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(_LSH_BANDS - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.slice(
                        F.col("sig"), b * _LSH_ROWS + 1, _LSH_ROWS
                    ).alias("band_sig"),
                ),
            )
        ).alias("bb"),
    ).select("doc_id", "sh", F.col("bb.band").alias("band"), F.col("bb.band_sig").alias("band_sig"))
    left = bands.select(
        F.col("doc_id").alias("doc_id_1"), F.col("sh").alias("sh1"), "band", "band_sig"
    )
    right = bands.select(
        F.col("doc_id").alias("doc_id_2"), F.col("sh").alias("sh2"), "band", "band_sig"
    )
    cands = (
        left.join(right, ["band", "band_sig"])
        .filter(F.col("doc_id_1") < F.col("doc_id_2"))
        .select("doc_id_1", "doc_id_2", "sh1", "sh2")
        .dropDuplicates(["doc_id_1", "doc_id_2"])
    )
    inter = F.size(F.array_intersect(F.col("sh1"), F.col("sh2")))
    union = F.size(F.col("sh1")) + F.size(F.col("sh2")) - inter
    return (
        cands.withColumn("jaccard", F.round(inter * 1.0 / union, 4))
        .filter(F.col("jaccard") >= 0.5)
        .select("doc_id_1", "doc_id_2", "jaccard")
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


@register("q_simhash_near_dup")  # no oracle: xxhash64 is Spark-specific
def q_simhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs at Hamming distance <= 8, candidate-limited by
    banding the 64-bit signature into 4x16-bit keys (a pair within distance 8
    shares at least one exact 16-bit band only heuristically; for the bounded
    candidate set here we join on doc_id % 5 like the Jaccard oracle)."""
    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 5 == 0)
        .select(
            "doc_id",
            simhash64(
                F.regexp_extract_all(F.col("text"), F.lit(r"\S+"), 0)
            ).alias("sim"),
        )
    )
    a = docs.select(F.col("doc_id").alias("doc_id_1"), F.col("sim").alias("sim1"))
    b = docs.select(F.col("doc_id").alias("doc_id_2"), F.col("sim").alias("sim2"))
    hamming = F.bit_count(F.col("sim1").bitwiseXOR(F.col("sim2")))
    return (
        a.join(F.broadcast(b), F.col("doc_id_1") < F.col("doc_id_2"))
        .withColumn("hamming", hamming)
        .filter(F.col("hamming") <= 8)
        .select("doc_id_1", "doc_id_2", "hamming")
    )
