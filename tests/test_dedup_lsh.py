"""MinHash-LSH recall test (SURVEY.md §2.11 E2): the sub-quadratic LSH path
must recover the near-dup pairs the brute-force word-shingle Jaccard finds.
With 32 bands × 2 rows, P(candidate | J) = 1-(1-J²)³² ≈ 0.9999 at J=0.5 —
assert full recovery of J≥0.7 and that everything LSH reports is
exact-verified (precision = 1 by construction)."""

from __future__ import annotations

from pyspark.sql import functions as F

from changesetmd_spark import registry
from changesetmd_spark.operators.dedup import minhash_signatures, word_shingles
from changesetmd_spark.tables import load_table


def _brute_force_pairs(spark, sf_dir, threshold):
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", word_shingles(F.col("text")).alias("sh")
    )
    a = docs.select(F.col("doc_id").alias("d1"), F.col("sh").alias("sh1"))
    b = docs.select(F.col("doc_id").alias("d2"), F.col("sh").alias("sh2"))
    inter = F.size(F.array_intersect("sh1", "sh2"))
    union = F.size("sh1") + F.size("sh2") - inter
    jac = inter * 1.0 / union
    return {
        (r.d1, r.d2)
        for r in a.join(F.broadcast(b), F.col("d1") < F.col("d2"))
        .filter(jac >= threshold)
        .select("d1", "d2")
        .collect()
    }


def test_lsh_recovers_high_jaccard_pairs(spark, sf_dir):
    lsh = {
        (r.doc_id_1, r.doc_id_2)
        for r in registry.queries()["q_minhash_lsh_candidates"](spark, sf_dir).collect()
    }
    # precision: every LSH pair is exact-verified >= 0.5 by construction,
    # so LSH ⊆ brute-force(0.5)
    assert lsh <= _brute_force_pairs(spark, sf_dir, 0.5)
    # recall: every pair well above threshold must be found
    assert _brute_force_pairs(spark, sf_dir, 0.7) <= lsh


def test_simhash_banding_equals_all_pairs(spark, sf_dir):
    """The banded candidate generation is pigeonhole-EXACT for d ≤ 8 (9
    disjoint bands; ≤ 8 differing bits dirty ≤ 8 of them), so it must return
    precisely the pairs a brute-force all-pairs Hamming scan returns — and
    without a BroadcastNestedLoopJoin anywhere in its plan."""
    from changesetmd_spark.operators.dedup import simhash64, simhash_band_pairs
    from changesetmd_spark.plans.inspect import explain_str

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        simhash64(F.regexp_extract_all(F.col("text"), F.lit(r"\S+"), 0)).alias(
            "sim"
        ),
    )
    banded = simhash_band_pairs(docs, max_distance=8)
    assert "BroadcastNestedLoopJoin" not in explain_str(banded)
    got = {(r.doc_id_1, r.doc_id_2, r.hamming) for r in banded.collect()}

    a = docs.select(F.col("doc_id").alias("d1"), F.col("sim").alias("s1"))
    b = docs.select(F.col("doc_id").alias("d2"), F.col("sim").alias("s2"))
    ham = F.bit_count(F.col("s1").bitwiseXOR(F.col("s2")))
    want = {
        (r.d1, r.d2, r.h)
        for r in a.join(F.broadcast(b), F.col("d1") < F.col("d2"))
        .select("d1", "d2", ham.alias("h"))
        .filter(F.col("h") <= 8)
        .collect()
    }
    assert got == want


def test_simhash_frame_equals_expression(spark, sf_dir):
    """The r17 flat-aggregate signature builder (simhash64_signatures:
    explode → 64 codegen vote sums) must produce bit-identical fingerprints
    to the original per-row expression form (simhash64: 64 interpreted
    F.aggregate folds) — including token-less documents, which must keep
    the all-zero signature rather than vanish in the explode."""
    from changesetmd_spark.operators.dedup import (
        simhash64,
        simhash64_signatures,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    # plant the degenerate shapes alongside the real corpus
    extra = spark.createDataFrame(
        [(10_000_001, ""), (10_000_002, "   "), (10_000_003, None)],
        "doc_id long, text string",
    )
    docs = docs.unionByName(extra)
    toks = F.regexp_extract_all(F.col("text"), F.lit(r"\S+"), 0)
    want = {
        r.doc_id: r.sim
        for r in docs.select("doc_id", simhash64(toks).alias("sim")).collect()
    }
    got = {
        r.doc_id: r.sim
        for r in simhash64_signatures(docs, "doc_id", toks).collect()
    }
    # expression form maps NULL/empty token arrays to 0; frame form must too
    assert want[10_000_001] == want[10_000_002] == want[10_000_003] == 0
    assert got == want


def test_minhash_signature_properties(spark):
    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog tonight"),
            (2, "the quick brown fox jumps over the lazy dog tonight"),
            (3, "completely different words entirely unrelated content here now"),
            (4, ""),
        ],
        "doc_id long, text string",
    )
    sigs = {
        r.doc_id: r.sig
        for r in minhash_signatures(
            df.select("doc_id", word_shingles(F.col("text")).alias("sh"))
        ).collect()
    }
    assert sigs[1] == sigs[2]  # identical text -> identical signature
    assert sigs[1] != sigs[3]
    assert len(sigs[1]) == 64
    assert len(sigs[4]) == 64  # empty text -> sentinel signature, not a crash
