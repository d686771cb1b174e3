"""Corpus-curation operators: PII redaction (library fn — the driver corpus
has no PII-shaped spans, so this is pinned on synthetic literals), plus
plan shape of the decontamination join (benchmark side must broadcast)."""

from __future__ import annotations

from pyspark.sql import functions as F

from changesetmd_spark.operators.curation import redact_pii


def test_redact_pii_literals(spark):
    rows = [
        ("contact bob@example.com or +1 (555) 123-4567 today",),
        ("no pii here",),
        ("a.b+tag@sub.domain.org wrote 555.867.5309",),
    ]
    df = spark.createDataFrame(rows, "text string")
    out = [r[0] for r in df.select(redact_pii(F.col("text"))).collect()]
    assert out[0] == "contact [EMAIL] or [PHONE] today"
    assert out[1] == "no pii here"
    assert out[2] == "[EMAIL] wrote [PHONE]"


def test_contamination_broadcasts_benchmark(spark, sf_dir):
    from changesetmd_spark import registry

    df = registry.queries()["q_contamination_ngram_overlap"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert df.count() > 0  # non-vacuous on the driver corpus
