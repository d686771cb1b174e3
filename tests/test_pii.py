"""Referee + plan pins for the PII redaction operator (tier-2 on top of
the DuckDB oracle): a pure-Python ``re`` recompute of the injection +
detect + redact pipeline, and a plan-shape assertion (single scan, one
low-cardinality exchange, zero Python eval nodes)."""

from __future__ import annotations

import re
from collections import defaultdict

from changesetmd_spark.operators.pii import _EMAIL, _IPV4, _PHONE
from changesetmd_spark.tables import load_table


def _inject(doc_id: int, text: str) -> str:
    out = text
    if doc_id % 7 == 0:
        out += f" contact user{doc_id}@example.com"
    if doc_id % 11 == 0:
        out += f" call 555-{doc_id % 1000:03d}-{doc_id % 10000:04d}"
    if doc_id % 13 == 0:
        out += (
            f" host 10.{doc_id % 256}.{(doc_id // 256) % 256}"
            f".{doc_id % 250 + 1}"
        )
    return out


def test_pii_redaction_matches_python(spark, sf_dir):
    from changesetmd_spark.operators.pii import q_pii_redaction_stats

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "source", "text")
        .collect()
    )
    exp = defaultdict(
        lambda: {
            "n_docs": 0,
            "docs_with_pii": 0,
            "n_emails": 0,
            "n_phones": 0,
            "n_ips": 0,
            "chars_in": 0,
            "chars_out": 0,
        }
    )
    for r in docs:
        aug = _inject(r.doc_id, r.text)
        ne = len(re.findall(_EMAIL, aug))
        np_ = len(re.findall(_PHONE, aug))
        ni = len(re.findall(_IPV4, aug))
        red = re.sub(_EMAIL, "[EMAIL]", aug)
        red = re.sub(_PHONE, "[PHONE]", red)
        red = re.sub(_IPV4, "[IP]", red)
        e = exp[r.source]
        e["n_docs"] += 1
        e["docs_with_pii"] += 1 if ne + np_ + ni > 0 else 0
        e["n_emails"] += ne
        e["n_phones"] += np_
        e["n_ips"] += ni
        e["chars_in"] += len(aug)
        e["chars_out"] += len(red)

    got = {r.source: r for r in q_pii_redaction_stats(spark, sf_dir).collect()}
    assert set(got) == set(exp)
    total_pii = 0
    for src, e in exp.items():
        g = got[src]
        for k, v in e.items():
            assert getattr(g, k) == v, (src, k, v, getattr(g, k))
        total_pii += e["n_emails"] + e["n_phones"] + e["n_ips"]
    # the injection fixture must actually exercise every entity type
    assert total_pii > 0
    assert sum(e["n_emails"] for e in exp.values()) > 0
    assert sum(e["n_phones"] for e in exp.values()) > 0
    assert sum(e["n_ips"] for e in exp.values()) > 0


def test_pii_redaction_plan_shape(spark, sf_dir):
    from changesetmd_spark.operators.pii import q_pii_redaction_stats

    df = q_pii_redaction_stats(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert plan.count("Scan parquet") == 1, plan
