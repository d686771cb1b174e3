"""Oracle-differential test for every registered query (SURVEY §5.1).

This is the local twin of the driver's CORRECTNESS gate: each
``queries()`` entry with an ``oracle_sql()`` counterpart must match DuckDB
exactly; entries without an oracle must at least run and return a stable
schema.
"""

from __future__ import annotations

import pytest

from changesetmd_spark import registry

from .oracle import compare_to_oracle

ALL_QUERIES = registry.queries()
ORACLES = registry.oracles()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, sf_dir, name):
    df = ALL_QUERIES[name](spark, sf_dir)
    compare_to_oracle(df, ORACLES[name], sf_dir)


@pytest.mark.parametrize("name", sorted(set(ALL_QUERIES) - set(ORACLES)))
def test_rows_only_query_runs(spark, sf_dir, name):
    df = ALL_QUERIES[name](spark, sf_dir)
    assert df.columns  # stable schema
    assert df.count() >= 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())


def test_repetition_wire_optimal_arm_matches_oracle(spark, sf_dir):
    """VERDICT r12 #3: the shipped plan-(c) arm (one raw-text exchange,
    map-side-combined aggregations) must hash against the SAME oracle as
    the default arm — the switch changes the physical shape only."""
    key = "spark.changesetmd.repetition.wireOptimal"
    try:
        spark.conf.set(key, "true")
        df = ALL_QUERIES["q_text_repetition_quality"](spark, sf_dir)
        compare_to_oracle(df, ORACLES["q_text_repetition_quality"], sf_dir)
    finally:
        spark.conf.unset(key)
