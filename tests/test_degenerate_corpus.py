"""Degenerate-corpus oracle sweep (VERDICT r15 next-round #1).

Every oracle-backed query whose SQL touches the ``documents`` or
``embeddings`` tables (plus the events-props map family — the "empty tag
map" class) is re-run against the adversarial fixture corpus built by
``tests/degen_corpus.py`` and compared to its DuckDB oracle with the exact
driver-mirror harness.  A divergence here is a LATENT correctness bug the
driver's clean testdata can never surface — the r14
``q_length_bucket_packing`` empty-doc divergence is the proven instance of
the class.
"""

from __future__ import annotations

import re

import pytest

from changesetmd_spark import registry

from .degen_corpus import build_degen_dir
from .oracle import compare_to_oracle

ALL_QUERIES = registry.queries()
ORACLES = registry.oracles()

# the events-props map family: their oracles reference events, but the
# degenerate class they must survive is the empty/blank props map
_MAP_FAMILY = [
    name
    for name, sql in ORACLES.items()
    if re.search(r"\bprops\b", sql)
]

SWEEP = sorted(
    {
        name
        for name, sql in ORACLES.items()
        if re.search(r"\b(documents|embeddings)\b", sql)
    }
    | set(_MAP_FAMILY)
)


@pytest.fixture(scope="session")
def degen_dir() -> str:
    return build_degen_dir()


def test_sweep_is_substantial():
    """The sweep must cover the text/embedding surface, not a token few —
    guards against the selection regex silently rotting."""
    assert len(SWEEP) >= 60, sorted(SWEEP)


@pytest.mark.parametrize("name", SWEEP)
def test_degenerate_matches_oracle(spark, degen_dir, name):
    df = ALL_QUERIES[name](spark, degen_dir)
    compare_to_oracle(df, ORACLES[name], degen_dir)
