"""Central query registry backing ``__spark_entry__.queries()`` /
``oracle_sql()``.

Every operator from SURVEY.md §2 lands here as a named builder
``(spark, sf_dir) -> DataFrame`` plus (when SQL-expressible) a DuckDB oracle
string over the pre-registered views.  The driver hash-compares the two at
sf0.01, so builders must be **value-deterministic**: exact decimal aggregation
for money columns, explicit rounding for derived doubles, timestamps emitted
as formatted strings, deterministic tie-breaks before any LIMIT.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a query builder and its optional DuckDB oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def _load_all() -> None:
    # import for registration side effects; keep cheap (no Spark work at import)
    from .operators import (  # noqa: F401
        changesets,
        corpus,
        curation,
        dedup,
        geometry,
        multimodal,
        rangejoin,
        relational,
        similarity,
        sketches,
        skew,
        tags_json,
        text,
        txn,
        windows_batch,
    )
    from .streaming import events_stream, joins, rollup, stateful  # noqa: F401


def queries() -> dict[str, QueryFn]:
    _load_all()
    return dict(_QUERIES)


def oracles() -> dict[str, str]:
    _load_all()
    return dict(_ORACLES)
