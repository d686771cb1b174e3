"""Local mirror of the driver's DuckDB-oracle comparison.

Stricter than the driver on purpose: exact value equality (after sorting
columns by name and rows by value) — if our Spark results and the DuckDB
oracle differ in any bit of any cell, we want to see it locally before the
driver's hash does.
"""

from __future__ import annotations

import math
import os
from typing import Any

import duckdb

from changesetmd_spark.tables import TABLES

_EXACT = object()


def run_oracle(sql: str, sf_dir: str) -> tuple[list[str], list[tuple]]:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    return cols, cur.fetchall()


def _norm_cell(v: Any) -> Any:
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if hasattr(v, "isoformat"):  # datetime/date
        return v.isoformat()
    from decimal import Decimal

    if isinstance(v, Decimal):
        return float(v)
    return v


def _normalize(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


def compare_to_oracle(spark_df, sql: str, sf_dir: str) -> None:
    spark_rows = [tuple(r) for r in spark_df.collect()]
    spark_cols = spark_df.columns
    o_cols, o_rows = run_oracle(sql, sf_dir)

    assert sorted(spark_cols) == sorted(o_cols), (
        f"column mismatch: spark={sorted(spark_cols)} oracle={sorted(o_cols)}"
    )
    assert len(spark_rows) == len(o_rows), (
        f"row count mismatch: spark={len(spark_rows)} oracle={len(o_rows)}"
    )
    s = _normalize(spark_cols, spark_rows)
    o = _normalize(o_cols, o_rows)
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s, o)) if a != b
    ]
    assert not mismatches, (
        f"{len(mismatches)} value mismatches; first 5: {mismatches[:5]}"
    )
