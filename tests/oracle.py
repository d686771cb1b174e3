"""Local mirror of the driver's DuckDB-oracle comparison.

Stricter than the driver on purpose:

1. exact value equality (after sorting columns by name and rows by value) —
   if our Spark results and the DuckDB oracle differ in any bit of any cell,
   we want to see it locally before the driver's hash does.
2. canonical *type* equality — the driver's order-insensitive value hash is
   type-sensitive (round 1: DuckDB ``SUM(int)`` returns HUGEINT which lands
   in pandas as float64, so value-identical results still hash-mismatched
   against Spark's BIGINT).  We map both engines' output schemas onto a
   canonical type string and require exact agreement, so that class of bug
   fails locally.
"""

from __future__ import annotations

import math
import os
from typing import Any

import duckdb

from changesetmd_spark.tables import TABLES

_EXACT = object()


def _connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def run_oracle(sql: str, sf_dir: str) -> tuple[list[str], list[tuple]]:
    cur = _connect(sf_dir).execute(sql)
    cols = [d[0] for d in cur.description]
    return cols, cur.fetchall()


# --- canonical type mapping -------------------------------------------------
#
# Integer widths are collapsed (int32 vs int64 both stringify identically in
# the driver's hash); everything that changes a cell's *textual/pandas*
# representation stays distinct: float vs int vs decimal, timestamp, date,
# string, binary, bool, nested types.


def _canon_arrow(t) -> str:
    import pyarrow as pa

    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_decimal(t):
        return f"decimal({t.precision},{t.scale})"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{_canon_arrow(t.value_type)}>"
    if pa.types.is_map(t):
        return f"map<{_canon_arrow(t.key_type)},{_canon_arrow(t.item_type)}>"
    if pa.types.is_struct(t):
        inner = ",".join(
            f"{f.name}:{_canon_arrow(f.type)}" for f in t
        )
        return f"struct<{inner}>"
    return str(t)


def _canon_spark(t) -> str:
    from pyspark.sql import types as T

    if isinstance(t, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "int"
    if isinstance(t, (T.FloatType, T.DoubleType)):
        return "float"
    if isinstance(t, T.DecimalType):
        return f"decimal({t.precision},{t.scale})"
    if isinstance(t, T.BooleanType):
        return "bool"
    if isinstance(t, T.StringType):
        return "string"
    if isinstance(t, T.BinaryType):
        return "binary"
    if isinstance(t, (T.TimestampType, T.TimestampNTZType)):
        return "timestamp"
    if isinstance(t, T.DateType):
        return "date"
    if isinstance(t, T.ArrayType):
        return f"list<{_canon_spark(t.elementType)}>"
    if isinstance(t, T.MapType):
        return f"map<{_canon_spark(t.keyType)},{_canon_spark(t.valueType)}>"
    if isinstance(t, T.StructType):
        inner = ",".join(
            f"{f.name}:{_canon_spark(f.dataType)}" for f in t.fields
        )
        return f"struct<{inner}>"
    return t.simpleString()


def oracle_canonical_types(sql: str, sf_dir: str) -> dict[str, str]:
    tbl = _connect(sf_dir).execute(sql).arrow()
    return {f.name: _canon_arrow(f.type) for f in tbl.schema}


def spark_canonical_types(spark_df) -> dict[str, str]:
    return {f.name: _canon_spark(f.dataType) for f in spark_df.schema.fields}


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
    s_types = spark_canonical_types(spark_df)
    o_types = oracle_canonical_types(sql, sf_dir)
    type_diffs = {
        c: (s_types[c], o_types[c])
        for c in s_types
        if s_types[c] != o_types.get(c)
    }
    assert not type_diffs, (
        "canonical type mismatch (spark, oracle) — the driver's value hash "
        f"is type-sensitive: {type_diffs}"
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
