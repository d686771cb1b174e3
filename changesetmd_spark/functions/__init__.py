"""Scalar helpers shared by operators.

These exist to make query results **bit-deterministic across engines** so the
driver's DuckDB value-hash comparison passes:

* money math is done in DECIMAL (exact, associative) and only cast to double
  at the end — a double SUM over a shuffled dataset is order-dependent and
  would hash-differently run to run;
* timestamps are emitted as formatted UTC strings (the reference's columns are
  ``timestamp without time zone``, ref queries.py:10,15,25);
* derived doubles are rounded explicitly at a fixed scale in both engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# exact money type: wide enough for SUMs at 100 TB scale factors
MONEY = "decimal(18,2)"
# rates (discount/tax) kept narrow on purpose: money*rate*rate must stay
# within 38 digits of precision in BOTH engines, otherwise Spark silently
# reduces scale (rounding per-row) and the exact-decimal guarantee is lost
RATE = "decimal(6,4)"


def money(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(MONEY)


def rate(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(RATE)


def one_minus(rate_col: Column) -> Column:
    """(1 - rate) as a tight decimal(7,4) — exact (rates are 0..1, scale 4)
    and narrow enough that money * factor * factor stays within 38 digits of
    precision, so Spark never falls back to scale-reduced (rounding) decimals.
    """
    return (F.lit(1) - rate_col).cast("decimal(7,4)")


def one_plus(rate_col: Column) -> Column:
    return (F.lit(1) + rate_col).cast("decimal(7,4)")


def as_double(col: Column) -> Column:
    """Exact decimal -> double for a stable output schema."""
    return col.cast("double")


def fmt_ts(col: str | Column, fmt: str = "yyyy-MM-dd HH:mm:ss") -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, fmt)


def fmt_date(col: str | Column) -> Column:
    return fmt_ts(col, "yyyy-MM-dd")
