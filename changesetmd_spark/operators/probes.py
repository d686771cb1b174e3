"""Pinned deterministic vectors shared by the classifier-calibration,
hybrid-retrieval, and MMR operators.  A leaf module (imports nothing from
other operators) so any operator module can use it without import cycles.

Component j of the salt-keyed vector is an md5-derived integer in
[-1000, 1000] scaled to [-1, 1] — the PQ-codebook pinned-row trick: both
engines derive the identical vector from the same salt, so "query
embeddings" exist without any external model."""

from __future__ import annotations

from pyspark.sql import functions as F

_DIM = 64


def probe_sql(salt: str = "probe") -> str:
    """The pinned vector as a one-row DuckDB subquery: ``pr`` (ordered
    list) and ``pn`` (its L2 norm)."""
    return f"""
      SELECT list(p ORDER BY i) AS pr,
             sqrt(list_reduce(list_transform(list(p ORDER BY i),
                                             x -> x * x),
                              (a, b) -> a + b)) AS pn
      FROM (
        SELECT i,
               ((('0x' || substr(md5('{salt}:' || CAST(i - 1 AS VARCHAR)),
                                 1, 15))::BIGINT % 2001) - 1000) / 1000.0
                 AS p
        FROM generate_series(1, {_DIM}) s(i)
      )
    """


def probe_vector(salt: str = "probe"):
    """The pinned vector as a constant Spark array expression (Catalyst
    constant-folds the md5-of-literal components at plan time).  Mirrors
    ``probe_sql``: same salt → same vector in both engines."""
    comps = [
        (
            (
                F.conv(
                    F.substring(F.md5(F.lit(f"{salt}:{j}")), 1, 15), 16, 10
                ).cast("long")
                % 2001
            )
            - 1000
        )
        / F.lit(1000.0)
        for j in range(_DIM)
    ]
    return F.array(*comps)
