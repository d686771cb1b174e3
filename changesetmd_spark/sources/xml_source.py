"""Streaming XML changeset source (SURVEY.md §2.1 S1-S2, §2.2 P1-P4, §2.8 F1).

The reference parses OSM changeset XML with a single-threaded lxml iterparse
loop, clearing elements to keep memory constant over >40 GB inputs
(ref changesetmd.py:78-125).  Here the whole job is a declarative scan:
Spark 4's native XML data source splits the input across executors, emits one
row per ``rowTag="changeset"`` element (P1 for free), and the cast layer below
is ordinary Catalyst expressions — no Python in the hot path.

Scale notes (100 TB): the read schema is declared, never inferred (no extra
pass over the data); ``.gz``/``.bz2`` inputs decode through Hadoop codecs and
multi-stream bz2 is *splittable*, so one 40 GB dump parallelizes across the
cluster — strictly better than the reference's sequential parse (S2).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .schema import CHANGESET_XML_READ_SCHEMA

# OSM timestamps are ISO-8601 UTC with a literal Z (e.g. the created_at /
# closed_at / comment date attributes fed raw to Postgres timestamp columns
# at ref changesetmd.py:108-113); parsed as timezone-naive (timestamp_ntz)
# for `timestamp without time zone` parity (ref queries.py:10,15,25).
#
# Every cast below is a try_cast: Spark 4 runs ANSI mode, where a plain cast
# on one malformed attribute fails the whole distributed job — a 40 GB dump
# with one glitched element must quarantine that row (null id), not abort
# (see test_malformed_changeset_does_not_poison_batch).


def read_changeset_xml(spark: SparkSession, path: str) -> DataFrame:
    """S1: distributed scan of changeset XML (plain, .gz or .bz2) → raw rows."""
    return (
        spark.read.format("xml")
        .option("rowTag", "changeset")
        .schema(CHANGESET_XML_READ_SCHEMA)
        .load(path)
    )


def _ts(col: str) -> Column:
    # string→ntz cast accepts ISO-8601 and drops the 'Z' designator — the
    # same coercion Postgres applies feeding these strings into
    # `timestamp without time zone` columns
    return F.col(col).try_cast("timestamp_ntz")


def _coord(col: str) -> Column:
    return F.col(col).try_cast("decimal(10,7)")


def normalize_changesets(raw: DataFrame, extra: tuple[str, ...] = ()) -> DataFrame:
    """P2-P4 + F1: attribute projection, explicit casts, tag-map and
    comment-array construction — the declarative twin of the per-element
    dict-building at ref changesetmd.py:88-113.

    Null semantics match the reference: absent XML attributes (anonymous uid,
    open changesets' closed_at, bbox-less changesets) arrive as NULL strings
    and stay NULL after the cast — the ``.get(..., None)`` behavior of
    ref changesetmd.py:108-113.  A changeset with no <tag> children gets an
    *empty map* and no <discussion> an *empty array* (matching the reference's
    ``tags = {}`` / ``comments = []`` defaults at ref changesetmd.py:90,94).
    """
    tags = F.when(
        F.col("tag").isNotNull(),
        F.map_from_entries(
            F.transform("tag", lambda t: F.struct(t["_k"], t["_v"]))
        ),
    ).otherwise(F.create_map().cast("map<string,string>"))

    comments = F.when(
        F.col("discussion.comment").isNotNull(),
        F.transform(
            "discussion.comment",
            lambda c: F.struct(
                c["_uid"].try_cast("long").alias("comment_user_id"),
                c["_user"].alias("comment_user_name"),
                c["_date"].try_cast("timestamp_ntz").alias("comment_date"),
                c["text"].alias("comment_text"),
            ),
        ),
    ).otherwise(
        F.array().cast(
            "array<struct<comment_user_id:bigint,comment_user_name:string,"
            "comment_date:timestamp_ntz,comment_text:string>>"
        )
    )

    return raw.select(
        F.col("_id").try_cast("long").alias("id"),
        F.col("_uid").try_cast("long").alias("user_id"),
        _ts("_created_at").alias("created_at"),
        _coord("_min_lat").alias("min_lat"),
        _coord("_max_lat").alias("max_lat"),
        _coord("_min_lon").alias("min_lon"),
        _coord("_max_lon").alias("max_lon"),
        _ts("_closed_at").alias("closed_at"),
        F.col("_open").try_cast("boolean").alias("open"),
        F.col("_num_changes").try_cast("int").alias("num_changes"),
        F.col("_user").alias("user_name"),
        tags.alias("tags"),
        comments.alias("comments"),
        # passthrough lineage columns (e.g. replication `sequence`)
        *[F.col(c) for c in extra],
    )


def comments_table(changesets: DataFrame) -> DataFrame:
    """Materialize the flat child table (ref queries.py:21-27) from the
    nested column — inner explode: changesets without discussion contribute
    no comment rows, exactly like the reference's per-comment INSERT loop
    (ref changesetmd.py:65-69)."""
    return changesets.select(
        F.col("id").alias("comment_changeset_id"), F.explode("comments").alias("c")
    ).select("comment_changeset_id", "c.*")


def parse_changeset_xml_strings(df: DataFrame, xml_col: str) -> DataFrame:
    """Parse one serialized ``<changeset .../>`` document per row with
    ``from_xml`` — the columnar (no file I/O) path used when changeset XML
    arrives embedded in another stream, and by the driver-visible demo query.
    Returns the same raw shape as :func:`read_changeset_xml`."""
    parsed = df.select(
        F.from_xml(F.col(xml_col), CHANGESET_XML_READ_SCHEMA).alias("c")
    )
    return parsed.select("c.*")
