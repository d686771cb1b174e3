"""Driver-visible changeset ingest + upsert queries (SURVEY.md §2.1-§2.2,
§2.9): the XML source, normalization layer and last-write-wins upsert
exercised through the ``queries()``/``oracle_sql()`` contract.

The ingest queries parse a deterministic embedded corpus with ``from_xml``
(the columnar path of ``sources.xml_source``) while their DuckDB oracles
recompute the expected values *directly with SQL arithmetic* — a
hash-checked differential test of the XML parse → cast → map/array
construction pipeline (the declarative twin of ref changesetmd.py:78-125).

The corpus is generated from pure integer arithmetic (no randomness, no
clock), so Spark's parsed output and the oracle's computed output must agree
bit-for-bit; every edge the golden fixtures cover is present — anonymous
users (i%7), bbox-less changesets (i%11), open changesets (i%5), tag
presence (i%2, i%3), discussions (i%4).
"""

from __future__ import annotations

import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sinks.upsert import latest_per_key
from ..sources.xml_source import normalize_changesets, parse_changeset_xml_strings
from ..tables import load_table

_N = 60
_BASE = datetime.datetime(2024, 3, 1, 0, 0, 0)


def _corpus_xml() -> list[str]:
    """One serialized <changeset> element per i ∈ [1, _N], attribute values
    pure functions of i (bbox steps are 0.5/0.25 — binary-exact doubles, so
    the decimal(10,7)→double path cannot drift from the oracle's floats)."""
    docs = []
    for i in range(1, _N + 1):
        created = _BASE + datetime.timedelta(minutes=i)
        attrs = [
            f'id="{1000 + i}"',
            f'created_at="{created:%Y-%m-%dT%H:%M:%S}Z"',
        ]
        is_open = i % 5 == 0
        if not is_open:
            closed = created + datetime.timedelta(minutes=30)
            attrs.append(f'closed_at="{closed:%Y-%m-%dT%H:%M:%S}Z"')
        attrs.append(f'open="{str(is_open).lower()}"')
        if i % 7 != 0:  # anonymous edits carry no uid/user (ref changesetmd.py:108)
            attrs.append(f'uid="{10 + i % 5}"')
            attrs.append(f'user="user_{10 + i % 5}"')
        if i % 11 != 0:  # bbox-less changesets omit all four coords
            min_lat = -50 + i * 0.5
            min_lon = -100 + i * 1.0
            attrs.append(f'min_lat="{min_lat:.7f}"')
            attrs.append(f'max_lat="{min_lat + 0.25:.7f}"')
            attrs.append(f'min_lon="{min_lon:.7f}"')
            attrs.append(f'max_lon="{min_lon + 0.5:.7f}"')
        attrs.append(f'num_changes="{(i * 37) % 100}"')
        children = [f'<tag k="created_by" v="{"JOSM" if i % 3 == 0 else "iD"}"/>']
        if i % 2 == 0:
            children.append(f'<tag k="comment" v="edit {i}"/>')
        if i % 4 == 0:
            cdate = created + datetime.timedelta(days=1)
            children.append(
                "<discussion>"
                f'<comment uid="1" user="rev" date="{cdate:%Y-%m-%dT%H:%M:%S}Z">'
                f"<text>c{i}</text></comment></discussion>"
            )
        docs.append(f"<changeset {' '.join(attrs)}>{''.join(children)}</changeset>")
    return docs


def _parsed_corpus(spark: SparkSession) -> DataFrame:
    raw = spark.createDataFrame([(x,) for x in _corpus_xml()], "xml string")
    return normalize_changesets(parse_changeset_xml_strings(raw, "xml"))


_TS = "yyyy-MM-dd HH:mm:ss"


@register(
    "q_changeset_ingest_normalize",
    oracle=f"""
    SELECT
      1000 + i                                   AS id,
      CASE WHEN i % 7 = 0 THEN NULL ELSE 10 + i % 5 END AS user_id,
      CASE WHEN i % 7 = 0 THEN NULL
           ELSE 'user_' || CAST(10 + i % 5 AS VARCHAR) END AS user_name,
      strftime(TIMESTAMP '2024-03-01 00:00:00' + i * INTERVAL 1 MINUTE,
               '%Y-%m-%d %H:%M:%S')              AS created_at_s,
      CASE WHEN i % 5 = 0 THEN NULL
           ELSE strftime(TIMESTAMP '2024-03-01 00:00:00'
                         + (i + 30) * INTERVAL 1 MINUTE, '%Y-%m-%d %H:%M:%S')
      END                                        AS closed_at_s,
      (i % 5 = 0)                                AS open,
      (i * 37) % 100                             AS num_changes,
      CASE WHEN i % 11 = 0 THEN NULL
           ELSE CAST(-50 + i * 0.5 AS DOUBLE) END AS min_lat_d,
      CASE WHEN i % 11 = 0 THEN NULL
           ELSE CAST(-100 + i * 1.0 + 0.5 AS DOUBLE) END AS max_lon_d,
      CASE WHEN i % 3 = 0 THEN 'JOSM' ELSE 'iD' END AS created_by,
      (i % 2 = 0)                                AS has_comment_tag,
      CASE WHEN i % 2 = 0 THEN 2 ELSE 1 END      AS n_tags,
      CASE WHEN i % 4 = 0 THEN 1 ELSE 0 END      AS n_comments
    FROM range(1, {_N + 1}) t(i)
    ORDER BY id
    """,
)
def q_changeset_ingest_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1/P1-P4/F1 through the driver contract: XML → normalized schema,
    projected to scalars (timestamps formatted, decimals→double) so the
    hash compare is type-stable."""
    cs = _parsed_corpus(spark)
    return cs.select(
        "id",
        "user_id",
        "user_name",
        F.date_format("created_at", _TS).alias("created_at_s"),
        F.date_format("closed_at", _TS).alias("closed_at_s"),
        "open",
        "num_changes",
        F.col("min_lat").cast("double").alias("min_lat_d"),
        F.col("max_lon").cast("double").alias("max_lon_d"),
        # P6 map value extraction (tags -> 'created_by', ref README.md:114-118)
        F.col("tags")["created_by"].alias("created_by"),
        # P5 key-existence (tags ? 'comment', ref README.md:110-112)
        F.map_contains_key("tags", "comment").alias("has_comment_tag"),
        F.size("tags").alias("n_tags"),
        F.size("comments").alias("n_comments"),
    ).orderBy("id")


@register(
    "q_changeset_comments_explode",
    oracle=f"""
    SELECT
      1000 + i  AS comment_changeset_id,
      1         AS comment_user_id,
      'rev'     AS comment_user_name,
      strftime(TIMESTAMP '2024-03-02 00:00:00' + i * INTERVAL 1 MINUTE,
               '%Y-%m-%d %H:%M:%S') AS comment_date_s,
      'c' || CAST(i AS VARCHAR) AS comment_text
    FROM range(1, {_N + 1}) t(i)
    WHERE i % 4 = 0
    ORDER BY comment_changeset_id
    """,
)
def q_changeset_comments_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4/J1 child-table materialization: the osm_changeset_comment flat
    table (ref queries.py:21-27) via inner explode of the nested column."""
    from ..sources.xml_source import comments_table

    return (
        comments_table(_parsed_corpus(spark))
        .select(
            "comment_changeset_id",
            "comment_user_id",
            "comment_user_name",
            F.date_format("comment_date", _TS).alias("comment_date_s"),
            "comment_text",
        )
        .orderBy("comment_changeset_id")
    )


# The reference README's three documented example queries, each registered
# 1:1 (ref README.md:106-124) so a regression in any one is individually
# visible in the driver's correctness report (they were one bundled
# aggregate in round 1).


@register(
    "q_readme_count_comment_tag",
    oracle=f"""
    SELECT COUNT(*) AS n_with_comment_tag
    FROM range(1, {_N + 1}) t(i) WHERE i % 2 = 0
    """,
)
def q_readme_count_comment_tag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``SELECT COUNT(*) FROM osm_changeset WHERE tags ? 'comment'``
    (hstore key-existence, ref README.md:110-112) → ``map_contains_key``."""
    cs = _parsed_corpus(spark)
    return cs.filter(F.map_contains_key("tags", "comment")).agg(
        F.count("*").alias("n_with_comment_tag")
    )


@register(
    "q_readme_count_created_by_josm",
    oracle=f"""
    SELECT COUNT(*) AS n_created_by_josm
    FROM range(1, {_N + 1}) t(i) WHERE i % 3 = 0
    """,
)
def q_readme_count_created_by_josm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``... WHERE tags -> 'created_by' LIKE 'JOSM%'`` (value extraction +
    prefix LIKE, ref README.md:114-118) → ``try_element_at(...).like`` —
    try_element_at because ANSI-mode Spark throws on a missing map key."""
    cs = _parsed_corpus(spark)
    return cs.filter(
        F.try_element_at("tags", F.lit("created_by")).like("JOSM%")
    ).agg(F.count("*").alias("n_created_by_josm"))


@register(
    "q_readme_envelope_containment",
    oracle=f"""
    SELECT COUNT(*) AS n_in_envelope
    FROM range(1, {_N + 1}) t(i)
    WHERE i % 11 <> 0
      AND -50 + i * 0.5 >= -40 AND -50 + i * 0.5 + 0.25 <= -20
      AND -100 + i      >= -95 AND -100 + i + 0.5      <= -55
    """,
)
def q_readme_envelope_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``... WHERE ST_CoveredBy(geom, ST_MakeEnvelope(-95,-40,-55,-20,4326))``
    (spatial containment, ref README.md:120-124) → four range predicates on
    the bbox columns (operators.geometry.bbox_contains); no geometry type
    needed for axis-aligned envelopes (SURVEY §2.2 P8 / §2.3 J2)."""
    from .geometry import bbox_contains

    cs = _parsed_corpus(spark)
    in_env = bbox_contains(
        F.col("min_lon").cast("double"),
        F.col("min_lat").cast("double"),
        F.col("max_lon").cast("double"),
        F.col("max_lat").cast("double"),
        env=(-95.0, -40.0, -55.0, -20.0),
    )
    return cs.filter(in_env).agg(F.count("*").alias("n_in_envelope"))


@register(
    "q_changeset_join_comments",
    oracle=f"""
    SELECT
      1000 + i AS id,
      CASE WHEN i % 7 = 0 THEN NULL
           ELSE 'user_' || CAST(10 + i % 5 AS VARCHAR) END AS user_name,
      CASE WHEN i % 3 = 0 THEN 'JOSM' ELSE 'iD' END AS created_by,
      1        AS n_comments,
      1440     AS first_comment_delay_min
    FROM range(1, {_N + 1}) t(i)
    WHERE i % 4 = 0 AND i % 2 = 0
    ORDER BY id
    """,
)
def q_changeset_join_comments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: the changesets⋈comments equi-join (FK-by-convention
    comment_changeset_id → id, ref queries.py:22 / README.md:99) — commented
    changesets that also carry a comment *tag* (P5), with comment count and
    minutes from creation to first discussion comment.  On real data the
    comment side is the small one → broadcast; the changeset scan never
    shuffles."""
    from ..sources.xml_source import comments_table

    cs = _parsed_corpus(spark)
    comments = comments_table(cs)
    per_cs = comments.groupBy(
        F.col("comment_changeset_id").alias("id")
    ).agg(
        F.count("*").alias("n_comments"),
        F.min("comment_date").alias("first_comment"),
    )
    return (
        cs.filter(F.map_contains_key("tags", "comment"))
        .join(F.broadcast(per_cs), "id")
        .select(
            "id",
            "user_name",
            F.col("tags")["created_by"].alias("created_by"),
            "n_comments",
            ((F.unix_timestamp("first_comment") - F.unix_timestamp("created_at")) / 60)
            .cast("int")
            .alias("first_comment_delay_min"),
        )
        .orderBy("id")
    )


@register(
    "q_upsert_last_write_wins",
    oracle="""
    SELECT user_id, event_type, event_id AS last_event_id, value AS last_value
    FROM events
    QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                               ORDER BY event_id DESC) = 1
    """,
)
def q_upsert_last_write_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6/T4-T5 dedup kernel at data scale: the same ``latest_per_key``
    window that powers the replication MERGE (sinks.upsert), keyed like an
    upsert stream — highest sequence (event_id) wins per key.  One shuffle on
    the composite key; no driver-side state."""
    ev = load_table(spark, sf_dir, "events")
    return latest_per_key(
        ev, key=["user_id", "event_type"], order_col="event_id"
    ).select(
        "user_id",
        "event_type",
        F.col("event_id").alias("last_event_id"),
        F.col("value").alias("last_value"),
    )
