"""hstore-style map operators (SURVEY §2.2 P5-P6, §2.8 F4).

The reference stores changeset tags as Postgres ``hstore`` (ref queries.py:19)
and documents two query idioms (ref README.md:110-118):

* key existence   ``WHERE tags ? 'comment'``
* value extract + LIKE ``WHERE tags -> 'created_by' LIKE 'JOSM%'``

Spark-native equivalents are ``map_contains_key`` (exact key-existence — does
NOT conflate a missing key with a NULL value, the P5 caveat) and
``element_at``.  The driver's tables carry no map column, so for the
oracle-checked variants we materialize a map from the ``events.props`` JSON
string — the same semi-structured→map normalization the XML ingest performs
for ``<tag k v>`` children (ref changesetmd.py:90-92).  The changeset-domain
versions of these operators (on a real ``tags`` column) are in
``tags_ops``/tests.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load_table


def props_map(col: str | Column = "props") -> Column:
    """JSON object string -> map<string,string> (tags-equivalent column)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.from_json(c, "map<string,string>")


def tag_contains(tags: Column, key: str) -> Column:
    """``tags ? key`` — exact key existence (ref README.md:112)."""
    return F.map_contains_key(tags, key)


def tag_value(tags: Column, key: str) -> Column:
    """``tags -> key`` — NULL when absent (ref README.md:118).

    ``try_element_at`` (not ``element_at``): under Spark 4's default ANSI
    mode a missing map key would otherwise raise, while hstore ``->``
    returns NULL — the P5/P6 null-semantics caveat from SURVEY §7.
    """
    return F.try_element_at(tags, F.lit(key))


@register(
    "q_map_key_existence",
    oracle="""
    SELECT event_type, COUNT(*) AS n_with_key
    FROM events
    WHERE json_extract(props, '$.k') IS NOT NULL
    GROUP BY event_type
    """,
)
def q_map_key_existence(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.withColumn("m", props_map())
        .filter(tag_contains(F.col("m"), "k"))
        .groupBy("event_type")
        .agg(F.count("*").alias("n_with_key"))
    )


@register(
    "q_map_value_extract",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
           ROUND(SUM(CAST(props->>'$.k' AS BIGINT)) * 1.0 / COUNT(*), 4) AS avg_k,
           COUNT(*) AS n_events
    FROM events
    WHERE CAST(props->>'$.k' AS BIGINT) >= 10
    GROUP BY event_type
    """,
)
def q_map_value_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    k = tag_value(props_map(), "k").try_cast("long")
    return (
        events.withColumn("k", k)
        .filter(F.col("k") >= 10)
        .groupBy("event_type")
        .agg(
            F.sum("k").alias("sum_k"),
            F.round(F.sum("k") * 1.0 / F.count("*"), 4).alias("avg_k"),
            F.count("*").alias("n_events"),
        )
    )


@register(
    "q_map_value_like",
    oracle="""
    SELECT event_id, props->>'$.k' AS k_str
    FROM events
    WHERE props->>'$.k' LIKE '1%'
    """,
)
def q_map_value_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the `tags -> 'created_by' LIKE 'JOSM%'` idiom (ref README.md:114-118)
    events = load_table(spark, sf_dir, "events")
    v = tag_value(props_map(), "k")
    return (
        events.withColumn("k_str", v)
        .filter(F.col("k_str").like("1%"))
        .select("event_id", "k_str")
    )


@register(
    "q_map_explode_tag_histogram",
    oracle="""
    SELECT k.key AS tag_key, COUNT(*) AS n
    FROM events, LATERAL (SELECT unnest(json_keys(props)) AS key) k
    GROUP BY k.key
    """,
)
def q_map_explode_tag_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    # tag-key histogram via explode(map_keys) — the map-analytics idiom GIN
    # indexes enable in the reference (ref queries.py:46)
    events = load_table(spark, sf_dir, "events")
    return (
        events.select(F.explode(F.map_keys(props_map())).alias("tag_key"))
        .groupBy("tag_key")
        .agg(F.count("*").alias("n"))
    )


@register(
    "q_json_typed_extract",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT)
             AS sum_k,
           MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k
    FROM events
    GROUP BY event_type
    """,
)
def q_json_typed_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6 ``from_json`` with a declared schema → typed struct column (the
    schema-on-read path; get_json_object covers the stringly path).  The
    parse happens once per row into native columns, so downstream
    aggregation is ordinary codegen arithmetic."""
    events = load_table(spark, sf_dir, "events")
    parsed = events.withColumn(
        "p", F.from_json(F.col("props"), "k INT")
    )
    return parsed.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(F.col("p.k")).alias("sum_k"),
        F.max(F.col("p.k")).alias("max_k"),
    )
