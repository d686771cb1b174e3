"""S5 JDBC parity sink test against embedded Derby (ships with Spark, so
the Postgres-shaped write path is testable without a server).  The
reference's only sink is row-at-a-time psycopg2 INSERTs
(ref changesetmd.py:53-69); this is the partition-parallel batched twin."""

from __future__ import annotations

import json

from changesetmd_spark.sinks import ChangesetStore
from tests.test_ingest import FIXTURE

DERBY = "org.apache.derby.jdbc.EmbeddedDriver"


def test_jdbc_roundtrip(spark, tmp_path):
    store = ChangesetStore(spark, str(tmp_path / "store"))
    store.create()
    store.bulk_load(FIXTURE)

    url = f"jdbc:derby:{tmp_path}/derbydb;create=true"
    store.write_jdbc(url, table="osm_changeset", mode="overwrite", driver=DERBY)

    back = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", "osm_changeset")
        .option("driver", DERBY)
        .load()
    )
    rows = {r.id: r for r in back.collect()}
    assert set(rows) == {1001, 1002, 1003, 1004}
    assert rows[1001].user_name == "alice"
    assert rows[1001].num_changes == 42
    # nested columns are JSON-serialized for plain-JDBC compatibility
    tags = json.loads(rows[1001].tags)
    assert tags["created_by"].startswith("JOSM")
    comments = json.loads(rows[1001].comments)
    assert len(comments) == 2 and comments[1]["comment_user_name"] == "carol"
    assert json.loads(rows[1003].tags) == {}
