"""Changeset store lifecycle (SURVEY.md §2.1 S5/S7, §2.9 T1-T3, §3.1-3.2).

One object owns what the reference spreads across DDL strings and CLI flags:
create/truncate (ref changesetmd.py:35-51, queries.py:6-39), bulk load
(ref §3.1), incremental replication with a persisted watermark
(ref changesetmd.py:137-195, state table queries.py:28-32), and the JDBC
parity sink (the reference's only sink is Postgres; ref changesetmd.py:53-69).

Physical design replaces the reference's index objects (ref queries.py:41-47,
54-56) per SURVEY §4.2: columnar parquet gives min/max stats on every column
(the btree replacements); the bulk path partitions by ``created_date`` so
time-range scans prune partitions (the ``created_idx`` replacement); point
lookups and MERGE key the plain ``id`` column.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.replication import Fetcher, plan_catchup, read_replication_batch
from ..sources.schema import CHANGESET_SCHEMA
from ..sources.xml_source import normalize_changesets, read_changeset_xml
from .upsert import upsert_parquet


class ChangesetStore:
    """Parquet-backed changeset table + replication watermark.

    Layout under ``root``:
      ``changesets/``   the table (CHANGESET_SCHEMA + ``sequence`` lineage col)
      ``state.json``    ``{"last_sequence": N, "last_timestamp": "..."}`` —
                        the ref osm_changeset_state row (ref queries.py:28-32);
                        written AFTER the table swap commits, so a crash
                        between the two replays the last batch, which the
                        idempotent upsert absorbs (T4).  The reference's
                        ``update_in_progress`` mutex (ref changesetmd.py:
                        140-159) is subsumed by single-writer discipline (T3).
    """

    def __init__(self, spark: SparkSession, root: str) -> None:
        self.spark = spark
        self.root = root
        self.table_dir = os.path.join(root, "changesets")
        self.state_path = os.path.join(root, "state.json")

    # -- DDL surface (S7) ---------------------------------------------------
    def create(self) -> None:
        """ref createTables (changesetmd.py:44-51): idempotent init."""
        os.makedirs(self.root, exist_ok=True)
        if not os.path.exists(self.state_path):
            self._write_state(-1, None)  # ref queries.py:35 initializes (-1, null)

    def truncate(self) -> None:
        """ref truncateTables (changesetmd.py:35-42): drop data, reset state."""
        if os.path.exists(self.table_dir):
            shutil.rmtree(self.table_dir)
        self._write_state(-1, None)

    # -- reads --------------------------------------------------------------
    def changesets(self) -> DataFrame:
        if not os.path.exists(self.table_dir):
            return self.spark.createDataFrame(
                [], CHANGESET_SCHEMA.add("sequence", "long")
            )
        return self.spark.read.parquet(self.table_dir)

    def state(self) -> dict:
        if not os.path.exists(self.state_path):
            return {"last_sequence": -1, "last_timestamp": None}
        with open(self.state_path) as f:
            return json.load(f)

    # -- bulk load (§3.1) ---------------------------------------------------
    def bulk_load(self, xml_path: str, start_sequence: int = 0) -> int:
        """Dump import: distributed XML scan → normalize → partitioned
        columnar write.  ``partitionBy(created_date)`` + in-partition sort on
        ``created_at`` is the write-time replacement for the reference's
        post-load index build (ref changesetmd.py:256-263)."""
        df = normalize_changesets(
            read_changeset_xml(self.spark, xml_path)
        ).withColumn("sequence", F.lit(start_sequence).cast("long"))
        (
            df.withColumn("created_date", F.to_date("created_at"))
            .sortWithinPartitions("created_at")
            .write.mode("overwrite")
            .partitionBy("created_date")
            .parquet(self.table_dir)
        )
        self._write_state(start_sequence, None)
        return self.spark.read.parquet(self.table_dir).count()

    # -- replication (§3.2, T1) --------------------------------------------
    def replicate(
        self,
        server_sequence: int,
        fetcher: Fetcher,
        server_timestamp: str | None = None,
        max_batch: int = 1000,
    ) -> int:
        """Catch up to ``server_sequence``: fetch the missing diffs, apply
        them as batched idempotent upserts, advance the watermark per batch
        (crash-safe resume, the Spark twin of the per-sequence commit at
        ref changesetmd.py:184-185).  Returns the number of diffs applied."""
        todo = plan_catchup(self.state()["last_sequence"], server_sequence)
        applied = 0
        for i in range(0, len(todo), max_batch):
            chunk = todo[i : i + max_batch]
            batch = read_replication_batch(self.spark, chunk, fetcher)
            upsert_parquet(self.spark, self.table_dir, batch)
            applied += len(chunk)
            self._write_state(chunk[-1], server_timestamp)
        return applied

    # -- JDBC parity sink (S5) ----------------------------------------------
    def write_jdbc(
        self, url: str, table: str = "osm_changeset", mode: str = "append", **opts
    ) -> None:
        """Postgres parity: what the reference does row-at-a-time
        (ref changesetmd.py:53-69; slowness acknowledged ref README.md:75),
        Spark does partition-parallel and batched.  The nested tags/comments
        columns are serialized to JSON strings since plain JDBC lacks
        map/array types (hstore users: a to-hstore cast on the DB side)."""
        df = self.changesets()
        flat = df.withColumn("tags", F.to_json("tags")).withColumn(
            "comments", F.to_json("comments")
        )
        writer = flat.write.format("jdbc").option("url", url).option("dbtable", table)
        for k, v in {"batchsize": "10000", **opts}.items():
            writer = writer.option(k, str(v))
        writer.mode(mode).save()

    # -- internals ----------------------------------------------------------
    def _write_state(self, last_sequence: int, last_timestamp: str | None) -> None:
        os.makedirs(self.root, exist_ok=True)
        tmp = self.state_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(
                {"last_sequence": last_sequence, "last_timestamp": last_timestamp}, f
            )
        os.replace(tmp, self.state_path)
