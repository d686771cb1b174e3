"""Idempotent upsert sink (SURVEY.md §2.1 S5-S6, §2.9 T4-T5).

The reference achieves replay-safe replication by delete-then-insert per
changeset id inside one transaction (ref changesetmd.py:71-76,105-106;
"safe to apply older diffs", ref README.md:59).  The Spark-native equivalent
is MERGE semantics expressed as set algebra over immutable columnar files:

    new_state = latest_per_key(batch)  ∪  (current ∖ batch.keys)

computed with a window dedup + broadcast anti-join, written atomically via
staging-directory swap (Delta Lake's MERGE would subsume the swap; plain
parquet keeps this repo dependency-free and the algebra identical).

Scale notes (100 TB): the anti-join broadcasts only the *batch key set* (a
minutely diff is thousands of ids — tiny), so the current table is never
shuffled; the window dedup shuffles only the incoming batch on ``id``.  At
real scale the store would be partitioned by ``date(created_at)`` (SURVEY
§4.2) so the rewrite touches only partitions containing batch keys.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def latest_per_key(
    df: DataFrame, key: str | list[str] = "id", order_col: str = "sequence"
) -> DataFrame:
    """Last-write-wins dedup: keep each key's row from the highest
    ``order_col`` (a changeset appears in many diffs as it evolves
    open→closed, T5; the reference overwrites the row each time it is seen,
    ref changesetmd.py:105-106).  Ties broken deterministically by preferring
    the row with the latest ``closed_at``-bearing content is unnecessary:
    within one replication file an id appears at most once, so
    (key, sequence) is unique."""
    keys = [key] if isinstance(key, str) else list(key)
    w = Window.partitionBy(*keys).orderBy(F.col(order_col).desc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def upsert_parquet(
    spark: SparkSession,
    target_dir: str,
    batch: DataFrame,
    key: str | list[str] = "id",
    order_col: str = "sequence",
) -> None:
    """MERGE ``batch`` into the parquet table at ``target_dir``:
    batch rows replace current rows with the same key (delete+insert parity,
    S6), applied idempotently — replaying the identical batch yields an
    identical table (T4; proven by the replay test).

    Atomicity: write to a staging dir, then swap directories — a crash
    mid-write leaves the old table intact, mirroring the reference's
    single-transaction-per-file commit (ref changesetmd.py:123).
    """
    key_cols = [key] if isinstance(key, str) else list(key)
    incoming = latest_per_key(batch, key=key_cols, order_col=order_col)

    if os.path.exists(target_dir):
        current = spark.read.parquet(target_dir)
        keys = incoming.select(*key_cols).distinct()
        kept = current.join(F.broadcast(keys), on=key_cols, how="left_anti")
        new_state = kept.unionByName(incoming)
    else:
        new_state = incoming

    staging = f"{target_dir}.staging-{uuid.uuid4().hex}"
    new_state.write.mode("overwrite").parquet(staging)
    backup = f"{target_dir}.old-{uuid.uuid4().hex}"
    if os.path.exists(target_dir):
        os.rename(target_dir, backup)
    os.rename(staging, target_dir)
    if os.path.exists(backup):
        shutil.rmtree(backup)
