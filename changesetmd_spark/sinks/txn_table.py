"""Multi-writer transactional parquet tables (SURVEY §2.1 S5-S7, §2.9 T3-T5).

The reference gets cluster-visible transactions for free from Postgres — an
exclusive ``LOCK TABLE ... NOWAIT`` plus transactional delete+insert
(ref changesetmd.py:140-143 and :71-76).  ``sinks.upsert`` reproduces the
semantics on parquet but coordinates through a host-local lock file, which a
*multi-host* cluster cannot see.  This module closes that gap with the same
mechanism production lake formats (Delta, Iceberg) use: an ordered commit
log of immutable snapshot manifests, advanced by atomic put-if-absent
creation of the next version file — no locks at all, writers race for the
version slot and the loser rebases.

Layout::

    <table>/_txnlog/00000000000000000001.json   one manifest per version
    <table>/data/<commit-uuid>/                 immutable data directories
    <table>/data/<commit-uuid>/created_date=…/  (hive layout when partitioned)

A manifest is the COMPLETE state of one snapshot: which data directories —
and, for partitioned tables, which partition values inside them — are live.
Data directories are write-once: no commit ever mutates or deletes a file
another snapshot references, so

* **readers are snapshot-isolated for free**: ``read()`` pins the manifest
  it resolved; concurrent commits only add new files and new manifests.
  Time travel is ``read(version=N)``.
* **commits are atomic**: the table state changes at exactly the instant the
  version file appears.  ``os.link(tmp, final)`` is the put-if-absent — the
  JSON is fully written before the link, so no reader can observe a torn
  manifest.  On HDFS the equivalent is ``create(path, overwrite=false)``;
  on S3-era object stores, a conditional PUT (If-None-Match) or a catalog
  service — same protocol, different primitive.
* **crashed writers leak nothing into the table**: an uncommitted data
  directory is invisible (no manifest references it) and is swept by
  ``vacuum`` once older than the retention window.

Concurrency control is optimistic, like Delta's: a writer records the
version it read, computes, writes its data directory, then tries to commit
``read_version + 1``.  Losing the race means re-reading the log and either
**rebasing** (an ``append`` commutes with everything; a ``merge`` commutes
with commits that touched disjoint partition sets) or **recomputing** (a
``merge`` over overlapping partitions re-runs its MERGE against the new
snapshot — the idempotent LWW computation absorbs the replay, T4).  A
bounded retry loop raises :class:`TxnConflictError` only under sustained
contention, mirroring the reference's NOWAIT bail-out.

Scale notes (100 TB): the log holds one small JSON per commit — state
resolution is O(versions) driver-side metadata, pruned by ``vacuum``
checkpointing; data directories shard across partitions exactly like the
plain hive layout, so scans partition-prune identically (``read`` can prune
whole directories from the manifest before Spark ever lists them); and the
MERGE itself reuses :func:`..sinks.upsert.latest_per_key` — one window over
the batch plus a broadcast anti-join, never a shuffle of current data.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DataType,
    DateType,
    MapType,
    StructField,
    StructType,
)

from .upsert import latest_per_key


def _contains_map_type(dt: DataType) -> bool:
    """True if ``dt`` is or nests a MapType (struct fields, array elements,
    map keys/values) — Spark's hash expressions reject MapType at any
    depth, so the deterministic tie-break hash must skip such columns."""
    if isinstance(dt, MapType):
        return True
    if isinstance(dt, ArrayType):
        return _contains_map_type(dt.elementType)
    if isinstance(dt, StructType):
        return any(_contains_map_type(f.dataType) for f in dt.fields)
    return False


_HIVE_NULL = "__HIVE_DEFAULT_PARTITION__"
_LOG_DIR = "_txnlog"
_DATA_DIR = "data"
_MAX_COMMIT_RETRIES = 20


class TxnConflictError(RuntimeError):
    """Sustained commit contention on a transactional table (parity with the
    reference's LOCK ... NOWAIT bail-out, ref changesetmd.py:140-143)."""


class TxnTable:
    """A versioned parquet table with optimistic multi-writer commits.

    ``partition_source`` names a timestamp column; when present in written
    data, rows are hive-partitioned by ``partition_col = date(source)`` and
    MERGE commits replace only the affected partitions' files.
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        partition_source: str | None = None,
        partition_col: str = "created_date",
    ) -> None:
        self.spark = spark
        self.path = os.path.abspath(path)
        self.partition_source = partition_source
        self.partition_col = partition_col

    # ---- log plumbing ------------------------------------------------------

    def _log_path(self) -> str:
        return os.path.join(self.path, _LOG_DIR)

    def _data_path(self) -> str:
        return os.path.join(self.path, _DATA_DIR)

    def _version_file(self, version: int) -> str:
        return os.path.join(self._log_path(), f"{version:020d}.json")

    def versions(self) -> list[int]:
        log = self._log_path()
        if not os.path.isdir(log):
            return []
        return sorted(
            int(f[:-5])
            for f in os.listdir(log)
            if f.endswith(".json") and f[:-5].isdigit()
        )

    def current_version(self) -> int:
        vs = self.versions()
        return vs[-1] if vs else -1

    def _manifest(self, version: int) -> dict:
        with open(self._version_file(version)) as fh:
            return json.load(fh)

    def history(self) -> list[dict]:
        return [self._manifest(v) for v in self.versions()]

    def _try_commit(self, version: int, manifest: dict) -> bool:
        """Atomically publish ``manifest`` as ``version``; False if another
        writer won the slot.  Content is fully durable in a temp file before
        the single atomic link — readers never see a torn manifest."""
        os.makedirs(self._log_path(), exist_ok=True)
        tmp = os.path.join(self._log_path(), f".tmp-{uuid.uuid4().hex}")
        with open(tmp, "w") as fh:
            json.dump(manifest, fh)
            fh.flush()
            os.fsync(fh.fileno())
        try:
            os.link(tmp, self._version_file(version))  # put-if-absent
            return True
        except FileExistsError:
            return False
        finally:
            os.unlink(tmp)

    # ---- writing -----------------------------------------------------------

    def _published_schema(self, df: DataFrame, partitioned: bool) -> dict:
        """JSON schema as readers will observe it: hive layout appends the
        partition column last, so the recorded schema mirrors that order.
        Stored in every manifest so a truncated (or fully pruned) snapshot
        still reads back as a typed empty DataFrame."""
        schema = df.schema
        if partitioned:
            pfield = next(
                (f for f in schema.fields if f.name == self.partition_col),
                StructField(self.partition_col, DateType()),
            )
            schema = StructType(
                [f for f in schema.fields if f.name != self.partition_col]
                + [pfield]
            )
        return schema.jsonValue()

    def _cluster_write_gate(self, df: DataFrame) -> bool:
        """Size-gated clustered write (r18, VERDICT r17 #5 / guide §6): a
        partitionBy write from W shuffle partitions opens up to W files per
        partition value — measured 1,340 files (85% < 8 KB) across the
        three bench commits.  On /tmp page cache those are nearly free and
        the extra shuffle measurably LOSES (the r17 experiment), but at
        object-store scale small files dominate, so the hash-distribution
        shuffle (Iceberg write.distribution-mode=hash) engages when the
        optimizer's size estimate for the frame crosses
        ``spark.changesetmd.txn.clusterWriteBytes`` (default 256m; the
        bench corpora sit far below it, so the measured /tmp regime is
        byte-identical)."""
        try:
            conf = df.sparkSession.conf.get(
                "spark.changesetmd.txn.clusterWriteBytes", "256m"
            )
            from ..operators.util import _conf_bytes

            threshold = _conf_bytes(conf)
            if threshold <= 0:
                return False
            est = int(
                df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
            )
            if est >= 1 << 62:
                # RDD-backed plans (createDataFrame, localCheckpoint)
                # carry the Long.MaxValue default, not a real estimate —
                # never let "unknown" read as "huge"
                return False
            return est >= threshold
        except Exception:  # noqa: BLE001 — sizing is advisory, never fatal
            return False

    def _write_data_dir(
        self, df: DataFrame
    ) -> tuple[str, list[str], bool, dict]:
        """Write ``df`` into a fresh immutable commit directory; returns
        (relative dir, partition dirnames inside it, partitioned?,
        published schema json).  A partitioned write of an empty frame
        yields ``parts == []`` — callers must NOT fall back to the ``""``
        pseudo-partition in that case (it would make a partitioned table
        look unpartitioned to later merges).
        """
        rel = os.path.join(_DATA_DIR, uuid.uuid4().hex)
        full = os.path.join(self.path, rel)
        partitioned = (
            self.partition_source is not None
            and self.partition_source in df.columns
        )
        if partitioned:
            if self.partition_col not in df.columns:
                df = df.withColumn(
                    self.partition_col, F.to_date(self.partition_source)
                )
            if self._cluster_write_gate(df):
                # hash-cluster rows by partition value so each value is
                # written by one task — one target-size file per partition
                # instead of (tasks x partitions) shards
                df = df.repartition(F.col(self.partition_col))
            (
                df.sortWithinPartitions(self.partition_col)
                .write.partitionBy(self.partition_col)
                .parquet(full)
            )
            parts = [
                d
                for d in os.listdir(full)
                if d.startswith(f"{self.partition_col}=")
            ]
            return rel, parts, True, self._published_schema(df, True)
        df.write.parquet(full)
        return rel, [], False, self._published_schema(df, False)

    @staticmethod
    def _live_map(manifest: dict | None) -> dict[str, list[str]]:
        """partition dirname → list of commit dirs holding live rows for it
        (unpartitioned tables use the single pseudo-partition key ``""``)."""
        if manifest is None:
            return {}
        return {k: list(v) for k, v in manifest["partitions"].items()}

    def _commit_loop(self, op: str, apply, schema: dict) -> int:
        """Optimistic-commit driver: resolve state → ``apply(live_map)`` →
        try the next version slot; on losing the race, re-resolve and let
        ``apply`` rebase or recompute against the new state."""
        for _ in range(_MAX_COMMIT_RETRIES):
            read_version = self.current_version()
            prev = self._manifest(read_version) if read_version >= 0 else None
            new_live = apply(self._live_map(prev))
            manifest = {
                "version": read_version + 1,
                "op": op,
                "read_version": read_version,
                "ts": time.time(),
                "partitions": new_live,
                "schema": schema,
            }
            if self._try_commit(read_version + 1, manifest):
                return read_version + 1
        raise TxnConflictError(
            f"gave up after {_MAX_COMMIT_RETRIES} contended commits on "
            f"{self.path!r} ({op})"
        )

    def _commit_empty_batch(self, op: str, df: DataFrame) -> int:
        """Shared no-op path for an empty micro-batch (ADVICE r6): an empty
        diff must not register data — on a partitioned table a data commit
        would create the ``""`` pseudo-partition — but on a NEVER-committed
        table silently returning ``current_version()`` would hand callers
        the -1 sentinel where every other commit path returns a real
        version.  There, publish an empty-but-readable v0 (schema-only
        manifest, no data directory) so the table exists and reads back as
        a typed empty DataFrame.  Only slot 0 is ever contended: the
        existence check re-runs on every retry, so losing the race to a
        concurrent real commit returns THAT version instead of burning a
        redundant no-op manifest (which would also supersede the winner's
        recorded schema with the empty batch's)."""
        partitioned = (
            self.partition_source is not None
            and self.partition_source in df.columns
        )
        schema = self._published_schema(df, partitioned)
        for _ in range(_MAX_COMMIT_RETRIES):
            v = self.current_version()
            if v >= 0:
                return v  # table exists (possibly created by a racer)
            manifest = {
                "version": 0,
                "op": op,
                "read_version": -1,
                "ts": time.time(),
                "partitions": {},
                "schema": schema,
            }
            if self._try_commit(0, manifest):
                return 0
        raise TxnConflictError(
            f"gave up after {_MAX_COMMIT_RETRIES} contended commits on "
            f"{self.path!r} ({op}, empty batch)"
        )

    def append(self, df: DataFrame) -> int:
        """Blind append — commutes with every concurrent commit, so a lost
        race rebases by re-adding the same (already written) directory.
        An empty batch (e.g. an empty replication micro-batch) commits no
        data (see :meth:`_commit_empty_batch`)."""
        if df.isEmpty():
            return self._commit_empty_batch("append", df)
        rel, parts, partitioned, schema = self._write_data_dir(df)

        def apply(live: dict[str, list[str]]) -> dict[str, list[str]]:
            for p in parts if partitioned else [""]:
                live.setdefault(p, []).append(rel)
            return live

        return self._commit_loop("append", apply, schema)

    def overwrite(self, df: DataFrame) -> int:
        """Replace the whole table state (DDL create/truncate parity, S7).
        Overwriting with an empty frame is a truncate: the new manifest has
        no live partitions (never the ``""`` pseudo-partition) but keeps
        the schema, so ``read()`` returns a typed empty DataFrame."""
        rel, parts, partitioned, schema = self._write_data_dir(df)

        def apply(live: dict[str, list[str]]) -> dict[str, list[str]]:
            if partitioned:
                return {p: [rel] for p in parts}
            return {"": [rel]}

        return self._commit_loop("overwrite", apply, schema)

    def changes(
        self, from_version: int, to_version: int, key: str | list[str]
    ) -> DataFrame:
        """Row-level change feed between two committed snapshots (the
        lakehouse CDF read): full-outer-join the two snapshot reads on
        ``key`` and classify every key as ``insert`` (only in the newer
        snapshot), ``delete`` (only in the older), or ``update`` (present
        in both with any non-key column differing, null-safely) —
        unchanged keys are dropped.  Output: the key columns,
        ``change_type``, and every non-key column twice as ``old_<col>`` /
        ``new_<col>``.

        Scale shape: one shuffle on the key for the outer join; both
        sides are manifest-pruned snapshot scans, so a CDF over a
        single-partition commit reads only that partition's files.  A
        production format would additionally persist per-commit change
        files; diffing snapshots is the format-agnostic equivalent and
        gives identical answers for any (from, to) pair."""
        keys = [key] if isinstance(key, str) else list(key)
        old = self.read(from_version)
        new = self.read(to_version)
        non_key = [c for c in new.columns if c not in keys]
        o = old.select(
            *keys,
            F.lit(True).alias("_old_present"),
            *[F.col(c).alias(f"old_{c}") for c in non_key],
        )
        n = new.select(
            *keys,
            F.lit(True).alias("_new_present"),
            *[F.col(c).alias(f"new_{c}") for c in non_key],
        )
        j = o.join(n, keys, "full_outer")
        old_struct = F.struct(*[F.col(f"old_{c}") for c in non_key])
        new_struct = F.struct(*[F.col(f"new_{c}") for c in non_key])
        change = (
            F.when(F.col("_old_present").isNull(), F.lit("insert"))
            .when(F.col("_new_present").isNull(), F.lit("delete"))
            .when(~old_struct.eqNullSafe(new_struct), F.lit("update"))
            .otherwise(F.lit("unchanged"))
        )
        return (
            j.withColumn("change_type", change)
            .filter(F.col("change_type") != "unchanged")
            .drop("_old_present", "_new_present")
        )

    def merge(
        self,
        batch: DataFrame,
        key: str | list[str] = "id",
        order_col: str = "sequence",
        merge_schema: bool = False,
        order_aware: bool = False,
    ) -> int:
        """Idempotent LWW MERGE (delete-then-insert parity, S6/T4-T5): batch
        rows replace current rows with the same key; only partitions holding
        batch keys are rewritten.  A lost commit race always *recomputes* the
        MERGE against the new snapshot: partition-level disjointness is not
        sufficient for a key-level invariant — a concurrent commit may have
        inserted a batch key into a partition outside this merge's affected
        set, and rebasing over it would publish duplicate keys (violating the
        single-row-per-key guarantee the reference's delete+insert provides).
        Recompute-on-conflict is what Delta does for MERGE without predicate
        disjointness proofs; the idempotent LWW computation absorbs replays
        (T4), so retrying is safe.

        ``order_aware=False`` (default) is the reference's by-arrival
        semantics: incoming rows replace current rows with the same key
        unconditionally, so replaying a STALE diff resurrects its old state
        (exactly the documented reference behavior, ref README.md:59) and
        correctness depends on in-order delivery.  ``order_aware=True`` is
        the engine-tier upgrade: per key, the row with the HIGHEST
        ``order_col`` wins across current ∪ incoming (ties go to incoming,
        so bit-identical replays still converge) — out-of-order and
        duplicate delivery both reach the in-order final state, removing
        the delivery-order contract entirely.  Cost is identical: the same
        affected-partition rewrite, with the anti-join swapped for one
        window over (affected current ∪ batch) rows."""
        key_cols = [key] if isinstance(key, str) else list(key)
        if batch.isEmpty():
            # empty diff (e.g. an empty replication micro-batch): no data to
            # merge; publishes a readable empty v0 on a brand-new table
            return self._commit_empty_batch("merge", batch)
        for _ in range(_MAX_COMMIT_RETRIES):
            read_version = self.current_version()
            prev = self._manifest(read_version) if read_version >= 0 else None
            live = self._live_map(prev)

            incoming = latest_per_key(batch, key=key_cols, order_col=order_col)
            if not live:
                rel, parts, partitioned, schema = self._write_data_dir(
                    incoming
                )
                new_live = {p: [rel] for p in (parts if partitioned else [""])}
            else:
                current = self._read_live(live)
                keys = incoming.select(*key_cols).distinct()
                partitioned = "" not in live
                if partitioned:
                    if self.partition_col not in incoming.columns:
                        incoming = incoming.withColumn(
                            self.partition_col,
                            F.to_date(self.partition_source),
                        )
                    # partitions to rewrite: where batch keys live now ∪
                    # where incoming rows land (column-pruned + broadcast
                    # semi-join — current data never shuffles).  r18: the
                    # key-location scan only needs partitions the incoming
                    # batch does NOT already touch — a partition in the
                    # incoming set is affected regardless of where its keys
                    # live, so pre-pruning `current` to the complement
                    # turns the common whole-table-coverage merge's scan
                    # into a no-partition scan (partition filters prune at
                    # planning).  Affected set is unchanged by definition.
                    inc_vals = [
                        r[0]
                        for r in incoming.select(self.partition_col)
                        .distinct()
                        .collect()
                    ]
                    inc_non_null = [v for v in inc_vals if v is not None]
                    outside = (
                        ~F.col(self.partition_col).isin(inc_non_null)
                        if inc_non_null
                        else F.lit(True)
                    )
                    # NULL partitions: isin() is NULL-valued on NULL input,
                    # so include/exclude them explicitly depending on
                    # whether the batch already covers the NULL partition
                    if any(v is None for v in inc_vals):
                        outside = outside & F.col(
                            self.partition_col
                        ).isNotNull()
                    else:
                        outside = outside | F.col(
                            self.partition_col
                        ).isNull()
                    hit = (
                        current.select(*key_cols, self.partition_col)
                        .filter(outside)
                        .join(F.broadcast(keys), on=key_cols, how="left_semi")
                        .select(self.partition_col)
                    )
                    affected_vals = inc_vals + [
                        r[0] for r in hit.distinct().collect()
                    ]
                    affected = {
                        self._partition_dirname(v) for v in affected_vals
                    }
                    non_null = [v for v in affected_vals if v is not None]
                    cond = (
                        F.col(self.partition_col).isin(non_null)
                        if non_null
                        else F.lit(False)
                    )
                    if any(v is None for v in affected_vals):
                        cond = cond | F.col(self.partition_col).isNull()
                    cur_aff = current.filter(cond)
                else:
                    affected = {""}
                    cur_aff = current
                if order_aware:
                    # max-order row per key across current ∪ incoming; the
                    # _src flag breaks order ties toward incoming so exact
                    # replays converge (T4) without regressing newer state
                    from pyspark.sql import Window

                    inc = (
                        incoming
                        if merge_schema
                        else incoming.select(*cur_aff.columns)
                    )
                    combined = cur_aff.withColumn(
                        "_src", F.lit(0)
                    ).unionByName(
                        inc.withColumn("_src", F.lit(1)),
                        allowMissingColumns=merge_schema,
                    )
                    # Final tie-break (ADVICE r8): two incoming rows sharing
                    # key AND order_col would otherwise get an arbitrary
                    # row_number winner — nondeterministic across replays.
                    # A content hash over the hashable columns makes the
                    # winner a pure function of the data (identical-content
                    # duplicates tie harmlessly: either copy is the same
                    # row).  Map-typed columns are excluded (Spark's hash
                    # expressions reject MapType anywhere in the type tree,
                    # including a map nested inside a struct/array — ADVICE
                    # r9); key/order columns alone already cover most
                    # schemas.
                    hashable = [
                        f.name
                        for f in combined.schema.fields
                        if f.name != "_src"
                        and not _contains_map_type(f.dataType)
                    ]
                    tie = (
                        [F.desc(F.xxhash64(*[F.col(c) for c in hashable]))]
                        if hashable
                        else []
                    )
                    w = Window.partitionBy(*key_cols).orderBy(
                        F.desc(order_col), F.desc("_src"), *tie
                    )
                    new_state = (
                        combined.withColumn(
                            "_rn", F.row_number().over(w)
                        )
                        .filter(F.col("_rn") == 1)
                        .drop("_rn", "_src")
                    )
                elif merge_schema:
                    # additive schema evolution (Delta's mergeSchema): new
                    # batch columns join the table schema; current rows read
                    # NULL for them.  Strict mode stays the default so a
                    # typo'd column name fails loudly instead of forking the
                    # schema.
                    kept = cur_aff.join(
                        F.broadcast(keys), on=key_cols, how="left_anti"
                    )
                    new_state = kept.unionByName(
                        incoming, allowMissingColumns=True
                    )
                else:
                    kept = cur_aff.join(
                        F.broadcast(keys), on=key_cols, how="left_anti"
                    )
                    new_state = kept.unionByName(
                        incoming.select(*kept.columns), allowMissingColumns=False
                    )
                rel, parts, partitioned, schema = self._write_data_dir(
                    new_state
                )
                new_live = dict(live)
                for p in affected:
                    new_live.pop(p, None)  # partition lost all its rows
                for p in parts if partitioned else [""]:
                    new_live[p] = [rel]

            manifest = {
                "version": read_version + 1,
                "op": "merge",
                "read_version": read_version,
                "ts": time.time(),
                "partitions": new_live,
                "schema": schema,
            }
            if self._try_commit(read_version + 1, manifest):
                return read_version + 1
            # Lost the race: loop back and recompute the MERGE against the
            # new snapshot (see docstring — rebasing a merge is unsound at
            # key level).  The already-written data dir is orphaned and will
            # be swept by vacuum().
        raise TxnConflictError(
            f"gave up after {_MAX_COMMIT_RETRIES} contended commits on "
            f"{self.path!r} (merge)"
        )

    def _partition_dirname(self, value) -> str:
        return (
            f"{self.partition_col}="
            f"{_HIVE_NULL if value is None else value.isoformat()}"
        )

    # ---- reading -----------------------------------------------------------

    def _read_live(self, live: dict[str, list[str]]) -> DataFrame:
        # mergeSchema + allowMissingColumns: commit dirs written before a
        # schema evolution (see ``merge(merge_schema=True)`` / ``append``)
        # lack the newer columns — readers see them as NULL, exactly
        # Delta/Iceberg's add-column semantics.  Columns are only ever
        # ADDED (no type overwrite), so the merge is conflict-free.
        if set(live) == {""}:
            return self.spark.read.option("mergeSchema", "true").parquet(
                *[os.path.join(self.path, d) for d in sorted(set(live[""]))]
            )
        # partitioned: group live partitions by commit dir so each directory
        # is read once with basePath (keeps the partition column), then
        # union — Spark plans one multi-path scan per commit dir.
        by_dir: dict[str, list[str]] = {}
        for part, dirs in live.items():
            for d in dirs:
                by_dir.setdefault(d, []).append(part)
        frames = []
        for d, parts in sorted(by_dir.items()):
            base = os.path.join(self.path, d)
            frames.append(
                self.spark.read.option("basePath", base)
                .option("mergeSchema", "true")
                .parquet(*[os.path.join(base, p) for p in sorted(parts)])
            )
        out = frames[0]
        for f in frames[1:]:
            out = out.unionByName(f, allowMissingColumns=True)
        return out

    def _empty_frame(self, manifest: dict, v: int) -> DataFrame:
        """Typed empty DataFrame for a snapshot with no live rows (Delta
        parity: truncate is readable, ADVICE r6).  Manifests written before
        schema recording fall back to the newest older manifest that has a
        schema, then to a ``limit(0)`` over any older live data."""
        schema = manifest.get("schema")
        if schema is None:
            for ov in reversed(self.versions()):
                if ov >= v:
                    continue
                m = self._manifest(ov)
                if m.get("schema") is not None:
                    schema = m["schema"]
                    break
                old_live = self._live_map(m)
                if old_live:
                    return self._read_live(old_live).limit(0)
        if schema is None:
            raise ValueError(
                f"transactional table {self.path!r} has no live data at "
                f"v{v} and no recorded schema"
            )
        return self.spark.createDataFrame([], StructType.fromJson(schema))

    def read(
        self, version: int | None = None, partitions: list | None = None
    ) -> DataFrame:
        """Snapshot read.  ``version`` time-travels; ``partitions`` (a list
        of partition values) prunes whole directories out of the scan from
        the manifest alone — Spark never lists the skipped ones.  A
        truncated snapshot (or one whose pruning matches nothing) reads as
        a typed empty DataFrame, matching unpartitioned truncate and the
        lakehouse formats' behavior."""
        v = self.current_version() if version is None else version
        if v < 0:
            raise ValueError(f"transactional table {self.path!r} is empty")
        manifest = self._manifest(v)
        live = self._live_map(manifest)
        if partitions is not None and "" not in live:
            wanted = {self._partition_dirname(p) for p in partitions}
            live = {p: d for p, d in live.items() if p in wanted}
        if not live:
            return self._empty_frame(manifest, v)
        return self._read_live(live)

    # ---- maintenance -------------------------------------------------------

    def compact(
        self, partitions: list | None = None, min_dirs: int = 2
    ) -> int:
        """Bin-pack fragmented partitions: every partition referenced by
        ``min_dirs``-or-more commit directories is rewritten into ONE fresh
        directory, transactionally.  This is the OPTIMIZE/compaction half of
        lakehouse maintenance (vacuum is the other): a replication stream
        appending minutely micro-batches (T1/T2) leaves each date partition
        scattered across hundreds of small files, and at 100 TB the scan's
        file-listing + per-file open cost dominates — compaction restores
        target-size files without blocking readers (snapshot isolation) or
        writers (optimistic commit).

        Concurrency: compaction only REPLACES directory references for rows
        it re-wrote byte-identically, so winning the ``read_version + 1``
        slot proves no interleaved commit — on a lost race it re-snapshots
        and recomputes (an appended dir or a merge rewrite must not be
        dropped).  ``partitions`` limits the pass (maintenance windows);
        the orphaned pre-compaction dirs stay referenced by OLDER manifests
        for time travel and are reclaimed by ``vacuum()``."""
        wanted = (
            None
            if partitions is None
            else {self._partition_dirname(p) for p in partitions}
        )
        for _ in range(_MAX_COMMIT_RETRIES):
            read_version = self.current_version()
            if read_version < 0:
                return read_version  # empty table: nothing to compact
            live = self._live_map(self._manifest(read_version))
            targets = {
                p: dirs
                for p, dirs in live.items()
                if len(dirs) >= min_dirs and (wanted is None or p in wanted)
            }
            if not targets:
                return read_version  # already compact — no empty commit
            rel, parts, partitioned, schema = self._write_data_dir(
                self._read_live(targets)
            )
            new_live = dict(live)
            for p in targets:
                new_live.pop(p, None)
            for p in parts if partitioned else [""]:
                new_live[p] = [rel]
            manifest = {
                "version": read_version + 1,
                "op": "compact",
                "read_version": read_version,
                "ts": time.time(),
                "partitions": new_live,
                "schema": schema,
            }
            if self._try_commit(read_version + 1, manifest):
                return read_version + 1
            # lost the race: the rewritten rows may be stale (a concurrent
            # merge/append touched the table) — recompute from the new
            # snapshot; the orphaned dir is swept by vacuum()
        raise TxnConflictError(
            f"gave up after {_MAX_COMMIT_RETRIES} contended commits on "
            f"{self.path!r} (compact)"
        )

    def vacuum(
        self, keep_versions: int = 10, retention_seconds: float = 3600.0
    ) -> list[str]:
        """Drop data directories unreferenced by the ``keep_versions`` newest
        manifests (and the manifests older than those).  The mtime-based
        ``retention_seconds`` guard keeps a *live writer's* not-yet-committed
        directory safe — exactly Delta's VACUUM retention contract."""
        vs = self.versions()
        if not vs:
            return []
        keep = vs[-keep_versions:]
        referenced: set[str] = set()
        for v in keep:
            for dirs in self._manifest(v)["partitions"].values():
                referenced.update(dirs)
        removed: list[str] = []
        data_root = self._data_path()
        now = time.time()
        if os.path.isdir(data_root):
            for d in os.listdir(data_root):
                rel = os.path.join(_DATA_DIR, d)
                full = os.path.join(data_root, d)
                if rel in referenced:
                    continue
                if now - os.path.getmtime(full) < retention_seconds:
                    continue
                shutil.rmtree(full)
                removed.append(rel)
        for v in vs:
            if v not in keep:
                os.unlink(self._version_file(v))
        return removed
