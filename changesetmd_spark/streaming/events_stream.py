"""Event-time streaming windows (SURVEY.md §2.9 T6).

The reference has no event-time processing — its "stream" is a sequence of
replication files (ref changesetmd.py:179-186).  T6 is the [extension]
surface: tumbling / sliding / session windows with watermark-based state
cleanup over the driver's ``events`` table, run as true Structured Streaming
queries (file source → windowed agg → sink), not batch look-alikes.

Scale notes: watermarks bound the state store (without one, every window
lives forever — the classic unbounded-state failure at 100 TB/day); the
complete-output-mode used by the driver-visible queries below is only for
the finite availableNow verification runs — a production deployment would
use append mode + a real sink.  Window aggregation state partitions by the
grouping key, so shuffle width follows ``spark.sql.shuffle.partitions``.
"""

from __future__ import annotations

import hashlib
import os
import uuid
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load_table, table_path

_STAGE_ROOT = "/tmp/changesetmd_spark_stream_stage"

# final cumulative state-store rows of the most recent run_stream_to_table
# call (None until a stream has run; see VERDICT r13 #4 telemetry note)
last_state_rows: int | None = None

# Confs the staged events source needs at plan/run time (identical to the
# session factory defaults, session.py).  Always applied SCOPED — a builder
# must not leak conf mutations into the caller's session (a concurrently
# planned query would silently inherit them).
_RUNTIME_CONF = {
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.session.timeZone": "UTC",
}


@contextmanager
def _scoped_conf(spark: SparkSession, settings: dict[str, str]):
    """Set session confs for the duration of the block, then restore the
    caller's values (unset keys are re-unset)."""
    saved: dict[str, str | None] = {}
    for k, v in settings.items():
        saved[k] = spark.conf.get(k, None)
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, old in saved.items():
            if old is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, old)


def _staged_dir(sf_dir: str, name: str) -> str:
    """File-stream sources require a *directory*; the driver testdata is one
    parquet file per table.  Stage a per-(sf_dir, table) symlink dir —
    contents never copied, so this is O(1) in data size.

    A table that is itself a DIRECTORY of part files (the scale smoke's
    replicated tables) is staged as one symlink per part file: the file
    stream source lists a directory's immediate files and does not
    recurse through a dir-valued symlink.  The key fingerprints the
    source mtime in that case, since a regenerated directory changes its
    part-file names and would otherwise leave dangling links."""
    src = table_path(sf_dir, name)
    if os.path.isdir(src):
        st = os.stat(src)
        key = hashlib.sha1(
            f"{os.path.abspath(sf_dir)}|{st.st_mtime_ns}".encode()
        ).hexdigest()[:12]
        d = os.path.join(_STAGE_ROOT, f"{name}-{key}")
        os.makedirs(d, exist_ok=True)
        for part in sorted(os.listdir(src)):
            if not part.endswith(".parquet"):
                continue
            link = os.path.join(d, part)
            # lexists, not exists: a dangling symlink (source part file
            # deleted after staging within the same mtime key) makes
            # exists() return False and the re-create raise FileExistsError
            if os.path.lexists(link) and not os.path.exists(link):
                os.unlink(link)
            if not os.path.lexists(link):
                os.symlink(os.path.join(src, part), link)
        return d
    key = hashlib.sha1(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    d = os.path.join(_STAGE_ROOT, f"{name}-{key}")
    os.makedirs(d, exist_ok=True)
    link = os.path.join(d, f"{name}.parquet")
    if os.path.lexists(link) and not os.path.exists(link):
        os.unlink(link)
    if not os.path.lexists(link):
        os.symlink(src, link)
    return d


def state_width(spark: SparkSession, sf_dir: str, table: str = "events") -> int:
    """Scale-adaptive stateful-shuffle width (guide §2: derive partitioning
    from input size, never a constant tuned to one host).

    Streaming state partitions are frozen into the checkpoint at first
    start, so AQE's runtime coalescing cannot shrink them — every stateful
    operator pays a fixed state-store open/commit (and, for Python-stateful
    ops, an Arrow worker round-trip) per partition per micro-batch whether
    or not the partition holds keys.  Measured on the driver corpus
    (sf0.1, 2 MB events): the stream-stream interval joins run 15.1 s at
    the session default width 32 and 3.1 s at width 2 — the other 30
    partitions were pure empty-state overhead; the full sweep (32/8/4/2/1)
    is in OPTIMIZATION_r17.md.

    Width sizing: per-batch cost ≈ a·w (fixed state-store open/commit per
    partition) + b/w (partition-parallel data work), minimized at
    w* = sqrt(b/a) — so width grows with the SQRT of source size, not
    linearly (the linear bytes/1MB rule overshot at the 10× tier:
    width 21 ran 15.2 s where width 8 ran 5.7 s on
    q_stream_incremental_dedup; sqrt lands at 5).  Calibration from the
    measured sweep: 1 partition per sqrt(MB of source parquet), floored
    at 1 and capped at the session's parallelism — sf0.1 resolves to 2
    (the sweep's optimum), the 10×/100×/300× tiers to 5/15/26, and a
    real cluster (defaultParallelism in the thousands) is capped by
    cores, not by this heuristic.  Production override:
    ``SPARK_GRAFT_STREAM_STATE_PARTITIONS`` (sizing by expected
    |live keys| beats any bytes proxy when the operator's keyspace is
    known)."""
    env = os.environ.get("SPARK_GRAFT_STREAM_STATE_PARTITIONS")
    if env:
        # ADVICE r17: a malformed or non-positive override ("abc", "0",
        # "-1") must fall through to the size heuristic, not crash the
        # query or hand shuffle.partitions an invalid value.
        try:
            width = int(env)
            if width >= 1:
                return width
        except ValueError:
            pass
    p = table_path(sf_dir, table)
    try:
        if os.path.isdir(p):
            nbytes = sum(
                os.path.getsize(os.path.join(p, f))
                for f in os.listdir(p)
                if f.endswith(".parquet")
            )
        else:
            nbytes = os.path.getsize(p)
    except OSError:
        return spark.sparkContext.defaultParallelism
    mb = max(1.0, nbytes / (1 << 20))
    return int(
        max(
            1,
            min(
                spark.sparkContext.defaultParallelism,
                -(-(mb**0.5) // 1),  # ceil(sqrt(MB))
            ),
        )
    )


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``events`` as an unbounded source: explicit schema (streaming sources
    cannot infer), nanos→micros ts conversion as in tables.load_table.

    The nanosAsLong/timezone confs are applied scoped to the eager schema
    read only (and re-applied scoped around execution by
    run_stream_to_table) — never left set on the caller's session."""
    with _scoped_conf(spark, _RUNTIME_CONF):
        schema = spark.read.parquet(table_path(sf_dir, "events")).schema
        sdf = spark.readStream.schema(schema).parquet(
            _staged_dir(sf_dir, "events")
        )
    ts_type = dict(sdf.dtypes)["ts"]
    if ts_type == "bigint":
        sdf = sdf.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_type == "timestamp_ntz":
        # timestamp[us] testdata: withWatermark requires TIMESTAMP (LTZ);
        # NTZ→LTZ cast is value-identical under the pinned UTC session tz.
        sdf = sdf.withColumn("ts", F.col("ts").cast("timestamp"))
    return sdf


def run_stream_to_table(
    stream_df: DataFrame,
    output_mode: str = "complete",
    shuffle_partitions: int | None = None,
) -> DataFrame:
    """Execute a streaming plan over the finite staged source with
    ``availableNow`` and return the materialized result.

    ``shuffle_partitions`` pins the stateful-operator width for THIS query
    (it is frozen into the checkpoint at first start): every state
    partition pays a fixed state-store + (for Python-stateful ops) Arrow
    worker round-trip per batch, so a small-keyspace operator on a
    200-partition default session spends its time on empty partitions —
    measured 5.6 s → 1.9 s going 32 → 8 for the user-totals accumulator.
    Production sizing follows |distinct keys| and executor count instead.

    Memory sink on purpose: these are verification runs (the driver collects
    the result); production writes go through ``replication_stream`` /
    ``writeStream.format("parquet")``."""
    spark = stream_df.sparkSession
    name = f"stream_{uuid.uuid4().hex}"
    conf = dict(_RUNTIME_CONF)
    if shuffle_partitions is not None:
        conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    with _scoped_conf(spark, conf):
        q = (
            stream_df.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    # state-store telemetry (VERDICT r13 #4): expose the final progress's
    # cumulative state rows so the scale smoke can assert state growth is
    # watermark-bounded (sublinear in event volume), not just wall time.
    # Overwritten per run; a stateless plan records 0.
    global last_state_rows
    try:
        prog = q.lastProgress or {}
        last_state_rows = sum(
            int(op.get("numRowsTotal", 0))
            for op in prog.get("stateOperators", [])
        )
    except Exception:  # noqa: BLE001 — telemetry must never fail the query
        last_state_rows = None
    return spark.table(name)


_TS = "yyyy-MM-dd HH:mm:ss"


@register(
    "q_stream_tumbling_hourly",
    oracle="""
    SELECT
      strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
      COUNT(*) AS n_events,
      CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1
    """,
)
def q_stream_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T6 tumbling window as a real streaming query: watermark + 1h windows,
    availableNow over the staged file source.  Hash-checked against the
    batch date_trunc equivalent — streaming and batch semantics must agree
    on complete data."""
    ev = stream_events(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("sum_value"),
        )
    )
    out = run_stream_to_table(agg, shuffle_partitions=state_width(spark, sf_dir))
    return out.select(
        F.date_format("window.start", _TS).alias("window_start"),
        "n_events",
        "sum_value",
    )


@register(
    "q_stream_sliding_2h_1h",
    oracle="""
    SELECT
      strftime(date_trunc('hour', ts) - k * INTERVAL 1 HOUR,
               '%Y-%m-%d %H:%M:%S') AS window_start,
      event_type,
      COUNT(*) AS n_events
    FROM events CROSS JOIN range(2) t(k)
    GROUP BY 1, 2
    """,
)
def q_stream_sliding_2h_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T6 sliding window (2h size / 1h slide): each event lands in exactly
    two windows; the oracle materializes that by cross-joining a 2-row
    offset table — same multiset, computed two independent ways."""
    ev = stream_events(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "2 hours", "1 hour"), "event_type")
        .agg(F.count("*").alias("n_events"))
    )
    out = run_stream_to_table(agg, shuffle_partitions=state_width(spark, sf_dir))
    return out.select(
        F.date_format("window.start", _TS).alias("window_start"),
        "event_type",
        "n_events",
    )


@register(
    "q_stream_session_windows",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       >= INTERVAL 30 MINUTE
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    sessions AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    )
    SELECT user_id,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           COUNT(*) AS n_events
    FROM sessions
    GROUP BY user_id, session_id
    """,
)
def q_stream_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T6 session windows (30 min gap) per user as a streaming query;
    the oracle derives identical sessions via the lag/cumsum
    gaps-and-islands construction — Spark's session_window operator vs
    first-principles SQL."""
    ev = stream_events(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "1 hour")
        .groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(F.count("*").alias("n_events"))
    )
    out = run_stream_to_table(agg, shuffle_partitions=state_width(spark, sf_dir))
    return out.select(
        "user_id",
        F.date_format("session_window.start", _TS).alias("session_start"),
        "n_events",
    )


@register(
    "q_stream_dedup_first_seen",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_distinct_users
    FROM (SELECT DISTINCT event_type, user_id FROM events)
    GROUP BY event_type
    """,
)
def q_stream_dedup_first_seen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1 exact dedup as a *streaming* operator: ``dropDuplicates`` on the
    (event_type, user_id) key emits each key's first arrival only; the
    per-type count of survivors equals batch COUNT(DISTINCT) regardless of
    which physical row won, so the result is deterministic and
    hash-checkable.  Unbounded dedup state by design here (the finite
    availableNow run bounds it); a production deployment over an endless
    stream uses ``dropDuplicatesWithinWatermark`` to let the watermark
    expire key state — same plan shape, bounded store."""
    ev = stream_events(spark, sf_dir)
    dd = (
        ev.withWatermark("ts", "1 hour")
        .dropDuplicates(["event_type", "user_id"])
        .select("event_type", "user_id")
    )
    out = run_stream_to_table(
        dd, output_mode="append", shuffle_partitions=state_width(spark, sf_dir)
    )
    return out.groupBy("event_type").agg(
        F.count("*").alias("n_distinct_users")
    )


# Snapshot cutoff for the stream-static incremental dedup: the midpoint of
# the generator's fixed Jan-2024 span.  Replica-offset scale data lands
# entirely past the cutoff — the base set stays bounded while the incoming
# stream grows, which is exactly the production shape.
_INC_CUTOFF = "2024-01-16 00:00:00"


@register(
    "q_stream_incremental_dedup",
    oracle=f"""
    WITH base AS (
      SELECT DISTINCT user_id,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS item_id
      FROM events WHERE ts < TIMESTAMP '{_INC_CUTOFF}'
    ), inc AS (
      SELECT DISTINCT user_id,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS item_id
      FROM events WHERE ts >= TIMESTAMP '{_INC_CUTOFF}'
    )
    SELECT i.item_id, COUNT(*) AS n_new_users
    FROM inc i
    WHERE NOT EXISTS (
      SELECT 1 FROM base b
      WHERE b.user_id = i.user_id AND b.item_id = i.item_id
    )
    GROUP BY i.item_id
    """,
)
def q_stream_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of `q_incremental_hash_dedup` (T6+E1): the incoming
    half of the event stream (ts >= cutoff) is deduped in-stream
    (``dropDuplicates`` on the (user, item) key) and LEFT ANTI joined
    against the STATIC base snapshot (distinct pairs before the cutoff) —
    only never-seen user-item interactions survive, counted per item
    (the "first-touch" feed every recommender ingest dedupes for).

    Scale shape (100 TB/day): stream-static anti-join re-reads the static
    side per micro-batch (broadcast or hash-partitioned — never stream
    state); dedup state is watermark-bounded in a production deployment
    (``dropDuplicatesWithinWatermark``).  The base snapshot is the bounded
    artifact (distinct pairs, not raw events)."""
    item = F.get_json_object(F.col("props"), "$.k").try_cast("long")
    base = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("ts") < F.lit(_INC_CUTOFF).cast("timestamp"))
        .select("user_id", item.alias("item_id"))
        .distinct()
    )
    ev = stream_events(spark, sf_dir).filter(
        F.col("ts") >= F.lit(_INC_CUTOFF).cast("timestamp")
    )
    dd = (
        ev.withWatermark("ts", "1 hour")
        .select("ts", "user_id", item.alias("item_id"))
        .dropDuplicates(["user_id", "item_id"])
        .select("user_id", "item_id")
    )
    new_pairs = dd.join(base, ["user_id", "item_id"], "left_anti")
    out = run_stream_to_table(
        new_pairs,
        output_mode="append",
        shuffle_partitions=state_width(spark, sf_dir),
    )
    return out.groupBy("item_id").agg(F.count("*").alias("n_new_users"))


# -- watermark late-data drop (T6 sharp edge) --------------------------------
# The one watermark behavior the complete-mode queries above cannot show:
# rows arriving AFTER the watermark passed their window are dropped.  The
# staged source is split into three mtime-ordered files so availableNow
# with maxFilesPerTrigger=1 yields three deterministic micro-batches:
# batch 0 (3/4 of events) establishes the watermark, batch 1 is an EMPTY
# spacer (probed behavior: the watermark computed from a batch takes
# effect one batch LATER than the docs suggest — without the spacer the
# straggler batch still runs at watermark 0 and nothing drops), and
# batch 2 (the straggler quarter) replays against the now-effective
# watermark.  Probed drop rule (pinned by the oracle): a late row is
# dropped iff its WINDOW END ≤ watermark — a straggler for a still-open
# window is aggregated.  The 500 ms watermark-delay offset keeps the
# cutoff strictly between the second-aligned event timestamps, so no row
# ever sits exactly on a boundary and both engines agree without an
# equality-edge convention.
# 72 h + 500 ms: wide enough that the straggler quarter splits into BOTH
# outcomes at every SF (windows inside the last 72 h of on-time data stay
# open and aggregate the late rows; older windows are expired and drop
# them), narrow enough that drops dominate.  Still bounds state: ≤ 73
# open hour-windows regardless of stream length.
_LATE_DELAY_MS = 259_200_500


def _staged_batch_events(
    spark: SparkSession, sf_dir: str, tag: str, batches: tuple
) -> str:
    """Directory with one mtime-ordered parquet file per entry in
    ``batches`` — each entry a predicate over the events table, a
    DataFrame to write verbatim (must be a deterministic function of the
    events table, since the cache key fingerprints only that file), or
    ``F.lit(False)`` for an EMPTY spacer batch (needed because a batch's
    watermark takes effect one batch later).  Content-fingerprinted like
    the jsonl fixture so a regenerated corpus invalidates staging."""
    src = table_path(sf_dir, "events")
    st = os.stat(src)
    key = hashlib.sha1(
        f"{os.path.abspath(sf_dir)}|{st.st_size}|{st.st_mtime_ns}".encode()
    ).hexdigest()[:12]
    d = os.path.join(_STAGE_ROOT, f"{tag}-{key}")
    marker = os.path.join(d, "_DONE")
    if os.path.exists(marker):
        return d
    os.makedirs(d, exist_ok=True)
    ev = load_table(spark, sf_dir, "events")
    import glob
    import shutil as _shutil

    for i, pred in enumerate(batches):
        tmp = os.path.join(d, f"_tmp{i}")
        b = pred if isinstance(pred, DataFrame) else ev.filter(pred)
        b.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        dest = os.path.join(d, f"batch-{i}.parquet")
        _shutil.move(part, dest)
        _shutil.rmtree(tmp, ignore_errors=True)
        os.utime(dest, (1_000_000_000 + i * 1000, 1_000_000_000 + i * 1000))
    with open(marker, "w") as fh:
        fh.write("ok")
    return d


def _staged_three_batch_events(spark: SparkSession, sf_dir: str) -> str:
    """batch-0 (event_id % 4 ≠ 1, oldest mtime), batch-1 (EMPTY spacer),
    batch-2 (the straggler quarter) — the late-data-drop staging."""
    return _staged_batch_events(
        spark,
        sf_dir,
        "events3b",
        (
            F.col("event_id") % 4 != 1,
            F.lit(False),  # empty spacer
            F.col("event_id") % 4 == 1,
        ),
    )


@register(
    "q_stream_late_data_drop",
    oracle=f"""
    WITH a AS (
      SELECT ts FROM events WHERE event_id % 4 <> 1
    ), b AS (
      SELECT ts FROM events WHERE event_id % 4 = 1
    ), wm AS (
      SELECT MAX(ts) - INTERVAL '{_LATE_DELAY_MS} milliseconds' AS w FROM a
    ), kept AS (
      SELECT ts FROM a
      UNION ALL
      SELECT b.ts FROM b, wm
      WHERE date_trunc('hour', b.ts) + INTERVAL 1 HOUR > wm.w
      -- probed engine rule: drop iff window END <= watermark; a late row
      -- whose window is still open (end > wm) is aggregated normally
    )
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S')
             AS window_start,
           COUNT(*) AS n_events
    FROM kept GROUP BY 1
    """,
)
def q_stream_late_data_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark late-data semantics, hash-checked: batch 0 (3/4 of the
    events) advances the watermark to max(batch-0 ts) − 72h − 500ms, an
    empty spacer batch lets it take effect (the engine applies a batch's
    watermark one batch later — probed, see module comment), and batch 2
    replays the straggler quarter: every straggler whose WINDOW has been
    finalized (window end ≤ watermark) is dropped by the engine — the
    oracle recomputes exactly that rule (a late row for a still-open
    window is aggregated; only rows for watermark-expired windows
    vanish).  Update output mode; the final per-window count is the max
    across emissions (counts are monotone).

    Scale shape: three micro-batches by construction (maxFilesPerTrigger=1,
    mtime-ordered staging); state is one row per open hour window.  At
    production scale this is the T6 contract that bounds state: without
    the drop, an unbounded-lateness stream holds every window forever."""
    d = _staged_three_batch_events(spark, sf_dir)
    with _scoped_conf(spark, _RUNTIME_CONF):
        schema = spark.read.parquet(os.path.join(d, "batch-0.parquet")).schema
        sdf = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(d)
        )
    ts_type = dict(sdf.dtypes)["ts"]
    if ts_type == "bigint":
        sdf = sdf.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_type == "timestamp_ntz":
        sdf = sdf.withColumn("ts", F.col("ts").cast("timestamp"))
    agg = (
        sdf.withWatermark("ts", f"{_LATE_DELAY_MS} milliseconds")
        .groupBy(F.window("ts", "1 hour"))
        .agg(F.count("*").alias("n_events"))
    )
    out = run_stream_to_table(
        agg, output_mode="update", shuffle_partitions=state_width(spark, sf_dir)
    )
    return out.groupBy(
        F.date_format("window.start", _TS).alias("window_start")
    ).agg(F.max("n_events").alias("n_events"))


@register(
    "q_stream_dedup_reemit_after_expiry",
    oracle=f"""
    WITH b0 AS (
      SELECT user_id,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS item_id,
             MIN(ts) AS first_ts
      FROM events WHERE ts < TIMESTAMP '{_INC_CUTOFF}'
      GROUP BY 1, 2
    ), b2 AS (
      SELECT user_id,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS item_id
      FROM events WHERE ts >= TIMESTAMP '{_INC_CUTOFF}'
      GROUP BY 1, 2
    ), wm AS (
      SELECT MAX(first_ts) - INTERVAL '{_LATE_DELAY_MS} milliseconds' AS w
      FROM b0
    ), base_em AS (
      SELECT item_id, COUNT(*) AS n FROM b0 GROUP BY item_id
    ), delta AS (
      -- probed + pinned dropDuplicatesWithinWatermark rules: state keeps
      -- the FIRST accepted record's event time (an in-state duplicate
      -- does NOT refresh it); the key re-emits iff that state expired
      -- (first_ts + delay < watermark) or the key is new
      SELECT d.item_id,
             CASE WHEN b0.user_id IS NULL THEN 'new'
                  WHEN b0.first_ts + INTERVAL '{_LATE_DELAY_MS} milliseconds'
                       < wm.w THEN 'reemit'
                  ELSE 'suppressed' END AS kind
      FROM b2 d
      LEFT JOIN b0 ON b0.user_id = d.user_id AND b0.item_id = d.item_id
      CROSS JOIN wm
    )
    SELECT item_id,
           COALESCE(b.n, 0) AS n_base,
           CAST(SUM(CASE WHEN kind = 'reemit' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_reemitted,
           CAST(SUM(CASE WHEN kind = 'new' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_new
    FROM delta LEFT JOIN base_em b USING (item_id)
    GROUP BY item_id, b.n
    HAVING SUM(CASE WHEN kind = 'reemit' THEN 1 ELSE 0 END)
           + SUM(CASE WHEN kind = 'new' THEN 1 ELSE 0 END) > 0
    """,
)
def q_stream_dedup_reemit_after_expiry(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """``dropDuplicatesWithinWatermark`` state-expiry semantics,
    hash-checked — the bounded-state dedup every 100 TB/day ingest runs,
    and its sharp edge: a key whose state EXPIRED re-emits (at-least-once
    per horizon, not exactly-once forever).  Probed + pinned rules: state
    stores the FIRST accepted record's event time and an in-state
    duplicate does not refresh it; the state is evicted once the
    watermark (min over sources of max event time − delay, effective one
    batch later) passes first_ts + delay; a later arrival of the same key
    then emits again.  Staging removes the one nondeterminism: batch 0 is
    the per-key MIN-ts history snapshot (one row per key, so "first
    accepted" is well-defined regardless of shuffle arrival order), a
    spacer lets the watermark take effect and evict, then batch 2 replays
    the per-key min-ts recent delta.  Output classifies every delta
    emission per item: re-emitted (history key whose state expired) vs
    new (never-seen key) — history keys still inside the horizon are
    provably suppressed (a referee asserts all three populations exist).

    Scale shape: dedup state is one small row per live key, bounded by
    the watermark horizon — the exact mechanism that makes streaming
    dedup deployable at 100 TB/day where unbounded dropDuplicates state
    is not; the rollup is a key-shuffle aggregate on the emitted rows
    only."""
    item = F.get_json_object(F.col("props"), "$.k").try_cast("long")
    ev = load_table(spark, sf_dir, "events")
    b0 = (
        ev.filter(F.col("ts") < F.lit(_INC_CUTOFF).cast("timestamp"))
        .select("user_id", item.alias("item_id"), "ts")
        .groupBy("user_id", "item_id")
        .agg(F.min("ts").alias("ts"))
    )
    b2 = (
        ev.filter(F.col("ts") >= F.lit(_INC_CUTOFF).cast("timestamp"))
        .select("user_id", item.alias("item_id"), "ts")
        .groupBy("user_id", "item_id")
        .agg(F.min("ts").alias("ts"))
    )
    empty = b0.limit(0)
    d = _staged_batch_events(
        spark, sf_dir, "eventsddw", (b0, empty, b2, empty)
    )
    with _scoped_conf(spark, _RUNTIME_CONF):
        schema = spark.read.parquet(os.path.join(d, "batch-0.parquet")).schema
        sdf = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(d)
        )
    ts_type = dict(sdf.dtypes)["ts"]
    if ts_type == "bigint":
        sdf = sdf.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_type == "timestamp_ntz":
        sdf = sdf.withColumn("ts", F.col("ts").cast("timestamp"))
    dd = sdf.withWatermark(
        "ts", f"{_LATE_DELAY_MS} milliseconds"
    ).dropDuplicatesWithinWatermark(["user_id", "item_id"])
    out = run_stream_to_table(
        dd, output_mode="append", shuffle_partitions=state_width(spark, sf_dir)
    )
    cutoff = F.lit(_INC_CUTOFF).cast("timestamp")
    base_keys = b0.select("user_id", "item_id").withColumn(
        "_in_base", F.lit(1)
    )
    is_delta = F.col("ts") >= cutoff
    joined = out.join(base_keys, ["user_id", "item_id"], "left")
    return (
        joined.groupBy("item_id")
        .agg(
            F.sum(F.when(~is_delta, 1).otherwise(0))
            .cast("long")
            .alias("n_base"),
            F.sum(
                F.when(is_delta & F.col("_in_base").isNotNull(), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_reemitted"),
            F.sum(F.when(is_delta & F.col("_in_base").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_new"),
        )
        .filter(F.col("n_reemitted") + F.col("n_new") > 0)
    )


@register(
    "q_stream_hourly_ohlc",
    oracle="""
    SELECT event_type,
           strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S')
             AS window_start,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND((MIN({'t': ts, 'e': event_id, 'v': value})).v, 4) AS open,
           ROUND(MAX(value), 4) AS high,
           ROUND(MIN(value), 4) AS low,
           ROUND((MAX({'t': ts, 'e': event_id, 'v': value})).v, 4) AS close
    FROM events
    GROUP BY event_type, date_trunc('hour', ts)
    """,
)
def q_stream_hourly_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T6/E-ext streaming twin of q_hourly_ohlc: candlestick bars as a
    REAL watermarked streaming aggregation — the struct-extremum
    open/close (deterministic same-ts ties via event_id) runs inside the
    streaming state store exactly like any min/max, so the continuous
    version needs NO first()/last() ordering hacks; availableNow over the
    staged file source, hash-checked against the batch date_trunc
    equivalent (streaming and batch must agree on complete data).

    Scale shape: per-(type, window) state is five scalars + two structs
    regardless of events per bar; the 1h watermark bounds live windows,
    so state = O(types × open windows) at any throughput."""
    ev = stream_events(spark, sf_dir)
    key = F.struct("ts", "event_id", F.col("value").alias("v"))
    agg = (
        ev.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.min(key)["v"], 4).alias("open"),
            F.round(F.max("value"), 4).alias("high"),
            F.round(F.min("value"), 4).alias("low"),
            F.round(F.max(key)["v"], 4).alias("close"),
        )
    )
    out = run_stream_to_table(agg, shuffle_partitions=state_width(spark, sf_dir))
    return out.select(
        "event_type",
        F.date_format("window.start", _TS).alias("window_start"),
        "n",
        "open",
        "high",
        "low",
        "close",
    )
