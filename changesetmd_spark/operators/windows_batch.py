"""Event-time windowed aggregation, batch form (SURVEY §2.9 T6).

The reference's only notion of a window is the replication file-sequence
number (ref changesetmd.py:179-186); event-time windows are the [extension]
surface every Spark engine provides.  These are the *batch* equivalents of the
streaming queries in ``changesetmd_spark.streaming`` — identical semantics
(`F.window` / `F.session_window` work in both modes), which is exactly why
they are oracle-checkable here while the streaming variants are covered by
pytest with `availableNow` triggers.

Scale note: `F.window` is a projection + hash aggregate — one shuffle on the
(window, key) pair; `session_window` merges sessions inside the aggregate.
Sums over the double `value` column are cast to DECIMAL first so partial
aggregation order cannot change the result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import as_double
from ..registry import register
from ..tables import load_table

_VAL = "decimal(18,6)"


@register(
    "q_window_tumbling_hourly",
    oracle="""
    SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S')
             AS window_start,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def q_window_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            as_double(F.sum(F.col("value").cast(_VAL))).alias("total_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@register(
    "q_window_sliding",
    oracle="""
    SELECT strftime(time_bucket(INTERVAL '30 minutes', ts)
                      - k.k * INTERVAL '30 minutes', '%Y-%m-%d %H:%M:%S')
             AS window_start,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM events CROSS JOIN (SELECT unnest([0, 1]) AS k) k
    GROUP BY 1
    """,
)
def q_window_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    # 1-hour windows sliding every 30 minutes: each event lands in exactly 2
    # windows; the oracle materializes the same assignment via unnest([0,1]).
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            as_double(F.sum(F.col("value").cast(_VAL))).alias("total_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "n_events",
            "total_value",
        )
    )


# Shared by the native-session_window query and its two-phase scale twin:
# one sessionization contract, one oracle, two physical strategies.
_SESSION_ORACLE = """
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w >= INTERVAL '30 minutes'
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), numbered AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    )
    SELECT user_id,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(MAX(ts) + INTERVAL '30 minutes', '%Y-%m-%d %H:%M:%S')
             AS session_end,
           COUNT(*) AS n_events
    FROM numbered
    GROUP BY user_id, session_id
    """


@register("q_window_session_per_user", oracle=_SESSION_ORACLE)
def q_window_session_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    # session_window(gap): a new event extends the session while
    # event.ts < last.ts + gap, i.e. a gap >= 30min starts a new session —
    # the oracle's gaps-and-islands mirrors that boundary exactly.
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format("w.end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            "n_events",
        )
    )


@register("q_session_two_phase_scalable", oracle=_SESSION_ORACLE)
def q_session_two_phase_scalable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key-proof sessionization — the scale path the skewed tier
    exists to test (a viral user's whole timeline lands on ONE task under
    plain session_window).  Recorded A/B (BENCH_scale.json, r14): at the
    100× CELEBRITY tier (SPARK_GRAFT_SCALE_SKEW_COLLAPSE=30 — 30% of all
    events on a single user_id, ~3M rows on one key) the naive plan runs
    at 63.95× the base time vs 37.73× for this twin — a 1.48× win from
    splitting the hot key's sort across its days.  At the milder 1%-hot-
    tail tier (R× rows per hot key, ~7k rows each at R=100) both plans
    are equal (24.8× vs 25.1×) — per-key volume there is far too small
    for a single-task sort to matter, so deploy this twin when a key can
    absorb millions of rows, not for merely-popular keys.  Two phases,
    identical output to q_window_session_per_user (same oracle,
    row-for-row):

    1. sessionize within (user, calendar-day) chunks — the hot user's
       events split across its days, so the expensive per-event sort runs
       at per-(user, day) parallelism;
    2. merge sessions across chunk boundaries with gaps-and-islands over
       the SESSION frame (orders of magnitude smaller than the event
       frame): adjacent chunk-sessions merge iff the next session's first
       event precedes the previous session's end (last_ts + gap) — a new
       island starts at s ≥ running-max(e), exactly the ≥-gap rule, so
       midnight-spanning sessions reassemble bit-identically (min(s),
       max(e), Σn).

    The chunk key can be anything time-partitioning; calendar day keeps
    it deterministic.  This is the standard production rewrite for
    sessionizing power users (public pattern: partial sessionization +
    boundary merge)."""
    events = load_table(spark, sf_dir, "events")
    ph1 = (
        events.groupBy(
            "user_id",
            F.to_date("ts").alias("chunk"),
            F.session_window("ts", "30 minutes").alias("w"),
        )
        .agg(F.count("*").alias("n"))
        .select(
            "user_id",
            F.col("w.start").alias("s"),
            F.col("w.end").alias("e"),
            "n",
        )
    )
    w_user = Window.partitionBy("user_id").orderBy("s")
    prev_max_end = F.max("e").over(
        w_user.rowsBetween(Window.unboundedPreceding, -1)
    )
    islands = ph1.withColumn(
        "new_island",
        F.when(
            prev_max_end.isNull() | (F.col("s") >= prev_max_end), 1
        ).otherwise(0),
    ).withColumn(
        "island",
        F.sum("new_island").over(
            w_user.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return (
        islands.groupBy("user_id", "island")
        .agg(
            F.min("s").alias("s"),
            F.max("e").alias("e"),
            F.sum("n").alias("n_events"),
        )
        .select(
            "user_id",
            F.date_format("s", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format("e", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            "n_events",
        )
    )


# Auto-switch threshold (VERDICT r16 #4): the r14 celebrity-tier A/B
# showed the two-phase twin wins only when one key absorbs MILLIONS of
# rows (63.95x vs 37.73x at 3M rows on one user) and is a wash at ~10k
# rows per key (24.8x vs 25.1x at the 1%-hot-tail tier).  100k rows per
# key is the documented crossover guard: far above anything the uniform
# tiers produce, comfortably below the celebrity regime.
_SESSION_HOT_KEY_ROWS = 100_000


@register(
    "q_session_advised",
    oracle=_SESSION_ORACLE.replace(
        "FROM numbered\n    GROUP BY user_id, session_id",
        """FROM numbered, (
      SELECT CAST(MAX(n) > 100000 AS BIGINT) AS used_two_phase
      FROM (SELECT COUNT(*) AS n FROM events GROUP BY user_id)
    ) f
    GROUP BY user_id, session_id, f.used_two_phase""",
    ).replace(
        "COUNT(*) AS n_events",
        "COUNT(*) AS n_events,\n           f.used_two_phase",
    ),
)
def q_session_advised(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Advisor-driven sessionization (VERDICT r16 #4): measure the key
    distribution first — the q_skew_key_advisor pass, reduced to the one
    number the decision needs (max rows on any user_id) — then pick the
    physical plan: plain ``session_window`` below the documented
    _SESSION_HOT_KEY_ROWS crossover, the chunked two-phase twin above it.
    Mirrors q_skew_advised_salted_join's measure→mitigate contract: the
    decision itself is emitted (``used_two_phase``) so it is part of the
    hash-checked oracle (the oracle computes the same predicate in SQL),
    and both plans are row-identical by the shared _SESSION_ORACLE
    contract, so the switch can never change results — only the shuffle
    shape.

    Scale shape: the advice is one map-side-combinable key aggregate
    folded to a single driver scalar (bounded, not a data collect) — the
    same probe a production job runs before choosing a straggler-proof
    plan; then exactly one of the two documented session strategies."""
    events = load_table(spark, sf_dir, "events")
    max_n = (
        events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.max("n"))
        .first()[0]
        or 0
    )
    hot = int(max_n) > _SESSION_HOT_KEY_ROWS
    base = (
        q_session_two_phase_scalable if hot else q_window_session_per_user
    )(spark, sf_dir)
    return base.withColumn(
        "used_two_phase", F.lit(1 if hot else 0).cast("long")
    )


@register(
    "q_window_trailing_hour_sum",
    oracle="""
    SELECT event_id, user_id,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2)))
                  OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
                        RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW),
                 2) AS DOUBLE) AS trailing_1h_sum
    FROM events
    """,
)
def q_window_trailing_hour_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE window frame (§2.5): per-user trailing-1-hour sum — frame
    bounds in event-time units, not row counts (rowsBetween is covered by
    the running-total query).  The frame key is epoch MICROseconds on both
    sides (Spark ``unix_micros`` / DuckDB ``epoch_us``): truncating to whole
    seconds diverges from a fractional-seconds oracle whenever two events sit
    exactly 3600 whole seconds apart with sub-second parts ordered the other
    way.  One shuffle on user_id."""
    events = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, Window.currentRow)
    )
    return events.select(
        "event_id",
        "user_id",
        F.round(F.sum(F.col("value").cast("decimal(18,2)")).over(w), 2)
        .cast("double")
        .alias("trailing_1h_sum"),
    )




def _hourly_dense_grid(agg: DataFrame) -> DataFrame:
    """(h, event_type) dense grid spanning the observed hourly range for
    every type, LEFT-joined with the aggregate — shared by both gap-fill
    queries.  Bounds and the type dimension derive from the (tiny)
    post-aggregate frame, NOT the raw events: date_trunc is monotone, so
    min/max of the bucketed hours equal the bucketed min/max of raw ts,
    and one full scan feeds everything (code-review r6 #4: the previous
    shape scanned raw events three times per query)."""
    bounds = agg.agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
    hours = bounds.select(
        F.explode(
            F.sequence(F.col("h0"), F.col("h1"), F.expr("interval 1 hour"))
        ).alias("h")
    )
    types = agg.select("event_type").distinct()
    return hours.crossJoin(F.broadcast(types)).join(
        agg, ["h", "event_type"], "left"
    )


@register(
    "q_time_gapfill_locf",
    oracle="""
    WITH bounds AS (
      SELECT time_bucket(INTERVAL '1 hour', MIN(ts)) AS h0,
             time_bucket(INTERVAL '1 hour', MAX(ts)) AS h1
      FROM events
    ), hours AS (
      SELECT unnest(generate_series(h0, h1, INTERVAL '1 hour')) AS h
      FROM bounds
    ), types AS (
      SELECT DISTINCT event_type FROM events
    ), agg AS (
      SELECT time_bucket(INTERVAL '1 hour', ts) AS h, event_type,
             COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS tv
      FROM events GROUP BY 1, 2
    ), grid AS (
      SELECT hours.h, types.event_type FROM hours CROSS JOIN types
    )
    SELECT strftime(g.h, '%Y-%m-%d %H:%M:%S') AS window_start,
           g.event_type,
           COALESCE(a.n, 0) AS n_events,
           a.tv AS total_value,
           LAST_VALUE(a.tv IGNORE NULLS) OVER (
             PARTITION BY g.event_type ORDER BY g.h
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS locf_value
    FROM grid g
    LEFT JOIN agg a ON a.h = g.h AND a.event_type = g.event_type
    """,
)
def q_time_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style gap filling with last-observation-carried-forward
    (TimescaleDB's ``time_bucket_gapfill`` + ``locf``): materialize EVERY
    hour of the observed range for every event type — including hours with
    no events, which a plain GROUP BY silently drops — and interpolate the
    missing hourly totals by carrying the last non-null value forward
    (leading gaps stay NULL).  Dashboards and downstream joins on the time
    axis need the dense grid, not the sparse aggregate.

    Scale shape: the hourly aggregate is the same map-side-combined
    shuffle as q_window_tumbling_hourly; the dense grid is a generated
    sequence (|hours| rows) cross-joined with the tiny type dimension —
    data-free, no scan — and the LOCF pass is one per-type ROWS window
    over |hours| rows per type, never over raw events."""
    events = load_table(spark, sf_dir, "events")
    agg = events.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("h"), "event_type"
    ).agg(
        F.count("*").alias("n"),
        as_double(F.sum(F.col("value").cast(_VAL))).alias("tv"),
    )
    filled = _hourly_dense_grid(agg)
    locf = F.last("tv", ignorenulls=True).over(
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return filled.select(
        F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "event_type",
        F.coalesce(F.col("n"), F.lit(0)).alias("n_events"),
        F.col("tv").alias("total_value"),
        locf.alias("locf_value"),
    )


@register(
    "q_time_gapfill_interpolate",
    oracle="""
    WITH bounds AS (
      SELECT time_bucket(INTERVAL '1 hour', MIN(ts)) AS h0,
             time_bucket(INTERVAL '1 hour', MAX(ts)) AS h1
      FROM events
    ), hours AS (
      SELECT unnest(generate_series(h0, h1, INTERVAL '1 hour')) AS h
      FROM bounds
    ), types AS (
      SELECT DISTINCT event_type FROM events
    ), agg AS (
      SELECT time_bucket(INTERVAL '1 hour', ts) AS h, event_type,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS tv
      FROM events GROUP BY 1, 2
    ), grid AS (
      SELECT hours.h, types.event_type FROM hours CROSS JOIN types
    ), indexed AS (
      SELECT g.h, g.event_type, a.tv,
             ROW_NUMBER() OVER (PARTITION BY g.event_type ORDER BY g.h) AS i
      FROM grid g
      LEFT JOIN agg a ON a.h = g.h AND a.event_type = g.event_type
    ), filled AS (
      SELECT h, event_type, tv, i,
             LAST_VALUE(tv IGNORE NULLS) OVER
               (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
             LAST_VALUE(CASE WHEN tv IS NOT NULL THEN i END IGNORE NULLS)
               OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pi,
             FIRST_VALUE(tv IGNORE NULLS) OVER
               (w ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
             FIRST_VALUE(CASE WHEN tv IS NOT NULL THEN i END IGNORE NULLS)
               OVER (w ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS ni
      FROM indexed
      WINDOW w AS (PARTITION BY event_type ORDER BY h)
    )
    SELECT strftime(h, '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           ROUND(CASE
             WHEN tv IS NOT NULL THEN tv
             WHEN pv IS NOT NULL AND nv IS NOT NULL
               THEN pv + (nv - pv) * (i - pi) / (ni - pi)
             ELSE COALESCE(pv, nv)
           END, 6) AS value_interp,
           CAST(tv IS NULL AS INT) AS is_gap
    FROM filled
    """,
)
def q_time_gapfill_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation across time-series gaps (TimescaleDB's
    ``interpolate()``, the companion of q_time_gapfill_locf's LOCF): a
    missing hourly total becomes the linear blend of the surrounding
    non-null observations, weighted by distance in hours; leading/trailing
    gaps fall back to the nearest observation.

    Determinism: the blend pv + (nv-pv)·(i-pi)/(ni-pi) uses row indices
    (exact integers) and two doubles both engines computed identically
    from the DECIMAL hourly sums — one IEEE expression, rounded once.
    Scale shape: same dense generated grid as LOCF plus one forward and
    one backward per-type window — both over |hours| rows per type, never
    raw events."""
    events = load_table(spark, sf_dir, "events")
    agg = events.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("h"), "event_type"
    ).agg(as_double(F.sum(F.col("value").cast(_VAL))).alias("tv"))
    filled = _hourly_dense_grid(agg)
    w = Window.partitionBy("event_type").orderBy("h")
    fwd = w.rowsBetween(Window.unboundedPreceding, 0)
    bwd = w.rowsBetween(0, Window.unboundedFollowing)
    i = F.row_number().over(w)
    filled = filled.withColumn("i", i)
    idx_if_obs = F.when(F.col("tv").isNotNull(), F.col("i"))
    filled = (
        filled.withColumn("pv", F.last("tv", ignorenulls=True).over(fwd))
        .withColumn("pi", F.last(idx_if_obs, ignorenulls=True).over(fwd))
        .withColumn("nv", F.first("tv", ignorenulls=True).over(bwd))
        .withColumn("ni", F.first(idx_if_obs, ignorenulls=True).over(bwd))
    )
    interp = (
        F.when(F.col("tv").isNotNull(), F.col("tv"))
        .when(
            F.col("pv").isNotNull() & F.col("nv").isNotNull(),
            F.col("pv")
            + (F.col("nv") - F.col("pv"))
            * (F.col("i") - F.col("pi"))
            / (F.col("ni") - F.col("pi")),
        )
        .otherwise(F.coalesce(F.col("pv"), F.col("nv")))
    )
    return filled.select(
        F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "event_type",
        F.round(interp, 6).alias("value_interp"),
        F.col("tv").isNull().cast("int").alias("is_gap"),
    )


@register(
    "q_series_linear_trend",
    oracle="""
    WITH agg AS (
      SELECT event_type,
             time_bucket(INTERVAL '1 hour', ts) AS h,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS y
      FROM events GROUP BY 1, 2
    ), idx AS (
      SELECT event_type, y,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS x
      FROM agg
    ), sums AS (
      SELECT event_type,
             COUNT(*) AS n,
             SUM(x) AS sx,
             SUM(x * x) AS sxx,
             CAST(SUM(CAST(y AS DECIMAL(28,12))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(x * y AS DECIMAL(28,12))) AS DOUBLE) AS sxy
      FROM idx GROUP BY event_type
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_hours,
           CASE WHEN n > 1 THEN
             ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 8)
           END AS slope,
           CASE WHEN n > 1 THEN
             ROUND((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n,
                   6)
           END AS intercept
    FROM sums
    """,
)
def q_series_linear_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-series least-squares trend over the hourly totals (the
    metric-drift detector a monitoring pipeline runs per series): closed
    form slope = (nΣxy − ΣxΣy)/(nΣx² − (Σx)²) with the hour index as x.

    Determinism: x and the integer moments (Σx, Σx²) are exact bigints;
    the double-valued Σy and Σxy fold each term through DECIMAL(28,12) so
    shuffle order cannot perturb them; the closed form is then one IEEE
    expression per series.  Scale shape: one hourly aggregate (map-side
    combined), one per-series ROWS window to index hours, one skinny
    per-series aggregate — no data-sized shuffle beyond the first."""
    events = load_table(spark, sf_dir, "events")
    agg = events.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("h")
    ).agg(as_double(F.sum(F.col("value").cast(_VAL))).alias("y"))
    x = F.row_number().over(
        Window.partitionBy("event_type").orderBy("h")
    )
    idx = agg.select("event_type", "y", x.alias("x"))
    sums = idx.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y").cast("decimal(28,12)")).cast("double").alias("sy"),
        F.sum((F.col("x") * F.col("y")).cast("decimal(28,12)"))
        .cast("double")
        .alias("sxy"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    # a single-bucket series has zero x-variance: the denominator is 0 and
    # the engines disagree on 0/0 (Spark NaN vs DuckDB NULL/inf, ADVICE
    # r6) — both slope and intercept are undefined there, report NULL
    defined = F.col("n") > 1
    return sums.select(
        "event_type",
        F.col("n").cast("long").alias("n_hours"),
        F.round(F.when(defined, slope), 8).alias("slope"),
        F.round(
            F.when(defined, (F.col("sy") - slope * F.col("sx")) / F.col("n")),
            6,
        ).alias("intercept"),
    )


_EWMA_SPAN = 8  # trailing hours blended; alpha = 1/2 so weights are 2^-k


@register(
    "q_series_ewma",
    oracle=f"""
    WITH agg AS (
      SELECT event_type,
             time_bucket(INTERVAL '1 hour', ts) AS h,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS y
      FROM events GROUP BY 1, 2
    ), contrib AS (
      SELECT a.event_type,
             a.h + k.k * INTERVAL '1 hour' AS h,
             CAST(a.y * POWER(2.0, -k.k) AS DECIMAL(28,12)) AS wy,
             CAST(POWER(2.0, -k.k) AS DECIMAL(28,12)) AS w
      FROM agg a
      CROSS JOIN (SELECT unnest(generate_series(0, {_EWMA_SPAN - 1})) AS k) k
    ), blended AS (
      SELECT c.event_type, c.h,
             CAST(SUM(c.wy) AS DOUBLE) / CAST(SUM(c.w) AS DOUBLE) AS ewma
      FROM contrib c
      JOIN agg p ON p.event_type = c.event_type AND p.h = c.h
      GROUP BY c.event_type, c.h
    )
    SELECT strftime(h, '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           ROUND(ewma, 6) AS ewma
    FROM blended
    """,
)
def q_series_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average of the hourly totals
    (metric smoothing / anomaly-baseline, the monitoring companion of
    q_series_linear_trend): each observed hour blends the trailing
    8 hours' totals with weights 2^-k, normalized over the weights of the
    hours actually present.

    alpha is pinned at 1/2 ON PURPOSE: the weights are exact powers of
    two, so y·2^-k is one IEEE multiply both engines compute identically —
    a general alpha^k via libm ``pow`` would not be bit-portable.  Each
    weighted term folds through DECIMAL(28,12) so shuffle order cannot
    perturb the sums.  Scale shape: the same contribute-forward explode as
    the sliding-window query (each hourly row feeds its next 8 buckets —
    a constant-factor map, no self-join), then one hash aggregate on
    (type, hour); the join back to observed hours prunes the tail buckets
    past the series end."""
    events = load_table(spark, sf_dir, "events")
    agg = events.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("h")
    ).agg(as_double(F.sum(F.col("value").cast(_VAL))).alias("y"))
    ks = F.explode(F.sequence(F.lit(0), F.lit(_EWMA_SPAN - 1))).alias("k")
    contrib = agg.select("event_type", "h", "y", ks).select(
        "event_type",
        (F.col("h") + F.make_interval(hours=F.col("k"))).alias("h"),
        (F.col("y") * F.pow(F.lit(2.0), -F.col("k")))
        .cast("decimal(28,12)")
        .alias("wy"),
        F.pow(F.lit(2.0), -F.col("k")).cast("decimal(28,12)").alias("w"),
    )
    blended = (
        contrib.join(
            agg.select("event_type", "h"), ["event_type", "h"]
        )
        .groupBy("event_type", "h")
        .agg(
            (
                F.sum("wy").cast("double") / F.sum("w").cast("double")
            ).alias("ewma")
        )
    )
    return blended.select(
        F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "event_type",
        F.round("ewma", 6).alias("ewma"),
    )


_FUNNEL_STAGES = ("view", "click", "signup", "purchase")


@register(
    "q_funnel_conversion",
    oracle="""
    WITH s1 AS (
      SELECT user_id, MIN(ts) AS t FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ), s2 AS (
      SELECT e.user_id, MIN(e.ts) AS t
      FROM events e JOIN s1 ON s1.user_id = e.user_id AND e.ts > s1.t
      WHERE e.event_type = 'click' GROUP BY e.user_id
    ), s3 AS (
      SELECT e.user_id, MIN(e.ts) AS t
      FROM events e JOIN s2 ON s2.user_id = e.user_id AND e.ts > s2.t
      WHERE e.event_type = 'signup' GROUP BY e.user_id
    ), s4 AS (
      SELECT e.user_id, MIN(e.ts) AS t
      FROM events e JOIN s3 ON s3.user_id = e.user_id AND e.ts > s3.t
      WHERE e.event_type = 'purchase' GROUP BY e.user_id
    ), counts AS (
      SELECT 1 AS stage, 'view' AS stage_name, COUNT(*) AS n FROM s1
      UNION ALL
      SELECT 2, 'click', COUNT(*) FROM s2
      UNION ALL
      SELECT 3, 'signup', COUNT(*) FROM s3
      UNION ALL
      SELECT 4, 'purchase', COUNT(*) FROM s4
    )
    SELECT stage, stage_name, CAST(n AS BIGINT) AS n_users,
           ROUND(n * 1.0 / LAG(n) OVER (ORDER BY stage), 6) AS conv_rate
    FROM counts
    """,
)
def q_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel over the event stream — the canonical
    clickstream product-analytics query: how many users progress
    view → click → signup → purchase, where each stage must occur
    STRICTLY AFTER the user's entry into the previous stage (a purchase
    before the first qualifying click does not count — set-intersection
    funnels overcount exactly these).  Stage k is the per-user earliest
    qualifying event; output is one row per stage with the user count
    and the stage-over-stage conversion rate.

    Determinism: timestamps and counts are exact; the single division is
    one IEEE double, rounded.  Scale shape: each stage is a pushed-down
    event_type scan (partition/row-group pruning takes most of the table
    off the wire) equi-joined on user_id to the previous stage's
    shrinking (user, t) frame, then a per-user MIN aggregate — shuffle
    keys are user_id throughout, so AQE reuses the same exchange
    partitioning down the chain.  The final 4-row window is driver-scale
    by construction."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts"
    )

    def entry(etype: str, prev: DataFrame | None) -> DataFrame:
        stage = ev.filter(F.col("event_type") == etype)
        if prev is not None:
            stage = stage.join(
                prev.select("user_id", F.col("t").alias("_pt")), "user_id"
            ).filter(F.col("ts") > F.col("_pt"))
        return stage.groupBy("user_id").agg(F.min("ts").alias("t"))

    frames = []
    prev = None
    for etype in _FUNNEL_STAGES:
        prev = entry(etype, prev)
        frames.append(prev)
    counts = None
    for i, (etype, fr) in enumerate(zip(_FUNNEL_STAGES, frames), start=1):
        row = fr.agg(F.count("*").alias("n")).select(
            F.lit(i).alias("stage"),
            F.lit(etype).alias("stage_name"),
            F.col("n"),
        )
        counts = row if counts is None else counts.unionAll(row)
    w = Window.orderBy("stage")
    return counts.select(
        "stage",
        "stage_name",
        F.col("n").cast("long").alias("n_users"),
        F.round(F.col("n") * 1.0 / F.lag("n").over(w), 6).alias("conv_rate"),
    )


@register(
    "q_cohort_retention",
    oracle="""
    WITH ev AS (
      SELECT user_id,
             date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) // 7 AS w
      FROM events
    ), first AS (
      SELECT user_id, MIN(w) AS cw FROM ev GROUP BY user_id
    ), active AS (
      SELECT DISTINCT user_id, w FROM ev
    ), sizes AS (
      SELECT cw, COUNT(*) AS cohort_n FROM first GROUP BY cw
    )
    SELECT f.cw AS cohort_week,
           CAST(a.w - f.cw AS INT) AS week_offset,
           CAST(COUNT(*) AS BIGINT) AS n_active,
           ROUND(COUNT(*) * 1.0 / s.cohort_n, 6) AS retention
    FROM active a
    JOIN first f USING (user_id)
    JOIN sizes s ON s.cw = f.cw
    GROUP BY f.cw, a.w - f.cw, s.cohort_n
    """,
)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort-retention matrix — the other canonical product-
    analytics query next to the funnel: users are cohorted by the week of
    their first event, and each (cohort, week-offset) cell reports how
    many of them were active that many weeks later, as a fraction of the
    cohort.  Week indices are integer day-arithmetic from a fixed epoch
    (no timezone/week-start ambiguity, engine-exact).

    Scale shape: one per-user MIN aggregate, one distinct over (user,
    week) — both shuffle on user_id and AQE reuses the partitioning into
    their join — then a cells×1 aggregate; cohort sizes re-join the
    (tiny, weeks²-sized) cell table, never the events.  The single
    division is one IEEE double, rounded."""
    wk = F.expr("datediff(to_date(ts), DATE '2024-01-01') div 7")
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", wk.alias("w")
    )
    first = ev.groupBy("user_id").agg(F.min("w").alias("cw"))
    active = ev.distinct()
    sizes = first.groupBy("cw").agg(F.count("*").alias("cohort_n"))
    cells = (
        active.join(first, "user_id")
        .groupBy("cw", (F.col("w") - F.col("cw")).alias("off"))
        .agg(F.count("*").alias("n_active"))
    )
    return cells.join(sizes, "cw").select(
        F.col("cw").alias("cohort_week"),
        F.col("off").cast("int").alias("week_offset"),
        F.col("n_active").cast("long").alias("n_active"),
        F.round(F.col("n_active") * 1.0 / F.col("cohort_n"), 6).alias(
            "retention"
        ),
    )


@register(
    "q_type_transition_matrix",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev
      FROM events
    ), pairs AS (
      SELECT prev, event_type AS next FROM ordered WHERE prev IS NOT NULL
    ), tot AS (
      SELECT prev, COUNT(*) AS n_prev FROM pairs GROUP BY prev
    )
    SELECT p.prev AS from_type, p.next AS to_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(COUNT(*) * 1.0 / t.n_prev, 6) AS prob
    FROM pairs p JOIN tot t ON t.prev = p.prev
    GROUP BY p.prev, p.next, t.n_prev
    """,
)
def q_type_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event sequences
    — the behavioral-model input the funnel and cohort queries sit on top
    of: for every (from_type → to_type) pair of CONSECUTIVE events of the
    same user (ordered by ts with event_id as the deterministic
    tie-break), the transition count and row-normalized probability.
    Anomalous transition mass (error→error loops, purchase→purchase
    replays) is the classic sequence-quality signal.

    Determinism: integer counts; ties in ts broken by event_id so both
    engines see the same successor; one rounded IEEE division per cell.
    Scale shape: one per-user sort window (the unavoidable cost of
    sequence order — user_id shards it), then a types²-sized hash
    aggregate with map-side combine; row totals re-join the tiny cell
    table.  The transition matrix is types² ≈ 25 rows at any corpus
    size."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = load_table(spark, sf_dir, "events").select(
        "event_type", F.lag("event_type").over(w).alias("prev")
    )
    pairs = ordered.filter(F.col("prev").isNotNull()).select(
        F.col("prev").alias("from_type"),
        F.col("event_type").alias("to_type"),
    )
    tot = pairs.groupBy("from_type").agg(F.count("*").alias("n_prev"))
    return (
        pairs.groupBy("from_type", "to_type")
        .agg(F.count("*").alias("n"))
        .join(F.broadcast(tot), "from_type")
        .select(
            "from_type",
            "to_type",
            F.col("n").cast("long").alias("n"),
            F.round(F.col("n") * 1.0 / F.col("n_prev"), 6).alias("prob"),
        )
    )


@register(
    "q_user_value_deciles",
    oracle="""
    WITH per_user AS (
      SELECT user_id, SUM(CAST(value AS DECIMAL(18,6))) AS total
      FROM events WHERE event_type = 'purchase'
      GROUP BY user_id
    ), ranked AS (
      SELECT user_id, total,
             NTILE(10) OVER (ORDER BY total DESC, user_id) AS decile
      FROM per_user
    ), tot AS (
      SELECT SUM(total) AS grand FROM per_user
    )
    SELECT decile,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(total) AS DOUBLE) AS decile_value,
           ROUND(CAST(SUM(total) AS DOUBLE) / CAST(tot.grand AS DOUBLE), 6)
             AS value_share
    FROM ranked, tot
    GROUP BY decile, tot.grand
    """,
)
def q_user_value_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-concentration deciles (the "whale curve"): users ranked by
    total purchase value and cut into 10 equal-count buckets; each decile
    reports its user count, summed value, and share of all value — the
    concentration read that decides whether revenue (or, in a data
    pipeline, token mass per source/author) hinges on a handful of heavy
    accounts.  NTILE ties are broken by user_id so both engines assign
    identical buckets.

    Determinism: per-user totals are DECIMAL sums (shuffle-order-proof);
    the rank order is total-desc with a unique tie-break; decile sums
    stay DECIMAL until the final double division.  Scale shape (r7 fix —
    the old global un-partitioned NTILE planned Exchange SinglePartition,
    a one-task sort at 10⁹ users): exact global ranks come from the
    two-phase prefix machinery (range shuffle → parallel per-partition
    rank → driver offsets bounded by #partitions), and the NTILE bucket
    is pure integer arithmetic on that rank — same assignment as
    NTILE(10), every stage parallel.  The grand total falls out of the
    driver-side subtotals, so no Exchange SinglePartition anywhere."""
    from .twophase import two_phase_prefix

    per_user = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.sum(F.col("value").cast(_VAL)).alias("total"))
    )
    base, totals = two_phase_prefix(
        per_user,
        [],
        [F.desc("total"), F.asc("user_id")],
        [("_before", F.lit(1)), ("_val", F.col("total"))],
    )
    n = int(totals["_before"].get((), 0))
    grand = totals["_val"].get((), None)
    q, rem = divmod(n, 10)
    boundary = rem * (q + 1)
    # NTILE(10) over n rows: the first `rem` buckets hold q+1 rows, the
    # rest hold q.  rank is 1-based; integer `div` keeps this exact.
    rank = F.col("_before") + F.lit(1)
    ranked = base.withColumn(
        "decile",
        F.when(
            rank <= F.lit(boundary),
            F.expr(f"(_before div {q + 1}) + 1"),
        )
        .otherwise(F.expr(f"{rem} + ((_before - {boundary}) div {max(q, 1)}) + 1"))
        .cast("int"),
    )
    grand_d = float(grand) if grand is not None else 1.0
    return (
        ranked.groupBy("decile")
        .agg(
            F.count("*").cast("long").alias("n_users"),
            F.sum("total").alias("_dv"),
        )
        .select(
            "decile",
            "n_users",
            F.col("_dv").cast("double").alias("decile_value"),
            F.round(
                F.col("_dv").cast("double") / F.lit(grand_d),
                6,
            ).alias("value_share"),
        )
    )


@register(
    "q_seasonality_profile",
    oracle="""
    WITH e AS (
      SELECT dayofweek(ts) AS dow, EXTRACT(hour FROM ts) AS hod,
             CAST(value AS DECIMAL(18,2)) AS v
      FROM events
    ), tot AS (
      SELECT COUNT(*) AS n FROM e
    )
    SELECT CAST(dow AS INT) AS dow, CAST(hod AS INT) AS hour_of_day,
           COUNT(*) AS n_events,
           CAST(SUM(v) AS DOUBLE) AS total_value,
           ROUND(CAST(SUM(v) AS DOUBLE) / COUNT(*), 4) AS avg_value,
           CAST(COUNT(*) * 10000 // t.n AS BIGINT) AS share_bp
    FROM e CROSS JOIN tot t
    GROUP BY dow, hod, t.n
    """,
)
def q_seasonality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly seasonality decomposition — the (day-of-week × hour-of-day)
    activity/value profile a traffic forecaster or anomaly detector
    baselines against.  Calendar pinning is the cross-engine edge here:
    Spark's ``dayofweek`` is 1=Sunday..7 while DuckDB's is 0=Sunday..6,
    so the engine subtracts 1 to land on one convention; value sums stay
    decimal until one double division, activity share is an exact
    integer basis-point cross-multiplication.

    Scale shape: one partial-aggregated exchange onto at most 168
    (dow, hour) keys plus a 1-row broadcast total — the profile is
    constant-size output at any corpus size."""
    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        (F.dayofweek("ts") - 1).alias("dow"),
        F.hour("ts").alias("hour_of_day"),
        F.col("value").cast("decimal(18,2)").alias("v"),
    )
    tot = e.agg(F.count("*").alias("n"))
    return (
        e.groupBy("dow", "hour_of_day")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("v").alias("_sv"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("dow").cast("int").alias("dow"),
            F.col("hour_of_day").cast("int").alias("hour_of_day"),
            "n_events",
            as_double(F.col("_sv")).alias("total_value"),
            F.round(as_double(F.col("_sv")) / F.col("n_events"), 4).alias(
                "avg_value"
            ),
            F.expr("CAST(n_events * 10000 DIV n AS BIGINT)").alias(
                "share_bp"
            ),
        )
    )


@register(
    "q_hourly_ohlc",
    oracle="""
    SELECT event_type,
           strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND((MIN({'t': ts, 'e': event_id, 'v': value})).v, 4) AS open,
           ROUND(MAX(value), 4) AS high,
           ROUND(MIN(value), 4) AS low,
           ROUND((MAX({'t': ts, 'e': event_id, 'v': value})).v, 4) AS close
    FROM events
    GROUP BY event_type, date_trunc('hour', ts)
    """,
)
def q_hourly_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC bars per event type — the open/high/low/close rollup
    every market-data and telemetry downsampler materializes (the
    continuous-aggregate staple TimescaleDB ships as candlestick
    helpers).  Open/close are STRUCT-extremum aggregates over
    (ts, event_id, value) — deterministic under same-timestamp ties via
    the event_id component, and computed map-side like any min/max (no
    first()/last() window over raw events, no per-group sort).  One hash
    exchange on the (type, hour) key space; at 100 TB this is the q1
    shape with four extra extremum columns."""
    ev = load_table(spark, sf_dir, "events")
    key = F.struct("ts", "event_id", F.col("value").alias("v"))
    return (
        ev.groupBy(
            "event_type", F.date_trunc("hour", F.col("ts")).alias("b")
        )
        .agg(
            F.count("*").alias("n"),
            F.round(F.min(key)["v"], 4).alias("open"),
            F.round(F.max("value"), 4).alias("high"),
            F.round(F.min("value"), 4).alias("low"),
            F.round(F.max(key)["v"], 4).alias("close"),
        )
        .select(
            "event_type",
            F.date_format("b", "yyyy-MM-dd HH:mm:ss").alias("bucket"),
            "n",
            "open",
            "high",
            "low",
            "close",
        )
    )


# ---------------------------------------------------------------------------
# Inter-arrival time distribution per event type (r15): the latency /
# engagement-cadence profile every behavioral pipeline reports.
# ---------------------------------------------------------------------------
@register(
    "q_interarrival_stats",
    oracle="""
    WITH d AS (
      SELECT event_type,
             CAST(epoch_us(ts) - epoch_us(LAG(ts) OVER (
               PARTITION BY user_id ORDER BY ts, event_id)) AS BIGINT)
               // 1000000 AS dt_sec
      FROM events
    ), g AS (SELECT event_type, dt_sec FROM d WHERE dt_sec IS NOT NULL)
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_gaps,
           ROUND(quantile_cont(dt_sec, 0.5), 4) AS p50_sec,
           ROUND(quantile_cont(dt_sec, 0.9), 4) AS p90_sec,
           CAST(MAX(dt_sec) AS BIGINT) AS max_sec,
           ROUND(SUM(dt_sec) * 1.0 / COUNT(*), 4) AS mean_sec
    FROM g
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q_interarrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inter-arrival gaps, summarized per event type — the
    cadence profile (session-timeout calibration, bot detection, queue
    sizing) every event pipeline derives before picking streaming
    watermarks.  The gap attributes to the LATER event's type.

    Exactness: gaps are exact integer seconds (micros difference with
    integer floor-division — never a double subtraction of epoch
    floats); the interpolated percentiles follow the funnel
    time-to-convert convention (Spark ``percentile`` ≡ DuckDB
    ``quantile_cont``, both rounded at 4 dp over INTEGER inputs); the
    mean is an exact integer sum divided once.

    Scale shape: one lag window PARTITIONED BY user_id (per-user frames,
    hot-key-exposed exactly like sessionization — the skew tier's
    collapse rows bound that family), then one hash aggregate on the
    ≤5-key event_type space with map-side combine.  No global sort, no
    unpartitioned window."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts"), F.col("event_id"))
    d = ev.select(
        "event_type",
        F.expr(
            "CAST(unix_micros(ts) AS BIGINT)"
        ).alias("us"),
        F.lag(F.expr("unix_micros(ts)")).over(w).alias("prev_us"),
    ).filter(F.col("prev_us").isNotNull()).select(
        "event_type",
        F.expr("CAST(us - prev_us AS BIGINT) div 1000000").alias("dt_sec"),
    )
    return (
        d.groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_gaps"),
            F.round(F.percentile("dt_sec", F.lit(0.5)), 4).alias("p50_sec"),
            F.round(F.percentile("dt_sec", F.lit(0.9)), 4).alias("p90_sec"),
            F.max("dt_sec").cast("long").alias("max_sec"),
            F.round(F.sum("dt_sec") * 1.0 / F.count("*"), 4).alias(
                "mean_sec"
            ),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Maximum drawdown per event type over the hourly revenue series (r15):
# the peak-to-trough risk statistic, computed in exact integer cents.
# ---------------------------------------------------------------------------
@register(
    "q_max_drawdown",
    oracle="""
    WITH h AS (
      SELECT event_type, date_trunc('hour', ts) AS hr,
             CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT)
               AS cents
      FROM events GROUP BY 1, 2
    ), r AS (
      SELECT event_type, hr, cents,
             MAX(cents) OVER (PARTITION BY event_type ORDER BY hr
                              ROWS UNBOUNDED PRECEDING) AS peak
      FROM h
    ), dd AS (
      SELECT event_type, hr,
             CASE WHEN peak > 0
                  THEN (peak - cents) * 10000 // peak ELSE 0 END AS dd_bp,
             peak
      FROM r
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_hours,
           CAST(MAX(peak) AS BIGINT) AS peak_cents,
           CAST(MAX(dd_bp) AS BIGINT) AS max_drawdown_bp,
           strftime(MIN(CASE WHEN dd_bp = (SELECT MAX(d2.dd_bp) FROM dd d2
                                           WHERE d2.event_type = dd.event_type)
                             THEN hr END),
                    '%Y-%m-%d %H:%M:%S') AS drawdown_hour
    FROM dd
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown of the hourly revenue series per event type — the
    peak-to-trough statistic (risk reporting, anomaly triage: "how far
    below its running peak did this stream fall, and when").

    Exactness: hourly totals are exact integer CENTS (the KS-drift
    quantization, proven cross-engine); the running peak and the
    drawdown basis points are integer window/division arithmetic; the
    argmax hour is deterministic (earliest hour achieving the max,
    via a struct extremum on (dd_bp, −epoch) — no nondeterministic
    max_by).

    Scale shape: one hash aggregate to the (type, hour) frame (map-side
    combined — the same exchange as OHLC), one running-max window over
    that TIME-BOUNDED frame (cardinality = hours × types, the KS-drift
    domain-bound argument), one final ≤5-row reduce."""
    ev = load_table(spark, sf_dir, "events")
    h = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hr")
    ).agg(
        F.sum(
            F.round(F.col("value") * 100, 0).cast("long")
        ).alias("cents")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hr")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    dd = h.select(
        "event_type",
        "hr",
        F.max("cents").over(w).alias("peak"),
        "cents",
    ).select(
        "event_type",
        "hr",
        "peak",
        F.when(
            F.col("peak") > 0,
            F.expr("(peak - cents) * 10000 div peak"),
        )
        .otherwise(0)
        .alias("dd_bp"),
    )
    best = F.max(
        F.struct(
            F.col("dd_bp"),
            (-F.expr("unix_micros(hr)")).alias("neg_us"),
        )
    )
    return (
        dd.groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_hours"),
            F.max("peak").cast("long").alias("peak_cents"),
            best.alias("b"),
        )
        .select(
            "event_type",
            "n_hours",
            "peak_cents",
            F.col("b.dd_bp").cast("long").alias("max_drawdown_bp"),
            F.date_format(
                F.timestamp_micros(-F.col("b.neg_us")),
                "yyyy-MM-dd HH:mm:ss",
            ).alias("drawdown_hour"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Burstiness (Fano factor) of the hourly arrival process per type (r15).
# ---------------------------------------------------------------------------
@register(
    "q_fano_burstiness",
    oracle="""
    WITH h AS (
      SELECT event_type, date_trunc('hour', ts) AS hr,
             CAST(COUNT(*) AS DECIMAL(38,0)) AS c
      FROM events GROUP BY 1, 2
    ), g AS (
      SELECT event_type,
             CAST(COUNT(*) AS DECIMAL(38,0)) AS n,
             SUM(c) AS s,
             SUM(c * c) AS s2
      FROM h GROUP BY event_type
    )
    SELECT event_type,
           CAST(n AS BIGINT) AS n_hours,
           CAST(s AS BIGINT) AS n_events,
           ROUND(CAST(s AS DOUBLE) / CAST(n AS DOUBLE), 6) AS mean_per_hour,
           ROUND(CAST(n * s2 - s * s AS DOUBLE)
                 / (CAST(n AS DOUBLE) * CAST(s AS DOUBLE)), 6) AS fano
    FROM g
    ORDER BY event_type
    """,
)
def q_fano_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fano factor (variance-to-mean ratio, Fano 1947 — public method) of
    the hourly arrival counts per event type, over OBSERVED hours (empty
    hours are the gap-fill operator's concern; this is the burstiness
    screen run before choosing between them): a Poisson process scores
    ≈1, bursty/bot traffic ≫1, rate-limited traffic ≪1.

    Exactness: Fano = (n·Σc² − (Σc)²)/(n·Σc) — every sum an exact
    DECIMAL(38,0) integer (Σc² ≤ 10³⁶ even at 10¹² events/hour-bucket),
    two rounded double divisions at the very end.

    Scale shape: one (type, hour) hash aggregate (the OHLC exchange),
    one rollup on the ≤5-key type space — both map-side combined; no
    window at all."""
    h = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.date_trunc("hour", F.col("ts")).alias("hr"))
        .agg(F.count("*").cast("decimal(38,0)").alias("c"))
    )
    g = h.groupBy("event_type").agg(
        F.count("*").cast("decimal(38,0)").alias("n"),
        F.sum("c").cast("decimal(38,0)").alias("s"),
        F.sum(F.col("c") * F.col("c")).cast("decimal(38,0)").alias("s2"),
    )
    return g.select(
        "event_type",
        F.col("n").cast("long").alias("n_hours"),
        F.col("s").cast("long").alias("n_events"),
        F.round(
            F.col("s").cast("double") / F.col("n").cast("double"), 6
        ).alias("mean_per_hour"),
        F.round(
            (F.col("n") * F.col("s2") - F.col("s") * F.col("s")).cast(
                "double"
            )
            / (F.col("n").cast("double") * F.col("s").cast("double")),
            6,
        ).alias("fano"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# Lag-1 autocorrelation of the hourly series per type (r15).
# ---------------------------------------------------------------------------
@register(
    "q_autocorr_lag1",
    oracle="""
    WITH h AS (
      SELECT event_type, date_trunc('hour', ts) AS hr,
             CAST(COUNT(*) AS DECIMAL(38,0)) AS c
      FROM events GROUP BY 1, 2
    ), p AS (
      SELECT a.event_type, a.c AS x, b.c AS y
      FROM h a JOIN h b
        ON a.event_type = b.event_type
       AND b.hr = a.hr + INTERVAL 1 HOUR
    ), g AS (
      SELECT event_type,
             CAST(COUNT(*) AS DECIMAL(38,0)) AS n,
             SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * x) AS sxx, SUM(y * y) AS syy, SUM(x * y) AS sxy
      FROM p GROUP BY event_type
    )
    SELECT event_type,
           CAST(n AS BIGINT) AS n_pairs,
           ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                 / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                        * CAST(n * syy - sy * sy AS DOUBLE)), 6) AS r1
    FROM g
    ORDER BY event_type
    """,
)
def q_autocorr_lag1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation of the hourly count series per event type —
    the persistence screen (is this hour's load predictive of the next?)
    every capacity model and anomaly detector starts from.  Pairs are
    CONSECUTIVE PRESENT hours (an equi-join on hr+1h; series with gaps
    contribute only their adjacent runs — the gap-fill operator exists
    for the padded variant).

    Exactness: Pearson r over the paired frame from six exact
    DECIMAL(38,0) sums, one rounded double expression — the same
    cross-multiplied form as the Zipf/trend fits.

    Scale shape: one (type, hour) hash aggregate, an equi-join of that
    TIME-BOUNDED frame to itself on (type, hr+1) — both sides share the
    aggregate's partitioning — and a ≤5-key rollup.  No window."""
    h = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.date_trunc("hour", F.col("ts")).alias("hr"))
        .agg(F.count("*").cast("decimal(38,0)").alias("c"))
    )
    a = h.select("event_type", "hr", F.col("c").alias("x"))
    b = h.select(
        "event_type",
        (F.col("hr") - F.expr("INTERVAL 1 HOUR")).alias("hr"),
        F.col("c").alias("y"),
    )
    p = a.join(b, ["event_type", "hr"])
    g = p.groupBy("event_type").agg(
        F.count("*").cast("decimal(38,0)").alias("n"),
        F.sum("x").cast("decimal(38,0)").alias("sx"),
        F.sum("y").cast("decimal(38,0)").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("decimal(38,0)").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("decimal(38,0)").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("decimal(38,0)").alias("sxy"),
    )
    return g.select(
        "event_type",
        F.col("n").cast("long").alias("n_pairs"),
        F.round(
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
                "double"
            )
            / F.sqrt(
                (
                    F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
                ).cast("double")
                * (
                    F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
                ).cast("double")
            ),
            6,
        ).alias("r1"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# CUSUM change-point estimate per type over the hourly series (r15).
# ---------------------------------------------------------------------------
@register(
    "q_cusum_changepoint",
    oracle="""
    WITH h AS (
      SELECT event_type, date_trunc('hour', ts) AS hr,
             CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT))
                  AS DECIMAL(38,0)) AS x
      FROM events GROUP BY 1, 2
    ), g AS (
      SELECT event_type, CAST(COUNT(*) AS DECIMAL(38,0)) AS n,
             SUM(x) AS s
      FROM h GROUP BY event_type
    ), c AS (
      SELECT h.event_type, h.hr, g.n, g.s,
             SUM(h.x) OVER (PARTITION BY h.event_type ORDER BY h.hr
                            ROWS UNBOUNDED PRECEDING) AS cum,
             CAST(ROW_NUMBER() OVER (PARTITION BY h.event_type ORDER BY h.hr)
                  AS DECIMAL(38,0)) AS k
      FROM h JOIN g USING (event_type)
    ), dev AS (
      SELECT event_type, hr, n, s,
             ABS(n * cum - k * s) AS adev
      FROM c
    )
    SELECT event_type,
           CAST(MAX(n) AS BIGINT) AS n_hours,
           strftime(MIN(CASE WHEN adev = (SELECT MAX(d2.adev) FROM dev d2
                                          WHERE d2.event_type = dev.event_type)
                             THEN hr END), '%Y-%m-%d %H:%M:%S')
             AS changepoint_hour,
           -- HUGEINT floor division: DuckDB's // on DECIMAL operands is
           -- a true division (the q_part_value_share off-by-one trap)
           CAST(CAST(MAX(adev) * 10000 AS HUGEINT)
                // CAST(MAX(n) * MAX(s) AS HUGEINT) AS BIGINT)
             AS max_dev_bp
    FROM dev
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point estimate (Page 1954, public method) per event
    type over the hourly revenue series: the hour k maximizing
    |Σᵢ≤k(xᵢ − x̄)| is the classic single-change-point location (binary
    segmentation's first split), and the max deviation relative to the
    series total is the shift magnitude — the alarm statistic completing
    the drift family's TEMPORAL axis (PSI/KS/KL compare snapshots; CUSUM
    finds WHEN the series moved).

    Exactness: the deviation is cross-multiplied into exact integers —
    n·cum_k − k·S (DECIMAL(38,0); n·cum ≤ 10²⁴ at 10¹² events/hour) —
    so the argmax can never flip on a float; the reported magnitude is
    exact floor basis points of n·S; argmax hour deterministic (earliest
    on ties, struct extremum on (adev, −epoch)).

    Scale shape: one (type, hour) hash aggregate, one per-type window
    pair (cumsum + row_number share ONE sort) over the TIME-BOUNDED
    hourly frame, one ≤types reduce.  No global sort, no self-join."""
    h = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.date_trunc("hour", F.col("ts")).alias("hr"))
        .agg(
            F.sum(F.round(F.col("value") * 100, 0).cast("long"))
            .cast("decimal(38,0)")
            .alias("x")
        )
    )
    g = h.groupBy("event_type").agg(
        F.count("*").cast("decimal(38,0)").alias("n"),
        F.sum("x").cast("decimal(38,0)").alias("s"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hr")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = Window.partitionBy("event_type").orderBy("hr")
    c = h.join(g, "event_type").select(
        "event_type",
        "hr",
        "n",
        "s",
        F.sum("x").over(w).alias("cum"),
        F.row_number().over(wn).cast("decimal(38,0)").alias("k"),
    )
    dev = c.select(
        "event_type",
        "hr",
        "n",
        "s",
        F.abs(F.col("n") * F.col("cum") - F.col("k") * F.col("s")).alias(
            "adev"
        ),
    )
    best = F.max(
        F.struct(
            F.col("adev"), (-F.expr("unix_micros(hr)")).alias("neg_us")
        )
    )
    return (
        dev.groupBy("event_type")
        .agg(
            F.max("n").cast("long").alias("n_hours"),
            best.alias("b"),
            F.max("n").alias("nd"),
            F.max("s").alias("sd"),
        )
        .select(
            "event_type",
            "n_hours",
            F.date_format(
                F.timestamp_micros(-F.col("b.neg_us")), "yyyy-MM-dd HH:mm:ss"
            ).alias("changepoint_hour"),
            F.expr(
                "CAST(CAST(b.adev * 10000 AS DECIMAL(38,0))"
                " div CAST(nd * sd AS DECIMAL(38,0)) AS BIGINT)"
            ).alias("max_dev_bp"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Spearman rank correlation between two hourly series (r15): exact
# midranks over bounded domains — the robust companion to q_autocorr_lag1.
# ---------------------------------------------------------------------------
_SPEARMAN_A = "view"
_SPEARMAN_B = "purchase"


@register(
    "q_spearman_hourly_correlation",
    oracle=f"""
    WITH h AS (
      SELECT date_trunc('hour', ts) AS hr,
             CAST(SUM(CASE WHEN event_type = '{_SPEARMAN_A}' THEN 1 ELSE 0 END)
                  AS BIGINT) AS x,
             CAST(SUM(CASE WHEN event_type = '{_SPEARMAN_B}' THEN 1 ELSE 0 END)
                  AS BIGINT) AS y
      FROM events
      WHERE event_type IN ('{_SPEARMAN_A}', '{_SPEARMAN_B}')
      GROUP BY 1
    ), rx AS (
      SELECT x AS v,
             2 * COALESCE(SUM(c) OVER (ORDER BY x
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             + c + 1 AS r2
      FROM (SELECT x, CAST(COUNT(*) AS DECIMAL(38,0)) AS c
            FROM h GROUP BY x)
    ), ry AS (
      SELECT y AS v,
             2 * COALESCE(SUM(c) OVER (ORDER BY y
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             + c + 1 AS r2
      FROM (SELECT y, CAST(COUNT(*) AS DECIMAL(38,0)) AS c
            FROM h GROUP BY y)
    ), r AS (
      SELECT rx.r2 AS a, ry.r2 AS b
      FROM h JOIN rx ON h.x = rx.v JOIN ry ON h.y = ry.v
    ), g AS (
      SELECT CAST(COUNT(*) AS DECIMAL(38,0)) AS n,
             SUM(a) AS sa, SUM(b) AS sb,
             SUM(a * a) AS saa, SUM(b * b) AS sbb, SUM(a * b) AS sab
      FROM r
    )
    SELECT CAST(n AS BIGINT) AS n_hours,
           ROUND(CAST(n * sab - sa * sb AS DOUBLE)
                 / sqrt(CAST(n * saa - sa * sa AS DOUBLE)
                        * CAST(n * sbb - sb * sb AS DOUBLE)), 6)
             AS spearman_rho
    FROM g
    """,
)
def q_spearman_hourly_correlation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Spearman rank correlation (1904, public method) between the
    '{_SPEARMAN_A}' and '{_SPEARMAN_B}' hourly count series — the
    robust do-views-drive-purchases signal (Pearson on RANKS survives
    the heavy-tailed hours that distort q_autocorr_lag1's moment-based
    form).  Ranks are exact MIDRANKS carried as the integer 2r (ties
    stay integral): r2(v) = 2·(#smaller) + (#equal) + 1.

    Exactness: hourly counts, midranks, and all six Pearson sums are
    exact DECIMAL(38,0) integers; one rounded double expression.

    Scale shape: one hour-keyed aggregate (TIME-BOUNDED frame), two
    cumulative windows over DISTINCT-COUNT-VALUE domains (each bounded
    by the value domain, the KS/Mann-Whitney bound), two equi-joins
    back on the value, one 1-row reduce.  The raw events are touched
    once; nothing event-scale is ever sorted."""
    h = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin(_SPEARMAN_A, _SPEARMAN_B))
        .groupBy(F.date_trunc("hour", F.col("ts")).alias("hr"))
        .agg(
            F.sum(
                F.when(F.col("event_type") == _SPEARMAN_A, 1).otherwise(0)
            )
            .cast("long")
            .alias("x"),
            F.sum(
                F.when(F.col("event_type") == _SPEARMAN_B, 1).otherwise(0)
            )
            .cast("long")
            .alias("y"),
        )
    )

    def midranks(col: str) -> DataFrame:
        per = h.groupBy(col).agg(
            F.count("*").cast("decimal(38,0)").alias("c")
        )
        w = Window.orderBy(col).rowsBetween(Window.unboundedPreceding, -1)
        return per.select(
            F.col(col).alias("v"),
            (
                2
                * F.coalesce(
                    F.sum("c").over(w), F.lit(0).cast("decimal(38,0)")
                )
                + F.col("c")
                + 1
            ).alias("r2"),
        )

    rx = midranks("x").select(
        F.col("v").alias("x"), F.col("r2").alias("a")
    )
    ry = midranks("y").select(
        F.col("v").alias("y"), F.col("r2").alias("b")
    )
    r = h.join(F.broadcast(rx), "x").join(F.broadcast(ry), "y")
    g = r.agg(
        F.count("*").cast("decimal(38,0)").alias("n"),
        F.sum("a").cast("decimal(38,0)").alias("sa"),
        F.sum("b").cast("decimal(38,0)").alias("sb"),
        F.sum(F.col("a") * F.col("a")).cast("decimal(38,0)").alias("saa"),
        F.sum(F.col("b") * F.col("b")).cast("decimal(38,0)").alias("sbb"),
        F.sum(F.col("a") * F.col("b")).cast("decimal(38,0)").alias("sab"),
    )
    return g.select(
        F.col("n").cast("long").alias("n_hours"),
        F.round(
            (F.col("n") * F.col("sab") - F.col("sa") * F.col("sb")).cast(
                "double"
            )
            / F.sqrt(
                (
                    F.col("n") * F.col("saa") - F.col("sa") * F.col("sa")
                ).cast("double")
                * (
                    F.col("n") * F.col("sbb") - F.col("sb") * F.col("sb")
                ).cast("double")
            ),
            6,
        ).alias("spearman_rho"),
    )


# ---------------------------------------------------------------------------
# r16: Kendall tau-b between the same two hourly series Spearman uses —
# the concordance-based rank correlation (robust to the monotone-transform
# family, finer tie handling than rho).
# ---------------------------------------------------------------------------
@register(
    "q_kendall_tau_hourly",
    oracle=f"""
    WITH h AS (
      SELECT date_trunc('hour', ts) AS hr,
             CAST(SUM(CASE WHEN event_type = '{_SPEARMAN_A}' THEN 1 ELSE 0 END)
                  AS BIGINT) AS x,
             CAST(SUM(CASE WHEN event_type = '{_SPEARMAN_B}' THEN 1 ELSE 0 END)
                  AS BIGINT) AS y
      FROM events
      WHERE event_type IN ('{_SPEARMAN_A}', '{_SPEARMAN_B}')
      GROUP BY 1
    ), pairs AS (
      SELECT CAST(SUM(CASE WHEN (a.x - b.x) * (a.y - b.y) > 0
                           THEN 1 ELSE 0 END) AS BIGINT) AS c,
             CAST(SUM(CASE WHEN (a.x - b.x) * (a.y - b.y) < 0
                           THEN 1 ELSE 0 END) AS BIGINT) AS d
      FROM h a JOIN h b ON a.hr < b.hr
    ), nn AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n FROM h
    ), tx AS (
      SELECT CAST(SUM(t * (t - 1) / 2) AS BIGINT) AS n1
      FROM (SELECT COUNT(*) AS t FROM h GROUP BY x)
    ), ty AS (
      SELECT CAST(SUM(t * (t - 1) / 2) AS BIGINT) AS n2
      FROM (SELECT COUNT(*) AS t FROM h GROUP BY y)
    )
    SELECT n AS n_hours, c AS concordant, d AS discordant,
           ROUND((c - d) * 1.0
                 / sqrt((n * (n - 1) / 2 - n1) * 1.0
                        * (n * (n - 1) / 2 - n2)), 6) AS kendall_tau_b
    FROM pairs, nn, tx, ty
    """,
)
def q_kendall_tau_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau-b between the hourly view-count and purchase-count
    series — the concordance form of rank correlation (every hour pair
    votes concordant/discordant), with the standard tie corrections in
    the denominator.  Completes the correlation triad (Pearson
    q_autocorr_lag1, Spearman rho, Kendall tau).

    Exactness: concordant/discordant/tie counts are pure integers; ONE
    rounded double expression at the end.

    Scale shape: the pair enumeration is a self-join of the HOURLY frame
    (time-domain bounded — ~672 rows for the corpus month regardless of
    corpus size, so the quadratic term is a constant ~225k comparisons),
    after a single (hour) hash aggregate over the events scan.  The tie
    terms are two value-domain aggregates.  Corpus growth only widens
    the map-side combine."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin(_SPEARMAN_A, _SPEARMAN_B)
    )
    h = e.groupBy(F.date_trunc("hour", F.col("ts")).alias("hr")).agg(
        F.sum(
            F.when(F.col("event_type") == _SPEARMAN_A, 1).otherwise(0)
        ).alias("x"),
        F.sum(
            F.when(F.col("event_type") == _SPEARMAN_B, 1).otherwise(0)
        ).alias("y"),
    )
    a = h.select(F.col("hr").alias("ahr"), F.col("x").alias("ax"),
                 F.col("y").alias("ay"))
    b = h.select(F.col("hr").alias("bhr"), F.col("x").alias("bx"),
                 F.col("y").alias("by"))
    prod = (F.col("ax") - F.col("bx")) * (F.col("ay") - F.col("by"))
    pairs = (
        a.join(F.broadcast(b), F.col("ahr") < F.col("bhr"))
        .agg(
            F.sum(F.when(prod > 0, 1).otherwise(0)).alias("c"),
            F.sum(F.when(prod < 0, 1).otherwise(0)).alias("d"),
        )
    )
    nn = h.agg(F.count("*").alias("n"))
    tx = (
        h.groupBy("x").agg(F.count("*").alias("t"))
        .agg(F.sum(F.expr("t * (t - 1) div 2")).alias("n1"))
    )
    ty = (
        h.groupBy("y").agg(F.count("*").alias("t"))
        .agg(F.sum(F.expr("t * (t - 1) div 2")).alias("n2"))
    )
    n0 = F.expr("n * (n - 1) div 2")
    return (
        pairs.crossJoin(F.broadcast(nn))
        .crossJoin(F.broadcast(tx))
        .crossJoin(F.broadcast(ty))
        .select(
            F.col("n").alias("n_hours"),
            F.col("c").alias("concordant"),
            F.col("d").alias("discordant"),
            F.round(
                (F.col("c") - F.col("d"))
                * 1.0
                / F.sqrt(
                    (n0 - F.col("n1")) * 1.0 * (n0 - F.col("n2"))
                ),
                6,
            ).alias("kendall_tau_b"),
        )
    )


# ---------------------------------------------------------------------------
# r16: per-state entropy of the next-event distribution — the
# sequence-predictability summary on top of q_type_transition_matrix.
# ---------------------------------------------------------------------------
@register(
    "q_transition_entropy",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev
      FROM events
    ), pairs AS (
      SELECT prev, event_type AS next FROM ordered WHERE prev IS NOT NULL
    ), cells AS (
      SELECT prev, next, CAST(COUNT(*) AS BIGINT) AS n
      FROM pairs GROUP BY prev, next
    ), folded AS (
      SELECT prev,
             CAST(SUM(n) AS BIGINT) AS t,
             CAST(COUNT(*) AS BIGINT) AS k,
             list_reduce(list(ROUND(n * ln(n), 9) ORDER BY next),
                         (a, b) -> a + b) AS sum_nlnn
      FROM cells GROUP BY prev
    )
    SELECT prev AS from_type, t AS n_transitions, k AS n_next_types,
           ROUND(ln(t) - sum_nlnn / t, 6) AS entropy_nats,
           ROUND(CASE WHEN k > 1
                      THEN (ln(t) - sum_nlnn / t) / ln(k)
                      ELSE 0.0 END, 6) AS entropy_normalized
    FROM folded
    ORDER BY from_type
    """,
)
def q_transition_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of each state's NEXT-event distribution over the
    per-user event sequences — the one-number predictability summary of
    the Markov matrix: H(next|prev) = ln T − (Σ n·ln n)/T per prev state,
    plus the ln(k)-normalized form ([0,1], comparable across states with
    different fan-out).  Low entropy = deterministic flows (bot replay);
    high = organic browsing.

    Determinism recipe: per-cell n·ln n terms are rounded to 9 and summed
    by a left fold over the NEXT-TYPE-ORDERED ≤5-element list in both
    engines (the q_unigram_drift_kl fold pattern) — never a shuffle-order
    double SUM.

    Scale shape: one per-user sequence window (partitioned by user_id —
    bounded per-user frames), a (prev, next) hash aggregate onto ≤25
    cells, then 5-row folds.  Identical skeleton to the transition
    matrix it annotates."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        load_table(spark, sf_dir, "events")
        .select(
            "user_id",
            "ts",
            "event_id",
            F.col("event_type").alias("next"),
            F.lag("event_type").over(w).alias("prev"),
        )
        .filter(F.col("prev").isNotNull())
    )
    cells = pairs.groupBy("prev", "next").agg(F.count("*").alias("n"))
    folded = cells.groupBy("prev").agg(
        F.sum("n").alias("t"),
        F.count("*").alias("k"),
        F.sort_array(
            F.collect_list(
                F.struct(
                    "next",
                    F.round(
                        F.col("n") * F.log(F.col("n").cast("double")), 9
                    ).alias("nlnn"),
                )
            )
        ).alias("lst"),
    )
    sum_nlnn = F.aggregate(
        F.transform("lst", lambda s: s["nlnn"]), F.lit(0.0), lambda a, b: a + b
    )
    ent = F.log(F.col("t").cast("double")) - sum_nlnn / F.col("t")
    return folded.select(
        F.col("prev").alias("from_type"),
        F.col("t").alias("n_transitions"),
        F.col("k").alias("n_next_types"),
        F.round(ent, 6).alias("entropy_nats"),
        F.round(
            F.when(
                F.col("k") > 1, ent / F.log(F.col("k").cast("double"))
            ).otherwise(0.0),
            6,
        ).alias("entropy_normalized"),
    ).orderBy("from_type")


# ---------------------------------------------------------------------------
# r16: the ACF profile — q_autocorr_lag1 extended to lags 1..6, the input a
# seasonality/capacity model actually consumes.
# ---------------------------------------------------------------------------
_ACF_MAX_LAG = 6


@register(
    "q_acf_profile",
    oracle=f"""
    WITH h AS (
      SELECT event_type, date_trunc('hour', ts) AS hr,
             CAST(COUNT(*) AS DECIMAL(38,0)) AS c
      FROM events GROUP BY 1, 2
    ), lags AS (
      SELECT CAST(i AS BIGINT) AS lag
      FROM UNNEST(generate_series(1, {_ACF_MAX_LAG})) t(i)
    ), p AS (
      SELECT a.event_type, l.lag, a.c AS x, b.c AS y
      FROM h a CROSS JOIN lags l
      JOIN h b ON a.event_type = b.event_type
              AND b.hr = a.hr + l.lag * INTERVAL 1 HOUR
    ), g AS (
      SELECT event_type, lag,
             CAST(COUNT(*) AS DECIMAL(38,0)) AS n,
             SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * x) AS sxx, SUM(y * y) AS syy, SUM(x * y) AS sxy
      FROM p GROUP BY event_type, lag
    )
    SELECT event_type, lag,
           CAST(n AS BIGINT) AS n_pairs,
           ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                 / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                        * CAST(n * syy - sy * sy AS DOUBLE)), 6) AS r
    FROM g
    ORDER BY event_type, lag
    """,
)
def q_acf_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation function at lags 1..{L} of the hourly count series
    per event type — the full ACF profile (q_autocorr_lag1 is its first
    point): persistence decay and any intra-day periodicity show up as
    the shape of r(lag), which is what seasonality fitting and anomaly
    thresholds consume.

    Exactness: Pearson r per (type, lag) from six exact DECIMAL(38,0)
    sums over integer hourly counts, one rounded double expression.

    Scale shape: ONE (type, hour) hash aggregate over the events scan;
    the lag fan-out multiplies only the tiny hourly frame (≤5 types x
    ~672 hours x {L} lags) before an equi-join back to itself keyed
    (type, hr) — corpus growth touches only the first aggregate's
    map-side combine.""".replace("{L}", str(_ACF_MAX_LAG))
    h = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.date_trunc("hour", F.col("ts")).alias("hr"))
        .agg(F.count("*").cast("decimal(38,0)").alias("c"))
    )
    lags = spark.range(1, _ACF_MAX_LAG + 1).select(F.col("id").alias("lag"))
    a = h.crossJoin(F.broadcast(lags)).select(
        "event_type",
        "lag",
        F.expr("hr + lag * INTERVAL 1 HOUR").alias("jhr"),
        F.col("c").alias("x"),
    )
    b = h.select(
        "event_type", F.col("hr").alias("jhr"), F.col("c").alias("y")
    )
    p = a.join(b, ["event_type", "jhr"])
    g = p.groupBy("event_type", "lag").agg(
        F.count("*").cast("decimal(38,0)").alias("n"),
        F.sum("x").cast("decimal(38,0)").alias("sx"),
        F.sum("y").cast("decimal(38,0)").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("decimal(38,0)").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("decimal(38,0)").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("decimal(38,0)").alias("sxy"),
    )
    return g.select(
        "event_type",
        "lag",
        F.col("n").cast("long").alias("n_pairs"),
        F.round(
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
                "double"
            )
            / F.sqrt(
                (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
                    "double"
                )
                * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast(
                    "double"
                )
            ),
            6,
        ).alias("r"),
    ).orderBy("event_type", "lag")
