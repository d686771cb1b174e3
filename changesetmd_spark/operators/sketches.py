"""Quantile + cardinality sketch operators (SURVEY.md §2.4 A4 and the
north-star "novel sketch" custom-operator family).

Two tiers, mirroring the engine-wide exact/approximate split:

* exact — ``F.percentile`` (Spark 4's exact interpolated percentile) is
  hash-checkable against DuckDB's ``quantile_cont``: both compute the same
  type-7 linear interpolation, so values match bit-for-bit at any SF.
* approximate — HyperLogLog++ (``approx_count_distinct``) and KLL-style
  ``percentile_approx`` are the 100 TB path (bounded memory, one pass,
  mergeable partial sketches — exactly what a 1000-executor aggregation
  needs).  Sketch outputs are algorithm-specific, so no SQL oracle; pytest
  pins them inside their documented error bounds against the exact answers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load_table
from .util import fan_out, materialize_releasing


@register(
    "q_value_percentiles_per_type",
    oracle="""
    SELECT event_type,
           ROUND(quantile_cont(value, 0.5), 4)  AS p50,
           ROUND(quantile_cont(value, 0.9), 4)  AS p90,
           ROUND(quantile_cont(value, 0.99), 4) AS p99,
           COUNT(*) AS n
    FROM events
    GROUP BY event_type
    """,
)
def q_value_percentiles_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group — one shuffle on the group
    key; per-group sort happens inside the aggregate buffer."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.5)), 4).alias("p50"),
        F.round(F.percentile("value", F.lit(0.9)), 4).alias("p90"),
        F.round(F.percentile("value", F.lit(0.99)), 4).alias("p99"),
        F.count("*").alias("n"),
    )


# 3 · 1.4826 — the classic "3 sigma" robust threshold: MAD·1.4826 estimates
# σ for a normal distribution.  One literal so both engines parse the same
# double.
_MAD_K = "4.4478"


@register(
    "q_value_mad_outliers",
    oracle=f"""
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med
      FROM events GROUP BY event_type
    ), dev AS (
      SELECT e.event_type, abs(e.value - m.med) AS dv
      FROM events e JOIN med m USING (event_type)
    ), mad AS (
      SELECT event_type, quantile_cont(dv, 0.5) AS mad
      FROM dev GROUP BY event_type
    )
    SELECT e.event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(MIN(m.med), 6) AS med,
           ROUND(MIN(d.mad), 6) AS mad,
           CAST(SUM(CASE WHEN abs(e.value - m.med) > {_MAD_K} * d.mad
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
           ROUND(SUM(CASE WHEN abs(e.value - m.med) > {_MAD_K} * d.mad
                          THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 6)
             AS outlier_ratio
    FROM events e
    JOIN med m USING (event_type)
    JOIN mad d USING (event_type)
    GROUP BY e.event_type
    """,
)
def q_value_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-series outlier detection via median/MAD (the
    metric-anomaly and sensor-glitch filter a telemetry pipeline runs
    where mean/stddev would be dragged by the very outliers it hunts):
    per event type, the median, the median absolute deviation, and how
    many values fall outside med ± 3·1.4826·MAD.

    Determinism: both engines compute the same type-7 interpolated
    percentile (see module docstring), |v − med| is IEEE-exact per row,
    and the outlier comparison uses the UNROUNDED med/mad in both
    engines.  Scale shape: three scans of the events table — median,
    MAD-of-deviations, threshold count — each a hash aggregate on the
    (low-cardinality) type key with the 5-row med/mad frames broadcast
    back; no data-sized shuffle anywhere.  Exact multi-pass is the
    referee tier; the one-pass 100 TB path is percentile_approx in
    q_sketch_cardinality_and_quantiles."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    med = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type", F.abs(F.col("value") - F.col("med")).alias("dv")
    )
    mad = dev.groupBy("event_type").agg(
        F.percentile("dv", F.lit(0.5)).alias("mad")
    )
    is_out = F.when(
        F.abs(F.col("value") - F.col("med"))
        > float(_MAD_K) * F.col("mad"),
        1,
    ).otherwise(0)
    return (
        ev.join(F.broadcast(med), "event_type")
        .join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.round(F.min("med"), 6).alias("med"),
            F.round(F.min("mad"), 6).alias("mad"),
            F.sum(is_out).cast("long").alias("n_outliers"),
            F.round(F.sum(is_out) * 1.0 / F.count("*"), 6).alias(
                "outlier_ratio"
            ),
        )
    )


@register("q_sketch_cardinality_and_quantiles")  # no oracle: sketch outputs
def q_sketch_cardinality_and_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scale path: HLL++ distinct users + approximate quantiles per
    event type, single pass, mergeable partials — error bounds pinned
    against the exact answers in tests/test_sketches.py."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
        F.percentile_approx("value", F.lit(0.5), F.lit(10000)).alias("p50_approx"),
        F.percentile_approx("value", F.lit(0.99), F.lit(10000)).alias("p99_approx"),
    )


_HH_PHI = "0.033"   # heavy-hitter frequency threshold (one literal, both engines)
_HH_CAPACITY = 64   # Misra-Gries counters per partition; must be >= 1/phi


def _mg_merge_counts(counters: dict, batch_counts, capacity: int) -> dict:
    """Merge a batch of EXACT term counts into a Misra-Gries summary
    (Agarwal et al.'s mergeable-summaries MERGE): add the counts, and if
    the summary overflows ``capacity`` keys, subtract the (capacity+1)-th
    largest counter from every counter and drop the non-positive ones.

    Guarantee (the referee test pins it): each shrink subtracts its value
    from ≥ capacity+1 counters, and all counter mass comes from real
    occurrences, so the total undercount per partition is ≤
    n_p/(capacity+1) < φ·n_p when capacity ≥ 1/φ — any term with partition
    frequency ≥ φ keeps a positive counter.  Merging batch-level exact
    counts (from a vectorized ``value_counts``) instead of streaming
    per-token preserves the bound: MERGE of exact summaries is itself a
    valid MG summary, and a whole-batch count is just an exact summary."""
    for t, c in batch_counts.items():
        counters[t] = counters.get(t, 0) + int(c)
    if len(counters) > capacity:
        vals = sorted(counters.values(), reverse=True)
        sub = vals[capacity]  # (capacity+1)-th largest
        counters = {k: c - sub for k, c in counters.items() if c > sub}
    return counters


@register(
    "q_heavy_hitter_terms",
    oracle=rf"""
    WITH posts AS (
      SELECT unnest(string_split_regex(lower(trim(text, ' ')), '\s+')) AS term
      FROM documents
    ), tot AS (SELECT COUNT(*) AS n FROM posts)
    SELECT term,
           CAST(COUNT(*) AS BIGINT) AS cnt,
           ROUND(COUNT(*) * 1.0 / tot.n, 6) AS freq
    FROM posts, tot
    GROUP BY term, tot.n
    HAVING COUNT(*) >= {_HH_PHI} * tot.n
    """,
)
def q_heavy_hitter_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus heavy hitters (terms with frequency ≥ {PHI}) via the classic
    two-pass sketch-then-verify shape: pass 1 runs a **Misra-Gries summary
    per partition** (a custom mergeable sketch as an Arrow-batched
    ``mapInPandas`` — bounded memory, one sequential scan, no shuffle) whose
    union is a GUARANTEED superset of every true heavy hitter (any term
    with global count ≥ φN has count ≥ φ·n_p in some partition, and MG with
    k ≥ 1/φ counters never evicts such a term); pass 2 exact-counts ONLY
    the candidate terms.  The output is therefore exact — hash-checkable
    against a plain GROUP BY/HAVING oracle — while the shuffle carries just
    candidate postings instead of the whole vocabulary.

    That pre-aggregation filter is the 100 TB win: frequency analysis over
    a web corpus has a vocabulary of billions of (mostly once-seen) terms,
    and the full groupBy shuffles all of them; here the broadcast candidate
    set (≤ capacity × partitions entries) prunes the postings map-side so
    the exchange is ~heavy-hitter-sized.  The MG summaries themselves are
    mergeable partials — the same property HLL++/KLL rely on (module
    docstring) — making this the module's custom-sketch counterpart to the
    built-in approximate tier."""
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    posts = (
        fan_out(load_table(spark, sf_dir, "documents"), "doc_id")
        .select(F.explode(toks).alias("term"))
        .persist()
    )

    def mg_partition(batches):
        import pandas as pd

        counters: dict[str, int] = {}
        for pdf in batches:
            # Vectorized: exact per-batch counts in C (value_counts), then
            # one MG MERGE per Arrow batch instead of one dict op per token.
            counters = _mg_merge_counts(
                counters, pdf["term"].value_counts(), _HH_CAPACITY
            )
        yield pd.DataFrame({"term": list(counters.keys())})

    cands = posts.mapInPandas(mg_partition, "term string").distinct()
    tot = posts.agg(F.count("*").alias("n"))
    out = (
        posts.join(F.broadcast(cands), "term")
        .groupBy("term")
        .agg(F.count("*").alias("cnt"))
        .crossJoin(F.broadcast(tot))
        .filter(F.col("cnt") >= float(_HH_PHI) * F.col("n"))
        .select(
            "term",
            F.col("cnt").cast("long").alias("cnt"),
            F.round(F.col("cnt") * 1.0 / F.col("n"), 6).alias("freq"),
        )
    )
    return materialize_releasing(out, posts)


# Count-min sketch geometry: d hash rows × w buckets.  Small on purpose so
# the overestimate column is non-trivially exercised at test SF (a CMS wide
# enough to be collision-free would make `overestimate` identically 0 and
# the parity check vacuous).
_CMS_D = 3
_CMS_W = 16
_CMS_TOPK = 15


@register(
    "q_countmin_estimates",
    oracle=rf"""
    WITH posts AS (
      SELECT unnest(string_split_regex(lower(trim(text, ' ')), '\s+')) AS term
      FROM documents
    ), vocab AS (
      SELECT term, CAST(COUNT(*) AS BIGINT) AS exact_cnt
      FROM posts GROUP BY term
    ), hashed AS (
      SELECT term, exact_cnt, t.i,
             ('0x' || substr(md5(CAST(t.i AS VARCHAR) || ':' || term),
                             1, 15))::BIGINT % {_CMS_W} AS bucket
      FROM vocab, unnest([{', '.join(map(str, range(_CMS_D)))}]) AS t(i)
    ), counters AS (
      SELECT i, bucket, SUM(exact_cnt) AS counter
      FROM hashed GROUP BY i, bucket
    ), topk AS (
      SELECT term, exact_cnt FROM vocab
      ORDER BY exact_cnt DESC, term LIMIT {_CMS_TOPK}
    )
    SELECT t.term,
           t.exact_cnt,
           CAST(MIN(c.counter) AS BIGINT) AS cms_estimate,
           CAST(MIN(c.counter) - t.exact_cnt AS BIGINT) AS overestimate
    FROM topk t
    JOIN hashed h ON h.term = t.term
    JOIN counters c ON c.i = h.i AND c.bucket = h.bucket
    GROUP BY t.term, t.exact_cnt
    """,
)
def q_countmin_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch point estimates with an exact-error audit: build a
    d×w (3×16) CMS over the corpus term stream (deterministic md5 bucket hashes —
    the bloomjoin.py:35 integer fold — so both engines place every term in
    the same cells), then report, for the top-k exact terms, the exact
    count, the CMS estimate (min over the d cells), and the guaranteed
    non-negative overestimate.

    Linearity is what makes the *exact* twin cheap: a CMS is a linear
    projection of the count vector, so aggregating exact per-term counts
    first and then folding the vocab table into the d×w counters is
    bit-identical to streaming every token occurrence into the sketch —
    and the vocab table is needed anyway for the error report.  At 100 TB
    the sketch-only path skips the vocab aggregate entirely: each executor
    partially aggregates its token stream straight into (i, bucket) cells
    (map-side combine onto d·w integers) and the final exchange carries
    O(d·w·partitions) rows — constant in data size, the whole point of
    the sketch.  Plan shape here: one token-explode scan → vocab hash
    aggregate (the only data-sized shuffle) → ×d fan-out → d·w-cell
    counter aggregate, broadcast back onto the top-k rows.
    """
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    vocab = (
        load_table(spark, sf_dir, "documents")
        .select(F.explode(toks).alias("term"))
        .groupBy("term")
        .agg(F.count("*").cast("long").alias("exact_cnt"))
        .persist()
    )
    rows = F.array([F.lit(i) for i in range(_CMS_D)])
    hashed = vocab.select(
        "term",
        "exact_cnt",
        F.explode(rows).alias("i"),
    ).withColumn(
        "bucket",
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("i").cast("string"),
                        F.lit(":"),
                        F.col("term"),
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % _CMS_W,
    )
    counters = hashed.groupBy("i", "bucket").agg(
        F.sum("exact_cnt").alias("counter")
    )
    topk = vocab.orderBy(
        F.col("exact_cnt").desc(), F.col("term")
    ).limit(_CMS_TOPK)
    out = (
        topk.join(hashed.select("term", "i", "bucket"), "term")
        .join(F.broadcast(counters), ["i", "bucket"])
        .groupBy("term", "exact_cnt")
        .agg(F.min("counter").cast("long").alias("cms_estimate"))
        .select(
            "term",
            "exact_cnt",
            "cms_estimate",
            (F.col("cms_estimate") - F.col("exact_cnt"))
            .cast("long")
            .alias("overestimate"),
        )
    )
    return materialize_releasing(out, vocab)


@register(
    "q_countmin_sketch_only",
    oracle=rf"""
    WITH posts AS (
      SELECT unnest(string_split_regex(lower(trim(text, ' ')), '\s+')) AS term
      FROM documents
    ), cells AS (
      SELECT t.i,
             ('0x' || substr(md5(CAST(t.i AS VARCHAR) || ':' || term),
                             1, 15))::BIGINT % {_CMS_W} AS bucket
      FROM posts, unnest([{', '.join(map(str, range(_CMS_D)))}]) AS t(i)
    )
    SELECT i, bucket, CAST(COUNT(*) AS BIGINT) AS counter
    FROM cells GROUP BY i, bucket
    """,
)
def q_countmin_sketch_only(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB count-min path promised by `q_countmin_estimates`'s
    docstring (VERDICT r9 #6): stream every token occurrence straight into
    the d×w cells with NO vocab aggregate.  Each executor partially
    aggregates its token stream onto at most d·w = {_CMS_D}·{_CMS_W}
    distinct (i, bucket) keys map-side, so the one exchange carries
    O(d·w·partitions) rows — CONSTANT in corpus size, which is the entire
    point of a sketch: at 100 TB the exact twin's vocab table is itself a
    data-sized shuffle, while this plan's shuffle payload does not grow at
    all.  By CMS linearity the resulting counters are bit-identical to
    folding the exact vocab counts (the twin's construction), so the cell
    table hash-checks against a DuckDB oracle that streams the same
    deterministic md5 bucket hash over the raw token stream.

    Plan shape: one documents scan → explode tokens → ×d fan-out (map) →
    single hash aggregate keyed by (i, bucket).  No join, no window, no
    second shuffle."""
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    rows = F.array([F.lit(i) for i in range(_CMS_D)])
    cells = (
        load_table(spark, sf_dir, "documents")
        .select(F.explode(toks).alias("term"))
        .select("term", F.explode(rows).alias("i"))
        .withColumn(
            "bucket",
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.col("i").cast("string"),
                            F.lit(":"),
                            F.col("term"),
                        )
                    ),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("long")
            % _CMS_W,
        )
    )
    return cells.groupBy("i", "bucket").agg(
        F.count("*").cast("long").alias("counter")
    )


@register(
    "q_winsorized_stats",
    oracle="""
    WITH b AS (
      SELECT event_type,
             ROUND(quantile_cont(value, 0.01), 4) AS p01,
             ROUND(quantile_cont(value, 0.99), 4) AS p99
      FROM events GROUP BY event_type
    ), c AS (
      SELECT e.event_type, b.p01, b.p99,
             LEAST(GREATEST(e.value, b.p01), b.p99) AS w,
             CASE WHEN e.value < b.p01 THEN 1 ELSE 0 END AS lo,
             CASE WHEN e.value > b.p99 THEN 1 ELSE 0 END AS hi
      FROM events e JOIN b USING (event_type)
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(MIN(p01), 4) AS p01,
           ROUND(MIN(p99), 4) AS p99,
           CAST(SUM(lo) AS BIGINT) AS n_clipped_low,
           CAST(SUM(hi) AS BIGINT) AS n_clipped_high,
           ROUND(CAST(SUM(CAST(w AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*),
                 6) AS winsorized_mean
    FROM c GROUP BY event_type
    """,
)
def q_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized robust statistics per event type (Tukey/Hastings 1947
    winsorization — public method): clip values to the exact
    interpolated [p01, p99] band, report the clipped mean and how many
    observations each tail lost.  The robust companion to the MAD
    outlier detector: MAD *flags* tail points, winsorization *bounds
    their leverage* — the pair is the standard pre-aggregation treatment
    for telemetry means a single sensor glitch would otherwise drag.

    Determinism: both bounds are ROUNDED to 4 before the clip, so the
    boundary comparison is over identical doubles in both engines; the
    winsorized mean folds each clipped value through DECIMAL(28,12)
    (order-free exact sum) into one rounded division.

    Scale shape: one percentile aggregate per type (group-key exchange,
    in-buffer sort), bounds re-join the events scan as a broadcast
    ≤-#types frame, then one map-side-combined final aggregate — two
    scans, no window over the data."""
    ev = load_table(spark, sf_dir, "events")
    b = F.broadcast(
        ev.groupBy("event_type").agg(
            F.round(F.percentile("value", F.lit(0.01)), 4).alias("p01"),
            F.round(F.percentile("value", F.lit(0.99)), 4).alias("p99"),
        )
    )
    w = F.least(F.greatest(F.col("value"), F.col("p01")), F.col("p99"))
    return (
        ev.join(b, "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.min("p01"), 4).alias("p01"),
            F.round(F.min("p99"), 4).alias("p99"),
            F.sum(F.when(F.col("value") < F.col("p01"), 1).otherwise(0))
            .cast("long")
            .alias("n_clipped_low"),
            F.sum(F.when(F.col("value") > F.col("p99"), 1).otherwise(0))
            .cast("long")
            .alias("n_clipped_high"),
            F.round(
                F.sum(w.cast("decimal(28,12)")).cast("double")
                / F.count("*"),
                6,
            ).alias("winsorized_mean"),
        )
    )


# ---------------------------------------------------------------------------
# Benford first-digit audit (r15): the fraud / synthetic-data screen.
# ---------------------------------------------------------------------------
@register(
    "q_benford_digit_audit",
    oracle="""
    WITH v AS (
      SELECT CAST(substr(CAST(CAST(ROUND(value * 100, 0) AS BIGINT)
                              AS VARCHAR), 1, 1) AS BIGINT) AS digit
      FROM events
      WHERE CAST(ROUND(value * 100, 0) AS BIGINT) > 0
    ), per AS (
      SELECT digit, CAST(COUNT(*) AS BIGINT) AS n FROM v GROUP BY digit
    ), tot AS (SELECT CAST(SUM(n) AS BIGINT) AS t FROM per)
    SELECT digit, n,
           CAST(n * 10000 // tot.t AS BIGINT) AS obs_bp,
           CAST(FLOOR(log10(1 + 1.0 / digit) * 10000) AS BIGINT) AS exp_bp,
           CAST(n * 10000 // tot.t
                - CAST(FLOOR(log10(1 + 1.0 / digit) * 10000) AS BIGINT)
                AS BIGINT) AS dev_bp
    FROM per, tot
    ORDER BY digit
    """,
)
def q_benford_digit_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit (Newcomb 1881 / Benford 1938,
    public method) over positive event values in cents: observed vs
    expected log10(1+1/d) leading-digit shares in basis points — the
    classic screen for fabricated or synthetically-generated numeric
    columns (natural multi-scale data follows the curve; uniform
    generators, like this fixture's, visibly don't — the DEVIATION
    column is the signal either way).

    Exactness: the leading digit comes from the decimal string of the
    exact integer cents (identical in both engines, no float log for
    extraction); shares are floor basis points; the expectation is one
    floor(log10) constant per digit.

    Scale shape: one scan → one ≤9-key hash aggregate (map-side
    combined) + a broadcast 1-row total.  The q1 shape."""
    cents = F.round(F.col("value") * 100, 0).cast("long")
    v = (
        load_table(spark, sf_dir, "events")
        .select(cents.alias("c"))
        .filter(F.col("c") > 0)
        .select(
            F.substring(F.col("c").cast("string"), 1, 1)
            .cast("long")
            .alias("digit")
        )
    )
    per = v.groupBy("digit").agg(F.count("*").cast("long").alias("n"))
    tot = per.agg(F.sum("n").cast("long").alias("t"))
    exp_bp = F.floor(F.log10(1 + 1.0 / F.col("digit")) * 10000).cast("long")
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "digit",
            "n",
            F.expr("n * 10000 div t").alias("obs_bp"),
            exp_bp.alias("exp_bp"),
            (F.expr("n * 10000 div t") - exp_bp).alias("dev_bp"),
        )
        .orderBy("digit")
    )
