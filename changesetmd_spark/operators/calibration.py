"""Classifier-calibration audit (SURVEY §2.11 E4/E5 extension — the
quality-classifier reliability check a training-data pipeline runs before
trusting model scores to gate documents).

A fastText-style quality classifier emits a confidence per document; data
curation then thresholds on it (CCNet, DCLM).  Before the threshold is
trusted, the scores are audited for CALIBRATION: bucket the corpus into
confidence bins and compare each bin's mean confidence against its
empirical positive rate — the reliability diagram whose weighted gap sum
is the Expected Calibration Error (Naeini et al. 2015's binned ECE).

Here the "classifier" is a deterministic linear probe over ``embeddings``
(cosine against a pinned md5-derived probe vector, mapped to [0, 1]) and
the label is ``label % 2``, so both engines reproduce every score
bit-for-bit.  Determinism discipline: the per-row score is a sequential
left fold; the per-BIN aggregates are pinned by summing the score as a
round-half-up INTEGER (1e5 grid) — integer sums are exact and
order-independent, so the bin means never depend on Spark's partial-agg
order the way a double SUM would.

Reference parity: the reference has no classifier tier; this extends it
per the mandated LLM-pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load_table
from .probes import _DIM
from .probes import probe_sql as _probe_sql
from .probes import probe_vector
from .similarity import dot, l2_norm, to_double_vec
_N_BINS = 10
_GRID = 100_000  # score quantization grid (1e-5), matching the 5-dp round
# logit temperature: raw probe cosines on this corpus live in ~[-0.3, 0.3];
# the x4 gain (clamped to [-1, 1]) spreads scores across the deciles so
# the reliability diagram exercises more than the middle bins.  Pure
# multiply + clamp: IEEE-identical across engines.
_TEMP = 4.0


def _ece_oracle() -> str:
    return f"""
    WITH probe AS ({_probe_sql()}),
    v AS (
      SELECT vec_id, label % 2 AS y,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings
    ), n AS (
      SELECT vec_id, y, e,
             sqrt(list_reduce(list_transform(e, x -> x * x),
                              (a, b) -> a + b)) AS nrm
      FROM v
      WHERE list_reduce(list_transform(e, x -> x * x), (a, b) -> a + b) > 0
    ), scored AS (
      SELECT y,
             CAST(floor(
               (1.0 + GREATEST(-1.0, LEAST(1.0,
                  {_TEMP!r} * list_reduce(
                    list_transform(generate_series(1, {_DIM}),
                                   i -> e[i] * pr[i]), (a, b) -> a + b)
                    / (nrm * pn)))) / 2.0 * {_GRID} + 0.5
             ) AS BIGINT) AS s_int
      FROM n, probe
    ), binned AS (
      SELECT LEAST(s_int // {_GRID // _N_BINS}, {_N_BINS - 1}) AS bin,
             y, s_int
      FROM scored
    )
    SELECT CAST(bin AS INT) AS bin,
           COUNT(*) AS n,
           CAST(SUM(y) AS BIGINT) AS n_pos,
           ROUND(SUM(s_int) / (COUNT(*) * {_GRID}.0), 5) AS conf5,
           ROUND(SUM(y) * 1.0 / COUNT(*), 5) AS acc5,
           ROUND(abs(SUM(s_int) / (COUNT(*) * {_GRID}.0)
                     - SUM(y) * 1.0 / COUNT(*)), 5) AS gap5
    FROM binned GROUP BY bin
    """


@register("q_calibration_ece_bins", oracle=_ece_oracle())
def q_calibration_ece_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability-diagram bins for a deterministic linear-probe quality
    classifier over ``embeddings``: per confidence decile, the row count,
    positive count, mean confidence, empirical accuracy, and |gap| — the
    inputs to binned ECE (the referee test assembles the weighted sum and
    pins totality).

    Scale shape (100 TB): the score is a map-side fold against a pinned
    constant probe (no data-derived broadcast at all); the only exchange
    is the {B}-group partial aggregate, whose reduce side carries {B} rows
    per task regardless of corpus size.  Bin means are integer-pinned
    (round-half-up 1e-5 grid, summed as BIGINT) so the aggregation is
    exact and order-independent — a double SUM's partial-order would not
    hash-check.""".replace("{B}", str(_N_BINS))
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        (F.col("label") % 2).cast("long").alias("y"),
        to_double_vec(F.col("embedding")).alias("e"),
    )
    sq = F.aggregate(
        F.transform(F.col("e"), lambda x: x * x), F.lit(0.0), lambda a, b: a + b
    )
    emb = emb.filter(sq > 0).withColumn("nrm", F.sqrt(sq))
    pr = probe_vector()
    cs = dot(F.col("e"), pr) / (F.col("nrm") * l2_norm(pr))
    sharp = F.greatest(F.lit(-1.0), F.least(F.lit(1.0), F.lit(_TEMP) * cs))
    s_int = F.floor(
        (F.lit(1.0) + sharp) / F.lit(2.0) * _GRID + F.lit(0.5)
    ).cast("long")
    scored = emb.select("y", s_int.alias("s_int"))
    # integer floor-division — never a double divide feeding a cast
    bin_col = F.least(
        F.expr(f"s_int div {_GRID // _N_BINS}"),
        F.lit(_N_BINS - 1).cast("long"),
    ).cast("int")
    # DECIMAL(38,0) accumulator (VERDICT r13 #7): Σ s_int ≤ rows × 10⁵ —
    # only ~92× headroom in a BIGINT at 10¹² rows; the oracle's HUGEINT
    # sum is exact either way
    conf = F.sum(F.col("s_int").cast("decimal(38,0)")).cast("double") / (
        F.count(F.lit(1)) * F.lit(float(_GRID))
    )
    acc = F.sum("y") * F.lit(1.0) / F.count(F.lit(1))
    return (
        scored.withColumn("bin", bin_col)
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("y").alias("n_pos"),
            F.round(conf, 5).alias("conf5"),
            F.round(acc, 5).alias("acc5"),
            F.round(F.abs(conf - acc), 5).alias("gap5"),
        )
    )


# ---------------------------------------------------------------------------
# Inter-rater agreement (r15): Cohen's kappa between the metadata language
# label and a content-based heuristic.
# ---------------------------------------------------------------------------
@register(
    "q_cohens_kappa_langid",
    oracle="""
    WITH r AS (
      SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS a,
             CASE WHEN contains(lower(text), ' the ') THEN 1 ELSE 0 END AS b
      FROM documents
    ), c AS (
      SELECT CAST(COUNT(*) AS HUGEINT) AS n,
             CAST(SUM(a) AS HUGEINT) AS a1,
             CAST(SUM(b) AS HUGEINT) AS b1,
             CAST(SUM(CASE WHEN a = b THEN 1 ELSE 0 END) AS HUGEINT)
               AS agree
      FROM r
    )
    SELECT CAST(n AS BIGINT) AS n_docs,
           CAST(a1 AS BIGINT) AS label_en,
           CAST(b1 AS BIGINT) AS heuristic_en,
           CAST(agree AS BIGINT) AS n_agree,
           ROUND(CAST(n * agree - (a1 * b1 + (n - a1) * (n - b1))
                      AS DOUBLE)
                 / CAST(n * n - (a1 * b1 + (n - a1) * (n - b1))
                        AS DOUBLE), 6) AS kappa
    FROM c
    """,
)
def q_cohens_kappa_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa (1960, public method) between two binary raters on
    "is this document English": the corpus METADATA label (rater A) and
    a cheap content heuristic (rater B: contains the token ' the ') —
    the chance-corrected agreement score every annotation pipeline
    reports before trusting auto-labels.  κ = (pₒ − pₑ)/(1 − pₑ) with pₑ
    from the raters' marginals.

    Exactness: the whole statistic reduces to five integer counts; κ is
    evaluated as the exact integer rational (N·agree − pe_num)/(N² −
    pe_num) in DECIMAL/HUGEINT (N² exceeds int64 beyond ~3·10⁹ rows),
    rounded once as a double.

    Scale shape: ONE corpus scan feeding a constant-size global
    aggregate (4 partial counters per task) — the cheapest possible
    distributed shape; no join, no window, no shuffle beyond the 1-row
    reduce."""
    r = load_table(spark, sf_dir, "documents").select(
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("a"),
        F.when(
            F.contains(F.lower(F.col("text")), F.lit(" the ")), 1
        )
        .otherwise(0)
        .alias("b"),
    )
    c = r.agg(
        F.count("*").cast("decimal(38,0)").alias("n"),
        F.sum("a").cast("decimal(38,0)").alias("a1"),
        F.sum("b").cast("decimal(38,0)").alias("b1"),
        F.sum(F.when(F.col("a") == F.col("b"), 1).otherwise(0))
        .cast("decimal(38,0)")
        .alias("agree"),
    )
    pe_num = F.col("a1") * F.col("b1") + (F.col("n") - F.col("a1")) * (
        F.col("n") - F.col("b1")
    )
    return c.select(
        F.col("n").cast("long").alias("n_docs"),
        F.col("a1").cast("long").alias("label_en"),
        F.col("b1").cast("long").alias("heuristic_en"),
        F.col("agree").cast("long").alias("n_agree"),
        F.round(
            (F.col("n") * F.col("agree") - pe_num).cast("double")
            / (F.col("n") * F.col("n") - pe_num).cast("double"),
            6,
        ).alias("kappa"),
    )


# ---------------------------------------------------------------------------
# Welch's two-sample t-test (r15): the experimentation primitive.
# ---------------------------------------------------------------------------
@register(
    "q_welch_ttest_cohorts",
    oracle="""
    WITH v AS (
      SELECT (user_id % 2) AS cohort,
             CAST(ROUND(value * 100, 0) AS DECIMAL(38,0)) AS x
      FROM events WHERE event_type = 'purchase'
    ), g AS (
      SELECT cohort,
             CAST(COUNT(*) AS DECIMAL(38,0)) AS n,
             SUM(x) AS s, SUM(x * x) AS s2
      FROM v GROUP BY cohort
    ), w AS (
      SELECT MAX(CASE WHEN cohort = 0 THEN n END) AS na,
             MAX(CASE WHEN cohort = 0 THEN s END) AS sa,
             MAX(CASE WHEN cohort = 0 THEN s2 END) AS s2a,
             MAX(CASE WHEN cohort = 1 THEN n END) AS nb,
             MAX(CASE WHEN cohort = 1 THEN s END) AS sb,
             MAX(CASE WHEN cohort = 1 THEN s2 END) AS s2b
      FROM g
    )
    SELECT CAST(na AS BIGINT) AS n_a,
           CAST(nb AS BIGINT) AS n_b,
           ROUND(CAST(sa AS DOUBLE) / CAST(na AS DOUBLE) / 100, 6) AS mean_a,
           ROUND(CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE) / 100, 6) AS mean_b,
           ROUND((CAST(sa AS DOUBLE) / CAST(na AS DOUBLE)
                  - CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE))
                 / sqrt(CAST(na * s2a - sa * sa AS DOUBLE)
                        / (CAST(na AS DOUBLE) * CAST(na AS DOUBLE)
                           * CAST(na - 1 AS DOUBLE))
                        + CAST(nb * s2b - sb * sb AS DOUBLE)
                        / (CAST(nb AS DOUBLE) * CAST(nb AS DOUBLE)
                           * CAST(nb - 1 AS DOUBLE))), 6) AS t_stat,
           ROUND(POW(CAST(na * s2a - sa * sa AS DOUBLE)
                     / (CAST(na AS DOUBLE) * CAST(na AS DOUBLE)
                        * CAST(na - 1 AS DOUBLE))
                     + CAST(nb * s2b - sb * sb AS DOUBLE)
                     / (CAST(nb AS DOUBLE) * CAST(nb AS DOUBLE)
                        * CAST(nb - 1 AS DOUBLE)), 2)
                 / (POW(CAST(na * s2a - sa * sa AS DOUBLE)
                        / (CAST(na AS DOUBLE) * CAST(na AS DOUBLE)
                           * CAST(na - 1 AS DOUBLE)), 2)
                    / CAST(na - 1 AS DOUBLE)
                    + POW(CAST(nb * s2b - sb * sb AS DOUBLE)
                          / (CAST(nb AS DOUBLE) * CAST(nb AS DOUBLE)
                             * CAST(nb - 1 AS DOUBLE)), 2)
                    / CAST(nb - 1 AS DOUBLE)), 4) AS welch_dof
    FROM w
    """,
)
def q_welch_ttest_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance two-sample t-test (Welch 1947, public
    method) between the even/odd user cohorts' purchase values — the A/B
    experimentation primitive, with the Welch-Satterthwaite effective
    degrees of freedom.

    Exactness: cohort sums n, Σx, Σx² are exact DECIMAL(38,0) integers
    over cent-quantized values; the t statistic and the dof are each ONE
    identically-parenthesized double expression over those integers
    (sem² = (n·Σx²−(Σx)²)/(n²(n−1)) — the cross-multiplied sample
    variance over n), rounded once.

    Scale shape: one hash aggregate on the 2-key cohort space (map-side
    combined), one 1-row pivot — the cheapest possible two-sample
    shape; at 10¹² purchases the exchange carries 2 partials per task."""
    v = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            (F.col("user_id") % 2).alias("cohort"),
            F.round(F.col("value") * 100, 0)
            .cast("decimal(38,0)")
            .alias("x"),
        )
    )
    g = v.groupBy("cohort").agg(
        F.count("*").cast("decimal(38,0)").alias("n"),
        F.sum("x").cast("decimal(38,0)").alias("s"),
        F.sum(F.col("x") * F.col("x")).cast("decimal(38,0)").alias("s2"),
    )
    w = g.agg(
        *[
            F.max(F.when(F.col("cohort") == c, F.col(col))).alias(
                f"{col}{'a' if c == 0 else 'b'}"
            )
            for c in (0, 1)
            for col in ("n", "s", "s2")
        ]
    )
    sem2 = {}
    for side in ("a", "b"):
        n, s, s2 = F.col(f"n{side}"), F.col(f"s{side}"), F.col(f"s2{side}")
        sem2[side] = (n * s2 - s * s).cast("double") / (
            n.cast("double") * n.cast("double") * (n - 1).cast("double")
        )
    mean = {
        side: F.col(f"s{side}").cast("double")
        / F.col(f"n{side}").cast("double")
        for side in ("a", "b")
    }
    return w.select(
        F.col("na").cast("long").alias("n_a"),
        F.col("nb").cast("long").alias("n_b"),
        F.round(mean["a"] / 100, 6).alias("mean_a"),
        F.round(mean["b"] / 100, 6).alias("mean_b"),
        F.round(
            (mean["a"] - mean["b"]) / F.sqrt(sem2["a"] + sem2["b"]), 6
        ).alias("t_stat"),
        F.round(
            F.pow(sem2["a"] + sem2["b"], 2)
            / (
                F.pow(sem2["a"], 2) / (F.col("na") - 1).cast("double")
                + F.pow(sem2["b"], 2) / (F.col("nb") - 1).cast("double")
            ),
            4,
        ).alias("welch_dof"),
    )


# ---------------------------------------------------------------------------
# Mann-Whitney U (r15): the nonparametric companion to the Welch test,
# computed EXACTLY over the value domain — no global rank, no sort.
# ---------------------------------------------------------------------------
@register(
    "q_mann_whitney_u",
    oracle="""
    WITH v AS (
      SELECT (user_id % 2) AS cohort,
             CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'
    ), per AS (
      SELECT cents,
             CAST(SUM(CASE WHEN cohort = 0 THEN 1 ELSE 0 END)
                  AS DECIMAL(38,0)) AS ca,
             CAST(SUM(CASE WHEN cohort = 1 THEN 1 ELSE 0 END)
                  AS DECIMAL(38,0)) AS cb
      FROM v GROUP BY cents
    ), cum AS (
      SELECT cents, ca, cb,
             COALESCE(SUM(cb) OVER (ORDER BY cents
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum_b_lt
      FROM per
    ), g AS (
      SELECT SUM(ca) AS na, SUM(cb) AS nb,
             SUM(2 * ca * cum_b_lt + ca * cb) AS u2,
             SUM((ca + cb) * (ca + cb) * (ca + cb) - (ca + cb)) AS tie3
      FROM cum
    )
    SELECT CAST(na AS BIGINT) AS n_a,
           CAST(nb AS BIGINT) AS n_b,
           CAST(u2 AS BIGINT) AS u2_a,
           ROUND((CAST(u2 AS DOUBLE) / 2
                  - CAST(na * nb AS DOUBLE) / 2)
                 / sqrt(CAST(na * nb AS DOUBLE) / 12
                        * (CAST(na + nb + 1 AS DOUBLE)
                           - CAST(tie3 AS DOUBLE)
                             / (CAST(na + nb AS DOUBLE)
                                * CAST(na + nb - 1 AS DOUBLE)))), 6)
             AS z_score
    FROM g
    """,
)
def q_mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U (1947, public method) between the even/odd user
    cohorts' purchase values — the nonparametric companion to the Welch
    test (rank-based: robust to the heavy tails that break t).  Computed
    WITHOUT any global rank: over the per-value-domain frame, U_A =
    Σ_v c_A(v)·(#B below v) + ½·c_A(v)·c_B(v) — the CDF convolution form,
    so no sort of the data ever happens; the normal approximation uses
    the exact tie-corrected variance.

    Exactness: U is carried as the INTEGER 2U (half-counts from ties
    stay integral); counts, the below-cumulative, and the tie term
    Σ(t³−t) are exact DECIMAL(38,0); only the final z divides in
    doubles, rounded once.

    Scale shape: one hash aggregate to the distinct-cents frame, one
    cumulative window over that VALUE-DOMAIN frame (the KS-drift bound —
    cardinality is the price domain, not the row count), one 1-row
    reduce.  At 10¹² purchases the window still sees only distinct
    cents."""
    v = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            (F.col("user_id") % 2).alias("cohort"),
            F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
        )
    )
    per = v.groupBy("cents").agg(
        F.sum(F.when(F.col("cohort") == 0, 1).otherwise(0))
        .cast("decimal(38,0)")
        .alias("ca"),
        F.sum(F.when(F.col("cohort") == 1, 1).otherwise(0))
        .cast("decimal(38,0)")
        .alias("cb"),
    )
    from pyspark.sql import Window

    w = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, -1)
    cum = per.select(
        "ca",
        "cb",
        F.coalesce(
            F.sum("cb").over(w), F.lit(0).cast("decimal(38,0)")
        ).alias("cum_b_lt"),
    )
    g = cum.agg(
        F.sum("ca").cast("decimal(38,0)").alias("na"),
        F.sum("cb").cast("decimal(38,0)").alias("nb"),
        F.sum(
            2 * F.col("ca") * F.col("cum_b_lt") + F.col("ca") * F.col("cb")
        )
        .cast("decimal(38,0)")
        .alias("u2"),
        F.sum(
            (F.col("ca") + F.col("cb"))
            * (F.col("ca") + F.col("cb"))
            * (F.col("ca") + F.col("cb"))
            - (F.col("ca") + F.col("cb"))
        )
        .cast("decimal(38,0)")
        .alias("tie3"),
    )
    n_tot = (F.col("na") + F.col("nb")).cast("double")
    return g.select(
        F.col("na").cast("long").alias("n_a"),
        F.col("nb").cast("long").alias("n_b"),
        F.col("u2").cast("long").alias("u2_a"),
        F.round(
            (
                F.col("u2").cast("double") / 2
                - (F.col("na") * F.col("nb")).cast("double") / 2
            )
            / F.sqrt(
                (F.col("na") * F.col("nb")).cast("double")
                / 12
                * (
                    (F.col("na") + F.col("nb") + 1).cast("double")
                    - F.col("tie3").cast("double")
                    / (n_tot * (n_tot - 1))
                )
            ),
            6,
        ).alias("z_score"),
    )


# ---------------------------------------------------------------------------
# r16: Murphy decomposition of the Brier score — the one-row summary that
# sits on top of q_calibration_ece_bins' reliability diagram.
# ---------------------------------------------------------------------------
@register(
    "q_brier_decomposition",
    oracle=f"""
    WITH probe AS ({{probe}}),
    v AS (
      SELECT vec_id, label % 2 AS y,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings
    ), n AS (
      SELECT vec_id, y, e,
             sqrt(list_reduce(list_transform(e, x -> x * x),
                              (a, b) -> a + b)) AS nrm
      FROM v
      WHERE list_reduce(list_transform(e, x -> x * x), (a, b) -> a + b) > 0
    ), scored AS (
      SELECT y,
             CAST(floor(
               (1.0 + GREATEST(-1.0, LEAST(1.0,
                  {_TEMP!r} * list_reduce(
                    list_transform(generate_series(1, {_DIM}),
                                   i -> e[i] * pr[i]), (a, b) -> a + b)
                    / (nrm * pn)))) / 2.0 * {_GRID} + 0.5
             ) AS BIGINT) AS s_int
      FROM n, probe
    ), binned AS (
      SELECT LEAST(s_int // {_GRID // _N_BINS}, {_N_BINS - 1}) AS bin,
             y, s_int
      FROM scored
    ), per_bin AS (
      SELECT bin, CAST(COUNT(*) AS BIGINT) AS nb,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(s_int) AS HUGEINT) AS ss
      FROM binned GROUP BY bin
    ), tot AS (
      SELECT CAST(SUM(nb) AS BIGINT) AS big_n,
             CAST(SUM(sy) AS BIGINT) AS big_y,
             CAST(SUM(CAST(ss AS HUGEINT)) AS HUGEINT) AS big_s
      FROM per_bin
    ), direct AS (
      SELECT CAST(SUM(CAST((s_int - y * {_GRID}) AS HUGEINT)
                      * (s_int - y * {_GRID})) AS HUGEINT) AS sq
      FROM binned
    ), terms AS (
      SELECT bin,
             ROUND(nb * POW(ss * 1.0 / (nb * {_GRID}.0)
                            - sy * 1.0 / nb, 2), 9) AS t_rel,
             ROUND(nb * POW(sy * 1.0 / nb
                            - big_y * 1.0 / big_n, 2), 9) AS t_res
      FROM per_bin CROSS JOIN tot
    )
    SELECT tot.big_n AS n,
           CAST({_N_BINS} AS BIGINT) AS n_bins,
           ROUND(direct.sq * 1.0 / (tot.big_n * {_GRID}.0 * {_GRID}.0), 6)
             AS brier,
           ROUND(list_reduce(list(t_rel ORDER BY bin), (a, b) -> a + b)
                 / tot.big_n, 6) AS reliability,
           ROUND(list_reduce(list(t_res ORDER BY bin), (a, b) -> a + b)
                 / tot.big_n, 6) AS resolution,
           ROUND((tot.big_y * 1.0 / tot.big_n)
                 * (1.0 - tot.big_y * 1.0 / tot.big_n), 6) AS uncertainty
    FROM terms, tot, direct
    GROUP BY tot.big_n, tot.big_y, direct.sq
    """.replace("{probe}", _probe_sql()),
)
def q_brier_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Murphy (1973, public method) decomposition of the Brier score for
    the deterministic linear-probe classifier: the direct mean squared
    error plus the binned reliability (calibration penalty), resolution
    (discrimination credit) and uncertainty (base-rate variance) — the
    standard scoring-rule report where ECE alone hides discrimination.

    Exactness: confidences live on the same 1e-5 integer grid as
    q_calibration_ece_bins; the direct Brier numerator Σ(s − y·GRID)² is
    an exact DECIMAL(38,0) integer sum; the 10 per-bin reliability /
    resolution terms are rounded to 9 and summed by a left fold over the
    BIN-ORDERED list in both engines (never a shuffle-order double sum).

    Scale shape: one map-side probe fold per row, a 10-key hash
    aggregate, a 1-row broadcast total, and 10-element folds — identical
    to the ECE plan plus one broadcast."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        (F.col("label") % 2).cast("long").alias("y"),
        to_double_vec(F.col("embedding")).alias("e"),
    )
    sq = F.aggregate(
        F.transform(F.col("e"), lambda x: x * x), F.lit(0.0), lambda a, b: a + b
    )
    emb = emb.filter(sq > 0).withColumn("nrm", F.sqrt(sq))
    pr = probe_vector()
    cs = dot(F.col("e"), pr) / (F.col("nrm") * l2_norm(pr))
    sharp = F.greatest(F.lit(-1.0), F.least(F.lit(1.0), F.lit(_TEMP) * cs))
    s_int = F.floor(
        (F.lit(1.0) + sharp) / F.lit(2.0) * _GRID + F.lit(0.5)
    ).cast("long")
    binned = emb.select(
        "y",
        s_int.alias("s_int"),
        F.least(
            F.floor(s_int / (_GRID // _N_BINS)).cast("long"),
            F.lit(_N_BINS - 1).cast("long"),
        ).alias("bin"),
    )
    d38 = "decimal(38,0)"
    per_bin = binned.groupBy("bin").agg(
        F.count("*").alias("nb"),
        F.sum("y").alias("sy"),
        F.sum(F.col("s_int").cast(d38)).alias("ss"),
    )
    tot = per_bin.agg(
        F.sum("nb").alias("big_n"),
        F.sum("sy").alias("big_y"),
        F.sum("ss").cast(d38).alias("big_s"),
    )
    direct = binned.agg(
        F.sum(
            ((F.col("s_int") - F.col("y") * _GRID).cast(d38))
            * (F.col("s_int") - F.col("y") * _GRID)
        )
        .cast(d38)
        .alias("sqe")
    )
    conf = F.col("ss").cast("double") / (F.col("nb") * float(_GRID))
    acc = F.col("sy") * 1.0 / F.col("nb")
    ybar = F.col("big_y") * 1.0 / F.col("big_n")
    terms = per_bin.crossJoin(F.broadcast(tot)).select(
        "bin",
        "big_n",
        "big_y",
        F.round(F.col("nb") * (conf - acc) * (conf - acc), 9).alias("t_rel"),
        F.round(F.col("nb") * (acc - ybar) * (acc - ybar), 9).alias("t_res"),
    )
    folded = terms.groupBy("big_n", "big_y").agg(
        F.sort_array(F.collect_list(F.struct("bin", "t_rel"))).alias("lr"),
        F.sort_array(F.collect_list(F.struct("bin", "t_res"))).alias("ls"),
    )
    fold = lambda col, field: F.aggregate(  # noqa: E731
        F.transform(col, lambda s: s[field]), F.lit(0.0), lambda a, b: a + b
    )
    return (
        folded.crossJoin(F.broadcast(direct))
        .select(
            F.col("big_n").alias("n"),
            F.lit(_N_BINS).cast("long").alias("n_bins"),
            F.round(
                F.col("sqe").cast("double")
                / (F.col("big_n") * float(_GRID) * float(_GRID)),
                6,
            ).alias("brier"),
            F.round(fold(F.col("lr"), "t_rel") / F.col("big_n"), 6).alias(
                "reliability"
            ),
            F.round(fold(F.col("ls"), "t_res") / F.col("big_n"), 6).alias(
                "resolution"
            ),
            F.round(
                (F.col("big_y") * 1.0 / F.col("big_n"))
                * (1.0 - F.col("big_y") * 1.0 / F.col("big_n")),
                6,
            ).alias("uncertainty"),
        )
    )
