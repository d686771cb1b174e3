"""Probability-proportional-to-size (PPS) systematic sampling
([extension]): draw a fixed-size corpus sample where each document's
inclusion count is proportional to its weight (here ``n_chars`` — a
token-budget proxy), using the classic systematic / fixed-stride rule over
the cumulative weight axis.

Why this and not rand(): training-data pipelines need REPRODUCIBLE samples
("the 100-doc eval slice of snapshot N"), and systematic PPS is the
textbook deterministic design — lay every document end-to-end on a
[0, W) axis (W = total weight), drop ``n`` equally-spaced pins, and a
document is picked once per pin that lands inside its weight segment:

    n_picks(d) = floor(cum_incl(d) * n / W) - floor(cum_excl(d) * n / W)

Everything is BIGINT arithmetic (cum * n never exceeds ~1e16 even at a
100 TB corpus with n = 100), so Spark and DuckDB agree bit-for-bit — no
float stride, no engine RNG.

Scale shape (100 TB): the global cumulative sum is the textbook
SinglePartition window trap; it goes through ``two_phase_prefix``
(operators/twophase.py — range shuffle, per-partition parallel prefix,
bounded driver offsets, broadcast join back), so every stage is parallel
and W itself falls out of the driver subtotals without an extra global
aggregate job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load_table
from .twophase import two_phase_prefix

# Target sample size (pin count). The sample's expected doc count is n
# minus collisions (a doc wider than one stride absorbs several pins —
# reported via n_picks, the true PPS-with-replacement multiplicity).
_PPS_N = 100


@register(
    "q_pps_systematic_sample",
    oracle=f"""
    WITH c AS (
      SELECT doc_id, source, n_chars,
             SUM(n_chars) OVER (ORDER BY doc_id
                                ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(n_chars) OVER () AS w
      FROM documents
    )
    SELECT doc_id, source, n_chars,
           CAST((cum * {_PPS_N}) // w
                - ((cum - n_chars) * {_PPS_N}) // w AS BIGINT) AS n_picks,
           CAST(((cum - n_chars) * {_PPS_N}) // w + 1 AS BIGINT) AS first_pin
    FROM c
    WHERE (cum * {_PPS_N}) // w > ((cum - n_chars) * {_PPS_N}) // w
    """,
)
def q_pps_systematic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted (PPS) systematic sample (n = 100 pins) by
    char-count weight — exact integer pin arithmetic over a two-phase
    parallel prefix sum; see module docstring for the scale argument."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    pre, totals = two_phase_prefix(
        docs,
        group_cols=[],
        order_cols=[F.col("doc_id").asc()],
        values=[("cum_excl", F.col("n_chars"))],
    )
    w = int(totals["cum_excl"][()])
    pin_hi = F.expr(f"(cum_excl + n_chars) * {_PPS_N} div {w}")
    pin_lo = F.expr(f"cum_excl * {_PPS_N} div {w}")
    return (
        pre.withColumn("n_picks", (pin_hi - pin_lo).cast("long"))
        .withColumn("first_pin", (pin_lo + F.lit(1)).cast("long"))
        .filter(F.col("n_picks") > 0)
        .select("doc_id", "source", "n_chars", "n_picks", "first_pin")
    )


# ---------------------------------------------------------------------------
# Neyman-allocation stratified sampling ([extension]): fixed total budget
# split across strata (source) proportionally to N_h * S_h (stratum size x
# stratum std-dev of the weight metric) — the classic variance-minimizing
# allocation for estimating a corpus mean from a fixed-size sample, i.e.
# "spend eval-set slots where the data varies".  Selection within a stratum
# is the deterministic evenly-spaced-rank rule (no RNG, reproducible).
_NEYMAN_BUDGET = 1000


def _neyman_oracle() -> str:
    return f"""
    WITH stats AS (
      SELECT source,
             COUNT(*) AS n_h,
             SUM(CAST(n_chars AS BIGINT)) AS sx,
             SUM(CAST(n_chars AS BIGINT) * CAST(n_chars AS BIGINT)) AS sxx
      FROM documents GROUP BY source
    ), wh AS (
      SELECT source, n_h,
             CASE WHEN n_h > 1 THEN
               CAST(n_h AS DOUBLE) * sqrt(
                 (CAST(n_h AS DOUBLE) * CAST(sxx AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                 / (CAST(n_h AS DOUBLE) * (CAST(n_h AS DOUBLE) - 1.0)))
             ELSE 0.0 END AS w_h
      FROM stats
    ), tot AS (
      SELECT list_reduce(list(w_h ORDER BY source), (a, b) -> a + b) AS w,
             SUM(n_h) AS n_tot
      FROM wh
    ), alloc AS (
      SELECT source, n_h,
             LEAST(n_h, GREATEST(1, CASE WHEN t.w > 0 THEN
               CAST(floor({_NEYMAN_BUDGET} * w_h / t.w) AS BIGINT)
             ELSE
               CAST(({_NEYMAN_BUDGET} * n_h) // t.n_tot AS BIGINT)
             END)) AS n_alloc
      FROM wh, tot t
    ), ranked AS (
      SELECT d.doc_id, d.source, d.n_chars, a.n_alloc, a.n_h,
             ROW_NUMBER() OVER (PARTITION BY d.source ORDER BY d.doc_id) AS r
      FROM documents d JOIN alloc a ON a.source = d.source
    )
    SELECT doc_id, source, CAST(n_chars AS BIGINT) AS n_chars,
           CAST(r AS BIGINT) AS stratum_rank,
           n_alloc AS stratum_alloc
    FROM ranked
    WHERE (r * n_alloc) // n_h > ((r - 1) * n_alloc) // n_h
    """


@register("q_stratified_sample_neyman", oracle=_neyman_oracle())
def q_stratified_sample_neyman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman-allocation stratified sample: budget {B} slots split across
    ``source`` strata proportionally to N_h·S_h (S_h from the exact integer
    sums n·Σx²−(Σx)², evaluated in IEEE doubles so DuckDB reproduces every
    allocation bit-for-bit), then the evenly-spaced-rank systematic rule
    ``(r·n_alloc) div N_h > ((r−1)·n_alloc) div N_h`` picks exactly
    ``n_alloc`` of the stratum's N_h documents — fully deterministic, no
    engine RNG.  The cross-stratum weight total folds in sorted-stratum
    order (sequential left fold == DuckDB list_reduce), never a float SUM
    whose addend order the engine picks.

    Scale shape (100 TB): one hash exchange on ``source`` for the moment
    sums (map-side partial agg), a bounded O(#sources) driver collect for
    the fold (the two-phase-prefix idiom, twophase.py:78), the per-stratum
    rank window partitioned by ``source``, and a broadcast of the tiny
    allocation table — no SinglePartition stage, output ≈ budget rows
    regardless of corpus size.""".replace("{B}", str(_NEYMAN_BUDGET))
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.col("n_chars").cast("long").alias("n_chars")
    )
    stats = docs.groupBy("source").agg(
        F.count("*").alias("n_h"),
        F.sum("n_chars").alias("sx"),
        # DECIMAL(38,0) accumulator (VERDICT r13 #7): Σ n_chars² in a
        # BIGINT wraps near 2e10 docs × (2e4 chars)² ≈ 8e18 — inside one
        # 100 TB stratum's reach (<10³ headroom); the oracle's HUGEINT
        # sum is already exact, so only the Spark side could diverge
        F.sum(
            (F.col("n_chars") * F.col("n_chars")).cast("decimal(38,0)")
        ).alias("sxx"),
    )
    nd = F.col("n_h").cast("double")
    w_h = F.when(
        F.col("n_h") > 1,
        nd
        * F.sqrt(
            (nd * F.col("sxx").cast("double")
             - F.col("sx").cast("double") * F.col("sx").cast("double"))
            / (nd * (nd - F.lit(1.0)))
        ),
    ).otherwise(F.lit(0.0))
    wh = stats.select("source", "n_h", w_h.alias("w_h"))
    # bounded driver fold (O(#sources) rows) in sorted-stratum order: the
    # SAME sequential left fold the oracle's list_reduce(.. ORDER BY source)
    # performs, so the double total is bit-identical across engines
    rows = sorted(wh.collect(), key=lambda r: r["source"])
    w_tot = 0.0
    n_tot = 0
    for r in rows:
        w_tot = w_tot + r["w_h"]
        n_tot += r["n_h"]
    if w_tot > 0:
        raw = F.floor(F.lit(float(_NEYMAN_BUDGET)) * F.col("w_h") / F.lit(w_tot))
    else:
        raw = F.expr(f"({_NEYMAN_BUDGET} * n_h) div {n_tot}")
    alloc = wh.select(
        "source",
        F.col("n_h"),
        F.least(
            F.col("n_h"), F.greatest(F.lit(1).cast("long"), raw.cast("long"))
        ).alias("n_alloc"),
    )
    from pyspark.sql import Window

    r = F.row_number().over(
        Window.partitionBy("source").orderBy(F.col("doc_id").asc())
    )
    ranked = docs.join(F.broadcast(alloc), "source").withColumn("r", r)
    keep = F.expr("(r * n_alloc) div n_h") > F.expr("((r - 1) * n_alloc) div n_h")
    return ranked.filter(keep).select(
        "doc_id",
        "source",
        "n_chars",
        F.col("r").cast("long").alias("stratum_rank"),
        F.col("n_alloc").alias("stratum_alloc"),
    )


# ---------------------------------------------------------------------------
# Priority sampling (Duffield-Lund-Thorup) ([extension]): weighted sampling
# WITHOUT replacement with an unbiased subset-sum estimator — the third
# sampling design next to systematic PPS (with replacement) and Neyman
# stratified allocation.  Each row gets priority w/u for a deterministic
# uniform u; the top-k priorities are the sample and the (k+1)-th priority
# is the estimator threshold tau, with w_hat = max(w, tau) unbiased for
# subset sums.  u derives from an md5 prefix, and the priority uses ONLY
# IEEE basic ops (cast/multiply/divide — no libm pow/log whose last-ulp
# behavior differs across engines), so selection and estimators hash-check.
_PRI_K = 100
_PRI_SCALE = float(1 << 60)  # 2^60 is dyadic: exact as a double


def _priority_oracle() -> str:
    return f"""
    WITH pri AS (
      SELECT doc_id, source, CAST(n_chars AS BIGINT) AS n_chars,
             (CAST(n_chars AS DOUBLE) * {_PRI_SCALE!r})
               / CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                      ::BIGINT + 1 AS DOUBLE) AS pri
      FROM documents
    ), top AS (
      SELECT * FROM pri ORDER BY pri DESC, doc_id LIMIT {_PRI_K + 1}
    ), tau AS (
      -- DLT defines tau = 0 when the corpus has <= k rows (everything is
      -- sampled and w_hat = w); only a full (k+1)-row frame yields a
      -- threshold.  Mirrored exactly in the Spark side.
      SELECT CASE WHEN COUNT(*) >= {_PRI_K + 1} THEN MIN(pri)
                  ELSE 0.0 END AS t
      FROM top
    ), ranked AS (
      SELECT doc_id, source, n_chars, pri,
             ROW_NUMBER() OVER (ORDER BY pri DESC, doc_id) AS rn
      FROM top
    )
    SELECT doc_id, source, n_chars,
           ROUND(pri, 5) AS priority5,
           ROUND(GREATEST(CAST(n_chars AS DOUBLE), t.t), 5) AS w_hat5
    FROM ranked, tau t
    WHERE rn <= {_PRI_K}
    """


@register("q_priority_sample_topk", oracle=_priority_oracle())
def q_priority_sample_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Priority sample of k = {K} documents weighted by ``n_chars``:
    priority = w·2⁶⁰/(h+1) with h the 60-bit md5 prefix of the doc_id — a
    deterministic uniform, so the whole design is reproducible and every
    arithmetic step is an IEEE basic op both engines round identically
    (2⁶⁰ is dyadic, hence exact; no pow/log).  The (k+1)-th priority is
    the DLT threshold τ and ``w_hat = max(w, τ)`` is the unbiased
    subset-sum estimator the paper constructs.

    Scale shape (100 TB): the priority is computed map-side; the global
    top-(k+1) is Spark's TakeOrdered (per-partition heads, no
    SinglePartition shuffle of the corpus); τ and the final rank touch
    only the (k+1)-row frame.  Output is k rows at any corpus
    size.""".replace("{K}", str(_PRI_K))
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.col("n_chars").cast("long").alias("n_chars")
    )
    h = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10
    ).cast("long")
    pri = (F.col("n_chars").cast("double") * F.lit(_PRI_SCALE)) / (
        h + F.lit(1)
    ).cast("double")
    top = (
        docs.withColumn("pri", pri)
        .orderBy(F.desc("pri"), F.asc("doc_id"))
        .limit(_PRI_K + 1)
    )
    # DLT degenerate case: with n <= k rows there is no (k+1)-th priority
    # and the paper defines tau = 0 (w_hat = w).  Without the guard tau
    # would equal the smallest SAMPLED priority, biasing w_hat upward.
    tau = top.agg(
        F.when(F.count(F.lit(1)) >= _PRI_K + 1, F.min("pri"))
        .otherwise(F.lit(0.0))
        .alias("t")
    )
    from pyspark.sql import Window

    # the rank window spans only the (k+1)-row TakeOrdered result — a
    # bounded frame, same class as the 10-checkpoint vocab windows
    rn = F.row_number().over(
        Window.orderBy(F.desc("pri"), F.asc("doc_id"))
    )
    return (
        top.crossJoin(F.broadcast(tau))
        .withColumn("rn", rn)
        .filter(F.col("rn") <= _PRI_K)
        .select(
            "doc_id",
            "source",
            "n_chars",
            F.round("pri", 5).alias("priority5"),
            F.round(
                F.greatest(F.col("n_chars").cast("double"), F.col("t")), 5
            ).alias("w_hat5"),
        )
    )


@register(
    "q_label_balance_downsample",
    oracle=r"""
    WITH e AS (
      SELECT vec_id, label,
             ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT
               % 10000 AS gate
      FROM embeddings
    ), per AS (
      SELECT label, COUNT(*) AS n_total FROM e GROUP BY label
    ), tgt AS (
      SELECT MIN(n_total) AS target FROM per
    ), plan AS (
      SELECT p.label, p.n_total, t.target,
             CAST(t.target * 10000 // p.n_total AS BIGINT) AS rate_bp
      FROM per p, tgt t
    )
    SELECT pl.label, pl.n_total, pl.target, pl.rate_bp,
           CAST(SUM(CASE WHEN e.gate < pl.rate_bp THEN 1 ELSE 0 END)
                AS BIGINT) AS n_sampled,
           CAST(SUM(CASE WHEN e.gate < pl.rate_bp THEN 1 ELSE 0 END)
                * 10000 // pl.n_total AS BIGINT) AS achieved_bp
    FROM plan pl JOIN e ON e.label = pl.label
    GROUP BY pl.label, pl.n_total, pl.target, pl.rate_bp
    """,
)
def q_label_balance_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-rebalancing downsample plan AND its realized outcome: every
    label keeps at most the rarest label's count, via a CONTENT-DETERMINED
    hash gate (md5 of vec_id in basis points) rather than rand() — so the
    same rows are kept on every run, on every engine, and the whole
    rebalance hash-checks.  Reports per label the population, the target,
    the keep-rate in basis points, and the exact realized sample size
    (hash gates undershoot/overshoot the target slightly — the achieved_bp
    column is the audit of that gap, which a rand()-based sampler could
    never pin down).

    Scale shape: one (label) aggregate with map-side combine (10 keys), a
    broadcast of the 10-row plan back onto the scan, and a second 10-key
    aggregate — the embeddings' vector payload is never read (column
    pruning), and nothing shuffles except 10-row frames."""
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        (
            F.conv(
                F.substring(F.md5(F.col("vec_id").cast("string")), 1, 15),
                16,
                10,
            ).cast("long")
            % 10000
        ).alias("gate"),
    )
    per = e.groupBy("label").agg(F.count("*").alias("n_total"))
    tgt = per.agg(F.min("n_total").alias("target"))
    plan = per.crossJoin(F.broadcast(tgt)).select(
        "label",
        "n_total",
        "target",
        F.expr("target * 10000 DIV n_total").alias("rate_bp"),
    )
    joined = e.join(F.broadcast(plan), "label")
    return joined.groupBy("label", "n_total", "target", "rate_bp").agg(
        F.sum(F.when(F.col("gate") < F.col("rate_bp"), 1).otherwise(0))
        .cast("long")
        .alias("n_sampled"),
        F.expr(
            "CAST(SUM(CASE WHEN gate < rate_bp THEN 1 ELSE 0 END) "
            "* 10000 DIV n_total AS BIGINT)"
        ).alias("achieved_bp"),
    )


# ---------------------------------------------------------------------------
# Subsample-stability CI (r15): B deterministic half-samples of the metric,
# one corpus pass — the poor-man's bootstrap a 100 TB pipeline can afford.
# ---------------------------------------------------------------------------
_CI_B = 32  # number of deterministic half-sample replicates


@register(
    "q_subsample_stability_ci",
    oracle=f"""
    WITH e AS (
      SELECT CAST(ROUND(value * 100, 0) AS BIGINT) AS cents,
             ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15))::BIGINT
               AS h1,
             ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 17, 14))::BIGINT
               AS h2
      FROM events WHERE event_type = 'purchase'
    ), full_m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_events,
             ROUND(SUM(cents) * 1.0 / COUNT(*) / 100, 6) AS full_mean
      FROM e
    ), res AS (
      SELECT b, SUM(cents) AS s, COUNT(*) AS c
      FROM e, UNNEST(generate_series(0, {_CI_B} - 1)) AS t(b)
      -- membership draws on LOW DIGITS of the mixed hash, not bare parity:
      -- (h1 + b*h2) % 2 collapses to parity(h1) XOR (b%2)*parity(h2) — only
      -- TWO distinct replicates; mod 1000 < 500 varies with every b
      WHERE (h1 + b * h2) % 1000 < 500
      GROUP BY b
    ), means AS (
      SELECT ROUND(s * 1.0 / c / 100, 6) AS m FROM res
    )
    SELECT full_m.n_events,
           full_m.full_mean,
           CAST({_CI_B} AS BIGINT) AS n_resamples,
           ROUND(quantile_cont(m, 0.025), 6) AS ci_low,
           ROUND(quantile_cont(m, 0.975), 6) AS ci_high
    FROM means, full_m
    GROUP BY full_m.n_events, full_m.full_mean
    """,
)
def q_subsample_stability_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subsampling confidence interval for the mean purchase value — 32
    deterministic HALF-SAMPLES of the corpus, each drawn from the
    Kirsch-Mitzenmacher double-hash family ((h1 + b·h2) mod 1000 < 500 —
    ONE md5 per row for all replicates, the minhash signature trick; a
    bare mod-2 bit would collapse to parity(h1) XOR b·parity(h2), i.e.
    only TWO distinct replicates — caught by the r15 referee), metric
    recomputed per replicate, CI = the 2.5/97.5 interpolated percentiles
    of the replicate means.  The subsampling bootstrap (Politis &
    Romano 1994, public method) is the variant a distributed engine can
    afford: no resampling with replacement, no per-replicate pass.

    Exactness: per-replicate sums are exact integer CENTS; membership
    bits are integer hash arithmetic reproduced verbatim by the oracle
    (h1 < 2⁶⁰, h2 < 2⁵⁶, b ≤ 32−1 ⇒ h1 + b·h2 < 2⁶³, no overflow in
    either engine); only each replicate's final mean divides once.

    Scale shape: ONE events scan; the replicate fan-out explodes each
    row into its member replicates BUT partial aggregation collapses
    them to ≤32 partials per task before the exchange — the shuffle
    carries O(32 × tasks) rows regardless of corpus size.  The
    percentile runs over a 32-row frame."""
    from .dedup import _md5_long

    e = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
            _md5_long(F.col("event_id").cast("string")).alias("h1"),
            F.conv(
                F.substring(F.md5(F.col("event_id").cast("string")), 17, 14),
                16,
                10,
            )
            .cast("long")
            .alias("h2"),
        )
    )
    full_m = e.agg(
        F.count("*").cast("long").alias("n_events"),
        F.round(F.sum("cents") * 1.0 / F.count("*") / 100, 6).alias(
            "full_mean"
        ),
    )
    res = (
        e.select(
            "cents",
            F.explode(
                F.filter(
                    F.sequence(F.lit(0), F.lit(_CI_B - 1)),
                    lambda b: (F.col("h1") + b * F.col("h2")) % 1000 < 500,
                )
            ).alias("b"),
        )
        .groupBy("b")
        .agg(
            F.round(F.sum("cents") * 1.0 / F.count("*") / 100, 6).alias("m")
        )
    )
    # n_resamples is the ATTEMPTED replicate count (the oracle's
    # definition, `CAST({_CI_B} AS BIGINT)`), not the materialized group
    # count: on a tiny/heavily-filtered input an empty replicate would
    # otherwise make the two sides disagree (r15 advisor).
    ci = res.agg(
        F.lit(_CI_B).cast("long").alias("n_resamples"),
        F.round(F.percentile("m", F.lit(0.025)), 6).alias("ci_low"),
        F.round(F.percentile("m", F.lit(0.975)), 6).alias("ci_high"),
    )
    return full_m.crossJoin(F.broadcast(ci)).select(
        "n_events", "full_mean", "n_resamples", "ci_low", "ci_high"
    )


# ---------------------------------------------------------------------------
# Effective sample size of mixture-reweighting importance weights (r15).
# ---------------------------------------------------------------------------
@register(
    "q_effective_sample_size",
    oracle="""
    WITH s AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS ns
      FROM documents GROUP BY source
    ), g AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_sources,
             CAST(SUM(ns) AS BIGINT) AS n_docs,
             CAST(SUM(CAST(ROUND(1000000000000.0 / ns, 0) AS BIGINT))
                  AS BIGINT) AS inv_u
      FROM s
    )
    SELECT n_docs, n_sources,
           ROUND(n_sources * n_sources * 1000000000000.0 / inv_u, 4) AS ess,
           ROUND(n_sources * n_sources * 1000000000000.0 / inv_u / n_docs,
                 6) AS ess_fraction
    FROM g
    """,
)
def q_effective_sample_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Effective sample size (Kong 1992, public method) of the importance
    weights that reweight the corpus's source mixture to a UNIFORM
    target — the first number a mixture designer checks: resampling to
    equal source shares behaves like a corpus of only ESS documents, so
    a rare source craters it.  With w_doc = N/(S·n_s), the estimator
    collapses in closed form to ESS = S²/Σ_s(1/n_s) = S·HM(n_s) — the
    harmonic mean punishing small sources exactly as importance
    sampling does.

    Exactness: per-source inverse terms are quantized to exact 1e-12
    integer units before the sum (order-independent), two rounded double
    divisions at the end.

    Scale shape: one hash aggregate on source (map-side combined), one
    constant-size reduce over the ≤#sources frame.  No weights are ever
    materialized per document — the closed form does the 10¹²-row work
    in O(#sources)."""
    s = (
        load_table(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.count("*").alias("ns"))
    )
    g = s.agg(
        F.count("*").cast("long").alias("n_sources"),
        F.sum("ns").cast("long").alias("n_docs"),
        F.sum(
            F.round(F.lit(1000000000000.0) / F.col("ns"), 0).cast("long")
        )
        .cast("long")
        .alias("inv_u"),
    )
    return g.select(
        "n_docs",
        "n_sources",
        F.round(
            F.col("n_sources")
            * F.col("n_sources")
            * F.lit(1000000000000.0)
            / F.col("inv_u"),
            4,
        ).alias("ess"),
        F.round(
            F.col("n_sources")
            * F.col("n_sources")
            * F.lit(1000000000000.0)
            / F.col("inv_u")
            / F.col("n_docs"),
            6,
        ).alias("ess_fraction"),
    )
