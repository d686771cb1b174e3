"""Privacy / re-identification governance operators (E5 extension).

A training-data pipeline that ships user-derived corpora owes its governance
review a re-identification risk report: k-anonymity (Sweeney 2002, public
method) asks, for a chosen quasi-identifier tuple, how many records share
each combination — a record in a group of size k < threshold is
re-identifiable by linking those attributes to an outside dataset.  The
reference delegates all querying to Postgres (ref changesetmd.py:1-274);
this report is the same GROUP BY surface applied to the governance question
a 100 TB corpus actually faces before release.

Scale shape: one hash exchange on the QI tuple with map-side partial
aggregation, then an O(#distinct-k) second aggregate — no window over the
data, no driver collect.  At 10¹² rows this is exactly the q1-style
two-level rollup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load_table

# k-anonymity threshold: groups smaller than this are "at risk" (the k=5
# convention from the public health-data de-identification literature)
_K_THRESHOLD = 5

# account-balance generalization width: raw c_acctbal is near-unique (a
# direct identifier); the QI models the released, generalized column
_BAL_BUCKET = 1000


@register(
    "q_kanonymity_risk",
    oracle=f"""
    WITH qi AS (
      SELECT c_nationkey,
             c_mktsegment,
             CAST(FLOOR(c_acctbal / {_BAL_BUCKET}) AS BIGINT) AS bal_bucket
      FROM customer
    ), grp AS (
      SELECT c_nationkey, c_mktsegment, bal_bucket, COUNT(*) AS k
      FROM qi GROUP BY 1, 2, 3
    ), cls AS (
      SELECT CASE WHEN k = 1 THEN '1'
                  WHEN k < {_K_THRESHOLD} THEN '2-4'
                  WHEN k < 10 THEN '5-9'
                  ELSE '10+' END AS k_class,
             k
      FROM grp
    ), tot AS (
      SELECT CAST(SUM(k) AS BIGINT) AS n_rows FROM cls
    )
    SELECT k_class,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(SUM(k) AS BIGINT) AS n_records,
           CAST(SUM(k) * 10000 // MAX(tot.n_rows) AS BIGINT) AS share_bp,
           CAST(MAX(CASE WHEN k < {_K_THRESHOLD} THEN 1 ELSE 0 END) AS BIGINT)
             AS at_risk
    FROM cls, tot
    GROUP BY k_class
    """,
)
def q_kanonymity_risk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity risk report over the ``customer`` entity table: QI =
    (nation, market segment, account balance generalized to $1000
    buckets).  Emits the k-class histogram (singletons / 2-4 / 5-9 / 10+)
    with record counts, basis-point share (exact integer arithmetic —
    ``k·10000 // total``, never a float percent that could hash-diverge),
    and an at-risk flag for classes under k={_K_THRESHOLD}.

    Spark-first shape: two stacked hash aggregates (QI tuple → group
    sizes → k-class rollup), both map-side combined; the total-rows
    scalar attaches as a broadcast single-row aggregate, so nothing is
    ever single-partition except the ≤4-row result."""
    cust = load_table(spark, sf_dir, "customer")
    qi = cust.select(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / _BAL_BUCKET).cast("long").alias(
            "bal_bucket"
        ),
    )
    grp = qi.groupBy("c_nationkey", "c_mktsegment", "bal_bucket").agg(
        F.count("*").alias("k")
    )
    k_class = (
        F.when(F.col("k") == 1, "1")
        .when(F.col("k") < _K_THRESHOLD, "2-4")
        .when(F.col("k") < 10, "5-9")
        .otherwise("10+")
    )
    cls = grp.select(k_class.alias("k_class"), "k")
    # The total-rows denominator derives from the ≤4-row k-class frame
    # (Σ n_records over classes ≡ table rows), and that frame is persisted
    # — without both, the total branch and the join branch each re-run
    # the corpus aggregate (Catalyst does not dedupe shared DataFrame
    # subplans), i.e. two full table scans at 100 TB for a 4-row report.
    per = cls.groupBy("k_class").agg(
        F.count("*").alias("n_groups"),
        F.sum("k").alias("n_records"),
        F.max(F.when(F.col("k") < _K_THRESHOLD, 1).otherwise(0))
        .cast("long")
        .alias("at_risk"),
    ).persist()
    tot = per.agg(F.sum("n_records").alias("n_rows"))
    out = (
        per.crossJoin(F.broadcast(tot))
        .select(
            "k_class",
            "n_groups",
            "n_records",
            F.expr("n_records * 10000 div n_rows").alias("share_bp"),
            "at_risk",
        )
    )
    from .util import materialize_releasing

    return materialize_releasing(out, per)


# l-diversity threshold: QI groups whose sensitive attribute shows fewer
# than this many distinct values are attribute-disclosure risks even when
# k-anonymous (Machanavajjhala et al. 2007, public method)
_L_THRESHOLD = 3


@register(
    "q_ldiversity_risk",
    oracle=f"""
    WITH grp AS (
      SELECT c_nationkey,
             CAST(FLOOR(c_acctbal / {_BAL_BUCKET}) AS BIGINT) AS bal_bucket,
             COUNT(*) AS k,
             COUNT(DISTINCT c_mktsegment) AS l
      FROM customer
      GROUP BY 1, 2
    )
    SELECT CAST(l AS BIGINT) AS l,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(SUM(k) AS BIGINT) AS n_records,
           CAST(MIN(k) AS BIGINT) AS min_group_size,
           CAST(CASE WHEN l < {_L_THRESHOLD} THEN 1 ELSE 0 END AS BIGINT)
             AS at_risk
    FROM grp
    GROUP BY l
    ORDER BY l
    """,
)
def q_ldiversity_risk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit (Machanavajjhala 2007, public method) — the
    companion to q_kanonymity_risk: a QI group can be k-anonymous yet
    still leak its sensitive attribute if every member SHARES it
    (homogeneity attack).  Here the QI is (nation, generalized balance
    bucket) and the sensitive attribute is the market segment; the
    report histograms groups by their distinct-sensitive-value count l,
    flagging l < {_L_THRESHOLD}.

    Exactness: pure integer counting — group sizes, exact distinct
    counts, and the threshold flag; nothing fractional.

    Scale shape: the COUNT(DISTINCT) plans as Spark's expand + two-level
    aggregate — both exchanges keyed on the QI tuple (the k-anonymity
    exchange) with map-side partials, then an O(#distinct-l) rollup.  No
    window, no collect; the 10¹²-row form is identical."""
    grp = (
        load_table(spark, sf_dir, "customer")
        .groupBy(
            "c_nationkey",
            F.floor(F.col("c_acctbal") / _BAL_BUCKET)
            .cast("long")
            .alias("bal_bucket"),
        )
        .agg(
            F.count("*").alias("k"),
            F.countDistinct("c_mktsegment").alias("l"),
        )
    )
    return (
        grp.groupBy(F.col("l").cast("long").alias("l"))
        .agg(
            F.count("*").cast("long").alias("n_groups"),
            F.sum("k").cast("long").alias("n_records"),
            F.min("k").cast("long").alias("min_group_size"),
        )
        .select(
            "l",
            "n_groups",
            "n_records",
            "min_group_size",
            F.when(F.col("l") < _L_THRESHOLD, 1)
            .otherwise(0)
            .cast("long")
            .alias("at_risk"),
        )
        .orderBy("l")
    )


# t-closeness threshold in basis points of total-variation distance: QI
# groups whose sensitive-attribute distribution sits farther than this from
# the global distribution leak attribute information even when k-anonymous
# and l-diverse (Li, Li & Venkatasubramanian 2007, public method).  0.15 is
# the paper's illustrative t.
_T_THRESHOLD_BP = 1500


@register(
    "q_tcloseness_risk",
    oracle=f"""
    WITH seg_dist AS (
      SELECT c_mktsegment AS seg, CAST(COUNT(*) AS BIGINT) AS g
      FROM customer GROUP BY 1
    ), tot AS (
      SELECT CAST(SUM(g) AS BIGINT) AS big_n FROM seg_dist
    ), cell AS (
      SELECT c_nationkey,
             CAST(FLOOR(c_acctbal / {_BAL_BUCKET}) AS BIGINT) AS bal_bucket,
             c_mktsegment AS seg,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM customer GROUP BY 1, 2, 3
    ), cellk AS (
      SELECT cell.*, g, big_n,
             CAST(SUM(cnt) OVER (PARTITION BY c_nationkey, bal_bucket)
                  AS BIGINT) AS k
      FROM cell JOIN seg_dist USING (seg) CROSS JOIN tot
    ), per_group AS (
      SELECT c_nationkey, bal_bucket, big_n, k,
             CAST(SUM(ABS(CAST(cnt AS HUGEINT) * big_n
                          - CAST(g AS HUGEINT) * k)) AS HUGEINT)
               AS present_num,
             CAST(SUM(g) AS BIGINT) AS present_g
      FROM cellk
      GROUP BY c_nationkey, bal_bucket, big_n, k
    ), t AS (
      SELECT k,
             CAST((present_num
                   + CAST(k AS HUGEINT) * (big_n - present_g)) * 10000
                  // (2 * CAST(k AS HUGEINT) * big_n) AS BIGINT) AS t_bp
      FROM per_group
    ), cls AS (
      SELECT CASE WHEN t_bp >= {_T_THRESHOLD_BP} THEN 'breach'
                  WHEN t_bp >= {_T_THRESHOLD_BP // 2} THEN 'watch'
                  ELSE 'close' END AS t_class,
             k, t_bp
      FROM t
    )
    SELECT t_class,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(SUM(k) AS BIGINT) AS n_records,
           CAST(MAX(t_bp) AS BIGINT) AS max_t_bp,
           CAST(MAX(CASE WHEN t_bp >= {_T_THRESHOLD_BP} THEN 1 ELSE 0 END)
                AS BIGINT) AS at_risk
    FROM cls GROUP BY t_class
    ORDER BY t_class
    """,
)
def q_tcloseness_risk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit (Li 2007, public method) — completes the
    k-anonymity / l-diversity / t-closeness release-governance triad:
    even an l-diverse QI group leaks when its sensitive-attribute
    DISTRIBUTION diverges from the global one (skewness attack).  Per
    (nation, balance-bucket) group, the total-variation distance between
    the group's market-segment distribution and the corpus-wide one, in
    EXACT integer basis points; groups are classed close / watch /
    breach at t = {T}bp.

    Exactness: TVD = Σ|cnt·N − g·k| / (2·k·N) with absent segments
    contributing k·(N − Σ_present g) — the division is cleared into one
    integer floor at the end (HUGEINT/DECIMAL(38) intermediates: cnt·N
    alone can pass 2⁶³ at 10⁹ rows).

    Scale shape: one (QI, segment) hash aggregate, a broadcast 5-row
    segment-distribution join + 1-row total, a second hash aggregate on
    the QI key, and a ≤3-row class rollup — the exact q_kanonymity_risk
    skeleton with one more broadcast.""".replace("{T}", str(_T_THRESHOLD_BP))
    cust = load_table(spark, sf_dir, "customer")
    glob = cust.groupBy(F.col("c_mktsegment").alias("seg")).agg(
        F.count("*").alias("g")
    )
    tot = glob.agg(F.sum("g").alias("big_n"))
    cell = cust.groupBy(
        "c_nationkey",
        F.floor(F.col("c_acctbal") / _BAL_BUCKET).cast("long").alias(
            "bal_bucket"
        ),
        F.col("c_mktsegment").alias("seg"),
    ).agg(F.count("*").alias("cnt"))
    joined = cell.join(F.broadcast(glob), "seg").crossJoin(F.broadcast(tot))
    d38 = "decimal(38,0)"
    cellk = joined.withColumn(
        "k",
        F.sum("cnt").over(Window.partitionBy("c_nationkey", "bal_bucket")),
    )
    per_group = cellk.groupBy("c_nationkey", "bal_bucket", "big_n", "k").agg(
        F.sum("g").alias("present_g"),
        F.sum(
            F.abs(
                F.col("cnt").cast(d38) * F.col("big_n")
                - F.col("g").cast(d38) * F.col("k")
            )
        ).cast(d38).alias("present_num"),
    )
    t_bp = F.expr(
        "CAST((present_num + CAST(k AS DECIMAL(38,0)) * (big_n - present_g))"
        " * 10000 div (2 * CAST(k AS DECIMAL(38,0)) * big_n) AS BIGINT)"
    )
    cls = per_group.select(
        "k",
        t_bp.alias("t_bp"),
        F.when(t_bp >= _T_THRESHOLD_BP, "breach")
        .when(t_bp >= _T_THRESHOLD_BP // 2, "watch")
        .otherwise("close")
        .alias("t_class"),
    )
    return (
        cls.groupBy("t_class")
        .agg(
            F.count("*").alias("n_groups"),
            F.sum("k").alias("n_records"),
            F.max("t_bp").alias("max_t_bp"),
            F.max(
                F.when(F.col("t_bp") >= _T_THRESHOLD_BP, 1).otherwise(0)
            )
            .cast("long")
            .alias("at_risk"),
        )
        .orderBy("t_class")
    )
