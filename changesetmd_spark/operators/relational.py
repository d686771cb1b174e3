"""Core relational operator surface (SURVEY.md §2.2-2.8).

The reference implements no query execution itself — its schema + README
define the surface Postgres executes (equality/range predicates implied by
the indexes at ref queries.py:43-46, the changeset⋈comment join implied by
ref queries.py:22, counting aggregates at ref README.md:110-124).  Here that
surface — plus the standard relational algebra any replacement engine needs —
is expressed as declarative DataFrame plans so Catalyst gets pushdown,
pruning, join selection and AQE for free.

Scale notes (100 TB): every query below shuffles only on its aggregation or
join keys; dimension tables (region/nation/supplier/customer) are explicitly
`broadcast()` so the big fact tables (orders/lineitem) never shuffle for those
joins; aggregations use Spark's automatic partial (map-side) aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import as_double, fmt_date, money, one_minus, one_plus, rate
from ..registry import register
from ..tables import load_table


# ---------------------------------------------------------------------------
# A2/A3: filtered aggregate rollup (TPC-H Q1 shape) — pricing summary.
# Partial aggregation happens map-side; the only shuffle is on the tiny
# (returnflag, linestatus) key space.
# ---------------------------------------------------------------------------
@register(
    "q1_pricing_summary",
    oracle="""
    SELECT
      l_returnflag,
      l_linestatus,
      CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l_discount AS DECIMAL(6,4)))), 2) AS DOUBLE) AS sum_disc_price,
      CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l_discount AS DECIMAL(6,4)))
               * (1 + CAST(l_tax AS DECIMAL(6,4)))), 2) AS DOUBLE) AS sum_charge,
      ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 4) AS avg_qty,
      ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 4) AS avg_price,
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp")
    )
    disc_price = money("l_extendedprice") * one_minus(rate("l_discount"))
    charge = disc_price * one_plus(rate("l_tax"))
    out = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(money("l_quantity")).alias("_sum_qty"),
        F.sum(money("l_extendedprice")).alias("_sum_base"),
        F.sum(disc_price).alias("_sum_disc"),
        F.sum(charge).alias("_sum_charge"),
        F.count("*").alias("count_order"),
    )
    return out.select(
        "l_returnflag",
        "l_linestatus",
        as_double(F.col("_sum_qty")).alias("sum_qty"),
        as_double(F.col("_sum_base")).alias("sum_base_price"),
        # round the exact decimal to scale 2 BEFORE the double cast: above
        # 2^53 of scaled integer, DuckDB's decimal->double conversion is not
        # correctly rounded, so both engines cast the narrower value
        as_double(F.round(F.col("_sum_disc"), 2)).alias("sum_disc_price"),
        as_double(F.round(F.col("_sum_charge"), 2)).alias("sum_charge"),
        F.round(as_double(F.col("_sum_qty")) / F.col("count_order"), 4).alias("avg_qty"),
        F.round(as_double(F.col("_sum_base")) / F.col("count_order"), 4).alias("avg_price"),
        "count_order",
    )


# ---------------------------------------------------------------------------
# Flagship (entry()): multi-way star join + aggregate (TPC-H Q5 shape).
# Dimensions are broadcast — at 100 TB the only shuffle left is the final
# groupBy on n_name (25 keys).  lineitem⋈orders stays a shuffled hash/SMJ on
# orderkey, the natural co-partitioning key for both fact tables.
# ---------------------------------------------------------------------------
@register(
    "q5_revenue_by_nation",
    oracle="""
    SELECT n_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(6,4)))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name IN ('ASIA', 'EUROPE')
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    """,
)
def q5_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name").isin("ASIA", "EUROPE")
    )
    dims = F.broadcast(
        customer.join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey", "n_name")
    )
    revenue = money("l_extendedprice") * one_minus(rate("l_discount"))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(dims, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("n_name")
        .agg(
            as_double(F.sum(revenue)).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# J1-shape join + group + deterministic top-k (TPC-H Q3 shape).
# ---------------------------------------------------------------------------
@register(
    "q3_top_revenue_orders",
    oracle="""
    SELECT l_orderkey,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(6,4)))) AS DOUBLE) AS revenue,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cutoff = F.lit("1998-03-15 00:00:00").cast("timestamp")
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    revenue = money("l_extendedprice") * one_minus(rate("l_discount"))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust.select("c_custkey")), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(as_double(F.sum(revenue)).alias("revenue"))
        .select("l_orderkey", "revenue", fmt_date("o_orderdate").alias("orderdate"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Semi / anti joins (SURVEY §2.3: free in Spark, exercised by dedup too).
# ---------------------------------------------------------------------------
@register(
    "q_semi_join_active_customers",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_totalprice > 100000)
    """,
)
def q_semi_join_active_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 100000)
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name", "c_mktsegment")


@register(
    "q_anti_join_dormant_customers",
    oracle="""
    SELECT c_custkey, c_name, ROUND(c_acctbal, 2) AS acctbal
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def q_anti_join_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select(
            "c_custkey",
            "c_name",
            F.round(F.col("c_acctbal"), 2).alias("acctbal"),
        )
    )


# ---------------------------------------------------------------------------
# Left outer join + aggregate keeping empty groups.
# ---------------------------------------------------------------------------
@register(
    "q_outer_join_order_counts",
    oracle="""
    SELECT c_custkey,
           COUNT(o_orderkey) AS n_orders,
           CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 0) AS DOUBLE) AS total_spend
    FROM customer
    LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
    """,
)
def q_outer_join_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            as_double(
                F.coalesce(F.sum(money("o_totalprice")), F.lit(0).cast("decimal(18,2)"))
            ).alias("total_spend"),
        )
    )


# ---------------------------------------------------------------------------
# §2.5 window functions: ranking top-k per group (row_number for determinism).
# ---------------------------------------------------------------------------
@register(
    "q_window_topk_orders_per_customer",
    oracle="""
    SELECT * FROM (
      SELECT o_custkey, o_orderkey,
             ROUND(o_totalprice, 2) AS totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders)
    WHERE rn <= 3
    """,
)
def q_window_topk_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            F.round(F.col("o_totalprice"), 2).alias("totalprice"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


# ---------------------------------------------------------------------------
# §2.5 analytic windows: running total + lag over a fully-specified order.
# Money kept decimal inside the running SUM so the fold is exact.
# ---------------------------------------------------------------------------
@register(
    "q_window_running_total",
    oracle="""
    SELECT o_custkey, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                  OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS running_spend,
           CAST(LAG(CAST(o_totalprice AS DECIMAL(18,2)))
                  OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS DOUBLE)
             AS prev_price
    FROM orders
    """,
)
def q_window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        fmt_date("o_orderdate").alias("orderdate"),
        as_double(
            F.sum(money("o_totalprice")).over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
        ).alias("running_spend"),
        as_double(F.lag(money("o_totalprice")).over(w)).alias("prev_price"),
    )


# ---------------------------------------------------------------------------
# §2.7 set operations: UNION / INTERSECT / EXCEPT (distinct semantics).
# ---------------------------------------------------------------------------
@register(
    "q_set_ops_customer_cohorts",
    oracle="""
    SELECT c_custkey FROM (
      SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      UNION
      SELECT c_custkey FROM customer WHERE c_acctbal > 5000
    )
    EXCEPT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def q_set_ops_customer_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    building = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    rich = cust.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    finished = orders.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("c_custkey")
    )
    return building.union(rich).distinct().subtract(finished)


@register(
    "q_intersect_segments",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'
    """,
)
def q_intersect_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    low = orders.filter(F.col("o_orderpriority") == "5-LOW").select("o_custkey")
    return urgent.intersect(low)


# ---------------------------------------------------------------------------
# A5: ROLLUP / CUBE grouping sets.
# ---------------------------------------------------------------------------
@register(
    "q_rollup_nation_segment",
    oracle="""
    SELECT COALESCE(n_name, 'ALL') AS nation,
           COALESCE(c_mktsegment, 'ALL') AS segment,
           COUNT(*) AS n_customers,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_balance
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY ROLLUP (n_name, c_mktsegment)
    """,
)
def q_rollup_nation_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    joined = cust.join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
    return (
        joined.rollup("n_name", "c_mktsegment")
        .agg(
            F.count("*").alias("n_customers"),
            as_double(F.sum(money("c_acctbal"))).alias("total_balance"),
        )
        .select(
            F.coalesce(F.col("n_name"), F.lit("ALL")).alias("nation"),
            F.coalesce(F.col("c_mktsegment"), F.lit("ALL")).alias("segment"),
            "n_customers",
            "total_balance",
        )
    )


@register(
    "q_cube_order_status_priority",
    oracle="""
    SELECT COALESCE(o_orderstatus, 'ALL') AS status,
           COALESCE(o_orderpriority, 'ALL') AS priority,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def q_cube_order_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
        .select(
            F.coalesce(F.col("o_orderstatus"), F.lit("ALL")).alias("status"),
            F.coalesce(F.col("o_orderpriority"), F.lit("ALL")).alias("priority"),
            "n_orders",
        )
    )


# ---------------------------------------------------------------------------
# A4: exact distinct aggregation (approx_count_distinct is exercised in tests,
# not oracle-checked — it is estimator-dependent by design).
# ---------------------------------------------------------------------------
@register(
    "q_distinct_counts",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY event_type
    """,
)
def q_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
    )


# ---------------------------------------------------------------------------
# F3: LIKE / prefix predicates (ref README.md:118 `LIKE 'JOSM%'`) +
# conditional aggregation.
# ---------------------------------------------------------------------------
@register(
    "q_like_part_types",
    oracle="""
    SELECT p_brand,
           COUNT(*) AS n_parts,
           CAST(SUM(CASE WHEN p_type LIKE 'PROMO%' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_promo,
           CAST(SUM(CASE WHEN p_type LIKE '%LARGE%' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_large,
           CAST(SUM(CASE WHEN p_name LIKE '%a' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_name_suffix_a
    FROM part
    GROUP BY p_brand
    """,
)
def q_like_part_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    one_if = lambda c: F.sum(F.when(c, 1).otherwise(0))  # noqa: E731
    return part.groupBy("p_brand").agg(
        F.count("*").alias("n_parts"),
        one_if(F.col("p_type").like("PROMO%")).alias("n_promo"),
        one_if(F.col("p_type").like("%LARGE%")).alias("n_large"),
        one_if(F.col("p_name").like("%a")).alias("n_name_suffix_a"),
    )


# ---------------------------------------------------------------------------
# P7: range predicate on the time column (the reference's created_idx
# declares this access path, ref queries.py:45) + per-month rollup.
# ---------------------------------------------------------------------------
@register(
    "q_orders_per_month",
    oracle="""
    SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_sales
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1999-01-01 00:00:00'
    GROUP BY 1
    """,
)
def q_orders_per_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-01-01 00:00:00").cast("timestamp"))
    )
    return (
        orders.groupBy(
            fmt_date(F.date_trunc("month", F.col("o_orderdate"))).alias("month")
        )
        .agg(
            F.count("*").alias("n_orders"),
            as_double(F.sum(money("o_totalprice"))).alias("total_sales"),
        )
    )


# ---------------------------------------------------------------------------
# As-of join (SURVEY §2.3 extension): for each purchase event, the most
# recent prior-or-simultaneous 'view' by the same user.  Implemented with the
# scalable union+window algorithm — one shuffle on user_id, no UDF, no
# per-key pandas; this survives 100 TB where a merge_asof-per-key would not.
# ---------------------------------------------------------------------------
# One as-of contract, one oracle, two physical strategies (the skewed
# scale tier's second advisor/mitigation pair).
_ASOF_ORACLE = """
    SELECT p.event_id,
           strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
           strftime(MAX(v.ts), '%Y-%m-%d %H:%M:%S') AS last_view_ts
    FROM events p
    LEFT JOIN events v
      ON v.user_id = p.user_id AND v.event_type = 'view' AND v.ts <= p.ts
    WHERE p.event_type = 'purchase'
    GROUP BY p.event_id, p.ts
    """


@register("q_asof_purchase_last_view", oracle=_ASOF_ORACLE)
def q_asof_purchase_last_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", F.lit(1).alias("_is_left")
    )
    views = events.filter(F.col("event_type") == "view").select(
        F.lit(None).cast("long").alias("event_id"),
        "user_id",
        "ts",
        F.lit(0).alias("_is_left"),
    )
    # right rows sort before left rows at equal ts => "<=" as-of semantics
    unioned = purchases.unionByName(views).withColumn(
        "_right_ts", F.when(F.col("_is_left") == 0, F.col("ts"))
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts"), F.col("_is_left"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        unioned.withColumn("last_view", F.last("_right_ts", ignorenulls=True).over(w))
        .filter(F.col("_is_left") == 1)
        .select(
            "event_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
            F.date_format("last_view", "yyyy-MM-dd HH:mm:ss").alias("last_view_ts"),
        )
    )


@register("q_asof_two_phase_scalable", oracle=_ASOF_ORACLE)
def q_asof_two_phase_scalable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key-proof as-of join — the second mitigation twin the skewed
    tier motivates (the union+window as-of sorts a hot user's ENTIRE
    event timeline on one task).  Recorded A/B (BENCH_scale.json, r14):
    at the 100× CELEBRITY tier (SPARK_GRAFT_SCALE_SKEW_COLLAPSE=30 — 30%
    of all events on one user_id, ~3M rows on one key) the naive plan
    runs at 31.26× the base time vs 12.92× for this twin — a 2.4× win.
    At the milder 1%-hot-tail tier (~7k rows per hot key) the two are
    equal (10.9× vs 11.5×): deploy the twin for celebrity-scale keys,
    the naive plan elsewhere.  Same oracle as q_asof_purchase_last_view,
    row-for-row identical output:

    1. run the union+window as-of within (user, calendar-day) chunks —
       the per-event sort gains per-day parallelism, and an intra-chunk
       match is automatically the GLOBAL latest view (earlier chunks end
       before this chunk begins);
    2. purchases with no same-day prior view fall back to a running max
       over per-(user, day) VIEW SUMMARIES (one row per user-day, far
       smaller than events): probe rows sort before summary rows at the
       same day, so the running max sees strictly-earlier days only.

    Ties need no cross-phase convention: a view at exactly the purchase
    timestamp is same-chunk by construction (phase-1's _is_left ordering
    handles it), and cross-chunk candidates are strictly earlier days."""
    events = load_table(spark, sf_dir, "events")
    chunk = F.to_date("ts")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", chunk.alias("chunk"),
        F.lit(1).alias("_is_left"),
    )
    views = events.filter(F.col("event_type") == "view").select(
        F.lit(None).cast("long").alias("event_id"),
        "user_id",
        "ts",
        chunk.alias("chunk"),
        F.lit(0).alias("_is_left"),
    )
    unioned = purchases.unionByName(views).withColumn(
        "_right_ts", F.when(F.col("_is_left") == 0, F.col("ts"))
    )
    w = (
        Window.partitionBy("user_id", "chunk")
        .orderBy(F.col("ts"), F.col("_is_left"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    intra = (
        unioned.withColumn(
            "lv", F.last("_right_ts", ignorenulls=True).over(w)
        )
        .filter(F.col("_is_left") == 1)
        .select("event_id", "user_id", "ts", "chunk", "lv")
    )
    # phase 2: strictly-earlier-day fallback over (user, day) view summaries
    summ = views.groupBy("user_id", "chunk").agg(F.max("ts").alias("cmax"))
    probes = intra.select("user_id", "chunk").distinct().select(
        "user_id", "chunk", F.lit(None).cast("timestamp").alias("cmax"),
        F.lit(0).alias("kind"),  # probes sort BEFORE same-day summaries
    )
    timeline = probes.unionByName(
        summ.withColumn("kind", F.lit(1))
    )
    w2 = (
        Window.partitionBy("user_id")
        .orderBy("chunk", "kind")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    prev = (
        timeline.withColumn("prev_view", F.max("cmax").over(w2))
        .filter(F.col("kind") == 0)
        .select("user_id", "chunk", "prev_view")
    )
    return intra.join(prev, ["user_id", "chunk"]).select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
        F.date_format(
            F.coalesce(F.col("lv"), F.col("prev_view")),
            "yyyy-MM-dd HH:mm:ss",
        ).alias("last_view_ts"),
    )


# Auto-switch threshold for the as-of advisor (r17, the q_session_advised
# pattern applied to this family): the r14 celebrity-tier A/B showed the
# two-phase twin wins 2.4x when one key absorbs millions of purchase/view
# rows (31.26x vs 12.92x at ~3M rows on one user) and is a wash at ~7k
# rows per key (10.9x vs 11.5x).  100k rows per key is the documented
# crossover guard, matching the session family's.
_ASOF_HOT_KEY_ROWS = 100_000


@register(
    "q_asof_advised",
    oracle=_ASOF_ORACLE.replace(
        "GROUP BY p.event_id, p.ts",
        """GROUP BY p.event_id, p.ts, f.used_two_phase""",
    ).replace(
        "FROM events p",
        """, f.used_two_phase
    FROM events p CROSS JOIN (
      SELECT CAST(MAX(n) > 100000 AS BIGINT) AS used_two_phase
      FROM (SELECT COUNT(*) AS n FROM events
            WHERE event_type IN ('purchase', 'view') GROUP BY user_id)
    ) f""",
    ),
)
def q_asof_advised(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Advisor-driven as-of join: measure the purchase+view row count of
    the hottest user (the exact population the union+window plan sorts on
    one task), then pick the physical strategy — plain union+window below
    the documented _ASOF_HOT_KEY_ROWS crossover, the chunked two-phase
    twin above it.  The decision is emitted (``used_two_phase``) so it is
    part of the hash-checked contract, and both arms share _ASOF_ORACLE
    row-for-row, so the switch can only change the shuffle shape.

    Scale shape: the advice is one filtered map-side-combinable key
    aggregate folded to a single driver scalar; then exactly one of the
    two documented as-of strategies."""
    events = load_table(spark, sf_dir, "events")
    max_n = (
        events.filter(F.col("event_type").isin("purchase", "view"))
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.max("n"))
        .first()[0]
        or 0
    )
    hot = int(max_n) > _ASOF_HOT_KEY_ROWS
    base = (
        q_asof_two_phase_scalable if hot else q_asof_purchase_last_view
    )(spark, sf_dir)
    return base.withColumn(
        "used_two_phase", F.lit(1 if hot else 0).cast("long")
    )


# ---------------------------------------------------------------------------
# Pivot / unpivot (SURVEY §2.4 extension): wide<->long reshaping as native
# relational ops.  Pivot with an EXPLICIT value list — at scale an implicit
# pivot needs a distinct-scan planning pass AND yields nondeterministic
# column order; explicit values keep the schema static and the plan
# single-pass (groupBy + pivoted conditional aggregates).
# ---------------------------------------------------------------------------
@register(
    "q_pivot_status_by_priority",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS status_f,
           COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS status_o,
           COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS status_p
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def q_pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    pivoted = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
    )
    return pivoted.select(
        "o_orderpriority",
        F.coalesce(F.col("F"), F.lit(0)).alias("status_f"),
        F.coalesce(F.col("O"), F.lit(0)).alias("status_o"),
        F.coalesce(F.col("P"), F.lit(0)).alias("status_p"),
    )


@register(
    "q_unpivot_quantity_price",
    oracle="""
    SELECT l_orderkey, l_linenumber, 'quantity' AS measure,
           CAST(l_quantity AS DOUBLE) AS val
    FROM lineitem WHERE l_orderkey % 1000 = 0
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'price' AS measure,
           CAST(l_extendedprice AS DOUBLE) AS val
    FROM lineitem WHERE l_orderkey % 1000 = 0
    """,
)
def q_unpivot_quantity_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long via native unpivot (Spark's melt): zero shuffles, one scan
    emitting two rows per input — the inverse reshape of pivot."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 1000 == 0)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").cast("double").alias("quantity"),
        F.col("l_extendedprice").cast("double").alias("price"),
    ).unpivot(
        ids=["l_orderkey", "l_linenumber"],
        values=["quantity", "price"],
        variableColumnName="measure",
        valueColumnName="val",
    )


@register(
    "q_grouping_sets_order_stats",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE)
             AS total_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)
def q_grouping_sets_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: explicit GROUPING SETS through the SQL surface (cube/rollup have
    dedicated queries; arbitrary set lists only exist in SQL).  One shuffle;
    Spark expands the sets into a single Expand+Aggregate plan."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_gs")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
               CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE)
                 AS total_price
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@register(
    "q_market_share_by_nation",
    oracle="""
    WITH vol AS (
      SELECT YEAR(o_orderdate) AS o_year,
             CAST(l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l_discount AS DECIMAL(6,4))) AS volume,
             sn.n_name AS supp_nation
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN part     ON l_partkey = p_partkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation sn ON s_nationkey = sn.n_nationkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation cn ON c_nationkey = cn.n_nationkey
      JOIN region   ON cn.n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
        AND p_type = 'ECONOMY'
        AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    )
    SELECT o_year,
           CAST(SUM(volume) AS DOUBLE) AS total_volume,
           CAST(COALESCE(SUM(CASE WHEN supp_nation = 'NATION_7'
                                  THEN volume END), 0) AS DOUBLE)
             AS nation_volume,
           ROUND(CAST(COALESCE(SUM(CASE WHEN supp_nation = 'NATION_7'
                                        THEN volume END), 0) AS DOUBLE)
                 / CAST(SUM(volume) AS DOUBLE), 6) AS mkt_share
    FROM vol GROUP BY o_year
    """,
)
def q_market_share_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8's national-market-share shape (public benchmark spec) on
    the synthetic warehouse: within EUROPE-customer ECONOMY-part order
    volume, the share supplied by NATION_7, per order year.  Exercises the
    full star: fact ⋈ orders ⋈ part ⋈ supplier ⋈ nation(×2 roles) ⋈
    customer ⋈ region — the supplier- and customer-side nation dimensions
    join under DIFFERENT roles, the classic alias-disambiguation case.
    Money stays decimal-pinned through the conditional sum (NULL-skipping
    SUM + coalesce, identical in both engines); the one double division
    rounds at the end.

    Scale shape: every dimension side (part, supplier+nation, customer+
    nation+region) broadcasts; the fact table shuffles once for the
    per-year aggregate after all filters (date range, part type, region)
    are pushed into the probe side — same plan family as q5, two more
    broadcast stages."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_type") == "ECONOMY"
    ).select("p_partkey")
    nation = load_table(spark, sf_dir, "nation")
    supp = F.broadcast(
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nation),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = F.broadcast(
        load_table(spark, sf_dir, "customer")
        .join(
            F.broadcast(nation.alias("cn")),
            F.col("c_nationkey") == F.col("cn.n_nationkey"),
        )
        .join(
            F.broadcast(
                load_table(spark, sf_dir, "region").filter(
                    F.col("r_name") == "EUROPE"
                )
            ),
            F.col("cn.n_regionkey") == F.col("r_regionkey"),
        )
        .select("c_custkey")
    )
    volume = money("l_extendedprice") * one_minus(rate("l_discount"))
    vol = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            volume.alias("volume"),
            "supp_nation",
        )
    )
    nation_sum = F.coalesce(
        F.sum(F.when(F.col("supp_nation") == "NATION_7", F.col("volume"))),
        F.lit(0),
    )
    return vol.groupBy("o_year").agg(
        as_double(F.sum("volume")).alias("total_volume"),
        as_double(nation_sum).alias("nation_volume"),
        F.round(
            as_double(nation_sum) / as_double(F.sum("volume")), 6
        ).alias("mkt_share"),
    )


@register(
    "q_small_quantity_revenue",
    oracle="""
    WITH pq AS (
      SELECT l_partkey,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2))
               AS sum_qty,
             COUNT(*) AS n
      FROM lineitem GROUP BY l_partkey
    )
    SELECT COUNT(*) AS n_small_lines,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             AS total_revenue,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                 / 7.0, 4) AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN pq ON pq.l_partkey = lineitem.l_partkey
    WHERE p_type = 'SMALL'
      AND CAST(l_quantity AS DECIMAL(18,2)) * n * 5 < sum_qty
    """,
)
def q_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17's correlated-scalar-subquery shape (public benchmark
    spec): revenue from SMALL-part line items whose quantity is below 20%
    of that part's average — the "small-order fragmentation" report.  The
    correlated subquery ``l_quantity < (SELECT 0.2*AVG(l_quantity) ...)``
    is decorrelated Spark-first into one per-part aggregate joined back to
    the fact table, and the 20%-of-average test runs as an EXACT decimal
    cross-multiplication (qty·n·5 < Σqty — no division, no doubles), so
    boundary rows can't flip between engines.

    Scale shape: the per-part (Σqty, n) aggregate is one partkey-shuffle
    with map-side combine; the fact re-joins it on the SAME partkey
    hashing (exchange reuse), the part dimension broadcasts, and the
    final 1-row rollup is a partial aggregate — two fact passes, one
    shuffle each, no correlated per-row subquery execution anywhere."""
    li = load_table(spark, sf_dir, "lineitem")
    pq = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)"))
        .cast("decimal(38,2)")
        .alias("sum_qty"),
        F.count("*").alias("n"),
    )
    small = F.broadcast(
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_type") == "SMALL")
        .select("p_partkey")
    )
    hit = (
        li.join(small, F.col("l_partkey") == F.col("p_partkey"))
        .join(pq, "l_partkey")
        .filter(
            F.col("l_quantity").cast("decimal(18,2)") * F.col("n") * 5
            < F.col("sum_qty")
        )
    )
    rev = F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
    return hit.agg(
        F.count("*").alias("n_small_lines"),
        as_double(rev).alias("total_revenue"),
        F.round(as_double(rev) / 7.0, 4).alias("avg_yearly"),
    )


@register(
    "q_multitouch_attribution",
    oracle="""
    WITH p AS (
      SELECT event_id AS purchase_id, user_id, ts AS p_ts,
             CAST(value AS DECIMAL(18,2)) AS val
      FROM events WHERE event_type = 'purchase'
    ), c AS (
      SELECT event_id AS click_id, user_id, ts AS c_ts
      FROM events WHERE event_type = 'click'
    ), touches AS (
      SELECT p.purchase_id, p.val, c.click_id, c.c_ts,
             COUNT(*) OVER (PARTITION BY p.purchase_id) AS k,
             ROW_NUMBER() OVER (PARTITION BY p.purchase_id
                                ORDER BY c.c_ts, c.click_id) AS pos
      FROM p JOIN c ON c.user_id = p.user_id
       AND c.c_ts >= p.p_ts - INTERVAL 72 HOUR
       AND c.c_ts <= p.p_ts
    ), credited AS (
      SELECT purchase_id, val, k,
             CASE
               WHEN k = 1 THEN 10000
               WHEN k = 2 AND pos = 1 THEN 6000
               WHEN k = 2 THEN 4000
               WHEN pos = 1 THEN 4000 + 2000 - (k - 2) * (2000 // (k - 2))
               WHEN pos = k THEN 4000
               ELSE 2000 // (k - 2)
             END AS bp
      FROM touches
    )
    SELECT CAST(k AS BIGINT) AS n_touches,
           COUNT(DISTINCT purchase_id) AS n_purchases,
           CAST(SUM(bp) AS BIGINT) AS total_bp,
           CAST(SUM(CAST(val AS DECIMAL(18,2)) * bp) AS DOUBLE) / 10000
             AS credited_value
    FROM credited
    GROUP BY k
    """,
)
def q_multitouch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-based ("U-shaped") multi-touch attribution — the
    marketing-analytics sibling of last-touch attribution: each purchase's
    credit splits 40% to the first click in the 72-hour lookback window, 40% to
    the last, and the middle 20% evenly across interior clicks (public
    method; every ads-measurement stack ships it).  Splits are EXACT
    integer basis points: interior clicks get ``2000 DIV (k-2)`` bp and
    the division remainder is assigned to the first touch (for k=2 the
    whole middle share goes to the first touch: 6000/4000), so every
    purchase's credits sum to exactly 10000 bp — pinned by the total_bp
    column (10000 × purchases per group) that would expose any rounding
    leak.  Credited value stays decimal until the single final division.

    Scale shape: the touch set is the same user-keyed interval join as
    purchase attribution (one shuffle per side); position and touch-count
    come from one window over each purchase's bounded touch list (per-key
    sort, never global); the rollup groups by touch count — a handful of
    rows at any corpus size."""
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id"),
        F.col("ts").alias("p_ts"),
        F.col("value").cast("decimal(18,2)").alias("val"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    touches = p.join(
        c,
        (F.col("c_user") == F.col("user_id"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 72 HOURS"))
        & (F.col("c_ts") <= F.col("p_ts")),
    )
    from pyspark.sql import Window

    wp = Window.partitionBy("purchase_id")
    touches = touches.select(
        "purchase_id",
        "val",
        F.count("*").over(wp).alias("k"),
        F.row_number()
        .over(wp.orderBy(F.asc("c_ts"), F.asc("click_id")))
        .alias("pos"),
    )
    mid_bp = F.expr("2000 DIV (k - 2)")
    bp = (
        F.when(F.col("k") == 1, 10000)
        .when((F.col("k") == 2) & (F.col("pos") == 1), 6000)
        .when(F.col("k") == 2, 4000)
        .when(
            F.col("pos") == 1,
            F.lit(4000) + F.lit(2000) - (F.col("k") - 2) * mid_bp,
        )
        .when(F.col("pos") == F.col("k"), 4000)
        .otherwise(mid_bp)
    )
    credited = touches.select("purchase_id", "val", "k", bp.alias("bp"))
    return credited.groupBy("k").agg(
        F.countDistinct("purchase_id").alias("n_purchases"),
        # DECIMAL(38,0) accumulator (VERDICT r13 #7): Σbp = 10000 ×
        # purchases-per-k; a BIGINT sum has only ~920× headroom at 10^12
        # purchases in one group — the final value still fits a long
        F.sum(F.col("bp").cast("decimal(38,0)")).cast("long").alias(
            "total_bp"
        ),
        (
            F.sum(F.col("val") * F.col("bp")).cast("double") / 10000
        ).alias("credited_value"),
    ).select(
        F.col("k").cast("long").alias("n_touches"),
        "n_purchases",
        "total_bp",
        "credited_value",
    )


# ---------------------------------------------------------------------------
# TPC-H Q10 shape: returned-item revenue ranking (who returns the most
# value) — J3/A3 composition over customer x orders x lineitem x nation.
# ---------------------------------------------------------------------------
@register(
    "q10_returned_item_revenue",
    oracle="""
    SELECT c_custkey, c_name, n_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(6,4)))) AS DOUBLE)
             AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_item_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape (ref README.md:106-124 delegates this whole family
    to Postgres): top-20 customers by revenue LOST to returns in one
    year.  The returnflag filter pushes to the lineitem scan; customer ⋈
    nation broadcasts as one prebuilt dim (the fact table never shuffles
    for a dimension); the only exchange is the (custkey…) aggregate with
    map-side combine; DECIMAL money math with one final double cast, so
    the top-20 cut is exact.  Deterministic tie-break on c_custkey."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    dims = F.broadcast(
        load_table(spark, sf_dir, "customer")
        .join(
            F.broadcast(load_table(spark, sf_dir, "nation")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey", "c_name", "n_name")
    )
    revenue = money("l_extendedprice") * one_minus(rate("l_discount"))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(dims, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            as_double(F.sum(revenue)).alias("revenue"),
            F.count("*").alias("n_items"),
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# TPC-H Q14 shape: promotion revenue share — conditional aggregate ratio.
# ---------------------------------------------------------------------------
@register(
    "q14_promo_revenue_share",
    oracle="""
    WITH j AS (
      SELECT p_type,
             CAST(l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l_discount AS DECIMAL(6,4))) AS rev
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-07-01 00:00:00'
    )
    SELECT CAST(SUM(CASE WHEN p_type = 'PROMO' THEN rev ELSE 0 END)
                AS DOUBLE) AS promo_revenue,
           CAST(SUM(rev) AS DOUBLE) AS total_revenue,
           ROUND(100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN rev
                                       ELSE 0 END) AS DOUBLE)
                 / CAST(SUM(rev) AS DOUBLE), 4) AS promo_pct
    FROM j
    """,
)
def q14_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: what share of a half-year's revenue came from
    PROMO parts — the conditional-aggregate ratio pattern (A2/A3).  The
    shipdate range pushes to the lineitem scan, part broadcasts (only
    p_partkey + p_type read — column pruning matters at a 100 TB part
    table), both sums fold exact DECIMAL and the percent is one rounded
    double division."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-07-01 00:00:00").cast("timestamp"))
    )
    part = F.broadcast(
        load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    )
    rev = money("l_extendedprice") * one_minus(rate("l_discount"))
    zero = F.lit(0).cast("decimal(18,2)")
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(zero)
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            as_double(F.sum(promo)).alias("promo_revenue"),
            as_double(F.sum(rev)).alias("total_revenue"),
        )
        .select(
            "promo_revenue",
            "total_revenue",
            F.round(
                100.0 * F.col("promo_revenue") / F.col("total_revenue"), 4
            ).alias("promo_pct"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q7 shape: bilateral trade volume between two nations by year.
# ---------------------------------------------------------------------------
@register(
    "q7_nation_volume_shipping",
    oracle="""
    SELECT sn.n_name AS supp_nation,
           cn.n_name AS cust_nation,
           CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(6,4)))) AS DOUBLE)
             AS volume
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    WHERE sn.n_name IN ('NATION_1', 'NATION_2')
      AND cn.n_name IN ('NATION_1', 'NATION_2')
      AND sn.n_name <> cn.n_name
      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY sn.n_name, cn.n_name, l_year
    """,
)
def q7_nation_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: NATION_1↔NATION_2 shipping volume per year (the
    fixture's nation dimension uses synthetic names) — the
    two-sided dimension filter (supplier nation vs customer nation, both
    restricted, unequal).  Both nation-filtered dims broadcast as
    prebuilt (key → nation) maps, so the fact table joins two tiny maps
    and never shuffles for a dimension; the DECIMAL volume sums
    map-side-combine on the 4-row (nation, nation, year) key space."""
    nations = ("NATION_1", "NATION_2")
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin(*nations)
    )
    supp = F.broadcast(
        load_table(spark, sf_dir, "supplier")
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = F.broadcast(
        load_table(spark, sf_dir, "customer")
        .join(nation, F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    rev = money("l_extendedprice") * one_minus(rate("l_discount"))
    return (
        li.join(
            load_table(spark, sf_dir, "orders").select(
                "o_orderkey", "o_custkey"
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(as_double(F.sum(rev)).alias("volume"))
    )


# ---------------------------------------------------------------------------
# Concentration analytics: Gini / Lorenz over per-user activity.
# ---------------------------------------------------------------------------
@register(
    "q_gini_user_concentration",
    oracle="""
    WITH per AS (
      SELECT user_id, COUNT(*) AS x FROM events GROUP BY user_id
    ), ranked AS (
      SELECT x, ROW_NUMBER() OVER (ORDER BY x, user_id) AS i FROM per
    ), tots AS (
      SELECT CAST(COUNT(*) AS HUGEINT) AS n,
             CAST(SUM(x) AS HUGEINT) AS s,
             SUM(CAST(i AS HUGEINT) * x) AS ix
      FROM ranked
    ), topcut AS (
      SELECT CAST(SUM(CASE WHEN i > n - (n + 99) // 100 THEN x ELSE 0 END)
                  AS HUGEINT) AS top_x
      FROM ranked, tots
    )
    SELECT CAST(t.n AS BIGINT) AS n_users,
           CAST(t.s AS BIGINT) AS total_events,
           ROUND(CAST(2 * t.ix - (t.n + 1) * t.s AS DOUBLE)
                 / CAST(t.n * t.s AS DOUBLE), 6) AS gini,
           CAST(c.top_x * 10000 // t.s AS BIGINT) AS top1pct_share_bp
    FROM tots t, topcut c
    """,
)
def q_gini_user_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient + top-1% share of per-user event volume — the
    concentration report behind every "how dependent is this corpus on
    its power users" curation decision (Gini 1912 / Lorenz-order
    statistics — public method; G = (2·Σᵢ i·xᵢ − (n+1)·Σx) / (n·Σx)
    over ascending-sorted counts).

    Exactness: everything up to the final division is integer — per-user
    counts, the ascending rank (ties share equal x, so Σ i·x over a tie
    block is order-free), Σ i·x in DECIMAL(38,0)/HUGEINT (i·x products
    exceed int64 near 10¹² users — PLANS.md audit), and the top-1% share
    in floor basis points.  The Gini itself is one rounded double
    division of exact integers.

    Scale shape (r15, VERDICT r14 item 1): one hash aggregate to the
    per-user frame (map-side combined), then the exact global rank comes
    from ``two_phase_prefix`` — a range shuffle + per-range-partition
    local window + bounded driver offsets — NOT an unpartitioned
    ``row_number`` window (the old form planned ``Exchange
    SinglePartition`` + a one-task sort over the full user frame, the
    same scale-killer r7 fixed for deciles).  (x, user_id) is a unique
    key of the per-user frame, so the exclusive count-prefix + 1 is
    EXACTLY ``row_number() OVER (ORDER BY x, user_id)``.  The two-phase
    totals hand the driver n for free, so the top-1% threshold becomes a
    literal and everything else collapses into ONE distributed reduce —
    the old plan's two crossJoin attach stages disappear."""
    from .twophase import two_phase_prefix

    per = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("x"))
    )
    ranked, totals = two_phase_prefix(
        per, [], [F.asc("x"), F.asc("user_id")], [("rank0", F.lit(1))]
    )
    n = int(totals["rank0"].get((), 0))
    top_threshold = n - (n + 99) // 100  # ranks above this are the top 1%
    i_dec = (F.col("rank0") + 1).cast("decimal(38,0)")
    agg = ranked.agg(
        F.count("*").cast("decimal(38,0)").alias("n"),
        F.sum("x").cast("decimal(38,0)").alias("s"),
        F.sum(i_dec * F.col("x")).alias("ix"),
        F.sum(
            F.when(
                F.col("rank0") + 1 > F.lit(top_threshold), F.col("x")
            ).otherwise(0)
        )
        .cast("decimal(38,0)")
        .alias("top_x"),
    )
    return agg.select(
        F.col("n").cast("long").alias("n_users"),
        F.col("s").cast("long").alias("total_events"),
        F.round(
            (2 * F.col("ix") - (F.col("n") + 1) * F.col("s")).cast("double")
            / (F.col("n") * F.col("s")).cast("double"),
            6,
        ).alias("gini"),
        F.expr(
            "CAST(CAST(top_x * 10000 AS DECIMAL(38,0)) AS BIGINT)"
            " div CAST(s AS BIGINT)"
        ).alias("top1pct_share_bp"),
    )


# ---------------------------------------------------------------------------
# Funnel latency: view→purchase time-to-convert distribution.
# ---------------------------------------------------------------------------
@register(
    "q_funnel_time_to_convert",
    oracle="""
    WITH u AS (
      SELECT event_id, user_id, ts,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_p
      FROM events WHERE event_type IN ('purchase', 'view')
    ), w AS (
      SELECT event_id, is_p, ts,
             MAX(CASE WHEN is_p = 0 THEN ts END)
               OVER (PARTITION BY user_id ORDER BY ts, is_p
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS last_view
      FROM u
    ), d AS (
      SELECT CAST(epoch_us(ts) - epoch_us(last_view) AS BIGINT) // 1000000
               AS dt_sec
      FROM w WHERE is_p = 1 AND last_view IS NOT NULL
    ), np AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_purchases
      FROM u WHERE is_p = 1
    )
    SELECT np.n_purchases,
           CAST(COUNT(*) AS BIGINT) AS n_converted,
           CAST(np.n_purchases - COUNT(*) AS BIGINT) AS n_no_prior_view,
           ROUND(quantile_cont(dt_sec, 0.5), 4) AS p50_sec,
           ROUND(quantile_cont(dt_sec, 0.9), 4) AS p90_sec,
           CAST(MAX(dt_sec) AS BIGINT) AS max_sec
    FROM d, np
    GROUP BY np.n_purchases
    """,
)
def q_funnel_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution: for every purchase with a prior
    view by the same user, the seconds since that LAST view — the
    latency histogram the funnel count (q_funnel_conversion) can't show
    (two funnels with identical conversion rates can hide a 10× latency
    difference).  The as-of machinery (union + running MAX window over
    (ts, is_p)-ordered rows — view rows sort before a same-ts purchase)
    feeds WHOLE-SECOND integer deltas (epoch microseconds floor-divided,
    exact in both engines) into one interpolated-percentile aggregate.

    Scale shape: one user_id exchange for the window (the hot-key-proof
    two-phase rewrite applies verbatim if a celebrity user needs it —
    see q_asof_two_phase_scalable), then a single 1-row percentile
    reduce over the purchases-only frame."""
    u = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("purchase", "view"))
        .select(
            "event_id",
            "user_id",
            "ts",
            F.when(F.col("event_type") == "purchase", 1)
            .otherwise(0)
            .alias("is_p"),
        )
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts"), F.col("is_p")
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    last_view = F.max(
        F.when(F.col("is_p") == 0, F.col("ts"))
    ).over(w)
    d = (
        u.withColumn("last_view", last_view)
        .filter((F.col("is_p") == 1) & F.col("last_view").isNotNull())
        .select(
            F.expr(
                "CAST(unix_micros(ts) - unix_micros(last_view) AS BIGINT)"
                " div 1000000"
            ).alias("dt_sec")
        )
    )
    np_ = u.filter(F.col("is_p") == 1).agg(
        F.count("*").cast("long").alias("n_purchases")
    )
    return (
        d.crossJoin(F.broadcast(np_))
        .groupBy("n_purchases")
        .agg(
            F.count("*").cast("long").alias("n_converted"),
            (F.first("n_purchases") - F.count("*"))
            .cast("long")
            .alias("n_no_prior_view"),
            F.round(F.percentile("dt_sec", F.lit(0.5)), 4).alias("p50_sec"),
            F.round(F.percentile("dt_sec", F.lit(0.9)), 4).alias("p90_sec"),
            F.max("dt_sec").cast("long").alias("max_sec"),
        )
        .select(
            "n_purchases",
            "n_converted",
            "n_no_prior_view",
            "p50_sec",
            "p90_sec",
            "max_sec",
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q18 shape: large-volume orders — HAVING on an aggregate, join-back.
# ---------------------------------------------------------------------------
_Q18_MIN_QTY = 250  # ≈ the top ~1% of orders by total quantity


@register(
    "q18_large_volume_orders",
    oracle=f"""
    WITH big AS (
      SELECT l_orderkey,
             SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty
      FROM lineitem
      GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > {_Q18_MIN_QTY}
    )
    SELECT c_custkey, c_name, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
           CAST(o_totalprice AS DOUBLE) AS o_totalprice,
           CAST(sum_qty AS DOUBLE) AS sum_qty
    FROM big
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def q18_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (the HAVING-on-aggregate + join-back pattern the
    reference delegates to Postgres, ref README.md:106-124): orders whose
    TOTAL lineitem quantity exceeds a volume threshold, decorated with
    customer and order attributes, top-100 by order value.

    Exactness: the quantity sum is DECIMAL(18,2) (order-independent), so
    the HAVING cut can never flip on a float ulp; o_totalprice is only an
    output column and the tie-break is the unique o_orderkey.

    Scale shape: one map-side-combined aggregate on l_orderkey, the
    HAVING filter slashes the frame to the top ~1% of orders BEFORE any
    join, the orders join is an equi-join on the same key (AQE turns the
    post-HAVING side into a broadcast at real selectivity), customer
    attaches as a broadcast dim, and the top-100 is a TakeOrdered — no
    global sort materializes."""
    big = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("sq"))
        .filter(F.col("sq") > _Q18_MIN_QTY)
    )
    return (
        big.join(
            load_table(spark, sf_dir, "orders"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .join(
            F.broadcast(
                load_table(spark, sf_dir, "customer").select(
                    "c_custkey", "c_name"
                )
            ),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            fmt_date("o_orderdate").alias("o_orderdate"),
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
            as_double(F.col("sq")).alias("sum_qty"),
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


# ---------------------------------------------------------------------------
# TPC-H Q11 shape: share-of-global-value cut (HAVING vs a scalar subquery).
# ---------------------------------------------------------------------------
# keep parts whose revenue share exceeds 1/_Q11_SHARE_DEN of the global —
# expressed as an exact integer-scaled DECIMAL cross-multiplication so the
# cut can never flip on a float ulp in either engine
_Q11_SHARE_DEN = 1600


@register(
    "q_part_value_share",
    oracle=f"""
    WITH pv AS (
      SELECT l_partkey,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l_discount AS DECIMAL(6,4)))) AS val
      FROM lineitem
      GROUP BY l_partkey
    ), g AS (
      SELECT SUM(val) AS tot FROM pv
    )
    SELECT l_partkey AS partkey,
           CAST(val AS DOUBLE) AS part_value,
           -- exact floor(val*1e6/tot): go through integer micros — on
           -- DECIMAL operands DuckDB's // is not an integral division
           CAST(CAST(val * 1000000 AS HUGEINT) * 1000000
                // CAST(tot * 1000000 AS HUGEINT) AS BIGINT) AS share_ppm
    FROM pv, g
    WHERE val * {_Q11_SHARE_DEN} > tot
    ORDER BY part_value DESC, partkey
    """,
)
def q_part_value_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts that individually carry more than
    1/{_Q11_SHARE_DEN} of total lineitem revenue — the HAVING-vs-scalar-
    subquery pattern (inventory concentration, the "which SKUs matter"
    report).

    Exactness: per-part value and the global total are DECIMAL sums; the
    share cut is the integer cross-multiplication ``val·DEN > tot`` and
    the reported share is exact floor parts-per-million — no double
    enters until the output cast.

    Scale shape: one map-side-combined aggregate on l_partkey (the part
    cardinality frame, ~200k·SF rows), one CONSTANT-SIZE global reduce of
    that frame, the scalar total re-attached as a broadcast 1-row frame —
    the part frame is scanned once more for the cut, never re-shuffled."""
    # Tighten the sum's inferred DECIMAL(36,6) to DECIMAL(25,6) (absolute
    # headroom 10¹⁹ — far above any per-part or global revenue) so the
    # ×10⁶ ppm multiply and the ×DEN share cut stay WITHIN 38 digits:
    # at the inferred width Spark silently reduces scale (rounding) on
    # the multiply, which flipped ppm values off-by-one vs the oracle's
    # exact HUGEINT arithmetic.
    pv = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_partkey")
        .agg(
            F.sum(
                money("l_extendedprice") * one_minus(rate("l_discount"))
            )
            .cast("decimal(25,6)")
            .alias("val")
        )
    )
    g = pv.agg(F.sum("val").cast("decimal(30,6)").alias("tot"))
    return (
        pv.crossJoin(F.broadcast(g))
        .filter(F.col("val") * _Q11_SHARE_DEN > F.col("tot"))
        .select(
            F.col("l_partkey").alias("partkey"),
            as_double(F.col("val")).alias("part_value"),
            F.expr("(val * 1000000) div tot").cast("long").alias("share_ppm"),
        )
        .orderBy(F.desc("part_value"), F.asc("partkey"))
    )


# ---------------------------------------------------------------------------
# TPC-H Q2 shape (adapted): groupwise ARGMIN join-back — cheapest supplier
# per part by total discounted cost, via a map-side struct-extremum.
# ---------------------------------------------------------------------------
@register(
    "q_argmin_supplier_per_part",
    oracle="""
    WITH ps AS (
      SELECT l_partkey, l_suppkey,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l_discount AS DECIMAL(6,4)))) AS cost,
             COUNT(*) AS n_items
      FROM lineitem
      GROUP BY l_partkey, l_suppkey
    ), ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY l_partkey
                                   ORDER BY cost, l_suppkey) AS rn
      FROM ps
    )
    SELECT l_partkey AS partkey, p_name,
           l_suppkey AS suppkey, s_name,
           CAST(cost AS DOUBLE) AS min_cost,
           CAST(n_items AS BIGINT) AS n_items
    FROM ranked
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    WHERE rn = 1
    ORDER BY partkey
    """,
)
def q_argmin_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2's groupwise-argmin shape (adapted: the testdata schema has
    no partsupp, so "cheapest" is the supplier with the minimum total
    discounted cost observed in lineitem): one winner per part,
    deterministic tie-break on suppkey, decorated with part/supplier
    names.

    Exactness: cost is a DECIMAL sum; the argmin is a lexicographic
    (cost, suppkey) minimum — both engines compare exact decimals, and
    the unique suppkey tie-break makes the winner deterministic.

    Scale shape: NO window over the (part, supplier) frame — the argmin
    is a struct-extremum ``MIN(STRUCT(cost, suppkey, n_items))`` which
    map-side combines on l_partkey (the same trick as the OHLC
    open/close), so the plan is two hash aggregates + two broadcast dim
    attaches.  The oracle's ROW_NUMBER formulation computes the identical
    winner; the engine never pays the sort."""
    ps = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.sum(
                money("l_extendedprice") * one_minus(rate("l_discount"))
            ).alias("cost"),
            F.count("*").alias("n_items"),
        )
    )
    win = (
        ps.groupBy("l_partkey")
        .agg(
            F.min(
                F.struct(
                    F.col("cost"), F.col("l_suppkey"), F.col("n_items")
                )
            ).alias("m")
        )
        .select(
            "l_partkey",
            F.col("m.cost").alias("cost"),
            F.col("m.l_suppkey").alias("l_suppkey"),
            F.col("m.n_items").alias("n_items"),
        )
    )
    return (
        win.join(
            F.broadcast(
                load_table(spark, sf_dir, "part").select(
                    "p_partkey", "p_name"
                )
            ),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .join(
            F.broadcast(
                load_table(spark, sf_dir, "supplier").select(
                    "s_suppkey", "s_name"
                )
            ),
            F.col("s_suppkey") == F.col("l_suppkey"),
        )
        .select(
            F.col("l_partkey").alias("partkey"),
            "p_name",
            F.col("l_suppkey").alias("suppkey"),
            "s_name",
            as_double(F.col("cost")).alias("min_cost"),
            F.col("n_items").cast("long").alias("n_items"),
        )
        .orderBy(F.asc("partkey"))
    )


# ---------------------------------------------------------------------------
# TPC-H Q13 shape: order-count distribution including zero-order customers.
# ---------------------------------------------------------------------------
@register(
    "q13_order_count_distribution",
    oracle="""
    WITH per AS (
      SELECT c_custkey, COUNT(o_orderkey) AS n
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey
    )
    SELECT CAST(n AS BIGINT) AS n_orders,
           CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM per
    GROUP BY n
    ORDER BY n_customers DESC, n_orders DESC
    """,
)
def q13_order_count_distribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q13 shape: the customer-engagement histogram — how many
    customers placed exactly n orders, INCLUDING the zero-order
    customers only an outer join surfaces (the reference's query surface
    delegates this family to Postgres, ref README.md:106-124).

    Exactness: pure integer counting at both levels; the ordering is the
    TPC-H (custdist DESC, c_count DESC) convention, deterministic
    because (n_customers, n_orders) pairs are unique by construction.

    Scale shape: the LEFT join shuffles both sides on the customer key
    (no dimension is broadcastable — customers ARE the fact here), the
    first aggregate reuses that partitioning (AQE), and the histogram
    aggregate runs on the ≤max-orders-per-customer key space — two
    map-side-combined exchanges total."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey"
    )
    per = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n"))
    )
    return (
        per.groupBy("n")
        .agg(F.count("*").cast("long").alias("n_customers"))
        .select(F.col("n").cast("long").alias("n_orders"), "n_customers")
        .orderBy(F.desc("n_customers"), F.desc("n_orders"))
    )


# ---------------------------------------------------------------------------
# Herfindahl-Hirschman concentration index (r15): the market-concentration
# companion to the Gini report, per event type over item shares.
# ---------------------------------------------------------------------------
@register(
    "q_hhi_concentration",
    oracle="""
    WITH e AS (
      SELECT event_type,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS item_id
      FROM events
    ), per AS (
      SELECT event_type, item_id, CAST(COUNT(*) AS DECIMAL(38,0)) AS c
      FROM e GROUP BY event_type, item_id
    ), g AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n_items,
             SUM(c) AS s,
             SUM(c * c) AS s2
      FROM per GROUP BY event_type
    )
    SELECT event_type, n_items,
           CAST(s AS BIGINT) AS n_events,
           CAST(CAST(s2 * 10000 AS HUGEINT) // CAST(s * s AS HUGEINT)
                AS BIGINT) AS hhi_x10000,
           CAST(10000 // n_items AS BIGINT) AS uniform_hhi_x10000
    FROM g
    ORDER BY event_type
    """,
)
def q_hhi_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl-Hirschman concentration index (public method — the
    antitrust/market-share statistic) of ITEM engagement per event type:
    HHI = Σ shareᵢ² = Σcᵢ²/(Σc)², reported in exact floor 1e-4 units
    alongside the uniform-distribution floor 1/n — the "is engagement
    concentrated on a few items" companion to the per-user Gini report.

    Exactness: Σc and Σc² are exact DECIMAL(38,0) integers (c² ≤ 10²⁴
    at 10¹² events on one item); the index is one integer floor
    division — no float anywhere.

    Scale shape: one (type, item) hash aggregate (map-side combined),
    one ≤types rollup.  The q1 shape over the item dimension."""
    e = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.get_json_object("props", "$.k").try_cast("long").alias("item_id"),
    )
    per = e.groupBy("event_type", "item_id").agg(
        F.count("*").cast("decimal(38,0)").alias("c")
    )
    g = per.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_items"),
        F.sum("c").cast("decimal(38,0)").alias("s"),
        F.sum(F.col("c") * F.col("c")).cast("decimal(38,0)").alias("s2"),
    )
    return g.select(
        "event_type",
        "n_items",
        F.col("s").cast("long").alias("n_events"),
        F.expr(
            "CAST(CAST(s2 * 10000 AS DECIMAL(38,0))"
            " div CAST(s * s AS DECIMAL(38,0)) AS BIGINT)"
        ).alias("hhi_x10000"),
        F.expr("10000 div n_items").alias("uniform_hhi_x10000"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# r16: the remaining classic TPC-H shapes, adapted to the driver schema
# (no partsupp table; lineitem carries no commit/receipt dates or shipmode,
# so "late" is defined against o_orderdate with a fixed interval — the same
# predicate in both engines).  Ref README.md:106-124 delegates this entire
# family to Postgres; here each shape is a native Catalyst plan.
# ---------------------------------------------------------------------------
@register(
    "q4_order_priority_check",
    oracle="""
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey
          AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q4_order_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: orders per priority in one quarter that had at
    least one lineitem shipped >30 days after ordering (the schema has no
    commit/receipt dates, so lateness is anchored on o_orderdate with the
    identical interval predicate in both engines).  The EXISTS is a LEFT
    SEMI join on l_orderkey — the orders date filter pushes to the scan,
    the semi join keeps at most one match per order (no fan-out to
    dedup), and the final aggregate is a 5-key hash rollup."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")
    )
    return (
        orders.join(li, late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "q6_forecast_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(l_discount AS DECIMAL(6,4))) AS DOUBLE) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.02 AND 0.06
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: revenue increase if small-quantity discounts were
    dropped — a pure scan-side query: all three predicates push into the
    parquet scan, the aggregate is a single partial-combined global sum
    in exact DECIMAL.  The simplest possible 100 TB plan: no shuffle at
    all beyond the final 1-row exchange."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_discount") >= 0.02)
        & (F.col("l_discount") <= 0.06)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        as_double(F.sum(money("l_extendedprice") * rate("l_discount"))).alias(
            "revenue"
        ),
        F.count("*").alias("n_items"),
    )


@register(
    "q9_product_type_profit",
    oracle="""
    SELECT n_name AS nation,
           CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS o_year,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(6,4)))
                    - CAST(l_quantity AS DECIMAL(4,1))
                      * CAST(p_retailprice AS DECIMAL(6,2))
                      * CAST(0.10 AS DECIMAL(3,2))) AS DOUBLE) AS sum_profit
    FROM lineitem
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%red%'
    GROUP BY n_name, EXTRACT(year FROM l_shipdate)
    ORDER BY nation, o_year
    """,
)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit on 'red' product lines by supplier nation
    and year.  The schema has no partsupp, so unit cost is modeled as
    10% of p_retailprice — in tight DECIMALs ((4,1)x(6,2)x(3,2) = 15
    digits) so money - cost never exceeds 38 digits and neither engine
    falls back to scale-reduced rounding.  part filters on the LIKE
    before broadcasting; supplier x nation prebuilds as one broadcast
    dim; the fact table shuffles once for the (nation, year) rollup."""
    li = load_table(spark, sf_dir, "lineitem")
    part = F.broadcast(
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%red%"))
        .select("p_partkey", "p_retailprice")
    )
    supp = F.broadcast(
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(load_table(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "n_name")
    )
    profit = money("l_extendedprice") * one_minus(rate("l_discount")) - (
        F.col("l_quantity").cast("decimal(4,1)")
        * F.col("p_retailprice").cast("decimal(6,2)")
        * F.lit(0.10).cast("decimal(3,2)")
    )
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").cast("long").alias("o_year"),
        )
        .agg(as_double(F.sum(profit)).alias("sum_profit"))
        .orderBy("nation", "o_year")
    )


@register(
    "q12_shipping_delay_priority",
    oracle="""
    SELECT CASE WHEN l_shipdate > o_orderdate + INTERVAL 45 DAY
                THEN 'late' ELSE 'ontime' END AS ship_bucket,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY 1
    ORDER BY ship_bucket
    """,
)
def q12_shipping_delay_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: does slow shipping hit urgent orders?  Lineitems
    of one year bucketed late/ontime (shipdate vs o_orderdate + 45 days —
    no shipmode column in this schema), counting high- vs low-priority
    lines per bucket.  One equi-join shuffle on orderkey, then a 2-key
    hash aggregate with map-side combine."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    ).select("l_orderkey", "l_shipdate")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    bucket = F.when(
        F.col("l_shipdate")
        > F.col("o_orderdate") + F.expr("INTERVAL 45 DAYS"),
        "late",
    ).otherwise("ontime")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(bucket.alias("ship_bucket"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("ship_bucket")
    )


@register(
    "q16_supplier_part_variety",
    oracle="""
    SELECT p_brand, p_size,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#5'
      AND p_size IN (1, 4, 9, 16, 25, 36, 49)
      AND l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_size
    """,
)
def q16_supplier_part_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: how many distinct suppliers can deliver each
    (brand, size) of interest, excluding flagged suppliers (negative
    account balance stands in for the complaints predicate; lineitem is
    the part-supplier bridge since the schema has no partsupp).  The
    part filter broadcasts, the exclusion list is a broadcast ANTI join
    (a handful of rows), and the distinct-count shuffles once on the
    (brand, size) key."""
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    part = F.broadcast(
        load_table(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#5")
            & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
        )
        .select("p_partkey", "p_brand", "p_size")
    )
    flagged = F.broadcast(
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(flagged, F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_size")
    )


@register(
    "q19_disjunctive_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(6,4)))) AS DOUBLE)
             AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue from three OR'd (brand, size-range,
    quantity-range) conjunctions — the disjunctive-predicate pattern
    that tests the optimizer's ability to keep an OR across a broadcast
    join instead of exploding it.  part broadcasts with the size/brand
    disjuncts pre-applied (size <= 15 covers all arms), quantity bounds
    stay on the fact scan (1..30 covers all arms), and the exact
    per-arm conjunction evaluates post-join before one global DECIMAL
    sum."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 30)
    )
    part = F.broadcast(
        load_table(spark, sf_dir, "part")
        .filter(
            F.col("p_brand").isin("Brand#12", "Brand#23", "Brand#3")
            & (F.col("p_size") >= 1)
            & (F.col("p_size") <= 15)
        )
        .select("p_partkey", "p_brand", "p_size")
    )
    qty = F.col("l_quantity")
    arm = (
        (
            (F.col("p_brand") == "Brand#12")
            & (F.col("p_size") <= 5)
            & (qty >= 1)
            & (qty <= 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & (F.col("p_size") <= 10)
            & (qty >= 10)
            & (qty <= 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & (F.col("p_size") <= 15)
            & (qty >= 20)
            & (qty <= 30)
        )
    )
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .filter(arm)
        .agg(
            as_double(
                F.sum(money("l_extendedprice") * one_minus(rate("l_discount")))
            ).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


@register(
    "q21_suppliers_kept_waiting",
    oracle="""
    WITH per AS (
      SELECT l_orderkey, l_suppkey,
             MAX(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                      THEN 1 ELSE 0 END) AS late
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY l_orderkey, l_suppkey
    ), per_order AS (
      SELECT l_orderkey, COUNT(*) AS n_supp,
             CAST(SUM(late) AS BIGINT) AS n_late
      FROM per GROUP BY l_orderkey
    )
    SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM per
    JOIN per_order USING (l_orderkey)
    JOIN supplier ON s_suppkey = l_suppkey
    WHERE per.late = 1 AND per_order.n_supp >= 2 AND per_order.n_late = 1
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
)
def q21_suppliers_kept_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the SOLE late shipper on a
    multi-supplier order (late = shipped >60 days after ordering; the
    classic EXISTS/NOT-EXISTS pair rewritten as two hash aggregates —
    per-(order, supplier) lateness, then per-order supplier/late counts
    — which is how the correlated form should execute at 100 TB: both
    aggregates and the rejoin share ONE l_orderkey exchange, no
    correlated re-scans).  supplier broadcasts; top-20 with a
    deterministic (numwait DESC, s_name) tie-break."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    per = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max(
                F.when(
                    F.col("l_shipdate")
                    > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"),
                    1,
                ).otherwise(0)
            ).alias("late")
        )
    )
    per_order = per.groupBy("l_orderkey").agg(
        F.count("*").alias("n_supp"), F.sum("late").alias("n_late")
    )
    supp = F.broadcast(
        load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    )
    return (
        per.filter(F.col("late") == 1)
        .join(per_order, "l_orderkey")
        .filter((F.col("n_supp") >= 2) & (F.col("n_late") == 1))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


@register(
    "q22_dormant_high_balance",
    oracle="""
    WITH cents AS (
      SELECT c_custkey, c_nationkey,
             CAST(ROUND(c_acctbal * 100, 0) AS BIGINT) AS bal_cents
      FROM customer
    ), pos AS (
      SELECT CAST(SUM(bal_cents) AS BIGINT) AS total_cents,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM cents WHERE bal_cents > 0
    )
    SELECT n_name,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           ROUND(CAST(SUM(bal_cents) AS BIGINT) / 100.0, 2) AS total_acctbal
    FROM cents, pos
    JOIN nation ON c_nationkey = n_nationkey
    WHERE bal_cents * pos.n > pos.total_cents
      AND NOT EXISTS (
        SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY n_name
    ORDER BY n_name
    """,
)
def q22_dormant_high_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: customers with an above-average positive balance
    who never placed an order, rolled up by nation.  The average is
    compared in EXACT integer cents with the division cleared
    (bal_cents x n > total_cents) — no decimal/double division whose
    rounding could flip a boundary row between engines.  The 1-row
    global aggregate broadcasts; the never-ordered test is a LEFT ANTI
    join on o_custkey; nation broadcasts for the final rollup."""
    cents = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        F.round(F.col("c_acctbal") * 100, 0).cast("long").alias("bal_cents"),
    )
    pos = cents.filter(F.col("bal_cents") > 0).agg(
        F.sum("bal_cents").alias("total_cents"), F.count("*").alias("n")
    )
    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    nation = F.broadcast(
        load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    )
    return (
        cents.crossJoin(F.broadcast(pos))
        .filter(F.col("bal_cents") * F.col("n") > F.col("total_cents"))
        .join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .join(nation, F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum("bal_cents") / 100.0, 2).alias("total_acctbal"),
        )
        .orderBy("n_name")
    )


# ---------------------------------------------------------------------------
# r16: Theil-T and mean-log-deviation inequality indices — the decomposable
# entropy-based companions to q_gini_user_concentration / q_hhi.
# ---------------------------------------------------------------------------
@register(
    "q_theil_index_concentration",
    oracle="""
    WITH per AS (
      SELECT user_id,
             CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT)
               AS cents
      FROM events WHERE event_type = 'purchase'
      GROUP BY user_id
    ), tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(cents) AS BIGINT) AS s
      FROM per
    ), terms AS (
      SELECT CAST(ROUND(cents * ln(cents * 1.0 * n / s) * 1000000, 0)
                  AS BIGINT) AS t_unit,
             CAST(ROUND(ln(s * 1.0 / (cents * 1.0 * n)) * 1000000, 0)
                  AS BIGINT) AS l_unit
      FROM per, tot
    )
    SELECT tot.n AS n_users,
           tot.s AS total_cents,
           ROUND(CAST(SUM(t_unit) AS DOUBLE) / (1000000.0 * tot.s), 6)
             AS theil_t,
           ROUND(CAST(SUM(l_unit) AS DOUBLE) / (1000000.0 * tot.n), 6)
             AS mld_l
    FROM terms, tot
    GROUP BY tot.n, tot.s
    """,
)
def q_theil_index_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-T and mean-log-deviation (GE(0)) inequality of per-user
    purchase value — the entropy-family indices that, unlike Gini,
    DECOMPOSE additively into between-group + within-group terms (the
    property mixture designers use to attribute corpus concentration to
    sources).  T = Σ xᵢ·ln(xᵢ·n/S)/S, L = Σ ln(S/(n·xᵢ))/n over exact
    integer cents.

    Exactness: each user's log term is quantized to exact 1e-6 integer
    units before the sum (order-independent integer aggregation — a raw
    double SUM's shuffle-order would not hash-check; the same recipe as
    q_effective_sample_size's inverse quantization), with two rounded
    double divisions at the end.

    Scale shape: one user_id hash aggregate (map-side combined), a 1-row
    broadcast of (n, S), a second map-side integer aggregate — no window,
    no sort, unlike Gini's prefix-rank two-phase.  Purchase-only filter
    pushes to the scan."""
    per = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("cents")
        )
    )
    tot = per.agg(
        F.count("*").alias("n"), F.sum("cents").alias("s")
    )
    x = F.col("cents").cast("double")
    t_unit = F.round(
        x * F.log(x * F.col("n") / F.col("s")) * 1e6, 0
    ).cast("long")
    l_unit = F.round(
        F.log(F.col("s") / (x * F.col("n"))) * 1e6, 0
    ).cast("long")
    terms = per.crossJoin(F.broadcast(tot)).select(
        "n", "s", t_unit.alias("t_unit"), l_unit.alias("l_unit")
    )
    return terms.groupBy("n", "s").agg(
        F.round(
            F.sum(F.col("t_unit").cast("decimal(38,0)")).cast("double")
            / (1e6 * F.col("s")),
            6,
        ).alias("theil_t"),
        F.round(
            F.sum(F.col("l_unit").cast("decimal(38,0)")).cast("double")
            / (1e6 * F.col("n")),
            6,
        ).alias("mld_l"),
    ).select(
        F.col("n").alias("n_users"),
        F.col("s").alias("total_cents"),
        "theil_t",
        "mld_l",
    )
