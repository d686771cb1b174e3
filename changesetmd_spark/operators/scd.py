"""Slowly-changing-dimension (Type 2) history build ([extension]): collapse
a per-entity change stream into validity intervals — the warehouse-side
dual of the LWW upsert sink (`sinks/upsert.py` keeps only the latest row;
SCD2 keeps every run of equal attribute values as a [valid_from, valid_to)
interval with an is_current flag).  The reference's Postgres schema stores
only current state (ref queries.py:1-56); SCD2 is what a user builds the
moment they need "what was this entity's attribute AT time t".

Construction (classic gaps-and-islands, all integer/date exact):
1. per-entity order: (o_orderdate, o_orderkey) — total, deterministic;
2. change points: attribute IS DISTINCT FROM its LAG (null-safe);
3. run ids: running SUM of change points (window per entity);
4. intervals: per (entity, run) MIN/MAX date + order count;
5. valid_to: LEAD(valid_from) per entity — NULL marks the current run.

Scale shape (100 TB): every window and aggregate is partitioned by
``o_custkey`` — millions of small independent groups, no global window, no
SinglePartition exchange anywhere (plan-pinned).  One shuffle on custkey
feeds steps 2-5 (Spark reuses the partitioning across the chained windows
and the groupBy on a superset key), so the whole history build is a single
exchange of the fact table — the minimum any per-entity ordering needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import fmt_date
from ..registry import register
from ..tables import load_table


@register(
    "q_scd2_priority_history",
    oracle="""
    WITH o AS (
      SELECT o_custkey, o_orderkey, o_orderdate, o_orderpriority,
             CASE WHEN o_orderpriority IS DISTINCT FROM
                       LAG(o_orderpriority) OVER w
                  THEN 1 ELSE 0 END AS chg
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey)
    ), runs AS (
      SELECT *, SUM(chg) OVER (PARTITION BY o_custkey
                               ORDER BY o_orderdate, o_orderkey
                               ROWS UNBOUNDED PRECEDING) AS run_id
      FROM o
    ), iv AS (
      SELECT o_custkey, run_id, o_orderpriority AS priority,
             MIN(o_orderdate) AS vf,
             COUNT(*) AS n_orders
      FROM runs
      GROUP BY o_custkey, run_id, o_orderpriority
    )
    SELECT o_custkey,
           CAST(run_id AS BIGINT) AS run_id,
           priority,
           strftime(vf, '%Y-%m-%d') AS valid_from,
           strftime(LEAD(vf) OVER (PARTITION BY o_custkey ORDER BY run_id),
                    '%Y-%m-%d') AS valid_to,
           CAST(n_orders AS BIGINT) AS n_orders,
           CAST(CASE WHEN LEAD(vf) OVER (PARTITION BY o_custkey
                                         ORDER BY run_id) IS NULL
                     THEN 1 ELSE 0 END AS BIGINT) AS is_current
    FROM iv
    """,
)
def q_scd2_priority_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 validity intervals of each customer's order priority —
    null-safe change detection, running-run-id islands, LEAD-closed
    intervals; see module docstring for the scale argument."""
    orders = load_table(spark, sf_dir, "orders")
    seq = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    run = seq.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    chg = F.when(
        ~F.col("o_orderpriority").eqNullSafe(
            F.lag("o_orderpriority").over(seq)
        ),
        F.lit(1),
    ).otherwise(F.lit(0))
    iv = (
        orders.withColumn("chg", chg)
        .withColumn("run_id", F.sum("chg").over(run))
        .groupBy("o_custkey", "run_id", "o_orderpriority")
        .agg(
            F.min("o_orderdate").alias("vf"),
            F.count("*").cast("long").alias("n_orders"),
        )
    )
    nxt = Window.partitionBy("o_custkey").orderBy("run_id")
    vt = F.lead("vf").over(nxt)
    return iv.select(
        "o_custkey",
        F.col("run_id").cast("long").alias("run_id"),
        F.col("o_orderpriority").alias("priority"),
        fmt_date("vf").alias("valid_from"),
        fmt_date(vt).alias("valid_to"),
        "n_orders",
        F.when(vt.isNull(), F.lit(1)).otherwise(F.lit(0))
        .cast("long")
        .alias("is_current"),
    )
