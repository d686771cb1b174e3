"""Bucketing co-location proof (SURVEY.md §4.2): writing both join sides
bucketed by the join key lets the sort-merge join run with ZERO exchanges —
the physical-layout trick that replaces a shuffle of the 100 TB fact table
with a pre-paid layout at write time.  Asserted on the plan, not vibes."""

from __future__ import annotations

from pyspark.sql import functions as F

from changesetmd_spark.plans import shuffle_count
from changesetmd_spark.tables import load_table


def test_bucketed_join_has_no_shuffle(spark, sf_dir):
    # warehouse dir is a static conf; tables land in ./spark-warehouse
    # (gitignored) and are dropped on the way out
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    # at test SF everything fits under the broadcast threshold and the
    # planner (correctly) broadcasts; disable it to surface the sort-merge
    # path bucketing is for — at 100 TB neither side broadcasts
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        for df, name, key in (
            (orders, "orders_b", "o_orderkey"),
            (lineitem, "lineitem_b", "l_orderkey"),
        ):
            (
                df.write.mode("overwrite")
                .bucketBy(8, key)
                .sortBy(key)
                .saveAsTable(name)
            )

        o = spark.table("orders_b")
        li = spark.table("lineitem_b")
        joined = o.join(li, o.o_orderkey == li.l_orderkey).groupBy(
            "o_orderpriority"
        ).agg(F.count("*").alias("n"))
        # bucket-aligned SMJ: the only exchange is the tiny final aggregate's
        n_shuffles = shuffle_count(joined)
        assert n_shuffles <= 1, f"bucketed join shuffled inputs ({n_shuffles})"
        assert joined.count() > 0

        # the same join over plain parquet shuffles BOTH sides
        plain = orders.join(
            lineitem, orders.o_orderkey == lineitem.l_orderkey
        ).groupBy("o_orderpriority").agg(F.count("*").alias("n"))
        assert shuffle_count(plain) >= 2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")
