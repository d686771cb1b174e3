"""salted_join equivalence: salting must change the shuffle layout, never
the result multiset."""

from __future__ import annotations

from pyspark.sql import functions as F

from changesetmd_spark.operators.skew import salted_join


def test_salted_join_equals_plain_join(spark):
    fact = spark.createDataFrame(
        [(k, i * 1.0) for i in range(200) for k in ("hot", "hot", "cold")],
        "k string, v double",
    )
    dim = spark.createDataFrame([("hot", 1), ("cold", 2)], "k string, d int")
    plain = sorted((r.k, r.v, r.d) for r in fact.join(dim, "k").collect())
    salted = sorted((r.k, r.v, r.d) for r in salted_join(fact, dim, "k").collect())
    assert salted == plain
    assert len(salted) == 600  # each fact row exactly once


def test_salted_join_left_keeps_unmatched(spark):
    fact = spark.createDataFrame([("a", 1.0), ("zzz", 2.0)], "k string, v double")
    dim = spark.createDataFrame([("a", 10)], "k string, d int")
    rows = {r.k: r.d for r in salted_join(fact, dim, "k", how="left").collect()}
    assert rows == {"a": 10, "zzz": None}


def test_salt_actually_spreads_hot_key(spark):
    fact = spark.createDataFrame(
        [("hot", float(i)) for i in range(500)], "k string, v double"
    )
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(16))
    n_distinct = fact.select(salt.alias("s")).distinct().count()
    assert n_distinct >= 12  # ~16 lanes in use, not 1
