"""applyInPandasWithState carry-over test: state must survive ACROSS
micro-batches (the single-batch oracle check can't distinguish stateful
accumulation from a plain per-batch aggregate)."""

from __future__ import annotations

from pyspark.sql import functions as F

from changesetmd_spark.streaming.stateful import stateful_user_totals


def test_state_carries_across_batches(spark, tmp_path):
    src = tmp_path / "events_src"
    # two files -> two micro-batches with maxFilesPerTrigger=1
    spark.createDataFrame(
        [(1, 10.0), (1, 5.0), (2, 1.0)], "user_id long, value double"
    ).coalesce(1).write.parquet(str(src / "f1"))
    spark.createDataFrame(
        [(1, 2.5), (3, 7.0)], "user_id long, value double"
    ).coalesce(1).write.parquet(str(src / "f2"))

    schema = "user_id long, value double"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    name = "stateful_carry_test"
    q = (
        stateful_user_totals(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.table(name).collect()

    # user 1 appears in both batches: the later emission must ACCUMULATE
    by_user = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append((r.n_events, r.total_value))
    finals = {u: max(v) for u, v in by_user.items()}
    assert finals[1] == (3, 17.5), finals  # 2 events batch1 + 1 event batch2
    assert finals[2] == (1, 1.0)
    assert finals[3] == (1, 7.0)
    # and user 1 must have been emitted more than once (once per batch)
    assert len(by_user[1]) == 2, by_user
