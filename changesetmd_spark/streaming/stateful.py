"""Custom stateful streaming operator (SURVEY.md §2.9 T6, §2.10).

``applyInPandasWithState`` is the escape hatch for stateful semantics the
built-in windowed aggregations can't express (per-key accumulators with
arbitrary Python transition functions).  The operator here — per-user
running totals with explicit GroupState — is deliberately simple so the
*harness* (state schema, Arrow batch iteration, update-mode emission,
timeout plumbing) is the tested artifact; a production anomaly detector or
sessionizer swaps the transition function only.

Scale notes: state lives in the state store partitioned by the grouping
key, so memory scales with |distinct keys| per executor, not events; the
transition function sees Arrow batches (not rows).  Without watermark +
timeouts state grows monotonically — a production deployment sets
``GroupStateTimeout.EventTimeTimeout`` and drops idle keys.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING, Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from ..registry import register
from .events_stream import run_stream_to_table, state_width, stream_events

if TYPE_CHECKING:
    import pandas as pd

STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        # exact integer cents, NOT a double: micro-batch arrival order is
        # nondeterministic and float addition is order-sensitive, so a
        # double accumulator drifts from the (decimal-summing) oracle as
        # batches grow; integer addition is associative, so the final state
        # is order-exact (converted to a double only at emission)
        StructField("total_cents", LongType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)


def _update_user_totals(
    key: tuple[Any, ...],
    pdfs: Iterator["pd.DataFrame"],
    state: GroupState,
) -> Iterator["pd.DataFrame"]:
    import pandas as pd

    n, cents = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n += len(pdf)
        cents += int((pdf["value"] * 100).round().astype("int64").sum())
    state.update((n, cents))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [cents / 100.0]}
    )


def stateful_user_totals(events: DataFrame) -> DataFrame:
    """Streaming per-user accumulator: one updated (user_id, n, Σvalue) row
    per user per micro-batch, carried across batches in GroupState."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


@register(
    "q_stream_stateful_user_totals",
    oracle="""
    SELECT user_id,
           COUNT(*) AS n_events,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE)
             AS total_value
    FROM events
    GROUP BY user_id
    """,
)
def q_stream_stateful_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The custom stateful operator driven availableNow over the staged
    source; after the final batch each user's state equals the batch
    aggregate — hash-checked against plain SQL."""
    ev = stream_events(spark, sf_dir)
    out = run_stream_to_table(
        stateful_user_totals(ev),
        output_mode="update",
        # Unlike the JVM-stateful operators (state-store overhead bound →
        # width follows source size), this operator's cost is per-KEY
        # Python transition work, so it wants CORE-level parallelism:
        # measured sweep at sf0.1 — w=2: 5.67 s, w=4: 2.90, w=8: 1.85,
        # w=16: 1.55, w=32: 1.62.  Width = max(size-adaptive floor,
        # half the session parallelism) keeps Python workers busy on any
        # core count while tiny sources still avoid the full default.
        shuffle_partitions=max(
            state_width(spark, sf_dir),
            spark.sparkContext.defaultParallelism // 2,
        ),
    )
    # keep only each user's final state (multi-batch runs emit one row per
    # batch per touched key; the last has the full accumulation)
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.desc("n_events"))
    return (
        out.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "n_events",
            F.round(F.col("total_value"), 2).alias("total_value"),
        )
    )
