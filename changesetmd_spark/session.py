"""SparkSession factory with scale-oriented defaults.

Tested on ``local[N]`` but every setting is chosen for a multi-executor
cluster: AQE on (runtime coalesce + skew-join splitting), broadcast threshold
left at default so small dimension tables broadcast, UTC session timezone so
timestamp semantics match the reference's ``timestamp without time zone``
columns (ref queries.py:10,15,25), Arrow enabled for the few pandas-UDF
operators.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Defaults chosen for the test harness (local[32], 128 GiB); on a real
# cluster shuffle.partitions should be ~2-3x total cores and is overridable
# via SPARK_GRAFT_SHUFFLE_PARTITIONS.
DEFAULT_CONF = {
    # local[32] shares ONE driver JVM across all task threads; the 1g default
    # heap starves 32 concurrent tasks (observed OOM at sf0.1).  On a real
    # cluster this maps to executor memory sizing instead.  Only effective
    # when this factory creates the JVM (no-op via getOrCreate on a live one).
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"),
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # parquet scan tuning: group small files, keep row-group pruning on
    "spark.sql.files.maxPartitionBytes": "128m",
    "spark.sql.parquet.filterPushdown": "true",
    # our oracle comparisons depend on timezone-stable timestamps
    "spark.sql.parquet.int96RebaseModeInRead": "CORRECTED",
    # the driver's events.parquet stores TIMESTAMP(NANOS); Spark's reader
    # rejects that type unless surfaced as long (tables.load_table converts
    # back to a micros timestamp with exact integer division)
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.shuffle.partitions": os.environ.get(
        "SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"
    ),
    # Generated-code cache (r18, VERDICT r17 #9): the default 100 entries
    # thrashes across a many-query application — the 254-query gauntlet
    # recompiles large generated classes on every revisit.  Measured with
    # tools/codegen_cache_exp.py (24 codegen-heavy queries, two passes,
    # both run orders): second-pass total 29.9 s at 100 entries vs 26.9 s
    # at 5000 (~10%).  Static conf, read once at first compile; a
    # one-query-per-JVM production job is unaffected either way.
    "spark.sql.codegen.cache.maxEntries": os.environ.get(
        "SPARK_GRAFT_CODEGEN_CACHE", "5000"
    ),
}


def get_spark(
    app_name: str = "changesetmd-spark",
    master: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's defaults.

    ``master`` resolution order: explicit arg, $SPARK_GRAFT_MASTER,
    ``local[$SPARK_GRAFT_CPUS]``, ``local[*]``.
    """
    if master is None:
        master = os.environ.get("SPARK_GRAFT_MASTER")
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    builder = SparkSession.builder.appName(app_name).master(master)
    conf = dict(DEFAULT_CONF)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
