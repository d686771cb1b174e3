"""Test-table catalog: the driver's deterministic parquet tables.

``/root/testdata/sf*/{region,nation,customer,supplier,part,orders,lineitem,
events,documents,embeddings}.parquet`` (see TESTDATA.md / FIXTURES.md §B).
Plain ``spark.read.parquet`` so Catalyst gets native scans with predicate
pushdown + column pruning; no schema inference surprises because parquet is
self-describing.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


# (abspath, total bytes, max mtime_ns) → inferred StructType.  Metadata-only
# memo (r17, guide §5 driver work): ``spark.read.parquet`` eagerly infers the
# schema from file footers on the DRIVER — measured 65-206 ms per call on the
# driver testdata vs 10-24 ms with an explicit schema.  Every builder pays
# that per table load, in every bench sample.  The key fingerprints the
# source (size + newest mtime), so regenerated data re-infers; query RESULTS
# are never cached — the scan still reads the parquet on every run.
_SCHEMA_CACHE: dict[tuple[str, int, int], object] = {}


def _stat_source(path: str) -> tuple[int, int, int] | None:
    """(total bytes, newest mtime_ns, file count) of a parquet file or
    part-file directory — walked recursively, so nested/partitioned
    layouts are fingerprinted too (ADVICE r17: the flat listdir gave
    them a constant (0, 0) key, which would silently serve a stale
    cached schema after a regeneration).  None when unreadable or when
    no ``*.parquet`` leaf exists (unknown layout — caller falls back to
    plain inference and never caches)."""
    try:
        if os.path.isdir(path):
            nbytes = 0
            mtime = 0
            nfiles = 0
            for root, _dirs, files in os.walk(path):
                for f in files:
                    if f.endswith(".parquet"):
                        st = os.stat(os.path.join(root, f))
                        nbytes += st.st_size
                        mtime = max(mtime, st.st_mtime_ns)
                        nfiles += 1
            if nfiles == 0:
                return None
            return nbytes, mtime, nfiles
        st = os.stat(path)
        return st.st_size, st.st_mtime_ns, 1
    except OSError:
        return None


def read_parquet_cached_schema(spark: SparkSession, path: str):
    """``spark.read.parquet`` without the per-call driver-side schema
    inference when the source is unchanged since last seen.  Returns
    (DataFrame, source stat) — the stat doubles as fan_out's size hint."""
    stat = _stat_source(path)
    if stat is None:
        return spark.read.parquet(path), None
    key = (os.path.abspath(path), *stat)
    schema = _SCHEMA_CACHE.get(key)
    if schema is not None:
        return spark.read.schema(schema).parquet(path), stat
    df = spark.read.parquet(path)
    _SCHEMA_CACHE[key] = df.schema
    return df, stat


def _ensure_session_confs(spark: SparkSession) -> None:
    """Queries must behave identically under a caller-owned SparkSession
    (the driver's verify constructs its own): events.parquet stores
    TIMESTAMP(NANOS) which Spark only reads via the nanosAsLong fallback,
    and formatted-timestamp output must be timezone-stable."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    _ensure_session_confs(spark)
    path = table_path(sf_dir, name)
    df, stat = read_parquet_cached_schema(spark, path)
    # events.ts has shipped in two physical encodings across driver testdata
    # generations: parquet TIMESTAMP(NANOS) (surfaced as long nanos via
    # spark.sql.legacy.parquet.nanosAsLong — exact integer division, since a
    # double division would lose precision at 1e18 nanos) and parquet
    # timestamp[us] with isAdjustedToUTC=false (surfaced as TIMESTAMP_NTZ).
    # Normalize both to TIMESTAMP: under the pinned UTC session timezone the
    # NTZ→LTZ cast is value-identical, and DuckDB oracles read the same
    # wall-clock values either way.
    for field in df.schema.fields:
        if field.name == "ts" and field.dataType.simpleString() == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif field.name == "ts" and field.dataType.simpleString() == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    if name == "embeddings":
        # Corrupt-vector contract (r16, flushed out by the degenerate-corpus
        # referee): a single zero-norm vector turns every cosine denominator
        # into DIVIDE_BY_ZERO under ANSI mode, and one NaN component poisons
        # centroids/quantizers on BOTH engines (Spark CAST_OVERFLOW, DuckDB
        # INT128 conversion error) — at 100 TB one bad row must not kill the
        # job.  The whole embedding family therefore consumes this cleaned
        # view: vectors with a finite, strictly-positive sum of squares.
        # One pass, one aggregate per row; NaN/±Inf in any component makes
        # the sum NaN/Inf, so the single `isfinite(ss) AND ss > 0` test
        # covers non-finite AND zero-norm at once.  Mirrored verbatim by
        # ``registry.EMB_CLEAN_SQL``, which the registry splices into every
        # oracle's ``FROM embeddings`` at registration.
        ss = F.aggregate(
            "embedding", F.lit(0.0), lambda a, x: a + x.cast("double") * x
        )
        df = df.filter(
            (~F.isnan(ss)) & (ss < F.lit(float("inf"))) & (ss > 0)
        )
    # Source-size hint for util.fan_out (r17): deciding "is this scan
    # narrower than the session parallelism" via df.rdd.getNumPartitions()
    # costs a ~150 ms driver-side RDD conversion per call — ~0.15 s added
    # to EVERY bench sample of every fan_out query.  The byte size lets
    # fan_out estimate the scan width in pure Python; a transformed frame
    # loses the (Python-side) attribute and falls back to the exact RDD
    # check.  Attached to the FINAL frame (the ts/embedding normalizations
    # above return new DataFrames).
    if stat is not None:
        df._src_nbytes = stat[0]
        df._src_nfiles = stat[2]
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] | None = None
) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLES)}


def register_views(spark: SparkSession, sf_dir: str, suffix: str = "") -> None:
    """Register each table as a temp view (for the spark.sql query surface)."""
    for n in TABLES:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n + suffix)
