"""JSONL corpus source (SURVEY §2.1 S-extension): newline-delimited JSON
is the interchange format LLM training corpora actually ship in (C4, The
Pile, Dolma, RedPajama releases are all .jsonl/.jsonl.gz shards), so the
engine needs a first-class reader next to the XML changeset source.

Spark-first design: ``spark.read.schema(...).json(dir)`` — an explicit
schema (never inference, which would double-scan 100 TB), Hadoop codecs
decode ``.gz`` shards transparently exactly as the XML source's bz2 path
does, and PERMISSIVE mode routes malformed lines into a
``_corrupt_record`` column instead of failing the job, so a broken shard
costs an audit row, not a 1000-executor restart.  ``read_jsonl_corpus``
returns (clean rows, corrupt-line frame) and ``q_jsonl_ingest_audit``
pins the whole path — staging a deterministic .jsonl.gz fixture (with
planted malformed lines) from the parquet corpus, reading it back, and
hash-checking per-source counts/checksums against DuckDB's independent
recomputation from the parquet view (the fixture is a pure function of
``documents``, so the decode must round-trip exactly and the corrupt
count must equal the plant count).

Reference parity: the reference ingests only OSM XML (changesetmd.py); the
JSONL tier is the mandated LLM-pipeline extension surface.
"""

from __future__ import annotations

import gzip
import hashlib
import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..registry import register
from ..tables import table_path

_STAGE_ROOT = "/tmp/changesetmd_spark_jsonl_stage"

# one malformed line is planted every _CORRUPT_EVERY docs — the audit must
# prove PERMISSIVE isolation (clean rows unaffected, corrupt rows counted)
_CORRUPT_EVERY = 100

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
        T.StructField("_corrupt_record", T.StringType()),
    ]
)


def stage_jsonl_fixture(sf_dir: str, shards: int = 4) -> str:
    """Write the ``documents`` table as ``shards`` deterministic .jsonl.gz
    files (sorted by doc_id, round-robin by doc_id % shards, fixed key
    order, one planted malformed line per {_CORRUPT_EVERY} docs) and
    return the directory.  Idempotent per sf_dir via a _DONE marker;
    generation is fixture prep, not part of the measured read path."""
    import duckdb

    # the cache key folds in a content fingerprint of the parquet (size +
    # mtime of every file under it) so a regenerated corpus at the same
    # path invalidates the staged fixture instead of silently reusing it
    src = table_path(sf_dir, "documents")
    fp_parts = [os.path.abspath(sf_dir)]
    if os.path.isdir(src):
        for name in sorted(os.listdir(src)):
            st = os.stat(os.path.join(src, name))
            fp_parts.append(f"{name}:{st.st_size}:{st.st_mtime_ns}")
    elif os.path.exists(src):
        st = os.stat(src)
        fp_parts.append(f"{st.st_size}:{st.st_mtime_ns}")
    key = hashlib.sha1("|".join(fp_parts).encode()).hexdigest()[:12]
    out = os.path.join(_STAGE_ROOT, f"docs-{key}-s{shards}")
    marker = os.path.join(out, "_DONE")
    if os.path.exists(marker):
        # bump the marker mtime on every cache hit so an in-use fixture
        # never ages past the sweep cutoff below (a concurrent process —
        # parallel pytest, a second bench on another corpus — may still be
        # lazily reading shards staged >1 h ago)
        try:
            os.utime(marker)
        except OSError:
            pass
        return out
    # content-fingerprinted keys mean every corpus regeneration creates a
    # fresh staged dir; sweep stale siblings so repeated regens don't grow
    # /tmp unboundedly.  Only dirs that are BOTH >1 h idle (marker mtime,
    # refreshed on each cache hit above) AND either incomplete (no _DONE)
    # or orphaned are candidates — a complete fixture whose marker was
    # touched recently is assumed live and left alone.
    if os.path.isdir(_STAGE_ROOT):
        cutoff = time.time() - 3600.0
        for d in os.listdir(_STAGE_ROOT):
            full = os.path.join(_STAGE_ROOT, d)
            if full == out:
                continue
            sib_marker = os.path.join(full, "_DONE")
            try:
                ts = os.path.getmtime(
                    sib_marker if os.path.exists(sib_marker) else full
                )
                if ts < cutoff:
                    shutil.rmtree(full, ignore_errors=True)
            except OSError:
                pass
    os.makedirs(out, exist_ok=True)
    rows = (
        duckdb.connect()
        .execute(
            "SELECT doc_id, text, lang, source, n_chars "
            f"FROM read_parquet('{table_path(sf_dir, 'documents')}') "
            "ORDER BY doc_id"
        )
        .fetchall()
    )
    fhs = [
        gzip.open(os.path.join(out, f"part-{i:02d}.jsonl.gz"), "wt")
        for i in range(shards)
    ]
    try:
        for doc_id, text, lang, source, n_chars in rows:
            fh = fhs[doc_id % shards]
            fh.write(
                json.dumps(
                    {
                        "doc_id": doc_id,
                        "text": text,
                        "lang": lang,
                        "source": source,
                        "n_chars": n_chars,
                    },
                    sort_keys=True,
                )
                + "\n"
            )
            if doc_id % _CORRUPT_EVERY == 0:
                # truncated JSON — the classic mid-shard corruption
                fh.write(f'{{"doc_id": {doc_id}, "text": "TRUNC\n')
    finally:
        for fh in fhs:
            fh.close()
    with open(marker, "w") as f:
        f.write("ok")
    return out


def read_jsonl_corpus(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(clean documents, corrupt lines, persisted raw frame) from a
    .jsonl[.gz] shard directory; callers must release ``raw`` after
    materializing (materialize_releasing).

    Explicit schema (no inference pass), PERMISSIVE mode: malformed lines
    land in ``_corrupt_record`` with every data column null; gz decoding
    is Hadoop's, splittable per shard file.  At 100 TB this is an
    embarrassingly parallel scan — one task per (shard, split), no
    exchange."""
    raw = (
        spark.read.schema(DOC_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
        # Spark 4 rejects file-source plans whose referenced columns are
        # ONLY the internal corrupt-record column (SPARK-38523 guard); the
        # documented workaround is to cache the parsed frame — which this
        # reader wants anyway, since clean and corrupt both consume it.
        # Callers release via materialize_releasing(..., raw).
        .persist()
    )
    clean = raw.filter(F.col("_corrupt_record").isNull()).drop(
        "_corrupt_record"
    )
    corrupt = raw.filter(F.col("_corrupt_record").isNotNull()).select(
        "doc_id", "_corrupt_record"
    )
    return clean, corrupt, raw


# The oracle never touches the staged files: the fixture is a pure
# function of `documents`, so DuckDB recomputes the expected audit from
# the parquet view — clean per-source stats must round-trip the
# JSONL encode/decode EXACTLY, and the corrupt count must equal the
# number of planted lines (one per doc_id % _CORRUPT_EVERY == 0).
@register(
    "q_jsonl_ingest_audit",
    oracle=f"""
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           bit_xor(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|' || text),
                                   1, 15))::BIGINT) AS content_xor
    FROM documents
    GROUP BY source
    UNION ALL
    SELECT '_corrupt' AS source,
           COUNT(*) AS n_docs,
           CAST(0 AS BIGINT) AS total_chars,
           CAST(0 AS BIGINT) AS content_xor
    FROM documents WHERE doc_id % {_CORRUPT_EVERY} = 0
    """,
)
def q_jsonl_ingest_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSONL ingest audit: read the staged .jsonl.gz shards of the
    ``documents`` corpus (explicit schema, PERMISSIVE corrupt-record
    isolation) and report, per source, the clean row count, total chars,
    and an order-independent bit_xor content checksum — plus one
    ``source='_corrupt'`` row counting the planted malformed lines (the
    proof that corruption is isolated, not silently dropped and not
    fatal).

    Scale shape (100 TB): schema-pinned JSON scan, one task per shard
    split, no inference pass; the audit is one O(#sources) hash
    aggregate.  Corrupt handling is PERMISSIVE per line — a bad shard
    degrades to audit rows."""
    staged = stage_jsonl_fixture(sf_dir)
    clean, corrupt, raw = read_jsonl_corpus(spark, staged)
    per_source = clean.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.bit_xor(
            F.conv(
                F.substring(F.md5(F.concat_ws("|", "doc_id", "text")), 1, 15),
                16,
                10,
            ).cast("long")
        ).alias("content_xor"),
    )
    corrupt_row = corrupt.agg(
        F.count(F.lit(1)).alias("n_docs")
    ).select(
        F.lit("_corrupt").alias("source"),
        "n_docs",
        F.lit(0).cast("long").alias("total_chars"),
        F.lit(0).cast("long").alias("content_xor"),
    )
    from ..operators.util import materialize_releasing

    return materialize_releasing(
        per_source.unionByName(corrupt_row), raw
    )
