"""Multimodal (binary) column operators (SURVEY §2.11 E3).

Images/audio/video are opaque ``binary`` payloads with typed metadata.  The
container has no codec libraries, so the decode step is a clearly-marked stub
— but the Spark-side plumbing is real and tested: schema, Arrow batch shape,
``mapInPandas`` signature, partition sizing.  The oracle-checked entry
exercises the binary column algebra (encode/length/hash) that *is*
engine-native.

Scale notes: binary payloads dominate row size, so the pipeline repartitions
by byte budget (not row count) before the decode stage, and metadata-only
queries never touch the payload column (column pruning keeps the scan cheap).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..registry import register
from ..tables import load_table

if TYPE_CHECKING:
    import pandas as pd

# media row: payload + typed metadata (the E3 column contract)
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("modality", StringType(), False),  # image|audio|video
        StructField("payload", BinaryType(), True),
        StructField("mime_type", StringType(), True),
        StructField("n_bytes", LongType(), True),
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("modality", StringType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("n_frames", IntegerType(), True),
        StructField("feature_hash", LongType(), True),
    ]
)


def synthesize_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fake media table: documents' text bytes as payloads.

    Stands in for a real binary source (parquet/webdataset) so the plumbing
    is exercised end-to-end without codec libraries."""
    docs = load_table(spark, sf_dir, "documents")
    modality = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    payload = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        modality.alias("modality"),
        payload.alias("payload"),
        F.concat(F.lit("application/x-fake-"), modality).alias("mime_type"),
        F.octet_length(F.col("text")).cast("long").alias("n_bytes"),
    )


def decode_media(df: DataFrame, batch_budget_bytes: int = 64 << 20) -> DataFrame:
    """Decode/feature-extract stage as Arrow-batched ``mapInPandas``.

    The actual codec call is stubbed (no image/audio libs in this container)
    with a deterministic fake: dimensions derived from payload length, a
    feature hash from the payload bytes.  Swap ``_fake_decode`` for a real
    decoder (PIL/av/torchaudio) in production — the Spark contract
    (schema, batching, partitioning) is unchanged.
    """

    def _fake_decode(payload: bytes | None) -> tuple[int, int, int, int]:
        if payload is None:
            return (0, 0, 0, 0)
        # deterministic stand-in for decode: sizes from length, hash of bytes
        n = len(payload)
        import zlib

        h = zlib.crc32(payload)
        return (n % 1920 + 1, n % 1080 + 1, n % 300 + 1, h)

    def decode_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            decoded = [_fake_decode(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "n_frames": [d[2] for d in decoded],
                    "feature_hash": [d[3] for d in decoded],
                }
            )

    return df.mapInPandas(decode_batches, schema=DECODED_SCHEMA)


def real_decode_stub(payload: bytes, mime_type: str) -> None:
    """Where a real codec would plug in.  Deliberately unimplemented."""
    raise NotImplementedError(
        "media decoding requires codec libraries (PIL/pyav) not present in "
        "this container; use decode_media()'s deterministic fake for tests"
    )


@register(
    "q_multimodal_byte_stats",
    oracle="""
    SELECT CASE WHEN doc_id % 3 = 0 THEN 'image'
                WHEN doc_id % 3 = 1 THEN 'audio'
                ELSE 'video' END AS modality,
           COUNT(*) AS n_items,
           SUM(octet_length(CAST(text AS BLOB))) AS total_bytes,
           MAX(octet_length(CAST(text AS BLOB))) AS max_bytes
    FROM documents
    GROUP BY 1
    """,
)
def q_multimodal_byte_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = synthesize_media(spark, sf_dir)
    return media.groupBy("modality").agg(
        F.count("*").alias("n_items"),
        F.sum(F.octet_length("payload").cast("long")).alias("total_bytes"),
        F.max(F.octet_length("payload").cast("long")).alias("max_bytes"),
    )


@register("q_multimodal_decode")  # no oracle: mapInPandas stub, rows-only
def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full plumbing: synthesize → decode (stubbed) → metadata aggregate."""
    decoded = decode_media(synthesize_media(spark, sf_dir))
    return decoded.groupBy("modality").agg(
        F.count("*").alias("n_items"),
        F.max("width").alias("max_width"),
        F.max("n_frames").alias("max_frames"),
    )
