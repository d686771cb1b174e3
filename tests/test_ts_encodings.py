"""Timestamp-encoding hardening: the driver has shipped events.ts as
parquet TIMESTAMP(NANOS) (rounds 1-2) and as timestamp[us] with
isAdjustedToUTC=false → Spark TIMESTAMP_NTZ (round 5's regenerated data,
which broke every event-time query for two rounds).  This test writes the
SAME instants in all three plausible physical encodings and asserts both
load paths normalize them to identical TIMESTAMP values — so the next
testdata regeneration cannot reintroduce the failure class."""

from __future__ import annotations

import datetime
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from changesetmd_spark.tables import load_table

_INSTANTS = [
    datetime.datetime(2024, 1, 1, 0, 0, 0, 123456),
    datetime.datetime(2024, 6, 15, 23, 59, 59, 999999),
    datetime.datetime(2025, 12, 31, 12, 30, 0, 1),
]


def _write_events(dir_path: str, ts_type: pa.DataType) -> str:
    os.makedirs(dir_path, exist_ok=True)
    tbl = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "user_id": pa.array([10, 20, 30], pa.int64()),
            "event_type": pa.array(["click", "view", "purchase"]),
            "value": pa.array([1.5, 2.5, 3.5], pa.float64()),
            "ts": pa.array(_INSTANTS, pa.timestamp("us")).cast(ts_type),
        }
    )
    pq.write_table(tbl, os.path.join(dir_path, "events.parquet"))
    return dir_path


_ENCODINGS = {
    "nanos": pa.timestamp("ns"),          # legacy: Spark reads long via nanosAsLong
    "us_ntz": pa.timestamp("us"),         # round-5 driver data: TIMESTAMP_NTZ
    "us_utc": pa.timestamp("us", "UTC"),  # tz-adjusted: plain TIMESTAMP
}


@pytest.mark.parametrize("name", sorted(_ENCODINGS))
def test_load_table_normalizes_every_ts_encoding(spark, tmp_path, name):
    sf_dir = _write_events(str(tmp_path / name), _ENCODINGS[name])
    df = load_table(spark, sf_dir, "events")
    assert dict(df.dtypes)["ts"] == "timestamp", dict(df.dtypes)
    got = [
        r[0]
        for r in df.orderBy("event_id")
        .select(F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS"))
        .collect()
    ]
    want = [t.strftime("%Y-%m-%d %H:%M:%S.%f") for t in _INSTANTS]
    assert got == want, f"{name}: {got}"


@pytest.mark.parametrize("name", sorted(_ENCODINGS))
def test_stream_events_normalizes_every_ts_encoding(spark, tmp_path, name):
    from changesetmd_spark.streaming.events_stream import stream_events

    sf_dir = _write_events(str(tmp_path / name), _ENCODINGS[name])
    sdf = stream_events(spark, sf_dir)
    assert sdf.isStreaming
    # withWatermark is exactly what threw EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE
    # on the NTZ encoding for two rounds — it must plan on every encoding
    sdf.withWatermark("ts", "1 hour").groupBy(
        F.window("ts", "1 hour")
    ).count()
