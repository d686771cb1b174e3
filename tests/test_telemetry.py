"""A1 telemetry tests: batch stopwatch rate and streaming progress capture
through the replication stream."""

from __future__ import annotations

import time

from changesetmd_spark.streaming import run_replication_stream
from changesetmd_spark.streaming.telemetry import IngestProgressListener, IngestStopwatch
from changesetmd_spark.tables import load_table
from tests.test_replication import _cs
from tests.test_streaming import _write_diff


def test_stopwatch_rate(spark, sf_dir):
    sw = IngestStopwatch().run(load_table(spark, sf_dir, "events"))
    assert sw.rows > 0 and sw.seconds > 0 and sw.rate_per_sec > 0


def test_streaming_listener_captures_batches(spark, tmp_path):
    src = str(tmp_path / "diffs")
    _write_diff(src, 201, [_cs(1, False, 1), _cs(2, False, 2)])
    _write_diff(src, 202, [_cs(3, False, 3)])

    listener = IngestProgressListener().attach(spark)
    try:
        run_replication_stream(
            spark, src, str(tmp_path / "table"), str(tmp_path / "ckpt")
        )
        # listener delivery is async relative to query termination
        deadline = time.time() + 30
        while listener.total_rows < 3 and time.time() < deadline:
            time.sleep(0.5)
        assert listener.total_rows == 3, listener.batches
        assert all(b.num_input_rows > 0 for b in listener.batches)
    finally:
        listener.detach(spark)
