"""Ingest telemetry (SURVEY.md §2.4 A1).

The reference prints a status line every 10,000 parsed rows with the
cumulative rows/sec (ref changesetmd.py:88,115-117; cadence documented at
ref README.md:73).  The engine's equivalents:

* batch — :class:`IngestStopwatch`: wrap any materializing action, get
  rows / elapsed / rate (what ``bench.py``'s xml_ingest metric uses).
* streaming — :class:`IngestProgressListener`: a ``StreamingQueryListener``
  that captures per-micro-batch input rows and processing rate straight
  from Spark's progress events (no per-row instrumentation — the executor
  hot path is untouched, unlike the reference's per-element counter).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQueryListener


@dataclass
class IngestStopwatch:
    """Batch-ingest rate: the reference's ``parsedCount / elapsed``
    (ref changesetmd.py:115-117) for a whole distributed action."""

    rows: int = 0
    seconds: float = 0.0

    @property
    def rate_per_sec(self) -> float:
        return self.rows / self.seconds if self.seconds > 0 else 0.0

    def run(self, df: DataFrame) -> "IngestStopwatch":
        t0 = time.perf_counter()
        self.rows = df.count()
        self.seconds = time.perf_counter() - t0
        return self


@dataclass
class BatchProgress:
    batch_id: int
    num_input_rows: int
    rows_per_second: float


class IngestProgressListener(StreamingQueryListener):
    """Collects per-batch progress for streaming ingest — the replication
    loop's status line, fed by Spark's own metrics."""

    def __init__(self) -> None:
        self.batches: list[BatchProgress] = []

    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API)
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        self.batches.append(
            BatchProgress(
                batch_id=p.batchId,
                num_input_rows=p.numInputRows,
                rows_per_second=p.processedRowsPerSecond or 0.0,
            )
        )

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    @property
    def total_rows(self) -> int:
        return sum(b.num_input_rows for b in self.batches)

    def attach(self, spark: SparkSession) -> "IngestProgressListener":
        spark.streams.addListener(self)
        return self

    def detach(self, spark: SparkSession) -> None:
        spark.streams.removeListener(self)
