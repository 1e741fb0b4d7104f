"""S8 — ops/metrics sinks (CloudWatch delivery-log analog).

The reference ships per-leg CloudWatch log groups for Firehose
delivery and OpenSearch app/slow logs (reference firehose.py:126-130,
143-147; ops.py:89-93). The Spark-native equivalent is a
``StreamingQueryListener``: every micro-batch progress event becomes
one JSON line — rows, processing rate, per-stage durations — in a
local ops log (swap the writer for a real metrics client in prod).
"""

from __future__ import annotations

import json
import os
import threading

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQueryListener


class JsonlMetricsListener(StreamingQueryListener):
    """Append one JSON line per micro-batch progress event.

    Fields mirror what the reference's delivery logs surface: batch
    id, input rows, processing rate, and the duration breakdown. The
    file is append-only and line-buffered; a lock serializes writes
    (listener callbacks arrive on the streaming listener bus thread,
    but queries can be concurrent).
    """

    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self._lock = threading.Lock()

    def onQueryStarted(self, event) -> None:
        self._write({"event": "started", "id": str(event.id), "name": event.name})

    def onQueryProgress(self, event) -> None:
        p = event.progress
        self._write(
            {
                "event": "progress",
                "id": str(p.id),
                "batch_id": p.batchId,
                "timestamp": p.timestamp,
                "num_input_rows": p.numInputRows,
                "processed_rows_per_second": p.processedRowsPerSecond,
                "duration_ms": dict(p.durationMs or {}),
            }
        )

    def onQueryIdle(self, event) -> None:  # pragma: no cover - cadence dependent
        pass

    def onQueryTerminated(self, event) -> None:
        self._write(
            {
                "event": "terminated",
                "id": str(event.id),
                "exception": event.exception,
            }
        )

    def _write(self, record: dict) -> None:
        line = json.dumps(record, default=str)
        with self._lock:
            with open(self.path, "a") as f:
                f.write(line + "\n")


def attach_metrics_listener(spark: SparkSession, path: str) -> JsonlMetricsListener:
    """Create, register, and return the ops-log listener."""
    listener = JsonlMetricsListener(path)
    spark.streams.addListener(listener)
    return listener
