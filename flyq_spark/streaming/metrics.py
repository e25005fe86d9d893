"""Streaming observability: persist per-micro-batch progress [EXT].

The reference ships a polling monitor example (flyq-client/examples/
monitor.rs); Structured Streaming's native telemetry is the
StreamingQueryListener. This module persists each micro-batch's
progress as JSON lines — a durable, queryable ops log (rows/sec,
batch durations, state-store sizes) that the same engine can then
analyze with ordinary DataFrames.

Listener callbacks run on the driver's listener bus — they must never
block on Spark jobs, so the sink is a plain append of one small JSON
line per batch (no DataFrame work inside the callback).
"""

from __future__ import annotations

import json
import os


def attach_progress_listener(spark, out_path: str):
    """Attach a StreamingQueryListener appending one JSON line per
    micro-batch to ``out_path`` (queryName, batchId, numInputRows,
    processedRowsPerSecond, durationMs). Returns the listener (pass to
    ``spark.streams.removeListener`` to detach)."""
    from pyspark.sql.streaming import StreamingQueryListener

    class _ProgressToFile(StreamingQueryListener):
        def onQueryStarted(self, event):
            pass

        def onQueryProgress(self, event):
            p = event.progress
            rec = {
                "name": p.name,
                "batch_id": p.batchId,
                "num_input_rows": p.numInputRows,
                "rows_per_sec": p.processedRowsPerSecond,
                "duration_ms": dict(p.durationMs or {}),
                "timestamp": p.timestamp,
            }
            os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
            with open(out_path, "a") as f:
                f.write(json.dumps(rec) + "\n")

        def onQueryTerminated(self, event):
            pass

        def onQueryIdle(self, event):
            pass

    listener = _ProgressToFile()
    spark.streams.addListener(listener)
    return listener
