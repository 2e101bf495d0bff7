"""Streaming metrics via StreamingQueryListener — replaces the
reference's driver-side Python lists + prints (``stream_consumer.py:48,
77-79,105-112``) with the engine-native progress feed, so metrics work
identically on a cluster."""

from __future__ import annotations

from pyspark.sql.streaming import StreamingQueryListener


class BatchMetricsListener(StreamingQueryListener):
    """Collects per-micro-batch durations and row counts."""

    def __init__(self) -> None:
        self.progress: list[dict] = []

    def onQueryStarted(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        self.progress.append(
            {
                "batch_id": p.batchId,
                "num_input_rows": p.numInputRows,
                "duration_ms": (p.durationMs or {}).get("triggerExecution"),
            }
        )

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    def summary(self) -> dict:
        durs = [p["duration_ms"] for p in self.progress if p["duration_ms"] is not None]
        rows = sum(p["num_input_rows"] for p in self.progress)
        return {
            "n_batches": len(self.progress),
            "total_rows": rows,
            "min_ms": min(durs) if durs else None,
            "mean_ms": sum(durs) / len(durs) if durs else None,
            "max_ms": max(durs) if durs else None,
        }
