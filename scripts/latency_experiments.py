"""Micro-batch latency experiments (round 4): how close can the tick
stream get to the Structured Streaming machinery floor, and how much of
the floor itself is avoidable?

Levers tried (each at the reference load shape: 1-3-tick micro-batches):
  A. availableNow backlog (current bench shape) — baseline.
  B. processingTime=0 live trigger (the reference consumer is a forever
     loop, so this is the faithful shape).
  C. B + asyncProgressTrackingEnabled (offset/commit logs written
     asynchronously — at-least-once, exactly what the reference's
     unfenced loop provides).

Prints one JSON line per variant.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from stock_price_prediction_using_stream_and_batch_processing_spark import get_spark
from stock_price_prediction_using_stream_and_batch_processing_spark.sources.ticks import (
    ticks_json_lines,
)
from stock_price_prediction_using_stream_and_batch_processing_spark.streaming.metrics import (
    BatchMetricsListener,
)
from stock_price_prediction_using_stream_and_batch_processing_spark.streaming.pipeline import (
    file_tick_source,
    parse_ticks,
    run_tick_stream,
)

N_BATCHES = 100
WARMUP = 5


def write_batches(work: str, name: str, sizes: list[int]) -> str:
    src = f"{work}/{name}"
    os.makedirs(src)
    lines = ticks_json_lines(sum(sizes))
    at = 0
    for i, sz in enumerate(sizes):
        p = f"{src}/part-{i:03d}.json"
        with open(p, "w") as f:
            f.write("\n".join(lines[at : at + sz]))
        os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))
        at += sz
    return src


def steady_mean(durs: list[float]) -> float | None:
    s = durs[WARMUP:] if len(durs) > 2 * WARMUP else durs
    return round(sum(s) / len(s), 1) if s else None


def measure(spark, label, start_query, n_batches=N_BATCHES):
    """Run a stream over the pre-staged backlog until n_batches progress
    events (or timeout), then stop and summarize steady-state latency."""
    listener = BatchMetricsListener()
    spark.streams.addListener(listener)
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "1")
    try:
        q = start_query()
        deadline = time.time() + 240
        while time.time() < deadline:
            with_rows = [p for p in listener.progress if p["duration_ms"] is not None]
            if len(with_rows) >= n_batches:
                break
            time.sleep(0.1)
        q.stop()
        q.awaitTermination(30)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        spark.streams.removeListener(listener)
    durs = [p["duration_ms"] for p in listener.progress if p["duration_ms"] is not None]
    out = {
        "variant": label,
        "n_batches": len(durs),
        "mean_ms": steady_mean(durs),
        "min_ms": min(durs) if durs else None,
        "max_ms": max(durs[WARMUP:]) if len(durs) > WARMUP else None,
    }
    print(json.dumps(out))
    return out


def main() -> None:
    spark = get_spark(app_name="latency_exp")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="latexp_")
    sizes = [1 + (i % 3) for i in range(N_BATCHES)]
    try:
        # A. availableNow backlog, real pipeline (current bench shape)
        src_a = write_batches(work, "avnow", sizes)
        measure(
            spark,
            "A_availableNow_pipeline",
            lambda: run_tick_stream(
                spark,
                file_tick_source(spark, src_a, max_files_per_trigger=1),
                sink_path=f"{src_a}_sink",
                checkpoint_path=f"{src_a}_ckpt",
            ),
        )

        # A floor: availableNow, empty foreachBatch
        src_af = write_batches(work, "avnow_floor", sizes)
        measure(
            spark,
            "A_availableNow_floor",
            lambda: (
                parse_ticks(file_tick_source(spark, src_af, max_files_per_trigger=1))
                .writeStream.outputMode("append")
                .option("checkpointLocation", f"{src_af}_ckpt")
                .foreachBatch(lambda df, eid: None)
                .trigger(availableNow=True)
                .start()
            ),
        )

        # B. live processingTime=0 trigger over the same backlog
        src_b = write_batches(work, "live", sizes)
        measure(
            spark,
            "B_processingTime_pipeline",
            lambda: run_tick_stream(
                spark,
                file_tick_source(spark, src_b, max_files_per_trigger=1),
                sink_path=f"{src_b}_sink",
                checkpoint_path=f"{src_b}_ckpt",
                available_now=False,
            ),
        )

        # C. live trigger + async progress tracking (at-least-once: the
        # offset WAL and commit log leave the hot path; on failure the
        # stream replays from the last async-flushed offset — the same
        # semantics as the reference's unfenced consumer loop).
        src_c = write_batches(work, "async", sizes)

        def start_async():
            parsed = parse_ticks(file_tick_source(spark, src_c, max_files_per_trigger=1))
            return (
                parsed.writeStream.outputMode("append")
                .option("checkpointLocation", f"{src_c}_ckpt")
                .option("asyncProgressTrackingEnabled", "true")
                .option("asyncProgressTrackingCheckpointIntervalMs", "1000")
                .foreachBatch(lambda df, eid: None)
                .start()
            )

        measure(spark, "C_async_floor", start_async)

        # C2: async + the real pipeline body
        src_c2 = write_batches(work, "async_pipe", sizes)

        def start_async_pipe():
            from stock_price_prediction_using_stream_and_batch_processing_spark.streaming.pipeline import (
                run_tick_stream as rts,
            )

            return rts(
                spark,
                file_tick_source(spark, src_c2, max_files_per_trigger=1),
                sink_path=f"{src_c2}_sink",
                checkpoint_path=f"{src_c2}_ckpt",
                available_now=False,
                async_progress=True,
            )

        try:
            measure(spark, "C2_async_pipeline", start_async_pipe)
        except TypeError:
            print(json.dumps({"variant": "C2_async_pipeline", "err": "no async_progress param yet"}))
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
