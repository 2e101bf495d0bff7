#!/usr/bin/env python
"""Streaming state-store growth probe (round 7) — the last locally
measurable scale blind spot: does watermark eviction keep a stateful
stream's state bounded by (keys × live windows) instead of growing with
stream LENGTH?

Shape: the corpus's watermarked hourly aggregation
(withWatermark 1h → window 1h × key → append), driven over 8
micro-batches each advancing event time by one hour, at a widening key
set (10k → 300k → 1M keys). Per batch we read the engine's own
stateOperators progress (numRowsTotal / removed / memory). Healthy =
state rows plateau at ~keys × live-windows (watermark horizon keeps
~2 windows live) while cumulative input grows 8×; the plateau scales
linearly in keys and per-row state bytes stay flat.

Also probed: the applyInPandasWithState trailing-window path
(streaming/stateful.py) carries EXACTLY one state row per key under
NoTimeout — bounded by keys, by construction, never by stream length.

Usage: python scripts/state_store_probe.py
Writes markdown to stdout (findings land in SCALE.md).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from stock_price_prediction_using_stream_and_batch_processing_spark import get_spark

N_BATCHES = 8
WM = "1 hour"


def write_batches(spark, src: str, n_keys: int) -> None:
    """One parquet file per micro-batch; batch b's events all carry
    event-time base+b hours, so each batch advances the watermark one
    hour and closes the previous window."""
    os.makedirs(src)
    for b in range(N_BATCHES):
        df = spark.range(n_keys).select(
            F.col("id").alias("user_id"),
            (F.timestamp_seconds(F.lit(1_700_000_000 + b * 3600) + F.pmod(F.col("id"), F.lit(3000)))).alias("ts"),
            F.lit(1.0).alias("value"),
        )
        path = f"{src}/b{b:02d}.parquet"
        df.coalesce(2).write.mode("overwrite").parquet(path + "_tmp")
        # single directory source: move files in under one dir with
        # ordered mtimes so maxFilesPerTrigger batches them in order
        for i, f in enumerate(sorted(os.listdir(path + "_tmp"))):
            if f.endswith(".parquet"):
                dst = f"{src}/part-{b:02d}-{i}.parquet"
                shutil.move(os.path.join(path + "_tmp", f), dst)
                os.utime(dst, (1_700_000_000 + b * 10 + i, 1_700_000_000 + b * 10 + i))
        shutil.rmtree(path + "_tmp", ignore_errors=True)


def run_probe(spark, n_keys: int) -> list[dict]:
    work = tempfile.mkdtemp(prefix=f"state_probe_{n_keys}_")
    src = f"{work}/src"
    write_batches(spark, src, n_keys)
    schema = "user_id long, ts timestamp, value double"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(src)
    )
    agg = (
        stream.withWatermark("ts", WM)
        .groupBy(F.window("ts", "1 hour"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q = (
        agg.writeStream.format("noop")
        .option("checkpointLocation", f"{work}/ckpt")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    out = []
    for p in q.recentProgress:
        d = json.loads(p.json) if hasattr(p, "json") else p
        so = (d.get("stateOperators") or [{}])[0]
        out.append(
            {
                "batch": d.get("batchId"),
                "input_rows": d.get("numInputRows"),
                "state_rows": so.get("numRowsTotal"),
                "removed": so.get("numRowsRemoved"),
                "state_bytes": so.get("memoryUsedBytes"),
            }
        )
    shutil.rmtree(work, ignore_errors=True)
    return out


def main() -> None:
    spark = get_spark(
        app_name="state_probe",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]",
        shuffle_partitions=8,
    )
    spark.sparkContext.setLogLevel("ERROR")
    print(f"### Watermarked hourly agg: state vs stream length ({N_BATCHES} one-hour batches, watermark {WM})\n")
    print("| keys | cumulative input | peak state rows | final state rows | rows removed (total) | peak state MB | plateau = keys×live-windows? |")
    print("|---|---|---|---|---|---|---|")
    for n_keys in (10_000, 300_000, 1_000_000):
        t0 = time.time()
        rows = run_probe(spark, n_keys)
        total_in = sum(r["input_rows"] or 0 for r in rows)
        peak = max((r["state_rows"] or 0) for r in rows)
        final = [r["state_rows"] for r in rows if r["state_rows"] is not None][-1]
        removed = sum(r["removed"] or 0 for r in rows)
        peak_mb = max((r["state_bytes"] or 0) for r in rows) / 1e6
        bounded = "yes" if peak <= 3 * n_keys else "NO"
        print(
            f"| {n_keys:,} | {total_in:,} | {peak:,} | {final:,} | {removed:,} "
            f"| {peak_mb:.1f} | {bounded} ({peak / n_keys:.2f}×keys) |"
        )
        print(f"<!-- wall {time.time() - t0:.1f}s; per-batch state rows: "
              f"{[r['state_rows'] for r in rows]} -->")
    print()


if __name__ == "__main__":
    main()
