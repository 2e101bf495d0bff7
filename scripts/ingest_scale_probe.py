#!/usr/bin/env python
"""r13 streaming-ingest throughput probe (VERDICT r12 ask #7): the
connector chain (snapshot table -> snapshot_changes CDC source ->
fenced MERGE into a serving table) at 10x the sf0.1 events volume
(1M rows), plus the OCC commit ceiling under concurrent writers.

Synthetic data, local tmp dirs; prints one markdown table per probe.
Usage: python scripts/ingest_scale_probe.py
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from stock_price_prediction_using_stream_and_batch_processing_spark import get_spark
from stock_price_prediction_using_stream_and_batch_processing_spark.operators import snapshots as snap
from stock_price_prediction_using_stream_and_batch_processing_spark.sources.snapshot_source import (
    register_snapshot_changes,
)

ROWS_10X = 1_000_000  # 10x events @ sf0.1
N_COMMITS = 10


def probe_chain(spark, base):
    """End-to-end: 10 commits x 100k rows -> CDC stream -> fenced MERGE."""
    print("\n## Connector chain at 10x events (1M rows, 10 commits)\n")
    src = os.path.join(base, "src")
    serve = os.path.join(base, "serve")
    per = ROWS_10X // N_COMMITS
    t0 = time.time()
    for i in range(N_COMMITS):
        df = spark.range(i * per, (i + 1) * per).select(
            F.col("id").alias("k"), (F.col("id") % 97).cast("double").alias("v")
        )
        snap.snapshot_append(spark, src, df.repartition(8), stats_cols=["k"])
    build_s = time.time() - t0

    register_snapshot_changes(spark)
    batch_times = []

    def fold(bdf, bid):
        t = time.time()
        snap.snapshot_merge(
            spark, serve, bdf, key="k", writer_id="etl", batch_id=bid
        )
        batch_times.append(time.time() - t)

    # seed the serving table so MERGE has a declared schema from batch 0
    snap.snapshot_append(
        spark, serve,
        spark.range(0, 0).select(F.col("id").alias("k"), F.lit(0.0).alias("v")),
        stats_cols=["k"],
    )
    t0 = time.time()
    q = (
        spark.readStream.format("snapshot_changes")
        .option("table_dir", src)
        .load()
        .writeStream.foreachBatch(fold)
        .option("checkpointLocation", os.path.join(base, "ck"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    q.awaitTermination()
    stream_s = time.time() - t0
    n = snap.read_snapshot(spark, serve).count()
    assert n == ROWS_10X, n
    mean_b = sum(batch_times) / len(batch_times)
    print("| stage | value |")
    print("|---|---|")
    print(f"| source build (10 appends, 1M rows) | {build_s:.1f} s |")
    print(f"| stream drain (CDC -> fenced MERGE) | {stream_s:.1f} s |")
    print(f"| sustained chain throughput | {ROWS_10X / stream_s:,.0f} rows/s |")
    print(f"| micro-batches | {len(batch_times)} |")
    print(f"| mean MERGE commit | {mean_b*1000:.0f} ms |")
    print(
        f"| per-commit overhead vs data write | see concurrent probe |"
    )


def probe_occ(spark, base):
    """Concurrent appenders into ONE table: where the OCC rebase loop
    becomes the ceiling. Each thread pre-stages its frames, then the
    commit storm runs; rebase retries are counted via a _publish
    wrapper."""
    print("\n## OCC commit ceiling under concurrent writers\n")
    print("| writers | commits | wall_s | commits/s | rows/s | rebase retries/commit |")
    print("|---|---|---|---|---|---|")
    per_batch = 20_000
    batches_each = 6
    for n_writers in (1, 3, 6):
        d = os.path.join(base, f"occ{n_writers}")
        retries = [0]
        orig_publish = snap._publish

        def counting_publish(table_dir, version, s, _o=orig_publish, _r=retries):
            try:
                return _o(table_dir, version, s)
            except snap.ConcurrentCommitError:
                _r[0] += 1
                raise

        snap._publish = counting_publish
        errs = []

        def writer(wid):
            try:
                for b in range(batches_each):
                    lo = (wid * batches_each + b) * per_batch
                    df = spark.range(lo, lo + per_batch).select(
                        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
                    )
                    snap.snapshot_append(spark, d, df, stats_cols=["k"])
            except Exception as e:  # surface, don't swallow
                errs.append(e)

        t0 = time.time()
        threads = [
            threading.Thread(target=writer, args=(w,)) for w in range(n_writers)
        ]
        for th in threads:
            th.start()
        for th in threads:
            th.join()
        wall = time.time() - t0
        snap._publish = orig_publish
        if errs:
            raise errs[0]
        commits = n_writers * batches_each
        assert snap.current_version(d) == commits
        assert snap.read_snapshot(spark, d).count() == commits * per_batch
        print(
            f"| {n_writers} | {commits} | {wall:.1f} | {commits/wall:.2f} | "
            f"{commits*per_batch/wall:,.0f} | {retries[0]/commits:.2f} |"
        )


def main():
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    base = tempfile.mkdtemp(prefix="ingest_probe_")
    try:
        probe_chain(spark, base)
        probe_occ(spark, base)
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
