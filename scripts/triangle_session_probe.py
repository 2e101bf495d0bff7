#!/usr/bin/env python
"""Isolate WHAT a long session accretes that inflates
triangle_counts_parts 40x (192.9 s in the r10 sf0.1 sweep vs 4.4-6.4 s
fresh — the r7/r10 late-session outlier, reproduced with
release_query_scratch already in place).

Levers tested, in order, same session:
  1. fresh-session triangle baseline
  2. run the 13 stream_* queries (triangle's alphabetical predecessors
     in the sweep — streaming machinery state is suspect #1), with the
     sweep's own release_query_scratch between each → re-time triangle
  3. StateStore.stop() (unload every loaded state-store provider and
     its maintenance thread) → re-time triangle
  4. driver System.gc() (lets the ContextCleaner actually reclaim
     GC'd broadcast/shuffle references) → re-time triangle

Usage: python scripts/triangle_session_probe.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from stock_price_prediction_using_stream_and_batch_processing_spark import get_spark
from stock_price_prediction_using_stream_and_batch_processing_spark.session import release_query_scratch
from stock_price_prediction_using_stream_and_batch_processing_spark.plans import core


def time_query(spark, sf_dir, name):
    q = core._REGISTRY[name]
    t0 = time.time()
    q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    dt = time.time() - t0
    release_query_scratch(spark)
    return round(dt, 2)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="triangle-session-probe")
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__  # noqa: F401  (registers every query)

    out = {"sf_dir": sf_dir}
    out["triangle_fresh_s"] = time_query(spark, sf_dir, "triangle_counts_parts")

    streams = sorted(n for n in core._REGISTRY if n.startswith("stream_"))
    t0 = time.time()
    for n in streams:
        time_query(spark, sf_dir, n)
    out["n_stream_queries"] = len(streams)
    out["stream_block_s"] = round(time.time() - t0, 2)
    out["triangle_after_streams_s"] = time_query(spark, sf_dir, "triangle_counts_parts")

    jvm = spark.sparkContext._jvm
    jvm.org.apache.spark.sql.execution.streaming.state.StateStore.stop()
    out["triangle_after_statestore_stop_s"] = time_query(
        spark, sf_dir, "triangle_counts_parts"
    )

    jvm.java.lang.System.gc()
    out["triangle_after_system_gc_s"] = time_query(spark, sf_dir, "triangle_counts_parts")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
