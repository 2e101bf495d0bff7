#!/usr/bin/env python
"""Pin down WHAT holds ~5.5 GB of driver heap by the time the
alphabetical sf0.1 sweep reaches triangle_counts_parts (which then runs
150-190 s vs 4-6 s fresh — r7/r10 outlier; a GC-every-10-queries A/B
already exonerated collectable garbage).

Replays the sweep prefix (every registered query alphabetically before
triangle, same run_check + release_query_scratch harness), then:
  1. jcmd GC.class_histogram on the JVM → top retained classes
  2. times triangle as-is
  3. spark.catalog.clearCache() + System.gc() → times triangle again

Usage: python scripts/triangle_heap_probe.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from stock_price_prediction_using_stream_and_batch_processing_spark import get_spark, plans
from stock_price_prediction_using_stream_and_batch_processing_spark.session import release_query_scratch


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="triangle-heap-probe")
    spark.sparkContext.setLogLevel("ERROR")
    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests")
    )
    from oracle_check import run_check

    names = sorted(plans.all_queries(include_extended=True))
    idx = names.index("triangle_counts_parts")
    t0 = time.time()
    for n in names[:idx]:
        try:
            run_check(spark, n, sf_dir)
        except Exception as exc:  # noqa: BLE001
            print(json.dumps({"q": n, "err": str(exc)[:120]}), flush=True)
            release_query_scratch(spark)
    print(json.dumps({"prefix_queries": idx, "prefix_s": round(time.time() - t0, 1)}), flush=True)

    jvm_rt = spark.sparkContext._jvm.java.lang.Runtime.getRuntime()
    used = lambda: int((jvm_rt.totalMemory() - jvm_rt.freeMemory()) / 1048576)  # noqa: E731
    print(json.dumps({"heap_mb_before_histo": used()}), flush=True)

    # THIS session's JVM pid, asked of the JVM itself — pgrep would
    # grab an arbitrary pyspark-shell if another session is running
    pid = str(spark.sparkContext._jvm.java.lang.ProcessHandle.current().pid())
    histo = subprocess.run(
        ["jcmd", pid, "GC.class_histogram"], capture_output=True, text=True
    ).stdout.splitlines()
    for line in histo[:35]:
        print(line, flush=True)

    q = plans.get("triangle_counts_parts")
    t0 = time.time()
    q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    print(json.dumps({"triangle_late_session_s": round(time.time() - t0, 2), "heap_mb": used()}), flush=True)
    release_query_scratch(spark)

    spark.catalog.clearCache()
    spark.sparkContext._jvm.java.lang.System.gc()
    t0 = time.time()
    q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    print(json.dumps({"triangle_after_clearcache_s": round(time.time() - t0, 2), "heap_mb": used()}), flush=True)


if __name__ == "__main__":
    main()
