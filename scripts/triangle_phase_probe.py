#!/usr/bin/env python
"""Decompose the late-sweep triangle_counts_parts inflation by phase.

Replays the alphabetical sweep prefix (every registered query before
triangle through the sweep's own run_check harness), then times the
four phases of triangle's run_check separately:
  build   — q.fn(spark, sf_dir)   (includes the eager auto-select sizing job)
  spark   — .toPandas()           (the distributed query itself)
  duck    — fresh duck connection + oracle SQL
  compare — compare_frames

Fresh-session baseline: run_check(triangle) = 27-33 s; the r10 sweeps
read 150-193 s at this position. Whichever phase carries the
difference is the real mechanism.

Usage: python scripts/triangle_phase_probe.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from stock_price_prediction_using_stream_and_batch_processing_spark import get_spark, plans
from stock_price_prediction_using_stream_and_batch_processing_spark.session import release_query_scratch


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="triangle-phase-probe")
    spark.sparkContext.setLogLevel("ERROR")
    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests")
    )
    from oracle_check import compare_frames, duck_connection, run_check

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

    q = plans.get("triangle_counts_parts")
    out = {}
    t = time.time()
    df = q.fn(spark, sf_dir)
    out["build_s"] = round(time.time() - t, 2)
    t = time.time()
    actual = df.toPandas()
    out["spark_s"] = round(time.time() - t, 2)
    release_query_scratch(spark)
    t = time.time()
    con = duck_connection(sf_dir)
    expected = con.execute(q.oracle).fetchdf()
    con.close()
    out["duck_s"] = round(time.time() - t, 2)
    t = time.time()
    problems = compare_frames(actual, expected)
    out["compare_s"] = round(time.time() - t, 2)
    out["problems"] = problems[:2]
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
