#!/usr/bin/env python
"""Giant-key window probe: the single-key shape where a plain per-key
row window CANNOT parallelize (the whole key lands in one task's sort)
vs ``bucketed_trailing_mean`` which splits it by coarse time bucket.

Fixture: 10M rows, ONE key, 1 Hz ticks. Measures wall time AND the max
single-task duration of each variant's window stage (via the Spark UI
REST API) — the max-task number is the point: at 100 TB the plain
window's one task IS the job, while the bucketed variant's longest task
is ~1/B of it.

Usage: python scripts/giant_key_probe.py [n_rows] [bucket_seconds]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from stock_price_prediction_using_stream_and_batch_processing_spark import get_spark
from stock_price_prediction_using_stream_and_batch_processing_spark.operators import windows

N_ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
BUCKET_S = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000  # ~100 buckets
N = 5  # trailing window length


def ui_json(spark, path: str):
    port = spark.sparkContext.uiWebUrl.rsplit(":", 1)[1]
    app = spark.sparkContext.applicationId
    url = f"http://localhost:{port}/api/v1/applications/{app}{path}"
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read())


def max_task_ms(spark, group: str) -> int | None:
    """Max single-task duration (ms) across all stages of the jobs run
    under the given job group."""
    jobs = ui_json(spark, "/jobs")
    stage_ids = sorted(
        {s for j in jobs if j.get("jobGroup") == group for s in j.get("stageIds", [])}
    )
    worst = None
    for sid in stage_ids:
        try:
            summ = ui_json(spark, f"/stages/{sid}/0/taskSummary?quantiles=1.0")
            dur = summ.get("duration", [None])[-1]
            if dur is not None:
                worst = dur if worst is None or dur > worst else worst
        except Exception:
            continue  # skipped/failed stage attempts
    return int(worst) if worst is not None else None


def run(spark, label: str, df) -> dict:
    sc = spark.sparkContext
    sc.setJobGroup(label, label)
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    wall = time.time() - t0
    sc.setJobGroup("", "")
    mt = max_task_ms(spark, label)
    out = {
        "variant": label,
        "wall_s": round(wall, 2),
        "max_task_ms": mt,
    }
    print(json.dumps(out))
    return out


def main() -> None:
    # UI must be on: max-task durations come from its REST API
    spark = get_spark(app_name="giant_key_probe", extra_conf={"spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")

    base = (
        spark.range(N_ROWS)
        .select(
            F.lit("GIANT").alias("k"),
            F.col("id").alias("i"),
            F.timestamp_seconds(F.col("id")).alias("ts"),
            (F.sin(F.col("id").cast("double")) * 100).alias("v"),
        )
        # materialize the fixture once so generation cost isn't measured
        .localCheckpoint(eager=True)
    )

    plain = windows.trailing_mean(base, "k", "ts", "v", N, tiebreak="i")
    bucketed = windows.bucketed_trailing_mean(
        base, "k", "ts", "v", N, bucket_seconds=BUCKET_S, tiebreak="i"
    )

    r_plain = run(spark, "plain_trailing_mean", plain)
    r_bucketed = run(spark, "bucketed_trailing_mean", bucketed)

    # correctness spot-check on the same fixture (sampled agreement)
    a = plain.select("i", F.round("trailing_mean", 6).alias("m"))
    b = bucketed.select("i", F.round("trailing_mean", 6).alias("m2"))
    diff = a.join(b, "i").filter(F.col("m") != F.col("m2")).count()
    print(json.dumps({
        "n_rows": N_ROWS,
        "bucket_seconds": BUCKET_S,
        "n_buckets": N_ROWS // BUCKET_S,
        "mismatched_rows": diff,
        "speedup_wall": round(r_plain["wall_s"] / r_bucketed["wall_s"], 2),
        "max_task_ratio": (
            round(r_plain["max_task_ms"] / r_bucketed["max_task_ms"], 2)
            if r_plain["max_task_ms"] and r_bucketed["max_task_ms"] else None
        ),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
