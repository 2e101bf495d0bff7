"""Profile the exactly-once micro-batch path: full durationMs
decomposition (addBatch / walCommit / commitOffsets / latestOffset /
queryPlanning / triggerExecution) for the tick pipeline vs the empty
foreachBatch floor at the reference 1-3-tick load shape. The r8
driver record read stream_mean_over_floor = 1.56 (acceptance <= 1.3,
third miss) — this is the numerator breakdown that decides where the
~84 ms/batch over floor actually goes."""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql.streaming import StreamingQueryListener

from stock_price_prediction_using_stream_and_batch_processing_spark import get_spark
from stock_price_prediction_using_stream_and_batch_processing_spark.sources.ticks import ticks_json_lines
from stock_price_prediction_using_stream_and_batch_processing_spark.streaming.pipeline import (
    file_tick_source,
    parse_ticks,
    run_tick_stream,
)


class FullDurListener(StreamingQueryListener):
    def __init__(self) -> None:
        self.progress: list[dict] = []

    def onQueryStarted(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        self.progress.append(dict(p.durationMs or {}))

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass


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


def decompose(progress: list[dict], skip: int = 5) -> dict:
    steady = progress[skip:] if len(progress) > skip + 5 else progress
    keys = set()
    for p in steady:
        keys |= set(p)
    out = {}
    for k in sorted(keys):
        vals = [p.get(k, 0) for p in steady]
        out[k] = round(sum(vals) / len(vals), 1) if vals else None
    out["n"] = len(steady)
    return out


def run_pipeline(spark, work, name, n=60, **kw):
    src = write_batches(work, name, [1 + (i % 3) for i in range(n)])
    lst = FullDurListener()
    spark.streams.addListener(lst)
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "1")
        q = run_tick_stream(
            spark,
            file_tick_source(spark, src, max_files_per_trigger=1),
            sink_path=f"{src}_sink",
            checkpoint_path=f"{src}_ckpt",
            driver_arrow_sink=True,
            driver_arrow_compute=True,
            **kw,
        )
        q.awaitTermination(300)
        deadline = time.time() + 10
        while len(lst.progress) < n and time.time() < deadline:
            time.sleep(0.2)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        spark.streams.removeListener(lst)
    return decompose(lst.progress)


def run_floor(spark, work, name, n=60):
    src = write_batches(work, name, [1 + (i % 3) for i in range(n)])
    lst = FullDurListener()
    spark.streams.addListener(lst)
    try:
        fq = (
            parse_ticks(file_tick_source(spark, src, max_files_per_trigger=1))
            .writeStream.outputMode("append")
            .option("checkpointLocation", f"{src}_ckpt")
            .foreachBatch(lambda df, eid: None)
            .trigger(availableNow=True)
            .start()
        )
        fq.awaitTermination(300)
        deadline = time.time() + 10
        while len(lst.progress) < n and time.time() < deadline:
            time.sleep(0.2)
    finally:
        spark.streams.removeListener(lst)
    return decompose(lst.progress)


def main() -> None:
    spark = get_spark(app_name="stream-profile")
    work = tempfile.mkdtemp(prefix="stream_profile_")
    spark.conf.set("spark.sql.streaming.fileSource.log.compactInterval", "1000")
    spark.conf.set("spark.sql.streaming.minBatchesToRetain", "20")
    try:
        # two warm streams (JIT per-batch machinery), untimed
        for w in ("warm_a", "warm_b"):
            run_pipeline(spark, work, w, n=40)
        print(json.dumps({"pipeline": run_pipeline(spark, work, "prof_pipe")}), flush=True)
        print(json.dumps({"floor": run_floor(spark, work, "prof_floor")}), flush=True)
        # second pair, order flipped, to see order effects
        print(json.dumps({"floor2": run_floor(spark, work, "prof_floor2")}), flush=True)
        print(json.dumps({"pipeline2": run_pipeline(spark, work, "prof_pipe2")}), flush=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
