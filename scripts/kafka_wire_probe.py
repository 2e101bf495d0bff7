#!/usr/bin/env python
"""Phase attribution for kafka_wire_parse_events (VERDICT r16 ask #5):
replicate the face step by step with wall timers so its ~2.8 s is
attributable — framing write, streaming replay, final projection.
Diagnostic only."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from stock_price_prediction_using_stream_and_batch_processing_spark import get_spark, release_query_scratch
from stock_price_prediction_using_stream_and_batch_processing_spark.sources.tables import load_table
from stock_price_prediction_using_stream_and_batch_processing_spark.streaming.pipeline import parse_ticks
from stock_price_prediction_using_stream_and_batch_processing_spark.plans.streamplans import _run_stream_to_memory
from stock_price_prediction_using_stream_and_batch_processing_spark.plans.workdirs import fresh_result_dir


def build_framed(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    cents = F.pmod(F.abs(F.col("event_id") * 37 + 11), F.lit(100000))
    price_str = F.concat(
        F.floor(cents / F.lit(100)).cast("long").cast("string"),
        F.lit("."),
        F.lpad(F.pmod(cents, F.lit(100)).cast("string"), 2, "0"),
    )
    good = F.concat(
        F.lit('{"symbol":"'), F.col("event_type"),
        F.lit('","timestamp":"'), F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss"),
        F.lit('","price":'), price_str,
        F.lit(',"volume":'), F.col("event_id").cast("string"),
        F.lit("}"),
    )
    value_str = F.when(
        F.pmod(F.abs(F.col("event_id")), F.lit(97)) == 0, F.lit('{"symbol":')
    ).otherwise(good)
    return ev.select(
        F.encode(F.col("user_id").cast("string"), "UTF-8").alias("key"),
        F.encode(value_str, "UTF-8").alias("value"),
        F.lit("stock_ticks").alias("topic"),
        F.pmod(F.abs(F.col("user_id")), F.lit(8)).cast("int").alias("partition"),
        F.col("event_id").cast("long").alias("offset"),
        F.col("ts").alias("timestamp"),
        F.lit(0).alias("timestampType"),
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="kafka_wire_probe")
    load_table(spark, sf_dir, "events").count()

    n_coalesce = int(os.environ.get("KWP_COALESCE", "0"))
    for run in range(3):
        t = {}
        t0 = time.time()
        framed = build_framed(spark, sf_dir)
        wire_dir = fresh_result_dir("kwp_wire")
        w = framed.coalesce(n_coalesce) if n_coalesce else framed
        w.write.parquet(wire_dir)
        t["frame_write"] = time.time() - t0

        t0 = time.time()
        raw = spark.readStream.schema(framed.schema).parquet(wire_dir)
        parsed = parse_ticks(raw, keep_cols=("topic", "partition", "offset", "key"))
        mode = os.environ.get("KWP_MODE", "memory")
        if mode == "memory":
            name = _run_stream_to_memory(parsed, "kwp", "append")
        else:  # floor: same stream, noop-materializing foreachBatch
            import uuid as _uuid
            name = None
            prev = spark.conf.get("spark.sql.shuffle.partitions")
            spark.conf.set("spark.sql.shuffle.partitions", "8")
            try:
                q = (
                    parsed.writeStream.outputMode("append")
                    .foreachBatch(lambda df, eid: df.write.format("noop").mode("overwrite").save())
                    .option("checkpointLocation", fresh_result_dir("kwp_ckpt"))
                    .trigger(availableNow=True)
                    .start()
                )
                q.awaitTermination()
            finally:
                spark.conf.set("spark.sql.shuffle.partitions", prev)
        t["stream_run"] = time.time() - t0
        prog = q.recentProgress if mode != "memory" else None
        if name is not None:
            # re-fetch the query progress from the active-run bookkeeping
            pass
        if prog:
            for p in prog:
                print(json.dumps({"batch": p["batchId"], "rows": p["numInputRows"],
                                  "durationMs": p["durationMs"]}))

        if name is None:
            t["total"] = sum(t.values())
            release_query_scratch(spark)
            print(json.dumps({f"run{run}": {k: round(v, 3) for k, v in t.items()}}))
            continue
        t0 = time.time()
        out = spark.table(name).select(
            "topic",
            F.col("partition").cast("int").alias("part_id"),
            F.col("offset").cast("long").alias("msg_offset"),
            F.decode("key", "UTF-8").alias("user_key"),
            "symbol",
            F.date_format("timestamp", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
            "price",
            F.col("volume").cast("long").alias("volume"),
        )
        out.write.format("noop").mode("overwrite").save()
        t["final_project"] = time.time() - t0
        t["total"] = sum(t.values())
        release_query_scratch(spark)
        print(json.dumps({f"run{run}": {k: round(v, 3) for k, v in t.items()}}))


if __name__ == "__main__":
    main()
