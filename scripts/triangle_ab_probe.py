#!/usr/bin/env python
"""In-bench-protocol A/B of the triangle closing-edge join strategies
(VERDICT r9 #8): same session shape as bench.py (get_spark, table
warmup, noop materialize, min-of-N), broadcast probe vs shuffle join
timed INTERLEAVED so neither side owns the warmer half of the session.

Usage: python scripts/triangle_ab_probe.py [sf_dir] [n_rounds]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from stock_price_prediction_using_stream_and_batch_processing_spark import get_spark
from stock_price_prediction_using_stream_and_batch_processing_spark.operators import graph
from stock_price_prediction_using_stream_and_batch_processing_spark.sources.tables import TABLES, load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark(app_name="triangle-ab")
    for t in TABLES:
        load_table(spark, sf_dir, t).count()

    def part_edges():
        li = (
            load_table(spark, sf_dir, "lineitem")
            .select("l_orderkey", "l_partkey")
            .distinct()
        )
        a, b = li.alias("a"), li.alias("b")
        return (
            a.join(b, (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
                   & (F.col("a.l_partkey") < F.col("b.l_partkey")))
            .select(F.col("a.l_partkey").alias("a"), F.col("b.l_partkey").alias("b"))
            .distinct()
        )

    def run(broadcast):
        df = graph.triangle_counts(part_edges(), broadcast_edges=broadcast)
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        return time.time() - t0

    # one untimed warmup each (codegen), then interleaved timed rounds
    run(True); run(False)
    times = {"broadcast": [], "shuffle": []}
    for _ in range(n):
        times["broadcast"].append(run(True))
        times["shuffle"].append(run(False))
    out = {
        "sf_dir": sf_dir,
        "broadcast_runs": [round(x, 2) for x in times["broadcast"]],
        "shuffle_runs": [round(x, 2) for x in times["shuffle"]],
        "broadcast_min": round(min(times["broadcast"]), 2),
        "shuffle_min": round(min(times["shuffle"]), 2),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
