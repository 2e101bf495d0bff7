#!/usr/bin/env python
"""Scale probe: replicate the sf0.1 corpus ~10x into a scratch dir
(fact tables scale, dimensions don't — the realistic growth shape) and
compare per-query wall time at 1x vs 10x on the same local cores.

Purpose: catch superlinear plans that sf0.1 hides (candidate-pair
blowups, accidental global sorts, broadcast misuse). With fixed
parallelism, a healthy query scales ~linearly (ratio ≈ 10, modulo fixed
overhead); anything way above that is a red flag to fix.

Usage: python scripts/scale_probe.py [factor] [out_dir] [q1,q2,...]
Writes results as markdown to stdout.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from stock_price_prediction_using_stream_and_batch_processing_spark import get_spark
from stock_price_prediction_using_stream_and_batch_processing_spark.plans.core import full_query_map
from stock_price_prediction_using_stream_and_batch_processing_spark.sources.tables import TABLES, load_table

BASE = "/root/testdata/sf0.1"

# Fact tables replicate with key/time offsets; dimensions stay fixed.
FACT_OFFSETS = {
    "events": {"id_cols": ["event_id"], "ts_cols": ["ts"]},
    "lineitem": {"id_cols": ["l_orderkey"], "ts_cols": []},
    "orders": {"id_cols": ["o_orderkey"], "ts_cols": []},
    "documents": {"id_cols": ["doc_id"], "ts_cols": []},
    "embeddings": {"id_cols": ["vec_id"], "ts_cols": []},
}

PROBE_QUERIES = [
    "pricing_summary",
    "revenue_by_nation",
    "trailing_mean_events",
    "sessionize_events",
    "tumbling_ohlc_events",
    "hopping_counts_events",
    "range_join_purchase_windows",
    "predict_next_events",
    "content_dedup_docs",
    "minhash_signatures_docs",
    "minhash_lsh_pairs_docs",
    "simhash_docs",
    "token_freq_top100",
    "cosine_topk_bruteforce",
    "salted_agg_by_type",
    "session_window_stats",
]


def build_scaled(spark, factor: int, out_dir: str, scale_tables: set[str] | None = None) -> None:
    os.makedirs(out_dir, exist_ok=True)
    for t in TABLES:
        dst = os.path.join(out_dir, f"{t}.parquet")
        if os.path.exists(dst):
            continue
        if t not in FACT_OFFSETS or (scale_tables is not None and t not in scale_tables):
            shutil.copy(os.path.join(BASE, f"{t}.parquet"), dst)
            continue
        df = load_table(spark, BASE, t)
        spec = FACT_OFFSETS[t]
        copies = []
        for i in range(factor):
            c = df
            for col in spec["id_cols"]:
                c = c.withColumn(col, F.col(col) + F.lit(i * 100_000_000))
            for col in spec["ts_cols"]:
                c = c.withColumn(col, F.col(col) + F.expr(f"INTERVAL {i * 31} DAYS"))
            copies.append(c)
        out = copies[0]
        for c in copies[1:]:
            out = out.unionByName(c)
        out.write.mode("overwrite").parquet(dst)


def time_query(qs, name, sf_dir) -> float:
    t0 = time.time()
    qs[name](None_or_spark, sf_dir).write.format("noop").mode("overwrite").save()
    return time.time() - t0


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out_dir = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/scale{factor}x"
    probe = sys.argv[3].split(",") if len(sys.argv) > 3 else PROBE_QUERIES
    scale_tables = set(sys.argv[4].split(",")) if len(sys.argv) > 4 else None
    global None_or_spark
    spark = None_or_spark = get_spark(app_name="scale-probe")
    build_scaled(spark, factor, out_dir, scale_tables)
    qs = full_query_map()
    # warm up codegen/scan paths once
    load_table(spark, out_dir, "events").count()
    print(f"| query | 1x (s) | {factor}x (s) | ratio |")
    print("|---|---|---|---|")
    for name in probe:
        base_t = min(time_query(qs, name, BASE) for _ in range(2))
        big_t = min(time_query(qs, name, out_dir) for _ in range(2))
        ratio = big_t / base_t if base_t > 0 else float("inf")
        print(f"| {name} | {base_t:.2f} | {big_t:.2f} | {ratio:.1f}x |")


if __name__ == "__main__":
    main()
