#!/usr/bin/env python
"""Benchmark harness: runs the headline query corpus at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

Each query is materialized with the noop sink (full execution, no
collect/driver transfer — measures the engine, not the pickle).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from stock_price_prediction_using_stream_and_batch_processing_spark import get_spark, plans

# Representative spread: scan-agg, joins, windows, inference, text,
# dedup, vectors, streaming.
HEADLINE = [
    "pricing_summary",
    "scan_filter_project",
    "revenue_by_nation",
    "top_parts_by_revenue",
    "join_orders_customer_segment",
    "trailing_mean_events",
    "sliding60_mean_events",
    "tumbling_ohlc_events",
    "sessionize_events",
    "hopping_counts_events",
    "range_join_purchase_windows",
    "asof_join_purchase_error",
    "predict_next_events",
    "vwap_lineitem",
    "dedup_exact_events",
    "content_dedup_docs",
    "doc_quality",
    "token_freq_top100",
    "minhash_signatures_docs",
    "simhash_docs",
    "cosine_topk_bruteforce",
    "media_feature_stats",
    "stream_hourly_counts",
]


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    spark = get_spark(app_name="bench")

    # JVM/codegen warmup (not timed): touch each table once.
    from stock_price_prediction_using_stream_and_batch_processing_spark.sources.tables import TABLES, load_table

    for t in TABLES:
        load_table(spark, sf_dir, t).count()

    times: dict[str, float] = {}
    for name in HEADLINE:
        q = plans.get(name)
        t0 = time.time()
        df = q.fn(spark, sf_dir)
        materialize(df)
        times[name] = round(time.time() - t0, 3)
        print(f"# {name}: {times[name]:.2f}s", file=sys.stderr)

    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_corpus_runtime",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
