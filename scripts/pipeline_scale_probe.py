#!/usr/bin/env python
"""r13: scaling curve of the composed LLM curation pipeline
(pipeline_docs_end_to_end) across the three test SFs — the check that
the chain's cost is linear in the corpus, not quadratic in any stage
(LSH buckets, candidate pairs, packing windows are all bounded designs).

Usage: python scripts/pipeline_scale_probe.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from stock_price_prediction_using_stream_and_batch_processing_spark import (
    get_spark,
    release_query_scratch,
)
from stock_price_prediction_using_stream_and_batch_processing_spark.plans.core import _REGISTRY


def main() -> None:
    spark = get_spark(app_name="pipeline-scale")
    spark.sparkContext.setLogLevel("ERROR")
    fn = _REGISTRY["pipeline_docs_end_to_end"].fn
    print("| sf | docs in | rows out | warm s | s per 1k docs |")
    print("|---|---|---|---|---|")
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        d = f"/root/testdata/{sf}"
        n_in = spark.read.parquet(os.path.join(d, "documents.parquet")).count()
        fn(spark, d).write.format("noop").mode("overwrite").save()  # warmup
        release_query_scratch(spark)
        best = None
        for _ in range(2):
            t0 = time.time()
            df = fn(spark, d)
            df.write.format("noop").mode("overwrite").save()
            el = time.time() - t0
            best = el if best is None or el < best else best
            release_query_scratch(spark)
        n_out = fn(spark, d).count()
        release_query_scratch(spark)
        print(
            f"| {sf} | {n_in} | {n_out} | {best:.2f} | "
            f"{best / (n_in / 1000):.2f} |"
        )


if __name__ == "__main__":
    main()
