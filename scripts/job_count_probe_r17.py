#!/usr/bin/env python
"""Spark-job-count evidence for the r17 fused-round claims: run the
iterative operators inside a job group and report how many Spark jobs
the driver scheduled (statusTracker.getJobIdsForGroup). Diagnostic
only; output committed as plans/r17/round_job_counts.txt."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from stock_price_prediction_using_stream_and_batch_processing_spark import get_spark
from stock_price_prediction_using_stream_and_batch_processing_spark.operators import dedup, graph
from stock_price_prediction_using_stream_and_batch_processing_spark.sources.tables import load_table


def count_jobs(spark, tag, fn):
    sc = spark.sparkContext
    sc.setJobGroup(tag, tag)
    try:
        fn()
    finally:
        sc.setJobGroup("", "")
    n = len(sc.statusTracker().getJobIdsForGroup(tag))
    print(f"{tag}: {n} jobs")
    return n


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark(app_name="job_count_probe_r17")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    a, b = li.alias("a"), li.alias("b")
    edges = (
        a.join(b, (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
               & (F.col("a.l_partkey") < F.col("b.l_partkey")))
        .select(F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst"))
        .distinct()
    )
    pairs = dedup.minhash_lsh_pairs(docs, "text", "doc_id")

    count_jobs(spark, "warm_pairs", lambda: pairs.count())
    count_jobs(
        spark, "dedup_clusters",
        lambda: dedup.dedup_clusters(pairs).write.format("noop").mode("overwrite").save(),
    )
    count_jobs(
        spark, "dedup_clusters_doubling",
        lambda: dedup.dedup_clusters_doubling(pairs).write.format("noop").mode("overwrite").save(),
    )
    count_jobs(
        spark, "k_core_k2",
        lambda: graph.k_core(edges, 2).write.format("noop").mode("overwrite").save(),
    )


if __name__ == "__main__":
    main()
