#!/usr/bin/env python
"""Round-9 scale probes for the operators added in rounds 7-8 (VERDICT
r8 ask #7): each probe pushes one axis an order of magnitude past what
the sf0.1 bench exercises and reports the shape of the cost/quality
curve, so the 100 TB argument is measured, not asserted.

1. hierarchy_flatten (pointer doubling): depth x breadth grid at fixed
   node count + one 5x node-count row. Healthy = wall grows with
   log2(depth) (the round count), ~linearly with nodes — never with
   depth itself.
2. bucketed co-located join: ingest (pay-the-shuffle-once bucketed
   write) vs query (Exchange-free SMJ) split at sf0.01 -> sf0.1 (10x).
   Healthy = both legs ~linear; query leg stays the small fraction.
3. python_datasource_ticks: shard-count sweep at fixed rows (parallel
   speedup of the per-row-Python source) + rows 8x at max shards.
4. linear counting (m=4096): estimate error vs true distinct as
   occupancy saturates. Documents the knee (error stays <2% to ~3x m,
   the estimator ceiling is -m ln(1/m) ~ 34k) — i.e. size m >= n/3 at
   deploy time, exactly what the 100 TB rollup would provision.
5. IVF recall at 10x corpus (sf0.1): per-query + joint recall@10 of
   the registered 16-cell/probe-4 configuration vs brute force, versus
   the registered invariant bounds (>=0.30 per query, >=0.45 joint).

Usage: python scripts/r9_scale_probes.py   (markdown to stdout;
findings land in SCALE.md)
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from stock_price_prediction_using_stream_and_batch_processing_spark import get_spark, release_query_scratch
from stock_price_prediction_using_stream_and_batch_processing_spark.operators.graph import ancestor_closure
from stock_price_prediction_using_stream_and_batch_processing_spark.sources.tables import load_table

SF001 = "/root/testdata/sf0.01"
SF01 = "/root/testdata/sf0.1"


def probe_hierarchy(spark) -> None:
    print("\n## 1. hierarchy_flatten: pointer-doubling depth x breadth grid\n")
    print("| nodes | depth | chains | rounds | wall s | max depth ok |")
    print("|---|---|---|---|---|---|")
    grid = [(200_000, 16), (200_000, 64), (200_000, 256), (1_000_000, 64)]
    for n_nodes, depth in grid:
        chains = n_nodes // depth
        parents = spark.range(chains * depth).select(
            F.col("id").alias("node"),
            F.when(F.col("id") % depth == 0, F.lit(None).cast("long"))
            .otherwise(F.col("id") - 1)
            .alias("parent"),
        )
        rounds = max(1, math.ceil(math.log2(depth)))
        t0 = time.time()
        out = ancestor_closure(parents, n_iter=rounds)
        stats = out.agg(
            F.count("*").alias("n"), F.max("depth").alias("maxd")
        ).head()
        wall = time.time() - t0
        ok = stats["n"] == chains * depth and stats["maxd"] == depth - 1
        print(f"| {n_nodes:,} | {depth} | {chains:,} | {rounds} | {wall:.2f} | {ok} |")
        release_query_scratch(spark)


def probe_bucketed_split(spark) -> None:
    print("\n## 2. bucketed co-located join: ingest vs query at 10x\n")
    import uuid

    from stock_price_prediction_using_stream_and_batch_processing_spark.plans.workdirs import fresh_result_dir
    from stock_price_prediction_using_stream_and_batch_processing_spark.sources.bucketed import save_bucketed

    print("| sf | orders rows | ingest s | query s | exchange-free |")
    print("|---|---|---|---|---|")
    for sf_dir, label in ((SF001, "0.01"), (SF01, "0.1")):
        suffix = uuid.uuid4().hex[:8]
        ot, ct = f"probe_ord_{suffix}", f"probe_cust_{suffix}"
        root = fresh_result_dir("r9_bucket_probe")
        orders = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey", "o_totalprice"
        )
        cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
        n = orders.count()
        t0 = time.time()
        save_bucketed(orders, ot, "o_custkey", n_buckets=8,
                      sort_cols=["o_custkey"], path=f"{root}/orders")
        save_bucketed(cust, ct, "c_custkey", n_buckets=8,
                      sort_cols=["c_custkey"], path=f"{root}/cust")
        ingest = time.time() - t0
        j = spark.table(ot).hint("merge").join(
            spark.table(ct), F.col("o_custkey") == F.col("c_custkey")
        ).select("o_orderkey", "c_mktsegment", "o_totalprice")
        plan = j._jdf.queryExecution().executedPlan().toString()
        xfree = "Exchange" not in plan
        t0 = time.time()
        j.write.format("noop").mode("overwrite").save()
        query = time.time() - t0
        print(f"| {label} | {n:,} | {ingest:.2f} | {query:.2f} | {xfree} |")
        for t in (ot, ct):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
        release_query_scratch(spark)


def probe_pysource_shards(spark) -> None:
    print("\n## 3. python_datasource_ticks: shard-count scaling\n")
    from stock_price_prediction_using_stream_and_batch_processing_spark.sources.pysource import (
        SyntheticTicksDataSource,
    )

    try:
        spark.dataSource.register(SyntheticTicksDataSource)
    except Exception:
        pass  # already registered in this session
    print("| rows | shards | wall s | sum ok |")
    print("|---|---|---|---|")
    rows = 1_000_000
    # closed-form check: sum(price) = 100n + 0.25 * sum(i % 97)
    def want_sum(n: int) -> float:
        full, rem = divmod(n, 97)
        return 100.0 * n + 0.25 * (full * (96 * 97 // 2) + rem * (rem - 1) // 2)

    for n, shards in ((rows, 1), (rows, 4), (rows, 16), (rows, 32), (8 * rows, 32)):
        t0 = time.time()
        got = (
            spark.read.format("synthetic_ticks")
            .option("rows", n).option("partitions", shards).load()
            .agg(F.sum("price").alias("s")).head()["s"]
        )
        wall = time.time() - t0
        print(f"| {n:,} | {shards} | {wall:.2f} | {abs(got - want_sum(n)) < 1e-6} |")
        release_query_scratch(spark)


def probe_linear_count_saturation(spark) -> None:
    print("\n## 4. linear counting (m=4096): occupancy saturation\n")
    print("| true distinct | occupied | estimate | rel err | load n/m |")
    print("|---|---|---|---|---|")
    m = 4096
    for n in (500, 1_000, 2_000, 4_000, 8_000, 12_000, 20_000, 34_000, 60_000):
        est_row = (
            spark.range(n)
            .select(
                (F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 8), 16, 10)
                 .cast("long") % m).alias("bucket")
            )
            .agg(F.countDistinct("bucket").alias("occ"))
            .select(
                "occ",
                (-float(m) * F.log(1.0 - F.least(F.col("occ"), F.lit(m - 1)) / float(m)))
                .alias("est"),
            )
            .head()
        )
        occ, est = est_row["occ"], est_row["est"]
        rel = abs(est - n) / n
        print(f"| {n:,} | {occ:,} | {est:,.0f} | {rel:.3f} | {n/m:.2f} |")
        release_query_scratch(spark)


def probe_ivf_recall_10x(spark) -> None:
    print("\n## 5. IVF recall@10 at 10x corpus (sf0.1)\n")
    from stock_price_prediction_using_stream_and_batch_processing_spark.operators import similarity

    e = load_table(spark, SF01, "embeddings")
    n = e.count()
    q = e.filter(F.col("vec_id") < 5).select(F.col("vec_id").alias("q_id"), "embedding")
    t0 = time.time()
    bf = similarity.brute_force_topk(e, q, k=10).select("q_id", "vec_id")
    ivf = similarity.ivf_topk(e, q, k=10, dim=64, n_cells=16, n_probe=4).select(
        "q_id", "vec_id", F.lit(1).alias("hit")
    )
    rec = (
        bf.join(ivf, ["q_id", "vec_id"], "left")
        .groupBy("q_id")
        .agg((F.sum(F.coalesce("hit", F.lit(0))) / F.count(F.lit(1))).alias("recall"))
        .orderBy("q_id")
        .collect()
    )
    wall = time.time() - t0
    joint = sum(r["recall"] for r in rec) / len(rec)
    print(f"corpus = {n:,} vectors; wall {wall:.1f}s")
    print("\n| q_id | recall@10 | >= 0.30 bound |")
    print("|---|---|---|")
    for r in rec:
        print(f"| {r['q_id']} | {r['recall']:.2f} | {r['recall'] >= 0.30} |")
    print(f"\njoint recall = {joint:.3f} (registered bound >= 0.45: {joint >= 0.45})")
    release_query_scratch(spark)


def main() -> None:
    spark = get_spark(app_name="r9-scale-probes")
    print("# Round-9 scale probes (r7/r8 operators)")
    probe_hierarchy(spark)
    probe_bucketed_split(spark)
    probe_pysource_shards(spark)
    probe_linear_count_saturation(spark)
    probe_ivf_recall_10x(spark)
    spark.stop()


if __name__ == "__main__":
    main()
