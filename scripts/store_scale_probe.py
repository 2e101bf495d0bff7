#!/usr/bin/env python
"""Decade-further maintenance probes (round 6): push the two
incremental stores one order of magnitude past the round-5 probes, to
the sizes where the semi-join prune and the band-bucket fan-in are
actually exercised:

- `refresh_ohlc_fine`: a ONE-DAY late batch merged into a bar store
  whose history grows to 365 days (7.3M ticks bootstrapped, 10× the
  round-5 probe). Healthy = flat merge wall vs history.

- `incremental_near_dup`: equal 5k-doc batches admitted while the
  digest store grows 0 → ~50k admitted docs (12× the round-5 probe).
  The synthetic corpus is deterministic md5-token text, pairwise
  distinct so the store genuinely grows; 2% of every later batch are
  one-token perturbations of batch-0 docs, so the new×store match path
  (candidates → Jaccard → drop) runs on every step. Run with the
  registered query's max_bucket_size=64 wiring. Healthy = flat admit
  wall vs store size.

Usage: python scripts/store_scale_probe.py
Writes markdown to stdout (findings land in SCALE.md).
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from stock_price_prediction_using_stream_and_batch_processing_spark import get_spark
from stock_price_prediction_using_stream_and_batch_processing_spark.operators import dedup
from stock_price_prediction_using_stream_and_batch_processing_spark.operators.windows import (
    refresh_ohlc_fine,
)
from scripts.refresh_cost_probe import synth_ticks


def probe_ohlc_365(spark) -> None:
    print("### refresh_ohlc_fine: 1-day late batch vs history, to 365 days\n")
    print("| history (days) | bootstrap rows | merge wall (s) |")
    print("|---|---|---|")
    for n_days in (80, 365):
        store = tempfile.mkdtemp(prefix=f"store_probe_{n_days}d_")
        shutil.rmtree(store, ignore_errors=True)
        boot = synth_ticks(spark, n_days)
        refresh_ohlc_fine(
            spark, store, boot, key="symbol", ts="timestamp", value="price",
            seq="seq", duration="1 hour",
        )
        late = synth_ticks(spark, 1, day0=n_days // 2)
        t0 = time.time()
        refresh_ohlc_fine(
            spark, store, late, key="symbol", ts="timestamp", value="price",
            seq="seq", duration="1 hour",
        )
        dt = time.time() - t0
        print(f"| {n_days} | {n_days * 20_000:,} | {dt:.2f} |", flush=True)
        shutil.rmtree(store, ignore_errors=True)


def synth_docs(spark, n: int, id0: int = 0, tokens: int = 40):
    """``n`` pairwise-distinct synthetic docs: 40 md5-derived hex
    tokens each, seeded by doc id — near-zero cross-doc Jaccard, so
    every doc is admissible and the store grows by a full batch per
    step."""
    return spark.range(id0, id0 + n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(1), F.lit(tokens)),
                lambda j: F.substring(
                    F.md5(F.concat_ws(":", F.col("id").cast("string"), j.cast("string"))), 1, 8
                ),
            ),
        ).alias("text"),
    )


def probe_near_dup_50k(spark) -> None:
    print("\n### incremental_near_dup: admission vs store, to ~50k admitted docs\n")
    store = tempfile.mkdtemp(prefix="store_probe_nd_")
    shutil.rmtree(store, ignore_errors=True)
    batch_n = 5_000
    k = 10
    print("| batch # | store docs before | planted dups dropped | admit wall (s) |")
    print("|---|---|---|---|")
    admitted_total = 0
    for b in range(k):
        fresh = synth_docs(spark, batch_n, id0=b * 100_000)
        if b > 0:
            # 2% of the batch: one-token perturbations of batch-0 docs
            # (ids unique per batch) -> must hit the store and be dropped
            dup_n = batch_n // 50
            dups = synth_docs(spark, dup_n, id0=0).select(
                (F.col("doc_id") + b * 100_000 + 50_000).alias("doc_id"),
                F.concat(F.col("text"), F.lit(f" extra{b}tok")).alias("text"),
            )
            batch = fresh.unionByName(dups)
        else:
            dup_n = 0
            batch = fresh
        batch = batch.localCheckpoint()  # time admission, not synthesis
        t0 = time.time()
        n = dedup.incremental_near_dup(
            spark, batch, store, num_hashes=8, bands=4, max_bucket_size=64
        ).count()
        dt = time.time() - t0
        dropped = (batch_n + dup_n) - n
        print(f"| {b} | {admitted_total:,} | {dropped}/{dup_n} | {dt:.2f} |", flush=True)
        admitted_total += n
    shutil.rmtree(store, ignore_errors=True)


def main() -> None:
    spark = get_spark(app_name="store-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        probe_ohlc_365(spark)
        probe_near_dup_50k(spark)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


if __name__ == "__main__":
    main()
