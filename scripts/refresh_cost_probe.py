#!/usr/bin/env python
"""Maintenance-cost probe: does `refresh_ohlc_fine`'s per-batch merge
cost stay O(batch + affected partitions) as the materialized bar table's
HISTORY grows — the claim that makes a continuous aggregate viable at
100 TB (a refresh that rescans or rewrites history would quietly become
a full-table job as the table ages)?

Shape: bootstrap a date-partitioned hourly-bar store covering N days of
synthetic ticks (one bootstrap refresh), then time a ONE-DAY late batch
merged into it. Repeat for growing N. The late batch always touches one
date partition, so a healthy refresh is ~flat in N; an O(history)
refresh grows linearly.

Also probes the incremental NEAR-DUP index the same way: admit K
equal-size document batches in sequence and print each batch's
admission time — the store (bands/shingles/sizes digests) grows by one
batch per step, so a healthy slope is ~flat and an O(store) scan shows
as monotonic growth.

Usage: python scripts/refresh_cost_probe.py
Writes markdown to stdout.
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
from stock_price_prediction_using_stream_and_batch_processing_spark.sources.tables import load_table


def synth_ticks(spark, n_days: int, per_day: int = 20_000, symbols: int = 50, day0: int = 0):
    """Deterministic ticks: per_day rows/day across `symbols` keys.
    Epoch anchor 1_699_920_000 is midnight-UTC-aligned so a synthetic
    day maps to exactly one calendar date partition."""
    n = n_days * per_day
    return (
        spark.range(n)
        .select(
            F.concat(F.lit("S"), (F.col("id") % symbols).cast("string")).alias("symbol"),
            F.timestamp_seconds(
                F.lit(1_699_920_000) + (F.lit(day0) + F.col("id") / per_day).cast("long") * 86_400
                + (F.col("id") % per_day) * (86_400 // per_day)
            ).alias("timestamp"),
            (F.pmod(F.hash("id") / 1e6, F.lit(100.0)) + 100.0).alias("price"),
            F.col("id").alias("seq"),
        )
    )


def probe_ohlc(spark) -> None:
    print("### refresh_ohlc_fine: 1-day late batch vs history size\n")
    print("| history (days) | bootstrap rows | merge wall (s) |")
    print("|---|---|---|")
    for n_days in (5, 20, 80):
        store = tempfile.mkdtemp(prefix=f"refresh_probe_{n_days}d_")
        shutil.rmtree(store, ignore_errors=True)
        boot = synth_ticks(spark, n_days)
        refresh_ohlc_fine(
            spark, store, boot, key="symbol", ts="timestamp", value="price",
            seq="seq", duration="1 hour",
        )
        late = synth_ticks(spark, 1, day0=n_days // 2)  # mid-history late day
        t0 = time.time()
        refresh_ohlc_fine(
            spark, store, late, key="symbol", ts="timestamp", value="price",
            seq="seq", duration="1 hour",
        )
        dt = time.time() - t0
        print(f"| {n_days} | {n_days * 20_000} | {dt:.2f} |")
        shutil.rmtree(store, ignore_errors=True)


def probe_near_dup(spark) -> None:
    print("\n### incremental_near_dup: per-batch admission vs store size\n")
    docs = load_table(spark, "/root/testdata/sf0.1", "documents").localCheckpoint()
    store = tempfile.mkdtemp(prefix="inc_nd_probe_")
    shutil.rmtree(store, ignore_errors=True)
    k = 8
    print("| batch # | store docs before | admit wall (s) |")
    print("|---|---|---|")
    admitted_total = 0
    for b in range(k):
        batch = docs.filter(F.pmod(F.col("doc_id"), F.lit(k)) == b)
        t0 = time.time()
        n = dedup.incremental_near_dup(spark, batch, store, num_hashes=8, bands=4).count()
        dt = time.time() - t0
        print(f"| {b} | {admitted_total} | {dt:.2f} |")
        admitted_total += n
    shutil.rmtree(store, ignore_errors=True)


def main() -> None:
    spark = get_spark(app_name="refresh-cost-probe")
    spark.sparkContext.setLogLevel("ERROR")
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        probe_ohlc(spark)
        probe_near_dup(spark)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


if __name__ == "__main__":
    main()
