"""Giant-key bucketed trailing window: must be row-for-row IDENTICAL to
the plain per-key row window (only the physical partitioning changes),
including across bucket boundaries, empty buckets (time gaps), and
sparse buckets holding fewer than n-1 rows."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stock_price_prediction_using_stream_and_batch_processing_spark.operators import windows


def _collect(df):
    return {
        (r.k, r.i): r.m
        for r in df.select("k", "i", F.round("trailing_mean", 9).alias("m")).collect()
    }


@pytest.fixture(scope="module")
def skewed(spark):
    """One giant key (95% of rows, dense seconds) + small keys, plus a
    planted multi-bucket GAP and a sparse bucket (single row) for the
    carry edge cases. Bucket size in tests: 100 s."""
    big = spark.range(4000).select(
        F.lit("GIANT").alias("k"),
        F.col("id").alias("i"),
        # dense region, then a gap of ~12 buckets, then a sparse tail:
        # rows 0..3949 at 1 Hz; 3950..3959 spaced 250 s apart (several
        # buckets with exactly 1 row, several empty in between)
        F.when(F.col("id") < 3950, F.col("id")).otherwise(
            F.lit(3950) + (F.col("id") - 3950) * 250 + F.lit(1200)
        ).cast("double").alias("sec"),
        (F.sin(F.col("id").cast("double")) * 100).alias("v"),
    )
    small = spark.range(200).select(
        F.concat(F.lit("s"), (F.col("id") % 5)).alias("k"),
        (F.col("id") + 100000).alias("i"),
        (F.col("id") * 3).cast("double").alias("sec"),
        F.col("id").cast("double").alias("v"),
    )
    df = big.unionByName(small).select(
        "k", "i", F.timestamp_seconds("sec").alias("ts"), "v"
    )
    return df.cache()


def test_bucketed_equals_plain_window(skewed):
    plain = windows.trailing_mean(skewed, "k", "ts", "v", 5, tiebreak="i")
    bucketed = windows.bucketed_trailing_mean(
        skewed, "k", "ts", "v", 5, bucket_seconds=100, tiebreak="i"
    )
    a, b = _collect(plain), _collect(bucketed)
    assert a == b
    assert len(a) == 4200


def test_bucketed_partitions_by_bucket(skewed):
    """The point of the operator: the window sort runs per (key, bucket),
    never per key — visible as the extra _b column in the partitioning."""
    bucketed = windows.bucketed_trailing_mean(
        skewed, "k", "ts", "v", 5, bucket_seconds=100, tiebreak="i"
    )
    plan = bucketed._jdf.queryExecution().executedPlan().toString()
    assert "_b" in plan  # window partition key includes the bucket


def test_bucketed_window_larger_than_bucket(spark):
    """n-1 carry spanning MANY past buckets: n=7 with 2-row buckets means
    every window crosses at least two bucket boundaries."""
    df = spark.range(40).select(
        F.lit("K").alias("k"),
        F.col("id").alias("i"),
        F.timestamp_seconds(F.col("id") * 5).alias("ts"),  # 2 rows per 10s bucket
        (F.col("id") * 1.0).alias("v"),
    )
    plain = windows.trailing_mean(df, "k", "ts", "v", 7, tiebreak="i")
    bucketed = windows.bucketed_trailing_mean(
        df, "k", "ts", "v", 7, bucket_seconds=10, tiebreak="i"
    )
    assert _collect(plain) == _collect(bucketed)
