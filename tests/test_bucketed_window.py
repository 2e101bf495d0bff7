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
    never per key — the Window exec node computing the trailing mean must
    list BOTH the key and the bucket column in its partition spec."""
    import re

    bucketed = windows.bucketed_trailing_mean(
        skewed, "k", "ts", "v", 5, bucket_seconds=100, tiebreak="i"
    )
    plan = bucketed._jdf.queryExecution().executedPlan().toString()
    # The avg-over-frame window node: windowspecdefinition(k#.., _b#.., ...)
    avg_windows = [
        line for line in plan.splitlines()
        if "windowspecdefinition" in line and "avg(" in line
    ]
    assert avg_windows, f"no avg window node in plan:\n{plan}"
    assert any(
        re.search(r"windowspecdefinition\(k#\d+[L]?,\s*_b#\d+L?", line)
        for line in avg_windows
    ), f"avg window not partitioned by (k, _b):\n" + "\n".join(avg_windows)


def test_bucketed_n1_short_circuit(spark):
    """n=1 must not crash (F.slice(arr, 0, 0) raises) — trailing mean of
    one row is the value itself."""
    df = spark.range(10).select(
        F.lit("K").alias("k"),
        F.col("id").alias("i"),
        F.timestamp_seconds(F.col("id")).alias("ts"),
        (F.col("id") * 2.0).alias("v"),
    )
    plain = windows.trailing_mean(df, "k", "ts", "v", 1, tiebreak="i")
    bucketed = windows.bucketed_trailing_mean(
        df, "k", "ts", "v", 1, bucket_seconds=5, tiebreak="i"
    )
    assert _collect(plain) == _collect(bucketed)


def test_bucketed_preserves_existing_b_column(spark):
    """An input that already has columns named _b/_carry must come
    through untouched — internal names are collision-safe."""
    df = spark.range(20).select(
        F.lit("K").alias("k"),
        F.col("id").alias("i"),
        F.timestamp_seconds(F.col("id")).alias("ts"),
        (F.col("id") * 1.0).alias("v"),
        (F.col("id") % 3).alias("_b"),
        F.lit("keepme").alias("_carry"),
    )
    res = windows.bucketed_trailing_mean(
        df, "k", "ts", "v", 3, bucket_seconds=7, tiebreak="i"
    )
    assert "_b" in res.columns and "_carry" in res.columns
    rows = res.select("i", "_b", "_carry", "trailing_mean").collect()
    assert all(r["_carry"] == "keepme" for r in rows)
    assert {(r["i"], r["_b"]) for r in rows} == {(i, i % 3) for i in range(20)}
    plain = windows.trailing_mean(
        df.drop("_b", "_carry"), "k", "ts", "v", 3, tiebreak="i"
    )
    assert _collect(res) == _collect(plain)


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


def test_twap_zero_duration_buckets_dropped(spark):
    """time_weighted_average: weights are seconds-to-next-tick within
    the (key, bucket); the last tick carries no weight; a bucket whose
    only content is one tick (or co-instant ticks) has zero total
    duration and is DROPPED, never emitted as NULL/inf."""
    import datetime as dt

    from pyspark.sql import functions as F

    from stock_price_prediction_using_stream_and_batch_processing_spark.operators import windows

    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)
    rows = [
        # user 1, hour 10: 10.0 held 60s, then 20.0 held 120s, then 99.0 (no weight)
        (1, t0, 10.0, 1),
        (1, t0 + dt.timedelta(seconds=60), 20.0, 2),
        (1, t0 + dt.timedelta(seconds=180), 99.0, 3),
        # user 1, hour 11: single tick -> zero duration -> dropped
        (1, t0 + dt.timedelta(hours=1), 7.0, 4),
        # user 2, hour 10: two co-instant ticks -> zero duration -> dropped
        (2, t0, 5.0, 5),
        (2, t0, 6.0, 6),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "value", "event_id"])
    out = windows.time_weighted_average(
        df, "user_id", "ts", "value", bucket="hour", tiebreak="event_id"
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r["user_id"] == 1 and r["n_segments"] == 2
    assert abs(r["twap"] - (10.0 * 60 + 20.0 * 120) / 180) < 1e-12
