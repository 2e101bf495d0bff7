"""Regression tests for the round-4 review findings: snapshot-diff
encoding injectivity, chunked gapfill grids, and the partitioned
sketch-store layout."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from stock_price_prediction_using_stream_and_batch_processing_spark.operators import sketches
from stock_price_prediction_using_stream_and_batch_processing_spark.operators import windows as W
from stock_price_prediction_using_stream_and_batch_processing_spark.operators.upsert import snapshot_diff
from stock_price_prediction_using_stream_and_batch_processing_spark.sources.tables import load_table


def test_snapshot_diff_delimiter_and_sentinel_safe(spark):
    """Review finding: delimiter-style encodings collide when cell
    values shift across the boundary. Length-prefixing must catch both
    the shifted-boundary case and the NULL-vs-lookalike case."""
    old = spark.createDataFrame([(1, "ab", "c")], "k long, s string, t string")
    new = spark.createDataFrame([(1, "a", "bc")], "k long, s string, t string")
    assert [r["change_type"] for r in snapshot_diff(old, new, ["k"]).collect()] == ["changed"]
    old2 = spark.createDataFrame([(1, None)], "k long, s string")
    new2 = spark.createDataFrame([(1, "N")], "k long, s string")
    assert [r["change_type"] for r in snapshot_diff(old2, new2, ["k"]).collect()] == ["changed"]


def test_gapfill_chunked_grid_wide_span(spark):
    """A sparse key spanning several grid chunks must produce the full
    dense grid (no single giant sequence array; chunk boundaries must
    not drop or duplicate buckets)."""
    span = W._GRID_CHUNK * 3 + 17
    df = spark.createDataFrame(
        [("k", 30.0, 1.0), ("k", float(span * 60 + 30), 9.0)], ["k", "sec", "v"]
    ).select("k", F.timestamp_seconds("sec").alias("ts"), "v")
    out = W.gapfill_locf(df, "k", "ts", "v", bucket_seconds=60)
    n = out.count()
    assert n == span + 1
    agg = out.agg(
        F.sum(F.col("gap_filled").cast("int")).alias("gaps"),
        F.countDistinct("bucket").alias("nb"),
        F.min("bucket").alias("b0"),
        F.max("bucket").alias("b1"),
    ).collect()[0]
    assert agg["gaps"] == span - 1 and agg["nb"] == n
    assert agg["b1"] - agg["b0"] == span


def test_refresh_hll_fine_partitioned_layout(spark, tmp_path):
    store = str(tmp_path / "sk")
    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    sketches.refresh_hll_fine(spark, store, ev, "ts", "user_id")
    # physically partitioned by UTC date
    assert any(d.startswith("part_date=") for d in os.listdir(store)), os.listdir(store)
    # layout mismatch is an error, not silent corruption
    with pytest.raises(ValueError, match="partitioned"):
        sketches.refresh_hll_fine(spark, store, ev, "ts", "user_id", partition_col=None)
