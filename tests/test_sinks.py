"""Partitioned-sink layout tests: day partitioning, partition pruning
at read time, and within-file clustering (sources/sinks.py)."""

from __future__ import annotations

import os

import pytest

from stock_price_prediction_using_stream_and_batch_processing_spark.sources import sinks
from stock_price_prediction_using_stream_and_batch_processing_spark.sources.ticks import ticks_dataframe


@pytest.fixture(scope="module")
def table(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ticks") / "partitioned")
    # 3 days of ticks: step 3600s * 24 ticks/day
    df = ticks_dataframe(spark, 72, step_seconds=3600.0)
    sinks.write_partitioned_ticks(df, path)
    return path


def test_day_directories_exist(table):
    parts = sorted(d for d in os.listdir(table) if d.startswith("date="))
    assert parts == ["date=2024-01-01", "date=2024-01-02", "date=2024-01-03"]


def test_read_roundtrip_complete(spark, table):
    df = sinks.read_ticks(spark, table)
    assert df.count() == 72
    assert df.filter("price IS NULL OR timestamp IS NULL").count() == 0


def test_partition_pruning_in_plan(spark, table):
    df = sinks.read_ticks(spark, table).filter("date = DATE'2024-01-02'")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "2024-01-02" in plan
    assert df.count() == 24  # only that day's rows are read


def test_files_clustered_by_key_ts(spark, table):
    # within every parquet file, rows must be sorted by (symbol, ts) so
    # row-group min/max stats can skip pages.
    import pyarrow.parquet as pq

    day = os.path.join(table, "date=2024-01-01")
    files = [os.path.join(day, f) for f in os.listdir(day) if f.endswith(".parquet")]
    assert files
    for f in files:
        t = pq.read_table(f, columns=["symbol", "timestamp"]).to_pandas()
        assert list(t.itertuples(index=False)) == sorted(t.itertuples(index=False))


def test_append_mode_adds_new_days(spark, table):
    more = ticks_dataframe(spark, 24, step_seconds=3600.0).withColumn(
        "timestamp", __import__("pyspark").sql.functions.expr("timestamp + INTERVAL 3 DAYS")
    )
    sinks.write_partitioned_ticks(more, table)
    parts = sorted(d for d in os.listdir(table) if d.startswith("date="))
    assert "date=2024-01-04" in parts
    assert sinks.read_ticks(spark, table).count() == 96
