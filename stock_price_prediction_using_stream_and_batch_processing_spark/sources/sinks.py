"""Batch sinks — the durable-table layout story.

The reference persisted raw ticks to MySQL over JDBC (append, no
partitioning, no checkpoint — ``stream_consumer.py:61-69``). At 100 TB
the table of record is time-partitioned Parquet: writes land in
``date=YYYY-MM-DD/`` directories, reads with a time predicate prune
whole partitions before any IO (PartitionFilters in the scan), and
within each partition files are sorted by (key, ts) so row-group min/max
statistics skip pages for key-selective scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned_ticks(
    df: DataFrame,
    path: str,
    ts: str = "timestamp",
    key: str = "symbol",
    mode: str = "append",
    target_file_rows: int | None = None,
) -> None:
    """Write ticks time-partitioned by day, clustered by (key, ts)
    within files.

    ``repartition(to_date(ts))`` puts each day in few shuffle partitions
    (avoiding the many-small-files explosion of one file per task per
    day), and ``sortWithinPartitions`` gives row groups monotone
    (key, ts) ranges for min/max skipping."""
    out = df.withColumn("date", F.to_date(F.col(ts)))
    out = out.repartition(F.col("date")).sortWithinPartitions(key, ts)
    writer = out.write.mode(mode).partitionBy("date")
    writer.parquet(path)


def read_ticks(spark: SparkSession, path: str) -> DataFrame:
    """Read the partitioned table; a filter on ``date`` (or on the ts
    column via an explicit date predicate) prunes partitions at plan
    time — verify with PartitionFilters in `.explain`."""
    return spark.read.parquet(path)
