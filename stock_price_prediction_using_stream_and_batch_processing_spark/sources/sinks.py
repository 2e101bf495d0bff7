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

import os

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
    (key, ts) ranges for min/max skipping. ``target_file_rows`` caps
    rows per output file (``maxRecordsPerFile``) so a hot day still
    splits into scan-parallel files."""
    out = df.withColumn("date", F.to_date(F.col(ts)))
    out = out.repartition(F.col("date")).sortWithinPartitions(key, ts)
    writer = out.write.mode(mode).partitionBy("date")
    if target_file_rows is not None:
        writer = writer.option("maxRecordsPerFile", target_file_rows)
    writer.parquet(path)


def read_ticks(spark: SparkSession, path: str) -> DataFrame:
    """Read the partitioned table; a filter on ``date`` (or on the ts
    column via an explicit date predicate) prunes partitions at plan
    time — verify with PartitionFilters in `.explain`."""
    return spark.read.parquet(path)


def compact(spark: SparkSession, path: str, partition_col: str | None = None, target_partitions: int = 1) -> int:
    """Small-files compaction: rewrite a (possibly epoch-fragmented)
    parquet dir into ``target_partitions`` files per partition value.
    Streaming sinks accrete one small file per micro-batch per task —
    at scale, scan cost becomes file-open-bound; periodic compaction
    restores big-file scans. Materializes (localCheckpoint) before
    overwriting the path it read. Returns the row count."""
    df = spark.read.parquet(path).localCheckpoint(eager=True)
    n = df.count()
    if partition_col is not None and partition_col in df.columns:
        out = df.repartition(target_partitions, F.col(partition_col))
        out.write.mode("overwrite").partitionBy(partition_col).parquet(path)
    else:
        df.drop("_epoch").coalesce(target_partitions).write.mode("overwrite").parquet(path)
    return n


def expire_partitions(
    spark: SparkSession,
    path: str,
    partition_col: str,
    keep_values: list,
    allow_drop_all: bool = False,
) -> list:
    """Retention (TTL): drop partitions whose value is NOT in
    ``keep_values``. The partitionBy layout is path-addressable
    (``col=value/`` dirs), so expiry is a directory delete per expired
    partition — surviving partitions' files are untouched and no data
    is rewritten. Returns the partition values dropped.

    Values are compared as STRINGS (the same text the directory names
    carry): the column reads back typed (datetime.date for a DateType
    partition) while callers naturally pass the directory text, and a
    raw Python ``in`` across those types matches NOTHING — which would
    silently expire every partition. Same-typed values stringify
    identically, so the normalization is semantics-preserving. As a
    second fence, dropping EVERY present partition (keep_values matched
    nothing) raises unless ``allow_drop_all=True`` — a full wipe is far
    more likely a mis-typed keep list than intent."""
    import shutil

    df = spark.read.parquet(path)
    present = [r[0] for r in df.select(partition_col).distinct().collect()]
    keep = {str(v) for v in keep_values}
    drop = [v for v in present if str(v) not in keep]
    if drop and len(drop) == len(present) and not allow_drop_all:
        raise ValueError(
            f"expire_partitions would drop ALL {len(present)} partitions of {path} "
            f"(keep_values matched none of the present values, e.g. {present[:3]!r}); "
            "pass allow_drop_all=True if a full wipe is intended"
        )
    for v in drop:
        # path-addressable layout (partitionBy writes value-named dirs)
        d = os.path.join(path, f"{partition_col}={v}")
        if os.path.isdir(d):
            shutil.rmtree(d)
    return drop
