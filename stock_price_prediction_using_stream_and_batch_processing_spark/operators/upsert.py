"""Upsert (MERGE) into a parquet table of record.

Plain parquet has no transactional MERGE (that's Delta/Iceberg
territory), but the batch upsert pattern is still expressible safely:
read the affected slice, anti-join out rows whose key is being
replaced, union the updates, materialize, and overwrite — scoped to
ONLY the partitions the updates touch when the table is
time-partitioned (sources/sinks.py layout), so a day of late data
rewrites a day, not 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def merge_into_parquet(
    spark: SparkSession,
    target_path: str,
    updates: DataFrame,
    key_cols: list[str],
    partition_col: str | None = None,
) -> int:
    """Upsert ``updates`` into the parquet table at ``target_path``:
    rows matching on ``key_cols`` are replaced, new keys are inserted.
    Returns the number of rows written.

    With ``partition_col`` (the table's partitionBy column), only the
    partitions present in ``updates`` are read and rewritten (dynamic
    partition overwrite); untouched partitions' files are not touched.

    The merged slice is MATERIALIZED (localCheckpoint) before the
    overwrite — Spark cannot lazily read a path it is overwriting."""
    target = spark.read.parquet(target_path)
    if partition_col is not None:
        parts = [r[0] for r in updates.select(partition_col).distinct().collect()]
        slice_df = target.filter(F.col(partition_col).isin(parts))
    else:
        slice_df = target
    kept = slice_df.join(updates.select(*key_cols).distinct(), key_cols, "left_anti")
    merged = kept.unionByName(updates.select(*kept.columns)).localCheckpoint(eager=True)
    n = merged.count()
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        writer = merged.write.mode("overwrite")
        if partition_col is not None:
            writer = writer.partitionBy(partition_col)
        writer.parquet(target_path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    return n
