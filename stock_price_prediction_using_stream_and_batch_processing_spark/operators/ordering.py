"""Scalable total ordering: a distributed global row number.

``row_number() OVER (ORDER BY …)`` with no PARTITION BY collapses the
whole table into ONE task's sort — the canonical "works at sf0.01, dies
at 100 TB" plan. The training-data pipeline needs a total order anyway
(deterministic global shuffle of a corpus into training order), so this
implements the classic two-phase scheme:

1. range-repartition + sort within partitions on the order key
   (Spark's sample-based RangePartitioner — each partition an
   independent external sort);
2. count rows per partition (tiny aggregate), prefix-sum the counts on
   the driver-side-sized grid, broadcast the offsets back;
3. rank = partition offset + within-partition row_number (the window is
   per-partition, so no second global sort).

The repartitioned frame is localCheckpoint'd: RangePartitioner samples
its boundaries, so recomputing it between the count pass and the rank
pass could move rows across partitions and corrupt the offsets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


from .maintenance import free_name as _free_name  # shared (also windows.py)


def global_row_number(
    df: DataFrame,
    order_cols: list[Column | str],
    out: str = "rn",
    num_partitions: int | None = None,
) -> DataFrame:
    """Total-order row number (1-based) without a single-partition sort.

    ``order_cols`` must be a TOTAL order (include a unique tiebreak
    column) — otherwise ties straddling a partition boundary make the
    rank nondeterministic.
    """
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    pid_col = _free_name("_pid", df.columns)
    off_col = _free_name("_off", df.columns)

    parts = num_partitions or df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    ranged = (
        df.repartitionByRange(int(parts), *cols)
        .sortWithinPartitions(*cols)
        .withColumn(pid_col, F.spark_partition_id())
        .localCheckpoint(eager=False)
    )

    counts = ranged.groupBy(pid_col).agg(F.count(F.lit(1)).alias("_n"))
    w_off = Window.orderBy(pid_col).rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        F.col(pid_col),
        F.coalesce(F.sum("_n").over(w_off), F.lit(0)).alias(off_col),
    )

    w_in = Window.partitionBy(pid_col).orderBy(*cols)
    return (
        ranged.join(F.broadcast(offsets), pid_col)
        .withColumn(out, F.col(off_col) + F.row_number().over(w_in))
        .drop(pid_col, off_col)
    )


def hashkey_row_number(
    df: DataFrame,
    hex_key_col: str,
    order_cols: list[Column | str],
    out: str = "rn",
    bucket_bits: int = 5,
) -> DataFrame:
    """Total-order row number specialized for HASH sort keys (fixed-width
    lowercase-hex strings, e.g. md5) — the deterministic-global-shuffle
    case. Hash keys are uniform, so the range boundaries don't need
    sampling: bucket = top ``bucket_bits`` bits of the key's 32-bit
    prefix, a MONOTONE function of the key (equal-prefix keys share a
    bucket, bucket order == key order). That removes BOTH costs of the
    general ``global_row_number``: no sampling job and no
    localCheckpoint (recomputing the frame can't move rows between
    buckets — the assignment is pure column algebra).

    ``order_cols`` must start with the hex key and end with a unique
    tiebreak. Plan: one count pass (map-side combined on 2^bucket_bits
    groups), broadcast prefix offsets, one shuffle on the bucket for the
    per-bucket external-sorted row_number.
    """
    from ..functions.hashing import hex32_to_long

    if not 1 <= bucket_bits <= 31:
        raise ValueError(f"bucket_bits must be in [1, 31], got {bucket_bits}")
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    b_col = _free_name("_b", df.columns)
    off_col = _free_name("_off", df.columns)

    bucket = F.shiftright(hex32_to_long(F.col(hex_key_col)), 32 - bucket_bits)
    keyed = df.withColumn(b_col, bucket)

    counts = keyed.groupBy(b_col).agg(F.count(F.lit(1)).alias("_n"))
    w_off = Window.orderBy(b_col).rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        F.col(b_col),
        F.coalesce(F.sum("_n").over(w_off), F.lit(0)).alias(off_col),
    )

    w_in = Window.partitionBy(b_col).orderBy(*cols)
    return (
        keyed.join(F.broadcast(offsets), b_col)
        .withColumn(out, F.col(off_col) + F.row_number().over(w_in))
        .drop(b_col, off_col)
    )
