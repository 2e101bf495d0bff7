"""Distributed prefix aggregation (scan): a GLOBAL running sum in a
total order without ever sorting the table through one task.

The naive Spark spelling — ``SUM(x) OVER (ORDER BY ...)`` with no
PARTITION BY — moves the ENTIRE table into a single partition and runs
the scan on one core; at 100 TB that is the plan that never finishes.
This operator is the classic two-phase parallel scan instead:

1. ``repartitionByRange`` on the order columns — each partition holds a
   contiguous key range, partition ids ascend with the order (AQE
   coalescing merges only adjacent ranges, preserving monotonicity).
2. A per-partition local prefix sum (window keyed on
   ``spark_partition_id()`` — every partition scans in parallel).
3. Per-partition totals (one tiny row per partition) turned into
   exclusive cumulative offsets — the only single-partition window in
   the plan runs over ~num_partitions rows — and broadcast-joined back.

Cost: one range shuffle + one pid-keyed shuffle (each partition moves
wholesale) + a broadcast of numPartitions rows. Wall-clock scales with
the widest partition, not the table.

No counterpart in the reference (its only running state was the
driver-side Python loop over collected rows, ``batch_processor.py``);
this is the distributed re-expression of that pattern.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


from .maintenance import free_name as _free


def global_running_sum(
    df: DataFrame,
    order_cols: list[str],
    value_col: str | Column,
    out: str = "running_sum",
    materialize_input: bool = True,
) -> DataFrame:
    """Append ``out`` = sum of ``value_col`` over all rows at-or-before
    the current row in the TOTAL order given by ``order_cols``
    (ascending, nulls not supported — pass a totalizing tie-break as the
    last order column, or per-row values within a tie group are
    assignment-order dependent; the multiset of prefix values over a tie
    group is deterministic either way).

    Lineage control: ``repartitionByRange`` makes an EXTRA full pass
    over the input to sample range boundaries, and the scanned table is
    consumed twice (rows + per-partition totals) — naively the upstream
    lineage executes 3×, which for a windowed upstream (e.g.
    sessionization) dominates the whole query. ``materialize_input``
    (default) lazily ``localCheckpoint``s the input so it computes once,
    and the post-window scan is always checkpointed so totals and the
    final join share one materialization — the same
    compute-once-read-twice discipline the LSH pipelines apply to their
    shingle projection."""
    value = F.col(value_col) if isinstance(value_col, str) else value_col
    pid = _free("_pid", df.columns)
    local = _free("_local", df.columns)
    ptotal = _free("_ptotal", df.columns)
    offset = _free("_offset", df.columns)

    if materialize_input:
        df = df.localCheckpoint(eager=False)
    ranged = df.repartitionByRange(*[F.col(c) for c in order_cols]).withColumn(
        pid, F.spark_partition_id()
    )
    w_local = (
        Window.partitionBy(pid)
        .orderBy(*[F.col(c) for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    scanned = ranged.withColumn(local, F.sum(value).over(w_local)).localCheckpoint(
        eager=False
    )
    totals = scanned.groupBy(pid).agg(F.sum(value).alias(ptotal))
    w_off = Window.orderBy(pid).rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        F.col(pid), F.coalesce(F.sum(ptotal).over(w_off), F.lit(0)).alias(offset)
    )
    return (
        scanned.join(F.broadcast(offsets), pid)
        .withColumn(out, F.col(local) + F.col(offset))
        .drop(pid, local, offset)
    )


def interval_concurrency(
    intervals: DataFrame,
    start_col: str,
    end_col: str,
    tiebreak_cols: list[str],
    out: str = "concurrent",
) -> DataFrame:
    """Sweep-line concurrency over intervals: one ``+1`` boundary at each
    start, one ``-1`` at each end, globally scanned in (ts, starts
    before ends, tiebreak) order — so the running sum at a boundary row
    is the number of intervals active at that instant (closed intervals:
    an interval touching another only at an endpoint still overlaps it).
    Returns one row per boundary with ``ts``, ``delta`` and ``out``.
    The scan is the distributed two-phase :func:`global_running_sum`,
    never a single-partition sort."""
    reserved = {"ts", "delta", "_neg_delta", out}
    clash = reserved & set(tiebreak_cols)
    if clash:
        raise ValueError(
            f"tiebreak_cols {sorted(clash)} collide with the fixed output/work "
            "columns (ts, delta, _neg_delta, out) — alias them first"
        )
    starts = intervals.select(
        F.col(start_col).alias("ts"), F.lit(1).alias("delta"),
        *[F.col(c) for c in tiebreak_cols],
    )
    ends = intervals.select(
        F.col(end_col).alias("ts"), F.lit(-1).alias("delta"),
        *[F.col(c) for c in tiebreak_cols],
    )
    boundaries = starts.unionByName(ends).withColumn("_neg_delta", -F.col("delta"))
    scanned = global_running_sum(
        boundaries, ["ts", "_neg_delta", *tiebreak_cols], "delta", out=out
    )
    return scanned.drop("_neg_delta")
