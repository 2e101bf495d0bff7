"""Mergeable-sketch rollups: the distinct-count analogue of the
multi-resolution OHLC hypertable (operators/windows.multi_res_ohlc).

Exact COUNT(DISTINCT) cannot roll up — distincts don't add — so a
hierarchy of time resolutions normally means re-scanning raw data per
level. HyperLogLog sketches merge losslessly (union of hour sketches
== sketch of the day, bit-for-bit at the same lgConfigK), so the raw
table is scanned ONCE into fine-grained sketch partials and every
coarser level derives from unions of those partials — at 100 TB the
day/week/month levels read kilobyte sketches, not the corpus. This is
Spark 4's built-in Apache DataSketches integration
(``hll_sketch_agg`` / ``hll_union_agg``); a rows-only query face
(sketch estimates have no DuckDB twin), with the merge-losslessness
and error-bound properties pinned in tests/test_approx.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hll_fine_sketches(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    fine: str = "hour",
    lgk: int = 12,
) -> DataFrame:
    """One HLL sketch per fine-grained time bucket — the materialized
    base of the rollup hierarchy. (bucket_start, sketch) rows: this is
    what a maintenance job persists; kilobytes per bucket."""
    bucket = F.date_trunc(fine, F.col(ts_col))
    return df.groupBy(bucket.alias("bucket_start")).agg(
        F.hll_sketch_agg(F.col(value_col), F.lit(lgk)).alias("sketch")
    )


def hll_rollup(
    fine_sketches: DataFrame,
    coarse: str = "day",
) -> DataFrame:
    """Coarse-level distinct estimates from fine-level sketch partials
    ONLY — no raw-data rescan. Groups fine buckets into the coarse
    bucket and unions their sketches; the estimate is identical to one
    computed directly over raw data at the coarse level."""
    coarse_bucket = F.date_trunc(coarse, F.col("bucket_start"))
    return (
        fine_sketches.groupBy(coarse_bucket.alias("bucket_start"))
        .agg(
            F.round(F.hll_sketch_estimate(F.hll_union_agg("sketch"))).cast("long").alias("approx_distinct")
        )
    )


def refresh_hll_fine(
    spark,
    sketch_path: str,
    new_raw: DataFrame,
    ts_col: str,
    value_col: str,
    fine: str = "hour",
    lgk: int = 12,
    partition_col: str | None = "part_date",
) -> int:
    """Incremental maintenance of the MATERIALIZED fine-sketch table —
    the distinct-count twin of windows.refresh_ohlc_fine: only the new
    batch's raw rows are sketched; their partials union with the stored
    sketches of exactly the affected buckets (semi-join pruned) and
    MERGE back replacing those rows only.

    ``partition_col`` (default on, mirroring refresh_ohlc_fine): the
    store is laid out partitioned by the bucket's UTC date and the
    merge-back rewrites ONLY the dates the batch touched (dynamic
    partition overwrite) — without it every refresh reads and rewrites
    the WHOLE table, so per-batch cost grows with history instead of
    staying O(batch + affected dates). ``None`` keeps a flat table —
    short-lived scratch stores only. Readers should ignore the
    partition column (``hll_rollup`` groups on bucket_start and does).

    Replay tolerance comes FREE here, with no epoch marker: HLL union
    is idempotent at the element level (union(S, P) ∪ P == union(S, P)),
    so a retried foreachBatch epoch re-merging the same rows cannot
    change any sketch — strictly stronger than the bar table, whose
    n_ticks counts would double (hence its marker guard). The remaining
    non-transactionality (crash between slice read and overwrite) has
    the same parquet-only bound documented at
    streaming/pipeline.maintain_bars_batch. Returns sketch rows
    written."""
    from ..sources.tables import parquet_table_exists
    from .upsert import merge_into_parquet

    batch = hll_fine_sketches(new_raw, ts_col, value_col, fine, lgk)
    # epoch-days date, not to_date: session-timezone-independent (same
    # hazard documented at windows.refresh_ohlc_fine)
    utc_date = F.date_from_unix_date(
        F.floor(F.col("bucket_start").cast("timestamp").cast("double") / 86400.0).cast("int")
    )
    with_part = (
        (lambda d: d.withColumn(partition_col, utc_date))
        if partition_col is not None
        else (lambda d: d)
    )
    if not parquet_table_exists(spark, sketch_path):
        writer = with_part(batch).write
        if partition_col is not None:
            writer = writer.partitionBy(partition_col)
        writer.parquet(sketch_path)
        return spark.read.parquet(sketch_path).count()
    target = spark.read.parquet(sketch_path)
    stored_partitioned = partition_col in target.columns if partition_col is not None else False
    if partition_col is not None and not stored_partitioned:
        raise ValueError(
            f"sketch table at {sketch_path} is flat but partition_col={partition_col!r} was "
            "requested — refresh with partition_col=None or rebuild the table partitioned"
        )
    if partition_col is None and any(c.startswith("part_") for c in target.columns):
        raise ValueError(
            f"sketch table at {sketch_path} is partitioned but partition_col=None was "
            "requested — pass the table's partition column"
        )
    if partition_col is not None:
        target = target.drop(partition_col)
    affected = batch.select("bucket_start").distinct()
    existing = target.join(affected, "bucket_start", "semi")
    merged = with_part(
        existing.unionByName(batch)
        .groupBy("bucket_start")
        .agg(F.hll_union_agg("sketch").alias("sketch"))
    )
    return merge_into_parquet(spark, sketch_path, merged, ["bucket_start"], partition_col)
