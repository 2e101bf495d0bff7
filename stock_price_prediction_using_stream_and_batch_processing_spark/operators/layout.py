"""Multi-dimensional data layout: Z-order (Morton) clustering for
data-skipping.

Range-partitioning on ONE column gives perfect min/max pruning on that
column and none on any other. Interleaving the bits of several
normalized columns into one Morton code and range-partitioning on THAT
gives each output file a small bounding box in every clustered
dimension — so a predicate on any of them prunes files. This is the
standard lakehouse OPTIMIZE ZORDER BY strategy, built here from plain
column algebra (shiftright/and/shiftleft) so it codegens and needs no
UDF; at 100 TB the whole job is one range shuffle, identical in cost to
a plain sort-by-one-column rewrite.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def normalized_int(col: Column, mn: Column, mx: Column, bits: int) -> Column:
    """Map a numeric column into [0, 2^bits) by min/max scaling. The
    arithmetic is plain double ops (sub/div/mul/floor), so any engine
    computing the same formula gets the bit-identical lattice cell."""
    top = float((1 << bits) - 1)
    span = (mx - mn).cast("double")
    scaled = F.when(
        span > 0.0,
        F.floor((col.cast("double") - mn.cast("double")) / span * top),
    ).otherwise(F.lit(0))
    return scaled.cast("long")


def interleave_bits(cols: list[Column], bits: int = 16) -> Column:
    """Morton code: bit b of dimension j lands at position
    b * ndim + j. Unrolled shift/mask/or expression — ndim * bits terms,
    all codegen'd; ndim * bits must fit a signed 64-bit long."""
    ndim = len(cols)
    if ndim * bits > 62:
        raise ValueError(f"{ndim} dims x {bits} bits exceeds a long")
    z = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        for b in range(bits):
            z = z + F.shiftleft(F.shiftright(c, b).bitwiseAND(F.lit(1)), b * ndim + j)
    return z


def zorder_value(
    df: DataFrame, cols: list[str], bits: int = 16, out: str = "zval"
) -> DataFrame:
    """Attach the Morton code over ``cols`` (min/max computed from the
    data in one tiny aggregate, broadcast back)."""
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"_mn_{c}"), F.max(c).alias(f"_mx_{c}")]
    bounds = df.agg(*aggs)
    with_bounds = df.crossJoin(F.broadcast(bounds))
    lattice = [
        normalized_int(F.col(c), F.col(f"_mn_{c}"), F.col(f"_mx_{c}"), bits)
        for c in cols
    ]
    return with_bounds.withColumn(out, interleave_bits(lattice, bits)).drop(
        *[f"_mn_{c}" for c in cols], *[f"_mx_{c}" for c in cols]
    )


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 16,
    num_files: int | None = None,
) -> None:
    """Rewrite ``df`` as parquet clustered by the Z-order of ``cols``:
    range-partition on the Morton code (so files hold contiguous
    z-ranges => small per-file bounding boxes in every dimension), sort
    within partitions, drop the helper column on write. Parquet footer
    min/max stats + Spark's scan-level filter pushdown then skip files
    for predicates on ANY clustered column."""
    z = zorder_value(df, cols, bits)
    parts = num_files or int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    (
        z.repartitionByRange(parts, F.col("zval"))
        .sortWithinPartitions("zval")
        .drop("zval")
        .write.mode("overwrite")
        .parquet(path)
    )


def file_minmax_manifest(
    spark, path: str, cols: list[str]
) -> DataFrame:
    """Build an explicit FILE-LEVEL min/max manifest over a parquet
    dataset — the metadata table behind lakehouse data skipping
    (Iceberg manifests / Delta file stats), reproduced Spark-first.
    One column-pruned distributed scan groups by ``input_file_name()``
    and records per-file bounds plus row counts; the manifest is
    ~one row per file, so it stays metadata-sized no matter how big
    the data is.

    Parquet footer pushdown skips ROW GROUPS but still LISTS and OPENS
    every footer — at millions of files that is the dominant planning
    cost. A persisted manifest moves the pruning decision to a
    metadata-sized join/filter that never touches the data files at
    all; this builder is the post-hoc form (at ingest time the same
    stats ride the writer's task results for free).

    NULL semantics: a file whose column is entirely NULL gets NULL
    bounds and is dropped by any range predicate on that column —
    lossless, because NULL values can never satisfy a range predicate
    either.
    """
    df = spark.read.parquet(path).select(*cols)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
    return (
        df.groupBy(F.input_file_name().alias("file"))
        .agg(*aggs)
    )


def decode_file_uri(p: str) -> str:
    """Decode an ``input_file_name()``-style percent-encoded URI to the
    path a read-back should use: local (``file:``/bare) URIs return the
    bare unquoted path; remote URIs are reassembled as
    ``scheme://netloc`` + unquoted path (an hdfs/s3 key with encoded
    characters would otherwise be re-requested still-encoded). Shared
    by the manifest prune here and the snapshot commit scan
    (operators/snapshots.py) — one decode rule, one place."""
    from urllib.parse import unquote, urlparse

    parts = urlparse(p)
    if parts.scheme in ("", "file"):
        return unquote(parts.path)
    return f"{parts.scheme}://{parts.netloc}{unquote(parts.path)}"


def manifest_pruned_paths(
    manifest: DataFrame, col: str, lo, hi
) -> tuple[list[str], int]:
    """Prune a file manifest against ``col BETWEEN lo AND hi``:
    keep files whose [min, max] interval intersects [lo, hi]. Returns
    (surviving file paths, total file count). The interval test runs
    DISTRIBUTED on the manifest; only the surviving path strings are
    collected — the one driver-side list a file-pruned read genuinely
    needs (it becomes ``spark.read.parquet(*paths)``), bounded by the
    number of MATCHING files, never by data size. Conservative and
    lossless: a straddling file is read and the residual filter
    finishes the job; a NULL-bounds file (all-NULL column) fails the
    interval test exactly as its rows would fail the predicate.

    One ACTION, not two: the kept list and the total ride the same
    aggregate (``collect_list`` skips the NULL a non-matching file's
    CASE yields), because a second action on the un-persisted manifest
    would re-run the full data scan behind it just to count files.
    File paths come back percent-encoded from ``input_file_name()``
    (``file:/a/my%20dir/...``) and are decoded before the read-back
    for EVERY scheme — local paths are returned bare, remote URIs are
    reassembled as ``scheme://netloc`` + decoded path (an hdfs/s3 key
    with encoded characters would otherwise be re-requested
    still-encoded, targeting the wrong object).
    """
    cond = (F.col(f"max_{col}") >= F.lit(lo)) & (F.col(f"min_{col}") <= F.lit(hi))
    row = manifest.agg(
        F.count(F.lit(1)).alias("_n_total"),
        F.collect_list(F.when(cond, F.col("file"))).alias("_kept"),
    ).first()
    return [decode_file_uri(p) for p in row["_kept"]], row["_n_total"]
