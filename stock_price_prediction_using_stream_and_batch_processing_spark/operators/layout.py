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
