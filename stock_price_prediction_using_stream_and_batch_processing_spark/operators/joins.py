"""Join operators (absent from the reference — SURVEY §2.10 extensions).

Scale notes: dimension tables (region/nation/supplier/part/customer at
catalog scale) are broadcast explicitly so fact-side data never
shuffles for them; fact-fact joins (lineitem ⋈ orders) shuffle on the
join key where AQE handles skew splitting. An as-of join is provided as
a composition (union + window last-value) that needs only ONE shuffle
on the series key — no per-row lookups, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def broadcast_join(fact: DataFrame, dim: DataFrame, on, how: str = "inner") -> DataFrame:
    return fact.join(F.broadcast(dim), on, how)


def semi_join(left: DataFrame, right: DataFrame, on) -> DataFrame:
    """EXISTS — rows of ``left`` with a match in ``right``."""
    return left.join(right, on, "left_semi")


def anti_join(left: DataFrame, right: DataFrame, on) -> DataFrame:
    """NOT EXISTS — rows of ``left`` without a match in ``right``."""
    return left.join(right, on, "left_anti")


def interval_join(
    left: DataFrame,
    right: DataFrame,
    point: str,
    start: str,
    end: str,
    bucket_seconds: int,
    end_inclusive: bool = False,
) -> DataFrame:
    """Range (interval) join: left rows whose ``point`` timestamp falls
    in a right row's [``start``, ``end``) interval. Spark has no native
    range-join strategy (a bare theta join plans as a nested-loop /
    cross product), so this buckets time into ``bucket_seconds`` cells:
    points map to one bucket, intervals explode to the buckets they
    cover, and the match becomes an EQUI-join on bucket plus a cheap
    residual range filter — O(candidates-per-bucket), shuffle-
    partitioned by bucket, instead of |L|×|R|.

    Pick ``bucket_seconds`` ≈ the typical interval length: each interval
    then lands in ~2 buckets and candidate blowup stays ~2×. A point
    lives in exactly one bucket, so no post-join dedup is needed.
    """
    def secs(c: str):
        # TIMESTAMP_NTZ needs a hop through TIMESTAMP before the
        # numeric cast; session tz is pinned UTC (sources/tables.py) so
        # the epoch is consistent on both sides.
        return F.col(c).cast("timestamp").cast("double")

    lb = left.withColumn("_bkt", F.floor(secs(point) / bucket_seconds))
    rb = (
        right.withColumn(
            "_bkt",
            F.explode(
                F.sequence(
                    F.floor(secs(start) / bucket_seconds),
                    F.floor(secs(end) / bucket_seconds),
                )
            ),
        )
    )
    upper = F.col(point) <= F.col(end) if end_inclusive else F.col(point) < F.col(end)
    return (
        lb.join(rb, lb["_bkt"] == rb["_bkt"], "inner")
        .filter((F.col(point) >= F.col(start)) & upper)
        .drop("_bkt")
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    right_value_cols: list[str],
) -> DataFrame:
    """As-of (backward) join: for each left row, attach the most recent
    right row with the same ``key`` and right.ts <= left.ts.

    Spark has no native as-of join; rather than a range cross-join or a
    per-group ``pd.merge_asof``, we union both sides tagged with a side
    marker and take ``last(... ignoring nulls)`` over an ordered
    window. One hash shuffle on ``key``, linear work per key, no Python.

    The right value columns travel as ONE struct, so the window attaches
    the most recent right ROW atomically (``pd.merge_asof`` semantics):
    carrying each column independently would let a NULL field in the
    newest right row fall back to an older row's value — producing a
    composite row that never existed, and fields mixed across different
    right rows when several value columns are carried."""
    from pyspark.sql import types as T

    for reserved in ("_is_left", "_rrow"):
        if reserved in left.columns or reserved in right.columns:
            raise ValueError(f"input already has internal column {reserved!r}")
    lcols = left.columns
    row_type = T.StructType([right.schema[c] for c in right_value_cols])
    l = left.select(
        *lcols, F.lit(1).alias("_is_left"), F.lit(None).cast(row_type).alias("_rrow")
    )
    r = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) if c not in (key, ts) else F.col(c) for c in lcols],
        F.lit(0).alias("_is_left"),
        F.struct(*[F.col(c) for c in right_value_cols]).alias("_rrow"),
    )
    u = l.unionByName(r)
    # right rows sort before left rows at equal ts => inclusive (<=) match
    w = Window.partitionBy(key).orderBy(F.col(ts), F.col("_is_left")).rowsBetween(Window.unboundedPreceding, 0)
    u = u.withColumn("_rrow", F.last("_rrow", ignorenulls=True).over(w))
    out = u.filter(F.col("_is_left") == 1)
    for c in right_value_cols:
        # getField, not F.col(f"_rrow.{c}"): dotted-path parsing would
        # split a value-column name that itself contains a dot.
        out = out.withColumn(c, F.col("_rrow").getField(c))
    return out.drop("_is_left", "_rrow")
