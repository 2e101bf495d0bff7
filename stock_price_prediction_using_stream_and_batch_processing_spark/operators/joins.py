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
    marker and take ``last(value ignoring nulls)`` over an ordered
    window. One hash shuffle on ``key``, linear work per key, no Python.
    """
    lcols = left.columns
    l = left.select(*lcols, F.lit(1).alias("_is_left"), *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in right_value_cols])
    r = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) if c not in (key, ts) else F.col(c) for c in lcols],
        F.lit(0).alias("_is_left"),
        *right_value_cols,
    )
    u = l.unionByName(r)
    # right rows sort before left rows at equal ts => inclusive (<=) match
    w = Window.partitionBy(key).orderBy(F.col(ts), F.col("_is_left")).rowsBetween(Window.unboundedPreceding, 0)
    for c in right_value_cols:
        u = u.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return u.filter(F.col("_is_left") == 1).drop("_is_left")
