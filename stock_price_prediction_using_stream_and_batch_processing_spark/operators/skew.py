"""Skew mitigation — salting for hot keys.

AQE (`spark.sql.adaptive.skewJoin`) handles skewed SHUFFLE JOINS at
runtime, but a skewed AGGREGATION key (one symbol with a third of all
ticks, one event_type dominating the stream) still funnels one reducer.
Salting splits each hot key across ``n_salts`` reducers with a
deterministic salt, aggregates partially per (key, salt), then
re-aggregates per key — both stages hash aggs with map-side combine, so
the extra stage costs one narrow shuffle of pre-aggregated rows.

Salts are DERIVED (hash of a high-cardinality column mod n), never
``rand()``: deterministic plans are oracle-checkable and re-runnable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, unique_col: str, n_salts: int, out: str = "_salt") -> DataFrame:
    return df.withColumn(out, F.pmod(F.hash(F.col(unique_col)), F.lit(n_salts)))


def salted_sum_count(
    df: DataFrame,
    keys: list[str],
    value: str,
    unique_col: str,
    n_salts: int = 16,
    sum_name: str = "sum_value",
    count_name: str = "n_rows",
    avg_name: str = "avg_value",
) -> DataFrame:
    """Two-stage salted aggregation for the algebraic aggregates
    (sum/count/avg): stage 1 groups by (keys, salt), stage 2 by keys.
    Result is IDENTICAL to a direct groupBy — only the physical
    distribution changes."""
    salted = with_salt(df, unique_col, n_salts)
    partial = salted.groupBy(*keys, "_salt").agg(
        F.sum(value).alias("_ps"), F.count(F.lit(1)).alias("_pc")
    )
    return partial.groupBy(*keys).agg(
        F.sum("_ps").alias(sum_name),
        F.sum("_pc").alias(count_name),
        (F.sum("_ps") / F.sum("_pc")).alias(avg_name),
    )


def salted_join_big_hot(
    big: DataFrame,
    small: DataFrame,
    key: str,
    unique_col: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-proof equi-join: salt the big (skewed) side deterministically
    and EXPLODE the small side across all salts, so a hot key's rows
    spread over ``n_salts`` reducers instead of one. Use when AQE's
    runtime skew split can't apply (e.g. the join feeds a co-partitioned
    window). Small side grows ×n_salts — keep it dimension-sized.

    Only big-side-preserving join types are sound: a right/full outer
    join would surface every UNMATCHED small-side row once per salt
    replica (n_salts duplicate null-extended rows), so those are
    rejected — salt the other side instead if the small side must be
    preserved."""
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi", "left_anti", "leftanti", "semi", "anti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join_big_hot: how={how!r} would duplicate unmatched small-side "
            f"rows across {n_salts} salt replicas; allowed: inner/left/semi/anti"
        )
    b = with_salt(big, unique_col, n_salts)
    s = small.withColumn("_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)])))
    return b.join(s, [key, "_salt"], how).drop("_salt")
