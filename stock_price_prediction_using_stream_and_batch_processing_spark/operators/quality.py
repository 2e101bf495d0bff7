"""Data-quality expectations — declarative rule checks over a table.

A pipeline gate needs (a) per-rule violation counts to decide
pass/fail, and (b) the violating rows for triage. Rules are plain
boolean Columns (the EXPECTATION, i.e. what should be TRUE), so the
whole check is one scan with conditional aggregation — no Python, one
job for all rules.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def check(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """One row per rule: (rule, n_violations, n_rows, pass_rate).
    A NULL rule result counts as a violation (unknown != satisfied)."""
    aggs = []
    for name, expr in rules.items():
        ok = F.coalesce(expr.cast("boolean"), F.lit(False))
        aggs.append(F.sum(F.when(~ok, 1).otherwise(0)).alias(name))
    counted = df.agg(F.count(F.lit(1)).alias("_n"), *aggs)
    rows = counted.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("rule"),
                        F.col(name).alias("n_violations"),
                        F.col("_n").alias("n_rows"),
                    )
                    for name in rules
                ]
            )
        ).alias("r")
    ).select("r.*")
    return rows.withColumn(
        "pass_rate",
        F.when(F.col("n_rows") > 0, 1.0 - F.col("n_violations") / F.col("n_rows")).otherwise(1.0),
    )


def violations(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """Rows failing ANY rule, tagged with the list of failed rule names."""
    fails = F.filter(
        F.array(
            *[
                F.when(~F.coalesce(expr.cast("boolean"), F.lit(False)), F.lit(name))
                for name, expr in rules.items()
            ]
        ),
        lambda x: x.isNotNull(),
    )
    return df.withColumn("failed_rules", fails).filter(F.size("failed_rules") > 0)


def percentile_bins(
    df: DataFrame,
    score_col: str,
    quantiles: list[float] | None = None,
    out: str = "bin",
) -> DataFrame:
    """Assign each row to a quantile bin of ``score_col`` WITHOUT a
    global sort: exact interpolated quantile thresholds come from one
    aggregate (``percentile`` — a mergeable sketch-free exact aggregate;
    swap ``percentile_approx`` in when the score column has extreme
    cardinality), the 1-row threshold array broadcasts back, and the
    bin index is a codegen'd count of thresholds strictly below the
    score. Bin k holds scores in (thr_{k-1}, thr_k] — ties at a
    threshold always land in the lower bin, identically on any engine
    computing the same interpolation.

    The scale contrast: ``NTILE(n) OVER (ORDER BY score)`` — the naive
    formulation — moves the entire table through ONE task. This is two
    map-side-combined passes and a broadcast.
    """
    qs = quantiles or [i / 10.0 for i in range(1, 10)]
    thr = df.agg(
        F.expr(f"percentile({score_col}, array({', '.join(str(q) for q in qs)}))").alias("_thr")
    )
    bin_idx = F.aggregate(
        F.col("_thr"),
        F.lit(1),
        lambda acc, t: acc + F.when(F.col(score_col) > t, 1).otherwise(0),
    )
    # NULL scores stay NULL — `NULL > t` is NULL, so the fold's
    # otherwise(0) would silently sweep every null-scored row into the
    # LOWEST bin (a bottom-decile filter would collect them all)
    binned = df.crossJoin(F.broadcast(thr)).withColumn(
        out, F.when(F.col(score_col).isNull(), F.lit(None)).otherwise(bin_idx)
    )
    return binned.drop("_thr")


def profile_table(
    df: DataFrame,
    numeric_cols: list[str] = (),
    string_cols: list[str] = (),
) -> DataFrame:
    """ANALYZE-style column profile: one row per column with row/null/
    distinct counts and min/max (numeric as double, strings
    lexicographic — never a stringified double, whose formatting is
    engine-specific). Exact distincts so the result is oracle-checkable;
    Spark plans the multi-column COUNT(DISTINCT) via expand+one shuffle,
    which multiplies shuffle rows by the column count — at 100 TB swap
    in ``approx_count_distinct`` (the ``approx_agg_stats`` path) and
    keep everything else identical."""
    aggs: list[Column] = [F.count(F.lit(1)).alias("_n")]
    for c in list(numeric_cols) + list(string_cols):
        aggs.append(F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"_nulls_{c}"))
        aggs.append(F.countDistinct(F.col(c)).alias(f"_nd_{c}"))
    for c in numeric_cols:
        aggs.append(F.min(F.col(c).cast("double")).alias(f"_mnn_{c}"))
        aggs.append(F.max(F.col(c).cast("double")).alias(f"_mxn_{c}"))
    for c in string_cols:
        aggs.append(F.min(F.col(c)).alias(f"_mns_{c}"))
        aggs.append(F.max(F.col(c)).alias(f"_mxs_{c}"))
    one = df.agg(*aggs)

    structs = []
    for c in numeric_cols:
        structs.append(
            F.struct(
                F.lit(c).alias("column"),
                F.col("_n").alias("n_rows"),
                F.col(f"_nulls_{c}").alias("n_nulls"),
                F.col(f"_nd_{c}").alias("n_distinct"),
                F.col(f"_mnn_{c}").alias("min_num"),
                F.col(f"_mxn_{c}").alias("max_num"),
                F.lit(None).cast("string").alias("min_str"),
                F.lit(None).cast("string").alias("max_str"),
            )
        )
    for c in string_cols:
        structs.append(
            F.struct(
                F.lit(c).alias("column"),
                F.col("_n").alias("n_rows"),
                F.col(f"_nulls_{c}").alias("n_nulls"),
                F.col(f"_nd_{c}").alias("n_distinct"),
                F.lit(None).cast("double").alias("min_num"),
                F.lit(None).cast("double").alias("max_num"),
                F.col(f"_mns_{c}").alias("min_str"),
                F.col(f"_mxs_{c}").alias("max_str"),
            )
        )
    return one.select(F.explode(F.array(*structs)).alias("r")).select("r.*")


def equi_width_histogram(
    df: DataFrame,
    col: str,
    lo: float,
    hi: float,
    n_bins: int,
    out: str = "bin",
) -> DataFrame:
    """Equi-width histogram over [lo, hi): bin = floor((x-lo)/(hi-lo)*n)
    clamped to [0, n-1]; out-of-range rows clamp into the edge bins (so
    the counts always sum to the table). The explicit floor formula
    (not ``width_bucket``) keeps the arithmetic portable across engines
    for the oracle. One groupBy on the n-value bin key — the cheapest
    possible distribution snapshot of a 100 TB column."""
    if n_bins < 1 or not hi > lo:
        raise ValueError("need n_bins >= 1 and hi > lo")
    x = F.col(col).cast("double")
    raw = F.floor((x - F.lit(float(lo))) / F.lit(float(hi - lo)) * F.lit(float(n_bins)))
    bin_ = F.least(F.greatest(raw, F.lit(0)), F.lit(n_bins - 1)).cast("int")
    return (
        df.filter(x.isNotNull())
        .groupBy(bin_.alias(out))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def referential_orphans(
    pairs: list[tuple[str, DataFrame, str, DataFrame, str]],
) -> DataFrame:
    """Cross-table referential-integrity check: for each
    (name, child, child_key, parent, parent_key), count child rows whose
    key has no parent — a LEFT ANTI join per relation (broadcast when
    the parent is a dimension; shuffle-hash otherwise, Catalyst's
    call). Returns (relation, n_orphans) — the admission gate a
    warehouse load runs after every batch."""
    outs = []
    for name, child, ck, parent, pk in pairs:
        orphans = child.join(
            parent.select(F.col(pk).alias(ck)).distinct(), ck, "left_anti"
        )
        outs.append(
            orphans.agg(F.count(F.lit(1)).alias("n_orphans")).select(
                F.lit(name).alias("relation"), "n_orphans"
            )
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res


def zscore_outliers(
    df: DataFrame,
    key_col: str,
    value_col: str,
    z_thresh: float = 3.0,
    broadcast_stats: bool = True,
) -> DataFrame:
    """Per-group z-score outliers: rows where
    ``|x - mean(group)| / stddev(group) >= z_thresh`` — the standard
    anomaly gate a metrics pipeline runs per series/segment.

    Two passes over the data, one tiny intermediate: a groupBy computes
    (mean, stddev_samp, n) per key — map-side combined, one row per key
    crosses the shuffle — and the stats table joins back onto the raw
    rows. With ``broadcast_stats`` (right for low-cardinality segment
    keys) the join is a broadcast: the 100 TB side never shuffles at
    all; for high-cardinality keys set it False and let AQE pick a
    shuffle join keyed the same as the groupBy. Groups with fewer than
    2 rows or zero variance emit no outliers (stddev NULL/0 — nothing
    is 'anomalous' against no spread)."""
    stats = df.groupBy(key_col).agg(
        F.avg(value_col).alias("_mean"),
        F.stddev_samp(value_col).alias("_std"),
    )
    if broadcast_stats:
        stats = F.broadcast(stats)
    z = (F.col(value_col) - F.col("_mean")) / F.col("_std")
    return (
        df.join(stats, key_col)
        .filter(F.col("_std").isNotNull() & (F.col("_std") > 0))
        .withColumn("zscore", z)
        .filter(F.abs(F.col("zscore")) >= z_thresh)
        .drop("_mean", "_std")
    )
