"""Data-quality expectations — declarative rule checks over a table.

A pipeline gate needs (a) per-rule violation counts to decide
pass/fail, and (b) the violating rows for triage. Rules are plain
boolean Columns (the EXPECTATION, i.e. what should be TRUE), so the
whole check is one scan with conditional aggregation — no Python, one
job for all rules.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
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


def binned_histogram_tables(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int,
    fine: str = "hour",
) -> DataFrame:
    """One equi-width histogram PER fine time bucket — (bucket_start,
    bin, n) rows, the quantile-sketch analogue of the OHLC/HLL/CMS
    partial stores: what a maintenance job persists, and what coarser
    resolutions derive from by SUMMING counts (bin counts merge by
    addition — exact for any split of the input). Bounded at n_bins
    rows per bucket regardless of traffic; same portable clamped-floor
    bin formula as :func:`equi_width_histogram`, so every level has an
    exact SQL twin."""
    if n_bins < 1 or not hi > lo:
        raise ValueError("need n_bins >= 1 and hi > lo")
    x = F.col(value_col).cast("double")
    raw = F.floor((x - F.lit(float(lo))) / F.lit(float(hi - lo)) * F.lit(float(n_bins)))
    bin_ = F.least(F.greatest(raw, F.lit(0)), F.lit(n_bins - 1)).cast("int")
    return (
        df.filter(x.isNotNull())
        .groupBy(
            F.date_trunc(fine, F.col(ts_col)).alias("bucket_start"), bin_.alias("bin")
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )


def histogram_rollup(fine: DataFrame, coarse: str = "day") -> DataFrame:
    """Coarse-resolution histogram tables from fine partials ONLY — no
    raw-data rescan: counts add, so the rolled-up table is IDENTICAL to
    one built directly at the coarse level. At 100 TB the day/week
    quantile levels read n_bins-row partials, never the corpus."""
    coarse_bucket = F.date_trunc(coarse, F.col("bucket_start"))
    return (
        fine.groupBy(coarse_bucket.alias("bucket_start"), "bin")
        .agg(F.sum("n").alias("n"))
    )


def binned_quantiles(
    hists: DataFrame,
    qs: tuple[float, ...],
    lo: float,
    hi: float,
    n_bins: int,
) -> DataFrame:
    """Per-bucket quantile ESTIMATES read from a binned histogram
    table: for each q, the lower edge of the first bin whose cumulative
    count reaches q×total — deterministic integer+literal arithmetic,
    so unlike t-digest/KLL the estimate is value-identical across
    engines and carries a full SQL oracle. Error bound is the bin width
    by construction ((hi-lo)/n_bins — pinned vs exact percentiles in
    tests/test_rollup.py). One window pass per bucket over ≤ n_bins
    rows; the corpus is never touched."""
    width = (hi - lo) / n_bins
    wb = Window.partitionBy("bucket_start").orderBy("bin")
    wt = Window.partitionBy("bucket_start")
    h = hists.withColumn("_cum", F.sum("n").over(wb)).withColumn(
        "_total", F.sum("n").over(wt)
    )
    aggs = [F.max("_total").cast("long").alias("n_rows")]
    for q in qs:
        b = F.min(F.when(F.col("_cum") >= F.lit(float(q)) * F.col("_total"), F.col("bin")))
        aggs.append(
            (F.lit(float(lo)) + b * F.lit(float(width))).alias(f"p{int(round(q * 100))}_est")
        )
    return h.groupBy("bucket_start").agg(*aggs)


def refresh_histogram_fine(
    spark,
    hist_path: str,
    new_raw: DataFrame,
    ts_col: str,
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int,
    fine: str = "hour",
    partition_col: str | None = "part_date",
) -> int:
    """Incremental maintenance of the MATERIALIZED per-bucket histogram
    table — the quantile family's maintenance face, completing the
    symmetry with the bar/HLL/CMS stores (operators/maintenance.
    refresh_partials scaffolding shared by all four): only the new
    batch's rows are binned; their partial counts ADD into the stored
    counts of exactly the affected (bucket_start, bin) keys, and only
    touched date partitions rewrite. Addition commutes and associates,
    so the final table is IDENTICAL to a one-shot build for ANY split
    of the input, late data included. Like the CMS store (and unlike
    HLL's idempotent union), a replayed foreachBatch epoch would
    DOUBLE-COUNT — stream drivers wrap calls in the epoch-marker guard
    (streaming/pipeline.maintain_bars_batch pattern)."""
    from .maintenance import refresh_partials

    batch = binned_histogram_tables(new_raw, ts_col, value_col, lo, hi, n_bins, fine)
    return refresh_partials(
        spark,
        hist_path,
        batch,
        ["bucket_start", "bin"],
        lambda existing, b: existing.unionByName(b)
        .groupBy("bucket_start", "bin")
        .agg(F.sum("n").alias("n")),
        partition_col,
        table_desc="histogram table",
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
