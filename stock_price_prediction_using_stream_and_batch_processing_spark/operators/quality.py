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
    binned = df.crossJoin(F.broadcast(thr)).withColumn(
        out,
        F.aggregate(
            F.col("_thr"),
            F.lit(1),
            lambda acc, t: acc + F.when(F.col(score_col) > t, 1).otherwise(0),
        ),
    )
    return binned.drop("_thr")
