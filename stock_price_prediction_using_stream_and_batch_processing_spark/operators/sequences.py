"""Event-sequence analytics over a (user, ts, type) stream: ordered
funnels, retention cohorts, and next-event transition matrices.

The reference pipeline stores raw ticks and predicts prices; a
production owner of that event stream invariably asks the behavioral
questions too (did the view lead to the purchase? do users come back?).
All three operators here are single-window-pass or groupBy shapes —
every shuffle is keyed on ``user_id`` or on a tiny (type, type) /
(day, offset) result grid, so they scale with the event table, not
with any driver-side state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ordered_funnel(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
    tiebreak: str | None = None,
) -> DataFrame:
    """Strict ordered-funnel counts: a user completes step k only via an
    event of ``steps[k]`` that happens STRICTLY AFTER some event chain
    completing steps 1..k-1 (ties broken by ``tiebreak`` so the result
    is deterministic).

    One shuffle total: all window passes share the same
    ``(user, ts, tiebreak)`` partitioning+ordering, so Spark sorts once
    and evaluates the chained running-max flags over the same sorted
    stream; the final aggregate is a map-side-combined count-distinct
    per step. No per-user arrays, no driver state — a 100 TB event
    table streams through one external sort per partition.

    Returns a single row: ``n_step_1 .. n_step_k`` user counts.
    """
    if len(steps) < 2:
        raise ValueError("funnel needs at least 2 steps")
    order = [F.col(ts_col)] + ([F.col(tiebreak)] if tiebreak else [])
    w_prev = (
        Window.partitionBy(user_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )

    # qualifies[k]: this row is a step-k event with steps 1..k-1 already
    # completed strictly earlier. Chained running-max over one sort.
    out = df
    qual_cols: list[str] = []
    prev_flag: F.Column | None = None
    for i, step in enumerate(steps):
        qc = f"_q{i}"
        if i == 0:
            qual = (F.col(type_col) == step).cast("int")
        else:
            seen_prev = F.max(F.col(qual_cols[i - 1])).over(w_prev)
            qual = ((F.col(type_col) == step) & (F.coalesce(seen_prev, F.lit(0)) == 1)).cast("int")
        out = out.withColumn(qc, qual)
        qual_cols.append(qc)
        prev_flag = qual

    aggs = [
        F.countDistinct(F.when(F.col(qc) == 1, F.col(user_col))).alias(f"n_step_{i + 1}")
        for i, qc in enumerate(qual_cols)
    ]
    return out.agg(*aggs)


def retention_cohorts(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    max_offset_days: int = 7,
) -> DataFrame:
    """Classic cohort-retention grid: users grouped by first-active day,
    counted on each subsequent day-offset they were active.

    Plan shape: one groupBy(user) for first-day, one distinct over
    (user, day), one shuffle join on user (both sides are per-user
    aggregates — far smaller than the raw events), one final groupBy on
    the tiny (cohort_day, offset) grid. Every stage is keyed on user or
    on the grid — no skew hazard beyond what salting already covers for
    pathological single users.
    """
    day = F.to_date(F.col(ts_col))
    firsts = df.groupBy(user_col).agg(F.min(day).alias("cohort_day"))
    active = df.select(F.col(user_col), day.alias("_day")).distinct()
    joined = active.join(firsts, user_col)
    offset = F.datediff(F.col("_day"), F.col("cohort_day"))
    return (
        joined.withColumn("day_offset", offset)
        .filter(F.col("day_offset").between(0, max_offset_days))
        .groupBy("cohort_day", "day_offset")
        .agg(F.countDistinct(user_col).alias("n_users"))
    )


def transition_matrix(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    tiebreak: str | None = None,
) -> DataFrame:
    """Per-user next-event transition counts + probabilities (a first-
    order Markov model of the event stream). One window pass (lead over
    the per-user time order), one groupBy onto the tiny |types|² grid,
    then a per-source normalization window over that grid (|types|²
    rows — negligible at any corpus size)."""
    order = [F.col(ts_col)] + ([F.col(tiebreak)] if tiebreak else [])
    w = Window.partitionBy(user_col).orderBy(*order)
    pairs = (
        df.withColumn("_next", F.lead(type_col).over(w))
        .filter(F.col("_next").isNotNull())
        .groupBy(F.col(type_col).alias("src"), F.col("_next").alias("dst"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w_src = Window.partitionBy("src")
    return pairs.withColumn(
        "p", F.round(F.col("n") / F.sum("n").over(w_src), 6)
    )


def interval_history(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    attr_col: str,
    tiebreak: str | None = None,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    current_flag: str = "is_current",
) -> DataFrame:
    """Slowly-changing-dimension (SCD type 2) interval history: collapse
    each key's ordered attribute observations into [valid_from,
    valid_to) validity intervals, one row per RUN of consecutive equal
    values (gaps-and-islands). The open interval per key is flagged
    ``is_current`` — the table a warehouse keeps so point-in-time joins
    ("what was the status when the event happened") become plain range
    joins.

    Plan: one window pass detects value changes (lag over the per-key
    order), a running sum turns changes into run ids, a groupBy
    collapses runs (map-side combined — one row per run crosses the
    shuffle, not one per observation), and a second window over the
    collapsed runs fills ``valid_to`` with the next run's start. Both
    windows and the groupBy share the same key partitioning, so the
    whole operator is ONE shuffle of the observations plus one of the
    (much smaller) runs table. NULL attribute values form runs of
    their own (null-safe change test)."""
    for reserved in ("_chg", "_run", "_start"):
        if reserved in df.columns:
            raise ValueError(f"input already has internal column {reserved!r}")
    order = [F.col(ts_col)] + ([F.col(tiebreak)] if tiebreak else [])
    w = Window.partitionBy(key_col).orderBy(*order)
    changed = F.when(
        F.lag(attr_col).over(w).eqNullSafe(F.col(attr_col)), 0
    ).otherwise(1)
    runs = (
        df.withColumn("_chg", changed)
        .withColumn("_run", F.sum("_chg").over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy(key_col, "_run")
        .agg(
            F.first(attr_col).alias(attr_col),
            F.min(F.struct(*order)).alias("_start"),
        )
        .select(key_col, F.col(attr_col), F.col(f"_start.{ts_col}").alias(valid_from), F.col("_run"))
    )
    w_runs = Window.partitionBy(key_col).orderBy("_run")
    return (
        runs.withColumn(valid_to, F.lead(valid_from).over(w_runs))
        .withColumn(current_flag, F.col(valid_to).isNull())
        .drop("_run")
    )


def touch_attribution(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    conversion: str = "purchase",
) -> DataFrame:
    """First-touch / last-touch conversion attribution: for every
    conversion event, credit (a) the user's FIRST preceding
    non-conversion touch ever, and (b) the LAST touch strictly before
    the conversion — the two standard channel-credit models. Output is
    the credit matrix (attribution ∈ {'first','last'}, touch_type,
    n_conversions); conversions with no preceding touch earn no row.

    One window pass: per-user (ts, id)-ordered frame carrying
    first/last non-null touch type over [unbounded, -1] (ignorenulls —
    conversion rows don't reset the carry), then one tiny aggregate
    over the conversion rows. The single shuffle is keyed on
    ``user_col``; the result grid is (2 × |event types|) rows, so at
    100 TB the cost is the one per-user sort the behavioral family
    already shares. Ordering is totalized through ``id_col`` so
    same-timestamp events attribute deterministically on any engine,
    and NULLS LAST is explicit (Spark's ASC default is nulls-first,
    most SQL engines' is nulls-last — pinning it makes the frame carry
    engine-portable even if a fixture ever grows NULL timestamps)."""
    w = (
        Window.partitionBy(user_col)
        .orderBy(F.col(ts_col).asc_nulls_last(), F.col(id_col).asc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.when(F.col(type_col) != conversion, F.col(type_col))
    flagged = df.select(
        F.col(user_col),
        F.col(type_col),
        F.first(touch, ignorenulls=True).over(w).alias("first_touch"),
        F.last(touch, ignorenulls=True).over(w).alias("last_touch"),
    ).filter(F.col(type_col) == conversion)
    first = (
        flagged.filter(F.col("first_touch").isNotNull())
        .select(F.lit("first").alias("attribution"), F.col("first_touch").alias("touch_type"))
    )
    last = (
        flagged.filter(F.col("last_touch").isNotNull())
        .select(F.lit("last").alias("attribution"), F.col("last_touch").alias("touch_type"))
    )
    return (
        first.unionByName(last)
        .groupBy("attribution", "touch_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n_conversions"))
    )
