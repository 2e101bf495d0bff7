"""Time-series window operators — the reference's analytical core.

The reference materialized trailing windows by collecting to Pandas on
the driver (trailing-5: ``stream_consumer.py:50-54,72-76``; sliding-60
loop: ``batch_processor.py:88-101``). Here they are Spark window
functions partitioned by the series key, so the work distributes by key
and never leaves the JVM.

Scale notes:
- Every function partitions by a key column; with millions of keys the
  window sort parallelizes across executors (one local sort per key
  group after a hash shuffle — no global sort anywhere).
- A single giant key (one symbol with 100 TB of ticks) is the one shape
  a row-window can't split; for that case pre-bucket by coarse time
  range and run windows within buckets, stitching the first N-1 rows.
  AQE skew handling covers the join/agg paths.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .maintenance import free_name as _free_name  # shared (also ordering.py)


def _w(key: str, ts: str, tiebreak: str | list[str] | None):
    tb = [tiebreak] if isinstance(tiebreak, str) else list(tiebreak or [])
    order = [F.col(ts)] + [F.col(c) for c in tb]
    return Window.partitionBy(key).orderBy(*order)


def trailing_mean(
    df: DataFrame,
    key: str,
    ts: str,
    value: str,
    n: int,
    out: str = "trailing_mean",
    tiebreak: str | list[str] | None = None,
    full_only: bool = False,
) -> DataFrame:
    """Trailing-``n``-row mean of ``value`` per ``key`` ordered by ``ts``
    (reference W1 semantics minus the model: ``stream_consumer.py:51``).
    ``full_only`` keeps only rows with a complete window (reference W2
    gate ``batch_processor.py:89-95``)."""
    w = _w(key, ts, tiebreak).rowsBetween(-(n - 1), 0)
    res = df.withColumn(out, F.avg(value).over(w))
    if full_only:
        res = res.withColumn("_wn", F.count(value).over(w)).filter(F.col("_wn") == n).drop("_wn")
    return res


def trailing_collect(
    df: DataFrame,
    key: str,
    ts: str,
    value: str,
    n: int,
    out: str = "window_values",
    tiebreak: str | list[str] | None = None,
    full_only: bool = True,
) -> DataFrame:
    """Trailing-``n`` ordered value arrays per key — the input shape for
    batched model inference (replaces the reference's Python sliding-loop
    tensor build, ``batch_processor.py:93-97``)."""
    w = _w(key, ts, tiebreak).rowsBetween(-(n - 1), 0)
    res = df.withColumn(out, F.collect_list(value).over(w))
    if full_only:
        res = res.filter(F.size(out) == n)
    return res


def bucketed_trailing_mean(
    df: DataFrame,
    key: str,
    ts: str,
    value: str,
    n: int,
    bucket_seconds: int,
    tiebreak: str | None = None,
    out: str = "trailing_mean",
) -> DataFrame:
    """Trailing-``n`` mean for the one shape a plain row window can't
    split: a single giant key (one symbol holding ~all of a 100 TB tick
    table). ``trailing_mean`` partitions by ``key``, so that key's whole
    history lands in ONE task's sort. Here the series is split into
    coarse time buckets and the window runs partitioned by
    ``(key, bucket)`` — every bucket sorts in parallel.

    Exactness across bucket boundaries: the first ``n-1`` rows of each
    bucket need rows from *earlier* buckets. Per-bucket tails (the last
    ``n-1`` rows by ``(ts, tiebreak)``) are found with ``row_number``
    over a ``(key, bucket)`` window — Spark's window sort is EXTERNAL
    (spills to disk), so a 270 GB bucket ranks without materializing in
    memory — and only those ≤``n-1`` rows per bucket reach the
    ``collect_list`` that builds the tail array (bounded O(n) per
    group, never the whole bucket). Each bucket's **carry** — the last
    ``n-1`` rows of the concatenation of ALL earlier buckets' tails —
    comes from a second window over the tails table itself: since every
    non-empty bucket's tail holds ≥1 row (and empty buckets have no
    tails row at all), those last ``n-1`` rows always lie within the
    previous ``n-1`` tails, so a ``rowsBetween(-(n-1), -1)`` frame +
    flatten + tail-slice is exact and LINEAR in the bucket count (an
    earlier formulation built an O(B²·n) per-key prefix table; probed
    at B=1000/10M rows it doubled the wall time). Carry rows are
    injected flagged and filtered from the output, so the result is
    row-for-row identical to ``trailing_mean`` for every occupancy
    pattern, including empty and sparse buckets.

    Cost model at scale: the data passes two ``(key, bucket)``-keyed
    shuffles (the rank pass and the final window); per-bucket memory is
    O(n) structs after the rank filter; the carry pass moves only
    B·(n-1) structs per key through one ``(key)``-keyed window. B
    (buckets per key) is a free parallelism knob — for 100 TB of one
    symbol, hourly buckets give B≈8760 tasks of ~11 GB, each an
    external sort.
    """
    if n <= 1:
        # Trailing mean of one row is the row itself — no carry, no
        # bucketing, no shuffle (and F.slice(arr, 0, 0) below would
        # raise INVALID_PARAMETER_VALUE.START for n=1).
        return df.withColumn(out, F.col(value).cast("double"))

    b_col = _free_name("_b", df.columns)
    carry_col = _free_name("_carry", df.columns)
    rn_col = _free_name("_rn", df.columns)

    sec = F.col(ts).cast("timestamp").cast("double")
    base = df.withColumn(
        b_col, F.floor(sec / F.lit(float(bucket_seconds))).cast("long")
    ).withColumn(carry_col, F.lit(False))

    # Per-(key, bucket) tail: rank rows newest-first with a window
    # (external sort — spillable) and keep only the last n-1; the
    # collect_list then aggregates at most n-1 rows per group. Struct
    # field order (ts, tiebreak, value) makes sort_array order by the
    # window's ORDER BY.
    desc_order = [F.col(ts).desc()] + ([F.col(tiebreak).desc()] if tiebreak else [])
    w_rank = Window.partitionBy(key, b_col).orderBy(*desc_order)
    tail_fields = [F.col(ts).alias("_ts")] + (
        [F.col(tiebreak).alias("_tb")] if tiebreak else []
    ) + [F.col(value).alias("_v")]
    tails = (
        base.withColumn(rn_col, F.row_number().over(w_rank))
        .filter(F.col(rn_col) <= n - 1)
        .groupBy(key, b_col)
        .agg(F.sort_array(F.collect_list(F.struct(*tail_fields))).alias("_tail"))
    )

    last_n1 = lambda arr: F.when(  # noqa: E731 — local plan fragment
        F.size(arr) <= n - 1, arr
    ).otherwise(F.slice(arr, -(n - 1), n - 1))

    # carry[bucket] = last n-1 rows of all earlier tails. Every tails
    # row holds >=1 row (empty buckets have no tails row), so the
    # previous n-1 tails always cover it — a bounded window frame,
    # linear in B. First bucket per key: empty frame -> [] -> no rows.
    w_carry = Window.partitionBy(key).orderBy(b_col).rowsBetween(-(n - 1), -1)
    carries = (
        tails.withColumn("_prev", F.flatten(F.collect_list("_tail").over(w_carry)))
        .select(F.col(key), F.col(b_col), F.explode(last_n1(F.col("_prev"))).alias("_r"))
    )

    carry_cols = [F.col(key), F.col(b_col), F.col("_r._ts").alias(ts)] + (
        [F.col("_r._tb").alias(tiebreak)] if tiebreak else []
    ) + [F.col("_r._v").alias(value), F.lit(True).alias(carry_col)]
    carry_rows = carries.select(*carry_cols)

    unioned = base.unionByName(carry_rows, allowMissingColumns=True)
    order = [F.col(ts)] + ([F.col(tiebreak)] if tiebreak else [])
    w = (
        Window.partitionBy(key, b_col)
        .orderBy(*order)
        .rowsBetween(-(n - 1), 0)
    )
    return (
        unioned.withColumn(out, F.avg(value).over(w))
        .filter(~F.col(carry_col))
        .drop(b_col, carry_col)
    )


def lag_returns(
    df: DataFrame,
    key: str,
    ts: str,
    value: str,
    lag: int = 1,
    out: str = "return_pct",
    tiebreak: str | list[str] | None = None,
) -> DataFrame:
    """Per-key lag-``lag`` percent return: (v - lag(v)) / lag(v) * 100.
    NULL when there is no previous value OR it is exactly 0 — under
    ANSI mode (Spark 4 default) a plain division would ERROR the whole
    job on the first zero price; ``try_divide`` degrades it to NULL
    per-row. (Found by the sf0.1 differential: sf0.01 had no zeros.)"""
    w = _w(key, ts, tiebreak)
    prev = F.lag(value, lag).over(w)
    return df.withColumn(out, F.try_divide(F.col(value) - prev, prev) * 100)


def tumbling_ohlc(
    df: DataFrame,
    key: str,
    ts: str,
    value: str,
    duration: str = "1 hour",
    seq: str | None = None,
) -> DataFrame:
    """Tumbling-window OHLC bars per key. Open/close are picked by
    ``min_by``/``max_by`` on a unique sequence column (``seq``, default
    ``ts``) so results are deterministic under ties. Map-side partial
    aggregation (hash agg) keeps the shuffle to one row per (key, bucket).
    """
    seq = seq or ts
    bucket = F.window(ts, duration)
    return (
        df.groupBy(F.col(key), bucket.alias("w"))
        .agg(
            F.min_by(value, seq).alias("open"),
            F.max(value).alias("high"),
            F.min(value).alias("low"),
            F.max_by(value, seq).alias("close"),
            F.count(F.lit(1)).alias("n_ticks"),
        )
        .select(key, F.col("w.start").alias("bucket_start"), "open", "high", "low", "close", "n_ticks")
    )


def ohlc_rollup_levels(
    df: DataFrame,
    key: str,
    ts: str,
    value: str,
    seq: str,
    levels: tuple[str, ...] = ("1 minute", "1 hour", "1 day"),
    single_scan: bool = True,
) -> DataFrame:
    """Multi-resolution OHLC bars (minute → hour → day) where each
    coarser level is derived from the PREVIOUS level's bars, not from
    raw data — the continuous-aggregate / hypertable-rollup pattern.

    Why it matters at 100 TB: raw ticks feed exactly ONE aggregation
    (the finest level's groupBy); every coarser level aggregates a
    table that is orders of magnitude smaller (one row per
    (key, bucket)), so the marginal cost of each extra resolution is
    ~zero. Computing each level independently would re-scan the raw
    table per level.

    ``single_scan=True`` materializes the fine level with a lazy
    ``localCheckpoint`` before fanning out. This is load-bearing, not
    an optimization flag: the three union branches are three different
    logical subtrees (Catalyst prunes the seq-carry columns out of the
    finest branch), so WITHOUT the cut Spark plans three full raw
    scans — ReuseExchange never fires because the pruned aggregates
    differ. Materialized storage is one row per (key, fine-bucket) —
    a production pipeline writes this level to a table instead (the
    "continuous aggregate" itself) and gets incremental refresh of all
    coarser levels for free.

    Exactness of the rollup: the partials are MERGEABLE because each
    bar carries the sequence ids its open/close were chosen by
    (open = value at min ``seq``, close = value at max ``seq``);
    merging bars picks the open of the bar with the smallest open-seq
    and the close of the bar with the largest close-seq, which equals
    the direct computation for ANY seq ordering — even when ``seq``
    disagrees with ``ts`` order. high/low/count merge trivially.
    ``levels`` must be coarsening multiples (epoch-aligned windows
    nest: each fine bucket lies in exactly one coarse bucket).

    Output: one row per (resolution, key, bucket) with the level label
    in ``resolution``."""
    partial = ohlc_partials(df, key, ts, value, seq, levels[0])
    if single_scan:
        partial = partial.localCheckpoint(eager=False)
    out_cols = [key, "bucket_start", "open", "high", "low", "close", "n_ticks"]
    result = partial.select(F.lit(levels[0]).alias("resolution"), *out_cols)
    prev = partial
    for lvl in levels[1:]:
        prev = merge_ohlc_bars(prev, key, lvl)
        result = result.unionByName(prev.select(F.lit(lvl).alias("resolution"), *out_cols))
    return result


def ohlc_partials(
    df: DataFrame, key: str, ts: str, value: str, seq: str, duration: str
) -> DataFrame:
    """Mergeable OHLC bars at one resolution: alongside open/high/low/
    close/count, each bar carries ``open_seq``/``close_seq`` — the
    sequence ids its open/close were chosen by — which is what makes
    two bars for the same (key, bucket) (or nested buckets) combinable
    EXACTLY via :func:`merge_ohlc_bars`. This is the schema a
    materialized continuous aggregate stores."""
    return (
        df.groupBy(F.col(key), F.window(ts, duration).alias("w"))
        .agg(
            F.min(seq).alias("open_seq"),
            F.min_by(value, seq).alias("open"),
            F.max(value).alias("high"),
            F.min(value).alias("low"),
            F.max(seq).alias("close_seq"),
            F.max_by(value, seq).alias("close"),
            F.count(F.lit(1)).alias("n_ticks"),
        )
        .select(
            key, F.col("w.start").alias("bucket_start"),
            "open_seq", "open", "high", "low", "close_seq", "close", "n_ticks",
        )
    )


def merge_ohlc_bars(bars: DataFrame, key: str, duration: str | None = None) -> DataFrame:
    """Combine mergeable bars (:func:`ohlc_partials` schema): with
    ``duration``, roll fine buckets up into coarser epoch-aligned
    windows; with ``None``, merge multiple bars of the SAME bucket
    (the incremental-refresh case — a new batch's partial bar plus the
    stored bar). Open/close follow the min/max carried seq, so the
    merge equals recomputing from raw for any split of the rows."""
    if duration is None:
        grouped = bars.groupBy(F.col(key), F.col("bucket_start"))
        start = F.col("bucket_start")
    else:
        grouped = bars.groupBy(F.col(key), F.window("bucket_start", duration).alias("w"))
        start = F.col("w.start")
    return grouped.agg(
        F.min("open_seq").alias("open_seq"),
        F.min_by("open", "open_seq").alias("open"),
        F.max("high").alias("high"),
        F.min("low").alias("low"),
        F.max("close_seq").alias("close_seq"),
        F.max_by("close", "close_seq").alias("close"),
        F.sum("n_ticks").alias("n_ticks"),
    ).select(
        key, start.alias("bucket_start"),
        "open_seq", "open", "high", "low", "close_seq", "close", "n_ticks",
    )


def refresh_ohlc_fine(
    spark,
    fine_path: str,
    new_raw: DataFrame,
    key: str,
    ts: str,
    value: str,
    seq: str,
    duration: str = "1 minute",
    partition_col: str | None = "part_date",
) -> int:
    """Incremental maintenance of a MATERIALIZED fine-bar table — the
    refresh half of the continuous-aggregate pattern
    (:func:`ohlc_rollup_levels` documents the query half). Only the new
    batch's raw rows are aggregated; their partial bars merge with the
    stored bars of exactly the affected (key, bucket)s (exact via the
    seq carries, so LATE data takes the same path as new data), and the
    result MERGEs back replacing those bars only.

    ``partition_col`` (default on): the table is laid out partitioned
    by ``to_date(bucket_start)`` and the merge-back rewrites ONLY the
    dates the batch touched (dynamic partition overwrite) — this is
    what makes refresh cost O(batch) + O(affected partitions) instead
    of a full-table rewrite as history accumulates. ``None`` stores a
    flat table and rewrites all of it each refresh — only for
    short-lived scratch tables. The first refresh writes the same
    layout, so later merges always see a consistently-partitioned
    table. Readers should drop/ignore the partition column.
    Returns the number of bar rows written by the merge.

    Layout/guard/prune scaffolding lives in
    :func:`operators.maintenance.refresh_partials` (shared with the
    HLL sketch store so the lockstep invariants — epoch-days UTC
    partition date, layout-mismatch errors — have one home); only the
    bar-specific merge function is supplied here."""
    from .maintenance import refresh_partials

    batch = ohlc_partials(new_raw, key, ts, value, seq, duration)
    return refresh_partials(
        spark,
        fine_path,
        batch,
        [key, "bucket_start"],
        lambda existing, b: merge_ohlc_bars(existing.unionByName(b), key),
        partition_col,
        table_desc="bar table",
    )


def vwap(
    df: DataFrame,
    key: str,
    value: str,
    weight: str,
    extra_keys: list[str] | None = None,
    out: str = "vwap",
) -> DataFrame:
    """Weighted average price sum(v*w)/sum(w) per key — one shuffle with
    map-side combine."""
    keys = [key] + (extra_keys or [])
    return df.groupBy(*keys).agg(
        (F.sum(F.col(value) * F.col(weight)) / F.sum(weight)).alias(out),
        F.sum(weight).alias("total_weight"),
    )


def sessionize(
    df: DataFrame,
    key: str,
    ts: str,
    gap_minutes: float,
    tiebreak: str | list[str] | None = None,
) -> DataFrame:
    """Assign session ids per key: a new session starts when the gap to
    the previous event exceeds ``gap_minutes``. Classic lag + running-sum
    composition — two window passes over the same partitioning (one
    shuffle; the second window reuses the first's sort)."""
    w = _w(key, ts, tiebreak)
    # via TIMESTAMP first: a direct TIMESTAMP_NTZ->double cast is illegal
    # (driver testdata ships ts as NTZ; session tz is UTC so the hop is
    # value-identity)
    sec = F.col(ts).cast("timestamp").cast("double")
    gap_s = sec - F.lag(sec).over(w)
    is_new = F.when(gap_s.isNull() | (gap_s > gap_minutes * 60), 1).otherwise(0)
    return df.withColumn("_new", is_new).withColumn(
        "session_id", F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0))
    ).drop("_new")


def ewma_final(
    df: DataFrame,
    key: str,
    ts: str,
    value: str,
    alpha: float,
    tiebreak: str | None = None,
    out: str = "ewma",
) -> DataFrame:
    """Final EWMA per key: ewma_t = α·x_t + (1-α)·ewma_{t-1}, seeded
    with the first value. A recursive definition no window frame can
    express — instead each key's ordered values fold once through
    ``F.aggregate`` (linear work per key, one shuffle). For per-ROW
    ewma streams use streaming/stateful.continuous_ewma (state carry);
    for unbounded histories segment the fold by coarse time bucket and
    stitch with the carry formula ewma = w·seg + (1-w)·prev."""
    order = [F.col(ts)] + ([F.col(tiebreak)] if tiebreak else [])
    sortable = F.struct(*order, F.col(value).alias("_v"))
    grouped = df.groupBy(key).agg(F.sort_array(F.collect_list(sortable)).alias("_s"))
    vals = F.transform(F.col("_s"), lambda r: r["_v"])
    fold = F.aggregate(
        vals,
        F.lit(None).cast("double"),
        lambda acc, x: F.when(acc.isNull(), x).otherwise(F.lit(alpha) * x + F.lit(1.0 - alpha) * acc),
    )
    return grouped.select(F.col(key), fold.alias(out), F.size("_s").alias("n_obs"))


# gapfill grid chunk: bounds the per-row F.sequence array so a wide
# sparse span can't build one giant in-memory array (see gapfill_locf)
_GRID_CHUNK = 8192


def gapfill_locf(
    df: DataFrame,
    key: str,
    ts: str,
    value: str,
    bucket_seconds: int,
    out: str = "value_filled",
) -> DataFrame:
    """Regularize an irregular series onto a fixed time grid with
    last-observation-carried-forward — the hypertable
    ``time_bucket_gapfill + locf`` shape: one row per (key, bucket) for
    EVERY bucket between the key's first and last observation, empty
    buckets filled with the most recent earlier bucket's value and
    flagged ``gap_filled``.

    Plan: raw rows aggregate to per-(key, bucket) means (map-side
    combined — the 100 TB side collapses before anything else
    happens); each key's [min, max] bucket span (one row per key)
    explodes into its dense grid, LEFT joins the bars, and one per-key
    window carries values forward. Grid ROW count is
    span/bucket_seconds per key — bounded by time coverage,
    independent of raw row count — and the explode is TWO-LEVEL
    (chunks of ``_GRID_CHUNK`` buckets, then buckets within the
    chunk), so no single row ever materializes more than one
    chunk-sized array: a sparse key spanning 10 years at 1-second
    buckets (~3.2e8 grid rows) builds ~4e4 chunk ids and 8192-element
    inner arrays instead of one ~2.5 GB sequence that would OOM the
    executor or trip Spark's array-length cap. The bars aggregate,
    the grid join, and the LOCF window all key on (key[, bucket]) —
    no global sort, no skew beyond what the raw aggregation already
    absorbs."""
    sec = F.col(ts).cast("timestamp").cast("double")
    bucket = F.floor(sec / F.lit(float(bucket_seconds))).cast("long")
    bars = df.groupBy(F.col(key), bucket.alias("bucket")).agg(F.avg(value).alias("_v"))
    spans = bars.groupBy(key).agg(F.min("bucket").alias("_b0"), F.max("bucket").alias("_b1"))
    chunk = F.lit(_GRID_CHUNK)
    chunks = spans.select(
        F.col(key),
        "_b0",
        "_b1",
        F.explode(F.sequence(F.floor(F.col("_b0") / chunk), F.floor(F.col("_b1") / chunk))).alias("_ch"),
    )
    lo = F.greatest(F.col("_ch") * chunk, F.col("_b0"))
    hi = F.least(F.col("_ch") * chunk + chunk - 1, F.col("_b1"))
    grid = chunks.select(F.col(key), F.explode(F.sequence(lo, hi)).alias("bucket"))
    joined = grid.join(bars, [key, "bucket"], "left")
    w = (
        Window.partitionBy(key)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        joined.withColumn(out, F.last("_v", ignorenulls=True).over(w))
        .withColumn("gap_filled", F.col("_v").isNull())
        .withColumn(
            "bucket_start",
            F.timestamp_seconds(F.col("bucket") * F.lit(bucket_seconds)),
        )
        .drop("_v")
    )


def rolling_corr(
    df: DataFrame,
    key: str,
    ts: str,
    x: str,
    y: str,
    n: int,
    out: str = "rolling_corr",
    tiebreak: str | list[str] | None = None,
) -> DataFrame:
    """Trailing-``n``-row Pearson correlation of two series per key —
    co-movement drift detection (price vs volume, metric vs metric).
    Same distribution shape as ``trailing_mean``: one hash shuffle on
    the key, an external per-key sort, O(1) state per window step.
    Windows with < 2 points or zero variance yield NULL.

    Not ``F.corr`` over the frame: under ANSI mode (Spark 4 default) a
    degenerate frame — every key's FIRST row, or any constant-x run —
    raises DIVIDE_BY_ZERO and kills the job. Instead the textbook
    sum-formula runs over the frame with ``try_divide``, made
    numerically safe by FIRST centering both series on their per-key
    means (Pearson r is shift-invariant, and centered sums avoid the
    n·Σxy − Σx·Σy cancellation blow-up that makes the raw formula
    wrong for large-magnitude series). Both the centering window and
    the frame share one partitioning + sort. Rows where either series
    is NULL drop out of the window pairs (pairwise-complete, matching
    SQL ``corr``)."""
    w_full = _w(key, ts, tiebreak).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    w = _w(key, ts, tiebreak).rowsBetween(-(n - 1), 0)
    both = F.col(x).isNotNull() & F.col(y).isNotNull()
    cx = F.when(both, F.col(x) - F.avg(x).over(w_full))
    cy = F.when(both, F.col(y) - F.avg(y).over(w_full))
    d = df.withColumn("_cx", cx).withColumn("_cy", cy)
    cnt = F.count("_cx").over(w)
    sx, sy = F.sum("_cx").over(w), F.sum("_cy").over(w)
    sxx = F.sum(F.col("_cx") * F.col("_cx")).over(w)
    syy = F.sum(F.col("_cy") * F.col("_cy")).over(w)
    sxy = F.sum(F.col("_cx") * F.col("_cy")).over(w)
    num = sxy - F.try_divide(sx * sy, cnt)
    denx = F.greatest(sxx - F.try_divide(sx * sx, cnt), F.lit(0.0))
    deny = F.greatest(syy - F.try_divide(sy * sy, cnt), F.lit(0.0))
    return d.withColumn(out, F.try_divide(num, F.sqrt(denx * deny))).drop("_cx", "_cy")


def time_weighted_average(
    df: DataFrame,
    key: str,
    ts: str,
    value: str,
    bucket: str = "hour",
    tiebreak: str | list[str] | None = None,
) -> DataFrame:
    """TWAP — TIME-weighted average per (key, time bucket): each
    observation holds until the NEXT one in the same bucket, so its
    weight is that interval's duration in seconds (the last
    observation of a bucket carries no weight — the standard
    right-open segment convention, making the result independent of
    anything outside the bucket). The row-weighted mean (VWAP/AVG)
    over-counts bursts of ticks; TWAP is the fix market-data and
    sensor pipelines use.

    Shape: one lead() per (key, bucket) partition — the same single
    shuffle every trailing window here costs — then a partial-
    aggregating groupBy. Buckets whose total duration is zero (single
    observation, or all ticks at one instant) are dropped rather than
    emitted as NULL/∞."""
    secs = F.col(ts).cast("timestamp").cast("double")
    b = df.withColumn("_bkt", F.date_trunc(bucket, F.col(ts)))
    tb = [tiebreak] if isinstance(tiebreak, str) else list(tiebreak or [])
    w = Window.partitionBy(key, "_bkt").orderBy(
        F.col(ts), *[F.col(c) for c in tb]
    )
    dt = F.lead(secs).over(w) - secs
    seg = b.withColumn("_dt", dt)
    return (
        seg.groupBy(key, "_bkt")
        .agg(
            F.sum(F.col(value) * F.col("_dt")).alias("_num"),
            F.sum("_dt").alias("_den"),
            F.count("_dt").cast("long").alias("n_segments"),
        )
        .where(F.col("_den") > 0)
        .select(
            key,
            F.col("_bkt").alias("bucket_start"),
            (F.col("_num") / F.col("_den")).alias("twap"),
            "n_segments",
        )
    )


def rolling_percentile(
    df: DataFrame,
    key: str,
    ts: str,
    value: str,
    p: float,
    n: int,
    out: str = "rolling_pct",
    tiebreak: str | list[str] | None = None,
) -> DataFrame:
    """EXACT percentile (continuous interpolation) over a trailing
    ``n``-row window per key — the robust-statistics complement of the
    trailing mean (a rolling median shrugs off the outliers that drag
    a mean). Spark's ``percentile`` and DuckDB's ``quantile_cont``
    share the interpolation definition, so results differential-check
    bitwise.

    Scale note: an exact windowed percentile keeps each frame's values
    — O(n) state per row, fine for the trailing-k shapes used here; an
    unbounded or very wide frame should switch to the mergeable binned
    histograms in operators/sketches.py (quantile_rollup faces)."""
    w = _w(key, ts, tiebreak).rowsBetween(-(n - 1), 0)
    return df.withColumn(out, F.expr(f"percentile({value}, {p})").over(w))


def seasonal_decompose(
    df: DataFrame,
    key: str,
    ts: str = "ts",
    value: str = "value",
    trend_hours: int = 24,
) -> DataFrame:
    """Naive seasonal decomposition of an hourly series per ``key``:
    v = trend + seasonal + residual — the classic-decomposition shape
    (hourly means → trailing ``trend_hours``-row moving average →
    hour-of-day means of the detrended series → residual). The
    dashboard/anomaly-triage verb: "is this spike trend, time-of-day,
    or genuinely unusual?".

    Plan: one groupBy to the hourly grid (map-side combined — this is
    the only pass over raw rows), then two windows over the GRID
    (rows-bounded trend per key, unordered hour-of-day partition for
    the seasonal profile) — grid rows are ~raw/1000s, so the window
    stages are metadata-cheap at any corpus size. ROWS framing (not
    RANGE) keeps the trend exactly reproducible across engines on a
    gappy grid."""
    bkt = F.date_trunc("hour", F.col(ts))
    hourly = df.groupBy(F.col(key), bkt.alias("bkt")).agg(F.avg(value).alias("v"))
    w_tr = (
        Window.partitionBy(key).orderBy("bkt").rowsBetween(-(trend_hours - 1), 0)
    )
    t = hourly.withColumn("trend", F.avg("v").over(w_tr))
    w_se = Window.partitionBy(key, F.hour("bkt"))
    s = t.withColumn("seasonal", F.avg(F.col("v") - F.col("trend")).over(w_se))
    return s.withColumn("resid", F.col("v") - F.col("trend") - F.col("seasonal"))
