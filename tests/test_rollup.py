"""Multi-resolution OHLC rollup (operators/windows.ohlc_rollup_levels):
the coarse levels are derived from fine-level partials — these tests pin
that the rollup equals computing each level directly from raw rows, in
particular when the open/close sequence order DISAGREES with ts order
(the case the mergeable (open_seq, close_seq) carry exists for)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from stock_price_prediction_using_stream_and_batch_processing_spark.operators import windows


def _direct(df, duration):
    bars = windows.tumbling_ohlc(df, "k", "ts", "v", duration, seq="seq")
    return {
        (r["k"], r["bucket_start"]): (r["open"], r["high"], r["low"], r["close"], r["n_ticks"])
        for r in bars.collect()
    }


def test_rollup_equals_direct_with_seq_ts_disagreement(spark):
    # seq assigned so that within several buckets the min-seq row is NOT
    # the earliest-ts row: rollup must still pick open/close by seq.
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = []
    seq = 1000
    for k in ("a", "b"):
        for i in range(180):  # 3 hours of minutes
            # descending seq within each 20-minute run flips seq vs ts
            seq_val = seq + (19 - i % 20) + (i // 20) * 100
            rows.append((k, base + dt.timedelta(minutes=i, seconds=i % 7), float(i % 13) + 0.5, seq_val))
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double, seq long")

    out = windows.ohlc_rollup_levels(df, "k", "ts", "v", seq="seq", levels=("1 minute", "1 hour", "3 hours"))
    got = {
        (r["resolution"], r["k"], r["bucket_start"]): (
            r["open"], r["high"], r["low"], r["close"], r["n_ticks"]
        )
        for r in out.collect()
    }

    for res, dur in (("1 minute", "1 minute"), ("1 hour", "1 hour"), ("3 hours", "3 hours")):
        want = _direct(df, dur)
        have = {(k, b): v for (r, k, b), v in got.items() if r == res}
        assert have == want, f"resolution {res} diverges from direct computation"


def test_rollup_single_scan_of_raw(spark):
    """single_scan=True must cut the raw source out of the union's
    branches: after the fine level's lazy localCheckpoint, every branch
    reads the materialized RDD (no raw-source leaf anywhere in the
    executed plan). Without it, Catalyst's per-branch pruning plans one
    full raw scan PER LEVEL — the shape the flag exists to prevent."""
    df = spark.range(10_000).select(
        F.lit("k").alias("k"),
        F.timestamp_seconds(F.lit(1_700_000_000) + F.col("id") * 60).alias("ts"),
        (F.col("id") % 7).cast("double").alias("v"),
        F.col("id").alias("seq"),
    )
    levels = ("1 minute", "1 hour", "1 day")

    shared = windows.ohlc_rollup_levels(df, "k", "ts", "v", seq="seq", levels=levels)
    shared.write.format("noop").mode("overwrite").save()
    plan_shared = shared._jdf.queryExecution().executedPlan().toString()
    # the raw source is a Range leaf; after the checkpoint cut no branch
    # may contain it — they all read the one materialized fine level
    assert "Range (" not in plan_shared
    assert plan_shared.count("Scan ExistingRDD") == 3

    rescans = windows.ohlc_rollup_levels(
        df, "k", "ts", "v", seq="seq", levels=levels, single_scan=False
    )
    plan_rescan = rescans._jdf.queryExecution().executedPlan().toString()
    assert plan_rescan.count("Range (") == 3


def test_incremental_fine_refresh_equals_full_recompute(spark, tmp_path):
    """Two refreshes (second containing LATE rows for already-
    materialized buckets) must leave the fine-bar table identical to a
    one-shot aggregation of all raw rows, and coarse levels derived
    from the maintained table must equal direct computation."""
    base = dt.datetime(2024, 3, 1, 0, 0, 0)
    raw = []
    for k in ("x", "y"):
        for i in range(240):
            raw.append((k, base + dt.timedelta(minutes=i // 2, seconds=13 * (i % 2)), float((i * 7) % 23) + 0.25, 10_000 - i))
    # batch 2 = every 5th row (late arrivals hitting existing buckets)
    # plus a brand-new bucket at the end
    b2 = [r for j, r in enumerate(raw) if j % 5 == 0]
    b1 = [r for j, r in enumerate(raw) if j % 5 != 0]
    b2.append(("x", base + dt.timedelta(hours=9), 99.5, 20_000))
    all_rows = b1 + b2
    schema = "k string, ts timestamp, v double, seq long"
    fine_path = str(tmp_path / "fine_bars")

    windows.refresh_ohlc_fine(spark, fine_path, spark.createDataFrame(b1, schema), "k", "ts", "v", "seq")
    windows.refresh_ohlc_fine(spark, fine_path, spark.createDataFrame(b2, schema), "k", "ts", "v", "seq")

    maintained = spark.read.parquet(fine_path).drop("part_date")
    # the table on disk must be date-partitioned (merge scoping)
    import os

    assert any(e.startswith("part_date=") for e in os.listdir(fine_path))
    direct = windows.ohlc_partials(spark.createDataFrame(all_rows, schema), "k", "ts", "v", "seq", "1 minute")
    key_fn = lambda r: (r["k"], r["bucket_start"])  # noqa: E731
    assert sorted(maintained.collect(), key=key_fn) == sorted(direct.collect(), key=key_fn)

    hour_from_fine = windows.merge_ohlc_bars(maintained, "k", "1 hour")
    hour_direct = windows.ohlc_partials(spark.createDataFrame(all_rows, schema), "k", "ts", "v", "seq", "1 hour")
    assert sorted(hour_from_fine.collect(), key=key_fn) == sorted(hour_direct.collect(), key=key_fn)


def test_histogram_rollup_equals_direct_and_bounds_error(spark):
    """The binned-quantile family (operators/quality): (1) day-level
    histograms rolled up from hourly partials must EQUAL a direct
    day-level build (counts add exactly for any split); (2) the
    quantile estimate read from the bins must sit within one bin width
    of the exact percentile."""
    from stock_price_prediction_using_stream_and_batch_processing_spark.operators import quality

    ev = (
        spark.range(20_000)
        .select(
            F.timestamp_seconds(F.lit(1_700_000_000) + F.col("id") * 7).alias("ts"),
            # mass inside [10, 490): the within-one-bin error bound only
            # holds for quantiles INSIDE [lo, hi) — clamped out-of-range
            # mass pins its bin to the edge (edge behavior is covered by
            # the rollup-equality check, which includes the clamp bins)
            (F.pmod(F.hash("id").cast("double"), F.lit(480.0)) + 10.0).alias("value"),
        )
    )
    fine = quality.binned_histogram_tables(ev, "ts", "value", 0.0, 500.0, 200, fine="hour")
    rolled = quality.histogram_rollup(fine, coarse="day")
    direct = quality.binned_histogram_tables(ev, "ts", "value", 0.0, 500.0, 200, fine="day")
    assert rolled.exceptAll(direct).count() == 0 and direct.exceptAll(rolled).count() == 0

    est = quality.binned_quantiles(rolled, (0.5, 0.95), 0.0, 500.0, 200).collect()
    exact = (
        ev.groupBy(F.date_trunc("day", "ts").alias("bucket_start"))
        .agg(
            F.expr("percentile(value, 0.5)").alias("p50"),
            F.expr("percentile(value, 0.95)").alias("p95"),
        )
        .collect()
    )
    exact_by_day = {r["bucket_start"]: r for r in exact}
    width = 500.0 / 200
    for r in est:
        ex = exact_by_day[r["bucket_start"]]
        assert abs(r["p50_est"] - ex["p50"]) <= width, (r, ex["p50"])
        assert abs(r["p95_est"] - ex["p95"]) <= width, (r, ex["p95"])
