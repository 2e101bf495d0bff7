#!/usr/bin/env python
"""Scale probes for the r12 lakehouse additions: partitioned tables /
dynamic overwrite, positional-delete read tax, incremental ANALYZE.

Synthetic data, local tmp dirs; prints one markdown table per probe.
Usage: python scripts/lakehouse_scale_probe.py
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from stock_price_prediction_using_stream_and_batch_processing_spark import get_spark
from stock_price_prediction_using_stream_and_batch_processing_spark.operators import snapshots as snap


def t(fn):
    t0 = time.time()
    out = fn()
    return time.time() - t0, out


def probe_partitions(spark, base):
    print("\n## Partitioned table: metadata ops vs partition count\n")
    print("| partitions | append_s | show_partitions_ms | prune keeps | overwrite 1 part_s |")
    print("|---|---|---|---|---|")
    for P in (16, 64, 256):
        d = os.path.join(base, f"part{P}")
        df = (
            spark.range(0, P * 200)
            .select(
                F.col("id").alias("k"),
                (F.col("id") % P).cast("string").alias("p"),
                (F.col("id") * 2).alias("v"),
            )
            .repartition(8, "p")
        )
        a_s, _ = t(lambda: snap.snapshot_append(
            spark, d, df, stats_cols=["k"], partition_by=["p"]))
        sp_s, pvs = t(lambda: snap.partition_values(d))
        n_files = len(snap.snapshot_files(d))
        kept = len(
            [e for e in snap.snapshot_files(d) if e["pv"]["p"] == "7"]
        )
        ow = spark.range(0, 50).select(
            F.col("id").alias("k"), F.lit("7").alias("p"), F.col("id").alias("v")
        )
        o_s, _ = t(lambda: snap.snapshot_overwrite_partitions(spark, d, ow))
        print(
            f"| {P} ({n_files} files) | {a_s:.2f} | {sp_s*1000:.1f} | "
            f"{kept}/{n_files} | {o_s:.2f} |"
        )
        assert len(pvs) == P


def probe_pos_delete_tax(spark, base):
    print("\n## Positional-delete read tax (64-file table, delete touches 1 file)\n")
    print("| read | seconds |")
    print("|---|---|")
    d = os.path.join(base, "posdel")
    df = spark.range(0, 640_000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    snap.snapshot_append(spark, d, df.repartitionByRange(64, "k"), stats_cols=["k"])
    clean_s, _ = t(lambda: snap.read_snapshot(spark, d).count())
    v = snap.snapshot_position_delete(
        spark, d, "k >= 1000 AND k < 1100", prune_col="k", lo=1000, hi=1099
    )
    meta = snap.read_snapshot_meta(d, v)
    touched = len(meta["pos_delete_files"][-1]["paths"])
    mor_s, n = t(lambda: snap.read_snapshot(spark, d).count())
    assert n == 639_900
    snap.snapshot_compact(spark, d, target_files=64)
    post_s, n2 = t(lambda: snap.read_snapshot(spark, d).count())
    assert n2 == 639_900
    print(f"| clean (pre-delete) | {clean_s:.2f} |")
    print(f"| merge-on-read ({touched} of 64 files touched) | {mor_s:.2f} |")
    print(f"| post-OPTIMIZE (materialized) | {post_s:.2f} |")


def probe_analyze_incremental(spark, base):
    print("\n## Incremental ANALYZE (cost tracks ingest, not table)\n")
    print("| step | files_scanned | seconds |")
    print("|---|---|---|")
    d = os.path.join(base, "ndv")
    df = spark.range(0, 320_000).select(
        F.col("id").alias("k"), (F.col("id") % 50_000).alias("u")
    )
    snap.snapshot_append(spark, d, df.repartition(32), stats_cols=["k"])
    s1, r1 = t(lambda: snap.snapshot_analyze(spark, d, ["u"], m=1 << 17))
    snap.snapshot_append(
        spark,
        d,
        spark.range(320_000, 340_000).select(
            F.col("id").alias("k"), (F.col("id") % 50_000).alias("u")
        ).repartition(2),
        stats_cols=["k"],
    )
    s2, r2 = t(lambda: snap.snapshot_analyze(spark, d, ["u"], m=1 << 17))
    s3, ndv = t(lambda: snap.table_ndv(d, "u"))
    print(f"| first ANALYZE (32 files) | {r1['files_scanned']} | {s1:.2f} |")
    print(f"| re-ANALYZE after +2 files | {r2['files_scanned']} | {s2:.2f} |")
    print(f"| table_ndv (metadata fold) | 0 | {s3:.3f} |")
    print(f"\nndv_estimate {ndv['ndv_estimate']:.0f} vs exact 50000 "
          f"({abs(ndv['ndv_estimate']-50000)/500:.1f}% err, "
          f"saturated={ndv['saturated']}, m=131072)")
    # the saturation cliff, demonstrated: a 50k-NDV column under the
    # default m=4096 occupies ~every bucket and the estimate pins to
    # ~m*ln(m) — table_ndv must flag it
    d2 = os.path.join(base, "ndv_small_m")
    df2 = spark.range(0, 100_000).select(
        F.col("id").alias("k"), (F.col("id") % 50_000).alias("u")
    )
    snap.snapshot_append(spark, d2, df2.repartition(8), stats_cols=["k"])
    snap.snapshot_analyze(spark, d2, ["u"])  # default m=4096
    sat = snap.table_ndv(d2, "u")
    print(f"default m=4096 on the same column: estimate "
          f"{sat['ndv_estimate']:.0f}, saturated={sat['saturated']}")
    assert sat["saturated"]


def main():
    base = tempfile.mkdtemp(prefix="lakehouse_probe_")
    spark = get_spark(app_name="lakehouse-probe")
    spark.sparkContext.setLogLevel("ERROR")
    try:
        probe_partitions(spark, base)
        probe_pos_delete_tax(spark, base)
        probe_analyze_incremental(spark, base)
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
