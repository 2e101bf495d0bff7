#!/usr/bin/env python
"""Round-11 scale probe for the snapshot protocol layer
(operators/snapshots.py): measures the ONE claim that matters at
100 TB — mutation cost tracks the TOUCHED footprint, not the table.

1. MERGE vs table size: tables of F in {8, 32, 128} single-file range
   commits (fixed rows/file, so data grows 16x across the sweep), then
   the SAME merge (updates+deletes confined to 2 files' ranges +
   3 out-of-range inserts). Healthy = files_rewritten stays 2 at every
   F and merge wall time is ~flat while the table grows 16x — the
   metadata range-join planning cost (F x keys) is sub-second orders
   of magnitude past this sweep.
2. Commit metadata cost: snapshot publish time vs entry-list length
   (the JSON grows linearly with files; the probe records write+rename
   wall to show where Iceberg's manifest-list sharding would take over).
3. Clustered compaction pruning: interleaved commits (every file spans
   the full key range) -> cluster_by compaction -> fraction of files a
   1%-range read touches, before vs after.

Usage: python scripts/snapshot_scale_probe.py   (markdown to stdout;
findings land in SCALE.md)
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from stock_price_prediction_using_stream_and_batch_processing_spark.operators import snapshots as snap  # noqa: E402
from stock_price_prediction_using_stream_and_batch_processing_spark.session import get_spark  # noqa: E402

ROWS_PER_FILE = 20_000


def build_range_table(spark, d: str, n_files: int) -> float:
    t0 = time.time()
    for i in range(n_files):
        lo = i * ROWS_PER_FILE
        snap.snapshot_append(
            spark,
            d,
            spark.range(lo, lo + ROWS_PER_FILE).select(
                F.col("id").alias("k"), (F.col("id") % 1000).cast("double").alias("v")
            ).repartition(1),
            stats_cols=["k"],
        )
    return time.time() - t0


def merge_probe(spark, tmp: str):
    print("\n## 1. MERGE cost vs table size (same touched footprint)\n")
    print("| files | table rows | build s | files_rewritten | merge s |")
    print("|---|---|---|---|---|")
    for n_files in (8, 32, 128):
        d = f"{tmp}/merge_{n_files}"
        build_s = build_range_table(spark, d, n_files)
        # touch exactly files 2 and 5 (updates in file 2, deletes in 5)
        upd = spark.range(2 * ROWS_PER_FILE + 10, 2 * ROWS_PER_FILE + 210).select(
            F.col("id").alias("k"), F.lit(-1.0).alias("v")
        )
        ins = spark.range(3).select(
            (F.col("id") + n_files * ROWS_PER_FILE + 1).alias("k"),
            F.lit(0.0).alias("v"),
        )
        dele = spark.range(5 * ROWS_PER_FILE + 10, 5 * ROWS_PER_FILE + 110).select(
            F.col("id").alias("k")
        )
        t0 = time.time()
        res = snap.snapshot_merge(spark, d, upd.unionByName(ins), key="k", deletes=dele)
        merge_s = time.time() - t0
        assert res["files_rewritten"] == 2, res
        print(
            f"| {n_files} | {n_files * ROWS_PER_FILE:,} | {build_s:.1f} "
            f"| {res['files_rewritten']} | {merge_s:.2f} |"
        )


def metadata_probe(spark, tmp: str):
    print("\n## 2. Commit publish cost vs entry-list length\n")
    d = f"{tmp}/merge_128"  # reuse: 128-entry table from probe 1
    meta = snap.read_snapshot_meta(d, snap.current_version(d))
    import json

    base = snap.current_version(d)
    t0 = time.time()
    # publish 20 FRESH versions: the first-writer-wins link refuses to
    # overwrite an existing slot (r11 review — the old overwrite timing
    # no longer exists as an operation)
    for i in range(1, 21):
        snap._publish(d, base + i, {**meta, "version": base + i, "parent": base + i - 1})
    per = (time.time() - t0) / 20
    print(
        f"{len(meta['files'])} entries -> {len(json.dumps(meta)) / 1024:.0f} KiB JSON, "
        f"publish (serialize + exclusive link) {per * 1000:.1f} ms"
    )


def clustering_probe(spark, tmp: str):
    print("\n## 3. Clustered compaction: pruning before/after\n")
    d = f"{tmp}/cluster"
    n, files = 400_000, 8
    for sl in range(4):  # 4 interleaved commits, each spans [0, n)
        snap.snapshot_append(
            spark,
            d,
            spark.range(n).select(
                F.col("id").alias("k"), (F.col("id") % 7).cast("double").alias("v")
            ).where(F.col("k") % 4 == sl).repartition(2),
            stats_cols=["k"],
        )
    # a 1% key range, deliberately OFF the theoretical 8-way split
    # points (multiples of n/8): repartitionByRange samples boundaries,
    # so a window starting exactly on one can legitimately straddle two
    # files even when clustering is perfect
    lo = n // 8 + n // 50
    hi = lo + n // 100

    def touched(version):
        fl = snap.snapshot_files(d, version)
        return sum(1 for e in fl if e["max_k"] >= lo and e["min_k"] <= hi), len(fl)

    t_pre, n_pre = touched(4)
    t0 = time.time()
    v = snap.snapshot_compact(spark, d, target_files=files, cluster_by=["k"])
    compact_s = time.time() - t0
    t_post, n_post = touched(v)
    print(
        f"pre: 1%-range read touches {t_pre}/{n_pre} files; "
        f"post cluster_by compaction ({compact_s:.1f} s): {t_post}/{n_post}"
    )
    # sampled range boundaries can put a window edge inside a neighbor
    # file; perfect clustering still bounds a 1% window by 2 files
    assert t_post <= 2, (t_post, n_post)


def main():
    import tempfile

    spark = get_spark(app_name="snapshot_scale_probe")
    spark.sparkContext.setLogLevel("ERROR")
    with tempfile.TemporaryDirectory(prefix="snap_probe_") as tmp:
        merge_probe(spark, tmp)
        metadata_probe(spark, tmp)
        clustering_probe(spark, tmp)


if __name__ == "__main__":
    main()
