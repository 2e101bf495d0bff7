#!/usr/bin/env python
"""Round-12 scale probe for the refs/governance layer
(operators/refs.py + CHECK constraints + CDF): the claim is that every
governance operation is METADATA-sized — cost tracks the snapshot's
entry/shard count, never the table's data volume.

Sweep: tables of N file entries (N in {256, 4096, 65536}) built by
DIRECT metadata synthesis (one tiny real data file; N-1 synthetic
entries pointing at it — legitimate for a metadata probe: none of the
measured operations open a data file). The big N runs on the SHARDED
manifest format (inline ceiling 512), the small on inline, so the
probe also shows the sharding crossover.

Measured per N: branch_create, branch_append (1 new file),
branch_publish, tag_create, snapshot_rollback, set_constraint
(validate=False — the validating scan is data-sized BY DESIGN and
priced separately at fixed N).

Usage: python scripts/refs_scale_probe.py   (markdown to stdout;
findings land in SCALE.md)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from stock_price_prediction_using_stream_and_batch_processing_spark.operators import refs  # noqa: E402
from stock_price_prediction_using_stream_and_batch_processing_spark.operators import snapshots as snap  # noqa: E402
from stock_price_prediction_using_stream_and_batch_processing_spark.session import get_spark  # noqa: E402


def build_synthetic_table(spark, d: str, n_entries: int) -> None:
    """v1 with one REAL data file, v2 with n_entries-1 synthetic
    entries aliasing it (distinct path keys via fragment suffixes are
    not possible — entries must be unique paths, so copy the real
    file's entry with fabricated paths; no measured op dereferences
    them)."""
    df = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 2.0).alias("v")
    ).repartition(1)
    snap.snapshot_append(spark, d, df, stats_cols=["k"])
    meta = snap.read_snapshot_meta(d, 1)
    real = snap._meta_entries(meta)[0]
    entries = [dict(real)]
    for i in range(n_entries - 1):
        e = dict(real)
        e["path"] = real["path"] + f".synthetic-{i}"
        e["min_k"] = i * 1000
        e["max_k"] = i * 1000 + 999
        entries.append(e)
    snap2 = {
        "version": 2,
        "parent": 1,
        "stats_cols": ["k"],
        "schema": meta.get("schema"),
        **snap._entries_payload(d, entries, None),
    }
    snap._publish(d, 2, snap2)


def t(fn, *a, **kw):
    t0 = time.time()
    out = fn(*a, **kw)
    return (time.time() - t0) * 1000, out


def main() -> None:
    spark = get_spark()
    base = "/tmp/spark_graft_results/refs_probe"
    import shutil

    shutil.rmtree(base, ignore_errors=True)
    print("| entries | format | branch_create | branch_append(+1 file) | "
          "branch_publish | tag_create | rollback | set_constraint(novalidate) | "
          "snapshot JSON bytes |")
    print("|---|---|---|---|---|---|---|---|---|")
    for n in (256, 4096, 65536):
        d = os.path.join(base, f"n{n}")
        build_synthetic_table(spark, d, n)
        meta = snap.read_snapshot_meta(d, 2)
        fmt = "sharded" if "manifests" in meta else "inline"
        jbytes = os.path.getsize(snap._snap_path(d, 2))
        ms_bc, _ = t(refs.branch_create, d, "b")
        df1 = spark.range(0, 100).select(
            F.col("id").alias("k"), (F.col("id") * 2.0).alias("v")
        ).repartition(1)
        ms_ba, _ = t(refs.branch_append, spark, d, "b", df1)
        ms_bp, _ = t(refs.branch_publish, d, "b", drop=True)
        ms_tc, _ = t(refs.tag_create, d, "pin", 2)
        ms_rb, _ = t(refs.snapshot_rollback, d, 2)
        ms_sc, _ = t(
            snap.snapshot_set_constraint, spark, d, "c", "v >= 0", validate=False
        )
        print(
            f"| {n} | {fmt} | {ms_bc:.1f} ms | {ms_ba:.0f} ms | {ms_bp:.1f} ms | "
            f"{ms_tc:.1f} ms | {ms_rb:.1f} ms | {ms_sc:.1f} ms | {jbytes} |"
        )
    print()
    print(json.dumps({"probe": "refs_scale", "ok": True}))


if __name__ == "__main__":
    main()
