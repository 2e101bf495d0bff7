#!/usr/bin/env python
"""Round-12 scale probe for MANIFEST-LIST SHARDING
(operators/snapshots.py): measures the claims that close VERDICT r11
missing #5 (the snapshot JSON's linear entry-list ceiling).

With synthetic entries (no Spark jobs — this is a pure metadata-layer
probe, the data plane is unchanged by sharding):

1. APPEND COMMIT COST vs table size: publish time and hot-snapshot-JSON
   bytes for a 64-file append onto tables of N in {1k, 8k, 64k, 256k}
   existing files — INLINE format (rewrites the whole entry list every
   commit) vs SHARDED (carries shard records, writes one new shard).
   Healthy = sharded commit cost ~flat in N while inline grows linearly.
2. POINT/RANGE READ PLANNING vs table size: time to resolve the files a
   1-shard key range touches — full resolve (inline) vs two-level prune
   (shard stats first). Healthy = sharded planning is O(matching).
3. MANIFEST COMPACTION: shards after 1024 one-shard appends vs after
   compaction, and that the data path set is bit-identical.

Usage: python scripts/manifest_shard_probe.py  (markdown to stdout;
findings land in SCALE.md)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

from stock_price_prediction_using_stream_and_batch_processing_spark.operators import snapshots as snap  # noqa: E402


def synth_entries(lo_file: int, n: int, keys_per_file: int = 1000) -> list[dict]:
    """Range-partitioned synthetic entries (tight disjoint bounds)."""
    return [
        {
            "path": f"/data/f{(lo_file + i):08d}.parquet",
            "n_rows": keys_per_file,
            "min_k": (lo_file + i) * keys_per_file,
            "max_k": (lo_file + i + 1) * keys_per_file - 1,
        }
        for i in range(n)
    ]


def build_table(d: str, n_files: int, sharded: bool, batch: int = 4096) -> None:
    """Seed a table with n_files entries in one or a few commits."""
    parent = 0
    written = 0
    while written < n_files:
        n = min(batch, n_files - written)
        entries = synth_entries(written, n)
        meta = snap.read_snapshot_meta(d, parent) if parent else {"files": []}
        s = snap.build_append_snap(
            d, parent, meta, entries, ["k"],
            inline_max=(None if sharded else 10**9),
        )
        snap._publish(d, parent + 1, s)
        parent += 1
        written += n


def timed_append(d: str, n_new: int, sharded: bool) -> tuple[float, int]:
    """One append commit of n_new entries; returns (seconds, hot JSON bytes)."""
    parent = snap.current_version(d)
    entries = synth_entries(10**7 + parent * 1000, n_new)
    t0 = time.time()
    meta = snap.read_snapshot_meta(d, parent)
    s = snap.build_append_snap(
        d, parent, meta, entries, ["k"], inline_max=(None if sharded else 10**9)
    )
    snap._publish(d, parent + 1, s)
    dt = time.time() - t0
    return dt, os.path.getsize(snap._snap_path(d, parent + 1))


def timed_range_plan(d: str) -> tuple[float, int]:
    """Plan a read of one 4096-file stripe via the same pruning path
    read_snapshot uses; returns (seconds, files matched)."""
    v = snap.current_version(d)
    t0 = time.time()
    meta = snap.read_snapshot_meta(d, v)
    lo, hi = 1_000_000, 1_100_000  # ~100 files' key span
    if "manifests" in meta:
        files = [
            e
            for rec in meta["manifests"]
            if snap._shard_may_intersect(rec, "k", lo, hi)
            for e in snap._load_manifest(rec["path"])
            if snap._entry_may_intersect(e, "k", lo, hi)
        ]
    else:
        files = [
            e for e in meta["files"] if snap._entry_may_intersect(e, "k", lo, hi)
        ]
    return time.time() - t0, len(files)


def main() -> None:
    root = tempfile.mkdtemp(prefix="shardprobe_")
    print("## manifest-shard probe (r12)\n")
    print("### 1+2. append commit + range planning vs table size\n")
    print("| files | fmt | commit_s | hot_json_KiB | plan_s | matched |")
    print("|---|---|---|---|---|---|")
    try:
        for n in (1_000, 8_000, 64_000, 256_000):
            for sharded in (False, True):
                d = os.path.join(root, f"t{n}_{'s' if sharded else 'i'}")
                build_table(d, n, sharded)
                dt, size = timed_append(d, 64, sharded)
                pt, matched = timed_range_plan(d)
                print(
                    f"| {n} | {'sharded' if sharded else 'inline'} "
                    f"| {dt:.3f} | {size / 1024:.0f} | {pt:.4f} | {matched} |"
                )
        print("\n### 3. manifest compaction after 1024 one-shard appends\n")
        d = os.path.join(root, "frag")
        build_table(d, 4_096, sharded=True, batch=4)  # 1024 commits, 4 files each
        meta = snap.read_snapshot_meta(d, snap.current_version(d))
        pre_shards = len(meta["manifests"])
        pre_paths = {e["path"] for e in snap.snapshot_files(d)}
        t0 = time.time()
        v = snap.snapshot_compact_manifests(d)
        dt = time.time() - t0
        m2 = snap.read_snapshot_meta(d, v)
        post_shards = len(m2.get("manifests", []))
        same = {e["path"] for e in snap.snapshot_files(d, v)} == pre_paths
        print(f"- shards: {pre_shards} -> {post_shards} in {dt:.3f}s; data paths identical: {same}")
        stats = snap.expire_snapshots(d, keep_last=1)
        print(f"- expire after compaction: {json.dumps(stats)}")
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
