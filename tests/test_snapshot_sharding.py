"""Manifest-list sharding (operators/snapshots.py, r12): past the
inline ceiling a snapshot holds shard RECORDS instead of file entries —
appends reuse parent shards verbatim, reads/merges prune at the shard
level before opening any shard file, retention collects dead shards,
and a pure-metadata manifest compaction re-chunks a fragmented list.
Closes the ~10^6-entry snapshot-JSON ceiling VERDICT r11 pinned."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from stock_price_prediction_using_stream_and_batch_processing_spark.operators import snapshots as snap


def _append(spark, d, lo, hi, inline_max=2, n_files=1, **kw):
    df = spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    ).repartition(n_files)
    return snap.snapshot_append(
        spark, d, df, stats_cols=["k"], inline_max=inline_max, **kw
    )


def test_conversion_then_appends_reuse_parent_shards(spark, tmp_path):
    d = str(tmp_path / "t")
    _append(spark, d, 0, 10)            # v1: inline (1 file <= 2)
    assert "files" in snap.read_snapshot_meta(d, 1)
    _append(spark, d, 10, 20, n_files=2)  # v2: 3 entries > 2 -> converts
    m2 = snap.read_snapshot_meta(d, 2)
    assert "files" not in m2 and len(m2["manifests"]) == 2  # shard size = 2
    _append(spark, d, 20, 30)           # v3: sharded stays sharded
    m3 = snap.read_snapshot_meta(d, 3)
    # parent shard records carried VERBATIM (no rescan, no rewrite);
    # the commit added exactly ONE new shard for its own entries
    assert m3["manifests"][: len(m2["manifests"])] == m2["manifests"]
    assert len(m3["manifests"]) == len(m2["manifests"]) + 1
    # resolution + time travel unchanged
    assert sorted(r.k for r in snap.read_snapshot(spark, d).collect()) == list(range(30))
    assert snap.read_snapshot(spark, d, 2).count() == 20
    # shard records aggregate stats and counts
    assert sum(r["n_files"] for r in m3["manifests"]) == 4
    assert sum(r["n_rows"] for r in m3["manifests"]) == 30


def test_two_level_prune_skips_whole_shards(spark, tmp_path):
    d = str(tmp_path / "t")
    for lo in range(0, 1000, 100):  # 10 single-file commits, disjoint ranges
        _append(spark, d, lo, lo + 100)
    meta = snap.read_snapshot_meta(d, 10)
    assert "manifests" in meta
    # shard-level bounds exclude all but the matching shard(s)
    live = [r for r in meta["manifests"] if snap._shard_may_intersect(r, "k", 250, 260)]
    assert 1 <= len(live) < len(meta["manifests"])
    got = snap.read_snapshot(spark, d, prune_col="k", lo=250, hi=260)
    assert sorted(r.k for r in got.where("k between 250 and 260").collect()) == list(
        range(250, 261)
    )
    # prune-to-zero still returns the empty frame with schema
    assert snap.read_snapshot(spark, d, prune_col="k", lo=10**9, hi=10**9).count() == 0


def test_sharded_merge_carries_untouched_shards(spark, tmp_path):
    d = str(tmp_path / "t")
    for lo in range(0, 600, 100):
        _append(spark, d, lo, lo + 100)
    pre = snap.read_snapshot_meta(d, 6)["manifests"]
    res = snap.snapshot_merge(
        spark, d,
        spark.createDataFrame([(150, 999), (10_000, 123)], "k long, v long"),
        key="k",
        deletes=spark.createDataFrame([(160,)], "k long"),
    )
    assert res["shards_carried"] >= 1 and res["files_rewritten"] >= 1
    post = snap.read_snapshot_meta(d, res["version"])["manifests"]
    carried = [r for r in post if r in pre]
    assert len(carried) == res["shards_carried"]  # untouched recs verbatim
    got = {r.k: r.v for r in snap.read_snapshot(spark, d).collect()}
    want = {k: k * 2 for k in range(600) if k != 160}
    want.update({150: 999, 10_000: 123})
    assert got == want


def test_manifest_compaction_is_pure_metadata(spark, tmp_path):
    d = str(tmp_path / "t")
    for lo in range(0, 500, 100):
        _append(spark, d, lo, lo + 100)
    m = snap.read_snapshot_meta(d, 5)
    pre_paths = {e["path"] for e in snap.snapshot_files(d)}
    assert len(m["manifests"]) >= 3  # fragmented: ~one shard per commit
    v = snap.snapshot_compact_manifests(d, inline_max=3)
    m2 = snap.read_snapshot_meta(d, v)
    assert m2["manifest_compaction"] is True
    assert len(m2["manifests"]) < len(m["manifests"])
    # NO data file touched: identical path set, identical rows
    assert {e["path"] for e in snap.snapshot_files(d, v)} == pre_paths
    assert sorted(r.k for r in snap.read_snapshot(spark, d).collect()) == list(range(500))
    # with default thresholds the same table re-inlines (shrunk list)
    v2 = snap.snapshot_compact_manifests(d)
    assert "files" in snap.read_snapshot_meta(d, v2)


def test_expire_collects_dead_shards(spark, tmp_path):
    d = str(tmp_path / "t")
    for lo in range(0, 400, 100):
        _append(spark, d, lo, lo + 100)
    old_shards = {r["path"] for r in snap.read_snapshot_meta(d, 4)["manifests"]}
    snap.snapshot_compact_manifests(d, inline_max=3)  # v5: fresh shards
    stats = snap.expire_snapshots(d, keep_last=1)
    assert stats["expired_versions"] == 4
    assert stats["deleted_files"] == 0  # every data file still referenced
    assert stats["deleted_manifests"] > 0
    assert not any(os.path.exists(p) for p in old_shards)
    assert snap.read_snapshot(spark, d).count() == 400
    # shards shared between expired and surviving versions survive:
    _append(spark, d, 400, 500)  # v6 reuses v5's shard records
    shared = {r["path"] for r in snap.read_snapshot_meta(d, 5)["manifests"]}
    stats = snap.expire_snapshots(d, keep_last=1)  # expire v5
    assert stats["deleted_manifests"] == 0
    assert all(os.path.exists(p) for p in shared)
    assert snap.read_snapshot(spark, d).count() == 500


def test_sharded_point_lookup_prunes_shards_then_blooms(spark, tmp_path):
    d = str(tmp_path / "t")
    for lo in range(0, 300, 100):
        _append(spark, d, lo, lo + 100, bloom_cols=["k"])
    meta = snap.read_snapshot_meta(d, 3)
    assert "manifests" in meta
    # blooms ride in the shard files, NOT the hot snapshot JSON
    assert all("bloom_k" not in r for r in meta["manifests"])
    assert os.path.getsize(snap._snap_path(d, 3)) < 4096
    kept, total = snap.point_lookup_files(d, "k", 150)
    assert total == 3 and len(kept) == 1
    assert snap.read_point_lookup(spark, d, "k", 150).count() == 1
    assert snap.read_point_lookup(spark, d, "k", 10**7).count() == 0


def test_sharded_sink_one_shard_per_batch(tmp_path):
    from pyspark.sql.types import LongType, StructField, StructType

    from stock_price_prediction_using_stream_and_batch_processing_spark.sources.snapshot_sink import (
        SnapshotStreamWriter,
    )

    d = str(tmp_path / "t")
    w = SnapshotStreamWriter(
        {"table_dir": d, "stats_cols": "k", "writer_id": "w1", "inline_max": "1"},
        StructType([StructField("k", LongType())]),
    )
    w.commit([w.write(iter([(1,), (2,)]))], batchId=0)   # inline (1 file)
    w.commit([w.write(iter([(3,)]))], batchId=1)          # converts
    w.commit([w.write(iter([(4,)]))], batchId=2)          # adds one shard
    m = snap.read_snapshot_meta(d, 3)
    assert "manifests" in m and m["last_batches"] == {"w1": 2}
    assert sum(r["n_rows"] for r in m["manifests"]) == 4
    # replay fence still fires on the sharded table
    replay = w.write(iter([(4,)]))
    w.commit([replay], batchId=2)
    assert snap.current_version(d) == 3 and not os.path.exists(replay.path)


def test_cdc_shard_diff_fast_path(spark, tmp_path):
    """The snapshot_changes source plans each micro-batch from NEW
    SHARDS only on sharded tables (O(delta) planning); a manifest
    compaction in range falls back to the exact path diff so consumed
    files are never re-emitted."""
    from stock_price_prediction_using_stream_and_batch_processing_spark.sources.snapshot_source import (
        SnapshotChangesStreamReader,
    )

    d = str(tmp_path / "t")
    for lo in range(0, 500, 100):
        _append(spark, d, lo, lo + 100)
    r = SnapshotChangesStreamReader({"table_dir": d})
    # each single-commit delta is exactly that commit's file
    for v in range(2, 5):
        paths = r._delta_paths(v, v + 1)
        assert paths == [e["path"] for e in snap.snapshot_files(d, v + 1)[-1:]]
    # spanning range: exactly the commits' files, no replays
    assert len(r._delta_paths(2, 5)) == 3
    # manifest compaction re-chunks everything into new shards; the
    # range crossing it must yield ONLY the genuinely new data file
    # (exactly v7's added path — not any re-emitted old file)
    snap.snapshot_compact_manifests(d, inline_max=3)  # v6
    _append(spark, d, 500, 600)                        # v7
    v6_paths = {e["path"] for e in snap.snapshot_files(d, 6)}
    expected = [e["path"] for e in snap.snapshot_files(d, 7) if e["path"] not in v6_paths]
    assert r._delta_paths(5, 7) == expected and len(expected) == 1
    # and the full-history replay is still exact
    assert len(r._delta_paths(0, 7)) == 6
