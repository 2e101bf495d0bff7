"""Merge-on-read EQUALITY DELETES with sequence numbers
(operators/snapshots.py, r12): row deletes that touch no data file,
applied at read via per-era broadcast anti-joins; later inserts of the
same keys SURVIVE (the property sequence numbers exist for);
compaction materializes deletes and clears the read tax; CDC refuses
delete commits; retention collects dead delete files."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from stock_price_prediction_using_stream_and_batch_processing_spark.operators import snapshots as snap


def _append(spark, d, lo, hi, **kw):
    df = spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    return snap.snapshot_append(spark, d, df, stats_cols=["k"], **kw)


def _keys(spark, *ks):
    return spark.createDataFrame([(k,) for k in ks], "k long")


def test_delete_is_merge_on_read(spark, tmp_path):
    d = str(tmp_path / "t")
    _append(spark, d, 0, 100)
    pre_paths = {e["path"] for e in snap.snapshot_files(d)}
    v = snap.snapshot_delete(spark, d, _keys(spark, 5, 17, 99), "k")
    assert v == 2
    meta = snap.read_snapshot_meta(d, 2)
    # NO data file touched; one delete file recorded with its seq
    assert {e["path"] for e in snap.snapshot_files(d, 2)} == pre_paths
    (df_rec,) = meta["delete_files"]
    assert (df_rec["col"], df_rec["n_keys"], df_rec["seq"]) == ("k", 3, 2)
    got = sorted(r.k for r in snap.read_snapshot(spark, d).collect())
    assert got == [k for k in range(100) if k not in (5, 17, 99)]
    # time travel BEFORE the delete still sees every row
    assert snap.read_snapshot(spark, d, 1).count() == 100


def test_reinserted_keys_survive_older_deletes(spark, tmp_path):
    """The sequence-number property: a delete applies only to files
    with LOWER seq, so a later insert of a deleted key is visible."""
    d = str(tmp_path / "t")
    _append(spark, d, 0, 10)                      # v1 (seq 1)
    snap.snapshot_delete(spark, d, _keys(spark, 3, 4), "k")   # v2 (seq 2)
    spark.createDataFrame([(3, 333)], "k long, v long")
    snap.snapshot_append(
        spark, d, spark.createDataFrame([(3, 333)], "k long, v long")
    , stats_cols=["k"])                           # v3 (seq 3): re-insert 3
    rows = {r.k: r.v for r in snap.read_snapshot(spark, d).collect()}
    assert rows[3] == 333        # re-insert SURVIVES the older delete
    assert 4 not in rows         # old delete still applies to old files
    assert len(rows) == 9
    # a second delete hits both eras
    snap.snapshot_delete(spark, d, _keys(spark, 3), "k")      # v4 (seq 4)
    rows = {r.k: r.v for r in snap.read_snapshot(spark, d).collect()}
    assert 3 not in rows and len(rows) == 8


def test_compaction_materializes_deletes(spark, tmp_path):
    d = str(tmp_path / "t")
    _append(spark, d, 0, 100)
    snap.snapshot_delete(spark, d, _keys(spark, 1, 2), "k")
    v = snap.snapshot_compact(spark, d, target_files=2)
    meta = snap.read_snapshot_meta(d, v)
    assert "delete_files" not in meta  # read tax cleared
    got = sorted(r.k for r in snap.read_snapshot(spark, d).collect())
    assert got == [k for k in range(100) if k not in (1, 2)]
    # retention now collects the unreferenced delete dir
    del_dir = snap.read_snapshot_meta(d, 2)["delete_files"][0]["dir"]
    stats = snap.expire_snapshots(d, keep_last=1)
    assert stats["deleted_delete_files"] == 1
    assert not os.path.exists(del_dir)


def test_merge_on_deleted_table(spark, tmp_path):
    """MERGE's base read applies live deletes (a rewritten file must not
    resurrect deleted rows); carried files keep the delete files."""
    d = str(tmp_path / "t")
    for lo, hi in ((0, 100), (100, 200)):
        snap.snapshot_append(
            spark, d,
            spark.range(lo, hi).select(F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
            .repartition(1),
            stats_cols=["k"],
        )
    snap.snapshot_delete(spark, d, _keys(spark, 7, 150), "k")
    res = snap.snapshot_merge(
        spark, d, spark.createDataFrame([(8, 888)], "k long, v long"), key="k"
    )
    assert res["files_rewritten"] == 1 and res["files_carried"] == 1
    meta = snap.read_snapshot_meta(d, res["version"])
    assert len(meta["delete_files"]) == 1  # carried for the carried file
    rows = {r.k: r.v for r in snap.read_snapshot(spark, d).collect()}
    assert rows[8] == 888
    assert 7 not in rows           # delete materialized into the rewrite
    assert 150 not in rows         # delete still applies to the carried file
    assert len(rows) == 198


def test_point_lookup_respects_deletes(spark, tmp_path):
    d = str(tmp_path / "t")
    snap.snapshot_append(
        spark, d,
        spark.range(100).select(F.col("id").alias("k")),
        stats_cols=["k"], bloom_cols=["k"],
    )
    snap.snapshot_delete(spark, d, _keys(spark, 42), "k")
    assert snap.read_point_lookup(spark, d, "k", 42).count() == 0
    assert snap.read_point_lookup(spark, d, "k", 43).count() == 1


def test_delete_guards(spark, tmp_path):
    d = str(tmp_path / "t")
    with pytest.raises(ValueError, match="empty table"):
        snap.snapshot_delete(spark, d, _keys(spark, 1), "k")
    _append(spark, d, 0, 10)
    with pytest.raises(ValueError, match="not in table schema"):
        snap.snapshot_delete(spark, d, _keys(spark, 1), "nope")


def test_cdc_refuses_delete_commits(spark, tmp_path):
    from stock_price_prediction_using_stream_and_batch_processing_spark.sources.snapshot_source import (
        SnapshotChangesStreamReader,
    )

    d = str(tmp_path / "t")
    _append(spark, d, 0, 10)
    snap.snapshot_delete(spark, d, _keys(spark, 1), "k")
    r = SnapshotChangesStreamReader({"table_dir": d})
    with pytest.raises(ValueError, match="equality-delete"):
        r._delta_paths(1, 2)


def test_deletes_on_sharded_and_evolved_table(spark, tmp_path):
    """Deletes compose with manifest sharding and schema evolution:
    era grouping rides the resolved entries, the aligned read pads the
    evolved column, and the anti-join runs per era."""
    d = str(tmp_path / "t")
    for lo in range(0, 300, 100):
        snap.snapshot_append(
            spark, d,
            spark.range(lo, lo + 100).select(F.col("id").alias("k"), (F.col("id") * 2).alias("v")),
            stats_cols=["k"], inline_max=2,
        )
    assert "manifests" in snap.read_snapshot_meta(d, 3)
    snap.snapshot_add_column(d, "w", "string")
    snap.snapshot_delete(spark, d, _keys(spark, 50, 250), "k")
    snap.snapshot_append(
        spark, d,
        spark.createDataFrame([(50, 1, "re")], "k long, v long, w string"),
        stats_cols=["k"], merge_schema=True, inline_max=2,
    )
    rows = {r.k: (r.v, r.w) for r in snap.read_snapshot(spark, d).collect()}
    assert rows[50] == (1, "re")   # re-insert survives, evolved col real
    assert 250 not in rows
    assert rows[0] == (0, None)    # pre-evolution NULL padding intact
    assert len(rows) == 299
