"""Regression pins for the three round-12 ADVICE findings:

1. rollback/branch must carry POSITIONAL deletes exactly like equality
   deletes (refs._CONTENT_KEYS omitted pos_delete_files — deleted rows
   resurrected on the rolled-back head and in branch reads).
2. snapshot_update must refuse to rebase through a CONCURRENT delete
   commit (its rewritten files take seq=parent+1, escaping the new
   delete — Delta/Iceberg treat delete-vs-update as a conflict).
3. partition filters must render values through the writers' canonical
   hive tokens (Python's str(True)="True" vs the layout's "true" made a
   boolean-partitioned read silently match zero files).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stock_price_prediction_using_stream_and_batch_processing_spark.operators import refs
from stock_price_prediction_using_stream_and_batch_processing_spark.operators import snapshots as snap


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )


def _keys(df):
    return sorted(r.k for r in df.collect())


# ------------------------------------------------- 1. pos-delete carry


def _pos_deleted_table(spark, tmp_path):
    """v1 = rows 0..9, v2 = positional delete k>=5 (head rows 0..4),
    v3 = append 10..19 (head rows 0..4 + 10..19)."""
    d = str(tmp_path / "t")
    snap.snapshot_append(spark, d, _df(spark, 0, 10), stats_cols=["k"])
    snap.snapshot_position_delete(spark, d, "k >= 5")
    snap.snapshot_append(spark, d, _df(spark, 10, 20), stats_cols=["k"])
    return d


def test_rollback_restores_positional_deletes(spark, tmp_path):
    d = _pos_deleted_table(spark, tmp_path)
    v = refs.snapshot_rollback(d, 2)
    assert v == 4
    # before the fix: pos_delete_files dropped -> 0..9 resurrected
    assert _keys(snap.read_snapshot(spark, d)) == [0, 1, 2, 3, 4]
    assert snap.read_snapshot_meta(d, 4).get("pos_delete_files")
    # history intact: v3 still shows the pre-rollback content
    assert _keys(snap.read_snapshot(spark, d, 3)) == [0, 1, 2, 3, 4] + list(
        range(10, 20)
    )


def test_branch_from_version_with_positional_deletes(spark, tmp_path):
    d = _pos_deleted_table(spark, tmp_path)
    refs.branch_create(d, "b", from_version=2)
    assert _keys(refs.read_branch(spark, d, "b")) == [0, 1, 2, 3, 4]


def test_rollback_restores_partition_spec(spark, tmp_path):
    """partition_by is content too: files restored by a rollback must be
    read under the spec they were written with."""
    d = str(tmp_path / "t")
    pdf = spark.range(0, 10).select(
        F.col("id").alias("k"), (F.col("id") % 2).cast("string").alias("p")
    )
    snap.snapshot_append(spark, d, pdf, stats_cols=["k"], partition_by=["p"])
    snap.snapshot_append(
        spark,
        d,
        spark.range(10, 14).select(F.col("id").alias("k"), F.lit("0").alias("p")),
        stats_cols=["k"],
        partition_by=["p"],
    )
    refs.snapshot_rollback(d, 1)
    assert snap.read_snapshot_meta(d, snap.current_version(d)).get("partition_by") == [
        "p"
    ]
    got = snap.read_partitions(spark, d, {"p": "1"})
    assert _keys(got) == [1, 3, 5, 7, 9]


# ------------------------------------- 2. update vs concurrent delete


def _race_once(spark, inject):
    """Monkeypatch-free one-shot race: swap publish_with_rebase for a
    wrapper that restores the original, runs ``inject`` (which commits
    normally), then publishes the in-flight commit."""
    orig = snap.publish_with_rebase

    def wrapper(table_dir, make_snap, max_attempts=50):
        snap.publish_with_rebase = orig
        inject()
        return orig(table_dir, make_snap, max_attempts)

    snap.publish_with_rebase = wrapper
    return orig


def test_update_conflicts_with_concurrent_equality_delete(spark, tmp_path):
    d = str(tmp_path / "t")
    snap.snapshot_append(spark, d, _df(spark, 0, 10), stats_cols=["k"])

    orig = _race_once(
        spark,
        lambda: snap.snapshot_delete(
            spark, d, spark.createDataFrame([(2,)], "k long"), "k"
        ),
    )
    try:
        with pytest.raises(snap.ConcurrentCommitError, match="delete files changed"):
            snap.snapshot_update(spark, d, "k < 5", {"v": "v + 100"})
    finally:
        snap.publish_with_rebase = orig
    # re-planned against the current version, the update serializes
    # AFTER the delete: k=2 stays dead, survivors updated
    snap.snapshot_update(spark, d, "k < 5", {"v": "v + 100"})
    rows = {r.k: r.v for r in snap.read_snapshot(spark, d).collect()}
    assert 2 not in rows
    assert rows[0] == 100 and rows[4] == 108 and rows[9] == 18


def test_update_conflicts_with_concurrent_positional_delete(spark, tmp_path):
    d = str(tmp_path / "t")
    snap.snapshot_append(spark, d, _df(spark, 0, 10), stats_cols=["k"])

    orig = _race_once(
        spark, lambda: snap.snapshot_position_delete(spark, d, "k = 7")
    )
    try:
        with pytest.raises(snap.ConcurrentCommitError, match="delete files changed"):
            snap.snapshot_update(spark, d, "k >= 0", {"v": "v + 100"})
    finally:
        snap.publish_with_rebase = orig


def test_update_still_commutes_with_concurrent_append(spark, tmp_path):
    """The new check must not over-refuse: an append changes no delete
    files, so the update rebases through it as before."""
    d = str(tmp_path / "t")
    snap.snapshot_append(spark, d, _df(spark, 0, 5), stats_cols=["k"])

    orig = _race_once(
        spark,
        lambda: snap.snapshot_append(spark, d, _df(spark, 100, 103), stats_cols=["k"]),
    )
    try:
        res = snap.snapshot_update(spark, d, "k < 5", {"v": "v + 100"})
    finally:
        snap.publish_with_rebase = orig
    assert res["rows_updated"] == 5
    rows = {r.k: r.v for r in snap.read_snapshot(spark, d).collect()}
    assert rows[0] == 100 and rows[100] == 200  # appended rows untouched


# --------------------------------------- 3. boolean partition tokens


def test_boolean_partition_filter_matches_hive_tokens(spark, tmp_path):
    d = str(tmp_path / "t")
    df = spark.range(0, 10).select(
        F.col("id").alias("k"), (F.col("id") % 2 == 0).alias("even")
    )
    snap.snapshot_append(spark, d, df, stats_cols=["k"], partition_by=["even"])
    # hive layout wrote "true"/"false"; a Python bool filter must match
    got = snap.read_partitions(spark, d, {"even": True})
    assert _keys(got) == [0, 2, 4, 6, 8]
    got = snap.read_partitions(spark, d, {"even": False})
    assert _keys(got) == [1, 3, 5, 7, 9]
    # None renders as the hive NULL sentinel
    assert snap.hive_value_token(None) == snap._HIVE_NULL
    assert snap.hive_value_token(True) == "true"


def test_boolean_partition_filter_streaming_source(spark, tmp_path):
    """Same rendering through the streaming CDC source's
    partitionFilter option (JSON booleans)."""
    import json

    d = str(tmp_path / "t")
    ck = str(tmp_path / "ck")
    out = str(tmp_path / "out")
    df = spark.range(0, 10).select(
        F.col("id").alias("k"), (F.col("id") % 2 == 0).alias("even")
    )
    snap.snapshot_append(spark, d, df, stats_cols=["k"], partition_by=["even"])

    from stock_price_prediction_using_stream_and_batch_processing_spark.sources.snapshot_source import (
        register_snapshot_changes,
    )

    register_snapshot_changes(spark)
    q = (
        spark.readStream.format("snapshot_changes")
        .option("table_dir", d)
        .option("partitionFilter", json.dumps({"even": True}))
        .load()
        .writeStream.format("memory")
        .queryName("bool_pv_filter")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination()
    got = sorted(r.k for r in spark.table("bool_pv_filter").collect())
    assert got == [0, 2, 4, 6, 8]
