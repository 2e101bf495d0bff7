"""Atomic snapshot commits + time travel (operators/snapshots.py):
version monotonicity, pinned-reader isolation from concurrent appends,
historical reads, and stats-pruned time travel."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from stock_price_prediction_using_stream_and_batch_processing_spark.operators import snapshots as snap


def _commit(spark, d, lo, hi):
    df = spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    return snap.snapshot_append(spark, d, df, stats_cols=["k"])


def test_versions_monotonic_and_current(spark, tmp_path):
    d = str(tmp_path / "t")
    assert snap.current_version(d) == 0
    assert _commit(spark, d, 0, 10) == 1
    assert _commit(spark, d, 10, 20) == 2
    assert snap.current_version(d) == 2
    assert snap.snapshot_files(d, 0) == []


def test_time_travel_reads_exact_history(spark, tmp_path):
    d = str(tmp_path / "t")
    _commit(spark, d, 0, 10)
    _commit(spark, d, 10, 25)
    _commit(spark, d, 25, 30)
    # each historical version returns exactly the union of its commits
    assert sorted(r.k for r in snap.read_snapshot(spark, d, 1).collect()) == list(range(10))
    assert sorted(r.k for r in snap.read_snapshot(spark, d, 2).collect()) == list(range(25))
    # default = current
    assert snap.read_snapshot(spark, d).count() == 30


def test_pinned_reader_isolated_from_concurrent_append(spark, tmp_path):
    d = str(tmp_path / "t")
    _commit(spark, d, 0, 10)
    pinned = snap.snapshot_files(d)  # the pin IS the file list
    _commit(spark, d, 10, 20)  # concurrent append publishes v2
    # the pin's read set is untouched: same files, same rows
    assert {e["path"] for e in pinned} == {e["path"] for e in snap.snapshot_files(d, 1)}
    got = spark.read.parquet(*sorted(e["path"] for e in pinned))
    assert sorted(r.k for r in got.collect()) == list(range(10))
    # and the new version only ADDED files
    cur = {e["path"] for e in snap.snapshot_files(d, 2)}
    assert {e["path"] for e in pinned} < cur


def test_stats_pruned_time_travel(spark, tmp_path):
    d = str(tmp_path / "t")
    # three commits with disjoint key ranges -> disjoint file stats
    _commit(spark, d, 0, 100)
    _commit(spark, d, 100, 200)
    _commit(spark, d, 200, 300)
    all_files = snap.snapshot_files(d, 3)
    pruned = snap.read_snapshot(spark, d, 3, prune_col="k", lo=120, hi=150)
    # conservative pruning: correct rows after the residual predicate...
    got = sorted(r.k for r in pruned.filter("k between 120 and 150").collect())
    assert got == list(range(120, 151))
    # ...and strictly fewer files touched than the full snapshot
    n_pruned = len(
        [
            e
            for e in all_files
            if e["min_k"] is not None and e["max_k"] >= 120 and e["min_k"] <= 150
        ]
    )
    assert 0 < n_pruned < len(all_files)


def test_commit_stats_come_from_new_files_only(spark, tmp_path):
    d = str(tmp_path / "t")
    _commit(spark, d, 0, 10)
    m1 = snap.read_snapshot_meta(d, 1)
    _commit(spark, d, 10, 20)
    m2 = snap.read_snapshot_meta(d, 2)
    # v2 carries v1's entries verbatim (no rescan / no stat rewrite)
    assert m2["files"][: len(m1["files"])] == m1["files"]
    new = m2["files"][len(m1["files"]) :]
    assert new and all(e["min_k"] >= 10 for e in new)
    assert m2["parent"] == 1


def test_publish_is_atomic_rename(spark, tmp_path):
    d = str(tmp_path / "t")
    _commit(spark, d, 0, 10)
    # no torn temp files left behind in the snapshots dir
    names = os.listdir(os.path.join(d, "snapshots"))
    assert names == ["v00000001.json"]
