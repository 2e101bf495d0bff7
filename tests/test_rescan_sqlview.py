"""Round-13 affordances: CDC rescan recovery (onRewrite=rescan on the
snapshot streaming source) and the SQL surface over the snapshot store
(operators/sqlview.snapshot_view)."""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F

from stock_price_prediction_using_stream_and_batch_processing_spark.operators import snapshots as snap
from stock_price_prediction_using_stream_and_batch_processing_spark.operators.sqlview import snapshot_view
from stock_price_prediction_using_stream_and_batch_processing_spark.sources.snapshot_source import (
    register_snapshot_changes,
)


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") * 2.0).alias("v")
    )


def _drain(spark, table_dir, **opts):
    register_snapshot_changes(spark)
    r = spark.readStream.format("snapshot_changes").option("table_dir", table_dir)
    for k, val in opts.items():
        r = r.option(k, val)
    name = f"rescan_t_{uuid.uuid4().hex[:8]}"
    q = r.load().writeStream.format("memory").queryName(name).outputMode("append").start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination()
    batches = [p["numInputRows"] for p in q.recentProgress if p["numInputRows"] > 0]
    return batches, spark.table(name)


def test_rescan_recovers_through_compaction(spark, tmp_path):
    """append(10) -> append(5) -> compact -> append(3): rescan emits
    10, 5, then the FULL 15-row snapshot, then 3 — exact accounting."""
    d = str(tmp_path / "t")
    snap.snapshot_append(spark, d, _df(spark, 0, 10), stats_cols=["k"])
    snap.snapshot_append(spark, d, _df(spark, 10, 15), stats_cols=["k"])
    snap.snapshot_compact(spark, d, target_files=1)
    snap.snapshot_append(spark, d, _df(spark, 15, 18), stats_cols=["k"])

    batches, sink = _drain(spark, d, onRewrite="rescan")
    assert batches == [10, 5, 15, 3]
    got = sorted(r.k for r in sink.collect())
    assert got == sorted(list(range(15)) * 2 + [15, 16, 17])


def test_rescan_off_refusal_unchanged(spark, tmp_path):
    d = str(tmp_path / "t")
    snap.snapshot_append(spark, d, _df(spark, 0, 10), stats_cols=["k"])
    snap.snapshot_compact(spark, d, target_files=1)
    with pytest.raises(Exception, match="compaction commit"):
        _drain(spark, d)


def test_rescan_refuses_live_mor_deletes(spark, tmp_path):
    """A rollback commit restoring live equality deletes cannot be
    rescanned from raw files (deleted rows would resurrect) — loud."""
    d = str(tmp_path / "t")
    snap.snapshot_append(spark, d, _df(spark, 0, 10), stats_cols=["k"])
    snap.snapshot_delete(spark, d, spark.createDataFrame([(1,)], "k long"), "k")
    from stock_price_prediction_using_stream_and_batch_processing_spark.operators import refs

    snap.snapshot_append(spark, d, _df(spark, 10, 12), stats_cols=["k"])
    refs.snapshot_rollback(d, 2)  # v4: rewrite-class WITH live deletes
    with pytest.raises(Exception, match="live merge-on-read delete"):
        _drain(spark, d, onRewrite="rescan")


def test_rescan_skips_ahead_past_live_mor_deletes(spark, tmp_path):
    """append(10) -> MOR delete(k=1) -> compact -> append(3): the delete
    commit carries live delete files a raw re-read cannot honor, so the
    rescan target advances to the compaction version (first delete-free
    snapshot). Batches: 10 appends, then the FULL 9-row compacted
    snapshot (offset jumps 1 -> 3), then 3 appends (r13 ADVICE: the old
    scan stopped AT the delete commit and refused forever)."""
    d = str(tmp_path / "t")
    snap.snapshot_append(spark, d, _df(spark, 0, 10), stats_cols=["k"])
    snap.snapshot_delete(spark, d, spark.createDataFrame([(1,)], "k long"), "k")
    snap.snapshot_compact(spark, d, target_files=1)
    snap.snapshot_append(spark, d, _df(spark, 10, 13), stats_cols=["k"])

    batches, sink = _drain(spark, d, onRewrite="rescan")
    assert batches == [10, 9, 3]
    got = sorted(r.k for r in sink.collect())
    expect = sorted(list(range(10)) + [k for k in range(10) if k != 1] + [10, 11, 12])
    assert got == expect


def test_rescan_resumes_from_checkpoint_after_compaction(spark, tmp_path):
    """The failure is NOT a checkpoint dead end: a stream that refused
    at a delete-carrying rewrite resumes from the SAME checkpoint once
    a compaction provides a delete-free rescan target."""
    d = str(tmp_path / "t")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    snap.snapshot_append(spark, d, _df(spark, 0, 10), stats_cols=["k"])
    snap.snapshot_delete(spark, d, spark.createDataFrame([(1,)], "k long"), "k")

    register_snapshot_changes(spark)

    def _start():
        # parquet sink: the one local sink that RECOVERS from a
        # checkpoint (memory sink refuses to resume)
        return (
            spark.readStream.format("snapshot_changes")
            .option("table_dir", d).option("onRewrite", "rescan")
            .load().writeStream.format("parquet").option("path", out)
            .option("checkpointLocation", ckpt).outputMode("append").start()
        )

    q = _start()
    with pytest.raises(Exception, match="live merge-on-read delete"):
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    # remedy: compact (materializes the delete), restart SAME checkpoint
    snap.snapshot_compact(spark, d, target_files=1)
    q = _start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination()
    got = sorted(r.k for r in spark.read.parquet(out).collect())
    # batch 1 (pre-failure): 10 raw appends; resumed rescan batch: the
    # 9-row compacted snapshot
    assert got == sorted(list(range(10)) + [k for k in range(10) if k != 1])


def test_rescan_option_validation(spark, tmp_path):
    d = str(tmp_path / "t")
    snap.snapshot_append(spark, d, _df(spark, 0, 3), stats_cols=["k"])
    with pytest.raises(Exception, match="onRewrite"):
        _drain(spark, d, onRewrite="bogus")
    with pytest.raises(Exception, match="row-delta"):
        _drain(spark, d, onRewrite="rescan", readChangeFeed="true")


# ------------------------------------------------------------ sqlview


def test_snapshot_view_version_and_timestamp(spark, tmp_path):
    d = str(tmp_path / "t")
    snap.snapshot_append(spark, d, _df(spark, 0, 10), stats_cols=["k"])
    snap.snapshot_append(spark, d, _df(spark, 10, 20), stats_cols=["k"])
    ts2 = snap.read_snapshot_meta(d, 2)["committed_at"]
    snap.snapshot_delete(spark, d, spark.createDataFrame([(3,)], "k long"), "k")

    sfx = uuid.uuid4().hex[:8]
    v1 = snapshot_view(spark, d, f"sv1_{sfx}", version=1)
    asof = snapshot_view(spark, d, f"sv2_{sfx}", timestamp=ts2)
    head = snapshot_view(spark, d, f"sv3_{sfx}")
    assert spark.sql(f"SELECT COUNT(*) c FROM {v1}").collect()[0].c == 10
    assert spark.sql(f"SELECT COUNT(*) c FROM {asof}").collect()[0].c == 20
    # the head view applies the MOR equality delete through SQL
    assert spark.sql(f"SELECT COUNT(*) c FROM {head}").collect()[0].c == 19
    assert spark.sql(f"SELECT COUNT(*) c FROM {head} WHERE k = 3").collect()[0].c == 0
    # pinned: a later commit is invisible to all three
    snap.snapshot_append(spark, d, _df(spark, 20, 25), stats_cols=["k"])
    assert spark.sql(f"SELECT COUNT(*) c FROM {head}").collect()[0].c == 19
    with pytest.raises(ValueError, match="at most one"):
        snapshot_view(spark, d, "x", version=1, timestamp=ts2)


def test_snapshot_view_refs(spark, tmp_path):
    """SQL over branches and tags: a WAP audit query and a tagged
    release read run through spark.sql."""
    from stock_price_prediction_using_stream_and_batch_processing_spark.operators import refs

    d = str(tmp_path / "t")
    snap.snapshot_append(spark, d, _df(spark, 0, 10), stats_cols=["k"])
    refs.tag_create(d, "rel1")
    snap.snapshot_append(spark, d, _df(spark, 10, 20), stats_cols=["k"])
    refs.branch_create(d, "audit")
    refs.branch_append(spark, d, "audit", _df(spark, 20, 25), stats_cols=["k"])

    sfx = uuid.uuid4().hex[:8]
    tagv = snapshot_view(spark, d, f"rel_{sfx}", ref="tag:rel1")
    br = snapshot_view(spark, d, f"aud_{sfx}", ref="branch:audit")
    assert spark.sql(f"SELECT COUNT(*) c FROM {tagv}").collect()[0].c == 10
    # the branch view sees base + staged rows; main does not
    assert spark.sql(f"SELECT COUNT(*) c FROM {br}").collect()[0].c == 25
    assert snap.read_snapshot(spark, d).count() == 20
    with pytest.raises(ValueError, match="branch:NAME"):
        snapshot_view(spark, d, "x", ref="bogus")
    with pytest.raises(ValueError, match="at most one"):
        snapshot_view(spark, d, "x", version=1, ref="tag:rel1")


def test_snapshot_history_operation_classes(spark, tmp_path):
    """DESCRIBE HISTORY classifies every commit verb it can encounter."""
    from stock_price_prediction_using_stream_and_batch_processing_spark.operators import refs

    d = str(tmp_path / "t")
    snap.snapshot_append(spark, d, _df(spark, 0, 10), stats_cols=["k"])
    snap.snapshot_set_constraint(spark, d, "k_nonneg", "k >= 0")
    snap.snapshot_add_column(d, "w", "string")
    snap.snapshot_update(spark, d, "k = 1", {"v": "v + 1"})
    snap.snapshot_merge(
        spark, d,
        spark.createDataFrame([(100, 1.0, None)], "k long, v double, w string"),
        key="k",
    )
    refs.snapshot_rollback(d, 1)
    hist = snap.snapshot_history(d)
    assert [h["operation"] for h in hist] == [
        "append", "alter_constraint", "add_column", "update", "merge", "rollback",
    ]
    assert [h["version"] for h in hist] == [1, 2, 3, 4, 5, 6]
    assert hist[0]["n_rows"] == 10 and hist[-1]["n_rows"] == 10
    assert hist[2]["n_columns"] == 3  # add_column widened the declaration
    assert all(h["committed_at"] is not None for h in hist[1:])
    # retention: expired versions vanish from the history, gap visible
    snap.expire_snapshots(d, keep_last=2)
    assert [h["version"] for h in snap.snapshot_history(d)] == [5, 6]
