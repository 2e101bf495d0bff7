"""Snapshot-store schema evolution (operators/snapshots.py, r12):
tracked declared schema, additive merge_schema appends, pure-metadata
ADD COLUMN, aligned reads (NULL-padded old files), compaction
re-homogenizing, and the CDC source streaming across an evolution.
Closes VERDICT r11 missing #6 (the layer had no ADD COLUMN path)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stock_price_prediction_using_stream_and_batch_processing_spark.operators import snapshots as snap


def _df2(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )


def _df3(spark, lo, hi):
    return _df2(spark, lo, hi).withColumn("w", F.col("k").cast("string"))


def test_mismatched_append_refused_without_merge_schema(spark, tmp_path):
    d = str(tmp_path / "t")
    snap.snapshot_append(spark, d, _df2(spark, 0, 10), stats_cols=["k"])
    assert snap.read_snapshot_meta(d, 1)["schema"] == [["k", "bigint"], ["v", "bigint"]]
    with pytest.raises(ValueError, match="merge_schema"):
        snap.snapshot_append(spark, d, _df3(spark, 10, 20), stats_cols=["k"])
    # same name, different type: NEVER mergeable
    bad = spark.range(10, 20).select(
        F.col("id").alias("k"), (F.col("id") * 2.0).alias("v")
    )
    with pytest.raises(ValueError, match="type changes"):
        snap.snapshot_append(spark, d, bad, stats_cols=["k"], merge_schema=True)


def test_merge_schema_append_and_aligned_read(spark, tmp_path):
    d = str(tmp_path / "t")
    snap.snapshot_append(spark, d, _df2(spark, 0, 10), stats_cols=["k"])
    snap.snapshot_append(spark, d, _df3(spark, 10, 20), stats_cols=["k"], merge_schema=True)
    meta = snap.read_snapshot_meta(d, 2)
    assert meta["schema"] == [["k", "bigint"], ["v", "bigint"], ["w", "string"]]
    assert meta["schema_evolved"] is True
    got = snap.read_snapshot(spark, d)
    assert got.columns == ["k", "v", "w"]
    rows = {r.k: (r.v, r.w) for r in got.collect()}
    assert rows[5] == (10, None)      # old file: NULL-padded
    assert rows[15] == (30, "15")     # new file: real value
    # time travel to v1 keeps the ORIGINAL two-column shape
    assert snap.read_snapshot(spark, d, 1).columns == ["k", "v"]
    # a commit OMITTING a declared column is also additive-legal
    snap.snapshot_append(
        spark, d,
        spark.range(20, 25).select(F.col("id").alias("k")),
        stats_cols=["k"], merge_schema=True,
    )
    rows = {r.k: (r.v, r.w) for r in snap.read_snapshot(spark, d).collect()}
    assert rows[22] == (None, None)
    assert len(rows) == 25


def test_add_column_is_pure_metadata(spark, tmp_path):
    d = str(tmp_path / "t")
    snap.snapshot_append(spark, d, _df2(spark, 0, 10), stats_cols=["k"])
    pre_paths = {e["path"] for e in snap.snapshot_files(d)}
    v = snap.snapshot_add_column(d, "score", "double")
    assert v == 2
    meta = snap.read_snapshot_meta(d, 2)
    assert meta["schema"][-1] == ["score", "double"]
    assert {e["path"] for e in snap.snapshot_files(d, 2)} == pre_paths  # no rewrite
    got = snap.read_snapshot(spark, d)
    assert got.columns == ["k", "v", "score"]
    assert got.where("score is null").count() == 10
    assert dict(got.dtypes)["score"] == "double"
    with pytest.raises(ValueError, match="already exists"):
        snap.snapshot_add_column(d, "score", "double")
    # stats-pruned reads still work through the alignment
    assert snap.read_snapshot(spark, d, prune_col="k", lo=3, hi=4).where(
        "k between 3 and 4"
    ).count() == 2


def test_compaction_rehomogenizes_schema(spark, tmp_path):
    d = str(tmp_path / "t")
    snap.snapshot_append(spark, d, _df2(spark, 0, 10), stats_cols=["k"])
    snap.snapshot_append(spark, d, _df3(spark, 10, 20), stats_cols=["k"], merge_schema=True)
    v = snap.snapshot_compact(spark, d, target_files=2)
    meta = snap.read_snapshot_meta(d, v)
    assert meta["schema"] == [["k", "bigint"], ["v", "bigint"], ["w", "string"]]
    assert "schema_evolved" not in meta  # plain-read fast path restored
    rows = {r.k: (r.v, r.w) for r in snap.read_snapshot(spark, d).collect()}
    assert rows[5] == (10, None) and rows[15] == (30, "15") and len(rows) == 20


def test_merge_on_evolved_table(spark, tmp_path):
    d = str(tmp_path / "t")
    snap.snapshot_append(spark, d, _df2(spark, 0, 10), stats_cols=["k"])
    snap.snapshot_add_column(d, "w", "string")
    # updates must speak the full declared schema
    with pytest.raises(ValueError, match="declared"):
        snap.snapshot_merge(spark, d, _df2(spark, 0, 1), key="k")
    res = snap.snapshot_merge(
        spark, d,
        spark.createDataFrame([(5, 55, "five")], "k long, v long, w string"),
        key="k",
    )
    assert res["files_rewritten"] >= 1
    rows = {r.k: (r.v, r.w) for r in snap.read_snapshot(spark, d).collect()}
    assert rows[5] == (55, "five") and rows[6] == (12, None) and len(rows) == 10


def test_sink_respects_schema_contract(spark, tmp_path):
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from stock_price_prediction_using_stream_and_batch_processing_spark.sources.snapshot_sink import (
        SnapshotStreamWriter,
    )

    d = str(tmp_path / "t")
    snap.snapshot_append(spark, d, _df2(spark, 0, 10), stats_cols=["k"])
    wide = StructType(
        [
            StructField("k", LongType()),
            StructField("v", LongType()),
            StructField("w", StringType()),
        ]
    )
    w = SnapshotStreamWriter(
        {"table_dir": d, "stats_cols": "k", "writer_id": "s1"}, wide
    )
    m = w.write(iter([(100, 200, "x")]))
    with pytest.raises(ValueError, match="merge_schema"):
        w.commit([m], batchId=0)
    w2 = SnapshotStreamWriter(
        {"table_dir": d, "stats_cols": "k", "writer_id": "s1", "merge_schema": "true"},
        wide,
    )
    w2.commit([w2.write(iter([(100, 200, "x")]))], batchId=0)
    got = snap.read_snapshot(spark, d)
    assert got.columns == ["k", "v", "w"]
    assert got.where("w = 'x'").count() == 1


def test_cdc_stream_across_evolution(spark, tmp_path):
    """The snapshot_changes source plans the DECLARED schema and pads
    pre-evolution files' rows with NULLs — one batch per commit,
    including the empty add_column delta."""
    from stock_price_prediction_using_stream_and_batch_processing_spark.sources.snapshot_source import (
        register_snapshot_changes,
    )

    d = str(tmp_path / "t")
    snap.snapshot_append(spark, d, _df2(spark, 0, 5), stats_cols=["k"])
    snap.snapshot_add_column(d, "w", "string")
    snap.snapshot_append(spark, d, _df3(spark, 5, 10), stats_cols=["k"], merge_schema=True)
    register_snapshot_changes(spark)
    name = "cdc_evo_sink"
    q = (
        spark.readStream.format("snapshot_changes")
        .option("table_dir", d)
        .load()
        .writeStream.format("memory")
        .queryName(name)
        .start()
    )
    try:
        # simple-reader contract: one commit per poll, no availableNow —
        # processAllAvailable drains every published version
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination()
    got = {r.k: (r.v, r.w) for r in spark.sql(f"select * from {name}").collect()}
    assert got[2] == (4, None) and got[7] == (14, "7") and len(got) == 10


def test_merge_schema_merge_evolves_declaration(spark, tmp_path):
    """MERGE autoMerge (r13): updates carrying a NEW column evolve the
    declaration in the same commit — carried files NULL-pad on read,
    rewritten base rows NULL-pad the new column, omitted declared
    columns stay refused (full replacement rows, never silent NULLs)."""
    d = str(tmp_path / "t")
    # two well-separated key ranges -> the merge touches only one file
    snap.snapshot_append(spark, d, _df2(spark, 0, 10), stats_cols=["k"])
    snap.snapshot_append(spark, d, _df2(spark, 1000, 1010), stats_cols=["k"])
    # without the flag: refusal unchanged
    upd = spark.createDataFrame([(5, 55, "five")], "k long, v long, w string")
    with pytest.raises(ValueError, match="declared"):
        snap.snapshot_merge(spark, d, upd, key="k")
    res = snap.snapshot_merge(spark, d, upd, key="k", merge_schema=True)
    assert res["files_rewritten"] >= 1 and res["files_carried"] >= 1
    meta = snap.read_snapshot_meta(d, snap.current_version(d))
    assert [c for c, _ in meta["schema"]] == ["k", "v", "w"]
    assert meta["schema_evolved"] is True
    rows = {r.k: (r.v, r.w) for r in snap.read_snapshot(spark, d).collect()}
    assert rows[5] == (55, "five")        # merged row carries the new col
    assert rows[6] == (12, None)          # rewritten base row NULL-pads
    assert rows[1005] == (2010, None)     # carried file NULL-pads
    assert len(rows) == 20
    # omitted declared columns refuse even WITH the flag
    with pytest.raises(ValueError, match="omit declared"):
        snap.snapshot_merge(
            spark, d, spark.createDataFrame([(5, "x")], "k long, w string"),
            key="k", merge_schema=True,
        )
    # same-name/different-type is never mergeable
    with pytest.raises(ValueError, match="conflict"):
        snap.snapshot_merge(
            spark, d,
            spark.createDataFrame([(5, 1.0, "x")], "k long, v double, w string"),
            key="k", merge_schema=True,
        )
