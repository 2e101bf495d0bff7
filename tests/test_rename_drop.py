"""Metadata-only RENAME / DROP COLUMN (name-based column mapping):
readers coalesce pre/post-rename file generations, dropped names leave
a shadow set that refuses resurrection, load-bearing columns refuse,
compaction retires the mapping, and clones/rollbacks carry it."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stock_price_prediction_using_stream_and_batch_processing_spark.operators import refs, snapshots as snap


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") * 2.0).alias("v")
    )


def test_rename_reads_both_generations(spark, tmp_path):
    d = str(tmp_path / "t")
    snap.snapshot_append(spark, d, _df(spark, 0, 10), stats_cols=["k"])
    snap.snapshot_rename_column(d, "v", "price")
    out = snap.read_snapshot(spark, d)
    assert out.columns == ["k", "price"]
    rows = {r.k: r.price for r in out.collect()}
    assert rows == {i: i * 2.0 for i in range(10)}
    # append under the NEW name; mixed generations read coherently
    snap.snapshot_append(
        spark, d,
        spark.range(10, 13).select(F.col("id").alias("k"), (F.col("id") * 2.0).alias("price")),
        stats_cols=["k"],
    )
    rows = {r.k: r.price for r in snap.read_snapshot(spark, d).collect()}
    assert rows == {i: i * 2.0 for i in range(13)}
    assert snap.snapshot_history(d)[1]["operation"] == "rename_column"


def test_chained_rename_resolves_to_original_physical(spark, tmp_path):
    d = str(tmp_path / "t")
    snap.snapshot_append(spark, d, _df(spark, 0, 5), stats_cols=["k"])
    snap.snapshot_rename_column(d, "v", "price")
    snap.snapshot_rename_column(d, "price", "amount")
    m = snap.read_snapshot_meta(d, snap.current_version(d))
    assert m["column_mapping"] == {"amount": "v"}
    rows = {r.k: r.amount for r in snap.read_snapshot(spark, d).collect()}
    assert rows == {i: i * 2.0 for i in range(5)}


def test_rename_refuses_load_bearing_columns(spark, tmp_path):
    d = str(tmp_path / "t")
    dfp = spark.range(0, 12).select(
        F.col("id").alias("k"), (F.col("id") % 2).cast("string").alias("p"),
        (F.col("id") * 2.0).alias("v"),
    )
    snap.snapshot_append(spark, d, dfp, stats_cols=["k"], partition_by=["p"])
    snap.snapshot_set_constraint(spark, d, "v_pos", "v >= 0")
    with pytest.raises(ValueError, match="min/max stats"):
        snap.snapshot_rename_column(d, "k", "key")
    # partition columns auto-join the stats set at append time, so the
    # stats refusal fires first — either message is a correct refusal
    with pytest.raises(ValueError, match="stats|partition spec"):
        snap.snapshot_rename_column(d, "p", "part")
    with pytest.raises(ValueError, match="constraint"):
        snap.snapshot_rename_column(d, "v", "price")
    snap.snapshot_drop_constraint(d, "v_pos")
    snap.snapshot_rename_column(d, "v", "price")  # now fine
    # equality-delete key (a NON-stats column) refuses too
    d2 = str(tmp_path / "t2")
    snap.snapshot_append(spark, d2, _df(spark, 0, 6), stats_cols=["k"])
    snap.snapshot_delete(spark, d2, spark.createDataFrame([(4.0,)], "v double"), "v")
    with pytest.raises(ValueError, match="equality deletes"):
        snap.snapshot_rename_column(d2, "v", "price")


def test_drop_column_and_shadow_refusals(spark, tmp_path):
    d = str(tmp_path / "t")
    df3 = spark.range(0, 5).select(
        F.col("id").alias("k"), (F.col("id") * 2.0).alias("v"),
        F.lit("x").alias("w"),
    )
    snap.snapshot_append(spark, d, df3, stats_cols=["k"])
    snap.snapshot_drop_column(d, "v")
    out = snap.read_snapshot(spark, d)
    assert out.columns == ["k", "w"]
    assert snap.snapshot_history(d)[-1]["operation"] == "drop_column"
    # resurrection refusals: the bytes still live in pre-drop files
    with pytest.raises(ValueError, match="shadows a DROPPED column"):
        snap.snapshot_add_column(d, "v", "double")
    with pytest.raises(ValueError, match="shadows a DROPPED column"):
        snap.snapshot_rename_column(d, "w", "v")
    # compaction purges the shadow; the name is reusable
    snap.snapshot_compact(spark, d, target_files=1)
    assert not snap.read_snapshot_meta(d, snap.current_version(d)).get("dropped_columns")
    snap.snapshot_add_column(d, "v", "double")
    out = snap.read_snapshot(spark, d)
    assert set(out.columns) == {"k", "w", "v"}
    # and the resurrected name reads NULL, not the old bytes
    assert out.filter(F.col("v").isNotNull()).count() == 0


def test_rename_survives_other_verbs_and_compaction_retires_it(spark, tmp_path):
    d = str(tmp_path / "t")
    snap.snapshot_append(spark, d, _df(spark, 0, 10), stats_cols=["k"])
    snap.snapshot_rename_column(d, "v", "price")
    # verbs that carry the mapping
    snap.snapshot_set_constraint(spark, d, "k_nonneg", "k >= 0")
    snap.snapshot_delete(spark, d, spark.createDataFrame([(1,)], "k long"), "k")
    snap.snapshot_analyze(spark, d, ["k"])
    rows = {r.k: r.price for r in snap.read_snapshot(spark, d).collect()}
    assert rows == {i: i * 2.0 for i in range(10) if i != 1}
    # MERGE through the mapping: base read aligned, rewrite declared
    snap.snapshot_merge(
        spark, d, spark.createDataFrame([(2, 999.0)], "k long, price double"), key="k"
    )
    rows = {r.k: r.price for r in snap.read_snapshot(spark, d).collect()}
    assert rows[2] == 999.0 and rows[0] == 0.0
    # full compaction rewrites declared names and retires the mapping
    snap.snapshot_compact(spark, d, target_files=1)
    m = snap.read_snapshot_meta(d, snap.current_version(d))
    assert not m.get("column_mapping")
    rows2 = {r.k: r.price for r in snap.read_snapshot(spark, d).collect()}
    assert rows2 == rows


def test_rollback_and_clone_carry_the_mapping(spark, tmp_path):
    d, c = str(tmp_path / "t"), str(tmp_path / "c")
    snap.snapshot_append(spark, d, _df(spark, 0, 5), stats_cols=["k"])
    snap.snapshot_rename_column(d, "v", "price")  # v2
    snap.snapshot_append(
        spark, d,
        spark.range(5, 8).select(F.col("id").alias("k"), (F.col("id") * 2.0).alias("price")),
        stats_cols=["k"],
    )  # v3
    snap.snapshot_clone(spark, d, c)
    assert {r.k: r.price for r in snap.read_snapshot(spark, c).collect()} == {
        i: i * 2.0 for i in range(8)
    }
    refs.snapshot_rollback(d, 2)
    assert {r.k: r.price for r in snap.read_snapshot(spark, d).collect()} == {
        i: i * 2.0 for i in range(5)
    }


def test_stream_refuses_after_rename(spark, tmp_path):
    """A live snapshot_changes stream pins its schema at start; a
    rename afterwards must fail the NEXT batch loudly (restart adopts
    the new schema) instead of NULL-padding the renamed column."""
    import uuid

    from stock_price_prediction_using_stream_and_batch_processing_spark.sources.snapshot_source import (
        register_snapshot_changes,
    )

    d = str(tmp_path / "t")
    snap.snapshot_append(spark, d, _df(spark, 0, 5), stats_cols=["k"])
    register_snapshot_changes(spark)
    name = f"ren_{uuid.uuid4().hex[:8]}"
    q = (
        spark.readStream.format("snapshot_changes").option("table_dir", d)
        .load().writeStream.format("memory").queryName(name)
        .outputMode("append").start()
    )
    try:
        q.processAllAvailable()
        snap.snapshot_rename_column(d, "v", "price")
        snap.snapshot_append(
            spark, d,
            spark.range(5, 7).select(F.col("id").alias("k"), (F.col("id") * 2.0).alias("price")),
            stats_cols=["k"],
        )
        with pytest.raises(Exception, match="renamed or dropped"):
            q.processAllAvailable()
    finally:
        q.stop()
    # a FRESH stream adopts the new schema, and the rescan-shaped read
    # of pre-rename files resolves through the mapping
    name2 = f"ren2_{uuid.uuid4().hex[:8]}"
    q2 = (
        spark.readStream.format("snapshot_changes").option("table_dir", d)
        .load().writeStream.format("memory").queryName(name2)
        .outputMode("append").start()
    )
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
        q2.awaitTermination()
    got = {(r.k, r.price) for r in spark.table(name2).collect()}
    assert got == {(i, i * 2.0) for i in range(7)}


def test_merge_schema_append_refuses_dropped_shadow(spark, tmp_path):
    """The add_column resurrection refusal must also gate merge_schema
    appends — the other door into the declaration."""
    d = str(tmp_path / "t")
    df3 = spark.range(0, 5).select(
        F.col("id").alias("k"), (F.col("id") * 2.0).alias("v"),
        F.lit("x").alias("w"),
    )
    snap.snapshot_append(spark, d, df3, stats_cols=["k"])
    snap.snapshot_drop_column(d, "v")
    wider = spark.range(5, 7).select(
        F.col("id").alias("k"), F.lit("y").alias("w"), F.lit(9.0).alias("v")
    )
    with pytest.raises(ValueError, match="shadow DROPPED"):
        snap.snapshot_append(spark, d, wider, stats_cols=["k"], merge_schema=True)
    assert snap.read_snapshot(spark, d).columns == ["k", "w"]


def test_rename_source_is_a_shadow_at_every_door(spark, tmp_path):
    """r15 adversarial sweep finding (VERDICT r14 ask #8): after
    rename a->b, old files still physically hold column 'a' — the
    aligned reader resolves names per file, so RE-DECLARING 'a'
    through any door read those stale bytes back out as the new
    column's values (add_column / merge_schema resurrected them;
    rename-onto even MIS-ATTRIBUTED them: 'rename v->a' returned the
    old a-bytes, not v's). All three doors now refuse on the mapping's
    SOURCE names exactly like dropped-column shadows; compaction
    rewrites under declared names, retiring the shadow."""
    d = str(tmp_path / "t")
    snap.snapshot_append(spark, d, _df(spark, 0, 3), stats_cols=["k"])
    snap.snapshot_rename_column(d, "v", "price")
    with pytest.raises(ValueError, match="RENAME source"):
        snap.snapshot_add_column(d, "v", "double")
    with pytest.raises(ValueError, match="RENAME source"):
        snap.snapshot_append(
            spark, d,
            spark.range(3, 5).select(
                F.col("id").alias("k"), (F.col("id") * 2.0).alias("price"),
                F.lit(0.0).alias("v"),
            ),
            stats_cols=["k"], merge_schema=True,
        )
    with pytest.raises(ValueError, match="RENAME source"):
        snap.snapshot_rename_column(d, "k", "v")
    # compaction retires the mapping: the name is reusable and the
    # re-added column reads NULL (no stale bytes survive the rewrite)
    snap.snapshot_compact(spark, d)
    snap.snapshot_add_column(d, "v", "double")
    out = snap.read_snapshot(spark, d)
    assert out.filter(F.col("v").isNotNull()).count() == 0
    assert {r.k: r.price for r in out.collect()} == {i: i * 2.0 for i in range(3)}


def test_rename_vs_concurrent_merge_cannot_both_land(spark, tmp_path):
    """Cross-verb conflict pin (r15 sweep): MERGE derives its carried
    files from the planned parent and deliberately never rebases — a
    RENAME landing between merge plan and publish takes the version
    slot, so the merge refuses instead of publishing entries that
    reference the pre-rename declaration."""
    d = str(tmp_path / "t")
    snap.snapshot_append(spark, d, _df(spark, 0, 10), stats_cols=["k"])

    orig_publish = snap._publish
    fired = {"done": False}

    def racing_publish(table_dir, version, s):
        if not fired["done"] and s.get("merge"):
            fired["done"] = True
            snap.snapshot_rename_column(d, "v", "price")
        return orig_publish(table_dir, version, s)

    snap._publish = racing_publish
    try:
        with pytest.raises(snap.ConcurrentCommitError):
            snap.snapshot_merge(
                spark, d,
                spark.range(1, 2).select(F.col("id").alias("k"), F.lit(99.0).alias("v")),
                key="k",
            )
    finally:
        snap._publish = orig_publish
    # the rename won; the merge left no trace
    out = snap.read_snapshot(spark, d)
    assert out.columns == ["k", "price"]
    assert {r.k: r.price for r in out.collect()} == {i: i * 2.0 for i in range(10)}


def test_append_racing_rename_refuses_stale_schema(spark, tmp_path):
    """r15 sweep pin: an append planned before a RENAME but publishing
    after it rebases onto the renamed declaration and must refuse —
    plainly (schema differs) without merge_schema, and through the
    RENAME-source shadow gate with it. Either way the stale-named rows
    can never enter the renamed table."""
    d = str(tmp_path / "t")
    snap.snapshot_append(spark, d, _df(spark, 0, 3), stats_cols=["k"])
    orig_publish = snap._publish

    def run_race(merge_schema):
        fired = {"done": False}

        def racing_publish(table_dir, version, s):
            if not fired["done"] and "rename_column" not in s:
                fired["done"] = True
                snap.snapshot_rename_column(d, "v", "price")
            return orig_publish(table_dir, version, s)

        snap._publish = racing_publish
        try:
            snap.snapshot_append(
                spark, d, _df(spark, 3, 5), stats_cols=["k"],
                merge_schema=merge_schema,
            )
        finally:
            snap._publish = orig_publish

    with pytest.raises(ValueError, match="schema differs"):
        run_race(False)
    assert snap.read_snapshot(spark, d).columns == ["k", "price"]
    with pytest.raises(ValueError, match="RENAME source"):
        run_race(True)
    assert snap.read_snapshot(spark, d).count() == 3
