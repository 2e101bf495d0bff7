"""CHECK constraints on the snapshot store
(operators/snapshots.snapshot_set_constraint): validated adds,
refused violating appends/branch-appends/merges, carry through
maintenance commits, drop, and rollback restoration."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stock_price_prediction_using_stream_and_batch_processing_spark.operators import refs
from stock_price_prediction_using_stream_and_batch_processing_spark.operators import snapshots as snap


def _df(spark, lo, hi, scale=1):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") * scale).alias("v")
    )


def test_constraint_refuses_bad_append_and_accepts_good(spark, tmp_path):
    d = str(tmp_path / "t")
    snap.snapshot_append(spark, d, _df(spark, 0, 10), stats_cols=["k"])
    v = snap.snapshot_set_constraint(spark, d, "v_nonneg", "v >= 0")
    assert v == 2
    assert snap.table_constraints(d) == {"v_nonneg": "v >= 0"}
    before = snap.current_version(d)
    with pytest.raises(snap.ConstraintViolationError, match="v_nonneg"):
        snap.snapshot_append(spark, d, _df(spark, 10, 20, scale=-1))
    # refused: version unchanged, staged files removed
    assert snap.current_version(d) == before
    assert snap.read_snapshot(spark, d).count() == 10
    v3 = snap.snapshot_append(spark, d, _df(spark, 10, 20))
    assert snap.read_snapshot(spark, d, v3).count() == 20


def test_null_counts_as_violation(spark, tmp_path):
    d = str(tmp_path / "t")
    snap.snapshot_append(spark, d, _df(spark, 0, 5), stats_cols=["k"])
    snap.snapshot_set_constraint(spark, d, "v_nonneg", "v >= 0")
    nulled = _df(spark, 5, 8).withColumn("v", F.lit(None).cast("bigint"))
    with pytest.raises(snap.ConstraintViolationError):
        snap.snapshot_append(spark, d, nulled)


def test_validate_scans_existing_rows(spark, tmp_path):
    d = str(tmp_path / "t")
    snap.snapshot_append(spark, d, _df(spark, 0, 10, scale=-1), stats_cols=["k"])
    with pytest.raises(snap.ConstraintViolationError):
        snap.snapshot_set_constraint(spark, d, "v_nonneg", "v >= 0")
    # validate=False skips the scan: the constraint binds future writes
    v = snap.snapshot_set_constraint(spark, d, "v_nonneg", "v >= 0", validate=False)
    assert v == 2
    with pytest.raises(snap.ConstraintViolationError):
        snap.snapshot_append(spark, d, _df(spark, 10, 12, scale=-1))


def test_duplicate_and_missing_constraint_refuse(spark, tmp_path):
    d = str(tmp_path / "t")
    snap.snapshot_append(spark, d, _df(spark, 0, 5), stats_cols=["k"])
    snap.snapshot_set_constraint(spark, d, "c", "v >= 0")
    with pytest.raises(ValueError, match="already exists"):
        snap.snapshot_set_constraint(spark, d, "c", "v >= 1")
    with pytest.raises(ValueError, match="no constraint"):
        snap.snapshot_drop_constraint(d, "ghost")


def test_constraints_carry_through_maintenance_and_drop(spark, tmp_path):
    d = str(tmp_path / "t")
    snap.snapshot_append(spark, d, _df(spark, 0, 10), stats_cols=["k"])
    snap.snapshot_set_constraint(spark, d, "v_nonneg", "v >= 0")
    snap.snapshot_append(spark, d, _df(spark, 10, 20))
    snap.snapshot_compact(spark, d, target_files=1)
    # the compact (a full-rewrite commit) must not drop enforcement
    assert snap.table_constraints(d) == {"v_nonneg": "v >= 0"}
    with pytest.raises(snap.ConstraintViolationError):
        snap.snapshot_append(spark, d, _df(spark, 20, 25, scale=-1))
    snap.snapshot_drop_constraint(d, "v_nonneg")
    assert snap.table_constraints(d) == {}
    v = snap.snapshot_append(spark, d, _df(spark, 20, 25, scale=-1))
    assert snap.read_snapshot(spark, d, v).count() == 25


def test_merge_enforces_constraints_on_updates(spark, tmp_path):
    d = str(tmp_path / "t")
    snap.snapshot_append(spark, d, _df(spark, 0, 10), stats_cols=["k"])
    snap.snapshot_set_constraint(spark, d, "v_nonneg", "v >= 0")
    bad_updates = _df(spark, 3, 6, scale=-1)
    with pytest.raises(snap.ConstraintViolationError):
        snap.snapshot_merge(spark, d, bad_updates, key="k")
    assert snap.read_snapshot(spark, d).where("v < 0").count() == 0
    out = snap.snapshot_merge(spark, d, _df(spark, 3, 6, scale=10), key="k")
    got = snap.read_snapshot(spark, d, out["version"])
    assert got.where("k = 4").collect()[0].v == 40


def test_branch_appends_inherit_constraints(spark, tmp_path):
    d = str(tmp_path / "t")
    snap.snapshot_append(spark, d, _df(spark, 0, 10), stats_cols=["k"])
    snap.snapshot_set_constraint(spark, d, "v_nonneg", "v >= 0")
    refs.branch_create(d, "b")
    with pytest.raises(snap.ConstraintViolationError):
        refs.branch_append(spark, d, "b", _df(spark, 10, 15, scale=-1))
    refs.branch_append(spark, d, "b", _df(spark, 10, 15))
    v = refs.branch_publish(d, "b", drop=True)
    # published snapshot still carries the constraint
    assert snap.table_constraints(d) == {"v_nonneg": "v >= 0"}
    assert snap.read_snapshot(spark, d, v).count() == 15


def test_rollback_restores_constraint_state(spark, tmp_path):
    d = str(tmp_path / "t")
    snap.snapshot_append(spark, d, _df(spark, 0, 5), stats_cols=["k"])  # v1
    snap.snapshot_set_constraint(spark, d, "c", "v >= 0")  # v2
    snap.snapshot_drop_constraint(d, "c")  # v3
    refs.snapshot_rollback(d, 2)  # v4: constraint state as of v2
    assert snap.table_constraints(d) == {"c": "v >= 0"}
