"""Multi-table atomic transactions via the catalog pointer
(operators/catalog.py): cross-table consistency for catalog readers,
pinned catalog versions, disjoint-rebase vs same-table refusal,
crash-between-steps invisibility."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stock_price_prediction_using_stream_and_batch_processing_spark.operators import catalog as cat
from stock_price_prediction_using_stream_and_batch_processing_spark.operators import snapshots as snap
from stock_price_prediction_using_stream_and_batch_processing_spark.operators.snapshots import (
    ConcurrentCommitError,
)


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )


def test_txn_is_atomic_for_catalog_readers(spark, tmp_path):
    c = str(tmp_path / "cat")
    a_dir, b_dir = str(tmp_path / "a"), str(tmp_path / "b")
    # txn 1: both tables gain 10 rows, one catalog version
    for i in range(3):
        txn = cat.CatalogTransaction(c)
        txn.append(spark, "a", a_dir, _df(spark, i * 10, (i + 1) * 10), stats_cols=["k"])
        txn.append(spark, "b", b_dir, _df(spark, i * 10, (i + 1) * 10), stats_cols=["k"])
        assert txn.commit() == i + 1
    # the cross-table invariant holds at EVERY catalog version
    for v in (1, 2, 3):
        na = cat.catalog_read(spark, c, "a", v).count()
        nb = cat.catalog_read(spark, c, "b", v).count()
        assert na == nb == v * 10
    # a pinned catalog version is immune to later transactions
    pin = cat.catalog_version(c)
    txn = cat.CatalogTransaction(c)
    txn.append(spark, "a", a_dir, _df(spark, 100, 120), stats_cols=["k"])
    txn.append(spark, "b", b_dir, _df(spark, 100, 120), stats_cols=["k"])
    txn.commit()
    assert cat.catalog_read(spark, c, "a", pin).count() == 30
    assert cat.catalog_read(spark, c, "a").count() == 50


def test_half_committed_txn_invisible_until_publish(spark, tmp_path):
    c = str(tmp_path / "cat")
    a_dir, b_dir = str(tmp_path / "a"), str(tmp_path / "b")
    txn = cat.CatalogTransaction(c)
    txn.append(spark, "a", a_dir, _df(spark, 0, 10), stats_cols=["k"])
    txn.append(spark, "b", b_dir, _df(spark, 0, 10), stats_cols=["k"])
    txn.commit()
    # a "crashed" transaction: staged on a branch, commit() never runs —
    # the table's MAIN LINE does not move (nothing to chain on later)
    txn2 = cat.CatalogTransaction(c)
    txn2.append(spark, "a", a_dir, _df(spark, 10, 20), stats_cols=["k"])
    assert snap.current_version(a_dir) == 1
    assert cat.catalog_read(spark, c, "a").count() == 10
    assert cat.catalog_tables(c) == {"a": 1, "b": 1}
    # a LATER transaction commits cleanly — the abandoned txn2 rows
    # never surface (the head-chaining leak the r12 review caught)
    txn3 = cat.CatalogTransaction(c)
    txn3.append(spark, "a", a_dir, _df(spark, 50, 55), stats_cols=["k"])
    txn3.commit()
    got = sorted(r.k for r in cat.catalog_read(spark, c, "a").collect())
    assert got == list(range(10)) + list(range(50, 55))
    txn2.abort()


def test_abort_and_divergence_refusal(spark, tmp_path):
    c = str(tmp_path / "cat")
    a_dir = str(tmp_path / "a")
    txn = cat.CatalogTransaction(c)
    txn.append(spark, "a", a_dir, _df(spark, 0, 10), stats_cols=["k"])
    txn.commit()
    # abort: branch dropped, nothing moved
    t = cat.CatalogTransaction(c)
    t.append(spark, "a", a_dir, _df(spark, 10, 20), stats_cols=["k"])
    t.abort()
    assert snap.current_version(a_dir) == 1
    # a DIRECT write to a catalog-managed table diverges head from pin:
    # the next transactional write refuses loudly instead of silently
    # adopting the out-of-band rows
    snap.snapshot_append(spark, a_dir, _df(spark, 90, 95), stats_cols=["k"])
    t2 = cat.CatalogTransaction(c)
    with pytest.raises(ValueError, match="diverged"):
        t2.append(spark, "a", a_dir, _df(spark, 20, 25), stats_cols=["k"])
    # reconcile by pinning the head; transactions resume
    t3 = cat.CatalogTransaction(c)
    t3.pin("a", a_dir)
    t3.commit()
    t4 = cat.CatalogTransaction(c)
    t4.append(spark, "a", a_dir, _df(spark, 20, 25), stats_cols=["k"])
    t4.commit()
    assert cat.catalog_read(spark, c, "a").count() == 20


def test_disjoint_txns_rebase_same_table_refuses(spark, tmp_path):
    c = str(tmp_path / "cat")
    dirs = {n: str(tmp_path / n) for n in ("a", "b", "x")}
    txn = cat.CatalogTransaction(c)
    for n in dirs:
        txn.append(spark, n, dirs[n], _df(spark, 0, 5), stats_cols=["k"])
    txn.commit()
    # txn on {a, b} staged against catalog v1
    t1 = cat.CatalogTransaction(c)
    t1.append(spark, "a", dirs["a"], _df(spark, 5, 10), stats_cols=["k"])
    t1.append(spark, "b", dirs["b"], _df(spark, 5, 10), stats_cols=["k"])
    # concurrent txn on {x} lands first: DISJOINT -> t1 rebases fine
    t2 = cat.CatalogTransaction(c)
    t2.append(spark, "x", dirs["x"], _df(spark, 5, 10), stats_cols=["k"])
    assert t2.commit() == 2
    assert t1.commit() == 3
    assert cat.catalog_tables(c) == {"a": 2, "b": 2, "x": 2}
    # a txn whose table moved underneath it REFUSES
    t3 = cat.CatalogTransaction(c)
    t3.append(spark, "a", dirs["a"], _df(spark, 10, 15), stats_cols=["k"])
    t4 = cat.CatalogTransaction(c)
    t4.append(spark, "a", dirs["a"], _df(spark, 20, 25), stats_cols=["k"])
    assert t4.commit() == 4
    with pytest.raises(ConcurrentCommitError, match="moved from pin"):
        t3.commit()


def test_empty_txn_and_unknown_table_refuse(spark, tmp_path):
    c = str(tmp_path / "cat")
    with pytest.raises(ValueError, match="empty transaction"):
        cat.CatalogTransaction(c).commit()
    txn = cat.CatalogTransaction(c)
    txn.append(spark, "a", str(tmp_path / "a"), _df(spark, 0, 5), stats_cols=["k"])
    txn.commit()
    with pytest.raises(ValueError, match="not in catalog"):
        cat.catalog_read(spark, c, "ghost")


def test_pin_registers_existing_table(spark, tmp_path):
    c = str(tmp_path / "cat")
    d = str(tmp_path / "pre")
    snap.snapshot_append(spark, d, _df(spark, 0, 7), stats_cols=["k"])
    txn = cat.CatalogTransaction(c)
    txn.pin("pre", d)
    txn.commit()
    assert cat.catalog_read(spark, c, "pre").count() == 7
