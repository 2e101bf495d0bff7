"""Salting operators: results must be IDENTICAL to the unsalted plan
(only physical distribution changes), including under a planted hot key."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stock_price_prediction_using_stream_and_batch_processing_spark.operators import skew


@pytest.fixture(scope="module")
def hot(spark):
    # 90% of rows share key 'HOT' — the shape that funnels one reducer.
    df = spark.range(2000).select(
        F.col("id"),
        F.when(F.col("id") % 10 < 9, F.lit("HOT")).otherwise(F.concat(F.lit("k"), F.col("id") % 7)).alias("k"),
        (F.col("id") * 1.5).alias("v"),
    )
    return df.cache()


def test_salted_agg_equals_direct(hot):
    direct = {
        r.k: (r.s, r.c)
        for r in hot.groupBy("k").agg(F.sum("v").alias("s"), F.count("*").alias("c")).collect()
    }
    salted = skew.salted_sum_count(hot, ["k"], "v", unique_col="id", n_salts=8)
    got = {r.k: (r.sum_value, r.n_rows) for r in salted.collect()}
    assert set(got) == set(direct)
    for k in direct:
        assert got[k][1] == direct[k][1]
        assert got[k][0] == pytest.approx(direct[k][0], rel=1e-12)


def test_salted_join_equals_direct(spark, hot):
    dim = spark.createDataFrame(
        [("HOT", "hot-dim")] + [(f"k{i}", f"dim{i}") for i in range(7)], "k string, label string"
    )
    direct = {(r.id, r.label) for r in hot.join(dim, "k").collect()}
    salted = {(r.id, r.label) for r in skew.salted_join_big_hot(hot, dim, "k", unique_col="id", n_salts=8).collect()}
    assert salted == direct and len(direct) == 2000


def test_salt_is_deterministic(hot):
    a = skew.with_salt(hot, "id", 8).select("id", "_salt").collect()
    b = skew.with_salt(hot, "id", 8).select("id", "_salt").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    salts = {r._salt for r in a}
    assert salts == set(range(8))  # every reducer bucket actually used
