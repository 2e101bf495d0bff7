"""Bucketed co-located joins: same-key same-bucket-count tables must
join with NO Exchange (the pay-shuffle-once-at-ingest layout)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stock_price_prediction_using_stream_and_batch_processing_spark.sources import bucketed
from stock_price_prediction_using_stream_and_batch_processing_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def tables(spark):
    li = load_table(spark, SF, "lineitem")
    o = load_table(spark, SF, "orders")
    bucketed.save_bucketed(li, "li_bkt", "l_orderkey", n_buckets=8, sort_cols=["l_orderkey"])
    bucketed.save_bucketed(o, "o_bkt", "o_orderkey", n_buckets=8, sort_cols=["o_orderkey"])
    yield "li_bkt", "o_bkt"
    spark.sql("DROP TABLE IF EXISTS li_bkt")
    spark.sql("DROP TABLE IF EXISTS o_bkt")


def test_bucketed_join_has_no_shuffle(spark, tables):
    # At sf0.001 the planner would rather broadcast tiny orders (also
    # fine); the merge hint forces the fact-fact shape the layout is
    # for. Both scans must come back bucketed with NO shuffle Exchange
    # and NO per-query sort (files are sortBy-clustered).
    li, o = tables
    j = bucketed.read_table(spark, li).hint("merge").join(
        bucketed.read_table(spark, o),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange hashpartitioning" not in plan, plan
    assert "BroadcastExchange" not in plan
    assert plan.count("Bucketed: true") == 2


def test_bucketed_join_results_match_plain_join(spark, tables):
    li, o = tables
    got = (
        bucketed.read_table(spark, li)
        .join(bucketed.read_table(spark, o), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"), F.round(F.sum("l_extendedprice"), 2).alias("rev"))
    )
    want = (
        load_table(spark, SF, "lineitem")
        .join(load_table(spark, SF, "orders"), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"), F.round(F.sum("l_extendedprice"), 2).alias("rev"))
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_bucketed_agg_avoids_shuffle(spark, tables):
    # group-by on the bucket key also satisfies the required
    # distribution -> aggregation without Exchange.
    li, _ = tables
    agg = bucketed.read_table(spark, li).groupBy("l_orderkey").agg(F.sum("l_quantity").alias("q"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
