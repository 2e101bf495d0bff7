"""Approximate-aggregate error bounds vs exact answers (the sketch ops
are rows-only in the oracle corpus — this is their correctness check)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stock_price_prediction_using_stream_and_batch_processing_spark.plans.core import full_query_map
from stock_price_prediction_using_stream_and_batch_processing_spark.sources.tables import load_table

SF = "/root/testdata/sf0.01"


def test_approx_within_bounds(spark):
    got = {r.event_type: r for r in full_query_map()["approx_agg_stats"](spark, SF).collect()}
    ev = load_table(spark, SF, "events")
    exact = {
        r.event_type: r
        for r in ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("users"),
            F.expr("percentile(value, array(0.5, 0.95))").alias("pcts"),
            F.count("*").alias("n"),
        )
        .collect()
    }
    assert set(got) == set(exact)
    for et, e in exact.items():
        g = got[et]
        assert g.n_rows == e.n  # count is exact
        assert g.approx_users == pytest.approx(e.users, rel=0.05)  # HLL rsd=0.02
        for approx_q, exact_q in zip((g.value_p50, g.value_p95), e.pcts):
            assert approx_q == pytest.approx(exact_q, rel=0.05)
