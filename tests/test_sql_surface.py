"""The engine's SQL surface: every table registers as a temp view
(sources/tables.register_views) and Spark SQL expresses the same
queries the DataFrame ops build — users of either API get identical
results (SURVEY §1.3: temp views over Parquet).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stock_price_prediction_using_stream_and_batch_processing_spark.operators import windows
from stock_price_prediction_using_stream_and_batch_processing_spark.sources.tables import TABLES, load_table, register_views

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module", autouse=True)
def views(spark):
    register_views(spark, SF)


def test_all_tables_registered(spark):
    for t in TABLES:
        assert spark.sql(f"SELECT COUNT(*) AS c FROM {t}").collect()[0].c > 0


def test_sql_window_equals_dataframe_op(spark):
    ev = load_table(spark, SF, "events")
    df_rows = {
        (r.event_id, round(r.trailing_mean, 9))
        for r in windows.trailing_mean(ev, "user_id", "ts", "value", 5, tiebreak="event_id").select(
            "event_id", "trailing_mean"
        ).collect()
    }
    sql_rows = {
        (r.event_id, round(r.trailing_mean, 9))
        for r in spark.sql(
            """
            SELECT event_id,
                   AVG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS trailing_mean
            FROM events
            """
        ).collect()
    }
    assert df_rows == sql_rows


def test_sql_join_agg_equals_dataframe(spark):
    got = {
        (r.c_mktsegment, r.n, round(r.total, 4))
        for r in spark.sql(
            """
            SELECT c.c_mktsegment, COUNT(*) AS n, SUM(o.o_totalprice) AS total
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY c.c_mktsegment
            """
        ).collect()
    }
    o = load_table(spark, SF, "orders")
    c = load_table(spark, SF, "customer")
    want = {
        (r.c_mktsegment, r.n, round(r.total, 4))
        for r in o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n"), F.sum("o_totalprice").alias("total"))
        .collect()
    }
    assert got == want
