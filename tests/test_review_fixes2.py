"""Regression tests for the second review pass: as-of row atomicity,
salted-join how validation, LSH banding validation, empty-graph
pagerank, NULL-score binning, cross-id-space similarity, complex-type
snapshot diffing, and the winnowing admission filter."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stock_price_prediction_using_stream_and_batch_processing_spark.operators import (
    dedup,
    graph,
    joins,
    quality,
    similarity,
    skew,
    textops,
)
from stock_price_prediction_using_stream_and_batch_processing_spark.operators.upsert import snapshot_diff


def test_asof_join_attaches_whole_row_atomically(spark):
    """A NULL field in the newest right row must NOT fall back to an
    older row's value (that would synthesize a composite row that never
    existed)."""
    left = spark.createDataFrame([("k", 30, 0)], "key string, ts long, seq long")
    right = spark.createDataFrame(
        [("k", 10, 10.0, 11.0), ("k", 20, None, 5.0)],
        "key string, ts long, bid double, ask double",
    )
    out = joins.asof_join(left, right, "key", "ts", ["bid", "ask"]).collect()
    assert len(out) == 1
    r = out[0]
    assert r["bid"] is None and r["ask"] == 5.0  # the t=20 ROW, as-is


def test_asof_join_reserved_column_guard(spark):
    left = spark.createDataFrame([("k", 1, True)], "key string, ts long, _is_left boolean")
    right = spark.createDataFrame([("k", 1, 1.0)], "key string, ts long, v double")
    with pytest.raises(ValueError, match="_is_left"):
        joins.asof_join(left, right, "key", "ts", ["v"])


def test_salted_join_rejects_small_side_preserving_how(spark):
    big = spark.createDataFrame([(1, "k", 1.0)], "id long, k string, v double")
    small = spark.createDataFrame([("k", "dim")], "k string, d string")
    with pytest.raises(ValueError, match="duplicate unmatched"):
        skew.salted_join_big_hot(big, small, "k", "id", n_salts=4, how="full")
    assert skew.salted_join_big_hot(big, small, "k", "id", n_salts=4, how="left").count() == 1


def test_lsh_band_keys_validates_shape(spark):
    d = spark.createDataFrame([(1, "a b c d e")], "doc_id long, text string")
    with pytest.raises(ValueError, match="multiple of bands"):
        dedup.minhash_lsh_pairs(d, "text", "doc_id", num_hashes=8, bands=16)
    with pytest.raises(ValueError, match="multiple of bands"):
        dedup.minhash_lsh_pairs(d, "text", "doc_id", num_hashes=16, bands=5)


def test_pagerank_empty_graph(spark):
    edges = spark.createDataFrame([], "src string, dst string")
    assert graph.pagerank(edges).count() == 0


def test_percentile_bins_null_scores_stay_null(spark):
    df = spark.createDataFrame(
        [(float(i),) for i in range(100)] + [(None,)], "score double"
    )
    out = quality.percentile_bins(df, "score")
    nulls = out.filter(F.col("score").isNull()).collect()
    assert len(nulls) == 1 and nulls[0]["bin"] is None
    assert out.filter(F.col("bin") == 1).filter(F.col("score").isNull()).count() == 0


def test_similarity_separate_id_space(spark):
    # query id 7 must still score corpus id 7 when exclude_self=False
    import random

    random.seed(3)
    rows = [(i, [random.gauss(0, 1) for _ in range(8)]) for i in range(20)]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = spark.createDataFrame([(7, rows[3][1])], "q_id long, embedding array<float>")
    with_self = similarity.brute_force_topk(corpus, q, k=20, exclude_self=False)
    assert {r["vec_id"] for r in with_self.collect()} == set(range(20))
    without = similarity.brute_force_topk(corpus, q, k=20)  # default True
    assert 7 not in {r["vec_id"] for r in without.collect()}


def test_snapshot_diff_complex_types(spark):
    # array whose display-string rendering collides must still diff
    old = spark.createDataFrame([(1, ["a, b"])], "k long, a array<string>")
    new = spark.createDataFrame([(1, ["a", " b"])], "k long, a array<string>")
    assert [r["change_type"] for r in snapshot_diff(old, new, ["k"]).collect()] == ["changed"]
    m_old = spark.createDataFrame([(1, {"x": 1})], "k long, m map<string,int>")
    with pytest.raises(ValueError, match="map"):
        snapshot_diff(m_old, m_old, ["k"])


def test_expire_partitions_type_safe_and_wipe_guard(spark, tmp_path):
    """Typed (date) partition values vs string keep_values must match by
    their directory text — and a keep list matching NOTHING must raise,
    not silently delete the whole table."""
    import datetime as dt
    import os

    from stock_price_prediction_using_stream_and_batch_processing_spark.sources import sinks

    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(dt.date(2024, 1, 1), 1), (dt.date(2024, 1, 2), 2)], "d date, v int"
    )
    df.write.partitionBy("d").parquet(path)
    dropped = sinks.expire_partitions(spark, path, "d", ["2024-01-02"])
    assert [str(v) for v in dropped] == ["2024-01-01"]
    assert os.path.isdir(os.path.join(path, "d=2024-01-02"))
    with pytest.raises(ValueError, match="ALL"):
        sinks.expire_partitions(spark, path, "d", ["1999-01-01"])


def test_grouped_forecast_tiebreak_equals_ts(spark):
    from stock_price_prediction_using_stream_and_batch_processing_spark.ml.grouped import per_key_linear_forecast

    df = spark.createDataFrame(
        [("s", float(i), float(i) * 2.0) for i in range(5)], "symbol string, timestamp double, price double"
    )
    out = per_key_linear_forecast(df, "symbol", "timestamp", "price", tiebreak="timestamp").collect()
    assert len(out) == 1 and out[0]["slope"] == pytest.approx(2.0)


def test_tick_stream_rejects_async_with_available_now(spark, tmp_path):
    from stock_price_prediction_using_stream_and_batch_processing_spark.streaming.pipeline import run_tick_stream

    with pytest.raises(ValueError, match="processing-time"):
        run_tick_stream(
            spark, spark.range(1).selectExpr("CAST(null AS binary) AS value"),
            str(tmp_path / "s"), str(tmp_path / "c"), async_progress=True,
        )


def test_ticks_wire_format_timezone_robust(spark):
    """The JSON wire timestamps carry an explicit UTC offset, so they
    parse identically under ANY session timezone (a naive string would
    land hours away from ticks_dataframe under a non-UTC driver)."""
    from stock_price_prediction_using_stream_and_batch_processing_spark.sources.ticks import ticks_dataframe, ticks_json_lines
    from stock_price_prediction_using_stream_and_batch_processing_spark.streaming.pipeline import parse_ticks

    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        lines = ticks_json_lines(5)
        raw = spark.createDataFrame([(l.encode(),) for l in lines], "value binary")
        parsed = parse_ticks(raw).select("symbol", "timestamp", "price").collect()
        expected = {
            (r["symbol"], r["timestamp"], r["price"])
            for r in ticks_dataframe(spark, 5).select("symbol", "timestamp", "price").collect()
        }
        assert {(r["symbol"], r["timestamp"], r["price"]) for r in parsed} == expected
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


def test_winnow_admission_matches_selection(spark):
    # k=8, window=4: docs shorter than k+window-1=11 normalized chars
    # produce no full window and are excluded up front; an 11-char doc
    # emits exactly one fingerprint window's min.
    df = spark.createDataFrame(
        [(1, "abcdefghi"), (2, "abcdefghijk")], "doc_id long, text string"
    )
    out = textops.winnowed_fingerprints(df, "text", "doc_id", k=8, window=4)
    got = {r["doc_id"] for r in out.collect()}
    assert got == {2}


def test_content_dedup_preserves_caller_underscore_columns(spark):
    # content_dedup / incremental_content_dedup use free_name for their
    # helper columns, so a caller frame already carrying _fp/_rn/_keep_id
    # keeps them (round-5 review finding).
    from pyspark.sql import functions as F

    from stock_price_prediction_using_stream_and_batch_processing_spark.operators import dedup

    df = spark.createDataFrame(
        [(1, "same text", "a"), (2, "same text", "b"), (3, "other", "c")],
        ["doc_id", "text", "_fp"],
    ).withColumn("_rn", F.lit("keepme"))
    out = dedup.content_dedup(df, "text", "doc_id")
    rows = {r.doc_id: (r._fp, r._rn) for r in out.collect()}
    assert set(rows) == {1, 3}
    assert rows[1] == ("a", "keepme")


def test_incremental_content_dedup_with_fp_column(spark, tmp_path):
    from stock_price_prediction_using_stream_and_batch_processing_spark.operators import dedup

    b1 = spark.createDataFrame(
        [(1, "alpha", "x"), (2, "alpha", "y")], ["doc_id", "text", "_fp"]
    )
    b2 = spark.createDataFrame([(3, "alpha", "z"), (4, "beta", "w")], ["doc_id", "text", "_fp"])
    store = str(tmp_path / "fpstore")
    out1 = dedup.incremental_content_dedup(spark, b1, store)
    assert {(r.doc_id, r._fp) for r in out1.collect()} == {(1, "x")}
    out2 = dedup.incremental_content_dedup(spark, b2, store)
    assert {(r.doc_id, r._fp) for r in out2.collect()} == {(4, "w")}


def test_fresh_result_dir_is_private_per_call(tmp_path):
    from stock_price_prediction_using_stream_and_batch_processing_spark.plans.workdirs import (
        fresh_result_dir,
    )

    a, b = fresh_result_dir("t"), fresh_result_dir("t")
    assert a != b
    import os

    assert not os.path.exists(a) and not os.path.exists(b)  # writer creates
    assert os.path.isdir(os.path.dirname(a)) and os.path.isdir(os.path.dirname(b))
