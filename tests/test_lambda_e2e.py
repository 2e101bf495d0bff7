"""The full Lambda architecture end-to-end (SURVEY §3): the STREAM path
persists raw ticks to the durable table; the BATCH path reads that same
table, windows it, and predicts — outputs must match the NumPy mirror
of the reference math. Plus the retrain loop's model persistence
round trip (the reference ships lstm_model.keras; we ship a fitted
MLlib pipeline)."""

from __future__ import annotations

import numpy as np
import pytest

from stock_price_prediction_using_stream_and_batch_processing_spark import batch
from stock_price_prediction_using_stream_and_batch_processing_spark.ml import training
from stock_price_prediction_using_stream_and_batch_processing_spark.sources.ticks import generate_ticks, ticks_dataframe
from stock_price_prediction_using_stream_and_batch_processing_spark.streaming.pipeline import (
    file_tick_source,
    run_tick_stream,
)
from tests.test_reference_parity import numpy_predict
from tests.test_streaming import _write_tick_files


def test_lambda_stream_to_batch(spark, tmp_path):
    # 1. stream side ingests the wire format and persists the raw table
    n = 150
    src = _write_tick_files(tmp_path, n, 5)
    sink = str(tmp_path / "stock_ticks_raw")
    q = run_tick_stream(
        spark,
        file_tick_source(spark, src, max_files_per_trigger=1),
        sink_path=sink,
        checkpoint_path=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(180)
    # 2. batch side reads the SAME durable table (the handoff point —
    # reference: MySQL stock_ticks_raw) and runs sliding-60 inference
    preds = batch.run_once(spark, sink, k=120, seq_len=60, min_rows=100)
    got = [r.predicted_price for r in preds.orderBy("timestamp").collect()]
    prices = [t["price"] for t in generate_ticks(n)][-120:]
    want = numpy_predict(prices, 60)
    assert len(got) == 120 - 60 + 1
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_model_persistence_roundtrip(spark, tmp_path):
    ticks = ticks_dataframe(spark, 300)
    model, frame = training.train_next_value_model(ticks, "symbol", "timestamp", "price", seq_len=5)
    path = str(tmp_path / "model")
    training.save_model(model, path)
    loaded = training.load_saved_model(path)
    a = [r.predicted_next for r in training.score(model, frame).orderBy("timestamp").collect()]
    b = [r.predicted_next for r in training.score(loaded, frame).orderBy("timestamp").collect()]
    assert a == pytest.approx(b, rel=1e-12)
