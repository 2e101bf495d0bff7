"""MLlib retraining path (ml/training.py): the distributed fit the
reference's 'retrain_model' claims but never does."""

from __future__ import annotations

import math

import pytest

from stock_price_prediction_using_stream_and_batch_processing_spark.ml import training
from stock_price_prediction_using_stream_and_batch_processing_spark.sources.ticks import ticks_dataframe


@pytest.fixture(scope="module")
def ticks(spark):
    return ticks_dataframe(spark, 600, symbols=("AAPL", "MSFT")).cache()


def test_window_features_shape(spark, ticks):
    frame = training.window_features(ticks, "symbol", "timestamp", "price", seq_len=5)
    # per symbol: 300 rows -> need 4 lags + 1 lead -> 300 - 5 usable
    assert frame.count() == 2 * (300 - 5)
    row = frame.orderBy("symbol", "timestamp").first()
    # lags are the trailing window ending at the current row
    assert row.lag_0 == row.price
    assert all(row[f"lag_{i}"] is not None for i in range(5))


def test_train_and_score_beats_trivial_baseline(spark, ticks):
    model, frame = training.train_next_value_model(ticks, "symbol", "timestamp", "price", seq_len=5)
    scored = training.score(model, frame)
    rows = scored.select("price", "label", "predicted_next").collect()
    assert all(math.isfinite(r.predicted_next) for r in rows)
    rmse_model = math.sqrt(sum((r.predicted_next - r.label) ** 2 for r in rows) / len(rows))
    # naive baseline: predict no change (random walk's best constant guess)
    rmse_naive = math.sqrt(sum((r.price - r.label) ** 2 for r in rows) / len(rows))
    assert rmse_model <= rmse_naive * 1.05  # fitted model >= baseline quality


def test_training_is_deterministic(spark, ticks):
    m1, f1 = training.train_next_value_model(ticks, "symbol", "timestamp", "price", seq_len=3)
    m2, _ = training.train_next_value_model(ticks, "symbol", "timestamp", "price", seq_len=3)
    c1 = m1.stages[-1].coefficients.toArray().tolist()
    c2 = m2.stages[-1].coefficients.toArray().tolist()
    assert c1 == pytest.approx(c2, rel=1e-9)


def test_save_load_roundtrip_and_window_scoring(spark, ticks, tmp_path):
    from stock_price_prediction_using_stream_and_batch_processing_spark.operators import windows

    model, frame = training.train_next_value_model(ticks, "symbol", "timestamp", "price", seq_len=5)
    path = str(tmp_path / "model")
    training.save_model(model, path)
    reloaded = training.load_saved_model(path)
    # score_windows over window ARRAYS == transform over lag columns
    win = windows.trailing_collect(ticks, "symbol", "timestamp", "price", 5, tiebreak="timestamp")
    got = {
        (r.symbol, r.timestamp, round(r.predicted_price, 9))
        for r in training.score_windows(reloaded, win, "window_values", seq_len=5).collect()
    }
    want = {
        (r.symbol, r.timestamp, round(r.prediction, 9))
        for r in model.transform(frame).select("symbol", "timestamp", "prediction").collect()
    }
    # frame rows additionally require a NEXT value (label) — windows
    # at each series tail score in got but not in want
    assert want <= got
    assert len(got) - len(want) == 2  # one tail row per symbol


def test_scoring_stays_jvm_side(spark, ticks):
    model, frame = training.train_next_value_model(ticks, "symbol", "timestamp", "price", seq_len=3)
    plan = training.score(model, frame)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
