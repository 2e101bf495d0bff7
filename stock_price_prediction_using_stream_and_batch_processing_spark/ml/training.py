"""Distributed model (re)training via pyspark.ml — the capability the
reference NAMES but never implements: ``batch_processor.retrain_model``
(``batch_processor.py:103-151``) only re-runs inference with the frozen
``lstm_model.keras``; nothing is ever fitted.

Here the batch job can actually retrain: trailing-window lag features
(native window functions) -> ``VectorAssembler`` -> ``LinearRegression``
fitted with MLlib's distributed solver, then scored with the model's
own ``transform`` (JVM-side, no Python boundary at all). The fitted
coefficients play the same role as the Keras artifact — a
deterministic, saveable model the streaming side can reload.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window


def window_features(
    df: DataFrame,
    key: str,
    ts: str,
    value: str,
    seq_len: int = 5,
    label_out: str = "label",
    tiebreak: str | None = None,
) -> DataFrame:
    """Supervised frame: features = the ``seq_len`` trailing values
    (lag seq_len-1 .. lag 0), label = the NEXT value. One shuffle on the
    series key; rows without a full window or a next value are dropped."""
    order = [F.col(ts)] + ([F.col(tiebreak)] if tiebreak else [])
    w = Window.partitionBy(key).orderBy(*order)
    out = df
    for i in range(seq_len):
        out = out.withColumn(f"lag_{seq_len - 1 - i}", F.lag(value, seq_len - 1 - i).over(w))
    out = out.withColumn(label_out, F.lead(value, 1).over(w))
    feat_cols = [f"lag_{i}" for i in range(seq_len - 1, -1, -1)]
    cond = F.lit(True)
    for c in feat_cols + [label_out]:
        cond = cond & F.col(c).isNotNull()
    return out.filter(cond)


def train_next_value_model(
    df: DataFrame,
    key: str,
    ts: str,
    value: str,
    seq_len: int = 5,
    tiebreak: str | None = None,
):
    """Fit LinearRegression on the windowed frame. Returns
    (pipeline_model, training_frame). Distributed: feature build is a
    window shuffle, the fit is MLlib's WLS/L-BFGS over partitioned data."""
    from pyspark.ml import Pipeline
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.regression import LinearRegression

    frame = window_features(df, key, ts, value, seq_len, tiebreak=tiebreak)
    feat_cols = [f"lag_{i}" for i in range(seq_len - 1, -1, -1)]
    pipe = Pipeline(
        stages=[
            VectorAssembler(inputCols=feat_cols, outputCol="features"),
            LinearRegression(featuresCol="features", labelCol="label", regParam=1e-6),
        ]
    )
    model = pipe.fit(frame)
    return model, frame


def score(model, frame: DataFrame, out: str = "predicted_next") -> DataFrame:
    """JVM-side scoring via the fitted pipeline's transform."""
    return model.transform(frame).withColumnRenamed("prediction", out)


def score_windows(
    model,
    df: DataFrame,
    window_col: str = "window_values",
    seq_len: int = 5,
    out: str = "predicted_price",
) -> DataFrame:
    """Score trailing-window ARRAYS with a fitted/reloaded pipeline —
    the bridge that lets the streaming predict path swap its default
    predictor for a retrained, saved MLlib artifact (the engine's
    version of the reference hot-swapping ``lstm_model.keras``,
    ``stream_consumer.py:43-45``).

    The window array unpacks into the ``lag_i`` feature columns the
    assembler was fitted on (``element_at`` is 1-based; the array's last
    element is the newest value = ``lag_0``). Entirely JVM-side — no
    Python boundary."""
    feat = df
    for i in range(seq_len):
        feat = feat.withColumn(f"lag_{i}", F.element_at(F.col(window_col), seq_len - i))
    scored = model.transform(feat)
    return scored.withColumnRenamed("prediction", out).drop(
        "features", *[f"lag_{i}" for i in range(seq_len)]
    )


def save_model(model, path: str) -> None:
    """Persist the fitted pipeline — the engine's counterpart of the
    reference's ``lstm_model.keras`` artifact, re-loadable on any
    cluster."""
    model.write().overwrite().save(path)


def load_saved_model(path: str):
    from pyspark.ml import PipelineModel

    return PipelineModel.load(path)
