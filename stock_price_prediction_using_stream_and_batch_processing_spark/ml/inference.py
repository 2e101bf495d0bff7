"""Distributed batched model inference over window arrays.

Replaces the reference's driver-side ``model.predict`` calls
(``stream_consumer.py:52-53``: one (1,5,1) predict per micro-batch;
``batch_processor.py:97-100``: one big collected tensor) with an
Arrow-batched scalar ``pandas_udf``: each executor vectorizes inference
over its own Arrow batches, the model is constructed lazily once per
worker, and nothing is ever collected to the driver.

Min-max scaling runs as NATIVE column expressions around the UDF
(functions/scaling.py) so only the irreducible model math crosses the
Python boundary.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.scaling import REFERENCE_SCALER_MAX, REFERENCE_SCALER_MIN, minmax_scale, minmax_unscale
from .predictor import LinearWindowModel


def make_predict_udf(seq_len: int, keras_path: str | None = None):
    """Scalar pandas UDF: array<double> window of SCALED prices ->
    scaled prediction. The model loads lazily per executor process (the
    closure captures only ``seq_len``/``keras_path`` — cheap pickles)."""
    state: dict = {}

    @F.pandas_udf(T.DoubleType())
    def predict(windows: pd.Series) -> pd.Series:
        if "model" not in state:
            from .predictor import load_model

            state["model"] = load_model(seq_len, keras_path)
        x = np.stack(windows.to_numpy())
        out = state["model"].predict(x)
        return pd.Series(np.asarray(out, dtype=np.float64).reshape(-1))

    return predict


def predict_over_windows(
    df: DataFrame,
    window_col: str,
    seq_len: int,
    out: str = "predicted_price",
    mn: float = REFERENCE_SCALER_MIN,
    mx: float = REFERENCE_SCALER_MAX,
    keras_path: str | None = None,
) -> DataFrame:
    """Scale (native) -> predict (Arrow-batched UDF) -> unscale (native)."""
    scaled = F.transform(F.col(window_col), lambda v: minmax_scale(v, mn, mx))
    udf = make_predict_udf(seq_len, keras_path)
    return df.withColumn(out, minmax_unscale(udf(scaled), mn, mx))
