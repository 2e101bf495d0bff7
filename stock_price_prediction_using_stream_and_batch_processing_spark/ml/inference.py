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
    closure captures only ``seq_len``/``keras_path`` — cheap pickles).

    Partial windows (length != seq_len) predict NaN instead of crashing
    the Arrow batch — the streaming combined sink carries every tick,
    including the first seq_len-1 of a series."""
    state: dict = {}

    @F.pandas_udf(T.DoubleType())
    def predict(windows: pd.Series) -> pd.Series:
        if "model" not in state:
            from .predictor import load_model

            state["model"] = load_model(seq_len, keras_path)
        arrs = windows.to_numpy()
        full = np.fromiter((len(a) == seq_len for a in arrs), dtype=bool, count=len(arrs))
        out = np.full(len(arrs), np.nan)
        if full.any():
            # (batch, seq_len, 1): the 3-D layout the reference LSTM
            # artifact requires (LSTM layers reject 2-D input);
            # LinearWindowModel.predict handles ndim==3 explicitly, so
            # BOTH model paths get the same tensor shape
            x = np.stack(arrs[full])[:, :, None]
            out[full] = np.asarray(state["model"].predict(x), dtype=np.float64).reshape(-1)
        return pd.Series(out)

    return predict


def linear_predict_column(
    window_col,
    seq_len: int,
    mn: float = REFERENCE_SCALER_MIN,
    mx: float = REFERENCE_SCALER_MAX,
) -> Column:
    """``LinearWindowModel`` as a NATIVE column expression: the
    recency-weighted dot product via ``zip_with`` + ``aggregate`` —
    whole-stage-codegen JVM arithmetic, no Python boundary at all.

    Same scale -> dot -> unscale pipeline as the UDF path (the affine
    scaling cancels analytically because the weights sum to 1, but it is
    kept so the two paths agree bit-for-bit in shape and to float
    precision in value). Windows shorter than ``seq_len`` propagate the
    ``zip_with`` null padding to a NULL prediction."""
    from .predictor import LinearWindowModel

    c = F.col(window_col) if isinstance(window_col, str) else window_col
    weights = F.array(*[F.lit(float(w)) for w in LinearWindowModel(seq_len).weights])
    dot = F.aggregate(
        F.zip_with(c, weights, lambda v, w: minmax_scale(v, mn, mx) * w),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return minmax_unscale(dot, mn, mx)


def predict_over_windows(
    df: DataFrame,
    window_col: str,
    seq_len: int,
    out: str = "predicted_price",
    mn: float = REFERENCE_SCALER_MIN,
    mx: float = REFERENCE_SCALER_MAX,
    keras_path: str | None = None,
) -> DataFrame:
    """Scale (native) -> predict -> unscale (native).

    With a model artifact (``keras_path``) the predict step is the
    Arrow-batched UDF. The default linear fallback is SQL-expressible,
    so it runs as a pure column expression instead — "UDFs are the slow
    path": the Python boundary exists only where a real model makes it
    irreducible."""
    if keras_path is None:
        return df.withColumn(out, linear_predict_column(window_col, seq_len, mn, mx))
    scaled = F.transform(F.col(window_col), lambda v: minmax_scale(v, mn, mx))
    udf = make_predict_udf(seq_len, keras_path)
    return df.withColumn(out, minmax_unscale(udf(scaled), mn, mx))
