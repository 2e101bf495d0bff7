"""Next-price predictors.

The reference runs a Keras LSTM (64→32→Dense(1), ``lstm_model.keras``)
on min-max-scaled trailing windows (``stream_consumer.py:50-54``,
``batch_processor.py:88-101``). TensorFlow is optional here (SURVEY §7
hard part iii): ``load_model`` returns the Keras model when TF is
importable and an artifact path is given, else the deterministic
``LinearWindowModel`` fallback so correctness runs never require TF.

Both predictors share the contract: ``predict(x)`` with x shaped
``(batch, seq_len)`` of SCALED prices -> ``(batch,)`` scaled
predictions — the same tensor contract as the reference model minus
the trailing feature axis.
"""

from __future__ import annotations

import numpy as np


class LinearWindowModel:
    """Recency-weighted linear predictor: pred = sum_i w_i * x_i with
    w_i = 2i / (n(n+1)) for i=1..n (weights sum to 1, newest heaviest).
    Deterministic and SQL-expressible — which is what makes the
    inference path oracle-checkable end to end."""

    def __init__(self, seq_len: int):
        self.seq_len = seq_len
        i = np.arange(1, seq_len + 1, dtype=np.float64)
        self.weights = 2.0 * i / (seq_len * (seq_len + 1))

    def predict(self, x: np.ndarray) -> np.ndarray:
        x = np.asarray(x, dtype=np.float64)
        if x.ndim == 3:  # (batch, seq, 1) reference tensor shape
            x = x[:, :, 0]
        return x @ self.weights


def load_model(seq_len: int, keras_path: str | None = None):
    """Keras model if TF is available and a path is supplied; otherwise
    the linear fallback."""
    if keras_path is not None:
        try:
            import keras  # noqa: F401

            return keras.models.load_model(keras_path)
        except ImportError:
            pass
    return LinearWindowModel(seq_len)
