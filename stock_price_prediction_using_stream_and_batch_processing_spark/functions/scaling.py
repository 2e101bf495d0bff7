"""Feature scaling as native column expressions.

The reference scales with NumPy on the driver using constants from
``scaler.pkl`` (``stream_consumer.py:51,54``); here the same min-max
transform is column arithmetic, applied wherever the row lives.
Constants mirror /root/reference/scaler.pkl (inspected values, recorded
in FIXTURES.md).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

REFERENCE_SCALER_MIN = 170.75782116164527
REFERENCE_SCALER_MAX = 189.0292566483142


def minmax_scale(col, mn: float = REFERENCE_SCALER_MIN, mx: float = REFERENCE_SCALER_MAX) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return (c - F.lit(mn)) / (F.lit(mx) - F.lit(mn))


def minmax_unscale(col, mn: float = REFERENCE_SCALER_MIN, mx: float = REFERENCE_SCALER_MAX) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c * (F.lit(mx) - F.lit(mn)) + F.lit(mn)
