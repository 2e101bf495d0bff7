"""Grouped-map modeling: one model per key via ``applyInPandas``.

The native ``regr_slope``/``regr_intercept`` aggregates cover OLS (see
plans/timeseries.trend_forecast_per_user — prefer them: one hash agg,
no Arrow hop). This operator is the GENERAL pattern for per-key models
SQL can't express (ARIMA, per-symbol sklearn, etc.): groupBy(key) ships
each key's rows to one worker as a Pandas frame, the model fits there,
and only the fitted summary comes back. One shuffle on the key; skewed
keys are bounded by the largest single group (salt upstream if a key
exceeds worker memory).

tests/test_grouped.py asserts this path equals the native-aggregate
formulation exactly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def per_key_linear_forecast(
    df: DataFrame,
    key: str,
    ts: str,
    value: str,
    tiebreak: str | None = None,
) -> DataFrame:
    """Per-key OLS of value against observation index (0..n-1) plus the
    next-step forecast — the applyInPandas twin of
    ``trend_forecast_per_user``."""
    key_type = dict(df.dtypes)[key]
    schema = f"{key} {key_type}, slope double, intercept double, forecast_next double, n_obs long"
    # dedupe: tiebreak == ts (the repo's common tiebreak="timestamp"
    # convention) would ship duplicate pandas column labels, which
    # pdf.sort_values rejects inside applyInPandas
    sort_cols = list(dict.fromkeys([ts] + ([tiebreak] if tiebreak else [])))

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(sort_cols)
        y = pdf[value].to_numpy(dtype=np.float64)
        t = np.arange(len(y), dtype=np.float64)
        if len(y) >= 2:
            slope, intercept = np.polyfit(t, y, 1)
        else:
            slope, intercept = 0.0, float(y[0]) if len(y) else float("nan")
        return pd.DataFrame(
            {
                key: [pdf[key].iloc[0]],
                "slope": [float(slope)],
                "intercept": [float(intercept)],
                "forecast_next": [float(intercept + slope * len(y))],
                "n_obs": [len(y)],
            }
        )

    cols = list(dict.fromkeys([key, *sort_cols, value]))
    return df.select(*cols).groupBy(key).applyInPandas(fit, schema)
