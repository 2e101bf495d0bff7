"""Differential tests: every registered query with an oracle must match
DuckDB at sf0.001 (the driver repeats this at sf0.01). Rows-only
queries must at least execute and return a stable schema."""

from __future__ import annotations

import pytest

from stock_price_prediction_using_stream_and_batch_processing_spark import plans

from .conftest import SF_SMALL
from .oracle_check import run_check

# include_extended: the driver checks only the 50 driver-tier queries,
# but locally EVERY registered query (both tiers) stays differential.
ALL = sorted(plans.all_queries(include_extended=True))
WITH_ORACLE = [n for n in ALL if plans.get(n).oracle is not None]
ROWS_ONLY = [n for n in ALL if plans.get(n).oracle is None]


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_match(spark, name):
    problems = run_check(spark, name, SF_SMALL)
    assert not problems, f"{name}: " + "; ".join(problems)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(spark, name):
    df = plans.get(name).fn(spark, SF_SMALL)
    n = df.count()
    assert n >= 0
    assert len(df.schema.fields) > 0
