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


def test_every_registered_query_has_an_oracle():
    """ROWS_ONLY went empty in round 9 (the last rows-only faces got
    invariant oracles). Pin that as an ASSERTION rather than an empty
    parametrize set — the latter reports as a permanent pytest skip,
    which masked skip-count drift for two rounds (VERDICT r9 #5). If a
    future query genuinely can't be SQL-oracled, register it with an
    invariant oracle instead, or consciously relax this test."""
    assert ROWS_ONLY == []
