"""Data-layout query corpus: Z-order (Morton) clustering for
multi-dimensional data skipping (operators/layout.py).

The registered query exposes the Morton-code computation itself so the
DuckDB oracle can verify the bit math end-to-end; the file-skipping
effect of writing in z-order (small per-file bounding boxes on every
clustered column) is asserted on real parquet footers in
tests/test_layout.py.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators import layout
from ..sources.tables import load_table
from .core import register

_BITS = 16


def _interleave_sql(us: list[str], bits: int) -> str:
    ndim = len(us)
    terms = [
        f"((({u} >> {b}) & 1) << {b * ndim + j})"
        for j, u in enumerate(us)
        for b in range(bits)
    ]
    return " + ".join(terms)


@register(
    "zorder_value_events",
    oracle=f"""
    WITH b AS (
      SELECT CAST(MIN(user_id) AS DOUBLE) AS mn1, CAST(MAX(user_id) AS DOUBLE) AS mx1,
             CAST(MIN(value) AS DOUBLE) AS mn2, CAST(MAX(value) AS DOUBLE) AS mx2
      FROM events
    ),
    u AS (
      SELECT event_id,
        CAST(CASE WHEN mx1 - mn1 > 0
             THEN FLOOR((CAST(user_id AS DOUBLE) - mn1) / (mx1 - mn1) * 65535.0)
             ELSE 0 END AS BIGINT) AS u1,
        CAST(CASE WHEN mx2 - mn2 > 0
             THEN FLOOR((CAST(value AS DOUBLE) - mn2) / (mx2 - mn2) * 65535.0)
             ELSE 0 END AS BIGINT) AS u2
      FROM events CROSS JOIN b
    )
    SELECT event_id, {_interleave_sql(['u1', 'u2'], _BITS)} AS zval
    FROM u
    """,
    tags=("layout", "zorder", "skipping"),
)
def zorder_value_events(spark, sf_dir):
    """Morton code over (user_id, value): min/max-normalized 16-bit
    lattice cells, bits interleaved with unrolled shift/mask algebra
    (operators/layout.zorder_value) — the sort key behind OPTIMIZE
    ZORDER BY. The oracle re-derives every bit."""
    ev = load_table(spark, sf_dir, "events")
    out = layout.zorder_value(ev, ["user_id", "value"], bits=_BITS)
    return out.select("event_id", "zval")
