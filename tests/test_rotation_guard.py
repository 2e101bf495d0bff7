"""Rotation hygiene guard (r13 VERDICT ask #8).

Three rounds running (r11: 4, r12: 2, r13: 6), queries registered after
the round's DRIVER_ROTATION freeze shipped without ever holding a
driver slot, leaving their only differential evidence to the judge's
out-of-band re-run. This guard makes that impossible to do silently:
every registered query must be (a) in the current rotation, (b) in
PENDING_ROTATION (an explicit IOU the next round's rotation edit must
consume), or (c) in DRIVER_CHECKED_BEFORE (green in a committed
CORRECTNESS_r*.json). Registering a new query without slotting it now
fails the suite instead of surfacing in next round's VERDICT.
"""

from __future__ import annotations

from stock_price_prediction_using_stream_and_batch_processing_spark import plans  # noqa: F401  (registration side effects)
from stock_price_prediction_using_stream_and_batch_processing_spark.plans.core import (
    DRIVER_CHECKED_BEFORE,
    DRIVER_QUERY_BUDGET,
    DRIVER_ROTATION,
    PENDING_ROTATION,
    all_queries,
)


def test_every_query_is_slotted_pending_or_checked():
    registered = set(all_queries(include_extended=True))
    rotation = set(DRIVER_ROTATION or ())
    uncovered = registered - rotation - PENDING_ROTATION - DRIVER_CHECKED_BEFORE
    assert not uncovered, (
        f"queries with no driver slot, no pending IOU, and no prior driver "
        f"evidence: {sorted(uncovered)} — add them to DRIVER_ROTATION or "
        f"PENDING_ROTATION in plans/core.py"
    )


def test_rotation_within_budget_and_disjoint_from_pending():
    rotation = set(DRIVER_ROTATION or ())
    assert len(rotation) <= DRIVER_QUERY_BUDGET
    assert not rotation & PENDING_ROTATION, sorted(rotation & PENDING_ROTATION)


def test_rotation_and_pending_name_real_queries():
    registered = set(all_queries(include_extended=True))
    # DRIVER_ROTATION is validated at query_map() time too; PENDING is
    # only read here, so a typo would otherwise rot silently.
    ghosts = (set(DRIVER_ROTATION or ()) | PENDING_ROTATION) - registered
    assert not ghosts, f"rotation/pending names not in the registry: {sorted(ghosts)}"


def test_rotation_spends_the_full_budget():
    """The driver checks up to DRIVER_QUERY_BUDGET queries per round;
    leaving slots empty wastes driver evidence. Exactly-full keeps the
    rotation edit honest."""
    assert len(set(DRIVER_ROTATION or ())) == DRIVER_QUERY_BUDGET
