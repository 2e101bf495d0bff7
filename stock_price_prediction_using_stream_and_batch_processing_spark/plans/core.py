"""Registry plumbing for named queries with optional DuckDB oracles.

Two tiers:

- ``driver=True`` (default) — exposed through ``query_map()`` /
  ``oracle_map()`` to the grading driver's differential check. The
  driver checks at most 50 queries per round, so this tier is curated
  to exactly the distinct-operator set (one query per operator shape).
- ``driver=False`` ("extended") — redundant projections/stages of a
  driver-tier query (e.g. ``doc_quality`` ⊂ ``doc_profile``,
  ``minhash_signatures`` ⊂ ``minhash_lsh_pairs``). Still registered,
  still differentially tested against DuckDB in
  tests/test_queries_oracle.py — just not spent on a driver slot.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

# The grading driver truncates its correctness sweep at this many
# queries; query_map() enforces the budget so nothing silently falls
# outside the checked window.
DRIVER_QUERY_BUDGET = 50


@dataclass(frozen=True)
class RegisteredQuery:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL producing the identical result; None => rows-only check
    tags: tuple[str, ...]
    driver: bool = True


_REGISTRY: dict[str, RegisteredQuery] = {}


def register(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    driver: bool = True,
):
    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = RegisteredQuery(name, fn, oracle, tags, driver)
        return fn

    return deco


def all_queries(include_extended: bool = False) -> dict[str, RegisteredQuery]:
    return {
        n: q for n, q in _REGISTRY.items() if include_extended or q.driver
    }


def get(name: str) -> RegisteredQuery:
    return _REGISTRY[name]


def query_map() -> dict[str, QueryFn]:
    m = {n: q.fn for n, q in _REGISTRY.items() if q.driver}
    if len(m) > DRIVER_QUERY_BUDGET:
        raise RuntimeError(
            f"{len(m)} driver-tier queries exceed the {DRIVER_QUERY_BUDGET}-row "
            "driver budget; demote redundant ones with driver=False"
        )
    return m


def full_query_map() -> dict[str, QueryFn]:
    """Both tiers — for local tests/benches, NOT the driver surface."""
    return {n: q.fn for n, q in _REGISTRY.items()}


def oracle_map() -> dict[str, str]:
    return {
        n: q.oracle for n, q in _REGISTRY.items() if q.driver and q.oracle is not None
    }
