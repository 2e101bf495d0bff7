"""Registry plumbing for named queries with optional DuckDB oracles."""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class RegisteredQuery:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL producing the identical result; None => rows-only check
    tags: tuple[str, ...]


_REGISTRY: dict[str, RegisteredQuery] = {}


def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = RegisteredQuery(name, fn, oracle, tags)
        return fn

    return deco


def all_queries() -> dict[str, RegisteredQuery]:
    return dict(_REGISTRY)


def get(name: str) -> RegisteredQuery:
    return _REGISTRY[name]


def query_map() -> dict[str, QueryFn]:
    return {n: q.fn for n, q in _REGISTRY.items()}


def oracle_map() -> dict[str, str]:
    return {n: q.oracle for n, q in _REGISTRY.items() if q.oracle is not None}
