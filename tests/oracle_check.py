"""Local mirror of the driver's differential check: run a registered
query on Spark and its oracle on DuckDB over the same parquet tables,
compare row count, column names, and order-insensitive values."""

from __future__ import annotations

import math
import time

import duckdb
import pandas as pd

from stock_price_prediction_using_stream_and_batch_processing_spark.sources.tables import TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), ignore_index=True)


def compare_frames(actual: pd.DataFrame, expected: pd.DataFrame, float_tol: float = 1e-9) -> list[str]:
    """Return a list of mismatch descriptions (empty == match)."""
    problems: list[str] = []
    if sorted(actual.columns) != sorted(expected.columns):
        return [f"columns differ: spark={sorted(actual.columns)} duck={sorted(expected.columns)}"]
    if len(actual) != len(expected):
        problems.append(f"row count differs: spark={len(actual)} duck={len(expected)}")
        return problems
    a, e = _canon(actual), _canon(expected)
    for c in a.columns:
        av, ev = a[c], e[c]
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(ev):
            av_f = pd.to_numeric(av, errors="coerce").astype(float)
            ev_f = pd.to_numeric(ev, errors="coerce").astype(float)
            bad = 0
            for x, y in zip(av_f, ev_f):
                both_nan = (isinstance(x, float) and math.isnan(x)) and (isinstance(y, float) and math.isnan(y))
                if not both_nan and not math.isclose(x, y, rel_tol=float_tol, abs_tol=float_tol):
                    bad += 1
            if bad:
                problems.append(f"column {c}: {bad} value mismatches (sample spark={av_f.head(3).tolist()} duck={ev_f.head(3).tolist()})")
        else:
            neq = (av.astype(str) != ev.astype(str)).sum()
            if neq:
                mask = av.astype(str) != ev.astype(str)
                problems.append(
                    f"column {c}: {neq} value mismatches (sample spark={av[mask].head(3).tolist()} duck={ev[mask].head(3).tolist()})"
                )
    return problems


def run_check(spark, name: str, sf_dir: str, timed: bool = False):
    """The canonical differential for one registered query. With
    ``timed=True`` returns ``(problems, spark_s, oracle_s)`` — the
    engine-vs-oracle wall split the sf0.1 sweep records per query (the
    r10 triangle investigation: a late-sweep 150-193 s reading whose
    engine share was a flat 10-17 s; attribution belongs in the one
    shared implementation, not a drifting copy)."""
    from stock_price_prediction_using_stream_and_batch_processing_spark import (
        plans,
        release_query_scratch,
    )

    q = plans.get(name)
    t0 = time.time()
    actual = q.fn(spark, sf_dir).toPandas()
    spark_s = time.time() - t0
    # The result is fully materialized (toPandas) — reclaim the query's
    # localCheckpoint blocks and memory-sink tables so a full-corpus
    # sweep in one JVM doesn't accrete 140+ queries of storage memory.
    release_query_scratch(spark)
    problems: list[str] = []
    oracle_s = 0.0
    if q.oracle is not None:
        t0 = time.time()
        con = duck_connection(sf_dir)
        try:
            expected = con.execute(q.oracle).fetchdf()
        finally:
            con.close()
        problems = compare_frames(actual, expected)
        oracle_s = time.time() - t0
    return (problems, spark_s, oracle_s) if timed else problems
