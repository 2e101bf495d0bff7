"""Deterministic seeded tick generator — the parity fixture.

Reproduces the reference producer's data contract
(``producer.py:16-26``): bounded random walk around 180.0 with 0.5 %
volatility steps, UTC timestamps ~0.1 s apart, uniform volume in
[100000, 500000], fixed symbol — but seeded and tie-free so parity
tests are reproducible (SURVEY §7 hard part ii).
"""

from __future__ import annotations

import datetime as dt
import json
import random

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

tick_schema = T.StructType(
    [
        T.StructField("symbol", T.StringType()),
        T.StructField("timestamp", T.TimestampType()),
        T.StructField("price", T.DoubleType()),
        T.StructField("volume", T.LongType()),
    ]
)


def generate_ticks(
    n: int,
    seed: int = 42,
    symbols: tuple[str, ...] = ("AAPL",),
    start: dt.datetime | None = None,
    base_price: float = 180.0,
    step_seconds: float = 0.1,
) -> list[dict]:
    """Random-walk ticks mirroring ``producer.py`` semantics: price step
    ``(rand()-0.5) * 0.5 * base / 100`` rounded to 2 dp. Timestamps are
    strictly increasing (tie-free) for stable-order parity."""
    rng = random.Random(seed)
    start = start or dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    bases = {s: base_price for s in symbols}
    out = []
    for i in range(n):
        sym = symbols[i % len(symbols)]
        change = (rng.random() - 0.5) * 0.5 * bases[sym] / 100
        bases[sym] += change
        out.append(
            {
                "symbol": sym,
                "timestamp": start + dt.timedelta(seconds=i * step_seconds),
                "price": round(bases[sym], 2),
                "volume": rng.randint(100000, 500000),
            }
        )
    return out


def ticks_dataframe(spark: SparkSession, n: int, seed: int = 42, **kw) -> DataFrame:
    return spark.createDataFrame(generate_ticks(n, seed=seed, **kw), schema=tick_schema)


def ticks_json_lines(n: int, seed: int = 42, **kw) -> list[str]:
    """JSON wire format as the reference Kafka producer emits it
    (``producer.py:9`` json serializer, ISO-8601 timestamps) — used to
    exercise the stream-parse path from a file source."""
    rows = generate_ticks(n, seed=seed, **kw)
    return [
        json.dumps(
            {
                "symbol": r["symbol"],
                # explicit +00:00 offset: a naive ISO string parses in
                # the SESSION timezone, so a non-UTC driver session would
                # land streamed ticks hours away from ticks_dataframe's
                # tz-aware rows; the offset makes parsing tz-independent
                # (still ISO-8601, the reference's wire format family)
                "timestamp": r["timestamp"].isoformat(),
                "price": r["price"],
                "volume": r["volume"],
            }
        )
        for r in rows
    ]
