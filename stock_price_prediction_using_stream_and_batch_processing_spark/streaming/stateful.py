"""Cross-micro-batch trailing windows — the continuity the reference
LACKS (its trailing-5 never spans batch boundaries,
``stream_consumer.py:72-76``; SURVEY §7 hard part i).

``applyInPandasWithState`` keyed by symbol carries the last N-1 prices
between micro-batches, so every tick gets a full trailing window
regardless of how the stream was batched. State per key is O(N)
doubles — at 1000 executors and millions of symbols the state store
shards by key hash, which is exactly Spark's state-store design."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "symbol string, timestamp timestamp, price double, window_values array<double>"
STATE_SCHEMA = "tail array<double>"


def continuous_trailing_windows(parsed: DataFrame, seq_len: int = 5) -> DataFrame:
    """parsed (symbol, timestamp, price, ...) -> rows with full
    trailing-``seq_len`` windows that SPAN micro-batches."""

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        (tail,) = state.get if state.exists else ([],)
        tail = list(tail)
        out = []
        for pdf in pdfs:
            pdf = pdf.sort_values(["timestamp"])
            for _, row in pdf.iterrows():
                tail.append(float(row["price"]))
                if len(tail) > seq_len:
                    tail.pop(0)
                if len(tail) == seq_len:
                    out.append((key[0], row["timestamp"], float(row["price"]), list(tail)))
        state.update((tail,))
        if out:
            yield pd.DataFrame(out, columns=["symbol", "timestamp", "price", "window_values"])

    return parsed.groupBy("symbol").applyInPandasWithState(
        fn, OUTPUT_SCHEMA, STATE_SCHEMA, "append", GroupStateTimeout.NoTimeout
    )


EWMA_OUTPUT_SCHEMA = "symbol string, timestamp timestamp, price double, ewma double"
EWMA_STATE_SCHEMA = "cur double"


def continuous_ewma(parsed: DataFrame, alpha: float = 0.2) -> DataFrame:
    """Per-row EWMA stream that SPANS micro-batches: the state store
    carries one double per key (the running ewma). Emits every tick with
    its updated ewma — the streaming face of windows.ewma_final's
    recursive statistic."""

    def fn(key, pdfs, state: GroupState):
        (cur,) = state.get if state.exists else (None,)
        out = []
        for pdf in pdfs:
            pdf = pdf.sort_values(["timestamp"])
            for _, row in pdf.iterrows():
                x = float(row["price"])
                cur = x if cur is None else alpha * x + (1.0 - alpha) * cur
                out.append((key[0], row["timestamp"], x, cur))
        state.update((cur,))
        if out:
            yield pd.DataFrame(out, columns=["symbol", "timestamp", "price", "ewma"])

    return parsed.groupBy("symbol").applyInPandasWithState(
        fn, EWMA_OUTPUT_SCHEMA, EWMA_STATE_SCHEMA, "append", GroupStateTimeout.NoTimeout
    )
