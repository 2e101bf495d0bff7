"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource` API) —
the "write your own connector" surface.

The reference's only source beyond Kafka was a Python generator feeding
a producer (`/root/reference/producer.py:16-26` — random-walk ticks
pushed one JSON message at a time). A Spark-native engine exposes the
same capability as a first-class DataSource: the generator becomes a
PARTITIONED source — the driver plans N `InputPartition` range shards,
each executor materializes its shard independently — so synthetic/
replayed ticks enter the engine through the exact connector API a
production feed (REST cursor, message-log snapshot, proprietary SDK)
would use, with partition parallelism instead of the reference's
single-threaded loop.

Determinism contract: every column is a CLOSED FORM of the row id
(prices in exact quarter steps — float-representable, so sums are
exact), which is what makes the source fully value-oracle-checkable:
DuckDB replays the identical arithmetic over `range(n)`.

Scale posture: a real 100 TB connector differs only in `partitions()`
(split by file/offset/shard instead of id range) and `read()` (fetch
instead of compute); the planning/parallelism contract is identical.
All three readers yield pyarrow RECORD BATCHES (r17, guide §4.1 — the
same columnar-across-the-boundary move the CDC snapshot source made in
r16): the harness passes RecordBatch yields straight through, so no
per-row tuple/pickle loop remains on the batch shard read, the simple
stream reader's driver prefetch/replay, or the partitioned stream
reader's executor shards.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

SYMBOLS = ("AAPL", "GOOG", "MSFT", "AMZN")


@dataclass
class _RangeShard(InputPartition):
    start: int
    end: int


def tick_row(i: int) -> tuple:
    """Closed-form tick for row id ``i`` — shared by the executor-side
    reader and any in-process oracle. Prices step in exact quarters
    (multiples of 0.25 are float-exact, so aggregates carry no rounding
    error); volume cycles a coprime stride."""
    return (
        i,
        SYMBOLS[i % len(SYMBOLS)],
        100.0 + (i % 97) * 0.25,
        (i * 37) % 1000,
    )


# one RecordBatch per this many rows: big enough to amortize per-batch
# overhead, small enough to bound peak memory per shard
_TICK_BATCH_ROWS = 65_536


def tick_batches(start: int, end: int, chunk: int = _TICK_BATCH_ROWS):
    """Ticks ``[start, end)`` as pyarrow RECORD BATCHES — the Python
    DataSource harness passes RecordBatch yields straight through as
    columnar buffers (the r16 CDC-source move, guide §4.1), so the
    per-row tuple/pickle loop is gone on every read path. The closed
    forms vectorize exactly: quarter prices are float-exact in float64,
    the int arithmetic is exact in int64 (i*37 < 2^63 for any feasible
    row id), and the symbol cycle is a take() over the 4-name
    dictionary — every value bit-identical to ``tick_row`` (pinned in
    tests/test_sources_stream.py)."""
    import numpy as np
    import pyarrow as pa

    syms = pa.array(SYMBOLS, type=pa.string())
    for lo in range(start, end, chunk):
        hi = min(lo + chunk, end)
        i = np.arange(lo, hi, dtype=np.int64)
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(i, type=pa.int64()),
                syms.take(pa.array(i % len(SYMBOLS), type=pa.int64())),
                pa.array(100.0 + (i % 97) * 0.25, type=pa.float64()),
                pa.array((i * 37) % 1000, type=pa.int64()),
            ],
            names=["tick_id", "symbol", "price", "volume"],
        )


class SyntheticTicksDataSource(DataSource):
    """``spark.read.format("synthetic_ticks").option("rows", n)
    .option("partitions", p).load()`` — a deterministic partitioned
    tick feed through the public Python DataSource API."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_ticks"

    def schema(self) -> str:
        return "tick_id bigint, symbol string, price double, volume bigint"

    def reader(self, schema) -> "SyntheticTicksReader":
        return SyntheticTicksReader(self.options)

    def simpleStreamReader(self, schema) -> "SyntheticTicksStreamReader":
        return SyntheticTicksStreamReader(self.options)


class SyntheticTicksReader(DataSourceReader):
    def __init__(self, options) -> None:
        self.rows = int(options.get("rows", 10_000))
        self.n_partitions = max(1, int(options.get("partitions", 8)))

    def partitions(self):
        """Plan one range shard per partition — the driver-side split
        a real connector would compute from file listings/offsets. An
        empty source (rows <= 0) plans one empty shard — the API requires
        at least one partition (an empty list makes Spark schedule a
        task with partition=None), and an empty range yields no rows."""
        if self.rows <= 0:
            return [_RangeShard(0, 0)]
        per = -(-self.rows // self.n_partitions)  # ceil division
        return [
            _RangeShard(lo, min(lo + per, self.rows))
            for lo in range(0, self.rows, per)
        ]

    def read(self, partition: _RangeShard):
        """Executor-side: materialize this shard only — as Arrow record
        batches (guide §4.1; an empty shard yields no batches)."""
        yield from tick_batches(partition.start, partition.end)


class SyntheticTicksStreamReader(SimpleDataSourceStreamReader):
    """STREAMING face of the connector — the reference's producer is an
    *unbounded* loop (``/root/reference/producer.py:31-34``: while True,
    one message per second); this is that capability through Spark 4's
    public ``SimpleDataSourceStreamReader`` API.

    Offsets are row ranges: ``{"offset": n}`` means "rows [0, n) are
    planned". All reader state lives IN the checkpointed offset, none in
    this (restart-discarded) instance — so recovery is pure arithmetic:

    - ``read(start)`` plans the next micro-batch ``[start, start+batch)``
      and returns the next offset; after a restart Spark hands back the
      checkpointed start and planning resumes exactly there.
    - ``readBetweenOffsets(start, end)`` replays a previously planned
      batch bit-for-bit (closed-form rows) — the failure-recovery path
      Spark invokes for a batch that was planned but not committed.

    Exactly-once therefore holds across kill/restart with no
    source-side dedup (pinned in tests/test_sources_stream.py).

    A ``rows`` cap bounds the stream for tests/oracles (the offset stops
    advancing at the cap, so ``processAllAvailable`` terminates);
    ``rows=0`` (or unset) is the reference's truly unbounded shape.

    Scale posture: the Simple API prefetches on the DRIVER by design
    (planning and data fetch in one place, Spark distributes the batch
    afterwards) — right for control-plane-bounded feeds like the
    reference's 1 msg/s producer. A 100 TB/day firehose wants the
    partitioned ``DataSourceStreamReader`` (executor-side ``read`` per
    shard, same offset algebra) — the batch ``reader()`` above already
    demonstrates that partition-planning contract.
    """

    def __init__(self, options) -> None:
        self.rows = int(options.get("rows", 0))  # 0 => unbounded
        self.batch = max(1, int(options.get("ticksPerBatch", 1000)))

    def initialOffset(self) -> dict:
        return {"offset": 0}

    def read(self, start: dict):
        lo = int(start["offset"])
        hi = lo + self.batch
        if self.rows > 0:
            hi = min(hi, max(lo, self.rows))
        # materialized list, not a generator: the Simple API PICKLES the
        # prefetched batch into its replay cache (the CDC source's move)
        return iter(list(tick_batches(lo, hi))), {"offset": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(list(tick_batches(int(start["offset"]), int(end["offset"]))))

    def commit(self, end: dict) -> None:
        # Nothing to clean up: the source is closed-form over the row id
        # (a real feed would trim its upstream buffer/ack here).
        pass


def register_synthetic_ticks(spark) -> None:
    """Idempotent registration (re-registering simply replaces)."""
    spark.dataSource.register(SyntheticTicksDataSource)


from pyspark.sql.datasource import DataSourceStreamReader  # noqa: E402


class SyntheticTicksPartitionedStreamReader(DataSourceStreamReader):
    """EXECUTOR-SIDE partitioned streaming read — the 100 TB face the
    Simple reader's docstring defers to: ``partitions(start, end)``
    splits the micro-batch's row range into ``partitions`` shards on
    the driver and ``read(shard)`` materializes each shard IN THE
    EXECUTOR (the Simple API prefetches whole batches driver-side).

    Offset design: ``latestOffset`` is CONSTANT at the ``rows`` cap —
    the whole bounded feed is one micro-batch, split across executors.
    That is deliberate: a restart-safe *advancing* offset needs the
    external system to own the high-water mark (Kafka's end offsets);
    an instance counter would regress across restarts (fresh instance,
    stale checkpoint) and double-plan rows. Bounded demo feeds have a
    natural constant high-water mark, so this face demonstrates exactly
    the part the Simple face cannot — executor-parallel shard reads
    under the streaming planner — while rate-limited multi-batch
    progression and kill/restart exactly-once stay pinned on the Simple
    face (same offset algebra, tests/test_sources_stream.py)."""

    def __init__(self, options) -> None:
        self.rows = int(options.get("rows", 10_000))
        self.n_partitions = max(1, int(options.get("partitions", 8)))

    def initialOffset(self) -> dict:
        return {"offset": 0}

    def latestOffset(self) -> dict:
        return {"offset": max(self.rows, 0)}

    def partitions(self, start: dict, end: dict):
        lo, hi = int(start["offset"]), int(end["offset"])
        if hi <= lo:
            return [_RangeShard(lo, lo)]
        per = -(-(hi - lo) // self.n_partitions)
        return [_RangeShard(s, min(s + per, hi)) for s in range(lo, hi, per)]

    def read(self, partition: _RangeShard):
        yield from tick_batches(partition.start, partition.end)

    def commit(self, end: dict) -> None:
        pass


class SyntheticTicksPartitionedDataSource(DataSource):
    """``spark.readStream.format("synthetic_ticks_part")`` — same
    schema and closed-form rows as ``synthetic_ticks``, but through the
    partitioned ``DataSourceStreamReader`` API (a source exposes either
    the simple or the partitioned stream reader; two names keep both
    faces live)."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_ticks_part"

    def schema(self) -> str:
        return "tick_id bigint, symbol string, price double, volume bigint"

    def streamReader(self, schema) -> SyntheticTicksPartitionedStreamReader:
        return SyntheticTicksPartitionedStreamReader(self.options)


def register_synthetic_ticks_partitioned(spark) -> None:
    """Idempotent registration (re-registering simply replaces)."""
    spark.dataSource.register(SyntheticTicksPartitionedDataSource)
