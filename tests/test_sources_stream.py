"""Streaming face of the custom Python DataSource: offset algebra,
deterministic replay, and kill/restart exactly-once across a checkpoint
recovery (the source-level guarantee no other test exercises end to
end). Reference shape: the unbounded producer loop at
``/root/reference/producer.py:31-34``."""

from __future__ import annotations

import time

from stock_price_prediction_using_stream_and_batch_processing_spark.sources.pysource import (
    SyntheticTicksStreamReader,
    register_synthetic_ticks,
    tick_row,
)


class _Opts(dict):
    pass


def _flat(batches):
    """Row tuples from the reader's Arrow RecordBatch yields (r17 — all
    pysource read paths emit columnar batches, guide §4.1)."""
    return [
        t
        for b in batches
        for t in zip(*[c.to_pylist() for c in b.columns])
    ]


def test_offset_algebra_and_cap():
    r = SyntheticTicksStreamReader(_Opts(rows="1000", ticksPerBatch="300"))
    assert r.initialOffset() == {"offset": 0}
    it, nxt = r.read({"offset": 0})
    rows = _flat(it)
    assert nxt == {"offset": 300} and len(rows) == 300
    assert rows[0] == tick_row(0) and rows[-1] == tick_row(299)
    # last partial batch stops at the cap
    it, nxt = r.read({"offset": 900})
    assert nxt == {"offset": 1000} and len(_flat(it)) == 100
    # at the cap: empty batch, offset does not advance (stream quiesces)
    it, nxt = r.read({"offset": 1000})
    assert nxt == {"offset": 1000} and _flat(it) == []


def test_read_between_offsets_replays_read_exactly():
    r = SyntheticTicksStreamReader(_Opts(rows="1000", ticksPerBatch="128"))
    it, nxt = r.read({"offset": 256})
    planned = _flat(it)
    replayed = _flat(r.readBetweenOffsets({"offset": 256}, nxt))
    assert planned == replayed  # bit-for-bit recovery replay
    assert planned[0] == tick_row(256)  # value parity with the row form


def test_unbounded_offset_keeps_advancing():
    r = SyntheticTicksStreamReader(_Opts())  # rows unset => unbounded
    _, nxt = r.read({"offset": 10_000_000})
    assert nxt == {"offset": 10_001_000}


def test_kill_restart_exactly_once(spark, tmp_path):
    """Kill a running streaming query mid-stream, restart from the same
    checkpoint + sink, and assert every tick id lands EXACTLY once: the
    offsets live in the checkpoint (not the reader instance) and the
    file sink's commit log hides any in-flight batch the kill
    interrupted, so recovery replans/replays without dup or loss."""
    register_synthetic_ticks(spark)
    n_rows, per_batch = 5_000, 250  # 20 micro-batches
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def start():
        sdf = (
            spark.readStream.format("synthetic_ticks")
            .option("rows", n_rows)
            .option("ticksPerBatch", per_batch)
            .load()
        )
        return (
            sdf.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .start()
        )

    q = start()
    try:
        # wait for at least two committed batches, then kill mid-stream
        deadline = time.time() + 120
        while time.time() < deadline:
            if len(q.recentProgress) >= 2:
                break
            time.sleep(0.1)
        assert len(q.recentProgress) >= 2, "no progress before kill"
    finally:
        q.stop()
        q.awaitTermination()

    committed_before = sum(p["numInputRows"] for p in q.recentProgress)
    assert committed_before < n_rows, "stream finished before the kill; lower the wait"

    q2 = start()
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
        q2.awaitTermination()

    got = spark.read.parquet(sink)
    assert got.count() == n_rows
    assert got.select("tick_id").distinct().count() == n_rows
    # spot-check payload determinism survived the restart boundary
    row = got.filter("tick_id = 4321").collect()[0]
    assert (row.tick_id, row.symbol, row.price, row.volume) == tick_row(4321)


def test_partitioned_reader_shard_planning():
    from stock_price_prediction_using_stream_and_batch_processing_spark.sources.pysource import (
        SyntheticTicksPartitionedStreamReader,
    )

    r = SyntheticTicksPartitionedStreamReader(_Opts(rows="1000", partitions="4"))
    assert r.initialOffset() == {"offset": 0}
    assert r.latestOffset() == {"offset": 1000}  # constant high-water mark
    parts = r.partitions({"offset": 0}, {"offset": 1000})
    assert [(p.start, p.end) for p in parts] == [
        (0, 250), (250, 500), (500, 750), (750, 1000)
    ]
    # executor-side read materializes exactly its shard
    rows = _flat(r.read(parts[2]))
    assert rows[0] == tick_row(500) and rows[-1] == tick_row(749) and len(rows) == 250
    # degenerate range plans one empty shard (API needs >= 1 partition)
    (empty,) = r.partitions({"offset": 1000}, {"offset": 1000})
    assert (empty.start, empty.end) == (1000, 1000) and _flat(r.read(empty)) == []
