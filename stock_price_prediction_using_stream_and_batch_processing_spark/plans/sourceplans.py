"""Connector-surface queries: the custom Python DataSource face
(sources/pysource.py) exercised end to end through the public Spark 4
`pyspark.sql.datasource` API, with a full value oracle.
"""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from .core import register

_N_ROWS = 200_000
_N_PARTS = 8

# The partitioned STREAM face pays per-row Python yield inside the
# streaming planner; 50k keeps the sweep row a few seconds while still
# dwarfing any per-shard constant (8 shards x 6,250 rows).
_P_ROWS = 50_000

# Streaming face: small enough to stream in seconds, big enough that
# the ticksPerBatch rate limit forces a real multi-micro-batch run.
_S_ROWS = 20_000
_S_BATCH = 4_096


@register(
    "python_datasource_ticks",
    oracle=f"""
    WITH t AS (SELECT range AS i FROM range({_N_ROWS})),
    r AS (
      SELECT i,
             CASE i % 4 WHEN 0 THEN 'AAPL' WHEN 1 THEN 'GOOG'
                        WHEN 2 THEN 'MSFT' ELSE 'AMZN' END AS symbol,
             100.0 + (i % 97) * 0.25 AS price,
             (i * 37) % 1000 AS volume
      FROM t
    )
    SELECT symbol,
           CAST(COUNT(*) AS BIGINT) AS n_ticks,
           SUM(price) AS total_price,
           CAST(SUM(volume) AS BIGINT) AS total_volume,
           MIN(price) AS min_price,
           MAX(price) AS max_price
    FROM r GROUP BY symbol
    """,
    tags=("source", "python-datasource", "connector", "partitioned-read"),
)
def python_datasource_ticks(spark, sf_dir):
    """CUSTOM PYTHON DATASOURCE, end to end through the public Spark 4
    connector API (sources/pysource.py): the driver plans 8 range-shard
    ``InputPartition``s, each executor materializes its shard
    independently (asserted: the scan RDD really has 8 partitions), and
    the per-symbol aggregate is checked value-exact against DuckDB
    replaying the same closed-form arithmetic over ``range(n)`` —
    possible because every column derives from the row id and prices
    step in float-exact quarters, so even the double SUM carries zero
    rounding error (all terms are multiples of 0.25 well inside 2^52).
    This is the reference's producer generator
    (``/root/reference/producer.py:16-26``) re-expressed as what a
    Spark-native engine actually wants: a partition-parallel connector,
    not a single-threaded message loop. (``sf_dir`` is unused — the
    source is its own data.)"""
    from ..sources.pysource import register_synthetic_ticks

    register_synthetic_ticks(spark)
    ticks = (
        spark.read.format("synthetic_ticks")
        .option("rows", _N_ROWS)
        .option("partitions", _N_PARTS)
        .load()
    )
    n_parts = ticks.rdd.getNumPartitions()
    if n_parts != _N_PARTS:
        raise AssertionError(
            f"custom source planned {n_parts} partitions, expected {_N_PARTS}"
        )
    return ticks.groupBy("symbol").agg(
        F.count(F.lit(1)).cast("long").alias("n_ticks"),
        F.sum("price").alias("total_price"),
        F.sum("volume").cast("long").alias("total_volume"),
        F.min("price").alias("min_price"),
        F.max("price").alias("max_price"),
    )


@register(
    "stream_python_datasource_ticks",
    oracle=f"""
    WITH t AS (SELECT range AS i FROM range({_S_ROWS})),
    r AS (
      SELECT i,
             CASE i % 4 WHEN 0 THEN 'AAPL' WHEN 1 THEN 'GOOG'
                        WHEN 2 THEN 'MSFT' ELSE 'AMZN' END AS symbol,
             100.0 + (i % 97) * 0.25 AS price,
             (i * 37) % 1000 AS volume
      FROM t
    )
    SELECT symbol,
           CAST(COUNT(*) AS BIGINT) AS n_ticks,
           SUM(price) AS total_price,
           CAST(SUM(volume) AS BIGINT) AS total_volume,
           MIN(price) AS min_price,
           MAX(price) AS max_price
    FROM r GROUP BY symbol
    """,
    tags=("source", "python-datasource", "connector", "streaming", "exactly-once"),
)
def stream_python_datasource_ticks(spark, sf_dir):
    """STREAMING face of the custom Python DataSource
    (sources/pysource.py `SyntheticTicksStreamReader`): the reference's
    *unbounded* producer loop (``/root/reference/producer.py:31-34``)
    as a rate-limited Spark 4 ``SimpleDataSourceStreamReader`` — row-
    range offsets, deterministic ``readBetweenOffsets`` replay, all
    reader state in the checkpointed offset (kill/restart exactly-once
    is pinned separately in tests/test_sources_stream.py). The stream
    runs for real here: {_S_ROWS} rows admitted {_S_BATCH} per micro-
    batch into a memory sink (asserted: >= 4 non-empty micro-batches,
    so a regression to one-giant-batch fails loudly), then the sink is
    aggregated per symbol and checked value-exact against DuckDB
    replaying the closed-form tick arithmetic over ``range(n)`` —
    float-exact quarter prices make even the double SUM carry zero
    rounding error. (``sf_dir`` unused — the source is its own data.)"""
    from ..session import track_memory_sink_table
    from ..sources.pysource import register_synthetic_ticks

    register_synthetic_ticks(spark)
    sdf = (
        spark.readStream.format("synthetic_ticks")
        .option("rows", _S_ROWS)
        .option("ticksPerBatch", _S_BATCH)
        .load()
    )
    name = f"stream_pyds_{uuid.uuid4().hex[:8]}"
    track_memory_sink_table(name)
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination()
    n_batches = sum(1 for p in q.recentProgress if p["numInputRows"] > 0)
    if n_batches < 4:
        raise AssertionError(
            f"expected >= 4 rate-limited micro-batches, saw {n_batches}"
        )
    return spark.table(name).groupBy("symbol").agg(
        F.count(F.lit(1)).cast("long").alias("n_ticks"),
        F.sum("price").alias("total_price"),
        F.sum("volume").cast("long").alias("total_volume"),
        F.min("price").alias("min_price"),
        F.max("price").alias("max_price"),
    )


@register(
    "stream_partitioned_datasource_ticks",
    oracle=f"""
    WITH t AS (SELECT range AS i FROM range({_P_ROWS})),
    r AS (
      SELECT i,
             CASE i % 4 WHEN 0 THEN 'AAPL' WHEN 1 THEN 'GOOG'
                        WHEN 2 THEN 'MSFT' ELSE 'AMZN' END AS symbol,
             100.0 + (i % 97) * 0.25 AS price,
             (i * 37) % 1000 AS volume
      FROM t
    )
    SELECT symbol,
           CAST(COUNT(*) AS BIGINT) AS n_ticks,
           SUM(price) AS total_price,
           CAST(SUM(volume) AS BIGINT) AS total_volume
    FROM r GROUP BY symbol
    """,
    tags=("source", "python-datasource", "connector", "streaming", "partitioned"),
    # r12: promoted to a driver slot (never driver-checked before)
)
def stream_partitioned_datasource_ticks(spark, sf_dir):
    """The PARTITIONED streaming face of the custom connector
    (sources/pysource.py `SyntheticTicksPartitionedStreamReader`):
    ``partitions(start, end)`` plans 8 executor-side range shards per
    micro-batch through Spark 4's full ``DataSourceStreamReader`` API —
    the scale path the Simple reader's driver-side prefetch cannot take
    (its own docstring defers here). The bounded feed's high-water mark
    is constant, so the run is ONE micro-batch fanned across 8 shards
    (asserted: exactly one non-empty batch of exactly {_P_ROWS} rows);
    shard split + executor read are unit-pinned, and the closed-form
    tick arithmetic is replayed exactly by DuckDB. (``sf_dir`` unused —
    the source is its own data.)"""
    from ..session import track_memory_sink_table
    from ..sources.pysource import register_synthetic_ticks_partitioned

    register_synthetic_ticks_partitioned(spark)
    sdf = (
        spark.readStream.format("synthetic_ticks_part")
        .option("rows", _P_ROWS)
        .option("partitions", 8)
        .load()
    )
    name = f"stream_pydsp_{uuid.uuid4().hex[:8]}"
    track_memory_sink_table(name)
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    nonempty = [p["numInputRows"] for p in q.recentProgress if p["numInputRows"] > 0]
    if nonempty != [_P_ROWS]:
        raise AssertionError(
            f"expected one full-range micro-batch of {_P_ROWS}, saw {nonempty}"
        )
    return spark.table(name).groupBy("symbol").agg(
        F.count(F.lit(1)).cast("long").alias("n_ticks"),
        F.sum("price").alias("total_price"),
        F.sum("volume").cast("long").alias("total_volume"),
    )
