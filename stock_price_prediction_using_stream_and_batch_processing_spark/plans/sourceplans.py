"""Connector-surface queries: the custom Python DataSource face
(sources/pysource.py) exercised end to end through the public Spark 4
`pyspark.sql.datasource` API, with a full value oracle.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .core import register

_N_ROWS = 200_000
_N_PARTS = 8


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
