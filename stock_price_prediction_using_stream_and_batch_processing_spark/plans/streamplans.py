"""Structured Streaming queries in the driver-checkable registry.

Each runs a real streaming query (file source + ``availableNow``) to a
memory sink and returns the sink table — so the driver's differential
check covers STREAMING execution, not just batch. Stateless projection
and complete-mode aggregation are deterministic and oracle-checked;
watermark-append and within-watermark dedup are registered rows-only
(their emit timing depends on micro-batch boundaries) and asserted
precisely in tests/test_streaming.py.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import functions as F

from ..sources.tables import normalize_ns, raw_table
from .core import register


def _run_stream_to_memory(sdf, name_prefix: str, output_mode: str):
    name = f"{name_prefix}_{uuid.uuid4().hex[:8]}"
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return name


def _stream_source_dir(sf_dir: str, table: str) -> str:
    """The parquet streaming source requires a DIRECTORY; testdata is
    one file per table (read-only), so expose it through a symlink in a
    deterministic temp dir."""
    import hashlib

    key = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    d = os.path.join("/tmp", "spark_graft_stream_src", key, table)
    os.makedirs(d, exist_ok=True)
    link = os.path.join(d, f"{table}.parquet")
    src = os.path.join(sf_dir, f"{table}.parquet")
    if not os.path.exists(link):
        os.symlink(src, link)
    return d


def _stream_events(spark, sf_dir):
    schema = raw_table(spark, sf_dir, "events").schema
    sdf = spark.readStream.schema(schema).parquet(_stream_source_dir(sf_dir, "events"))
    return normalize_ns(sdf, "events")


@register(
    "stream_filter_project_events",
    oracle="""
    SELECT event_id, user_id, value
    FROM events WHERE event_type = 'purchase' AND value > 100
    """,
    tags=("streaming", "filter", "projection"),
)
def stream_filter_project_events(spark, sf_dir):
    """Stateless streaming filter+project (reference P0 path under
    ``readStream``), append mode — result equals the batch query."""
    s = _stream_events(spark, sf_dir)
    out = (
        s.filter((F.col("event_type") == "purchase") & (F.col("value") > 100))
        .select("event_id", "user_id", "value")
    )
    name = _run_stream_to_memory(out, "stream_fp", "append")
    return spark.table(name)


@register(
    "stream_hourly_counts",
    oracle="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS bucket_start,
           event_type, COUNT(*) AS n, ROUND(SUM(value), 2) AS sum_value
    FROM events GROUP BY 1, 2
    """,
    tags=("streaming", "window-agg", "groupby"),
)
def stream_hourly_counts(spark, sf_dir):
    """Streaming tumbling-window aggregation (complete mode): the
    stream-side OHLC/metrics shape (§2.10). Complete mode makes the
    final state deterministic for the oracle."""
    s = _stream_events(spark, sf_dir)
    agg = (
        s.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("bucket_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )
    name = _run_stream_to_memory(agg, "stream_hc", "complete")
    return spark.table(name)


@register("stream_watermark_hourly_append", oracle=None, tags=("streaming", "watermark", "late-data"))
def stream_watermark_hourly_append(spark, sf_dir):
    """Watermarked hourly counts in APPEND mode: only windows the
    10-minute watermark has closed are emitted — late-data semantics the
    reference lacks (§2.8). Emit set depends on the final watermark, so
    this is a rows-only check; exact behavior is pinned in
    tests/test_streaming.py."""
    s = _stream_events(spark, sf_dir)
    agg = (
        s.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("bucket_start"), "event_type", "n")
    )
    name = _run_stream_to_memory(agg, "stream_wm", "append")
    return spark.table(name)


@register("stream_dedup_within_watermark", oracle=None, tags=("streaming", "dedup", "watermark"))
def stream_dedup_within_watermark(spark, sf_dir):
    """Streaming exact dedup with bounded state
    (``dropDuplicatesWithinWatermark`` keyed by (user_id, event_type)) —
    the streaming face of the dedup family."""
    s = _stream_events(spark, sf_dir)
    out = (
        s.withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
        .select("user_id", "event_type")
    )
    name = _run_stream_to_memory(out, "stream_dd", "append")
    return spark.table(name)
