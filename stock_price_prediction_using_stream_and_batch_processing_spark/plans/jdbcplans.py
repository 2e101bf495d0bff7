"""JDBC interop queries — a LIVE external-database round-trip through
Spark's JDBC source/sink, oracle-checked.

The reference's table of record was MySQL: every micro-batch appended
over JDBC (``/root/reference/stream_consumer.py:61-69``) and the batch
job read the latest-k back with the sort+limit pushed into the database
as a derived table (``/root/reference/batch_processor.py:72-79``).
``sources/jdbc.py`` ships that surface; until round 6 it was seam-tested
only (option plumbing). These queries execute it against a REAL
database: embedded Apache Derby, which Spark itself ships (its Hive
metastore engine), running in-process in the Spark JVM — a genuine
CREATE TABLE / batched INSERT / pushed-down SELECT through the exact
code path a MySQL deployment would use (swap url+driver, nothing else).

Scale notes: the top-k never crosses the wire (ORDER BY + FETCH FIRST
runs in the database); the write batches INSERTs per partition
(connection fan-in == partition count); a big-table read would add the
partitioned-read contract (partition_column/bounds — exercised against
live Derby in tests/test_jdbc.py).
"""

from __future__ import annotations

import os
import tempfile
import threading
import uuid

from pyspark.sql import functions as F

from ..sources import jdbc
from ..sources.tables import load_table
from .core import register

# ONE booted Derby database per process: embedded Derby keeps every
# booted database's page cache and background threads alive in the JVM
# until an explicit shutdown, so a per-invocation database would
# accumulate across a bench sweep's repeated runs. Invocations instead
# share the boot and isolate via per-invocation TABLE names.
#
# The database dir deliberately does NOT come from workdirs
# (fresh_result_dir): that root is swept by age, and a process-lifetime
# database whose top-level mtime stays at boot time would be rmtree'd
# out from under the live JVM by any other query's sweep in a process
# alive past the cutoff. A plain mkdtemp under the system temp root is
# never swept by us; one small Derby dir per process is the accepted
# footprint (the OS temp reaper owns it after the process dies).
_DERBY_LOCK = threading.Lock()
_DERBY_DIR: list[str] = []


def _shared_derby_url(spark) -> str:
    with _DERBY_LOCK:  # double-boot under concurrency would leak a dir
        if not _DERBY_DIR:
            jdbc.quiet_derby_log(spark)
            _DERBY_DIR.append(os.path.join(tempfile.mkdtemp(prefix="spark_graft_derby_"), "db"))
    return jdbc.derby_url(_DERBY_DIR[0])


@register(
    "jdbc_roundtrip_orders_topk",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
           CAST(o_orderdate AS DATE) AS o_orderdate
    FROM orders ORDER BY o_orderkey DESC LIMIT 200
    """,
    tags=("jdbc", "interop", "sink", "source", "pushdown"),
    # rotation r12: driver-green r6-r11 (6 straight); the live-JDBC
    # family keeps stream_jdbc_serving_append's driver row
    driver=False,
)
def jdbc_roundtrip_orders_topk(spark, sf_dir):
    """Orders → RDBMS → top-k back, end to end through Spark's JDBC
    source/sink against a live embedded Derby database: write the
    orders slice (``sources/jdbc.write_jdbc`` — the reference's S2
    append path, with the table created by the write), then read the
    top-200 by order key back with the sort+limit PUSHED INTO the
    database as a derived table (``read_jdbc_latest_k`` — the
    reference's S3 shape, ``batch_processor.py:76``; ANSI
    ``FETCH FIRST`` + quoted identifiers because Derby case-folds
    unquoted names while Spark's writer creates them case-exact).
    The DuckDB oracle computes the same top-k directly from parquet, so
    the differential verifies every value SURVIVED the round-trip:
    bigint keys, DOUBLE prices, CHAR status, DATE dates. o_orderdate is
    written as DATE (not timestamp) so the comparison is
    timezone-free under any driver session timezone."""
    url = _shared_derby_url(spark)
    table = f"orders_rt_{uuid.uuid4().hex[:8]}"
    src = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        F.col("o_orderdate").cast("date").alias("o_orderdate"),
    )
    jdbc.write_jdbc(
        src,
        url,
        table,
        user="app",
        password="",
        driver=jdbc.DERBY_DRIVER,
        mode="overwrite",
        createTableColumnTypes="o_orderstatus VARCHAR(1)",
    )
    back = jdbc.read_jdbc_latest_k(
        spark,
        url,
        table,
        user="app",
        password="",
        driver=jdbc.DERBY_DRIVER,
        ts_col="o_orderkey",
        k=200,
        dialect="derby",
    )
    return back.select(
        F.col("o_orderkey").cast("long").alias("o_orderkey"),
        F.col("o_custkey").cast("long").alias("o_custkey"),
        "o_orderstatus",
        F.col("o_totalprice").cast("double").alias("o_totalprice"),
        F.col("o_orderdate").cast("date").alias("o_orderdate"),
    )


@register(
    "stream_jdbc_serving_append",
    oracle="""
    SELECT user_id,
           COUNT(*) AS n_purchases,
           ROUND(SUM(value), 2) AS total_value
    FROM events WHERE event_type = 'purchase'
    GROUP BY user_id
    """,
    tags=("streaming", "jdbc", "sink", "serving", "exactly-once"),
)
def stream_jdbc_serving_append(spark, sf_dir):
    """The reference's LITERAL serving pipeline, live and oracle-checked
    end to end: a streaming query appends each micro-batch's purchase
    rows to an RDBMS table over JDBC inside ``foreachBatch``
    (``/root/reference/stream_consumer.py:61-69`` — there MySQL, here
    embedded Derby through the identical Spark JDBC sink code path),
    then the serving side reads the table back and aggregates per user.
    Two upgrades over the reference, both load-bearing at scale:

    - **Exactly-once**: the reference's append is unfenced, so a
      foreachBatch retry double-inserts its rows. Here each epoch's
      INSERT sits behind the shared ``epoch_guarded`` marker fence —
      the differential (counts AND sums vs the parquet truth) would
      catch any double-append.
    - **Partitioned read-back**: the serving scan uses Spark's
      partitioned-JDBC contract (8 stride queries on ``user_id``), the
      N-task shape a big serving table needs, not the reference's
      single-connection read. The per-user aggregate then shuffles
      map-side-combined; connection fan-in on the write side is bounded
      by ``numPartitions=4``.

    The stream is the 4-file ``availableNow`` split (one file per
    micro-batch), so rows genuinely arrive across FOUR separate
    fenced INSERT epochs before the read-back."""
    from ..streaming.pipeline import epoch_guarded
    from .streamplans import _run_maintenance_stream

    url = _shared_derby_url(spark)
    table = f"ticks_serve_{uuid.uuid4().hex[:8]}"

    def maint(batch_df, store, epoch_id):
        rows = batch_df.filter(F.col("event_type") == "purchase").select(
            "event_id", "user_id", "value"
        )
        epoch_guarded(
            store,
            epoch_id,
            lambda: jdbc.write_jdbc(
                rows,
                url,
                table,
                user="app",
                password="",
                driver=jdbc.DERBY_DRIVER,
                mode="append",
                numPartitions=4,
            ),
        )

    _run_maintenance_stream(spark, sf_dir, "jdbcserve", maint)
    # table name unquoted: Spark's JDBC writer emits CREATE TABLE with the
    # name unquoted (Derby case-folds and stores it upper), so the read
    # must case-fold the same way; COLUMN names are the quoted-exact ones
    back = jdbc.read_jdbc(
        spark,
        url,
        table,
        user="app",
        password="",
        driver=jdbc.DERBY_DRIVER,
        partition_column="user_id",
        lower_bound=0,
        upper_bound=1_000_000,
        num_partitions=8,
    )
    return (
        back.select(F.col("user_id").cast("long").alias("user_id"), "value")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_purchases"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )
