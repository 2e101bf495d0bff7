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
        limit_style="fetch",
        ident_quote='"',
    )
    return back.select(
        F.col("o_orderkey").cast("long").alias("o_orderkey"),
        F.col("o_custkey").cast("long").alias("o_custkey"),
        "o_orderstatus",
        F.col("o_totalprice").cast("double").alias("o_totalprice"),
        F.col("o_orderdate").cast("date").alias("o_orderdate"),
    )
