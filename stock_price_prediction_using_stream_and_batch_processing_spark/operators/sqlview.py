"""SQL addressability for the snapshot store: register a table version
as a Spark temp view so ``spark.sql`` can run VERSION AS OF /
TIMESTAMP AS OF reads without touching the DataFrame API.

The reference's batch path is literally SQL-over-JDBC
(batch_processor.py:76 builds a SELECT string); this is its native-
engine analogue at the table-format layer — the interop face a SQL-only
consumer (BI tool, notebook user) needs to query snapshot tables.

The view wraps :func:`operators.snapshots.read_snapshot`, so everything
the DataFrame read honors rides through SQL untouched: merge-on-read
equality/positional deletes, schema evolution NULL-padding, sharded
manifests. A temp view is a NAME for the lazy plan — registering one
costs no execution, and Catalyst prunes/pushes into the underlying
parquet scan exactly as for the DataFrame form.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from .snapshots import read_snapshot, version_as_of


def snapshot_view(
    spark: SparkSession,
    table_dir: str,
    name: str,
    version: int | None = None,
    timestamp: float | None = None,
    ref: str | None = None,
) -> str:
    """Register snapshot ``version`` (default current) — or the version
    live at wall-clock ``timestamp`` (TIMESTAMP AS OF), or a named ref
    (``"branch:NAME"`` = the branch's audit read, ``"tag:NAME"`` = the
    tagged version) — as temp view ``name``. Returns ``name`` for
    call-chaining into ``spark.sql``.

    The view is PINNED: it resolves the version (or branch head) at
    registration time, so commits after registration never leak in
    (snapshot isolation for SQL readers). Re-register to follow the
    head.
    """
    if sum(x is not None for x in (version, timestamp, ref)) > 1:
        raise ValueError("pass at most one of version / timestamp / ref")
    if ref is not None:
        from .refs import read_branch, tag_version

        kind, _, rname = ref.partition(":")
        if kind == "branch" and rname:
            read_branch(spark, table_dir, rname).createOrReplaceTempView(name)
            return name
        if kind == "tag" and rname:
            version = tag_version(table_dir, rname)
        else:
            raise ValueError(
                f"ref must be 'branch:NAME' or 'tag:NAME', got {ref!r}"
            )
    elif timestamp is not None:
        version = version_as_of(table_dir, timestamp)
    read_snapshot(spark, table_dir, version).createOrReplaceTempView(name)
    return name
