"""Upsert (MERGE) into a parquet table of record.

Plain parquet has no transactional MERGE (that's Delta/Iceberg
territory), but the batch upsert pattern is still expressible safely:
read the affected slice, anti-join out rows whose key is being
replaced, union the updates, materialize, and overwrite — scoped to
ONLY the partitions the updates touch when the table is
time-partitioned (sources/sinks.py layout), so a day of late data
rewrites a day, not 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def merge_into_parquet(
    spark: SparkSession,
    target_path: str,
    updates: DataFrame,
    key_cols: list[str],
    partition_col: str | None = None,
) -> int:
    """Upsert ``updates`` into the parquet table at ``target_path``:
    rows matching on ``key_cols`` are replaced, new keys are inserted.
    Returns the number of rows written.

    With ``partition_col`` (the table's partitionBy column), only the
    partitions present in ``updates`` are read and rewritten (dynamic
    partition overwrite); untouched partitions' files are not touched.

    CONTRACT with ``partition_col``: a key's partition value must be
    functionally dependent on ``key_cols`` (or otherwise immutable) —
    the merge reads ONLY the updated partitions, so an update that
    moves a key to a different partition value strands the old row in
    its unread partition and leaves the key duplicated. That is the
    price of partition-pruned merges on plain parquet (a transactional
    format's MERGE reads matches table-wide); every internal caller
    derives the partition from the merge key (bar/sketch stores:
    part_date from bucket_start). Rewriting moving keys requires
    ``partition_col=None`` (full-table merge).

    The merged slice is MATERIALIZED (localCheckpoint) before the
    overwrite — Spark cannot lazily read a path it is overwriting."""
    target = spark.read.parquet(target_path)
    if partition_col is not None:
        parts = [r[0] for r in updates.select(partition_col).distinct().collect()]
        slice_df = target.filter(F.col(partition_col).isin(parts))
    else:
        slice_df = target
    kept = slice_df.join(updates.select(*key_cols).distinct(), key_cols, "left_anti")
    merged = kept.unionByName(updates.select(*kept.columns)).localCheckpoint(eager=True)
    n = merged.count()
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        writer = merged.write.mode("overwrite")
        if partition_col is not None:
            writer = writer.partitionBy(partition_col)
        writer.parquet(target_path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    return n


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Row-level diff between two snapshots of a keyed table — the
    CDC/audit primitive behind "what changed since yesterday's load":
    one row per key whose state differs, ``change_type`` in
    ('added', 'removed', 'changed'). Unchanged keys are dropped.

    Scale shape: each side collapses to (keys, md5-of-compared-columns)
    BEFORE the join, so the full-outer join shuffles 16-byte digests +
    keys — never the row payloads — and at 100 TB the diff costs two
    projected scans plus one key-partitioned join. Each cell is
    LENGTH-PREFIXED (``len:value``, NULL → ``N``) before
    concatenation, which makes the encoding injective for ANY cell
    contents — delimiter-style schemes collide when values contain the
    delimiter itself (("a<sep>b", "c") vs ("a", "b<sep>c")), and a
    NULL sentinel collides with a value equal to the sentinel; a
    length prefix has neither hole (a non-null encoding always starts
    with a digit, so it can't collide with ``N`` either).
    ``compare_cols`` defaults to every non-key column the two snapshots
    share (schema drift: a column present on one side only raises
    rather than silently vanishing from the comparison)."""
    if compare_cols is None:
        old_non = [c for c in old.columns if c not in key_cols]
        new_non = [c for c in new.columns if c not in key_cols]
        if set(old_non) != set(new_non):
            raise ValueError(
                f"snapshot schemas differ: only-old={sorted(set(old_non) - set(new_non))}, "
                f"only-new={sorted(set(new_non) - set(old_non))}; pass compare_cols explicitly"
            )
        compare_cols = old_non

    def row_hash(df: DataFrame, alias: str) -> DataFrame:
        from pyspark.sql import types as T

        def enc(c: str):
            # complex types serialize via to_json (injective thanks to
            # escaping/quoting) — Spark's display-string cast is NOT:
            # array(["a, b"]) and array(["a", " b"]) both render
            # "[a, b]". Maps are rejected: JSON key order is not
            # canonicalized, so equal maps could hash unequal.
            dt = df.schema[c].dataType
            if isinstance(dt, T.MapType):
                raise ValueError(
                    f"snapshot_diff: column {c!r} is a map — no canonical encoding; "
                    "compare map_entries(sort_array(...)) or exclude it via compare_cols"
                )
            if isinstance(dt, (T.ArrayType, T.StructType)):
                cs = F.to_json(F.col(c))
            else:
                cs = F.col(c).cast("string")
            return F.when(cs.isNull(), F.lit("N")).otherwise(
                F.concat(F.length(cs).cast("string"), F.lit(":"), cs)
            )

        return df.select(
            *key_cols, F.md5(F.concat(*[enc(c) for c in compare_cols])).alias(alias)
        )

    o = row_hash(old, "_h_old")
    n2 = row_hash(new, "_h_new")
    joined = o.join(n2, key_cols, "full_outer")
    change = (
        F.when(F.col("_h_old").isNull(), F.lit("added"))
        .when(F.col("_h_new").isNull(), F.lit("removed"))
        .when(F.col("_h_old") != F.col("_h_new"), F.lit("changed"))
    )
    return (
        joined.withColumn("change_type", change)
        .filter(F.col("change_type").isNotNull())
        .select(*key_cols, "change_type")
    )


def apply_changelog(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    op_col: str,
    delete_op: str = "D",
) -> DataFrame:
    """CDC changelog compaction with tombstones: collapse an
    insert/update/delete event stream to final table state — per key,
    the LAST change in ``order_cols`` order wins, and a key whose last
    change is a ``delete_op`` disappears entirely (Kafka
    log-compaction / Debezium-snapshot semantics; the piece
    ``merge_into_parquet``'s upsert deliberately lacks).

    One keyed window (row_number over the per-key sort — the shuffle is
    on ``key_cols``, the per-key frame is however many changes a key
    accumulated between compactions, typically small) and a filter; the
    tombstone check happens AFTER last-wins, so D → re-insert sequences
    resurrect the key with the newer row, and U → D sequences delete it,
    in any interleaving. ``order_cols`` must totalize per key (pass the
    changelog's sequence/offset as the last column) or last-wins is
    nondeterministic."""
    w = Window.partitionBy(*key_cols).orderBy(*[F.col(c).desc() for c in order_cols])
    from .maintenance import free_name

    rn = free_name("_rn", df.columns)
    return (
        df.withColumn(rn, F.row_number().over(w))
        .filter((F.col(rn) == 1) & (F.col(op_col) != delete_op))
        .drop(rn)
    )
