"""Atomic snapshot commits + time travel over an append-only table —
the commit-protocol layer of the lakehouse metadata stack (Iceberg
snapshots / Delta log), one level above the file-stats manifest in
``operators/layout.py``.

Model:

- ``<table>/data/<commit-uuid>/part-*.parquet`` — data files, written
  ONCE, never rewritten. A writer's files are invisible until its
  snapshot publishes, so readers never observe a half-written commit.
- ``<table>/snapshots/v{N:08d}.json`` — snapshot N's complete file
  list, each entry carrying per-file row counts and min/max stats for
  the commit's ``stats_cols`` (computed ONCE at ingest from the new
  files only — stats never require rescanning old data).
- Publication is a POSIX ``os.replace`` of a same-directory temp file:
  atomic, so a concurrent reader sees either v{N} or v{N+1}, never a
  torn file. Two writers racing to the same version resolve
  LAST-WRITER-WINS (the loser's data files become unreferenced
  orphans, never corruption); a real object-store deployment would
  swap this single primitive for a CAS/conditional-put without
  touching anything else here.

Readers resolve a version to its file list and read exactly those
files — a reader pinned to snapshot N is immune to concurrent appends
(they only add files N's list does not contain), and any historical
version stays readable for as long as its files are retained: time
travel is just "read an old list". Per-file stats make the manifest
prune (`pruned_files`) compose with time travel for free.

Scale posture: snapshot JSON is metadata-sized (one entry per file —
at millions of files the entry list itself becomes the thing to shard,
which is precisely Iceberg's manifest-list indirection; the protocol
here is unchanged by that sharding). Data-file writes and stats jobs
are distributed; only the entry list passes through the driver.
"""

from __future__ import annotations

import json
import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_SNAP_FMT = "v{:08d}.json"


def _snap_dir(table_dir: str) -> str:
    return os.path.join(table_dir, "snapshots")


def _snap_path(table_dir: str, version: int) -> str:
    return os.path.join(_snap_dir(table_dir), _SNAP_FMT.format(version))


def current_version(table_dir: str) -> int:
    """Highest published snapshot version (0 = empty table)."""
    d = _snap_dir(table_dir)
    if not os.path.isdir(d):
        return 0
    vs = [
        int(n[1:9])
        for n in os.listdir(d)
        if n.startswith("v") and n.endswith(".json") and n[1:9].isdigit()
    ]
    return max(vs, default=0)


def read_snapshot_meta(table_dir: str, version: int) -> dict:
    with open(_snap_path(table_dir, version)) as f:
        return json.load(f)


def snapshot_append(
    spark: SparkSession,
    table_dir: str,
    df: DataFrame,
    stats_cols: list[str] | None = None,
) -> int:
    """Append ``df`` as a new snapshot; returns the published version.

    Steps: (1) write data files under a fresh commit dir — invisible,
    no reader holds a list containing them; (2) one column-pruned scan
    of the NEW files only collects per-file row counts + min/max
    stats; (3) parent file list + new entries -> temp JSON ->
    ``os.replace`` to ``v{N+1}.json`` (atomic publish,
    last-writer-wins on a race)."""
    stats_cols = stats_cols or []
    commit_dir = os.path.join(table_dir, "data", uuid.uuid4().hex[:12])
    df.write.parquet(commit_dir)

    from .layout import file_minmax_manifest, manifest_pruned_paths  # noqa: F401

    manifest = file_minmax_manifest(spark, commit_dir, stats_cols)
    from urllib.parse import unquote, urlparse

    entries = []
    for r in manifest.collect():  # one row PER NEW FILE — metadata-sized
        p = urlparse(r["file"])
        path = (
            unquote(p.path)
            if p.scheme in ("", "file")
            else f"{p.scheme}://{p.netloc}{unquote(p.path)}"
        )
        e = {"path": path, "n_rows": r["n_rows"]}
        for c in stats_cols:
            e[f"min_{c}"] = r[f"min_{c}"]
            e[f"max_{c}"] = r[f"max_{c}"]
        entries.append(e)

    parent = current_version(table_dir)
    meta = read_snapshot_meta(table_dir, parent) if parent else {"files": []}
    new_version = parent + 1
    snap = {
        "version": new_version,
        "parent": parent,
        "stats_cols": stats_cols,
        "files": meta["files"] + entries,
    }
    os.makedirs(_snap_dir(table_dir), exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=_snap_dir(table_dir), suffix=".tmp")
    with os.fdopen(fd, "w") as f:
        json.dump(snap, f)
    os.replace(tmp, _snap_path(table_dir, new_version))
    return new_version


def snapshot_files(table_dir: str, version: int | None = None) -> list[dict]:
    """File entries of ``version`` (default: current). This IS the pin:
    hold the list and concurrent appends cannot touch your read set."""
    v = current_version(table_dir) if version is None else version
    if v == 0:
        return []
    return read_snapshot_meta(table_dir, v)["files"]


def read_snapshot(
    spark: SparkSession,
    table_dir: str,
    version: int | None = None,
    prune_col: str | None = None,
    lo=None,
    hi=None,
) -> DataFrame:
    """Time-travel read of snapshot ``version`` (default current),
    optionally manifest-pruned to files whose [min, max] on
    ``prune_col`` intersects [lo, hi] — the stored ingest-time stats
    make historical reads prunable without touching any data file.
    The caller applies its own residual predicate (pruning is
    conservative interval intersection, same semantics as
    ``operators/layout.manifest_pruned_paths``)."""
    files = snapshot_files(table_dir, version)
    if prune_col is not None:
        files = [
            e
            for e in files
            if e[f"min_{prune_col}"] is not None
            and e[f"max_{prune_col}"] >= lo
            and e[f"min_{prune_col}"] <= hi
        ]
    if not files:
        raise ValueError(f"snapshot has no matching files under {table_dir}")
    return spark.read.parquet(*[e["path"] for e in files])


def snapshot_agg(
    spark: SparkSession, table_dir: str, version: int, exprs: list
) -> DataFrame:
    """Aggregate one historical snapshot, tagged with its version."""
    return read_snapshot(spark, table_dir, version).agg(*exprs).select(
        F.lit(version).alias("version"), "*"
    )
