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
- Publication is an atomic exclusive hard-link of a same-directory
  temp file: a concurrent reader sees either v{N} or v{N+1}, never a
  torn file, and two writers racing the same version resolve
  FIRST-WRITER-WINS — the loser raises :class:`ConcurrentCommitError`
  with its (still unreferenced) data files intact. Commits that
  COMMUTE with the race (appends, streaming-sink batches) rebase onto
  the new parent and retry via :func:`publish_with_rebase`; rewrites
  (compaction, merge) surface the conflict for re-planning. A real
  object-store deployment swaps the one link primitive for a
  CAS/conditional-put without touching anything else here.

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
    bloom_cols: list[str] | None = None,
) -> int:
    """Append ``df`` as a new snapshot; returns the published version.

    Steps: (1) write data files under a fresh commit dir — invisible,
    no reader holds a list containing them; (2) one column-pruned scan
    of the NEW files collects per-file row counts + min/max stats
    (plus one more pass for ``bloom_cols``, if any); (3) parent file
    list + new entries publish first-writer-wins, auto-rebasing onto
    any concurrently published parent (appends commute)."""
    stats_cols = stats_cols or []
    commit_dir = os.path.join(table_dir, "data", uuid.uuid4().hex[:12])
    df.write.parquet(commit_dir)
    entries = _scan_commit_stats(spark, commit_dir, stats_cols)
    _attach_blooms(spark, commit_dir, entries, bloom_cols or [])

    def make_snap(parent: int, meta: dict) -> dict:
        # Mixed-stats commits are legal: the snapshot's top-level
        # stats_cols/bloom_cols are the UNION across the history, and
        # entries may lack min_/max_/bloom_ keys for columns their
        # commit didn't collect — readers treat the MISSING key as
        # "keep the file" (ADVICE r11: concatenating parent entries
        # under a per-call stats_cols made read/merge KeyError on
        # older files).
        snap = {
            "version": parent + 1,
            "parent": parent,
            "stats_cols": _merged_cols(meta.get("stats_cols"), stats_cols),
            "bloom_cols": _merged_cols(meta.get("bloom_cols"), bloom_cols),
            "files": meta["files"] + entries,
        }
        _carry_fence(snap, meta)
        return snap

    return publish_with_rebase(table_dir, make_snap)


def _merged_cols(parent_cols, commit_cols) -> list[str]:
    """Union of the parent's declared stat/bloom columns and this
    commit's, parent order first (stable across rebases)."""
    out = list(parent_cols or [])
    out.extend(c for c in (commit_cols or []) if c not in out)
    return out


def publish_with_rebase(table_dir: str, make_snap, max_attempts: int = 50) -> int:
    """Optimistic-concurrency retry loop shared by every COMMUTING
    commit (appends, streaming-sink batches): re-read the parent, let
    ``make_snap(parent, meta)`` build the snapshot against it (return
    None to stop without publishing — e.g. an epoch-fence hit), publish
    first-writer-wins, rebase and retry on a lost race. The expensive
    work (data write, stats scan) happens BEFORE this loop and is never
    repeated; only metadata assembly reruns. Returns the published
    version, or 0 if make_snap declined."""
    for _ in range(max_attempts):
        parent = current_version(table_dir)
        meta = read_snapshot_meta(table_dir, parent) if parent else {"files": []}
        snap = make_snap(parent, meta)
        if snap is None:
            return 0
        try:
            _publish(table_dir, parent + 1, snap)
            return parent + 1
        except ConcurrentCommitError:
            continue
    raise ConcurrentCommitError(
        f"could not win a publish in {max_attempts} attempts under {table_dir}"
    )


def _carry_fence(snap: dict, parent_meta: dict) -> None:
    """Every non-sink commit must CARRY the streaming sink's epoch
    fences forward: a maintenance append/compact/merge interleaved
    with a crashed stream would otherwise publish a current version
    without the fence, and the stream's replayed batch would
    double-append (found in the r11 self-review). Fences are the
    per-writer map ``last_batches`` (r12); the legacy global
    ``last_batch_id`` is carried too so pre-r12 tables keep their
    protection until a sink commit upgrades the format."""
    if parent_meta.get("last_batches"):
        snap["last_batches"] = parent_meta["last_batches"]
    if parent_meta.get("last_batch_id") is not None:
        snap["last_batch_id"] = parent_meta["last_batch_id"]


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
    all_files = snapshot_files(table_dir, version)
    if not all_files:
        raise ValueError(f"snapshot has no files under {table_dir}")
    files = all_files
    if prune_col is not None:
        # Three stat states per entry, two of them prunable:
        #   key ABSENT    -> commit didn't collect this column: KEEP
        #                    (conservative, like a bloom-less file)
        #   min None      -> collected, all values NULL: PRUNE (no row
        #                    can satisfy a range predicate)
        #   min/max set   -> interval-intersection test
        files = [
            e
            for e in files
            if f"min_{prune_col}" not in e
            or (
                e[f"min_{prune_col}"] is not None
                and e[f"max_{prune_col}"] >= lo
                and e[f"min_{prune_col}"] <= hi
            )
        ]
    if not files:
        # every file pruned away: the legitimate answer is ZERO rows
        # (e.g. a range beyond any key), not an error — read one file's
        # footer for the schema and return the empty frame.
        return spark.read.parquet(all_files[0]["path"]).where(F.lit(False))
    return spark.read.parquet(*[e["path"] for e in files])


def snapshot_compact(
    spark: SparkSession,
    table_dir: str,
    target_files: int = 1,
    stats_cols: list[str] | None = None,
    cluster_by: list[str] | None = None,
    bits: int = 16,
    bloom_cols: list[str] | None = None,
) -> int:
    """COPY-ON-WRITE compaction (the OPTIMIZE step of the protocol):
    read the current snapshot's files, rewrite them as ``target_files``
    new data files, publish v+1 whose file list REPLACES every old
    entry. Readers of older versions are untouched — their file lists
    still reference the small files, which stay on disk until
    :func:`expire_snapshots` retires the versions that need them; a
    reader pinned to the current version before the compaction commits
    likewise keeps a fully valid list (copy-on-write never mutates a
    published file). Stats are recomputed on the rewritten files by the
    same ingest-time scan ``snapshot_append`` uses. At 100 TB this is
    the small-files remedy: the rewrite is one distributed job over
    exactly the files being compacted, and the metadata swap is still
    one atomic rename.

    Stats AND per-file blooms are recomputed on the rewritten files —
    ``bloom_cols`` defaults to the snapshot's declared bloom columns,
    so an OPTIMIZE on a bloom-indexed table keeps point-lookup pruning
    intact instead of silently degrading it to stats-only (ADVICE
    r11)."""
    parent = current_version(table_dir)
    if parent == 0:
        raise ValueError(f"nothing to compact under {table_dir}")
    parent_meta = read_snapshot_meta(table_dir, parent)
    stats_cols = stats_cols if stats_cols is not None else parent_meta.get("stats_cols", [])
    bloom_cols = bloom_cols if bloom_cols is not None else _snapshot_bloom_cols(parent_meta)
    df = read_snapshot(spark, table_dir, parent)
    if cluster_by:
        # OPTIMIZE ... ZORDER BY: range-partition the rewrite on the
        # Morton code over ``cluster_by`` and sort within files, so the
        # recomputed per-file [min,max] become tight boxes in EVERY
        # clustered dimension — ingest-interleaved keys that defeated
        # pruning before the compaction prune afterwards (pinned in
        # tests/test_snapshots.py). Same semantics, same commit.
        from .layout import zorder_value

        df = (
            zorder_value(df, cluster_by, bits)
            .repartitionByRange(target_files, F.col("zval"))
            .sortWithinPartitions("zval")
            .drop("zval")
        )
    else:
        df = df.repartition(target_files)
    commit_dir = os.path.join(table_dir, "data", uuid.uuid4().hex[:12])
    df.write.parquet(commit_dir)
    entries = _scan_commit_stats(spark, commit_dir, stats_cols)
    _attach_blooms(spark, commit_dir, entries, bloom_cols)
    snap = {
        "version": parent + 1,
        "parent": parent,
        "stats_cols": stats_cols,
        "bloom_cols": bloom_cols,
        "compaction_of": parent,
        "clustered_by": cluster_by or None,
        "files": entries,  # REPLACES, not extends
    }
    _carry_fence(snap, parent_meta)
    _publish(table_dir, parent + 1, snap)
    return parent + 1


def _snapshot_bloom_cols(meta: dict) -> list[str]:
    """The snapshot's bloom-indexed columns: the declared ``bloom_cols``
    (r12+), else detected from ``bloom_*`` keys on the entries (pre-r12
    snapshots declared nothing — rewrites must still rebuild them)."""
    if meta.get("bloom_cols") is not None:
        return meta["bloom_cols"]
    cols: list[str] = []
    for e in meta.get("files", []):
        for k in e:
            if k.startswith("bloom_") and k[6:] not in cols:
                cols.append(k[6:])
    return cols


def _attach_blooms(
    spark: SparkSession, commit_dir: str, entries: list[dict], bloom_cols: list[str]
) -> None:
    """Rebuild per-file blooms for a rewrite commit's new files and
    attach them to the freshly scanned entries (in place)."""
    if not bloom_cols:
        return
    blooms = _scan_commit_blooms(spark, commit_dir, bloom_cols)
    for e in entries:
        for col, b in blooms.get(e["path"], {}).items():
            e[f"bloom_{col}"] = b


def expire_snapshots(table_dir: str, keep_last: int = 1, min_age_s: float = 0.0) -> dict:
    """Retention (the VACUUM step): drop all but the newest
    ``keep_last`` snapshot JSONs, then physically delete every data
    file referenced ONLY by expired versions (reachability over the
    survivors' file lists — a set difference on paths, metadata-sized).
    Time travel to an expired version stops working BY CONTRACT; every
    surviving version keeps every file it references, so pinned readers
    of live versions are unaffected. Returns counts for assertion.

    Concurrency contract (ADVICE r11): retention assumes ONE
    maintenance process — it is not fenced against a writer that read
    a parent meta before expiry and publishes after (its new snapshot
    could reference just-deleted files). ``min_age_s`` is the
    VACUUM-style mitigation: versions younger than it (by snapshot-JSON
    mtime) are never expired, so any in-flight commit that rebases
    within the window lands on a still-live parent. ``keep_last`` must
    be ≥ 1 — expiring every snapshot would also discard the streaming
    sink's epoch fences and re-open replay double-appends."""
    if keep_last < 1:
        raise ValueError(
            "keep_last must be >= 1: the newest snapshot carries the table's "
            "file list and the streaming sink's epoch fences"
        )
    d = _snap_dir(table_dir)
    if not os.path.isdir(d):  # empty table: nothing to expire
        return {"expired_versions": 0, "deleted_files": 0}
    existing = sorted(
        int(n[1:9])
        for n in os.listdir(d)
        if n.startswith("v") and n.endswith(".json") and n[1:9].isdigit()
    )
    # keep the newest keep_last of the versions that EXIST on disk — a
    # contiguous range below current_version would reference versions a
    # stricter earlier expiry already deleted (r11 self-review)
    keep = set(existing[-keep_last:])
    if min_age_s > 0:
        import time

        cutoff = time.time() - min_age_s
        keep |= {
            v for v in existing if os.path.getmtime(_snap_path(table_dir, v)) > cutoff
        }
    expired = [v for v in existing if v not in keep]
    live_paths = {e["path"] for v in keep for e in snapshot_files(table_dir, v)}
    dead_paths = {
        e["path"] for v in expired for e in snapshot_files(table_dir, v)
    } - live_paths
    for p in dead_paths:
        try:
            os.remove(p)
        except OSError:
            pass
    for v in expired:
        os.remove(_snap_path(table_dir, v))
    return {"expired_versions": len(expired), "deleted_files": len(dead_paths)}


def _scan_commit_stats(spark: SparkSession, commit_dir: str, stats_cols: list[str]) -> list[dict]:
    """One column-pruned scan of a commit's NEW files -> file entries."""
    from .layout import decode_file_uri, file_minmax_manifest

    entries = []
    for r in file_minmax_manifest(spark, commit_dir, stats_cols).collect():
        e = {"path": decode_file_uri(r["file"]), "n_rows": r["n_rows"]}
        for c in stats_cols:
            e[f"min_{c}"] = json_stat(r[f"min_{c}"])
            e[f"max_{c}"] = json_stat(r[f"max_{c}"])
        entries.append(e)
    return entries


def json_stat(v):
    """Make a min/max stat JSON-round-trippable WITHOUT breaking the
    pruning order: date/datetime become ISO-8601 strings (whose
    lexicographic order equals their temporal order, so interval
    pruning against ISO-string bounds stays correct — callers pass
    string bounds for temporal columns, the same contract Iceberg's
    JSON metadata uses). Unsupported stat types (Decimal, binary) fail
    LOUDLY here at commit time instead of as an opaque json.dump
    TypeError after the data files are already written."""
    import datetime

    if v is None or isinstance(v, (bool, int, float, str)):
        return v
    if isinstance(v, (datetime.date, datetime.datetime)):
        return v.isoformat()
    raise ValueError(
        f"stats_cols value of type {type(v).__name__} is not JSON-portable; "
        "cast the column (e.g. to string/epoch) before using it for file stats"
    )


class ConcurrentCommitError(Exception):
    """Another writer published this version first. Appends auto-rebase
    and retry (their data files are untouched by the race); semantic
    rewrites (compaction, merge) surface the conflict to the caller,
    who must re-plan against the new current version — the same
    validation split Iceberg's optimistic protocol makes."""


def _publish(table_dir: str, version: int, snap: dict) -> None:
    """ATOMIC FIRST-WRITER-WINS publish: the snapshot JSON is written
    to a temp file and ``os.link``ed to its final name — link fails
    with EEXIST if any other writer already published this version, so
    two racing commits can never both claim it (optimistic concurrency;
    an object-store deployment swaps this one primitive for a
    conditional PUT). The loser raises :class:`ConcurrentCommitError`
    with its data files intact, ready to rebase."""
    os.makedirs(_snap_dir(table_dir), exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=_snap_dir(table_dir), suffix=".tmp")
    with os.fdopen(fd, "w") as f:
        json.dump(snap, f)
    try:
        os.link(tmp, _snap_path(table_dir, version))
    except FileExistsError:
        raise ConcurrentCommitError(
            f"version {version} already published under {table_dir}"
        ) from None
    finally:
        os.unlink(tmp)


def snapshot_merge(
    spark: SparkSession,
    table_dir: str,
    updates: DataFrame,
    key: str,
    deletes: DataFrame | None = None,
) -> dict:
    """Row-level MERGE via copy-on-write — the Delta/Iceberg
    ``MERGE INTO`` shape on this snapshot store. ``updates`` holds full
    replacement rows (matched keys are replaced, unmatched keys
    inserted); ``deletes`` (optional, single ``key`` column) removes
    rows. Requires ``key`` to be one of the table's ``stats_cols``.

    The point at 100 TB is what does NOT get rewritten: candidate files
    are selected by a metadata-sized range join of the update/delete
    KEYS against the per-file [min, max] stats (conservative — a file
    is touched iff some key falls inside its bounds, so a false
    positive costs a rewrite, never correctness), every other file is
    carried into the new version VERBATIM. One distributed job reads
    only the touched files, anti-joins the merged keys out, unions the
    update rows in, and writes the replacement files; the publish is
    the same single atomic rename every other commit uses. Returns
    ``{"version", "files_rewritten", "files_carried"}`` so callers can
    assert the pruning actually happened."""
    parent = current_version(table_dir)
    if parent == 0:
        raise ValueError(f"cannot merge into empty table {table_dir}")
    meta = read_snapshot_meta(table_dir, parent)
    stats_cols = meta["stats_cols"]
    if key not in stats_cols:
        raise ValueError(f"merge key {key!r} not in stats_cols {stats_cols}")
    keys = updates.select(F.col(key).alias("_mk"))
    if deletes is not None:
        keys = keys.union(deletes.select(F.col(deletes.columns[0]).alias("_mk")))
    entries = meta["files"]
    mn, mx = f"min_{key}", f"max_{key}"
    # Entries from a commit that didn't collect stats for ``key`` have
    # no min_/max_ entry: force-touch them (a rewrite is the only safe
    # answer when a file MIGHT hold a merged key — same conservative
    # direction as the read-side keep-on-missing rule). Entries whose
    # stats are None hold only NULL keys and can never equi-match a
    # merge key, so they are carried.
    no_stats = {e["path"] for e in entries if mn not in e or mx not in e}
    bounds_rows = [
        (e["path"], e[mn], e[mx])
        for e in entries
        if e["path"] not in no_stats and e[mn] is not None
    ]
    touched_paths = set(no_stats)
    if bounds_rows:
        bounds = spark.createDataFrame(bounds_rows, ["_path", "_mn", "_mx"])
        touched_paths |= {
            r["_path"]
            for r in bounds.join(
                F.broadcast(keys.distinct()),
                (F.col("_mk") >= F.col("_mn")) & (F.col("_mk") <= F.col("_mx")),
                "left_semi",
            ).collect()  # one row per touched FILE — metadata-sized
        }
    carried = [e for e in entries if e["path"] not in touched_paths]
    base = (
        spark.read.parquet(*sorted(touched_paths))
        if touched_paths
        else spark.createDataFrame([], updates.schema)
    )
    merged = base.join(keys.distinct(), base[key] == F.col("_mk"), "left_anti").unionByName(
        updates
    )
    commit_dir = os.path.join(table_dir, "data", uuid.uuid4().hex[:12])
    merged.write.parquet(commit_dir)
    new_entries = _scan_commit_stats(spark, commit_dir, stats_cols)
    # rewritten files get fresh blooms for the snapshot's bloom columns
    # (carried entries keep theirs verbatim) — MERGE must not degrade
    # point-lookup pruning (ADVICE r11)
    bloom_cols = _snapshot_bloom_cols(meta)
    _attach_blooms(spark, commit_dir, new_entries, bloom_cols)
    version = parent + 1
    snap = {
        "version": version,
        "parent": parent,
        "stats_cols": stats_cols,
        "bloom_cols": bloom_cols,
        "merge": True,
        "files": carried + new_entries,
    }
    _carry_fence(snap, meta)
    _publish(table_dir, version, snap)
    return {
        "version": version,
        "files_rewritten": len(touched_paths),
        "files_carried": len(carried),
    }


# --- per-file bloom filters (point-lookup skipping) --------------------

# Defaults size for ~50k distinct values/file at ~1% false positives
# (fill 1-e^(-kn/m) ~= 0.32); at 5k/file FP is negligible. 64 KiB
# packed / ~85 KiB base64 per (file, column) — metadata that a real
# deployment moves to sidecar files (Iceberg puffin) once entry lists
# shard; (m, k) are STORED per entry, so the sizing can change without
# breaking old snapshots' probes.
_BLOOM_M = 524_288
_BLOOM_K = 4

# Engine-portable position hashing requires Spark's CAST(col AS STRING)
# to equal Python's str(value): true for integral and string types,
# FALSE for float/double (Java scientific notation) and boolean
# ('true' vs 'True') — those would produce bloom FALSE NEGATIVES, so
# the build gates on type instead (mirrors json_stat's loud-failure
# philosophy).
_BLOOM_TYPES = ("byte", "short", "integer", "long", "string")


def _bloom_position_cols(col: str, m: int, k: int):
    """The k bit positions of a value, as Spark column expressions:
    position_i = first-8-hex-digits of md5("{i}:" + value-as-string)
    mod m. md5 over the CAST STRING makes the exact same positions
    computable engine-free in Python (hashlib — the driver-side
    membership probe) and in DuckDB (the oracle replays the filter),
    the repo's standard portable-hash trick."""
    return [
        (
            F.conv(
                F.substring(F.md5(F.concat(F.lit(f"{i}:"), F.col(col).cast("string"))), 1, 8),
                16,
                10,
            ).cast("long")
            % m
        ).alias(f"_pos_{i}")
        for i in range(k)
    ]


def bloom_positions(value, m: int, k: int) -> list[int]:
    """Driver-side twin of :func:`_bloom_position_cols` (hashlib)."""
    import hashlib

    return [
        int(hashlib.md5(f"{i}:{value}".encode()).hexdigest()[:8], 16) % m
        for i in range(k)
    ]


def bloom_member(bloom: dict, value) -> bool:
    """Probe a stored per-file bloom entry ({"m", "k", "bits"}): True =
    value MAY be present (false positives possible, false negatives
    impossible for gated column types)."""
    import base64

    bits = base64.b64decode(bloom["bits"])
    return all(
        bits[p >> 3] & (1 << (p & 7))
        for p in bloom_positions(value, bloom["m"], bloom["k"])
    )


def _scan_commit_blooms(
    spark: SparkSession,
    commit_dir: str,
    bloom_cols: list[str],
    m: int = _BLOOM_M,
    k: int = _BLOOM_K,
) -> dict:
    """Per-file bloom bitsets for ALL ``bloom_cols`` in ONE distributed
    pass (r11 review: was one scan per column): k md5 positions per
    (row, column), exploded as (col, pos) pairs, deduplicated per
    (file, col) — the driver receives at most min(k*n_rows, m)
    positions per (file, column) and packs them into base64 bitarrays.
    Returns {path: {col: {"m", "k", "bits"}}}."""
    import base64

    from .layout import decode_file_uri

    df = spark.read.parquet(commit_dir).select(*bloom_cols)
    for f in df.schema.fields:
        if f.dataType.typeName() not in _BLOOM_TYPES:
            raise ValueError(
                f"bloom_cols supports {list(_BLOOM_TYPES)} columns; got "
                f"{f.name}: {f.dataType.typeName()} — float/bool CAST-to-string "
                "differs between engines and would cause false negatives"
            )
    pairs = [
        F.struct(F.lit(col).alias("c"), pos.alias("p"))
        for col in bloom_cols
        for pos in _bloom_position_cols(col, m, k)
    ]
    rows = (
        df.select(F.input_file_name().alias("file"), F.explode(F.array(*pairs)).alias("cp"))
        .groupBy("file", F.col("cp.c").alias("c"))
        .agg(F.collect_set("cp.p").alias("ps"))
        .collect()  # one row per (file, column) — metadata-sized
    )
    out: dict[str, dict] = {}
    for r in rows:
        bits = bytearray(m >> 3)
        for p in r["ps"]:
            bits[p >> 3] |= 1 << (p & 7)
        out.setdefault(decode_file_uri(r["file"]), {})[r["c"]] = {
            "m": m,
            "k": k,
            "bits": base64.b64encode(bytes(bits)).decode(),
        }
    return out


def point_lookup_files(
    table_dir: str, col: str, value, version: int | None = None
) -> tuple[list[dict], int]:
    """Metadata-only point-lookup pruning: keep files whose bloom on
    ``col`` admits ``value`` (files without a bloom are kept —
    conservative, like NULL stats). Returns (kept entries, total)."""
    files = snapshot_files(table_dir, version)
    kept = [
        e
        for e in files
        if f"bloom_{col}" not in e or bloom_member(e[f"bloom_{col}"], value)
    ]
    return kept, len(files)


def read_point_lookup(
    spark: SparkSession, table_dir: str, col: str, value, version: int | None = None
) -> DataFrame:
    """Bloom-pruned point lookup: read only the admitted files, then
    apply the exact predicate (bloom false positives are filtered by
    the residual, never surfaced)."""
    kept, total = point_lookup_files(table_dir, col, value, version)
    if not kept:
        all_files = snapshot_files(table_dir, version)
        if not all_files:
            raise ValueError(f"snapshot has no files under {table_dir}")
        return spark.read.parquet(all_files[0]["path"]).where(F.lit(False))
    return spark.read.parquet(*[e["path"] for e in kept]).where(F.col(col) == F.lit(value))
