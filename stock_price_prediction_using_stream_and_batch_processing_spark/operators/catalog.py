"""Multi-table ATOMIC transactions via a catalog pointer — the level
above per-table snapshots (Nessie / Iceberg-REST-catalog semantics):
a CATALOG VERSION maps table names to pinned snapshot versions, and
readers who resolve through the catalog see a CONSISTENT cross-table
set — all of a transaction's table updates or none.

Model:

- ``<catalog>/catalog/v{N:08d}.json`` — ``{"tables": {name:
  {"dir": ..., "version": v}}, "parent": N-1}``, published with the
  same atomic exclusive-link first-writer-wins primitive table
  snapshots use.
- A TRANSACTION commits each touched table individually (each commit
  is already atomic and invisible to pinned readers), then publishes
  ONE catalog version referencing the new table versions. The catalog
  pointer is the authoritative read path — exactly the
  catalog-as-source-of-truth contract Iceberg's REST catalog and
  Nessie define; direct per-table "current version" reads are outside
  the consistency contract (they see each table's own line, which is
  valid but not cross-table-consistent).
- Crash between table commits and catalog publish: the new table
  versions exist but NO catalog version references them — catalog
  readers are unaffected (the transaction simply never happened for
  them), and the orphan versions are the aborted-commit class.
- Concurrent transactions REBASE when they touch disjoint table sets
  (their updates commute at the catalog level) and REFUSE on overlap
  — the caller must re-read and re-run, the same validation split the
  table-level optimistic protocol makes for rewrites.

Scale: a catalog version is O(tables) JSON; transactions add zero
data-path cost over their underlying table commits.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

from .snapshots import (
    ConcurrentCommitError,
    current_version,
    read_snapshot,
)

_CAT_FMT = "v{:08d}.json"


def _cat_dir(catalog_dir: str) -> str:
    return os.path.join(catalog_dir, "catalog")


def _cat_path(catalog_dir: str, version: int) -> str:
    return os.path.join(_cat_dir(catalog_dir), _CAT_FMT.format(version))


def catalog_version(catalog_dir: str) -> int:
    d = _cat_dir(catalog_dir)
    if not os.path.isdir(d):
        return 0
    vs = [
        int(n[1:9])
        for n in os.listdir(d)
        if n.startswith("v") and n.endswith(".json") and n[1:9].isdigit()
    ]
    return max(vs, default=0)


def read_catalog_meta(catalog_dir: str, version: int | None = None) -> dict:
    v = catalog_version(catalog_dir) if version is None else version
    if v == 0:
        return {"tables": {}, "parent": 0}
    with open(_cat_path(catalog_dir, v)) as f:
        return json.load(f)


def catalog_publish(
    catalog_dir: str,
    updates: dict,
    base_pins: dict | None = None,
    max_attempts: int = 50,
    fences: dict | None = None,
) -> int:
    """Publish catalog version pinning ``updates`` ({table_name:
    {"dir": ..., "version": v}}) on top of the current mapping.
    Rebases over concurrent catalog commits touching DISJOINT tables;
    refuses (ConcurrentCommitError) when a concurrent commit moved one
    of THIS transaction's tables past ``base_pins`` (the versions the
    transaction saw when it FIRST touched each table) — the txn read
    stale state and must re-run. Without ``base_pins`` the check
    degrades to publish-time pins (last-writer-wins on the mapping).

    ``fences``: optional {writer_id: batch_id} map merged into the
    catalog snapshot's ``last_batches`` — the CATALOG-level epoch fence
    (r16). A multi-table transaction that advances a writer's fence
    atomically with its pins gives nightly jobs exactly-once across
    ALL the tables the transaction touches, with the catalog version
    as the single commit point (the per-table ``last_batches`` twin,
    one level up)."""
    if base_pins is None:
        base = read_catalog_meta(catalog_dir)
        base_pins = {t: rec["version"] for t, rec in base["tables"].items()}
    for _ in range(max_attempts):
        parent = catalog_version(catalog_dir)
        meta = read_catalog_meta(catalog_dir, parent)
        for t in updates:
            cur_pin = meta["tables"].get(t, {}).get("version")
            if cur_pin != base_pins.get(t):
                raise ConcurrentCommitError(
                    f"catalog table {t!r} moved from pin {base_pins.get(t)} to "
                    f"{cur_pin} during the transaction; re-read and re-run"
                )
        snap = {
            "tables": {**meta["tables"], **updates},
            "parent": parent,
        }
        merged_fences = dict(meta.get("last_batches") or {})
        if fences:
            merged_fences.update(fences)
        if merged_fences:
            snap["last_batches"] = merged_fences
        try:
            os.makedirs(_cat_dir(catalog_dir), exist_ok=True)
            _publish_cat(catalog_dir, parent + 1, snap)
            return parent + 1
        except ConcurrentCommitError:
            continue
    raise ConcurrentCommitError(
        f"could not win a catalog publish in {max_attempts} attempts"
    )


def _publish_cat(catalog_dir: str, version: int, snap: dict) -> None:
    import time

    from .snapshots import link_publish_json

    snap.setdefault("committed_at", time.time())
    link_publish_json(
        _cat_dir(catalog_dir),
        _cat_path(catalog_dir, version),
        snap,
        f"catalog version {version} already published",
    )


class CatalogTransaction:
    """Stage appends to several tables, then land them as ONE catalog
    version::

        txn = CatalogTransaction(catalog_dir)
        txn.append(spark, "facts", facts_dir, df1, stats_cols=["k"])
        txn.append(spark, "summary", summary_dir, df2, stats_cols=["k"])
        v = txn.commit()          # catalog readers see both or neither

    Appends stage on a PER-TRANSACTION BRANCH of each table
    (operators/refs.py) — the table's main line does not move, so an
    aborted or crashed transaction leaves NOTHING a later transaction
    can chain on (the r12 self-review found the head-chaining version
    exposed aborted rows through the next commit). ``commit`` then (1)
    re-validates the catalog pins recorded when the transaction first
    touched each table, (2) fast-forwards each branch onto its table's
    main line, (3) publishes one catalog version. A crash inside
    commit — after some branch published, before the catalog did —
    leaves that table's head PAST its catalog pin; the next
    transaction touching it REFUSES LOUDLY (divergence check) until an
    operator reconciles (roll the table back to the pin, or pin() the
    head), instead of silently adopting the half-committed rows.
    Consequently: once a table is catalog-managed, all writes go
    through transactions — a direct snapshot_append trips the same
    divergence refusal by design."""

    def __init__(self, catalog_dir: str) -> None:
        import uuid as _uuid

        self.catalog_dir = catalog_dir
        self.txn_id = _uuid.uuid4().hex[:12]
        self.updates: dict = {}
        self.base_pins: dict = {}
        self._branches: dict = {}

    def _record_base(self, name: str, table_dir: str, writing: bool) -> None:
        if name in self.base_pins:
            return
        cur = read_catalog_meta(self.catalog_dir)["tables"].get(name)
        pin = cur["version"] if cur else None
        if writing and pin is not None:
            head = current_version(table_dir)
            if head != pin:
                raise ValueError(
                    f"table {name!r} head v{head} diverged from its catalog "
                    f"pin v{pin} (a transaction crashed mid-commit, or the "
                    "table was written outside the catalog); reconcile — "
                    "snapshot_rollback to the pin, or pin() the head — "
                    "before writing through a transaction"
                )
        self.base_pins[name] = pin

    def append(
        self,
        spark: SparkSession,
        name: str,
        table_dir: str,
        df: DataFrame,
        **kw,
    ) -> int:
        from . import refs

        self._record_base(name, table_dir, writing=True)
        if name not in self._branches:
            bname = f"txn-{self.txn_id}"
            refs.branch_create(table_dir, bname)
            self._branches[name] = bname
        self._spark = spark
        v = refs.branch_append(spark, table_dir, self._branches[name], df, **kw)
        self.updates[name] = {"dir": table_dir, "branch": self._branches[name]}
        return v

    def pin(self, name: str, table_dir: str, version: int | None = None) -> None:
        """Include a table at an explicit version (e.g. registering an
        existing table into the catalog) without writing to it."""
        self._record_base(name, table_dir, writing=False)
        v = current_version(table_dir) if version is None else version
        self.updates[name] = {"dir": table_dir, "version": v}

    def abort(self) -> None:
        """Drop the transaction's staged branches; main lines and the
        catalog were never touched."""
        from . import refs

        for name, rec in self.updates.items():
            if "branch" in rec:
                refs.branch_drop(rec["dir"], rec["branch"])
        self.updates = {}
        self.base_pins = {}
        self._branches = {}

    def commit(self, fences: dict | None = None) -> int:
        from . import refs

        if not self.updates:
            raise ValueError("empty transaction: nothing staged")
        # early conflict detection BEFORE any branch publishes: a lost
        # race here costs nothing (branches just drop)
        meta = read_catalog_meta(self.catalog_dir)
        for t in self.updates:
            cur_pin = meta["tables"].get(t, {}).get("version")
            if cur_pin != self.base_pins.get(t):
                raise ConcurrentCommitError(
                    f"catalog table {t!r} moved from pin {self.base_pins.get(t)} "
                    f"to {cur_pin} during the transaction; abort and re-run"
                )
        final = {}
        for name, rec in self.updates.items():
            if "branch" in rec:
                v = refs.branch_publish(
                    rec["dir"], rec["branch"], drop=True,
                    spark=getattr(self, "_spark", None),
                )
                final[name] = {"dir": rec["dir"], "version": v}
            else:
                final[name] = rec
        v = catalog_publish(self.catalog_dir, final, self.base_pins, fences=fences)
        self.updates = {}
        self.base_pins = {}
        self._branches = {}
        return v


def catalog_read(
    spark: SparkSession,
    catalog_dir: str,
    name: str,
    catalog_version_: int | None = None,
    **kw,
) -> DataFrame:
    """Read table ``name`` at the snapshot the catalog version pins —
    the consistent-read path. A catalog version held across several
    reads yields a cross-table-consistent view regardless of
    concurrent transactions."""
    meta = read_catalog_meta(catalog_dir, catalog_version_)
    if name not in meta["tables"]:
        raise ValueError(
            f"table {name!r} not in catalog version "
            f"{catalog_version_ if catalog_version_ is not None else catalog_version(catalog_dir)}"
        )
    rec = meta["tables"][name]
    return read_snapshot(spark, rec["dir"], rec["version"], **kw)


def catalog_tables(catalog_dir: str, version: int | None = None) -> dict:
    """{name: pinned snapshot version} of a catalog version."""
    return {
        t: rec["version"]
        for t, rec in read_catalog_meta(catalog_dir, version)["tables"].items()
    }
