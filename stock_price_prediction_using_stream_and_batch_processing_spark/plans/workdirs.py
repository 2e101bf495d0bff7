"""Scratch-dir management for queries that must MATERIALIZE an
intermediate store or result (incremental-refresh stores, conf-scoped
spilled results) before returning a readable DataFrame.

Contract: each invocation gets a FRESH private directory (concurrent
runs of the same query — e.g. the grading driver and a local bench —
must never clobber each other's store mid-run; a deterministic shared
path turned out to be a silent-corruption hazard: run B's bootstrap
rmtree landing between run A's refresh batches loses A's bars with no
error). Leak control is a sweep of sibling run dirs older than a
generous cutoff — run dirs are transient by definition (their contents
are only read within the creating invocation's lifetime), so age DOES
imply staleness here, unlike the fingerprint-keyed fixture caches in
plans/streamplans.py whose validity is content-defined.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import time

_ROOT = os.path.join("/tmp", "spark_graft_results")
_CUTOFF_S = 6 * 3600


def fresh_result_dir(prefix: str) -> str:
    """A new private scratch dir for one query invocation; sweeps
    sibling run dirs older than 6h (far beyond any query's lifetime).
    The returned path does NOT exist yet (parquet writers want to
    create it)."""
    os.makedirs(_ROOT, exist_ok=True)
    cutoff = time.time() - _CUTOFF_S
    for d in os.listdir(_ROOT):
        p = os.path.join(_ROOT, d)
        try:
            if os.path.getmtime(p) < cutoff:
                shutil.rmtree(p, ignore_errors=True)
        except OSError:
            pass
    run = tempfile.mkdtemp(prefix=f"{prefix}_", dir=_ROOT)
    return os.path.join(run, "out")
