#!/usr/bin/env python
"""r16 optimization profiler: run named queries with per-operator wall
timers (monkeypatched around the snapshot/dedup machinery) so each heavy
face's seconds are attributable to phases, per the guide's "measure
first" rule. Usage:

    python scripts/profile_r16.py <query> [<query> ...] [--sf DIR]

Prints a JSON object per query: total seconds + per-patched-callable
(count, total_s). Not part of the bench contract; diagnostic only.
"""

from __future__ import annotations

import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from stock_price_prediction_using_stream_and_batch_processing_spark import (
    get_spark,
    plans,
    release_query_scratch,
)

ACC: dict[str, list[float]] = defaultdict(lambda: [0, 0.0])
# NOTE: nested patched calls are counted in BOTH records (e.g.
# _scan_commit_stats seconds are inside snapshot_append seconds) —
# read the output as a call tree, not a partition.


def wrap(mod, name, label=None):
    fn = getattr(mod, name)
    lbl = label or f"{mod.__name__.split('.')[-1]}.{name}"

    def inner(*a, **kw):
        t0 = time.time()
        try:
            return fn(*a, **kw)
        finally:
            rec = ACC[lbl]
            rec[0] += 1
            rec[1] += time.time() - t0

    setattr(mod, name, inner)
    return fn


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="profile_r16")

    from stock_price_prediction_using_stream_and_batch_processing_spark.operators import (
        catalog,
        dedup,
        layout,
        refs,
        similarity,
        snapshots,
    )

    originals = []
    for mod, names in (
        (snapshots, [
            "snapshot_append", "snapshot_merge", "snapshot_delete",
            "snapshot_compact", "read_snapshot", "_scan_commit_stats",
            "_write_commit_files", "snapshot_analyze",
            "snapshot_position_delete", "snapshot_update",
        ]),
        (layout, ["file_minmax_manifest"]),
        (dedup, [
            "minhash_signatures", "minhash_lsh_pairs", "resolve_components",
            "dedup_clusters", "incremental_near_dup", "near_dup_filter",
        ]),
        (similarity, ["ivf_build", "semantic_dedup", "brute_force_topk"]),
        (catalog, ["catalog_publish"]),
        (refs, ["branch_append", "branch_publish", "read_branch"]),
    ):
        for n in names:
            if hasattr(mod, n):
                originals.append((mod, n, wrap(mod, n)))

    # warm the tables once (mirror bench warmup)
    from stock_price_prediction_using_stream_and_batch_processing_spark.sources.tables import TABLES, load_table

    for t in TABLES:
        load_table(spark, sf_dir, t).count()

    for qname in args:
        q = plans.get(qname)
        # untimed warmup
        q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        release_query_scratch(spark)
        ACC.clear()
        spark.sparkContext.setJobDescription(f"profile:{qname}")
        t0 = time.time()
        q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        total = time.time() - t0
        release_query_scratch(spark)
        print(json.dumps({
            "query": qname,
            "total_s": round(total, 3),
            "phases": {
                k: {"n": v[0], "s": round(v[1], 3)}
                for k, v in sorted(ACC.items(), key=lambda x: -x[1][1])
            },
        }, indent=1))


if __name__ == "__main__":
    main()
