#!/usr/bin/env python
"""Full-corpus oracle sweep: run EVERY registered query (both tiers) at
a given SF dir, differentially check each against its DuckDB oracle,
and print one JSON line per query plus a summary line.

This is the end-of-round sweep recorded in SCALE.md, made reproducible.
It releases per-query scratch (localCheckpoint blocks, memory-sink
tables) between queries — the r7 sweep ran without that and measured
triangle_counts_parts at 113-233 s late in the sweep vs 6-7 s fresh,
purely from 130+ queries of accreted storage memory in one JVM.

Usage: python scripts/oracle_sweep.py [sf_dir] [q1,q2,...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from stock_price_prediction_using_stream_and_batch_processing_spark import get_spark, plans


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = (
        sys.argv[2].split(",")
        if len(sys.argv) > 2
        else sorted(plans.all_queries(include_extended=True))
    )
    spark = get_spark(app_name="oracle-sweep")
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))
    from oracle_check import run_check  # noqa: E402 — needs tests/ on path
    from stock_price_prediction_using_stream_and_batch_processing_spark import release_query_scratch

    # Session-accretion instrumentation (r10): every record carries the
    # driver JVM's used heap so a late-sweep slowdown can be correlated
    # with (or exonerated from) heap growth; SWEEP_GC_EVERY=N adds an
    # explicit driver System.gc() every N queries — the ContextCleaner
    # only reclaims broadcast/shuffle state after a driver GC notices
    # the references died, and an 8 GB heap can go a very long time
    # between natural old-gen collections.
    jvm_rt = spark.sparkContext._jvm.java.lang.Runtime.getRuntime()
    gc_every = int(os.environ.get("SWEEP_GC_EVERY", "0"))

    def used_heap_mb() -> int:
        return int((jvm_rt.totalMemory() - jvm_rt.freeMemory()) / 1048576)

    t_all = time.time()
    n_pass = n_rows_only = n_fail = 0
    slow: list[tuple[str, float]] = []
    for i, name in enumerate(names):
        if gc_every and i and i % gc_every == 0:
            spark.sparkContext._jvm.java.lang.System.gc()
        t0 = time.time()
        try:
            problems, spark_s, oracle_s = run_check(spark, name, sf_dir, timed=True)
            el = round(time.time() - t0, 2)
            oracle = plans.get(name).oracle is not None
            status = "FAIL" if problems else ("PASS" if oracle else "ROWS_ONLY")
            if problems:
                n_fail += 1
            elif oracle:
                n_pass += 1
            else:
                n_rows_only += 1
            rec = {
                "q": name,
                "status": status,
                "s": el,
                "spark_s": round(spark_s, 2),
                "oracle_s": round(oracle_s, 2),
                "heap_mb": used_heap_mb(),
            }
            if problems:
                rec["problems"] = problems[:3]
        except Exception as exc:  # noqa: BLE001 — record and continue
            el = round(time.time() - t0, 2)
            n_fail += 1
            rec = {"q": name, "status": "ERROR", "s": el, "err": f"{type(exc).__name__}: {exc}"[:300]}
            # run_check releases scratch right after toPandas; an
            # exception before that skips it, so release here or the
            # erroring query's checkpoint blocks leak into the rest of
            # the sweep (ADVICE r8).
            release_query_scratch(spark)
        slow.append((name, el))
        print(json.dumps(rec), flush=True)
    slow.sort(key=lambda kv: -kv[1])
    print(
        json.dumps(
            {
                "summary": True,
                "sf_dir": sf_dir,
                "n": len(names),
                "pass": n_pass,
                "rows_only": n_rows_only,
                "fail": n_fail,
                "total_s": round(time.time() - t_all, 1),
                "slowest": [{"q": q, "s": s} for q, s in slow[:8]],
            }
        )
    )


if __name__ == "__main__":
    main()
