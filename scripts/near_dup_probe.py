#!/usr/bin/env python
"""Bound probe for near_dup_filter (VERDICT r4 item 3): does the
pipeline's candidate count stay O(corpus) under adversarial exact-copy
load once dedup-first ordering (now the operator default) is applied?

Corpus shapes probed, all derived from sf0.1 documents (~6k docs):
  1x        — the base corpus.
  10x       — every doc replicated 10x with fresh ids (the scale_probe
              growth shape: 10-member exact-copy families for EVERY
              doc — the shape that made r4's probe read 4.1x).
  10x+mega  — 10x plus ONE planted 5,000-copy family (license-header /
              boilerplate adversary; uncollapsed it alone contributes
              ~12.5M candidate pairs from every band).

For each shape: wall time of the full near_dup_filter, with
dedup_exact_first on (default) vs off, plus the LSH candidate-pair
count each ordering feeds to the Jaccard verifier. Off-path runs are
skipped at the sizes where the quadratic blowup makes them pointless
to wait for (the point of the probe is the bound, not the crater).

Usage: python scripts/near_dup_probe.py [mega_copies]
Writes markdown to stdout.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from stock_price_prediction_using_stream_and_batch_processing_spark import get_spark
from stock_price_prediction_using_stream_and_batch_processing_spark.operators import dedup
from stock_price_prediction_using_stream_and_batch_processing_spark.sources.tables import load_table

BASE = "/root/testdata/sf0.1"


def replicate(df, factor: int, id_offset_step: int = 100_000_000):
    copies = [
        df.withColumn("doc_id", F.col("doc_id") + F.lit(i * id_offset_step))
        for i in range(factor)
    ]
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    return out


def mega_family(spark, df, copies: int):
    one = df.orderBy("doc_id").limit(1)
    ids = spark.range(copies).select(
        (F.col("id") + F.lit(900_000_000_000)).alias("new_id")
    )
    return ids.crossJoin(F.broadcast(one)).select(
        F.col("new_id").alias("doc_id"),
        *[c for c in df.columns if c != "doc_id"],
    )


def collapse_reps(d):
    """The dedup-first pre-stage — the SHIPPED one, so the probe stays
    in lockstep with the operator."""
    return dedup.exact_rep_collapse(d, "text", "doc_id")


def candidates_count(d) -> int:
    return dedup.minhash_lsh_pairs(d, "text", "doc_id", num_hashes=8, bands=4).count()


def run_filter(d, dedup_first: bool) -> tuple[float, int]:
    t0 = time.time()
    n = dedup.near_dup_filter(
        d, "text", "doc_id", num_hashes=8, bands=4, dedup_exact_first=dedup_first
    ).count()
    return time.time() - t0, n


def main() -> None:
    mega = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000
    spark = get_spark(app_name="near-dup-probe")
    spark.sparkContext.setLogLevel("ERROR")
    base = load_table(spark, BASE, "documents").localCheckpoint()
    n_base = base.count()
    shapes = {
        "1x": base,
        "10x": replicate(base, 10).localCheckpoint(),
        f"10x+mega{mega}": replicate(base, 10)
        .unionByName(mega_family(spark, base, mega))
        .localCheckpoint(),
    }
    print(f"base corpus: {n_base} docs; mega family: {mega} copies of one doc\n")
    print("| shape | docs | cands (dedup-first) | cands (raw LSH) | filter s (dedup-first) | survivors | filter s (off) |")
    print("|---|---|---|---|---|---|---|")
    rows = []
    for name, d in shapes.items():
        n_docs = d.count()
        cand_first = candidates_count(collapse_reps(d))
        # raw candidate count: only measurable where it isn't quadratic
        cand_raw = candidates_count(d) if name == "1x" else None
        t_on, surv = run_filter(d, True)
        t_off = run_filter(d, False)[0] if name == "1x" else None
        rows.append((name, n_docs, cand_first, cand_raw, t_on, surv, t_off))
        fmt = lambda v: f"{v:.2f}" if isinstance(v, float) else ("—" if v is None else str(v))
        print(
            f"| {name} | {n_docs} | {cand_first} | {fmt(cand_raw)} | {fmt(t_on)} | {surv} | {fmt(t_off)} |"
        )
    base_t = rows[0][4]
    for name, n_docs, cand, _, t_on, _, _ in rows[1:]:
        print(
            f"\n{name}: wall ratio {t_on / base_t:.1f}x at {n_docs / n_base:.1f}x docs; "
            f"candidates {cand} (vs {rows[0][2]} at 1x — "
            f"{cand / max(rows[0][2], 1):.2f}x, O(corpus) bound holds if ~1x)"
        )


if __name__ == "__main__":
    main()


def probe_hard_negative_cap(spark) -> None:
    """Round-6: the hard-negative query's single-hash bands are the
    most boilerplate-sensitive banding — every doc whose argmin shingle
    belongs to a shared template lands in ONE bucket. Plant a
    5,000-copy boilerplate family into the sf0.1 corpus and measure
    candidate volume with and without the registered cap (64)."""
    import time

    from pyspark.sql import functions as F

    from stock_price_prediction_using_stream_and_batch_processing_spark.operators import dedup
    from stock_price_prediction_using_stream_and_batch_processing_spark.sources.tables import (
        load_table,
    )

    d = load_table(spark, "/root/testdata/sf0.1", "documents").select("doc_id", "text")
    boiler = spark.range(5_000).select(
        (F.col("id") + 1_000_000).alias("doc_id"),
        F.concat(
            F.lit("standard license header all rights reserved redistribution permitted "
                  "under the terms of the agreement see attached notice for details copy "),
            (F.col("id") % 7).cast("string"),  # 7 variants -> near-identical family
        ).alias("text"),
    )
    corpus = d.unionByName(boiler).localCheckpoint()
    print("\n### hard_negative_pairs: planted 5k-doc boilerplate family (sf0.1 + 5000)\n")
    print("| cap | candidate pairs | wall (s) |")
    print("|---|---|---|")
    for cap in (None, 64):
        t0 = time.time()
        n = dedup.minhash_lsh_pairs(
            corpus, "text", "doc_id", num_hashes=4, bands=4, max_bucket_size=cap
        ).count()
        print(f"| {cap} | {n:,} | {time.time() - t0:.1f} |", flush=True)
