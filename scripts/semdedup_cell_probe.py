#!/usr/bin/env python
"""SemDeDup cell-count scaling probe (VERDICT r14 ask #5).

The 100-TB argument for `semantic_dedup` is that the quadratic term is
PER CELL. This probe measures what each cell-count policy actually
does to the candidate-pair volume as the corpus grows 1x -> 4x -> 16x:

- `sqrt` policy (the SemDeDup paper heuristic, n_cells ~ sqrt(N)):
  per-cell SIZE grows as sqrt(N), so per-cell candidate pairs grow
  ~LINEARLY in N and total pairs ~N^1.5 — sub-quadratic, but not flat.
- `const-size` policy (n_cells ~ N / target_cell_size, the IVF
  practice): per-cell size is pinned, per-cell pairs are FLAT, total
  pairs grow ~linearly (N * cell_size / 2).

Both are measured from the REAL quantizer (MLlib k-means fit on a
bounded sample + literal-folded assignment), not the balanced-cell
ideal: k-means cells on real data are skewed, so the probe reports the
max/mean cell size and the exact candidate-pair sum Σ n_c·(n_c−1)/2
from the assignment histogram (the pair join's size is a pure function
of that histogram — no need to run the join to know its cost).

It also records the literal-folding ceiling: `nearest_cell_expr`
carries k×dim literals in the plan, so assignment wall is measured
per policy — the point where n_cells makes expression assembly the
bottleneck is the point where assignment must switch to a broadcast
matrix (documented in the operator docstring).

Usage: python scripts/semdedup_cell_probe.py
Writes markdown to stdout (findings land in SCALE.md).
"""

from __future__ import annotations

import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from stock_price_prediction_using_stream_and_batch_processing_spark import get_spark
from stock_price_prediction_using_stream_and_batch_processing_spark.operators.similarity import ivf_build

DIM = 16
BASE_N = 20_000
FIT_SAMPLE_MAX = 40_000  # fit the quantizer on a bounded sample, the 100-TB posture


def synth_vectors(spark, n: int):
    """Deterministic clustered vectors: 64 latent gaussian centers +
    noise, so k-means finds real structure and cells skew like real
    embedding corpora (a uniform cloud would flatter the policies)."""
    rng = np.random.RandomState(7)
    centers = rng.normal(size=(64, DIM)) * 3.0
    # per-row: pick a center by a zipf-ish skewed distribution
    return (
        spark.range(n)
        .withColumn("_c", (F.pow(F.rand(11), F.lit(2.5)) * 64).cast("int"))
        .withColumn(
            "embedding",
            F.expr(
                "transform(sequence(1, {d}), i -> cast(element_at({cent}, _c + 1)[i - 1] as double) + (rand(13) - 0.5))".format(
                    d=DIM,
                    cent="array({})".format(
                        ",".join(
                            "array({})".format(",".join(f"{v:.6f}" for v in c))
                            for c in centers
                        )
                    ),
                )
            ),
        )
        .select(F.col("id").alias("vec_id"), "embedding")
    )


def probe(spark) -> None:
    print("### SemDeDup cell-count policies: candidate-pair volume vs corpus size\n")
    print("| policy | N | n_cells | fit (s) | assign+hist (s) | mean cell | max cell | cand. pairs | pairs/N | per-cell pairs (mean) |")
    print("|---|---|---|---|---|---|---|---|---|---|")
    for scale in (1, 4, 16):
        n = BASE_N * scale
        corpus = synth_vectors(spark, n).localCheckpoint(eager=True)
        for policy, cells in (
            ("sqrt", int(round(math.sqrt(n)))),
            ("const-size-500", max(8, n // 500)),
        ):
            t0 = time.time()
            frac = min(1.0, FIT_SAMPLE_MAX / n)
            assigned, _ = ivf_build(
                corpus, DIM, cells, sample_fraction=frac
            )
            t_fit = time.time() - t0
            t1 = time.time()
            hist = (
                assigned.groupBy("_cell").count().select("count").toPandas()["count"]
            )
            t_hist = time.time() - t1
            pairs = int((hist * (hist - 1) // 2).sum())
            print(
                f"| {policy} | {n} | {cells} | {t_fit:.1f} | {t_hist:.1f} "
                f"| {hist.mean():.0f} | {hist.max()} | {pairs} "
                f"| {pairs / n:.1f} | {pairs / cells:.0f} |"
            )
        corpus.unpersist()


if __name__ == "__main__":
    spark = get_spark(app_name="semdedup_cell_probe")
    probe(spark)
    spark.stop()
