#!/usr/bin/env python
"""Skew-join probe (round 7): plant a power-law key in a
join_orders_customer_segment-shaped shuffle join and measure where
AQE's runtime skew split starts to matter — the knee every
shuffle-join query in the corpus silently relies on.

Shape: 8M-row fact, 15k-row dim (broadcast disabled to force the
sort-merge shuffle join — at real scale the dim side of a skewed join
is often too big to broadcast, which is exactly when skew bites), one
custkey holding hot_share of all fact rows. Three physical strategies
per hot share:

- skew-split ON (production default): AQE splits the hot partition at
  runtime; plan shows SortMergeJoin(skew=true).
- skew-split OFF: the hot partition funnels one reducer — the failure
  mode.
- salted fallback (operators/skew.salted_join_big_hot): the static
  mitigation for plans where AQE can't apply (e.g. the join feeds a
  co-partitioned window).

Skew thresholds are left at production defaults EXCEPT
skewedPartitionThresholdInBytes lowered to 8MB so an 8M-row local
probe trips the same code path a 100 TB partition would (the default
256MB floor is a cluster-scale constant, not part of the algorithm).

Usage: python scripts/skew_join_probe.py
Writes markdown to stdout (findings land in SCALE.md).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from stock_price_prediction_using_stream_and_batch_processing_spark import get_spark
from stock_price_prediction_using_stream_and_batch_processing_spark.operators import skew

N_FACT = 8_000_000
N_DIM = 15_000
HOT_KEY = 7


def build(spark, hot_share: float, work: str):
    """Materialize the fact to parquet so the timed joins measure the
    SHUFFLE+JOIN, not 8M rows of expression generation (the first probe
    draft re-generated the fact per run and the scan swamped the
    reducer-skew signal)."""
    hot_mod = int(hot_share * 100)
    path = f"{work}/fact_{hot_mod}"
    # v/pad are incompressible (rand + md5) ON PURPOSE: AQE's skew
    # detection reads MapStatus sizes, which are COMPRESSED shuffle
    # bytes — a hot partition whose key column is one constant and whose
    # payload is cyclic compresses ~3x better than its neighbors, and a
    # 9x row skew shows up as <5x byte skew, UNDER the default
    # skewedPartitionFactor (measured: the first probe draft's
    # pmod-payload never fired at factor 5.0; the same shape with
    # incompressible payload fires). Real fact rows carry entropy, so
    # the incompressible shape is the representative one — but the
    # compressible miss is a real production caveat, recorded in
    # SCALE.md.
    spark.range(N_FACT).select(
        F.col("id"),
        F.when(F.pmod(F.col("id"), F.lit(100)) < hot_mod, F.lit(HOT_KEY))
        .otherwise(F.pmod(F.col("id"), F.lit(N_DIM)))
        .alias("custkey"),
        F.rand(42).alias("v"),
        F.md5(F.col("id").cast("string")).alias("pad"),
    ).write.mode("overwrite").parquet(path)
    fact = spark.read.parquet(path)
    dim = spark.range(N_DIM).select(
        F.col("id").alias("custkey"),
        F.concat(F.lit("seg"), F.pmod(F.col("id"), F.lit(5))).alias("segment"),
    )
    return fact, dim


def timed_with_plan(df) -> tuple[float, str]:
    """collect() finalizes the adaptive plan on THIS DataFrame's
    QueryExecution (a write would execute a separate one), so the
    returned plan string shows whether skew=true actually fired."""
    t0 = time.time()
    df.collect()  # aggregate output is 5 rows — collect cost is nil
    return time.time() - t0, df._jdf.queryExecution().executedPlan().toString()


def main() -> None:
    spark = get_spark(app_name="skew_probe", master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]",
                      shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8MB")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4MB")
    # default skewedPartitionFactor=5.0 kept: the knee measured below is
    # the production trigger point, not a doctored one
    import shutil
    import tempfile

    work = tempfile.mkdtemp(prefix="skew_probe_")
    print(f"### AQE skew-split knee: {N_FACT // 1_000_000}M-row parquet fact ⋈ {N_DIM // 1000}k-row dim, "
          "sort-merge forced, 8 shuffle partitions\n")
    print("| hot share | skew-split ON (s) | split fired? | skew-split OFF (s) | salted n=16 (s) |")
    print("|---|---|---|---|---|")
    try:
        for hot_share in (0.0, 0.1, 0.3, 0.5):
            fact, dim = build(spark, hot_share, work)
            joined = lambda: fact.join(dim, "custkey").groupBy("segment").agg(  # noqa: E731
                F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
            spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
            timed_with_plan(joined())  # warm
            runs = [timed_with_plan(joined()) for _ in range(2)]
            t_on = min(t for t, _ in runs)
            fired = any("skew=true" in p for _, p in runs)
            spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
            t_off = min(timed_with_plan(joined())[0] for _ in range(2))
            spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
            salted = lambda: skew.salted_join_big_hot(fact, dim, "custkey", "id", n_salts=16)  # noqa: E731
            t_salt = min(timed_with_plan(salted().groupBy("segment").agg(
                F.sum("v").alias("s"), F.count(F.lit(1)).alias("n")))[0] for _ in range(2))
            print(f"| {hot_share:.0%} | {t_on:.2f} | {'yes' if fired else 'no'} | {t_off:.2f} | {t_salt:.2f} |")
    finally:
        shutil.rmtree(work, ignore_errors=True)
    print()


if __name__ == "__main__":
    main()
