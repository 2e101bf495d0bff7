"""Graph analytics over derived edge tables: PageRank.

The other iterative dataflow in the engine besides connected components
(operators/dedup.dedup_clusters). Same scale discipline: each iteration
is ONE keyed shuffle (contributions grouped by destination) joined back
to the node set; rank state is a narrow (node, rank) frame whose
lineage is cut per round with localCheckpoint, so plan depth stays
constant regardless of iteration count. Fixed iteration count (not a
convergence loop) keeps the result deterministic and oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    n_iter: int = 5,
    out: str = "rank",
) -> DataFrame:
    """PageRank with uniform teleport over an unweighted edge list
    (duplicate edges should be de-duplicated by the caller if unit
    weights are intended). Dangling nodes (no out-edges) leak their
    mass — the standard simplification; ranks then sum to <1 but the
    ORDERING, which is what centrality consumers use, is unaffected.

    Node count enters the plan as a literal (one aggregate-only
    ``count()`` up front — same driver-scalar discipline as
    ``dedup_clusters``' convergence check: a count, never data).
    """
    if n_iter < 1:
        raise ValueError("n_iter must be >= 1")
    nodes = (
        edges.select(F.col(src).alias("node"))
        .union(edges.select(F.col(dst).alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n = nodes.count()
    if n == 0:
        # empty graph (e.g. a day with no qualifying edges): empty
        # result, not a ZeroDivisionError from the teleport term
        return nodes.withColumn(out, F.lit(0.0))
    deg = edges.groupBy(src).agg(F.count(F.lit(1)).alias("_d"))
    ed = (
        edges.join(deg, src)
        .select(F.col(src).alias("_es"), F.col(dst).alias("_ed"), "_d")
        .localCheckpoint(eager=False)
    )
    teleport = (1.0 - damping) / n
    ranks = nodes.withColumn(out, F.lit(1.0 / n))
    for _ in range(n_iter):
        contrib = (
            ranks.join(ed, ranks["node"] == ed["_es"])
            .groupBy("_ed")
            .agg(F.sum(F.col(out) * F.lit(damping) / F.col("_d")).alias("_c"))
        )
        ranks = (
            nodes.join(contrib, nodes["node"] == contrib["_ed"], "left")
            .select(
                "node",
                (F.lit(teleport) + F.coalesce(F.col("_c"), F.lit(0.0))).alias(out),
            )
            .localCheckpoint(eager=False)
        )
    return ranks
