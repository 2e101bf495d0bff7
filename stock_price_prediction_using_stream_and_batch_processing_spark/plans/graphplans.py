"""Graph-analytics query corpus: PageRank over the customer→supplier
purchase graph derived from orders⋈lineitem (operators/graph.py).

The oracle runs the identical fixed-iteration computation as a DuckDB
recursive CTE — per iteration, contribution rows plus a zero row per
node (so isolated-in-degree nodes persist) are re-aggregated; the
teleport term is added OUTSIDE the sum exactly as the Spark operator
does, keeping the doubles aligned to well under the rounding grid.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators import graph
from ..sources.tables import load_table
from .core import register

_ITER = 5


@register(
    "pagerank_customer_supplier",
    oracle=f"""
    WITH RECURSIVE
    e AS (
      SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS src,
                      's' || CAST(l_suppkey AS VARCHAR) AS dst
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ),
    nodes AS (
      -- explicit DISTINCT: inside WITH RECURSIVE DuckDB gives UNION
      -- recursive-union semantics and does NOT dedup this shape
      SELECT DISTINCT node FROM (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)
    ),
    nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
    deg AS (SELECT src, CAST(COUNT(*) AS DOUBLE) AS d FROM e GROUP BY src),
    pr AS (
      SELECT 0 AS it, node, CAST(1.0 AS DOUBLE) / nn.n AS rank
      FROM nodes CROSS JOIN nn
      UNION ALL
      SELECT it, node,
             (CAST(1.0 AS DOUBLE) - 0.85) / ANY_VALUE(nn2.n) + SUM(v) AS rank
      FROM (
        SELECT pr.it + 1 AS it, e.dst AS node,
               CAST(0.85 AS DOUBLE) * pr.rank / deg.d AS v
        FROM pr JOIN e ON pr.node = e.src JOIN deg ON deg.src = e.src
        WHERE pr.it < {_ITER}
        UNION ALL
        SELECT pr.it + 1, pr.node, CAST(0.0 AS DOUBLE) FROM pr WHERE pr.it < {_ITER}
      ) CROSS JOIN nn nn2
      GROUP BY it, node
    )
    SELECT node, ROUND(rank, 9) AS rank FROM pr WHERE it = {_ITER}
    """,
    tags=("graph", "pagerank", "iterative"),
)
def pagerank_customer_supplier(spark, sf_dir):
    """Supplier/customer centrality: 5 PageRank iterations (damping
    0.85) over the distinct customer→supplier purchase edges. Node ids
    are prefixed ('c'/'s') because the key spaces overlap numerically.
    One shuffle per iteration; constant plan depth via per-round
    localCheckpoint (operators/graph.pagerank)."""
    od = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    edges = (
        li.join(od, li["l_orderkey"] == od["o_orderkey"])
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
        )
        .distinct()
    )
    out = graph.pagerank(edges, damping=0.85, n_iter=_ITER)
    return out.select("node", F.round("rank", 9).alias("rank"))
