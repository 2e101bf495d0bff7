"""PageRank operator mechanics on constructed graphs (the corpus-level
differential check is pagerank_customer_supplier in
test_queries_oracle.py)."""

from __future__ import annotations

import collections

import pytest

from stock_price_prediction_using_stream_and_batch_processing_spark.operators import graph


def _py_pagerank(edges, damping=0.85, n_iter=5):
    nodes = {u for e in edges for u in e}
    deg = collections.Counter(s for s, _ in edges)
    n = len(nodes)
    rank = {u: 1.0 / n for u in nodes}
    for _ in range(n_iter):
        new = {u: (1.0 - damping) / n for u in nodes}
        for s, d in edges:
            new[d] += damping * rank[s] / deg[s]
        rank = new
    return rank


@pytest.mark.parametrize("n_iter", [1, 5])
def test_pagerank_equals_python(spark, n_iter):
    edges = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 1), (5, 1)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["rank"] for r in graph.pagerank(df, n_iter=n_iter).collect()}
    want = _py_pagerank(edges, n_iter=n_iter)
    assert set(got) == set(want)
    for u in want:
        assert abs(got[u] - want[u]) < 1e-12, (u, got[u], want[u])


def test_pagerank_cycle_is_uniform(spark):
    # a pure cycle: symmetric, so ranks must stay uniform at 1/n
    edges = [(1, 2), (2, 3), (3, 1)]
    df = spark.createDataFrame(edges, "src long, dst long")
    out = graph.pagerank(df, n_iter=10).collect()
    for r in out:
        assert abs(r["rank"] - 1.0 / 3) < 1e-12


def test_pagerank_rejects_bad_iter(spark):
    df = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError):
        graph.pagerank(df, n_iter=0)
