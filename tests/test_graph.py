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


def test_triangle_counts_planted(spark):
    """K4 on {1,2,3,4} (4 triangles; every node in 3), one pendant edge
    4-5 (node 5: degree 1, no triangles), one triangle {6,7,8} hanging
    off nothing else. Both orientations of the operator (broadcast and
    shuffle closing join) must agree exactly."""
    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    extra = [(4, 5), (6, 7), (6, 8), (7, 8)]
    edges = spark.createDataFrame(k4 + extra, "a long, b long")
    want = {
        1: (3, 3), 2: (3, 3), 3: (3, 3), 4: (4, 3),
        5: (1, 0), 6: (2, 1), 7: (2, 1), 8: (2, 1),
    }
    for bc in (True, False):
        got = {
            r.node: (r.degree, r.n_triangles)
            for r in graph.triangle_counts(edges, broadcast_edges=bc).collect()
        }
        assert got == want, f"broadcast_edges={bc}"


def test_triangle_counts_hub_skew(spark):
    """A star hub (node 0 joined to 1..40) with a single rim edge 1-2:
    exactly one triangle {0,1,2}; the hub's degree-41 fan must NOT
    produce hub-pivot wedges (the degree orientation points every star
    edge INTO the hub, so the hub pivots zero wedges — the skew bound).
    Also checks isolated-from-triangles nodes report 0."""
    edges = [(0, i) for i in range(1, 41)] + [(1, 2)]
    df = spark.createDataFrame(edges, "a long, b long")
    out = {r.node: (r.degree, r.n_triangles) for r in graph.triangle_counts(df).collect()}
    assert out[0] == (40, 1)
    assert out[1] == (2, 1) and out[2] == (2, 1)
    assert all(out[i] == (1, 0) for i in range(3, 41))


def test_ancestor_closure_deep_chain_and_forest(spark):
    """A 20-deep chain (needs the doubling: 5 rounds cover 2^5=32,
    while 20 > 2^4 proves round 5 genuinely fires), a second 2-node
    tree, and an isolated root. Exact (root, depth) for every node;
    extra rounds must saturate, not overshoot."""
    rows = [(i, i - 1 if i > 1 else None) for i in range(1, 21)]  # chain 1<-2<-...<-20
    rows += [(100, None), (101, 100), (200, None)]
    df = spark.createDataFrame(rows, "node long, parent long")
    for n_iter in (5, 7):  # 7: saturation is a no-op
        out = {r.node: (r.root, r.depth) for r in graph.ancestor_closure(df, n_iter=n_iter).collect()}
        assert out[20] == (1, 19) and out[10] == (1, 9) and out[1] == (1, 0)
        assert out[101] == (100, 1) and out[100] == (100, 0) and out[200] == (200, 0)
        assert len(out) == 23


def test_ancestor_closure_dangling_parent_persists(spark):
    """A node whose parent id has no node row (broken foreign key) must
    SURFACE as an unresolved row — root = the dangling id — never drop
    silently from the output."""
    df = spark.createDataFrame([(5, 99), (1, None)], "node long, parent long")
    out = {r.node: (r.root, r.depth) for r in graph.ancestor_closure(df, n_iter=3).collect()}
    assert out == {5: (99, 1), 1: (1, 0)}


def test_triangle_auto_selects_closing_strategy_by_size(spark):
    """broadcast_edges=None (the default) must pick the closing-join
    strategy from the SESSION's autoBroadcastJoinThreshold: an edge
    list whose estimated size crosses the threshold executes the
    shuffle join by itself (no one passes a flag), an under-threshold
    list keeps the broadcast probe, and both agree with the forced
    paths exactly."""
    import random

    rng = random.Random(7)
    edges = list({(min(x, y), max(x, y)) for x, y in
                  ((rng.randrange(400), rng.randrange(400)) for _ in range(3000))
                  if x != y})
    df = spark.createDataFrame(edges, "a long, b long")
    want = {r.node: (r.degree, r.n_triangles)
            for r in graph.triangle_counts(df, broadcast_edges=True).collect()}

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # ~2.9k edges x (8+8+24)B ~ 116 KB estimate: over a 4 KB
        # threshold -> auto must flip to the shuffle closing join
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "4KB")
        auto_small = graph.triangle_counts(df)
        plan = auto_small._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in plan, plan[:2000]
        got = {r.node: (r.degree, r.n_triangles) for r in auto_small.collect()}
        assert got == want

        # generous threshold -> auto keeps the broadcast probe
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64MB")
        auto_big = graph.triangle_counts(df)
        plan = auto_big._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan, plan[:2000]
        got = {r.node: (r.degree, r.n_triangles) for r in auto_big.collect()}
        assert got == want

        # threshold -1 (broadcast disabled session-wide) -> shuffle
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plan = graph.triangle_counts(df)._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in plan, plan[:2000]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_triangle_auto_sizing_measures_string_id_width(spark):
    """Variable-width node ids are sized by MEASURED avg byte length,
    not a flat per-column default: the same 200-edge graph under the
    same threshold must broadcast with short ids but refuse (shuffle)
    once each id carries a ~200-byte payload — the underestimate that
    would otherwise hint an executor-OOM broadcast at scale."""
    import random

    rng = random.Random(11)
    pairs = list({(min(x, y), max(x, y)) for x, y in
                  ((rng.randrange(60), rng.randrange(60)) for _ in range(200))
                  if x != y})
    short = spark.createDataFrame(
        [(f"n{x}", f"n{y}") for x, y in pairs], "a string, b string"
    )
    long_ids = spark.createDataFrame(
        [(f"n{x}" + "p" * 200, f"n{y}" + "p" * 200) for x, y in pairs],
        "a string, b string",
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # ~190 edges: short ids ≈ 190·(2·(3+16)+24) ≈ 12 KB < 32 KB;
        # long ids ≈ 190·(2·(203+16)+24) ≈ 88 KB > 32 KB.
        # The sizing decision under test is the CLOSING join's (its
        # build side is edge-count-scaled); r17 also broadcasts the
        # node-count-scaled DEGREE side under its own measured-width
        # gate, so assert on the closing join's keys (y, z), not on
        # the presence of any broadcast at all.
        import re

        def closing_broadcast(plan: str) -> bool:
            return bool(re.search(r"BroadcastHashJoin \[y#\d+", plan))

        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "32KB")
        plan = graph.triangle_counts(short)._jdf.queryExecution().executedPlan().toString()
        assert closing_broadcast(plan), plan[:2000]
        plan = graph.triangle_counts(long_ids)._jdf.queryExecution().executedPlan().toString()
        assert not closing_broadcast(plan), plan[:2000]
        # and the strategies agree on the answer
        want = {r.node: (r.degree, r.n_triangles)
                for r in graph.triangle_counts(short).collect()}
        got = {r.node.rstrip("p"): (r.degree, r.n_triangles)
               for r in graph.triangle_counts(long_ids).collect()}
        assert got == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_triangle_auto_sizing_decimal_is_fixed_width(spark):
    """Decimal node ids are sized at their PHYSICAL width (8 bytes at
    precision <= 18, 16 above — ADVICE r10), not the textual
    octet_length of their string cast: the same small graph must still
    broadcast under a threshold the textual estimate (~20 digit bytes +
    16 overhead per value) would overflow, and the decimal-keyed result
    must match the long-keyed one."""
    from pyspark.sql import functions as F

    pairs = [(x, y) for x in range(20) for y in range(x + 1, 20) if (x + y) % 3 == 0]
    longs = spark.createDataFrame(pairs, "a long, b long")
    from decimal import Decimal

    base = 10_000_000_000_000_000_000  # 20 digits: textual width 20+16=36/value
    decs = spark.createDataFrame(
        [(Decimal(base + x), Decimal(base + y)) for x, y in pairs],
        "a decimal(20,0), b decimal(20,0)",
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # 63 edges: fixed-width Decimal128 -> 63·(2·16+24) = 3.5 KB
        # < 4.5 KB, so the fix broadcasts; the old textual sizing gave
        # 63·(2·36+24) = 6.0 KB > 4.5 KB and refused (shuffle) — the
        # conservative bias ADVICE r10 flagged, now discriminated away.
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "4608")
        plan = graph.triangle_counts(decs)._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan, plan[:2000]
        want = {r.node: (r.degree, r.n_triangles) for r in graph.triangle_counts(longs).collect()}
        got = {int(r.node) - base: (r.degree, r.n_triangles) for r in graph.triangle_counts(decs).collect()}
        assert got == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_k_core_cascade_and_honest_cap(spark):
    """k-core peeling must CASCADE: node 4 has degree 2 (>= k) at
    round 1 but falls at round 2 once its leaf neighbor is peeled —
    the property a one-shot degree threshold misses. A long chain
    under a tiny max_rounds raises loudly instead of looping."""
    import pytest
    from pyspark.sql import functions as F

    from stock_price_prediction_using_stream_and_batch_processing_spark.operators import graph

    # triangle {1,2,3} + tail 3-4-5
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (3, 4), (4, 5)], ["src", "dst"]
    )
    out = {r.node: r.core_degree for r in graph.k_core(edges, 2).collect()}
    assert out == {1: 2, 2: 2, 3: 2}
    # k above the max degree: empty core, no error
    assert graph.k_core(edges, 10).count() == 0
    # chain of 12: peels one layer per round from the ends
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], ["src", "dst"]
    )
    with pytest.raises(ValueError, match="did not converge"):
        graph.k_core(chain, 2, max_rounds=2)


def test_label_propagation_two_cliques_with_bridge(spark):
    """Two 4-cliques joined by one bridge edge: 3 synchronous rounds
    converge each clique onto its smallest member's label; the bridge
    is a sparse cut LPA must not merge across."""
    from stock_price_prediction_using_stream_and_batch_processing_spark.operators.graph import label_propagation

    c1 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    c2 = [(a, b) for a in range(10, 14) for b in range(a + 1, 14)]
    edges = spark.createDataFrame(c1 + c2 + [(4, 10)], "src long, dst long")
    got = {r.node: r.label for r in label_propagation(edges, rounds=3).collect()}
    assert all(got[n] == 1 for n in range(1, 5))
    assert all(got[n] == 10 for n in range(10, 14))


def test_label_propagation_deterministic_tiebreak(spark):
    """A node with equally frequent neighbor labels adopts the
    SMALLEST — the total order that makes synchronous LPA a pure
    function of the graph."""
    from stock_price_prediction_using_stream_and_batch_processing_spark.operators.graph import label_propagation

    # node 5 sees labels {1, 2} once each after round 1 start: picks 1
    edges = spark.createDataFrame([(1, 5), (2, 5)], "src long, dst long")
    got = {r.node: r.label for r in label_propagation(edges, rounds=1).collect()}
    assert got[5] == 1


def test_pagerank_dangling_mass_and_tiebreak(spark):
    """Pins the documented dangling simplification (r13 ask #4): a
    dangling node's mass LEAKS (ranks sum < 1), the dangling node still
    RECEIVES rank, and symmetric nodes tie exactly — verified against
    the hand-computed 1-iteration recurrence on a 3-node graph
    a->c, b->c (c dangling): rank(c) = teleport + d*(r_a + r_b),
    rank(a) = rank(b) = teleport."""
    edges = spark.createDataFrame([("a", "c"), ("b", "c")], "src string, dst string")
    got = {r.node: r.rank for r in graph.pagerank(edges, n_iter=1).collect()}
    teleport = 0.15 / 3
    assert got["a"] == pytest.approx(teleport)
    assert got["b"] == got["a"]  # symmetric tie, exact
    assert got["c"] == pytest.approx(teleport + 0.85 * (2 / 3))
    # dangling leak: total mass < 1 (c's rank had nowhere to go next
    # round — run 2 iterations and the sum drops further)
    assert sum(got.values()) < 1.0
    got2 = {r.node: r.rank for r in graph.pagerank(edges, n_iter=2).collect()}
    assert sum(got2.values()) < sum(got.values())
    # ordering (what centrality consumers use) is stable across iters
    assert got2["c"] > got2["a"]


def test_pagerank_empty_graph_returns_empty(spark):
    edges = spark.createDataFrame([], "src string, dst string")
    assert graph.pagerank(edges).count() == 0
