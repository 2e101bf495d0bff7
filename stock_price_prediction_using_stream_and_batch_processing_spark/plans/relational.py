"""Relational query corpus: scans, projections, filters, sorts/limits,
aggregation, joins, set ops, dedup — SURVEY §2.2-§2.4 generalized plus
the §2.10 gap coverage (joins/group-by/distinct/set ops absent from the
reference).

Every query aliases its computed columns identically in Spark and in
the DuckDB oracle, rounds floating aggregates to a fixed scale, and
tie-breaks every top-k so results are deterministic sets.
"""

from __future__ import annotations

import os

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..operators import dedup, joins, setops, topk
from ..sources.tables import load_table
from .core import register

# The events fixture's closed type set — shared by the pivot/unpivot
# pair so the two plans (and their hand-written oracle column lists)
# can't drift independently if the fixture ever grows a type.
_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]

# --- scans / projections / filters -----------------------------------------


@register(
    "scan_filter_project",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS net_price
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1996-01-01'
      AND l_quantity > 25
    """,
    tags=("scan", "filter", "projection"),
    driver=False,
)
def scan_filter_project(spark, sf_dir):
    """Filter + arithmetic projection; predicate and column pruning push
    to the Parquet scan (P0 generalized).

    Per-row arithmetic is emitted UNROUNDED: identical IEEE ops give
    bitwise-identical doubles across engines, whereas ROUND itself can
    disagree at representation boundaries (Spark BigDecimal HALF_UP vs
    DuckDB's scaled-multiply) — observed 13/25k mismatches at sf0.01.
    Rounding is reserved for order-dependent aggregates."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_quantity") > 25)
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net_price"),
        )
    )


@register(
    "json_extract_events",
    oracle="""
    SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS INTEGER) > 50
    """,
    tags=("json", "projection"),
    driver=False,
)

def json_extract_events(spark, sf_dir):
    """JSON props extraction (reference P0b ``from_json`` analogue over
    the events fixture)."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return ev.select("event_id", k.alias("k")).filter(F.col("k") > 50)


@register(
    "latest_k_events",
    oracle="""
    SELECT event_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s, value
    FROM events ORDER BY ts DESC, event_id DESC LIMIT 100
    """,
    tags=("sort", "limit", "topk"),
    driver=False,
)
def latest_k_events(spark, sf_dir):
    """The reference's 'last 10 000 ticks' fetch (S3/O2,
    ``batch_processor.py:76``) as native TakeOrderedAndProject."""
    ev = load_table(spark, sf_dir, "events")
    return topk.latest_k(ev, "ts", 100, tiebreak="event_id").select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
        "value",
    )


# --- aggregation ------------------------------------------------------------


@register(
    "count_by_event_type",
    oracle="""
    SELECT event_type, COUNT(*) AS n, COUNT(DISTINCT user_id) AS n_users
    FROM events GROUP BY event_type
    """,
    tags=("groupby", "count", "distinct"),
    driver=False,
)
def count_by_event_type(spark, sf_dir):
    """Group count + distinct count (reference A1 generalized to GROUP BY)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"), F.countDistinct("user_id").alias("n_users")
    )


@register(
    "global_agg_stats",
    oracle="""
    SELECT COUNT(*) AS n, COUNT(DISTINCT user_id) AS n_users,
           MIN(value) AS min_v, MAX(value) AS max_v,
           ROUND(AVG(value), 4) AS avg_v, ROUND(SUM(value), 2) AS sum_v
    FROM events
    """,
    tags=("aggregate", "distinct"),
    driver=False,
)

def global_agg_stats(spark, sf_dir):
    """min/mean/max/sum — the reference's driver-side NumPy metric aggs
    (A2, ``stream_consumer.py:110-111``) as one distributed agg — plus
    COUNT DISTINCT (A1's distinct-count face; the grouped variant is the
    extended-tier ``count_by_event_type``)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.agg(
        F.count("*").alias("n"),
        F.countDistinct("user_id").alias("n_users"),
        F.min("value").alias("min_v"),
        F.max("value").alias("max_v"),
        F.round(F.avg("value"), 4).alias("avg_v"),
        F.round(F.sum("value"), 2).alias("sum_v"),
    )


@register(
    "pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           ROUND(AVG(l_quantity), 4) AS avg_qty,
           ROUND(AVG(l_extendedprice), 4) AS avg_price,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("groupby", "aggregate", "tpch"),
    driver=False,
)
def pricing_summary(spark, sf_dir):
    """TPC-H-Q1-shaped pricing summary: one hash-agg with map-side
    partials; the canonical scan-heavy agg for the bench."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "rollup_lineitem",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n, ROUND(SUM(l_quantity), 2) AS sum_qty
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    tags=("rollup", "groupby"),
    driver=False,
)
def rollup_lineitem(spark, sf_dir):
    """Hierarchical totals via ROLLUP (grouping-sets family — absent
    from the reference, §2.10)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"), F.round(F.sum("l_quantity"), 2).alias("sum_qty")
    )


@register(
    "percentiles_by_type",
    oracle="""
    SELECT event_type,
           ROUND(quantile_cont(value, 0.25), 6) AS p25,
           ROUND(quantile_cont(value, 0.50), 6) AS p50,
           ROUND(quantile_cont(value, 0.75), 6) AS p75
    FROM events GROUP BY event_type
    """,
    tags=("percentile", "groupby"),
    driver=False,
)
def percentiles_by_type(spark, sf_dir):
    """Exact interpolated percentiles per group (Spark ``percentile`` ==
    DuckDB ``quantile_cont``)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.percentile("value", 0.25), 6).alias("p25"),
        F.round(F.percentile("value", 0.50), 6).alias("p50"),
        F.round(F.percentile("value", 0.75), 6).alias("p75"),
    )


@register(
    "date_parts_orders",
    oracle="""
    SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS yr,
           CAST(EXTRACT(MONTH FROM o_orderdate) AS INTEGER) AS mo,
           COUNT(*) AS n, ROUND(SUM(o_totalprice), 2) AS sum_total
    FROM orders GROUP BY 1, 2
    """,
    tags=("date", "groupby"),
    # rotated to extended in r4 (driver-green r1-r3) to free driver slots
    # for never-checked queries; still DuckDB-checked in tests.
    driver=False,
)
def date_parts_orders(spark, sf_dir):
    """Date-part extraction + agg (scalar date functions, §2.7 gap)."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy(
        F.year("o_orderdate").alias("yr"), F.month("o_orderdate").alias("mo")
    ).agg(F.count("*").alias("n"), F.round(F.sum("o_totalprice"), 2).alias("sum_total"))


@register(
    "case_when_price_bands",
    oracle="""
    SELECT CASE WHEN o_totalprice < 50000 THEN 'low'
                WHEN o_totalprice < 150000 THEN 'mid'
                ELSE 'high' END AS band,
           COUNT(*) AS n, ROUND(AVG(o_totalprice), 4) AS avg_price
    FROM orders GROUP BY 1
    """,
    tags=("case", "groupby"),
    driver=False,
)
def case_when_price_bands(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    band = (
        F.when(F.col("o_totalprice") < 50000, "low")
        .when(F.col("o_totalprice") < 150000, "mid")
        .otherwise("high")
    )
    return o.groupBy(band.alias("band")).agg(
        F.count("*").alias("n"), F.round(F.avg("o_totalprice"), 4).alias("avg_price")
    )


# --- joins ------------------------------------------------------------------


@register(
    "join_orders_customer_segment",
    oracle="""
    SELECT c.c_mktsegment AS mktsegment, COUNT(*) AS n_orders,
           ROUND(SUM(o.o_totalprice), 2) AS sum_total
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
    tags=("join", "groupby"),
    driver=False,
)
def join_orders_customer_segment(spark, sf_dir):
    """Fact ⋈ broadcast-dim join + agg: customer is catalog-sized, so
    broadcast keeps the orders side shuffle-free before the agg."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        joins.broadcast_join(o, c, o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("mktsegment"))
        .agg(F.count("*").alias("n_orders"), F.round(F.sum("o_totalprice"), 2).alias("sum_total"))
    )


@register(
    "revenue_by_nation",
    oracle="""
    SELECT n.n_name AS nation, ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY n.n_name
    """,
    tags=("join", "multi-join", "groupby", "tpch"),
    driver=False,
)

def revenue_by_nation(spark, sf_dir):
    """TPC-H-Q5-shaped snowflake join: every dimension broadcast, the
    fact table never shuffles until the final small agg."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )


@register(
    "customers_with_orders",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    tags=("semi-join",),
    driver=False,
)

def customers_with_orders(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return joins.semi_join(c, o, c.c_custkey == o.o_custkey).select("c_custkey", "c_name")


@register(
    "customers_without_orders",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    tags=("anti-join",),
    # rotated to extended in r4: its driver row was a 0-row result (weak
    # evidence); the anti-join mechanics stay pinned by the local oracle.
    driver=False,
)
def customers_without_orders(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return joins.anti_join(c, o, c.c_custkey == o.o_custkey).select("c_custkey", "c_name")


@register(
    "top_parts_by_revenue",
    oracle="""
    SELECT p.p_partkey, p.p_name, ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY p.p_partkey, p.p_name
    ORDER BY revenue DESC, p.p_partkey LIMIT 20
    """,
    tags=("join", "groupby", "topk"),
    driver=False,
)
def top_parts_by_revenue(spark, sf_dir):
    """Join + agg + deterministic top-k (TakeOrderedAndProject)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    agg = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_partkey", "p_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )
    return topk.top_k(agg, 20, F.col("revenue").desc(), F.col("p_partkey"))


# --- set ops / distinct / dedup --------------------------------------------


@register(
    "distinct_user_type_pairs",
    oracle="SELECT DISTINCT user_id, event_type FROM events",
    tags=("distinct",),
    driver=False,
)
def distinct_user_type_pairs(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return ev.select("user_id", "event_type").distinct()


@register(
    "purchasers_who_also_errored",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'purchase'
    INTERSECT
    SELECT user_id FROM events WHERE event_type = 'error'
    """,
    tags=("set-op", "intersect"),
    driver=False,
)
def purchasers_who_also_errored(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "purchase").select("user_id")
    b = ev.filter(F.col("event_type") == "error").select("user_id")
    return setops.intersect(a, b)


@register(
    "viewers_minus_purchasers",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'view'
    EXCEPT
    SELECT user_id FROM events WHERE event_type = 'purchase'
    """,
    tags=("set-op", "except"),
    driver=False,
)
def viewers_minus_purchasers(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "view").select("user_id")
    b = ev.filter(F.col("event_type") == "purchase").select("user_id")
    return setops.except_distinct(a, b)


@register(
    "dedup_exact_events",
    oracle="""
    SELECT user_id, event_type, MIN(event_id) AS event_id
    FROM events GROUP BY user_id, event_type
    """,
    tags=("dedup",),
    driver=False,
)
def dedup_exact_events(spark, sf_dir):
    """Exact dedup keeping the first (min-id) row per key — deterministic,
    unlike bare ``dropDuplicates``."""
    ev = load_table(spark, sf_dir, "events")
    return dedup.exact_dedup(ev, ["user_id", "event_type"], "event_id").select(
        "user_id", "event_type", "event_id"
    )


@register(
    "salted_agg_by_type",
    oracle="""
    SELECT event_type, ROUND(SUM(value), 4) AS sum_value, COUNT(*) AS n_rows,
           ROUND(SUM(value) / COUNT(*), 6) AS avg_value
    FROM events GROUP BY event_type
    """,
    tags=("groupby", "skew", "salting"),
    driver=False,
)
def salted_agg_by_type(spark, sf_dir):
    """Skew-proof aggregation on a LOW-cardinality key (event_type — the
    classic hot-key shape): deterministic salt spreads each key over 16
    reducers, partial (key, salt) agg, then final per-key re-agg
    (operators/skew.py). Result identical to a direct groupBy — the
    oracle IS the direct groupBy."""
    from ..operators import skew

    ev = load_table(spark, sf_dir, "events")
    out = skew.salted_sum_count(ev, ["event_type"], "value", unique_col="event_id", n_salts=16)
    return out.select(
        "event_type",
        F.round("sum_value", 4).alias("sum_value"),
        "n_rows",
        F.round("avg_value", 6).alias("avg_value"),
    )


@register(
    "salted_join_hot_events",
    oracle="""
    WITH dim AS (
      SELECT event_type,
             CAST(('0x' || substr(md5(event_type), 1, 6)) AS BIGINT) AS type_code
      FROM (SELECT DISTINCT event_type FROM events)
    )
    SELECT e.event_id, e.event_type, e.value, d.type_code
    FROM events e JOIN dim d ON e.event_type = d.event_type
    """,
    tags=("join", "skew", "salting"),
    # new r10; takes the driver slot histogram_value_events
    # (twice-green; family keeps histogram_incremental_refresh_events
    # and quantile_rollup_daily_values in the driver tier) rotates out of
    # r12: >=2 straight driver greens; slot goes to the hidden-
    # partitioning face (still oracle-checked every local run)
    driver=False,
)
def salted_join_hot_events(spark, sf_dir):
    """SKEW-PROOF EQUI-JOIN as a registered face: events⋈type-dim on
    ``event_type`` — the worst-case hot-key shape (a handful of keys
    carry ALL the rows, so a plain shuffle join funnels each key's
    entire fact side through one reducer). ``salted_join_big_hot``
    (operators/skew.py) salts the fact side with a DETERMINISTIC
    hash(event_id) % 8 and explodes the 5-row dim across the 8 salts,
    so every hot key spreads over 8 reducers. This is the shape for
    when AQE's runtime skew split cannot apply — stream-static joins
    inside micro-batches, or a join feeding a co-partitioned window —
    and it is semantics-NEUTRAL, which is exactly what the oracle
    checks: the plain (unsalted) SQL join must match row for row. The
    dim's type_code re-derives md5-hex→int in both engines
    (Spark ``conv(substr(md5..))`` ≡ DuckDB ``('0x'||..)::BIGINT``).

    Broadcast is DISABLED (scoped) while this plans and materializes:
    at fixture scale Catalyst would broadcast the tiny exploded dim,
    which also avoids the hot-key funnel and would demonstrate nothing
    — the salt only matters on the SHUFFLE join you get when the dim
    is over threshold. The function ASSERTS the executed plan is a
    shuffle join keyed on (event_type, _salt), then spills the result
    so the returned plan is conf-independent (same structure as
    ``bloom_pruned_join_part_lineitem``)."""
    from ..operators import skew
    from .workdirs import fresh_result_dir

    key = "spark.sql.autoBroadcastJoinThreshold"
    saved = spark.conf.get(key, None)
    out_dir = fresh_result_dir("salted_join")
    try:
        spark.conf.set(key, "-1")
        ev = load_table(spark, sf_dir, "events").select("event_id", "event_type", "value")
        dim = (
            ev.select("event_type")
            .distinct()
            .withColumn(
                "type_code",
                F.conv(F.substring(F.md5("event_type"), 1, 6), 16, 10).cast("long"),
            )
        )
        j = skew.salted_join_big_hot(
            ev, dim, "event_type", unique_col="event_id", n_salts=8
        ).select("event_id", "event_type", "value", "type_code")
        plan = j._jdf.queryExecution().executedPlan().toString()
        if "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan:
            raise AssertionError(
                "salted join did not plan as a shuffle join — the salt "
                "demonstrates nothing under a broadcast:\n" + plan[:2000]
            )
        join_line = next(
            ln for ln in plan.splitlines()
            if "SortMergeJoin" in ln or "ShuffledHashJoin" in ln
        )
        if "_salt" not in join_line:
            raise AssertionError(
                "shuffle join is not keyed on the salt:\n" + join_line
            )
        j.write.mode("overwrite").parquet(out_dir)
    finally:
        if saved is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, saved)
    return spark.read.parquet(out_dir)


@register(
    "approx_agg_stats",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
           TRUE AS users_within_4rsd,
           TRUE AS p50_rank_ok,
           TRUE AS p95_rank_ok
    FROM events GROUP BY event_type
    """,
    tags=("groupby", "approx", "sketch", "invariant-oracle"),
    # promoted r9: the r8 invariant-oracle upgrade has zero driver evidence
    # rotation r11: twice driver-green (r9, r10) — demoted per discipline
    driver=False,
)
def approx_agg_stats(spark, sf_dir):
    """Sketch-based aggregates (HyperLogLog++ distinct counts,
    KLL/GK-style approximate percentiles) with an INVARIANT value
    oracle (formerly rows-only): the registered output carries the
    exact per-type row and distinct counts (differentially checked)
    plus three booleans the oracle pins TRUE — ``users_within_4rsd``
    (|approx_count_distinct(rsd=0.02) − exact| ≤ max(4·0.02·exact, 2))
    and ``p50_rank_ok``/``p95_rank_ok`` (the value percentile_approx
    (accuracy=10000) returns has an actual rank within the GK guarantee
    q ± 1/accuracy of the target, widened to 2/accuracy + 2 rows of
    acceptance slack: the rank interval of the returned value —
    [count(<v)+1, count(≤v)] — must intersect
    [(q−ε)·n − 2, (q+ε)·n + 2]). Diagnostic 3σ bounds stay in
    tests/test_approx.py; if the sketches ever degrade past the
    registered bounds the boolean flips and the value hash fails. The
    raw estimate face (what you'd run at 100 TB — constant memory per
    group, one shuffle, mergeable partials) is the first aggregate
    below, unchanged; the exact aggregates and the rank probe are this
    verification face's cost, not the operator's."""
    ev = load_table(spark, sf_dir, "events")
    pq = F.percentile_approx("value", [0.5, 0.95], 10000)
    approx = ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("_approx_users"),
        F.element_at(pq, 1).alias("_p50"),
        F.element_at(pq, 2).alias("_p95"),
        F.countDistinct("user_id").cast("long").alias("exact_users"),
        F.count("*").cast("long").alias("n_rows"),
        # percentile_approx and the rank probe below see non-null
        # values only; the rank band must use the same population or a
        # NULL-bearing fixture falsely shifts it (ADVICE r8).
        F.count("value").cast("long").alias("_n_vals"),
    )
    # rank probe: one more pass over events against the (tiny,
    # broadcast) per-type approx values
    ranked = (
        ev.join(F.broadcast(approx), "event_type")
        .groupBy("event_type")
        .agg(
            F.sum((F.col("value") < F.col("_p50")).cast("long")).alias("_lt50"),
            F.sum((F.col("value") <= F.col("_p50")).cast("long")).alias("_le50"),
            F.sum((F.col("value") < F.col("_p95")).cast("long")).alias("_lt95"),
            F.sum((F.col("value") <= F.col("_p95")).cast("long")).alias("_le95"),
        )
    )
    eps = 2.0 / 10000.0

    def rank_ok(lt, le, q):
        lo = (F.lit(q) - F.lit(eps)) * F.col("_n_vals") - F.lit(2.0)
        hi = (F.lit(q) + F.lit(eps)) * F.col("_n_vals") + F.lit(2.0)
        # rank interval of the returned value is [lt+1, le]; it must
        # intersect the target band [lo, hi]
        return (F.col(lt) + 1 <= hi) & (F.col(le) >= lo)

    return approx.join(ranked, "event_type").select(
        "event_type",
        "n_rows",
        "exact_users",
        (
            F.abs(F.col("_approx_users") - F.col("exact_users"))
            <= F.greatest(F.lit(4 * 0.02) * F.col("exact_users"), F.lit(2.0))
        ).alias("users_within_4rsd"),
        rank_ok("_lt50", "_le50", 0.5).alias("p50_rank_ok"),
        rank_ok("_lt95", "_le95", 0.95).alias("p95_rank_ok"),
    )


@register(
    "active_users_union",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'purchase'
    UNION
    SELECT user_id FROM events WHERE event_type = 'error'
    """,
    tags=("setop", "union"),
    # rotated to extended in r4; views_except_all_purchases keeps a
    # driver row for the set-op family.
    driver=False,
)
def active_users_union(spark, sf_dir):
    """UNION (distinct) via operators/setops.union_distinct."""
    ev = load_table(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "purchase").select("user_id")
    b = ev.filter(F.col("event_type") == "error").select("user_id")
    return setops.union_distinct(a, b)


@register(
    "views_except_all_purchases",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'view'
    EXCEPT ALL
    SELECT user_id FROM events WHERE event_type = 'purchase'
    """,
    tags=("setop", "except"),
    driver=False,
)
def views_except_all_purchases(spark, sf_dir):
    """EXCEPT ALL (multiset difference): each user id survives
    max(views - purchases, 0) times — bag semantics the distinct EXCEPT
    (q: viewers_minus_purchasers) can't express."""
    ev = load_table(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "view").select("user_id")
    b = ev.filter(F.col("event_type") == "purchase").select("user_id")
    return setops.except_all(a, b)


@register(
    "latest3_events_per_user",
    oracle="""
    WITH r AS (
      SELECT user_id, event_id, value,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    )
    SELECT user_id, event_id, value, CAST(rn AS INTEGER) AS rn
    FROM r WHERE rn <= 3
    """,
    tags=("topk", "window"),
    driver=False,
)
def latest3_events_per_user(spark, sf_dir):
    """Per-key top-k (operators/topk.top_k_per_group): one hash shuffle
    on the key, per-key heap via row_number — never a global sort."""
    ev = load_table(spark, sf_dir, "events")
    out = topk.top_k_per_group(ev, "user_id", 3, F.col("ts").desc(), F.col("event_id").desc())
    return out.select("user_id", "event_id", "value", F.col("rn").cast("int").alias("rn"))


@register(
    "pivot_user_event_counts",
    oracle="""
    SELECT user_id,
           CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
           CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
           CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
           CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
    FROM events GROUP BY user_id
    """,
    tags=("pivot", "groupby"),
    # rotation r11: promoted — no driver row since the r4 all-query era
    driver=True,
)
def pivot_user_event_counts(spark, sf_dir):
    """PIVOT: per-user event-type count matrix. The value list is given
    EXPLICITLY — with it, Spark pivots in one pass (grouping expands to
    conditional aggregates, same plan the oracle spells out); without
    it, Spark runs an extra distinct-values job first."""
    ev = load_table(spark, sf_dir, "events")
    out = (
        ev.groupBy("user_id")
        .pivot("event_type", _EVENT_TYPES)
        .count()
        .na.fill(0)
    )
    return out.select("user_id", *[F.col(c).alias(c) for c in _EVENT_TYPES])


@register(
    "cube_status_priority",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
           ROUND(SUM(o_totalprice), 2) AS total
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    tags=("groupby", "cube", "grouping-sets"),
    driver=False,
)
def cube_status_priority(spark, sf_dir):
    """CUBE aggregation (all 4 grouping sets in one pass — Spark expands
    rows per grouping set BEFORE the hash agg, so partial aggregation
    still applies). Completes the grouping-sets family next to
    rollup_lineitem."""
    o = load_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total")
    )


@register(
    "data_quality_events",
    oracle="""
    WITH c AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN value > 0 THEN 0 ELSE 1 END) AS BIGINT) AS value_positive,
             CAST(SUM(CASE WHEN user_id IS NOT NULL THEN 0 ELSE 1 END) AS BIGINT) AS user_id_present,
             CAST(SUM(CASE WHEN event_type IN ('click','error','purchase','signup','view') THEN 0 ELSE 1 END) AS BIGINT) AS known_event_type,
             CAST(SUM(CASE WHEN json_valid(props) THEN 0 ELSE 1 END) AS BIGINT) AS props_is_json
      FROM events
    )
    SELECT rule, n_violations, n AS n_rows,
           ROUND(1.0 - CAST(n_violations AS DOUBLE) / n, 6) AS pass_rate
    FROM c UNPIVOT (n_violations FOR rule IN (value_positive, user_id_present, known_event_type, props_is_json))
    """,
    tags=("quality", "expectations"),
    driver=False,
)
def data_quality_events(spark, sf_dir):
    """Declarative data-quality gate (operators/quality.check): all
    rules evaluate in ONE scan with conditional aggregation — the
    pipeline-admission check an LLM-data ingest runs before accepting a
    batch."""
    from ..operators import quality

    ev = load_table(spark, sf_dir, "events")
    known = ["click", "error", "purchase", "signup", "view"]
    out = quality.check(
        ev,
        {
            "value_positive": F.col("value") > 0,
            "user_id_present": F.col("user_id").isNotNull(),
            "known_event_type": F.col("event_type").isin(known),
            "props_is_json": F.get_json_object("props", "$").isNotNull(),
        },
    )
    return out.withColumn("pass_rate", F.round("pass_rate", 6))


@register(
    "corr_value_props_by_type",
    oracle="""
    SELECT event_type,
           ROUND(corr(value, CAST(json_extract(props, '$.k') AS DOUBLE)), 4) AS corr_vk,
           ROUND(covar_samp(value, CAST(json_extract(props, '$.k') AS DOUBLE)), 2) AS covar_vk,
           COUNT(*) AS n
    FROM events
    WHERE json_extract(props, '$.k') IS NOT NULL
    GROUP BY event_type
    """,
    tags=("corr", "json", "groupby"),
    driver=False,
)
def corr_value_props_by_type(spark, sf_dir):
    """Statistical aggregates (Pearson corr, sample covariance) between
    a native column and a JSON-extracted property — the
    extract-then-aggregate composition; both aggregates are one-pass
    with map-side partials."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("double")
    return (
        ev.filter(k.isNotNull())
        .groupBy("event_type")
        .agg(
            F.round(F.corr("value", k), 4).alias("corr_vk"),
            F.round(F.covar_samp("value", k), 2).alias("covar_vk"),
            F.count("*").alias("n"),
        )
    )


@register(
    "table_profile_events",
    oracle="""
    WITH s AS (
      SELECT COUNT(*) AS n,
             CAST(SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_uid,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS nd_uid,
             CAST(MIN(user_id) AS DOUBLE) AS mn_uid, CAST(MAX(user_id) AS DOUBLE) AS mx_uid,
             CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_val,
             CAST(COUNT(DISTINCT value) AS BIGINT) AS nd_val,
             CAST(MIN(value) AS DOUBLE) AS mn_val, CAST(MAX(value) AS DOUBLE) AS mx_val,
             CAST(SUM(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_et,
             CAST(COUNT(DISTINCT event_type) AS BIGINT) AS nd_et,
             MIN(event_type) AS mns_et, MAX(event_type) AS mxs_et
      FROM events
    )
    SELECT 'user_id' AS "column", n AS n_rows, nulls_uid AS n_nulls, nd_uid AS n_distinct,
           mn_uid AS min_num, mx_uid AS max_num,
           CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str FROM s
    UNION ALL
    SELECT 'value', n, nulls_val, nd_val, mn_val, mx_val, NULL, NULL FROM s
    UNION ALL
    SELECT 'event_type', n, nulls_et, nd_et, NULL, NULL, mns_et, mxs_et FROM s
    """,
    tags=("quality", "profile", "groupby"),
    driver=False,  # rotation r7: driver-green r5-r6; histogram_value_events + data_quality keep the profiling family's evidence
)
def table_profile_events(spark, sf_dir):
    """ANALYZE-style column profile of the events table (operators/
    quality.profile_table): row/null/exact-distinct counts + typed
    min/max, one aggregate pass (Spark expands the multi-column
    distinct; the approx variant is the 100 TB path)."""
    from ..operators import quality

    ev = load_table(spark, sf_dir, "events")
    return quality.profile_table(ev, numeric_cols=["user_id", "value"], string_cols=["event_type"])


@register(
    "histogram_value_events",
    oracle="""
    SELECT CAST(LEAST(GREATEST(FLOOR((CAST(value AS DOUBLE) - 0.0) / 500.0 * 20.0), 0), 19) AS INTEGER) AS bin,
           COUNT(*) AS n
    FROM events WHERE value IS NOT NULL
    GROUP BY 1
    """,
    tags=("quality", "histogram", "groupby"),
    # rotation r10: demoted twice-green (r8+r9); the histogram family
    # keeps histogram_incremental_refresh_events and
    # quantile_rollup_daily_values in the driver tier
    driver=False,
)
def histogram_value_events(spark, sf_dir):
    """Equi-width 20-bin histogram of events.value over [0, 500)
    (operators/quality.equi_width_histogram): one groupBy on the bin
    key, out-of-range rows clamped into the edge bins."""
    from ..operators import quality

    ev = load_table(spark, sf_dir, "events")
    return quality.equi_width_histogram(ev, "value", 0.0, 500.0, 20)


@register(
    "referential_orphans_check",
    oracle="""
    SELECT 'lineitem->orders' AS relation,
           CAST(COUNT(*) FILTER (WHERE o.o_orderkey IS NULL) AS BIGINT) AS n_orphans
    FROM lineitem l LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o
      ON l.l_orderkey = o.o_orderkey
    UNION ALL
    SELECT 'orders->customer',
           CAST(COUNT(*) FILTER (WHERE c.c_custkey IS NULL) AS BIGINT)
    FROM orders r LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
      ON r.o_custkey = c.c_custkey
    """,
    tags=("quality", "join", "anti"),
    # rotation r9: driver-green many rounds; anti-join family keeps
    # coverage via the extended tier and the driver's other join rows
    driver=False,
)
def referential_orphans_check(spark, sf_dir):
    """Cross-table referential integrity (operators/quality.
    referential_orphans): orphaned lineitems / orders counted with one
    LEFT ANTI join per relation, parents broadcast."""
    from ..operators import quality

    li = load_table(spark, sf_dir, "lineitem")
    od = load_table(spark, sf_dir, "orders")
    cu = load_table(spark, sf_dir, "customer")
    return quality.referential_orphans(
        [
            ("lineitem->orders", li, "l_orderkey", od, "o_orderkey"),
            ("orders->customer", od, "o_custkey", cu, "c_custkey"),
        ]
    )


# --- anomaly detection / temporal history ----------------------------------


@register(
    "outlier_events_zscore",
    oracle="""
    WITH s AS (
      SELECT event_type, AVG(value) AS m, STDDEV_SAMP(value) AS sd
      FROM events GROUP BY event_type
    )
    SELECT event_id, e.event_type, value, ROUND((value - m) / sd, 6) AS zscore
    FROM events e JOIN s USING (event_type)
    WHERE sd IS NOT NULL AND sd > 0 AND ABS((value - m) / sd) >= 3.0
    """,
    tags=("quality", "anomaly", "zscore"),
    # rotation r6: driver-green r4+r5; table_profile/histogram keep the
    # quality family's driver evidence
    driver=False,
)
def outlier_events_zscore(spark, sf_dir):
    """Per-segment anomaly gate: events whose value sits ≥3 sample
    standard deviations from its event_type mean (operators/quality.
    zscore_outliers). The stats table is one row per type and
    broadcasts, so the fact side never shuffles."""
    from ..operators import quality

    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type", "value")
    out = quality.zscore_outliers(ev, "event_type", "value", z_thresh=3.0)
    return out.select(
        "event_id", "event_type", "value", F.round("zscore", 6).alias("zscore")
    )


@register(
    "order_status_history",
    oracle="""
    WITH o AS (
      SELECT o_custkey, o_orderdate, o_orderkey, o_orderstatus,
             CASE WHEN lag(o_orderstatus) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
                       IS NOT DISTINCT FROM o_orderstatus THEN 0 ELSE 1 END AS chg
      FROM orders
    ), r AS (
      SELECT *, SUM(chg) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
      FROM o
    ), runs AS (
      SELECT o_custkey, run, MIN(o_orderstatus) AS o_orderstatus, MIN(o_orderdate) AS valid_from
      FROM r GROUP BY o_custkey, run
    )
    SELECT o_custkey, o_orderstatus, valid_from,
           lead(valid_from) OVER (PARTITION BY o_custkey ORDER BY run) AS valid_to,
           (lead(valid_from) OVER (PARTITION BY o_custkey ORDER BY run) IS NULL) AS is_current
    FROM runs
    """,
    tags=("temporal", "scd2", "gaps-and-islands", "window"),
    driver=False,  # rotation r7: driver-green r4-r6; snapshot_diff/upsert/cdc_apply keep the temporal-maintenance driver evidence
)
def order_status_history(spark, sf_dir):
    """SCD-2 validity intervals: each customer's order-status runs
    collapsed to [valid_from, valid_to) rows with the open interval
    flagged current (operators/sequences.interval_history — one
    observation shuffle + one runs shuffle, both keyed by customer)."""
    from ..operators import sequences

    od = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate", "o_orderstatus"
    )
    hist = sequences.interval_history(
        od, "o_custkey", "o_orderdate", "o_orderstatus", tiebreak="o_orderkey"
    )
    return hist.select("o_custkey", "o_orderstatus", "valid_from", "valid_to", "is_current")


@register(
    "snapshot_diff_orders",
    oracle="""
    WITH base AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice,
             (('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT % 10) AS b
      FROM orders
    ),
    snap_old AS (SELECT * FROM base WHERE b != 0),
    snap_new AS (
      SELECT o_orderkey,
             CASE WHEN b = 2 THEN 'X' ELSE o_orderstatus END AS o_orderstatus,
             o_totalprice, b
      FROM base WHERE b != 1
    )
    SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
           CASE WHEN o.o_orderkey IS NULL THEN 'added'
                WHEN n.o_orderkey IS NULL THEN 'removed'
                WHEN o.o_orderstatus != n.o_orderstatus
                     OR o.o_totalprice != n.o_totalprice THEN 'changed'
           END AS change_type
    FROM snap_old o FULL OUTER JOIN snap_new n ON o.o_orderkey = n.o_orderkey
    WHERE o.o_orderkey IS NULL OR n.o_orderkey IS NULL
          OR o.o_orderstatus != n.o_orderstatus OR o.o_totalprice != n.o_totalprice
    """,
    tags=("cdc", "diff", "maintenance"),
    # rotation r11: 6x driver-green (r5-r10); the snapshot family's two
    # new protocol faces (time travel, compaction) take the driver slots
    driver=False,
)
def snapshot_diff_orders(spark, sf_dir):
    """CDC-style snapshot diff (operators/upsert.snapshot_diff): two
    deterministic hash-carved versions of orders — one bucket present
    only in the new snapshot (added), one only in the old (removed),
    one with a mutated status (changed) — diffed by row digest; the
    join shuffles 16-byte hashes, never rows. The oracle recomputes
    the same diff value-wise with a FULL OUTER JOIN."""
    from ..operators import sampling
    from ..operators.upsert import snapshot_diff

    od = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    b = sampling.hash_bucket("o_orderkey", 10)
    old = od.filter(b != 0)
    new = od.filter(b != 1).withColumn(
        "o_orderstatus", F.when(b == 2, F.lit("X")).otherwise(F.col("o_orderstatus"))
    )
    return snapshot_diff(old, new, ["o_orderkey"])


@register(
    "grouping_sets_orders",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n, ROUND(SUM(o_totalprice), 2) AS total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
    tags=("aggregate", "grouping-sets"),
    # r12 rotation: 7 straight driver greens (r5-r11) -> extended tier
    # frees a driver slot for a never-checked face
    driver=False,
)
def grouping_sets_orders(spark, sf_dir):
    """GROUPING SETS — two independent one-dimension breakdowns plus the
    grand total from ONE scan (the cube/rollup generalization; Spark
    expands to a single Expand + hash aggregate, so the fact table is
    read once, not three times)."""
    od = load_table(spark, sf_dir, "orders")
    return od.groupingSets(
        [["o_orderstatus"], ["o_orderpriority"], []], "o_orderstatus", "o_orderpriority"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )


@register(
    "value_rank_distribution_events",
    oracle="""
    SELECT event_id, event_type,
           CAST(ntile(4) OVER w AS INTEGER) AS quartile,
           ROUND(percent_rank() OVER w, 6) AS pct_rank,
           ROUND(cume_dist() OVER w, 6) AS cume
    FROM events
    WHERE value IS NOT NULL
    WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
    """,
    tags=("window", "rank", "distribution"),
    # rotation r11: 6x driver-green (r5-r10) — slot goes to snapshot MERGE
    driver=False,
)
def value_rank_distribution_events(spark, sf_dir):
    """Distribution-rank window family per segment — ntile quartiles,
    percent_rank, cume_dist over one shared (type, value) sort: the
    score-normalization shape (a training pipeline ranks quality scores
    within each domain before thresholding). One shuffle, one sort,
    three rank functions."""
    # NULL guard pins cross-engine semantics: Spark sorts NULLS FIRST,
    # DuckDB NULLS LAST — one NULL value would shift every rank in its
    # partition between the two engines
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    w = Window.partitionBy("event_type").orderBy(F.col("value"), F.col("event_id"))
    return ev.select(
        "event_id",
        "event_type",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


@register(
    "time_to_conversion_events",
    oracle="""
    WITH v AS (
      SELECT user_id, MIN(ts) AS first_view FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS first_purchase
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'purchase' AND e.ts >= v.first_view
      GROUP BY e.user_id
    )
    SELECT v.user_id,
           CAST(date_diff('second', v.first_view, p.first_purchase) AS BIGINT)
             AS seconds_to_convert
    FROM v JOIN p ON v.user_id = p.user_id
    """,
    tags=("behavioral", "conversion", "aggregate"),
    # r12 rotation: 7 straight driver greens (r5-r11) -> extended tier
    # frees a driver slot for a never-checked face
    driver=False,
)
def time_to_conversion_events(spark, sf_dir):
    """Per-user time from first view to first subsequent purchase — the
    conversion-latency metric: two per-user MIN aggregates (map-side
    combined) and one key join; no window sort over the raw stream."""
    ev = load_table(spark, sf_dir, "events")
    v = ev.filter(F.col("event_type") == "view").groupBy("user_id").agg(
        F.min("ts").alias("first_view")
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(v, "user_id")
        .filter(F.col("ts") >= F.col("first_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_purchase"))
    )
    secs = (
        F.col("first_purchase").cast("timestamp").cast("long")
        - F.col("first_view").cast("timestamp").cast("long")
    )
    return v.join(p, "user_id").select("user_id", secs.alias("seconds_to_convert"))


@register(
    "unpivot_user_event_counts",
    oracle="""
    SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n
    FROM events GROUP BY user_id, event_type
    """,
    tags=("unpivot", "melt", "pivot"),
    # rotation r10: demoted after driver-green r8+r9 (stable two-round
    # evidence); slot goes to stream_kmv_maintenance's first rotation
    driver=False,
)
def unpivot_user_event_counts(spark, sf_dir):
    """UNPIVOT (melt): the wide per-user count matrix from the PIVOT
    query melted back to long (user, event_type, n) rows via
    ``DataFrame.unpivot`` — wide→long is how feature matrices re-enter
    relational pipelines. Zero-count cells (pivot fill) are dropped so
    the round trip is exactly the original long aggregate, which is
    the oracle: unpivot ∘ pivot ≡ groupBy. Expand-based — one pass over
    the wide rows, no shuffle beyond the pivot's own aggregate."""
    ev = load_table(spark, sf_dir, "events")
    wide = ev.groupBy("user_id").pivot("event_type", _EVENT_TYPES).count().na.fill(0)
    long = wide.unpivot("user_id", _EVENT_TYPES, "event_type", "n")
    return long.filter(F.col("n") > 0).select("user_id", "event_type", "n")


@register(
    "bloom_pruned_join_part_lineitem",
    oracle="""
    SELECT l_orderkey, l_linenumber, p_partkey, p_name
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_size = 1
    """,
    tags=("join", "runtime-filter", "bloom", "scan-pruning"),
    # rotation r12: driver-green r5-r11 (7 straight); the scan-pruning
    # family keeps manifest_pruned_scan + salted + bucketed driver rows
    driver=False,
)
def bloom_pruned_join_part_lineitem(spark, sf_dir):
    """Selective dim-filtered fact join executed WITH a runtime bloom
    filter injected into the fact scan — the 100 TB shape where the win
    is pruning lineitem rows BEFORE the join shuffle, not after it.
    Catalyst builds a bloom over the filtered part keys and rewrites the
    fact side to ``might_contain(l_partkey)``; the function ASSERTS the
    rewrite is present in the executed plan (so a silent regression to
    an unpruned shuffle join fails the row, it doesn't just get slow)
    and materializes the result under those confs (the thresholds are
    production-sized, so the local fixture needs explicit overrides;
    broadcast is disabled because a broadcast join already prunes at
    the probe — the bloom path is for the dim-too-big-to-broadcast
    case). Conf changes are scoped and restored; the result re-reads
    from a spilled parquet so the returned plan is conf-independent.
    The spill dir is private per invocation (plans/workdirs.py —
    concurrent runs must not clobber each other; stale dirs are swept
    there)."""
    from .workdirs import fresh_result_dir

    keys = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in keys}
    out_dir = fresh_result_dir("bloom_join")
    try:
        for k, v in keys.items():
            spark.conf.set(k, v)
        li = load_table(spark, sf_dir, "lineitem")
        pt = load_table(spark, sf_dir, "part").filter(F.col("p_size") == 1)
        j = li.join(pt, li["l_partkey"] == pt["p_partkey"]).select(
            "l_orderkey", "l_linenumber", "p_partkey", "p_name"
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        if "might_contain" not in plan:
            raise AssertionError(
                "runtime bloom filter was not injected into the fact scan:\n" + plan
            )
        j.write.mode("overwrite").parquet(out_dir)
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    return spark.read.parquet(out_dir)


@register(
    "upsert_latest_order_per_customer",
    oracle="""
    WITH u AS (
      SELECT o_custkey, o_orderkey, o_orderstatus, o_totalprice,
             o_orderkey % 3 AS bid,
             ROW_NUMBER() OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderkey % 3 DESC, o_orderkey DESC
             ) AS rn
      FROM orders
    )
    SELECT o_custkey, o_orderkey, o_orderstatus, o_totalprice
    FROM u WHERE rn = 1
    """,
    tags=("upsert", "merge", "maintenance", "storage"),
    # rotation r12: driver-green r6-r11 (6 straight); the merge family
    # keeps snapshot_merge + snapshot_equality_delete driver rows
    driver=False,
)
def upsert_latest_order_per_customer(spark, sf_dir):
    """Batch MERGE/upsert into a keyed parquet table of record
    (operators/upsert.merge_into_parquet), oracle-checked end to end:
    the orders table arrives as THREE update batches (``o_orderkey %
    3`` — later batches REPLACE earlier rows for customers they touch),
    each deduped to its newest order per customer and merged into a
    customer-keyed store (matching keys replaced, new keys inserted).
    The final store is exactly "each customer's newest order from the
    LAST batch that mentioned them" — the row_number oracle. This is
    the plain-parquet MERGE pattern every materialized store here
    builds on (anti-join out replaced keys → union → materialize →
    overwrite); at scale the time-partitioned variant rewrites only
    touched partitions (pinned in tests/test_upsert.py), while this
    keyed-store shape exercises the flat full-table path."""
    from ..operators.upsert import merge_into_parquet
    from .workdirs import fresh_result_dir

    w = Window.partitionBy("o_custkey").orderBy(F.col("o_orderkey").desc())
    store = fresh_result_dir("upsert_orders")
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        for b in range(3):
            upd = (
                o.filter(F.pmod(F.col("o_orderkey"), F.lit(3)) == b)
                .withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1)
                .drop("_rn")
            )
            if b == 0:
                upd.write.parquet(store)
            else:
                merge_into_parquet(spark, store, upd, ["o_custkey"])
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.read.parquet(store)


@register(
    "cdc_apply_orders",
    oracle="""
    WITH ch AS (
      SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
             o_totalprice,
             CASE WHEN abs(o_orderkey) % 11 = 0 THEN 'D' ELSE 'U' END AS op,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      FROM orders
    )
    SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice
    FROM ch WHERE rn = 1 AND op <> 'D'
    """,
    tags=("cdc", "changelog", "tombstone", "compaction", "maintenance"),
    # rotation r9: driver-green r7+r8; CDC family keeps snapshot_diff_orders + incremental_join_refresh_orders
    driver=False,
)
def cdc_apply_orders(spark, sf_dir):
    """CDC changelog compaction with TOMBSTONES
    (operators/upsert.apply_changelog): each customer's order stream is
    read as a keyed change log ordered by (date, orderkey); every 11th
    orderkey is a synthetic delete event. Final state = last change per
    key, with a key whose last change is a tombstone ABSENT from the
    result — Kafka log-compaction / Debezium semantics, the deletion
    half the plain last-writer-wins upsert (upsert_latest_order_per_
    customer) doesn't model. One keyed window over the per-customer
    frame; the oracle replays the identical last-wins + tombstone
    filter."""
    from ..operators.upsert import apply_changelog

    ch = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.col("o_orderdate").cast("date").alias("o_orderdate"),
        "o_totalprice",
        F.when(F.pmod(F.abs(F.col("o_orderkey")), F.lit(11)) == 0, F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
    )
    state = apply_changelog(
        ch, ["o_custkey"], ["o_orderdate", "o_orderkey"], "op", delete_op="D"
    )
    return state.select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")


@register(
    "incremental_join_refresh_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice, c_mktsegment
    FROM orders JOIN customer ON o_custkey = c_custkey
    """,
    tags=("maintenance", "ivm", "join", "incremental-refresh", "delta-propagation"),
)
def incremental_join_refresh_orders(spark, sf_dir):
    """Incremental JOIN-view maintenance, oracle-checked end to end
    (operators/maintenance.incremental_join_refresh): the materialized
    orders⋈customer view is built from INTERLEAVED batch deltas on BOTH
    sides (orders in thirds, customers in halves — so every delta-
    algebra term ΔA⋈B_prev, A_prev⋈ΔB, ΔA⋈ΔB genuinely executes,
    including a final orders-only batch against the full customer
    accumulator), appending only delta rows per batch, never
    recomputing the standing join. The differential pins that the
    evolved view equals the one-shot join row-for-row — the
    exactly-once emission argument of the delta algebra, checked, and
    the join-side counterpart of the four mergeable-partial aggregate
    stores."""
    from ..operators.maintenance import incremental_join_refresh
    from .workdirs import fresh_result_dir

    store = fresh_result_dir("ivm_join")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        steps = [
            (F.pmod(F.col("o_orderkey"), F.lit(3)) == 0, F.pmod(F.col("o_custkey"), F.lit(2)) == 0),
            (F.pmod(F.col("o_orderkey"), F.lit(3)) == 1, F.pmod(F.col("o_custkey"), F.lit(2)) == 1),
            (F.pmod(F.col("o_orderkey"), F.lit(3)) == 2, None),
        ]
        for oa, cb in steps:
            incremental_join_refresh(
                spark, store, "o_custkey",
                delta_a=orders.filter(oa),
                delta_b=cust.filter(cb) if cb is not None else None,
            )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.read.parquet(f"{store}/view").select(
        "o_orderkey", "o_custkey", "o_totalprice", "c_mktsegment"
    )
